"""DDPG — deep deterministic policy gradient (reference rllab/algos/ddpg.py):
replay buffer, target policy/Q networks with soft (tau) updates, OU
exploration noise, jitted actor/critic updates."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class _QNet(nn.Module):
    hidden: tuple[int, ...] = (32, 32)

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return nn.Dense(1)(x).squeeze(-1)


class _DetPolicy(nn.Module):
    hidden: tuple[int, ...] = (32, 32)
    action_dim: int = 2

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        return jnp.tanh(nn.Dense(self.action_dim)(x))


class ReplayBuffer:
    def __init__(self, capacity: int, obs_dim: int, act_dim: int):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.act = np.zeros((capacity, act_dim), np.float32)
        self.rew = np.zeros(capacity, np.float32)
        self.next_obs = np.zeros((capacity, obs_dim), np.float32)
        self.done = np.zeros(capacity, np.float32)
        self.size = 0
        self.ptr = 0

    def add(self, o, a, r, no, d):
        i = self.ptr
        self.obs[i], self.act[i], self.rew[i], self.next_obs[i], self.done[i] = o, a, r, no, d
        self.ptr = (self.ptr + 1) % self.capacity
        self.size = min(self.size + 1, self.capacity)

    def sample(self, rng: np.random.Generator, batch: int):
        idx = rng.integers(0, self.size, batch)
        return (self.obs[idx], self.act[idx], self.rew[idx], self.next_obs[idx], self.done[idx])


class DDPG:
    def __init__(
        self,
        obs_dim: int,
        act_dim: int,
        hidden: tuple[int, ...] = (32, 32),
        policy_lr: float = 1e-3,
        qf_lr: float = 1e-3,
        tau: float = 0.001,
        discount: float = 0.99,
        buffer_size: int = 100_000,
        batch_size: int = 64,
        ou_theta: float = 0.15,
        ou_sigma: float = 0.3,
        seed: int = 0,
    ):
        self.obs_dim, self.act_dim = obs_dim, act_dim
        self.discount, self.tau, self.batch_size = discount, tau, batch_size
        self.policy_net = _DetPolicy(hidden, act_dim)
        self.q_net = _QNet(hidden)
        k = jax.random.key(seed)
        o = jnp.zeros((1, obs_dim))
        a = jnp.zeros((1, act_dim))
        self.policy_params = self.policy_net.init(k, o)
        self.q_params = self.q_net.init(k, o, a)
        self.target_policy = jax.tree_util.tree_map(jnp.copy, self.policy_params)
        self.target_q = jax.tree_util.tree_map(jnp.copy, self.q_params)
        self.policy_tx = optax.adam(policy_lr)
        self.q_tx = optax.adam(qf_lr)
        self.policy_opt = self.policy_tx.init(self.policy_params)
        self.q_opt = self.q_tx.init(self.q_params)
        self.buffer = ReplayBuffer(buffer_size, obs_dim, act_dim)
        self.rng = np.random.default_rng(seed)
        self.ou_theta, self.ou_sigma = ou_theta, ou_sigma
        self._noise = np.zeros(act_dim)
        self._step = jax.jit(self._build_step())

    def _build_step(self):
        def step(pp, qp, tp, tq, p_opt, q_opt, obs, act, rew, next_obs, done):
            next_a = self.policy_net.apply(tp, next_obs)
            target = rew + self.discount * (1 - done) * self.q_net.apply(tq, next_obs, next_a)

            def q_loss(qp):
                q = self.q_net.apply(qp, obs, act)
                return jnp.mean((q - target) ** 2)

            ql, q_grads = jax.value_and_grad(q_loss)(qp)
            qu, q_opt = self.q_tx.update(q_grads, q_opt)
            qp = optax.apply_updates(qp, qu)

            def p_loss(pp):
                return -jnp.mean(self.q_net.apply(qp, obs, self.policy_net.apply(pp, obs)))

            pl, p_grads = jax.value_and_grad(p_loss)(pp)
            pu, p_opt = self.policy_tx.update(p_grads, p_opt)
            pp = optax.apply_updates(pp, pu)

            soft = lambda t, s: jax.tree_util.tree_map(
                lambda a, b: (1 - self.tau) * a + self.tau * b, t, s
            )
            return pp, qp, soft(tp, pp), soft(tq, qp), p_opt, q_opt, ql, pl

        return step

    def get_action(self, obs: np.ndarray) -> np.ndarray:
        a = np.asarray(self.policy_net.apply(self.policy_params, jnp.asarray(obs[None])))[0]
        self._noise += -self.ou_theta * self._noise + self.ou_sigma * self.rng.standard_normal(self.act_dim)
        return np.clip(a + self._noise, -1, 1)

    def observe(self, o, a, r, no, d):
        self.buffer.add(o, a, r, no, d)

    def train_step(self) -> dict[str, float]:
        if self.buffer.size < self.batch_size:
            return {}
        batch = self.buffer.sample(self.rng, self.batch_size)
        (
            self.policy_params,
            self.q_params,
            self.target_policy,
            self.target_q,
            self.policy_opt,
            self.q_opt,
            ql,
            pl,
        ) = self._step(
            self.policy_params,
            self.q_params,
            self.target_policy,
            self.target_q,
            self.policy_opt,
            self.q_opt,
            *(jnp.asarray(b) for b in batch),
        )
        return {"QLoss": float(ql), "PolicyLoss": float(pl)}

    def train(self, env, n_steps: int = 10_000, horizon: int = 100) -> list[float]:
        returns, ep_ret, t = [], 0.0, 0
        obs = env.reset()
        for _ in range(n_steps):
            a = self.get_action(np.asarray(obs, np.float32))
            next_obs, r, done, _ = env.step(a)
            ep_ret += r
            t += 1
            if t >= horizon:
                done = True
            self.observe(np.asarray(obs, np.float32), a, r, np.asarray(next_obs, np.float32), float(done))
            self.train_step()
            obs = next_obs
            if done:
                returns.append(ep_ret)
                obs, ep_ret, t = env.reset(), 0.0, 0
                self._noise[:] = 0
        return returns
