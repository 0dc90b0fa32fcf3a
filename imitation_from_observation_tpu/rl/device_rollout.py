"""Fully on-device rollout sampling for closed-form environments.

The reference's rollout runtime steps python envs on the host — worker
processes (``rllab/sampler/parallel_sampler.py:99-127``) or a lockstep
vectorized loop (``sandbox/rocky/tf/samplers/vectorized_sampler.py:20-107``)
— paying a python/env round trip per step. For environments whose dynamics
are closed-form (the reference's Box2D test family, rebuilt in
``sim/classic.py``), the TPU-native shape folds the ENTIRE sampling phase
into one XLA program: policy sampling, dynamics, reward, termination, and
auto-reset run inside a ``lax.scan`` over time on a batched ``[n_envs, ...]``
state, so an iteration's whole sample batch is one device call with a single
host transfer at the end (SURVEY §2.7's "natural JAX shape" row, completing
the mapping the host ``VectorizedSampler`` covers for MuJoCo tasks).

The episode axis shards over a ``jax.sharding.Mesh`` data axis the same way
the trainer/TRPO/reward paths do (``parallel/mesh.py``): policy params are
replicated, per-env state/keys are sharded, and the scan body contains no
cross-env reductions, so sampling scales embarrassingly over ICI.

Semantics match the host pipeline: envs auto-reset on termination or at
``max_path_length`` (``sim/vec_env.py:34-43``), completed paths are split at
episode boundaries (the trailing incomplete segment is discarded, like the
host sampler's still-running trajectories), and the batch is truncated to
exactly ``batch_size`` steps (``parallel_sampler.truncate_paths:130-156``).
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from imitation_from_observation_tpu.rl.sampler import truncate_paths


class DeviceEnvSpec:
    """Batched pure-JAX environment: state ``[n, state_dim]`` in, rewards and
    termination out. ``step`` receives the already-clipped scalar action."""

    obs_dim: int
    action_dim: int = 1
    action_clip: tuple[float, float]

    def reset(self, key: jax.Array, n: int) -> jax.Array:
        raise NotImplementedError

    def step(self, state: jax.Array, u: jax.Array):
        raise NotImplementedError

    def obs(self, state: jax.Array) -> jax.Array:
        return state


class CartpoleDevice(DeviceEnvSpec):
    """sim/classic.py::CartpoleEnv in batched JAX (same constants/semantics:
    Euler dynamics, done at |x|>2.4 or |th|>0.2, reward gated by notdone)."""

    obs_dim = 4
    action_clip = (-10.0, 10.0)
    gravity, m_cart, m_pole, pole_l, dt = 9.8, 1.0, 0.1, 0.5, 0.02
    max_cart_pos, max_pole_angle = 2.4, 0.2
    _reset_bounds = np.array([2.4, 4.0, 0.2, 4.0], np.float32) * 0.05

    def reset(self, key: jax.Array, n: int) -> jax.Array:
        b = jnp.asarray(self._reset_bounds)
        return jax.random.uniform(key, (n, 4), minval=-b, maxval=b)

    def _dynamics(self, state: jax.Array, force: jax.Array) -> jax.Array:
        x, xd, th, thd = state[:, 0], state[:, 1], state[:, 2], state[:, 3]
        total_m = self.m_cart + self.m_pole
        pm_l = self.m_pole * self.pole_l
        sin, cos = jnp.sin(th), jnp.cos(th)
        tmp = (force + pm_l * thd**2 * sin) / total_m
        th_acc = (self.gravity * sin - cos * tmp) / (
            self.pole_l * (4.0 / 3.0 - self.m_pole * cos**2 / total_m)
        )
        x_acc = tmp - pm_l * th_acc * cos / total_m
        return jnp.stack(
            [x + self.dt * xd, xd + self.dt * x_acc, th + self.dt * thd, thd + self.dt * th_acc],
            axis=1,
        )

    def step(self, state: jax.Array, u: jax.Array):
        nstate = self._dynamics(state, u)
        done = (jnp.abs(nstate[:, 0]) > self.max_cart_pos) | (
            jnp.abs(nstate[:, 2]) > self.max_pole_angle
        )
        notdone = 1.0 - done.astype(jnp.float32)
        reward = notdone * (10.0 - (1.0 - jnp.cos(nstate[:, 2])) - 1e-5 * u**2)
        return nstate, reward, done


class CartpoleSwingupDevice(CartpoleDevice):
    """sim/classic.py::CartpoleSwingupEnv: hanging start, reward cos(th),
    -100 at the |x|>3 termination."""

    max_cart_pos = 3.0

    def reset(self, key: jax.Array, n: int) -> jax.Array:
        low = jnp.array([-1.0, -2.0, np.pi - 1.0, -3.0])
        high = jnp.array([1.0, 2.0, np.pi + 1.0, 3.0])
        return jax.random.uniform(key, (n, 4), minval=low, maxval=high)

    def step(self, state: jax.Array, u: jax.Array):
        nstate = self._dynamics(state, u)
        done = jnp.abs(nstate[:, 0]) > self.max_cart_pos
        reward = jnp.where(done, -100.0, jnp.cos(nstate[:, 2]))
        return nstate, reward, done


class MountainCarDevice(DeviceEnvSpec):
    """sim/classic.py::MountainCarEnv: clipped hill dynamics, reward
    ``-1 + height_bonus*sin(3x)``, done at the goal position."""

    obs_dim = 2
    action_clip = (-1.0, 1.0)

    def __init__(self, height_bonus: float = 1.0, goal_cart_pos: float = 0.6):
        self.height_bonus = height_bonus
        self.goal_cart_pos = goal_cart_pos

    def reset(self, key: jax.Array, n: int) -> jax.Array:
        xd = jax.random.uniform(key, (n,), minval=-0.07, maxval=0.07)
        return jnp.stack([jnp.full((n,), -0.5), xd], axis=1)

    def step(self, state: jax.Array, u: jax.Array):
        x, xd = state[:, 0], state[:, 1]
        xd = jnp.clip(xd + 0.0015 * u - 0.0025 * jnp.cos(3 * x), -0.07, 0.07)
        x_new = jnp.clip(x + xd, -1.2, 0.6)
        xd = jnp.where(x_new <= -1.2, jnp.maximum(xd, 0.0), xd)
        nstate = jnp.stack([x_new, xd], axis=1)
        done = x_new >= self.goal_cart_pos
        reward = -1.0 + self.height_bonus * jnp.sin(3 * x_new)
        return nstate, reward, done


class DoublePendulumDevice(DeviceEnvSpec):
    """sim/classic.py::DoublePendulumEnv: damped equal-mass two-link
    dynamics, reward = -|tip - upright target|, never terminates."""

    obs_dim = 4
    action_clip = (-3.0, 3.0)
    link_len, m, g, dt, damping = 1.0, 1.0, 9.8, 0.02, 0.05

    def reset(self, key: jax.Array, n: int) -> jax.Array:
        stds = jnp.array([0.1, 0.1, 0.01, 0.01])
        mean = jnp.array([np.pi, np.pi, 0.0, 0.0])
        return mean + jax.random.normal(key, (n, 4)) * stds

    def obs(self, state: jax.Array) -> jax.Array:
        wrap = lambda a: (a + np.pi) % (2 * np.pi) - np.pi
        return jnp.stack(
            [wrap(state[:, 0] - np.pi), wrap(state[:, 1] - np.pi), state[:, 2], state[:, 3]],
            axis=1,
        )

    def step(self, state: jax.Array, u: jax.Array):
        th1, th2, w1, w2 = state[:, 0], state[:, 1], state[:, 2], state[:, 3]
        d = th1 - th2
        m, l, g = self.m, self.link_len, self.g
        den = l * (2 * m - m * jnp.cos(2 * d))
        a1 = (
            -m * g * (2 * jnp.sin(th1) + jnp.sin(th1 - 2 * th2))
            - 2 * m * jnp.sin(d) * (w2**2 * l + w1**2 * l * jnp.cos(d))
            + 2 * u / l
        ) / den
        a2 = (
            2 * jnp.sin(d) * (w1**2 * l * 2 * m + g * 2 * m * jnp.cos(th1) + w2**2 * l * m * jnp.cos(d))
        ) / den
        w1n = w1 + self.dt * (a1 - self.damping * w1)
        w2n = w2 + self.dt * (a2 - self.damping * w2)
        nstate = jnp.stack([th1 + self.dt * w1n, th2 + self.dt * w2n, w1n, w2n], axis=1)
        tip_x = l * jnp.sin(nstate[:, 0]) + l * jnp.sin(nstate[:, 1])
        tip_y = -l * jnp.cos(nstate[:, 0]) - l * jnp.cos(nstate[:, 1])
        reward = -jnp.sqrt(tip_x**2 + (tip_y - 2 * l) ** 2)
        done = jnp.zeros(state.shape[0], bool)
        return nstate, reward, done


DEVICE_ENVS: dict[str, Callable[[], DeviceEnvSpec]] = {
    "cartpole": CartpoleDevice,
    "cartpole_swingup": CartpoleSwingupDevice,
    "mountain_car": MountainCarDevice,
    "double_pendulum": DoublePendulumDevice,
}


class DeviceSampler:
    """Drop-in sampler for :class:`rl/algo.py::BatchPolopt` (the
    ``obtain_samples() -> (paths, timings)`` contract) that runs the whole
    sampling phase as one jitted device program.

    ``n_envs`` parallel episode streams step for
    ``ceil(batch_size / n_envs) + max_path_length`` scan steps with in-scan
    auto-reset, guaranteeing at least ``batch_size`` steps worth of COMPLETED
    episodes; host-side the ``[S, N]`` batch is split at episode boundaries
    and truncated to the exact batch size.
    """

    def __init__(
        self,
        env_spec: DeviceEnvSpec | str,
        policy,
        batch_size: int,
        max_path_length: int,
        n_envs: int | None = None,
        seed: int = 0,
        mesh=None,
    ):
        self.spec = DEVICE_ENVS[env_spec]() if isinstance(env_spec, str) else env_spec
        self.policy = policy
        self.batch_size = batch_size
        self.max_path_length = max_path_length
        self.mesh = mesh
        n = n_envs or max(1, -(-batch_size // max_path_length))
        if mesh is not None:
            n_dev = mesh.devices.size
            n = -(-n // n_dev) * n_dev  # equal shards over the data axis
        self.n_envs = n
        self._key = jax.random.key(seed)
        self._scan_len = -(-batch_size // n) + max_path_length
        self._rollout = self._build()

    def _build(self):
        spec, policy = self.spec, self.policy
        n, S, limit = self.n_envs, self._scan_len, self.max_path_length
        lo, hi = spec.action_clip
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            shard = NamedSharding(self.mesh, PartitionSpec("data"))
            constrain = lambda x: jax.lax.with_sharding_constraint(x, shard)
        else:
            constrain = lambda x: x

        @jax.jit
        def rollout(params, key):
            def step_fn(carry, key):
                state, steps = carry
                k_act, k_reset = jax.random.split(key)
                o = spec.obs(state)
                a, info = policy.sample(params, o, k_act)
                u = jnp.clip(a[:, 0], lo, hi)
                nstate, reward, done = spec.step(state, u)
                steps = steps + 1
                done = done | (steps >= limit)  # the vec env's path-length cutoff
                # auto-reset terminated streams (sim/vec_env.py:41-43)
                fresh = spec.reset(k_reset, n)
                nstate = constrain(jnp.where(done[:, None], fresh, nstate))
                steps = jnp.where(done, 0, steps)
                out = dict(
                    observations=o, actions=a, rewards=reward, dones=done,
                    mean=info["mean"], log_std=info["log_std"],
                )
                return (nstate, steps), out

            k0, ks = jax.random.split(key)
            state0 = constrain(spec.reset(k0, n))
            steps0 = constrain(jnp.zeros((n,), jnp.int32))
            _, traj = jax.lax.scan(step_fn, (state0, steps0), jax.random.split(ks, S))
            return traj

        return rollout

    def obtain_samples(self) -> tuple[list[dict[str, Any]], dict[str, float]]:
        self._key, sub = jax.random.split(self._key)
        t0 = time.perf_counter()
        traj = jax.tree_util.tree_map(np.asarray, self._rollout(self.policy.params, sub))
        env_time = time.perf_counter() - t0

        paths: list[dict[str, Any]] = []
        obs, act = traj["observations"], traj["actions"]
        rew, done = traj["rewards"], traj["dones"]
        mean, log_std = traj["mean"], traj["log_std"]
        for i in range(self.n_envs):
            start = 0
            for t in np.flatnonzero(done[:, i]):
                t = int(t)
                paths.append(
                    dict(
                        observations=obs[start : t + 1, i],
                        actions=act[start : t + 1, i],
                        rewards=np.asarray(rew[start : t + 1, i], np.float64),
                        env_infos={},
                        agent_infos={
                            "mean": mean[start : t + 1, i],
                            "log_std": log_std[start : t + 1, i],
                        },
                    )
                )
                start = t + 1
            # the trailing incomplete segment is discarded, like the host
            # sampler's still-running trajectories at the batch threshold
        total = sum(len(p["rewards"]) for p in paths)
        if total < self.batch_size:
            raise RuntimeError(
                f"device rollout produced {total} completed steps < batch "
                f"{self.batch_size}; raise n_envs or max_path_length"
            )
        paths = truncate_paths(paths, self.batch_size)
        return paths, dict(PolicyExecTime=0.0, EnvExecTime=env_time)
