"""Additional policy families from the reference inventory.

- :class:`CategoricalMLPPolicy` ≙ rllab/policies/categorical_mlp_policy.py —
  softmax MLP over discrete actions.
- :class:`GaussianGRUPolicy` ≙ rllab/policies/gaussian_gru_policy.py — a GRU
  over observations with a Gaussian head; carries recurrent state through
  ``get_actions`` (reset on episode boundaries).
- :class:`GaussianConvPolicy` ≙ sandbox/bradly/third_person's conv policy —
  conv trunk over image observations with a Gaussian head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np



class Discrete:
    """Discrete action space (reference rllab/spaces/discrete.py)."""

    def __init__(self, n: int):
        self.n = n

    @property
    def flat_dim(self) -> int:
        return self.n

    def sample(self, rng: np.random.Generator) -> int:
        return int(rng.integers(self.n))

    def contains(self, x) -> bool:
        return 0 <= int(x) < self.n

    def flatten(self, x) -> np.ndarray:
        out = np.zeros(self.n, np.float32)
        out[int(x)] = 1.0
        return out

    def unflatten(self, x) -> int:
        return int(np.argmax(x))


class _CatNet(nn.Module):
    hidden: tuple[int, ...]
    n_actions: int

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = jnp.tanh(nn.Dense(h)(x))
        return nn.Dense(self.n_actions)(x)  # logits


class CategoricalMLPPolicy:
    recurrent = False

    def __init__(self, obs_dim: int, n_actions: int, hidden=(32, 32), seed: int = 0):
        self.obs_dim, self.n_actions = obs_dim, n_actions
        self.net = _CatNet(hidden, n_actions)
        self.params = self.net.init(jax.random.key(seed), jnp.zeros((1, obs_dim)))
        self._sample = jax.jit(self._sample_impl)

    def dist_info(self, params, obs):
        return {"prob": jax.nn.softmax(self.net.apply(params, obs))}

    def _sample_impl(self, params, obs, key):
        logits = self.net.apply(params, obs)
        actions = jax.random.categorical(key, logits)
        return actions, {"prob": jax.nn.softmax(logits)}

    def get_actions(self, obs: np.ndarray, key):
        a, info = self._sample(self.params, jnp.asarray(obs), key)
        return np.asarray(a), {"prob": np.asarray(info["prob"])}

    def get_action(self, obs, key):
        a, info = self.get_actions(np.asarray(obs)[None], key)
        return int(a[0]), {k: v[0] for k, v in info.items()}

    @staticmethod
    def log_likelihood(actions_onehot, dist_info):
        return jnp.log(jnp.sum(dist_info["prob"] * actions_onehot, axis=-1) + 1e-8)


class _GRUNet(nn.Module):
    hidden: int
    action_dim: int

    @nn.compact
    def __call__(self, carry, obs):
        carry, h = nn.GRUCell(self.hidden)(carry, obs)
        mean = nn.Dense(self.action_dim)(h)
        return carry, mean


class GaussianGRUPolicy:
    recurrent = True

    def __init__(self, obs_dim: int, action_dim: int, hidden: int = 32, init_std: float = 1.0, seed: int = 0):
        self.obs_dim, self.action_dim, self.hidden = obs_dim, action_dim, hidden
        self.net = _GRUNet(hidden, action_dim)
        carry0 = jnp.zeros((1, hidden))
        net_params = self.net.init(jax.random.key(seed), carry0, jnp.zeros((1, obs_dim)))
        self.params = {"net": net_params, "log_std": jnp.full((action_dim,), np.log(init_std))}
        self._carry: jnp.ndarray | None = None
        self._step = jax.jit(self._step_impl)

    def reset(self, n_envs: int = 1):
        self._carry = jnp.zeros((n_envs, self.hidden))

    def reset_where(self, dones: np.ndarray) -> None:
        """Zero the hidden state of envs that just restarted (called by the
        vectorized sampler on auto-reset, reference gaussian_gru_policy's
        per-env reset semantics)."""
        if self._carry is None:
            return
        mask = jnp.asarray(~np.asarray(dones, bool), jnp.float32)[:, None]
        self._carry = self._carry * mask

    def _step_impl(self, params, carry, obs, key):
        carry, mean = self.net.apply(params["net"], carry, obs)
        log_std = jnp.broadcast_to(params["log_std"], mean.shape)
        actions = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        return carry, actions, {"mean": mean, "log_std": log_std}

    def get_actions(self, obs: np.ndarray, key):
        if self._carry is None or self._carry.shape[0] != len(obs):
            self.reset(len(obs))
        self._carry, actions, info = self._step(self.params, self._carry, jnp.asarray(obs), key)
        return np.asarray(actions), {k: np.asarray(v) for k, v in info.items()}

    def get_action(self, obs, key):
        a, info = self.get_actions(np.asarray(obs)[None], key)
        return a[0], {k: v[0] for k, v in info.items()}

    def dist_info_sequence(self, params, obs_seq):
        """obs_seq [B, T, obs_dim] -> dist infos [B, T, ...] (for recurrent
        surrogate losses, reference npo.py recurrent branch)."""

        def scan_t(carry, obs_t):
            carry, mean = self.net.apply(params["net"], carry, obs_t)
            return carry, mean

        carry0 = jnp.zeros((obs_seq.shape[0], self.hidden))
        _, means = jax.lax.scan(scan_t, carry0, jnp.swapaxes(obs_seq, 0, 1))
        means = jnp.swapaxes(means, 0, 1)
        log_std = jnp.broadcast_to(params["log_std"], means.shape)
        return {"mean": means, "log_std": log_std}


class _LSTMNet(nn.Module):
    hidden: int
    out_dim: int

    @nn.compact
    def __call__(self, carry, obs):
        carry, h = nn.OptimizedLSTMCell(self.hidden)(carry, obs)
        return carry, nn.Dense(self.out_dim)(h)


class _RecurrentPolicyBase:
    """Shared carry management for the recurrent policies: per-env hidden
    state through ``get_actions`` with masked reset on episode boundaries
    (the vectorized sampler calls ``reset_where``)."""

    recurrent = True

    def _init_carry(self, n: int):
        raise NotImplementedError

    def reset(self, n_envs: int = 1):
        self._carry = self._init_carry(n_envs)

    def reset_where(self, dones: np.ndarray) -> None:
        if getattr(self, "_carry", None) is None:
            return
        mask = jnp.asarray(~np.asarray(dones, bool), jnp.float32)[:, None]
        self._carry = jax.tree_util.tree_map(lambda c: c * mask, self._carry)

    def get_action(self, obs, key):
        a, info = self.get_actions(np.asarray(obs)[None], key)
        return a[0], {k: v[0] for k, v in info.items()}


class GaussianLSTMPolicy(_RecurrentPolicyBase):
    """LSTM trunk + Gaussian head (reference
    sandbox/rocky/tf/policies/gaussian_lstm_policy.py)."""

    def __init__(self, obs_dim: int, action_dim: int, hidden: int = 32, init_std: float = 1.0, seed: int = 0):
        self.obs_dim, self.action_dim, self.hidden = obs_dim, action_dim, hidden
        self.net = _LSTMNet(hidden, action_dim)
        carry0 = self._init_carry(1)
        net_params = self.net.init(jax.random.key(seed), carry0, jnp.zeros((1, obs_dim)))
        self.params = {"net": net_params, "log_std": jnp.full((action_dim,), np.log(init_std))}
        self._carry = None
        self._step = jax.jit(self._step_impl)

    def _init_carry(self, n: int):
        return (jnp.zeros((n, self.hidden)), jnp.zeros((n, self.hidden)))

    def _step_impl(self, params, carry, obs, key):
        carry, mean = self.net.apply(params["net"], carry, obs)
        log_std = jnp.broadcast_to(params["log_std"], mean.shape)
        actions = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        return carry, actions, {"mean": mean, "log_std": log_std}

    def get_actions(self, obs: np.ndarray, key):
        if self._carry is None or self._carry[0].shape[0] != len(obs):
            self.reset(len(obs))
        self._carry, actions, info = self._step(self.params, self._carry, jnp.asarray(obs), key)
        return np.asarray(actions), {k: np.asarray(v) for k, v in info.items()}

    def dist_info_sequence(self, params, obs_seq):
        def scan_t(carry, obs_t):
            return self.net.apply(params["net"], carry, obs_t)

        carry0 = self._init_carry(obs_seq.shape[0])
        _, means = jax.lax.scan(scan_t, carry0, jnp.swapaxes(obs_seq, 0, 1))
        means = jnp.swapaxes(means, 0, 1)
        log_std = jnp.broadcast_to(params["log_std"], means.shape)
        return {"mean": means, "log_std": log_std}


class _CategoricalRecurrent(_RecurrentPolicyBase):
    """Recurrent trunk + categorical head (reference
    sandbox/rocky/tf/policies/categorical_{gru,lstm}_policy.py). Actions
    flow as one-hots; dist infos carry ``prob``."""

    CELL = "gru"

    def __init__(self, obs_dim: int, n_actions: int, hidden: int = 32, seed: int = 0):
        self.obs_dim, self.n_actions, self.hidden = obs_dim, n_actions, hidden
        if self.CELL == "gru":
            self.net = _GRUNet(hidden, n_actions)
        else:
            self.net = _LSTMNet(hidden, n_actions)
        carry0 = self._init_carry(1)
        self.params = {"net": self.net.init(jax.random.key(seed), carry0, jnp.zeros((1, obs_dim)))}
        self._carry = None
        self._step = jax.jit(self._step_impl)

    def _init_carry(self, n: int):
        if self.CELL == "gru":
            return jnp.zeros((n, self.hidden))
        return (jnp.zeros((n, self.hidden)), jnp.zeros((n, self.hidden)))

    def _step_impl(self, params, carry, obs, key):
        carry, logits = self.net.apply(params["net"], carry, obs)
        actions = jax.random.categorical(key, logits)
        onehot = jax.nn.one_hot(actions, self.n_actions)
        return carry, onehot, {"prob": jax.nn.softmax(logits)}

    def get_actions(self, obs: np.ndarray, key):
        if self._carry is None:
            self.reset(len(obs))
        else:
            lead = self._carry if self.CELL == "gru" else self._carry[0]
            if lead.shape[0] != len(obs):
                self.reset(len(obs))
        self._carry, onehot, info = self._step(self.params, self._carry, jnp.asarray(obs), key)
        return np.asarray(onehot), {"prob": np.asarray(info["prob"])}

    def get_action(self, obs, key):
        a, info = self.get_actions(np.asarray(obs)[None], key)
        return int(np.argmax(a[0])), {k: v[0] for k, v in info.items()}

    def dist_info_sequence(self, params, obs_seq):
        def scan_t(carry, obs_t):
            return self.net.apply(params["net"], carry, obs_t)

        carry0 = self._init_carry(obs_seq.shape[0])
        _, logits = jax.lax.scan(scan_t, carry0, jnp.swapaxes(obs_seq, 0, 1))
        return {"prob": jax.nn.softmax(jnp.swapaxes(logits, 0, 1))}


class CategoricalGRUPolicy(_CategoricalRecurrent):
    CELL = "gru"


class CategoricalLSTMPolicy(_CategoricalRecurrent):
    CELL = "lstm"


class _ConvNet(nn.Module):
    filters: tuple[int, ...]
    hidden: tuple[int, ...]
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        x = obs
        for f in self.filters:
            x = nn.relu(nn.Conv(f, (3, 3), strides=2)(x))
        x = x.reshape(x.shape[0], -1)
        for h in self.hidden:
            x = jnp.tanh(nn.Dense(h)(x))
        return nn.Dense(self.action_dim)(x)


class GaussianConvPolicy:
    recurrent = False

    def __init__(
        self,
        image_shape: tuple[int, int, int],
        action_dim: int,
        filters=(16, 16),
        hidden=(32,),
        init_std: float = 1.0,
        seed: int = 0,
    ):
        self.image_shape = image_shape
        self.action_dim = action_dim
        self.net = _ConvNet(filters, hidden, action_dim)
        net_params = self.net.init(jax.random.key(seed), jnp.zeros((1, *image_shape)))
        self.params = {"net": net_params, "log_std": jnp.full((action_dim,), np.log(init_std))}
        self._sample = jax.jit(self._sample_impl)

    def dist_info(self, params, obs):
        mean = self.net.apply(params["net"], obs)
        return {"mean": mean, "log_std": jnp.broadcast_to(params["log_std"], mean.shape)}

    def _sample_impl(self, params, obs, key):
        info = self.dist_info(params, obs)
        actions = info["mean"] + jnp.exp(info["log_std"]) * jax.random.normal(key, info["mean"].shape)
        return actions, info

    def get_actions(self, obs: np.ndarray, key):
        a, info = self._sample(self.params, jnp.asarray(obs, jnp.float32), key)
        return np.asarray(a), {k: np.asarray(v) for k, v in info.items()}

    def get_action(self, obs, key):
        a, info = self.get_actions(np.asarray(obs)[None], key)
        return a[0], {k: v[0] for k, v in info.items()}
