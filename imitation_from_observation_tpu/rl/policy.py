"""Gaussian MLP policy.

Capability match for reference ``rllab/policies/gaussian_mlp_policy.py:20-140``:
tanh MLP mean head, a free log-std parameter initialized at ``log(init_std)``
(init_std=10 in the launchers, run_trpo_push.py:144), min-std clamp, and the
``dist_info -> sample`` split the TRPO machinery needs. Batched inference is
one jitted forward; sampling threads explicit PRNG keys.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _MeanNet(nn.Module):
    hidden: tuple[int, ...]
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        x = obs
        for h in self.hidden:
            x = jnp.tanh(nn.Dense(h, kernel_init=nn.initializers.xavier_uniform())(x))
        return nn.Dense(self.action_dim, kernel_init=nn.initializers.xavier_uniform())(x)


class GaussianMLPPolicy:
    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        hidden: tuple[int, ...] = (32, 32),
        init_std: float = 1.0,
        min_std: float = 1e-6,
        seed: int = 0,
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.min_std = min_std
        self.net = _MeanNet(hidden, action_dim)
        net_params = self.net.init(jax.random.key(seed), jnp.zeros((1, obs_dim)))
        self.params = {
            "net": net_params,
            "log_std": jnp.full((action_dim,), np.log(init_std), jnp.float32),
        }
        self._dist_info_jit = jax.jit(self.dist_info)
        self.recurrent = False

    def dist_info(self, params: Any, obs: jax.Array) -> dict[str, jax.Array]:
        mean = self.net.apply(params["net"], obs)
        log_std = jnp.maximum(params["log_std"], np.log(self.min_std))
        log_std = jnp.broadcast_to(log_std, mean.shape)
        return {"mean": mean, "log_std": log_std}

    def sample(self, params: Any, obs: jax.Array, key: jax.Array):
        info = self.dist_info(params, obs)
        noise = jax.random.normal(key, info["mean"].shape)
        actions = info["mean"] + jnp.exp(info["log_std"]) * noise
        return actions, info

    # -- host-facing API ---------------------------------------------------
    def get_actions(self, obs: np.ndarray, key: jax.Array):
        """Batched action sampling for the vectorized sampler."""
        actions, info = _sample_jit(self, self.params, jnp.asarray(obs), key)
        return np.asarray(actions), {
            "mean": np.asarray(info["mean"]),
            "log_std": np.asarray(info["log_std"]),
        }

    def get_action(self, obs: np.ndarray, key: jax.Array):
        actions, infos = self.get_actions(obs[None], key)
        return actions[0], {k: v[0] for k, v in infos.items()}


# jitted per (policy-instance id); the closure captures static net topology
_sample_cache: dict[int, Any] = {}


def _sample_jit(policy: GaussianMLPPolicy, params, obs, key):
    fn = _sample_cache.get(id(policy))
    if fn is None:
        fn = jax.jit(lambda p, o, k: policy.sample(p, o, k))
        _sample_cache[id(policy)] = fn
    return fn(params, obs, key)
