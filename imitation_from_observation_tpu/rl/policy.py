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
    """``sample_on_host=True`` (the default on remote-TPU backends) runs the
    per-step sampling forward on the host CPU backend with a cached copy of
    the params — a 32x32 MLP call is microseconds on host but pays a full
    network round trip on a remote accelerator. The copy is invalidated
    whenever ``params`` is assigned (i.e. after each optimizer update)."""

    def __init__(
        self,
        obs_dim: int,
        action_dim: int,
        hidden: tuple[int, ...] = (32, 32),
        init_std: float = 1.0,
        min_std: float = 1e-6,
        seed: int = 0,
        sample_on_host: bool | None = None,
    ):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.min_std = min_std
        self.net = _MeanNet(hidden, action_dim)
        net_params = self.net.init(jax.random.key(seed), jnp.zeros((1, obs_dim)))
        self._params = {
            "net": net_params,
            "log_std": jnp.full((action_dim,), np.log(init_std), jnp.float32),
        }
        self._params_host = None
        if sample_on_host is None:
            sample_on_host = jax.default_backend() != "cpu"
        self._sample_on_host = sample_on_host
        self._host_device = None
        if sample_on_host:
            try:
                self._host_device = jax.local_devices(backend="cpu")[0]
            except RuntimeError:
                self._sample_on_host = False
        self.recurrent = False

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        self._params = value
        self._params_host = None

    def _sampling_params(self):
        if not self._sample_on_host:
            return self._params
        if self._params_host is None:
            self._params_host = jax.device_put(self._params, self._host_device)
        return self._params_host

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
        actions, info = _sample_jit(self, self._sampling_params(), np.asarray(obs), key)
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
        device = policy._host_device if policy._sample_on_host else None
        fn = jax.jit(lambda p, o, k: policy.sample(p, o, k), device=device)
        _sample_cache[id(policy)] = fn
    return fn(params, obs, key)
