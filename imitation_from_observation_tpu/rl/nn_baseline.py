"""Gaussian MLP value baseline (reference rllab/baselines/
gaussian_mlp_baseline.py + the regressor underneath): an MLP fit to
discounted returns by Adam, normalizing inputs/targets like the reference's
regressor."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class _ValueNet(nn.Module):
    hidden: tuple[int, ...] = (32, 32)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = jnp.tanh(nn.Dense(h)(x))
        return nn.Dense(1)(x).squeeze(-1)


class GaussianMLPBaseline:
    def __init__(self, obs_dim: int, hidden=(32, 32), learning_rate: float = 1e-3, epochs: int = 10, seed: int = 0):
        self.net = _ValueNet(hidden)
        self.params = self.net.init(jax.random.key(seed), jnp.zeros((1, obs_dim + 1)))
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.epochs = epochs
        self._x_mean = np.zeros(obs_dim + 1, np.float32)
        self._x_std = np.ones(obs_dim + 1, np.float32)
        self._y_mean, self._y_std = 0.0, 1.0
        self._fit = jax.jit(self._fit_impl)

    def _features(self, path) -> np.ndarray:
        o = np.clip(path["observations"], -10, 10).astype(np.float32)
        t = (np.arange(len(path["rewards"])) / 100.0).astype(np.float32)[:, None]
        return np.concatenate([o, t], axis=1)

    def _fit_impl(self, params, opt_state, x, y):
        def loss_fn(p):
            return jnp.mean((self.net.apply(p, x) - y) ** 2)

        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = self.tx.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None, length=self.epochs)
        return params, opt_state, losses[-1]

    def fit(self, paths) -> None:
        x = np.concatenate([self._features(p) for p in paths])
        y = np.concatenate([p["returns"] for p in paths]).astype(np.float32)
        self._x_mean, self._x_std = x.mean(0), x.std(0) + 1e-6
        self._y_mean, self._y_std = float(y.mean()), float(y.std() + 1e-6)
        xn = (x - self._x_mean) / self._x_std
        yn = (y - self._y_mean) / self._y_std
        self.params, self.opt_state, _ = self._fit(
            self.params, self.opt_state, jnp.asarray(xn), jnp.asarray(yn)
        )

    def predict(self, path) -> np.ndarray:
        x = (self._features(path) - self._x_mean) / self._x_std
        yn = np.asarray(self.net.apply(self.params, jnp.asarray(x)))
        return yn * self._y_std + self._y_mean
