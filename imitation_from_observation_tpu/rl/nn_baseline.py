"""Gaussian NN value baselines.

- :class:`GaussianMLPBaseline` ≙ reference rllab/baselines/
  gaussian_mlp_baseline.py (+ the Gaussian MLP regressor underneath): an MLP
  fit to discounted returns by Adam, normalizing inputs/targets like the
  reference's regressor.
- :class:`GaussianConvBaseline` ≙ rllab/baselines/gaussian_conv_baseline.py
  (+ rllab/regressors/gaussian_conv_regressor.py): a conv value net over
  image observations with a learned output std, fit by Gaussian NLL with
  input/target normalization. The reference optimizes the NLL with
  (penalty-)LBFGS (gaussian_conv_regressor.py:73-77 — that optimizer family
  lives in rl/optimizers.py); here the fit is a jitted Adam scan, the same
  trade the MLP baseline makes (one XLA program per fit; no host round trips
  per line-search step)."""

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


class _ConvValueNet(nn.Module):
    """Conv mean net + free log-std (the regressor's mean ConvNetwork and
    ParamLayer std, gaussian_conv_regressor.py:79-118)."""

    input_shape: tuple[int, int, int]
    conv_filters: tuple[int, ...] = (16, 16)
    conv_strides: tuple[int, ...] = (2, 2)
    hidden: tuple[int, ...] = (32, 32)

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        x = x.reshape(B, *self.input_shape)
        for f, s in zip(self.conv_filters, self.conv_strides):
            x = nn.relu(nn.Conv(f, (3, 3), strides=s)(x))
        x = x.reshape(B, -1)
        for h in self.hidden:
            x = nn.relu(nn.Dense(h)(x))
        mean = nn.Dense(1)(x).squeeze(-1)
        log_std = self.param("log_std", nn.initializers.zeros, ())
        return mean, jnp.broadcast_to(log_std, mean.shape)


class GaussianConvBaseline:
    """Value baseline over image observations (rllab/baselines/
    gaussian_conv_baseline.py). Observations may arrive flat (the sampler's
    layout) or shaped; both reshape to ``input_shape`` inside the net."""

    def __init__(
        self,
        input_shape: tuple[int, int, int],
        conv_filters=(16, 16),
        conv_strides=(2, 2),
        hidden=(32, 32),
        learning_rate: float = 1e-3,
        epochs: int = 10,
        seed: int = 0,
    ):
        self.input_shape = tuple(input_shape)
        flat = int(np.prod(input_shape))
        self.net = _ConvValueNet(self.input_shape, tuple(conv_filters), tuple(conv_strides), tuple(hidden))
        self.params = self.net.init(jax.random.key(seed), jnp.zeros((1, flat)))
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.epochs = epochs
        self._x_mean = np.zeros(flat, np.float32)
        self._x_std = np.ones(flat, np.float32)
        self._y_mean, self._y_std = 0.0, 1.0
        self._fit = jax.jit(self._fit_impl)

    def _flat_obs(self, path) -> np.ndarray:
        o = np.asarray(path["observations"], np.float32)
        return o.reshape(o.shape[0], -1)

    def _fit_impl(self, params, opt_state, x, y):
        def loss_fn(p):
            mean, log_std = self.net.apply(p, x)
            # Gaussian NLL (the regressor's trust-region objective's core,
            # gaussian_conv_regressor.py:140-151) — the learned std keeps the
            # fit honest about return noise instead of plain MSE
            return jnp.mean(0.5 * ((y - mean) / jnp.exp(log_std)) ** 2 + log_std)

        def body(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = self.tx.update(grads, s)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), None, length=self.epochs)
        return params, opt_state, losses[-1]

    def fit(self, paths) -> None:
        x = np.concatenate([self._flat_obs(p) for p in paths])
        y = np.concatenate([p["returns"] for p in paths]).astype(np.float32)
        self._x_mean, self._x_std = x.mean(0), x.std(0) + 1e-6
        self._y_mean, self._y_std = float(y.mean()), float(y.std() + 1e-6)
        xn = (x - self._x_mean) / self._x_std
        yn = (y - self._y_mean) / self._y_std
        self.params, self.opt_state, _ = self._fit(
            self.params, self.opt_state, jnp.asarray(xn), jnp.asarray(yn)
        )

    def predict(self, path) -> np.ndarray:
        x = (self._flat_obs(path) - self._x_mean) / self._x_std
        mean, _ = self.net.apply(self.params, jnp.asarray(x))
        return np.asarray(mean) * self._y_std + self._y_mean
