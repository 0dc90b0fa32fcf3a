"""Standalone regressor suite.

Capability match for the reference's ``sandbox/rocky/tf/regressors/``:

- :class:`GaussianMLPRegressor` ≙ gaussian_mlp_regressor.py — MLP mean +
  parameterized std trained by maximum likelihood, with input/output
  normalization.
- :class:`DeterministicMLPRegressor` ≙ deterministic_mlp_regressor.py — MSE.
- :class:`CategoricalMLPRegressor` ≙ categorical_mlp_regressor.py — softmax
  cross-entropy over one-hot targets, ``predict`` returns argmax one-hots.
- :class:`BernoulliMLPRegressor` ≙ bernoulli_mlp_regressor.py — per-dim
  sigmoid cross-entropy.

TPU-first shape: each ``fit`` runs a fixed number of full-batch Adam steps
as ONE jitted ``lax.scan`` (the reference looped sess.run per step through
its LbfgsOptimizer/FirstOrderOptimizer); predict is a single jitted forward.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class _MLP(nn.Module):
    hidden: tuple[int, ...]
    out_dim: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = jnp.tanh(nn.Dense(h)(x))
        return nn.Dense(self.out_dim)(x)


class _RegressorBase:
    """Common fit machinery: normalization + fused Adam scan."""

    def __init__(self, in_dim, out_dim, hidden=(32, 32), learning_rate=1e-2,
                 n_steps=200, normalize_inputs=True, seed=0):
        self.in_dim, self.out_dim = in_dim, out_dim
        self.net = _MLP(tuple(hidden), self._net_out_dim())
        self.params = self.net.init(jax.random.key(seed), jnp.zeros((1, in_dim)))
        self.n_steps = n_steps
        self.normalize_inputs = normalize_inputs
        self._x_mean = np.zeros(in_dim, np.float32)
        self._x_std = np.ones(in_dim, np.float32)
        self._opt = optax.adam(learning_rate)

        def fit_scan(params, xs, ys):
            opt_state = self._opt.init(params)

            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(self._loss)(params, xs, ys)
                updates, opt_state = self._opt.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, _), losses = jax.lax.scan(body, (params, opt_state), None, length=n_steps)
            return params, losses[-1]

        self._fit = jax.jit(fit_scan)
        self._fwd = jax.jit(lambda p, x: self.net.apply(p, x))

    def _net_out_dim(self) -> int:
        return self.out_dim

    def _norm_x(self, xs: np.ndarray) -> jnp.ndarray:
        return jnp.asarray((xs - self._x_mean) / self._x_std, jnp.float32)

    def fit(self, xs: np.ndarray, ys: np.ndarray) -> float:
        xs = np.asarray(xs, np.float32)
        ys = np.asarray(ys, np.float32)
        if self.normalize_inputs:
            self._x_mean = xs.mean(0)
            self._x_std = xs.std(0) + 1e-8
        self.params, loss = self._fit(self.params, self._norm_x(xs), jnp.asarray(ys))
        return float(loss)

    # subclass hook
    def _loss(self, params, xs, ys):
        raise NotImplementedError


class DeterministicMLPRegressor(_RegressorBase):
    def _loss(self, params, xs, ys):
        return jnp.mean(jnp.square(self.net.apply(params, xs) - ys))

    def predict(self, xs: np.ndarray) -> np.ndarray:
        return np.asarray(self._fwd(self.params, self._norm_x(xs)))


class GaussianMLPRegressor(_RegressorBase):
    """MLP mean + global log-std, max-likelihood fit; optional output
    normalization (reference gaussian_mlp_regressor.py's normalize_outputs)."""

    def __init__(self, *args, normalize_outputs=True, **kw):
        self.normalize_outputs = normalize_outputs
        super().__init__(*args, **kw)
        self._y_mean = np.zeros(self.out_dim, np.float32)
        self._y_std = np.ones(self.out_dim, np.float32)
        self.params = {"net": self.params, "log_std": jnp.zeros(self.out_dim)}
        self._fwd = jax.jit(lambda p, x: self.net.apply(p["net"], x))

    def _loss(self, params, xs, ys):
        mean = self.net.apply(params["net"], xs)
        log_std = params["log_std"]
        z = (ys - mean) / jnp.exp(log_std)
        nll = jnp.sum(log_std) + 0.5 * jnp.mean(jnp.sum(z**2, -1))
        return nll

    def fit(self, xs, ys) -> float:
        ys = np.asarray(ys, np.float32)
        if self.normalize_outputs:
            self._y_mean = ys.mean(0)
            self._y_std = ys.std(0) + 1e-8
        return super().fit(xs, (ys - self._y_mean) / self._y_std)

    def predict(self, xs) -> np.ndarray:
        mean = np.asarray(self._fwd(self.params, self._norm_x(np.asarray(xs, np.float32))))
        return mean * self._y_std + self._y_mean

    def predict_log_likelihood(self, xs, ys) -> np.ndarray:
        mean = self.predict(xs)
        std = np.exp(np.asarray(self.params["log_std"])) * self._y_std
        z = (np.asarray(ys) - mean) / std
        return -np.sum(np.log(std)) - 0.5 * np.sum(z**2, -1) - 0.5 * self.out_dim * np.log(2 * np.pi)


class CategoricalMLPRegressor(_RegressorBase):
    def _loss(self, params, xs, ys):
        logits = self.net.apply(params, xs)
        return -jnp.mean(jnp.sum(ys * jax.nn.log_softmax(logits), -1))

    def predict_prob(self, xs) -> np.ndarray:
        logits = self._fwd(self.params, self._norm_x(np.asarray(xs, np.float32)))
        return np.asarray(jax.nn.softmax(logits))

    def predict(self, xs) -> np.ndarray:
        prob = self.predict_prob(xs)
        out = np.zeros_like(prob)
        out[np.arange(len(prob)), prob.argmax(1)] = 1.0
        return out

    def predict_log_likelihood(self, xs, ys) -> np.ndarray:
        prob = self.predict_prob(xs)
        return np.log(np.sum(prob * np.asarray(ys), -1) + 1e-8)


class BernoulliMLPRegressor(_RegressorBase):
    def _loss(self, params, xs, ys):
        logits = self.net.apply(params, xs)
        return jnp.mean(
            jnp.sum(optax.sigmoid_binary_cross_entropy(logits, ys), -1)
        )

    def predict_p(self, xs) -> np.ndarray:
        logits = self._fwd(self.params, self._norm_x(np.asarray(xs, np.float32)))
        return np.asarray(jax.nn.sigmoid(logits))

    def predict(self, xs) -> np.ndarray:
        return (self.predict_p(xs) > 0.5).astype(np.float32)

    def predict_log_likelihood(self, xs, ys) -> np.ndarray:
        p = self.predict_p(xs)
        y = np.asarray(ys)
        return np.sum(y * np.log(p + 1e-8) + (1 - y) * np.log(1 - p + 1e-8), -1)
