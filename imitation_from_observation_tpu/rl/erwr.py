"""ERWR — episodic reward-weighted regression (reference rllab/algos/erwr.py):
policy regression toward its own actions weighted by (positive-shifted)
advantages, ``loss = -mean(weight * logli)``, first-order optimizer."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy


class ERWR:
    def __init__(self, policy: GaussianMLPPolicy, learning_rate: float = 1e-2, inner_steps: int = 10):
        self.policy = policy
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(policy.params)
        self.inner_steps = inner_steps
        self._update = jax.jit(self._build_update())

    def _build_update(self):
        def loss_fn(params, obs, actions, weights):
            info = self.policy.dist_info(params, obs)
            return -jnp.mean(dg.log_likelihood(actions, info) * weights)

        def update(params, opt_state, obs, actions, weights):
            def body(carry, _):
                p, s = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, obs, actions, weights)
                updates, s = self.tx.update(grads, s)
                return (optax.apply_updates(p, updates), s), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=self.inner_steps
            )
            return params, opt_state, losses[-1]

        return update

    def optimize(self, samples: dict[str, Any]) -> dict[str, float]:
        obs = jnp.asarray(samples["observations"], jnp.float32)
        actions = jnp.asarray(samples["actions"], jnp.float32)
        adv = jnp.asarray(samples["advantages"], jnp.float32)
        weights = adv - adv.min()  # ERWR requires nonnegative weights
        self.policy.params, self.opt_state, loss = self._update(
            self.policy.params, self.opt_state, obs, actions, weights
        )
        return {"LossAfter": float(loss)}
