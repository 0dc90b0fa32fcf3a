"""Vanilla policy gradient (reference rllab/algos/vpg.py): REINFORCE
surrogate ``-mean(logli * advantage)`` with a first-order (Adam) optimizer,
one jitted update."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy


class VPG:
    def __init__(self, policy: GaussianMLPPolicy, learning_rate: float = 1e-3):
        self.policy = policy
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(policy.params)
        self._update = jax.jit(self._build_update())

    def _build_update(self):
        def loss_fn(params, obs, actions, advantages):
            info = self.policy.dist_info(params, obs)
            logli = dg.log_likelihood(actions, info)
            return -jnp.mean(logli * advantages)

        def update(params, opt_state, obs, actions, advantages):
            loss, grads = jax.value_and_grad(loss_fn)(params, obs, actions, advantages)
            updates, opt_state = self.tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return update

    def optimize(self, samples: dict[str, Any]) -> dict[str, float]:
        obs = jnp.asarray(samples["observations"], jnp.float32)
        actions = jnp.asarray(samples["actions"], jnp.float32)
        adv = jnp.asarray(samples["advantages"], jnp.float32)
        params, self.opt_state, loss = self._update(
            self.policy.params, self.opt_state, obs, actions, adv
        )
        self.policy.params = params
        return {"LossAfter": float(loss)}
