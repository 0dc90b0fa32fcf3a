"""PPO (penalty form) and the penalty optimizer.

The reference's PPO (rllab/algos/ppo.py) is NPO with a
``PenaltyLbfgsOptimizer``: minimize ``surrogate + penalty * meanKL`` with
L-BFGS, searching the penalty multiplicatively until the KL constraint is
met. Here the inner solve is optax L-BFGS under jit; the penalty search
(x2 up when violated, /2 down when slack — penalty_lbfgs_optimizer.py)
runs on host over the jitted solve.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy


class PPO:
    def __init__(
        self,
        policy: GaussianMLPPolicy,
        step_size: float = 0.01,
        initial_penalty: float = 1.0,
        min_penalty: float = 1e-2,
        max_penalty: float = 1e6,
        increase_factor: float = 2.0,
        max_penalty_itr: int = 10,
        inner_steps: int = 25,
    ):
        self.policy = policy
        self.step_size = step_size
        self.penalty = initial_penalty
        self.min_penalty = min_penalty
        self.max_penalty = max_penalty
        self.increase_factor = increase_factor
        self.max_penalty_itr = max_penalty_itr
        self.inner_steps = inner_steps
        _, self._unravel = ravel_pytree(policy.params)
        self._solve = jax.jit(self._build_solve())

    def _losses(self, flat_params, obs, actions, advantages, old_info):
        params = self._unravel(flat_params)
        info = self.policy.dist_info(params, obs)
        lr = dg.likelihood_ratio(actions, old_info, info)
        surr = -jnp.mean(lr * advantages)
        mean_kl = jnp.mean(dg.kl(old_info, info))
        return surr, mean_kl

    def _build_solve(self):
        def penalized(flat_params, penalty, *args):
            surr, kl = self._losses(flat_params, *args)
            return surr + penalty * kl

        def solve(flat_params, penalty, obs, actions, advantages, old_info):
            args = (obs, actions, advantages, old_info)
            opt = optax.lbfgs()
            state = opt.init(flat_params)
            fun = lambda p: penalized(p, penalty, *args)

            def body(carry, _):
                p, s = carry
                value, grad = jax.value_and_grad(fun)(p)
                updates, s = opt.update(grad, s, p, value=value, grad=grad, value_fn=fun)
                return (optax.apply_updates(p, updates), s), value

            (p, _), _ = jax.lax.scan(body, (flat_params, state), None, length=self.inner_steps)
            surr, kl = self._losses(p, *args)
            return p, surr, kl

        return solve

    def optimize(self, samples: dict[str, Any]) -> dict[str, float]:
        flat_params, _ = ravel_pytree(self.policy.params)
        obs = jnp.asarray(samples["observations"], jnp.float32)
        actions = jnp.asarray(samples["actions"], jnp.float32)
        adv = jnp.asarray(samples["advantages"], jnp.float32)
        old = {
            "mean": jnp.asarray(samples["agent_infos"]["mean"], jnp.float32),
            "log_std": jnp.asarray(samples["agent_infos"]["log_std"], jnp.float32),
        }
        loss_before, kl_before = (float(x) for x in self._losses(flat_params, obs, actions, adv, old))
        penalty = float(np.clip(self.penalty, self.min_penalty, self.max_penalty))
        best, best_loss, best_kl = None, np.inf, np.inf
        scale = None
        for _ in range(self.max_penalty_itr):
            p, surr, kl = self._solve(flat_params, jnp.float32(penalty), obs, actions, adv, old)
            surr, kl = float(surr), float(kl)
            if kl < self.step_size or (best is None):
                best, best_loss, best_kl = p, surr, kl
            # penalty search (penalty_lbfgs_optimizer.py): too much KL ->
            # raise penalty; comfortably inside -> lower it and stop
            if kl > self.step_size:
                scale = self.increase_factor
            else:
                if best is not None and kl < self.step_size / 2:
                    scale = 1.0 / self.increase_factor
                else:
                    break
            new_penalty = float(np.clip(penalty * scale, self.min_penalty, self.max_penalty))
            if new_penalty == penalty:
                break
            penalty = new_penalty
            if scale < 1 and best_kl < self.step_size:
                break
        self.penalty = penalty
        if best is not None and np.isfinite(best_loss):
            self.policy.params = self._unravel(best)
        return dict(
            LossBefore=loss_before,
            LossAfter=best_loss,
            MeanKLBefore=kl_before,
            MeanKL=best_kl,
            dLoss=loss_before - best_loss,
            Penalty=penalty,
        )
