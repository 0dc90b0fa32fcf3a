"""PPO (penalty form) over the standalone penalty optimizer.

The reference's PPO (rllab/algos/ppo.py) is NPO with a
``PenaltyLbfgsOptimizer``: minimize ``surrogate + penalty * meanKL`` with
L-BFGS, searching the penalty multiplicatively until the KL constraint is
met. The inner solve is optax L-BFGS in one jitted scan; the penalty search
(x2 up when violated, /2 down when slack — penalty_lbfgs_optimizer.py)
runs on host over the jitted solve. See
:class:`~imitation_from_observation_tpu.rl.optimizers.PenaltyLbfgsOptimizer`.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.optimizers import PenaltyLbfgsOptimizer
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
        _, self._unravel = ravel_pytree(policy.params)
        self._opt = PenaltyLbfgsOptimizer(
            self._losses,
            max_constraint_val=step_size,
            initial_penalty=initial_penalty,
            min_penalty=min_penalty,
            max_penalty=max_penalty,
            increase_factor=increase_factor,
            max_penalty_itr=max_penalty_itr,
            inner_steps=inner_steps,
        )

    @property
    def penalty(self) -> float:
        return self._opt.penalty

    @penalty.setter
    def penalty(self, value: float) -> None:
        self._opt.penalty = value

    def _losses(self, flat_params, obs, actions, advantages, old_info):
        params = self._unravel(flat_params)
        info = self.policy.dist_info(params, obs)
        lr = dg.likelihood_ratio(actions, old_info, info)
        surr = -jnp.mean(lr * advantages)
        mean_kl = jnp.mean(dg.kl(old_info, info))
        return surr, mean_kl

    def optimize(self, samples: dict[str, Any]) -> dict[str, float]:
        flat_params, _ = ravel_pytree(self.policy.params)
        inputs = (
            jnp.asarray(samples["observations"], jnp.float32),
            jnp.asarray(samples["actions"], jnp.float32),
            jnp.asarray(samples["advantages"], jnp.float32),
            {
                "mean": jnp.asarray(samples["agent_infos"]["mean"], jnp.float32),
                "log_std": jnp.asarray(samples["agent_infos"]["log_std"], jnp.float32),
            },
        )
        p, info = self._opt.optimize(flat_params, inputs)
        # reference penalty_lbfgs_optimizer accepted a step only with a
        # finite loss; keep that plus a finite-params guard
        if np.isfinite(info["LossAfter"]) and np.all(np.isfinite(np.asarray(p))):
            self.policy.params = self._unravel(p)
        return dict(
            LossBefore=info["LossBefore"],
            LossAfter=info["LossAfter"],
            MeanKLBefore=info["ConstraintBefore"],
            MeanKL=info["ConstraintAfter"],
            dLoss=info["LossBefore"] - info["LossAfter"],
            Penalty=info["Penalty"],
        )
