"""REPS — relative entropy policy search (reference rllab/algos/reps.py).

Solves the dual for the temperature eta under a KL bound epsilon on the
sample weights, then fits the policy by weighted maximum likelihood:

    g(eta) = eta*eps + eta*log(mean(exp(delta/eta)))   (delta = advantages)
    weights ∝ exp(delta/eta), policy <- argmax mean(w * logli)

The dual is 1-D here (state-independent baseline handles the value part),
solved by scalar minimization; the reference solves the joint
(eta, value-params) dual with L-BFGS — the advantage pipeline already
supplies the value function, so only eta remains.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy


class REPS:
    def __init__(
        self,
        policy: GaussianMLPPolicy,
        epsilon: float = 0.5,
        learning_rate: float = 1e-2,
        inner_steps: int = 20,
    ):
        self.policy = policy
        self.epsilon = epsilon
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(policy.params)
        self.inner_steps = inner_steps
        self._update = jax.jit(self._build_update())

    def _solve_eta(self, delta: np.ndarray) -> float:
        d = delta - delta.max()

        def dual(log_eta):
            eta = np.exp(log_eta)
            return eta * self.epsilon + eta * np.log(np.mean(np.exp(d / eta))) + delta.max()

        # golden-section over log-eta (dual is unimodal in eta)
        lo, hi = -6.0, 6.0
        for _ in range(60):
            m1 = lo + 0.382 * (hi - lo)
            m2 = lo + 0.618 * (hi - lo)
            if dual(m1) < dual(m2):
                hi = m2
            else:
                lo = m1
        return float(np.exp((lo + hi) / 2))

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
        delta = np.asarray(samples["advantages"], np.float64)
        eta = self._solve_eta(delta)
        w = np.exp((delta - delta.max()) / eta)
        w = w / w.mean()
        self.policy.params, self.opt_state, loss = self._update(
            self.policy.params,
            self.opt_state,
            jnp.asarray(samples["observations"], jnp.float32),
            jnp.asarray(samples["actions"], jnp.float32),
            jnp.asarray(w, jnp.float32),
        )
        return {"LossAfter": float(loss), "Eta": eta}
