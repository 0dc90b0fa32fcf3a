"""TRPO: natural policy gradient with a KL trust region, fully jittable.

Re-architecture of the reference's Theano machinery
(rllab/algos/npo.py:33-123 + rllab/optimizers/conjugate_gradient_optimizer.py
+ rllab/misc/krylov.py:7-39) as ONE jitted TPU function:

- surrogate loss ``-mean(likelihood_ratio * advantage)`` and mean-KL
  constraint (npo.py:79-81)
- Perlmutter HVP via ``jax.jvp`` of the KL gradient (replacing the Theano
  double-backprop graph, conjugate_gradient_optimizer.py:31-46), damped with
  ``reg_coeff``
- conjugate gradient solve, ``cg_iters`` fixed iterations (krylov.cg)
- initial step ``sqrt(2*delta / (d^T H d))`` with NaN fallback to 1
  (conjugate_gradient_optimizer.py:260-266)
- backtracking line search over ``backtrack_ratio**k`` accepting the first
  step that improves the loss within the KL bound; on full failure the old
  params are kept (the NaN-rejection behavior at :272-293)

The whole update — gradients, 10 CG iterations (each one HVP), and up to 15
line-search loss/KL evaluations — compiles to a single XLA program; no
host-device ping-pong per CG iteration like the reference's per-call
``sess.run``/Theano function dispatches.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from imitation_from_observation_tpu.rl import distributions as dg
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy


class TRPO:
    def __init__(
        self,
        policy: GaussianMLPPolicy,
        step_size: float = 0.01,
        cg_iters: int = 10,
        reg_coeff: float = 1e-5,
        backtrack_ratio: float = 0.8,
        max_backtracks: int = 15,
        accept_violation: bool = False,
        truncate_local_is_ratio: float | None = None,
        hvp_mode: str = "perlmutter",  # perlmutter | fd (FiniteDifferenceHvp)
        fd_eps: float = 1e-5,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        the update then runs data-parallel: the sample batch shards over the
        mesh, params replicate, and XLA inserts the psum for every batch-mean
        in the loss/gradient/HVP (SURVEY §2.7's gradient-parallelism row;
        the reference ran its optimizer single-device,
        conjugate_gradient_optimizer.py:229-296)."""
        self.policy = policy
        self.step_size = step_size
        self.cg_iters = cg_iters
        self.reg_coeff = reg_coeff
        self.backtrack_ratio = backtrack_ratio
        self.max_backtracks = max_backtracks
        self.accept_violation = accept_violation
        self.truncate_local_is_ratio = truncate_local_is_ratio
        if hvp_mode not in ("perlmutter", "fd"):
            raise ValueError(f"unknown hvp_mode {hvp_mode!r}")
        self.hvp_mode = hvp_mode
        self.fd_eps = fd_eps
        self.mesh = mesh
        _, self._unravel = ravel_pytree(policy.params)
        self._update = jax.jit(self._build_update())

    # -- losses ------------------------------------------------------------
    def _surr_loss_kl(self, flat_params, obs, actions, advantages, old_info, valids=None):
        """Non-recurrent: flat [N, ...] batches, plain means (npo.py:80-81).
        Recurrent: padded [B, T, ...] with a valids mask, valid-weighted
        means (npo.py:77-79). The distribution family dispatches on the info
        keys, like the reference's per-policy ``distribution`` property
        (npo.py:45): ``prob`` -> categorical, else diagonal Gaussian."""
        params = self._unravel(flat_params)
        if getattr(self.policy, "recurrent", False):
            info = self.policy.dist_info_sequence(params, obs)
        else:
            info = self.policy.dist_info(params, obs)
        if "prob" in old_info:
            probs = old_info["prob"]
            acts = actions
            if acts.ndim < probs.ndim:  # integer actions -> one-hot
                acts = jax.nn.one_hot(acts.astype(jnp.int32), probs.shape[-1])
            lr = dg.categorical_likelihood_ratio(acts, old_info, info)
            kl = dg.categorical_kl(old_info, info)
        else:
            lr = dg.likelihood_ratio(actions, old_info, info)
            kl = dg.kl(old_info, info)
        if self.truncate_local_is_ratio is not None:
            lr = jnp.minimum(self.truncate_local_is_ratio, lr)
        if valids is not None:
            n = jnp.sum(valids)
            surr = -jnp.sum(lr * advantages * valids) / n
            mean_kl = jnp.sum(kl * valids) / n
        else:
            surr = -jnp.mean(lr * advantages)
            mean_kl = jnp.mean(kl)
        return surr, mean_kl

    def _build_update(self):
        def loss_fn(fp, obs, actions, adv, old, valids):
            return self._surr_loss_kl(fp, obs, actions, adv, old, valids)[0]

        def kl_fn(fp, obs, actions, adv, old, valids):
            return self._surr_loss_kl(fp, obs, actions, adv, old, valids)[1]

        def update(flat_params, obs, actions, advantages, old_info, valids):
            args = (obs, actions, advantages, old_info, valids)
            loss_before = loss_fn(flat_params, *args)
            flat_g = jax.grad(loss_fn)(flat_params, *args)

            kl_grad = jax.grad(kl_fn)

            if self.hvp_mode == "fd":
                # symmetric finite differences on the KL gradient (reference
                # FiniteDifferenceHvp, conjugate_gradient_optimizer.py:58-115)
                def hvp(v):
                    eps = self.fd_eps / (jnp.linalg.norm(flat_params) + 1e-8)
                    gp = kl_grad(flat_params + eps * v, *args)
                    gm = kl_grad(flat_params - eps * v, *args)
                    return (gp - gm) / (2 * eps) + self.reg_coeff * v

            else:

                def hvp(v):
                    # Perlmutter: H v = d/de grad_kl(theta + e v) |_{e=0}
                    _, hv = jax.jvp(lambda fp: kl_grad(fp, *args), (flat_params,), (v,))
                    return hv + self.reg_coeff * v

            # conjugate gradient (krylov.cg, fixed iteration count)
            def cg_body(_, state):
                x, r, p, rdotr = state
                z = hvp(p)
                v = rdotr / (jnp.dot(p, z) + 1e-18)
                x = x + v * p
                r = r - v * z
                newrdotr = jnp.dot(r, r)
                mu = newrdotr / (rdotr + 1e-18)
                p = r + mu * p
                return x, r, p, newrdotr

            x0 = jnp.zeros_like(flat_g)
            descent, *_ = jax.lax.fori_loop(
                0, self.cg_iters, cg_body, (x0, flat_g, flat_g, jnp.dot(flat_g, flat_g))
            )

            dHd = jnp.dot(descent, hvp(descent))
            initial_step = jnp.sqrt(2.0 * self.step_size / (dHd + 1e-8))
            initial_step = jnp.where(jnp.isnan(initial_step), 1.0, initial_step)
            full_step = initial_step * descent

            # backtracking line search
            def try_ratio(k):
                ratio = self.backtrack_ratio**k
                cand = flat_params - ratio * full_step
                loss, kl = self._surr_loss_kl(cand, *args)
                ok = (loss < loss_before) & (kl <= self.step_size)
                return cand, loss, kl, ok

            def ls_cond(state):
                k, _, _, _, ok = state
                return (~ok) & (k < self.max_backtracks)

            def ls_body(state):
                k, *_ = state
                cand, loss, kl, ok = try_ratio(k)
                return k + 1, cand, loss, kl, ok

            cand0, loss0, kl0, ok0 = try_ratio(0)
            n_iter, cand, loss, kl, ok = jax.lax.while_loop(
                ls_cond, ls_body, (1, cand0, loss0, kl0, ok0)
            )

            # reference acceptance rule (conjugate_gradient_optimizer.py:280-293):
            # reject the step — keep old params — if the last tried candidate
            # is NaN, doesn't improve, or violates the KL bound
            violated = (
                jnp.isnan(loss)
                | jnp.isnan(kl)
                | (loss >= loss_before)
                | (kl >= self.step_size)
            )
            reject = violated & jnp.logical_not(jnp.asarray(self.accept_violation))
            new_params = jnp.where(reject, flat_params, cand)
            # recompute final diagnostics at the accepted point
            loss_after, kl_after = self._surr_loss_kl(new_params, *args)
            return new_params, dict(
                LossBefore=loss_before,
                LossAfter=loss_after,
                MeanKLBefore=kl_fn(flat_params, *args),
                MeanKL=kl_after,
                dLoss=loss_before - loss_after,
                BacktrackIters=n_iter,
            )

        return update

    # -- host api ----------------------------------------------------------
    def optimize(self, samples: dict[str, Any]) -> dict[str, float]:
        flat_params, _ = ravel_pytree(self.policy.params)
        obs = np.asarray(samples["observations"], np.float32)
        actions = np.asarray(samples["actions"], np.float32)
        adv = np.asarray(samples["advantages"], np.float32)
        infos = samples["agent_infos"]
        dist_keys = ("prob",) if "prob" in infos else ("mean", "log_std")
        old_info = {k: np.asarray(infos[k], np.float32) for k in dist_keys}
        if "valids" in samples:
            valids = np.asarray(samples["valids"], np.float32)
        else:
            valids = np.ones(obs.shape[0], np.float32)
        if self.mesh is not None and not getattr(self.policy, "recurrent", False):
            from jax.sharding import NamedSharding, PartitionSpec as P

            # pad the batch to a device multiple with valids=0 rows (every
            # reduction in the update is valid-weighted, so padding is exact)
            n_dev = self.mesh.devices.size
            pad = (-obs.shape[0]) % n_dev
            if pad:
                zpad = lambda a: np.concatenate(
                    [a, np.zeros((pad, *a.shape[1:]), a.dtype)]
                )
                obs, actions, adv = zpad(obs), zpad(actions), zpad(adv)
                old_info = {k: zpad(v) for k, v in old_info.items()}
                valids = np.concatenate([valids, np.zeros(pad, np.float32)])
            shard = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            put = lambda a: jax.device_put(jnp.asarray(a), shard)
            obs, actions, adv, valids = put(obs), put(actions), put(adv), put(valids)
            old_info = {k: put(v) for k, v in old_info.items()}
            flat_params = jax.device_put(flat_params, rep)
        new_flat, diag = self._update(flat_params, obs, actions, adv, old_info, valids)
        self.policy.params = self._unravel(new_flat)
        return {k: float(v) for k, v in diag.items()}
