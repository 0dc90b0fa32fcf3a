"""Standalone optimizer suite matching the reference inventory.

Reference ``rllab/optimizers/``:

- :class:`FirstOrderOptimizer`   ≙ first_order_optimizer.py (Adam over
  shuffled minibatch epochs).
- :class:`LbfgsOptimizer`        ≙ lbfgs_optimizer.py (full-batch L-BFGS,
  ``max_opt_itr`` steps).
- :class:`PenaltyLbfgsOptimizer` ≙ penalty_lbfgs_optimizer.py (minimize
  ``loss + penalty * constraint`` with L-BFGS, multiplicative penalty search
  until the constraint is met).
- :class:`HessianFreeOptimizer`  ≙ hf.py + hessian_free_optimizer.py
  (Newton-CG: damped Hessian-vector products via jvp-of-grad, conjugate
  gradient solve, backtracking on the loss).

TPU-first shape: every optimizer operates on a FLAT parameter vector and a
user loss ``loss_fn(flat_params, *inputs) -> scalar`` (the penalty form takes
``losses_fn -> (loss, constraint)``), and each inner solve is ONE jitted XLA
program (``lax.scan`` over steps / ``lax.while_loop`` line search) — no
per-step host round trips, unlike the reference's per-minibatch
``compile_function`` calls.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FirstOrderOptimizer:
    """Minibatch first-order optimizer (reference first_order_optimizer.py:
    Adam, ``max_epochs`` passes over shuffled minibatches).

    ``inputs`` are arrays sharing a leading batch axis; each epoch is one
    jitted scan over a freshly permuted batch split.
    """

    def __init__(
        self,
        loss_fn: Callable[..., jnp.ndarray],
        learning_rate: float = 1e-3,
        max_epochs: int = 10,
        batch_size: int | None = 32,
        tolerance: float = 1e-6,
        optimizer: optax.GradientTransformation | None = None,
    ):
        self._loss_fn = loss_fn
        self.max_epochs = max_epochs
        self.batch_size = batch_size
        self.tolerance = tolerance
        self._opt = optimizer or optax.adam(learning_rate)
        self._epoch = jax.jit(self._build_epoch())

    def _build_epoch(self):
        def epoch(flat_params, opt_state, key, inputs):
            n = inputs[0].shape[0]
            bs = n if self.batch_size is None else min(self.batch_size, n)
            n_batches = max(1, n // bs)
            perm = jax.random.permutation(key, n)[: n_batches * bs]
            batched = tuple(x[perm].reshape((n_batches, bs) + x.shape[1:]) for x in inputs)

            def body(carry, batch):
                p, s = carry
                loss, grad = jax.value_and_grad(self._loss_fn)(p, *batch)
                updates, s = self._opt.update(grad, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (flat_params, opt_state), losses = jax.lax.scan(body, (flat_params, opt_state), batched)
            return flat_params, opt_state, jnp.mean(losses)

        return epoch

    def optimize(self, flat_params: jnp.ndarray, inputs: tuple, seed: int = 0):
        opt_state = self._opt.init(flat_params)
        key = jax.random.key(seed)
        inputs = tuple(jnp.asarray(x) for x in inputs)
        last = np.inf
        info: dict[str, Any] = {}
        for ep in range(self.max_epochs):
            key, sub = jax.random.split(key)
            flat_params, opt_state, mean_loss = self._epoch(flat_params, opt_state, sub, inputs)
            mean_loss = float(mean_loss)
            info = dict(Epochs=ep + 1, LossAfter=mean_loss)
            if abs(last - mean_loss) < self.tolerance:
                break
            last = mean_loss
        return flat_params, info


class LbfgsOptimizer:
    """Full-batch L-BFGS (reference lbfgs_optimizer.py, ``max_opt_itr``)."""

    def __init__(self, loss_fn: Callable[..., jnp.ndarray], max_opt_itr: int = 20):
        self._loss_fn = loss_fn
        self.max_opt_itr = max_opt_itr
        self._solve = jax.jit(self._build_solve())

    def _build_solve(self):
        def solve(flat_params, *inputs):
            opt = optax.lbfgs()
            fun = lambda p: self._loss_fn(p, *inputs)

            def body(carry, _):
                p, s = carry
                value, grad = jax.value_and_grad(fun)(p)
                updates, s = opt.update(grad, s, p, value=value, grad=grad, value_fn=fun)
                return (optax.apply_updates(p, updates), s), value

            (p, _), _ = jax.lax.scan(
                body, (flat_params, opt.init(flat_params)), None, length=self.max_opt_itr
            )
            return p, fun(p)

        return solve

    def optimize(self, flat_params: jnp.ndarray, inputs: tuple):
        p, loss = self._solve(flat_params, *(jnp.asarray(x) for x in inputs))
        return p, dict(LossAfter=float(loss))


class PenaltyLbfgsOptimizer:
    """Constrained minimization via a penalized L-BFGS inner solve and a
    multiplicative penalty search (reference penalty_lbfgs_optimizer.py:
    x2 up while the constraint is violated, /2 down when comfortably slack).

    ``losses_fn(flat_params, *inputs) -> (loss, constraint)``.
    """

    def __init__(
        self,
        losses_fn: Callable[..., tuple[jnp.ndarray, jnp.ndarray]],
        max_constraint_val: float = 0.01,
        initial_penalty: float = 1.0,
        min_penalty: float = 1e-2,
        max_penalty: float = 1e6,
        increase_factor: float = 2.0,
        max_penalty_itr: int = 10,
        inner_steps: int = 25,
    ):
        self._losses_fn = losses_fn
        self.max_constraint_val = max_constraint_val
        self.penalty = initial_penalty
        self.min_penalty = min_penalty
        self.max_penalty = max_penalty
        self.increase_factor = increase_factor
        self.max_penalty_itr = max_penalty_itr
        self.inner_steps = inner_steps
        self._solve = jax.jit(self._build_solve())

    def _build_solve(self):
        def solve(flat_params, penalty, *inputs):
            opt = optax.lbfgs()

            def fun(p):
                loss, constraint = self._losses_fn(p, *inputs)
                return loss + penalty * constraint

            def body(carry, _):
                p, s = carry
                value, grad = jax.value_and_grad(fun)(p)
                updates, s = opt.update(grad, s, p, value=value, grad=grad, value_fn=fun)
                return (optax.apply_updates(p, updates), s), value

            (p, _), _ = jax.lax.scan(
                body, (flat_params, opt.init(flat_params)), None, length=self.inner_steps
            )
            loss, constraint = self._losses_fn(p, *inputs)
            return p, loss, constraint

        return solve

    def optimize(self, flat_params: jnp.ndarray, inputs: tuple):
        inputs = tuple(
            jax.tree.map(jnp.asarray, x) if isinstance(x, dict) else jnp.asarray(x) for x in inputs
        )
        loss_before, kl_before = (float(x) for x in self._losses_fn(flat_params, *inputs))
        penalty = float(np.clip(self.penalty, self.min_penalty, self.max_penalty))
        best, best_loss, best_constraint = None, np.inf, np.inf
        scale = None
        for _ in range(self.max_penalty_itr):
            p, loss, constraint = self._solve(flat_params, jnp.float32(penalty), *inputs)
            loss, constraint = float(loss), float(constraint)
            if constraint < self.max_constraint_val or best is None:
                best, best_loss, best_constraint = p, loss, constraint
            if constraint > self.max_constraint_val:
                scale = self.increase_factor
            else:
                if best is not None and constraint < self.max_constraint_val / 2:
                    scale = 1.0 / self.increase_factor
                else:
                    break
            new_penalty = float(np.clip(penalty * scale, self.min_penalty, self.max_penalty))
            if new_penalty == penalty:
                break
            penalty = new_penalty
            if scale < 1 and best_constraint < self.max_constraint_val:
                break
        self.penalty = penalty
        info = dict(
            LossBefore=loss_before,
            LossAfter=best_loss,
            ConstraintBefore=kl_before,
            ConstraintAfter=best_constraint,
            Penalty=penalty,
        )
        return (best if best is not None else flat_params), info


class HessianFreeOptimizer:
    """Newton-CG a.k.a. Hessian-free (reference hf.py): solve
    ``(H + reg·I) dx = -g`` with conjugate gradient, where ``H·v`` is a
    jvp-of-grad product (never materialized), then backtrack on the loss.
    One jitted XLA program per optimize call.
    """

    def __init__(
        self,
        loss_fn: Callable[..., jnp.ndarray],
        cg_iters: int = 10,
        reg_coeff: float = 1e-5,
        backtrack_ratio: float = 0.8,
        max_backtracks: int = 15,
        n_steps: int = 1,
    ):
        self._loss_fn = loss_fn
        self.cg_iters = cg_iters
        self.reg_coeff = reg_coeff
        self.backtrack_ratio = backtrack_ratio
        self.max_backtracks = max_backtracks
        self.n_steps = n_steps
        self._step = jax.jit(self._build_step())

    def _build_step(self):
        def step(flat_params, *inputs):
            fun = lambda p: self._loss_fn(p, *inputs)
            loss0, g = jax.value_and_grad(fun)(flat_params)

            def hvp(v):
                hv = jax.jvp(jax.grad(fun), (flat_params,), (v,))[1]
                return hv + self.reg_coeff * v

            # conjugate gradient on the implicit (damped) Hessian
            def cg_body(_, state):
                x, r, p, rdr = state
                hp = hvp(p)
                alpha = rdr / (jnp.dot(p, hp) + 1e-12)
                x = x + alpha * p
                r = r - alpha * hp
                new_rdr = jnp.dot(r, r)
                p = r + (new_rdr / (rdr + 1e-12)) * p
                return x, r, p, new_rdr

            x0 = jnp.zeros_like(g)
            dx, *_ = jax.lax.fori_loop(
                0, self.cg_iters, cg_body, (x0, g, g, jnp.dot(g, g))
            )

            # backtracking line search: largest step that decreases the loss
            def ls_cond(state):
                k, loss, _ = state
                bad = jnp.isnan(loss) | (loss >= loss0)
                return (k < self.max_backtracks) & bad

            def ls_body(state):
                k, _, _ = state
                ratio = self.backtrack_ratio ** (k + 1.0)
                cand = flat_params - ratio * dx
                return k + 1.0, fun(cand), cand

            first = flat_params - dx
            k, loss, p = jax.lax.while_loop(ls_cond, ls_body, (0.0, fun(first), first))
            ok = jnp.isfinite(loss) & (loss < loss0)
            p = jnp.where(ok, p, flat_params)
            return p, loss0, jnp.where(ok, loss, loss0)

        return step

    def optimize(self, flat_params: jnp.ndarray, inputs: tuple):
        inputs = tuple(jnp.asarray(x) for x in inputs)
        loss_before = loss_after = None
        for _ in range(self.n_steps):
            flat_params, l0, l1 = self._step(flat_params, *inputs)
            loss_before = float(l0) if loss_before is None else loss_before
            loss_after = float(l1)
        return flat_params, dict(LossBefore=loss_before, LossAfter=loss_after)
