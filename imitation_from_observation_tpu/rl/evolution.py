"""Gradient-free policy search: CEM and CMA-ES.

Capability match for reference ``rllab/algos/cem.py`` (cross-entropy method:
sample parameter vectors from a diagonal Gaussian, keep the elite fraction,
refit, with extra_std decaying over iterations) and ``rllab/algos/cma_es.py``
(which drives a vendored 8.8k-line ``cma_es_lib``; here a compact standard
CMA-ES — covariance matrix adaptation with rank-1 + rank-mu updates).

These optimize episodic return directly: each candidate is evaluated by
rolling out the policy with its parameters.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
from jax.flatten_util import ravel_pytree


class CEM:
    def __init__(
        self,
        policy,
        evaluate: Callable[[Any], float],  # params pytree -> mean return
        n_samples: int = 20,
        best_frac: float = 0.05,
        init_std: float = 1.0,
        extra_std: float = 1.0,
        extra_decay_time: int = 100,
        seed: int = 0,
    ):
        self.policy = policy
        self.evaluate = evaluate
        self.n_samples = n_samples
        self.best_frac = best_frac
        self.extra_std = extra_std
        self.extra_decay_time = extra_decay_time
        flat, self._unravel = ravel_pytree(policy.params)
        self.mean = np.asarray(flat, np.float64)
        self.std = np.full_like(self.mean, init_std)
        self.rng = np.random.default_rng(seed)
        self.itr = 0

    def step(self) -> dict[str, float]:
        extra_var_mult = max(1.0 - self.itr / self.extra_decay_time, 0.0)
        sample_std = np.sqrt(self.std**2 + (self.extra_std**2) * extra_var_mult)
        xs = self.mean + sample_std * self.rng.standard_normal((self.n_samples, len(self.mean)))
        fs = np.array([self.evaluate(self._unravel(x.astype(np.float32))) for x in xs])
        n_best = max(1, int(self.n_samples * self.best_frac))
        best = xs[np.argsort(-fs)[:n_best]]
        self.mean = best.mean(axis=0)
        self.std = best.std(axis=0)
        self.policy.params = self._unravel(self.mean.astype(np.float32))
        self.itr += 1
        return dict(AverageReturn=float(fs.mean()), BestReturn=float(fs.max()))


class CMAES:
    def __init__(
        self,
        policy,
        evaluate: Callable[[Any], float],
        n_samples: int | None = None,
        sigma: float = 0.5,
        seed: int = 0,
    ):
        self.policy = policy
        self.evaluate = evaluate
        flat, self._unravel = ravel_pytree(policy.params)
        self.mean = np.asarray(flat, np.float64)
        n = len(self.mean)
        self.n = n
        self.sigma = sigma
        self.lam = n_samples or (4 + int(3 * np.log(n)))
        self.mu = self.lam // 2
        w = np.log(self.mu + 0.5) - np.log(np.arange(1, self.mu + 1))
        self.weights = w / w.sum()
        self.mueff = 1.0 / np.sum(self.weights**2)
        self.cc = (4 + self.mueff / n) / (n + 4 + 2 * self.mueff / n)
        self.cs = (self.mueff + 2) / (n + self.mueff + 5)
        self.c1 = 2 / ((n + 1.3) ** 2 + self.mueff)
        self.cmu = min(1 - self.c1, 2 * (self.mueff - 2 + 1 / self.mueff) / ((n + 2) ** 2 + self.mueff))
        self.damps = 1 + 2 * max(0, np.sqrt((self.mueff - 1) / (n + 1)) - 1) + self.cs
        self.pc = np.zeros(n)
        self.ps = np.zeros(n)
        self.C = np.eye(n)
        self.chiN = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n**2))
        self.rng = np.random.default_rng(seed)
        self.itr = 0

    def step(self) -> dict[str, float]:
        D2, B = np.linalg.eigh(self.C)
        D = np.sqrt(np.maximum(D2, 1e-20))
        zs = self.rng.standard_normal((self.lam, self.n))
        ys = zs @ np.diag(D) @ B.T
        xs = self.mean + self.sigma * ys
        fs = np.array([self.evaluate(self._unravel(x.astype(np.float32))) for x in xs])
        order = np.argsort(-fs)  # maximize
        y_sel = ys[order[: self.mu]]
        y_w = self.weights @ y_sel
        self.mean = self.mean + self.sigma * y_w
        # step-size control
        C_inv_sqrt = B @ np.diag(1.0 / D) @ B.T
        self.ps = (1 - self.cs) * self.ps + np.sqrt(self.cs * (2 - self.cs) * self.mueff) * (
            C_inv_sqrt @ y_w
        )
        self.sigma *= np.exp((self.cs / self.damps) * (np.linalg.norm(self.ps) / self.chiN - 1))
        # covariance update
        hsig = np.linalg.norm(self.ps) / np.sqrt(
            1 - (1 - self.cs) ** (2 * (self.itr + 1))
        ) / self.chiN < 1.4 + 2 / (self.n + 1)
        self.pc = (1 - self.cc) * self.pc + hsig * np.sqrt(self.cc * (2 - self.cc) * self.mueff) * y_w
        rank1 = np.outer(self.pc, self.pc)
        rankmu = sum(w * np.outer(y, y) for w, y in zip(self.weights, y_sel))
        self.C = (
            (1 - self.c1 - self.cmu) * self.C
            + self.c1 * (rank1 + (1 - hsig) * self.cc * (2 - self.cc) * self.C)
            + self.cmu * rankmu
        )
        self.policy.params = self._unravel(self.mean.astype(np.float32))
        self.itr += 1
        return dict(AverageReturn=float(fs.mean()), BestReturn=float(fs.max()), Sigma=float(self.sigma))


def make_return_evaluator(vec_env, policy, max_path_length: int, n_paths: int = 4, seed: int = 0):
    """Evaluate a parameter vector by mean episodic (dense) return."""
    from imitation_from_observation_tpu.core.rng import RngStream
    from imitation_from_observation_tpu.rl.sampler import rollout

    rng = RngStream(seed)

    def evaluate(params) -> float:
        old = policy.params
        policy.params = params
        rets = []
        for i in range(n_paths):
            env = vec_env.envs[i % len(vec_env.envs)]
            path = rollout(env, policy, max_path_length, rng)
            rets.append(float(path["rewards"].sum()))
        policy.params = old
        return float(np.mean(rets))

    return evaluate
