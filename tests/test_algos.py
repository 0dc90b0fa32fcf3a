"""Algorithm smoke matrix (the reference's tests/test_algos.py pattern:
every algo x a cheap env, no-NaN + learning checks)."""

import jax
import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import RLConfig
from imitation_from_observation_tpu.rl import (
    CEM,
    CMAES,
    DDPG,
    ERWR,
    NOP,
    PPO,
    REPS,
    TNPG,
    BatchPolopt,
    GaussianMLPPolicy,
    LinearFeatureBaseline,
)
from imitation_from_observation_tpu.rl.evolution import make_return_evaluator

from tests.test_rl import PointEnv, _VecPoint


def _no_nan(params):
    flat = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(params)])
    assert np.all(np.isfinite(flat))


def _run_batch_algo(optimizer_fn, n_iters=3, **kw):
    vec = _VecPoint(8, seed=0)
    pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(16,), init_std=1.0, seed=0)
    opt = optimizer_fn(pol, **kw)
    import tempfile

    cfg = RLConfig(batch_size=320, max_path_length=20, n_iters=n_iters, snapshot_mode="none")
    algo = BatchPolopt(vec, pol, LinearFeatureBaseline(), opt, cfg, log_dir=tempfile.mkdtemp())
    history = algo.train()
    _no_nan(pol.params)
    return history


def test_tnpg_smoke():
    h = _run_batch_algo(TNPG, n_iters=5)
    assert h[-1]["AverageReturn"] > h[0]["AverageReturn"] - 1.0  # moves, no blowup


def test_ppo_learns():
    h = _run_batch_algo(PPO, n_iters=6)
    assert h[-1]["AverageReturn"] > h[0]["AverageReturn"]
    assert all(np.isfinite(r["MeanKL"]) for r in h)


def test_erwr_smoke():
    h = _run_batch_algo(ERWR, n_iters=5, learning_rate=5e-2)
    assert h[-1]["AverageReturn"] > h[0]["AverageReturn"] - 0.5


def test_reps_smoke():
    h = _run_batch_algo(REPS, n_iters=5, epsilon=0.5, learning_rate=5e-2)
    assert np.isfinite(h[-1]["Eta"])
    assert h[-1]["AverageReturn"] > h[0]["AverageReturn"] - 0.5


def test_nop():
    h = _run_batch_algo(lambda p: NOP(), n_iters=1)
    assert len(h) == 1


def test_cem_learns():
    vec = _VecPoint(4, seed=0)
    pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(8,), init_std=1.0, seed=0)
    ev = make_return_evaluator(vec, pol, max_path_length=20, n_paths=2)
    cem = CEM(pol, ev, n_samples=12, best_frac=0.25, init_std=0.5, extra_std=0.5, extra_decay_time=10)
    rows = [cem.step() for _ in range(5)]
    assert rows[-1]["AverageReturn"] > rows[0]["AverageReturn"] - 2.0
    _no_nan(pol.params)


def test_cmaes_runs():
    vec = _VecPoint(4, seed=0)
    pol = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden=(4,), init_std=1.0, seed=0)
    ev = make_return_evaluator(vec, pol, max_path_length=10, n_paths=1)
    cma = CMAES(pol, ev, n_samples=8, sigma=0.3)
    rows = [cma.step() for _ in range(3)]
    assert np.isfinite(rows[-1]["Sigma"]) and rows[-1]["Sigma"] > 0
    _no_nan(pol.params)


def test_ddpg_learns_point():
    env = PointEnv(seed=0)
    algo = DDPG(obs_dim=2, act_dim=2, hidden=(32,), batch_size=32, seed=0)
    returns = algo.train(env, n_steps=1500, horizon=20)
    assert len(returns) > 10
    assert np.mean(returns[-5:]) > np.mean(returns[:5])  # improves
