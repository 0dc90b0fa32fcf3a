"""On-device rollout sampler (rl/device_rollout.py).

Dynamics parity pins each batched-JAX env to its host twin in
``sim/classic.py`` (itself matched to the reference's Box2D family,
rllab/envs/box2d/). The end-to-end test reproduces the reference's algo
smoke pattern (tests/test_algos.py: TRPO x cartpole, no-NaN + improvement)
with the sampling phase running as ONE jitted device program, and the mesh
test asserts the sharded episode axis changes nothing numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_from_observation_tpu.parallel.mesh import make_mesh
from imitation_from_observation_tpu.rl.algo import BatchPolopt
from imitation_from_observation_tpu.rl.baselines import LinearFeatureBaseline
from imitation_from_observation_tpu.rl.device_rollout import (
    DEVICE_ENVS,
    DeviceSampler,
)
from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy
from imitation_from_observation_tpu.rl.trpo import TRPO
from imitation_from_observation_tpu.core.config import RLConfig
from imitation_from_observation_tpu.sim.classic import (
    CartpoleEnv,
    CartpoleSwingupEnv,
    DoublePendulumEnv,
    MountainCarEnv,
)

HOST_ENVS = {
    "cartpole": CartpoleEnv,
    "cartpole_swingup": CartpoleSwingupEnv,
    "mountain_car": MountainCarEnv,
    "double_pendulum": DoublePendulumEnv,
}


@pytest.mark.parametrize("name", sorted(DEVICE_ENVS))
def test_device_dynamics_match_host(name):
    """Step-for-step parity: same state + same action sequence -> same
    next obs / reward / done as the host env (which tests pin to the
    reference's Box2D semantics)."""
    host = HOST_ENVS[name](seed=0)
    dev = DEVICE_ENVS[name]()
    rng = np.random.default_rng(3)
    host.reset()
    state = np.asarray(host.state, np.float64)
    dstate = jnp.asarray(state[None], jnp.float32)
    lo, hi = dev.action_clip
    for t in range(25):
        a = rng.uniform(2 * lo, 2 * hi)  # exercises the clip on both sides
        obs_h, r_h, done_h, _ = host.step(np.array([a]))
        u = jnp.clip(jnp.asarray([a], jnp.float32), lo, hi)
        dstate, r_d, done_d = dev.step(dstate, u)
        obs_d = dev.obs(dstate)
        # device math is f32 (jax default), the host twin is f64 numpy —
        # tolerance covers 25 steps of accumulation drift
        np.testing.assert_allclose(np.asarray(obs_d[0]), obs_h, rtol=0, atol=5e-5)
        assert abs(float(r_d[0]) - r_h) < 1e-4, (name, t)
        assert bool(done_d[0]) == done_h, (name, t)
        if done_h:
            break


def test_device_sampler_batch_contract():
    """Paths respect the host sampler's contract: whole episodes split at
    termination/limit, exact batch size after truncation, agent_infos carry
    the distribution params TRPO needs."""
    pol = GaussianMLPPolicy(obs_dim=4, action_dim=1, hidden=(8,), init_std=10.0, seed=0)
    s = DeviceSampler("cartpole", pol, batch_size=300, max_path_length=20, seed=1)
    paths, timings = s.obtain_samples()
    assert sum(len(p["rewards"]) for p in paths) == 300
    for p in paths:
        T = len(p["rewards"])
        assert 1 <= T <= 20
        assert p["observations"].shape == (T, 4)
        assert p["actions"].shape == (T, 1)
        assert p["agent_infos"]["mean"].shape == (T, 1)
        assert p["agent_infos"]["log_std"].shape == (T, 1)
        assert p["rewards"].dtype == np.float64
    assert timings["EnvExecTime"] > 0
    # the untrained cartpole policy terminates early (some path < the limit);
    # reaching 300 completed steps from 15 streams in the 35-step scan is
    # only possible because the in-scan auto-reset started fresh episodes
    assert any(len(p["rewards"]) < 20 for p in paths)
    assert len(paths) >= s.n_envs


def test_device_sampler_deterministic_and_mesh_equivalent():
    """Same seed -> identical batch; sharding the episode axis over an
    8-device mesh changes nothing numerically (pure data parallelism)."""
    def batch(mesh, n_envs=8):
        pol = GaussianMLPPolicy(obs_dim=4, action_dim=1, hidden=(8,), seed=0)
        s = DeviceSampler(
            "cartpole", pol, batch_size=160, max_path_length=10,
            n_envs=n_envs, seed=5, mesh=mesh,
        )
        paths, _ = s.obtain_samples()
        return paths

    a, b = batch(None), batch(None)
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        np.testing.assert_array_equal(pa["observations"], pb["observations"])
        np.testing.assert_array_equal(pa["rewards"], pb["rewards"])

    c = batch(make_mesh(8))
    assert len(a) == len(c)
    for pa, pc in zip(a, c):
        np.testing.assert_allclose(pa["observations"], pc["observations"], atol=1e-6)
        np.testing.assert_allclose(pa["rewards"], pc["rewards"], atol=1e-6)


def test_trpo_learns_cartpole_with_device_sampler(tmp_path):
    """The reference's smoke matrix shape (tests/test_algos.py: TRPO on
    cartpole, no NaNs) + an improvement bar, with sampling fully on device:
    BatchPolopt consumes the DeviceSampler through the standard contract."""
    pol = GaussianMLPPolicy(obs_dim=4, action_dim=1, hidden=(16, 16), init_std=1.0, seed=0)
    cfg = RLConfig(batch_size=2000, max_path_length=100, n_iters=8, snapshot_mode="none")
    sampler = DeviceSampler(
        "cartpole", pol, batch_size=cfg.batch_size,
        max_path_length=cfg.max_path_length, seed=0,
    )
    algo = BatchPolopt(
        None, pol, LinearFeatureBaseline(), TRPO(pol, step_size=0.05), cfg,
        log_dir=str(tmp_path), sampler=sampler,
    )
    history = algo.train()
    rets = [h["AverageReturn"] for h in history]
    assert np.all(np.isfinite(rets))
    assert not any(
        bool(jnp.any(jnp.isnan(leaf)))
        for leaf in jax.tree_util.tree_leaves(pol.params)
    )
    # balancing reward ~10/step: TRPO should lengthen episodes materially
    assert max(rets[-3:]) > rets[0] + 100
