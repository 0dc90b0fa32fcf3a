"""Native vectorized rollout backend: parity with the python envs and a
TRPO learning check."""

import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import EnvConfig, RLConfig

try:
    from imitation_from_observation_tpu.sim.native_vec import NativePusherVec, NativeReacherVec
    _AVAILABLE = True
except Exception:
    _AVAILABLE = False

pytestmark = pytest.mark.skipif(not _AVAILABLE, reason="native stepper unavailable")


def test_native_pusher_matches_python_env():
    """Same state + same ctrl sequence -> same obs and dense reward as the
    python Pusher3DOF behind NormalizedEnv."""
    from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

    cfg = EnvConfig(name="pusher3dof", horizon=6, render_frames=False, dense_reward=True, seed=0)
    nv = NativePusherVec(2, cfg, max_path_length=6)
    py = NormalizedEnv(make_env("pusher3dof", cfg))
    py.reset()
    nv.reset()
    # force identical state: copy python env's state into native sim slot 0
    qpos = np.tile(py.env.data.qpos.copy(), (2, 1))
    qvel = np.tile(py.env.data.qvel.copy(), (2, 1))
    nv.sim.set_state(qpos, qvel)
    nv._reward_orig = np.ones(2)
    rng = np.random.default_rng(3)
    for t in range(4):
        a = rng.uniform(-1, 1, 3)
        obs_n, r_n, d_n, _ = nv.step(np.tile(a, (2, 1)))
        obs_p, r_p, d_p, _ = py.step(a)
        np.testing.assert_allclose(obs_n[0], obs_p, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(r_n[0], r_p, rtol=1e-5, atol=1e-7)
    py.close()
    nv.close()


def test_native_reacher_trpo_learns():
    """TRPO on the native reacher backend improves dense return — the fast
    expert-training leg of the pipeline."""
    from imitation_from_observation_tpu.rl import BatchPolopt, GaussianMLPPolicy, LinearFeatureBaseline, TRPO

    cfg = EnvConfig(name="reacher3dof", horizon=20, render_frames=False, dense_reward=True, seed=0)
    vec = NativeReacherVec(10, cfg, max_path_length=20)
    pol = GaussianMLPPolicy(obs_dim=vec.observation_space.flat_dim, action_dim=3, hidden=(16,), init_std=1.0)
    import tempfile

    algo = BatchPolopt(
        vec, pol, LinearFeatureBaseline(), TRPO(pol, step_size=0.1),
        RLConfig(batch_size=600, max_path_length=20, n_iters=12, snapshot_mode="none"),
        log_dir=tempfile.mkdtemp(),
    )
    h = algo.train()
    first = np.mean([r["AverageReturn"] for r in h[:3]])
    last = np.mean([r["AverageReturn"] for r in h[-3:]])
    assert last > first, (first, last)
    vec.close()


def test_native_vec_reward_true_final_step():
    cfg = EnvConfig(name="pusher3dof", horizon=4, render_frames=False, seed=1)
    nv = NativePusherVec(3, cfg, max_path_length=4)
    nv.reset()
    for t in range(4):
        _, _, dones, infos = nv.step(np.zeros((3, 3)))
        trues = [i["reward_true"] for i in infos]
        if t < 3:
            assert all(v == 0 for v in trues)
        else:
            assert all(v < 0 for v in trues)
    assert dones.all()
    nv.close()


def test_context_fingerprint_pinned_vs_mixed():
    """context_fingerprint(): per-env random scene draws -> "mixed"; a pinned
    context (viewpoint + geoms) -> a stable hex digest shared by fresh
    instances (the reward engine's fixed-context handshake input)."""
    from imitation_from_observation_tpu.sim import make_native_vec

    cfg_rand = EnvConfig(name="pusher3dof", horizon=4, render_frames=False, seed=0)
    nv = make_native_vec("pusher3dof", 3, cfg_rand, max_path_length=4)
    assert nv.context_fingerprint() == "mixed"  # random per-env azimuths/colors
    n_distract = len(nv._distractor_gids)
    nv.close()

    geoms = tuple(((0.3, 0.5, 0.7, 1.0), 0.1 * i, 0.2) for i in range(n_distract))
    cfg_pin = EnvConfig(
        name="pusher3dof", horizon=4, render_frames=False, seed=0,
        viewpoint=120.0, geoms=geoms,
    )
    a = make_native_vec("pusher3dof", 3, cfg_pin, max_path_length=4)
    b = make_native_vec("pusher3dof", 3, cfg_pin, max_path_length=4)
    fa, fb = a.context_fingerprint(), b.context_fingerprint()
    assert fa == fb and fa != "mixed" and len(fa) == 16
    a.close()
    b.close()


def test_sampler_stamps_context_fp():
    """VectorizedSampler stamps path["context_fp"] from the vec env so the
    reward engine can enforce its one-context warmup contract."""
    from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy
    from imitation_from_observation_tpu.rl.sampler import VectorizedSampler

    from imitation_from_observation_tpu.sim import make_native_vec

    cfg = EnvConfig(name="pusher3dof", horizon=4, render_frames=False, seed=0)
    nv = make_native_vec("pusher3dof", 3, cfg, max_path_length=4)
    pol = GaussianMLPPolicy(obs_dim=nv.observation_space.flat_dim, action_dim=3, hidden=(8,))
    paths, _ = VectorizedSampler(nv, pol, batch_size=12, max_path_length=4).obtain_samples()
    assert paths and all(p["context_fp"] == "mixed" for p in paths)
    nv.close()
