"""Fully-native vectorized task suite: per-task step parity with the python
envs, reward_true semantics, and the on-device raycast renderer (unit tests
+ EGL agreement)."""

import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import EnvConfig

try:
    from imitation_from_observation_tpu.sim.native_tasks import (
        NATIVE_VEC_TASKS,
        make_native_vec,
    )

    _AVAILABLE = True
except Exception:
    _AVAILABLE = False

pytestmark = pytest.mark.skipif(not _AVAILABLE, reason="native stepper unavailable")

TASKS = ["pusher3dof", "reacher3dof", "cleaner", "striker", "thrower", "pusher3dofreal"]


def _task_cfg(name, horizon=6, **kw):
    base = dict(name=name, horizon=horizon, render_frames=False, dense_reward=True, seed=0)
    if name == "pusher3dofreal":
        base.update(goal=(-0.9, 0.8), object_pos=(-0.6, 0.4))
    base.update(kw)
    return EnvConfig(**base)


@pytest.mark.parametrize("task", TASKS)
def test_native_task_step_parity(task):
    """Same state + same ctrl sequence -> same obs, dense reward and
    reward_true as the python env behind NormalizedEnv (sim/tasks.py)."""
    from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

    horizon = 6
    cfg = _task_cfg(task, horizon)
    nv = make_native_vec(task, 2, cfg, max_path_length=horizon, frame_backend="egl")
    py = NormalizedEnv(make_env(task, cfg))
    py.reset()
    nv.reset()
    qpos = np.tile(py.env.data.qpos.copy(), (2, 1))
    qvel = np.tile(py.env.data.qvel.copy(), (2, 1))
    nv.sim.set_state(qpos, qvel)
    rng = np.random.default_rng(3)
    nu = py.env.model.nu
    for t in range(horizon):
        a = rng.uniform(-1, 1, nu)
        obs_n, r_n, d_n, info_n = nv.step(np.tile(a, (2, 1)))
        obs_p, r_p, d_p, info_p = py.step(a)
        if t < horizon - 1:  # final native step auto-resets (fresh random obs)
            np.testing.assert_allclose(obs_n[0], obs_p, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(r_n[0], r_p, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            info_n[0]["reward_true"], info_p["reward_true"], rtol=1e-6, atol=1e-9
        )
    assert d_n.all()
    py.close()
    nv.close()


def test_native_task_full_state_obs_parity():
    """The full-state obs variant (expert policies' observation space,
    pusher3dof.py:121-134) matches the python env."""
    from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

    cfg = _task_cfg("pusher3dof", 4, full_state=True)
    nv = make_native_vec("pusher3dof", 2, cfg, max_path_length=4, frame_backend="egl")
    py = NormalizedEnv(make_env("pusher3dof", cfg))
    py.reset()
    nv.reset()
    nv.sim.set_state(
        np.tile(py.env.data.qpos.copy(), (2, 1)), np.tile(py.env.data.qvel.copy(), (2, 1))
    )
    obs_n, *_ = nv.step(np.zeros((2, 3)))
    obs_p, *_ = py.step(np.zeros(3))
    np.testing.assert_allclose(obs_n[0], obs_p, rtol=1e-6, atol=1e-7)
    assert obs_n.shape[1] == py.observation_space.flat_dim
    py.close()
    nv.close()


def test_native_striker_state_machine():
    """The per-episode strike/min-dist state machine stays in sync with the
    python env over a long rollout (it only matters after contact)."""
    from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

    horizon = 20
    cfg = _task_cfg("striker", horizon)
    nv = make_native_vec("striker", 1, cfg, max_path_length=horizon, frame_backend="egl")
    py = NormalizedEnv(make_env("striker", cfg))
    py.reset()
    nv.reset()
    nv.sim.set_state(py.env.data.qpos.copy()[None], py.env.data.qvel.copy()[None])
    rng = np.random.default_rng(0)
    for t in range(horizon - 1):
        a = rng.uniform(-1, 1, 7)
        _, r_n, _, _ = nv.step(a[None])
        _, r_p, _, _ = py.step(a)
        np.testing.assert_allclose(r_n[0], r_p, rtol=1e-5, atol=1e-7)
    assert nv._striked[0] == py.env._striked
    py.close()
    nv.close()


def test_native_vec_lockstep_reward_true():
    cfg = _task_cfg("thrower", 4, dense_reward=False)
    nv = make_native_vec("thrower", 3, cfg, max_path_length=4, frame_backend="egl")
    nv.reset()
    for t in range(4):
        _, rewards, dones, infos = nv.step(np.zeros((3, 7)))
        assert np.all(rewards == 0)  # visual mode: no native reward
        trues = [i["reward_true"] for i in infos]
        if t < 3:
            assert all(v == 0 for v in trues)
        else:
            assert all(v != 0 for v in trues)
    assert dones.all()
    nv.close()


def test_generate_demo_videos_vec(tmp_path):
    """Batched demo recording: full-rate 51-frame mp4s + stats manifest
    through the raycast backend (exp/gen_videos.py::generate_demo_videos_vec)."""
    import json

    from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos_vec
    from imitation_from_observation_tpu.video.io import decode_video

    class _Zero:
        def get_actions(self, obs, key=None):
            return np.zeros((len(obs), 3)), {}

    horizon = 6
    written = generate_demo_videos_vec(
        "reacher3dof", _Zero(), str(tmp_path), n_videos=5, horizon=horizon,
        env_overrides=dict(image_size=(24, 24), render_size=(64, 64)),
        n_envs=3, frame_backend="tpu",
    )
    assert len(written) == 5
    frames = decode_video(written[0])
    assert frames.shape == (horizon + 1, 24, 24, 3)
    assert frames.max() > 30  # scene lit, not black
    stats = json.load(open(tmp_path / "stats.json"))
    assert stats["n_videos"] == 5 and len(stats["episode_true_rewards"]) == 5


def test_generate_demo_videos_vec_multi_viewpoint(tmp_path):
    """With pinned n_viewpoints=2 each episode yields one mp4 PER viewpoint
    (distinct azimuths -> distinct pixels), so the translation training set
    covers every camera the reward engine scores at (base.py:195-226)."""
    from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos_vec
    from imitation_from_observation_tpu.video.io import decode_video

    class _Zero:
        def get_actions(self, obs, key=None):
            return np.zeros((len(obs), 3)), {}

    horizon = 4
    written = generate_demo_videos_vec(
        "reacher3dof", _Zero(), str(tmp_path), n_videos=4, horizon=horizon,
        env_overrides=dict(
            image_size=(24, 24), render_size=(64, 64),
            viewpoint=(30.0, 120.0), n_viewpoints=2,
        ),
        n_envs=2, frame_backend="tpu",
    )
    assert len(written) == 4
    # videos 0/1 are the SAME episode from the two azimuths: same length,
    # different pixels; 2/3 are the second episode
    a, b = decode_video(written[0]), decode_video(written[1])
    assert a.shape == b.shape == (horizon + 1, 24, 24, 3)
    assert np.abs(a.astype(int) - b.astype(int)).mean() > 1.0


# -- raycast renderer ------------------------------------------------------


def test_raycast_sphere_analytic():
    """A unit sphere dead ahead: center pixel hits at t = dist - r and the
    rendered color matches ambient+diffuse shading of its rgba."""
    import jax.numpy as jnp

    from imitation_from_observation_tpu.sim.raycast import SceneSpec, render_batch

    spec = SceneSpec(geom_type=(2,), geom_size=((0.5, 0.0, 0.0),), fovy=45.0)
    xpos = np.zeros((1, 1, 3), np.float32)
    xmat = np.tile(np.eye(3, dtype=np.float32)[None, None], (1, 1, 1, 1))
    rgba = np.array([[[0.2, 0.9, 0.3, 1.0]]], np.float32)
    cam = np.array([[0, 0, 0, 3.0, 0.0, 0.0]], np.float32)  # looking along +x
    img = np.asarray(render_batch(spec, xpos, xmat, rgba, cam, 33, 33, 1))
    c = img[0, 16, 16].astype(np.float32) / 255
    # center of sphere faces the camera head-on: lambert = 1
    assert c[1] > c[0] and c[1] > c[2]  # green-ish
    assert c[1] > 0.4
    # background is black
    assert img[0, 0, 0].max() == 0 and img[0, -1, -1].max() == 0
    # sphere silhouette is round: radius in pixels ~ atan(r/d)/fov * H
    mask = img[0].max(-1) > 0
    frac = mask.mean()
    expected = np.pi * (0.5 / (3 * np.tan(np.deg2rad(22.5)))) ** 2 / 4 * 4  # ~area
    assert 0.02 < frac < 0.25


def test_raycast_box_plane_orientation():
    """A plane at z=0 seen from above fills the frame; a box on it occludes
    the plane where it sits (depth ordering works)."""
    from imitation_from_observation_tpu.sim.raycast import SceneSpec, render_batch

    spec = SceneSpec(
        geom_type=(0, 6),
        geom_size=((5.0, 5.0, 0.1), (0.3, 0.3, 0.3)),
        fovy=45.0,
    )
    xpos = np.zeros((1, 2, 3), np.float32)
    xpos[0, 1, 2] = 0.3  # box sitting on the plane
    xmat = np.tile(np.eye(3, dtype=np.float32)[None, None], (1, 2, 1, 1))
    rgba = np.array([[[0.1, 0.1, 0.9, 1.0], [0.9, 0.1, 0.1, 1.0]]], np.float32)
    cam = np.array([[0, 0, 0, 4.0, -90.0, 0.0]], np.float32)  # straight down
    img = np.asarray(render_batch(spec, xpos, xmat, rgba, cam, 32, 32, 1)).astype(float)
    center = img[0, 16, 16]
    corner = img[0, 2, 2]
    assert center[0] > center[2]  # red box in the middle
    assert corner[2] > corner[0]  # blue plane at the edges


def test_raycast_invisible_geoms_skipped():
    from imitation_from_observation_tpu.sim.raycast import SceneSpec, render_batch

    spec = SceneSpec(geom_type=(2,), geom_size=((0.5, 0, 0),), fovy=45.0)
    xpos = np.zeros((1, 1, 3), np.float32)
    xmat = np.tile(np.eye(3, dtype=np.float32)[None, None], (1, 1, 1, 1))
    rgba = np.array([[[0.9, 0.9, 0.9, 0.0]]], np.float32)  # alpha 0
    cam = np.array([[0, 0, 0, 3.0, 0.0, 0.0]], np.float32)
    img = np.asarray(render_batch(spec, xpos, xmat, rgba, cam, 16, 16, 1))
    assert img.max() == 0


def _egl_or_skip():
    from imitation_from_observation_tpu.sim import native_render_available

    if not native_render_available():
        pytest.skip("EGL renderer unavailable")


@pytest.mark.parametrize("task", ["reacher3dof", "striker"])
def test_raycast_matches_egl(task):
    """The on-device renderer agrees with the EGL rasterizer on real scenes:
    high silhouette IoU + PSNR (shading coefficients were least-squares
    fitted against EGL; re-fit by running the regression below over random
    states if the scenes ever change)."""
    _egl_or_skip()
    import mujoco
    import os

    from imitation_from_observation_tpu.sim.base import _ASSET_DIR
    from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim
    from imitation_from_observation_tpu.sim.raycast import TpuRenderer

    size = 48
    xml = os.path.join(_ASSET_DIR, f"{task}.xml")
    pool = NativeBatchSim(xml, 2)
    pool.render_setup(size, size, fast=True)
    m = mujoco.MjModel.from_xml_path(xml)
    rng = np.random.default_rng(0)
    pool.set_state(rng.uniform(-0.4, 0.4, (2, pool.nq)), np.zeros((2, pool.nv)))
    cams = np.zeros((2, 1, 6))
    cams[:, :, 3] = 4.0 if task == "reacher3dof" else 2.5
    cams[:, :, 4] = -45.0
    cams[:, 0, 5] = [30.0, 200.0]
    egl = pool.render(cams)
    xpos, xmat = pool.geom_state()
    rgba = np.tile(m.geom_rgba[None], (2, 1, 1))
    ray = TpuRenderer(m, size, size, ss=2).render(xpos, xmat, rgba, cams)
    for i in range(2):
        a = egl[i, 0].astype(np.float32)
        b = ray[i, 0].astype(np.float32)
        psnr = 10 * np.log10(255**2 / max(np.mean((a - b) ** 2), 1e-9))
        ma, mb = a.max(-1) > 12, b.max(-1) > 12
        iou = (ma & mb).sum() / max((ma | mb).sum(), 1)
        assert psnr > 22, (task, i, psnr)
        assert iou > 0.93, (task, i, iou)
    pool.close()


def test_native_vec_tpu_frames_contract():
    """frames land under info['frames'] as uint8 [nvp, H, W, 3] at odd steps
    only, mirroring the python path's contract (sim/base.py:240-245)."""
    cfg = _task_cfg("reacher3dof", 4, render_frames=True, image_size=(24, 24),
                    dense_reward=False)
    nv = make_native_vec("reacher3dof", 2, cfg, max_path_length=4, frame_backend="tpu")
    nv.reset()
    seen = []
    for t in range(4):
        _, _, _, infos = nv.step(np.zeros((2, 3)))
        seen.append(infos[0]["frames"] is not None)
        if infos[0]["frames"] is not None:
            f = infos[0]["frames"]
            assert f.shape == (1, 24, 24, 3) and f.dtype == np.uint8
            assert f.max() > 0  # scene is lit
    assert seen == [False, True, False, True]
    nv.close()


def test_native_vec_egl_matches_python_frames():
    """EGL-backend frames from the vec task equal the python env's renderer
    for the same state and camera (the bit-parity migration path)."""
    _egl_or_skip()
    from imitation_from_observation_tpu.sim import make_env

    cfg = _task_cfg(
        "reacher3dof", 4, render_frames=True, image_size=(24, 24),
        render_size=(48, 48), viewpoint=123.0, dense_reward=False,
    )
    nv = make_native_vec("reacher3dof", 1, cfg, max_path_length=4, frame_backend="egl")
    py = make_env("reacher3dof", cfg)
    py.reset()
    nv.reset()
    # identical scene: copy python's randomized colors AND state into the pool
    nv.geom_rgba[0] = py.model.geom_rgba
    nv.geom_pos[0] = py.model.geom_pos
    nv._sync_model(0)
    nv.sim.set_state(py.data.qpos.copy()[None], py.data.qvel.copy()[None])
    a = np.zeros(3)
    py_frames = []
    for t in range(2):
        _, _, _, info_p = py.step(a)
        _, _, _, info_n = nv.step(a[None])
        if info_p["frames"] is not None:
            np.testing.assert_array_equal(info_n[0]["frames"], info_p["frames"])
            py_frames.append(1)
    assert py_frames, "no frames compared"
    py.close()
    nv.close()


def test_native_vec_device_frames_parity_and_pop():
    """device_frames=True: infos carry no host frames, the lockstep episode
    block pops as a [T,N,V,h,w,3] uint8 device array identical to the host
    path's renders, and the buffer resets between episodes."""
    import jax.numpy as jnp

    cfg = _task_cfg("reacher3dof", 4, render_frames=True, image_size=(16, 16),
                    dense_reward=False)
    nv_host = make_native_vec("reacher3dof", 2, cfg, max_path_length=4,
                              frame_backend="tpu")
    nv_dev = make_native_vec("reacher3dof", 2, cfg, max_path_length=4,
                             frame_backend="tpu", device_frames=True)
    # identical scenes/state (same seed -> same reset draws)
    nv_host.reset()
    nv_dev.reset()
    host_frames = []
    a = np.zeros((2, 3))
    for t in range(4):
        _, _, _, infos_h = nv_host.step(a)
        _, _, dones, infos_d = nv_dev.step(a)
        assert infos_d[0]["frames"] is None  # never fetched to host
        if infos_h[0]["frames"] is not None:
            host_frames.append(np.stack([inf["frames"] for inf in infos_h]))
    assert bool(dones[0])
    block = nv_dev.pop_episode_frames()
    assert nv_dev.pop_episode_frames() is None  # consumed exactly once
    assert block.dtype == jnp.uint8 and block.shape == (2, 2, 1, 16, 16, 3)
    want = np.stack(host_frames)  # [T, N, V, h, w, 3]
    np.testing.assert_array_equal(np.asarray(block), want)
    nv_host.close()
    nv_dev.close()


def test_sampler_engine_device_frames_end_to_end():
    """VectorizedSampler attaches frames_dev on lockstep dones and the reward
    engine splices the SAME rewards as the host-frames path over a real
    native-vec rollout (two episodes per batch -> two blocks)."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.core.config import (
        RewardConfig, TranslationModelConfig,
    )
    from imitation_from_observation_tpu.models import build_model
    from imitation_from_observation_tpu.reward import VisualRewardEngine
    from imitation_from_observation_tpu.rl.sampler import VectorizedSampler

    class _ZeroPolicy:
        def get_actions(self, obs, key):
            return np.zeros((len(obs), 3)), {"mean": np.zeros((len(obs), 3))}

    # float32 compute: the device-frames and host-frames paths compile two
    # DIFFERENT programs (uint8-normalizing vs float input), and bf16
    # reduction-order differences between them can exceed the 1e-4 band —
    # the test checks gather/splice equivalence, not bf16 fusion bitexactness
    mcfg = TranslationModelConfig(
        model="context_skip", image_size=(16, 16), base_filters=8, feat_size=32,
        dtype="float32",
    )
    model = build_model(mcfg)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    demo = np.random.default_rng(3).uniform(-1, 1, (2, 4, 16, 16, 3)).astype(np.float32)

    cfg = _task_cfg("reacher3dof", 4, render_frames=True, image_size=(16, 16),
                    dense_reward=False)
    rewards = {}
    for dev in (False, True):
        nv = make_native_vec("reacher3dof", 2, cfg, max_path_length=4,
                             frame_backend="tpu", device_frames=dev)
        sampler = VectorizedSampler(nv, _ZeroPolicy(), batch_size=16,
                                    max_path_length=4, seed=0)
        paths, _ = sampler.obtain_samples()
        assert len(paths) == 4  # 2 lockstep episodes x 2 envs
        assert all(("frames_dev" in p) == dev for p in paths)
        # the 2 envs draw per-episode scenes, so the sampler stamps
        # context_fp="mixed"; this test compares the two FRAME PATHS under
        # one shared warmup, not context semantics — use the engine's
        # documented tests-only bypass (see engine._check_shared_context;
        # the contract itself is covered in test_reward.py)
        for p in paths:
            p.pop("context_fp", None)
        eng = VisualRewardEngine(
            RewardConfig(mode="ours", scale=0.5), mcfg, params=params, demo_data=demo
        )
        eng.process(paths)
        rewards[dev] = np.stack([p["rewards"] for p in paths])
        nv.close()
    np.testing.assert_allclose(rewards[True], rewards[False], rtol=1e-4, atol=1e-4)


def test_sampler_lockstep_fast_path_parity():
    """_obtain_lockstep must produce identical paths (obs, actions, rewards,
    env_infos, agent_infos, frames) to the generic per-env loop."""
    from imitation_from_observation_tpu.rl.sampler import VectorizedSampler

    class _DetPolicy:
        def get_actions(self, obs, key):
            a = np.tanh(np.asarray(obs)[:, :3] * 0.1)
            return a, {"mean": a * 0.5}

    class _HideFast:
        """Wrap a lockstep env but hide step_batch -> generic sampler path."""
        def __init__(self, env):
            self._env = env
        def __getattr__(self, k):
            if k == "step_batch":
                raise AttributeError(k)
            return getattr(self._env, k)

    cfg = _task_cfg("reacher3dof", 4, render_frames=True, image_size=(16, 16),
                    dense_reward=False)
    out = {}
    for fast in (True, False):
        nv = make_native_vec("reacher3dof", 3, cfg, max_path_length=4,
                             frame_backend="tpu")
        env = nv if fast else _HideFast(nv)
        s = VectorizedSampler(env, _DetPolicy(), batch_size=20,
                              max_path_length=4, seed=7)
        out[fast], _ = s.obtain_samples()
        nv.close()
    assert len(out[True]) == len(out[False]) == 6  # 2 episodes x 3 envs
    for pf, pg in zip(out[True], out[False]):
        np.testing.assert_array_equal(pf["observations"], pg["observations"])
        np.testing.assert_array_equal(pf["actions"], pg["actions"])
        np.testing.assert_array_equal(pf["rewards"], pg["rewards"])
        assert pf["rewards"].dtype == pg["rewards"].dtype
        np.testing.assert_array_equal(
            pf["env_infos"]["reward_true"], pg["env_infos"]["reward_true"])
        for ff, fg in zip(pf["env_infos"]["frames"], pg["env_infos"]["frames"]):
            assert (ff is None) == (fg is None)
            if ff is not None:
                np.testing.assert_array_equal(ff, fg)
        for k in pg["agent_infos"]:
            np.testing.assert_array_equal(pf["agent_infos"][k], pg["agent_infos"][k])
