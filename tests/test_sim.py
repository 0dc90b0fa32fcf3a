"""Env suite tests: reset/step/spaces/render smoke + task semantics
(the tier the reference only had for inherited framework envs,
tests/test_envs.py:39-102 — here it covers the paper's own tasks)."""

import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.sim import ENV_REGISTRY, NormalizedEnv, VecEnv, make_env
from imitation_from_observation_tpu.sim.registry import TEST_ENVS

# task envs only — TEST_ENVS (point + classic control) are dense-reward
# test envs outside the visual-imitation contract (covered in test_classic)
ALL = sorted(set(ENV_REGISTRY) - TEST_ENVS)


@pytest.mark.parametrize("name", ALL)
def test_reset_step_spaces(name):
    env = make_env(name, EnvConfig(name=name, render_frames=False, seed=0))
    obs = env.reset()
    assert env.observation_space.contains(obs)
    for _ in range(3):
        a = env.action_space.sample(np.random.default_rng(0))
        obs, r, done, info = env.step(a)
        assert env.observation_space.contains(obs)
        assert r == 0.0 and not done
        assert "reward_true" in info
    env.close()


@pytest.mark.parametrize("name", ["pusher3dof", "cleaner", "striker"])
def test_render_frames_on_odd_steps(name):
    env = make_env(name, EnvConfig(name=name, image_size=(48, 48), render_size=(100, 100), seed=1))
    env.reset()
    a = np.zeros(env.action_space.flat_dim)
    _, _, _, info0 = env.step(a)  # itr 0 -> no frame
    assert info0["frames"] is None
    _, _, _, info1 = env.step(a)  # itr 1 -> frame
    assert info1["frames"] is not None
    assert info1["frames"].shape == (1, 48, 48, 3)
    assert info1["frames"].dtype == np.uint8
    assert info1["frames"].max() > 0  # not a black frame
    env.close()


def test_multi_viewpoint_frames():
    env = make_env("striker", EnvConfig(name="striker", image_size=(48, 48), render_size=(100, 100), n_viewpoints=3, viewpoint=(0.0, 120.0, 240.0), seed=2))
    env.reset()
    a = np.zeros(env.action_space.flat_dim)
    env.step(a)
    _, _, _, info = env.step(a)
    assert info["frames"].shape == (3, 48, 48, 3)
    # distinct azimuths must give distinct images
    assert not np.array_equal(info["frames"][0], info["frames"][1])
    env.close()


def test_reward_true_final_step_only():
    env = make_env("pusher3dof", EnvConfig(name="pusher3dof", horizon=10, render_frames=False, seed=3))
    env.reset()
    a = np.zeros(env.action_space.flat_dim)
    trues = [env.step(a)[3]["reward_true"] for _ in range(10)]
    assert all(t == 0.0 for t in trues[:-1])
    assert trues[-1] != 0.0  # final/initial distance ratio (negative)
    assert trues[-1] < 0.0
    env.close()


def test_pusher_context_randomization():
    c1 = make_env("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False, seed=10))
    c1.reset()
    rgba_a = c1.model.geom_rgba.copy()
    c1.seed(11)
    c1.reset()
    rgba_b = c1.model.geom_rgba.copy()
    assert not np.allclose(rgba_a, rgba_b)  # distractor colors resampled
    # deterministic geoms override
    geoms = tuple(((0.1, 0.2, 0.3, 1.0), 0.5, 0.5) for _ in range(5))
    c2 = make_env("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False, geoms=geoms, seed=12))
    c2.reset()
    gid = c2.geom_id("object0")
    np.testing.assert_allclose(c2.model.geom_rgba[gid], [0.1, 0.2, 0.3, 1.0])
    c1.close(); c2.close()


def test_determinism_same_seed():
    def run(seed):
        env = make_env("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False, seed=seed))
        env.seed(seed)
        obs = [env.reset()]
        rng = np.random.default_rng(0)
        for _ in range(5):
            obs.append(env.step(rng.uniform(-1, 1, 3))[0])
        env.close()
        return np.stack(obs)

    np.testing.assert_allclose(run(42), run(42))
    assert not np.allclose(run(42), run(43))


def test_normalized_env_action_rescale():
    env = NormalizedEnv(make_env("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False)))
    env.reset()
    obs, r, d, info = env.step(np.array([1.0, -1.0, 0.0]))  # maps to [3, -3, 0]
    assert env.action_space.flat_dim == 3
    np.testing.assert_allclose(env.action_space.high, 1.0)
    env.close()


def test_vec_env_lockstep_and_autoreset():
    vec = VecEnv(
        [lambda i=i: make_env("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False, seed=i)) for i in range(3)],
        max_path_length=4,
    )
    obs = vec.reset()
    assert obs.shape[0] == 3
    for t in range(4):
        obs, rewards, dones, infos = vec.step(np.zeros((3, 3)))
    assert dones.all()  # auto-reset at max_path_length
    assert obs.shape[0] == 3
    vec.close()


def test_subproc_vec_env():
    """Process-parallel executor matches the in-process one's API and
    auto-resets at max_path_length (the stateful_pool capability tier)."""
    from imitation_from_observation_tpu.sim.subproc_vec_env import SubprocVecEnv

    specs = [
        ("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False, seed=i))
        for i in range(4)
    ]
    vec = SubprocVecEnv(specs, n_workers=2, max_path_length=3)
    vec.seed(7)
    obs = vec.reset()
    assert obs.shape[0] == 4
    for _ in range(3):
        obs, rewards, dones, infos = vec.step(np.zeros((4, 3)))
    assert dones.all()
    assert all("reward_true" in i for i in infos)
    assert np.all(np.isfinite(obs))
    vec.close()


def test_native_batch_sim_matches_python():
    """The C++ batched stepper must reproduce python-mujoco stepping exactly
    (same model, state, ctrl sequence)."""
    import os

    import mujoco
    pytest.importorskip("ctypes")
    xml = os.path.join(os.path.dirname(__file__), "..",
                       "imitation_from_observation_tpu", "sim", "assets", "pusher3dof.xml")
    xml = os.path.abspath(xml)
    try:
        from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim

        sim = NativeBatchSim(xml, n=3)
    except Exception as e:
        pytest.skip(f"native stepper unavailable: {e}")
    # python reference sim
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    assert (sim.nq, sim.nv, sim.nu) == (m.nq, m.nv, m.nu)
    rng = np.random.default_rng(0)
    qpos0 = rng.uniform(-0.05, 0.05, (3, m.nq))
    qvel0 = np.zeros((3, m.nv))
    sim.set_state(qpos0, qvel0)
    ctrls = rng.uniform(-1, 1, (4, 3, m.nu))
    for c in ctrls:
        sim.step(c, n_substeps=5)
    qpos_n, qvel_n = sim.get_state()
    # replicate env 1 in python
    d.qpos[:] = qpos0[1]
    d.qvel[:] = qvel0[1]
    mujoco.mj_forward(m, d)
    for c in ctrls:
        d.ctrl[:] = c[1]
        for _ in range(5):
            mujoco.mj_step(m, d)
    np.testing.assert_allclose(qpos_n[1], d.qpos, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(qvel_n[1], d.qvel, rtol=1e-10, atol=1e-12)
    # subtree_com agrees
    bid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "object")
    np.testing.assert_allclose(sim.subtree_com(bid)[1], d.subtree_com[bid], atol=1e-10)
    sim.close()


def _native_render_or_skip():
    from imitation_from_observation_tpu.sim import native_render_available

    if not native_render_available():
        pytest.skip("native renderer unavailable (no EGL device display)")


def test_native_render_matches_python_renderer():
    """The pool's shared-EGL offscreen renderer must be bit-identical to
    mujoco.Renderer for the same model state, camera and quality flags
    (replaces the reference's GLFW/FBO get_image, mjviewer.py:46-120)."""
    _native_render_or_skip()
    env = make_env("reacher3dof", EnvConfig(name="reacher3dof", seed=3, render_size=(96, 96)))
    env.reset()
    rng = np.random.default_rng(0)
    for _ in range(3):
        env.do_simulation(rng.uniform(-1, 1, env.action_space.shape), 5)

    import os

    from imitation_from_observation_tpu.sim.base import _ASSET_DIR
    from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim

    pool = NativeBatchSim(os.path.join(_ASSET_DIR, "reacher3dof.xml"), 1)
    pool.render_setup(96, 96, fast=True)
    pool.sync_geoms(0, env.model.geom_rgba, env.model.geom_pos)
    pool.set_state_one(0, env.data.qpos, env.data.qvel)
    cams = np.zeros((1, 1, 6))
    lookat, dist, elev, az = env.camera_pose(0)
    cams[0, 0, :3] = lookat
    cams[0, 0, 3:] = (dist, elev, az)
    native = pool.render(cams)[0, 0]
    ref = env.render(0)  # same size, no resize
    np.testing.assert_array_equal(native, ref)
    env.close()
    pool.close()


@pytest.mark.parametrize("name,nvp", [("pusher3dof", 1), ("striker", 2)])
def test_native_frame_vec_env_parity(name, nvp):
    """NativeFrameVecEnv must produce identical observations and bit-identical
    odd-step frames to the per-env python path, including auto-reset geom
    randomization sync and multi-viewpoint rendering."""
    _native_render_or_skip()
    from imitation_from_observation_tpu.sim import NativeFrameVecEnv

    def build(cls):
        def mk(i):
            return lambda: NormalizedEnv(
                make_env(
                    name,
                    EnvConfig(
                        name=name,
                        seed=11 + i,
                        render_frames=True,
                        render_size=(64, 64),
                        image_size=(32, 32),
                        n_viewpoints=nvp,
                        horizon=4,
                    ),
                )
            )

        return cls([mk(i) for i in range(2)], max_path_length=4)

    va, vb = build(VecEnv), build(NativeFrameVecEnv)
    oa, ob = va.reset(), vb.reset()
    np.testing.assert_allclose(oa, ob)
    rng = np.random.default_rng(0)
    saw_frames = False
    for t in range(9):  # crosses an auto-reset boundary at t=3
        a = rng.uniform(-1, 1, (2,) + va.action_space.shape)
        oa, _, da, ia = va.step(a)
        ob, _, db, ib = vb.step(a)
        np.testing.assert_allclose(oa, ob, err_msg=f"obs diverged at step {t}")
        np.testing.assert_array_equal(da, db)
        for i in range(2):
            fa, fb = ia[i].get("frames"), ib[i].get("frames")
            assert (fa is None) == (fb is None)
            if fa is not None:
                saw_frames = True
                assert fb.shape == (nvp, 32, 32, 3)
                np.testing.assert_array_equal(fa, fb)
    assert saw_frames
    va.close()
    vb.close()


def test_object_contact_mass_parity():
    """Pushable objects must have the reference's effective contact mass.

    The reference MJCFs put pos="0.025 0.025 0.025" on object slide joints —
    meaningless for a slide's kinematics, but it defeats MuJoCo's simple-body
    classification so the near-massless cylinders get their armature (0.04)
    as contact mass instead of the raw ~6e-8 kg. Without it, body_invweight0
    is ~1.6e7 and arm contacts transfer ZERO force (regression: objects were
    unpushable, experts/demos silently degenerate)."""
    import mujoco

    from imitation_from_observation_tpu.sim.base import _ASSET_DIR
    import os

    expect = {
        "pusher3dof.xml": [("object", 16.7)],
        "pusher3dofreal.xml": [("object", 16.7)],
        "reacher3dof.xml": [("object", 16.7)],
        "cleaner.xml": [(f"object{i}", 16.7) for i in range(5)],
        "striker.xml": [("object", 0.796)],
        "thrower.xml": [("ball", 353.7)],
    }
    for xml, rows in expect.items():
        m = mujoco.MjModel.from_xml_path(os.path.join(_ASSET_DIR, xml))
        for name, inv in rows:
            b = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, name)
            got = m.body_invweight0[b, 0]
            assert abs(got - inv) / inv < 0.05, f"{xml}:{name} invweight0 {got} != ~{inv}"


def test_pusher_object_is_pushable():
    """Driving the arm through the object must move it (contact force > 0)."""
    env = make_env("pusher3dof", EnvConfig(name="pusher3dof", render_frames=False, seed=0))
    env.reset()
    # place the object right at the current gripper tip, then sweep the arm
    tip = env.body_com("distal_4")[:2]
    qpos = env.data.qpos.copy()
    qpos[-4:-2] = [tip[1], tip[0]]  # (slidey, slidex)
    env.set_state(qpos, env.data.qvel * 0)
    obj0 = env.body_com("object")[:2].copy()
    moved = 0.0
    for sign in (1.0, -1.0):  # sweep both directions to guarantee contact
        for _ in range(30):
            env.do_simulation(sign * np.array([3.0, 3.0, 3.0]), 5)
        moved = max(moved, np.linalg.norm(env.body_com("object")[:2] - obj0))
    env.close()
    assert moved > 0.05, f"object did not move ({moved=})"


def test_reference_expert_extraction_solves_push():
    """End-to-end proof of the expert extraction (VERDICT #8): the reference
    expert_push.pkl, converted to our npz policy format, pushes the object
    most of the way to the goal in OUR env (reward_true = -final/initial
    distance; random policy scores ~-1.0)."""
    import os

    if not os.path.exists("/root/reference/expert_push.pkl"):
        pytest.skip("reference pickles not available")
    import sys

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools")))
    from extract_reference_experts import extract

    from imitation_from_observation_tpu.exp.train_expert import load_expert

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        extract("/root/reference", tmp)
        pol = load_expert(os.path.join(tmp, "expert_push"))
        finals = []
        for ep in range(5):
            env = NormalizedEnv(
                make_env(
                    "pusher3dof",
                    EnvConfig(name="pusher3dof", render_frames=False, full_state=True, seed=200 + ep),
                )
            )
            obs = env.reset()
            final = 0.0
            for _ in range(50):
                a = np.asarray(pol.dist_info(pol.params, np.asarray(obs)[None].astype(np.float32))["mean"])[0]
                obs, _, _, info = env.step(a)
                if info["reward_true"]:
                    final = info["reward_true"]
            finals.append(final)
            env.close()
        assert np.mean(finals) > -0.5, f"expert underperforms: {finals}"
