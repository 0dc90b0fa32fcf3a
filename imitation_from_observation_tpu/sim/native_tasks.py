"""Fully-native vectorized task environments for the whole suite.

All six tasks (pusher / reacher / cleaner / striker / thrower / real pusher)
with every per-step computation batched: physics is ONE GIL-free C call over
the pool (sim/native/mjbatch.cpp), task math (distances, rewards,
observations) is vectorized numpy over C-exported body COMs / site
positions, and frames come from a pluggable batched backend — the on-device
ray-cast renderer (sim/raycast.py, default) or the pool's shared-EGL
offscreen renderer.

This is the round-3 replacement for the hot loop the reference ran as N
python ``env.step`` dispatches per vec-step across 4-6 worker processes
(rllab/sampler/parallel_sampler.py:99-127, stateful_pool.py:102-157): no
python task objects exist at all; semantics match ``sim/tasks.py`` (same
MJCF, same reset distributions, same reward_true/dense-reward/obs
conventions — parity-tested per task in tests/test_native_tasks.py).

Actions arrive in [-1, 1] (NormalizedEnv semantics built in,
rllab/envs/normalized_env.py:77-92). Episodes run in lockstep: every env
resets together at ``max_path_length`` (the visual-imitation pipeline's
fixed-horizon contract), which keeps resets, camera resampling and frame
batches rectangular.
"""

from __future__ import annotations

import os
from typing import Any

import mujoco
import numpy as np

from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.sim.base import _ASSET_DIR, Box
from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim
from imitation_from_observation_tpu.video.preprocess import imresize_uint8


class NativeVecTask:
    """Base: N sims of one task stepped/rendered batched (VecEnv interface).

    frames_mode: "odd" renders at pre-increment itr odd like the python base
    (sim/base.py::_maybe_render_frames; the reference rendered at odd steps,
    pusher3dof.py:36-43), "all" renders every step plus the reset frame
    (demo-video recording), "none" skips rendering.
    """

    ASSET = ""
    BODY_NAMES: tuple[str, ...] = ()
    SITE_NAMES: tuple[str, ...] = ()

    def __init__(
        self,
        n_envs: int,
        config: EnvConfig | None = None,
        max_path_length: int | None = None,
        frame_backend: str = "tpu",  # tpu | egl
        frames_mode: str | None = None,  # default from config.render_frames
        resample_cameras: bool = False,  # fresh viewpoints every episode
        supersample: int | None = None,  # None: 2 below 128px, 1 at/above
        device_frames: bool = False,  # keep rendered frames ON device
    ):
        self.config = config or EnvConfig()
        self.n_envs = n_envs
        xml = os.path.join(_ASSET_DIR, self.ASSET)
        self.sim = NativeBatchSim(xml, n_envs)
        self.model = mujoco.MjModel.from_xml_path(xml)
        d = mujoco.MjData(self.model)
        self.init_qpos = d.qpos.copy()
        self.init_qvel = d.qvel.copy()
        self._bid = {
            n: mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY, n)
            for n in self.BODY_NAMES
        }
        self._sid = {
            n: mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_SITE, n)
            for n in self.SITE_NAMES
        }
        # mj_name2id returns -1 for unknown names with no error; a typo'd
        # BODY_NAMES entry would otherwise read out of bounds in C every step
        for kind, ids in (("body", self._bid), ("site", self._sid)):
            missing = [n for n, i in ids.items() if i < 0]
            if missing:
                raise ValueError(f"unknown {kind} name(s) {missing} in {xml}")
        ctrl = self.model.actuator_ctrlrange.astype(np.float64)
        self._ctrl_lo, self._ctrl_hi = ctrl[:, 0], ctrl[:, 1]
        self.frame_skip = self.config.frame_skip or 5
        self.max_path_length = max_path_length or self.config.horizon
        self.rng = np.random.default_rng(self.config.seed)
        self.itr = 0
        self.nvp = max(1, self.config.n_viewpoints)
        self.resample_cameras = resample_cameras
        if frames_mode is None:
            frames_mode = "odd" if self.config.render_frames else "none"
        self.frames_mode = frames_mode
        self.frame_backend = frame_backend
        # device-resident frames: rendered steps accumulate as jax arrays
        # (no per-step device->host fetch); the finished episode's block
        # [T, N, V, h, w, 3] is popped by the sampler and consumed on device
        # by the reward engine — the round trip the reference's host
        # GL->feed_dict path paid every rollout (rllab/sampler/base.py:227-244)
        # never happens
        if device_frames and frame_backend != "tpu":
            raise ValueError("device_frames requires the tpu raycast backend")
        self.device_frames = device_frames
        self._ep_frames: list = []
        self._last_ep_frames = None
        # host copies of per-env randomized model fields (pushed to the pool
        # for physics/EGL; consumed directly by the raycast renderer)
        G = self.model.ngeom
        self.geom_rgba = np.tile(self.model.geom_rgba[None], (n_envs, 1, 1)).astype(np.float32)
        self.geom_pos = np.tile(self.model.geom_pos[None], (n_envs, 1, 1)).astype(np.float64)
        self._distractor_gids = [
            g
            for g in range(G)
            if (mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_GEOM, g) or "").startswith(
                "object"
            )
            and (mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_GEOM, g) or "")[6:].isdigit()
        ]
        self._renderer = None
        if self.frames_mode != "none":
            if frame_backend == "tpu":
                from imitation_from_observation_tpu.sim.raycast import TpuRenderer

                h, w = self.config.image_size
                if supersample is None:
                    # 2x AA matters at the sim tasks' 48-64px; at the
                    # inception config's 299px it is invisible through the
                    # backbone and quadruples the ray count (the RL render
                    # bill at 250 envs x 299^2)
                    supersample = 1 if max(h, w) >= 128 else 2
                self._renderer = TpuRenderer(self.model, h, w, ss=supersample)
            else:
                h, w = self.config.render_size
                self.sim.render_setup(w, h, fast=(self.config.render_quality == "fast"))
        self._sample_cameras()
        nu = self.sim.nu
        self.action_space = Box(-np.ones(nu), np.ones(nu))
        self.reset()
        obs = self._obs()
        inf = np.full(obs.shape[1:], np.inf, np.float32)
        self.observation_space = Box(-inf, inf)

    # -- camera handling ----------------------------------------------------
    def _sample_cameras(self) -> None:
        """Per-env azimuths, fixed per lifetime like the python base's
        one-shot viewer_setup (sim/base.py:93-95, pusher3dof.py:48-51) unless
        ``resample_cameras`` redraws them every episode."""
        self._azimuths = self.rng.uniform(0.0, 360.0, (self.n_envs, self.nvp))
        v = self.config.viewpoint
        if v is not None:
            arr = np.asarray(v, np.float64).reshape(1, -1)
            if self.nvp > 1 and arr.size == 1:
                # one shared azimuth would render the SAME frame nvp times —
                # the reference pins a per-viewpoint list (_kwargs['vp'][vid],
                # striker.py:74-76); fail loudly instead of silently scoring
                # duplicate cameras
                raise ValueError(
                    f"scalar config.viewpoint with n_viewpoints={self.nvp} "
                    f"duplicates the camera; pass {self.nvp} azimuths "
                    "(e.g. sample_rl_context(task, seed, nvp=...))"
                )
            self._azimuths[:] = arr
        self.cams = np.zeros((self.n_envs, self.nvp, 6))
        for vp in range(self.nvp):
            lookat, dist, elev = self.camera_pose(vp)
            self.cams[:, vp, :3] = lookat
            self.cams[:, vp, 3] = dist
            self.cams[:, vp, 4] = elev
        self.cams[:, :, 5] = self._azimuths

    def camera_pose(self, vp: int):
        """(lookat [3] or [N,3], distance, elevation) — azimuth handled by
        ``_sample_cameras``. Default matches sim/base.py::camera_pose."""
        return np.zeros(3), 4.0, -45.0

    def _elevation(self, vp: int) -> float:
        va = self.config.view_angle
        if va is None:
            return -45.0
        return -float(va if np.isscalar(va) else va[vp])

    # -- sim plumbing -------------------------------------------------------
    def seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)
        self._sample_cameras()

    def com(self, name: str) -> np.ndarray:
        return self.sim.subtree_com(self._bid[name])  # [N, 3]

    def site(self, name: str) -> np.ndarray:
        return self.sim.site_xpos(self._sid[name])  # [N, 3]

    def _sync_model(self, i: int) -> None:
        self.sim.sync_geoms(i, self.geom_rgba[i], self.geom_pos[i])

    def _random_colors(self, n: int, avoid_red: bool = True) -> np.ndarray:
        """Batched random_color (sim/base.py:149-153): resample while within
        0.5 of pure red."""
        c = self.rng.uniform(0, 1, (n, 3))
        if avoid_red:
            red = np.array([1.0, 0.0, 0.0])
            bad = np.linalg.norm(c - red, axis=1) < 0.5
            while bad.any():
                c[bad] = self.rng.uniform(0, 1, (int(bad.sum()), 3))
                bad = np.linalg.norm(c - red, axis=1) < 0.5
        return np.concatenate([c, np.ones((n, 1))], 1)

    def _randomize_distractors(self) -> None:
        """Vectorized sim/base.py::randomize_distractors (reference
        pusher3dof.py:83-108): per-env random color/visibility/position for
        object0..N, or the deterministic config.geoms override."""
        gids = self._distractor_gids
        if not gids:
            return
        n = self.n_envs
        if self.config.geoms is not None:
            for ct, gid in enumerate(gids):
                rgba, x, y = self.config.geoms[ct][:3]
                self.geom_rgba[:, gid] = np.asarray(rgba, np.float32)
                self.geom_pos[:, gid, 0] = x
                self.geom_pos[:, gid, 1] = y
            return
        for gid in gids:
            rgba = self._random_colors(n)
            rgba[self.rng.random(n) > 0.5, 3] = 0.0  # invisible distractor
            self.geom_rgba[:, gid] = rgba
            self.geom_pos[:, gid, 0] = self.rng.uniform(-0.9, 0.9, n)
            self.geom_pos[:, gid, 1] = self.rng.uniform(0.0, 1.0, n)

    # -- VecEnv api ---------------------------------------------------------
    def reset(self) -> np.ndarray:
        if self.resample_cameras:
            self._sample_cameras()
        qpos, qvel = self._reset_state()
        self._reset_extra()
        for i in range(self.n_envs):
            self._sync_model(i)
        self.sim.set_state(qpos, qvel)
        self.itr = 0
        self._ep_frames = []
        self._reward_orig = np.ones(self.n_envs)
        return self._obs()

    def step_batch(self, actions: np.ndarray):
        """Lockstep vec-step WITHOUT per-env info-dict fanout:
        -> (obs [N,...], rewards [N], done: bool, info) where info carries
        batched arrays {reward_true [N], frames [N,V,h,w,3]|None}. The
        sampler's lockstep fast path consumes this directly; :meth:`step`
        wraps it into the per-env VecEnv contract."""
        a = np.clip(np.asarray(actions, np.float64), -1, 1)
        ctrl = self._ctrl_lo + (a + 1.0) * 0.5 * (self._ctrl_hi - self._ctrl_lo)
        pre = self._pre_step()
        render_now = self.frames_mode == "all" or (
            self.frames_mode == "odd" and self.itr % 2 == 1
        )
        # python-path parity: derived quantities refresh (mj_forward) exactly
        # when a frame is rendered (sim/base.py::render does mj_forward first)
        self.sim.step(ctrl, self.frame_skip, forward=render_now)
        rewards, reward_true = self._post_step(pre, ctrl)
        frames = None
        if render_now:
            if self.device_frames:
                self._ep_frames.append(self._render_frames_device())
            else:
                frames = self.render_frames()
        self.itr += 1
        done = self.itr >= self.max_path_length
        if done and self.device_frames and self._ep_frames:
            import jax.numpy as jnp

            self._last_ep_frames = jnp.stack(self._ep_frames)  # [T,N,V,h,w,3]
            self._ep_frames = []
        obs = self.reset() if done else self._obs()
        out_r = rewards if self.config.dense_reward else np.zeros(self.n_envs)
        return obs, out_r, done, dict(reward_true=reward_true, frames=frames)

    def step(self, actions: np.ndarray):
        obs, out_r, done, info = self.step_batch(actions)
        frames, reward_true = info["frames"], info["reward_true"]
        infos = [
            dict(
                reward_true=float(reward_true[i]),
                frames=None if frames is None else frames[i],
            )
            for i in range(self.n_envs)
        ]
        return obs, out_r, np.full(self.n_envs, done), infos

    def _render_frames_device(self):
        """Raycast-render the current vec-step and KEEP it on device."""
        xpos, xmat = self.sim.geom_state()
        return self._renderer.render_device(xpos, xmat, self.geom_rgba, self.cams)

    def context_fingerprint(self) -> str:
        """Scene-context fingerprint for the reward engine's fixed-context
        contract (reward/engine.py::_check_shared_context): sha1 over the
        shared camera poses + geom colors/positions when every env renders
        the SAME scene draw, the sentinel ``"mixed"`` when any env differs
        (the demo-recording configuration, where contexts randomize
        per-episode). The engine warms its translated-demo cache from ONE
        context frame, so a mixed batch must fail loudly, not silently score
        against rollout 0's scene."""
        import hashlib

        parts = (self.cams, self.geom_rgba, self.geom_pos)
        for a in parts:
            if not (a == a[:1]).all():
                return "mixed"
        h = hashlib.sha1()
        for a in parts:
            h.update(np.ascontiguousarray(a[0]).tobytes())
        return h.hexdigest()[:16]

    def pop_episode_frames(self):
        """Device frames of the episode that just finished, [T,N,V,h,w,3]
        uint8 jax array (or None). Cleared on read — each block is consumed
        exactly once by the sampler that observed the lockstep done."""
        block, self._last_ep_frames = self._last_ep_frames, None
        return block

    def render_frames(self) -> np.ndarray:
        """All envs x viewpoints in one batched call -> uint8 [N,V,h,w,3]."""
        if self._renderer is not None:  # tpu raycast
            xpos, xmat = self.sim.geom_state()
            return self._renderer.render(xpos, xmat, self.geom_rgba, self.cams)
        raw = self.sim.render(self.cams)
        if raw.shape[2:4] == tuple(self.config.image_size):
            return raw
        h, w = self.config.image_size
        out = np.empty((self.n_envs, self.nvp, h, w, 3), np.uint8)
        for i in range(self.n_envs):
            for v in range(self.nvp):
                out[i, v] = imresize_uint8(raw[i, v], (h, w))
        return out

    def close(self) -> None:
        self.sim.close()
        if getattr(self, "_probe_env", None) is not None:
            self._probe_env.close()
            self._probe_env = None

    @property
    def envs(self):
        """Compat shim for consumers that want a single steppable env (e.g.
        BatchPolopt's eval-video recorder): one lazily-built python task env
        with the same config."""
        if getattr(self, "_probe_env", None) is None:
            from imitation_from_observation_tpu.sim.registry import make_env
            from imitation_from_observation_tpu.sim.wrappers import NormalizedEnv

            name = {v: k for k, v in NATIVE_VEC_TASKS.items()}[type(self)]
            self._probe_env = NormalizedEnv(make_env(name, self.config))
        return [self._probe_env]

    # -- task hooks ---------------------------------------------------------
    def _reset_state(self) -> tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    def _reset_extra(self) -> None:
        pass

    def _pre_step(self) -> Any:
        raise NotImplementedError

    def _post_step(self, pre: Any, ctrl: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """-> (dense rewards [N], reward_true [N])."""
        raise NotImplementedError

    def _obs(self) -> np.ndarray:
        raise NotImplementedError


def _norm(x: np.ndarray) -> np.ndarray:
    return np.linalg.norm(x, axis=-1)


class NativePusherVecTask(NativeVecTask):
    """Pusher3DOF (sim/tasks.py:21-84; reference pusher3dof.py)."""

    ASSET = "pusher3dof.xml"
    BODY_NAMES = ("object", "goal", "distal_4")

    def _reset_state(self):
        n, nq = self.n_envs, self.model.nq
        qpos = self.init_qpos + self.rng.uniform(-0.1, 0.1, (n, nq))
        obj = np.stack(
            [self.rng.uniform(-1.0, -0.4, n), self.rng.uniform(0.3, 1.2, n)], 1
        )
        goal = np.stack(
            [self.rng.uniform(-1.2, -0.8, n), self.rng.uniform(0.8, 1.2, n)], 1
        )
        bad = _norm(obj - goal) <= 0.45
        while bad.any():
            k = int(bad.sum())
            obj[bad] = np.stack(
                [self.rng.uniform(-1.0, -0.4, k), self.rng.uniform(0.3, 1.2, k)], 1
            )
            goal[bad] = np.stack(
                [self.rng.uniform(-1.2, -0.8, k), self.rng.uniform(0.8, 1.2, k)], 1
            )
            bad = _norm(obj - goal) <= 0.45
        if self.config.object_pos is not None:
            obj[:] = np.asarray(self.config.object_pos)
        if self.config.goal is not None:
            goal[:] = np.asarray(self.config.goal)
        self.object, self.goal = obj, goal
        qpos[:, -4:-2] = obj
        qpos[:, -2:] = goal
        qvel = np.tile(self.init_qvel, (n, 1))
        qvel[:, -4:] = 0
        return qpos, qvel

    def _reset_extra(self):
        self._randomize_distractors()

    def _pre_step(self):
        return -_norm(self.com("goal") - self.com("object"))  # reward_dist

    def _post_step(self, reward_dist, ctrl):
        reward_ctrl = -np.square(ctrl).sum(1)
        if self.itr == 0:
            self._reward_orig = -reward_dist
        reward_true = (
            reward_dist / self._reward_orig
            if self.itr == self.config.horizon - 1
            else np.zeros(self.n_envs)
        )
        return reward_dist + 0.001 * reward_ctrl, reward_true

    def _obs(self):
        qpos, qvel = self.sim.get_state()
        base = np.concatenate([qpos[:, :-4], qvel[:, :-4]], 1)
        if self.config.full_state:
            base = np.concatenate(
                [base, self.com("distal_4"), self.com("object"), self.com("goal")], 1
            )
        return base.astype(np.float32)


class NativeReacherVecTask(NativeVecTask):
    """Reacher3DOF (sim/tasks.py:87-150; reference reacher3dof.py)."""

    ASSET = "reacher3dof.xml"
    BODY_NAMES = ("goal", "distal_4")

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)

    def _reset_state(self):
        n, nq = self.n_envs, self.model.nq
        qpos = self.init_qpos + self.rng.uniform(-0.1, 0.1, (n, nq))
        if self.config.goal is not None:
            goal = np.tile(np.asarray(self.config.goal, np.float64), (n, 1))
        else:
            goal = np.stack(
                [self.rng.uniform(-1.1, -0.5, n), self.rng.uniform(0.5, 1.1, n)], 1
            )
        self.goal = goal
        qpos[:, -2:] = goal
        qvel = np.tile(self.init_qvel, (n, 1))
        qvel[:, -4:] = 0
        return qpos, qvel

    def _reset_extra(self):
        n = self.n_envs
        bg = (
            np.tile(np.asarray(self.config.bgcolor, np.float32), (n, 1))
            if self.config.bgcolor is not None
            else self._random_colors(n)
        )
        arm = self._random_colors(n)
        bad = _norm(bg[:, :3] - arm[:, :3]) < 0.5
        while bad.any():
            k = int(bad.sum())
            arm[bad] = np.concatenate(
                [self.rng.uniform(0, 1, (k, 3)), np.ones((k, 1))], 1
            )
            bad = _norm(bg[:, :3] - arm[:, :3]) < 0.5
        if self.config.armcolor is not None:
            arm[:] = np.asarray(self.config.armcolor, np.float32)
        gid = lambda name: mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_GEOM, name)
        self.geom_rgba[:, gid("bg")] = bg
        for i in range(7):
            self.geom_rgba[:, gid(f"arm{i}")] = arm
        self._randomize_distractors()

    def _pre_step(self):
        return -_norm(self.com("distal_4") - self.com("goal"))

    def _post_step(self, reward_dist, ctrl):
        reward_ctrl = -np.square(ctrl).sum(1)
        if self.itr == 0:
            self._reward_orig = -reward_dist
        reward_true = (
            reward_dist / self._reward_orig
            if self.itr == self.config.horizon - 1
            else np.zeros(self.n_envs)
        )
        return reward_dist + 0.001 * reward_ctrl, reward_true

    def _obs(self):
        qpos, qvel = self.sim.get_state()
        base = np.concatenate([qpos[:, :-4], qvel[:, :-4]], 1)
        if self.config.full_state:
            base = np.concatenate([base, self.com("distal_4"), self.com("goal")], 1)
        return base.astype(np.float32)


class NativeCleanerVecTask(NativeVecTask):
    """Cleaner / sweep (sim/tasks.py:153-186; reference cleaner_env.py)."""

    ASSET = "cleaner.xml"
    BODY_NAMES = ("distal_4", "goal", "object0", "object1", "object2", "object3", "object4")
    SITE_NAMES = ("tip_arml", "tip_armr")

    def camera_pose(self, vp: int):
        return np.zeros(3), 4.0, -45.0

    def _reset_state(self):
        n = self.n_envs
        return (
            np.tile(self.init_qpos, (n, 1)),
            np.tile(self.init_qvel, (n, 1)),
        )

    def _pre_step(self):
        parm = self.com("distal_4")
        pgoal = self.com("goal")
        objs = [self.com(f"object{i}") for i in range(5)]
        true_reward = -sum(_norm(o - pgoal) for o in objs)
        reward_touch = -sum(_norm(parm - o) for o in objs)
        diff_x = -np.abs(self.site("tip_arml")[:, 1] - self.site("tip_armr")[:, 1])
        return true_reward, reward_touch, diff_x

    def _post_step(self, pre, ctrl):
        true_reward, reward_touch, diff_x = pre
        reward_ctrl = -np.square(ctrl).sum(1)
        dense = true_reward + reward_touch + 10 * diff_x + 0.001 * reward_ctrl
        if self.itr == 0:
            self._reward_orig = -true_reward
        scaled = true_reward / self._reward_orig
        reward_true = (
            scaled if self.itr == self.config.horizon - 1 else np.zeros(self.n_envs)
        )
        return dense, reward_true

    def _obs(self):
        qpos, qvel = self.sim.get_state()
        return np.concatenate([qpos, qvel], 1).astype(np.float32)


class NativeStrikerVecTask(NativeVecTask):
    """Striker (sim/tasks.py:188-261; reference striker.py, incl. the
    per-episode strike state machine and multi-viewpoint camera support)."""

    ASSET = "striker.xml"
    BODY_NAMES = ("object", "goal", "r_wrist_flex_link")

    def camera_pose(self, vp: int):
        return np.array([0.0, 0.2, 0.0]), 2.5, self._elevation(vp)

    def _reset_state(self):
        n = self.n_envs
        qpos = np.tile(self.init_qpos, (n, 1))
        self.ball = np.tile(np.array([0.5, -0.175]), (n, 1))
        goal = (
            np.asarray(self.config.goal)
            if self.config.goal is not None
            else np.array([0.7, 1.1])
        )
        self.goal = np.tile(goal, (n, 1))
        qpos[:, -9:-7] = self.ball[:, [1, 0]]
        qpos[:, -7:-5] = self.goal
        diff = self.ball - self.goal
        angle = -np.arctan(diff[:, 0] / (diff[:, 1] + 1e-8))
        qpos[:, -1] = angle / 3.14
        qvel = np.tile(self.init_qvel, (n, 1)) + self.rng.uniform(
            -0.1, 0.1, (n, self.model.nv)
        )
        qvel[:, 7:] = 0
        return qpos, qvel

    def _reset_extra(self):
        n = self.n_envs
        self._striked = np.zeros(n, bool)
        self._min_strike_dist = np.full(n, np.inf)
        self._strike_pos = np.zeros((n, 3))

    def _pre_step(self):
        obj = self.com("object")
        wrist = self.com("r_wrist_flex_link")
        goal = self.com("goal")
        vec1 = obj - wrist
        vec2 = obj - goal
        self._min_strike_dist = np.minimum(self._min_strike_dist, _norm(vec2))
        newly = (_norm(vec1) < 0.2) & ~self._striked
        self._striked |= newly
        self._strike_pos[newly] = wrist[newly]
        reward_near = np.where(
            self._striked, -_norm(wrist - self._strike_pos), -_norm(vec1)
        )
        return vec2, reward_near

    def _post_step(self, pre, ctrl):
        vec2, reward_near = pre
        reward_dist = -self._min_strike_dist
        reward_ctrl = -np.square(ctrl).sum(1)
        # actual_dist from the pre-step vec2, like the reference (striker.py /
        # sim/tasks.py:214 keeps the stale read)
        actual_dist = _norm(vec2)
        if self.itr == 0:
            self._reward_orig = actual_dist.copy()
        reward_true = (
            -actual_dist / self._reward_orig
            if self.itr == self.config.horizon - 1
            else np.zeros(self.n_envs)
        )
        dense = 3 * reward_dist + 0.1 * reward_ctrl + 0.5 * reward_near
        return dense, reward_true

    def _obs(self):
        qpos, qvel = self.sim.get_state()
        return np.concatenate(
            [
                qpos[:, :7],
                qvel[:, :7],
                self.com("r_wrist_flex_link"),
                self.com("object"),
                self.com("goal"),
            ],
            1,
        ).astype(np.float32)


class NativeThrowerVecTask(NativeVecTask):
    """Thrower (sim/tasks.py:264-327; reference thrower.py)."""

    ASSET = "thrower.xml"
    BODY_NAMES = ("ball", "goal", "r_wrist_roll_link")

    def camera_pose(self, vp: int):
        return np.array([0.0, 0.2, 0.0]), 2.5, self._elevation(vp)

    def _reset_state(self):
        n = self.n_envs
        qpos = np.tile(self.init_qpos, (n, 1))
        if self.config.goal is not None:
            goal = np.tile(np.asarray(self.config.goal, np.float64), (n, 1))
        else:
            goal = self.rng.uniform(-0.3, 0.3, (n, 2))
        self.goal = goal
        qpos[:, -9:-7] = goal
        qvel = np.tile(self.init_qvel, (n, 1)) + self.rng.uniform(
            -0.005, 0.005, (n, self.model.nv)
        )
        qvel[:, 7:] = 0
        return qpos, qvel

    def _reset_extra(self):
        n = self.n_envs
        self._hit = np.zeros(n, bool)
        self._hit_loc = np.zeros((n, 3))

    def _pre_step(self):
        ball = self.com("ball")
        goal_xy = self.com("goal")[:, :2]
        newly = ~self._hit & (ball[:, 2] < -0.25)
        self._hit |= newly
        self._hit_loc[newly] = ball[newly]
        reward_dist = np.where(
            self._hit,
            -_norm(self._hit_loc[:, :2] - goal_xy),
            -_norm(ball[:, :2] - goal_xy),
        )
        reward_actual = -_norm(ball[:, :2] - goal_xy)
        return reward_dist, reward_actual

    def _post_step(self, pre, ctrl):
        reward_dist, reward_actual = pre
        reward_ctrl = -np.square(ctrl).sum(1)
        if self.itr == 0:
            self._reward_orig = -reward_actual
        reward_true = (
            reward_actual / self._reward_orig
            if self.itr == self.config.horizon - 1
            else np.zeros(self.n_envs)
        )
        return reward_dist + 0.002 * reward_ctrl, reward_true

    def _obs(self):
        qpos, qvel = self.sim.get_state()
        return np.concatenate(
            [
                qpos[:, :7],
                qvel[:, :7],
                self.com("r_wrist_roll_link"),
                self.com("ball"),
                self.com("goal"),
            ],
            1,
        ).astype(np.float32)


class NativeRealPusherVecTask(NativePusherVecTask):
    """Pusher3DOFReal (sim/tasks.py:330-366; reference pusher3dofreal.py):
    fixed measured scene, camera distance/elevation from config."""

    ASSET = "pusher3dofreal.xml"

    def camera_pose(self, vp: int):
        dist = self.config.cam_dist if self.config.cam_dist is not None else 3.0
        elev = (
            -float(self.config.view_angle)
            if self.config.view_angle is not None and np.isscalar(self.config.view_angle)
            else -45.0
        )
        obj_x = (
            float(np.asarray(self.config.object_pos)[0])
            if self.config.object_pos is not None
            else 0.0
        )
        return np.array([0.0, obj_x, 0.0]), dist, elev

    def _sample_cameras(self):
        super()._sample_cameras()
        if self.config.viewpoint is None:
            if self.nvp > 1:
                raise ValueError(
                    "pusher3dofreal defaults every viewpoint to the one fixed "
                    f"real camera; n_viewpoints={self.nvp} needs explicit "
                    "per-viewpoint azimuths in config.viewpoint"
                )
            self._azimuths[:] = 0.0  # fixed real camera (pusher3dofreal.py:44-63)
            self.cams[:, :, 5] = 0.0

    def _reset_state(self):
        n = self.n_envs
        qpos = np.tile(self.init_qpos, (n, 1))
        qpos[:, 0], qpos[:, 1], qpos[:, 2] = 1.7, 3.0, 1.5
        if self.config.goal is not None:
            if self.config.object_pos is None:
                raise ValueError(
                    "pusher3dofreal: config.goal is set but config.object_pos is None"
                )
            obj = np.tile(np.asarray(self.config.object_pos, np.float64), (n, 1))
            goal = np.tile(np.asarray(self.config.goal, np.float64), (n, 1))
        else:
            obj = np.zeros((n, 2))
            goal = np.zeros((n, 2))
        self.object, self.goal = obj, goal
        qpos[:, -4:-2] = obj
        qpos[:, -2:] = goal
        qvel = np.tile(self.init_qvel, (n, 1))
        qvel[:, -4:] = 0
        return qpos, qvel

    def _reset_extra(self):
        pass  # fixed scene: no distractor randomization


NATIVE_VEC_TASKS = {
    "pusher3dof": NativePusherVecTask,
    "reacher3dof": NativeReacherVecTask,
    "cleaner": NativeCleanerVecTask,
    "striker": NativeStrikerVecTask,
    "thrower": NativeThrowerVecTask,
    "pusher3dofreal": NativeRealPusherVecTask,
}


def make_native_vec(
    task: str,
    n_envs: int,
    config: EnvConfig | None = None,
    max_path_length: int | None = None,
    frame_backend: str = "tpu",
    **kw,
) -> NativeVecTask:
    """Factory over the six task families (raises KeyError on unknown)."""
    return NATIVE_VEC_TASKS[task](
        n_envs, config, max_path_length, frame_backend=frame_backend, **kw
    )
