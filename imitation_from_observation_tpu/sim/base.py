"""MuJoCo task-environment base.

Replaces the reference's three-layer native stack — mujoco-py ctypes bindings
to MuJoCo 1.31 (rllab/mujoco_py/mjcore.py), a GLFW/OpenGL FBO viewer
(mjviewer.py) and gym's MujocoEnv (gym/envs/mujoco/mujoco_env.py) — with the
modern MuJoCo 3 C library and its EGL headless renderer.

Semantics kept from the reference base (mujoco_env.py:80-148): ``frame_skip``
ctrl application per env step, ``init_qpos/init_qvel`` snapshots, body-COM
getters via subtree COM, and offscreen rgb rendering with the black-frame
retry loop (:117-122). Camera control reproduces ``viewer_setup``:
lookat/distance/elevation/azimuth, with the azimuth drawn uniformly per
environment unless pinned by config ``viewpoint`` (pusher3dof.py:45-58).

Normalizations vs the reference (SURVEY §7): frames always live under
``info["frames"]`` with shape [nvp, H, W, 3] uint8 (the reference mixes
``img``/``imgs`` keys and list/array shapes); ``n_viewpoints`` defaults to 1.
"""

from __future__ import annotations

import os
from typing import Any

# mujoco picks its GL backend at import time — the default must be in place
# BEFORE the import or headless rendering fails with "no OpenGL platform"
os.environ.setdefault("MUJOCO_GL", "egl")

import mujoco
import numpy as np

from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.video.preprocess import imresize_uint8

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")


class Box:
    """Minimal continuous space (replaces rllab/spaces/box.py for our needs)."""

    def __init__(self, low: np.ndarray, high: np.ndarray):
        self.low = np.asarray(low, np.float32)
        self.high = np.asarray(high, np.float32)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.low.shape

    @property
    def flat_dim(self) -> int:
        return int(np.prod(self.low.shape))

    def sample(self, rng: np.random.Generator) -> np.ndarray:
        return rng.uniform(self.low, self.high).astype(np.float32)

    def contains(self, x: np.ndarray) -> bool:
        return x.shape == self.shape and bool(
            np.all(x >= self.low - 1e-6) and np.all(x <= self.high + 1e-6)
        )

    def flatten(self, x) -> np.ndarray:
        return np.asarray(x, np.float32).reshape(-1)

    def unflatten(self, x) -> np.ndarray:
        return np.asarray(x, np.float32).reshape(self.shape)


class MujocoTask:
    """Base class for the task suite. Subclasses set ``ASSET`` and implement
    ``_task_step``, ``reset_model``, ``_get_obs`` and ``camera_pose``."""

    ASSET: str = ""
    FRAME_SKIP: int = 5

    def __init__(self, config: EnvConfig | None = None):
        self.config = config or EnvConfig()
        self.model = mujoco.MjModel.from_xml_path(os.path.join(_ASSET_DIR, self.ASSET))
        self.data = mujoco.MjData(self.model)
        self.frame_skip = self.config.frame_skip or self.FRAME_SKIP
        self.init_qpos = self.data.qpos.copy()
        self.init_qvel = self.data.qvel.copy()
        self._init_geom_rgba = self.model.geom_rgba.copy()
        self._init_geom_pos = self.model.geom_pos.copy()
        self.rng = np.random.default_rng(self.config.seed)
        self.itr = 0
        self._renderer: mujoco.Renderer | None = None
        self._fast_render = self.config.render_quality == "fast"
        if self._fast_render:
            # software-GL speed: no MSAA resolve, no shadowmap allocation
            # (the shadow pass costs ~80 ms/frame on llvmpipe; see EnvConfig)
            self.model.vis.quality.offsamples = 0
            self.model.vis.quality.shadowsize = 0
        # per-instance random azimuth, fixed for the env's lifetime, like the
        # reference's one-shot viewer_setup (pusher3dof.py:48-51)
        self._random_azimuths = self.rng.uniform(0.0, 360.0, size=max(1, self.config.n_viewpoints))
        bounds = self.model.actuator_ctrlrange.copy().astype(np.float32)
        self.action_space = Box(bounds[:, 0], bounds[:, 1])
        mujoco.mj_forward(self.model, self.data)
        obs = self._get_obs()
        inf = np.full(obs.shape, np.inf, np.float32)
        self.observation_space = Box(-inf, inf)

    # -- core api ----------------------------------------------------------
    def seed(self, seed: int) -> None:
        self.rng = np.random.default_rng(seed)
        self._random_azimuths = self.rng.uniform(0.0, 360.0, size=max(1, self.config.n_viewpoints))

    def reset(self) -> np.ndarray:
        mujoco.mj_resetData(self.model, self.data)
        self.model.geom_rgba[:] = self._init_geom_rgba
        self.model.geom_pos[:] = self._init_geom_pos
        self.itr = 0
        obs = self.reset_model()
        return obs

    def step(self, action: np.ndarray):
        obs, info = self._task_step(np.asarray(action, np.float64))
        info.setdefault("frames", self._maybe_render_frames())
        self.itr += 1
        # native reward is 0 in visual modes — the reward engine splices
        # costs in from frames (reference pusher3dof.py:43). With
        # dense_reward the task's shaped reward is emitted instead (used to
        # train oracle experts for demo generation).
        reward = info.get("dense_reward", 0.0) if self.config.dense_reward else 0.0
        return obs, reward, False, info

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray) -> None:
        self.data.qpos[:] = qpos
        self.data.qvel[:] = qvel
        mujoco.mj_forward(self.model, self.data)

    def do_simulation(self, ctrl: np.ndarray, n_frames: int) -> None:
        self.data.ctrl[:] = ctrl
        for _ in range(n_frames):
            mujoco.mj_step(self.model, self.data)

    def body_com(self, name: str) -> np.ndarray:
        bid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_BODY, name)
        return self.data.subtree_com[bid].copy()

    def site_pos(self, name: str) -> np.ndarray:
        sid = mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_SITE, name)
        return self.data.site_xpos[sid].copy()

    def geom_id(self, name: str) -> int:
        return mujoco.mj_name2id(self.model, mujoco.mjtObj.mjOBJ_GEOM, name)

    # -- randomization helpers (reference pusher3dof.py:60-108) ------------
    def random_color(self, avoid_red: bool = True) -> np.ndarray:
        color = self.rng.uniform(0, 1, 3)
        while avoid_red and np.linalg.norm(color - np.array([1.0, 0.0, 0.0])) < 0.5:
            color = self.rng.uniform(0, 1, 3)
        return np.concatenate([color, [1.0]])

    def randomize_distractors(self) -> None:
        """Random position/color/visibility for geoms named object0..N, or the
        deterministic override from ``config.geoms``."""
        cfg_geoms = self.config.geoms
        ct = 0
        for gid in range(self.model.ngeom):
            name = mujoco.mj_id2name(self.model, mujoco.mjtObj.mjOBJ_GEOM, gid) or ""
            if not (name.startswith("object") and name[6:].isdigit()):
                continue
            if cfg_geoms is not None:
                rgba, x, y = cfg_geoms[ct][0], cfg_geoms[ct][1], cfg_geoms[ct][2]
                self.model.geom_rgba[gid] = np.asarray(rgba)
                self.model.geom_pos[gid, 0] = x
                self.model.geom_pos[gid, 1] = y
                ct += 1
            else:
                rgba = self.random_color()
                if self.rng.random() > 0.5:
                    rgba[-1] = 0.0  # invisible distractor
                self.model.geom_rgba[gid] = rgba
                self.model.geom_pos[gid, 0] = self.rng.uniform(-0.9, 0.9)
                self.model.geom_pos[gid, 1] = self.rng.uniform(0.0, 1.0)

    # -- rendering ---------------------------------------------------------
    def camera_pose(self, vp: int = 0) -> tuple[np.ndarray, float, float, float]:
        """(lookat, distance, elevation, azimuth) — override per task."""
        az = self._azimuth(vp)
        return np.zeros(3), 4.0, -45.0, az

    def _azimuth(self, vp: int) -> float:
        v = self.config.viewpoint
        if v is None:
            return float(self._random_azimuths[vp])
        if np.isscalar(v):
            if max(1, self.config.n_viewpoints) > 1:
                # the reference pins a per-viewpoint azimuth list
                # (_kwargs['vp'][vid], striker.py:74-76); a shared scalar
                # would score the same frame nvp times — fail loudly
                raise ValueError(
                    "scalar config.viewpoint with n_viewpoints="
                    f"{self.config.n_viewpoints} duplicates the camera; pass "
                    "one azimuth per viewpoint (sample_rl_context(..., nvp=))"
                )
            return float(v)
        return float(v[vp])

    def _get_renderer(self) -> mujoco.Renderer:
        if self._renderer is None:
            h, w = self.config.render_size
            self._renderer = mujoco.Renderer(self.model, height=h, width=w)
        return self._renderer

    def render(self, vp: int = 0, size: tuple[int, int] | None = None) -> np.ndarray:
        """Offscreen rgb render -> uint8 [H, W, 3], resized like the
        reference's render + imresize hop (pusher3dof.py:38-40).

        Normalized reference quirk (SURVEY §7 stance): the reference rendered
        straight after ``do_simulation`` with kinematics one substep stale
        (mjviewer drew whatever xpos mj_step left behind). Here derived
        quantities are refreshed first so frames show the true current qpos —
        and so the python and native-batched renderers are bit-identical.
        """
        mujoco.mj_forward(self.model, self.data)
        renderer = self._get_renderer()
        # mujoco.Renderer makes its EGL context current only at creation;
        # the native batched renderer (sim/native/mjbatch.cpp) binds ITS
        # context on the same thread, after which an un-rebound python
        # renderer dies inside mjr ("Default framebuffer is not complete",
        # mju_error -> exit(1)). Re-bind before every render.
        ctx = getattr(renderer, "_gl_context", None)
        if ctx is not None:
            ctx.make_current()
        cam = mujoco.MjvCamera()
        lookat, dist, elev, az = self.camera_pose(vp)
        cam.lookat[:] = lookat
        cam.distance = dist
        cam.elevation = elev
        cam.azimuth = az
        cam.type = mujoco.mjtCamera.mjCAMERA_FREE
        renderer.update_scene(self.data, camera=cam)
        if self._fast_render:
            renderer.scene.flags[mujoco.mjtRndFlag.mjRND_SHADOW] = 0
            renderer.scene.flags[mujoco.mjtRndFlag.mjRND_REFLECTION] = 0
        img = renderer.render()
        # black-frame retry (reference mujoco_env.py:117-122)
        retries = 0
        while img.max() == 0 and retries < 10:
            renderer.update_scene(self.data, camera=cam)
            img = renderer.render()
            retries += 1
        if size is not None:
            img = imresize_uint8(img, size)
        return img

    def _maybe_render_frames(self) -> np.ndarray | None:
        """Odd-step multi-viewpoint frames (reference renders at itr%2==1)."""
        if not self.config.render_frames or self.itr % 2 != 1:
            return None
        nvp = max(1, self.config.n_viewpoints)
        return np.stack([self.render(vp, self.config.image_size) for vp in range(nvp)])

    def close(self) -> None:
        if self._renderer is not None:
            self._renderer.close()
            self._renderer = None

    # -- subclass hooks ----------------------------------------------------
    def _task_step(self, action: np.ndarray) -> tuple[np.ndarray, dict[str, Any]]:
        raise NotImplementedError

    def reset_model(self) -> np.ndarray:
        raise NotImplementedError

    def _get_obs(self) -> np.ndarray:
        raise NotImplementedError
