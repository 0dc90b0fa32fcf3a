"""Vectorized env with native batched frame rendering.

``NativeFrameVecEnv`` keeps the python task objects for all env *logic*
(reset distributions, randomized colors/distractors, obs/reward semantics —
everything parity-tested in sim/tasks.py) but routes the hot loop the
reference ran through a per-env GLFW/FBO viewer
(rllab/mujoco_py/mjviewer.py:46-120, gym/envs/mujoco/mujoco_env.py:116-122)
through ONE GIL-free C call per vec-step: the mjbatch pool's shared-EGL
offscreen renderer (sim/native/mjbatch.cpp), which renders every env at
every viewpoint back-to-back into one uint8 batch — no per-env python
Renderer objects, no per-frame GL context churn, one readPixels flip per
frame done natively.

Per-env state flows python -> pool right before each render
(``set_state_one`` = memcpy + mj_forward, ~20 us/env); randomized geom
colors/positions sync on every reset. Frames land under
``info["frames"]`` with the same [nvp, H, W, 3] uint8 contract as the
python path (sim/base.py::_maybe_render_frames) — the native and python
renderers are bit-identical (tests/test_sim.py native-render parity).

Falls back to the plain per-env python renderer if the native library or a
GL device display is unavailable (``native_ok()``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Sequence

import numpy as np

from imitation_from_observation_tpu.sim.vec_env import VecEnv
from imitation_from_observation_tpu.video.preprocess import imresize_uint8


def _unwrap(env):
    """Peel wrappers (NormalizedEnv etc.) down to the MujocoTask."""
    while hasattr(env, "env"):
        env = env.env
    return env


_NATIVE_OK: bool | None = None


def native_render_available() -> bool:
    """True if the native pool + an EGL device display can be created.

    Cached per process: the probe allocates and frees a GL render context,
    and llvmpipe tolerates only a bounded number of create/destroy cycles
    before a later ``mjr_makeContext`` segfaults — probing once instead of
    once per ``make_vec_env`` keeps long test/pipeline processes stable.
    """
    global _NATIVE_OK
    if _NATIVE_OK is None:
        try:
            from imitation_from_observation_tpu.sim.base import _ASSET_DIR
            from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim

            pool = NativeBatchSim(os.path.join(_ASSET_DIR, "reacher3dof.xml"), 1)
            pool.render_setup(16, 16, fast=True)
            pool.close()
            _NATIVE_OK = True
        except Exception:
            _NATIVE_OK = False
    return _NATIVE_OK


class NativeFrameVecEnv(VecEnv):
    """VecEnv whose odd-step frames come from the native batched renderer."""

    def __init__(self, env_fns: Sequence[Callable[[], Any]], max_path_length: int | None = None):
        super().__init__(env_fns, max_path_length)
        from imitation_from_observation_tpu.sim.base import _ASSET_DIR
        from imitation_from_observation_tpu.sim.native.mjbatch_binding import NativeBatchSim

        tasks = [_unwrap(e) for e in self.envs]
        cfg = tasks[0].config
        self._tasks = tasks
        self._want_frames = bool(cfg.render_frames)
        # the python envs must not render themselves — the pool does
        for t in tasks:
            t.config = dataclasses.replace(t.config, render_frames=False)
        self._image_size = tuple(cfg.image_size)
        self._nvp = max(1, cfg.n_viewpoints)
        xml = os.path.join(_ASSET_DIR, tasks[0].ASSET)
        self.pool = NativeBatchSim(xml, self.n_envs)
        h, w = cfg.render_size
        self.pool.render_setup(w, h, fast=(cfg.render_quality == "fast"))

    # -- pool sync ----------------------------------------------------------
    def _sync_geoms(self, i: int) -> None:
        t = self._tasks[i]
        self.pool.sync_geoms(i, t.model.geom_rgba, t.model.geom_pos)

    def _render_all(self) -> np.ndarray:
        """One native call: set states, render all envs x viewpoints, resize."""
        for i, t in enumerate(self._tasks):
            self.pool.set_state_one(i, t.data.qpos, t.data.qvel)
        cams = np.empty((self.n_envs, self._nvp, 6), np.float64)
        for i, t in enumerate(self._tasks):
            for v in range(self._nvp):
                lookat, dist, elev, az = t.camera_pose(v)
                cams[i, v, :3] = lookat
                cams[i, v, 3:] = (dist, elev, az)
        raw = self.pool.render(cams)  # [n, nvp, H, W, 3]
        if raw.shape[2:4] == self._image_size:
            return raw
        n, nvp = raw.shape[:2]
        h, w = self._image_size
        out = np.empty((n, nvp, h, w, 3), np.uint8)
        for i in range(n):
            for v in range(nvp):
                out[i, v] = imresize_uint8(raw[i, v], self._image_size)
        return out

    # -- VecEnv api ---------------------------------------------------------
    def reset(self) -> np.ndarray:
        obs = super().reset()
        for i in range(self.n_envs):
            self._sync_geoms(i)
        return obs

    def step(self, actions: np.ndarray):
        # frame parity BEFORE stepping: the python base renders when the
        # pre-increment itr is odd (sim/base.py::_maybe_render_frames)
        needs = [self._want_frames and t.itr % 2 == 1 for t in self._tasks]
        obs, rewards, dones, infos = [], [], [], []
        for i, (env, a) in enumerate(zip(self.envs, actions)):
            o, r, d, info = env.step(a)
            self._steps[i] += 1
            if self.max_path_length is not None and self._steps[i] >= self.max_path_length:
                d = True
            obs.append(o)
            rewards.append(r)
            dones.append(d)
            infos.append(info)
        if any(needs):
            frames = self._render_all()
            for i, need in enumerate(needs):
                if need:
                    infos[i]["frames"] = frames[i]
        # resets AFTER rendering: frames must show the pre-reset state
        for i, d in enumerate(dones):
            if d:
                obs[i] = self.envs[i].reset()
                self._steps[i] = 0
                self._sync_geoms(i)
        return np.stack(obs), np.asarray(rewards, np.float64), np.asarray(dones), infos

    def close(self) -> None:
        super().close()
        self.pool.close()


def make_vec_env(
    env_fns: Sequence[Callable[[], Any]],
    max_path_length: int | None = None,
    render_frames: bool = False,
    backend: str = "auto",
) -> VecEnv:
    """Default VecEnv factory: native batched rendering when frames are
    wanted and the native renderer works on this host, else the plain
    per-env python path.

    backend: "auto" | "native" | "python".
    """
    if render_frames and backend in ("auto", "native"):
        if backend == "native" or native_render_available():
            return NativeFrameVecEnv(env_fns, max_path_length)
    return VecEnv(env_fns, max_path_length)
