"""ctypes binding + python facade for the C++ batched MuJoCo stepper."""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from imitation_from_observation_tpu.core.native_build import build_and_load

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmjbatch.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _ensure_built() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = build_and_load(
            _LIB_PATH,
            os.path.join(_HERE, "build_mjbatch.sh"),
            [os.path.join(_HERE, "mjbatch.cpp")],
        )
        dp = ctypes.POINTER(ctypes.c_double)
        lib.mjb_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mjb_create.restype = ctypes.c_void_p
        lib.mjb_destroy.argtypes = [ctypes.c_void_p]
        lib.mjb_sizes.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 3
        lib.mjb_step.argtypes = [ctypes.c_void_p, dp, ctypes.c_int]
        lib.mjb_get_state.argtypes = [ctypes.c_void_p, dp, dp]
        lib.mjb_set_state.argtypes = [ctypes.c_void_p, dp, dp]
        lib.mjb_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mjb_subtree_com.argtypes = [ctypes.c_void_p, ctypes.c_int, dp]
        lib.mjb_last_error.restype = ctypes.c_char_p
        fp = ctypes.POINTER(ctypes.c_float)
        ubp = ctypes.POINTER(ctypes.c_ubyte)
        lib.mjb_step_fwd.argtypes = [ctypes.c_void_p, dp, ctypes.c_int, ctypes.c_int]
        lib.mjb_site_xpos.argtypes = [ctypes.c_void_p, ctypes.c_int, dp]
        lib.mjb_geom_state.argtypes = [ctypes.c_void_p, dp, dp]
        lib.mjb_set_state_one.argtypes = [ctypes.c_void_p, ctypes.c_int, dp, dp]
        lib.mjb_ngeom.argtypes = [ctypes.c_void_p]
        lib.mjb_ngeom.restype = ctypes.c_int
        lib.mjb_sync_geoms.argtypes = [ctypes.c_void_p, ctypes.c_int, fp, dp]
        lib.mjb_render_setup.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 3
        lib.mjb_render_setup.restype = ctypes.c_int
        lib.mjb_render.argtypes = [ctypes.c_void_p, dp, ctypes.c_int, ubp]
        lib.mjb_render.restype = ctypes.c_int
        _lib = lib
        return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class NativeBatchSim:
    """N MuJoCo sims from one MJCF, stepped in one GIL-free C call.

    The batched analogue of the reference's per-env ``mj_step`` hop
    (gym/envs/mujoco/mujoco_env.py:104-107 via rllab/mujoco_py).
    """

    def __init__(self, xml_path: str, n: int):
        self._lib = _ensure_built()
        self._pool = self._lib.mjb_create(xml_path.encode(), n)
        if not self._pool:
            raise RuntimeError(f"mjb_create failed: {self._lib.mjb_last_error().decode()}")
        self.n = n
        nq, nv, nu = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        self._lib.mjb_sizes(self._pool, ctypes.byref(nq), ctypes.byref(nv), ctypes.byref(nu))
        self.nq, self.nv, self.nu = nq.value, nv.value, nu.value

    def step(self, ctrl: np.ndarray, n_substeps: int = 1, forward: bool = False) -> None:
        """Step all sims; ``forward=True`` refreshes derived quantities after
        integrating (matching the python path's pre-render mj_forward)."""
        ctrl = np.ascontiguousarray(ctrl, np.float64)
        assert ctrl.shape == (self.n, self.nu)
        if forward:
            self._lib.mjb_step_fwd(self._pool, _ptr(ctrl), n_substeps, 1)
        else:
            self._lib.mjb_step(self._pool, _ptr(ctrl), n_substeps)

    def site_xpos(self, site_id: int) -> np.ndarray:
        assert site_id >= 0, f"invalid site id {site_id} (unknown name? mj_name2id returns -1)"
        out = np.empty((self.n, 3), np.float64)
        self._lib.mjb_site_xpos(self._pool, site_id, _ptr(out))
        return out

    def geom_state(self) -> tuple[np.ndarray, np.ndarray]:
        """World geom poses for every sim: ([n, ngeom, 3], [n, ngeom, 3, 3])."""
        ng = self.ngeom
        xpos = np.empty((self.n, ng, 3), np.float64)
        xmat = np.empty((self.n, ng, 9), np.float64)
        self._lib.mjb_geom_state(self._pool, _ptr(xpos), _ptr(xmat))
        return xpos, xmat.reshape(self.n, ng, 3, 3)

    def get_state(self) -> tuple[np.ndarray, np.ndarray]:
        qpos = np.empty((self.n, self.nq), np.float64)
        qvel = np.empty((self.n, self.nv), np.float64)
        self._lib.mjb_get_state(self._pool, _ptr(qpos), _ptr(qvel))
        return qpos, qvel

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray) -> None:
        qpos = np.ascontiguousarray(qpos, np.float64)
        qvel = np.ascontiguousarray(qvel, np.float64)
        assert qpos.shape == (self.n, self.nq), (qpos.shape, (self.n, self.nq))
        assert qvel.shape == (self.n, self.nv), (qvel.shape, (self.n, self.nv))
        self._lib.mjb_set_state(self._pool, _ptr(qpos), _ptr(qvel))

    def reset(self, i: int) -> None:
        self._lib.mjb_reset(self._pool, i)

    def subtree_com(self, body_id: int) -> np.ndarray:
        assert body_id >= 0, f"invalid body id {body_id} (unknown name? mj_name2id returns -1)"
        out = np.empty((self.n, 3), np.float64)
        self._lib.mjb_subtree_com(self._pool, body_id, _ptr(out))
        return out

    def set_state_one(self, i: int, qpos: np.ndarray, qvel: np.ndarray) -> None:
        qpos = np.ascontiguousarray(qpos, np.float64)
        qvel = np.ascontiguousarray(qvel, np.float64)
        assert qpos.shape == (self.nq,), (qpos.shape, self.nq)
        assert qvel.shape == (self.nv,), (qvel.shape, self.nv)
        self._lib.mjb_set_state_one(self._pool, i, _ptr(qpos), _ptr(qvel))

    @property
    def ngeom(self) -> int:
        return self._lib.mjb_ngeom(self._pool)

    def sync_geoms(self, i: int, rgba: np.ndarray | None, pos: np.ndarray | None) -> None:
        """Push per-env randomized geom colors/positions into sim slot i."""
        rp = pp = None
        if rgba is not None:
            rgba = np.ascontiguousarray(rgba, np.float32)
            assert rgba.shape == (self.ngeom, 4)
            rp = rgba.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if pos is not None:
            pos = np.ascontiguousarray(pos, np.float64)
            assert pos.shape == (self.ngeom, 3)
            pp = _ptr(pos)
        self._lib.mjb_sync_geoms(self._pool, i, rp, pp)

    def render_setup(self, width: int, height: int, fast: bool = True) -> None:
        """Create the shared EGL + mjr context for this pool (idempotent).

        The C side keeps the first framebuffer size (mjb_render_setup
        early-returns once ready), so a repeat call with a DIFFERENT size
        must fail loudly — silently updating ``_render_hw`` would make
        ``render()`` allocate an output smaller than the C side writes.
        """
        if getattr(self, "_render_hw", None) is not None:
            if self._render_hw != (height, width):
                raise ValueError(
                    f"render_setup already done at {self._render_hw}; "
                    f"cannot resize to {(height, width)} — create a new pool"
                )
            return
        rc = self._lib.mjb_render_setup(self._pool, width, height, int(fast))
        if rc != 0:
            raise RuntimeError(f"mjb_render_setup: {self._lib.mjb_last_error().decode()}")
        self._render_hw = (height, width)

    def render(self, cams: np.ndarray) -> np.ndarray:
        """Render every sim at every viewpoint in ONE GIL-free C call.

        cams: [n, nvp, 6] float64 rows (lookat xyz, distance, elevation,
        azimuth). Returns uint8 [n, nvp, H, W, 3] (top-down RGB).
        """
        cams = np.ascontiguousarray(cams, np.float64)
        assert cams.ndim == 3 and cams.shape[0] == self.n and cams.shape[2] == 6
        nvp = cams.shape[1]
        if getattr(self, "_render_hw", None) is None:
            raise RuntimeError("render() before render_setup()")
        h, w = self._render_hw
        out = np.empty((self.n, nvp, h, w, 3), np.uint8)
        rc = self._lib.mjb_render(
            self._pool, _ptr(cams), nvp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        )
        if rc != 0:
            raise RuntimeError(f"mjb_render: {self._lib.mjb_last_error().decode()}")
        return out

    def close(self) -> None:
        if self._pool:
            self._lib.mjb_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
