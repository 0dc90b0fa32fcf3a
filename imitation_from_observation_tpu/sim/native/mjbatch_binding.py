"""ctypes binding + python facade for the C++ batched MuJoCo stepper."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmjbatch.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _ensure_built() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["sh", os.path.join(_HERE, "build_mjbatch.sh")],
                check=True,
                capture_output=True,
                text=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.mjb_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mjb_create.restype = ctypes.c_void_p
        lib.mjb_destroy.argtypes = [ctypes.c_void_p]
        lib.mjb_sizes.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 3
        lib.mjb_step.argtypes = [ctypes.c_void_p, dp, ctypes.c_int]
        lib.mjb_forward.argtypes = [ctypes.c_void_p]
        lib.mjb_get_state.argtypes = [ctypes.c_void_p, dp, dp]
        lib.mjb_set_state.argtypes = [ctypes.c_void_p, dp, dp]
        lib.mjb_reset.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mjb_subtree_com.argtypes = [ctypes.c_void_p, ctypes.c_int, dp]
        lib.mjb_last_error.restype = ctypes.c_char_p
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

    def step(self, ctrl: np.ndarray, n_substeps: int = 1) -> None:
        ctrl = np.ascontiguousarray(ctrl, np.float64)
        assert ctrl.shape == (self.n, self.nu)
        self._lib.mjb_step(self._pool, _ptr(ctrl), n_substeps)

    def get_state(self) -> tuple[np.ndarray, np.ndarray]:
        qpos = np.empty((self.n, self.nq), np.float64)
        qvel = np.empty((self.n, self.nv), np.float64)
        self._lib.mjb_get_state(self._pool, _ptr(qpos), _ptr(qvel))
        return qpos, qvel

    def set_state(self, qpos: np.ndarray, qvel: np.ndarray) -> None:
        qpos = np.ascontiguousarray(qpos, np.float64)
        qvel = np.ascontiguousarray(qvel, np.float64)
        self._lib.mjb_set_state(self._pool, _ptr(qpos), _ptr(qvel))

    def reset(self, i: int) -> None:
        self._lib.mjb_reset(self._pool, i)

    def subtree_com(self, body_id: int) -> np.ndarray:
        out = np.empty((self.n, 3), np.float64)
        self._lib.mjb_subtree_com(self._pool, body_id, _ptr(out))
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
