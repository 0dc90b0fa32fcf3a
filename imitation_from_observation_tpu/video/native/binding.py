"""ctypes binding to the native libav decoder (built lazily on first use).

Mirrors the role of the reference's ctypes-over-C pattern
(rllab/mujoco_py/mjlib.py) for the video path: python owns orchestration, the
C++ module owns the frame-decode hot loop.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from imitation_from_observation_tpu.core.native_build import build_and_load

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libvideodec.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None


def _ensure_built() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = build_and_load(
            _LIB_PATH,
            os.path.join(_HERE, "build.sh"),
            [os.path.join(_HERE, "videodec.cpp")],
        )
        lib.vd_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.vd_decode.restype = ctypes.c_int
        lib.vd_free_handle.argtypes = [ctypes.c_void_p]
        lib.vd_frame_count.argtypes = [ctypes.c_char_p]
        lib.vd_frame_count.restype = ctypes.c_int
        _lib = lib
        return lib


def decode(path: str) -> np.ndarray:
    """Decode a video to uint8 RGB frames [T, H, W, 3] via the C++ module.

    The C side hands out a pointer INTO its accumulation buffer (no duplicate
    copy); the single copy here gives numpy ownership, then the handle frees
    the C storage."""
    lib = _ensure_built()
    buf = ctypes.POINTER(ctypes.c_uint8)()
    t, h, w = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    handle = ctypes.c_void_p()
    rc = lib.vd_decode(
        path.encode(), ctypes.byref(buf), ctypes.byref(t), ctypes.byref(h),
        ctypes.byref(w), ctypes.byref(handle),
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed for {path!r} (code {rc})")
    try:
        n = t.value * h.value * w.value * 3
        arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    finally:
        lib.vd_free_handle(handle)
    return arr.reshape(t.value, h.value, w.value, 3)


def frame_count(path: str) -> int | None:
    """Container-recorded frame count; ``None`` when the container does not
    record one (decode() to count exactly). Raises on unreadable files —
    negative C error codes must not masquerade as counts."""
    lib = _ensure_built()
    n = lib.vd_frame_count(path.encode())
    if n < 0:
        raise RuntimeError(f"cannot probe {path!r} (code {n})")
    return n if n > 0 else None
