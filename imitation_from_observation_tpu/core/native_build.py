"""Shared lazy builder for the native C++ modules.

Both ctypes bindings (sim/native/mjbatch_binding.py, video/native/binding.py)
build their .so on first use with g++. This helper holds the once-fragile
logic in one place:

- **staleness**: rebuild when the library is missing OR older than any of its
  sources/build script (an edited .cpp must not keep serving a stale .so);
- **cross-process safety**: the build runs under an ``fcntl.flock`` on a
  sidecar lockfile, so two processes importing concurrently (parallel test
  workers, subprocess vec envs) cannot interleave g++ writes to the same
  output path or dlopen a half-written ELF;
- **crash recovery**: if a previous builder died mid-write and left a
  corrupt artifact that still looks fresh, the failed ``CDLL`` triggers one
  rebuild instead of propagating an opaque loader error;
- **live-mapping safety**: the compiler writes to a unique temp name that is
  ``os.replace``d over the target (the build scripts honor ``OUT``), so a
  rebuild never scribbles over an inode another process has mapped. Note
  dlopen semantics still apply WITHIN a process: once loaded, a library is
  cached by path — a same-process rebuild returns the old code;
- **error surfacing**: g++ stderr lands in the raised RuntimeError (a bare
  CalledProcessError from check=True hides it).
"""

from __future__ import annotations

import ctypes
import fcntl
import os
import subprocess


def _stale(lib_path: str, deps: list[str]) -> bool:
    if not os.path.exists(lib_path):
        return True
    lib_mtime = os.path.getmtime(lib_path)
    return any(os.path.getmtime(d) > lib_mtime for d in deps if os.path.exists(d))


def _run_build(script: str, lib_path: str) -> None:
    # build to a unique temp name, then rename over the target: overwriting
    # the fixed path in place would corrupt the old inode's LIVE mappings in
    # any process that already dlopen'd it (observed as a bus error); rename
    # unlinks the old inode instead, leaving existing mappings intact
    tmp = f"{lib_path}.build.{os.getpid()}"
    env = dict(os.environ, OUT=tmp)
    proc = subprocess.run(["sh", script], capture_output=True, text=True, env=env)
    if proc.returncode != 0:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise RuntimeError(
            f"native build failed ({script}):\n{proc.stderr.strip() or proc.stdout.strip()}"
        )
    os.replace(tmp, lib_path)


def build_and_load(lib_path: str, build_script: str, sources: list[str]) -> ctypes.CDLL:
    """Build ``lib_path`` via ``build_script`` if missing/stale, then CDLL it.

    ``sources``: files whose mtime invalidates the artifact (the .cpp files;
    the build script itself is always included).
    """
    deps = list(sources) + [build_script]
    lock_path = lib_path + ".lock"
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if _stale(lib_path, deps):
            _run_build(build_script, lib_path)
            return ctypes.CDLL(lib_path)
        try:
            return ctypes.CDLL(lib_path)
        except OSError:
            # fresh-looking but unloadable (builder crashed mid-write):
            # rebuild once under the lock
            _run_build(build_script, lib_path)
            return ctypes.CDLL(lib_path)
