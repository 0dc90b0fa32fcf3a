"""core.native_build: staleness-triggered rebuild, corrupt-artifact recovery,
live-mapping safety, and g++ stderr surfacing.

Loads run in SUBPROCESSES where reload semantics matter: dlopen caches a
library by path within a process, so an in-process rebuild intentionally
keeps serving the old code (documented in the module)."""

import os
import subprocess
import sys
import textwrap
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest

from imitation_from_observation_tpu.core.native_build import build_and_load

_REPO = os.path.join(os.path.dirname(__file__), "..")


def _write_project(tmp_path, retval: int):
    src = tmp_path / "mini.cpp"
    src.write_text(f'extern "C" int mini_answer() {{ return {retval}; }}\n')
    script = tmp_path / "build.sh"
    script.write_text(
        textwrap.dedent(
            """\
            #!/bin/sh
            set -e
            cd "$(dirname "$0")"
            g++ -O0 -fPIC -shared -o "${OUT:-libmini.so}" mini.cpp
            """
        )
    )
    return str(tmp_path / "libmini.so"), str(script), [str(src)]


def _load_in_subprocess(lib_path, script, sources) -> int:
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from imitation_from_observation_tpu.core.native_build import build_and_load\n"
        "lib = build_and_load({lib!r}, {script!r}, {sources!r})\n"
        "print(lib.mini_answer())\n"
    ).format(repo=_REPO, lib=lib_path, script=script, sources=sources)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    return int(out.stdout.strip())


def test_builds_and_rebuilds_on_source_change(tmp_path):
    lib_path, script, sources = _write_project(tmp_path, 7)
    assert _load_in_subprocess(lib_path, script, sources) == 7
    # edit the source: a FRESH process must get the rebuilt artifact
    time.sleep(0.05)
    _write_project(tmp_path, 42)
    os.utime(sources[0])  # ensure mtime advances even on coarse filesystems
    assert _load_in_subprocess(lib_path, script, sources) == 42


def test_rebuild_does_not_corrupt_live_mapping(tmp_path):
    """The rebuild renames a temp file over the target, so a process that
    already mapped the old inode keeps running (an in-place overwrite would
    bus-error it)."""
    lib_path, script, sources = _write_project(tmp_path, 7)
    lib = build_and_load(lib_path, script, sources)  # mapped in THIS process
    assert lib.mini_answer() == 7
    time.sleep(0.05)
    _write_project(tmp_path, 42)
    os.utime(sources[0])
    assert _load_in_subprocess(lib_path, script, sources) == 42  # rebuild happened
    assert lib.mini_answer() == 7  # old mapping intact, old code still runs


def test_recovers_from_corrupt_artifact(tmp_path):
    lib_path, script, sources = _write_project(tmp_path, 5)
    _load_in_subprocess(lib_path, script, sources)
    # simulate a builder that died mid-write: fresh-looking but unloadable
    with open(lib_path, "w") as f:
        f.write("not an ELF")
    os.utime(lib_path)
    assert _load_in_subprocess(lib_path, script, sources) == 5


def test_build_failure_surfaces_stderr(tmp_path):
    lib_path, script, sources = _write_project(tmp_path, 1)
    with open(sources[0], "w") as f:
        f.write("this is not C++")
    with pytest.raises(RuntimeError, match="error"):
        build_and_load(lib_path, script, sources)
