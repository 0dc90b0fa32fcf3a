"""bench.py <-> tools/run_queue.sh relay-sharing coordination.

Two processes sharing the axon relay serialize and corrupt each other's
timings (CLAUDE.md), so the queue runner marks a running step's pid in
``bench.QUEUE_ACTIVE`` and bench waits for it; stale pids (a runner killed
mid-step) must not deadlock the driver's round-end bench run.
"""

import os
import subprocess
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def _set_active(tmp_path, monkeypatch, content):
    active = tmp_path / "queue_step_active"
    monkeypatch.setattr(bench, "QUEUE_ACTIVE", str(active))
    if content is not None:
        active.write_text(content)
    return active


def test_absent_file_means_idle(tmp_path, monkeypatch):
    _set_active(tmp_path, monkeypatch, None)
    assert bench._queue_step_running() is False
    assert bench.wait_for_queue_idle(0.1) is True


def test_stale_pid_means_idle(tmp_path, monkeypatch):
    _set_active(tmp_path, monkeypatch, "999999")
    assert bench._queue_step_running() is False


def test_garbage_content_means_idle(tmp_path, monkeypatch):
    _set_active(tmp_path, monkeypatch, "nonsense")
    assert bench._queue_step_running() is False


def test_live_pid_means_running_and_timeout(tmp_path, monkeypatch):
    p = subprocess.Popen(["sleep", "60"])
    try:
        _set_active(tmp_path, monkeypatch, str(p.pid))
        assert bench._queue_step_running() is True
        # a budget shorter than the step: proceed contended rather than hang
        assert bench.wait_for_queue_idle(0.1) is False
    finally:
        p.kill()
        p.wait()


def test_wait_returns_after_step_ends(tmp_path, monkeypatch):
    p = subprocess.Popen(["sleep", "2"])
    threading.Thread(target=p.wait, daemon=True).start()  # reap like the shell
    active = _set_active(tmp_path, monkeypatch, str(p.pid))
    # the runner removes the file when the step ends; emulate that
    def cleanup():
        p.wait()
        active.unlink()

    threading.Thread(target=cleanup, daemon=True).start()
    real_sleep = bench.time.sleep  # bench.time IS the time module; keep a ref
    monkeypatch.setattr(bench.time, "sleep", lambda s: real_sleep(0.2))
    assert bench.wait_for_queue_idle(30) is True
