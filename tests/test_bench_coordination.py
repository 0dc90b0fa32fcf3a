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


# -- cooperative yield (core/relay_coord.py) ---------------------------------
# A step that runs for hours parks at a call boundary while a live bench
# holds the request file; bench treats the parked step as idle.

from imitation_from_observation_tpu.core import relay_coord


def _set_yielded(tmp_path, monkeypatch, content):
    yielded = tmp_path / "relay_yielded"
    monkeypatch.setattr(bench, "YIELDED", str(yielded))
    if content is not None:
        yielded.write_text(content)
    return yielded


def test_yielded_step_counts_as_idle(tmp_path, monkeypatch):
    p = subprocess.Popen(["sleep", "60"])
    try:
        _set_active(tmp_path, monkeypatch, str(p.pid))
        _set_yielded(tmp_path, monkeypatch, str(p.pid))
        assert bench._queue_step_running() is True
        assert bench._queue_step_yielded() is True
        # running but yielded: the relay is exclusively ours, no wait
        assert bench.wait_for_queue_idle(0.1) is True
    finally:
        p.kill()
        p.wait()


def test_stale_yield_sentinel_ignored(tmp_path, monkeypatch):
    p = subprocess.Popen(["sleep", "60"])
    try:
        _set_active(tmp_path, monkeypatch, str(p.pid))
        _set_yielded(tmp_path, monkeypatch, "999999")  # unclean death leftover
        assert bench._queue_step_yielded() is False
        assert bench.wait_for_queue_idle(0.1) is False  # genuinely contended
    finally:
        p.kill()
        p.wait()


def test_hold_for_bench_noop_without_request(tmp_path, monkeypatch):
    monkeypatch.setattr(relay_coord, "BENCH_REQUEST", str(tmp_path / "absent"))
    monkeypatch.setattr(relay_coord, "YIELDED", str(tmp_path / "relay_yielded"))
    assert relay_coord.hold_for_bench() == 0.0
    assert not os.path.exists(str(tmp_path / "relay_yielded"))


def test_hold_for_bench_ignores_stale_request(tmp_path, monkeypatch):
    req = tmp_path / "bench_request"
    req.write_text("999999")  # bench killed uncleanly: don't park forever
    monkeypatch.setattr(relay_coord, "BENCH_REQUEST", str(req))
    monkeypatch.setattr(relay_coord, "YIELDED", str(tmp_path / "relay_yielded"))
    assert relay_coord.hold_for_bench() == 0.0


def test_hold_parks_until_request_clears(tmp_path, monkeypatch):
    req = tmp_path / "bench_request"
    yielded = tmp_path / "relay_yielded"
    monkeypatch.setattr(relay_coord, "BENCH_REQUEST", str(req))
    monkeypatch.setattr(relay_coord, "YIELDED", str(yielded))
    p = subprocess.Popen(["sleep", "60"])  # stands in for a live bench
    try:
        req.write_text(str(p.pid))
        saw_yield = {}

        def release():
            # wait until the holder advertises the yield, then clear the
            # request like bench's finally-block does
            for _ in range(200):
                if yielded.exists():
                    saw_yield["pid"] = yielded.read_text()
                    break
                relay_coord.time.sleep(0.02)
            req.unlink()

        t = threading.Thread(target=release, daemon=True)
        t.start()
        waited = relay_coord.hold_for_bench(poll_s=0.05)
        t.join(timeout=10)
        assert waited > 0.0
        assert saw_yield["pid"] == str(os.getpid())
        assert not yielded.exists()  # sentinel removed on resume
    finally:
        p.kill()
        p.wait()
