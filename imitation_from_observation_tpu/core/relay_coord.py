"""Cooperative TPU-relay handoff between long-running steps and bench.py.

Two processes sharing the axon relay serialize and corrupt each other's
timings (CLAUDE.md), so bench.py and the experiment queue coordinate via
sentinel files. The original protocol was step-granular: the queue runner
holds BEFORE launching a step while ``/tmp/bench_request`` exists, and
bench waits for ``/tmp/queue_step_active`` to clear. That breaks down when
a single step runs for hours (the 100k-step inception translation is ~2h):
bench would wait out its whole window and then measure contended.

This module makes the handoff call-granular. Long device loops call
:func:`hold_for_bench` once per host-side iteration (a fused 50-step scan
call, an RL iteration, a featurize batch — each seconds long, so the poll
cost is nil). When a LIVE bench holds ``/tmp/bench_request``, the loop
parks: it advertises ``/tmp/relay_yielded`` (its pid) and sleeps until the
request clears, giving bench an uncontended relay window mid-step. bench's
idle-wait treats a live yield sentinel as "queue idle" (bench.py
``wait_for_queue_idle``).

Liveness mirrors the stale-pid rule used everywhere else (run_queue.sh,
bench.py ``_queue_step_running``): a sentinel whose recorded pid is gone is
garbage from an unclean death and is ignored/removed.

Reference analogue: none — the reference ran one experiment per machine
(rllab/misc/instrument.py); single-chip relay sharing is unique to this
environment. Paths are env-overridable for tests (RELAY_BENCH_REQUEST,
RELAY_YIELDED).
"""

from __future__ import annotations

import os
import time

BENCH_REQUEST = os.environ.get("RELAY_BENCH_REQUEST", "/tmp/bench_request")
YIELDED = os.environ.get("RELAY_YIELDED", "/tmp/relay_yielded")


def _live_pid_file(path: str) -> bool:
    """True iff ``path`` exists and records a pid that is still alive."""
    try:
        with open(path) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False
    try:
        os.kill(pid, 0)
    except (ProcessLookupError, PermissionError):
        return False
    except OSError:
        return False
    return True


def bench_requested() -> bool:
    """Is a live bench currently requesting the relay?"""
    return _live_pid_file(BENCH_REQUEST)


def queue_yielded() -> bool:
    """Has a live queue step parked itself to hand bench the relay?"""
    return _live_pid_file(YIELDED)


def hold_for_bench(poll_s: float = 5.0) -> float:
    """Park while a live bench holds the relay; return seconds waited.

    Call once per host-side loop iteration in any long-running device loop.
    No-op (one ``os.path.exists`` miss) when no bench is waiting. While
    parked, advertises ``YIELDED`` with this pid so bench can start; the
    sentinel is removed on resume. Timing loops should subtract the returned
    wait from their wall-clock measurements.
    """
    if not os.path.exists(BENCH_REQUEST) or not bench_requested():
        return 0.0
    t0 = time.perf_counter()
    try:
        with open(YIELDED, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    try:
        while bench_requested():
            time.sleep(poll_s)
    finally:
        try:
            os.remove(YIELDED)
        except OSError:
            pass
    return time.perf_counter() - t0
