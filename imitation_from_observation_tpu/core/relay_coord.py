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
garbage from an unclean death — :func:`_live_pid_file` deletes it on sight
(same as run_queue.sh's ``rm -f``) so it cannot linger until the next park.

Parking is only honest if the relay is actually quiet: trainers dispatch
fused jit calls asynchronously and only sync on metrics at log/eval
crossings, so multi-second queued executions can still be draining when the
loop reaches the park point. Callers therefore pass ``drain`` — a callback
that fetches one scalar from the last dispatched result (the only reliable
sync on the axon relay; ``block_until_ready`` is not, see CLAUDE.md) —
which runs before the YIELDED sentinel is written.

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
    """True iff ``path`` exists and records a pid that is still alive.

    A file recording a confirmed-dead pid is debris from an unclean death;
    it is deleted here (idempotent — a racing unlink is fine) so stale
    sentinels cannot outlive their owners.
    """
    try:
        with open(path) as f:
            pid = int(f.read().strip())
    except OSError:
        return False
    except ValueError:
        _remove_quiet(path)  # unparseable: never a live owner
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        _remove_quiet(path)
        return False
    except OSError:  # PermissionError: alive but foreign — leave it
        return False
    return True


def _remove_quiet(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass


def bench_requested() -> bool:
    """Is a live bench currently requesting the relay?"""
    return _live_pid_file(BENCH_REQUEST)


def queue_yielded() -> bool:
    """Has a live queue step parked itself to hand bench the relay?"""
    return _live_pid_file(YIELDED)


def hold_for_bench(poll_s: float = 5.0, drain=None) -> float:
    """Park while a live bench holds the relay; return seconds waited.

    Call once per host-side loop iteration in any long-running device loop.
    No-op (one ``os.path.exists`` miss) when no bench is waiting. While
    parked, advertises ``YIELDED`` with this pid so bench can start; the
    sentinel is removed on resume. Timing loops should subtract the returned
    wait from their wall-clock measurements.

    ``drain``: callback that synchronizes any async device work this loop
    dispatched (fetch one scalar from the last result — see module
    docstring). It runs BEFORE the YIELDED sentinel is written, so bench
    never measures against a relay still executing our queued calls. Only
    invoked when actually parking, so it costs nothing in the common path.
    """
    if not os.path.exists(BENCH_REQUEST) or not bench_requested():
        return 0.0
    t0 = time.perf_counter()
    if drain is not None:
        try:
            drain()
        except Exception:
            pass  # a failed drain must not take the training loop down
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
