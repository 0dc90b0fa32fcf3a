"""Relay-handoff fire drill: prove a live training step yields to bench fast.

VERDICT r4 asked for evidence that the call-granular handoff
(core/relay_coord.py::hold_for_bench) actually bounds bench's wait when it
arrives mid-long-queue-step — round 4's driver bench timed out (rc=124)
without it ever being demonstrated under fire.

The drill runs the REAL fused translation trainer (the longest-running
queue-step workload) in a subprocess with drill-private sentinel paths
(RELAY_BENCH_REQUEST / RELAY_YIELDED are env-overridable exactly for this),
lets it reach steady state, then plays bench: writes the request sentinel
and times how long until the trainer parks (YIELDED appears with a live
pid). It then clears the request and verifies the trainer resumes and
finishes. Result: one JSON line with ``handoff_latency_s`` — the measured
bound bench.py's BENCH_QUEUE_IDLE_WAIT default (300 s) must comfortably
exceed.

Run on the real TPU (as a queue step or standalone):
    python tools/drill_handoff.py
Artifacts -> examples/results/handoff_drill.json.

Reference analogue: none — single-chip relay sharing is unique to this
environment (see relay_coord.py).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REQ = "/tmp/drill_bench_request"
YLD = "/tmp/drill_relay_yielded"
OUT = os.path.join(REPO, "examples", "results", "handoff_drill.json")

# The trainee: the real fused trainer at bench.py's shape, long enough
# (3000 steps ~ 15 s of steady state after compile) that the drill always
# lands mid-run. steps_per_call=50 matches production — one fused call is
# the park granularity being measured.
_TRAINEE = """
import numpy as np, sys
sys.path.insert(0, {repo!r})
from imitation_from_observation_tpu.core.config import TrainConfig, TranslationModelConfig
from imitation_from_observation_tpu.train import TranslationTrainer
rng = np.random.default_rng(0)
vdata = rng.uniform(-1, 1, (26, 40, 48, 48, 3)).astype(np.float32)
vdata = (np.rint((vdata + 1) * 127.5).astype(np.uint8).astype(np.float32) / np.float32(127.5) - 1)
cfg = TrainConfig(batch_size=100, n_iters=3000, n_train=32, eval_every=10**9,
                  save_every=10**9, log_every=10**9, steps_per_call=50)
tr = TranslationTrainer(TranslationModelConfig(model="context_skip", image_size=(48, 48)), cfg, vdata)
tr.train(50)  # compile
print("STEADY", flush=True)
tr.train(3000)
print("DONE", flush=True)
"""


def _live(path: str) -> bool:
    try:
        with open(path) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)
        return True
    except (OSError, ValueError):
        return False


def main() -> None:
    for p in (REQ, YLD):
        try:
            os.remove(p)
        except OSError:
            pass
    env = dict(os.environ, RELAY_BENCH_REQUEST=REQ, RELAY_YIELDED=YLD)
    proc = subprocess.Popen(
        [sys.executable, "-c", _TRAINEE.format(repo=REPO)],
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO,
    )
    try:
        # wait for steady state (past compile), then a beat into the run
        for line in proc.stdout:
            if line.strip() == "STEADY":
                break
        else:
            raise RuntimeError("trainee exited before steady state")
        time.sleep(2.0)

        with open(REQ, "w") as f:
            f.write(str(os.getpid()))
        t0 = time.perf_counter()
        deadline = t0 + 300.0
        while not _live(YLD):
            if time.perf_counter() > deadline:
                raise RuntimeError("trainee never yielded within 300s")
            if proc.poll() is not None:
                raise RuntimeError("trainee died while drill waited for yield")
            time.sleep(0.05)
        latency = time.perf_counter() - t0

        # bench would measure here; hold the window briefly, then release
        time.sleep(1.0)
        os.remove(REQ)
        t1 = time.perf_counter()
        while _live(YLD):
            if time.perf_counter() - t1 > 60:
                raise RuntimeError("trainee never resumed after release")
            time.sleep(0.05)
        resume = time.perf_counter() - t1

        done = any(l.strip() == "DONE" for l in proc.stdout)
        rc = proc.wait(timeout=600)
        result = {
            "handoff_latency_s": round(latency, 3),
            "resume_latency_s": round(resume, 3),
            "trainee_finished": bool(done and rc == 0),
            "bound_ok": latency < 60.0,
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        if not result["bound_ok"] or not result["trainee_finished"]:
            sys.exit(1)
    finally:
        if proc.poll() is None:
            proc.kill()
        for p in (REQ, YLD):
            try:
                os.remove(p)
            except OSError:
                pass


if __name__ == "__main__":
    main()
