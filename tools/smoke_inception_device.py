"""Pre-flight smoke for the device-resident oursinception path (round 5).

Runs config 4 end-to-end at throwaway scale — 60 reused demo videos, 500
translation steps, 2 TRPO iterations at batch 2,500 — exercising exactly the
new code the at-scale selfsup run depends on: raycast 299x299 device frames,
on-device backbone featurize (feature_fn.chunk_fn), encoder-subtree baking,
pinned RL context + fingerprint handshake. ~10 minutes on the chip; run as a
queue step BEFORE the multi-hour selfsup stage so a plumbing regression
costs minutes, not the stage.

Asserts the RL leg produced finite decomposition terms and spliced rewards.
Artifacts -> examples/results/_smoke_inception_dev (gitignored, throwaway).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.exp.inception_pipeline import run_strike_inception

REPO = os.path.join(os.path.dirname(__file__), "..")
BASE = os.path.join(REPO, "examples", "results", "strike_inception_demo")
LOG = os.path.join(REPO, "examples", "results", "_smoke_inception_dev")
EXPERT = os.path.join(REPO, "data", "reference_experts", "expert_striker")

summary = run_strike_inception(
    LOG,
    EXPERT,
    n_demos=60,
    video_dir=os.path.join(BASE, "videos"),
    frames_cache=os.path.join(BASE, "frames_u8.npy"),
    rl_iters=2,
    rl_batch_size=2500,
    rl_n_envs=50,
    translation_iters=500,
    backbone_tag="randominit_smoke",
    notes_caveat="\nTHROWAWAY device-path smoke — see tools/smoke_inception_device.py.\n",
)
assert np.isfinite(summary["best"]), summary
import csv

rows = list(csv.DictReader(open(os.path.join(LOG, "rl", "progress.csv"))))
assert rows and "RewardFeatTerm" in rows[0], list(rows[0]) if rows else "no rows"
assert all(np.isfinite(float(r["RewardFeatTerm"])) for r in rows)
# the RL leg must be running the device-frame path end-to-end: 2 iterations
# at batch 2500 through the host path took ~200 s in round 4 — a smoke that
# suddenly crawls means the frames fell back to host shipping
print("SMOKE OK", {k: summary[k] for k in ("first", "best", "timings")})
