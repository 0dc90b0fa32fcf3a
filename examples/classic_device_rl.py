"""TRPO on the classic-control family with fully on-device sampling.

The reference exercised its algorithm stack on the Box2D test envs
(rllab tests/test_algos.py: {TRPO,...} x {Cartpole,...}); this example runs
that family through `rl/device_rollout.py::DeviceSampler` — the whole
sampling phase (policy + dynamics + termination + auto-reset) is ONE jitted
XLA program per iteration, so a TRPO iteration is two device calls total
(sample, optimize) with no per-step host loop.

Artifacts -> examples/results/classic_device_rl/{env}/ + summary.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import RLConfig
from imitation_from_observation_tpu.rl import (
    BatchPolopt,
    DeviceSampler,
    GaussianMLPPolicy,
    LinearFeatureBaseline,
    TRPO,
)
from imitation_from_observation_tpu.rl.device_rollout import DEVICE_ENVS

LOG = os.path.join(os.path.dirname(__file__), "results", "classic_device_rl")

# (env, iterations, improvement the run must show to count as learning)
RUNS = [
    ("cartpole", 15, 100.0),          # balance: reward ~10/alive step
    ("double_pendulum", 15, 1.0),     # tip-distance shaping, never done
    ("mountain_car", 15, 0.0),        # report-only (hard exploration)
    ("cartpole_swingup", 30, 5.0),    # swing-up needs a few more iters
]

summary = {}
for name, n_iters, bar in RUNS:
    spec = DEVICE_ENVS[name]()
    pol = GaussianMLPPolicy(
        obs_dim=spec.obs_dim, action_dim=1, hidden=(32, 32), init_std=1.0, seed=0
    )
    cfg = RLConfig(
        batch_size=4000, max_path_length=100, n_iters=n_iters,
        snapshot_mode="none", seed=0,
    )
    sampler = DeviceSampler(
        name, pol, batch_size=cfg.batch_size,
        max_path_length=cfg.max_path_length, seed=0,
    )
    t0 = time.perf_counter()
    algo = BatchPolopt(
        None, pol, LinearFeatureBaseline(), TRPO(pol, step_size=0.05), cfg,
        log_dir=os.path.join(LOG, name), sampler=sampler,
    )
    history = algo.train()
    wall = time.perf_counter() - t0
    rets = [h["AverageReturn"] for h in history]
    sample_s = float(np.mean([h["SampleTime"] for h in history[1:]]))
    summary[name] = dict(
        first=rets[0], best=max(rets), last=rets[-1],
        improvement=max(rets[-3:]) - rets[0],
        learned=bool(max(rets[-3:]) - rets[0] > bar) if bar > 0 else None,
        iters=n_iters, wall_s=round(wall, 1),
        sample_time_s=round(sample_s, 4),
        steps_per_sec=round(cfg.batch_size / max(sample_s, 1e-9), 1),
    )
    print(f"[{name}] first {rets[0]:.1f} -> best {max(rets):.1f} "
          f"({wall:.0f}s total, sample {sample_s*1e3:.0f} ms/iter = "
          f"{summary[name]['steps_per_sec']:,.0f} steps/s)")

os.makedirs(LOG, exist_ok=True)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps({k: v["improvement"] for k, v in summary.items()}, indent=1))
