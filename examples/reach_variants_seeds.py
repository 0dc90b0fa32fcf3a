"""Reach visual-RL across context variants — the reference's nvar protocol.

The reference launchers loop ``for nvar in range(10)`` drawing a FRESH
random context per variant and run one RL experiment in each
(run_trpo_reach.py:102-104); the paper's curves aggregate mean±std across
them (plots.ipynb). This runs the reference's full nvar=10 — ten fresh context draws
(seeds 10..19) of the visual-RL leg against the ALREADY-trained
reach_full_recipe model + demos, 100 iterations each (affordable at the
~1.5 s/iteration reached in round 3) — reporting mean±std across draws
exactly as the paper's curves aggregate.

Artifacts -> examples/results/reach_variants/v{seed}/ + summary.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_visual_trpo,
    sample_rl_context,
)
from imitation_from_observation_tpu.exp.report import done_rows

BASE = os.path.join(os.path.dirname(__file__), "results", "reach_full_recipe")
LOG = os.path.join(os.path.dirname(__file__), "results", "reach_variants")
N_TRAIN = 1600
RL_ITERS = 100
SEEDS = list(range(10, 20))

ckpt_dir = os.path.join(BASE, "translation", "checkpoints", "100000")
ckpt = [f[:-4] for f in os.listdir(ckpt_dir) if f.endswith(".npz")][0]
vdata = np.load(os.path.join(BASE, "translation", "vdata.npy"), mmap_mode="r")
demo_data = np.asarray(vdata[:, N_TRAIN:], np.float32)

base_cfg = preset("reach")
summary = {}
for seed in SEEDS:
    ctx = sample_rl_context("reach", seed=seed)
    cfg = base_cfg.replace(
        name=f"reach_v{seed}",
        log_dir=os.path.join(LOG, f"v{seed}"),
        env=base_cfg.env.replace(horizon=50, frame_backend="tpu", **ctx),
        rl=base_cfg.rl.replace(
            batch_size=12500, max_path_length=50, n_envs=250, n_iters=RL_ITERS,
            init_std=10.0, snapshot_mode="none", seed=seed,
        ),
        reward=base_cfg.reward.replace(
            mode="ours", scale=1.0, model_checkpoint=os.path.join(ckpt_dir, ckpt)
        ),
    )
    hist = done_rows(cfg.log_dir, RL_ITERS)  # resume past completed legs
    if hist is None:
        os.makedirs(cfg.log_dir, exist_ok=True)
        with open(os.path.join(cfg.log_dir, "variant.json"), "w") as f:
            json.dump({"variant": seed, "mode": "ours"}, f)
        _, hist = run_visual_trpo(cfg, demo_data=demo_data)
    rt = [h["ReturnTrue"] for h in hist]
    sr = [h["SuccessRate"] for h in hist]
    summary[f"v{seed}"] = dict(
        best=max(rt), best_iter=int(np.argmax(rt)), last10=float(np.mean(rt[-10:])),
        max_success=max(sr),
    )
    print(f"[v{seed}] best {max(rt):.4f} last10 {np.mean(rt[-10:]):.4f} "
          f"maxSuccess {max(sr):.2f}")

bests = [summary[f"v{s}"]["best"] for s in SEEDS]
succ = [summary[f"v{s}"]["max_success"] for s in SEEDS]
summary["aggregate"] = dict(
    best_mean=float(np.mean(bests)), best_std=float(np.std(bests)),
    success_mean=float(np.mean(succ)), success_std=float(np.std(succ)),
)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary["aggregate"], indent=1))
