"""Push at the reference's FULL data budget (4,000 demo videos).

`push_full_recipe/` ran 2,000 demos (the reach family's saturation point)
and plateaued at best -0.607 vs oracle -0.126; its NOTES listed data scale
among the protocol-faithful follow-ups. The reference's translation
training used 4,000 videos for this model family
(run_train_strike.py:37-39; run_train_throw.py:24 used 7,000) — this leg
doubles the demo set to the reference's own number and reruns translation
(100k steps) + visual TRPO in the IDENTICAL seed-1 fixed context, so the
only changed variable is data. Oracle control: `push_full_recipe/oracle_rl/`
(same context/budget; not rerun).

Artifacts -> examples/results/push_4k/ + summary.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_pipeline,
    sample_rl_context,
)

LOG = os.path.join(os.path.dirname(__file__), "results", "push_4k")
EXPERT = os.path.join(
    os.path.dirname(__file__), "..", "data", "reference_experts", "expert_push"
)

rl_context = sample_rl_context("push", seed=1)  # identical to push_full_recipe
cfg = preset("push")
cfg = cfg.replace(
    name="push_4k",
    log_dir=LOG,
    env=cfg.env.replace(horizon=50, frame_backend="tpu"),
    train=cfg.train.replace(
        batch_size=100, steps_per_call=50, eval_every=5000,
        save_every=25000, log_every=5000, learning_rate=1e-4,
    ),
    rl=cfg.rl.replace(
        batch_size=12500, max_path_length=50, n_envs=250, n_iters=150,
        init_std=10.0, snapshot_mode="none", seed=0,
    ),
    reward=cfg.reward.replace(mode="ours", scale=1.0),
)

out = run_pipeline(
    "pusher3dof", LOG,
    n_demos=4000, translation_iters=100_000, rl_iters=150,
    scale=1.0, seed=0, cfg=cfg, expert_npz=EXPERT, rl_context=rl_context,
    resume=True,
)

rt = [h["ReturnTrue"] for h in out["history"]]
sr = [h["SuccessRate"] for h in out["history"]]
summary = dict(
    context={k: str(v) for k, v in rl_context.items()},
    n_demos=4000,
    push_full_recipe_best=-0.607,  # 2,000-demo run, same context (rl/)
    oracle_best=-0.126,            # push_full_recipe/oracle_rl (same budget)
    visual=dict(
        first10=float(np.mean(rt[:10])), last10=float(np.mean(rt[-10:])),
        best=max(rt), best_iter=int(np.argmax(rt)), max_success=max(sr),
    ),
)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))
