"""Stage 0 + stage 3 of the full recipe, reusing the trained artifacts.

Re-runs the oracle control and the visual-reward TRPO leg of
reach_full_recipe.py against the ALREADY-trained 100k-step translation
model and the 2,000 recorded demos, under the reference's fixed-context
protocol (sample_rl_context; run_trpo_reach.py:67-87) and reach's
scale=1.0. Use after editing RL-side knobs without re-paying demo
recording/translation training.
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
from imitation_from_observation_tpu.exp.report import summarize

LOG = os.path.join(os.path.dirname(__file__), "results", "reach_full_recipe")
N_TRAIN = 1600  # run_pipeline's 0.8 split of the 2,000 demos
RL_ITERS = 150

ckpt_dir = os.path.join(LOG, "translation", "checkpoints", "100000")
ckpt = [f[:-4] for f in os.listdir(ckpt_dir) if f.endswith(".npz")][0]
vdata = np.load(os.path.join(LOG, "translation", "vdata.npy"), mmap_mode="r")
demo_data = np.asarray(vdata[:, N_TRAIN:], np.float32)

RL_CONTEXT = sample_rl_context("reach", seed=1)
print("fixed RL context:", json.dumps({k: str(v)[:60] for k, v in RL_CONTEXT.items()}))

cfg = preset("reach")
cfg = cfg.replace(
    name="reach_full_recipe",
    log_dir=LOG,
    env=cfg.env.replace(horizon=50, frame_backend="tpu", **RL_CONTEXT),
    rl=cfg.rl.replace(
        batch_size=12500, max_path_length=50, n_envs=250, n_iters=RL_ITERS,
        init_std=10.0, snapshot_mode="all", seed=0,
    ),
    reward=cfg.reward.replace(
        mode="ours", scale=1.0, model_checkpoint=os.path.join(ckpt_dir, ckpt)
    ),
)


results = {}
oracle_cfg = cfg.replace(
    log_dir=os.path.join(LOG, "oracle_rl"),
    reward=cfg.reward.replace(mode="oracle", model_checkpoint=""),
)
_, oracle_hist = run_visual_trpo(oracle_cfg)
results["oracle"] = summarize(oracle_hist, "oracle control")

_, history = run_visual_trpo(cfg, demo_data=demo_data)
results["visual"] = summarize(history, "visual (ours)")

with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results, indent=1))
