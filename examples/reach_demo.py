"""Moderate-scale REACH pipeline on real hardware (BASELINE config #1):
oracle expert -> 40 demo videos from random viewpoints/contexts ->
ContextSkip training (TPU, device-resident data) -> visual-reward TRPO.
Artifacts (progress.csv, demo stats, checkpoints) land in
examples/results/reach_demo; plot with exp.viskit_lite.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    ExperimentConfig,
    RLConfig,
    RewardConfig,
    TrainConfig,
    TranslationModelConfig,
)
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "reach_demo")

cfg = ExperimentConfig(
    name="reach_demo",
    env=EnvConfig(name="reacher3dof", image_size=(48, 48), render_size=(240, 240), horizon=50),
    model=TranslationModelConfig(model="context_skip", image_size=(48, 48)),
    train=TrainConfig(
        batch_size=64, n_train=32, eval_every=200, save_every=1500, log_every=200, learning_rate=1e-4
    ),
    rl=RLConfig(
        batch_size=4000, max_path_length=50, n_envs=40, n_iters=10,
        init_std=10.0, snapshot_mode="last",
    ),
    reward=RewardConfig(mode="ours", scale=1.0),
)

out = run_pipeline(
    "reacher3dof", LOG, n_demos=40, expert_iters=40,
    translation_iters=3000, rl_iters=10, scale=1.0, seed=0, cfg=cfg,
)
print(
    "history:",
    [
        {k: round(v, 4) for k, v in h.items() if k in ("Iteration", "AverageReturn", "ReturnTrue", "MeanKL")}
        for h in out["history"]
    ],
)
