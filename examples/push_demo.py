"""Moderate-scale push pipeline on real hardware: oracle expert -> 40 demo
videos -> ContextSkip training (TPU, on-device data) -> visual-reward TRPO.
Artifacts (progress.csv, plots, demo stats) land in examples/results/push_demo.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import (
    EnvConfig, ExperimentConfig, RLConfig, RewardConfig, TrainConfig, TranslationModelConfig)
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "push_demo")

cfg = ExperimentConfig(
    name="push_demo",
    env=EnvConfig(name="pusher3dof", image_size=(48, 48), render_size=(240, 240), horizon=50),
    model=TranslationModelConfig(model="context_skip", image_size=(48, 48)),
    train=TrainConfig(batch_size=64, n_train=32, eval_every=100, save_every=1000,
                      log_every=100, learning_rate=1e-4),
    rl=RLConfig(batch_size=4000, max_path_length=50, n_envs=40, n_iters=8,
                init_std=10.0, snapshot_mode="last"),
    reward=RewardConfig(mode="ours", scale=1.0),
)

out = run_pipeline(
    "pusher3dof", LOG, n_demos=40, expert_iters=15,
    translation_iters=3000, rl_iters=8, scale=1.0, seed=0, cfg=cfg,
)
print("history:", [
    {k: round(v, 4) for k, v in h.items() if k in ("Iteration", "AverageReturn", "ReturnTrue", "MeanKL")}
    for h in out["history"]
])
