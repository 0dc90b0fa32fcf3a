"""Scaled context-translation training for reach (real TPU): 300 expert demo
videos from randomized viewpoints/contexts, ContextSkip at 48x48, 30k Adam
iterations (batch 128) with fused 50-step device calls. Artifacts under
examples/results/reach_scaled: loss curve data + translated/recon GIF pairs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    ExperimentConfig,
    TrainConfig,
    TranslationModelConfig,
)
from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos
from imitation_from_observation_tpu.exp.launchers import run_translation_training
from imitation_from_observation_tpu.exp.train_expert import load_expert

HERE = os.path.dirname(os.path.abspath(__file__))
LOG = os.path.join(HERE, "results", "reach_scaled")
EXPERT = os.path.join(HERE, "results", "reach_demo", "expert")

N_VIDEOS = 300
expert = load_expert(EXPERT)
video_dir = os.path.join(LOG, "videos")
if len([f for f in os.listdir(video_dir) if f.endswith(".mp4")]) < N_VIDEOS if os.path.isdir(video_dir) else True:
    generate_demo_videos(
        "reacher3dof", expert, video_dir, N_VIDEOS, horizon=50,
        record_size=(240, 240), seed=100,
    )

cfg = ExperimentConfig(
    name="reach_scaled",
    log_dir=LOG,
    env=EnvConfig(name="reacher3dof", image_size=(48, 48), horizon=50),
    model=TranslationModelConfig(model="context_skip", image_size=(48, 48)),
    train=TrainConfig(
        batch_size=128,
        n_videos=N_VIDEOS,
        n_train=int(N_VIDEOS * 0.9),
        n_iters=30_000,
        steps_per_call=50,
        log_every=1000,
        eval_every=1000,
        save_every=15_000,
        learning_rate=1e-4,
    ),
)
trainer = run_translation_training(cfg, os.path.join(video_dir, "*.mp4"))
print("final valid losses:", trainer.valid_losses[-5:])
