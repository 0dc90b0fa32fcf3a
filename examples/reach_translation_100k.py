"""Reference-budget translation training (train_script.py's 100k iterations,
run_train_strike.py's checkpoint-every-5k) for reach on the real TPU:
300 demo videos, ContextSkip 48x48, batch 128, fused 50-step calls.
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
LOG = os.path.join(HERE, "results", "reach_100k")
EXPERT = os.path.join(HERE, "results", "reach_demo", "expert")

N_VIDEOS = 300
video_dir = os.path.join(LOG, "videos")
have = len([f for f in os.listdir(video_dir) if f.endswith(".mp4")]) if os.path.isdir(video_dir) else 0
if have < N_VIDEOS:
    generate_demo_videos(
        "reacher3dof", load_expert(EXPERT), video_dir, N_VIDEOS, horizon=50,
        record_size=(240, 240), seed=200,
    )

cfg = ExperimentConfig(
    name="reach_100k",
    log_dir=LOG,
    env=EnvConfig(name="reacher3dof", image_size=(48, 48), horizon=50),
    model=TranslationModelConfig(model="context_skip", image_size=(48, 48)),
    train=TrainConfig(
        batch_size=128,
        n_videos=N_VIDEOS,
        n_train=int(N_VIDEOS * 0.9),
        n_iters=100_000,
        steps_per_call=50,
        log_every=2500,
        eval_every=2500,
        save_every=50_000,
        learning_rate=1e-4,
    ),
)
trainer = run_translation_training(cfg, os.path.join(video_dir, "*.mp4"))
print("final valid losses:", trainer.valid_losses[-5:])
