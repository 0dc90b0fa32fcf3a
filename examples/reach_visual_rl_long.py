"""Longer visual-reward TRPO for reach with the 100k translation model:
50 iterations x 2000 steps, scale 0.1 (the reference's best-performing pixel
weight was swept over {0.1, 1, 10}, run_trpo_push.py:107)."""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from imitation_from_observation_tpu.core.checkpoint import load_pytree
from imitation_from_observation_tpu.core.config import (
    EnvConfig,
    ExperimentConfig,
    RLConfig,
    RewardConfig,
    TranslationModelConfig,
)
from imitation_from_observation_tpu.exp.launchers import run_visual_trpo
from imitation_from_observation_tpu.models import build_model
from imitation_from_observation_tpu.video.dataset import build_video_dataset

HERE = os.path.dirname(os.path.abspath(__file__))
BASE = os.path.join(HERE, "results", "reach_100k")
LOG = os.path.join(HERE, "results", "reach_visual_rl_long")

model_cfg = TranslationModelConfig(model="context_skip", image_size=(48, 48))
ck = sorted(glob.glob(os.path.join(BASE, "translation", "checkpoints", "100000", "model_*.json")))[0][: -len(".json")]
model = build_model(model_cfg)
x = jnp.zeros((1, 48, 48, 3), jnp.float32)
params = load_pytree(ck, model.init(jax.random.key(0), x, x, x))

# held-out demos: rebuild from the kept sample videos + freshly recorded ones
vdata_path = os.path.join(BASE, "translation", "vdata.npy")
if os.path.exists(vdata_path):
    demo_data = np.load(vdata_path)[:, 270:]
else:
    # the scaled run's vdata was pruned; record 30 fresh held-out demos
    from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos
    from imitation_from_observation_tpu.exp.train_expert import load_expert

    vd = os.path.join(LOG, "holdout_videos")
    generate_demo_videos(
        "reacher3dof", load_expert(os.path.join(HERE, "results", "reach_demo", "expert")),
        vd, 30, horizon=50, record_size=(240, 240), seed=999,
    )
    demo_data = build_video_dataset(os.path.join(vd, "*.mp4"), (48, 48), 30, video_len=51)
print("demo_data", demo_data.shape)

cfg = ExperimentConfig(
    name="reach_visual_rl_long",
    log_dir=LOG,
    env=EnvConfig(name="reacher3dof", image_size=(48, 48), render_size=(120, 120), horizon=50),
    model=model_cfg,
    rl=RLConfig(batch_size=2000, max_path_length=50, n_envs=40, n_iters=50,
                init_std=10.0, snapshot_mode="last"),
    reward=RewardConfig(mode="ours", scale=0.1),
)
policy, history = run_visual_trpo(cfg, params=params, demo_data=demo_data)
print("ReturnTrue:", [round(h["ReturnTrue"], 3) for h in history])
