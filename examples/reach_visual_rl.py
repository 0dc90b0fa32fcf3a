"""Visual-reward TRPO for reach using the scaled translation model (real
TPU): held-out demos translate into each rollout's context; rewards are
feature+pixel L2 against the mean translation. Artifacts under
examples/results/reach_visual_rl.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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

HERE = os.path.dirname(os.path.abspath(__file__))
SCALED = os.path.join(HERE, "results", "reach_scaled", "translation")
LOG = os.path.join(HERE, "results", "reach_visual_rl")

model_cfg = TranslationModelConfig(model="context_skip", image_size=(48, 48))
ck = sorted(glob.glob(os.path.join(SCALED, "checkpoints", "30000", "model_*.npz")))[0][: -len(".npz")]
model = build_model(model_cfg)
import jax
import jax.numpy as jnp

x = jnp.zeros((1, 48, 48, 3), jnp.float32)
like = model.init(jax.random.key(0), x, x, x)
params = load_pytree(ck, like)
vdata = np.load(os.path.join(SCALED, "vdata.npy"))
demo_data = vdata[:, 270:]  # held-out videos (n_train = 270)
print("demo_data", demo_data.shape)

cfg = ExperimentConfig(
    name="reach_visual_rl",
    log_dir=LOG,
    env=EnvConfig(name="reacher3dof", image_size=(48, 48), render_size=(240, 240), horizon=50),
    model=model_cfg,
    rl=RLConfig(batch_size=4000, max_path_length=50, n_envs=40, n_iters=15, init_std=10.0, snapshot_mode="last"),
    reward=RewardConfig(mode="ours", scale=1.0),
)
policy, history = run_visual_trpo(cfg, params=params, demo_data=demo_data)
print("ReturnTrue:", [round(h["ReturnTrue"], 3) for h in history])
