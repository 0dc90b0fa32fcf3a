"""Thrower end-to-end pipeline on real hardware: reference expert (extracted
from /root/reference/expert_thrower.pkl) -> demo videos -> ContextSkip
training at 64x64 -> visual-reward TRPO, through the fully-native vec path
(batched stepping + on-device raycast frames).

The last task family without pipeline evidence (reference
run_trpo_throw.py / run_train_throw.py shapes: 64x64 frames like strike).
Artifacts land in examples/results/throw_demo.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "throw_demo")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_thrower")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

cfg = preset("throw")
cfg = cfg.replace(
    name="throw_demo",
    env=cfg.env.replace(horizon=50, frame_backend="tpu"),
    train=cfg.train.replace(batch_size=64, eval_every=200, save_every=2000, log_every=200,
                            learning_rate=1e-4, steps_per_call=20),
    rl=cfg.rl.replace(batch_size=5000, max_path_length=50, n_envs=100, n_iters=15,
                      init_std=10.0, snapshot_mode="all"),
    reward=cfg.reward.replace(mode="ours", scale=0.1),
)

out = run_pipeline(
    "thrower", LOG, n_demos=100,
    translation_iters=6000, rl_iters=15, scale=0.1, seed=0, cfg=cfg,
    expert_npz=EXPERT,
)
hist = out["history"]
best = max(h["ReturnTrue"] for h in hist)
print(
    f"ReturnTrue {hist[0]['ReturnTrue']:.4f} -> {hist[-1]['ReturnTrue']:.4f} "
    f"(best {best:.4f}); SuccessRate max {max(h['SuccessRate'] for h in hist):.2f}"
)
