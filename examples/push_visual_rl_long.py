"""Long push visual-RL run at data scale: 400 reference-expert demos, 60k
translation steps, 100 visual-TRPO iterations at production shape, scale
0.1 (one of the reference's push scale sweep values, run_trpo_push.py:108;
the reference trained its push model on 3,500 videos for 100k steps). The
goal is an honest ReturnTrue learning curve like reach_visual_rl_long, now
that one iteration costs ~6 s instead of ~70 s. Artifacts land in
examples/results/push_visual_rl_long.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "push_visual_rl_long")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_push")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

cfg = preset("push")
cfg = cfg.replace(
    name="push_visual_rl_long",
    env=cfg.env.replace(horizon=50),
    train=cfg.train.replace(batch_size=100, eval_every=500, save_every=5000, log_every=500,
                            learning_rate=1e-4),
    rl=cfg.rl.replace(batch_size=4000, max_path_length=50, n_envs=40, n_iters=100,
                      init_std=10.0, snapshot_mode="last"),
    reward=cfg.reward.replace(mode="ours", scale=0.1),
)

out = run_pipeline(
    "pusher3dof", LOG, n_demos=400,
    translation_iters=60000, rl_iters=100, scale=0.1, seed=0, cfg=cfg,
    expert_npz=EXPERT,
)
hist = out["history"]
first = sum(h["ReturnTrue"] for h in hist[:10]) / 10
last = sum(h["ReturnTrue"] for h in hist[-10:]) / 10
print(f"ReturnTrue first-10 mean {first:.4f} -> last-10 mean {last:.4f}")
