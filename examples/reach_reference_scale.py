"""Reach visual-RL at the reference's OWN RL budget on one chip.

The reference ran TRPO with batch 50*250 = 12,500 steps/iteration for
100-200 iterations per config (run_trpo_push.py:152-163, batch_polopt
n_itr) on a multi-GPU EC2 box with 4-6 worker processes. This run matches
that shape — 300 demos, 30k translation steps, batch 12,500 (250 paths of
50), 100 TRPO iterations, scale 0.1 — on a single v5e + one host core.
Artifacts land in examples/results/reach_reference_scale.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "reach_reference_scale")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_reach")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

cfg = preset("reach")
cfg = cfg.replace(
    name="reach_reference_scale",
    env=cfg.env.replace(horizon=50),
    train=cfg.train.replace(batch_size=100, eval_every=1000, save_every=10000, log_every=1000,
                            learning_rate=1e-4),
    rl=cfg.rl.replace(batch_size=12500, max_path_length=50, n_envs=50, n_iters=100,
                      init_std=10.0, snapshot_mode="last"),
    reward=cfg.reward.replace(mode="ours", scale=0.1),
)

out = run_pipeline(
    "reacher3dof", LOG, n_demos=300,
    translation_iters=30000, rl_iters=100, scale=0.1, seed=0, cfg=cfg,
    expert_npz=EXPERT,
)
hist = out["history"]
first = sum(h["ReturnTrue"] for h in hist[:10]) / 10
last = sum(h["ReturnTrue"] for h in hist[-10:]) / 10
best = max(h["ReturnTrue"] for h in hist)
print(f"ReturnTrue first-10 mean {first:.4f} -> last-10 mean {last:.4f} (best {best:.4f})")
