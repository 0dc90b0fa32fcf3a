"""Long strike visual-RL run: 100 reference-expert demos, 10k translation
steps at (64,64), 50 visual-TRPO iterations at production shape, scale 0.1
(the reference's strike setting, run_trpo_strike.py:86). Artifacts land in
examples/results/strike_visual_rl_long.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "strike_visual_rl_long")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_striker")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

cfg = preset("strike")
cfg = cfg.replace(
    name="strike_visual_rl_long",
    env=cfg.env.replace(horizon=50),
    train=cfg.train.replace(batch_size=100, eval_every=500, save_every=5000, log_every=500,
                            learning_rate=1e-4),
    rl=cfg.rl.replace(batch_size=4000, max_path_length=50, n_envs=40, n_iters=50,
                      init_std=10.0, snapshot_mode="last"),
    reward=cfg.reward.replace(mode="ours", scale=0.1),
)

out = run_pipeline(
    "striker", LOG, n_demos=100,
    translation_iters=10000, rl_iters=50, scale=0.1, seed=0, cfg=cfg,
    expert_npz=EXPERT,
)
hist = out["history"]
first = sum(h["ReturnTrue"] for h in hist[:10]) / 10
last = sum(h["ReturnTrue"] for h in hist[-10:]) / 10
print(f"ReturnTrue first-10 mean {first:.4f} -> last-10 mean {last:.4f}")
