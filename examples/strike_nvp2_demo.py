"""Strike pipeline with nvp=2 multi-viewpoint reward on real hardware.

The reference striker re-aims the camera per render and sums the visual
cost over viewpoints (striker.py:52-67, base.py:216-226 per-vp means/imgs,
cost summed at base.py:243-252). This run proves that path at production
shape: every odd step renders BOTH viewpoints ([2, H, W, 3] frames), the
warmup caches per-viewpoint translated-demo means, and the jitted scorer
sums feature+pixel L2 over the viewpoint axis. Artifacts land in
examples/results/strike_nvp2_demo.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "strike_nvp2_demo")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_striker")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

cfg = preset("strike")
cfg = cfg.replace(
    name="strike_nvp2_demo",
    env=cfg.env.replace(horizon=50, n_viewpoints=2),
    train=cfg.train.replace(batch_size=64, eval_every=100, save_every=1000, log_every=100,
                            learning_rate=1e-4),
    rl=cfg.rl.replace(batch_size=4000, max_path_length=50, n_envs=40, n_iters=10,
                      init_std=10.0, snapshot_mode="last"),
    reward=cfg.reward.replace(mode="ours", scale=0.1),
)

out = run_pipeline(
    "striker", LOG, n_demos=40,
    translation_iters=3000, rl_iters=10, scale=0.1, seed=0, cfg=cfg,
    expert_npz=EXPERT,
)
print("history:", [
    {k: round(v, 4) for k, v in h.items() if k in ("Iteration", "AverageReturn", "ReturnTrue")}
    for h in out["history"]
])
