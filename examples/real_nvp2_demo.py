"""Real-pusher config with TWO viewpoints (nvp=2) — the in-tree fix for the
round-2 real_demo failure mode.

real_demo's NOTES documented appearance-only reward satisfaction: with ONE
fixed camera the policy can please the pixel term without moving the
object, and ReturnTrue regressed. Multi-viewpoint scoring (proven on strike
in strike_nvp2_demo; reference striker.py:52-67 nvp loop + base.py's
per-viewpoint means) disambiguates: the cost sums over two azimuths of the
same measured scene, demos are recorded from both, and the reward engine
keeps per-viewpoint translation caches. Same measured scene, budget and
scale as real_demo otherwise. Artifacts -> examples/results/real_nvp2_demo.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "real_nvp2_demo")

# measured scene 3 of run_trpo.py:83-95 (see real_demo.py) with a second
# azimuth 40 degrees away standing in for a second camera
SCENE = dict(
    cam_dist=2.1177303054204777,
    goal=(-0.46625543263065705, 0.0),
    object_pos=(-0.2661080002347772, 0.0),
    view_angle=60.2010815701377,
    viewpoint=(98.81026264082921, 138.81026264082921),
    n_viewpoints=2,
)

cfg = preset("real")
cfg = cfg.replace(
    name="real_nvp2_demo",
    env=cfg.env.replace(horizon=50, frame_backend="tpu", **SCENE),
    train=cfg.train.replace(batch_size=64, eval_every=100, save_every=1000, log_every=100,
                            learning_rate=1e-4),
    rl=cfg.rl.replace(batch_size=4000, max_path_length=50, n_envs=80, n_iters=10,
                      init_std=10.0, snapshot_mode="all"),
    reward=cfg.reward.replace(mode="ours", scale=0.01),
)

out = run_pipeline(
    "pusher3dofreal", LOG, n_demos=40, expert_iters=25,
    translation_iters=3000, rl_iters=10, scale=0.01, seed=0, cfg=cfg,
)
hist = out["history"]
best = max(h["ReturnTrue"] for h in hist)
print(
    f"ReturnTrue {hist[0]['ReturnTrue']:.4f} -> {hist[-1]['ReturnTrue']:.4f} "
    f"(best {best:.4f})"
)
