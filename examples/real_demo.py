"""Real-pusher config pipeline on real hardware (BASELINE config 5, sim proof).

The reference's real-to-sim config (sandbox/andrew/run_trpo.py:53-67) runs
RL in the camera-matched Pusher3DOFReal scene with a FIXED measured
goal/object/camera and scale 0.01; its demo videos came from the physical
robot. Standing in for the robot videos, this script records demos from a
dense-reward oracle expert trained in the same matched scene, then runs the
standard pipeline: ContextSmall at the reference's (36,64) real resolution
-> visual-reward TRPO. Artifacts land in examples/results/real_demo.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import run_pipeline

LOG = os.path.join(os.path.dirname(__file__), "results", "real_demo")

# the third measured scene from run_trpo.py:83-95 — the one with a
# meaningful object-goal separation (0.20 m; scenes 1/2/4 start with the
# object already ~0.02-0.04 m from the goal, so their reward_true ratios
# are noise-dominated)
SCENE = dict(
    cam_dist=2.1177303054204777,
    goal=(-0.46625543263065705, 0.0),
    object_pos=(-0.2661080002347772, 0.0),
    view_angle=60.2010815701377,
    viewpoint=98.81026264082921,
)

cfg = preset("real")
cfg = cfg.replace(
    name="real_demo",
    env=cfg.env.replace(horizon=50, **SCENE),
    train=cfg.train.replace(batch_size=64, eval_every=100, save_every=1000, log_every=100,
                            learning_rate=1e-4),
    rl=cfg.rl.replace(batch_size=4000, max_path_length=50, n_envs=40, n_iters=10,
                      init_std=10.0, snapshot_mode="last"),
    # the reference real config uses pixel-loss scale 0.01 (run_trpo.py:64)
    reward=cfg.reward.replace(mode="ours", scale=0.01),
)

out = run_pipeline(
    "pusher3dofreal", LOG, n_demos=40, expert_iters=25,
    translation_iters=3000, rl_iters=10, scale=0.01, seed=0, cfg=cfg,
)
print("history:", [
    {k: round(v, 4) for k, v in h.items() if k in ("Iteration", "AverageReturn", "ReturnTrue", "MeanKL")}
    for h in out["history"]
])
