"""TPIL baseline at the reference's OWN scale — the paper's central
comparison baseline, run to a learning curve.

The reference's CyberpunkAWS launcher drove TPIL with TRPO batch 50*500 and
10 discriminator epochs per iteration
(sandbox/bradly/third_person/launchers/cyberpunk_aws.py:21-106). Round 2's
tpil_reach_demo ran a toy budget and documented instant discriminator
saturation; this run gives the baseline its real budget — 25,000 policy
steps/iteration (500 rollouts of 50), 50 cost trajectories per group
(expert-success / novice / expert-fail), 10 disc epochs, 30 alternating
iterations — with all rollout collection batched on the native vec envs.
Artifacts -> examples/results/tpil_reference_scale.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.baselines_tpil import (
    DomainConfusionVelocityDiscriminator,
    TpilTrainer,
)
from imitation_from_observation_tpu.baselines_tpil.trainer import RandomPolicy
from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.core.log import Logger
from imitation_from_observation_tpu.exp.train_expert import load_expert
from imitation_from_observation_tpu.rl import GaussianMLPPolicy, LinearFeatureBaseline, TRPO
from imitation_from_observation_tpu.sim import make_native_vec

LOG = os.path.join(os.path.dirname(__file__), "results", "tpil_reference_scale")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_reach")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

HW, HORIZON = 48, 50
N_ITERS = 30
N_TRAJS_COST = 50
N_TRAJS_POLICY = 500  # x50 steps = the reference's 50*500 batch

base = dict(
    image_size=(HW, HW), render_size=(128, 128), horizon=HORIZON, render_frames=True
)
# expert acts in ITS domain (fixed colors/viewpoint); the novice learns in a
# DIFFERENT domain — new color/viewpoint draws every episode
expert_cfg = EnvConfig(name="reacher3dof", seed=0, full_state=True, viewpoint=140.0, **base)
novice_cfg = EnvConfig(name="reacher3dof", seed=7, **base)

expert_vec = make_native_vec("reacher3dof", N_TRAJS_COST, expert_cfg,
                             max_path_length=HORIZON, frame_backend="tpu",
                             resample_cameras=False)
novice_vec = make_native_vec("reacher3dof", 100, novice_cfg,
                             max_path_length=HORIZON, frame_backend="tpu",
                             resample_cameras=True)

expert = load_expert(EXPERT)
novice = GaussianMLPPolicy(
    obs_dim=novice_vec.observation_space.flat_dim,
    action_dim=novice_vec.action_space.flat_dim,
    hidden=(32, 32),
    init_std=1.0,
    seed=0,
)
disc = DomainConfusionVelocityDiscriminator(input_dim=(HW, HW, 3), seed=0)
os.makedirs(LOG, exist_ok=True)
logger = Logger(LOG)
trainer = TpilTrainer(
    disc,
    novice,
    novice_vec,
    expert_vec,
    expert,
    expert_fail_policy=RandomPolicy(action_dim=3, seed=1),
    policy_optimizer=TRPO(novice, step_size=0.01),
    baseline=LinearFeatureBaseline(),
    horizon=HORIZON,
    batch_size=256,
    disc_epochs=10,
    logger=logger,
)

history = []
for itr in range(N_ITERS):
    with logger.prefix(f"itr #{itr} | "):
        row = trainer.take_iteration(n_trajs_cost=N_TRAJS_COST, n_trajs_policy=N_TRAJS_POLICY)
        row["Iteration"] = itr
        for k, v in row.items():
            logger.record_tabular(k, v)
        history.append(logger.dump_tabular())

rts = [h["ReturnTrue"] for h in history]
best = max(rts)
summary = dict(
    first5=float(np.mean(rts[:5])),
    last5=float(np.mean(rts[-5:])),
    best=best,
    best_iter=int(np.argmax(rts)),
    gan_reward_last=history[-1]["GanReward"],
)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))
