"""TPIL (third-person imitation) baseline at real scale on hardware.

Capability match for the reference's CyberpunkAWS launcher
(sandbox/bradly/third_person/launchers/cyberpunk_aws.py:21-106): the
expert acts in ITS domain (fixed context), the novice learns in a
DIFFERENT domain (new random colors/viewpoint draw), and the
domain-confusion velocity discriminator scores (frame_t, frame_t+3) pairs
— P(expert) becomes the novice's reward. Expert = the extracted reference
`expert_reach.pkl`; expert-fail = a random policy (the reference's
expert-fail pickle role). 48x48 frames, 20 alternating iterations.
Artifacts land in examples/results/tpil_reach_demo.
"""
import os, sys
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
from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

LOG = os.path.join(os.path.dirname(__file__), "results", "tpil_reach_demo")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_reach")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

HW, HORIZON = 48, 50
base = dict(image_size=(HW, HW), render_size=(128, 128), horizon=HORIZON)
# expert domain: the reference expert observes the full-state variant;
# novice domain: a different seed => different arm/bg color context
expert_env = NormalizedEnv(
    make_env("reacher3dof", EnvConfig(name="reacher3dof", seed=7, full_state=True, **base))
)
novice_env = NormalizedEnv(make_env("reacher3dof", EnvConfig(name="reacher3dof", seed=3, **base)))

expert = load_expert(EXPERT)
obs_dim = novice_env.observation_space.flat_dim
act_dim = novice_env.action_space.flat_dim
novice = GaussianMLPPolicy(obs_dim, act_dim, hidden=(32, 32), init_std=1.0, seed=0)
fail = RandomPolicy(act_dim, seed=1)
disc = DomainConfusionVelocityDiscriminator((HW, HW, 3))

os.makedirs(LOG, exist_ok=True)
logger = Logger(log_dir=LOG)
trainer = TpilTrainer(
    disc,
    novice,
    novice_env,
    expert_env,
    expert,
    expert_fail_policy=fail,
    policy_optimizer=TRPO(novice),
    baseline=LinearFeatureBaseline(),
    horizon=HORIZON,
    batch_size=64,
    disc_epochs=10,
    seed=0,
    logger=logger,
)

rows = []
for itr in range(20):
    row = trainer.take_iteration(n_trajs_cost=8, n_trajs_policy=20)
    rows.append(row)
    logger.record_tabular("Iteration", itr)
    logger.record_tabular("GanLoss", row["GanLoss"])
    logger.dump_tabular()
    logger.log(
        f"itr {itr}: GanLoss {row['GanLoss']:.4f} "
        f"GanReward {row['GanReward']:.4f} ReturnTrue {row['ReturnTrue']:.4f}"
    )

first = np.mean([r["ReturnTrue"] for r in rows[:5]])
last = np.mean([r["ReturnTrue"] for r in rows[-5:]])
print(f"ReturnTrue first-5 mean {first:.4f} -> last-5 mean {last:.4f}")
novice_env.close()
expert_env.close()
