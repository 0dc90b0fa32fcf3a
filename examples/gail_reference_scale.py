"""GAIL baseline at the reference's scale — the TPIL paper's second baseline.

The reference ships GAIL as a distinct trainer
(sandbox/bradly/third_person/algos/cyberpunk_trainer_gail.py, 202 LoC);
here it is the documented three-flag variant of the same TpilTrainer
(baselines_tpil/trainer.py:18): no expert-fail group, no domain-confusion
loss (``dom_loss_weight=0``), discriminator judges (expert vs novice) pairs
only. Everything else — budget, envs, domain shift, TRPO step — matches
``tpil_reference_scale.py`` so the two curves are directly comparable:
GAIL's discriminator sees appearance AND behavior entangled, which is
exactly what TPIL's expert-fail group + domain confusion fix.

Artifacts -> examples/results/gail_reference_scale.
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
from imitation_from_observation_tpu.core.config import EnvConfig
from imitation_from_observation_tpu.core.log import Logger
from imitation_from_observation_tpu.exp.train_expert import load_expert
from imitation_from_observation_tpu.rl import GaussianMLPPolicy, LinearFeatureBaseline, TRPO
from imitation_from_observation_tpu.sim import make_native_vec

LOG = os.path.join(os.path.dirname(__file__), "results", "gail_reference_scale")
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
# identical domain setup to tpil_reference_scale.py: expert acts in ITS
# domain, the novice learns under per-episode color/viewpoint redraws
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
# GAIL: class loss only (cyberpunk_trainer_gail.py drops the domain head)
disc = DomainConfusionVelocityDiscriminator(input_dim=(HW, HW, 3), dom_loss_weight=0.0, seed=0)
os.makedirs(LOG, exist_ok=True)
logger = Logger(LOG)
trainer = TpilTrainer(
    disc,
    novice,
    novice_vec,
    expert_vec,
    expert,
    expert_fail_policy=None,  # GAIL: expert-success vs novice only
    policy_optimizer=TRPO(novice, step_size=0.01),
    baseline=LinearFeatureBaseline(),
    horizon=HORIZON,
    batch_size=256,
    disc_epochs=10,
    use_expert_fail=False,
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

with open(os.path.join(LOG, "NOTES.md"), "w") as f:
    f.write(f"""# GAIL at reference scale (reach, domain-shifted novice)

Three-flag variant of TpilTrainer (no expert-fail group, dom_loss_weight=0,
use_expert_fail=False) ≙ the reference's cyberpunk_trainer_gail.py. Budget
and env/domain setup identical to `tpil_reference_scale/` for a direct
curve-to-curve comparison.

Result: first5 {summary['first5']:.3f} -> best {best:.3f} (itr {summary['best_iter']}),
last5 {summary['last5']:.3f}, over {N_ITERS} iterations of TRPO batch
{N_TRAJS_POLICY * HORIZON}.
""")
