"""Reach at the reference's FULL recipe — data, model AND RL budgets.

Round-2 ran the reference's RL budget (batch 12,500 x 100 iters) but with a
demo/model budget far below the reference's (300 demos / 30k steps vs 3,500
videos / 100k iters — run_train_strike.py:37-39, train_script.py:128,163),
and no best-iterate selection. This run closes all of it on one chip:

  stage 0  oracle-mode control at the IDENTICAL RL budget (separates
           reward-signal quality from RL-stack quality; base.py:190-191)
  stage 1  2,000 demo videos recorded batched through the on-device
           raycast renderer (the same renderer the RL frames use)
  stage 2  context-translation training for 100,000 fused steps
  stage 3  visual-reward TRPO, batch 12,500 (250 paths x 50), 150 iters,
           snapshot_mode="all" + best-iterate reporting, scale 0.1

Matches sandbox/andrew/run_trpo_reach.py:84-87 + run_train_*.py and the
plots notebook's best-iterate protocol. Artifacts ->
examples/results/reach_full_recipe/{oracle_rl,videos,translation,rl}.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_pipeline,
    run_visual_trpo,
    sample_rl_context,
)
from imitation_from_observation_tpu.exp.report import summarize

LOG = os.path.join(os.path.dirname(__file__), "results", "reach_full_recipe")
EXPERT = os.path.join(
    os.path.dirname(__file__), "..", "data", "reference_experts", "expert_reach"
)

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

N_DEMOS = 2000
TRANSLATION_ITERS = 100_000
RL_ITERS = 150

cfg = preset("reach")
cfg = cfg.replace(
    name="reach_full_recipe",
    log_dir=LOG,
    env=cfg.env.replace(horizon=50, frame_backend="tpu"),
    train=cfg.train.replace(
        batch_size=100,
        steps_per_call=50,
        eval_every=5000,
        save_every=25000,
        log_every=5000,
        learning_rate=1e-4,
    ),
    rl=cfg.rl.replace(
        batch_size=12500,
        max_path_length=50,
        n_envs=250,
        n_iters=RL_ITERS,
        init_std=10.0,
        snapshot_mode="all",
        seed=0,
    ),
    # the reference's reach ours_mode uses scale=1.0 (run_trpo_reach.py:96)
    reward=cfg.reward.replace(mode="ours", scale=1.0),
)

# the RL experiment runs in ONE fixed context drawn like the reference's
# rand_reach() (run_trpo_reach.py:67-87); demos keep full randomization
RL_CONTEXT = sample_rl_context("reach", seed=1)


results = {}

# -- stage 0: oracle control at the identical RL budget + fixed context -----
oracle_cfg = cfg.replace(
    log_dir=os.path.join(LOG, "oracle_rl"),
    env=cfg.env.replace(**RL_CONTEXT),
    reward=cfg.reward.replace(mode="oracle"),
)
_, oracle_hist = run_visual_trpo(oracle_cfg)
results["oracle"] = summarize(oracle_hist, "oracle control")

# -- stages 1-3: demos -> translation -> visual TRPO ------------------------
out = run_pipeline(
    "reacher3dof",
    LOG,
    n_demos=N_DEMOS,
    translation_iters=TRANSLATION_ITERS,
    rl_iters=RL_ITERS,
    scale=1.0,
    seed=0,
    cfg=cfg,
    expert_npz=EXPERT,
    rl_context=RL_CONTEXT,
)
results["visual"] = summarize(out["history"], "visual (ours)")

with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results, indent=1))
