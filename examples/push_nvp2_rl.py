"""Push RL-only leg with nvp=2 multi-viewpoint reward at the full budget.

push_full_recipe's visual leg reached best -0.607 / success 0.10 against an
oracle at -0.126 — the weakest perception outcome of the six tasks (its
scene carries 5 distractors). The reference's answer to ambiguous
single-view rewards is summing the visual cost over viewpoints
(striker.py:52-67, base.py:243-252); strike_nvp2_demo proved that path at
production shape. This leg reruns ONLY the RL stage of push_full_recipe —
same trained model, same demos, same seed-1 fixed context, same budget
(batch 12,500 x 150) — with TWO pinned camera azimuths
(``sample_rl_context(..., nvp=2)``: the first is the identical seed-1 draw,
the second an independent draw — the reference's per-viewpoint ``vp`` list,
striker.py:74-76) so every reward frame is scored from two genuinely
different cameras. An earlier launch of this leg pinned ONE scalar azimuth
with n_viewpoints=2, which silently duplicated the camera; those artifacts
are reclassified as the reward-scale control ``rl_x2scale/``.

Artifacts -> examples/results/push_full_recipe/rl_nvp2/ + summary.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    ensure_vdata,
    run_visual_trpo,
    sample_rl_context,
)

BASE = os.path.join(os.path.dirname(__file__), "results", "push_full_recipe")
LOG = os.path.join(BASE, "rl_nvp2")
N_TRAIN = 1600
RL_ITERS = 250  # first 150 compare 1:1 vs the single-vp leg; the tail
# covers push_full_recipe/NOTES.md's "curve still creeping at 150"

ckpt_dir = os.path.join(BASE, "translation", "checkpoints", "100000")
ckpt = [f[:-4] for f in os.listdir(ckpt_dir) if f.endswith(".npz")][0]
# vdata.npy is a gitignored multi-GB cache — rebuild from the committed demo
# mp4s with the recipe's dataset params (2,000 videos) if it is gone
_ds = preset("push")
vdata = ensure_vdata(BASE, _ds.replace(train=_ds.train.replace(n_videos=2000, n_train=N_TRAIN)))
demo_data = np.asarray(vdata[:, N_TRAIN:], np.float32)

# identical scene draw to push_full_recipe plus a second, distinct azimuth
ctx = sample_rl_context("push", seed=1, nvp=2)
cfg = preset("push")
cfg = cfg.replace(
    name="push_nvp2",
    log_dir=LOG,
    env=cfg.env.replace(horizon=50, frame_backend="tpu", n_viewpoints=2, **ctx),
    rl=cfg.rl.replace(
        batch_size=12500, max_path_length=50, n_envs=250, n_iters=RL_ITERS,
        init_std=10.0, snapshot_mode="none", seed=0,
    ),
    reward=cfg.reward.replace(
        mode="ours", scale=1.0, model_checkpoint=os.path.join(ckpt_dir, ckpt)
    ),
)

_, hist = run_visual_trpo(cfg, demo_data=demo_data)
rt = [h["ReturnTrue"] for h in hist]
sr = [h["SuccessRate"] for h in hist]
out = dict(
    context={k: str(v) for k, v in ctx.items()},
    n_viewpoints=2,
    first10=float(np.mean(rt[:10])), last10=float(np.mean(rt[-10:])),
    best=max(rt), best_iter=int(np.argmax(rt)), max_success=max(sr),
    single_vp_best=-0.607,  # push_full_recipe/summary.json visual.best
)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
