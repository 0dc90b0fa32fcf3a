"""Config 4 at REFERENCE budget with an in-image SELF-SUPERVISED backbone.

The reference's inception pipeline needs an ImageNet slim checkpoint
(rllab/sampler/base.py:77-89); none exists in this image, and the committed
`strike_inception_demo/` run therefore used a random-init backbone (plumbing
proof). This run closes the feature-quality gap without external weights AND
runs the pipeline at the reference's own shape:

- **500 demo videos** (toward run_train_strike_inception.py:39's 2,500;
  self-generated in-image, 299x299 raycast recordings)
- backbone pretrained on those demos: BN calibration + the reference's
  TimeSoftmax pretext (arm_shaping.py:303) with the round-5 generalization
  controls (augmentation, weight decay, smoothed targets, early stop on
  held-out CE — the round-4 bare pretext overfit: valid acc 0.127)
- ContextFeat translation in Mixed_7c feature space, 100k steps (batch 25,
  run_train_strike_inception.py:40-43)
- TRPO with `oursinception` at the reference RL shape: batch 50x250, 150
  iterations (run_trpo_inception.py:201-209 runs n_itr 200 at 50*250) —
  feasible on one chip because frames now stay device-resident through
  raycast -> backbone -> encoder (reward/engine.py round-5 path; the
  host-frame route paid ~100 s/iteration at a fifth of this batch).

Artifacts -> examples/results/strike_inception_selfsup/ + summary.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.checkpoint import load_pytree, save_pytree
from imitation_from_observation_tpu.exp.inception_pipeline import run_strike_inception
from imitation_from_observation_tpu.exp.pretrain_backbone import pretrain_inception_time
from imitation_from_observation_tpu.models.inception_v3 import InceptionV3
from imitation_from_observation_tpu.video.dataset import build_video_dataset

import jax

LOG = os.path.join(os.path.dirname(__file__), "results", "strike_inception_selfsup")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_striker")
# env-overridable so the queue can right-size the run to the TPU time that
# remains in a round (relay outages are hours-long; see CLAUDE.md)
N_DEMOS = int(os.environ.get("SELFSUP_DEMOS", "500"))
RL_ITERS = int(os.environ.get("SELFSUP_RL_ITERS", "100"))
TRANSLATION_ITERS = int(os.environ.get("SELFSUP_TRANSLATION_ITERS", "100000"))
N_VALID = 60
HW = (299, 299)
# backbone keyed by demo count: the round-4 60-demo artifact must never be
# silently reused for the 500-demo run
BACKBONE = os.path.join(LOG, f"backbone_selfsup_n{N_DEMOS}")

os.makedirs(LOG, exist_ok=True)

# -- stage 0a: demo recordings (videos also feed stages 1-4) -----------------
# run_strike_inception records into LOG/videos when fewer than N_DEMOS exist;
# pretraining needs the same frames first, so trigger the recording here.
video_dir = os.path.join(LOG, "videos")
frames_cache = os.path.join(LOG, "frames_u8.npy")
import glob

if len(glob.glob(os.path.join(video_dir, "*.mp4"))) < N_DEMOS:
    from imitation_from_observation_tpu.core.config import preset
    from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos_vec
    from imitation_from_observation_tpu.exp.launchers import scene_overrides
    from imitation_from_observation_tpu.exp.train_expert import load_expert

    cfg = preset("strike_inception")
    generate_demo_videos_vec(
        "striker", load_expert(EXPERT), video_dir, N_DEMOS, horizon=50, seed=0,
        env_overrides=dict(
            scene_overrides(cfg.env), image_size=HW, render_size=cfg.env.render_size
        ),
        n_envs=20, frame_backend="tpu",
    )

# -- stage 0b: self-supervised backbone pretraining --------------------------
if os.path.exists(BACKBONE + ".npz"):
    model = InceptionV3(final_endpoint="Mixed_7c")
    import jax.numpy as jnp

    like = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, *HW, 3), jnp.float32))
    )
    backbone_params = load_pytree(BACKBONE, like)
    print("stage 0: pretrained backbone loaded, skipping")
else:
    frames = build_video_dataset(
        os.path.join(video_dir, "*.mp4"), image_size=HW, n_videos=N_DEMOS,
        video_len=51, n_skip=2, rescale=False, seed=0, cache_path=frames_cache,
    )
    backbone_params, metrics = pretrain_inception_time(
        frames, n_steps=8000, batch=32, n_valid_videos=N_VALID,
        seed=0, log_every=200, eval_every=1000,
        augment=True, weight_decay=1e-4, time_smooth_sigma=1.0, early_stop=True,
    )
    save_pytree(BACKBONE, backbone_params)
    with open(os.path.join(LOG, "pretrain_metrics.json"), "w") as f:
        json.dump({k: float(v) for k, v in metrics.items()}, f, indent=1)
    print("pretrain:", json.dumps(metrics, indent=1))

# -- stages 1-4: the config-4 pipeline at reference shape --------------------
run_strike_inception(
    LOG,
    EXPERT,
    n_demos=N_DEMOS,
    hw=HW,
    backbone_params=backbone_params,
    backbone_tag=f"selfsup_time_n{N_DEMOS}",
    video_dir=video_dir,
    frames_cache=frames_cache,
    rl_iters=RL_ITERS,
    rl_batch_size=12_500,
    rl_n_envs=250,
    translation_iters=TRANSLATION_ITERS,
    notes_caveat=f"""
**Backbone provenance.** Pretrained IN-IMAGE on the {N_DEMOS} demo videos
themselves: BN statistics calibrated (models/inception_v3.py::calibrate_bn)
and the trunk trained with the reference's TimeSoftmax pretext
(arm_shaping.py:303) under augmentation/weight-decay/early-stop
generalization controls — predict the frame's time bucket across
context-randomized videos, so Mixed_7c must encode arm/object configuration
and ignore appearance. Pretext metrics in pretrain_metrics.json. No external
weights were used (none exist in this image); this isolates what config 4
delivers when the features are MEANINGFUL rather than a random projection
(`strike_inception_demo/`).

**Budget.** {N_DEMOS} demos (reference: 2,500 — run_train_strike_inception.py:39),
translation {TRANSLATION_ITERS:,} steps at batch 25, TRPO batch 12,500 (the
reference's 50x250) x {RL_ITERS} iterations (reference n_itr 200).
""",
)
