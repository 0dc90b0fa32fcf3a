"""Config 4 with an in-image SELF-SUPERVISED backbone — beyond the reference.

The reference's inception pipeline needs an ImageNet slim checkpoint
(rllab/sampler/base.py:77-89); none exists in this image, and the committed
`strike_inception_demo/` run therefore used a random-init backbone (plumbing
proof, features anchored by RMS only). This run closes the feature-quality
gap without any external weights:

1. Pretrain Inception-v3 on the SAME 60 demo videos with BN calibration +
   the reference's own TimeSoftmax pretext (arm_shaping.py:303) — features
   must encode arm/object configuration and ignore the per-video randomized
   appearance (exp/pretrain_backbone.py).
2. Run the identical 299x299 pipeline: Mixed_7c features -> ContextFeat
   translation -> TRPO with the `oursinception` reward.

Demo videos and decoded frames are reused from the committed
strike_inception_demo recording (the demos don't depend on the backbone).
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

BASE = os.path.join(os.path.dirname(__file__), "results", "strike_inception_demo")
LOG = os.path.join(os.path.dirname(__file__), "results", "strike_inception_selfsup")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_striker")
N_DEMOS = 60
HW = (299, 299)
BACKBONE = os.path.join(LOG, "backbone_selfsup")

os.makedirs(LOG, exist_ok=True)

# -- stage 0: self-supervised backbone pretraining ---------------------------
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
        os.path.join(BASE, "videos", "*.mp4"), image_size=HW, n_videos=N_DEMOS,
        video_len=51, n_skip=2, rescale=False, seed=0,
        cache_path=os.path.join(BASE, "frames_u8.npy"),
    )
    backbone_params, metrics = pretrain_inception_time(
        frames, n_steps=2000, batch=32, n_valid_videos=N_DEMOS - int(N_DEMOS * 0.8),
        seed=0, log_every=100,
    )
    save_pytree(BACKBONE, backbone_params)
    with open(os.path.join(LOG, "pretrain_metrics.json"), "w") as f:
        json.dump({k: float(v) for k, v in metrics.items()}, f, indent=1)
    print("pretrain:", json.dumps(metrics, indent=1))

# -- stages 1-4: the identical config-4 pipeline, pretrained features --------
run_strike_inception(
    LOG,
    EXPERT,
    n_demos=N_DEMOS,
    hw=HW,
    backbone_params=backbone_params,
    backbone_tag="selfsup_time",
    video_dir=os.path.join(BASE, "videos"),
    frames_cache=os.path.join(BASE, "frames_u8.npy"),
    notes_caveat="""
**Backbone provenance.** Pretrained IN-IMAGE on the 60 demo videos themselves:
BN statistics calibrated (models/inception_v3.py::calibrate_bn) and the
trunk trained with the reference's TimeSoftmax pretext (arm_shaping.py:303)
— predict the frame's time bucket across context-randomized videos, so
Mixed_7c must encode arm/object configuration and ignore appearance. Pretext
metrics in pretrain_metrics.json. No external weights were used (none exist
in this image); this isolates what config 4 delivers when the features are
MEANINGFUL rather than a random projection (`strike_inception_demo/`).
""",
)
