"""BASELINE config 4 at its REAL shape: strike through Inception-v3 features.

The reference's inception pipeline (run_train_strike_inception.py:39-43 +
run_trpo_inception.py:70-173): 299x299 demo frames -> Mixed_7c 8x8x2048
feature maps -> ContextAEInception2 (our ContextFeat) trained in feature
space -> TRPO with mode ``oursinception`` (agent frames routed through the
backbone before scoring). No pretrained slim checkpoint exists in this
image (the converter + restore sanity check are proven against real TF1
Saver files in tests/test_inception.py), so the backbone runs with its
random init — every shape, transfer and kernel is the real config's; drop
an ``inception_v3.npz`` into data/ and set ``backbone_npz`` to make the
features pretrained.

Stages + throughput numbers land in examples/results/strike_inception_demo.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_translation_training,
    run_visual_trpo,
    scene_overrides,
)
from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos_vec
from imitation_from_observation_tpu.exp.train_expert import load_expert
from imitation_from_observation_tpu.reward.backbones import make_inception_feature_fn
from imitation_from_observation_tpu.video.dataset import build_video_dataset

LOG = os.path.join(os.path.dirname(__file__), "results", "strike_inception_demo")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_striker")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

N_DEMOS = 60
HW = (299, 299)

cfg = preset("strike_inception")
cfg = cfg.replace(
    name="strike_inception_demo",
    log_dir=LOG,
    env=cfg.env.replace(horizon=50, frame_backend="tpu", image_size=HW),
    # reference: batch 25, nlen 25 (skip 2), run_train_strike_inception.py:39-43
    train=cfg.train.replace(
        batch_size=25, n_videos=N_DEMOS, n_train=int(N_DEMOS * 0.8), n_skip=2,
        rescale=False, eval_every=200, save_every=2000, log_every=100,
        # the random-init backbone's features are heavy-tailed; bare Adam
        # (the reference's choice, with PRETRAINED features) hits recurring
        # loss spikes here — clip the global grad norm
        grad_clip_norm=1.0,
    ),
    rl=cfg.rl.replace(batch_size=2500, max_path_length=50, n_envs=50, n_iters=8,
                      init_std=10.0, snapshot_mode="all"),
    reward=cfg.reward.replace(mode="oursinception", scale=1.0, skip=1),
)

timings = {}
expert = load_expert(EXPERT)

# -- stage 1: 299x299 demo videos (batched raycast recording) ---------------
video_dir = os.path.join(LOG, "videos")
import glob

if len(glob.glob(os.path.join(video_dir, "*.mp4"))) < N_DEMOS:
    t0 = time.time()
    generate_demo_videos_vec(
        "striker", expert, video_dir, N_DEMOS, horizon=cfg.env.horizon, seed=0,
        env_overrides=dict(
            scene_overrides(cfg.env), image_size=HW, render_size=cfg.env.render_size
        ),
        n_envs=20, frame_backend="tpu",
    )
    timings["demo_record_s"] = round(time.time() - t0, 1)
else:
    print("stage 1: demo videos already recorded, skipping")

# -- stage 2: decode + Mixed_7c feature extraction --------------------------
# uint8 frames [T, N, 299, 299, 3] (rescale=False feeds the backbone raw,
# train_script.py:100-116)
frames = build_video_dataset(
    os.path.join(video_dir, "*.mp4"), image_size=HW, n_videos=N_DEMOS,
    video_len=cfg.env.horizon + 1, n_skip=cfg.train.n_skip, rescale=False,
    seed=0, cache_path=os.path.join(LOG, "frames_u8.npy"),
)
feature_fn = make_inception_feature_fn(layer="Mixed_7c", input_size=HW)
feat_cache = os.path.join(LOG, "feats_mixed7c.npy")
T, N = frames.shape[:2]
feat_vdata = None
if os.path.exists(feat_cache):
    cached = np.load(feat_cache)
    # validate against the CURRENT demo set — a cached array recorded under a
    # different N_DEMOS/HW/n_skip would silently feed a mismatched dataset
    if cached.shape[:2] == frames.shape[:2]:
        feat_vdata = cached
        print(f"stage 2: cached Mixed_7c features {feat_vdata.shape}, skipping")
    else:
        print(
            f"stage 2: cached features {cached.shape[:2]} do not match the "
            f"demo set {frames.shape[:2]} — recomputing"
        )
if feat_vdata is None:
    t0 = time.time()
    feats = []
    for t in range(T):
        feats.append(np.asarray(feature_fn(frames[t]), np.float32))
    feat_vdata = np.stack(feats)  # [T, N, 8, 8, 2048]
    timings["featurize_s"] = round(time.time() - t0, 1)
    timings["backbone_fps"] = round(T * N / timings["featurize_s"], 1)
    np.save(feat_cache, feat_vdata)
    print(f"Mixed_7c features {feat_vdata.shape} in {timings['featurize_s']}s "
          f"({timings['backbone_fps']} frames/s through the 299x299 backbone)")

# -- feature-scale anchor ----------------------------------------------------
# With the random-init backbone, Mixed_7c magnitudes explode multiplicatively
# through ~17 conv layers (observed losses ~1e22 unnormalized). Normalize by
# the demo set's global RMS — a pure rescaling (with pretrained weights the
# scale is ~O(1) and this is a near-no-op), applied identically to the demo
# features AND the agent's frames at scoring time so both sides of the
# reward comparison live in the same scale.
feat_rms = float(np.sqrt(np.mean(np.square(feat_vdata, dtype=np.float64))))
assert np.isfinite(feat_rms) and feat_rms > 0, f"degenerate Mixed_7c scale {feat_rms}"
print(f"Mixed_7c scale: rms={feat_rms:.4g} max|f|={np.abs(feat_vdata).max():.4g}")
feat_vdata = (feat_vdata / feat_rms).astype(np.float32)
_raw_feature_fn = feature_fn
feature_fn = lambda x: _raw_feature_fn(x) / feat_rms

# -- stage 3: ContextFeat training in feature space -------------------------
t0 = time.time()
trainer = run_translation_training(cfg, video_glob="", vdata=feat_vdata, resume=True)
timings["translation_s"] = round(time.time() - t0, 1)

# -- stage 4: TRPO with oursinception reward --------------------------------
# held-out demos ship as uint8 frames; the engine routes them (and the
# agent's frames) through the backbone at warmup/scoring (base.py:211-215)
n_train = cfg.train.n_train
t0 = time.time()
policy, history = run_visual_trpo(
    cfg, params=trainer.state.params, demo_data=frames[:, n_train:],
    feature_fn=feature_fn,
)
timings["rl_s"] = round(time.time() - t0, 1)

best = max(h["ReturnTrue"] for h in history)
summary = dict(
    timings=timings,
    feat_shape=list(feat_vdata.shape),
    feat_rms=feat_rms,
    first=history[0]["ReturnTrue"],
    last=history[-1]["ReturnTrue"],
    best=best,
)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary, indent=1))

with open(os.path.join(LOG, "NOTES.md"), "w") as f:
    f.write(f"""# strike-inception (BASELINE config 4) — 299x299 Mixed_7c pipeline

Reference: run_train_strike_inception.py:39-43 + run_trpo_inception.py:70-173.
Every shape/transfer/kernel is the real config's: 299x299 demos -> Inception-v3
Mixed_7c [8, 8, 2048] -> ContextFeat translation in feature space -> TRPO with
`oursinception` reward (agent frames routed through the backbone at scoring).

**Caveat — random-init backbone.** No pretrained slim checkpoint exists in this
image (converter + restore are proven in tests/test_inception.py; drop an
`inception_v3.npz` into data/ to make features pretrained). This run therefore
demonstrates the PIPELINE at its real shape, not ImageNet-feature translation
quality. Features are anchored by the demo set's global RMS
({feat_rms:.4g}, applied identically to demo features and agent frames) —
unnormalized, the random backbone's magnitudes blow losses to ~1e22.

Result: first {summary['first']:.3f} -> best {best:.3f} over {len(history)} TRPO iterations
(batch {cfg.rl.batch_size}); timings in summary.json.
""")
