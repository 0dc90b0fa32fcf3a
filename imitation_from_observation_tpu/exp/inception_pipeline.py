"""The 299x299 Inception-feature pipeline (BASELINE config 4), reusable.

Reference: sandbox/andrew/run_train_strike_inception.py:39-43 +
run_trpo_inception.py:70-173 — 299x299 demo frames -> Inception-v3 Mixed_7c
[8, 8, 2048] feature maps -> ContextAEInception2 (our ContextFeat) trained in
feature space -> TRPO with mode ``oursinception`` (agent frames routed
through the backbone before scoring).

The backbone is pluggable: random-init (the committed
``strike_inception_demo`` run — plumbing at the real shape), an in-image
self-supervised pretrain (``exp.pretrain_backbone``), or a real slim
checkpoint npz if one is ever dropped into data/. Each stage resumes past
completed artifacts; caches are validated against the current demo set.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Any

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.core.relay_coord import hold_for_bench
from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos_vec
from imitation_from_observation_tpu.exp.launchers import (
    run_translation_training,
    run_visual_trpo,
    sample_rl_context,
    scene_overrides,
)
from imitation_from_observation_tpu.exp.train_expert import load_expert
from imitation_from_observation_tpu.reward.backbones import make_inception_feature_fn
from imitation_from_observation_tpu.video.dataset import build_video_dataset


def run_strike_inception(
    log_dir: str,
    expert_npz: str,
    *,
    n_demos: int = 60,
    hw: tuple[int, int] = (299, 299),
    backbone_params: Any = None,
    backbone_npz: str | None = None,
    backbone_tag: str = "randominit",
    video_dir: str | None = None,
    frames_cache: str | None = None,
    rl_iters: int = 8,
    rl_batch_size: int = 2500,
    rl_n_envs: int = 50,
    rl_context: dict | None = None,
    translation_iters: int | None = None,
    notes_caveat: str = "",
) -> dict:
    """Run config 4 end-to-end into ``log_dir``; returns the summary dict.

    ``video_dir``/``frames_cache`` default inside ``log_dir`` but can point at
    another run's demo recordings (the 299x299 demos don't depend on the
    backbone). The Mixed_7c feature cache is keyed by ``backbone_tag`` so runs
    with different backbones never share features.
    """
    cfg = preset("strike_inception")
    cfg = cfg.replace(
        name=os.path.basename(log_dir.rstrip("/")),
        log_dir=log_dir,
        env=cfg.env.replace(horizon=50, frame_backend="tpu", image_size=hw),
        # reference: batch 25, nlen 25 (skip 2), run_train_strike_inception.py:39-43
        train=cfg.train.replace(
            batch_size=25, n_videos=n_demos, n_train=int(n_demos * 0.8), n_skip=2,
            rescale=False, eval_every=500, save_every=5000, log_every=500,
            **({} if translation_iters is None else {"n_iters": translation_iters}),
            # heavy-tailed feature losses (random/selfsup backbones) hit
            # recurring spikes under bare Adam (the reference's choice, with
            # PRETRAINED features) — clip the global grad norm
            grad_clip_norm=1.0,
            # the relay re-ships the device dataset ARGUMENT every fused call
            # (CLAUDE.md): at 500 demos the feature tensor is 6.5 GB f32 —
            # amortize with 500-step fused calls and bf16 storage (3.3 GB;
            # batches widen to f32 in-step)
            steps_per_call=500,
            device_data_dtype="bfloat16",
        ),
        # reference RL shape: batch 50*250, n_itr 200 (run_trpo_inception.py:201-209);
        # the proof-of-pipeline default stays small, the at-scale driver passes
        # rl_batch_size=12500, rl_iters>=150
        rl=cfg.rl.replace(batch_size=rl_batch_size, max_path_length=50,
                          n_envs=rl_n_envs, n_iters=rl_iters, init_std=10.0,
                          snapshot_mode="all"),
        reward=cfg.reward.replace(mode="oursinception", scale=1.0, skip=1),
    )

    timings: dict = {}
    # log_dir must exist before stage 2's feature-cache np.save: when
    # video_dir points at ANOTHER run's recordings nothing below creates it
    os.makedirs(log_dir, exist_ok=True)
    expert = load_expert(expert_npz)

    # -- stage 1: 299x299 demo videos (batched raycast recording) -----------
    video_dir = video_dir or os.path.join(log_dir, "videos")
    if len(glob.glob(os.path.join(video_dir, "*.mp4"))) < n_demos:
        t0 = time.time()
        generate_demo_videos_vec(
            "striker", expert, video_dir, n_demos, horizon=cfg.env.horizon, seed=0,
            env_overrides=dict(
                scene_overrides(cfg.env), image_size=hw, render_size=cfg.env.render_size
            ),
            n_envs=20, frame_backend="tpu",
        )
        timings["demo_record_s"] = round(time.time() - t0, 1)
    else:
        print("stage 1: demo videos already recorded, skipping")

    # -- stage 2: decode + Mixed_7c feature extraction -----------------------
    # uint8 frames [T, N, 299, 299, 3] (rescale=False feeds the backbone raw,
    # train_script.py:100-116)
    frames = build_video_dataset(
        os.path.join(video_dir, "*.mp4"), image_size=hw, n_videos=n_demos,
        video_len=cfg.env.horizon + 1, n_skip=cfg.train.n_skip, rescale=False,
        seed=0, cache_path=frames_cache or os.path.join(log_dir, "frames_u8.npy"),
    )
    # bulk featurization fetches bf16 (halves the dominant d2h transfer;
    # training stores device data bf16 anyway). The anchored SCORING
    # feature_fn rebuilt below stays f32 on its device path.
    feature_fn = make_inception_feature_fn(
        layer="Mixed_7c", params=backbone_params, npz_path=backbone_npz, input_size=hw,
        fetch_dtype="bfloat16",
    )
    feat_cache = os.path.join(log_dir, f"feats_mixed7c_{backbone_tag}.npy")
    legacy_cache = os.path.join(log_dir, "feats_mixed7c.npy")
    if backbone_tag == "randominit" and not os.path.exists(feat_cache) and os.path.exists(legacy_cache):
        feat_cache = legacy_cache  # the committed round-4 run predates tags
    T, N = frames.shape[:2]
    feat_vdata = None
    if os.path.exists(feat_cache):
        cached = np.load(feat_cache)
        # validate against the CURRENT demo set — a cached array recorded
        # under a different N_DEMOS/HW/n_skip would silently feed a
        # mismatched dataset
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
            t0 += hold_for_bench()
            feats.append(np.asarray(feature_fn(frames[t]), np.float32))
        feat_vdata = np.stack(feats)  # [T, N, 8, 8, 2048]
        timings["featurize_s"] = round(time.time() - t0, 1)
        timings["backbone_fps"] = round(T * N / timings["featurize_s"], 1)
        np.save(feat_cache, feat_vdata)
        print(f"Mixed_7c features {feat_vdata.shape} in {timings['featurize_s']}s "
              f"({timings['backbone_fps']} frames/s through the 299x299 backbone)")

    # -- feature-scale anchor -------------------------------------------------
    # With a random-init backbone, Mixed_7c magnitudes explode multiplicatively
    # through ~17 conv layers (observed losses ~1e22 unnormalized). Normalize by
    # the demo set's global RMS — a pure rescaling (with calibrated/pretrained
    # weights the scale is ~O(1) and this is a near-no-op), applied identically
    # to the demo features AND the agent's frames at scoring time so both sides
    # of the reward comparison live in the same scale.
    feat_rms = float(np.sqrt(np.mean(np.square(feat_vdata, dtype=np.float64))))
    assert np.isfinite(feat_rms) and feat_rms > 0, f"degenerate Mixed_7c scale {feat_rms}"
    print(f"Mixed_7c scale: rms={feat_rms:.4g} max|f|={np.abs(feat_vdata).max():.4g}")
    feat_vdata = (feat_vdata / feat_rms).astype(np.float32)
    # rebuild with the anchor FUSED into the jit (a lambda wrapper would hide
    # chunk_fn and force the engine back onto the host feature round trip)
    feature_fn = make_inception_feature_fn(
        layer="Mixed_7c", params=feature_fn.params, input_size=hw,
        out_scale=1.0 / feat_rms,
    )

    # -- stage 3: ContextFeat training in feature space ----------------------
    # resume is only valid when the existing checkpoint was trained at the
    # SAME feature-scale anchor: a checkpoint trained on differently-scaled
    # features (different backbone/demo set under the same log_dir) would
    # silently mis-score every reward. The anchor is recorded in a sidecar.
    anchor_path = os.path.join(log_dir, "translation", "feat_anchor.json")
    resume = False
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            prev_rms = float(json.load(f)["feat_rms"])
        resume = abs(prev_rms - feat_rms) <= 1e-6 * max(prev_rms, feat_rms)
        if not resume:
            print(
                f"stage 3: checkpoint anchor rms={prev_rms:.6g} != current "
                f"{feat_rms:.6g} — retraining from scratch"
            )
    # write the anchor BEFORE training: it describes the dataset (known
    # now), and writing it after meant a killed run left no anchor — the
    # retry then failed the resume gate and re-trained from step 0 even
    # though partial checkpoints were on disk
    os.makedirs(os.path.dirname(anchor_path), exist_ok=True)
    with open(anchor_path, "w") as f:
        json.dump({"feat_rms": feat_rms}, f)
    t0 = time.time()
    trainer = run_translation_training(cfg, video_glob="", vdata=feat_vdata, resume=resume)
    timings["translation_s"] = round(time.time() - t0, 1)

    # -- stage 4: TRPO with oursinception reward ------------------------------
    # held-out demos ship as uint8 frames; the engine routes them (and the
    # agent's frames) through the backbone at warmup/scoring (base.py:211-215).
    # The RL scene is PINNED (the reference's fixed-context protocol,
    # rand_strike run_trpo_inception.py:150-165 draws once per experiment);
    # demo recording above keeps per-episode randomization.
    if rl_context is None:
        rl_context = sample_rl_context("strike", seed=0)
    rl_cfg = cfg.replace(env=cfg.env.replace(**rl_context))
    n_train = cfg.train.n_train
    t0 = time.time()
    # free the trainer's device residency before the RL stage: at 500 demos
    # the bf16 feature dataset (3.4 GB) + ContextFeat params + Adam moments
    # (~2.4 GB) are still alive on the 16 GB chip, and the engine's warmup
    # featurize + device-frame scoring OOMed on top of them (round 5). The
    # engine bakes params as jit constants, so a host copy serves fine.
    import gc

    import jax as _jax

    params_host = _jax.device_get(trainer.state.params)
    del trainer
    gc.collect()
    policy, history = run_visual_trpo(
        rl_cfg, params=params_host, demo_data=frames[:, n_train:],
        feature_fn=feature_fn,
    )
    timings["rl_s"] = round(time.time() - t0, 1)

    best = max(h["ReturnTrue"] for h in history)
    summary = dict(
        timings=timings,
        backbone=backbone_tag,
        rl_context={k: str(v) for k, v in rl_context.items()},
        rl_shape=dict(batch=rl_batch_size, n_iters=rl_iters, n_envs=rl_n_envs),
        feat_shape=list(feat_vdata.shape),
        feat_rms=feat_rms,
        first=history[0]["ReturnTrue"],
        last=history[-1]["ReturnTrue"],
        best=best,
        max_success=max(h.get("SuccessRate", 0.0) for h in history),
    )
    with open(os.path.join(log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))

    with open(os.path.join(log_dir, "NOTES.md"), "w") as f:
        f.write(f"""# strike-inception (BASELINE config 4) — 299x299 Mixed_7c pipeline

Reference: run_train_strike_inception.py:39-43 + run_trpo_inception.py:70-173.
Every shape/transfer/kernel is the real config's: 299x299 demos -> Inception-v3
Mixed_7c [8, 8, 2048] -> ContextFeat translation in feature space -> TRPO with
`oursinception` reward (agent frames routed through the backbone at scoring).

Backbone: **{backbone_tag}**.
{notes_caveat}
Features are anchored by the demo set's global RMS
({feat_rms:.4g}, applied identically to demo features and agent frames).

Result: first {summary['first']:.3f} -> best {best:.3f} over {len(history)} TRPO iterations
(batch {cfg.rl.batch_size}); timings in summary.json.
""")
    return summary
