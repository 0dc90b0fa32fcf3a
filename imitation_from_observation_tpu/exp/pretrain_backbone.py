"""In-image self-supervised pretraining for the Inception-v3 backbone.

The reference's inception reward modes restore an ImageNet-pretrained TF-slim
checkpoint (rllab/sampler/base.py:77-89); no such checkpoint exists in this
image. This module produces a MEANINGFUL backbone from the demo videos alone:

1. :func:`calibrate_bn` (models/inception_v3.py) writes observed batch
   statistics into every ConvBN's stored moving stats — random-init
   activations otherwise explode to ~1e8 RMS at Mixed_7c.
2. Time-index classification — the reference's own TimeSoftmax pretext
   (gym/envs/mujoco/arm_shaping.py:303, our ``zoo_variants.TimeClassifier``)
   applied to the backbone: pool the endpoint feature map, predict which of
   the T time buckets the frame came from, cross-entropy over frames drawn
   across demo videos. Because demo contexts (colors/viewpoint/distractors)
   are randomized per video while the motion is shared, features that solve
   the pretext must encode arm/object configuration and ignore appearance —
   exactly what the ``oursinception`` reward compares across domains.

Generalization controls (round 5 — the bare pretext overfit hard: train acc
0.594 vs valid 0.127 at 60 demos): in-jit augmentation (horizontal flip,
per-channel color jitter, random translation — the appearance nuisances the
downstream reward must ignore), AdamW weight decay, temporally-smoothed
targets (adjacent time buckets are near-duplicates physically; a hard
one-hot rewards memorizing appearance over reading configuration), and
early stopping on held-out cross-entropy with best-state restore.

The exported tree is the plain backbone params (head dropped), loadable by
``make_inception_feature_fn(params=...)``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imitation_from_observation_tpu.core.log import get_logger
from imitation_from_observation_tpu.models.inception_v3 import (
    InceptionV3,
    calibrate_bn,
    preprocess_uint8,
)


def pretrain_inception_time(
    frames_u8: np.ndarray,
    *,
    layer: str = "Mixed_7c",
    n_steps: int = 2000,
    batch: int = 32,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
    seed: int = 0,
    n_valid_videos: int = 0,
    steps_per_call: int = 50,
    calib_batch: int = 64,
    calib_passes: int = 60,
    compute_dtype: str = "bfloat16",
    augment: bool = True,
    translate_px: int = 12,
    time_smooth_sigma: float = 1.0,
    eval_every: int = 500,
    early_stop: bool = True,
    log_every: int = 100,
    logger=None,
) -> tuple[Any, dict]:
    """Pretrain an InceptionV3 on ``frames_u8 [T, N, H, W, 3]`` demo frames.

    Returns ``(backbone_params, metrics)`` where metrics include the final
    train/valid pretext accuracy (chance = 1/T). The last ``n_valid_videos``
    videos are held out of training and scored for the valid accuracy; with
    ``early_stop`` the returned params are the best-valid-CE iterate.
    """
    log = logger or get_logger()
    T, N = frames_u8.shape[:2]
    if frames_u8.dtype != np.uint8:
        raise ValueError(f"frames must be uint8, got {frames_u8.dtype}")
    n_train = N - n_valid_videos
    if n_train <= 0:
        raise ValueError(f"n_valid_videos={n_valid_videos} >= dataset N={N}")
    comp = jnp.dtype(compute_dtype)
    H, W = frames_u8.shape[2:4]

    model = InceptionV3(final_endpoint=layer)
    rng = np.random.default_rng(seed)

    # -- init + BN calibration on a context/time-diverse frame sample -------
    sample = jnp.asarray(preprocess_uint8(frames_u8[0, :1]))
    params = model.init(jax.random.key(seed), sample)
    ci = rng.integers(0, n_train, calib_batch)
    ct = rng.integers(0, T, calib_batch)
    calib = preprocess_uint8(jnp.asarray(frames_u8[ct, ci])).astype(comp)
    t0 = time.perf_counter()
    params = calibrate_bn(model, params, calib, n_passes=calib_passes)
    calib_s = time.perf_counter() - t0

    feat_dim = int(
        jax.eval_shape(lambda p, x: model.apply(p, x, features_only=True)[layer], params, sample)
        .shape[-1]
    )
    k_head = jax.random.key(seed + 1)
    head = {
        "w": jax.random.normal(k_head, (feat_dim, T), jnp.float32) * (1.0 / np.sqrt(feat_dim)),
        "b": jnp.zeros((T,), jnp.float32),
    }

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, weight_decay=weight_decay),
    )
    state = {"params": params, "head": head}
    opt_state = tx.init(state)

    # soft targets over time buckets: a frame at t is physically near its
    # neighbors, so CE against a Gaussian over |t'-t| (sigma in buckets)
    # stops the head from paying appearance-memorization to split
    # near-identical configurations
    if time_smooth_sigma > 0:
        d = np.arange(T)[None, :] - np.arange(T)[:, None]
        tgt = np.exp(-0.5 * (d / time_smooth_sigma) ** 2)
        target_rows = jnp.asarray(tgt / tgt.sum(axis=1, keepdims=True), jnp.float32)
    else:
        target_rows = jnp.eye(T, dtype=jnp.float32)

    # device-resident uint8 training frames; batches gather + decode in-step.
    # MUST be a jit ARGUMENT, not a closure capture: a closed-over array is
    # baked into the program as a constant and ships in the relay's compile
    # request body, which is size-bounded — 60 demos at 299x299 (~420 MB)
    # gets HTTP 413 from /remote_compile (observed live; cf. the reward
    # engine's IFO_TPU_MAX_BAKED_PARAM_MB fallback and train/trainer.py,
    # which passes its device dataset as an argument for the same reason)
    data = jnp.asarray(frames_u8[:, :n_train])

    def _augment(key, imgs):
        """Appearance-nuisance augmentation in [-1, 1] image space, all
        static-shape (flip via where, translate via pad + dynamic_slice)."""
        B = imgs.shape[0]
        kf, ks, kb, ko = jax.random.split(key, 4)
        flip = jax.random.bernoulli(kf, 0.5, (B,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
        s = jax.random.uniform(ks, (B, 1, 1, 3), minval=0.8, maxval=1.2)
        b = jax.random.uniform(kb, (B, 1, 1, 3), minval=-0.15, maxval=0.15)
        imgs = jnp.clip(imgs * s.astype(imgs.dtype) + b.astype(imgs.dtype), -1, 1)
        if translate_px > 0:
            m = translate_px
            padded = jnp.pad(imgs, ((0, 0), (m, m), (m, m), (0, 0)), mode="edge")
            off = jax.random.randint(ko, (B, 2), 0, 2 * m + 1)

            def crop(img, o):
                return jax.lax.dynamic_slice(img, (o[0], o[1], 0), (H, W, 3))

            imgs = jax.vmap(crop)(padded, off)
        return imgs

    def logits_fn(p, frames):
        feats = model.apply(p["params"], frames, features_only=True)[layer]
        pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        return pooled @ p["head"]["w"] + p["head"]["b"]

    def loss_fn(p, frames, labels):
        logits = logits_fn(p, frames)
        ce = optax.softmax_cross_entropy(logits, target_rows[labels])
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return jnp.mean(ce), acc

    def one_step(state, opt_state, step, data):
        key = jax.random.fold_in(jax.random.key(seed + 2), step)
        kt, kn, ka = jax.random.split(key, 3)
        ts = jax.random.randint(kt, (batch,), 0, T)
        ns = jax.random.randint(kn, (batch,), 0, n_train)
        frames = preprocess_uint8(data[ts, ns]).astype(comp)
        if augment:
            frames = _augment(ka, frames)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state, frames, ts)
        updates, opt_state = tx.update(grads, opt_state, state)
        return optax.apply_updates(state, updates), opt_state, loss, acc

    # fuse K optimizer steps per device call: the TPU relay re-ships argument
    # buffers every program call, and the ~90 MB backbone params change every
    # step — amortize exactly the way train/trainer.py's fused scan does
    K = max(1, min(steps_per_call, n_steps))

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(state, opt_state, step0, data):
        def body(carry, i):
            s, o, _, _ = one_step(carry[0], carry[1], step0 + i, data)
            return (s, o), None

        (state, opt_state), _ = jax.lax.scan(body, (state, opt_state), jnp.arange(K))
        return state, opt_state

    @jax.jit
    def probe_metrics(state, step, data):
        key = jax.random.fold_in(jax.random.key(seed + 2), step)
        kt, kn = jax.random.split(key)
        ts = jax.random.randint(kt, (batch,), 0, T)
        ns = jax.random.randint(kn, (batch,), 0, n_train)
        frames = preprocess_uint8(data[ts, ns]).astype(comp)
        return loss_fn(state, frames, ts)

    # -- held-out evaluation (shared by early stopping + final metrics) -----
    @jax.jit
    def eval_batch(state, frames, labels):
        logits = logits_fn(state, frames)
        # hard CE here: valid measures real time-discrimination, not fit to
        # the smoothed training target
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        hit = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        return ce, hit

    def eval_valid(state) -> tuple[float, float]:
        vi = np.repeat(np.arange(n_train, N), T)
        vt = np.tile(np.arange(T), n_valid_videos)
        # pad the index lists to a whole number of batches so eval_batch keeps
        # ONE compiled shape (a ragged final batch would recompile the whole
        # 299x299 backbone, ~80-110 s on TPU, to score a handful of frames);
        # per-example outputs let the host drop the pad rows exactly
        n_real = len(vi)
        pad = (-n_real) % batch
        if pad:
            vi = np.concatenate([vi, vi[:pad]])
            vt = np.concatenate([vt, vt[:pad]])
        ces, hits = [], []
        for s in range(0, len(vi), batch):
            idx_n, idx_t = vi[s : s + batch], vt[s : s + batch]
            frames = preprocess_uint8(jnp.asarray(frames_u8[idx_t, idx_n])).astype(comp)
            ce, hit = eval_batch(state, frames, jnp.asarray(idx_t))
            ces.append(np.asarray(ce))
            hits.append(np.asarray(hit))
        return (
            float(np.concatenate(ces)[:n_real].mean()),
            float(np.concatenate(hits)[:n_real].mean()),
        )

    t0 = time.perf_counter()
    loss = acc = float("nan")
    total = -(-n_steps // K) * K  # round UP — never silently under-train
    log_calls = max(1, log_every // K)
    eval_calls = max(1, eval_every // K)
    can_early_stop = early_stop and n_valid_videos > 0
    best = {"ce": np.inf, "step": 0, "state": None, "acc": float("nan")}
    for call, step0 in enumerate(range(0, total, K)):
        state, opt_state = train_steps(state, opt_state, jnp.asarray(step0), data)
        if (call + 1) % log_calls == 0 or step0 + K >= total:
            loss_d, acc_d = probe_metrics(state, jnp.asarray(step0 + K), data)
            loss, acc = float(loss_d), float(acc_d)
            log.log(f"pretrain {step0 + K}/{total} ce={loss:.3f} acc={acc:.3f}")
        if can_early_stop and ((call + 1) % eval_calls == 0 or step0 + K >= total):
            vce, vacc = eval_valid(state)
            log.log(
                f"pretrain valid @{step0 + K}: ce={vce:.3f} acc={vacc:.3f} "
                f"(best {best['ce']:.3f} @{best['step']})"
            )
            if vce < best["ce"]:
                # distinct buffers: train_steps donates its input state
                best = {
                    "ce": vce,
                    "acc": vacc,
                    "step": step0 + K,
                    "state": jax.tree_util.tree_map(jnp.copy, state),
                }
    train_s = time.perf_counter() - t0
    n_steps = total

    if can_early_stop and best["state"] is not None:
        state = best["state"]
        log.log(f"pretrain: restored best-valid iterate @{best['step']} (ce={best['ce']:.3f})")

    # re-calibrate the stored stats against the FINAL weights (training
    # shifted every layer's pre-BN distribution away from the init-time stats)
    params = calibrate_bn(model, state["params"], calib, n_passes=calib_passes)
    state["params"] = params

    metrics = dict(
        pretext_ce=loss,
        pretext_acc=acc,
        chance_acc=1.0 / T,
        calib_s=round(calib_s, 1),
        train_s=round(train_s, 1),
        steps_per_sec=round(n_steps / max(train_s, 1e-9), 2),
    )
    if can_early_stop:
        metrics["best_step"] = best["step"]
    if n_valid_videos:
        # final numbers re-measured AFTER the BN re-calibration (the stats the
        # exported backbone will actually serve with)
        metrics["valid_ce"], metrics["valid_acc"] = eval_valid(state)
        log.log(
            f"pretrain valid: ce={metrics['valid_ce']:.3f} "
            f"acc={metrics['valid_acc']:.3f} (chance {1.0 / T:.3f})"
        )
    return state["params"], metrics
