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
    grad_clip: float = 1.0,
    seed: int = 0,
    n_valid_videos: int = 0,
    steps_per_call: int = 50,
    calib_batch: int = 64,
    calib_passes: int = 60,
    compute_dtype: str = "bfloat16",
    log_every: int = 100,
    logger=None,
) -> tuple[Any, dict]:
    """Pretrain an InceptionV3 on ``frames_u8 [T, N, H, W, 3]`` demo frames.

    Returns ``(backbone_params, metrics)`` where metrics include the final
    train/valid pretext accuracy (chance = 1/T). The last ``n_valid_videos``
    videos are held out of training and scored for the valid accuracy.
    """
    log = logger or get_logger()
    T, N = frames_u8.shape[:2]
    if frames_u8.dtype != np.uint8:
        raise ValueError(f"frames must be uint8, got {frames_u8.dtype}")
    n_train = N - n_valid_videos
    if n_train <= 0:
        raise ValueError(f"n_valid_videos={n_valid_videos} >= dataset N={N}")
    comp = jnp.dtype(compute_dtype)

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

    tx = optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(learning_rate))
    state = {"params": params, "head": head}
    opt_state = tx.init(state)

    # device-resident uint8 training frames; batches gather + decode in-step.
    # MUST be a jit ARGUMENT, not a closure capture: a closed-over array is
    # baked into the program as a constant and ships in the relay's compile
    # request body, which is size-bounded — 60 demos at 299x299 (~420 MB)
    # gets HTTP 413 from /remote_compile (observed live; cf. the reward
    # engine's IFO_TPU_MAX_BAKED_PARAM_MB fallback and train/trainer.py,
    # which passes its device dataset as an argument for the same reason)
    data = jnp.asarray(frames_u8[:, :n_train])

    def logits_fn(p, frames):
        feats = model.apply(p["params"], frames, features_only=True)[layer]
        pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        return pooled @ p["head"]["w"] + p["head"]["b"]

    def loss_fn(p, frames, labels):
        logits = logits_fn(p, frames)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return jnp.mean(ce), acc

    def one_step(state, opt_state, step, data):
        key = jax.random.fold_in(jax.random.key(seed + 2), step)
        kt, kn = jax.random.split(key)
        ts = jax.random.randint(kt, (batch,), 0, T)
        ns = jax.random.randint(kn, (batch,), 0, n_train)
        frames = preprocess_uint8(data[ts, ns]).astype(comp)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(state, frames, ts)
        updates, opt_state = tx.update(grads, opt_state)
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

    t0 = time.perf_counter()
    loss = acc = float("nan")
    total = -(-n_steps // K) * K  # round UP — never silently under-train
    log_calls = max(1, log_every // K)
    for call, step0 in enumerate(range(0, total, K)):
        state, opt_state = train_steps(state, opt_state, jnp.asarray(step0), data)
        if (call + 1) % log_calls == 0 or step0 + K >= total:
            loss_d, acc_d = probe_metrics(state, jnp.asarray(step0 + K), data)
            loss, acc = float(loss_d), float(acc_d)
            log.log(f"pretrain {step0 + K}/{total} ce={loss:.3f} acc={acc:.3f}")
    train_s = time.perf_counter() - t0
    n_steps = total

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
    if n_valid_videos:
        @jax.jit
        def eval_batch(state, frames, labels):
            logits = logits_fn(state, frames)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            hit = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            return ce, hit

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
        metrics["valid_ce"] = float(np.concatenate(ces)[:n_real].mean())
        metrics["valid_acc"] = float(np.concatenate(hits)[:n_real].mean())
        log.log(
            f"pretrain valid: ce={metrics['valid_ce']:.3f} "
            f"acc={metrics['valid_acc']:.3f} (chance {1.0 / T:.3f})"
        )
    return state["params"], metrics
