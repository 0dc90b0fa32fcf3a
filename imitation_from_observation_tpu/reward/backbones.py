"""Pretrained-backbone feature functions for the inception reward modes.

The reference restores TF-slim Inception-v3 from ``model/inception_v3.ckpt``
and reads one endpoint (base.py:77-111, layer from config). Here the backbone
is the flax :class:`InceptionV3`; weights load from an npz export of that
checkpoint, or random-init for testing. The returned callable is a jitted
uint8-frames -> feature-maps map, used as ``VisualRewardEngine(feature_fn=...)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from imitation_from_observation_tpu.models.inception_v3 import (
    InceptionV3,
    load_tf_slim_npz,
    preprocess_uint8,
)


def make_inception_feature_fn(
    layer: str = "Mixed_7c",
    params: Any = None,
    npz_path: str | None = None,
    input_size: tuple[int, int] | None = None,
    seed: int = 0,
    chunk: int = 64,
    pipeline_mesh=None,
    out_scale: float = 1.0,
    fetch_dtype: str | None = None,
):
    """Build a jitted ``uint8 frames [B, H, W, 3] -> features`` function.

    Calls are processed in fixed ``chunk``-frame slices (last slice padded —
    ONE compiled shape): at 299x299 the early-layer activations are ~10 MB
    per frame, so an unchunked RL scoring batch (P*T = 1,250 frames) would
    blow HBM; 64-frame programs are the proven-working featurize shape.

    The returned callable also carries ``chunk_fn`` / ``chunk`` attributes:
    ``chunk_fn`` is the underlying jitted fixed-shape device map (uint8
    [chunk, H, W, 3] on device -> features ON DEVICE, params baked). The
    reward engine's device-resident scoring path chains it so RL frames go
    raycast -> backbone -> translation encoder without ever touching the
    host — the host path here (uint8 in, np features out) round-trips
    ~1 MB/frame of Mixed_7c activations over the relay, which at RL scoring
    scale (1,250+ frames/iteration) was the dominant reward-eval cost.

    ``out_scale`` is fused into the jit (the pipeline's feature-RMS anchor,
    exp/inception_pipeline.py — a multiply XLA folds into the last op).

    ``pipeline_mesh``: a ``(pipe,)`` mesh (``parallel.make_mesh_pipe``) runs
    the backbone pipeline-parallel instead — stage-sharded params, chunks
    streamed as GPipe microbatches (``parallel/pp.py``). Requires
    ``input_size`` (the pipeline compiles per static shape) and
    ``layer='Mixed_7c'``-style trunk endpoints."""
    model = InceptionV3(final_endpoint=layer)
    if params is None:
        size = input_size or (299, 299)
        x = jnp.zeros((1, *size, 3), jnp.float32)
        if npz_path:
            like = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
            params = load_tf_slim_npz(npz_path, like)
        else:
            params = model.init(jax.random.key(seed), x)

    if pipeline_mesh is not None:
        from imitation_from_observation_tpu.parallel.pp import InceptionPipeline

        if input_size is None:
            raise ValueError("pipeline_mesh requires input_size (static shapes)")
        pipe = InceptionPipeline(
            model, params, input_hw=tuple(input_size),
            final_endpoint=layer, mesh=pipeline_mesh,
            micro_batch=min(chunk, 8),
        )

        def pipeline_feature_fn(frames_u8):
            import numpy as np

            # preprocess_uint8's formula, host-side (pp pads/reshapes on host)
            x = np.asarray(frames_u8).astype(np.float32) / 255.0 * 2.0 - 1.0
            return pipe.features(x) * out_scale if out_scale != 1.0 else pipe.features(x)

        return pipeline_feature_fn

    @jax.jit
    def _chunk_fn(frames_u8):
        x = preprocess_uint8(frames_u8)
        ep = model.apply(params, x, features_only=True)
        f = ep[layer]
        return f * jnp.float32(out_scale) if out_scale != 1.0 else f

    # ``fetch_dtype='bfloat16'`` narrows ONLY the host-path fetch: Mixed_7c
    # at 299x299 is ~0.5 MB/frame f32 and the relay's d2h transfer dominates
    # bulk featurization (observed 2.2 frames/s at smoke scale) — halving the
    # bytes halves the stage. chunk_fn (the engine's on-device scoring path)
    # stays f32; downstream training stores device data in bf16 anyway.
    if fetch_dtype is not None:
        _fetch_dt = jnp.dtype(fetch_dtype)
        _fetch_fn = jax.jit(lambda u8: _chunk_fn(u8).astype(_fetch_dt))
    else:
        _fetch_fn = _chunk_fn

    def feature_fn(frames_u8):
        import numpy as np

        frames_u8 = np.asarray(frames_u8)
        n = frames_u8.shape[0]
        if n <= chunk:
            pad = chunk - n
            if pad:
                frames_u8 = np.concatenate(
                    [frames_u8, np.repeat(frames_u8[-1:], pad, axis=0)]
                )
            return _fetch_fn(jnp.asarray(frames_u8))[:n]
        outs = []
        for s in range(0, n, chunk):
            outs.append(np.asarray(feature_fn(frames_u8[s : s + chunk])))
        return np.concatenate(outs)

    feature_fn.chunk_fn = _chunk_fn  # device-resident fixed-shape map
    feature_fn.chunk = chunk
    feature_fn.params = params  # resolved tree, for scale-anchored rebuilds
    return feature_fn


def compute_expert_feature_stats(
    env, expert_policy, feature_fn, n_rollouts: int = 20, max_path_length: int = 50, seed: int = 0
):
    """Expert backbone-activation statistics for the ``inceptionsame`` mode
    (base.py:93-111): roll the expert out ``n_rollouts`` times, extract the
    per-frame activations of the rendered frames, return (mean, std) over
    rollouts, each [T, ...feature dims]."""
    import numpy as np

    from imitation_from_observation_tpu.core.rng import RngStream
    from imitation_from_observation_tpu.rl.sampler import rollout

    rng = RngStream(seed)
    all_feats = []
    for _ in range(n_rollouts):
        path = rollout(env, expert_policy, max_path_length, rng)
        frames = np.stack([f[0] for f in path["env_infos"]["frames"] if f is not None])
        all_feats.append(np.asarray(feature_fn(frames)))
    stacked = np.stack(all_feats)  # [R, T, ...]
    return stacked.mean(axis=0), stacked.std(axis=0)


def classify_sanity_check(params, image_u8, top_k: int = 20):
    """The reference's startup sanity check: classify an image and report the
    top class ids and their logits (the 'bird.jpg' check at base.py:86-89)."""
    import numpy as np

    model = InceptionV3()
    logits, _ = model.apply(params, preprocess_uint8(jnp.asarray(image_u8[None])))
    logits = np.asarray(logits)[0]
    top = np.argsort(logits)[-top_k:]
    return top, logits[top]


def restore_sanity_check(npz_path: str, image_u8=None, top_k: int = 5):
    """Validate a converted checkpoint restores cleanly end-to-end: load all
    variables into the full classifier graph (any missing/mismatched tensor
    raises), classify an image, and return the top-k class ids. With real
    pretrained weights and a bird photo this reproduces the reference's
    startup check verbatim; the deterministic fallback image at least proves
    restore + forward produce finite logits."""
    import numpy as np

    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    like = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    params = load_tf_slim_npz(npz_path, like)
    if image_u8 is None:
        g = np.linspace(0, 255, 299, dtype=np.uint8)
        image_u8 = np.stack(np.broadcast_arrays(g[:, None], g[None, :], g[:, None]), -1)
    top, top_logits = classify_sanity_check(params, np.asarray(image_u8, np.uint8), top_k=top_k)
    if not np.all(np.isfinite(top_logits)):
        raise ValueError("restored backbone produced non-finite logits")
    return top
