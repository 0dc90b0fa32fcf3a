"""Reward-engine tests: oracle splice, demo-translation cache, cost math
(golden-value vs a plain numpy re-computation), ablations, j^2 time weight."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import RewardConfig, TranslationModelConfig
from imitation_from_observation_tpu.models import build_model
from imitation_from_observation_tpu.reward import VisualRewardEngine

HW = 16
T = 4  # scored frames per path
MODEL_CFG = TranslationModelConfig(
    model="context_skip", image_size=(HW, HW), base_filters=8, feat_size=32
)


def _make_paths(n_paths=3, horizon=2 * T + 1, nvp=1, seed=0, with_frames=True):
    rng = np.random.default_rng(seed)
    paths = []
    for _ in range(n_paths):
        frames = [None] * horizon
        if with_frames:
            for j in range(T):
                frames[2 * j + 1] = rng.integers(0, 255, (nvp, HW, HW, 3), dtype=np.uint8)
        reward_true = np.zeros(horizon)
        reward_true[-1] = -0.5
        paths.append(
            dict(
                rewards=np.zeros(horizon),
                env_infos={"frames": frames, "reward_true": reward_true},
            )
        )
    return paths


def test_oracle_mode():
    eng = VisualRewardEngine(RewardConfig(mode="oracle"))
    paths = _make_paths(with_frames=False)
    eng.process(paths)
    assert paths[0]["rewards"][-1] == -0.5
    assert paths[0]["rewards"][:-1].sum() == 0


def test_none_mode_noop():
    eng = VisualRewardEngine(RewardConfig(mode="none"))
    paths = _make_paths()
    eng.process(paths)
    assert np.all(paths[0]["rewards"] == 0)


def _engine_and_params(ablation="none", scale=0.7, n_demos=6):
    rng = np.random.default_rng(1)
    demo = rng.uniform(-1, 1, (T, n_demos, HW, HW, 3)).astype(np.float32)
    model = build_model(MODEL_CFG)
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    eng = VisualRewardEngine(
        RewardConfig(mode="ours", ablation=ablation, scale=scale),
        MODEL_CFG,
        params=params,
        demo_data=demo,
        chunk_videos=4,  # force multi-chunk warmup
    )
    return eng, params, demo, model


def test_ours_mode_matches_numpy_recomputation():
    eng, params, demo, model = _engine_and_params()
    paths = _make_paths(n_paths=2, seed=2)
    eng.process(paths)

    # -- independent numpy recomputation ----------------------------------
    ctx_frame = paths[0]["env_infos"]["frames"][1][0]  # first rendered frame, vp 0
    ctx = ctx_frame.astype(np.float32) / 127.5 - 1.0
    zs, outs = [], []
    for i in range(demo.shape[1]):
        src = jnp.asarray(demo[:, i])
        z, out = model.apply(params, src, jnp.broadcast_to(jnp.asarray(ctx), src.shape), method="translate")
        zs.append(np.asarray(z))
        outs.append(np.asarray(out))
    means = np.mean(zs, axis=0)
    mimgs = np.mean(outs, axis=0)

    p = paths[1]
    frames = np.stack([f for f in p["env_infos"]["frames"] if f is not None])  # [T,1,H,W,C]
    x = frames[:, 0].astype(np.float32) / 127.5 - 1.0
    feats = np.asarray(model.apply(params, jnp.asarray(x), method="encode"))
    costs = np.sum((means - feats) ** 2, axis=1) + 0.7 * np.sum(
        (mimgs - x) ** 2, axis=(1, 2, 3)
    )
    expected = np.zeros(2 * T + 1)
    for j in range(T):
        expected[2 * j + 1] = -costs[j] * j**2
    np.testing.assert_allclose(p["rewards"], expected, rtol=2e-4, atol=1e-3)


def test_bf16_inference_matches_f32():
    """The TPU scoring path runs the frozen-params nets in bfloat16 (engine
    inference_dtype='auto'); rewards must stay close to the f32 path — this
    is the golden-value gate for the bf16 harvest (costs reduce in f32
    either way)."""
    rng = np.random.default_rng(1)
    demo = rng.uniform(-1, 1, (T, 6, HW, HW, 3)).astype(np.float32)
    model = build_model(MODEL_CFG)
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    rewards = {}
    for dt in ("float32", "bfloat16"):
        eng = VisualRewardEngine(
            RewardConfig(mode="ours", scale=0.7),
            MODEL_CFG,
            params=params,
            demo_data=demo,
            inference_dtype=dt,
        )
        paths = _make_paths(n_paths=3, seed=2)
        eng.process(paths)
        rewards[dt] = np.stack([p["rewards"] for p in paths])
    f32, bf16 = rewards["float32"], rewards["bfloat16"]
    scale = np.abs(f32).max()
    assert scale > 0
    # bf16 has ~3 significant digits; costs are sums of squares so relative
    # error stays ~1e-2 — far below reward-signal scale
    np.testing.assert_allclose(bf16, f32, atol=0.05 * scale, rtol=0.05)
    # reward ORDERING across paths (what TRPO consumes) must be preserved
    tot_f32, tot_bf16 = f32.sum(axis=1), bf16.sum(axis=1)
    assert list(np.argsort(tot_f32)) == list(np.argsort(tot_bf16))


def test_warmup_cached_across_iterations():
    eng, *_ = _engine_and_params()
    eng.process(_make_paths(seed=3))
    means_first = [m.copy() for m in eng.means]
    eng.process(_make_paths(seed=4))  # different rollouts, same cache
    for a, b in zip(means_first, eng.means):
        np.testing.assert_array_equal(a, b)


def test_ablations_differ():
    paths_by_abl = {}
    for abl in ["none", "nofeat", "noimage", "recon"]:
        eng, *_ = _engine_and_params(ablation=abl)
        paths = _make_paths(n_paths=1, seed=5)
        eng.process(paths)
        paths_by_abl[abl] = paths[0]["rewards"].copy()
    # noimage = pure latent term: small (tiny-init latents) but nonzero
    assert np.any(paths_by_abl["noimage"] != 0)
    assert not np.allclose(paths_by_abl["none"], paths_by_abl["noimage"])
    # none = noimage-term + nofeat-term (same scale)
    np.testing.assert_allclose(
        paths_by_abl["none"], paths_by_abl["nofeat"] + paths_by_abl["noimage"], rtol=1e-3, atol=1e-3
    )


def test_j_squared_time_weighting():
    """Even with constant per-frame cost, splice grows ~ j^2."""
    eng, *_ = _engine_and_params()
    paths = _make_paths(n_paths=1, seed=6)
    eng.process(paths)
    r = paths[0]["rewards"]
    assert r[1] == 0.0  # j=0 -> weight 0
    assert all(r[2 * j + 1] <= 0 for j in range(T))
    assert abs(r[2 * (T - 1) + 1]) > abs(r[3])  # grows with j


def test_multi_viewpoint_costs_sum():
    rng = np.random.default_rng(7)
    demo = rng.uniform(-1, 1, (T, 4, HW, HW, 3)).astype(np.float32)
    model = build_model(MODEL_CFG)
    x = jnp.zeros((1, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    eng = VisualRewardEngine(
        RewardConfig(mode="ours"), MODEL_CFG, params=params, demo_data=demo, n_viewpoints=2
    )
    paths = _make_paths(n_paths=1, nvp=2, seed=8)
    eng.process(paths)
    assert len(eng.means) == 2
    assert paths[0]["rewards"][3] < 0


def test_oursinception_mode_smoke():
    """oursinception: frames route through a backbone into feature space,
    ContextFeat translates there (base.py:122-137). Tiny backbone-ish
    feature_fn + tiny ContextFeat keep it CPU-fast."""
    F_HW, F_C = 4, 32
    n_demo = 3

    def feature_fn(frames_u8):  # stand-in backbone: avg-pool + channel tile
        x = jnp.asarray(frames_u8, jnp.float32) / 255.0 * 2 - 1
        x = x.reshape(x.shape[0], F_HW, HW // F_HW, F_HW, HW // F_HW, 3).mean(axis=(2, 4))
        return jnp.tile(x, (1, 1, 1, F_C // 3 + 1))[..., :F_C]

    model_cfg = TranslationModelConfig(
        model="context_feat",
        strides=(1, 2, 1, 2),
        kernels=(3, 3, 3, 3),
        filters=(16, 16, 8, 8),
        feat_size=16,
        feature_hw=(F_HW, F_HW),
        feature_channels=F_C,
    )
    model = build_model(model_cfg)  # config carries the feature-map shape
    x = jnp.zeros((1, F_HW, F_HW, F_C), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    rng = np.random.default_rng(0)
    demo_u8 = rng.integers(0, 255, (T, n_demo, HW, HW, 3), dtype=np.uint8)
    eng = VisualRewardEngine(
        RewardConfig(mode="oursinception", scale=0.01),
        model_cfg,
        params=params,
        demo_data=demo_u8,
        feature_fn=feature_fn,
    )
    paths = _make_paths(n_paths=2, seed=9)
    eng.process(paths)
    assert paths[0]["rewards"][3] < 0  # costs spliced
    assert eng.means[0].shape == (T, 16)
    assert eng.imgs[0].shape == (T, F_HW, F_HW, F_C)


def _fake_backbone(chunk=4, F_HW=4, F_C=32):
    """A feature_fn shaped like make_inception_feature_fn's return: jitted
    fixed-chunk device map exposed as ``chunk_fn`` + host wrapper."""
    import jax as _jax

    @_jax.jit
    def chunk_fn(frames_u8):
        x = jnp.asarray(frames_u8, jnp.float32) / 255.0 * 2 - 1
        x = x.reshape(x.shape[0], F_HW, HW // F_HW, F_HW, HW // F_HW, 3).mean(axis=(2, 4))
        return jnp.tile(x, (1, 1, 1, F_C // 3 + 1))[..., :F_C]

    def feature_fn(frames_u8):
        frames_u8 = np.asarray(frames_u8)
        n = len(frames_u8)
        outs = []
        for s in range(0, n, chunk):
            sl = frames_u8[s : s + chunk]
            pad = chunk - len(sl)
            if pad:
                sl = np.concatenate([sl, np.repeat(sl[-1:], pad, 0)])
            outs.append(np.asarray(chunk_fn(jnp.asarray(sl))))
        return np.concatenate(outs)[:n]

    feature_fn.chunk_fn = chunk_fn
    feature_fn.chunk = chunk
    feature_fn.params = None
    return feature_fn


def _feat_engine(feature_fn, params=None, F_HW=4, F_C=32):
    model_cfg = TranslationModelConfig(
        model="context_feat", strides=(1, 2, 1, 2), kernels=(3, 3, 3, 3),
        filters=(16, 16, 8, 8), feat_size=16, feature_hw=(F_HW, F_HW),
        feature_channels=F_C,
    )
    model = build_model(model_cfg)
    x = jnp.zeros((1, F_HW, F_HW, F_C), jnp.float32)
    if params is None:
        params = model.init(jax.random.key(0), x, x, x)
    rng = np.random.default_rng(0)
    demo_u8 = rng.integers(0, 255, (T, 3, HW, HW, 3), dtype=np.uint8)
    eng = VisualRewardEngine(
        RewardConfig(mode="oursinception", scale=0.01), model_cfg,
        params=params, demo_data=demo_u8, feature_fn=feature_fn, chunk_videos=2,
    )
    return eng, params


def test_oursinception_device_backbone_matches_host():
    """The on-device backbone route (feature_fn.chunk_fn: raycast frames ->
    features -> encoder without host round trips) must splice identical
    rewards to the legacy host feature_fn path, for BOTH host-frame and
    device-block inputs."""
    host_fn = _fake_backbone()
    plain_fn = host_fn.__wrapped__ if hasattr(host_fn, "__wrapped__") else (
        lambda f: host_fn(f)
    )  # same math, no chunk_fn attribute -> legacy host path
    eng_host, params = _feat_engine(plain_fn)
    paths_host = _make_paths(n_paths=4, seed=31)
    eng_host.process(paths_host)

    eng_dev, _ = _feat_engine(host_fn, params=params)
    paths_up = _make_paths(n_paths=4, seed=31)
    eng_dev.process(paths_up)  # host frames, device featurize
    for pa, pb in zip(paths_host, paths_up):
        np.testing.assert_allclose(pa["rewards"], pb["rewards"], rtol=1e-4, atol=1e-4)

    eng_dev2, _ = _feat_engine(host_fn, params=params)
    paths_dev = _paths_to_frames_dev(_make_paths(n_paths=4, seed=31))
    eng_dev2.process(paths_dev)  # device blocks end-to-end
    for pa, pb in zip(paths_host, paths_dev):
        np.testing.assert_allclose(pa["rewards"], pb["rewards"], rtol=1e-4, atol=1e-4)


def test_oursinception_device_frames_require_chunk_fn():
    """Device-resident frames + a host-only backbone would silently force a
    frame round trip — the engine must refuse instead."""
    eng, _ = _feat_engine(lambda f: _fake_backbone()(f))  # no chunk_fn attr
    paths_dev = _paths_to_frames_dev(_make_paths(n_paths=2, seed=32))
    with pytest.raises(ValueError, match="chunk_fn"):
        eng.process(paths_dev)


def test_mixed_context_batch_raises():
    """The fixed-context contract (engine._check_shared_context): stamped
    paths from more than one scene draw must fail loudly — the warmup cache
    is built for ONE pinned context."""
    eng, params, demo, model = _engine_and_params()
    paths = _make_paths(n_paths=3, seed=33)
    for p, fp in zip(paths, ["aaa", "aaa", "bbb"]):
        p["context_fp"] = fp
    with pytest.raises(ValueError, match="one scene context"):
        eng.process(paths)
    # the "mixed" sentinel (per-env randomization) also raises
    eng2, *_ = _engine_and_params()
    paths = _make_paths(n_paths=2, seed=34)
    for p in paths:
        p["context_fp"] = "mixed"
    with pytest.raises(ValueError, match="one scene context"):
        eng2.process(paths)
    # uniform stamps pass
    eng3, *_ = _engine_and_params()
    paths = _make_paths(n_paths=2, seed=35)
    for p in paths:
        p["context_fp"] = "aaa"
    eng3.process(paths)
    assert paths[0]["rewards"][3] != 0


def test_inception_mode_zscore(tmp_path):
    """inception mode: z-scored activation error vs stored expert means
    (base.py:179-189)."""
    feat_shape = (2, 2, 8)

    def feature_fn(frames_u8):
        x = np.asarray(frames_u8, np.float32).mean(axis=(1, 2, 3))
        return np.tile(x[:, None, None, None], (1, *feat_shape))

    means = np.zeros((T, *feat_shape), np.float32)
    std = np.ones((T, *feat_shape), np.float32)
    np.savez(tmp_path / "means.npz", **{"Mixed_7c": means, "Mixed_7cstd": std})
    eng = VisualRewardEngine(
        RewardConfig(mode="inception", mean_file=str(tmp_path / "means.npz")),
        feature_fn=feature_fn,
    )
    paths = _make_paths(n_paths=1, seed=10)
    eng.process(paths)
    r = paths[0]["rewards"]
    assert r[1] == 0.0 and all(r[2 * j + 1] <= 0 for j in range(T))


def test_sharded_scoring_matches_single_device():
    """Reward scoring sharded over the 8-device mesh (rollouts on the data
    axis, padded to the mesh size) must match the unsharded result."""
    from imitation_from_observation_tpu.parallel import make_mesh

    eng_a, params, demo, model = _engine_and_params()
    paths_a = _make_paths(n_paths=3, seed=11)
    eng_a.process(paths_a)

    eng_b = VisualRewardEngine(
        RewardConfig(mode="ours", scale=0.7), MODEL_CFG, params=params,
        demo_data=demo, mesh=make_mesh(),
    )
    paths_b = _make_paths(n_paths=3, seed=11)
    eng_b.process(paths_b)
    for pa, pb in zip(paths_a, paths_b):
        np.testing.assert_allclose(pa["rewards"], pb["rewards"], rtol=1e-4, atol=1e-4)


def _paths_to_frames_dev(paths, n_blocks=1):
    """Clone host-frame paths into the sampler's device-block layout
    (VectorizedSampler.obtain_samples: path["frames_dev"] = (block, i),
    block [T, N, V, ...] per lockstep episode)."""
    out = []
    per = (len(paths) + n_blocks - 1) // n_blocks
    for b in range(n_blocks):
        group = paths[b * per : (b + 1) * per]
        if not group:
            continue
        stacks = [
            np.stack([f for f in p["env_infos"]["frames"] if f is not None])
            for p in group
        ]
        block = jnp.asarray(np.stack(stacks, axis=1))  # [T, N, V, ...]
        for i, p in enumerate(group):
            q = dict(
                rewards=p["rewards"].copy(),
                env_infos={
                    "frames": [None] * len(p["env_infos"]["frames"]),
                    "reward_true": p["env_infos"]["reward_true"],
                },
                frames_dev=(block, i),
            )
            out.append(q)
    return out


@pytest.mark.parametrize("n_blocks", [1, 2])
def test_device_resident_frames_match_host_path(n_blocks):
    """The device-resident scoring path (frames_dev blocks, no host restack)
    must splice identical rewards to the host-frames path, including across
    multiple lockstep-episode blocks in one batch."""
    eng_a, params, demo, model = _engine_and_params()
    paths_host = _make_paths(n_paths=4, seed=21)
    paths_dev = _paths_to_frames_dev(paths_host, n_blocks=n_blocks)
    eng_a.process(paths_host)

    eng_b = VisualRewardEngine(
        RewardConfig(mode="ours", scale=0.7), MODEL_CFG, params=params,
        demo_data=demo, chunk_videos=4,
    )
    eng_b.process(paths_dev)
    for pa, pb in zip(paths_host, paths_dev):
        np.testing.assert_allclose(pa["rewards"], pb["rewards"], rtol=1e-4, atol=1e-4)


def test_device_frames_truncated_path_bounds_T():
    """A truncated final path (shorter rewards) bounds the scored frame count
    for the whole batch, exactly like the host path's min-frame-count rule."""
    eng, params, demo, model = _engine_and_params()
    paths_host = _make_paths(n_paths=2, seed=22)
    paths_dev = _paths_to_frames_dev(paths_host)
    # truncate the second path's rewards to 4 steps -> frames j=0,1 scorable
    paths_dev[1]["rewards"] = paths_dev[1]["rewards"][:4]
    eng.process(paths_dev)
    for p in paths_dev:
        assert p["rewards"][3] != 0  # j=1 spliced (j=0 carries weight 0^2)
        assert np.all(p["rewards"][5::2] == 0)  # j >= 2 untouched everywhere


def test_params_as_arguments_matches_baked(monkeypatch):
    """Above IFO_TPU_MAX_BAKED_PARAM_MB the engine passes frozen params as
    jit arguments instead of baking them in as XLA constants (the relay's
    compile endpoint 413s on very large constant-embedding HLO — hit live by
    ContextFeat's 292 MB bf16 tree). Both binding modes must score
    identically."""
    eng_baked, params, demo, _ = _engine_and_params()
    assert eng_baked._params_baked
    monkeypatch.setenv("IFO_TPU_MAX_BAKED_PARAM_MB", "0")
    eng_args = VisualRewardEngine(
        RewardConfig(mode="ours", ablation="none", scale=0.7),
        MODEL_CFG,
        params=params,
        demo_data=demo,
        chunk_videos=4,
    )
    assert not eng_args._params_baked
    pa = _make_paths(n_paths=2, seed=5)
    pb = _make_paths(n_paths=2, seed=5)
    eng_baked.process(pa)
    eng_args.process(pb)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(a["rewards"], b["rewards"], rtol=1e-6, atol=1e-7)


def test_feature_fn_bf16_fetch_matches_f32():
    """fetch_dtype='bfloat16' (the bulk-featurize transfer optimization)
    returns bf16 features that round-trip within bf16 tolerance of the f32
    path, and leaves chunk_fn (the engine's device scoring path) f32."""
    import jax.numpy as jnp

    from imitation_from_observation_tpu.reward.backbones import (
        make_inception_feature_fn,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (5, 96, 96, 3), dtype=np.uint8)
    f32 = make_inception_feature_fn(input_size=(96, 96), seed=3, chunk=4)
    b16 = make_inception_feature_fn(
        input_size=(96, 96), seed=3, chunk=4, fetch_dtype="bfloat16"
    )
    a = np.asarray(f32(frames), np.float32)
    out = b16(frames)
    assert jnp.asarray(out).dtype == jnp.bfloat16
    b = np.asarray(out, np.float32)
    assert a.shape == b.shape
    denom = np.maximum(np.abs(a), 1e-3)
    assert np.median(np.abs(a - b) / denom) < 1e-2  # bf16 has ~3 decimal digits
    assert b16.chunk_fn(jnp.asarray(frames[:4])).dtype == jnp.float32
