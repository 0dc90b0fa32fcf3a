"""Inception-v3 shape/endpoint tests (the reference's nets/*_test.py tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_from_observation_tpu.models.inception_v3 import (
    InceptionV3,
    preprocess_uint8,
)


@pytest.fixture(scope="module")
def small_model_and_params():
    # full 299x299 init is slow on CPU CI; shapes validated at 299 once below
    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    return model, params


def test_endpoint_shapes_eval_shape():
    """All slim endpoint shapes at 299x299 (nets/inception_v3_test.py's
    endpoint contract) — via eval_shape, no FLOPs."""
    model = InceptionV3()
    x = jnp.zeros((2, 299, 299, 3), jnp.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), x))
    (logits, ep) = jax.eval_shape(lambda p: model.apply(p, x), params)
    expected = {
        "Conv2d_1a_3x3": (2, 149, 149, 32),
        "Conv2d_2a_3x3": (2, 147, 147, 32),
        "Conv2d_2b_3x3": (2, 147, 147, 64),
        "MaxPool_3a_3x3": (2, 73, 73, 64),
        "Conv2d_3b_1x1": (2, 73, 73, 80),
        "Conv2d_4a_3x3": (2, 71, 71, 192),
        "MaxPool_5a_3x3": (2, 35, 35, 192),
        "Mixed_5b": (2, 35, 35, 256),
        "Mixed_5c": (2, 35, 35, 288),
        "Mixed_5d": (2, 35, 35, 288),
        "Mixed_6a": (2, 17, 17, 768),
        "Mixed_6b": (2, 17, 17, 768),
        "Mixed_6c": (2, 17, 17, 768),
        "Mixed_6d": (2, 17, 17, 768),
        "Mixed_6e": (2, 17, 17, 768),
        "Mixed_7a": (2, 8, 8, 1280),
        "Mixed_7b": (2, 8, 8, 2048),
        "Mixed_7c": (2, 8, 8, 2048),
    }
    for name, shape in expected.items():
        assert ep[name].shape == shape, (name, ep[name].shape, shape)
    assert logits.shape == (2, 1001)


def test_runs_small_input():
    """Numerically run at a reduced input size (fully conv net)."""
    model = InceptionV3()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 79, 79, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    logits, ep = model.apply(params, x)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert ep["Mixed_7c"].shape[-1] == 2048


def test_preprocess_uint8():
    x = jnp.asarray(np.array([[0, 127, 255]], np.uint8))
    got = np.asarray(preprocess_uint8(x))
    np.testing.assert_allclose(got, [[-1.0, 127 / 255 * 2 - 1, 1.0]], atol=1e-6)


def _tools_path():
    import os, sys

    p = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools"))
    if p not in sys.path:
        sys.path.insert(0, p)


def _write_tf_checkpoint(tmp_path, var_npz: str, ckpt_prefix: str):
    """Create a REAL TF1 Saver checkpoint in a SUBPROCESS (importing
    tensorflow into a process that already holds jax/mujoco segfaults on
    this image, so all TF work runs isolated)."""
    import subprocess
    import sys

    code = f"""
import numpy as np, tensorflow as tf
data = np.load({var_npz!r})
with tf.Graph().as_default():
    tvars = {{n: tf.Variable(data[n], name=n) for n in data.files}}
    saver = tf.compat.v1.train.Saver(var_list=tvars)
    with tf.compat.v1.Session() as sess:
        sess.run(tf.compat.v1.global_variables_initializer())
        saver.save(sess, {ckpt_prefix!r})
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        pytest.skip(f"tf checkpoint write failed: {r.stderr[-400:]}")


def _convert_cli(kind: str, ckpt_prefix: str, out: str):
    import os
    import subprocess
    import sys

    tool = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools", "convert_tf_checkpoint.py"))
    r = subprocess.run(
        [sys.executable, tool, kind, ckpt_prefix, out], capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, r.stderr[-400:]


def test_real_tf_checkpoint_roundtrip_inception(tmp_path, small_model_and_params):
    """Write a REAL TF1 Saver checkpoint with slim variable names (the format
    of the reference's model/inception_v3.ckpt), convert it with the real
    tf.train.load_checkpoint path, and load it into the flax backbone -
    every leaf must round-trip bit-exactly."""
    import importlib.util

    if importlib.util.find_spec("tensorflow") is None:  # no in-process import!
        pytest.skip("tensorflow unavailable")
    from imitation_from_observation_tpu.models.inception_v3 import load_tf_slim_npz

    model, like = small_model_and_params
    rng = np.random.default_rng(0)
    flat, _ = jax.tree_util.tree_flatten_with_path(like)

    def slim_name(path):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        if key.startswith("params/"):
            key = key[len("params/") :]
        for bn in ("beta", "moving_mean", "moving_variance"):
            if key.endswith("/" + bn):
                key = key[: -len(bn)] + "BatchNorm/" + bn
        return "InceptionV3/" + key

    tf_vars = {slim_name(p): rng.standard_normal(leaf.shape).astype(np.float32) for p, leaf in flat}
    var_npz = str(tmp_path / "vars.npz")
    np.savez(var_npz, **tf_vars)
    ckpt_prefix = str(tmp_path / "inception_v3.ckpt")
    _write_tf_checkpoint(tmp_path, var_npz, ckpt_prefix)

    out = str(tmp_path / "inception.npz")
    _convert_cli("inception", ckpt_prefix, out)
    params = load_tf_slim_npz(out, like)
    for path, arr in jax.tree_util.tree_flatten_with_path(params)[0]:
        np.testing.assert_array_equal(np.asarray(arr), tf_vars[slim_name(path)])


def test_real_tf_checkpoint_roundtrip_translation(tmp_path):
    """Same proof for translation models: a real Saver checkpoint with the
    reference's variable names (contextmodel/<scope>/{w,biases,Matrix,bias})
    converts and loads into an IDENTICAL forward."""
    import importlib.util

    if importlib.util.find_spec("tensorflow") is None:  # no in-process import!
        pytest.skip("tensorflow unavailable")
    import os, sys

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools")))
    from convert_tf_checkpoint import load_translation_npz

    from imitation_from_observation_tpu.models import ContextSkip

    model = ContextSkip(image_size=(16, 16), base_filters=8, feat_size=32)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    donor = model.init(jax.random.key(3), x, x, x)

    tf_vars = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(donor)[0]:
        keys = [str(getattr(k, "key", k)) for k in path]
        if keys[0] == "params":
            keys = keys[1:]
        scope, leafname = "/".join(keys[:-1]), keys[-1]
        is_linear = keys[-2].endswith("_lin") or keys[-2].startswith("trans_")
        if leafname == "w":
            name = f"{scope}/Matrix" if is_linear else f"{scope}/w"
        else:
            name = f"{scope}/bias" if is_linear else f"{scope}/biases"
        tf_vars["contextmodel/" + name] = np.asarray(leaf)

    var_npz = str(tmp_path / "vars.npz")
    np.savez(var_npz, **tf_vars)
    ckpt_prefix = str(tmp_path / "model.ckpt")
    _write_tf_checkpoint(tmp_path, var_npz, ckpt_prefix)

    out = str(tmp_path / "translation.npz")
    _convert_cli("translation", ckpt_prefix, out)
    restored = load_translation_npz(model.init(jax.random.key(9), x, x, x), out)
    a = model.apply(donor, x, x, x)
    b = model.apply(restored, x, x, x)
    np.testing.assert_array_equal(np.asarray(a.out), np.asarray(b.out))


def test_inceptionsame_reward_end_to_end():
    """The inceptionsame pipeline with the REAL flax backbone (random
    weights): expert stats from rollouts -> engine z-scored activation
    reward spliced at odd steps (base.py:93-111, 179-189)."""
    from imitation_from_observation_tpu.core.config import EnvConfig, RewardConfig
    from imitation_from_observation_tpu.reward import VisualRewardEngine
    from imitation_from_observation_tpu.reward.backbones import (
        compute_expert_feature_stats,
        make_inception_feature_fn,
    )
    from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy
    from imitation_from_observation_tpu.rl.sampler import rollout
    from imitation_from_observation_tpu.core.rng import RngStream
    from imitation_from_observation_tpu.sim import NormalizedEnv, make_env

    hw, horizon = 79, 4
    feature_fn = make_inception_feature_fn(layer="Mixed_7c", input_size=(hw, hw), seed=0)
    env = NormalizedEnv(
        make_env(
            "striker",
            EnvConfig(name="striker", image_size=(hw, hw), render_size=(96, 96), horizon=horizon, seed=5),
        )
    )
    policy = GaussianMLPPolicy(env.observation_space.flat_dim, env.action_space.flat_dim)
    means, std = compute_expert_feature_stats(
        env, policy, feature_fn, n_rollouts=2, max_path_length=horizon
    )
    assert means.shape[0] == horizon // 2 and means.shape[-1] == 2048

    eng = VisualRewardEngine(RewardConfig(mode="inceptionsame"), feature_fn=feature_fn)
    eng.set_expert_stats(means, std)
    path = rollout(env, policy, horizon, RngStream(1))
    before = path["rewards"].copy()
    eng.process([path])
    env.close()
    # odd steps got (non-positive) activation-error splices with j^2 weights;
    # j=0 contributes 0, so only step 3 moves for horizon 4
    assert path["rewards"][3] <= before[3]
    assert np.all(np.isfinite(path["rewards"]))


def test_feature_fn_chunking_matches_unchunked():
    """feature_fn processes calls in fixed-size padded chunks (one compiled
    shape; unchunked 1,250-frame scoring batches at 299x299 would blow HBM).
    Chunked output must equal the single-call values on every frame."""
    import numpy as np

    from imitation_from_observation_tpu.reward.backbones import (
        make_inception_feature_fn,
    )

    hw = 79
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (10, hw, hw, 3), dtype=np.uint8)
    f_one = make_inception_feature_fn(layer="Mixed_7c", input_size=(hw, hw), seed=0, chunk=16)
    f_chk = make_inception_feature_fn(layer="Mixed_7c", input_size=(hw, hw), seed=0, chunk=4)
    a = np.asarray(f_one(frames))  # 10 <= 16: single padded call
    b = np.asarray(f_chk(frames))  # 4+4+2: multi-chunk path
    assert a.shape[0] == 10 and b.shape == a.shape
    # XLA tiles convs differently per batch size, so f32 accumulation order
    # (and ReLU sign flips near zero) differ slightly between chunkings;
    # gate on RMS-scaled error rather than elementwise rtol
    rms = float(np.sqrt(np.mean(a**2)))
    assert rms > 0
    err = float(np.sqrt(np.mean((a - b) ** 2)))
    assert err / rms < 1e-4, (err, rms)


def test_calibrate_bn_normalizes_scale():
    """Data-dependent BN calibration must tame the random-init activation
    explosion: post-calibration the endpoint RMS is O(1) (observed ~1e8 at
    299x299 uncalibrated) and a held-out batch stays the same scale."""
    import numpy as np

    from imitation_from_observation_tpu.models.inception_v3 import (
        InceptionV3,
        calibrate_bn,
        preprocess_uint8,
    )

    hw = 79
    rng = np.random.default_rng(0)
    model = InceptionV3(final_endpoint="Mixed_7c")
    x = preprocess_uint8(jnp.asarray(rng.integers(0, 255, (8, hw, hw, 3), np.uint8)))
    params = model.init(jax.random.key(0), x[:1])
    raw = np.asarray(model.apply(params, x, features_only=True)["Mixed_7c"])
    cal_params = calibrate_bn(model, params, x, n_passes=50)
    cal = np.asarray(model.apply(cal_params, x, features_only=True)["Mixed_7c"])
    held = preprocess_uint8(jnp.asarray(rng.integers(0, 255, (8, hw, hw, 3), np.uint8)))
    cal_h = np.asarray(model.apply(cal_params, held, features_only=True)["Mixed_7c"])
    rms = lambda a: float(np.sqrt(np.mean(np.square(a, dtype=np.float64))))
    assert rms(cal) < 10.0 < rms(raw), (rms(cal), rms(raw))
    assert 0.01 < rms(cal_h) / max(rms(cal), 1e-9) < 100.0
    # weights untouched — only the stored BN statistics moved
    np.testing.assert_array_equal(
        np.asarray(params["params"]["Conv2d_1a_3x3"]["weights"]),
        np.asarray(cal_params["params"]["Conv2d_1a_3x3"]["weights"]),
    )
    assert not np.array_equal(
        np.asarray(params["params"]["Conv2d_1a_3x3"]["moving_variance"]),
        np.asarray(cal_params["params"]["Conv2d_1a_3x3"]["moving_variance"]),
    )


def test_pretrain_inception_time_tiny(tmp_path):
    """The TimeSoftmax pretext (arm_shaping.py:303) applied to the backbone:
    trains on tiny synthetic demo frames, returns params usable by
    make_inception_feature_fn, and beats chance on its own train batch after
    a few steps (the dot's x-position encodes time exactly)."""
    import numpy as np

    from imitation_from_observation_tpu.exp.pretrain_backbone import (
        pretrain_inception_time,
    )
    from imitation_from_observation_tpu.reward.backbones import (
        make_inception_feature_fn,
    )

    T, N, hw = 3, 6, 79
    rng = np.random.default_rng(0)
    frames = np.zeros((T, N, hw, hw, 3), np.uint8)
    for n in range(N):
        bg = rng.integers(0, 120, 3)
        frames[:, n] = bg
        for t in range(T):
            x = 10 + t * 20
            frames[t, n, 30:50, x : x + 12] = 255
    params, metrics = pretrain_inception_time(
        frames, n_steps=12, batch=8, calib_batch=8, calib_passes=50,
        n_valid_videos=2, seed=0, log_every=6,
    )
    assert np.isfinite(metrics["pretext_ce"]) and np.isfinite(metrics["valid_ce"])
    assert metrics["valid_acc"] >= metrics["chance_acc"] - 1e-6

    feature_fn = make_inception_feature_fn(
        layer="Mixed_7c", params=params, input_size=(hw, hw), chunk=8
    )
    feats = np.asarray(feature_fn(frames[0]))
    assert feats.shape[0] == N and np.all(np.isfinite(feats))
    assert float(np.sqrt(np.mean(feats**2))) < 10.0  # calibrated scale
