"""Model-family tests: shapes, weight sharing, inference paths, learning."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imitation_from_observation_tpu.core.config import TranslationModelConfig
from imitation_from_observation_tpu.models import (
    ContextFeat,
    ContextSkip,
    ContextSmall,
    build_model,
    translation_loss,
)


def _init(model, shape, rngs=None):
    src = jnp.zeros(shape, jnp.float32)
    return model.init(rngs or jax.random.key(0), src, src, src)


def test_context_skip_shapes():
    model = ContextSkip(image_size=(48, 48))
    x = jnp.zeros((4, 48, 48, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    assert outs.out.shape == (4, 48, 48, 3)
    assert outs.out2.shape == (4, 48, 48, 3)
    assert outs.trans_z.shape == (4, 1024)
    assert outs.src_z.shape == (4, 1024)
    # encoder channel progression 64..512 (arm_shaping.py:1284-1289)
    conv = params["params"]["conv"]
    assert conv["h0_conv"]["w"].shape == (5, 5, 3, 64)
    assert conv["h3_conv"]["w"].shape == (5, 5, 256, 512)


def test_context_skip_ctx_encoder_no_final_lrelu():
    """ctx latent must be able to go negative (no lrelu, arm_shaping.py:1291);
    src/tgt latents cannot (lrelu output >= 0.2*x, so min bounded by leak)."""
    model = ContextSkip(image_size=(48, 48))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 48, 48, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    skips, ctx_z = model.apply(params, x, method="encode_ctx")
    src_z = model.apply(params, x, method="encode")
    # lrelu(y) = max(y, .2y): negatives are exactly 0.2*pre-act. ctx_z has no
    # such structure; check src_z's negative tail is compressed 5x vs ctx_z.
    assert float(jnp.min(src_z)) > 5 * float(jnp.min(ctx_z)) or float(jnp.min(ctx_z)) >= 0


def test_decoder_weight_sharing():
    """out and out2 must come from one decoder (reference scope reuse)."""
    model = ContextSkip(image_size=(48, 48))
    x = jnp.zeros((2, 48, 48, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    names = set(params["params"].keys())
    assert names == {"conv", "conv_context", "translate", "deconv"}
    # exactly one deconv stack => shared between branches
    assert set(params["params"]["deconv"].keys()) == {"d_h0_lin", "d_h1", "d_h2", "d_h3", "d_h4"}


def test_context_small_shapes_and_dropout():
    model = ContextSmall(image_size=(36, 64))
    x = jnp.zeros((4, 36, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)  # deterministic
    assert outs.out.shape == (4, 36, 64, 3)
    assert outs.trans_z.shape == (4, 100)
    # stochastic path needs a dropout rng and differs across keys
    xr = jnp.asarray(np.random.default_rng(0).standard_normal((4, 36, 64, 3)), jnp.float32)
    o1 = model.apply(params, xr, xr, xr, deterministic=False, rngs={"dropout": jax.random.key(1)})
    o2 = model.apply(params, xr, xr, xr, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1.out), np.asarray(o2.out))


def test_context_feat_residual():
    model = ContextFeat(filters=(64, 64, 32, 32), feature_hw=(8, 8), feature_channels=128)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 128)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    assert outs.out.shape == (2, 8, 8, 128)
    # residual: out - decode(...) == ctx exactly
    trans_z, out = model.apply(params, x, x, method="translate")
    np.testing.assert_allclose(np.asarray(out), np.asarray(outs.out), rtol=1e-5, atol=1e-5)


def test_translate_matches_forward():
    """translate(src, ctx) must equal the training branch's (trans_z, out)."""
    model = ContextSkip(image_size=(48, 48))
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((2, 48, 48, 3)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 48, 48, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 48, 48, 3)), jnp.float32)
    params = model.init(jax.random.key(0), src, ctx, tgt)
    outs = model.apply(params, src, ctx, tgt)
    trans_z, out = model.apply(params, src, ctx, method="translate")
    np.testing.assert_allclose(np.asarray(trans_z), np.asarray(outs.trans_z), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(outs.out), rtol=1e-5, atol=1e-6)


def test_loss_values():
    model = ContextSkip(image_size=(48, 48))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 48, 48, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    loss, metrics = translation_loss(outs, x)
    r1 = 0.5 * np.sum((np.asarray(x) - np.asarray(outs.out)) ** 2)
    np.testing.assert_allclose(float(metrics["recon1"]), r1, rtol=1e-4)
    sim = np.mean((np.asarray(outs.trans_z) - np.asarray(outs.tgt_z)) ** 2) * 1e3
    np.testing.assert_allclose(float(metrics["simloss"]), sim, rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(metrics["recon1"] + metrics["recon2"] + metrics["simloss"]), rtol=1e-5)


@pytest.mark.parametrize("name", ["context_skip", "context_small", "context_feat"])
def test_registry_builds(name):
    cfg = TranslationModelConfig(
        model=name,
        image_size=(32, 32) if name != "context_small" else (36, 64),
    )
    model = build_model(cfg)
    if name == "context_feat":
        x = jnp.zeros((2, 8, 8, 2048), jnp.float32)
    else:
        x = jnp.zeros((2, *cfg.image_size, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    assert outs.out.shape == x.shape


def test_model_learns():
    """A few Adam steps on a fixed batch must reduce the loss (sanity that
    gradients flow through all branches incl. the shared decoder)."""
    model = ContextSkip(base_filters=8, feat_size=64, image_size=(16, 16))
    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.standard_normal((4, 16, 16, 3)) * 0.5, jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((4, 16, 16, 3)) * 0.5, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((4, 16, 16, 3)) * 0.5, jnp.float32)
    params = model.init(jax.random.key(0), src, ctx, tgt)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            outs = model.apply(p, src, ctx, tgt)
            loss, _ = translation_loss(outs, tgt)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(100):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[:3] + losses[-3:]


# -- whole-model parity vs the independent torch oracle ----------------------


def _small_skip():
    return ContextSkip(image_size=(16, 16), base_filters=8, feat_size=32)


def test_whole_forward_matches_torch_oracle(rng):
    """The ASSEMBLED ContextSkip graph (conv encoders -> translator -> deconv
    decoder with context skips, incl. the ctx-encoder no-final-lrelu quirk)
    must match an independent torch recomputation of the reference topology
    (arm_shaping.py:1260-1354) — SURVEY §7 hard-part #2 at whole-model level."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    import oracle_contextskip as oracle

    model = _small_skip()
    src = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    ctx = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.key(1), src, ctx, tgt)
    ours = jax.jit(model.apply)(params, src, ctx, tgt)
    ref = oracle.forward(params, src, ctx, tgt)
    for name in ("out", "out2", "trans_z", "tgt_z", "src_z"):
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)), ref[name], rtol=1e-4, atol=1e-5,
            err_msg=f"output {name} diverges from torch oracle",
        )
    # the 3-term loss agrees too (arm_shaping.py:1345-1354)
    loss, parts = translation_loss(ours, jnp.asarray(tgt))
    ref_loss, ref_parts = oracle.translation_loss_np(ref, tgt)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
    for k in ("recon1", "recon2", "simloss"):
        np.testing.assert_allclose(float(parts[k]), ref_parts[k], rtol=1e-4)


def test_psnr_parity_metric():
    """bench.py's frame_psnr_parity_db helper reports >= 60 dB (identical
    weights, independent implementations) at small scale."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from oracle_contextskip import psnr_vs_oracle

    assert psnr_vs_oracle(hw=16, batch=2, base_filters=8, feat_size=32) >= 60.0


def test_tf_checkpoint_converter_roundtrip(tmp_path, rng):
    """Prove the TF1 Saver -> npz -> flax pipeline: build a synthetic
    checkpoint with the REFERENCE's variable names (contextmodel/<scope>/w,
    biases, Matrix, bias — arm_shaping.py:22-48), convert with
    rename_translation_vars, load with load_translation_npz, and check the
    restored model reproduces the donor model's forward exactly."""
    import sys, os

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "tools")))
    from convert_tf_checkpoint import load_translation_npz, rename_translation_vars

    model = _small_skip()
    src = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.key(2), src, src, src)

    # synthesize the TF1 checkpoint's variable dict from the donor params
    tf_vars = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for key_path, leaf in flat:
        keys = [str(getattr(k, "key", k)) for k in key_path]
        if keys[0] == "params":
            keys = keys[1:]
        scope = "/".join(keys[:-1])
        leafname = keys[-1]
        is_linear = keys[-2].endswith("_lin") or keys[-2].startswith("trans_")
        if leafname == "w":
            tfname = f"{scope}/Matrix" if is_linear else f"{scope}/w"
        else:
            tfname = f"{scope}/bias" if is_linear else f"{scope}/biases"
        tf_vars["contextmodel/" + tfname] = np.asarray(leaf)
    # optimizer slots must be dropped by the converter
    tf_vars["contextmodel/conv/h0_conv/w/Adam"] = np.zeros(3)
    tf_vars["beta1_power"] = np.zeros(())

    out = str(tmp_path / "converted.npz")
    np.savez(out, **rename_translation_vars(tf_vars))

    fresh = model.init(jax.random.key(99), src, src, src)  # different weights
    restored = load_translation_npz(fresh, out)
    a = jax.jit(model.apply)(params, src, src, src)
    b = jax.jit(model.apply)(restored, src, src, src)
    np.testing.assert_array_equal(np.asarray(a.out), np.asarray(b.out))
    np.testing.assert_array_equal(np.asarray(a.trans_z), np.asarray(b.trans_z))


def test_resnet_v1_family_param_counts():
    """ResNetV1 topology pinned to the published slim models: total counts =
    trainable + BN moving stats (resnet_v1_50: 25,557,032 + 53,120)."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import ResNetV1

    # totals = published trainable counts + BN moving-stat leaves
    for depth, expect in ((50, 25_610_152), (101, 44_654_504)):
        m = ResNetV1(depth=depth)
        v = jax.eval_shape(lambda m=m: m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v))
        assert n == expect, (depth, n)


def test_vgg16_param_count_and_endpoints():
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import VGG16

    m = VGG16()
    v = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v))
    assert n == 138_357_544, n  # the canonical VGG-16 parameter count
    # params init at the canonical size; conv weights are spatial-size-free,
    # so feature extraction runs at any input >= the receptive floor
    params = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    ep = m.apply(params, jnp.zeros((2, 64, 64, 3), jnp.float32), features_only=True)
    assert ep["conv5"].shape == (2, 2, 2, 512)


def test_resnet_forward_and_slim_npz_roundtrip(tmp_path):
    """A random 'checkpoint' written under slim variable names restores
    leaf-for-leaf, and the restored model reproduces the same logits."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import (
        ResNetV1,
        load_slim_npz,
    )

    rng = np.random.default_rng(0)
    m = ResNetV1(depth=50, num_classes=11)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)), jnp.float32)
    params = m.init(jax.random.key(1), x)
    logits, ep = m.apply(params, x)
    assert logits.shape == (2, 11) and np.all(np.isfinite(np.asarray(logits)))
    assert set(ep) >= {"conv1", "block1", "block2", "block3", "block4"}

    # export with slim names (scope prefix + BatchNorm/ nesting), reload
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if key.startswith("params/"):
            key = key[len("params/"):]
        for stat in ("gamma", "beta", "moving_mean", "moving_variance"):
            if key.endswith("/" + stat):
                key = key[: -len(stat)] + "BatchNorm/" + stat
        out["resnet_v1_50/" + key] = np.asarray(leaf)
    np.savez(tmp_path / "ck.npz", **out)
    restored = load_slim_npz(str(tmp_path / "ck.npz"), params, "resnet_v1_50")
    logits2, _ = m.apply(restored, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-6)


def test_backbone_factory():
    from imitation_from_observation_tpu.models.backbones_extra import make_backbone

    m, size = make_backbone("resnet_v1_101")
    assert m.depth == 101 and size == (224, 224)
    m, size = make_backbone("inception_v3")
    assert size == (299, 299)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_backbone("alexnet_v9")


def test_vgg_variants_param_counts():
    """vgg_19 / vgg_a topologies pinned to the published slim counts."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import VGG

    for reps, expect in (((2, 2, 4, 4, 4), 143_667_240),
                         ((1, 1, 2, 2, 2), 132_863_336)):
        m = VGG(reps=reps)
        v = jax.eval_shape(lambda m=m: m.init(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v))
        assert n == expect, (reps, n)


def test_alexnet_overfeat_shapes():
    """alexnet_v2 pinned to its published count (50,303,912: the no-LRN
    fully-conv variant, nets/alexnet.py:76-120); overfeat logits resolve at
    the canonical 231x231 (fc6 6x6 VALID leaves 1x1)."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import (
        AlexNetV2,
        OverFeat,
    )

    m = AlexNetV2()
    v = jax.eval_shape(lambda: m.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v))
    assert n == 50_303_912, n
    logits, ep = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((2, 224, 224, 3), jnp.float32)), v)
    assert logits.shape == (2, 1000)
    assert ep["pool5"].shape == (2, 5, 5, 256)

    o = OverFeat()
    vo = jax.eval_shape(lambda: o.init(
        jax.random.key(0), jnp.zeros((1, 231, 231, 3), jnp.float32)))
    logits, ep = jax.eval_shape(
        lambda p: o.apply(p, jnp.zeros((2, 231, 231, 3), jnp.float32)), vo)
    assert logits.shape == (2, 1000)
    assert ep["pool5"].shape == (2, 6, 6, 1024) and ep["fc6"].shape == (2, 1, 1, 3072)


def test_inception_v1_endpoints():
    """Published GoogLeNet endpoint shapes at 224 (inception_v1.py:21-25),
    plus a real small-input forward through every Mixed block."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import InceptionV1

    m = InceptionV1()
    v = jax.eval_shape(lambda: m.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)))
    ep = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32),
                          features_only=True), v)
    assert ep["Mixed_3b"].shape == (1, 28, 28, 256)
    assert ep["Mixed_3c"].shape == (1, 28, 28, 480)
    assert ep["Mixed_4f"].shape == (1, 14, 14, 832)
    assert ep["Mixed_5c"].shape == (1, 7, 7, 1024)
    logits, _ = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32)), v)
    assert logits.shape == (1, 1000)
    # Mixed_5b keeps slim's Branch_2 'Conv2d_0a_3x3' scope typo (the
    # checkpoint-name contract, inception_v1.py:220)
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    keys = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    assert any("Mixed_5b/Branch_2/Conv2d_0a_3x3" in k for k in keys)
    assert any("Mixed_5c/Branch_2/Conv2d_0b_3x3" in k for k in keys)
    # real forward at a small input (features_only dodges the 7x7 head pool)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.key(1), x, features_only=True)
    ep = m.apply(params, x, features_only=True)
    assert ep["Mixed_5c"].shape == (2, 2, 2, 1024)
    assert np.all(np.isfinite(np.asarray(ep["Mixed_5c"])))


def test_cifarnet_lenet_forward_and_lrn():
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import (
        CifarNet,
        LeNet,
        local_response_norm,
    )

    rng = np.random.default_rng(0)
    # tf.nn.lrn semantics vs a plain numpy loop
    x = rng.uniform(-1, 1, (2, 3, 3, 7)).astype(np.float32)
    got = np.asarray(local_response_norm(jnp.asarray(x)))
    want = np.empty_like(x)
    for c in range(7):
        lo, hi = max(0, c - 4), min(7, c + 5)
        ssum = np.sum(x[..., lo:hi] ** 2, axis=-1)
        want[..., c] = x[..., c] / (1.0 + (0.001 / 9.0) * ssum) ** 0.75
    np.testing.assert_allclose(got, want, rtol=1e-5)

    m = CifarNet()
    x32 = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    params = m.init(jax.random.key(0), x32)
    logits, ep = m.apply(params, x32)
    assert logits.shape == (2, 10) and ep["Flatten"].shape == (2, 8 * 8 * 64)
    assert np.all(np.isfinite(np.asarray(logits)))

    l = LeNet()
    x28 = jnp.asarray(rng.uniform(-1, 1, (2, 28, 28, 1)), jnp.float32)
    params = l.init(jax.random.key(0), x28)
    logits, ep = l.apply(params, x28)
    assert logits.shape == (2, 10) and ep["Flatten"].shape == (2, 7 * 7 * 64)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_backbone_factory_new_families():
    from imitation_from_observation_tpu.models.backbones_extra import make_backbone

    assert make_backbone("vgg_19")[0].reps == (2, 2, 4, 4, 4)
    assert make_backbone("vgg_a")[0].reps == (1, 1, 2, 2, 2)
    assert make_backbone("overfeat")[1] == (231, 231)
    assert make_backbone("inception_v1")[1] == (224, 224)
    assert make_backbone("cifarnet")[1] == (32, 32)
    assert make_backbone("lenet")[1] == (28, 28)
    assert make_backbone("alexnet_v2")[1] == (224, 224)


def test_resnet_v2_structure_and_roundtrip(tmp_path):
    """v2 preactivation structure: preact/postnorm BN paths exist, conv3 and
    shortcut are biased bare convs (no BN), forward is finite, and a slim-
    named npz restores leaf-for-leaf (resnet_v2.py:35-74,189-205)."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import (
        ResNetV2,
        load_slim_npz,
    )

    rng = np.random.default_rng(0)
    m = ResNetV2(depth=50, num_classes=7)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)), jnp.float32)
    params = m.init(jax.random.key(1), x)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    assert any("unit_1/bottleneck_v2/preact/gamma" in k for k in keys)
    assert any(k.endswith("postnorm/gamma") for k in keys)
    assert any("bottleneck_v2/conv3/biases" in k for k in keys)
    assert not any("bottleneck_v2/conv3/gamma" in k for k in keys)  # bare conv
    assert any(k.endswith("conv1/biases") for k in keys)  # bare root conv

    logits, ep = m.apply(params, x)
    assert logits.shape == (2, 7) and np.all(np.isfinite(np.asarray(logits)))
    assert ep["block4"].shape[-1] == 2048 and "postnorm" in ep

    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if key.startswith("params/"):
            key = key[len("params/"):]
        for stat in ("gamma", "beta", "moving_mean", "moving_variance"):
            if key.endswith("/" + stat) and "/preact/" not in key and "/postnorm/" not in key:
                key = key[: -len(stat)] + "BatchNorm/" + stat
        out["resnet_v2_50/" + key] = np.asarray(leaf)
    np.savez(tmp_path / "ck.npz", **out)
    restored = load_slim_npz(str(tmp_path / "ck.npz"), params, "resnet_v2_50")
    logits2, _ = m.apply(restored, x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-6)


def test_inception_v2_endpoints():
    """Published inception_v2 shapes at 224 (1024-ch Mixed_5c at 7x7), the
    separable stem's TF kernel layout, and a real small-input forward."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.backbones_extra import InceptionV2

    m = InceptionV2()
    v = jax.eval_shape(lambda: m.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        features_only=True))
    ep = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32),
                          features_only=True), v)
    assert ep["Conv2d_1a_7x7"].shape == (1, 112, 112, 64)
    assert ep["Mixed_3b"].shape == (1, 28, 28, 256)
    assert ep["Mixed_3c"].shape == (1, 28, 28, 320)
    assert ep["Mixed_4a"].shape == (1, 14, 14, 576)
    assert ep["Mixed_4e"].shape == (1, 14, 14, 576)
    assert ep["Mixed_5c"].shape == (1, 7, 7, 1024)
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    shapes = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf.shape
        for path, leaf in flat
    }
    assert shapes["params/Conv2d_1a_7x7/depthwise_weights"] == (7, 7, 3, 8)
    assert shapes["params/Conv2d_1a_7x7/pointwise_weights"] == (1, 1, 24, 64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.key(1), x, features_only=True)
    out = m.apply(params, x, features_only=True)
    assert out["Mixed_5c"].shape == (2, 2, 2, 1024)
    assert np.all(np.isfinite(np.asarray(out["Mixed_5c"])))


def test_inception_v4_endpoints():
    """Published inception_v4 shapes at 299 (Mixed_7d: 8x8x1536), block
    counts (4xA, 7xB, 3xC), and a real small-input forward."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.inception_family import InceptionV4

    m = InceptionV4()
    v = jax.eval_shape(lambda: m.init(
        jax.random.key(0), jnp.zeros((1, 299, 299, 3), jnp.float32),
        features_only=True))
    ep = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((1, 299, 299, 3), jnp.float32),
                          features_only=True), v)
    assert ep["Mixed_3a"].shape == (1, 73, 73, 160)
    assert ep["Mixed_4a"].shape == (1, 71, 71, 192)
    assert ep["Mixed_5a"].shape == (1, 35, 35, 384)
    assert ep["Mixed_5e"].shape == (1, 35, 35, 384)
    assert ep["Mixed_6a"].shape == (1, 17, 17, 1024)
    assert ep["Mixed_6h"].shape == (1, 17, 17, 1024)
    assert ep["Mixed_7a"].shape == (1, 8, 8, 1536)
    assert ep["Mixed_7d"].shape == (1, 8, 8, 1536)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 96, 96, 3)), jnp.float32)
    params = m.init(jax.random.key(1), x, features_only=True)
    out = m.apply(params, x, features_only=True)
    assert out["Mixed_7d"].shape[-1] == 1536
    assert np.all(np.isfinite(np.asarray(out["Mixed_7d"])))


def test_inception_resnet_v2_endpoints():
    """Published inception_resnet_v2 shapes at 299 (Conv2d_7b_1x1:
    8x8x1536), residual-block repeat names, and a small-input forward."""
    import jax
    import jax.numpy as jnp

    from imitation_from_observation_tpu.models.inception_family import (
        InceptionResnetV2,
    )

    m = InceptionResnetV2()
    v = jax.eval_shape(lambda: m.init(
        jax.random.key(0), jnp.zeros((1, 299, 299, 3), jnp.float32),
        features_only=True))
    ep = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((1, 299, 299, 3), jnp.float32),
                          features_only=True), v)
    assert ep["MaxPool_5a_3x3"].shape == (1, 35, 35, 192)
    assert ep["Mixed_5b"].shape == (1, 35, 35, 320)
    assert ep["Mixed_6a"].shape == (1, 17, 17, 1088)
    assert ep["Mixed_7a"].shape == (1, 8, 8, 2080)
    assert ep["Conv2d_7b_1x1"].shape == (1, 8, 8, 1536)
    # slim's repeat scope names (the checkpoint contract): Repeat/block35_N,
    # Repeat_1/block17_N, Repeat_2/block8_N + the final unscaled Block8
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    keys = {"/".join(str(getattr(p, "key", p)) for p in path) for path, _ in flat}
    assert any("Repeat/block35_10/Conv2d_1x1/biases" in k for k in keys)
    assert any("Repeat_1/block17_20/" in k for k in keys)
    assert any("Repeat_2/block8_9/" in k for k in keys)
    assert any(k.startswith("params/Block8/") for k in keys)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 96, 96, 3)), jnp.float32)
    params = m.init(jax.random.key(1), x, features_only=True)
    out = m.apply(params, x, features_only=True)
    assert out["Conv2d_7b_1x1"].shape[-1] == 1536
    assert np.all(np.isfinite(np.asarray(out["Conv2d_7b_1x1"])))


def test_backbone_factory_inception_family():
    from imitation_from_observation_tpu.models.backbones_extra import make_backbone

    assert make_backbone("inception_v4")[1] == (299, 299)
    assert make_backbone("inception_resnet_v2")[1] == (299, 299)
