"""Model-zoo long-tail tests: every variant builds, runs, and has its
distinguishing structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imitation_from_observation_tpu.core.config import TranslationModelConfig
from imitation_from_observation_tpu.models import MODEL_REGISTRY, build_model
from imitation_from_observation_tpu.models.zoo_variants import (
    AutoAE,
    BatchNormInfer,
    CONTEXT_VARIANTS,
    ReachAE,
    SubspaceAE,
    TimeClassifier,
    TimeRegressor,
)

HW = 16


def test_registry_has_all_variants():
    for name in CONTEXT_VARIANTS:
        assert name in MODEL_REGISTRY
    assert len(MODEL_REGISTRY) >= 14


# per-variant expectations for the generic run test
RESIDUAL = {"context_res", "context_res_translate", "context_ae_inception"}
HAS_OUT2 = {
    "context_res_translate",
    "context_vanilla",
    "context_ae_fixed",
    "context_ae_tied",
    "context_vanilla_drop",
    "context_ae_inception",
}


def _build_small(name):
    if name == "context_ae_inception":
        cfg = TranslationModelConfig(
            model=name, feature_hw=(8, 8), feature_filters=8, feat_size=32,
            feature_channels=16,
        )
    else:
        cfg = TranslationModelConfig(model=name, image_size=(HW, HW), base_filters=8, feat_size=32)
    return build_model(cfg)


@pytest.mark.parametrize("name", sorted(CONTEXT_VARIANTS))
def test_context_variant_runs(name):
    model = _build_small(name)
    shape = (4, 8, 8, 16) if name == "context_ae_inception" else (4, HW, HW, 3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    assert outs.out.shape == x.shape
    if name in RESIDUAL:
        outs2 = model.apply(params, x, x + 1.0, x)
        assert not np.allclose(np.asarray(outs.out), np.asarray(outs2.out))
    if name in HAS_OUT2:
        assert outs.out2.shape == x.shape
        # out depends on (src, ctx) only; the tgt branch feeds out2/tgt_z
        outs_b = model.apply(params, x, x, x + 0.5)
        np.testing.assert_allclose(np.asarray(outs.out), np.asarray(outs_b.out), atol=1e-7)
        assert not np.array_equal(np.asarray(outs.tgt_z), np.asarray(outs_b.tgt_z))
    # translate() path works for the reward engine
    z, out = model.apply(params, x, x, method="translate")
    np.testing.assert_allclose(np.asarray(out), np.asarray(outs.out), rtol=1e-4, atol=1e-5)
    # every variant computes its reference loss (canonical 3-term for the
    # inception variant, which defines no variant_loss)
    loss_fn = getattr(model, "variant_loss", None)
    if loss_fn is not None:
        loss, metrics = loss_fn(outs, x)
        assert np.isfinite(float(loss)) and "loss" in metrics


def _param_paths(params):
    paths = set()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for key_path, _ in flat:
        keys = [str(getattr(k, "key", k)) for k in key_path]
        paths.add("/".join(keys[1:]))  # drop 'params'
    return paths


def _init_paths(name):
    model = _build_small(name)
    shape = (4, 8, 8, 16) if name == "context_ae_inception" else (4, HW, HW, 3)
    x = jnp.zeros(shape, jnp.float32)
    return _param_paths(model.init(jax.random.key(0), x, x, x))


def test_topology_context_ae():
    """ContextAE:459 — BN c_bn1..4 but NOT c_bn0 (raw first conv, :482), BN
    decoder d_bn0..3, separate conv/conv_context encoders, NO translator."""
    p = _init_paths("context_ae")
    for scope in ("conv", "conv_context"):
        assert f"{scope}/c_bn1/gamma" in p and f"{scope}/c_bn4/gamma" in p
        assert f"{scope}/c_bn0/gamma" not in p
    assert "deconv/d_bn0/gamma" in p and "deconv/d_bn3/gamma" in p
    assert not any("trans" in q or "zh0" in q for q in p)


def test_topology_context_skip_ae():
    """ContextSkipAE:559 — BN on ALL convs (c_bn0..4) + BN skip decoder."""
    p = _init_paths("context_skip_ae")
    for scope in ("conv", "conv_context"):
        for i in range(5):
            assert f"{scope}/c_bn{i}/gamma" in p, f"missing {scope}/c_bn{i}"
    assert "deconv/d_bn0/gamma" in p
    # skip decoder: d_h1 input channels = 8d (bottom) + 8d (ctx_h3 skip)
    model = _build_small("context_skip_ae")
    x = jnp.zeros((4, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    d1 = params["params"]["deconv"]["d_h1"]["w"]
    assert d1.shape[-1] == 2 * 8 * 8  # concat doubles the input channels


def test_topology_context_nobn_ae():
    """ContextNoBNAE:662 — zero BN params anywhere; block simloss in loss."""
    p = _init_paths("context_nobn_ae")
    assert not any("bn" in q for q in p), sorted(q for q in p if "bn" in q)
    from imitation_from_observation_tpu.models.zoo_variants import ContextNoBNAEVariant
    from imitation_from_observation_tpu.models.context import TranslationOutputs

    # golden: variance-normalized block simloss over 4 blocks, /3 per term
    rng = np.random.default_rng(3)
    z = rng.standard_normal((8, 5)).astype(np.float32)
    out = jnp.zeros((8, 4, 4, 3))
    outs = TranslationOutputs(out=out, out2=out, trans_z=jnp.asarray(z), tgt_z=jnp.asarray(z), src_z=jnp.asarray(z))
    tgt = np.zeros((8, 4, 4, 3), np.float32)
    loss, m = ContextNoBNAEVariant.variant_loss(outs, jnp.asarray(tgt))
    sim_np = sum(np.mean((z[j * 2 : (j + 1) * 2] - z[(j + 1) * 2 : (j + 2) * 2]) ** 2) / 3 for j in range(3))
    sim_np /= np.mean(np.var(z, axis=0))
    np.testing.assert_allclose(float(m["simloss"]), sim_np, rtol=1e-5)
    np.testing.assert_allclose(float(loss), 1e3 * sim_np, rtol=1e-5)


def test_topology_context_ae_deconv():
    """ContextAEDeconv:773 — encoder scope conv_input shared by src/tgt with
    NO final lrelu; loss matches the 2nd-deconv feature maps (1e2 weight)."""
    p = _init_paths("context_ae_deconv")
    assert any(q.startswith("conv_input/") for q in p)
    assert not any(q.startswith("conv/") for q in p)
    model = _build_small("context_ae_deconv")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, HW, HW, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    # trans_z/tgt_z are the flattened h2 maps: HW/4 x HW/4 x 2d
    assert outs.trans_z.shape == (2, (HW // 4) * (HW // 4) * 16)
    from imitation_from_observation_tpu.models.zoo_variants import ContextAEDeconvVariant

    loss, m = ContextAEDeconvVariant.variant_loss(outs, x)
    expect = float(m["recon1"]) + 1e2 * float(m["simloss"])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-6)


def test_topology_context_res_translate_and_vanilla():
    """ContextResTranslate:937 vs ContextVanilla:1040 — same zh0/translate_z
    single-hidden translator; only the residual and the simloss form differ."""
    for name in ("context_res_translate", "context_vanilla"):
        p = _init_paths(name)
        assert "zh0/w" in p and "translate_z/w" in p
        assert "zh1/w" not in p  # single hidden layer (unlike ae_fixed)
        assert "conv_context/h0_conv/w" in p
    # vanilla's loss normalizes sim by var(tgt_z); res_translate uses sum/2
    from imitation_from_observation_tpu.models.context import TranslationOutputs
    from imitation_from_observation_tpu.models.zoo_variants import (
        ContextResTranslateVariant,
        ContextVanillaVariant,
    )

    rng = np.random.default_rng(5)
    tz, gz = rng.standard_normal((2, 6, 5)).astype(np.float32)
    out = jnp.zeros((6, 4, 4, 3))
    outs = TranslationOutputs(out=out, out2=out, trans_z=jnp.asarray(tz), tgt_z=jnp.asarray(gz), src_z=jnp.asarray(tz))
    tgt = jnp.zeros((6, 4, 4, 3))
    _, m1 = ContextResTranslateVariant.variant_loss(outs, tgt)
    np.testing.assert_allclose(float(m1["simloss"]), 0.5 * np.sum((tz - gz) ** 2), rtol=1e-5)
    _, m2 = ContextVanillaVariant.variant_loss(outs, tgt)
    np.testing.assert_allclose(
        float(m2["simloss"]), np.mean((tz - gz) ** 2) * 1e3 / np.mean(np.var(gz, axis=0)), rtol=1e-4
    )


def test_topology_context_ae_fixed():
    """ContextAEFixed:1149 — 3 hidden translator layers of width 2*featsize
    (zh0/zh1/zh2) + translate_z; ctx encoder is a third weight set
    (trans_ctx); loss is recon1+recon2 ONLY."""
    p = _init_paths("context_ae_fixed")
    model = _build_small("context_ae_fixed")
    x = jnp.zeros((2, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    pp = params["params"]
    assert pp["zh0"]["w"].shape == (64, 64)  # 2f in (concat), 2f out
    assert pp["zh1"]["w"].shape == (64, 64)
    assert pp["zh2"]["w"].shape == (64, 64)
    assert pp["translate_z"]["w"].shape == (64, 32)
    assert "trans_ctx" in pp and "conv_input" in pp and "conv_context" not in pp
    from imitation_from_observation_tpu.models.zoo_variants import ContextAEFixedVariant

    outs = model.apply(params, x, x, x)
    loss, m = ContextAEFixedVariant.variant_loss(outs, x)
    assert "simloss" not in m  # :1256 — excluded from the loss
    np.testing.assert_allclose(float(loss), float(m["recon1"]) + float(m["recon2"]), rtol=1e-6)


def test_topology_context_ae_tied_and_drop():
    """ContextAETied:1356 / ContextVanillaDrop:1478 — ONE tied encoder
    (conv_input only), single-linear translator translate_z (no zh0);
    ctx latent skips the final lrelu while src/tgt don't."""
    for name in ("context_ae_tied", "context_vanilla_drop"):
        p = _init_paths(name)
        assert not any(q.startswith(("conv_context/", "conv/")) for q in p)
        assert "translate_z/w" in p and "zh0/w" not in p
        enc_paths = [q for q in p if q.startswith("conv_input/")]
        assert len(enc_paths) == 12  # 4 convs + h4_lin + hz_lin, w+b each
    # tied-weights asymmetry (:1399-1405): ONE encoder for src and ctx, but
    # the ctx latent skips the final lrelu. Encoding the SAME image both
    # ways must therefore satisfy src_z == lrelu(ctx_z) exactly.
    model = _build_small("context_ae_tied")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, HW, HW, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    raw_z = np.asarray(
        model.apply(params, x, method=lambda m, v: m._img_enc(v, final_act=False))[1]
    )
    src_z = np.asarray(outs.src_z)
    assert (raw_z < 0).any()  # the raw ctx latent really has negative entries
    np.testing.assert_allclose(np.maximum(raw_z, 0.2 * raw_z), src_z, rtol=1e-6)


def test_topology_context_ae_inception():
    """ContextAEInception:1686 — feature-map residual model; decoder output
    sizes follow the ctx skip ceil-chain (8x8 -> 4,2,1,1), out/out2 both
    carry the +ctx residual."""
    model = _build_small("context_ae_inception")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 16)), jnp.float32)
    params = model.init(jax.random.key(0), x, x, x)
    outs = model.apply(params, x, x, x)
    assert outs.out.shape == x.shape and outs.out2.shape == x.shape
    # both outputs carry the residual
    outs_shift = model.apply(params, x, x + 1.0, x)
    assert not np.allclose(np.asarray(outs.out2), np.asarray(outs_shift.out2))
    # no variant_loss: trains with the canonical 3-term loss (:1782-1786)
    assert getattr(model, "variant_loss", None) is None


def test_batch_norm_infer_is_learned_affine():
    """The reference always runs BN with is_training=False -> frozen 0/1
    stats, i.e. an affine map at init: y == x."""
    bn = BatchNormInfer()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.float32)
    params = bn.init(jax.random.key(0), x)
    y = bn.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * (1 + 1e-5) ** -0.5, rtol=1e-4)


def test_auto_ae_and_reach_ae():
    for cls in [AutoAE, ReachAE]:
        model = cls(base_filters=8, feat_size=32, image_size=(HW, HW))
        x = jnp.zeros((2, HW, HW, 3), jnp.float32)
        params = model.init(jax.random.key(0), x)
        out, z = model.apply(params, x)
        assert out.shape == x.shape and z.shape == (2, 32)


def test_time_models():
    reg = TimeRegressor(base_filters=8, feat_size=32)
    x = jnp.zeros((3, HW, HW, 3), jnp.float32)
    p = reg.init(jax.random.key(0), x)
    assert reg.apply(p, x).shape == (3,)
    clf = TimeClassifier(n_classes=10, base_filters=8, feat_size=32)
    p = clf.init(jax.random.key(0), x)
    assert clf.apply(p, x).shape == (3, 10)


def test_subspace_ae():
    model = SubspaceAE(base_filters=8, feat_size=32, image_size=(HW, HW))
    vids = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, HW, HW, 3)), jnp.float32)
    params = model.init(jax.random.key(0), vids)
    outs, simloss = model.apply(params, vids)
    assert outs.shape == vids.shape
    assert float(simloss) > 0
    # the two decoders are separate parameter stacks
    top = set(params["params"].keys())
    assert "deconv0" in top and "deconv1" in top
