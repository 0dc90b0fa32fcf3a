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


@pytest.mark.parametrize("name", sorted(CONTEXT_VARIANTS))
def test_context_variant_runs(name):
    cfg = TranslationModelConfig(model=name, image_size=(HW, HW), base_filters=8, feat_size=32)
    model = build_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, HW, HW, 3)), jnp.float32)
    rngs = {"params": jax.random.key(0)}
    if CONTEXT_VARIANTS[name].get("dropout_rate"):
        rngs["dropout"] = jax.random.key(1)
    params = model.init(rngs, x, x, x)
    outs = model.apply(params, x, x, x)
    assert outs.out.shape == x.shape
    # residual variants: out must move with ctx
    if CONTEXT_VARIANTS[name].get("residual"):
        outs2 = model.apply(params, x, x + 1.0, x)
        assert not np.allclose(np.asarray(outs.out), np.asarray(outs2.out))
    # tied variants share one encoder; untied have conv_context params
    top = set(params["params"].keys())
    if CONTEXT_VARIANTS[name].get("tied_ctx_encoder"):
        assert "conv_context" not in top
    else:
        assert "conv_context" in top
    # translate() path works for the reward engine
    z, out = model.apply(params, x, x, method="translate")
    np.testing.assert_allclose(np.asarray(out), np.asarray(outs.out), rtol=1e-4, atol=1e-5)


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
