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
