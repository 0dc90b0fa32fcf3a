"""Pallas kernel correctness in TPU interpreter mode (CPU-hosted)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import imitation_from_observation_tpu.ops.pallas.fused as fused


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setattr(fused, "pallas_enabled", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("m,k,n", [(100, 200, 64), (128, 1024, 128), (3, 7, 5)])
def test_dense_lrelu_forward(force_pallas, rng, m, k, n):
    x = rng.standard_normal((m, k), dtype=np.float32)
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.1
    b = rng.standard_normal(n, dtype=np.float32)
    got = np.asarray(fused.dense_lrelu(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    pre = x @ w + b
    ref = np.maximum(pre, 0.2 * pre)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dense_lrelu_grad(force_pallas, rng):
    x = jnp.asarray(rng.standard_normal((32, 48), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((48, 24), dtype=np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(24, dtype=np.float32))

    def loss_pallas(x, w, b):
        return jnp.sum(fused.dense_lrelu(x, w, b) ** 2)

    def loss_ref(x, w, b):
        pre = x @ w + b
        return jnp.sum(jnp.maximum(pre, 0.2 * pre) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("m,n,f", [(50, 60, 30), (128, 128, 256)])
def test_pairwise_sqdist(force_pallas, rng, m, n, f):
    a = rng.standard_normal((m, f), dtype=np.float32)
    b = rng.standard_normal((n, f), dtype=np.float32)
    got = np.asarray(fused.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("m,n,f", [(128, 128, 131072), (100, 96, 131000)])
def test_pairwise_sqdist_ftiled(force_pallas, rng, m, n, f):
    """The ContextFeat production shape F = 8*8*2048 = 131072 — whole-F strips
    are 64 MB/operand and OOMed VMEM (round-3 strike-inception crash); this
    exercises the F-tiled accumulator path, incl. non-multiple-of-tile_f F."""
    a = rng.standard_normal((m, f), dtype=np.float32)
    b = rng.standard_normal((n, f), dtype=np.float32)
    got = np.asarray(fused.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    # reference via the expansion in float64 (materializing [m, n, f] would
    # need ~8.6 GB at this shape)
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    ref = (
        (a64 * a64).sum(1)[:, None]
        - 2.0 * a64 @ b64.T
        + (b64 * b64).sum(1)[None, :]
    )
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3 * f**0.5)


def test_fallback_path_matches(rng):
    """With pallas disabled (CPU default) results must equal the reference
    math — the model runs this path in CI."""
    x = rng.standard_normal((10, 20), dtype=np.float32)
    w = rng.standard_normal((20, 8), dtype=np.float32)
    b = rng.standard_normal(8, dtype=np.float32)
    assert not fused.pallas_enabled()
    got = np.asarray(fused.dense_lrelu(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    pre = x @ w + b
    np.testing.assert_allclose(got, np.maximum(pre, 0.2 * pre), rtol=1e-5, atol=1e-5)
