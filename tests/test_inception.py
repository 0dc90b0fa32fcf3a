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
