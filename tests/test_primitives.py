"""Primitive-op parity tests against an independent oracle (torch CPU).

The reference's conv2d/deconv2d (arm_shaping.py:22-85) are TF1
``tf.nn.conv2d(..., 'SAME')`` / ``tf.nn.conv2d_transpose(..., 'SAME')``.
torch's conv2d/conv_transpose2d with explicit asymmetric padding reproduce
those semantics exactly, giving an oracle that shares no code with our JAX
implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imitation_from_observation_tpu.ops import conv2d, deconv2d, linear, lrelu


def tf_same_pads(in_size: int, stride: int, k: int) -> tuple[int, int]:
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    return total // 2, total - total // 2


def torch_conv2d_same(x, w, b, stride):
    # x NHWC, w HWIO -> torch NCHW, OIHW with TF 'SAME' asymmetric padding
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).double()
    ph = tf_same_pads(x.shape[1], stride, w.shape[0])
    pw = tf_same_pads(x.shape[2], stride, w.shape[1])
    xt = F.pad(xt, (pw[0], pw[1], ph[0], ph[1]))
    out = F.conv2d(xt, wt, torch.from_numpy(b).double(), stride=stride)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


def torch_deconv2d_same(x, w, b, stride):
    # TF conv2d_transpose with SAME: output = input*stride; kernel [k,k,out,in].
    # torch conv_transpose2d(padding=p, output_padding=op) where the TF result
    # equals p = ceil((k - stride) / 2)... derive instead from the identity:
    # TF pads implicitly so that conv2d(output, w, 'SAME', stride) is the
    # forward map. Equivalent torch call: conv_transpose2d with
    # padding=(k - stride - pad_end) as computed below.
    k = w.shape[0]
    out_h, out_w = x.shape[1] * stride, x.shape[2] * stride
    ph = tf_same_pads(out_h, stride, k)
    pw = tf_same_pads(out_w, stride, k)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()
    # torch kernel layout [in, out, kh, kw]; TF deconv kernel is [kh, kw, out, in]
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).double()
    full = F.conv_transpose2d(xt, wt, stride=stride)  # no crop
    # TF crops pad_begin from the top/left and keeps out_size
    out = full[:, :, ph[0] : ph[0] + out_h, pw[0] : pw[0] + out_w]
    out = out + torch.from_numpy(b).double().reshape(1, -1, 1, 1)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("hw,stride,k", [((48, 48), 2, 5), ((36, 64), 2, 5), ((36, 64), 1, 5), ((8, 8), 2, 3), ((7, 9), 2, 4)])
def test_conv2d_matches_tf_same(rng, hw, stride, k):
    x = rng.standard_normal((2, *hw, 3), dtype=np.float32)
    w = rng.standard_normal((k, k, 3, 8), dtype=np.float32) * 0.1
    b = rng.standard_normal(8, dtype=np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride))
    ref = torch_conv2d_same(x, w, b, stride)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw,stride,k", [((24, 24), 2, 5), ((18, 32), 2, 5), ((18, 32), 1, 5), ((4, 4), 2, 3)])
def test_deconv2d_matches_tf_same(rng, hw, stride, k):
    x = rng.standard_normal((2, *hw, 8), dtype=np.float32)
    w = rng.standard_normal((k, k, 4, 8), dtype=np.float32) * 0.1  # [k,k,out,in]
    b = rng.standard_normal(4, dtype=np.float32)
    ours = np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride))
    ref = torch_deconv2d_same(x, w, b, stride)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_conv_deconv_adjoint(rng):
    """deconv2d must be the exact adjoint of conv2d (TF's definition):
    <conv(x), y> == <x, deconv(y)> with the same [k,k,out,in] kernel."""
    x = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
    y = rng.standard_normal((1, 8, 8, 6), dtype=np.float32)
    w = rng.standard_normal((5, 5, 3, 6), dtype=np.float32) * 0.1
    cx = conv2d(jnp.asarray(x), jnp.asarray(w), stride=2)
    # deconv kernel layout is [k,k,out_of_deconv,in_of_deconv] = [k,k,3,6]
    dy = deconv2d(jnp.asarray(y), jnp.asarray(np.transpose(w, (0, 1, 2, 3))), stride=2)
    lhs = float(jnp.sum(cx * y))
    rhs = float(jnp.sum(jnp.asarray(x) * dy))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_lrelu_and_linear(rng):
    x = jnp.asarray(rng.standard_normal((4, 7), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(lrelu(x)), np.maximum(x, 0.2 * x), rtol=1e-6)
    w = jnp.asarray(rng.standard_normal((7, 3), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(3, dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(linear(x, w, b)), np.asarray(x) @ np.asarray(w) + np.asarray(b), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("hw,stride,k", [((24, 24), 2, 5), ((4, 4), 2, 3)])
def test_phase_deconv_matches_conv_transpose(rng, hw, stride, k, monkeypatch):
    """The opt-in phase-decomposed deconv path is numerically exact."""
    monkeypatch.setenv("IFO_TPU_PHASE_DECONV", "1")
    x = rng.standard_normal((2, *hw, 8), dtype=np.float32)
    w = rng.standard_normal((k, k, 4, 8), dtype=np.float32) * 0.1
    b = rng.standard_normal(4, dtype=np.float32)
    ours = np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride))
    ref = torch_deconv2d_same(x, w, b, stride)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
