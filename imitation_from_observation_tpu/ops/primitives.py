"""TF1-compatible NN primitives on XLA:TPU.

The reference model zoo is built from four primitives defined at
``gym/envs/mujoco/arm_shaping.py:18-85``: ``lrelu`` (leak 0.2), ``conv2d``
(5x5, stride 2, SAME, truncated-normal 0.02 init, bias), ``deconv2d``
(``tf.nn.conv2d_transpose``, SAME, normal 0.02 init, bias) and ``linear``
(normal 0.02 init, bias). These functions reproduce those semantics exactly
(padding arithmetic, kernel layouts, initializers) as pure JAX functions so a
TF1 checkpoint converted to numpy drops straight in.

All convs run in NHWC with HWIO kernels — the layout XLA:TPU tiles onto the
MXU without transposes. Compute dtype is the caller's. For f32 inputs,
``preferred_element_type=float32`` is requested explicitly (a no-op kept for
documentation); for bf16 inputs it must NOT be: an upcasting
``preferred_element_type`` makes the primitive's autodiff transpose rule see
an f32 cotangent against bf16 operands and fail ("requires arguments to have
the same dtypes"), and XLA:TPU accumulates bf16 conv/dot partials in f32 on
the MXU regardless.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Initializers (arm_shaping.py:25,52,68): conv uses truncated normal, linear
# and deconv use plain normal, all with stddev 0.02; biases start at 0.
conv_kernel_init = jax.nn.initializers.truncated_normal(stddev=0.02)
linear_kernel_init = jax.nn.initializers.normal(stddev=0.02)
deconv_kernel_init = jax.nn.initializers.normal(stddev=0.02)


def lrelu(x: jax.Array, leak: float = 0.2) -> jax.Array:
    """Leaky ReLU, reference arm_shaping.py:18: ``max(x, leak*x)``."""
    return jnp.maximum(x, leak * x)


def _acc_dtype(x: jax.Array):
    """preferred_element_type for MXU calls: f32 for f32 inputs (explicit
    no-op), None for bf16 (see module docstring — an upcasting PET breaks
    the AD transpose rule; the MXU accumulates bf16 in f32 anyway)."""
    return jnp.float32 if x.dtype == jnp.float32 else None


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int | tuple[int, int] = 2,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC, SAME padding.

    Matches ``tf.nn.conv2d(..., strides=[1,s,s,1], padding='SAME')``
    (arm_shaping.py:22-31): with stride s and kernel k, total padding is
    ``max((ceil(in/s)-1)*s + k - in, 0)`` split low-side-first — which is
    exactly XLA's 'SAME' convention.
    """
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=s,
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=_acc_dtype(x),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def _same_pad_lo(out_size: int, stride: int, k: int) -> int:
    """Low-side padding of the *forward* SAME conv this deconv transposes."""
    total = max((-(-out_size // stride) - 1) * stride + k - out_size, 0)
    return total // 2


def _deconv2d_phase(x: jax.Array, w: jax.Array, s: int) -> jax.Array:
    """Exact strided transposed conv via output-phase decomposition.

    The adjoint of a stride-s SAME conv writes output pixel ``y`` as
    ``sum_k w[k] * x[(y + pad_lo - k) / s]`` over taps with exact division.
    Grouping outputs by phase ``y mod s`` turns the one dilated conv (which
    XLA:TPU executes over an s-times zero-dilated input, wasting ~s^2 of the
    MXU work) into s*s dense stride-1 convs over ``x`` with disjoint kernel
    tap subsets, interleaved back — identical numerics, ~s^2 fewer MACs.
    """
    B, H, W, IC = x.shape
    k = w.shape[0]
    OC = w.shape[2]
    pad_lo_h = _same_pad_lo(H * s, s, k)
    pad_lo_w = _same_pad_lo(W * s, s, k)

    def taps(phase: int, pad_lo: int):
        ks = [kk for kk in range(k) if (phase + pad_lo - kk) % s == 0]
        offs = [(phase + pad_lo - kk) // s for kk in ks]
        order = sorted(range(len(ks)), key=lambda i: offs[i])
        ks = [ks[i] for i in order]
        offs = [offs[i] for i in order]
        lo = -offs[0]
        hi = len(ks) - 1 - lo
        return ks, (lo, hi)

    phases = []
    for py in range(s):
        ky, pad_h = taps(py, pad_lo_h)
        row = []
        for px in range(s):
            kx, pad_w = taps(px, pad_lo_w)
            # w is [k, k, OC, IC]; the adjoint conv's HWIO kernel is
            # w[ky, kx].transpose -> [ty, tx, IC, OC]
            wk = w[jnp.asarray(ky)][:, jnp.asarray(kx)].transpose(0, 1, 3, 2)
            out = lax.conv_general_dilated(
                x,
                wk.astype(x.dtype),
                window_strides=(1, 1),
                padding=(pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=_acc_dtype(x),
            )
            row.append(out)
        phases.append(row)
    # interleave: out[b, s*i+py, s*j+px, c] = phases[py][px][b, i, j, c]
    grid = jnp.stack([jnp.stack(row) for row in phases])  # [s, s, B, H, W, OC]
    out = grid.transpose(2, 3, 0, 4, 1, 5).reshape(B, H * s, W * s, OC)
    return out


def deconv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int | tuple[int, int] = 2,
    out_hw: tuple[int, int] | None = None,
) -> jax.Array:
    """Transposed 2-D convolution, NHWC -> NHWC with output = input * stride.

    ``out_hw`` reproduces TF's *explicit* ``output_shape``: any size with
    ``ceil(out/s) == in`` is valid (the reference's feature-map variant passes
    skip-tensor shapes, e.g. 1x1 -> 1x1 at stride 2, arm_shaping.py:1747-1761).
    When given and different from ``in*s``, the full transposed conv is
    computed and cropped by the forward-SAME low padding — the exact TF
    semantics.

    Matches ``tf.nn.conv2d_transpose`` with SAME padding
    (arm_shaping.py:63-85): the true adjoint of :func:`conv2d`, i.e. the
    kernel is spatially flipped and its in/out channel roles swapped. The
    kernel layout is HWOI — height, width, *output* channels, input channels
    — the same layout TF uses ([k, k, out_c, in_c]), so converted reference
    checkpoints load unchanged.

    With ``IFO_TPU_PHASE_DECONV=1``, strided cases route through
    :func:`_deconv2d_phase` (exact, ~stride^2 fewer useful MACs than a
    zero-dilated lowering). Measured on v5e the XLA lowering is already
    on par, so the default stays with the single fused conv_transpose —
    the flag exists for architectures where dilated convs lower poorly.
    """
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if out_hw is not None and tuple(out_hw) != (x.shape[1] * s[0], x.shape[2] * s[1]):
        k_h, k_w = w.shape[0], w.shape[1]
        oh, ow = out_hw
        if -(-oh // s[0]) != x.shape[1] or -(-ow // s[1]) != x.shape[2]:
            raise ValueError(f"out_hw {out_hw} invalid for input {x.shape[1:3]} stride {s}")
        full = lax.conv_transpose(
            x,
            w.astype(x.dtype),
            strides=s,
            padding=[(k_h - 1, k_h - 1), (k_w - 1, k_w - 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
            preferred_element_type=_acc_dtype(x),
        )
        lo_h = max(((-(-oh // s[0])) - 1) * s[0] + k_h - oh, 0) // 2
        lo_w = max(((-(-ow // s[1])) - 1) * s[1] + k_w - ow, 0) // 2
        out = full[:, lo_h : lo_h + oh, lo_w : lo_w + ow, :]
        if b is not None:
            out = out + b.astype(out.dtype)
        return out.astype(x.dtype)
    if s[0] == s[1] and s[0] > 1 and os.environ.get("IFO_TPU_PHASE_DECONV") == "1":
        out = _deconv2d_phase(x, w, s[0])
    else:
        # transpose_kernel=True means the kernel is laid out for the *forward*
        # conv being transposed, i.e. HWIO with I = this deconv's output
        # channels — which is exactly TF's [k, k, out_c, in_c].
        out = lax.conv_transpose(
            x,
            w.astype(x.dtype),
            strides=s,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
            preferred_element_type=_acc_dtype(x),
        )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """Dense layer ``x @ w + b`` (arm_shaping.py:48-61), f32 accumulation."""
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=_acc_dtype(x))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)
