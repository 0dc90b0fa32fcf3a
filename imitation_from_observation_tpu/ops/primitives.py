"""TF1-compatible NN primitives on XLA:TPU.

The reference model zoo is built from four primitives defined at
``gym/envs/mujoco/arm_shaping.py:18-85``: ``lrelu`` (leak 0.2), ``conv2d``
(5x5, stride 2, SAME, truncated-normal 0.02 init, bias), ``deconv2d``
(``tf.nn.conv2d_transpose``, SAME, normal 0.02 init, bias) and ``linear``
(normal 0.02 init, bias). These functions reproduce those semantics exactly
(padding arithmetic, kernel layouts, initializers) as pure JAX functions so a
TF1 checkpoint converted to numpy drops straight in.

All convs run in NHWC with HWIO kernels — the layout XLA:TPU tiles onto the
MXU without transposes. Compute dtype is the caller's; accumulation is f32
via ``preferred_element_type``.
"""

from __future__ import annotations

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
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def deconv2d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int | tuple[int, int] = 2,
) -> jax.Array:
    """Transposed 2-D convolution, NHWC -> NHWC with output = input * stride.

    Matches ``tf.nn.conv2d_transpose`` with SAME padding
    (arm_shaping.py:63-85): the true adjoint of :func:`conv2d`, i.e. the
    kernel is spatially flipped and its in/out channel roles swapped. The
    kernel layout is HWOI — height, width, *output* channels, input channels
    — the same layout TF uses ([k, k, out_c, in_c]), so converted reference
    checkpoints load unchanged.
    """
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    # transpose_kernel=True means the kernel is laid out for the *forward*
    # conv being transposed, i.e. HWIO with I = this deconv's output channels
    # — which is exactly TF's [k, k, out_c, in_c].
    out = lax.conv_transpose(
        x,
        w.astype(x.dtype),
        strides=s,
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """Dense layer ``x @ w + b`` (arm_shaping.py:48-61), f32 accumulation."""
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(x.dtype)
