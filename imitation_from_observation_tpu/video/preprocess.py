"""Frame preprocessing: resize + rescale to [-1, 1].

The reference's ``transform`` (scripts/train_script.py:16-20, also
arm_shaping.py:12-16) is ``scipy.misc.imresize(image, [h, w]) / 127.5 - 1``.
``scipy.misc.imresize`` is PIL bilinear resize returning uint8 — the host
path here reproduces that bit-exactly via PIL.

The device path (:func:`device_preprocess`) is the TPU-native equivalent: a
jittable resize+normalize that fuses into downstream model kernels, used on
the hot reward path where frames arrive as uint8 render output. Its bilinear
kernel is XLA's (float, no uint8 rounding), so it differs from the host path
by <1/255 per pixel; training and reward each use one path consistently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def imresize_uint8(image: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Bit-exact ``scipy.misc.imresize(image, [h, w])``: PIL bilinear, uint8."""
    h, w = size
    if image.dtype != np.uint8:
        # scipy.misc.imresize scaled float input to the uint8 range
        lo, hi = float(image.min()), float(image.max())
        scale = 255.0 / (hi - lo) if hi != lo else 0.0
        image = ((image - lo) * scale).astype(np.uint8)
    return np.asarray(Image.fromarray(image).resize((w, h), Image.BILINEAR))


def transform(
    image: np.ndarray, resize_height: int, resize_width: int, rescale: bool = True
) -> np.ndarray:
    """Reference ``transform`` (train_script.py:16-20)."""
    resized = imresize_uint8(image, (resize_height, resize_width))
    if rescale:
        return np.asarray(resized, dtype=np.float64) / 127.5 - 1.0
    return resized


def inverse_transform(images):
    """[-1,1] -> [0,1] (train_script.py:21-22)."""
    return (images + 1.0) / 2.0


def device_preprocess(
    frames: jax.Array, size: tuple[int, int], rescale: bool = True
) -> jax.Array:
    """Jittable resize (+ rescale to [-1,1]) for uint8 frames [..., H, W, C].

    TPU-native replacement for the render->imresize hop the reference does
    per step on host (pusher3dof.py:38-40): frames ship to device as uint8
    (minimal HBM traffic) and resize/normalize fuse into the consumer graph.
    """
    h, w = size
    x = frames.astype(jnp.float32)
    batch_shape = frames.shape[:-3]
    out_shape = (*batch_shape, h, w, frames.shape[-1])
    x = jax.image.resize(x, out_shape, method="linear")
    if rescale:
        x = x / 127.5 - 1.0
    return x
