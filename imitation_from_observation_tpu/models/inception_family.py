"""Inception-v4 and Inception-ResNet-v2 (flax), slim-compatible.

The last two backbone families of the reference's vendored slim zoo
(``nets/inception_v4.py``, ``nets/inception_resnet_v2.py``) — rebuilt like
``models/inception_v3.py``: identical topology and endpoint/variable names
(checkpoint-conversion contract), inference-oriented scale-free BN (stored
statistics, eps 1e-3), NHWC, ``features_only`` endpoint dicts.

- :class:`InceptionV4` ≙ ``nets/inception_v4.py``: v4 stem (Mixed_3a/4a/5a
  concat-reduction stem), 4x inception-A (Mixed_5b-5e), reduction-A
  (Mixed_6a), 7x inception-B (Mixed_6b-6h), reduction-B (Mixed_7a), 3x
  inception-C (Mixed_7b-7d, with the forked 1x3/3x1 tails), 1536-ch output.
- :class:`InceptionResnetV2` ≙ ``nets/inception_resnet_v2.py``: v3-like
  stem, Mixed_5b, 10x block35 (scale 0.17), Mixed_6a reduction, 20x block17
  (scale 0.10), Mixed_7a 4-branch reduction, 9x block8 (scale 0.20) + one
  unactivated block8, Conv2d_7b_1x1 (1536). Residual up-projections are
  biased bare convs (``normalizer_fn=None, activation_fn=None`` in slim).
  The AuxLogits tower is omitted (inference/feature use; the reference
  never calls it either — nets are vendored-unused except inception_v3).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from imitation_from_observation_tpu.models.inception_v3 import (
    ConvBN,
    _B,
    _Branch,
)


class _BareConv1x1(nn.Module):
    """slim conv2d 1x1 with ``normalizer_fn=None, activation_fn=None`` —
    the residual up-projection in block35/17/8 (weights + biases)."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weights", nn.initializers.truncated_normal(stddev=0.1),
            (1, 1, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("biases", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        return (y + b).astype(x.dtype)


def _dense_head(self, net, num_classes, name="Logits/Logits"):
    """Global-average head + slim fully_connected logits."""
    net = jnp.mean(net, axis=(1, 2))
    w = self.param(
        f"{name}/weights", nn.initializers.truncated_normal(stddev=0.01),
        (net.shape[-1], num_classes), jnp.float32,
    )
    b = self.param(f"{name}/biases", nn.initializers.zeros, (num_classes,), jnp.float32)
    return net.astype(jnp.float32) @ w + b


# ---------------------------------------------------------------------------
# Inception-v4
# ---------------------------------------------------------------------------


class _V4InceptionA(nn.Module):
    """block_inception_a (inception_v4.py:39-58): 96 / 64-96 / 64-96-96 /
    avgpool-96."""

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((96, (1, 1), 1, "SAME", "Conv2d_0a_1x1")), name="Branch_0")(x)
        b1 = _Branch(_B(
            (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (96, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
        ), name="Branch_1")(x)
        b2 = _Branch(_B(
            (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (96, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
            (96, (3, 3), 1, "SAME", "Conv2d_0c_3x3"),
        ), name="Branch_2")(x)
        b3 = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        b3 = _Branch(_B((96, (1, 1), 1, "SAME", "Conv2d_0b_1x1")), name="Branch_3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _V4ReductionA(nn.Module):
    """block_reduction_a (inception_v4.py:61-77): 384s2 / 192-224-256s2 /
    maxpool, all VALID."""

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((384, (3, 3), 2, "VALID", "Conv2d_1a_3x3")), name="Branch_0")(x)
        b1 = _Branch(_B(
            (192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (224, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
            (256, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Branch_1")(x)
        b2 = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class _V4InceptionB(nn.Module):
    """block_inception_b (inception_v4.py:80-105): 384 / 192-224(1x7)-
    256(7x1) / 192-192(7x1)-224(1x7)-224(7x1)-256(1x7) / avgpool-128."""

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((384, (1, 1), 1, "SAME", "Conv2d_0a_1x1")), name="Branch_0")(x)
        b1 = _Branch(_B(
            (192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (224, (1, 7), 1, "SAME", "Conv2d_0b_1x7"),
            (256, (7, 1), 1, "SAME", "Conv2d_0c_7x1"),
        ), name="Branch_1")(x)
        b2 = _Branch(_B(
            (192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (192, (7, 1), 1, "SAME", "Conv2d_0b_7x1"),
            (224, (1, 7), 1, "SAME", "Conv2d_0c_1x7"),
            (224, (7, 1), 1, "SAME", "Conv2d_0d_7x1"),
            (256, (1, 7), 1, "SAME", "Conv2d_0e_1x7"),
        ), name="Branch_2")(x)
        b3 = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        b3 = _Branch(_B((128, (1, 1), 1, "SAME", "Conv2d_0b_1x1")), name="Branch_3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class _V4ReductionB(nn.Module):
    """block_reduction_b (inception_v4.py:108-127)."""

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B(
            (192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (192, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Branch_0")(x)
        b1 = _Branch(_B(
            (256, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (256, (1, 7), 1, "SAME", "Conv2d_0b_1x7"),
            (320, (7, 1), 1, "SAME", "Conv2d_0c_7x1"),
            (320, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Branch_1")(x)
        b2 = nn.max_pool(x, (3, 3), (2, 2), "VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class _V4InceptionC(nn.Module):
    """block_inception_c (inception_v4.py:130-159): forked 1x3/3x1 tails in
    branches 1 and 2."""

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((256, (1, 1), 1, "SAME", "Conv2d_0a_1x1")), name="Branch_0")(x)
        b1 = ConvBN(384, (1, 1), name="Branch_1/Conv2d_0a_1x1")(x)
        b1 = jnp.concatenate([
            ConvBN(256, (1, 3), name="Branch_1/Conv2d_0b_1x3")(b1),
            ConvBN(256, (3, 1), name="Branch_1/Conv2d_0c_3x1")(b1),
        ], axis=-1)
        b2 = ConvBN(384, (1, 1), name="Branch_2/Conv2d_0a_1x1")(x)
        b2 = ConvBN(448, (3, 1), name="Branch_2/Conv2d_0b_3x1")(b2)
        b2 = ConvBN(512, (1, 3), name="Branch_2/Conv2d_0c_1x3")(b2)
        b2 = jnp.concatenate([
            ConvBN(256, (1, 3), name="Branch_2/Conv2d_0d_1x3")(b2),
            ConvBN(256, (3, 1), name="Branch_2/Conv2d_0e_3x1")(b2),
        ], axis=-1)
        b3 = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        b3 = _Branch(_B((256, (1, 1), 1, "SAME", "Conv2d_0b_1x1")), name="Branch_3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV4(nn.Module):
    """slim inception_v4 (nets/inception_v4.py:162-240). ``features_only``
    -> endpoint dict (Mixed_7d: 8x8x1536 at 299); else (logits, endpoints)
    with the global-pool 'Logits/Logits' dense head."""

    num_classes: int = 1001

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = ConvBN(32, (3, 3), 2, "VALID", name="Conv2d_1a_3x3")(x)
        ep["Conv2d_1a_3x3"] = net
        net = ConvBN(32, (3, 3), 1, "VALID", name="Conv2d_2a_3x3")(net)
        ep["Conv2d_2a_3x3"] = net
        net = ConvBN(64, (3, 3), 1, "SAME", name="Conv2d_2b_3x3")(net)
        ep["Conv2d_2b_3x3"] = net
        # Mixed_3a: pool / conv concat-reduction stem
        net = jnp.concatenate([
            nn.max_pool(net, (3, 3), (2, 2), "VALID"),
            ConvBN(96, (3, 3), 2, "VALID", name="Mixed_3a/Branch_1/Conv2d_0a_3x3")(net),
        ], axis=-1)
        ep["Mixed_3a"] = net
        b0 = _Branch(_B(
            (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (96, (3, 3), 1, "VALID", "Conv2d_1a_3x3"),
        ), name="Mixed_4a/Branch_0")(net)
        b1 = _Branch(_B(
            (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (64, (1, 7), 1, "SAME", "Conv2d_0b_1x7"),
            (64, (7, 1), 1, "SAME", "Conv2d_0c_7x1"),
            (96, (3, 3), 1, "VALID", "Conv2d_1a_3x3"),
        ), name="Mixed_4a/Branch_1")(net)
        net = jnp.concatenate([b0, b1], axis=-1)
        ep["Mixed_4a"] = net
        net = jnp.concatenate([
            ConvBN(192, (3, 3), 2, "VALID", name="Mixed_5a/Branch_0/Conv2d_1a_3x3")(net),
            nn.max_pool(net, (3, 3), (2, 2), "VALID"),
        ], axis=-1)
        ep["Mixed_5a"] = net
        for i in range(4):
            name = f"Mixed_5{chr(ord('b') + i)}"
            net = _V4InceptionA(name=name)(net)
            ep[name] = net
        net = _V4ReductionA(name="Mixed_6a")(net)
        ep["Mixed_6a"] = net
        for i in range(7):
            name = f"Mixed_6{chr(ord('b') + i)}"
            net = _V4InceptionB(name=name)(net)
            ep[name] = net
        net = _V4ReductionB(name="Mixed_7a")(net)
        ep["Mixed_7a"] = net
        for i in range(3):
            name = f"Mixed_7{chr(ord('b') + i)}"
            net = _V4InceptionC(name=name)(net)
            ep[name] = net
        if features_only:
            return ep
        logits = _dense_head(self, net, self.num_classes)
        ep["Logits"] = logits
        return logits, ep


# ---------------------------------------------------------------------------
# Inception-ResNet-v2
# ---------------------------------------------------------------------------


class _Block35(nn.Module):
    """block35 (inception_resnet_v2.py:31-49): 32 / 32-32 / 32-48-64 ->
    bare 1x1 up-projection -> net + scale*up -> relu."""

    scale: float = 0.17

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((32, (1, 1), 1, "SAME", "Conv2d_1x1")), name="Branch_0")(x)
        b1 = _Branch(_B(
            (32, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (32, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
        ), name="Branch_1")(x)
        b2 = _Branch(_B(
            (32, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (48, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
            (64, (3, 3), 1, "SAME", "Conv2d_0c_3x3"),
        ), name="Branch_2")(x)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = _BareConv1x1(x.shape[-1], name="Conv2d_1x1")(mixed)
        return nn.relu(x + self.scale * up)


class _Block17(nn.Module):
    """block17 (inception_resnet_v2.py:52-68)."""

    scale: float = 0.10

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((192, (1, 1), 1, "SAME", "Conv2d_1x1")), name="Branch_0")(x)
        b1 = _Branch(_B(
            (128, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (160, (1, 7), 1, "SAME", "Conv2d_0b_1x7"),
            (192, (7, 1), 1, "SAME", "Conv2d_0c_7x1"),
        ), name="Branch_1")(x)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = _BareConv1x1(x.shape[-1], name="Conv2d_1x1")(mixed)
        return nn.relu(x + self.scale * up)


class _Block8(nn.Module):
    """block8 (inception_resnet_v2.py:71-87); the last instance runs with
    ``relu=False`` (activation_fn=None at :120)."""

    scale: float = 0.20
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        b0 = _Branch(_B((192, (1, 1), 1, "SAME", "Conv2d_1x1")), name="Branch_0")(x)
        b1 = _Branch(_B(
            (192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (224, (1, 3), 1, "SAME", "Conv2d_0b_1x3"),
            (256, (3, 1), 1, "SAME", "Conv2d_0c_3x1"),
        ), name="Branch_1")(x)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = _BareConv1x1(x.shape[-1], name="Conv2d_1x1")(mixed)
        y = x + self.scale * up
        return nn.relu(y) if self.relu else y


class InceptionResnetV2(nn.Module):
    """slim inception_resnet_v2 (nets/inception_resnet_v2.py:90-171).
    ``features_only`` -> endpoint dict (Conv2d_7b_1x1: 8x8x1536 at 299);
    else (logits, endpoints). AuxLogits omitted (module docstring)."""

    num_classes: int = 1001

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = ConvBN(32, (3, 3), 2, "VALID", name="Conv2d_1a_3x3")(x)
        ep["Conv2d_1a_3x3"] = net
        net = ConvBN(32, (3, 3), 1, "VALID", name="Conv2d_2a_3x3")(net)
        ep["Conv2d_2a_3x3"] = net
        net = ConvBN(64, (3, 3), 1, "SAME", name="Conv2d_2b_3x3")(net)
        ep["Conv2d_2b_3x3"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        ep["MaxPool_3a_3x3"] = net
        net = ConvBN(80, (1, 1), 1, "VALID", name="Conv2d_3b_1x1")(net)
        ep["Conv2d_3b_1x1"] = net
        net = ConvBN(192, (3, 3), 1, "VALID", name="Conv2d_4a_3x3")(net)
        ep["Conv2d_4a_3x3"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        ep["MaxPool_5a_3x3"] = net
        # Mixed_5b (4-branch, inception_resnet_v2.py:103-117)
        b0 = _Branch(_B((96, (1, 1), 1, "SAME", "Conv2d_1x1")), name="Mixed_5b/Branch_0")(net)
        b1 = _Branch(_B(
            (48, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (64, (5, 5), 1, "SAME", "Conv2d_0b_5x5"),
        ), name="Mixed_5b/Branch_1")(net)
        b2 = _Branch(_B(
            (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (96, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
            (96, (3, 3), 1, "SAME", "Conv2d_0c_3x3"),
        ), name="Mixed_5b/Branch_2")(net)
        b3 = nn.avg_pool(net, (3, 3), (1, 1), "SAME")
        b3 = _Branch(_B((64, (1, 1), 1, "SAME", "Conv2d_0b_1x1")),
                     name="Mixed_5b/Branch_3")(b3)
        net = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        ep["Mixed_5b"] = net
        for i in range(10):
            net = _Block35(name=f"Repeat/block35_{i + 1}")(net)
        # Mixed_6a reduction (:122-131)
        b0 = _Branch(_B((384, (3, 3), 2, "VALID", "Conv2d_1a_3x3")),
                     name="Mixed_6a/Branch_0")(net)
        b1 = _Branch(_B(
            (256, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (256, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
            (384, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Mixed_6a/Branch_1")(net)
        b2 = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = jnp.concatenate([b0, b1, b2], axis=-1)
        ep["Mixed_6a"] = net
        for i in range(20):
            net = _Block17(name=f"Repeat_1/block17_{i + 1}")(net)
        # Mixed_7a 4-branch reduction (:139-153)
        b0 = _Branch(_B(
            (256, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (384, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Mixed_7a/Branch_0")(net)
        b1 = _Branch(_B(
            (256, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (288, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Mixed_7a/Branch_1")(net)
        b2 = _Branch(_B(
            (256, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
            (288, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
            (320, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
        ), name="Mixed_7a/Branch_2")(net)
        b3 = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        ep["Mixed_7a"] = net
        for i in range(9):
            net = _Block8(name=f"Repeat_2/block8_{i + 1}")(net)
        net = _Block8(scale=1.0, relu=False, name="Block8")(net)
        net = ConvBN(1536, (1, 1), name="Conv2d_7b_1x1")(net)
        ep["Conv2d_7b_1x1"] = net
        if features_only:
            return ep
        logits = _dense_head(self, net, self.num_classes)
        ep["Logits"] = logits
        return logits, ep
