"""Additional TF-slim backbone families (flax).

The reference vendors a full slim model zoo (``nets/``: vgg, resnet v1/v2,
inception v1-v4, inception-resnet, alexnet, overfeat, cifarnet, lenet) of
which only inception_v3 is load-bearing (rllab/sampler/base.py:45). These
are the remaining families, rebuilt the same way ``models/inception_v3.py``
was: identical topology and slim-compatible variable paths so a TF
checkpoint exported to npz restores 1:1, inference-oriented BN (stored
statistics), NHWC, and a ``features_only`` endpoint dict for
reward-engine use.

- :class:`ResNetV1` ≙ ``nets/resnet_v1.py`` (+ ``resnet_utils.py``):
  bottleneck units, stride in the LAST unit of each block (resnet_v1.py:77),
  conv2d_same explicit padding for stride-2 convs (resnet_utils.py:66-89),
  BN with scale (gamma) unlike inception's scale-free BN. Depth presets 50/
  101/152 (resnet_v1.py:200-260).
- :class:`ResNetV2` ≙ ``nets/resnet_v2.py``: the full-preactivation variant
  — BN+relu before the convs (``preact``), bare root conv, ``postnorm``
  after block4, no relu after the residual add (resnet_v2.py:35-74,189-205).
- :class:`VGG` ≙ ``nets/vgg.py`` — vgg_a (:25-131), vgg_16 (:141-186),
  vgg_19 (:196-252): conv+bias+relu stacks, fc6/fc7/fc8 as convolutions
  (7x7 then 1x1), endpoint names ``conv1/conv1_1`` ... ``fc8``.
- :class:`InceptionV1` ≙ ``nets/inception_v1.py``: GoogLeNet with slim's
  uniform 4-branch Mixed blocks (1x1 / 1x1-3x3 / 1x1-3x3 / pool-1x1),
  SAME-padded pools, endpoints ``Conv2d_1a_7x7`` ... ``Mixed_5c`` —
  including the Mixed_5b ``Conv2d_0a_3x3`` scope typo slim keeps for
  checkpoint compatibility (inception_v1.py:220).
- :class:`AlexNetV2` ≙ ``nets/alexnet.py:76-120`` ("one weird trick"
  variant: no LRN, fully-conv fc6/fc7/fc8).
- :class:`OverFeat` ≙ ``nets/overfeat.py:80-118``.
- :class:`CifarNet` ≙ ``nets/cifarnet.py:35-69`` (with tf.nn.lrn cross-
  channel normalization) and :class:`LeNet` ≙ ``nets/lenet.py:34-62``.
- :func:`make_backbone` ≙ ``nets/nets_factory.py``: name -> (model,
  input_size) for the families built here.

Parameter-count checks in tests pin each topology to the published models
(resnet_v1_50: 25.56M params; vgg_16: 138.36M; vgg_19: 143.67M;
alexnet_v2: 50.30M).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _ConvBNScale(nn.Module):
    """slim resnet unit: conv (no bias) + BN (WITH gamma, eps 1e-5) +
    optional relu. ``same_pad`` applies resnet_utils.conv2d_same's explicit
    padding for stride > 1 (slim's SAME on stride-2 differs from XLA's)."""

    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        if s > 1:  # conv2d_same: fixed pad_total = kernel - 1
            pad_beg = (k - 1) // 2
            pad_end = k - 1 - pad_beg
            x = jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        w = self.param(
            "weights", nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (s, s), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        gamma = self.param("gamma", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("moving_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("moving_variance", nn.initializers.ones, (self.features,), jnp.float32)
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        if self.relu:
            y = nn.relu(y)
        return y.astype(x.dtype)


class _Bottleneck(nn.Module):
    """bottleneck_v1 (resnet_v1.py:68-113): 1x1 -> 3x3(stride) -> 1x1, add
    shortcut (1x1 conv when depth/stride change), relu after the add."""

    depth: int        # output depth (4x the bottleneck depth)
    depth_bottleneck: int
    stride: int

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        if depth_in == self.depth and self.stride == 1:
            shortcut = x
        elif depth_in == self.depth:
            # subsample only (resnet_utils.subsample: 1x1 max pool w/ stride)
            shortcut = nn.max_pool(x, (1, 1), (self.stride, self.stride), "SAME")
        else:
            shortcut = _ConvBNScale(
                self.depth, 1, self.stride, relu=False, name="shortcut"
            )(x)
        r = _ConvBNScale(self.depth_bottleneck, 1, 1, name="conv1")(x)
        r = _ConvBNScale(self.depth_bottleneck, 3, self.stride, name="conv2")(r)
        r = _ConvBNScale(self.depth, 1, 1, relu=False, name="conv3")(r)
        return nn.relu(shortcut + r)


_RESNET_BLOCKS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class ResNetV1(nn.Module):
    """slim resnet_v1_{50,101,152}: `features(x)` -> endpoint dict keyed
    ``block1..block4`` (+ ``conv1``); `__call__` -> (logits, endpoints)."""

    depth: int = 50
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = _ConvBNScale(64, 7, 2, name="conv1")(x)
        ep["conv1"] = net
        net = jnp.pad(net, ((0, 0), (1, 1), (1, 1), (0, 0)))
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        units = _RESNET_BLOCKS[self.depth]
        for b, (n_units, base) in enumerate(zip(units, (64, 128, 256, 512)), start=1):
            for u in range(1, n_units + 1):
                # stride 2 in the LAST unit of blocks 1-3 (resnet_v1.py:77)
                stride = 2 if (u == n_units and b < 4) else 1
                net = _Bottleneck(
                    base * 4, base, stride, name=f"block{b}/unit_{u}/bottleneck_v1"
                )(net)
            ep[f"block{b}"] = net
        if features_only:
            return ep
        net = jnp.mean(net, axis=(1, 2), keepdims=True)  # global pool
        w = self.param(
            "logits/weights", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (1, 1, net.shape[-1], self.num_classes), jnp.float32,
        )
        b_ = self.param("logits/biases", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        logits = (
            jax.lax.conv_general_dilated(
                net.astype(jnp.float32), w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, 0, 0, :]
            + b_
        )
        return logits, ep


class _VggConv(nn.Module):
    features: int
    kernel: int = 3
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weights", nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (self.kernel, self.kernel, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("biases", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        return (y + b).astype(x.dtype)


class VGG(nn.Module):
    """slim vgg family (nets/vgg.py). ``reps`` selects the variant: vgg_16
    (2,2,3,3,3) (:141-186), vgg_19 (2,2,4,4,4) (:196-252), vgg_a
    (1,1,2,2,2) (:25-131). fc6/fc7 run as convs; at the canonical 224x224
    input fc6's 7x7 VALID conv leaves 1x1 spatial."""

    reps: Sequence[int] = (2, 2, 3, 3, 3)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        cfg = [(self.reps[0], 64, "conv1"), (self.reps[1], 128, "conv2"),
               (self.reps[2], 256, "conv3"), (self.reps[3], 512, "conv4"),
               (self.reps[4], 512, "conv5")]
        for reps, f, scope in cfg:
            for i in range(1, reps + 1):
                x = nn.relu(_VggConv(f, name=f"{scope}/{scope}_{i}")(x))
                ep[f"{scope}/{scope}_{i}"] = x
            x = nn.max_pool(x, (2, 2), (2, 2), "VALID")
            ep[scope] = x
        if features_only:
            return ep
        x = nn.relu(_VggConv(4096, kernel=7, padding="VALID", name="fc6")(x))
        ep["fc6"] = x
        x = nn.relu(_VggConv(4096, kernel=1, name="fc7")(x))
        ep["fc7"] = x
        logits = _VggConv(self.num_classes, kernel=1, name="fc8")(x)
        ep["fc8"] = logits
        return logits[:, 0, 0, :], ep


VGG16 = VGG  # back-compat alias (vgg_16 is the family default)


class _BN(nn.Module):
    """Standalone slim batch_norm (stored statistics, eps 1e-5, with gamma)
    — resnet_v2's preact/postnorm layers."""

    relu: bool = True

    @nn.compact
    def __call__(self, x):
        f = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (f,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (f,), jnp.float32)
        mean = jax.lax.stop_gradient(
            self.param("moving_mean", nn.initializers.zeros, (f,), jnp.float32))
        var = jax.lax.stop_gradient(
            self.param("moving_variance", nn.initializers.ones, (f,), jnp.float32))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        if self.relu:
            y = nn.relu(y)
        return y.astype(x.dtype)


class _BiasedBareConv(nn.Module):
    """slim conv2d with ``normalizer_fn=None, activation_fn=None`` (resnet
    v2's shortcut/conv3/root/logits): weights + biases, optional
    conv2d_same explicit padding for stride > 1."""

    features: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        if s > 1:
            pad_beg = (k - 1) // 2
            pad_end = k - 1 - pad_beg
            x = jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))
            padding = "VALID"
        else:
            padding = "SAME"
        w = self.param(
            "weights", nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("biases", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (s, s), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        return (y + b).astype(x.dtype)


class _BottleneckV2(nn.Module):
    """bottleneck_v2 (resnet_v2.py:35-74): full preactivation — BN+relu
    first, stride in conv2, NO relu after the add; shortcut subsamples the
    raw input when depth matches, else 1x1-convs the preact."""

    depth: int
    depth_bottleneck: int
    stride: int

    @nn.compact
    def __call__(self, x):
        preact = _BN(name="preact")(x)
        if x.shape[-1] == self.depth:
            shortcut = (
                x if self.stride == 1
                else nn.max_pool(x, (1, 1), (self.stride, self.stride), "SAME")
            )
        else:
            shortcut = _BiasedBareConv(
                self.depth, 1, self.stride, name="shortcut")(preact)
        r = _ConvBNScale(self.depth_bottleneck, 1, 1, name="conv1")(preact)
        r = _ConvBNScale(self.depth_bottleneck, 3, self.stride, name="conv2")(r)
        r = _BiasedBareConv(self.depth, 1, 1, name="conv3")(r)
        return shortcut + r


class ResNetV2(nn.Module):
    """slim resnet_v2_{50,101,152} (resnet_v2.py:214-287): preactivation
    units, bare root conv (no BN/relu — 'preact' of unit 1 normalizes it),
    ``postnorm`` BN+relu after block4, biased 1x1 logits conv."""

    depth: int = 50
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = _BiasedBareConv(64, 7, 2, name="conv1")(x)
        ep["conv1"] = net
        net = jnp.pad(net, ((0, 0), (1, 1), (1, 1), (0, 0)))
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        units = _RESNET_BLOCKS[self.depth]
        for b, (n_units, base) in enumerate(zip(units, (64, 128, 256, 512)), start=1):
            for u in range(1, n_units + 1):
                stride = 2 if (u == n_units and b < 4) else 1
                net = _BottleneckV2(
                    base * 4, base, stride, name=f"block{b}/unit_{u}/bottleneck_v2"
                )(net)
            ep[f"block{b}"] = net
        net = _BN(name="postnorm")(net)
        ep["postnorm"] = net
        if features_only:
            return ep
        net = jnp.mean(net, axis=(1, 2), keepdims=True)
        logits = _BiasedBareConv(self.num_classes, 1, 1, name="logits")(net)
        return logits[:, 0, 0, :], ep


class _IncV1Mixed(nn.Module):
    """slim inception_v1 Mixed block (inception_v1.py:59-...): concat of
    1x1 / 1x1->3x3 / 1x1->3x3 / maxpool->1x1 branches, all SAME, stride 1.
    ``b2_scope_0a`` reproduces Mixed_5b's ``Conv2d_0a_3x3`` scope typo that
    slim keeps for checkpoint compatibility (inception_v1.py:220)."""

    b0: int
    b1: tuple
    b2: tuple
    b3: int
    b2_scope_0a: bool = False

    @nn.compact
    def __call__(self, x):
        from imitation_from_observation_tpu.models.inception_v3 import ConvBN

        br0 = ConvBN(self.b0, (1, 1), name="Branch_0/Conv2d_0a_1x1")(x)
        br1 = ConvBN(self.b1[0], (1, 1), name="Branch_1/Conv2d_0a_1x1")(x)
        br1 = ConvBN(self.b1[1], (3, 3), name="Branch_1/Conv2d_0b_3x3")(br1)
        br2 = ConvBN(self.b2[0], (1, 1), name="Branch_2/Conv2d_0a_1x1")(x)
        b2name = "Conv2d_0a_3x3" if self.b2_scope_0a else "Conv2d_0b_3x3"
        br2 = ConvBN(self.b2[1], (3, 3), name=f"Branch_2/{b2name}")(br2)
        br3 = nn.max_pool(x, (3, 3), (1, 1), "SAME")
        br3 = ConvBN(self.b3, (1, 1), name="Branch_3/Conv2d_0b_1x1")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


# (b0, (b1a, b1b), (b2a, b2b), b3) per Mixed block, inception_v1.py:59-250
_INC_V1_BLOCKS = {
    "Mixed_3b": (64, (96, 128), (16, 32), 32),
    "Mixed_3c": (128, (128, 192), (32, 96), 64),
    "Mixed_4b": (192, (96, 208), (16, 48), 64),
    "Mixed_4c": (160, (112, 224), (24, 64), 64),
    "Mixed_4d": (128, (128, 256), (24, 64), 64),
    "Mixed_4e": (112, (144, 288), (32, 64), 64),
    "Mixed_4f": (256, (160, 320), (32, 128), 128),
    "Mixed_5b": (256, (160, 320), (32, 128), 128),
    "Mixed_5c": (384, (192, 384), (48, 128), 128),
}


class InceptionV1(nn.Module):
    """slim inception_v1 (GoogLeNet): `__call__` -> (logits, endpoints);
    ``features_only=True`` -> endpoint dict. All pools SAME (unlike v3's
    VALID stem pools); BN is the scale-free inception unit (ConvBN)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        from imitation_from_observation_tpu.models.inception_v3 import ConvBN

        ep = {}
        net = ConvBN(64, (7, 7), 2, name="Conv2d_1a_7x7")(x)
        ep["Conv2d_1a_7x7"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "SAME")
        ep["MaxPool_2a_3x3"] = net
        net = ConvBN(64, (1, 1), name="Conv2d_2b_1x1")(net)
        ep["Conv2d_2b_1x1"] = net
        net = ConvBN(192, (3, 3), name="Conv2d_2c_3x3")(net)
        ep["Conv2d_2c_3x3"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "SAME")
        ep["MaxPool_3a_3x3"] = net
        for name, spec in _INC_V1_BLOCKS.items():
            if name == "Mixed_4b":
                net = nn.max_pool(net, (3, 3), (2, 2), "SAME")
                ep["MaxPool_4a_3x3"] = net
            elif name == "Mixed_5b":
                net = nn.max_pool(net, (2, 2), (2, 2), "SAME")
                ep["MaxPool_5a_2x2"] = net
            net = _IncV1Mixed(
                *spec, b2_scope_0a=(name == "Mixed_5b"), name=name
            )(net)
            ep[name] = net
        if features_only:
            return ep
        # head (inception_v1.py:290-301): 7x7 VALID avg pool -> 1x1 conv
        # logits (biased, no BN) -> spatial squeeze
        net = nn.avg_pool(net, (7, 7), (1, 1), "VALID")
        w = self.param(
            "Logits/Conv2d_0c_1x1/weights",
            nn.initializers.truncated_normal(stddev=0.01),
            (1, 1, net.shape[-1], self.num_classes), jnp.float32,
        )
        b = self.param(
            "Logits/Conv2d_0c_1x1/biases", nn.initializers.zeros,
            (self.num_classes,), jnp.float32,
        )
        logits = (
            jax.lax.conv_general_dilated(
                net.astype(jnp.float32), w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, 0, 0, :]
            + b
        )
        ep["Logits"] = logits
        return logits, ep


class _SepConvBN(nn.Module):
    """slim separable_conv2d + BN + relu — inception_v2's stem conv
    (inception_v2.py:69-74): depthwise (TF kernel [k,k,in,mult]) then
    pointwise 1x1, one scale-free BN on the output."""

    features: int
    kernel: int
    stride: int
    dw_mult: int

    @nn.compact
    def __call__(self, x):
        k, cin = self.kernel, x.shape[-1]
        dw = self.param(
            "depthwise_weights", nn.initializers.truncated_normal(stddev=1.0),
            (k, k, cin, self.dw_mult), jnp.float32,
        )
        pw = self.param(
            "pointwise_weights", nn.initializers.truncated_normal(stddev=0.1),
            (1, 1, cin * self.dw_mult, self.features), jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x, dw.reshape(k, k, 1, cin * self.dw_mult).astype(x.dtype),
            (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cin,
        )
        y = jax.lax.conv_general_dilated(
            y, pw.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        f = self.features
        beta = self.param("beta", nn.initializers.zeros, (f,), jnp.float32)
        mean = jax.lax.stop_gradient(
            self.param("moving_mean", nn.initializers.zeros, (f,), jnp.float32))
        var = jax.lax.stop_gradient(
            self.param("moving_variance", nn.initializers.ones, (f,), jnp.float32))
        y = (y - mean) * jax.lax.rsqrt(var + 1e-3) + beta
        return nn.relu(y).astype(x.dtype)


# inception_v2 Mixed blocks (inception_v2.py:103-393): (b0, (b1a, b1b),
# (b2a, b2b, b2c), b3, b3_pool). Reductions Mixed_4a/5a are 3-branch
# stride-2 blocks handled inline.
_INC_V2_BLOCKS = {
    "Mixed_3b": (64, (64, 64), (64, 96, 96), 32, "avg"),
    "Mixed_3c": (64, (64, 96), (64, 96, 96), 64, "avg"),
    "Mixed_4b": (224, (64, 96), (96, 128, 128), 128, "avg"),
    "Mixed_4c": (192, (96, 128), (96, 128, 128), 128, "avg"),
    "Mixed_4d": (160, (128, 160), (128, 160, 160), 96, "avg"),
    "Mixed_4e": (96, (128, 192), (160, 192, 192), 96, "avg"),
    "Mixed_5b": (352, (192, 320), (160, 224, 224), 128, "avg"),
    "Mixed_5c": (352, (192, 320), (192, 224, 224), 128, "max"),
}
_INC_V2_REDUCTIONS = {
    "Mixed_4a": ((128, 160), (64, 96, 96)),
    "Mixed_5a": ((128, 192), (192, 256, 256)),
}


class InceptionV2(nn.Module):
    """slim inception_v2 (nets/inception_v2.py): separable stem, 3x3-only
    Mixed blocks with avg-pool projections (max in Mixed_5c), 3-branch
    stride-2 reductions Mixed_4a/5a. `__call__` -> (logits, endpoints)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        from imitation_from_observation_tpu.models.inception_v3 import (
            ConvBN,
            _B,
            _Branch,
        )

        ep = {}
        net = _SepConvBN(64, 7, 2, dw_mult=8, name="Conv2d_1a_7x7")(x)
        ep["Conv2d_1a_7x7"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "SAME")
        ep["MaxPool_2a_3x3"] = net
        net = ConvBN(64, (1, 1), name="Conv2d_2b_1x1")(net)
        ep["Conv2d_2b_1x1"] = net
        net = ConvBN(192, (3, 3), name="Conv2d_2c_3x3")(net)
        ep["Conv2d_2c_3x3"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "SAME")
        ep["MaxPool_3a_3x3"] = net
        order = ["Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
                 "Mixed_4d", "Mixed_4e", "Mixed_5a", "Mixed_5b", "Mixed_5c"]
        for name in order:
            if name in _INC_V2_REDUCTIONS:
                (b0a, b0b), (b1a, b1b, b1c) = _INC_V2_REDUCTIONS[name]
                br0 = _Branch(_B(
                    (b0a, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                    (b0b, (3, 3), 2, "SAME", "Conv2d_1a_3x3"),
                ), name=f"{name}/Branch_0")(net)
                br1 = _Branch(_B(
                    (b1a, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                    (b1b, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
                    (b1c, (3, 3), 2, "SAME", "Conv2d_1a_3x3"),
                ), name=f"{name}/Branch_1")(net)
                br2 = nn.max_pool(net, (3, 3), (2, 2), "SAME")
                net = jnp.concatenate([br0, br1, br2], axis=-1)
            else:
                b0, (b1a, b1b), (b2a, b2b, b2c), b3, pool = _INC_V2_BLOCKS[name]
                br0 = _Branch(_B((b0, (1, 1), 1, "SAME", "Conv2d_0a_1x1")),
                              name=f"{name}/Branch_0")(net)
                br1 = _Branch(_B(
                    (b1a, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                    (b1b, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
                ), name=f"{name}/Branch_1")(net)
                br2 = _Branch(_B(
                    (b2a, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                    (b2b, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
                    (b2c, (3, 3), 1, "SAME", "Conv2d_0c_3x3"),
                ), name=f"{name}/Branch_2")(net)
                pool_fn = nn.avg_pool if pool == "avg" else nn.max_pool
                br3 = pool_fn(net, (3, 3), (1, 1), "SAME")
                br3 = _Branch(_B((b3, (1, 1), 1, "SAME", "Conv2d_0b_1x1")),
                              name=f"{name}/Branch_3")(br3)
                net = jnp.concatenate([br0, br1, br2, br3], axis=-1)
            ep[name] = net
        if features_only:
            return ep
        net = nn.avg_pool(net, (7, 7), (1, 1), "VALID")
        w = self.param(
            "Logits/Conv2d_1c_1x1/weights",
            nn.initializers.truncated_normal(stddev=0.01),
            (1, 1, net.shape[-1], self.num_classes), jnp.float32,
        )
        b = self.param(
            "Logits/Conv2d_1c_1x1/biases", nn.initializers.zeros,
            (self.num_classes,), jnp.float32,
        )
        logits = (
            jax.lax.conv_general_dilated(
                net.astype(jnp.float32), w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[:, 0, 0, :]
            + b
        )
        ep["Logits"] = logits
        return logits, ep


class _BiasConv(nn.Module):
    """slim conv2d with bias and no normalizer (the alexnet/overfeat/
    cifarnet/lenet unit); relu applied by the caller."""

    features: int
    kernel: int
    stride: int = 1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weights", nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (self.kernel, self.kernel, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("biases", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride), self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        return (y + b).astype(x.dtype)


class _Dense(nn.Module):
    """slim fully_connected: weights/biases leaf names."""

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weights", nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("biases", nn.initializers.zeros, (self.features,), jnp.float32)
        return x @ w + b


class AlexNetV2(nn.Module):
    """slim alexnet_v2 (nets/alexnet.py:76-120): the "one weird trick"
    AlexNet — no LRN, VALID stem conv, fully-conv fc6(5x5)/fc7/fc8.
    Canonical input 224x224 (fc6 leaves 1x1 spatial after pool5)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = nn.relu(_BiasConv(64, 11, 4, "VALID", name="conv1")(x))
        ep["conv1"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = nn.relu(_BiasConv(192, 5, name="conv2")(net))
        ep["conv2"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        net = nn.relu(_BiasConv(384, 3, name="conv3")(net))
        ep["conv3"] = net
        net = nn.relu(_BiasConv(384, 3, name="conv4")(net))
        ep["conv4"] = net
        net = nn.relu(_BiasConv(256, 3, name="conv5")(net))
        ep["conv5"] = net
        net = nn.max_pool(net, (3, 3), (2, 2), "VALID")
        ep["pool5"] = net
        if features_only:
            return ep
        net = nn.relu(_BiasConv(4096, 5, padding="VALID", name="fc6")(net))
        ep["fc6"] = net
        net = nn.relu(_BiasConv(4096, 1, name="fc7")(net))
        ep["fc7"] = net
        logits = _BiasConv(self.num_classes, 1, name="fc8")(net)
        ep["fc8"] = logits
        return logits[:, 0, 0, :], ep


class OverFeat(nn.Module):
    """slim overfeat (nets/overfeat.py:80-118). Canonical input 231x231
    (fc6's 6x6 VALID conv leaves 1x1 spatial after pool5)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = nn.relu(_BiasConv(64, 11, 4, "VALID", name="conv1")(x))
        ep["conv1"] = net
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        net = nn.relu(_BiasConv(256, 5, padding="VALID", name="conv2")(net))
        ep["conv2"] = net
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        net = nn.relu(_BiasConv(512, 3, name="conv3")(net))
        ep["conv3"] = net
        net = nn.relu(_BiasConv(1024, 3, name="conv4")(net))
        ep["conv4"] = net
        net = nn.relu(_BiasConv(1024, 3, name="conv5")(net))
        ep["conv5"] = net
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        ep["pool5"] = net
        if features_only:
            return ep
        net = nn.relu(_BiasConv(3072, 6, padding="VALID", name="fc6")(net))
        ep["fc6"] = net
        net = nn.relu(_BiasConv(4096, 1, name="fc7")(net))
        ep["fc7"] = net
        logits = _BiasConv(self.num_classes, 1, name="fc8")(net)
        ep["fc8"] = logits
        return logits[:, 0, 0, :], ep


def local_response_norm(
    x, depth_radius: int = 4, bias: float = 1.0, alpha: float = 0.001 / 9.0,
    beta: float = 0.75,
):
    """tf.nn.lrn semantics (cifarnet.py:45,48): cross-channel normalization
    over a window of 2*depth_radius+1 channels."""
    sq = jnp.square(x.astype(jnp.float32))
    win = 2 * depth_radius + 1
    sqr_sum = jax.lax.reduce_window(
        sq, 0.0, jax.lax.add, (1,) * (x.ndim - 1) + (win,),
        (1,) * x.ndim, "SAME",
    )
    return (x.astype(jnp.float32) / jnp.power(bias + alpha * sqr_sum, beta)).astype(x.dtype)


class CifarNet(nn.Module):
    """slim cifarnet (nets/cifarnet.py:35-69): conv/LRN/pool x2 -> fc3/fc4
    -> logits. Canonical input 32x32 (Flatten = 8*8*64)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = nn.relu(_BiasConv(64, 5, name="conv1")(x))
        ep["conv1"] = net
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        ep["pool1"] = net
        net = local_response_norm(net)
        net = nn.relu(_BiasConv(64, 5, name="conv2")(net))
        ep["conv2"] = net
        net = local_response_norm(net)
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        ep["pool2"] = net
        net = net.reshape(net.shape[0], -1)
        ep["Flatten"] = net
        if features_only:
            return ep
        net = nn.relu(_Dense(384, name="fc3")(net))
        ep["fc3"] = net
        net = nn.relu(_Dense(192, name="fc4")(net))
        ep["fc4"] = net
        logits = _Dense(self.num_classes, name="logits")(net)
        ep["Logits"] = logits
        return logits, ep


class LeNet(nn.Module):
    """slim lenet (nets/lenet.py:34-62). Canonical input 28x28
    (Flatten = 7*7*64)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        net = nn.relu(_BiasConv(32, 5, name="conv1")(x))
        ep["conv1"] = net
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        net = nn.relu(_BiasConv(64, 5, name="conv2")(net))
        ep["conv2"] = net
        net = nn.max_pool(net, (2, 2), (2, 2), "VALID")
        net = net.reshape(net.shape[0], -1)
        ep["Flatten"] = net
        if features_only:
            return ep
        net = nn.relu(_Dense(1024, name="fc3")(net))
        ep["fc3"] = net
        logits = _Dense(self.num_classes, name="fc4")(net)
        ep["Logits"] = logits
        return logits, ep


def load_slim_npz(npz_path: str, params_like, scope: str) -> Any:
    """Load a slim checkpoint exported as npz into a ResNetV1/VGG16 tree.

    Slim names ``{scope}/block1/unit_1/bottleneck_v1/conv1/weights`` and
    ``.../BatchNorm/{gamma,beta,moving_mean,moving_variance}`` map onto this
    module's nested flax paths; ``{scope}/logits/{weights,biases}`` (resnet)
    and ``{scope}/fc8/{weights,biases}`` (vgg) land on the head params.
    Every leaf must resolve with a matching shape (missing -> KeyError,
    mismatch -> ValueError) — the same strictness as
    ``inception_v3.load_tf_slim_npz``.
    """
    data = np.load(npz_path)
    lookup = {}
    for tf_name in data.files:
        name = tf_name
        if name.startswith(scope + "/"):
            name = name[len(scope) + 1:]
        name = name.replace("/BatchNorm/", "/")
        lookup[name] = data[tf_name]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params_like)
    leaves = []
    for path, like in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        if key.startswith("params/"):
            key = key[len("params/"):]
        if key not in lookup:
            raise KeyError(f"checkpoint missing variable for {key!r}")
        arr = lookup[key]
        if tuple(arr.shape) != tuple(like.shape):
            raise ValueError(f"{key}: checkpoint {arr.shape} != model {like.shape}")
        leaves.append(jnp.asarray(arr, like.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_backbone(name: str):
    """``nets_factory`` equivalent for the families built in this package:
    name -> (flax module, canonical input size). inception_v3 routes to
    ``models.inception_v3``."""
    if name == "inception_v3":
        from imitation_from_observation_tpu.models.inception_v3 import InceptionV3

        return InceptionV3(), (299, 299)
    if name in ("resnet_v1_50", "resnet_v1_101", "resnet_v1_152"):
        return ResNetV1(depth=int(name.rsplit("_", 1)[1])), (224, 224)
    if name in ("resnet_v2_50", "resnet_v2_101", "resnet_v2_152"):
        return ResNetV2(depth=int(name.rsplit("_", 1)[1])), (224, 224)
    if name == "vgg_16":
        return VGG(), (224, 224)
    if name == "vgg_19":
        return VGG(reps=(2, 2, 4, 4, 4)), (224, 224)
    if name == "vgg_a":
        return VGG(reps=(1, 1, 2, 2, 2)), (224, 224)
    if name == "inception_v1":
        return InceptionV1(), (224, 224)
    if name == "inception_v2":
        return InceptionV2(), (224, 224)
    if name == "inception_v4":
        from imitation_from_observation_tpu.models.inception_family import InceptionV4

        return InceptionV4(), (299, 299)
    if name == "inception_resnet_v2":
        from imitation_from_observation_tpu.models.inception_family import (
            InceptionResnetV2,
        )

        return InceptionResnetV2(), (299, 299)
    if name == "alexnet_v2":
        return AlexNetV2(), (224, 224)
    if name == "overfeat":
        return OverFeat(), (231, 231)
    if name == "cifarnet":
        return CifarNet(), (32, 32)
    if name == "lenet":
        return LeNet(), (28, 28)
    raise ValueError(f"unknown backbone family {name!r}")
