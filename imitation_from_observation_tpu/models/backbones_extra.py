"""Additional TF-slim backbone families (flax): ResNet-v1 and VGG-16.

The reference vendors a full slim model zoo (``nets/``: vgg, resnet v1/v2,
inception v1-v4, inception-resnet, ...) of which only inception_v3 is
load-bearing (rllab/sampler/base.py:45). These are the next two families,
rebuilt the same way ``models/inception_v3.py`` was: identical topology and
slim-compatible variable paths so a TF checkpoint exported to npz restores
1:1, inference-oriented BN (stored statistics), NHWC, and a
``features_only`` endpoint dict for reward-engine use.

- :class:`ResNetV1` ≙ ``nets/resnet_v1.py`` (+ ``resnet_utils.py``):
  bottleneck units, stride in the LAST unit of each block (resnet_v1.py:77),
  conv2d_same explicit padding for stride-2 convs (resnet_utils.py:66-89),
  BN with scale (gamma) unlike inception's scale-free BN. Depth presets 50/
  101/152 (resnet_v1.py:200-260).
- :class:`VGG16` ≙ ``nets/vgg.py:141-186`` (vgg_16): conv+bias+relu stacks,
  fc6/fc7/fc8 as convolutions (7x7 then 1x1), endpoint names
  ``conv1/conv1_1`` ... ``fc8``.
- :func:`make_backbone` ≙ ``nets/nets_factory.py``: name -> (model,
  input_size) for the families built here.

Parameter-count checks in tests pin the topology to the published models
(resnet_v1_50: 25.56M params; vgg_16: 138.36M).
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


class VGG16(nn.Module):
    """slim vgg_16 (nets/vgg.py:141-186). fc6/fc7 run as convs; at the
    canonical 224x224 input fc6's 7x7 VALID conv leaves 1x1 spatial."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, features_only: bool = False):
        ep = {}
        cfg = [(2, 64, "conv1"), (2, 128, "conv2"), (3, 256, "conv3"),
               (3, 512, "conv4"), (3, 512, "conv5")]
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
    if name == "vgg_16":
        return VGG16(), (224, 224)
    raise ValueError(f"unknown backbone family {name!r}")
