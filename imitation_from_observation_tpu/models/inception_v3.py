"""Inception-v3 feature extractor (flax).

Capability match for the reference's vendored TF-slim backbone
(``nets/inception_v3.py``, used at rllab/sampler/base.py:45,77-78 and
scripts/train_script.py:105-106): same topology and endpoint names
(Conv2d_1a_3x3 ... Mixed_7c), conv+BN(scale-free)+ReLU units, and the 1001-way
logits head. The reward engine consumes ``Mixed_7c`` (8x8x2048 at 299x299
input); ``ContextFeat`` translates in that feature space.

Inference-oriented: batch-norm uses stored moving statistics (the reference
always runs the backbone with ``is_training=False``). Weights convert from a
TF-slim checkpoint exported to ``.npz`` via :func:`load_tf_slim_npz` — the
slim variable names map 1:1 onto this module's parameter tree.

Input convention matches the reference feed (base.py:117-120): uint8 frames
are normalized to [-1, 1] by the caller (``(x/255 - 0.5) * 2``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    """conv (no bias) + batchnorm (no scale, eps 1e-3) + relu — the slim unit
    from inception_v3_arg_scope."""

    features: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weights",
            nn.initializers.truncated_normal(stddev=0.1),
            (*self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            (self.stride, self.stride),
            self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # f32 explicit no-op for f32 inputs; None for bf16 — an upcasting
            # PET breaks the AD transpose rule (ops/primitives.py::_acc_dtype)
            # and the MXU accumulates bf16 in f32 regardless
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("moving_mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("moving_variance", nn.initializers.ones, (self.features,), jnp.float32)
        # BN-stat calibration hook (no-op unless "bn_stats" is mutable in
        # apply): expose this layer's pre-normalization batch statistics so
        # calibrate_bn can write them into moving_mean/moving_variance —
        # the in-image substitute for pretrained stats (see pretrain_backbone)
        axes = tuple(range(y.ndim - 1))
        self.sow("bn_stats", "mean", jnp.mean(y, axes), reduce_fn=lambda _, b: b)
        self.sow("bn_stats", "var", jnp.var(y, axes), reduce_fn=lambda _, b: b)
        # stored stats are STATISTICS, not trainable parameters: the reference
        # always runs the backbone is_training=False with restored stats
        # (base.py:77-78), and the pretext trainer (exp/pretrain_backbone.py)
        # takes grads over the whole param tree — without the stop_gradient,
        # Adam would drift the stats (calibrated by calibrate_bn) and a
        # near-floor variance could be pushed below -1e-3, NaN'ing rsqrt
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        y = (y - mean) * jax.lax.rsqrt(var + 1e-3) + beta
        return nn.relu(y).astype(x.dtype)


def _maxpool(x, k=3, s=2, padding="VALID"):
    return nn.max_pool(x, (k, k), (s, s), padding)


def _avgpool(x, k=3, s=1, padding="SAME"):
    return nn.avg_pool(x, (k, k), (s, s), padding)


class _Branch(nn.Module):
    """A chain of ConvBN specs: [(features, kernel, stride, padding), ...]."""

    specs: Sequence[tuple]

    @nn.compact
    def __call__(self, x):
        for i, (f, k, s, p, name) in enumerate(self.specs):
            x = ConvBN(f, k, s, p, name=name)(x)
        return x


def _B(*specs):
    return tuple(specs)


class InceptionV3(nn.Module):
    """`features(x)` -> endpoint dict; `__call__(x)` -> (logits, endpoints).

    The trunk is expressed as an ordered sequence of named endpoint ops
    (:meth:`_trunk_ops`) so contiguous SEGMENTS can run independently:
    ``apply(params, h, start_after=A, features_only=True)`` treats ``h`` as
    endpoint ``A``'s activation and executes only the ops after it — the
    basis for pipeline-parallel execution (``parallel/pp.py``), where each
    mesh ``pipe`` stage owns one segment's params. Module names are explicit,
    so a segment's parameter names are identical to the full run's.
    """

    num_classes: int = 1001
    min_depth: int = 16
    final_endpoint: str = "Mixed_7c"

    def _trunk_ops(self):
        """Ordered [(endpoint_name, fn)] for the whole trunk. fns create
        their submodules lazily (explicit names), so skipping ops never
        perturbs the parameter tree of the ops that do run."""

        def conv(name, f, k, s, p):
            return name, lambda net: ConvBN(f, k, s, p, name=name)(net)

        def pool(name):
            return name, _maxpool

        def block_a(name, pool_proj):
            def fn(net):
                b0 = _Branch(_B((64, (1, 1), 1, "SAME", "Conv2d_0a_1x1")), name=f"{name}/Branch_0")(net)
                b1 = _Branch(
                    _B((48, (1, 1), 1, "SAME", "Conv2d_0a_1x1"), (64, (5, 5), 1, "SAME", "Conv2d_0b_5x5")),
                    name=f"{name}/Branch_1",
                )(net)
                b2 = _Branch(
                    _B(
                        (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                        (96, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
                        (96, (3, 3), 1, "SAME", "Conv2d_0c_3x3"),
                    ),
                    name=f"{name}/Branch_2",
                )(net)
                b3 = _Branch(
                    _B((pool_proj, (1, 1), 1, "SAME", "Conv2d_0b_1x1")), name=f"{name}/Branch_3"
                )(_avgpool(net))
                return jnp.concatenate([b0, b1, b2, b3], axis=-1)

            return name, fn

        def block_6a(net):  # 35x35 -> 17x17 reduction
            b0 = _Branch(_B((384, (3, 3), 2, "VALID", "Conv2d_1a_1x1")), name="Mixed_6a/Branch_0")(net)
            b1 = _Branch(
                _B(
                    (64, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                    (96, (3, 3), 1, "SAME", "Conv2d_0b_3x3"),
                    (96, (3, 3), 2, "VALID", "Conv2d_1a_1x1"),
                ),
                name="Mixed_6a/Branch_1",
            )(net)
            return jnp.concatenate([b0, b1, _maxpool(net)], axis=-1)

        def block_b(name, mid):
            def fn(net):
                b0 = _Branch(_B((192, (1, 1), 1, "SAME", "Conv2d_0a_1x1")), name=f"{name}/Branch_0")(net)
                b1 = _Branch(
                    _B(
                        (mid, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                        (mid, (1, 7), 1, "SAME", "Conv2d_0b_1x7"),
                        (192, (7, 1), 1, "SAME", "Conv2d_0c_7x1"),
                    ),
                    name=f"{name}/Branch_1",
                )(net)
                b2 = _Branch(
                    _B(
                        (mid, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                        (mid, (7, 1), 1, "SAME", "Conv2d_0b_7x1"),
                        (mid, (1, 7), 1, "SAME", "Conv2d_0c_1x7"),
                        (mid, (7, 1), 1, "SAME", "Conv2d_0d_7x1"),
                        (192, (1, 7), 1, "SAME", "Conv2d_0e_1x7"),
                    ),
                    name=f"{name}/Branch_2",
                )(net)
                b3 = _Branch(
                    _B((192, (1, 1), 1, "SAME", "Conv2d_0b_1x1")), name=f"{name}/Branch_3"
                )(_avgpool(net))
                return jnp.concatenate([b0, b1, b2, b3], axis=-1)

            return name, fn

        def block_7a(net):  # 17x17 -> 8x8 reduction
            b0 = _Branch(
                _B((192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"), (320, (3, 3), 2, "VALID", "Conv2d_1a_3x3")),
                name="Mixed_7a/Branch_0",
            )(net)
            b1 = _Branch(
                _B(
                    (192, (1, 1), 1, "SAME", "Conv2d_0a_1x1"),
                    (192, (1, 7), 1, "SAME", "Conv2d_0b_1x7"),
                    (192, (7, 1), 1, "SAME", "Conv2d_0c_7x1"),
                    (192, (3, 3), 2, "VALID", "Conv2d_1a_3x3"),
                ),
                name="Mixed_7a/Branch_1",
            )(net)
            return jnp.concatenate([b0, b1, _maxpool(net)], axis=-1)

        def block_c(name):
            def fn(net):
                b0 = _Branch(_B((320, (1, 1), 1, "SAME", "Conv2d_0a_1x1")), name=f"{name}/Branch_0")(net)
                b1_in = ConvBN(384, (1, 1), 1, "SAME", name=f"{name}/Branch_1/Conv2d_0a_1x1")(net)
                b1 = jnp.concatenate(
                    [
                        ConvBN(384, (1, 3), 1, "SAME", name=f"{name}/Branch_1/Conv2d_0b_1x3")(b1_in),
                        ConvBN(384, (3, 1), 1, "SAME", name=f"{name}/Branch_1/Conv2d_0b_3x1")(b1_in),
                    ],
                    axis=-1,
                )
                b2_in = _Branch(
                    _B((448, (1, 1), 1, "SAME", "Conv2d_0a_1x1"), (384, (3, 3), 1, "SAME", "Conv2d_0b_3x3")),
                    name=f"{name}/Branch_2",
                )(net)
                b2 = jnp.concatenate(
                    [
                        ConvBN(384, (1, 3), 1, "SAME", name=f"{name}/Branch_2/Conv2d_0c_1x3")(b2_in),
                        ConvBN(384, (3, 1), 1, "SAME", name=f"{name}/Branch_2/Conv2d_0d_3x1")(b2_in),
                    ],
                    axis=-1,
                )
                b3 = _Branch(
                    _B((192, (1, 1), 1, "SAME", "Conv2d_0b_1x1")), name=f"{name}/Branch_3"
                )(_avgpool(net))
                return jnp.concatenate([b0, b1, b2, b3], axis=-1)

            return name, fn

        return [
            # -- stem --------------------------------------------------------
            conv("Conv2d_1a_3x3", 32, (3, 3), 2, "VALID"),
            conv("Conv2d_2a_3x3", 32, (3, 3), 1, "VALID"),
            conv("Conv2d_2b_3x3", 64, (3, 3), 1, "SAME"),
            pool("MaxPool_3a_3x3"),
            conv("Conv2d_3b_1x1", 80, (1, 1), 1, "VALID"),
            conv("Conv2d_4a_3x3", 192, (3, 3), 1, "VALID"),
            pool("MaxPool_5a_3x3"),
            # -- 35x35 inception-A blocks ------------------------------------
            block_a("Mixed_5b", 32),
            block_a("Mixed_5c", 64),
            block_a("Mixed_5d", 64),
            ("Mixed_6a", block_6a),
            # -- 17x17 inception-B blocks ------------------------------------
            block_b("Mixed_6b", 128),
            block_b("Mixed_6c", 160),
            block_b("Mixed_6d", 160),
            block_b("Mixed_6e", 192),
            ("Mixed_7a", block_7a),
            # -- 8x8 inception-C blocks --------------------------------------
            block_c("Mixed_7b"),
            block_c("Mixed_7c"),
        ]

    @nn.compact
    def __call__(self, x, *, features_only: bool = False, start_after: str | None = None):
        ep: dict[str, Any] = {}
        net = x
        started = start_after is None
        ran = False
        for name, fn in self._trunk_ops():
            if not started:
                started = name == start_after
                continue
            net = fn(net)
            ep[name] = net
            ran = True
            if name == self.final_endpoint:
                break
        if not ran:
            # a typo'd start_after would otherwise silently skip the trunk
            names = [n for n, _ in self._trunk_ops()]
            raise ValueError(
                f"no ops ran: start_after={start_after!r} / "
                f"final_endpoint={self.final_endpoint!r} select an empty "
                f"segment of {names}"
            )

        if features_only:
            return ep

        # -- logits head (global pool + 1x1 conv, slim Logits scope) --------
        pooled = jnp.mean(net, axis=(1, 2), keepdims=True)
        w = self.param(
            "Logits/Conv2d_1c_1x1/weights",
            nn.initializers.truncated_normal(stddev=0.001),
            (1, 1, net.shape[-1], self.num_classes),
            jnp.float32,
        )
        b = self.param("Logits/Conv2d_1c_1x1/biases", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        logits = (
            jax.lax.conv_general_dilated(
                pooled, w.astype(pooled.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
        logits = logits.squeeze((1, 2))
        return logits, ep

    def features(self, x):
        return self(x, features_only=True)


def preprocess_uint8(frames: jax.Array) -> jax.Array:
    """uint8 [..., H, W, 3] -> [-1, 1] float (base.py:117-120)."""
    return frames.astype(jnp.float32) / 255.0 * 2.0 - 1.0


def calibrate_bn(model: InceptionV3, params: Any, x: jax.Array, n_passes: int = 60) -> Any:
    """Data-dependent BN calibration: write each ConvBN's observed
    pre-normalization batch statistics into its moving_mean/moving_variance.

    The module is inference-oriented (stats are plain params; the reference
    always ran the backbone ``is_training=False`` with PRETRAINED stats,
    base.py:77-78). With no pretrained checkpoint in the image, random-init
    activations explode multiplicatively through the trunk (~1e8 RMS at
    Mixed_7c). Calibration restores per-layer unit-scale activations the way
    LSUV-style data-dependent init does: each pass re-measures batch stats on
    calibration frames ``x`` and overwrites the stored stats — layer k's
    statistics are only correct once layers <k are normalized, so ``n_passes``
    must be >= the ConvBN depth along the longest path (~20 to Mixed_7c).
    """

    def write(node, stats):
        """Functionally merge measured stats into the param tree (structures
        are static at trace time, so this python recursion stages into the
        compiled loop body)."""
        out = dict(node)
        for k, v in stats.items():
            if isinstance(v, dict) and k in out:
                out[k] = write(node[k], v)
        if "mean" in stats and not isinstance(stats["mean"], dict):
            # until a layer's upstream is normalized its pre-activations can
            # overflow f32 (inf/nan stats); sanitize so later passes converge
            # from any intermediate state. Var floor: a dead channel would
            # otherwise rsqrt to inf through the 1e-3 eps alone.
            mean, var = stats["mean"], stats["var"]
            out["moving_mean"] = jnp.where(jnp.isfinite(mean), mean, 0.0)
            out["moving_variance"] = jnp.maximum(
                jnp.where(jnp.isfinite(var), var, 1.0), 1e-6
            )
        return out

    # ALL passes inside one jit: the host loop version paid a full param-tree
    # re-ship + stats fetch over the relay PER PASS (measured ~20 s/pass,
    # ~20 min per calibration at n_passes=60); on device the tree ships once
    # and the 60 forwards are pure compute (~15 s total)
    @jax.jit
    def calibrate(p, x):
        def body(_, p):
            _, st = model.apply(p, x, features_only=True, mutable=["bn_stats"])
            return {**p, "params": write(p["params"], st["bn_stats"])}

        return jax.lax.fori_loop(0, n_passes, body, p)

    return calibrate(params, x)


def load_tf_slim_npz(npz_path: str, params_like) -> Any:
    """Load a TF-slim InceptionV3 checkpoint exported as npz (variable name ->
    array) into this module's parameter tree.

    Slim names like ``InceptionV3/Mixed_5b/Branch_0/Conv2d_0a_1x1/weights``
    and ``.../BatchNorm/{beta,moving_mean,moving_variance}`` map onto flax
    paths ``Mixed_5b/Branch_0/Conv2d_0a_1x1/{weights,beta,...}``.
    """
    data = np.load(npz_path)
    lookup = {}
    for tf_name in data.files:
        name = tf_name
        if name.startswith("InceptionV3/"):
            name = name[len("InceptionV3/") :]
        name = name.replace("/BatchNorm/", "/")
        lookup[name] = data[tf_name]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params_like)
    leaves = []
    for path, like in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        if key.startswith("params/"):
            key = key[len("params/") :]
        if key not in lookup:
            raise KeyError(f"checkpoint missing variable for {key}")
        arr = lookup[key]
        if arr.shape != np.shape(like):
            raise ValueError(f"{key}: ckpt shape {arr.shape} != model {np.shape(like)}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
