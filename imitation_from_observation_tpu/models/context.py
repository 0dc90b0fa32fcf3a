"""Context-translation model family (flax).

The paper's core model: a conv encoder maps a source demo frame and a target
*context* frame (frame 0 of the target video) to latent features, a
feature-space translator combines them, and a deconv decoder with skip
connections from the context encoder reconstructs the demo frame as it would
look in the target context.

Three canonical variants, matching the reference zoo
(``gym/envs/mujoco/arm_shaping.py``):

- :class:`ContextSkip`  — sim 48x48 / 64x64 tasks (ContextSkipNew, :1260-1354)
- :class:`ContextSmall` — 36x64 real/sweep tasks, dropout, 100-d z
  (ContextAEReal, :1599-1684)
- :class:`ContextFeat`  — operates on backbone feature maps (e.g. Inception
  Mixed_7c 8x8x2048) with a residual output (ContextAEInception2, :1786-1894)

Faithfully-kept reference quirks (they change the function class, so parity
requires them): the ContextSkip *context* encoder applies no lrelu to its
final latent while the src/tgt encoder does (:1291 vs :1298), and decoder
outputs are linear — no tanh (:1333).

Each model exposes, besides training ``__call__(src, ctx, tgt)``:
- ``encode(imgs)``           -> z            (reward engine's ``input_z``)
- ``translate(src, ctx)``    -> (trans_z, translated image)  (demo warmup)
so the reward engine can run them batched under one jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from imitation_from_observation_tpu.ops import (
    conv2d,
    conv_kernel_init,
    deconv2d,
    deconv_kernel_init,
    linear,
    linear_kernel_init,
    lrelu,
)
from imitation_from_observation_tpu.ops.pallas import dense_lrelu


@dataclass
class TranslationOutputs:
    """All tensors the trainer/reward engine consume."""

    out: jax.Array  # translated image (decoder on trans_z)
    out2: jax.Array  # autoencoded image (decoder on tgt_z)
    trans_z: jax.Array  # translated latent
    tgt_z: jax.Array  # target-image latent
    src_z: jax.Array  # source-image latent (reference input_z)


jax.tree_util.register_dataclass(
    TranslationOutputs,
    data_fields=["out", "out2", "trans_z", "tgt_z", "src_z"],
    meta_fields=[],
)


class Conv(nn.Module):
    features: int
    kernel: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "w", conv_kernel_init, (self.kernel, self.kernel, x.shape[-1], self.features), jnp.float32
        )
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        return conv2d(x, w, b, stride=self.stride)


class Deconv(nn.Module):
    features: int
    kernel: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        # HWOI layout: [k, k, out_c, in_c], identical to TF conv2d_transpose.
        w = self.param(
            "w", deconv_kernel_init, (self.kernel, self.kernel, self.features, x.shape[-1]), jnp.float32
        )
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        return deconv2d(x, w, b, stride=self.stride)


class Dense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("w", linear_kernel_init, (x.shape[-1], self.features), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        return linear(x, w, b)


class DenseLrelu(nn.Module):
    """Dense + leaky-ReLU, fused into one Pallas MXU kernel on TPU.

    Same param layout as :class:`Dense`, so swapping the two never breaks
    checkpoints; every ``lrelu(linear(...))`` hop of the reference models
    routes through here.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("w", linear_kernel_init, (x.shape[-1], self.features), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        return dense_lrelu(x, w.astype(x.dtype), b.astype(x.dtype))


class ConvEncoder(nn.Module):
    """4 strided convs -> flatten -> 2 dense; returns skips + latent.

    ``final_act=False`` reproduces the ContextSkip context-encoder quirk where
    the last dense has no lrelu (arm_shaping.py:1291).
    """

    filters: Sequence[int]
    kernels: Sequence[int]
    strides: Sequence[int]
    feat_size: int
    final_act: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        skips = []
        for i, (f, k, s) in enumerate(zip(self.filters, self.kernels, self.strides)):
            x = lrelu(Conv(f, k, s, name=f"h{i}_conv")(x))
            skips.append(x)
        flat = x.reshape(x.shape[0], -1)
        if self.dropout_rate > 0:
            flat = nn.Dropout(self.dropout_rate)(flat, deterministic=deterministic)
        h4 = DenseLrelu(self.feat_size, name="h4_lin")(flat)
        if self.dropout_rate > 0:
            h4 = nn.Dropout(self.dropout_rate)(h4, deterministic=deterministic)
        if self.final_act:
            z = DenseLrelu(self.feat_size, name="hz_lin")(h4)
        else:
            z = Dense(self.feat_size, name="hz_lin")(h4)
        return skips, z


class Translator(nn.Module):
    """concat(src_z, ctx_z) -> dense -> lrelu -> dense (arm_shaping.py:1311-1314)."""

    feat_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, src_z, ctx_z, *, deterministic: bool = True):
        h = jnp.concatenate([src_z, ctx_z], axis=-1)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = DenseLrelu(self.feat_size, name="trans_h0")(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return Dense(self.feat_size, name="trans_z")(h)


class SkipDecoder(nn.Module):
    """dense-from-z -> reshape -> 4 deconvs, each consuming a context skip.

    Weight-shared between the translation and autoencoding branches by the
    caller invoking the same module instance twice (the flax equivalent of the
    reference's ``scope.reuse_variables()``, arm_shaping.py:1334).
    """

    filters: Sequence[int]  # encoder filters, consumed in reverse
    kernels: Sequence[int]
    strides: Sequence[int]
    out_channels: int
    bottom_hw: tuple[int, int]  # spatial dims entering the first deconv
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, z, skips, *, deterministic: bool = True):
        bh, bw = self.bottom_hw
        nf_last = self.filters[-1]
        if self.dropout_rate > 0:
            z = nn.Dropout(self.dropout_rate)(z, deterministic=deterministic)
        h = DenseLrelu(nf_last * bh * bw, name="d_h0_lin")(z)
        h = h.reshape(h.shape[0], bh, bw, nf_last)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        n = len(self.filters)
        # deconv i undoes conv (n-1-i): kernel/stride mirror the encoder's.
        for i in range(n - 1):
            skip = skips[n - 1 - i]
            k, s = self.kernels[n - 1 - i], self.strides[n - 1 - i]
            h = jnp.concatenate([h, skip], axis=-1)
            h = lrelu(Deconv(self.filters[n - 2 - i], k, s, name=f"d_h{i + 1}")(h))
        h = jnp.concatenate([h, skips[0]], axis=-1)
        # final deconv is linear — the reference applies no output activation
        return Deconv(self.out_channels, self.kernels[0], self.strides[0], name=f"d_h{n}")(h)


class _ContextBase(nn.Module):
    """Shared wiring: encoders + translator + weight-shared decoder."""

    def _forward(self, src, ctx, tgt, *, deterministic: bool = True):
        ctx_skips, ctx_z = self.encode_ctx(ctx, deterministic=deterministic)
        _, src_z = self.encode_img(src, deterministic=deterministic)
        _, tgt_z = self.encode_img(tgt, deterministic=deterministic)
        trans_z = self.translator(src_z, ctx_z, deterministic=deterministic)
        out = self.decode(trans_z, ctx_skips, deterministic=deterministic)
        out2 = self.decode(tgt_z, ctx_skips, deterministic=deterministic)
        return TranslationOutputs(out=out, out2=out2, trans_z=trans_z, tgt_z=tgt_z, src_z=src_z)

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        return self._forward(src, ctx, tgt, deterministic=deterministic)

    def encode(self, imgs):
        """Latent for agent frames — the reward engine's ``input_z``."""
        _, z = self.encode_img(imgs, deterministic=True)
        return z

    def translate(self, src, ctx):
        """Translate demo frames into a context: (trans_z, translated image)."""
        ctx_skips, ctx_z = self.encode_ctx(ctx, deterministic=True)
        _, src_z = self.encode_img(src, deterministic=True)
        trans_z = self.translator(src_z, ctx_z, deterministic=True)
        out = self.decode(trans_z, ctx_skips, deterministic=True)
        return trans_z, out

    def translate_one_ctx(self, src, ctx1):
        """Translate a batch of src frames into ONE shared context.

        ``ctx1``: [1, H, W, C]. The context encoder runs once; its latent and
        skip maps broadcast across the src batch — the reward engine's demo
        warmup (engine.py) translates hundreds of time-aligned frames into
        the same agent context, where re-encoding the identical ctx per frame
        (as the reference's [src, ctx, tgt] batch layout implies,
        rllab/sampler/base.py:199-226) wastes ~half the encoder FLOPs.
        """
        ctx_skips, ctx_z = self.encode_ctx(ctx1, deterministic=True)
        _, src_z = self.encode_img(src, deterministic=True)
        b = src.shape[0]
        ctx_zb = jnp.broadcast_to(ctx_z, (b, ctx_z.shape[-1]))
        trans_z = self.translator(src_z, ctx_zb, deterministic=True)
        skips_b = [jnp.broadcast_to(s, (b, *s.shape[1:])) for s in ctx_skips]
        out = self.decode(trans_z, skips_b, deterministic=True)
        return trans_z, out


class ContextSkip(_ContextBase):
    """ContextSkipNew (arm_shaping.py:1260-1354): 48x48 / 64x64 sim tasks.

    Encoder 64/128/256/512 ch 5x5 stride-2 convs, 1024-d latent; separate
    context encoder (no final lrelu); decoder from 1024-d z with context
    skip concats at every scale.
    """

    base_filters: int = 64
    feat_size: int = 1024
    image_size: tuple[int, int] = (48, 48)
    channels: int = 3

    def setup(self):
        d = self.base_filters
        filters = (d, d * 2, d * 4, d * 8)
        kernels = (5, 5, 5, 5)
        strides = (2, 2, 2, 2)
        self._ctx_enc = ConvEncoder(filters, kernels, strides, self.feat_size, final_act=False, name="conv_context")
        self._img_enc = ConvEncoder(filters, kernels, strides, self.feat_size, final_act=True, name="conv")
        self.translator = Translator(self.feat_size, name="translate")
        bottom = (self.image_size[0] // 16, self.image_size[1] // 16)
        self._dec = SkipDecoder(filters, kernels, strides, self.channels, bottom, name="deconv")

    def encode_ctx(self, x, *, deterministic=True):
        return self._ctx_enc(x)

    def encode_img(self, x, *, deterministic=True):
        return self._img_enc(x)

    def decode(self, z, skips, *, deterministic=True):
        return self._dec(z, skips)


class ContextSmall(_ContextBase):
    """ContextAEReal (arm_shaping.py:1599-1684): 36x64 real/sweep tasks.

    One encoder shared by src/tgt/ctx, filters (32,16,16,8), strides
    (1,2,1,2), 100-d latent, dropout on every dense/latent hop.
    """

    feat_size: int = 100
    image_size: tuple[int, int] = (36, 64)
    channels: int = 3
    dropout_rate: float = 0.5

    def setup(self):
        filters = (32, 16, 16, 8)
        kernels = (5, 5, 5, 5)
        strides = (1, 2, 1, 2)
        self._enc = ConvEncoder(
            filters, kernels, strides, self.feat_size, final_act=True,
            dropout_rate=self.dropout_rate, name="conv",
        )
        self.translator = Translator(self.feat_size, dropout_rate=self.dropout_rate, name="translate")
        down = 1
        for s in strides:
            down *= s
        bottom = (self.image_size[0] // down, self.image_size[1] // down)
        self._dec = SkipDecoder(
            filters, kernels, strides, self.channels, bottom,
            dropout_rate=self.dropout_rate, name="deconv",
        )

    def encode_ctx(self, x, *, deterministic=True):
        return self._enc(x, deterministic=deterministic)

    def encode_img(self, x, *, deterministic=True):
        return self._enc(x, deterministic=deterministic)

    def decode(self, z, skips, *, deterministic=True):
        return self._dec(z, skips, deterministic=deterministic)


class ContextFeat(_ContextBase):
    """ContextAEInception2 (arm_shaping.py:1786-1894): feature-space variant.

    Runs over backbone feature maps (Inception-v3 Mixed_7c, 8x8x2048 at
    299x299 input) with configurable conv stack and a *residual* output:
    ``out = decoder(...) + ctx`` (:1890-1891). Context encoder here shares the
    src/tgt encode topology including the final lrelu.
    """

    strides: tuple[int, ...] = (1, 2, 1, 2)
    kernels: tuple[int, ...] = (3, 3, 3, 3)
    filters: tuple[int, ...] = (1024, 1024, 512, 512)
    feat_size: int = 1024
    feature_hw: tuple[int, int] = (8, 8)
    feature_channels: int = 2048

    def setup(self):
        self._ctx_enc = ConvEncoder(self.filters, self.kernels, self.strides, self.feat_size, name="conv_context")
        self._img_enc = ConvEncoder(self.filters, self.kernels, self.strides, self.feat_size, name="conv")
        self.translator = Translator(self.feat_size, name="translate")
        down = 1
        for s in self.strides:
            down *= s
        bottom = (self.feature_hw[0] // down, self.feature_hw[1] // down)
        self._dec = SkipDecoder(self.filters, self.kernels, self.strides, self.feature_channels, bottom, name="deconv")

    def encode_ctx(self, x, *, deterministic=True):
        return self._ctx_enc(x)

    def encode_img(self, x, *, deterministic=True):
        return self._img_enc(x)

    def decode(self, z, skips, *, deterministic=True):
        return self._dec(z, skips)

    def _forward(self, src, ctx, tgt, *, deterministic: bool = True):
        outs = super()._forward(src, ctx, tgt, deterministic=deterministic)
        # residual: translated output is a delta on the context features
        return TranslationOutputs(
            out=outs.out + ctx,
            out2=outs.out2 + ctx,
            trans_z=outs.trans_z,
            tgt_z=outs.tgt_z,
            src_z=outs.src_z,
        )

    def translate(self, src, ctx):
        trans_z, out = super().translate(src, ctx)
        return trans_z, out + ctx

    def translate_one_ctx(self, src, ctx1):
        trans_z, out = super().translate_one_ctx(src, ctx1)
        return trans_z, out + ctx1
