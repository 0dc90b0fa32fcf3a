"""The long tail of the reference model zoo (arm_shaping.py).

The three load-bearing models (ContextSkipNew / ContextAEReal /
ContextAEInception2) live in ``context.py`` with exact topology. This module
covers the remaining 14 experimental variants the reference keeps around:

Auxiliary (non-context) models:
- :class:`AutoAE`       ≙ AutoDC (:87)      — plain conv autoencoder, BN trunk
- :class:`TimeRegressor`≙ TimeDC (:166) / TimePred (:339) — frame -> time
  regression (l2 / mse flavors)
- :class:`TimeClassifier` ≙ TimeSoftmax (:303) — frame -> time-bucket softmax
- :class:`SubspaceAE`   ≙ SubspaceAE (:210)  — two-video AE with latent
  alignment loss and per-video decoders
- :class:`ReachAE`      ≙ ReachAE (:371)     — AE with BN dense bottleneck

Context-translation variants, expressed through one configurable module
(:class:`ContextVariant`) whose flags reproduce each reference class's
distinguishing structure (BN / skips / residual output / tied encoders /
dropout); see ``CONTEXT_VARIANTS`` for the name -> flags mapping. The
reference's ``batch_norm`` is always called with ``train=False``
(arm_shaping.py:40-47 — moving stats never update), i.e. it acts as a learned
affine; ``BatchNormInfer`` reproduces exactly that.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from imitation_from_observation_tpu.models.context import (
    Conv,
    Deconv,
    Dense,
    DenseLrelu,
    TranslationOutputs,
)
from imitation_from_observation_tpu.ops import lrelu


class BatchNormInfer(nn.Module):
    """TF contrib batch_norm as the reference uses it: is_training=False
    always, so x is normalized by *frozen* moving stats (init 0/1) and scaled
    by learned gamma/beta (arm_shaping.py:33-47)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("moving_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("moving_variance", nn.initializers.ones, (c,), jnp.float32)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * gamma + beta).astype(x.dtype)


class _BNEncoder(nn.Module):
    """conv -> 3x lrelu(bn(conv)) -> dense trunk (AutoDC/ReachAE pattern:
    note NO activation on the first conv, arm_shaping.py:117)."""

    base_filters: int = 64
    feat_size: int = 1024
    bn_dense: bool = False
    z_linear: bool = True

    @nn.compact
    def __call__(self, x):
        d = self.base_filters
        h = Conv(d, name="h0_conv")(x)
        h = lrelu(BatchNormInfer(name="bn1")(Conv(d * 2, name="h1_conv")(h)))
        h = lrelu(BatchNormInfer(name="bn2")(Conv(d * 4, name="h2_conv")(h)))
        h = lrelu(BatchNormInfer(name="bn3")(Conv(d * 8, name="h3_conv")(h)))
        flat = h.reshape(h.shape[0], -1)
        h4 = Dense(self.feat_size, name="h4_lin")(flat)
        if self.bn_dense:
            h4 = BatchNormInfer(name="bn4")(h4)
        h4 = lrelu(h4)
        return Dense(self.feat_size, name="hz_lin")(h4)


class _BNDecoder(nn.Module):
    """dense -> 4x act(bn(deconv)) -> linear deconv (AutoDC decoder,
    arm_shaping.py:132-160; relu there, lrelu in ContextAE's)."""

    base_filters: int = 64
    out_channels: int = 3
    bottom_hw: tuple[int, int] = (3, 3)
    act: str = "relu"

    @nn.compact
    def __call__(self, z):
        g = self.base_filters
        bh, bw = self.bottom_hw
        act = nn.relu if self.act == "relu" else lrelu
        h = Dense(g * 8 * bh * bw, name="d_h0_lin")(z)
        h = act(BatchNormInfer(name="gbn0")(h.reshape(h.shape[0], bh, bw, g * 8)))
        h = act(BatchNormInfer(name="gbn1")(Deconv(g * 4, name="d_h1")(h)))
        h = act(BatchNormInfer(name="gbn2")(Deconv(g * 2, name="d_h2")(h)))
        h = act(BatchNormInfer(name="gbn3")(Deconv(g, name="d_h3")(h)))
        return Deconv(self.out_channels, name="d_h4")(h)


class AutoAE(nn.Module):
    """AutoDC (arm_shaping.py:87-160): plain autoencoder, loss l2(out - x)."""

    base_filters: int = 64
    feat_size: int = 1024
    image_size: tuple[int, int] = (48, 48)
    channels: int = 3

    @nn.compact
    def __call__(self, x):
        z = _BNEncoder(self.base_filters, self.feat_size, name="conv")(x)
        bottom = (self.image_size[0] // 16, self.image_size[1] // 16)
        out = _BNDecoder(self.base_filters, self.channels, bottom, name="deconv")(z)
        return out, z


class TimeRegressor(nn.Module):
    """TimeDC (:166) / TimePred (:339): frame -> scalar progress-time.
    TimeDC trains with summed l2, TimePred with mean squared error."""

    base_filters: int = 64
    feat_size: int = 1024

    @nn.compact
    def __call__(self, x):
        d = self.base_filters
        h = Conv(d, name="h0_conv")(x)
        h = lrelu(BatchNormInfer(name="bn1")(Conv(d * 2, name="h1_conv")(h)))
        h = lrelu(BatchNormInfer(name="bn2")(Conv(d * 4, name="h2_conv")(h)))
        h = lrelu(BatchNormInfer(name="bn3")(Conv(d * 8, name="h3_conv")(h)))
        h = DenseLrelu(self.feat_size, name="h3_lin")(h.reshape(h.shape[0], -1))
        h = DenseLrelu(self.feat_size // 2, name="h4_lin")(h)
        return Dense(1, name="h5_lin")(h).squeeze(-1)


class TimeClassifier(nn.Module):
    """TimeSoftmax (:303): frame -> softmax over n_classes time buckets."""

    n_classes: int = 50
    base_filters: int = 64
    feat_size: int = 1024

    @nn.compact
    def __call__(self, x):
        d = self.base_filters
        h = Conv(d, name="h0_conv")(x)
        h = lrelu(BatchNormInfer(name="bn1")(Conv(d * 2, name="h1_conv")(h)))
        h = lrelu(BatchNormInfer(name="bn2")(Conv(d * 4, name="h2_conv")(h)))
        h = lrelu(BatchNormInfer(name="bn3")(Conv(d * 8, name="h3_conv")(h)))
        h = DenseLrelu(self.feat_size, name="h3_lin")(h.reshape(h.shape[0], -1))
        h = DenseLrelu(self.feat_size // 2, name="h4_lin")(h)
        return Dense(self.n_classes, name="h5_lin")(h)  # logits


class SubspaceAE(nn.Module):
    """SubspaceAE (:210): encode two videos with a shared trunk, align their
    latent sequences (simloss), reconstruct each with its own decoder."""

    base_filters: int = 64
    feat_size: int = 1024
    image_size: tuple[int, int] = (48, 48)
    channels: int = 3

    @nn.compact
    def __call__(self, videos):
        """videos: [2, T, H, W, C] -> (outs [2, T, H, W, C], simloss)."""
        two, T = videos.shape[:2]
        flat = videos.reshape(two * T, *videos.shape[2:])
        z = _BNEncoder(self.base_filters, self.feat_size, bn_dense=True, name="conv")(flat)
        z_seq = z.reshape(two, T, self.feat_size)
        simloss = 0.5 * jnp.sum((z_seq[0] - z_seq[1]) ** 2)
        bottom = (self.image_size[0] // 16, self.image_size[1] // 16)
        outs = []
        for j in range(2):
            h = DenseLrelu(self.feat_size, name=f"deconv{j}_g_h4_lin")(z_seq[j])
            outs.append(
                _BNDecoder(self.base_filters, self.channels, bottom, name=f"deconv{j}")(h)
            )
        return jnp.stack(outs), simloss


class ReachAE(nn.Module):
    """ReachAE (:371): AE with BN dense bottleneck + BN decoder."""

    base_filters: int = 64
    feat_size: int = 1024
    image_size: tuple[int, int] = (48, 48)
    channels: int = 3

    @nn.compact
    def __call__(self, x):
        z = _BNEncoder(self.base_filters, self.feat_size, bn_dense=True, name="conv")(x)
        h = lrelu(BatchNormInfer(name="g_bn4")(Dense(self.feat_size, name="g_h4_lin")(z)))
        bottom = (self.image_size[0] // 16, self.image_size[1] // 16)
        out = _BNDecoder(self.base_filters, self.channels, bottom, name="deconv")(h)
        return out, z


class ContextVariant(nn.Module):
    """Configurable context-translation model covering the zoo's context
    variants (see CONTEXT_VARIANTS): optional BN, optional skip connections,
    optional residual output (out += ctx image), tied vs separate context
    encoder, optional dropout."""

    use_bn: bool = False
    use_skips: bool = True
    residual: bool = False
    tied_ctx_encoder: bool = False  # ctx shares the src/tgt encoder
    dropout_rate: float = 0.0
    base_filters: int = 64
    feat_size: int = 1024
    image_size: tuple[int, int] = (48, 48)
    channels: int = 3

    def setup(self):
        from imitation_from_observation_tpu.models.context import ConvEncoder, SkipDecoder, Translator

        d = self.base_filters
        filters = (d, d * 2, d * 4, d * 8)
        kernels = (5, 5, 5, 5)
        strides = (2, 2, 2, 2)
        enc_kw = dict(dropout_rate=self.dropout_rate)
        self._img_enc = ConvEncoder(filters, kernels, strides, self.feat_size, final_act=True, name="conv", **enc_kw)
        if not self.tied_ctx_encoder:
            self._ctx_enc = ConvEncoder(filters, kernels, strides, self.feat_size, final_act=False, name="conv_context", **enc_kw)
        self.translator = Translator(self.feat_size, dropout_rate=self.dropout_rate, name="translate")
        bottom = (self.image_size[0] // 16, self.image_size[1] // 16)
        if self.use_skips:
            self._dec = SkipDecoder(filters, kernels, strides, self.channels, bottom, dropout_rate=self.dropout_rate, name="deconv")
        else:
            self._dec = _BNDecoder(d, self.channels, bottom, act="lrelu", name="deconv")

    def _encode_ctx(self, ctx, deterministic):
        if self.tied_ctx_encoder:
            return self._img_enc(ctx, deterministic=deterministic)
        return self._ctx_enc(ctx, deterministic=deterministic)

    def _decode(self, z, skips, deterministic):
        if self.use_skips:
            return self._dec(z, skips, deterministic=deterministic)
        return self._dec(z)

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        ctx_skips, ctx_z = self._encode_ctx(ctx, deterministic)
        _, src_z = self._img_enc(src, deterministic=deterministic)
        _, tgt_z = self._img_enc(tgt, deterministic=deterministic)
        trans_z = self.translator(src_z, ctx_z, deterministic=deterministic)
        out = self._decode(trans_z, ctx_skips, deterministic)
        out2 = self._decode(tgt_z, ctx_skips, deterministic)
        if self.residual:
            out = out + ctx
            out2 = out2 + ctx
        return TranslationOutputs(out=out, out2=out2, trans_z=trans_z, tgt_z=tgt_z, src_z=src_z)

    def encode(self, imgs):
        _, z = self._img_enc(imgs, deterministic=True)
        return z

    def translate(self, src, ctx):
        ctx_skips, ctx_z = self._encode_ctx(ctx, True)
        _, src_z = self._img_enc(src, deterministic=True)
        trans_z = self.translator(src_z, ctx_z, deterministic=True)
        out = self._decode(trans_z, ctx_skips, True)
        if self.residual:
            out = out + ctx
        return trans_z, out


# reference class -> ContextVariant flags (structural features per class;
# the canonical three in context.py remain exact-topology implementations)
CONTEXT_VARIANTS: dict[str, dict] = {
    "context_ae": dict(use_bn=True, use_skips=False),  # ContextAE:459
    "context_skip_ae": dict(use_bn=True, use_skips=True),  # ContextSkipAE:559
    "context_nobn_ae": dict(use_bn=False, use_skips=True),  # ContextNoBNAE:662
    "context_ae_deconv": dict(use_skips=True),  # ContextAEDeconv:773
    "context_res": dict(use_skips=False, residual=True),  # ContextRes:863
    "context_res_translate": dict(use_skips=False, residual=True),  # ContextResTranslate:937
    "context_vanilla": dict(use_skips=False, residual=True, tied_ctx_encoder=True),  # ContextVanilla:1040
    "context_ae_fixed": dict(use_skips=False, tied_ctx_encoder=True),  # ContextAEFixed:1149
    "context_ae_tied": dict(use_skips=False, residual=True, tied_ctx_encoder=True),  # ContextAETied:1356
    "context_vanilla_drop": dict(use_skips=False, residual=True, tied_ctx_encoder=True, dropout_rate=0.5),  # ContextVanillaDrop:1478
    "context_ae_inception": dict(use_skips=True, residual=True),  # ContextAEInception:1686
}
