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

Context-translation variants — one class per reference class with the EXACT
per-line wiring (BN placement, activation quirks, translator depth/width,
skip sets, weight tying, residual outputs, and each class's own loss):

- :class:`ContextAEVariant`          ≙ ContextAE (:459)
- :class:`ContextSkipAEVariant`      ≙ ContextSkipAE (:559)
- :class:`ContextNoBNAEVariant`      ≙ ContextNoBNAE (:662)
- :class:`ContextAEDeconvVariant`    ≙ ContextAEDeconv (:773)
- :class:`ContextResVariant`         ≙ ContextRes (:863)
- :class:`ContextResTranslateVariant`≙ ContextResTranslate (:937)
- :class:`ContextVanillaVariant`     ≙ ContextVanilla (:1040)
- :class:`ContextAEFixedVariant`     ≙ ContextAEFixed (:1149)
- :class:`ContextAETiedVariant`      ≙ ContextAETied (:1356)
- :class:`ContextVanillaDropVariant` ≙ ContextVanillaDrop (:1478)
- :class:`ContextAEInceptionVariant` ≙ ContextAEInception (:1686)

Every class exposes ``__call__(src, ctx, tgt) -> TranslationOutputs`` plus a
``variant_loss(outputs, tgt)`` computing that reference class's own loss
(they differ: plain l2, block-temporal simloss, variance-normalized simloss,
decoder-feature simloss, ...). The trainer prefers ``variant_loss`` over the
canonical 3-term loss when present.

Normalized reference quirks (documented per SURVEY §7): ContextVanillaDrop's
dropout used a module-level ``keep_prob = 1.0`` global (:1481) — here it is a
``dropout_rate`` field defaulting to the same no-op; the temporal-block
simlosses hardcoded batch 100 = 4 videos x 25 frames (:727-729) — here the
block size is ``batch//4`` so any 4-video batch works. Flax param paths are
flat per module (``zh0`` lives on the variant, not nested inside the encoder
scope as TF's ``conv_input/zh0``) — noted for checkpoint conversion.

The reference's ``batch_norm`` is always called with ``train=False``
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
from imitation_from_observation_tpu.ops import deconv2d, deconv_kernel_init, lrelu


class DeconvTo(nn.Module):
    """Deconv with an explicit TF output_shape (ContextAEInception's skip-
    shaped deconvs, arm_shaping.py:1748-1761). Same param layout as Deconv."""

    features: int
    kernel: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x, out_hw):
        w = self.param(
            "w", deconv_kernel_init, (self.kernel, self.kernel, self.features, x.shape[-1]), jnp.float32
        )
        b = self.param("b", nn.initializers.zeros, (self.features,), jnp.float32)
        return deconv2d(x, w, b, stride=self.stride, out_hw=out_hw)


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


# -- shared blocks for the context variants ----------------------------------


def _l2(x):
    x = x.astype(jnp.float32)
    return 0.5 * jnp.sum(x * x)


def _block_simloss(z, scale_by_var: bool, per_term_div3: bool):
    """Temporal-block latent similarity (ContextNoBNAE:727-733, ContextRes:
    994-1000): adjacent fourths of the batch's latents are pulled together,
    optionally normalized by the mean latent variance. The reference
    hardcoded block=25 over train_script's random-video batches (each row an
    independent video at frame i%nlen — the blocks were NOT aligned videos
    there either; quirk kept); here block = batch//4. Batches smaller than 4
    contribute 0 (the reference would have sliced out of range)."""
    z = z.astype(jnp.float32)
    if z.shape[0] < 4:
        return jnp.float32(0.0)
    block = z.shape[0] // 4
    sim = 0.0
    for j in range(3):
        d = z[j * block : (j + 1) * block] - z[(j + 1) * block : (j + 2) * block]
        term = jnp.mean(d * d)
        sim = sim + (term / 3 if per_term_div3 else term)
    if scale_by_var:
        sim = sim / jnp.mean(jnp.var(z, axis=0))
    return sim


class _ZooEncoder(nn.Module):
    """The zoo's conv trunk with per-class BN/activation placement.

    bn_mode:
    - "none": lrelu(conv) x4 (most variants)
    - "all":  lrelu(bn(conv)) x4, BN named c_bn0..3 (ContextSkipAE:585-590)
    - "tail": RAW conv h0 (no act, no bn — the ContextAE quirk :482), then
      lrelu(bn(conv)) with c_bn1..3 (:487-489)
    h4 gets BN (c_bn4) iff bn_mode != "none"; the final latent gets lrelu
    only when the call asks for it (src/tgt vs ctx asymmetry in several
    classes)."""

    base_filters: int = 64
    feat_size: int = 1024

    bn_mode: str = "none"

    @nn.compact
    def __call__(self, x, *, final_act: bool):
        d = self.base_filters
        skips = []
        h = x
        for i, f in enumerate((d, d * 2, d * 4, d * 8)):
            h = Conv(f, name=f"h{i}_conv")(h)
            if self.bn_mode == "all" or (self.bn_mode == "tail" and i > 0):
                h = lrelu(BatchNormInfer(name=f"c_bn{i}")(h))
            elif self.bn_mode == "none":
                h = lrelu(h)
            # bn_mode == "tail" and i == 0: raw conv output (ContextAE:482)
            skips.append(h)
        flat = h.reshape(h.shape[0], -1)
        h4 = Dense(self.feat_size, name="h4_lin")(flat)
        if self.bn_mode != "none":
            h4 = BatchNormInfer(name="c_bn4")(h4)
        h4 = lrelu(h4)
        z = Dense(self.feat_size, name="hz_lin")(h4)
        if final_act:
            z = lrelu(z)
        return skips, z


class _ZooDecoder(nn.Module):
    """d_h0_lin -> reshape -> 3x lrelu[(bn)](deconv) -> linear deconv, with
    optional context-skip concats (d_h1..d_h4; d_bn0..3 when use_bn)."""

    base_filters: int = 64
    out_channels: int = 3
    bottom_hw: tuple[int, int] = (3, 3)
    use_skips: bool = False
    use_bn: bool = False

    @nn.compact
    def __call__(self, z, skips=None, return_intermediates: bool = False):
        g = self.base_filters
        bh, bw = self.bottom_hw
        h = Dense(g * 8 * bh * bw, name="d_h0_lin")(z)
        h = h.reshape(h.shape[0], bh, bw, g * 8)
        if self.use_bn:
            h = BatchNormInfer(name="d_bn0")(h)
        h = lrelu(h)
        inters = []
        for i, f in enumerate((g * 4, g * 2, g)):
            inp = jnp.concatenate([h, skips[3 - i]], axis=-1) if self.use_skips else h
            h = Deconv(f, name=f"d_h{i + 1}")(inp)
            if self.use_bn:
                h = BatchNormInfer(name=f"d_bn{i + 1}")(h)
            h = lrelu(h)
            inters.append(h)
        inp = jnp.concatenate([h, skips[0]], axis=-1) if self.use_skips else h
        out = Deconv(self.out_channels, name="d_h4")(inp)
        if return_intermediates:
            return out, inters
        return out


class _VariantBase(nn.Module):
    """Common fields + reward-engine interface for the exact variants."""

    base_filters: int = 64
    feat_size: int = 1024
    image_size: tuple[int, int] = (48, 48)
    channels: int = 3

    @property
    def _bottom(self):
        return (self.image_size[0] // 16, self.image_size[1] // 16)

    def encode(self, imgs):
        _, z = self._encode_img(imgs)
        return z

    def translate(self, src, ctx):
        outs = self._translate_only(src, ctx)
        return outs

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        raise NotImplementedError


class ContextAEVariant(_VariantBase):
    """ContextAE (arm_shaping.py:459-558): conditional autoencoder.

    Separate ctx/src encoders with a RAW first conv (no act/bn, :482) and BN
    c_bn1..4 on the rest; NO translator and NO target branch — the decoder
    (BN trunk d_bn0..3, no skips) consumes concat(z, ctx_z) directly; loss is
    plain l2(tgt - out) (:556). out2/trans_z/tgt_z mirror out/z/z so the
    uniform TranslationOutputs interface holds (documented aliasing)."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="tail", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="tail", name="conv", **kw)
        self._dec = _ZooDecoder(self.base_filters, self.channels, self._bottom, use_bn=True, name="deconv")

    def _encode_img(self, x):
        return self._img_enc(x, final_act=False)

    def _translate_only(self, src, ctx):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=False)
        out = self._dec(jnp.concatenate([z, ctx_z], axis=-1))
        return z, out

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        z, out = self._translate_only(src, ctx)
        return TranslationOutputs(out=out, out2=out, trans_z=z, tgt_z=z, src_z=z)

    @staticmethod
    def variant_loss(outputs, tgt):
        loss = _l2(tgt - outputs.out)  # :556
        return loss, {"loss": loss, "recon1": loss}


class ContextSkipAEVariant(ContextAEVariant):
    """ContextSkipAE (:559-661): like ContextAE but BN on ALL four convs
    (c_bn0..4, each lrelu(bn(conv)), :587-590) and a SKIP decoder whose
    deconvs consume the ctx encoder's conv maps (:645-658), still BN'd."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="all", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="all", name="conv", **kw)
        self._dec = _ZooDecoder(
            self.base_filters, self.channels, self._bottom, use_skips=True, use_bn=True, name="deconv"
        )

    def _translate_only(self, src, ctx):
        ctx_skips, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=False)
        out = self._dec(jnp.concatenate([z, ctx_z], axis=-1), ctx_skips)
        return z, out


class ContextNoBNAEVariant(ContextAEVariant):
    """ContextNoBNAE (:662-772): the no-BN ablation of ContextSkipAE, plus a
    variance-normalized temporal-block simloss over the src latents
    (:727-733) weighted 1e3 (:771)."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="none", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv", **kw)
        self._dec = _ZooDecoder(
            self.base_filters, self.channels, self._bottom, use_skips=True, name="deconv"
        )

    def _translate_only(self, src, ctx):
        ctx_skips, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=False)
        out = self._dec(jnp.concatenate([z, ctx_z], axis=-1), ctx_skips)
        return z, out

    @staticmethod
    def variant_loss(outputs, tgt):
        recon = _l2(tgt - outputs.out)
        sim = _block_simloss(outputs.src_z, scale_by_var=True, per_term_div3=True)
        loss = recon + 1e3 * sim  # :771
        return loss, {"loss": loss, "recon1": recon, "simloss": sim}


class ContextAEDeconvVariant(_VariantBase):
    """ContextAEDeconv (:773-862): no BN; src/tgt share the 'conv_input'
    encoder with NO final lrelu on z (:809, unlike ContextSkipNew); no
    translator — the skip decoder consumes concat(z, ctx_z); the auxiliary
    truth branch runs the shared decoder only to its 2nd deconv, and the
    loss matches those decoder features: l2 + 1e2*l2(truth_h2 - out_h2)
    (:859-861)."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="none", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv_input", **kw)
        self._dec = _ZooDecoder(
            self.base_filters, self.channels, self._bottom, use_skips=True, name="deconv"
        )

    def _encode_img(self, x):
        return self._img_enc(x, final_act=False)

    def _translate_only(self, src, ctx):
        ctx_skips, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=False)
        out = self._dec(jnp.concatenate([z, ctx_z], axis=-1), ctx_skips)
        return z, out

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        ctx_skips, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, input_z = self._img_enc(src, final_act=False)
        _, truth_z = self._img_enc(tgt, final_act=False)
        out, inters = self._dec(
            jnp.concatenate([input_z, ctx_z], axis=-1), ctx_skips, return_intermediates=True
        )
        _, truth_inters = self._dec(
            jnp.concatenate([truth_z, ctx_z], axis=-1), ctx_skips, return_intermediates=True
        )
        # trans_z/tgt_z carry the flattened 2nd-deconv feature maps of the
        # translated and truth branches: the reference's simloss matches
        # exactly those (output_h2 vs truthoutput_h2, :859)
        return TranslationOutputs(
            out=out, out2=out, trans_z=inters[1].reshape(out.shape[0], -1),
            tgt_z=truth_inters[1].reshape(out.shape[0], -1), src_z=input_z,
        )

    @staticmethod
    def variant_loss(outputs, tgt):
        recon = _l2(tgt - outputs.out)
        # trans_z/tgt_z carry the flattened 2nd-deconv feature maps of the
        # translated and truth branches (:859 matches exactly those)
        sim = _l2(outputs.tgt_z - outputs.trans_z)
        loss = recon + 1e2 * sim  # :861
        return loss, {"loss": loss, "recon1": recon, "simloss": sim}


class ContextResVariant(_VariantBase):
    """ContextRes (:863-945): no BN, no skips, no truth branch; src encoder
    'conv_input' with NO final lrelu; decoder on concat(z, ctx_z); RESIDUAL
    output out = dec + ctx (:941); loss l2 + 1e3 * variance-normalized
    temporal-block simloss over input_z (:994-1000 pattern, no /3)."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="none", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv_input", **kw)
        self._dec = _ZooDecoder(self.base_filters, self.channels, self._bottom, name="deconv")

    def _encode_img(self, x):
        return self._img_enc(x, final_act=False)

    def _translate_only(self, src, ctx):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=False)
        out = self._dec(jnp.concatenate([z, ctx_z], axis=-1)) + ctx
        return z, out

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        z, out = self._translate_only(src, ctx)
        return TranslationOutputs(out=out, out2=out, trans_z=z, tgt_z=z, src_z=z)

    @staticmethod
    def variant_loss(outputs, tgt):
        recon = _l2(tgt - outputs.out)
        sim = _block_simloss(outputs.src_z, scale_by_var=True, per_term_div3=False)
        loss = recon + 1e3 * sim  # :943
        return loss, {"loss": loss, "recon1": recon, "simloss": sim}


class ContextResTranslateVariant(_VariantBase):
    """ContextResTranslate (:937-1039): no BN, no skips; src/tgt share
    'conv_input' WITH final lrelu; translator zh0 -> translate_z (:1046-1047
    pattern, single hidden layer, lives in the encoder scope in TF); shared
    decoder; residual outputs out = dec(trans_z)+ctx, out2 = ctx+dec(tgt_z);
    loss recon1 + recon2 + 1e3 * l2(trans_z - tgt_z) (:1035-1038; l2 = sum/2,
    NOT the mean form ContextSkipNew uses)."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="none", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv_input", **kw)
        self._zh0 = Dense(self.feat_size, name="zh0")
        self._trans = Dense(self.feat_size, name="translate_z")
        self._dec = _ZooDecoder(self.base_filters, self.channels, self._bottom, name="deconv")

    def _encode_img(self, x):
        return self._img_enc(x, final_act=True)

    def _translate_z(self, z, ctx_z):
        h = lrelu(self._zh0(jnp.concatenate([z, ctx_z], axis=-1)))
        return self._trans(h)

    def _translate_only(self, src, ctx):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=True)
        trans_z = self._translate_z(z, ctx_z)
        out = self._dec(trans_z) + ctx
        return trans_z, out

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, src_z = self._img_enc(src, final_act=True)
        _, tgt_z = self._img_enc(tgt, final_act=True)
        trans_z = self._translate_z(src_z, ctx_z)
        out = self._dec(trans_z) + ctx
        out2 = ctx + self._dec(tgt_z)
        return TranslationOutputs(out=out, out2=out2, trans_z=trans_z, tgt_z=tgt_z, src_z=src_z)

    @staticmethod
    def variant_loss(outputs, tgt):
        recon1 = _l2(tgt - outputs.out)
        recon2 = _l2(tgt - outputs.out2)
        sim = _l2(outputs.trans_z - outputs.tgt_z)
        loss = recon1 + recon2 + 1e3 * sim  # :1038
        return loss, {"loss": loss, "recon1": recon1, "recon2": recon2, "simloss": sim}


class ContextVanillaVariant(ContextResTranslateVariant):
    """ContextVanilla (:1040-1148): ContextResTranslate minus the residual
    (out = dec(trans_z), :1146), with the simloss in mean form scaled 1e3 and
    variance-normalized by var(tgt_z) (:1141-1144)."""

    def _translate_only(self, src, ctx):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=True)
        trans_z = self._translate_z(z, ctx_z)
        return trans_z, self._dec(trans_z)

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, src_z = self._img_enc(src, final_act=True)
        _, tgt_z = self._img_enc(tgt, final_act=True)
        trans_z = self._translate_z(src_z, ctx_z)
        return TranslationOutputs(
            out=self._dec(trans_z), out2=self._dec(tgt_z),
            trans_z=trans_z, tgt_z=tgt_z, src_z=src_z,
        )

    @staticmethod
    def variant_loss(outputs, tgt):
        recon1 = _l2(tgt - outputs.out)
        recon2 = _l2(tgt - outputs.out2)
        d = (outputs.trans_z - outputs.tgt_z).astype(jnp.float32)
        sim = jnp.mean(d * d) * 1e3 / jnp.mean(jnp.var(outputs.tgt_z.astype(jnp.float32), axis=0))
        loss = recon1 + recon2 + sim  # :1147
        return loss, {"loss": loss, "recon1": recon1, "recon2": recon2, "simloss": sim}


class ContextAEFixedVariant(_VariantBase):
    """ContextAEFixed (:1149-1259): no conv_context scope — the ctx encoder
    is a THIRD weight set inside the 'trans' subscope (:1185-1191, no final
    lrelu); src/tgt share 'conv_input' with final lrelu; the translator is 3
    hidden lrelu layers of width 2*featsize (zh0/zh1/zh2) + translate_z
    (:1192-1195); shared no-skip decoder; loss recon1+recon2 ONLY (simloss
    computed but excluded, :1256)."""

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv_input", **kw)
        self._ctx_enc = _ZooEncoder(bn_mode="none", name="trans_ctx", **kw)
        f = self.feat_size
        self._zh0 = Dense(2 * f, name="zh0")
        self._zh1 = Dense(2 * f, name="zh1")
        self._zh2 = Dense(2 * f, name="zh2")
        self._trans = Dense(f, name="translate_z")
        self._dec = _ZooDecoder(self.base_filters, self.channels, self._bottom, name="deconv")

    def _encode_img(self, x):
        return self._img_enc(x, final_act=True)

    def _translate_z(self, z, ctx_z):
        h = lrelu(self._zh0(jnp.concatenate([z, ctx_z], axis=-1)))
        h = lrelu(self._zh1(h))
        h = lrelu(self._zh2(h))
        return self._trans(h)

    def _translate_only(self, src, ctx):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=True)
        trans_z = self._translate_z(z, ctx_z)
        return trans_z, self._dec(trans_z)

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        _, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, src_z = self._img_enc(src, final_act=True)
        _, tgt_z = self._img_enc(tgt, final_act=True)
        trans_z = self._translate_z(src_z, ctx_z)
        return TranslationOutputs(
            out=self._dec(trans_z), out2=self._dec(tgt_z),
            trans_z=trans_z, tgt_z=tgt_z, src_z=src_z,
        )

    @staticmethod
    def variant_loss(outputs, tgt):
        recon1 = _l2(tgt - outputs.out)
        recon2 = _l2(tgt - outputs.out2)
        loss = recon1 + recon2  # :1256 — sim excluded
        return loss, {"loss": loss, "recon1": recon1, "recon2": recon2}


class ContextAETiedVariant(_VariantBase):
    """ContextAETied (:1356-1477): ONE encoder ('conv_input') for src, tgt
    AND ctx — tied weights; src/tgt latents get the final lrelu, the ctx
    latent does not (:1404 vs :1399-1405 reuse); translator is a SINGLE
    linear translate_z on concat (:1431-1432, scope 'translate'); shared
    no-skip decoder; loss recon1+recon2 + variance-normalized mean simloss
    (:1468-1477)."""

    dropout_rate: float = 0.0  # ContextVanillaDrop's knob; 0 == keep_prob 1.0

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv_input", **kw)
        self._trans = Dense(self.feat_size, name="translate_z")
        self._drop = nn.Dropout(self.dropout_rate) if self.dropout_rate > 0 else None
        self._dec = _ZooDecoder(self.base_filters, self.channels, self._bottom, name="deconv")

    def _encode_img(self, x):
        return self._img_enc(x, final_act=True)

    def _translate_z(self, z, ctx_z, deterministic=True):
        h = jnp.concatenate([z, ctx_z], axis=-1)
        if self._drop is not None:
            h = self._drop(h, deterministic=deterministic)
        return self._trans(h)

    def _translate_only(self, src, ctx):
        _, ctx_z = self._img_enc(ctx, final_act=False)  # tied weights, no lrelu
        _, z = self._img_enc(src, final_act=True)
        trans_z = self._translate_z(z, ctx_z)
        return trans_z, self._dec(trans_z)

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        _, ctx_z = self._img_enc(ctx, final_act=False)
        _, src_z = self._img_enc(src, final_act=True)
        _, tgt_z = self._img_enc(tgt, final_act=True)
        trans_z = self._translate_z(src_z, ctx_z, deterministic)
        return TranslationOutputs(
            out=self._dec(trans_z), out2=self._dec(tgt_z),
            trans_z=trans_z, tgt_z=tgt_z, src_z=src_z,
        )

    @staticmethod
    def variant_loss(outputs, tgt):
        recon1 = _l2(tgt - outputs.out)
        recon2 = _l2(tgt - outputs.out2)
        d = (outputs.trans_z - outputs.tgt_z).astype(jnp.float32)
        sim = jnp.mean(d * d) * 1e3 / jnp.mean(jnp.var(outputs.tgt_z.astype(jnp.float32), axis=0))
        loss = recon1 + recon2 + sim  # :1475
        return loss, {"loss": loss, "recon1": recon1, "recon2": recon2, "simloss": sim}


class ContextVanillaDropVariant(ContextAETiedVariant):
    """ContextVanillaDrop (:1478-1598): ContextAETied + dropout on the
    translator input (:1561). The reference gated it by a module-level
    ``keep_prob = 1.0`` global (:1481) — normalized to the ``dropout_rate``
    field (default 0.0 == the reference's effective no-op)."""

    dropout_rate: float = 0.0


class ContextAEInceptionVariant(_VariantBase):
    """ContextAEInception (:1686-1786): ContextSkipNew's topology over
    backbone FEATURE MAPS — df_dim 256 (:1687), channels from the input,
    translator trans_h0/trans_z, skip decoder whose deconv output sizes come
    from the ctx skip shapes (:1748-1752; with 8x8 maps and stride 2 the
    ceil chain is 4,2,1,1, so d_h1 maps 1x1 -> 1x1), and RESIDUAL outputs
    out/out2 = decoder + ctx (:1782-1783). Loss = the canonical 3-term."""

    base_filters: int = 256
    feature_hw: tuple[int, int] = (8, 8)
    feature_channels: int = 2048

    def setup(self):
        kw = dict(base_filters=self.base_filters, feat_size=self.feat_size)
        self._ctx_enc = _ZooEncoder(bn_mode="none", name="conv_context", **kw)
        self._img_enc = _ZooEncoder(bn_mode="none", name="conv", **kw)
        self._trans_h0 = Dense(self.feat_size, name="trans_h0")
        self._trans = Dense(self.feat_size, name="trans_z")
        # spatial ceil-chain of the stride-2 encoder (:1748-1752): with 8x8
        # maps the sizes are 4, 2, 1, 1 — deconv targets come from these,
        # not input*stride
        g = self.base_filters
        dims = [tuple(self.feature_hw)]
        for _ in range(4):
            dims.append((-(-dims[-1][0] // 2), -(-dims[-1][1] // 2)))
        self._dims = dims  # [full, h0, h1, h2, h3]
        bh, bw = dims[4]
        self._d_h0_lin = Dense(g * 8 * bh * bw, name="d_h0_lin")
        self._deconvs = [
            DeconvTo(g * 4, name="d_h1"),
            DeconvTo(g * 2, name="d_h2"),
            DeconvTo(g, name="d_h3"),
        ]
        self._d_out = DeconvTo(self.feature_channels, name="d_h4")

    def _encode_img(self, x):
        return self._img_enc(x, final_act=True)

    def _translate_z(self, z, ctx_z):
        h = lrelu(self._trans_h0(jnp.concatenate([z, ctx_z], axis=-1)))
        return self._trans(h)

    def _decode(self, z, skips):
        g = self.base_filters
        bh, bw = self._dims[4]
        h = lrelu(self._d_h0_lin(z))
        h = h.reshape(h.shape[0], bh, bw, g * 8)
        for i, dc in enumerate(self._deconvs):
            h = jnp.concatenate([h, skips[3 - i]], axis=-1)
            h = lrelu(dc(h, self._dims[3 - i]))
        h = jnp.concatenate([h, skips[0]], axis=-1)
        return self._d_out(h, self._dims[0])

    def _translate_only(self, src, ctx):
        ctx_skips, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, z = self._img_enc(src, final_act=True)
        trans_z = self._translate_z(z, ctx_z)
        out = self._decode(trans_z, ctx_skips) + ctx
        return trans_z, out

    def __call__(self, src, ctx, tgt, *, deterministic: bool = True):
        ctx_skips, ctx_z = self._ctx_enc(ctx, final_act=False)
        _, src_z = self._img_enc(src, final_act=True)
        _, tgt_z = self._img_enc(tgt, final_act=True)
        trans_z = self._translate_z(src_z, ctx_z)
        out = self._decode(trans_z, ctx_skips) + ctx
        out2 = self._decode(tgt_z, ctx_skips) + ctx
        return TranslationOutputs(out=out, out2=out2, trans_z=trans_z, tgt_z=tgt_z, src_z=src_z)


# reference class -> exact module (the canonical three live in context.py)
CONTEXT_VARIANTS: dict[str, type] = {
    "context_ae": ContextAEVariant,  # ContextAE:459
    "context_skip_ae": ContextSkipAEVariant,  # ContextSkipAE:559
    "context_nobn_ae": ContextNoBNAEVariant,  # ContextNoBNAE:662
    "context_ae_deconv": ContextAEDeconvVariant,  # ContextAEDeconv:773
    "context_res": ContextResVariant,  # ContextRes:863
    "context_res_translate": ContextResTranslateVariant,  # ContextResTranslate:937
    "context_vanilla": ContextVanillaVariant,  # ContextVanilla:1040
    "context_ae_fixed": ContextAEFixedVariant,  # ContextAEFixed:1149
    "context_ae_tied": ContextAETiedVariant,  # ContextAETied:1356
    "context_vanilla_drop": ContextVanillaDropVariant,  # ContextVanillaDrop:1478
    "context_ae_inception": ContextAEInceptionVariant,  # ContextAEInception:1686
}
