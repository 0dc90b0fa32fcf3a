"""Whole-model torch (CPU) oracle for the assembled ContextSkip forward.

An independent re-computation of the paper's canonical translation model
(reference ContextSkipNew, gym/envs/mujoco/arm_shaping.py:1260-1354) using
torch primitives with TF1 'SAME' conv/deconv semantics — it shares no code
with the flax implementation, so agreement means the full assembled graph
(conv encoders -> translator -> deconv decoder with context skips, plus the
quirk that the context encoder's final dense has no lrelu, :1291) is
semantically right, not just the primitives (SURVEY §7 hard-part #2).

Also recomputes the 3-term translation loss (arm_shaping.py:1345-1354).

Used by tests/test_models.py (whole-forward golden parity) and by bench.py's
``frame_psnr_parity_db`` metric.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def tf_same_pads(in_size: int, stride: int, k: int) -> tuple[int, int]:
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    return total // 2, total - total // 2


def torch_conv2d_same(x, w, b, stride):
    """x NHWC, w HWIO (TF layout) -> TF conv2d(..., 'SAME') via torch."""
    xt = torch.from_numpy(np.array(x, np.float64)).double().permute(0, 3, 1, 2)
    wt = torch.from_numpy(np.array(w, np.float64)).double().permute(3, 2, 0, 1)
    ph = tf_same_pads(x.shape[1], stride, w.shape[0])
    pw = tf_same_pads(x.shape[2], stride, w.shape[1])
    xt = F.pad(xt, (pw[0], pw[1], ph[0], ph[1]))
    out = F.conv2d(xt, wt, torch.from_numpy(np.array(b, np.float64)).double(), stride=stride)
    return out.permute(0, 2, 3, 1).numpy()


def torch_deconv2d_same(x, w, b, stride):
    """TF conv2d_transpose(..., 'SAME'), kernel [k, k, out, in]."""
    k = w.shape[0]
    out_h, out_w = x.shape[1] * stride, x.shape[2] * stride
    ph = tf_same_pads(out_h, stride, k)
    pw = tf_same_pads(out_w, stride, k)
    xt = torch.from_numpy(np.array(x, np.float64)).double().permute(0, 3, 1, 2)
    # torch conv_transpose2d kernel layout [in, out, kh, kw]
    wt = torch.from_numpy(np.array(w, np.float64)).double().permute(3, 2, 0, 1)
    full = F.conv_transpose2d(xt, wt, stride=stride)
    out = full[:, :, ph[0] : ph[0] + out_h, pw[0] : pw[0] + out_w]
    out = out + torch.from_numpy(np.array(b, np.float64)).double().reshape(1, -1, 1, 1)
    return out.permute(0, 2, 3, 1).numpy()


def lrelu_np(x, leak=0.2):
    return np.maximum(x, leak * x)


def linear_np(x, w, b):
    return np.asarray(x, np.float64) @ np.asarray(w, np.float64) + np.asarray(b, np.float64)


def _p(tree, *names):
    node = tree
    for n in names:
        node = node[n]
    return np.asarray(node)


def _encode(params_enc, x, final_act: bool):
    """ConvEncoder oracle: 4x (conv SAME stride from kernel shape + lrelu),
    flatten, dense+lrelu, final dense (+lrelu unless context-encoder quirk)."""
    skips = []
    h = np.asarray(x, np.float64)
    i = 0
    while f"h{i}_conv" in params_enc:
        w, b = _p(params_enc, f"h{i}_conv", "w"), _p(params_enc, f"h{i}_conv", "b")
        # ContextSkip always strides 2 (arm_shaping.py:1277-1289)
        h = lrelu_np(torch_conv2d_same(h, w, b, stride=2))
        skips.append(h)
        i += 1
    flat = h.reshape(h.shape[0], -1)
    h4 = lrelu_np(linear_np(flat, _p(params_enc, "h4_lin", "w"), _p(params_enc, "h4_lin", "b")))
    z = linear_np(h4, _p(params_enc, "hz_lin", "w"), _p(params_enc, "hz_lin", "b"))
    if final_act:
        z = lrelu_np(z)
    return skips, z


def _translate_z(params_tr, src_z, ctx_z):
    h = np.concatenate([src_z, ctx_z], axis=-1)
    h = lrelu_np(linear_np(h, _p(params_tr, "trans_h0", "w"), _p(params_tr, "trans_h0", "b")))
    return linear_np(h, _p(params_tr, "trans_z", "w"), _p(params_tr, "trans_z", "b"))


def _decode(params_dec, z, skips):
    n = len(skips)
    w0, b0 = _p(params_dec, "d_h0_lin", "w"), _p(params_dec, "d_h0_lin", "b")
    h = lrelu_np(linear_np(z, w0, b0))
    bottom_c = skips[-1].shape[-1]
    bottom_hw = skips[-1].shape[1:3]
    h = h.reshape(h.shape[0], bottom_hw[0], bottom_hw[1], bottom_c)
    for i in range(n - 1):
        h = np.concatenate([h, skips[n - 1 - i]], axis=-1)
        w, b = _p(params_dec, f"d_h{i + 1}", "w"), _p(params_dec, f"d_h{i + 1}", "b")
        h = lrelu_np(torch_deconv2d_same(h, w, b, stride=2))
    h = np.concatenate([h, skips[0]], axis=-1)
    w, b = _p(params_dec, f"d_h{n}", "w"), _p(params_dec, f"d_h{n}", "b")
    return torch_deconv2d_same(h, w, b, stride=2)  # linear output, no tanh


def forward(params, src, ctx, tgt):
    """Full assembled ContextSkip forward. params = flax tree ({'params': ...})."""
    p = params["params"] if "params" in params else params
    ctx_skips, ctx_z = _encode(p["conv_context"], ctx, final_act=False)
    _, src_z = _encode(p["conv"], src, final_act=True)
    _, tgt_z = _encode(p["conv"], tgt, final_act=True)
    trans_z = _translate_z(p["translate"], src_z, ctx_z)
    out = _decode(p["deconv"], trans_z, ctx_skips)
    out2 = _decode(p["deconv"], tgt_z, ctx_skips)
    return dict(out=out, out2=out2, trans_z=trans_z, tgt_z=tgt_z, src_z=src_z)


def translation_loss_np(o: dict, tgt, sim_weight: float = 1e3):
    """3-term loss oracle (arm_shaping.py:1345-1354; tf.nn.l2_loss = sum/2)."""
    tgt = np.asarray(tgt, np.float64)
    recon1 = 0.5 * np.sum((tgt - o["out"]) ** 2)
    recon2 = 0.5 * np.sum((tgt - o["out2"]) ** 2)
    simloss = np.mean((o["trans_z"] - o["tgt_z"]) ** 2) * sim_weight
    return recon1 + recon2 + simloss, dict(recon1=recon1, recon2=recon2, simloss=simloss)


def psnr_vs_oracle(hw: int = 48, batch: int = 4, base_filters: int = 64, feat_size: int = 1024) -> float:
    """PSNR (dB) between the flax forward's translated frames and this oracle
    with identical weights; 99 dB cap (bit-identical within f32 rounding)."""
    import jax

    from imitation_from_observation_tpu.models import ContextSkip

    model = ContextSkip(image_size=(hw, hw), base_filters=base_filters, feat_size=feat_size)
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (batch, hw, hw, 3)).astype(np.float32)
    ctx = rng.uniform(-1, 1, (batch, hw, hw, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (batch, hw, hw, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), src, ctx, tgt)
    ours = np.asarray(jax.jit(model.apply)(params, src, ctx, tgt).out, np.float64)
    ref = forward(params, src, ctx, tgt)["out"]
    mse = float(np.mean((ours - ref) ** 2))
    if mse <= 0:
        return 99.0
    # frames live in [-1, 1] -> peak-to-peak 2
    return min(99.0, 10.0 * np.log10(4.0 / mse))
