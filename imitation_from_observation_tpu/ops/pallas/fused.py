"""Pallas TPU kernels for the translation-model hot path.

Two kernels:

- :func:`dense_lrelu` — ``lrelu(x @ w + b)`` in one MXU pass. Every dense hop
  of the translation nets (h4_lin/hz_lin, the translator pair, d_h0_lin —
  reference arm_shaping.py:1290-1324) has this shape; fusing the bias +
  leaky-ReLU into the matmul's epilogue keeps the activation out of HBM. The
  custom VJP recomputes the activation mask from the output sign (lrelu is
  sign-preserving for leak > 0), so no pre-activation is materialized.

- :func:`pairwise_sqdist` — ``|a_i - b_j|^2`` for all pairs via the expansion
  ``|a|^2 - 2 a.b + |b|^2`` with the cross term on the MXU and the norms
  fused into the epilogue; backs the trainer's nn_err eval metric
  (train_script.py:148) at batch scale.

On non-TPU backends both fall back to plain XLA (tests run the kernels in
interpreter mode explicitly).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_enabled() -> bool:
    """Pallas kernels run on TPU backends unless IFO_TPU_PALLAS=0."""
    if os.environ.get("IFO_TPU_PALLAS") == "0":
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# -- fused dense + lrelu ----------------------------------------------------


def _dense_lrelu_kernel_1pass(x_ref, w_ref, b_ref, o_ref, *, leak: float):
    # whole-K strips resident in VMEM: one MXU pass, epilogue fused
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[:] = jnp.maximum(acc, leak * acc).astype(o_ref.dtype)


def _dense_lrelu_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, leak: float, nk: int):
    # K is the innermost (fastest) grid axis: accumulate partial products in
    # a VMEM f32 scratch, apply bias + lrelu once on the final K step. Tiling
    # K keeps the VMEM footprint flat for any K (the untiled version held
    # whole [tile_m, K] / [K, tile_n] strips and OOMed scoped vmem at K=8192
    # — the 64x64 model's conv-flatten width).
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _epilogue():
        acc = acc_ref[:] + b_ref[:].astype(jnp.float32)
        o_ref[:] = jnp.maximum(acc, leak * acc).astype(o_ref.dtype)


def _dense_lrelu_fwd_pallas(
    x, w, b, leak: float, tile_m: int = 128, tile_n: int = 128, tile_k: int = 1024
):
    m, k = x.shape
    n = w.shape[1]
    mp, np_ = _round_up(m, tile_m), _round_up(n, tile_n)
    cost = lambda kp: pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=(mp * kp + kp * np_ + mp * np_) * 4,
        transcendentals=0,
    )
    # single-pass when whole-K strips fit scoped VMEM (x2 for double
    # buffering, ~12 MB of the 16 MB budget) — measured ~13% faster on the
    # 48x48 model's K=4608 hops; K-tile with an accumulator otherwise (the
    # 64x64 model's K=8192 OOMs the single-pass layout)
    kp1 = _round_up(k, 128)
    if (tile_m + tile_n) * kp1 * 4 * 2 <= 12 * 1024 * 1024:
        xp = jnp.pad(x, ((0, mp - m), (0, kp1 - k)))
        wp = jnp.pad(w, ((0, kp1 - k), (0, np_ - n)))
        bp = jnp.pad(b, (0, np_ - n)).reshape(1, np_)
        out = pl.pallas_call(
            functools.partial(_dense_lrelu_kernel_1pass, leak=leak),
            grid=(mp // tile_m, np_ // tile_n),
            in_specs=[
                pl.BlockSpec((tile_m, kp1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((kp1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
            cost_estimate=cost(kp1),
        )(xp, wp, bp)
        return out[:m, :n]
    kp = _round_up(k, tile_k)
    nk = kp // tile_k
    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    bp = jnp.pad(b, (0, np_ - n)).reshape(1, np_)
    out = pl.pallas_call(
        functools.partial(_dense_lrelu_kernel, leak=leak, nk=nk),
        grid=(mp // tile_m, np_ // tile_n, nk),
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        cost_estimate=cost(kp),
    )(xp, wp, bp)
    return out[:m, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dense_lrelu(x, w, b, leak: float = 0.2):
    """``lrelu(x @ w + b)``; x [M, K], w [K, N], b [N]."""
    if pallas_enabled():
        return _dense_lrelu_fwd_pallas(x, w, b, leak)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
    return jnp.maximum(acc, leak * acc).astype(x.dtype)


def _dense_lrelu_fwd(x, w, b, leak):
    out = dense_lrelu(x, w, b, leak)
    return out, (x, w, out)


def _dense_lrelu_bwd(leak, res, g):
    x, w, out = res
    # lrelu'(pre) = 1 where pre > 0 else leak; sign(out) == sign(pre)
    mask = jnp.where(out > 0, 1.0, leak).astype(g.dtype)
    gpre = (g * mask).astype(jnp.float32)
    dx = jnp.dot(gpre, w.T.astype(jnp.float32), preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.T.astype(jnp.float32), gpre, preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(gpre, axis=0).astype(w.dtype)
    return dx, dw, db


dense_lrelu.defvjp(_dense_lrelu_fwd, _dense_lrelu_bwd)


# -- pairwise squared distance ----------------------------------------------


def _pairwise_kernel(a_ref, b_ref, o_ref):
    a = a_ref[:].astype(jnp.float32)
    bt = b_ref[:].astype(jnp.float32)
    cross = jnp.dot(a, bt.T, preferred_element_type=jnp.float32)
    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(bt * bt, axis=1, keepdims=True).T
    o_ref[:] = (an - 2.0 * cross + bn).astype(o_ref.dtype)


def _pairwise_kernel_ftiled(a_ref, b_ref, o_ref, acc_ref, *, nk: int):
    # F is the innermost grid axis. |a|^2, -2ab, and |b|^2 are all plain sums
    # over F, so each F-chunk's full contribution folds into ONE [tile, tile]
    # f32 accumulator — no separate norm scratch, and the VMEM footprint is
    # flat in F. (The untiled kernel loaded whole [tile, F] strips: at
    # ContextFeat shapes F = 8*8*2048 = 131072 that is 64 MB per operand,
    # which OOMed scoped VMEM — same failure mode dense_lrelu's K-tiling
    # fixed at K=8192.)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:].astype(jnp.float32)
    bt = b_ref[:].astype(jnp.float32)
    cross = jnp.dot(a, bt.T, preferred_element_type=jnp.float32)
    an = jnp.sum(a * a, axis=1, keepdims=True)
    bn = jnp.sum(bt * bt, axis=1, keepdims=True).T
    acc_ref[:] += an - 2.0 * cross + bn

    @pl.when(kk == nk - 1)
    def _flush():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pairwise_sqdist(
    a: jax.Array, b: jax.Array, tile: int = 128, tile_f: int = 2048
) -> jax.Array:
    """All-pairs squared L2: a [M, F], b [N, F] -> [M, N]."""
    if not pallas_enabled():
        an = jnp.sum(a * a, axis=1)[:, None]
        bn = jnp.sum(b * b, axis=1)[None, :]
        return an - 2.0 * a @ b.T + bn
    m, f = a.shape
    n = b.shape[0]
    mp, np_ = _round_up(m, tile), _round_up(n, tile)
    # single-pass when whole-F strips fit scoped VMEM (x2 double buffering,
    # ~12 MB of the 16 MB budget); F-tile with an accumulator otherwise
    fp1 = _round_up(f, 128)
    if (tile + tile) * fp1 * 4 * 2 <= 12 * 1024 * 1024:
        ap = jnp.pad(a, ((0, mp - m), (0, fp1 - f)))
        bp = jnp.pad(b, ((0, np_ - n), (0, fp1 - f)))
        out = pl.pallas_call(
            _pairwise_kernel,
            grid=(mp // tile, np_ // tile),
            in_specs=[
                pl.BlockSpec((tile, fp1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, fp1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        )(ap, bp)
        return out[:m, :n]
    fp = _round_up(f, tile_f)
    nk = fp // tile_f
    ap = jnp.pad(a, ((0, mp - m), (0, fp - f)))
    bp = jnp.pad(b, ((0, np_ - n), (0, fp - f)))
    out = pl.pallas_call(
        functools.partial(_pairwise_kernel_ftiled, nk=nk),
        grid=(mp // tile, np_ // tile, nk),
        in_specs=[
            pl.BlockSpec((tile, tile_f), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, tile_f), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * fp + 4 * (mp + np_) * fp,
            bytes_accessed=(mp * fp + np_ * fp) * 4 * max(1, np_ // tile) + mp * np_ * 4,
            transcendentals=0,
        ),
    )(ap, bp)
    return out[:m, :n]
