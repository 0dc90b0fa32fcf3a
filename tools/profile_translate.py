"""Per-stage wall breakdown of the flagship translate graph on the TPU.

Times encode_ctx / encode_img / translator / decode separately and the full
translate, each with the relay-safe method bench.py uses (chain iterations
through a data dependency inside ``lax.fori_loop``, fetch one scalar) —
naive timing is meaningless here because per-call relay latency is ~30 ms
and ``block_until_ready`` does not synchronize.

Sharpen's docs/BENCHMARKS.md's roofline argument for the ~36% MFU headline:
which half of the graph (stride-2 conv encoder vs deconv decoder) holds the
time, at the bench shape (48x48, bf16, batch 256).

Usage: python tools/profile_translate.py [batch] [hw] [base_filters]
(hw/base_filters exist to smoke-test the harness on CPU at tiny shapes)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from imitation_from_observation_tpu.core.config import TranslationModelConfig
from imitation_from_observation_tpu.models import build_model

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 48
BASE_FILTERS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ITERS = 30


def timed(fn, *args, iters=ITERS):
    """Chained-iteration wall time per call (s).

    Warmup and timing both fence with a real scalar fetch (``float(...)``) —
    ``block_until_ready`` does NOT synchronize on the axon relay, and a
    warmup whose execution is still draining would be absorbed into the
    timed call. The traced loop bound keeps one compile for any n; the timed
    (1+iters)-call has the 1-call (dispatch + fetch + one execution)
    subtracted, like bench.py's measure."""

    @jax.jit
    def loop(n, *a):
        def body(_, carry):
            out = fn(*carry)
            # fold one scalar of the output back into EVERY input leaf so the
            # loop body has a data dependency on all of them and no sub-graph
            # (e.g. the ctx encoder when ctx is loop-invariant) can be hoisted
            eps = jnp.real(jax.tree_util.tree_leaves(out)[0]).ravel()[0] * 1e-9
            return jax.tree_util.tree_map(lambda x: x + eps.astype(x.dtype), carry)

        return jax.lax.fori_loop(0, n, body, a)[0].ravel()[0]

    one = jnp.asarray(1, jnp.int32)
    many = jnp.asarray(1 + iters, jnp.int32)
    float(loop(one, *args))  # compile + full drain
    float(loop(one, *args))  # warm steady state
    t1 = time.perf_counter()
    float(loop(one, *args))
    dt1 = time.perf_counter() - t1
    t0 = time.perf_counter()
    float(loop(many, *args))
    dt = time.perf_counter() - t0
    return max(dt - dt1, 1e-12) / iters


def main():
    cfg = TranslationModelConfig(
        model="context_skip", image_size=(HW, HW), base_filters=BASE_FILTERS,
        feat_size=1024 if BASE_FILTERS == 64 else 32,
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(-1, 1, (BATCH, HW, HW, 3)), jnp.bfloat16)
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x0, x0, x0)

    def bind(method):
        return functools.partial(model.apply, params, method=method)

    ctx_skips, ctx_z = jax.jit(bind("encode_ctx"))(x1)
    _, src_z = jax.jit(bind("encode_img"))(x1)

    rows = [
        ("encode_ctx (conv trunk + skips)", timed(bind("encode_ctx"), x1)),
        ("encode_img (conv trunk)", timed(bind("encode_img"), x1)),
        (
            "translator (FC trunk)",
            timed(
                lambda s, c: model.apply(
                    params, s, c, method=lambda m, a, b: m.translator(a, b, deterministic=True)
                ),
                src_z,
                ctx_z,
            ),
        ),
        (
            "decode (deconv + skip concats)",
            timed(lambda z, s: model.apply(params, z, s, method="decode"), src_z, ctx_skips),
        ),
        ("translate (full graph)", timed(bind("translate"), x1, x1)),
    ]
    print(f"batch={BATCH} hw={HW} dtype=bf16 iters={ITERS} backend={jax.devices()[0].platform}")
    total = rows[-1][1]
    for name, t in rows:
        print(f"{name:34s} {t * 1e3:8.3f} ms/call  {BATCH / t:>12,.0f} frames/s  {t / total * 100:5.1f}%")


if __name__ == "__main__":
    main()
