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
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("IFO_FORCE_CPU"):
    # CPU smoke runs must not touch the axon relay (a concurrent queue step
    # would serialize with us and corrupt ITS timings); the env var alone is
    # ignored because sitecustomize pre-imports jax — set the config knob.
    jax.config.update("jax_platforms", "cpu")

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
            # the feedback scalar must touch EVERY output leaf: a dead leaf
            # lets XLA DCE the sub-graph producing it (translate returns
            # (trans_z, image) — feeding back only leaf[0] erased the entire
            # decoder from the "full graph" row)
            eps = sum(
                jnp.real(leaf).ravel()[0].astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out)
            ) * 1e-9
            # serialize iterations with an O(1) one-element bump per input
            # leaf (in-place in the aliased while-loop carry) — a full
            # elementwise add is an extra HBM pass over the carry, ~0.3 ms/it
            # for the decode row's batch-256 skip pyramid
            def bump(x):
                return x.at[(0,) * x.ndim].add(eps.astype(x.dtype))

            return jax.tree_util.tree_map(bump, carry)

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

    def measure_rows():
        return [
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

    def consistent(rows):
        # the stage rows must roughly tile the full graph (fusion across
        # stage boundaries makes the sum a little > total; relay noise on a
        # cold first run made it 2x+ once — see round-3 00:52 queue run)
        stage_sum = sum(t for _, t in rows[:-1])
        total = rows[-1][1]
        return 0.7 <= stage_sum / total <= 1.6

    rows = measure_rows()
    if not consistent(rows):
        # first-run timings can absorb still-draining relay work despite the
        # scalar-fetch fences; one full re-measure is cheap vs mis-steering
        print("stage sum inconsistent with full graph — re-measuring once", file=sys.stderr)
        rows = measure_rows()
    print(f"batch={BATCH} hw={HW} dtype=bf16 iters={ITERS} backend={jax.devices()[0].platform}")
    total = rows[-1][1]
    stage_sum = sum(t for _, t in rows[:-1])
    for name, t in rows:
        print(f"{name:34s} {t * 1e3:8.3f} ms/call  {BATCH / t:>12,.0f} frames/s  {t / total * 100:5.1f}%")
    if not consistent(rows):
        print(
            f"WARNING: stage rows sum to {stage_sum / total * 100:.0f}% of the full graph "
            "after a re-measure — timings unreliable (relay contention?), do not use",
        )


if __name__ == "__main__":
    main()
