"""A/B the flagship translate graph's dtype/batch levers on the TPU.

docs/BENCHMARKS.md argues the 48x48 ContextSkip translate sits at ~36% MFU
because the conv shapes starve the MXU; this script tests the cheap levers
that could move that number without changing the model:

  - param dtype f32 (current) vs bf16 (halves weight HBM traffic)
  - activation dtype bf16 (current) vs f32 (control; also what the
    reference ran)
  - batch 128 / 256 / 512 / 1024 (occupancy control)

Timing method is bench.py's: chain iterations through a data dependency in
``lax.fori_loop`` (the ctx input rotates through the carry so the context
encoder stays in the loop), fetch one scalar, subtract a 1-iteration call —
``block_until_ready`` does not synchronize on the axon relay.

Usage: python tools/bench_kernel_variants.py [hw] [base_filters]
(tiny-shape CPU smoke: python ... 16 8)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

HW = int(sys.argv[1]) if len(sys.argv) > 1 else 48
BASE_FILTERS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ITERS = 60  # round 3 ran 20: at batch 256 that times a ~17 ms interval
# against ~30 ms relay latency — noise produced a phantom 1.7x cliff at
# batch 256 (302,681 f/s measured once, ~180k at 128/512/1024). Each combo
# now repeats REPEATS times and reports the median + spread.
REPEATS = 3
GF_PER_FRAME = 0.77 if (HW, BASE_FILTERS) == (48, 64) else None


def measure(batch: int, act_dtype, param_dtype) -> float:
    from imitation_from_observation_tpu.core.config import TranslationModelConfig
    from imitation_from_observation_tpu.models import build_model

    cfg = TranslationModelConfig(
        model="context_skip", image_size=(HW, HW), base_filters=BASE_FILTERS,
        feat_size=1024 if BASE_FILTERS == 64 else 32,
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((batch, HW, HW, 3)), act_dtype)
    ctx = jnp.asarray(rng.standard_normal((batch, HW, HW, 3)), act_dtype)
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    params = model.init(jax.random.key(0), x0, x0, x0)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(param_dtype) if p.dtype == jnp.float32 else p, params
    )

    @jax.jit
    def translate_n(params, src, ctx, n):
        def body(_, carry):
            s, c = carry
            _, out = model.apply(params, s, c, method="translate")
            return (out.astype(act_dtype), s)

        out, _ = jax.lax.fori_loop(0, n, body, (src, ctx))
        return jnp.sum(out.astype(jnp.float32))

    one = jnp.asarray(1, jnp.int32)
    many = jnp.asarray(1 + ITERS, jnp.int32)
    float(translate_n(params, src, ctx, one))  # compile + drain
    float(translate_n(params, src, ctx, one))
    t1 = time.perf_counter()
    float(translate_n(params, src, ctx, one))
    dt1 = time.perf_counter() - t1
    t0 = time.perf_counter()
    float(translate_n(params, src, ctx, many))
    dt = time.perf_counter() - t0
    return batch * ITERS / max(dt - dt1, 1e-9)


def main():
    print(f"hw={HW} filters={BASE_FILTERS} iters={ITERS} backend={jax.devices()[0].platform}")
    combos = [
        ("bf16 act / f32 par (bench.py)", 256, jnp.bfloat16, jnp.float32),
        ("bf16 act / bf16 par", 256, jnp.bfloat16, jnp.bfloat16),
        ("f32 act / f32 par (reference)", 256, jnp.float32, jnp.float32),
        ("bf16/bf16 batch 128", 128, jnp.bfloat16, jnp.bfloat16),
        ("bf16/bf16 batch 512", 512, jnp.bfloat16, jnp.bfloat16),
        ("bf16/bf16 batch 1024", 1024, jnp.bfloat16, jnp.bfloat16),
    ]
    for name, batch, act, par in combos:
        runs = sorted(measure(batch, act, par) for _ in range(REPEATS))
        fps = runs[REPEATS // 2]
        spread = (runs[-1] - runs[0]) / fps * 100
        extra = f"  {fps * GF_PER_FRAME / 1e3:6.1f} eff TFLOP/s" if GF_PER_FRAME else ""
        print(
            f"{name:32s} batch={batch:5d}  {fps:>12,.0f} frames/s{extra}"
            f"  (median of {REPEATS}, spread {spread:.0f}%)"
        )


if __name__ == "__main__":
    main()
