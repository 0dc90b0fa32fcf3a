"""Headline benchmark: translated frames/sec/chip.

The reference's hot inference path is the visual reward engine
(rllab/sampler/base.py:195-257): encode agent frames + translate demo videos
with ContextSkipNew on a GPU, one 25-frame batch per sess.run. This benchmark
measures the same computation — ``ContextSkip.translate`` (encode src + ctx,
feature translate, deconv decode) at 48x48 — on one TPU chip.

``vs_baseline`` is the speedup over the BASELINE.json reference point: the
same translate graph on the host CPU (the reference repo publishes no numeric
throughput; BASELINE.json's north star is ">=10x CPU-reference translated
frames/sec/chip", so the CPU measurement — cached in ``.bench_cpu.json``,
measured by this script in a subprocess on first run — is the denominator).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BATCH = 256  # frames per device call
WARMUP = 3
ITERS = 20
CPU_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE_CPU.json"
)


def measure(
    platform: str | None = None,
    iters: int = ITERS,
    batch: int = BATCH,
    dtype_name: str = "bfloat16",
    warmup: int = WARMUP,
) -> float:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np

    from imitation_from_observation_tpu.models import ContextSkip

    model = ContextSkip(image_size=(48, 48))
    rng = np.random.default_rng(0)
    # bf16 activations on TPU (the MXU-native dtype, params stay f32);
    # f32 on CPU where bf16 is emulated (and the reference ran f32).
    dtype = jnp.dtype(dtype_name)
    src = jnp.asarray(rng.standard_normal((batch, 48, 48, 3)), dtype)
    ctx = jnp.asarray(rng.standard_normal((batch, 48, 48, 3)), dtype)
    params = model.init(jax.random.key(0), src, ctx, src)

    # The TPU here sits behind an async relay where per-call dispatch/fetch
    # latency dwarfs compute and block_until_ready is unreliable; so iterate
    # on-device (each translate feeds the next — a true data dependency) and
    # time a single execution ending in a scalar fetch.
    @jax.jit
    def translate_n(params, src, ctx, n):
        def body(_, s):
            _, out = model.apply(params, s, ctx, method="translate")
            return out.astype(dtype)

        out = jax.lax.fori_loop(0, n, body, src)
        return jnp.sum(out.astype(jnp.float32))

    one = jnp.asarray(1, jnp.int32)  # traced bound: one compile for any n
    many = jnp.asarray(1 + iters, jnp.int32)
    float(translate_n(params, src, ctx, one))  # compile + warm
    for _ in range(warmup):
        float(translate_n(params, src, ctx, one))
    t1 = time.perf_counter()
    float(translate_n(params, src, ctx, one))
    dt1 = time.perf_counter() - t1
    t0 = time.perf_counter()
    float(translate_n(params, src, ctx, many))
    dt = time.perf_counter() - t0
    # subtract the 1-iteration call (dispatch + fetch + one translate) so the
    # result reflects steady-state per-translate throughput
    return batch * iters / max(dt - dt1, 1e-9)


def cpu_baseline() -> float:
    if os.path.exists(CPU_CACHE):
        with open(CPU_CACHE) as f:
            return json.load(f)["frames_per_sec"]
    code = (
        "import json, bench; print(json.dumps({'frames_per_sec': "
        "bench.measure('cpu', iters=3, batch=64, dtype_name='float32', warmup=1)}))"
    )
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    fps = json.loads(line)["frames_per_sec"]
    with open(CPU_CACHE, "w") as f:
        json.dump({"frames_per_sec": fps}, f)
    return fps


def main() -> None:
    fps = measure()
    try:
        base = cpu_baseline()
        vs = fps / base
    except Exception:
        vs = float("nan")
    print(
        json.dumps(
            {
                "metric": "translated_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
