"""Headline benchmark, covering BASELINE.json's metric set.

One JSON line with four measurements:

- ``translated_frames_per_sec_per_chip`` (headline ``value``): the visual
  reward engine's hot inference path (rllab/sampler/base.py:195-257) —
  ``ContextSkip.translate`` at 48x48 in bf16 on one chip. The timed loop
  carries BOTH inputs ((src, ctx) -> (out, src)), so the context encoder is
  re-run every iteration — nothing is loop-invariant for XLA to hoist; this
  is the full encode-src + encode-ctx + translate + decode graph per frame.
- ``reward_eval_latency_ms_per_step``: steady-state latency of
  ``VisualRewardEngine.process`` on a production-shape RL iteration
  (80 paths x 51 steps, 25 scored 48x48 frames each, 30 held-out demos,
  mode 'ours'), divided by total env steps — BASELINE.json's "reward-eval
  latency per rollout step". ``reward_eval_device_frames_ms_per_step`` is
  the same workload on the production device-resident frame path (raycast
  render -> on-chip gather -> scoring; no host round trip).
- ``train_steps_per_sec``: fused Adam training steps/sec at the reference's
  translation-training shape (ContextSkip 48x48, batch 100 —
  train_script.py:128,163), i.e. the wall rate of the reference's
  100k-iteration job.
- ``frame_psnr_parity_db``: PSNR between the flax ContextSkip forward and
  the independent torch oracle (TF1 conv/deconv semantics) with identical
  weights on a fixed input batch — BASELINE.json's "frame PSNR parity"
  (flax side runs on the default backend, torch oracle on host CPU;
  inf-safe capped at 99 dB).

``vs_baseline`` is the headline fps over the single-core CPU reference point
cached in ``BENCH_BASELINE_CPU.json``. The cache was measured with the
pre-fix loop (context encode hoisted), i.e. a LIGHTER graph than today's
numerator — the reported speedup is therefore conservative.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.
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
# Last successful full measurement, written after every healthy run. If the
# relay is dead for the whole wait window, the null line embeds this so the
# round record still carries clearly-labeled (stale) numbers.
LAST_GOOD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST_GOOD.json"
)

# The axon TPU relay can die for hours (see CLAUDE.md). A dead relay makes
# backend init hang indefinitely IN-PROCESS, so health must be probed in a
# subprocess with a timeout, and the whole bench must be gated on it —
# otherwise the driver's round-end bench run hangs forever.
_PROBE_CODE = (
    "import jax, jax.numpy as jnp\n"
    "assert jax.devices()[0].platform != 'cpu', 'no accelerator registered'\n"
    "assert float(jnp.ones(8).sum()) == 8.0\n"
)


# Coordination with tools/run_queue.sh: two processes sharing the relay
# serialize and corrupt each other's timings (CLAUDE.md). The queue runner
# marks a running step in QUEUE_ACTIVE (its pid) and holds new steps while
# BENCH_REQUEST exists; the bench requests the window, then waits for any
# live step to finish before measuring.
BENCH_REQUEST = "/tmp/bench_request"
QUEUE_ACTIVE = "/tmp/queue_step_active"
YIELDED = "/tmp/relay_yielded"


def _queue_step_running() -> bool:
    try:
        with open(QUEUE_ACTIVE) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)  # signal 0: existence check only
        return True
    except (OSError, ValueError):
        return False  # absent, unreadable, or stale (runner died mid-step)


def _queue_step_yielded() -> bool:
    # a long-running step that saw BENCH_REQUEST parks itself and advertises
    # /tmp/relay_yielded (core/relay_coord.py) — the relay is then exclusively
    # ours even though the step's QUEUE_ACTIVE sentinel is still up. It stays
    # parked while our BENCH_REQUEST pid-file is live, i.e. for this whole run.
    try:
        with open(YIELDED) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)
        return True
    except (OSError, ValueError):
        return False


def wait_for_queue_idle(max_wait_s: float) -> bool:
    """Wait for any in-flight queue step to finish or cooperatively yield;
    True if the relay is exclusively ours."""
    deadline = time.time() + max_wait_s
    first = True
    while _queue_step_running() and not _queue_step_yielded():
        if first:
            print("bench: waiting for a running queue step...", file=sys.stderr)
            first = False
        if time.time() >= deadline:
            return False
        time.sleep(5)  # cooperative steps park within seconds — poll fast
    return True


def wait_for_tpu(max_wait_s: float, probe_timeout_s: float = 180.0) -> bool:
    """Block until a tiny TPU op succeeds, up to ``max_wait_s``. Returns
    whether the relay is healthy. Probes run in subprocesses because a dead
    relay hangs backend init un-interruptibly in-process."""
    deadline = time.time() + max_wait_s
    first = True
    while True:
        # never let a single hung probe overshoot the whole wait budget (a
        # dead relay hangs the op; small BENCH_RELAY_MAX_WAIT values must
        # still produce the stale-fallback line promptly)
        budget = max(10.0, deadline - time.time() + 5.0)
        try:
            rc = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                timeout=min(probe_timeout_s, budget),
                capture_output=True,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if first:
            print("bench: TPU relay unhealthy, waiting...", file=sys.stderr)
            first = False
        if time.time() >= deadline:
            return False
        time.sleep(min(60.0, max(1.0, deadline - time.time())))


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
    # bf16 activations AND params on TPU — the production scoring config
    # (reward/engine.py inference_dtype='auto'): bf16 is the MXU-native
    # dtype, and bf16 params halve weight HBM traffic; f32 on CPU where
    # bf16 is emulated (and the reference ran f32). bf16-vs-f32 output
    # parity is gated by ``frame_psnr_bf16_params_db`` below and
    # tests/test_reward.py::test_bf16_inference_matches_f32.
    dtype = jnp.dtype(dtype_name)
    src = jnp.asarray(rng.standard_normal((batch, 48, 48, 3)), dtype)
    ctx = jnp.asarray(rng.standard_normal((batch, 48, 48, 3)), dtype)
    params = model.init(jax.random.key(0), src, ctx, src)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
    )

    # The TPU here sits behind an async relay where per-call dispatch/fetch
    # latency dwarfs compute and block_until_ready is unreliable; so iterate
    # on-device (each translate feeds the next — a true data dependency) and
    # time a single execution ending in a scalar fetch. The ctx input rotates
    # through the carry so the context encoder runs INSIDE the loop.
    @jax.jit
    def translate_n(params, src, ctx, n):
        def body(_, carry):
            s, c = carry
            _, out = model.apply(params, s, c, method="translate")
            return (out.astype(dtype), s)

        out, _ = jax.lax.fori_loop(0, n, body, (src, ctx))
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


def measure_reward_latency(
    n_paths: int = 80,
    horizon: int = 51,
    n_demos: int = 30,
    hw: int = 48,
    model_kw: dict | None = None,
) -> tuple[float, float]:
    """Steady-state VisualRewardEngine.process wall time per env step (ms),
    for BOTH frame paths: (host uint8 frames, device-resident frames).
    ``model_kw`` scales the model down for CPU smoke runs."""
    import jax
    import numpy as np

    from imitation_from_observation_tpu.core.config import (
        RewardConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.models import build_model
    from imitation_from_observation_tpu.reward import VisualRewardEngine

    t_frames = horizon // 2  # scored odd steps (base.py:256)
    rng = np.random.default_rng(0)
    model_cfg = TranslationModelConfig(
        model="context_skip", image_size=(hw, hw), **(model_kw or {})
    )
    model = build_model(model_cfg)
    x = np.zeros((1, hw, hw, 3), np.float32)
    params = model.init(jax.random.key(0), x, x, x)
    demo = rng.uniform(-1, 1, (t_frames, n_demos, hw, hw, 3)).astype(np.float32)
    eng = VisualRewardEngine(
        RewardConfig(mode="ours", scale=0.1), model_cfg, params=params, demo_data=demo
    )

    def make_paths(seed):
        r = np.random.default_rng(seed)
        paths = []
        for _ in range(n_paths):
            frames = [None] * horizon
            for j in range(t_frames):
                frames[2 * j + 1] = r.integers(0, 255, (1, hw, hw, 3), dtype=np.uint8)
            paths.append(
                dict(
                    rewards=np.zeros(horizon),
                    env_infos={"frames": frames, "reward_true": np.zeros(horizon)},
                )
            )
        return paths

    eng.process(make_paths(1))  # compile + demo-translation warmup cache
    eng.process(make_paths(2))  # steady-state warm call
    # median of 3 timed calls: one process() is a single relay round trip,
    # so a lone sample carries ~relay-jitter-sized noise (observed 0.12 vs
    # 0.29 ms/step across benches minutes apart). Inputs are built OUTSIDE
    # the timed region — path construction is not reward-eval work.
    batches = [make_paths(s) for s in (3, 4, 5)]
    samples = []
    for b in batches:
        t0 = time.perf_counter()
        eng.process(b)
        samples.append(time.perf_counter() - t0)
    host_ms = sorted(samples)[1] / (n_paths * horizon) * 1e3

    # The production RL loop never ships frames to the host: the raycast
    # renderer leaves them device-resident and the engine gathers/scores them
    # on-chip (reward/engine.py::_gather_device_frames). Measure that path
    # too — it is the per-iteration reward cost at reference scale.
    import jax.numpy as jnp

    def make_dev_paths(seed):
        r = np.random.default_rng(seed)
        block = jnp.asarray(
            r.integers(0, 255, (t_frames, n_paths, 1, hw, hw, 3), dtype=np.uint8)
        )
        paths = []
        for i in range(n_paths):
            paths.append(
                dict(
                    rewards=np.zeros(horizon),
                    frames_dev=(block, i),
                    env_infos={"reward_true": np.zeros(horizon)},
                )
            )
        return paths

    eng.process(make_dev_paths(1))  # compile/warm the device gather + score
    eng.process(make_dev_paths(2))
    # in production the frame blocks are ALREADY device-resident (raycast
    # renders on-chip) — build them up front and fence each upload with a
    # scalar fetch so the timed region measures gather+score only
    dev_batches = [make_dev_paths(s) for s in (3, 4, 5)]
    for b in dev_batches:
        float(jnp.sum(b[0]["frames_dev"][0][0, 0, 0, 0, 0]))
    samples = []
    for b in dev_batches:
        t0 = time.perf_counter()
        eng.process(b)
        samples.append(time.perf_counter() - t0)
    dev_ms = sorted(samples)[1] / (n_paths * horizon) * 1e3
    return host_ms, dev_ms


def measure_train_throughput(
    hw: int = 48,
    batch: int = 100,
    n_videos: int = 40,
    steps: int = 300,
    compute_dtype: str = "float32",
) -> float:
    """Fused-training steps/sec at the reference's shape (ContextSkip 48x48,
    batch 100, Adam — train_script.py:128,163): the wall rate of the
    reference's 100k-iteration translation job. ``compute_dtype='bfloat16'``
    measures the opt-in mixed-precision path (TrainConfig.compute_dtype)."""
    import numpy as np

    from imitation_from_observation_tpu.core.config import (
        TrainConfig,
        TranslationModelConfig,
    )
    from imitation_from_observation_tpu.train import TranslationTrainer

    rng = np.random.default_rng(0)
    vdata = rng.uniform(-1, 1, (26, n_videos, hw, hw, 3)).astype(np.float32)
    # snap to the u8 grid so the trainer takes its PRODUCTION device-data
    # path (uint8-packed dataset, in-step decode) — real demo ingests are
    # u8-exact by construction (video/preprocess.py transform)
    vdata = (
        np.rint((vdata + 1.0) * 127.5).astype(np.uint8).astype(np.float32)
        / np.float32(127.5)
        - np.float32(1.0)
    )
    cfg = TrainConfig(
        batch_size=batch,
        n_iters=steps,
        n_train=int(0.8 * n_videos),
        eval_every=10**9,
        save_every=10**9,
        log_every=10**9,
        steps_per_call=50,
        compute_dtype=compute_dtype,
    )
    trainer = TranslationTrainer(
        TranslationModelConfig(model="context_skip", image_size=(hw, hw)), cfg, vdata
    )

    def drain():
        # the fused calls dispatch asynchronously and block_until_ready is
        # unreliable on the axon relay — fence with a real scalar fetch
        import jax

        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        float(leaf.ravel()[0])

    trainer.train(50)  # first trace/compile
    trainer.train(50)  # second trace (donated/weak-type variant)
    drain()
    t0 = time.perf_counter()
    trainer.train(steps)
    drain()
    dt = time.perf_counter() - t0
    return steps / dt


def measure_raycast_fps(batch: int = 250, hw: int = 48, iters: int = 20) -> float:
    """On-device raycast renderer throughput (frames/s) at the RL vec-step
    shape: 250 envs x 48x48 over the real reacher scene geometry. This is
    the renderer that replaced the host-GL frame path (sim/raycast.py) —
    every reward frame at reference scale comes through it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imitation_from_observation_tpu.sim.raycast import SceneSpec, render_batch

    import mujoco

    from imitation_from_observation_tpu.sim.base import _ASSET_DIR

    m = mujoco.MjModel.from_xml_path(os.path.join(_ASSET_DIR, "reacher3dof.xml"))
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    spec = SceneSpec.from_model(m)
    G = m.ngeom
    rng = np.random.default_rng(0)
    xpos = np.tile(d.geom_xpos[None], (batch, 1, 1)).astype(np.float32)
    xpos += rng.normal(0, 0.01, xpos.shape).astype(np.float32)
    xmat = np.tile(d.geom_xmat.reshape(G, 3, 3)[None], (batch, 1, 1, 1)).astype(np.float32)
    rgba = np.tile(m.geom_rgba[None], (batch, 1, 1)).astype(np.float32)
    cam = np.zeros((batch, 6), np.float32)
    cam[:, 3], cam[:, 4] = 4.0, -45.0
    cam[:, 5] = rng.uniform(0, 360, batch)

    @jax.jit
    def render_n(xpos, xmat, rgba, cam, n):
        def body(_, carry):
            xp, acc = carry
            img = render_batch(spec, xp, xmat, rgba, cam, hw, hw, 2)
            # feed a pixel back into the geometry so nothing is hoisted
            return (xp + (img.astype(jnp.float32)[:, 0, 0, :1, None] * 1e-9), acc + jnp.sum(img[:, 0, 0, 0]))

        _, acc = jax.lax.fori_loop(0, n, body, (xpos, jnp.zeros((), jnp.uint32)))
        return acc

    one = jnp.asarray(1, jnp.int32)
    many = jnp.asarray(1 + iters, jnp.int32)
    int(render_n(xpos, xmat, rgba, cam, one))  # compile
    int(render_n(xpos, xmat, rgba, cam, one))
    t1 = time.perf_counter()
    int(render_n(xpos, xmat, rgba, cam, one))
    dt1 = time.perf_counter() - t1
    t0 = time.perf_counter()
    int(render_n(xpos, xmat, rgba, cam, many))
    dt = time.perf_counter() - t0
    return batch * iters / max(dt - dt1, 1e-9)


def measure_device_rollout_sps(
    batch: int = 12_500, horizon: int = 100, iters: int = 3
) -> float:
    """Fully on-device rollout sampling (rl/device_rollout.py): consumed
    sample-batch steps/s on cartpole at the reach-recipe batch size. Each
    sample is ONE device program (policy + dynamics + auto-reset in a scan)
    plus one host fetch; the fetch is part of the sampler's real cost, so
    wall-clock per obtain_samples (median of ``iters`` after warmup) is the
    honest number — the host transfer itself forces device sync, so the
    relay's non-blocking block_until_ready is not a hazard here."""
    from imitation_from_observation_tpu.rl.device_rollout import DeviceSampler
    from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy

    pol = GaussianMLPPolicy(obs_dim=4, action_dim=1, hidden=(32, 32), init_std=10.0, seed=0)
    sampler = DeviceSampler(
        "cartpole", pol, batch_size=batch, max_path_length=horizon, seed=0
    )
    sampler.obtain_samples()  # compile + warm
    walls = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sampler.obtain_samples()
        walls.append(time.perf_counter() - t0)
    return batch / sorted(walls)[len(walls) // 2]


def measure_bf16_psnr(hw: int = 48, batch: int = 4) -> float | None:
    """PSNR (dB) of the bf16-params translate (the production scoring dtype)
    vs the f32-params translate with identical weights/inputs — the parity
    gate for running the frozen-params inference path in bfloat16."""
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from imitation_from_observation_tpu.models import ContextSkip

        model = ContextSkip(image_size=(hw, hw))
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.uniform(-1, 1, (batch, hw, hw, 3)), jnp.float32)
        ctx = jnp.asarray(rng.uniform(-1, 1, (batch, hw, hw, 3)), jnp.float32)
        params = model.init(jax.random.key(0), src, ctx, src)
        p16 = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
        )

        @jax.jit
        def both(src, ctx):
            _, o32 = model.apply(params, src, ctx, method="translate")
            _, o16 = model.apply(
                p16, src.astype(jnp.bfloat16), ctx.astype(jnp.bfloat16), method="translate"
            )
            return jnp.mean((o32 - o16.astype(jnp.float32)) ** 2)

        mse = float(both(src, ctx))
        if mse <= 0:
            return 99.0
        return min(99.0, 10.0 * np.log10(4.0 / mse))  # peak-to-peak 2 ([-1,1])
    except Exception as e:
        print(f"bf16 psnr unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        return None


def measure_psnr_parity(hw: int = 48, batch: int = 4) -> float | None:
    """PSNR (dB) of the flax ContextSkip forward vs the torch TF1-semantics
    oracle with identical weights. None if the oracle is unavailable."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
        from oracle_contextskip import psnr_vs_oracle

        return psnr_vs_oracle(hw=hw, batch=batch)
    except Exception as e:  # a null metric must still say WHY on stderr
        print(f"psnr parity unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        return None


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


def _stale_line(error: str) -> dict:
    """A parseable fallback record carrying the last clean measurement.

    The driver treats a bench that exits non-zero/hangs as "no round record"
    (round 4: rc=124 behind a relay outage). A dead relay must instead
    produce ONE valid JSON line: last-good values, clearly flagged
    ``stale: true`` with the failure reason, so the record degrades instead
    of disappearing.
    """
    line = {
        "metric": "translated_frames_per_sec_per_chip",
        "value": None,
        "unit": "frames/s",
        "vs_baseline": None,
    }
    if os.path.exists(LAST_GOOD):
        try:
            with open(LAST_GOOD) as f:
                line.update(json.load(f))
        except (OSError, ValueError):
            pass
    line["stale"] = True
    line["error"] = error
    return line


def main() -> None:
    # Gate on relay health (default: wait up to 10 min, override via
    # BENCH_RELAY_MAX_WAIT seconds; 0 skips the probe entirely). The wait is
    # deliberately short: the driver's own timeout is the hard ceiling, and a
    # stale-but-parseable line beats a timeout (round 4's rc=124). If the
    # relay never comes back — or dies mid-measurement — emit the last-good
    # values flagged stale rather than hanging or crashing.
    max_wait = float(os.environ.get("BENCH_RELAY_MAX_WAIT", "600"))
    try:
        with open(BENCH_REQUEST, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    try:
        _main_gated(max_wait)
    except Exception as e:  # relay death mid-measure, OOM, anything
        print(json.dumps(_stale_line(f"bench crashed mid-run: {type(e).__name__}: {e}")))
    finally:
        try:
            os.remove(BENCH_REQUEST)
        except OSError:
            pass


def _main_gated(max_wait: float) -> None:
    if max_wait > 0 and not wait_for_tpu(max_wait):
        print(json.dumps(_stale_line(
            "TPU relay unhealthy for the full bench wait "
            f"window ({max_wait:.0f}s); see CLAUDE.md relay-death note"
        )))
        return
    # even with the relay gate disabled (max_wait=0), a concurrent queue step
    # still serializes the relay — check once so corrupted timings are at
    # least labeled and never cached as last-good. BENCH_AS_QUEUE_STEP=1 is
    # set when bench itself runs AS a queue step: the active-sentinel then
    # belongs to this very run, so waiting on it would deadlock.
    # The idle wait is short and independent of max_wait: a cooperative step
    # parks within one fused call (~seconds — see core/relay_coord.py and
    # tools/drill_handoff.py's measured bound); anything still running after
    # BENCH_QUEUE_IDLE_WAIT is non-cooperative, and a contended-but-real
    # measurement beats timing out.
    if os.environ.get("BENCH_AS_QUEUE_STEP"):
        contended = False
    else:
        idle_wait = float(os.environ.get("BENCH_QUEUE_IDLE_WAIT", "300"))
        contended = (
            (_queue_step_running() and not _queue_step_yielded())
            if max_wait <= 0
            else not wait_for_queue_idle(idle_wait)
        )
    fps = measure()
    try:
        base = cpu_baseline()
        vs = fps / base
    except Exception:
        vs = float("nan")
    try:
        host_ms, dev_ms = measure_reward_latency()
        reward_ms, reward_dev_ms = round(host_ms, 4), round(dev_ms, 4)
    except Exception:
        reward_ms = reward_dev_ms = None
    try:
        train_sps = round(measure_train_throughput(), 1)
    except Exception:
        train_sps = None
    try:
        train_sps_bf16 = round(measure_train_throughput(compute_dtype="bfloat16"), 1)
    except Exception:
        train_sps_bf16 = None
    try:
        raycast_fps = round(measure_raycast_fps(), 1)
    except Exception as e:
        print(f"raycast bench unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        raycast_fps = None
    try:
        device_rollout_sps = round(measure_device_rollout_sps(), 1)
    except Exception as e:
        print(f"device rollout bench unavailable: {type(e).__name__}: {e}", file=sys.stderr)
        device_rollout_sps = None
    psnr = measure_psnr_parity()
    bf16_psnr = measure_bf16_psnr()
    result = {
        "metric": "translated_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
        "reward_eval_latency_ms_per_step": reward_ms,
        "reward_eval_device_frames_ms_per_step": reward_dev_ms,
        "train_steps_per_sec": train_sps,
        "train_steps_per_sec_bf16": train_sps_bf16,
        "raycast_frames_per_sec": raycast_fps,
        "device_rollout_steps_per_sec": device_rollout_sps,
        "frame_psnr_parity_db": psnr,
        "frame_psnr_bf16_params_db": None if bf16_psnr is None else round(bf16_psnr, 1),
    }
    if contended:
        # another relay client ran concurrently; timings include serialization
        result["contended"] = True
    if not contended:  # the last-good cache must only hold clean timings
        try:
            with open(LAST_GOOD, "w") as f:
                json.dump({**result, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f)
        except OSError:
            pass  # read-only tree must not break the bench line itself
    print(json.dumps(result))


if __name__ == "__main__":
    main()
