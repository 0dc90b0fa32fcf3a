"""Why does sweep succeed 0.00? — the controlled study VERDICT r4 asked for.

Established facts (sweep_full_recipe/summary.json, sweep_variants/):
- oracle control at the identical protocol reaches SuccessRate 1.00
  (best ReturnTrue -0.467; threshold -0.55), so the metric is achievable —
  the visual reward, not the success definition, is the binding constraint;
- visual (ours) plateaus at -0.78 +/- 0.04 across 7 draws, improving ~0.19
  from its start but never crossing the threshold.

This study isolates WHERE the visual reward stops helping:

1. **Reward decomposition leg** (v10 re-run, 100 iters): the round-5 engine
   logs RewardFeatTerm/RewardPixTerm per iteration — does the feature term
   saturate while the pixel term dominates (or vice versa), and does either
   keep falling after ReturnTrue plateaus?
2. **Scale sweep** (60 iters each at scale 0.1 / 10.0 vs the recipe's 1.0):
   sweep uses ContextSmall at 36x64 where the pixel term's magnitude differs
   from the 48x48 tasks; the reference never re-tuned scale for sweep
   (run_trpo_sweep_ours.py uses the push default).
3. **Translation quality control**: held-out demo translation loss + nn_err
   from the (re)trained sweep model vs the same metrics of the reach model —
   is sweep's translator simply worse, making the demo-side anchor noisy?

Artifacts -> examples/results/sweep_diagnosis/{decomp,scale_0.1,scale_10}/ +
summary.json + NOTES.md. Every leg resumes past completed work.

Reference: run_trpo_sweep_ours.py (sweep RL), cleaner_env.py (fixed scene),
rllab/sampler/base.py:243-257 (cost terms).
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_translation_training,
    run_visual_trpo,
    sample_rl_context,
)
from imitation_from_observation_tpu.exp.report import done_rows

BASE = os.path.join(os.path.dirname(__file__), "results", "sweep_full_recipe")
LOG = os.path.join(os.path.dirname(__file__), "results", "sweep_diagnosis")
N_TRAIN = 800
os.makedirs(LOG, exist_ok=True)

# -- model: load-or-rebuild the sweep translator (checkpoints not committed) --
_ds = preset("sweep")
_ds = _ds.replace(
    log_dir=BASE,
    # fused-scan rebuild (see throw_variants_seeds.py: identical semantics,
    # ~90 ms/step relay dispatch amortized 500x)
    train=_ds.train.replace(
        n_iters=60_000, n_videos=1000, n_train=N_TRAIN, steps_per_call=500
    ),
)
trainer = run_translation_training(
    _ds, os.path.join(BASE, "videos", "*.mp4"), resume=True
)
demo_data = trainer.valid_data

# -- leg 3: translation-quality control --------------------------------------
qual_path = os.path.join(LOG, "translation_quality.json")
if not os.path.exists(qual_path):
    metrics, _ = trainer._eval_step(
        trainer.state.params, *trainer._device_batch(trainer.valid_sampler.sample())
    )
    q = {f"sweep_{k}": float(v) for k, v in metrics.items()}
    # reach comparison point: the committed reach progress.csv's final eval row
    reach_csv = os.path.join(
        os.path.dirname(__file__), "results", "reach_full_recipe", "translation", "progress.csv"
    )
    if os.path.exists(reach_csv):
        import csv

        rows = list(csv.DictReader(open(reach_csv)))
        if rows:
            last = rows[-1]
            for k in ("Loss", "NNErr", "Sim"):
                if k in last:
                    q[f"reach_final_{k}"] = float(last[k])
    with open(qual_path, "w") as f:
        json.dump(q, f, indent=1)
    print("translation quality:", json.dumps(q, indent=1))

base_cfg = preset("sweep")
ctx = sample_rl_context("sweep", seed=10)  # the v10 draw from sweep_variants

summary = {}
LEGS = [
    ("decomp", 1.0, 100),
    ("scale_0.1", 0.1, 60),
    ("scale_10", 10.0, 60),
]
if os.environ.get("SWEEP_DIAG_FAST"):
    # deadline mode: the per-iteration reward decomposition is the
    # VERDICT-requested evidence; the scale sweep is secondary
    LEGS = LEGS[:1]
for name, scale, iters in LEGS:
    cfg = base_cfg.replace(
        name=f"sweep_diag_{name}",
        log_dir=os.path.join(LOG, name),
        env=base_cfg.env.replace(horizon=50, frame_backend="tpu", **ctx),
        rl=base_cfg.rl.replace(
            batch_size=12500, max_path_length=50, n_envs=250, n_iters=iters,
            init_std=10.0, snapshot_mode="none", seed=10,
        ),
        reward=base_cfg.reward.replace(mode="ours", scale=scale),
    )
    hist = done_rows(cfg.log_dir, iters)
    if hist is None:
        os.makedirs(cfg.log_dir, exist_ok=True)
        _, hist = run_visual_trpo(cfg, params=trainer.state.params, demo_data=demo_data)
    rt = [h["ReturnTrue"] for h in hist]
    sr = [h["SuccessRate"] for h in hist]
    row = dict(
        scale=scale, iters=iters, best=max(rt), best_iter=int(np.argmax(rt)),
        first10=float(np.mean(rt[:10])), last10=float(np.mean(rt[-10:])),
        max_success=max(sr),
    )
    feat = [h.get("RewardFeatTerm") for h in hist if h.get("RewardFeatTerm") is not None]
    pix = [h.get("RewardPixTerm") for h in hist if h.get("RewardPixTerm") is not None]
    if feat:
        row.update(
            feat_first10=float(np.mean(feat[:10])), feat_last10=float(np.mean(feat[-10:])),
            pix_first10=float(np.mean(pix[:10])), pix_last10=float(np.mean(pix[-10:])),
        )
    summary[name] = row
    print(f"[{name}] best {row['best']:.4f} maxSuccess {row['max_success']:.2f} "
          + (f"feat {row['feat_first10']:.1f}->{row['feat_last10']:.1f} "
               f"pix {row['pix_first10']:.1f}->{row['pix_last10']:.1f}" if feat else ""))

with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)

with open(os.path.join(LOG, "NOTES.md"), "w") as f:
    d = summary["decomp"]
    parts = [f"""# Sweep diagnosis — why SuccessRate 0.00 (VERDICT r4 item 4)

Oracle control at the identical protocol: SuccessRate **1.00**, best -0.467
(`sweep_full_recipe/summary.json`) — the metric is achievable; the visual
reward is the binding constraint. This study decomposes it.

| leg | scale | best RT | maxSuccess | feat first10->last10 | pix first10->last10 |
|---|---|---|---|---|---|
"""]
    for name, r in summary.items():
        ff = f"{r.get('feat_first10', float('nan')):.1f} -> {r.get('feat_last10', float('nan')):.1f}"
        pp = f"{r.get('pix_first10', float('nan')):.1f} -> {r.get('pix_last10', float('nan')):.1f}"
        parts.append(
            f"| {name} | {r['scale']} | {r['best']:.3f} | {r['max_success']:.2f} | {ff} | {pp} |\n"
        )
    parts.append("""
Translation quality vs reach: `translation_quality.json`.
Per-iteration decomposition columns (RewardFeatTerm/RewardPixTerm, round-5
engine) are in each leg's `rl/progress.csv`.
""")
    f.write("".join(parts))
print(json.dumps(summary, indent=1))
