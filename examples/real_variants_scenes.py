"""Real-pusher visual-RL across scenes — robustness for BASELINE config 5.

The reference's real experiment ships FOUR measured physical scenes
(sandbox/andrew/run_trpo.py:53-110: cam_dist/vangle/vp/object/goal
constants per scene) plus the random-scene sampler its sim stand-in used
(run_trpo.py:130-137). real_full_recipe committed scene 3 (index 2) as the
headline; this study runs the RL-only leg in the OTHER three measured
scenes and three fresh random draws from the reference's own distribution,
against the already-trained real_full_recipe model + demos — the same
across-draw aggregation the *_variants studies give the sim tasks.

Protocol per variant matches the headline leg: nvp=2 (second azimuth
40 deg away, the fix real_nvp2_demo proved), reward scale 0.01
(run_trpo.py:64), batch 25,000 (500 paths x 50, run_trpo.py:21), 100
iterations.

Artifacts -> examples/results/real_variants/{m0,m1,m3,r20,r21,r22}/ +
summary.json.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_translation_training,
    run_visual_trpo,
)
from imitation_from_observation_tpu.exp.report import done_rows

BASE = os.path.join(os.path.dirname(__file__), "results", "real_full_recipe")
LOG = os.path.join(os.path.dirname(__file__), "results", "real_variants")
N_TRAIN = 1600
RL_ITERS = 100
BATCH = 25_000


def scene_ctx(vp: float, vangle: float, cam_dist: float,
              obj: float, goal: float) -> dict:
    """Reference scene constants -> EnvConfig overrides (nvp=2: second
    azimuth +40 deg, the real_full_recipe convention)."""
    return dict(
        viewpoint=(float(vp), float(vp) + 40.0),
        view_angle=float(-vangle),
        cam_dist=float(cam_dist),
        object_pos=(float(obj), 0.0),
        goal=(float(goal), 0.0),
        n_viewpoints=2,
    )


# The three measured scenes real_full_recipe did NOT run (run_trpo.py:53-110;
# index 2 is the committed headline scene).
MEASURED = {
    "m0": scene_ctx(306.61260922055357, -52.94840634682497,
                    2.343399506359302, -0.18427263878675026,
                    -0.2181554866957639),
    "m1": scene_ctx(316.1840606644219, -54.128970888491956,
                    2.413669421374702, -0.25756665879780527,
                    -0.24248563317988447),
    "m3": scene_ctx(262.82400533223927, -44.737606911893806,
                    2.4661629855908687, -0.01923199583962132,
                    0.02263716546440686),
}


def rand_scene(seed: int) -> dict:
    """The reference's random real-scene draw (run_trpo.py:130-137)."""
    rng = np.random.default_rng(seed)
    vp = rng.uniform(0.0, 360.0)
    vangle = rng.uniform(-70.0, -40.0)
    cam_dist = rng.uniform(1.5, 2.5)
    distobj = rng.uniform(0.4, 0.7)
    distmult = rng.uniform(1.7, 2.1)
    obj = -(distobj - 0.4)
    goal = -(distobj * distmult - 0.4 - 0.5)
    return scene_ctx(vp, vangle, cam_dist, obj, goal)


VARIANTS = dict(MEASURED)
for seed in (20, 21, 22):
    VARIANTS[f"r{seed}"] = rand_scene(seed)

# Model + held-out demos: checkpoint/vdata are gitignored caches — rebuild
# from the committed 2,000 demo mp4s only when absent (same train config as
# real_full_recipe so an existing checkpoints/100000 is picked up).
_ds = preset("real")
_ds = _ds.replace(
    log_dir=BASE,
    train=_ds.train.replace(
        n_iters=100_000, n_videos=2000, n_train=N_TRAIN,
        batch_size=100, steps_per_call=50, eval_every=5000,
        save_every=25000, log_every=5000, learning_rate=1e-4,
    ),
)
trainer = run_translation_training(
    _ds, os.path.join(BASE, "videos", "*.mp4"), resume=True
)
demo_data = trainer.valid_data
ck_root = os.path.join(BASE, "translation", "checkpoints")
ckpt_dir = os.path.join(ck_root, max(os.listdir(ck_root), key=int))
ckpt = [f[:-4] for f in os.listdir(ckpt_dir) if f.endswith(".npz")][0]

base_cfg = preset("real")
summary = {}
for name, ctx in VARIANTS.items():
    cfg = base_cfg.replace(
        name=f"real_{name}",
        log_dir=os.path.join(LOG, name),
        env=base_cfg.env.replace(horizon=50, frame_backend="tpu", **ctx),
        rl=base_cfg.rl.replace(
            batch_size=BATCH, max_path_length=50, n_envs=500, n_iters=RL_ITERS,
            init_std=10.0, snapshot_mode="none", seed=0,
        ),
        reward=base_cfg.reward.replace(
            mode="ours", scale=0.01, model_checkpoint=os.path.join(ckpt_dir, ckpt)
        ),
    )
    hist = done_rows(cfg.log_dir, RL_ITERS)  # resume past completed legs
    if hist is None:
        # progress.csv appends across runs: clear a crashed partial leg so
        # the rerun's curve isn't concatenated onto the partial one
        shutil.rmtree(cfg.log_dir, ignore_errors=True)
        os.makedirs(cfg.log_dir, exist_ok=True)
        with open(os.path.join(cfg.log_dir, "variant.json"), "w") as f:
            json.dump({"variant": name, "mode": "ours",
                       "scene": {k: str(v) for k, v in ctx.items()}}, f)
        _, hist = run_visual_trpo(cfg, demo_data=demo_data)
    rt = [h["ReturnTrue"] for h in hist]
    sr = [h["SuccessRate"] for h in hist]
    summary[name] = dict(
        best=max(rt), best_iter=int(np.argmax(rt)), last10=float(np.mean(rt[-10:])),
        first10=float(np.mean(rt[:10])), max_success=max(sr),
    )
    print(f"[{name}] first10 {np.mean(rt[:10]):.4f} best {max(rt):.4f} "
          f"last10 {np.mean(rt[-10:]):.4f} maxSuccess {max(sr):.2f}")

names = list(VARIANTS)
bests = [summary[n]["best"] for n in names]
succ = [summary[n]["max_success"] for n in names]
impr = [summary[n]["best"] - summary[n]["first10"] for n in names]
summary["aggregate"] = dict(
    best_mean=float(np.mean(bests)), best_std=float(np.std(bests)),
    success_mean=float(np.mean(succ)), success_std=float(np.std(succ)),
    improvement_mean=float(np.mean(impr)), improvement_std=float(np.std(impr)),
    measured_best_mean=float(np.mean([summary[n]["best"] for n in MEASURED])),
    random_best_mean=float(
        np.mean([summary[f"r{s}"]["best"] for s in (20, 21, 22)])
    ),
)
with open(os.path.join(LOG, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps(summary["aggregate"], indent=1))
