"""Variant-sweep orchestration on real hardware: the reference's scale sweep.

The reference's central experiment knob was the pixel-loss scale, swept
{0.1, 1.0, 10.0} by the launcher's VariantGenerator-style loops
(run_trpo_push.py:108-111) and compared in viskit by grouping curves on the
variant key. This reproduces that workflow end to end with OUR stack: one
shared translation model, a VariantGenerator over scale, one visual-TRPO
run per variant (each spec + variant.json written to its own experiment
dir), and a viskit-lite group plot (mean±std per scale) — L6 orchestration
+ L7 comparison plotting at production shape. Artifacts land in
examples/results/reach_scale_sweep.
"""
import json
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.gen_videos import generate_demo_videos
from imitation_from_observation_tpu.exp.launchers import run_translation_training, run_visual_trpo
from imitation_from_observation_tpu.exp.train_expert import load_expert
from imitation_from_observation_tpu.exp.variants import VariantGenerator
from imitation_from_observation_tpu.exp.viskit_lite import plot

LOG = os.path.join(os.path.dirname(__file__), "results", "reach_scale_sweep")
EXPERT = os.path.join(os.path.dirname(__file__), "..", "data", "reference_experts", "expert_reach")

if not os.path.exists(EXPERT + ".npz"):
    from tools.extract_reference_experts import extract

    extract("/root/reference", os.path.dirname(EXPERT))

cfg = preset("reach")
cfg = cfg.replace(
    name="reach_scale_sweep",
    log_dir=LOG,
    env=cfg.env.replace(horizon=50),
    train=cfg.train.replace(batch_size=100, n_videos=40, n_train=32, n_iters=3000,
                            eval_every=500, save_every=3000, log_every=500),
    rl=cfg.rl.replace(batch_size=4000, max_path_length=50, n_envs=40, n_iters=10,
                      init_std=10.0, snapshot_mode="none"),
)

# stage 1+2 once: demos + shared translation model
video_dir = os.path.join(LOG, "videos")
if not os.path.exists(os.path.join(video_dir, "stats.json")):
    generate_demo_videos("reacher3dof", load_expert(EXPERT), video_dir, 40,
                         horizon=50, seed=0, env_overrides=dict(full_state=True))
trainer = run_translation_training(cfg, os.path.join(video_dir, "*.mp4"))

# stage 3: the sweep — one RL run per scale variant
vg = VariantGenerator().add("scale", [0.1, 1.0, 10.0])
for variant in vg.variants():
    scale = variant["scale"]
    vdir = os.path.join(LOG, f"scale_{scale}")
    vcfg = cfg.replace(log_dir=vdir, reward=cfg.reward.replace(mode="ours", scale=scale))
    os.makedirs(os.path.join(vdir, "rl"), exist_ok=True)
    with open(os.path.join(vdir, "rl", "variant.json"), "w") as f:
        json.dump(variant, f)
    policy, history = run_visual_trpo(vcfg, params=trainer.state.params,
                                      demo_data=trainer.valid_data)
    print(f"scale {scale}: ReturnTrue last {history[-1]['ReturnTrue']:.4f}")

# viskit-style grouped comparison (mean±std per scale)
plot(LOG, "ReturnTrue", os.path.join(LOG, "return_true_by_scale.png"), group_by="scale")
plot(LOG, "AverageReturn", os.path.join(LOG, "visual_reward_by_scale.png"), group_by="scale")
print("sweep done")
