"""Full-recipe runner: any sim task at the reference's data/model/RL budget.

Usage: ``python examples/full_recipe.py {push|strike|sweep|throw}`` (reach
has its own script, reach_full_recipe.py — same stages).

Per task this runs the reference's complete protocol on one chip:

  stage 0  oracle-mode control at the identical RL budget, in the same
           fixed context (separates reward-signal from RL-stack quality)
  stage 1  demo videos recorded batched through the on-device raycast
           renderer, contexts randomized per episode (gen_videos.py role)
  stage 2  context-translation training (run_train_*.py budgets)
  stage 3  visual-reward TRPO in ONE fixed context drawn like the
           reference's rand_*() (run_trpo_*.py), batch 12,500, snapshot-all
           + best-iterate + SuccessRate reporting

Budgets match sandbox/andrew/run_train_strike.py:37-39 (4,000 videos/100k
iters — scaled to 2,000 demos, which the reach run showed saturates this
task family) and run_trpo_*.py batch 50*250, n_itr 100-200.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imitation_from_observation_tpu.core.config import preset
from imitation_from_observation_tpu.exp.launchers import (
    run_pipeline,
    run_visual_trpo,
    sample_rl_context,
)
from imitation_from_observation_tpu.exp.report import summarize

TASKS = {
    "push": dict(
        preset="push", env="pusher3dof", expert="expert_push", scale=1.0,
        n_demos=2000, t_iters=100_000, rl_iters=150,
    ),
    "strike": dict(
        preset="strike", env="striker", expert="expert_striker", scale=0.1,
        n_demos=2000, t_iters=100_000, rl_iters=150,
    ),
    "sweep": dict(
        preset="sweep", env="cleaner", expert="expert_sweep", scale=1.0,
        n_demos=1000, t_iters=60_000, rl_iters=100,
    ),
    "throw": dict(
        preset="throw", env="thrower", expert="expert_thrower", scale=0.1,
        n_demos=2000, t_iters=100_000, rl_iters=150,
    ),
}


def main(task: str) -> None:
    t = TASKS[task]
    log = os.path.join(os.path.dirname(__file__), "results", f"{task}_full_recipe")
    expert = os.path.join(
        os.path.dirname(__file__), "..", "data", "reference_experts", t["expert"]
    )
    if not os.path.exists(expert + ".npz"):
        from tools.extract_reference_experts import extract

        extract("/root/reference", os.path.dirname(expert))

    rl_context = sample_rl_context(task, seed=1)
    cfg = preset(t["preset"])
    cfg = cfg.replace(
        name=f"{task}_full_recipe",
        log_dir=log,
        env=cfg.env.replace(horizon=50, frame_backend="tpu"),
        train=cfg.train.replace(
            batch_size=100, steps_per_call=50, eval_every=5000,
            save_every=max(25000, t["t_iters"] // 4), log_every=5000,
            learning_rate=1e-4,
        ),
        rl=cfg.rl.replace(
            batch_size=12500, max_path_length=50, n_envs=250,
            n_iters=t["rl_iters"], init_std=10.0, snapshot_mode="all", seed=0,
        ),
        reward=cfg.reward.replace(mode="ours", scale=t["scale"]),
    )

    results = {"context": {k: str(v) for k, v in rl_context.items()}}

    oracle_cfg = cfg.replace(
        log_dir=os.path.join(log, "oracle_rl"),
        env=cfg.env.replace(**rl_context),
        reward=cfg.reward.replace(mode="oracle"),
    )
    _, oracle_hist = run_visual_trpo(oracle_cfg)
    results["oracle"] = summarize(oracle_hist, f"{task} oracle control")

    out = run_pipeline(
        t["env"], log,
        n_demos=t["n_demos"],
        translation_iters=t["t_iters"],
        rl_iters=t["rl_iters"],
        scale=t["scale"],
        seed=0,
        cfg=cfg,
        expert_npz=expert,
        rl_context=rl_context,
    )
    results["visual"] = summarize(out["history"], f"{task} visual (ours)")

    with open(os.path.join(log, "summary.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1])
