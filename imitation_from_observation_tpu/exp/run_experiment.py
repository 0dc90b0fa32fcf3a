"""Experiment runner CLI.

Replaces the reference's ``run_experiment_lite`` + entry script
(rllab/misc/instrument.py:338-520, scripts/run_experiment_lite.py): an
experiment is a *typed json spec* — launcher name + ExperimentConfig + kwargs
— not a base64 pickle of live objects. Modes: ``inline`` (this process) and
``local`` (subprocess per variant, sequential). The spec and the full config
are saved into the experiment dir (the reference's params.json/variant.json).

Usage:
    python -m imitation_from_observation_tpu.exp.run_experiment --spec spec.json
    python -m imitation_from_observation_tpu.exp.run_experiment \
        --launcher run_pipeline --task push --log-dir data/push --seed 1
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import Any

from imitation_from_observation_tpu.core.config import ExperimentConfig
from imitation_from_observation_tpu.core.log import get_logger

LAUNCHERS = {
    "run_pipeline": "imitation_from_observation_tpu.exp.launchers:run_pipeline",
    "run_translation_training": "imitation_from_observation_tpu.exp.launchers:run_translation_training",
    "run_visual_trpo": "imitation_from_observation_tpu.exp.launchers:run_visual_trpo",
    "train_expert": "imitation_from_observation_tpu.exp.train_expert:train_expert",
    "generate_demo_videos": "imitation_from_observation_tpu.exp.gen_videos:generate_demo_videos",
}


def _resolve(name: str):
    import importlib

    mod_name, fn_name = LAUNCHERS[name].split(":")
    return getattr(importlib.import_module(mod_name), fn_name)


def run_spec(spec: dict[str, Any]) -> Any:
    log_dir = spec.get("log_dir") or spec.get("kwargs", {}).get("log_dir", "data/exp")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "variant.json"), "w") as f:
        json.dump(spec, f, indent=2, default=str)
    log = get_logger(log_dir)
    log.log(f"running {spec['launcher']} in {log_dir}")
    fn = _resolve(spec["launcher"])
    return fn(**spec.get("kwargs", {}))


def run_local(spec: dict[str, Any]) -> int:
    """Run a spec in a fresh subprocess (the reference's mode='local')."""
    log_dir = spec.get("log_dir") or spec.get("kwargs", {}).get("log_dir", "data/exp")
    os.makedirs(log_dir, exist_ok=True)
    spec_path = os.path.join(log_dir, "spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f, default=str)
    return subprocess.call(
        [sys.executable, "-m", "imitation_from_observation_tpu.exp.run_experiment", "--spec", spec_path]
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--spec", help="path to a json spec")
    p.add_argument("--launcher", choices=sorted(LAUNCHERS))
    p.add_argument("--task")
    p.add_argument("--log-dir", default="data/exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-demos", type=int, default=40)
    p.add_argument("--rl-iters", type=int, default=10)
    p.add_argument("--translation-iters", type=int, default=2000)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument(
        "--resume-from",
        help="policy checkpoint to restore before training (scripts/resume_training.py capability)",
    )
    args = p.parse_args(argv)
    if args.spec:
        with open(args.spec) as f:
            spec = json.load(f)
    else:
        if not args.launcher:
            p.error("need --spec or --launcher")
        kwargs = dict(
            task=args.task,
            log_dir=args.log_dir,
            seed=args.seed,
            n_demos=args.n_demos,
            rl_iters=args.rl_iters,
            translation_iters=args.translation_iters,
            scale=args.scale,
        )
        if args.resume_from:
            kwargs["resume_from"] = args.resume_from
        spec = dict(launcher=args.launcher, log_dir=args.log_dir, kwargs=kwargs)
    run_spec(spec)


if __name__ == "__main__":
    main()
