"""Ablation-study trainer CLI.

Capability match for ``ablations_code/ablations.py:485-563``: a standalone
trainer over a prebuilt ``vdata`` npy with per-task model choice and the loss
ablations None / L2 / L2L3 / L1 (:175-182). The reference's per-task classes
(ContextAEReach/Push at 48x48, ContextAEPushReal/Sweep at 36x64) map onto the
model zoo: reach/push -> context_skip, pushreal/sweep -> context_small.

Usage:
    python -m imitation_from_observation_tpu.exp.ablations push L2 vdata.npy
"""

from __future__ import annotations

import argparse

import numpy as np

from imitation_from_observation_tpu.core.config import TrainConfig, TranslationModelConfig
from imitation_from_observation_tpu.train import TranslationTrainer

TASK_MODELS = {
    "reach": ("context_skip", (48, 48)),
    "push": ("context_skip", (48, 48)),
    "pushreal": ("context_small", (36, 64)),
    "sweep": ("context_small", (36, 64)),
}

ABLATIONS = ("None", "L2", "L2L3", "L1")


def run_ablation(
    experiment_type: str,
    ablation_type: str,
    vdata: np.ndarray,
    log_dir: str = "ablation",
    n_iters: int = 30_000,
    batch_size: int = 100,
    model_overrides: dict | None = None,
    train_overrides: dict | None = None,
) -> TranslationTrainer:
    if experiment_type not in TASK_MODELS:
        raise ValueError(f"unknown task {experiment_type!r}; have {sorted(TASK_MODELS)}")
    if ablation_type not in ABLATIONS:
        raise ValueError(f"unknown ablation {ablation_type!r}; have {ABLATIONS}")
    model_name, idim = TASK_MODELS[experiment_type]
    model_kw = dict(
        model=model_name,
        image_size=idim,
        loss_ablation="none" if ablation_type == "None" else ablation_type,
    )
    model_kw.update(model_overrides or {})
    model_cfg = TranslationModelConfig(**model_kw)
    train_cfg = TrainConfig(
        batch_size=batch_size,
        n_iters=n_iters,
        n_train=int(0.8 * vdata.shape[1]),  # ablations.py:536
        save_every=min(5000, max(40, n_iters)),
        **(train_overrides or {}),
    )
    trainer = TranslationTrainer(model_cfg, train_cfg, vdata, log_dir=log_dir)
    trainer.train()
    return trainer


def main(argv=None):
    p = argparse.ArgumentParser(description="Run ablations on models")
    p.add_argument("experiment_type", choices=sorted(TASK_MODELS))
    p.add_argument("ablation_type", choices=ABLATIONS)
    p.add_argument("data_location")
    p.add_argument("--log-dir", default="ablation")
    p.add_argument("--n-iters", type=int, default=30_000)
    p.add_argument("--batch-size", type=int, default=100)
    a = p.parse_args(argv)
    run_ablation(
        a.experiment_type,
        a.ablation_type,
        np.load(a.data_location),
        a.log_dir,
        a.n_iters,
        batch_size=a.batch_size,
    )


if __name__ == "__main__":
    main()
