"""viskit-lite: aggregate and plot experiment progress.csv trees.

Capability match for the reference's Flask viskit
(rllab/viskit/frontend.py): walk experiment directories for
``progress.csv`` + ``variant.json``, group curves by a variant key, and plot
mean±std across seeds for any logged column (the paper's "Mean True Reward
vs Iteration" plots, notebooks/plots.ipynb). CLI + importable; emits png
instead of serving a dashboard.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from collections import defaultdict

import numpy as np


def load_experiments(root: str) -> list[dict]:
    """Find all progress.csv under root; attach their variant.json if any."""
    exps = []
    for dirpath, _, files in os.walk(root):
        if "progress.csv" not in files:
            continue
        with open(os.path.join(dirpath, "progress.csv")) as f:
            rows = list(csv.DictReader(f))
        if not rows:
            continue
        columns: dict[str, np.ndarray] = {}
        for key in rows[0]:
            vals = []
            for r in rows:
                try:
                    vals.append(float(r[key]))
                except (TypeError, ValueError):
                    vals.append(np.nan)
            columns[key] = np.asarray(vals)
        variant = {}
        vpath = os.path.join(dirpath, "variant.json")
        if os.path.exists(vpath):
            with open(vpath) as f:
                variant = json.load(f)
        exps.append(dict(dir=dirpath, progress=columns, variant=variant))
    return exps


def group_curves(
    exps: list[dict], y_key: str, group_by: str | None = None, x_key: str = "Iteration"
):
    """-> {group_label: (x, mean, std)} across experiments in the group."""
    groups: dict[str, list] = defaultdict(list)
    for e in exps:
        if y_key not in e["progress"]:
            continue
        label = str(e["variant"].get(group_by, "all")) if group_by else "all"
        groups[label].append(e)
    out = {}
    for label, group in groups.items():
        n = min(len(e["progress"][y_key]) for e in group)
        ys = np.stack([e["progress"][y_key][:n] for e in group])
        x = (
            group[0]["progress"][x_key][:n]
            if x_key in group[0]["progress"]
            else np.arange(n)
        )
        out[label] = (x, ys.mean(axis=0), ys.std(axis=0))
    return out


def plot(root: str, y_key: str, out_path: str, group_by: str | None = None, x_key: str = "Iteration"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = group_curves(load_experiments(root), y_key, group_by, x_key)
    if not curves:
        raise ValueError(f"no experiments with column {y_key!r} under {root}")
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, (x, mean, std) in sorted(curves.items()):
        ax.plot(x, mean, label=label)
        ax.fill_between(x, mean - std, mean + std, alpha=0.25)
    ax.set_xlabel(x_key)
    ax.set_ylabel(y_key)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--y", default="AverageReturn")
    p.add_argument("--x", default="Iteration")
    p.add_argument("--group-by")
    p.add_argument("--out", default="plot.png")
    a = p.parse_args(argv)
    print(plot(a.root, a.y, a.out, a.group_by, a.x))


if __name__ == "__main__":
    main()
