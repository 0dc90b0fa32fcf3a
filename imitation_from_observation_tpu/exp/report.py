"""Run-reporting helpers shared by the example/launch scripts.

The reference's protocol reports across per-iteration snapshots
(rllab/misc/logger.py:216-232 + notebooks/plots.ipynb): the numbers that
matter are the best iterate's ReturnTrue and the success rate there. Every
full-recipe / variant-study script summarizes its legs with
:func:`summarize` and resumes past completed legs with :func:`done_rows`
(one progress.csv re-read instead of a rerun after a transient relay
failure).
"""

from __future__ import annotations

import csv
import os


def summarize(history: list[dict], label: str) -> dict:
    """Best-iterate + first/last-10 summary of an RL history, printed and
    returned (keys match the committed examples/results summary.json files)."""
    rt = [float(h["ReturnTrue"]) for h in history]
    sr = [float(h.get("SuccessRate", 0.0)) for h in history]
    best_i = int(max(range(len(rt)), key=lambda i: rt[i]))
    out = dict(
        label=label,
        first10_mean=sum(rt[:10]) / min(10, len(rt)),
        last10_mean=sum(rt[-10:]) / min(10, len(rt)),
        best=rt[best_i],
        best_iter=best_i,
        best_success=sr[best_i],
        max_success=max(sr),
    )
    print(
        f"[{label}] ReturnTrue first10 {out['first10_mean']:.4f} -> "
        f"last10 {out['last10_mean']:.4f}, best {out['best']:.4f} @ itr {best_i} "
        f"(SuccessRate there {out['best_success']:.2f}, max {out['max_success']:.2f})"
    )
    return out


def done_rows(log_dir: str, n_iters: int) -> list[dict] | None:
    """History rows of an already-completed leg, or None if ``log_dir``'s
    ``rl/progress.csv`` is missing or has fewer than ``n_iters`` rows."""
    p = os.path.join(log_dir, "rl", "progress.csv")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        rows = list(csv.DictReader(f))
    if len(rows) < n_iters:
        return None
    optional = ("RewardFeatTerm", "RewardPixTerm")
    return [
        dict(
            {"ReturnTrue": float(r["ReturnTrue"]), "SuccessRate": float(r["SuccessRate"])},
            **{k: float(r[k]) for k in optional if r.get(k) not in (None, "")},
        )
        for r in rows
    ]
