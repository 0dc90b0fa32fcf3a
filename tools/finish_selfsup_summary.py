"""Contingency finisher for the at-scale selfsup config-4 run.

If `examples/strike_inception_selfsup.py` is cut down mid-RL (relay outage /
round-end deadline), the pipeline's own summary.json/NOTES.md never get
written even though the demo recordings, pretrained backbone, 100k-step
translation, and a partial RL curve all exist. This script assembles the
same artifact contract from whatever landed on disk, clearly labeling how
many RL iterations completed.

Reads:  examples/results/strike_inception_selfsup/{rl/progress.csv,
        pretrain_metrics.json, translation/checkpoints/*}
Writes: examples/results/strike_inception_selfsup/{summary.json,NOTES.md}
        (no-op when run_strike_inception already wrote a summary with more
        iterations than the csv currently holds — never clobbers a complete
        run's artifact with a partial view).

Usage: python tools/finish_selfsup_summary.py
"""
import csv
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "examples", "results", "strike_inception_selfsup")


def main() -> None:
    csv_path = os.path.join(LOG, "rl", "progress.csv")
    rows = list(csv.DictReader(open(csv_path)))
    assert rows, "no RL iterations on disk — nothing to summarize"
    rt = [float(r["ReturnTrue"]) for r in rows]
    sr = [float(r.get("SuccessRate", 0.0)) for r in rows]
    sum_path = os.path.join(LOG, "summary.json")
    if os.path.exists(sum_path):
        with open(sum_path) as f:
            prev = json.load(f)
        if prev.get("rl_iters_completed", prev.get("rl_shape", {}).get("n_iters", 0)) >= len(rows):
            print("complete summary already present; leaving it alone")
            return
    pm = {}
    pm_path = os.path.join(LOG, "pretrain_metrics.json")
    if os.path.exists(pm_path):
        with open(pm_path) as f:
            pm = json.load(f)
    ck = os.path.join(LOG, "translation", "checkpoints")
    top_ck = max((int(d) for d in os.listdir(ck) if d.isdigit()), default=0)
    best = max(rt)
    summary = dict(
        backbone="selfsup_time_n500",
        rl_iters_completed=len(rows),
        rl_shape=dict(batch=12_500, n_envs=250, note="cut short at round end"),
        translation_top_checkpoint=top_ck,
        pretext_valid_acc=pm.get("valid_acc"),
        pretext_valid_ce=pm.get("valid_ce"),
        first=rt[0],
        last=rt[-1],
        best=best,
        best_iter=int(rt.index(best)),
        max_success=max(sr) if sr else 0.0,
    )
    with open(sum_path, "w") as f:
        json.dump(summary, f, indent=1)
    with open(os.path.join(LOG, "NOTES.md"), "w") as f:
        f.write(f"""# strike-inception at scale, self-supervised backbone (config 4)

500 self-recorded 299x299 demos (reference: 2,500), backbone pretrained
IN-IMAGE (BN calibration + TimeSoftmax pretext with round-5 generalization
controls — pretrain_metrics.json), ContextFeat translation
({top_ck:,} steps, batch 25, Mixed_7c feature space), TRPO with the
`oursinception` device-resident reward at batch 12,500.

**RL leg cut short by a relay outage at round end: {len(rows)} iterations
completed** (target 100+). Curve: first {rt[0]:.3f} -> best {best:.3f}
@ itr {int(rt.index(best))} (max success {max(sr) if sr else 0:.2f}).
Full per-iteration log: `rl/progress.csv`.

Reference: run_train_strike_inception.py:39-43, run_trpo_inception.py:70-173.
""")
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
