"""Paper-facing results figure + table across the full-recipe runs.

Counterpart of the reference's ``notebooks/plots.ipynb`` (cells 3-28): per-task
ReturnTrue learning curves comparing the paper's method (visual reward from
translated demos) against the oracle-reward control and the expert-demo level,
plus the TPIL baseline on reach (the paper's central comparison). Reads the
committed ``examples/results/*_full_recipe`` progress CSVs and emits

  examples/results/paper_summary.png   — 4-panel small-multiples figure
  examples/results/RESULTS.md          — the summary table

Rerun after adding/refreshing a full-recipe run.
"""
import csv
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

RES = os.path.join(os.path.dirname(__file__), "results")

# dataviz reference palette, first 3 categorical slots (all-pairs safe);
# expert level is a neutral reference line, not a series.
C_OURS = "#2a78d6"
C_ORACLE = "#eb6834"
C_TPIL = "#1baf7a"
C_GAIL = "#8a63d2"
C_EXPERT = "#52514e"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e6e5e1"

TASKS = ["reach", "push", "sweep", "strike"]
for extra, run in (("throw", "throw_full_recipe"), ("real", "real_full_recipe")):
    if os.path.isfile(os.path.join(RES, run, "rl", "progress.csv")):
        TASKS.append(extra)

# per-task context-draw studies (the reference's nvar loop): run dir +
# subdir prefix; plotted as a mean±std band when >=3 draws exist
VARIANT_RUNS = {"reach": ("reach_variants", "v"), "push": ("push_variants", "v"),
                "sweep": ("sweep_variants", "v"), "strike": ("strike_goal_study", "s"),
                "throw": ("throw_variants", "v"), "real": ("real_variants", "")}


def read_col(path: str, col: str) -> np.ndarray:
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return np.array([float(r[col]) for r in rows])


def demo_level(task: str) -> float:
    with open(os.path.join(RES, f"{task}_full_recipe", "videos", "stats.json")) as f:
        s = json.load(f)
    return float(np.mean(s["episode_true_rewards"]))


def main() -> None:
    # throw's reward_true lives on its own scale (~-3.5..-0.7): the first
    # four panels share (-1.3, 0.05); throw gets its own axis
    fig, axes = plt.subplots(1, len(TASKS), figsize=(3.5 * len(TASKS), 3.4))
    fig.patch.set_facecolor(SURFACE)
    rows = []
    for ax, task in zip(axes, TASKS):
        base = os.path.join(RES, f"{task}_full_recipe")
        ours = read_col(os.path.join(base, "rl", "progress.csv"), "ReturnTrue")
        oracle = read_col(
            os.path.join(base, "oracle_rl", "rl", "progress.csv"), "ReturnTrue"
        )
        sr = read_col(os.path.join(base, "rl", "progress.csv"), "SuccessRate")
        try:
            oracle_sr = read_col(
                os.path.join(base, "oracle_rl", "rl", "progress.csv"), "SuccessRate"
            )
        except (OSError, KeyError):
            oracle_sr = np.zeros(1)
        expert = demo_level(task)

        ax.set_facecolor(SURFACE)
        ax.axhline(expert, color=C_EXPERT, lw=1.2, ls=(0, (4, 3)), zorder=1)
        ax.plot(oracle, color=C_ORACLE, lw=2, label="oracle-reward control", zorder=2)
        ax.plot(ours, color=C_OURS, lw=2, label="ours (visual reward)", zorder=3)
        tpil_csv = os.path.join(RES, "tpil_reference_scale", "progress.csv")
        if task == "reach" and os.path.isfile(tpil_csv):
            tpil = read_col(tpil_csv, "ReturnTrue")
            ax.plot(tpil, color=C_TPIL, lw=2, label="TPIL baseline", zorder=2)
        gail_csv = os.path.join(RES, "gail_reference_scale", "progress.csv")
        if task == "reach" and os.path.isfile(gail_csv):
            gail = read_col(gail_csv, "ReturnTrue")
            ax.plot(gail, color=C_GAIL, lw=2, label="GAIL baseline", zorder=2)
        # mean±std across fresh context draws (the reference's nvar
        # aggregation, plots.ipynb) wherever a variant study exists
        if task in VARIANT_RUNS:
            vdir, prefix = VARIANT_RUNS[task]
            vglob = sorted(
                d for d in os.listdir(os.path.join(RES, vdir))
                if d.startswith(prefix)
            ) if os.path.isdir(os.path.join(RES, vdir)) else []
            curves = []
            for v in vglob:
                p = os.path.join(RES, vdir, v, "rl", "progress.csv")
                if os.path.isfile(p):
                    curves.append(read_col(p, "ReturnTrue"))
            if curves:  # drop partial legs (crashed mid-run) from the band
                full = max(len(c) for c in curves)
                curves = [c for c in curves if len(c) == full]
            if len(curves) >= 3:
                n = min(len(c) for c in curves)
                arr = np.stack([c[:n] for c in curves])
                ax.fill_between(
                    np.arange(n), arr.mean(0) - arr.std(0), arr.mean(0) + arr.std(0),
                    color=C_OURS, alpha=0.18, lw=0, zorder=1,
                    label="ours, fresh context draws (±std)",
                )
                ax.plot(arr.mean(0), color=C_OURS, lw=1.2, ls=(0, (2, 2)), zorder=2)
        if task == "throw":
            p = os.path.join(RES, "throw_strong_expert", "rl", "progress.csv")
            if os.path.isfile(p):
                strong = read_col(p, "ReturnTrue")
                ax.plot(strong, color=C_TPIL, lw=1.8, ls=(0, (4, 2)), zorder=3,
                        label="ours, strong self-trained demos")
                sp = os.path.join(RES, "throw_strong_expert", "summary.json")
                if os.path.isfile(sp):
                    with open(sp) as f:
                        lvl = json.load(f)["demo_mean_return_true"]
                    ax.axhline(lvl, color=C_TPIL, lw=1.0, ls=(0, (1, 2)), zorder=1)
        aligned_csv = os.path.join(base, "rl_aligned_goal", "rl", "progress.csv")
        if task == "strike" and os.path.isfile(aligned_csv):
            # same visual reward, goal-ALIGNED context draw (seed 93) — the
            # "lucky draw" side of the reference's nvar protocol
            aligned = read_col(aligned_csv, "ReturnTrue")
            ax.plot(aligned, color=C_OURS, lw=1.6, ls=(0, (4, 2)),
                    label="ours, aligned goal draw", zorder=3)
        ax.set_title(task, color=TEXT, fontsize=12)
        ax.set_xlabel("TRPO iteration", color=TEXT2, fontsize=9)
        ax.tick_params(colors=TEXT2, labelsize=8)
        ax.grid(True, color=GRID, lw=0.6)
        for s in ax.spines.values():
            s.set_color(GRID)
        if task == "throw":
            ax.set_ylim(-4.0, 0.05)
        elif task == "real":
            ax.set_ylim(-1.6, 0.05)
        else:
            ax.set_ylim(-1.3, 0.05)
            if task != "reach":
                ax.tick_params(labelleft=False)
        rows.append(
            dict(
                task=task,
                expert=expert,
                oracle_best=float(oracle.max()),
                oracle_max_success=float(oracle_sr.max()),
                ours_best=float(ours.max()),
                ours_best_iter=int(ours.argmax()),
                ours_max_success=float(sr.max()),
            )
        )

    axes[0].set_ylabel("ReturnTrue (higher is better)", color=TEXT2, fontsize=9)
    axes[0].text(
        148, demo_level("reach") + 0.03, "expert demos", color=C_EXPERT,
        fontsize=8, ha="right",
    )
    handles, labels = [], []
    for ax in axes:  # dedupe across panels (TPIL on reach, aligned on strike)
        for h, l in zip(*ax.get_legend_handles_labels()):
            if l not in labels:
                handles.append(h)
                labels.append(l)
    fig.legend(
        handles, labels, loc="upper center", ncol=len(labels), frameon=False,
        fontsize=9, labelcolor=TEXT, bbox_to_anchor=(0.5, 1.06),
    )
    fig.suptitle(
        "Imitation-from-observation at the reference's full budget "
        "(one fixed RL context per experiment; batch 12,500)",
        color=TEXT, fontsize=11, y=1.16,
    )
    out = os.path.join(RES, "paper_summary.png")
    fig.savefig(out, dpi=150, bbox_inches="tight", facecolor=SURFACE)
    print("wrote", out)

    lines = [
        "# Full-recipe results (paper protocol)",
        "",
        "Generated by `examples/paper_plots.py` from the committed",
        "`*_full_recipe` runs — see each run's NOTES.md for the reading.",
        "Figure: `paper_summary.png`.",
        "",
        "| Task | expert demos | oracle control (best / max success) | ours, visual (best) | ours max SuccessRate |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['task']} | {r['expert']:.3f} | {r['oracle_best']:.3f} / "
            f"{r['oracle_max_success']:.2f} | "
            f"**{r['ours_best']:.3f}** @ itr {r['ours_best_iter']} | "
            f"{r['ours_max_success']:.2f} |"
        )
    tpil_sum = os.path.join(RES, "tpil_reference_scale", "summary.json")
    if os.path.isfile(tpil_sum):
        with open(tpil_sum) as f:
            tp = json.load(f)
        reach_best = next(r["ours_best"] for r in rows if r["task"] == "reach")
        lines += [
            "",
            "Baseline (paper's central comparison, reach): TPIL at the reference's",
            f"500x50 budget reaches best ReturnTrue {tp['best']:.3f} "
            f"(`tpil_reference_scale/`) vs ours {reach_best:.3f} — the paper's",
            "ordering (ours > TPIL) reproduces in-rebuild.",
            "",
        ]
        gail_sum = os.path.join(RES, "gail_reference_scale", "summary.json")
        if os.path.isfile(gail_sum):
            with open(gail_sum) as f:
                gl = json.load(f)
            lines += [
                "GAIL (three-flag TpilTrainer variant: no expert-fail group, no",
                f"domain-confusion loss) at the same budget: best {gl['best']:.3f}",
                f"@ itr {gl['best_iter']} (`gail_reference_scale/`).",
                "",
            ]
    var_rows = []
    for task, (vdir, _) in VARIANT_RUNS.items():
        vsum = os.path.join(RES, vdir, "summary.json")
        if not os.path.isfile(vsum):
            continue
        with open(vsum) as f:
            s = json.load(f)
        if task == "strike":
            # the goal study's draws span goal distance 0.10-0.95 on the same
            # trained model/demos — aggregate its per-draw rows the same way
            draws = s["rows"]
            bests = np.array([d["best"] for d in draws])
            succ = np.array([d["max_success"] for d in draws])
            var_rows.append(
                f"| strike (goal study) | {len(draws)} | {bests.mean():.3f} ± "
                f"{bests.std():.3f} | {succ.mean():.2f} ± {succ.std():.2f} |"
            )
            continue
        agg = s["aggregate"]
        n_draws = len([k for k in s if k != "aggregate"])
        var_rows.append(
            f"| {task} | {n_draws} | {agg['best_mean']:.3f} ± {agg['best_std']:.3f} | "
            f"{agg['success_mean']:.2f} ± {agg['success_std']:.2f} |"
        )
    if var_rows:
        # the oracle denominator VERDICT r4 asked for: "0.00" success only
        # means something next to what the oracle achieves on the same task
        by_task = {r["task"]: r for r in rows}
        var_rows = [
            vr + (
                f" {by_task[t]['oracle_best']:.3f} / "
                f"{by_task[t]['oracle_max_success']:.2f} |"
                if (t := vr.split("|")[1].strip().split(" ")[0]) in by_task
                else " — |"
            )
            for vr in var_rows
        ]
        lines += [
            "Robustness across context draws (the reference's nvar loop —",
            "each draw is a FRESH scene for the same trained model/demos).",
            "The oracle column is the same-task oracle control at the",
            "headline draw — the achievable ceiling for the success metric:",
            "",
            "| Task | draws | best ReturnTrue (mean ± std) | max SuccessRate | oracle best / success |",
            "|---|---|---|---|---|",
            *var_rows,
            "",
        ]
    lines += [
        "Strike's flat visual leg is an unlucky context draw: across 7 draws",
        "spanning goal distance 0.10-0.95 the same visual reward improves",
        "ReturnTrue in 6 of 7 (+0.16..+0.28), with absolute attainment",
        "degrading only for far-drawn goals (`strike_goal_study/NOTES.md`).",
        "",
        "Budget/scale controls: a push rerun at doubled reward scale and 250",
        "iterations tracks the single-view curve through 150 then creeps to",
        "-0.577/0.14 (`push_full_recipe/rl_x2scale/` — launched as nvp=2 but",
        "a scalar-azimuth config duplicated the camera, see its NOTES);",
        "sweep at 300 iterations plateaus at -0.78, isolating reward-signal",
        "quality rather than RL budget as its gap (`sweep_full_recipe/",
        "rl_300/`).",
        "",
    ]
    sd = os.path.join(RES, "sweep_diagnosis", "summary.json")
    if os.path.isfile(sd):
        with open(sd) as f:
            s_d = json.load(f)
        d = s_d.get("decomp", {})
        scale_bits = ", ".join(
            f"scale {s_d[k]['scale']}: best {s_d[k]['best']:.3f}"
            for k in ("scale_0.1", "scale_10")
            if k in s_d
        )
        lines += [
            "Sweep diagnosis (`sweep_diagnosis/NOTES.md`): oracle at the",
            "identical protocol reaches success 1.00, so the metric is",
            "achievable; per-iteration reward decomposition of the visual leg",
            f"(feat {d.get('feat_first10', float('nan')):.1f} -> "
            f"{d.get('feat_last10', float('nan')):.1f}, pixel "
            f"{d.get('pix_first10', float('nan')):.1f} -> "
            f"{d.get('pix_last10', float('nan')):.1f})"
            + (f"; {scale_bits}" if scale_bits else "") + ".",
            "",
        ]
    tse = os.path.join(RES, "throw_strong_expert", "summary.json")
    if os.path.isfile(tse):
        with open(tse) as f:
            ts = json.load(f)
        throw_fr_best = next(
            (f"{r['ours_best']:.3f}" for r in rows if r["task"] == "throw"), "-2.228"
        )
        lines += [
            "Throw with self-trained demos (same pinned context as the",
            "full recipe; the self-trained expert plateaus at the reference",
            f"expert's level, demos {ts['demo_mean_return_true']:.3f} vs",
            f"{ts['reference_expert_demo_level']:.3f}): visual best",
            f"**{ts['visual']['best']:.3f}** @ itr {ts['visual']['best_iter']}",
            f"with a rising curve, vs {throw_fr_best} (flat) on the",
            "reference expert's demos (`throw_strong_expert/NOTES.md`).",
            "",
        ]
    nvp2 = os.path.join(RES, "push_full_recipe", "rl_nvp2", "summary.json")
    if os.path.isfile(nvp2):
        with open(nvp2) as f:
            nv = json.load(f)
        lines += [
            "True two-azimuth push nvp=2 (distinct cameras,",
            f"`sample_rl_context(nvp=2)`): best {nv['best']:.3f} @ itr",
            f"{nv['best_iter']} (max success {nv['max_success']:.2f}) vs",
            f"single-view best {nv['single_vp_best']:.3f}",
            "(`push_full_recipe/rl_nvp2/`).",
            "",
        ]
    p4k = os.path.join(RES, "push_4k", "summary.json")
    if os.path.isfile(p4k):
        with open(p4k) as f:
            pk = json.load(f)
        lines += [
            "Push at the reference's FULL 4,000-video data budget",
            "(run_train_strike.py:37-39's number; only the data changed vs the",
            f"2,000-video headline): best {pk['visual']['best']:.3f} @ itr",
            f"{pk['visual']['best_iter']} (max success "
            f"{pk['visual']['max_success']:.2f})",
            f"vs 2k-video best {pk['push_full_recipe_best']:.3f} (`push_4k/`).",
            "",
        ]
    si = os.path.join(RES, "strike_inception_demo", "summary.json")
    if os.path.isfile(si):
        with open(si) as f:
            s4 = json.load(f)
        lines += [
            "Strike through Inception-v3 features (BASELINE config 4, the",
            "299x299 Mixed_7c -> ContextFeat feature-space pipeline) runs end",
            f"to end at its real shape: first {s4['first']:.3f} -> best "
            f"{s4['best']:.3f}",
            "over 8 TRPO iterations — with a RANDOM-INIT backbone (no",
            "pretrained slim checkpoint exists in-image), so it demonstrates",
            "the pipeline, not ImageNet-feature reward quality",
            "(`strike_inception_demo/NOTES.md`).",
            "",
        ]
    ss = os.path.join(RES, "strike_inception_selfsup", "summary.json")
    if os.path.isfile(ss):
        with open(ss) as f:
            s5 = json.load(f)
        extra = ""
        pm = os.path.join(RES, "strike_inception_selfsup", "pretrain_metrics.json")
        if os.path.isfile(pm):
            with open(pm) as f:
                m = json.load(f)
            extra = (f" (pretext valid acc {m.get('valid_acc', float('nan')):.2f}"
                     f" vs chance {m.get('chance_acc', float('nan')):.2f})")
        lines += [
            "The same config-4 pipeline with an IN-IMAGE self-supervised",
            "backbone — BN calibration + the reference's TimeSoftmax pretext",
            f"on the demo videos themselves{extra}: first {s5['first']:.3f} ->",
            f"best {s5['best']:.3f}, max success {s5.get('max_success', 0):.2f}",
            "(`strike_inception_selfsup/NOTES.md`). No external weights used.",
            "",
        ]
    rsum = os.path.join(RES, "real_full_recipe", "summary.json")
    if os.path.isfile(rsum):
        with open(rsum) as f:
            rs = json.load(f)
        lines += [
            "Real-pusher config at the reference's own budget (batch 25,000 x",
            f"200, nvp=2, measured scene): oracle best {rs['oracle']['best']:.3f},",
            f"visual best {rs['visual']['best']:.3f} from demos at "
            f"{rs['demo_mean_return_true']:.3f} (`real_full_recipe/`).",
            "",
        ]
    with open(os.path.join(RES, "RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote", os.path.join(RES, "RESULTS.md"))


if __name__ == "__main__":
    main()
