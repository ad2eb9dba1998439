"""Training-run analysis: parse run dirs, plot per-epoch metrics, report.

Capability parity with reference `tools/runs_analysis.py` (798 LoC): scans
`runNNN`/`run_NNN` directories, parses `.hydra/overrides.yaml`,
`evaluation.txt` (`Validation: N  Avg MRSE/PSNR/1-SSIM`) and
`train_loss.txt` (`Epoch: N  G loss / D Loss`), optionally IQR-filters
outlier runs, and emits per-epoch MRSE/PSNR/SSIM/G-loss/D-loss plots
(seaborn), a CSV of all datapoints, and a text summary with %-difference
tables against a `baseline` experiment.

Usage:
    python tools/runs_analysis.py ROOT_FOLDER [--discard-outliers]
        [--output-dir DIR] [--name-map overrides_names.yaml]
        [--filters filters.yaml] [--tail-epochs N] [--best-performer]

`--name-map` maps sorted-override strings (joined with '||') to human
experiment names, replacing the reference's hardcoded
`overrides_to_names_map` (`runs_analysis.py:552-565`); `--filters` maps
report-section names to ordered experiment lists (first = baseline),
replacing the hardcoded `plot_filters` (`:567-587`). Without `--filters`
a single section compares every experiment against `baseline` (or the
first experiment seen). `metrics_report.txt` reproduces the reference's
`generate_metrics_summary` artifact (`:366-549`): per-metric tail-epoch
averages with diff / % diff / trend-arrow columns and an optional
best-performer-per-epoch frequency table; `summary_plot.png` is the
all-metrics grid (`:300-364`).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import yaml  # noqa: E402

try:
    import seaborn as sns

    sns.set_theme(style="whitegrid")
except Exception:  # pragma: no cover
    sns = None

EVAL_RE = re.compile(
    r"Validation:\s*(\d+)\s*\tAvg MRSE:\s*([\d.eE+-]+)\s*"
    r"\tAvg PSNR:\s*([\d.eE+-]+)\s*\tAvg 1-SSIM:\s*([\d.eE+-]+)",
)
LOSS_RE = re.compile(
    r"Epoch:\s*(\d+)\s*\tG loss:\s*([\d.eE+-]+)\s*\tD Loss:\s*([\d.eE+-]+)",
)

METRICS = ["mrse", "psnr", "ssim", "g_loss", "d_loss"]


def find_run_dirs(root: str) -> list[Path]:
    out = []
    for dirpath, dirnames, _ in os.walk(root):
        for d in dirnames:
            if re.fullmatch(r"run_?\d+", d):
                out.append(Path(dirpath) / d)
    return sorted(out)


def parse_run(run_dir: Path) -> list[dict]:
    """Rows of {run, experiment?, epoch, metric values} for one run dir."""
    rows: dict[int, dict] = defaultdict(dict)
    eval_file = run_dir / "evaluation.txt"
    if eval_file.exists():
        for m in EVAL_RE.finditer(eval_file.read_text()):
            e = int(m.group(1))
            rows[e].update(
                mrse=float(m.group(2)),
                psnr=float(m.group(3)),
                ssim=1.0 - float(m.group(4)),
            )
    loss_file = run_dir / "train_loss.txt"
    if loss_file.exists():
        for m in LOSS_RE.finditer(loss_file.read_text()):
            e = int(m.group(1))
            rows[e].update(g_loss=float(m.group(2)), d_loss=float(m.group(3)))
    return [
        {"run": str(run_dir), "epoch": e, **vals} for e, vals in sorted(rows.items())
    ]


def parse_overrides(run_dir: Path) -> str:
    f = run_dir / ".hydra" / "overrides.yaml"
    if not f.exists():
        return ""
    try:
        ovs = yaml.safe_load(f.read_text()) or []
    except Exception:
        return ""
    return "||".join(sorted(str(o) for o in ovs))


def experiment_name(run_dir: Path, name_map: dict[str, str]) -> str:
    key = parse_overrides(run_dir)
    if key in name_map:
        return name_map[key]
    return key if key else run_dir.parent.name


def iqr_filter(df: pd.DataFrame, metric: str = "psnr") -> pd.DataFrame:
    """Drop runs whose final evaluated metric is an IQR outlier within its
    experiment (reference behavior: outlier runs removed entirely).

    "Final" means each run's last epoch WITH the metric: evaluation rows
    only exist every save_interval epochs, so the max-epoch row is often
    a loss-only line whose NaN metric would silently disable (or worse,
    misapply) the filter."""
    keep_runs = []
    scored = df.dropna(subset=[metric])
    unscored = df.loc[~df["run"].isin(scored["run"])]
    keep_runs.extend(unscored["run"].unique())  # no eval rows: keep
    final = scored.loc[scored.groupby("run")["epoch"].idxmax()]
    for _, grp in final.groupby("experiment"):
        vals = grp[metric].dropna()
        if len(vals) < 4:
            keep_runs.extend(grp["run"])
            continue
        q1, q3 = np.percentile(vals, [25, 75])
        iqr = q3 - q1
        lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
        keep_runs.extend(grp.loc[grp[metric].between(lo, hi), "run"])
    return df[df["run"].isin(keep_runs)]


def plot_metric(df: pd.DataFrame, metric: str, out_dir: Path) -> None:
    if metric not in df or df[metric].dropna().empty:
        return
    fig, ax = plt.subplots(figsize=(10, 6))
    if sns is not None:
        sns.lineplot(
            data=df, x="epoch", y=metric, hue="experiment",
            errorbar=("sd" if df.groupby(["experiment", "epoch"]).size().max() > 1 else None),
            ax=ax,
        )
    else:  # pragma: no cover
        for name, grp in df.groupby("experiment"):
            mean = grp.groupby("epoch")[metric].mean()
            ax.plot(mean.index, mean.values, label=name)
        ax.legend()
    ax.set_title(f"{metric.upper()} per epoch")
    fig.savefig(out_dir / f"{metric}_per_epoch.png", dpi=120, bbox_inches="tight")
    plt.close(fig)


def create_summary_plot(df: pd.DataFrame, out_dir: Path) -> None:
    """All-metrics grid figure (reference `runs_analysis.py:300-364`)."""
    present = [m for m in METRICS if m in df and not df[m].dropna().empty]
    if not present:
        return
    fig, axes = plt.subplots(
        1, len(present), figsize=(6 * len(present), 5), squeeze=False,
    )
    for ax, metric in zip(axes[0], present, strict=True):
        if sns is not None:
            sns.lineplot(
                data=df, x="epoch", y=metric, hue="experiment",
                errorbar=None, ax=ax, legend=(metric == present[-1]),
            )
        else:  # pragma: no cover
            for name, grp in df.groupby("experiment"):
                mean = grp.groupby("epoch")[metric].mean()
                ax.plot(mean.index, mean.values, label=name)
            if metric == present[-1]:
                ax.legend()
        ax.set_title(metric.upper())
    fig.suptitle("Metrics summary")
    fig.savefig(out_dir / "summary_plot.png", dpi=120, bbox_inches="tight")
    plt.close(fig)


# report metrics: MRSE lower-is-better, PSNR/SSIM higher-is-better
# (reference `generate_metrics_summary`, runs_analysis.py:366-549)
_REPORT_METRICS = [("mrse", "MRSE"), ("psnr", "PSNR"), ("ssim", "SSIM")]
_UP, _DOWN, _EQ = "↑", "↓", "↔"


def write_report(
    df: pd.DataFrame,
    filters: dict[str, list[str]],
    out_file: Path,
    tail_epochs: int = 5,
    discard_outliers: bool = False,
    best_performer: bool = False,
) -> None:
    """Reference-format metrics summary report: for each filter section,
    each metric's average over the last `tail_epochs` evaluated epochs per
    experiment, compared against the section's first experiment."""
    lines = [
        "# Metrics Summary Report",
        "",
        "## Config",
        "=" * 80,
        "",
        f"tail_epochs: {tail_epochs}",
        f"discard_outliers: {discard_outliers}",
        f"best_performer: {best_performer}",
        "",
    ]
    for section, experiments in filters.items():
        lines += [f"\n## Filter: {section}", "=" * 80, ""]
        part = df[df["experiment"].isin(experiments)]
        for metric, full_name in _REPORT_METRICS:
            if metric not in part or part[metric].dropna().empty:
                continue
            lines += [f"\n### {full_name}", "-" * 80, ""]
            scored = part.dropna(subset=[metric])
            epochs = sorted(scored["epoch"].unique())
            last = epochs[-tail_epochs:]
            tail = scored[scored["epoch"].isin(last)]
            avg = {
                exp: grp[metric].mean()
                for exp, grp in tail.groupby("experiment")
            }
            baseline = experiments[0]
            lines.append(
                f"{'Configuration':<30} | {'Avg Value':<10} | "
                f"{'Diff':<10} | {'% Diff':<10} | {'% Trend':<5}",
            )
            lines.append("-" * 80)
            base_val = avg.get(baseline)
            for exp in experiments:
                if exp not in avg:
                    lines.append(
                        f"{exp:<30} | {'No data':<10} | {'N/A':<10} | "
                        f"{'N/A':<10} | {'':<5}",
                    )
                    continue
                val = avg[exp]
                if base_val is None:
                    # baseline has no tail-epoch rows: still show the
                    # variant's own average, just without a comparison
                    val_s = f"{val:.6f}" if metric == "mrse" else f"{val:.3f}"
                    lines.append(
                        f"{exp:<30} | {val_s:<10} | {'N/A':<10} | "
                        f"{'N/A':<10} | {'':<5}",
                    )
                    continue
                diff = val - base_val
                if metric == "mrse":  # lower is better
                    pct = (base_val - val) / base_val * 100 if base_val else 0.0
                    arrow = _DOWN if diff < 0 else (_EQ if diff == 0 else _UP)
                    val_s, diff_s = f"{val:.6f}", f"{diff:.6f}"
                else:
                    pct = (val - base_val) / base_val * 100 if base_val else 0.0
                    arrow = _UP if diff > 0 else (_EQ if diff == 0 else _DOWN)
                    val_s, diff_s = f"{val:.3f}", f"{diff:.3f}"
                pct_s = "baseline" if exp == baseline else f"{pct:.2f}"
                lines.append(
                    f"{exp:<30} | {val_s:<10} | {diff_s:<10} | "
                    f"{pct_s:<10} | {arrow:<5}",
                )
            if best_performer and not tail.empty:
                lines += ["", "Best performing configurations:"]
                counts: dict[str, int] = defaultdict(int)
                for epoch in last:
                    ed = (
                        tail[tail["epoch"] == epoch]
                        .groupby("experiment")[metric]
                        .mean()
                    )
                    if ed.empty:
                        continue
                    best = ed.idxmin() if metric == "mrse" else ed.idxmax()
                    counts[best] += 1
                    prec = ".6f" if metric == "mrse" else ".3f"
                    lines.append(
                        f"Epoch {epoch}: {best} "
                        f"({full_name}: {ed[best]:{prec}})",
                    )
                lines += ["", "Configuration frequency as best performer:"]
                for exp, count in sorted(counts.items(), key=lambda x: -x[1]):
                    lines.append(f"{exp}: {count}/{len(last)} epochs")
                lines.append("")
        lines += ["", ""]
    out_file.write_text("\n".join(lines) + "\n")


def write_summary(df: pd.DataFrame, out_dir: Path) -> None:
    lines = ["# Runs analysis summary", ""]
    final = df.loc[df.groupby("run")["epoch"].idxmax()]
    agg = final.groupby("experiment")[
        [m for m in METRICS if m in final]
    ].mean()
    lines.append(agg.to_string(float_format=lambda v: f"{v:.6f}"))
    if "baseline" in agg.index:
        lines += ["", "## % difference vs baseline (final epoch means)", ""]
        base = agg.loc["baseline"]
        for exp, row in agg.iterrows():
            if exp == "baseline":
                continue
            diffs = []
            for m in agg.columns:
                if base[m]:
                    diffs.append(f"{m}: {100 * (row[m] - base[m]) / abs(base[m]):+.2f}%")
            lines.append(f"{exp}: " + ", ".join(diffs))
    # best performer frequency per epoch (reference :540-549)
    if "psnr" in df:
        lines += ["", "## Best-PSNR experiment per epoch", ""]
        best = (
            df.dropna(subset=["psnr"])
            .groupby(["epoch", "experiment"])["psnr"]
            .mean()
            .reset_index()
        )
        counts: dict[str, int] = defaultdict(int)
        for _, grp in best.groupby("epoch"):
            counts[grp.loc[grp["psnr"].idxmax(), "experiment"]] += 1
        for exp, count in sorted(counts.items(), key=lambda x: -x[1]):
            lines.append(f"{exp}: best in {count} epochs")
    (out_dir / "summary.txt").write_text("\n".join(lines) + "\n")


def main(
    root_folder: str,
    discard_outliers: bool,
    output_dir: str | None,
    name_map_file: str | None,
    filters_file: str | None = None,
    tail_epochs: int = 5,
    best_performer: bool = False,
) -> None:
    name_map: dict[str, str] = {}
    if name_map_file:
        name_map = yaml.safe_load(Path(name_map_file).read_text()) or {}

    run_dirs = find_run_dirs(root_folder)
    if not run_dirs:
        print(f"No run directories found under {root_folder}")
        sys.exit(1)

    rows = []
    for rd in run_dirs:
        exp = experiment_name(rd, name_map)
        for row in parse_run(rd):
            row["experiment"] = exp
            rows.append(row)
    if not rows:
        print("No parsable evaluation/train_loss files found")
        sys.exit(1)

    df = pd.DataFrame(rows)
    out_dir = Path(output_dir or Path(root_folder) / "analysis")
    out_dir.mkdir(parents=True, exist_ok=True)
    if discard_outliers:
        before = df["run"].nunique()
        df = iqr_filter(df)
        print(f"IQR filter: kept {df['run'].nunique()}/{before} runs")

    df.to_csv(out_dir / "runs_data.csv", index=False)
    for metric in METRICS:
        plot_metric(df, metric, out_dir)
    create_summary_plot(df, out_dir)
    write_summary(df, out_dir)

    if filters_file:
        filters = yaml.safe_load(Path(filters_file).read_text()) or {}
    else:
        exps = list(df["experiment"].unique())
        if "baseline" in exps:  # baseline leads its comparison section
            exps.insert(0, exps.pop(exps.index("baseline")))
        filters = {"all": exps}
    write_report(
        df,
        filters,
        out_dir / "metrics_report.txt",
        tail_epochs=tail_epochs,
        discard_outliers=discard_outliers,
        best_performer=best_performer,
    )
    print(f"Wrote analysis to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Analyze training runs: plots, CSV, summary report",
    )
    parser.add_argument("root_folder", help="Root folder to search for run dirs")
    parser.add_argument("--discard-outliers", action="store_true")
    parser.add_argument("--output-dir", default=None)
    parser.add_argument("--name-map", default=None, help="YAML: overrides-key -> name")
    parser.add_argument(
        "--filters", default=None,
        help="YAML: report-section -> ordered experiment list (first = baseline)",
    )
    parser.add_argument("--tail-epochs", type=int, default=5)
    parser.add_argument("--best-performer", action="store_true")
    args = parser.parse_args()
    main(
        args.root_folder,
        args.discard_outliers,
        args.output_dir,
        args.name_map,
        args.filters,
        args.tail_epochs,
        args.best_performer,
    )
