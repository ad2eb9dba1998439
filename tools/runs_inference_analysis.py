"""Inference-results analysis: baseline vs variants over *_evaluation.txt.

Capability parity with reference `tools/runs_inference_analysis.py`
(1282 LoC): globs `**/*_evaluation.txt`, regex-parses RMSE / PSNR / 1-SSIM
(`:34-36`), groups by dataset (filename prefix), marks training datasets
(fftle0/1, taccturb0/1) with `*` and held-out ones with `†`
(`:1153-1164`), and emits the reference's artifact set:

- per-dataset metric comparison figures with the reference's clamped,
  metric-aware axes (RMSE in ×10⁻⁴ with a ±3e-4 margin, PSNR floored at
  30 dB, SSIM clamped to [0.9, 1.0] — `:262-288`);
- cross-dataset bar comparisons with improvement-percentage annotations;
- box plots per metric;
- a markdown report (`report.md`) with the data-availability table, the
  overall per-dataset comparison tables (Diff / % Change / better-arrow
  columns, `:974-1105`), and per-dataset statistics
  (mean/median/std/min/max per model);
- the raw rows as CSV and a text summary.

Multiple variants are supported and keep their command-line order in every
plot and table (reference multi-variant ordering).

Usage:
    python tools/runs_inference_analysis.py \
        --baseline-dirs DIR [DIR ...] \
        [--variant NAME=DIR[,DIR...] ...] \
        [--variant-dirs DIR [DIR ...] --variant-name NAME] \
        [--output-dir DIR] [--discard-outliers]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TRAIN_DATASETS = {"fftle0", "fftle1", "taccturb0", "taccturb1"}
METRICS = ["rmse", "psnr", "ssim"]
HIGHER_BETTER = {"rmse": False, "psnr": True, "ssim": True}


def find_evaluation_files(dir_path: str) -> list[str]:
    return glob.glob(os.path.join(dir_path, "**/*_evaluation.txt"), recursive=True)


def process_evaluation_file(file_path: str) -> dict | None:
    content = Path(file_path).read_text().strip()
    rmse = re.search(r"RMSE:\s*([\d.eE+-]+)", content)
    psnr = re.search(r"PSNR:\s*([\d.eE+-]+)", content)
    ssim = re.search(r"1-SSIM:\s*([\d.eE+-]+)", content)
    basename = os.path.basename(file_path)
    dm = re.match(r"([^_]+)_", basename)
    if not (rmse and psnr and ssim and dm):
        return None
    return {
        "rmse": float(rmse.group(1)),
        "psnr": float(psnr.group(1)),
        "ssim": 1.0 - float(ssim.group(1)),
        "file": basename,
        "dataset": dm.group(1),
    }


def collect(dirs: list[str], model: str) -> pd.DataFrame:
    rows = []
    for d in dirs:
        files = find_evaluation_files(d)
        print(f"Found {len(files)} evaluation files in {d}")
        for f in files:
            r = process_evaluation_file(f)
            if r:
                r["model"] = model
                rows.append(r)
    return pd.DataFrame(rows)


def dataset_label(name: str) -> str:
    return f"{name}*" if name in TRAIN_DATASETS else f"{name}†"


def iqr_filter(df: pd.DataFrame, metric: str = "psnr") -> pd.DataFrame:
    keep = []
    for _, grp in df.groupby(["model", "dataset"]):
        vals = grp[metric]
        if len(vals) < 4:
            keep.append(grp)
            continue
        q1, q3 = np.percentile(vals, [25, 75])
        iqr = q3 - q1
        keep.append(grp[vals.between(q1 - 1.5 * iqr, q3 + 1.5 * iqr)])
    return pd.concat(keep, ignore_index=True)


def plot_box(
    df: pd.DataFrame, metric: str, models: list[str], out_dir: Path,
) -> None:
    fig, ax = plt.subplots(figsize=(10, 6))
    data = [df.loc[df["model"] == m, metric] for m in models]
    ax.boxplot(data, tick_labels=models)
    ax.set_title(f"{metric.upper()} distribution")
    fig.savefig(out_dir / f"{metric}_box.png", dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_dataset_bars(
    df: pd.DataFrame, metric: str, models: list[str], out_dir: Path,
) -> None:
    pivot = df.groupby(["dataset", "model"])[metric].mean().unstack()
    if pivot.shape[1] < 2:
        return
    # command-line model ordering, not alphabetical (reference ordering)
    pivot = pivot[[m for m in models if m in pivot.columns]]
    fig, ax = plt.subplots(figsize=(12, 6))
    labels = [dataset_label(d) for d in pivot.index]
    x = np.arange(len(pivot.index))
    width = 0.8 / pivot.shape[1]
    for j, model in enumerate(pivot.columns):
        ax.bar(x + j * width, pivot[model], width, label=model)
    # improvement % annotation of the last variant vs the first column
    base_col, var_col = pivot.columns[0], pivot.columns[-1]
    for i, d in enumerate(pivot.index):
        b, v = pivot.loc[d, base_col], pivot.loc[d, var_col]
        if b:
            sign = 1 if HIGHER_BETTER[metric] else -1
            imp = sign * 100 * (v - b) / abs(b)
            ax.annotate(
                f"{imp:+.1f}%",
                (x[i] + width * (pivot.shape[1] - 1) / 2, max(b, v)),
                ha="center", va="bottom", fontsize=8,
            )
    ax.set_xticks(x + width * (pivot.shape[1] - 1) / 2)
    ax.set_xticklabels(labels, rotation=30)
    ax.set_title(f"{metric.upper()} by dataset (* train, † held out)")
    ax.legend()
    fig.savefig(out_dir / f"{metric}_by_dataset.png", dpi=120, bbox_inches="tight")
    plt.close(fig)


def _clamped_axis(metric: str, vals: np.ndarray) -> tuple[float, float]:
    """Reference `runs_inference_analysis.py:262-288` axis clamping: keep
    the interesting quality band in frame regardless of outliers."""
    lo, hi = float(np.min(vals)), float(np.max(vals))
    if metric == "rmse":
        return max(0.0, lo - 3e-4), hi + 3e-4
    pad = 1.0 if metric == "psnr" else 0.01
    if metric == "psnr":
        clo, chi = max(30.0, lo - pad), hi + pad
    else:
        clo, chi = max(0.9, lo - pad), min(1.0, hi + pad)
    if clo >= chi:  # every value below the quality-band floor (e.g. an
        # early-epoch checkpoint): fall back to the data band instead of
        # emitting an inverted axis
        return lo - pad, hi + pad
    return clo, chi


def plot_dataset_metrics(
    df: pd.DataFrame, dataset: str, models: list[str], out_dir: Path,
) -> None:
    """Per-dataset three-panel comparison (one panel per metric) with the
    reference's clamped metric-aware axes; RMSE ticks in ×10⁻⁴."""
    sub = df[df["dataset"] == dataset]
    if sub.empty:
        return
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    for i, metric in enumerate(METRICS):
        ax = axes[i]
        means = [sub.loc[sub["model"] == m, metric].mean() for m in models]
        errs = [sub.loc[sub["model"] == m, metric].std() for m in models]
        x = np.arange(len(models))
        ax.bar(x, means, 0.6, yerr=errs, capsize=4)
        vals = sub[metric].to_numpy()
        ax.set_ylim(*_clamped_axis(metric, vals))
        if metric == "rmse":
            ax.yaxis.set_major_formatter(
                plt.FuncFormatter(lambda v, _: f"{v * 1e4:.2f}"),
            )
            ax.set_ylabel(r"RMSE ($\times 10^{-4}$)")
        else:
            ax.set_ylabel(metric.upper())
        ax.set_xticks(x)
        ax.set_xticklabels(models, rotation=0)
        ax.set_title(metric.upper())
    fig.suptitle(f"Dataset: {dataset_label(dataset)} — model comparison")
    fig.tight_layout()
    fig.savefig(
        out_dir / f"dataset_{dataset}_metrics.png", dpi=150, bbox_inches="tight",
    )
    plt.close(fig)


_UP, _DOWN, _EQ = "↑", "↓", "↔"


def write_markdown_report(
    df: pd.DataFrame, models: list[str], out_dir: Path, discard_outliers: bool,
) -> None:
    """Reference-style markdown report (`:974-1105` + per-dataset
    summaries `:836-971`): data availability, overall per-dataset
    comparison tables with Diff / % Change / better-arrow, and
    per-dataset statistics."""
    datasets = sorted(df["dataset"].unique())
    base = models[0]
    lines = [
        "# Inference Results Analysis Report",
        "",
        "## Configuration",
        "",
        f"- Discard outliers: {discard_outliers}",
        f"- Models (in order): {', '.join(models)}",
        "",
        "## Summary of Available Data",
        "",
        "| Dataset | " + " | ".join(f"{m} files" for m in models) + " |",
        "|" + "---|" * (len(models) + 1),
    ]
    for d in datasets:
        counts = [
            str(len(df[(df["model"] == m) & (df["dataset"] == d)]))
            for m in models
        ]
        lines.append(f"| {dataset_label(d)} | " + " | ".join(counts) + " |")

    lines += ["", "## Overall Model Comparison", ""]
    for metric in METRICS:
        better_arrow = _UP if HIGHER_BETTER[metric] else _DOWN
        fmt = (lambda v: f"{v:.6f}") if metric == "rmse" else (lambda v: f"{v:.3f}")
        lines += [
            f"### {metric.upper()} — average by dataset "
            f"({'higher' if HIGHER_BETTER[metric] else 'lower'} is better "
            f"{better_arrow})",
            "",
        ]
        for var in models[1:]:
            lines += [
                f"| Dataset | {base} | {var} | Diff | % Change | Better? |",
                "|---|---|---|---|---|---|",
            ]
            for d in datasets:
                b = df[(df["model"] == base) & (df["dataset"] == d)][metric]
                v = df[(df["model"] == var) & (df["dataset"] == d)][metric]
                if b.empty or v.empty:
                    lines.append(
                        f"| {dataset_label(d)} | N/A | N/A | N/A | N/A | N/A |",
                    )
                    continue
                bm, vm = b.mean(), v.mean()
                diff = vm - bm
                sign = 1 if HIGHER_BETTER[metric] else -1
                pct = sign * 100 * diff / abs(bm) if bm else 0.0
                if diff == 0:
                    arrow = _EQ
                elif (diff > 0) == HIGHER_BETTER[metric]:
                    arrow = better_arrow
                else:
                    arrow = _DOWN if HIGHER_BETTER[metric] else _UP
                lines.append(
                    f"| {dataset_label(d)} | {fmt(bm)} | {fmt(vm)} | "
                    f"{fmt(diff)} | {pct:+.2f}% | {arrow} |",
                )
            lines.append("")

    lines += ["## Per-Dataset Statistics", ""]
    for d in datasets:
        lines += [f"### {dataset_label(d)}", ""]
        for metric in METRICS:
            fmt = (
                (lambda v: f"{v:.6f}")
                if metric == "rmse"
                else (lambda v: f"{v:.4f}")
            )
            lines += [
                f"**{metric.upper()}**",
                "",
                "| Model | Mean | Median | Std | Min | Max |",
                "|---|---|---|---|---|---|",
            ]
            for m in models:
                vals = df[(df["model"] == m) & (df["dataset"] == d)][metric]
                if vals.empty:
                    lines.append(f"| {m} | N/A | N/A | N/A | N/A | N/A |")
                    continue
                lines.append(
                    f"| {m} | {fmt(vals.mean())} | {fmt(vals.median())} | "
                    f"{fmt(vals.std() if len(vals) > 1 else 0.0)} | "
                    f"{fmt(vals.min())} | {fmt(vals.max())} |",
                )
            lines.append("")
    (out_dir / "report.md").write_text("\n".join(lines) + "\n")


def write_summary(df: pd.DataFrame, models: list[str], out_dir: Path) -> None:
    lines = ["# Inference analysis summary", ""]
    agg = df.groupby(["model", "dataset"])[METRICS].mean()
    lines.append(agg.to_string(float_format=lambda v: f"{v:.6f}"))
    if len(models) >= 2:
        base, var = models[0], models[-1]
        lines += ["", f"## {var} vs {base} (mean per metric)", ""]
        overall = df.groupby("model")[METRICS].mean()
        for m in METRICS:
            b, v = overall.loc[base, m], overall.loc[var, m]
            sign = 1 if HIGHER_BETTER[m] else -1
            lines.append(
                f"{m}: {b:.6f} -> {v:.6f} "
                f"({sign * 100 * (v - b) / abs(b):+.2f}% better)" if b else f"{m}: n/a",
            )
    (out_dir / "summary.txt").write_text("\n".join(lines) + "\n")


def main(
    baseline_dirs,
    variants: list[tuple[str, list[str]]],
    output_dir,
    discard_outliers,
):
    """`variants`: ordered (name, dirs) pairs — the order is preserved in
    every plot and table (reference multi-variant ordering)."""
    frames = [collect(baseline_dirs, "baseline")]
    models = ["baseline"]
    for name, dirs in variants:
        frames.append(collect(dirs, name))
        models.append(name)
    df = pd.concat(frames, ignore_index=True)
    if df.empty:
        raise SystemExit("No evaluation files found")
    if discard_outliers:
        df = iqr_filter(df)
    models = [m for m in models if (df["model"] == m).any()]
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "inference_data.csv", index=False)
    for m in METRICS:
        plot_box(df, m, models, out_dir)
        plot_dataset_bars(df, m, models, out_dir)
    for d in sorted(df["dataset"].unique()):
        plot_dataset_metrics(df, d, models, out_dir)
    write_summary(df, models, out_dir)
    write_markdown_report(df, models, out_dir, discard_outliers)
    print(f"Wrote inference analysis to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compare inference evaluation results baseline vs variants",
    )
    parser.add_argument("--baseline-dirs", nargs="+", required=True)
    parser.add_argument(
        "--variant",
        action="append",
        default=[],
        metavar="NAME=DIR[,DIR...]",
        help="named variant with its result dirs; repeatable, order kept",
    )
    parser.add_argument("--variant-dirs", nargs="*", default=[])
    parser.add_argument("--variant-name", default="variant")
    parser.add_argument("--output-dir", default="inference_analysis")
    parser.add_argument("--discard-outliers", action="store_true")
    args = parser.parse_args()
    variant_list: list[tuple[str, list[str]]] = []
    if args.variant_dirs:  # legacy single-variant flags
        variant_list.append((args.variant_name, args.variant_dirs))
    for spec in args.variant:
        name, _, dirs = spec.partition("=")
        if not dirs:
            parser.error(f"--variant expects NAME=DIR[,DIR...], got {spec!r}")
        variant_list.append((name, dirs.split(",")))
    main(
        args.baseline_dirs,
        variant_list,
        args.output_dir,
        args.discard_outliers,
    )
