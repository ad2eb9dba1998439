"""Inference-results analysis: baseline vs variants over *_evaluation.txt.

Capability parity with reference `tools/runs_inference_analysis.py`
(1282 LoC): globs `**/*_evaluation.txt`, regex-parses RMSE / PSNR / 1-SSIM
(`:34-36`), groups by dataset (filename prefix), marks training datasets
(fftle0/1, taccturb0/1) with `*` and held-out ones with `†`
(`:1153-1164`), and emits per-dataset bar comparisons with improvement
percentages, box plots, a CSV, and a text summary.

Usage:
    python tools/runs_inference_analysis.py \
        --baseline-dirs DIR [DIR ...] --variant-dirs DIR [DIR ...] \
        [--variant-name NAME] [--output-dir DIR] [--discard-outliers]
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


def plot_box(df: pd.DataFrame, metric: str, out_dir: Path) -> None:
    fig, ax = plt.subplots(figsize=(10, 6))
    models = sorted(df["model"].unique())
    data = [df.loc[df["model"] == m, metric] for m in models]
    ax.boxplot(data, tick_labels=models)
    ax.set_title(f"{metric.upper()} distribution")
    fig.savefig(out_dir / f"{metric}_box.png", dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_dataset_bars(df: pd.DataFrame, metric: str, out_dir: Path) -> None:
    pivot = df.groupby(["dataset", "model"])[metric].mean().unstack()
    if pivot.shape[1] < 2:
        return
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


def write_summary(df: pd.DataFrame, out_dir: Path) -> None:
    lines = ["# Inference analysis summary", ""]
    agg = df.groupby(["model", "dataset"])[METRICS].mean()
    lines.append(agg.to_string(float_format=lambda v: f"{v:.6f}"))
    models = sorted(df["model"].unique())
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


def main(baseline_dirs, variant_dirs, variant_name, output_dir, discard_outliers):
    frames = [collect(baseline_dirs, "baseline")]
    if variant_dirs:
        frames.append(collect(variant_dirs, variant_name))
    df = pd.concat(frames, ignore_index=True)
    if df.empty:
        raise SystemExit("No evaluation files found")
    if discard_outliers:
        df = iqr_filter(df)
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "inference_data.csv", index=False)
    for m in METRICS:
        plot_box(df, m, out_dir)
        plot_dataset_bars(df, m, out_dir)
    write_summary(df, out_dir)
    print(f"Wrote inference analysis to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compare inference evaluation results baseline vs variant",
    )
    parser.add_argument("--baseline-dirs", nargs="+", required=True)
    parser.add_argument("--variant-dirs", nargs="*", default=[])
    parser.add_argument("--variant-name", default="variant")
    parser.add_argument("--output-dir", default="inference_analysis")
    parser.add_argument("--discard-outliers", action="store_true")
    args = parser.parse_args()
    main(
        args.baseline_dirs,
        args.variant_dirs,
        args.variant_name,
        args.output_dir,
        args.discard_outliers,
    )
