"""Offline tools tests: parsers, termlog, analysis outputs."""

import io
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import runs_analysis  # noqa: E402
import runs_inference_analysis as ria  # noqa: E402
from termlog import process_stream  # noqa: E402


class TestTermlog:
    def test_collapses_carriage_returns(self):
        src = io.StringIO("progress 1\rprogress 2\rprogress done\nnext line\n")
        out = io.StringIO()
        screen = io.StringIO()
        process_stream(src, out, screen)
        assert out.getvalue() == "progress done\nnext line\n"
        assert "progress 1\r" in screen.getvalue()  # raw passthrough


class TestRunsAnalysis:
    def _make_run(self, root, name, epochs, psnr_base, overrides=None):
        rd = root / name
        (rd / ".hydra").mkdir(parents=True)
        ev, tl = [], []
        for e in range(1, epochs + 1):
            ev.append(
                f"Validation: {e} \tAvg MRSE: {0.01 / e:.4f} "
                f"\tAvg PSNR: {psnr_base + e:.4f} \tAvg 1-SSIM: {0.1 / e:.4f}\n",
            )
            tl.append(f"Epoch: {e} \tG loss: {1.0 / e:.4f} \tD Loss: {-0.5 / e:.4f}\n")
        (rd / "evaluation.txt").write_text("".join(ev))
        (rd / "train_loss.txt").write_text("".join(tl))
        import yaml

        (rd / ".hydra" / "overrides.yaml").write_text(
            yaml.safe_dump(overrides or []),
        )
        return rd

    def test_parse_run(self, tmp_path):
        rd = self._make_run(tmp_path, "run000", 3, 30.0)
        rows = runs_analysis.parse_run(rd)
        assert len(rows) == 3
        assert rows[0]["psnr"] == 31.0
        assert rows[0]["ssim"] == 1.0 - 0.1
        assert rows[2]["g_loss"] == round(1.0 / 3, 4)

    def test_end_to_end(self, tmp_path):
        self._make_run(tmp_path, "run000", 3, 30.0, ["model.curve_order=raster"])
        self._make_run(tmp_path, "run001", 3, 31.0, ["model.curve_order=hilbert"])
        out = tmp_path / "analysis"
        runs_analysis.main(str(tmp_path), False, str(out), None)
        assert (out / "runs_data.csv").exists()
        assert (out / "psnr_per_epoch.png").exists()
        summary = (out / "summary.txt").read_text()
        assert "Best-PSNR" in summary

    def test_name_map_and_baseline_diffs(self, tmp_path):
        self._make_run(tmp_path, "run000", 2, 30.0, ["a=1"])
        self._make_run(tmp_path, "run001", 2, 32.0, ["b=2"])
        import yaml

        name_map = tmp_path / "names.yaml"
        name_map.write_text(yaml.safe_dump({"a=1": "baseline", "b=2": "variant"}))
        out = tmp_path / "analysis"
        runs_analysis.main(str(tmp_path), False, str(out), str(name_map))
        summary = (out / "summary.txt").read_text()
        assert "% difference vs baseline" in summary
        assert "variant" in summary
        # reference-format metrics report + all-metrics grid
        # (generate_metrics_summary / create_summary_plot parity)
        assert (out / "summary_plot.png").exists()
        report = (out / "metrics_report.txt").read_text()
        assert "# Metrics Summary Report" in report
        assert "## Filter: all" in report
        assert "### PSNR" in report and "### MRSE" in report
        assert "baseline" in report and "↑" in report
        # baseline leads the section: its % Diff column says "baseline"
        base_line = next(
            ln for ln in report.splitlines() if ln.startswith("baseline ")
        )
        assert "| baseline" in base_line

    def test_report_filters_and_best_performer(self, tmp_path):
        self._make_run(tmp_path, "run000", 6, 30.0, ["a=1"])
        self._make_run(tmp_path, "run001", 6, 32.0, ["b=2"])
        self._make_run(tmp_path, "run002", 6, 28.0, ["c=3"])
        import yaml

        name_map = tmp_path / "names.yaml"
        name_map.write_text(
            yaml.safe_dump({"a=1": "baseline", "b=2": "fast", "c=3": "slow"}),
        )
        filters = tmp_path / "filters.yaml"
        filters.write_text(
            yaml.safe_dump({"speed": ["baseline", "fast"], "solo": ["slow"]}),
        )
        out = tmp_path / "analysis"
        runs_analysis.main(
            str(tmp_path), False, str(out), str(name_map), str(filters),
            tail_epochs=3, best_performer=True,
        )
        report = (out / "metrics_report.txt").read_text()
        assert "## Filter: speed" in report and "## Filter: solo" in report
        assert "slow" not in report.split("## Filter: speed")[1].split("## Filter:")[0]
        assert "Best performing configurations:" in report
        assert "fast: 3/3 epochs" in report  # psnr_base 32 wins every epoch

    def test_report_baseline_without_tail_rows(self, tmp_path):
        # baseline run stopped at epoch 2; variant reached epoch 6 — the
        # tail window (last 3 epochs) has no baseline rows, but the
        # variant's averages must still be shown (with N/A comparisons),
        # not a blanket "No data"
        self._make_run(tmp_path, "run000", 2, 30.0, ["a=1"])
        self._make_run(tmp_path, "run001", 6, 32.0, ["b=2"])
        import yaml

        name_map = tmp_path / "names.yaml"
        name_map.write_text(yaml.safe_dump({"a=1": "baseline", "b=2": "variant"}))
        out = tmp_path / "analysis"
        runs_analysis.main(
            str(tmp_path), False, str(out), str(name_map), tail_epochs=3,
        )
        report = (out / "metrics_report.txt").read_text()
        psnr_section = report.split("### PSNR")[1].split("###")[0]
        base_line = next(
            ln for ln in psnr_section.splitlines() if ln.startswith("baseline ")
        )
        var_line = next(
            ln for ln in psnr_section.splitlines() if ln.startswith("variant ")
        )
        assert "No data" in base_line
        # variant epochs 4..6 → PSNR 36/37/38 → avg 37; comparison is N/A
        assert "37.000" in var_line and "N/A" in var_line
        # every table row matches the 5-column header
        assert base_line.count("|") == 4 and var_line.count("|") == 4


class TestInferenceAnalysis:
    def _write_eval(self, d, scene, rmse, psnr, one_minus_ssim):
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{scene}_0_32_evaluation.txt").write_text(
            f"RMSE: {rmse}\nPSNR: {psnr}\n1-SSIM: {one_minus_ssim}\n",
        )

    def test_parse_and_compare(self, tmp_path):
        base = tmp_path / "base"
        var = tmp_path / "var"
        for scene, p in [("fftle0", 30.0), ("heldout", 28.0)]:
            self._write_eval(base, scene, 0.002, p, 0.05)
            self._write_eval(var, scene, 0.001, p + 2.0, 0.03)
        r = ria.process_evaluation_file(
            str(base / "fftle0_0_32_evaluation.txt"),
        )
        assert r["dataset"] == "fftle0" and r["psnr"] == 30.0
        assert np.isclose(r["ssim"], 0.95)

        out = tmp_path / "out"
        ria.main([str(base)], [("variant", [str(var)])], str(out), False)
        assert (out / "inference_data.csv").exists()
        assert (out / "psnr_by_dataset.png").exists()
        summary = (out / "summary.txt").read_text()
        assert "variant vs baseline" in summary
        # per-dataset clamped-axis figures (reference :262-288)
        assert (out / "dataset_fftle0_metrics.png").exists()
        assert (out / "dataset_heldout_metrics.png").exists()
        # markdown report (reference :974-1105)
        report = (out / "report.md").read_text()
        assert "## Overall Model Comparison" in report
        assert "| Dataset | baseline | variant | Diff | % Change | Better? |" in report
        assert "fftle0*" in report and "heldout†" in report
        assert "## Per-Dataset Statistics" in report
        assert "↑" in report  # better-arrow present for the improved variant

    def test_multi_variant_ordering(self, tmp_path):
        """Several variants keep their given order in tables and plots."""
        base = tmp_path / "b"
        v1 = tmp_path / "v1"
        v2 = tmp_path / "v2"
        for d, p in [(base, 30.0), (v1, 31.0), (v2, 29.0)]:
            self._write_eval(d, "fftle0", 0.002, p, 0.05)
        out = tmp_path / "out"
        ria.main(
            [str(base)], [("zeta", [str(v1)]), ("alpha", [str(v2)])],
            str(out), False,
        )
        report = (out / "report.md").read_text()
        # command-line order (zeta before alpha), not alphabetical
        assert report.index("| Dataset | baseline | zeta |") < report.index(
            "| Dataset | baseline | alpha |",
        )
        # the regressed variant gets the worse-arrow on PSNR
        alpha_row = [
            ln for ln in report.splitlines()
            if ln.startswith("| fftle0*") and "29." in ln
        ]
        assert alpha_row and "↓" in alpha_row[0]

    def test_dataset_labels(self):
        assert ria.dataset_label("fftle0") == "fftle0*"
        assert ria.dataset_label("other") == "other†"

    def test_clamped_axis_never_inverts(self):
        """Values entirely below the quality-band floor (early-epoch
        checkpoints) must fall back to the data band, not emit lo >= hi
        (matplotlib renders that as an inverted axis)."""
        for metric, vals in [
            ("psnr", np.array([24.0, 27.5])),
            ("ssim", np.array([0.41, 0.55])),
            ("psnr", np.array([36.0, 41.0])),   # normal band still clamps
            ("ssim", np.array([0.93, 0.97])),
            ("rmse", np.array([1e-4, 9e-4])),
        ]:
            lo, hi = ria._clamped_axis(metric, vals)
            assert lo < hi, (metric, vals, lo, hi)
        # the reference clamp still applies when values sit in-band
        lo, hi = ria._clamped_axis("psnr", np.array([36.0, 41.0]))
        assert lo == 35.0 and hi == 42.0


def test_report_prep_script(tmp_path):
    src = tmp_path / "runs"
    for name in ["run000", "run_001"]:
        d = src / name
        d.mkdir(parents=True)
        (d / "evaluation.txt").write_text("Validation: 1\n")
        (d / "train_loss.txt").write_text("Epoch: 1\n")
    dest = tmp_path / "report"
    subprocess.run(
        ["bash", str(REPO / "tools" / "report_prep.sh"), str(src), str(dest)],
        check=True,
        capture_output=True,
    )
    assert (dest / "run000_evaluation.txt").exists()
    assert (dest / "run_001_train_loss.txt").exists()


def test_resize_exrs_tool(tmp_path):
    from pixel_heal_thyself_tpu.data.exr import read_exr_channels, write_exr

    x = np.random.default_rng(0).uniform(0, 4, (16, 20)).astype(np.float32)
    p = tmp_path / "img.exr"
    write_exr(p, {"R": x, "normal.X": x * 0.5}, pixel_type="float")
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "resize_exrs.py"), str(tmp_path)],
        check=True,
        capture_output=True,
    )
    back = read_exr_channels(p)
    assert back["R"].shape == (8, 10)
    assert set(back) == {"R", "normal.X"}
    np.testing.assert_allclose(
        back["R"][0, 0],
        x[:2, :2].mean(),
        rtol=1e-2,  # half-precision storage
    )
