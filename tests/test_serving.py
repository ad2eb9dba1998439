"""Serving/export: jax.export artifact round-trips, manifest contract,
and the tiled-inference integration (`inference.from_export`).

The reference has no export/serving path (its inference flow was
out-of-repo, SURVEY.md §2.8) — this pins the ✚ capability: a serialized
StableHLO artifact reproduces the live flax apply to float rounding and
drops into `denoise_frame` without model code or checkpoint."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet
from pixel_heal_thyself_tpu.serving import (
    ARTIFACT_VERSION,
    MANIFEST_FILE,
    MODULE_FILE,
    export_denoiser,
    load_exported,
    load_manifest,
)


def _tiny_afgsa():
    model = AFGSANet(base_ch=32, enc_ch=32, num_sa=2, num_gcp=0, num_heads=4)
    noisy = jnp.zeros((2, 16, 16, 3))
    aux = jnp.zeros((2, 16, 16, 7))
    variables = model.init(jax.random.PRNGKey(0), noisy, aux)
    return model, variables


class TestExportRoundTrip:
    def test_artifact_matches_live_apply(self, tmp_path):
        model, variables = _tiny_afgsa()
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu",),
        )
        assert (out / MODULE_FILE).exists()
        apply_fn, manifest = load_exported(out)

        rng = np.random.default_rng(0)
        noisy = jnp.asarray(rng.uniform(0, 2, (2, 16, 16, 3)), jnp.float32)
        aux = jnp.asarray(rng.standard_normal((2, 16, 16, 7)), jnp.float32)
        got = np.asarray(apply_fn(noisy, aux))
        want = np.asarray(model.apply(variables, noisy, aux))
        # the exported module compiles separately from the live apply, so
        # fusion choices may differ by float rounding — tight tolerance
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert manifest["window"] == 16
        assert manifest["batch_tiles"] == 2

    def test_mamba_artifact(self, tmp_path):
        model = MambaDenoiserNet(
            base_ch=32, enc_ch=32, num_blocks=1, num_gcp=0,
            d_state=16, headdim=16, expansion=2, height=16, width=16,
        )
        noisy = jnp.zeros((1, 16, 16, 3))
        aux = jnp.zeros((1, 16, 16, 7))
        variables = model.init(jax.random.PRNGKey(0), noisy, aux)
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=1, platforms=("cpu",),
            model_name="mamba",
        )
        apply_fn, manifest = load_exported(out)
        rng = np.random.default_rng(1)
        n = jnp.asarray(rng.uniform(0, 2, (1, 16, 16, 3)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((1, 16, 16, 7)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(apply_fn(n, a)),
            np.asarray(model.apply(variables, n, a)),
            rtol=1e-5, atol=1e-6,
        )
        assert manifest["model_name"] == "mamba"

    def test_multi_platform_portable_rebuild(self, tmp_path):
        """tools/export_model.py's multi-platform branch: a Pallas-path
        model is rebuilt with `model.clone(...)` (regression: `.replace`
        does not exist on flax Modules) and exports a cpu+tpu artifact —
        TPU lowering works from a CPU host (jax.export cross-lowering)."""
        model, variables = _tiny_afgsa()
        model = model.clone(use_pallas=True)  # as the prod config sets
        portable = {"use_pallas": False}
        if hasattr(model, "fold_qkv"):
            portable["fold_qkv"] = False
        portable_model = model.clone(**portable)
        assert portable_model.use_pallas is False
        assert portable_model.num_sa == model.num_sa
        out = export_denoiser(
            portable_model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu", "tpu"),
        )
        apply_fn, manifest = load_exported(out)
        assert sorted(manifest["platforms"]) == ["cpu", "tpu"]
        rng = np.random.default_rng(2)
        n = jnp.asarray(rng.uniform(0, 2, (2, 16, 16, 3)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((2, 16, 16, 7)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(apply_fn(n, a)),
            np.asarray(portable_model.apply(variables, n, a)),
            rtol=1e-5, atol=1e-6,
        )


def test_export_tool_rejects_unknown_option():
    """Mistyped export.* overrides must error, not silently no-op."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import export_model

    with pytest.raises(SystemExit, match="unknown export option"):
        export_model.main(["export.windw=256"])


class TestManifest:
    def test_fields(self, tmp_path):
        model, variables = _tiny_afgsa()
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu",),
            extra_meta={"config_name": "ci"},
        )
        manifest = load_manifest(out)
        assert manifest["artifact_version"] == ARTIFACT_VERSION
        assert manifest["inputs"]["noisy"]["shape"] == [2, 16, 16, 3]
        assert manifest["inputs"]["aux"]["shape"] == [2, 16, 16, 7]
        assert manifest["platforms"] == ["cpu"]
        assert manifest["config_name"] == "ci"
        assert manifest["jax_version"] == jax.__version__

    def test_version_gate(self, tmp_path):
        model, variables = _tiny_afgsa()
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu",),
        )
        path = out / MANIFEST_FILE
        manifest = json.loads(path.read_text())
        manifest["artifact_version"] = ARTIFACT_VERSION + 1
        path.write_text(json.dumps(manifest))
        with pytest.raises(ValueError, match="artifact version"):
            load_exported(out)

    def test_platform_mismatch(self, tmp_path):
        model, variables = _tiny_afgsa()
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu",),
        )
        path = out / MANIFEST_FILE
        manifest = json.loads(path.read_text())
        manifest["platforms"] = ["tpu"]
        path.write_text(json.dumps(manifest))
        with pytest.raises(ValueError, match="lowered for"):
            load_exported(out)


class TestInferenceIntegration:
    def test_denoise_frame_through_artifact(self, tmp_path):
        """The loaded artifact drops into denoise_frame and reproduces the
        live model's full-frame output to float rounding."""
        from pixel_heal_thyself_tpu.inference import denoise_frame

        model, variables = _tiny_afgsa()
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu",),
        )
        apply_fn, _ = load_exported(out)
        live_fn = jax.jit(lambda n, a: model.apply(variables, n, a))

        rng = np.random.default_rng(2)
        data = {
            "noisy": rng.uniform(0.1, 2.0, (24, 40, 3)).astype(np.float32),
            "aux": rng.uniform(-1, 1, (24, 40, 7)).astype(np.float32),
        }
        got = denoise_frame(apply_fn, data, tile=8, margin=4, batch_tiles=2)
        want = denoise_frame(live_fn, data, tile=8, margin=4, batch_tiles=2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_fused_frame_through_artifact(self, tmp_path):
        """The exported module must also trace inside the fused whole-frame
        program (`run_inference`'s default path wraps the artifact call in
        an outer jit with device-side tiling)."""
        from pixel_heal_thyself_tpu.inference import (
            denoise_frame,
            denoise_frame_fused,
            make_fused_frame_apply,
        )

        model, variables = _tiny_afgsa()
        out = export_denoiser(
            model, variables, tmp_path / "art",
            window=16, batch_tiles=2, platforms=("cpu",),
        )
        apply_fn, _ = load_exported(out)

        rng = np.random.default_rng(3)
        data = {
            "noisy": rng.uniform(0.1, 2.0, (24, 40, 3)).astype(np.float32),
            "aux": rng.uniform(-1, 1, (24, 40, 7)).astype(np.float32),
        }
        fused = make_fused_frame_apply(
            apply_fn, (24, 40), tile=8, margin=4, batch_tiles=2,
        )
        got = denoise_frame_fused(fused, data)
        want = denoise_frame(apply_fn, data, tile=8, margin=4, batch_tiles=2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
