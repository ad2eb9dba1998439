"""AOT model export & serving via `jax.export` (StableHLO artifacts).

The reference has no deployment story at all: its inference flow lived
outside the repo (SURVEY.md §2.8 — only the `*_evaluation.txt` consumers
survive in `tools/runs_inference_analysis.py:25,34-46`), and serving a
trained checkpoint meant shipping the full torch + model codebase. This
module is the TPU-native equivalent of a torch.jit / ONNX export path
(capability class "✚" in PARITY.md): a trained denoiser is lowered once
to a versioned, self-describing StableHLO artifact that a serving process
can load and execute with nothing but `jax` — no flax, no model code, no
checkpoint restore, no re-trace.

Artifact layout (a directory):
    model.jaxexport   serialized `jax.export.Exported` (params baked in
                      as constants — the artifact is self-contained)
    manifest.json     artifact version, model name, input shapes/dtypes,
                      tile/margin serving geometry, lowering platforms,
                      jax version

Platform notes: multi-platform artifacts (``platforms=("cpu", "tpu")``)
require the XLA attention path — the Pallas kernels lower to
TPU-specific Mosaic custom calls that cannot execute on CPU. For peak
TPU serving, export with ``platforms=("tpu",)`` from a TPU-backed
process so the generator keeps its fused kernels.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

ARTIFACT_VERSION = 1
MODULE_FILE = "model.jaxexport"
MANIFEST_FILE = "manifest.json"


def export_denoiser(
    model: Any,
    variables: dict,
    out_dir: str | Path,
    *,
    window: int,
    batch_tiles: int = 8,
    aux_channels: int = 7,
    platforms: Sequence[str] = ("tpu",),
    model_name: str = "",
    extra_meta: dict | None = None,
) -> Path:
    """Export `model.apply(variables, noisy, aux)` as an AOT artifact.

    `window` is the serving tile size (tile + 2·margin in `inference.py`
    terms); inputs are [batch_tiles, window, window, 3|aux_channels] fp32
    in the training input domain (log-transformed radiance, preprocessed
    normals) — exactly what `inference.denoise_frame` feeds the live
    apply_fn. Parameters are baked into the module as constants, so the
    artifact needs no separate checkpoint at serving time.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def apply_fn(noisy: jnp.ndarray, aux: jnp.ndarray) -> jnp.ndarray:
        return model.apply(variables, noisy, aux)

    noisy_spec = jax.ShapeDtypeStruct(
        (batch_tiles, window, window, 3), jnp.float32,
    )
    aux_spec = jax.ShapeDtypeStruct(
        (batch_tiles, window, window, aux_channels), jnp.float32,
    )
    exported = jax_export.export(
        jax.jit(apply_fn), platforms=list(platforms),
    )(noisy_spec, aux_spec)
    blob = exported.serialize()
    (out_dir / MODULE_FILE).write_bytes(bytes(blob))

    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "model_name": model_name or type(model).__name__,
        "window": window,
        "batch_tiles": batch_tiles,
        "inputs": {
            "noisy": {"shape": list(noisy_spec.shape), "dtype": "float32"},
            "aux": {"shape": list(aux_spec.shape), "dtype": "float32"},
        },
        "input_domain": "log1p radiance; normals mapped to [0,1]",
        "output_domain": "log1p radiance (postprocess with expm1)",
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "created_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    if extra_meta:
        manifest.update(extra_meta)
    (out_dir / MANIFEST_FILE).write_text(json.dumps(manifest, indent=2) + "\n")
    return out_dir


def load_manifest(artifact_dir: str | Path) -> dict:
    path = Path(artifact_dir) / MANIFEST_FILE
    manifest = json.loads(path.read_text())
    version = manifest.get("artifact_version")
    if version != ARTIFACT_VERSION:
        raise ValueError(
            f"unsupported artifact version {version!r} at {path} "
            f"(this build reads version {ARTIFACT_VERSION})",
        )
    return manifest


def load_exported(
    artifact_dir: str | Path,
) -> tuple[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray], dict]:
    """Load an exported artifact → (apply_fn, manifest).

    The returned callable has the live-model contract
    (`apply_fn(noisy, aux) -> denoised`, fixed [batch_tiles, window,
    window, ·] shapes), so it drops straight into
    `inference.denoise_frame`. The call is jitted: the deserialized
    module compiles once per process and is cached after that.
    """
    artifact_dir = Path(artifact_dir)
    manifest = load_manifest(artifact_dir)
    blob = (artifact_dir / MODULE_FILE).read_bytes()
    exported = jax_export.deserialize(bytearray(blob))

    backend = jax.default_backend()
    platforms = manifest.get("platforms", [])
    # axon-relayed TPUs report backend "axon" but execute TPU programs
    compatible = {"tpu": ("tpu", "axon")}.get
    if platforms and not any(
        backend in compatible(p, (p,)) for p in platforms
    ):
        raise ValueError(
            f"artifact at {artifact_dir} was lowered for {platforms}, "
            f"but this process runs on {backend!r}; re-export with "
            f"platforms including {backend!r} (tools/export_model.py)",
        )

    call = jax.jit(exported.call)

    def apply_fn(noisy: jnp.ndarray, aux: jnp.ndarray) -> jnp.ndarray:
        return call(noisy, aux)

    return apply_fn, manifest
