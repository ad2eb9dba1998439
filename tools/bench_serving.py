"""On-chip serving evidence: export a TPU-only artifact and time it vs live.

VERDICT r3 #5 / serving.py:20-24's documented constraint: multi-platform
artifacts force the XLA attention path, so the question "does a
`platforms=('tpu',)` export keep the fused Pallas kernels, and what does
the exported path cost vs the live model?" needs a measurement on the
real chip. This tool, run from the TPU-backed (axon) process:

1. builds the prod AFGSA generator (bf16 + Pallas), exports it with
   ``platforms=("tpu",)`` at the serving geometry (window=128,
   batch_tiles=8), and reports artifact size + whether the StableHLO
   carries the Mosaic ``tpu_custom_call`` (i.e. the Pallas kernels
   survived the export),
2. loads the artifact back (deserialize + first-call compile timed),
3. times tiled full-frame inference (``inference.denoise_frame``, 720p,
   fresh noise per frame so the axon relay can't dedupe) through the
   exported apply_fn vs the live jitted model.

The numbers land in BASELINE.md's round-4 serving table.

Usage: python tools/bench_serving.py [--frames 3] [--height 720 --width 1280]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bench_serving")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--out-dir", default=None, help="artifact dir (default: tmp)")
    args = ap.parse_args(argv)

    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixel_heal_thyself_tpu.inference import denoise_frame
    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from pixel_heal_thyself_tpu.serving import (
        MODULE_FILE,
        export_denoiser,
        load_exported,
    )

    window, batch_tiles = 128, 8
    tile, margin = 64, 32  # training-parity geometry: tile + 2*margin = window

    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    model = AFGSANet(dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0,
                     use_block_kernel=use_pallas)
    noisy0 = jnp.zeros((batch_tiles, window, window, 3))
    aux0 = jnp.zeros((batch_tiles, window, window, 7))
    variables = model.init(jax.random.PRNGKey(0), noisy0, aux0)

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="pht_export_")
    t0 = time.perf_counter()
    export_denoiser(
        model, variables, out_dir,
        window=window, batch_tiles=batch_tiles,
        platforms=("tpu",), model_name="AFGSANet-prod-bench",
    )
    export_s = time.perf_counter() - t0
    blob_path = os.path.join(out_dir, MODULE_FILE)
    size_mb = os.path.getsize(blob_path) / 1e6
    # Pallas kernels lower to Mosaic custom calls — their presence in the
    # serialized module proves the TPU-only export kept the fused path
    with open(blob_path, "rb") as f:
        blob = f.read()
    has_mosaic = b"tpu_custom_call" in blob

    t0 = time.perf_counter()
    exported_fn, manifest = load_exported(out_dir)
    load_s = time.perf_counter() - t0

    rng = np.random.default_rng(0)

    def frame(seed: int) -> dict[str, np.ndarray]:
        r = np.random.default_rng(seed)
        h, w = args.height, args.width
        return {
            "noisy": np.abs(r.standard_normal((h, w, 3))).astype(np.float32),
            "aux": r.standard_normal((h, w, 7)).astype(np.float32),
        }

    @jax.jit
    def live_fn(noisy, aux):
        return model.apply(variables, noisy, aux)

    def time_frames(apply_fn, tag: str, offset: int) -> tuple[float, np.ndarray]:
        # warm-up compiles; then fresh noise per frame (relay dedupe)
        first = time.perf_counter()
        out = denoise_frame(
            apply_fn, frame(offset), tile=tile, margin=margin,
            batch_tiles=batch_tiles,
        )
        first_s = time.perf_counter() - first
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = denoise_frame(
                apply_fn, frame(offset + 1 + i), tile=tile, margin=margin,
                batch_tiles=batch_tiles,
            )
        per_frame = (time.perf_counter() - t0) / args.frames
        print(
            f"{tag:10s} first(+compile) {first_s:6.2f}s   "
            f"steady {per_frame:6.2f}s/frame", flush=True,
        )
        return per_frame, out

    live_s, live_out = time_frames(live_fn, "live", 100)
    exp_s, exp_out = time_frames(exported_fn, "exported", 100)
    # same weights + same frames -> outputs must agree (bf16 accumulation)
    delta = float(np.max(np.abs(live_out - exp_out)))

    print(
        json.dumps(
            {
                "artifact_mb": round(size_mb, 1),
                "export_s": round(export_s, 1),
                "load_s": round(load_s, 2),
                "mosaic_custom_call_in_artifact": has_mosaic,
                "platforms": manifest["platforms"],
                "live_s_per_frame": round(live_s, 2),
                "exported_s_per_frame": round(exp_s, 2),
                "exported_vs_live": round(exp_s / live_s, 3),
                "max_abs_delta": delta,
                "geometry": f"{args.height}x{args.width} tile{tile} margin{margin}",
            },
        ),
    )


if __name__ == "__main__":
    main()
