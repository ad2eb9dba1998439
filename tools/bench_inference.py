"""Benchmark full-frame tiled inference — frames/sec and Mpix/s.

The production serving path (reference flow: offline full-frame denoise,
`/root/reference/tools/runs_inference_analysis.py:25,34-46`) runs
`inference.denoise_frame` over overlapping tiles. Two levers matter and
both are measured here on a real 720p frame:

1. **Tile geometry.** tile 64 + margin 32 (the training-parity default)
   computes each output pixel 4x ((128/64)^2); tile 96 + margin 16 keeps
   the SAME 128^2 compiled window (same kernel plan, same compile-cache
   entry) but cuts the pass count 2.25x. Whether margin 16 still covers
   the effective receptive field is an empirical question — answered by
   stitching the same frame with the same weights under both geometries
   and reporting the seam PSNR between the two outputs (identical
   interiors ==> any delta is pure boundary-context loss).
2. **Dispatch pipelining.** Forcing a host transfer of each tile batch
   before dispatching the next serializes device compute with PCIe/relay
   transfers; dispatching all batches first overlaps them.

Relay-dedupe note (CLAUDE.md): every tile batch has distinct contents and
each timing iteration regenerates the frame noise, so no two executions
share (executable, inputs).

Usage: python tools/bench_inference.py [--height 720 --width 1280]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    import numpy as np

    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = float(max(a.max(), b.max(), 1e-8))
    return 10.0 * np.log10(peak * peak / mse)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bench_inference")
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--model", choices=["afgsa", "mamba"], default="afgsa")
    ap.add_argument(
        "--fused",
        action="store_true",
        help="route each frame through make_fused_frame_apply (device-side "
        "tiling/stitching, one dispatch per frame) instead of the "
        "host-loop denoise_frame",
    )
    ap.add_argument(
        "--sync",
        action="store_true",
        help="force a host transfer of each tile batch before dispatching "
        "the next (the pre-pipelining denoise_frame behavior) — the A/B "
        "for the dispatch-pipelining measurement",
    )
    args = ap.parse_args(argv)
    if args.sync and args.fused:
        ap.error(
            "--sync forces a host transfer per tile batch, but --fused "
            "traces apply_fn inside one jitted frame program (np.asarray "
            "on tracers would crash); pick one",
        )

    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixel_heal_thyself_tpu.inference import denoise_frame

    h, w = args.height, args.width
    use_pallas = jax.default_backend() not in ("cpu", "gpu")

    if args.model == "afgsa":
        from pixel_heal_thyself_tpu.models.afgsa import AFGSANet

        model = AFGSANet(dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0,
                     use_block_kernel=use_pallas)
    else:
        from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet

        model = MambaDenoiserNet(dtype=jnp.bfloat16, num_gcp=0, height=128, width=128)

    rng_np = np.random.default_rng(0)
    z3 = jnp.zeros((8, 128, 128, 3))
    z7 = jnp.zeros((8, 128, 128, 7))
    params = model.init(jax.random.PRNGKey(0), z3, z7)

    @jax.jit
    def apply_fn(noisy, aux):
        return model.apply(params, noisy, aux)

    if args.sync:
        jit_fn = apply_fn

        def apply_fn(noisy, aux):  # noqa: F811 — deliberate A/B wrapper
            return np.asarray(jit_fn(noisy, aux), np.float32)

    def make_frame(seed):
        r = np.random.default_rng(seed)
        return {
            "noisy": np.abs(r.standard_normal((h, w, 3))).astype(np.float32),
            "aux": r.standard_normal((h, w, 7)).astype(np.float32),
        }

    # geometry sweep: every config keeps the 128^2 compiled window
    geoms = [(64, 32), (96, 16), (112, 8)]
    frame0 = make_frame(1)
    outputs = {}
    results = []
    for tile, margin in geoms:
        if args.fused:
            from pixel_heal_thyself_tpu.inference import (
                denoise_frame_fused,
                make_fused_frame_apply,
            )

            fused = make_fused_frame_apply(
                apply_fn, (h, w), tile=tile, margin=margin,
            )

            def run_frame(data, fused=fused):
                return denoise_frame_fused(fused, data)
        else:

            def run_frame(data, tile=tile, margin=margin):
                return denoise_frame(apply_fn, data, tile=tile, margin=margin)

        out = run_frame(frame0)
        outputs[(tile, margin)] = out
        # timing: fresh noise per iteration so the relay can't dedupe
        t0 = time.perf_counter()
        for i in range(args.iters):
            run_frame(make_frame(10 + i))
        dt = (time.perf_counter() - t0) / args.iters
        ref = outputs[geoms[0]]
        seam = psnr(out, ref) if (tile, margin) != geoms[0] else float("inf")
        results.append(
            {
                "tile": tile,
                "margin": margin,
                "sec_per_frame": round(dt, 3),
                "mpix_per_sec": round(h * w / dt / 1e6, 2),
                "consistency_psnr_vs_m32": None if seam == float("inf") else round(seam, 2),
            },
        )
        print(json.dumps(results[-1]), flush=True)

    print(
        json.dumps(
            {
                "model": args.model,
                "frame": [h, w],
                "sync": args.sync,
                "fused": args.fused,
                "backend": jax.default_backend(),
                "results": results,
            },
        ),
    )


if __name__ == "__main__":
    main()
