"""Profile the prod-scale GAN train step on the current JAX backend.

Captures a short jax.profiler trace of the full jitted train step
(AFGSA base_ch 256 + DiscriminatorVGG, batch 8 at 128², WGAN-GP — the
BASELINE.md/bench.py configuration) and summarizes device time per HLO
category plus the most expensive non-conv fusions, read straight from the
xplane protobuf. This is the tool behind the step-composition numbers in
BASELINE.md and the optimization targets in ROADMAP.md.

Usage:  python tools/profile_train_step.py [--steps 3] [--trace-dir DIR]
        python tools/profile_train_step.py --model mamba   # co-equal flagship
        python tools/profile_train_step.py --parse-only --trace-dir DIR
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, steps: int, model: str = "afgsa") -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    b, p = 8, 128
    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if model == "mamba":
        # mirror bench.py:_bench_mamba — batch 4, the 16k-token raster
        # scan halves the feasible batch (BASELINE.md Mamba sections)
        from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet

        b = 4
        g = MambaDenoiserNet(
            dtype=jnp.bfloat16, num_gcp=0, height=p, width=p,
            use_megakernel=os.environ.get("PHT_MAMBA_MEGA", "1") == "1",
        )
    else:
        g = AFGSANet(dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0,
                     use_block_kernel=use_pallas)
    d = DiscriminatorVGG(input_size=p, dtype=jnp.bfloat16)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    noisy0 = jnp.zeros((b, p, p, 3))
    aux0 = jnp.zeros((b, p, p, 7))
    gstate = init_train_state(g, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d, d_tx, jax.random.PRNGKey(1), noisy0)
    step = make_train_step(g, d, LossesConfig(), False, g_tx, d_tx)

    rng_np = np.random.default_rng(0)
    batch = {
        "noisy": jnp.asarray(
            np.abs(rng_np.standard_normal((b, p, p, 3))).astype(np.float32),
        ),
        "gt": jnp.asarray(
            np.abs(rng_np.standard_normal((b, p, p, 3))).astype(np.float32),
        ),
        "aux": jnp.asarray(rng_np.standard_normal((b, p, p, 7)).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(7)

    out = step(gstate, dstate, batch, rng)
    jax.block_until_ready(out[2]["g_loss"])
    out = step(*out[:2], batch, rng)
    jax.block_until_ready(out[2]["g_loss"])

    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        out = step(*out[:2], batch, rng)
    jax.block_until_ready(out[2]["g_loss"])
    jax.profiler.stop_trace()


def parse(trace_dir: str, steps: int, top: int = 18) -> None:
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # pragma: no cover - env-dependent
        sys.exit("parsing needs the tensorflow protobuf package (baked into CI)")

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(max(paths), "rb") as f:
        xs.ParseFromString(f.read())

    device_planes = [p for p in xs.planes if "TPU" in p.name or "GPU" in p.name]
    if not device_planes:  # CPU backend: fall back to the busiest plane
        device_planes = list(xs.planes)
    plane = max(device_planes, key=lambda p: sum(len(l.events) for l in p.lines))
    meta, smeta = plane.event_metadata, plane.stat_metadata
    ops_line = max(plane.lines, key=lambda l: len(l.events))

    mid_stats: dict[int, dict] = {}
    cat_ms: collections.Counter = collections.Counter()
    cat_fl: collections.Counter = collections.Counter()
    cat_n: collections.Counter = collections.Counter()
    per_op: collections.Counter = collections.Counter()
    for ev in ops_line.events:
        if ev.metadata_id not in mid_stats:
            stats = {}
            for st in meta[ev.metadata_id].stats:
                stats[smeta[st.metadata_id].name] = (
                    st.str_value or st.int64_value or st.double_value
                )
            mid_stats[ev.metadata_id] = stats
        stats = mid_stats[ev.metadata_id]
        cat = stats.get("hlo_category") or "?"
        cat_ms[cat] += ev.duration_ps / 1e9 / steps
        cat_fl[cat] += float(stats.get("flops") or 0) / steps
        cat_n[cat] += 1
        per_op[ev.metadata_id] += ev.duration_ps / 1e9 / steps

    print(f"{'category':28s} {'ms/step':>8s} {'TFLOP/s':>8s} {'events':>7s}")
    for cat, ms in cat_ms.most_common(25):
        tf = cat_fl[cat] / (ms / 1000) / 1e12 if ms else 0
        print(f"{cat:28s} {ms:8.2f} {tf:8.1f} {cat_n[cat] // steps:7d}")
    print(f"total device ms/step: {sum(cat_ms.values()):.2f}")

    print("\n-- most expensive individual ops:")
    shown = 0
    for mid, ms in per_op.most_common(200):
        stats = mid_stats[mid]
        cat = stats.get("hlo_category") or "?"
        expr = str(stats.get("hlo_expression") or "")[:200]
        print(f"{ms:7.2f} ms  [{cat}] {meta[mid].name}")
        if expr:
            print(f"     {expr}")
        shown += 1
        if shown >= top:
            break


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="profile_train_step")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/pht_trace")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--model", choices=("afgsa", "mamba"), default="afgsa")
    args = ap.parse_args(argv)
    if not args.parse_only:
        capture(args.trace_dir, args.steps, args.model)
    parse(args.trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
