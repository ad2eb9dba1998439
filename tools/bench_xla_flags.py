"""Sweep server-side XLA TPU compiler options on the prod train step.

The per-jit `compiler_options` escape hatch (utils/xla_options.py) lets
libtpu-only flags travel inside the compile request, so candidate flags
can be A/B-measured on the real chip without touching XLA_FLAGS (which
the axon client's CPU XLA would reject). This tool times the AFGSA prod
train step (the bench.py headline configuration) under each candidate
option set and prints a comparison table; unknown/invalid options are
reported and skipped rather than aborting the sweep.

Usage:
    python tools/bench_xla_flags.py                      # built-in sweep
    python tools/bench_xla_flags.py 'flag=v,flag2=v2' …  # explicit sets

Timing discipline matches bench.py: chained donated state (each step
consumes the previous step's outputs), one block_until_ready at the end —
verified sound against forced-transfer sync in BASELINE.md round 3.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.utils.compilation_cache import enable_compilation_cache

PATCH = 128
BATCH = 8
WARMUP = 3
ITERS = 20

# Candidate option sets. Each entry is (label, {option: value}). These are
# libtpu-side knobs plausibly relevant to this step's profile (HBM-bound
# loop-fusion tail, pads/copies, Pallas custom-call boundaries); invalid
# names on the deployed libtpu just error out of that entry.
DEFAULT_SWEEP: list[tuple[str, dict[str, str]]] = [
    ("baseline", {}),
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    (
        "aggressive_loop_fusion_layout",
        {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    ),
    (
        "nested_loop_fusion",
        {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    ),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    (
        "licm_inflation_2x",
        {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    ),
    (
        "async_copy_bw_scale",
        {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"},
    ),
    (
        "lhs_off",
        {"xla_latency_hiding_scheduler_rerun": "0"},
    ),
    (
        "dot_strength_reduction_off",
        {"xla_tpu_enable_dot_strength_reduction": "false"},
    ),
    (
        "vector_fusion_windows_2x",
        {
            "xla_tpu_vector_load_fusion_window": "2048",
            "xla_tpu_vector_store_fusion_window": "512",
        },
    ),
]


def build_step():
    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    g_model = AFGSANet(dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0)
    d_model = DiscriminatorVGG(input_size=PATCH, dtype=jnp.bfloat16)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    noisy0 = jnp.zeros((BATCH, PATCH, PATCH, 3))
    aux0 = jnp.zeros((BATCH, PATCH, PATCH, 7))
    gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
    step_fn = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
    rng_np = np.random.default_rng(0)
    batch = {
        "noisy": jnp.asarray(
            np.abs(rng_np.standard_normal((BATCH, PATCH, PATCH, 3))).astype(np.float32),
        ),
        "gt": jnp.asarray(
            np.abs(rng_np.standard_normal((BATCH, PATCH, PATCH, 3))).astype(np.float32),
        ),
        "aux": jnp.asarray(
            rng_np.standard_normal((BATCH, PATCH, PATCH, 7)).astype(np.float32),
        ),
    }
    return step_fn, gstate, dstate, batch


def run_one(opts: dict[str, str]) -> float:
    os.environ["PHT_XLA_OPTS"] = ",".join(f"{k}={v}" for k, v in opts.items())
    step_fn, gstate, dstate, batch = build_step()
    rng = jax.random.PRNGKey(7)
    for _ in range(WARMUP):
        gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
    jax.block_until_ready(metrics["g_loss"])
    start = time.perf_counter()
    for _ in range(ITERS):
        gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
    jax.block_until_ready(metrics["g_loss"])
    return BATCH * ITERS / (time.perf_counter() - start)


def main() -> None:
    enable_compilation_cache()
    if len(sys.argv) > 1:
        sweep = []
        for raw in sys.argv[1:]:
            opts = dict(
                item.split("=", 1) for item in raw.split(",") if item.strip()
            )
            sweep.append((raw, opts))
    else:
        sweep = DEFAULT_SWEEP

    results: list[tuple[str, float | str]] = []
    for label, opts in sweep:
        try:
            pps = run_one(opts)
            results.append((label, pps))
            print(f"{label:36s} {pps:7.2f} patches/sec", flush=True)
        except Exception as e:  # invalid flag name/value → skip
            msg = str(e).splitlines()[0][:120]
            results.append((label, f"ERROR: {msg}"))
            print(f"{label:36s} ERROR: {msg}", flush=True)

    print("\n=== sweep summary ===")
    for label, r in results:
        print(f"{label:36s} {r if isinstance(r, str) else f'{r:7.2f} p/s'}")


if __name__ == "__main__":
    main()
