"""Benchmark: training patches/sec/chip at 128×128 (the BASELINE metric).

Runs the full prod-scale GAN train step (AFGSA base_ch 256, 5 blocks,
batch 8, WGAN-GP, both optimizer updates) on synthetic batches and prints
ONE JSON line.

`vs_baseline` is measured against REF_A100_PATCHES_PER_SEC — an estimate
of the PyTorch reference's throughput on its A100-class hardware, since
the reference publishes no numbers. Derivation in BASELINE.md ("Derivation
of REF_A100_PATCHES_PER_SEC"): XLA-counted 1.285 TFLOP/sample for the full
step × a blended TF32-conv/fp32-attention achievable ~48 TFLOP/s on A100
→ ≈37 p/s, rounded up to 40 to favor the reference. The north-star target
is vs_baseline ≥ 5.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

REF_A100_PATCHES_PER_SEC = 40.0  # derived in BASELINE.md, see module docstring

# The Mamba denoiser's own denominator (VERDICT r3 #3) — derived in
# BASELINE.md "Derivation of REF_A100_MAMBA_PATCHES_PER_SEC": XLA-counted
# 1.438 TFLOP/sample for the full GAN step (tools/flops_train_step.py
# --model mamba) ÷ a blended fp32-linear / TF32-conv / memory-bound-SSD
# achievable ~29 TFLOP/s on A100 ≈ 20 p/s, rounded up to 22 to favor the
# reference (which also recomputes every checkpointed Mamba2 block,
# reference mamba/model.py:50,88-92). mamba_ssm's fused Triton SSD is
# per-FLOP competitive, so near-parity here is the honest expectation —
# unlike the conv/attention-heavy AFGSA step where bf16 MXU wins big.
REF_A100_MAMBA_PATCHES_PER_SEC = 22.0

PATCH = 128
# The headline metric is the reference-parity prod config (batch 8).
# PHT_BENCH_BATCH exists only for the BASELINE.md batch-scaling A/B —
# batch ≥16 changes optimization dynamics, so it is never the headline.
BATCH = int(os.environ.get("PHT_BENCH_BATCH", "8"))
WARMUP = 3
ITERS = 20


def main() -> None:
    patches_per_sec = _bench_afgsa()
    mamba_pps = _bench_mamba()
    print(
        json.dumps(
            {
                "metric": "train_patches_per_sec_128px",
                "value": round(patches_per_sec, 2),
                "unit": "patches/sec/chip",
                "vs_baseline": round(patches_per_sec / REF_A100_PATCHES_PER_SEC, 3),
                "mamba_train_patches_per_sec": mamba_pps,
                "mamba_vs_baseline": round(
                    mamba_pps / REF_A100_MAMBA_PATCHES_PER_SEC, 3,
                ),
            },
        ),
    )


def _bench_afgsa() -> float:
    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    # num_gcp=0: gradient checkpointing off — the reference remats 3/5
    # blocks to fit a 24 GB RTX 3090 (model.py:661); at prod shapes the
    # full activation set fits v5e HBM, so the recompute is pure waste
    g_model = AFGSANet(
        dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0,
        # ops/block_mega.py whole-TransformerBlock megakernel — measured
        # 78.11 -> 89.87 p/s on this bench (BASELINE.md round-5); flip
        # to 0 for the XLA-chain A/B
        use_block_kernel=(
            use_pallas and os.environ.get("PHT_AFGSA_MEGA", "1") == "1"
        ),
    )
    d_model = DiscriminatorVGG(input_size=PATCH, dtype=jnp.bfloat16)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)

    noisy0 = jnp.zeros((BATCH, PATCH, PATCH, 3))
    aux0 = jnp.zeros((BATCH, PATCH, PATCH, 7))
    gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
    step_fn = make_train_step(
        g_model, d_model, LossesConfig(), False, g_tx, d_tx,
    )

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
    rng = jax.random.PRNGKey(7)

    for _ in range(WARMUP):
        gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
    jax.block_until_ready(metrics["g_loss"])

    start = time.perf_counter()
    for _ in range(ITERS):
        gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
    jax.block_until_ready(metrics["g_loss"])
    elapsed = time.perf_counter() - start
    return BATCH * ITERS / elapsed


def _bench_mamba() -> float:
    """Full GAN train step on the co-equal Mamba denoiser (reference
    `pht/train.py:27-30` treats it as a peer model; same trainer loop).
    Batch 4 @ 128² — the 16k-token raster scan halves the feasible batch."""
    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    b = 4
    g_model = MambaDenoiserNet(
        dtype=jnp.bfloat16, num_gcp=0, height=PATCH, width=PATCH,
        # ops/ssd_mega.py fused-interior megakernel — measured 23.30 →
        # 43.99 p/s on this bench (BASELINE.md round-5); flip to 0 for
        # the XLA-chain A/B
        use_megakernel=os.environ.get("PHT_MAMBA_MEGA", "1") == "1",
    )
    d_model = DiscriminatorVGG(input_size=PATCH, dtype=jnp.bfloat16)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)

    noisy0 = jnp.zeros((b, PATCH, PATCH, 3))
    aux0 = jnp.zeros((b, PATCH, PATCH, 7))
    gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
    step_fn = make_train_step(
        g_model, d_model, LossesConfig(), False, g_tx, d_tx,
    )

    rng_np = np.random.default_rng(1)
    batch = {
        "noisy": jnp.asarray(
            np.abs(rng_np.standard_normal((b, PATCH, PATCH, 3))).astype(np.float32),
        ),
        "gt": jnp.asarray(
            np.abs(rng_np.standard_normal((b, PATCH, PATCH, 3))).astype(np.float32),
        ),
        "aux": jnp.asarray(
            rng_np.standard_normal((b, PATCH, PATCH, 7)).astype(np.float32),
        ),
    }
    rng = jax.random.PRNGKey(9)

    for _ in range(WARMUP):
        gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
    jax.block_until_ready(metrics["g_loss"])
    start = time.perf_counter()
    for _ in range(ITERS):
        gstate, dstate, metrics = step_fn(gstate, dstate, batch, rng)
    jax.block_until_ready(metrics["g_loss"])
    return round(b * ITERS / (time.perf_counter() - start), 2)


def e2e() -> None:
    """Trainer-level end-to-end bench (VERDICT r4 #4): the real prod
    training loop — dataset build, DeviceLoader HBM store, eval gating —
    for 3 epochs, reporting the steady-state (last-epoch) patches/sec and
    io share from the trainer's own epoch summaries. Keeps the trainer
    number a tracked artifact that can't silently drift from the device
    bench: the JSON line carries both.

    The prod synthetic channel (data/images_prod_synth — the deterministic
    r3 dataset, tools/make_synthetic_datasets.py) is rebuilt on demand;
    training runs in a scratch cwd so no run dirs pollute the repo.
    """
    import re
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    repo = Path(__file__).resolve().parent
    images_dir = repo / "data" / "images_prod_synth"
    if not images_dir.is_dir():
        from pixel_heal_thyself_tpu.data.synthetic import generate_dataset

        train_scenes = [
            f"{family}{i}_{j}"
            for family in ("fftle", "taccturb")
            for i in range(2)
            for j in range(3)
        ][:10]
        generate_dataset(
            str(images_dir), scenes=train_scenes,
            height=512, width=512, seed=990819,
        )

    scratch = tempfile.mkdtemp(prefix="pht_e2e_bench_")
    proc = subprocess.run(
        [
            sys.executable, "-m", "pixel_heal_thyself_tpu.train",
            "-cn", "prod",
            "trainer.epochs=3",
            f"data.images.dir={images_dir}",
            "logging.level=INFO",
        ],
        cwd=scratch,
        # append (not replace): the axon TPU backend is registered by a
        # sitecustomize delivered via PYTHONPATH (/root/.axon_site on this
        # image) — replacing the variable silently drops the TPU platform
        # (CLAUDE.md "Environment gotchas")
        env={
            **os.environ,
            "PYTHONPATH": os.pathsep.join(
                p for p in (os.environ.get("PYTHONPATH", ""), str(repo)) if p
            ),
        },
        capture_output=True,
        text=True,
        check=False,
    )
    log = proc.stdout + proc.stderr
    if proc.returncode != 0:
        sys.stderr.write(log[-4000:])
        raise SystemExit(f"e2e training failed: exit {proc.returncode}")
    summaries = re.findall(
        r"epoch=(\d+) summary: .*?\(([\d.]+) patches/sec, io ([\d.]+)s = (\d+)%\)",
        log,
    )
    if len(summaries) < 2:
        sys.stderr.write(log[-4000:])
        raise SystemExit("e2e run produced no epoch summaries")
    # steady state = epochs after the first (epoch 1 pays compile + the
    # one-time HBM store upload)
    steady = summaries[1:]
    pps = sum(float(s[1]) for s in steady) / len(steady)
    io_share = sum(float(s[3]) for s in steady) / len(steady)
    print(
        json.dumps(
            {
                "metric": "e2e_train_patches_per_sec_128px",
                "value": round(pps, 2),
                "unit": "patches/sec/chip",
                "vs_baseline": round(pps / REF_A100_PATCHES_PER_SEC, 3),
                "steady_epochs": [float(s[1]) for s in steady],
                "io_share_pct": round(io_share, 1),
                "epoch1_patches_per_sec": float(summaries[0][1]),
            },
        ),
    )


if __name__ == "__main__":
    if "--e2e" in sys.argv:
        e2e()
    else:
        main()
