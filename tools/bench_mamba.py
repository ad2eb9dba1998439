"""Benchmark the Mamba2 denoiser G fwd+bwd — the BASELINE.md datapoint.

Measures the full MambaDenoiserNet L1 fwd+bwd at prod-like shapes
(batch 4 @ 128², 16k tokens/sample — reference `config/model/mamba.yaml`
dims) plus the isolated Mamba2Layer and SSD core, chaining inputs between
iterations so the axon relay can't dedupe identical executions.

Usage: python tools/bench_mamba.py [--batch 4] [--patch 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bench_mamba")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args(argv)

    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet, Mamba2Layer
    from pixel_heal_thyself_tpu.ops.ssd import ssd_chunked

    b, p = args.batch, args.patch
    rng_np = np.random.default_rng(0)

    def fingerprint(tree):
        return jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(jnp.abs(x).astype(jnp.float32)), tree, 0.0,
        )

    def chain_time(name, fn, x0, iters=args.iters):
        x = fn(x0)
        jax.block_until_ready(x)
        x = fn(x)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    # fused conv1d+silu prologue: measured net-slower than the XLA chain
    # (BASELINE.md round-3 negative results); flip on to re-measure
    use_pallas = (
        jax.default_backend() not in ("cpu", "gpu")
        and os.environ.get("PHT_MAMBA_PALLAS", "0") == "1"
    )
    # the fused full-interior megakernel (ops/ssd_mega.py)
    use_mega = os.environ.get("PHT_MAMBA_MEGA", "0") == "1"
    model = MambaDenoiserNet(
        dtype=jnp.bfloat16, num_gcp=0, height=p, width=p,
        use_pallas=use_pallas, use_megakernel=use_mega,
    )
    noisy0 = jnp.zeros((b, p, p, 3))
    aux0 = jnp.zeros((b, p, p, 7))
    params = model.init(jax.random.PRNGKey(0), noisy0, aux0)
    noisy = jnp.asarray(
        np.abs(rng_np.standard_normal((b, p, p, 3))).astype(np.float32),
    )
    gt = jnp.asarray(
        np.abs(rng_np.standard_normal((b, p, p, 3))).astype(np.float32),
    )
    aux = jnp.asarray(rng_np.standard_normal((b, p, p, 7)).astype(np.float32))

    def g_fwd(x):
        return x + 1e-30 * jnp.mean(model.apply(params, x, aux))

    chain_time("Mamba G fwd", jax.jit(g_fwd), noisy)

    def g_fwd_bwd(x):
        gr = jax.grad(
            lambda v: jnp.mean(jnp.abs(model.apply(v, x, aux) - gt)),
        )(params)
        return x + 1e-30 * fingerprint(gr)

    chain_time("Mamba G fwd+bwd (L1)", jax.jit(g_fwd_bwd), noisy)

    # isolated Mamba2Layer at the in-model sequence shape
    seq = jnp.asarray(
        rng_np.standard_normal((b, p * p, 256)).astype(np.float32), jnp.bfloat16,
    )
    layer = Mamba2Layer(
        d_model=256, dtype=jnp.bfloat16, use_pallas=use_pallas,
        use_megakernel=use_mega,
    )
    lp = layer.init(jax.random.PRNGKey(1), seq)

    def layer_fwd_bwd(x):
        gr = jax.grad(lambda v: jnp.mean(jnp.abs(layer.apply(v, x))))(lp)
        return x + 1e-30 * fingerprint(gr).astype(x.dtype)

    chain_time("Mamba2Layer fwd+bwd", jax.jit(layer_fwd_bwd), seq)

    # isolated SSD core (d_inner=1024, nheads=16, headdim=64, d_state=64)
    h, hd, n = 16, 64, 64
    xs = jnp.asarray(
        rng_np.standard_normal((b, p * p, h, hd)).astype(np.float32), jnp.bfloat16,
    )
    dts = jnp.abs(
        jnp.asarray(
            rng_np.standard_normal((b, p * p, h)).astype(np.float32), jnp.bfloat16,
        ),
    )
    A = -jnp.ones((h,), jnp.bfloat16)
    Bs = jnp.asarray(
        rng_np.standard_normal((b, p * p, 1, n)).astype(np.float32), jnp.bfloat16,
    )
    Cs = jnp.asarray(
        rng_np.standard_normal((b, p * p, 1, n)).astype(np.float32), jnp.bfloat16,
    )

    def ssd_fwd_bwd(x):
        gr = jax.grad(
            lambda xx: jnp.mean(
                jnp.abs(ssd_chunked(xx, dts, A, Bs, Cs).astype(jnp.float32)),
            ),
        )(x)
        return x + (1e-30 * gr).astype(x.dtype)

    chain_time("SSD core fwd+bwd", jax.jit(ssd_fwd_bwd), xs)

    from pixel_heal_thyself_tpu.ops.ssd import ssd_pallas

    for name, fn in (("SSD chunked fwd", ssd_chunked), ("SSD pallas fwd", ssd_pallas)):
        def ssd_fwd(x, fn=fn):
            y = fn(x, dts, A, Bs, Cs)
            return x + 1e-30 * jnp.mean(y.astype(jnp.float32)).astype(x.dtype)

        chain_time(name, jax.jit(ssd_fwd), xs)


if __name__ == "__main__":
    main()
