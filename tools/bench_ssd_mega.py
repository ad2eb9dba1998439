"""On-chip validation + timing for the fused Mamba2-chain megakernel.

Compares the compiled-Mosaic fused op against the XLA chain at prod bench
shapes (batch 4 @ 16k tokens, d_model 256) — forward max-deviation, grad
fingerprint deviation, and chained-input timings for fwd and fwd+bwd
(relay-dedupe-safe: each iteration feeds the previous output back in).

Usage: python tools/bench_ssd_mega.py [--batch 4] [--tokens 16384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixel_heal_thyself_tpu.utils.compilation_cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.models.mamba import Mamba2Layer


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bench_ssd_mega")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)

    b, l = args.batch, args.tokens
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, l, 256)).astype(np.float32), dtype)

    base = Mamba2Layer(d_model=256, dtype=dtype)
    mega = Mamba2Layer(d_model=256, dtype=dtype, use_megakernel=True)
    p = base.init(jax.random.PRNGKey(1), x)

    y0 = np.asarray(jax.jit(base.apply)(p, x), np.float32)
    y1 = np.asarray(jax.jit(mega.apply)(p, x), np.float32)
    scale = max(1e-6, float(np.abs(y0).max()))
    print(f"fwd max abs dev: {np.abs(y1 - y0).max():.3e} "
          f"(rel {np.abs(y1 - y0).max() / scale:.3e}, out max {scale:.3f})",
          flush=True)

    def fingerprint(tree):
        return jax.tree_util.tree_reduce(
            lambda acc, v: acc + jnp.sum(jnp.abs(v).astype(jnp.float32)),
            tree, 0.0,
        )

    def gsum(model):
        def f(xv):
            gr = jax.grad(lambda v: jnp.mean(jnp.abs(model.apply(v, xv))))(p)
            return fingerprint(gr)
        return jax.jit(f)

    f0 = float(gsum(base)(x))
    f1 = float(gsum(mega)(x))
    print(f"grad fingerprint: xla {f0:.6f} mega {f1:.6f} "
          f"(rel dev {abs(f1 - f0) / max(1e-9, abs(f0)):.3e})", flush=True)

    def chain_time(name, model, mode):
        if mode == "fwd":
            def f(xv):
                return xv + 1e-30 * jnp.mean(model.apply(p, xv))
        else:
            def f(xv):
                gr = jax.grad(
                    lambda v: jnp.mean(jnp.abs(model.apply(v, xv))),
                )(p)
                return xv + (1e-30 * fingerprint(gr)).astype(xv.dtype)
        fj = jax.jit(f)
        v = fj(x)
        jax.block_until_ready(v)
        v = fj(v)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            v = fj(v)
        jax.block_until_ready(v)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:28s} {ms:8.2f} ms", flush=True)
        return ms

    chain_time("layer fwd (xla)", base, "fwd")
    chain_time("layer fwd (mega)", mega, "fwd")
    chain_time("layer fwd+bwd (xla)", base, "bwd")
    chain_time("layer fwd+bwd (mega)", mega, "bwd")


if __name__ == "__main__":
    main(sys.argv[1:])
