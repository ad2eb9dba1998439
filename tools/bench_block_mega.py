"""On-chip validation + timing for the fused AFGSA TransformerBlock
megakernel (ops/block_mega.py).

Compares the compiled-Mosaic fused block against the production XLA path
(Pallas attention kernel + XLA convs) at prod bench shapes
(batch 8 @ 128², 256 ch) — forward max-deviation, grad fingerprint
deviation, and chained-input timings for fwd and fwd+bwd
(relay-dedupe-safe: each iteration feeds the previous output back in).
The single-block mega timing INCLUDES its pad/unpad passes; in the real
model those amortize over the whole block stack (AFGSANet chains blocks
in padded form), so the per-block win there is slightly larger.

Usage: python tools/bench_block_mega.py [--batch 8] [--size 128]
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

from pixel_heal_thyself_tpu.models.afgsa import TransformerBlock
from pixel_heal_thyself_tpu.ops.block_mega import pad_w_halo, unpad_w_halo

HALO = 3


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bench_block_mega")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--padding-mode", default="reflect")
    args = ap.parse_args(argv)

    b, hw = args.batch, args.size
    dtype = jnp.bfloat16
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, 256)).astype(np.float32),
                    dtype)
    a = jnp.asarray(rng.standard_normal((b, hw, hw, 256)).astype(np.float32),
                    dtype)

    base = TransformerBlock(ch=256, padding_mode=args.padding_mode,
                            use_pallas=on_tpu, dtype=dtype)
    mega = TransformerBlock(ch=256, padding_mode=args.padding_mode,
                            use_block_kernel=True, dtype=dtype)
    p = base.init(jax.random.PRNGKey(1), x, a)

    def base_apply(pt, xv, av):
        return base.apply(pt, xv, av)[0]

    def mega_apply(pt, xv, av):
        out = mega.apply(pt, pad_w_halo(xv, HALO), pad_w_halo(av, HALO))[0]
        return unpad_w_halo(out, hw, HALO)

    y0 = np.asarray(jax.jit(base_apply)(p, x, a), np.float32)
    y1 = np.asarray(jax.jit(mega_apply)(p, x, a), np.float32)
    scale = max(1e-6, float(np.abs(y0).max()))
    print(f"fwd max abs dev: {np.abs(y1 - y0).max():.3e} "
          f"(rel {np.abs(y1 - y0).max() / scale:.3e}, out max {scale:.3f})",
          flush=True)

    def fingerprint(tree):
        return jax.tree_util.tree_reduce(
            lambda acc, v: acc + jnp.sum(jnp.abs(v).astype(jnp.float32)),
            tree, 0.0,
        )

    def gsum(apply_fn):
        def f(xv, av):
            gr = jax.grad(
                lambda pt: jnp.mean(jnp.abs(apply_fn(pt, xv, av))),
            )(p)
            return fingerprint(gr)
        return jax.jit(f)

    f0 = float(gsum(base_apply)(x, a))
    f1 = float(gsum(mega_apply)(x, a))
    print(f"grad fingerprint: xla {f0:.6f} mega {f1:.6f} "
          f"(rel dev {abs(f1 - f0) / max(1e-9, abs(f0)):.3e})", flush=True)

    def chain_time(name, apply_fn, mode):
        if mode == "fwd":
            def f(xv):
                return xv + 1e-30 * jnp.mean(apply_fn(p, xv, a))
        else:
            def f(xv):
                gr = jax.grad(
                    lambda pt: jnp.mean(jnp.abs(apply_fn(pt, xv, a))),
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

    chain_time("block fwd (xla+attn-kernel)", base_apply, "fwd")
    chain_time("block fwd (mega)", mega_apply, "fwd")
    chain_time("block fwd+bwd (xla)", base_apply, "bwd")
    chain_time("block fwd+bwd (mega)", mega_apply, "bwd")


if __name__ == "__main__":
    main(sys.argv[1:])
