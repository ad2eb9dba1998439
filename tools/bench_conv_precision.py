"""Micro-bench: prod-dominant 3x3 256->256 conv at 8x128x128, bf16 vs
int8, with the whole 30-iteration chain inside ONE jitted fori_loop (one
remote execution over the axon relay; per-iter recast keeps inputs live
and chained so nothing folds away)."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 8, 128, 128, 256
N = 30
FLOPS = 2 * B * H * W * C * C * 9

dn = jax.lax.conv_dimension_numbers(
    (B, H, W, C), (3, 3, C, C), ("NHWC", "HWIO", "NHWC"),
)


@jax.jit
def loop_bf16(x, w):
    def body(i, x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
        )
        # cheap renormalize so values stay finite and iterations chain
        return (y * jnp.bfloat16(0.01)).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, N, body, x)


@jax.jit
def loop_int8(x, w):
    def body(i, x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)

    return jax.lax.fori_loop(0, N, body, x)


def timed(fn, xs, w):
    # distinct input per call: the axon relay dedupes identical
    # (executable, inputs) executions
    jax.block_until_ready(fn(xs[0], w))
    best = 1e9
    for x in xs[1:]:
        t0 = time.perf_counter()
        s = float(jnp.sum(fn(x, w).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
        print("   (checksum", s, ")")
    return best / N


rng = np.random.default_rng(0)
xbs = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16) for _ in range(4)]
wb = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.bfloat16)
dt = timed(loop_bf16, xbs, wb)
print(f"bf16 conv: {dt*1e3:.3f} ms/iter  {FLOPS/dt/1e12:.1f} TFLOP/s")

xis = [jnp.asarray(rng.integers(-100, 100, (B, H, W, C)), jnp.int8) for _ in range(4)]
wi = jnp.asarray(rng.integers(-8, 8, (3, 3, C, C)), jnp.int8)
try:
    dt = timed(loop_int8, xis, wi)
    print(f"int8 conv: {dt*1e3:.3f} ms/iter  {FLOPS/dt/1e12:.1f} TOP/s")
except Exception as e:
    print(f"int8 conv failed: {type(e).__name__}: {str(e)[:200]}")
