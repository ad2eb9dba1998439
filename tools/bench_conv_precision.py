"""Micro-bench: the prod-dominant 3×3 256→256 conv at 8×128², bf16 vs
int8 — the measurement behind BASELINE.md's bound on semantic-change
candidate (b) of the 5× verdict (v5e has no fp8 MXU; int8 is its
low-precision path).

Harness notes (both are load-bearing on axon-relayed TPUs):
- the whole N-iteration chain runs inside ONE jitted `fori_loop`, so a
  single remote execution covers all the conv work and per-call dispatch
  latency cannot pollute the per-iter time;
- `jax.block_until_ready` does NOT actually block over the relay — each
  timed call forces a host transfer of a checksum instead, and every
  call gets a distinct input because the relay dedupes identical
  (executable, inputs) executions.
Measured on v5e: bf16 1.75 ms/iter (88.6 TF/s) vs int8 1.26 ms/iter
(122.7 TOP/s) → 1.39×, far under the 394/197 nominal ratio.
"""

import time

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
        # cheap renormalize keeps iterations chained (nothing folds away)
        return (y * jnp.bfloat16(0.01)).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, N, body, x)


@jax.jit
def loop_int8(x, w):
    def body(i, x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        # requantize chain a real int8 model would pay per layer
        return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)

    return jax.lax.fori_loop(0, N, body, x)


def timed(fn, xs, w):
    float(jnp.sum(fn(xs[0], w).astype(jnp.float32)))  # warm the executable
    best = 1e9
    for x in xs[1:]:
        t0 = time.perf_counter()
        float(jnp.sum(fn(x, w).astype(jnp.float32)))  # transfer = real sync
        best = min(best, time.perf_counter() - t0)
    return best / N


def main() -> None:
    rng = np.random.default_rng(0)
    xbs = [
        jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        for _ in range(4)
    ]
    wb = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.bfloat16)
    dt = timed(loop_bf16, xbs, wb)
    print(f"bf16 conv: {dt*1e3:.3f} ms/iter  {FLOPS/dt/1e12:.1f} TFLOP/s")

    xis = [
        jnp.asarray(rng.integers(-100, 100, (B, H, W, C)), jnp.int8)
        for _ in range(4)
    ]
    wi = jnp.asarray(rng.integers(-8, 8, (3, 3, C, C)), jnp.int8)
    dt = timed(loop_int8, xis, wi)
    print(f"int8 conv: {dt*1e3:.3f} ms/iter  {FLOPS/dt/1e12:.1f} TOP/s")


if __name__ == "__main__":
    main()
