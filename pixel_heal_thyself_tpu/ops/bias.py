"""Broadcast bias addition with an MXU-matmul gradient.

Autodiff of a broadcast add emits a `reduce_sum` over all leading dims for
db; XLA:TPU lowers that reduction at ~70 GB/s (measured ~0.5 ms per
[8,128,128,256] cotangent — several ms per train step across the model's
conv biases). A ones-vector contraction streams the same bytes through the
MXU at memory bandwidth instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def bias_add(y: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """y + b, with b broadcast over all leading dims of y."""
    return y + b


def _bias_add_fwd(y, b):
    return y + b, None


def _bias_add_bwd(_, g):
    gf = g.reshape(-1, g.shape[-1])
    ones = jnp.ones((1, gf.shape[0]), g.dtype)
    db = jax.lax.dot_general(
        ones, gf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )[0]
    return g, db.astype(g.dtype)


bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)
