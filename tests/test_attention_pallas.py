"""Pallas block-halo attention vs the XLA path (interpret mode on CPU).

Real-TPU validation (compiled Mosaic, prod shapes) runs in
/tmp-style scripts and bench.py; here the kernel logic is checked via the
Pallas interpreter so CI stays CPU-only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pixel_heal_thyself_tpu.ops.attention import block_halo_attention_xla
from pixel_heal_thyself_tpu.ops.attention_pallas import block_halo_attention_pallas
from pixel_heal_thyself_tpu.ops.curves import (
    CurveOrder,
    inverse_permutation,
    make_curve_indices,
)


def _data(B=1, P=16, C=128, heads=2, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, P, P, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, P, P, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, P, P, C)), jnp.float32)
    hd = C // heads
    rel_h = jnp.asarray(rng.standard_normal((14, hd // 2)), jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((14, hd // 2)), jnp.float32)
    return q, k, v, rel_h, rel_w


def _xla(q, k, v, rel_h, rel_w, heads):
    order = jnp.asarray(make_curve_indices(8, CurveOrder.RASTER))
    inv = jnp.asarray(inverse_permutation(np.asarray(order)))
    return block_halo_attention_xla(
        q, k, v, rel_h, rel_w, order, inv,
        block_size=8, halo_size=3, num_heads=heads,
    )


@pytest.mark.slow
@pytest.mark.parametrize("P", [16, 24, 32, 64])
def test_pallas_forward_matches_xla_interpret(P):
    """P=16: two block-rows in one program (single-stripe edge case);
    P=24: three programs of one block-row each (first/middle/last);
    P=32: four block-rows in one program; P=64: rb=4 with two programs —
    the forward's production row-batch crossing a stripe boundary."""
    q, k, v, rel_h, rel_w = _data(B=1 if P == 64 else 2, P=P)
    want = np.asarray(_xla(q, k, v, rel_h, rel_w, heads=2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            block_halo_attention_pallas(
                q, k, v, rel_h, rel_w,
                block_size=8, halo_size=3, num_heads=2,
            ),
        )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("P", [16, 24, 48])
def test_pallas_grads_match_xla_interpret(P):
    """P=16: rb=2 single-program; P=24: rb=1 three programs; P=48: rb=2
    with three programs — the backward's first/middle/last overlap-add
    paths at its production row-batch (the bwd caps rb at 2)."""
    q, k, v, rel_h, rel_w = _data(B=1, P=P)

    def loss_x(args):
        o = _xla(*args, heads=2)
        return jnp.sum(o * jnp.cos(o))

    def loss_p(args):
        o = block_halo_attention_pallas(
            *args, block_size=8, halo_size=3, num_heads=2,
        )
        return jnp.sum(o * jnp.cos(o))

    want = jax.grad(loss_x)((q, k, v, rel_h, rel_w))
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_p)((q, k, v, rel_h, rel_w))
    for name, a, b in zip(["dq", "dk", "dv", "drel_h", "drel_w"], want, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3, err_msg=name,
        )


@pytest.mark.slow
def test_fused_qkv_matches_unfused_interpret():
    """The fused-qkv op (projections folded, padded backward matmuls) must
    match the unfused composition — projections as plain matmuls feeding
    the XLA attention — in value and in every gradient."""
    from pixel_heal_thyself_tpu.ops.attention_pallas import (
        qkv_block_halo_attention_pallas,
    )

    rng = np.random.default_rng(11)
    B, P, C, heads = 1, 16, 128, 2
    n_aux = jnp.asarray(rng.standard_normal((B, P, P, C)), jnp.float32)
    noisy = jnp.asarray(rng.standard_normal((B, P, P, C)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((C, C)) * 0.05, jnp.float32)
    hd = C // heads
    rel_h = jnp.asarray(rng.standard_normal((14, hd // 2)), jnp.float32)
    rel_w = jnp.asarray(rng.standard_normal((14, hd // 2)), jnp.float32)

    def loss_unfused(args):
        na, no, q_, k_, v_, rh, rw = args
        o = _xla(na @ q_, na @ k_, no @ v_, rh, rw, heads=heads)
        return jnp.sum(o * jnp.cos(o))

    def loss_fused(args):
        o = qkv_block_halo_attention_pallas(*args, 8, 3, heads)
        return jnp.sum(o * jnp.cos(o))

    args = (n_aux, noisy, wq, wk, wv, rel_h, rel_w)
    want_v = loss_unfused(args)
    want = jax.grad(loss_unfused)(args)
    with pltpu.force_tpu_interpret_mode():
        got_v = loss_fused(args)
        got = jax.grad(loss_fused)(args)
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), atol=5e-3, rtol=1e-3,
    )
    names = ["dn_aux", "dnoisy", "dwq", "dwk", "dwv", "drel_h", "drel_w"]
    for name, a, b in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, rtol=2e-3, err_msg=name,
        )
