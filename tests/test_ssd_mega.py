"""Goldens for the fused Mamba2-chain megakernel (ops/ssd_mega.py).

Interpret-mode (CPU) comparison against the exact XLA chain the kernel
replaces — causal_depthwise_conv1d → softplus dt → ssd_chunked →
RMSNormGated (models/mamba.Mamba2Layer interior) — for the forward AND
every gradient (input, conv taps/bias, dt_bias, A, D, norm weight).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixel_heal_thyself_tpu.ops.conv import causal_depthwise_conv1d
from pixel_heal_thyself_tpu.ops.ssd import ssd_chunked
from pixel_heal_thyself_tpu.ops.ssd_mega import fused_mamba_chain, supports_shapes

_EPS = 1e-5


def _ref_chain(zx, conv_w, conv_b, dt_bias, A, D, norm_w, *,
               d_inner, d_state, headdim, chunk):
    b, l, _ = zx.shape
    h = d_inner // headdim
    dc = d_inner + 2 * d_state
    z = zx[..., :d_inner]
    xbc = jax.nn.silu(
        causal_depthwise_conv1d(zx[..., d_inner:d_inner + dc], conv_w, conv_b),
    )
    x = xbc[..., :d_inner]
    B = xbc[..., d_inner:d_inner + d_state]
    C = xbc[..., d_inner + d_state:]
    dt = jax.nn.softplus(zx[..., d_inner + dc:] + dt_bias)
    y = ssd_chunked(
        x.reshape(b, l, h, headdim),
        dt,
        A,
        B.reshape(b, l, 1, d_state),
        C.reshape(b, l, 1, d_state),
        D,
        chunk=chunk,
    ).reshape(b, l, d_inner)
    g = y * jax.nn.silu(z)
    rms = jax.lax.rsqrt(jnp.mean(g**2, axis=-1, keepdims=True) + _EPS)
    return g * rms * norm_w


def _make_inputs(seed, b, l, d_inner, d_state, headdim, k=4):
    rng = np.random.default_rng(seed)
    h = d_inner // headdim
    dc = d_inner + 2 * d_state
    W = 2 * d_inner + 2 * d_state + h
    zx = rng.standard_normal((b, l, W)).astype(np.float32) * 0.5
    conv_w = (rng.standard_normal((k, dc)) * 0.2).astype(np.float32)
    conv_b = (rng.standard_normal(dc) * 0.1).astype(np.float32)
    dt_bias = rng.uniform(-4.0, -1.0, h).astype(np.float32)
    A = -np.exp(rng.uniform(0.0, 1.5, h)).astype(np.float32)
    D = rng.standard_normal(h).astype(np.float32)
    norm_w = (1.0 + 0.1 * rng.standard_normal(d_inner)).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (zx, conv_w, conv_b, dt_bias, A, D, norm_w))


CONFIGS = [
    # (b, l, d_inner, d_state, headdim, chunk)
    (2, 256, 128, 64, 64, 64),
    (1, 128, 128, 32, 32, 32),
    (2, 192, 256, 64, 64, 64),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_fused_forward_matches_chain(cfg):
    b, l, d_inner, d_state, headdim, chunk = cfg
    assert supports_shapes(l, d_inner, 1, d_state, headdim, 4, chunk)
    args = _make_inputs(0, b, l, d_inner, d_state, headdim)
    want = np.asarray(
        _ref_chain(*args, d_inner=d_inner, d_state=d_state,
                   headdim=headdim, chunk=chunk),
    )
    got = np.asarray(
        fused_mamba_chain(
            *args, d_inner, d_state, headdim, chunk, True,
        ),
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("cfg", CONFIGS[:2])
def test_fused_grads_match_chain(cfg):
    b, l, d_inner, d_state, headdim, chunk = cfg
    args = _make_inputs(1, b, l, d_inner, d_state, headdim)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal(
            (b, l, d_inner),
        ).astype(np.float32),
    )

    def loss_ref(*a):
        return jnp.sum(
            _ref_chain(*a, d_inner=d_inner, d_state=d_state,
                       headdim=headdim, chunk=chunk) * cot,
        )

    def loss_fused(*a):
        return jnp.sum(
            fused_mamba_chain(*a, d_inner, d_state, headdim, chunk, True)
            * cot,
        )

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    names = ["zxbcdt", "conv_w", "conv_b", "dt_bias", "A", "D", "norm_w"]
    for name, a, bb in zip(names, g_ref, g_fused):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(
            bb, a, rtol=5e-4, atol=5e-4 * scale,
            err_msg=f"grad mismatch: {name}",
        )


def test_layer_megakernel_matches_layer():
    """Mamba2Layer(use_megakernel) == Mamba2Layer through the fused op:
    same params (tree pinned identical), same output. The layer gates the
    kernel off on CPU, so this drives the fused op directly (interpret)
    between the layer's own in_proj/out_proj matmuls."""
    from pixel_heal_thyself_tpu.models.mamba import Mamba2Layer

    d_model, d_state, headdim, expand = 32, 64, 64, 4
    d_inner = d_model * expand
    m = Mamba2Layer(d_model=d_model, d_state=d_state, headdim=headdim,
                    expand=expand)
    m_mega = Mamba2Layer(d_model=d_model, d_state=d_state, headdim=headdim,
                         expand=expand, use_megakernel=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 256, d_model)).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    p2 = m_mega.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    want = np.asarray(m.apply(p, x))

    lp = p["params"]
    zx = x @ lp["in_proj"]["kernel"]
    y = fused_mamba_chain(
        zx, lp["conv1d_weight"], lp["conv1d_bias"], lp["dt_bias"],
        -jnp.exp(lp["A_log"]), lp["D"], lp["norm"]["weight"],
        d_inner, d_state, headdim, 128, True,
    )
    got = np.asarray(y @ lp["out_proj"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
