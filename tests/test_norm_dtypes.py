"""bf16-vs-fp32 deviation bounds for the compute-dtype norm paths.

VERDICT r4 #1b / ADVICE r4: the bf16 branches of RMSNormGated,
LayerNormTorch, BatchNorm2d, and InstanceNorm2d shipped untested. These
tests pin (a) that each bf16 path tracks its fp32 form to bf16 rounding
error, and (b) — the ADVICE-medium regression — that LayerNormTorch and
BatchNorm2d keep the (x - mean) subtraction in fp32: inputs with
|mean| ≫ σ would blow the bounds by orders of magnitude under the
cancellation-prone x·inv − (mean·inv) bf16 rewrite (error ∝ (|mean|/σ)·2⁻⁹,
i.e. O(1) absolute at mean=1000 where the pinned bound is 0.05).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.models.layers import BatchNorm2d, InstanceNorm2d
from pixel_heal_thyself_tpu.models.mamba import LayerNormTorch, RMSNormGated


def _pair(module_cls, init_args, apply_args, **kw):
    """Init in fp32, apply the same params through fp32 and bf16 modules."""
    m32 = module_cls(dtype=jnp.float32, **kw)
    m16 = module_cls(dtype=jnp.bfloat16, **kw)
    p = m32.init(jax.random.PRNGKey(0), *init_args)
    got32 = np.asarray(m32.apply(p, *apply_args), np.float32)
    got16 = np.asarray(m16.apply(p, *apply_args), np.float32)
    return got32, got16


def test_layernorm_bf16_large_mean_no_cancellation():
    # per-token mean 1000, σ 1: the cancellation-prone form errs O(1) here
    rng = np.random.default_rng(0)
    x = (1000.0 + rng.standard_normal((2, 64, 256))).astype(np.float32)
    got32, got16 = _pair(LayerNormTorch, (jnp.asarray(x),), (jnp.asarray(x),))
    # output is ~N(0,1); bf16 rounding of the normalized value + affine
    assert np.max(np.abs(got16 - got32)) < 0.05, np.max(np.abs(got16 - got32))


def test_layernorm_bf16_tracks_fp32_generic():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 32, 128)).astype(np.float32) * 3.0
    got32, got16 = _pair(LayerNormTorch, (jnp.asarray(x),), (jnp.asarray(x),))
    assert np.max(np.abs(got16 - got32)) < 0.05


def test_rmsnorm_gated_bf16_tracks_fp32():
    # RMSNormGated switches on x.dtype (no dtype field) — feed bf16 inputs
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 256)).astype(np.float32) * 2.0
    z = rng.standard_normal((2, 64, 256)).astype(np.float32)
    m = RMSNormGated()
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(z))
    got32 = np.asarray(m.apply(p, jnp.asarray(x), jnp.asarray(z)), np.float32)
    got16 = np.asarray(
        m.apply(
            p,
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(z, jnp.bfloat16),
        ),
        np.float32,
    )
    # normalized output is O(1); input rounding + a handful of bf16
    # roundings in the chain
    assert np.max(np.abs(got16 - got32)) < 0.08, np.max(np.abs(got16 - got32))


def test_batchnorm_bf16_large_mean_no_cancellation():
    rng = np.random.default_rng(3)
    x = (1000.0 + rng.standard_normal((4, 16, 16, 32))).astype(np.float32)
    got32, got16 = _pair(BatchNorm2d, (jnp.asarray(x),), (jnp.asarray(x),))
    assert np.max(np.abs(got16 - got32)) < 0.05, np.max(np.abs(got16 - got32))


def test_instancenorm_bf16_large_mean_no_cancellation():
    rng = np.random.default_rng(4)
    x = (1000.0 + rng.standard_normal((2, 16, 16, 32))).astype(np.float32)
    got32, got16 = _pair(InstanceNorm2d, (jnp.asarray(x),), (jnp.asarray(x),))
    assert np.max(np.abs(got16 - got32)) < 0.05


def test_norm_bf16_grads_finite_and_close():
    # the bf16 paths sit inside the jitted train step — their VJPs must
    # track the fp32 VJPs at bf16 precision too
    rng = np.random.default_rng(5)
    x = (100.0 + rng.standard_normal((2, 32, 128))).astype(np.float32)

    def loss(m, p, xv):
        return jnp.sum(jnp.square(m.apply(p, xv)))

    m32 = LayerNormTorch(dtype=jnp.float32)
    m16 = LayerNormTorch(dtype=jnp.bfloat16)
    p = m32.init(jax.random.PRNGKey(0), jnp.asarray(x))
    g32 = jax.grad(lambda xv: loss(m32, p, xv))(jnp.asarray(x))
    g16 = jax.grad(lambda xv: loss(m16, p, xv))(jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(g16)))
    # grads of sum(y²) are O(1); bound at bf16-rounding scale
    assert np.max(np.abs(np.asarray(g16) - np.asarray(g32))) < 0.25
