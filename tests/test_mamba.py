"""Mamba2 SSD tests: chunked-vs-naive golden, causal conv parity, model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixel_heal_thyself_tpu.models.mamba import (
    LayerNormTorch,
    Mamba2Layer,
    MambaBlock,
    MambaDenoiserNet,
    positional_encoding_2d,
)
from pixel_heal_thyself_tpu.ops.conv import causal_depthwise_conv1d
from pixel_heal_thyself_tpu.ops.ssd import ssd_chunked, ssd_naive, ssd_pallas


def _ssd_inputs(b=2, l=100, h=4, p=8, g=1, n=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, l, h, p)).astype(np.float32)
    dt = rng.uniform(0.001, 0.1, (b, l, h)).astype(np.float32)
    A = -rng.uniform(1, 8, (h,)).astype(np.float32)
    B = rng.standard_normal((b, l, g, n)).astype(np.float32) * 0.5
    C = rng.standard_normal((b, l, g, n)).astype(np.float32) * 0.5
    D = rng.standard_normal((h,)).astype(np.float32)
    return x, dt, A, B, C, D


class TestSSD:
    @pytest.mark.parametrize("chunk", [16, 32, 128])
    def test_chunked_matches_naive(self, chunk):
        x, dt, A, B, C, D = _ssd_inputs(l=100)  # non-multiple of chunk
        want = np.asarray(ssd_naive(x, dt, A, B, C, D))
        got = np.asarray(ssd_chunked(x, dt, A, B, C, D, chunk=chunk))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_multi_group_broadcast(self):
        x, dt, A, B, C, D = _ssd_inputs(h=4, g=2, n=8)
        want = np.asarray(ssd_naive(x, dt, A, B, C, D))
        got = np.asarray(ssd_chunked(x, dt, A, B, C, D, chunk=32))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    @pytest.mark.slow
    @pytest.mark.parametrize("l,chunk", [(64, 16), (96, 32)])
    def test_pallas_matches_naive_interpret(self, l, chunk):
        """The fused Pallas forward (interpret mode) vs the scan oracle:
        l=64/chunk=16 → two programs of two chunks (carry crosses the
        program boundary); l=96/chunk=32 → gs=3 chunks in one program."""
        from jax.experimental.pallas import tpu as pltpu

        x, dt, A, B, C, D = _ssd_inputs(b=2, l=l)
        want = np.asarray(ssd_naive(x, dt, A, B, C, D))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                ssd_pallas(x, dt, A, B, C, D, chunk=chunk, group=2),
            )
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_pallas_fallback_paths(self):
        """Non-chunk-divisible lengths and g>1 fall back to ssd_chunked."""
        x, dt, A, B, C, D = _ssd_inputs(l=100)
        want = np.asarray(ssd_naive(x, dt, A, B, C, D))
        got = np.asarray(ssd_pallas(x, dt, A, B, C, D, chunk=32))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
        x, dt, A, B, C, D = _ssd_inputs(h=4, g=2, n=8, l=64)
        want = np.asarray(ssd_naive(x, dt, A, B, C, D))
        got = np.asarray(ssd_pallas(x, dt, A, B, C, D, chunk=32))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_causality(self):
        x, dt, A, B, C, D = _ssd_inputs(b=1, l=64)
        y1 = np.asarray(ssd_chunked(x, dt, A, B, C, D, chunk=16))
        x2 = x.copy()
        x2[:, 40:] = 999.0  # future change must not affect the past
        y2 = np.asarray(ssd_chunked(x2, dt, A, B, C, D, chunk=16))
        np.testing.assert_allclose(y1[:, :40], y2[:, :40], rtol=1e-5)
        assert not np.allclose(y1[:, 40:], y2[:, 40:])

    def test_grad_finite(self):
        x, dt, A, B, C, D = _ssd_inputs(l=32)

        def loss(x):
            return jnp.sum(ssd_chunked(x, dt, A, B, C, D, chunk=16) ** 2)

        g = jax.grad(loss)(jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_grad_finite_large_decay(self):
        """Regression: big dt·|A| once overflowed exp() of the masked
        upper triangle and produced NaN gradients."""
        x, dt, A, B, C, D = _ssd_inputs(l=64)
        dt = dt * 50.0  # large decay magnitudes

        def loss(args):
            x, dt = args
            return jnp.sum(ssd_chunked(x, dt, A, B, C, D, chunk=32) ** 2)

        g = jax.grad(loss)((jnp.asarray(x), jnp.asarray(dt)))
        assert all(np.all(np.isfinite(np.asarray(t))) for t in jax.tree.leaves(g))


def test_causal_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    b, l, c, k = 2, 20, 6, 4
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    w = rng.standard_normal((k, c)).astype(np.float32)
    bias = rng.standard_normal((c,)).astype(np.float32)
    got = np.asarray(causal_depthwise_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias)))

    conv = torch.nn.Conv1d(c, c, k, groups=c, padding=k - 1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.T[:, None, :]))  # [c,1,k]
        conv.bias.copy_(torch.from_numpy(bias))
        want = conv(torch.from_numpy(x).permute(0, 2, 1))[..., :l].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layernorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    ln = LayerNormTorch()
    p = ln.init(jax.random.PRNGKey(0), x)
    got = np.asarray(ln.apply(p, x))
    with torch.no_grad():
        want = torch.nn.LayerNorm(8)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_positional_encoding_matches_reference_layout():
    pe = positional_encoding_2d(8, 4, 6)
    assert pe.shape == (4, 6, 8)
    # even channel 0: sin(y * 1) varies along y, constant along x
    np.testing.assert_allclose(pe[:, 0, 0], np.sin(np.arange(4)), atol=1e-6)
    np.testing.assert_allclose(pe[0, :, 0], np.zeros(6), atol=1e-6)
    # odd channel 1: cos(x * 1) varies along x
    np.testing.assert_allclose(pe[0, :, 1], np.cos(np.arange(6)), atol=1e-6)


class TestMambaModel:
    def test_layer_shapes(self):
        layer = Mamba2Layer(d_model=32, d_state=16, expand=2, headdim=16)
        x = jnp.zeros((2, 24, 32))
        p = layer.init(jax.random.PRNGKey(0), x)
        assert layer.apply(p, x).shape == (2, 24, 32)

    def test_block_and_net(self):
        net = MambaDenoiserNet(
            base_ch=32, enc_ch=32, height=16, width=16,
            num_blocks=2, num_gcp=1, d_state=16, expansion=2, headdim=16,
        )
        noisy = jnp.zeros((1, 16, 16, 3))
        aux = jnp.zeros((1, 16, 16, 7))
        p = net.init(jax.random.PRNGKey(0), noisy, aux)
        out = net.apply(p, noisy, aux)
        assert out.shape == (1, 16, 16, 3)
        assert out.dtype == jnp.float32

    def test_grad_flows(self):
        net = MambaDenoiserNet(
            base_ch=16, enc_ch=16, height=8, width=8,
            num_blocks=1, num_gcp=1, d_state=8, expansion=2, headdim=8,
        )
        noisy = jnp.ones((1, 8, 8, 3))
        aux = jnp.ones((1, 8, 8, 7))
        p = net.init(jax.random.PRNGKey(0), noisy, aux)
        g = jax.grad(lambda p: jnp.mean(net.apply(p, noisy, aux) ** 2))(p)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


class TestFusedConvPallas:
    """ops/conv_pallas.fused_causal_conv1d_silu vs the XLA chain
    (interpret mode; compiled-Mosaic validation ran on the real chip —
    f32 forward bit-exact, grads to accumulation noise, BASELINE.md).
    The kernel is a measured-slower opt-in (negative results), kept
    golden-tested like fold_qkv / ssd_pallas."""

    def _data(self, b, l, ctot, c, k=4, seed=0):
        rng = np.random.default_rng(seed)
        z = jnp.asarray(rng.standard_normal((b, l, ctot)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c)) * 0.3, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        return z, w, bias

    @pytest.mark.parametrize("l", [64, 256])
    def test_forward_and_grads_match_xla_interpret(self, l, monkeypatch):
        from jax.experimental.pallas import tpu as pltpu

        from pixel_heal_thyself_tpu.ops import conv_pallas

        if l == 256:  # force the multi-tile path (context crosses tiles)
            monkeypatch.setattr(conv_pallas, "_pick_l_tile", lambda _l: 64)
        off, c = 128, 256
        z, w, bias = self._data(2, l, 512, c)

        def ref(z, w, bias):
            return jax.nn.silu(
                causal_depthwise_conv1d(z[..., off:off + c], w, bias),
            )

        def pal(z, w, bias):
            with pltpu.force_tpu_interpret_mode():
                return conv_pallas.fused_causal_conv1d_silu(
                    z, w, bias, off, c, True,
                )

        np.testing.assert_allclose(
            np.asarray(pal(z, w, bias)), np.asarray(ref(z, w, bias)),
            atol=2e-6, rtol=1e-5,
        )
        gp = jax.grad(
            lambda *a: jnp.sum(jnp.sin(pal(*a))), argnums=(0, 1, 2),
        )(z, w, bias)
        gr = jax.grad(
            lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=(0, 1, 2),
        )(z, w, bias)
        for a, b in zip(gp, gr, strict=True):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            )

    def test_layer_opt_in_matches_xla_interpret(self):
        from jax.experimental.pallas import tpu as pltpu

        from pixel_heal_thyself_tpu.ops import conv_pallas

        # d_model 32 -> d_inner 128, conv_dim 256: lane-aligned windows
        layer_x = Mamba2Layer(d_model=32, d_state=64, headdim=32)
        layer_p = Mamba2Layer(
            d_model=32, d_state=64, headdim=32, use_pallas=True,
        )
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((1, 64, 32)),
            jnp.float32,
        )
        params = layer_x.init(jax.random.PRNGKey(0), x)
        want = layer_x.apply(params, x)
        orig = conv_pallas.fused_causal_conv1d_silu
        calls = []

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        conv_pallas.fused_causal_conv1d_silu = spy
        try:
            with pltpu.force_tpu_interpret_mode():
                got = layer_p.apply(params, x)
        finally:
            conv_pallas.fused_causal_conv1d_silu = orig
        assert calls, "fused path was not taken"
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4,
        )
