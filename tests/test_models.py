"""Model tests: shapes, torch numerical parity of primitives, grad flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixel_heal_thyself_tpu.models.afgsa import AFGSANet, FiLM, count_params
from pixel_heal_thyself_tpu.models.discriminators import (
    DiscriminatorVGG,
    DiscriminatorVGG128,
    MultiScaleDiscriminator,
    PatchDiscriminator,
    PatchGANDiscriminator,
    SNConv,
)
from pixel_heal_thyself_tpu.models.layers import BatchNorm2d, ConvBlock


class TestConvBlockParity:
    @pytest.mark.parametrize("mode", ["zeros", "replicate", "reflect"])
    def test_matches_torch_conv(self, mode):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 10, 12, 5)).astype(np.float32)
        blk = ConvBlock(7, kernel_size=3, padding=1, padding_mode=mode, act_type="relu")
        params = blk.init(jax.random.PRNGKey(0), x)
        got = np.asarray(blk.apply(params, x))

        w = np.asarray(params["params"]["Conv_0"]["kernel"])  # HWIO
        b = np.asarray(params["params"]["Conv_0"]["bias"])
        tconv = torch.nn.Conv2d(5, 7, 3, padding=1, padding_mode=mode)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
            tconv.bias.copy_(torch.from_numpy(b))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        with torch.no_grad():
            want = torch.relu(tconv(tx)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_strided(self):
        x = np.random.default_rng(1).standard_normal((1, 8, 8, 3)).astype(np.float32)
        blk = ConvBlock(4, kernel_size=4, stride=2, padding=1, act_type=None)
        params = blk.init(jax.random.PRNGKey(0), x)
        assert blk.apply(params, x).shape == (1, 4, 4, 4)


def test_batchnorm_matches_torch_train_mode():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 6, 6, 3)).astype(np.float32) * 3 + 1
    bn = BatchNorm2d()
    params = bn.init(jax.random.PRNGKey(0), x)
    got = np.asarray(bn.apply(params, x))
    tbn = torch.nn.BatchNorm2d(3, affine=True).train()
    want = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


class TestFiLM:
    def test_spatial_and_global(self):
        x = jnp.ones((1, 8, 8, 16))
        cond = jnp.ones((1, 8, 8, 16))
        for spatial in (True, False):
            m = FiLM(use_spatial=spatial)
            p = m.init(jax.random.PRNGKey(0), x, cond)
            assert m.apply(p, x, cond).shape == x.shape


class TestAFGSANet:
    def test_forward_shape_and_residual(self):
        net = AFGSANet(base_ch=32, enc_ch=32, num_sa=2, num_gcp=1, num_heads=4)
        x = jnp.zeros((1, 16, 16, 3))
        aux = jnp.zeros((1, 16, 16, 7))
        params = net.init(jax.random.PRNGKey(0), x, aux)
        out = net.apply(params, x, aux)
        assert out.shape == (1, 16, 16, 3)
        assert out.dtype == jnp.float32

    def test_param_count_full_model(self):
        # full prod model: base 256, 5 blocks, 4 heads — reference scale
        net = AFGSANet()
        x = jnp.zeros((1, 8, 8, 3))
        aux = jnp.zeros((1, 8, 8, 7))
        params = net.init(jax.random.PRNGKey(0), x, aux)
        n = count_params(params["params"])
        # exact parity with the reference AFGSANet at prod scale
        # (base_ch 256, 5 blocks, 4 heads, block 8, halo 3): encoders
        # 224,512 + 326,144; 5×1,508,992 transformer blocks; decoder
        # 1,187,075 — counted from reference model.py:585-733 layer dims
        assert n == 9_282_691, n

    def test_grad_flows_through_remat(self):
        net = AFGSANet(base_ch=16, enc_ch=16, num_sa=2, num_gcp=2, num_heads=2)
        x = jnp.ones((1, 8, 8, 3))
        aux = jnp.ones((1, 8, 8, 7))
        params = net.init(jax.random.PRNGKey(0), x, aux)

        def loss(p):
            return jnp.mean(net.apply(p, x, aux) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)

    @pytest.mark.parametrize("mode", ["zeros", "reflect", "replicate"])
    def test_encoder_fold_is_exact(self, mode):
        """fold_encoder=True executes each 3-branch multi-scale encoder as
        ONE 5×5 conv (multi_scale_encode) — same param tree, numerically
        exact up to fp reassociation of the tap sum, under every padding
        mode (pad values at distance d don't depend on total pad width)."""
        kw = dict(
            base_ch=16, enc_ch=16, num_sa=1, num_gcp=0, num_heads=2,
            padding_mode=mode,
        )
        folded = AFGSANet(fold_encoder=True, **kw)
        literal = AFGSANet(fold_encoder=False, **kw)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
        aux = jnp.asarray(rng.standard_normal((2, 16, 16, 7)).astype(np.float32))
        p_f = folded.init(jax.random.PRNGKey(0), x, aux)
        p_l = literal.init(jax.random.PRNGKey(0), x, aux)
        # byte-identical param trees: checkpoints/imports see no difference
        assert jax.tree.structure(p_f) == jax.tree.structure(p_l)
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_l)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out_f = np.asarray(folded.apply(p_f, x, aux))
        out_l = np.asarray(literal.apply(p_f, x, aux))
        np.testing.assert_allclose(out_f, out_l, rtol=2e-5, atol=2e-6)

    def test_encoder_fold_conv_path_matches_im2col(self, monkeypatch):
        """Above _IM2COL_MAX_PIXELS the fold executes as one 5×5 conv
        (no staging buffer — the full-frame inference path, ADVICE r4);
        both executions are the same tap-sum up to fp reassociation."""
        from pixel_heal_thyself_tpu.models import afgsa as afgsa_mod

        kw = dict(
            base_ch=16, enc_ch=16, num_sa=1, num_gcp=0, num_heads=2,
            padding_mode="reflect", fold_encoder=True,
        )
        net = AFGSANet(**kw)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
        aux = jnp.asarray(rng.standard_normal((2, 16, 16, 7)).astype(np.float32))
        p = net.init(jax.random.PRNGKey(0), x, aux)
        out_im2col = np.asarray(net.apply(p, x, aux))
        monkeypatch.setattr(afgsa_mod, "_IM2COL_MAX_PIXELS", 0)
        out_conv = np.asarray(net.apply(p, x, aux))
        np.testing.assert_allclose(out_im2col, out_conv, rtol=2e-5, atol=2e-6)

    def test_bf16_compute(self):
        net = AFGSANet(base_ch=16, enc_ch=16, num_sa=1, num_gcp=0, num_heads=2, dtype=jnp.bfloat16)
        x = jnp.ones((1, 8, 8, 3))
        aux = jnp.ones((1, 8, 8, 7))
        params = net.init(jax.random.PRNGKey(0), x, aux)
        out = net.apply(params, x, aux)
        assert out.dtype == jnp.float32  # residual output promoted
        # params stay fp32
        assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params["params"]))


class TestDiscriminators:
    @pytest.mark.parametrize("size", [32, 64])
    def test_vgg_shapes(self, size):
        d = DiscriminatorVGG(input_size=size)
        x = jnp.zeros((2, size, size, 3))
        p = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(p, x)
        assert out.shape == (2, 1)

    def test_vgg128_shape_and_param_count(self):
        """Reference `model.py:128-261` (dead code there, implemented for
        coverage): conv tower 13,677,120 + BN affine 5,760 + classifier
        819,401 = 14,502,281 torch parameters."""
        d = DiscriminatorVGG128()
        x = jnp.zeros((2, 128, 128, 3))
        p = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(p, x, mutable=["batch_stats"])[0]
        assert out.shape == (2, 1)
        n = sum(np.prod(l.shape) for l in jax.tree.leaves(p["params"]))
        assert n == 14_502_281

    def test_patchgan_shape_and_param_count(self):
        """Reference `mamba/model.py:241-293` (dead code there): strides
        2,2,2,1 + 1-ch head → 14×14 logit map at 128²; 2,766,529 params."""
        d = PatchGANDiscriminator()
        x = jnp.zeros((2, 128, 128, 3))
        p = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(p, x, mutable=["batch_stats"])[0]
        assert out.shape == (2, 14, 14, 1)
        n = sum(np.prod(l.shape) for l in jax.tree.leaves(p["params"]))
        assert n == 2_766_529

    def test_snconv_normalizes_spectral_norm(self):
        x = jnp.ones((1, 8, 8, 3))
        m = SNConv(4, kernel_size=3, stride=1, padding=1)
        variables = m.init(jax.random.PRNGKey(0), x)
        # run power iteration a few times, updating u
        var = variables
        for _ in range(30):
            _, updates = m.apply(var, x, mutable=["spectral"])
            var = {**var, "spectral": updates["spectral"]}
        kernel = np.asarray(var["params"]["kernel"])
        u = np.asarray(var["spectral"]["u"])
        w = kernel.transpose(3, 0, 1, 2).reshape(4, -1)
        sigma_true = np.linalg.svd(w, compute_uv=False)[0]
        v = w.T @ u
        v /= np.linalg.norm(v)
        u2 = w @ v
        u2 /= np.linalg.norm(u2)
        sigma_est = u2 @ w @ v
        assert abs(sigma_est - sigma_true) / sigma_true < 1e-3

    def test_patch_discriminator_output_map(self):
        d = PatchDiscriminator(input_size=32)
        x = jnp.zeros((2, 32, 32, 3))
        p = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(p, x)
        assert out.ndim == 4 and out.shape[0] == 2 and out.shape[-1] == 1
        assert out.shape[1] >= 3  # ~4x4 patch logit map

    def test_multiscale_returns_three(self):
        d = MultiScaleDiscriminator(patch_size=32)
        x = jnp.zeros((1, 32, 32, 3))
        p = d.init(jax.random.PRNGKey(0), x)
        outs = d.apply(p, x)
        assert len(outs) == 3
        # per-scale depth adapts so each final logit map stays ~4x4
        assert all(o.ndim == 4 and o.shape[-1] == 1 and o.shape[1] >= 3 for o in outs)
