"""Loss tests, incl. WGAN-GP double-backward parity with torch autograd."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from pixel_heal_thyself_tpu.losses import (
    gan_loss,
    gradient_penalty,
    l1_loss,
    ra_hinge_gan_loss,
    ssim_loss,
    tone_mapping_loss,
)
from pixel_heal_thyself_tpu.ops.msssim import ms_ssim


def test_l1():
    a = jnp.array([1.0, 2.0]); b = jnp.array([0.0, 4.0])
    assert float(l1_loss(a, b)) == 1.5


def test_gan_loss_modes():
    pred = jnp.array([0.5, -1.0])
    assert float(gan_loss(pred, True, "wgan")) == 0.25
    assert float(gan_loss(pred, False, "wgan")) == -0.25
    # lsgan
    assert np.isclose(float(gan_loss(pred, True, "lsgan")), np.mean((np.array([0.5, -1.0]) - 1) ** 2))
    # hinge discriminator/real
    assert np.isclose(float(gan_loss(pred, True, "hinge", True)), np.mean(np.maximum(0, 1 - np.array([0.5, -1.0]))))
    # nsgan matches torch BCE on sigmoid
    t = torch.tensor([0.5, -1.0])
    want = torch.nn.functional.binary_cross_entropy(torch.sigmoid(t), torch.ones(2))
    assert np.isclose(float(gan_loss(pred, True, "nsgan")), want.item(), atol=1e-6)


class TestGradientPenalty:
    def test_linear_critic_exact(self):
        # D(x) = w·x ⇒ ∇ = w everywhere ⇒ gp = (‖w‖-1)²
        w = np.array([0.6, 0.8, 0.0, 0.0], np.float32) * 2.0  # norm 2
        real = jnp.ones((3, 4)); fake = jnp.zeros((3, 4))
        gp = gradient_penalty(lambda x: x @ jnp.asarray(w), real, fake, jax.random.PRNGKey(0))
        assert np.isclose(float(gp), 1.0, atol=1e-6)

    def test_double_backward_matches_torch(self):
        """d(gp)/d(theta) through jax.grad == torch autograd.grad(create_graph)."""
        rng = np.random.default_rng(0)
        wnp = rng.standard_normal((6, 1)).astype(np.float32)
        real_np = rng.standard_normal((4, 6)).astype(np.float32)
        fake_np = rng.standard_normal((4, 6)).astype(np.float32)
        alpha_np = rng.uniform(size=(4, 1)).astype(np.float32)

        # --- jax: grad wrt critic weights of gp with fixed alpha
        def gp_loss(w):
            interp = alpha_np * fake_np + (1 - alpha_np) * real_np
            def critic_sum(x):
                return jnp.sum(jnp.tanh(x @ w))
            g = jax.grad(critic_sum)(jnp.asarray(interp))
            norm = jnp.linalg.norm(g.reshape(4, -1), axis=1)
            return jnp.mean((norm - 1.0) ** 2)

        got = np.asarray(jax.grad(gp_loss)(jnp.asarray(wnp)))

        # --- torch oracle
        w_t = torch.tensor(wnp, requires_grad=True)
        interp = torch.tensor(alpha_np * fake_np + (1 - alpha_np) * real_np, requires_grad=True)
        out = torch.tanh(interp @ w_t)
        g = torch.autograd.grad(out, interp, torch.ones_like(out), create_graph=True)[0]
        gp = ((g.reshape(4, -1).norm(2, dim=1) - 1) ** 2).mean()
        gp.backward()
        want = w_t.grad.detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_gp_inside_jit(self):
        @jax.jit
        def f(w, rng):
            real = jnp.ones((2, 3)); fake = jnp.zeros((2, 3))
            return gradient_penalty(lambda x: jnp.sum(x * w, axis=1), real, fake, rng)

        v = f(jnp.array([1.0, 0.0, 0.0]), jax.random.PRNGKey(1))
        assert np.isfinite(float(v))


def test_ra_hinge_matches_torch():
    rng = np.random.default_rng(3)
    reals = [rng.standard_normal((2, 5, 5, 1)).astype(np.float32) for _ in range(3)]
    fakes = [rng.standard_normal((2, 5, 5, 1)).astype(np.float32) for _ in range(3)]
    got = float(ra_hinge_gan_loss([jnp.asarray(r) for r in reals], [jnp.asarray(f) for f in fakes]))
    loss = 0.0
    for r, f in zip(reals, fakes):
        pr = torch.from_numpy(r).permute(0, 3, 1, 2)
        pf = torch.from_numpy(f).permute(0, 3, 1, 2)
        rm = pr.mean([0, 2, 3], keepdim=True)
        fm = pf.mean([0, 2, 3], keepdim=True)
        loss += torch.relu(1.0 - (pr - fm)).mean() + torch.relu(1.0 + (pf - rm)).mean()
    want = (loss * 0.5).item()
    assert np.isclose(got, want, atol=1e-6)


class TestMsSsim:
    def test_identical_images(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32))
        v = ms_ssim(x, x)
        np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-4)

    def test_noise_lowers_score(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(scale=0.2, size=x.shape).astype(np.float32), 0, 1)
        s_noisy = float(ms_ssim(jnp.asarray(x), jnp.asarray(y))[0])
        assert s_noisy < 0.9

    def test_small_patch_ok(self):
        x = jnp.ones((1, 32, 32, 3)) * 0.5
        assert np.isfinite(float(ms_ssim(x, x)[0]))

    def test_ssim_loss_grad(self):
        x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 32, 32, 3)).astype(np.float32))
        g = jax.grad(lambda a: ssim_loss(a, x))(x * 0.5)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_mix_loss_matches_torch_oracle(self):
        """ms_ssim_mix_loss vs an independent torch implementation of the
        kornia-documented algorithm (Zhao et al. mixed MS-SSIM + Gaussian
        L1: sigmas 0.5..8 at full res, filter 33/pad 16 zero-padded,
        alpha=0.025, compensation=200)."""
        import torch
        import torch.nn.functional as F

        from pixel_heal_thyself_tpu.ops.msssim import ms_ssim_mix_loss

        rng = np.random.default_rng(3)
        x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1).astype(np.float32)

        got = float(ms_ssim_mix_loss(jnp.asarray(x), jnp.asarray(y)))

        sigmas = (0.5, 1.0, 2.0, 4.0, 8.0)
        size, pad = 33, 16
        c1, c2 = 0.01**2, 0.03**2
        coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0

        def gauss(sigma):
            g = np.exp(-(coords**2) / (2 * sigma**2))
            g /= g.sum()
            return torch.tensor(
                np.outer(g, g).astype(np.float32),
            )[None, None].repeat(3, 1, 1, 1)  # [C,1,k,k] depthwise

        tx = torch.tensor(x).permute(0, 3, 1, 2)
        ty = torch.tensor(y).permute(0, 3, 1, 2)
        pics = None
        lum_last = None
        for sigma in sigmas:
            w = gauss(sigma)
            conv = lambda t: F.conv2d(t, w, groups=3, padding=pad)
            mx, my = conv(tx), conv(ty)
            sx2 = conv(tx * tx) - mx * mx
            sy2 = conv(ty * ty) - my * my
            sxy = conv(tx * ty) - mx * my
            lum = (2 * mx * my + c1) / (mx * mx + my * my + c1)
            cs = (2 * sxy + c2) / (sx2 + sy2 + c2)
            csp = cs.prod(dim=1)
            pics = csp if pics is None else pics * csp
            lum_last = lum
        loss_ms = 1.0 - lum_last.prod(dim=1) * pics
        gl1 = F.conv2d(
            (tx - ty).abs(), gauss(sigmas[-1]), groups=3, padding=pad,
        ).mean(dim=1)
        want = float((200.0 * (0.025 * loss_ms + 0.975 * gl1)).mean())
        assert np.isclose(got, want, rtol=1e-4), (got, want)


def test_tone_mapping_loss():
    a = jnp.array([[1.0]]); b = jnp.array([[3.0]])
    assert np.isclose(float(tone_mapping_loss(a, b)), abs(0.5 - 0.75))
