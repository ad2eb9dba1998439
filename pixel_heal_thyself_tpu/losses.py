"""GAN and reconstruction losses (functional, jit-composable).

Behavioral spec: reference `pht/models/losses.py` —
- `l1_loss` (:175-184), `gan_loss` with nsgan/wgan/lsgan/hinge modes
  (:103-172; wgan = ±mean of the critic output),
- `gradient_penalty` — WGAN-GP (:12-57): per-sample uniform interpolation
  between real and detached fake, ‖∇_x D(x)‖₂ per sample, mean((‖·‖−1)²).
  In JAX this is `jax.grad` of the summed critic output w.r.t. the
  interpolated input, *inside* the discriminator loss that is itself
  differentiated — the double-backward composes under jit.
- `ra_hinge_gan_loss` — relativistic-average hinge over multi-scale patch
  logits (:266-281),
- `ssim_loss` — kornia-style mixed MS-SSIM + Gaussian-L1 (Zhao et al.,
  compensation 200) on inputs normalized by the per-pixel channel max
  of the target, clamped ≥1 (:248-263),
- `tone_mapping_loss`, `bce_*` (:187-221) — present-for-parity extras,
- `wdiv_gradient_penalty` (:60-100) — Wasserstein-divergence GP.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from pixel_heal_thyself_tpu.ops.msssim import ms_ssim_mix_loss


def l1_loss(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - target.astype(jnp.float32)))


def gan_loss(
    pred: jnp.ndarray,
    target_is_real: bool,
    loss_type: str = "wgan",
    is_discriminator: bool | None = None,
) -> jnp.ndarray:
    """Single-logit GAN loss in the reference's four modes."""
    pred = pred.astype(jnp.float32)
    if loss_type == "wgan":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    if loss_type == "nsgan":
        target = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
        p = jax.nn.sigmoid(pred)
        eps = 1e-12
        return -jnp.mean(target * jnp.log(p + eps) + (1 - target) * jnp.log(1 - p + eps))
    if loss_type == "lsgan":
        target = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
        return jnp.mean((pred - target) ** 2)
    if loss_type == "hinge":
        if is_discriminator:
            return (
                jnp.mean(jax.nn.relu(1.0 - pred))
                if target_is_real
                else jnp.mean(jax.nn.relu(1.0 + pred))
            )
        return jnp.mean(-pred)
    raise NotImplementedError(f"GAN type {loss_type} is not found!")


def gradient_penalty(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],
    real_data: jnp.ndarray,
    fake_data: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """WGAN-GP. `d_apply` maps images → critic logits (any trailing shape).

    Matches reference semantics: the gradient is taken of the *sum* of the
    critic outputs (grad_outputs=ones), so batch-coupled discriminators
    (BatchNorm) behave identically.
    """
    alpha = jax.random.uniform(
        rng,
        (real_data.shape[0],) + (1,) * (real_data.ndim - 1),
        jnp.float32,
    )
    interp = alpha * jax.lax.stop_gradient(fake_data) + (1 - alpha) * real_data

    def critic_sum(x):
        return jnp.sum(d_apply(x).astype(jnp.float32))

    grads = jax.grad(critic_sum)(interp)
    grads = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
    norm = jnp.linalg.norm(grads, axis=1)
    return jnp.mean((norm - 1.0) ** 2)


def wdiv_gradient_penalty(
    d_apply: Callable[[jnp.ndarray], jnp.ndarray],
    real_data: jnp.ndarray,
    fake_data: jnp.ndarray,
    rng: jax.Array,
    p: int = 6,
) -> jnp.ndarray:
    """Wasserstein-divergence gradient penalty (reference :60-100)."""
    alpha = jax.random.uniform(
        rng,
        (real_data.shape[0],) + (1,) * (real_data.ndim - 1),
        jnp.float32,
    )
    # detach like gradient_penalty: the penalty must not backprop into
    # the generator through fake_data (reference detaches, :60-100)
    interp = alpha * real_data + (1 - alpha) * jax.lax.stop_gradient(fake_data)

    def critic_sum(x):
        return jnp.sum(d_apply(x).astype(jnp.float32))

    grads = jax.grad(critic_sum)(interp)
    grads = grads.reshape(grads.shape[0], -1)
    return jnp.mean(jnp.sum(grads**2, axis=1) ** (p / 2))


def ra_hinge_gan_loss(
    real_preds: Sequence[jnp.ndarray],
    fake_preds: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Relativistic-average hinge over lists of patch logits (NHWC maps)."""
    loss = 0.0
    for pr, pf in zip(real_preds, fake_preds):
        pr = pr.astype(jnp.float32)
        pf = pf.astype(jnp.float32)
        # mean over batch and spatial dims, kept per channel
        # (reference means over dims [0,2,3] of NCHW maps)
        real_mean = jnp.mean(pr, axis=(0, 1, 2), keepdims=True)
        fake_mean = jnp.mean(pf, axis=(0, 1, 2), keepdims=True)
        loss += jnp.mean(jax.nn.relu(1.0 - (pr - fake_mean)))
        loss += jnp.mean(jax.nn.relu(1.0 + (pf - real_mean)))
    return loss * 0.5


def ssim_loss(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Reference SSIMLoss (`losses.py:248-263`): kornia MS_SSIMLoss — the
    Zhao-et-al mixed MS-SSIM + Gaussian-L1 loss with compensation 200, NOT
    pooled Wang MS-SSIM — on log-radiance normalized by the target's
    per-pixel channel max clamped to ≥1 (NCHW dim=1 → NHWC -1)."""
    scale = jnp.maximum(jnp.max(target, axis=-1, keepdims=True), 1.0)
    return ms_ssim_mix_loss(x / scale, target / scale)


def tone_mapping_loss(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return l1_loss(x / (x + 1.0), target / (target + 1.0))


def bce_loss(pred_probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    eps = 1e-12
    p = pred_probs.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return -jnp.mean(t * jnp.log(p + eps) + (1 - t) * jnp.log(1 - p + eps))


def bce_loss_logits(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits))),
    )
