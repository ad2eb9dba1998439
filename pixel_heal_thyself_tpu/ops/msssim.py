"""Multi-scale SSIM in pure JAX (NHWC).

Replaces the reference's kornia `MS_SSIMLoss` dependency
(reference `pht/models/losses.py:248-263`). Standard Wang et al. MS-SSIM:
11×11 Gaussian window (σ=1.5), five scales with the canonical weights,
2× average-pool between scales. The scale count is clamped so the window
always fits (small patches: 32² supports 2 scales); weights are
renormalized over the used scales — documented deviation from kornia,
which the reference only exercises behind the off-by-default
`use_ssim_loss` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-(((np.arange(size) - size // 2) ** 2) / (2.0 * sigma**2)))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d_valid(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID 2-D filter over NHWC."""
    c = x.shape[-1]
    w = jnp.asarray(window)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_cs(x: jnp.ndarray, y: jnp.ndarray, window: jnp.ndarray, c1, c2):
    mu_x = _filter2d_valid(x, window)
    mu_y = _filter2d_valid(y, window)
    mu_xx = _filter2d_valid(x * x, window) - mu_x * mu_x
    mu_yy = _filter2d_valid(y * y, window) - mu_y * mu_y
    mu_xy = _filter2d_valid(x * y, window) - mu_x * mu_y
    cs = (2 * mu_xy + c2) / (mu_xx + mu_yy + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    return jnp.mean(ssim, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    max_val: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-sample MS-SSIM of NHWC images in [0, max_val]."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    window = _gaussian_window(window_size, sigma)

    # number of scales that keep the window valid after repeated 2x pooling
    min_side = min(x.shape[1], x.shape[2])
    levels = 1
    while levels < 5 and (min_side // (2**levels)) >= window_size:
        levels += 1
    weights = _MSSSIM_WEIGHTS[:levels] / _MSSSIM_WEIGHTS[:levels].sum()

    vals = []
    for lvl in range(levels):
        ssim_v, cs_v = _ssim_cs(x, y, window, c1, c2)
        vals.append(ssim_v if lvl == levels - 1 else cs_v)
        if lvl != levels - 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            ) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            ) / 4.0
    vals = jnp.stack(vals, axis=0)  # [levels, B]
    vals = jnp.clip(vals, 1e-6, 1.0)  # guard the fractional powers
    return jnp.prod(vals ** jnp.asarray(weights)[:, None], axis=0)


def ms_ssim_loss(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean (1 - MS-SSIM), Wang et al. pooled form (metric-grade MS-SSIM)."""
    return jnp.mean(1.0 - ms_ssim(x, y, max_val=max_val))


# ---------------------------------------------------------------------------
# kornia-style mixed MS-SSIM + Gaussian-L1 loss (Zhao et al., "Loss Functions
# for Image Restoration with Neural Networks"). This is what the reference's
# SSIMLoss actually wraps: `kornia.losses.MS_SSIMLoss(reduction="mean")`
# (reference `pht/models/losses.py:248-263`) is NOT the pooled Wang MS-SSIM —
# it evaluates SSIM at five Gaussian scales (sigmas 0.5..8) at FULL
# resolution, multiplies the contrast-structure terms across scales and
# channels, takes luminance at the coarsest scale, alpha-mixes with a
# Gaussian-weighted L1, and multiplies by a compensation factor of 200.
# Defaults below are kornia's documented defaults. Bit-exactness against the
# pip package is unverifiable here (kornia is not installed and there is no
# egress); the per-channel/sigma pairing uses the mathematically intended
# mapping (each sigma applied to each channel) rather than depending on
# kornia's grouped-conv buffer ordering. Validated against an independent
# torch oracle of the same formula in tests/test_losses.py.
# ---------------------------------------------------------------------------

_KORNIA_SIGMAS = (0.5, 1.0, 2.0, 4.0, 8.0)


def _fspecial_gauss_2d(size: int, sigma: float) -> np.ndarray:
    """Symmetric 2-D Gaussian, matching kornia's `_fspecial_gauss_1d` outer
    product (coords centred at (size-1)/2)."""
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2d_same(x: jnp.ndarray, window: np.ndarray, pad: int) -> jnp.ndarray:
    """Depthwise zero-padded 2-D filter over NHWC (kornia pads with zeros)."""
    c = x.shape[-1]
    w = jnp.asarray(window)[:, :, None, None]
    w = jnp.tile(w, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ms_ssim_mix_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    k: tuple[float, float] = (0.01, 0.03),
    alpha: float = 0.025,
    compensation: float = 200.0,
) -> jnp.ndarray:
    """kornia `MS_SSIMLoss(reduction='mean')` analog on NHWC images.

    loss = compensation * mean(alpha * (1 - lM * PIcs)
                               + (1 - alpha) * gaussian_l1 / data_range)
    where lM is the per-pixel product over channels of the luminance term at
    the coarsest sigma, and PIcs the product over all sigmas and channels of
    the contrast-structure term.
    """
    c1 = (k[0] * data_range) ** 2
    c2 = (k[1] * data_range) ** 2
    filter_size = int(4 * _KORNIA_SIGMAS[-1] + 1)  # 33
    pad = int(2 * _KORNIA_SIGMAS[-1])  # 16

    l_last = None
    pics = None
    for sigma in _KORNIA_SIGMAS:
        win = _fspecial_gauss_2d(filter_size, sigma)
        mu_x = _filter2d_same(x, win, pad)
        mu_y = _filter2d_same(y, win, pad)
        mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
        sx2 = _filter2d_same(x * x, win, pad) - mu_x2
        sy2 = _filter2d_same(y * y, win, pad) - mu_y2
        sxy = _filter2d_same(x * y, win, pad) - mu_xy
        lum = (2 * mu_xy + c1) / (mu_x2 + mu_y2 + c1)  # [B,H,W,C]
        cs = (2 * sxy + c2) / (sx2 + sy2 + c2)
        cs_prod = jnp.prod(cs, axis=-1)  # over channels
        pics = cs_prod if pics is None else pics * cs_prod
        l_last = lum
    lm = jnp.prod(l_last, axis=-1)  # coarsest-sigma luminance over channels
    loss_ms_ssim = 1.0 - lm * pics  # [B,H,W]

    win_last = _fspecial_gauss_2d(filter_size, _KORNIA_SIGMAS[-1])
    gaussian_l1 = jnp.mean(
        _filter2d_same(jnp.abs(x - y), win_last, pad), axis=-1,
    )
    loss_mix = alpha * loss_ms_ssim + (1.0 - alpha) * gaussian_l1 / data_range
    return compensation * jnp.mean(loss_mix)
