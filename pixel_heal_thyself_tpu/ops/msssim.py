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
    """Mean (1 - MS-SSIM) — kornia MS_SSIMLoss(reduction='mean') analog."""
    return jnp.mean(1.0 - ms_ssim(x, y, max_val=max_val))
