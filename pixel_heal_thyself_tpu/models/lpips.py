"""LPIPS perceptual distance (VGG16 backbone) in pure JAX.

The reference used the external `lpips` package with pretrained VGG
weights (reference `pht/models/base_trainer.py:144-148,439-449`; inputs
mapped log→linear→[-1,1] by the trainer). This environment has no
pretrained weights and no egress, so LPIPS is gated behind a weights file:

    cfg.model.losses.lpips_weights_path = /path/to/lpips_vgg.npz

produced offline by `tools/convert_lpips_weights.py` from torchvision's
VGG16 state dict + the lpips package's linear-layer weights. The npz keys:
`features.<i>.weight` / `features.<i>.bias` (torchvision VGG16 feature
indices, OIHW) and `lin<k>.weight` (LPIPS 1×1 heads, [1, C, 1, 1]).

Architecture: VGG16 convs; LPIPS taps after relu1_2 (idx 3), relu2_2 (8),
relu3_3 (15), relu4_3 (22), relu5_3 (29); channel-unit-normalized feature
differences, squared, 1×1 lin weights, spatial mean, summed over taps
(Zhang et al. 2018).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 conv layer indices and channels
_VGG16_CONVS = [
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
]
_POOL_BEFORE = {5, 10, 17, 24}  # maxpool precedes these conv indices
_TAP_AFTER = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}  # relu idx → tap slot
_TAP_CHANNELS = [64, 128, 256, 512, 512]

# LPIPS input normalization (the 'scaling layer')
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_params(path: str | Path) -> dict:
    """Load converted weights into a pytree of jnp arrays (HWIO kernels)."""
    raw = dict(np.load(str(path)))
    params: dict = {"convs": [], "lins": []}
    for conv_idx, _ in _VGG16_CONVS:
        w = raw[f"features.{conv_idx}.weight"]  # OIHW
        b = raw[f"features.{conv_idx}.bias"]
        params["convs"].append(
            (jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b)),
        )
    for k in range(5):
        lw = raw[f"lin{k}.weight"].reshape(-1)  # [C]
        params["lins"].append(jnp.asarray(lw))
    return params


def random_lpips_params(seed: int = 0) -> dict:
    """Random-weight LPIPS (for tests / ablation without pretrained data)."""
    rng = np.random.default_rng(seed)
    params: dict = {"convs": [], "lins": []}
    in_ch = 3
    for _, out_ch in _VGG16_CONVS:
        w = rng.standard_normal((3, 3, in_ch, out_ch)).astype(np.float32)
        w *= np.sqrt(2.0 / (9 * in_ch))
        params["convs"].append((jnp.asarray(w), jnp.zeros(out_ch, jnp.float32)))
        in_ch = out_ch
    for c in _TAP_CHANNELS:
        params["lins"].append(jnp.asarray(rng.uniform(0, 1, c).astype(np.float32)))
    return params


def _vgg_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: NHWC in [-1, 1] → the 5 tapped relu feature maps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps: list[jnp.ndarray] = [None] * 5
    conv_i = 0
    for conv_idx, _ in _VGG16_CONVS:
        if conv_idx in _POOL_BEFORE:
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        w, b = params["convs"][conv_i]
        x = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))),
            w.astype(x.dtype),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)
        x = jax.nn.relu(x)
        relu_idx = conv_idx + 1
        if relu_idx in _TAP_AFTER:
            taps[_TAP_AFTER[relu_idx]] = x
        conv_i += 1
    return taps


def lpips_distance(params: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample LPIPS distance of NHWC images in [-1, 1]."""
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for tap, lin in zip(range(5), params["lins"]):
        a = fx[tap] / jnp.maximum(
            jnp.linalg.norm(fx[tap], axis=-1, keepdims=True), 1e-10,
        )
        b = fy[tap] / jnp.maximum(
            jnp.linalg.norm(fy[tap], axis=-1, keepdims=True), 1e-10,
        )
        d = (a - b) ** 2
        total = total + jnp.mean(
            jnp.sum(d * lin.astype(d.dtype), axis=-1), axis=(1, 2),
        )
    return total


def to_lpips_range(x_log: jnp.ndarray) -> jnp.ndarray:
    """Log-radiance → [-1, 1] (reference `base_trainer.py:441-444`)."""
    x_lin = jnp.expm1(x_log)
    x_rgb = jnp.clip(x_lin / (jnp.max(x_lin) + 1e-6), 0.0, 1.0)
    return x_rgb * 2.0 - 1.0
