"""On-device radiance/feature transforms.

The reference applies these per-batch on the host with numpy
(`pht/models/base_trainer.py:373-383` — a known CPU bottleneck,
SURVEY.md §3.2). TPU-first, they run inside the jitted train/eval step as
fused elementwise ops: log-transform `log(x+1)` for noisy/gt radiance,
`(n+1)/2` clipped remap for normals (reference
`pht/models/afgsa/preprocessing.py:11-48`).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_DIFFUSE = 0.00316


def preprocess_specular(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log1p(x)


def postprocess_specular(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.expm1(x)


def preprocess_normal(n: jnp.ndarray) -> jnp.ndarray:
    n = (n + 1.0) * 0.5
    return jnp.clip(n, 0.0, 1.0)


def preprocess_diffuse(diffuse: jnp.ndarray, albedo: jnp.ndarray) -> jnp.ndarray:
    return diffuse / (albedo + EPS_DIFFUSE)


def postprocess_diffuse(diffuse: jnp.ndarray, albedo: jnp.ndarray) -> jnp.ndarray:
    return diffuse * (albedo + EPS_DIFFUSE)


def prepare_batch(noisy: jnp.ndarray, gt: jnp.ndarray, aux: jnp.ndarray, log_gt: bool = True):
    """Device-side batch prep (NHWC): normals remapped, radiance log-mapped.

    `log_gt=False` reproduces validation (reference `base_trainer.py:536-545`
    keeps gt linear during eval).
    """
    aux = jnp.concatenate(
        [preprocess_normal(aux[..., :3]), aux[..., 3:]],
        axis=-1,
    )
    noisy = preprocess_specular(noisy)
    if log_gt:
        gt = preprocess_specular(gt)
    return noisy, gt, aux
