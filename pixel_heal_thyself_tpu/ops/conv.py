"""Causal depthwise 1-D convolution.

Replaces the reference's external `causal-conv1d` CUDA kernels (reference
`README.md:14-16`, used inside Mamba2) with a left-padded depthwise
`lax.conv_general_dilated` — XLA fuses it with the surrounding elementwise
ops; a dedicated kernel is unnecessary on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_depthwise_conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x: [b, l, c]; weight: [k, c] (tap 0 = oldest); bias: [c] or None.

    Matches torch `Conv1d(c, c, k, groups=c, padding=k-1)[..., :l]` —
    the causal-conv1d semantics used by Mamba2.
    """
    k, c = weight.shape
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp,
        weight[:, None, :].astype(x.dtype),  # [k, 1, c] IO for depthwise
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NLC", "LIO", "NLC"),
        feature_group_count=c,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
