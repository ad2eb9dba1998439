"""Causal depthwise 1-D convolution.

Replaces the reference's external `causal-conv1d` CUDA kernels (reference
`README.md:14-16`, used inside Mamba2). The kernel is tiny (k=4), so the
convolution is expressed as k shifted multiply-adds over the [b, l, c]
activations — pure elementwise VPU work that XLA fuses into one pass, with
none of the grouped-convolution lowering a `feature_group_count=c`
`conv_general_dilated` would hit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_depthwise_conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    initial_tokens: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x: [b, l, c]; weight: [k, c] (tap 0 = oldest); bias: [c] or None.

    Matches torch `Conv1d(c, c, k, groups=c, padding=k-1)[..., :l]` —
    the causal-conv1d semantics used by Mamba2: output position i sees
    inputs [i-k+1, i].

    `initial_tokens` ([b, k-1, c]) replaces the implicit zero left-pad
    with real preceding tokens — the sequence-sharded path feeds the
    previous shard's tail here so every shard computes the exact global
    convolution (parallel/sequence.py).
    """
    from pixel_heal_thyself_tpu.ops.bias import bias_add

    k, c = weight.shape
    l = x.shape[1]
    if initial_tokens is None:
        xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    else:
        assert initial_tokens.shape[1] == k - 1, initial_tokens.shape
        xp = jnp.concatenate([initial_tokens.astype(x.dtype), x], axis=1)
    w = weight.astype(x.dtype)
    y = w[k - 1] * x
    for t in range(k - 1):
        # tap t multiplies the input shifted right by (k-1-t) positions
        y = y + w[t] * jax.lax.slice_in_dim(xp, t, t + l, axis=1)
    if bias is not None:
        y = bias_add(y, bias.astype(y.dtype))
    return y
