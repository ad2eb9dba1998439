"""Spatial padding helpers matching torch Conv2d padding_mode semantics.

The reference picks `padding_mode = "replicate" if deterministic else
"reflect"` at train time (`pht/models/base_trainer.py:334`) and threads it
through all conv blocks. On TPU we pad explicitly (jnp.pad fuses into the
surrounding XLA computation) and run VALID convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TORCH_TO_JNP_MODE = {
    "zeros": "constant",
    "replicate": "edge",
    "reflect": "reflect",
    "circular": "wrap",
}


def _jnp_pad(x: jnp.ndarray, widths, mode: str) -> jnp.ndarray:
    jmode = _TORCH_TO_JNP_MODE.get(mode)
    if jmode is None:
        raise ValueError(f"unknown padding mode {mode!r}")
    if jmode == "constant":
        return jnp.pad(x, widths, mode="constant", constant_values=0)
    return jnp.pad(x, widths, mode=jmode)


def pad2d(x: jnp.ndarray, pad: int, mode: str = "zeros") -> jnp.ndarray:
    """Pad the spatial dims of an NHWC tensor like torch Conv2d would."""
    if pad == 0:
        return x
    return _jnp_pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode)


def make_row_halo_pad(axis: str):
    """Build a `(x, pad, mode) -> padded` drop-in for `pad2d` that, inside
    a `shard_map` over `axis` with the frame's rows sharded contiguously,
    pads H with the true neighbor-device edge rows (ICI `ppermute`) instead
    of local reflect/replicate — so a rows-sharded convolution computes
    exactly what the unsharded one would. W and the global top/bottom
    boundary fall back to the normal torch-parity pad (the first/last
    shard's local rows ARE the global boundary rows, so the local fallback
    is exact for pad ≤ strip height). Used by the sequence-sharded Mamba
    full-frame path (models/mamba.py `seq_axis`, parallel/sequence.py)."""

    def pad_fn(x: jnp.ndarray, pad: int, mode: str = "zeros") -> jnp.ndarray:
        if pad == 0:
            return x
        n = jax.lax.axis_size(axis)
        # W pad first so exchanged halo rows already carry their W padding
        xw = _jnp_pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode)
        xl = _jnp_pad(xw, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode)
        if n == 1:
            return xl
        # neighbor edge strips; shard 0 / n-1 keep the local boundary pad
        from_up = jax.lax.ppermute(
            xw[:, -pad:], axis, [(i, i + 1) for i in range(n - 1)],
        )
        from_down = jax.lax.ppermute(
            xw[:, :pad], axis, [(i, i - 1) for i in range(1, n)],
        )
        idx = jax.lax.axis_index(axis)
        top = jnp.where(idx == 0, xl[:, :pad], from_up)
        bot = jnp.where(idx == n - 1, xl[:, -pad:], from_down)
        return jnp.concatenate([top, xw, bot], axis=1)

    return pad_fn
