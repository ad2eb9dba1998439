"""Spatial padding helpers matching torch Conv2d padding_mode semantics.

The reference picks `padding_mode = "replicate" if deterministic else
"reflect"` at train time (`pht/models/base_trainer.py:334`) and threads it
through all conv blocks. On TPU we pad explicitly (jnp.pad fuses into the
surrounding XLA computation) and run VALID convolutions.
"""

from __future__ import annotations

import jax.numpy as jnp

_TORCH_TO_JNP_MODE = {
    "zeros": "constant",
    "replicate": "edge",
    "reflect": "reflect",
    "circular": "wrap",
}


def pad2d(x: jnp.ndarray, pad: int, mode: str = "zeros") -> jnp.ndarray:
    """Pad the spatial dims of an NHWC tensor like torch Conv2d would."""
    if pad == 0:
        return x
    jmode = _TORCH_TO_JNP_MODE.get(mode)
    if jmode is None:
        raise ValueError(f"unknown padding mode {mode!r}")
    widths = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if jmode == "constant":
        return jnp.pad(x, widths, mode="constant", constant_values=0)
    return jnp.pad(x, widths, mode=jmode)
