"""PyTorch-parity parameter initializers for flax modules.

The reference relies on torch defaults (Conv2d/Linear: kaiming-uniform with
a=sqrt(5) ⇒ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) and
explicit kaiming-normal fan-out/relu for the attention projections
(reference `pht/models/afgsa/model.py:518-524`). Quality parity (≤0.05 dB)
makes matching these distributions a requirement, not a nicety.

flax conv kernels are HWIO: fan_in = kh*kw*in_ch, fan_out = kh*kw*out_ch.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _conv_fans(shape: tuple[int, ...]) -> tuple[int, int]:
    if len(shape) == 4:  # HWIO conv kernel
        rf = shape[0] * shape[1]
        return rf * shape[2], rf * shape[3]
    if len(shape) == 2:  # dense (in, out)
        return shape[0], shape[1]
    if len(shape) == 1:
        return shape[0], shape[0]
    raise ValueError(f"unsupported param shape {shape}")


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d/Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in, _ = _conv_fans(tuple(shape))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias_init(fan_in: int):
    """torch Conv2d/Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out', nonlinearity='relu'): N(0, 2/fan_out)."""
    _, fan_out = _conv_fans(tuple(shape))
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype) * std


def normal_unit(key, shape, dtype=jnp.float32):
    """N(0, 1) — the reference's rel_h/rel_w init (`model.py:523-524`)."""
    return jax.random.normal(key, shape, dtype)
