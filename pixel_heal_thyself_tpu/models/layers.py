"""Shared building blocks: conv/norm/activation factories.

Behavioral spec: reference `pht/models/afgsa/model.py:52-125` (conv_block =
Conv2d + optional BatchNorm/InstanceNorm + ReLU/LeakyReLU/PReLU). NHWC,
explicit torch-parity padding, torch-default initializers. Normalization is
computed from batch statistics (torch train mode); the reference never
consumes running averages (its discriminators never switch to eval mode),
so no running-stat state is carried — this keeps the GAN train step purely
functional.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pixel_heal_thyself_tpu.ops.bias import bias_add
from pixel_heal_thyself_tpu.ops.padding import pad2d
from pixel_heal_thyself_tpu.utils.init import (
    torch_default_bias_init,
    torch_default_kernel_init,
)

# A/B switch for the BASELINE.md round-5 norm-dtype measurement: True
# forces the Mamba norms (LayerNormTorch/RMSNormGated, models/mamba.py)
# onto their bit-exact fp32 paths even under bf16 compute — the
# pre-r4-snapshot numerics. BatchNorm2d/InstanceNorm2d below are ALWAYS
# fp32 (the bf16 form measured neutral and was reverted; BASELINE.md
# round-5 norm table). Not a config knob — flip only from measurement
# scripts (tools/bench_norm_dtype_ab.py).
_FORCE_FP32_NORM = False


class Conv(nn.Conv):
    """nn.Conv with TPU-minded lowering, param-compatible with nn.Conv.

    - 1×1/stride-1 convolutions lower to a plain matmul: XLA:TPU picks a
      batch-second-minor layout ({3,0,2,1}) for convolution operands while
      everything else in the model (including the Pallas attention
      custom-calls) lives in the default NHWC layout — every 1×1 conv
      then costs two full-tensor relayouts. A dot over the flattened
      pixels carries no layout preference, so the relayouts vanish.
    - The bias is applied through `bias_add`, whose backward computes db
      on the MXU instead of XLA's slow broadcast-add reduce_sum.

    Param shapes/names are identical to nn.Conv (kernel [kh,kw,Cin/g,F],
    bias [F]), keeping checkpoints and golden tests unchanged. Only the
    features this codebase uses are implemented (padding always "VALID" —
    ConvBlock pads explicitly; kernel dilation; feature groups).
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = tuple(
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else self.kernel_size,
        )
        strides = self.strides or (1, 1)
        if isinstance(strides, int):
            strides = (strides, strides)
        dilation = self.kernel_dilation or (1, 1)
        if isinstance(dilation, int):
            dilation = (dilation, dilation)
        assert self.padding in ("SAME", "VALID", ((0, 0), (0, 0))), self.padding
        padding = "VALID" if self.padding == ((0, 0), (0, 0)) else self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (*ks, cin // self.feature_group_count, self.features),
            self.param_dtype,
        )
        plain = (
            ks == (1, 1)
            and strides == (1, 1)
            and self.feature_group_count == 1
        )
        xc = x.astype(self.dtype)
        if plain:  # SAME == VALID for a 1×1/stride-1 kernel
            y = jnp.dot(
                xc, kernel[0, 0].astype(self.dtype),
                preferred_element_type=self.dtype,
            )
        else:
            y = jax.lax.conv_general_dilated(
                xc,
                kernel.astype(self.dtype),
                window_strides=strides,
                padding=padding,
                rhs_dilation=dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
            )
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype,
            )
            y = bias_add(y, bias.astype(self.dtype))
        return y


class BatchNorm2d(nn.Module):
    """Batch-statistics normalization with affine params (torch train mode)."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        # always the bit-exact fp32 normalize (the torch train-step
        # trajectory parity tests pin this arithmetic order). A bf16
        # compute-dtype normalize was A/B-measured NEUTRAL on the prod
        # bench (78.30 fp32 vs 78.18 bf16 — BASELINE.md round-5 norm
        # table): XLA fuses this chain either way, so the bf16 form saved
        # no HBM traffic and only cost precision (ADVICE r4).
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel spatial normalization (affine=False)."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        # always the bit-exact fp32 normalize (see BatchNorm2d)
        return ((xf - mean) / jnp.sqrt(var + self.eps)).astype(self.dtype)


def apply_act(x: jnp.ndarray, act_type: Optional[str], neg_slope: float = 0.2):
    if act_type is None:
        return x
    act_type = act_type.lower()
    if act_type == "relu":
        return nn.relu(x)
    if act_type == "leakyrelu":
        return nn.leaky_relu(x, negative_slope=neg_slope)
    raise NotImplementedError(f"Activation layer [{act_type}] is not found")


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch nn.PReLU)."""

    init_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param(
            "slope",
            lambda key, shape: jnp.full(shape, self.init_slope, jnp.float32),
            (1,),
        )
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ConvBlock(nn.Module):
    """Conv → optional norm → optional activation (reference conv_block).

    `pad_fn` (static, optional) replaces the local `pad2d` with a custom
    padding callable `(x, pad, mode) -> padded` — the sequence-sharded
    Mamba path injects a cross-device row-halo exchange here so every
    shard's convolution sees its true neighbor rows (parallel/sequence.py).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    padding_mode: str = "zeros"
    norm_type: Optional[str] = None
    act_type: Optional[str] = "relu"
    use_bias: bool = True
    groups: int = 1
    dtype: Any = jnp.float32
    pad_fn: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1] // self.groups
        pad = self.pad_fn if self.pad_fn is not None else pad2d
        x = pad(x, self.padding, self.padding_mode)
        x = Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.norm_type:
            nt = self.norm_type.lower()
            if nt == "batch":
                x = BatchNorm2d(dtype=self.dtype)(x)
            elif nt == "instance":
                x = InstanceNorm2d(dtype=self.dtype)(x)
            else:
                raise NotImplementedError(
                    f"Normalization layer [{nt}] is not found",
                )
        if self.act_type and self.act_type.lower() == "prelu":
            x = PReLU()(x)
        else:
            x = apply_act(x, self.act_type)
        return x
