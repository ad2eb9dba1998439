"""Discriminators: VGG-style classifier and spectral-norm PatchGAN stack.

Behavioral spec:
- DiscriminatorVGG (reference `pht/models/afgsa/model.py:264-344`):
  patch-size-parametric VGG-style classifier — log2(input/4) downsample
  stages of (3×3 s1 conv + 4×4 s2 conv, BatchNorm, LeakyReLU), then
  Linear(flat→100) → LeakyReLU → Linear(100→1).
- PatchDiscriminator / MultiScaleDiscriminator (reference
  `pht/models/afgsa/discriminators.py:8-63`): spectral-norm 70×70-style
  PatchGAN whose depth keeps the final map ≥4×4, wrapped at three scales
  (x, x/2, x/4 via average pooling) returning a list of patch logits.

- DiscriminatorVGG128 (reference `pht/models/afgsa/model.py:128-261`):
  fixed-128-input VGG-D classifier — conv0 3×3 unnormed, then four
  (4×4 s2 same-ch, 3×3 s1 double-ch) pairs capped at base_nf·8 plus a
  final same-ch pair, Linear(512·4·4→100) → LeakyReLU → Linear(100→1).
  Dead code in the reference (never instantiated); implemented for full
  component-inventory coverage.
- PatchGANDiscriminator (reference `pht/models/mamba/model.py:241-293`):
  plain BatchNorm 70×70 PatchGAN (4 downs at stride 2,2,2,1 then a 1-ch
  4×4 head). Also dead code in the reference; implemented for coverage.

Spectral norm carries its power-iteration vector in a mutable 'spectral'
variable collection; it updates only when the caller marks that collection
mutable (the train step does, eval doesn't) — torch parity where the u
buffer updates during training forwards.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.models.layers import ConvBlock, apply_act, bias_add
from pixel_heal_thyself_tpu.utils.init import (
    torch_default_bias_init,
    torch_default_kernel_init,
)


class DiscriminatorVGG(nn.Module):
    in_nc: int = 3
    base_nf: int = 64
    input_size: int = 128
    norm_type: str = "batch"
    act_type: str = "leakyrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        num_downsample = int(np.log2(self.input_size / 4))

        x = ConvBlock(
            self.base_nf,
            kernel_size=3,
            padding=1,
            norm_type=None,
            act_type=self.act_type,
            dtype=self.dtype,
        )(x)
        for i in range(num_downsample):
            next_nf = min(self.base_nf * (2 ** (i + 1)), self.base_nf * 8)
            x = ConvBlock(
                next_nf,
                kernel_size=3,
                stride=1,
                padding=1,
                norm_type=self.norm_type,
                act_type=self.act_type,
                dtype=self.dtype,
            )(x)
            x = ConvBlock(
                next_nf,
                kernel_size=4,
                stride=2,
                padding=1,
                norm_type=self.norm_type,
                act_type=self.act_type,
                dtype=self.dtype,
            )(x)

        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(
            100,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = apply_act(x, "leakyrelu")
        x = nn.Dense(
            1,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(100),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return x.astype(jnp.float32)


class DiscriminatorVGG128(nn.Module):
    """Fixed-128-input VGG classifier (reference `model.py:128-261`).

    Differs from the parametric DiscriminatorVGG in its channel schedule:
    the first 4×4 s2 conv keeps base_nf (the parametric one doubles
    immediately) and the deepest stage repeats base_nf·8 once more.
    """

    in_nc: int = 3
    base_nf: int = 64
    norm_type: str = "batch"
    act_type: str = "leakyrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = ConvBlock(
            self.base_nf,
            kernel_size=3,
            padding=1,
            norm_type=None,
            act_type=self.act_type,
            dtype=self.dtype,
        )(x)
        # (4×4 s2 same-ch, 3×3 s1 next-ch) pairs: 64→64,128→128,256→256,
        # 512→512,512 — reference conv1..conv9
        stage_nf = [
            self.base_nf,
            self.base_nf * 2,
            self.base_nf * 2,
            self.base_nf * 4,
            self.base_nf * 4,
            self.base_nf * 8,
            self.base_nf * 8,
            self.base_nf * 8,
            self.base_nf * 8,
        ]
        for i, nf in enumerate(stage_nf):
            x = ConvBlock(
                nf,
                kernel_size=4 if i % 2 == 0 else 3,
                stride=2 if i % 2 == 0 else 1,
                padding=1,
                norm_type=self.norm_type,
                act_type=self.act_type,
                dtype=self.dtype,
            )(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(
            100,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(x.shape[-1]),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = apply_act(x, "leakyrelu")
        x = nn.Dense(
            1,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(100),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return x.astype(jnp.float32)


class PatchGANDiscriminator(nn.Module):
    """Plain BatchNorm PatchGAN (reference `mamba/model.py:241-293`):
    4×4 convs at strides 2,2,2,1 (64→128→256→512, BN on all but the
    first) then an unnormed 1-channel 4×4 s1 head."""

    in_nc: int = 3
    base_nf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = ConvBlock(
            self.base_nf,
            kernel_size=4,
            stride=2,
            padding=1,
            norm_type=None,
            act_type="leakyrelu",
            dtype=self.dtype,
        )(x)
        for nf, stride in (
            (self.base_nf * 2, 2),
            (self.base_nf * 4, 2),
            (self.base_nf * 8, 1),
        ):
            x = ConvBlock(
                nf,
                kernel_size=4,
                stride=stride,
                padding=1,
                norm_type="batch",
                act_type="leakyrelu",
                dtype=self.dtype,
            )(x)
        x = ConvBlock(
            1,
            kernel_size=4,
            stride=1,
            padding=1,
            norm_type=None,
            act_type=None,
            dtype=self.dtype,
        )(x)
        return x.astype(jnp.float32)


class SNConv(nn.Module):
    """Conv2d wrapped in spectral normalization (torch `spectral_norm`).

    One power iteration per call; the u vector persists in the 'spectral'
    collection and updates only when that collection is mutable.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh = kw = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = kh * kw * in_ch
        kernel = self.param(
            "kernel",
            torch_default_kernel_init,
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            torch_default_bias_init(fan_in),
            (self.features,),
            jnp.float32,
        )
        # torch reshapes the OIHW weight to (out, in*kh*kw)
        w = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)

        def init_u():
            key = jax.random.PRNGKey(0)
            u0 = jax.random.normal(key, (self.features,), jnp.float32)
            return u0 / jnp.maximum(jnp.linalg.norm(u0), self.eps)

        u_var = self.variable("spectral", "u", init_u)

        def normalize(a):
            return a / jnp.maximum(jnp.linalg.norm(a), self.eps)

        u = jax.lax.stop_gradient(u_var.value)
        v = normalize(w.T @ u)
        u_new = normalize(w @ v)
        v = jax.lax.stop_gradient(v)
        u_new = jax.lax.stop_gradient(u_new)
        if self.is_mutable_collection("spectral") and not self.is_initializing():
            u_var.value = u_new
        sigma = u_new @ (w @ v)
        w_hat = (kernel / sigma).astype(self.dtype)

        xp = jnp.pad(
            x.astype(self.dtype),
            ((0, 0), (self.padding, self.padding), (self.padding, self.padding), (0, 0)),
        )
        y = jax.lax.conv_general_dilated(
            xp,
            w_hat,
            window_strides=(self.stride, self.stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return bias_add(y, bias.astype(self.dtype))


class PatchDiscriminator(nn.Module):
    """Spectral-norm PatchGAN; depth keeps the final feature map ≥ min_feat."""

    in_nc: int = 3
    base_nf: int = 64
    input_size: int = 128
    min_feat: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nf_out = self.base_nf
        cur_size = self.input_size
        while cur_size // 2 >= self.min_feat:
            x = SNConv(nf_out, kernel_size=4, stride=2, padding=1, dtype=self.dtype)(x)
            x = apply_act(x, "leakyrelu")
            nf_out = min(nf_out * 2, self.base_nf * 8)
            cur_size //= 2
        x = SNConv(1, kernel_size=4, stride=1, padding=1, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class MultiScaleDiscriminator(nn.Module):
    """Three PatchGANs over (x, x/2, x/4) average-pooled inputs."""

    in_nc: int = 3
    patch_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        x = x.astype(self.dtype)
        d1 = PatchDiscriminator(
            self.in_nc, input_size=self.patch_size, dtype=self.dtype, name="D1",
        )(x)
        x2 = nn.avg_pool(x, (2, 2), strides=(2, 2))
        d2 = PatchDiscriminator(
            self.in_nc, input_size=self.patch_size // 2, dtype=self.dtype, name="D2",
        )(x2)
        x4 = nn.avg_pool(x, (4, 4), strides=(4, 4))
        d3 = PatchDiscriminator(
            self.in_nc, input_size=self.patch_size // 4, dtype=self.dtype, name="D3",
        )(x4)
        return [d1, d2, d3]
