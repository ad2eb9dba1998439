"""Mamba2 state-space denoiser (flax, NHWC, TPU-first).

Behavioral spec: reference `pht/models/mamba/model.py` —
- MambaBlock (:38-98): LayerNorm → flatten NCHW→(B, H·W, C) raster scan →
  Mamba2 → residual; then a residual two-conv FFN. The aux branch is
  encoded but not consumed by the block (reference quirk, `model.py:83` —
  preserved).
- MambaDenoiserNet (:101-238): the same multi-scale conv encoder/aux
  encoder/decoder skeleton as AFGSANet, with a sinusoidal 2-D positional
  encoding added after encoding and Mamba blocks in the middle;
  `decoder(out) + noisy` residual. Quirk preserved: the reference's
  `mm_conv_block` (:14-35) has no no-activation path, so the final
  decoder conv's `act_type=None` actually applies LeakyReLU(0.2) to the
  RGB output before the residual.
- PositionalEncoding2D (:296-324): even channels sin(y·ω), odd cos(x·ω).

The Mamba2 layer itself follows the Mamba2 architecture (Dao & Gu 2024)
that `mamba_ssm.Mamba2` implements: in_proj → (z, x, B, C, dt); causal
depthwise conv over (x, B, C); SiLU; scalar-per-head SSD scan
(`ops/ssd.py`, chunked matmul form on the MXU); gated RMSNorm; out_proj.
Defaults d_state=64, d_conv=4, expand=4, headdim=64 match the reference
config (`config/model/mamba.yaml`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.models.layers import ConvBlock
from pixel_heal_thyself_tpu.ops import conv_pallas
from pixel_heal_thyself_tpu.ops.conv import causal_depthwise_conv1d
from pixel_heal_thyself_tpu.ops.padding import make_row_halo_pad
from pixel_heal_thyself_tpu.ops import ssd_mega
from pixel_heal_thyself_tpu.ops.ssd import ssd_chunked, ssd_sharded
from pixel_heal_thyself_tpu.utils.init import (
    torch_default_bias_init,
    torch_default_kernel_init,
)


class RMSNormGated(nn.Module):
    """RMSNorm(x * silu(z)) with learned scale — Mamba2's gated norm."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        x = x * jax.nn.silu(z)
        xf = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(xf**2, axis=-1, keepdims=True) + self.eps)
        from pixel_heal_thyself_tpu.models import layers as _layers

        if x.dtype == jnp.float32 or _layers._FORCE_FP32_NORM:
            return xf * rms * weight
        # bf16 compute: the mean-square reduction stays fp32 (a fused
        # reduce — XLA never materializes xf), but the full-width scale
        # multiply runs in the compute dtype. [b, l, d_inner] here is the
        # largest activation in the model (BASELINE.md Mamba ceiling
        # table: the loop-fusion tail is HBM-bound) — same pattern as
        # layers.BatchNorm2d's compute-dtype normalize.
        return x * (rms.astype(x.dtype) * weight.astype(x.dtype))


class _RMSNormWeight(nn.Module):
    """Param holder declaring RMSNormGated's `weight` at the same tree
    path (`<name>/weight`, ones-init fp32) without applying it — the
    megakernel path consumes the weight inside the fused op while
    checkpoints/imports see an identical tree (the _ProjKernel pattern,
    models/afgsa.py)."""

    @nn.compact
    def __call__(self, d: int) -> jnp.ndarray:
        return self.param("weight", nn.initializers.ones, (d,), jnp.float32)


class Mamba2Layer(nn.Module):
    """Sequence mixer: [B, L, D] → [B, L, D].

    `seq_axis` (static, optional): name of a `shard_map` mesh axis over
    which the token sequence is sharded contiguously. When set, the causal
    conv1d receives the previous shard's tail tokens over ICI and the SSD
    scan chains its state across devices (`ops/ssd.ssd_sharded`), making
    the sharded layer exactly equal to the unsharded one — the
    sequence-parallel full-frame inference path (parallel/sequence.py)."""

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 4
    headdim: int = 64
    ngroups: int = 1
    chunk_size: int = 128
    dt_min: float = 0.001
    dt_max: float = 0.1
    A_init_range: tuple = (1.0, 16.0)
    dtype: Any = jnp.float32
    seq_axis: str | None = None
    # fuse the xBC-slice → causal conv1d → SiLU prologue into one Pallas
    # kernel (ops/conv_pallas.py) — TPU only, single-device path
    use_pallas: bool = False
    # fuse the ENTIRE layer interior (conv1d+SiLU, dt softplus, SSD scan,
    # D skip, gated RMSNorm) into the ops/ssd_mega.py megakernel — TPU
    # only, single-device path; falls back when shapes don't qualify
    use_megakernel: bool = False

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        d_inner = self.expand * self.d_model
        nheads = d_inner // self.headdim
        assert d_inner % self.headdim == 0
        conv_dim = d_inner + 2 * self.ngroups * self.d_state
        b, l, _ = u.shape

        zxbcdt = nn.Dense(
            2 * d_inner + 2 * self.ngroups * self.d_state + nheads,
            use_bias=False,
            kernel_init=torch_default_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="in_proj",
        )(u.astype(self.dtype))
        z = zxbcdt[..., :d_inner]
        dt_raw = zxbcdt[..., d_inner + conv_dim:]

        conv_w = self.param(
            "conv1d_weight",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32,
                -1.0 / math.sqrt(self.d_conv), 1.0 / math.sqrt(self.d_conv),
            ),
            (self.d_conv, conv_dim),
        )
        conv_b = self.param(
            "conv1d_bias",
            torch_default_bias_init(self.d_conv),
            (conv_dim,),
            jnp.float32,
        )

        # dt bias: inverse-softplus of log-uniform[dt_min, dt_max]
        def dt_bias_init(key, shape):
            r = jax.random.uniform(key, shape, jnp.float32)
            dt = jnp.exp(
                r * (math.log(self.dt_max) - math.log(self.dt_min))
                + math.log(self.dt_min),
            )
            dt = jnp.clip(dt, 1e-4, None)
            return dt + jnp.log(-jnp.expm1(-dt))

        dt_bias = self.param("dt_bias", dt_bias_init, (nheads,))

        def A_log_init(key, shape):
            lo, hi = self.A_init_range
            return jnp.log(jax.random.uniform(key, shape, jnp.float32, lo, hi))

        A_log = self.param("A_log", A_log_init, (nheads,))
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (nheads,), jnp.float32)

        if (
            self.use_megakernel
            and self.seq_axis is None
            and jax.default_backend() not in ("cpu", "gpu")
            and ssd_mega.supports_shapes(
                l, d_inner, self.ngroups, self.d_state, self.headdim,
                self.d_conv, self.chunk_size,
            )
        ):
            norm_w = _RMSNormWeight(name="norm")(d_inner)
            y = ssd_mega.fused_mamba_chain(
                zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w,
                d_inner, self.ngroups * self.d_state, self.headdim,
                self.chunk_size,
            )
            return nn.Dense(
                self.d_model,
                use_bias=False,
                kernel_init=torch_default_kernel_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="out_proj",
            )(y)

        if self.seq_axis is not None and self.d_conv > 1:
            # exact cross-shard conv context: previous shard's last k-1
            # tokens; shard 0 receives zeros from the non-cyclic ppermute —
            # precisely the global causal zero pad
            xBC = zxbcdt[..., d_inner:d_inner + conv_dim]
            n_sh = jax.lax.axis_size(self.seq_axis)
            prev_tail = jax.lax.ppermute(
                xBC[:, -(self.d_conv - 1):],
                self.seq_axis,
                [(i, i + 1) for i in range(n_sh - 1)],
            )
            xBC = jax.nn.silu(
                causal_depthwise_conv1d(
                    xBC, conv_w, conv_b, initial_tokens=prev_tail,
                ),
            )
        elif self.use_pallas and conv_pallas.supports_shapes(
            l, d_inner, conv_dim, self.d_conv, conv_pallas._pick_l_tile(l),
        ):
            xBC = conv_pallas.fused_causal_conv1d_silu(
                zxbcdt, conv_w, conv_b, d_inner, conv_dim,
            )
        else:
            xBC = jax.nn.silu(
                causal_depthwise_conv1d(
                    zxbcdt[..., d_inner:d_inner + conv_dim], conv_w, conv_b,
                ),
            )
        x, B, C = jnp.split(
            xBC,
            [d_inner, d_inner + self.ngroups * self.d_state],
            axis=-1,
        )

        dt = jax.nn.softplus(
            dt_raw.astype(jnp.float32) + dt_bias,
        )  # [b, l, nheads]

        ssd = (
            partial(ssd_sharded, axis_name=self.seq_axis)
            if self.seq_axis is not None
            else ssd_chunked
        )
        y = ssd(
            x.reshape(b, l, nheads, self.headdim),
            dt.astype(self.dtype),
            A.astype(self.dtype),
            B.reshape(b, l, self.ngroups, self.d_state),
            C.reshape(b, l, self.ngroups, self.d_state),
            D.astype(self.dtype),
            chunk=self.chunk_size,
        ).reshape(b, l, d_inner)

        y = RMSNormGated(name="norm")(y, z)
        return nn.Dense(
            self.d_model,
            use_bias=False,
            kernel_init=torch_default_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out_proj",
        )(y)


class LayerNormTorch(nn.Module):
    """torch nn.LayerNorm parity (elementwise affine, eps 1e-5)."""

    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        from pixel_heal_thyself_tpu.models import layers as _layers

        if self.dtype == jnp.float32 or _layers._FORCE_FP32_NORM:
            y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
            return y * scale + bias
        # bf16 compute: per-token stats stay fp32 ([b, l, 1] reductions)
        # and — critically — so does the (x - mean) subtraction: rewriting
        # it as x·inv − mean·inv in bf16 cancels catastrophically when
        # |mean| ≫ σ (error ∝ (|mean|/σ)·2⁻⁹; ADVICE r4, pinned by
        # tests/test_norm_dtypes.py). XLA fuses the fp32 subtract into the
        # same elementwise chain, so no [b, l, d] fp32 tensor is
        # materialized in HBM either way; only the affine output runs in
        # the compute dtype.
        inv = jax.lax.rsqrt(var + self.eps)
        xn = ((xf - mean) * inv).astype(self.dtype)
        return xn * scale.astype(self.dtype) + bias.astype(self.dtype)


class MambaBlock(nn.Module):
    """LayerNorm → raster-scan Mamba2 → residual → residual conv FFN.

    `seq_axis`/`pad_fn`: sequence-sharded mode (see MambaDenoiserNet)."""

    ch: int
    d_state: int = 64
    d_conv: int = 4
    expansion: int = 4
    headdim: int = 64
    padding_mode: str = "reflect"
    dtype: Any = jnp.float32
    seq_axis: str | None = None
    pad_fn: Any = None
    use_pallas: bool = False
    use_megakernel: bool = False

    @nn.compact
    def __call__(self, noisy: jnp.ndarray, aux: jnp.ndarray):
        b, h, w, c = noisy.shape
        flat = noisy.reshape(b, h * w, c)
        normed = LayerNormTorch(dtype=self.dtype, name="norm1")(flat)
        mixed = Mamba2Layer(
            d_model=c,
            d_state=self.d_state,
            d_conv=self.d_conv,
            expand=self.expansion,
            headdim=self.headdim,
            dtype=self.dtype,
            seq_axis=self.seq_axis,
            use_pallas=self.use_pallas,
            use_megakernel=self.use_megakernel,
            name="mamba",
        )(normed)
        noisy = noisy + mixed.reshape(b, h, w, c)
        ff = ConvBlock(
            self.ch, kernel_size=3, padding=1,
            padding_mode=self.padding_mode, act_type="relu", dtype=self.dtype,
            pad_fn=self.pad_fn,
        )(noisy)
        ff = ConvBlock(
            self.ch, kernel_size=3, padding=1,
            padding_mode=self.padding_mode, act_type="relu", dtype=self.dtype,
            pad_fn=self.pad_fn,
        )(ff)
        return noisy + ff, aux


def positional_encoding_2d(channels: int, height: int, width: int) -> np.ndarray:
    """Sinusoidal 2-D encoding (reference `mamba/model.py:296-324`):
    even channels sin(y·ω_k), odd channels cos(x·ω_k)."""
    pe = np.zeros((channels, height, width), np.float32)
    y_pos = np.repeat(np.arange(height)[:, None], width, axis=1)
    x_pos = np.repeat(np.arange(width)[None, :], height, axis=0)
    div = np.exp(np.arange(0, channels, 2) * -(math.log(10000.0) / channels))
    pe[0::2] = np.sin(y_pos[None, :, :] * div[:, None, None])
    pe[1::2] = np.cos(x_pos[None, :, :] * div[: channels // 2, None, None])
    return pe.transpose(1, 2, 0)  # HWC


class MambaDenoiserNet(nn.Module):
    """Multi-scale conv encoders + positional encoding + Mamba blocks +
    decoder with global residual."""

    input_channels: int = 3
    aux_input_channels: int = 7
    base_ch: int = 256
    height: int = 128
    width: int = 128
    num_blocks: int = 5
    d_state: int = 64
    d_conv: int = 4
    expansion: int = 4
    headdim: int = 64
    num_gcp: int = 2
    padding_mode: str = "reflect"
    enc_ch: int = 256
    dtype: Any = jnp.float32
    seq_axis: str | None = None
    use_pallas: bool = False
    use_megakernel: bool = False

    @nn.compact
    def __call__(self, noisy: jnp.ndarray, aux: jnp.ndarray) -> jnp.ndarray:
        assert self.num_gcp <= self.num_blocks
        x_in = noisy
        noisy = noisy.astype(self.dtype)
        aux = aux.astype(self.dtype)
        # sequence-sharded mode: every padded conv exchanges row halos with
        # neighbor devices instead of locally padding shard-interior edges,
        # so the rows-sharded full-frame apply is exactly the unsharded one
        pad_fn = (
            make_row_halo_pad(self.seq_axis)
            if self.seq_axis is not None
            else None
        )
        cb = partial(ConvBlock, dtype=self.dtype, pad_fn=pad_fn)

        n1 = cb(self.enc_ch, kernel_size=1, act_type="relu")(noisy)
        n3 = cb(
            self.enc_ch, kernel_size=3, padding=1,
            padding_mode=self.padding_mode, act_type="relu",
        )(noisy)
        n5 = cb(
            self.enc_ch, kernel_size=5, padding=2,
            padding_mode=self.padding_mode, act_type="relu",
        )(noisy)
        out = cb(self.base_ch, kernel_size=1, act_type="relu")(
            jnp.concatenate([n1, n3, n5], axis=-1),
        )

        if self.seq_axis is not None:
            # each shard adds its slice of the GLOBAL positional encoding
            n_sh = jax.lax.axis_size(self.seq_axis)
            local_h = out.shape[1]
            pe = positional_encoding_2d(
                self.base_ch, local_h * n_sh, out.shape[2],
            )
            pe = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(pe, self.dtype),
                jax.lax.axis_index(self.seq_axis) * local_h,
                local_h,
                axis=0,
            )
            out = out + pe[None]
        else:
            pe = positional_encoding_2d(self.base_ch, out.shape[1], out.shape[2])
            out = out + jnp.asarray(pe, self.dtype)[None]

        a1 = cb(self.enc_ch, kernel_size=1, act_type="relu")(aux)
        a3 = cb(
            self.enc_ch, kernel_size=3, padding=1,
            padding_mode=self.padding_mode, act_type="leakyrelu",
        )(aux)
        a5 = cb(
            self.enc_ch, kernel_size=5, padding=2,
            padding_mode=self.padding_mode, act_type="leakyrelu",
        )(aux)
        a = cb(self.base_ch, kernel_size=1, act_type="leakyrelu")(
            jnp.concatenate([a1, a3, a5], axis=-1),
        )
        a = cb(self.base_ch, kernel_size=1, act_type="leakyrelu")(a)

        for i in range(1, self.num_blocks + 1):
            block_cls = MambaBlock
            if i > self.num_blocks - self.num_gcp:
                block_cls = nn.remat(MambaBlock)
            out, a = block_cls(
                ch=self.base_ch,
                d_state=self.d_state,
                d_conv=self.d_conv,
                expansion=self.expansion,
                headdim=self.headdim,
                padding_mode=self.padding_mode,
                dtype=self.dtype,
                seq_axis=self.seq_axis,
                pad_fn=pad_fn,
                use_pallas=self.use_pallas,
                use_megakernel=self.use_megakernel,
            )(out, a)

        out = cb(
            self.base_ch, kernel_size=3, padding=1,
            padding_mode=self.padding_mode, act_type="relu",
        )(out)
        out = cb(
            self.base_ch, kernel_size=3, padding=1,
            padding_mode=self.padding_mode, act_type="relu",
        )(out)
        # reference quirk (preserved): mm_conv_block has NO no-activation
        # path — `act_type=None` falls into its else branch and appends
        # LeakyReLU(0.2) (`mamba/model.py:34`), so the final decoder conv's
        # 3-channel output is leaky-rectified BEFORE the global residual
        # (`mamba/model.py:206-213,238`). Discovered by the checkpoint
        # importer's e2e forward comparison (tests/test_torch_import.py).
        out = cb(
            self.input_channels, kernel_size=3, padding=1,
            padding_mode="zeros", act_type="leakyrelu",
        )(out)
        return out.astype(jnp.float32) + x_in.astype(jnp.float32)
