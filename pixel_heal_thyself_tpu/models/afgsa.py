"""AFGSA windowed-attention denoiser (flax, NHWC, TPU-first).

Behavioral spec: reference `pht/models/afgsa/model.py` —
- AFGSA attention module (`model.py:401-524`): fuse noisy+aux features
  (1×1 conv over concat, or FiLM), project q/k from fused features and v
  from noisy features with bias-free kaiming-fan-out 1×1 convs, then
  block-halo attention with relative positional embeddings and optional
  space-filling-curve query ordering.
- TransformerBlock (`model.py:527-582`): residual attention + residual
  two-conv feed-forward, carrying the (noisy, aux) pair.
- AFGSANet (`model.py:585-733`): multi-scale (1/3/5) conv encoders for the
  noisy and aux branches, N transformer blocks (the last `num_gcp`
  gradient-checkpointed — here `jax.checkpoint`/nn.remat), 3-conv decoder,
  global residual to the noisy input.
- FiLM (`pht/models/afgsa/film.py:7-43`): cond → 1×1 conv → ReLU → 1×1
  conv → (γ, β); spatial (SPADE-like) or global-mean modulation.

TPU-first: everything is NHWC; attention runs through
`ops.attention.block_halo_attention` (XLA or fused Pallas kernel); compute
dtype is configurable (bf16 on the MXU by default in training) with fp32
params and fp32 softmax/accumulation.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.models.layers import Conv, ConvBlock, apply_act
from pixel_heal_thyself_tpu.ops.attention import block_halo_attention
from pixel_heal_thyself_tpu.ops.curves import (
    CurveOrder,
    inverse_permutation,
    make_curve_indices,
)
from pixel_heal_thyself_tpu.utils.init import (
    kaiming_normal_fan_out,
    normal_unit,
    torch_default_bias_init,
    torch_default_kernel_init,
)

# multi_scale_encode's folded path executes as an im2col matmul only up to
# this many output pixels — the [B,H,W,25·Cin] staging buffer is ~25× the
# encoder-input footprint, cheap at training-patch scale but a real HBM
# cost at full-frame inference (ADVICE r4). 256² covers every training and
# tiled-inference geometry in the configs; env override exists for the
# BASELINE.md round-5 im2col-vs-conv A/B (0 disables im2col entirely).
_IM2COL_MAX_PIXELS = int(os.environ.get("PHT_IM2COL_MAX_PIXELS", str(256 * 256)))


class FiLM(nn.Module):
    """Feature-wise linear modulation: x' = γ(cond) * x + β(cond)."""

    hidden: int = 128
    use_spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        h = Conv(
            self.hidden,
            (1, 1),
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(cond.shape[-1]),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(cond)
        h = nn.relu(h)
        gamma_beta = Conv(
            ch * 2,
            (1, 1),
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(self.hidden),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(h)
        if not self.use_spatial:
            gamma_beta = jnp.mean(gamma_beta, axis=(1, 2), keepdims=True)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        return gamma * x + beta


class _ProjKernel(nn.Module):
    """Bias-free 1×1 projection kernel holder.

    Declares the same `kernel` param (shape [1, 1, Cin, Cout], kaiming
    fan-out, fp32) at the same tree path a `Conv` submodule would, so
    checkpoints and golden tests are unchanged — but exposes the weight to
    the caller instead of applying it, letting the Pallas path fold all
    three q/k/v projections into the fused attention op."""

    features: int

    @nn.compact
    def __call__(self, cin: int) -> jnp.ndarray:
        return self.param(
            "kernel", kaiming_normal_fan_out, (1, 1, cin, self.features),
            jnp.float32,
        )


class _ConvParams(nn.Module):
    """Declares a `Conv`-compatible kernel+bias pair (same names, shapes,
    initializers → bit-identical init) and returns them instead of
    applying them — the `_ProjKernel` pattern with a bias."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin: int):
        ks = self.kernel_size
        kernel = self.param(
            "kernel",
            torch_default_kernel_init,
            (ks, ks, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias",
            torch_default_bias_init(ks * ks * cin),
            (self.features,),
            jnp.float32,
        )
        return kernel, bias


class _ConvBlockParams(nn.Module):
    """`ConvBlock`-compatible param holder: nests `_ConvParams` under the
    child name `Conv_0`, so the param tree path
    `<name>/Conv_0/{kernel,bias}` is identical to a real ConvBlock —
    checkpoints, torch imports, and golden tests see no difference."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, cin: int):
        return _ConvParams(self.features, self.kernel_size, name="Conv_0")(cin)


class _AFGSAParams(nn.Module):
    """`AFGSA`-compatible param holder for the whole-block megakernel
    path: declares the identical param tree (same child names, shapes,
    initializers → bit-identical init and checkpoint compatibility) and
    returns the raw weights for `ops.block_mega` instead of applying
    them. Mirrors AFGSA's declaration order exactly: n_aux ConvBlock_0,
    q/k/v projection kernels, rel_h/rel_w."""

    ch: int
    block_size: int
    halo_size: int
    num_heads: int

    @nn.compact
    def __call__(self, cin_cat: int, cin_noisy: int):
        window = self.block_size + 2 * self.halo_size
        head_ch = self.ch // self.num_heads
        wcat, bcat = _ConvBlockParams(self.ch, 1, name="ConvBlock_0")(cin_cat)
        wq = _ProjKernel(self.ch, name="q_conv")(self.ch)
        wk = _ProjKernel(self.ch, name="k_conv")(self.ch)
        wv = _ProjKernel(self.ch, name="v_conv")(cin_noisy)
        rel_h = self.param("rel_h", normal_unit, (window, head_ch // 2), jnp.float32)
        rel_w = self.param("rel_w", normal_unit, (window, head_ch // 2), jnp.float32)
        return wcat, bcat, wq, wk, wv, rel_h, rel_w


def multi_scale_encode(
    x: jnp.ndarray,
    features: int,
    slopes: tuple,
    padding_mode: str,
    fold: bool,
    dtype,
    name_offset: int,
    pad_fn=None,
) -> jnp.ndarray:
    """The reference's three parallel 1×1/3×3/5×5 encoder convs
    (`model.py:719-728`), with a TPU execution choice. Called from inside
    a parent module's `@nn.compact` body — the submodules it declares
    attach to the CALLER's scope under explicit `ConvBlock_<i>` names, so
    the param tree is byte-identical to the literal three-ConvBlock form
    in both modes (checkpoints, torch imports, goldens unchanged).

    - `fold=False`: three separate convs + concat (the literal form).
    - `fold=True`: ONE 5×5 convolution whose kernel is the three branch
      kernels embedded in zero-padded 5×5 envelopes, concatenated along
      the output channels. Numerically exact up to fp reassociation of
      the tap sum (measured ≤2.4e-7 through a full fp32 model): the
      embedded zeros contribute exact-zero products, and
      reflect/replicate/zero padding values at distance d don't depend
      on the total pad width — but the
      MXU sees one [5·5·Cin → 3·E] contraction instead of three
      channel-starved ones (Cin is 3 or 7 here — the profiled 4.5–21
      TF/s structurally low-MFU ops, BASELINE.md round-3 ceiling table),
      and the branch concat copy disappears.

    `slopes` are the per-branch leaky-relu negative slopes (0.0 = relu) —
    applied as one fused per-channel-group elementwise op in fold mode.

    `pad_fn` (optional) replaces `pad2d` like ConvBlock's pad_fn — the
    sequence-sharded Mamba path injects the cross-device row-halo
    exchange; its pad-2 rows are the true neighbor rows, whose inner ring
    equals the pad-1 rows, so the fold stays exact under halo padding.
    """
    from pixel_heal_thyself_tpu.ops.bias import bias_add
    from pixel_heal_thyself_tpu.ops.padding import pad2d

    e = features
    acts = ["relu" if s == 0.0 else "leakyrelu" for s in slopes]
    if not fold:
        branches = []
        for i, ksz in enumerate((1, 3, 5)):
            branches.append(
                ConvBlock(
                    e,
                    kernel_size=ksz,
                    padding=ksz // 2,
                    padding_mode=padding_mode,
                    act_type=acts[i],
                    dtype=dtype,
                    pad_fn=pad_fn,
                    name=f"ConvBlock_{name_offset + i}",
                )(x),
            )
        return jnp.concatenate(branches, axis=-1)

    cin = x.shape[-1]
    ks, bs = [], []
    for i, ksz in enumerate((1, 3, 5)):
        k, b = _ConvBlockParams(
            e, ksz, name=f"ConvBlock_{name_offset + i}",
        )(cin)
        ks.append(k)
        bs.append(b)
    kernel = jnp.concatenate(
        [
            jnp.pad(ks[0], ((2, 2), (2, 2), (0, 0), (0, 0))),
            jnp.pad(ks[1], ((1, 1), (1, 1), (0, 0), (0, 0))),
            ks[2],
        ],
        axis=-1,
    )
    bias = jnp.concatenate(bs)
    pad = pad_fn if pad_fn is not None else pad2d
    xp = pad(x, 2, padding_mode).astype(dtype)
    hgt, wdt = xp.shape[1] - 4, xp.shape[2] - 4
    if hgt * wdt <= _IM2COL_MAX_PIXELS:
        # Training-patch path: execute as an EXPLICIT im2col matmul rather
        # than a convolution. With Cin = 3 or 7 (≪ the 128-wide lane
        # tile), the conv's implicit window staging dominates — the folded
        # 7-ch conv profiled at 21 TF/s / 1.65 ms in the round-3 xplane
        # ceiling table's "structurally low-MFU" class (BASELINE.md; the
        # isolated A/B for THIS rewrite is the round-5 table). Staging the
        # 25 taps as channels is one fused slice-concat ([B,H,W,25·Cin]
        # bf16 — 25× the encoder-input footprint, why this path is gated
        # to patch-scale spatial sizes), and the contraction becomes a
        # dense [B·H·W, 25·Cin]×[25·Cin, 3E] matmul the MXU tiles at high
        # utilization. Tap order (ky-major, kx, channels) matches
        # kernel.reshape(25·Cin, 3E) exactly, so the result is the same
        # tap-sum as the conv up to fp reassociation.
        cols = jnp.concatenate(
            [
                xp[:, dy : dy + hgt, dx : dx + wdt, :]
                for dy in range(5)
                for dx in range(5)
            ],
            axis=-1,
        )
        y = jnp.dot(
            cols,
            kernel.astype(dtype).reshape(25 * cin, 3 * e),
            preferred_element_type=dtype,
        )
    else:
        # Full-frame path (ADVICE r4): above patch scale the im2col
        # staging buffer would cost ~25× the input activation in HBM —
        # run the fold as ONE 5×5 convolution (implicit windowing, no
        # staging buffer); same tap-sum, same params
        y = jax.lax.conv_general_dilated(
            xp,
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    y = bias_add(y, bias.astype(dtype))
    if all(s == slopes[0] for s in slopes):
        return apply_act(y, acts[0])
    slope_vec = jnp.repeat(
        jnp.asarray(slopes, dtype), e, total_repeat_length=3 * e,
    )
    return jnp.where(y >= 0, y, slope_vec * y)


class AFGSA(nn.Module):
    """Auxiliary-feature-guided self-attention module."""

    ch: int
    block_size: int = 8
    halo_size: int = 3
    num_heads: int = 4
    curve_order: CurveOrder = CurveOrder.RASTER
    use_film: bool = False
    use_pallas: bool = False
    # fold the q/k/v projections into the attention op (padded backward
    # matmuls). Measured NEUTRAL on the prod bench (72.8 vs 73.2 p/s:
    # pads −2.1 ms, convs +1.5 ms, loop fusions +0.7 ms — XLA already
    # fuses the unfused formulation this well; BASELINE.md negative
    # results), so off by default; kept as a tested opt-in variant.
    fold_qkv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, noisy: jnp.ndarray, aux: jnp.ndarray) -> jnp.ndarray:
        ch = self.ch
        assert ch % self.num_heads == 0, "ch should be divided by # heads"
        head_ch = ch // self.num_heads
        window = self.block_size + 2 * self.halo_size

        if self.use_film:
            n_aux = FiLM(hidden=128, use_spatial=True, dtype=self.dtype)(noisy, aux)
        else:
            n_aux = ConvBlock(
                ch,
                kernel_size=1,
                act_type="relu",
                dtype=self.dtype,
            )(jnp.concatenate([noisy, aux], axis=-1))

        # bias-free 1×1 projection kernels (reference model.py:473-485),
        # declared via _ProjKernel so the Pallas path can fold the
        # projections into the fused attention op (aligned backward
        # matmuls; see ops/attention_pallas.qkv_block_halo_attention_pallas)
        wq = _ProjKernel(ch, name="q_conv")(n_aux.shape[-1])
        wk = _ProjKernel(ch, name="k_conv")(n_aux.shape[-1])
        wv = _ProjKernel(ch, name="v_conv")(noisy.shape[-1])

        rel_h = self.param("rel_h", normal_unit, (window, head_ch // 2), jnp.float32)
        rel_w = self.param("rel_w", normal_unit, (window, head_ch // 2), jnp.float32)

        if self.use_pallas and self.fold_qkv and ch % 128 == 0:
            from pixel_heal_thyself_tpu.ops.attention_pallas import (
                qkv_block_halo_attention_pallas,
            )

            return qkv_block_halo_attention_pallas(
                n_aux, noisy, wq[0, 0], wk[0, 0], wv[0, 0], rel_h, rel_w,
                self.block_size, self.halo_size, self.num_heads,
            )

        def proj(x, w):
            # layers.Conv's plain 1×1 path (bias-free matmul)
            return jnp.dot(
                x.astype(self.dtype),
                w[0, 0].astype(self.dtype),
                preferred_element_type=self.dtype,
            )

        q = proj(n_aux, wq)
        k = proj(n_aux, wk)
        v = proj(noisy, wv)

        order = make_curve_indices(self.block_size, self.curve_order)
        inv = inverse_permutation(order)

        return block_halo_attention(
            q,
            k,
            v,
            rel_h,
            rel_w,
            jnp.asarray(order),
            jnp.asarray(inv),
            block_size=self.block_size,
            halo_size=self.halo_size,
            num_heads=self.num_heads,
            use_pallas=self.use_pallas,
        )


class TransformerBlock(nn.Module):
    """Residual attention + residual two-conv feed-forward.

    With `use_block_kernel`, the whole block runs as ONE fused Pallas op
    (`ops.block_mega`) on W-halo-PADDED images — the caller (AFGSANet)
    pads once before the block stack and unpads after. The param tree is
    identical to the literal form (declared via the `_AFGSAParams` /
    `_ConvBlockParams` holders), so checkpoints and torch imports are
    unchanged."""

    ch: int
    block_size: int = 8
    halo_size: int = 3
    num_heads: int = 4
    padding_mode: str = "reflect"
    curve_order: CurveOrder = CurveOrder.RASTER
    use_film: bool = False
    use_pallas: bool = False
    fold_qkv: bool = False
    use_block_kernel: bool = False
    mega_interpret: bool = False  # test-only: interpret-mode kernel on CPU
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, noisy: jnp.ndarray, aux: jnp.ndarray):
        if self.use_block_kernel:
            from pixel_heal_thyself_tpu.ops.block_mega import (
                transformer_block_mega_padded,
            )

            wcat, bcat, wq, wk, wv, rel_h, rel_w = _AFGSAParams(
                self.ch, self.block_size, self.halo_size, self.num_heads,
                name="attention",
            )(noisy.shape[-1] + aux.shape[-1], noisy.shape[-1])
            w1, b1 = _ConvBlockParams(self.ch, 3, name="ConvBlock_0")(self.ch)
            w2, b2 = _ConvBlockParams(self.ch, 3, name="ConvBlock_1")(self.ch)
            out = transformer_block_mega_padded(
                noisy.astype(self.dtype), aux.astype(self.dtype),
                wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
                block_size=self.block_size, halo_size=self.halo_size,
                num_heads=self.num_heads, padding_mode=self.padding_mode,
                interpret=self.mega_interpret,
            )
            return out, aux

        noisy = noisy + AFGSA(
            ch=self.ch,
            block_size=self.block_size,
            halo_size=self.halo_size,
            num_heads=self.num_heads,
            curve_order=self.curve_order,
            use_film=self.use_film,
            use_pallas=self.use_pallas,
            fold_qkv=self.fold_qkv,
            dtype=self.dtype,
            name="attention",
        )(noisy, aux)
        ff = ConvBlock(
            self.ch,
            kernel_size=3,
            padding=1,
            padding_mode=self.padding_mode,
            act_type="relu",
            dtype=self.dtype,
        )(noisy)
        ff = ConvBlock(
            self.ch,
            kernel_size=3,
            padding=1,
            padding_mode=self.padding_mode,
            act_type="relu",
            dtype=self.dtype,
        )(ff)
        return noisy + ff, aux


class AFGSANet(nn.Module):
    """The AFGSA generator: multi-scale encoders → N transformer blocks →
    decoder with a global residual."""

    input_channels: int = 3
    aux_input_channels: int = 7
    base_ch: int = 256
    num_sa: int = 5
    block_size: int = 8
    halo_size: int = 3
    num_heads: int = 4
    num_gcp: int = 2
    padding_mode: str = "reflect"
    curve_order: CurveOrder = CurveOrder.RASTER
    use_film: bool = False
    use_pallas: bool = False
    fold_qkv: bool = False
    # whole-TransformerBlock megakernel (ops/block_mega.py): one fused
    # Pallas op per block, blocks chained in W-halo-padded form. Falls
    # back to the literal path when the geometry/dtype is unsupported.
    use_block_kernel: bool = False
    mega_interpret: bool = False
    enc_ch: int = 256
    # execute each 3-branch encoder as one folded 5×5 conv (numerically
    # exact — see multi_scale_encode); flip off to get the literal form
    fold_encoder: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, aux: jnp.ndarray) -> jnp.ndarray:
        assert self.num_gcp <= self.num_sa
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        aux = aux.astype(self.dtype)
        cb = partial(ConvBlock, dtype=self.dtype)

        # all ConvBlocks are explicitly named with their historical
        # auto-names: multi_scale_encode declares ConvBlock_{0..2}/{4..6}
        # itself (folded or literal — same tree), and flax forbids mixing
        # explicit names with the auto counter
        n_cat = multi_scale_encode(
            x, self.enc_ch, (0.0, 0.0, 0.0), self.padding_mode,
            self.fold_encoder, self.dtype, name_offset=0,
        )
        out = cb(
            self.base_ch, kernel_size=1, act_type="relu", name="ConvBlock_3",
        )(n_cat)

        a_cat = multi_scale_encode(
            aux, self.enc_ch, (0.0, 0.2, 0.2), self.padding_mode,
            self.fold_encoder, self.dtype, name_offset=4,
        )
        a = cb(
            self.base_ch, kernel_size=1, act_type="leakyrelu",
            name="ConvBlock_7",
        )(a_cat)
        a = cb(
            self.base_ch, kernel_size=1, act_type="leakyrelu",
            name="ConvBlock_8",
        )(a)

        use_mega = self.use_block_kernel and not self.use_film
        if use_mega:
            from pixel_heal_thyself_tpu.ops import block_mega

            use_mega = block_mega.supports_shapes(
                out.shape[0], out.shape[1], out.shape[2], self.base_ch,
                block_size=self.block_size, halo_size=self.halo_size,
                num_heads=self.num_heads, dtype=self.dtype,
            )
        if use_mega:
            # chain the blocks in W-halo-padded form: one pad before the
            # stack, one unpad after — the per-block pad/unpad passes of
            # the literal path disappear (ops/block_mega layout contract)
            wdt = out.shape[2]
            out = block_mega.pad_w_halo(
                out.astype(self.dtype), self.halo_size,
            )
            a = block_mega.pad_w_halo(a.astype(self.dtype), self.halo_size)

        for i in range(1, self.num_sa + 1):
            block_cls = TransformerBlock
            # gradient-checkpoint (remat) the last num_gcp blocks
            # (reference model.py:662-687 via torch.utils.checkpoint)
            if i > self.num_sa - self.num_gcp:
                block_cls = nn.remat(TransformerBlock)
            out, a = block_cls(
                ch=self.base_ch,
                block_size=self.block_size,
                halo_size=self.halo_size,
                num_heads=self.num_heads,
                padding_mode=self.padding_mode,
                curve_order=self.curve_order,
                use_film=self.use_film,
                use_pallas=self.use_pallas,
                fold_qkv=self.fold_qkv,
                use_block_kernel=use_mega,
                mega_interpret=self.mega_interpret,
                dtype=self.dtype,
            )(out, a)

        if use_mega:
            out = block_mega.unpad_w_halo(out, wdt, self.halo_size)
            a = block_mega.unpad_w_halo(a, wdt, self.halo_size)

        out = cb(
            self.base_ch,
            kernel_size=3,
            padding=1,
            padding_mode=self.padding_mode,
            act_type="relu",
            name="ConvBlock_9",
        )(out)
        out = cb(
            self.base_ch,
            kernel_size=3,
            padding=1,
            padding_mode=self.padding_mode,
            act_type="relu",
            name="ConvBlock_10",
        )(out)
        out = cb(
            self.input_channels,
            kernel_size=3,
            padding=1,
            padding_mode="zeros",
            act_type=None,
            name="ConvBlock_11",
        )(out)
        # global residual in fp32
        return out.astype(jnp.float32) + x.astype(jnp.float32)


def count_params(params) -> int:
    """Total parameter count (reference print_model_structure analog)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def describe_params(params, logger=None) -> str:
    """Parameter table at DEBUG level (reference `model.py:19-49`)."""
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, p in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        n = int(np.prod(p.shape))
        total += n
        lines.append(f"| {name:<50} | {str(p.shape):<24} | {n:<10} |")
    lines.append(f"Total number of parameters: {total}")
    text = "\n".join(lines)
    if logger is not None:
        logger.debug(text)
    return text
