"""Fused whole-TransformerBlock Pallas TPU kernel (the AFGSA megakernel).

One custom-call boundary per transformer block instead of per stage: the
full block interior — the n_aux 1×1 ConvBlock (concat → matmul → bias →
ReLU), the q/k/v projections, block-halo attention (the existing
`ops/attention_pallas.py` math, verbatim), the attention residual, and
the two 3×3 reflect/replicate/zero-padded FFN ConvBlocks with their
second residual — runs per batch element inside one VMEM residency
(reference behavior: `pht/models/afgsa/model.py:519-542` TransformerBlock
= AFGSA + two conv_blocks with skips; `model.py:456-516` the attention).

This is the AFGSA analog of the Mamba SSD megakernel (`ops/ssd_mega.py`,
BASELINE.md round 5): the rounds-2/3 lesson says narrow Pallas fusions
lose to XLA, but fusing a layer's ENTIRE inter-matmul interior wins as
much HBM traffic as it internalizes. Per block the XLA chain makes ~10
full-activation HBM round trips (n_aux, q, k, v, two pads, the attention
custom-call I/O, two conv I/Os, two residual adds); the megakernel reads
noisy+aux once and writes the block output once.

Layout contract (what makes the windowing and the convs coexist):

- Images flow between blocks W-HALO-PADDED: [B, H, Wpp, C] with the real
  frame at columns [halo, halo+W) and Wpp = round8(W + 2·halo). Putting
  the interior at column `halo` (≡ 3 mod 8 for the prod halo) makes every
  attention window slice land on an 8-aligned sublane offset (window bx
  starts at column bx·bs exactly like `ops/attention_pallas.py`), and
  chaining blocks in padded form deletes the per-block pad/unpad passes
  entirely — only the first block pads and the last unpads.
- In-kernel image buffers carry a 4-row top/bottom margin (rows are the
  untiled dim of a [rows, Wpp, C] ref, so margin row offsets are free):
  attention needs 3 halo rows (zero-filled, like the stripe DMA of the
  attention kernel), the convs need 1 padding row.
- The ±1 column taps of the 3×3 convs can't be sliced (sublane offsets
  must be 8-aligned); they are `pltpu.roll`s in f32 (32-bit-only rotate,
  same as `ops/conv_pallas.py`). Roll wrap garbage only ever lands in the
  margin columns, which every consumer masks or ignores.
- Column padding values for reflect/replicate conv padding are injected
  with masked rolls (pad col −1 holds col +1 for reflect / col 0 for
  replicate); zero padding needs nothing (margins are kept zero).

Numerics match the XLA chain op-for-op: bf16 matmul operands with f32
accumulation, conv tap-sums accumulated in f32 and rounded ONCE before
the bf16 bias add + ReLU (XLA's conv+bias_add+relu rounding order), and
the attention interior copied from `ops/attention_pallas._fwd_kernel`
(f32 logits/softmax, bf16 probabilities, per-head batched dot_generals,
alignment columns masked to −inf). Goldens: tests/test_block_mega.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixel_heal_thyself_tpu.ops.attention_pallas import (
    _mask_add,
    _rel_bias_full,
    _round8,
)

# top/bottom margin rows of in-kernel image buffers: max(attention halo,
# conv pad) + 1 slack row so the conv stripe reads stay in range
_MARGIN = 4


def supports_shapes(
    b: int, h: int, w: int, c: int, *,
    block_size: int = 8, halo_size: int = 3, num_heads: int = 4,
    dtype=jnp.bfloat16,
) -> bool:
    """Static gate for the megakernel (bench/prod geometry and friends).

    Requires the attention-kernel alignment preconditions plus a VMEM fit:
    per program the kernel keeps 5 margin-padded image buffers, the
    pipelined in/out blocks, and the window scratch resident.
    """
    if dtype != jnp.bfloat16:
        return False  # f32 images double every buffer; XLA path instead
    if block_size % 8 != 0 or h % block_size != 0 or w % block_size != 0:
        return False
    if c % 128 != 0 or c % num_heads != 0 or (c // num_heads) % 2 != 0:
        return False
    if h % 16 != 0:  # conv stripe height (two stripes per program minimum)
        return False
    wpp = _round8(w + 2 * halo_size)
    img = (h + 2 * _MARGIN) * wpp * c * 2  # bf16 margin-padded buffer
    pipe = 3 * 2 * h * wpp * c * 2  # x/a/out pipelined (double-buffered)
    window = block_size + 2 * halo_size
    wwin = _round8(window)
    win_scr = 2 * (w // block_size) * window * wwin * c * 2
    # f32 conv stripe temporaries (3 shifted copies + accumulator)
    conv_tmp = 4 * 18 * wpp * c * 4
    budget = 5 * img + pipe + win_scr + conv_tmp + 8 * 1024 * 1024
    return budget <= 118 * 1024 * 1024


def _interior_col_mask(wpp: int, w: int, halo: int) -> jnp.ndarray:
    """[1, wpp, 1] f32 multiply-mask: 1.0 on the real frame columns
    [halo, halo+w), 0.0 on the margin columns."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wpp, 1), 1)
    return jnp.where((col >= halo) & (col < halo + w), 1.0, 0.0)


def _col_select(wpp: int, col_idx: int) -> jnp.ndarray:
    """[1, wpp, 1] f32 mask selecting a single column."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wpp, 1), 1)
    return jnp.where(col == col_idx, 1.0, 0.0)


def _conv_col_pad(xs: jnp.ndarray, halo: int, w: int, padding_mode: str):
    """Inject the 1-wide conv column padding into the margin columns of a
    f32 stripe [rows, wpp, C] whose interior lives at [halo, halo+w).

    reflect: pad col (halo−1) ← col (halo+1); replicate: ← col halo; the
    right edge mirrors. zeros: margins are already zero."""
    if padding_mode == "zeros":
        return xs
    shift = 2 if padding_mode == "reflect" else 1
    wpp = xs.shape[1]
    left = _col_select(wpp, halo - 1)
    right = _col_select(wpp, halo + w)
    # roll(x, s)[i] = x[i−s] (shift must be non-negative: wpp−s ≡ −s):
    # pad col halo−1 needs col halo−1+shift
    xs = xs * (1.0 - left - right)
    xs = (
        xs
        + pltpu.roll(xs, wpp - shift, 1) * left
        + pltpu.roll(xs, shift, 1) * right
    )
    return xs


def _conv3x3_stripe(
    src, dst, wk_ref, b_ref, s0: int, rows: int, *,
    halo: int, w: int, padding_mode: str, prec, dtype,
    residual=None, out_ref=None, out_row0: int = 0, col_mask=None,
):
    """relu(conv3x3(src) + b) over output buffer rows [s0, s0+rows),
    written to `dst` (a margin-padded buffer) — or, when `out_ref` is
    given, `residual[rows] + (that)` written to the kernel output ref
    (the FFN's second conv + skip, streamed straight out).

    `src` rows [s0−1, s0+rows+1) must already hold the conv's row padding
    (margin rows written by `_set_pad_rows`). wk_ref is [9, C, C]
    (tap-major), b_ref [1, C].
    """
    wpp = src.shape[1]
    xs = src[s0 - 1 : s0 + rows + 1].astype(jnp.float32)
    xs = _conv_col_pad(xs, halo, w, padding_mode)
    # shifted[i] = xs[i−s]: taps j∈{0,1,2} read column c+j−1
    sh = [
        pltpu.roll(xs, 1, 1).astype(dtype),
        xs.astype(dtype),
        pltpu.roll(xs, wpp - 1, 1).astype(dtype),
    ]
    c = src.shape[-1]
    acc = jnp.zeros((rows * wpp, c), jnp.float32)
    for i in range(3):
        for j in range(3):
            acc = acc + jax.lax.dot_general(
                sh[j][i : i + rows].reshape(rows * wpp, c),
                wk_ref[i * 3 + j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
    # match XLA's rounding order: conv rounds once, then bf16 bias + relu
    y = acc.astype(dtype).reshape(rows, wpp, c)
    y = jnp.maximum(y + b_ref[0].astype(dtype), 0.0)
    y = (y.astype(jnp.float32) * col_mask).astype(dtype)
    if out_ref is None:
        dst[s0 : s0 + rows] = y
    else:
        out_ref[0, out_row0 : out_row0 + rows] = residual + y


def _set_pad_rows(buf, h: int, padding_mode: str):
    """Write the 1-row conv padding into the margin rows of a
    margin-padded buffer (interior rows [_MARGIN, _MARGIN+h))."""
    m = _MARGIN
    if padding_mode == "zeros":
        buf[m - 1 : m] = jnp.zeros_like(buf[m - 1 : m])
        buf[m + h : m + h + 1] = jnp.zeros_like(buf[m + h : m + h + 1])
        return
    src_top = m + 1 if padding_mode == "reflect" else m
    src_bot = m + h - 2 if padding_mode == "reflect" else m + h - 1
    buf[m - 1 : m] = buf[src_top : src_top + 1]
    buf[m + h : m + h + 1] = buf[src_bot : src_bot + 1]


def _block_kernel(
    x_ref,      # [1, H, Wpp, C] VMEM — W-halo-padded noisy
    a_ref,      # [1, H, Wpp, C] VMEM — W-halo-padded aux features
    wcat_ref,   # [2C, C] bf16 — n_aux 1×1 kernel ([x; a] order)
    bcat_ref,   # [1, C] f32
    wq_ref,     # [C, C] bf16
    wk_ref,     # [C, C] bf16
    wv_ref,     # [C, C] bf16
    bias_ref,   # [window, wwin, C] f32 — rel-pos key bias
    w1_ref,     # [9, C, C] bf16 — FFN conv1 taps (row-major)
    b1_ref,     # [1, C] f32
    w2_ref,     # [9, C, C] bf16
    b2_ref,     # [1, C] f32
    o_ref,      # [1, H, Wpp, C] VMEM out — W-halo-padded block output
    n_buf,      # [H+2M, Wpp, C] bf16 scratch — n_aux (relu'd, col-masked)
    k_buf,      # [H+2M, Wpp, C] bf16 — keys; REUSED as f1 after attention
    v_buf,      # [H+2M, Wpp, C] bf16 — values
    x1_buf,     # [H+2M, Wpp, C] bf16 — attention residual output
    kwin,       # [WB, window, wwin, C] bf16 — aligned window staging
    vwin,
    qall,       # [WB, bs², C] bf16 — block-gathered queries
    o_scr,      # [bs, Wpp, C] f32 — attention output assembly row
    *,
    bs: int,
    halo: int,
    heads: int,
    h: int,
    w: int,
    padding_mode: str,
):
    wpp = x_ref.shape[2]
    c = x_ref.shape[3]
    window = bs + 2 * halo
    wwin = _round8(window)
    n = window * wwin
    wb = w // bs
    hd = c // heads
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    dtype = x_ref.dtype
    prec = jax.lax.Precision.DEFAULT  # bf16 operands, MXU fast path
    m = _MARGIN
    col_mask = _interior_col_mask(wpp, w, halo)

    def mm(lhs, w_ref2d):
        return jax.lax.dot_general(
            lhs, w_ref2d[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # ---- phase A: zero the attention halo margins of k/v --------------
    for buf in (k_buf, v_buf):
        buf[0:m] = jnp.zeros_like(buf[0:m])
        buf[m + h : h + 2 * m] = jnp.zeros_like(buf[m + h : h + 2 * m])
    o_scr[...] = jnp.zeros_like(o_scr)

    # ---- phase B: n_aux / k / v row-stripes ---------------------------
    # n_aux = relu([x; a]·Wcat + bcat), margin cols forced to zero so the
    # projected keys/values stay zero outside the frame (the attention
    # semantics: out-of-frame keys are zero vectors + rel bias)
    srows = 16
    for s in range(h // srows):
        r0 = s * srows
        xs = x_ref[0, r0 : r0 + srows].reshape(srows * wpp, c)
        as_ = a_ref[0, r0 : r0 + srows].reshape(srows * wpp, c)
        nx = mm(xs, wcat_ref.at[pl.ds(0, c)]) + mm(as_, wcat_ref.at[pl.ds(c, c)])
        nx = jnp.maximum(nx.astype(dtype) + bcat_ref[0].astype(dtype), 0.0)
        nx = (nx.reshape(srows, wpp, c).astype(jnp.float32) * col_mask).astype(dtype)
        n_buf[m + r0 : m + r0 + srows] = nx
        k_buf[m + r0 : m + r0 + srows] = (
            mm(nx.reshape(srows * wpp, c), wk_ref).astype(dtype)
            .reshape(srows, wpp, c)
        )
        # x margin cols are zero already, so v margins project to zero
        v_buf[m + r0 : m + r0 + srows] = (
            mm(xs, wv_ref).astype(dtype).reshape(srows, wpp, c)
        )

    # ---- phase C: block-halo attention per block-row ------------------
    # interior of ops/attention_pallas._fwd_kernel, with k/v already in
    # VMEM (window slice columns bx·bs are 8-aligned by the layout
    # contract) and q projected on the fly per block-row
    mask = _mask_add(window, wwin)
    for by in range(h // bs):
        krow0 = m + by * bs - halo
        for bx in range(wb):
            kwin[bx] = k_buf[krow0 : krow0 + window, pl.ds(bx * bs, wwin), :]
            vwin[bx] = v_buf[krow0 : krow0 + window, pl.ds(bx * bs, wwin), :]
        kwin[...] = (
            kwin[...].astype(jnp.float32) + bias_ref[...][None]
        ).astype(dtype)

        qrow = mm(
            n_buf[m + by * bs : m + by * bs + bs].reshape(bs * wpp, c), wq_ref,
        ).reshape(bs, wpp, c)
        # roll the padded-layout q back to column 0 so block gathers align
        qrow = pltpu.roll(qrow, wpp - halo, 1).astype(dtype)
        for bx in range(wb):
            qall[bx] = qrow[:, bx * bs : (bx + 1) * bs, :].reshape(bs * bs, c)

        kv = kwin[...].reshape(wb, n, c)
        vv = vwin[...].reshape(wb, n, c)
        qv = qall[...]
        outs = []
        for hh in range(heads):
            sl = slice(hh * hd, (hh + 1) * hd)
            logits = jax.lax.dot_general(
                qv[:, :, sl], kv[:, :, sl],
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) * scale + mask  # [wb, bs², n]
            mx = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - mx)
            attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dtype)
            outs.append(
                jax.lax.dot_general(
                    attn, vv[:, :, sl],
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                ),  # [wb, bs², hd]
            )
        o_all = jnp.concatenate(outs, axis=-1).astype(dtype)  # [wb, bs², c]
        for bx in range(wb):
            o_scr[:, bx * bs : (bx + 1) * bs, :] = (
                o_all[bx].reshape(bs, bs, c).astype(jnp.float32)
            )
        # o_scr holds the row in UNPADDED layout (cols [0, w), the tail
        # cols stay zero) — roll into the padded layout: wrap garbage is
        # the zero tail, so the margins land zero without a mask
        orow = pltpu.roll(o_scr[...], halo, 1).astype(dtype)
        x1_buf[m + by * bs : m + by * bs + bs] = (
            x_ref[0, by * bs : by * bs + bs] + orow
        )

    # ---- phase D/E: FFN conv1 into f_buf (reusing k_buf) --------------
    f_buf = k_buf
    _set_pad_rows(x1_buf, h, padding_mode)
    for s in range(h // srows):
        _conv3x3_stripe(
            x1_buf, f_buf, w1_ref, b1_ref, m + s * srows, srows,
            halo=halo, w=w, padding_mode=padding_mode, prec=prec,
            dtype=dtype, col_mask=col_mask,
        )

    # ---- phase F/G: conv2 + residual, streamed to the output ----------
    _set_pad_rows(f_buf, h, padding_mode)
    for s in range(h // srows):
        _conv3x3_stripe(
            f_buf, None, w2_ref, b2_ref, m + s * srows, srows,
            halo=halo, w=w, padding_mode=padding_mode, prec=prec,
            dtype=dtype, col_mask=col_mask,
            residual=x1_buf[m + s * srows : m + (s + 1) * srows],
            out_ref=o_ref, out_row0=s * srows,
        )


@partial(
    jax.jit,
    static_argnames=(
        "block_size", "halo_size", "num_heads", "padding_mode", "interpret",
    ),
)
def transformer_block_mega_padded(
    xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
    *, block_size=8, halo_size=3, num_heads=4, padding_mode="reflect",
    interpret=False,
):
    """One fused TransformerBlock forward on W-halo-padded images.

    xp/ap: [B, H, Wpp, C] in the compute dtype with the frame at columns
    [halo, halo+W) (`pad_w_halo`). Weights in their flax param shapes:
    wcat [1,1,2C,C] ([noisy; aux] input order), wq/wk/wv [1,1,C,C],
    w1/w2 [3,3,C,C], biases [C], rel_h/rel_w [window, head_ch//2].
    Returns the block output in the same padded layout (margin columns
    zero), ready to feed the next block unchanged.
    """
    b, h, wpp, c = xp.shape
    bs, halo = block_size, halo_size
    w = wpp_to_w(wpp, halo)
    window = bs + 2 * halo
    wwin = _round8(window)
    dtype = xp.dtype

    bias = _rel_bias_full(
        rel_h.astype(jnp.float32), rel_w.astype(jnp.float32), window, num_heads,
    )
    kernel = partial(
        _block_kernel, bs=bs, halo=halo, heads=num_heads, h=h, w=w,
        padding_mode=padding_mode,
    )
    wb = w // bs
    img = pl.BlockSpec((1, h, wpp, c), lambda bi: (bi, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            img,
            img,
            full((2 * c, c), lambda bi: (0, 0)),
            full((1, c), lambda bi: (0, 0)),
            full((c, c), lambda bi: (0, 0)),
            full((c, c), lambda bi: (0, 0)),
            full((c, c), lambda bi: (0, 0)),
            full((window, wwin, c), lambda bi: (0, 0, 0)),
            full((9, c, c), lambda bi: (0, 0, 0)),
            full((1, c), lambda bi: (0, 0)),
            full((9, c, c), lambda bi: (0, 0, 0)),
            full((1, c), lambda bi: (0, 0)),
        ],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct(xp.shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
            pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
            pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
            pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
            pltpu.VMEM((wb, window, wwin, c), dtype),
            pltpu.VMEM((wb, window, wwin, c), dtype),
            pltpu.VMEM((wb, bs * bs, c), dtype),
            pltpu.VMEM((bs, wpp, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp, ap,
        wcat[0, 0].astype(dtype), bcat.reshape(1, -1).astype(jnp.float32),
        wq[0, 0].astype(dtype), wk[0, 0].astype(dtype), wv[0, 0].astype(dtype),
        bias,
        w1.reshape(9, c, c).astype(dtype), b1.reshape(1, -1).astype(jnp.float32),
        w2.reshape(9, c, c).astype(dtype), b2.reshape(1, -1).astype(jnp.float32),
    )
    return out


def pad_w_halo(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    """[B,H,W,C] → [B,H,Wpp,C] with the frame at columns [halo, halo+W)
    (same update-slice-into-zeros lowering as attention_pallas._pad_w)."""
    b, h, w, c = x.shape
    wpp = _round8(w + 2 * halo)
    buf = jnp.zeros((b, h, wpp, c), x.dtype)
    return jax.lax.dynamic_update_slice(buf, x, (0, 0, halo, 0))


def unpad_w_halo(xp: jnp.ndarray, w: int, halo: int) -> jnp.ndarray:
    return xp[:, :, halo : halo + w, :]


def wpp_to_w(wpp: int, halo: int) -> int:
    """Inverse of the `_round8(w + 2·halo)` padding for block-aligned w
    (unique because w % 8 == 0)."""
    w = wpp - 2 * halo
    return w - (w % 8)
