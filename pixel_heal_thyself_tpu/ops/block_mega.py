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
full-activation HBM round trips per direction (n_aux, q, k, v, two pads,
the attention custom-call I/O, two conv I/Os, two residual adds); the
megakernel reads noisy+aux once and writes the block output once (plus,
in training, the x1/f1/mask residuals the backward reloads instead of
recomputing two 19-GFLOP conv forwards per element).

Layout contract (what makes the windowing and the convs coexist):

- Images flow between blocks W-HALO-PADDED: [B, H, Wpp, C] with the real
  frame at columns [halo, halo+W) and Wpp = round8(W + 2·halo). Putting
  the interior at column `halo` (≡ 3 mod 8 for the prod halo) makes every
  attention window slice land on an 8-aligned sublane offset (window bx
  starts at column bx·bs exactly like `ops/attention_pallas.py`), and
  chaining blocks in padded form deletes the per-block pad/unpad passes
  entirely — only the first block pads and the last unpads.
- In-kernel image buffers carry a 4-row top/bottom margin (rows are the
  untiled dim of a [rows, Wpp, C] ref, so margin row offsets are free
  and may be DYNAMIC — the row-stripe and block-row loops are
  `fori_loop`s over `pl.ds` row slices, keeping the Mosaic program size
  independent of the frame height; a fully unrolled 128² program
  crashed the AOT compiler).
- The ±1 column taps of the 3×3 convs can't be sliced (sublane offsets
  must be 8-aligned); they are `pltpu.roll`s in f32 (32-bit-only rotate,
  same as `ops/conv_pallas.py`). Roll wrap garbage only ever lands in the
  margin columns, which every consumer masks or ignores.
- Column padding values for reflect/replicate conv padding are injected
  with masked rolls (pad col −1 holds col +1 for reflect / col 0 for
  replicate); zero padding needs nothing (margins are kept zero).

The backward is a sibling kernel with the same structure run in reverse:
conv2 → pad fold → conv1 → pad fold → attention → projections. It
reloads x1/f1/mask2 (saved by the forward's `emit` mode) so no conv
forward is recomputed; attention probabilities are recomputed in-VMEM
(the `ops/attention_pallas.py` backward pattern), dk/dv windows
overlap-add into margin-padded VMEM images, and every parameter gradient
accumulates in f32 into grid-revisited output refs (summed over batch
in-kernel — the sequential batch grid revisits the same accumulator
block).

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
_SROWS = 16  # conv stripe height (output rows per stripe)


def supports_shapes(
    b: int, h: int, w: int, c: int, *,
    block_size: int = 8, halo_size: int = 3, num_heads: int = 4,
    dtype=jnp.bfloat16,
) -> bool:
    """Static gate for the megakernel (bench/prod geometry and friends).

    Requires the attention-kernel alignment preconditions plus a VMEM fit:
    per program the backward keeps 7 margin-padded image buffers, the
    x/a copies, and the window scratch resident.
    """
    if dtype != jnp.bfloat16:
        return False  # f32 images double every buffer; XLA path instead
    if block_size % 8 != 0 or h % block_size != 0 or w % block_size != 0:
        return False
    if c % 128 != 0 or c % num_heads != 0 or (c // num_heads) % 2 != 0:
        return False
    if h % _SROWS != 0:
        return False
    wpp = _round8(w + 2 * halo_size)
    img = (h + 2 * _MARGIN) * wpp * c * 2  # bf16 margin-padded buffer
    flat = h * wpp * c * 2
    window = block_size + 2 * halo_size
    wwin = _round8(window)
    win_scr = 2 * (w // block_size) * window * wwin * c * 2
    # f32 conv stripe temporaries (shifted copies + accumulator)
    conv_tmp = 5 * (_SROWS + 2) * wpp * c * 4
    # backward is the fat path: 7 margin'd buffers + x/a copies + grads
    budget = 7 * img + 2 * flat + win_scr + conv_tmp + 16 * 1024 * 1024
    return budget <= 118 * 1024 * 1024


def _relu_mask(y, dtype):
    """(y > 0) as a 0/1 tensor in `dtype`, via an f32 compare — a bf16
    compare whose bool result is cast straight to bf16 crashes this
    libtpu's Mosaic AOT compiler (bisected in round 5)."""
    return (y.astype(jnp.float32) > 0).astype(jnp.float32).astype(dtype)


def _zero_image_buf(buf):
    """Chunked zero-fill: a single elementwise op touching more than
    ~2^20 elements crashes this libtpu's Mosaic AOT compiler, so whole
    image buffers are zeroed in 8-row slabs."""
    rows = buf.shape[0]
    chunk = 8
    assert rows % chunk == 0

    def body(i, _):
        buf[pl.ds(i * chunk, chunk)] = jnp.zeros_like(buf[pl.ds(i * chunk, chunk)])
        return 0

    jax.lax.fori_loop(0, rows // chunk, body, 0)


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


def _shifted_taps(src, s0, rows: int, *, halo, w, padding_mode, dtype):
    """The three column-shifted bf16 copies of conv-input rows
    [s0−1, s0+rows+1) with the column padding injected: sh[j][u, c] =
    padded_src[u, c + j − 1]. `s0` may be a traced row index."""
    wpp = src.shape[1]
    xs = src[pl.ds(s0 - 1, rows + 2)].astype(jnp.float32)
    xs = _conv_col_pad(xs, halo, w, padding_mode)
    return [
        pltpu.roll(xs, 1, 1).astype(dtype),
        xs.astype(dtype),
        pltpu.roll(xs, wpp - 1, 1).astype(dtype),
    ]


def _im2col_stripe(src, s0, rows: int, *, halo, w, padding_mode, dtype):
    """im2col of conv-input rows [s0, s0+rows): [rows·wpp, 9C] with tap
    columns ordered (i, j)-major to match `[9,C,C].reshape(9C, C)`
    weights. Built from three column-rolled copies (sh[j][u, c] =
    padded_src[u, c+j−1]) of rows [s0−1, s0+rows+1) with the column
    padding injected; `s0` may be a traced row index. One [·, 9C]×[9C, C]
    MXU contraction then replaces nine small tap matmuls — fewer op
    boundaries for Mosaic to schedule around."""
    wpp = src.shape[1]
    c = src.shape[-1]
    sh = _shifted_taps(src, s0, rows, halo=halo, w=w,
                       padding_mode=padding_mode, dtype=dtype)
    cols = jnp.concatenate(
        [sh[j][i : i + rows] for i in range(3) for j in range(3)], axis=-1,
    )
    return cols.reshape(rows * wpp, 9 * c)


def _conv3x3_stripe(
    src, wk_ref, b_ref, s0, rows: int, *,
    halo: int, w: int, padding_mode: str, prec, dtype, col_mask,
):
    """(relu(conv3x3(src) + b), relu-mask) over output rows [s0, s0+rows)
    of a margin-padded buffer, as values. `src` rows [s0−1, s0+rows+1)
    must already hold the conv's row padding (`_set_pad_rows`). wk_ref is
    [9, C, C] (tap-major), b_ref [1, C]."""
    wpp = src.shape[1]
    c = src.shape[-1]
    cols = _im2col_stripe(src, s0, rows, halo=halo, w=w,
                          padding_mode=padding_mode, dtype=dtype)
    acc = jax.lax.dot_general(
        cols, wk_ref[...].reshape(9 * c, c),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    # match XLA's rounding order: conv rounds once, then bf16 bias + relu
    y = acc.astype(dtype).reshape(rows, wpp, c)
    y = y + b_ref[0].astype(dtype)
    # NB: a bf16 comparison materialized as a bf16 0/1 mask crashes this
    # libtpu's Mosaic AOT compiler; the f32-compare → f32 → bf16 chain
    # lowers cleanly and is numerically identical
    mask = _relu_mask(y, dtype)
    y = jnp.maximum(y, 0.0)
    y = (y.astype(jnp.float32) * col_mask).astype(dtype)
    return y, mask


def _transposed_conv_stripe(buf, dpre_px, wtp_ref, s0, prec):
    """Accumulate the transposed-conv (input-gradient) taps of one output
    stripe into `buf` rows [s0−1, s0+_SROWS+1):
    d_in[r+i−1, c+j−1] += dpre[r, c] · W[i,j]ᵀ. wtp_ref holds the
    per-tap-transposed weights packed [C, 9C] (tap-major columns); the
    taps run as nine [·,C]×[C,C] matmuls — the one-shot [·,C]×[C,9C]
    form measured SLOWER (its 20 MB f32 product must stay f32 for the
    rolls; BASELINE.md round-5). All nine taps accumulate in one f32
    value array, so the bf16 buffer is rounded once per stripe. Roll
    wrap values are zero (dpre is interior-masked); the row offsets are
    zero-row concats on the untiled dim (`.at[].add` would lower to
    scatter-add, which Mosaic lacks)."""
    wpp = buf.shape[1]
    c = buf.shape[-1]
    acc = jnp.zeros((_SROWS + 2, wpp, c), jnp.float32)
    zrow = jnp.zeros((1, wpp, c), jnp.float32)
    for i in range(3):
        for j in range(3):
            k = i * 3 + j
            tmp = jax.lax.dot_general(
                dpre_px, wtp_ref[:, k * c : (k + 1) * c],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(_SROWS, wpp, c)
            shift = (j - 1) % wpp
            if shift:
                tmp = pltpu.roll(tmp, shift, 1)
            acc = acc + jnp.concatenate(
                [zrow] * i + [tmp] + [zrow] * (2 - i), axis=0,
            )
    sl = pl.ds(s0 - 1, _SROWS + 2)
    buf[sl] = (buf[sl].astype(jnp.float32) + acc).astype(buf.dtype)


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


def _attention_block_row(
    n_buf, k_buf, v_buf, kwin, vwin, qall, bias_ref, wq_ref, by, *,
    bs, halo, heads, wb, dtype, prec, need_probs=False, doall=None,
):
    """Stage the windows for block-row `by` (a traced index), recompute
    q, and run the per-head attention interior
    (ops/attention_pallas math). Returns o_all [wb, bs², C] when
    need_probs is False; with need_probs, also runs the backward math
    against `doall` and returns (dq_all, dkwin, dvwin, dbias_acc)."""
    window = bs + 2 * halo
    wwin = _round8(window)
    n = window * wwin
    c = n_buf.shape[-1]
    wpp = n_buf.shape[1]
    hd = c // heads
    m = _MARGIN
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    krow0 = m + by * bs - halo

    for bx in range(wb):
        kwin[bx] = k_buf[pl.ds(krow0, window), pl.ds(bx * bs, wwin), :]
        vwin[bx] = v_buf[pl.ds(krow0, window), pl.ds(bx * bs, wwin), :]
    kwin[...] = (
        kwin[...].astype(jnp.float32) + bias_ref[...][None]
    ).astype(dtype)

    qrow = jax.lax.dot_general(
        n_buf[pl.ds(m + by * bs, bs)].reshape(bs * wpp, c),
        wq_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(bs, wpp, c)
    # roll the padded-layout q back to column 0 so block gathers align
    qrow = pltpu.roll(qrow, wpp - halo, 1).astype(dtype)
    for bx in range(wb):
        qall[bx] = qrow[:, bx * bs : (bx + 1) * bs, :].reshape(bs * bs, c)

    kv = kwin[...].reshape(wb, n, c)
    vv = vwin[...].reshape(wb, n, c)
    qv = qall[...]
    mask = _mask_add(window, wwin)

    if not need_probs:
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
                ),
            )
        return jnp.concatenate(outs, axis=-1).astype(dtype)

    dov = doall[...]
    dq_parts, dk_parts, dv_parts = [], [], []
    dbias_acc = jnp.zeros((n, hd), jnp.float32)
    for hh in range(heads):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh, kh, vh, doh = qv[:, :, sl], kv[:, :, sl], vv[:, :, sl], dov[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale + mask
        mx = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - mx)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)  # f32 [wb, bs², n]

        dattn = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        dlogits = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        dl = dlogits.astype(dtype)
        attn_c = attn.astype(dtype)
        dq_parts.append(
            jax.lax.dot_general(
                dl, kh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) * scale,
        )
        dkh = jax.lax.dot_general(
            dl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale  # [wb, n, hd]
        dk_parts.append(dkh)
        dv_parts.append(
            jax.lax.dot_general(
                attn_c, doh, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            ),
        )
        dbias_acc = dbias_acc + jnp.sum(dkh, axis=0).astype(jnp.float32)

    dq_all = jnp.concatenate(dq_parts, axis=-1).astype(dtype)
    dkwin = jnp.concatenate(dk_parts, axis=-1).astype(dtype)
    dvwin = jnp.concatenate(dv_parts, axis=-1).astype(dtype)
    return dq_all, dkwin, dvwin, dbias_acc


def _scatter_blocks_to_row(o_scr, blocks, *, bs, wb, halo, dtype):
    """[wb, bs², C] per-block values → one padded-layout row-stripe
    [bs, wpp, C] (via the zero-tailed o_scr scratch + a roll)."""
    c = blocks.shape[-1]
    for bx in range(wb):
        o_scr[:, bx * bs : (bx + 1) * bs, :] = (
            blocks[bx].reshape(bs, bs, c).astype(jnp.float32)
        )
    return pltpu.roll(o_scr[...], halo, 1).astype(dtype)


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
    *refs,      # out refs then scratch (emit adds x1/f1/m2 HBM outs)
    bs: int,
    halo: int,
    heads: int,
    h: int,
    w: int,
    padding_mode: str,
    emit: bool,
):
    if emit:
        (o_ref, x1o_ref, f1o_ref, m2o_ref,
         n_buf, k_buf, v_buf, x1_buf, kwin, vwin, qall, o_scr, sems) = refs
    else:
        (o_ref,
         n_buf, k_buf, v_buf, x1_buf, kwin, vwin, qall, o_scr) = refs
    wpp = x_ref.shape[2]
    c = x_ref.shape[3]
    wb = w // bs
    dtype = x_ref.dtype
    prec = jax.lax.Precision.DEFAULT  # bf16 operands, MXU fast path
    m = _MARGIN
    bi = pl.program_id(0)
    n_s = h // _SROWS
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
    def phase_b(s, _):
        r0 = s * _SROWS
        xs = x_ref[0, pl.ds(r0, _SROWS)].reshape(_SROWS * wpp, c)
        as_ = a_ref[0, pl.ds(r0, _SROWS)].reshape(_SROWS * wpp, c)
        nx = mm(xs, wcat_ref.at[pl.ds(0, c)]) + mm(as_, wcat_ref.at[pl.ds(c, c)])
        nx = jnp.maximum(nx.astype(dtype) + bcat_ref[0].astype(dtype), 0.0)
        nx = (nx.reshape(_SROWS, wpp, c).astype(jnp.float32) * col_mask).astype(dtype)
        n_buf[pl.ds(m + r0, _SROWS)] = nx
        k_buf[pl.ds(m + r0, _SROWS)] = (
            mm(nx.reshape(_SROWS * wpp, c), wk_ref).astype(dtype)
            .reshape(_SROWS, wpp, c)
        )
        # x margin cols are zero already, so v margins project to zero
        v_buf[pl.ds(m + r0, _SROWS)] = (
            mm(xs, wv_ref).astype(dtype).reshape(_SROWS, wpp, c)
        )
        return 0

    jax.lax.fori_loop(0, n_s, phase_b, 0)

    # ---- phase C: block-halo attention per block-row ------------------
    def phase_c(by, _):
        o_all = _attention_block_row(
            n_buf, k_buf, v_buf, kwin, vwin, qall, bias_ref, wq_ref, by,
            bs=bs, halo=halo, heads=heads, wb=wb, dtype=dtype, prec=prec,
        )
        # o_scr holds the row in UNPADDED layout (cols [0, w), the tail
        # cols stay zero) — rolled into the padded layout the wrap
        # garbage is the zero tail, so the margins land zero mask-free
        orow = _scatter_blocks_to_row(
            o_scr, o_all, bs=bs, wb=wb, halo=halo, dtype=dtype,
        )
        x1_buf[pl.ds(m + by * bs, bs)] = (
            x_ref[0, pl.ds(by * bs, bs)] + orow
        )
        return 0

    jax.lax.fori_loop(0, h // bs, phase_c, 0)

    if emit:
        x1cp = pltpu.make_async_copy(
            x1_buf.at[pl.ds(m, h)], x1o_ref.at[bi], sems.at[0, 0],
        )
        x1cp.start()

    # ---- phase D/E: FFN conv1 into f_buf (reusing k_buf) --------------
    f_buf = k_buf
    _set_pad_rows(x1_buf, h, padding_mode)

    def conv1(s, _):
        r0 = s * _SROWS
        y, _unused = _conv3x3_stripe(
            x1_buf, w1_ref, b1_ref, m + r0, _SROWS,
            halo=halo, w=w, padding_mode=padding_mode, prec=prec,
            dtype=dtype, col_mask=col_mask,
        )
        f_buf[pl.ds(m + r0, _SROWS)] = y
        if emit:
            pltpu.make_async_copy(
                f_buf.at[pl.ds(m + r0, _SROWS)],
                f1o_ref.at[bi, pl.ds(r0, _SROWS)],
                sems.at[1, s],
            ).start()
        return 0

    jax.lax.fori_loop(0, n_s, conv1, 0)

    # ---- phase F/G: conv2 + residual, streamed to the output ----------
    _set_pad_rows(f_buf, h, padding_mode)
    if emit:
        x1cp.wait()  # conv2 overwrites x1_buf rows with the relu masks

    def conv2(s, _):
        r0 = s * _SROWS
        y, msk = _conv3x3_stripe(
            f_buf, w2_ref, b2_ref, m + r0, _SROWS,
            halo=halo, w=w, padding_mode=padding_mode, prec=prec,
            dtype=dtype, col_mask=col_mask,
        )
        o_ref[0, pl.ds(r0, _SROWS)] = x1_buf[pl.ds(m + r0, _SROWS)] + y
        if emit:
            # masks park in n_buf (free after attention) for the DMA out
            n_buf[pl.ds(m + r0, _SROWS)] = msk
            pltpu.make_async_copy(
                n_buf.at[pl.ds(m + r0, _SROWS)],
                m2o_ref.at[bi, pl.ds(r0, _SROWS)],
                sems.at[2, s],
            ).start()
        return 0

    jax.lax.fori_loop(0, n_s, conv2, 0)

    if emit:
        def wait_cp(s, _):
            r0 = s * _SROWS
            pltpu.make_async_copy(
                f_buf.at[pl.ds(m + r0, _SROWS)],
                f1o_ref.at[bi, pl.ds(r0, _SROWS)],
                sems.at[1, s],
            ).wait()
            pltpu.make_async_copy(
                n_buf.at[pl.ds(m + r0, _SROWS)],
                m2o_ref.at[bi, pl.ds(r0, _SROWS)],
                sems.at[2, s],
            ).wait()
            return 0

        jax.lax.fori_loop(0, n_s, wait_cp, 0)


@partial(
    jax.jit,
    static_argnames=(
        "block_size", "halo_size", "num_heads", "padding_mode", "emit",
        "interpret",
    ),
)
def _mega_fwd(
    xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
    *, block_size, halo_size, num_heads, padding_mode, emit, interpret,
):
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
        padding_mode=padding_mode, emit=emit,
    )
    wb = w // bs
    img = pl.BlockSpec((1, h, wpp, c), lambda bi: (bi, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    full = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    img_shape = jax.ShapeDtypeStruct(xp.shape, dtype)
    scratch = [
        pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
        pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
        pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
        pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype),
        pltpu.VMEM((wb, window, wwin, c), dtype),
        pltpu.VMEM((wb, window, wwin, c), dtype),
        pltpu.VMEM((wb, bs * bs, c), dtype),
        pltpu.VMEM((bs, wpp, c), jnp.float32),
    ]
    if emit:
        out_specs = (img, hbm, hbm, hbm)
        out_shape = (img_shape, img_shape, img_shape, img_shape)
        scratch = scratch + [pltpu.SemaphoreType.DMA((3, h // _SROWS))]
    else:
        out_specs = img
        out_shape = img_shape
    return pl.pallas_call(
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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
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


def _bwd_kernel(
    x_ref,      # [B, H, Wpp, C] HBM — W-halo-padded noisy
    a_ref,      # [B, H, Wpp, C] HBM
    x1_ref,     # [B, H, Wpp, C] HBM — forward residuals
    f1_ref,     # [B, H, Wpp, C] HBM
    m2_ref,     # [B, H, Wpp, C] HBM — conv2 relu mask (bf16 0/1)
    do_ref,     # [B, H, Wpp, C] HBM — incoming gradient
    wcat_ref,   # [2C, C] bf16
    bcat_ref,   # [1, C] f32
    wq_ref, wk_ref, wv_ref,       # [C, C] bf16
    wqt_ref, wkt_ref, wvt_ref,    # [C, C] bf16 (transposed)
    wcxt_ref, wcat_t_ref,         # [C, C] bf16 (Wcat halves, transposed)
    bias_ref,   # [window, wwin, C] f32
    w1t_ref,    # [C, 9C] bf16 — conv1 taps, per-tap transposed, packed
    w2t_ref,    # [C, 9C] bf16
    # outputs -----------------------------------------------------------
    dx_ref,     # [B, H, Wpp, C] HBM out (manual DMA from x_vm)
    da_ref,     # [B, H, Wpp, C] HBM out
    dwcat_ref,  # [2C, C] f32 — grid-revisited accumulators (batch sum)
    dbcat_ref,  # [1, C] f32
    dwq_ref, dwk_ref, dwv_ref,    # [C, C] f32
    dbias_ref,  # [window·wwin, hd] f32
    dw1_ref,    # [9, C, C] f32
    db1_ref,    # [1, C] f32
    dw2_ref,    # [9, C, C] f32
    db2_ref,    # [1, C] f32
    # scratch -----------------------------------------------------------
    n_buf, k_buf, v_buf, x1_buf, f_buf, df_buf, dx1_buf,
    x_vm,       # [H, Wpp, C] bf16 — x copy (margins handled by layout)
    a_vm,
    m2_stage,   # [2, SROWS, Wpp, C] bf16
    kwin, vwin, qall, doall, o_scr,
    sems,       # DMA semaphores (8,)
    *,
    bs: int,
    halo: int,
    heads: int,
    h: int,
    w: int,
    padding_mode: str,
):
    wpp = x_vm.shape[1]
    c = x_vm.shape[-1]
    wb = w // bs
    window = bs + 2 * halo
    wwin = _round8(window)
    hd = c // heads
    dtype = x_vm.dtype
    prec = jax.lax.Precision.DEFAULT
    m = _MARGIN
    bi = pl.program_id(0)
    n_s = h // _SROWS
    col_mask = _interior_col_mask(wpp, w, halo)

    def mm(lhs, w_ref2d):
        return jax.lax.dot_general(
            lhs, w_ref2d[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def contract_px(lhs, rhs):
        # [P, C]ᵀ · [P, C] → [C, C] f32 (dW-style pixel contraction)
        return jax.lax.dot_general(
            lhs, rhs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    # ---- phase A: start input DMAs, zero accumulators -----------------
    cps = [
        pltpu.make_async_copy(x_ref.at[bi], x_vm, sems.at[0]),
        pltpu.make_async_copy(a_ref.at[bi], a_vm, sems.at[1]),
        pltpu.make_async_copy(
            x1_ref.at[bi], x1_buf.at[pl.ds(m, h)], sems.at[2]),
        pltpu.make_async_copy(
            f1_ref.at[bi], f_buf.at[pl.ds(m, h)], sems.at[3]),
        pltpu.make_async_copy(
            do_ref.at[bi], dx1_buf.at[pl.ds(m, h)], sems.at[4]),
    ]
    for cp in cps:
        cp.start()

    @pl.when(bi == 0)
    def _():
        for ref in (dwcat_ref, dbcat_ref, dwq_ref, dwk_ref, dwv_ref,
                    dbias_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    _zero_image_buf(df_buf)
    for buf in (k_buf, v_buf):
        buf[0:m] = jnp.zeros_like(buf[0:m])
        buf[m + h : h + 2 * m] = jnp.zeros_like(buf[m + h : h + 2 * m])
    # dx1 margin rows receive transposed-conv spill — must start zero
    dx1_buf[0:m] = jnp.zeros_like(dx1_buf[0:m])
    dx1_buf[m + h : h + 2 * m] = jnp.zeros_like(dx1_buf[m + h : h + 2 * m])
    o_scr[...] = jnp.zeros_like(o_scr)

    # ---- phase B: recompute n_aux / k / v -----------------------------
    cps[0].wait()
    cps[1].wait()

    def phase_b(s, _):
        r0 = s * _SROWS
        xs = x_vm[pl.ds(r0, _SROWS)].reshape(_SROWS * wpp, c)
        as_ = a_vm[pl.ds(r0, _SROWS)].reshape(_SROWS * wpp, c)
        nx = mm(xs, wcat_ref.at[pl.ds(0, c)]) + mm(as_, wcat_ref.at[pl.ds(c, c)])
        nx = jnp.maximum(nx.astype(dtype) + bcat_ref[0].astype(dtype), 0.0)
        nx = (nx.reshape(_SROWS, wpp, c).astype(jnp.float32) * col_mask).astype(dtype)
        n_buf[pl.ds(m + r0, _SROWS)] = nx
        k_buf[pl.ds(m + r0, _SROWS)] = (
            mm(nx.reshape(_SROWS * wpp, c), wk_ref).astype(dtype)
            .reshape(_SROWS, wpp, c)
        )
        v_buf[pl.ds(m + r0, _SROWS)] = (
            mm(xs, wv_ref).astype(dtype).reshape(_SROWS, wpp, c)
        )
        return 0

    jax.lax.fori_loop(0, n_s, phase_b, 0)

    cps[3].wait()
    _set_pad_rows(f_buf, h, padding_mode)
    cps[2].wait()
    _set_pad_rows(x1_buf, h, padding_mode)
    cps[4].wait()

    # ---- step 1: conv2 backward ---------------------------------------
    # dpre2 = do ⊙ mask2; dW2/db2 accumulate; df1p via transposed taps
    pltpu.make_async_copy(
        m2_ref.at[bi, pl.ds(0, _SROWS)], m2_stage.at[0], sems.at[5],
    ).start()

    def conv2_bwd(s, db2):
        slot = jax.lax.rem(s, 2)
        nslot = 1 - slot

        @pl.when(s + 1 < n_s)
        def _():
            pltpu.make_async_copy(
                m2_ref.at[bi, pl.ds((s + 1) * _SROWS, _SROWS)],
                m2_stage.at[nslot], sems.at[5 + nslot],
            ).start()

        pltpu.make_async_copy(
            m2_ref.at[bi, pl.ds(s * _SROWS, _SROWS)],
            m2_stage.at[slot], sems.at[5 + slot],
        ).wait()
        s0 = m + s * _SROWS
        dpre = (
            (dx1_buf[pl.ds(s0, _SROWS)] * m2_stage[slot]).astype(jnp.float32)
            * col_mask
        ).astype(dtype)
        db2 = db2 + jnp.sum(dpre.astype(jnp.float32), axis=(0, 1))
        dpre_px = dpre.reshape(_SROWS * wpp, c)
        sh = _shifted_taps(f_buf, s0, _SROWS, halo=halo, w=w,
                           padding_mode=padding_mode, dtype=dtype)
        for i in range(3):
            for j in range(3):
                dw2_ref[i * 3 + j] = dw2_ref[i * 3 + j] + contract_px(
                    sh[j][i : i + _SROWS].reshape(_SROWS * wpp, c), dpre_px,
                )
        _transposed_conv_stripe(df_buf, dpre_px, w2t_ref, s0, prec)
        return db2

    db2 = jax.lax.fori_loop(0, n_s, conv2_bwd, jnp.zeros((c,), jnp.float32))
    db2_ref[...] = db2_ref[...] + db2.reshape(1, c)

    # ---- step 2: fold conv2's padding gradients back into df1 --------
    _fold_pad_grads(df_buf, h, w, halo, padding_mode, col_mask)

    # ---- step 3: conv1 backward (mask1 = f1 > 0) ----------------------
    def conv1_bwd(s, db1):
        s0 = m + s * _SROWS
        mask1 = _relu_mask(f_buf[pl.ds(s0, _SROWS)], dtype)
        dpre = (
            (df_buf[pl.ds(s0, _SROWS)] * mask1).astype(jnp.float32) * col_mask
        ).astype(dtype)
        db1 = db1 + jnp.sum(dpre.astype(jnp.float32), axis=(0, 1))
        dpre_px = dpre.reshape(_SROWS * wpp, c)
        sh = _shifted_taps(x1_buf, s0, _SROWS, halo=halo, w=w,
                           padding_mode=padding_mode, dtype=dtype)
        for i in range(3):
            for j in range(3):
                dw1_ref[i * 3 + j] = dw1_ref[i * 3 + j] + contract_px(
                    sh[j][i : i + _SROWS].reshape(_SROWS * wpp, c), dpre_px,
                )
        _transposed_conv_stripe(dx1_buf, dpre_px, w1t_ref, s0, prec)
        return db1

    db1 = jax.lax.fori_loop(0, n_s, conv1_bwd, jnp.zeros((c,), jnp.float32))
    db1_ref[...] = db1_ref[...] + db1.reshape(1, c)

    # dx1 now = do (out residual) + conv path; fold its padding grads
    _fold_pad_grads(dx1_buf, h, w, halo, padding_mode, col_mask)

    # ---- step 4: attention backward -----------------------------------
    dk_img = f_buf    # f no longer needed
    dn_buf = df_buf   # df consumed
    dvi = x1_buf      # x1 no longer needed
    _zero_image_buf(dk_img)
    _zero_image_buf(dvi)

    def attn_bwd(by, dbias_acc):
        # gather do blocks for this block-row (same roll trick as q)
        r0 = m + by * bs
        dorow = pltpu.roll(
            dx1_buf[pl.ds(r0, bs)].astype(jnp.float32), wpp - halo, 1,
        ).astype(dtype)
        for bx in range(wb):
            doall[bx] = dorow[:, bx * bs : (bx + 1) * bs, :].reshape(bs * bs, c)
        dq_all, dkwin, dvwin, dba = _attention_block_row(
            n_buf, k_buf, v_buf, kwin, vwin, qall, bias_ref, wq_ref, by,
            bs=bs, halo=halo, heads=heads, wb=wb, dtype=dtype, prec=prec,
            need_probs=True, doall=doall,
        )
        dq_row = _scatter_blocks_to_row(
            o_scr, dq_all, bs=bs, wb=wb, halo=halo, dtype=dtype,
        )  # [bs, wpp, C] padded layout
        dq_px = dq_row.reshape(bs * wpp, c)
        n_px = n_buf[pl.ds(r0, bs)].reshape(bs * wpp, c)
        dwq_ref[...] = dwq_ref[...] + contract_px(n_px, dq_px)
        # block-rows are disjoint → plain store (dn_buf's dq share)
        dn_buf[pl.ds(r0, bs)] = (
            mm(dq_px, wqt_ref).astype(dtype).reshape(bs, wpp, c)
        )
        # overlap-add the window grads into the margin-padded images
        # (alignment-pad columns carry exactly-zero grads)
        dkw = dkwin.reshape(wb, window, wwin, c)
        dvw = dvwin.reshape(wb, window, wwin, c)
        krow0 = m + by * bs - halo
        for bx in range(wb):
            slw = pl.ds(bx * bs, wwin)
            slr = pl.ds(krow0, window)
            dk_img[slr, slw, :] = dk_img[slr, slw, :] + dkw[bx]
            dvi[slr, slw, :] = dvi[slr, slw, :] + dvw[bx]
        return dbias_acc + dba

    dbias_acc = jax.lax.fori_loop(
        0, h // bs, attn_bwd, jnp.zeros((window * wwin, hd), jnp.float32),
    )
    dbias_ref[...] = dbias_ref[...] + dbias_acc

    # ---- step 5: projection backward + outputs ------------------------
    def proj_bwd(s, dbcat):
        r0 = s * _SROWS
        sm = m + r0
        # out-of-frame dk/dv (margin cols and halo rows) are grads of the
        # zero-masked n_aux / zero-padded x — dropped by the interior mask
        dk = (
            dk_img[pl.ds(sm, _SROWS)].astype(jnp.float32) * col_mask
        ).astype(dtype).reshape(_SROWS * wpp, c)
        dv = (
            dvi[pl.ds(sm, _SROWS)].astype(jnp.float32) * col_mask
        ).astype(dtype).reshape(_SROWS * wpp, c)
        n_px = n_buf[pl.ds(sm, _SROWS)].reshape(_SROWS * wpp, c)
        x_px = x_vm[pl.ds(r0, _SROWS)].reshape(_SROWS * wpp, c)
        a_px = a_vm[pl.ds(r0, _SROWS)].reshape(_SROWS * wpp, c)
        dwk_ref[...] = dwk_ref[...] + contract_px(n_px, dk)
        dwv_ref[...] = dwv_ref[...] + contract_px(x_px, dv)
        dn = (
            dn_buf[pl.ds(sm, _SROWS)].reshape(_SROWS * wpp, c)
            + mm(dk, wkt_ref).astype(dtype)
        )
        dz = dn * _relu_mask(n_px, dtype)
        dbcat = dbcat + jnp.sum(dz.astype(jnp.float32), axis=0)
        dwcat_ref[pl.ds(0, c)] = dwcat_ref[pl.ds(0, c)] + contract_px(x_px, dz)
        dwcat_ref[pl.ds(c, c)] = dwcat_ref[pl.ds(c, c)] + contract_px(a_px, dz)
        dx_rows = (
            dx1_buf[pl.ds(sm, _SROWS)].reshape(_SROWS * wpp, c).astype(jnp.float32)
            + mm(dv, wvt_ref)
            + mm(dz, wcxt_ref)
        ).reshape(_SROWS, wpp, c)
        da_rows = mm(dz, wcat_t_ref).reshape(_SROWS, wpp, c)
        # x/a rows were consumed above — reuse their buffers as the
        # output staging (one whole-image DMA per output at the end)
        x_vm[pl.ds(r0, _SROWS)] = (dx_rows * col_mask).astype(dtype)
        a_vm[pl.ds(r0, _SROWS)] = (da_rows * col_mask).astype(dtype)
        return dbcat

    dbcat = jax.lax.fori_loop(0, n_s, proj_bwd, jnp.zeros((c,), jnp.float32))
    dbcat_ref[...] = dbcat_ref[...] + dbcat.reshape(1, c)

    dxcp = pltpu.make_async_copy(x_vm, dx_ref.at[bi], sems.at[6])
    dacp = pltpu.make_async_copy(a_vm, da_ref.at[bi], sems.at[7])
    dxcp.start()
    dacp.start()
    dxcp.wait()
    dacp.wait()


def _fold_pad_grads(buf, h, w, halo, padding_mode, col_mask):
    """Fold the padding-pixel gradients of a transposed-conv result back
    into the interior (the VJP of reflect/replicate padding), then zero
    the margins. buf holds gradients w.r.t. the PADDED conv input."""
    m = _MARGIN
    wpp = buf.shape[1]
    if padding_mode != "zeros":
        if padding_mode == "reflect":
            dst_top, dst_bot = m + 1, m + h - 2
        else:
            dst_top, dst_bot = m, m + h - 1
        buf[dst_top : dst_top + 1] = (
            buf[dst_top : dst_top + 1].astype(jnp.float32)
            + buf[m - 1 : m].astype(jnp.float32)
        ).astype(buf.dtype)
        buf[dst_bot : dst_bot + 1] = (
            buf[dst_bot : dst_bot + 1].astype(jnp.float32)
            + buf[m + h : m + h + 1].astype(jnp.float32)
        ).astype(buf.dtype)
        # column fold: pad col (halo−1) → interior col; masked rolls
        shift = 2 if padding_mode == "reflect" else 1
        selL = _col_select(wpp, halo - 1 + shift)
        selR = _col_select(wpp, halo + w - shift)

        def fold(s, _):
            sl = pl.ds(m + s * _SROWS, _SROWS)
            rows = buf[sl].astype(jnp.float32)
            rows = rows + (
                pltpu.roll(rows, shift, 1) * selL
                + pltpu.roll(rows, wpp - shift, 1) * selR
            )
            buf[sl] = (rows * col_mask).astype(buf.dtype)
            return 0

        jax.lax.fori_loop(0, h // _SROWS, fold, 0)
    else:
        def fold(s, _):
            sl = pl.ds(m + s * _SROWS, _SROWS)
            buf[sl] = (buf[sl].astype(jnp.float32) * col_mask).astype(buf.dtype)
            return 0

        jax.lax.fori_loop(0, h // _SROWS, fold, 0)
    buf[m - 1 : m] = jnp.zeros_like(buf[m - 1 : m])
    buf[m + h : m + h + 1] = jnp.zeros_like(buf[m + h : m + h + 1])


@partial(
    jax.jit,
    static_argnames=(
        "block_size", "halo_size", "num_heads", "padding_mode", "interpret",
    ),
)
def _mega_bwd(
    xp, ap, x1, f1, m2, do, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1,
    w2, b2,
    *, block_size, halo_size, num_heads, padding_mode, interpret,
):
    b, h, wpp, c = xp.shape
    bs, halo = block_size, halo_size
    w = wpp_to_w(wpp, halo)
    window = bs + 2 * halo
    wwin = _round8(window)
    hd = c // num_heads
    dtype = xp.dtype
    f32 = jnp.float32

    bias = _rel_bias_full(
        rel_h.astype(f32), rel_w.astype(f32), window, num_heads,
    )
    wb = w // bs
    kernel = partial(
        _bwd_kernel, bs=bs, halo=halo, heads=num_heads, h=h, w=w,
        padding_mode=padding_mode,
    )
    acc = partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    mbuf = pltpu.VMEM((h + 2 * _MARGIN, wpp, c), dtype)

    wcat2 = wcat[0, 0].astype(dtype)
    # per-tap-transposed weights packed [C, 9C] (tap-major columns)
    w1t = w1.reshape(9, c, c).transpose(2, 0, 1).reshape(c, 9 * c).astype(dtype)
    w2t = w2.reshape(9, c, c).transpose(2, 0, 1).reshape(c, 9 * c).astype(dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[hbm] * 6 + [
            acc((2 * c, c), lambda bi: (0, 0)),
            acc((1, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((window, wwin, c), lambda bi: (0, 0, 0)),
            acc((c, 9 * c), lambda bi: (0, 0)),
            acc((c, 9 * c), lambda bi: (0, 0)),
        ],
        out_specs=(
            hbm,
            hbm,
            acc((2 * c, c), lambda bi: (0, 0)),
            acc((1, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((c, c), lambda bi: (0, 0)),
            acc((window * wwin, hd), lambda bi: (0, 0)),
            acc((9, c, c), lambda bi: (0, 0, 0)),
            acc((1, c), lambda bi: (0, 0)),
            acc((9, c, c), lambda bi: (0, 0, 0)),
            acc((1, c), lambda bi: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, dtype),
            jax.ShapeDtypeStruct(xp.shape, dtype),
            jax.ShapeDtypeStruct((2 * c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((window * wwin, hd), f32),
            jax.ShapeDtypeStruct((9, c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((9, c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        scratch_shapes=[
            mbuf, mbuf, mbuf, mbuf, mbuf, mbuf, mbuf,
            pltpu.VMEM((h, wpp, c), dtype),
            pltpu.VMEM((h, wpp, c), dtype),
            pltpu.VMEM((2, _SROWS, wpp, c), dtype),
            pltpu.VMEM((wb, window, wwin, c), dtype),
            pltpu.VMEM((wb, window, wwin, c), dtype),
            pltpu.VMEM((wb, bs * bs, c), dtype),
            pltpu.VMEM((wb, bs * bs, c), dtype),
            pltpu.VMEM((bs, wpp, c), f32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp, ap, x1, f1, m2, do.astype(dtype),
        wcat2, bcat.reshape(1, -1).astype(f32),
        wq[0, 0].astype(dtype), wk[0, 0].astype(dtype), wv[0, 0].astype(dtype),
        wq[0, 0].T.astype(dtype), wk[0, 0].T.astype(dtype),
        wv[0, 0].T.astype(dtype),
        wcat2[:c].T, wcat2[c:].T,
        bias, w1t, w2t,
    )
    (dxp, dap, dwcat, dbcat, dwq, dwk, dwv, dbias, dw1, db1, dw2, db2) = outs

    # rel-pos bias gradients (same unpack as attention_pallas)
    half = hd // 2
    dbias = dbias.reshape(window, wwin, hd)[:, :window]
    drel_h = jnp.sum(dbias[..., :half], axis=1).astype(rel_h.dtype)
    drel_w = jnp.sum(dbias[..., half:], axis=0).astype(rel_w.dtype)
    return (
        dxp,
        dap,
        dwcat.reshape(wcat.shape).astype(wcat.dtype),
        dbcat.reshape(bcat.shape).astype(bcat.dtype),
        dwq.reshape(wq.shape).astype(wq.dtype),
        dwk.reshape(wk.shape).astype(wk.dtype),
        dwv.reshape(wv.shape).astype(wv.dtype),
        drel_h,
        drel_w,
        dw1.reshape(3, 3, c, c).astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.reshape(3, 3, c, c).astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
    )


@partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _mega_core(
    xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
    block_size, halo_size, num_heads, padding_mode, interpret,
):
    return _mega_fwd(
        xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
        padding_mode=padding_mode, emit=False, interpret=interpret,
    )


def _vjp_fwd(
    xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
    block_size, halo_size, num_heads, padding_mode, interpret,
):
    out, x1, f1, m2 = _mega_fwd(
        xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
        padding_mode=padding_mode, emit=True, interpret=interpret,
    )
    res = (xp, ap, x1, f1, m2, wcat, bcat, wq, wk, wv, rel_h, rel_w,
           w1, b1, w2, b2)
    return out, res


def _vjp_bwd(block_size, halo_size, num_heads, padding_mode, interpret,
             res, do):
    (xp, ap, x1, f1, m2, wcat, bcat, wq, wk, wv, rel_h, rel_w,
     w1, b1, w2, b2) = res
    return _mega_bwd(
        xp, ap, x1, f1, m2, do, wcat, bcat, wq, wk, wv, rel_h, rel_w,
        w1, b1, w2, b2,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
        padding_mode=padding_mode, interpret=interpret,
    )


_mega_core.defvjp(_vjp_fwd, _vjp_bwd)


def transformer_block_mega_padded(
    xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
    *, block_size=8, halo_size=3, num_heads=4, padding_mode="reflect",
    interpret=False,
):
    """One fused TransformerBlock (forward + custom-VJP backward) on
    W-halo-padded images.

    xp/ap: [B, H, Wpp, C] in the compute dtype with the frame at columns
    [halo, halo+W) (`pad_w_halo`). Weights in their flax param shapes:
    wcat [1,1,2C,C] ([noisy; aux] input order), wq/wk/wv [1,1,C,C],
    w1/w2 [3,3,C,C], biases [C], rel_h/rel_w [window, head_ch//2].
    Returns the block output in the same padded layout (margin columns
    zero), ready to feed the next block unchanged.
    """
    return _mega_core(
        xp, ap, wcat, bcat, wq, wk, wv, rel_h, rel_w, w1, b1, w2, b2,
        block_size, halo_size, num_heads, padding_mode, interpret,
    )


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
