"""Fused Pallas TPU kernel for block-halo attention.

Replaces the XLA path's materialized halo windows (~206 MB per tensor per
layer at prod shapes) and fp32 logits (~411 MB) with an in-VMEM fused
kernel. Each grid program owns one (batch, block-row) stripe, DMAs the
(block+2·halo)-row slice of the k/v images into VMEM — the vertical halo
rows outside the frame are zero-filled in VMEM, so the images never get
padded in HBM — and computes q·kᵀ (+relative positional bias), an fp32
softmax, and attn·v without touching HBM.

Kernel structure (v4 — stripe-batched, double-buffered stripe DMA,
image-accumulating backward): per-block work is batched into per-head
`dot_general`s with the block axis as a batch dimension, so each stripe
issues ~8 batched MXU ops instead of hundreds of tiny ones. The 14-wide
halo windows are staged into tile-aligned 16-wide buffers (one aligned
VMEM copy per block); the two alignment-padding columns per window row
are masked to -inf in the softmax — they fall inside the same padded MXU
tile, so they cost nothing, and their gradients are exactly zero, which
lets the backward accumulate full aligned windows. The k/v stripe copies
are double-buffered across the sequential stripe grid dimension
(prefetch stripe i+1 while computing stripe i) — v3 start-and-wait
serialized ~10 µs of HBM latency per program on the critical path, and
removing it measured 73.2 → 76.2 patches/sec on the prod bench
(BASELINE.md round 3).

The backward pass is a sibling kernel (same stripe structure, one
recompute of the attention probabilities) that emits dq and accumulates
dk/dv directly into per-batch image blocks kept in VMEM across the
sequential stripe iterations (grid revisiting) — stripes overlap by the
halo rows, and the overlap-add happens in VMEM instead of a separate XLA
fold pass over per-stripe window tensors. Rel-bias gradients accumulate
the same way and reduce over batch outside.

Curve orderings (reference `model.py:477,506`) are intentionally absent:
permuting queries within a block and inverse-permuting the output is an
exact mathematical no-op because attention treats query rows
independently — verified against the torch oracle for raster/hilbert/
z-order in tests/test_attention.py.

Semantics match `ops.attention.block_halo_attention_xla` (reference
`pht/models/afgsa/model.py:456-516`): out-of-frame halo keys are zero
vectors that still receive the relative positional bias and participate in
the softmax (the reference's `F.unfold` zero padding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return n + ((-n) % 8)


def _rel_bias_full(rel_h: jnp.ndarray, rel_w: jnp.ndarray, window: int, heads: int):
    """[window, wwin, C] additive key bias: first half of each head's
    channels is the row embedding, second half the column embedding
    (reference model.py:490-498); identical across heads. Columns past
    `window` (alignment padding) are zero — they are masked in the
    softmax and never contribute."""
    wwin = _round8(window)
    half = rel_h.shape[-1]
    hd = 2 * half
    rel_w_pad = jnp.pad(rel_w, ((0, wwin - window), (0, 0)))
    bias = jnp.concatenate(
        [
            jnp.broadcast_to(rel_h[:, None, :], (window, wwin, half)),
            jnp.broadcast_to(rel_w_pad[None, :, :], (window, wwin, half)),
        ],
        axis=-1,
    )  # [window, wwin, hd]
    return jnp.tile(bias, (1, 1, heads)).reshape(window, wwin, hd * heads)


def _mask_add(window: int, wwin: int) -> jnp.ndarray:
    """[1, 1, window·wwin] additive logits mask: 0 on real window columns,
    -inf on the alignment-padding columns."""
    n = window * wwin
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    return jnp.where(col % wwin < window, 0.0, -1e30).astype(jnp.float32)


def _stripe_dma(ref, scr, sem, bi, i, *, rows_per, halo, n_programs, phase):
    """The halo-extended row-stripe DMA [i·rows_per−halo, …+rows_per+2·halo)
    of an UNPADDED-H image into `scr`, zero-filling the rows outside the
    frame. `phase` is "start" (zero-fill + cp.start()) or "wait"
    (cp.wait() on the identical descriptor) so callers can overlap the
    copy with compute — the start/wait pair must use the same (bi, i, scr,
    sem) arguments.

    Emits one static-shape copy per boundary case (Pallas DMAs need static
    sizes). `n_programs` is static, so the single-stripe case is a Python
    branch; `i` may be traced (prefetch of stripe i+1 passes a traced
    index).
    """
    srows = rows_per + 2 * halo
    himg = ref.shape[1]
    start = phase == "start"

    def zero_rows(lo, hi):
        scr[lo:hi] = jnp.zeros_like(scr[lo:hi])

    def run(cp, zeros):
        if start:
            for lo, hi in zeros:
                zero_rows(lo, hi)
            cp.start()
        else:
            cp.wait()

    if n_programs == 1:
        # one stripe: both edges are frame boundary
        rows = min(himg, srows - halo)
        run(
            pltpu.make_async_copy(
                ref.at[bi, pl.ds(0, rows)], scr.at[pl.ds(halo, rows)], sem,
            ),
            [(0, halo), (halo + rows, srows)],
        )
        return

    @pl.when(i == 0)
    def _():
        run(
            pltpu.make_async_copy(
                ref.at[bi, pl.ds(0, srows - halo)],
                scr.at[pl.ds(halo, srows - halo)],
                sem,
            ),
            [(0, halo)],
        )

    @pl.when(jnp.logical_and(i > 0, i < n_programs - 1))
    def _():
        run(
            pltpu.make_async_copy(
                ref.at[bi, pl.ds(i * rows_per - halo, srows)], scr, sem,
            ),
            [],
        )

    @pl.when(i == n_programs - 1)
    def _():
        run(
            pltpu.make_async_copy(
                ref.at[bi, pl.ds(i * rows_per - halo, srows - halo)],
                scr.at[pl.ds(0, srows - halo)],
                sem,
            ),
            [(srows - halo, srows)],
        )


def _load_stripes_double_buffered(k_ref, v_ref, k_scr, v_scr, sems, bi, i, *,
                                  rows_per, halo, n_programs):
    """Double-buffered k/v stripe staging (guide "Patterns: Double
    Buffering"): on the first stripe of each batch element, start the
    slot-0 copies; every program then prefetches stripe i+1 into the other
    slot BEFORE blocking on its own stripe, so the next stripe's HBM
    transfer overlaps this stripe's windowing/matmul work. Prefetch stays
    within one batch element — crossing the (parallel) batch grid dim
    would assume cross-core sequencing Mosaic does not guarantee.

    k_scr/v_scr are [2, srows, Wpp, C] slot-major scratch; sems is a
    DMA-semaphore array indexed [kv, slot]. Returns the slot holding the
    current stripe."""
    kw = dict(rows_per=rows_per, halo=halo, n_programs=n_programs)
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        _stripe_dma(k_ref, k_scr.at[0], sems.at[0, 0], bi, i, phase="start", **kw)
        _stripe_dma(v_ref, v_scr.at[0], sems.at[1, 0], bi, i, phase="start", **kw)

    if n_programs > 1:
        @pl.when(i + 1 < n_programs)
        def _():
            nslot = jax.lax.rem(i + 1, 2)
            _stripe_dma(
                k_ref, k_scr.at[nslot], sems.at[0, nslot], bi, i + 1,
                phase="start", **kw,
            )
            _stripe_dma(
                v_ref, v_scr.at[nslot], sems.at[1, nslot], bi, i + 1,
                phase="start", **kw,
            )

    _stripe_dma(k_ref, k_scr.at[slot], sems.at[0, slot], bi, i, phase="wait", **kw)
    _stripe_dma(v_ref, v_scr.at[slot], sems.at[1, slot], bi, i, phase="wait", **kw)
    return slot


def _rows_per_program(hb: int, bs: int, cap: int = 4) -> int:
    """Block-rows handled by one grid program: amortizes the per-stripe
    DMA/staging/softmax overhead over more MXU work. Capped so the staged
    windows and fp32 softmax temporaries fit VMEM; must divide hb. The
    backward caps at 2: its per-batch dk/dv image accumulators plus the
    fp32 dattn/dlogits chain blow the 128M VMEM budget at 4 (measured
    136.8M on v5e). rb=8 in the forward fits VMEM but measured net-slower
    (73.2 -> 72.8 patches/sec), so 4 is the ceiling. The VMEM-fit ceilings
    were measured at bs=8; staged scratch scales roughly with rb·bs, so
    larger configured block sizes shrink the cap proportionally instead of
    failing at Mosaic compile time."""
    cap = max(1, (cap * 8) // bs)
    for rb in (4, 2):
        if rb <= cap and hb % rb == 0:
            return rb
    return 1


def _fwd_kernel(
    q_ref,      # [1, rb·bs, W, C] VMEM
    k_ref,      # [1, H, Wpp, C] HBM (W-padded, H raw)
    v_ref,      # [1, H, Wpp, C] HBM
    bias_ref,   # [window, wwin, C] VMEM fp32
    o_ref,      # [1, rb·bs, W, C] VMEM
    k_scr,      # [2, rb·bs + 2·halo, Wpp, C] VMEM scratch (double-buffered)
    v_scr,
    kwin,       # [rb·wb, window, wwin, C] VMEM scratch (aligned windows)
    vwin,
    qall,       # [rb·wb, bs², C] VMEM scratch (block-gathered queries)
    sems,       # DMA semaphores (2, 2) — [kv, slot]
    *,
    bs: int,
    halo: int,
    heads: int,
    wb: int,
    rb: int,
    n_programs: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    window = bs + 2 * halo
    wwin = _round8(window)
    n = window * wwin
    nb = rb * wb
    c = q_ref.shape[-1]
    hd = c // heads
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    dtype = q_ref.dtype
    # exact f32 matmuls for f32 operands; bf16 operands take the MXU
    # fast path with f32 accumulation
    prec = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    slot = _load_stripes_double_buffered(
        k_ref, v_ref, k_scr, v_scr, sems, bi, i,
        rows_per=rb * bs, halo=halo, n_programs=n_programs,
    )

    # stage aligned windows + block-gathered queries (all slices land on
    # 8-sublane boundaries: bs and wwin are multiples of 8)
    for by in range(rb):
        for bx in range(wb):
            idx = by * wb + bx
            kwin[idx] = k_scr[slot, by * bs : by * bs + window, pl.ds(bx * bs, wwin), :]
            vwin[idx] = v_scr[slot, by * bs : by * bs + window, pl.ds(bx * bs, wwin), :]
            qall[idx] = q_ref[
                0, by * bs : (by + 1) * bs, pl.ds(bx * bs, bs), :,
            ].reshape(bs * bs, c)
    # fold the rel-pos bias into the keys once per stripe
    kwin[...] = (kwin[...].astype(jnp.float32) + bias_ref[...][None]).astype(dtype)

    kv = kwin[...].reshape(nb, n, c)
    vv = vwin[...].reshape(nb, n, c)
    qv = qall[...]
    mask = _mask_add(window, wwin)

    outs = []
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        logits = jax.lax.dot_general(
            qv[:, :, sl], kv[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale + mask  # [nb, bs², n]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dtype)
        outs.append(
            jax.lax.dot_general(
                attn, vv[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec,
            ),  # [nb, bs², hd]
        )
    o_all = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    for by in range(rb):
        for bx in range(wb):
            o_ref[0, by * bs : (by + 1) * bs, pl.ds(bx * bs, bs), :] = (
                o_all[by * wb + bx].reshape(bs, bs, c)
            )


def _pad_w(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Zero-pad W by the halo (rounding up so the last block's aligned
    16-wide window stays in bounds and every Mosaic memref slice is
    sublane-tile aligned); H is handled in-kernel by `_load_stripe`.

    Written as an update-slice into zeros: XLA lowers the equivalent PAD
    op at ~40 GB/s on TPU (measured 0.45 ms per layer), the copy path
    streams near memory bandwidth."""
    b, h, w, c = x.shape
    wp = _round8(w + 2 * halo)
    buf = jnp.zeros((b, h, wp, c), x.dtype)
    return jax.lax.dynamic_update_slice(buf, x, (0, 0, halo, 0))


def _padded_w(w: int, halo: int) -> int:
    return _round8(w + 2 * halo)


@partial(jax.jit, static_argnames=("block_size", "halo_size", "num_heads"))
def _attention_fwd(q, kp, vp, rel_h, rel_w, *, block_size, halo_size, num_heads):
    """Forward kernel dispatch. kp/vp are already W-halo-padded (`_pad_w`)
    so the custom VJP can reuse one padding for both passes."""
    b, hgt, wdt, c = q.shape
    bs, halo = block_size, halo_size
    assert bs % 8 == 0, "Pallas path requires 8-aligned blocks (bs % 8 == 0)"
    hb, wb = hgt // bs, wdt // bs
    window = bs + 2 * halo
    wwin = _round8(window)
    out_dtype = q.dtype
    # operands stay in the model dtype (bf16 matmul inputs hit the MXU fast
    # path); logits/softmax accumulate in f32
    bias = _rel_bias_full(
        rel_h.astype(jnp.float32), rel_w.astype(jnp.float32), window, num_heads,
    )

    rb = _rows_per_program(hb, bs, cap=4)
    n_programs = hb // rb
    kernel = partial(
        _fwd_kernel, bs=bs, halo=halo, heads=num_heads, wb=wb, rb=rb,
        n_programs=n_programs,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_programs),
        in_specs=[
            pl.BlockSpec(
                (1, rb * bs, wdt, c), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (window, wwin, c), lambda bi, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb * bs, wdt, c), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rb * bs + 2 * halo, _padded_w(wdt, halo), c), q.dtype),
            pltpu.VMEM((2, rb * bs + 2 * halo, _padded_w(wdt, halo), c), q.dtype),
            pltpu.VMEM((rb * wb, window, wwin, c), q.dtype),
            pltpu.VMEM((rb * wb, window, wwin, c), q.dtype),
            pltpu.VMEM((rb * wb, bs * bs, c), q.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, kp, vp, bias)
    return out.astype(out_dtype)


def _bwd_kernel(
    q_ref,       # [1, rb·bs, W, C] VMEM
    k_ref,       # [1, H, Wpp, C] HBM
    v_ref,       # [1, H, Wpp, C] HBM
    bias_ref,    # [window, wwin, C] VMEM fp32
    do_ref,      # [1, rb·bs, W, C] VMEM
    dq_ref,      # [1, rb·bs, W, C] VMEM out
    dki_ref,     # [1, H, Wpp, C] VMEM out — per-batch image accumulator
    dvi_ref,     # [1, H, Wpp, C] VMEM out
    dbias_ref,   # [1, window·wwin, hd] VMEM out — per-batch fp32 accumulator
    k_scr,
    v_scr,
    kwin,
    vwin,
    qall,
    doall,
    sems,
    *,
    bs: int,
    halo: int,
    heads: int,
    wb: int,
    rb: int,
    n_programs: int,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    window = bs + 2 * halo
    wwin = _round8(window)
    n = window * wwin
    nb = rb * wb
    c = q_ref.shape[-1]
    hd = c // heads
    scale = jnp.asarray(hd, jnp.float32) ** -0.5
    dtype = q_ref.dtype
    # exact f32 matmuls for f32 operands; bf16 operands take the MXU
    # fast path with f32 accumulation
    prec = (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    slot = _load_stripes_double_buffered(
        k_ref, v_ref, k_scr, v_scr, sems, bi, i,
        rows_per=rb * bs, halo=halo, n_programs=n_programs,
    )

    # the dk/dv image blocks are revisited across the (sequential) stripe
    # iterations of one batch element; initialize on the first stripe
    @pl.when(i == 0)
    def _():
        dki_ref[...] = jnp.zeros_like(dki_ref)
        dvi_ref[...] = jnp.zeros_like(dvi_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for by in range(rb):
        for bx in range(wb):
            idx = by * wb + bx
            kwin[idx] = k_scr[slot, by * bs : by * bs + window, pl.ds(bx * bs, wwin), :]
            vwin[idx] = v_scr[slot, by * bs : by * bs + window, pl.ds(bx * bs, wwin), :]
            qall[idx] = q_ref[
                0, by * bs : (by + 1) * bs, pl.ds(bx * bs, bs), :,
            ].reshape(bs * bs, c)
            doall[idx] = do_ref[
                0, by * bs : (by + 1) * bs, pl.ds(bx * bs, bs), :,
            ].reshape(bs * bs, c)
    kwin[...] = (kwin[...].astype(jnp.float32) + bias_ref[...][None]).astype(dtype)

    kv = kwin[...].reshape(nb, n, c)
    vv = vwin[...].reshape(nb, n, c)
    qv = qall[...]
    dov = doall[...]
    mask = _mask_add(window, wwin)

    dq_parts, dk_parts, dv_parts = [], [], []
    dbias_acc = jnp.zeros((n, hd), jnp.float32)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh, doh = qv[:, :, sl], kv[:, :, sl], vv[:, :, sl], dov[:, :, sl]
        logits = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale + mask
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32 [wb, bs², n]

        dattn = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [wb, bs², n]
        dlogits = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        dl = dlogits.astype(dtype)
        attn_c = attn.astype(dtype)
        dqh = jax.lax.dot_general(
            dl, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale  # [wb, bs², hd]
        dkh = jax.lax.dot_general(
            dl, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        ) * scale  # [wb, n, hd]
        dvh = jax.lax.dot_general(
            attn_c, doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # [wb, n, hd]
        dq_parts.append(dqh)
        dk_parts.append(dkh)
        dv_parts.append(dvh)
        dbias_acc = dbias_acc + jnp.sum(dkh, axis=0).astype(jnp.float32)

    dq_all = jnp.concatenate(dq_parts, axis=-1).astype(dq_ref.dtype)
    dkwin = jnp.concatenate(dk_parts, axis=-1).astype(dki_ref.dtype)
    dvwin = jnp.concatenate(dv_parts, axis=-1).astype(dvi_ref.dtype)
    dkwin = dkwin.reshape(nb, window, wwin, c)
    dvwin = dvwin.reshape(nb, window, wwin, c)

    for by in range(rb):
        for bx in range(wb):
            dq_ref[0, by * bs : (by + 1) * bs, pl.ds(bx * bs, bs), :] = (
                dq_all[by * wb + bx].reshape(bs, bs, c)
            )

    # overlap-add the window grads straight into the VMEM image blocks:
    # window row j of block-row `by` maps to image row
    # i·rb·bs + by·bs − halo + j; rows outside the frame are grads of the
    # zero-filled halo — dropped. The alignment padding columns carry
    # exactly-zero gradients (attn == dlogits == 0 there), so accumulating
    # full aligned windows over W is correct.
    def accumulate(by: int, jlo: int, jhi: int, row0):
        rows = jhi - jlo
        for bx in range(wb):
            idx = by * wb + bx
            sl_w = pl.ds(bx * bs, wwin)
            sl_r = pl.ds(row0, rows)
            dki_ref[0, sl_r, sl_w, :] = (
                dki_ref[0, sl_r, sl_w, :] + dkwin[idx, jlo:jhi]
            )
            dvi_ref[0, sl_r, sl_w, :] = (
                dvi_ref[0, sl_r, sl_w, :] + dvwin[idx, jlo:jhi]
            )

    def accumulate_all(first: bool, last: bool):
        # image row of window row jlo for block-row by, relative to the
        # stripe base i·rb·bs
        for by in range(rb):
            jlo = halo if (first and by == 0) else 0
            jhi = window - halo if (last and by == rb - 1) else window
            base = by * bs - halo + jlo
            accumulate(by, jlo, jhi, i * (rb * bs) + base)

    if n_programs == 1:
        accumulate_all(True, True)
    else:
        @pl.when(i == 0)
        def _():
            accumulate_all(True, False)

        @pl.when(jnp.logical_and(i > 0, i < n_programs - 1))
        def _():
            accumulate_all(False, False)

        @pl.when(i == n_programs - 1)
        def _():
            accumulate_all(False, True)

    # bias gradients DO include the out-of-frame halo keys: the bias was
    # added to those zero keys and they participated in the softmax
    dbias_ref[0] = dbias_ref[0] + dbias_acc


@partial(jax.jit, static_argnames=("block_size", "halo_size", "num_heads"))
def _attention_bwd_padded(q, kp, vp, rel_h, rel_w, do, *, block_size, halo_size, num_heads):
    """Backward kernel dispatch returning dk/dv as W-halo-PADDED images
    ([b, H, Wp, C], matching kp/vp). kp/vp are the padded tensors saved by
    the forward (one padding shared by both passes).

    Keeping the outputs padded lets the fused-qkv path run every
    consuming matmul (dW and the d-input projections) on tile-aligned
    tensors: the halo columns of the *inputs* (n_auxp/noisyp) are zero, so
    they cancel the halo dk/dv contributions in dW exactly, and the one
    remaining unpad slice happens on the projected d-input AFTER its
    aligned matmul — the profiler measured the slice-fused matmuls of the
    unpadded formulation at 29.5 TFLOP/s vs ~190 for aligned ones."""
    b, hgt, wdt, c = q.shape
    bs, halo = block_size, halo_size
    assert bs % 8 == 0, "Pallas path requires 8-aligned blocks (bs % 8 == 0)"
    hb, wb = hgt // bs, wdt // bs
    window = bs + 2 * halo
    wwin = _round8(window)
    wp = _padded_w(wdt, halo)
    dof = do.astype(q.dtype)
    bias = _rel_bias_full(
        rel_h.astype(jnp.float32), rel_w.astype(jnp.float32), window, num_heads,
    )
    hd = c // num_heads

    rb = _rows_per_program(hb, bs, cap=2)
    n_programs = hb // rb
    kernel = partial(
        _bwd_kernel, bs=bs, halo=halo, heads=num_heads, wb=wb, rb=rb,
        n_programs=n_programs,
    )
    dq, dk_img, dv_img, dbias_b = pl.pallas_call(
        kernel,
        grid=(b, n_programs),
        in_specs=[
            pl.BlockSpec((1, rb * bs, wdt, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((window, wwin, c), lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb * bs, wdt, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rb * bs, wdt, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
            # dk/dv: whole-image blocks revisited across stripes (i is
            # sequential), accumulated in VMEM, written back once per batch
            pl.BlockSpec((1, hgt, wp, c), lambda bi, i: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hgt, wp, c), lambda bi, i: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, window * wwin, hd), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, bs * hb, wdt, c), q.dtype),
            # image grads in the model dtype (same precision as the v2
            # window-tensor fold, at ~1/14th the HBM traffic)
            jax.ShapeDtypeStruct((b, hgt, wp, c), kp.dtype),
            jax.ShapeDtypeStruct((b, hgt, wp, c), kp.dtype),
            jax.ShapeDtypeStruct((b, window * wwin, hd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rb * bs + 2 * halo, wp, c), q.dtype),
            pltpu.VMEM((2, rb * bs + 2 * halo, wp, c), q.dtype),
            pltpu.VMEM((rb * wb, window, wwin, c), q.dtype),
            pltpu.VMEM((rb * wb, window, wwin, c), q.dtype),
            pltpu.VMEM((rb * wb, bs * bs, c), q.dtype),
            pltpu.VMEM((rb * wb, bs * bs, c), q.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, kp, vp, bias, dof)

    dbias = jnp.sum(dbias_b, axis=0)  # [window·wwin, hd]
    half = hd // 2
    dbias = dbias.reshape(window, wwin, hd)[:, :window]
    drel_h = jnp.sum(dbias[..., :half], axis=1).astype(rel_h.dtype)
    drel_w = jnp.sum(dbias[..., half:], axis=0).astype(rel_w.dtype)
    return dq.astype(q.dtype), dk_img, dv_img, drel_h, drel_w


def _attention_bwd_impl(q, kp, vp, rel_h, rel_w, do, *, block_size, halo_size, num_heads):
    """Backward with dk/dv unpadded to the image width (the plain q/k/v
    entry point's contract)."""
    wdt = q.shape[2]
    dq, dk_img, dv_img, drel_h, drel_w = _attention_bwd_padded(
        q, kp, vp, rel_h, rel_w, do,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
    )
    dk = dk_img[:, :, halo_size : halo_size + wdt].astype(kp.dtype)
    dv = dv_img[:, :, halo_size : halo_size + wdt].astype(vp.dtype)
    return dq, dk, dv, drel_h, drel_w


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attention_core(q, k, v, rel_h, rel_w, block_size, halo_size, num_heads):
    return _attention_fwd(
        q, _pad_w(k, halo_size), _pad_w(v, halo_size), rel_h, rel_w,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
    )


def _core_fwd(q, k, v, rel_h, rel_w, block_size, halo_size, num_heads):
    # pad once; the padded tensors are the residuals, so the backward
    # kernel reads them directly instead of re-padding k/v
    kp = _pad_w(k, halo_size)
    vp = _pad_w(v, halo_size)
    out = _attention_fwd(
        q, kp, vp, rel_h, rel_w,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
    )
    return out, (q, kp, vp, rel_h, rel_w)


def _core_bwd(block_size, halo_size, num_heads, res, do):
    q, kp, vp, rel_h, rel_w = res
    return _attention_bwd_impl(
        q, kp, vp, rel_h, rel_w, do,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
    )


_attention_core.defvjp(_core_fwd, _core_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def qkv_block_halo_attention_pallas(
    n_aux, noisy, wq, wk, wv, rel_h, rel_w, block_size, halo_size, num_heads,
):
    """Block-halo attention with the q/k/v 1×1 projections folded into the
    op (the ROADMAP "qkv folding" structural move, done at the XLA level).

    Instead of projecting q/k/v as separate convs and W-halo-padding k/v
    afterwards, the *inputs* are padded once (`n_auxp`/`noisyp`) and k/v
    are projected FROM the padded tensors (the pad columns are zero, and
    0·W = 0, so `kp ≡ _pad_w(k)` exactly). The payoff is in the backward:
    every matmul touching dk/dv runs on tile-aligned padded tensors —
    dWk = n_auxpᵀ·dkp needs no unpad at all (zero input columns cancel
    the halo grads), and the d-input slice happens after its aligned
    projection matmul instead of being fused into it (profiler: 29.5 vs
    ~190 TFLOP/s). Weights are [C, C] (the 1×1 conv kernels at [0, 0]).
    """
    out, _ = _qkv_core_fwd(
        n_aux, noisy, wq, wk, wv, rel_h, rel_w,
        block_size, halo_size, num_heads,
    )
    return out


def _qkv_project(x, w):
    # mirrors layers.Conv's plain 1×1 path (bf16 MXU matmul)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)


def _qkv_core_fwd(
    n_aux, noisy, wq, wk, wv, rel_h, rel_w, block_size, halo_size, num_heads,
):
    _, hgt, wdt, _ = n_aux.shape
    if hgt % block_size != 0 or wdt % block_size != 0:
        # same loud guard as the block_halo_attention dispatcher
        # (reference model.py:469-471)
        raise ValueError(
            f"feature map H×W = {hgt}×{wdt} must be divisible by "
            f"block_size={block_size}; pad or tile the input "
            f"(inference.py tiles full frames to block-aligned sizes)",
        )
    n_auxp = _pad_w(n_aux, halo_size)
    noisyp = _pad_w(noisy, halo_size)
    q = _qkv_project(n_aux, wq)
    kp = _qkv_project(n_auxp, wk)
    vp = _qkv_project(noisyp, wv)
    out = _attention_fwd(
        q, kp, vp, rel_h, rel_w,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
    )
    return out, (n_aux, n_auxp, noisyp, q, kp, vp, wq, wk, wv, rel_h, rel_w)


def _qkv_core_bwd(block_size, halo_size, num_heads, res, do):
    n_aux, n_auxp, noisyp, q, kp, vp, wq, wk, wv, rel_h, rel_w = res
    w = n_aux.shape[2]
    dq, dkp, dvp, drel_h, drel_w = _attention_bwd_padded(
        q, kp, vp, rel_h, rel_w, do,
        block_size=block_size, halo_size=halo_size, num_heads=num_heads,
    )
    f32 = jnp.float32
    # weight grads on the PADDED tensors: halo columns of n_auxp/noisyp are
    # zero, so the halo dk/dv gradients cancel exactly — no unpad slice
    dwq = jnp.einsum("bhwc,bhwd->cd", n_aux, dq, preferred_element_type=f32)
    dwk = jnp.einsum("bhwc,bhwd->cd", n_auxp, dkp, preferred_element_type=f32)
    dwv = jnp.einsum("bhwc,bhwd->cd", noisyp, dvp, preferred_element_type=f32)
    # input grads: project on the aligned padded width, THEN unpad — the
    # slice is a cheap standalone pad-transpose instead of crippling the
    # matmul's tiling
    dnap = _qkv_project(dkp, wk.T)
    dnop = _qkv_project(dvp, wv.T)
    dn_aux = _qkv_project(dq, wq.T) + dnap[:, :, halo_size : halo_size + w]
    dnoisy = dnop[:, :, halo_size : halo_size + w]
    return (
        dn_aux,
        dnoisy,
        dwq.astype(wq.dtype),
        dwk.astype(wk.dtype),
        dwv.astype(wv.dtype),
        drel_h,
        drel_w,
    )


qkv_block_halo_attention_pallas.defvjp(_qkv_core_fwd, _qkv_core_bwd)


def block_halo_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    curve_indices=None,
    inv_curve_indices=None,
    *,
    block_size: int,
    halo_size: int,
    num_heads: int,
) -> jnp.ndarray:
    """Drop-in fused replacement for `block_halo_attention_xla`.

    curve indices are accepted for signature compatibility and ignored —
    the permutation cancels exactly (see module docstring).
    """
    del curve_indices, inv_curve_indices
    return _attention_core(
        q, k, v, rel_h, rel_w, block_size, halo_size, num_heads,
    )
