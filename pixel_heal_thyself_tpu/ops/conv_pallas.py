"""Fused Pallas TPU kernel: causal depthwise conv1d + bias + SiLU over a
column window of the Mamba2 in-projection output.

The Mamba2 prologue (reference semantics: `mamba_ssm`'s fused
causal-conv1d, SURVEY §2.9) is HBM-bound in the XLA formulation: the
xBC slice of `zxbcdt` [b, l, 2·d_inner+2·n·d_state+heads] materializes,
the 4-tap shifted-MADD conv writes both its pre-activation (saved for the
SiLU backward) and its output, and the backward re-reads all of them —
the per-layer xplane profile attributes ~11 ms of 0.6 TFLOP/s loop
fusions to this neighborhood (BASELINE.md round-3). This kernel fuses the
whole chain:

- forward: DMA the [rows, width] window of `zxbcdt` straight out of HBM
  (the column offset never materializes as an XLA slice), compute the
  4 taps with hardware sublane rotates (`pltpu.roll`), add bias, SiLU,
  write y — one read + one write of the activation.
- backward: one sibling kernel recomputes the pre-activation (cheaper
  than saving it), forms dpre = dy·silu'(pre), and emits dxBC (anti-
  causal rotates) plus per-(batch)-accumulated tap/bias gradients in the
  same pass.

Alignment notes (the Mosaic constraints that shaped the design, see the
BASELINE.md round-2 negative result on in-kernel W-halo DMA): scratch
rows are the sublane dim, so all VMEM row slices use offsets that are
multiples of 8 — the causal context is loaded as 8 rows (not k-1=3) and
the off-by-1..3 tap shifts happen via `pltpu.roll`, which rotates
sublanes in-register instead of slicing. HBM-side DMA row offsets are
unconstrained. Column offsets/widths must be lane-tile (128) aligned —
`supports_shapes` gates that, and the caller falls back to the XLA
shifted-MADD form (`ops/conv.py`) otherwise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CTX = 8  # loaded causal context rows (>= k-1, multiple of the sublane tile)


def supports_shapes(l: int, offset: int, width: int, k: int, l_tile: int) -> bool:
    """Static gate for the Pallas path (caller falls back to XLA)."""
    return (
        k <= _CTX + 1
        and offset % 128 == 0
        and width % 128 == 0
        and l % l_tile == 0
        and l_tile % 8 == 0
    )


def _pick_l_tile(l: int) -> int:
    for lt in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if l % lt == 0:
            return lt
    return l


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _load_rows(ref, scr, sem, bi, i, *, l_tile, offset, width, right_ctx):
    """DMA rows [i·l_tile − _CTX, i·l_tile + l_tile (+ _CTX)) of the
    [l, width] column window of `ref` into `scr`, zero-filling rows that
    fall outside the sequence.

    `ref` is viewed as [b, l/8, 8, cols] and `scr` as [rows/8, 8, width]:
    the row dimension lives on an UNTILED axis in groups of 8, so every
    DMA offset (all multiples of 8 rows = whole groups) is trivially
    tile-aligned — a 3-D [l, c] view would put rows on the sublane dim,
    where Mosaic cannot prove `i·l_tile − 8` divisible by the tile."""
    l = ref.shape[1] * 8
    n_programs = l // l_tile
    rows_main = l_tile + _CTX
    cols = pl.ds(offset, width)

    def dma(src_lo, rows, dst_lo):
        cp = pltpu.make_async_copy(
            ref.at[bi, pl.ds(src_lo // 8, rows // 8), :, cols],
            scr.at[pl.ds(dst_lo // 8, rows // 8)],
            sem,
        )
        cp.start()
        cp.wait()

    def zero(lo, hi):
        scr[lo // 8:hi // 8] = jnp.zeros_like(scr[lo // 8:hi // 8])

    if not right_ctx:
        if n_programs == 1:
            zero(0, _CTX)
            dma(0, l_tile, _CTX)
            return

        @pl.when(i == 0)
        def _():
            zero(0, _CTX)
            dma(0, l_tile, _CTX)

        @pl.when(i > 0)
        def _():
            dma(i * l_tile - _CTX, rows_main, 0)

        return

    # right_ctx: scr has _CTX extra rows at the tail as well
    if n_programs == 1:
        zero(0, _CTX)
        zero(_CTX + l_tile, 2 * _CTX + l_tile)
        dma(0, l_tile, _CTX)
        return

    @pl.when(i == 0)
    def _():
        zero(0, _CTX)
        dma(0, l_tile + _CTX, _CTX)

    @pl.when(jnp.logical_and(i > 0, i < n_programs - 1))
    def _():
        dma(i * l_tile - _CTX, l_tile + 2 * _CTX, 0)

    @pl.when(i == n_programs - 1)
    def _():
        zero(_CTX + l_tile, 2 * _CTX + l_tile)
        dma(i * l_tile - _CTX, l_tile + _CTX, 0)


def _conv_rows(scr, wb_ref, k: int, lo: int, rows: int):
    """Σ_t w[t]·x[j−(k−1−t)] + bias over scr rows [lo, lo+rows) via
    sublane rotates; lo and rows are multiples of 8."""
    sl = slice(lo, lo + rows)
    # Mosaic's sublane rotate supports 32-bit data only — roll in f32
    # (the taps accumulate in f32 regardless)
    x32 = scr[...].reshape(-1, scr.shape[-1]).astype(jnp.float32)
    acc = x32[sl] * wb_ref[k - 1, :]
    for t in range(k - 1):
        s = k - 1 - t  # right-shift distance for tap t
        acc = acc + pltpu.roll(x32, s, 0)[sl] * wb_ref[t, :]
    return acc + wb_ref[k, :]


def _fwd_kernel(z_ref, wb_ref, o_ref, scr, sem, *, l_tile, offset, width, k):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    _load_rows(
        z_ref, scr, sem, bi, i,
        l_tile=l_tile, offset=offset, width=width, right_ctx=False,
    )
    pre = _conv_rows(scr, wb_ref, k, _CTX, l_tile)
    o_ref[0] = _silu(pre).astype(o_ref.dtype)


def _bwd_kernel(
    z_ref, wb_ref, dy_ref, dx_ref, dwb_ref, x_scr, dy_scr, sems,
    *, l_tile, offset, width, k,
):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    _load_rows(
        z_ref, x_scr, sems.at[0], bi, i,
        l_tile=l_tile, offset=offset, width=width, right_ctx=True,
    )
    # dy needs the NEXT tile's head for the anti-causal taps; reuse the
    # same both-sided loader (the unused left context costs nothing)
    _load_rows(
        dy_ref, dy_scr, sems.at[1], bi, i,
        l_tile=l_tile, offset=0, width=width, right_ctx=True,
    )

    @pl.when(i == 0)
    def _():
        dwb_ref[...] = jnp.zeros_like(dwb_ref)

    rows = l_tile + 2 * _CTX
    # pre-activation over the whole scratch (tile + right context); the
    # left-context rows compute garbage but are never read back
    pre = _conv_rows(x_scr, wb_ref, k, 0, rows)
    sig = jax.nn.sigmoid(pre)
    dsilu = sig * (1.0 + pre * (1.0 - sig))
    dy_rows = dy_scr[...].reshape(rows, -1).astype(jnp.float32)
    dpre = dy_rows * dsilu  # [rows, width] f32
    # zero the dpre context rows that belong to neighbor tiles: their
    # gradients are accumulated by the programs that own them. Only the
    # wrap-in rows of the anti-causal rotate may read them.
    row = jax.lax.broadcasted_iota(jnp.int32, dpre.shape, 0)
    in_tile = jnp.logical_and(row >= _CTX, row < _CTX + l_tile)
    dpre_t = jnp.where(in_tile, dpre, 0.0)

    tile = slice(_CTX, _CTX + l_tile)
    # dx[j] = Σ_t w[t]·dpre[j + (k−1−t)] — dpre of ALL owners (incl. the
    # next tile's head rows), so use the unmasked dpre here
    dx = dpre * wb_ref[k - 1, :]
    for t in range(k - 1):
        s = k - 1 - t
        # left-shift by s == non-negative roll by rows − s
        dx = dx + pltpu.roll(dpre, rows - s, 0) * wb_ref[t, :]
    dx_ref[0] = dx[tile].astype(dx_ref.dtype)

    # dw[t] = Σ_j dpre[j]·x[j−(k−1−t)], db = Σ_j dpre[j] — accumulate
    # per batch element across the (sequential) tile iterations
    x32 = x_scr[...].reshape(rows, -1).astype(jnp.float32)
    for t in range(k - 1):
        s = k - 1 - t
        rolled = pltpu.roll(x32, s, 0)
        dwb_ref[0, t, :] += jnp.sum(dpre_t[tile] * rolled[tile], axis=0)
    dwb_ref[0, k - 1, :] += jnp.sum(dpre_t[tile] * x32[tile], axis=0)
    dwb_ref[0, k, :] += jnp.sum(dpre_t[tile], axis=0)


@partial(
    jax.jit,
    static_argnames=("offset", "width", "l_tile", "interpret"),
)
def _fwd(zxbcdt, w, b, *, offset, width, l_tile, interpret):
    bsz, l, ctot = zxbcdt.shape
    k = w.shape[0]
    dtype = zxbcdt.dtype
    wb = jnp.concatenate(
        [w.astype(jnp.float32), b.astype(jnp.float32)[None, :]], axis=0,
    )  # [k+1, width]
    kernel = partial(
        _fwd_kernel, l_tile=l_tile, offset=offset, width=width, k=k,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, l // l_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (k + 1, width), lambda bi, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, l_tile, width), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, l, width), dtype),
        scratch_shapes=[
            pltpu.VMEM(((l_tile + _CTX) // 8, 8, width), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zxbcdt.reshape(bsz, l // 8, 8, ctot), wb)


@partial(
    jax.jit,
    static_argnames=("offset", "width", "l_tile", "interpret"),
)
def _bwd(zxbcdt, w, b, dy, *, offset, width, l_tile, interpret):
    bsz, l, ctot = zxbcdt.shape
    k = w.shape[0]
    dtype = zxbcdt.dtype
    wb = jnp.concatenate(
        [w.astype(jnp.float32), b.astype(jnp.float32)[None, :]], axis=0,
    )
    kernel = partial(
        _bwd_kernel, l_tile=l_tile, offset=offset, width=width, k=k,
    )
    dx, dwb = pl.pallas_call(
        kernel,
        grid=(bsz, l // l_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(
                (k + 1, width), lambda bi, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, l_tile, width), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.VMEM,
            ),
            # per-batch accumulator revisited across the sequential tile
            # iterations (same pattern as the attention dbias)
            pl.BlockSpec(
                (1, k + 1, width), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, l, width), dtype),
            jax.ShapeDtypeStruct((bsz, k + 1, width), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(((l_tile + 2 * _CTX) // 8, 8, width), dtype),
            pltpu.VMEM(((l_tile + 2 * _CTX) // 8, 8, width), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        zxbcdt.reshape(bsz, l // 8, 8, ctot),
        wb,
        dy.reshape(bsz, l // 8, 8, width),
    )
    dwb = jnp.sum(dwb, axis=0)  # reduce over batch
    return dx, dwb[:k].astype(w.dtype), dwb[k].astype(b.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_causal_conv1d_silu(zxbcdt, w, b, offset, width, interpret=False):
    """silu(causal_depthwise_conv1d(zxbcdt[:, :, offset:offset+width], w, b)).

    Semantics match `ops.conv.causal_depthwise_conv1d` + `jax.nn.silu`
    (torch `Conv1d(groups=c, padding=k-1)[..., :l]`, the causal-conv1d
    contract Mamba2 uses). The gradient w.r.t. `zxbcdt` is the dxBC
    window padded with zeros — the z/dt columns get their gradients from
    their own consumers.
    """
    l_tile = _pick_l_tile(zxbcdt.shape[1])
    return _fwd(
        zxbcdt, w, b,
        offset=offset, width=width, l_tile=l_tile, interpret=interpret,
    )


def _vjp_fwd(zxbcdt, w, b, offset, width, interpret=False):
    l_tile = _pick_l_tile(zxbcdt.shape[1])
    y = _fwd(
        zxbcdt, w, b,
        offset=offset, width=width, l_tile=l_tile, interpret=interpret,
    )
    return y, (zxbcdt, w, b)


def _vjp_bwd(offset, width, interpret, res, dy):
    zxbcdt, w, b = res
    l_tile = _pick_l_tile(zxbcdt.shape[1])
    dx, dw, db = _bwd(
        zxbcdt, w, b, dy.astype(zxbcdt.dtype),
        offset=offset, width=width, l_tile=l_tile, interpret=interpret,
    )
    ctot = zxbcdt.shape[-1]
    dz = jnp.pad(dx, ((0, 0), (0, 0), (offset, ctot - offset - width)))
    return dz, dw, db


fused_causal_conv1d_silu.defvjp(_vjp_fwd, _vjp_bwd)
