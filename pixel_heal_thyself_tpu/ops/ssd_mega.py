"""VMEM-resident fused Mamba2 chain kernel (the SSD "megakernel").

Fuses the whole post-projection Mamba2 layer interior — z/xBC/dt split,
causal depthwise conv1d + SiLU, dt softplus, the chunked SSD scan, the D
skip, and the gated RMSNorm — into ONE Pallas kernel pair (forward +
custom-VJP backward), so the [b, l, d_inner..conv_dim] activations that
the XLA formulation streams through HBM between each of those stages
(BASELINE.md "Mamba step ceiling": the 68 ms HBM-bound loop-fusion tail +
23 ms of chunk-stack formatting) stay in VMEM for the life of a chunk.

Reference semantics: `mamba_ssm`'s fused Triton path (reference
`pht/models/mamba/model.py:53-58` — the reference's own design point is
that this chain is one kernel). Numerics follow `ops/ssd.ssd_chunked` +
`ops/conv.causal_depthwise_conv1d` + `models/mamba.RMSNormGated`
(golden-tested against that chain in tests/test_ssd_mega.py).

Kernel-layout choices (what makes this lower cleanly through Mosaic):
- One grid program owns one (batch, chunk) pair; the grid's chunk
  dimension is sequential, so the inter-chunk SSD state and the causal
  conv's previous-chunk tail are carried in VMEM scratch — no HBM
  round-trip between chunks, no halo re-reads. The backward walks chunks
  in REVERSE time order (index maps flip the chunk axis) carrying the
  reverse-mode dstate and the anti-causal conv-grad head the same way.
- The SSD state is stored [d_state, h·p] (heads side by side on the lane
  axis), so the state update `aᵀ⊙state + Bᵀ(xdt⊙decay)` and the readout
  `C·state` are single full-width matmuls for ALL heads at once.
- Per-head scalars (dt, decay factors) expand to the [·, h·p] lane layout
  through a 0/1 selector matmul (`E[h, c] = (c // headdim == h)`) — an
  MXU op instead of a Mosaic relayout.
- Only the intra-chunk attention-like matmul needs per-head decay masks;
  they live as one batched [h, q, q] value (leading-dim indexing is free)
  and the matmuls run per 128-lane head tile with lane masks, so every
  lane-slice offset is 128-aligned.
- Rolls for the conv taps run in f32 (`tpu.dynamic_rotate` is
  32-bit-only; BASELINE.md round-3 Mosaic notes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5  # RMSNormGated eps (models/mamba.py)
_TAIL = 8    # carried previous-chunk rows (>= d_conv - 1, sublane tile)
_VMEM_LIMIT = 110 * 1024 * 1024


def supports_shapes(
    l: int, d_inner: int, ngroups: int, d_state: int, headdim: int,
    d_conv: int, chunk: int,
) -> bool:
    """Static gate — callers fall back to the XLA chain otherwise."""
    return (
        ngroups == 1
        and d_conv <= _TAIL + 1
        and l % chunk == 0
        and l >= chunk
        and chunk % 8 == 0
        and d_inner % 128 == 0
        and headdim in (8, 16, 32, 64, 128)
        and d_state % 8 == 0
    )


def _expander(h: int, p: int, dtype):
    """E[h, c] = 1 iff c // p == h — per-head→lane-layout selector."""
    row = jax.lax.broadcasted_iota(jnp.int32, (h, h * p), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, h * p), 1)
    return (col // p == row).astype(dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
    )


def _conv_chunk(xr, tail, wb, k: int, q: int):
    """Causal depthwise conv over one chunk: y[t] = Σ_j w[j]·x[t-(k-1)+j]
    + b, with rows before the chunk taken from `tail` (the previous
    chunk's last _TAIL raw rows; zeros at sequence start). All f32.

    Rolls wrap within the chunk; the wrapped head rows are replaced from
    an equally-rolled tail carrier (tail rows sit at the END of a zero
    [q, c] carrier, so a roll by s brings tail row _TAIL-s+t to row t —
    exactly x[t-s] for t < s)."""
    c = xr.shape[-1]
    carrier = jnp.concatenate(
        [jnp.zeros((q - _TAIL, c), jnp.float32), tail], axis=0,
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (q, c), 0)
    acc = xr * wb[k - 1, :]
    for j in range(k - 1):
        s = k - 1 - j  # shift distance for tap j
        cur = pltpu.roll(xr, s, 0)
        prev = pltpu.roll(carrier, s, 0)
        acc = acc + jnp.where(row < s, prev, cur) * wb[j, :]
    return acc + wb[k, :]


def _chunk_core(blk, tail_f32, wb_ref, pv_ref, *, q, h, p, n, di, k):
    """Shared forward interior for one chunk (everything that does not
    depend on the carried state). Returns a dict of chunk tensors."""
    dc = di + 2 * n
    f32 = jnp.float32

    xbc_raw = blk[:, di:di + dc].astype(f32)
    dtr = blk[:, di + dc:di + dc + h].astype(f32)

    pre = _conv_chunk(xbc_raw, tail_f32, wb_ref[...].astype(f32), k, q)
    xbc = _silu(pre)
    x = xbc[:, :di]
    bc = xbc[:, di:di + 2 * n]
    Bv = bc[:, :n]
    Cv = bc[:, n:2 * n]

    dt_bias = pv_ref[0, :].astype(f32)
    A = pv_ref[1, :].astype(f32)
    dt = jax.nn.softplus(dtr + dt_bias[None, :])           # [q, h] f32
    dA = dt * A[None, :]                                    # [q, h]

    ti = jax.lax.broadcasted_iota(jnp.int32, (q, q), 0)
    tj = jax.lax.broadcasted_iota(jnp.int32, (q, q), 1)
    tril = (tj <= ti).astype(f32)
    cum = _dot(tril, dA, ((1,), (0,)))                      # [q, h]
    cumT = _dot(dA, tril, ((0,), (1,)))                     # [h, q]
    cum_last = jnp.sum(dA, axis=0, keepdims=True)           # [1, h]

    E = _expander(h, p, f32)                                # [h, di]
    dt_exp = _dot(dt, E, ((1,), (0,)))                      # [q, di]
    xdt = x * dt_exp

    scores = _dot(Cv, Bv, ((1,), (1,)))                     # [q(t), q(j)]
    causal3 = (tj <= ti)[None, :, :]
    diff3 = cumT[:, :, None] - cumT[:, None, :]             # [h, qt, qj]
    lmask3 = jnp.where(causal3, jnp.exp(jnp.where(causal3, diff3, 0.0)), 0.0)
    w3 = scores[None, :, :] * lmask3                        # [h, qt, qj]

    d2_exp = _dot(jnp.exp(cum_last - cum), E, ((1,), (0,)))  # [q, di]
    e_exp = _dot(jnp.exp(cum), E, ((1,), (0,)))              # [q, di]
    a_exp = _dot(jnp.exp(cum_last), E, ((1,), (0,)))         # [1, di]
    D_exp = _dot(pv_ref[2:3, :].astype(f32), E, ((1,), (0,)))  # [1, di]

    return dict(
        xbc_raw=xbc_raw, pre=pre, x=x, Bv=Bv, Cv=Cv, dt=dt, A=A,
        cum=cum, scores=scores, lmask3=lmask3, w3=w3, xdt=xdt,
        dt_exp=dt_exp, d2_exp=d2_exp, e_exp=e_exp, a_exp=a_exp,
        D_exp=D_exp, E=E, sig_dt=jax.nn.sigmoid(dtr + dt_bias[None, :]),
        tril_ti=ti, tril_tj=tj,
    )


def _intra_y(w3, xdt, *, q, p, di):
    """y1[t, (h,p)] = Σ_{j≤t} scores[t,j]·lmask[h,t,j]·xdt[j,(h,p)] —
    per 128-lane head tile with lane masks (all slices 128-aligned)."""
    f32 = jnp.float32
    gpr = max(1, 128 // p)          # heads per 128-lane tile
    tiles = di // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    outs = []
    for pr in range(tiles):
        xt = xdt[:, 128 * pr:128 * (pr + 1)]
        acc = jnp.zeros((q, 128), f32)
        for g in range(gpr):
            hh = pr * gpr + g
            xm = xt * (lane // p == g).astype(f32) if gpr > 1 else xt
            acc = acc + _dot(w3[hh], xm, ((1,), (0,)))
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1) if tiles > 1 else outs[0]


def _intra_bwd(w3, dy, xdt, *, q, p, di):
    """Backward of `_intra_y`: (dw3 [h,q,q], dxdt [q,di])."""
    f32 = jnp.float32
    gpr = max(1, 128 // p)
    tiles = di // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    dxdt_tiles, dw3_heads = [], []
    for pr in range(tiles):
        xt = xdt[:, 128 * pr:128 * (pr + 1)]
        dyt = dy[:, 128 * pr:128 * (pr + 1)]
        dx_acc = jnp.zeros((q, 128), f32)
        for g in range(gpr):
            hh = pr * gpr + g
            m = (lane // p == g).astype(f32) if gpr > 1 else None
            xm = xt * m if m is not None else xt
            dw3_heads.append(_dot(dyt, xm, ((1,), (1,))))   # [qt, qj]
            dxm = _dot(w3[hh], dyt, ((0,), (0,)))           # [qj, 128]
            dx_acc = dx_acc + (dxm * m if m is not None else dxm)
        dxdt_tiles.append(dx_acc)
    dxdt = (
        jnp.concatenate(dxdt_tiles, axis=-1) if tiles > 1 else dxdt_tiles[0]
    )
    return jnp.stack(dw3_heads, axis=0), dxdt


def _fwd_body(
    zx_ref, wb_ref, pv_ref, nw_ref, y_ref, stin_ref, tails_ref,
    state, xbc_tail, *, q, h, p, n, di, k,
):
    f32 = jnp.float32
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        state[...] = jnp.zeros_like(state)
        xbc_tail[...] = jnp.zeros_like(xbc_tail)

    blk = zx_ref[0]
    tail_f32 = xbc_tail[...].astype(f32)
    c = _chunk_core(blk, tail_f32, wb_ref, pv_ref, q=q, h=h, p=p, n=n,
                    di=di, k=k)

    if stin_ref is not None:
        # residuals: incoming state (pre-update) + the conv tail this
        # chunk consumed — the backward recomputes everything else
        stin_ref[0, 0] = state[...].astype(stin_ref.dtype)
        tails_ref[0, 0] = xbc_tail[...].astype(tails_ref.dtype)

    st = state[...]
    y1 = _intra_y(c["w3"], c["xdt"], q=q, p=p, di=di)
    y2 = c["e_exp"] * _dot(c["Cv"], st, ((1,), (0,)))
    y3 = c["x"] * c["D_exp"]
    y_ssd = y1 + y2 + y3

    # state' = aᵀ⊙state + Bᵀ·(xdt⊙decay_to_end)
    state[...] = c["a_exp"] * st + _dot(
        c["Bv"], c["xdt"] * c["d2_exp"], ((0,), (0,)),
    )
    xbc_tail[...] = c["xbc_raw"][q - _TAIL:q, :]

    zf = blk[:, :di].astype(f32)
    g = y_ssd * _silu(zf)
    ms = jnp.mean(g * g, axis=1, keepdims=True)
    yn = g * jax.lax.rsqrt(ms + _EPS) * nw_ref[0, :].astype(f32)[None, :]
    y_ref[0] = yn.astype(y_ref.dtype)


def _fwd_kernel_train(zx, wb, pv, nw, y, stin, tails, state, tail, **kw):
    _fwd_body(zx, wb, pv, nw, y, stin, tails, state, tail, **kw)


def _fwd_kernel_infer(zx, wb, pv, nw, y, state, tail, **kw):
    _fwd_body(zx, wb, pv, nw, y, None, None, state, tail, **kw)


def _bwd_kernel(
    zx_ref, wb_ref, pv_ref, nw_ref, stin_ref, tails_ref, dy_ref,
    dzx_ref, dwb_ref, dpv_ref, dnw_ref,
    dstate, dconv_head,
    *, q, h, p, n, di, k,
):
    f32 = jnp.float32
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    dc = di + 2 * n

    @pl.when(ci == 0)  # first processed chunk = LAST chunk in time
    def _():
        dstate[...] = jnp.zeros_like(dstate)
        dconv_head[...] = jnp.zeros_like(dconv_head)

    @pl.when(jnp.logical_and(bi == 0, ci == 0))
    def _():
        dwb_ref[...] = jnp.zeros_like(dwb_ref)
        dpv_ref[...] = jnp.zeros_like(dpv_ref)
        dnw_ref[...] = jnp.zeros_like(dnw_ref)

    blk = zx_ref[0]
    tail_f32 = tails_ref[0, 0].astype(f32)
    st_in = stin_ref[0, 0].astype(f32)
    c = _chunk_core(blk, tail_f32, wb_ref, pv_ref, q=q, h=h, p=p, n=n,
                    di=di, k=k)
    E = c["E"]

    # ---- forward recompute of the chunk output path ---------------------
    y1 = _intra_y(c["w3"], c["xdt"], q=q, p=p, di=di)
    y2 = c["e_exp"] * _dot(c["Cv"], st_in, ((1,), (0,)))
    y_ssd = y1 + y2 + c["x"] * c["D_exp"]
    zf = blk[:, :di].astype(f32)
    sz = _silu(zf)
    g = y_ssd * sz
    rstd = jax.lax.rsqrt(jnp.mean(g * g, axis=1, keepdims=True) + _EPS)

    # ---- norm + gate backward -------------------------------------------
    dy = dy_ref[0].astype(f32)
    nw = nw_ref[0, :].astype(f32)[None, :]
    dyw = dy * nw
    dnw_ref[0, :] += jnp.sum(dy * g * rstd, axis=0)
    du = rstd * dyw - g * (rstd**3 / di) * jnp.sum(
        dyw * g, axis=1, keepdims=True,
    )
    dy_ssd = du * sz
    dz = du * y_ssd * _dsilu(zf)

    # ---- SSD backward -----------------------------------------------------
    dst_out = dstate[...]

    # D skip: y3 = x ⊙ D_exp
    dpv_ref[2, :] += _dot(
        jnp.sum(dy_ssd * c["x"], axis=0, keepdims=True), E, ((1,), (1,)),
    )[0, :]
    dx = dy_ssd * c["D_exp"]

    # readout y2 = e_exp ⊙ (C @ st_in); e_exp = exp(cum) expanded
    dcum = _dot(dy_ssd * y2, E, ((1,), (1,)))               # [q, h]
    dr = dy_ssd * c["e_exp"]
    dCv = _dot(dr, st_in, ((1,), (1,)))                     # [q, n]
    dst_in = _dot(c["Cv"], dr, ((0,), (0,)))                # [n, di]

    # intra-chunk attention-like path
    dw3, dxdt = _intra_bwd(c["w3"], dy_ssd, c["xdt"], q=q, p=p, di=di)
    ds = jnp.sum(dw3 * c["lmask3"], axis=0)                 # [qt, qj]
    ddiff3 = dw3 * c["scores"][None, :, :] * c["lmask3"]
    dcumT = jnp.sum(ddiff3, axis=2) - jnp.sum(ddiff3, axis=1)  # [h, q]

    # state-update path: st_out = a_exp ⊙ st_in + Bᵀ(xdt⊙d2_exp)
    dcum_last = _dot(
        jnp.sum(dst_out * st_in * c["a_exp"], axis=0, keepdims=True),
        E, ((1,), (1,)),
    )                                                       # [1, h]
    dst_in = dst_in + c["a_exp"] * dst_out
    xdt_s = c["xdt"] * c["d2_exp"]
    dBv = _dot(xdt_s, dst_out, ((1,), (1,)))                # [q, n]
    dxdt_s = _dot(c["Bv"], dst_out, ((1,), (0,)))           # [q, di]
    dxdt = dxdt + dxdt_s * c["d2_exp"]
    dd2 = _dot(dxdt_s * c["xdt"] * c["d2_exp"], E, ((1,), (1,)))  # [q, h]
    dcum = dcum - dd2
    dcum_last = dcum_last + jnp.sum(dd2, axis=0, keepdims=True)

    # scores = C·Bᵀ
    dCv = dCv + _dot(ds, c["Bv"], ((1,), (0,)))
    dBv = dBv + _dot(ds, c["Cv"], ((0,), (0,)))

    # fold dcumT [h, q] into dcum [q, h] with a transposing identity matmul
    eye_h = _expander(h, 1, f32)                            # [h, h]
    dcum = dcum + _dot(dcumT, eye_h, ((0,), (0,)))

    # cum[t,h] = Σ_{j≤t} dA[j,h]; cum_last = Σ_j dA[j,h]
    # → ddA[j,h] = Σ_{t≥j} dcum[t,h] + dcum_last[h]
    ge = (c["tril_tj"] >= c["tril_ti"]).astype(f32)         # [j, t]: t ≥ j
    ddA = _dot(ge, dcum, ((1,), (0,))) + dcum_last          # [q, h]

    # dA_tok = dt·A
    ddt = ddA * c["A"][None, :]
    dpv_ref[1, :] += jnp.sum(ddA * c["dt"], axis=0)

    # xdt = x ⊙ dt_exp
    dx = dx + dxdt * c["dt_exp"]
    ddt = ddt + _dot(dxdt * c["x"], E, ((1,), (1,)))

    # dt = softplus(dtr + dt_bias)
    ddtr = ddt * c["sig_dt"]
    dpv_ref[0, :] += jnp.sum(ddtr, axis=0)

    # assemble dxBC (post-SiLU grads), SiLU + conv backward
    dxbc_act = jnp.concatenate([dx, dBv, dCv], axis=-1)     # [q, dc]
    dpre = dxbc_act * _dsilu(c["pre"])

    # conv transpose: dxr[t] = Σ_j w[j]·dpre[t + (k-1-j)]; rows past the
    # chunk end come from the NEXT chunk's dpre head (already processed —
    # reverse iteration — and carried in scratch)
    wb = wb_ref[...].astype(f32)
    row = jax.lax.broadcasted_iota(jnp.int32, (q, dc), 0)
    head_carrier = jnp.concatenate(
        [dconv_head[...], jnp.zeros((q - _TAIL, dc), f32)], axis=0,
    )
    dxr = dpre * wb[k - 1, :]
    for j in range(k - 1):
        s = k - 1 - j
        cur = pltpu.roll(dpre, q - s, 0)                    # left-shift by s
        nxt = pltpu.roll(head_carrier, q - s, 0)            # head → tail rows
        dxr = dxr + jnp.where(row >= q - s, nxt, cur) * wb[j, :]
    dconv_head[...] = dpre[:_TAIL, :]

    # dw[j] = Σ_t dpre[t]·x[t-(k-1-j)] (x incl. prev tail), db = Σ dpre
    xr = c["xbc_raw"]
    tail_carrier = jnp.concatenate(
        [jnp.zeros((q - _TAIL, dc), f32), tail_f32], axis=0,
    )
    for j in range(k - 1):
        s = k - 1 - j
        shifted = jnp.where(
            row < s, pltpu.roll(tail_carrier, s, 0), pltpu.roll(xr, s, 0),
        )
        dwb_ref[j, :] += jnp.sum(dpre * shifted, axis=0)
    dwb_ref[k - 1, :] += jnp.sum(dpre * xr, axis=0)
    dwb_ref[k, :] += jnp.sum(dpre, axis=0)

    dzx_ref[0] = jnp.concatenate([dz, dxr, ddtr], axis=-1).astype(
        dzx_ref.dtype,
    )
    dstate[...] = dst_in


def _dims(zxbcdt, conv_w, dt_bias, d_inner, d_state, headdim):
    b, l, W = zxbcdt.shape
    k, dc = conv_w.shape
    h = dt_bias.shape[0]
    assert dc == d_inner + 2 * d_state, (dc, d_inner, d_state)
    assert W == 2 * d_inner + 2 * d_state + h, (W,)
    assert h * headdim == d_inner
    return b, l, W, k, dc, h


@partial(
    jax.jit,
    static_argnames=("d_inner", "d_state", "headdim", "chunk", "emit",
                     "interpret"),
)
def _fwd(zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w, *,
         d_inner, d_state, headdim, chunk, emit, interpret):
    b, l, W, k, dc, h = _dims(zxbcdt, conv_w, dt_bias, d_inner, d_state,
                              headdim)
    q = chunk
    nc = l // q
    dtype = zxbcdt.dtype
    f32 = jnp.float32

    wb = jnp.concatenate(
        [conv_w.astype(f32), conv_b.astype(f32)[None, :]], axis=0,
    )                                                       # [k+1, dc]
    pv = jnp.stack(
        [dt_bias.astype(f32), A.astype(f32), D.astype(f32)], axis=0,
    )                                                       # [3, h]
    nw = norm_w.astype(f32)[None, :]                        # [1, di]

    kw = dict(q=q, h=h, p=headdim, n=d_state, di=d_inner, k=k)
    in_specs = [
        pl.BlockSpec((1, q, W), lambda bi, i: (bi, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k + 1, dc), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, h), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    y_spec = pl.BlockSpec((1, q, d_inner), lambda bi, i: (bi, i, 0),
                          memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((d_state, d_inner), f32),
        pltpu.VMEM((_TAIL, dc), f32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=_VMEM_LIMIT,
    )

    if not emit:
        y = pl.pallas_call(
            partial(_fwd_kernel_infer, **kw),
            grid=(b, nc),
            in_specs=in_specs,
            out_specs=y_spec,
            out_shape=jax.ShapeDtypeStruct((b, l, d_inner), dtype),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(zxbcdt, wb, pv, nw)
        return y, None, None

    y, stin, tails = pl.pallas_call(
        partial(_fwd_kernel_train, **kw),
        grid=(b, nc),
        in_specs=in_specs,
        out_specs=(
            y_spec,
            pl.BlockSpec((1, 1, d_state, d_inner),
                         lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TAIL, dc), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, d_inner), dtype),
            jax.ShapeDtypeStruct((b, nc, d_state, d_inner), dtype),
            jax.ShapeDtypeStruct((b, nc, _TAIL, dc), dtype),
        ),
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(zxbcdt, wb, pv, nw)
    return y, stin, tails


@partial(
    jax.jit,
    static_argnames=("d_inner", "d_state", "headdim", "chunk", "interpret"),
)
def _bwd(zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w, stin, tails, dy, *,
         d_inner, d_state, headdim, chunk, interpret):
    b, l, W, k, dc, h = _dims(zxbcdt, conv_w, dt_bias, d_inner, d_state,
                              headdim)
    q = chunk
    nc = l // q
    dtype = zxbcdt.dtype
    f32 = jnp.float32

    wb = jnp.concatenate(
        [conv_w.astype(f32), conv_b.astype(f32)[None, :]], axis=0,
    )
    pv = jnp.stack(
        [dt_bias.astype(f32), A.astype(f32), D.astype(f32)], axis=0,
    )
    nw = norm_w.astype(f32)[None, :]

    kw = dict(q=q, h=h, p=headdim, n=d_state, di=d_inner, k=k)
    rev = lambda bi, i: (bi, nc - 1 - i, 0)  # noqa: E731
    rev4 = lambda bi, i: (bi, nc - 1 - i, 0, 0)  # noqa: E731
    dzx, dwb, dpv, dnw = pl.pallas_call(
        partial(_bwd_kernel, **kw),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, q, W), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((k + 1, dc), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, h), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_state, d_inner), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TAIL, dc), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, d_inner), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q, W), rev, memory_space=pltpu.VMEM),
            # param-grad accumulators revisited across the whole
            # sequential grid (zeroed at the first program, flushed once)
            pl.BlockSpec((k + 1, dc), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, h), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l, W), dtype),
            jax.ShapeDtypeStruct((k + 1, dc), f32),
            jax.ShapeDtypeStruct((3, h), f32),
            jax.ShapeDtypeStruct((1, d_inner), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d_state, d_inner), f32),
            pltpu.VMEM((_TAIL, dc), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(zxbcdt, wb, pv, nw, stin, tails, dy.astype(dtype))
    return dzx, dwb, dpv, dnw


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_mamba_chain(
    zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w,
    d_inner, d_state, headdim, chunk=128, interpret=False,
):
    """RMSNormGated(SSD(silu(conv1d(xBC)), softplus(dt+bias), A, D), z) —
    the full Mamba2 layer interior between in_proj and out_proj, as one
    fused Pallas op. Equivalent XLA chain: models/mamba.Mamba2Layer
    (causal_depthwise_conv1d → ssd_chunked → RMSNormGated).

    zxbcdt: [b, l, 2·d_inner + 2·d_state + nheads] (ngroups == 1).
    Returns [b, l, d_inner] in zxbcdt's dtype.
    """
    y, _, _ = _fwd(
        zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w,
        d_inner=d_inner, d_state=d_state, headdim=headdim, chunk=chunk,
        emit=False, interpret=interpret,
    )
    return y


def _vjp_fwd(zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w,
             d_inner, d_state, headdim, chunk=128, interpret=False):
    y, stin, tails = _fwd(
        zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w,
        d_inner=d_inner, d_state=d_state, headdim=headdim, chunk=chunk,
        emit=True, interpret=interpret,
    )
    return y, (zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w, stin, tails)


def _vjp_bwd(d_inner, d_state, headdim, chunk, interpret, res, dy):
    zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w, stin, tails = res
    dzx, dwb, dpv, dnw = _bwd(
        zxbcdt, conv_w, conv_b, dt_bias, A, D, norm_w, stin, tails, dy,
        d_inner=d_inner, d_state=d_state, headdim=headdim, chunk=chunk,
        interpret=interpret,
    )
    k = conv_w.shape[0]
    return (
        dzx,
        dwb[:k].astype(conv_w.dtype),
        dwb[k].astype(conv_b.dtype),
        dpv[0].astype(dt_bias.dtype),
        dpv[1].astype(A.dtype),
        dpv[2].astype(D.dtype),
        dnw[0].astype(norm_w.dtype),
    )


fused_mamba_chain.defvjp(_vjp_fwd, _vjp_bwd)
