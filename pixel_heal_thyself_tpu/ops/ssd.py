"""Mamba2 SSD (state-space dual) selective scan — TPU-native.

Replaces the reference's external `mamba_ssm.Mamba2` CUDA/Triton kernels
(reference `pht/models/mamba/model.py:6,53-58`; the package is absent from
its lockfile — SURVEY.md §2.9). Semantics follow the Mamba2 recurrence
with scalar-per-head decay:

    state_t = exp(dt_t·A_h)·state_{t-1} + dt_t·(B_t ⊗ x_t)
    y_t     = C_t · state_t + D_h·x_t

Three implementations:
- `ssd_naive`: a `lax.scan` over time — the correctness oracle.
- `ssd_chunked`: the matmul-form chunked algorithm (Dao & Gu 2024,
  "Transformers are SSMs", arXiv:2405.21060): intra-chunk attention-like
  matmuls with a causal decay mask, inter-chunk state carry via a short
  scan over chunk summaries. Everything lands on the MXU; contractions
  accumulate in fp32. The production path (fwd + autodiff bwd).
- `ssd_pallas`: a fused Pallas TPU forward (SURVEY §7 stage 7b) keeping
  masks/scores/state in VMEM. Measured at exact parity with
  `ssd_chunked`'s forward (5.00 vs 5.01 ms @ 4×16k tokens on v5e): both
  are bound by the XLA-side chunk-stack arrangement and HBM streaming,
  not the scan math — kept golden-tested as the measured evidence that
  the chunked XLA form is co-optimal.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ssd_naive(x, dt, A, B, C, D=None):
    """Time-step scan oracle.

    x: [b, l, h, p], dt: [b, l, h], A: [h], B, C: [b, l, g, n] with the
    g (groups) dim broadcast over heads (h % g == 0). Returns [b, l, h, p].
    """
    b, l, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    rep = h // g
    Bh = jnp.repeat(B, rep, axis=2)  # [b,l,h,n]
    Ch = jnp.repeat(C, rep, axis=2)

    dA = jnp.exp(dt * A[None, None, :])  # [b,l,h]
    xdt = x * dt[..., None]

    def step(state, inputs):
        dA_t, Bx_t, C_t = inputs  # [b,h], [b,h,n,p], [b,h,n]
        state = dA_t[..., None, None] * state + Bx_t
        y = jnp.einsum("bhn,bhnp->bhp", C_t, state)
        return state, y

    Bx = jnp.einsum("blhn,blhp->blhnp", Bh, xdt)
    state0 = jnp.zeros((b, h, n, p), x.dtype)
    _, ys = jax.lax.scan(
        step,
        state0,
        (dA.transpose(1, 0, 2), Bx.transpose(1, 0, 2, 3, 4), Ch.transpose(1, 0, 2, 3)),
    )
    y = ys.transpose(1, 0, 2, 3)  # [b,l,h,p]
    if D is not None:
        y = y + x * D[None, None, :, None]
    return y


def _group_size(nc: int, target: int) -> int:
    """Largest divisor of nc that is ≤ target."""
    for cand in range(min(nc, target), 0, -1):
        if nc % cand == 0:
            return cand
    return 1


@partial(jax.jit, static_argnames=("chunk", "group"))
def ssd_chunked(x, dt, A, B, C, D=None, chunk: int = 128, group: int = 8):
    """Chunked matmul-form SSD. Same signature/semantics as `ssd_naive`.

    TPU structure (v3 — decoupled carry, group-shared scores): the
    inter-chunk state recurrence is the only sequential dependency, and it
    is tiny ([b,h,n,p] elementwise per chunk), so it runs as its own cheap
    unrolled `lax.scan` over per-chunk state summaries computed in one
    fully batched MXU pass. The heavy intra-chunk attention-like matmuls
    then process `group` chunks per scan iteration with no carried state at
    all — v1 ran them one chunk at a time inside the carry scan,
    serializing ~L/chunk small matmul packets behind a scalar dependency
    (measured 13 ms → see BASELINE.md). Grouping bounds the materialized
    [g,b,h,q,q] decay masks (a fully batched formulation wanted ~2 GB at
    16k tokens); group bodies rematerialize in the backward pass.

    B/C are shared across the `h/g` heads of each group, so the C·Bᵀ
    scores matmul runs once per group (not per head) and the B/C stacks
    are never head-expanded — only the per-head decay-masked y matmuls
    see the head axis. Contractions accumulate in fp32; chunk length q
    rides the sublane axis with n/p on the 128-lane axis.
    """
    b, l, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    rep = h // g
    in_dtype = x.dtype

    q = min(chunk, l)
    pad = (-l) % q
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    lp = l + pad
    nc = lp // q

    # chunked stacks: B/C stay group-sized [nc,b,g,q,n]; x/dt are per-head
    # [nc,b,g,rep,q,·] with the head axis split as (g, rep)
    Bc = B.reshape(b, nc, q, g, n).transpose(1, 0, 3, 2, 4)
    Cc = C.reshape(b, nc, q, g, n).transpose(1, 0, 3, 2, 4)
    xc = x.reshape(b, nc, q, g, rep, p).transpose(1, 0, 3, 4, 2, 5)
    dtc = dt.reshape(b, nc, q, g, rep).transpose(1, 0, 3, 4, 2)

    # ---- batched per-chunk summaries (no sequential dependency) --------
    dA = (dtc * A.reshape(g, rep)[None, None, :, :, None]).astype(jnp.float32)
    cum = jnp.cumsum(dA, axis=-1)                  # [nc,b,g,rep,q] fp32
    xdt = xc * dtc[..., None].astype(in_dtype)
    decay_to_end = jnp.exp(cum[..., -1:] - cum).astype(in_dtype)
    S = jnp.einsum(
        "cbgjn,cbgrjp->cbgrnp",
        Bc,
        xdt * decay_to_end[..., None],
        preferred_element_type=jnp.float32,
    ).astype(in_dtype)                             # [nc,b,g,rep,n,p]
    a = jnp.exp(cum[..., -1]).astype(in_dtype)     # [nc,b,g,rep]

    # ---- inter-chunk carry: cheap elementwise scan ---------------------
    def carry_body(state, inputs):
        a_c, S_c = inputs
        return a_c[..., None, None] * state + S_c, state

    state0 = jnp.zeros((b, g, rep, n, p), in_dtype)
    _, st_in = jax.lax.scan(
        carry_body, state0, (a, S), unroll=8,
    )                                              # [nc,b,g,rep,n,p]

    # ---- intra-chunk + state readout, `gs` chunks per iteration --------
    gs = _group_size(nc, group)
    causal = jnp.tril(jnp.ones((q, q), bool))

    @jax.checkpoint
    def group_body(_, inputs):
        B_g, C_g, x_g, cum_g, st_g = inputs
        # B_g/C_g [gs,b,g,q,n]; x_g/cum_g [gs,b,g,rep,q,·]; st [gs,b,g,rep,n,p]
        diff = cum_g[..., :, None] - cum_g[..., None, :]  # [gs,b,g,rep,qi,qj]
        lmask = jnp.exp(
            jnp.where(causal[None, None, None, None], diff, -jnp.inf),
        ).astype(in_dtype)
        scores = jnp.einsum(
            "sbgin,sbgjn->sbgij", C_g, B_g, preferred_element_type=jnp.float32,
        ).astype(in_dtype)                         # once per group, not head
        y = jnp.einsum(
            "sbgrij,sbgrjp->sbgrip",
            scores[:, :, :, None] * lmask,
            x_g,
            preferred_element_type=jnp.float32,
        ).astype(in_dtype)
        in_decay = jnp.exp(cum_g).astype(in_dtype)  # [gs,b,g,rep,q]
        y = y + in_decay[..., None] * jnp.einsum(
            "sbgin,sbgrnp->sbgrip",
            C_g,
            st_g,
            preferred_element_type=jnp.float32,
        ).astype(in_dtype)
        return None, y

    def grp(t):
        return t.reshape(nc // gs, gs, *t.shape[1:])

    _, ys = jax.lax.scan(
        group_body, None, (grp(Bc), grp(Cc), grp(xdt), grp(cum), grp(st_in)),
    )                                              # [nc/gs,gs,b,g,rep,q,p]
    y = (
        ys.reshape(nc, b, g, rep, q, p)
        .transpose(1, 0, 4, 2, 3, 5)               # [b,nc,q,g,rep,p]
        .reshape(b, lp, h, p)
    )
    y = y[:, :l]
    if D is not None:
        y = y + x[:, :l] * D[None, None, :, None].astype(in_dtype)
    return y


def _ssd_fwd_kernel(
    cum_ref,    # [1, gs, h, q] VMEM fp32 — cumulative dt·A within chunk
    B_ref,      # [1, gs, q, n] VMEM
    C_ref,      # [1, gs, q, n] VMEM
    xdt_ref,    # [1, gs, h, q, p] VMEM — x·dt
    y_ref,      # [1, gs, h, q, p] VMEM out
    state,      # [h, n, p] VMEM scratch — inter-chunk carry
    *,
    gs: int,
    n_groups: int,
):
    i = pl.program_id(1)
    h = cum_ref.shape[2]
    q = cum_ref.shape[3]
    dtype = xdt_ref.dtype

    @pl.when(i == 0)
    def _():
        state[...] = jnp.zeros_like(state)

    causal = (
        jax.lax.broadcasted_iota(jnp.int32, (1, q, q), 1)
        >= jax.lax.broadcasted_iota(jnp.int32, (1, q, q), 2)
    )

    for cc in range(gs):
        cum = cum_ref[0, cc]                     # [h, q] fp32
        Bv = B_ref[0, cc]                        # [q, n]
        Cv = C_ref[0, cc]
        xv = xdt_ref[0, cc]                      # [h, q, p]

        diff = cum[:, :, None] - cum[:, None, :]  # [h, qi, qj]
        lmask = jnp.exp(jnp.where(causal, diff, -jnp.inf)).astype(dtype)
        scores = jax.lax.dot_general(
            Cv, Bv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)                          # [qi, qj], shared across heads
        y = jax.lax.dot_general(
            scores[None] * lmask, xv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                        # [h, q, p] fp32

        # carried-state contribution + state update (B/C broadcast to the
        # head axis so every contraction is one h-batched MXU op). Decay
        # factors stay fp32 until after the minor-dim insertion — Mosaic
        # only supports non-trivial minor-dim inserts on 32-bit types.
        st = state[...]
        Ch = jnp.broadcast_to(Cv[None], (h, q, Bv.shape[-1])).astype(dtype)
        in_decay = jnp.exp(cum)                  # [h, q] fp32
        y = y + in_decay[:, :, None] * jax.lax.dot_general(
            Ch, st, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        y_ref[0, cc] = y.astype(dtype)

        cum_last = jax.lax.slice_in_dim(cum, q - 1, q, axis=1)   # [h, 1]
        decay_to_end = jnp.exp(cum_last - cum)                   # [h, q] fp32
        Bh = jnp.broadcast_to(Bv[None], (h, q, Bv.shape[-1])).astype(dtype)
        S = jax.lax.dot_general(
            Bh,
            (xv * decay_to_end[:, :, None].astype(dtype)),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                        # [h, n, p] fp32
        chunk_decay = jnp.exp(cum_last)                          # [h, 1] fp32
        state[...] = (chunk_decay[:, :, None] * st + S).astype(dtype)


@partial(jax.jit, static_argnames=("chunk", "group"))
def ssd_pallas(x, dt, A, B, C, D=None, chunk: int = 128, group: int = 8):
    """Fused Pallas forward for the chunked SSD (SURVEY §7 stage 7b).

    Same signature/semantics as `ssd_chunked`; golden-tested against
    `ssd_naive`. One grid program owns `group` chunks of one batch element
    and carries the inter-chunk state in VMEM across the sequential chunk
    dimension — the decay masks, scores, and state summaries never touch
    HBM (the XLA chunk-scan round-trips ~50 MB of them per group
    iteration). Forward-only: training uses `ssd_chunked`, whose backward
    is XLA autodiff; this kernel serves the no-grad paths (full-frame
    inference, evaluation).

    Requires ngroups == 1 and chunk-divisible sequence lengths ≥ chunk;
    anything else falls back to `ssd_chunked`.
    """
    b, l, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    in_dtype = x.dtype
    q = chunk
    if g != 1 or l % q or l == 0:
        return ssd_chunked(x, dt, A, B, C, D, chunk=chunk, group=group)
    nc = l // q
    gs = _group_size(nc, group)

    # chunked stacks (all fed to the kernel per (batch, chunk-group) block)
    dA = (dt * A[None, None, :]).astype(jnp.float32).reshape(b, nc, q, h)
    cum = jnp.cumsum(dA, axis=2).transpose(0, 1, 3, 2)     # [b,nc,h,q]
    xdt = (x * dt[..., None].astype(in_dtype)).reshape(b, nc, q, h, p)
    xdt = xdt.transpose(0, 1, 3, 2, 4)                     # [b,nc,h,q,p]
    Bc = B.reshape(b, nc, q, n)
    Cc = C.reshape(b, nc, q, n)

    kernel = partial(_ssd_fwd_kernel, gs=gs, n_groups=nc // gs)
    y = pl.pallas_call(
        kernel,
        grid=(b, nc // gs),
        in_specs=[
            pl.BlockSpec(
                (1, gs, h, q), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, gs, q, n), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, gs, q, n), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, gs, h, q, p), lambda bi, i: (bi, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, gs, h, q, p), lambda bi, i: (bi, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, nc, h, q, p), in_dtype),
        scratch_shapes=[pltpu.VMEM((h, n, p), in_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cum, Bc, Cc, xdt)

    y = y.transpose(0, 1, 3, 2, 4).reshape(b, l, h, p)
    if D is not None:
        y = y + x * D[None, None, :, None].astype(in_dtype)
    return y
