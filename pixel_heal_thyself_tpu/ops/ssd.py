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


def ssd_naive(x, dt, A, B, C, D=None, initial_state=None, return_final_state=False):
    """Time-step scan oracle.

    x: [b, l, h, p], dt: [b, l, h], A: [h], B, C: [b, l, g, n] with the
    g (groups) dim broadcast over heads (h % g == 0). Returns [b, l, h, p]
    (plus the final [b, h, n, p] state when `return_final_state`).
    `initial_state`: [b, h, n, p] carried-in state (sequence chaining).
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
    state0 = (
        jnp.zeros((b, h, n, p), x.dtype)
        if initial_state is None
        else initial_state.astype(x.dtype)
    )
    final, ys = jax.lax.scan(
        step,
        state0,
        (dA.transpose(1, 0, 2), Bx.transpose(1, 0, 2, 3, 4), Ch.transpose(1, 0, 2, 3)),
    )
    y = ys.transpose(1, 0, 2, 3)  # [b,l,h,p]
    if D is not None:
        y = y + x * D[None, None, :, None]
    if return_final_state:
        return y, final
    return y


def _group_size(nc: int, target: int) -> int:
    """Largest divisor of nc that is ≤ target."""
    for cand in range(min(nc, target), 0, -1):
        if nc % cand == 0:
            return cand
    return 1


def _ssd_stacks(x, dt, A, B, C, chunk: int):
    """Shared chunk-stack prologue: pad to a chunk multiple, rearrange to
    chunked [nc, b, g(, rep), q, ·] stacks, and compute the batched
    per-chunk summaries (cumulative log-decay `cum`, decayed input
    projection `S`, chunk decay `a`) that both the output pass and the
    sequence-parallel state summary consume.

    Chunk padding is benign for state chaining: padded tail tokens have
    dt == 0 → dA == 0 → decay 1 and zero state increment, so the final
    state is unaffected.
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
    dims = dict(b=b, l=l, h=h, p=p, g=g, n=n, rep=rep, q=q, lp=lp, nc=nc)
    return dict(Bc=Bc, Cc=Cc, xdt=xdt, cum=cum, S=S, a=a, dims=dims)


def _ssd_carry(stacks, initial_state, with_outputs: bool):
    """Inter-chunk state recurrence — a cheap elementwise `lax.scan` over
    the per-chunk summaries. Returns (final_state, per-chunk incoming
    states or None)."""
    d = stacks["dims"]
    in_dtype = stacks["S"].dtype

    def carry_body(state, inputs):
        a_c, S_c = inputs
        nxt = a_c[..., None, None] * state + S_c
        return nxt, (state if with_outputs else None)

    state0 = (
        # zeros derived from the summaries (not jnp.zeros) so the carry
        # init carries the same shard_map varying-axes type as the inputs
        stacks["S"][0] * 0
        if initial_state is None
        else initial_state.reshape(
            d["b"], d["g"], d["rep"], d["n"], d["p"],
        ).astype(in_dtype)
    )
    return jax.lax.scan(
        carry_body, state0, (stacks["a"], stacks["S"]), unroll=8,
    )


def _ssd_outputs(stacks, st_in, x, D, group: int):
    """Intra-chunk attention-like matmuls + carried-state readout,
    `group` chunks per scan iteration."""
    d = stacks["dims"]
    b, l, h, p, q, nc, lp = (
        d["b"], d["l"], d["h"], d["p"], d["q"], d["nc"], d["lp"],
    )
    in_dtype = stacks["xdt"].dtype
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
        group_body,
        None,
        (
            grp(stacks["Bc"]), grp(stacks["Cc"]), grp(stacks["xdt"]),
            grp(stacks["cum"]), grp(st_in),
        ),
    )                                              # [nc/gs,gs,b,g,rep,q,p]
    y = (
        ys.reshape(nc, b, d["g"], d["rep"], q, p)
        .transpose(1, 0, 4, 2, 3, 5)               # [b,nc,q,g,rep,p]
        .reshape(b, lp, h, p)
    )
    y = y[:, :l]
    if D is not None:
        y = y + x[:, :l] * D[None, None, :, None].astype(in_dtype)
    return y


@partial(jax.jit, static_argnames=("chunk", "group", "return_final_state"))
def ssd_chunked(
    x, dt, A, B, C, D=None, chunk: int = 128, group: int = 8,
    initial_state=None, return_final_state: bool = False,
):
    """Chunked matmul-form SSD. Same signature/semantics as `ssd_naive`.

    `initial_state` ([b, h, n, p]) seeds the inter-chunk carry and
    `return_final_state` also returns the post-sequence state — together
    they let callers chain the scan across sequence shards (the
    sequence-parallel full-frame path, `ssd_sharded`).

    TPU structure (v3 — decoupled carry, group-shared scores): the
    inter-chunk state recurrence is the only sequential dependency, and it
    is tiny ([b,h,n,p] elementwise per chunk), so it runs as its own cheap
    unrolled `lax.scan` over per-chunk state summaries computed in one
    fully batched MXU pass (`_ssd_stacks`). The heavy intra-chunk
    attention-like matmuls then process `group` chunks per scan iteration
    with no carried state at all — v1 ran them one chunk at a time inside
    the carry scan, serializing ~L/chunk small matmul packets behind a
    scalar dependency (measured 13 ms → see BASELINE.md). Grouping bounds
    the materialized [g,b,h,q,q] decay masks (a fully batched formulation
    wanted ~2 GB at 16k tokens); group bodies rematerialize in the
    backward pass.

    B/C are shared across the `h/g` heads of each group, so the C·Bᵀ
    scores matmul runs once per group (not per head) and the B/C stacks
    are never head-expanded — only the per-head decay-masked y matmuls
    see the head axis. Contractions accumulate in fp32; chunk length q
    rides the sublane axis with n/p on the 128-lane axis.
    """
    stacks = _ssd_stacks(x, dt, A, B, C, chunk)
    final_state, st_in = _ssd_carry(stacks, initial_state, with_outputs=True)
    y = _ssd_outputs(stacks, st_in, x, D, group)
    if return_final_state:
        d = stacks["dims"]
        return y, final_state.reshape(d["b"], d["h"], d["n"], d["p"])
    return y


def _state_summary(stacks, dtype):
    """(total decay [b, h], final state from zero init [b, h, n, p]) of a
    token strip's affine recurrence `state_out = a_tot·state_in + S_fin`,
    from precomputed chunk stacks. Shared by `ssd_state_summary` and
    `ssd_sharded` so the formula cannot diverge between them."""
    final, _ = _ssd_carry(stacks, None, with_outputs=False)
    d = stacks["dims"]
    # total decay: product of per-chunk decays, in log space for stability
    a_tot = jnp.exp(
        jnp.sum(stacks["cum"][..., -1], axis=0),
    ).reshape(d["b"], d["h"]).astype(dtype)
    return a_tot, final.reshape(d["b"], d["h"], d["n"], d["p"])


@partial(jax.jit, static_argnames=("chunk",))
def ssd_state_summary(x, dt, A, B, C, chunk: int = 128):
    """Per-shard state-transformer summary: (total decay [b, h], final
    state from zero init [b, h, n, p]).

    The SSD recurrence over a token strip is the affine map
    `state_out = a_tot·state_in + S_fin`; this computes (a_tot, S_fin)
    without the heavy intra-chunk output matmuls (standalone summary
    entry point; `ssd_sharded` computes the same summary from its own
    chunk stacks via the shared `_state_summary`).
    """
    return _state_summary(_ssd_stacks(x, dt, A, B, C, chunk), x.dtype)


def ssd_sharded(x, dt, A, B, C, D=None, *, axis_name: str,
                chunk: int = 128, group: int = 8):
    """Sequence-sharded SSD for use inside `shard_map` (SURVEY §5's
    Ulysses/ring analog; ROADMAP "Mamba full-frame inference").

    Each device holds a contiguous strip of the global raster sequence.
    Per-device state summaries (the affine `state → a·state + S` map of
    each strip) are all-gathered over ICI, every device computes its
    exclusive prefix locally (device count is tiny; the summaries are
    [b,h] + [b,h,n,p] — a few hundred KB), and the local chunk scan is
    then seeded with the carried-in state. The chunk stacks are computed
    once and shared between the summary and the output pass. Exactly equal
    to the unsharded scan (fp reordering aside) — golden-tested vs
    `ssd_naive` in tests/test_sequence_sharded.py.
    """
    stacks = _ssd_stacks(x, dt, A, B, C, chunk)
    d = stacks["dims"]
    a_tot, S_fin = _state_summary(stacks, x.dtype)

    a_all = jax.lax.all_gather(a_tot, axis_name)   # [ndev, b, h]
    S_all = jax.lax.all_gather(S_fin, axis_name)   # [ndev, b, h, n, p]
    ndev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    init = jnp.zeros_like(S_fin)
    for e in range(ndev):
        # left-fold of shards strictly before this one:
        # init ∘ shard_e  =  a_e·init + S_e
        take = e < idx
        init = jnp.where(
            take, a_all[e][..., None, None] * init + S_all[e], init,
        )
    init = init.reshape(d["b"], d["g"], d["rep"], d["n"], d["p"])
    _, st_in = _ssd_carry(stacks, init, with_outputs=True)
    return _ssd_outputs(stacks, st_in, x, D, group)


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
