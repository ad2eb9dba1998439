"""Mamba2 SSD (state-space dual) selective scan — TPU-native.

Replaces the reference's external `mamba_ssm.Mamba2` CUDA/Triton kernels
(reference `pht/models/mamba/model.py:6,53-58`; the package is absent from
its lockfile — SURVEY.md §2.9). Semantics follow the Mamba2 recurrence
with scalar-per-head decay:

    state_t = exp(dt_t·A_h)·state_{t-1} + dt_t·(B_t ⊗ x_t)
    y_t     = C_t · state_t + D_h·x_t

Two implementations:
- `ssd_naive`: a `lax.scan` over time — the correctness oracle.
- `ssd_chunked`: the matmul-form chunked algorithm (Dao & Gu 2024,
  "Transformers are SSMs", arXiv:2405.21060): intra-chunk attention-like
  matmuls with a causal decay mask, inter-chunk state carry via a short
  scan over chunk summaries. Everything lands on the MXU; contractions
  accumulate in fp32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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


@partial(jax.jit, static_argnames=("chunk",))
def ssd_chunked(x, dt, A, B, C, D=None, chunk: int = 128):
    """Chunked matmul-form SSD. Same signature/semantics as `ssd_naive`."""
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

    Bh = jnp.repeat(B, rep, axis=2).reshape(b, nc, q, h, n)
    Ch = jnp.repeat(C, rep, axis=2).reshape(b, nc, q, h, n)
    xc = x.reshape(b, nc, q, h, p)
    dtc = dt.reshape(b, nc, q, h)

    dA = dtc * A[None, None, None, :]          # [b,nc,q,h] log-decay (≤0)
    cum = jnp.cumsum(dA, axis=2)               # within-chunk cumulative
    xdt = xc * dtc[..., None]

    # intra-chunk: causal decay mask L_ij = exp(cum_i - cum_j), i ≥ j.
    # Mask the exponent (not the result): exp of the discarded upper
    # triangle (positive diffs) overflows to inf and would poison the
    # backward pass through jnp.where.
    diff = cum[:, :, :, None, :] - cum[:, :, None, :, :]   # [b,nc,qi,qj,h]
    causal = jnp.tril(jnp.ones((q, q), bool))[None, None, :, :, None]
    Lmask = jnp.exp(jnp.where(causal, diff, -jnp.inf)).astype(in_dtype)
    scores = jnp.einsum(
        "bcihn,bcjhn->bcijh", Ch, Bh, preferred_element_type=jnp.float32,
    ).astype(in_dtype)
    y_intra = jnp.einsum(
        "bcijh,bcjhp->bcihp",
        scores * Lmask,
        xdt,
        preferred_element_type=jnp.float32,
    ).astype(in_dtype)

    # chunk summary states: S_c = Σ_j exp(cum_last - cum_j)·B_j ⊗ xdt_j
    decay_to_end = jnp.exp(cum[:, :, -1:, :] - cum)        # [b,nc,q,h]
    S = jnp.einsum(
        "bcjhn,bcjhp->bchnp",
        Bh * decay_to_end[..., None].astype(in_dtype),
        xdt,
        preferred_element_type=jnp.float32,
    ).astype(in_dtype)

    # inter-chunk carry: prev_{c} = Π·prev_{c-1} + S_{c-1}
    chunk_decay = jnp.exp(cum[:, :, -1, :])                # [b,nc,h]

    def carry_step(prev, inp):
        S_c, decay_c = inp  # [b,h,n,p], [b,h]
        new = decay_c[..., None, None].astype(in_dtype) * prev + S_c
        return new, prev

    prev0 = jnp.zeros((b, h, n, p), in_dtype)
    _, prev_states = jax.lax.scan(
        carry_step,
        prev0,
        (S.transpose(1, 0, 2, 3, 4), chunk_decay.transpose(1, 0, 2)),
    )
    prev_states = prev_states.transpose(1, 0, 2, 3, 4)     # [b,nc,h,n,p]

    # inter-chunk contribution: C_t · (exp(cum_t)·prev_state)
    in_decay = jnp.exp(cum).astype(in_dtype)               # [b,nc,q,h]
    y_inter = jnp.einsum(
        "bcihn,bchnp->bcihp",
        Ch * in_decay[..., None],
        prev_states,
        preferred_element_type=jnp.float32,
    ).astype(in_dtype)

    y = (y_intra + y_inter).reshape(b, lp, h, p)[:, :l]
    if D is not None:
        y = y + x[:, :l] * D[None, None, :, None].astype(in_dtype)
    return y
