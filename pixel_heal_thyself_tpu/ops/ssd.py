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
    """Chunked matmul-form SSD. Same signature/semantics as `ssd_naive`.

    TPU layout: heads ride the batch dims ([b, h, q, ·] tensors keep the
    chunk length q on the 128-lane axis) and the chunks are processed by a
    `lax.scan` carrying the inter-chunk state — only one chunk's decay
    mask/scores ever materialize (a naive batched formulation materialized
    O(L·q) masks: ~2 GB at 16k tokens, measured 2.6 s → 0.2 s per step).
    The scan body is rematerialized in the backward pass.
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

    # [nc, b, h, q, ·] — scan over chunks; heads in batch dims
    Bh = jnp.repeat(B, rep, axis=2).reshape(b, nc, q, h, n)
    Bh = Bh.transpose(1, 0, 3, 2, 4)                     # [nc,b,h,q,n]
    Ch = jnp.repeat(C, rep, axis=2).reshape(b, nc, q, h, n)
    Ch = Ch.transpose(1, 0, 3, 2, 4)
    xc = x.reshape(b, nc, q, h, p).transpose(1, 0, 3, 2, 4)  # [nc,b,h,q,p]
    dtc = dt.reshape(b, nc, q, h).transpose(1, 0, 3, 2)      # [nc,b,h,q]

    causal = jnp.tril(jnp.ones((q, q), bool))

    @jax.checkpoint
    def chunk_body(state, inputs):
        B_c, C_c, x_c, dt_c = inputs  # [b,h,q,n], [b,h,q,n], [b,h,q,p], [b,h,q]
        dA = (dt_c * A[None, :, None]).astype(jnp.float32)
        cum = jnp.cumsum(dA, axis=-1)                     # [b,h,q]
        xdt = x_c * dt_c[..., None].astype(in_dtype)

        # intra-chunk
        diff = cum[..., :, None] - cum[..., None, :]      # [b,h,qi,qj]
        lmask = jnp.exp(
            jnp.where(causal[None, None], diff, -jnp.inf),
        ).astype(in_dtype)
        scores = jnp.einsum(
            "bhin,bhjn->bhij", C_c, B_c, preferred_element_type=jnp.float32,
        ).astype(in_dtype)
        y = jnp.einsum(
            "bhij,bhjp->bhip",
            scores * lmask,
            xdt,
            preferred_element_type=jnp.float32,
        ).astype(in_dtype)

        # inter-chunk: contribution of the carried state
        in_decay = jnp.exp(cum).astype(in_dtype)          # [b,h,q]
        y = y + jnp.einsum(
            "bhin,bhnp->bhip",
            C_c * in_decay[..., None],
            state,
            preferred_element_type=jnp.float32,
        ).astype(in_dtype)

        # updated state
        decay_to_end = jnp.exp(cum[..., -1:] - cum).astype(in_dtype)
        S_c = jnp.einsum(
            "bhjn,bhjp->bhnp",
            B_c * decay_to_end[..., None],
            xdt,
            preferred_element_type=jnp.float32,
        ).astype(in_dtype)
        chunk_decay = jnp.exp(cum[..., -1]).astype(in_dtype)  # [b,h]
        state = chunk_decay[..., None, None] * state + S_c
        return state, y

    state0 = jnp.zeros((b, h, n, p), in_dtype)
    _, ys = jax.lax.scan(chunk_body, state0, (Bh, Ch, xc, dtc))
    y = ys.transpose(1, 0, 3, 2, 4).reshape(b, lp, h, p)[:, :l]
    if D is not None:
        y = y + x[:, :l] * D[None, None, :, None].astype(in_dtype)
    return y
