"""Feature-guided block-local halo self-attention (AFGSA) — XLA path.

The core op of the AFGSA denoiser (behavioral spec: reference
`pht/models/afgsa/model.py:401-516`): each non-overlapping `block × block`
tile of queries attends to a `(block+2·halo)²` key/value window centered on
it (zero padding at image borders, like the reference's
`F.unfold(..., padding=halo)` at `model.py:480-485`). A decomposed 2-D
relative positional embedding is added to the keys (row/col halves of each
head's channels, shared across heads, `model.py:490-498`), and queries may
be permuted along a space-filling curve before attention and un-permuted
after (`model.py:477,506`).

TPU-first design notes:
- NHWC layout throughout; the window gather uses static index arrays that
  XLA lowers to efficient gathers; all contractions run on the MXU with
  fp32 accumulation (`preferred_element_type`).
- softmax is computed in fp32 regardless of the compute dtype.
- a fused Pallas kernel with identical signature lives in
  `ops/attention_pallas.py`; `block_halo_attention` dispatches on
  `use_pallas`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.logger import logger


def extract_halo_windows(
    x: jnp.ndarray,
    block_size: int,
    halo_size: int,
) -> jnp.ndarray:
    """Extract overlapping (block+2·halo)² windows at stride `block`.

    x: [B, H, W, C] (H, W divisible by block_size). Zero padding at the
    borders — the `F.unfold(kernel=block+2h, stride=block, padding=h)`
    equivalent (reference `model.py:480-485`).

    Implementation: with halo ≤ block, every window is the union of the
    center tile plus fixed slices of its 8 neighbors, so the windows are
    assembled from STATIC slices + concat of a block-padded view. This
    keeps the backward pass a pad-and-add of slices; a gather formulation
    would differentiate into a scatter-add, which is pathologically slow
    on TPU (measured 355 ms → 60 ms for the prod fwd+bwd step).

    Returns [B, hb, wb, window, window, C].
    """
    b, h, w, c = x.shape
    bs, halo = block_size, halo_size
    if halo > bs:
        raise ValueError("halo_size must be ≤ block_size")
    hb, wb = h // bs, w // bs
    window = bs + 2 * halo

    # rows: pad one whole block of zeros each side, view as block rows,
    # and take (prev tail, center, next head) slices
    xp = jnp.pad(x, ((0, 0), (bs, bs), (0, 0), (0, 0)))
    xr = xp.reshape(b, hb + 2, bs, w, c)
    rows = jnp.concatenate(
        [
            xr[:, :-2, bs - halo :],  # last `halo` rows of the block above
            xr[:, 1:-1],              # the center block rows
            xr[:, 2:, :halo],         # first `halo` rows of the block below
        ],
        axis=2,
    )  # [b, hb, window, w, c]

    # cols: same decomposition along width
    rp = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (bs, bs), (0, 0)))
    rc = rp.reshape(b, hb, window, wb + 2, bs, c)
    wins = jnp.concatenate(
        [
            rc[:, :, :, :-2, bs - halo :],
            rc[:, :, :, 1:-1],
            rc[:, :, :, 2:, :halo],
        ],
        axis=4,
    )  # [b, hb, window, wb, window, c]
    return wins.transpose(0, 1, 3, 2, 4, 5)


def blocks_from_image(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """[B,H,W,C] → [B, hb, wb, block², C] of raster-flattened tiles."""
    b, h, w, c = x.shape
    hb, wb = h // block_size, w // block_size
    x = x.reshape(b, hb, block_size, wb, block_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hb, wb, block_size * block_size, c)


def image_from_blocks(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Inverse of `blocks_from_image`: [B,hb,wb,block²,C] → [B,H,W,C]."""
    b, hb, wb, _, c = x.shape
    x = x.reshape(b, hb, wb, block_size, block_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hb * block_size, wb * block_size, c)


@partial(
    jax.jit,
    static_argnames=("block_size", "halo_size", "num_heads"),
)
def block_halo_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    curve_indices: jnp.ndarray,
    inv_curve_indices: jnp.ndarray,
    *,
    block_size: int,
    halo_size: int,
    num_heads: int,
) -> jnp.ndarray:
    """Block-halo attention, pure-XLA implementation.

    q, k, v: [B, H, W, C] projected feature maps (q/k from fused features,
    v from noisy features — the caller projects). rel_h: [window, hd//2],
    rel_w: [window, hd//2]. Returns [B, H, W, C].
    """
    b, h, w, c = q.shape
    window = block_size + 2 * halo_size
    head_ch = c // num_heads
    in_dtype = q.dtype

    # queries per block, scaled, curve-ordered
    qb = blocks_from_image(q, block_size)  # [B,hb,wb,bs²,C]
    qb = qb * jnp.asarray(head_ch, jnp.float32).astype(in_dtype) ** -0.5
    qb = jnp.take(qb, curve_indices, axis=3)
    hb, wb = h // block_size, w // block_size
    nq = block_size * block_size
    qh = qb.reshape(b, hb, wb, nq, num_heads, head_ch).transpose(0, 1, 2, 4, 3, 5)

    # key/value halo windows
    kw = extract_halo_windows(k, block_size, halo_size)  # [B,hb,wb,win,win,C]
    vw = extract_halo_windows(v, block_size, halo_size)

    # relative positional embedding on keys: first hd//2 channels of each
    # head get the row embedding, the rest the column embedding (shared
    # across heads; reference model.py:490-498)
    kw = kw.reshape(b, hb, wb, window, window, num_heads, head_ch)
    k_h = kw[..., : head_ch // 2] + rel_h[:, None, None, :].astype(kw.dtype)
    k_w = kw[..., head_ch // 2 :] + rel_w[None, :, None, :].astype(kw.dtype)
    kw = jnp.concatenate([k_h, k_w], axis=-1)
    nk = window * window
    kh = kw.reshape(b, hb, wb, nk, num_heads, head_ch).transpose(0, 1, 2, 4, 3, 5)
    vh = vw.reshape(b, hb, wb, nk, num_heads, head_ch).transpose(0, 1, 2, 4, 3, 5)

    # attention (MXU matmuls, fp32 accumulation + fp32 softmax)
    logits = jnp.einsum(
        "bxyhqd,bxyhkd->bxyhqk",
        qh,
        kh,
        preferred_element_type=jnp.float32,
    )
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bxyhqk,bxyhkd->bxyhqd",
        attn.astype(in_dtype),
        vh,
        preferred_element_type=jnp.float32,
    ).astype(in_dtype)

    # undo curve ordering, merge heads head-major (reference model.py:506-516)
    out = out.transpose(0, 1, 2, 4, 3, 5).reshape(b, hb, wb, nq, c)
    out = jnp.take(out, inv_curve_indices, axis=3)
    return image_from_blocks(out, block_size)


def block_halo_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    curve_indices: jnp.ndarray,
    inv_curve_indices: jnp.ndarray,
    *,
    block_size: int,
    halo_size: int,
    num_heads: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Dispatching entry point: Pallas fused kernel or XLA fallback."""
    _, h, w, _ = q.shape
    if h % block_size != 0 or w % block_size != 0:
        # reference model.py:469-471 asserts the same invariant; fail here
        # with a clear message instead of an opaque reshape error deep in
        # the window extraction
        raise ValueError(
            f"feature map H×W = {h}×{w} must be divisible by "
            f"block_size={block_size}; pad or tile the input "
            f"(inference.py tiles full frames to block-aligned sizes)",
        )
    if use_pallas and q.shape[-1] % 128 != 0:
        # the fused kernel DMAs channel columns at lane-tile (128)
        # granularity — non-multiple widths fail deep in Mosaic with an
        # unprovable-slice error (measured at ch=96/64, BASELINE.md fast
        # profile notes). Fall back to the XLA path instead of crashing.
        logger.warning(
            f"Pallas block-halo attention needs channels % 128 == 0 "
            f"(got {q.shape[-1]}); using the XLA path",
        )
        use_pallas = False
    if use_pallas:
        from pixel_heal_thyself_tpu.ops.attention_pallas import (
            block_halo_attention_pallas,
        )

        return block_halo_attention_pallas(
            q,
            k,
            v,
            rel_h,
            rel_w,
            curve_indices,
            inv_curve_indices,
            block_size=block_size,
            halo_size=halo_size,
            num_heads=num_heads,
        )
    return block_halo_attention_xla(
        q,
        k,
        v,
        rel_h,
        rel_w,
        curve_indices,
        inv_curve_indices,
        block_size=block_size,
        halo_size=halo_size,
        num_heads=num_heads,
    )
