"""Golden tests: block-halo attention vs an independent torch oracle.

The oracle expresses the op the way the reference semantics define it
(reference `pht/models/afgsa/model.py:456-516`): F.unfold halo windows,
decomposed relative positional embedding on keys, per-block softmax
attention, optional curve ordering of queries.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixel_heal_thyself_tpu.ops.attention import (
    block_halo_attention_xla,
    blocks_from_image,
    extract_halo_windows,
    image_from_blocks,
)
from pixel_heal_thyself_tpu.ops.curves import (
    CurveOrder,
    inverse_permutation,
    make_curve_indices,
)


def torch_oracle(q, k, v, rel_h, rel_w, block, halo, heads, order):
    """NCHW torch implementation of block-halo attention semantics."""
    b, c, h, w = q.shape
    head_ch = c // heads
    window = block + 2 * halo
    inv = torch.from_numpy(inverse_permutation(order).astype(np.int64))
    order = torch.from_numpy(order.astype(np.int64))

    qb = q.reshape(b, c, h // block, block, w // block, block)
    qb = qb.permute(0, 2, 4, 3, 5, 1).reshape(-1, block * block, c)
    qb = qb * head_ch ** -0.5
    qb = qb[:, order, :]

    def unfold(x):
        u = F.unfold(x, kernel_size=window, stride=block, padding=halo)
        # [b, c*window², L] → [b*L, window², c]
        u = u.reshape(b, c, window * window, -1).permute(0, 3, 2, 1)
        return u.reshape(-1, window * window, c)

    ku, vu = unfold(k), unfold(v)

    # heads: [N, a, c] → [N*heads, a, head_ch] head-major
    def split_heads(x):
        n, a, _ = x.shape
        return x.reshape(n, a, heads, head_ch).permute(0, 2, 1, 3).reshape(
            n * heads, a, head_ch,
        )

    qh, vh = split_heads(qb), split_heads(vu)
    kh = split_heads(ku).reshape(-1, window, window, head_ch)
    k1, k2 = kh.split(head_ch // 2, dim=-1)
    kh = torch.cat(
        [k1 + rel_h[:, None, :], k2 + rel_w[None, :, :]], dim=-1,
    ).reshape(-1, window * window, head_ch)

    sim = torch.einsum("bid,bjd->bij", qh, kh)
    attn = F.softmax(sim, dim=-1)
    out = torch.einsum("bij,bjd->bid", attn, vh)
    # merge heads head-major, undo curve, back to NCHW image
    out = out.reshape(-1, heads, block * block, head_ch)
    out = out.permute(0, 2, 1, 3).reshape(-1, block * block, c)
    out = out[:, inv, :]
    hb, wb = h // block, w // block
    out = out.reshape(b, hb, wb, block, block, c)
    out = out.permute(0, 5, 1, 3, 2, 4).reshape(b, c, h, w)
    return out


class TestWindowExtraction:
    def test_matches_torch_unfold(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 24, 5)).astype(np.float32)
        got = np.asarray(extract_halo_windows(x, block_size=8, halo_size=3))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        u = F.unfold(tx, kernel_size=14, stride=8, padding=3)
        u = u.reshape(2, 5, 14, 14, -1).permute(0, 4, 2, 3, 1)
        want = u.reshape(2, 2, 3, 14, 14, 5).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_blocks_roundtrip(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
        b = blocks_from_image(x, 8)
        assert b.shape == (2, 2, 2, 64, 4)
        np.testing.assert_allclose(np.asarray(image_from_blocks(b, 8)), x)


@pytest.mark.parametrize("order_mode", [CurveOrder.RASTER, CurveOrder.HILBERT, CurveOrder.ZORDER])
def test_attention_matches_torch_oracle(order_mode):
    block, halo, heads, c = 8, 3, 4, 32
    h = w = 16
    rng = np.random.default_rng(42)
    q = rng.standard_normal((2, h, w, c)).astype(np.float32)
    k = rng.standard_normal((2, h, w, c)).astype(np.float32)
    v = rng.standard_normal((2, h, w, c)).astype(np.float32)
    head_ch = c // heads
    window = block + 2 * halo
    rel_h = rng.standard_normal((window, head_ch // 2)).astype(np.float32)
    rel_w = rng.standard_normal((window, head_ch // 2)).astype(np.float32)
    order = make_curve_indices(block, order_mode)
    inv = inverse_permutation(order)

    got = np.asarray(
        block_halo_attention_xla(
            q, k, v, rel_h, rel_w, order, inv,
            block_size=block, halo_size=halo, num_heads=heads,
        ),
    )

    want = (
        torch_oracle(
            torch.from_numpy(q).permute(0, 3, 1, 2),
            torch.from_numpy(k).permute(0, 3, 1, 2),
            torch.from_numpy(v).permute(0, 3, 1, 2),
            torch.from_numpy(rel_h),
            torch.from_numpy(rel_w),
            block, halo, heads, order,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_attention_nonsquare_and_single_head():
    block, halo, heads, c = 4, 2, 1, 8
    rng = np.random.default_rng(7)
    q = rng.standard_normal((1, 8, 12, c)).astype(np.float32)
    k = rng.standard_normal((1, 8, 12, c)).astype(np.float32)
    v = rng.standard_normal((1, 8, 12, c)).astype(np.float32)
    window = block + 2 * halo
    rel_h = rng.standard_normal((window, c // 2)).astype(np.float32)
    rel_w = rng.standard_normal((window, c // 2)).astype(np.float32)
    order = make_curve_indices(block, CurveOrder.RASTER)
    inv = inverse_permutation(order)
    got = np.asarray(
        block_halo_attention_xla(
            q, k, v, rel_h, rel_w, order, inv,
            block_size=block, halo_size=halo, num_heads=heads,
        ),
    )
    want = (
        torch_oracle(
            torch.from_numpy(q).permute(0, 3, 1, 2),
            torch.from_numpy(k).permute(0, 3, 1, 2),
            torch.from_numpy(v).permute(0, 3, 1, 2),
            torch.from_numpy(rel_h), torch.from_numpy(rel_w),
            block, halo, heads, order,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_curve_indices_properties():
    for mode in CurveOrder:
        idx = make_curve_indices(8, mode)
        assert sorted(idx.tolist()) == list(range(64))
    # hilbert: consecutive points are grid neighbors
    idx = make_curve_indices(8, CurveOrder.HILBERT)
    xs, ys = idx % 8, idx // 8
    d = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (d == 1).all()
    # zorder: first quad of a 4x4 block
    z4 = make_curve_indices(4, CurveOrder.ZORDER)
    assert z4[:4].tolist() == [0, 1, 4, 5]


def test_block_divisibility_guard():
    """Non-block-divisible inputs fail loudly with a clear message
    (reference model.py:469-471)."""
    import jax.numpy as jnp
    import pytest

    from pixel_heal_thyself_tpu.ops.attention import block_halo_attention

    q = jnp.zeros((1, 12, 16, 8))  # H=12 not divisible by block 8
    rel = jnp.zeros((14, 1))
    idx = jnp.arange(64)
    with pytest.raises(ValueError, match="divisible by"):
        block_halo_attention(
            q, q, q, rel, rel, idx, idx,
            block_size=8, halo_size=3, num_heads=4,
        )
