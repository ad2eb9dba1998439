"""Space-filling-curve orderings for block-local attention queries.

Capability parity with reference `pht/models/afgsa/model.py:347-398`
(CurveOrder enum; raster / Hilbert / Morton-Z permutations of a raster-
flattened block). The reference used the external `hilbertcurve` package;
here both curves are computed directly. Indices are precomputed host-side
as numpy arrays and baked into the jitted graph as constants — the
TPU-native analog of the reference's registered buffers.
"""

from __future__ import annotations

import math
from enum import Enum

import numpy as np


class CurveOrder(str, Enum):
    """Intra-block query ordering."""

    RASTER = "raster"
    HILBERT = "hilbert"
    ZORDER = "zorder"


def _hilbert_d(order: int, x: int, y: int) -> int:
    """Distance along a 2^order x 2^order Hilbert curve of the point (x, y)."""
    rx, ry, d = 0, 0, 0
    s = (1 << order) >> 1
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def _morton(x: int, y: int) -> int:
    """Morton code: bit-interleave of y (odd bits) and x (even bits)."""

    def part1(v: int) -> int:
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        return (v | (v << 1)) & 0x55555555

    return (part1(y) << 1) | part1(x)


def make_curve_indices(block_size: int, mode: CurveOrder | str) -> np.ndarray:
    """Permutation taking a raster-flattened block into curve order.

    Used as ``q = q[:, order, :]``; matches reference
    `pht/models/afgsa/model.py:355-398` (raster index = y*block + x,
    point (x, y) = (i % block, i // block)).
    """
    mode = CurveOrder(mode)
    n = block_size * block_size
    if mode is CurveOrder.RASTER:
        return np.arange(n, dtype=np.int32)

    xs = np.arange(n) % block_size
    ys = np.arange(n) // block_size

    if mode is CurveOrder.HILBERT:
        p = int(math.log2(block_size))
        if block_size != 1 << p:
            raise ValueError("Hilbert: block_size must be a power of two")
        keys = np.array(
            [_hilbert_d(p, int(x), int(y)) for x, y in zip(xs, ys)],
        )
    elif mode is CurveOrder.ZORDER:
        keys = np.array([_morton(int(x), int(y)) for x, y in zip(xs, ys)])
    else:  # pragma: no cover
        raise ValueError(f"unknown curve order: {mode}")

    return np.argsort(keys, kind="stable").astype(np.int32)


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    """Inverse of a permutation (reference `model.py:427` argsort)."""
    return np.argsort(perm, kind="stable").astype(np.int32)
