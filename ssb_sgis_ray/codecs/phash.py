"""Perceptual hash (average hash, 8x8) over decoded pixels.

aHash: grayscale -> 8x8 block-mean downsample -> bit i = (cell > mean).
Robust to the engine's lossy quantization (identical for PSNR>=40 copies
of the same source in practice) and fully deterministic.

Implementation note: grayscale uses the channel SUM rather than the mean
— the bit predicate (cell mean > global mean) is invariant under positive
scaling, and integer sums stay exact in float64, so the integral-image
block sums below are exact in any summation order. Block means come from
one 2-D cumsum (integral image) + 64 vectorized corner lookups instead of
64 per-block ``.mean()`` calls — the per-image Python loop dominated the
flagship decode stage (19.9 s of a 30 s profile window).
"""

from __future__ import annotations

import numpy as np

_BIT_WEIGHTS = (np.uint64(1) << np.arange(63, dtype=np.uint64))


def ahash64(img: np.ndarray) -> np.int64:
    """(h, w, 3) uint8 -> 64-bit average hash (int64, top bit clear)."""
    gray = img.astype(np.float64).sum(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    # same block bounds as the scalar version: end = max(next, start+1)
    y0 = ys[:8]
    y1 = np.maximum(ys[1:], y0 + 1)
    x0 = xs[:8]
    x1 = np.maximum(xs[1:], x0 + 1)
    S = np.zeros((h + 1, w + 1))
    np.cumsum(gray, axis=0, out=S[1:, 1:])
    np.cumsum(S[1:, 1:], axis=1, out=S[1:, 1:])
    # 8x8 corner gathers, fully vectorized
    sums = (
        S[y1[:, None], x1[None, :]]
        - S[y0[:, None], x1[None, :]]
        - S[y1[:, None], x0[None, :]]
        + S[y0[:, None], x0[None, :]]
    )
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    cells = sums / areas
    # strict '>' with a tie margin: cell == mean EXACTLY (rational tie)
    # occurs for some content classes (first seen at sf1), and float
    # summation order would break the tie differently here vs the SQL
    # oracle. No nonzero |cell-mean| can be below 1/(64*lcm(areas))
    # ~ 2.5e-9, so a 1e-9 margin maps exact ties to bit 0 on BOTH sides
    # while never flipping a real bit.
    bits = (cells > cells.mean() + 1e-9).ravel()
    v = np.uint64((bits[:63].astype(np.uint64) * _BIT_WEIGHTS).sum())
    return np.int64(v)
