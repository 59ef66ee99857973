"""Perceptual hash (average hash, 8x8) over decoded pixels.

aHash: grayscale -> 8x8 block-mean downsample -> bit i = (cell > mean).
Robust to the engine's lossy quantization (identical for PSNR>=40 copies
of the same source in practice) and fully deterministic.
"""

from __future__ import annotations

import numpy as np


def ahash64(img: np.ndarray) -> np.int64:
    """(h, w, 3) uint8 -> 64-bit average hash (int64, top bit clear)."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            block = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                         xs[j] : max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean()
    bits = (cells > cells.mean()).ravel()
    v = np.uint64(0)
    for i, b in enumerate(bits[:63]):  # 63 bits -> always positive int64
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return np.int64(v)
