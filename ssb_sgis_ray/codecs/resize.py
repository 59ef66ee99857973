"""Area-average image resize (SURVEY-adjacent multimodal stage; the task's
image layer names decode / feature-extract / RESIZE / frame-sample as the
actor-pool stages a 100 TB image pipeline needs).

General fractional-overlap area resampling, exact for any in/out dimension
pair: output cell (i, j) averages input pixels weighted by geometric
overlap, computed as two small weight matrices so the whole resize is two
matmuls per channel (no Python per-pixel work). Downsampling averages,
upsampling box-interpolates — both are the standard "pixel mixing" model
(same definition as OpenCV INTER_AREA for shrinking).
"""

from __future__ import annotations

import numpy as np


def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic overlap weights of output cell i
    [i*s, (i+1)*s) against input cell k [k, k+1), s = n_in/n_out."""
    s = n_in / n_out
    i = np.arange(n_out, dtype=np.float64)[:, None]
    k = np.arange(n_in, dtype=np.float64)[None, :]
    lo = np.maximum(i * s, k)
    hi = np.minimum((i + 1.0) * s, k + 1.0)
    return np.clip(hi - lo, 0.0, None) / s


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize (h, w[, c]) uint8 to (out_h, out_w[, c]) by exact area
    averaging; deterministic round-half-even to uint8."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError("output dims must be positive")
    wy = _area_weights(img.shape[0], out_h)
    wx = _area_weights(img.shape[1], out_w)
    f = img.astype(np.float64)
    if f.ndim == 2:
        out = wy @ f @ wx.T
    else:
        # (oh, h) @ (h, w*c) -> (oh, w, c); then contract w with wx
        oh = wy @ f.reshape(img.shape[0], -1)
        oh = oh.reshape(out_h, img.shape[1], -1)
        out = np.einsum("iwc,jw->ijc", oh, wx)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
