"""Deterministic GeoTIFF raster corpus + clip/zonal actor stages.

Mirrors the reference's raster surface (`/root/reference/src/sgis/raster/
raster.py:64-253,516-535`: ``Raster.from_path`` -> lazy ``load`` ->
``clip`` by world bounds) on real GeoTIFF bytes produced and parsed by
:mod:`ssb_sgis_ray.codecs.geotiff` — no rasterio/GDAL in this container,
but the files are spec-conformant classic TIFFs GDAL can open.

Synthesis is keyed off ``doc_id`` so every scale factor has a
reproducible raster corpus with closed-form pixel sums the DuckDB oracle
recomputes independently:

* dims ``w = 32 + k%17``, ``h = 24 + k%13``;
* pixel value ``(y, x) = x + 2*y + (k % 100)`` (fits uint8; dtype
  alternates uint8/uint16 on ``k % 3`` to exercise both sample layouts);
* compression alternates none/deflate on ``k % 2``;
* geotransform: origin ``(1000*(k%7), 500*(k%11))``, pixel scale (2, 2),
  north-up.

The clip stage sees ONLY the encoded bytes plus a world-coordinate bbox —
it must decode the geotransform from the blob and invert it to find the
pixel window, so a codec or georeferencing bug breaks the oracle match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import geotiff
from ..pool import default_pool

PIXEL_SCALE = (2.0, 2.0)


def raster_params(doc_id: np.ndarray):
    """(w, h, value_base, ox, oy) per doc — all int64."""
    k = np.asarray(doc_id).astype(np.int64)
    w = 32 + k % 17
    h = 24 + k % 13
    base = k % 100
    ox = 1000 * (k % 7)
    oy = 500 * (k % 11)
    return w, h, base, ox, oy


def clip_window_params(doc_id: np.ndarray):
    """(px0, py0, px1, py1) clip window per doc — always inside the raster."""
    k = np.asarray(doc_id).astype(np.int64)
    px0 = k % 5
    py0 = k % 3
    px1 = px0 + 10 + k % 9
    py1 = py0 + 8 + k % 5
    return px0, py0, px1, py1


def render_raster(k: int, w: int, h: int) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    img = x + 2 * y + (k % 100)
    return img.astype(np.uint8 if k % 3 == 0 else np.uint16)


class BuildGeoTiffs:
    """Actor stage: documents batch -> (doc_id, tif:binary, clip bbox in
    WORLD coordinates). The bbox is derived from the pixel-window closed
    form through the forward geotransform; the clip stage must invert it."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w, h, _, ox, oy = raster_params(doc_id)
        px0, py0, px1, py1 = clip_window_params(doc_id)
        sx, sy = PIXEL_SCALE
        blobs = [
            geotiff.encode_geotiff(
                render_raster(int(k), int(w[i]), int(h[i])),
                origin=(float(ox[i]), float(oy[i])),
                pixel_scale=PIXEL_SCALE,
                compression="deflate" if k % 2 else "none",
            )
            for i, k in enumerate(doc_id)
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "tif": pa.array(blobs, pa.binary()),
                "minx": pa.array((ox + sx * px0).astype(np.int64), pa.int64()),
                "miny": pa.array((oy - sy * py1).astype(np.int64), pa.int64()),
                "maxx": pa.array((ox + sx * px1).astype(np.int64), pa.int64()),
                "maxy": pa.array((oy - sy * py0).astype(np.int64), pa.int64()),
            }
        )


class GeoTiffClipZonal:
    """Actor stage: Raster.load + clip + zonal sum, from bytes alone.

    Decodes each GeoTIFF (strips, deflate, geotransform tags), inverts
    the transform to map the world bbox to a pixel window, and emits the
    window's exact pixel sum."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["tif"].to_pylist()
        bbox_cols = [
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in ("minx", "miny", "maxx", "maxy")
        ]
        n = len(blobs)
        win_w = np.empty(n, dtype=np.int64)
        win_h = np.empty(n, dtype=np.int64)
        px_sum = np.empty(n, dtype=np.int64)
        for i, blob in enumerate(blobs):
            img, transform = geotiff.decode_geotiff(blob)
            x0, y0, x1, y1 = geotiff.world_to_pixel_window(
                transform,
                (bbox_cols[0][i], bbox_cols[1][i], bbox_cols[2][i], bbox_cols[3][i]),
                img.shape,
            )
            win = img[y0:y1, x0:x1].astype(np.int64)
            win_w[i] = x1 - x0
            win_h[i] = y1 - y0
            px_sum[i] = int(win.sum())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "win_w": pa.array(win_w, pa.int64()),
                "win_h": pa.array(win_h, pa.int64()),
                "px_sum": pa.array(px_sum, pa.int64()),
            }
        )


def geotiff_dataset(sf_dir: str, concurrency=None, batch_size: int = 256):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        BuildGeoTiffs, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
