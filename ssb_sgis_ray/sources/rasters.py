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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# ElevationRaster.gradient (reference raster/elevationraster.py:6-88)
# ---------------------------------------------------------------------------

def elevation_params(doc_id: np.ndarray):
    """(w, h, base) per doc — deterministic elevation surface dims."""
    k = np.asarray(doc_id).astype(np.int64)
    return 20 + k % 15, 16 + k % 11, k % 100


def render_elevation(k: int, w: int, h: int) -> np.ndarray:
    """Nonlinear closed-form surface v(y, x) = x² + y(y+1)/2 + base.

    Chosen so np.gradient varies per pixel (a linear ramp would erase
    the interior/edge distinction) while staying uint16
    (max 33² + 25·26/2 + 99 = 1513) and every gradient value is an exact
    multiple of 1/4 at pixel scale (2, 2)."""
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return (x * x + y * (y + 1) // 2 + (k % 100)).astype(np.uint16)


def elevation_gradient_array(
    array: np.ndarray, res=PIXEL_SCALE, degrees: bool = False
) -> np.ndarray:
    """ElevationRaster.gradient's slope kernel (elevationraster.py:74-88):
    |∂₀/res₀| + |∂₁/res₁| via np.gradient (2nd-order interior, 1st-order
    edges), optionally converted to degrees through arctan."""
    g0, g1 = np.gradient(array.astype(np.float64), res[0], res[1])
    gradient = np.abs(g0) + np.abs(g1)
    if not degrees:
        return gradient
    return np.degrees(np.arctan(gradient))


class BuildElevationTiffs:
    """Actor stage: documents batch -> (doc_id, tif) elevation GeoTIFFs."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w, h, _ = elevation_params(doc_id)
        blobs = [
            geotiff.encode_geotiff(
                render_elevation(int(k), int(w[i]), int(h[i])),
                origin=(0.0, 0.0),
                pixel_scale=PIXEL_SCALE,
                compression="deflate" if k % 2 else "none",
            )
            for i, k in enumerate(doc_id)
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "tif": pa.array(blobs, pa.binary()),
            }
        )


class ElevationGradientStage:
    """Actor stage: decode elevation GeoTIFF -> gradient slope stats.

    Gradient values at pixel scale (2, 2) over an integer surface are
    exact multiples of 1/4, so stats are emitted in quarter units
    (q = 4·gradient) as int64 — no float leaves the stage. steep_cells
    counts pixels at q >= threshold_q (an integer-exact predicate)."""

    def __init__(self, threshold_q: int = 40):
        self.threshold_q = threshold_q

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["tif"].to_pylist()
        n = len(blobs)
        gsum = np.empty(n, dtype=np.int64)
        gmax = np.empty(n, dtype=np.int64)
        steep = np.empty(n, dtype=np.int64)
        for i, blob in enumerate(blobs):
            img, _ = geotiff.decode_geotiff(blob)
            q = 4.0 * elevation_gradient_array(img)
            gsum[i] = int(round(q.sum()))
            gmax[i] = int(round(q.max()))
            steep[i] = int((q >= self.threshold_q).sum())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "grad_sum_q": pa.array(gsum, pa.int64()),
                "grad_max_q": pa.array(gmax, pa.int64()),
                "steep_cells": pa.array(steep, pa.int64()),
            }
        )


def elevation_dataset(sf_dir: str, concurrency=None, batch_size: int = 256):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        BuildElevationTiffs, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


# ---------------------------------------------------------------------------
# Sentinel2 filename metadata (reference raster/sentinel.py:6-43):
# band via name_regex r"B\d{1,2}A|B\d{1,2}", date via r"20\d{6}",
# is_mask = "masks" in path, band -> color via the class's band_colors map.
# ---------------------------------------------------------------------------

SENTINEL_BANDS = (
    "B1", "B2", "B3", "B4", "B5", "B6", "B7",
    "B8", "B8A", "B9", "B10", "B11", "B12",
)
# sentinel.py:7-21 band_colors
SENTINEL_BAND_COLORS = {
    "B1": "coastal aerosol",
    "B2": "blue",
    "B3": "green",
    "B4": "red",
    "B5": "vegetation red edge",
    "B6": "vegetation red edge",
    "B7": "vegetation red edge",
    "B8": "nir",
    "B8A": "narrow nir",
    "B9": "water vapour",
    "B10": "swir - cirrus",
    "B11": "swir",
    "B12": "swir",
}
SENTINEL_NAME_REGEX = r"B\d{1,2}A|B\d{1,2}"
SENTINEL_DATE_REGEX = r"20\d{6}"


def sentinel_path_params(doc_id: np.ndarray):
    """(band_idx, date_num, is_mask) per doc — closed-form path pieces."""
    k = np.asarray(doc_id).astype(np.int64)
    band_idx = k % 13
    date_num = (2017 + k % 9) * 10000 + (1 + k % 12) * 100 + (1 + k % 28)
    is_mask = (k % 7 == 0).astype(np.int64)
    return band_idx, date_num, is_mask


def synth_sentinel_paths(doc_id: np.ndarray) -> list[str]:
    band_idx, date_num, is_mask = sentinel_path_params(doc_id)
    return [
        ("masks/" if m else "tiles/")
        + f"S2B_MSIL2A_{d}T104031_N0204_R008_T32VNM_{SENTINEL_BANDS[b]}_10m.tif"
        for b, d, m in zip(band_idx, date_num, is_mask)
    ]


class SentinelMetadata:
    """Actor stage: file-path batch -> (band, date, color, is_mask).

    The extraction runs pyarrow's RE2 kernels over the path strings —
    the same regexes the reference compiles per Raster; the oracle
    re-extracts with DuckDB's RE2 so both sides parse, neither copies."""

    def __init__(self):
        self.bands = pa.array(SENTINEL_BANDS, pa.string())
        self.colors = np.array(
            [SENTINEL_BAND_COLORS[b] for b in SENTINEL_BANDS], dtype=object
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch["path"]
        band = pc.struct_field(
            pc.extract_regex(paths, f"(?P<band>{SENTINEL_NAME_REGEX})"), "band"
        )
        date_s = pc.struct_field(
            pc.extract_regex(paths, f"(?P<date>{SENTINEL_DATE_REGEX})"), "date"
        )
        date = pc.cast(date_s, pa.int64())
        is_mask = pc.cast(
            pc.match_substring(paths, "masks"), pa.int64()
        )
        # fill_null(-1) -> the appended None slot: a path whose band regex
        # doesn't match (SCL/TCI/metadata files in real listings) emits a
        # null band/color row instead of a NaN->int64 IndexError
        idx = (
            pc.index_in(band, value_set=self.bands)
            .fill_null(-1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        color = pa.array(np.append(self.colors, None)[idx], pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "band": band,
                "date": date,
                "color": color,
                "is_mask": is_mask,
            }
        )


def sentinel_path_dataset(sf_dir: str, batch_size: int = 4096):
    import ray.data as rd

    def add_paths(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "path": pa.array(synth_sentinel_paths(doc_id), pa.string()),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(add_paths, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# Raster warp (reference raster/raster.py:1028-1105 WarpedVRT re-warp)
# ---------------------------------------------------------------------------


def warp_params(doc_id: np.ndarray):
    """(wd, hd, dx, dy) per doc: destination grid dims and origin jitter
    for the doubled-unit warp fixture."""
    k = np.asarray(doc_id).astype(np.int64)
    return 20 + k % 7, 15 + k % 5, k % 5, k % 3


class GeoTiffWarpStage:
    """Actor stage: decode GeoTIFF bytes and re-warp to a destination
    grid in a DOUBLED-unit CRS (dst world = 2 x src world) with pixel
    scale 3 and a per-doc origin jitter — the engine's Raster.warp
    (raster/raster.py:1028-1105 semantics: new CRS + new grid, nearest
    resampling). Emits the exact warped pixel sum + inside count, both
    closed-form recomputable by the SQL oracle (the mapped fractional
    coordinates are x.5/4 — exact in float64, so 'nearest' is integer
    arithmetic end to end)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["tif"].to_pylist()
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wd, hd, dx, dy = warp_params(doc_id)
        n = len(blobs)
        wsum = np.empty(n, dtype=np.int64)
        nin = np.empty(n, dtype=np.int64)
        for i, blob in enumerate(blobs):
            img, tr = geotiff.decode_geotiff(blob)
            ox, oy, _, _ = tr
            dst_tr = (2.0 * ox + float(dx[i]), 2.0 * oy - float(dy[i]),
                      3.0, 3.0)
            out, inside = geotiff.warp_raster(
                img, tr, dst_tr, (int(hd[i]), int(wd[i])),
                dst_to_src=lambda x, y: (x / 2.0, y / 2.0),
                method="nearest",
            )
            wsum[i] = int(out[inside].sum())
            nin[i] = int(inside.sum())
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "warp_sum": pa.array(wsum, pa.int64()),
                "n_inside": pa.array(nin, pa.int64()),
            }
        )
