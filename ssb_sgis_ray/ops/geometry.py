"""Geometry-type handling + misc per-row geometry operators.

Covers the reference's geometry-type family (/root/reference/src/sgis/
geopandas_tools/geometry_types.py): ``get_geom_type`` (classify),
``to_single_geom_type`` (filter by family), ``make_all_singlepart``
(explode multiparts), plus ``buff`` (buffer with resolution=50 —
buffer_dissolve_explode.py:303-335), bounds helpers, and within-distance
joins (the buffered ``get_neighbor_indices`` pattern, neighbors.py:100-110
— buffer(max_distance) + sjoin ≡ a distance-predicate join, which the
engine evaluates directly and exactly instead of polygonizing a circle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geo import wkb

FAMILY_OF_CODE = {
    wkb.POINT: "point",
    wkb.MULTIPOINT: "point",
    wkb.LINESTRING: "line",
    wkb.MULTILINESTRING: "line",
    wkb.POLYGON: "polygon",
    wkb.MULTIPOLYGON: "polygon",
}


def add_geom_type(batch: pa.Table, wkb_col: str = "geometry_wkb") -> pa.Table:
    """Vectorized header read -> geom_type code + family columns."""
    codes = wkb.wkb_types(batch[wkb_col])
    fam = np.array([FAMILY_OF_CODE.get(int(c), "unknown") for c in codes], dtype=object)
    t = batch.append_column("geom_code", pa.array(codes.astype(np.int64), pa.int64()))
    return t.append_column("geom_family", pa.array(fam, pa.string()))


def to_single_geom_type(ds, family: str, wkb_col: str = "geometry_wkb"):
    """Keep only rows of one geometry family (geometry_types.py:25-120)."""

    def filt(batch: pa.Table) -> pa.Table:
        t = add_geom_type(batch, wkb_col)
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["geom_family"], family)).drop_columns(
            ["geom_code", "geom_family"]
        )

    return ds.map_batches(filt, batch_format="pyarrow")


def explode_multipoints(batch: pa.Table, id_col: str,
                        wkb_col: str = "geometry_wkb") -> pa.Table:
    """make_all_singlepart for MULTIPOINT rows: 1 row -> n point rows with
    a part_no column (geometry_types.py:10-22)."""
    buf_off = wkb._as_bytes_and_offsets(batch[wkb_col])
    buf, offsets = buf_off
    pos = offsets[:-1]
    types = wkb._read_u32(buf, pos + 1)
    out_id, out_part, out_x, out_y = [], [], [], []
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    for i in range(len(ids)):
        if types[i] == wkb.POINT:
            xy = np.frombuffer(bytes(buf[pos[i] + 5 : pos[i] + 21]), dtype="<f8")
            out_id.append(ids[i]); out_part.append(0)
            out_x.append(xy[0]); out_y.append(xy[1])
        elif types[i] == wkb.MULTIPOINT:
            npts = int(wkb._read_u32(buf, np.array([pos[i] + 5]))[0])
            base = int(pos[i]) + 9
            for j in range(npts):
                xy = np.frombuffer(
                    bytes(buf[base + j * 21 + 5 : base + j * 21 + 21]), dtype="<f8"
                )
                out_id.append(ids[i]); out_part.append(j)
                out_x.append(xy[0]); out_y.append(xy[1])
        else:
            raise ValueError("explode_multipoints expects POINT/MULTIPOINT")
    return pa.table(
        {
            id_col: pa.array(np.asarray(out_id, dtype=np.int64), pa.int64()),
            "part_no": pa.array(np.asarray(out_part, dtype=np.int64), pa.int64()),
            "x": pa.array(np.asarray(out_x), pa.float64()),
            "y": pa.array(np.asarray(out_y), pa.float64()),
        }
    )


def buff_points(x: np.ndarray, y: np.ndarray, distance: float,
                resolution: int = 50) -> np.ndarray:
    """Reference ``buff``: point buffer as a 4*resolution-gon circle
    (gpd buffer(resolution=50) => 200 segments per quarter-circle circle;
    buffer_dissolve_explode.py:303-335). Returns WKB object array."""
    n_seg = 4 * resolution
    ang = np.linspace(0.0, 2 * np.pi, n_seg + 1)
    ca, sa = np.cos(ang), np.sin(ang)
    out = np.empty(len(x), dtype=object)
    for i in range(len(x)):
        ring = np.stack([x[i] + distance * ca, y[i] + distance * sa], axis=1)
        ring[-1] = ring[0]
        out[i] = wkb.encode_polygon([ring])
    return out


class WithinDistanceJoin:
    """Actor stage: pairs (left point, right point) with L2 distance <= d.

    The engine form of buffer(max_distance)+sjoin (neighbors.py:100-104):
    evaluated as an exact integer distance predicate, no circle polygon
    approximation. Broadcast right side; per-batch vectorized.
    """

    def __init__(self, right_ref, distance: float, id_col: str,
                 x_col="px", y_col="py"):
        r = ray.get(right_ref)
        self.rx = r["x"].astype(np.float64)
        self.ry = r["y"].astype(np.float64)
        self.rid = r["id"].astype(np.int64)
        self.d2 = float(distance) * float(distance)
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_r, out_d = [], [], []
        for s in range(0, len(px), 4096):
            d2 = (px[s:s+4096, None] - self.rx[None, :]) ** 2 + (
                py[s:s+4096, None] - self.ry[None, :]
            ) ** 2
            li, ri = np.nonzero(d2 <= self.d2)
            out_l.append(ids[s:s+4096][li])
            out_r.append(self.rid[ri])
            out_d.append(d2[li, ri])
        cat = lambda xs, dt: (np.concatenate(xs) if xs else np.empty(0)).astype(dt)
        return pa.table(
            {
                self.id_col: pa.array(cat(out_l, np.int64), pa.int64()),
                "neighbor_id": pa.array(cat(out_r, np.int64), pa.int64()),
                "dist2": pa.array(cat(out_d, np.int64), pa.int64()),
            }
        )


def within_distance_pairs(left, right: dict, distance: float, id_col: str,
                          concurrency=(1, 8), batch_size: int = 16384):
    ref = ray.put(right)
    return left.map_batches(
        WithinDistanceJoin,
        fn_constructor_kwargs={"right_ref": ref, "distance": distance, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def size_ranks(table: pa.Table, area: np.ndarray, id_col: str) -> pa.Table:
    """sort_large_first as an explicit rank (general.py:244-309): rank 1 =
    largest area, ties broken by ascending id (the engine's deterministic
    stand-in for pandas row order)."""
    ids = table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -area))
    rank = np.empty(len(ids), dtype=np.int64)
    rank[order] = np.arange(1, len(ids) + 1)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "size_rank": pa.array(rank, pa.int64()),
        }
    )
