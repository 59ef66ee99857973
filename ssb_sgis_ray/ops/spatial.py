"""Spatial joins: sfilter (semi/anti/split), sjoin pairs, tile assignment.

Reproduces the semantics of the reference's ``sfilter`` family
(/root/reference/src/sgis/geopandas_tools/sfilter.py:67-268 — semi-join
keeps left rows matching ANY right geometry, deduplicated; anti is the
complement; split returns a matched flag) and the sjoin-pairs projection of
``get_neighbor_indices`` (neighbors.py:19-116), as Ray Data plans:

* **broadcast path** (small right side): the right geometry table is
  ``ray.put`` ONCE; each actor in the ``map_batches`` pool decodes it and
  builds an STRtree in ``__init__`` — never per batch. This is the
  "broadcast small side" plan from SURVEY.md §2.4.
* **cell co-partition path** (both sides large): both sides are flat-mapped
  to their covering cells (cells.cover_bbox), tagged, unioned, and joined
  per cell in ``groupby(cell).map_groups``; pair duplicates from
  multi-cell geometries are removed by a keep-first dedup on
  (left_id, right_id) — the halo-dedup discipline of the reference's
  ``gridloop`` (bounds.py:16-173).

Predicate: 'intersects' (boundary-inclusive), the reference default.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..geo import cells, kernels, wkb
from ..geo.strtree import STRtree

from ..pool import broadcast_map_batches, default_pool

Mode = Literal["semi", "anti", "split", "pairs"]


class _BroadcastIndex:
    """Decoded right side + STRtree, built once from a ray.put'd table."""

    def __init__(self, right_ref):
        right: pa.Table = ray.get(right_ref)
        self.table = right
        self.pg = wkb.decode_polygons(right["geometry_wkb"])
        self.bounds = kernels.polygon_bounds(self.pg)
        self.tree = STRtree(self.bounds)

    def match_points(self, px: np.ndarray, py: np.ndarray,
                     predicate: str = "intersects"):
        """(pt_idx, poly_idx) exact-match pairs for points."""
        qboxes = np.stack([px, py, px, py], axis=1).astype(np.float64)
        qi, pi = self.tree.query_bbox(qboxes)
        if len(qi) == 0:
            return qi, pi
        keep = kernels.points_in_polygon_pairs_predicate(
            px.astype(np.float64), py.astype(np.float64), self.pg, qi, pi,
            predicate,
        )
        return qi[keep], pi[keep]

    def match_polygons(self, left_pg: wkb.PolygonArray,
                       predicate: str = "intersects"):
        lb = kernels.polygon_bounds(left_pg)
        qi, pi = self.tree.query_bbox(lb)
        if len(qi) == 0:
            return qi, pi
        keep = kernels.polygon_predicate_pairs(
            left_pg, self.pg, qi, pi, predicate)
        return qi[keep], pi[keep]


class PIPFilter:
    """Actor-pool stage: point-in-polygon semi/anti/split filter.

    State (decoded polygons + STRtree) is built once per actor in
    ``__init__``; ``__call__`` handles one Arrow batch, fully vectorized.
    """

    def __init__(self, right_ref, mode: Mode = "semi", x_col="px", y_col="py",
                 predicate: str = "intersects"):
        self.idx = _BroadcastIndex(right_ref)
        self.mode = mode
        self.x_col = x_col
        self.y_col = y_col
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False)
        py = batch[self.y_col].to_numpy(zero_copy_only=False)
        qi, _ = self.idx.match_points(px, py, self.predicate)
        matched = np.zeros(len(batch), dtype=bool)
        matched[qi] = True  # np.unique-style dedup: any match keeps the row
        if self.mode == "semi":
            return batch.filter(pa.array(matched))
        if self.mode == "anti":
            return batch.filter(pa.array(~matched))
        return batch.append_column("matched", pa.array(matched))


class PIPJoin:
    """Actor-pool stage: inner spatial join point->polygon, emitting one
    output row per matching (point, polygon) pair with selected right
    columns appended (suffix handling as in clean_overlay step 7)."""

    def __init__(self, right_ref, right_cols: list[str], x_col="px", y_col="py"):
        self.idx = _BroadcastIndex(right_ref)
        self.right_cols = right_cols
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False)
        py = batch[self.y_col].to_numpy(zero_copy_only=False)
        qi, pi = self.idx.match_points(px, py)
        left = batch.take(pa.array(qi, pa.int64()))
        for c in self.right_cols:
            col = self.idx.table[c].take(pa.array(pi, pa.int64()))
            name = f"{c}_2" if c in left.column_names else c
            left = left.append_column(name, col)
        return left


class PolyPolyFilter:
    """Polygon-left semi/anti/split filter against broadcast polygons."""

    def __init__(self, right_ref, mode: Mode = "semi", wkb_col="geometry_wkb",
                 predicate: str = "intersects"):
        self.idx = _BroadcastIndex(right_ref)
        self.mode = mode
        self.wkb_col = wkb_col
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        left_pg = wkb.decode_polygons(batch[self.wkb_col])
        qi, _ = self.idx.match_polygons(left_pg, self.predicate)
        matched = np.zeros(len(batch), dtype=bool)
        matched[qi] = True
        if self.mode == "semi":
            return batch.filter(pa.array(matched))
        if self.mode == "anti":
            return batch.filter(pa.array(~matched))
        return batch.append_column("matched", pa.array(matched))


class PolyPolyPairs:
    """Polygon-left inner join pairs (left id cols × right cols)."""

    def __init__(self, right_ref, right_cols: list[str], wkb_col="geometry_wkb"):
        self.idx = _BroadcastIndex(right_ref)
        self.right_cols = right_cols
        self.wkb_col = wkb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        left_pg = wkb.decode_polygons(batch[self.wkb_col])
        qi, pi = self.idx.match_polygons(left_pg)
        left = batch.take(pa.array(qi, pa.int64()))
        for c in self.right_cols:
            col = self.idx.table[c].take(pa.array(pi, pa.int64()))
            name = f"{c}_2" if c in left.column_names else c
            left = left.append_column(name, col)
        return left


class LineFilter:
    """Actor-pool stage: LINE-left semi/anti/split filter against the
    broadcast areal right — the geometry kind where ``crosses`` is a real
    predicate (kernels.lines_in_polygon_pairs_predicate)."""

    def __init__(self, right_ref, mode: Mode = "semi", wkb_col="geometry_wkb",
                 predicate: str = "intersects"):
        self.idx = _BroadcastIndex(right_ref)
        self.mode = mode
        self.wkb_col = wkb_col
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = wkb.decode_lines(batch[self.wkb_col].to_numpy(zero_copy_only=False))
        lb = kernels.line_bounds(la)
        qi, pi = self.idx.tree.query_bbox(lb)
        if len(qi):
            keep = kernels.lines_in_polygon_pairs_predicate(
                la, self.idx.pg, qi, pi, self.predicate)
            qi = qi[keep]
        matched = np.zeros(len(batch), dtype=bool)
        matched[qi] = True
        if self.mode == "semi":
            return batch.filter(pa.array(matched))
        if self.mode == "anti":
            return batch.filter(pa.array(~matched))
        return batch.append_column("matched", pa.array(matched))


def broadcast_table(table: pa.Table):
    """ray.put the small side once; pass the ref into actor pools."""
    return ray.put(table)


def sfilter(
    left,
    right_table: pa.Table,
    mode: Mode = "semi",
    left_kind: Literal["point", "polygon", "line"] = "point",
    concurrency=None,
    batch_size: int = 32768,
    nrows=None,
    predicate: str = "intersects",
):
    """Spatial semi/anti/split filter of a Dataset against a small polygon
    table (broadcast plan). ``left`` must carry px/py (points) or
    geometry_wkb (polygons). ``nrows``: optional left row-count hint to
    size the actor pool (see pool.default_pool). ``predicate``: the full
    reference vocabulary (sfilter.py:67-134) — intersects / within /
    touches / overlaps / covers / contains / covered_by / crosses; see
    geo.kernels.points_in_polygon_pairs_predicate and
    polygon_predicate_pairs for the per-kind semantics."""
    ref = broadcast_table(right_table)
    cls = {"point": PIPFilter, "polygon": PolyPolyFilter,
           "line": LineFilter}[left_kind]
    return broadcast_map_batches(
        left,
        cls,
        fn_constructor_kwargs={"right_ref": ref, "mode": mode,
                               "predicate": predicate},
        batch_size=batch_size,
        concurrency=concurrency,
        nrows=nrows,
    )


def sjoin_pairs(
    left,
    right_table: pa.Table,
    right_cols: list[str],
    left_kind: Literal["point", "polygon"] = "point",
    concurrency=None,
    batch_size: int = 32768,
    nrows=None,
):
    """Inner spatial join (one row per matching pair), broadcast plan."""
    ref = broadcast_table(right_table)
    cls = PIPJoin if left_kind == "point" else PolyPolyPairs
    return broadcast_map_batches(
        left,
        cls,
        fn_constructor_kwargs={"right_ref": ref, "right_cols": right_cols},
        batch_size=batch_size,
        concurrency=concurrency,
        nrows=nrows,
    )


# ---------------------------------------------------------------------------
# Cell co-partition join (both sides large) — the shuffle plan
# ---------------------------------------------------------------------------


def _tag_points_with_cells(batch: pa.Table, res: int, id_col: str, x_col, y_col) -> pa.Table:
    px = batch[x_col].to_numpy(zero_copy_only=False)
    py = batch[y_col].to_numpy(zero_copy_only=False)
    cell = cells.xy_to_cell(px.astype(np.float64), py.astype(np.float64), res)
    return pa.table(
        {
            "cell": pa.array(cell, pa.int64()),
            "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
            "left_id": batch[id_col],
            "px": pa.array(px, pa.int64()),
            "py": pa.array(py, pa.int64()),
            "right_id": pa.array(np.full(len(batch), -1, dtype=np.int64)),
            "geometry_wkb": pa.array([None] * len(batch), pa.binary()),
        }
    )


def _tag_polys_with_cells(batch: pa.Table, res: int, id_col: str) -> pa.Table:
    pg = wkb.decode_polygons(batch["geometry_wkb"])
    b = kernels.polygon_bounds(pg)
    rows, cell = cells.cover_bbox(b[:, 0], b[:, 1], b[:, 2] + 1e-9, b[:, 3] + 1e-9, res)
    # +1e-9: polygon footprints are closed sets — a polygon whose max edge
    # lies exactly on a cell boundary can still touch points in the next
    # cell (boundary-inclusive 'intersects'), so pad the half-open cover.
    ids = batch[id_col].to_numpy(zero_copy_only=False)[rows]
    geom = batch["geometry_wkb"].take(pa.array(rows, pa.int64()))
    n = len(rows)
    return pa.table(
        {
            "cell": pa.array(cell, pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "left_id": pa.array(np.full(n, -1, dtype=np.int64)),
            "px": pa.array(np.zeros(n, dtype=np.int64)),
            "py": pa.array(np.zeros(n, dtype=np.int64)),
            "right_id": pa.array(ids, pa.int64()),
            "geometry_wkb": geom,
        }
    )


def _per_cell_pip(group: pd.DataFrame) -> pd.DataFrame:
    """Join one cell's points with its polygons -> (left_id, right_id)."""
    pts = group[group["side"] == 0]
    pls = group[group["side"] == 1]
    if len(pts) == 0 or len(pls) == 0:
        return pd.DataFrame({"left_id": pd.Series([], dtype="int64"),
                             "right_id": pd.Series([], dtype="int64")})
    pg = wkb.decode_polygons(pls["geometry_wkb"].to_numpy())
    bounds = kernels.polygon_bounds(pg)
    tree = STRtree(bounds)
    px = pts["px"].to_numpy().astype(np.float64)
    py = pts["py"].to_numpy().astype(np.float64)
    qboxes = np.stack([px, py, px, py], axis=1)
    qi, pi = tree.query_bbox(qboxes)
    if len(qi):
        keep = kernels.points_in_polygon_pairs(px, py, pg, qi, pi)
        qi, pi = qi[keep], pi[keep]
    return pd.DataFrame(
        {
            "left_id": pts["left_id"].to_numpy()[qi],
            "right_id": pls["right_id"].to_numpy()[pi],
        }
    )


def sjoin_cell_partitioned(
    left,
    right,
    res: int = 7,
    left_id: str = "left_id",
    right_id: str = "right_id",
    x_col: str = "px",
    y_col: str = "py",
    salt_threshold: int | None = None,
    n_salts: int = 8,
    skew_report_dir: str | None = None,
):
    """Large×large PIP join: co-partition by covering cell, join per cell.

    Points land in exactly one cell; polygons are replicated to every cell
    their bbox overlaps, so a pair can match in at most one cell for PIP
    (the point's cell) — no dedup leg needed for the point-left case.
    Returns a Dataset of (left_id, right_id) pairs.

    Skew handling (north rule): with ``salt_threshold`` set, a first cheap
    pass counts left rows per cell (projection of the cell column only);
    cells above the threshold ("urban hotspots") are SALTED — their left
    rows split into ``n_salts`` sub-partitions by a deterministic id hash,
    and the right rows covering a hot cell are replicated to every salt, so
    no single shuffle partition exceeds ~threshold rows. Results are
    identical with or without salting.

    ``skew_report_dir``: when set, the post-salting per-cell row
    histogram is summarized into <dir>/skew_metrics.jsonl (straggler
    telemetry — state.skew) at the cost of one extra tagging pass.
    """
    lt = left.map_batches(
        lambda b: _tag_points_with_cells(b, res, left_id, x_col, y_col),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        lambda b: _tag_polys_with_cells(b, res, right_id), batch_format="pyarrow"
    )

    hot_cells: frozenset = frozenset()
    if salt_threshold is not None:
        from ray.data.aggregate import Count

        hist = (
            lt.select_columns(["cell"])
            .groupby("cell")
            .aggregate(Count(alias_name="n"))
            .to_pandas()
        )  # one small row per distinct cell — the skew histogram
        hot_cells = frozenset(
            int(c) for c, n in zip(hist["cell"], hist["n"]) if n > salt_threshold
        )

    if hot_cells:
        lt = lt.map_batches(
            lambda b: _salt_left(b, hot_cells, n_salts), batch_format="pyarrow"
        )
        rt = rt.map_batches(
            lambda b: _salt_right(b, hot_cells, n_salts), batch_format="pyarrow"
        )

    both = lt.union(rt)
    if skew_report_dir is not None:
        from ..state import skew as skew_mod

        skew_mod.record_cell_skew(
            skew_report_dir,
            skew_mod.cell_skew_summary(
                both, stage=f"pip_pairs_cell(res={res}, "
                f"salt_threshold={salt_threshold})"))
    return both.groupby("cell").map_groups(_per_cell_pip, batch_format="pandas")


_SALT_MULT = np.int64(2654435761)


def _salt_left(batch: pa.Table, hot_cells: frozenset, n_salts: int) -> pa.Table:
    """Shuffle key := cell*n_salts + salt(left_id) for hot cells."""
    cell = batch["cell"].to_numpy(zero_copy_only=False)
    lid = batch["left_id"].to_numpy(zero_copy_only=False)
    hot = np.isin(cell, np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells)))
    salt = np.where(hot, (lid * _SALT_MULT) % n_salts, 0)
    key = cell * n_salts + salt
    return batch.set_column(0, "cell", pa.array(key, pa.int64()))


def _salt_right(batch: pa.Table, hot_cells: frozenset, n_salts: int) -> pa.Table:
    """Replicate right rows covering a hot cell to every salt sub-key."""
    cell = batch["cell"].to_numpy(zero_copy_only=False)
    hot = np.isin(cell, np.fromiter(hot_cells, dtype=np.int64, count=len(hot_cells)))
    reps = np.where(hot, n_salts, 1)
    rows = np.repeat(np.arange(len(batch)), reps)
    base = np.concatenate(([0], np.cumsum(reps)[:-1]))
    salt = np.arange(int(reps.sum())) - np.repeat(base, reps)
    out = batch.take(pa.array(rows, pa.int64()))
    key = cell[rows] * n_salts + salt
    return out.set_column(0, "cell", pa.array(key, pa.int64()))


# ---------------------------------------------------------------------------
# Tile assignment (raster<->vector half of the north-star metric)
# ---------------------------------------------------------------------------


def assign_point_tiles(batch: pa.Table, gridsize: int, x_col="px", y_col="py") -> pa.Table:
    """Point -> containing tile (tile_x, tile_y, ssb_id). Mirrors the
    reference's add_grid_id (bounds.py:341-372)."""
    px = batch[x_col].to_numpy(zero_copy_only=False)
    py = batch[y_col].to_numpy(zero_copy_only=False)
    tx, ty = cells.tile_xy(px, py, gridsize)
    t = batch.append_column("tile_x", pa.array(tx, pa.int64()))
    t = t.append_column("tile_y", pa.array(ty, pa.int64()))
    sid = pc.binary_join_element_wise(
        pc.cast(t["tile_x"], pa.string()), pc.cast(t["tile_y"], pa.string()), "_"
    )
    return t.append_column("ssb_id", sid)


def cover_tiles_flatmap(
    batch: pa.Table, gridsize: int, id_col: str, bbox_cols=("minx", "miny", "maxx", "maxy")
) -> pa.Table:
    """Footprint bbox -> one output row per covering tile (half-open).

    This is the raster<->vector assignment: an image footprint spanning k
    tiles appears k times, keyed (id, tile_x, tile_y)."""
    minx = batch[bbox_cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
    miny = batch[bbox_cols[1]].to_numpy(zero_copy_only=False).astype(np.int64)
    maxx = batch[bbox_cols[2]].to_numpy(zero_copy_only=False).astype(np.int64)
    maxy = batch[bbox_cols[3]].to_numpy(zero_copy_only=False).astype(np.int64)
    x0 = minx // gridsize
    y0 = miny // gridsize
    x1 = (maxx - 1) // gridsize
    y1 = (maxy - 1) // gridsize
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    counts = nx * ny
    total = int(counts.sum())
    rows = np.repeat(np.arange(len(batch)), counts)
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total) - np.repeat(base, counts)
    tx = np.repeat(x0, counts) + within % np.repeat(nx, counts)
    ty = np.repeat(y0, counts) + within // np.repeat(nx, counts)
    out = pa.table(
        {
            id_col: batch[id_col].take(pa.array(rows, pa.int64())),
            "tile_x": pa.array(tx, pa.int64()),
            "tile_y": pa.array(ty, pa.int64()),
        }
    )
    return out


def map_tiles(
    ds,
    func,
    gridsize: int,
    x_col: str = "px",
    y_col: str = "py",
    halo: float = 0.0,
    batch_format: str = "pandas",
):
    """gridloop-style per-tile UDF (the reference's user-extension surface,
    /root/reference/src/sgis/geopandas_tools/bounds.py:16-173): run ``func``
    once per grid tile over the rows that fall in the tile, optionally with
    a ``halo``-meter margin (rows within ``halo`` of a tile boundary are
    replicated into the neighboring tile, like gridloop's ``gridbuffer``).

    ``func(group)`` receives the tile's rows (tile_x/tile_y columns
    included, halo copies flagged ``in_halo=True``) and returns a
    DataFrame; results are concatenated across tiles. The UDF is
    responsible for halo discipline (e.g. clip results back to the tile),
    exactly as with gridloop's clip=True.
    """

    def tag(batch: pa.Table) -> pa.Table:
        px = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rows, tx, ty, in_halo = _halo_tiles(px, py, gridsize, halo)
        out = batch.take(pa.array(rows, pa.int64()))
        out = out.append_column("tile_x", pa.array(tx, pa.int64()))
        out = out.append_column("tile_y", pa.array(ty, pa.int64()))
        return out.append_column("in_halo", pa.array(in_halo))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby(["tile_x", "tile_y"]).map_groups(
        func, batch_format=batch_format
    )


def _halo_tiles(px, py, gridsize, halo):
    """Row -> (containing tile) plus neighbor tiles within ``halo``."""
    minx = px - halo
    maxx = px + halo
    miny = py - halo
    maxy = py + halo
    x0 = np.floor(minx / gridsize).astype(np.int64)
    x1 = np.floor(maxx / gridsize).astype(np.int64)
    y0 = np.floor(miny / gridsize).astype(np.int64)
    y1 = np.floor(maxy / gridsize).astype(np.int64)
    home_x = np.floor(px / gridsize).astype(np.int64)
    home_y = np.floor(py / gridsize).astype(np.int64)
    nx = x1 - x0 + 1
    ny = y1 - y0 + 1
    counts = nx * ny
    total = int(counts.sum())
    rows = np.repeat(np.arange(len(px)), counts)
    base = np.concatenate(([0], np.cumsum(counts)[:-1]))
    within = np.arange(total) - np.repeat(base, counts)
    tx = np.repeat(x0, counts) + within % np.repeat(nx, counts)
    ty = np.repeat(y0, counts) + within // np.repeat(nx, counts)
    in_halo = (tx != home_x[rows]) | (ty != home_y[rows])
    return rows, tx, ty, in_halo


def make_ssb_grid(points_ds, gridsize: int, x_col: str = "px", y_col: str = "py"):
    """Polygon grid with SSB ids covering a layer's total bounds —
    the reference's make_ssb_grid/make_grid_from_bbox
    (bounds.py:176-372) as a two-stage Dataset plan:

      1. total bounds via a distributed Min/Max aggregate (tiny result)
      2. the cell lattice synthesized as a streamed ``rd.range`` over the
         cell count — each row becomes one grid polygon (WKB) with its
         Statistics-Norway SSBID (east component offset by +2,000,000,
         both components floored to gridsize multiples, concatenated as
         unpadded int strings)

    The grid is never materialized on the driver; at a national 1 km
    grid (~3.2M cells) stage 2 is an ordinary streamed synthesis."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from ..geo import wkb as wkb_mod

    b = points_ds.aggregate(
        Min(x_col, alias_name="mnx"), Min(y_col, alias_name="mny"),
        Max(x_col, alias_name="mxx"), Max(y_col, alias_name="mxy"),
    )
    gs = int(gridsize)
    gx0 = int(np.floor((b["mnx"] + 2_000_000) / gs))
    gx1 = int(np.floor((b["mxx"] + 2_000_000) / gs))
    gy0 = int(np.floor(b["mny"] / gs))
    gy1 = int(np.floor(b["mxy"] / gs))
    nx = gx1 - gx0 + 1
    ny = gy1 - gy0 + 1

    def build(batch: dict) -> pa.Table:
        i = batch["id"].astype(np.int64)
        gx = gx0 + i // ny
        gy = gy0 + i % ny
        east = gx * gs
        north = gy * gs
        minx = east - 2_000_000
        miny = north
        blobs = [
            wkb_mod.encode_polygon([np.array(
                [[x0, y0], [x0 + gs, y0], [x0 + gs, y0 + gs],
                 [x0, y0 + gs], [x0, y0]], dtype=float)])
            for x0, y0 in zip(minx, miny)
        ]
        return pa.table(
            {
                "ssb_id": pa.array(
                    [f"{e}{n}" for e, n in zip(east, north)], pa.string()
                ),
                "cell_minx": pa.array(minx, pa.int64()),
                "cell_miny": pa.array(miny, pa.int64()),
                "geometry_wkb": pa.array(blobs, pa.binary()),
            }
        )

    return rd.range(nx * ny).map_batches(build, batch_format="numpy")


# ---------------------------------------------------------------------------
# Tile pyramid: multi-zoom tile counts in one pass
# ---------------------------------------------------------------------------


def tile_pyramid(tiles_ds, levels: int = 4, x_col: str = "tile_x",
                 y_col: str = "tile_y", driver_limit: int = 4_000_000):
    """Zoom-pyramid aggregation over tile rows: for every level
    ``l in [0, levels)`` the level-l cell of a tile is
    ``(x >> l, y >> l)`` and the output is (level, tile_x, tile_y, n) —
    the tile-pyramid build a serving stack runs after tile assignment.

    ALL levels aggregate in ONE pass: each batch emits unique
    (packed_key, count) partials for every level (the map-side combine
    discipline), packed as level<<48 | x<<24 | y into a single int64
    shuffle key. Below ``driver_limit`` partial rows the final sum is
    one driver np pass (the groupby exchange is pure fixed machinery at
    that size — same dual plan as duplicated_spans); beyond it, one
    narrow int64-keyed distributed groupby. Tile ids must be in
    [0, 2^24) (nonnegative domain grid ids; asserted per batch).
    """
    from ray.data.aggregate import Sum

    mask24 = (1 << 24) - 1

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.min() < 0 or y.min() < 0 or
                       x.max() > mask24 or y.max() > mask24):
            raise ValueError("tile ids must be in [0, 2^24)")
        keys = []
        for lv in range(levels):
            keys.append((np.int64(lv) << np.int64(48))
                        | ((x >> lv) << np.int64(24)) | (y >> lv))
        u, c = np.unique(np.concatenate(keys) if keys
                         else np.empty(0, np.int64), return_counts=True)
        return pa.table({"key": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    def unpack(key: np.ndarray, n: np.ndarray) -> pa.Table:
        order = np.argsort(key, kind="stable")
        key, n = key[order], n[order]
        return pa.table({
            "level": pa.array(key >> np.int64(48), pa.int64()),
            "tile_x": pa.array((key >> np.int64(24)) & mask24, pa.int64()),
            "tile_y": pa.array(key & mask24, pa.int64()),
            "n": pa.array(n, pa.int64()),
        })

    partials = tiles_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=8192
    ).materialize()

    if partials.count() <= driver_limit:
        df = partials.to_pandas()
        k = df["key"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        tot = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        return unpack(u, tot)

    agg = partials.groupby("key").aggregate(Sum(on="c", alias_name="n"))
    return agg.map_batches(
        lambda b: unpack(
            b["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        ),
        batch_format="pyarrow",
    )


def focal_hotspots(points_ds, cell_size: int, x_col: str = "px",
                   y_col: str = "py", hot_threshold: int = 0,
                   driver_limit: int = 4_000_000):
    """3x3 focal (moving-window) count statistic over grid cells with a
    Getis-Ord-flavored hotspot flag — the classic raster focal-sum /
    hotspot-detection op (reference raster.py zonal/aggregate family),
    expressed as scatter-gather aggregation instead of array windows so
    it runs over an unbounded streaming point table.

    Plan: per-batch (packed cell key, count) partials (map-side
    combine) -> cell counts (driver np pass below ``driver_limit``
    partial rows, one int64 groupby beyond — the tile_pyramid dual
    plan) -> each cell SCATTERS its count to its 9 neighbors tagged
    with a self marker -> one more key-sum -> cells with their own
    points emit (cnt, focal, is_hot). No join: the self marker rides
    the same aggregation that builds the focal sum. Cells with zero
    points contribute nothing and are absent from the output (exactly
    the sparse-raster semantics); no wraparound — out-of-domain
    neighbors are dropped.

    Scale shape: two narrow int64-keyed exchanges at most, partials
    bounded by (distinct cells x batches), neighbor expansion is a
    fixed x9 on the ALREADY-AGGREGATED cell table (|cells|, not
    |points|).
    """
    from ray.data.aggregate import Sum

    mask24 = (1 << 24) - 1
    cs = np.int64(cell_size)

    def partial(b: pa.Table) -> pa.Table:
        x = b[x_col].to_numpy(zero_copy_only=False).astype(np.int64) // cs
        y = b[y_col].to_numpy(zero_copy_only=False).astype(np.int64) // cs
        if len(x) and (x.min() < 0 or y.min() < 0 or
                       x.max() > mask24 or y.max() > mask24):
            raise ValueError("cell ids must be in [0, 2^24)")
        u, c = np.unique((x << np.int64(24)) | y, return_counts=True)
        return pa.table({"key": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def scatter(key: np.ndarray, cnt: np.ndarray) -> pa.Table:
        cx, cy = key >> np.int64(24), key & np.int64(mask24)
        ks, contrib, selfc = [], [], []
        for dx, dy in offsets:
            nx, ny = cx + dx, cy + dy
            ok = (nx >= 0) & (ny >= 0)
            ks.append((nx[ok] << np.int64(24)) | ny[ok])
            contrib.append(cnt[ok])
            selfc.append(cnt[ok] if (dx == 0 and dy == 0)
                         else np.zeros(ok.sum(), np.int64))
        return pa.table({
            "key": pa.array(np.concatenate(ks), pa.int64()),
            "contrib": pa.array(np.concatenate(contrib), pa.int64()),
            "selfc": pa.array(np.concatenate(selfc), pa.int64()),
        })

    def emit(key: np.ndarray, focal: np.ndarray, cnt: np.ndarray) -> pa.Table:
        keep = cnt > 0
        key, focal, cnt = key[keep], focal[keep], cnt[keep]
        order = np.argsort(key, kind="stable")
        key, focal, cnt = key[order], focal[order], cnt[order]
        return pa.table({
            "cell_x": pa.array(key >> np.int64(24), pa.int64()),
            "cell_y": pa.array(key & np.int64(mask24), pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "focal": pa.array(focal, pa.int64()),
            "is_hot": pa.array(focal >= np.int64(hot_threshold), pa.bool_()),
        })

    partials = points_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=8192
    ).materialize()

    if partials.count() <= driver_limit:
        df = partials.to_pandas()
        k = df["key"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        u, inv = np.unique(k, return_inverse=True)
        cnt = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        sc = scatter(u, cnt)
        sk = sc["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        u2, inv2 = np.unique(np.concatenate([u, sk]), return_inverse=True)
        focal = np.bincount(
            inv2[len(u):], weights=sc["contrib"].to_numpy(
                zero_copy_only=False).astype(np.float64),
            minlength=len(u2)).astype(np.int64)
        selfcnt = np.zeros(len(u2), np.int64)
        selfcnt[inv2[:len(u)]] = cnt
        return emit(u2, focal, selfcnt)

    cells = partials.groupby("key").aggregate(Sum(on="c", alias_name="cnt"))
    scattered = cells.map_batches(
        lambda b: scatter(
            b["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow",
    )
    agg = scattered.groupby("key").aggregate(
        Sum(on="contrib", alias_name="focal"),
        Sum(on="selfc", alias_name="cnt"),
    )
    return agg.map_batches(
        lambda b: emit(
            b["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["focal"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Cell co-partitioned predicate sfilter (both sides large)
# ---------------------------------------------------------------------------


def _tag_polys_generic(batch: pa.Table, res: int, id_col: str,
                       side: int) -> pa.Table:
    """(cell, side, gid, geometry_wkb) rows — each polygon replicated to
    every covering cell, full geometry riding along (predicates need the
    whole shape in every shared cell)."""
    pg = wkb.decode_polygons(batch["geometry_wkb"])
    b = kernels.polygon_bounds(pg)
    rows, cell = cells.cover_bbox(
        b[:, 0], b[:, 1], b[:, 2] + 1e-9, b[:, 3] + 1e-9, res)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
    return pa.table({
        "cell": pa.array(cell, pa.int64()),
        "side": pa.array(np.full(len(rows), side, np.int8), pa.int8()),
        "gid": pa.array(ids, pa.int64()),
        "geometry_wkb": batch["geometry_wkb"].take(pa.array(rows, pa.int64())),
    })


def _tag_lines_generic(batch: pa.Table, res: int, id_col: str,
                       side: int) -> pa.Table:
    """(cell, side, gid, geometry_wkb) rows for LINE lefts — bbox-cover
    replication, the line sibling of _tag_polys_generic."""
    la = wkb.decode_lines(batch["geometry_wkb"].to_numpy(zero_copy_only=False))
    b = kernels.line_bounds(la)
    rows, cell = cells.cover_bbox(
        b[:, 0], b[:, 1], b[:, 2] + 1e-9, b[:, 3] + 1e-9, res)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[rows]
    return pa.table({
        "cell": pa.array(cell, pa.int64()),
        "side": pa.array(np.full(len(rows), side, np.int8), pa.int8()),
        "gid": pa.array(ids, pa.int64()),
        "geometry_wkb": batch["geometry_wkb"].take(pa.array(rows, pa.int64())),
    })


def sfilter_cell(left_ds, right_ds, *, left_id: str = "left_id",
                 right_id: str = "right_id",
                 predicate: str = "intersects", mode: Mode = "semi",
                 res: int = 7,
                 left_kind: Literal["polygon", "line"] = "polygon"):
    """Large×large predicate sfilter — the scale path when the right
    side exceeds the broadcast envelope (PolyPolyFilter decodes the
    whole right table and builds its STRtree in every actor; at 10^6+
    geometries that init dominates). Both sides stream as Datasets,
    co-partition by covering cell (ONE shuffle), and each cell kernel
    evaluates the full predicate vocabulary via
    kernels.polygon_predicate_pairs.

    Pair completeness: any pair satisfying any predicate has overlapping
    bboxes and therefore shares at least one covering cell; multi-cell
    duplicates collapse in the distinct. Output is the ID-CENTRIC
    surface (distinct int64 left ids kept by the filter — semi: matched,
    anti: unmatched); callers re-join attributes by id, keeping the
    exchange narrow (same contract as clean_overlay_cell). An empty
    result (e.g. anti over an all-matching fixture) comes back as a
    schema-less empty Dataset — the known empty-map_groups quirk
    (DEVNOTES). ``left_kind='line'`` runs the line predicate kernel
    (lines_in_polygon_pairs_predicate) over linestring lefts instead."""
    tag_left = (_tag_polys_generic if left_kind == "polygon"
                else _tag_lines_generic)
    lt = left_ds.map_batches(
        lambda b: tag_left(b, res, left_id, 0),
        batch_format="pyarrow")
    rt = right_ds.map_batches(
        lambda b: _tag_polys_generic(b, res, right_id, 1),
        batch_format="pyarrow")

    empty = pd.DataFrame({"gid": pd.Series([], dtype="int64")})

    def cell_kernel(g: pd.DataFrame) -> pd.DataFrame:
        sides = g["side"].to_numpy()
        lmask = sides == 0
        rmask = ~lmask
        if not lmask.any() or not rmask.any():
            return empty
        rg = wkb.decode_polygons(g["geometry_wkb"].to_numpy()[rmask])
        tree = STRtree(kernels.polygon_bounds(rg))
        if left_kind == "polygon":
            lg = wkb.decode_polygons(g["geometry_wkb"].to_numpy()[lmask])
            qi, pi = tree.query_bbox(kernels.polygon_bounds(lg))
            if not len(qi):
                return empty
            keep = kernels.polygon_predicate_pairs(lg, rg, qi, pi, predicate)
        else:
            lg = wkb.decode_lines(g["geometry_wkb"].to_numpy()[lmask])
            qi, pi = tree.query_bbox(kernels.line_bounds(lg))
            if not len(qi):
                return empty
            keep = kernels.lines_in_polygon_pairs_predicate(
                lg, rg, qi, pi, predicate)
        matched = np.unique(
            g["gid"].to_numpy()[lmask].astype(np.int64)[qi[keep]])
        return pd.DataFrame({"gid": matched})

    matched = (lt.union(rt).groupby("cell")
               .map_groups(cell_kernel, batch_format="pandas"))

    def add_sg(flag: int):
        def fn(b: pa.Table) -> pa.Table:
            gid = b["gid" if flag else left_id].to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "gid": pa.array(gid, pa.int64()),
                "flag": pa.array(np.full(len(gid), flag, np.int8), pa.int8()),
                "sg": pa.array((gid % 512 + 512) % 512, pa.int64()),
            })
        return fn

    if mode == "semi":
        # distinct matched ids (multi-cell duplicates collapse here)
        def distinct_ids(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {left_id: np.unique(g["gid"].to_numpy().astype(np.int64))})

        return (matched.map_batches(add_sg(1), batch_format="pyarrow")
                .groupby("sg")
                .map_groups(distinct_ids, batch_format="pandas"))
    if mode != "anti":
        raise ValueError("sfilter_cell supports modes 'semi' and 'anti'")

    # anti: distinct left ids never matched — tag-union of the left id
    # universe (flag 0) with matched ids (flag 1), per-group max-flag test
    universe = left_ds.select_columns([left_id]).map_batches(
        add_sg(0), batch_format="pyarrow")
    tagged = matched.map_batches(add_sg(1), batch_format="pyarrow")

    def unmatched_ids(g: pd.DataFrame) -> pd.DataFrame:
        gid = g["gid"].to_numpy().astype(np.int64)
        flag = g["flag"].to_numpy().astype(np.int64)
        order = np.argsort(gid, kind="stable")
        gid, flag = gid[order], flag[order]
        starts = np.nonzero(np.concatenate([[True], gid[1:] != gid[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(gid)]])
        mx = np.maximum.reduceat(flag, starts)
        keep = mx == 0
        _ = ends
        return pd.DataFrame({left_id: gid[starts][keep]})

    return (universe.union(tagged).groupby("sg")
            .map_groups(unmatched_ids, batch_format="pandas"))
