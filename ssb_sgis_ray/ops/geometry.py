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

from ..pool import default_pool

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


def make_all_singlepart(batch: pa.Table, id_col: str,
                        wkb_col: str = "geometry_wkb") -> pa.Table:
    """General make_all_singlepart (geometry_types.py:10-22 / the
    reference's explode(ignore_index=True) semantics): every MULTI* row
    becomes one row per part with a ``part_no`` column; already-single
    rows pass their WKB bytes through unchanged (zero-copy take).

    All non-geometry columns are repeated onto the exploded rows via one
    take index, so attribute columns survive exactly as in geopandas'
    explode. Scale note: the fast path (single-part rows) is a mask +
    take with no decode; only MULTI* rows re-encode per part.
    """
    buf, offsets = wkb._as_bytes_and_offsets(batch[wkb_col])
    pos = offsets[:-1]
    types = wkb._read_u32(buf, pos + 1)
    is_multi = (
        (types == wkb.MULTIPOINT)
        | (types == wkb.MULTILINESTRING)
        | (types == wkb.MULTIPOLYGON)
    )
    if not is_multi.any():
        return batch.append_column(
            "part_no", pa.array(np.zeros(len(batch), np.int64), pa.int64())
        )
    raw = bytes(buf)
    raw_np = np.frombuffer(raw, dtype=np.uint8)
    # single-part rows: (start, end) spans taken straight from the Arrow
    # offsets — no per-row Python slicing even in a mixed batch
    single_idx = np.nonzero(~is_multi)[0].astype(np.int64)
    s_start = offsets[single_idx].astype(np.int64)
    s_end = offsets[single_idx + 1].astype(np.int64)
    # multi rows: per-part spans need the nested length walk (python loop
    # over MULTI rows only — typically the small minority of a batch)
    u32 = lambda at: int.from_bytes(raw[at:at + 4], "little")
    m_take: list[int] = []
    m_part: list[int] = []
    m_start: list[int] = []
    m_end: list[int] = []
    for i in np.nonzero(is_multi)[0]:
        i = int(i)
        t = int(types[i])
        n_parts = u32(int(pos[i]) + 5)
        p = int(pos[i]) + 9
        for j in range(n_parts):
            if t == wkb.MULTIPOINT:
                end = p + 21
            elif t == wkb.MULTILINESTRING:
                end = p + 9 + u32(p + 5) * 16
            else:  # MULTIPOLYGON
                nrings = u32(p + 5)
                end = p + 9
                for _ in range(nrings):
                    end += 4 + u32(end) * 16
            m_take.append(i)
            m_part.append(j)
            m_start.append(p)
            m_end.append(end)
            p = end
    take_np = np.concatenate([single_idx, np.asarray(m_take, dtype=np.int64)])
    part_np = np.concatenate(
        [np.zeros(len(single_idx), np.int64), np.asarray(m_part, dtype=np.int64)]
    )
    start = np.concatenate([s_start, np.asarray(m_start, dtype=np.int64)])
    end = np.concatenate([s_end, np.asarray(m_end, dtype=np.int64)])
    # one fused gather builds the whole output binary column: multi-range
    # byte copy via repeat/cumsum indexing, then a zero-copy Arrow wrap
    lens = end - start
    tot = int(lens.sum())
    if tot >= 1 << 31:  # Arrow binary offsets are int32; bound per batch
        raise ValueError("batch WKB exceeds 2 GB — lower batch_size")
    base = np.repeat(start, lens)
    within = np.arange(tot, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    values = raw_np[base + within]
    out_off = np.zeros(len(lens) + 1, dtype=np.int32)
    out_off[1:] = np.cumsum(lens)
    geom_arr = pa.BinaryArray.from_buffers(
        pa.binary(), len(lens),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(values.tobytes())],
    )
    idx = pa.array(take_np, pa.int64())
    cols = {
        name: (geom_arr if name == wkb_col else batch[name].take(idx))
        for name in batch.schema.names
    }
    part_no = part_np
    cols["part_no"] = pa.array(np.asarray(part_no, dtype=np.int64), pa.int64())
    return pa.table(cols)


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


def _disc_ring(cx: float, cy: float, d: float, resolution: int) -> np.ndarray:
    """Inscribed circle polygon, 4*resolution segments, world-frame angles
    starting at 0 (symmetric about both axes when resolution is even —
    needed by the closed-form oracles on axis-aligned fixtures)."""
    ang = np.linspace(0.0, 2 * np.pi, 4 * resolution + 1)
    ring = np.stack([cx + d * np.cos(ang), cy + d * np.sin(ang)], axis=1)
    ring[-1] = ring[0]
    return ring


def _buffer_components(rings: list[np.ndarray], d: float, resolution: int,
                       include_interior: bool, closed: bool = True):
    """Minkowski-dilation component ringsets: the original region (for
    polygons), one oriented rectangle per edge, one disc per vertex.
    Union of all components == region ⊕ disc (exactly, for the polygonal
    disc approximation). ``closed=False`` (open polylines) also caps the
    final vertex with a disc."""
    comps: list[tuple[list[np.ndarray], None]] = []
    if include_interior:
        comps.append((rings, None))
    for ring in rings:
        if not closed and len(ring) >= 2:
            comps.append(
                ([_disc_ring(ring[-1, 0], ring[-1, 1], d, resolution)], None)
            )
        p = ring[:-1]
        q = ring[1:]
        dx = q[:, 0] - p[:, 0]
        dy = q[:, 1] - p[:, 1]
        ln = np.hypot(dx, dy)
        ok = ln > 0
        nx = np.where(ok, -dy / np.where(ok, ln, 1), 0.0) * d
        ny = np.where(ok, dx / np.where(ok, ln, 1), 0.0) * d
        for i in np.nonzero(ok)[0]:
            rect = np.array(
                [
                    [p[i, 0] + nx[i], p[i, 1] + ny[i]],
                    [q[i, 0] + nx[i], q[i, 1] + ny[i]],
                    [q[i, 0] - nx[i], q[i, 1] - ny[i]],
                    [p[i, 0] - nx[i], p[i, 1] - ny[i]],
                    [p[i, 0] + nx[i], p[i, 1] + ny[i]],
                ]
            )
            comps.append(([rect], None))
        for i in range(len(p)):
            comps.append(([_disc_ring(p[i, 0], p[i, 1], d, resolution)], None))
    return comps


def buff_polygon_rings(rings: list[np.ndarray], distance: float,
                       resolution: int = 50):
    """Reference ``buff`` for a polygon ringset (any shape, holes shrink
    toward dilation): region ∪ edge-tubes ∪ vertex-discs, unioned by the
    boolean engine. Returns [ [shell, holes...], ... ]
    (buffer_dissolve_explode.py:303-335; resolution = segments per
    quarter circle, gpd default 50 in buff)."""
    from ..geo import booleans

    return booleans.union_all(
        _buffer_components(rings, distance, resolution, include_interior=True)
    )


def buff_line_coords(coords: np.ndarray, distance: float,
                     resolution: int = 50):
    """Reference ``buff`` for one (poly)line: edge-tubes ∪ vertex-discs."""
    from ..geo import booleans

    ring = coords if len(coords) >= 2 else np.repeat(coords, 2, axis=0)
    return booleans.union_all(
        _buffer_components([ring], distance, resolution, include_interior=False,
                           closed=False)
    )


def buff_lines_batch(batch: pa.Table, distance, resolution: int = 50,
                     wkb_col: str = "geometry_wkb", emit: str = "geometry") -> pa.Table:
    """map_batches stage: buffer every (multi)line row.

    ``distance`` is a float or the name of an int column (per-row radius).
    emit='area' skips WKB encode and emits buf_area instead."""
    from ..geo import booleans
    from ..ops.overlay import _polys_to_wkb

    la = wkb.decode_lines(batch[wkb_col])
    dists = (
        batch[distance].to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(distance, str)
        else np.full(len(la), float(distance))
    )
    out_geom, out_area = [], np.zeros(len(la))
    for i in range(len(la)):
        comps = []
        for l in range(la.geom_offsets[i], la.geom_offsets[i + 1]):
            coords = la.coords[la.line_offsets[l] : la.line_offsets[l + 1]]
            comps.extend(
                _buffer_components([coords], dists[i], resolution, False,
                                   closed=False)
            )
        if emit == "area":
            out_area[i] = booleans.union_all_area(comps)
        else:
            out_geom.append(_polys_to_wkb(booleans.union_all(comps)))
    cols = {c: batch[c] for c in batch.column_names if c != wkb_col}
    if emit == "area":
        cols["buf_area"] = pa.array(out_area, pa.float64())
    else:
        cols["geometry_wkb"] = pa.array(out_geom, pa.binary())
    return pa.table(cols)


def _ring_is_convex(ring: np.ndarray) -> bool:
    """True if the (closed or open) ring is convex (collinear runs allowed)."""
    r = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    if len(r) < 3:
        return False
    e = np.roll(r, -1, axis=0) - r
    cross = e[:, 0] * np.roll(e[:, 1], -1) - e[:, 1] * np.roll(e[:, 0], -1)
    return bool(np.all(cross >= 0) or np.all(cross <= 0))


def erode_polygon_rings_area(rings, holes, r: float, resolution: int) -> float:
    """AREA of the negative buffer (erosion) of one polygon ringset.

    Reference ``buff`` accepts negative distances (GEOS buffer semantics,
    buffer_dissolve_explode.py:303-335).

    For a SINGLE CONVEX shell the erosion is the intersection of the
    inward-offset half-planes of its edges (the inner parallel body) —
    computed exactly by successive half-plane clipping, so axis rects
    erode to the closed form max(0, w−2r)·max(0, h−2r) with no float
    residue even when one dimension degenerates to a sliver (w−2r = 1).

    The general (concave / holed) path uses

        P ⊖ disc(r) = P − (∂P ⊕ disc(r))

    where the boundary neighbourhood is exactly the union of the per-edge
    tubes and per-vertex discs that ``_buffer_components`` already builds
    for dilation (without the interior component). Hole rings expand
    (their tubes eat into the surrounding region), matching GEOS."""
    from ..geo import booleans

    if len(rings) == 1 and not holes[0] and _ring_is_convex(rings[0]):
        poly = _convex_inward_offset(rings[0], r)
        if poly is None:
            return 0.0
        return abs(0.5 * float(np.sum(poly[:-1, 0] * poly[1:, 1]
                                      - poly[1:, 0] * poly[:-1, 1])))

    comps = _buffer_components(rings, r, resolution, include_interior=False)
    b_rings = [ring for comp in comps for ring in comp[0]]
    return booleans.boolean_area(
        rings, b_rings, "difference", holes, [False] * len(b_rings)
    )


def erode_polygon_rings(rings, holes, r: float, resolution: int):
    """Negative buffer (erosion) geometry: [[shell, holes...], ...]."""
    from ..geo import booleans

    comps = _buffer_components(rings, r, resolution, include_interior=False)
    b_rings = [ring for comp in comps for ring in comp[0]]
    return booleans.boolean_polygons(
        rings, b_rings, "difference", holes, [False] * len(b_rings)
    )


def buff_polygons_batch(batch: pa.Table, distance, resolution: int = 50,
                        wkb_col: str = "geometry_wkb", emit: str = "geometry") -> pa.Table:
    """map_batches stage: buffer every polygon row (holes included).

    Negative per-row distances run the erosion path (reference buff with
    d<0); fully-eroded rows stay in the output with buf_area 0 / empty
    WKB geometry, so the stage is schema-stable and row-count preserving.
    """
    from ..geo import booleans
    from ..ops.overlay import _polys_to_wkb

    pg = wkb.decode_polygons(batch[wkb_col])
    dists = (
        batch[distance].to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(distance, str)
        else np.full(len(pg), float(distance))
    )
    out_geom, out_area = [], np.zeros(len(pg))
    for i in range(len(pg)):
        rings, holes = booleans.ringset_of_row(pg, i)
        if dists[i] < 0:
            if emit == "area":
                out_area[i] = erode_polygon_rings_area(
                    rings, holes, -dists[i], resolution
                )
            else:
                out_geom.append(_polys_to_wkb(
                    erode_polygon_rings(rings, holes, -dists[i], resolution)
                ))
            continue
        comps = _buffer_components(rings, dists[i], resolution, True)
        # hole rings contribute their tubes/discs (inward dilation) but
        # the interior component must exclude them
        comps[0] = (rings, holes)
        if emit == "area":
            out_area[i] = booleans.union_all_area(comps)
        else:
            out_geom.append(_polys_to_wkb(booleans.union_all(comps)))
    cols = {c: batch[c] for c in batch.column_names if c != wkb_col}
    if emit == "area":
        cols["buf_area"] = pa.array(out_area, pa.float64())
    else:
        cols["geometry_wkb"] = pa.array(out_geom, pa.binary())
    return pa.table(cols)


class WithinDistanceJoin:
    """Actor stage: pairs (left point, right point) with L2 distance <= d.

    The engine form of buffer(max_distance)+sjoin (neighbors.py:100-104):
    evaluated as an exact integer distance predicate, no circle polygon
    approximation. Broadcast right side; per-batch vectorized.
    """

    def __init__(self, right_ref, distance: float, id_col: str,
                 x_col="px", y_col="py"):
        from ..geo.strtree import STRtree

        r = ray.get(right_ref)
        self.rx = r["x"].astype(np.float64)
        self.ry = r["y"].astype(np.float64)
        self.rid = r["id"].astype(np.int64)
        self.d = float(distance)
        self.d2 = self.d * self.d
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col
        # index once per actor: a dense n_left x n_right distance matrix is
        # O(n^2) memory traffic (and quadratic at scale); candidate pairs
        # from an R-tree over the broadcast points are ~output-sized
        self.tree = STRtree(
            np.column_stack([self.rx, self.ry, self.rx, self.ry])
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not np.isfinite(self.d):
            # d=inf (get_all_distances): the output IS the cross product —
            # emit it flat; a tree descent with infinite query boxes only
            # burns frontier memory to return every pair anyway
            n = len(self.rx)
            li = np.repeat(np.arange(len(px), dtype=np.int64), n)
            ri = np.tile(np.arange(n, dtype=np.int64), len(px))
            d2 = (px[li] - self.rx[ri]) ** 2 + (py[li] - self.ry[ri]) ** 2
            return pa.table(
                {
                    self.id_col: pa.array(ids[li], pa.int64()),
                    "neighbor_id": pa.array(self.rid[ri], pa.int64()),
                    "dist2": pa.array(d2.astype(np.int64), pa.int64()),
                }
            )
        qboxes = np.column_stack(
            [px - self.d, py - self.d, px + self.d, py + self.d]
        )
        li, ri = self.tree.query_bbox(qboxes)
        d2 = (px[li] - self.rx[ri]) ** 2 + (py[li] - self.ry[ri]) ** 2
        m = d2 <= self.d2
        return pa.table(
            {
                self.id_col: pa.array(ids[li[m]], pa.int64()),
                "neighbor_id": pa.array(self.rid[ri[m]], pa.int64()),
                "dist2": pa.array(d2[m].astype(np.int64), pa.int64()),
            }
        )


def within_distance_pairs(left, right: dict, distance: float, id_col: str,
                          concurrency=None, batch_size: int = 16384):
    ref = ray.put(right)
    return left.map_batches(
        WithinDistanceJoin,
        fn_constructor_kwargs={"right_ref": ref, "distance": distance, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
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


def extract_holes(batch: pa.Table, id_col: str,
                  wkb_col: str = "geometry_wkb") -> pa.Table:
    """get_holes (polygon_operations.py:828-862): one output row per
    interior ring with its area."""
    pg = wkb.decode_polygons(batch[wkb_col])
    from ..geo import kernels

    ring_a = np.abs(kernels.ring_signed_areas(pg))
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_id, out_no, out_area = [], [], []
    n_rings_per_poly = np.diff(pg.poly_offsets)
    poly_of_row = pg.geom_offsets
    for row in range(len(pg)):
        for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
            r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
            for hole_no, r in enumerate(range(r0 + 1, r1)):
                out_id.append(ids[row])
                out_no.append(hole_no)
                out_area.append(ring_a[r])
    return pa.table(
        {
            id_col: pa.array(np.asarray(out_id, np.int64), pa.int64()),
            "hole_no": pa.array(np.asarray(out_no, np.int64), pa.int64()),
            "hole_area": pa.array(
                np.round(np.asarray(out_area)).astype(np.int64), pa.int64()
            ),
        }
    )


def close_all_holes(batch: pa.Table, id_col: str,
                    wkb_col: str = "geometry_wkb") -> pa.Table:
    """close_all_holes (polygon_operations.py:523-601): drop every interior
    ring; emit the exterior-only polygon + its (closed) area."""
    pg = wkb.decode_polygons(batch[wkb_col])
    from ..geo import kernels

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_geom = np.empty(len(pg), dtype=object)
    out_area = np.zeros(len(pg))
    for row in range(len(pg)):
        rings = []
        for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
            r0 = pg.poly_offsets[q]
            ring = pg.coords[pg.ring_offsets[r0] : pg.ring_offsets[r0 + 1]]
            rings.append([ring])
            out_area[row] += kernels.ring_area(ring)
        out_geom[row] = (
            wkb.encode_polygon(rings[0]) if len(rings) == 1
            else wkb.encode_multipolygon(rings)
        )
    return pa.table(
        {
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "closed_area": pa.array(np.round(out_area).astype(np.int64), pa.int64()),
            "geometry_wkb": pa.array(list(out_geom), pa.binary()),
        }
    )


def cut_line_parts(batch: pa.Table, id_col: str, max_length: float,
                   wkb_col: str = "geometry_wkb") -> pa.Table:
    """cut_lines (cutting_lines.py:230-297): split each 2-point line into
    the minimum number of equal parts with part length <= max_length.
    Emits one row per part with its sub-line geometry.

    The part count uses an integer-exact correction after the float sqrt so
    an oracle computing the same correction can never disagree:
        k0 = ceil(sqrt(len2)/max);  k = k0-1 if (k0-1)^2*max^2 >= len2
    """
    la = wkb.decode_lines(batch[wkb_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    max2 = max_length * max_length
    out_id, out_part, out_geom = [], [], []
    for i in range(len(la)):
        l0 = la.geom_offsets[i]
        a = la.coords[la.line_offsets[l0]]
        b = la.coords[la.line_offsets[l0 + 1] - 1]
        len2 = float((b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2)
        k = int(np.ceil(np.sqrt(len2) / max_length))
        if k > 1 and (k - 1) * (k - 1) * max2 >= len2:
            k -= 1
        k = max(k, 1)
        for j in range(k):
            p = a + (b - a) * (j / k)
            q = a + (b - a) * ((j + 1) / k)
            out_id.append(ids[i])
            out_part.append(j)
            out_geom.append(wkb.encode_linestring(np.stack([p, q])))
    return pa.table(
        {
            id_col: pa.array(np.asarray(out_id, np.int64), pa.int64()),
            "part_no": pa.array(np.asarray(out_part, np.int64), pa.int64()),
            "geometry_wkb": pa.array(out_geom, pa.binary()),
        }
    )


class SnapToDiamonds:
    """snap_all (point_operations.py:14-183): snap each point to the
    nearest point on the nearest diamond's boundary.

    Exact closed form in the 45°-rotated frame (u=x+y, v=x−y), where L1
    diamonds are axis rects and the rotation scales all L2 distances
    uniformly by √2: for points OUTSIDE the rect, the nearest boundary
    point is the per-axis clamp. Callers feed only points outside every
    diamond (the sfilter-anti side); interior points would need the
    nearest-edge case. Outputs stay integer: snapped coords ×2 and the
    uv-frame squared distance (= 2× the xy squared distance).
    """

    def __init__(self, right_ref, id_col: str, x_col="px", y_col="py"):
        r = ray.get(right_ref)
        sx = r["sx"].astype(np.int64)
        sy = r["sy"].astype(np.int64)
        rr = r["r"].astype(np.int64)
        self.u0 = sx + sy - rr
        self.u1 = sx + sy + rr
        self.v0 = sx - sy - rr
        self.v1 = sx - sy + rr
        self.rid = r["id"].astype(np.int64)
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pu = px + py
        pv = px - py
        uc = np.clip(pu[:, None], self.u0[None, :], self.u1[None, :])
        vc = np.clip(pv[:, None], self.v0[None, :], self.v1[None, :])
        d2 = (pu[:, None] - uc) ** 2 + (pv[:, None] - vc) ** 2
        # nearest diamond, ties by id (rid is pre-sorted ascending input? use lexsort)
        order = np.lexsort((np.broadcast_to(self.rid, d2.shape), d2), axis=1)
        best = order[:, 0]
        rows = np.arange(len(px))
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "snap_suppkey": pa.array(self.rid[best], pa.int64()),
                "snap_x2": pa.array(uc[rows, best] + vc[rows, best], pa.int64()),
                "snap_y2": pa.array(uc[rows, best] - vc[rows, best], pa.int64()),
                "snap_dist2_uv": pa.array(d2[rows, best], pa.int64()),
            }
        )


def snap_to_diamonds(left, diamonds: dict, id_col: str,
                     concurrency=None, batch_size: int = 16384):
    ref = ray.put(diamonds)
    return left.map_batches(
        SnapToDiamonds,
        fn_constructor_kwargs={"right_ref": ref, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


def boundary_lines(batch: pa.Table, id_col: str,
                   wkb_col: str = "geometry_wkb") -> pa.Table:
    """to_lines (general.py:402-510): polygon boundaries as LINESTRING rows
    (one per ring, exterior first), with exact ring length per row."""
    pg = wkb.decode_polygons(batch[wkb_col])
    from ..geo import kernels

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_id, out_no, out_len, out_geom = [], [], [], []
    for row in range(len(pg)):
        ring_no = 0
        for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
            for r in range(pg.poly_offsets[q], pg.poly_offsets[q + 1]):
                ring = pg.coords[pg.ring_offsets[r] : pg.ring_offsets[r + 1]]
                d = np.diff(ring, axis=0)
                out_id.append(ids[row])
                out_no.append(ring_no)
                out_len.append(float(np.hypot(d[:, 0], d[:, 1]).sum()))
                out_geom.append(wkb.encode_linestring(ring))
                ring_no += 1
    return pa.table(
        {
            id_col: pa.array(np.asarray(out_id, np.int64), pa.int64()),
            "ring_no": pa.array(np.asarray(out_no, np.int64), pa.int64()),
            "ring_len_i": pa.array(
                np.round(np.asarray(out_len)).astype(np.int64), pa.int64()
            ),
            "geometry_wkb": pa.array(out_geom, pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# PolygonsAsRings (polygons_as_rings.py:62-277): decompose -> UDF -> rebuild
# ---------------------------------------------------------------------------


def polygons_to_rings(batch: pa.Table, id_col: str,
                      wkb_col: str = "geometry_wkb") -> pa.Table:
    """Decompose polygons to ring rows keyed (row_id, poly_no, ring_kind,
    ring_no) — the engine's columnar replacement for the reference's
    MultiIndex layout. ring_kind: 0 = exterior, 1 = interior."""
    pg = wkb.decode_polygons(batch[wkb_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out = {"row_id": [], "poly_no": [], "ring_kind": [], "ring_no": [], "ring_wkb": []}
    for row in range(len(pg)):
        for pn, q in enumerate(range(pg.geom_offsets[row], pg.geom_offsets[row + 1])):
            r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
            for rn, r in enumerate(range(r0, r1)):
                ring = pg.coords[pg.ring_offsets[r] : pg.ring_offsets[r + 1]]
                out["row_id"].append(ids[row])
                out["poly_no"].append(pn)
                out["ring_kind"].append(0 if r == r0 else 1)
                out["ring_no"].append(rn)
                out["ring_wkb"].append(wkb.encode_linestring(ring))
    return pa.table(
        {
            "row_id": pa.array(np.asarray(out["row_id"], np.int64), pa.int64()),
            "poly_no": pa.array(np.asarray(out["poly_no"], np.int64), pa.int64()),
            "ring_kind": pa.array(np.asarray(out["ring_kind"], np.int64), pa.int64()),
            "ring_no": pa.array(np.asarray(out["ring_no"], np.int64), pa.int64()),
            "ring_wkb": pa.array(out["ring_wkb"], pa.binary()),
        }
    )


def apply_ring_func(rings: pa.Table, func, only_interiors: bool = False) -> pa.Table:
    """Ring-level UDF hook (apply_numpy_func(_to_interiors)): ``func`` maps
    an (n,2) coords array to an (m,2) coords array, applied per ring."""
    la = wkb.decode_lines(rings["ring_wkb"])
    kinds = rings["ring_kind"].to_numpy(zero_copy_only=False)
    out = []
    for i in range(len(la)):
        ring = la.coords[la.line_offsets[i] : la.line_offsets[i + 1]]
        if only_interiors and kinds[i] == 0:
            out.append(wkb.encode_linestring(ring))
        else:
            out.append(wkb.encode_linestring(np.asarray(func(ring), dtype=float)))
    return rings.set_column(
        rings.schema.get_field_index("ring_wkb"), "ring_wkb",
        pa.array(out, pa.binary()),
    )


def rings_to_polygons(rings: pd.DataFrame) -> pd.DataFrame:
    """Rebuild polygons from ring rows (group kernel for
    groupby(row_id).map_groups): exterior + interiors per poly_no,
    reassembled into POLYGON/MULTIPOLYGON WKB."""
    g = rings.sort_values(["poly_no", "ring_kind", "ring_no"], kind="stable")
    la = wkb.decode_lines(g["ring_wkb"].to_numpy())
    polys: dict[int, list[np.ndarray]] = {}
    for i, pn in enumerate(g["poly_no"]):
        ring = la.coords[la.line_offsets[i] : la.line_offsets[i + 1]]
        polys.setdefault(int(pn), []).append(ring)
    parts = [polys[k] for k in sorted(polys)]
    gwkb = (wkb.encode_polygon(parts[0]) if len(parts) == 1
            else wkb.encode_multipolygon(parts))
    return pd.DataFrame({"row_id": [g["row_id"].iloc[0]], "geometry_wkb": [gwkb]})


def segmentize_coords(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds ``max_len`` (shapely
    segmentize semantics, used by the reference's centerlines —
    centerlines.py:55). Split counts use the same integer-exact sqrt
    correction as cut_line_parts so oracles can reproduce them."""
    out = [coords[:1]]
    max2 = max_len * max_len
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        len2 = float((b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2)
        k = int(np.ceil(np.sqrt(len2) / max_len)) if len2 > 0 else 1
        if k > 1 and (k - 1) * (k - 1) * max2 >= len2:
            k -= 1
        k = max(k, 1)
        ts = np.arange(1, k + 1) / k
        out.append(a[None, :] + ts[:, None] * (b - a)[None, :])
    return np.concatenate(out)


def simplify_coords(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker simplification (shapely simplify semantics, used in
    polygons_as_rings.py:45). Keeps endpoints; iterative stack, exact
    perpendicular-distance test."""
    n = len(coords)
    if n < 3:
        return coords.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    tol2 = tolerance * tolerance
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        a, b = coords[s], coords[e]
        d = b - a
        seg2 = float(d[0] * d[0] + d[1] * d[1])
        pts = coords[s + 1 : e]
        if seg2 == 0:
            d2 = ((pts - a) ** 2).sum(axis=1)
        else:
            t = np.clip(((pts - a) @ d) / seg2, 0.0, 1.0)
            proj = a[None, :] + t[:, None] * d[None, :]
            d2 = ((pts - proj) ** 2).sum(axis=1)
        j = int(np.argmax(d2))
        if d2[j] > tol2:
            idx = s + 1 + j
            keep[idx] = True
            stack.append((s, idx))
            stack.append((idx, e))
    return coords[keep]


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """DP on a closed ring (first==last kept as the anchor pair)."""
    out = simplify_coords(ring, tolerance)
    if len(out) < 4:  # degenerate: keep the ring's bbox triangle at least
        return ring.copy()
    return out


def rough_centerline(rings: list[np.ndarray], holes=None) -> np.ndarray:
    """Cheap sliver centerline (the role of get_rough_centerlines,
    reference centerlines.py:30-195, which segmentizes and midpoints
    sliver polygons): slab-decompose the polygon along its SHORTER bbox
    axis and connect the midline midpoints in sweep order. Exact for
    rectangles (the segment joining the short ends); reasonable for
    sliver-ish shapes; not meant for complex networks (the reference
    says the same of its own).
    Returns (n,2) line coords (n >= 2).
    """
    from ..geo import booleans

    allc = np.concatenate([np.asarray(r, float) for r in rings])
    w = allc[:, 0].max() - allc[:, 0].min()
    h = allc[:, 1].max() - allc[:, 1].min()
    swap = w > h  # sweep along the longer axis
    use = [np.asarray(r, float)[:, ::-1] if swap else np.asarray(r, float)
           for r in rings]
    e = booleans._edges_of_ringset(use, holes)
    e["src"] = np.zeros(len(e["ylo"]), np.int8)
    y0, y1, xl0, xr0, xl1, xr1 = booleans.boolean_traps(e, "a")
    if len(y0) == 0:
        c = allc.mean(axis=0)
        return np.stack([c, c])
    order = np.argsort(0.5 * (y0 + y1), kind="stable")
    y0, y1 = y0[order], y1[order]
    xm = 0.25 * (xl0 + xr0 + xl1 + xr1)[order]
    if len(y0) == 1:
        pts = np.array([[0.5 * (xl0[0] + xr0[0]), y0[0]],
                        [0.5 * (xl1[0] + xr1[0]), y1[0]]])
    else:
        pts = np.stack([xm, 0.5 * (y0 + y1)], axis=1)
        # extend to the sweep extremes so endpoints sit at the "ends"
        pts = np.vstack([[pts[0, 0], y0[0]], pts, [pts[-1, 0], y1[-1]]])
    if swap:
        pts = pts[:, ::-1]
    return pts


def rough_centerlines_batch(batch: pa.Table, wkb_col: str = "geometry_wkb") -> pa.Table:
    """map_batches stage: polygon rows -> centerline rows (+ length)."""
    from ..geo import booleans

    pg = wkb.decode_polygons(batch[wkb_col])
    out = np.empty(len(pg), dtype=object)
    length = np.zeros(len(pg))
    for i in range(len(pg)):
        rings, holes = booleans.ringset_of_row(pg, i)
        line = rough_centerline(rings, holes)
        out[i] = wkb.encode_linestring(line)
        d = np.diff(line, axis=0)
        length[i] = float(np.hypot(d[:, 0], d[:, 1]).sum())
    cols = {c: batch[c] for c in batch.column_names if c != wkb_col}
    cols["geometry_wkb"] = pa.array(list(out), pa.binary())
    cols["centerline_len"] = pa.array(length, pa.float64())
    return pa.table(cols)


def _convex_hull_pts(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull vertices (no repeat)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    idx = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[idx]

    def half(seq):
        out: list[np.ndarray] = []
        for q in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_rotated_rect(pts: np.ndarray) -> np.ndarray:
    """Minimum-area rotated rectangle via rotating calipers over the
    convex hull (shapely minimum_rotated_rectangle semantics, used by the
    reference's endpoint pick, centerlines.py:142-148). Returns 4 corners
    in order (not closed)."""
    hull = _convex_hull_pts(pts)
    if len(hull) <= 2:
        lo, hi = hull[0], hull[-1]
        return np.array([lo, hi, hi, lo])
    best = None
    n = len(hull)
    for i in range(n):
        d = hull[(i + 1) % n] - hull[i]
        L = np.hypot(d[0], d[1])
        if L == 0:
            continue
        ux, uy = d / L
        t = hull @ np.array([ux, uy])
        s = hull @ np.array([-uy, ux])
        area = (t.max() - t.min()) * (s.max() - s.min())
        if best is None or area < best[0]:
            best = (area, ux, uy, t.min(), t.max(), s.min(), s.max())
    _, ux, uy, t0, t1, s0, s1 = best
    u = np.array([ux, uy])
    v = np.array([-uy, ux])
    return np.array([t0 * u + s0 * v, t1 * u + s0 * v,
                     t1 * u + s1 * v, t0 * u + s1 * v])


def voronoi_centerline(rings: list[np.ndarray], holes=None,
                       max_segment_length: float = 8.0) -> np.ndarray:
    """Voronoi-edge rough centerline (get_rough_centerlines,
    centerlines.py:30-195): segmentize the boundary, take the Voronoi
    vertices of the boundary points that fall strictly inside the
    polygon (the skeleton approximation the reference extracts from
    voronoi_polygons(only_edges=True)), add the midpoints of the short
    edges of the minimum rotated rectangle as endpoints, and connect the
    points in order of their projection along the endpoint axis.

    The reference orders with a traveling-salesman pass + two centroid
    smoothing rounds; for the sliver shapes this operator is meant for
    (the reference says the same of its own) the projection order is the
    TSP order, and it stays vectorized at any point count.
    Returns (n, 2) line coords.
    """
    from ..geo import voronoi as vor
    from ..geo import kernels as K

    segs = [segmentize_coords(np.asarray(r, float), max_segment_length)[:-1]
            for r in rings]
    pts = np.unique(np.concatenate(segs), axis=0)
    allc = np.concatenate([np.asarray(r, float) for r in rings])
    minx, miny = allc[:, 0].min(), allc[:, 1].min()
    maxx, maxy = allc[:, 0].max(), allc[:, 1].max()

    # endpoints: short-edge midpoints of the minimum rotated rectangle
    rect = min_rotated_rect(pts)
    e01 = np.hypot(*(rect[1] - rect[0]))
    e12 = np.hypot(*(rect[2] - rect[1]))
    if e01 <= e12:  # edges 0-1 and 2-3 are the short ends
        end1, end2 = 0.5 * (rect[0] + rect[1]), 0.5 * (rect[2] + rect[3])
    else:
        end1, end2 = 0.5 * (rect[1] + rect[2]), 0.5 * (rect[3] + rect[0])

    tol = 1e-7 * max(maxx - minx, maxy - miny, 1.0)
    cells = vor.voronoi_cells(pts[:, 0], pts[:, 1], (minx, miny, maxx, maxy))
    nonempty = [c[:-1] if len(c) and (c[0] == c[-1]).all() else c
                for c in cells if len(c)]
    if nonempty:
        V = np.concatenate(nonempty)
        inner = (
            (V[:, 0] > minx + tol) & (V[:, 0] < maxx - tol)
            & (V[:, 1] > miny + tol) & (V[:, 1] < maxy - tol)
        )
        V = np.unique(np.round(V[inner], 6), axis=0)
        if len(V):
            V = V[K.points_in_one_polygon(V[:, 0], V[:, 1], rings)]
    else:
        V = np.empty((0, 2))

    axis = end2 - end1
    L = np.hypot(axis[0], axis[1])
    if L == 0 or len(V) == 0:
        return np.stack([end1, end2])
    t = (V - end1) @ (axis / L)
    keep = (t > tol) & (t < L - tol)
    order = np.argsort(t[keep], kind="stable")
    return np.vstack([end1[None, :], V[keep][order], end2[None, :]])


def voronoi_centerlines_batch(batch: pa.Table, wkb_col: str = "geometry_wkb",
                              max_segment_length: float = 8.0) -> pa.Table:
    """map_batches stage: polygon rows -> voronoi centerline rows
    (+ length). Per-row kernel; rows are independent, so the stage
    parallelizes as an ordinary batch transform."""
    from ..geo import booleans

    pg = wkb.decode_polygons(batch[wkb_col])
    out = np.empty(len(pg), dtype=object)
    length = np.zeros(len(pg))
    for i in range(len(pg)):
        rings, holes = booleans.ringset_of_row(pg, i)
        line = voronoi_centerline(rings, holes, max_segment_length)
        out[i] = wkb.encode_linestring(line)
        d = np.diff(line, axis=0)
        length[i] = float(np.hypot(d[:, 0], d[:, 1]).sum())
    cols = {c: batch[c] for c in batch.column_names if c != wkb_col}
    cols["geometry_wkb"] = pa.array(list(out), pa.binary())
    cols["centerline_len"] = pa.array(length, pa.float64())
    return pa.table(cols)


def reproject_points_batch(batch: pa.Table, direction: str = "to_utm33",
                           x_col: str = "lon", y_col: str = "lat") -> pa.Table:
    """get_utm33 / get_lonlat (reference conversion.py:59-72, via pyproj):
    vectorized transverse-Mercator reprojection (geo/proj.py, Karney
    series — pyproj absent in this environment)."""
    from ..geo import proj

    x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
    y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
    if direction == "to_utm33":
        e, n = proj.lonlat_to_utm33(x, y)
        out = {"easting": e, "northing": n}
    elif direction == "to_lonlat":
        lon, lat = proj.utm33_to_lonlat(x, y)
        out = {"lon": lon, "lat": lat}
    else:
        raise ValueError(direction)
    t = batch
    for k, v in out.items():
        t = t.append_column(k, pa.array(v, pa.float64()))
    return t


# ---------------------------------------------------------------------------
# Thresholded hole / gap operators (reference polygon_operations.py:491-825)
# ---------------------------------------------------------------------------


def _row_polys(pg: wkb.PolygonArray, row: int) -> list[list[np.ndarray]]:
    """Row -> [[shell, holes...], ...] (all parts, all rings)."""
    polys = []
    for q in range(pg.geom_offsets[row], pg.geom_offsets[row + 1]):
        r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
        polys.append(
            [pg.coords[pg.ring_offsets[r] : pg.ring_offsets[r + 1]]
             for r in range(r0, r1)]
        )
    return polys


def _encode_polys(polys: list[list[np.ndarray]]) -> bytes:
    if len(polys) == 1:
        return wkb.encode_polygon(polys[0])
    return wkb.encode_multipolygon(polys)


class CloseSmallHoles:
    """close_small_holes (polygon_operations.py:631-744): fill interior
    rings whose area is below ``max_area``.

    ``ignore_islands=True`` thresholds the raw ring area (the reference's
    fast path). With ``ignore_islands=False`` the layer itself is
    broadcast (``layer_ref``) and each hole's area is reduced by the area
    of layer polygons nested inside it (the reference computes the same
    via ``hole.difference(unary_union(layer))``) — an island-filled hole
    can stay open even when its gross ring area is under the threshold.
    """

    def __init__(self, max_area: float, id_col: str = "id",
                 ignore_islands: bool = True, layer_ref=None):
        from ..geo import booleans, kernels
        from ..geo.strtree import STRtree

        self.max_area = max_area
        self.id_col = id_col
        self.ignore_islands = ignore_islands
        self._kernels = kernels
        self._booleans = booleans
        self.layer = None
        if not ignore_islands:
            if layer_ref is None:
                raise ValueError("ignore_islands=False needs layer_ref")
            layer_tbl = ray.get(layer_ref)
            lpg = wkb.decode_polygons(layer_tbl["geometry_wkb"])
            self.layer = (lpg, STRtree(kernels.polygon_bounds(lpg)))

    def _net_hole_area(self, hole_ring: np.ndarray) -> float:
        k = self._kernels
        gross = k.ring_area(hole_ring)
        if self.ignore_islands or self.layer is None:
            return gross
        lpg, tree = self.layer
        hb = np.array([[hole_ring[:, 0].min(), hole_ring[:, 1].min(),
                        hole_ring[:, 0].max(), hole_ring[:, 1].max()]])
        qi, pi = tree.query_bbox(hb)
        if len(pi) == 0:
            return gross
        c_r, c_h = [], []
        for r in pi:
            rr, hh = self._booleans.ringset_of_row(lpg, int(r))
            c_r.extend(rr)
            c_h.extend(hh)
        covered = self._booleans.boolean_area(
            [hole_ring], c_r, "intersection", [False], c_h
        )
        return gross - covered

    def __call__(self, batch: pa.Table) -> pa.Table:
        pg = wkb.decode_polygons(batch["geometry_wkb"])
        from ..geo import kernels

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_geom = np.empty(len(pg), dtype=object)
        out_area = np.zeros(len(pg))
        for row in range(len(pg)):
            polys = _row_polys(pg, row)
            kept = []
            for rings in polys:
                shell, holes = rings[0], rings[1:]
                keep = [shell]
                for h in holes:
                    if self._net_hole_area(h) >= self.max_area:
                        keep.append(h)
                kept.append(keep)
            out_geom[row] = _encode_polys(kept)
            out_area[row] = sum(
                kernels.ring_area(p[0]) - sum(kernels.ring_area(h) for h in p[1:])
                for p in kept
            )
        return pa.table(
            {
                self.id_col: pa.array(ids.astype(np.int64), pa.int64()),
                "closed_area": pa.array(np.round(out_area).astype(np.int64), pa.int64()),
                "geometry_wkb": pa.array(list(out_geom), pa.binary()),
            }
        )


def _convex_erosion_empty(ring: np.ndarray, d: float) -> bool:
    """True if a CONVEX ring's inward offset by ``d`` is empty."""
    return _convex_inward_offset(ring, d) is None


def _convex_inward_offset(ring: np.ndarray, d: float):
    """Inner parallel body of a CONVEX ring: the intersection of each
    edge's inward-offset half-plane, via successive half-plane clipping
    (exact for convex rings). Returns the closed offset polygon as an
    (n+1, 2) array, or None if the erosion is empty."""
    r = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    # ensure CCW
    sa = 0.5 * float(np.sum(r[:, 0] * np.roll(r[:, 1], -1)
                            - np.roll(r[:, 0], -1) * r[:, 1]))
    if sa < 0:
        r = r[::-1]
    pts = np.concatenate([r, r[:1]])
    poly = pts.copy()
    for i in range(len(r)):
        a, b = pts[i], pts[i + 1]
        e = b - a
        ln = float(np.hypot(e[0], e[1]))
        if ln == 0:
            continue
        # inward (left) normal for CCW ring
        nx, ny = -e[1] / ln, e[0] / ln
        ao = a + d * np.array([nx, ny])
        # clip poly to the inward half-plane of the offset edge:
        # f(p) = (p - ao) . n_hat >= 0
        out = []
        P = poly[:-1] if len(poly) > 1 and np.array_equal(poly[0], poly[-1]) else poly
        n_p = len(P)
        if n_p == 0:
            return None

        def fval(p):
            return (p[0] - ao[0]) * nx + (p[1] - ao[1]) * ny

        for j in range(n_p):
            cur, nxt = P[j], P[(j + 1) % n_p]
            fc, fn = fval(cur), fval(nxt)
            cin, nin = fc >= -1e-12, fn >= -1e-12
            if cin:
                out.append(cur)
            if cin != nin:
                dd = fc / (fc - fn)
                q = cur + dd * (nxt - cur)
                # project exactly onto the clip line: the interpolation
                # leaves a ~1-ulp normal residue ((73/304)*304 != 73) that
                # breaks the integer-world exactness contract; f(q) is a
                # Sterbenz-exact subtraction near the line, so q - f(q)·n̂
                # lands on it exactly for axis-aligned edges
                fq = fval(q)
                out.append(np.array([q[0] - fq * nx, q[1] - fq * ny]))
        if len(out) < 3:
            return None
        poly = np.array(out + [out[0]])
    area = abs(0.5 * float(np.sum(poly[:-1, 0] * poly[1:, 1]
                                  - poly[1:, 0] * poly[:-1, 1])))
    return None if area <= 1e-9 else poly


def _erosion_empty_general(ring: np.ndarray, d: float,
                           resolution: int = 16) -> bool:
    """Thinness test for ANY (concave) ring: the inward offset by ``d``
    is empty iff every interior point lies within ``d`` of the boundary,
    i.e. area(hole − buffer(∂hole, d)) ≈ 0. Buffer is the edge-tube ∪
    vertex-disc dilation fed to the scanline boolean engine — exact on
    straight edges; the inscribed-polygon disc error is bounded by
    perimeter · d · (π/(2·resolution))² and folded into the threshold."""
    from ..geo import booleans

    comps = _buffer_components([ring], d, resolution, include_interior=False)
    b_rings, b_holes = [], []
    for r, h in comps:
        b_rings.extend(r)
        b_holes.extend(h if h is not None else [False] * len(r))
    rem = booleans.boolean_area([ring], b_rings, "difference", [False], b_holes)
    per = float(np.sum(np.hypot(np.diff(ring[:, 0]), np.diff(ring[:, 1]))))
    eps = per * d * (np.pi / (2 * resolution)) ** 2 + 1e-9
    return rem <= eps


def close_thin_holes(batch: pa.Table, tolerance: float, id_col: str = "id") -> pa.Table:
    """close_thin_holes (polygon_operations.py:491-511): fill interior
    rings whose inward offset by tolerance/2 is empty (no inscribed disc
    of diameter >= tolerance fits). Convex holes use exact half-plane
    erosion; concave holes use the boundary-buffer difference test
    (_erosion_empty_general)."""
    from ..geo import kernels

    pg = wkb.decode_polygons(batch["geometry_wkb"])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_geom = np.empty(len(pg), dtype=object)
    out_area = np.zeros(len(pg))
    half = tolerance / 2.0
    for row in range(len(pg)):
        polys = _row_polys(pg, row)
        kept = []
        for rings in polys:
            shell, holes = rings[0], rings[1:]
            keep = [shell]
            for h in holes:
                if kernels.is_convex_ring(h):
                    thin = _convex_erosion_empty(h, half)
                else:
                    thin = _erosion_empty_general(h, half)
                if not thin:
                    keep.append(h)
            kept.append(keep)
        out_geom[row] = _encode_polys(kept)
        out_area[row] = sum(
            kernels.ring_area(p[0]) - sum(kernels.ring_area(h) for h in p[1:])
            for p in kept
        )
    return pa.table(
        {
            id_col: pa.array(ids.astype(np.int64), pa.int64()),
            "closed_area": pa.array(np.round(out_area).astype(np.int64), pa.int64()),
            "geometry_wkb": pa.array(list(out_geom), pa.binary()),
        }
    )


def get_gaps(table: pa.Table, wkb_col: str = "geometry_wkb") -> list[dict]:
    """get_gaps (polygon_operations.py:797-825): enclosed empty pockets
    between the layer's polygons.

    Engine plan mirrors the reference's: (total-bounds box buffered by 1)
    − union(layer) via the scanline boolean engine, then the piece
    touching the outer boundary (the surrounding area) is dropped. The
    layer is one broadcast table — the reference materializes the same
    unary_union; a cell-partitioned variant would split gap pieces at
    cell borders and re-merge with connected components.
    Returns [{gap_no, gap_area, geometry_wkb}] rows.
    """
    from ..geo import booleans, kernels

    pg = wkb.decode_polygons(table[wkb_col])
    if len(pg) == 0:
        return []
    b = kernels.polygon_bounds(pg)
    minx, miny = b[:, 0].min() - 1, b[:, 1].min() - 1
    maxx, maxy = b[:, 2].max() + 1, b[:, 3].max() + 1
    bbox_ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )
    c_r, c_h = [], []
    for row in range(len(pg)):
        rr, hh = booleans.ringset_of_row(pg, row)
        c_r.extend(rr)
        c_h.extend(hh)
    pieces = booleans.boolean_polygons([bbox_ring], c_r, "difference", [False], c_h)
    out = []
    gap_no = 0
    for rings in pieces:
        shell = rings[0]
        touches_outer = (
            (shell[:, 0].min() <= minx) or (shell[:, 1].min() <= miny)
            or (shell[:, 0].max() >= maxx) or (shell[:, 1].max() >= maxy)
        )
        if touches_outer:
            continue  # the surrounding area, not a gap
        area = kernels.ring_area(shell) - sum(
            kernels.ring_area(h) for h in rings[1:]
        )
        out.append(
            {
                "gap_no": gap_no,
                "gap_area": int(round(area)),
                "geometry_wkb": wkb.encode_polygon(rings),
            }
        )
        gap_no += 1
    return out


# ---------------------------------------------------------------------------
# Line cutting / splitting (reference cutting_lines.py:33-402)
# ---------------------------------------------------------------------------


def cut_lines_at_distance(batch: pa.Table, id_col: str, dist_col: str,
                          wkb_col: str = "geometry_wkb") -> pa.Table:
    """cut_lines_once with an ARBITRARY per-row distance column
    (cutting_lines.py:300-402): each 2-point line is cut at ``dist``
    meters from its start — two parts when 0 < dist < length, one
    untouched part otherwise. Emits (id, part_no, part_len, geometry)."""
    la = wkb.decode_lines(batch[wkb_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    dist = batch[dist_col].to_numpy(zero_copy_only=False).astype(np.float64)
    out_id, out_no, out_len, out_geom = [], [], [], []
    for i in range(len(la)):
        l0 = la.geom_offsets[i]
        a = la.coords[la.line_offsets[l0]]
        b = la.coords[la.line_offsets[l0 + 1] - 1]
        L = float(np.hypot(b[0] - a[0], b[1] - a[1]))
        d = float(dist[i])
        if d <= 0 or d >= L or L == 0:
            out_id.append(ids[i]); out_no.append(0); out_len.append(L)
            out_geom.append(wkb.encode_linestring(np.stack([a, b])))
            continue
        t = d / L
        m = a + t * (b - a)
        out_id.extend([ids[i], ids[i]])
        out_no.extend([0, 1])
        out_len.extend([d, L - d])
        out_geom.append(wkb.encode_linestring(np.stack([a, m])))
        out_geom.append(wkb.encode_linestring(np.stack([m, b])))
    return pa.table(
        {
            id_col: pa.array(out_id, pa.int64()),
            "part_no": pa.array(out_no, pa.int64()),
            "part_len": pa.array(np.asarray(out_len), pa.float64()),
            "geometry_wkb": pa.array(out_geom, pa.binary()),
        }
    )


class SplitLinesByNearestPoint:
    """split_lines_by_nearest_point (cutting_lines.py:33-189): split each
    line at the projection of its nearest point (from a broadcast point
    set) when that point lies within ``max_distance`` of the line.

    The point table is ``ray.put`` once; each actor builds an STRtree
    over the points in ``__init__`` and queries it with the line bbox
    padded by max_distance. Nearest point chosen by exact point→segment
    distance, ties by smaller point index."""

    def __init__(self, points_ref, id_col: str, max_distance: float,
                 wkb_col: str = "geometry_wkb"):
        from ..geo import kernels  # noqa: F401  (parity with sibling actors)
        from ..geo.strtree import STRtree

        px, py = ray.get(points_ref)
        self.px = np.asarray(px, np.float64)
        self.py = np.asarray(py, np.float64)
        boxes = np.stack([self.px, self.py, self.px, self.py], axis=1)
        self.tree = STRtree(boxes)
        self.id_col = id_col
        self.wkb_col = wkb_col
        self.maxd = max_distance

    def __call__(self, batch: pa.Table) -> pa.Table:
        la = wkb.decode_lines(batch[self.wkb_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id, out_no, out_len, out_geom = [], [], [], []
        # bbox query for ALL lines at once
        n = len(la)
        boxes = np.empty((n, 4))
        A = np.empty((n, 2)); B = np.empty((n, 2))
        for i in range(n):
            l0 = la.geom_offsets[i]
            a = la.coords[la.line_offsets[l0]]
            b = la.coords[la.line_offsets[l0 + 1] - 1]
            A[i] = a; B[i] = b
            boxes[i] = [min(a[0], b[0]) - self.maxd, min(a[1], b[1]) - self.maxd,
                        max(a[0], b[0]) + self.maxd, max(a[1], b[1]) + self.maxd]
        qi, pi = self.tree.query_bbox(boxes)
        # exact point->segment distances for the candidates, vectorized
        ax, ay = A[qi, 0], A[qi, 1]
        dx, dy = B[qi, 0] - ax, B[qi, 1] - ay
        L2 = dx * dx + dy * dy
        t = np.clip(
            np.where(L2 > 0, ((self.px[pi] - ax) * dx + (self.py[pi] - ay) * dy)
                     / np.where(L2 > 0, L2, 1.0), 0.0),
            0.0, 1.0,
        )
        cx = ax + t * dx
        cy = ay + t * dy
        d = np.hypot(self.px[pi] - cx, self.py[pi] - cy)
        ok = d <= self.maxd
        qi, pi, t, d = qi[ok], pi[ok], t[ok], d[ok]
        # argmin per line: (distance, point index) lexicographic
        best: dict[int, int] = {}
        order = np.lexsort((pi, d))
        for j in order[::-1]:
            best[int(qi[j])] = j  # reversed: smallest (d, pi) wins last
        for i in range(n):
            a, b = A[i], B[i]
            L = float(np.hypot(b[0] - a[0], b[1] - a[1]))
            j = best.get(i)
            tt = float(t[j]) if j is not None else None
            if j is None or tt <= 0.0 or tt >= 1.0:
                out_id.append(ids[i]); out_no.append(0); out_len.append(L)
                out_geom.append(wkb.encode_linestring(np.stack([a, b])))
                continue
            m = a + tt * (b - a)
            out_id.extend([ids[i], ids[i]])
            out_no.extend([0, 1])
            out_len.extend([tt * L, (1 - tt) * L])
            out_geom.append(wkb.encode_linestring(np.stack([a, m])))
            out_geom.append(wkb.encode_linestring(np.stack([m, b])))
        return pa.table(
            {
                self.id_col: pa.array(out_id, pa.int64()),
                "part_no": pa.array(out_no, pa.int64()),
                "part_len": pa.array(np.asarray(out_len), pa.float64()),
                "geometry_wkb": pa.array(out_geom, pa.binary()),
            }
        )


def reverse_lines(batch: pa.Table, wkb_col: str = "geometry_wkb") -> pa.Table:
    """Reverse vertex order of every (multi)linestring (reference shapely
    reverse, SURVEY §2.9; used for TF-oneway flipping in
    directednetwork.py:85-202). Coordinate reversal is one vectorized index
    permutation per batch; only the WKB re-assembly walks rows."""
    la = wkb.decode_lines(batch[wkb_col])
    starts = la.line_offsets[:-1]
    stops = la.line_offsets[1:]
    line_of = np.repeat(np.arange(len(starts)), stops - starts)
    rev_idx = starts[line_of] + stops[line_of] - 1 - np.arange(len(la.coords))
    rev = la.coords[rev_idx]
    blobs = []
    for i in range(len(la)):
        l0, l1 = la.geom_offsets[i], la.geom_offsets[i + 1]
        parts = [rev[starts[l] : stops[l]] for l in range(l0, l1)]
        blobs.append(
            wkb.encode_linestring(parts[0])
            if l1 - l0 == 1
            else wkb.encode_multilinestring(parts)
        )
    out = batch.remove_column(batch.column_names.index(wkb_col))
    return out.append_column(wkb_col, pa.array(blobs, pa.binary()))


def is_single_geom_type(ds, wkb_col: str = "geometry_wkb") -> bool:
    """is_single_geom_type (geometry_types.py:175-195): True iff every row
    is the same base type (multi/single collapse together). Distributed:
    per-batch distinct base codes, tiny global distinct."""
    def codes(batch: pa.Table) -> pa.Table:
        # WKB 1/2/3 = point/line/polygon, 4/5/6 their multi twins:
        # (code - 1) % 3 collapses multi and single to one base id
        c = wkb.wkb_types(batch[wkb_col])
        return pa.table({"base": pa.array(np.unique((c - 1) % 3), pa.int64())})

    return len(ds.map_batches(codes, batch_format="pyarrow").unique("base")) <= 1
