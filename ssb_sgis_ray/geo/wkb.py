"""Vectorized WKB codec over columnar geometry arrays.

The engine keeps geometry on the wire as a WKB ``binary`` column (little
endian, 2-D). In kernels, geometry lives in struct-of-arrays form:

* ``PointArray``    — (n,) points as x/y float64 arrays.
* ``PolygonArray``  — flattened coords + ring offsets + polygon offsets +
  geometry offsets, covering POLYGON and MULTIPOLYGON (holes supported).
* ``LineArray``     — flattened coords + line offsets + geometry offsets,
  covering LINESTRING and MULTILINESTRING.

Decoding is vectorized: the Arrow binary column already gives one
contiguous byte buffer plus per-row offsets, so headers are gathered with
fancy indexing and coordinates are pulled out with a single
``np.frombuffer``-style gather instead of per-row ``struct`` parsing.

This file implements the serialization contract the reference gets from
shapely (``shapely.wkb``; used e.g. in /root/reference/src/sgis/
geopandas_tools/conversion.py:504-516) — re-implemented from the public
OGC WKB spec, not ported.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# OGC geometry type codes (2-D)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

GEOM_FAMILY = {
    POINT: "point",
    MULTIPOINT: "point",
    LINESTRING: "line",
    MULTILINESTRING: "line",
    POLYGON: "polygon",
    MULTIPOLYGON: "polygon",
}


@dataclass
class PointArray:
    x: np.ndarray
    y: np.ndarray

    def __len__(self) -> int:
        return len(self.x)


@dataclass
class PolygonArray:
    """Columnar (multi)polygons.

    coords        (P, 2) float64 — all vertices, rings closed (first==last)
    ring_offsets  (R+1,) int64   — ring r spans coords[ring_offsets[r]:ring_offsets[r+1]]
    poly_offsets  (Q+1,) int64   — polygon q has rings poly_offsets[q]:poly_offsets[q+1]
                                   (first ring is the exterior, rest are holes)
    geom_offsets  (n+1,) int64   — row i has polygons geom_offsets[i]:geom_offsets[i+1]
    """

    coords: np.ndarray
    ring_offsets: np.ndarray
    poly_offsets: np.ndarray
    geom_offsets: np.ndarray

    def __len__(self) -> int:
        return len(self.geom_offsets) - 1

    def n_polys(self) -> int:
        return len(self.poly_offsets) - 1

    def exterior_ring_slices(self):
        """(start, stop) coord slices of each polygon's exterior ring."""
        ext = self.poly_offsets[:-1]  # first ring index of each polygon
        return self.ring_offsets[ext], self.ring_offsets[ext + 1]

    def single(self, i: int) -> "PolygonArray":
        """Row i as a standalone PolygonArray (for per-row kernels)."""
        p0, p1 = self.geom_offsets[i], self.geom_offsets[i + 1]
        r0, r1 = self.poly_offsets[p0], self.poly_offsets[p1]
        c0, c1 = self.ring_offsets[r0], self.ring_offsets[r1]
        return PolygonArray(
            coords=self.coords[c0:c1],
            ring_offsets=self.ring_offsets[r0 : r1 + 1] - c0,
            poly_offsets=self.poly_offsets[p0 : p1 + 1] - r0,
            geom_offsets=np.array([0, p1 - p0], dtype=np.int64),
        )


@dataclass
class LineArray:
    """Columnar (multi)linestrings.

    coords        (P, 2) float64
    line_offsets  (L+1,) int64 — linestring l spans coords[line_offsets[l]:line_offsets[l+1]]
    geom_offsets  (n+1,) int64 — row i has lines geom_offsets[i]:geom_offsets[i+1]
    """

    coords: np.ndarray
    line_offsets: np.ndarray
    geom_offsets: np.ndarray

    def __len__(self) -> int:
        return len(self.geom_offsets) - 1


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------


def encode_points(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized WKB POINT encoding -> object array of bytes.

    Each WKB point is 21 bytes: 01 | 01000000 | x | y.
    """
    n = len(x)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    header = np.array([POINT], dtype="<u4").view(np.uint8)
    buf[:, 1:5] = header
    buf[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    flat = buf.reshape(-1).tobytes()
    return np.array([flat[i * 21 : (i + 1) * 21] for i in range(n)], dtype=object)


def encode_points_arrow(x: np.ndarray, y: np.ndarray) -> pa.Array:
    """Vectorized WKB POINT encoding -> pa.binary array (zero python loop)."""
    n = len(x)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.array([POINT], dtype="<u4").view(np.uint8)
    buf[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    offsets = np.arange(0, 21 * (n + 1), 21, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


def encode_segments_arrow(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray
) -> pa.Array:
    """Vectorized WKB 2-point LINESTRING encoding -> pa.binary (no loop).

    Each segment is 41 bytes: 01 | 02000000 | 02000000 | x1 y1 x2 y2.
    """
    n = len(x1)
    buf = np.empty((n, 41), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:9] = np.array([LINESTRING, 2], dtype="<u4").view(np.uint8)
    for j, col in enumerate((x1, y1, x2, y2)):
        s = 9 + 8 * j
        buf[:, s : s + 8] = (
            np.ascontiguousarray(col, dtype="<f8").view(np.uint8).reshape(n, 8)
        )
    offsets = np.arange(0, 41 * (n + 1), 41, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


def _ring_bytes(ring: np.ndarray) -> bytes:
    npts = np.array([len(ring)], dtype="<u4").tobytes()
    return npts + np.ascontiguousarray(ring, dtype="<f8").tobytes()


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """One POLYGON (first ring exterior, rest holes) -> WKB bytes."""
    head = b"\x01" + np.array([POLYGON, len(rings)], dtype="<u4").tobytes()
    return head + b"".join(_ring_bytes(r) for r in rings)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    head = b"\x01" + np.array([MULTIPOLYGON, len(polys)], dtype="<u4").tobytes()
    return head + b"".join(encode_polygon(p) for p in polys)


def encode_linestring(coords: np.ndarray) -> bytes:
    head = b"\x01" + np.array([LINESTRING], dtype="<u4").tobytes()
    return head + _ring_bytes(coords)


def encode_multilinestring(lines: list[np.ndarray]) -> bytes:
    head = b"\x01" + np.array([MULTILINESTRING, len(lines)], dtype="<u4").tobytes()
    return head + b"".join(encode_linestring(line) for line in lines)


def encode_multipoint(coords: np.ndarray) -> bytes:
    head = b"\x01" + np.array([MULTIPOINT, len(coords)], dtype="<u4").tobytes()
    pts = b"".join(
        b"\x01"
        + np.array([POINT], dtype="<u4").tobytes()
        + np.ascontiguousarray(c, dtype="<f8").tobytes()
        for c in coords
    )
    return head + pts


def encode_polygon_array(pg: PolygonArray, force_multi: bool = False) -> np.ndarray:
    """PolygonArray -> object ndarray of WKB bytes (POLYGON or MULTIPOLYGON)."""
    out = np.empty(len(pg), dtype=object)
    for i in range(len(pg)):
        p0, p1 = pg.geom_offsets[i], pg.geom_offsets[i + 1]
        polys = []
        for q in range(p0, p1):
            r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
            rings = [
                pg.coords[pg.ring_offsets[r] : pg.ring_offsets[r + 1]]
                for r in range(r0, r1)
            ]
            polys.append(rings)
        if len(polys) == 1 and not force_multi:
            out[i] = encode_polygon(polys[0])
        else:
            out[i] = encode_multipolygon(polys)
    return out


# ---------------------------------------------------------------------------
# Decoding (vectorized over an Arrow binary column)
# ---------------------------------------------------------------------------


def _as_bytes_and_offsets(wkb) -> tuple[np.ndarray, np.ndarray]:
    """Any binary column-ish input -> (uint8 buffer, int64 row offsets)."""
    if isinstance(wkb, pa.ChunkedArray):
        wkb = wkb.combine_chunks()
    if isinstance(wkb, pa.Array):
        if pa.types.is_large_binary(wkb.type):
            wkb = wkb.cast(pa.binary())
        # values buffer + offsets straight from Arrow, zero copy
        buf = np.frombuffer(wkb.buffers()[2], dtype=np.uint8)
        offsets = np.frombuffer(wkb.buffers()[1], dtype=np.int32).astype(np.int64)
        offsets = offsets[wkb.offset : wkb.offset + len(wkb) + 1]
        return buf, offsets
    # object ndarray / list of bytes
    items = list(wkb)
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=len(items))
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    buf = np.frombuffer(b"".join(items), dtype=np.uint8)
    return buf, offsets


def _read_u32(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Gather little-endian uint32 values at byte positions ``pos``."""
    idx = pos[:, None] + np.arange(4)
    b = buf[idx].astype(np.uint32)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def wkb_types(wkb) -> np.ndarray:
    """Geometry type code of each row (vectorized header read)."""
    buf, offsets = _as_bytes_and_offsets(wkb)
    return _read_u32(buf, offsets[:-1] + 1)


def decode_points(wkb) -> PointArray:
    """Decode a column of WKB POINTs (all rows must be POINT)."""
    buf, offsets = _as_bytes_and_offsets(wkb)
    pos = offsets[:-1]
    idx = pos[:, None] + (5 + np.arange(16))
    raw = buf[idx].reshape(-1).tobytes()
    xy = np.frombuffer(raw, dtype="<f8").reshape(-1, 2)
    return PointArray(x=xy[:, 0].copy(), y=xy[:, 1].copy())


def _gather_f64(buf: np.ndarray, starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Gather ``counts[i]`` float64 values starting at byte ``starts[i]``."""
    total = int(counts.sum())
    if total == 0:
        return np.empty((0,), dtype=np.float64)
    # byte index array: for each run, starts[i] + 0..counts[i]*8
    reps = np.repeat(starts, counts)
    within = np.arange(total) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    byte_idx = (reps + within * 8)[:, None] + np.arange(8)
    raw = buf[byte_idx].reshape(-1).tobytes()
    return np.frombuffer(raw, dtype="<f8").copy()


def decode_polygons(wkb) -> PolygonArray:
    """Decode a column of WKB POLYGON / MULTIPOLYGON rows (mixed OK).

    Fast path: when every row is a single-ring POLYGON (the dominant shape
    in the engine's pipelines — boxes, diamonds, grid cells), all offsets
    derive from vectorized header reads with no per-row python loop.
    """
    buf, offsets = _as_bytes_and_offsets(wkb)
    n = len(offsets) - 1
    pos = offsets[:-1]
    types = _read_u32(buf, pos + 1)

    if n and (types == POLYGON).all():
        nrings = _read_u32(buf, pos + 5)
        if (nrings == 1).all():
            pt_counts = _read_u32(buf, pos + 9).astype(np.int64)
            ring_offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(pt_counts, out=ring_offsets[1:])
            one = np.arange(n + 1, dtype=np.int64)
            row_lens = np.diff(offsets)
            if (row_lens == row_lens[0]).all() and (pt_counts == pt_counts[0]).all():
                # uniform-stride page (e.g. all boxes/diamonds): view the
                # whole byte range as (n, rowlen) and slice the coords out
                # in one copy — no index matrices at all
                rl = int(row_lens[0])
                npts = int(pt_counts[0])
                rows = buf[offsets[0] : offsets[-1]].reshape(n, rl)
                coord_bytes = np.ascontiguousarray(rows[:, 13 : 13 + npts * 16])
                flat = coord_bytes.reshape(-1).view("<f8").copy()
            else:
                flat = _gather_f64(buf, pos + 13, pt_counts * 2)
            return PolygonArray(
                coords=flat.reshape(-1, 2),
                ring_offsets=ring_offsets,
                poly_offsets=one,
                geom_offsets=one,
            )

    geom_offsets = np.zeros(n + 1, dtype=np.int64)
    poly_starts: list[int] = []  # byte pos of each polygon's numRings field
    n_polys_per_row = np.zeros(n, dtype=np.int64)

    # Pass 1: find polygon byte starts. POLYGON rows: one poly at pos+5.
    # MULTIPOLYGON rows: need sequential walk (variable-size members).
    is_single = types == POLYGON
    is_multi = types == MULTIPOLYGON
    if not np.all(is_single | is_multi):
        bad = types[~(is_single | is_multi)][:3]
        raise ValueError(f"decode_polygons: non-polygon type codes {bad}")

    # quick vectorized path when everything is single POLYGON
    ring_counts_cache: dict[int, int] = {}
    for i in range(n):
        if is_single[i]:
            poly_starts.append(int(pos[i]) + 5)
            n_polys_per_row[i] = 1
        else:
            npolys = int(_read_u32(buf, np.array([pos[i] + 5]))[0])
            n_polys_per_row[i] = npolys
            p = int(pos[i]) + 9
            for _ in range(npolys):
                # member polygon: 1 (byte order) + 4 (type) then numRings
                poly_starts.append(p + 5)
                nrings = int(_read_u32(buf, np.array([p + 5]))[0])
                q = p + 9
                for _ in range(nrings):
                    npts = int(_read_u32(buf, np.array([q]))[0])
                    q += 4 + npts * 16
                p = q
    np.cumsum(n_polys_per_row, out=geom_offsets[1:])

    poly_starts_a = np.asarray(poly_starts, dtype=np.int64)
    nrings_per_poly = _read_u32(buf, poly_starts_a).astype(np.int64)
    poly_offsets = np.zeros(len(poly_starts_a) + 1, dtype=np.int64)
    np.cumsum(nrings_per_poly, out=poly_offsets[1:])

    # Pass 2: ring starts. Within one polygon rings are sequential.
    total_rings = int(nrings_per_poly.sum())
    ring_pt_counts = np.zeros(total_rings, dtype=np.int64)
    ring_coord_starts = np.zeros(total_rings, dtype=np.int64)
    r = 0
    for pi in range(len(poly_starts_a)):
        q = int(poly_starts_a[pi]) + 4
        for _ in range(int(nrings_per_poly[pi])):
            npts = int(_read_u32(buf, np.array([q]))[0])
            ring_pt_counts[r] = npts
            ring_coord_starts[r] = q + 4
            q += 4 + npts * 16
            r += 1

    ring_offsets = np.zeros(total_rings + 1, dtype=np.int64)
    np.cumsum(ring_pt_counts, out=ring_offsets[1:])
    flat = _gather_f64(buf, ring_coord_starts, ring_pt_counts * 2)
    coords = flat.reshape(-1, 2)
    return PolygonArray(
        coords=coords,
        ring_offsets=ring_offsets,
        poly_offsets=poly_offsets,
        geom_offsets=geom_offsets,
    )


def decode_lines(wkb) -> LineArray:
    """Decode a column of WKB LINESTRING / MULTILINESTRING rows."""
    buf, offsets = _as_bytes_and_offsets(wkb)
    n = len(offsets) - 1
    pos = offsets[:-1]
    types = _read_u32(buf, pos + 1)
    line_starts: list[int] = []
    n_lines_per_row = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if types[i] == LINESTRING:
            line_starts.append(int(pos[i]) + 5)
            n_lines_per_row[i] = 1
        elif types[i] == MULTILINESTRING:
            nlines = int(_read_u32(buf, np.array([pos[i] + 5]))[0])
            n_lines_per_row[i] = nlines
            p = int(pos[i]) + 9
            for _ in range(nlines):
                line_starts.append(p + 5)
                npts = int(_read_u32(buf, np.array([p + 5]))[0])
                p += 9 + npts * 16
        else:
            raise ValueError(f"decode_lines: unexpected type code {types[i]}")
    geom_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_lines_per_row, out=geom_offsets[1:])
    starts = np.asarray(line_starts, dtype=np.int64)
    pt_counts = _read_u32(buf, starts).astype(np.int64)
    line_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(pt_counts, out=line_offsets[1:])
    flat = _gather_f64(buf, starts + 4, pt_counts * 2)
    return LineArray(
        coords=flat.reshape(-1, 2),
        line_offsets=line_offsets,
        geom_offsets=geom_offsets,
    )


def encode_boxes_arrow(boxes: np.ndarray) -> pa.Array:
    """(n,4) axis-aligned boxes -> pa.binary WKB POLYGON column, fully
    vectorized (every 5-point single-ring polygon is exactly 93 bytes)."""
    n = len(boxes)
    buf = np.empty((n, 93), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.array([POLYGON], dtype="<u4").view(np.uint8)
    buf[:, 5:9] = np.array([1], dtype="<u4").view(np.uint8)  # numRings
    buf[:, 9:13] = np.array([5], dtype="<u4").view(np.uint8)  # numPoints
    ring = np.empty((n, 10), dtype="<f8")  # x0 y0 x1 y0 x1 y1 x0 y1 x0 y0
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ring[:, 0] = x0
    ring[:, 1] = y0
    ring[:, 2] = x1
    ring[:, 3] = y0
    ring[:, 4] = x1
    ring[:, 5] = y1
    ring[:, 6] = x0
    ring[:, 7] = y1
    ring[:, 8] = x0
    ring[:, 9] = y0
    buf[:, 13:93] = ring.view(np.uint8).reshape(n, 80)
    offsets = np.arange(0, 93 * (n + 1), 93, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )


# ---------------------------------------------------------------------------
# force_2d: Z/M-stripping IO shim (reference force_2d, SURVEY §2.9)
# ---------------------------------------------------------------------------

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _strip_zm_one(buf: bytes, pos: int, out: list) -> int:
    """Copy one geometry from buf[pos:] into out with Z/M dropped; returns
    the new read position. Handles EWKB flags and ISO 1000/2000/3000 type
    offsets on all six geometry types (little-endian input)."""
    if buf[pos] != 1:
        raise ValueError("big-endian WKB not supported")
    (raw,) = np.frombuffer(buf, "<u4", 1, pos + 1)
    raw = int(raw)
    has_srid = bool(raw & _EWKB_SRID)
    flags_z = bool(raw & _EWKB_Z)
    flags_m = bool(raw & _EWKB_M)
    base = raw & 0x0FFFFFFF
    iso = base // 1000  # 1=Z, 2=M, 3=ZM per ISO 13249-3
    base = base % 1000
    ndims = 2 + (1 if flags_z or iso in (1, 3) else 0) + (1 if flags_m or iso in (2, 3) else 0)
    pos += 5
    if has_srid:
        pos += 4  # drop SRID
    out.append(b"\x01" + np.array([base], dtype="<u4").tobytes())
    if base == POINT:
        c = np.frombuffer(buf, "<f8", ndims, pos)
        out.append(c[:2].tobytes())
        return pos + 8 * ndims
    if base in (LINESTRING,):
        (npts,) = np.frombuffer(buf, "<u4", 1, pos)
        pos += 4
        c = np.frombuffer(buf, "<f8", int(npts) * ndims, pos).reshape(-1, ndims)
        out.append(np.array([npts], dtype="<u4").tobytes())
        out.append(np.ascontiguousarray(c[:, :2]).tobytes())
        return pos + 8 * ndims * int(npts)
    if base == POLYGON:
        (nrings,) = np.frombuffer(buf, "<u4", 1, pos)
        pos += 4
        out.append(np.array([nrings], dtype="<u4").tobytes())
        for _ in range(int(nrings)):
            (npts,) = np.frombuffer(buf, "<u4", 1, pos)
            pos += 4
            c = np.frombuffer(buf, "<f8", int(npts) * ndims, pos).reshape(-1, ndims)
            out.append(np.array([npts], dtype="<u4").tobytes())
            out.append(np.ascontiguousarray(c[:, :2]).tobytes())
            pos += 8 * ndims * int(npts)
        return pos
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, 7):  # 7 = collection
        (ngeom,) = np.frombuffer(buf, "<u4", 1, pos)
        pos += 4
        out.append(np.array([ngeom], dtype="<u4").tobytes())
        for _ in range(int(ngeom)):
            pos = _strip_zm_one(buf, pos, out)
        return pos
    raise ValueError(f"unsupported WKB type {raw}")


def force_2d(wkb_col) -> np.ndarray:
    """Strip Z/M ordinates from WKB geometries (reference shapely force_2d,
    SURVEY §2.9 expression layer). 2-D input round-trips byte-identically.
    Per-geometry parser: an IO-compat shim applied at load time (as the
    reference does), not a per-batch hot-path kernel."""
    blobs, offs = _as_bytes_and_offsets(wkb_col)
    raw = blobs.tobytes()
    res = []
    for i in range(len(offs) - 1):
        out: list = []
        _strip_zm_one(raw, int(offs[i]), out)
        res.append(b"".join(out))
    return np.array(res, dtype=object)
