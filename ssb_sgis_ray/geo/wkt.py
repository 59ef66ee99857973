"""WKT encode/decode for the engine's geometry families.

The reference round-trips geometry through WKT strings in several
network-analysis steps (nodes.py:84, closing_network_holes.py:241-306,
GeoSeries.from_wkt / .wkt). This module reimplements that surface from
the public WKT grammar — integer-valued coordinates render without a
trailing ``.0`` so DuckDB string-concatenation oracles can rebuild the
exact same text.
"""

from __future__ import annotations

import re

import numpy as np

from . import wkb


def _num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def _ring_txt(ring: np.ndarray) -> str:
    return "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in ring) + ")"


def encode_point(x: float, y: float) -> str:
    return f"POINT ({_num(x)} {_num(y)})"


def encode_linestring(coords: np.ndarray) -> str:
    return "LINESTRING " + _ring_txt(coords)


def encode_polygon(rings: list[np.ndarray]) -> str:
    return "POLYGON (" + ", ".join(_ring_txt(r) for r in rings) + ")"


def encode_multipolygon(polys: list[list[np.ndarray]]) -> str:
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_ring_txt(r) for r in p) + ")" for p in polys
    ) + ")"


def polygons_to_wkt(pg: wkb.PolygonArray) -> np.ndarray:
    """PolygonArray -> object array of WKT strings (POLYGON/MULTIPOLYGON)."""
    out = np.empty(len(pg), dtype=object)
    for i in range(len(pg)):
        polys = []
        for q in range(pg.geom_offsets[i], pg.geom_offsets[i + 1]):
            r0, r1 = pg.poly_offsets[q], pg.poly_offsets[q + 1]
            polys.append(
                [pg.coords[pg.ring_offsets[r] : pg.ring_offsets[r + 1]]
                 for r in range(r0, r1)]
            )
        out[i] = (
            encode_polygon(polys[0]) if len(polys) == 1 else encode_multipolygon(polys)
        )
    return out


_COORD = re.compile(r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)")


def _parse_rings(body: str) -> list[np.ndarray]:
    rings = []
    depth = 0
    start = None
    for i, c in enumerate(body):
        if c == "(":
            depth += 1
            if depth == 1:
                start = i + 1
        elif c == ")":
            if depth == 1:
                pts = _COORD.findall(body[start:i])
                rings.append(np.array(pts, dtype=np.float64))
            depth -= 1
    return rings


def decode(text: str):
    """WKT string -> (kind, payload).

    kind='point' -> (x, y); 'line' -> coords; 'polygon' -> list[rings];
    'multipolygon' -> list[list[rings]].
    """
    t = text.strip()
    up = t.upper()
    if up.startswith("POINT"):
        m = _COORD.search(t)
        return "point", (float(m.group(1)), float(m.group(2)))
    if up.startswith("LINESTRING"):
        pts = _COORD.findall(t)
        return "line", np.array(pts, dtype=np.float64)
    if up.startswith("MULTIPOLYGON"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        # split top-level polygon groups
        polys, depth, start = [], 0, None
        for i, c in enumerate(body):
            if c == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    polys.append(_parse_rings(body[start + 1 : i]))
        return "multipolygon", polys
    if up.startswith("POLYGON"):
        body = t[t.index("(") + 1 : t.rindex(")")]
        return "polygon", _parse_rings(body)
    raise ValueError(f"unsupported WKT: {t[:40]}")


def wkt_to_wkb(text: str) -> bytes:
    kind, payload = decode(text)
    if kind == "point":
        return bytes(wkb.encode_points(np.array([payload[0]]), np.array([payload[1]]))[0])
    if kind == "line":
        return wkb.encode_linestring(payload)
    if kind == "polygon":
        return wkb.encode_polygon(payload)
    return wkb.encode_multipolygon(payload)
