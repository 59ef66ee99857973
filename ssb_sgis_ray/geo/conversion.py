"""Geometry-like objects -> the engine's geometry-table format.

The reference's ``to_gdf`` (conversion.py:120-268) converts anything
geometry-like — WKT strings, WKB bytes, coordinate tuples/lists, dicts,
(Geo)DataFrames — into a GeoDataFrame. This module is the Ray-Data-native
equivalent: the engine's unit of exchange is a pyarrow Table with a
``geometry_wkb`` binary column (and whatever attribute columns ride
along), so ``to_geo_table`` produces exactly that, and ``to_geo_dataset``
wraps it in a ``ray.data`` Dataset for pipeline entry.

CRS handling mirrors the reference: an optional ``crs`` tag is carried in
the table's schema metadata (key ``b"crs"``) and checked by
``geo.crs.check_crs_pair`` at join/overlay boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import wkb, wkt


def _is_xy(obj) -> bool:
    return (
        isinstance(obj, (tuple, list))
        and len(obj) == 2
        and all(isinstance(v, (int, float, np.integer, np.floating)) for v in obj)
    )


def _scalar_ok(g) -> bytes:
    """One geometry-like scalar -> WKB bytes."""
    if isinstance(g, (bytes, bytearray)):
        return bytes(g)
    if isinstance(g, str):
        return wkt.wkt_to_wkb(g)
    if _is_xy(g):
        return bytes(
            wkb.encode_points(
                np.array([float(g[0])]), np.array([float(g[1])])
            )[0]
        )
    raise TypeError(f"not geometry-like: {type(g).__name__}")


def _with_crs(t: pa.Table, crs) -> pa.Table:
    if crs is None:
        return t
    meta = dict(t.schema.metadata or {})
    meta[b"crs"] = str(crs).encode()
    return t.replace_schema_metadata(meta)


def to_geo_table(obj, crs=None, geometry=None) -> pa.Table:
    """Convert a geometry-like object to a pa.Table with ``geometry_wkb``.

    Accepted (mirroring the reference's to_gdf input domain,
    conversion.py:120-268, minus live shapely/GeoSeries objects which do
    not exist in this stack):

    - WKT ``str`` / WKB ``bytes``: one row
    - ``(x, y)`` pair of numbers: one point row
    - list/ndarray of (x, y) pairs: one point row each
    - list of WKT strings or WKB bytes: one row each
    - ``dict`` of columns / ``pandas.DataFrame`` / ``pa.Table``: attribute
      columns carried through; the geometry source is (in priority order)
      ``geometry=`` naming one WKT/WKB column or an ``(x_col, y_col)``
      pair, an existing ``geometry_wkb`` column, a ``geometry`` column of
      WKT/WKB, or ``x``/``y`` columns.

    ``crs`` is stored under schema metadata key ``b"crs"``.
    """
    import pandas as pd

    if isinstance(obj, pa.Table):
        return _with_crs(_table_geometry(obj, geometry), crs)
    if isinstance(obj, pd.DataFrame):
        return _with_crs(
            _table_geometry(
                pa.Table.from_pandas(obj, preserve_index=False), geometry
            ),
            crs,
        )
    if isinstance(obj, dict):
        return _with_crs(
            _table_geometry(pa.table(obj), geometry), crs
        )
    if isinstance(obj, (str, bytes, bytearray)) or _is_xy(obj):
        return _with_crs(
            pa.table({"geometry_wkb": pa.array([_scalar_ok(obj)], pa.binary())}),
            crs,
        )
    if isinstance(obj, np.ndarray):
        arr = np.asarray(obj, dtype=np.float64)
        if arr.ndim != 2 or arr.shape[1] != 2:
            raise TypeError("ndarray input must be (n, 2) xy coordinates")
        return _with_crs(
            pa.table(
                {"geometry_wkb": wkb.encode_points_arrow(arr[:, 0], arr[:, 1])}
            ),
            crs,
        )
    if isinstance(obj, (list, tuple)):
        items = list(obj)
        if all(_is_xy(i) for i in items) and items:
            xy = np.array(items, dtype=np.float64)
            return _with_crs(
                pa.table(
                    {"geometry_wkb": wkb.encode_points_arrow(xy[:, 0], xy[:, 1])}
                ),
                crs,
            )
        return _with_crs(
            pa.table(
                {
                    "geometry_wkb": pa.array(
                        [_scalar_ok(i) for i in items], pa.binary()
                    )
                }
            ),
            crs,
        )
    # generators / iterators, like the reference accepts
    if hasattr(obj, "__iter__"):
        return to_geo_table(list(obj), crs=crs, geometry=geometry)
    raise TypeError(f"cannot convert {type(obj).__name__} to a geo table")


def _table_geometry(t: pa.Table, geometry) -> pa.Table:
    """Resolve the geometry source of a columnar input (see to_geo_table)."""
    names = t.column_names
    if isinstance(geometry, (tuple, list)) and len(geometry) == 2:
        xc, yc = geometry
        x = t[xc].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[yc].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = [c for c in names if c not in (xc, yc)]
        out = t.select(keep) if keep else pa.table({})
        g = wkb.encode_points_arrow(x, y)
        return (out.append_column("geometry_wkb", g)
                if keep else pa.table({"geometry_wkb": g}))
    src = None
    if isinstance(geometry, str):
        src = geometry
    elif "geometry_wkb" in names:
        return t
    elif "geometry" in names:
        src = "geometry"
    elif "x" in names and "y" in names:
        return _table_geometry(t, ("x", "y"))
    if src is None:
        raise TypeError(
            "no geometry source: pass geometry=<col> or geometry=(x, y) "
            "or include geometry_wkb / geometry / x+y columns"
        )
    col = t[src]
    vals = col.to_pylist()
    g = pa.array([_scalar_ok(v) for v in vals], pa.binary())
    out = t.drop_columns([src])
    return out.append_column("geometry_wkb", g)


def to_geo_dataset(obj, crs=None, geometry=None):
    """to_geo_table wrapped in a ray.data Dataset (pipeline entry point)."""
    import ray.data as rd

    return rd.from_arrow(to_geo_table(obj, crs=crs, geometry=geometry))


# ---------------------------------------------------------------------------
# GeoDataFrame frame utilities, re-expressed for geometry-WKB tables
# (reference geopandas_tools/general.py:92-135, conversion.py:17-55).
# The engine's "active geometry column" is by convention ``geometry_wkb``.
# ---------------------------------------------------------------------------

GEOM_COL = "geometry_wkb"


def _geometry_columns(t: pa.Table) -> list[str]:
    """Columns holding WKB geometry: the active column plus any *_wkb
    binary columns (the stack's GeometryDtype equivalent)."""
    out = []
    for name, typ in zip(t.column_names, t.schema.types):
        if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            if name == GEOM_COL or name.endswith("_wkb"):
                out.append(name)
    return out


def drop_inactive_geometry_columns(t: pa.Table) -> pa.Table:
    """Drop every geometry column except the active ``geometry_wkb``
    (general.py:108-115)."""
    drop = [c for c in _geometry_columns(t) if c != GEOM_COL]
    return t.drop_columns(drop) if drop else t


def rename_geometry_if(t: pa.Table) -> pa.Table:
    """Normalize the geometry column name to ``geometry_wkb``
    (general.py:118-135): no-op when already present; a single other
    geometry column is renamed; ambiguity raises ValueError."""
    names = t.column_names
    if GEOM_COL in names:
        return t
    cands = _geometry_columns(t)  # never contains bare "geometry"
    if "geometry" in names:
        gtyp = t.schema.field("geometry").type
        if pa.types.is_binary(gtyp) or pa.types.is_large_binary(gtyp):
            cands = ["geometry"] + cands
    if len(cands) == 1:
        return t.rename_columns(
            [GEOM_COL if n == cands[0] else n for n in names]
        )
    if not cands:
        raise ValueError("No geometry column found")
    raise ValueError(
        "There are multiple geometry columns and none are the active geometry"
    )


def push_geom_col(t: pa.Table) -> pa.Table:
    """Geometry column last (general.py:92-105 _push_geom_col; the
    engine's overlay emit already follows geometry-last)."""
    names = [c for c in t.column_names if c != GEOM_COL]
    if GEOM_COL not in t.column_names:
        return t
    return t.select(names + [GEOM_COL])


def geometry_array(obj, geometry=None) -> pa.Array:
    """The ``to_geoseries`` analogue (conversion.py:17-42): the WKB
    geometry column of any to_geo_table-accepted input, as one combined
    pa.BinaryArray."""
    t = to_geo_table(obj, geometry=geometry)
    return t[GEOM_COL].combine_chunks()


def to_wkb_geom(obj) -> bytes:
    """The ``to_shapely`` analogue (conversion.py:44-55): one WKB scalar.

    bytes/str/(x, y) pass through the scalar rule; a 4-number bbox becomes
    its box polygon (counter-clockwise, closed ring)."""
    if isinstance(obj, (bytes, bytearray, str)) or _is_xy(obj):
        return _scalar_ok(obj)
    if (
        isinstance(obj, (tuple, list))
        and len(obj) == 4
        and all(isinstance(v, (int, float, np.integer, np.floating)) for v in obj)
    ):
        x0, y0, x1, y1 = (float(v) for v in obj)
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )
        return wkb.encode_polygon([ring])
    raise TypeError(f"not geometry-like: {type(obj).__name__}")
