"""CRS metadata: validate-once equality checks (single-CRS engine).

The engine computes in one projected plane (EPSG:25833-style, like the
reference's Oslo fixtures). There is no reprojection (pyproj is absent),
but the reference's per-call CRS equality guard
(/root/reference/src/sgis/geopandas_tools/overlay.py:83-84 and the
add_grid_id crs check, bounds.py:358-362) is reproduced here so mixed
inputs fail loudly instead of silently combining incompatible planes.

CRS rides as Arrow schema metadata (key b'crs'), set by tag_crs and read
by crs_of; ensure_same_crs raises ValueError exactly like the reference.
"""

from __future__ import annotations

import pyarrow as pa

CRS_KEY = b"crs"
DEFAULT_CRS = "EPSG:25833"


def tag_crs(table: pa.Table, crs: str = DEFAULT_CRS) -> pa.Table:
    meta = dict(table.schema.metadata or {})
    meta[CRS_KEY] = crs.encode()
    return table.replace_schema_metadata(meta)


def crs_of(obj) -> str | None:
    """CRS of a pyarrow Table (schema metadata) or None when untagged."""
    schema = obj.schema if isinstance(obj, pa.Table) else obj
    meta = schema.metadata or {}
    v = meta.get(CRS_KEY)
    return v.decode() if v is not None else None


def ensure_same_crs(*objs, default: str = DEFAULT_CRS) -> str:
    """Raise ValueError on CRS mismatch (overlay.py:83-84 semantics).

    Untagged inputs count as the engine default — the check is strict
    only between explicit tags, so the synthetic fixtures (untagged)
    never trip it while mixed tagged inputs always do.
    """
    seen = {crs_of(o) or default for o in objs if o is not None}
    if len(seen) > 1:
        raise ValueError(f"'crs' mismatch. Got {' and '.join(sorted(seen))}")
    return next(iter(seen)) if seen else default


def get_common_crs(iterable, strict: bool = False) -> str | None:
    """Common not-None CRS of tables / tagged schemas / CRS-like strings,
    or raise ValueError on a real mismatch (general.py:28-77 semantics).

    Falsy CRS-es are ignored unless ``strict``; equality is decided on the
    normalized string form (the reference compares ``to_string()`` because
    hash-distinct pyproj objects can be the same CRS — here the normal
    form is the upper-cased tag)."""
    crs: set = set()
    for obj in iterable:
        if isinstance(obj, (pa.Table, pa.Schema)):
            crs.add(crs_of(obj))
        elif obj is None or isinstance(obj, (str, int)):
            # falsy CRS-like values (None, "", 0) all normalize to None —
            # str(0) == "0" would otherwise smuggle a truthy fake CRS in
            crs.add(str(obj) if obj else None)
        elif hasattr(obj, "schema"):  # ray Dataset / record batch
            try:
                crs.add(crs_of(obj.schema() if callable(obj.schema) else obj.schema))
            except Exception:
                pass
        else:
            crs.add(None)
    truthy = {str(x).upper() for x in crs if x}
    # strict fires only on an ACTUAL falsy entry alongside a truthy one;
    # comparing set sizes in the raw space misfires when two truthy tags
    # normalize to the same CRS (e.g. case-differing strings)
    if strict and truthy and any(not x for x in crs):
        raise ValueError("Mix of falsy and truthy CRS-es found.")
    if len(truthy) > 1:
        raise ValueError("'crs' mismatch.", sorted(truthy))
    return next(iter(truthy)) if truthy else None


def check_crs_pair(left_crs: str | None, right_table) -> None:
    """Pairwise guard for join/overlay entry points: explicit left CRS vs
    the right table's tag; untagged/None sides are assumed compatible."""
    r = crs_of(right_table) if right_table is not None else None
    if left_crs and r and left_crs != r:
        raise ValueError(f"'crs' mismatch. Got {left_crs} and {r}")
