"""Lance-first table IO with parquet fallback.

The north rule targets Lance tables of image+caption pairs
(``ray.data.read_lance`` / ``lance.write_dataset``). The ``lance``
package is NOT installed in this sandbox, so every Lance call is gated
behind an import-try; when absent the same logical table round-trips
through parquet with an identical Arrow schema, and the chosen format is
recorded so callers/tests can assert which path ran. On a cluster with
``pylance`` installed, the Lance branch activates with no code changes.

Why Lance first at 10^12 rows: column projection + random-access row
retrieval over object storage beats parquet row-group scans for the
wide binary ``bytes`` column, and Ray Data's ``read_lance`` streams
fragments as blocks with projection/filter pushdown.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - exercised only where pylance is installed
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def dataset_format(path: str) -> str:
    """'lance' | 'parquet' for an existing dataset path."""
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        return "lance"
    return "parquet"


def write_table(table_or_ds, path: str, prefer: str = "lance") -> str:
    """Write an Arrow table / Ray Dataset; returns the format used.

    prefer='lance' uses Lance when available, else parquet (path gains
    a .parquet suffix only when the caller passed none).
    """
    use_lance = prefer == "lance" and HAVE_LANCE
    if use_lance:  # pragma: no cover - no pylance in this sandbox
        if hasattr(table_or_ds, "write_lance"):
            table_or_ds.write_lance(path)  # Ray Dataset
        else:
            lance.write_dataset(table_or_ds, path)
        return "lance"
    if hasattr(table_or_ds, "write_parquet"):  # Ray Dataset
        table_or_ds.write_parquet(path)
    else:
        os.makedirs(path, exist_ok=True)
        pq.write_table(table_or_ds, os.path.join(path, "data.parquet"))
    return "parquet"


def read_dataset(path: str, columns: list[str] | None = None):
    """Ray Dataset from a Lance or parquet path (projection pushed down)."""
    import ray.data as rd

    if dataset_format(path) == "lance":
        if not HAVE_LANCE:  # pragma: no cover
            raise RuntimeError(
                "path is a Lance dataset but the lance package is missing"
            )
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    """Arrow table (driver-side, small tables only)."""
    if dataset_format(path) == "lance":
        if not HAVE_LANCE:  # pragma: no cover
            raise RuntimeError(
                "path is a Lance dataset but the lance package is missing"
            )
        return lance.dataset(path).to_table(columns=columns)
    if os.path.isdir(path):
        return pq.read_table(path, columns=columns)
    return pq.read_table(path, columns=columns)
