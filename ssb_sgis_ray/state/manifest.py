"""Checkpoint manifest: per-partition lineage + metrics, exact resume.

Generalizes two reference features into one mechanism: the per-run log of
``NetworkAnalysis`` (/root/reference/src/sgis/networkanalysis/
networkanalysis.py:1259-1329 — per-call rows with timing and result
stats) and the name-by-region output layout of ``write_municipality_data``
(io/write_municipality_data.py:52-99 — one file per partition key, so a
re-run can skip finished keys).

Layout:
    out_dir/
      part=<key>/data.parquet      (written atomically: tmp + os.replace)
      _manifest.jsonl              (one row per completed partition)

Manifest row: {stage, partition, n_rows, n_bytes, input_hash, wall_s,
path}. Resume contract: a partition is DONE iff its manifest row exists,
the file exists, and the stored input_hash matches the current input hash
for that partition — changed inputs invalidate just that partition.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


# one explicit schema for every metrics row the sink emits — schema-stable
# blocks keep the streaming executor's operator fusion happy
_METRICS_SCHEMA = pa.schema(
    [
        ("stage", pa.string()),
        ("partition", pa.string()),
        ("n_rows", pa.int64()),
        ("n_bytes", pa.int64()),
        ("input_hash", pa.string()),
        ("wall_s", pa.float64()),
        ("path", pa.string()),
        ("resumed", pa.bool_()),
    ]
)


def _metrics_row(row: dict) -> pa.Table:
    return pa.table(
        {f.name: [row[f.name]] for f in _METRICS_SCHEMA}, schema=_METRICS_SCHEMA
    )


def load_manifest(out_dir: str) -> dict[str, dict]:
    """partition -> manifest row, for completed (file-exists) partitions."""
    path = manifest_path(out_dir)
    done: dict[str, dict] = {}
    if not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if os.path.exists(row["path"]):
                done[str(row["partition"])] = row
    return done


def append_manifest(out_dir: str, rows: list[dict]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(manifest_path(out_dir), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def partition_input_hash(g: pd.DataFrame, id_col: str) -> str:
    """Content hash of a partition's input row ids (order-insensitive)."""
    ids = sorted(str(v) for v in g[id_col])
    return hashlib.md5("\n".join(ids).encode()).hexdigest()


def make_partition_writer(out_dir: str, partition_col: str, id_col: str,
                          stage: str = "partitioned_write",
                          done: dict[str, dict] | None = None):
    """Group kernel for ``groupby(partition_col).map_groups``: writes one
    partition atomically and RETURNS its manifest/metrics row (the tiny
    result Dataset is the lineage record; caller appends it to the
    manifest file).

    When ``done`` (a loaded manifest) is given, a partition whose stored
    input_hash equals the current group's hash is NOT rewritten — the
    stored row is returned instead; a hash mismatch (changed inputs)
    invalidates just that partition and rewrites it. This is the resume
    contract from the module docstring, enforced where the data actually
    is (the group kernel) rather than trusted from keys alone."""

    def write_one(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        key = str(g[partition_col].iloc[0])
        if done is not None and key in done:
            prev = done[key]
            cur_hash = partition_input_hash(g, id_col)
            if prev.get("input_hash") == cur_hash and os.path.exists(prev["path"]):
                row = {k: v for k, v in prev.items() if k != "resumed"}
                row["resumed"] = True
                return _metrics_row(row)
        pdir = os.path.join(out_dir, f"part={key}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, "data.parquet")
        tmp = os.path.join(pdir, f".tmp-{os.getpid()}")
        # deterministic TOTAL row order inside the file (resume => byte-
        # stable): id first, then every other column as tiebreak
        sort_cols = [id_col] + [c for c in g.columns if c != id_col]
        g = g.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, final)  # atomic publish
        row = {
            "stage": stage,
            "partition": key,
            "n_rows": len(g),
            "n_bytes": os.path.getsize(final),
            "input_hash": partition_input_hash(g, id_col),
            "wall_s": round(time.time() - t0, 4),
            "path": final,
            "resumed": False,
        }
        # the WORKER records its own completion immediately (O_APPEND line
        # writes are atomic for lines < PIPE_BUF), so a driver killed
        # mid-job still leaves finished partitions resumable — true
        # mid-pipeline checkpointing, not end-of-job bookkeeping
        with open(manifest_path(out_dir), "a") as f:
            f.write(json.dumps(row) + "\n")
        return _metrics_row(row)

    return write_one


def write_partitioned_resumable(ds, out_dir: str, partition_col: str,
                                id_col: str, stage: str = "partitioned_write",
                                skip_by_key: bool = False):
    """Partitioned parquet sink with exact resume.

    1. load manifest -> completed partitions;
    2. ``groupby(partition).map_groups(write_one)``: each group's kernel
       compares its input_hash against the manifest row — matching
       partitions return the stored row WITHOUT rewriting, changed inputs
       invalidate just that partition (the documented resume contract);
    3. workers append their own manifest rows (mid-job kill safe).

    ``skip_by_key=True`` additionally drops completed partition keys
    BEFORE the shuffle — cheaper (finished partitions never move), but
    only sound when partition inputs are immutable between runs; the
    hash check in the kernel still covers everything that remains.

    Returns the list of manifest rows for partitions seen this run.
    """
    done = load_manifest(out_dir)
    if skip_by_key and done:
        done_keys = set(done.keys())

        def drop_done(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~batch[partition_col].astype(str).isin(done_keys)]

        ds = ds.map_batches(drop_done, batch_format="pandas")
    os.makedirs(out_dir, exist_ok=True)
    writer = make_partition_writer(out_dir, partition_col, id_col, stage,
                                   done=done or None)
    metrics = ds.groupby(partition_col).map_groups(writer, batch_format="pandas")
    # workers already appended their own manifest rows (mid-job kill safe);
    # the collected metrics are returned as this run's lineage record
    return metrics.to_pandas().to_dict("records")


def verify_manifest(out_dir: str) -> dict:
    """Audit a completed output: for every manifest row check the file
    exists, its parquet row count matches n_rows, and its byte size
    matches n_bytes. Returns {partition: 'ok' | reason}."""
    out: dict[str, str] = {}
    for key, row in load_manifest(out_dir).items():
        path = row["path"]
        if not os.path.exists(path):
            out[key] = "missing"
            continue
        if os.path.getsize(path) != row["n_bytes"]:
            out[key] = "size mismatch"
            continue
        meta = pq.read_metadata(path)
        out[key] = "ok" if meta.num_rows == row["n_rows"] else "row count mismatch"
    return out
