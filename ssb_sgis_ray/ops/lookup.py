"""Limit-guarded broadcast lookup join.

Several pipelines end with "join a (key, value) table back onto the
stream": component labels onto polygons/lines, component sizes onto
labeled lines, chain labels onto segments. The small side is usually
bounded — when ``connected_components`` ran its driver union-find the
labels were ALREADY on the driver — yet a Ray hash join re-shuffles both
sides through one aggregator actor per partition, a fixed ~2-4 s of
exchange machinery (and the single most host-variance-exposed stage in
the bench) to look up a few thousand int64 keys.

``lookup_join`` collects the small side once (bounded by ``limit``),
``ray.put``s it sorted, and maps the stream with a vectorized
``np.searchsorted`` — no shuffle at all. Above the limit it falls back
to the distributed hash join unchanged, so callers keep one code path
and the 100 TB story stays intact (label tables from the distributed
label-propagation path can exceed any driver bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# (key, value) int64 pairs are 16 B/row: 2M rows = a 32 MB broadcast
# table, well inside one object-store slot and cheap to ship once.
BROADCAST_LOOKUP_LIMIT = 2_000_000


def lookup_join(
    ds,
    small_ds,
    key_col: str,
    *,
    small_key: str,
    value_col: str,
    out_col: str,
    default_from: str | None = None,
    limit: int = BROADCAST_LOOKUP_LIMIT,
    num_partitions: int | None = None,
):
    """Append ``out_col`` to ``ds`` by looking ``ds[key_col]`` up in
    ``small_ds[small_key] -> small_ds[value_col]`` (all int64).

    Missing keys take ``ds[default_from]`` when given (left-outer +
    coalesce semantics), else their rows drop (inner semantics).
    ``small_ds`` must be materialized or cheap to execute; it is counted
    first and collected only when ``<= limit`` rows.
    """
    from .dissolve import default_join_partitions

    small_ds = small_ds.materialize()
    n = small_ds.count()

    if n == 0:
        if default_from is not None:
            def self_default(b: pa.Table) -> pa.Table:
                return b.append_column(
                    out_col, b[default_from].cast(pa.int64())
                )

            return ds.map_batches(self_default, batch_format="pyarrow")
        # inner join with an empty right side: empty result, stream schema
        return ds.map_batches(
            lambda b: b.slice(0, 0).append_column(
                out_col, pa.array([], pa.int64())
            ),
            batch_format="pyarrow",
        )

    if n <= limit:
        import ray

        df = small_ds.to_pandas()
        keys = df[small_key].to_numpy().astype(np.int64)
        vals = df[value_col].to_numpy().astype(np.int64)
        order = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order], vals[order]))

        def bmap(b: pa.Table) -> pa.Table:
            import ray as _ray

            skeys, svals = _ray.get(ref)
            ids = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(skeys, ids)
            pos_c = np.minimum(pos, len(skeys) - 1)
            found = skeys[pos_c] == ids
            if default_from is not None:
                dflt = b[default_from].to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                out = np.where(found, svals[pos_c], dflt)
                return b.append_column(out_col, pa.array(out, pa.int64()))
            b = b.filter(pa.array(found))
            return b.append_column(
                out_col, pa.array(svals[pos_c[found]], pa.int64())
            )

        return ds.map_batches(bmap, batch_format="pyarrow")

    # scale fallback: the distributed hash join, exactly as before
    num_partitions = default_join_partitions(num_partitions)
    joined = ds.join(
        small_ds,
        join_type="left_outer" if default_from is not None else "inner",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(small_key,),
    )

    def finish(b: pa.Table) -> pa.Table:
        val = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if default_from is not None:
            dflt = b[default_from].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            out = np.where(np.isnan(val), dflt, val).astype(np.int64)
        else:
            out = val.astype(np.int64)
        drop = [
            c
            for c in (value_col, small_key)
            if c in b.column_names and c != key_col
        ]
        b = b.drop_columns(drop)
        return b.append_column(out_col, pa.array(out, pa.int64()))

    return joined.map_batches(finish, batch_format="pyarrow")


def membership_filter(
    ds,
    keys_ds,
    key_col: str,
    *,
    small_key: str | None = None,
    anti: bool = False,
    limit: int = BROADCAST_LOOKUP_LIMIT,
    num_partitions: int | None = None,
):
    """Semi (or anti) join: keep rows of ``ds`` whose ``key_col`` is (is
    not) present in ``keys_ds[small_key]``. ``keys_ds`` must carry UNIQUE
    keys (it typically comes out of a groupby) — the hash-join fallback
    would duplicate rows otherwise.

    Broadcasts the key set while bounded (int64 keys: 2M = 16 MB), so the
    big side streams through one vectorized filter instead of feeding a
    full hash-join exchange; falls back to the distributed join beyond.
    """
    from .dissolve import default_join_partitions

    small_key = small_key or key_col
    keys_ds = keys_ds.materialize()
    n = keys_ds.count()

    if n == 0:
        if anti:
            return ds
        return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")

    if n <= limit:
        import ray

        keys = np.sort(
            keys_ds.to_pandas()[small_key].to_numpy().astype(np.int64)
        )
        ref = ray.put(keys)

        def bmap(b: pa.Table) -> pa.Table:
            import ray as _ray

            skeys = _ray.get(ref)
            ids = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.minimum(np.searchsorted(skeys, ids), len(skeys) - 1)
            found = skeys[pos] == ids
            return b.filter(pa.array(~found if anti else found))

        return ds.map_batches(bmap, batch_format="pyarrow")

    num_partitions = default_join_partitions(num_partitions)
    keyed = keys_ds.map_batches(
        lambda b: pa.table({small_key: b[small_key].cast(pa.int64()),
                            "__member": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow",
    )
    joined = ds.join(
        keyed,
        join_type="left_outer" if anti else "inner",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(small_key,),
    )

    def finish(b: pa.Table) -> pa.Table:
        if anti:
            m = b["__member"].to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(np.isnan(m.astype(np.float64))))
        drop = [c for c in ("__member", small_key)
                if c in b.column_names and c != key_col]
        return b.drop_columns(drop)

    return joined.map_batches(finish, batch_format="pyarrow")
