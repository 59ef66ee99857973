"""General relational operators (aggregation with partial pre-aggregation).

The engine's wide aggregates follow the pre-aggregate pattern: a
``map_batches`` stage combines rows to one partial row per key per batch
(C-speed pandas groupby inside the batch), then a small
``groupby().aggregate(Sum(...))`` merges partials — so the all-to-all
shuffle moves one row per (key, batch) instead of every input row.

Money/metric math is done in scaled int64 (cents) on BOTH the engine and
the DuckDB oracle side, so float summation order can never flip a value:
``cents = round(price * 100)`` is exact because prices carry 2 decimals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def lineitem_enrich(batch: pa.Table) -> pa.Table:
    """Add exact scaled-int measure columns to lineitem."""
    price_c = np.round(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    disc100 = np.round(batch["l_discount"].to_numpy() * 100).astype(np.int64)
    tax100 = np.round(batch["l_tax"].to_numpy() * 100).astype(np.int64)
    qty = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
    t = batch.append_column("qty_i", pa.array(qty, pa.int64()))
    t = t.append_column("price_c", pa.array(price_c, pa.int64()))
    # revenue in 1e-4 units: cents * (100 - disc100)
    t = t.append_column("revenue_c4", pa.array(price_c * (100 - disc100), pa.int64()))
    t = t.append_column(
        "charge_c6",
        pa.array(price_c * (100 - disc100) * (100 + tax100), pa.int64()),
    )
    return t


def partial_sum_stage(keys: list[str], sums: list[str]):
    """Build a map_batches fn computing per-batch partial sums + count."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False)[sums].sum()
        cnt = batch.groupby(keys, as_index=False, sort=False).size()
        out = g.merge(cnt, on=keys)
        out = out.rename(columns={"size": "n_rows"})
        return out

    return fn


def grouped_sums(ds, keys: list[str], sums: list[str], driver_merge_limit: int = 2_000_000):
    """Pre-aggregated grouped sum: partial per batch, then merge.

    The partial stage bounds the merge input to (#keys × #batches) rows, so
    the final combine is a driver-side pandas groupby when that stays under
    ``driver_merge_limit`` (this sandbox's Ray multi-key groupby carries a
    ~12 s fixed shuffle overhead even on a handful of rows); the
    distributed groupby path remains for genuinely high-cardinality keys.
    """
    import pyarrow as _pa

    partials = ds.map_batches(
        partial_sum_stage(keys, sums), batch_format="pandas", batch_size=65536
    )
    pm = partials.materialize()
    if pm.count() <= driver_merge_limit:
        df = pm.to_pandas()
        out = df.groupby(keys, as_index=False)[sums + ["n_rows"]].sum()
        return _pa.Table.from_pandas(out, preserve_index=False)
    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=c) for c in sums] + [Sum("n_rows", alias_name="n_rows")]
    return pm.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*aggs)


def events_enrich(batch: pa.Table) -> pa.Table:
    """Add exact hour bucket (epoch hours) + scaled value to events."""
    ts = batch["ts"].cast(pa.int64()).to_numpy()  # microseconds since epoch
    hour = ts // 3_600_000_000
    value_c = np.round(batch["value"].to_numpy() * 100).astype(np.int64)
    t = batch.append_column("hour_epoch", pa.array(hour, pa.int64()))
    return t.append_column("value_c", pa.array(value_c, pa.int64()))


SESSION_GAP_US = 1_800_000_000  # 30 min


def sessionize_user(g: pd.DataFrame) -> pd.DataFrame:
    """Session windows per user: a gap > 30 min starts a new session.

    The engine's stream-shaped pattern (no event-time runtime in Ray Data):
    events are an ordered, partitioned log — partition by user, sort by ts
    within the group, sessionize with vectorized pandas. Emits one row per
    session: (user_id, session_no, n_events, start_us, end_us).
    """
    ts = np.sort(g["ts_us"].to_numpy())
    new_session = np.ones(len(ts), dtype=np.int64)
    new_session[1:] = (np.diff(ts) > SESSION_GAP_US).astype(np.int64)
    sid = np.cumsum(new_session)
    out = pd.DataFrame({"ts_us": ts, "session_no": sid})
    agg = out.groupby("session_no", as_index=False).agg(
        n_events=("ts_us", "size"), start_us=("ts_us", "min"), end_us=("ts_us", "max")
    )
    agg.insert(0, "user_id", g["user_id"].iloc[0])
    return agg


def sessionize(events_ds):
    """events -> session windows: groupby(user).map_groups(sessionize)."""

    def add_ts_us(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        return pa.table({"user_id": batch["user_id"], "ts_us": ts})

    prepared = events_ds.map_batches(add_ts_us, batch_format="pyarrow")
    return prepared.groupby("user_id").map_groups(
        sessionize_user, batch_format="pandas"
    )
