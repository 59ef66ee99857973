"""Deterministic distributed sampling.

Training-data pipelines need REPRODUCIBLE samples: the same per-key
quota regardless of cluster size, block layout, retries, or execution
order — properties a seeded RNG over a streaming Dataset does not have.
The ranking key is mix64(id) (the murmur-style finalizer shared with
the HLL sketch), so "random" order is a pure function of the row id:
every worker, every run, every cluster agrees.

``stratified_sample``: the ``n`` rows with smallest (mix64(id), id) per
key. Map-side partial top-n bounds the shuffle to <= n rows per
(key, batch) — the pre-aggregate discipline every wide op here follows.
Reference parity: sgis exposes pandas ``sample``-style helpers; this is
the scale-shaped, deterministic equivalent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketch import _hash64


def _topn_per_key(k: np.ndarray, i: np.ndarray, n: int):
    """Indices of the n smallest (mix64(i), i) rows per key (k sorted
    groups not required). Fully vectorized: lexsort + run-start ranks."""
    h = _hash64(i.astype(np.int64).view(np.uint64).copy())
    order = np.lexsort((i, h, k))
    ks = k[order]
    new = np.r_[True, ks[1:] != ks[:-1]]
    starts = np.flatnonzero(new)
    rank = np.arange(len(ks)) - starts[np.cumsum(new) - 1]
    return order[rank < n]


def stratified_sample(ds, key_col: str, id_col: str, n_per_key: int):
    """Per-key deterministic sample of ``n_per_key`` rows.

    Two stages, both the same kernel: a per-batch partial top-n (the
    only stage that sees full data; its output is <= n rows per key per
    batch) and a per-key final top-n after one narrow int64-keyed
    groupby. min-of-mins == global min, so composing partials is exact.
    """

    def partial(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _topn_per_key(k, i, n_per_key)
        return pa.table(
            {
                key_col: pa.array(k[keep], pa.int64()),
                id_col: pa.array(i[keep], pa.int64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy().astype(np.int64)
        i = g[id_col].to_numpy().astype(np.int64)
        keep = _topn_per_key(k, i, n_per_key)
        return pd.DataFrame({key_col: k[keep], id_col: i[keep]})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(final, batch_format="pandas")
    )
