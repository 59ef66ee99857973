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


GOLDEN64 = 0x9E3779B97F4A7C15


def mixture_sample(sources):
    """Deterministic multi-source mixture: each source keeps rows at its
    own rate and the streams union into one tagged corpus — the
    dataset-mixing step of a pretraining pipeline (e.g. 50% web, 12.5%
    code), reproducible across cluster sizes, block layouts and retries.

    ``sources`` is a list of (name, ds, id_col, num, den): a row survives
    iff mix64(id + (i+1)*GOLDEN64 mod 2^64) % den < num, where i is the
    source position — the salt decorrelates the per-source coin flips so
    a row id shared by two sources doesn't live or die in both. Output:
    (source: string, rec_id: int64). Pure per-batch filters + union — no
    shuffle, no driver state; expected composition error is O(1/sqrt(n))
    per source like any hash sample.
    """

    if not sources:
        raise ValueError("mixture_sample needs at least one source")
    legs = []
    for i, (name, ds, id_col, num, den) in enumerate(sources):
        salt = np.uint64(((i + 1) * GOLDEN64) % (1 << 64))

        def leg(b: pa.Table, _name=name, _id=id_col, _salt=salt,
                _num=num, _den=den) -> pa.Table:
            ids = b[_id].to_numpy(zero_copy_only=False).astype(np.int64)
            h = _hash64(ids.view(np.uint64) + _salt)
            keep = (h % np.uint64(_den)) < np.uint64(_num)
            return pa.table({
                "source": pa.array(np.full(int(keep.sum()), _name,
                                           dtype=object), pa.string()),
                "rec_id": pa.array(ids[keep], pa.int64()),
            })

        legs.append(ds.map_batches(leg, batch_format="pyarrow"))
    out = legs[0]
    for ds2 in legs[1:]:
        out = out.union(ds2)
    return out
