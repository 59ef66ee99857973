"""Distributed EXACT quantiles (k-th smallest) via histogram refinement.

One streaming aggregate pass per round: every block bincounts its values
into ``bins`` equal-width sub-intervals of each rank's current candidate
interval; Ray's aggregate tree merges the (n_ranks, bins) count matrices,
and the driver — holding only that matrix — narrows each rank to the
sub-interval containing its residual rank. Integer intervals collapse to
a single value within ceil(log_bins(range)) rounds: ONE round for any
column whose value range fits ``bins`` (token counts, scores), two for
any 32-bit range. There is no shuffle anywhere and no per-node state
beyond the O(n_ranks * bins) int64 accumulator, so the plan is identical
on a 256-node cluster: rounds × (one map-combine pass over the blocks).

This is the exact-selection path a training-data pipeline needs for
percentile thresholds (e.g. "drop documents below the p10 token count"):
approximate sketches (t-digest/KLL) trade exactness for one pass, but a
threshold that feeds a reproducible filter must be exact — the
rank-based definition here (k = ceil(q*n), 1-based k-th smallest) is the
same value ``ORDER BY col LIMIT 1 OFFSET k-1`` returns in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _col_values(block, col: str) -> np.ndarray:
    if isinstance(block, pa.Table):
        return block[col].to_numpy(zero_copy_only=False).astype(np.int64)
    return block[col].to_numpy().astype(np.int64)


def exact_kth_smallest(
    ds, col: str, ranks=None, qs=None, bins: int = 1 << 16, max_rounds: int = 8
) -> np.ndarray:
    """Exact k-th smallest values of int64 column ``col``, one per rank.

    ``ranks`` are 1-based global ranks (k=1 -> min, k=n -> max);
    alternatively pass quantile fractions ``qs`` and ranks resolve to
    ceil(q*n) against the row count from the same first pass. Runs
    1 + ceil(log_bins(range)) full passes over ``ds`` (materialize a
    narrow projection first when several rounds are in play). Driver
    state: (n_ranks, bins) int64 only.
    """
    from ray.data.aggregate import AggregateFn

    if (ranks is None) == (qs is None):
        raise ValueError("pass exactly one of ranks / qs")

    def mm_init(_):
        return (np.iinfo(np.int64).max, np.iinfo(np.int64).min, 0)

    def mm_acc(a, block):
        v = _col_values(block, col)
        if len(v) == 0:
            return a
        return (min(a[0], int(v.min())), max(a[1], int(v.max())), a[2] + len(v))

    def mm_merge(a, b):
        return (min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2])

    gmin, gmax, n = ds.aggregate(
        AggregateFn(init=mm_init, merge=mm_merge, name="mm", accumulate_block=mm_acc)
    )["mm"]
    if n == 0:
        raise ValueError("exact_kth_smallest on an empty dataset")
    if qs is not None:
        ranks = np.maximum(
            np.ceil(np.asarray(list(qs), dtype=np.float64) * n), 1
        ).astype(np.int64)
    else:
        ranks = np.asarray(list(ranks), dtype=np.int64)
    if (ranks < 1).any():
        raise ValueError("ranks are 1-based and must be >= 1")
    if (ranks > n).any():
        raise ValueError(f"rank beyond row count {n}")

    # per-rank candidate state: [lo, hi] interval + residual rank within it
    lo = np.full(len(ranks), gmin, dtype=np.int64)
    hi = np.full(len(ranks), gmax, dtype=np.int64)
    res = ranks.copy()
    out = np.zeros(len(ranks), dtype=np.int64)
    done = np.zeros(len(ranks), dtype=bool)

    for _ in range(max_rounds):
        if done.all():
            return out
        act = np.nonzero(~done)[0]
        widths = [
            int(-((hi[i] - lo[i] + 1) // -bins)) for i in act  # ceil-div
        ]
        intervals = [(int(lo[i]), int(hi[i])) for i in act]

        def h_init(_):
            return np.zeros((len(act), bins), dtype=np.int64)

        def h_acc(acc, block, intervals=intervals, widths=widths):
            v = _col_values(block, col)
            if len(v) == 0:
                return acc
            for j, ((l, h), w) in enumerate(zip(intervals, widths)):
                m = (v >= l) & (v <= h)
                if m.any():
                    idx = (v[m] - l) // w
                    acc[j] += np.bincount(idx, minlength=bins)
            return acc

        def h_merge(a, b):
            return a + b

        counts = ds.aggregate(
            AggregateFn(
                init=h_init, merge=h_merge, name="hist", accumulate_block=h_acc
            )
        )["hist"]
        for j, i in enumerate(act):
            cum = np.cumsum(counts[j])
            b_idx = int(np.searchsorted(cum, res[i], side="left"))
            below = int(cum[b_idx - 1]) if b_idx > 0 else 0
            w = widths[j]
            new_lo = lo[i] + b_idx * w
            if w == 1:
                out[i] = new_lo
                done[i] = True
            else:
                res[i] -= below
                lo[i] = new_lo
                hi[i] = min(int(hi[i]), int(new_lo + w - 1))
    raise RuntimeError(
        f"exact_kth_smallest did not converge in {max_rounds} rounds "
        f"(range {gmax - gmin}, bins {bins})"
    )


def exact_quantiles(ds, col: str, qs, bins: int = 1 << 16) -> np.ndarray:
    """Exact rank-based quantiles: value at 1-based rank ceil(q*n)."""
    return exact_kth_smallest(ds, col, qs=qs, bins=bins)
