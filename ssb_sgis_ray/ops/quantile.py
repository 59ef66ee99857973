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


def grouped_exact_quantiles(ds, group_col: str, col: str, q_pcts, groups,
                            bins: int = 1 << 16, max_rounds: int = 8):
    """Exact per-group quantiles for a SMALL KNOWN group set (per-source
    / per-language percentile thresholds — the grouped form of the
    filter cutoffs above). Rank is the integer formula
    k = (pct * n_g + 99) // 100 (1-based k-th smallest), so engine and
    SQL share no float ceil.

    Same zero-shuffle plan as exact_kth_smallest with the group as an
    extra histogram axis: each round is ONE tree-merged aggregate pass
    whose accumulator is (G x R, bins) int64 counts — every (group,
    rank) interval narrows simultaneously, so the round count is the
    WORST group's, not the sum. Driver state stays O(G*R*bins)."""
    import pandas as pd
    from ray.data.aggregate import AggregateFn

    groups = list(groups)
    q_pcts = [int(p) for p in q_pcts]
    gindex = pd.Index(groups)
    G, R = len(groups), len(q_pcts)

    def _vals(block):
        if isinstance(block, pa.Table):
            g = block[group_col].to_numpy(zero_copy_only=False)
            v = block[col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            g = block[group_col].to_numpy()
            v = block[col].to_numpy().astype(np.int64)
        gi = gindex.get_indexer(g)
        ok = gi >= 0
        return gi[ok], v[ok]

    # pass 0: per-group (min, max, count), one packed ndarray
    def mm_init(_):
        a = np.zeros((G, 3), dtype=np.int64)
        a[:, 0] = np.iinfo(np.int64).max
        a[:, 1] = np.iinfo(np.int64).min
        return a

    def mm_acc(a, block):
        gi, v = _vals(block)
        if len(v) == 0:
            return a
        out = a.copy()
        np.minimum.at(out[:, 0], gi, v)
        np.maximum.at(out[:, 1], gi, v)
        np.add.at(out[:, 2], gi, 1)
        return out

    def mm_merge(a, b):
        return np.column_stack([
            np.minimum(a[:, 0], b[:, 0]),
            np.maximum(a[:, 1], b[:, 1]),
            a[:, 2] + b[:, 2],
        ])

    mm = ds.aggregate(AggregateFn(init=mm_init, merge=mm_merge,
                                  name="gmm", accumulate_block=mm_acc))["gmm"]
    lo = np.repeat(mm[:, 0], R)                      # (G*R,)
    hi = np.repeat(mm[:, 1], R)
    ng = np.repeat(mm[:, 2], R)
    pct = np.tile(np.asarray(q_pcts, np.int64), G)
    resid = (pct * ng + 99) // 100                   # 1-based residual rank
    present = ng > 0
    done = ~present
    lo[~present], hi[~present] = 0, 0

    for _ in range(max_rounds):
        if (lo >= hi).all():
            break
        width = np.maximum((hi - lo + 1 + bins - 1) // bins, 1)

        def h_init(_):
            return np.zeros((G * R, bins), dtype=np.int64)

        def h_acc(acc, block, lo=lo.copy(), hi=hi.copy(), width=width.copy()):
            gi, v = _vals(block)
            if len(v) == 0:
                return acc
            out = acc.copy()
            for r in range(R):
                slot = gi * R + r
                b = (v - lo[slot]) // width[slot]
                ok = (v >= lo[slot]) & (v <= hi[slot])
                b = np.clip(b, 0, bins - 1)
                np.add.at(out, (slot[ok], b[ok]), 1)
            return out

        def h_merge(a, b):
            return a + b

        counts = ds.aggregate(AggregateFn(
            init=h_init, merge=h_merge, name="gh",
            accumulate_block=h_acc))["gh"]
        cum = counts.cumsum(axis=1)
        for s in range(G * R):
            if done[s] or lo[s] >= hi[s]:
                continue
            binpos = int(np.searchsorted(cum[s], resid[s], side="left"))
            before = int(cum[s][binpos - 1]) if binpos else 0
            resid[s] = resid[s] - before
            lo_s = lo[s] + binpos * width[s]
            hi_s = min(int(hi[s]), int(lo_s + width[s] - 1))
            lo[s], hi[s] = lo_s, hi_s

    out_g, out_p, out_v = [], [], []
    for i, g in enumerate(groups):
        for r, p in enumerate(q_pcts):
            s = i * R + r
            if mm[i, 2] == 0:
                continue
            out_g.append(g)
            out_p.append(p)
            out_v.append(int(lo[s]))
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "q_pct": pa.array(out_p, pa.int64()),
        "value": pa.array(out_v, pa.int64()),
    })
