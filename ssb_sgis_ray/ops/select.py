"""Token-budget data selection: best documents per key under a weight
budget, exact and shuffle-free.

The data-selection step of a pretraining pipeline: "per source, take the
highest-quality documents until the token budget is spent". The rule is
rank-based — order per key by (quality DESC, id ASC); a document is
SELECTED iff the total weight of strictly-better documents is < budget
(the exclusive-prefix rule, exactly SQL's
``sum(w) OVER (... ORDER BY q DESC, id) - w < budget``).

A distributed sort + windowed cumsum would pay a full shuffle. This
plan never shuffles the corpus:

1. **Quality histogram pass** — per-batch partial (key, quality)
   weight sums (the map-side combine); the merged table is bounded by
   |keys| x |distinct quality scores| (scores are small-range integers
   by design — bucket coarser at deployment scale if not), so the
   driver holds it whole. Cumulative sums down the quality axis decide
   each (key, quality) bucket: wholly selected, wholly rejected, or
   THE boundary bucket of its key (at most one per key).
2. **Boundary refinement** — the cutoff id inside each boundary bucket
   is found by weighted histogram refinement over the id axis (one
   aggregate pass per round, all keys refined simultaneously,
   ceil(log_bins(id_range)) rounds; same machinery as
   ops/quantile.exact_kth_smallest, weighted). Driver state stays
   O(keys x bins).
3. **Decision broadcast** — the (key, quality) -> {all, none,
   id <= cutoff} table ships once via ray.put and the corpus streams
   through one vectorized filter pass.

Determinism: pure function of (key, quality, weight, id); no RNG, no
block-order dependence. Ties are impossible (ids unique).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BINS = 4096
HISTOGRAM_LIMIT = 4_000_000  # (key, quality) universe guard


def _col(block, c):
    v = block[c]
    if isinstance(block, pa.Table):
        return v.to_numpy(zero_copy_only=False)
    return v.to_numpy()


def budget_select(ds, budget: int, key_col: str, quality_col: str,
                  weight_col: str, id_col: str,
                  histogram_limit: int = HISTOGRAM_LIMIT):
    """Return (key_col, id_col) rows of the selected documents.

    ``ds`` must carry integer quality/weight/id columns (weights >= 0).
    ``budget`` is per key. See module docstring for the plan.
    """
    import ray
    from ray.data.aggregate import Sum

    # ---- pass 1: (key, quality) weight histogram -------------------
    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b[[key_col, quality_col, weight_col]]
             .groupby([key_col, quality_col], as_index=False)[weight_col]
             .sum())
        return g

    partials = ds.map_batches(
        hist_partial, batch_format="pandas", batch_size=8192
    ).materialize()
    if partials.count() <= 4 * histogram_limit:
        # driver sum: partials are unique per batch, so their total is
        # bounded by (key x quality universe) x batches — the groupby
        # exchange is pure fixed machinery at that size (same rule as
        # duplicated_spans / tile_pyramid)
        hdf = (partials.to_pandas()
               .groupby([key_col, quality_col], as_index=False)[weight_col]
               .sum().rename(columns={weight_col: "w"}))
        if len(hdf) > histogram_limit:
            raise ValueError(
                "quality histogram exceeds the driver envelope "
                f"({len(hdf)} > {histogram_limit}); coarsen the quality "
                "score (bucket it) — the plan needs a bounded "
                "(key, quality) universe"
            )
    else:
        hist = (
            partials.groupby([key_col, quality_col])
            .aggregate(Sum(on=weight_col, alias_name="w"))
            .materialize()
        )
        if hist.count() > histogram_limit:
            raise ValueError(
                "quality histogram exceeds the driver envelope "
                f"({hist.count()} > {histogram_limit}); coarsen the "
                "quality score (bucket it) — the plan needs a bounded "
                "(key, quality) universe"
            )
        hdf = hist.to_pandas()
    keys = np.sort(hdf[key_col].unique())
    key_ix = pd.Index(keys)

    # per (key, quality): weight of strictly-better quality buckets
    hdf = hdf.sort_values([key_col, quality_col],
                          ascending=[True, False], kind="stable")
    kcodes = key_ix.get_indexer(hdf[key_col])
    wv = hdf["w"].to_numpy().astype(np.int64)
    cum = np.cumsum(wv)
    starts = np.r_[True, kcodes[1:] != kcodes[:-1]]
    base = np.where(starts, 0, np.r_[0, cum[:-1]])
    # exclusive prefix per key down the quality axis
    key_start_cum = np.maximum.accumulate(np.where(starts, np.r_[0, cum[:-1]], -1))
    before = np.r_[0, cum[:-1]] - key_start_cum
    before[starts] = 0
    del base

    qv = hdf[quality_col].to_numpy().astype(np.int64)
    # decision per (key, quality): 2 all, 0 none, 1 boundary.
    # all_in must be STRICT: at before + wv == budget a zero-weight doc
    # sorted after the bucket's weight has exclusive prefix == budget and
    # is NOT selected — equality cases route through the boundary
    # refinement, whose side='left' searchsorted lands the cut on the
    # last positive-weight id (zero-weight tails correctly excluded)
    all_in = (before + wv) < budget
    none_in = before >= budget
    code = np.where(all_in, 2, np.where(none_in, 0, 1)).astype(np.int64)
    bnd = np.flatnonzero(code == 1)  # at most one per key
    residual = (budget - before[bnd]).astype(np.int64)
    bnd_key = kcodes[bnd]
    bnd_q = qv[bnd]

    qmin, qmax = int(qv.min()), int(qv.max())
    span = qmax - qmin + 1

    # ---- pass 2 (rounds): weighted id refinement for boundary buckets
    cut_id = np.full(len(bnd), np.iinfo(np.int64).max, dtype=np.int64)
    if len(bnd):
        from ray.data.aggregate import AggregateFn

        # Project + filter the corpus to boundary-bucket rows ONCE (three
        # int64 columns, bounded by the boundary buckets — at most one
        # quality bucket per key). Every refinement round then aggregates
        # over this materialized projection instead of re-executing the
        # full upstream pipeline per round.
        bnd_pk = bnd_key * span + (bnd_q - qmin)
        bord = np.argsort(bnd_pk, kind="stable")
        bnd_pk_sorted = bnd_pk[bord]
        inv_bord = np.empty(len(bnd), dtype=np.int64)
        inv_bord[bord] = np.arange(len(bnd))
        bref = ray.put((keys, bnd_pk_sorted, qmin, span))

        class BoundaryProject:
            def __init__(self):
                self.keys, self.bpk, self.qmin, self.span = ray.get(bref)
                self.kix = pd.Index(self.keys)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                kc = self.kix.get_indexer(b[key_col]).astype(np.int64)
                q = b[quality_col].to_numpy().astype(np.int64)
                pk = kc * self.span + (q - self.qmin)
                pos = np.searchsorted(self.bpk, pk)
                pos_c = np.minimum(pos, len(self.bpk) - 1)
                m = (kc >= 0) & (self.bpk[pos_c] == pk)
                return pd.DataFrame({
                    "_bix": pos_c[m],
                    "_id": b[id_col].to_numpy().astype(np.int64)[m],
                    "_w": b[weight_col].to_numpy().astype(np.int64)[m],
                })

        boundary = ds.map_batches(
            BoundaryProject, batch_format="pandas", batch_size=8192,
            concurrency=(1, 8),
        ).materialize()

        nb = len(bnd)

        def mm_init(_):
            a = np.empty((2, nb), dtype=np.int64)
            a[0] = np.iinfo(np.int64).max
            a[1] = np.iinfo(np.int64).min
            return a

        def mm_acc(a, block):
            bix = _col(block, "_bix")
            i = _col(block, "_id")
            np.minimum.at(a[0], bix, i)
            np.maximum.at(a[1], bix, i)
            return a

        def mm_merge(a, b):
            return np.stack([np.minimum(a[0], b[0]), np.maximum(a[1], b[1])])

        mm = boundary.aggregate(AggregateFn(
            init=mm_init, merge=mm_merge, name="mm", accumulate_block=mm_acc
        ))["mm"]
        lo_v = mm[0][inv_bord].copy()   # back to bnd order
        hi_v = mm[1][inv_bord] + 1      # half-open
        res = residual.copy()

        while True:
            width = hi_v - lo_v
            if (width <= 1).all():
                break
            bw = np.maximum((width + BINS - 1) // BINS, 1)
            lo_s, hi_s, bw_s = lo_v[bord], hi_v[bord], bw[bord]

            def h_init(_):
                return np.zeros(nb * BINS, dtype=np.int64)

            def h_acc(a, block, lo_s=lo_s, hi_s=hi_s, bw_s=bw_s):
                bix = _col(block, "_bix")
                i = _col(block, "_id")
                w = _col(block, "_w")
                m = (i >= lo_s[bix]) & (i < hi_s[bix])
                if m.any():
                    bix, i, w = bix[m], i[m], w[m]
                    slot = bix * BINS + (i - lo_s[bix]) // bw_s[bix]
                    a += np.bincount(slot, weights=w, minlength=nb * BINS
                                     ).astype(np.int64)
                return a

            def h_merge(a, b):
                return a + b

            h = boundary.aggregate(AggregateFn(
                init=h_init, merge=h_merge, name="h",
                accumulate_block=h_acc,
            ))["h"].reshape(nb, BINS)[inv_bord]
            csum = np.cumsum(h, axis=1)
            for bix in range(len(bnd)):
                if hi_v[bix] - lo_v[bix] <= 1:
                    continue
                # first bucket whose cumulative weight reaches res
                j = int(np.searchsorted(csum[bix], res[bix], side="left"))
                j = min(j, BINS - 1)
                consumed = int(csum[bix, j - 1]) if j else 0
                res[bix] -= consumed
                lo_v[bix] = lo_v[bix] + j * bw[bix]
                hi_v[bix] = min(hi_v[bix], lo_v[bix] + bw[bix])
        # interval collapsed to one id: it is the crossing doc -> selected
        # (its exclusive prefix is residual-consumed < budget)
        cut_id = lo_v

    # ---- pass 3: decision broadcast + stream filter ----------------
    packed = kcodes * span + (qv - qmin)
    order = np.argsort(packed, kind="stable")
    dec_keys = packed[order]
    dec_code = code[order]
    dec_cut = np.full(len(packed), np.iinfo(np.int64).max, dtype=np.int64)
    if len(bnd):
        pos = np.searchsorted(dec_keys, bnd_key * span + (bnd_q - qmin))
        dec_cut[pos] = cut_id
    ref = ray.put((keys, dec_keys, dec_code, dec_cut, qmin, span))

    class SelectStage:
        def __init__(self):
            (self.keys, self.dk, self.dc, self.dt, self.qmin,
             self.span) = ray.get(ref)
            self.kix = pd.Index(self.keys)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            kc = self.kix.get_indexer(b[key_col]).astype(np.int64)
            q = b[quality_col].to_numpy().astype(np.int64)
            i = b[id_col].to_numpy().astype(np.int64)
            pk = kc * self.span + (q - self.qmin)
            pos = np.searchsorted(self.dk, pk)
            pos = np.minimum(pos, len(self.dk) - 1)
            found = (kc >= 0) & (self.dk[pos] == pk)
            c = np.where(found, self.dc[pos], 0)
            t = np.where(found, self.dt[pos], -1)
            sel = (c == 2) | ((c == 1) & (i <= t))
            out = b.loc[sel, [key_col, id_col]]
            return out

    return ds.map_batches(SelectStage, batch_format="pandas",
                          batch_size=8192, concurrency=(1, 8))
