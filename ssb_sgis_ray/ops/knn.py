"""k-nearest-neighbors join.

Reproduces the output contract of the reference's
``get_k_nearest_neighbors`` (/root/reference/src/sgis/geopandas_tools/
neighbors.py:228-382): exact k nearest points per left row, identical
points count as neighbors (distance 0), ``strict`` governs k > |neighbors|,
output columns (left_id, neighbor_id, dist2, knn_rank). Ties are broken by
ascending neighbor id (the engine's explicit determinism rule — SURVEY.md
§2.13 — replacing the reference's reliance on ball-tree ordering).

Two physical plans:

* ``knn_broadcast`` — neighbor points are ``ray.put`` once; each actor
  computes exact distances per batch (vectorized (B×N) blocks, chunked to
  bound memory). Right plan when the neighbor side fits in one object.
* ``KnnCellActor`` — neighbors binned into index-grid cells once per actor;
  per point, rings of cells are scanned outward with DISTANCE-BOUNDED
  TERMINATION: expansion stops when the next ring's minimum possible
  distance exceeds the current kth-best distance (the north rule's "H3
  k-ring expansion" plan). Exact same results, sub-linear per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..pool import broadcast_map_batches, default_pool


def _topk_block(
    px: np.ndarray,
    py: np.ndarray,
    nx: np.ndarray,
    ny: np.ndarray,
    nid: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact top-k for a block of query points vs all neighbors.

    Returns (flat row index, neighbor ids, dist2) with k entries per row,
    ties broken by neighbor id (nid must be pre-sorted ascending).
    """
    n = len(nx)
    k_eff = min(k, n)
    d2 = (
        (px[:, None].astype(np.float64) - nx[None, :]) ** 2
        + (py[:, None].astype(np.float64) - ny[None, :]) ** 2
    )
    if k_eff < n:
        part = np.argpartition(d2, k_eff - 1, axis=1)[:, :k_eff]
    else:
        part = np.broadcast_to(np.arange(n), (len(px), n)).copy()
    pd2 = np.take_along_axis(d2, part, axis=1)
    pid = nid[part]
    # sort the k candidates by (dist2, neighbor_id)
    order = np.lexsort((pid, pd2), axis=1)
    sd2 = np.take_along_axis(pd2, order, axis=1)
    sid = np.take_along_axis(pid, order, axis=1)
    rows = np.repeat(np.arange(len(px)), k_eff)
    return rows, sid.ravel(), sd2.ravel()


class KnnBroadcast:
    """Actor-pool stage: exact brute-force kNN against broadcast neighbors."""

    def __init__(self, neighbors_ref, k: int, id_col: str, x_col="px", y_col="py",
                 strict: bool = False, chunk: int = 2048):
        nb: dict = ray.get(neighbors_ref)
        order = np.argsort(nb["id"], kind="stable")
        self.nx = nb["x"][order].astype(np.float64)
        self.ny = nb["y"][order].astype(np.float64)
        self.nid = nb["id"][order]
        self.k = k
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col
        self.chunk = chunk
        if strict and k > len(self.nid):
            raise ValueError(f"k={k} > number of neighbors {len(self.nid)} (strict)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False)
        py = batch[self.y_col].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col]
        out_rows, out_nid, out_d2 = [], [], []
        for s in range(0, len(px), self.chunk):
            r, nidv, d2 = _topk_block(
                px[s : s + self.chunk], py[s : s + self.chunk],
                self.nx, self.ny, self.nid, self.k,
            )
            out_rows.append(r + s)
            out_nid.append(nidv)
            out_d2.append(d2)
        rows = np.concatenate(out_rows) if out_rows else np.empty(0, np.int64)
        k_eff = min(self.k, len(self.nid))
        rank = np.tile(np.arange(1, k_eff + 1), len(px)) if len(px) else np.empty(0, np.int64)
        return pa.table(
            {
                self.id_col: ids.take(pa.array(rows, pa.int64())),
                "neighbor_id": pa.array(np.concatenate(out_nid) if out_nid else [], pa.int64()),
                "dist2": pa.array(
                    (np.concatenate(out_d2) if out_d2 else np.empty(0)).astype(np.int64),
                    pa.int64(),
                ),
                "knn_rank": pa.array(rank, pa.int64()),
            }
        )


def knn_broadcast(
    left,
    neighbors: dict,
    k: int,
    id_col: str,
    x_col: str = "px",
    y_col: str = "py",
    strict: bool = False,
    concurrency=None,
    batch_size: int = 16384,
    nrows=None,
):
    """kNN join: ``neighbors`` is {'id','x','y'} numpy dict (small side).

    Output: (id_col, neighbor_id, dist2, knn_rank) — dist2 is squared
    euclidean distance as int64 (exact for integer coordinates).
    ``nrows``: optional left row-count hint for actor-pool sizing."""
    ref = ray.put(neighbors)
    return broadcast_map_batches(
        left,
        KnnBroadcast,
        fn_constructor_kwargs={
            "neighbors_ref": ref, "k": k, "id_col": id_col,
            "x_col": x_col, "y_col": y_col, "strict": strict,
        },
        batch_size=batch_size,
        concurrency=concurrency,
        nrows=nrows,
    )


class KnnCellActor:
    """kNN via grid binning + ring expansion with distance-bounded stop.

    Neighbors are binned into square cells of size ``cell`` once per actor.
    For each query point: scan ring 0 (own cell), then ring 1, ... keeping
    a running top-k; stop once (ring_dist_min)^2 > kth best distance, where
    ring_dist_min = (ring_index-0... ) * cell — the minimum possible
    distance from the query point to any point in the next unscanned ring.
    Exact (same results as brute force), and at uniform density each query
    touches O(k) candidates instead of O(N).
    """

    def __init__(self, neighbors_ref, k: int, id_col: str, cell: float = 1000.0,
                 x_col="px", y_col="py"):
        nb: dict = ray.get(neighbors_ref)
        order = np.argsort(nb["id"], kind="stable")
        self.nx = nb["x"][order].astype(np.float64)
        self.ny = nb["y"][order].astype(np.float64)
        self.nid = nb["id"][order]
        self.k = k
        self.cell = float(cell)
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col
        cx = np.floor(self.nx / self.cell).astype(np.int64)
        cy = np.floor(self.ny / self.cell).astype(np.int64)
        key = cx * np.int64(1 << 32) + cy
        order2 = np.argsort(key, kind="stable")
        self.sorted_key = key[order2]
        self.perm = order2
        self.uniq_keys, self.key_starts = np.unique(self.sorted_key, return_index=True)
        self.key_stops = np.append(self.key_starts[1:], len(self.sorted_key))

    def _cell_members(self, cx: int, cy: int) -> np.ndarray:
        key = np.int64(cx) * np.int64(1 << 32) + np.int64(cy)
        j = np.searchsorted(self.uniq_keys, key)
        if j < len(self.uniq_keys) and self.uniq_keys[j] == key:
            return self.perm[self.key_starts[j] : self.key_stops[j]]
        return np.empty(0, dtype=np.int64)

    def _query_cell_group(self, qx: np.ndarray, qy: np.ndarray, cx: int, cy: int):
        """All query points sharing one grid cell, processed together.

        Rings of cells are scanned outward; after each ring the (m × c)
        distance matrix gives every point's current kth-best, and expansion
        stops when ring_min² exceeds the group max of those — vectorized
        distance-bounded termination.
        """
        cand: list[np.ndarray] = []
        n_cand = 0
        kth_max = np.inf
        ring = 0
        max_ring = 1 + int(np.ceil(2.1e6 / self.cell))
        while ring <= max_ring:
            if ring > 0:
                ring_min = (ring - 1) * self.cell
                if n_cand >= self.k and ring_min * ring_min > kth_max:
                    break
            members = []
            if ring == 0:
                members.append(self._cell_members(cx, cy))
            else:
                for ix in range(cx - ring, cx + ring + 1):
                    members.append(self._cell_members(ix, cy - ring))
                    members.append(self._cell_members(ix, cy + ring))
                for iy in range(cy - ring + 1, cy + ring):
                    members.append(self._cell_members(cx - ring, iy))
                    members.append(self._cell_members(cx + ring, iy))
            m = np.concatenate(members) if members else np.empty(0, np.int64)
            if len(m):
                cand.append(m)
                n_cand += len(m)
                if n_cand >= self.k:
                    allc = np.concatenate(cand)
                    d2 = (qx[:, None] - self.nx[allc][None, :]) ** 2 + (
                        qy[:, None] - self.ny[allc][None, :]
                    ) ** 2
                    k_eff = min(self.k, d2.shape[1])
                    kth = np.partition(d2, k_eff - 1, axis=1)[:, k_eff - 1]
                    kth_max = float(kth.max())
            ring += 1
        allc = np.concatenate(cand) if cand else np.empty(0, np.int64)
        if len(allc) == 0:
            return (np.empty(0, np.int64),) * 4
        d2 = (qx[:, None] - self.nx[allc][None, :]) ** 2 + (
            qy[:, None] - self.ny[allc][None, :]
        ) ** 2
        nid = self.nid[allc]
        k_eff = min(self.k, len(allc))
        if k_eff < len(allc):
            part = np.argpartition(d2, k_eff - 1, axis=1)[:, :k_eff]
        else:
            part = np.broadcast_to(np.arange(len(allc)), (len(qx), len(allc))).copy()
        pd2 = np.take_along_axis(d2, part, axis=1)
        pid = nid[part]
        order = np.lexsort((pid, pd2), axis=1)
        sd2 = np.take_along_axis(pd2, order, axis=1)
        sid = np.take_along_axis(pid, order, axis=1)
        rows = np.repeat(np.arange(len(qx)), k_eff)
        ranks = np.tile(np.arange(1, k_eff + 1), len(qx))
        return rows, sid.ravel(), sd2.ravel(), ranks

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        qcx = np.floor(px / self.cell).astype(np.int64)
        qcy = np.floor(py / self.cell).astype(np.int64)
        key = qcx * np.int64(1 << 32) + qcy
        order = np.argsort(key, kind="stable")
        uniq, starts = np.unique(key[order], return_index=True)
        stops = np.append(starts[1:], len(order))
        out_id, out_nid, out_d2, out_rank = [], [], [], []
        for g in range(len(uniq)):
            sel = order[starts[g] : stops[g]]
            rows, nidv, d2v, ranks = self._query_cell_group(
                px[sel], py[sel], int(qcx[sel[0]]), int(qcy[sel[0]])
            )
            if len(rows) == 0:
                continue
            out_id.append(ids[sel][rows])
            out_nid.append(nidv)
            out_d2.append(d2v)
            out_rank.append(ranks)
        cat = lambda xs, dt: (np.concatenate(xs) if xs else np.empty(0)).astype(dt)
        return pa.table(
            {
                self.id_col: pa.array(cat(out_id, np.int64), pa.int64()),
                "neighbor_id": pa.array(cat(out_nid, np.int64), pa.int64()),
                "dist2": pa.array(cat(out_d2, np.int64), pa.int64()),
                "knn_rank": pa.array(cat(out_rank, np.int64), pa.int64()),
            }
        )


def knn_cells(
    left,
    neighbors: dict,
    k: int,
    id_col: str,
    cell: float = 1000.0,
    concurrency=None,
    batch_size: int = 8192,
):
    ref = ray.put(neighbors)
    return left.map_batches(
        KnnCellActor,
        fn_constructor_kwargs={"neighbors_ref": ref, "k": k, "id_col": id_col, "cell": cell},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


class KnnRankTies:
    """destination_count tie semantics (networkanalysis.py:394-397): keep
    every neighbor whose MIN-rank by distance is <= k — ties at the kth
    place are all kept, so an origin can return more than k rows
    ("might be higher than destination_count if trips have equal cost").
    rank(neighbor) = 1 + #neighbors strictly closer."""

    def __init__(self, neighbors_ref, k: int, id_col: str, x_col="px", y_col="py"):
        nb: dict = ray.get(neighbors_ref)
        self.nx = nb["x"].astype(np.float64)
        self.ny = nb["y"].astype(np.float64)
        self.nid = nb["id"].astype(np.int64)
        self.k = k
        self.id_col = id_col
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[self.y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k_eff = min(self.k, len(self.nx))
        out_id, out_nid, out_d2, out_rank = [], [], [], []
        # 512-row slabs keep the dense temporaries small (the full-matrix
        # slab + argsort version thrashed mmap page faults and looped rows
        # in Python); an element with min-rank <= k is exactly one whose
        # d2 <= the row's k-th smallest value, so O(n) partition replaces
        # the O(n log n) row sort and ranks come from run-starts over the
        # kept candidates alone (everything strictly smaller is kept too).
        for s in range(0, len(px), 512):
            d2 = (px[s:s+512, None] - self.nx[None, :]) ** 2 + (
                py[s:s+512, None] - self.ny[None, :]
            ) ** 2
            vk = np.partition(d2, k_eff - 1, axis=1)[:, k_eff - 1]
            ri, ci = np.nonzero(d2 <= vk[:, None])
            vals = d2[ri, ci]
            ord_ = np.lexsort((self.nid[ci], vals, ri))
            ri_s, vals_s, ci_s = ri[ord_], vals[ord_], ci[ord_]
            if not len(ri_s):
                continue
            idx = np.arange(len(ri_s))
            new_row = np.empty(len(ri_s), dtype=bool)
            new_row[0] = True
            new_row[1:] = ri_s[1:] != ri_s[:-1]
            new_val = np.empty(len(ri_s), dtype=bool)
            new_val[0] = True
            new_val[1:] = (vals_s[1:] != vals_s[:-1]) | new_row[1:]
            run_start = np.maximum.accumulate(np.where(new_val, idx, 0))
            row_start = np.maximum.accumulate(np.where(new_row, idx, 0))
            out_id.append(ids[s + ri_s])
            out_nid.append(self.nid[ci_s])
            out_d2.append(vals_s)
            out_rank.append(run_start - row_start + 1)
        cat = lambda xs, dt: (np.concatenate(xs) if xs else np.empty(0)).astype(dt)
        return pa.table(
            {
                self.id_col: pa.array(cat(out_id, np.int64), pa.int64()),
                "neighbor_id": pa.array(cat(out_nid, np.int64), pa.int64()),
                "dist2": pa.array(cat(out_d2, np.int64), pa.int64()),
                "tie_rank": pa.array(cat(out_rank, np.int64), pa.int64()),
            }
        )


def knn_rank_ties(left, neighbors: dict, k: int, id_col: str,
                  concurrency=None, batch_size: int = 8192):
    ref = ray.put(neighbors)
    return left.map_batches(
        KnnRankTies,
        fn_constructor_kwargs={"neighbors_ref": ref, "k": k, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
