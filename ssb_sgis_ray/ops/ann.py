"""Approximate-nearest-neighbor search over an embedding column.

* ``ann_bruteforce`` — exact cosine top-k: the query matrix (small) is
  broadcast once; each actor normalizes it in ``__init__`` and does one
  (batch × dim) @ (dim × q) matmul per batch, then a per-batch partial
  top-k; a final global top-k per query runs on the small union of
  partials. This is the baseline and the verifier for approximate paths.
* ``IvfIndex`` / ``ann_ivf`` — IVF-flat scale path: deterministic k-means
  (fixed seed, Lloyd iterations on a driver-side sample), then each batch
  row is assigned to its nearest centroid list; queries probe the
  ``nprobe`` nearest lists. With nprobe == n_lists results are exact.

All similarity math is float64; outputs carry (query_id, vec_id, rank)
with rank ties broken by vec_id ascending so results are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..pool import default_pool


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column -> (n, d) float64, zero-copy where possible."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        # reshape(0, -1) raises on a zero-row block (e.g. a filtered-empty
        # partition); callers guard on len(m) == 0
        return np.zeros((0, 0), dtype=np.float64)
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return values.reshape(n, -1)


class BruteForceTopK:
    """Actor stage: per-batch partial top-k cosine vs broadcast queries.

    Emits (query_id, vec_id, sim) candidates — k per query per batch; the
    final exact top-k happens in a small driver-side/groupby finalize.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 col: str = "embedding"):
        q = ray.get(queries_ref)
        self.qids = q["id"].astype(np.int64)
        self.qm = _normalize(q["matrix"].astype(np.float64))  # (q, d)
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(batch, self.col))  # (n, d)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = m @ self.qm.T  # (n, q)
        k_eff = min(self.k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            s = sims[:, qi]
            if k_eff < len(ids):
                part = np.argpartition(-s, k_eff - 1)[:k_eff]
            else:
                part = np.arange(len(ids))
            out_q.append(np.full(len(part), self.qids[qi]))
            out_v.append(ids[part])
            out_s.append(s[part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def _finalize_topk(g: pd.DataFrame, k: int) -> pd.DataFrame:
    g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["ann_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def ann_bruteforce(vectors_ds, queries: dict, k: int,
                   id_col: str = "vec_id", col: str = "embedding",
                   concurrency=None, batch_size: int = 8192):
    """Exact cosine top-k join. queries = {'id': (q,), 'matrix': (q, d)}.

    Output: (query_id, vec_id, sim, ann_rank) — k rows per query.
    """
    ref = ray.put(queries)
    partials = vectors_ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "id_col": id_col, "col": col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: _finalize_topk(g, k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# IVF-flat
# ---------------------------------------------------------------------------


def kmeans_fit(sample: np.ndarray, n_lists: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means on a sample (fixed RandomState init)."""
    rng = np.random.RandomState(7)
    sample = _normalize(sample.astype(np.float64))
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        sims = sample @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IvfPartialTopK:
    """Actor stage: per-batch top-k restricted to probed IVF lists."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int,
                 id_col: str = "vec_id", col: str = "embedding"):
        q = ray.get(queries_ref)
        self.qids = q["id"].astype(np.int64)
        self.qm = _normalize(q["matrix"].astype(np.float64))
        self.cent = ray.get(centroids_ref)  # (L, d), normalized
        self.k = k
        self.nprobe = min(nprobe, len(self.cent))
        self.id_col = id_col
        self.col = col
        # lists each query probes: top-nprobe centroid sims
        qc = self.qm @ self.cent.T  # (q, L)
        self.probe = np.argsort(-qc, axis=1)[:, : self.nprobe]  # (q, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(batch, self.col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assign = (m @ self.cent.T).argmax(axis=1)  # list id per vector
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            probe_set = self.probe[qi]
            mask = np.isin(assign, probe_set)
            if not mask.any():
                continue
            s = m[mask] @ self.qm[qi]
            sel_ids = ids[mask]
            k_eff = min(self.k, len(sel_ids))
            part = np.argpartition(-s, k_eff - 1)[:k_eff] if k_eff < len(sel_ids) else np.arange(len(sel_ids))
            out_q.append(np.full(len(part), self.qids[qi]))
            out_v.append(sel_ids[part])
            out_s.append(s[part])
        cat = lambda xs, dt: (np.concatenate(xs) if xs else np.empty(0)).astype(dt)
        return pa.table(
            {
                "query_id": pa.array(cat(out_q, np.int64), pa.int64()),
                "vec_id": pa.array(cat(out_v, np.int64), pa.int64()),
                "sim": pa.array(cat(out_s, np.float64), pa.float64()),
            }
        )


def ann_ivf(vectors_ds, queries: dict, k: int, centroids: np.ndarray,
            nprobe: int = 4, id_col: str = "vec_id", col: str = "embedding",
            concurrency=None, batch_size: int = 8192):
    """IVF-flat ANN. ``centroids`` from kmeans_fit on a driver-side sample.

    nprobe == len(centroids) reproduces brute-force exactly (used in tests
    to prove the plumbing); smaller nprobe trades recall for speed.
    """
    qref = ray.put(queries)
    cref = ray.put(_normalize(centroids.astype(np.float64)))
    partials = vectors_ds.map_batches(
        IvfPartialTopK,
        fn_constructor_kwargs={
            "queries_ref": qref, "centroids_ref": cref, "k": k,
            "nprobe": nprobe, "id_col": id_col, "col": col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: _finalize_topk(g, k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# LSH (signed random projections) — the other classic ANN bucket scheme
# ---------------------------------------------------------------------------


def lsh_planes(dim: int, n_tables: int = 4, n_bits: int = 8,
               seed: int = 11) -> np.ndarray:
    """Deterministic random-hyperplane family, shape (T, bits, dim).

    Each table hashes a vector to an ``n_bits``-bit code: bit b is the
    sign of the projection onto plane (t, b). Vectors with high cosine
    similarity collide in at least one table with high probability
    (P[bit match] = 1 - theta/pi per Goemans-Williamson)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_bits, dim))
    return planes / np.linalg.norm(planes, axis=2, keepdims=True)


def _lsh_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) normalized vectors -> (n, T) packed int64 sign codes."""
    n_tables, n_bits, _ = planes.shape
    codes = np.zeros((len(m), n_tables), dtype=np.int64)
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    for t in range(n_tables):
        bits = (m @ planes[t].T) > 0  # (n, bits)
        codes[:, t] = bits @ weights
    return codes


def _hamming_ball(code: int, n_bits: int, radius: int) -> np.ndarray:
    """All codes within Hamming distance <= radius of ``code``, sorted."""
    from itertools import combinations

    out = [code]
    for r in range(1, min(radius, n_bits) + 1):
        for flips in combinations(range(n_bits), r):
            c = code
            for b in flips:
                c ^= 1 << b
            out.append(c)
    return np.unique(np.array(out, dtype=np.int64))


class LshPartialTopK:
    """Actor stage: per-batch top-k restricted to LSH bucket collisions.

    A vector is a candidate for a query iff in ANY table its code lies
    within Hamming distance ``radius`` of the query's code (multi-probe).
    ``radius == n_bits`` probes every bucket and reproduces brute force
    exactly — the same plumbing proof convention as IvfPartialTopK with
    nprobe == n_lists."""

    def __init__(self, queries_ref, planes_ref, k: int, radius: int,
                 id_col: str = "vec_id", col: str = "embedding"):
        q = ray.get(queries_ref)
        self.qids = q["id"].astype(np.int64)
        self.qm = _normalize(q["matrix"].astype(np.float64))
        self.planes = ray.get(planes_ref)  # (T, bits, d)
        self.k = k
        self.id_col = id_col
        self.col = col
        n_bits = self.planes.shape[1]
        qcodes = _lsh_codes(self.qm, self.planes)  # (q, T)
        # probe sets: per (query, table) the sorted Hamming ball
        self.probe = [
            [_hamming_ball(int(qcodes[qi, t]), n_bits, radius)
             for t in range(self.planes.shape[0])]
            for qi in range(len(self.qids))
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(batch, self.col))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _lsh_codes(m, self.planes)  # (n, T)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.qids)):
            mask = np.zeros(len(m), dtype=bool)
            for t in range(self.planes.shape[0]):
                mask |= np.isin(codes[:, t], self.probe[qi][t])
            if not mask.any():
                continue
            s = m[mask] @ self.qm[qi]
            sel_ids = ids[mask]
            k_eff = min(self.k, len(sel_ids))
            part = (
                np.argpartition(-s, k_eff - 1)[:k_eff]
                if k_eff < len(sel_ids)
                else np.arange(len(sel_ids))
            )
            out_q.append(np.full(len(part), self.qids[qi]))
            out_v.append(sel_ids[part])
            out_s.append(s[part])
        cat = lambda xs, dt: (np.concatenate(xs) if xs else np.empty(0)).astype(dt)
        return pa.table(
            {
                "query_id": pa.array(cat(out_q, np.int64), pa.int64()),
                "vec_id": pa.array(cat(out_v, np.int64), pa.int64()),
                "sim": pa.array(cat(out_s, np.float64), pa.float64()),
            }
        )


def ann_lsh(vectors_ds, queries: dict, k: int, planes: np.ndarray,
            radius: int = 1, id_col: str = "vec_id", col: str = "embedding",
            concurrency=None, batch_size: int = 8192):
    """LSH-bucketed ANN (signed random projections, multi-probe).

    ``planes`` from lsh_planes(). radius == n_bits reproduces brute force
    exactly (plumbing proof); radius 0-2 trades recall for a candidate
    set that shrinks ~2^-bits per table. Scale path: codes are computed
    per batch inside the actor, queries+planes broadcast once via
    ray.put — no shuffle; at 100 TB the same stage runs unchanged."""
    qref = ray.put(queries)
    pref = ray.put(np.asarray(planes, dtype=np.float64))
    partials = vectors_ds.map_batches(
        LshPartialTopK,
        fn_constructor_kwargs={
            "queries_ref": qref, "planes_ref": pref, "k": k,
            "radius": radius, "id_col": id_col, "col": col,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
    return partials.groupby("query_id").map_groups(
        lambda g: _finalize_topk(g, k), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) scan
# ---------------------------------------------------------------------------


def pq_codebooks(dim: int = 64, m: int = 8, ksub: int = 16) -> np.ndarray:
    """Deterministic integer PQ codebooks, (m, ksub, dim//m) int64 in
    [-512, 512] — the "loaded checkpoint" convention (caption_embed's
    weights, kmeans_assign's centroids): a real deployment trains these
    with k-means per subspace; swapping trained codebooks in changes no
    plumbing. Values spread over the same range as the floor(e*512)
    vector quantization so the quantized distances are meaningful."""
    if dim % m:
        raise ValueError("dim must be divisible by m")
    dsub = dim // m
    s, j, d = np.ogrid[0:m, 0:ksub, 0:dsub]
    return ((s * 67 + j * 29 + d * 13) % 1025 - 512).astype(np.int64)


class PqAdcTopK:
    """Actor stage: PQ-encode each batch and ADC-scan it against the
    broadcast queries — the memory path 100 TB ANN actually ships
    (IVF-PQ): vectors live as m uint4/uint8 codes instead of dim floats,
    and query-to-vector distance is m table lookups instead of a dim-wide
    dot.

    Everything is integer-exact: vectors quantize to floor(e * 512)
    int64 (the semdedup/kmeans convention), codebooks are integer,
    encode is per-subspace exact argmin (ties -> lowest centroid id,
    numpy's first-occurrence argmin == SQL's ORDER BY dist, j), and the
    ADC lookup tables are exact integer squared distances — so the
    approximate distance is bit-identical on engine and oracle.
    Per batch: one (n, dsub, ksub) broadcast subtract per subspace +
    one LUT gather; partial top-k per query; bounded global finalize.
    """

    def __init__(self, state_ref, k: int, id_col: str = "vec_id",
                 col: str = "embedding"):
        cb, qids, qm = ray.get(state_ref)  # (m,ksub,dsub) int64, (nq,), (nq,dim)
        self.cb = cb
        self.m, self.ksub, self.dsub = cb.shape
        self.qids = qids.astype(np.int64)
        # ADC tables once per actor: (nq, m, ksub) exact int64
        qs = qm.reshape(len(qm), self.m, self.dsub)
        self.lut = ((qs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adist": pa.array([], pa.int64())})
        v = np.floor(embedding_matrix(batch, self.col) * 512.0).astype(np.int64)
        v = v.reshape(len(ids), self.m, self.dsub)
        codes = np.empty((len(ids), self.m), np.int64)
        for s in range(self.m):
            d2 = ((v[:, s, :, None] - self.cb[s].T[None, :, :]) ** 2).sum(axis=1)
            codes[:, s] = np.argmin(d2, axis=1)  # first occurrence = min id
        # adist[n, q] = sum_s lut[q, s, codes[n, s]]
        sub = np.arange(self.m)
        adist = np.empty((len(ids), len(self.qids)), np.int64)
        for qi in range(len(self.qids)):
            adist[:, qi] = self.lut[qi][sub, codes].sum(axis=1)
        k_eff = min(self.k, len(ids))
        out_q, out_v, out_d = [], [], []
        for qi in range(adist.shape[1]):
            dd = adist[:, qi]
            order = np.lexsort((ids, dd))[:k_eff]  # smallest dist, id tiebreak
            out_q.append(np.full(k_eff, self.qids[qi]))
            out_v.append(ids[order])
            out_d.append(dd[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "adist": pa.array(np.concatenate(out_d), pa.int64()),
        })


def ann_pq(vectors_ds, queries: dict, k: int, codebooks: np.ndarray,
           id_col: str = "vec_id", col: str = "embedding",
           concurrency=None, batch_size: int = 8192):
    """PQ/ADC top-k: queries = {'id': (nq,) int64, 'matrix': (nq, dim)
    int64 pre-quantized}. Output (query_id, vec_id, adist, pq_rank) — k
    rows per query, ranked by quantized distance, vec_id tiebreak."""
    ref = ray.put((codebooks.astype(np.int64),
                   np.asarray(queries["id"], np.int64),
                   np.asarray(queries["matrix"], np.int64)))
    partials = vectors_ds.map_batches(
        PqAdcTopK,
        fn_constructor_kwargs={"state_ref": ref, "k": k, "id_col": id_col,
                               "col": col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adist", "vec_id"],
                          ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["pq_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(fin, batch_format="pandas")


def ivf_coarse_centroids(dim: int = 64, nlist: int = 8) -> np.ndarray:
    """Deterministic integer coarse-quantizer centroids (nlist, dim) —
    same loaded-checkpoint convention as pq_codebooks."""
    l, d = np.ogrid[0:nlist, 0:dim]
    return ((l * 53 + d * 17) % 1025 - 512).astype(np.int64)


class IvfPqTopK:
    """Actor stage: IVF-PQ — the production-ANN composition (faiss's
    workhorse index): coarse-assign each vector to its nearest of
    ``nlist`` centroids (exact integer argmin, min-id ties), PQ-encode
    the RESIDUAL v - c against the shared codebooks, and ADC-scan only
    the vectors whose list one of the query's ``nprobe`` nearest coarse
    centroids owns. Residual encoding is what makes PQ tight around each
    list's centroid; probing bounds the scan to nprobe/nlist of the
    corpus. All distances integer-exact (same contract as ann_pq), so
    the result is bit-reproducible and SQL-checkable; with
    nprobe == nlist it degrades to exact-PQ over everything.
    """

    def __init__(self, state_ref, k: int, nprobe: int,
                 id_col: str = "vec_id", col: str = "embedding"):
        cc, cb, qids, qm = ray.get(state_ref)
        self.cc = cc                      # (nlist, dim) int64
        self.cb = cb                      # (m, ksub, dsub) int64
        self.m, self.ksub, self.dsub = cb.shape
        self.qids = qids.astype(np.int64)
        self.k = k
        self.id_col = id_col
        self.col = col
        # probe sets + per-(query, probed list) residual ADC tables
        qd = ((qm[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)  # (nq, nlist)
        order = np.lexsort((np.broadcast_to(np.arange(cc.shape[0]),
                                            qd.shape), qd), axis=1)
        self.probes = order[:, :nprobe]   # (nq, nprobe) list ids
        self.luts = {}                    # (qi, list) -> (m, ksub) int64
        for qi in range(len(qids)):
            for l in self.probes[qi]:
                resq = (qm[qi] - cc[l]).reshape(self.m, self.dsub)
                self.luts[(qi, int(l))] = (
                    (resq[:, None, :] - cb) ** 2).sum(axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "adist": pa.array([], pa.int64())})
        if not len(ids):
            return empty
        v = np.floor(embedding_matrix(batch, self.col) * 512.0).astype(np.int64)
        cd = ((v[:, None, :] - self.cc[None, :, :]) ** 2).sum(axis=2)
        lists = np.argmin(cd, axis=1)     # first occurrence = min id
        res = (v - self.cc[lists]).reshape(len(ids), self.m, self.dsub)
        codes = np.empty((len(ids), self.m), np.int64)
        for s in range(self.m):
            d2 = ((res[:, s, :, None] - self.cb[s].T[None, :, :]) ** 2).sum(axis=1)
            codes[:, s] = np.argmin(d2, axis=1)
        sub = np.arange(self.m)
        out_q, out_v, out_d = [], [], []
        for qi in range(len(self.qids)):
            sel = np.isin(lists, self.probes[qi])
            if not sel.any():
                continue
            sids, slists, scodes = ids[sel], lists[sel], codes[sel]
            adist = np.empty(len(sids), np.int64)
            for l in np.unique(slists):
                inl = slists == l
                adist[inl] = self.luts[(qi, int(l))][sub, scodes[inl]].sum(axis=1)
            k_eff = min(self.k, len(sids))
            order = np.lexsort((sids, adist))[:k_eff]
            out_q.append(np.full(k_eff, self.qids[qi]))
            out_v.append(sids[order])
            out_d.append(adist[order])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "adist": pa.array(np.concatenate(out_d), pa.int64()),
        })


def ann_ivfpq(vectors_ds, queries: dict, k: int, coarse: np.ndarray,
              codebooks: np.ndarray, nprobe: int = 2,
              id_col: str = "vec_id", col: str = "embedding",
              concurrency=None, batch_size: int = 8192):
    """IVF-PQ top-k (coarse probe + residual-PQ ADC). queries = {'id':
    (nq,) int64, 'matrix': (nq, dim) int64}. Output (query_id, vec_id,
    adist, pq_rank), k rows per query from the probed lists only."""
    ref = ray.put((coarse.astype(np.int64), codebooks.astype(np.int64),
                   np.asarray(queries["id"], np.int64),
                   np.asarray(queries["matrix"], np.int64)))
    partials = vectors_ds.map_batches(
        IvfPqTopK,
        fn_constructor_kwargs={"state_ref": ref, "k": k, "nprobe": nprobe,
                               "id_col": id_col, "col": col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adist", "vec_id"],
                          ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["pq_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(fin, batch_format="pandas")


def label_recall(vectors_ds, k: int = 10, quantize: int = 512,
                 id_col: str = "vec_id", label_col: str = "label",
                 sample_limit: int = 200_000):
    """Retrieval-quality eval: for every vector, does its exact top-k
    neighborhood (squared L2 on floor(e*quantize) int64 vectors,
    deterministic (dist2, id) order, self excluded) contain a same-label
    vector? The recall@k diagnostic an embedding pipeline runs before
    trusting ANN indexes.

    Exact brute force is O(n^2) BY DESIGN — an eval, not a serving path —
    so the corpus is required to fit the documented sample bound (at
    scale you run it on a stratified sample; see sample.py). The corpus
    matrix broadcasts once via ray.put; each query batch is one int64
    matmul (exact: products < 2^53) against it."""
    import ray

    mat = vectors_ds.materialize()
    n = mat.count()
    if n > sample_limit:
        raise ValueError(
            f"label_recall is an O(n^2) eval; corpus {n} exceeds "
            f"sample_limit={sample_limit} — pass a sample instead")
    corpus = mat.to_pandas().sort_values(id_col).reset_index(drop=True)
    cm = np.floor(
        np.stack(corpus["embedding"].to_numpy()).astype(np.float64)
        * quantize
    ).astype(np.int64)
    cids = corpus[id_col].to_numpy(np.int64)
    clabels = corpus[label_col].to_numpy(np.int64)
    cnorm = (cm * cm).sum(axis=1)
    state = ray.put((cm, cids, clabels, cnorm))

    class Recall:
        def __init__(self):
            self.cm, self.cids, self.clabels, self.cnorm = ray.get(state)

        def __call__(self, b: pa.Table) -> pa.Table:
            q = np.floor(
                embedding_matrix(b) * quantize
            ).astype(np.int64)
            if len(q) == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    label_col: pa.array([], pa.int64()),
                    "hit": pa.array([], pa.bool_()),
                })
            qids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            qlabels = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
            qnorm = (q * q).sum(axis=1)
            nc = len(self.cids)
            sentinel = np.iinfo(np.int64).max
            # overflow guard for the composite key (python ints, exact)
            worst = (int(np.abs(q).max(initial=0))
                     + int(np.abs(self.cm).max(initial=0))) ** 2
            if worst * q.shape[1] * nc >= 1 << 62:
                raise ValueError("embedding magnitude too large for the "
                                 "int64 composite key — lower quantize")
            # composite key d2 * nc + column: one int64 that totally
            # orders candidates by exact (dist2, corpus position) — and
            # corpus positions are id-sorted, so this IS the (dist2, id)
            # order. Safe: d2 <= d*(2*quantize)^2 and nc <= sample_limit
            # keep d2*nc < 2^63. Self rows get the sentinel (never a hit,
            # even when k >= corpus size).
            chunk = 16384  # bounds the (batch x chunk) intermediates
            cand_comp, cand_lab = [], []
            for s in range(0, nc, chunk):
                cm = self.cm[s:s + chunk]
                d2 = (qnorm[:, None] - 2 * (q @ cm.T)
                      + self.cnorm[None, s:s + chunk])
                comp = d2 * nc + (s + np.arange(cm.shape[0]))[None, :]
                comp[qids[:, None] == self.cids[None, s:s + chunk]] = sentinel
                k_eff = min(k, comp.shape[1])
                idx = np.argpartition(comp, k_eff - 1, axis=1)[:, :k_eff]
                cand_comp.append(np.take_along_axis(comp, idx, axis=1))
                cand_lab.append(self.clabels[s:s + chunk][idx])
            allc = np.concatenate(cand_comp, axis=1)
            alll = np.concatenate(cand_lab, axis=1)
            order = np.argsort(allc, axis=1)[:, :k]
            topc = np.take_along_axis(allc, order, axis=1)
            topl = np.take_along_axis(alll, order, axis=1)
            hit = ((topc != sentinel)
                   & (topl == qlabels[:, None])).any(axis=1)
            return pa.table({
                id_col: pa.array(qids, pa.int64()),
                label_col: pa.array(qlabels, pa.int64()),
                "hit": pa.array(hit, pa.bool_()),
            })

    return mat.map_batches(
        Recall, batch_format="pyarrow", batch_size=2048,
        concurrency=default_pool(None, nrows=n, batch_size=2048),
    )


def filtered_topk(vectors_ds, queries: dict, k: int = 5,
                  exclude_label=None, quantize: int = 512,
                  id_col: str = "vec_id", label_col: str = "label"):
    """Attribute-filtered vector search: exact top-k by INTEGER DOT
    PRODUCT (inner-product search over floor(e*quantize) vectors — equal
    to cosine order when the corpus is unit-norm, as here) restricted to
    corpus rows whose label differs from ``exclude_label`` — the
    filtered-search feature every vector store exposes, with the
    metadata predicate pushed INTO the scan (not applied after top-k),
    so k results always survive the filter.

    Same plumbing as ann_bruteforce: queries broadcast once, per-batch
    partial top-k (boundary ties kept so the global (dot desc, id asc)
    order is exact), bounded finalize.
    """
    import ray

    qids = sorted(queries)
    qm = np.floor(
        np.stack([np.asarray(queries[q], np.float64) for q in qids])
        * quantize
    ).astype(np.int64)
    state = ray.put((np.asarray(qids, np.int64), qm))

    class Scan:
        def __init__(self):
            self.qids, self.qm = ray.get(state)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = embedding_matrix(b)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            labels = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if exclude_label is not None:
                keep = labels != exclude_label
                m, ids = m[keep], ids[keep]
            if len(m) == 0:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "dot": pa.array([], pa.int64()),
                })
            cm = np.floor(m * quantize).astype(np.int64)
            dots = self.qm @ cm.T  # (nq, nb) exact int64
            k_eff = min(k, dots.shape[1])
            out_q, out_i, out_d = [], [], []
            for r in range(dots.shape[0]):
                # keep EVERYTHING tied with the k-th boundary score —
                # an argpartition cut would drop boundary ties
                # arbitrarily and break the (dot desc, id asc) contract
                # before the finalize can apply it
                thr = np.partition(dots[r], dots.shape[1] - k_eff)[
                    dots.shape[1] - k_eff]
                sel = np.flatnonzero(dots[r] >= thr)
                out_q.extend([int(self.qids[r])] * len(sel))
                out_i.extend(ids[sel].tolist())
                out_d.extend(dots[r][sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "dot": pa.array(out_d, pa.int64()),
            })

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dot", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["ann_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    n = vectors_ds.count()
    return (vectors_ds.map_batches(
                Scan, batch_format="pyarrow", batch_size=4096,
                concurrency=default_pool(None, nrows=n, batch_size=4096))
            .groupby("query_id")
            .map_groups(fin, batch_format="pandas"))


def label_centroid_stats(vectors_ds, quantize: int = 512,
                         label_col: str = "label", max_labels: int = 4096):
    """Per-class embedding statistics (the prototype/centroid pass of
    few-shot evals and semdedup seeding): for every label, the exact sum
    of floor(e*quantize) int64 vectors and the row count — ONE tree-merged
    AggregateFn pass, no shuffle (the gram_matrix shape keyed by label).
    Returns a pa.Table (label, dim, qsum, n) in long form."""
    from ray.data.aggregate import AggregateFn

    # accumulator: one int64 matrix, row = [label, n, qsum_0..qsum_{d-1}]
    # (a single ndarray — the only intermediate Ray's aggregate ships
    # losslessly; a dict accumulator dies in the Arrow conversion)
    def _merge_rows(a, b):
        if a.size == 0:
            return b
        if b.size == 0:
            return a
        allr = np.vstack([a, b])
        u, inv = np.unique(allr[:, 0], return_inverse=True)
        if len(u) > max_labels:
            raise ValueError(f"more than {max_labels} labels — "
                             "use a keyed groupby instead")
        out = np.zeros((len(u), allr.shape[1]), np.int64)
        out[:, 0] = u
        np.add.at(out[:, 1:], inv, allr[:, 1:])
        return out

    def init(_):
        return np.zeros((0, 0), dtype=np.int64)

    def acc(a, block):
        m = embedding_matrix(block)
        if len(m) == 0:
            return a
        q = np.floor(m * quantize).astype(np.int64)
        labels = block[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(u), q.shape[1]), np.int64)
        np.add.at(sums, inv, q)
        part = np.column_stack(
            [u, np.bincount(inv).astype(np.int64), sums])
        return _merge_rows(a, part)

    res = vectors_ds.aggregate(
        AggregateFn(init=init, merge=_merge_rows, name="cstats",
                    accumulate_block=acc))["cstats"]
    if res.size == 0:
        return pa.table({
            "label": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "qsum": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        })
    d = res.shape[1] - 2
    return pa.table({
        "label": pa.array(np.repeat(res[:, 0], d), pa.int64()),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(res)),
                        pa.int64()),
        "qsum": pa.array(res[:, 2:].reshape(-1), pa.int64()),
        "n": pa.array(np.repeat(res[:, 1], d), pa.int64()),
    })
