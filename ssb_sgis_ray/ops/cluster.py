"""Distributed KMeans (Lloyd) over an embedding column.

The canonical iterative-algorithm pattern on Ray Data: each Lloyd round is
ONE streaming AggregateFn pass — every block assigns its vectors to the
broadcast centroids with a single matmul-argmax and accumulates
per-centroid float64 coordinate sums + counts; Ray's aggregate tree merges
the (k, d+1) matrices; the driver (holding only that matrix) recomputes
the centroids and re-broadcasts. No shuffle anywhere, no per-node state
beyond O(k·d), so the plan is identical on a 256-node cluster: iters ×
(one map-combine pass over the blocks). This upgrades the driver-side
sample fit the IVF index already uses (`ops/ann.kmeans_fit`) to the full
dataset — the topic/quality bucketing step a training-data pipeline runs
before stratified sampling or per-cluster dedup.

Determinism contract (so two cluster sizes produce identical clusters —
the engine's reproducibility rule for every sampling/bucketing op):

* init = the vectors of the ``k`` smallest ids (partition-independent);
* per-round sums are float64 adds tree-merged in any order — for
  integer-valued vectors (< 2^53 per partial) this is EXACT under any
  merge order, which is what the differential test pins; for arbitrary
  float data the assignment can differ only on near-ties of the argmax;
* ties in the argmax go to the lowest cluster id (np first-max), the
  same rule the SQL oracle's ``ORDER BY sim DESC, c`` replays;
* empty clusters keep their previous centroid (ann.kmeans_fit:126 rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _normalize, embedding_matrix


def _block_matrix(block, col: str) -> np.ndarray:
    if isinstance(block, pa.Table):
        return embedding_matrix(block, col)
    vals = block[col].to_numpy()
    return np.stack(vals).astype(np.float64)


def assign_clusters(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Inner-product argmax per row; first-max (lowest cluster id) wins
    ties — mirrors SQL ``row_number() OVER (ORDER BY sim DESC, c)``."""
    return (m @ cent.T).argmax(axis=1)


def kmeans_iterate(
    ds,
    init_centroids: np.ndarray,
    iters: int = 10,
    col: str = "embedding",
    spherical: bool = True,
):
    """Lloyd iterations over the full Dataset; returns (k, d) centroids.

    ``spherical=True`` renormalizes centroids each round (cosine KMeans,
    matching ann.kmeans_fit); vectors are used as stored either way so the
    caller controls input normalization.
    """
    import ray
    from ray.data.aggregate import AggregateFn

    cent = np.ascontiguousarray(init_centroids, dtype=np.float64)
    if spherical:
        cent = _normalize(cent)
    k, d = cent.shape

    for _ in range(iters):
        cref = ray.put(cent)

        def km_init(_):
            return np.zeros((k, d + 1), dtype=np.float64)

        def km_acc(acc, block, _cref=cref):
            m = _block_matrix(block, col)
            if len(m) == 0:
                return acc
            c = ray.get(_cref)
            assign = assign_clusters(m, c)
            # per-centroid coordinate sums + count via one scatter-add
            np.add.at(acc[:, :d], assign, m)
            acc[:, d] += np.bincount(assign, minlength=k)
            return acc

        def km_merge(a, b):
            return a + b

        state = ds.aggregate(
            AggregateFn(
                init=km_init, merge=km_merge, name="km", accumulate_block=km_acc
            )
        )["km"]
        counts = state[:, d]
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = state[nonempty, :d] / counts[nonempty, None]
        if spherical:
            cent = _normalize(cent)
    return cent


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    col: str = "embedding",
    id_col: str = "vec_id",
    quantize: int | None = None,
):
    """Assignment pass: (id_col, cluster) per row vs broadcast centroids.

    ``quantize=2**b`` assigns on ``floor(e * 2**b)`` int64 vectors against
    integer centroids — multiplication by a power of two is exact in
    float64, so the quantized argmax is bit-identical on any engine (the
    int8/int-quantized scoring trick production ANN systems use, and what
    makes the SQL oracle tie-safe: 68 of the 500 sf0.01 rows tie exactly)."""
    import ray

    if quantize and not np.equal(np.mod(centroids, 1), 0).all():
        raise ValueError(
            "quantized assignment requires integer-valued centroids "
            "(vectors are floored; silently truncating float centroids "
            "would break the bit-identical-argmax contract)"
        )
    dtype = np.int64 if quantize else np.float64
    cref = ray.put(np.ascontiguousarray(centroids, dtype=dtype))

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array([], pa.int64())})
        m = embedding_matrix(batch, col)
        if quantize:
            m = np.floor(m * quantize).astype(np.int64)
        cent = ray.get(cref)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(
                    assign_clusters(m, cent).astype(np.int64), pa.int64()
                ),
            }
        )

    # stateless task-pool stage: warm workers cache the ray.get locally,
    # so there is no actor spawn and no per-batch reship of the centroids
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=1024)


def min_id_init(ds, k: int, col: str = "embedding", id_col: str = "vec_id"):
    """Deterministic partition-independent init: the vectors of the k
    smallest ids.

    One map pass (per-batch k-smallest partial) + a driver merge over the
    bounded partials — no sort shuffle, honoring the module's no-shuffle
    contract; result is identical regardless of blocking."""
    import ray

    def per_batch(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        ids = b[id_col].to_numpy(zero_copy_only=False)
        idx = np.argpartition(ids, k - 1)[:k]
        return b.take(pa.array(np.sort(idx)))

    parts = ds.select_columns([id_col, col]).map_batches(
        per_batch, batch_format="pyarrow"
    )
    tables = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tables)  # bounded: <= k rows per input batch
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")[:k]
    return embedding_matrix(t.take(pa.array(order)), col)


def kmeans(
    ds,
    k: int,
    iters: int = 10,
    col: str = "embedding",
    id_col: str = "vec_id",
    spherical: bool = True,
):
    """Full distributed KMeans: min-id init -> Lloyd -> assignment.

    Returns (centroids, assignment Dataset of (id_col, cluster))."""
    init = min_id_init(ds, k, col=col, id_col=id_col)
    cent = kmeans_iterate(ds, init, iters=iters, col=col, spherical=spherical)
    return cent, kmeans_assign(ds, cent, col=col, id_col=id_col)


def gram_pass(ds, col: str = "embedding", bits: int = 10):
    """ONE streaming aggregate pass over the embedding column returning
    the exact integer sufficient statistics of distributed PCA:
    ``(G, s, n)`` where ``q = floor(e * 2**bits)`` (int64 — float32 ->
    float64 is exact and *2^bits is a power-of-two shift, so the
    quantization is bit-identical on any engine), ``G = Q^T Q`` (d, d),
    ``s = column sums`` (d,), ``n`` = row count.

    Same shape as the KMeans round: per-block matmul partials, tree
    merge, O(d^2) state — no shuffle, identical plan at any cluster
    size. Products are < 2^(2*bits) and block sums < 2^53, so the
    float64 BLAS matmul per block is exact before the int64 cast.
    """
    from ray.data.aggregate import AggregateFn

    scale = float(2 ** bits)

    def g_init(_):
        return np.zeros((0, 0), dtype=np.int64)

    def g_acc(acc, block):
        m = _block_matrix(block, col)
        if len(m) == 0:
            return acc
        q = np.floor(m * scale)
        d = q.shape[1]
        if acc.size == 0:
            acc = np.zeros((d + 1, d + 1), dtype=np.int64)
        acc[:d, :d] += (q.T @ q).astype(np.int64)
        acc[d, :d] += q.sum(axis=0).astype(np.int64)
        acc[d, d] += len(q)
        return acc

    def g_merge(a, b):
        if a.size == 0:
            return b
        if b.size == 0:
            return a
        return a + b

    state = ds.aggregate(AggregateFn(
        init=g_init, merge=g_merge, name="gram", accumulate_block=g_acc
    ))["gram"]
    d = state.shape[0] - 1
    return state[:d, :d], state[d, :d], int(state[d, d])


def gram_matrix(ds, col: str = "embedding", bits: int = 10) -> pa.Table:
    """Upper-triangle (i, j, g) rows of the quantized Gram matrix —
    integer-exact, so a plain SQL self-join over unnested embeddings
    reproduces it bit-for-bit."""
    G, _, _ = gram_pass(ds, col, bits)
    d = G.shape[0]
    iu, ju = np.triu_indices(d)
    return pa.table({
        "i": pa.array(iu.astype(np.int64), pa.int64()),
        "j": pa.array(ju.astype(np.int64), pa.int64()),
        "g": pa.array(G[iu, ju], pa.int64()),
    })


def pca_components(ds, col: str = "embedding", bits: int = 10,
                   n_components: int = 8):
    """Distributed PCA: covariance from the one-pass Gram statistics
    (cov = (G - s s^T / n) / (n - 1) over the quantized vectors), driver
    ``eigh`` on the d x d matrix, top components by eigenvalue. Returns
    (components (k, d) float64, explained_variance (k,)). The expensive
    part is the streaming pass; the driver holds only O(d^2)."""
    G, s, n = gram_pass(ds, col, bits)
    if n < 2:
        raise ValueError("pca_components needs >= 2 rows")
    cov = (G.astype(np.float64) - np.outer(s, s) / n) / (n - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T
    # deterministic sign: largest-|coef| coordinate is positive
    for r in comps:
        jmax = int(np.abs(r).argmax())
        if r[jmax] < 0:
            r *= -1.0
    return comps, w[order]


# ---------------------------------------------------------------------------
# SemDeDup: per-cluster semantic near-duplicate removal (integer-exact)
# ---------------------------------------------------------------------------


def semdedup_keep(
    ds,
    centroids: np.ndarray,
    threshold: tuple[int, int] = (9, 10),
    quantize: int = 512,
    col: str = "embedding",
    id_col: str = "vec_id",
    block: int = 512,
):
    """SemDeDup (Abbas et al. 2023): cluster the embeddings, drop every
    vector that has a SMALLER-id near-duplicate in its own cluster, keep
    the rest. "Near-duplicate" is cosine >= p/q evaluated WITHOUT floats:
    vectors are floor(e * quantize) int64 (power-of-two scaling is exact
    in float64), and cos(x, y) >= p/q over them is the cross-multiplied
    integer predicate ``x.y > 0 AND q^2 (x.y)^2 >= p^2 |x|^2 |y|^2`` —
    products stay < 2^55 for 64-dim, |e| <= 1, quantize = 512, so int64
    is exact and the SQL oracle can't disagree in the last ulp.

    Plan: quantized assignment against the broadcast centroids (stateless
    map, no shuffle) -> ONE groupby(cluster) shuffle of (id, qvec) ->
    per-cluster blocked int64 matmul with smaller-id masking. The
    within-cluster quadratic is the published algorithm's own premise
    (k scales with corpus size so clusters stay bounded); ``block`` rows
    of the similarity matrix are held at a time, so worker memory is
    O(block x cluster), not O(cluster^2).

    Returns keep rows (id_col, cluster), both int64.
    """
    import ray

    p, qd = int(threshold[0]), int(threshold[1])
    if not np.equal(np.mod(centroids, 1), 0).all():
        raise ValueError(
            "semdedup_keep requires integer-valued centroids (the "
            "bit-identical quantized argmax contract, as kmeans_assign)"
        )
    d = centroids.shape[1]
    cref = ray.put(np.ascontiguousarray(centroids, dtype=np.int64))

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "qv": pa.array([], pa.list_(pa.int64())),
            })
        m = embedding_matrix(batch, col)
        qm = np.floor(m * quantize).astype(np.int64)
        cent = ray.get(cref)
        a = assign_clusters(qm, cent).astype(np.int64)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "cluster": pa.array(a, pa.int64()),
            "qv": pa.FixedSizeListArray.from_arrays(
                pa.array(qm.ravel(), pa.int64()), d
            ).cast(pa.list_(pa.int64())),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=1024)

    def cluster_dedup(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(
            g["qv"].combine_chunks().flatten(), dtype=np.int64
        )
        qm = flat.reshape(len(ids), d)
        order = np.argsort(ids, kind="stable")
        ids, qm = ids[order], np.ascontiguousarray(qm[order])
        norms = (qm * qm).sum(axis=1)
        dup = np.zeros(len(ids), dtype=bool)
        col_ix = np.arange(len(ids))
        for s in range(0, len(ids), block):
            e = min(s + block, len(ids))
            S = qm[s:e] @ qm.T                      # int64, exact
            P = (S > 0) & (qd * qd * S * S
                           >= p * p * norms[s:e, None] * norms[None, :])
            P &= col_ix[None, :] < np.arange(s, e)[:, None]
            dup[s:e] = P.any(axis=1)
        keep = ~dup
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "cluster": pa.array(
                np.full(int(keep.sum()),
                        g["cluster"][0].as_py(), dtype=np.int64),
                pa.int64()),
        })

    return tagged.groupby("cluster").map_groups(
        cluster_dedup, batch_format="pyarrow"
    )


def embedding_outliers(
    ds,
    centroids: np.ndarray,
    q_rank_num: int = 9,
    q_rank_den: int = 10,
    quantize: int = 512,
    col: str = "embedding",
    id_col: str = "vec_id",
):
    """Embedding-space outlier detection for corpus pruning: flag every
    vector whose squared L2 distance to its assigned centroid EXCEEDS
    the exact ceil(num/den * n)-th smallest distance (default: beyond
    the exact P90). The "drop the far tail before training" curation
    step, exact end to end.

    Distances are integers: vectors quantize to floor(e * 2^b) int64 and
    centroids are integer-valued, so dist2 = |q|^2 - 2 q.c + |c|^2 is
    exact on both engine and SQL sides (each term < 2^25 at d = 64).
    The threshold is an exact order statistic from
    ``ops/quantile.exact_kth_smallest`` (histogram refinement, no sort
    shuffle). Plan: one stateless map pass (assign + dist2), the
    refinement passes over its narrow materialized projection, one
    vectorized filter — no shuffle anywhere.

    Returns outlier rows (id_col, cluster, dist2), all int64.
    """
    import pyarrow.compute as pc
    import ray

    from .quantile import exact_kth_smallest

    if not np.equal(np.mod(centroids, 1), 0).all():
        raise ValueError(
            "embedding_outliers requires integer-valued centroids "
            "(the bit-identical quantized argmax/distance contract)"
        )
    cent = np.ascontiguousarray(centroids, dtype=np.int64)
    cnorm = (cent * cent).sum(axis=1)
    cref = ray.put((cent, cnorm))

    def dist_stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "dist2": pa.array([], pa.int64()),
            })
        c, cn = ray.get(cref)
        m = embedding_matrix(batch, col)
        qm = np.floor(m * quantize).astype(np.int64)
        S = qm @ c.T
        a = S.argmax(axis=1)
        qn = (qm * qm).sum(axis=1)
        d2 = qn - 2 * S[np.arange(len(qm)), a] + cn[a]
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "dist2": pa.array(d2, pa.int64()),
        })

    dists = ds.map_batches(
        dist_stage, batch_format="pyarrow", batch_size=1024
    ).materialize()
    n = dists.count()
    if n == 0:
        return dists
    k = (q_rank_num * n + q_rank_den - 1) // q_rank_den
    t = int(exact_kth_smallest(dists, "dist2", ranks=[k])[0])

    return dists.map_batches(
        lambda b: b.filter(pc.greater(b["dist2"], t)),
        batch_format="pyarrow",
    )
