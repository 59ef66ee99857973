"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Ray Data plans (per the large-scale pattern):
  exact     : md5(content) in map_batches -> groupby(hash) keep min id.
  minhash   : shingle -> 64 minhashes per doc (vectorized) -> explode to
              (band_id, band_hash, doc_id) rows -> groupby bands ->
              candidate pairs -> verify true Jaccard -> connected
              components -> keep min-id representative per cluster.
  simhash   : 64-bit sign-aggregated token-hash fingerprint; near-dup =
              hamming distance <= t within blocking buckets.
  embedding : cosine >= t candidate pairs via brute-force within blocks
              (the ANN module provides the scale path).

All hash functions are deterministic (no seeds from time); multipliers are
fixed odd constants so every run and every worker agrees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import md5_hash_column

MERSENNE = (1 << 61) - 1
N_PERM = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS

# fixed affine permutation parameters (deterministic across workers)
_rng = np.random.RandomState(1234567)
PERM_A = (_rng.randint(1, MERSENNE, size=N_PERM, dtype=np.int64) | 1).astype(np.uint64)
PERM_B = _rng.randint(0, MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-gram shingles -> uint64 hashes (vectorized FNV-ish)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    n = len(data) - k + 1
    # rolling polynomial over a sliding window via stride tricks
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    mult = np.power(np.uint64(257), np.arange(k, dtype=np.uint64))
    h = (win * mult[None, :]).sum(axis=1, dtype=np.uint64)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return np.unique(h)


def minhash_signature(text: str, k: int = 5) -> np.ndarray:
    """(N_PERM,) uint64 minhash signature of the text's shingle set."""
    sh = _shingle_hashes(text, k)
    if len(sh) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod p, take min over shingles
    vals = (sh[:, None] * PERM_A[None, :] + PERM_B[None, :]) % np.uint64(MERSENNE)
    return vals.min(axis=0)


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(N_BANDS,) int64 hash per band of the signature."""
    bands = sig.reshape(N_BANDS, ROWS_PER_BAND)
    h = np.zeros(N_BANDS, dtype=np.uint64)
    for j in range(ROWS_PER_BAND):
        h = h * np.uint64(1099511628211) + bands[:, j]
    return (h >> np.uint64(1)).astype(np.int64)  # keep positive in int64


class MinHashStage:
    """map_batches: doc -> N_BANDS rows (doc_id, band_id, band_hash)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", k: int = 5):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, hashes = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].astype(str)):
            bh = band_hashes(minhash_signature(text, self.k))
            ids.extend([doc_id] * N_BANDS)
            bands.extend(range(N_BANDS))
            hashes.extend(bh.tolist())
        return pd.DataFrame(
            {self.id_col: ids, "band_id": bands, "band_hash": hashes}
        )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-gram Jaccard similarity (the verify step after LSH)."""
    sa = _shingle_hashes(a, k)
    sb = _shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def _band_groups_to_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One (band_id, band_hash) bucket -> candidate pairs (a < b)."""
    ids = np.sort(g["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})


def minhash_candidate_pairs(docs_ds, driver_merge_limit: int = 2_000_000):
    """documents Dataset -> deduplicated candidate pair Dataset (id_a<id_b).

    Shuffle key = (band_id, band_hash); bucket sizes are naturally bounded
    for non-pathological data, and a hot bucket (giant near-dup cluster)
    produces O(n²) pairs — callers cap bucket size upstream if needed.
    The same pair can fire in several bands; small candidate streams are
    deduplicated driver-side (Ray multi-key groupby fixed overhead),
    larger ones with a distributed groupby.
    """
    import ray.data as rd

    bands = docs_ds.map_batches(MinHashStage, batch_format="pandas",
                                concurrency=(1, 8), batch_size=4096)
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _band_groups_to_pairs, batch_format="pandas"
    ).materialize()
    if pairs.count() <= driver_merge_limit:
        df = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
        return rd.from_pandas(df.reset_index(drop=True))
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


class JaccardVerify:
    """Actor stage: filter candidate pairs by true k-gram Jaccard >= t.

    Texts are looked up from a broadcast {doc_id: text} dict (the docs
    table at verify time is the small projected side)."""

    def __init__(self, texts_ref, threshold: float = 0.8, k: int = 5):
        import ray

        self.texts: dict = ray.get(texts_ref)
        self.threshold = threshold
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keep = []
        sims = []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            s = ngram_jaccard(self.texts[int(a)], self.texts[int(b)], self.k)
            keep.append(s >= self.threshold)
            sims.append(s)
        out = batch.loc[keep].copy()
        out["jaccard"] = np.asarray(sims)[keep]
        return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> np.int64:
    """64-bit SimHash over token hashes (sign-aggregated bit votes)."""
    import re

    toks = re.findall(r"[A-Za-z0-9]+", text.lower())
    if not toks:
        return np.int64(0)
    hs = np.fromiter(
        (hash64_str(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return np.int64(out >> np.uint64(1))  # 63 bits, positive


def hash64_str(s: str) -> np.uint64:
    """Deterministic 64-bit string hash (FNV-1a), stable across runs."""
    h = np.uint64(0xCBF29CE484222325)
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * 0x100000001B3 % (1 << 64))
    return h


class SimHashStage:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "simhash": [simhash64(t) for t in batch[self.text_col].astype(str)],
            }
        )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64)) ^ (b.astype(np.uint64))
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


# ---------------------------------------------------------------------------
# exact dedup plan
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """md5(text) -> groupby(h): (h, keep_id=min id, dup_count)."""
    from ray.data.aggregate import Count, Min

    from .text import Md5Stage

    hashed = docs_ds.map_batches(
        Md5Stage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )
    return hashed.groupby("h").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="dup_count")
    )
