"""Batched model inference as an actor-pool stage.

The pattern a 100 TB training-data pipeline uses for every learned
scorer (quality models, embedders, classifiers): weights load ONCE per
actor (``ray.put`` broadcast, materialized in ``__init__``), every batch
runs one vectorized forward pass — never per-row Python. Real model
runtimes (torch/onnx) are absent from this container, so the model here
is a deterministic linear embedder over hashed token ids: the Ray-side
plumbing (weight broadcast, actor state, batch matmul, normalized
output schema) is real and tested; swapping in a real checkpoint only
changes ``_forward``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..pool import default_pool

_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRM = np.uint64(0x100000001B3)


def make_embedding_weights(vocab_buckets: int = 4096, dim: int = 64,
                           seed: int = 23) -> np.ndarray:
    """Deterministic (vocab_buckets, dim) float32 weight matrix — the
    stand-in checkpoint. Rows are unit-normalized."""
    rng = np.random.RandomState(seed)
    w = rng.standard_normal((vocab_buckets, dim)).astype(np.float32)
    return w / np.linalg.norm(w, axis=1, keepdims=True)


def _hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over a '<U16' token array -> uint64 ids."""
    if not len(tokens):
        return np.empty(0, np.uint64)
    raw = tokens.view(np.uint32).reshape(len(tokens), -1).astype(np.uint64)
    h = np.full(len(tokens), _FNV_OFF, np.uint64)
    for c in range(raw.shape[1]):
        h = (h ^ raw[:, c]) * _FNV_PRM
    return h


class EmbedCaptions:
    """Actor stage: text column -> unit-normalized embedding column.

    Forward pass per batch: tokenize all docs at once (one regex pass per
    doc, C level), hash tokens to vocab buckets, gather weight rows, and
    mean-pool per doc with np.add.reduceat — zero per-token Python.
    """

    def __init__(self, weights_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import re

        self.w = ray.get(weights_ref)  # (V, d) — once per actor
        self.tok = re.compile(r"[a-z0-9]+")
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts = np.zeros(len(texts), np.int64)
        toks: list[str] = []
        for i, t in enumerate(texts):
            tt = self.tok.findall((t or "").lower())
            toks.extend(tt)
            counts[i] = len(tt)
        ids = _hash_tokens(np.array(toks, dtype="<U16")) % np.uint64(len(self.w))
        rows = self.w[ids.astype(np.int64)]  # (T, d) gather
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        nz = counts > 0
        out = np.zeros((len(texts), self.w.shape[1]), np.float32)
        if nz.any():
            sums = np.add.reduceat(rows, starts[nz], axis=0) if len(rows) else out[nz]
            out[nz] = sums / counts[nz, None]
            nrm = np.linalg.norm(out[nz], axis=1, keepdims=True)
            out[nz] = out[nz] / np.where(nrm > 0, nrm, 1.0)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "embedding": pa.array(
                    list(out.astype(np.float64)), pa.list_(pa.float64())
                ),
            }
        )


def embed_captions(docs_ds, weights: np.ndarray, text_col: str = "text",
                   id_col: str = "doc_id", batch_size: int = 1024,
                   concurrency=None):
    """documents Dataset -> (id, embedding) Dataset via the broadcast-
    weights actor pool. Composes directly with ops/ann (ann_bruteforce /
    ann_ivf / ann_lsh) and ops/dedup.embed_dedup_pairs_bucketed."""
    ref = ray.put(weights)
    return docs_ds.map_batches(
        EmbedCaptions,
        fn_constructor_kwargs={"weights_ref": ref, "text_col": text_col,
                               "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


class ClipScoreStage:
    """Actor stage: (image bytes, caption) pair -> alignment score + keep
    flag — the LAION-style CLIP-score curation filter (keep pairs whose
    image/text alignment clears a threshold) with a deterministic
    stand-in scorer so the oracle is exact:

    * image embedding: 9 integer color moments of the DECODED pixels —
      per channel c, (plain sum, (gx+1)-weighted sum, (gy+1)-weighted
      sum) — real decode per actor, numpy moments per image;
    * caption embedding: 9 hashed-token-bucket counts (byte-wise FNV-1a,
      the corpus-wide hash every dedup/LM oracle already replicates);
    * clip_score = <img, cap> (exact int64: moments < 2^27, bucket
      counts < 2^11, 9 terms);
    * norm_score = clip_score // (n_px * n_tok) — scale-free per-token
      per-pixel alignment, so one threshold works at every image size /
      caption length; kept = n_tok > 0 AND norm_score >= threshold.

    PNG rows only: the lossy stand-in codec is not bit-exact (PSNR >= 40,
    not equality), so jpeg moments are not oracle-able — the same
    convention image_channel_stats / image_augment already use.
    Swapping in a real CLIP checkpoint only changes the two embedding
    functions; the pair plumbing (decode-per-actor, vectorized caption
    hashing, integer dot, threshold filter) is the real pipeline.
    """

    DIM = 9

    def __init__(self, threshold: int = 0):
        import re

        self.tok = re.compile(r"[a-z0-9]+")
        self.threshold = int(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..codecs import png
        from .dedup import hash64_str_batch

        batch = batch.filter(pc.equal(batch["fmt"], "png"))
        blobs = batch["bytes"].to_pylist()
        caps = batch["caption"].to_pylist()
        n = len(blobs)
        feats = np.zeros((n, self.DIM), np.int64)
        n_px = np.zeros(n, np.int64)
        for i, blob in enumerate(blobs):
            img = png.decode_png(blob).astype(np.int64)  # (h, w, 3)
            h, w = img.shape[:2]
            n_px[i] = h * w
            wx = np.arange(1, w + 1, dtype=np.int64)
            wy = np.arange(1, h + 1, dtype=np.int64)
            for c in range(3):
                ch = img[:, :, c]
                feats[i, 3 * c] = ch.sum()
                feats[i, 3 * c + 1] = (ch.sum(axis=0) * wx).sum()
                feats[i, 3 * c + 2] = (ch.sum(axis=1) * wy).sum()
        # caption bucket counts: one batched byte-FNV over all tokens,
        # scatter-add into (doc, bucket)
        counts = np.zeros(n, np.int64)
        toks: list[str] = []
        for i, t in enumerate(caps):
            tt = self.tok.findall((t or "").lower())
            toks.extend(tt)
            counts[i] = len(tt)
        cap_vec = np.zeros((n, self.DIM), np.int64)
        if toks:
            buckets = (hash64_str_batch(toks) % np.uint64(self.DIM)).astype(np.int64)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            np.add.at(cap_vec, (doc_idx, buckets), 1)
        score = (feats * cap_vec).sum(axis=1)
        denom = n_px * np.maximum(counts, 1)
        norm = np.where(counts > 0, score // denom, 0)
        kept = (counts > 0) & (norm >= self.threshold)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "clip_score": pa.array(score, pa.int64()),
                "norm_score": pa.array(norm, pa.int64()),
                "kept": pa.array(kept, pa.bool_()),
            }
        )


def clip_score_filter(images_ds, threshold: int = 0, batch_size: int = 512,
                      concurrency=None):
    """images Dataset (image_id, bytes, fmt, caption, ...) -> per-pair
    alignment scores + keep flags over the png rows. Streaming: one
    actor-pool pass, no shuffle, no materialization."""
    return images_ds.map_batches(
        ClipScoreStage,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )
