"""Synthesize a deterministic sf1 corpus (10x sf0.1) for the
scale-sensitivity sweep (r4 verdict next-round #7).

The oracle gate is DIFFERENTIAL (engine vs DuckDB over the SAME parquet),
so content only needs to be schema-compatible and deterministic while
stressing the shuffle/dedup/pair plans:

* key columns get a per-replica offset so every join/geometry derivation
  sees 10x distinct keys;
* document text is word-shuffled per replica (replica 0 verbatim) so the
  minhash/Jaccard pair count does not explode quadratically across
  replicas while real near-dup structure inside each replica survives;
* embeddings are np.roll'ed per replica (cosine structure decorrelated);
* event timestamps keep the original window — 10x density through the
  windowed/as-of plans is exactly the stress wanted.

Usage: python tools/make_sf1.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
OFF = {
    "l_orderkey": 10_000_000, "o_orderkey": 10_000_000,
    "l_partkey": 1_000_000, "p_partkey": 1_000_000,
    "l_suppkey": 100_000, "s_suppkey": 100_000,
    "c_custkey": 1_000_000, "o_custkey": 1_000_000,
    "doc_id": 1_000_000, "vec_id": 1_000_000,
    "event_id": 10_000_000, "user_id": 1_000_000,
}


def _shuffle_words(texts: list[str], doc_ids: np.ndarray) -> list[str]:
    out = []
    for t, d in zip(texts, doc_ids):
        words = t.split(" ")
        rng = np.random.RandomState(int(d) % (2**31))
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def replicate(name: str, src: pa.Table, rep: int) -> pa.Table:
    cols = {}
    for c in src.column_names:
        col = src[c]
        if c in OFF:
            cols[c] = pc.add(col, rep * OFF[c])
        else:
            cols[c] = col
    t = pa.table(cols)
    if name == "documents" and rep > 0:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.set_column(
            t.schema.get_field_index("text"), "text",
            pa.array(_shuffle_words(t["text"].to_pylist(), ids), pa.string()))
    if name == "embeddings" and rep > 0:
        emb = t["embedding"].combine_chunks()
        m = (emb.flatten().to_numpy(zero_copy_only=False)
             .reshape(len(emb), -1))
        rolled = np.roll(m, rep, axis=1)
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array(list(rolled.astype(np.float32)),
                     pa.list_(pa.float32())))
    return t


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    import os

    os.makedirs(dst_dir, exist_ok=True)
    small = {"region", "nation"}  # dimension tables stay as-is
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        src = pq.read_table(f"{src_dir}/{name}.parquet")
        if name in small:
            pq.write_table(src, f"{dst_dir}/{name}.parquet")
            print(name, len(src))
            continue
        parts = [replicate(name, src, r) for r in range(REPLICAS)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst_dir}/{name}.parquet",
                       row_group_size=1 << 17)
        print(name, len(out))


if __name__ == "__main__":
    main()
