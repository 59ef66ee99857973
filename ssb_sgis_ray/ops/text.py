"""Text analysis stages for the documents table.

Large-scale training-data operators: token counting, quality scoring,
language-ID, document fingerprinting. All stateful setup (compiled
regexes, stopword tables) happens once per actor in ``__init__``; the
per-batch body is pandas/numpy vectorized.

Exact-oracle discipline: every metric that feeds a DuckDB-checked query
is an INTEGER COUNT (token counts, class-character counts) and filters use
cross-multiplied integer comparisons (``punct * 100 <= chars * 5``), never
float ratios — so engine and SQL can't disagree in the last ulp.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[A-Za-z0-9]+"
DIGIT_RE = r"[0-9]"
PUNCT_RE = r"[.,!?;:]"
UPPER_RE = r"[A-Z]"

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (public common-word lists)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "una", "es", "por"],
    "no": ["og", "det", "som", "av", "en", "til", "er", "ikke"],
}


class TokenStats:
    """Actor stage: per-doc integer text metrics.

    Output columns: doc_id, n_tokens, n_digits, n_punct, n_upper, len_chars.
    Matches DuckDB ``len(regexp_extract_all(text, ...))`` exactly.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.tok = re.compile(TOKEN_RE)
        self.dig = re.compile(DIGIT_RE)
        self.pun = re.compile(PUNCT_RE)
        self.upp = re.compile(UPPER_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        txt = batch[self.text_col].astype(str)
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": txt.map(lambda t: len(self.tok.findall(t))).astype("int64"),
                "n_digits": txt.map(lambda t: len(self.dig.findall(t))).astype("int64"),
                "n_punct": txt.map(lambda t: len(self.pun.findall(t))).astype("int64"),
                "n_upper": txt.map(lambda t: len(self.upp.findall(t))).astype("int64"),
                "len_chars": txt.str.len().astype("int64"),
            }
        )


def quality_filter_mask(stats: pd.DataFrame) -> np.ndarray:
    """Quality heuristic (integer math only):

    keep iff  n_tokens >= 5
          and n_punct * 10 <= len_chars          (≤10% punctuation)
          and n_digits * 2 <= len_chars          (≤50% digits)
          and len_chars between 20 and 100000
    """
    return (
        (stats["n_tokens"] >= 5)
        & (stats["n_punct"] * 10 <= stats["len_chars"])
        & (stats["n_digits"] * 2 <= stats["len_chars"])
        & (stats["len_chars"] >= 20)
        & (stats["len_chars"] <= 100000)
    ).to_numpy()


QUALITY_FILTER_SQL = (
    "n_tokens >= 5 AND n_punct * 10 <= len_chars "
    "AND n_digits * 2 <= len_chars AND len_chars BETWEEN 20 AND 100000"
)


class LangId:
    """Actor stage: stopword-vote language guess.

    predicted = argmax over languages of (# stopword occurrences as
    standalone lowercase tokens); ties and zero votes -> 'und'.
    Deterministic tie-break: lexicographic language code.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.tok = re.compile(r"[a-z]+")
        self.langs = sorted(LANG_STOPWORDS)
        # stopwords as fixed-width numpy arrays for vectorized np.isin —
        # all stopwords are <= 8 chars, so a '<U16' token view can only
        # match on true equality (truncation can't fabricate a stopword)
        self.word_arrs = [
            np.array(sorted(LANG_STOPWORDS[lang]), dtype="<U16")
            for lang in self.langs
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        all_tokens: list[str] = []
        counts = np.zeros(n, dtype=np.int64)
        for d, t in enumerate(batch[self.text_col].astype(str)):
            toks = self.tok.findall(t.lower())  # one C-level pass per doc
            all_tokens.extend(toks)
            counts[d] = len(toks)
        doc_of = np.repeat(np.arange(n), counts)
        tok_arr = np.array(all_tokens, dtype="<U16") if all_tokens else np.empty(0, "<U16")
        # votes[d, li] = stopword occurrences; 5 vectorized isin passes
        # replace the old per-doc × per-token × per-language Python loops
        votes = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li in range(len(self.langs)):
            m = np.isin(tok_arr, self.word_arrs[li])
            if m.any():
                votes[:, li] = np.bincount(doc_of[m], minlength=n)
        best = votes.argmax(axis=1)  # first max = lexicographically smallest
        best_n = votes[np.arange(n), best] if n else np.zeros(0, np.int64)
        lang_arr = np.array(self.langs, dtype=object)
        preds = np.where(best_n > 0, lang_arr[best], "und")
        return pd.DataFrame({self.id_col: batch[self.id_col], "pred_lang": preds})


MOD61 = (1 << 61) - 1


def rolling_fingerprint(texts, base: int = 1000003) -> np.ndarray:
    """Polynomial rolling hash of the full text mod 2^61−1 (document
    fingerprint; order-sensitive unlike a bag-of-words hash).

    Vectorized ACROSS the batch: texts are padded into a byte matrix and
    Horner steps run position-by-position over all rows at once. The
    mulmod stays in uint64 by 32-bit splitting against the Mersenne
    modulus (2^61 ≡ 1), bit-identical to the per-byte Python loop."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bts = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in bts), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.zeros(n, dtype=np.int64)
    arr = np.zeros((n, maxlen), dtype=np.uint64)
    for i, b in enumerate(bts):
        if b:
            arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    M = np.uint64(MOD61)
    bq = np.uint64(base)
    lo32 = np.uint64(0xFFFFFFFF)
    mask29 = np.uint64((1 << 29) - 1)
    c32, c29, c61 = np.uint64(32), np.uint64(29), np.uint64(61)
    for j in range(maxlen):
        active = j < lens
        # h*base (<= 2^81) via 32-bit split, folded with 2^61 ≡ 1 (mod M)
        lo = (h & lo32) * bq
        hi = (h >> c32) * bq
        s = lo + ((hi & mask29) << c32) + (hi >> c29) + arr[:, j]
        s = (s >> c61) + (s & M)
        s = np.where(s >= M, s - M, s)
        h = np.where(active, s, h)
    return h.astype(np.int64)


class Fingerprint:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col],
                "fingerprint": rolling_fingerprint(batch[self.text_col].astype(str)),
            }
        )


def md5_hash_column(texts) -> list[str]:
    """hex md5 per text — matches DuckDB's md5() exactly."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


class Md5Stage:
    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "h": pa.array(md5_hash_column(texts), pa.string()),
            }
        )


class TokenCountPartial:
    """Actor stage: per-batch partial token counts.

    Tokenize (compiled TOKEN_RE, lowercased) and pre-aggregate inside the
    batch so the shuffle moves one row per (token, batch) instead of one
    per token occurrence — the wide-aggregation pattern this module's
    docstring mandates. Shuffle key is a single int64 token-hash
    super-group (string groupbys are ~15x slower on this setup)."""

    def __init__(self, num_groups: int = 256):
        import re

        self.tok = re.compile(TOKEN_RE)
        self.num_groups = num_groups

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in batch["text"].astype(str):
            toks.extend(m.lower() for m in self.tok.findall(t))
        if not toks:
            return pd.DataFrame(
                {"sg": pd.Series(dtype="int64"),
                 "token": pd.Series(dtype="str"),
                 "cnt": pd.Series(dtype="int64")}
            )
        vc = pd.Series(toks).value_counts()
        tokens = vc.index.to_numpy(dtype=object)
        # deterministic cross-process hash (Python's hash() is salted per
        # process — tokens would split across groups and counts would be
        # wrong); vectorized FNV-1a from the dedup module
        from .dedup import hash64_str_batch

        h = hash64_str_batch(list(tokens))
        return pd.DataFrame(
            {
                "sg": (h % np.uint64(self.num_groups)).astype(np.int64),
                "token": tokens,
                "cnt": vc.to_numpy(np.int64),
            }
        )


def top_tokens(docs_ds, k: int = 20, num_groups: int = 256):
    """Exact global top-k most frequent tokens with deterministic ties
    (cnt desc, token asc).

    Plan: partial counts per batch -> ONE shuffle on the int64 hash
    super-group -> in-kernel exact merge per token -> each group emits
    only its own top-k candidates (a token's full count lives in exactly
    one group after the merge, so the global top-k is a subset of the
    per-group top-ks) -> bounded finalize over <= num_groups*k rows."""

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", as_index=False)["cnt"].sum()
        agg = agg.sort_values(["cnt", "token"], ascending=[False, True])
        return agg.head(k)[["token", "cnt"]]

    candidates = (
        docs_ds.map_batches(
            TokenCountPartial, batch_format="pandas", batch_size=4096,
            concurrency=(1, 8), fn_constructor_args=(num_groups,),
        )
        .groupby("sg")
        .map_groups(group_topk, batch_format="pandas")
    )
    # bounded finalize: <= num_groups * k candidate rows
    df = candidates.to_pandas()
    df = df.sort_values(["cnt", "token"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def sequence_pack(docs_ds, budget: int, id_col: str = "doc_id",
                  text_col: str = "text", range_size: int = 4096):
    """Concat-and-split sequence packing: lay every doc's tokens out on one
    global tape (doc_id order), cut the tape every ``budget`` tokens, and
    report per doc its global token offset and the first/last pack it
    lands in — the standard pretraining packing step (documents are
    concatenated and split at context-window boundaries; a long doc spans
    packs, short docs share one).

    Output: (doc_id, n_tokens, tok_offset, pack_first, pack_last) with
    pack = floor(offset / budget); zero-token docs get
    pack_last = pack_first.

    Scale plan — a distributed exclusive prefix sum, no sort shuffle:
      1. one map pass counts tokens per doc and keys each doc by
         ``rng = doc_id // range_size``;
      2. groupby(rng).sum gives per-range totals (#ranges rows — bounded
         and controllable via range_size), scanned exclusively on the
         driver and broadcast;
      3. groupby(rng).map_groups co-locates each range, computes the
         in-range doc_id-ordered cumsum, and adds the broadcast range
         offset. Two small shuffles keyed the same way; per-doc work is
         one compiled findall (inherent).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    tok = re.compile(TOKEN_RE)

    def count_stage(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b[text_col].to_pylist()
        n = np.fromiter(
            (len(tok.findall(t or "")) for t in texts), np.int64, len(texts)
        )
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "rng": pa.array(ids // range_size, pa.int64()),
        })

    counts = docs_ds.map_batches(
        count_stage, batch_format="pyarrow", batch_size=4096
    ).materialize()  # consumed twice (range totals + co-partitioned scan)

    totals = counts.groupby("rng").aggregate(Sum("n_tokens", alias_name="tot"))
    tt = totals.to_pandas()  # one row per range — bounded by design
    tt = tt.sort_values("rng").reset_index(drop=True)
    rngs = tt["rng"].to_numpy().astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(tt["tot"].to_numpy())[:-1]]).astype(
        np.int64
    )
    oref = ray.put((rngs, offs))

    def scan_group(g: pa.Table) -> pa.Table:
        r, o = ray.get(oref)
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d)
        d, n = d[order], n[order]
        base = o[np.searchsorted(r, g["rng"][0].as_py())]
        start = base + np.concatenate([[0], np.cumsum(n)[:-1]])
        pack_first = start // budget
        pack_last = np.where(n > 0, (start + n - 1) // budget, pack_first)
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "tok_offset": pa.array(start, pa.int64()),
            "pack_first": pa.array(pack_first, pa.int64()),
            "pack_last": pa.array(pack_last, pa.int64()),
        })

    return counts.groupby("rng").map_groups(scan_group, batch_format="pyarrow")


class RepetitionStats:
    """Actor stage: Gopher-style intra-document repetition signals —
    the repeated-content quality rules a pretraining pipeline filters on
    (a doc dominated by one token or one bigram is boilerplate/spam).

    Output per doc (integers only, so the SQL oracle is exact):
      n_tokens         lowercase [a-z0-9]+ token count
      n_distinct       distinct tokens
      top_token_count  occurrences of the most frequent token
      top_bigram_count occurrences of the most frequent adjacent bigram
    Filters compare cross-multiplied integers downstream (e.g. flag iff
    top_bigram_count * 5 > n_tokens), never float fractions.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        self.tok = re.compile(r"[a-z0-9]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_tok = np.zeros(n, dtype=np.int64)
        n_dis = np.zeros(n, dtype=np.int64)
        top1 = np.zeros(n, dtype=np.int64)
        top2 = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = self.tok.findall((t or "").lower())
            n_tok[i] = len(toks)
            if not toks:
                continue
            arr = np.array(toks, dtype=object)
            _, cnt = np.unique(arr, return_counts=True)
            n_dis[i] = len(cnt)
            top1[i] = int(cnt.max())
            if len(toks) >= 2:
                big = np.array(
                    [toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)],
                    dtype=object,
                )
                _, c2 = np.unique(big, return_counts=True)
                top2[i] = int(c2.max())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
            "top_token_count": pa.array(top1, pa.int64()),
            "top_bigram_count": pa.array(top2, pa.int64()),
        })


def corpus_stats(docs_ds, group_cols=("source", "lang"),
                 text_col: str = "text"):
    """Per-(source, lang) corpus composition: doc count, total chars,
    total [a-z0-9]+ tokens — the table a pipeline reads before choosing
    mixture weights (``ops/sample.mixture_sample``) or per-source
    quality thresholds.

    Map-side combine: each batch reduces to at most |distinct groups in
    batch| rows (pandas groupby over two short string keys), then one
    tiny keyed groupby sums the partials — the group universe is
    sources x languages, i.e. dozens, so the exchange is negligible at
    any corpus size. Integer sums only.
    """
    from ray.data.aggregate import Sum

    gcols = list(group_cols)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        t = b[text_col].astype(str).str.lower()
        b = b.assign(
            n_docs=np.ones(len(b), dtype=np.int64),
            n_chars=t.str.len().astype(np.int64),
            # pandas .str.count is a C-level regex pass (no Python/row)
            n_tokens=t.str.count(r"[a-z0-9]+").astype(np.int64),
        )
        return (b.groupby(gcols, as_index=False)
                 [["n_docs", "n_chars", "n_tokens"]].sum())

    return (
        docs_ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby(gcols)
        .aggregate(Sum(on="n_docs", alias_name="n_docs"),
                   Sum(on="n_chars", alias_name="n_chars"),
                   Sum(on="n_tokens", alias_name="n_tokens"))
    )


# ---------------------------------------------------------------------------
# Bigram LM surprisal (CCNet-style quality scoring, integer-exact)
# ---------------------------------------------------------------------------

BIGRAM_BROADCAST_LIMIT = 2_000_000
_POW2 = (np.int64(1) << np.arange(63, dtype=np.int64))


def _floor_log2(c: np.ndarray) -> np.ndarray:
    """Exact floor(log2(c)) for int64 counts >= 1 — no float log (a float
    log2 rounds up at counts just below a power of two; DuckDB's side is
    length(bin(c)) - 1, also exact)."""
    return (np.searchsorted(_POW2, c, side="right") - 1).astype(np.int64)


def _bigram_hashes(texts, ids):
    """(doc_per_span, h1, bh, token_counts) for every bigram in a batch.

    Tokens are [a-z0-9]+ of lower(text) FNV-hashed once per batch; the
    bigram hash is h1 * 257 + h2 in wrapping uint64 — mod 2^64 is a ring
    hom, so the SQL oracle's exact HUGEINT sum taken mod 2^64 matches
    bit-for-bit (same argument as dedup._span_hashes_flat). Windows that
    would cross a document boundary are masked out."""
    from .dedup import hash64_str_batch

    tok_re = re.compile(r"[a-z0-9]+")
    all_tokens: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = tok_re.findall(str(t or "").lower())
        all_tokens.extend(toks)
        counts[i] = len(toks)
    T = len(all_tokens)
    if T < 2:
        e = np.empty(0, np.uint64)
        return np.empty(0, np.int64), e, e, counts
    th = hash64_str_batch(all_tokens)
    doc_flat = np.repeat(np.asarray(ids, dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        bh = th[:-1] * np.uint64(257) + th[1:]
    valid = doc_flat[:-1] == doc_flat[1:]
    return doc_flat[:-1][valid], th[:-1][valid], bh[valid], counts


def bigram_surprisal(docs_ds, id_col: str = "doc_id",
                     text_col: str = "text",
                     broadcast_limit: int = BIGRAM_BROADCAST_LIMIT):
    """Per-document bigram-LM surprisal — the CCNet-style "how surprising
    is this document under a corpus LM" quality signal, with the LM the
    corpus's own bigram counts and log2 quantized to integers so the
    score is bit-exact on both engine and SQL sides.

    For each bigram occurrence (a, b):
    ``surprisal += floor(log2 c(a, *)) - floor(log2 c(a, b))`` — an
    integer >= 0 (the conditional count can't exceed its context count).
    Output: (doc_id, n_bigrams, surprisal) for docs with >= 1 bigram.

    Scale plan: pass A streams the corpus emitting per-batch PARTIAL
    (kind, key, c) counts for bigram keys and first-token context keys
    (unique within batch — the map-side combine discipline); the merge is
    dual-plan (driver sum below the envelope, int64-keyed groupby
    beyond). While the merged table fits ``broadcast_limit`` it ships
    once sorted via ray.put and pass B re-streams the corpus with two
    searchsorted lookups per span — no shuffle at all. Beyond the limit,
    pass B emits (doc, k1, k2) span rows and two ``lookup_join``s (which
    themselves degrade to distributed hash joins) attach the flog
    values, then one per-doc groupby sums — all-distributed, no driver
    state. Reference parallel: quality/LM scoring feeding the
    percentile buckets of CCNet-style corpus filtering.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial_counts(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, h1, bh, _ = _bigram_hashes(b[text_col].to_pylist(), ids)
        u1, c1 = np.unique(h1.view(np.int64), return_counts=True)
        u2, c2 = np.unique(bh.view(np.int64), return_counts=True)
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(u1), np.int64),
                                   np.ones(len(u2), np.int64)], pa.int64()),
            "key": pa.array(np.r_[u1, u2], pa.int64()),
            "c": pa.array(np.r_[c1, c2], pa.int64()),
        })

    partials = docs_ds.map_batches(
        partial_counts, batch_format="pyarrow", batch_size=2048
    ).materialize()
    n_partial = partials.count()

    merged = None
    counts_ds = None
    if n_partial <= 4 * broadcast_limit:
        # partials are unique-per-batch: total rows bounded by (distinct
        # keys x batches) — the driver sum dodges the fixed groupby
        # exchange (same dual-plan rule as duplicated_spans)
        merged = (partials.to_pandas()
                  .groupby(["kind", "key"], as_index=False)["c"].sum())
        if len(merged) > broadcast_limit:
            counts_ds = _rdata().from_pandas(merged)
            merged = None
    else:
        counts_ds = (partials.groupby(["kind", "key"])
                     .aggregate(Sum(on="c", alias_name="c"))
                     .materialize())

    if merged is not None:
        # ---- broadcast scoring pass (pandas groupby output is sorted) --
        m0 = merged[merged["kind"] == 0]
        m1 = merged[merged["kind"] == 1]
        ref = ray.put((
            m0["key"].to_numpy(np.int64), _floor_log2(m0["c"].to_numpy(np.int64)),
            m1["key"].to_numpy(np.int64), _floor_log2(m1["c"].to_numpy(np.int64)),
        ))

        def score(b: pa.Table) -> pa.Table:
            uk, uf, bk, bf = ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d, h1, bh, _ = _bigram_hashes(b[text_col].to_pylist(), ids)
            out_ids = np.empty(0, np.int64)
            n_bi = sur = out_ids
            if len(d):
                # every span key is present by construction (pass A saw it)
                contrib = (uf[np.searchsorted(uk, h1.view(np.int64))]
                           - bf[np.searchsorted(bk, bh.view(np.int64))])
                order = np.argsort(ids, kind="stable")
                idx = order[np.searchsorted(ids[order], d)]
                n_all = np.bincount(idx, minlength=len(ids)).astype(np.int64)
                # per-span contribs <= 63, so the float64 bincount sum is
                # exact far beyond any real document length
                s_all = np.bincount(
                    idx, weights=contrib.astype(np.float64),
                    minlength=len(ids),
                ).astype(np.int64)
                m = n_all > 0
                out_ids, n_bi, sur = ids[m], n_all[m], s_all[m]
            return pa.table({
                id_col: pa.array(out_ids, pa.int64()),
                "n_bigrams": pa.array(n_bi, pa.int64()),
                "surprisal": pa.array(sur, pa.int64()),
            })

        return docs_ds.map_batches(score, batch_format="pyarrow",
                                   batch_size=2048)

    # ---- all-distributed fallback: span rows + two lookup joins --------
    from .lookup import lookup_join

    def with_flog(b: pa.Table) -> pa.Table:
        return b.append_column(
            "flog", pa.array(_floor_log2(
                b["c"].to_numpy(zero_copy_only=False).astype(np.int64)
            ), pa.int64()))

    flogged = counts_ds.map_batches(with_flog, batch_format="pyarrow")
    import pyarrow.compute as pc
    uni = flogged.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 0)).select(["key", "flog"]),
        batch_format="pyarrow").materialize()
    bi = flogged.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], 1)).select(["key", "flog"]),
        batch_format="pyarrow").materialize()

    def emit_spans(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d, h1, bh, _ = _bigram_hashes(b[text_col].to_pylist(), ids)
        return pa.table({
            id_col: pa.array(d, pa.int64()),
            "k1": pa.array(h1.view(np.int64), pa.int64()),
            "k2": pa.array(bh.view(np.int64), pa.int64()),
        })

    spans = docs_ds.map_batches(emit_spans, batch_format="pyarrow",
                                batch_size=2048)
    spans = lookup_join(spans, uni, "k1", small_key="key",
                        value_col="flog", out_col="uf")
    spans = lookup_join(spans, bi, "k2", small_key="key",
                        value_col="flog", out_col="bf")

    def contrib(b: pa.Table) -> pa.Table:
        uf = b["uf"].to_numpy(zero_copy_only=False).astype(np.int64)
        bf = b["bf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
            "s": pa.array(uf - bf, pa.int64()),
        })

    return (spans.map_batches(contrib, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum(on="one", alias_name="n_bigrams"),
                       Sum(on="s", alias_name="surprisal")))


def _rdata():
    import ray.data as rd

    return rd


def quality_buckets(docs_ds, n_buckets: int = 3, id_col: str = "doc_id",
                    text_col: str = "text"):
    """CCNet-style quality bucketing: score every document with the
    corpus bigram-LM surprisal, then split the corpus into ``n_buckets``
    value-thresholded buckets (head / middle / tail) at the exact
    ceil(i*n/n_buckets)-th smallest surprisal values.

    Thresholds come from ``ops/quantile.exact_kth_smallest`` (iterative
    histogram refinement — one tree-merged aggregate pass per round,
    O(bins) driver state, no shuffle), so the cut points are EXACT order
    statistics, not approximations, and bucket membership is a pure
    function of the surprisal value: ``bucket = #{thresholds <= s}`` —
    the same rule the SQL oracle replays with window row_numbers. Docs
    with < 2 tokens have no surprisal and are absent, as in
    ``bigram_surprisal``.

    Returns (doc_id, surprisal, bucket), all int64.
    """
    from .quantile import exact_kth_smallest

    surp = (bigram_surprisal(docs_ds, id_col=id_col, text_col=text_col)
            .select_columns([id_col, "surprisal"])
            .materialize())
    n = surp.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "surprisal": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
        }))
    ranks = [(i * n + n_buckets - 1) // n_buckets
             for i in range(1, n_buckets)]
    ts = np.asarray(
        exact_kth_smallest(surp, "surprisal", ranks=ranks), dtype=np.int64
    )

    def bucketize(b: pa.Table) -> pa.Table:
        s = b["surprisal"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (s[:, None] >= ts[None, :]).sum(axis=1).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            "surprisal": pa.array(s, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        })

    return surp.map_batches(bucketize, batch_format="pyarrow")


DF_BROADCAST_LIMIT = 2_000_000


def tfidf_keywords(docs_ds, k: int = 3, id_col: str = "doc_id",
                   text_col: str = "text",
                   broadcast_limit: int = DF_BROADCAST_LIMIT):
    """Top-k TF-IDF keywords per document, integer-exact.

    idf is quantized to ``floor(log2 N) - floor(log2 df)`` (bit-exact on
    both sides — searchsorted powers of two here, length(bin(c))-1 in
    DuckDB), score = tf * idf, ties broken (score desc, token asc). N is
    the number of documents with >= 1 token.

    Plan: pass A streams the corpus emitting per-batch PARTIAL
    (token, df) rows — documents never span batches, so the per-batch
    per-token distinct-doc count IS a df partial; a marker row carries
    the batch's document count. The merge is dual-plan (driver sum below
    the envelope, string-keyed groupby beyond — token strings, not
    hashes, so parity with the SQL oracle is collision-proof). The
    (token -> idf) table ships once sorted and pass B re-streams the
    corpus scoring each document with one get_indexer + lexsort per
    batch. Vocabulary beyond the broadcast limit would need a
    (doc, token, tf) row join on the token key — raise with that
    instruction rather than silently degrade (natural-language vocab
    under Heaps' law stays << 2M for any realistic shard).
    """
    tok_pat = r"[a-z0-9]+"

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        import re as _re

        tok = _re.compile(tok_pat)
        rows: dict[str, int] = {}
        n_docs = 0
        for t in b[text_col].fillna("").astype(str):
            toks = set(tok.findall(t.lower()))
            if not toks:
                continue
            n_docs += 1
            for w in toks:
                rows[w] = rows.get(w, 0) + 1
        rows[""] = n_docs  # marker: "" can't match [a-z0-9]+
        return pd.DataFrame({"token": list(rows), "df": list(rows.values())})

    partials = docs_ds.map_batches(
        df_partial, batch_format="pandas", batch_size=2048
    ).materialize()
    if partials.count() > 4 * broadcast_limit:
        raise ValueError(
            "token vocabulary exceeds the broadcast envelope; score via "
            "(doc, token, tf) rows joined on token instead (see docstring)"
        )
    merged = (partials.to_pandas()
              .groupby("token", as_index=False)["df"].sum()
              .sort_values("token", kind="stable"))
    if len(merged) > broadcast_limit:
        raise ValueError(
            "merged token vocabulary exceeds the broadcast envelope "
            f"({len(merged)} > {broadcast_limit}); score via "
            "(doc, token, tf) rows joined on token instead (see docstring)"
        )
    n_total = int(merged.loc[merged["token"] == "", "df"].sum())
    merged = merged[merged["token"] != ""]
    if n_total == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "token": pa.array([], pa.string()),
            "tfidf": pa.array([], pa.int64()),
        }))
    import ray

    flog_n = int(n_total).bit_length() - 1
    idf = flog_n - _floor_log2(merged["df"].to_numpy(np.int64))
    ref = ray.put((merged["token"].to_numpy(object), idf))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        import re as _re

        vocab, idf_v = ray.get(ref)
        vix = pd.Index(vocab)
        tok = _re.compile(tok_pat)
        ids = b[id_col].to_numpy().astype(np.int64)
        d_ix, t_all = [], []
        for r, t in enumerate(b[text_col].fillna("").astype(str)):
            toks = tok.findall(t.lower())
            d_ix.extend([r] * len(toks))
            t_all.extend(toks)
        if not t_all:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64"),
                                 "token": pd.Series(dtype="str"),
                                 "tfidf": pd.Series(dtype="int64")})
        g = (pd.DataFrame({"d": np.asarray(d_ix, np.int64),
                           "token": t_all})
             .groupby(["d", "token"], as_index=False).size())
        tf = g["size"].to_numpy(np.int64)
        sc = tf * idf_v[vix.get_indexer(g["token"])]
        dv = g["d"].to_numpy(np.int64)
        order = np.lexsort((g["token"].to_numpy(object), -sc, dv))
        dv_s = dv[order]
        starts = np.searchsorted(dv_s, dv_s, side="left")
        rank = np.arange(len(dv_s)) - starts
        keep = order[rank < k]
        return pd.DataFrame({
            id_col: ids[dv[keep]],
            "rank": (rank[rank < k] + 1).astype(np.int64),
            "token": g["token"].to_numpy(object)[keep],
            "tfidf": sc[keep],
        })

    return docs_ds.map_batches(score, batch_format="pandas",
                               batch_size=2048)


class PairCountPartial:
    """Actor stage: per-batch adjacent-token-pair counts, super-grouped
    by a deterministic FNV hash of the pair string (same discipline as
    TokenCountPartial — Python's salted hash() would split a pair across
    groups and corrupt the exact merge)."""

    def __init__(self, num_groups: int = 256):
        import re as _re

        self.tok = _re.compile(r"[a-z0-9]+")
        self.num_groups = num_groups

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pairs: list[str] = []
        for t in batch["text"].fillna("").astype(str):
            toks = self.tok.findall(t.lower())
            pairs.extend(a + " " + b for a, b in zip(toks, toks[1:]))
        if not pairs:
            return pd.DataFrame(
                {"sg": pd.Series(dtype="int64"),
                 "pair": pd.Series(dtype="str"),
                 "cnt": pd.Series(dtype="int64")}
            )
        vc = pd.Series(pairs).value_counts()
        keys = vc.index.to_numpy(dtype=object)
        from .dedup import hash64_str_batch

        h = hash64_str_batch(list(keys))
        return pd.DataFrame({
            "sg": (h % np.uint64(self.num_groups)).astype(np.int64),
            "pair": keys,
            "cnt": vc.to_numpy(np.int64),
        })


def top_bigrams(docs_ds, k: int = 20, num_groups: int = 256):
    """Exact global top-k most frequent ADJACENT token pairs with
    deterministic ties (cnt desc, pair asc) — the merge-candidate
    statistic at the heart of BPE vocabulary training (each BPE round
    merges the current corpus's most frequent adjacent pair).

    Same plan as ``top_tokens``: map-side pair-count partials -> ONE
    shuffle on the int64 hash super-group -> exact in-group merge (a
    pair's full count lives in exactly one group) -> per-group top-k
    candidates -> bounded finalize over <= num_groups * k rows."""

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("pair", as_index=False)["cnt"].sum()
        agg = agg.sort_values(["cnt", "pair"], ascending=[False, True])
        return agg.head(k)[["pair", "cnt"]]

    candidates = (
        docs_ds.map_batches(
            PairCountPartial, batch_format="pandas", batch_size=4096,
            concurrency=(1, 8), fn_constructor_args=(num_groups,),
        )
        .groupby("sg")
        .map_groups(group_topk, batch_format="pandas")
    )
    df = candidates.to_pandas()
    df = df.sort_values(["cnt", "pair"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def dsir_select(docs_ds, target_lang: str = "en", num_buckets: int = 1024,
                threshold: int = 0, id_col: str = "doc_id",
                text_col: str = "text", lang_col: str = "lang"):
    """DSIR-style importance weighting for domain-targeted data selection
    (Data Selection via Importance Resampling, Xie et al. 2023): fit two
    hashed-bigram bag models — the TARGET distribution (docs whose
    ``lang_col`` == ``target_lang``) and the RAW distribution (the whole
    corpus) — then weight every document by its log importance ratio and
    keep docs at or above ``threshold``.

    Integerized scoring (bit-exact on both engine and SQL sides): with
    bucket b = bigram_hash % num_buckets and flog = floor(log2),

        logw(d) = sum over bigram occurrences of d of
                  (flog(ct[b]+1) - flog(T+1)) - (flog(cr[b]+1) - flog(R+1))

    — the +1 is add-one smoothing, the totals T/R make the two models
    comparable (the probability normalizers of the published method in
    the quantized-log world). Output: (doc_id, n_bigrams, logw, kept)
    for docs with >= 1 bigram.

    Scale plan: the model is a FIXED-size dense array (num_buckets
    buckets; DSIR's published setting is 10^4 — broadcastable at any
    corpus size), so the whole op is two streaming passes and ZERO
    shuffles: pass A emits <= num_buckets partial rows per batch
    (map-side bincount combine), the merge is a bounded driver sum,
    the per-bucket score table ships once via ray.put, and pass B
    scores each batch with one direct array lookup + segment sum.
    """
    import ray

    from .dedup import hash64_str_batch

    tok_re_src = r"[a-z0-9]+"
    nb = np.uint64(num_buckets)

    def span_buckets(texts, langs):
        """(doc_local_idx, bucket, is_target_doc flags per row)."""
        tok_re = re.compile(tok_re_src)
        all_tokens: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = tok_re.findall(str(t or "").lower())
            all_tokens.extend(toks)
            counts[i] = len(toks)
        tgt = np.fromiter((l == target_lang for l in langs), dtype=bool,
                          count=len(texts))
        if len(all_tokens) < 2:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    tgt, counts)
        th = hash64_str_batch(all_tokens)
        doc_flat = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        with np.errstate(over="ignore"):
            bh = th[:-1] * np.uint64(257) + th[1:]
        valid = doc_flat[:-1] == doc_flat[1:]
        return (doc_flat[:-1][valid], (bh[valid] % nb).astype(np.int64),
                tgt, counts)

    def partial(b: pa.Table) -> pa.Table:
        d, buck, tgt, _ = span_buckets(b[text_col].to_pylist(),
                                       b[lang_col].to_pylist())
        cr = np.bincount(buck, minlength=num_buckets)
        ct = np.bincount(buck[tgt[d]], minlength=num_buckets)
        nz = cr > 0
        return pa.table({
            "b": pa.array(np.nonzero(nz)[0].astype(np.int64), pa.int64()),
            "ct": pa.array(ct[nz].astype(np.int64), pa.int64()),
            "cr": pa.array(cr[nz].astype(np.int64), pa.int64()),
        })

    # model fit: bounded driver sum (<= num_buckets x batches rows)
    df = docs_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=2048
    ).to_pandas()
    ct = np.zeros(num_buckets, np.int64)
    cr = np.zeros(num_buckets, np.int64)
    np.add.at(ct, df["b"].to_numpy(np.int64), df["ct"].to_numpy(np.int64))
    np.add.at(cr, df["b"].to_numpy(np.int64), df["cr"].to_numpy(np.int64))
    T, R = int(ct.sum()), int(cr.sum())
    val = ((_floor_log2(ct + 1) - _floor_log2(np.int64(T + 1)))
           - (_floor_log2(cr + 1) - _floor_log2(np.int64(R + 1))))
    ref = ray.put(val.astype(np.int64))

    def score(b: pa.Table) -> pa.Table:
        v = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d, buck, _, _ = span_buckets(b[text_col].to_pylist(),
                                     b[lang_col].to_pylist())
        logw = np.zeros(len(ids), np.int64)
        nbi = np.zeros(len(ids), np.int64)
        np.add.at(logw, d, v[buck])
        np.add.at(nbi, d, 1)
        keep = nbi > 0
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "n_bigrams": pa.array(nbi[keep], pa.int64()),
            "logw": pa.array(logw[keep], pa.int64()),
            "kept": pa.array(logw[keep] >= np.int64(threshold), pa.bool_()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               batch_size=2048)


def blocklist_flags(docs_ds, words, num: int = 1, den: int = 25,
                    id_col: str = "doc_id", text_col: str = "text"):
    """C4/Gopher-style blocklist content filter: flag documents whose
    blocklist-token fraction is at least num/den (default 4%). Exact
    integer predicate (den * n_bad >= num * n_tokens) so there is no
    float threshold boundary; keep = NOT flagged.

    One streaming pass, no shuffle: per-word RE2 word-boundary counts via
    pyarrow count_substring_regex (documents are single-space-separated
    word sequences, so \\b-delimited matches == token matches), token
    count from the separator count. Vectorized per batch — no Python
    row loop.
    """
    import re

    import pyarrow.compute as pc

    words = list(words)
    if not words:
        raise ValueError("blocklist_flags needs at least one word")

    def flag(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n_tok = pc.add(pc.count_substring(txt, " "), 1).cast(pa.int64())
        n_bad = None
        for w in words:
            c = pc.count_substring_regex(
                txt, r"\b" + re.escape(w) + r"\b").cast(pa.int64())
            n_bad = c if n_bad is None else pc.add(n_bad, c)
        flagged = pc.greater_equal(
            pc.multiply(pa.scalar(den, pa.int64()), n_bad),
            pc.multiply(pa.scalar(num, pa.int64()), n_tok),
        )
        return pa.table({
            id_col: b[id_col],
            "n_tokens": n_tok,
            "n_bad": n_bad,
            "keep": pc.invert(flagged),
        })

    return docs_ds.map_batches(flag, batch_format="pyarrow",
                               batch_size=65536)


def myers_levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance via Myers' bit-parallel algorithm
    (Myers 1999 / Hyyro 2001): O(|b|) word operations on an |a|-bit
    vector (a Python bigint, so any length). ~100-1000x fewer interpreter
    steps than a row-DP loop — the per-pair kernel of the near-dup
    exact-verify stage."""
    m = len(a)
    if m == 0:
        return len(b)
    peq: dict = {}
    bit = 1
    for ch in a:
        peq[ch] = peq.get(ch, 0) | bit
        bit <<= 1
    full = (1 << m) - 1
    high = 1 << (m - 1)
    pv, mv, score = full, 0, m
    for ch in b:
        eq = peq.get(ch, 0)
        xv = eq | mv
        xh = ((((eq & pv) + pv) ^ pv) | eq) & full
        ph = mv | (full ^ (xh | pv))
        mh = pv & xh
        if ph & high:
            score += 1
        elif mh & high:
            score -= 1
        ph = ((ph << 1) | 1) & full
        mh = (mh << 1) & full
        pv = mh | (full ^ (xv | ph))
        mv = ph & xv
    return score


def edit_distance_pairs(docs_ds, id_col: str = "doc_id",
                        text_col: str = "text", num_buckets: int = 256):
    """Exact edit-distance verify over candidate document pairs — the
    final stage of a near-dup pipeline that MinHash/SimHash candidates
    feed. The candidate rule here is the deterministic (2k, 2k+1) id
    pairing so the kernel is exercised corpus-wide with a closed-form
    SQL counterpart (DuckDB levenshtein); swapping in an LSH candidate
    table changes only the pair_id assignment stage.

    Plan: project (pair_id = id // 2, id, text), ONE pair-bucket shuffle
    (pair members co-locate by construction), Myers bit-parallel DP per
    pair inside the group kernel — each pair independent, embarrassingly
    parallel across buckets."""

    def project(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pair = ids // 2
        return pa.table({
            "pg": pa.array(pair % np.int64(num_buckets), pa.int64()),
            "pair_id": pa.array(pair, pa.int64()),
            id_col: pa.array(ids, pa.int64()),
            text_col: b[text_col],
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair_id", id_col])
        ids = g[id_col].to_numpy(np.int64)
        pairs = g["pair_id"].to_numpy(np.int64)
        texts = g[text_col].to_numpy()
        out_p: list[int] = []
        out_a: list[int] = []
        out_b: list[int] = []
        out_d: list[int] = []
        i = 0
        while i + 1 < len(g):
            if pairs[i] == pairs[i + 1]:
                out_p.append(int(pairs[i]))
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1]))
                out_d.append(myers_levenshtein(texts[i], texts[i + 1]))
                i += 2
            else:
                i += 1  # unpaired trailing id
        return pd.DataFrame({
            "pair_id": np.asarray(out_p, np.int64),
            "doc_a": np.asarray(out_a, np.int64),
            "doc_b": np.asarray(out_b, np.int64),
            "lev": np.asarray(out_d, np.int64),
        })

    return (docs_ds.map_batches(project, batch_format="pyarrow",
                                batch_size=65536)
            .groupby("pg")
            .map_groups(kernel, batch_format="pandas"))
