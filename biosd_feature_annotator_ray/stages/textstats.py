"""Text-analysis operators for training-data pipelines (graft-added;
not in the reference — SURVEY.md notes the web-scale additions):
language-ID, quality scoring, token counting, document fingerprinting.

All operate on the ``documents``-shaped table (doc_id, text, …) as
vectorized ``map_batches`` kernels; LangId is a stateful actor-pool
class (stopword tables built once per actor).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS = r"\s+"
# BPE-ish word/number/punct splitter for token counting.
_BPE_RE = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def token_count(batch: pa.Table, col: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace token count (matches DuckDB
    ``len(regexp_split_to_array(trim(text),'\\s+'))`` exactly)."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(batch.column(col)), _WS)
    return batch.append_column(out, pc.list_value_length(toks).cast(pa.int64()))


def bpe_token_count(batch: pa.Table, col: str = "text", out: str = "n_bpe_tokens") -> pa.Table:
    """Regex 'BPE-ish' token count (letters / digit runs / punct marks)."""
    n = pc.count_substring_regex(batch.column(col), _BPE_RE)
    return batch.append_column(out, n.cast(pa.int64()))


# ---------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword / repetition signals.
_EN_STOP = frozenset(
    "the a an and or of to in is are was for on with as at by it this that be from".split()
)


def quality_features(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append n_chars_q, n_tokens_q, mean_token_len, punct_ratio,
    digit_ratio, stopword_ratio, quality_score ∈ [0,1]."""
    text = pc.fill_null(batch.column(col), "")
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _WS)
    n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = pc.count_substring_regex(text, r"[^\w\s]").to_numpy(zero_copy_only=False)
    n_digit = pc.count_substring_regex(text, r"\d").to_numpy(zero_copy_only=False)
    # stopword ratio: Arrow list_flatten + utf8_lower + is_in + bincount
    # (no per-token Python — same pattern as quality_counts)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    stop_hits = np.zeros(len(lengths), dtype=np.int64)
    if len(doc_idx):
        hits = pc.is_in(pc.utf8_lower(flat),
                        value_set=pa.array(sorted(_EN_STOP))).to_numpy(zero_copy_only=False)
        stop_hits = np.bincount(doc_idx[hits], minlength=len(lengths))
    stop_ratio = stop_hits / np.maximum(lengths, 1)

    safe_tok = np.maximum(n_tok, 1.0)
    mean_tok_len = (n_chars - (n_tok - 1).clip(min=0)) / safe_tok
    punct_ratio = n_punct / np.maximum(n_chars, 1.0)
    digit_ratio = n_digit / np.maximum(n_chars, 1.0)

    # Heuristic score: reward mid-range length + sane word lengths +
    # some stopwords; punish punctuation/digit walls.
    len_score = np.clip(n_tok / 20.0, 0, 1) * np.clip((2000 - n_tok) / 2000.0, 0, 1)
    word_score = np.exp(-0.5 * ((mean_tok_len - 5.0) / 3.0) ** 2)
    stop_score = np.clip(stop_ratio / 0.2, 0, 1)
    noise_pen = np.clip(1 - 2 * punct_ratio, 0, 1) * np.clip(1 - 2 * digit_ratio, 0, 1)
    score = np.clip(0.35 * len_score + 0.25 * word_score + 0.2 * stop_score + 0.2 * noise_pen, 0, 1)

    out = batch
    for name, arr in [
        ("n_chars_q", n_chars), ("n_tokens_q", n_tok), ("mean_token_len", mean_tok_len),
        ("punct_ratio", punct_ratio), ("digit_ratio", digit_ratio),
        ("stopword_ratio", stop_ratio), ("quality_score", score),
    ]:
        out = out.append_column(name, pa.array(arr, pa.float64()))
    return out


# ---------------------------------------------------------------------------
class LangIdStage:
    """Actor-pool language-ID via stopword/character n-gram heuristic.

    Stateful stage pattern (SURVEY.md §2.3): tables compiled ONCE in
    __init__, per-batch work vectorized with pandas."""

    STOPWORDS = {
        "en": "the and of to in is you that it for on with as are this be at or was",
        "es": "el la de que y en un ser se no por con para su al lo como más pero",
        "de": "der die und das in den von zu mit sich des auf für ist im nicht ein",
        "fr": "le la de et les des en un une du que est pour qui dans par sur au",
    }

    def __init__(self, default: str = "und"):
        self.sets = {lang: frozenset(ws.split()) for lang, ws in self.STOPWORDS.items()}
        self.langs = sorted(self.sets)
        self.default = default
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas().fillna("")
        toks = texts.str.lower().str.findall(self.word_re)
        # Vectorized: explode tokens once, one isin() per language,
        # per-doc counts via bincount over the doc index.
        n_docs = len(texts)
        lengths = toks.str.len().to_numpy(dtype=np.int64)
        doc_idx = np.repeat(np.arange(n_docs), lengths)
        flat = pd.Series([w for ws in toks for w in ws], dtype=object)
        counts = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        if len(flat):
            for j, lang in enumerate(self.langs):
                hits = flat.isin(self.sets[lang]).to_numpy()
                counts[:, j] = np.bincount(doc_idx[hits], minlength=n_docs)
        best_j = counts.argmax(axis=1)
        best_n = counts.max(axis=1, initial=0)
        pred = np.where(best_n > 0, np.array(self.langs, dtype=object)[best_j], self.default)
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


# ---------------------------------------------------------------------------
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable per-token 64-bit hashes (vectorized pandas hash — stable
    across runs/nodes, unlike Python hash())."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_pandas_object(pd.Series(tokens), index=False).to_numpy()


def batch_token_hashes(texts: "pd.Series") -> list[np.ndarray]:
    """Per-doc token-hash arrays for a whole batch with ONE vectorized
    hash call (a per-doc pandas hash call costs ~100µs of Series setup
    each — the dominant cost of the signature stages before this)."""
    toks = [t.split() for t in texts]
    lengths = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    flat: list[str] = [w for ws in toks for w in ws]
    if not flat:
        return [np.empty(0, dtype=np.uint64) for _ in toks]
    all_h = pd.util.hash_pandas_object(pd.Series(flat), index=False).to_numpy()
    return np.split(all_h, np.cumsum(lengths)[:-1])


def rolling_shingle_hashes(tokens: list[str], n: int = 3,
                           token_hashes: np.ndarray | None = None) -> np.ndarray:
    """Rolling (polynomial) hash over token n-grams — the document
    fingerprint primitive. Stable across runs/nodes. Pass
    ``token_hashes`` (from batch_token_hashes) to skip per-doc hashing."""
    th = token_hashes if token_hashes is not None else _token_hashes(tokens)
    if len(th) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(th) < n:
        n = len(th)
    P = np.uint64(1099511628211)
    acc = np.zeros(len(th) - n + 1, dtype=np.uint64)
    for j in range(n):
        acc = acc * P + th[j : len(th) - n + 1 + j]
    return acc


def chunk_documents(batch: pa.Table, chunk_tokens: int = 128, overlap: int = 16,
                    id_col: str = "doc_id", col: str = "text") -> pa.Table:
    """Row-expanding map: split each document into fixed-token chunks
    with overlap (the standard training-data windowing op). Output:
    (doc_id, chunk_idx, chunk_text, n_tokens). Deterministic.

    Fully vectorized (round-1 verdict item 8): tokens are split once
    with an Arrow regex kernel, overlapping chunk windows become one
    flat take-index array (numpy arange/repeat algebra), and the chunk
    texts come from a single ``pc.binary_join`` over a LargeListArray —
    no per-document Python. Semantics identical to the per-row
    ``" ".join(t.split()[st:st+chunk_tokens])`` reference
    implementation (pinned by tests + the DuckDB oracle)."""
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap
    text = pc.fill_null(batch.column(col).combine_chunks(), "")
    if text.type != pa.string():
        text = text.cast(pa.string())
    trimmed = pc.utf8_trim_whitespace(text)
    # after trimming, whitespace-split ≡ Python str.split() (runs
    # collapse, no empties) and is ~3× cheaper than the regex kernel
    toks = pc.utf8_split_whitespace(trimmed)
    La = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    # "" splits to [""]; Python "".split() is [] — zero out empty docs
    L = np.where(pc.equal(trimmed, "").to_numpy(zero_copy_only=False), 0, La)
    n_chunks = np.where(L > 0, (np.maximum(1, L - overlap) - 1) // step + 1, 0)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({
            id_col: pa.array([], batch.schema.field(id_col).type),
            "chunk_idx": pa.array([], pa.int32()),
            "chunk_text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        })
    doc_of_chunk = np.repeat(np.arange(len(L)), n_chunks)
    excl = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_idx = np.arange(total) - np.repeat(excl, n_chunks)
    tok_start = chunk_idx * step
    cl = np.minimum(chunk_tokens, L[doc_of_chunk] - tok_start)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_flat_excl = np.concatenate(([0], np.cumsum(La)[:-1]))
    cs_flat = doc_flat_excl[doc_of_chunk] + tok_start
    cum_cl = np.cumsum(cl)
    idx = np.arange(int(cum_cl[-1])) - np.repeat(cum_cl - cl, cl) + np.repeat(cs_flat, cl)
    taken = flat.take(pa.array(idx))
    lst = pa.LargeListArray.from_arrays(
        pa.array(np.concatenate(([0], cum_cl)), pa.int64()),
        taken.combine_chunks() if isinstance(taken, pa.ChunkedArray) else taken,
    )
    chunk_text = pc.binary_join(lst, " ")
    return pa.table(
        {
            id_col: batch.column(id_col).take(pa.array(doc_of_chunk)),
            "chunk_idx": pa.array(chunk_idx.astype(np.int32)),
            "chunk_text": chunk_text.cast(pa.string()),
            "n_tokens": pa.array(cl.astype(np.int64)),
        }
    )


def train_split(batch: pa.Table, id_col: str = "doc_id",
                fractions: tuple[int, int] = (80, 10)) -> pa.Table:
    """Deterministic train/val/test assignment: md5 of the id → bucket
    0–99 → split. md5 is used (not pandas/xxhash) so the assignment is
    reproducible by ANY system — the DuckDB oracle computes the exact
    same buckets. At 100 TB you'd swap in a vectorized xxhash with the
    same contract."""
    import hashlib

    ids = batch.column(id_col).to_pylist()
    buckets = np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in ids),
        dtype=np.int64, count=len(ids),
    )
    train_f, val_f = fractions
    split = np.where(buckets < train_f, "train",
                     np.where(buckets < train_f + val_f, "val", "test"))
    out = batch.append_column("bucket", pa.array(buckets))
    return out.append_column("split", pa.array(split.astype(object), pa.string()))


def fingerprint(batch: pa.Table, col: str = "text", k: int = 8, ngram: int = 3) -> pa.Table:
    """Winnowing-style fingerprint: the k smallest rolling-hash values
    of the token n-gram stream, packed to a hex digest; plus a stable
    64-bit content hash of the RAW text (exact-identity key — an XOR of
    shingle hashes was order-invariant and cancelled even-count
    shingles, colliding e.g. 'a b a b a b' with 'b a b a b a').
    Near-identical docs share most fingerprint minima."""
    texts = batch.column(col).to_pandas().fillna("")
    th_per_doc = batch_token_hashes(texts)
    digests = []
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            h = rolling_shingle_hashes([], ngram, token_hashes=th_per_doc[i])
            if len(h) == 0:
                digests.append("")
                continue
            mins = np.sort(h)[:k]
            digests.append("".join(f"{m:016x}" for m in mins))
    full = pd.util.hash_pandas_object(texts, index=False).to_numpy()
    out = batch.append_column("fingerprint", pa.array(digests, pa.string()))
    return out.append_column("content_hash", pa.array(full))


def quality_counts(batch: pa.Table, id_col: str = "doc_id", col: str = "text") -> pa.Table:
    """Integer quality signals (the exact-arithmetic core of
    quality_features, emitted as BIGINT so a SQL oracle reproduces them
    bit-for-bit): whitespace token count, punctuation marks, digit
    chars, and English stopword hits. Both sides use RE2 regex
    semantics (Arrow kernels here, DuckDB regexp_* in the oracle)."""
    text = pc.fill_null(batch.column(col), "")
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _WS)
    n_tok = pc.list_value_length(toks).cast(pa.int64())
    n_punct = pc.count_substring_regex(text, r"[^\w\s]").cast(pa.int64())
    n_digit = pc.count_substring_regex(text, r"\d").cast(pa.int64())
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    stop = np.zeros(len(lengths), dtype=np.int64)
    if len(doc_idx):
        low = pc.utf8_lower(flat)
        hits = pc.is_in(low, value_set=pa.array(sorted(_EN_STOP))).to_numpy(
            zero_copy_only=False)
        stop = np.bincount(doc_idx[hits], minlength=len(lengths))
    return pa.table({
        id_col: batch.column(id_col),
        "n_tokens_q": n_tok,
        "n_punct": n_punct,
        "n_digit": n_digit,
        "n_stop": pa.array(stop.astype(np.int64)),
    })


def repetition_stats(batch: pa.Table, id_col: str = "doc_id", col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document: total whitespace
    tokens, distinct-token ratio and the most-frequent token's share.
    Boilerplate/spam pages have LOW distinct_ratio and HIGH
    top_token_share; both are pure divisions of exact integer counts,
    so the DuckDB oracle reproduces them bit-for-bit.

    Token semantics match ``token_count`` (regex split of the trimmed
    text — an empty document yields the single token '')."""
    text = pc.fill_null(batch.column(col), "")
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _WS)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    if len(doc_idx):
        df = pd.DataFrame({"d": doc_idx, "t": flat.to_pandas()})
        per = df.groupby(["d", "t"], sort=False).size()
        by_doc = per.groupby(level=0)
        distinct = np.zeros(len(lengths), dtype=np.int64)
        topcnt = np.zeros(len(lengths), dtype=np.int64)
        sizes = by_doc.size()
        maxes = by_doc.max()
        distinct[sizes.index.to_numpy()] = sizes.to_numpy()
        topcnt[maxes.index.to_numpy()] = maxes.to_numpy()
    else:
        distinct = np.zeros(0, dtype=np.int64)
        topcnt = np.zeros(0, dtype=np.int64)
    safe = np.maximum(lengths, 1).astype(np.float64)
    out = batch.select([id_col])
    out = out.append_column("n_tokens_r", pa.array(lengths))
    out = out.append_column("distinct_ratio", pa.array(distinct / safe, pa.float64()))
    out = out.append_column("top_token_share", pa.array(topcnt / safe, pa.float64()))
    return out


def top_ngrams(
    docs: "ray.data.Dataset",
    n: int = 2,
    k: int = 20,
    col: str = "text",
) -> pa.Table:
    """Corpus-level top-k token n-grams with counts — the n-gram LM /
    boilerplate-phrase census. Map-side partial counts (one pandas
    value_counts per batch over vectorized shifted-token joins) → Sum
    groupby keyed by the ngram → sort desc + limit. Only the k result
    rows reach the driver; the shuffle carries pre-combined (ngram,
    partial-count) rows, not token streams."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(col), "")
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _WS)
        lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_arr = pc.list_flatten(toks)
        if isinstance(flat_arr, pa.ChunkedArray):
            flat_arr = flat_arr.combine_chunks()
        flat = flat_arr.to_pandas()
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        if len(flat) < n:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        grams = flat.iloc[: len(flat) - n + 1].reset_index(drop=True)
        same_doc = np.ones(len(grams), dtype=bool)
        for j in range(1, n):
            grams = grams + " " + flat.iloc[j : len(flat) - n + 1 + j].reset_index(drop=True)
            same_doc &= doc_idx[: len(grams)] == doc_idx[j : len(grams) + j]
        vc = grams[same_doc].value_counts()
        return pa.table({"ngram": pa.array(vc.index.to_numpy(), pa.string()),
                         "cnt": pa.array(vc.to_numpy().astype(np.int64))})

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="n"))
    )

    # Exact top-k without a global sort: groupby output blocks hold
    # disjoint key sets, so each block's local top-k then one driver
    # merge of ≤ blocks×k rows is the true global top-k (a full sort
    # would shuffle the entire vocabulary).
    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["n", "ngram"], ascending=[False, True],
                           kind="mergesort").head(k),
            preserve_index=False)

    top = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if "n" not in top.columns:  # fully empty input → schema-less empty
        return pa.table({"ngram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    top = top.sort_values(["n", "ngram"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    top["n"] = top["n"].astype("int64")
    return pa.Table.from_pandas(top[["ngram", "n"]], preserve_index=False)


def _ws_doc_tokens(batch: pa.Table, col: str):
    """(doc_ordinal, term) pairs via Arrow kernels — lower → trim →
    \\s+ split → drop the '' token an empty doc yields; exactly Python
    ``text.lower().split()`` / DuckDB regexp_split_to_array(trim(
    lower(text))) semantics. Shared by tfidf_top_terms and
    cooccurrence_pmi."""
    text = pc.fill_null(batch.column(col), "")
    if text.type != pa.string():
        text = text.cast(pa.string())
    lists = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(text)), _WS)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return parent[keep], flat.filter(pa.array(keep))


def tfidf_top_terms(
    docs: "ray.data.Dataset",
    k: int = 5,
    min_df: int = 1,
    max_vocab: int = 1_000_000,
    id_col: str = "doc_id",
    col: str = "text",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per document: (doc_id, term, score, rank).

    Two-pass Ray-Data shape: (1) document frequencies via a map-side
    doc-distinct term explode + the distinct_counts bucket reduce —
    pruned to ``min_df``/``max_vocab`` and broadcast via ray.put (the
    IDF table is the SMALL side; at web scale min_df/max_vocab keep it
    broadcastable); (2) per-batch vectorized term counts scored
    tf·log(N/(1+df)) with a local top-k. Scores are deterministic;
    ties break by term asc."""
    import math

    import ray as _ray

    from .canonicalize import distinct_counts

    def _tokens(batch: pa.Table):
        return _ws_doc_tokens(batch, col)

    def doc_distinct_terms(batch: pa.Table) -> pa.Table:
        # per-doc DISTINCT terms, no per-row Python: Arrow group_by on
        # the (doc ordinal, term) pair (r02 verdict item 4)
        doc_i, terms = _tokens(batch)
        pairs = pa.table({"doc_i": pa.array(doc_i), "term": terms})
        return pairs.group_by(["doc_i", "term"]).aggregate([]).select(["term"])

    n_docs = docs.count()
    df_tbl = distinct_counts(
        docs.map_batches(doc_distinct_terms, batch_format="pyarrow", batch_size=65536),
        "term", nb=nb,
    ).to_pandas()
    df_tbl = df_tbl[df_tbl["count"] >= min_df]
    if len(df_tbl) > max_vocab:
        # deterministic vocabulary boundary: ties at the cutoff break
        # by term asc, not by distributed-reduce arrival order
        df_tbl = df_tbl.sort_values(["count", "term"], ascending=[False, True],
                                    kind="mergesort").head(max_vocab)
    idf = {t: math.log(n_docs / (1.0 + c)) for t, c in
           zip(df_tbl["term"], df_tbl["count"])}
    idf_ref = _ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _r

        lut = _r.get(idf_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        doc_i, terms = _tokens(batch)
        flat = pd.DataFrame({"doc_i": doc_i, "term": terms.to_pandas()})
        if flat.empty:
            return pa.table({id_col: pa.array([], batch.schema.field(id_col).type),
                             "term": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64()),
                             "rank": pa.array([], pa.int32())})
        tf = flat.groupby(["doc_i", "term"], sort=False).size().reset_index(name="tf")
        tf["idf"] = tf["term"].map(lut)
        tf = tf.dropna(subset=["idf"])
        tf["score"] = tf["tf"] * tf["idf"]
        tf = tf.sort_values(["doc_i", "score", "term"], ascending=[True, False, True],
                            kind="mergesort")
        top = tf.groupby("doc_i", sort=False).head(k).copy()
        top["rank"] = top.groupby("doc_i", sort=False).cumcount() + 1
        return pa.table({
            id_col: pa.array(ids[top["doc_i"].to_numpy()]),
            "term": pa.array(top["term"].to_numpy(), pa.string()),
            "score": pa.array(np.round(top["score"].to_numpy(), 6), pa.float64()),
            "rank": pa.array(top["rank"].to_numpy().astype(np.int32)),
        })

    return docs.map_batches(score, batch_format="pyarrow", batch_size=65536)


def unigram_logprob_score(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    col: str = "text",
    vocab_hash_bits: int = 18,
) -> "ray.data.Dataset":
    """Per-document mean negative log-probability under a corpus-level
    hashed-unigram language model — the dependency-free stand-in for a
    KenLM perplexity quality filter. Output: (doc_id, n_tokens_lm,
    avg_neg_logprob); repetitive/common-token docs score LOW,
    rare-token gibberish scores HIGH.

    Scale shape: token counts are FEATURE-HASHED into 2^bits buckets,
    so pass 1 reduces to a fixed-size count vector (2 MB at 2^18 —
    broadcastable regardless of corpus vocabulary), pass 2 scores every
    doc with one vectorized lookup. Laplace-smoothed; deterministic
    (stable 64-bit token hash)."""
    import ray as _ray

    V = 1 << vocab_hash_bits
    mask = np.uint64(V - 1)

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pandas().fillna("")
        th = batch_token_hashes(texts)
        if not len(th):
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        flat = np.concatenate([t for t in th]) if len(th) else np.empty(0, np.uint64)
        if len(flat) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        ids = (flat & mask).astype(np.int64)
        c = np.bincount(ids, minlength=V)
        nz = np.flatnonzero(c)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(c[nz].astype(np.int64))})

    part = docs.map_batches(partial_counts, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
    counts = np.zeros(V, dtype=np.int64)
    if not part.empty:
        g = part.groupby("bucket")["cnt"].sum()
        counts[g.index.to_numpy()] = g.to_numpy()
    total = int(counts.sum())
    logprob = np.log(counts + 1.0) - np.log(total + V)  # Laplace
    ref = _ray.put(logprob)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _r

        lp = _r.get(ref)
        texts = batch.column(col).to_pandas().fillna("")
        th = batch_token_hashes(texts)
        lengths = np.fromiter((len(t) for t in th), np.int64, count=len(th))
        flat = np.concatenate(th) if lengths.sum() else np.empty(0, np.uint64)
        doc_idx = np.repeat(np.arange(len(th)), lengths)
        neg = -lp[(flat & mask).astype(np.int64)]
        sums = np.bincount(doc_idx, weights=neg, minlength=len(th))
        avg = sums / np.maximum(lengths, 1)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens_lm": pa.array(lengths),
            "avg_neg_logprob": pa.array(np.round(avg, 6), pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow", batch_size=65536)


def _batch_gram_hashes(texts: "pd.Series", k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat rolling k-gram hashes for a whole batch with ONE vectorized
    token-hash call: returns ``(gh uint64, doc_idx int64)`` — one entry
    per gram occurrence. Docs with < k tokens contribute no grams
    (strict, matching SQL ``range`` semantics — unlike
    rolling_shingle_hashes which shrinks n)."""
    toks = [t.split() for t in texts]
    lengths = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    flat = [w for ws in toks for w in ws]
    if not flat:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    th = pd.util.hash_pandas_object(pd.Series(flat), index=False).to_numpy()
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    m = len(th) - k + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    P = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * P + th[j : m + j]
    # a window is a real k-gram only when its first and last token
    # belong to the same document
    valid = doc_idx[:m] == doc_idx[k - 1 :]
    return acc[valid], doc_idx[:m][valid]


def decontaminate(
    train: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    k: int = 3,
    id_col: str = "doc_id",
    col: str = "text",
) -> "ray.data.Dataset":
    """Benchmark decontamination — flag every training document that
    shares at least one token k-gram with a held-out evaluation set
    (the standard n-gram-overlap contamination check run before
    training on web text).

    Output: ``id_col, n_hits, contaminated`` for every train doc —
    ``n_hits`` = number of gram OCCURRENCES in the doc that appear
    anywhere in the benchmark, ``contaminated`` = n_hits > 0. Docs
    shorter than k tokens are kept with n_hits = 0.

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval suites are MBs against TBs of train), so its distinct gram
    hashes are reduced distributedly (per-batch np.unique), collected
    once, and broadcast via ``ray.put`` — the 100-TB train side then
    streams through a single stateless map_batches doing a sorted
    searchsorted membership test; no shuffle touches the corpus. Gram
    identity travels as a 64-bit rolling hash (collision odds ~m²/2⁶⁵);
    the DuckDB oracle twin joins on gram STRINGS and matches exactly at
    test scale. If the benchmark ever outgrew driver memory, the
    fallback is a bucketed semi join on the gram hash
    (stages/join.py::shuffle_hash_join how="semi").
    """
    import ray

    def bench_grams(batch: pa.Table) -> pa.Table:
        gh, _ = _batch_gram_hashes(batch.to_pandas()[col].fillna(""), k)
        return pa.table({"gh": pa.array(np.unique(gh).view(np.int64))})

    parts = [
        t.column("gh").to_numpy()
        for t in bench.map_batches(bench_grams, batch_format="pyarrow",
                                   batch_size=65536).iter_batches(batch_format="pyarrow")
    ]
    bench_set = (np.unique(np.concatenate(parts)) if parts
                 else np.empty(0, np.int64))
    ref = ray.put(bench_set)

    def score(batch: pa.Table) -> pa.Table:
        bs = ray.get(ref)  # zero-copy view from the object store
        df = batch.to_pandas()
        gh, doc_idx = _batch_gram_hashes(df[col].fillna(""), k)
        hits = np.zeros(len(df), np.int64)
        if gh.size and bs.size:
            g = gh.view(np.int64)
            pos = np.searchsorted(bs, g)
            found = (pos < bs.size) & (bs[np.minimum(pos, bs.size - 1)] == g)
            hits = np.bincount(doc_idx[found], minlength=len(df)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })

    return train.map_batches(score, batch_format="pyarrow", batch_size=65536)


def dup_ngram_stats(
    docs: "ray.data.Dataset",
    k: int = 5,
    id_col: str = "doc_id",
    col: str = "text",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Cross-document duplicate n-gram share per document — the
    Dolma/Gopher-style curation signal "what fraction of this doc's
    word k-grams also occur in OTHER documents" (boilerplate and
    templated spam score high; unique prose scores low).

    Output: id_col, n_grams (gram occurrences = n_tok−k+1),
    dup_grams (occurrences whose gram appears in >1 distinct doc),
    dup_share = dup_grams / n_grams. Docs with < k tokens emit no row.

    Scale shape: gram identity travels as a 64-bit rolling hash, never
    the gram text; stage 1 emits per-(doc, gram) counts (map-side
    reduced), one bucket shuffle on the gram hash counts distinct docs
    per gram INSIDE each bucket group, and only per-doc partial sums
    move through the second (doc-keyed, pre-reduced) shuffle. Hash
    collisions merge two grams with odds ~m²/2⁶⁵ — negligible; the
    DuckDB oracle twin uses the gram STRINGS and matches exactly at
    test scale.
    """
    import ray.data  # noqa: F401  (type only)
    from ray.data.aggregate import Sum

    from .canonicalize import _add_bucket, _B

    P = np.uint64(1099511628211)
    empty = pa.schema([pa.field(id_col, pa.int64()), pa.field("gh", pa.int64()),
                       pa.field("occ", pa.int64())])

    def grams(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        texts = df[col].fillna("")
        toks = [t.split() for t in texts]
        lengths = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
        flat = [w for ws in toks for w in ws]
        if not flat:
            return _add_bucket(empty.empty_table(), ["gh"], nb)
        th = pd.util.hash_pandas_object(pd.Series(flat), index=False).to_numpy()
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        m = len(th) - k + 1
        if m <= 0:
            return _add_bucket(empty.empty_table(), ["gh"], nb)
        with np.errstate(over="ignore"):
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                acc = acc * P + th[j : m + j]
        # a window is a real k-gram only when its first and last token
        # belong to the same document
        valid = doc_idx[:m] == doc_idx[k - 1 :]
        g = pd.DataFrame({
            id_col: df[id_col].to_numpy()[doc_idx[:m][valid]],
            "gh": acc[valid].view(np.int64),
        })
        out = g.groupby([id_col, "gh"], sort=False).size().reset_index(name="occ")
        return _add_bucket(pa.Table.from_pandas(out, preserve_index=False), ["gh"], nb)

    def per_gram_bucket(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        # rows are per (doc, gram): group size == distinct docs holding it
        nd = df.groupby("gh", sort=False)["occ"].transform("size")
        df["dup_occ"] = np.where(nd.to_numpy() > 1, df["occ"].to_numpy(), 0)
        part = df.groupby(id_col, as_index=False).agg(
            n_part=("occ", "sum"), dup_part=("dup_occ", "sum"))
        return pa.Table.from_pandas(part, preserve_index=False)

    def share(batch: pa.Table) -> pa.Table:
        n = batch.column("n_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dup_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({id_col: batch.column(id_col),
                      "n_grams": pa.array(n), "dup_grams": pa.array(d)})
        return t.append_column("dup_share", pa.array(d.astype(np.float64) / n, pa.float64()))

    return (
        docs.map_batches(grams, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(per_gram_bucket, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("n_part", alias_name="n_grams"),
                   Sum("dup_part", alias_name="dup_grams"))
        .map_batches(share, batch_format="pyarrow")
    )


def bm25_topk(
    docs: "ray.data.Dataset",
    terms: list[str],
    topk: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    col: str = "text",
) -> "pa.Table":
    """BM25 ranked retrieval: score every document against a bag-of-words
    query and return the global top-k — the classic IR primitive a
    web-corpus engine needs next to ANN (Robertson/Sparck-Jones BM25,
    Lucene's idf = ln((N-df+0.5)/(df+0.5)+1) variant).

    Two streaming passes, no corpus shuffle:
      1. stats pass — per-batch partials (n_docs, Σdl, per-term df)
         reduced by a tiny Dataset.sum; corpus stats never leave the
         aggregate.
      2. score pass — (N, avgdl, df) broadcast in the task closure;
         per-batch vectorized tf (one isin/bincount per term), local
         top-k, and a final merge of ≤ topk·n_batches partial rows.

    Scores are rounded half-away-from-zero to 6 decimals BEFORE the
    cut so the ranking is stable against float summation order (the
    DuckDB oracle sums per-term contributions in unspecified order;
    1-ulp drift would otherwise flip exact ties at the boundary).
    """
    terms = list(terms)
    T = len(terms)

    def partial_stats(batch: pa.Table) -> pa.Table:
        texts = batch.to_pandas()[col].fillna("")
        toks = [t.split() for t in texts]
        lengths = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        flat = pd.Series([w for ws in toks for w in ws], dtype=object)
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        cols = {"n": pa.array([len(texts)], pa.int64()),
                "dl": pa.array([int(lengths.sum())], pa.int64())}
        for i, t in enumerate(terms):
            if len(flat):
                hit = np.bincount(doc_idx[(flat == t).to_numpy()],
                                  minlength=len(texts))
                cols[f"df_{i}"] = pa.array([int((hit > 0).sum())], pa.int64())
            else:
                cols[f"df_{i}"] = pa.array([0], pa.int64())
        return pa.table(cols)

    s = docs.map_batches(partial_stats, batch_format="pyarrow",
                         batch_size=65536).sum(["n", "dl"] + [f"df_{i}" for i in range(T)])
    N = (s or {}).get("sum(n)") or 0
    sdl = (s or {}).get("sum(dl)") or 0
    df_vec = np.array([(s or {}).get(f"sum(df_{i})") or 0 for i in range(T)],
                      np.float64)
    if N == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    avgdl = float(sdl) / float(N)
    idf = np.log((N - df_vec + 0.5) / (df_vec + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        bdf = batch.to_pandas()
        toks = [t.split() for t in bdf[col].fillna("")]
        lengths = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        flat = pd.Series([w for ws in toks for w in ws], dtype=object)
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        sc = np.zeros(len(bdf), np.float64)
        denom_dl = k1 * (1.0 - b + b * lengths.astype(np.float64) / avgdl)
        for i, t in enumerate(terms):
            tf = (np.bincount(doc_idx[(flat == t).to_numpy()], minlength=len(bdf))
                  .astype(np.float64) if len(flat) else np.zeros(len(bdf)))
            sc += idf[i] * tf * (k1 + 1.0) / (tf + denom_dl)
        # DuckDB-compatible round (half away from zero) BEFORE the cut
        sc = np.sign(sc) * np.floor(np.abs(sc) * 1e6 + 0.5) / 1e6
        keep = sc > 0
        part = pd.DataFrame({id_col: bdf[id_col].to_numpy()[keep], "score": sc[keep]})
        part = part.sort_values(["score", id_col],
                                ascending=[False, True]).head(topk)
        return pa.Table.from_pandas(part, preserve_index=False)

    parts = docs.map_batches(score, batch_format="pyarrow",
                             batch_size=65536).to_pandas()
    out = (parts.sort_values(["score", id_col], ascending=[False, True])
           .head(topk).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def token_entropy(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    col: str = "text",
    decimals: int = 6,
) -> "ray.data.Dataset":
    """Per-document Shannon entropy of the token distribution (nats) —
    the information-density quality signal (low entropy = repetitive /
    template text; pairs with repetition_stats' exact ratios).

    Stateless vectorized map: per batch one pandas groupby produces
    (doc, token) counts, entropy comes from the algebraic form
    ``ln(n) − Σ c·ln(c) / n`` (counts are exact ints; one log per
    DISTINCT (doc, token), summed per doc with a groupby). Empty /
    whitespace-only docs get entropy 0."""

    def ent(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pandas().fillna("")
        toks = [t.split() for t in texts]
        lengths = np.fromiter((len(x) for x in toks), np.int64,
                              count=len(toks))
        flat = pd.DataFrame({
            "d": np.repeat(np.arange(len(toks)), lengths),
            "t": [w for ws in toks for w in ws]})
        c = flat.groupby(["d", "t"], sort=False).size().reset_index(name="c")
        cv = c["c"].to_numpy(dtype=np.float64)
        c["cl"] = cv * np.log(cv)
        per_doc = c.groupby("d")["cl"].sum()
        n = lengths.astype(np.float64)
        s = np.zeros(len(toks), np.float64)
        s[per_doc.index.to_numpy()] = per_doc.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            e = np.where(lengths > 0, np.log(np.maximum(n, 1.0)) - s / np.maximum(n, 1.0), 0.0)
        e = np.sign(e) * np.floor(np.abs(e) * 10.0**decimals + 0.5) / 10.0**decimals
        return pa.table({id_col: batch.column(id_col),
                         "entropy": pa.array(e, pa.float64())})

    return docs.map_batches(ent, batch_format="pyarrow", batch_size=65536)


def nb_train(
    docs: "ray.data.Dataset",
    label_col: str,
    col: str = "text",
    bits: int = 16,
    alpha: float = 1.0,
):
    """Train a feature-hashed multinomial Naive Bayes text classifier
    in ONE streamed pass: per batch, tokens hash into 2^bits buckets
    and collapse to per-(label, bucket) count partials; a tiny groupby
    sums them. The model is a FIXED-SIZE dense matrix (labels × 2^bits
    int64) + label doc counts — broadcastable state like the hashed
    unigram LM, independent of corpus size.

    Returns ``(labels, log_prior, log_cond)`` numpy arrays with
    Laplace smoothing ``alpha``.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_strings

    m = 1 << bits
    mask = np.uint64(m - 1)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(col).to_pandas().fillna("")
        labs = batch.column(label_col).to_pandas().fillna("")
        toks = [t.split() for t in texts]
        lengths = np.fromiter((len(x) for x in toks), np.int64,
                              count=len(toks))
        flat_lab = np.repeat(labs.to_numpy(dtype=object), lengths)
        words = [w for ws in toks for w in ws]
        h = (hash_strings(pa.array(words, pa.string())) & mask).astype(
            np.int64) if words else np.array([], np.int64)
        df = pd.DataFrame({"label": flat_lab, "b": h})
        g = df.groupby(["label", "b"], sort=False).size().reset_index(
            name="n")
        docs_part = (pd.DataFrame({"label": labs})
                     .groupby("label", sort=False).size()
                     .reset_index(name="n"))
        docs_part["b"] = -1  # sentinel row: per-label doc count
        return pa.Table.from_pandas(
            pd.concat([g, docs_part[["label", "b", "n"]]],
                      ignore_index=True), preserve_index=False)

    agg = (docs.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
           .groupby(["label", "b"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    labels = np.array(sorted(agg["label"].unique()), dtype=object)
    lidx = {l: i for i, l in enumerate(labels)}
    counts = np.zeros((len(labels), m), dtype=np.int64)
    docn = np.zeros(len(labels), dtype=np.int64)
    for lab, b, n in zip(agg["label"], agg["b"], agg["n"]):
        if b < 0:
            docn[lidx[lab]] = n
        else:
            counts[lidx[lab], int(b)] = n
    log_prior = np.log(docn / docn.sum())
    tot = counts.sum(axis=1, keepdims=True)
    log_cond = np.log((counts + alpha) / (tot + alpha * m))
    return labels, log_prior, log_cond


def nb_predict(
    docs: "ray.data.Dataset",
    model,
    id_col: str = "doc_id",
    col: str = "text",
    bits: int = 16,
    out: str = "pred",
) -> "ray.data.Dataset":
    """Score documents against a broadcast NB model: per batch one
    sparse (doc × bucket) count build + a dense matmul against
    ``log_cond.T`` — vectorized, no per-token Python in the score."""
    import ray as _ray

    from ..functions.hashing import hash_strings

    labels, log_prior, log_cond = model
    ref = _ray.put((labels, log_prior, log_cond))
    m = 1 << bits
    mask = np.uint64(m - 1)

    def score(batch: pa.Table) -> pa.Table:
        labs, lp, lc = _ray.get(ref)
        texts = batch.column(col).to_pandas().fillna("")
        toks = [t.split() for t in texts]
        lengths = np.fromiter((len(x) for x in toks), np.int64,
                              count=len(toks))
        words = [w for ws in toks for w in ws]
        h = (hash_strings(pa.array(words, pa.string())) & mask).astype(
            np.int64) if words else np.array([], np.int64)
        di = np.repeat(np.arange(len(toks)), lengths)
        # scores = lp + Σ_tokens lc[:, bucket] — accumulate per doc
        S = np.tile(lp, (len(toks), 1))
        np.add.at(S, di, lc[:, h].T)
        pred = labs[S.argmax(axis=1)]
        return pa.table({id_col: batch.column(id_col),
                         out: pa.array(list(pred), pa.string())})

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=65536)


def source_profile(
    docs: "ray.data.Dataset",
    key_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-domain corpus census (the curation dashboard for a crawled
    corpus): docs, mean length, language diversity, english share per
    ``key_col``. Map-side pre-combine to (key, lang) partials — only
    one tiny row per (domain, language, batch) crosses the wire — then
    one bucket shuffle keyed on the domain.

    Output: key, n_docs, avg_chars (round 2), n_langs, en_share
    (round 4)."""
    from .canonicalize import _add_bucket, _B

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, lang_col, chars_col]).to_pandas()
        g = (df.groupby([key_col, lang_col], dropna=False, sort=False)
             .agg(n=(chars_col, "size"), sum_chars=(chars_col, "sum"))
             .reset_index())
        return _add_bucket(pa.Table.from_pandas(g, preserve_index=False),
                           [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        bylang = (df.groupby([key_col, lang_col], dropna=False, sort=False)
                  .agg(n=("n", "sum"), sum_chars=("sum_chars", "sum"))
                  .reset_index())
        # dropna=False throughout: the null-source group is a real row
        # of the census (SQL GROUP BY keeps it), not droppable noise;
        # n_en rides the same agg (a .map over a NaN-keyed index would
        # silently miss the null group's english count)
        bylang["n_en"] = np.where(bylang[lang_col] == "en",
                                  bylang["n"], 0)
        tot = (bylang.groupby(key_col, sort=False, dropna=False)
               .agg(n_docs=("n", "sum"), sum_chars=("sum_chars", "sum"),
                    n_langs=(lang_col, "nunique"),
                    n_en=("n_en", "sum"))
               .reset_index())
        # half-away-from-zero rounding (DuckDB round()); numpy/pandas
        # .round is half-even and diverges on exact .xx5 midpoints,
        # which ratios of small integer sums DO hit
        ac = (tot["sum_chars"] / tot["n_docs"]).to_numpy()
        tot["avg_chars"] = np.floor(np.abs(ac) * 100 + 0.5) / 100 * np.sign(ac)
        es = (tot["n_en"] / tot["n_docs"]).to_numpy()
        tot["en_share"] = np.floor(es * 1e4 + 0.5) / 1e4
        out = tot[[key_col, "n_docs", "avg_chars", "n_langs", "en_share"]]
        out = out.astype({"n_docs": "int64", "n_langs": "int64"})
        return pa.Table.from_pandas(out, preserve_index=False)

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def unigram_nll_exact(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    col: str = "text",
    max_vocab: int = 65536,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Exact-token unigram LM negative log-likelihood per document —
    the ORACLE-CHECKABLE twin of ``unigram_logprob_score`` (whose
    feature-hashed vocabulary a SQL engine cannot reproduce). Pass 1:
    token-STREAM counts (pre-combined per batch, one groupby-sum
    shuffle), truncated to the top ``max_vocab`` tokens by
    (count desc, token asc) — a deterministic boundary — and broadcast
    once. Pass 2: per-doc mean of -ln(p(t)) where in-vocab p =
    count/N_total and out-of-vocab p = 0.5/N_total. Docs with zero
    tokens are dropped (no distribution to score). Output: (id,
    n_tokens, nll round 6)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def tok_partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        flat = pc.list_flatten(lists)
        vc = flat.to_pandas().value_counts()
        vc = vc[vc.index != ""]
        return pa.table({"t": pa.array(vc.index, pa.string()),
                         "n_part": pa.array(vc.to_numpy(), pa.int64())})

    counts = (docs.map_batches(tok_partial, batch_format="pyarrow",
                               batch_size=65536)
              .groupby("t").aggregate(Sum("n_part", alias_name="n"))
              .materialize())
    total = int(counts.sum("n") or 0)
    # distributed top-V cut: only max_vocab rows ever reach the driver
    # (the full corpus vocabulary never does)
    cp = (counts.sort(["n", "t"], descending=[True, False])
          .limit(max_vocab).to_pandas())
    ref = _ray.put(dict(zip(cp["t"], cp["n"].astype(float))))

    def score(batch: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        text = pc.fill_null(batch.column(col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists).to_pandas()
        keep = (flat != "").to_numpy()
        parent, flat = parent[keep], flat[keep]
        c = flat.map(m).fillna(0.5).to_numpy(dtype=np.float64)
        neg = -np.log(c / float(total))
        nrows = len(batch)
        sums = np.bincount(parent, weights=neg, minlength=nrows)
        lens = np.bincount(parent, minlength=nrows)
        ok = lens > 0
        # half-away-from-zero, matching DuckDB round() (np.round is
        # half-even); nll > 0 always, no sign term needed
        nll = np.floor((sums[ok] / lens[ok]) * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(ok)),
            "n_tokens": pa.array(lens[ok].astype(np.int64)),
            "nll": pa.array(nll, pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow", batch_size=65536)


def pack_sequences(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    col: str = "text",
    seq_len: int = 512,
    n_parts: int = 16,
    n_bins: int = 4096,
) -> "ray.data.Dataset":
    """GPT-style training-sequence packing: documents are concatenated
    in ``id_col`` order into one global token stream and cut into
    fixed-``seq_len`` examples; each doc's ``start_offset`` (tokens
    before it) and ``pack_id`` (the example its first token lands in)
    are assigned. Docs may straddle pack boundaries — the standard
    concat-then-chunk regime.

    Scale shape: the text is tokenized ONCE into a reduced
    (id, n_tokens) table; a single histogram pass over ``id_col`` then
    yields value-contiguous range partitions AND each partition's exact
    global token offset (per-bin row- and token-weight accumulators,
    driver traffic = n_bins ints); a tag pass + one range shuffle
    finishes with a local cumsum plus the broadcast offset. No global
    sort, no sequential scan. Ids must be unique non-null numerics.

    Output: (id, n_tokens, start_offset, pack_id)."""

    def tokcount(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n = np.bincount(parent[nonempty], minlength=len(batch))
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pa.array(n.astype(np.int64))})

    counts = docs.map_batches(tokcount, batch_format="pyarrow",
                              batch_size=65536).materialize()

    from .sketches import _minmax_count

    lo, hi, n_total = _minmax_count(counts, id_col)
    if n_total == 0:
        # _minmax_count drops NaN ids: n_total==0 with non-empty counts
        # means every id is null — raise the documented contract error
        # instead of a pyarrow length-mismatch deep in a task
        if counts.count() > 0:
            raise ValueError("pack_sequences: null id values")
        return counts.map_batches(
            lambda t: t.append_column("start_offset",
                                      pa.array([], pa.int64()))
            .append_column("pack_id", pa.array([], pa.int64())),
            batch_format="pyarrow")
    w = ((hi - lo) / n_bins) or 1.0

    def bin_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / w).astype(np.int64), 0, n_bins - 1)

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        if np.isnan(v).any():
            raise ValueError("pack_sequences: null id values")
        b = bin_of(v)
        rows = np.bincount(b, minlength=n_bins)
        toks = np.bincount(
            b, weights=batch.column("n_tokens").to_numpy(
                zero_copy_only=False).astype(np.float64),
            minlength=n_bins).astype(np.int64)
        return pa.table({
            "r": pa.array([rows.astype(np.int64).tobytes()], pa.binary()),
            "t": pa.array([toks.tobytes()], pa.binary())})

    parts = counts.map_batches(hist, batch_format="pyarrow",
                               batch_size=65536).to_pandas()
    rows = np.zeros(n_bins, np.int64)
    toks = np.zeros(n_bins, np.int64)
    for rb, tb in zip(parts["r"], parts["t"]):
        rows += np.frombuffer(rb, dtype=np.int64)
        toks += np.frombuffer(tb, dtype=np.int64)
    cum_rows = np.concatenate(([0], np.cumsum(rows)))
    cum_toks = np.concatenate(([0], np.cumsum(toks)))
    targets = (np.arange(1, n_parts) * n_total) // n_parts
    bound_bins = np.searchsorted(cum_rows[1:], targets, side="left")
    # token offset at each partition's start = cumulative token weight
    # of every bin BEFORE its first bin (partitions own whole bins)
    woff = np.concatenate(([0], cum_toks[bound_bins + 1]))

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        p = np.searchsorted(bound_bins, bin_of(v), side="left")
        return batch.append_column("_part", pa.array(p.astype(np.int64)))

    def finish(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        p = int(df["_part"].iloc[0])
        df = df.sort_values(id_col, kind="mergesort")
        n = df["n_tokens"].to_numpy()
        start = int(woff[p]) + np.cumsum(n) - n
        df["start_offset"] = start
        df["pack_id"] = start // int(seq_len)
        return pa.Table.from_pandas(df.drop(columns=["_part"]),
                                    preserve_index=False)

    return (counts.map_batches(tag, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("_part").map_groups(finish, batch_format="pyarrow"))


def split_sentences(batch: pa.Table, id_col: str = "doc_id",
                    col: str = "text") -> pa.Table:
    """Row-expanding sentence segmentation (graft-added, r04): split
    on terminator-run + whitespace (``[.!?]+\\s+`` — RE2, shared with
    the DuckDB ``string_split_regex`` oracle twin), trim each segment,
    drop empties, and emit ``(id, sent_idx, sentence, n_tokens,
    n_chars)`` with ``sent_idx`` counting KEPT sentences per document.
    A trailing terminator with no following whitespace stays attached
    to the last sentence — the rule is a deterministic curation
    heuristic, not a linguistic model. Fully vectorized: one Arrow
    split + numpy offset arithmetic, no per-row Python."""
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    parts = pc.split_pattern_regex(
        pc.if_else(pc.is_valid(text), text, pa.scalar("", pa.string())),
        pattern=r"[.!?]+\s+")
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    flat = pc.utf8_trim_whitespace(pc.list_flatten(parts))
    doc_idx = np.repeat(np.arange(len(parts)), counts)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    g = doc_idx[keep]
    # position within each doc over the kept sentences
    _u, first_idx, inv = np.unique(g, return_index=True,
                                   return_inverse=True)
    sent_idx = (np.arange(len(g)) - first_idx[inv]).astype(np.int32)
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(g)),
        "sent_idx": pa.array(sent_idx, pa.int32()),
        "sentence": flat,
        "n_tokens": pc.cast(pc.count_substring_regex(flat, r"\S+"),
                            pa.int32()),
        "n_chars": pc.cast(pc.utf8_length(flat), pa.int32()),
    })


def cooccurrence_pmi(
    docs: "ray.data.Dataset",
    max_vocab: int = 50,
    min_df: int = 2,
    id_col: str = "doc_id",
    col: str = "text",
    nb: int = 32,
) -> pa.Table:
    """Pointwise mutual information between co-occurring vocabulary
    tokens (graft-added, r04): pmi(a,b) = ln(n_ab·N / (df_a·df_b))
    over per-document DISTINCT token sets, with the vocabulary bounded
    to the ``max_vocab`` highest-df tokens (ties by token asc) with
    df ≥ ``min_df``. N is the TOTAL document-row count (null-text
    rows included; they simply co-occur with nothing).

    Sibling, NOT a duplicate: ``graph.pmi_pairs`` is the case-
    preserving entity-token variant whose pair counts ride the
    cooccurrence shuffle with ``min_count``/``max_tokens_per_doc``
    bounds; this one shares the tfidf tokenizer (lowercased \\s+
    split) and bounds by a broadcast top-K-df vocabulary. Divergent
    on purpose — pick by vocabulary regime.

    Scale shape: one df census (map-side doc-distinct explode +
    bucketed distinct_counts), vocabulary broadcast via ray.put; the
    quadratic pair expansion happens entirely MAP-SIDE per document
    (each doc intersects the vocab, ≤ max_vocab tokens, so a doc
    contributes ≤ V²/2 pairs) and is pre-aggregated per batch with
    one np.unique over packed pair codes before a ≤V²/2-row global
    groupby-sum — no shuffle ever carries per-document rows. Returns
    the small (tok_a, tok_b, n_ab, pmi) table, tok_a < tok_b, pmi
    rounded to 6 dp."""
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    from .canonicalize import distinct_counts

    def doc_distinct_terms(batch: pa.Table) -> pa.Table:
        doc_i, terms = _ws_doc_tokens(batch, col)
        pairs = pa.table({"doc_i": pa.array(doc_i), "term": terms})
        return (pairs.group_by(["doc_i", "term"]).aggregate([])
                .select(["term"]))

    n_docs = docs.count()
    df_tbl = distinct_counts(
        docs.map_batches(doc_distinct_terms, batch_format="pyarrow",
                         batch_size=65536),
        "term", nb=nb,
    ).to_pandas()
    df_tbl = df_tbl[df_tbl["count"] >= min_df]
    df_tbl = df_tbl.sort_values(["count", "term"],
                                ascending=[False, True],
                                kind="mergesort").head(max_vocab)
    # lexicographic vid assignment so vid order == token order and the
    # map-side a<b pair rule matches the SQL twin's string compare
    df_tbl = df_tbl.sort_values("term", kind="mergesort")
    vocab_list = list(df_tbl["term"])
    dfs = np.asarray(df_tbl["count"], dtype=np.float64)
    K = len(vocab_list)
    if K < 2:
        return pa.table({"tok_a": pa.array([], pa.string()),
                         "tok_b": pa.array([], pa.string()),
                         "n_ab": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    vocab_ref = _ray.put(pa.array(vocab_list, pa.string()))
    triu_cache: dict = {}

    def pairs_partial(batch: pa.Table) -> pa.Table:
        import ray as _r

        vocab_arr = _r.get(vocab_ref)
        doc_i, terms = _ws_doc_tokens(batch, col)
        vid = pc.fill_null(pc.index_in(terms, value_set=vocab_arr),
                           -1).to_numpy(zero_copy_only=False)
        keep = vid >= 0
        if not keep.any():
            return pa.table({"ai": pa.array([], pa.int32()),
                             "bi": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        codes = np.unique(doc_i[keep].astype(np.int64) * K + vid[keep])
        d, v = codes // K, codes % K  # v ascending within each doc
        _u, starts, sizes = np.unique(d, return_index=True,
                                      return_counts=True)
        ii, jj = [], []
        for s, m in zip(starts, sizes):
            if m < 2:
                continue
            tri = triu_cache.get(m)
            if tri is None:
                tri = np.triu_indices(m, 1)
                triu_cache[m] = tri
            ii.append(v[s + tri[0]])
            jj.append(v[s + tri[1]])
        if not ii:
            return pa.table({"ai": pa.array([], pa.int32()),
                             "bi": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        pcodes, cnt = np.unique(
            np.concatenate(ii) * K + np.concatenate(jj),
            return_counts=True)
        return pa.table({
            "ai": pa.array((pcodes // K).astype(np.int32)),
            "bi": pa.array((pcodes % K).astype(np.int32)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    agg = (docs.map_batches(pairs_partial, batch_format="pyarrow",
                            batch_size=65536)
           .groupby(["ai", "bi"]).aggregate(Sum("n", alias_name="n_ab"))
           .to_pandas())
    ai = agg["ai"].to_numpy()
    bi = agg["bi"].to_numpy()
    n_ab = agg["n_ab"].to_numpy().astype(np.int64)
    pmi = np.round(np.log((n_ab.astype(np.float64) * float(n_docs))
                          / (dfs[ai] * dfs[bi])), 6)
    out = pa.table({
        "tok_a": pa.array([vocab_list[i] for i in ai], pa.string()),
        "tok_b": pa.array([vocab_list[i] for i in bi], pa.string()),
        "n_ab": pa.array(n_ab, pa.int64()),
        "pmi": pa.array(pmi, pa.float64()),
    })
    return out.take(pc.sort_indices(out, sort_keys=[("tok_a", "ascending"),
                                                    ("tok_b", "ascending")]))


_SCRIPTS = [("latin", r"\p{Latin}"), ("cyrillic", r"\p{Cyrillic}"),
            ("greek", r"\p{Greek}"), ("han", r"\p{Han}"),
            ("arabic", r"\p{Arabic}")]


def script_profile(batch: pa.Table, col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Per-document Unicode SCRIPT census — the writing-system signal
    a multilingual curation pipeline keys routing and language-ID
    priors on: character counts per major script (Latin / Cyrillic /
    Greek / Han / Arabic, via RE2 ``\\p{Script}`` classes shared with
    the DuckDB twin) plus the dominant script (first-max-wins in that
    fixed order; ``none`` when no scripted character appears).

    One ``count_substring_regex`` kernel per script over the whole
    batch + one numpy argmax — zero Python per row."""
    text = pc.fill_null(batch.column(col), "")
    counts = {name: pc.count_substring_regex(text, pat)
              .to_numpy(zero_copy_only=False).astype(np.int32)
              for name, pat in _SCRIPTS}
    mat = np.stack(list(counts.values()))       # scripts x rows
    dom_idx = np.argmax(mat, axis=0)            # first max wins
    names = np.array([n for n, _ in _SCRIPTS], object)
    dom = names[dom_idx]
    dom[mat.sum(axis=0) == 0] = "none"
    out = {id_col: batch.column(id_col)}
    for name, _ in _SCRIPTS:
        out[f"n_{name}"] = pa.array(counts[name], pa.int32())
    out["dominant_script"] = pa.array(dom, pa.string())
    return pa.table(out)


def build_vocab(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    min_df: int = 1,
    max_vocab: "int | None" = None,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Global vocabulary construction → ``(token, df, token_id)`` with
    DENSE CONTIGUOUS 0-based ids assigned by ``(df DESC, token ASC)``
    — the deterministic token→id table every tokenizer/embedding
    stage downstream keys on. ``df`` is DOCUMENT frequency (each doc
    counts a token once); ``min_df`` prunes the hapax tail before the
    rank, ``max_vocab`` truncates after it.

    Shape: per-batch doc-distinct token partials (the shared RE2
    ``\\s+`` tokenizer) → one bucketed ``sum_by_key`` for df → the
    histogram-partitioned :func:`~.windows.global_row_number` for the
    id (no single-node global sort: three passes, driver traffic =
    bin counts)."""
    import pandas as pd

    from .canonicalize import sum_by_key
    from .windows import global_row_number

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), r"\s+")
        parent = pc.list_parent_indices(lists)
        flat_t = pc.list_flatten(lists)
        keep = pc.not_equal(flat_t, "")
        flat = pd.DataFrame({
            "d": pc.filter(parent, keep).to_numpy(zero_copy_only=False),
            "t": pc.filter(flat_t, keep).to_pandas(),
        }).drop_duplicates()
        vc = flat["t"].value_counts()
        return pa.table({"token": pa.array(vc.index.to_numpy(),
                                           pa.string()),
                         "df_p": pa.array(vc.to_numpy().astype(np.int64))})

    df = sum_by_key(
        docs.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536),
        "token", "df_p", nb=nb, out_col="df")
    if min_df > 1:
        df = df.map_batches(
            lambda t, md=int(min_df): t.filter(
                pc.greater_equal(t.column("df"), md)),
            batch_format="pyarrow")
    ranked = global_row_number(
        df.map_batches(
            lambda t: t.append_column(
                "neg_df", pc.multiply(t.column("df"), -1)),
            batch_format="pyarrow"),
        ["neg_df", "token"], out="rn", n_parts=nb)
    out = ranked.map_batches(
        lambda t: pa.table({
            "token": t.column("token"),
            "df": t.column("df").cast(pa.int64()),
            "token_id": pc.subtract(t.column("rn"), 1).cast(pa.int64())}),
        batch_format="pyarrow")
    if max_vocab is not None:
        out = out.map_batches(
            lambda t, mv=int(max_vocab): t.filter(
                pc.less(t.column("token_id"), mv)),
            batch_format="pyarrow")
    return out


def encode_tokens(
    docs: "ray.data.Dataset",
    vocab,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> "ray.data.Dataset":
    """Corpus encoding against a fixed vocabulary — the step after
    :func:`build_vocab` in a training-data pipeline: every document's
    tokens (shared RE2 ``\\s+`` tokenizer, '' dropped) map to their
    ``token_id`` in ORDER, out-of-vocabulary tokens to ``oov_id`` →
    ``(doc_id, n_tokens, n_oov, ids_str)`` with ``ids_str`` the
    ','-joined id sequence (null for token-less docs — a separator
    join can't represent "empty" distinctly from [""]).

    The vocab (a ``(token, token_id)`` Table/Dataset — MBs against a
    TB corpus) is collected once and broadcast via the object store
    (`ray.put` once per run, read per actor), never re-shipped per
    batch; the corpus streams through one stateless ``map_batches``
    doing a vectorized pandas map + run-offset ``binary_join`` — no
    shuffle touches the corpus."""
    import pandas as pd
    import ray

    vt = vocab if isinstance(vocab, pa.Table) else None
    if vt is None:
        vt = pa.Table.from_pandas(vocab.to_pandas(), preserve_index=False) \
            if hasattr(vocab, "to_pandas") else pa.table(vocab)
    mapping = dict(zip(vt.column("token").to_pylist(),
                       (int(x) for x in vt.column("token_id").to_pylist())))
    ref = ray.put(mapping)

    def encode(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        text = pc.fill_null(batch.column(text_col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), r"\s+")
        parent = pc.list_parent_indices(lists)
        flat_t = pc.list_flatten(lists)
        keep = pc.not_equal(flat_t, "")
        doc_idx = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
        toks = pc.filter(flat_t, keep).to_pandas()
        ids = toks.map(m).fillna(oov_id).astype(np.int64).to_numpy()
        n_tok = np.bincount(doc_idx, minlength=batch.num_rows
                            ).astype(np.int64)
        n_oov = np.bincount(doc_idx[ids == oov_id],
                            minlength=batch.num_rows).astype(np.int64)
        offsets = np.concatenate(
            [[0], np.cumsum(n_tok)]).astype(np.int32)
        id_strs = pa.array(ids.astype("U"), pa.string())
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     id_strs),
            pa.scalar(","))
        # token-less docs → null, not ""
        joined = pc.if_else(pa.array(n_tok > 0), joined,
                            pa.scalar(None, pa.string()))
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
            "ids_str": joined})

    return docs.map_batches(encode, batch_format="pyarrow",
                            batch_size=65536)


# ---------------------------------------------------------------------------
# BPE merge learning (graft-added, r04 seventh sitting)

def _bpe_apply_merge(flat: "np.ndarray", word_id: "np.ndarray",
                     a: str, b: str):
    """One left-to-right greedy merge of adjacent pair (a, b) over the
    flat symbol array (word_id delimits word boundaries). In a run of
    CONSECUTIVE candidate positions ('aaa' for pair (a,a)) only every
    other candidate merges — exactly the sequential scan's behavior,
    computed vectorized from run offsets."""
    if len(flat) < 2:
        return flat, word_id
    cand = np.flatnonzero((flat[:-1] == a) & (flat[1:] == b)
                          & (word_id[:-1] == word_id[1:]))
    if len(cand) == 0:
        return flat, word_id
    run_start = np.r_[True, np.diff(cand) != 1]
    starts_pos = cand[run_start]
    run_id = np.cumsum(run_start) - 1
    keep_c = cand[((cand - starts_pos[run_id]) % 2) == 0]
    flat = flat.copy()
    flat[keep_c] = a + b
    mask = np.ones(len(flat), bool)
    mask[keep_c + 1] = False
    return flat[mask], word_id[mask]


def _bpe_pair_census(flat: "np.ndarray", word_id: "np.ndarray",
                     weights: "np.ndarray"):
    """Weighted census of adjacent symbol pairs → (joined-key Series).
    The \\x1f join separator sorts below every printable char, so
    lexicographic order of joined keys equals (left, right) tuple
    order — the deterministic tie-break."""
    valid = word_id[:-1] == word_id[1:]
    if not valid.any():
        return None
    l_arr = flat[:-1][valid]
    r_arr = flat[1:][valid]
    w = weights[word_id[:-1][valid]]
    key = l_arr.astype(object) + "\x1f" + r_arr.astype(object)
    return pd.DataFrame({"k": key, "w": w}).groupby(
        "k", sort=False)["w"].sum()


def learn_bpe(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_merges: int = 10,
    nb: int = 64,
    max_words: int = 200_000,
) -> pa.Table:
    """Distributed BPE merge learning (Sennrich et al. 2016, public)
    — tokenizer training as a pipeline stage. The unbounded doc
    stream is touched EXACTLY once (a map-side token census +
    bucketed ``sum_by_key``); the merge loop then runs over the
    vocabulary-bounded WORD census (driver-collected reduced small
    side, ``max_words`` guard raises beyond it) as pure numpy over a
    flat symbol array — no per-round shuffles, no per-row Python.
    Round k: weighted adjacent-pair census → argmax with
    (count DESC, pair ASC) tie-break → vectorized left-to-right
    merge. Returns the merge table (round, left, right, pair_count);
    stops early when no pairs remain.

    No SQL oracle by nature (the iterative greedy merge-apply with
    overlap semantics is not SQL-expressible); pinned against a
    sequential reference implementation + randomized fuzz in tests,
    and covered by the rows-only determinism net."""
    from ..pipelines.annotate import dataset_to_table
    from .canonicalize import sum_by_key

    def census(batch: pa.Table) -> pa.Table:
        _par, toks = _ws_doc_tokens(batch, text_col)
        t = pa.table({"word": toks})
        g = t.group_by("word").aggregate([("word", "count")])
        return pa.table({"word": g.column("word"),
                         "n": g.column("word_count")})

    words = sum_by_key(
        ds.map_batches(census, batch_format="pyarrow"),
        "word", "n", nb=nb)
    wt = dataset_to_table(
        words, pa.schema([("word", pa.string()), ("n", pa.int64())]))
    if wt.num_rows > max_words:
        raise ValueError(
            f"learn_bpe: word census {wt.num_rows} exceeds "
            f"max_words={max_words}; raise the bound or pre-filter")
    wl = wt.column("word").to_pylist()
    counts = wt.column("n").to_numpy(zero_copy_only=False).astype(
        np.int64)
    # deterministic census order (sum_by_key emits bucket order)
    order = np.argsort(np.array(wl, dtype=object), kind="stable")
    wl = [wl[i] for i in order]
    counts = counts[order]
    flat = np.array([c for w in wl for c in w], dtype=object)
    word_id = np.repeat(np.arange(len(wl)), [len(w) for w in wl])

    rounds, lefts, rights, pcounts = [], [], [], []
    for r in range(n_merges):
        s = _bpe_pair_census(flat, word_id, counts)
        if s is None or len(s) == 0:
            break
        top = s[s == s.max()]
        best = min(top.index)
        a, b = best.split("\x1f")
        rounds.append(r)
        lefts.append(a)
        rights.append(b)
        pcounts.append(int(s[best]))
        flat, word_id = _bpe_apply_merge(flat, word_id, a, b)
    return pa.table({
        "round": pa.array(rounds, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "pair_count": pa.array(pcounts, pa.int64())})


def apply_bpe(
    ds: "ray.data.Dataset",
    merges: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Encode a corpus with learned BPE merges: per doc, whitespace
    tokens split to characters, then every merge applied in training
    order (the standard greedy encoder). Emits (id, n_words,
    n_subwords, subwords) with subwords the space-joined symbol
    sequence. The merge table is a fixed-size broadcast model; the
    per-batch apply reuses the same vectorized flat-array kernel as
    training."""
    pairs = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))

    def encode(batch: pa.Table) -> pa.Table:
        par, toks = _ws_doc_tokens(batch, text_col)
        tl = toks.to_pylist()
        flat = np.array([c for w in tl for c in w], dtype=object)
        tok_id = np.repeat(np.arange(len(tl)), [len(w) for w in tl])
        for a, b in pairs:
            flat, tok_id = _bpe_apply_merge(flat, tok_id, a, b)
        n = batch.num_rows
        # words per doc, then subwords per doc via the doc index of
        # each surviving symbol's token
        n_words = np.bincount(par, minlength=n).astype(np.int64)
        tok_doc = par  # doc ordinal per token
        sym_doc = tok_doc[tok_id]
        n_sub = np.bincount(sym_doc, minlength=n).astype(np.int64)
        # per-doc space-joined symbols: sym_doc is nondecreasing (merge
        # masks preserve order), so one offsets+binary_join pass joins
        # every doc at once — no per-symbol Python
        offsets = np.zeros(n + 1, np.int32)
        np.cumsum(n_sub, out=offsets[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat, pa.string()))
        joined_arr = pc.binary_join(lists, " ")
        joined = pc.if_else(pa.array(n_words > 0), joined_arr,
                            pa.scalar(None, pa.string()))
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words),
            "n_subwords": pa.array(n_sub),
            "subwords": pa.array(joined, pa.string())})

    return ds.map_batches(encode, batch_format="pyarrow")


def readability(batch: pa.Table, id_col: str = "doc_id",
                col: str = "text") -> pa.Table:
    """Flesch reading-ease + Flesch–Kincaid grade (public formulas)
    with the standard regex heuristics: words = \\S+ runs, sentences
    = [.!?]+ runs (floored at 1), syllables = [aeiouy]+ vowel groups
    of the lowercased text. All pyarrow.compute kernels, replayable
    verbatim in a SQL twin; docs with no words emit nulls."""
    text = pc.fill_null(batch.column(col), "")
    if text.type != pa.string():
        text = text.cast(pa.string())
    w = pc.count_substring_regex(text, r"\S+").cast(pa.float64())
    s_raw = pc.count_substring_regex(text, r"[.!?]+")
    s = pc.max_element_wise(s_raw, pa.scalar(1, s_raw.type)).cast(
        pa.float64())
    syl = pc.count_substring_regex(
        pc.utf8_lower(text), r"[aeiouy]+").cast(pa.float64())
    wps = pc.divide(w, s)
    spw = pc.divide(syl, w)  # null-free only where w > 0 (guarded)
    ok = pc.greater(w, 0.0)
    flesch = pc.subtract(
        pa.scalar(206.835),
        pc.add(pc.multiply(pa.scalar(1.015), wps),
               pc.multiply(pa.scalar(84.6), spw)))
    grade = pc.subtract(
        pc.add(pc.multiply(pa.scalar(0.39), wps),
               pc.multiply(pa.scalar(11.8), spw)),
        pa.scalar(15.59))
    null_f = pa.scalar(None, pa.float64())
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": w.cast(pa.int64()),
        "n_sentences": pc.if_else(ok, s.cast(pa.int64()),
                                  pa.scalar(None, pa.int64())),
        "n_syllables": syl.cast(pa.int64()),
        "flesch": pc.if_else(ok, pc.round(flesch, 6), null_f),
        "fk_grade": pc.if_else(ok, pc.round(grade, 6), null_f)})


def collocations_llr(
    docs: "ray.data.Dataset",
    col: str = "text",
    min_count: int = 2,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Collocation extraction by Dunning's log-likelihood ratio
    (Dunning 1993 — the published significance test for "these two
    words form a unit", robust at the low counts where PMI explodes):
    for every adjacent lowercased-token bigram with ``count >=
    min_count``, emit the 2×2-contingency G² statistic against the
    corpus bigram stream. Feeds phrase vocabularies ("new york",
    "machine learning") for tokenizers and entity linkers.

    Shape: per batch, bigrams and BOTH positional marginals
    pre-aggregate map-side (Arrow group_by over vectorized
    parent-index adjacency — no Python over tokens); three bucketed
    ``sum_by_key`` censuses + two bucketed joins attach marginals to
    the surviving (``min_count``-filtered) bigrams; the scalar N folds
    map-side. LLR math is one vectorized numpy pass; 6-dp rounding
    pins float parity with the SQL twin.
    """
    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    def parts(batch: pa.Table) -> pa.Table:
        parent, toks = _ws_doc_tokens(batch, col)
        t = toks.to_numpy(zero_copy_only=False)
        adj = parent[1:] == parent[:-1]
        w1 = t[:-1][adj]
        w2 = t[1:][adj]
        pt = pa.table({"w1": pa.array(w1, pa.string()),
                       "w2": pa.array(w2, pa.string())})
        g = pt.group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return pa.table({"w1": g.column("w1"), "w2": g.column("w2"),
                         "c": g.column("w1_count").cast(pa.int64())})

    pairs = sum_by_key(
        docs.map_batches(parts, batch_format="pyarrow",
                         batch_size=4096),
        ["w1", "w2"], "c", nb=nb, out_col="c12").materialize()

    m1 = sum_by_key(pairs.map_batches(
        lambda t: pa.table({"w1": t.column("w1"),
                            "c": t.column("c12")}),
        batch_format="pyarrow"), "w1", "c", nb=nb, out_col="c1")
    m2 = sum_by_key(pairs.map_batches(
        lambda t: pa.table({"w2": t.column("w2"),
                            "c": t.column("c12")}),
        batch_format="pyarrow"), "w2", "c", nb=nb, out_col="c2")
    n_total = int(pairs.sum("c12") or 0)

    surv = pairs.map_batches(
        lambda t, mc=int(min_count): t.filter(
            pc.greater_equal(t.column("c12"), mc)),
        batch_format="pyarrow")
    j = shuffle_hash_join(surv, m1, on=["w1"], how="inner", nb=nb)
    j = shuffle_hash_join(j, m2, on=["w2"], how="inner", nb=nb)

    def score(t: pa.Table) -> pa.Table:
        k11 = t.column("c12").to_numpy(zero_copy_only=False).astype(
            np.float64)
        r = t.column("c1").to_numpy(zero_copy_only=False).astype(
            np.float64)
        cc = t.column("c2").to_numpy(zero_copy_only=False).astype(
            np.float64)
        n = float(n_total)
        k12 = r - k11
        k21 = cc - k11
        k22 = n - r - cc + k11

        def term(k, row, colm):
            with np.errstate(divide="ignore", invalid="ignore"):
                v = k * np.log(k * n / (row * colm))
            return np.where(k > 0, v, 0.0)

        llr = 2.0 * (term(k11, r, cc) + term(k12, r, n - cc)
                     + term(k21, n - r, cc) + term(k22, n - r, n - cc))
        return pa.table({
            "w1": t.column("w1"), "w2": t.column("w2"),
            "c12": t.column("c12"),
            "llr": pa.array(np.round(llr, 6), pa.float64())})

    return j.map_batches(score, batch_format="pyarrow")


def rake_keyphrases(
    docs: "ray.data.Dataset",
    col: str = "text",
    id_col: str = "doc_id",
    stopwords: "frozenset[str] | None" = None,
) -> "ray.data.Dataset":
    """Keyphrase extraction by RAKE (Rose et al. 2010 — the published
    rapid-automatic-keyword-extraction method): candidate phrases are
    maximal runs of content tokens between delimiters (stopwords or
    tokens containing non-alphanumeric characters); per document each
    word scores deg(w)/freq(w) where freq counts occurrences inside
    candidates and deg sums the lengths of the candidates containing
    it; a phrase scores the sum of its word scores. Emits one row per
    DISTINCT (doc, phrase): ``(doc_id, phrase, n_words, score)``.

    RAKE is per-document by definition, so the whole operator is ONE
    stateless ``map_batches`` — no shuffle at all; it parallelizes
    embarrassingly at 100 TB. Per batch everything is vectorized:
    Arrow tokenization (the shared ``_ws_doc_tokens`` contract),
    Arrow regex boundary test, numpy run segmentation +
    ``add.reduceat`` phrase sums, dictionary-encoded (doc, word)
    grouping via ``np.unique`` — no Python loop over tokens.
    """
    stop = sorted(stopwords if stopwords is not None else _EN_STOP)
    stop_arr = pa.array(stop, pa.string())

    def extract(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], batch.column(id_col).type),
            "phrase": pa.array([], pa.string()),
            "n_words": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())})
        parent, toks = _ws_doc_tokens(batch, col)
        if len(parent) == 0:
            return empty
        boundary = pc.or_(
            pc.is_in(toks, value_set=stop_arr),
            pc.match_substring_regex(toks, "[^a-z0-9]")
        ).to_numpy(zero_copy_only=False)
        keep = ~boundary
        if not keep.any():
            return empty
        cand_parent = parent[keep]
        cand_toks = toks.filter(pa.array(keep))
        # positions within the full token stream to detect adjacency
        pos = np.arange(len(parent))[keep]
        starts = np.ones(len(pos), dtype=bool)
        if len(pos) > 1:
            starts[1:] = ((pos[1:] != pos[:-1] + 1)
                          | (cand_parent[1:] != cand_parent[:-1]))
        run_id = np.cumsum(starts) - 1
        n_runs = int(run_id[-1]) + 1
        run_len = np.bincount(run_id, minlength=n_runs)
        offsets = np.zeros(n_runs + 1, dtype=np.int32)
        np.cumsum(run_len, out=offsets[1:])
        flat_cand = (cand_toks.combine_chunks()
                     if isinstance(cand_toks, pa.ChunkedArray)
                     else cand_toks)
        phrases = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), flat_cand),
            " ")
        run_doc = cand_parent[offsets[:-1]]
        # per-(doc, word) freq and deg via dictionary codes
        codes = pc.dictionary_encode(flat_cand)
        word_code = codes.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        key = cand_parent.astype(np.int64) * (word_code.max() + 1
                                              ) + word_code
        _, gid = np.unique(key, return_inverse=True)
        freq = np.bincount(gid)
        contrib = run_len[run_id].astype(np.float64)
        deg = np.bincount(gid, weights=contrib)
        tok_score = deg[gid] / freq[gid]
        phrase_score = np.add.reduceat(tok_score, offsets[:-1])
        doc_ids = batch.column(id_col).take(pa.array(run_doc))
        out = pa.table({
            "doc_id": doc_ids,
            "phrase": phrases,
            "n_words": pa.array(run_len.astype(np.int64)),
            "score": pa.array(np.round(phrase_score, 6),
                              pa.float64())})
        # distinct (doc, phrase): identical phrases in a doc carry
        # identical scores, so a min-aggregate is a pure dedup
        g = out.group_by(["doc_id", "phrase"]).aggregate(
            [("n_words", "min"), ("score", "min")])
        return pa.table({
            "doc_id": g.column("doc_id"), "phrase": g.column("phrase"),
            "n_words": g.column("n_words_min"),
            "score": g.column("score_min")})

    return docs.map_batches(extract, batch_format="pyarrow",
                            batch_size=2048)


def dsir_select(
    raw: "ray.data.Dataset",
    target: "ray.data.Dataset",
    top_n: int = 100,
    vocab_size: int = 64,
    id_col: str = "doc_id",
    col: str = "text",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Data Selection with Importance Resampling (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw-pool document by the log-likelihood ratio of a
    target-domain unigram LM against the raw-pool unigram LM and keep
    the top ``top_n`` — the published recipe for "find me more data
    that looks like my curated set" at pre-training scale. This
    variant restricts both LMs to an explicit top-``vocab_size``
    target vocabulary (count-desc, token-asc cutoff) with add-one
    smoothing, instead of the paper's hashed n-gram buckets, so the
    weights are exactly replayable by a SQL twin; swap the feature
    map for :func:`_token_hashes` buckets when collision-tolerant
    scale matters more than auditability.

    Scale shape: two map-side-combined token-count passes (target,
    then raw restricted to the broadcast vocabulary — the vocab is
    the SMALL side by construction), one broadcast LLR dict via
    ``ray.put``, one vectorized per-batch scoring pass, then a
    local-top-N + single-block final cut (each block contributes at
    most ``top_n`` candidate rows, so the reduce side is tiny).

    Returns ``(doc_id, score, n_vocab_tokens)`` — the ``top_n``
    highest-scoring docs; ties break by ``doc_id`` asc. Docs with no
    vocabulary token score 0 (they carry no evidence either way).
    """
    import ray as _ray

    from .canonicalize import sum_by_key

    if top_n < 1 or vocab_size < 1:
        raise ValueError("top_n and vocab_size must be >= 1")

    def token_counts_batch(batch: pa.Table) -> pa.Table:
        _, terms = _ws_doc_tokens(batch, col)
        g = pa.table({"t": terms}).group_by(["t"]).aggregate(
            [("t", "count")])
        return pa.table({"t": g.column("t"),
                         "one": g.column("t_count").cast(pa.int64())})

    tgt_counts = sum_by_key(
        target.map_batches(token_counts_batch, batch_format="pyarrow",
                           batch_size=65536),
        "t", "one", nb=nb, out_col="n").to_pandas()
    if tgt_counts.empty:
        raise ValueError("target corpus yields an empty vocabulary")
    tgt_counts = tgt_counts.sort_values(
        ["n", "t"], ascending=[False, True], kind="mergesort").head(
        vocab_size)
    vocab = list(tgt_counts["t"])
    v = len(vocab)
    tgt_n = dict(zip(tgt_counts["t"], tgt_counts["n"]))
    nt = int(tgt_counts["n"].sum())
    vset_ref = _ray.put(set(vocab))

    def raw_vocab_counts(batch: pa.Table) -> pa.Table:
        import ray as _r

        vset = _r.get(vset_ref)
        _, terms = _ws_doc_tokens(batch, col)
        mask = pa.array([t in vset for t in terms.to_pylist()])
        g = (pa.table({"t": terms.filter(mask)})
             .group_by(["t"]).aggregate([("t", "count")]))
        return pa.table({"t": g.column("t"),
                         "one": g.column("t_count").cast(pa.int64())})

    raw_counts = sum_by_key(
        raw.map_batches(raw_vocab_counts, batch_format="pyarrow",
                        batch_size=65536),
        "t", "one", nb=nb, out_col="n").to_pandas()
    raw_n = dict(zip(raw_counts["t"], raw_counts["n"]))
    nr = int(raw_counts["n"].sum())
    llr = {t: (np.log((tgt_n[t] + 1.0) / (nt + v))
               - np.log((raw_n.get(t, 0) + 1.0) / (nr + v)))
           for t in vocab}
    llr_ref = _ray.put(llr)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _r

        lut = _r.get(llr_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        doc_i, terms = _ws_doc_tokens(batch, col)
        w = np.array([lut.get(t, np.nan) for t in terms.to_pylist()],
                     np.float64)
        keep = ~np.isnan(w)
        di = doc_i[keep]
        sc = np.zeros(batch.num_rows, np.float64)
        nv = np.zeros(batch.num_rows, np.int64)
        if di.size:
            np.add.at(sc, di, w[keep])
            np.add.at(nv, di, 1)
        t = pa.table({
            id_col: batch.column(id_col),
            "score": pa.array(sc),
            "n_vocab_tokens": pa.array(nv)})
        # local top-N: each block ships at most top_n candidates
        order = np.lexsort((ids, -sc))[:top_n]
        return t.take(pa.array(np.sort(order)))

    def final(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sc = t.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sc))[:top_n]
        return t.take(pa.array(order))

    return (raw.map_batches(score, batch_format="pyarrow",
                            batch_size=65536)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow",
                         batch_size=1 << 30))


def vocab_richness(
    docs: "ray.data.Dataset",
    group_col: str = "source",
    col: str = "text",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-group vocabulary richness: token totals, distinct types,
    singleton/doubleton counts, the bias-corrected Chao1 species
    estimate ``D + F1(F1−1)/(2(F2+1))`` (Chao 1984/Colwell's EstimateS
    form — defined even when F2 = 0) and the Good–Turing unseen-mass
    estimate ``F1/N`` — the corpus-coverage diagnostics a
    training-data pipeline runs per domain: a source whose Chao1 far
    exceeds its observed D is under-sampled; a rising unseen mass
    says more crawl will still buy new vocabulary.

    Scale shape: one map-side-combined (group, token) count
    (:func:`~.canonicalize.sum_by_key` — the pair key spreads a hot
    group across buckets), then ONE :func:`~.canonicalize.sums_by_key`
    reduce of four tiny per-type indicator columns per group. The
    token stream never leaves the combiners un-aggregated.

    Returns ``(group, n_tokens, n_distinct, f1, f2, chao1,
    gt_unseen)``; ``gt_unseen`` is null for an empty group (no
    tokens), which cannot occur for groups emitted here.
    """
    from .canonicalize import sum_by_key, sums_by_key

    def pair_counts(batch: pa.Table) -> pa.Table:
        doc_i, terms = _ws_doc_tokens(batch, col)
        g = pa.table({
            "g": batch.column(group_col).take(pa.array(doc_i)),
            "t": terms}).group_by(["g", "t"]).aggregate(
            [("t", "count")])
        return pa.table({"g": g.column("g"), "t": g.column("t"),
                         "one": g.column("t_count").cast(pa.int64())})

    type_counts = sum_by_key(
        docs.map_batches(pair_counts, batch_format="pyarrow",
                         batch_size=65536),
        ["g", "t"], "one", nb=nb, out_col="n")

    def indicators(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": t.column("g"),
            "n_tokens": pa.array(n.astype(np.int64)),
            "n_distinct": pa.array(np.ones(len(n), np.int64)),
            "f1": pa.array((n == 1).astype(np.int64)),
            "f2": pa.array((n == 2).astype(np.int64))})

    sums = sums_by_key(
        type_counts.map_batches(indicators, batch_format="pyarrow"),
        "g", ["n_tokens", "n_distinct", "f1", "f2"], nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("n_distinct").to_numpy(zero_copy_only=False)
        f1 = t.column("f1").to_numpy(zero_copy_only=False)
        f2 = t.column("f2").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        chao1 = d + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0))
        gt = f1 / n.astype(np.float64)
        return pa.table({
            group_col: t.column("g"),
            "n_tokens": t.column("n_tokens").cast(pa.int64()),
            "n_distinct": t.column("n_distinct").cast(pa.int64()),
            "f1": t.column("f1").cast(pa.int64()),
            "f2": t.column("f2").cast(pa.int64()),
            "chao1": pa.array(chao1, pa.float64()),
            "gt_unseen": pa.array(gt, pa.float64())})

    return sums.map_batches(finish, batch_format="pyarrow")


def term_drift(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    col: str = "text",
    top_k: int = 50,
    min_count: int = 5,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Corpus drift by term: the add-one-smoothed log-odds-ratio of
    every term between corpus A and corpus B with its Wald z-score
    (the informative-prior-free core of Monroe, Colaresi & Quinn
    2008 "Fightin' Words"): ``delta = ln((a+1)/(Na-a+1)) -
    ln((b+1)/(Nb-b+1))``, ``z = delta / sqrt(1/(a+1) + 1/(b+1))`` —
    the between-crawl regression check: which vocabulary exploded or
    vanished since the last snapshot (template rot, spam bursts,
    language shift), ranked by evidence rather than raw ratio.

    Terms observed fewer than ``min_count`` times across BOTH
    corpora are dropped (rare-term z-scores are noise). Returns the
    ``top_k`` terms by ``|z|`` desc, term asc:
    ``(term, a_count, b_count, delta, z)``.

    Scale shape: two map-side-combined token-count passes, ONE
    term-bucket shuffle each, a bucketed full join of the two count
    tables, then local-top-k + single-block cut — the totals are the
    only driver-side values.
    """
    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    def token_counts(ds):
        def f(batch: pa.Table) -> pa.Table:
            _, terms = _ws_doc_tokens(batch, col)
            g = pa.table({"t": terms}).group_by(["t"]).aggregate(
                [("t", "count")])
            return pa.table({
                "t": g.column("t"),
                "one": g.column("t_count").cast(pa.int64())})

        return sum_by_key(
            ds.map_batches(f, batch_format="pyarrow",
                           batch_size=65536),
            "t", "one", nb=nb, out_col="n")

    ac = token_counts(a)
    bc = token_counts(b)
    na = int(ac.map_batches(
        lambda t: pa.table({"s": pa.array(
            [t.column("n").to_numpy(zero_copy_only=False).sum()],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())
    nb_tot = int(bc.map_batches(
        lambda t: pa.table({"s": pa.array(
            [t.column("n").to_numpy(zero_copy_only=False).sum()],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())
    both = shuffle_hash_join(
        ac.map_batches(lambda t: t.rename_columns(["t", "a_count"]),
                       batch_format="pyarrow"),
        bc.map_batches(lambda t: t.rename_columns(["t", "b_count"]),
                       batch_format="pyarrow"),
        on=["t"], how="full", nb=nb)

    def score(t: pa.Table) -> pa.Table:
        av = pc.fill_null(t.column("a_count"), 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        bv = pc.fill_null(t.column("b_count"), 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = (av + bv) >= min_count
        av, bv = av[keep], bv[keep]
        terms = t.column("t").filter(pa.array(keep))
        delta = (np.log((av + 1.0) / (na - av + 1.0))
                 - np.log((bv + 1.0) / (nb_tot - bv + 1.0)))
        z = delta / np.sqrt(1.0 / (av + 1.0) + 1.0 / (bv + 1.0))
        out = pa.table({
            "term": terms,
            "a_count": pa.array(av.astype(np.int64)),
            "b_count": pa.array(bv.astype(np.int64)),
            "delta": pa.array(delta), "z": pa.array(z)})
        idx = pc.sort_indices(
            out.append_column("absz", pa.array(-np.abs(z))),
            sort_keys=[("absz", "ascending"), ("term", "ascending")])
        return out.take(idx[:top_k])

    def final(t: pa.Table) -> pa.Table:
        z = t.column("z").to_numpy(zero_copy_only=False)
        idx = pc.sort_indices(
            t.append_column("absz", pa.array(-np.abs(z))),
            sort_keys=[("absz", "ascending"), ("term", "ascending")])
        return t.take(idx[:top_k])

    return (both.map_batches(score, batch_format="pyarrow",
                             batch_size=1 << 20)
            .repartition(1)
            .map_batches(final, batch_format="pyarrow",
                         batch_size=1 << 30))


def bigram_nll(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    col: str = "text",
    max_vocab: int = 4096,
    k: float = 0.5,
    max_bigrams: int = 2_000_000,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Add-k-smoothed BIGRAM LM negative log-likelihood per document —
    the sequence-aware upgrade of :func:`unigram_nll_exact` (a doc of
    common words in an uncommon ORDER now scores badly; the standard
    KenLM-style perplexity filter shape for corpus curation, here
    self-scored over the input corpus).

    Model: tokens outside the top-``max_vocab`` vocabulary (count
    desc, token asc — a deterministic cut) fold to ``<unk>``; each
    doc's token sequence is prefixed with a BOS context (the empty
    string — unreachable by whitespace tokens, so no collision and
    trivially SQL-replayable); P(v|u) = (c(u,v)+k) / (c(u)+k·V) with
    V = |vocab|+1 (the <unk> class). NLL = mean −ln P over the doc's
    bigrams; docs with no tokens are dropped.

    Scale shape: pass 1 = map-side-combined token census →
    deterministic top-V cut (only V rows reach the driver); pass 2 =
    mapped-bigram census via one composite-key ``sum_by_key`` —
    distinct mapped bigrams are bounded by the corpus and by V², and
    ``max_bigrams`` guards the broadcast (raise, don't silently
    truncate a probability model); context counts fold from the
    bigram dict driver-side (same rows). Pass 3 = one stateless
    scoring pass against the ray.put model. Output: (id, n_bigrams,
    nll round 6)."""
    import ray as _ray

    from .canonicalize import sum_by_key

    def _tok_lists(batch: pa.Table):
        text = pc.fill_null(batch.column(col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        return pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")

    def tok_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_tok_lists(batch))
        vc = flat.to_pandas().value_counts()
        vc = vc[vc.index != ""]
        return pa.table({"t": pa.array(vc.index, pa.string()),
                         "n_part": pa.array(vc.to_numpy(), pa.int64())})

    counts = sum_by_key(
        docs.map_batches(tok_partial, batch_format="pyarrow",
                         batch_size=65536),
        "t", "n_part", nb=nb, out_col="n").materialize()
    cp = (counts.sort(["n", "t"], descending=[True, False])
          .limit(max_vocab).to_pandas())
    vocab = set(cp["t"])
    V = len(vocab) + 1
    vocab_ref = _ray.put(vocab)

    def _mapped_pairs(batch: pa.Table):
        """(doc_index, u, v) arrays of mapped bigrams for a batch."""
        voc = _ray.get(vocab_ref)
        lists = _tok_lists(batch)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists).to_pandas()
        keep = (flat != "").to_numpy()
        parent, flat = parent[keep], flat[keep].to_numpy()
        mapped = np.where(pd.Index(flat).isin(voc), flat, "<unk>")
        if len(parent) == 0:
            z = np.empty(0, dtype=object)
            return np.empty(0, np.int64), z, z
        # v = every token; u = previous token in the same doc, else BOS ''
        u = np.empty(len(mapped), dtype=object)
        u[0] = ""
        u[1:] = np.where(parent[1:] == parent[:-1], mapped[:-1], "")
        return parent, u, mapped.astype(object)

    def big_partial(batch: pa.Table) -> pa.Table:
        _, u, v = _mapped_pairs(batch)
        df = pd.DataFrame({"u": u, "w": v})
        g = df.groupby(["u", "w"], as_index=False).size()
        return pa.table({"u": pa.array(g["u"], pa.string()),
                         "w": pa.array(g["w"], pa.string()),
                         "c_part": pa.array(g["size"].to_numpy(), pa.int64())})

    bc = sum_by_key(
        docs.map_batches(big_partial, batch_format="pyarrow",
                         batch_size=65536),
        ["u", "w"], "c_part", nb=nb, out_col="c").materialize()
    n_big = bc.count()
    if n_big > max_bigrams:
        raise ValueError(
            f"bigram_nll: {n_big} distinct mapped bigrams exceed "
            f"max_bigrams={max_bigrams}; lower max_vocab")
    bdf = bc.to_pandas()
    big_map = dict(zip(zip(bdf["u"], bdf["w"]), bdf["c"].astype(float)))
    ctx_map = bdf.groupby("u")["c"].sum().astype(float).to_dict()
    model_ref = _ray.put((big_map, ctx_map))

    def score(batch: pa.Table) -> pa.Table:
        big_m, ctx_m = _ray.get(model_ref)
        parent, u, v = _mapped_pairs(batch)
        nrows = len(batch)
        if len(parent) == 0:
            return pa.table({
                id_col: batch.column(id_col).slice(0, 0),
                "n_bigrams": pa.array([], pa.int64()),
                "nll": pa.array([], pa.float64())})
        cb = pd.Series(list(zip(u, v))).map(big_m).to_numpy(np.float64)
        cu = pd.Series(u).map(ctx_m).to_numpy(np.float64)
        # every observed bigram is in the model by construction
        neg = -np.log((cb + k) / (cu + k * V))
        sums = np.bincount(parent, weights=neg, minlength=nrows)
        lens = np.bincount(parent, minlength=nrows)
        ok = lens > 0
        nll = np.floor((sums[ok] / lens[ok]) * 1e6 + 0.5) / 1e6
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(ok)),
            "n_bigrams": pa.array(lens[ok].astype(np.int64)),
            "nll": pa.array(nll, pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow",
                            batch_size=65536)


def logistic_fit(
    ds: "ray.data.Dataset",
    feature_cols: "list[str]",
    label_col: str,
    iters: int = 8,
    l2: float = 1e-4,
) -> dict:
    """Distributed logistic regression via IRLS (Newton) — the
    fasttext-style quality-classifier trainer for corpus curation
    (label a seed set, score the corpus, keep the top). Features are
    standardized internally (one sufficient-statistics pass), then
    each Newton step is ONE streaming pass producing per-batch
    partials of the gradient Xᵀ(μ−y) and Hessian XᵀWX — (d+1)² floats
    per batch, reduced driver-side with order-independent fsum over
    the sorted partial multiset, so the fit is deterministic under
    any block arrival order. d = len(feature_cols) must be small
    (model state is broadcast; guard raises above 64).

    Returns {"w": coefs (std space), "b": intercept, "mean", "std",
    "n_iter"} — feed to :func:`logistic_predict`."""
    import math

    import ray as _ray

    d = len(feature_cols)
    if d == 0 or d > 64:
        raise ValueError(f"logistic_fit: 1..64 features, got {d}")

    def moments(batch: pa.Table) -> pa.Table:
        X = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols])
        ok = ~np.isnan(X).any(1)
        ok &= ~pd.isna(batch.column(label_col).to_pandas()).to_numpy()
        X = X[ok]
        row = np.concatenate([[float(len(X))], X.sum(0), (X * X).sum(0)])
        return pa.table({f"m{i}": pa.array([row[i]], pa.float64())
                         for i in range(len(row))})

    mom = ds.map_batches(moments, batch_format="pyarrow",
                         batch_size=65536).to_pandas()
    cols = [math.fsum(sorted(mom[c].to_numpy())) for c in mom.columns]
    n = cols[0]
    if n < 2:
        raise ValueError("logistic_fit: not enough rows")
    mean = np.array(cols[1:d + 1]) / n
    var = np.array(cols[d + 1:]) / n - mean ** 2
    std = np.sqrt(np.maximum(var, 1e-12))
    scaler_ref = _ray.put((mean, std))

    w = np.zeros(d + 1)  # [bias, w_1..w_d]
    n_iter = 0
    for it in range(iters):
        w_ref = _ray.put(w)

        def newton_part(batch: pa.Table, _w_ref=w_ref) -> pa.Table:
            mu_, sd_ = _ray.get(scaler_ref)
            wv = _ray.get(_w_ref)
            X = np.column_stack([
                batch.column(c).to_numpy(zero_copy_only=False)
                .astype(np.float64) for c in feature_cols])
            yb = batch.column(label_col).to_pandas()
            ok = ~np.isnan(X).any(1) & ~pd.isna(yb).to_numpy()
            X = (X[ok] - mu_) / sd_
            y = yb[ok].astype(float).to_numpy()
            X1 = np.column_stack([np.ones(len(X)), X])
            z = np.clip(X1 @ wv, -30, 30)
            mu = 1.0 / (1.0 + np.exp(-z))
            g = X1.T @ (mu - y)
            W = mu * (1 - mu)
            H = X1.T @ (X1 * W[:, None])
            row = np.concatenate([g, H.ravel()])
            return pa.table({f"p{i}": pa.array([row[i]], pa.float64())
                             for i in range(len(row))})

        parts = ds.map_batches(newton_part, batch_format="pyarrow",
                               batch_size=65536).to_pandas()
        vals = [math.fsum(sorted(parts[c].to_numpy()))
                for c in parts.columns]
        g = np.array(vals[:d + 1])
        H = np.array(vals[d + 1:]).reshape(d + 1, d + 1)
        reg = l2 * np.eye(d + 1)
        reg[0, 0] = 0.0  # never regularize the intercept
        step = np.linalg.solve(H + reg, g + (reg @ w))
        w = w - step
        n_iter = it + 1
        if float(np.abs(step).max()) < 1e-10:
            break
    return {"w": w[1:], "b": float(w[0]), "mean": mean, "std": std,
            "n_iter": n_iter}


def logistic_predict(
    ds: "ray.data.Dataset",
    model: dict,
    feature_cols: "list[str]",
    id_col: str = "doc_id",
    out_col: str = "score",
) -> "ray.data.Dataset":
    """Score rows with a :func:`logistic_fit` model — one stateless
    broadcast pass; rows with a null/NaN feature score null."""
    import ray as _ray

    ref = _ray.put((model["mean"], model["std"],
                    np.asarray(model["w"]), model["b"]))

    def score(batch: pa.Table) -> pa.Table:
        mu_, sd_, wv, b = _ray.get(ref)
        X = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False)
            .astype(np.float64) for c in feature_cols])
        ok = ~np.isnan(X).any(1)
        z = np.clip(((X - mu_) / sd_) @ wv + b, -30, 30)
        p = 1.0 / (1.0 + np.exp(-z))
        p[~ok] = np.nan
        return pa.table({
            id_col: batch.column(id_col),
            out_col: pa.array(pd.Series(p), pa.float64(),
                              from_pandas=True)})

    return ds.map_batches(score, batch_format="pyarrow",
                          batch_size=65536)


def kwic_contexts(
    docs: "ray.data.Dataset",
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 12,
) -> "ray.data.Dataset":
    """KWIC (keyword-in-context) mention extraction — the annotation
    debugging view: one row per NON-OVERLAPPING occurrence of any of
    ``terms`` in each document, carrying the matched term and a
    ±``width``-char snippet. The regex is one alternation
    ``(.{0,w}(t1|t2|…).{0,w})`` applied with leftmost-first,
    dot-excludes-newline semantics — identical between Python re and
    DuckDB's RE2, so the SQL twin replays it byte-exactly with two
    lockstep regexp_extract_all calls. Terms must be
    non-empty/alphanumeric-ish (re.escape'd; an empty term would
    match everywhere).

    Shape: ONE stateless row-expanding map_batches (pandas
    str.findall + np.repeat id carriage) — no shuffle.
    """
    import re

    import pandas as pd

    if not terms or any(t == "" for t in terms):
        raise ValueError("kwic_contexts needs non-empty terms")
    # longest-first alternation: leftmost-FIRST regex semantics would
    # otherwise let a term that is a prefix of another ('scan' vs
    # 'scanner') permanently shadow the longer one
    alt = "|".join(re.escape(t)
                   for t in sorted(terms, key=lambda x: (-len(x), x)))
    pat = re.compile(f"(.{{0,{width}}}({alt}).{{0,{width}}})")

    def expand(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).to_pandas().fillna("")
        found = txt.str.findall(pat)
        counts = np.fromiter((len(x) for x in found), dtype=np.int64,
                             count=len(found))
        idx = np.repeat(np.arange(len(found)), counts)
        snips = [s for row in found for (s, _t) in row]
        trms = [t for row in found for (_s, t) in row]
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(idx)),
            "term": pa.array(trms, pa.string()),
            "snippet": pa.array(snips, pa.string())})

    return docs.map_batches(expand, batch_format="pyarrow",
                            batch_size=65536)


def js_divergence(
    ds: "ray.data.Dataset",
    text_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    nb: int = 16,
    round_to: int = 6,
) -> "pa.Table":
    """Jensen–Shannon divergence (nats) between the unigram
    distributions of two named corpora — the symmetric, bounded
    distribution-shift measure for corpus comparison (is this
    source's vocabulary drifting? how far is crawl N from crawl
    N−1?). Zero-count terms contribute only their side's half (JS
    needs no smoothing), so the full cross-vocabulary is never
    enumerated:

        JSD = ½ Σ p·ln(p/m) + ½ Σ q·ln(q/m),   m = (p + q)/2

    Tokenization matches the repo convention (whitespace split of
    trimmed text — replayable as DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')``). Scale shape: ONE
    composite (group, token) census shuffle (map-side pre-combined),
    totals from a tiny second reduce over the census, per-token
    contributions as a stateless map over census rows, final scalar
    via per-block partial sums — the vocabulary never lands on the
    driver. Returns ONE row ``(n_tok_a, n_tok_b, jsd)``; jsd is null
    if either corpus has no tokens.
    """
    from .canonicalize import sum_by_key

    def census(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column(group_col), pa.string())
        keep = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t2 = pa.table({"g": g, "text": t.column(text_col)}).filter(
            pc.fill_null(keep, False))
        t2 = t2.filter(pc.is_valid(t2.column("text")))
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t2.column("text")), _WS)
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        gg = pa.array(np.repeat(
            t2.column("g").to_numpy(zero_copy_only=False), lens))
        out = pa.table({"g": gg, "tok": flat})
        return out.append_column(
            "n", pa.array(np.ones(out.num_rows, np.int64)))

    cen = sum_by_key(ds.map_batches(census, batch_format="pyarrow"),
                     ["g", "tok"], "n", nb=nb).materialize()
    tot = {r["g"]: r["n"] for r in
           sum_by_key(cen, "g", "n", nb=4).take_all()}
    na, nb_tok = int(tot.get(group_a, 0)), int(tot.get(group_b, 0))
    if na == 0 or nb_tok == 0:
        return pa.table({
            "n_tok_a": pa.array([na], pa.int64()),
            "n_tok_b": pa.array([nb_tok], pa.int64()),
            "jsd": pa.array([None], pa.float64())})

    # per-token contributions need both sides' counts: one more
    # bucket reduce keyed by token pairs the two census rows up.
    from .canonicalize import _B, _add_bucket

    def bucketize(t: pa.Table) -> pa.Table:
        return _add_bucket(t, ["tok"], nb)

    def contrib(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        piv = df.pivot_table(index="tok", columns="g", values="n",
                             aggfunc="sum", fill_value=0)
        ca = (piv[group_a].to_numpy(np.float64)
              if group_a in piv.columns else np.zeros(len(piv)))
        cb = (piv[group_b].to_numpy(np.float64)
              if group_b in piv.columns else np.zeros(len(piv)))
        p, q = ca / na, cb / nb_tok
        m = (p + q) / 2.0
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (0.5 * np.where(p > 0, p * np.log(p / m), 0.0)
                 + 0.5 * np.where(q > 0, q * np.log(q / m), 0.0))
        import math
        return pa.table({"part": pa.array(
            [math.fsum(s.tolist())], pa.float64())})

    parts = (cen.map_batches(bucketize, batch_format="pyarrow",
                             batch_size=65536)
             .groupby(_B).map_groups(contrib, batch_format="pyarrow"))
    import math
    jsd = math.fsum(r["part"] for r in parts.take_all())
    return pa.table({
        "n_tok_a": pa.array([na], pa.int64()),
        "n_tok_b": pa.array([nb_tok], pa.int64()),
        "jsd": pa.array([round(jsd, round_to)], pa.float64())})


def c4_line_filter(
    docs: "object",
    min_words: int = 3,
    min_lines: int = 1,
    require_terminal: bool = True,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "object":
    """C4-style LINE-level cleaning (Raffel et al. 2020, public): keep
    only lines whose trimmed text has ≥ ``min_words`` whitespace words
    and (with ``require_terminal``) ends in terminal punctuation
    (``. ! ? "``); drop docs with fewer than ``min_lines`` surviving
    lines. The purely LOCAL curation pass — every decision is per doc,
    so this is ONE stateless ``map_batches`` with no shuffle at any
    scale.

    Fully vectorized: one Arrow split per batch, per-line keep mask
    from ``count_substring_regex`` + a terminal-punct regex, per-doc
    reassembly via a rebuilt ListArray + ``binary_join`` (no per-row
    Python). Null text behaves as ``''``. Output one row per
    surviving doc: ``id_col, text (cleaned), n_lines, n_kept``.
    Split semantics are Python ``str.split(sep)`` == DuckDB
    ``string_split`` (empty segments are lines), so the SQL twin
    replays byte-exactly."""
    if min_words < 0 or min_lines < 0:
        raise ValueError("c4_line_filter: bounds must be >= 0")

    def clean(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(t.column(text_col), pa.string()),
                           "")
        lists = pc.split_pattern(txt, sep)
        nl = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        trimmed = pc.utf8_trim_whitespace(flat)
        words = pc.count_substring_regex(trimmed, r"\S+")
        keep = pc.greater_equal(words, min_words)
        if require_terminal:
            keep = pc.and_(keep, pc.match_substring_regex(
                trimmed, r'[.!?"]$'))
        keepnp = keep.to_numpy(zero_copy_only=False)
        off = np.r_[0, np.cumsum(nl)]
        kept = (np.add.reduceat(keepnp.astype(np.int64), off[:-1])
                if len(flat) else np.zeros(t.num_rows, np.int64))
        kept[nl == 0] = 0  # reduceat artifact on empty docs
        new_off = np.r_[0, np.cumsum(kept)]
        vals = flat.filter(keep)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(new_off, pa.int32()),
                pc.cast(vals, pa.string())), sep)
        out = pa.table({
            id_col: t.column(id_col),
            "text": joined,
            "n_lines": pa.array(nl),
            "n_kept": pa.array(kept)})
        return out.filter(pa.array(kept >= min_lines))

    return docs.map_batches(clean, batch_format="pyarrow")


def wordpiece_encode(
    docs: "object",
    vocab: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = "[UNK]",
    max_word_len: int = 100,
    lowercase: bool = True,
) -> "object":
    """WordPiece tokenization against a FIXED vocabulary (Wu et al.
    2016 / BERT, public): per whitespace word, greedy
    LONGEST-MATCH-FIRST — the longest vocab prefix, then repeatedly
    the longest ``##``-continuation piece; any dead end (or a word
    over ``max_word_len`` chars) collapses the whole word to ``unk``,
    matching the BERT reference tokenizer exactly. The iterative
    per-word match is not vectorizable, so the plan bounds it: each
    batch DICTIONARY-ENCODES its words and pays the Python loop only
    per DISTINCT word (Zipf makes that tiny next to token count),
    then scatters piece strings back with a vectorized take +
    run-offset join. The vocab broadcasts once via ``ray.put`` (the
    ``encode_tokens`` contract — never re-shipped per batch); the
    corpus streams through ONE stateless ``map_batches``, no shuffle.

    Output: ``(id_col, n_words, n_pieces, n_unk, pieces)`` with
    ``pieces`` the space-joined piece sequence (null for word-less
    docs)."""
    import ray

    if unk not in vocab:
        raise ValueError("wordpiece_encode: unk token must be in "
                         "the vocab")
    ref = ray.put(frozenset(vocab))

    def _enc_word(w: str, vs) -> "list[str] | None":
        if len(w) > max_word_len:
            return None
        out, i = [], 0
        while i < len(w):
            j = len(w)
            while j > i:
                piece = ("##" + w[i:j]) if i else w[i:j]
                if piece in vs:
                    out.append(piece)
                    break
                j -= 1
            else:
                return None
            i = j
        return out

    def encode(batch: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        text = pc.fill_null(batch.column(text_col), "")
        if text.type != pa.string():
            text = text.cast(pa.string())
        if lowercase:
            text = pc.utf8_lower(text)
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), r"\s+")
        parent = pc.list_parent_indices(lists)
        flat = pc.list_flatten(lists)
        keep = pc.not_equal(flat, "")
        doc_idx = pc.filter(parent, keep).to_numpy(
            zero_copy_only=False)
        words = pc.filter(flat, keep)
        dic = words.combine_chunks().dictionary_encode() \
            if isinstance(words, pa.ChunkedArray) \
            else words.dictionary_encode()
        uniq = dic.dictionary.to_pylist() if not isinstance(
            dic, pa.ChunkedArray) else \
            dic.combine_chunks().dictionary.to_pylist()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        enc = []
        for w in uniq:
            pieces = _enc_word(w, vs)
            enc.append((unk, 1, 1) if pieces is None
                       else (" ".join(pieces), len(pieces), 0))
        codes = dic.indices.to_numpy(zero_copy_only=False)
        piece_str = np.array([e[0] for e in enc], object)[codes] \
            if len(enc) else np.array([], object)
        piece_n = np.array([e[1] for e in enc], np.int64)[codes] \
            if len(enc) else np.array([], np.int64)
        unk_n = np.array([e[2] for e in enc], np.int64)[codes] \
            if len(enc) else np.array([], np.int64)
        nw = np.bincount(doc_idx, minlength=batch.num_rows) \
            if len(doc_idx) else np.zeros(batch.num_rows, np.int64)
        npieces = np.zeros(batch.num_rows, np.int64)
        nunk = np.zeros(batch.num_rows, np.int64)
        if len(doc_idx):
            np.add.at(npieces, doc_idx, piece_n)
            np.add.at(nunk, doc_idx, unk_n)
        # per-doc space-join of word piece-strings, in order
        order = np.argsort(doc_idx, kind="stable")
        svals = pa.array(piece_str[order], pa.string()) if len(
            doc_idx) else pa.array([], pa.string())
        off = np.r_[0, np.cumsum(nw)].astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off), svals), " ")
        joined = pc.if_else(pc.equal(pa.array(nw, pa.int64()), 0),
                            pa.scalar(None, pa.string()), joined)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(nw.astype(np.int64)),
            "n_pieces": pa.array(npieces),
            "n_unk": pa.array(nunk),
            "pieces": joined})

    return docs.map_batches(encode, batch_format="pyarrow")


def compression_ratio(
    docs: "object",
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> "object":
    """Compression-ratio quality signal (the Gopher/doc-quality
    heuristic this family was missing): ``ratio = deflate_bytes /
    utf8_bytes`` per document — highly repetitive boilerplate
    compresses far below ~0.4, random noise sits near 1. ONE
    stateless ``map_batches``; the per-doc zlib call is C-speed (the
    hashlib contract — Python only drives the loop). Deterministic:
    zlib output is fully specified by (input, level). Null text →
    null ratio; empty text → null (no bytes to compress). Output:
    ``(id_col, n_bytes, n_compressed, ratio round 6)``."""
    import zlib

    def score(t: pa.Table) -> pa.Table:
        txt = t.column(text_col).to_pylist()
        nb, nc, ratio = [], [], []
        for s in txt:
            if s is None or s == "":
                nb.append(None)
                nc.append(None)
                ratio.append(None)
                continue
            raw = s.encode("utf-8")
            comp = len(zlib.compress(raw, level))
            nb.append(len(raw))
            nc.append(comp)
            ratio.append(round(comp / len(raw), 6))
        return pa.table({
            id_col: t.column(id_col),
            "n_bytes": pa.array(nb, pa.int64()),
            "n_compressed": pa.array(nc, pa.int64()),
            "ratio": pa.array(ratio, pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow")


def char_entropy(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-document Shannon entropy over CHARACTERS (bits/char) — the
    classic randomness/quality signal next to compression ratio: low
    entropy flags repetitive boilerplate, very high entropy flags
    encoded blobs. One stateless ``map_batches``; inside each batch
    the texts are concatenated ONCE into a UTF-32 codepoint array and
    per-(doc, codepoint) counts come from a single ``np.unique`` over
    a combined 64-bit key — no per-row Python, no per-row Counter.
    Null/empty text → entropy 0.0 with n_chars 0 (log of nothing is
    an empty sum, matching the SQL twin's COALESCE)."""
    import numpy as np
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column(text_col), "")
        s = "".join(txt.to_pylist())
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        lens = lens.astype(np.int64)
        n = len(batch)
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = doc_idx << np.int64(21) | codes.astype(np.int64)
        _, first, cnt = np.unique(key, return_index=True,
                                  return_counts=True)
        d = doc_idx[first] if len(first) else np.array([], np.int64)
        p = cnt / np.maximum(lens[d], 1)
        contrib = -p * np.log2(p)
        ent = np.zeros(n, np.float64)
        np.add.at(ent, d, contrib)
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars": pa.array(lens),
            "entropy": pa.array(ent)})

    return docs.map_batches(f, batch_format="pyarrow")
