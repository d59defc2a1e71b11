"""Persisted inverted text index + BM25 search over it.

The IR analog of the persisted IVF index (similarity.py): postings are
scattered into ``nb`` term-hash bucket directories at build time, and a
query reads ONLY the bucket files its terms hash into — storage-level
pruning, no full-corpus scan at query time.

Layout under ``index_dir``:
  meta.parquet                      — (n_docs, sum_dl) corpus stats
  buckets/b=N/frag-<digest>.parquet — postings (term, doc_id, tf, dl)
  _DONE                             — build-complete marker (resume)

Fragments are written atomically (tmp + rename) with content-derived
names, so task retries are idempotent — same contract as the sink and
the IVF cells.

``search_text_index`` reproduces ``textstats.bm25_topk`` EXACTLY
(including its half-away-from-zero 6-decimal rounding and the
term-order float summation): per-doc scores are accumulated by
pivoting contributions into term-indexed columns and adding them left
to right — the same ((0+c₀)+c₁)+… sequence the full-scan operator
computes — so the two paths are bit-identical, parity-tested, and
share one DuckDB oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings


def build_text_index(
    docs: "object",
    out_dir: str,
    nb: int = 32,
    id_col: str = "doc_id",
    col: str = "text",
) -> None:
    """Tokenize the corpus and scatter (term, doc_id, tf, dl) postings
    into term-hash buckets. No-op if ``_DONE`` exists."""
    import pyarrow.parquet as pq

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return
    # interrupted build: fragment digests depend on batch BOUNDARIES,
    # so a rebuild with different batching would leave stale fragments
    # alongside new ones (duplicated postings → wrong tf/df). Resume
    # granularity is the whole index — start clean, but ONLY ever
    # delete recognizable index artifacts: out_dir pointed at a
    # directory of unrelated user files must raise, not vanish.
    if os.path.isdir(out_dir):
        import shutil

        bdir = os.path.join(out_dir, "buckets")
        meta = os.path.join(out_dir, "meta.parquet")
        if os.path.isdir(bdir) or os.path.exists(meta):
            # STRICT delete: a stale fragment that survives would be
            # read alongside new ones and double tf/df — fail loudly
            # rather than rebuild on top of it
            if os.path.isdir(bdir):
                shutil.rmtree(bdir)
            if os.path.exists(meta):
                os.remove(meta)
        elif os.listdir(out_dir):
            raise ValueError(
                f"build_text_index: {out_dir!r} exists, is not a text "
                "index, and is not empty — refusing to overwrite")

    def postings(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = [t.split() for t in df[col].fillna("")]
        lengths = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        flat = pd.DataFrame({
            "doc_id": np.repeat(df[id_col].to_numpy(), lengths),
            "dl": np.repeat(lengths, lengths),
            "term": [w for ws in toks for w in ws],
        })
        tf = (flat.groupby(["term", "doc_id", "dl"], sort=False)
              .size().reset_index(name="tf"))
        t = pa.Table.from_pandas(tf, preserve_index=False).cast(pa.schema([
            pa.field("term", pa.string()), pa.field("doc_id", pa.int64()),
            pa.field("dl", pa.int64()), pa.field("tf", pa.int64())]))
        b = (hash_strings(t.column("term")) % np.uint64(nb)).astype(np.int64)
        row_h = hash_strings(pa.compute.binary_join_element_wise(
            t.column("term"), pa.compute.cast(t.column("doc_id"), pa.string()),
            "\x1f"))
        for bk in np.unique(b):
            sub = t.filter(pa.array(b == bk))
            bdir = os.path.join(out_dir, "buckets", f"b={int(bk)}")
            os.makedirs(bdir, exist_ok=True)
            with np.errstate(over="ignore"):
                digest = int(np.uint64(np.sum(row_h[b == bk], dtype=np.uint64))
                             + np.uint64(len(sub)))
            tmp = os.path.join(bdir, f".tmp-{digest:016x}")
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(bdir, f"frag-{digest:016x}.parquet"))
        # stats partial: one row per batch
        return pa.table({"n": pa.array([len(df)], pa.int64()),
                         "dl_sum": pa.array([int(lengths.sum())], pa.int64())})

    s = docs.map_batches(postings, batch_format="pyarrow",
                         batch_size=65536).sum(["n", "dl_sum"])
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({"n_docs": pa.array([(s or {}).get("sum(n)") or 0], pa.int64()),
                  "sum_dl": pa.array([(s or {}).get("sum(dl_sum)") or 0],
                                     pa.int64())}),
        os.path.join(out_dir, "meta.parquet"))
    with open(done, "w") as f:
        f.write("ok")


def search_text_index(
    index_dir: str,
    terms: list[str],
    topk: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    nb: int = 32,
) -> pa.Table:
    """BM25 top-k from the persisted index, reading only the query
    terms' bucket files. Bit-identical to ``bm25_topk`` on the same
    corpus (parity-tested)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    terms = list(terms)
    meta = pq.read_table(os.path.join(index_dir, "meta.parquet"))
    N = int(meta.column("n_docs")[0].as_py())
    sdl = int(meta.column("sum_dl")[0].as_py())
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if N == 0 or not terms:
        return empty
    avgdl = float(sdl) / float(N)

    tb = (hash_strings(pa.array(terms, pa.string())) % np.uint64(nb)).astype(int)
    files = []
    for bk in sorted(set(int(x) for x in tb)):
        bdir = os.path.join(index_dir, "buckets", f"b={bk}")
        if os.path.isdir(bdir):
            files += [os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                      if f.endswith(".parquet")]
    if not files:
        return empty

    # positions, not a dict: a DUPLICATED query term contributes once
    # per occurrence in bm25_topk's left-to-right sum — replicate each
    # posting row into every position of its term to stay bit-identical
    pos_of: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        pos_of.setdefault(t, []).append(i)
    posts = (rd.read_parquet(files)
             .map_batches(lambda t: t.filter(
                 pa.compute.is_in(t.column("term"),
                                  value_set=pa.array(terms, pa.string()))),
                          batch_format="pyarrow"))

    # df per term: postings are unique per (term, doc) by construction
    from ray.data.aggregate import Count

    dfc = posts.groupby("term").aggregate(Count(alias_name="df")).to_pandas()
    df_of = dict(zip(dfc["term"], dfc["df"]))
    idf = np.array([np.log((N - float(df_of.get(t, 0)) + 0.5)
                           / (float(df_of.get(t, 0)) + 0.5) + 1.0)
                    for t in terms])
    idf_ref = idf  # broadcast via closure (tiny)

    from .canonicalize import _B, _add_bucket

    def score(batch: pa.Table) -> pa.Table:
        d = batch.drop_columns([_B]).to_pandas()
        # replicate rows per query position of their term
        plists = d["term"].map(pos_of)
        counts = plists.str.len().to_numpy(dtype=np.int64)
        d = d.iloc[np.repeat(np.arange(len(d)), counts)].reset_index(drop=True)
        ti = np.fromiter((p for ps in plists for p in ps), np.int64,
                         count=int(counts.sum()))
        tf = d["tf"].to_numpy(dtype=np.float64)
        dl = d["dl"].to_numpy(dtype=np.float64)
        contrib = (idf_ref[ti] * tf * (k1 + 1.0)
                   / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        # pivot to (doc × term) and add columns in TERM ORDER so the
        # float sequence matches bm25_topk's ((0+c0)+c1)+… exactly
        piv = (pd.DataFrame({"doc_id": d["doc_id"], "ti": ti, "c": contrib})
               .pivot_table(index="doc_id", columns="ti", values="c",
                            aggfunc="sum", fill_value=0.0))
        sc = np.zeros(len(piv), np.float64)
        for i in sorted(piv.columns):
            sc = sc + piv[i].to_numpy()
        sc = np.sign(sc) * np.floor(np.abs(sc) * 1e6 + 0.5) / 1e6
        out = pd.DataFrame({"doc_id": piv.index.to_numpy(), "score": sc})
        out = out[out["score"] > 0].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(topk)
        return pa.Table.from_pandas(out, preserve_index=False)

    # a doc's postings live in ≤ |terms| term-buckets; ONE doc-hash
    # bucket shuffle co-locates each doc's rows, then a whole-bucket
    # pivot scores every doc in the group at once (vectorized, local
    # top-k per bucket — only ≤ topk·nb partial rows reach the driver)
    parts = (posts.map_batches(
                 lambda t: _add_bucket(t, ["doc_id"], 16),
                 batch_format="pyarrow")
             .groupby(_B)
             .map_groups(score, batch_format="pyarrow")
             .to_pandas())
    out = (parts.sort_values(["score", "doc_id"], ascending=[False, True])
           .head(topk).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def text_index_dir_for(parquet_path: str, base: str = "/tmp") -> str:
    from .similarity import index_dir_for

    return index_dir_for(parquet_path, base=base, prefix="graft_text_idx")


def phrase_search(
    docs: "object",
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    nb: int = 16,
) -> "object":
    """Exact positional phrase search — "find documents containing
    these words adjacently, in order" (the IR primitive BM25's
    bag-of-words scoring cannot express). Tokenization matches the
    repo convention (whitespace split of trimmed text, lowercase).

    Scale shape: the tokenize map emits (doc, pos) postings for the
    PHRASE'S terms only (the full vocabulary never enters the
    pipeline); term i's postings are rebased to ``pos − i`` so an
    adjacent in-order match is a (doc, rebased-pos) key shared by ALL
    terms — one composite census counting distinct terms per key
    finds matches without any join chain (k-term phrase = one
    shuffle, not k−1 joins). A phrase with repeated words is handled
    by requiring ALL k distinct (term, offset) slots to fire.
    Output: ``(doc_id, n_matches)`` per matching document.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.canonicalize import sum_by_key

    words = [w.lower() for w in phrase.strip().split()]
    if not words:
        raise ValueError("empty phrase")
    k = len(words)
    # slot id per (word, offset) pair — repeated words keep distinct
    # slots, so "the big the" needs 'the' at BOTH offsets 0 and 2
    slots = {(w, i) for i, w in enumerate(words)}
    wordset = sorted({w for w, _ in slots})

    def postings(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t.column(text_col))),
            r"\s+")
        lens = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lists)
        ids = np.repeat(
            t.column(id_col).to_numpy(zero_copy_only=False), lens)
        pos = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(np.cumsum(lens) - lens, lens))
        keep = pc.is_in(flat, value_set=pa.array(wordset))
        keepn = keep.to_numpy(zero_copy_only=False)
        fl = flat.filter(keep)
        ids, pos = ids[keepn], pos[keepn]
        # expand to (doc, anchor = pos − offset, slot) rows
        out_ids, out_anchor, out_slot = [], [], []
        for w, off in slots:
            m = pc.equal(fl, w).to_numpy(zero_copy_only=False)
            a = pos[m] - off
            ok = a >= 0
            out_ids.append(ids[m][ok])
            out_anchor.append(a[ok])
            out_slot.append(np.full(int(ok.sum()),
                                    off, np.int64))
        # type the doc column from the ORIGINAL id column — an
        # all-empty concatenation of object arrays (string ids, no
        # phrase-term tokens in the batch) would otherwise infer as
        # null and break downstream schema unification
        id_type = t.column(id_col).type
        return pa.table({
            "doc": pa.array(np.concatenate(out_ids)
                            if out_ids else
                            np.array([], np.int64), type=id_type),
            "anchor": pa.array(np.concatenate(out_anchor)
                               if out_anchor else
                               np.array([], np.int64)),
            "slot": pa.array(np.concatenate(out_slot)
                             if out_slot else np.array([], np.int64)),
            "one": pa.array(np.ones(
                sum(len(a) for a in out_ids), np.int64))})

    ds = docs.map_batches(postings, batch_format="pyarrow")
    # distinct slots per (doc, anchor): a full match fires all k
    per_slot = sum_by_key(ds, ["doc", "anchor", "slot"], "one", nb=nb)
    per_anchor = sum_by_key(
        per_slot.map_batches(
            lambda t: pa.table({
                "doc": t.column("doc"), "anchor": t.column("anchor"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["doc", "anchor"], "one", nb=nb, out_col="n_slots")
    def to_hits(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("n_slots"), k))
        return pa.table({
            "doc_id": t.column("doc"),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    return sum_by_key(
        per_anchor.map_batches(to_hits, batch_format="pyarrow"),
        "doc_id", "one", nb=nb, out_col="n_matches")
