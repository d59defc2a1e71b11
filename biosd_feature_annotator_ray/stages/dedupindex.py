"""Persisted MinHash-LSH dedup index: dedup NEW documents against a
historical corpus WITHOUT recomputing the corpus (graft-added; the
production need is "does tonight's crawl duplicate anything in the
100 TB archive?", where re-running pairwise LSH over the archive per
increment is unaffordable).

Layout (same atomic-fragment pattern as the BM25 ``textindex``):

    out_dir/
      meta.parquet            minhash params (num_perm/bands/ngram/seed/nb)
      buckets/b=<k>/frag-<digest>.parquet
                              (doc_id, band_id, band_key, sig) rows whose
                              hash(band_id, band_key) % nb == k, sorted
                              by band_key inside small row groups

Scale shape: the QUERY computes band rows only for the new docs, groups
them by the same coarse bucket hash the build used, and each reduce
group opens ONLY its own bucket directory with a ``band_key IN (…)``
parquet filter — row-group pruning (fragments are band_key-sorted)
means a query touches O(candidate) index bytes, never the archive.
``append_dedup_index`` adds new fragments in place (content-hash names
are rename-atomic and retry-idempotent), making the index incremental:
index tonight's crawl after deduping it against yesterday's.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from .canonicalize import _B, _add_bucket, dedup_exact
from .dedup import MinHashSignatures, _as_task_fn, _sig_similarity

_ROW_GROUP = 16384


def _meta_path(d: str) -> str:
    return os.path.join(d, "meta.parquet")


def _read_meta(index_dir: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(_meta_path(index_dir))
    return {k: int(t.column(k)[0].as_py()) for k in t.column_names}


def count_indexed_docs(index_dir: str) -> int:
    """Exact indexed-doc count derived from fragment FOOTERS (each doc
    contributes exactly ``bands`` band rows): sum of num_rows / bands.
    Unlike a read-modify-write meta counter, this stays correct under
    append retries (duplicate digests overwrite, never double-count)
    and concurrent appends."""
    import pyarrow.parquet as pq

    meta = _read_meta(index_dir)
    broot = os.path.join(index_dir, "buckets")
    # a concurrent compaction can unlink a listed fragment — retry the
    # walk (post-compaction state is complete and consistent)
    for attempt in range(3):
        total = 0
        try:
            if os.path.isdir(broot):
                for b in os.listdir(broot):
                    bdir = os.path.join(broot, b)
                    for f in os.listdir(bdir):
                        if f.endswith(".parquet"):
                            total += pq.ParquetFile(
                                os.path.join(bdir, f)).metadata.num_rows
            break
        except FileNotFoundError:
            if attempt == 2:
                raise
    return total // meta["bands"]


def _scatter_band_rows(docs: "ray.data.Dataset", out_dir: str,
                       params: dict) -> int:
    """Band-row scatter shared by build and append: one stateless pass,
    fragments named by content digest (idempotent under task retry)."""
    import pyarrow.parquet as pq

    kw = {k: params[k] for k in ("num_perm", "bands", "ngram", "seed")}
    nb = params["nb"]
    sig_stage = _as_task_fn(MinHashSignatures, kw)

    def write_rows(batch: pa.Table) -> pa.Table:
        rows = sig_stage(batch)
        t = _add_bucket(rows, ["band_id", "band_key"], nb)
        b = t.column(_B).to_numpy(zero_copy_only=False)
        t = t.drop_columns([_B])
        from ..functions.hashing import hash_strings

        row_h = hash_strings(pa.compute.binary_join_element_wise(
            pa.compute.cast(t.column("doc_id"), pa.string()),
            pa.compute.cast(t.column("band_id"), pa.string()),
            pa.compute.cast(t.column("band_key"), pa.string()), "\x1f"))
        for bk in np.unique(b):
            sub = (t.filter(pa.array(b == bk))
                   .sort_by([("band_key", "ascending")]))
            bdir = os.path.join(out_dir, "buckets", f"b={int(bk)}")
            os.makedirs(bdir, exist_ok=True)
            with np.errstate(over="ignore"):
                digest = int(np.uint64(np.sum(row_h[b == bk], dtype=np.uint64))
                             + np.uint64(len(sub)))
            import uuid

            # tmp name is UNIQUE per attempt (a straggler original and
            # its retry must never interleave writes into one path —
            # the FINAL name stays content-derived for idempotence)
            tmp = os.path.join(bdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(sub, tmp, row_group_size=_ROW_GROUP)
            os.replace(tmp, os.path.join(bdir, f"frag-{digest:016x}.parquet"))
        return pa.table({"n": pa.array([len(batch)], pa.int64())})

    s = docs.map_batches(write_rows, batch_format="pyarrow",
                         batch_size=8192).sum("n")
    return int(s or 0)


def build_dedup_index(
    docs: "ray.data.Dataset",
    out_dir: str,
    id_col: str = "doc_id",
    col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    ngram: int = 3,
    seed: int = 42,
    nb: int = 32,
) -> int:
    """Build the persisted LSH index over a corpus; returns docs
    indexed. No-op if ``_DONE`` exists AND the requested params match
    the persisted meta (a rebuild with different num_perm/bands/ngram/
    seed/nb raises instead of silently returning the stale index).
    Refuses to overwrite a directory that is not a dedup index."""
    import pyarrow.parquet as pq
    import shutil

    params = {"num_perm": num_perm, "bands": bands, "ngram": ngram,
              "seed": seed, "nb": nb}
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        meta = _read_meta(out_dir)
        diff = {k: (v, meta.get(k)) for k, v in params.items()
                if meta.get(k) != v}
        if diff:
            raise ValueError(
                f"build_dedup_index: {out_dir!r} already holds a finished "
                f"index built with different params {diff} (requested, "
                "persisted) — delete the directory to rebuild")
        return count_indexed_docs(out_dir)
    if os.path.isdir(out_dir):
        bdir = os.path.join(out_dir, "buckets")
        if os.path.isdir(bdir) or os.path.exists(_meta_path(out_dir)):
            # interrupted build: digests depend on batch boundaries, so
            # resume granularity is the whole index (same contract as
            # build_text_index) — delete only recognizable artifacts
            if os.path.isdir(bdir):
                shutil.rmtree(bdir)
            if os.path.exists(_meta_path(out_dir)):
                os.remove(_meta_path(out_dir))
        elif os.listdir(out_dir):
            raise ValueError(
                f"build_dedup_index: {out_dir!r} exists, is not a dedup "
                "index, and is not empty — refusing to overwrite")
    os.makedirs(out_dir, exist_ok=True)
    if id_col != "doc_id" or col != "text":
        docs = docs.map_batches(
            lambda t, i=id_col, c=col: pa.table(
                {"doc_id": t.column(i), "text": t.column(c)}),
            batch_format="pyarrow")
    n = _scatter_band_rows(docs, out_dir, params)
    pq.write_table(pa.table({k: pa.array([v], pa.int64())
                             for k, v in params.items()}),
                   _meta_path(out_dir))
    with open(done, "w") as f:
        f.write("ok")
    return n


def append_dedup_index(docs: "ray.data.Dataset", index_dir: str,
                       id_col: str = "doc_id", col: str = "text") -> int:
    """Incrementally add documents to an existing index (same params,
    new fragments — atomic, idempotent under retry). Returns docs
    added. The caller is responsible for id uniqueness across
    increments (duplicate ids would pair with themselves and be
    filtered, but waste index bytes)."""
    import pyarrow.parquet as pq

    if not os.path.exists(os.path.join(index_dir, "_DONE")):
        raise ValueError(f"append_dedup_index: {index_dir!r} is not a "
                         "finished dedup index")
    meta = _read_meta(index_dir)
    if id_col != "doc_id" or col != "text":
        docs = docs.map_batches(
            lambda t, i=id_col, c=col: pa.table(
                {"doc_id": t.column(i), "text": t.column(c)}),
            batch_format="pyarrow")
    # meta holds only the immutable params; doc counts derive from
    # fragment footers (count_indexed_docs) so a retried append that
    # re-writes identical digests never double-counts
    return _scatter_band_rows(docs, index_dir, meta)


def compact_dedup_index(index_dir: str, rows_per_file: int = 2_000_000,
                        max_concurrency: int = 8) -> dict:
    """Rewrite each bucket directory's accumulated append fragments into
    few large band_key-sorted files (r03 verdict item 2: nightly appends
    against a 100-TB archive grow one fragment set per increment, and
    query latency degrades with file count even though band_key pruning
    stays correct).

    Safety contract (same content-digest idempotence as the scatter):
    new files land via unique-tmp + atomic rename BEFORE the old
    fragments are unlinked, so a query that races a compaction sees at
    worst DUPLICATE band rows — which only duplicate candidate pairs,
    and ``query_dedup_index`` already dedups pairs on (id_a, id_b); a
    reader whose file listing straddles the unlink gets
    FileNotFoundError and RETRIES against the now-complete compacted
    view (probe and count both retry ×3). A
    crash between rename and unlink leaves duplicates that the next
    compaction removes (rows are deduped on (doc_id, band_id, band_key)
    here, so re-compaction converges and digests are stable). Appends
    that race a compaction write NEW fragment files, which are not in
    the deletion snapshot and therefore survive.

    One Ray task per bucket directory (embarrassingly parallel; the
    Dataset API adds nothing over a directory-rewrite task). Peak task
    memory is one bucket's rows — at 100 TB size ``nb`` so a bucket's
    band rows fit a worker heap. Returns
    {"buckets": n, "frags_before": a, "frags_after": b}."""
    if not os.path.exists(os.path.join(index_dir, "_DONE")):
        raise ValueError(f"compact_dedup_index: {index_dir!r} is not a "
                         "finished dedup index")
    broot = os.path.join(index_dir, "buckets")
    bdirs = (sorted(os.path.join(broot, b) for b in os.listdir(broot))
             if os.path.isdir(broot) else [])

    @ray.remote
    def compact_bucket(bdir: str) -> tuple[int, int]:
        import uuid

        import pyarrow.parquet as pq

        from ..functions.hashing import hash_strings

        frags = sorted(f for f in os.listdir(bdir)
                       if f.endswith(".parquet"))
        if len(frags) <= 1:
            return len(frags), len(frags)
        t = pa.concat_tables([pq.read_table(os.path.join(bdir, f))
                              for f in frags])
        # duplicates can exist only if a prior compaction crashed
        # between rename and unlink (or an append was retried across a
        # compaction) — dedup on the full logical key so digests and
        # count_indexed_docs converge
        df = t.to_pandas().drop_duplicates(
            subset=["doc_id", "band_id", "band_key"])
        df = df.sort_values(["band_key", "band_id", "doc_id"],
                            kind="mergesort")
        t = pa.Table.from_pandas(df, preserve_index=False)
        keep: set[str] = set()
        for lo in range(0, len(t), rows_per_file):
            sub = t.slice(lo, rows_per_file)
            row_h = hash_strings(pa.compute.binary_join_element_wise(
                pa.compute.cast(sub.column("doc_id"), pa.string()),
                pa.compute.cast(sub.column("band_id"), pa.string()),
                pa.compute.cast(sub.column("band_key"), pa.string()),
                "\x1f"))
            with np.errstate(over="ignore"):
                digest = int(np.uint64(np.sum(row_h, dtype=np.uint64))
                             + np.uint64(len(sub)))
            name = f"frag-{digest:016x}.parquet"
            tmp = os.path.join(bdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(sub, tmp, row_group_size=_ROW_GROUP)
            os.replace(tmp, os.path.join(bdir, name))
            keep.add(name)
        for f in frags:
            if f not in keep:
                os.remove(os.path.join(bdir, f))
        return len(frags), len(keep)

    before = after = 0
    for lo in range(0, len(bdirs), max_concurrency):
        for b, a in ray.get([compact_bucket.remote(d)
                             for d in bdirs[lo:lo + max_concurrency]]):
            before += b
            after += a
    return {"buckets": len(bdirs), "frags_before": before,
            "frags_after": after}


def query_dedup_index(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    col: str = "text",
    max_old_per_key: int = 256,
) -> "ray.data.Dataset":
    """Near-dup pairs (new_id, old_id, similarity) between NEW docs and
    the indexed corpus. Each reduce group reads ONLY its bucket
    directory, filtered to the band keys it actually probes (parquet
    row-group pruning on the band_key-sorted fragments). A single hot
    band key matching more than ``max_old_per_key`` archive rows is
    capped and logged (boilerplate clique — the kept members suffice to
    flag the new doc as a duplicate)."""
    meta = _read_meta(index_dir)
    kw = {k: meta[k] for k in ("num_perm", "bands", "ngram", "seed")}
    nb = meta["nb"]
    sig_stage = _as_task_fn(MinHashSignatures, kw)
    if id_col != "doc_id" or col != "text":
        new_docs = new_docs.map_batches(
            lambda t, i=id_col, c=col: pa.table(
                {"doc_id": t.column(i), "text": t.column(c)}),
            batch_format="pyarrow")

    def bands_local(batch: pa.Table) -> pa.Table:
        return _add_bucket(sig_stage(batch), ["band_id", "band_key"], nb)

    def probe(g: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "similarity": pa.array([], pa.float64())})
        bk = int(g.column(_B)[0].as_py())
        bdir = os.path.join(index_dir, "buckets", f"b={bk}")
        if not os.path.isdir(bdir):
            return empty
        new = g.drop_columns([_B]).to_pandas()
        keys = new["band_key"].unique()
        # a compaction racing this probe may unlink a fragment between
        # dataset discovery and read — re-discover and retry (the
        # compacted replacement is already in place: rename precedes
        # unlink, so a retry sees a complete view)
        for attempt in range(3):
            try:
                dset = pads.dataset(bdir, format="parquet")
                old = dset.to_table(
                    filter=pads.field("band_key").isin(
                        pa.array(keys))).to_pandas()
                break
            except FileNotFoundError:
                if attempt == 2:
                    raise
        if not len(old):
            return empty
        cand = new.merge(old, on=["band_id", "band_key"],
                         suffixes=("_new", "_old"))
        if not len(cand):
            return empty
        # hot-key cap: bound the per-(band, key) fan-out, loudly
        grp = cand.groupby(["doc_id_new", "band_id", "band_key"],
                           sort=False)
        rank = grp.cumcount()
        over = int((rank == max_old_per_key).sum())
        if over:
            import logging

            logging.getLogger(__name__).warning(
                "dedup-index hot band key: %d candidate group(s) capped "
                "at max_old_per_key=%d", over, max_old_per_key)
            cand = cand[rank < max_old_per_key]
        ia, ib, sims = [], [], []
        na = cand["doc_id_new"].to_numpy()
        ob = cand["doc_id_old"].to_numpy()
        sn = cand["sig_new"].to_numpy()
        so = cand["sig_old"].to_numpy()
        for i in range(len(cand)):
            if na[i] == ob[i]:
                continue  # re-query of an already-indexed doc
            s = _sig_similarity(sn[i], so[i])
            if s >= threshold:
                ia.append(int(na[i]))
                ib.append(int(ob[i]))
                sims.append(s)
        return pa.table({"id_a": pa.array(ia, pa.int64()),
                         "id_b": pa.array(ib, pa.int64()),
                         "similarity": pa.array(np.round(sims, 6),
                                                pa.float64())})

    pairs = (new_docs.map_batches(bands_local, batch_format="pyarrow",
                                  batch_size=8192)
             .groupby(_B).map_groups(probe, batch_format="pyarrow"))
    # a (new, old) pair discovered by several bands carries the same
    # signature similarity — keep one
    return dedup_exact(pairs, ["id_a", "id_b"], nb=8)
