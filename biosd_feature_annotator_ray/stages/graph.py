"""Adjacency-list graph materialization (SURVEY.md §2 A5, §4.2 step 3).

Triples are hash-partitioned on ``subj`` into P fixed partitions (P is
a function of DATA size, never cluster size — the checkpoint/lineage
unit), then each partition is packed into adjacency rows
``subj, edges: list<struct<pred, obj, obj_kind, score>>`` with a single
shuffle: ``groupby(part_id).map_groups(pack)`` — the within-partition
subj grouping is partition-local, vectorized via sorted-run offsets
(no per-subject Python).

Hub subjects (SURVEY.md §7 risk 5): runs longer than ``max_edges`` are
split into spill-over rows so a single row can never exceed block
targets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings
from ..schemas import GRAPH_EDGE


def _pair_index_upper(d: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
    """Run lengths ``d`` (over a sorted array) → global index arrays
    ``(left, right)`` enumerating every within-run index pair with
    ``left < right`` — the vectorized upper-triangle expansion shared
    by the wedge/pair operators (butterflies, node similarity,
    co-citation, co-occurrence). O(Σ d(d-1)/2) output, zero Python
    loops, half the memory of the naive d² self-merge."""
    d = d.astype(np.int64, copy=False)
    n = int(d.sum())
    starts = np.cumsum(d) - d
    li = np.arange(n, dtype=np.int64) - np.repeat(starts, d)
    mult = np.repeat(d, d) - 1 - li
    total = int(mult.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    left = np.repeat(np.arange(n, dtype=np.int64), mult)
    bs = np.cumsum(mult) - mult
    right = left + 1 + (np.arange(total, dtype=np.int64) - np.repeat(bs, mult))
    return left, right


def _expand_sorted_pairs(
    tbl: pa.Table, key_col: str, val_col: str
) -> "tuple[pa.Table, np.ndarray, np.ndarray]":
    """Sort ``tbl`` by ``(key, val)`` and enumerate all within-key
    value pairs with ``val[left] < val[right]`` (equal-value pairs
    dropped — STRICT ``<``, matching the self-merge + ``x < y`` filter
    semantics this replaces, including duplicate-row multiplicities).
    Returns ``(sorted_tbl, left, right)`` global index arrays into the
    sorted table."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if tbl.num_rows == 0:
        return (tbl, *empty)
    idx = pc.sort_indices(tbl, sort_keys=[(key_col, "ascending"),
                                          (val_col, "ascending")])
    s = tbl.take(idx)
    k = s.column(key_col).combine_chunks()
    ne = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1))
    ne = ne.fill_null(True).to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, ne])
    d = np.diff(np.r_[starts, len(k)])
    left, right = _pair_index_upper(d)
    if len(left) == 0:
        return (s, *empty)
    v = s.column(val_col).combine_chunks()
    keep = pc.not_equal(v.take(pa.array(left)), v.take(pa.array(right)))
    keep = keep.fill_null(False).to_numpy(zero_copy_only=False)
    return s, left[keep], right[keep]


def add_part_id(batch: pa.Table, num_parts: int) -> pa.Table:
    h = hash_strings(batch.column("subj"))
    return batch.append_column("part_id", pa.array((h % np.uint64(num_parts)).astype(np.int32)))


def pack_adjacency(part: pa.Table, max_edges: int = 10_000) -> pa.Table:
    """One partition of triples → adjacency rows (vectorized)."""
    if len(part) == 0:
        return pa.table(
            {"subj": pa.array([], pa.string()),
             "edges": pa.array([], pa.list_(GRAPH_EDGE)),
             "part_id": pa.array([], pa.int32())}
        )
    part = part.sort_by([("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")])
    subj = part.column("subj").combine_chunks()
    edges_struct = pa.StructArray.from_arrays(
        [
            part.column("pred").combine_chunks(),
            part.column("obj").combine_chunks(),
            part.column("obj_kind").combine_chunks(),
            part.column("score").cast(pa.float32()).combine_chunks(),
        ],
        fields=list(GRAPH_EDGE),
    )
    # Run boundaries of the sorted subj column.
    s = subj.to_numpy(zero_copy_only=False)
    change = np.ones(len(s), dtype=bool)
    change[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(s))
    # Split hub runs (> max_edges) into spill-over rows — fully
    # vectorized (a Python loop here costs ~1s per 25k subjects).
    lengths = ends - starts
    if (lengths <= max_edges).all():
        rs, re_ = starts, ends
    else:
        chunks = -(-lengths // max_edges)  # ceil division per run
        total = int(chunks.sum())
        run_of_row = np.repeat(np.arange(len(starts)), chunks)
        excl = np.concatenate(([0], np.cumsum(chunks)[:-1]))
        within = np.arange(total) - excl[run_of_row]
        rs = starts[run_of_row] + within * max_edges
        re_ = np.minimum(rs + max_edges, ends[run_of_row])
    offsets = pa.array(np.append(rs, re_[-1]).astype(np.int32))
    # ListArray.from_arrays requires contiguous offsets; rs is sorted and
    # re_[i] == rs[i+1] holds by construction (runs tile the partition).
    edges = pa.ListArray.from_arrays(offsets, edges_struct)
    out_subj = subj.take(pa.array(rs))
    part_id = part.column("part_id").combine_chunks().take(pa.array(rs))
    return pa.table({"subj": out_subj, "edges": edges, "part_id": part_id})


class _RoundCheckpoint:
    """Shared per-round checkpoint primitives for the iterative graph
    operators (one definition — the three loops stay structurally
    identical): round data in ``<prefix>-<k:04d>/`` parquet, a
    ``_<PREFIX>_<k>_DONE`` marker written AFTER the data, empty rounds
    marker-only. ``scan()`` = number of contiguously finished rounds."""

    def __init__(self, ckpt_dir: str, prefix: str, empty: pa.Table):
        import os

        self.dir = ckpt_dir
        self.prefix = prefix
        self.empty = empty
        os.makedirs(ckpt_dir, exist_ok=True)

    def _marker(self, k: int) -> str:
        import os

        return os.path.join(self.dir, f"_{self.prefix.upper()}_{k}_DONE")

    def _data(self, k: int) -> str:
        import os

        return os.path.join(self.dir, f"{self.prefix}-{k:04d}")

    def scan(self) -> int:
        import os

        k = 0
        while os.path.exists(self._marker(k)):
            k += 1
        return k

    def write(self, k: int, ds) -> None:
        import shutil

        d = self._data(k)
        shutil.rmtree(d, ignore_errors=True)  # unmarked partial write
        if ds.count() > 0:
            ds.write_parquet(d)
        with open(self._marker(k), "w") as f:
            f.write("ok")

    def read(self, k: int):
        import os

        import ray.data as rd

        d = self._data(k)
        if os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d)):
            return rd.read_parquet(d)
        return rd.from_arrow(self.empty)

    def read_required(self, k: int):
        """Like read() but RAISES when the round's data is missing —
        for full-state operators where an empty fallback would be
        silently wrong (a pruned-and-unmarked state is corruption,
        not an empty round)."""
        import os

        d = self._data(k)
        if not (os.path.isdir(d) and any(
                f.endswith(".parquet") for f in os.listdir(d))):
            raise ValueError(
                f"checkpoint corrupt: round {k} is marked done but its "
                f"data is missing under {d!r}")
        return self.read(k)

    def prune_data(self, k: int) -> None:
        """Drop a superseded round's DATA, keeping its marker (the
        scan relies on contiguous markers) — for full-state operators
        (pagerank) where only the latest round is ever read."""
        import shutil

        shutil.rmtree(self._data(k), ignore_errors=True)


def pagerank(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    nb: int = 16,
    checkpoint_dir: str | None = None,
    weight_col: str | None = None,
    init_ranks: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Distributed PageRank over an edge-list Dataset → (node, rank).

    Iterative Ray-Data shape — per iteration exactly ONE shuffle join
    (edges ⋈ ranks on src, same bucket hash every round → effectively
    co-partitioned) plus one pre-combined groupby(dst) sum; the
    invariant sets (out-degrees, nodes with no in-edges) are computed
    once before the loop. Dangling mass is recovered as
    ``1 − emitted`` (no extra per-iteration pass). Multi-edges carry
    multiplicity (dedupe upstream if unwanted); node set = src ∪ dst.

    Semantics: r ← (1−d)/N + d·(Σ_in r/outdeg + dangling/N), ranks sum
    to 1 every iteration.

    ``weight_col``: when given, rank distributes proportionally to
    edge weight instead of uniformly — contribution per edge is
    r·w/W_src with W_src the source's total outgoing weight. Weights
    must be positive and finite (a zero/negative/null weight would
    silently destroy or invert mass — raises instead). The unweighted
    path is untouched.

    ``init_ranks``: warm start for the nightly-recrawl case — a
    ``(node, rank)`` Dataset (unique per node; negative ranks raise)
    from a previous run. Nodes present keep their old rank, newcomers
    start at 1/N, and the vector is renormalized to sum 1 before the
    first iteration, so a mostly-unchanged graph converges in far
    fewer rounds than a cold uniform start. One extra bucketed left
    join + one scalar pass; iterations are unchanged.
    """
    import ray.data as _rd

    from .canonicalize import distinct_counts, set_op, sum_by_key
    from .join import shuffle_hash_join

    if weight_col is None:
        e = edges.map_batches(
            lambda t: t.select([src, dst]).rename_columns(["src", "dst"]),
            batch_format="pyarrow", batch_size=65536).materialize()
        deg = distinct_counts(e.select_columns(["src"]), "src", nb=nb)  # (src, count)
    else:
        def wmap(t: pa.Table) -> pa.Table:
            w = t.column(weight_col).cast(pa.float64())
            wn = w.to_numpy(zero_copy_only=False)
            # nulls arrive as NaN in wn — count them once, not twice
            valid = pc.is_valid(w).to_numpy(zero_copy_only=False)
            bad = int(np.sum((~np.isfinite(wn) | (wn <= 0)) & valid))
            if bad or w.null_count:
                raise ValueError(
                    f"pagerank weight_col={weight_col!r}: "
                    f"{bad + w.null_count} null/non-positive/non-finite "
                    "weight(s)")
            return pa.table({"src": t.column(src), "dst": t.column(dst),
                             "wgt": w})

        e = edges.map_batches(wmap, batch_format="pyarrow",
                              batch_size=65536).materialize()
        deg = sum_by_key(e, "src", "wgt", nb=nb, out_col="count")
    edges_w = shuffle_hash_join(e, deg, on=["src"], how="inner", nb=nb).materialize()

    srcs = e.map_batches(lambda t: t.select(["src"]).rename_columns(["node"]),
                         batch_format="pyarrow")
    dsts = e.map_batches(lambda t: t.select(["dst"]).rename_columns(["node"]),
                         batch_format="pyarrow")
    nodes = set_op(srcs, dsts, "node", op="union", nb=nb).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return _rd.from_arrow(pa.table({"node": pa.array([], pa.string()),
                                        "rank": pa.array([], pa.float64())}))
    no_in = set_op(nodes, dsts, "node", op="except", nb=nb).materialize()

    init = 1.0 / n_nodes
    if init_ranks is None:
        ranks = nodes.map_batches(
            lambda t: t.append_column("rank", pa.array(np.full(len(t), init))),
            batch_format="pyarrow").materialize()
    else:
        def _ir(t: pa.Table) -> pa.Table:
            r = pc.cast(t.column("rank"), pa.float64())
            bad = pc.any(pc.less(r, 0.0)).as_py()
            if bad:
                raise ValueError("pagerank: negative init_ranks rank")
            return pa.table({"node": t.column("node"), "r0": r})

        warm = shuffle_hash_join(
            nodes, init_ranks.map_batches(_ir, batch_format="pyarrow"),
            on=["node"], how="left", nb=nb)
        warm = warm.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": pc.fill_null(t.column("r0"), init)}),
            batch_format="pyarrow").materialize()
        if warm.count() != n_nodes:
            # a duplicated init node multiplies through the left join
            # and would silently double-count its mass every iteration
            raise ValueError(
                "pagerank: init_ranks must be unique per node "
                f"({warm.count() - n_nodes} duplicate row(s))")
        total = warm.sum("rank") or 0.0
        if not np.isfinite(total) or total <= 0:
            raise ValueError(
                "pagerank: init_ranks must hold positive finite mass")
        ranks = warm.map_batches(
            lambda t, s=total: pa.table({
                "node": t.column("node"),
                "rank": pc.divide(t.column("rank"), s)}),
            batch_format="pyarrow").materialize()

    # per-iteration checkpoint: the rank table IS the whole state, so a
    # restart loads the latest marked iteration and continues — the
    # scale answer to "pagerank materializes ranks each iteration":
    # persist them to partitioned parquet instead of lineage
    start_iter = 0
    ck = None
    if checkpoint_dir:
        ck = _RoundCheckpoint(checkpoint_dir, "ranks",
                              pa.table({"node": pa.array([], pa.string()),
                                        "rank": pa.array([], pa.float64())}))
        start_iter = ck.scan()
        if start_iter > iters:
            # rank values differ per iteration — returning a deeper
            # checkpoint as a shallower request would be silently wrong
            raise ValueError(
                f"pagerank: checkpoint_dir holds {start_iter} finished "
                f"iterations but iters={iters} was requested — use a "
                "fresh checkpoint_dir or raise iters")
        if start_iter > 0:
            ranks = ck.read_required(start_iter - 1).materialize()

    for _it in range(start_iter, iters):
        r_src = ranks.map_batches(lambda t: t.rename_columns(["src", "rank"]),
                                  batch_format="pyarrow")
        joined = shuffle_hash_join(edges_w, r_src, on=["src"], how="inner", nb=nb)

        def contrib(batch: pa.Table) -> pa.Table:
            w = (batch.column("rank").to_numpy(zero_copy_only=False)
                 / batch.column("count").to_numpy(zero_copy_only=False))
            if "wgt" in batch.column_names:
                w = w * batch.column("wgt").to_numpy(zero_copy_only=False)
            t = pa.table({"dst": batch.column("dst"), "w": pa.array(w)})
            df = t.to_pandas().groupby("dst", as_index=False)["w"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        msum = sum_by_key(
            joined.map_batches(contrib, batch_format="pyarrow",
                               batch_size=65536),
            "dst", "w", nb=nb, out_col="msum").materialize()
        emitted = msum.sum("msum") or 0.0
        base = (1.0 - damping) / n_nodes + damping * (1.0 - emitted) / n_nodes

        scored = msum.map_batches(
            lambda t, b=base: pa.table({
                "node": t.column("dst"),
                "rank": pa.array(b + damping * t.column("msum").to_numpy(
                    zero_copy_only=False)),
            }), batch_format="pyarrow")
        floor_rows = no_in.map_batches(
            lambda t, b=base: t.append_column("rank", pa.array(np.full(len(t), b))),
            batch_format="pyarrow")
        ranks = scored.union(floor_rows).materialize()
        if ck is not None:
            ck.write(_it, ranks)
            if _it > 0:  # full-state: only the latest snapshot is ever
                ck.prune_data(_it - 1)  # read — constant disk, not O(iters)

    return ranks


def _doc_distinct_tokens(batch: pa.Table, col: str,
                         max_tokens_per_doc: int):
    """Shared tokenizer for the co-occurrence/PMI family: RE2 ``\\s+``
    split (the SAME kernel the DuckDB oracles use — Python str.split
    additionally breaks on \\v/\\xa0 etc., silently diverging on scraped
    text), reduced to each document's first ``max_tokens_per_doc``
    DISTINCT tokens in appearance order. Returns ``(flat_df[d, t],
    n_truncated_docs)``. Both the pair generator and the token-count
    pass MUST use this one function so PMI numerators and denominators
    see the identical token universe."""
    import pandas as pd

    text = pc.fill_null(batch.column(col), "")
    if text.type != pa.string():
        text = text.cast(pa.string())
    lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    parent = pc.list_parent_indices(lists)
    flat_t = pc.list_flatten(lists)
    keep = pc.not_equal(flat_t, "")
    flat = pd.DataFrame({
        "d": pc.filter(parent, keep).to_numpy(zero_copy_only=False),
        "t": pc.filter(flat_t, keep).to_pandas(),
    }).drop_duplicates()
    n_trunc = 0
    if len(flat):
        rank = flat.groupby("d").cumcount()
        n_trunc = int((rank == max_tokens_per_doc).sum())
        flat = flat[rank < max_tokens_per_doc]
    return flat, n_trunc


def cooccurrence_edges(
    docs: "object",
    id_col: str = "doc_id",
    col: str = "text",
    min_count: int = 1,
    max_tokens_per_doc: int = 2048,
) -> "object":
    """Entity co-occurrence graph construction: one weighted edge
    ``(t1, t2, n_docs)`` per unordered token pair, where ``n_docs``
    counts documents containing BOTH tokens (t1 < t2 lexicographically)
    — the KG-building primitive that turns a linked/tokenized corpus
    into a relatedness graph.

    Scale shape: per batch, each document is reduced to its DISTINCT
    token set (drop_duplicates), pairs are generated with ONE
    vectorized self-merge on the doc index (no per-row Python), and
    counts are pre-combined per batch — only (t1, t2, partial count)
    rows enter the single groupby-sum shuffle, never the token stream.
    The quadratic is bounded by ``max_tokens_per_doc`` (documents are
    truncated to their first N distinct tokens, and a truncation count
    is carried in the partials as the ``__truncated__ → __docs__``
    edge so recall loss is visible, never silent). At web scale the
    vocabulary must be pre-filtered (min-df cut or an entity linker) so
    per-doc distinct sets stay small — pair volume is Σ d_i², not V².
    """
    from ray.data.aggregate import Sum

    schema = pa.schema([
        pa.field("t1", pa.string()), pa.field("t2", pa.string()),
        pa.field("n_part", pa.int64())])

    def pairs(batch: pa.Table) -> pa.Table:
        flat, n_trunc = _doc_distinct_tokens(batch, col, max_tokens_per_doc)
        ft = pa.table({"d": pa.array(flat["d"].to_numpy(), pa.int64()),
                       "t": pa.array(flat["t"], pa.string())})
        s, l, r = _expand_sorted_pairs(ft, "d", "t")
        if len(l):
            tok = s.column("t").combine_chunks()
            pt = pa.table({"t1": tok.take(pa.array(l)),
                           "t2": tok.take(pa.array(r))})
            out = pt.group_by(["t1", "t2"]).aggregate([("t1", "count")])
            part = pa.table({"t1": out.column("t1"), "t2": out.column("t2"),
                             "n_part": out.column("t1_count").cast(pa.int64())})
        else:
            part = schema.empty_table()
        if n_trunc:
            part = pa.concat_tables([part.cast(schema), pa.table(
                {"t1": ["__truncated__"], "t2": ["__docs__"],
                 "n_part": pa.array([n_trunc], pa.int64())})])
        return part.cast(schema)

    agg = (docs.map_batches(pairs, batch_format="pyarrow", batch_size=8192)
           .groupby(["t1", "t2"])
           .aggregate(Sum("n_part", alias_name="n_docs")))
    if min_count > 1:
        agg = agg.map_batches(
            lambda t, mc=int(min_count): t.filter(
                pc.greater_equal(t.column("n_docs"), mc)),
            batch_format="pyarrow")
    return agg


def pmi_pairs(
    docs: "object",
    id_col: str = "doc_id",
    col: str = "text",
    min_count: int = 5,
    max_tokens_per_doc: int = 2048,
) -> "object":
    """PMI-scored term relatedness: for every co-occurring unordered
    token pair, pmi = ln(n_ab·N / (n_a·n_b)) over document-level
    co-occurrence — the classic KG relatedness-edge weighting on top of
    ``cooccurrence_edges``.

    Scale shape: pair counts ride the existing pre-combined
    cooccurrence shuffle; per-token document counts are one
    distinct-key reduce; the token-count table is the SMALL side (the
    vocabulary, pre-filtered by the same assumptions cooccurrence
    documents) and is broadcast once via ray.put — scoring is then a
    pure per-batch map, no third shuffle.

    Sibling, NOT a duplicate: ``textstats.cooccurrence_pmi`` is the
    tfidf-tokenizer-aligned variant (lowercased \\s+ tokens, top-K-df
    broadcast vocabulary with a map-side pair explosion bounded by
    V²/2). This one keeps case (entity-ish tokens) and bounds by
    ``min_count``/``max_tokens_per_doc`` with the pair counts riding
    the shuffle. Pick by vocabulary regime; keep semantics divergent
    on purpose."""
    import ray as _ray
    from .canonicalize import distinct_counts

    pairs = cooccurrence_edges(docs, id_col=id_col, col=col,
                               min_count=min_count,
                               max_tokens_per_doc=max_tokens_per_doc)
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("t1"), "__truncated__")),
        batch_format="pyarrow")

    def tok(batch: pa.Table) -> pa.Table:
        # SAME truncated token universe as the pair generator, so n_a /
        # n_b denominators and n_ab numerators are mutually consistent
        # even when a document exceeds max_tokens_per_doc
        flat, _ = _doc_distinct_tokens(batch, col, max_tokens_per_doc)
        return pa.table({"t": pa.Array.from_pandas(flat["t"], type=pa.string())})

    n_docs = docs.count()
    tc = distinct_counts(
        docs.map_batches(tok, batch_format="pyarrow", batch_size=8192), "t")
    tcp = tc.to_pandas()
    ref = _ray.put(dict(zip(tcp["t"], tcp["count"])))

    def score(batch: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        n_ab = batch.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = batch.column("t1").to_pandas().map(m).to_numpy(dtype=np.float64)
        n_b = batch.column("t2").to_pandas().map(m).to_numpy(dtype=np.float64)
        if np.isnan(n_a).any() or np.isnan(n_b).any():
            raise RuntimeError("pmi_pairs: pair token absent from the "
                               "token-count map (tokenizer divergence)")
        pmi = np.round(np.log(n_ab * float(n_docs) / (n_a * n_b)), 6)
        return batch.append_column("pmi", pa.array(pmi, pa.float64()))

    return pairs.map_batches(score, batch_format="pyarrow")


def _min_per_node(ds, nb: int, node_col: str = "node", val_col: str = "dist"):
    """Map-side-combined distributed min(val) per node: per-batch local
    min, ONE bucket shuffle, per-bucket final min — only per-batch
    distinct (node, min) partials cross the wire."""
    import pandas as pd

    from .canonicalize import _B, _add_bucket

    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(node_col, as_index=False)[val_col].min()
        return _add_bucket(pa.Table.from_pandas(df, preserve_index=False),
                           [node_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        out = df.groupby(node_col, as_index=False)[val_col].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)
           .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    from .util import cheap_arrow_schema, with_schema
    sch = cheap_arrow_schema(ds)
    if sch is not None and all(
            n in sch.names for n in (node_col, val_col)):
        nt, vt = sch.field(node_col).type, sch.field(val_col).type
        # the pandas min roundtrip is type-stable for these families
        # only (graph ids / distances are never null here)
        stable = (pa.types.is_integer, pa.types.is_floating,
                  pa.types.is_string)
        if any(p(nt) for p in stable) and any(p(vt) for p in stable):
            with_schema(out, pa.schema([pa.field(node_col, nt),
                                        pa.field(val_col, vt)]))
    return out


def _subtract_new(new_ds, old_ds, keys: list[str], nb: int,
                  min_col: str | None = None,
                  key_type: "pa.DataType | None" = None):
    """Fused (dedup/min + anti-join) frontier update in ONE bucket
    shuffle: ``new`` rows tag side 0, ``old`` rows side 1, both bucket
    on ``keys``; each group keeps the distinct side-0 keys (reduced by
    min over ``min_col`` when given) that have NO side-1 row. Replaces
    the dedup-shuffle + anti-join-shuffle pair in the iterative graph
    loops (one all-to-all per round instead of two). Map side
    pre-combines (local dedup/min), so hot keys collapse before the
    exchange."""
    import pandas as pd

    from .canonicalize import _B, _add_bucket

    cols = keys + ([min_col] if min_col else [])

    def prep(side: int, ds):
        def f(batch: pa.Table) -> pa.Table:
            df = batch.select(cols if side == 0 else keys).to_pandas()
            if side == 0:
                df = (df.groupby(keys, as_index=False)[min_col].min()
                      if min_col else df.drop_duplicates(keys))
            else:
                df = df.drop_duplicates(keys)
                if min_col:  # align schemas across the union — a group
                    df = df.assign(**{min_col: np.nan})  # of only old
                    # rows must still carry the column
            t = pa.Table.from_pandas(df, preserve_index=False)
            t = t.append_column("_side", pa.array(
                np.full(len(t), side, np.int8)))
            return _add_bucket(t, keys, nb)

        return f

    tagged = new_ds.map_batches(prep(0, new_ds), batch_format="pyarrow",
                                batch_size=65536).union(
        old_ds.map_batches(prep(1, old_ds), batch_format="pyarrow",
                           batch_size=65536))

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        s0 = df[df["_side"] == 0]
        s0 = (s0.groupby(keys, as_index=False)[min_col].min()
              if min_col else s0.drop_duplicates(keys)[cols])
        s1 = df.loc[df["_side"] == 1, keys].drop_duplicates()
        out = s0.merge(s1.assign(_hit=1), on=keys, how="left")
        out = out[out["_hit"].isna()][cols]
        t = pa.Table.from_pandas(out, preserve_index=False)
        kt = key_type if key_type is not None else pa.int64()
        # min_col (when present) is always int64; key cols take the
        # caller's node type (int64 ids or raw string KG terms)
        return t.cast(pa.schema(
            [pa.field(k, kt) for k in keys]
            + ([pa.field(min_col, pa.int64())] if min_col else [])))

    from .util import with_schema
    kt = key_type if key_type is not None else pa.int64()
    return with_schema(
        tagged.groupby(_B).map_groups(finish, batch_format="pyarrow"),
        pa.schema([pa.field(k, kt) for k in keys]
                  + ([pa.field(min_col, pa.int64())]
                     if min_col else [])))


def _closure_cycle_check(t: pa.Table, node_col: str, anc_col: str,
                         where: str) -> pa.Table:
    """Shared cycle guard of the closure family: a derived (n, n)
    pair can only mean a cycle → typed ValueError. Riding inside the
    projection map costs no extra frontier pass; the message prefix
    names the calling operator."""
    node = t.column(node_col)
    anc = t.column(anc_col)
    if int(pc.sum(pc.equal(node, anc)).as_py() or 0):
        raise ValueError(
            f"{where}: cycle detected (derived a node as its own "
            "ancestor)")
    return pa.table({"node": node, "anc": anc})


def _closure_mat(ds, where: str):
    """materialize() that restores the closure family's documented
    ValueError: Ray wraps in-task errors (UserCodeException), so the
    cycle raise from :func:`_closure_cycle_check` is rewrapped with
    its original type and operator prefix."""
    try:
        return ds.materialize()
    except Exception as ex:  # noqa: BLE001
        if "cycle detected" in str(ex):
            raise ValueError(
                f"{where}: cycle detected (derived a node as its "
                "own ancestor)") from ex
        raise


def transitive_closure(
    edges,
    child_col: str = "child",
    parent_col: str = "parent",
    nb: int = 32,
    max_iters: int = 40,
    checkpoint_dir: str | None = None,
):
    """All (node, anc) ancestor pairs over a DAG edge list — the
    ontology-subsumption / is-a closure primitive of KG construction
    (expand every linked term to its ancestor terms).

    Semi-naive datalog evaluation, Ray-Data-first: ``delta`` holds only
    the pairs discovered last round; each round extends it one hop
    (``delta.anc ⋈ edges.child`` — one bucket-shuffle hash join),
    dedups within the round, and anti-joins against the accumulated
    closure so re-derived pairs (multiple DAG paths) never re-enter the
    frontier. Terminates when delta is empty — ≤ DAG depth rounds, each
    touching only frontier-sized data, never the full closure.

    CYCLES are detected, not looped on: a cycle would derive
    ``(n, n)``; any self-pair in delta raises. At 10^12 scale the
    closure itself is the output volume — partition it on ``node`` (the
    same hash key every join here already uses) when materializing.

    ``checkpoint_dir``: per-ROUND lineage — each round's delta is
    written to ``delta-<k>/`` parquet with a ``_DELTA_k_DONE`` marker
    AFTER the write (closure = append-only union of all deltas, so a
    round is the natural checkpoint unit). A restarted run replays
    completed rounds from disk (no recompute — deltas just load) and
    resumes the iteration at the first unfinished round; a crash
    mid-round leaves no marker, so that round recomputes from its
    parents. Deterministic rounds ⇒ byte-stable resume (tested).
    """
    import ray.data as rd

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    # node type: int64 for numeric ids, passthrough for string nodes
    # (predicate-path closures over raw KG terms) — every downstream
    # step (hash join, dedup, equality cycle check) is type-agnostic
    sch = edges_ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        ft = base.field(child_col).type
        is_str = (pa.types.is_string(ft) or pa.types.is_large_string(ft))
    else:  # PandasBlockSchema: numpy dtypes; strings are object/string
        ft = base.types[list(base.names).index(child_col)]
        is_str = str(ft) in ("object", "string", "string[python]")
    node_t = pa.string() if is_str else pa.int64()
    e = edges_ds.map_batches(
        lambda t: pa.table({"child": t.column(child_col).cast(node_t),
                            "parent": t.column(parent_col).cast(node_t)}),
        batch_format="pyarrow").materialize()
    empty = pa.table({"node": pa.array([], node_t),
                      "anc": pa.array([], node_t)})
    if e.count() == 0:
        return rd.from_arrow(empty)

    def _project(node_col: str, anc_col: str):
        def f(t: pa.Table) -> pa.Table:
            return _closure_cycle_check(t, node_col, anc_col,
                                        "transitive_closure")
        return f

    def _mat(ds):
        return _closure_mat(ds, "transitive_closure")

    ck = (_RoundCheckpoint(checkpoint_dir, "delta", empty)
          if checkpoint_dir else None)
    start_round = ck.scan() if ck else 0

    if ck is not None and start_round > 0:
        # replay: load finished rounds from disk instead of recomputing
        deltas = [ck.read(k) for k in range(start_round)]
        delta = deltas[-1].materialize()
        closure = deltas[0]
        for d in deltas[1:]:
            closure = closure.union(d)
        closure = closure.materialize()
        if delta.count() == 0:  # checkpoint already reached the fixpoint
            return closure
    else:
        delta = _mat(dedup_exact(
            e.map_batches(_project("child", "parent"),
                          batch_format="pyarrow"),
            ["node", "anc"], nb=nb))
        closure = delta
        if ck is not None:
            ck.write(0, delta)
        start_round = 1

    # the closure is only ever CONSUMED (anti-join old side / return
    # value) — keep it as a LAZY flat union of the materialized
    # per-round deltas instead of re-materializing the whole closure
    # every round (one fewer Ray execution per round; the union of
    # already-materialized parts just concatenates block lists)
    parts = [closure]

    def _union_parts():
        return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    for k in range(start_round, max_iters + 1):
        if delta.count() == 0:
            return _union_parts()
        # one hop: (node, anc) ⋈ (child=anc, parent) → (node, parent)
        hop = shuffle_hash_join(
            delta, e.map_batches(
                lambda t: t.rename_columns(["anc", "new_anc"]),
                batch_format="pyarrow"),
            on=["anc"], how="inner", nb=nb)
        hop = hop.map_batches(_project("node", "new_anc"),
                              batch_format="pyarrow")
        # fused dedup + closure-anti-join: ONE shuffle per round
        delta = _mat(_subtract_new(hop, _union_parts(), ["node", "anc"],
                                   nb, key_type=node_t))
        if ck is not None:
            ck.write(k, delta)
        parts.append(delta)
    raise RuntimeError(
        f"transitive_closure did not converge in max_iters={max_iters} "
        "(DAG deeper than that) — raise max_iters")


def transitive_closure_doubling(
    edges,
    child_col: str = "child",
    parent_col: str = "parent",
    nb: int = 32,
    max_iters: int = 20,
):
    """Transitive closure by PATH DOUBLING — the ⌈log₂ depth⌉-round
    sibling of the semi-naive :func:`transitive_closure`: each round
    composes the closure-so-far with itself (R ← R ∪ R∘R), so
    reachable distance doubles per round. The right strategy when the
    graph is DEEP and the closure small relative to round count
    (redirect-style chains, long property paths); semi-naive stays
    the 100-TB default because its per-round frontier is delta-sized
    while composition re-joins the whole closure every round. Same
    output contract and cycle RAISE as transitive_closure."""
    import ray.data as rd

    from .join import shuffle_hash_join
    from .util import map_known

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    sch = edges_ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        ft = base.field(child_col).type
        is_str = (pa.types.is_string(ft) or pa.types.is_large_string(ft))
    else:
        ft = base.types[list(base.names).index(child_col)]
        is_str = str(ft) in ("object", "string", "string[python]")
    node_t = pa.string() if is_str else pa.int64()
    e = edges_ds.map_batches(
        lambda t: pa.table({"node": t.column(child_col).cast(node_t),
                            "anc": t.column(parent_col).cast(node_t)}),
        batch_format="pyarrow")

    def _cycle_check(t: pa.Table) -> pa.Table:
        return _closure_cycle_check(t, "node", "anc",
                                    "transitive_closure")

    def _mat(ds):
        return _closure_mat(ds, "transitive_closure")

    from .canonicalize import dedup_exact
    cur = _mat(dedup_exact(
        e.map_batches(_cycle_check, batch_format="pyarrow"),
        ["node", "anc"], nb=nb))
    parts = [cur]

    def _union():
        return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    for _ in range(max_iters):
        u = _union()
        comp = map_known(shuffle_hash_join(
            map_known(u, lambda t: pa.table({"node": t.column("node"),
                                             "mid": t.column("anc")})),
            map_known(u, lambda t: pa.table({"mid": t.column("node"),
                                             "anc": t.column("anc")})),
            on=["mid"], how="inner", nb=nb),
            lambda t: _cycle_check(pa.table({"node": t.column("node"),
                                             "anc": t.column("anc")})))
        delta = _mat(_subtract_new(comp, u, ["node", "anc"], nb,
                                   key_type=node_t))
        if delta.count() == 0:
            return _union()
        parts.append(delta)
    raise RuntimeError(
        f"transitive_closure_doubling did not converge in "
        f"max_iters={max_iters} — depth exceeds 2^max_iters")


def bfs_min_depth(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 32,
    max_iters: int = 60,
    checkpoint_dir: str | None = None,
):
    """Minimum-hop distance from a seed set over a directed edge list:
    (node, dist) for every node reachable from ``seeds`` (seeds at 0).

    Textbook frontier BFS, distributed: each round ships the frontier's
    labels across its out-edges (one bucket-shuffle hash join), takes
    the min per target (map-side-combined), and anti-joins against the
    settled set — with unit weights the first round that reaches a node
    IS its min distance, so settled nodes never re-enter. Terminates
    when the frontier empties (≤ graph-diameter rounds, frontier-sized
    work per round); cycles are harmless (already-settled targets are
    dropped by the anti-join).
    """
    import ray.data as rd

    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column(src_col).cast(pa.int64()),
                            "dst": t.column(dst_col).cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    if isinstance(seeds, (list, tuple, np.ndarray)):
        seeds = pa.table({"node": pa.array(
            sorted(set(int(x) for x in seeds)), pa.int64())})
    seeds_ds = rd.from_arrow(seeds) if isinstance(seeds, pa.Table) else seeds

    frontier = seeds_ds.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "dist": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow").materialize()
    settled = frontier

    # per-round lineage, same contract as transitive_closure: settled =
    # append-only union of frontiers, so each round's frontier is the
    # checkpoint unit. Round 0 = the seed frontier on BOTH paths, so
    # the loop bound is identical with and without checkpointing
    # (max_iters expansion rounds — no checkpoint off-by-one).
    ck = (_RoundCheckpoint(
        checkpoint_dir, "frontier",
        pa.table({"node": pa.array([], pa.int64()),
                  "dist": pa.array([], pa.int64())}))
        if checkpoint_dir else None)
    start = ck.scan() if ck else 0
    if ck is not None and start > 0:
        fr = [ck.read(k) for k in range(start)]
        frontier = fr[-1].materialize()
        settled = fr[0]
        for d in fr[1:]:
            settled = settled.union(d)
        settled = settled.materialize()
        if frontier.count() == 0:  # checkpoint already converged
            return settled
    else:
        if ck is not None:
            ck.write(0, frontier)
        start = 1
    for _k in range(start, max_iters + 1):
        if frontier.count() == 0:
            return settled
        msgs = shuffle_hash_join(
            frontier.map_batches(
                lambda t: t.rename_columns(["src", "dist"]),
                batch_format="pyarrow"),
            e, on=["src"], how="inner", nb=nb)
        msgs = msgs.map_batches(
            lambda t: pa.table({
                "node": t.column("dst").cast(pa.int64()),
                "dist": pa.compute.add(t.column("dist").cast(pa.int64()), 1)}),
            batch_format="pyarrow")
        # fused per-node min + settled-anti-join: ONE shuffle per round
        frontier = _subtract_new(msgs, settled, ["node"], nb,
                                 min_col="dist").materialize()
        if ck is not None:
            ck.write(_k, frontier)
        # lazy flat union of materialized frontiers — consumers just
        # concatenate block lists, no per-round re-materialize
        settled = settled.union(frontier)
    raise RuntimeError(
        f"bfs_min_depth did not converge in max_iters={max_iters} "
        "(graph diameter exceeds it) — raise max_iters")


def triangle_count(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    nb: int = 64,
    orient: str = "degree",
) -> int:
    """Count triangles in an undirected simple graph given as DISTINCT
    edges with ``a < b`` (no self-loops). Join-based node-iterator:
    orient every edge along a total order, build wedges with one
    edge⋈edge shuffle join, then close them with a semi join back
    against the edge set — each triangle is counted exactly once.

    ``orient="degree"`` re-orients edges low→high by (degree, node)
    before the wedge join — the standard skew mitigation: a hub of
    degree d contributes wedges only among its HIGHER-ordered
    neighbors, so total wedge volume is O(m^1.5) instead of Σ d².
    Costs one extra groupby + join; ``orient="value"`` skips it (uses
    the given a<b order). The triangle COUNT is identical for any
    total order — parity between the two modes is the self-test.
    """
    import ray.data as rd

    from .canonicalize import dedup_exact, sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(a_col).cast(pa.int64()),
                            "b": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow")

    if orient == "degree":
        def ends(t: pa.Table) -> pa.Table:
            import pandas as pd
            both = pd.DataFrame({"node": np.concatenate([
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False)])})
            part = both.groupby("node", as_index=False).size()
            return pa.table({"node": pa.array(part["node"], pa.int64()),
                             "deg_part": pa.array(part["size"], pa.int64())})

        deg = sum_by_key(e.map_batches(ends, batch_format="pyarrow"),
                         "node", "deg_part", nb=nb, out_col="deg")
        # re-orient: src = lower (deg, node), dst = higher
        w = shuffle_hash_join(
            e, deg.map_batches(lambda t: t.rename_columns(["a", "deg_a"]),
                               batch_format="pyarrow"),
            on=["a"], how="inner", nb=nb)
        w = shuffle_hash_join(
            w, deg.map_batches(lambda t: t.rename_columns(["b", "deg_b"]),
                               batch_format="pyarrow"),
            on=["b"], how="inner", nb=nb)

        def reorient(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da = t.column("deg_a").to_numpy(zero_copy_only=False)
            db = t.column("deg_b").to_numpy(zero_copy_only=False)
            fwd = (da < db) | ((da == db) & (a < b))
            return pa.table({"a": pa.array(np.where(fwd, a, b), pa.int64()),
                             "b": pa.array(np.where(fwd, b, a), pa.int64())})

        e = w.map_batches(reorient, batch_format="pyarrow")
    elif orient != "value":
        raise ValueError(f"unknown orient={orient!r}")
    e = e.materialize()

    # wedges: (a, b) ⋈ (a'=b, b') → (a, b, c=b'); close with a semi
    # join of (a, c) back against the oriented edge set
    wedges = shuffle_hash_join(
        e, e.map_batches(lambda t: t.rename_columns(["b", "c"]),
                         batch_format="pyarrow"),
        on=["b"], how="inner", nb=nb)
    closed = shuffle_hash_join(
        wedges.map_batches(lambda t: t.select(["a", "c"]).rename_columns(["a", "b"]),
                           batch_format="pyarrow"),
        e, on=["a", "b"], how="semi", nb=nb)
    return int(closed.count())


def entity_cooccurrence(
    triples,
    min_count: int = 1,
    nb: int = 32,
):
    """Entity co-occurrence edges from the KG triple stream: one
    weighted edge ``(uri_a, uri_b, n_subjects)`` per unordered pair of
    ontology URIs annotated on the SAME subject (page) — the
    relation-discovery primitive that turns entity links into a
    relatedness graph (the entity-level sibling of the token-level
    ``cooccurrence_edges``).

    Shape: one bucket shuffle on ``subj`` co-locates each subject's
    links; within a bucket every subject's DISTINCT uri set expands to
    pairs with ONE vectorized self-merge on the subject index, and
    counts pre-combine per bucket before the tiny (uri_a, uri_b)
    Sum groupby. Pair volume is Σ d_subj² — bounded by links per page,
    never by vocabulary size.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .canonicalize import _B, _add_bucket

    ds = rd.from_arrow(triples) if isinstance(triples, pa.Table) else triples

    def local(batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch.column("obj_kind"), "uri")
        t = batch.filter(keep).select(["subj", "obj"])
        return _add_bucket(t, ["subj"], nb)

    def pairs(g: pa.Table) -> pa.Table:
        schema = pa.schema([pa.field("uri_a", pa.string()),
                            pa.field("uri_b", pa.string()),
                            pa.field("n_part", pa.int64())])
        dedup = (g.drop_columns([_B])
                 .group_by(["subj", "obj"]).aggregate([]))
        s, l, r = _expand_sorted_pairs(dedup, "subj", "obj")
        if len(l) == 0:
            return schema.empty_table()
        obj = s.column("obj").combine_chunks()
        pt = pa.table({"uri_a": obj.take(pa.array(l)),
                       "uri_b": obj.take(pa.array(r))})
        out = pt.group_by(["uri_a", "uri_b"]).aggregate([("uri_a", "count")])
        return pa.table({"uri_a": out.column("uri_a"),
                         "uri_b": out.column("uri_b"),
                         "n_part": out.column("uri_a_count").cast(pa.int64())}
                        ).cast(schema)

    agg = (ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
           .groupby(_B).map_groups(pairs, batch_format="pyarrow")
           .groupby(["uri_a", "uri_b"])
           .aggregate(Sum("n_part", alias_name="n_subjects")))
    if min_count > 1:
        agg = agg.map_batches(
            lambda t: t.filter(pa.compute.greater_equal(
                t.column("n_subjects"), min_count)),
            batch_format="pyarrow")
    return agg


def match_bgp(triples: "ray.data.Dataset",
              pattern: "list[tuple[str, str, str]]",
              s_col: str = "subj", p_col: str = "pred",
              o_col: str = "obj", nb: int = 32,
              optional: "list | None" = None,
              filters: "list[tuple[str, str, object]] | None" = None,
              not_exists: "list | None" = None,
              ) -> "ray.data.Dataset":
    """SPARQL-style basic-graph-pattern match over a triple Dataset
    (graft-added, r04). ``pattern`` is a list of (s, p, o) terms; a
    term starting with ``?`` is a variable, anything else a constant.
    Returns a Dataset of variable BINDINGS — one column per variable,
    one row per distinct proof path (bag semantics, exactly the SQL
    self-join result).

    Execution is Ray-Data-first: each triple pattern compiles to a
    constant-filtered vectorized scan projected onto its variables;
    patterns combine left-to-right with bucketed shuffle hash joins
    on the shared variables. Every pattern after the first must share
    ≥1 variable with the accumulated bindings — cross products are
    rejected (at web scale an accidental cross product is a job
    killer, not a feature). A variable repeated WITHIN one pattern
    (e.g. ``(?x, knows, ?x)``) becomes a vectorized equality filter.

    ``optional``: SPARQL OPTIONAL groups — each entry is one triple
    pattern or a list forming a sub-BGP; the group compiles like the
    required block (inner joins within itself), then LEFT-joins onto
    the accumulated bindings on its shared variables, so unmatched
    rows keep their bindings with the group's new variables null.

    ``not_exists``: SPARQL ``FILTER NOT EXISTS`` groups — each entry
    a triple pattern or sub-BGP list; the group compiles like the
    required block, then ANTI-joins the accumulated bindings on its
    shared variables (one bucket shuffle per group), dropping every
    binding the group can prove. Unshared group variables are
    existential; a null shared binding matches nothing and is KEPT
    (anti-join null semantics).

    ``filters``: SPARQL FILTER conjuncts ``(?var, op, operand)`` with
    op ∈ {==, !=, <, <=, >, >=, contains, regex, isnull, notnull};
    operand is a literal or another ``?var``. String comparisons
    (triples are strings). SPARQL error-semantics: a comparison on an
    unbound (null) binding is FALSE — only isnull keeps such rows.
    Filters run vectorized after all joins (one map_batches).
    """
    from .join import shuffle_hash_join

    def is_var(t: str) -> bool:
        return isinstance(t, str) and t.startswith("?")

    def scan(tp: "tuple[str, str, str]") -> "ray.data.Dataset":
        s, p, o = tp
        cols = {s_col: s, p_col: p, o_col: o}
        consts = {c: t for c, t in cols.items() if not is_var(t)}
        out_vars: dict = {}
        for c, t in cols.items():
            if is_var(t):
                out_vars.setdefault(t[1:], []).append(c)
        if not out_vars:
            raise ValueError(
                f"all-constant pattern {tp!r} has no variables to bind"
                " — existence checks are a filter, not a BGP")

        def fn(batch: pa.Table) -> pa.Table:
            mask = None
            for c, v in consts.items():
                m = pc.equal(batch.column(c), v)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                batch = batch.filter(pc.fill_null(mask, False))
            for cs in out_vars.values():
                # same var in 2 OR 3 positions: pairwise equality
                for k in range(1, len(cs)):
                    m = pc.equal(batch.column(cs[0]), batch.column(cs[k]))
                    batch = batch.filter(pc.fill_null(m, False))
            return pa.table({v: batch.column(cs[0])
                             for v, cs in out_vars.items()})

        return triples.map_batches(fn, batch_format="pyarrow",
                                   batch_size=65536)

    if not pattern:
        raise ValueError("empty pattern")

    # all-constant patterns raise inside scan() at graph construction
    def compile_group(pats: list):
        sub = scan(pats[0])
        sub_bound = {t[1:] for t in pats[0] if is_var(t)}
        for tp in pats[1:]:
            tp_vars = {t[1:] for t in tp if is_var(t)}
            if not tp_vars:
                raise ValueError(
                    f"all-constant pattern {tp!r} has no variables"
                    " to bind — existence checks are a filter, not"
                    " a BGP")
            shared = sorted(sub_bound & tp_vars)
            if not shared:
                raise ValueError(
                    f"pattern {tp!r} shares no variable with"
                    f" {sorted(sub_bound)} — cross products are not"
                    " supported")
            sub = shuffle_hash_join(sub, scan(tp), on=shared,
                                    how="inner", nb=nb)
            sub_bound |= tp_vars
        return sub, sub_bound

    acc, bound = compile_group(list(pattern))

    for opt in (optional or []):
        group = opt if isinstance(opt, list) else [opt]
        sub, sub_bound = compile_group(group)
        shared = sorted(bound & sub_bound)
        if not shared:
            raise ValueError(
                f"optional group {group!r} shares no variable with"
                f" {sorted(bound)} — cross products are not supported")
        acc = shuffle_hash_join(acc, sub, on=shared, how="left", nb=nb)
        bound |= sub_bound

    for neg in (not_exists or []):
        group = neg if isinstance(neg, list) else [neg]
        sub, sub_bound = compile_group(group)
        shared = sorted(bound & sub_bound)
        if not shared:
            raise ValueError(
                f"NOT EXISTS group {group!r} shares no variable with"
                f" {sorted(bound)} — an unanchored NOT EXISTS is a"
                " whole-result existence test, not a per-binding one")
        # existential on unshared vars: project the witness set to
        # the shared columns before the anti join
        sub = sub.map_batches(
            lambda t, cols=tuple(shared): t.select(list(cols)),
            batch_format="pyarrow")
        acc = shuffle_hash_join(acc, sub, on=shared, how="anti",
                                nb=nb)

    if filters:
        _OPS = {"==", "!=", "<", "<=", ">", ">=", "contains", "regex",
                "isnull", "notnull"}
        for f in filters:
            if not is_var(f[0]) or f[0][1:] not in bound:
                raise ValueError(f"filter on unknown variable {f[0]!r}")
            if f[1] not in _OPS:
                raise ValueError(f"unknown filter op {f[1]!r}")
        specs = [(f[0][1:], f[1],
                  (f[2] if len(f) > 2 else None)) for f in filters]

        def apply_filters(batch: pa.Table) -> pa.Table:
            mask = None
            for v, op, operand in specs:
                col = batch.column(v)
                if op == "isnull":
                    m = pc.is_null(col)
                elif op == "notnull":
                    m = pc.is_valid(col)
                else:
                    rhs = operand
                    if isinstance(operand, str) and \
                            operand.startswith("?"):
                        rhs = batch.column(operand[1:])
                    if op == "==":
                        m = pc.equal(col, rhs)
                    elif op == "!=":
                        m = pc.not_equal(col, rhs)
                    elif op == "<":
                        m = pc.less(col, rhs)
                    elif op == "<=":
                        m = pc.less_equal(col, rhs)
                    elif op == ">":
                        m = pc.greater(col, rhs)
                    elif op == ">=":
                        m = pc.greater_equal(col, rhs)
                    elif op == "contains":
                        m = pc.match_substring(col, rhs)
                    else:  # regex
                        m = pc.match_substring_regex(col, rhs)
                    m = pc.fill_null(m, False)  # unbound -> FALSE
                mask = m if mask is None else pc.and_(mask, m)
            return batch.filter(mask) if mask is not None else batch

        acc = acc.map_batches(apply_filters, batch_format="pyarrow")
    return acc


def hits(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    nb: int = 16,
) -> "ray.data.Dataset":
    """HITS hubs-and-authorities over an edge-list Dataset →
    (node, hub, authority), L1-normalized each half-step (graft-added,
    r04; complements :func:`pagerank` — HITS separates "points at good
    pages" from "is a good page", the classic link-graph signal pair).

    Semantics per iteration: a(v) ← Σ_{(u,v)∈E} h(u), normalized to
    Σa = 1; then h(u) ← Σ_{(u,v)∈E} a(v), normalized to Σh = 1.
    h₀ = 1/N over node set = src ∪ dst; multi-edges carry
    multiplicity; nodes without in-edges (resp. out-edges) hold
    authority 0 (resp. hub 0).

    Scale shape mirrors pagerank: per half-step ONE bucket-shuffle
    join (edges ⋈ scores, same bucket hash every round) plus one
    pre-combined groupby sum; the normalizer is a scalar aggregate.
    The SQL twin unrolls the same recurrence as CTEs.
    """
    import ray.data as _rd

    from .canonicalize import set_op, sum_by_key
    from .join import shuffle_hash_join

    # Block count drives every downstream sort/groupby's parallelism:
    # a single-file read arrives as ONE block, which would serialize
    # each half-step's shuffle (measured 7× slower at sf0.1) — spread
    # the edge set across nb blocks once, up front.
    e = edges.map_batches(
        lambda t: t.select([src, dst]).rename_columns(["src", "dst"]),
        batch_format="pyarrow", batch_size=65536) \
        .repartition(nb).materialize()
    srcs = e.map_batches(lambda t: t.select(["src"]).rename_columns(["node"]),
                         batch_format="pyarrow")
    dsts = e.map_batches(lambda t: t.select(["dst"]).rename_columns(["node"]),
                         batch_format="pyarrow")
    nodes = set_op(srcs, dsts, "node", op="union", nb=nb).materialize()
    n_nodes = nodes.count()
    empty = pa.table({"node": pa.array([], pa.string()),
                      "hub": pa.array([], pa.float64()),
                      "authority": pa.array([], pa.float64())})
    if n_nodes == 0:
        return _rd.from_arrow(empty)

    init = 1.0 / n_nodes
    hubs = nodes.map_batches(
        lambda t: t.append_column("h", pa.array(np.full(len(t), init))),
        batch_format="pyarrow").materialize()
    auths = None

    def _propagate(scores, key_in, key_out, col_in, col_out, scale):
        """scores(key_in, col_in) scaled by the DEFERRED normalizer
        ``scale`` → (key_out, col_out) summed over edges. Returns the
        materialized UNNORMALIZED sums plus the L1 total: the division
        is folded into the next half-step's map (or the final
        projection) instead of rewriting the dataset — one fewer Ray
        execution per half-step, identical math up to 1 ulp (both
        sides round to 8 dp at the end)."""
        j = shuffle_hash_join(
            e, scores.map_batches(
                lambda t, s=scale: pa.table({
                    key_in: t.column(0),
                    col_in: pc.multiply(t.column(1), pa.scalar(s))}),
                batch_format="pyarrow"),
            on=[key_in], how="inner", nb=nb)
        # bucket-plan sum (canonicalize.sum_by_key): Ray's sort-based
        # groupby().aggregate(Sum) costs ~4 s of fixed overhead per
        # call — ×4 half-steps it dominated the whole operator
        agg = sum_by_key(
            j.map_batches(
                lambda t: pa.table({key_out: t.column(key_out),
                                    col_out: t.column(col_in)}),
                batch_format="pyarrow"),
            key_out, col_out, nb=nb)
        agg = agg.materialize()
        total = agg.sum(col_out) or 0.0
        return agg, (1.0 / total if total > 0 else 1.0)

    h_scale = 1.0
    a_scale = 1.0
    for _ in range(iters):
        # authority from hubs: join on src, sum into dst
        auths, a_scale = _propagate(
            hubs.map_batches(lambda t: t.select(["node", "h"]),
                             batch_format="pyarrow"),
            "src", "dst", "h", "a", h_scale)
        # hubs from authorities: join on dst, sum into src
        hubs, h_scale = _propagate(
            auths.map_batches(lambda t: t.rename_columns(["node", "a"]),
                              batch_format="pyarrow"),
            "dst", "src", "a", "h", a_scale)
        hubs = hubs.map_batches(
            lambda t: t.rename_columns(["node", "h"]),
            batch_format="pyarrow")

    auths = auths.map_batches(lambda t: t.rename_columns(["node", "a"]),
                              batch_format="pyarrow")
    h_full = shuffle_hash_join(nodes, hubs, on=["node"], how="left", nb=nb)
    both = shuffle_hash_join(h_full, auths, on=["node"], how="left", nb=nb)
    return both.map_batches(
        lambda t, hs=h_scale, as_=a_scale: pa.table({
            "node": t.column("node"),
            "hub": pc.round(pc.multiply(
                pc.fill_null(t.column("h"), 0.0), pa.scalar(hs)), 8),
            "authority": pc.round(pc.multiply(
                pc.fill_null(t.column("a"), 0.0), pa.scalar(as_)), 8),
        }), batch_format="pyarrow")


def string_components(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 16,
    max_iters: int = 20,
    symmetrize: bool = True,
) -> "ray.data.Dataset":
    """Connected components over STRING-keyed edges → ``(node, lab)``
    with ``lab`` the component's MINIMUM node (string order) — the
    reusable min-label propagation inside
    :func:`canonicalize_entities`, exposed for every "fold these keys
    into equivalence classes" composition (owl:sameAs, page
    equivalence via canonical/redirect links, near-dup clusters over
    string ids). Per round: one bucket-shuffle join ships labels
    across edges, a groupby-argmax takes the per-node min;
    convergence by a per-round 64-bit (node, label) hash-sum fixpoint
    (unchanged sum ⇔ unchanged labels up to an astronomically
    unlikely collision). ``symmetrize=False`` when the input already
    carries both orientations."""
    from .canonicalize import dedup_exact, groupby_argmax
    from .join import shuffle_hash_join

    if symmetrize:
        def both(t: pa.Table) -> pa.Table:
            a = t.column(src_col).combine_chunks()
            b = t.column(dst_col).combine_chunks()
            return pa.table({"src": pa.concat_arrays([a, b]),
                             "dst": pa.concat_arrays([b, a])})

        e = edges.map_batches(both, batch_format="pyarrow",
                              batch_size=65536).materialize()
    else:
        e = edges.map_batches(
            lambda t: pa.table({"src": t.column(src_col),
                                "dst": t.column(dst_col)}),
            batch_format="pyarrow").materialize()

    labels = dedup_exact(
        e.map_batches(lambda t: pa.table({"node": t.column("src")}),
                      batch_format="pyarrow"),
        ["node"], nb=nb).map_batches(
        lambda t: t.append_column("lab", t.column("node")),
        batch_format="pyarrow").materialize()

    def _state_hash(ds) -> int:
        from ..functions.hashing import hash_strings

        def h(t: pa.Table) -> pa.Table:
            s = pc.binary_join_element_wise(
                t.column("node"), t.column("lab"), "\x1f")
            v = hash_strings(s).astype(np.uint64)
            return pa.table({"h": pa.array(
                [int(v.sum() % np.uint64(2**63 - 1))], pa.int64())})

        # exact Python-int sum of the one-row-per-batch partials —
        # Ray's int64 Sum overflowed C long on the aggregate (two
        # 63-bit partials already exceed int64), logging an
        # ArrowConversionError + slow fallback every round
        return sum(int(r["h"]) for r in ds.map_batches(
            h, batch_format="pyarrow").take_all())

    prev = _state_hash(labels)
    for _ in range(max_iters):
        shipped = shuffle_hash_join(
            e, labels.map_batches(
                lambda t: t.rename_columns(["src", "lab"]),
                batch_format="pyarrow"),
            on=["src"], how="inner", nb=nb).map_batches(
            lambda t: pa.table({"node": t.column("dst"),
                                "lab": t.column("lab")}),
            batch_format="pyarrow")
        cand = labels.union(shipped)
        labels = groupby_argmax(cand, ["node"], ["lab"], [True],
                                nb=nb).materialize()
        cur = _state_hash(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def canonicalize_entities(
    triples: "ray.data.Dataset",
    sameas_pred: str = "sameAs",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    nb: int = 16,
    max_iters: int = 20,
) -> "ray.data.Dataset":
    """owl:sameAs entity canonicalization — the KG-construction
    canonicalization composition (graft-added, r04): connected
    components of the (undirected) sameAs alias graph pick each
    entity's canonical id (the component's MINIMUM id, string order),
    every triple's subject and object are rewritten through the
    mapping, the sameAs triples themselves are dropped (they are now
    self-loops), and the merged stream is exact-deduped.

    String-label min propagation (the string sibling of
    ``dedup.dup_clusters``): per round one bucket-shuffle join ships
    labels across edges and a groupby-argmax takes the per-node min;
    convergence is detected by a per-round hash-sum fixpoint (sum of
    a 64-bit hash of (node, label) — unchanged sum ⇔ unchanged
    labels up to an astronomically unlikely collision). Converges in
    O(alias-chain diameter) rounds. The mapping covers ONLY aliased
    entities, so the rewrite joins stay proportional to the alias
    graph, not the KG."""
    from .canonicalize import dedup_exact, groupby_argmax
    from .join import shuffle_hash_join

    def alias_edges(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column(p_col), sameas_pred)
        f = b.filter(pc.fill_null(m, False))
        a = f.column(s_col).combine_chunks()
        c = f.column(o_col).combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, c]),
                         "dst": pa.concat_arrays([c, a])})

    e = triples.map_batches(alias_edges, batch_format="pyarrow",
                            batch_size=65536).materialize()
    if e.count() == 0:
        # no aliases anywhere: the rewrite is the identity — just
        # drop (nonexistent) sameAs rows and dedup
        def facts_only(b: pa.Table) -> pa.Table:
            m = pc.not_equal(b.column(p_col), sameas_pred)
            return b.filter(pc.fill_null(m, True)).select(
                [s_col, p_col, o_col])

        return dedup_exact(
            triples.map_batches(facts_only, batch_format="pyarrow"),
            [s_col, p_col, o_col], nb=nb)

    # alias_edges already emitted both orientations
    labels = string_components(e, nb=nb, max_iters=max_iters,
                               symmetrize=False)

    mapping = labels.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("node"),
                                              t.column("lab")))),
        batch_format="pyarrow")

    def drop_sameas(b: pa.Table) -> pa.Table:
        m = pc.not_equal(b.column(p_col), sameas_pred)
        return b.filter(pc.fill_null(m, True)).select(
            [s_col, p_col, o_col])

    facts = triples.map_batches(drop_sameas, batch_format="pyarrow")
    j1 = shuffle_hash_join(
        facts, mapping.map_batches(
            lambda t: t.rename_columns([s_col, "s_canon"]),
            batch_format="pyarrow"),
        on=[s_col], how="left", nb=nb)
    j1 = j1.map_batches(
        lambda t: pa.table({
            s_col: pc.coalesce(t.column("s_canon"), t.column(s_col)),
            p_col: t.column(p_col), o_col: t.column(o_col)}),
        batch_format="pyarrow")
    j2 = shuffle_hash_join(
        j1, mapping.map_batches(
            lambda t: t.rename_columns([o_col, "o_canon"]),
            batch_format="pyarrow"),
        on=[o_col], how="left", nb=nb)
    out = j2.map_batches(
        lambda t: pa.table({
            s_col: t.column(s_col), p_col: t.column(p_col),
            o_col: pc.coalesce(t.column("o_canon"), t.column(o_col))}),
        batch_format="pyarrow")
    return dedup_exact(out, [s_col, p_col, o_col], nb=nb)


def rdfs_infer_types(
    triples: "ray.data.Dataset",
    type_pred: str = "rdf:type",
    subclass_pred: str = "subClassOf",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    nb: int = 16,
    max_classes: int = 2_000_000,
    include_original: bool = True,
) -> "ray.data.Dataset":
    """RDFS subsumption materialization — the entailment step KG
    pipelines run after extraction: for every instance fact
    ``(x, rdf:type, C)`` emit ``(x, rdf:type, A)`` for each strict
    ancestor ``A`` of ``C`` under the ``subClassOf`` hierarchy, union
    the originals, and exact-dedup.

    Scale shape: the ontology (``subClassOf`` edges) is the SMALL side
    — bounded by ``max_classes`` edges (raises beyond it; a trillion-
    row KG still has a million-class ontology at most) — so the
    closure is computed driver-side (memoized DFS, cycle-tolerant:
    classes on a cycle see each other as ancestors, self never
    re-emitted) and broadcast ONCE via ``ray.put`` as a
    class → ancestor-tuple dict. The instance stream then expands in
    one ``map_batches``: the batch's obj column is dictionary-encoded,
    ancestors are resolved per DISTINCT class, and rows fan out via a
    CSR-style numpy repeat/gather — no shuffle touches the big side
    until the final dedup (which callers doing append-only loads can
    skip via ``include_original=False`` + their own sink dedup).
    """
    import ray as _ray
    import ray.data as rd

    from .canonicalize import dedup_exact

    def sub_edges(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column(p_col), subclass_pred)
        f = b.filter(pc.fill_null(m, False))
        return pa.table({"c": f.column(s_col), "p": f.column(o_col)})

    sub = triples.map_batches(sub_edges, batch_format="pyarrow",
                              batch_size=65536).materialize()
    n_edges = sub.count()
    if n_edges > max_classes:
        raise ValueError(
            f"rdfs_infer_types: {n_edges} subClassOf edges exceed "
            f"max_classes={max_classes}; the driver-side closure "
            "assumes an ontology-sized small side")
    parents: dict[str, list[str]] = {}
    for b in sub.iter_batches(batch_format="pyarrow"):
        for c, p in zip(b.column("c").to_pylist(),
                        b.column("p").to_pylist()):
            if c is not None and p is not None and c != p:
                parents.setdefault(c, []).append(p)

    anc: dict[str, tuple] = {}

    def ancestors(cls: str) -> tuple:
        done = anc.get(cls)
        if done is not None:
            return done
        seen: set = set()
        stack = list(parents.get(cls, ()))
        while stack:
            q = stack.pop()
            if q in seen:
                continue
            seen.add(q)
            memo = anc.get(q)
            if memo is not None:
                seen.update(memo)
            else:
                stack.extend(parents.get(q, ()))
        seen.discard(cls)  # cycles: self is never re-emitted
        out = tuple(sorted(seen))
        anc[cls] = out
        return out

    for c in list(parents):
        ancestors(c)
    ref = _ray.put(anc)
    _cache: dict = {}

    def expand(b: pa.Table) -> pa.Table:
        if "anc" not in _cache:
            _cache["anc"] = _ray.get(ref)
        amap = _cache["anc"]
        m = pc.fill_null(pc.equal(b.column(p_col), type_pred), False)
        tr = b.filter(m)
        base = b.select([s_col, p_col, o_col])
        if tr.num_rows == 0:
            return base if include_original else base.slice(0, 0)
        enc = pc.dictionary_encode(tr.column(o_col)).combine_chunks()
        vals = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lists = [amap.get(v, ()) for v in vals]
        lens = np.array([len(x) for x in lists], np.int64)
        flat = np.array([a for lst in lists for a in lst], object)
        offs = np.concatenate([[0], np.cumsum(lens)])
        counts = lens[idx]
        total = int(counts.sum())
        if total == 0:
            return base if include_original else base.slice(0, 0)
        rep = np.repeat(np.arange(len(idx), dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        new_obj = flat[offs[idx[rep]] + pos]
        inferred = pa.table({
            s_col: tr.column(s_col).take(pa.array(rep)),
            p_col: pa.array([type_pred] * total, pa.string()),
            o_col: pa.array(new_obj, pa.string()),
        })
        if not include_original:
            return inferred
        return pa.concat_tables([base, inferred])

    out = triples.map_batches(expand, batch_format="pyarrow")
    return dedup_exact(out, [s_col, p_col, o_col], nb=nb)


_SHAPE_KEYS = {"target_class", "pred", "min_count", "max_count",
               "obj_class", "pattern", "obj_kind"}


def validate_shapes(
    triples: "ray.data.Dataset",
    shapes: "list[dict]",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    kind_col: "str | None" = None,
    type_pred: str = "@type",
    nb: int = 32,
) -> "ray.data.Dataset":
    """SHACL-lite shape validation — the QA gate a KG-construction
    pipeline runs before publishing triples (graft-added, r04). Each
    shape is a dict targeting the instances of one class::

        {"target_class": "Person",   # subjects with (s, @type, Person)
         "pred": "worksFor",         # the property under constraint
         "min_count": 1,             # cardinality lower bound (default 0)
         "max_count": 1,             # upper bound (default None = ∞)
         "obj_class": "Organization",# objects must be typed this class
         "pattern": "^http",         # objects must match (partial regex,
                                     #   SHACL sh:pattern semantics)
         "obj_kind": "uri"}          # kind_col value check (optional)

    Returns a violation Dataset ``(shape_id, subj, constraint, obj,
    n)``: one row per cardinality violation (``obj`` null, ``n`` the
    actual count) and one row per offending TRIPLE for the value-level
    constraints (``n`` = 1, bag semantics — duplicate triples violate
    twice, exactly the SQL twin's result).

    Scale shape: shapes are ontology-sized (a handful); the triple
    stream is the big side. Per shape the plan is pred-pushdown
    filtered scans, one map-side pre-aggregated count per subject, and
    bucketed shuffle joins (left for cardinality, semi to scope value
    checks to targets, anti for obj_class membership) — no stage sees
    more than the shape's own predicate slice.
    """
    import ray.data as rd

    from .canonicalize import dedup_exact, sum_by_key
    from .join import shuffle_hash_join

    _V_SCHEMA = pa.schema([
        ("shape_id", pa.int64()), ("subj", pa.string()),
        ("constraint", pa.string()), ("obj", pa.string()),
        ("n", pa.int64())])

    def _empty() -> pa.Table:
        return _V_SCHEMA.empty_table()

    def _viol(sid: int, subj: pa.Array, constraint: str,
              obj: "pa.Array | None", n: "pa.Array | None") -> pa.Table:
        k = len(subj)
        return pa.table({
            "shape_id": pa.array([sid] * k, pa.int64()),
            "subj": subj.cast(pa.string()),
            "constraint": pa.array([constraint] * k, pa.string()),
            "obj": (obj.cast(pa.string()) if obj is not None
                    else pa.nulls(k, pa.string())),
            "n": (n.cast(pa.int64()) if n is not None
                  else pa.array([1] * k, pa.int64()))})

    def _pred_scan(pred: str, cols: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.equal(b.column(p_col), pred), False)
            f = b.filter(m)
            return pa.table({c: f.column(c) for c in cols})
        return triples.map_batches(fn, batch_format="pyarrow",
                                   batch_size=65536)

    def _class_members(cls: str, out_col: str):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.fill_null(pc.equal(b.column(p_col), type_pred), False),
                pc.fill_null(pc.equal(b.column(o_col), cls), False))
            return pa.table({out_col: b.filter(m).column(s_col)})
        ds = triples.map_batches(fn, batch_format="pyarrow",
                                 batch_size=65536)
        return dedup_exact(ds, [out_col], nb=nb)

    outs = []
    for sid, shape in enumerate(shapes):
        extra = set(shape) - _SHAPE_KEYS
        if extra:
            raise ValueError(f"shape {sid}: unknown keys {sorted(extra)}")
        if "target_class" not in shape or "pred" not in shape:
            raise ValueError(
                f"shape {sid}: target_class and pred are required")
        if shape.get("obj_kind") is not None and kind_col is None:
            raise ValueError(
                f"shape {sid}: obj_kind constraint needs kind_col")
        min_count = int(shape.get("min_count", 0) or 0)
        max_count = shape.get("max_count")
        # Targets/counts are class-sized reductions of the stream —
        # materializing them pins the schema even when a slice is
        # empty (an empty lazy chain reports schema None, which the
        # bucketed join cannot plan around) and lets a no-target
        # shape skip its joins entirely.
        targets = _class_members(shape["target_class"], "subj") \
            .materialize()
        if targets.count() == 0:
            continue  # no instances → nothing to violate
        val_cols = [s_col, o_col] + ([kind_col] if kind_col else [])
        pt = _pred_scan(shape["pred"], val_cols)

        # --- cardinality: map-side partial count, one bucketed groupby
        def _partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"subj": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            g = b.group_by(s_col).aggregate([(s_col, "count")])
            return pa.table({"subj": g.column(s_col),
                             "n": g.column(f"{s_col}_count")
                             .cast(pa.int64())})

        counts = sum_by_key(
            pt.map_batches(_partial, batch_format="pyarrow"),
            "subj", "n", nb=nb).materialize()
        if counts.count() == 0:
            counts = rd.from_arrow(pa.table(
                {"subj": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}))
        card = shuffle_hash_join(targets, counts, on=["subj"],
                                 how="left", nb=nb)

        def _card_viol(b: pa.Table, sid=sid, lo=min_count,
                       hi=max_count) -> pa.Table:
            n = pc.fill_null(b.column("n"), 0).cast(pa.int64())
            parts = []
            if lo > 0:
                m = pc.less(n, lo)
                parts.append(_viol(sid, b.filter(m).column("subj"),
                                   "min_count", None, n.filter(m)))
            if hi is not None:
                m = pc.greater(n, hi)
                parts.append(_viol(sid, b.filter(m).column("subj"),
                                   "max_count", None, n.filter(m)))
            return (pa.concat_tables(parts) if parts else _empty())

        outs.append(card.map_batches(_card_viol, batch_format="pyarrow"))

        # --- value-level constraints: scope the pred slice to targets
        needs_values = (shape.get("pattern") is not None
                        or shape.get("obj_class") is not None
                        or shape.get("obj_kind") is not None)
        if not needs_values:
            continue
        tpt = shuffle_hash_join(pt, targets, on=["subj"],
                                how="semi", nb=nb)
        if shape.get("pattern") is not None:
            def _pat_viol(b: pa.Table, sid=sid,
                          rx=shape["pattern"]) -> pa.Table:
                ok = pc.fill_null(
                    pc.match_substring_regex(b.column(o_col), rx), False)
                bad = b.filter(pc.invert(ok))
                return _viol(sid, bad.column(s_col), "pattern",
                             bad.column(o_col), None)
            outs.append(tpt.map_batches(_pat_viol,
                                        batch_format="pyarrow"))
        if shape.get("obj_kind") is not None:
            def _kind_viol(b: pa.Table, sid=sid,
                           want=shape["obj_kind"]) -> pa.Table:
                ok = pc.fill_null(
                    pc.equal(b.column(kind_col), want), False)
                bad = b.filter(pc.invert(ok))
                return _viol(sid, bad.column(s_col), "obj_kind",
                             bad.column(o_col), None)
            outs.append(tpt.map_batches(_kind_viol,
                                        batch_format="pyarrow"))
        if shape.get("obj_class") is not None:
            members = _class_members(shape["obj_class"], o_col) \
                .materialize()
            if members.count() == 0:  # schema-pinned empty (see above)
                members = rd.from_arrow(pa.table(
                    {o_col: pa.array([], pa.string())}))
            bad = shuffle_hash_join(
                tpt.map_batches(
                    lambda b: pa.table({s_col: b.column(s_col),
                                        o_col: b.column(o_col)}),
                    batch_format="pyarrow"),
                members, on=[o_col], how="anti", nb=nb)

            def _cls_viol(b: pa.Table, sid=sid) -> pa.Table:
                return _viol(sid, b.column(s_col), "obj_class",
                             b.column(o_col), None)
            outs.append(bad.map_batches(_cls_viol,
                                        batch_format="pyarrow"))

    base = rd.from_arrow(_empty())
    return base.union(*outs) if outs else base


def resolve_redirects(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 32,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Follow redirect chains to their final target (graft-added,
    r04) — the URL-canonicalization step a crawl/KG pipeline runs so
    every alias of a page collapses to one node before linking.

    ``edges`` is a (src → dst) redirect table; multiple outgoing
    edges per src are collapsed deterministically to the MINIMUM dst
    (one functional edge per src, matching the SQL twin). Returns one
    row per redirect SOURCE: ``(src, final, hops, status)`` where
    status is ``resolved`` (final has no outgoing redirect and the
    chain used ≤ max_hops edges; ``hops`` is the exact chain length)
    or ``unresolved`` (cycle or chain longer than ``max_hops``;
    ``final``/``hops`` are null — intermediate pointers would be
    round-count-dependent, so they are never exposed).

    Scale shape: POINTER DOUBLING — each round left-joins the mapping
    with itself (``f'(x) = f(f(x))``, hop counts add), so a chain of
    length L resolves in ⌈log2 L⌉ bucketed shuffles instead of L
    sequential self-joins; cycles are bounded by the same round count
    and detected by a final membership join, never by per-row walking.
    """
    import math

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column(src).cast(pa.string()),
                         "final": b.column(dst).cast(pa.string())})

    m = dedup_exact(edges.map_batches(_proj, batch_format="pyarrow"),
                    ["src"], nb=nb, keep_order_col="final")
    m = m.map_batches(
        lambda b: b.append_column(
            "hops", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow").materialize()
    if m.count() == 0:  # empty lazy chains report schema None
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "src": pa.array([], pa.string()),
            "final": pa.array([], pa.string()),
            "hops": pa.array([], pa.int64()),
            "status": pa.array([], pa.string())}))

    def _as_next(b: pa.Table) -> pa.Table:
        return pa.table({"final": b.column("src"),
                         "nxt": b.column("final"),
                         "hops2": b.column("hops")})

    def _double(b: pa.Table) -> pa.Table:
        matched = pc.is_valid(b.column("nxt"))
        return pa.table({
            "src": b.column("src"),
            "final": pc.if_else(matched, b.column("nxt"),
                                b.column("final")),
            "hops": pc.if_else(
                matched,
                pc.add(b.column("hops"),
                       pc.fill_null(b.column("hops2"), 0)),
                b.column("hops")).cast(pa.int64())})

    rounds = max(1, math.ceil(math.log2(max(2, max_hops))))
    for _ in range(rounds):
        nxt = m.map_batches(_as_next, batch_format="pyarrow")
        j = shuffle_hash_join(m, nxt, on=["final"], how="left", nb=nb)
        m = j.map_batches(_double,
                          batch_format="pyarrow").materialize()

    # status: still pointing into the domain OR over budget → unresolved
    nxt = m.map_batches(_as_next, batch_format="pyarrow")
    j = shuffle_hash_join(m, nxt, on=["final"], how="left", nb=nb)

    def _finish(b: pa.Table) -> pa.Table:
        bad = pc.or_(pc.is_valid(b.column("nxt")),
                     pc.greater(b.column("hops"),
                                pa.scalar(max_hops, pa.int64())))
        return pa.table({
            "src": b.column("src"),
            "final": pc.if_else(bad, pa.nulls(b.num_rows, pa.string()),
                                b.column("final")),
            "hops": pc.if_else(bad, pa.nulls(b.num_rows, pa.int64()),
                               b.column("hops")),
            "status": pc.if_else(bad, "unresolved", "resolved")})

    return j.map_batches(_finish, batch_format="pyarrow")


def clustering_coefficient(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    nb: int = 64,
    orient: str = "degree",
) -> "ray.data.Dataset":
    """Per-node triangle count and local clustering coefficient
    ``cc(v) = 2·T(v) / (deg(v)·(deg(v)−1))`` (0 when deg < 2) over an
    undirected simple graph given — like ``triangle_count`` — as
    DISTINCT edges with ``a < b``. Returns ``(node, deg, tri, cc)``
    for every node incident to an edge.

    Same join-based node-iterator as ``triangle_count`` (wedge join +
    closing semi join, ``orient="degree"`` re-orients along the
    (degree, node) total order so hub wedge volume is O(m^1.5)), but
    each closed wedge KEEPS its three node ids and scatters +1 to
    each — per-node totals are orientation-invariant, which the tests
    assert by running both modes.
    """
    import ray.data as rd

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(a_col).cast(pa.int64()),
                            "b": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow")

    def ends(t: pa.Table) -> pa.Table:
        both = pa.table({"node": pa.concat_arrays([
            t.column("a").combine_chunks(),
            t.column("b").combine_chunks()])})
        g = both.group_by("node").aggregate([("node", "count")])
        return pa.table({"node": g.column("node"),
                         "deg_part": g.column("node_count")
                         .cast(pa.int64())})

    deg = sum_by_key(e.map_batches(ends, batch_format="pyarrow"),
                     "node", "deg_part", nb=nb,
                     out_col="deg").materialize()

    if orient == "degree":
        w = shuffle_hash_join(
            e, deg.map_batches(lambda t: t.rename_columns(["a", "deg_a"]),
                               batch_format="pyarrow"),
            on=["a"], how="inner", nb=nb)
        w = shuffle_hash_join(
            w, deg.map_batches(lambda t: t.rename_columns(["b", "deg_b"]),
                               batch_format="pyarrow"),
            on=["b"], how="inner", nb=nb)

        def reorient(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            da = t.column("deg_a").to_numpy(zero_copy_only=False)
            db = t.column("deg_b").to_numpy(zero_copy_only=False)
            fwd = (da < db) | ((da == db) & (a < b))
            return pa.table({"a": pa.array(np.where(fwd, a, b), pa.int64()),
                             "b": pa.array(np.where(fwd, b, a), pa.int64())})

        e = w.map_batches(reorient, batch_format="pyarrow")
    elif orient != "value":
        raise ValueError(f"unknown orient={orient!r}")
    e = e.materialize()

    # wedges (a, mid, b): a→mid, mid→b; close on (a, b) keeping mid
    wedges = shuffle_hash_join(
        e.map_batches(lambda t: t.rename_columns(["a", "mid"]),
                      batch_format="pyarrow"),
        e.map_batches(lambda t: t.rename_columns(["mid", "b"]),
                      batch_format="pyarrow"),
        on=["mid"], how="inner", nb=nb)
    closed = shuffle_hash_join(wedges, e, on=["a", "b"],
                               how="semi", nb=nb)

    def scatter(t: pa.Table) -> pa.Table:
        nodes = pa.table({"node": pa.concat_arrays([
            t.column("a").combine_chunks(),
            t.column("mid").combine_chunks(),
            t.column("b").combine_chunks()])})
        g = nodes.group_by("node").aggregate([("node", "count")])
        return pa.table({"node": g.column("node"),
                         "tri_part": g.column("node_count")
                         .cast(pa.int64())})

    tri = sum_by_key(closed.map_batches(scatter,
                                        batch_format="pyarrow"),
                     "node", "tri_part", nb=nb,
                     out_col="tri").materialize()
    if tri.count() == 0:  # schema-pinned empty (lazy empties → None)
        tri = rd.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "tri": pa.array([], pa.int64())}))

    out = shuffle_hash_join(deg, tri, on=["node"], how="left", nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("deg").cast(pa.float64())
        tr = pc.fill_null(t.column("tri"), 0)
        cc = pc.if_else(
            pc.less(t.column("deg"), 2), pa.scalar(0.0),
            pc.divide(pc.multiply(tr.cast(pa.float64()), 2.0),
                      pc.multiply(d, pc.subtract(d, 1.0))))
        return pa.table({"node": t.column("node"),
                         "deg": t.column("deg").cast(pa.int64()),
                         "tri": tr.cast(pa.int64()),
                         "cc": cc})

    return out.map_batches(finish, batch_format="pyarrow")


def kcore(
    edges,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    nb: int = 32,
    max_rounds: int = 100,
) -> "ray.data.Dataset":
    """k-core decomposition — iteratively peel nodes of degree < k
    from an undirected simple graph (DISTINCT edges, ``a < b``) until
    a fixpoint; returns the surviving ``(node, deg)`` rows where
    ``deg`` is the node's degree INSIDE the k-core subgraph. The
    classic community/spam-farm filter for web link graphs.

    Shape per round: one map-side pre-aggregated degree groupby to
    find the sub-``k`` nodes, then two semi joins keep only edges
    whose BOTH endpoints survive — each round is bucketed shuffles,
    no driver-side node sets. Peeling converges in at most the graph
    diameter's worth of rounds in practice; ``max_rounds`` bounds the
    worst case (raises — a non-converged core would be silently
    wrong).
    """
    import ray.data as rd

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    if k < 1:
        raise ValueError("k must be >= 1")
    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(a_col).cast(pa.int64()),
                            "b": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    def ends(t: pa.Table) -> pa.Table:
        both = pa.table({"node": pa.concat_arrays([
            t.column("a").combine_chunks(),
            t.column("b").combine_chunks()])})
        g = both.group_by("node").aggregate([("node", "count")])
        return pa.table({"node": g.column("node"),
                         "deg_part": g.column("node_count")
                         .cast(pa.int64())})

    empty_deg = pa.table({"node": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64())})

    for _ in range(max_rounds):
        if e.count() == 0:
            return rd.from_arrow(empty_deg)
        deg = sum_by_key(e.map_batches(ends, batch_format="pyarrow"),
                         "node", "deg_part", nb=nb,
                         out_col="deg").materialize()
        good = deg.map_batches(
            lambda t, kk=k: t.filter(
                pc.greater_equal(t.column("deg"), kk))
            .select(["node"]),
            batch_format="pyarrow").materialize()
        n_bad = deg.count() - good.count()
        if n_bad == 0:
            return deg
        if good.count() == 0:
            return rd.from_arrow(empty_deg)
        e = shuffle_hash_join(
            e, good.map_batches(lambda t: t.rename_columns(["a"]),
                                batch_format="pyarrow"),
            on=["a"], how="semi", nb=nb)
        e = shuffle_hash_join(
            e, good.map_batches(lambda t: t.rename_columns(["b"]),
                                batch_format="pyarrow"),
            on=["b"], how="semi", nb=nb).materialize()
    raise RuntimeError(
        f"kcore: no fixpoint within max_rounds={max_rounds}")


def personalized_pagerank(
    edges: "ray.data.Dataset",
    seeds: list,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Personalized PageRank — relevance of every node TO a seed set
    (topic-sensitive ranking / related-entity discovery over the KG):
    ``r ← (1−d)·v + d·(Σ_in r/outdeg + dangling·v)`` with the teleport
    vector ``v`` uniform over ``seeds`` instead of over all nodes.
    Ranks sum to 1 every iteration; nodes unreachable from the seeds
    score 0.

    Same per-iteration shape as ``pagerank`` (ONE shuffle join + one
    pre-combined groupby sum); the seed set is ontology-sized and
    rides into the vectorized maps as a broadcast `pa.array` for
    ``pc.is_in`` membership — no extra join. Seeds missing from the
    node set would silently leak teleport mass, so they raise.
    """
    import ray.data as _rd

    from .canonicalize import distinct_counts, set_op, sum_by_key
    from .join import shuffle_hash_join

    if not seeds:
        raise ValueError("seeds must be non-empty")
    e = edges.map_batches(
        lambda t: t.select([src, dst]).rename_columns(["src", "dst"]),
        batch_format="pyarrow", batch_size=65536).materialize()

    deg = distinct_counts(e.select_columns(["src"]), "src", nb=nb)
    edges_w = shuffle_hash_join(e, deg, on=["src"], how="inner",
                                nb=nb).materialize()
    srcs = e.map_batches(
        lambda t: t.select(["src"]).rename_columns(["node"]),
        batch_format="pyarrow")
    dsts = e.map_batches(
        lambda t: t.select(["dst"]).rename_columns(["node"]),
        batch_format="pyarrow")
    nodes = set_op(srcs, dsts, "node", op="union", nb=nb).materialize()
    no_in = set_op(nodes, dsts, "node", op="except", nb=nb).materialize()

    seed_vals = sorted(set(seeds))
    n_seeds = len(seed_vals)
    seed_arr = pa.array(seed_vals)
    n_found = nodes.map_batches(
        lambda t, sa=seed_arr: pa.table({"hit": pa.array(
            [int(pc.sum(pc.is_in(t.column("node"),
                                 value_set=sa)).as_py() or 0)],
            pa.int64())}),
        batch_format="pyarrow").sum("hit") or 0
    if n_found != n_seeds:
        raise ValueError(
            f"personalized_pagerank: {n_seeds - n_found} seed(s) not "
            "in the graph's node set — their teleport mass would "
            "silently vanish")

    tv = 1.0 / n_seeds
    ranks = nodes.map_batches(
        lambda t, sa=seed_arr: t.append_column("rank", pc.if_else(
            pc.is_in(t.column("node"), value_set=sa),
            pa.scalar(tv), pa.scalar(0.0))),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        r_src = ranks.map_batches(
            lambda t: t.rename_columns(["src", "rank"]),
            batch_format="pyarrow")
        joined = shuffle_hash_join(edges_w, r_src, on=["src"],
                                   how="inner", nb=nb)

        def contrib(batch: pa.Table) -> pa.Table:
            w = (batch.column("rank").to_numpy(zero_copy_only=False)
                 / batch.column("count").to_numpy(zero_copy_only=False))
            t = pa.table({"dst": batch.column("dst"), "w": pa.array(w)})
            df = t.to_pandas().groupby("dst", as_index=False)["w"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        msum = sum_by_key(
            joined.map_batches(contrib, batch_format="pyarrow",
                               batch_size=65536),
            "dst", "w", nb=nb, out_col="msum").materialize()
        emitted = msum.sum("msum") or 0.0
        boost = ((1.0 - damping)
                 + damping * (1.0 - emitted)) * tv

        scored = msum.map_batches(
            lambda t, b=boost, sa=seed_arr, d=damping: pa.table({
                "node": t.column("dst"),
                "rank": pc.add(
                    pc.multiply(t.column("msum").cast(pa.float64()),
                                pa.scalar(d)),
                    pc.if_else(pc.is_in(t.column("dst"), value_set=sa),
                               pa.scalar(b), pa.scalar(0.0)))}),
            batch_format="pyarrow")
        floor_rows = no_in.map_batches(
            lambda t, b=boost, sa=seed_arr: t.append_column(
                "rank", pc.if_else(
                    pc.is_in(t.column("node"), value_set=sa),
                    pa.scalar(b), pa.scalar(0.0))),
            batch_format="pyarrow")
        ranks = scored.union(floor_rows).materialize()

    return ranks


def node_similarity(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    min_common: int = 1,
    max_degree: "int | None" = None,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Structural link-prediction scores over an undirected simple
    graph (DISTINCT edges, ``a < b``): for every 2-hop node pair emit
    common-neighbor count, Jaccard ``|N∩| / |N∪|``, and Adamic–Adar
    ``Σ_mid 1/ln(deg(mid))`` — the classic "which entities should be
    linked/merged" signals for KG completion and ER blocking.

    Shape: one bucket shuffle co-locates each MID node's neighbor
    list; pairs expand with a per-bucket vectorized self-merge
    (volume Σ deg(mid)² — pass ``max_degree`` to SKIP super-hub mids,
    the standard link-prediction cut, reported via the returned
    dataset's companion count if needed); pair scores combine via the
    bucketed composite-key ``sum_by_key``; degrees join back for the
    Jaccard denominator. ``min_common`` prunes the long tail before
    the pair shuffle leaves the bucket stage.
    """
    import ray.data as rd

    from .canonicalize import _B, _add_bucket, sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(a_col).cast(pa.int64()),
                            "b": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow")
    und = e.map_batches(
        lambda t: pa.table({
            "mid": pa.concat_arrays([t.column("a").combine_chunks(),
                                     t.column("b").combine_chunks()]),
            "n": pa.concat_arrays([t.column("b").combine_chunks(),
                                   t.column("a").combine_chunks()])}),
        batch_format="pyarrow")
    und = und.map_batches(
        lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow")
    deg = sum_by_key(und.map_batches(
        lambda t: pa.table({"mid": t.column("mid"),
                            "one": t.column("one")}),
        batch_format="pyarrow"), "mid", "one", nb=nb,
        out_col="deg").materialize()

    und_w = shuffle_hash_join(
        und.map_batches(lambda t: t.select(["mid", "n"]),
                        batch_format="pyarrow"),
        deg, on=["mid"], how="inner", nb=nb)
    if max_degree is not None:
        und_w = und_w.map_batches(
            lambda t, md=int(max_degree): t.filter(
                pc.less_equal(t.column("deg"), md)),
            batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        return _add_bucket(t, ["mid"], nb)

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"pa_": pa.array([], pa.int64()),
                          "pb_": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "aa": pa.array([], pa.float64())})
        if g.num_rows == 0:
            return empty
        s, l, r = _expand_sorted_pairs(
            g.select(["mid", "n", "deg"]), "mid", "n")
        if len(l) == 0:
            return empty
        n_arr = s.column("n").combine_chunks()
        deg = s.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        pt = pa.table({"pa_": n_arr.take(pa.array(l)),
                       "pb_": n_arr.take(pa.array(r)),
                       "aa_w": pa.array(1.0 / np.log(deg[l]), pa.float64())})
        out = pt.group_by(["pa_", "pb_"]).aggregate(
            [("aa_w", "sum"), ("aa_w", "count")])
        return pa.table({"pa_": out.column("pa_"),
                         "pb_": out.column("pb_"),
                         "c": out.column("aa_w_count").cast(pa.int64()),
                         "aa": out.column("aa_w_sum")})

    pairs = (und_w.map_batches(bucketize, batch_format="pyarrow")
             .groupby(_B).map_groups(expand, batch_format="pyarrow"))
    pairs = pairs.materialize()
    if pairs.count() == 0:  # e.g. max_degree filtered every mid
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "common": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
            "adamic_adar": pa.array([], pa.float64())}))
    from .canonicalize import sums_by_key

    # one combined (c, aa) bucket pass — replaces two sum_by_key
    # shuffles plus the pair-key join that re-merged them (measured
    # on the sf0.1 derived graph: ~2M 2-hop pairs crossed the wire
    # three times; now once)
    both = sums_by_key(pairs, ["pa_", "pb_"], ["c", "aa"], nb=nb)
    both = both.map_batches(
        lambda t, mc=int(min_common): t.filter(
            pc.greater_equal(t.column("c"), mc)),
        batch_format="pyarrow")

    j = shuffle_hash_join(
        both, deg.map_batches(lambda t: t.rename_columns(
            ["pa_", "deg_a"]), batch_format="pyarrow"),
        on=["pa_"], how="inner", nb=nb)
    j = shuffle_hash_join(
        j, deg.map_batches(lambda t: t.rename_columns(
            ["pb_", "deg_b"]), batch_format="pyarrow"),
        on=["pb_"], how="inner", nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        c = t.column("c").cast(pa.float64())
        da = t.column("deg_a").cast(pa.float64())
        db = t.column("deg_b").cast(pa.float64())
        jac = pc.divide(c, pc.subtract(pc.add(da, db), c))
        return pa.table({
            "a": t.column("pa_"), "b": t.column("pb_"),
            "common": t.column("c").cast(pa.int64()),
            "jaccard": pc.round(jac, 6),
            "adamic_adar": pc.round(t.column("aa"), 6)})

    return j.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    nb: int = 32,
) -> float:
    """Degree assortativity coefficient of an undirected simple graph
    (DISTINCT edges, ``a < b``): the Pearson correlation of endpoint
    degrees over both orientations of every edge. Positive →
    hubs link to hubs (social-graph shape); negative → hub-and-spoke
    (the typical web/link-farm shape) — a one-number skew fingerprint
    used to pick salting/partitioning strategies.

    One bucketed degree census (``sum_by_key``), two bucketed joins to
    attach endpoint degrees, then a single sufficient-statistics pass
    (n, Σx, Σy, Σxy, Σx², Σy² per batch → tiny driver reduce). NaN
    for degenerate graphs (all degrees equal)."""
    import ray.data as rd

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(a_col).cast(pa.int64()),
                            "b": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow")
    und = e.map_batches(
        lambda t: pa.table({
            "u": pa.concat_arrays([t.column("a").combine_chunks(),
                                   t.column("b").combine_chunks()]),
            "v": pa.concat_arrays([t.column("b").combine_chunks(),
                                   t.column("a").combine_chunks()]),
            "one": pa.array(np.ones(2 * t.num_rows, np.int64))}),
        batch_format="pyarrow")
    deg = sum_by_key(und.map_batches(
        lambda t: t.select(["u", "one"]), batch_format="pyarrow"),
        "u", "one", nb=nb, out_col="deg").materialize()
    j = shuffle_hash_join(
        und.map_batches(lambda t: t.select(["u", "v"]),
                        batch_format="pyarrow"),
        deg, on=["u"], how="inner", nb=nb)
    j = shuffle_hash_join(
        j, deg.map_batches(lambda t: t.rename_columns(["v", "deg_v"]),
                           batch_format="pyarrow"),
        on=["v"], how="inner", nb=nb)

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("deg").to_numpy(zero_copy_only=False).astype(float)
        y = t.column("deg_v").to_numpy(zero_copy_only=False) \
            .astype(float)
        return pa.table({
            "n": pa.array([float(len(x))]), "sx": pa.array([x.sum()]),
            "sy": pa.array([y.sum()]), "sxx": pa.array([(x * x).sum()]),
            "syy": pa.array([(y * y).sum()]),
            "sxy": pa.array([(x * y).sum()])})

    p = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    n, sx, sy = p["n"].sum(), p["sx"].sum(), p["sy"].sum()
    sxx, syy, sxy = p["sxx"].sum(), p["syy"].sum(), p["sxy"].sum()
    if n == 0:
        return float("nan")
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    if vx <= 0 or vy <= 0:
        return float("nan")
    return float(cov / np.sqrt(vx * vy))


def sssp(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    nb: int = 32,
    max_iters: int = 100,
) -> "ray.data.Dataset":
    """Weighted single-source(-set) shortest paths over a directed
    edge list with NON-NEGATIVE weights → ``(node, dist)`` for every
    node reachable from ``seeds`` (seeds at 0.0). Distributed
    Bellman-Ford: unlike :func:`bfs_min_depth`, a labeled node can be
    IMPROVED by a cheaper many-hop path, so rounds relax until no
    distance changes rather than settling on first touch.

    Per round: frontier ⋈ edges (one bucket join) → candidate
    ``dist + w`` per target, map-side-combined min per node, then one
    left join against the current labels keeps only strict
    improvements — the next frontier. Converges in ≤ longest
    shortest-path hop count rounds; negative weights raise up front
    (Bellman-Ford would need the V−1 bound and a negative-cycle
    check — out of contract at this scale)."""
    import ray.data as rd

    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges

    def prep(t: pa.Table) -> pa.Table:
        w = t.column(weight_col).cast(pa.float64())
        if t.num_rows and pc.min(w).as_py() < 0:
            raise ValueError("sssp: negative edge weight")
        return pa.table({"src": t.column(src_col).cast(pa.int64()),
                         "dst": t.column(dst_col).cast(pa.int64()),
                         "w": w})

    e = edges_ds.map_batches(prep, batch_format="pyarrow").materialize()
    if isinstance(seeds, (list, tuple, np.ndarray)):
        seeds = pa.table({"node": pa.array(
            sorted(set(int(x) for x in seeds)), pa.int64())})
    seeds_ds = rd.from_arrow(seeds) if isinstance(seeds, pa.Table) else seeds
    dist = seeds_ds.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "dist": pa.array(np.zeros(len(t)))}),
        batch_format="pyarrow").materialize()
    frontier = dist

    from .util import map_known, strip_stats, with_schema
    _sch_nd = pa.schema([pa.field("node", pa.int64()),
                         pa.field("dist", pa.float64())])
    for _ in range(max_iters):
        if frontier.count() == 0:
            return dist
        msgs = map_known(shuffle_hash_join(
            map_known(frontier, lambda t: t.rename_columns(
                ["src", "dist"])),
            e, on=["src"], how="inner", nb=nb),
            lambda t: pa.table({
                "node": t.column("dst"),
                "dist": pc.add(t.column("dist"), t.column("w"))}))
        # fused relax: min(candidates ∪ current) + old in ONE shuffle
        # — frontier and the updated dist table are lazy views of it
        delta = strip_stats(_min_with_old(
            msgs, dist, nb, "node", "dist").materialize())
        frontier = with_schema(map_known(delta, lambda t: (
            lambda f: f.select(["node", "dist"]))(
            t.filter(pc.fill_null(pc.less(t.column("dist"),
                                          t.column("old")), True)))),
            _sch_nd)
        if frontier.count() == 0:
            return dist
        dist = with_schema(map_known(
            delta, lambda t: t.select(["node", "dist"])), _sch_nd)
    raise RuntimeError(
        f"sssp did not converge in max_iters={max_iters} — deeper "
        "shortest paths than that; raise max_iters")


def fuse_triple_confidence(
    triples: "ray.data.Dataset",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    score_col: str = "score",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Noisy-OR confidence fusion of duplicate triples — the merge
    step after extraction when the SAME fact arrives from many pages
    with independent per-mention scores: ``conf = 1 − Π(1 − sᵢ)``,
    plus the supporting-mention count. Scores must lie in [0, 1)
    (a 1.0 would be certainty; pass 1-ε upstream — raises otherwise,
    since ln(0) would silently poison the group).

    Shape: the product folds to a SUM of ``ln(1 − s)`` per (s, p, o),
    so the whole operator is one composite-key bucketed
    ``sum_by_key`` pass (map-side combined) — no sort groupby, no
    row loops."""
    from .canonicalize import sum_by_key

    def prep(t: pa.Table) -> pa.Table:
        s = t.column(score_col).cast(pa.float64())
        if t.num_rows:
            lo = pc.min(s).as_py()
            hi = pc.max(s).as_py()
            if lo is not None and (lo < 0 or hi >= 1.0):
                raise ValueError(
                    "fuse_triple_confidence: scores must be in [0, 1)")
        return pa.table({
            "subj": t.column(s_col), "pred": t.column(p_col),
            "obj": t.column(o_col),
            "lg": pc.ln(pc.subtract(pa.scalar(1.0), s)),
            "n": pa.array(np.ones(t.num_rows, np.int64))})

    pp = triples.map_batches(prep, batch_format="pyarrow")
    # one combined (lg, n) bucket pass — replaces two sum_by_key
    # shuffles plus the composite-key join that re-merged them
    from .canonicalize import sums_by_key

    j = sums_by_key(pp, ["subj", "pred", "obj"], ["lg", "n"], nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        conf = pc.subtract(pa.scalar(1.0), pc.exp(t.column("lg")))
        return pa.table({
            "subj": t.column("subj"), "pred": t.column("pred"),
            "obj": t.column("obj"),
            "n_mentions": t.column("n").cast(pa.int64()),
            "conf": pc.round(conf, 6)})

    return j.map_batches(finish, batch_format="pyarrow")


def label_propagation(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    n_iters: int = 3,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Synchronous label-propagation community detection over an
    undirected simple graph (DISTINCT edges, ``a < b``, no self-loops
    — the :func:`triangle_count` contract) → ``(node, label)`` after
    exactly ``n_iters`` rounds.

    Deterministic by construction so a recovered partition reproduces
    the same communities and the run is SQL-twinnable: every node
    updates SYNCHRONOUSLY from the previous round's labels, the new
    label is the most frequent label among its (distinct) neighbors,
    ties break to the MIN label. (Classic LPA is asynchronous with
    random tie-breaks — useless as a pipeline operator, where
    re-running a failed partition must not flip communities.)

    Per round: one bucket join scatters each node's label across both
    edge orientations, ``sum_by_key`` counts (node, label) votes
    map-side-combined, ``groupby_argmax`` keeps the winner. LPA is
    not monotone (labels can flip back), so there is no settled-set
    pruning — every round touches all nodes; ``n_iters`` is a fixed
    hyperparameter, not a convergence bound.
    """
    import ray.data as rd

    from .canonicalize import groupby_argmax, sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    und = edges_ds.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column(a_col).cast(pa.int64()).combine_chunks(),
                t.column(b_col).cast(pa.int64()).combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column(b_col).cast(pa.int64()).combine_chunks(),
                t.column(a_col).cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow").materialize()

    # round 0: every node labels itself (min over the trivial group)
    labels = _min_per_node(
        und.map_batches(
            lambda t: pa.table({"node": t.column("src"),
                                "lab": t.column("src")}),
            batch_format="pyarrow"),
        nb, "node", "lab").materialize()

    for _ in range(n_iters):
        votes = shuffle_hash_join(
            labels.map_batches(
                lambda t: t.select(["node", "lab"])
                .rename_columns(["src", "lab"]),
                batch_format="pyarrow"),
            und, on=["src"], how="inner", nb=nb)
        counted = sum_by_key(
            votes.map_batches(
                lambda t: pa.table({
                    "node": t.column("dst"), "lab": t.column("lab"),
                    "c": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            ["node", "lab"], "c", nb=nb)
        labels = groupby_argmax(
            counted, ["node"], ["c", "lab"], [False, True], nb=nb
        ).map_batches(
            lambda t: t.select(["node", "lab"]),
            batch_format="pyarrow").materialize()

    return labels.map_batches(
        lambda t: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "label": t.column("lab").cast(pa.int64())}),
        batch_format="pyarrow")


def wl_refinement(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    n_iters: int = 2,
    nb: int = 32,
) -> "ray.data.Dataset":
    """1-WL (Weisfeiler–Leman color refinement) node signatures over
    an undirected simple graph (DISTINCT edges, ``a < b``) →
    ``(node, wl_color)``: structurally equivalent nodes (up to
    ``n_iters``-hop neighborhoods) share a color — the standard
    structural-role fingerprint for template-page detection and
    near-isomorphic subgraph dedup in a crawl graph.

    ``c0 = str(degree)``; each round
    ``c_{k+1}(v) = md5(c_k(v) || '|' || ','.join(sorted(c_k(N(v)))))``
    — md5 keeps labels fixed-width across rounds (multiset strings
    grow exponentially otherwise) AND is reproducible in SQL (DuckDB
    ``md5`` + ``string_agg(... ORDER BY ...)``), so the operator is
    fully oracle-checkable end to end.

    Per round: one bucket join scatters colors across both edge
    orientations, then one bucket shuffle co-locates each node's
    neighbor colors; the multiset string builds vectorized (Arrow
    sort + run-offset ``pc.binary_join`` — no per-node Python), and
    only the final digest is a per-row C-speed md5 (no Arrow kernel
    exists for it; ~1 µs/row against a shuffle-dominated round).
    """
    import hashlib

    import ray.data as rd

    from .canonicalize import _B, _add_bucket, sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    und = edges_ds.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column(a_col).cast(pa.int64()).combine_chunks(),
                t.column(b_col).cast(pa.int64()).combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column(b_col).cast(pa.int64()).combine_chunks(),
                t.column(a_col).cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow").materialize()

    deg = sum_by_key(
        und.map_batches(
            lambda t: pa.table({
                "node": t.column("src"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "node", "one", nb=nb, out_col="deg")
    colors = deg.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "color": t.column("deg").cast(pa.string())}),
        batch_format="pyarrow").materialize()

    def concat_sig(g: pa.Table) -> pa.Table:
        t = g.drop_columns([_B]).sort_by(
            [("node", "ascending"), ("color", "ascending")])
        node = t.column("node").to_numpy(zero_copy_only=False)
        if len(node) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.string())})
        change = np.nonzero(node[1:] != node[:-1])[0] + 1
        offsets = np.concatenate([[0], change, [len(node)]])
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            t.column("color").combine_chunks())
        return pa.table({
            "node": pa.array(node[offsets[:-1]], pa.int64()),
            "sig": pc.binary_join(lst.cast(pa.list_(pa.string())),
                                  pa.scalar(","))})

    def digest(t: pa.Table) -> pa.Table:
        own = t.column("color").to_pylist()
        sig = t.column("sig").to_pylist()
        new = [hashlib.md5((c + "|" + s).encode()).hexdigest()
               for c, s in zip(own, sig)]
        return pa.table({"node": t.column("node"),
                         "color": pa.array(new, pa.string())})

    for _ in range(n_iters):
        msgs = shuffle_hash_join(
            colors.map_batches(
                lambda t: t.rename_columns(["src", "color"]),
                batch_format="pyarrow"),
            und, on=["src"], how="inner", nb=nb)
        sigs = (msgs.map_batches(
            lambda t: _add_bucket(pa.table({
                "node": t.column("dst"),
                "color": t.column("color")}), ["node"], nb),
            batch_format="pyarrow")
            .groupby(_B).map_groups(concat_sig, batch_format="pyarrow"))
        colors = shuffle_hash_join(
            sigs, colors, on=["node"], how="inner", nb=nb
        ).map_batches(digest, batch_format="pyarrow").materialize()

    return colors.map_batches(
        lambda t: pa.table({"node": t.column("node").cast(pa.int64()),
                            "wl_color": t.column("color")}),
        batch_format="pyarrow")


def butterfly_count(
    edges,
    u_col: str = "u",
    v_col: str = "v",
    max_degree: "int | None" = None,
    nb: int = 64,
) -> int:
    """Count butterflies (2×2 bicliques / 4-cycles) in a bipartite
    graph given as DISTINCT ``(u, v)`` edges — the bipartite analogue
    of the triangle count, the standard cohesion metric for
    page–entity / doc–term incidence graphs (a butterfly = two pages
    sharing two entities = a strong co-citation signal).

    Exact wedge-pair identity: ``#butterflies = Σ_{u1<u2} C(w, 2)``
    where ``w`` counts the common v-neighbors of the pair. Shape: one
    bucket shuffle co-locates each v's u-list, pairs expand with a
    per-bucket vectorized self-merge (volume Σ deg(v)² — pass
    ``max_degree`` to skip super-hub v's, the standard cut, which
    makes the count a documented UNDERCOUNT), pair multiplicities
    combine via the bucketed composite-key ``sum_by_key``, and the
    closing ``C(w, 2)`` folds map-side to one scalar.

    SIDE SELECTION (exact, Wang-et-al-style): the 4-cycle count is
    symmetric in the bipartition, so when ``max_degree`` is unset the
    wedges expand through whichever side has the smaller Σ deg² —
    measured first with two cheap degree censuses. On skewed
    incidence graphs (many pages × few entities) this collapses pair
    volume by orders of magnitude (sf0.1 derived graph: 6.7M → 135k
    wedges). With ``max_degree`` set the v-side is kept so the
    documented undercount contract stays on ``v``.
    """
    import ray.data as rd

    from .canonicalize import _B, _add_bucket, sum_by_key
    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"u": t.column(u_col).cast(pa.int64()),
                            "v": t.column(v_col).cast(pa.int64())}),
        batch_format="pyarrow")

    if max_degree is None:
        def _sumsq(side: str) -> int:
            deg = sum_by_key(e.map_batches(
                lambda t, s=side: pa.table({
                    s: t.column(s),
                    "one": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"), side, "one", nb=nb,
                out_col="deg")
            part = deg.map_batches(
                lambda t: pa.table({"sq": pa.array([int(pc.sum(
                    pc.multiply(t.column("deg"), t.column("deg"))
                ).as_py() or 0)], pa.int64())}),
                batch_format="pyarrow")
            return int(part.sum("sq") or 0)

        e = e.materialize()
        if _sumsq("u") < _sumsq("v"):
            e = e.map_batches(
                lambda t: pa.table({"u": t.column("v"),
                                    "v": t.column("u")}),
                batch_format="pyarrow")

    if max_degree is not None:
        deg = sum_by_key(
            e.map_batches(
                lambda t: pa.table({
                    "v": t.column("v"),
                    "one": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            "v", "one", nb=nb, out_col="deg")
        e = shuffle_hash_join(e, deg, on=["v"], how="inner", nb=nb)
        e = e.map_batches(
            lambda t, md=int(max_degree): t.filter(
                pc.less_equal(t.column("deg"), md)).select(["u", "v"]),
            batch_format="pyarrow")

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"u1": pa.array([], pa.int64()),
                          "u2": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        s, l, r = _expand_sorted_pairs(g.select(["v", "u"]), "v", "u")
        if len(l) == 0:
            return empty
        u = s.column("u").combine_chunks()
        pt = pa.table({"u1": u.take(pa.array(l)), "u2": u.take(pa.array(r))})
        out = pt.group_by(["u1", "u2"]).aggregate([("u1", "count")])
        return pa.table({"u1": out.column("u1"), "u2": out.column("u2"),
                         "w": out.column("u1_count").cast(pa.int64())})

    pairs = (e.map_batches(
        lambda t: _add_bucket(t, ["v"], nb), batch_format="pyarrow")
        .groupby(_B).map_groups(expand, batch_format="pyarrow"))
    wsum = sum_by_key(pairs, ["u1", "u2"], "w", nb=nb)
    part = wsum.map_batches(
        lambda t: pa.table({"pb": pa.array([int(pc.sum(pc.multiply(
            t.column("w"), pc.subtract(t.column("w"), 1))).as_py() or 0)
            // 2], pa.int64())}),
        batch_format="pyarrow")
    return int(part.sum("pb") or 0)


def multi_source_bfs(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 32,
    max_iters: int = 60,
) -> "ray.data.Dataset":
    """Min-hop distance from EVERY seed (landmark) in ONE frontier
    loop → ``(lm, node, dist)`` for each landmark/reachable-node pair
    (seeds at dist 0 from themselves). The frontier rows are
    ``(lm, node)`` composites, so a single round's bucket shuffle
    carries ALL landmarks' frontiers together — k landmarks cost the
    same number of rounds as one (the per-round volume grows, not the
    round count), which is what makes landmark-based centrality
    estimates affordable at scale vs. k sequential BFS runs.

    Same per-round shape as :func:`bfs_min_depth`: frontier ⋈ edges,
    then ONE fused composite-key min + settled-anti-join shuffle
    (:func:`_subtract_new` on ``(lm, node)``)."""
    import ray.data as rd

    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column(src_col).cast(pa.int64()),
                            "dst": t.column(dst_col).cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    if isinstance(seeds, (list, tuple, np.ndarray)):
        seeds = pa.table({"node": pa.array(
            sorted(set(int(x) for x in seeds)), pa.int64())})
    seeds_ds = rd.from_arrow(seeds) if isinstance(seeds, pa.Table) else seeds

    frontier = seeds_ds.map_batches(
        lambda t: pa.table({
            "lm": t.column("node").cast(pa.int64()),
            "node": t.column("node").cast(pa.int64()),
            "dist": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow").materialize()
    settled = frontier

    for _ in range(max_iters):
        if frontier.count() == 0:
            return settled
        msgs = shuffle_hash_join(
            frontier.map_batches(
                lambda t: t.select(["node", "lm", "dist"])
                .rename_columns(["src", "lm", "dist"]),
                batch_format="pyarrow"),
            e, on=["src"], how="inner", nb=nb)
        msgs = msgs.map_batches(
            lambda t: pa.table({
                "lm": t.column("lm"),
                "node": t.column("dst").cast(pa.int64()),
                "dist": pc.add(t.column("dist").cast(pa.int64()), 1)}),
            batch_format="pyarrow")
        frontier = _subtract_new(msgs, settled, ["lm", "node"], nb,
                                 min_col="dist").materialize()
        settled = settled.union(frontier).materialize()
    raise RuntimeError(
        f"multi_source_bfs did not converge in max_iters={max_iters} "
        "(graph diameter exceeds it) — raise max_iters")


def harmonic_centrality(
    edges,
    landmarks,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 32,
    max_iters: int = 60,
) -> "ray.data.Dataset":
    """Landmark-estimated harmonic centrality → ``(node, harmonic)``
    with ``harmonic(v) = Σ_{lm : d(lm,v)>0} 1 / d(lm, v)`` over the
    given landmark set — the standard sampled estimator (Boldi &
    Vigna's centrality family; exact when ``landmarks`` = all nodes).
    Directed: distances follow edge direction FROM the landmarks
    (pass a symmetrized edge list for the undirected variant).

    One :func:`multi_source_bfs` pass (all landmarks share each
    round's shuffle), then a bucketed ``sum_by_key`` of ``1/dist``
    per node — no per-landmark sequential loops anywhere."""
    from .canonicalize import sum_by_key

    d = multi_source_bfs(edges, landmarks, src_col=src_col,
                         dst_col=dst_col, nb=nb, max_iters=max_iters)

    def inv(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t.column("dist"), 0))
        return pa.table({
            "node": pos.column("node"),
            "h": pc.divide(pa.scalar(1.0),
                           pos.column("dist").cast(pa.float64()))})

    return sum_by_key(
        d.map_batches(inv, batch_format="pyarrow"),
        "node", "h", nb=nb, out_col="harmonic",
    ).map_batches(
        lambda t: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "harmonic": pc.round(t.column("harmonic"), 6)}),
        batch_format="pyarrow")


def construct_triples(
    triples: "ray.data.Dataset",
    where: "list[tuple[str, str, str]]",
    template: "list[tuple[str, str, str]]",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    nb: int = 32,
    optional: "list | None" = None,
    filters: "list[tuple[str, str, object]] | None" = None,
) -> "ray.data.Dataset":
    """SPARQL-style CONSTRUCT: match the ``where`` BGP
    (:func:`match_bgp`, including OPTIONAL groups and FILTERs), then
    instantiate each ``template`` triple pattern once per binding row
    — the KG-to-KG rewrite primitive (schema alignment, inverse-edge
    materialization, rdf:type fan-out) that turns extraction output
    into a target vocabulary.

    SPARQL semantics: the result is a SET of triples —
    template instantiations dedupe exactly on (subj, pred, obj) —
    and a template triple whose variable is unbound in a row (an
    OPTIONAL miss) is silently skipped for that row. Template
    instantiation is one vectorized projection per template entry
    (constants broadcast, variables select binding columns); dedup is
    the bucketed :func:`~.canonicalize.dedup_exact`.
    """
    from .canonicalize import dedup_exact

    def is_var(t: str) -> bool:
        return isinstance(t, str) and t.startswith("?")

    bindings = match_bgp(triples, where, s_col=s_col, p_col=p_col,
                         o_col=o_col, nb=nb, optional=optional,
                         filters=filters)
    bound = set(bindings.schema().names)
    for tp in template:
        for t in tp:
            if is_var(t) and t[1:] not in bound:
                raise ValueError(
                    f"template variable {t!r} is not bound by the"
                    " where clause")

    def instantiate(batch: pa.Table) -> pa.Table:
        outs = []
        for tp in template:
            cols, mask = [], None
            for t in tp:
                if is_var(t):
                    c = batch.column(t[1:])
                    m = pc.is_valid(c)
                    mask = m if mask is None else pc.and_(mask, m)
                    cols.append(c)
                else:
                    cols.append(pa.array([t] * batch.num_rows,
                                         pa.string()))
            t3 = pa.table({"subj": cols[0], "pred": cols[1],
                           "obj": cols[2]})
            outs.append(t3.filter(mask) if mask is not None else t3)
        return pa.concat_tables(outs)

    inst = bindings.map_batches(instantiate, batch_format="pyarrow",
                                batch_size=65536)
    return dedup_exact(inst, ["subj", "pred", "obj"], nb=nb)


def eccentricity(
    edges,
    landmarks,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 32,
    max_iters: int = 60,
) -> "ray.data.Dataset":
    """Per-landmark eccentricity → ``(lm, ecc)`` where ``ecc`` is the
    max min-hop distance from the landmark to any node it reaches —
    one :func:`multi_source_bfs` pass shared by all landmarks; the
    max over the returned table is the standard diameter LOWER bound
    (and ≤ 2×ecc(lm) the upper bound) used to size iterative-op
    round budgets before running them at scale."""
    d = multi_source_bfs(edges, landmarks, src_col=src_col,
                         dst_col=dst_col, nb=nb, max_iters=max_iters)

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by(["lm"]).aggregate([("dist", "max")])
        return pa.table({"lm": g.column("lm"),
                         "ecc_p": g.column("dist_max")})

    from .canonicalize import _B, _add_bucket

    def finish(g: pa.Table) -> pa.Table:
        t = g.drop_columns([_B])
        out = t.group_by(["lm"]).aggregate([("ecc_p", "max")])
        return pa.table({"lm": out.column("lm").cast(pa.int64()),
                         "ecc": out.column("ecc_p_max").cast(pa.int64())})

    return (d.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)
            .map_batches(lambda t: _add_bucket(t, ["lm"], nb),
                         batch_format="pyarrow")
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def _edge_support(e, nb: int):
    """Per-edge triangle support over a value-oriented (``a < b``)
    DISTINCT edge list: enumerate each triangle once via the
    chain-wedge join (a,b)⋈(b,c) closed by an inner join on (a,c),
    then scatter +1 to the triangle's three edges and combine with
    one composite-key ``sum_by_key``. Edges in no triangle get NO
    row (support 0) — callers left-join accordingly."""
    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    wedges = shuffle_hash_join(
        e, e.map_batches(lambda t: t.rename_columns(["b", "c"]),
                         batch_format="pyarrow"),
        on=["b"], how="inner", nb=nb)
    tri = shuffle_hash_join(
        wedges, e.map_batches(lambda t: t.rename_columns(["a", "c"])
                              .append_column("_hit", pa.array(
                                  np.ones(t.num_rows, np.int8))),
                              batch_format="pyarrow"),
        on=["a", "c"], how="inner", nb=nb)

    def scatter(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        c = t.column("c").combine_chunks()
        return pa.table({
            "a": pa.concat_arrays([a, b.cast(pa.int64()), a]),
            "b": pa.concat_arrays([b.cast(pa.int64()), c.cast(pa.int64()),
                                   c.cast(pa.int64())]),
            "one": pa.array(np.ones(3 * t.num_rows, np.int64))})

    return sum_by_key(
        tri.map_batches(scatter, batch_format="pyarrow"),
        ["a", "b"], "one", nb=nb, out_col="support")


def ktruss(
    edges,
    k: int,
    a_col: str = "a",
    b_col: str = "b",
    nb: int = 32,
    max_rounds: int = 100,
) -> "ray.data.Dataset":
    """k-truss decomposition — iteratively peel EDGES whose triangle
    support is < k−2 from an undirected simple graph (DISTINCT edges,
    ``a < b``) until a fixpoint; returns the surviving
    ``(a, b, support)`` rows with support measured INSIDE the truss.
    The edge-level tightening of :func:`kcore` (every k-truss is a
    (k−1)-core), standard for mining near-clique link-farm /
    co-citation cores out of web graphs.

    Per round: one triangle enumeration (chain-wedge join + closing
    join — the :func:`triangle_count` shape, value orientation) feeds
    a composite-key ``sum_by_key`` support census; a semi join keeps
    qualifying edges. Rounds are bucketed shuffles end to end; a
    non-converged peel raises (it would be silently wrong).
    Skew note: value orientation bounds wedge volume by Σ deg² of
    LOW-id endpoints — for adversarially skewed graphs re-key ids by
    a hash first (the standard salt for this operator family).
    """
    import ray.data as rd

    from .join import shuffle_hash_join

    if k < 3:
        raise ValueError("k must be >= 3 (a 3-truss is any triangle)")
    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"a": t.column(a_col).cast(pa.int64()),
                            "b": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})

    for _ in range(max_rounds):
        if e.count() == 0:
            return rd.from_arrow(empty)
        sup = _edge_support(e, nb).materialize()
        good = sup.map_batches(
            lambda t, kk=k: t.filter(
                pc.greater_equal(t.column("support"), kk - 2)),
            batch_format="pyarrow").materialize()
        if good.count() == e.count():
            return good
        if good.count() == 0:
            return rd.from_arrow(empty)
        e = shuffle_hash_join(
            e, good.map_batches(lambda t: t.select(["a", "b"]),
                                batch_format="pyarrow"),
            on=["a", "b"], how="semi", nb=nb).materialize()
    raise RuntimeError(
        f"ktruss: no fixpoint within max_rounds={max_rounds}")


def transitive_closure_incremental(
    closure: "ray.data.Dataset",
    new_edges,
    all_edges,
    node_t: "pa.DataType | None" = None,
    nb: int = 32,
    max_iters: int = 40,
) -> "ray.data.Dataset":
    """Incremental closure maintenance for edge INSERTS — the nightly
    KG-update path that avoids recomputing the full
    :func:`transitive_closure` when an ontology grows: given the
    existing closure of E (``closure``, (node, anc) pairs), the newly
    inserted edges ΔE (``new_edges``, (child, parent)), and the full
    post-insert edge set E∪ΔE (``all_edges``), returns the closure of
    E∪ΔE.

    Semi-naive delta seeding: every new fact uses ≥1 new edge, so the
    round-0 frontier is ``ΔE ∪ (closure ∘ ΔE)`` — ONE join of the old
    closure against only the new edges (|C|-proportional, not
    |C|·|E|); rounds then extend the frontier one hop through the
    FULL edge set with the same fused dedup+anti-join shuffle as the
    from-scratch operator. Work is proportional to the NEW facts, not
    the closure. Cycles introduced by ΔE derive a self-pair and raise
    (same contract as transitive_closure)."""
    import ray.data as rd

    from .join import shuffle_hash_join

    new_ds = (rd.from_arrow(new_edges)
              if isinstance(new_edges, pa.Table) else new_edges)
    all_ds = (rd.from_arrow(all_edges)
              if isinstance(all_edges, pa.Table) else all_edges)
    nt = node_t or pa.int64()
    # pin the old closure once — it anchors the lazy per-round
    # ``total`` union, which would otherwise re-execute a lazy
    # caller-supplied closure every round
    closure = (rd.from_arrow(closure)
               if isinstance(closure, pa.Table) else closure).materialize()

    def proj(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("child").cast(nt),
                         "anc": t.column("parent").cast(nt)})

    ne = new_ds.map_batches(proj, batch_format="pyarrow").materialize()
    e = all_ds.map_batches(proj, batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(["anc", "new_anc"]),
        batch_format="pyarrow").materialize()

    def _check(t: pa.Table, a: str, b: str) -> pa.Table:
        return _closure_cycle_check(
            t, a, b, "transitive_closure_incremental")

    # seed: ΔE itself plus old-closure paths extended by one new edge
    ext = shuffle_hash_join(
        closure, ne.map_batches(
            lambda t: t.rename_columns(["anc", "new_anc"]),
            batch_format="pyarrow"),
        on=["anc"], how="inner", nb=nb).map_batches(
        lambda t: _check(t, "node", "new_anc"), batch_format="pyarrow")
    def _mat(ds):
        return _closure_mat(ds, "transitive_closure_incremental")

    seed = ne.map_batches(lambda t: _check(t, "node", "anc"),
                          batch_format="pyarrow").union(ext)
    delta = _mat(_subtract_new(seed, closure, ["node", "anc"], nb,
                               key_type=nt))
    total = closure.union(delta)

    for _ in range(max_iters):
        if delta.count() == 0:
            return total
        hop = shuffle_hash_join(delta, e, on=["anc"], how="inner",
                                nb=nb).map_batches(
            lambda t: _check(t, "node", "new_anc"),
            batch_format="pyarrow")
        delta = _mat(_subtract_new(hop, total, ["node", "anc"], nb,
                                   key_type=nt))
        # lazy flat union of materialized deltas — one fewer
        # execution per round; consumers concatenate block lists
        total = total.union(delta)
    raise RuntimeError(
        "transitive_closure_incremental did not converge in "
        f"max_iters={max_iters}")


def mine_rules(
    triples: "ray.data.Dataset",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    min_support: int = 1,
    nb: int = 32,
) -> "ray.data.Dataset":
    """AMIE-lite 2-hop rule mining (Galárraga et al. 2013, public):
    for every chain rule ``p1(x,y) ∧ p2(y,z) ⇒ p3(x,z)`` report

    - ``body_pairs``: #distinct (x, z) connected by a (p1, p2) path,
    - ``support``: #those pairs where ``p3(x, z)`` is in the KG,
    - ``conf``: support / body_pairs (standard CWA confidence),
    - ``head_coverage``: support / #pairs of p3.

    The KG-completion miner a construction pipeline runs AFTER
    canonicalization to propose missing facts. Shape: set-semantics
    dedup → ONE mid-node bucket join (the only |E|-scale shuffle) →
    distinct body pairs (exact dedup, bucketed) → one (x, z) join
    against the head set → tiny per-rule ``sum_by_key`` censuses.
    The rule table itself is O(#predicates³) — broadcast-small — so
    the final confidence joins run over kilobytes."""
    from .canonicalize import dedup_exact, sum_by_key
    from .join import shuffle_hash_join

    def _sel(t: pa.Table, mapping: "list[tuple[str, str]]") -> pa.Table:
        return pa.table({new: t.column(old) for old, new in mapping})

    T = dedup_exact(
        triples.map_batches(
            lambda t: _sel(t, [(s_col, "subj"), (p_col, "pred"),
                               (o_col, "obj")]),
            batch_format="pyarrow"),
        ["subj", "pred", "obj"], nb=nb)

    left = T.map_batches(
        lambda t: _sel(t, [("subj", "x"), ("pred", "p1"), ("obj", "y")]),
        batch_format="pyarrow")
    right = T.map_batches(
        lambda t: _sel(t, [("subj", "y"), ("pred", "p2"), ("obj", "z")]),
        batch_format="pyarrow")
    body = dedup_exact(
        shuffle_hash_join(left, right, on=["y"], how="inner", nb=nb)
        .map_batches(lambda t: t.select(["p1", "p2", "x", "z"]),
                     batch_format="pyarrow"),
        ["p1", "p2", "x", "z"], nb=nb)

    def _one(t: pa.Table, cols: list[str]) -> pa.Table:
        return t.select(cols).append_column(
            "n", pa.array(np.ones(t.num_rows, np.int64)))

    body_n = sum_by_key(
        body.map_batches(lambda t: _one(t, ["p1", "p2"]),
                         batch_format="pyarrow"),
        ["p1", "p2"], "n", nb=nb, out_col="body_pairs")

    heads = T.map_batches(
        lambda t: _sel(t, [("subj", "x"), ("pred", "p3"), ("obj", "z")]),
        batch_format="pyarrow")
    supp = sum_by_key(
        shuffle_hash_join(body, heads, on=["x", "z"], how="inner",
                          nb=nb)
        .map_batches(lambda t: _one(t, ["p1", "p2", "p3"]),
                     batch_format="pyarrow"),
        ["p1", "p2", "p3"], "n", nb=nb, out_col="support")
    head_n = sum_by_key(
        heads.map_batches(lambda t: _one(t, ["p3"]),
                          batch_format="pyarrow"),
        ["p3"], "n", nb=nb, out_col="head_pairs")

    out = shuffle_hash_join(
        shuffle_hash_join(supp, body_n, on=["p1", "p2"], how="inner",
                          nb=nb),
        head_n, on=["p3"], how="inner", nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("support"),
                                      pa.scalar(min_support)))
        sup = t.column("support").cast(pa.float64())
        return pa.table({
            "p1": t.column("p1"), "p2": t.column("p2"),
            "p3": t.column("p3"),
            "body_pairs": t.column("body_pairs").cast(pa.int64()),
            "support": t.column("support").cast(pa.int64()),
            "conf": pc.round(pc.divide(
                sup, t.column("body_pairs").cast(pa.float64())), 6),
            "head_coverage": pc.round(pc.divide(
                sup, t.column("head_pairs").cast(pa.float64())), 6),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def random_walks(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    walk_len: int = 3,
    walks_per_node: int = 1,
    seed: int = 7,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Seeded DETERMINISTIC random walks — the corpus-prep step for
    DeepWalk/node2vec-style graph embeddings (Perozzi et al. 2014,
    public), made reproducible so a failed 100-TB job re-runs to the
    identical corpus: the step-t choice out of node v on walk r is
    ``md5(f"{v}:{r}:{t}:{seed}") mod outdeg(v)`` (the repo's
    cross-system md5 uniform, ``functions/hashing.py::md5_u32``),
    taking that rank in the dst-sorted DISTINCT-neighbor list. Output
    is the walk corpus in long format ``(start, walk, step, node)``
    with step 0 = the start node; walks start from every node with
    out-edges and stop early at sinks.

    Shape: one bucketed rank/degree pass over the deduped edge set
    (per-src-bucket sort + numpy run offsets), then TWO bucketed
    joins per step (frontier⋈degree to draw the choice, ⋈adjacency on
    (node, rank) to step) — 2·walk_len shuffles total, no per-row
    Python beyond the md5 draw itself, no driver materialization."""
    from ..functions.hashing import md5_u32
    from .canonicalize import _B, _add_bucket, dedup_exact
    from .join import shuffle_hash_join

    def _sel(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src_col),
                         "dst": t.column(dst_col)})

    E = dedup_exact(edges.map_batches(_sel, batch_format="pyarrow"),
                    ["src", "dst"], nb=nb)

    def rank_group(g: pa.Table) -> pa.Table:
        t = g.select(["src", "dst"]).sort_by(
            [("src", "ascending"), ("dst", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({
                "src": t.column("src"), "dst": t.column("dst"),
                "rank": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64())})
        arr = t.column("src").to_pandas().to_numpy()
        starts = np.r_[True, arr[1:] != arr[:-1]]
        run_id = np.cumsum(starts) - 1
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.r_[start_idx, n])
        return pa.table({
            "src": t.column("src"), "dst": t.column("dst"),
            "rank": pa.array((np.arange(n) - start_idx[run_id])
                             .astype(np.int64)),
            "deg": pa.array(counts[run_id].astype(np.int64))})

    adj = (E.map_batches(lambda t: _add_bucket(t, ["src"], nb),
                         batch_format="pyarrow")
           .groupby(_B).map_groups(rank_group, batch_format="pyarrow")
           .map_batches(lambda t: pa.table({
               "node": t.column("src"), "next": t.column("dst"),
               "rank": t.column("rank"), "deg": t.column("deg")}),
               batch_format="pyarrow")
           .materialize())
    deg_tbl = adj.map_batches(
        lambda t: t.filter(pc.equal(t.column("rank"), 0))
        .select(["node", "deg"]), batch_format="pyarrow")
    adj_j = adj.map_batches(lambda t: t.select(["node", "rank", "next"]),
                            batch_format="pyarrow")

    def fan(t: pa.Table, w=walks_per_node) -> pa.Table:
        node = t.column("node")
        idx = pa.array(np.repeat(np.arange(t.num_rows), w))
        walk = pa.array(np.tile(np.arange(w, dtype=np.int64),
                                t.num_rows))
        n = node.take(idx)
        return pa.table({"start": n, "walk": walk, "node": n})

    frontier = deg_tbl.map_batches(fan, batch_format="pyarrow")

    def emit(t: pa.Table, step: int) -> pa.Table:
        return pa.table({
            "start": t.column("start"), "walk": t.column("walk"),
            "step": pa.array(np.full(t.num_rows, step, np.int64)),
            "node": t.column("node")})

    acc = frontier.map_batches(lambda t: emit(t, 0),
                               batch_format="pyarrow")
    for t_step in range(1, walk_len + 1):
        j = shuffle_hash_join(frontier, deg_tbl, on=["node"],
                              how="inner", nb=nb)
        # an emptied intermediate loses its schema and can't feed the
        # (node, rank) join — stop as soon as every walk has ended

        def choose(t: pa.Table, ts=t_step) -> pa.Table:
            keys = [f"{n}:{r}:{ts}:{seed}" for n, r in
                    zip(t.column("node").to_pylist(),
                        t.column("walk").to_pylist())]
            ch = (md5_u32(keys)
                  % t.column("deg").to_numpy(zero_copy_only=False))
            return pa.table({
                "start": t.column("start"), "walk": t.column("walk"),
                "node": t.column("node"),
                "rank": pa.array(ch.astype(np.int64))})

        picked = j.map_batches(choose,
                               batch_format="pyarrow").materialize()
        if picked.count() == 0:
            break
        stepped = shuffle_hash_join(
            picked, adj_j, on=["node", "rank"], how="inner",
            nb=nb).map_batches(
            lambda t: pa.table({"start": t.column("start"),
                                "walk": t.column("walk"),
                                "node": t.column("next")}),
            batch_format="pyarrow").materialize()
        acc = acc.union(stepped.map_batches(
            lambda t, ts=t_step: emit(t, ts), batch_format="pyarrow"))
        frontier = stepped
    return acc


def resolve_conflicts(
    triples: "ray.data.Dataset",
    functional_preds: "list[str]",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    score_col: str = "score",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Functional-property conflict resolution — the KG-QA merge when
    a predicate admits ONE object per subject (bornIn, capitalOf) but
    extraction produced several: noisy-OR fuse per candidate
    (:func:`fuse_triple_confidence`), then per (subj, pred) keep the
    max-confidence object (ties → lexically smallest obj, so recovery
    reruns pick the same winner) and report ``n_values`` (#competing
    objects) and ``margin`` (winner conf − runner-up conf, 0 when
    uncontested) — the audit columns a curator triages by.

    Shape: one fused bucket pass + ONE (subj, pred) bucket shuffle
    with a numpy run-geometry finisher — no sort-based groupby, no
    per-row Python."""
    from .canonicalize import _B, _add_bucket

    keep = pa.array(sorted(functional_preds), pa.string())
    fused = fuse_triple_confidence(
        triples, s_col=s_col, p_col=p_col, o_col=o_col,
        score_col=score_col, nb=nb).map_batches(
        lambda t: t.filter(pc.is_in(t.column("pred"), value_set=keep)),
        batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        t = g.select(["subj", "pred", "obj", "conf"]).sort_by(
            [("subj", "ascending"), ("pred", "ascending"),
             ("conf", "descending"), ("obj", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({
                "subj": t.column("subj"), "pred": t.column("pred"),
                "obj": t.column("obj"), "conf": t.column("conf"),
                "n_values": pa.array([], pa.int64()),
                "margin": pa.array([], pa.float64())})
        k1 = t.column("subj").to_pandas().to_numpy()
        k2 = t.column("pred").to_pandas().to_numpy()
        starts = np.r_[True, (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])]
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.r_[start_idx, n])
        conf = t.column("conf").to_numpy(zero_copy_only=False)
        winner = conf[start_idx]
        second = np.where(counts > 1,
                          conf[np.minimum(start_idx + 1, n - 1)],
                          winner)
        sel = pa.array(start_idx)
        return pa.table({
            "subj": t.column("subj").take(sel),
            "pred": t.column("pred").take(sel),
            "obj": t.column("obj").take(sel),
            "conf": pa.array(winner),
            "n_values": pa.array(counts.astype(np.int64)),
            "margin": pa.array(np.round(winner - second, 6))})

    return (fused.map_batches(
        lambda t: _add_bucket(t, ["subj", "pred"], nb),
        batch_format="pyarrow")
        .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def _min_with_old(msgs, cur, nb: int, node_col: str = "node",
                  val_col: str = "color"):
    """One-bucket-shuffle relax step shared by the iterative label
    operators (scc coloring, temporal arrival, distance relaxation):
    per node, ``val`` = min over candidates (messages ∪ the node's
    current value) and ``old`` = the current value, in the SAME
    map-side-combined aggregate — so the per-round convergence check
    (``val != old``, null old = newly discovered) is a lazy filter
    over this one materialized result instead of a second join
    shuffle, and the updated label table is a lazy select of it
    (no anti-join ∪ frontier rebuild). All-Arrow (group_by min/max;
    ``old`` rides as a null-masked column with exactly one non-null
    per node), so the output schema is known by construction."""
    from .canonicalize import _B, _add_bucket
    from .util import map_known

    def tag(is_old: bool):
        def f(t: pa.Table) -> pa.Table:
            c = t.column(val_col)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            old = c if is_old else pa.nulls(len(t), c.type)
            return pa.table({node_col: t.column(node_col),
                             val_col: c, "old": old})
        return f

    def agg(t: pa.Table) -> pa.Table:
        g = (t.select([node_col, val_col, "old"])
             .group_by([node_col]).aggregate([(val_col, "min"),
                                              ("old", "max")]))
        return pa.table({node_col: g.column(node_col),
                         val_col: g.column(f"{val_col}_min"),
                         "old": g.column("old_max")})

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(agg(batch), [node_col], nb)

    def finish(group: pa.Table) -> pa.Table:
        return agg(group)

    tagged = map_known(msgs, tag(False)).union(
        map_known(cur, tag(True)))
    out = (tagged.map_batches(local, batch_format="pyarrow",
                              batch_size=65536)
           .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    from .util import cheap_arrow_schema, with_schema
    csch = cheap_arrow_schema(cur)
    if csch is not None:
        ct = csch.field(val_col).type
        with_schema(out, pa.schema([
            pa.field(node_col, csch.field(node_col).type),
            pa.field(val_col, ct), pa.field("old", ct)]))
    return out


def _min_color_with_old(msgs, colors, nb: int):
    """scc's coloring step — see :func:`_min_with_old`."""
    return _min_with_old(msgs, colors, nb, "node", "color")


def _scc_local(E: "pa.Table") -> "pa.Table":
    """Iterative Tarjan over a DRIVER-LOCAL edge table — the bounded
    local finish of :func:`scc`'s hybrid: when the live core fits
    under ``local_cutoff_edges``, dozens of per-round Ray executions
    collapse into one O(V+E) pass. Labels are component-min node ids
    (identical to the distributed contract; parity-tested)."""
    src = E.column("src").to_pylist()
    dst = E.column("dst").to_pylist()
    adj: "dict[object, list]" = {}
    nodes_set = set()
    # SQL join semantics, matching the distributed phases: an edge
    # with a NULL endpoint never matches any join, so it contributes
    # its endpoints as nodes but is never traversable — a null node
    # settles as its own singleton (scc = null), exactly like the
    # trim/settle path with null keys
    for u, v in zip(src, dst):
        if u is not None and v is not None:
            adj.setdefault(u, []).append(v)
        nodes_set.add(u)
        nodes_set.add(v)
    index: "dict[object, int]" = {}
    low: "dict[object, int]" = {}
    on_stack: "set" = set()
    stack: "list" = []
    label: "dict[object, object]" = {}
    counter = [0]
    # None-safe total order (null sorts first, like the bucket sort)
    def _k(x):
        return (x is None, x)

    for root in sorted(nodes_set, key=_k):
        if root in index:
            continue
        # explicit work stack: (node, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp, key=_k)
                for w in comp:
                    label[w] = m
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    ns = sorted(nodes_set, key=_k)
    node_arr = pa.array(ns, E.schema.field("src").type)
    return pa.table({"node": node_arr,
                     "scc": pa.array([label[n] for n in ns],
                                     E.schema.field("src").type)})


def scc(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
    nb: int = 32,
    local_cutoff_edges: int = 200_000,
) -> "ray.data.Dataset":
    """Strongly connected components of a directed graph — the
    coloring algorithm (Orzan 2004 / FW-BW family, public), the
    missing sibling of the undirected ``graph_components``: each
    phase (1) TRIMS nodes with no in- or out-edge in the live
    subgraph (singleton SCCs — a DAG peels away entirely, so trivial
    components never cost a coloring round), (2) propagates the MIN
    ancestor id forward to fixpoint (colors), (3) marks nodes that
    can reach their color's root BACKWARD within the color class —
    exactly the root's SCC — and settles them. ``scc`` ids are the
    component-min node ids, so output is recovery-deterministic.

    Every step is the repo's bucket plan (sum_by_key censuses +
    bucketed hash joins); per-phase cost is proportional to the LIVE
    subgraph. Raises after ``max_rounds`` phases/trim/fixpoint rounds
    (a non-converged SCC labeling would be silently wrong)."""
    from .canonicalize import dedup_exact, sum_by_key
    from .join import shuffle_hash_join
    from .util import cheap_arrow_schema, map_known, with_schema
    from .util import strip_stats as _strip

    def _sel(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src_col),
                         "dst": t.column(dst_col)})

    E = dedup_exact(edges.map_batches(_sel, batch_format="pyarrow"),
                    ["src", "dst"], nb=nb).materialize()
    if E.count() == 0:
        raise ValueError("scc: empty edge set")
    if local_cutoff_edges and E.count() <= local_cutoff_edges:
        # hybrid local finish: the deduped edge set fits the bound, so
        # ONE bounded driver-side Tarjan pass replaces dozens of
        # trim/color/mark executor rounds (identical labels —
        # parity-tested); the distributed phases below remain the
        # 100-TB path (local_cutoff_edges=0 forces them)
        import ray
        import ray.data as rd
        flat = pa.concat_tables(
            [ray.get(r) for r in E.to_arrow_refs()])
        return rd.from_arrow(_scc_local(flat.combine_chunks()))
    nodes = dedup_exact(
        E.map_batches(lambda t: pa.table({"node": t.column("src")}),
                      batch_format="pyarrow")
        .union(E.map_batches(
            lambda t: pa.table({"node": t.column("dst")}),
            batch_format="pyarrow")),
        ["node"], nb=nb).materialize()
    if nodes.count() == 0:
        raise ValueError("scc: empty edge set")
    # node id type (int64 graph ids or raw string KG terms) — every
    # per-round lazy dataset below is schema-annotated with it so no
    # join pays a schema-fetch execution (the per-round fixed cost
    # that used to dominate this operator)
    _T = cheap_arrow_schema(E).field("src").type
    _sch_nc = pa.schema([pa.field("node", _T), pa.field("color", _T)])
    settled = None  # Dataset (node, scc)

    def _one(t: pa.Table, cols: list[str]) -> pa.Table:
        return t.select(cols).append_column(
            "n", pa.array(np.ones(t.num_rows, np.int64)))

    def _settle(part: "ray.data.Dataset"):
        nonlocal settled
        settled = part if settled is None else settled.union(part)

    for _phase in range(max_rounds):
        if nodes.count() == 0:
            return settled.materialize()
        # ---- trim to the 1-in-1-out core: live = src(E) ∩ dst(E)
        # (a node has an out-edge iff it appears as a src, an in-edge
        # iff as a dst), E keeps edges with BOTH endpoints live —
        # ONE materialize per peel round, fixpoint when the edge
        # count stops shrinking; the peeled remainder settles as
        # singleton SCCs in one lazy piece after the loop.
        _sch_n = pa.schema([pa.field("node", _T)])
        for _trim in range(max_rounds + 1):
            if _trim == max_rounds:
                raise RuntimeError(
                    f"scc: trim did not converge in {max_rounds}")
            if E.count() == 0:
                break
            # per-batch unique is enough on both sides: semi-join
            # probe/build sides tolerate duplicates, so the global
            # dedup shuffles are dead weight — map-side unique keeps
            # the wire volume ≤ distinct-per-batch at zero extra
            # stages
            srcs_d = map_known(E, lambda t: pa.table(
                {"node": pc.unique(t.column("src").combine_chunks())}))
            dsts_d = map_known(E, lambda t: pa.table(
                {"node": pc.unique(t.column("dst").combine_chunks())}))
            live = shuffle_hash_join(
                srcs_d, dsts_d, on=["node"], how="semi", nb=nb)
            E2 = shuffle_hash_join(
                shuffle_hash_join(E, map_known(
                    live, lambda t: t.rename_columns(["src"])),
                    on=["src"], how="semi", nb=nb),
                map_known(live, lambda t: t.rename_columns(["dst"])),
                on=["dst"], how="semi", nb=nb).materialize()
            _strip(E2)
            done = E2.count() == E.count()
            E = E2
            if done:
                break
        live_nodes = with_schema(dedup_exact(
            map_known(E, lambda t: pa.table(
                {"node": t.column("src")}))
            .union(map_known(E, lambda t: pa.table(
                {"node": t.column("dst")}))),
            ["node"], nb=nb), _sch_n)
        # everything not in the trimmed core is a singleton SCC
        _settle(map_known(shuffle_hash_join(
            nodes, live_nodes, on=["node"], how="anti", nb=nb),
            lambda t: pa.table({"node": t.column("node"),
                                "scc": t.column("node")})))
        nodes = _strip(live_nodes.materialize())
        if nodes.count() == 0:
            return settled.materialize()
        # ---- forward min-ancestor coloring to fixpoint
        colors = with_schema(map_known(
            nodes, lambda t: pa.table({"node": t.column("node"),
                                       "color": t.column("node")})),
            _sch_nc)
        for _it in range(max_rounds + 1):
            if _it == max_rounds:
                raise RuntimeError(
                    f"scc: coloring did not converge in {max_rounds}")
            msgs = map_known(shuffle_hash_join(
                E, map_known(colors, lambda t: pa.table(
                    {"src": t.column("node"),
                     "color": t.column("color")})),
                on=["src"], how="inner", nb=nb),
                lambda t: pa.table({"node": t.column("dst"),
                                    "color": t.column("color")}))
            # pointer-doubling shortcut: color(color(v)) is a valid
            # candidate (u reaches v and w reaches u ⟹ w reaches v),
            # so reach doubles per round — O(log depth) rounds
            sc = map_known(shuffle_hash_join(
                map_known(colors, lambda t: pa.table(
                    {"node": t.column("node"),
                     "mid": t.column("color")})),
                map_known(colors, lambda t: pa.table(
                    {"mid": t.column("node"),
                     "color2": t.column("color")})),
                on=["mid"], how="inner", nb=nb),
                lambda t: pa.table({"node": t.column("node"),
                                    "color": t.column("color2")}))
            # min + current color in ONE shuffle; the convergence
            # check is a lazy filter over this materialized result
            delta = _strip(_min_color_with_old(
                msgs.union(sc), colors, nb).materialize())
            changed = delta.map_batches(
                lambda t: t.filter(pc.not_equal(t.column("color"),
                                                t.column("old"))),
                batch_format="pyarrow")
            colors = with_schema(map_known(
                delta, lambda t: t.select(["node", "color"])),
                _sch_nc)
            if changed.count() == 0:
                break
        # ---- backward mark from color roots within the color class
        marked = map_known(colors, lambda t: t.filter(
            pc.equal(t.column("node"), t.column("color"))))
        frontier = marked
        for _it in range(max_rounds + 1):
            if _it == max_rounds:
                raise RuntimeError(
                    f"scc: backward mark did not converge in "
                    f"{max_rounds}")
            preds = map_known(shuffle_hash_join(
                E, map_known(frontier, lambda t: pa.table(
                    {"dst": t.column("node"),
                     "color": t.column("color")})),
                on=["dst"], how="inner", nb=nb),
                lambda t: pa.table({"node": t.column("src"),
                                    "color": t.column("color")}))
            # keep only predecessors of the SAME color, not yet marked
            cand = map_known(shuffle_hash_join(
                with_schema(dedup_exact(preds, ["node", "color"],
                                        nb=nb), _sch_nc),
                map_known(colors, lambda t: t.rename_columns(
                    ["node", "c2"])),
                on=["node"], how="inner", nb=nb),
                lambda t: t.filter(pc.equal(t.column("color"),
                                            t.column("c2")))
                .select(["node", "color"]))
            fresh = shuffle_hash_join(
                cand, marked, on=["node"], how="anti",
                nb=nb).materialize()
            _strip(fresh)
            if fresh.count() == 0:
                break
            marked = with_schema(marked.union(fresh), _sch_nc)
            frontier = fresh
        _settle(map_known(marked, lambda t: pa.table(
            {"node": t.column("node"),
             "scc": t.column("color")})))
        # ---- remove settled nodes and their edges, next phase
        nodes = shuffle_hash_join(nodes, marked, on=["node"],
                                  how="anti", nb=nb).materialize()
        _strip(nodes)
        if nodes.count() == 0:
            return settled.materialize()
        E = shuffle_hash_join(
            shuffle_hash_join(E, map_known(
                nodes, lambda t: t.rename_columns(["src"])),
                on=["src"], how="semi", nb=nb),
            map_known(nodes, lambda t: t.rename_columns(["dst"])),
            on=["dst"], how="semi", nb=nb).materialize()
        _strip(E)
    raise RuntimeError(f"scc did not converge in {max_rounds} phases")


def cocitation(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    mode: str = "cocite",
    min_common: int = 1,
    max_degree: "int | None" = None,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Co-citation / bibliographic-coupling counts over a DIRECTED
    graph (Small 1973 / Kessler 1963, public) — the link-similarity
    signals of citation and web-link analysis: ``cocite(a, b)`` =
    #pages linking to BOTH a and b (common in-neighbors),
    ``couple(a, b)`` = #pages a and b BOTH link to (common
    out-neighbors). The directed siblings of
    :func:`node_similarity`'s undirected common-neighbor count.

    Shape: dedup edges → per-MID bucketed vectorized pair expansion
    (mid = the citing page for cocite, the cited page for couple;
    volume Σ deg(mid)², ``max_degree`` hub cut skips super-mids) →
    one composite-key ``sum_by_key``. Returns (a, b, common), a < b,
    common ≥ ``min_common``."""
    from .canonicalize import _B, _add_bucket, dedup_exact, sum_by_key
    from .join import shuffle_hash_join

    if mode not in ("cocite", "couple"):
        raise ValueError("cocitation: mode is 'cocite' or 'couple'")
    mid_col, n_col = ((src_col, dst_col) if mode == "cocite"
                      else (dst_col, src_col))

    E = dedup_exact(
        edges.map_batches(
            lambda t: pa.table({"mid": t.column(mid_col),
                                "n": t.column(n_col)}),
            batch_format="pyarrow"),
        ["mid", "n"], nb=nb)
    if max_degree is not None:
        deg = sum_by_key(E.map_batches(
            lambda t: pa.table({
                "mid": t.column("mid"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"), "mid", "one", nb=nb,
            out_col="deg")
        E = shuffle_hash_join(E, deg, on=["mid"], how="inner",
                              nb=nb).map_batches(
            lambda t, md=int(max_degree): t.filter(
                pc.less_equal(t.column("deg"), md))
            .select(["mid", "n"]), batch_format="pyarrow")

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": g.column("n").slice(0, 0),
                          "b": g.column("n").slice(0, 0),
                          "common": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        s, l, r = _expand_sorted_pairs(g.select(["mid", "n"]), "mid", "n")
        if len(l) == 0:
            return empty
        n_arr = s.column("n").combine_chunks()
        pt = pa.table({"a": n_arr.take(pa.array(l)),
                       "b": n_arr.take(pa.array(r))})
        out = pt.group_by(["a", "b"]).aggregate([("a", "count")])
        return pa.table({"a": out.column("a"), "b": out.column("b"),
                         "common": out.column("a_count").cast(pa.int64())})

    pairs = (E.map_batches(lambda t: _add_bucket(t, ["mid"], nb),
                           batch_format="pyarrow")
             .groupby(_B).map_groups(expand, batch_format="pyarrow"))
    out = sum_by_key(pairs, ["a", "b"], "common", nb=nb)
    return out.map_batches(
        lambda t, mc=int(min_common): t.filter(
            pc.greater_equal(t.column("common"), mc)),
        batch_format="pyarrow")


def contract_graph(
    edges: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    label_col: str = "lab",
    self_loops: bool = False,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Contract a graph by a node→label mapping (community, SCC,
    page-equivalence class …) into its SUPERGRAPH: one node per
    label, edge (la, lb) weighted by the number of original edges
    crossing the pair — the graph-summarization step that turns a
    trillion-edge web graph into a communities-level map. Intra-label
    edges drop unless ``self_loops``.

    Shape: two bucketed hash joins (src→label, dst→label) + one
    map-side-combined composite-key ``sum_by_key``. Edges whose
    endpoint has no label are DROPPED (inner joins) — feed a total
    labeling (e.g. ``label_propagation`` output) for full coverage."""
    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    e = edges.map_batches(
        lambda t: pa.table({"src": t.column(src_col),
                            "dst": t.column(dst_col)}),
        batch_format="pyarrow")
    la = labels.map_batches(
        lambda t: pa.table({"src": t.column(node_col),
                            "la": t.column(label_col)}),
        batch_format="pyarrow")
    lb = labels.map_batches(
        lambda t: pa.table({"dst": t.column(node_col),
                            "lb": t.column(label_col)}),
        batch_format="pyarrow")
    j = shuffle_hash_join(
        shuffle_hash_join(e, la, on=["src"], how="inner", nb=nb),
        lb, on=["dst"], how="inner", nb=nb)

    def pairup(t: pa.Table) -> pa.Table:
        t = pa.table({"la": t.column("la"), "lb": t.column("lb"),
                      "weight": pa.array(np.ones(t.num_rows,
                                                 np.int64))})
        if not self_loops:
            t = t.filter(pc.not_equal(t.column("la"),
                                      t.column("lb")))
        return t

    return sum_by_key(j.map_batches(pairup, batch_format="pyarrow"),
                      ["la", "lb"], "weight", nb=nb)


def lowest_common_ancestor(
    edges: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    child_col: str = "child",
    parent_col: str = "parent",
    u_col: str = "u",
    v_col: str = "v",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Lowest common ancestor of query pairs over an ontology
    TREE/FOREST (child→parent edges) — the class-generalization
    primitive of KG reasoning ("what do EFO:asthma and EFO:COPD have
    in common?"): per (u, v) the common ancestor with the greatest
    depth, where every node counts as its own ancestor and depth =
    #proper ancestors (exact for trees; on a multi-parent DAG this
    picks the deepest common ancestor by that count — deterministic,
    ties → smallest ancestor id).

    Shape: one ``transitive_closure`` (frontier-doubling rounds) +
    self rows, a depth census (``sum_by_key``), two bucketed joins
    fanning each pair over u's then v's ancestor sets, and a
    groupby-argmax finisher. Pairs whose nodes share no tree emit no
    row."""
    from .canonicalize import dedup_exact, groupby_argmax, sum_by_key
    from .join import shuffle_hash_join

    C = transitive_closure(
        edges.map_batches(
            lambda t: pa.table({"child": t.column(child_col),
                                "parent": t.column(parent_col)}),
            batch_format="pyarrow"),
        child_col="child", parent_col="parent", nb=nb).materialize()
    nodes = dedup_exact(
        C.map_batches(lambda t: pa.table({"node": t.column("node")}),
                      batch_format="pyarrow")
        .union(C.map_batches(
            lambda t: pa.table({"node": t.column("anc")}),
            batch_format="pyarrow")),
        ["node"], nb=nb)
    anc = C.union(nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "anc": t.column("node")}),
        batch_format="pyarrow")).materialize()
    depth = sum_by_key(
        C.map_batches(
            lambda t: pa.table({
                "anc": t.column("node"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "anc", "one", nb=nb, out_col="depth")

    p = pairs.map_batches(
        lambda t: pa.table({"u": t.column(u_col),
                            "v": t.column(v_col)}),
        batch_format="pyarrow")
    ju = shuffle_hash_join(
        p, anc.map_batches(
            lambda t: t.rename_columns(["u", "anc"]),
            batch_format="pyarrow"),
        on=["u"], how="inner", nb=nb)
    common = shuffle_hash_join(
        ju, anc.map_batches(
            lambda t: t.rename_columns(["v", "anc"]),
            batch_format="pyarrow"),
        on=["v", "anc"], how="inner", nb=nb)
    scored = shuffle_hash_join(
        common, depth, on=["anc"], how="left", nb=nb).map_batches(
        lambda t: pa.table({
            "u": t.column("u"), "v": t.column("v"),
            "anc": t.column("anc"),
            "depth": pc.fill_null(t.column("depth"), 0)
            .cast(pa.int64())}),
        batch_format="pyarrow")
    return groupby_argmax(scored, ["u", "v"], ["depth", "anc"],
                          [False, True], nb=nb)


def characteristic_sets(
    triples,
    subj_col: str = "subj",
    pred_col: str = "pred",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Characteristic-set statistics (Neumann & Moerkotte, ICDE'11 —
    the published RDF-store cardinality-estimation structure): group
    subjects by their DISTINCT predicate set and report, per set, the
    sorted ','-joined signature, its predicate count, and how many
    subjects share it. On a crawl-extracted KG this is both the query
    planner's join-cardinality table and a schema-discovery census
    ("how many entities look like a Product with name+price+brand").

    Shape: exact (subj, pred) dedup (bucketed), ONE bucket shuffle on
    subj, per-bucket sorted-run signature assembly via ``ListArray`` +
    ``pc.binary_join`` (no per-subject Python), then a bucketed census
    on the signature string. No global sort; driver sees nothing.
    """
    import ray.data as rd

    from .canonicalize import _B, _add_bucket, dedup_exact, sum_by_key

    ds = rd.from_arrow(triples) if isinstance(triples, pa.Table) else triples
    sp = dedup_exact(
        ds.map_batches(
            lambda t: pa.table({"subj": t.column(subj_col),
                                "pred": t.column(pred_col)}),
            batch_format="pyarrow"),
        ["subj", "pred"], nb=nb)

    def sigs(g: pa.Table) -> pa.Table:
        t = g.drop_columns([_B]).sort_by(
            [("subj", "ascending"), ("pred", "ascending")])
        if t.num_rows == 0:
            return pa.table({"cs": pa.array([], pa.string()),
                             "n_preds": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        subj = t.column("subj").combine_chunks()
        ne = pc.not_equal(subj.slice(1), subj.slice(0, len(subj) - 1))
        ne = ne.fill_null(True).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.flatnonzero(ne) + 1,
                                  [len(subj)]])
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            t.column("pred").cast(pa.string()).combine_chunks())
        return pa.table({
            "cs": pc.binary_join(lst.cast(pa.list_(pa.string())),
                                 pa.scalar(",")),
            "n_preds": pa.array(np.diff(offsets), pa.int64()),
            "one": pa.array(np.ones(len(offsets) - 1, np.int64))})

    per_subj = (sp.map_batches(
        lambda t: _add_bucket(t, ["subj"], nb), batch_format="pyarrow")
        .groupby(_B).map_groups(sigs, batch_format="pyarrow"))
    return sum_by_key(per_subj, ["cs", "n_preds"], "one", nb=nb,
                      out_col="n_subjects")


def entity_table(
    triples,
    preds: "list[str]",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Property-table pivot: the extracted triple stream → ONE wide
    row per entity with a column per requested predicate (the
    relational hand-off every KG-construction pipeline ends with —
    feed entities to a trainer or SQL store without a triple join per
    attribute). Multi-valued predicates resolve deterministically to
    the MIN object; absent predicates are null.

    Shape: predicate filter at the map side (only requested columns'
    triples survive), per-batch partial (subj, pred) → min(obj)
    combine, ONE bucket shuffle on subj, per-bucket Arrow hash-agg +
    per-predicate left joins (Acero) — never a driver-side pivot.
    """
    import ray.data as rd

    from .canonicalize import _B, _add_bucket

    for p in preds:
        if p == "subj":
            raise ValueError("predicate column name 'subj' collides")
    pset = pa.array(list(preds), pa.string())
    ds = rd.from_arrow(triples) if isinstance(triples, pa.Table) else triples

    def local(t: pa.Table) -> pa.Table:
        f = pa.table({"subj": t.column(subj_col),
                      "pred": t.column(pred_col).cast(pa.string()),
                      "obj": t.column(obj_col)})
        f = f.filter(pc.is_in(f.column("pred"), value_set=pset))
        part = f.group_by(["subj", "pred"]).aggregate([("obj", "min")])
        return _add_bucket(
            part.rename_columns(["subj", "pred", "obj"]),
            ["subj"], nb)

    def pivot(g: pa.Table) -> pa.Table:
        t = (g.drop_columns([_B])
             .group_by(["subj", "pred"]).aggregate([("obj", "min")]))
        out = t.group_by(["subj"]).aggregate([])
        for p in preds:
            sub = (t.filter(pc.equal(t.column("pred"), p))
                   .select(["subj", "obj_min"])
                   .rename_columns(["subj", p]))
            out = out.join(sub, keys="subj", join_type="left outer")
        return out.select(["subj"] + list(preds))

    return (ds.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(_B).map_groups(pivot, batch_format="pyarrow"))


def negative_sample_triples(
    triples,
    k: int = 1,
    seed: int = 0,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Deterministic negative sampling for KG-embedding training
    (TransE-family corrupt-tail protocol): for every positive triple
    emit up to ``k`` corrupted copies whose object is drawn from the
    global DISTINCT-object pool, with KNOWN positives filtered out
    (type-unconstrained uniform corruption, the published baseline).
    Reproducible by construction — draw ``j`` for a triple is
    ``md5(subj:pred:obj:j:seed) mod |pool|``, the same replayable-md5
    contract as :func:`random_walks`, so recovery never changes the
    training set and a SQL twin can replay every draw.

    Shape: pool = bucketed exact distinct; pool ranks come from the
    histogram-partitioned :func:`~..stages.windows.global_row_number`
    over a numeric md5 key (no single-node sort); draws expand
    map-side k× and resolve with ONE bucketed rank join; the
    false-negative filter is ONE bucketed anti join against the
    positives. Yields ≤ k negatives per positive (collisions with true
    triples are dropped, not resampled — deterministic, documented).
    """
    import hashlib

    import ray.data as rd

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join

    if k < 1:
        raise ValueError("k must be >= 1")
    ds = rd.from_arrow(triples) if isinstance(triples, pa.Table) else triples
    pos = ds.map_batches(
        lambda t: pa.table({
            "subj": t.column(subj_col).cast(pa.string()),
            "pred": t.column(pred_col).cast(pa.string()),
            "obj": t.column(obj_col).cast(pa.string())}),
        batch_format="pyarrow").materialize()

    def add_h(t: pa.Table) -> pa.Table:
        objs = t.column("obj").to_pylist()
        h = [int(hashlib.md5(o.encode()).hexdigest()[:8], 16)
             for o in objs]
        return t.append_column("h", pa.array(h, pa.int64()))

    pool = dedup_exact(
        pos.map_batches(lambda t: t.select(["obj"]),
                        batch_format="pyarrow"),
        ["obj"], nb=nb).map_batches(add_h, batch_format="pyarrow")
    n_pool = pool.count()
    if n_pool == 0:
        raise ValueError("empty object pool")

    from .windows import global_row_number
    ranked = global_row_number(pool, ["h", "obj"], out="rank").map_batches(
        lambda t: pa.table({"rank": t.column("rank"),
                            "obj_neg": t.column("obj")}),
        batch_format="pyarrow")

    def draws(t: pa.Table) -> pa.Table:
        s = t.column("subj").to_pylist()
        p = t.column("pred").to_pylist()
        o = t.column("obj").to_pylist()
        out_s, out_p, out_j, out_r = [], [], [], []
        for si, pi, oi in zip(s, p, o):
            for j in range(k):
                d = int(hashlib.md5(
                    f"{si}:{pi}:{oi}:{j}:{seed}".encode()
                ).hexdigest()[:8], 16) % n_pool
                out_s.append(si); out_p.append(pi)
                out_j.append(j); out_r.append(d + 1)
        return pa.table({"subj": pa.array(out_s, pa.string()),
                         "pred": pa.array(out_p, pa.string()),
                         "j": pa.array(out_j, pa.int64()),
                         "rank": pa.array(out_r, pa.int64())})

    negs = shuffle_hash_join(
        pos.map_batches(draws, batch_format="pyarrow"),
        ranked, on=["rank"], how="inner", nb=nb).map_batches(
        lambda t: t.select(["subj", "pred", "obj_neg", "j"]),
        batch_format="pyarrow")
    true_neg = pos.map_batches(
        lambda t: pa.table({"subj": t.column("subj"),
                            "pred": t.column("pred"),
                            "obj_neg": t.column("obj")}),
        batch_format="pyarrow")
    return shuffle_hash_join(negs, true_neg,
                             on=["subj", "pred", "obj_neg"],
                             how="anti", nb=nb)


def maximal_independent_set(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    seed: int = 0,
    max_rounds: int = 30,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Maximal independent set via Luby's algorithm (Luby 1986 — the
    published O(log n)-round parallel MIS): per round every alive node
    draws a priority and enters the MIS iff it strictly beats ALL
    alive neighbors; winners and their neighborhoods leave the graph.
    The KG/crawl use: pick a maximal set of pairwise-non-conflicting
    items (mirror pages, contradictory facts) in logarithmically many
    shuffles instead of a sequential greedy pass.

    Deterministic by construction: the round-``r`` priority of node
    ``v`` is the 60-bit ``md5(v:r:seed)`` prefix (the replayable-md5
    contract of :func:`random_walks`), so recovery replays identical
    rounds and a SQL twin can unroll them. Neighbor priority TIES
    (adjacent 60-bit collisions, ~|E|/2^60) eliminate nobody that
    round — never an independence violation, the pair just redraws.

    Shape per round: one bucketed join ships priorities to neighbors,
    one map-side-combined per-node min, one left join picks winners
    (isolated-by-attrition nodes win on the null min), one semi join
    expands winner neighborhoods, anti/semi joins shrink the node and
    edge sets. Nodes are edge endpoints — truly isolated input nodes
    never appear. Raises after ``max_rounds`` non-converged rounds.
    """
    import hashlib

    import ray.data as rd

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    und = ds.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column(a_col).cast(pa.int64()).combine_chunks(),
                t.column(b_col).cast(pa.int64()).combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column(b_col).cast(pa.int64()).combine_chunks(),
                t.column(a_col).cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    und = und.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"),
                                        t.column("dst"))),
        batch_format="pyarrow")  # self-loops would block their node forever
    und = mat_cut(dedup_exact(und, ["src", "dst"], nb=nb))
    alive = mat_cut(dedup_exact(
        und.map_batches(lambda t: pa.table({"node": t.column("src")}),
                        batch_format="pyarrow"),
        ["node"], nb=nb))
    schema = pa.schema([pa.field("node", pa.int64()),
                        pa.field("mis_round", pa.int64())])
    parts: list = []
    for r in range(max_rounds):
        if alive.count() == 0:
            break
        if und.count() == 0:
            # every remaining alive node is isolated by attrition —
            # all of them join the MIS and the loop is done (an empty
            # edge set also has no schema for the join below)
            parts.append(mat_cut(alive.map_batches(
                lambda t, rr=r: pa.table({
                    "node": t.column("node"),
                    "mis_round": pa.array(
                        np.full(t.num_rows, rr, np.int64))}),
                batch_format="pyarrow")))
            alive = rd.from_arrow(pa.table(
                {"node": pa.array([], pa.int64())}))
            break

        def prio(t: pa.Table, rr=r) -> pa.Table:
            p = [int(hashlib.md5(f"{v}:{rr}:{seed}".encode())
                     .hexdigest()[:15], 16)
                 for v in t.column("node").to_pylist()]
            return pa.table({"node": t.column("node"),
                             "p": pa.array(p, pa.int64())})

        pri = mat_cut(alive.map_batches(prio, batch_format="pyarrow"))
        msgs = shuffle_hash_join(
            und, pri.map_batches(
                lambda t: t.rename_columns(["dst", "p"]),
                batch_format="pyarrow"),
            on=["dst"], how="inner", nb=nb).map_batches(
            lambda t: pa.table({"node": t.column("src"),
                                "p": t.column("p")}),
            batch_format="pyarrow")
        minnb = _min_per_node(msgs, nb=nb, node_col="node",
                              val_col="p").map_batches(
            lambda t: t.rename_columns(["node", "minp"]),
            batch_format="pyarrow")
        def pick(t: pa.Table, rr=r) -> pa.Table:
            w = t.filter(pc.or_kleene(
                pc.is_null(t.column("minp")),
                pc.less(t.column("p"), t.column("minp"))))
            return pa.table({
                "node": w.column("node"),
                "mis_round": pa.array(
                    np.full(w.num_rows, rr, np.int64))})

        winners = mat_cut(shuffle_hash_join(
            pri, minnb, on=["node"], how="left", nb=nb).map_batches(
            pick, batch_format="pyarrow"))
        if winners.count() > 0:
            parts.append(winners)
            w_nodes = winners.map_batches(
                lambda t: pa.table({"node": t.column("node")}),
                batch_format="pyarrow")
            nb_of_w = shuffle_hash_join(
                und, w_nodes.map_batches(
                    lambda t: t.rename_columns(["src"]),
                    batch_format="pyarrow"),
                on=["src"], how="semi", nb=nb).map_batches(
                lambda t: pa.table({"node": t.column("dst")}),
                batch_format="pyarrow")
            removed = dedup_exact(w_nodes.union(nb_of_w), ["node"],
                                  nb=nb)
            alive = mat_cut(shuffle_hash_join(
                alive, removed, on=["node"], how="anti", nb=nb))
            if alive.count() == 0:
                # everyone is in the MIS or adjacent to it — and an
                # all-empty anti-join result loses its schema, which
                # the semi joins below could not probe anyway
                break
            und = shuffle_hash_join(
                und, alive.map_batches(
                    lambda t: t.rename_columns(["src"]),
                    batch_format="pyarrow"),
                on=["src"], how="semi", nb=nb)
            und = mat_cut(shuffle_hash_join(
                und, alive.map_batches(
                    lambda t: t.rename_columns(["dst"]),
                    batch_format="pyarrow"),
                on=["dst"], how="semi", nb=nb))
    else:
        if alive.count() > 0:
            raise RuntimeError(
                f"MIS did not converge in {max_rounds} rounds")
    if not parts:
        return rd.from_arrow(schema.empty_table())
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out.map_batches(lambda t: t.cast(schema),
                           batch_format="pyarrow")


def maximal_matching(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    seed: int = 0,
    max_rounds: int = 30,
    nb: int = 32,
    weight_col: "str | None" = None,
) -> "ray.data.Dataset":
    """Maximal matching via parallel symmetry breaking (Israeli &
    Itai 1986 — the published O(log n)-round distributed matching):
    per round every alive edge draws a priority; an edge joins the
    matching iff it is the UNIQUE minimum at BOTH endpoints under the
    total order (priority, u, v); matched vertices and all their
    incident edges leave the graph. The KG/ER use: pair up candidate
    duplicate records one-to-one (each entity merged with at most one
    partner per pass) without a sequential greedy scan.

    Deterministic by construction: the round-``r`` priority of edge
    ``(u, v)`` (canonical ``u < v`` orientation) is the 60-bit
    ``md5(u-v:r:seed)`` prefix — the replayable-md5 contract of
    :func:`random_walks` — and the per-vertex argmin breaks ties on
    ``(p, u, v)``, a total order, so the globally smallest edge always
    matches: every round makes progress and a SQL twin can unroll the
    rounds. Self-loops are dropped (a loop can never be matched).

    Shape per round: one vectorized incidence expansion, one bucketed
    :func:`~..canonicalize.groupby_argmax` per-vertex winner pick, one
    bucketed pair census (an edge must win at both endpoints), two
    anti joins peel matched vertices' edges. Raises after
    ``max_rounds`` non-converged rounds.

    With ``weight_col`` the priority is the NEGATED edge weight
    instead of an md5 draw — the locally-heaviest-edge greedy matching
    (Preis 1999, a ½-approximation of maximum-weight matching, the
    standard parallel recipe): an edge matches iff it is strictly the
    heaviest under the (−w, u, v) total order at both endpoints.
    Parallel edges collapse to their MAXIMUM weight; null/NaN weights
    raise. Caveat: unlike the randomized variant's O(log n) rounds,
    adversarial weights (a strictly decreasing path) serialize to one
    match per round — raise ``max_rounds`` for such graphs.

    Returns ``(u, v, match_round)`` with ``u < v`` (plus ``w`` when
    weighted).
    """
    import hashlib

    import ray.data as rd

    from .canonicalize import dedup_exact, groupby_argmax, sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).cast(pa.int64())
        b = t.column(b_col).cast(pa.int64())
        keep = pc.not_equal(a, b)
        cols = {"u": pc.min_element_wise(a, b).filter(keep),
                "v": pc.max_element_wise(a, b).filter(keep)}
        if weight_col is not None:
            w = t.column(weight_col).cast(pa.float64())
            bad = pc.or_kleene(pc.is_null(w),
                               pc.is_nan(pc.fill_null(w, 0.0)))
            if pc.any(bad).as_py():
                raise ValueError(
                    "maximal_matching: null/NaN edge weight")
            cols["w"] = w.filter(keep)
        return pa.table(cols)

    cn = ds.map_batches(canon, batch_format="pyarrow")
    if weight_col is not None:
        # parallel edges collapse to their MAX weight
        alive = mat_cut(groupby_argmax(cn, ["u", "v"], ["w"],
                                       [False], nb=nb))
    else:
        alive = mat_cut(dedup_exact(cn, ["u", "v"], nb=nb))
    fields = [pa.field("u", pa.int64()), pa.field("v", pa.int64()),
              pa.field("match_round", pa.int64())]
    if weight_col is not None:
        fields.insert(2, pa.field("w", pa.float64()))
    schema = pa.schema(fields)
    parts: list = []
    for r in range(max_rounds):
        if alive.count() == 0:
            break

        def prio(t: pa.Table, rr=r) -> pa.Table:
            if weight_col is not None:
                # static priority: heavier edge wins (Preis greedy)
                return pa.table({
                    "u": t.column("u"), "v": t.column("v"),
                    "w": t.column("w"),
                    "p": pc.multiply(t.column("w"), -1.0)})
            p = [int(hashlib.md5(f"{u}-{v}:{rr}:{seed}".encode())
                     .hexdigest()[:15], 16)
                 for u, v in zip(t.column("u").to_pylist(),
                                 t.column("v").to_pylist())]
            return pa.table({"u": t.column("u"), "v": t.column("v"),
                             "p": pa.array(p, pa.int64())})

        def incidence(t: pa.Table) -> pa.Table:
            cols = {
                "vtx": pa.concat_arrays([
                    t.column("u").combine_chunks(),
                    t.column("v").combine_chunks()]),
                "u": pa.concat_arrays([
                    t.column("u").combine_chunks(),
                    t.column("u").combine_chunks()]),
                "v": pa.concat_arrays([
                    t.column("v").combine_chunks(),
                    t.column("v").combine_chunks()]),
                "p": pa.concat_arrays([
                    t.column("p").combine_chunks(),
                    t.column("p").combine_chunks()])}
            if weight_col is not None:
                cols["w"] = pa.concat_arrays([
                    t.column("w").combine_chunks(),
                    t.column("w").combine_chunks()])
            return pa.table(cols)

        winners = groupby_argmax(
            alive.map_batches(prio, batch_format="pyarrow")
                 .map_batches(incidence, batch_format="pyarrow"),
            ["vtx"], ["p", "u", "v"], [True, True, True], nb=nb)
        matched = mat_cut(sum_by_key(
            winners.map_batches(
                lambda t: pa.table({
                    "u": t.column("u"), "v": t.column("v"),
                    "c": pa.array(np.ones(t.num_rows, np.int64))}),
                batch_format="pyarrow"),
            ["u", "v"], "c", nb=nb, out_col="c").map_batches(
            lambda t, rr=r: pa.table({
                "u": (w := t.filter(pc.equal(t.column("c"),
                                             2))).column("u"),
                "v": w.column("v"),
                "match_round": pa.array(
                    np.full(w.num_rows, rr, np.int64))}),
            batch_format="pyarrow"))
        if weight_col is not None:
            # re-attach the matched edges' weights for the output
            matched = mat_cut(shuffle_hash_join(
                matched, alive, on=["u", "v"], how="inner",
                nb=nb).map_batches(
                lambda t: t.select(["u", "v", "w", "match_round"]),
                batch_format="pyarrow"))
        parts.append(matched)
        mvtx = dedup_exact(matched.map_batches(
            lambda t: pa.table({"vtx": pa.concat_arrays([
                t.column("u").combine_chunks(),
                t.column("v").combine_chunks()])}),
            batch_format="pyarrow"), ["vtx"], nb=nb)
        done = False
        for side in ("u", "v"):
            alive = mat_cut(shuffle_hash_join(
                alive, mvtx.map_batches(
                    lambda t, s=side: t.rename_columns([s]),
                    batch_format="pyarrow"),
                on=[side], how="anti", nb=nb))
            if alive.count() == 0:
                # an all-empty anti-join result loses its schema —
                # stop before the next join would probe it
                done = True
                break
        if done:
            break
    else:
        if alive.count() > 0:
            raise RuntimeError(
                f"matching did not converge in {max_rounds} rounds")
    if not parts:
        return rd.from_arrow(schema.empty_table())
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out.map_batches(lambda t: t.cast(schema),
                           batch_format="pyarrow")


def boruvka_mst(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    w_col: str = "w",
    max_rounds: int = 30,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Minimum spanning forest via Borůvka's algorithm (Borůvka 1926;
    the standard parallel MST — e.g. the GraphX/PBGL formulation):
    per round every component selects its minimum incident outgoing
    edge under the total order ``(w, u, v)`` (ties broken by edge
    identity ⇒ the MST is unique and the cut property applies),
    selected edges join the forest, and components contract by
    pointer doubling. Components at least halve per round ⇒ O(log n)
    bucketed-shuffle rounds. The KG/ER use: a minimum-cost linkage
    forest over a weighted similarity graph (single-linkage
    clustering dendrogram edges).

    Edge prep: canonical ``u < v`` orientation, self-loops dropped,
    parallel edges collapsed to their minimum weight. Null or NaN
    weights raise (they have no place in a total order). Returns
    ``(u, v, w, mst_round)`` — one row per forest edge; disconnected
    inputs yield a spanning forest. Raises after ``max_rounds``
    non-contracted rounds.

    Contraction shape: each component points at its selected
    neighbor; mutual pairs break toward the smaller label (that
    component becomes the root), leaving a forest whose roots are
    found by ⌈log2(#comps)⌉ self-join doubling rounds — never per-row
    walking.
    """
    import math

    import ray.data as rd

    from .canonicalize import dedup_exact, groupby_argmax
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(a_col).cast(pa.int64())
        b = t.column(b_col).cast(pa.int64())
        w = t.column(w_col).cast(pa.float64())
        bad = pc.or_kleene(pc.is_null(w),
                           pc.is_nan(pc.fill_null(w, 0.0)))
        if pc.any(bad).as_py():
            raise ValueError("boruvka_mst: null/NaN edge weight")
        keep = pc.not_equal(a, b)
        a, b, w = a.filter(keep), b.filter(keep), w.filter(keep)
        return pa.table({"u": pc.min_element_wise(a, b),
                         "v": pc.max_element_wise(a, b), "w": w})

    e = mat_cut(groupby_argmax(
        ds.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"], ["w"], [True], nb=nb))
    comp = mat_cut(dedup_exact(e.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("u").combine_chunks(),
            t.column("v").combine_chunks()])}),
        batch_format="pyarrow"), ["node"], nb=nb).map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "comp": t.column("node")}),
        batch_format="pyarrow"))
    schema = pa.schema([
        pa.field("u", pa.int64()), pa.field("v", pa.int64()),
        pa.field("w", pa.float64()), pa.field("mst_round", pa.int64())])
    if e.count() == 0:
        return rd.from_arrow(schema.empty_table())

    parts: list = []
    # max_rounds + 1 iterations: a forest completed exactly in round
    # max_rounds-1 is only DETECTED by the next round's empty
    # outgoing-edge check, which must therefore be allowed to run
    # (r04 review — the old for-else raised on that correct result)
    for r in range(max_rounds + 1):
        # label both endpoints with their current component
        lab = shuffle_hash_join(
            e, comp.map_batches(
                lambda t: pa.table({"u": t.column("node"),
                                    "cu": t.column("comp")}),
                batch_format="pyarrow"),
            on=["u"], how="inner", nb=nb)
        lab = shuffle_hash_join(
            lab, comp.map_batches(
                lambda t: pa.table({"v": t.column("node"),
                                    "cv": t.column("comp")}),
                batch_format="pyarrow"),
            on=["v"], how="inner", nb=nb)
        out_e = mat_cut(lab.map_batches(
            lambda t: t.filter(pc.not_equal(t.column("cu"),
                                            t.column("cv"))),
            batch_format="pyarrow"))
        if out_e.count() == 0:
            break
        if r == max_rounds:
            raise RuntimeError(
                f"boruvka_mst did not converge in {max_rounds} rounds")

        def incidence(t: pa.Table) -> pa.Table:
            def one(c_col: str, o_col: str) -> pa.Table:
                return pa.table({
                    "comp": t.column(c_col), "w": t.column("w"),
                    "u": t.column("u"), "v": t.column("v"),
                    "oc": t.column(o_col)})
            return pa.concat_tables([one("cu", "cv"), one("cv", "cu")])

        sel = mat_cut(groupby_argmax(
            out_e.map_batches(incidence, batch_format="pyarrow"),
            ["comp"], ["w", "u", "v"], [True, True, True], nb=nb))
        picked = dedup_exact(sel.map_batches(
            lambda t, rr=r: pa.table({
                "u": t.column("u"), "v": t.column("v"),
                "w": t.column("w"),
                "mst_round": pa.array(
                    np.full(t.num_rows, rr, np.int64))}),
            batch_format="pyarrow"), ["u", "v"], nb=nb)
        parts.append(mat_cut(picked))

        # component pointers: comp → oc; mutual pairs root at the
        # smaller label (drop its pointer) so the graph is a forest
        ptr = sel.map_batches(
            lambda t: pa.table({"c": t.column("comp"),
                                "p": t.column("oc")}),
            batch_format="pyarrow")
        swapped = ptr.map_batches(
            lambda t: pa.table({"c": t.column("p"),
                                "p": t.column("c")}),
            batch_format="pyarrow")
        mutual = shuffle_hash_join(ptr, swapped, on=["c", "p"],
                                   how="semi", nb=nb)
        keep_mutual = mutual.map_batches(
            lambda t: t.filter(pc.greater(t.column("c"),
                                          t.column("p"))),
            batch_format="pyarrow")
        non_mutual = shuffle_hash_join(ptr, swapped, on=["c", "p"],
                                       how="anti", nb=nb)
        m = mat_cut(non_mutual.union(keep_mutual))

        # pointer-double to roots
        n_ptr = max(2, m.count())
        for _ in range(math.ceil(math.log2(n_ptr)) + 1):
            nxt = m.map_batches(
                lambda t: pa.table({"p": t.column("c"),
                                    "p2": t.column("p")}),
                batch_format="pyarrow")
            j = shuffle_hash_join(m, nxt, on=["p"], how="left", nb=nb)
            m = mat_cut(j.map_batches(
                lambda t: pa.table({
                    "c": t.column("c"),
                    "p": pc.if_else(pc.is_valid(t.column("p2")),
                                    t.column("p2"), t.column("p"))}),
                batch_format="pyarrow"))

        # comp relabel: comp → root(comp); roots keep their label
        j = shuffle_hash_join(
            comp, m.map_batches(
                lambda t: pa.table({"comp": t.column("c"),
                                    "root": t.column("p")}),
                batch_format="pyarrow"),
            on=["comp"], how="left", nb=nb)
        comp = mat_cut(j.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "comp": pc.if_else(pc.is_valid(t.column("root")),
                                   t.column("root"),
                                   t.column("comp"))}),
            batch_format="pyarrow"))
    if not parts:
        return rd.from_arrow(schema.empty_table())
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out.map_batches(lambda t: t.cast(schema),
                           batch_format="pyarrow")


def katz_centrality(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    alpha: float = 0.1,
    beta: float = 1.0,
    iters: int = 3,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Katz centrality (Katz 1953; the path-counting prestige measure
    pagerank generalizes): r_{k+1}(v) = β + α·Σ_{(u,v)∈E} r_k(u),
    starting from r_0 ≡ β — after k iterations each node's score
    counts all incoming walks up to length k, geometrically damped by
    α per hop. The KG use: authority scoring over citation/link
    graphs where prestige should NOT be divided by out-degree (a hub
    endorsing many pages endorses each fully — the modeling choice
    that distinguishes Katz from pagerank).

    Fixed ``iters`` (not convergence-tested) keeps the operator
    deterministic and SQL-twinnable; α must be < 1 (and below the
    spectral radius bound for the infinite sum to mean anything —
    callers pick it; the truncated sum is well-defined regardless).

    Scale shape per iteration: one bucketed hash join ships scores to
    edge targets, one map-side-combined :func:`~..canonicalize.
    sum_by_key` census, one left join re-attaches score-less nodes at
    the β floor — identical to the pagerank/PPR round shape (no
    degree division, no dangling-mass recycling needed because Katz
    adds β everywhere instead of redistributing).
    """
    import ray.data as rd

    from .canonicalize import dedup_exact, sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = mat_cut(ds.map_batches(
        lambda t: pa.table({"src": t.column(src).cast(pa.int64()),
                            "dst": t.column(dst).cast(pa.int64())}),
        batch_format="pyarrow"))
    nodes = mat_cut(dedup_exact(e.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])}),
        batch_format="pyarrow"), ["node"], nb=nb))
    ranks = nodes.map_batches(
        lambda t, b=float(beta): pa.table({
            "node": t.column("node"),
            "rank": pa.array(np.full(t.num_rows, b, np.float64))}),
        batch_format="pyarrow")
    for _ in range(iters):
        msgs = shuffle_hash_join(
            e, ranks.map_batches(
                lambda t: t.rename_columns(["src", "rank"]),
                batch_format="pyarrow"),
            on=["src"], how="inner", nb=nb).map_batches(
            lambda t: pa.table({"node": t.column("dst"),
                                "m": t.column("rank")}),
            batch_format="pyarrow")
        sums = sum_by_key(msgs, "node", "m", nb=nb, out_col="msum")
        ranks = mat_cut(shuffle_hash_join(
            nodes, sums, on=["node"], how="left", nb=nb).map_batches(
            lambda t, a=float(alpha), b=float(beta): pa.table({
                "node": t.column("node"),
                "rank": pc.add(
                    pa.scalar(b, pa.float64()),
                    pc.multiply(pa.scalar(a, pa.float64()),
                                pc.fill_null(t.column("msum"), 0.0))
                ).cast(pa.float64())}),
            batch_format="pyarrow"))
    return ranks


def reciprocity(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Reciprocity of a directed graph (the classic webgraph/social
    metric: what fraction of links are returned?): over DISTINCT
    non-loop directed edges, r = |E ∩ Eᵀ| / |E|. The KG/crawl use:
    distinguishing mutual-citation cores from one-way link farms, and
    a cheap sanity invariant when re-crawling (reciprocity is stable
    under sampling; a crawler bug that drops one link direction shows
    up immediately).

    Returns ONE row ``(n_edges, n_reciprocal, reciprocity)`` (null
    ratio on an empty graph). Shape: exact dedup, one bucketed
    semi join of E against its transpose, two count aggregates —
    no driver-side edge materialization.
    """
    import ray.data as rd

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = mat_cut(dedup_exact(ds.map_batches(
        lambda t: pa.table({
            "src": t.column(src).cast(pa.int64()),
            "dst": t.column(dst).cast(pa.int64())}).filter(
            pc.not_equal(t.column(src).cast(pa.int64()),
                         t.column(dst).cast(pa.int64()))),
        batch_format="pyarrow"), ["src", "dst"], nb=nb))
    n = e.count()
    if n == 0:
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([0], pa.int64()),
            "n_reciprocal": pa.array([0], pa.int64()),
            "reciprocity": pa.array([None], pa.float64())}))
    swapped = e.map_batches(
        lambda t: pa.table({"src": t.column("dst"),
                            "dst": t.column("src")}),
        batch_format="pyarrow")
    nr = shuffle_hash_join(e, swapped, on=["src", "dst"], how="semi",
                           nb=nb).count()
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([n], pa.int64()),
        "n_reciprocal": pa.array([nr], pa.int64()),
        "reciprocity": pa.array([nr / n], pa.float64())}))


def greedy_coloring(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    seed: int = 0,
    max_rounds: int = 60,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Distributed greedy graph coloring via Jones–Plassmann (Jones &
    Plassmann 1993 — the published parallel analogue of sequential
    greedy coloring): every node draws ONE static priority; per round,
    an uncolored node whose priority strictly beats every uncolored
    neighbor takes the SMALLEST color absent from its already-colored
    neighborhood. With a total priority order the result is EXACTLY
    the sequential greedy coloring in priority order, so the color
    count obeys the classic Δ+1 bound. The KG/crawl use: conflict-free
    scheduling — partition mutually-linked hosts into polite crawl
    waves, or group pairwise-conflicting fact-merge jobs into
    independent batches.

    Deterministic by construction: the priority of node ``v`` is the
    STRING ``md5(v:seed)[:15] + ":" + str(v)`` — the 60-bit md5
    prefix with the node id appended, compared byte-wise, so
    priorities are UNIQUE (an md5 collision between neighbors cannot
    deadlock the contest) and a SQL twin replays them with
    ``substr(md5(...), 1, 15) || ':' || node``. Round count is the longest
    priority-decreasing path (O(log n / log log n) w.h.p. on
    bounded-degree graphs); raises after ``max_rounds``.

    Shape per round: one bucketed join ships priorities to uncolored
    neighbors, one map-side-combined per-node min picks winners, one
    bucketed join gathers colored-neighbor colors, and a vectorized
    sorted-run mex kernel assigns colors — no per-node Python in the
    hot path. Self-loops drop (a node can never avoid its own color).

    Returns ``(node, color, color_round)``.
    """
    import hashlib

    import ray.data as rd

    from .canonicalize import _B, _add_bucket, dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    und = ds.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column(a_col).cast(pa.int64()).combine_chunks(),
                t.column(b_col).cast(pa.int64()).combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column(b_col).cast(pa.int64()).combine_chunks(),
                t.column(a_col).cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    und = mat_cut(dedup_exact(und.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"),
                                        t.column("dst"))),
        batch_format="pyarrow"), ["src", "dst"], nb=nb))

    def prio(t: pa.Table) -> pa.Table:
        p = [hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15]
             + f":{v}" for v in t.column("node").to_pylist()]
        return pa.table({"node": t.column("node"),
                         "p": pa.array(p, pa.string())})

    alive = mat_cut(dedup_exact(
        und.map_batches(lambda t: pa.table({"node": t.column("src")}),
                        batch_format="pyarrow"),
        ["node"], nb=nb).map_batches(prio, batch_format="pyarrow"))
    live = und  # contest edges: pruned to alive x alive per round;
    # und itself stays FULL so winners can see colored neighbors
    schema = pa.schema([pa.field("node", pa.int64()),
                        pa.field("color", pa.int64()),
                        pa.field("color_round", pa.int64())])
    colored: list = []

    def _mex_assign(g: pa.Table, rr: int) -> pa.Table:
        # g: (node, color) rows — color >= 0 are the node's
        # colored-neighbor (forbidden) colors, color == -1 is the
        # winner sentinel (present for EVERY winner by construction,
        # and sorting first in its run). Per node, assign the
        # smallest color >= 0 absent from the forbidden set — a
        # vectorized mex over sorted deduped runs.
        s = g.sort_by([("node", "ascending"), ("color", "ascending")])
        node = s.column("node").to_numpy(zero_copy_only=False)
        col = s.column("color").to_numpy(zero_copy_only=False)
        new = np.ones(len(node), dtype=bool)
        new[1:] = node[1:] != node[:-1]
        dupc = np.zeros(len(node), dtype=bool)
        dupc[1:] = (~new[1:]) & (col[1:] == col[:-1])
        keep = ~dupc
        node, col, new = node[keep], col[keep], new[keep]
        heads = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        # ladder position of a forbidden color within its run (the
        # sentinel head occupies index 0)
        pos = np.arange(len(node)) - heads[run_id] - 1
        lens = np.diff(np.append(heads, len(node))) - 1
        # mex = first ladder position where the packed 0,1,2,...
        # prefix breaks; if the forbidden colors pack the full
        # prefix, mex = count of distinct forbidden colors
        miss = np.flatnonzero((col != pos) & (col >= 0))
        mex = lens.copy()
        if len(miss):
            uniq, firsts = np.unique(run_id[miss], return_index=True)
            mex[uniq] = pos[miss[firsts]]
        return pa.table({
            "node": pa.array(node[heads]),
            "color": pa.array(mex),
            "color_round": pa.array(np.full(len(heads), rr, np.int64))})

    for r in range(max_rounds):
        if alive.count() == 0:
            break
        if live.count() == 0:
            # no alive-alive edges left: every alive node wins this
            # round (it still needs a mex against colored neighbors)
            winners = mat_cut(alive.map_batches(
                lambda t: pa.table({"node": t.column("node")}),
                batch_format="pyarrow"))
        else:
            # contest: alive node wins iff p < min(alive-neighbor p)
            msgs = shuffle_hash_join(
                live, alive.map_batches(
                    lambda t: t.rename_columns(["dst", "p"]),
                    batch_format="pyarrow"),
                on=["dst"], how="inner", nb=nb).map_batches(
                lambda t: pa.table({"node": t.column("src"),
                                    "p": t.column("p")}),
                batch_format="pyarrow")
            minnb = _min_per_node(msgs, nb=nb, node_col="node",
                                  val_col="p").map_batches(
                lambda t: t.rename_columns(["node", "minp"]),
                batch_format="pyarrow")

            def pick(t: pa.Table) -> pa.Table:
                w = t.filter(pc.or_kleene(
                    pc.is_null(t.column("minp")),
                    pc.less(t.column("p"), t.column("minp"))))
                return pa.table({"node": w.column("node")})

            winners = mat_cut(shuffle_hash_join(
                alive, minnb, on=["node"], how="left",
                nb=nb).map_batches(pick, batch_format="pyarrow"))
        if winners.count() == 0:
            continue
        # forbidden colors: colored neighbors of each winner. Join
        # the winners' edges first (und is never empty here), then
        # gather neighbor colors — joins pin their schema even at
        # zero rows, so every hop stays lazy.
        forb = rd.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "color": pa.array([], pa.int64())}))
        if colored:
            # lazy all the way into the assigned materialize: joins
            # pin (and annotate) their schema even at zero rows, so
            # the old per-hop count-guard materializations are gone
            from .util import map_known as _mk
            wedges = shuffle_hash_join(
                und, _mk(winners, lambda t: pa.table(
                    {"src": t.column("node")})),
                on=["src"], how="semi", nb=nb)
            coltab = colored[0]
            for c_ in colored[1:]:
                coltab = coltab.union(c_)
            forb = _mk(shuffle_hash_join(
                wedges, _mk(coltab, lambda t: pa.table(
                    {"dst": t.column("node"),
                     "color": t.column("color")})),
                on=["dst"], how="inner", nb=nb),
                lambda t: pa.table({"node": t.column("src"),
                                    "color": t.column("color")}))
        sentinel = winners.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "color": pa.array(np.full(t.num_rows, -1, np.int64))}),
            batch_format="pyarrow")
        assigned = mat_cut(
            forb.union(sentinel).map_batches(
                lambda t: _add_bucket(t, ["node"], nb),
                batch_format="pyarrow")
            .groupby(_B)
            .map_groups(lambda g, rr=r: _mex_assign(
                g.drop_columns([_B]), rr),
                batch_format="pyarrow"))
        colored.append(assigned)
        alive = mat_cut(shuffle_hash_join(
            alive, winners, on=["node"], how="anti", nb=nb))
        if alive.count() == 0:
            break
        live = shuffle_hash_join(
            live, alive.map_batches(
                lambda t: pa.table({"src": t.column("node")}),
                batch_format="pyarrow"),
            on=["src"], how="semi", nb=nb)
        live = mat_cut(shuffle_hash_join(
            live, alive.map_batches(
                lambda t: pa.table({"dst": t.column("node")}),
                batch_format="pyarrow"),
            on=["dst"], how="semi", nb=nb))
    else:
        if alive.count() > 0:
            raise RuntimeError(
                f"coloring did not converge in {max_rounds} rounds")
    if not colored:
        return rd.from_arrow(schema.empty_table())
    out = colored[0]
    for c_ in colored[1:]:
        out = out.union(c_)
    return out.map_batches(lambda t: t.cast(schema),
                           batch_format="pyarrow")


def label_spreading(
    edges,
    seeds,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    label_col: str = "label",
    max_rounds: int = 30,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Seeded label propagation for semi-supervised node
    classification (the synchronous majority-vote variant of
    Zhu & Ghahramani 2002 label spreading / Raghavan 2007 LPA with
    CLAMPED seeds): seed nodes carry fixed labels; per round, every
    still-unlabeled node with at least one labeled neighbor adopts
    the majority label among ALL labeled neighbors (deterministic
    tie-break: smallest label wins), and once assigned a label never
    changes. Converges when a round assigns nothing — unlabeled
    nodes in components without seeds stay unlabeled (absent from
    the output), which is the honest answer, not an error. The KG
    use: propagating rdf:type / topic labels from a curated seed set
    over the sameAs/link graph.

    Unlike :func:`label_propagation` (unseeded community detection,
    md5 tie-breaks, labels keep flipping), this is the CLASSIFIER:
    deterministic given seeds, so a SQL twin can unroll the rounds.

    Shape per round: one bucketed join ships labels to unlabeled
    neighbors, one map-side-combined (node, label) count, one
    argmax — all bucket-partitioned, no driver-side state.

    Returns ``(node, label, spread_round)`` — seeds at round 0.
    """
    import ray.data as rd

    from .canonicalize import dedup_exact, groupby_argmax, sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    sd = rd.from_arrow(seeds) if isinstance(seeds, pa.Table) else seeds
    und = ds.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([
                t.column(a_col).cast(pa.int64()).combine_chunks(),
                t.column(b_col).cast(pa.int64()).combine_chunks()]),
            "dst": pa.concat_arrays([
                t.column(b_col).cast(pa.int64()).combine_chunks(),
                t.column(a_col).cast(pa.int64()).combine_chunks()])}),
        batch_format="pyarrow")
    und = mat_cut(dedup_exact(und.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("src"),
                                        t.column("dst"))),
        batch_format="pyarrow"), ["src", "dst"], nb=nb))
    labeled = mat_cut(dedup_exact(sd.map_batches(
        lambda t: pa.table({
            "node": t.column(node_col).cast(pa.int64()),
            "label": t.column(label_col).cast(pa.int64()),
            "spread_round": pa.array(
                np.zeros(t.num_rows, np.int64))}),
        batch_format="pyarrow"), ["node"], nb=nb))
    schema = pa.schema([pa.field("node", pa.int64()),
                        pa.field("label", pa.int64()),
                        pa.field("spread_round", pa.int64())])
    if labeled.count() == 0 or und.count() == 0:
        return labeled.map_batches(lambda t: t.cast(schema),
                                   batch_format="pyarrow")
    parts = [labeled]
    for r in range(1, max_rounds + 1):
        cur = parts[0]
        for p_ in parts[1:]:
            cur = cur.union(p_)
        # labels arriving at each edge source from labeled targets
        msgs = shuffle_hash_join(
            und, cur.map_batches(
                lambda t: pa.table({"dst": t.column("node"),
                                    "label": t.column("label")}),
                batch_format="pyarrow"),
            on=["dst"], how="inner", nb=nb).map_batches(
            lambda t: pa.table({"node": t.column("src"),
                                "label": t.column("label")}),
            batch_format="pyarrow")
        # only still-unlabeled receivers vote
        msgs = mat_cut(shuffle_hash_join(
            msgs, cur.map_batches(
                lambda t: pa.table({"node": t.column("node")}),
                batch_format="pyarrow"),
            on=["node"], how="anti", nb=nb))
        if msgs.count() == 0:
            break
        counts = sum_by_key(
            msgs.map_batches(
                lambda t: t.append_column(
                    "one", pa.array(np.ones(t.num_rows, np.int64))),
                batch_format="pyarrow"),
            ["node", "label"], "one", nb=nb, out_col="n")
        won = mat_cut(groupby_argmax(
            counts, ["node"], ["n", "label"], [False, True],
            nb=nb).map_batches(
            lambda t, rr=r: pa.table({
                "node": t.column("node"),
                "label": t.column("label"),
                "spread_round": pa.array(
                    np.full(t.num_rows, rr, np.int64))}),
            batch_format="pyarrow"))
        parts.append(won)
    else:
        # rounds exhausted: only an error if another round would
        # still assign something (the final round may have labeled
        # the last reachable node, which IS convergence)
        cur = parts[0]
        for p_ in parts[1:]:
            cur = cur.union(p_)
        remaining = shuffle_hash_join(
            shuffle_hash_join(
                und, cur.map_batches(
                    lambda t: pa.table({"dst": t.column("node")}),
                    batch_format="pyarrow"),
                on=["dst"], how="semi", nb=nb),
            cur.map_batches(
                lambda t: pa.table({"src": t.column("node")}),
                batch_format="pyarrow"),
            on=["src"], how="anti", nb=nb)
        if remaining.count() > 0:
            raise RuntimeError(
                f"label spreading did not converge in {max_rounds}"
                " rounds")
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out.map_batches(lambda t: t.cast(schema),
                           batch_format="pyarrow")


def void_stats(
    triples,
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    type_pred: str = "rdf:type",
    nb: int = 64,
) -> "ray.data.Dataset":
    """VoID-style dataset statistics over a triple store (the W3C
    VoID vocabulary's descriptive core: dataset totals,
    void:propertyPartition per predicate, void:classPartition per
    rdf:type object) — the profiling pass a KG pipeline runs after
    every build to catch extraction regressions (a predicate's triple
    count halving, a class partition vanishing) before publishing.

    Output rows, one table::

        part='dataset'   key='(all)'   n_triples, n_subjects, n_objects
        part='predicate' key=<pred>    n_triples, n_subjects, n_objects
        part='class'     key=<class>   n_triples (type-triple count),
                                       n_subjects (distinct entities),
                                       n_objects null

    Scale shape: counts are map-side-combined :func:`~.canonicalize.
    sum_by_key` partials; distincts are the pair-bucketed
    :func:`~.canonicalize.groupby_nunique` (a hot predicate's values
    spread across buckets); the per-predicate frames merge with
    bucketed hash joins — the row stream is never driver-materialized.
    """
    import ray.data as rd

    from .canonicalize import groupby_nunique, sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    ds = (rd.from_arrow(triples) if isinstance(triples, pa.Table)
          else triples)

    def ones(t: pa.Table, key: str) -> pa.Table:
        return pa.table({
            "key": t.column(key).cast(pa.string()),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    # predicate partition: count + distinct subj/obj per predicate
    pred_n = sum_by_key(
        ds.map_batches(lambda t: ones(t, p_col),
                       batch_format="pyarrow"),
        "key", "one", nb=nb, out_col="n_triples")
    pred_s = groupby_nunique(
        ds.map_batches(lambda t: pa.table({
            "key": t.column(p_col).cast(pa.string()),
            "v": t.column(s_col).cast(pa.string())}),
            batch_format="pyarrow"), "key", "v", nb=nb)
    pred_o = groupby_nunique(
        ds.map_batches(lambda t: pa.table({
            "key": t.column(p_col).cast(pa.string()),
            "v": t.column(o_col).cast(pa.string())}),
            batch_format="pyarrow"), "key", "v", nb=nb)
    pred = shuffle_hash_join(
        pred_n,
        pred_s.map_batches(
            lambda t: t.rename_columns(["key", "n_subjects"]),
            batch_format="pyarrow"),
        on=["key"], how="left", nb=nb)
    pred = shuffle_hash_join(
        pred,
        pred_o.map_batches(
            lambda t: t.rename_columns(["key", "n_objects"]),
            batch_format="pyarrow"),
        on=["key"], how="left", nb=nb).map_batches(
        lambda t: pa.table({
            "part": pa.array(["predicate"] * t.num_rows, pa.string()),
            "key": t.column("key"),
            "n_triples": t.column("n_triples").cast(pa.int64()),
            "n_subjects": t.column("n_subjects").cast(pa.int64()),
            "n_objects": t.column("n_objects").cast(pa.int64())}),
        batch_format="pyarrow")

    # dataset totals (constant-key nunique pair-buckets, so the one
    # global key cannot melt a single reducer)
    def const(t: pa.Table, col: str) -> pa.Table:
        return pa.table({
            "key": pa.array(["(all)"] * t.num_rows, pa.string()),
            "v": t.column(col).cast(pa.string())})

    tot_n = sum_by_key(
        ds.map_batches(lambda t: pa.table({
            "key": pa.array(["(all)"] * t.num_rows, pa.string()),
            "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "key", "one", nb=nb, out_col="n_triples")
    tot_s = groupby_nunique(
        ds.map_batches(lambda t: const(t, s_col),
                       batch_format="pyarrow"), "key", "v", nb=nb)
    tot_o = groupby_nunique(
        ds.map_batches(lambda t: const(t, o_col),
                       batch_format="pyarrow"), "key", "v", nb=nb)
    tot = shuffle_hash_join(
        tot_n, tot_s.map_batches(
            lambda t: t.rename_columns(["key", "n_subjects"]),
            batch_format="pyarrow"),
        on=["key"], how="left", nb=nb)
    tot = shuffle_hash_join(
        tot, tot_o.map_batches(
            lambda t: t.rename_columns(["key", "n_objects"]),
            batch_format="pyarrow"),
        on=["key"], how="left", nb=nb).map_batches(
        lambda t: pa.table({
            "part": pa.array(["dataset"] * t.num_rows, pa.string()),
            "key": t.column("key"),
            "n_triples": t.column("n_triples").cast(pa.int64()),
            "n_subjects": t.column("n_subjects").cast(pa.int64()),
            "n_objects": t.column("n_objects").cast(pa.int64())}),
        batch_format="pyarrow")

    # class partition over rdf:type triples (may be empty -> schema
    # guard: build from counted parts only)
    typed = mat_cut(ds.map_batches(
        lambda t: t.filter(pc.equal(
            t.column(p_col).cast(pa.string()),
            pa.scalar(type_pred))),
        batch_format="pyarrow"))
    out = pred.union(tot)
    if typed.count() > 0:
        cls_n = sum_by_key(
            typed.map_batches(lambda t: ones(t, o_col),
                              batch_format="pyarrow"),
            "key", "one", nb=nb, out_col="n_triples")
        cls_s = groupby_nunique(
            typed.map_batches(lambda t: pa.table({
                "key": t.column(o_col).cast(pa.string()),
                "v": t.column(s_col).cast(pa.string())}),
                batch_format="pyarrow"), "key", "v", nb=nb)
        cls = shuffle_hash_join(
            cls_n, cls_s.map_batches(
                lambda t: t.rename_columns(["key", "n_subjects"]),
                batch_format="pyarrow"),
            on=["key"], how="left", nb=nb).map_batches(
            lambda t: pa.table({
                "part": pa.array(["class"] * t.num_rows, pa.string()),
                "key": t.column("key"),
                "n_triples": t.column("n_triples").cast(pa.int64()),
                "n_subjects": t.column("n_subjects").cast(pa.int64()),
                "n_objects": pa.nulls(t.num_rows, pa.int64())}),
            batch_format="pyarrow")
        out = out.union(cls)
    schema = pa.schema([
        pa.field("part", pa.string()), pa.field("key", pa.string()),
        pa.field("n_triples", pa.int64()),
        pa.field("n_subjects", pa.int64()),
        pa.field("n_objects", pa.int64())])
    return out.map_batches(lambda t: t.cast(schema),
                           batch_format="pyarrow")


def condensation(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
    nb: int = 32,
    local_cutoff_edges: int = 200_000,
) -> "ray.data.Dataset":
    """Condensation DAG of a directed graph: contract every strongly
    connected component (:func:`scc` — labels are component-min node
    ids) to one node and keep the DISTINCT cross-component edges,
    weighted by how many original edges they collapse. The result is
    always a DAG — the classic cycle-collapse step before any
    topological pass (taxonomy repair over a cyclic subClassOf crawl,
    redirect-chain untangling, dependency layering).

    Shape: one :func:`scc` run, two bucketed hash joins to relabel
    edge endpoints, one map-side-combined count per condensed edge.

    Returns ``(src_scc, dst_scc, n_edges)``; self-edges inside a
    component drop.
    """
    import ray.data as rd

    from .canonicalize import dedup_exact, sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    edges = (rd.from_arrow(edges) if isinstance(edges, pa.Table)
             else edges)
    from .util import cheap_arrow_schema, map_known, with_schema

    labels = mat_cut(scc(edges, src_col=src_col, dst_col=dst_col,
                         max_rounds=max_rounds, nb=nb,
                         local_cutoff_edges=local_cutoff_edges))
    E = dedup_exact(edges.map_batches(
        lambda t: pa.table({"src": t.column(src_col),
                            "dst": t.column(dst_col)}),
        batch_format="pyarrow"), ["src", "dst"], nb=nb)
    lsch = cheap_arrow_schema(labels)
    if lsch is not None:
        # dedup preserves the (src, dst) pair schema; the node type
        # matches the scc label type — annotating E spares the join a
        # schema-fetch execution of the whole dedup shuffle
        _t = lsch.field("node").type
        with_schema(E, pa.schema([pa.field("src", _t),
                                  pa.field("dst", _t)]))
    j = shuffle_hash_join(
        E, map_known(labels, lambda t: pa.table(
            {"src": t.column("node"),
             "src_scc": t.column("scc")})),
        on=["src"], how="inner", nb=nb)
    j = shuffle_hash_join(
        j, map_known(labels, lambda t: pa.table(
            {"dst": t.column("node"),
             "dst_scc": t.column("scc")})),
        on=["dst"], how="inner", nb=nb)
    cross = j.map_batches(
        lambda t: pa.table({
            "src_scc": t.column("src_scc").cast(pa.int64()),
            "dst_scc": t.column("dst_scc").cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64))}).filter(
            pc.not_equal(t.column("src_scc").cast(pa.int64()),
                         t.column("dst_scc").cast(pa.int64()))),
        batch_format="pyarrow")
    return sum_by_key(cross, ["src_scc", "dst_scc"], "one", nb=nb,
                      out_col="n_edges")


def topo_layers(
    edges,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 32,
    max_rounds: int = 200,
) -> "ray.data.Dataset":
    """Kahn topological layering over a DAG edge list: every node gets
    the round in which it would be peeled by Kahn's algorithm —
    equivalently ``layer(v) = length of the longest path from any
    zero-in-degree node to v``. The scheduling primitive for
    dependency DAGs (ontology import order, pipeline stage ordering,
    crawl-before relations): all nodes in layer k can run in parallel
    once layers < k finished.

    Shape per round: one fused dedup+anti-join (`_subtract_new`) finds
    the current sources (live nodes with no incoming live edge), a
    second subtracts them from the live set, and one semi join drops
    the edges leaving assigned nodes — every step is a bucketed
    shuffle over frontier-sized data; rounds = DAG depth. A round that
    assigns nothing while nodes remain means a cycle → raises (a
    silent partial layering would be wrong).
    """
    import ray.data as rd

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    sch = edges_ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        ft = base.field(src_col).type
        is_str = (pa.types.is_string(ft) or pa.types.is_large_string(ft))
    else:
        ft = base.types[list(base.names).index(src_col)]
        is_str = str(ft) in ("object", "string", "string[python]")
    node_t = pa.string() if is_str else pa.int64()
    e = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column(src_col).cast(node_t),
                            "dst": t.column(dst_col).cast(node_t)}),
        batch_format="pyarrow").materialize()
    empty = pa.table({"node": pa.array([], node_t),
                      "layer": pa.array([], pa.int64())})
    if e.count() == 0:
        return rd.from_arrow(empty)
    live = mat_cut(dedup_exact(
        e.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays([
                t.column("src").combine_chunks(),
                t.column("dst").combine_chunks()])}),
            batch_format="pyarrow"),
        ["node"], nb=nb))

    def _with_layer(r: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "layer", pa.array(np.full(t.num_rows, r, np.int64)))
        return f

    layers: list = []
    for r in range(max_rounds):
        n_live = live.count()
        if n_live == 0:
            break
        if e.count() == 0:
            # no edges left: every remaining live node is a source
            layers.append(live.map_batches(_with_layer(r),
                                           batch_format="pyarrow"))
            break
        heads = e.map_batches(
            lambda t: pa.table({"node": t.column("dst")}),
            batch_format="pyarrow")
        layer = mat_cut(_subtract_new(live, heads, ["node"], nb,
                                      key_type=node_t))
        if layer.count() == 0:
            raise ValueError(
                "topo_layers: no zero-in-degree node among "
                f"{n_live} remaining — the graph has a cycle")
        layers.append(layer.map_batches(_with_layer(r),
                                        batch_format="pyarrow").materialize())
        live = mat_cut(_subtract_new(live, layer, ["node"], nb,
                                     key_type=node_t))
        e = mat_cut(shuffle_hash_join(
            e, live.map_batches(
                lambda t: pa.table({"src": t.column("node")}),
                batch_format="pyarrow"),
            on=["src"], how="semi", nb=nb))
    else:
        if live.count() > 0:
            raise RuntimeError(
                f"topo_layers: no fixpoint within max_rounds={max_rounds}")
    if not layers:
        return rd.from_arrow(empty)
    out = layers[0]
    for d in layers[1:]:
        out = out.union(d)
    return out


def betweenness(
    edges,
    sources=None,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 32,
    max_iters: int = 60,
    sample_every: "int | None" = None,
    max_exact_nodes: int = 8192,
    rescale: bool = True,
) -> "ray.data.Dataset":
    """Betweenness centrality (Brandes, unweighted DIRECTED shortest
    paths) — exact over all nodes by default, with a GUARDRAIL: an
    exact run is O(|V|) sources of composite-key BFS state, so when
    ``sources is None`` and the distinct node count exceeds
    ``max_exact_nodes`` the call RAISES with instructions instead of
    attempting an infeasible web-scale sweep. Pass ``sample_every=k``
    for the standard sampled estimator: sources are the md5-chosen
    every-k-th node subset S, and the returned scores are ALREADY
    rescaled by n/|S| (unbiased estimate of the exact sums;
    ``rescale=False`` returns the raw partial sums). An explicit
    ``sources`` list still returns raw per-source sums, unscaled —
    the caller chose the subset and owns its statistics.

    bc(v) = Σ_{s∈S} Σ_{s≠v≠t} σ_st(v)/σ_st — computed with Brandes'
    dependency accumulation, re-expressed in rounds of bucketed
    shuffles (no per-source sequential BFS):

    - FORWARD: one composite-key (source, node) BFS carrying the
      shortest-path COUNT σ (int64 — exact): each round's messages
      pre-aggregate σ per (s, node) map-side (sum_by_key), then one
      anti join settles only first-time nodes; every source shares
      every round's shuffle, like :func:`multi_source_bfs`.
    - BACKWARD: per depth layer d (deepest first), the shortest-path
      DAG edges u→w (dist u = d, dist w = d+1) are recovered with two
      bucketed joins against the settled layers; δ(s,u) =
      Σ σ_u/σ_w·(1+δ(s,w)) folds in one sum_by_key; bc accumulates δ
      over non-source rows.

    Rounds = 2 × eccentricity bound; ``max_iters`` guards. Returns
    (node, bc round 6) zero-filled over every settled node."""
    import ray.data as rd

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) else edges
    e = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column(src_col).cast(pa.int64()),
                            "dst": t.column(dst_col).cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    factor = 1.0
    if sources is None:
        from .canonicalize import dedup_exact
        srcs = mat_cut(dedup_exact(e.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays([
                t.column("src").combine_chunks(),
                t.column("dst").combine_chunks()])}),
            batch_format="pyarrow"), ["node"], nb=nb))
        n_nodes = srcs.count()
        if sample_every is not None and sample_every == 1:
            # explicit every-node "sample": the caller opted into the
            # exact sweep — no guard, factor 1
            pass
        elif sample_every is not None and sample_every > 1:
            k = int(sample_every)

            def pick(t: pa.Table, _k=k) -> pa.Table:
                from ..functions.hashing import md5_u32
                keep = md5_u32(
                    t.column("node").to_pylist()) % _k == 0
                return t.filter(pa.array(keep, pa.bool_()))

            srcs = mat_cut(srcs.map_batches(
                pick, batch_format="pyarrow"))
            n_s = srcs.count()
            if n_s == 0:
                raise ValueError(
                    "betweenness: sample_every=%d selected zero "
                    "sources out of %d nodes — lower sample_every"
                    % (k, n_nodes))
            if rescale:
                factor = n_nodes / n_s
        elif n_nodes > max_exact_nodes:
            raise ValueError(
                "betweenness: exact run over all %d nodes exceeds "
                "max_exact_nodes=%d — O(|V|) sources of composite-key "
                "BFS state is infeasible at this size; pass "
                "sample_every=k for the rescaled sampled estimator, "
                "or raise max_exact_nodes explicitly"
                % (n_nodes, max_exact_nodes))
    else:
        if sample_every is not None:
            raise ValueError(
                "betweenness: sample_every only applies when "
                "sources is None (the explicit sources list IS the "
                "sample)")
        srcs = rd.from_arrow(pa.table({"node": pa.array(
            sorted(set(int(x) for x in sources)), pa.int64())}))

    layer = mat_cut(srcs.map_batches(
        lambda t: pa.table({
            "lm": t.column("node").cast(pa.int64()),
            "node": t.column("node").cast(pa.int64()),
            "sig": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow"))
    layers = [layer]
    settled = layer
    for _ in range(max_iters):
        if layer.count() == 0:
            layers.pop()
            break
        msgs = shuffle_hash_join(
            layer.map_batches(
                lambda t: t.select(["node", "lm", "sig"])
                .rename_columns(["src", "lm", "sig"]),
                batch_format="pyarrow"),
            e, on=["src"], how="inner", nb=nb)
        cand = mat_cut(sum_by_key(
            msgs.map_batches(
                lambda t: pa.table({
                    "lm": t.column("lm").cast(pa.int64()),
                    "node": t.column("dst").cast(pa.int64()),
                    "sig": t.column("sig").cast(pa.int64())}),
                batch_format="pyarrow"),
            ["lm", "node"], "sig", nb=nb))
        if cand.count() == 0:
            # every frontier node was a sink: BFS is settled
            break
        layer = mat_cut(shuffle_hash_join(
            cand, settled.map_batches(
                lambda t: t.select(["lm", "node"]),
                batch_format="pyarrow"),
            on=["lm", "node"], how="anti", nb=nb))
        if layer.count() == 0:
            break
        layers.append(layer)
        settled = mat_cut(settled.union(layer))
    else:
        raise RuntimeError(
            f"betweenness: BFS did not settle within max_iters="
            f"{max_iters}; raise it (graph eccentricity exceeds it)")

    D = len(layers) - 1
    # backward dependency accumulation, deepest layer first (δ=0 there)
    delta_next = None  # δ rows (lm, node, delta) for layer d+1
    acc: list = []     # per-layer δ datasets (bc contributions)
    for d in range(D - 1, -1, -1):
        w = layers[d + 1]
        if delta_next is not None:
            w = shuffle_hash_join(
                w, delta_next, on=["lm", "node"], how="left", nb=nb)
            w = w.map_batches(
                lambda t: pa.table({
                    "lm": t.column("lm").cast(pa.int64()),
                    "node": t.column("node").cast(pa.int64()),
                    "sig": t.column("sig").cast(pa.int64()),
                    "delta": pc.fill_null(
                        t.column("delta").cast(pa.float64()), 0.0)}),
                batch_format="pyarrow")
        else:
            w = w.map_batches(
                lambda t: t.append_column(
                    "delta", pa.array(np.zeros(t.num_rows, np.float64))),
                batch_format="pyarrow")
        # DAG edges into layer d: u(src) at depth d, w(dst) at depth d+1
        uw = shuffle_hash_join(
            w.map_batches(
                lambda t: pa.table({
                    "dst": t.column("node"), "lm": t.column("lm"),
                    "sig_w": t.column("sig"), "delta": t.column("delta")}),
                batch_format="pyarrow"),
            e, on=["dst"], how="inner", nb=nb)
        contrib = shuffle_hash_join(
            uw.map_batches(
                lambda t: pa.table({
                    "lm": t.column("lm"), "node": t.column("src"),
                    "sig_w": t.column("sig_w"),
                    "delta": t.column("delta")}),
                batch_format="pyarrow"),
            layers[d].map_batches(
                lambda t: pa.table({
                    "lm": t.column("lm"), "node": t.column("node"),
                    "sig_u": t.column("sig")}),
                batch_format="pyarrow"),
            on=["lm", "node"], how="inner", nb=nb)
        contrib = contrib.map_batches(
            lambda t: pa.table({
                "lm": t.column("lm").cast(pa.int64()),
                "node": t.column("node").cast(pa.int64()),
                "part": pc.multiply(
                    pc.divide(t.column("sig_u").cast(pa.float64()),
                              t.column("sig_w").cast(pa.float64())),
                    pc.add(t.column("delta").cast(pa.float64()), 1.0))}),
            batch_format="pyarrow")
        delta_next = mat_cut(sum_by_key(contrib, ["lm", "node"], "part",
                                        nb=nb, out_col="delta"))
        acc.append(delta_next)

    # bc(v) = Σ δ over non-source rows, zero-filled over settled nodes
    nodes = settled.map_batches(
        lambda t: pa.table({"node": pc.unique(
            t.column("node").combine_chunks())}),
        batch_format="pyarrow")
    from .canonicalize import dedup_exact as _dx
    nodes = _dx(nodes, ["node"], nb=nb)
    if not acc:
        return nodes.map_batches(
            lambda t: t.append_column(
                "bc", pa.array(np.zeros(t.num_rows, np.float64))),
            batch_format="pyarrow")
    allc = acc[0]
    for a in acc[1:]:
        allc = allc.union(a)
    pos = allc.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("lm"),
                                        t.column("node"))),
        batch_format="pyarrow")
    bc = mat_cut(sum_by_key(pos, "node", "delta", nb=nb, out_col="bc"))
    if bc.count() == 0:  # all δ landed on sources: every bc is 0
        return nodes.map_batches(
            lambda t: t.append_column(
                "bc", pa.array(np.zeros(t.num_rows, np.float64))),
            batch_format="pyarrow")
    out = shuffle_hash_join(nodes, bc, on=["node"], how="left", nb=nb)
    return out.map_batches(
        lambda t, _f=factor: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "bc": pc.round(pc.multiply(pc.fill_null(
                t.column("bc").cast(pa.float64()), 0.0), _f), 6)}),
        batch_format="pyarrow")


def modularity(
    edges,
    labels,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    label_col: str = "label",
    nb: int = 32,
) -> "pa.Table":
    """Newman modularity Q of a community assignment over an
    undirected graph (each edge listed ONCE, no self-loops) — the
    quality score that decides whether a community detection pass
    (LPA, label spreading) actually found structure:

        Q = (intra / m) - Σ_c (d_c / 2m)²

    with m = |E|, intra = #edges inside a community, d_c = total
    degree of community c. Scale shape: two bucketed label joins tag
    each edge's endpoints, one sum_by_key builds the per-node degree
    census, one more the per-community degree sums; the final scalar
    reduce ships one (Σe, Σd²) partial per block and folds them with
    order-independent math.fsum on the driver — the per-community
    table itself is never collected. Edges whose endpoints are
    missing from ``labels`` raise (a silent drop would inflate Q).

    Returns a ONE-ROW pa.Table ``(m_edges, intra_edges, q)`` with q
    rounded to 6 dp.
    """
    import math

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    e = edges.map_batches(
        lambda t: pa.table({"src": t.column(a_col).cast(pa.int64()),
                            "dst": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow")
    lab = labels.map_batches(
        lambda t: pa.table({"node": t.column(node_col).cast(pa.int64()),
                            "lab": t.column(label_col).cast(pa.int64())}),
        batch_format="pyarrow")
    e = mat_cut(e)
    m = e.count()
    if m == 0:
        return pa.table({"m_edges": pa.array([0], pa.int64()),
                         "intra_edges": pa.array([0], pa.int64()),
                         "q": pa.array([0.0], pa.float64())})

    # tag both endpoints with their community
    t1 = shuffle_hash_join(
        e, lab.map_batches(lambda t: pa.table(
            {"src": t.column("node"), "lab_a": t.column("lab")}),
            batch_format="pyarrow"), on=["src"], how="left", nb=nb)
    t2 = shuffle_hash_join(
        t1, lab.map_batches(lambda t: pa.table(
            {"dst": t.column("node"), "lab_b": t.column("lab")}),
            batch_format="pyarrow"), on=["dst"], how="left", nb=nb)

    def intra_part(t: pa.Table) -> pa.Table:
        la, lb = t.column("lab_a"), t.column("lab_b")
        miss = int(pc.sum(pc.cast(pc.or_(
            pc.is_null(la), pc.is_null(lb)), pa.int64())).as_py() or 0)
        if miss:
            raise ValueError(
                f"{miss} edge endpoint(s) missing from labels — "
                "modularity over a partial labeling would be wrong")
        same = pc.sum(pc.cast(pc.equal(la, lb), pa.int64())).as_py() or 0
        return pa.table({"same": pa.array([same], pa.int64())})

    # iter_batches may coalesce the one-row partials — sum whole columns
    intra = int(sum(
        pc.sum(b["same"]).as_py() or 0
        for b in t2.map_batches(intra_part, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")))

    # degree census: each edge endpoint contributes 1
    deg_src = e.map_batches(
        lambda t: pa.table({"node": t.column("src"),
                            "d": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    deg_dst = e.map_batches(
        lambda t: pa.table({"node": t.column("dst"),
                            "d": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    deg = sum_by_key(deg_src.union(deg_dst), "node", "d", nb=nb)
    degl = shuffle_hash_join(deg, lab, on=["node"], how="inner", nb=nb)
    dc = sum_by_key(degl, "lab", "d", nb=nb)

    # Σ d_c² as per-block partials, fsum'd in sorted order (bit-stable
    # under any block arrival order)
    parts: list[float] = []
    for b in dc.map_batches(
            lambda t: pa.table({"p": pa.array([float(np.sum(
                t.column("d").to_numpy().astype(np.float64) ** 2))])}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        parts.extend(b["p"].to_pylist())
    sum_d2 = math.fsum(sorted(parts))
    q = intra / m - sum_d2 / (4.0 * m * m)
    return pa.table({"m_edges": pa.array([m], pa.int64()),
                     "intra_edges": pa.array([intra], pa.int64()),
                     "q": pa.array([round(q, 6)], pa.float64())})


def triple_agreement(
    gold,
    pred,
    cols: "list[str] | None" = None,
    nb: int = 32,
) -> "pa.Table":
    """Precision / recall / F1 of a predicted triple set against a
    gold one — the acceptance gate the north rule states (P/R >= 0.95
    vs the reference annotator). Both sides are set-deduped on
    ``cols`` (default subj/pred/obj), the overlap is ONE bucketed
    semi join, and only three counts ever reach the driver — no
    triple table is collected.

    Returns a ONE-ROW pa.Table
    ``(n_gold, n_pred, n_common, precision, recall, f1)`` rounded to
    6 dp; empty sides yield 0.0 metrics rather than NaN.
    """
    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    cols = cols or ["subj", "pred", "obj"]
    g = mat_cut(dedup_exact(gold.map_batches(
        lambda t: t.select(cols), batch_format="pyarrow"), cols, nb=nb))
    p = mat_cut(dedup_exact(pred.map_batches(
        lambda t: t.select(cols), batch_format="pyarrow"), cols, nb=nb))
    n_gold, n_pred = g.count(), p.count()
    n_common = (shuffle_hash_join(p, g, on=cols, how="semi", nb=nb).count()
                if n_gold and n_pred else 0)
    precision = n_common / n_pred if n_pred else 0.0
    recall = n_common / n_gold if n_gold else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return pa.table({
        "n_gold": pa.array([n_gold], pa.int64()),
        "n_pred": pa.array([n_pred], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "precision": pa.array([round(precision, 6)], pa.float64()),
        "recall": pa.array([round(recall, 6)], pa.float64()),
        "f1": pa.array([round(f1, 6)], pa.float64())})


def components_incremental(
    old_labels,
    delta_edges,
    node_col: str = "node",
    lab_col: str = "lab",
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 16,
    max_iters: int = 20,
) -> "ray.data.Dataset":
    """Incremental connected-components maintenance — the nightly
    update path when a components labeling (min-node labels, e.g.
    from :func:`string_components`) must absorb a batch of NEW edges
    without re-solving the whole graph: every Δ endpoint resolves to
    its current label (itself when new), the Δ edges collapse to a
    SUPER-GRAPH over labels (size ∝ |Δ|, not |V|+|E|), components run
    on that tiny graph, and ONE final join rewrites the affected old
    labels. Nodes whose component didn't merge keep their label
    byte-identically; work beyond the final rewrite join is
    proportional to the delta.

    Output: ``(node, lab)`` covering old nodes ∪ Δ endpoints, labels
    again the component-minimum node. Incremental ≡ from-scratch is
    pinned in tests on random graphs.
    """
    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    old = mat_cut(old_labels.map_batches(
        lambda t: pa.table({"node": t.column(node_col),
                            "lab": t.column(lab_col)}),
        batch_format="pyarrow"))

    def endpoints(t: pa.Table) -> pa.Table:
        a = t.column(src_col).combine_chunks()
        b = t.column(dst_col).combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b])})

    dnodes = dedup_exact(delta_edges.map_batches(
        endpoints, batch_format="pyarrow"), ["node"], nb=nb)
    # resolve each Δ endpoint to its current label (itself when new)
    resolved = shuffle_hash_join(dnodes, old, on=["node"], how="left",
                                 nb=nb).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "cur": pc.coalesce(t.column("lab"), t.column("node"))}),
        batch_format="pyarrow")
    resolved = mat_cut(resolved)
    # super-edges over labels: one join per endpoint side
    e1 = shuffle_hash_join(
        delta_edges.map_batches(
            lambda t: pa.table({"node": t.column(src_col),
                                "dst0": t.column(dst_col)}),
            batch_format="pyarrow"),
        resolved, on=["node"], how="inner", nb=nb).map_batches(
        lambda t: pa.table({"node": t.column("dst0"),
                            "lsrc": t.column("cur")}),
        batch_format="pyarrow")
    super_e = shuffle_hash_join(e1, resolved.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "ldst": t.column("cur")}),
        batch_format="pyarrow"), on=["node"], how="inner",
        nb=nb).map_batches(
        lambda t: pa.table({"src": t.column("lsrc"),
                            "dst": t.column("ldst")}),
        batch_format="pyarrow")
    super_e = dedup_exact(super_e.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t.column("src"),
                                              t.column("dst")))),
        batch_format="pyarrow"), ["src", "dst"], nb=nb)
    super_e = mat_cut(super_e)
    # Δ endpoints unknown to the old labeling enter with their own
    # resolved label (shared by both branches below)
    new_nodes = shuffle_hash_join(resolved, old, on=["node"], how="anti",
                                  nb=nb).map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "lab": t.column("cur")}),
        batch_format="pyarrow")
    if super_e.count() == 0:
        # Δ adds no merges: old labels + any new isolated-pair nodes
        return old.union(new_nodes)
    mapping = string_components(super_e, nb=nb, max_iters=max_iters)
    mapping = mapping.map_batches(
        lambda t: pa.table({"lab": t.column("node"),
                            "newlab": t.column("lab")}),
        batch_format="pyarrow")
    # rewrite old labels through the mapping (miss = unchanged)
    rewritten = shuffle_hash_join(old, mapping, on=["lab"], how="left",
                                  nb=nb).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "lab": pc.coalesce(t.column("newlab"), t.column("lab"))}),
        batch_format="pyarrow")
    new_rewritten = shuffle_hash_join(new_nodes, mapping, on=["lab"],
                                      how="left", nb=nb).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "lab": pc.coalesce(t.column("newlab"), t.column("lab"))}),
        batch_format="pyarrow")
    return rewritten.union(new_rewritten)


def conductance(
    edges,
    labels,
    a_col: str = "a",
    b_col: str = "b",
    node_col: str = "node",
    label_col: str = "label",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-community conductance φ(c) = cut(c) / min(vol(c), 2m−vol(c))
    over an undirected graph (each edge once, no self-loops) — the
    cut-quality complement of :func:`modularity` (a community can
    score high Q yet leak badly; φ says how porous each one is).
    Unlabeled endpoints raise like modularity. Shape: the same two
    bucketed label joins; the cut census is one composite sum_by_key
    over both endpoints of label-crossing edges; volume joins the
    degree census to labels. Output: ``(label, cut_edges, volume,
    conductance)`` with conductance rounded to 6 dp (null for a
    community with zero volume — cannot happen for labels attached to
    edges, but guards empty slices).
    """
    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join
    from .util import mat_cut

    e = edges.map_batches(
        lambda t: pa.table({"src": t.column(a_col).cast(pa.int64()),
                            "dst": t.column(b_col).cast(pa.int64())}),
        batch_format="pyarrow")
    lab = labels.map_batches(
        lambda t: pa.table({"node": t.column(node_col).cast(pa.int64()),
                            "lab": t.column(label_col).cast(pa.int64())}),
        batch_format="pyarrow")
    e = mat_cut(e)
    m = e.count()
    t1 = shuffle_hash_join(
        e, lab.map_batches(lambda t: pa.table(
            {"src": t.column("node"), "lab_a": t.column("lab")}),
            batch_format="pyarrow"), on=["src"], how="left", nb=nb)
    t2 = mat_cut(shuffle_hash_join(
        t1, lab.map_batches(lambda t: pa.table(
            {"dst": t.column("node"), "lab_b": t.column("lab")}),
            batch_format="pyarrow"), on=["dst"], how="left", nb=nb))

    def cut_rows(t: pa.Table) -> pa.Table:
        la, lb = t.column("lab_a"), t.column("lab_b")
        miss = int(pc.sum(pc.cast(pc.or_(
            pc.is_null(la), pc.is_null(lb)), pa.int64())).as_py() or 0)
        if miss:
            raise ValueError(
                f"{miss} edge endpoint(s) missing from labels — "
                "conductance over a partial labeling would be wrong")
        crossing = t.filter(pc.invert(pc.equal(la, lb)))
        both = pa.concat_arrays([
            crossing.column("lab_a").combine_chunks(),
            crossing.column("lab_b").combine_chunks()])
        return pa.table({"lab": both,
                         "c": pa.array(np.ones(len(both), np.int64))})

    cut = sum_by_key(t2.map_batches(cut_rows, batch_format="pyarrow"),
                     "lab", "c", nb=nb, out_col="cut_edges")
    deg = sum_by_key(
        e.map_batches(lambda t: pa.table({
            "node": pa.concat_arrays([t.column("src").combine_chunks(),
                                      t.column("dst").combine_chunks()]),
            "d": pa.array(np.ones(2 * t.num_rows, np.int64))}),
            batch_format="pyarrow"), "node", "d", nb=nb)
    vol = sum_by_key(
        shuffle_hash_join(deg, lab, on=["node"], how="inner", nb=nb),
        "lab", "d", nb=nb, out_col="volume")
    j = shuffle_hash_join(vol, cut, on=["lab"], how="left", nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        v = t.column("volume").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c = pc.fill_null(t.column("cut_edges"), 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        denom = np.minimum(v, 2.0 * m - v)
        phi = np.where(denom > 0, c / np.maximum(denom, 1.0), np.nan)
        return pa.table({
            "label": t.column("lab").cast(pa.int64()),
            "cut_edges": pa.array(c.astype(np.int64)),
            "volume": pa.array(v.astype(np.int64)),
            "conductance": pa.array(np.round(phi, 6))})

    return j.map_batches(finish, batch_format="pyarrow")


def span_agreement(
    gold,
    pred,
    key_col: str = "doc_id",
    start_col: str = "start",
    end_col: str = "end",
    min_overlap: int = 1,
    nb: int = 32,
) -> "pa.Table":
    """SOFT span-level annotation agreement: a predicted span counts
    as correct when it overlaps ANY gold span of the same document by
    at least ``min_overlap`` characters (half-open [start, end)
    spans) — the mention-level relaxation of the exact triple gate,
    which punishes one-character boundary drift too hard for NER-style
    QA. Both sides set-dedup on (key, start, end); the overlap test
    is one bucketed key-equijoin + vectorized range filter (bounded
    by per-document span counts), then distinct matched spans count
    each side once.

    Returns a ONE-ROW pa.Table ``(n_gold, n_pred, matched_pred,
    matched_gold, precision, recall, f1)`` rounded to 6 dp.
    """
    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join
    from .util import mat_cut

    cols = [key_col, start_col, end_col]

    def clean(ds):
        return mat_cut(dedup_exact(ds.map_batches(
            lambda t: t.select(cols), batch_format="pyarrow"),
            cols, nb=nb))

    g, p = clean(gold), clean(pred)
    n_gold, n_pred = g.count(), p.count()
    if n_gold == 0 or n_pred == 0:
        return pa.table({
            "n_gold": pa.array([n_gold], pa.int64()),
            "n_pred": pa.array([n_pred], pa.int64()),
            "matched_pred": pa.array([0], pa.int64()),
            "matched_gold": pa.array([0], pa.int64()),
            "precision": pa.array([0.0], pa.float64()),
            "recall": pa.array([0.0], pa.float64()),
            "f1": pa.array([0.0], pa.float64())})
    gr = g.map_batches(
        lambda t: pa.table({key_col: t.column(key_col),
                            "gs": t.column(start_col),
                            "ge": t.column(end_col)}),
        batch_format="pyarrow")
    joined = shuffle_hash_join(p, gr, on=[key_col], how="inner", nb=nb)

    def overlapping(t: pa.Table) -> pa.Table:
        s1 = t.column(start_col).to_numpy(zero_copy_only=False)
        e1 = t.column(end_col).to_numpy(zero_copy_only=False)
        s2 = t.column("gs").to_numpy(zero_copy_only=False)
        e2 = t.column("ge").to_numpy(zero_copy_only=False)
        ov = np.minimum(e1, e2) - np.maximum(s1, s2)
        return t.filter(pa.array(ov >= min_overlap))

    hits = mat_cut(joined.map_batches(overlapping,
                                      batch_format="pyarrow"))
    matched_pred = dedup_exact(hits.map_batches(
        lambda t: t.select(cols), batch_format="pyarrow"),
        cols, nb=nb).count()
    matched_gold = dedup_exact(hits.map_batches(
        lambda t: pa.table({key_col: t.column(key_col),
                            start_col: t.column("gs"),
                            end_col: t.column("ge")}),
        batch_format="pyarrow"), cols, nb=nb).count()
    precision = matched_pred / n_pred
    recall = matched_gold / n_gold
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return pa.table({
        "n_gold": pa.array([n_gold], pa.int64()),
        "n_pred": pa.array([n_pred], pa.int64()),
        "matched_pred": pa.array([matched_pred], pa.int64()),
        "matched_gold": pa.array([matched_gold], pa.int64()),
        "precision": pa.array([round(precision, 6)], pa.float64()),
        "recall": pa.array([round(recall, 6)], pa.float64()),
        "f1": pa.array([round(f1, 6)], pa.float64())})


def referential_integrity(
    triples: "ray.data.Dataset",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    nb: int = 32,
) -> pa.Table:
    """Per-predicate dangling-edge census — the KG referential-
    integrity check run before publishing a constructed graph: an
    object value is DANGLING when it never appears as any subject
    (the triple points at a node the graph does not describe).
    Returns ``(pred, n_edges, n_dangling, dangling_ratio)``, one row
    per predicate, sorted.

    Scale shape: subjects reduce to distinct map-side then through the
    bucketed exact dedup (distinct node ids travel, never triples);
    the dangling test is ONE bucketed anti-join of the (pred, obj)
    projection against that node set; both censuses are map-side
    pre-aggregated counts. No driver-side row loops; the driver sees
    only per-predicate counters.
    """
    import pandas as pd

    from .canonicalize import dedup_exact
    from .join import shuffle_hash_join

    nodes = dedup_exact(
        triples.select_columns([s_col]).map_batches(
            lambda b: pa.table({o_col: pc.unique(
                b.column(s_col).combine_chunks()
                if isinstance(b.column(s_col), pa.ChunkedArray)
                else b.column(s_col)).drop_null()}),
            batch_format="pyarrow", batch_size=65536),
        [o_col], nb=nb)

    edges = triples.select_columns([p_col, o_col])
    dangling = shuffle_hash_join(edges, nodes, [o_col], how="anti",
                                 nb=nb)

    def census(batch: pa.Table, value_name: str) -> pa.Table:
        g = (pa.table({p_col: batch.column(p_col),
                       "n": pa.array(
                           np.ones(batch.num_rows, np.int64))})
             .group_by([p_col]).aggregate([("n", "sum")])
             .rename_columns([p_col, value_name]))
        return g

    def _agg(ds: "ray.data.Dataset", value_name: str) -> "pd.DataFrame":
        parts = ds.map_batches(
            lambda b, _v=value_name: census(b, _v),
            batch_format="pyarrow", batch_size=65536).to_pandas()
        if parts.empty:
            return pd.DataFrame({p_col: [], value_name: []})
        return parts.groupby(p_col, as_index=False)[value_name].sum()

    total = _agg(edges, "n_edges")
    bad = _agg(dangling, "n_dangling")
    out = total.merge(bad, on=p_col, how="left")
    out["n_dangling"] = out["n_dangling"].fillna(0).astype("int64")
    out["n_edges"] = out["n_edges"].astype("int64")
    out["dangling_ratio"] = (out["n_dangling"] / out["n_edges"]).round(6)
    out = (out.rename(columns={p_col: "pred"})
           .sort_values("pred").reset_index(drop=True))
    return pa.Table.from_pandas(
        out[["pred", "n_edges", "n_dangling", "dangling_ratio"]],
        preserve_index=False)


def neighbor_agg(
    edges,
    feats,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "node",
    feat_col: str = "x",
    nb: int = 32,
) -> "ray.data.Dataset":
    """k-hop neighbor feature propagation (GraphSAGE-mean-style
    pre-aggregation, the graph-ML feature-engineering primitive):
    per node, hop h's feature is the MEAN of its in-neighbors'
    hop-(h−1) features, seeded from ``feats``; nodes with no
    in-neighbors at a hop carry NULL for that hop (SQL AVG-over-join
    semantics). Output: one row per node that appears at any hop,
    ``(node, x_h1 … x_hk)``.

    Scale shape: per hop, ONE shuffle join (edges ⋈ current features
    on src) + ONE composite sum_by_key producing (Σ feat, Σ 1) per
    dst — the mean is algebraic, so map-side combining applies; the
    feature table never exceeds |V| rows and hop h never revisits
    hop h−1's edges. k is validated ≤ 8 (each hop is a shuffle)."""
    import ray.data as rd

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    if not 1 <= k <= 8:
        raise ValueError("k must be in [1, 8]")
    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) \
        else edges
    feats_ds = rd.from_arrow(feats) if isinstance(feats, pa.Table) \
        else feats
    e = edges_ds.map_batches(
        lambda t: pa.table({"src": t.column(src_col),
                            "dst": t.column(dst_col)}),
        batch_format="pyarrow")
    cur = feats_ds.map_batches(
        lambda t: pa.table({
            "src": t.column(id_col),
            "f": pc.cast(t.column(feat_col), pa.float64())}),
        batch_format="pyarrow")
    hops = []
    for h in range(1, k + 1):
        j = shuffle_hash_join(e, cur, on=["src"], how="inner", nb=nb)
        j = j.map_batches(
            lambda t: pa.table({
                "dst": t.column("dst"), "f": t.column("f"),
                "one": pa.array(np.ones(t.num_rows, np.float64))}),
            batch_format="pyarrow")
        sf = sum_by_key(j, "dst", "f", nb=nb, out_col="sf")
        cn = sum_by_key(j.map_batches(
            lambda t: t.select(["dst", "one"]),
            batch_format="pyarrow"), "dst", "one", nb=nb,
            out_col="cnt")
        m = shuffle_hash_join(sf, cn, on=["dst"], how="inner", nb=nb)
        cur = m.map_batches(
            lambda t: pa.table({
                "src": t.column("dst"),
                "f": pc.divide(t.column("sf"), t.column("cnt"))}),
            batch_format="pyarrow").materialize()
        hops.append((h, cur))
    # assemble the per-hop columns with full-outer joins on node
    out = None
    for h, ds_h in hops:
        col = ds_h.map_batches(
            lambda t, name=f"x_h{h}": pa.table({
                "node": t.column("src"), name: t.column("f")}),
            batch_format="pyarrow")
        out = col if out is None else shuffle_hash_join(
            out, col, on=["node"], how="full", nb=nb)
    return out


def edge_cut_report(
    edges,
    n_parts: int,
    src_col: str = "src",
    dst_col: str = "dst",
    nb: int = 16,
) -> "pa.Table":
    """Partitioning-quality census — for a hash partitioning of nodes
    into ``n_parts`` (the repo's md5 convention), the fraction of
    edges whose endpoints land in different partitions (the edge cut
    every per-partition graph operator pays as shuffle volume at
    scale). ONE stateless pass + a scalar reduce; md5-replayable, so
    a SQL oracle re-derives it. Returns ONE row
    ``(n_edges, n_cut, cut_ratio)``; null-endpoint edges are
    excluded (no partition)."""
    import hashlib

    import ray.data as rd

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) \
        else edges

    def part(ids) -> np.ndarray:
        return np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             % n_parts for i in ids), np.int64, count=len(ids))

    def census(t: pa.Table) -> pa.Table:
        s, d = t.column(src_col), t.column(dst_col)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table({"s": s, "d": d}).filter(ok)
        ps = part(t2.column("s").to_pylist())
        pd_ = part(t2.column("d").to_pylist())
        return pa.table({
            "n": pa.array([len(ps)], pa.int64()),
            "cut": pa.array([int((ps != pd_).sum())], pa.int64())})

    parts = edges_ds.map_batches(census, batch_format="pyarrow",
                                 batch_size=65536).take_all()
    n = sum(r["n"] for r in parts)
    cut = sum(r["cut"] for r in parts)
    return pa.table({
        "n_edges": pa.array([n], pa.int64()),
        "n_cut": pa.array([cut], pa.int64()),
        "cut_ratio": pa.array(
            [round(cut / n, 6) if n else None], pa.float64())})


def sample_neighbors(
    edges: "ray.data.Dataset",
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    seed: int = 7,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Deterministic k-per-node neighbor sampling — the GraphSAGE /
    GNN mini-batch prep step (Hamilton et al. 2017, public): cap every
    node's out-neighborhood at ``k`` sampled edges so downstream
    feature aggregation touches a bounded fan-out even at hub nodes.
    Replayable by construction (the random_walks contract): each
    DISTINCT edge draws priority ``md5(f"{src}:{dst}:{seed}")`` and a
    node keeps its k smallest-priority neighbors (ties — 32-bit md5
    collisions — break by dst asc, so the draw is a total order and a
    failed 100-TB job re-runs to the identical sample).

    Scale shape: one exact-dedup bucket shuffle over the edge set,
    then the generic ``topk_per_key`` kernel (one src-bucket shuffle,
    Arrow-native rank, hot-hub buckets degrade via the sorted
    sub-slice spill). Null endpoints are dropped (an edge with an
    unknown end samples nothing). Output: ``(src, dst)`` with ≤ k
    rows per src. SQL twin: row_number() OVER (PARTITION BY src
    ORDER BY md5-draw, dst) ≤ k."""
    from ..functions.hashing import md5_u32
    from .canonicalize import dedup_exact
    from .windows import topk_per_key

    if k < 1:
        raise ValueError("sample_neighbors: k must be >= 1")

    def _sel(t: pa.Table) -> pa.Table:
        s, d = t.column(src_col), t.column(dst_col)
        return pa.table({"src": s, "dst": d}).filter(
            pc.and_(pc.is_valid(s), pc.is_valid(d)))

    E = dedup_exact(edges.map_batches(_sel, batch_format="pyarrow"),
                    ["src", "dst"], nb=nb)

    def prio(t: pa.Table) -> pa.Table:
        s = pc.cast(t.column("src"), pa.string()).to_pylist()
        d = pc.cast(t.column("dst"), pa.string()).to_pylist()
        draws = md5_u32([f"{a}:{b}:{seed}" for a, b in zip(s, d)])
        return t.append_column("__prio", pa.array(draws, pa.int64()))

    ranked = topk_per_key(
        E.map_batches(prio, batch_format="pyarrow"),
        "src", ["__prio", "dst"], k=k, nb=nb)
    return ranked.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow")


def node2vec_walks(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    walk_len: int = 2,
    walks_per_node: int = 1,
    w_return: int = 1,
    w_common: int = 1,
    w_far: int = 1,
    seed: int = 7,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Seeded DETERMINISTIC node2vec walks (Grover & Leskovec 2016,
    public) — ``random_walks`` with the SECOND-ORDER bias: from edge
    (prev → node), candidate ``next`` draws integer weight
    ``w_return`` if next == prev, ``w_common`` if the edge
    prev → next exists (distance 1), else ``w_far`` (the classic
    1/p : 1 : 1/q ratios as exact integers so the draw is replayable
    in SQL with no float roulette). Step 1 is first-order uniform
    (no prev yet); step t ≥ 2 picks the candidate whose cumulative-
    weight interval (neighbors in dst-rank order) contains
    ``md5(f"{node}:{prev}:{walk}:{t}:{seed}") mod W``. A walk dies at
    sinks and when its candidate weights sum to 0.

    Scale shape per biased step: ONE fan-out join frontier ⋈
    adjacency (volume = Σ deg over frontier — node2vec inherently
    scores the whole neighborhood), ONE (prev, next) membership left
    join against the edge set, ONE (start, walk) bucket shuffle with
    a vectorized run-geometry pick — no per-row Python beyond the
    one md5 draw per walk. Output: ``(start, walk, step, node)``
    with step 0 = the start node."""
    from ..functions.hashing import md5_u32
    from .canonicalize import _B, _add_bucket, dedup_exact
    from .join import shuffle_hash_join

    for name, w in (("w_return", w_return), ("w_common", w_common),
                    ("w_far", w_far)):
        if not isinstance(w, (int, np.integer)) or w < 0:
            raise ValueError(f"node2vec_walks: {name} must be an "
                             f"int >= 0, got {w!r}")
    if w_return + w_common + w_far == 0:
        raise ValueError("node2vec_walks: all weights are 0")

    def _sel(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column(src_col),
                         "dst": t.column(dst_col)})

    E = dedup_exact(edges.map_batches(_sel, batch_format="pyarrow"),
                    ["src", "dst"], nb=nb)

    def rank_group(g: pa.Table) -> pa.Table:
        t = g.select(["src", "dst"]).sort_by(
            [("src", "ascending"), ("dst", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({
                "node": t.column("src"), "next": t.column("dst"),
                "rank": pa.array([], pa.int64()),
                "deg": pa.array([], pa.int64())})
        arr = t.column("src").to_pandas().to_numpy()
        starts = np.r_[True, arr[1:] != arr[:-1]]
        run_id = np.cumsum(starts) - 1
        start_idx = np.flatnonzero(starts)
        counts = np.diff(np.r_[start_idx, n])
        return pa.table({
            "node": t.column("src"), "next": t.column("dst"),
            "rank": pa.array((np.arange(n) - start_idx[run_id])
                             .astype(np.int64)),
            "deg": pa.array(counts[run_id].astype(np.int64))})

    adj = (E.map_batches(lambda t: _add_bucket(t, ["src"], nb),
                         batch_format="pyarrow")
           .groupby(_B).map_groups(rank_group, batch_format="pyarrow")
           .materialize())
    deg_tbl = adj.map_batches(
        lambda t: t.filter(pc.equal(t.column("rank"), 0))
        .select(["node", "deg"]), batch_format="pyarrow")
    adj_j = adj.map_batches(
        lambda t: t.select(["node", "rank", "next"]),
        batch_format="pyarrow")
    # materialized: the membership join re-reads it every biased step
    # — without this the dedup shuffle in its lineage re-executes
    # per step
    marked = E.map_batches(
        lambda t: pa.table({
            "prev": t.column("src"), "next": t.column("dst"),
            "__has": pa.array(np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow").materialize()

    def fan(t: pa.Table, w=walks_per_node) -> pa.Table:
        node = t.column("node")
        idx = pa.array(np.repeat(np.arange(t.num_rows), w))
        walk = pa.array(np.tile(np.arange(w, dtype=np.int64),
                                t.num_rows))
        n = node.take(idx)
        return pa.table({"start": n, "walk": walk, "node": n})

    def emit(t: pa.Table, step: int) -> pa.Table:
        return pa.table({
            "start": t.column("start"), "walk": t.column("walk"),
            "step": pa.array(np.full(t.num_rows, step, np.int64)),
            "node": t.column("node")})

    frontier0 = deg_tbl.map_batches(fan, batch_format="pyarrow")
    acc = frontier0.map_batches(lambda t: emit(t, 0),
                                batch_format="pyarrow")
    if walk_len < 1:
        return acc

    # step 1: first-order uniform (random_walks draw contract)
    j = shuffle_hash_join(frontier0, deg_tbl, on=["node"],
                          how="inner", nb=nb)

    def choose1(t: pa.Table) -> pa.Table:
        keys = [f"{n}:{r}:1:{seed}" for n, r in
                zip(t.column("node").to_pylist(),
                    t.column("walk").to_pylist())]
        ch = (md5_u32(keys)
              % t.column("deg").to_numpy(zero_copy_only=False))
        return pa.table({
            "start": t.column("start"), "walk": t.column("walk"),
            "node": t.column("node"),
            "rank": pa.array(ch.astype(np.int64))})

    stepped = shuffle_hash_join(
        j.map_batches(choose1, batch_format="pyarrow"), adj_j,
        on=["node", "rank"], how="inner", nb=nb).map_batches(
        lambda t: pa.table({"start": t.column("start"),
                            "walk": t.column("walk"),
                            "prev": t.column("node"),
                            "node": t.column("next")}),
        batch_format="pyarrow").materialize()
    if stepped.count() == 0:
        return acc
    acc = acc.union(stepped.map_batches(
        lambda t: emit(t, 1), batch_format="pyarrow"))
    frontier = stepped

    for t_step in range(2, walk_len + 1):
        cand = shuffle_hash_join(frontier, adj_j, on=["node"],
                                 how="inner", nb=nb)
        cand = shuffle_hash_join(cand, marked, on=["prev", "next"],
                                 how="left", nb=nb)

        def pick(g: pa.Table, ts=t_step) -> pa.Table:
            t = g.sort_by([("start", "ascending"),
                           ("walk", "ascending"),
                           ("rank", "ascending")])
            n = t.num_rows
            empty = pa.table({
                "start": t.column("start").slice(0, 0),
                "walk": pa.array([], pa.int64()),
                "prev": t.column("prev").slice(0, 0),
                "node": t.column("next").slice(0, 0)})
            if n == 0:
                return empty
            s1 = t.column("start").to_pandas().to_numpy()
            s2 = t.column("walk").to_numpy(zero_copy_only=False)
            starts = np.r_[True, (s1[1:] != s1[:-1])
                           | (s2[1:] != s2[:-1])]
            start_idx = np.flatnonzero(starts)
            run_id = np.cumsum(starts) - 1
            nxt = t.column("next")
            prev = t.column("prev")
            node = t.column("node")
            ret = pc.equal(nxt, prev).to_numpy(zero_copy_only=False)
            has = pc.fill_null(t.column("__has"), 0).to_numpy(
                zero_copy_only=False).astype(bool)
            w = np.where(ret, w_return,
                         np.where(has, w_common, w_far)).astype(
                np.int64)
            cs = np.cumsum(w)
            base = np.r_[0, cs[start_idx[1:] - 1]] if len(
                start_idx) > 1 else np.array([0], np.int64)
            cum = cs - base[run_id]
            tot = np.diff(np.r_[base, cs[-1]])
            keys = [f"{node[i].as_py()}:{prev[i].as_py()}:"
                    f"{int(s2[i])}:{ts}:{seed}" for i in start_idx]
            draws = md5_u32(keys)
            alive = tot > 0
            if not alive.any():
                return empty
            draw = draws % np.where(alive, tot, 1)
            # first candidate whose cumulative interval contains the
            # draw, per run: searchsorted within each run's slice
            sel = np.full(len(start_idx), -1, np.int64)
            ends = np.r_[start_idx[1:], n]
            for ri in np.flatnonzero(alive):
                lo_i, hi_i = start_idx[ri], ends[ri]
                sel[ri] = lo_i + np.searchsorted(
                    cum[lo_i:hi_i], draw[ri], side="right")
            sel = sel[sel >= 0]
            idx = pa.array(sel)
            return pa.table({
                "start": t.column("start").take(idx),
                "walk": t.column("walk").take(idx),
                "prev": node.take(idx),
                "node": nxt.take(idx)})

        stepped = (cand.map_batches(
            lambda t: _add_bucket(t, ["start", "walk"], nb),
            batch_format="pyarrow")
            .groupby(_B).map_groups(pick, batch_format="pyarrow")
            .materialize())
        if stepped.count() == 0:
            break
        acc = acc.union(stepped.map_batches(
            lambda t, ts=t_step: emit(t, ts), batch_format="pyarrow"))
        frontier = stepped
    return acc


def temporal_reachability(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "ts",
    t0: "int | None" = None,
    nb: int = 32,
    max_iters: int = 100,
) -> "ray.data.Dataset":
    """TIME-RESPECTING reachability over a temporal edge list — the
    KG/crawl provenance question "what could X have influenced
    AFTER t0?": an edge (u → v, t) is traversable only when
    ``t ≥ arrival(u)`` (information can't ride an interaction that
    happened before it arrived — Holme & Saramäki 2012, public).
    Returns ``(node, arrival)`` with the EARLIEST arrival time of
    every node reachable from ``seeds`` (seeds at ``t0``; default =
    min int64, i.e. unconstrained starts). Timestamps may be ints or
    timestamps (compared as int64 epoch units).

    Shape per round (the sssp skeleton): frontier ⋈ edges (one
    bucket join) filtered to time-respecting edges → candidate
    arrival = the edge's own ts, map-side-combined min per node, ONE
    left join keeping strict improvements as the next frontier. Like
    Bellman-Ford, a labeled node can improve via a later-found
    earlier path, so rounds relax to fixpoint; ``max_iters``
    guards non-convergence."""
    import ray.data as rd

    from .join import shuffle_hash_join

    edges_ds = rd.from_arrow(edges) if isinstance(edges, pa.Table) \
        else edges
    t0 = int(t0) if t0 is not None else -(2 ** 62)

    def prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column(ts_col), pa.int64())
        out = pa.table({"src": t.column(src_col).cast(pa.int64()),
                        "dst": t.column(dst_col).cast(pa.int64()),
                        "ts": ts})
        ok = pc.and_(pc.and_(pc.is_valid(out.column("src")),
                             pc.is_valid(out.column("dst"))),
                     pc.is_valid(out.column("ts")))
        return out.filter(ok)

    e = edges_ds.map_batches(prep,
                             batch_format="pyarrow").materialize()
    if isinstance(seeds, (list, tuple, np.ndarray)):
        seeds = pa.table({"node": pa.array(
            sorted(set(int(x) for x in seeds)), pa.int64())})
    seeds_ds = rd.from_arrow(seeds) if isinstance(seeds, pa.Table) \
        else seeds
    arr = seeds_ds.map_batches(
        lambda t: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "arrival": pa.array(np.full(len(t), t0, np.int64))}),
        batch_format="pyarrow").materialize()
    frontier = arr

    from .util import map_known, strip_stats, with_schema
    _sch_na = pa.schema([pa.field("node", pa.int64()),
                         pa.field("arrival", pa.int64())])
    for _ in range(max_iters):
        if frontier.count() == 0:
            return arr
        msgs = map_known(shuffle_hash_join(
            map_known(frontier, lambda t: t.rename_columns(
                ["src", "arrival"])),
            e, on=["src"], how="inner", nb=nb),
            lambda t: (lambda f: pa.table({
                "node": f.column("dst"),
                "arrival": f.column("ts")}))(
                t.filter(pc.greater_equal(t.column("ts"),
                                          t.column("arrival")))))
        # fused relax: min(candidates ∪ current) + old in ONE shuffle
        # — the frontier is a lazy filter of it and the updated
        # arrival table a lazy select (no anti-join ∪ rebuild)
        delta = strip_stats(_min_with_old(
            msgs, arr, nb, "node", "arrival").materialize())
        frontier = with_schema(map_known(delta, lambda t: (
            lambda f: f.select(["node", "arrival"]))(
            t.filter(pc.fill_null(pc.less(t.column("arrival"),
                                          t.column("old")), True)))),
            _sch_na)
        if frontier.count() == 0:
            return arr
        arr = with_schema(map_known(
            delta, lambda t: t.select(["node", "arrival"])), _sch_na)
    raise RuntimeError(
        f"temporal_reachability did not converge in "
        f"max_iters={max_iters}")
