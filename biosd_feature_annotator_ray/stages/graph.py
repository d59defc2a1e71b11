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

from ..functions.hashing import hash_strings
from ..schemas import GRAPH_EDGE


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


def pagerank(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    nb: int = 16,
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
    """
    import ray.data as _rd
    from ray.data.aggregate import Sum

    from .canonicalize import distinct_counts, set_op
    from .join import shuffle_hash_join

    e = edges.map_batches(
        lambda t: t.select([src, dst]).rename_columns(["src", "dst"]),
        batch_format="pyarrow", batch_size=65536).materialize()

    deg = distinct_counts(e.select_columns(["src"]), "src", nb=nb)  # (src, count)
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
    ranks = nodes.map_batches(
        lambda t: t.append_column("rank", pa.array(np.full(len(t), init))),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        r_src = ranks.map_batches(lambda t: t.rename_columns(["src", "rank"]),
                                  batch_format="pyarrow")
        joined = shuffle_hash_join(edges_w, r_src, on=["src"], how="inner", nb=nb)

        def contrib(batch: pa.Table) -> pa.Table:
            w = (batch.column("rank").to_numpy(zero_copy_only=False)
                 / batch.column("count").to_numpy(zero_copy_only=False))
            t = pa.table({"dst": batch.column("dst"), "w": pa.array(w)})
            df = t.to_pandas().groupby("dst", as_index=False)["w"].sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        msum = (joined.map_batches(contrib, batch_format="pyarrow", batch_size=65536)
                .groupby("dst").aggregate(Sum("w", alias_name="msum")).materialize())
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

    return ranks


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
    import pandas as pd
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        toks = [t.split() for t in df[col].fillna("")]
        lengths = np.fromiter((len(x) for x in toks), np.int64, count=len(toks))
        flat = pd.DataFrame({
            "d": np.repeat(np.arange(len(lengths)), lengths),
            "t": [w for ws in toks for w in ws],
        }).drop_duplicates()
        n_trunc = 0
        if len(flat):
            rank = flat.groupby("d").cumcount()
            n_trunc = int((rank == max_tokens_per_doc).sum())
            flat = flat[rank < max_tokens_per_doc]
        m = flat.merge(flat, on="d")
        m = m[m["t_x"] < m["t_y"]]
        part = (m.groupby(["t_x", "t_y"], sort=False).size()
                .reset_index(name="n_part")
                .rename(columns={"t_x": "t1", "t_y": "t2"}))
        if n_trunc:
            part = pd.concat([part, pd.DataFrame(
                {"t1": ["__truncated__"], "t2": ["__docs__"], "n_part": [n_trunc]})])
        return pa.Table.from_pandas(part, preserve_index=False).cast(pa.schema([
            pa.field("t1", pa.string()), pa.field("t2", pa.string()),
            pa.field("n_part", pa.int64())]))

    agg = (docs.map_batches(pairs, batch_format="pyarrow", batch_size=8192)
           .groupby(["t1", "t2"])
           .aggregate(Sum("n_part", alias_name="n_docs")))
    if min_count > 1:
        import pyarrow.compute as pc

        agg = agg.map_batches(
            lambda t, mc=int(min_count): t.filter(
                pc.greater_equal(t.column("n_docs"), mc)),
            batch_format="pyarrow")
    return agg
