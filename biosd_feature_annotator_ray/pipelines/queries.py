"""Driver-harness queries (SURVEY.md §5.2 item 4, FIXTURES.md §6).

One entry per implemented operator from SURVEY.md §2 + the
training-data additions, each over the driver testdata tables with a
DuckDB oracle twin in ORACLES (column names match EXACTLY — the driver
sorts columns by name before value-hashing). Non-SQL-expressible ops
(LSH dedup, seeded sampling, model-ish scoring, the full annotation
pipeline on synthetic pages) have no oracle → driver records the
weaker rows-only check.

Ray is initialised by the CALLER — nothing here calls ray.init.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..stages.canonicalize import dedup_exact, distinct_counts, groupby_argmax
from ..stages import textstats
from ..stages.util import as_task_fn


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


# ---------------------------------------------------------------------------
# A3 count
def q_count_documents(sf_dir: str):
    n = _docs(sf_dir, ["doc_id"]).count()
    return pa.table({"n": pa.array([n], pa.int64())})


# M11/S2 read-time filter (predicate pushdown)
def q_filter_lang_en(sf_dir: str):
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"],
        filter=pads.field("lang") == "en",
    )
    return ds.select_columns(["doc_id"])


# M4 key normalization (pure Arrow kernels)
def q_normalize_text(sf_dir: str):
    from ..functions.normalize import norm_array

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "norm_text": norm_array(batch.column("text"))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# M5-style regex extraction (vectorized extract_regex + cast)
def q_extract_json_k(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "k": k})

    return _events(sf_dir, ["event_id", "props"]).map_batches(f, batch_format="pyarrow")


# Text analysis: token counting
def q_token_counts(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.token_count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
    )


# A1/K1 canonicalization analog: best row per key by a total order
def q_canonicalize_events(sf_dir: str):
    best = groupby_argmax(
        _events(sf_dir, ["user_id", "event_id", "value"]),
        ["user_id"], ["value", "event_id"], [False, True], nb=16,
    )
    return best.select_columns(["user_id", "event_id", "value"])


# A1 multi-key argmax: latest event per (user, type) — the "keep newest
# version of each url" Common-Crawl pattern on the events table
def q_latest_event_per_user_type(sf_dir: str):
    best = groupby_argmax(
        _events(sf_dir, ["user_id", "event_type", "event_id", "ts"]),
        ["user_id", "event_type"], ["ts", "event_id"], [False, False], nb=16,
    )
    out = best.select_columns(["user_id", "event_type", "event_id"])
    return out


# A2 exact dedup (hash-partition + per-group first)
def q_dedup_docs(sf_dir: str):
    out = dedup_exact(_docs(sf_dir, ["doc_id", "text"]), ["text"], nb=16,
                      keep_order_col="doc_id")
    return out.select_columns(["doc_id"])


# §2.7 distinct
def q_distinct_event_types(sf_dir: str):
    return distinct_counts(_events(sf_dir, ["event_type"]), "event_type", nb=8).select_columns(
        ["event_type"]
    )


# K4 top-k frequent (hot-key report)
def q_topk_event_types(sf_dir: str):
    counts = distinct_counts(_events(sf_dir, ["event_type"]), "event_type", nb=8)
    t = counts.to_pandas().rename(columns={"count": "n"})
    t = t.sort_values(["n", "event_type"], ascending=[False, True]).head(5)
    return pa.Table.from_pandas(t.reset_index(drop=True), preserve_index=False)


# A4 + pre-aggregate pattern (map-side combine before the groupby)
def q_lineitem_agg(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), sum_price=("l_extendedprice", "sum"),
            n=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("sum_price", alias_name="sum_price"),
                   Sum("n", alias_name="n"))
    )
    df = agg.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_price"] = df["sum_price"].round(2)
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# J1–J3 scale shape: fact×dimension via SHUFFLE hash join (customer is
# the growing side — don't driver-materialize it), then broadcast only
# the 25-row nation map (round-1 verdict 'what's wrong' #8)
def q_revenue_per_nation(sf_dir: str):
    from ..stages.join import shuffle_hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(lambda t: t.rename_columns(["o_custkey", "c_nationkey"]),
                  batch_format="pyarrow")
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk2name = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))
    ref = ray.put(nk2name)

    joined = shuffle_hash_join(orders, cust, on=["o_custkey"], how="inner", nb=16)

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        df = batch.to_pandas()
        df["nation"] = df["c_nationkey"].map(lut)
        g = df.groupby("nation", as_index=False).agg(
            revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("nation")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["n_orders"] = df["n_orders"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# Large×large bucketed shuffle hash join (stages/join.py): orders ⋈
# lineitem — both fact-sized, neither broadcastable at 100 TB
def q_join_orders_lineitem(sf_dir: str):
    from ..stages.join import shuffle_hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(lambda t: t.rename_columns(["o_orderkey", "l_extendedprice", "l_discount"]),
                  batch_format="pyarrow")
    joined = shuffle_hash_join(orders, li, on=["o_orderkey"], how="inner", nb=32)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_lines=("revenue", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_lines", alias_name="n_lines"))
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["n_lines"] = df["n_lines"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# FULL OUTER shuffle join: big orders ⋈ heavy lineitems — unmatched
# rows survive on BOTH sides (the key column is coalesced)
def _outer_join_sides(sf_dir: str):
    """Shared sources for the full/left/right outer-join queries:
    big orders (read-pruned) ⋈ heavy lineitems."""
    import pyarrow.dataset as pads

    big_orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"],
        filter=pads.field("o_totalprice") > 300_000.0,
    )
    heavy_lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"],
        filter=pads.field("l_quantity") >= 49,
    ).map_batches(lambda t: t.rename_columns(["o_orderkey", "l_quantity"]),
                  batch_format="pyarrow")
    return big_orders, heavy_lines


def _outer_join_query(sf_dir: str, how: str):
    from ..stages.join import shuffle_hash_join

    big_orders, heavy_lines = _outer_join_sides(sf_dir)
    j = shuffle_hash_join(big_orders, heavy_lines, on=["o_orderkey"],
                          how=how, nb=16)
    df = j.to_pandas().sort_values(
        ["o_orderkey", "l_quantity"], na_position="last").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_full_outer_join(sf_dir: str):
    return _outer_join_query(sf_dir, "full")


# LEFT OUTER shuffle join: every big order survives, heavy lineitems
# attach where present (null-filled otherwise)
def q_left_join_orders(sf_dir: str):
    return _outer_join_query(sf_dir, "left")


# RIGHT OUTER shuffle join: the mirror — every heavy lineitem survives
def q_right_join_lineitem(sf_dir: str):
    return _outer_join_query(sf_dir, "right")


# Shuffle SEMI join: customers with ≥1 big order (filter pushed to the read)
def q_semi_join_customers(sf_dir: str):
    import pyarrow.dataset as pads

    from ..stages.join import shuffle_hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"],
        filter=pads.field("o_totalprice") > 300_000.0,
    ).map_batches(lambda t: t.select(["o_custkey"]).rename_columns(["c_custkey"]),
                  batch_format="pyarrow")
    return shuffle_hash_join(cust, big, on=["c_custkey"], how="semi", nb=16)


# J4-style broadcast anti join (docs whose id has no label-0 embedding —
# chosen so the result is non-empty at every sf; every customer has
# orders in this testdata, which would make that variant empty)
def q_docs_without_label0_vec(sf_dir: str):
    keys_tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
                             filters=[("label", "=", 0)])
    have = pa.array(sorted(set(keys_tbl.column("vec_id").to_pylist())), pa.int64())
    ref = ray.put(have)

    def f(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        return batch.filter(pc.invert(pc.is_in(batch.column("doc_id"), value_set=keys)))

    return _docs(sf_dir, ["doc_id"]).map_batches(f, batch_format="pyarrow")


# K2 sort + limit
def q_top_orders(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


# Streaming-shaped: tumbling 1h window per event_type (§2.9 analog)
def q_window_events(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table({"event_type": batch.column("event_type"), "window_start": ws,
                      "value": batch.column("value")})
        df = t.to_pandas()
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            sum_value=("value", "sum"), n=("value", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        _events(sf_dir, ["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("sum_value", alias_name="sum_value"), Sum("n", alias_name="n"))
    )
    df = agg.to_pandas()
    df["sum_value"] = df["sum_value"].round(2)
    df["n"] = df["n"].astype("int64")
    df["window_start"] = df["window_start"].astype("datetime64[us]")
    return pa.Table.from_pandas(df, preserve_index=False)


# Training-data split: deterministic md5-bucket train/val/test
def q_train_split(sf_dir: str):
    out = _docs(sf_dir, ["doc_id"]).map_batches(
        textstats.train_split, batch_format="pyarrow", batch_size=65536
    )
    return out.select_columns(["doc_id", "bucket", "split"])


# Training-data chunking: fixed-token windows with overlap (vectorized
# Arrow kernels; DuckDB generate_series oracle)
def q_chunk_documents(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: textstats.chunk_documents(t, chunk_tokens=32, overlap=8),
        batch_format="pyarrow", batch_size=65536,
    )


# Text analysis: BPE-ish token count (regex match count, RE2 both sides)
def q_bpe_token_counts(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.bpe_token_count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_bpe_tokens"])
    )


# S1/M11 analog on a timestamp column: predicate pushdown at the read
def q_lineitem_date_filter(sf_dir: str):
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"],
        filter=pads.field("l_shipdate") < pads.scalar(pd.Timestamp("1994-01-01")),
    )
    n = ds.count()
    return pa.table({"n": pa.array([n], pa.int64())})


# A5 visibility: out-degree per node via the distinct_counts reduce —
# since round 3 over the deterministic orders-derived edge list so the
# driver gets a full SQL oracle (the KG-based adjacency path stays
# covered by test_graph_analytics + the flagship golden E2E)
def q_graph_degrees(sf_dir: str):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(k[k >= 10] // 10, pa.int64())})

    deg = distinct_counts(orders.map_batches(edges, batch_format="pyarrow"),
                          "src", nb=8)
    df = deg.to_pandas().rename(columns={"src": "subj", "count": "out_degree"})
    df["out_degree"] = df["out_degree"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("subj").reset_index(drop=True),
                                preserve_index=False)


# PageRank: same distributed power iteration (stages/graph.py), run
# over the orders-derived edge list so the driver can verify it against
# an UNROLLED DuckDB oracle (one CTE chain per iteration) instead of a
# rows-only check; KG-based pagerank stays pinned by the power-iteration
# parity test in test_graph_analytics
def q_graph_pagerank(sf_dir: str):
    from ..stages.graph import pagerank

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k, pa.int64())})

    out = pagerank(orders.map_batches(edges, batch_format="pyarrow"),
                   src="src", dst="dst", damping=0.85, iters=3, nb=16)
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    df["rank"] = df["rank"].round(8)
    return pa.Table.from_pandas(df.sort_values("node").reset_index(drop=True),
                                preserve_index=False)


# §2.9 session windows (gap-based, per-user) — custom windowed operator
def q_session_windows(sf_dir: str):
    from ..stages.windows import session_windows

    out = session_windows(_events(sf_dir, ["user_id", "event_id", "ts"]),
                          gap=pd.Timedelta(minutes=30), nb=8)
    df = out.to_pandas()
    df["session_id"] = df["session_id"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    for c in ("start_ts", "end_ts"):
        df[c] = df[c].astype("datetime64[us]")
    return pa.Table.from_pandas(df, preserve_index=False)


# §2.9 sliding windows (overlapping) — oracle via a DuckDB window-grid
# cross join (round-1 verdict item 7)
def q_sliding_windows(sf_dir: str):
    from ..stages.windows import sliding_windows

    out = sliding_windows(_events(sf_dir, ["event_type", "ts", "value"]),
                          size=pd.Timedelta(hours=1), slide=pd.Timedelta(minutes=30))
    df = out.to_pandas()
    df["sum_value"] = df["sum_value"].round(2)
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# §2.8 timestamp decomposition (temporal kernels + cast)
def q_ts_parts(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        return pa.table({
            "event_id": batch.column("event_id"),
            "h": pc.hour(ts).cast(pa.int64()),
            "dom": pc.day(ts).cast(pa.int64()),
            "mon": pc.month(ts).cast(pa.int64()),
        })

    return _events(sf_dir, ["event_id", "ts"]).map_batches(f, batch_format="pyarrow")


# §2.8 timestamp → partition date (strftime kernel)
def q_partition_date(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        d = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        return pa.table({"event_id": batch.column("event_id"), "part_date": d})

    return _events(sf_dir, ["event_id", "ts"]).map_batches(f, batch_format="pyarrow")


# Similarity search: exact brute-force cosine top-k
def q_knn_cosine(sf_dir: str):
    from ..stages.similarity import knn_brute_force

    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                            filters=[("vec_id", "<", 5)])
    out = knn_brute_force(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                        override_num_blocks=8),
        queries, k=10,
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


# TPC-H-Q3-shaped composition: broadcast semi-filter (small dimension
# slice) + read-time predicate pushdown + large×large shuffle join +
# pre-aggregated groupby + global top-k — the multi-operator pipeline
# a reference user composes daily
def q_top_building_orders(sf_dir: str):
    import pyarrow.dataset as pads

    from ..stages.join import shuffle_hash_join

    cutoff = pd.Timestamp("1995-03-15")
    building = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
                             filters=[("c_mktsegment", "=", "BUILDING")])
    ckeys = ray.put(building.column("c_custkey").combine_chunks())

    def keep_building(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("o_custkey"), value_set=ray.get(ckeys)))

    orders = (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"],
                        filter=pads.field("o_orderdate") < pads.scalar(cutoff))
        .map_batches(keep_building, batch_format="pyarrow")
        .map_batches(lambda t: t.select(["o_orderkey", "o_orderdate"]), batch_format="pyarrow")
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > pads.scalar(cutoff),
    ).map_batches(lambda t: t.select(["l_orderkey", "l_extendedprice", "l_discount"])
                  .rename_columns(["o_orderkey", "l_extendedprice", "l_discount"]),
                  batch_format="pyarrow")
    joined = shuffle_hash_join(orders, li, on=["o_orderkey"], how="inner", nb=16)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["o_orderkey", "o_orderdate"], as_index=False).agg(
            revenue=("revenue", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["o_orderkey", "o_orderdate"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    df["o_orderdate"] = df["o_orderdate"].astype("datetime64[us]")
    df = df.sort_values(["revenue", "o_orderkey"], ascending=[False, True]).head(10)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


# K3 deterministic hash sample (oracle-able twin of random_sample)
def q_hash_sample(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        out = textstats.train_split(batch)
        return out.filter(pc.less(out.column("bucket"), 10)).select(["doc_id"])

    return _docs(sf_dir, ["doc_id"]).map_batches(f, batch_format="pyarrow")


# AS-OF join (custom operator Ray Data lacks): latest 'view' event of
# the same user at/before each event's ts — DuckDB ASOF JOIN oracle
def q_asof_join_events(sf_dir: str):
    from ..stages.join import asof_join

    ev = _events(sf_dir, ["event_id", "user_id", "ts"])
    views = (
        _events(sf_dir, ["user_id", "ts", "event_type"])
        .map_batches(
            lambda t: t.filter(pc.equal(t.column("event_type"), "view"))
            .select(["user_id", "ts"]).rename_columns(["user_id", "view_ts"]),
            batch_format="pyarrow",
        )
    )
    out = asof_join(ev, views, key="user_id", ts="ts", right_ts="view_ts", nb=16)
    df = out.to_pandas()[["event_id", "view_ts"]]
    df["view_ts"] = df["view_ts"].astype("datetime64[us]")
    return pa.Table.from_pandas(df, preserve_index=False)


# row_number() per key — windowed rank operator with SQL oracle
def q_rank_events(sf_dir: str):
    from ..stages.windows import rank_per_key

    out = rank_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                       key_col="user_id", order_cols=["ts", "event_id"], nb=8)
    df = out.to_pandas()[["event_id", "rn"]]
    df["rn"] = df["rn"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# lag() per key
def q_lag_events(sf_dir: str):
    from ..stages.windows import lag_per_key

    out = lag_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                      key_col="user_id", value_col="event_id",
                      order_cols=["ts", "event_id"], out="prev_event_id", nb=8)
    df = out.to_pandas()[["event_id", "prev_event_id"]]
    return pa.Table.from_pandas(df, preserve_index=False)


def q_lead_events(sf_dir: str):
    from ..stages.windows import lead_per_key

    out = lead_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                       key_col="user_id", value_col="event_id",
                       order_cols=["ts", "event_id"], out="next_event_id", nb=8)
    df = out.to_pandas()[["event_id", "next_event_id"]]
    return pa.Table.from_pandas(df, preserve_index=False)


def q_last_value_events(sf_dir: str):
    from ..stages.windows import last_value_per_key

    out = last_value_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                             key_col="user_id", value_col="value",
                             order_cols=["ts", "event_id"], out="last_value", nb=8)
    df = out.to_pandas()[["event_id", "last_value"]]
    return pa.Table.from_pandas(df, preserve_index=False)


def q_nth_value_events(sf_dir: str):
    from ..stages.windows import nth_value_per_key

    out = nth_value_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                            n=3, key_col="user_id", value_col="value",
                            order_cols=["ts", "event_id"], out="third_value", nb=8)
    df = out.to_pandas()[["event_id", "third_value"]]
    return pa.Table.from_pandas(df, preserve_index=False)


# exact distributed quantiles (histogram-bracket, no global sort)
def q_quantiles(sf_dir: str):
    from ..stages.sketches import exact_quantile

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    qs = exact_quantile(ds, "o_totalprice", [0.5, 0.9], n_bins=512)
    return pa.table({"p50": pa.array([round(qs[0.5], 2)], pa.float64()),
                     "p90": pa.array([round(qs[0.9], 2)], pa.float64())})


# Distributed variance via sufficient statistics (n, Σx, Σx²): the
# classic decomposable-aggregate pattern — only 3 numbers per
# (group, batch) cross the shuffle
def q_stddev_by_type(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["sq"] = df["value"] * df["value"]
        g = df.groupby("event_type", as_index=False).agg(
            n=("value", "size"), s=("value", "sum"), sq=("sq", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("sq", alias_name="sq"))
    )
    df = agg.to_pandas()
    mean = df["s"] / df["n"]
    var = df["sq"] / df["n"] - mean * mean
    out = pd.DataFrame({
        "event_type": df["event_type"],
        "avg_value": mean.round(2),
        "sd_value": np.sqrt(np.maximum(var, 0)).round(2),
    })
    return pa.Table.from_pandas(out, preserve_index=False)


# Distributed Pearson correlation, same sufficient-statistics shape
def q_corr_price_qty(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        y = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([float(len(x))]), "sx": pa.array([x.sum()]),
            "sy": pa.array([y.sum()]), "sxx": pa.array([(x * x).sum()]),
            "syy": pa.array([(y * y).sum()]), "sxy": pa.array([(x * y).sum()]),
        })

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]
    agg = (
        rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                        columns=["l_extendedprice", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )
    n, sx, sy, sxx, syy, sxy = (agg[f"{c}"] for c in cols)
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) ** 2
    vy = syy / n - (sy / n) ** 2
    r = cov / np.sqrt(vx * vy)
    return pa.table({"r": pa.array([round(float(r), 6)], pa.float64())})


# interpolated quantiles (SQL percentile_cont semantics)
def q_quantiles_cont(sf_dir: str):
    from ..stages.sketches import exact_quantile_cont

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    qs = exact_quantile_cont(ds, "o_totalprice", [0.5, 0.9], n_bins=512)

    # interpolated midpoints of 2-decimal prices land on .xx5 exactly:
    # round half-away-from-zero like DuckDB (numpy rounds half-to-even)
    def r2(x: float) -> float:
        return float(np.sign(x) * np.floor(abs(x) * 100 + 0.5) / 100)

    return pa.table({"p50": pa.array([r2(qs[0.5])], pa.float64()),
                     "p90": pa.array([r2(qs[0.9])], pa.float64())})


# pivot: per-user value sums split by event_type into columns
def q_pivot_events(sf_dir: str):
    from ..stages.canonicalize import pivot_sum

    cats = ["click", "error", "purchase", "signup", "view"]
    out = pivot_sum(_events(sf_dir, ["user_id", "event_type", "value"]),
                    "user_id", "event_type", "value", cats)
    df = out.to_pandas()
    for c in cats:
        df[c] = df[c].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)


# Stratified sample: a deterministic per-group quota (K3 at scale —
# every stratum keeps its 20 hash-smallest rows; md5 order makes the
# draw reproducible by ANY system, same contract as train_split)
def q_stratified_sample(sf_dir: str):
    import hashlib

    from ..stages.windows import rank_per_key

    def add_md5(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return batch.append_column("h", pa.array(h, pa.string()))

    ranked = rank_per_key(
        _events(sf_dir, ["event_id", "event_type"]).map_batches(add_md5, batch_format="pyarrow"),
        key_col="event_type", order_cols=["h", "event_id"], nb=8,
    )
    out = ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("rn"), 20)).select(["event_id", "event_type"]),
        batch_format="pyarrow")
    return out


# Grouped quantile: percentile_disc per key inside the bucket shuffle
def q_grouped_quantile(sf_dir: str):
    from ..stages.canonicalize import _add_bucket, _B

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, ["event_type"], 4)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        out = (df.sort_values(["event_type", "value"], kind="mergesort")
               .groupby("event_type")["value"]
               .apply(lambda s: s.iloc[max(0, int(np.ceil(0.5 * len(s))) - 1)])
               .reset_index(name="p50"))
        out["p50"] = out["p50"].round(2)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )
    return out


# Range partitioner: exact-quantile boundaries → contiguous balanced
# partitions (the sorted-layout / range-join partitioner), oracled via
# DuckDB quantile_disc cuts
def q_range_partition_orders(sf_dir: str):
    from ..stages.sketches import range_partition

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    tagged = range_partition(ds, "o_totalprice", 4)
    counts = distinct_counts(tagged.select_columns(["part"]), "part", nb=4)
    df = counts.to_pandas().rename(columns={"count": "n"})
    df["part"] = df["part"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("part").reset_index(drop=True),
                                preserve_index=False)


# Keyed RANGE join: assign each event to its session window (sessions
# from the session_windows operator, non-overlapping per user) —
# window-function SQL oracle
def q_interval_join_sessions(sf_dir: str):
    from ..stages.join import interval_join
    from ..stages.windows import session_windows

    sessions = session_windows(_events(sf_dir, ["user_id", "event_id", "ts"]),
                               gap=pd.Timedelta(minutes=30), nb=8)
    sessions = sessions.map_batches(
        lambda t: t.select(["user_id", "session_id", "start_ts", "end_ts"]),
        batch_format="pyarrow")
    ev = _events(sf_dir, ["event_id", "user_id", "ts"])
    out = interval_join(ev, sessions, key="user_id", ts="ts",
                        start="start_ts", end="end_ts", nb=8)
    df = out.to_pandas()[["event_id", "session_id"]]
    df["session_id"] = df["session_id"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("event_id").reset_index(drop=True),
                                preserve_index=False)


# Running total per key — sum() OVER (... ROWS UNBOUNDED PRECEDING)
def q_cumsum_events(sf_dir: str):
    from ..stages.windows import cumsum_per_key

    out = cumsum_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                         key_col="user_id", value_col="value",
                         order_cols=["ts", "event_id"], nb=8)
    df = out.to_pandas()[["event_id", "cum_value"]]
    df["cum_value"] = df["cum_value"].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)


# Trailing moving average per key — avg() OVER (... ROWS 2 PRECEDING)
def q_moving_avg_events(sf_dir: str):
    from ..stages.windows import rolling_mean_per_key

    out = rolling_mean_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                               key_col="user_id", value_col="value",
                               order_cols=["ts", "event_id"], window=3, nb=8)
    df = out.to_pandas()[["event_id", "mov_avg"]]
    # DuckDB round() is half-away-from-zero; numpy/pandas round is
    # half-to-even, and dividing 2-decimal values by 2/3 lands on exact
    # midpoints often enough to matter (33/10k rows at sf0.01).
    v = df["mov_avg"].to_numpy()
    df["mov_avg"] = np.sign(v) * np.floor(np.abs(v) * 100 + 0.5) / 100
    return pa.Table.from_pandas(df, preserve_index=False)


# Gopher-style repetition signals (distinct-token ratio, top-token share)
def q_repetition_stats(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.repetition_stats, batch_format="pyarrow", batch_size=65536)


# Corpus-level top-k bigram census (n-gram LM / boilerplate phrases)
def q_top_bigrams(sf_dir: str):
    return textstats.top_ngrams(_docs(sf_dir, ["text"]), n=2, k=20)


def _setop_sides(sf_dir: str):
    import pyarrow.dataset as pads

    a = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"],
                        filter=pads.field("lang") == "en").select_columns(["doc_id"])
    b = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
                        filter=pads.field("label") == 0).map_batches(
        lambda t: t.select(["vec_id"]).rename_columns(["doc_id"]), batch_format="pyarrow")
    return a, b


# Distributed distinct set ops (SQL UNION / INTERSECT / EXCEPT)
def q_setop_intersect(sf_dir: str):
    from ..stages.canonicalize import set_op

    a, b = _setop_sides(sf_dir)
    return set_op(a, b, "doc_id", op="intersect", nb=8)


def q_setop_except(sf_dir: str):
    from ..stages.canonicalize import set_op

    a, b = _setop_sides(sf_dir)
    return set_op(a, b, "doc_id", op="except", nb=8)


# BAG-semantics set ops: per-value multiplicity min(ca,cb) / ca-cb —
# map side ships per-batch counts, reduce re-expands via np.repeat
def _bag_sides(sf_dir: str):
    a = _events(sf_dir, ["user_id"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    b = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    return a, b


def q_setop_intersect_all(sf_dir: str):
    from ..stages.canonicalize import set_op_all

    a, b = _bag_sides(sf_dir)
    return set_op_all(a, b, "id", op="intersect", nb=8)


def q_setop_except_all(sf_dir: str):
    from ..stages.canonicalize import set_op_all

    a, b = _bag_sides(sf_dir)
    return set_op_all(a, b, "id", op="except", nb=8)


# Trailing rolling max (ROWS frame): C-level groupby-rolling per
# bucket group — extremes admit no prefix-sum trick
def q_moving_max_events(sf_dir: str):
    from ..stages.windows import rolling_extreme_per_key

    out = rolling_extreme_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        window=4, mode="max")
    df = out.to_pandas()[["event_id", "mov_max"]]
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


# GLOBAL row_number without a single-node sort: exact-quantile range
# partitions + local rank + broadcast prefix offsets
def q_global_rn_orders(sf_dir: str):
    from ..stages.windows import global_row_number

    out = global_row_number(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"]),
        order_cols=["o_totalprice", "o_orderkey"], n_parts=16)
    df = out.to_pandas()[["o_orderkey", "rn"]]
    return pa.Table.from_pandas(
        df.sort_values("o_orderkey").reset_index(drop=True),
        preserve_index=False)


def q_setop_union(sf_dir: str):
    from ..stages.canonicalize import set_op

    a, b = _setop_sides(sf_dir)
    return set_op(a, b, "doc_id", op="union", nb=8)


# Integer quality signals (exact-arithmetic core of quality_features)
def q_quality_signals(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.quality_counts, batch_format="pyarrow", batch_size=65536)


# Ordered sequence collection — string_agg(... ORDER BY) per key
def q_string_agg_events(sf_dir: str):
    from ..stages.windows import collect_seq_per_key

    out = collect_seq_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                              key_col="user_id", value_col="event_id",
                              order_cols=["ts", "event_id"], nb=8)
    return out.select_columns(["user_id", "seq"])


# Fixed-width value histogram (distribution profile)
def q_histogram_values(sf_dir: str):
    from ..stages.sketches import fixed_width_histogram

    out = fixed_width_histogram(_events(sf_dir, ["value"]), "value", bin_width=10.0)
    df = out.to_pandas()
    df["bin"] = df["bin"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# dense_rank() per key
def q_dense_rank_events(sf_dir: str):
    from ..stages.windows import dense_rank_per_key

    out = dense_rank_per_key(_events(sf_dir, ["event_id", "user_id", "value"]),
                             key_col="user_id", order_col="value", ascending=False, nb=8)
    return out.select_columns(["event_id", "drank"])


# ntile(4) per key (SQL NTILE fill semantics)
def q_ntile_events(sf_dir: str):
    from ..stages.windows import ntile_per_key

    out = ntile_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                        key_col="user_id", order_cols=["ts", "event_id"],
                        n_tiles=4, nb=8)
    return out.select_columns(["event_id", "tile"])


# UNPIVOT: melt the pivot back to (user_id, event_type, value) rows
def q_unpivot_events(sf_dir: str):
    from ..stages.canonicalize import melt, pivot_sum

    cats = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_sum(_events(sf_dir, ["user_id", "event_type", "value"]),
                     "user_id", "event_type", "value", cats)
    out = melt(wide, "user_id", cats, var_name="event_type", value_name="value")
    df = out.to_pandas()
    df["value"] = df["value"].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)


# Broadcast (map-side) join: fact stream ⋈ broadcast dimension table
def q_supplier_nation(sf_dir: str):
    from ..stages.join import broadcast_join

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
                           ).rename_columns(["s_nationkey", "n_name"])
    out = broadcast_join(sup, nation, on=["s_nationkey"], how="inner")
    return out.select_columns(["s_suppkey", "n_name"])


# UNNEST WITH ORDINALITY: explode the embedding lists to element rows
def q_explode_embeddings(sf_dir: str):
    import pyarrow.dataset as pads

    from ..stages.util import explode_list

    def f(batch: pa.Table) -> pa.Table:
        out = explode_list(batch, "embedding", ["vec_id"])
        return out.set_column(out.schema.get_field_index("val"), "val",
                              out.column("val").cast(pa.float64()))

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < 50,
    ).map_batches(f, batch_format="pyarrow")


# UNION ALL (bag semantics — Dataset.union, no dedup shuffle)
def q_union_all_ids(sf_dir: str):
    docs = _docs(sf_dir, ["doc_id"])
    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"]).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    return docs.union(vecs)


# LIKE-style substring filter (Arrow match_substring kernel)
def q_like_filter(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.match_substring(batch.column("text"), "customer"))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").select_columns(["doc_id"])


# ROLLUP (nation, year): the coarser grouping sets are DERIVED from the
# finest aggregate (sums of sums) — the finest result is dimension-
# sized, so no extra pass over the fact table
def q_rollup_revenue(sf_dir: str):
    from ..stages.join import broadcast_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
                         ).rename_columns(["o_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk2name = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))
    ref = ray.put(nk2name)
    joined = broadcast_join(orders, cust, on=["o_custkey"], how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        df = batch.to_pandas()
        df["nation"] = df["c_nationkey"].map(lut)
        df["year"] = df["o_orderdate"].dt.year.astype("int64")
        g = df.groupby(["nation", "year"], as_index=False).agg(
            revenue=("o_totalprice", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    finest = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["nation", "year"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    ).to_pandas()
    lvl1 = finest.groupby("nation", as_index=False)["revenue"].sum()
    lvl1["year"] = np.nan
    total = pd.DataFrame({"nation": [None], "year": [np.nan],
                          "revenue": [finest["revenue"].sum()]})
    out = pd.concat([finest, lvl1, total], ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    # rolled-up year is NULL; match the oracle's pandas representation
    # (float64 + NaN — a nullable-Int64 column hashes differently)
    out["year"] = out["year"].astype("float64")
    return pa.Table.from_pandas(out[["nation", "year", "revenue"]], preserve_index=False)


# Top-k rows PER GROUP (row_number ≤ k): map-side per-key top-k
# combiner, so at most k·keys rows reach the shuffle
def q_topk_orders_per_priority(sf_dir: str):
    from ..stages.canonicalize import groupby_topk

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    top = groupby_topk(ds, key_cols=["o_orderpriority"],
                       order_cols=["o_totalprice", "o_orderkey"],
                       ascending=[False, True], k=3, nb=8)
    df = top.to_pandas().sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                                     ascending=[True, False, True]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# Per-group MODE (most frequent value, deterministic tie-break):
# map-side partial counts → one groupby sum → argmax per group.
# The raw fact stream never shuffles, only (group, value, n) partials.
def q_mode_user_per_type(sf_dir: str):
    counts = (
        _events(sf_dir, ["event_type", "user_id"])
        .map_batches(
            lambda t: pa.Table.from_pandas(
                t.to_pandas().groupby(["event_type", "user_id"], as_index=False)
                .size().rename(columns={"size": "n"}),
                preserve_index=False),
            batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n", alias_name="n"))
    )
    top = groupby_argmax(counts, key_cols=["event_type"],
                         order_cols=["n", "user_id"], ascending=[False, True], nb=8)
    df = top.to_pandas()[["event_type", "user_id", "n"]].rename(
        columns={"user_id": "top_user"})
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# Scalar-subquery filter: rows above the GLOBAL mean — the scalar is
# one tiny aggregate, broadcast into a vectorized filter (no driver
# loop, no second full pass shuffling anything)
def q_above_avg_orders(sf_dir: str):
    from ray.data.aggregate import Mean

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    mean = ds.aggregate(Mean("o_totalprice"))["mean(o_totalprice)"]
    ref = ray.put(float(mean))

    def f(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        return batch.filter(pc.greater(batch.column("o_totalprice"), m))

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    out = out.sort_values("o_orderkey").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# Duplicate k-gram share per document (Dolma/Gopher curation signal):
# gram hashes shuffle once, per-doc partials shuffle once — gram TEXT
# never moves (the oracle twin uses the strings; see dup_ngram_stats)
def q_dup_ngram_share(sf_dir: str):
    out = textstats.dup_ngram_stats(_docs(sf_dir, ["doc_id", "text"]), k=5, nb=16)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["n_grams"] = df["n_grams"].astype("int64")
    df["dup_grams"] = df["dup_grams"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# Grouped exact COUNT(DISTINCT): map-side pair dedup + one bucket
# shuffle (dedup_exact) + a small per-group count — the distinct pairs
# are the only rows that move, never the raw fact stream
def q_distinct_users_per_type(sf_dir: str):
    from ray.data.aggregate import Count

    pairs = dedup_exact(_events(sf_dir, ["event_type", "user_id"]),
                        ["event_type", "user_id"], nb=16)
    agg = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    df = agg.to_pandas()
    df["n_users"] = df["n_users"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# CUBE grouping sets: all 4 levels {(nation,year),(nation),(year),()}
# derived from the ONE finest dimension-sized aggregate — a single
# fact-table pass, never 4 (same derivation pattern as ROLLUP, plus
# the (year)-only slice ROLLUP omits)
def q_cube_revenue(sf_dir: str):
    from ..stages.join import broadcast_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
                         ).rename_columns(["o_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk2name = dict(zip(nation.column("n_nationkey").to_pylist(),
                       nation.column("n_name").to_pylist()))
    ref = ray.put(nk2name)
    joined = broadcast_join(orders, cust, on=["o_custkey"], how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        df = batch.to_pandas()
        df["nation"] = df["c_nationkey"].map(lut)
        df["year"] = df["o_orderdate"].dt.year.astype("int64")
        g = df.groupby(["nation", "year"], as_index=False).agg(
            revenue=("o_totalprice", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    finest = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["nation", "year"])
        .aggregate(Sum("revenue", alias_name="revenue"))
    ).to_pandas()
    by_nation = finest.groupby("nation", as_index=False)["revenue"].sum()
    by_nation["year"] = np.nan
    by_year = finest.groupby("year", as_index=False)["revenue"].sum()
    by_year["nation"] = None
    total = pd.DataFrame({"nation": [None], "year": [np.nan],
                          "revenue": [finest["revenue"].sum()]})
    out = pd.concat([finest, by_nation, by_year, total], ignore_index=True)
    out["revenue"] = out["revenue"].round(2)
    out["year"] = out["year"].astype("float64")
    return pa.Table.from_pandas(out[["nation", "year", "revenue"]], preserve_index=False)


# Cross join (Cartesian): small dimension × small dimension
def q_region_nation_cross(sf_dir: str):
    from ..stages.join import broadcast_join

    region = rd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_name"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_name"])
    return broadcast_join(region, nation, on=[], how="cross")


# percent_rank() per key — exact integer division, bit-identical to SQL
def q_percent_rank_events(sf_dir: str):
    from ..stages.windows import percent_rank_per_key

    out = percent_rank_per_key(_events(sf_dir, ["event_id", "user_id", "value"]),
                               key_col="user_id", order_col="value", nb=8)
    return out.select_columns(["event_id", "prank"])


# cume_dist() per key — bit-exact integer division
def q_cume_dist_events(sf_dir: str):
    from ..stages.windows import cume_dist_per_key

    out = cume_dist_per_key(_events(sf_dir, ["event_id", "user_id", "value"]),
                            key_col="user_id", order_col="value", nb=8)
    return out.select_columns(["event_id", "cdist"])


# first_value() per key
def q_first_value_events(sf_dir: str):
    from ..stages.windows import first_value_per_key

    out = first_value_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                              key_col="user_id", value_col="value",
                              order_cols=["ts", "event_id"], nb=8)
    return out.select_columns(["event_id", "first_value"])


# Regex redaction (PII-mask shape): digit runs in props → '<NUM>'
def q_redact_props(sf_dir: str):
    from ..functions.normalize import mask_pattern

    return _events(sf_dir, ["event_id", "props"]).map_batches(
        lambda t: mask_pattern(t, "props", r"\d\d+", "<NUM>",
                               out="props_redacted").select(["event_id", "props_redacted"]),
        batch_format="pyarrow",
    )


# Gopher-style curation FILTER (the oracle-able core of curate_documents):
# keep docs passing repetition + length thresholds
def q_gopher_filter(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        stats = textstats.repetition_stats(batch)
        keep = pc.and_(
            pc.and_(pc.greater_equal(stats.column("n_tokens_r"), 10),
                    pc.less_equal(stats.column("n_tokens_r"), 1000)),
            pc.and_(pc.greater_equal(stats.column("distinct_ratio"), 0.3),
                    pc.less_equal(stats.column("top_token_share"), 0.3)),
        )
        return stats.filter(keep).select(["doc_id"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", batch_size=65536)


# Multi-key shuffle SEMI join: events against their (user,type)-latest
# canonical rows — 3-column key co-location
def q_semi_join_latest_events(sf_dir: str):
    from ..stages.join import shuffle_hash_join

    latest = groupby_argmax(
        _events(sf_dir, ["user_id", "event_type", "event_id", "ts"]),
        ["user_id", "event_type"], ["ts", "event_id"], [False, False], nb=16,
    ).select_columns(["user_id", "event_type", "event_id"])
    ev = _events(sf_dir, ["user_id", "event_type", "event_id"])
    out = shuffle_hash_join(ev, latest, on=["user_id", "event_type", "event_id"],
                            how="semi", nb=16)
    return out.select_columns(["event_id"])


# Per-source aggregation — the per-domain stats pattern of a web corpus
def q_source_stats(sf_dir: str):
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        _docs(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
    )
    df = agg.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["sum_chars"] = df["sum_chars"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# Count-Min heavy hitters (rows-only: approx by design; never-under-
# count property + near-exactness pinned by pytest). At this sf the
# estimates equal the exact K4 counts.
def q_heavy_hitters(sf_dir: str):
    from ..stages.sketches import count_min_heavy_hitters

    return count_min_heavy_hitters(_events(sf_dir, ["event_type"]), "event_type", k=5)


# HLL approximate count-distinct (rows-only: approx by design; the
# accuracy bound is pinned by pytest against the exact count)
def q_approx_distinct_users(sf_dir: str):
    """HLL estimate PINNED against the exact distributed distinct count
    (round-3: the sketch itself is not SQL, but its accuracy contract
    is — the oracle recomputes the exact count and asserts the sketch
    landed within 5%, so a broken HLL now fails the driver hash)."""
    from ..stages.sketches import approx_distinct

    # ONE events scan: HLL is duplicate-insensitive, so sketching the
    # (small, materialized) distinct-key set yields the identical
    # estimate as sketching the raw stream — and exact = its row count.
    dd = distinct_counts(_events(sf_dir, ["user_id"]), "user_id",
                         nb=8).materialize()
    est = approx_distinct(dd, "user_id", p=12)
    exact = dd.count()
    ok = exact > 0 and abs(est - exact) / exact <= 0.05
    return pa.table({"n_exact": pa.array([exact], pa.int64()),
                     "hll_within_5pct": pa.array([ok], pa.bool_())})


# ---------------------------------------------------------------------------
# Rows-only queries (non-SQL-expressible; driver does rows/schema check)
def q_annotate_triples(sf_dir: str):
    """Flagship KG pipeline over deterministic synthetic pages (the
    testdata documents contain no characteristic mentions)."""
    from ..pipelines.annotate import PipelineSpec, annotate_pages
    from ..synth import gen_pages

    pages = rd.from_arrow(gen_pages(2000))
    return annotate_pages(pages, PipelineSpec(n_buckets=16))


def q_annotate_ancestors(sf_dir: str):
    """Flagship KG pipeline with materialized is-a subsumption closure:
    linked ontology triples are expanded to their ancestor URIs
    (broadcast ontology closure, row-expanding vectorized map) and
    deduped under the standard survivor rule."""
    from ..pipelines.annotate import PipelineSpec, annotate_pages
    from ..synth import gen_pages

    pages = rd.from_arrow(gen_pages(2000))
    return annotate_pages(pages, PipelineSpec(n_buckets=16,
                                              expand_ancestors=True))


# First-order Markov transition counts over each user's ordered event
# stream (lag + pre-combined count groupby) — clickstream modelling
def q_event_transitions(sf_dir: str):
    from ..stages.windows import lag_per_key

    lagged = lag_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]),
        value_col="event_type", out="prev")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=["prev"])
        g = (df.groupby(["prev", "event_type"], sort=False).size()
             .reset_index(name="n_part"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (lagged.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
           .groupby(["prev", "event_type"])
           .aggregate(Sum("n_part", alias_name="n")).to_pandas())
    out = out.rename(columns={"event_type": "cur"})
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["prev", "cur"]).reset_index(drop=True),
        preserve_index=False)


def q_entity_graph(sf_dir: str):
    """KG relation discovery: flagship annotation → entity
    co-occurrence edges (ontology URIs linked on the same page, one
    bucket shuffle on subj, pair expansion per subject)."""
    from ..pipelines.annotate import PipelineSpec, annotate_pages
    from ..stages.graph import entity_cooccurrence
    from ..synth import gen_pages

    triples = annotate_pages(rd.from_arrow(gen_pages(2000)),
                             PipelineSpec(n_buckets=16))
    out = entity_cooccurrence(triples, nb=16).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["uri_a", "uri_b"]).reset_index(drop=True),
        preserve_index=False)


def q_curate_documents(sf_dir: str):
    """Training-data curation flagship over the documents table:
    quality scoring + language-ID + fingerprint + exact-dup marker in
    one streamed pass (stateless kernels + one bucket shuffle)."""
    enriched = (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(textstats.quality_features, batch_format="pyarrow")
        .map_batches(as_task_fn(textstats.LangIdStage), batch_format="pyarrow")
        .map_batches(textstats.fingerprint, batch_format="pyarrow")
    )
    keep = dedup_exact(enriched, ["content_hash"], nb=16, keep_order_col="doc_id")
    return keep.select_columns(
        ["doc_id", "lang", "lang_pred", "quality_score", "fingerprint", "content_hash"]
    )


def q_minhash_near_dups(sf_dir: str):
    from ..stages.dedup import minhash_near_dups

    return minhash_near_dups(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)


def q_simhash_near_dups(sf_dir: str):
    from ..stages.dedup import simhash_near_dups

    return simhash_near_dups(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)


def q_embedding_near_dups(sf_dir: str):
    """Random testdata vectors have no near-dups, so plant exact copies
    (vec_id + 1_000_000) — the operator must recover exactly those
    planted pairs at threshold 0.99."""
    from ..stages.dedup import embedding_near_dups

    base = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    planted = base.slice(0, 50).set_column(
        0, "vec_id", pc.add(base.slice(0, 50).column("vec_id"), 1_000_000)
    )
    vecs = rd.from_arrow(pa.concat_tables([base, planted]))
    return embedding_near_dups(vecs, dim=64, threshold=0.99)


def q_dup_clusters(sf_dir: str):
    """Near-dup PAIRS → duplicate CLUSTERS (connected components via
    distributed min-label propagation) — the keep-one-representative
    dedup decision. Rows-only (pairs come from LSH)."""
    from ..stages.dedup import dup_clusters, minhash_near_dups

    pairs = minhash_near_dups(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)
    out = dup_clusters(pairs, nb=8)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_knn_ivf(sf_dir: str):
    from ..stages.similarity import knn_ivf

    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                            filters=[("vec_id", "<", 5)])
    out = knn_ivf(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                        override_num_blocks=8),
        queries, k=10, n_centroids=16, nprobe=4,
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_knn_ivf_indexed(sf_dir: str):
    """Persisted-IVF query path: build (or resume) the per-centroid
    parquet index under /tmp, then read ONLY the probed cells."""
    from ..stages.similarity import build_ivf_index, index_dir_for, knn_ivf_indexed

    idx_dir = index_dir_for(f"{sf_dir}/embeddings.parquet")
    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                           override_num_blocks=8)
    build_ivf_index(vecs, idx_dir, n_centroids=16)
    queries = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                            filters=[("vec_id", "<", 5)])
    out = knn_ivf_indexed(idx_dir, queries, k=10, nprobe=4)
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_langid(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(as_task_fn(textstats.LangIdStage), batch_format="pyarrow")
        .select_columns(["doc_id", "lang_pred"])
    )


def q_quality(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.quality_features, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens_q", "stopword_ratio", "quality_score"])
    )


def q_fingerprint(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.fingerprint, batch_format="pyarrow")
        .select_columns(["doc_id", "fingerprint", "content_hash"])
    )


def q_tfidf_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document (two-pass: broadcast IDF table +
    vectorized scoring). Rows-only (floating scores; semantics pinned
    by pytest)."""
    out = textstats.tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=3, nb=16)
    df = out.to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_lm_score(sf_dir: str):
    """Hashed-unigram LM perplexity-style quality score (rows-only:
    smoothed float probabilities; semantics pinned by pytest)."""
    out = textstats.unigram_logprob_score(_docs(sf_dir, ["doc_id", "text"]))
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_sample_seeded(sf_dir: str):
    # K3 random quota — seeded for determinism within a session
    return _docs(sf_dir, ["doc_id"]).random_sample(0.1, seed=42)


def q_multimodal_image(sf_dir: str):
    """REAL PNG decode path (pure-python codec): true dimensions +
    color-histogram features from actual encoded images."""
    from ..stages.multimodal import ImageDecodeStage, synth_media_table

    media = rd.from_arrow(synth_media_table(256, kind="png"))
    return media.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


def q_multimodal_video(sf_dir: str):
    """REAL video frame sampling over the MPNG container (indexed PNG
    frames): seek-table frame access, true dims/duration, per-frame
    color histograms. Row-expanding actor-pool stage."""
    from ..stages.multimodal import VideoFrameSampleStage, synth_media_table

    media = rd.from_arrow(synth_media_table(128, kind="mpng"))
    return media.map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 4)
    )


def q_multimodal_audio(sf_dir: str):
    """REAL PCM16 WAV decode path: true durations + band-energy spectra."""
    from ..stages.multimodal import AudioFeaturizeStage, synth_media_table

    media = rd.from_arrow(synth_media_table(256, kind="wav"))
    return media.map_batches(
        AudioFeaturizeStage, fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a held-out eval slice,
# here doc_id % 97 == 0): benchmark grams reduced + broadcast once, the
# train corpus streams through one stateless membership map — no
# shuffle touches the corpus
def q_decontaminate(sf_dir: str):
    import numpy as np

    from ..stages.textstats import decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])

    def split(eq: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0
            return t.filter(pa.array(m if eq else ~m))

        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    df = decontaminate(train, bench, k=3).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    df["n_hits"] = df["n_hits"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# KG construction: token co-occurrence edges — per-doc distinct sets,
# one vectorized self-merge per batch, map-side combined partials,
# single (t1, t2) groupby-sum; only pair partials are shuffled
def q_cooccurrence_edges(sf_dir: str):
    from ..stages.graph import cooccurrence_edges

    out = cooccurrence_edges(_docs(sf_dir, ["doc_id", "text"]), min_count=5)
    df = out.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# BM25 ranked retrieval: two streaming passes (corpus stats reduce,
# then broadcast-stats scoring with per-batch local top-k) — the
# corpus is never shuffled or collected
def q_bm25(sf_dir: str):
    from ..stages.textstats import bm25_topk

    return bm25_topk(_docs(sf_dir, ["doc_id", "text"]),
                     terms=["table", "scan", "vector"], topk=20)


# Edit-distance fuzzy matching (string-linking tier): queries are
# deterministic misspellings (2nd char dropped) of every 50th part
# name; candidates stream, each batch emits only per-query bests
def q_fuzzy_match(sf_dir: str):
    from ..stages.similarity import fuzzy_min_match

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    qdf = part.map_batches(
        lambda t: t.filter(pa.array(
            t.column("p_partkey").to_numpy() % 50 == 0)),
        batch_format="pyarrow").to_pandas()
    qs = sorted({n[0] + n[2:] for n in qdf["p_name"]})
    return fuzzy_min_match(part, qs, col="p_name")


# Distributed table profiler (df.describe() of the engine): per-batch
# column partials + one bucket-shuffled exact-distinct dedup — only
# |cols|-sized partials and per-batch-unique value hashes move
def q_profile_events(sf_dir: str):
    from ..stages.profile import profile_table

    return profile_table(
        _events(sf_dir),
        ["event_id", "ts", "user_id", "event_type", "value", "props"])


# OHLC time-bucket resample: one partial row per (key, hour) per batch
# (map-side combine), deterministic first/last by (ts, event_id)
def q_ohlc_events(sf_dir: str):
    from ..stages.windows import ohlc_resample

    out = ohlc_resample(_events(
        sf_dir, ["event_id", "ts", "event_type", "value"]))
    df = out.to_pandas()
    df["bucket_ts"] = df["bucket_ts"].astype("datetime64[us]")
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


# Connected components over an oracle-able derived graph (users linked
# to user_id+7 when they share a high-value event) — distributed
# min-label propagation vs a DuckDB recursive-CTE transitive closure
def q_connected_components(sf_dir: str):
    from ..stages.dedup import dup_clusters

    def edges(t: pa.Table) -> pa.Table:
        keep = t.column("value").to_numpy(zero_copy_only=False) > 250.0
        u = t.column("user_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table({"id_a": pa.array(u, pa.int64()),
                         "id_b": pa.array(u + 7, pa.int64())})

    pairs = dedup_exact(
        _events(sf_dir, ["user_id", "value"]).map_batches(
            edges, batch_format="pyarrow"),
        ["id_a", "id_b"], nb=8)
    out = dup_clusters(pairs, nb=8, max_iters=60).to_pandas()
    out = out.rename(columns={"doc_id": "node", "cluster_rep": "component"})
    out["node"] = out["node"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("node").reset_index(drop=True), preserve_index=False)


# Time-RANGE trailing window frame (1h PRECEDING AND CURRENT ROW,
# peers included): vectorized composite-key searchsorted bounds +
# integer-cent prefix sums — exact, order-independent
def q_trailing_sum(sf_dir: str):
    from ..stages.windows import trailing_time_sum_per_key

    out = trailing_time_sum_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        window=pd.Timedelta(hours=1))
    df = out.to_pandas()[["event_id", "tsum"]]
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


# Naive Bayes text classifier (feature-hashed, bounded broadcast
# model): train on even doc_ids' lang, score the odd half, report the
# confusion counts — one train pass + one score pass
def q_nb_lang_confusion(sf_dir: str):
    from ..stages.textstats import nb_predict, nb_train

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def even(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t.column("doc_id").to_numpy() % 2 == 0))

    def odd(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(
            t.column("doc_id").to_numpy() % 2 == 1))

    model = nb_train(docs.map_batches(even, batch_format="pyarrow"), "lang")
    test = docs.map_batches(odd, batch_format="pyarrow")
    preds = nb_predict(test, model)
    truth = test.select_columns(["doc_id", "lang"])
    from ..stages.join import shuffle_hash_join

    j = shuffle_hash_join(preds, truth, on=["doc_id"], how="inner", nb=8)
    conf = (j.to_pandas().groupby(["lang", "pred"], as_index=False)
            .size().rename(columns={"size": "n"}))
    conf["n"] = conf["n"].astype("int64")
    return pa.Table.from_pandas(
        conf.sort_values(["lang", "pred"]).reset_index(drop=True),
        preserve_index=False)


# Distributed Lloyd k-means over the embeddings corpus: centroids
# broadcast per iteration, per-batch partials only; output is the
# cluster-size histogram (rows-only — iterative float fixpoint)
def q_kmeans_embeddings(sf_dir: str):
    from ..stages.similarity import kmeans

    from ray.data.aggregate import Count

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    _, assign = kmeans(emb, k=10, max_iters=12)
    sizes = (assign.groupby("cluster")
             .aggregate(Count(alias_name="n_vecs")).to_pandas())
    sizes["cluster"] = sizes["cluster"].astype("int64")
    return pa.Table.from_pandas(
        sizes.sort_values("cluster").reset_index(drop=True),
        preserve_index=False)


# OLS simple regression by sufficient statistics: 5 numbers per batch
# cross the wire (n, Σx, Σy, Σxy, Σx²) — slope/intercept vs DuckDB's
# regr_slope/regr_intercept
def q_linreg_lineitem(sf_dir: str):
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("l_quantity").to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([x.sum()]), "sy": pa.array([y.sum()]),
            "sxy": pa.array([(x * y).sum()]), "sxx": pa.array([(x * x).sum()])})

    st = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .sum(["n", "sx", "sy", "sxy", "sxx"]))
    n = st["sum(n)"]
    sx, sy, sxy, sxx = (st["sum(sx)"], st["sum(sy)"], st["sum(sxy)"],
                        st["sum(sxx)"])
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * sx / n

    def r4(v):
        return float(np.sign(v) * np.floor(np.abs(v) * 1e4 + 0.5) / 1e4)

    return pa.table({"slope": pa.array([r4(slope)]),
                     "intercept": pa.array([r4(intercept)])})


# Grouped OLS: per-order-priority slope of price on quantity — the
# same 5 sufficient statistics, now keyed (map-side partials per group)
def q_grouped_linreg(sf_dir: str):
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["x"] = df["l_quantity"].astype(np.float64)
        df["y"] = df["l_extendedprice"].astype(np.float64)
        df["xy"] = df["x"] * df["y"]
        df["xx"] = df["x"] * df["x"]
        g = df.groupby("l_returnflag", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (li.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx")).to_pandas())
    n, sx, sy = agg["n"], agg["sx"], agg["sy"]
    slope = (n * agg["sxy"] - sx * sy) / (n * agg["sxx"] - sx * sx)
    sl = slope.to_numpy()
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "slope": np.sign(sl) * np.floor(np.abs(sl) * 1e4 + 0.5) / 1e4})
    return pa.Table.from_pandas(
        out.sort_values("l_returnflag").reset_index(drop=True),
        preserve_index=False)


# Time-weighted average (irregular event times): each value weighted
# by its holding duration until the user's next event — lag/lead
# machinery, exact microsecond-integer weights
def q_time_weighted_avg(sf_dir: str):
    from ..stages.canonicalize import _B, _add_bucket

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, ["user_id"], 16)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("datetime64[us]").astype("int64")
        nxt = ts.groupby(df["user_id"].to_numpy()).shift(-1)
        dur = (nxt - ts).to_numpy()  # NaN on each user's last event
        w = np.nan_to_num(dur, nan=0.0)
        v = df["value"].to_numpy()
        part = pd.DataFrame({"user_id": df["user_id"],
                             "wv": v * w, "w": w})
        out = part.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (ev.map_batches(local, batch_format="pyarrow", batch_size=65536)
           .groupby(_B).map_groups(finish, batch_format="pyarrow")
           .to_pandas())
    # single-event users have zero total duration — undefined TWA,
    # absent from the oracle too
    agg = agg[agg["w"] > 0]
    r = agg["wv"].to_numpy() / agg["w"].to_numpy()
    out = pd.DataFrame({
        "user_id": agg["user_id"].astype("int64"),
        "twa": np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6})
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True),
        preserve_index=False)


# Per-label embedding centroids in long form (label, pos, c): per
# batch ONE pandas groupby over the reshaped matrix collapses to
# (labels × dim) partials before the tiny Sum shuffle
def q_embedding_centroids(sf_dir: str):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy(zero_copy_only=False)
        col = batch.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // len(batch)
        M = pd.DataFrame(flat.reshape(len(batch), d))
        M["label"] = lab
        g = M.groupby("label")
        s = g.sum(numeric_only=True)
        n = g.size()
        long = s.reset_index().melt(id_vars="label", var_name="pos",
                                    value_name="s")
        long["pos"] = long["pos"].astype(np.int64) + 1
        long["n"] = long["label"].map(n).astype(np.int64)
        return pa.Table.from_pandas(long, preserve_index=False)

    agg = (emb.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
           .groupby(["label", "pos"])
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    df = agg.to_pandas()
    c = df["s"].to_numpy() / df["n"].to_numpy()
    df["c"] = np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6
    df = df[["label", "pos", "c"]].sort_values(["label", "pos"])
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


# Degree histogram of the derived customer graph: two chained
# map-side-combined count reductions (node degrees → degree counts)
def q_degree_distribution(sf_dir: str):
    from ..stages.canonicalize import distinct_counts

    e = _derived_customer_edges(sf_dir)
    ends = e.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t.column("a").combine_chunks(),
            t.column("b").combine_chunks()])}),
        batch_format="pyarrow")
    deg = distinct_counts(ends, "node", nb=16).map_batches(
        lambda t: t.rename_columns(["node", "deg"]), batch_format="pyarrow")
    hist = distinct_counts(deg.select_columns(["deg"]), "deg", nb=8)
    df = hist.to_pandas().rename(columns={"count": "n_nodes"})
    return pa.Table.from_pandas(
        df.sort_values("deg").reset_index(drop=True), preserve_index=False)


# Centered ROWS window mean (2 preceding .. 2 following)
def q_centered_mean_events(sf_dir: str):
    from ..stages.windows import centered_mean_per_key

    out = centered_mean_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]), half=2)
    df = out.to_pandas()[["event_id", "cmean"]]
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


# ratio_to_report: value / sum(value) over its event_type — exact
# integer-cent denominators broadcast as a tiny dict
def q_share_of_type(sf_dir: str):
    ev = _events(sf_dir, ["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        g = (pd.DataFrame({"event_type": df["event_type"], "c": cents})
             .groupby("event_type", as_index=False)["c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    tot = (ev.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("event_type").aggregate(Sum("c", alias_name="c"))
           .to_pandas())
    denom = dict(zip(tot["event_type"], tot["c"].astype(np.int64) / 100.0))

    def ratio(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        r = df["value"].to_numpy() / df["event_type"].map(denom).to_numpy()
        r = np.sign(r) * np.floor(np.abs(r) * 1e6 + 0.5) / 1e6
        return pa.table({"event_id": batch.column("event_id"),
                         "share": pa.array(r, pa.float64())})

    df = ev.map_batches(ratio, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


# Deterministic global training-data shuffle: every doc gets a
# reproducible permutation position (md5 key → global_row_number) —
# the "shuffle the corpus identically on any cluster" primitive
def q_shuffle_positions(sf_dir: str):
    from ..functions.hashing import md5_u32
    from ..stages.windows import global_row_number

    docs = _docs(sf_dir, ["doc_id"])

    def addkey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "hkey", pa.array(md5_u32(t.column("doc_id").to_pylist())))

    ranked = global_row_number(
        docs.map_batches(addkey, batch_format="pyarrow"),
        order_cols=["hkey", "doc_id"], n_parts=8, out="pos")
    df = ranked.to_pandas()[["doc_id", "pos"]]
    return pa.Table.from_pandas(
        df.sort_values("doc_id").reset_index(drop=True), preserve_index=False)


# Bloom probe-side pruning in front of the shuffle semi join: orders'
# big-spender custkeys build a 1 MiB bitset; bloom-negative customers
# never enter the exchange — output identical to the plain semi join
def q_bloom_semi_join(sf_dir: str):
    from ..stages.join import bloom_prefilter, shuffle_hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(pa.compute.greater(
            t.column("o_totalprice"), 300_000.0))
        .select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow")
    pruned = bloom_prefilter(cust, big, on=["c_custkey"])
    out = shuffle_hash_join(pruned, big, on=["c_custkey"], how="semi",
                            nb=16).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("c_custkey").reset_index(drop=True),
        preserve_index=False)


# TPC-H Q5-shaped 6-table join: small dims broadcast (region→nation→
# supplier), the two fact joins shuffle (orders⋈customer on custkey,
# then ⋈lineitem on orderkey), supplier matched on BOTH l_suppkey and
# the customer's nation (local-supplier constraint)
def q_q5_revenue(sf_dir: str):
    import pyarrow.dataset as pads

    from ..stages.join import broadcast_join, shuffle_hash_join

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia = region.filter(pa.compute.equal(region.column("r_name"), "ASIA"))
    asia_nat = nation.filter(pa.compute.is_in(
        nation.column("n_regionkey"), value_set=asia.column("r_regionkey")))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pa.compute.is_in(
        supp.column("s_nationkey"), value_set=asia_nat.column("n_nationkey")))
    nk2name = dict(zip(asia_nat.column("n_nationkey").to_pylist(),
                       asia_nat.column("n_name").to_pylist()))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey",
                                             "o_orderdate"],
        filter=(pads.field("o_orderdate")
                >= pads.scalar(pd.Timestamp("1996-01-01")))
        & (pads.field("o_orderdate") < pads.scalar(pd.Timestamp("1997-01-01"))))
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(lambda t: t.rename_columns(["o_custkey", "c_nationkey"]),
                  batch_format="pyarrow")
    oc = shuffle_hash_join(orders, cust, on=["o_custkey"], how="inner",
                           nb=16).map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"]),
        batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_suppkey",
                                    "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
    ol = shuffle_hash_join(oc, li, on=["o_orderkey"], how="inner", nb=16)
    supp_b = rd.from_arrow(supp.rename_columns(["l_suppkey", "c_nationkey"]))
    full = broadcast_join(ol, supp_b, on=["l_suppkey", "c_nationkey"],
                          how="inner")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_name"] = df["c_nationkey"].map(nk2name)
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("n_name", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (full.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
           .groupby("n_name").aggregate(Sum("revenue", alias_name="revenue")))
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return pa.Table.from_pandas(
        df.sort_values("n_name").reset_index(drop=True), preserve_index=False)


# Entity resolution: blocked Levenshtein similarity join — corrupted
# part names (2nd char dropped) matched back against the catalog under
# (first-char, length-band) blocking
def q_er_parts(sf_dir: str):
    from ..stages.similarity import blocked_lev_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    corrupted = part.map_batches(
        lambda t: t.filter(pa.array(
            t.column("p_partkey").to_numpy() % 20 == 0)),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            "p_partkey": t.column("p_partkey"),
            "p_name": pa.array([s[:1] + s[2:] for s in
                                t.column("p_name").to_pylist()])}),
        batch_format="pyarrow")
    out = blocked_lev_join(corrupted, part, "p_partkey", "p_name",
                           "p_partkey", "p_name", max_dist=2,
                           nb=16).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["l_id", "r_id"]).reset_index(drop=True),
        preserve_index=False)


# Global NTILE(8) composed from global_row_number: bucket sizes follow
# SQL NTILE exactly (first n%k buckets one row larger)
def q_global_ntile_orders(sf_dir: str):
    from ..stages.windows import global_row_number

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])
    n = src.count()  # metadata-only row count; no execution
    ranked = global_row_number(
        src, order_cols=["o_totalprice", "o_orderkey"], n_parts=16)
    k = 8
    big, rem = divmod(n, k)

    def tile(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False) - 1
        cut = rem * (big + 1)
        tl = np.where(rn < cut, rn // (big + 1),
                      rem + (rn - cut) // big if big else rem)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "tile": pa.array((tl + 1).astype(np.int64))})

    df = ranked.map_batches(tile, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("o_orderkey").reset_index(drop=True),
        preserve_index=False)


# CDC MERGE apply: one bucket shuffle co-locates base and change rows;
# upserts replace/insert, deletes drop — change side always wins
def q_merge_orders(sf_dir: str):
    from ..stages.join import merge_upsert

    base = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"])

    def mk_changes(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        m = k % 7
        dk, dp = k[m == 0], np.full((m == 0).sum(), np.nan)
        uk, up = k[m == 1], p[m == 1] + 1000.0
        ik, ip = k[m == 2] + 10_000_000, np.full((m == 2).sum(), 42.42)
        return pa.table({
            "o_orderkey": pa.array(np.concatenate([dk, uk, ik]), pa.int64()),
            "o_totalprice": pa.array(np.concatenate([dp, up, ip]),
                                     pa.float64()),
            "op": pa.array(["delete"] * len(dk) + ["upsert"] * (len(uk)
                                                                + len(ik))),
        })

    changes = base.map_batches(mk_changes, batch_format="pyarrow")
    out = merge_upsert(base, changes, on=["o_orderkey"], nb=16).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("o_orderkey").reset_index(drop=True),
        preserve_index=False)


# Incremental materialized-view maintenance: a stored (user, n, s)
# aggregate absorbs an insert+retraction delta — integer-cent sums make
# cancellation exact; no recompute over the base facts
def q_incremental_agg(sf_dir: str):
    from ..stages.canonicalize import incremental_agg

    ev = _events(sf_dir, ["user_id", "ts", "event_type", "value"])
    t_base = np.datetime64("2024-01-15")
    t_del = np.datetime64("2024-01-08")

    def base_rows(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ts < t_base))

    def delta_rows(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        ins = t.filter(pa.array(ts >= t_base)).append_column(
            "w", pa.array(np.ones(int((ts >= t_base).sum()), np.int64)))
        retr_m = (ts < t_del) & (et == "error")
        retr = t.filter(pa.array(retr_m)).append_column(
            "w", pa.array(np.full(int(retr_m.sum()), -1, np.int64)))
        return pa.concat_tables([ins, retr])

    empty = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}))
    base_agg = incremental_agg(
        empty, ev.map_batches(base_rows, batch_format="pyarrow"),
        ["user_id"], "value")
    out = incremental_agg(
        base_agg, ev.map_batches(delta_rows, batch_format="pyarrow"),
        ["user_id"], "value", weight_col="w").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True),
        preserve_index=False)


# Per-document Shannon entropy of the token distribution — exact-int
# counts, one log per distinct (doc, token); half-away-from-zero
# round to match DuckDB's round()
def q_token_entropy(sf_dir: str):
    out = textstats.token_entropy(_docs(sf_dir, ["doc_id", "text"]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# Global z-score normalization via sufficient statistics (n, Σx, Σx²):
# two tiny aggregates, one stateless normalize pass — no global sort
def q_zscore_events(sf_dir: str):
    ev = _events(sf_dir, ["event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "s": pa.array([float(v.sum())], pa.float64()),
                         "sq": pa.array([float((v * v).sum())], pa.float64())})

    st = (ev.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .sum(["n", "s", "sq"]))
    n, s, sq = st["sum(n)"], st["sum(s)"], st["sum(sq)"]
    mu = s / n
    sd = float(np.sqrt(sq / n - mu * mu))

    def norm(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        z = (v - mu) / sd
        z = np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4
        return pa.table({"event_id": batch.column("event_id"),
                         "z": pa.array(z, pa.float64())})

    df = ev.map_batches(norm, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


# Tukey-fence outlier filter: exact interpolated quartiles (two rank
# probes, no global sort) → broadcast bounds → stateless filter
def q_iqr_outliers(sf_dir: str):
    from ..stages.sketches import exact_quantile_cont

    ev = _events(sf_dir, ["event_id", "value"])
    q = exact_quantile_cont(ev, "value", [0.25, 0.75])
    q1, q3 = q[0.25], q[0.75]
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)

    def flt(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v < lo) | (v > hi)))

    df = ev.map_batches(flt, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


# Deterministic weighted sampling (A-ES with an md5-derived uniform):
# P(selected) ∝ o_totalprice; map-side local top-k keeps the final
# sort+limit at ≤ k·n_blocks rows
def q_weighted_sample(sf_dir: str):
    from ..stages.sketches import weighted_sample

    out = weighted_sample(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"]),
        id_col="o_orderkey", weight_col="o_totalprice", k=500).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("o_orderkey").reset_index(drop=True),
        preserve_index=False)


# Ordered funnel (click → view → purchase, strictly increasing ts,
# earliest-completion semantics): one user-bucket shuffle, per-step
# masked groupby-min across ALL users in the group at once
def q_funnel_events(sf_dir: str):
    from ..stages.windows import funnel_steps_per_user

    out = funnel_steps_per_user(
        _events(sf_dir, ["user_id", "ts", "event_type"]),
        steps=["click", "view", "purchase"]).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True),
        preserve_index=False)


# Ontology-subsumption-shaped transitive closure: all (node, ancestor)
# pairs over the decimal-prefix DAG on o_orderkey — semi-naive datalog
# (frontier-only joins) vs a DuckDB recursive CTE
def q_transitive_closure(sf_dir: str):
    from ..stages.graph import transitive_closure

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    edges = orders.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t.column("o_orderkey"), 10))
        .rename_columns(["child"]),
        batch_format="pyarrow").map_batches(
        lambda t: t.append_column(
            "parent", pa.compute.divide(t.column("child"), 10)),
        batch_format="pyarrow")
    out = transitive_closure(edges, nb=16).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["node", "anc"]).reset_index(drop=True),
        preserve_index=False)


# Distributed frontier BFS (min-hop distance from a seed set) over a
# multi-path DAG (decimal + base-7 prefix edges, so min() is decisive)
# vs a DuckDB recursive CTE with a final min-aggregate
def q_bfs_depth(sf_dir: str):
    from ..stages.graph import bfs_min_depth

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        dst = np.concatenate([k[k >= 10], k[k >= 7]])
        src = np.concatenate([k[k >= 10] // 10, k[k >= 7] // 7])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    out = bfs_min_depth(
        orders.map_batches(edges, batch_format="pyarrow"),
        seeds=list(range(1, 10)), nb=16).to_pandas()
    out["dist"] = out["dist"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("node").reset_index(drop=True), preserve_index=False)


# Deterministic sparse multi-hash graph on customers, shared by the
# triangle-count and degree-distribution queries (and their oracles —
# one recipe, one place to change it)
def _derived_customer_edges(sf_dir: str):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def edges(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        us = np.concatenate([u, u, u])
        vs = np.concatenate([(u * 37) % 500, (u * 101) % 500,
                             (u * 7 + 13) % 500])
        keep = us != vs
        us, vs = us[keep], vs[keep]
        return pa.table({"a": pa.array(np.minimum(us, vs), pa.int64()),
                         "b": pa.array(np.maximum(us, vs), pa.int64())})

    return dedup_exact(
        orders.map_batches(edges, batch_format="pyarrow"), ["a", "b"], nb=16)


# Triangle count over the derived customer graph — degree-oriented
# wedge join + closing semi join (O(m^1.5) wedges) vs DuckDB's
# three-way self-join
def q_triangle_count(sf_dir: str):
    from ..stages.graph import triangle_count

    n = triangle_count(_derived_customer_edges(sf_dir), nb=16)
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


# BM25 via the PERSISTED inverted index: reads only the query terms'
# bucket files (storage-level pruning) — bit-identical to the full-scan
# bm25 operator, so it shares that oracle
def q_bm25_indexed(sf_dir: str):
    from ..stages.textindex import (build_text_index, search_text_index,
                                    text_index_dir_for)

    src = f"{sf_dir}/documents.parquet"
    idx = text_index_dir_for(src)
    build_text_index(_docs(sf_dir, ["doc_id", "text"]), idx)
    return search_text_index(idx, ["table", "scan", "vector"], topk=20)


# --- round-3 additions ------------------------------------------------
def q_domain_caps(sf_dir: str):
    """Per-source document quota — the Common-Crawl "keep at most N
    docs per domain" curation op (cap_per_key, Arrow-native)."""
    from ..stages.windows import cap_per_key

    out = cap_per_key(_docs(sf_dir, ["doc_id", "source"]),
                      key_col="source", order_cols=["doc_id"], n=10, nb=8)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP hierarchy: one wide shuffle + per-level tiny
    re-aggregations over integer-cent sums."""
    from ..stages.canonicalize import rollup_agg

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
    out = rollup_agg(orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice")
    df = out.to_pandas()
    df["sum_value"] = df["sum_value"].round(2)
    df = df.sort_values(["o_orderstatus", "o_orderpriority"],
                        na_position="last").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def q_fingerprint_events(sf_dir: str):
    """Order-insensitive table checksum (Σ md5 mod 2^61−1 + count) —
    cross-engine verification of a materialized table."""
    from ..stages.sketches import table_fingerprint

    fp, n = table_fingerprint(_events(sf_dir, ["event_id"]), "event_id")
    return pa.table({"fp": pa.array([fp], pa.int64()),
                     "n": pa.array([n], pa.int64())})


def q_graph_components(sf_dir: str):
    """Connected components (distributed min-label propagation — the
    dup-cluster/sameAs-merge operator) over the derived customer graph,
    against a recursive-CTE min-reachable-label oracle."""
    from ..stages.dedup import dup_clusters

    pairs = _derived_customer_edges(sf_dir).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b"]), batch_format="pyarrow")
    df = dup_clusters(pairs, nb=16).to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["cluster_rep"] = df["cluster_rep"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("doc_id").reset_index(drop=True),
                                preserve_index=False)


def q_pmi_pairs(sf_dir: str):
    """Top PMI-scored co-occurring term pairs (KG relatedness edges):
    cooccurrence shuffle + distinct-key token counts + broadcast
    scoring, ln() bit-parity with the DuckDB oracle."""
    from ..stages.graph import pmi_pairs

    out = pmi_pairs(_docs(sf_dir, ["doc_id", "text"]), min_count=5)
    df = out.to_pandas()
    df["n_ab"] = df.pop("n_docs").astype("int64")
    df = df.sort_values(["pmi", "t1", "t2"], ascending=[False, True, True],
                        kind="mergesort").head(100).reset_index(drop=True)
    return pa.Table.from_pandas(df[["t1", "t2", "n_ab", "pmi"]],
                                preserve_index=False)


def q_two_hop_counts(sf_dir: str):
    """≤2-hop neighborhood size per node over the derived customer
    graph — multi-join composition: undirected expand → shuffle
    self-join → exact dedup → distinct-count reduce."""
    from ..stages.join import shuffle_hash_join

    e = _derived_customer_edges(sf_dir)  # (a, b) deduped, a < b

    def und(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nb": pa.concat_arrays([b, a])})

    ed = e.map_batches(und, batch_format="pyarrow").materialize()
    mid = ed.map_batches(lambda t: t.rename_columns(["nb", "nb2"]),
                         batch_format="pyarrow")
    two = shuffle_hash_join(ed, mid, on=["nb"], how="inner", nb=16).map_batches(
        lambda t: t.filter(pc.not_equal(t.column("node"), t.column("nb2")))
                   .select(["node", "nb2"]).rename_columns(["node", "nb"]),
        batch_format="pyarrow")
    both = dedup_exact(ed.union(two), ["node", "nb"], nb=16)
    out = distinct_counts(both.select_columns(["node"]), "node", nb=16)
    df = out.to_pandas().rename(columns={"count": "n_within2"})
    df["node"] = df["node"].astype("int64")
    df["n_within2"] = df["n_within2"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("node").reset_index(drop=True),
                                preserve_index=False)


def q_table_diff_orders(sf_dir: str):
    """Snapshot diff (added/removed/changed) between orders and a
    deterministically-derived second snapshot — one full-outer bucket
    shuffle + vectorized null-safe classify (table_diff)."""
    from ..stages.join import table_diff

    base = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_totalprice"])

    def derive(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        keep = (k % 97) != 0
        k2, v2 = k[keep], v[keep].copy()
        v2[(k2 % 89) == 0] += 1.0  # exact double bump, no rounding
        add = (k % 101) == 0
        return pa.table({
            "o_orderkey": pa.array(
                np.concatenate([k2, k[add] + 30000000]).astype(np.int64)),
            "o_totalprice": pa.array(
                np.concatenate([v2, v[add]]), pa.float64()),
        })

    new = base.map_batches(derive, batch_format="pyarrow")
    out = table_diff(base, new, ["o_orderkey"], ["o_totalprice"], nb=16)
    df = out.to_pandas()
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    return pa.Table.from_pandas(
        df.sort_values(["o_orderkey", "change"]).reset_index(drop=True),
        preserve_index=False)


QUERIES = {
    "count_documents": q_count_documents,
    "filter_lang_en": q_filter_lang_en,
    "normalize_text": q_normalize_text,
    "extract_json_k": q_extract_json_k,
    "token_counts": q_token_counts,
    "bpe_token_counts": q_bpe_token_counts,
    "train_split": q_train_split,
    "chunk_documents": q_chunk_documents,
    "lineitem_date_filter": q_lineitem_date_filter,
    "graph_degrees": q_graph_degrees,
    "graph_pagerank": q_graph_pagerank,
    "canonicalize_events": q_canonicalize_events,
    "latest_event_per_user_type": q_latest_event_per_user_type,
    "dedup_docs": q_dedup_docs,
    "distinct_event_types": q_distinct_event_types,
    "topk_event_types": q_topk_event_types,
    "lineitem_agg": q_lineitem_agg,
    "revenue_per_nation": q_revenue_per_nation,
    "join_orders_lineitem": q_join_orders_lineitem,
    "full_outer_join": q_full_outer_join,
    "semi_join_customers": q_semi_join_customers,
    "top_building_orders": q_top_building_orders,
    "hash_sample": q_hash_sample,
    "anti_join_docs": q_docs_without_label0_vec,
    "top_orders": q_top_orders,
    "window_events": q_window_events,
    "session_windows": q_session_windows,
    "sliding_windows": q_sliding_windows,
    "partition_date": q_partition_date,
    "ts_parts": q_ts_parts,
    "asof_join_events": q_asof_join_events,
    "rank_events": q_rank_events,
    "lag_events": q_lag_events,
    "lead_events": q_lead_events,
    "last_value_events": q_last_value_events,
    "nth_value_events": q_nth_value_events,
    "quantiles": q_quantiles,
    "quantiles_cont": q_quantiles_cont,
    "stddev_by_type": q_stddev_by_type,
    "corr_price_qty": q_corr_price_qty,
    "interval_join_sessions": q_interval_join_sessions,
    "range_partition_orders": q_range_partition_orders,
    "grouped_quantile": q_grouped_quantile,
    "stratified_sample": q_stratified_sample,
    "pivot_events": q_pivot_events,
    "approx_distinct_users": q_approx_distinct_users,
    "domain_caps": q_domain_caps,
    "rollup_orders": q_rollup_orders,
    "fingerprint_events": q_fingerprint_events,
    "graph_components": q_graph_components,
    "pmi_pairs": q_pmi_pairs,
    "two_hop_counts": q_two_hop_counts,
    "table_diff_orders": q_table_diff_orders,
    "heavy_hitters": q_heavy_hitters,
    "knn_cosine": q_knn_cosine,
    "cumsum_events": q_cumsum_events,
    "moving_avg_events": q_moving_avg_events,
    "repetition_stats": q_repetition_stats,
    "gopher_filter": q_gopher_filter,
    "semi_join_latest_events": q_semi_join_latest_events,
    "top_bigrams": q_top_bigrams,
    "setop_intersect": q_setop_intersect,
    "setop_except": q_setop_except,
    "weighted_sample": q_weighted_sample,
    "funnel_events": q_funnel_events,
    "nb_lang_confusion": q_nb_lang_confusion,
    "left_join_orders": q_left_join_orders,
    "right_join_lineitem": q_right_join_lineitem,
    "kmeans_embeddings": q_kmeans_embeddings,
    "linreg_lineitem": q_linreg_lineitem,
    "embedding_centroids": q_embedding_centroids,
    "degree_distribution": q_degree_distribution,
    "centered_mean_events": q_centered_mean_events,
    "share_of_type": q_share_of_type,
    "shuffle_positions": q_shuffle_positions,
    "bloom_semi_join": q_bloom_semi_join,
    "q5_revenue": q_q5_revenue,
    "er_parts": q_er_parts,
    "global_ntile_orders": q_global_ntile_orders,
    "merge_orders": q_merge_orders,
    "incremental_agg": q_incremental_agg,
    "token_entropy": q_token_entropy,
    "zscore_events": q_zscore_events,
    "iqr_outliers": q_iqr_outliers,
    "setop_intersect_all": q_setop_intersect_all,
    "setop_except_all": q_setop_except_all,
    "moving_max_events": q_moving_max_events,
    "global_rn_orders": q_global_rn_orders,
    "setop_union": q_setop_union,
    "source_stats": q_source_stats,
    "quality_signals": q_quality_signals,
    "supplier_nation": q_supplier_nation,
    "explode_embeddings": q_explode_embeddings,
    "region_nation_cross": q_region_nation_cross,
    "union_all_ids": q_union_all_ids,
    "like_filter": q_like_filter,
    "rollup_revenue": q_rollup_revenue,
    "cube_revenue": q_cube_revenue,
    "distinct_users_per_type": q_distinct_users_per_type,
    "dup_ngram_share": q_dup_ngram_share,
    "decontaminate": q_decontaminate,
    "cooccurrence_edges": q_cooccurrence_edges,
    "bm25": q_bm25,
    "fuzzy_match": q_fuzzy_match,
    "profile_events": q_profile_events,
    "ohlc_events": q_ohlc_events,
    "connected_components": q_connected_components,
    "trailing_sum": q_trailing_sum,
    "bm25_indexed": q_bm25_indexed,
    "annotate_ancestors": q_annotate_ancestors,
    "entity_graph": q_entity_graph,
    "event_transitions": q_event_transitions,
    "grouped_linreg": q_grouped_linreg,
    "time_weighted_avg": q_time_weighted_avg,
    "transitive_closure": q_transitive_closure,
    "bfs_depth": q_bfs_depth,
    "triangle_count": q_triangle_count,
    "topk_orders_per_priority": q_topk_orders_per_priority,
    "mode_user_per_type": q_mode_user_per_type,
    "above_avg_orders": q_above_avg_orders,
    "percent_rank_events": q_percent_rank_events,
    "cume_dist_events": q_cume_dist_events,
    "first_value_events": q_first_value_events,
    "redact_props": q_redact_props,
    "string_agg_events": q_string_agg_events,
    "histogram_values": q_histogram_values,
    "dense_rank_events": q_dense_rank_events,
    "ntile_events": q_ntile_events,
    "unpivot_events": q_unpivot_events,
    # rows-only
    "annotate_triples": q_annotate_triples,
    "curate_documents": q_curate_documents,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "embedding_near_dups": q_embedding_near_dups,
    "dup_clusters": q_dup_clusters,
    "knn_ivf": q_knn_ivf,
    "knn_ivf_indexed": q_knn_ivf_indexed,
    "langid": q_langid,
    "quality": q_quality,
    "fingerprint": q_fingerprint,
    "tfidf_terms": q_tfidf_terms,
    "lm_score": q_lm_score,
    "sample_seeded": q_sample_seeded,
    "multimodal_image": q_multimodal_image,
    "multimodal_audio": q_multimodal_audio,
    "multimodal_video": q_multimodal_video,
}

def _langid_pred_sql(extra_cols: str = "") -> str:
    """Lang-ID stopword census + argmax tie-break generated FROM
    LangIdStage.STOPWORDS itself — the single source of truth, so the
    'langid' and 'langid_agreement' oracles can never drift from the
    engine's word lists. ``extra_cols`` (e.g. ", lang") is carried
    through the CTE chain."""
    from ..stages.textstats import LangIdStage

    def lst(lang: str) -> str:
        return ",".join(f"'{w}'" for w in
                        LangIdStage.STOPWORDS[lang].split())

    counts = ",".join(
        f" len(list_filter(w, x -> x IN ({lst(lang)}))) AS {lang}"
        for lang in ("de", "en", "es", "fr"))
    return (
        f"WITH t AS (SELECT doc_id{extra_cols},"
        "  regexp_extract_all(lower(text), '\\pL+') AS w"
        f" FROM documents), c AS (SELECT doc_id{extra_cols},"
        f"{counts} FROM t),"
        f" langpred AS (SELECT doc_id{extra_cols},"
        "  CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'"
        "  WHEN de >= en AND de >= es AND de >= fr THEN 'de'"
        "  WHEN en >= es AND en >= fr THEN 'en'"
        "  WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang_pred FROM c)"
    )


ORACLES = {
    "count_documents": "SELECT count(*) AS n FROM documents",
    "filter_lang_en": "SELECT doc_id FROM documents WHERE lang = 'en'",
    "normalize_text": (
        "SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text "
        "FROM documents"
    ),
    "extract_json_k": (
        "SELECT event_id, CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k "
        "FROM events"
    ),
    "token_counts": (
        "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens FROM documents"
    ),
    "bpe_token_counts": (
        "SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]'))"
        " AS n_bpe_tokens FROM documents"
    ),
    "train_split": (
        "SELECT doc_id,"
        " CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 100 AS bucket,"
        " CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 100 < 80 THEN 'train'"
        "      WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 100 < 90 THEN 'val'"
        "      ELSE 'test' END AS split"
        " FROM documents"
    ),
    "lineitem_date_filter": (
        "SELECT count(*) AS n FROM lineitem WHERE l_shipdate < TIMESTAMP '1994-01-01'"
    ),
    "canonicalize_events": (
        "SELECT user_id, event_id, value FROM ("
        " SELECT user_id, event_id, value,"
        "        row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn"
        " FROM events) WHERE rn = 1"
    ),
    "latest_event_per_user_type": (
        "SELECT user_id, event_type, event_id FROM ("
        " SELECT user_id, event_type, event_id,"
        "        row_number() OVER (PARTITION BY user_id, event_type"
        "                           ORDER BY ts DESC, event_id DESC) AS rn"
        " FROM events) WHERE rn = 1"
    ),
    "dedup_docs": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
    "distinct_event_types": "SELECT DISTINCT event_type FROM events",
    "topk_event_types": (
        "SELECT event_type, count(*) AS n FROM events GROUP BY event_type "
        "ORDER BY n DESC, event_type LIMIT 5"
    ),
    "lineitem_agg": (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,"
        " round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n"
        " FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "revenue_per_nation": (
        "SELECT n.n_name AS nation, round(sum(o.o_totalprice), 2) AS revenue,"
        " count(*) AS n_orders"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
    ),
    "join_orders_lineitem": (
        "SELECT o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,"
        " count(*) AS n_lines"
        " FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY o_orderpriority"
    ),
    "full_outer_join": (
        "SELECT COALESCE(o.o_orderkey, l.l_orderkey) AS o_orderkey,"
        " o.o_totalprice, l.l_quantity"
        " FROM (SELECT o_orderkey, o_totalprice FROM orders"
        "       WHERE o_totalprice > 300000) o"
        " FULL OUTER JOIN (SELECT l_orderkey, l_quantity FROM lineitem"
        "       WHERE l_quantity >= 49) l"
        " ON o.o_orderkey = l.l_orderkey"
    ),
    "semi_join_customers": (
        "SELECT c_custkey FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
    ),
    "top_building_orders": (
        "SELECT o_orderkey, o_orderdate,"
        " round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
        " FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey"
        " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
        " WHERE c.c_mktsegment = 'BUILDING'"
        "   AND o.o_orderdate < TIMESTAMP '1995-03-15'"
        "   AND l.l_shipdate > TIMESTAMP '1995-03-15'"
        " GROUP BY o_orderkey, o_orderdate"
        " ORDER BY revenue DESC, o_orderkey LIMIT 10"
    ),
    "hash_sample": (
        "SELECT doc_id FROM documents WHERE"
        " CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
        " % 100 < 10"
    ),
    "anti_join_docs": (
        "SELECT doc_id FROM documents WHERE doc_id NOT IN "
        "(SELECT vec_id FROM embeddings WHERE label = 0)"
    ),
    "top_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    ),
    "window_events": (
        "SELECT event_type, date_trunc('hour', ts) AS window_start,"
        " round(sum(value), 2) AS sum_value, count(*) AS n"
        " FROM events GROUP BY event_type, date_trunc('hour', ts)"
    ),
    "session_windows": (
        "WITH x AS (SELECT user_id, ts, event_id,"
        "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events),"
        " y AS (SELECT user_id, ts,"
        "  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x)"
        " SELECT user_id, session_id, count(*) AS n_events,"
        "  min(ts) AS start_ts, max(ts) AS end_ts FROM y GROUP BY user_id, session_id"
    ),
    "sliding_windows": (
        "WITH g AS ("
        " SELECT event_type, value,"
        "  TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND *"
        "   CAST(floor(epoch(ts)/1800)*1800 - 1800*j.n AS BIGINT) AS window_start"
        " FROM events, (SELECT unnest(generate_series(0, 1)) AS n) j)"
        " SELECT event_type, window_start, round(sum(value), 2) AS sum_value,"
        " count(*) AS n FROM g GROUP BY event_type, window_start"
    ),
    "chunk_documents": (
        "WITH t AS ("
        " SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,"
        "        len(regexp_split_to_array(trim(text), '\\s+')) AS L"
        " FROM documents WHERE trim(text) <> '')"
        " SELECT doc_id, CAST(st // 24 AS INT) AS chunk_idx,"
        "  array_to_string(toks[st+1:st+32], ' ') AS chunk_text,"
        "  CAST(least(32, L - st) AS BIGINT) AS n_tokens"
        " FROM t, UNNEST(generate_series(0, greatest(1, L - 8) - 1, 24)) AS u(st)"
    ),
    "partition_date": (
        "SELECT event_id, strftime(ts, '%Y-%m-%d') AS part_date FROM events"
    ),
    "ts_parts": (
        "SELECT event_id, CAST(extract(hour FROM ts) AS BIGINT) AS h,"
        " CAST(extract(day FROM ts) AS BIGINT) AS dom,"
        " CAST(extract(month FROM ts) AS BIGINT) AS mon FROM events"
    ),
    "asof_join_events": (
        "SELECT e.event_id, l.view_ts FROM events e ASOF JOIN"
        " (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view') l"
        " ON e.user_id = l.user_id AND e.ts >= l.view_ts"
    ),
    "rank_events": (
        "SELECT event_id, row_number() OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS rn FROM events"
    ),
    "lag_events": (
        "SELECT event_id, lag(event_id) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS prev_event_id FROM events"
    ),
    "lead_events": (
        "SELECT event_id, lead(event_id) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS next_event_id FROM events"
    ),
    "last_value_events": (
        "SELECT event_id, last_value(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        " AS last_value FROM events"
    ),
    "nth_value_events": (
        "SELECT event_id, nth_value(value, 3) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        " AS third_value FROM events"
    ),
    "quantiles": (
        "SELECT round(quantile_disc(o_totalprice, 0.5), 2) AS p50,"
        " round(quantile_disc(o_totalprice, 0.9), 2) AS p90 FROM orders"
    ),
    # CMS estimates are exact here: 5 distinct values cannot collide in
    # all 4 of the 65536-wide rows (verified deterministically)
    "heavy_hitters": (
        "SELECT event_type AS value, count(*) AS approx_count FROM events"
        " GROUP BY event_type ORDER BY approx_count DESC, value LIMIT 5"
    ),
    "stddev_by_type": (
        "SELECT event_type, round(avg(value), 2) AS avg_value,"
        " round(stddev_pop(value), 2) AS sd_value FROM events GROUP BY event_type"
    ),
    "corr_price_qty": (
        "SELECT round(corr(l_extendedprice, l_quantity), 6) AS r FROM lineitem"
    ),
    "quantiles_cont": (
        "SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS p50,"
        " round(quantile_cont(o_totalprice, 0.9), 2) AS p90 FROM orders"
    ),
    "grouped_quantile": (
        "SELECT event_type, round(quantile_disc(value, 0.5), 2) AS p50"
        " FROM events GROUP BY event_type"
    ),
    "stratified_sample": (
        "SELECT event_id, event_type FROM ("
        " SELECT event_id, event_type,"
        "  row_number() OVER (PARTITION BY event_type"
        "   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn FROM events)"
        " WHERE rn <= 20"
    ),
    "range_partition_orders": (
        "WITH b AS (SELECT quantile_disc(o_totalprice, 0.25) AS q1,"
        " quantile_disc(o_totalprice, 0.5) AS q2,"
        " quantile_disc(o_totalprice, 0.75) AS q3 FROM orders)"
        " SELECT CAST(CASE WHEN o_totalprice <= q1 THEN 0"
        "  WHEN o_totalprice <= q2 THEN 1 WHEN o_totalprice <= q3 THEN 2"
        "  ELSE 3 END AS BIGINT) AS part, count(*) AS n"
        " FROM orders, b GROUP BY 1"
    ),
    "interval_join_sessions": (
        "WITH x AS (SELECT event_id, user_id, ts,"
        "  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "            > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events)"
        " SELECT event_id,"
        "  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x"
    ),
    "pivot_events": (
        "SELECT user_id,"
        " round(sum(CASE WHEN event_type='click' THEN value ELSE 0 END), 2) AS click,"
        " round(sum(CASE WHEN event_type='error' THEN value ELSE 0 END), 2) AS error,"
        " round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END), 2) AS purchase,"
        " round(sum(CASE WHEN event_type='signup' THEN value ELSE 0 END), 2) AS signup,"
        " round(sum(CASE WHEN event_type='view' THEN value ELSE 0 END), 2) AS view"
        " FROM events GROUP BY user_id"
    ),
    "cumsum_events": (
        "SELECT event_id, round(sum(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 2) AS cum_value FROM events"
    ),
    "moving_avg_events": (
        "SELECT event_id, round(avg(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)"
        " AS mov_avg FROM events"
    ),
    "repetition_stats": (
        "WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents),"
        " c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok)"
        " SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens_r,"
        "  count(*) / CAST(sum(cnt) AS DOUBLE) AS distinct_ratio,"
        "  max(cnt) / CAST(sum(cnt) AS DOUBLE) AS top_token_share"
        " FROM c GROUP BY doc_id"
    ),
    "gopher_filter": (
        "WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        " FROM documents),"
        " c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok),"
        " r AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,"
        "  count(*) / CAST(sum(cnt) AS DOUBLE) AS dr,"
        "  max(cnt) / CAST(sum(cnt) AS DOUBLE) AS tts FROM c GROUP BY doc_id)"
        " SELECT doc_id FROM r WHERE n BETWEEN 10 AND 1000"
        "  AND dr >= 0.3 AND tts <= 0.3"
    ),
    "semi_join_latest_events": (
        "SELECT event_id FROM ("
        " SELECT event_id, row_number() OVER (PARTITION BY user_id, event_type"
        "  ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1"
    ),
    "top_bigrams": (
        "WITH t AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks,"
        "  len(regexp_split_to_array(trim(text), '\\s+')) AS L FROM documents),"
        " b AS (SELECT toks[i] || ' ' || toks[i+1] AS ngram"
        "  FROM t, UNNEST(generate_series(1, L-1)) AS u(i) WHERE L >= 2)"
        " SELECT ngram, count(*) AS n FROM b GROUP BY ngram"
        " ORDER BY n DESC, ngram LIMIT 20"
    ),
    "setop_intersect": (
        "SELECT doc_id FROM documents WHERE lang = 'en'"
        " INTERSECT SELECT vec_id AS doc_id FROM embeddings WHERE label = 0"
    ),
    "setop_except": (
        "SELECT doc_id FROM documents WHERE lang = 'en'"
        " EXCEPT SELECT vec_id AS doc_id FROM embeddings WHERE label = 0"
    ),
    "setop_union": (
        "SELECT doc_id FROM documents WHERE lang = 'en'"
        " UNION SELECT vec_id AS doc_id FROM embeddings WHERE label = 0"
    ),
    "source_stats": (
        "SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars"
        " FROM documents GROUP BY source"
    ),
    "supplier_nation": (
        "SELECT s_suppkey, n_name FROM supplier"
        " JOIN nation ON s_nationkey = n_nationkey"
    ),
    "region_nation_cross": (
        "SELECT r_name, n_name FROM region CROSS JOIN nation"
    ),
    "union_all_ids": (
        "SELECT doc_id FROM documents UNION ALL SELECT vec_id AS doc_id FROM embeddings"
    ),
    "like_filter": (
        "SELECT doc_id FROM documents WHERE text LIKE '%customer%'"
    ),
    "rollup_revenue": (
        "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS year,"
        " round(sum(o.o_totalprice), 2) AS revenue"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey"
        " GROUP BY ROLLUP(n.n_name, year(o.o_orderdate))"
    ),
    "cube_revenue": (
        "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS year,"
        " round(sum(o.o_totalprice), 2) AS revenue"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN nation n ON c.c_nationkey = n.n_nationkey"
        " GROUP BY CUBE(n.n_name, year(o.o_orderdate))"
    ),
    "distinct_users_per_type": (
        "SELECT event_type, count(DISTINCT user_id) AS n_users"
        " FROM events GROUP BY event_type"
    ),
    "topk_orders_per_priority": (
        "SELECT o_orderpriority, o_orderkey, o_totalprice FROM ("
        " SELECT o_orderpriority, o_orderkey, o_totalprice,"
        "  row_number() OVER (PARTITION BY o_orderpriority"
        "   ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)"
        " WHERE rn <= 3"
    ),
    "mode_user_per_type": (
        "SELECT event_type, top_user, n FROM ("
        " SELECT event_type, user_id AS top_user, count(*) AS n,"
        "  row_number() OVER (PARTITION BY event_type"
        "   ORDER BY count(*) DESC, user_id) AS rn"
        " FROM events GROUP BY event_type, user_id) WHERE rn = 1"
    ),
    "above_avg_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"
    ),
    "grouped_linreg": (
        "SELECT l_returnflag,"
        " round(regr_slope(l_extendedprice, l_quantity), 4) AS slope"
        " FROM lineitem GROUP BY l_returnflag"
    ),
    "time_weighted_avg": (
        "WITH w AS (SELECT user_id, value, ts,"
        "   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        "   AS nxt FROM events)"
        " SELECT user_id,"
        "  round(sum(value * date_diff('microseconds', ts, nxt))"
        "   / sum(date_diff('microseconds', ts, nxt)), 6) AS twa"
        " FROM w WHERE nxt IS NOT NULL GROUP BY user_id"
        " HAVING sum(date_diff('microseconds', ts, nxt)) > 0"
    ),
    "event_transitions": (
        "WITH w AS (SELECT user_id, event_type,"
        "   lag(event_type) OVER (PARTITION BY user_id"
        "    ORDER BY ts, event_id) AS prev FROM events)"
        " SELECT prev, event_type AS cur, count(*) AS n FROM w"
        " WHERE prev IS NOT NULL GROUP BY prev, event_type"
    ),
    "left_join_orders": (
        "SELECT o.o_orderkey, o.o_totalprice, l.l_quantity"
        " FROM (SELECT o_orderkey, o_totalprice FROM orders"
        "       WHERE o_totalprice > 300000) o"
        " LEFT JOIN (SELECT l_orderkey, l_quantity FROM lineitem"
        "       WHERE l_quantity >= 49) l"
        " ON o.o_orderkey = l.l_orderkey"
    ),
    "right_join_lineitem": (
        "SELECT l.l_orderkey AS o_orderkey, o.o_totalprice, l.l_quantity"
        " FROM (SELECT o_orderkey, o_totalprice FROM orders"
        "       WHERE o_totalprice > 300000) o"
        " RIGHT JOIN (SELECT l_orderkey, l_quantity FROM lineitem"
        "       WHERE l_quantity >= 49) l"
        " ON o.o_orderkey = l.l_orderkey"
    ),
    "linreg_lineitem": (
        "SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,"
        " round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept"
        " FROM lineitem"
    ),
    "embedding_centroids": (
        "WITH flat AS (SELECT label,"
        "   unnest(embedding) AS v,"
        "   unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings)"
        " SELECT CAST(label AS BIGINT) AS label, pos,"
        "  round(avg(CAST(v AS DOUBLE)), 6) AS c"
        " FROM flat GROUP BY label, pos"
    ),
    "degree_distribution": (
        "WITH e0 AS ("
        "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
        "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
        "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500 FROM orders),"
        " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
        "   FROM e0 WHERE u <> v),"
        " deg AS (SELECT node, count(*) AS deg FROM ("
        "   SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node)"
        " SELECT deg, count(*) AS n_nodes FROM deg GROUP BY deg"
    ),
    "centered_mean_events": (
        "SELECT event_id, round(avg(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING),"
        " 6) AS cmean FROM events"
    ),
    "share_of_type": (
        "SELECT event_id, round(value / sum(value) OVER"
        " (PARTITION BY event_type), 6) AS share FROM events"
    ),
    "shuffle_positions": (
        "SELECT doc_id, row_number() OVER (ORDER BY"
        " CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        "  ::UBIGINT AS BIGINT), doc_id) AS pos FROM documents"
    ),
    "bloom_semi_join": (
        "SELECT c_custkey FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
    ),
    "q5_revenue": (
        "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2)"
        "  AS revenue"
        " FROM customer, orders, lineitem, supplier, nation, region"
        " WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey"
        "  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey"
        "  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey"
        "  AND r_name = 'ASIA'"
        "  AND o_orderdate >= TIMESTAMP '1996-01-01'"
        "  AND o_orderdate < TIMESTAMP '1997-01-01'"
        " GROUP BY n_name"
    ),
    "er_parts": (
        "WITH l AS (SELECT p_partkey AS l_id,"
        "   substr(p_name, 1, 1) || substr(p_name, 3) AS l_name"
        "  FROM part WHERE p_partkey % 20 = 0),"
        " r AS (SELECT p_partkey AS r_id, p_name AS r_name FROM part)"
        " SELECT l_id, r_id, levenshtein(l_name, r_name) AS dist"
        " FROM l JOIN r ON substr(l_name, 1, 1) = substr(r_name, 1, 1)"
        "  AND length(l_name) // 4 = length(r_name) // 4"
        " WHERE levenshtein(l_name, r_name) <= 2"
    ),
    "global_ntile_orders": (
        "SELECT o_orderkey, ntile(8) OVER"
        " (ORDER BY o_totalprice, o_orderkey) AS tile FROM orders"
    ),
    "merge_orders": (
        "WITH ch AS ("
        "  SELECT o_orderkey AS k, CAST(NULL AS DOUBLE) AS price,"
        "   'delete' AS op FROM orders WHERE o_orderkey % 7 = 0"
        "  UNION ALL SELECT o_orderkey, o_totalprice + 1000, 'upsert'"
        "   FROM orders WHERE o_orderkey % 7 = 1"
        "  UNION ALL SELECT o_orderkey + 10000000, 42.42, 'upsert'"
        "   FROM orders WHERE o_orderkey % 7 = 2)"
        " SELECT coalesce(b.o_orderkey, ch.k) AS o_orderkey,"
        "  CASE WHEN ch.op = 'upsert' THEN ch.price"
        "   ELSE b.o_totalprice END AS o_totalprice"
        " FROM orders b FULL OUTER JOIN ch ON b.o_orderkey = ch.k"
        " WHERE coalesce(ch.op, '') <> 'delete'"
    ),
    "incremental_agg": (
        "WITH contrib AS ("
        "  SELECT user_id, value, 1 AS w FROM events"
        "   WHERE ts < TIMESTAMP '2024-01-15'"
        "  UNION ALL SELECT user_id, value, 1 FROM events"
        "   WHERE ts >= TIMESTAMP '2024-01-15'"
        "  UNION ALL SELECT user_id, value, -1 FROM events"
        "   WHERE ts < TIMESTAMP '2024-01-08' AND event_type = 'error')"
        " SELECT user_id, CAST(sum(w) AS BIGINT) AS n,"
        "  round(sum(w * value), 2) AS s"
        " FROM contrib GROUP BY user_id HAVING sum(w) > 0"
    ),
    "token_entropy": (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN []"
        "   ELSE regexp_split_to_array(trim(text), '\\s+') END AS t"
        "  FROM documents),"
        " flat AS (SELECT doc_id, unnest(t) AS tok FROM toks),"
        " cnt AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c"
        "   FROM flat GROUP BY doc_id, tok),"
        " agg AS (SELECT doc_id, sum(c * ln(c)) AS cl, sum(c) AS n"
        "   FROM cnt GROUP BY doc_id)"
        " SELECT d.doc_id, CASE WHEN a.n IS NULL THEN 0.0"
        "   ELSE round(ln(a.n) - a.cl / a.n, 6) END AS entropy"
        " FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
    ),
    "zscore_events": (
        "WITH st AS (SELECT avg(value) AS mu, stddev_pop(value) AS sd"
        "   FROM events)"
        " SELECT event_id, round((value - mu) / sd, 4) AS z"
        " FROM events, st"
    ),
    "iqr_outliers": (
        "WITH q AS (SELECT quantile_cont(value, 0.25) AS q1,"
        "   quantile_cont(value, 0.75) AS q3 FROM events)"
        " SELECT event_id, value FROM events, q"
        " WHERE value < q1 - 1.5 * (q3 - q1)"
        "    OR value > q3 + 1.5 * (q3 - q1)"
    ),
    "weighted_sample": (
        "SELECT o_orderkey, o_totalprice FROM ("
        " SELECT o_orderkey, o_totalprice,"
        "  -ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))"
        "       ::UBIGINT AS BIGINT) + 0.5) / 4294967296.0) / o_totalprice"
        "   AS aes_key"
        " FROM orders WHERE o_totalprice > 0)"
        " ORDER BY aes_key LIMIT 500"
    ),
    "funnel_events": (
        "WITH u AS (SELECT DISTINCT user_id FROM events"
        "   WHERE event_type IN ('click', 'view', 'purchase')),"
        " s1 AS (SELECT user_id, min(ts) AS t FROM events"
        "   WHERE event_type = 'click' GROUP BY user_id),"
        " s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e"
        "   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t"
        "   WHERE e.event_type = 'view' GROUP BY e.user_id),"
        " s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e"
        "   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t"
        "   WHERE e.event_type = 'purchase' GROUP BY e.user_id)"
        " SELECT u.user_id, CAST(CASE WHEN s3.t IS NOT NULL THEN 3"
        "  WHEN s2.t IS NOT NULL THEN 2 WHEN s1.t IS NOT NULL THEN 1"
        "  ELSE 0 END AS BIGINT) AS steps_done"
        " FROM u LEFT JOIN s1 ON u.user_id = s1.user_id"
        "  LEFT JOIN s2 ON u.user_id = s2.user_id"
        "  LEFT JOIN s3 ON u.user_id = s3.user_id"
    ),
    "setop_intersect_all": (
        "SELECT user_id AS id FROM events"
        " INTERSECT ALL SELECT o_custkey FROM orders"
    ),
    "setop_except_all": (
        "SELECT user_id AS id FROM events"
        " EXCEPT ALL SELECT o_custkey FROM orders"
    ),
    "moving_max_events": (
        "SELECT event_id, max(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " AS mov_max FROM events"
    ),
    "global_rn_orders": (
        "SELECT o_orderkey, row_number() OVER"
        " (ORDER BY o_totalprice, o_orderkey) AS rn FROM orders"
    ),
    "transitive_closure": (
        "WITH RECURSIVE e AS (SELECT o_orderkey AS child, o_orderkey // 10 AS"
        "   parent FROM orders WHERE o_orderkey >= 10),"
        " anc(node, anc) AS (SELECT child, parent FROM e"
        "   UNION SELECT a.node, e.parent FROM anc a JOIN e ON a.anc = e.child)"
        " SELECT node, anc FROM anc"
    ),
    "bfs_depth": (
        "WITH RECURSIVE e AS ("
        "  SELECT o_orderkey // 10 AS src, o_orderkey AS dst FROM orders"
        "   WHERE o_orderkey >= 10"
        "  UNION SELECT o_orderkey // 7, o_orderkey FROM orders"
        "   WHERE o_orderkey >= 7),"
        " d(node, dist) AS ("
        "  SELECT unnest([1,2,3,4,5,6,7,8,9]) AS node, 0 AS dist"
        "  UNION SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.node)"
        " SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS BIGINT)"
        "  AS dist FROM d GROUP BY node"
    ),
    "triangle_count": (
        "WITH e0 AS ("
        "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
        "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
        "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500 FROM orders),"
        " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
        "   FROM e0 WHERE u <> v)"
        " SELECT count(*) AS n_triangles FROM e e1"
        "  JOIN e e2 ON e2.a = e1.b"
        "  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b"
    ),
    "trailing_sum": (
        "SELECT event_id, round(sum(value) OVER (PARTITION BY user_id"
        " ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),"
        " 2) AS tsum FROM events"
    ),
    "profile_events": (
        "SELECT 'event_id' AS col, count(*) AS n_rows,"
        "  count(*) - count(event_id) AS n_null,"
        "  count(DISTINCT event_id) AS n_distinct,"
        "  CAST(min(event_id) AS DOUBLE) AS min_val,"
        "  CAST(max(event_id) AS DOUBLE) AS max_val FROM events"
        " UNION ALL SELECT 'ts', count(*), count(*) - count(ts),"
        "  count(DISTINCT ts), CAST(epoch_us(min(ts)) AS DOUBLE),"
        "  CAST(epoch_us(max(ts)) AS DOUBLE) FROM events"
        " UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),"
        "  count(DISTINCT user_id), CAST(min(user_id) AS DOUBLE),"
        "  CAST(max(user_id) AS DOUBLE) FROM events"
        " UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type),"
        "  count(DISTINCT event_type), CAST(NULL AS DOUBLE),"
        "  CAST(NULL AS DOUBLE) FROM events"
        " UNION ALL SELECT 'value', count(*), count(*) - count(value),"
        "  count(DISTINCT value), CAST(min(value) AS DOUBLE),"
        "  CAST(max(value) AS DOUBLE) FROM events"
        " UNION ALL SELECT 'props', count(*), count(*) - count(props),"
        "  count(DISTINCT props), CAST(NULL AS DOUBLE),"
        "  CAST(NULL AS DOUBLE) FROM events"
    ),
    "ohlc_events": (
        "WITH w AS (SELECT event_type, date_trunc('hour', ts) AS bucket_ts, value,"
        "   row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)"
        "     ORDER BY ts, event_id) AS rn_a,"
        "   row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)"
        "     ORDER BY ts DESC, event_id DESC) AS rn_d"
        "  FROM events)"
        " SELECT event_type, bucket_ts,"
        "  max(CASE WHEN rn_a = 1 THEN value END) AS open,"
        "  max(value) AS high, min(value) AS low,"
        "  max(CASE WHEN rn_d = 1 THEN value END) AS close,"
        "  count(*) AS n FROM w GROUP BY event_type, bucket_ts"
    ),
    "connected_components": (
        "WITH RECURSIVE e AS (SELECT DISTINCT user_id AS src, user_id + 7 AS dst"
        "   FROM events WHERE value > 250.0),"
        " ue AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),"
        " nodes AS (SELECT DISTINCT src AS n FROM ue),"
        " reach(a, b) AS (SELECT n, n FROM nodes"
        "   UNION SELECT r.a, ue.dst FROM reach r JOIN ue ON r.b = ue.src)"
        " SELECT a AS node, min(b) AS component FROM reach GROUP BY a"
    ),
    "bm25": (
        "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t,"
        "   CASE WHEN trim(text) = '' THEN 0 ELSE"
        "    len(regexp_split_to_array(trim(text), '\\s+')) END AS dl FROM documents),"
        " terms AS (SELECT unnest(['table', 'scan', 'vector']) AS term),"
        " tf AS (SELECT doc_id, dl, term,"
        "   len(list_filter(t, x -> x = term)) AS tf FROM toks CROSS JOIN terms),"
        " stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) AS sdl FROM toks),"
        " dfc AS (SELECT term, CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)"
        "   AS DOUBLE) AS df FROM tf GROUP BY term),"
        " scored AS (SELECT tf.doc_id,"
        "   sum( ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)"
        "     * tf.tf * (1.2 + 1.0)"
        "     / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / (s.sdl / s.n))) ) AS raw"
        "   FROM tf CROSS JOIN stats s JOIN dfc d ON tf.term = d.term"
        "   WHERE tf.tf > 0 GROUP BY tf.doc_id)"
        " SELECT doc_id, score FROM ("
        "  SELECT doc_id, round(raw, 6) AS score,"
        "   row_number() OVER (ORDER BY round(raw, 6) DESC, doc_id) AS rn"
        "  FROM scored) WHERE rn <= 20"
    ),
    "fuzzy_match": (
        "WITH qs AS (SELECT DISTINCT substr(p_name, 1, 1) || substr(p_name, 3) AS q"
        "   FROM part WHERE p_partkey % 50 = 0),"
        " cands AS (SELECT DISTINCT p_name FROM part),"
        " d AS (SELECT q, p_name, levenshtein(q, p_name) AS dist"
        "   FROM qs CROSS JOIN cands),"
        " best AS (SELECT q, p_name, dist, row_number() OVER"
        "   (PARTITION BY q ORDER BY dist, p_name) AS rn FROM d)"
        " SELECT q, p_name AS \"match\", CAST(dist AS BIGINT) AS dist"
        " FROM best WHERE rn = 1"
    ),
    "decontaminate": (
        "WITH toks AS (SELECT doc_id,"
        "   regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),"
        " grams AS (SELECT doc_id, array_to_string(t[i.i:i.i+2], ' ') AS g"
        "   FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) AS i),"
        " bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),"
        " hits AS (SELECT gr.doc_id, count(*) AS n FROM grams gr"
        "   JOIN bench b ON gr.g = b.g WHERE gr.doc_id % 97 <> 0 GROUP BY gr.doc_id)"
        " SELECT d.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,"
        "  coalesce(h.n, 0) > 0 AS contaminated"
        " FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"
        " WHERE d.doc_id % 97 <> 0"
    ),
    "cooccurrence_edges": (
        "WITH toks AS (SELECT DISTINCT doc_id, tok FROM"
        "   (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
        "    FROM documents) WHERE tok <> ''),"
        " pairs AS (SELECT a.doc_id, a.tok AS t1, b.tok AS t2 FROM toks a"
        "   JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok)"
        " SELECT t1, t2, count(*) AS n_docs FROM pairs GROUP BY t1, t2"
        " HAVING count(*) >= 5"
    ),
    "dup_ngram_share": (
        "WITH toks AS (SELECT doc_id,"
        "   regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),"
        " grams AS (SELECT doc_id, array_to_string(t[i.i:i.i+4], ' ') AS g"
        "   FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) AS i),"
        " gcounts AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g),"
        " per_doc AS (SELECT gr.doc_id, count(*) AS n_grams,"
        "   CAST(sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams"
        "   FROM grams gr JOIN gcounts c ON gr.g = c.g GROUP BY gr.doc_id)"
        " SELECT doc_id, n_grams, dup_grams,"
        "  CAST(dup_grams AS DOUBLE)/n_grams AS dup_share FROM per_doc"
    ),
    "percent_rank_events": (
        "SELECT event_id, percent_rank() OVER (PARTITION BY user_id"
        " ORDER BY value) AS prank FROM events"
    ),
    "cume_dist_events": (
        "SELECT event_id, cume_dist() OVER (PARTITION BY user_id"
        " ORDER BY value) AS cdist FROM events"
    ),
    "first_value_events": (
        "SELECT event_id, first_value(value) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS first_value FROM events"
    ),
    "redact_props": (
        "SELECT event_id, regexp_replace(props, '\\d\\d+', '<NUM>', 'g')"
        " AS props_redacted FROM events"
    ),
    "explode_embeddings": (
        "SELECT vec_id, CAST(unnest(range(len(embedding))) AS BIGINT) AS pos,"
        " CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings WHERE vec_id < 50"
    ),
    # TF-IDF oracle: same tokenization (lowered whitespace split), same
    # idf = ln(N / (1 + df)), same (score desc, term asc) top-3 rank.
    "tfidf_terms": (
        "WITH tok AS (SELECT doc_id,"
        "  unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term"
        "  FROM documents WHERE trim(text) <> ''),"
        " tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),"
        " d AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),"
        " nn AS (SELECT count(*) AS n FROM documents),"
        " s AS (SELECT t.doc_id, t.term, t.tf * ln(nn.n / (1.0 + d.df)) AS score"
        "       FROM tf t JOIN d ON t.term = d.term CROSS JOIN nn),"
        " r AS (SELECT doc_id, term, score, row_number() OVER ("
        "       PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM s)"
        " SELECT doc_id, term, round(score, 6) AS score, CAST(rn AS INT) AS rank"
        " FROM r WHERE rn <= 3"
    ),
    "quality_signals": (
        "SELECT doc_id,"
        " CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens_q,"
        " CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,"
        " CAST(len(regexp_extract_all(text, '\\d')) AS BIGINT) AS n_digit,"
        " CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
        "  x -> lower(x) IN ('the','a','an','and','or','of','to','in','is','are','was',"
        "   'for','on','with','as','at','by','it','this','that','be','from'))) AS BIGINT)"
        "  AS n_stop"
        " FROM documents"
    ),
    # LangIdStage oracle: same tokenization (unicode letter runs of the
    # lowered text), same per-language stopword hit counts, same
    # first-max tie-break in sorted language order (de, en, es, fr).
    "langid": _langid_pred_sql()
    + " SELECT doc_id, lang_pred FROM langpred",
    "string_agg_events": (
        "SELECT user_id, string_agg(CAST(event_id AS VARCHAR), ','"
        " ORDER BY ts, event_id) AS seq FROM events GROUP BY user_id"
    ),
    "histogram_values": (
        "SELECT CAST(floor(value / 10) AS BIGINT) AS bin, count(*) AS n"
        " FROM events GROUP BY 1"
    ),
    "dense_rank_events": (
        "SELECT event_id, CAST(dense_rank() OVER (PARTITION BY user_id"
        " ORDER BY value DESC) AS BIGINT) AS drank FROM events"
    ),
    "ntile_events": (
        "SELECT event_id, CAST(ntile(4) OVER (PARTITION BY user_id"
        " ORDER BY ts, event_id) AS BIGINT) AS tile FROM events"
    ),
    "unpivot_events": (
        "WITH u AS (SELECT DISTINCT user_id FROM events),"
        " c AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),"
        " s AS (SELECT user_id, event_type, sum(value) AS sv FROM events"
        "       GROUP BY user_id, event_type)"
        " SELECT u.user_id, c.event_type, round(coalesce(s.sv, 0), 2) AS value"
        " FROM u CROSS JOIN c LEFT JOIN s ON s.user_id = u.user_id"
        "  AND s.event_type = c.event_type"
    ),
    "knn_cosine": (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),"
        " s AS (SELECT q.query_id, e.vec_id,"
        "        list_cosine_similarity(q.qe, e.embedding) AS sim"
        "       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)"
        " SELECT query_id, vec_id, rn AS rank FROM ("
        "   SELECT query_id, vec_id,"
        "          row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn"
        "   FROM s) WHERE rn <= 10"
    ),
}

# the indexed path is bit-identical to the full-scan operator, so both
# are checked against the same SQL
ORACLES["bm25_indexed"] = ORACLES["bm25"]

ORACLES["graph_degrees"] = (
    "SELECT CAST(o_orderkey // 10 AS BIGINT) AS subj,"
    " CAST(count(*) AS BIGINT) AS out_degree"
    " FROM orders WHERE o_orderkey >= 10 GROUP BY 1"
)

# HLL accuracy pin: the sketch value is not SQL, its 5%-of-exact
# contract is (see q_approx_distinct_users)
ORACLES["approx_distinct_users"] = (
    "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,"
    " TRUE AS hll_within_5pct FROM events"
)


def _pagerank_oracle_sql(iters: int = 3, d: float = 0.85) -> str:
    """Unrolled power iteration matching stages/graph.py::pagerank
    semantics exactly: r ← (1−d)/N + d·(1−emitted)/N + d·msum, where
    msum(dst)=Σ rank(src)/outdeg(src) and emitted=Σ msum (dangling-mass
    recovery). One CTE chain per iteration — no recursive-CTE aggregate
    restrictions to fight, and DuckDB's planner handles 3 unrolls fine."""
    s = (
        "WITH e AS (SELECT o_orderkey // 10 AS src, o_orderkey AS dst"
        "   FROM orders WHERE o_orderkey >= 10),"
        " deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS (SELECT count(*) AS n FROM nodes),"
        " r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node, sum(r.rank / deg.deg) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", em{i} AS (SELECT coalesce(sum(msum), 0) AS emitted FROM m{i})"
            f", r{i + 1} AS (SELECT n.node,"
            f"   (1 - {d}) / nn.n + {d} * (1 - em.emitted) / nn.n"
            f"   + coalesce({d} * m.msum, 0) AS rank"
            f"   FROM nodes n CROSS JOIN nn CROSS JOIN em{i} em"
            f"   LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT CAST(node AS BIGINT) AS node, round(rank, 8) AS rank"
                f" FROM r{iters}")


ORACLES["graph_pagerank"] = _pagerank_oracle_sql(iters=3, d=0.85)

ORACLES["domain_caps"] = (
    "SELECT doc_id, source FROM ("
    "  SELECT doc_id, source,"
    "   row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn"
    "  FROM documents) WHERE rn <= 10"
)

ORACLES["rollup_orders"] = (
    "SELECT o_orderstatus, o_orderpriority,"
    " CAST(count(*) AS BIGINT) AS n_rows,"
    " round(sum(o_totalprice), 2) AS sum_value"
    " FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
)

# must stay in lockstep with functions/hashing.py::md5_u32 and
# sketches.MERSENNE61
ORACLES["fingerprint_events"] = (
    "SELECT CAST(sum(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))"
    "  ::UBIGINT) % 2305843009213693951 AS BIGINT) AS fp,"
    " CAST(count(*) AS BIGINT) AS n FROM events"
)

ORACLES["table_diff_orders"] = (
    "WITH new AS ("
    "  SELECT o_orderkey, CASE WHEN o_orderkey % 89 = 0"
    "    THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice"
    "  FROM orders WHERE o_orderkey % 97 <> 0"
    "  UNION ALL SELECT o_orderkey + 30000000, o_totalprice FROM orders"
    "   WHERE o_orderkey % 101 = 0),"
    " j AS (SELECT b.o_orderkey AS bk, n.o_orderkey AS nk,"
    "    b.o_totalprice AS bv, n.o_totalprice AS nv"
    "   FROM orders b FULL OUTER JOIN new n ON b.o_orderkey = n.o_orderkey)"
    " SELECT CAST(coalesce(bk, nk) AS BIGINT) AS o_orderkey,"
    "  CASE WHEN bk IS NULL THEN 'added' WHEN nk IS NULL THEN 'removed'"
    "   ELSE 'changed' END AS change"
    " FROM j WHERE bk IS NULL OR nk IS NULL OR bv <> nv"
)

ORACLES["pmi_pairs"] = (
    # tok models the engine's max_tokens_per_doc=2048 contract exactly:
    # each doc's first 2048 DISTINCT tokens in appearance order (no doc
    # in the testdata exceeds 31, but the contract is now oracle-encoded)
    "WITH raw AS ("
    "  SELECT doc_id,"
    "   unnest(regexp_split_to_array(trim(text), '\\s+')) AS t,"
    "   generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos"
    "  FROM documents WHERE trim(text) <> ''),"
    " firstpos AS (SELECT doc_id, t, min(pos) AS fp FROM raw"
    "   WHERE t <> '' GROUP BY 1, 2),"
    " tok AS (SELECT doc_id, t FROM ("
    "   SELECT doc_id, t, row_number() OVER"
    "     (PARTITION BY doc_id ORDER BY fp) AS rk FROM firstpos)"
    "   WHERE rk <= 2048),"
    " pairs AS (SELECT a.t AS t1, b.t AS t2, count(*) AS n_ab"
    "   FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t"
    "   GROUP BY 1, 2),"
    " tc AS (SELECT t, count(*) AS n_t FROM tok GROUP BY t),"
    " nn AS (SELECT count(*) AS n FROM documents),"
    " s AS (SELECT t1, t2, n_ab,"
    "    round(ln(CAST(n_ab AS DOUBLE) * nn.n / (ta.n_t * tb.n_t)), 6) AS pmi"
    "   FROM pairs JOIN tc ta ON ta.t = pairs.t1"
    "   JOIN tc tb ON tb.t = pairs.t2 CROSS JOIN nn WHERE n_ab >= 5)"
    " SELECT t1, t2, CAST(n_ab AS BIGINT) AS n_ab, pmi FROM s"
    " ORDER BY pmi DESC, t1, t2 LIMIT 100"
)

ORACLES["two_hop_counts"] = (
    "WITH e0 AS ("
    "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500 FROM orders),"
    " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
    "   FROM e0 WHERE u <> v),"
    " ed AS (SELECT a AS node, b AS nb FROM e"
    "   UNION ALL SELECT b, a FROM e),"
    " two AS (SELECT node, nb FROM ed"
    "   UNION SELECT x.node, y.nb FROM ed x JOIN ed y ON x.nb = y.node"
    "    WHERE y.nb <> x.node)"
    " SELECT CAST(node AS BIGINT) AS node,"
    "  CAST(count(*) AS BIGINT) AS n_within2 FROM two GROUP BY node"
)

# connected components = min label reachable over the undirected edge
# closure (same derived graph recipe as triangle_count / degree_distribution)
ORACLES["graph_components"] = (
    "WITH RECURSIVE e0 AS ("
    "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500 FROM orders),"
    " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
    "   FROM e0 WHERE u <> v),"
    " ed AS (SELECT a AS src, b AS dst FROM e"
    "   UNION ALL SELECT b, a FROM e),"
    " reach(node, lab) AS ("
    "  SELECT src, src FROM ed"
    "  UNION SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node)"
    " SELECT CAST(node AS BIGINT) AS doc_id,"
    "  CAST(min(lab) AS BIGINT) AS cluster_rep FROM reach GROUP BY node"
)


# ---------------------------------------------------------------------------
# Round-3 wave 2: corpus curation census + rebalancing + exact unigram LM


def q_rebalance_sources(sf_dir: str):
    """Head-domain downsampling: each source capped at an EXPECTED 15
    docs via the cross-system md5 uniform (under-cap sources pass
    untouched) — the 'don't let one crawl host dominate the training
    mix' curation primitive."""
    from ..stages.canonicalize import rebalance_sample

    return rebalance_sample(_docs(sf_dir, ["doc_id", "source"]),
                            "source", "doc_id", cap=15, nb=8)


def q_source_profile(sf_dir: str):
    """Per-domain corpus census: volume, mean length, language
    diversity, english share — the curation dashboard aggregate."""
    from ..stages.textstats import source_profile

    return source_profile(
        _docs(sf_dir, ["doc_id", "source", "lang", "n_chars"]), nb=8)


def q_unigram_nll(sf_dir: str):
    """Exact-vocabulary unigram LM perplexity-proxy score per document
    (the oracle-checkable twin of the feature-hashed
    unigram_logprob_score)."""
    from ..stages.textstats import unigram_nll_exact

    return unigram_nll_exact(_docs(sf_dir, ["doc_id", "text"]), nb=8)


QUERIES["rebalance_sources"] = q_rebalance_sources
QUERIES["source_profile"] = q_source_profile
QUERIES["unigram_nll"] = q_unigram_nll

ORACLES["rebalance_sources"] = (
    # LEFT JOIN + the c.n IS NULL arm: null-source rows pass uncapped,
    # matching rebalance_sample's explicit null-key pass-through
    "WITH c AS (SELECT source, count(*) AS n FROM documents"
    "  WHERE source IS NOT NULL GROUP BY source)"
    " SELECT d.doc_id, d.source FROM documents d LEFT JOIN c USING (source)"
    " WHERE c.n IS NULL OR"
    "  CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)"
    "  < CASE WHEN c.n <= 15 THEN 4294967296"
    "    ELSE CAST(floor(4294967296.0 * 15 / c.n) AS BIGINT) END"
)

ORACLES["source_profile"] = (
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
    " round(avg(n_chars), 2) AS avg_chars,"
    " CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,"
    " round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)"
    "       / CAST(count(*) AS DOUBLE), 4) AS en_share"
    " FROM documents GROUP BY source"
)

ORACLES["unigram_nll"] = (
    "WITH tok AS ("
    "  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t"
    "  FROM documents WHERE trim(text) <> ''),"
    " tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),"
    " cnt AS (SELECT t, count(*) AS n FROM tok2 GROUP BY t),"
    " v AS (SELECT t, n FROM (SELECT t, n, row_number() OVER"
    "   (ORDER BY n DESC, t) AS rk FROM cnt) WHERE rk <= 65536),"
    " tot AS (SELECT count(*) AS nn FROM tok2)"
    " SELECT t2.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,"
    "  round(avg(-ln(coalesce(v.n, 0.5) / tot.nn)), 6) AS nll"
    " FROM tok2 t2 LEFT JOIN v USING (t) CROSS JOIN tot"
    " GROUP BY t2.doc_id"
)


# ---------------------------------------------------------------------------
# Round-3 wave 3: grouped distinct/mode/corr, histogram, stratified sample


def q_nunique_types_per_user(sf_dir: str):
    """Exact COUNT(DISTINCT event_type) per user — pair-bucketed
    two-level reduce (hot users' values spread across buckets)."""
    from ..stages.canonicalize import groupby_nunique

    return groupby_nunique(_events(sf_dir, ["user_id", "event_type"]),
                           "user_id", "event_type", nb=8)


def q_mode_event_type(sf_dir: str):
    """Most frequent event_type per user, smallest-value tie-break —
    pre-combined counts + the topk(k=1) combiner reduce."""
    from ..stages.canonicalize import mode_per_key

    return mode_per_key(_events(sf_dir, ["user_id", "event_type"]),
                        "user_id", "event_type", nb=8)


def q_value_histogram(sf_dir: str):
    """Fixed-width 20-bin histogram of event values over [0, 500):
    per-batch bincount partials, one tiny reduce — the row stream never
    shuffles."""
    from ..stages.sketches import histogram

    return histogram(_events(sf_dir, ["value"]), "value",
                     lo=0.0, hi=500.0, nbins=20)


def q_corr_lineitem(sf_dir: str):
    """Pearson corr(quantity, price) per returnflag from six sufficient
    statistics — one groupby-sum of doubles, no second pass."""
    from ..stages.sketches import grouped_corr

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    return grouped_corr(li, "l_returnflag", "l_quantity",
                        "l_extendedprice", round_to=4)


def q_stratified_docs(sf_dir: str):
    """Seeded random 5 docs per source: the cross-engine md5 uniform
    ORDERS each stratum, the cap_per_key quota keeps the first 5 —
    deterministic stratified sampling without a global shuffle."""
    from ..functions.hashing import md5_u32
    from ..stages.windows import cap_per_key

    docs = _docs(sf_dir, ["doc_id", "source"])

    def add_h(batch: pa.Table) -> pa.Table:
        h = md5_u32(batch.column("doc_id").to_pylist())
        return batch.append_column("h", pa.array(h, pa.int64()))

    out = cap_per_key(docs.map_batches(add_h, batch_format="pyarrow"),
                      key_col="source", order_cols=["h", "doc_id"], n=5,
                      nb=8)
    return out.select_columns(["doc_id", "source"])


QUERIES["nunique_types_per_user"] = q_nunique_types_per_user
QUERIES["mode_event_type"] = q_mode_event_type
QUERIES["value_histogram"] = q_value_histogram
QUERIES["corr_lineitem"] = q_corr_lineitem
QUERIES["stratified_docs"] = q_stratified_docs

ORACLES["nunique_types_per_user"] = (
    "SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT)"
    " AS n_distinct FROM events GROUP BY user_id"
)

ORACLES["mode_event_type"] = (
    "SELECT user_id, event_type AS mode, n AS n_mode FROM ("
    " SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,"
    "  row_number() OVER (PARTITION BY user_id"
    "   ORDER BY count(*) DESC, event_type) AS rk"
    " FROM events GROUP BY user_id, event_type) WHERE rk = 1"
)

ORACLES["value_histogram"] = (
    # least(…, 19) mirrors the engine's hi-edge clamp: a value one ulp
    # below hi can floor() to nbins and would otherwise drop out of the
    # LEFT JOIN while the engine counts it in the last bin (r03 ADVICE)
    "WITH b AS (SELECT least(CAST(floor(value / 25.0) AS BIGINT), 19) AS bin"
    "  FROM events WHERE value >= 0 AND value < 500),"
    " c AS (SELECT bin, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bin)"
    " SELECT g.bin, CAST(coalesce(c.n, 0) AS BIGINT) AS n"
    " FROM (SELECT unnest(range(0, 20)) AS bin) g LEFT JOIN c USING (bin)"
)

ORACLES["corr_lineitem"] = (
    "SELECT l_returnflag,"
    " round(corr(l_quantity, l_extendedprice), 4) AS corr_xy"
    " FROM lineitem GROUP BY l_returnflag"
)

ORACLES["stratified_docs"] = (
    "SELECT doc_id, source FROM ("
    " SELECT doc_id, source, row_number() OVER (PARTITION BY source"
    "  ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    "   ::UBIGINT AS BIGINT), doc_id) AS rk"
    " FROM documents) WHERE rk <= 5"
)


def q_pack_sequences(sf_dir: str):
    """GPT-style training-sequence packing: concat docs in id order
    into one token stream, cut at 512 — start_offset/pack_id per doc
    via ONE histogram pass (global weighted cumsum, no sort)."""
    from ..stages.textstats import pack_sequences

    return pack_sequences(_docs(sf_dir, ["doc_id", "text"]), seq_len=512,
                          n_parts=8)


QUERIES["pack_sequences"] = q_pack_sequences

ORACLES["pack_sequences"] = (
    # coalesce BEFORE split: a NULL-text doc still occupies a (0-token)
    # position in the packing order, exactly as the engine's fill_null
    "WITH cnt AS (SELECT doc_id,"
    "   count(*) FILTER (WHERE t <> '') AS n"
    "  FROM (SELECT doc_id,"
    "    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS t"
    "   FROM documents) GROUP BY doc_id),"
    " c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id"
    "   ROWS UNBOUNDED PRECEDING) - n AS so FROM cnt)"
    " SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,"
    "  CAST(so AS BIGINT) AS start_offset,"
    "  CAST(so // 512 AS BIGINT) AS pack_id FROM c"
)


def q_trim_outliers(sf_dir: str):
    """Length-outlier trim: keep docs inside the [p05, p95] n_chars
    band — quantile bounds from the histogram-bracket exact_quantile,
    then one stateless filter."""
    from ..stages.sketches import trim_outliers

    return trim_outliers(_docs(sf_dir, ["doc_id", "n_chars"]),
                         "n_chars", 0.05, 0.95)


QUERIES["trim_outliers"] = q_trim_outliers

ORACLES["trim_outliers"] = (
    "WITH b AS (SELECT quantile_disc(n_chars, 0.05) AS lo,"
    "  quantile_disc(n_chars, 0.95) AS hi FROM documents)"
    " SELECT doc_id, n_chars FROM documents, b"
    " WHERE n_chars >= lo AND n_chars <= hi"
)


def q_dedup_index_incremental(sf_dir: str):
    """Incremental dedup against a PERSISTED LSH index (rows-only: the
    minhash/LSH hash domain is not SQL-reproducible): index the first
    80% of documents, query the rest + planted exact dups of indexed
    docs. Returns the verified (new_id, old_id, similarity) pairs —
    the planted dups guarantee non-empty, deterministic output."""
    import tempfile

    from ..stages.dedupindex import build_dedup_index, query_dedup_index

    docs = _docs(sf_dir, ["doc_id", "text"]).materialize()
    n = docs.count()
    cut = int(n * 0.8)
    hist = docs.filter(expr=f"doc_id < {cut}")
    rest = docs.filter(expr=f"doc_id >= {cut}")
    # planted ids start past max(doc_id), never colliding with real ids
    # at any scale factor (a fixed 1e6 offset would collide at n > 1e6)
    offset = int(docs.max("doc_id")) + 1
    planted = hist.limit(20).map_batches(
        lambda t, off=offset: pa.table(
            {"doc_id": pc.add(t.column("doc_id"), off),
             "text": t.column("text")}),
        batch_format="pyarrow")
    with tempfile.TemporaryDirectory(prefix="ddix-") as ix:
        build_dedup_index(hist, ix)
        out = query_dedup_index(rest.union(planted), ix,
                                threshold=0.7).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


QUERIES["dedup_index_incremental"] = q_dedup_index_incremental


def q_moments_by_type(sf_dir: str):
    """Sample skewness/kurtosis of event values per type — the G1/G2
    estimators from five power sums, one groupby-sum shuffle."""
    from ..stages.sketches import grouped_moments

    return grouped_moments(_events(sf_dir, ["event_type", "value"]),
                           "event_type", "value", round_to=6)


QUERIES["moments_by_type"] = q_moments_by_type

ORACLES["moments_by_type"] = (
    "SELECT event_type, round(skewness(value), 6) AS skewness,"
    " round(kurtosis(value), 6) AS kurtosis"
    " FROM events GROUP BY event_type"
)


def q_table_profile_events(sf_dir: str):
    """Per-column census of the events table: row count, nulls, exact
    distinct — the pre-training data-quality profile."""
    from ..stages.sketches import table_profile

    return table_profile(
        _events(sf_dir, ["event_id", "user_id", "event_type", "value"]),
        ["event_id", "user_id", "event_type", "value"], nb=8)


QUERIES["table_profile_events"] = q_table_profile_events

ORACLES["table_profile_events"] = (
    " SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n,"
    "  CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,"
    "  CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events"
    " UNION ALL SELECT 'user_id', CAST(count(*) AS BIGINT),"
    "  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),"
    "  CAST(count(DISTINCT user_id) AS BIGINT) FROM events"
    " UNION ALL SELECT 'event_type', CAST(count(*) AS BIGINT),"
    "  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),"
    "  CAST(count(DISTINCT event_type) AS BIGINT) FROM events"
    " UNION ALL SELECT 'value', CAST(count(*) AS BIGINT),"
    "  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),"
    "  CAST(count(DISTINCT value) AS BIGINT) FROM events"
)


def q_knn_pq(sf_dir: str):
    """Product-quantized ANN (rows-only: ADC scores are approximate by
    construction): 64-d embeddings compress to 8-byte codes, four
    seeded queries scored via per-query LUT + code lookups.
    Deterministic: seeded codebooks, stable tie-breaks."""
    from ..stages.similarity import knn_pq, pq_encode, train_pq

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    books = train_pq(vecs, m=8, sample_rows=4096, iters=6)
    codes = pq_encode(vecs, books).materialize()
    q = np.stack(vecs.limit(4).to_pandas()["embedding"].to_numpy())
    out = knn_pq(codes, books, q, k=10).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["query_id", "rank"]).reset_index(drop=True),
        preserve_index=False)


QUERIES["knn_pq"] = q_knn_pq


def q_knn_ivfpq(sf_dir: str):
    """Persisted IVF-PQ ANN (rows-only — approximate by construction):
    coarse cells store 8-byte PQ codes; four seeded queries probe 4
    cells and ADC-score only those cells' codes. Deterministic."""
    import tempfile

    from ..stages.similarity import build_ivfpq_index, knn_ivfpq_indexed

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    qtbl = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]
                           ).limit(4).to_arrow_refs()
    qtbl = pa.concat_tables(ray.get(qtbl))
    with tempfile.TemporaryDirectory(prefix="ivfpq-") as ix:
        build_ivfpq_index(vecs, ix, n_centroids=16, m=8)
        out = knn_ivfpq_indexed(ix, qtbl, k=10, nprobe=4).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["query_id", "rank"]).reset_index(drop=True),
        preserve_index=False)


QUERIES["knn_ivfpq"] = q_knn_ivfpq


def q_winsorize_values(sf_dir: str):
    """Quantile clamp of event values to the [p05, p95] band — the
    value-preserving outlier treatment (row count unchanged)."""
    from ..stages.sketches import winsorize

    return winsorize(_events(sf_dir, ["event_id", "value"]), "value",
                     0.05, 0.95, out="value_w")


QUERIES["winsorize_values"] = q_winsorize_values

ORACLES["winsorize_values"] = (
    "WITH b AS (SELECT quantile_disc(value, 0.05) AS lo,"
    "  quantile_disc(value, 0.95) AS hi FROM events)"
    " SELECT event_id, value, least(greatest(value, lo), hi) AS value_w"
    " FROM events, b"
)


# --- round-4 additions ------------------------------------------------
def q_pct_change_events(sf_dir: str):
    """Relative change vs the previous event per user — value /
    lag(value) - 1 with SQL null semantics (no previous row, null
    sides, or zero previous value → NULL)."""
    from ..stages.windows import pct_change_per_key

    out = pct_change_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], nb=8)
    df = out.to_pandas()[["event_id", "pct_change"]]
    # DuckDB round() is half-away-from-zero; pandas round is half-even
    v = df["pct_change"].to_numpy()
    df["pct_change"] = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


QUERIES["pct_change_events"] = q_pct_change_events

ORACLES["pct_change_events"] = (
    "SELECT event_id, round(value / nullif(lag(value) OVER ("
    " PARTITION BY user_id ORDER BY ts, event_id), 0) - 1, 6)"
    " AS pct_change FROM events"
)


def q_ewma_events(sf_dir: str):
    """Exponentially weighted moving average of event values per user
    (alpha=0.3, adjust=False) — rows-only: no SQL window equivalent;
    semantics pinned by the pandas-ewm parity fuzz."""
    from ..stages.windows import ewma_per_key

    out = ewma_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]), 0.3,
        key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], nb=8)
    df = out.to_pandas()[["event_id", "ewma"]]
    df["ewma"] = df["ewma"].round(6)
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)


QUERIES["ewma_events"] = q_ewma_events


def q_mp4_meta(sf_dir: str):
    """REAL ISO-BMFF box parsing over a deterministic mp4 media table
    (rows-only — binary container metadata has no SQL twin): width,
    height, duration, codec, sample count, keyframe map from stss;
    dirty payloads yield an mp4_error column, not a failed batch."""
    from ..functions.codecs import write_minimal_mp4
    from ..stages.multimodal import Mp4MetaStage

    rows = []
    for i in range(96):
        if i % 16 == 15:
            rows.append({"media_id": i, "payload": b"corrupt" + bytes(i)})
        else:
            w, h = 160 + 16 * (i % 8), 90 + 9 * (i % 8)
            nf = 8 + (i % 5) * 4
            rows.append({"media_id": i,
                         "payload": write_minimal_mp4(
                             w, h, nf, fps=float(8 + i % 3),
                             keyframes=list(range(0, nf, 4)))})
    media = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (media.map_batches(Mp4MetaStage, batch_format="pyarrow",
                             batch_size=32, concurrency=(1, 4))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    out["duration_s"] = out["duration_s"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


QUERIES["mp4_meta"] = q_mp4_meta


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(status, priority) over orders — every subset level
    from one finest aggregate (no extra pass over the facts)."""
    from ..stages.canonicalize import cube_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_orderpriority",
                                      "o_totalprice"])
    return cube_agg(orders, ["o_orderstatus", "o_orderpriority"],
                    "o_totalprice")


QUERIES["cube_orders"] = q_cube_orders

ORACLES["cube_orders"] = (
    "SELECT o_orderstatus, o_orderpriority,"
    " CAST(count(*) AS BIGINT) AS n_rows,"
    " round(sum(o_totalprice), 2) AS sum_value"
    " FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"
)


def q_url_features(sf_dir: str):
    """Vectorized URL curation features (host / registrable domain /
    path depth / tracking-param-stripped canonical url) over a
    deterministic synthetic crawl-URL table. Fully oracled: the SQL
    twin regenerates the same URLs with generate_series and mirrors
    every kernel (host regex, suffix-set domain heuristic, segment
    count, anchored tracking-param strip) in DuckDB regexp functions;
    semantics additionally pinned vs urllib.parse in tests."""
    from ..functions.urls import url_features

    hosts = ["www.example.com", "sub.domain.co.uk", "cdn.example.com",
             "a.b.site.org", "shop.example.com.au"]
    rows = []
    for i in range(400):
        h = hosts[i % len(hosts)]
        track = "?utm_source=s&utm_medium=m" if i % 3 == 0 else ""
        rows.append({"page_id": i,
                     "url": f"https://{h}/p/{i % 7}/{i}{track}"})
    pages = rd.from_arrow(pa.Table.from_pylist(rows))
    out = pages.map_batches(url_features, batch_format="pyarrow",
                            batch_size=4096)
    df = out.to_pandas().sort_values("page_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["url_features"] = q_url_features

# Full SQL twin: rebuild the synthetic URL table with generate_series
# and mirror each urls.py kernel in DuckDB regexp functions. The
# suffix list must stay in sync with urls._TWO_LABEL_SUFFIXES.
ORACLES["url_features"] = (
    "WITH hosts AS (SELECT ['www.example.com','sub.domain.co.uk',"
    "'cdn.example.com','a.b.site.org','shop.example.com.au'] AS h),"
    " pages AS (SELECT i AS page_id,"
    "  'https://' || h[(i % 5) + 1] || '/p/' || (i % 7) || '/' || i ||"
    "  CASE WHEN i % 3 = 0 THEN '?utm_source=s&utm_medium=m' ELSE '' END AS url"
    "  FROM generate_series(0, 399) t(i) CROSS JOIN hosts),"
    " f AS (SELECT page_id, url,"
    "  lower(regexp_extract(url,"
    "   '^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,"
    "  regexp_replace(regexp_replace(url,"
    "   '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*', ''), '[?#].*$', '') AS path,"
    "  regexp_replace(regexp_replace(regexp_replace(regexp_replace(url,"
    "   '([?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid)=[^&#]*', '\\1', 'g'),"
    "   '&&+', '&', 'g'), '\\?&+', '?', 'g'), '[?&]+(#|$)', '\\1', 'g')"
    "   AS canonical_url FROM pages),"
    " d AS (SELECT *, string_split(host, '.') AS parts,"
    "  len(string_split(host, '.')) AS np FROM f)"
    " SELECT page_id, url, host,"
    " CASE WHEN regexp_matches(host, '^(?:\\d{1,3}\\.){3}\\d{1,3}$|:') THEN host"
    "  WHEN np >= 3 AND list_contains(['co.uk','org.uk','ac.uk','gov.uk',"
    "   'com.au','net.au','org.au','co.jp','ne.jp','or.jp','com.br','com.cn',"
    "   'com.mx','co.in','co.nz','com.sg','com.tr','co.za','com.ar','co.kr'],"
    "   parts[np-1] || '.' || parts[np])"
    "   THEN parts[np-2] || '.' || parts[np-1] || '.' || parts[np]"
    "  WHEN np >= 2 THEN parts[np-1] || '.' || parts[np]"
    "  ELSE host END AS domain,"
    " CAST(len(regexp_extract_all(path, '/[^/]')) AS INTEGER) AS path_depth,"
    " canonical_url FROM d"
)


def q_dedup_spans(sf_dir: str):
    """Corpus-wide duplicate-span removal (Lee-et-al-style exact
    window dedup) over the documents table — rows-only: the sliding
    k-gram window mask has no tractable SQL twin; semantics are pinned
    by a brute-force reference oracle in tests/test_dedup_spans.py.
    Returns per-doc (n_tokens, n_removed) plus a stable hash of the
    cleaned text so content changes are visible without shipping it."""
    from ..functions.hashing import hash_columns
    from ..stages.dedup import remove_dup_spans

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = remove_dup_spans(docs, k=8)

    def digest(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch.select(["text"]), ["text"])
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("n_tokens"),
            "n_removed": batch.column("n_removed"),
            "text_hash": pa.array(h.astype(np.int64)),
        })

    df = (out.map_batches(digest, batch_format="pyarrow").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["dedup_spans"] = q_dedup_spans


def q_link_host_graph(sf_dir: str):
    """Host-level link graph from raw HTML: extract_links (row-
    expanding href regex) → url_host on both ends → per-(src_host,
    dst_host) edge weights. Fully oracled: the SQL twin rebuilds the
    same synthetic HTML with generate_series and independently
    re-extracts hrefs with DuckDB regexp_extract_all + the same host
    regex — an end-to-end second implementation of the extraction."""
    from ray.data.aggregate import Count

    from ..functions.urls import extract_links, url_host

    hosts = ["a.example.com", "b.example.com", "c.example.org",
             "d.example.net"]
    rows = []
    for i in range(300):
        src = hosts[i % len(hosts)]
        tgt1 = hosts[(i + 1) % len(hosts)]
        tgt2 = hosts[(i * 7 + 2) % len(hosts)]
        html = (f'<p>x</p><a href="https://{tgt1}/p/{i}">t</a>'
                f'<a class="z" href=\'https://{tgt2}/q\'>u</a>'
                f'<a href="/relative/{i}">skip</a>')
        rows.append({"url": f"https://{src}/page/{i}", "html": html})
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def to_hosts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": url_host(batch.column("url")),
            "dst_host": url_host(batch.column("link")),
        })

    edges = (pages.map_batches(extract_links, batch_format="pyarrow",
                               batch_size=4096)
             .map_batches(to_hosts, batch_format="pyarrow"))
    agg = edges.groupby(["src_host", "dst_host"]).aggregate(
        Count(alias_name="n_links"))
    df = (agg.to_pandas().sort_values(["src_host", "dst_host"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["link_host_graph"] = q_link_host_graph

# SQL twin that re-extracts the hrefs itself (regexp_extract_all over
# the regenerated HTML) rather than shortcutting to the intended hosts
# — it independently verifies the extraction kernel end to end.
ORACLES["link_host_graph"] = (
    "WITH hosts AS (SELECT ['a.example.com','b.example.com',"
    "'c.example.org','d.example.net'] AS h),"
    " pages AS (SELECT i, h[(i % 4) + 1] AS src,"
    "  '<p>x</p><a href=\"https://' || h[((i + 1) % 4) + 1] || '/p/' || i"
    "   || '\">t</a><a class=\"z\" href=''https://'"
    "   || h[((i * 7 + 2) % 4) + 1] || '/q''>u</a>'"
    "   || '<a href=\"/relative/' || i || '\">skip</a>' AS html"
    "  FROM generate_series(0, 299) AS t(i) CROSS JOIN hosts),"
    " links AS (SELECT src, unnest(regexp_extract_all(html,"
    "  '(?i)<a\\s[^>]*href\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) AS link"
    "  FROM pages),"
    " abs_links AS (SELECT src AS src_host, lower(regexp_extract(link,"
    "  '^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS dst_host"
    "  FROM links WHERE regexp_matches(link, '^[A-Za-z][A-Za-z0-9+.\\-]*://'))"
    " SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links"
    " FROM abs_links GROUP BY 1, 2"
)


def q_pca_embeddings(sf_dir: str):
    """Distributed PCA over the embeddings table (sufficient-statistics
    pass + driver eigh) and projection onto the top-3 PCs. Rows-only:
    eigendecomposition has no SQL twin; parity with a single-machine
    numpy reference is pinned in tests/test_pca.py. Values rounded to
    6 dp so the float reduce's last ulp can't wobble the driver hash."""
    from ..stages.similarity import pca_fit, pca_transform

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    m = pca_fit(vecs, n_components=3)
    proj = pca_transform(vecs, m).to_pandas().sort_values("vec_id")
    for c in ("pc0", "pc1", "pc2"):
        proj[c] = np.round(proj[c], 6)
    evr = pa.table({
        "vec_id": pa.array([-1, -2, -3], pa.int64()),
        "pc0": pa.array(np.round(m["explained_variance_ratio"], 6)),
        "pc1": pa.array(np.round(m["explained_variance"], 6)),
        "pc2": pa.array([float(m["n"])] * 3, pa.float64()),
    })
    return pa.concat_tables(
        [evr, pa.Table.from_pandas(proj, preserve_index=False)])


QUERIES["pca_embeddings"] = q_pca_embeddings


def q_near_dedup_corpus(sf_dir: str):
    """End-to-end near-dedup of the documents table — the full
    training-data recipe composed from in-repo stages: MinHash-LSH
    candidate pairs → connected components → keep each cluster's min
    doc_id → drop every other member from the corpus. Rows-only
    (LSH candidates); per-stage semantics are pinned in their own
    tests. Returns the surviving corpus as (doc_id, n_chars) plus a
    summary row (-1, n_dropped)."""
    from ..stages.dedup import dup_clusters, minhash_near_dups
    from ..stages.join import shuffle_hash_join

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_near_dups(docs, threshold=0.5)
    clusters = dup_clusters(pairs, nb=8)

    def non_reps(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac
        keep = pac.not_equal(batch.column("doc_id"),
                             batch.column("cluster_rep"))
        return batch.filter(keep).select(["doc_id"])

    drop = clusters.map_batches(non_reps, batch_format="pyarrow")
    kept = shuffle_hash_join(docs, drop, on=["doc_id"], how="anti", nb=8)

    def n_chars(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pac
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pac.cast(pac.utf8_length(batch.column("text")),
                                pa.int64()),
        })

    out = kept.map_batches(n_chars, batch_format="pyarrow").to_pandas()
    # total doc count from parquet footers — no second scan
    n_total = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    summary = pd.DataFrame({"doc_id": [-1],
                            "n_chars": [n_total - len(out)]})
    df = (pd.concat([summary, out.sort_values("doc_id")])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["near_dedup_corpus"] = q_near_dedup_corpus


def q_dedup_lines_docs(sf_dir: str):
    """Corpus-wide duplicate-LINE dedup (CCNet-style paragraph pass)
    over the documents table, split on '.' — the first dedup operator
    with a FULL DuckDB oracle twin (window rank + string_agg
    reconstruction): cleaned text, line and removal counts must match
    the SQL byte-for-byte."""
    from ..stages.dedup import dedup_lines

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    df = (dedup_lines(docs, sep=".").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["dedup_lines_docs"] = q_dedup_lines_docs

ORACLES["dedup_lines_docs"] = (
    "WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),"
    " l AS (SELECT doc_id, unnest(string_split(text, '.')) AS line,"
    "   unnest(range(1, len(string_split(text, '.')) + 1)) AS ord FROM d),"
    " ranked AS (SELECT doc_id, ord, line,"
    "   row_number() OVER (PARTITION BY line ORDER BY doc_id, ord) AS rn,"
    "   count(*) OVER (PARTITION BY line) AS cnt FROM l)"
    " SELECT doc_id,"
    " coalesce(string_agg(line, '.' ORDER BY ord)"
    "   FILTER (WHERE cnt = 1 OR rn = 1), '') AS text,"
    " CAST(count(*) AS BIGINT) AS n_lines,"
    " CAST(count(*) FILTER (WHERE cnt > 1 AND rn > 1) AS BIGINT)"
    "   AS n_removed"
    " FROM ranked GROUP BY doc_id"
)


def q_cube_grouping_orders(sf_dir: str):
    """CUBE with the GROUPING() bitmask column — disambiguates
    rolled-up levels from genuinely-NULL key values, matching SQL's
    GROUPING(k1, k2) bit order (leftmost key = MSB)."""
    from ..stages.canonicalize import cube_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_orderpriority",
                                      "o_totalprice"])
    return cube_agg(orders, ["o_orderstatus", "o_orderpriority"],
                    "o_totalprice", grouping_col="grouping_id")


QUERIES["cube_grouping_orders"] = q_cube_grouping_orders

ORACLES["cube_grouping_orders"] = (
    "SELECT o_orderstatus, o_orderpriority,"
    " CAST(count(*) AS BIGINT) AS n_rows,"
    " round(sum(o_totalprice), 2) AS sum_value,"
    " CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)"
    "   AS grouping_id"
    " FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"
)


def q_image_phash_dups(sf_dir: str):
    """Image near-dup detection: real PNG decode → 64-bit perceptual
    hash (DCT pHash) → hamming-pigeonhole LSH pairs. Rows-only
    (binary payloads, approximate hashing); invariances and planted
    recovery are pinned in tests/test_image_phash.py. The corpus is
    the deterministic synthetic PNG table plus noisy/rescaled copies
    of every 16th image."""
    from ..functions.codecs import png_decode, png_encode
    from ..stages.dedup import hash_near_dups
    from ..stages.multimodal import ImagePhashStage, synth_media_table

    media = synth_media_table(192, kind="png")
    rng = np.random.default_rng(5)
    extra = []
    payloads = media.column("payload").to_pylist()
    for i in range(0, 192, 16):
        _, _, px = png_decode(payloads[i])
        noisy = np.clip(px.astype(np.int64)
                        + rng.integers(-5, 6, px.shape), 0, 255)
        extra.append({"media_id": 1000 + i,
                      "payload": png_encode(noisy.astype(np.uint8)),
                      "mime": "image/png"})
    corpus = pa.concat_tables(
        [media, pa.Table.from_pylist(extra, schema=media.schema)])
    ds = rd.from_arrow(corpus).repartition(4)
    hashed = ds.map_batches(ImagePhashStage(), batch_format="pyarrow",
                            concurrency=2)
    pairs = hash_near_dups(hashed, max_hamming=6, nb=8)
    df = (pairs.to_pandas().sort_values(["id_a", "id_b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df[["id_a", "id_b"]],
                                preserve_index=False)


QUERIES["image_phash_dups"] = q_image_phash_dups


def q_audio_fp_dups(sf_dir: str):
    """Audio near-dup detection: real WAV decode → 64-bit spectral
    fingerprint (gain-invariant double-difference sign bits) →
    hamming-pigeonhole LSH pairs. Rows-only (binary payloads);
    invariances and planted recovery pinned in
    tests/test_image_phash.py. Corpus = the deterministic synthetic
    WAV table plus re-gained copies of every 16th clip."""
    from ..functions.codecs import wav_decode, wav_encode
    from ..stages.dedup import hash_near_dups
    from ..stages.multimodal import AudioFingerprintStage, synth_media_table

    media = synth_media_table(192, kind="wav")
    payloads = media.column("payload").to_pylist()
    extra = []
    for i in range(0, 192, 16):
        _, s = wav_decode(payloads[i])
        quiet = (s.astype(np.float64) / 32768.0) * 0.35
        extra.append({"media_id": 1000 + i,
                      "payload": wav_encode(quiet[:, 0]),
                      "mime": "audio/wav"})
    corpus = pa.concat_tables(
        [media, pa.Table.from_pylist(extra, schema=media.schema)])
    ds = rd.from_arrow(corpus).repartition(4)
    fp = ds.map_batches(AudioFingerprintStage(), batch_format="pyarrow",
                        concurrency=2)
    pairs = hash_near_dups(fp, hash_col="afp", max_hamming=4, nb=8)
    df = (pairs.to_pandas().sort_values(["id_a", "id_b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df[["id_a", "id_b"]],
                                preserve_index=False)


QUERIES["audio_fp_dups"] = q_audio_fp_dups


def q_video_phash_dups(sf_dir: str):
    """Video near-dup detection: seek-table frame sampling → per-frame
    perceptual hash → hamming-pigeonhole pairs (two videos sharing any
    near-identical sampled frame pair up). Rows-only; planted recovery
    pinned in tests/test_image_phash.py. Corpus = the deterministic
    synthetic MPNG table plus per-frame-noised copies of every 16th
    video."""
    from ..functions.codecs import mpng_encode, mpng_frame, mpng_index
    from ..stages.dedup import hash_near_dups
    from ..stages.multimodal import VideoPhashStage, synth_media_table

    media = synth_media_table(96, kind="mpng")
    payloads = media.column("payload").to_pylist()
    rng = np.random.default_rng(9)
    extra = []
    for i in range(0, 96, 16):
        nf, fps, _ = mpng_index(payloads[i])
        frames = []
        for fi in range(nf):
            _, _, px = mpng_frame(payloads[i], fi)
            frames.append(np.clip(px.astype(np.int64)
                                  + rng.integers(-4, 5, px.shape),
                                  0, 255).astype(np.uint8))
        extra.append({"media_id": 1000 + i,
                      "payload": mpng_encode(frames, fps=fps),
                      "mime": "video/x-mpng"})
    corpus = pa.concat_tables(
        [media, pa.Table.from_pylist(extra, schema=media.schema)])
    ds = rd.from_arrow(corpus).repartition(4)
    frames = ds.map_batches(VideoPhashStage(), batch_format="pyarrow",
                            concurrency=2)
    pairs = hash_near_dups(frames, max_hamming=6, nb=8)
    df = (pairs.to_pandas().sort_values(["id_a", "id_b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df[["id_a", "id_b"]],
                                preserve_index=False)


QUERIES["video_phash_dups"] = q_video_phash_dups


def q_anchor_text_entities(sf_dir: str):
    """KG entity-candidate mining from anchor text: extract links WITH
    their anchor strings, normalize, aggregate per (dst_host, anchor)
    and keep each target host's dominant anchor — the classic
    anchor-text entity-label signal. Fully oracled: the SQL twin
    regenerates the pages and re-extracts href AND anchor text with
    DuckDB regexp_extract named groups, then replays the argmax with
    a row_number window."""
    from ray.data.aggregate import Count

    from ..functions.urls import extract_links, url_host
    from ..stages.canonicalize import groupby_argmax

    ents = ["Alan Turing", "Ada Lovelace", "Grace Hopper", "Kurt Godel"]
    hosts = ["people.example.com", "bios.example.org"]
    rows = []
    for i in range(400):
        e = ents[i % len(ents)]
        h = hosts[i % len(hosts)]
        slug = e.lower().replace(" ", "-")
        # every 7th page links with a noisy anchor
        anchor = e if i % 7 else f"the page about {e}"
        rows.append({
            "url": f"https://site{i % 5}.example.net/p/{i}",
            "html": f'<p>x</p><a href="https://{h}/{slug}">{anchor}</a>',
        })
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def links(batch: pa.Table) -> pa.Table:
        out = extract_links(batch, capture_text=True)
        import pyarrow.compute as pac
        return pa.table({
            "target": out.column("link"),
            "dst_host": url_host(out.column("link")),
            "anchor": pac.utf8_lower(out.column("anchor")),
        })

    counted = (pages.map_batches(links, batch_format="pyarrow")
               .groupby(["target", "dst_host", "anchor"])
               .aggregate(Count(alias_name="n")))
    best = groupby_argmax(counted, ["target"], ["n", "anchor"],
                          [False, True], nb=8)
    df = (best.to_pandas().sort_values("target").reset_index(drop=True)
          [["target", "dst_host", "anchor", "n"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["anchor_text_entities"] = q_anchor_text_entities

ORACLES["anchor_text_entities"] = (
    "WITH ents AS (SELECT ['Alan Turing','Ada Lovelace','Grace Hopper',"
    "'Kurt Godel'] AS e, ['people.example.com','bios.example.org'] AS h),"
    " pages AS (SELECT i, '<p>x</p><a href=\"https://' || h[(i % 2) + 1]"
    "  || '/' || lower(replace(e[(i % 4) + 1], ' ', '-')) || '\">'"
    "  || CASE WHEN i % 7 = 0 THEN 'the page about ' || e[(i % 4) + 1]"
    "     ELSE e[(i % 4) + 1] END || '</a>' AS html"
    "  FROM generate_series(0, 399) t(i) CROSS JOIN ents),"
    " ext AS (SELECT regexp_extract(html,"
    "  '(?i)<a\\s[^>]*href\\s*=\\s*[\"'']?([^\"''\\s>]+)[^>]*>([^<]*)',"
    "  ['u', 't']) AS m FROM pages),"
    " rows_ AS (SELECT m.u AS target, lower(regexp_extract(m.u,"
    "  '^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS dst_host,"
    "  lower(trim(regexp_replace(m.t, '\\s+', ' ', 'g'))) AS anchor"
    "  FROM ext WHERE regexp_matches(m.u, '^[A-Za-z][A-Za-z0-9+.\\-]*://')),"
    " counted AS (SELECT target, dst_host, anchor,"
    "  CAST(count(*) AS BIGINT) AS n FROM rows_ GROUP BY 1, 2, 3)"
    " SELECT target, dst_host, anchor, n FROM ("
    "  SELECT *, row_number() OVER (PARTITION BY target"
    "   ORDER BY n DESC, anchor ASC) AS rn FROM counted) WHERE rn = 1"
)


# ---------------------------------------------------------------------------
# Structured-data extraction (stages/structured.py): the web's
# machine-readable entity layer → triples. Each query synthesizes its
# page corpus deterministically (no html column in the SQL test
# tables) and its oracle REGENERATES the corpus in SQL and re-extracts
# with DuckDB regexp + JSON functions — an independent second
# implementation, not a shortcut to the intended values.


def q_jsonld_triples(sf_dir: str):
    """JSON-LD block → (url, subj, pred, obj) triples: the
    highest-precision KG-construction source on the web. Corpus mixes
    pages with a flat schema.org entity (string/number/bool scalars +
    a string array), pages with NO block, and pages with INVALID
    JSON; the extractor must fan out the array, stringify the number
    via its JSON text, and drop the bad/missing blocks. Fully oracled
    (DuckDB json_keys/json_extract twin; nested-object recursion is
    covered by pytest, not this flat corpus)."""
    from ..stages.structured import extract_jsonld

    types = ["Person", "Organization", "Place", "Event"]
    rows = []
    for i in range(300):
        url = f"https://site.test/p/{i}"
        if i % 7 == 3:
            html = "<html><body>no structured data</body></html>"
        elif i % 11 == 5:
            html = '<script type="application/ld+json">{bad</script>'
        else:
            block = ('{"@context":"https://schema.org",'
                     f'"@id":"https://kg.test/e/{i % 40}",'
                     f'"@type":"{types[i % 4]}",'
                     f'"name":"Entity {i % 40}",'
                     f'"rank":{i % 9},'
                     f'"tags":["t{i % 3}","t{(i + 1) % 3}"]}}')
            html = ('<html><head><script type="application/ld+json">'
                    + block + '</script></head></html>')
        rows.append({"url": url, "html": html})
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = pages.map_batches(extract_jsonld, batch_format="pyarrow",
                            batch_size=4096)
    df = (out.to_pandas().sort_values(["url", "subj", "pred", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["jsonld_triples"] = q_jsonld_triples

ORACLES["jsonld_triples"] = (
    "WITH pages AS (SELECT i, 'https://site.test/p/' || i AS url,"
    " CASE WHEN i % 7 = 3 THEN '<html><body>no structured data</body></html>'"
    "  WHEN i % 11 = 5 THEN"
    "   '<script type=\"application/ld+json\">{bad</script>'"
    "  ELSE '<html><head><script type=\"application/ld+json\">"
    "{\"@context\":\"https://schema.org\",\"@id\":\"https://kg.test/e/'"
    "   || (i%40) || '\",\"@type\":\"'"
    "   || (['Person','Organization','Place','Event'])[(i%4)+1]"
    "   || '\",\"name\":\"Entity ' || (i%40) || '\",\"rank\":' || (i%9)"
    "   || ',\"tags\":[\"t' || (i%3) || '\",\"t' || ((i+1)%3)"
    "   || '\"]}</script></head></html>' END AS html"
    " FROM generate_series(0, 299) t(i)),"
    " blocks AS (SELECT url, regexp_extract(html,"
    "  '(?is)<script[^>]*type\\s*=\\s*[\"'']application/ld\\+json[\"'']"
    "[^>]*>(.*?)</script>', 1) AS raw FROM pages),"
    " valid AS (SELECT url, raw,"
    "  json_extract_string(raw, '$.\"@id\"') AS subj"
    "  FROM blocks WHERE raw <> '' AND json_valid(raw)),"
    " keyed AS (SELECT url, subj, raw, unnest(json_keys(raw)) AS k FROM valid),"
    " scalars AS (SELECT url, subj, k AS pred,"
    "  json_extract_string(raw, '$.\"' || k || '\"') AS obj FROM keyed"
    "  WHERE k NOT IN ('@context','@id')"
    "   AND json_type(raw, '$.\"' || k || '\"') <> 'ARRAY'),"
    " arrays AS (SELECT url, subj, k AS pred,"
    "  unnest(from_json(json_extract(raw, '$.\"' || k || '\"'),"
    "   '[\"varchar\"]')) AS obj FROM keyed"
    "  WHERE k NOT IN ('@context','@id')"
    "   AND json_type(raw, '$.\"' || k || '\"') = 'ARRAY')"
    " SELECT url, subj, pred, obj FROM scalars"
    " UNION ALL SELECT url, subj, pred, obj FROM arrays"
)


def q_og_meta(sf_dir: str):
    """OpenGraph <meta property=… content=…> extraction (both
    attribute orders), filtered to the og: prefix — the page-level
    entity-card signal. Fully oracled: the SQL twin tokenizes meta
    TAGS with regexp_extract_all and re-extracts property/content
    per tag."""
    from ..stages.structured import extract_meta_properties

    rows = []
    for i in range(300):
        rows.append({
            "url": f"https://m.test/{i}",
            "html": (
                f'<head><meta property="og:title" content="Title {i % 20}" />'
                f'<meta content="Desc {i % 7}" property="og:description">'
                f'<meta property="og:site_name"   content="Site{i % 3}">'
                f'<meta property="twitter:card" content="summary">'
                f'<meta name="viewport" content="width=device-width"></head>'),
        })
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = pages.map_batches(extract_meta_properties,
                            batch_format="pyarrow", batch_size=4096)
    df = (out.to_pandas().sort_values(["url", "property", "content"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["og_meta"] = q_og_meta

ORACLES["og_meta"] = (
    "WITH pages AS (SELECT 'https://m.test/' || i AS url,"
    " '<head><meta property=\"og:title\" content=\"Title ' || (i%20)"
    " || '\" /><meta content=\"Desc ' || (i%7)"
    " || '\" property=\"og:description\">"
    "<meta property=\"og:site_name\"   content=\"Site' || (i%3)"
    " || '\"><meta property=\"twitter:card\" content=\"summary\">"
    "<meta name=\"viewport\" content=\"width=device-width\"></head>' AS html"
    " FROM generate_series(0, 299) t(i)),"
    " tags AS (SELECT url,"
    "  unnest(regexp_extract_all(html, '(?i)<meta\\s[^>]*>')) AS tag"
    "  FROM pages),"
    " kv AS (SELECT url,"
    "  regexp_extract(tag, '(?i)\\sproperty\\s*=\\s*[\"'']([^\"'']+)[\"'']',"
    "   1) AS property,"
    "  regexp_extract(tag, '(?i)\\scontent\\s*=\\s*[\"'']([^\"'']*)[\"'']',"
    "   1) AS content,"
    "  regexp_matches(tag, '(?i)\\sproperty\\s*=\\s*[\"'']')"
    "   AND regexp_matches(tag, '(?i)\\scontent\\s*=\\s*[\"'']') AS ok"
    "  FROM tags)"
    " SELECT url, property, content FROM kv"
    " WHERE ok AND property LIKE 'og:%'"
)


def q_microdata_pairs(sf_dir: str):
    """HTML5-microdata itemprop extraction (meta/content form + inline
    text form, whitespace-collapsed) over a synthetic person-card
    corpus. Fully oracled: the meta form re-extracts per tag; the
    text form uses DuckDB's aligned-list lockstep unnest over three
    parallel regexp_extract_all group pulls, filtering <meta> by tag
    name (RE2 has no lookahead — the Python kernel's (?!meta) guard
    is mirrored as a post-filter)."""
    from ..stages.structured import extract_microdata

    rows = []
    for i in range(300):
        gender = "female" if i % 2 else "male"
        rows.append({
            "url": f"https://p.test/{i}",
            "html": (
                f'<div itemscope itemtype="https://schema.org/Person">'
                f'<span itemprop="name">Person   {i % 25}</span>'
                f'<meta itemprop="gender" content="{gender}">'
                f'<a itemprop="url" href="https://p.test/h/{i % 25}">'
                f'profile</a></div>'),
        })
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = pages.map_batches(extract_microdata, batch_format="pyarrow",
                            batch_size=4096)
    df = (out.to_pandas().sort_values(["url", "itemprop", "value"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["microdata_pairs"] = q_microdata_pairs

ORACLES["microdata_pairs"] = (
    "WITH pages AS (SELECT 'https://p.test/' || i AS url,"
    " '<div itemscope itemtype=\"https://schema.org/Person\">"
    "<span itemprop=\"name\">Person   ' || (i%25) || '</span>"
    "<meta itemprop=\"gender\" content=\"'"
    " || CASE WHEN i % 2 = 1 THEN 'female' ELSE 'male' END"
    " || '\"><a itemprop=\"url\" href=\"https://p.test/h/' || (i%25)"
    " || '\">profile</a></div>' AS html"
    " FROM generate_series(0, 299) t(i)),"
    " metatags AS (SELECT url,"
    "  unnest(regexp_extract_all(html, '(?i)<meta\\s[^>]*>')) AS tag"
    "  FROM pages),"
    " metakv AS (SELECT url, regexp_extract(tag,"
    "   '(?i)itemprop\\s*=\\s*[\"'']([^\"'']+)[\"'']', 1) AS itemprop,"
    "  regexp_extract(tag,"
    "   '(?i)\\scontent\\s*=\\s*[\"'']([^\"'']*)[\"'']', 1) AS value,"
    "  regexp_matches(tag, '(?i)itemprop\\s*=\\s*[\"'']')"
    "   AND regexp_matches(tag, '(?i)\\scontent\\s*=\\s*[\"'']') AS ok"
    "  FROM metatags),"
    " textkv AS (SELECT url,"
    "  unnest(regexp_extract_all(html,"
    "   '(?i)<(\\w+)\\s[^>]*itemprop\\s*=\\s*[\"'']([^\"'']+)[\"'']"
    "[^>]*>([^<]*)', 1)) AS tagname,"
    "  unnest(regexp_extract_all(html,"
    "   '(?i)<(\\w+)\\s[^>]*itemprop\\s*=\\s*[\"'']([^\"'']+)[\"'']"
    "[^>]*>([^<]*)', 2)) AS itemprop,"
    "  unnest(regexp_extract_all(html,"
    "   '(?i)<(\\w+)\\s[^>]*itemprop\\s*=\\s*[\"'']([^\"'']+)[\"'']"
    "[^>]*>([^<]*)', 3)) AS rawtext"
    "  FROM pages)"
    " SELECT url, itemprop, value FROM metakv WHERE ok"
    " UNION ALL SELECT url, itemprop,"
    "  trim(regexp_replace(rawtext, '\\s+', ' ', 'g')) AS value"
    " FROM textkv WHERE lower(tagname) <> 'meta'"
)


def q_pii_redact(sf_dir: str):
    """Typed PII detection + redaction (functions/pii.py) over the
    documents table, deterministically AUGMENTED per doc_id with one
    of four planted PII shapes (email / phone / IP / credit card) so
    every class has real matches. Counts are per-class on the
    original text; redaction applies the fixed class order. Fully
    oracled: DuckDB shares the RE2 engine, so the regexp twin is
    byte-exact."""
    from ..functions.pii import detect_pii, redact_pii

    def augment(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        d = df["doc_id"]
        mod = d % 5
        tail = d.astype(str).copy()
        tail[:] = " no pii here"
        tail[mod == 0] = (" Contact: user" + d.astype(str)
                          + "@example.com now.")
        tail[mod == 1] = (" Call +1 (555) 010-"
                          + (d % 10000).astype(int).map("{:04d}".format)
                          + " today")
        tail[mod == 2] = (" Server at 10." + (d % 256).astype(str)
                          + ".0." + (d % 100).astype(str) + " port 80")
        tail[mod == 3] = (" Card 4111 1111 1111 "
                          + (d % 10000).astype(int).map("{:04d}".format)
                          + " expired")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(df["text"].fillna("") + tail, pa.string()),
        })

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(augment, batch_format="pyarrow", batch_size=65536)
           .map_batches(detect_pii, batch_format="pyarrow",
                        batch_size=65536)
           .map_batches(redact_pii, batch_format="pyarrow",
                        batch_size=65536))
    df = (out.select_columns(["doc_id", "n_email", "n_cc", "n_phone",
                              "n_ip", "text_redacted"])
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["pii_redact"] = q_pii_redact

ORACLES["pii_redact"] = (
    "WITH aug AS (SELECT doc_id, coalesce(text,'')"
    " || CASE CAST(doc_id % 5 AS INTEGER)"
    " WHEN 0 THEN ' Contact: user' || doc_id || '@example.com now.'"
    " WHEN 1 THEN ' Call +1 (555) 010-'"
    "  || lpad(CAST(doc_id % 10000 AS VARCHAR),4,'0') || ' today'"
    " WHEN 2 THEN ' Server at 10.' || (doc_id % 256) || '.0.'"
    "  || (doc_id % 100) || ' port 80'"
    " WHEN 3 THEN ' Card 4111 1111 1111 '"
    "  || lpad(CAST(doc_id % 10000 AS VARCHAR),4,'0') || ' expired'"
    " ELSE ' no pii here' END AS t FROM documents)"
    " SELECT doc_id,"
    " CAST(len(regexp_extract_all(t,"
    "  '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}')) AS INTEGER)"
    "  AS n_email,"
    " CAST(len(regexp_extract_all(t,"
    "  '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b')) AS INTEGER) AS n_cc,"
    " CAST(len(regexp_extract_all(t,"
    "  '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]\\d{2,4}'))"
    "  AS INTEGER) AS n_phone,"
    " CAST(len(regexp_extract_all(t,"
    "  '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS INTEGER) AS n_ip,"
    " regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,"
    "  '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',"
    "  '[EMAIL]', 'g'),"
    "  '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b', '[CC]', 'g'),"
    "  '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g'),"
    "  '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]\\d{2,4}',"
    "  '[PHONE]', 'g') AS text_redacted"
    " FROM aug"
)


def q_sentence_split(sf_dir: str):
    """Row-expanding sentence segmentation over the documents table
    (text deterministically augmented with terminator punctuation —
    the synthetic corpus has none) with per-sentence token/char
    stats. Fully oracled: DuckDB string_split_regex + lockstep
    aligned-list unnest + row_number replays the same RE2 rule."""
    from ..stages.textstats import split_sentences

    def augment(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t = df["text"].fillna("")
        aug = ("First bit. " + t.str.slice(0, 40) + "! Then  "
               + t.str.slice(40, 70) + "? End "
               + df["doc_id"].astype(str) + ".")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(aug, pa.string())})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(augment, batch_format="pyarrow", batch_size=65536)
           .map_batches(split_sentences, batch_format="pyarrow",
                        batch_size=65536))
    df = (out.to_pandas().sort_values(["doc_id", "sent_idx"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["sentence_split"] = q_sentence_split

ORACLES["sentence_split"] = (
    "WITH aug AS (SELECT doc_id,"
    " 'First bit. ' || substr(coalesce(text,''),1,40) || '! Then  ' ||"
    " substr(coalesce(text,''),41,30) || '? End ' || doc_id || '.' AS t"
    " FROM documents),"
    " segs AS (SELECT doc_id,"
    "  unnest(string_split_regex(t, '[.!?]+\\s+')) AS s,"
    "  unnest(range(len(string_split_regex(t, '[.!?]+\\s+')))) AS raw_idx"
    "  FROM aug),"
    " kept AS (SELECT doc_id, trim(s) AS sentence, raw_idx FROM segs"
    "  WHERE trim(s) <> '')"
    " SELECT doc_id,"
    " CAST(row_number() OVER (PARTITION BY doc_id ORDER BY raw_idx) - 1"
    "  AS INTEGER) AS sent_idx, sentence,"
    " CAST(len(regexp_extract_all(sentence, '\\S+')) AS INTEGER) AS n_tokens,"
    " CAST(length(sentence) AS INTEGER) AS n_chars FROM kept"
)


def q_pmi_cooccur(sf_dir: str):
    """Token co-occurrence PMI over the documents table: bounded
    vocabulary (top-50 by document frequency, min_df 2, ties by token
    asc), per-document distinct token sets, pmi = ln(n_ab·N /
    (df_a·df_b)) rounded to 6 dp. Map-side pair expansion +
    pre-aggregation; the global shuffle carries ≤ V²/2 rows."""
    from ..stages.textstats import cooccurrence_pmi

    return cooccurrence_pmi(_docs(sf_dir, ["doc_id", "text"]),
                            max_vocab=50, min_df=2)


QUERIES["pmi_cooccur"] = q_pmi_cooccur

ORACLES["pmi_cooccur"] = (
    "WITH toks AS (SELECT DISTINCT doc_id, t FROM (SELECT doc_id,"
    "  unnest(regexp_split_to_array(trim(lower(coalesce(text,''))),"
    "   '\\s+')) AS t FROM documents) WHERE t <> ''),"
    " df AS (SELECT t, count(*) AS df FROM toks GROUP BY t"
    "  HAVING count(*) >= 2),"
    " vocab AS (SELECT t, df FROM df ORDER BY df DESC, t ASC LIMIT 50),"
    " vt AS (SELECT doc_id, toks.t, vocab.df FROM toks"
    "  JOIN vocab ON toks.t = vocab.t),"
    " nn AS (SELECT count(*) AS n FROM documents),"
    " pairs AS (SELECT a.t AS tok_a, b.t AS tok_b,"
    "  CAST(count(*) AS BIGINT) AS n_ab, any_value(a.df) AS dfa,"
    "  any_value(b.df) AS dfb FROM vt a"
    "  JOIN vt b ON a.doc_id = b.doc_id AND a.t < b.t GROUP BY 1, 2)"
    " SELECT tok_a, tok_b, n_ab,"
    " round(ln(CAST(n_ab AS DOUBLE) * nn.n / (dfa * dfb)), 6) AS pmi"
    " FROM pairs CROSS JOIN nn"
)


def q_bgp_match(sf_dir: str):
    """SPARQL-style basic-graph-pattern match (graph.match_bgp) over a
    synthesized KG: (?p worksFor ?o)(?o locatedIn ?c)(?p @type Person)
    → (p, o, c) bindings via chained bucketed hash joins. Fully
    oracled: the SQL twin regenerates the triples with
    generate_series and runs the equivalent 3-way self join."""
    from ..stages.graph import match_bgp

    rows = []
    for i in range(500):
        rows.append({"subj": f"P{i}", "pred": "worksFor",
                     "obj": f"O{i % 20}"})
        rows.append({"subj": f"P{i}", "pred": "@type",
                     "obj": "Bot" if i % 3 == 1 else "Person"})
    for j in range(20):
        rows.append({"subj": f"O{j}", "pred": "locatedIn",
                     "obj": f"C{j % 7}"})
        rows.append({"subj": f"O{j}", "pred": "@type",
                     "obj": "Organization"})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = match_bgp(triples, [("?p", "worksFor", "?o"),
                              ("?o", "locatedIn", "?c"),
                              ("?p", "@type", "Person")], nb=8)
    df = (out.to_pandas().sort_values(["p", "o", "c"])
          .reset_index(drop=True)[["p", "o", "c"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["bgp_match"] = q_bgp_match

ORACLES["bgp_match"] = (
    "WITH t AS ("
    " SELECT 'P' || i AS subj, 'worksFor' AS pred, 'O' || (i%20) AS obj"
    "  FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'P' || i, '@type',"
    "  CASE WHEN i%3 = 1 THEN 'Bot' ELSE 'Person' END"
    "  FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'O' || j, 'locatedIn', 'C' || (j%7)"
    "  FROM generate_series(0, 19) s(j)"
    " UNION ALL SELECT 'O' || j, '@type', 'Organization'"
    "  FROM generate_series(0, 19) s(j))"
    " SELECT a.subj AS p, a.obj AS o, b.obj AS c FROM t a"
    " JOIN t b ON a.obj = b.subj AND b.pred = 'locatedIn'"
    " JOIN t ty ON ty.subj = a.subj AND ty.pred = '@type'"
    "  AND ty.obj = 'Person'"
    " WHERE a.pred = 'worksFor'"
)


def q_boilerplate_docs(sf_dir: str):
    """Per-source boilerplate removal (dedup.remove_boilerplate,
    CCNet frequent-paragraph pass; sep=' ' so the synthetic corpus's
    tokens act as lines): drop every token appearing in ≥
    max(3, ceil(0.5·group_size)) distinct docs of its source. Fully
    oracled: DuckDB census + totals join + string_agg rebuild."""
    from ..stages.dedup import remove_boilerplate

    out = remove_boilerplate(
        _docs(sf_dir, ["doc_id", "source", "text"]),
        group_col="source", sep=" ", min_docs=3, min_frac=0.5)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["n_lines"] = df["n_lines"].astype("int64")
    df["n_removed"] = df["n_removed"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["boilerplate_docs"] = q_boilerplate_docs

ORACLES["boilerplate_docs"] = (
    "WITH docs2 AS (SELECT doc_id, coalesce(source,'') AS source,"
    "  coalesce(text,'') AS t FROM documents),"
    " seg AS (SELECT doc_id, source,"
    "  unnest(string_split(t, ' ')) AS line,"
    "  unnest(range(len(string_split(t, ' ')))) AS pos FROM docs2),"
    " tot AS (SELECT source, count(*) AS n_docs FROM docs2"
    "  GROUP BY source),"
    " census AS (SELECT source, line, count(DISTINCT doc_id) AS nd"
    "  FROM seg GROUP BY 1, 2),"
    " boiler AS (SELECT census.source, line FROM census"
    "  JOIN tot USING (source)"
    "  WHERE nd >= greatest(3, CAST(ceil(0.5 * n_docs) AS BIGINT))),"
    " kept AS (SELECT seg.doc_id, seg.pos, seg.line FROM seg"
    "  LEFT JOIN boiler ON seg.source = boiler.source"
    "   AND seg.line = boiler.line WHERE boiler.line IS NULL),"
    " recon AS (SELECT doc_id, string_agg(line, ' ' ORDER BY pos)"
    "  AS text, count(*) AS n_kept FROM kept GROUP BY doc_id)"
    " SELECT d.doc_id, coalesce(r.text, '') AS text,"
    " CAST(len(string_split(d.t, ' ')) AS BIGINT) AS n_lines,"
    " CAST(len(string_split(d.t, ' ')) - coalesce(r.n_kept, 0)"
    "  AS BIGINT) AS n_removed"
    " FROM docs2 d LEFT JOIN recon r USING (doc_id)"
)


def q_kg_export_ntriples(sf_dir: str):
    """KG interchange loop: synthesize triples (URI objects, typed
    literals, a newline/quote-bearing note every 10th subject), WRITE
    them as N-Triples (sources/ntriples.py), READ the .nt files back,
    and aggregate per (pred, obj_kind). Fully oracled: the SQL twin
    computes the same aggregate from the regenerated triples WITHOUT
    serializing — equality proves the escape/parse loop is lossless."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count

    from ..sources.ntriples import read_ntriples, write_ntriples

    rows = []
    for i in range(500):
        rows.append({"subj": f"https://kg.test/p/{i}", "pred": "worksFor",
                     "obj": f"https://kg.test/org/{i % 20}"})
        rows.append({"subj": f"https://kg.test/p/{i}", "pred": "@type",
                     "obj": "Bot" if i % 3 == 1 else "Person"})
        if i % 10 == 0:
            rows.append({"subj": f"https://kg.test/p/{i}", "pred": "note",
                         "obj": f'line1\n"q{i}"\tend\\'})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out_dir = tempfile.mkdtemp(prefix="ntq_")
    try:
        write_ntriples(triples, out_dir)
        back = read_ntriples(out_dir)
        agg = (back.map_batches(
            lambda b: pa.table({
                "pred": b.column("pred"), "obj_kind": b.column("obj_kind"),
                "obj": b.column("obj")}),
            batch_format="pyarrow")
            .groupby(["pred", "obj_kind", "obj"])
            .aggregate(Count(alias_name="n_occ")))
        df = agg.to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    g = (df.groupby(["pred", "obj_kind"], sort=True)
         .agg(n=("n_occ", "sum"), n_distinct_obj=("obj", "nunique"),
              min_obj=("obj", "min"))
         .reset_index())
    g["n"] = g["n"].astype("int64")
    g["n_distinct_obj"] = g["n_distinct_obj"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


QUERIES["kg_export_ntriples"] = q_kg_export_ntriples

ORACLES["kg_export_ntriples"] = (
    "WITH t AS ("
    " SELECT 'https://kg.test/p/' || i AS subj, 'worksFor' AS pred,"
    "  'https://kg.test/org/' || (i%20) AS obj"
    "  FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'https://kg.test/p/' || i, '@type',"
    "  CASE WHEN i%3 = 1 THEN 'Bot' ELSE 'Person' END"
    "  FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'https://kg.test/p/' || i, 'note',"
    "  'line1' || chr(10) || '\"q' || i || '\"' || chr(9) || 'end\\'"
    "  FROM generate_series(0, 499) s(i) WHERE i%10 = 0),"
    " k AS (SELECT pred, CASE WHEN regexp_matches(obj,"
    "  '^[A-Za-z][A-Za-z0-9+.\\-]*://') THEN 'uri' ELSE 'string' END"
    "  AS obj_kind, obj FROM t)"
    " SELECT pred, obj_kind, CAST(count(*) AS BIGINT) AS n,"
    " CAST(count(DISTINCT obj) AS BIGINT) AS n_distinct_obj,"
    " min(obj) AS min_obj FROM k GROUP BY 1, 2"
)


def q_entity_label_fusion(sf_dir: str):
    """KG label fusion — the flagship-adjacent composition: the SAME
    entity URIs appear as JSON-LD subjects (structured ``name``) and
    as link targets (anchor text); extract both, take min(name) and
    the dominant anchor per entity, and fuse with a bucketed hash
    join. The extraction kernels are independently oracled by
    jsonld_triples / anchor_text_entities; this twin verifies the
    fusion math (groupby, argmax, join) on the regenerated corpus."""
    from ray.data.aggregate import Count

    from ..stages.canonicalize import groupby_argmax
    from ..stages.join import shuffle_hash_join
    from ..stages.structured import extract_jsonld

    from ..functions.urls import extract_links

    rows = []
    for i in range(300):
        k = i % 25
        target = f"https://kg.test/e/{k}"
        anchor = f"the {k} page" if i % 6 == 0 else f"entity {k}"
        html = (f'<script type="application/ld+json">'
                f'{{"@id":"{target}","@type":"Person",'
                f'"name":"Entity {k}"}}'
                f'</script><a href="{target}">{anchor}</a>')
        rows.append({"url": f"https://s.test/p/{i}", "html": html})
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    jl = pages.map_batches(extract_jsonld, batch_format="pyarrow",
                           batch_size=4096)
    names = jl.map_batches(
        lambda b: pa.table({
            "subj": b.filter(pc.equal(b.column("pred"), "name"))
            .column("subj"),
            "name": b.filter(pc.equal(b.column("pred"), "name"))
            .column("obj")}),
        batch_format="pyarrow")
    names = groupby_argmax(names, ["subj"], ["name"], [True], nb=8)

    def links(batch: pa.Table) -> pa.Table:
        out = extract_links(batch, capture_text=True)
        return pa.table({"subj": out.column("link"),
                         "top_anchor": out.column("anchor")})

    counted = (pages.map_batches(links, batch_format="pyarrow")
               .groupby(["subj", "top_anchor"])
               .aggregate(Count(alias_name="n")))
    top = groupby_argmax(counted, ["subj"], ["n", "top_anchor"],
                         [False, True], nb=8)
    fused = shuffle_hash_join(names, top, on=["subj"], how="inner", nb=8)
    df = (fused.to_pandas().sort_values("subj").reset_index(drop=True)
          [["subj", "name", "top_anchor", "n"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["entity_label_fusion"] = q_entity_label_fusion

ORACLES["entity_label_fusion"] = (
    "WITH pages AS (SELECT i, 'https://kg.test/e/' || (i%25) AS target,"
    " CASE WHEN i%6 = 0 THEN 'the ' || (i%25) || ' page'"
    "  ELSE 'entity ' || (i%25) END AS anchor"
    " FROM generate_series(0, 299) t(i)),"
    " names AS (SELECT DISTINCT target AS subj,"
    "  'Entity ' || (i%25) AS name FROM pages),"
    " cnt AS (SELECT target AS subj, anchor AS top_anchor,"
    "  CAST(count(*) AS BIGINT) AS n FROM pages GROUP BY 1, 2),"
    " top AS (SELECT subj, top_anchor, n FROM (SELECT *,"
    "  row_number() OVER (PARTITION BY subj"
    "   ORDER BY n DESC, top_anchor ASC) rn FROM cnt) WHERE rn = 1)"
    " SELECT names.subj, min(name) AS name,"
    " any_value(top_anchor) AS top_anchor, any_value(n) AS n"
    " FROM names JOIN top USING (subj) GROUP BY 1"
)


def q_graph_hits(sf_dir: str):
    """HITS hubs/authorities (graph.hits) over the same derived edge
    list as graph_degrees/graph_pagerank (src = o_orderkey//10 →
    dst = o_orderkey), 2 iterations, L1-normalized half-steps. Fully
    oracled by an unrolled-CTE twin (one CTE chain per half-step),
    scores rounded to 8 dp."""
    from ..stages.graph import hits

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k, pa.int64())})

    out = hits(orders.map_batches(edges, batch_format="pyarrow"),
               src="src", dst="dst", iters=2, nb=16)
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("node").reset_index(drop=True),
                                preserve_index=False)


QUERIES["graph_hits"] = q_graph_hits


def _hits_oracle_sql(iters: int = 2) -> str:
    """Unrolled HITS recurrence matching stages/graph.py::hits: per
    iteration a ← L1-normalized Σ h over in-edges, then h ←
    L1-normalized Σ a over out-edges; absent scores coalesce to 0."""
    s = (
        "WITH e AS (SELECT o_orderkey // 10 AS src, o_orderkey AS dst"
        "   FROM orders WHERE o_orderkey >= 10),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS (SELECT count(*) AS n FROM nodes),"
        " h0 AS (SELECT node, 1.0 / nn.n AS h FROM nodes CROSS JOIN nn)"
    )
    for i in range(iters):
        s += (
            f", ar{i} AS (SELECT e.dst AS node, sum(h.h) AS a"
            f"   FROM e JOIN h{i} h ON e.src = h.node GROUP BY e.dst)"
            f", a{i} AS (SELECT node,"
            f"   a / (SELECT sum(a) FROM ar{i}) AS a FROM ar{i})"
            f", hr{i} AS (SELECT e.src AS node, sum(a.a) AS h"
            f"   FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src)"
            f", h{i + 1} AS (SELECT node,"
            f"   h / (SELECT sum(h) FROM hr{i}) AS h FROM hr{i})"
        )
    last = iters
    return (s + f" SELECT CAST(n.node AS BIGINT) AS node,"
                f" round(coalesce(h.h, 0), 8) AS hub,"
                f" round(coalesce(a.a, 0), 8) AS authority"
                f" FROM nodes n LEFT JOIN h{last} h ON h.node = n.node"
                f" LEFT JOIN a{last - 1} a ON a.node = n.node")


ORACLES["graph_hits"] = _hits_oracle_sql(iters=2)


def q_robots_filter(sf_dir: str):
    """Crawl-politeness URL filtering: parse per-host robots.txt
    (agent sections, Allow/Disallow, comments, empty-Disallow) and
    apply RFC-9309 longest-match over a synthetic URL table —
    keep_blocked=True so the oracle checks BOTH verdicts. The text
    PARSE is pinned by pytest; the SQL twin regenerates the parsed
    rules and replays the packed-score longest-match decision."""
    from ..functions.robots import parse_robots_rules, robots_filter

    robots_rows = []
    for k in range(6):
        doc = ("User-agent: gptbot\nDisallow: /\n\n" if k == 0 else "")
        doc += ("User-agent: *\nDisallow: /private/\n"
                "Allow: /private/pub\nDisallow: /tmp\n# note\n")
        robots_rows.append({"host": f"h{k}.test", "robots_txt": doc})
    robots_rows.append({"host": "h6.test",
                        "robots_txt": "User-agent: *\nDisallow:\n"})
    robots = rd.from_arrow(pa.Table.from_pylist(robots_rows))
    rules = robots.map_batches(parse_robots_rules,
                               batch_format="pyarrow").materialize()

    paths = ["/ok/{i}", "/private/{i}", "/private/pub/{i}", "/tmp{i}", ""]
    urls = rd.from_arrow(pa.Table.from_pylist([
        {"url": f"https://h{i % 8}.test"
         + paths[i % 5].replace("{i}", str(i))}
        for i in range(400)
    ])).repartition(4)
    out = robots_filter(urls, rules, nb=8, keep_blocked=True)
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["robots_filter"] = q_robots_filter

ORACLES["robots_filter"] = (
    "WITH rules AS ("
    " SELECT 'h' || k || '.test' AS host, FALSE AS allow,"
    "  '/private/' AS prefix FROM generate_series(0, 5) s(k)"
    " UNION ALL SELECT 'h' || k || '.test', TRUE, '/private/pub'"
    "  FROM generate_series(0, 5) s(k)"
    " UNION ALL SELECT 'h' || k || '.test', FALSE, '/tmp'"
    "  FROM generate_series(0, 5) s(k)),"
    " paths AS (SELECT ['/ok/', '/private/', '/private/pub/', '/tmp',"
    "  ''] AS p),"
    " urls AS (SELECT 'https://h' || (i % 8) || '.test'"
    "  || CASE WHEN i % 5 = 4 THEN ''"
    "     ELSE p[(i % 5) + 1] || i END AS url,"
    "  'h' || (i % 8) || '.test' AS host,"
    "  CASE WHEN i % 5 = 4 THEN '' ELSE p[(i % 5) + 1] || i END AS path"
    "  FROM generate_series(0, 399) t(i) CROSS JOIN paths),"
    " scored AS (SELECT url, urls.host,"
    "  CASE WHEN prefix IS NULL THEN -1"
    "   WHEN starts_with(path, prefix)"
    "    THEN 2 * length(prefix) + CAST(allow AS INTEGER)"
    "   ELSE -2 + CAST(allow AS INTEGER) END AS pack"
    "  FROM urls LEFT JOIN rules ON urls.host = rules.host)"
    " SELECT url, host, max(pack) < 0 OR max(pack) % 2 = 1 AS allowed"
    " FROM scored GROUP BY 1, 2"
)


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier discovery — the composition a crawler runs every
    cycle: extract absolute links from fetched pages, distinct them,
    and ANTI-join against the already-crawled url set to get the new
    frontier. Fully oracled (SQL regexp re-extraction + EXCEPT over
    the regenerated corpus)."""
    from ..functions.urls import extract_links
    from ..stages.canonicalize import dedup_exact
    from ..stages.join import shuffle_hash_join

    hosts = ["a.crawl.test", "b.crawl.test", "c.crawl.test"]
    rows = []
    for i in range(300):
        # each page links to its successor page and a per-host hub —
        # successors of crawled pages are partly crawled already
        h = hosts[i % 3]
        nxt = f"https://{h}/p/{(i + 3) % 450}"
        hub = f"https://{h}/hub/{i % 7}"
        rows.append({
            "url": f"https://{h}/p/{i}",
            "html": (f'<a href="{nxt}">next</a>'
                     f"<a href='{hub}'>hub</a>"
                     f'<a href="/rel/{i}">rel</a>'),
        })
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    seen = pages.map_batches(
        lambda b: pa.table({"link": b.column("url")}),
        batch_format="pyarrow")
    links = (pages.map_batches(extract_links, batch_format="pyarrow")
             .map_batches(lambda b: b.select(["link"]),
                          batch_format="pyarrow"))
    frontier = shuffle_hash_join(
        dedup_exact(links, ["link"], nb=8), seen,
        on=["link"], how="anti", nb=8)
    df = (frontier.to_pandas().sort_values("link")
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["crawl_frontier"] = q_crawl_frontier

ORACLES["crawl_frontier"] = (
    "WITH hosts AS (SELECT ['a.crawl.test','b.crawl.test',"
    "'c.crawl.test'] AS h),"
    " pages AS (SELECT i, 'https://' || h[(i % 3) + 1] || '/p/' || i"
    "  AS url,"
    "  '<a href=\"https://' || h[(i % 3) + 1] || '/p/' || ((i + 3) % 450)"
    "  || '\">next</a><a href=''https://' || h[(i % 3) + 1] || '/hub/'"
    "  || (i % 7) || '''>hub</a><a href=\"/rel/' || i || '\">rel</a>'"
    "  AS html FROM generate_series(0, 299) t(i) CROSS JOIN hosts),"
    " links AS (SELECT DISTINCT unnest(regexp_extract_all(html,"
    "  '(?i)<a\\s[^>]*href\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) AS link"
    "  FROM pages),"
    " abs_links AS (SELECT link FROM links"
    "  WHERE regexp_matches(link, '^[A-Za-z][A-Za-z0-9+.\\-]*://'))"
    " SELECT link FROM abs_links EXCEPT SELECT url FROM pages"
)


def q_main_text(sf_dir: str):
    """Readability-lite main-content extraction over a synthetic page
    corpus: keep <p> blocks that are ≥30 chars with anchor-text ≤30%
    of block text, joined in document order. Fully oracled: the SQL
    twin replays the identical RE2 regexes (block findall, tag strip,
    anchor concat) plus the integer link-density test and an ordered
    string_agg."""
    from ..stages.structured import extract_main_text

    rows = []
    for i in range(300):
        paras = [
            f"<p>Paragraph {i} carries enough real prose to clear the "
            f"minimum content length bar easily.</p>",
            f"<p>tiny {i}</p>",
            f'<p><a href="/a/{i}">one link</a> '
            f'<a href="/b/{i}">another much longer link text here</a>'
            f" and</p>",
            f'<p>Prose with a small <a href="/c/{i}">link {i % 9}</a> '
            f"inside a decently long sentence about item {i % 40}.</p>",
        ]
        if i % 5 == 0:
            paras.append("<p>Shouty\n  multi   line\tblock with "
                         "plenty of words to keep around.</p>")
        rows.append({"url": f"https://m.test/{i}",
                     "html": "<html>" + "".join(paras) + "</html>"})
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = pages.map_batches(extract_main_text, batch_format="pyarrow",
                            batch_size=4096)
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["main_text"] = q_main_text

ORACLES["main_text"] = (
    "WITH pages AS (SELECT i, 'https://m.test/' || i AS url,"
    " '<html><p>Paragraph ' || i || ' carries enough real prose to"
    " clear the minimum content length bar easily.</p><p>tiny ' || i"
    " || '</p><p><a href=\"/a/' || i || '\">one link</a> <a href=\"/b/'"
    " || i || '\">another much longer link text here</a> and</p>"
    "<p>Prose with a small <a href=\"/c/' || i || '\">link ' || (i%9)"
    " || '</a> inside a decently long sentence about item ' || (i%40)"
    " || '.</p>' || CASE WHEN i % 5 = 0 THEN"
    " '<p>Shouty' || chr(10) || '  multi   line' || chr(9) || 'block"
    " with plenty of words to keep around.</p>' ELSE '' END"
    " || '</html>' AS html FROM generate_series(0, 299) t(i)),"
    " blk AS (SELECT url,"
    "  unnest(regexp_extract_all(html, '(?is)<p[^>]*>(.*?)</p>', 1))"
    "   AS b,"
    "  unnest(range(len(regexp_extract_all(html,"
    "   '(?is)<p[^>]*>(.*?)</p>', 1)))) AS idx FROM pages),"
    " scored AS (SELECT url, idx,"
    "  trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),"
    "   '\\s+', ' ', 'g')) AS text,"
    "  trim(regexp_replace(regexp_replace(coalesce(array_to_string("
    "   regexp_extract_all(b, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),"
    "   '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS link_text"
    "  FROM blk),"
    " kept AS (SELECT url, idx, text FROM scored"
    "  WHERE length(text) >= 30"
    "   AND length(link_text) * 100 <= 30 * length(text)),"
    " agg AS (SELECT url, string_agg(text, chr(10) ORDER BY idx)"
    "  AS main_text, CAST(count(*) AS INTEGER) AS n_kept"
    "  FROM kept GROUP BY url),"
    " tot AS (SELECT url, CAST(count(*) AS INTEGER) AS n_blocks"
    "  FROM blk GROUP BY url)"
    " SELECT p.url, coalesce(a.main_text, '') AS main_text,"
    " coalesce(t.n_blocks, 0) AS n_blocks,"
    " coalesce(a.n_kept, 0) AS n_kept"
    " FROM pages p LEFT JOIN agg a ON a.url = p.url"
    " LEFT JOIN tot t ON t.url = p.url"
)


def q_kg_sameas_canonical(sf_dir: str):
    """owl:sameAs canonicalization (graph.canonicalize_entities) over
    a synthesized KG with 2- and 3-entity alias chains: components of
    the alias graph pick min-id canonicals, every triple is rewritten
    through the mapping, sameAs rows drop, merged duplicates dedup.
    Fully oracled by a recursive-CTE components twin + rewrite joins
    + DISTINCT."""
    from ..stages.graph import canonicalize_entities

    rows = []
    for k in range(50):
        rows.append({"subj": f"w{k}", "pred": "sameAs", "obj": f"e{k}"})
        if k % 2 == 0:
            rows.append({"subj": f"x{k}", "pred": "sameAs",
                         "obj": f"w{k}"})
            rows.append({"subj": f"x{k}", "pred": "knows",
                         "obj": f"w{(k + 1) % 50}"})
        rows.append({"subj": f"w{k}", "pred": "hasName",
                     "obj": f"Entity {k}"})
        rows.append({"subj": f"e{k}", "pred": "rank",
                     "obj": str(k % 7)})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = canonicalize_entities(triples, nb=8)
    df = (out.to_pandas().sort_values(["subj", "pred", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["kg_sameas_canonical"] = q_kg_sameas_canonical

ORACLES["kg_sameas_canonical"] = (
    "WITH RECURSIVE base AS ("
    " SELECT 'w' || k AS subj, 'sameAs' AS pred, 'e' || k AS obj"
    "  FROM generate_series(0, 49) s(k)"
    " UNION ALL SELECT 'x' || k, 'sameAs', 'w' || k"
    "  FROM generate_series(0, 49) s(k) WHERE k % 2 = 0"
    " UNION ALL SELECT 'x' || k, 'knows', 'w' || ((k + 1) % 50)"
    "  FROM generate_series(0, 49) s(k) WHERE k % 2 = 0"
    " UNION ALL SELECT 'w' || k, 'hasName', 'Entity ' || k"
    "  FROM generate_series(0, 49) s(k)"
    " UNION ALL SELECT 'e' || k, 'rank', CAST(k % 7 AS VARCHAR)"
    "  FROM generate_series(0, 49) s(k)),"
    " al AS (SELECT subj AS u, obj AS v FROM base WHERE pred = 'sameAs'),"
    " ed AS (SELECT u AS src, v AS dst FROM al"
    "  UNION ALL SELECT v, u FROM al),"
    " reach(node, lab) AS (SELECT src, src FROM ed"
    "  UNION SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node),"
    " mapping AS (SELECT node, min(lab) AS canon FROM reach GROUP BY node),"
    " facts AS (SELECT * FROM base WHERE pred <> 'sameAs'),"
    " rewr AS (SELECT coalesce(ms.canon, facts.subj) AS subj, pred,"
    "  coalesce(mo.canon, facts.obj) AS obj FROM facts"
    "  LEFT JOIN mapping ms ON ms.node = facts.subj"
    "  LEFT JOIN mapping mo ON mo.node = facts.obj)"
    " SELECT DISTINCT subj, pred, obj FROM rewr"
)


def q_sitemap_urls(sf_dir: str):
    """Sitemap.xml URL extraction over synthesized urlset documents
    (lastmod present on 2 of 3 entries). Fully oracled: the SQL twin
    unnests <url> blocks with regexp_extract_all and re-extracts
    loc/lastmod per block (RE2 has no lookahead, so the twin uses the
    block-scoped form of the engine's pairing regex); sitemapindex
    handling is pinned by pytest."""
    from ..functions.robots import parse_sitemap_urls

    rows = []
    for h in range(10):
        entries = []
        for i in range(5):
            lm = (f"<lastmod> 2024-0{(i % 9) + 1}-1{h % 3} </lastmod>"
                  if i % 3 != 1 else "")
            entries.append(f"<url><loc> https://h{h}.test/p/{i} </loc>"
                           f"{lm}</url>")
        rows.append({"host": f"h{h}.test",
                     "sitemap_xml": ('<?xml version="1.0"?><urlset>'
                                     + "".join(entries) + "</urlset>")})
    sm = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = sm.map_batches(parse_sitemap_urls, batch_format="pyarrow")
    df = (out.to_pandas().sort_values(["host", "loc"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["sitemap_urls"] = q_sitemap_urls

ORACLES["sitemap_urls"] = (
    "WITH ent AS (SELECT h, i,"
    "  '<url><loc> https://h' || h || '.test/p/' || i || ' </loc>' ||"
    "  CASE WHEN i % 3 <> 1 THEN '<lastmod> 2024-0' || ((i % 9) + 1)"
    "   || '-1' || (h % 3) || ' </lastmod>' ELSE '' END || '</url>'"
    "  AS e FROM generate_series(0, 9) s(h)"
    "  CROSS JOIN generate_series(0, 4) t(i)),"
    " docs AS (SELECT 'h' || h || '.test' AS host,"
    "  '<?xml version=\"1.0\"?><urlset>'"
    "  || string_agg(e, '' ORDER BY i) || '</urlset>' AS xml"
    "  FROM ent GROUP BY h),"
    " blocks AS (SELECT host, unnest(regexp_extract_all(xml,"
    "  '(?is)<url>(.*?)</url>', 1)) AS b FROM docs)"
    " SELECT host, trim(regexp_extract(b,"
    "  '(?is)<loc>\\s*([^<]*?)\\s*</loc>', 1)) AS loc,"
    " nullif(trim(regexp_extract(b,"
    "  '(?is)<lastmod>\\s*([^<]*?)\\s*</lastmod>', 1)), '') AS lastmod"
    " FROM blocks"
)


_FOLD_WORDS = ["Héllo", "naïve", "Dvořák", "ÅNGSTRÖM", "ΣΟΦΌΣ",
               "piñata", "œuvre", "STRASSE", "Ćevapčići", "café",
               "plain"]


def q_unicode_fold(sf_dir: str):
    """Unicode case/accent folding (functions.normalize.fold_array)
    over a synthesized accented corpus: NFC + Unicode lower + combining
    -mark strip, byte-identical to DuckDB's
    strip_accents(lower(nfc_normalize(x))) — the twin uses exactly that
    expression over the same corpus, so the parity IS the oracle."""
    from ..functions.normalize import fold_text

    rows = [{"id": i,
             "text": (f"{_FOLD_WORDS[i % 11]} "
                      f"{_FOLD_WORDS[(i * 3 + 1) % 11]} item {i}")}
            for i in range(400)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = ds.map_batches(fold_text, batch_format="pyarrow")
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["unicode_fold"] = q_unicode_fold

ORACLES["unicode_fold"] = (
    "WITH w(ws) AS (SELECT ['Héllo','naïve','Dvořák','ÅNGSTRÖM',"
    "'ΣΟΦΌΣ','piñata','œuvre','STRASSE','Ćevapčići','café','plain']),"
    " corpus AS (SELECT i AS id,"
    "  ws[(i % 11) + 1] || ' ' || ws[((i * 3 + 1) % 11) + 1]"
    "   || ' item ' || i AS text"
    "  FROM generate_series(0, 399) s(i), w)"
    " SELECT id, text,"
    " strip_accents(lower(nfc_normalize(text))) AS text_folded"
    " FROM corpus"
)


def _table_corpus() -> pa.Table:
    rows = []
    for i in range(60):
        if i % 3 == 2:
            html = f"<html><p>no tables here {i}</p></html>"
        else:
            body = "".join(
                f"<tr><td><b>item {i}-{j}</b></td><td>{j * 7}</td></tr>"
                for j in range(i % 4 + 1))
            html = ('<html><table class="t"><tr><th>Name</th>'
                    '<th> Qty </th></tr>' + body + "</table>")
            if i % 5 == 0:
                html += f"<table><tr><td>solo {i}</td></tr></table>"
            html += "</html>"
        rows.append({"url": f"https://t{i}.test/", "html": html})
    return pa.Table.from_pylist(rows)


# shared corpus + nested-unnest cell extraction for the web-table twins
_TABLE_CELLS_SQL = (
    "WITH rws AS (SELECT i, string_agg('<tr><td><b>item ' || i || '-'"
    " || j || '</b></td><td>' || (j * 7) || '</td></tr>', '' ORDER BY j)"
    "  AS body FROM generate_series(0, 59) s(i)"
    "  JOIN generate_series(0, 3) t(j) ON j <= i % 4 GROUP BY i),"
    " pages AS (SELECT 'https://t' || i || '.test/' AS url,"
    "  CASE WHEN i % 3 = 2 THEN"
    "   '<html><p>no tables here ' || i || '</p></html>'"
    "  ELSE '<html><table class=\"t\"><tr><th>Name</th>"
    "<th> Qty </th></tr>' || body || '</table>'"
    "   || CASE WHEN i % 5 = 0 THEN '<table><tr><td>solo ' || i ||"
    "    '</td></tr></table>' ELSE '' END || '</html>' END AS html"
    "  FROM rws),"
    " tbl AS (SELECT url, unnest(regexp_extract_all(html,"
    "   '(?is)<table[^>]*>(.*?)</table>', 1)) AS tb,"
    "  unnest(range(len(regexp_extract_all(html,"
    "   '(?is)<table[^>]*>(.*?)</table>', 1)))) AS table_idx"
    "  FROM pages),"
    " trw AS (SELECT url, table_idx, unnest(regexp_extract_all(tb,"
    "   '(?is)<tr[^>]*>(.*?)</tr>', 1)) AS rw,"
    "  unnest(range(len(regexp_extract_all(tb,"
    "   '(?is)<tr[^>]*>(.*?)</tr>', 1)))) AS row_idx"
    "  FROM tbl),"
    " cells AS (SELECT url, CAST(table_idx AS INTEGER) AS table_idx,"
    "  CAST(row_idx AS INTEGER) AS row_idx,"
    "  CAST(ci AS INTEGER) AS col_idx,"
    "  regexp_matches(cell, '(?is)^<th') AS is_header,"
    "  trim(regexp_replace(regexp_replace(regexp_extract(cell,"
    "   '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1), '<[^>]*>', ' ', 'g'),"
    "   '\\s+', ' ', 'g')) AS cell_text"
    "  FROM (SELECT url, table_idx, row_idx,"
    "   unnest(regexp_extract_all(rw, '(?is)<t[dh][^>]*>.*?</t[dh]>'))"
    "    AS cell,"
    "   unnest(range(len(regexp_extract_all(rw,"
    "    '(?is)<t[dh][^>]*>.*?</t[dh]>')))) AS ci FROM trw))"
)


def q_web_tables(sf_dir: str):
    """HTML <table> extraction (structured.extract_tables) over a
    synthesized corpus (variable row counts, th headers, nested inline
    tags, multi-table and table-free pages). The twin regenerates the
    corpus in SQL and re-extracts with the SAME RE2 regexes via
    three nested unnest(regexp_extract_all(...)) levels."""
    from ..stages.structured import extract_tables

    ds = rd.from_arrow(_table_corpus()).repartition(3)
    out = ds.map_batches(extract_tables, batch_format="pyarrow")
    df = (out.to_pandas()
          .sort_values(["url", "table_idx", "row_idx", "col_idx"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["web_tables"] = q_web_tables

ORACLES["web_tables"] = (
    _TABLE_CELLS_SQL
    + " SELECT url, table_idx, row_idx, col_idx, is_header, cell_text"
      " FROM cells"
)


def q_web_table_records(sf_dir: str):
    """Header-paired table records (structured.table_records composed
    with extract_tables inside ONE map_batches so a page's cells never
    split across batch boundaries): body cells join their table's
    first header row by column position, missing headers fall back to
    col_<idx>. Twin: LEFT JOIN of the cells CTE onto its header
    subset."""
    from ..stages.structured import extract_tables, table_records

    ds = rd.from_arrow(_table_corpus()).repartition(3)
    out = ds.map_batches(lambda b: table_records(extract_tables(b)),
                         batch_format="pyarrow")
    df = (out.to_pandas()
          .sort_values(["url", "table_idx", "row_idx", "col_name"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["web_table_records"] = q_web_table_records

ORACLES["web_table_records"] = (
    _TABLE_CELLS_SQL
    + ", hdr AS (SELECT url, table_idx, col_idx,"
      "  cell_text AS col_name FROM cells"
      "  WHERE is_header AND row_idx = 0)"
      " SELECT b.url, b.table_idx, b.row_idx,"
      " coalesce(h.col_name, 'col_' || b.col_idx) AS col_name,"
      " b.cell_text AS value"
      " FROM (SELECT * FROM cells WHERE NOT is_header) b"
      " LEFT JOIN hdr h ON h.url = b.url"
      "  AND h.table_idx = b.table_idx AND h.col_idx = b.col_idx"
)


def q_rdfs_infer_types(sf_dir: str):
    """RDFS subsumption materialization (graph.rdfs_infer_types) over
    a synthesized 3-ary class tree (29 subClassOf edges) + 200 typed
    instances + non-type facts: every instance fact fans out to its
    class's ancestors, originals kept, exact-deduped. Twin: recursive
    ancestor CTE + join + UNION ALL + DISTINCT."""
    from ..stages.graph import rdfs_infer_types

    rows = []
    for k in range(1, 30):
        rows.append({"subj": f"c{k}", "pred": "subClassOf",
                     "obj": f"c{k // 3}"})
    for i in range(200):
        rows.append({"subj": f"x{i}", "pred": "rdf:type",
                     "obj": f"c{i % 30}"})
        if i % 4 == 0:
            rows.append({"subj": f"x{i}", "pred": "knows",
                         "obj": f"x{(i + 1) % 200}"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = rdfs_infer_types(ds, nb=8)
    df = (out.to_pandas().sort_values(["subj", "pred", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["rdfs_infer_types"] = q_rdfs_infer_types

ORACLES["rdfs_infer_types"] = (
    "WITH RECURSIVE base AS ("
    " SELECT 'c' || k AS subj, 'subClassOf' AS pred,"
    "  'c' || (k // 3) AS obj FROM generate_series(1, 29) s(k)"
    " UNION ALL SELECT 'x' || i, 'rdf:type', 'c' || (i % 30)"
    "  FROM generate_series(0, 199) t(i)"
    " UNION ALL SELECT 'x' || i, 'knows', 'x' || ((i + 1) % 200)"
    "  FROM generate_series(0, 199) t(i) WHERE i % 4 = 0),"
    " sub AS (SELECT subj AS c, obj AS p FROM base"
    "  WHERE pred = 'subClassOf'),"
    " anc(node, a) AS (SELECT c, p FROM sub"
    "  UNION SELECT an.node, s.p FROM anc an JOIN sub s"
    "   ON s.c = an.a),"
    " inferred AS (SELECT b.subj, 'rdf:type' AS pred, an.a AS obj"
    "  FROM base b JOIN anc an ON an.node = b.obj"
    "  WHERE b.pred = 'rdf:type')"
    " SELECT DISTINCT subj, pred, obj FROM"
    " (SELECT * FROM base UNION ALL SELECT * FROM inferred)"
)


def q_jaccard_join_docs(sf_dir: str):
    """Exact set-similarity self-join with prefix filtering
    (dedup.jaccard_similarity_join, AllPairs/PPJoin family) at
    t=0.5 over a synthesized sliding-vocabulary corpus (150 docs,
    6-11 distinct tokens each, heavy pairwise overlap). The twin is
    the brute-force O(n^2) token self-join — tractable at oracle
    scale, which is exactly what the prefix filter avoids at real
    scale; scores are the same int-operand float64 division on both
    sides."""
    from ..stages.dedup import jaccard_similarity_join

    rows = [{"doc_id": i,
             "text": " ".join(f"w{(i * 7 + j) % 50}"
                              for j in range(6 + i % 6))}
            for i in range(150)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = jaccard_similarity_join(ds, 0.5, nb=8)
    df = (out.to_pandas().sort_values(["id_a", "id_b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["jaccard_join_docs"] = q_jaccard_join_docs

ORACLES["jaccard_join_docs"] = (
    "WITH docs AS (SELECT i AS id,"
    "  string_agg('w' || ((i * 7 + j) % 50), ' ' ORDER BY j) AS text"
    "  FROM generate_series(0, 149) s(i)"
    "  JOIN generate_series(0, 10) t(j) ON j < 6 + (i % 6)"
    "  GROUP BY i),"
    " tok AS (SELECT DISTINCT id, unnest(string_split(text, ' ')) AS w"
    "  FROM docs),"
    " sz AS (SELECT id, count(*) AS n FROM tok GROUP BY id),"
    " ix AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c"
    "  FROM tok a JOIN tok b ON a.w = b.w AND a.id < b.id"
    "  GROUP BY 1, 2)"
    " SELECT i.id_a, i.id_b, sa.n AS size_a, sb.n AS size_b,"
    " c AS inter, c * 1.0 / (sa.n + sb.n - c) AS jaccard"
    " FROM ix i JOIN sz sa ON sa.id = i.id_a"
    " JOIN sz sb ON sb.id = i.id_b"
    " WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5"
)


def q_page_features(sf_dir: str):
    """Structural page-quality features (structured.page_features)
    over a synthesized corpus with varying paragraph/link/script/img
    mixes and empty pages. Integer-only outputs; the twin replays the
    same RE2 patterns via length(regexp_extract_all(...))."""
    from ..stages.structured import page_features

    rows = []
    for i in range(80):
        if i % 7 == 6:
            html = ""
        else:
            html = "<html>" + "".join(
                f"<p>Para {i}-{j} with <b>bold</b> text</p>"
                for j in range(i % 5 + 1))
            if i % 3 == 0:
                html += f'<a href="https://l{i}.test">link {i}</a>'
            if i % 4 == 1:
                html += "<script>var x=1;</script>"
            if i % 2 == 0:
                html += '<img src="i.png">'
            html += "</html>"
        rows.append({"url": f"https://p{i}.test/", "html": html})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = ds.map_batches(page_features, batch_format="pyarrow")
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["page_features"] = q_page_features

ORACLES["page_features"] = (
    "WITH paras AS (SELECT i, string_agg('<p>Para ' || i || '-' || j"
    " || ' with <b>bold</b> text</p>', '' ORDER BY j) AS body"
    "  FROM generate_series(0, 79) s(i)"
    "  JOIN generate_series(0, 4) t(j) ON j <= i % 5 GROUP BY i),"
    " pages AS (SELECT 'https://p' || i || '.test/' AS url,"
    "  CASE WHEN i % 7 = 6 THEN '' ELSE"
    "   '<html>' || body"
    "   || CASE WHEN i % 3 = 0 THEN '<a href=\"https://l' || i ||"
    "    '.test\">link ' || i || '</a>' ELSE '' END"
    "   || CASE WHEN i % 4 = 1 THEN '<script>var x=1;</script>'"
    "    ELSE '' END"
    "   || CASE WHEN i % 2 = 0 THEN '<img src=\"i.png\">' ELSE '' END"
    "   || '</html>' END AS html FROM paras)"
    " SELECT url, CAST(length(html) AS INTEGER) AS html_chars,"
    " CAST(length(trim(regexp_replace(regexp_replace(html,"
    "  '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))) AS INTEGER)"
    "  AS text_chars,"
    " CAST(len(regexp_extract_all(html, '<[A-Za-z][^>]*>'))"
    "  AS INTEGER) AS n_tags,"
    " CAST(len(regexp_extract_all(html, '(?i)<a[\\s>]'))"
    "  AS INTEGER) AS n_links,"
    " CAST(len(regexp_extract_all(html, '(?i)<script[\\s>]'))"
    "  AS INTEGER) AS n_scripts,"
    " CAST(len(regexp_extract_all(html, '(?i)<img[\\s>]'))"
    "  AS INTEGER) AS n_images,"
    " CAST(len(regexp_extract_all(html, '(?i)<p[\\s>]'))"
    "  AS INTEGER) AS n_paragraphs"
    " FROM pages"
)


def q_html_entities(sf_dir: str):
    """HTML entity decoding (functions.textextract.decode_html_
    entities) over a synthesized corpus with named, decimal and hex
    entities, unknown entities, and the double-escaped ``&amp;lt;``
    single-pass case. Twin: nested replace() chain with chr() codes,
    amp-replacement outermost — the same one-logical-pass ordering
    the engine enforces."""
    from ..functions.textextract import decode_html_entities

    rows = []
    for i in range(100):
        t = f"Row {i} &amp; &lt;b&gt; caf&#233; &quot;x&quot;"
        if i % 3 == 0:
            t += " &#x41;lpha&hellip;"
        if i % 4 == 1:
            t += " double &amp;lt; pass"
        if i % 5 == 2:
            t += " &unknown; kept"
        rows.append({"id": i, "text": t})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = ds.map_batches(decode_html_entities, batch_format="pyarrow")
    df = out.to_pandas().sort_values("id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["html_entities"] = q_html_entities

# the amp replace wraps the whole chain (outermost) so the twin has
# the same one-logical-pass ordering as the engine:
ORACLES["html_entities"] = (
    "WITH corpus AS (SELECT i AS id,"
    "  'Row ' || i || ' &amp; &lt;b&gt; caf&#233; &quot;x&quot;'"
    "  || CASE WHEN i % 3 = 0 THEN ' &#x41;lpha&hellip;'"
    "   ELSE '' END"
    "  || CASE WHEN i % 4 = 1 THEN ' double &amp;lt; pass'"
    "   ELSE '' END"
    "  || CASE WHEN i % 5 = 2 THEN ' &unknown; kept' ELSE '' END"
    "  AS text FROM generate_series(0, 99) s(i)),"
    " pre AS (SELECT id, text,"
    "  replace(replace(replace(replace(replace(replace(text,"
    "   '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
    "   '&#233;', chr(233)), '&#x41;', chr(65)),"
    "   '&hellip;', chr(8230)) AS p FROM corpus)"
    " SELECT id, text, replace(p, '&amp;', '&') AS text_decoded"
    " FROM pre"
)


def q_bgp_optional_match(sf_dir: str):
    """BGP with OPTIONAL groups and FILTERs (graph.match_bgp): the
    required block binds employed Persons, one OPTIONAL binds their
    email (sparse), a second OPTIONAL sub-group binds the employer's
    city (missing for O15-O19), and FILTERs drop one employer plus a
    regex constraint. Twin: LEFT JOINs + WHERE over the regenerated
    KG."""
    from ..stages.graph import match_bgp

    rows = []
    for i in range(500):
        rows.append({"subj": f"P{i}", "pred": "worksFor",
                     "obj": f"O{i % 20}"})
        rows.append({"subj": f"P{i}", "pred": "@type",
                     "obj": "Bot" if i % 3 == 1 else "Person"})
        if i % 4 == 0:
            rows.append({"subj": f"P{i}", "pred": "hasEmail",
                         "obj": f"p{i}@ex.test"})
    for j in range(15):  # O15..O19 stay unlocated -> null city
        rows.append({"subj": f"O{j}", "pred": "locatedIn",
                     "obj": f"C{j % 7}"})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = match_bgp(
        triples,
        [("?p", "worksFor", "?o"), ("?p", "@type", "Person")],
        optional=[("?p", "hasEmail", "?e"),
                  [("?o", "locatedIn", "?c")]],
        filters=[("?o", "!=", "O3"), ("?p", "regex", "^P[0-9]+$")],
        nb=8)
    df = (out.to_pandas().sort_values(["p", "o", "e", "c"])
          .reset_index(drop=True)[["p", "o", "e", "c"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["bgp_optional_match"] = q_bgp_optional_match

ORACLES["bgp_optional_match"] = (
    "WITH t AS ("
    " SELECT 'P' || i AS subj, 'worksFor' AS pred,"
    "  'O' || (i % 20) AS obj FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'P' || i, '@type',"
    "  CASE WHEN i % 3 = 1 THEN 'Bot' ELSE 'Person' END"
    "  FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'P' || i, 'hasEmail', 'p' || i || '@ex.test'"
    "  FROM generate_series(0, 499) s(i) WHERE i % 4 = 0"
    " UNION ALL SELECT 'O' || j, 'locatedIn', 'C' || (j % 7)"
    "  FROM generate_series(0, 14) s(j))"
    " SELECT w.subj AS p, w.obj AS o, e.obj AS e, l.obj AS c"
    " FROM t w"
    " JOIN t ty ON ty.subj = w.subj AND ty.pred = '@type'"
    "  AND ty.obj = 'Person'"
    " LEFT JOIN t e ON e.subj = w.subj AND e.pred = 'hasEmail'"
    " LEFT JOIN t l ON l.subj = w.obj AND l.pred = 'locatedIn'"
    " WHERE w.pred = 'worksFor' AND w.obj <> 'O3'"
    "  AND regexp_matches(w.subj, '^P[0-9]+$')"
)


def q_crawl_schedule(sf_dir: str):
    """The full per-cycle crawl-scheduling composition: frontier
    discovery (extract_links -> distinct -> anti-join crawled set),
    RFC-9309 robots filtering (host b blocks /hub/, host c blocks
    /hub/ but re-allows /hub/3 via longest-match), then a per-host
    politeness quota (cap_per_key n=5, url order). Twin: EXCEPT +
    packed-score longest-match + row_number() OVER host."""
    from ..functions.robots import parse_robots_rules, robots_filter
    from ..functions.urls import extract_links
    from ..stages.canonicalize import dedup_exact
    from ..stages.join import shuffle_hash_join
    from ..stages.windows import cap_per_key

    hosts = ["a.crawl.test", "b.crawl.test", "c.crawl.test"]
    rows = []
    for i in range(300):
        h = hosts[i % 3]
        nxt = f"https://{h}/p/{(i + 3) % 450}"
        hub = f"https://{h}/hub/{i % 7}"
        dep = f"https://{h}/p/{i + 600}"  # always-uncrawled deep link
        rows.append({
            "url": f"https://{h}/p/{i}",
            "html": (f'<a href="{nxt}">next</a>'
                     f"<a href='{hub}'>hub</a>"
                     f'<a href="{dep}">deep</a>'
                     f'<a href="/rel/{i}">rel</a>'),
        })
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    robots = rd.from_arrow(pa.Table.from_pylist([
        {"host": "a.crawl.test",
         "robots_txt": "User-agent: *\nDisallow:\n"},
        {"host": "b.crawl.test",
         "robots_txt": "User-agent: *\nDisallow: /hub/\n"},
        {"host": "c.crawl.test",
         "robots_txt": ("User-agent: *\nDisallow: /hub/\n"
                        "Allow: /hub/3\n")},
    ]))
    rules = robots.map_batches(parse_robots_rules,
                               batch_format="pyarrow").materialize()

    seen = pages.map_batches(
        lambda b: pa.table({"link": b.column("url")}),
        batch_format="pyarrow")
    links = (pages.map_batches(extract_links, batch_format="pyarrow")
             .map_batches(lambda b: b.select(["link"]),
                          batch_format="pyarrow"))
    frontier = shuffle_hash_join(
        dedup_exact(links, ["link"], nb=8), seen,
        on=["link"], how="anti", nb=8).map_batches(
        lambda b: b.rename_columns(["url"]), batch_format="pyarrow")
    allowed = robots_filter(frontier, rules, nb=8)
    sched = cap_per_key(allowed, key_col="host", order_cols=["url"],
                        n=5, nb=8)
    df = (sched.to_pandas()[["host", "url"]]
          .sort_values(["host", "url"]).reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["crawl_schedule"] = q_crawl_schedule

ORACLES["crawl_schedule"] = (
    "WITH hosts AS (SELECT ['a.crawl.test','b.crawl.test',"
    "'c.crawl.test'] AS h),"
    " pages AS (SELECT i, 'https://' || h[(i % 3) + 1] || '/p/' || i"
    "  AS url,"
    "  '<a href=\"https://' || h[(i % 3) + 1] || '/p/' || ((i + 3) % 450)"
    "  || '\">next</a><a href=''https://' || h[(i % 3) + 1] || '/hub/'"
    "  || (i % 7) || '''>hub</a><a href=\"https://' || h[(i % 3) + 1]"
    "  || '/p/' || (i + 600) || '\">deep</a>"
    "<a href=\"/rel/' || i || '\">rel</a>'"
    "  AS html FROM generate_series(0, 299) t(i) CROSS JOIN hosts),"
    " links AS (SELECT DISTINCT unnest(regexp_extract_all(html,"
    "  '(?i)<a\\s[^>]*href\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) AS link"
    "  FROM pages),"
    " abs_links AS (SELECT link FROM links"
    "  WHERE regexp_matches(link, '^[A-Za-z][A-Za-z0-9+.\\-]*://')),"
    " frontier AS (SELECT link AS url FROM abs_links"
    "  EXCEPT SELECT url FROM pages),"
    " f2 AS (SELECT url,"
    "  regexp_extract(url, '^https://([^/]+)', 1) AS host,"
    "  regexp_replace(url, '^https://[^/]+', '') AS path"
    "  FROM frontier),"
    " rules AS (SELECT 'b.crawl.test' AS host, FALSE AS allow,"
    "  '/hub/' AS prefix"
    "  UNION ALL SELECT 'c.crawl.test', FALSE, '/hub/'"
    "  UNION ALL SELECT 'c.crawl.test', TRUE, '/hub/3'),"
    " scored AS (SELECT url, f2.host,"
    "  CASE WHEN prefix IS NULL THEN -1"
    "   WHEN starts_with(path, prefix)"
    "    THEN 2 * length(prefix) + CAST(allow AS INTEGER)"
    "   ELSE -2 + CAST(allow AS INTEGER) END AS pack"
    "  FROM f2 LEFT JOIN rules ON f2.host = rules.host),"
    " verdict AS (SELECT url, host,"
    "  max(pack) < 0 OR max(pack) % 2 = 1 AS allowed"
    "  FROM scored GROUP BY 1, 2),"
    " ranked AS (SELECT host, url,"
    "  row_number() OVER (PARTITION BY host ORDER BY url) AS rn"
    "  FROM verdict WHERE allowed)"
    " SELECT host, url FROM ranked WHERE rn <= 5"
)


def q_script_profile(sf_dir: str):
    """Unicode script census (textstats.script_profile) over a
    synthesized multilingual corpus (Latin/Cyrillic/Greek/Han/Arabic
    word mixes, digit-only and tie rows). The twin counts the same
    RE2 \\p{Script} classes and replays the first-max-wins dominant
    CASE chain."""
    from ..stages.textstats import script_profile

    words = ["hello world", "привет мир", "ωμέγα άλφα", "漢字文档",
             "مرحبا سلام", "123 456"]
    rows = [{"doc_id": i,
             "text": f"{words[i % 6]} {words[(i * 2 + 1) % 6]} #{i}"}
            for i in range(300)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = ds.map_batches(script_profile, batch_format="pyarrow")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["script_profile"] = q_script_profile

ORACLES["script_profile"] = (
    "WITH w(ws) AS (SELECT ['hello world','привет мир','ωμέγα άλφα',"
    "'漢字文档','مرحبا سلام','123 456']),"
    " corpus AS (SELECT i AS doc_id,"
    "  ws[(i % 6) + 1] || ' ' || ws[((i * 2 + 1) % 6) + 1]"
    "   || ' #' || i AS text"
    "  FROM generate_series(0, 299) s(i), w),"
    " cnt AS (SELECT doc_id,"
    "  CAST(len(regexp_extract_all(text, '\\p{Latin}')) AS INTEGER)"
    "   AS n_latin,"
    "  CAST(len(regexp_extract_all(text, '\\p{Cyrillic}')) AS INTEGER)"
    "   AS n_cyrillic,"
    "  CAST(len(regexp_extract_all(text, '\\p{Greek}')) AS INTEGER)"
    "   AS n_greek,"
    "  CAST(len(regexp_extract_all(text, '\\p{Han}')) AS INTEGER)"
    "   AS n_han,"
    "  CAST(len(regexp_extract_all(text, '\\p{Arabic}')) AS INTEGER)"
    "   AS n_arabic FROM corpus)"
    " SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han, n_arabic,"
    " CASE WHEN n_latin + n_cyrillic + n_greek + n_han + n_arabic = 0"
    "  THEN 'none'"
    " WHEN n_latin >= n_cyrillic AND n_latin >= n_greek"
    "  AND n_latin >= n_han AND n_latin >= n_arabic THEN 'latin'"
    " WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_han"
    "  AND n_cyrillic >= n_arabic THEN 'cyrillic'"
    " WHEN n_greek >= n_han AND n_greek >= n_arabic THEN 'greek'"
    " WHEN n_han >= n_arabic THEN 'han' ELSE 'arabic' END"
    "  AS dominant_script FROM cnt"
)


def q_property_path(sf_dir: str):
    """SPARQL property-path ``follows+`` (one-predicate transitive
    closure) over STRING KG terms — transitive_closure now runs
    directly on string nodes (no int re-keying), so the composition
    is filter-on-pred -> closure. Corpus: 20 disjoint 10-hop follow
    chains + 'likes' noise edges. Twin: recursive CTE on strings."""
    from ..stages.graph import transitive_closure

    rows = []
    for i in range(200):
        if i % 10 != 9:
            rows.append({"subj": f"E{i}", "pred": "follows",
                         "obj": f"E{i + 1}"})
        rows.append({"subj": f"E{i}", "pred": "likes",
                     "obj": f"E{(i * 3) % 200}"})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    edges = triples.map_batches(
        lambda t: t.filter(pc.equal(t.column("pred"), "follows"))
        .select(["subj", "obj"])
        .rename_columns(["child", "parent"]),
        batch_format="pyarrow")
    out = transitive_closure(edges, nb=8)
    df = (out.to_pandas().sort_values(["node", "anc"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["property_path"] = q_property_path

ORACLES["property_path"] = (
    "WITH RECURSIVE base AS ("
    " SELECT 'E' || i AS subj, 'follows' AS pred, 'E' || (i + 1) AS obj"
    "  FROM generate_series(0, 199) s(i) WHERE i % 10 <> 9"
    " UNION ALL SELECT 'E' || i, 'likes', 'E' || ((i * 3) % 200)"
    "  FROM generate_series(0, 199) s(i)),"
    " e AS (SELECT subj AS c, obj AS p FROM base"
    "  WHERE pred = 'follows'),"
    " cl(node, anc) AS (SELECT c, p FROM e"
    "  UNION SELECT cl.node, e.p FROM cl JOIN e ON e.c = cl.anc)"
    " SELECT node, anc FROM cl"
)


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking (dedup.cdc_chunk_docs, gear rolling
    hash) over the documents table — byte-offset spans + stable
    chunk hashes, the storage-dedup primitive. Rows-only by nature
    (boundaries are not SQL-expressible); byte-exact reconstruction
    is oracled separately by cdc_reconstruct and shift-tolerance is
    pinned by pytest."""
    from ..stages.dedup import cdc_chunk_docs

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        cdc_chunk_docs, batch_format="pyarrow")
    df = (ds.to_pandas().sort_values(["doc_id", "chunk_idx"])
          .reset_index(drop=True).drop(columns=["chunk_bytes"]))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["cdc_chunks"] = q_cdc_chunks


def q_cdc_reconstruct(sf_dir: str):
    """CDC losslessness oracle: chunk every document, re-join the
    chunk BYTES in chunk_idx order, decode — must equal the original
    text byte-for-byte (multibyte-safe because chunks are bytes).
    Twin: the identity projection with octet_length."""
    from ..stages.dedup import cdc_chunk_docs

    def rebuild(b: pa.Table) -> pa.Table:
        chunks = cdc_chunk_docs(b)
        df = chunks.to_pandas().sort_values(["chunk_idx"])
        agg = (df.groupby("doc_id", sort=False)["chunk_bytes"]
               .apply(lambda xs: b"".join(xs)))
        ids = b.column("doc_id").to_pylist()
        txt = [agg.get(i, b"").decode("utf-8") for i in ids]
        nb = [len(agg.get(i, b"")) for i in ids]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "text_rebuilt": pa.array(txt, pa.string()),
            "n_bytes": pa.array(nb, pa.int64()),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rebuild, batch_format="pyarrow")
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["cdc_reconstruct"] = q_cdc_reconstruct

ORACLES["cdc_reconstruct"] = (
    "SELECT doc_id, coalesce(text, '') AS text_rebuilt,"
    " CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes"
    " FROM documents"
)


def q_fold_dedup_docs(sf_dir: str):
    """Cross-lingual exact dedup: documents keyed by their FOLDED text
    (unicode_fold kernel — NFC + lower + accent strip), each fold
    class keeping its minimum doc_id. Twin: row_number() OVER
    (PARTITION BY strip_accents(lower(nfc_normalize(text)))) = 1 —
    the DuckDB expression the fold kernel is pinned byte-identical
    to."""
    from ..functions.normalize import fold_array

    def keyed(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "fold_key": fold_array(pc.fill_null(b.column("text"), "")),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow")
    kept = groupby_argmax(ds, ["fold_key"], ["doc_id"], [True], nb=8)
    df = (kept.to_pandas()[["doc_id", "fold_key"]]
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["fold_dedup_docs"] = q_fold_dedup_docs

ORACLES["fold_dedup_docs"] = (
    "WITH keyed AS (SELECT doc_id,"
    "  strip_accents(lower(nfc_normalize(coalesce(text, ''))))"
    "   AS fold_key FROM documents)"
    " SELECT min(doc_id) AS doc_id, fold_key"
    " FROM keyed GROUP BY fold_key"
)


def q_kg_export_turtle(sf_dir: str):
    """Turtle interchange loop: synthesize triples (prefix-
    compressible URIs, literals with quotes/newlines/backslashes,
    non-compressible odd IRIs), WRITE prefix-compressed .ttl blocks
    (subject-grouped `s p o ; p o .` lines), READ them back with the
    same prefix map, and aggregate per pred. Equality with the
    never-serialized twin proves compression + escaping + the
    subject-group parse are lossless."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count

    from ..sources.ntriples import read_turtle, write_turtle

    pfx = {"ent": "https://kg.test/p/", "org": "https://kg.test/org/",
           "v": "https://kg.test/v/"}
    rows = []
    for i in range(400):
        rows.append({"subj": f"https://kg.test/p/{i}",
                     "pred": "https://kg.test/v/worksFor",
                     "obj": f"https://kg.test/org/{i % 20}",
                     "obj_kind": "uri"})
        rows.append({"subj": f"https://kg.test/p/{i}",
                     "pred": "https://kg.test/v/name",
                     "obj": f'N"{i}"\nend\\', "obj_kind": "string"})
        if i % 7 == 0:  # space in IRI: must stay <bracketed>
            rows.append({"subj": f"https://kg.test/p/{i}",
                         "pred": "https://kg.test/v/sameAs",
                         "obj": f"https://odd.test/x y/{i}",
                         "obj_kind": "uri"})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out_dir = tempfile.mkdtemp(prefix="ttlq_")
    try:
        write_turtle(triples, out_dir, pfx, obj_kind_col="obj_kind")
        back = read_turtle(out_dir, pfx)
        agg = (back.groupby(["pred", "obj"])
               .aggregate(Count(alias_name="n_occ")))
        df = agg.to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    g = (df.groupby(["pred"], sort=True)
         .agg(n=("n_occ", "sum"), n_distinct_obj=("obj", "nunique"),
              min_obj=("obj", "min"))
         .reset_index())
    g["n"] = g["n"].astype("int64")
    g["n_distinct_obj"] = g["n_distinct_obj"].astype("int64")
    return pa.Table.from_pandas(g, preserve_index=False)


QUERIES["kg_export_turtle"] = q_kg_export_turtle

ORACLES["kg_export_turtle"] = (
    "WITH t AS ("
    " SELECT 'https://kg.test/p/' || i AS subj,"
    "  'https://kg.test/v/worksFor' AS pred,"
    "  'https://kg.test/org/' || (i % 20) AS obj"
    "  FROM generate_series(0, 399) s(i)"
    " UNION ALL SELECT 'https://kg.test/p/' || i,"
    "  'https://kg.test/v/name',"
    "  'N\"' || i || '\"' || chr(10) || 'end\\'"
    "  FROM generate_series(0, 399) s(i)"
    " UNION ALL SELECT 'https://kg.test/p/' || i,"
    "  'https://kg.test/v/sameAs', 'https://odd.test/x y/' || i"
    "  FROM generate_series(0, 399) s(i) WHERE i % 7 = 0)"
    " SELECT pred, CAST(count(*) AS BIGINT) AS n,"
    " CAST(count(DISTINCT obj) AS BIGINT) AS n_distinct_obj,"
    " min(obj) AS min_obj FROM t GROUP BY 1"
)


def q_shacl_validate(sf_dir: str):
    """SHACL-lite shape validation (graph.validate_shapes) over a
    synthesized KG with planted violations: Person shape 0 requires
    exactly one worksFor edge whose object is a typed Organization;
    shape 1 requires a name matching ^name. Fully oracled: the SQL
    twin regenerates the corpus with generate_series and computes the
    same cardinality/pattern/membership violations."""
    from ..stages.graph import validate_shapes

    rows = []
    for i in range(300):
        rows.append({"subj": f"P{i}", "pred": "@type", "obj": "Person"})
        if i % 5 != 0:
            rows.append({"subj": f"P{i}", "pred": "worksFor",
                         "obj": f"O{i % 20}"})
        if i % 7 == 0:
            rows.append({"subj": f"P{i}", "pred": "worksFor",
                         "obj": f"O{(i + 1) % 20}"})
        if i % 13 != 0:
            rows.append({"subj": f"P{i}", "pred": "name",
                         "obj": (f"bad{i}" if i % 11 == 0
                                 else f"name{i}")})
    for j in range(15):  # O15..O19 stay untyped → obj_class violations
        rows.append({"subj": f"O{j}", "pred": "@type",
                     "obj": "Organization"})
    triples = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = validate_shapes(triples, [
        {"target_class": "Person", "pred": "worksFor", "min_count": 1,
         "max_count": 1, "obj_class": "Organization"},
        {"target_class": "Person", "pred": "name", "min_count": 1,
         "pattern": "^name"},
    ], nb=8)
    df = (out.to_pandas()
          .sort_values(["shape_id", "constraint", "subj", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["shacl_validate"] = q_shacl_validate

ORACLES["shacl_validate"] = (
    "WITH t AS ("
    " SELECT 'P' || i AS subj, '@type' AS pred, 'Person' AS obj"
    "  FROM generate_series(0, 299) s(i)"
    " UNION ALL SELECT 'P' || i, 'worksFor', 'O' || (i % 20)"
    "  FROM generate_series(0, 299) s(i) WHERE i % 5 <> 0"
    " UNION ALL SELECT 'P' || i, 'worksFor', 'O' || ((i + 1) % 20)"
    "  FROM generate_series(0, 299) s(i) WHERE i % 7 = 0"
    " UNION ALL SELECT 'P' || i, 'name',"
    "  CASE WHEN i % 11 = 0 THEN 'bad' || i ELSE 'name' || i END"
    "  FROM generate_series(0, 299) s(i) WHERE i % 13 <> 0"
    " UNION ALL SELECT 'O' || j, '@type', 'Organization'"
    "  FROM generate_series(0, 14) s(j)),"
    " targets AS (SELECT DISTINCT subj FROM t"
    "  WHERE pred = '@type' AND obj = 'Person'),"
    " orgm AS (SELECT DISTINCT subj FROM t"
    "  WHERE pred = '@type' AND obj = 'Organization'),"
    " wf AS (SELECT subj, obj FROM t WHERE pred = 'worksFor'),"
    " nm AS (SELECT subj, obj FROM t WHERE pred = 'name'),"
    " cwf AS (SELECT targets.subj, count(wf.obj) AS n FROM targets"
    "  LEFT JOIN wf USING (subj) GROUP BY 1),"
    " cnm AS (SELECT targets.subj, count(nm.obj) AS n FROM targets"
    "  LEFT JOIN nm USING (subj) GROUP BY 1)"
    " SELECT CAST(0 AS BIGINT) AS shape_id, subj,"
    "  'min_count' AS \"constraint\", CAST(NULL AS VARCHAR) AS obj, n"
    "  FROM cwf WHERE n < 1"
    " UNION ALL SELECT 0, subj, 'max_count', NULL, n"
    "  FROM cwf WHERE n > 1"
    " UNION ALL SELECT 0, wf.subj, 'obj_class', wf.obj,"
    "  CAST(1 AS BIGINT) FROM wf JOIN targets USING (subj)"
    "  WHERE wf.obj NOT IN (SELECT subj FROM orgm)"
    " UNION ALL SELECT 1, subj, 'min_count', NULL, n"
    "  FROM cnm WHERE n < 1"
    " UNION ALL SELECT 1, nm.subj, 'pattern', nm.obj, 1"
    "  FROM nm JOIN targets USING (subj)"
    "  WHERE NOT regexp_matches(nm.obj, '^name')"
)


def q_redirect_resolve(sf_dir: str):
    """Redirect-chain resolution (graph.resolve_redirects, pointer
    doubling) over a synthesized redirect graph: a 50-edge chain
    (resolvable only from depth ≤ 16), five 3-cycles, a two-hop
    hub/terminal fan, and duplicate-src rows collapsing to the min
    dst. Fully oracled: the SQL twin regenerates the edges and walks
    chains with a bounded recursive CTE."""
    from ..stages.graph import resolve_redirects

    rows = []
    for i in range(50):
        rows.append({"src": f"c{i}", "dst": f"c{i + 1}"})
    for k in range(5):
        for j in range(3):
            rows.append({"src": f"x{k}_{j}", "dst": f"x{k}_{(j + 1) % 3}"})
    for i in range(200):
        rows.append({"src": f"r{i}", "dst": f"h{i % 10}"})
    for j in range(10):
        rows.append({"src": f"h{j}", "dst": f"t{j % 3}"})
    for i in range(10):
        rows.append({"src": f"d{i}", "dst": "t0"})
        rows.append({"src": f"d{i}", "dst": f"a{i}"})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = resolve_redirects(edges, max_hops=16, nb=8)
    df = out.to_pandas().sort_values("src").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["redirect_resolve"] = q_redirect_resolve

ORACLES["redirect_resolve"] = (
    "WITH RECURSIVE e0 AS ("
    " SELECT 'c' || i AS src, 'c' || (i + 1) AS dst"
    "  FROM generate_series(0, 49) s(i)"
    " UNION ALL SELECT 'x' || k || '_' || j,"
    "  'x' || k || '_' || ((j + 1) % 3)"
    "  FROM generate_series(0, 4) s(k), generate_series(0, 2) q(j)"
    " UNION ALL SELECT 'r' || i, 'h' || (i % 10)"
    "  FROM generate_series(0, 199) s(i)"
    " UNION ALL SELECT 'h' || j, 't' || (j % 3)"
    "  FROM generate_series(0, 9) s(j)"
    " UNION ALL SELECT 'd' || i, 't0' FROM generate_series(0, 9) s(i)"
    " UNION ALL SELECT 'd' || i, 'a' || i"
    "  FROM generate_series(0, 9) s(i)),"
    " e AS (SELECT src, min(dst) AS dst FROM e0 GROUP BY src),"
    " walk(src, cur, hops) AS ("
    "  SELECT src, dst, 1 FROM e"
    "  UNION ALL SELECT w.src, e.dst, w.hops + 1 FROM walk w"
    "   JOIN e ON w.cur = e.src WHERE w.hops < 17),"
    " term AS (SELECT src, cur, hops FROM walk"
    "  WHERE hops <= 16 AND cur NOT IN (SELECT src FROM e))"
    " SELECT e.src, term.cur AS final,"
    "  CAST(term.hops AS BIGINT) AS hops,"
    "  CASE WHEN term.src IS NULL THEN 'unresolved'"
    "   ELSE 'resolved' END AS status"
    " FROM e LEFT JOIN term ON e.src = term.src"
)


def q_url_canonical(sf_dir: str):
    """URL canonicalization (urls.canonicalize_url) over a synthesized
    tricky-URL corpus: case-folded scheme/host, fragment strip,
    default/empty-port drop, bare-authority '/' path, and passthrough
    forms (non-URLs, userinfo, IPv6). Fully oracled: the SQL twin
    rebuilds the corpus and replays the SAME RE2 regex chain in
    DuckDB."""
    from ..functions.urls import canonicalize_url

    def mk(i: int) -> str:
        k = i % 5
        return [
            f"HTTP://EX{k}.COM:80/path{i}?q={i}#frag{i}",
            f"https://Sub.Ex{k}.com:443/",
            f"http://ex{k}.com:8080/p{i}",
            f"HTTPS://ex{k}.COM",
            f"http://ex{k}.com:/x{i}",
            f"not a url {i}",
            f"ftp://Files.Ex{k}.org/f{i}",
            f"http://ex{k}.com/P{i}?#tail",
        ][i % 8]

    urls = pa.table({"url": pa.array([mk(i) for i in range(200)])})

    def fn(b: pa.Table) -> pa.Table:
        return b.append_column("canon",
                               canonicalize_url(b.column("url")))

    out = (rd.from_arrow(urls).repartition(4)
           .map_batches(fn, batch_format="pyarrow"))
    df = out.to_pandas().sort_values(["url", "canon"]) \
        .reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["url_canonical"] = q_url_canonical

_URL_CANON_RE = (r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
                 r"([^/?#:@]*)(?::([0-9]*))?([/?].*)?$")

ORACLES["url_canonical"] = (
    "WITH u AS (SELECT CASE i % 8"
    "  WHEN 0 THEN 'HTTP://EX' || (i%5) || '.COM:80/path' || i"
    "   || '?q=' || i || '#frag' || i"
    "  WHEN 1 THEN 'https://Sub.Ex' || (i%5) || '.com:443/'"
    "  WHEN 2 THEN 'http://ex' || (i%5) || '.com:8080/p' || i"
    "  WHEN 3 THEN 'HTTPS://ex' || (i%5) || '.COM'"
    "  WHEN 4 THEN 'http://ex' || (i%5) || '.com:/x' || i"
    "  WHEN 5 THEN 'not a url ' || i"
    "  WHEN 6 THEN 'ftp://Files.Ex' || (i%5) || '.org/f' || i"
    "  ELSE 'http://ex' || (i%5) || '.com/P' || i || '?#tail'"
    "  END AS url FROM generate_series(0, 199) s(i)),"
    " st AS (SELECT url, regexp_replace(url, '#.*$', '') AS s FROM u),"
    " ex AS (SELECT url, s,"
    f"  regexp_matches(s, '{_URL_CANON_RE}') AS ok,"
    f"  lower(regexp_extract(s, '{_URL_CANON_RE}', 1)) AS scheme,"
    f"  lower(regexp_extract(s, '{_URL_CANON_RE}', 2)) AS host,"
    f"  regexp_extract(s, '{_URL_CANON_RE}', 3) AS port,"
    f"  regexp_extract(s, '{_URL_CANON_RE}', 4) AS rest FROM st)"
    " SELECT url, CASE WHEN NOT ok THEN s ELSE"
    "  scheme || '://' || host ||"
    "  CASE WHEN port = '' OR (scheme = 'http' AND port = '80')"
    "   OR (scheme = 'https' AND port = '443')"
    "   THEN '' ELSE ':' || port END ||"
    "  CASE WHEN rest = '' THEN '/' ELSE rest END"
    "  END AS canon FROM ex"
)


def q_canonical_crawl_graph(sf_dir: str):
    """Canonical crawl-graph composition — the full link-normalization
    recipe a crawler runs before graph construction: extract absolute
    links, CANONICALIZE each (case/port/fragment), resolve through a
    redirect table (pointer doubling; unresolved/cyclic redirects keep
    their canonical URL), then aggregate host→host edge counts. Fully
    oracled: the SQL twin regenerates pages + redirects, re-extracts
    links, replays the canonicalization RE2 chain, and walks redirects
    with a bounded recursive CTE."""
    from ray.data.aggregate import Count

    from ..functions.urls import canonicalize_url, url_host
    from ..stages.graph import resolve_redirects
    from ..stages.join import shuffle_hash_join

    rows = []
    for i in range(240):
        rows.append({
            "url": f"https://site{i % 4}.test/p/{i}",
            "html": (
                f'<a href="HTTPS://Site{(i + 1) % 4}.TEST:443/q/'
                f'{i % 60}#f{i}">n</a>'
                f'<a href="https://old{i % 3}.test/r/{i % 30}">r</a>'
                f'<a href="/rel/{i}">rel</a>'),
        })
    redirects = []
    for k in range(3):
        for j in range(30):
            redirects.append({"src": f"https://old{k}.test/r/{j}",
                              "dst": f"https://new{k}.test/page/{j % 10}"})
    for m in range(10):
        redirects.append({"src": f"https://new0.test/page/{m}",
                          "dst": f"https://final0.test/{m}"})
        redirects.append({"src": f"https://new2.test/page/{m}",
                          "dst": f"https://old2.test/r/{m}"})  # cycle

    from ..functions.urls import extract_links

    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    links = pages.map_batches(extract_links, batch_format="pyarrow")
    canon = links.map_batches(
        lambda b: pa.table({"url": b.column("url"),
                            "canon": canonicalize_url(b.column("link"))}),
        batch_format="pyarrow")
    mapping = resolve_redirects(
        rd.from_arrow(pa.Table.from_pylist(redirects)).repartition(2),
        max_hops=8, nb=8)
    resolved = mapping.map_batches(
        lambda b: (lambda f: pa.table(
            {"canon": f.column("src"), "final": f.column("final")}))(
            b.filter(pc.equal(b.column("status"), "resolved"))),
        batch_format="pyarrow")
    j = shuffle_hash_join(canon, resolved, on=["canon"], how="left",
                          nb=8)
    hosts = j.map_batches(
        lambda b: pa.table({
            "src_host": url_host(b.column("url")),
            "dst_host": url_host(pc.coalesce(b.column("final"),
                                             b.column("canon")))}),
        batch_format="pyarrow")
    agg = hosts.groupby(["src_host", "dst_host"]).aggregate(
        Count(alias_name="n"))
    df = (agg.to_pandas().sort_values(["src_host", "dst_host"])
          .reset_index(drop=True))
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["canonical_crawl_graph"] = q_canonical_crawl_graph

ORACLES["canonical_crawl_graph"] = (
    "WITH RECURSIVE pages AS (SELECT i,"
    " 'https://site' || (i%4) || '.test/p/' || i AS url,"
    " '<a href=\"HTTPS://Site' || ((i+1)%4) || '.TEST:443/q/'"
    " || (i%60) || '#f' || i || '\">n</a>'"
    " || '<a href=\"https://old' || (i%3) || '.test/r/' || (i%30)"
    " || '\">r</a><a href=\"/rel/' || i || '\">rel</a>' AS html"
    " FROM generate_series(0, 239) t(i)),"
    " links AS (SELECT url, unnest(regexp_extract_all(html,"
    "  '(?i)<a\\s[^>]*href\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) AS link"
    "  FROM pages),"
    " abs_links AS (SELECT url, link FROM links"
    "  WHERE regexp_matches(link, '^[A-Za-z][A-Za-z0-9+.\\-]*://')),"
    " cx AS (SELECT url, regexp_replace(link, '#.*$', '') AS s"
    "  FROM abs_links),"
    " cparts AS (SELECT url, s,"
    f"  regexp_matches(s, '{_URL_CANON_RE}') AS ok,"
    f"  lower(regexp_extract(s, '{_URL_CANON_RE}', 1)) AS scheme,"
    f"  lower(regexp_extract(s, '{_URL_CANON_RE}', 2)) AS host,"
    f"  regexp_extract(s, '{_URL_CANON_RE}', 3) AS port,"
    f"  regexp_extract(s, '{_URL_CANON_RE}', 4) AS rest FROM cx),"
    " canon AS (SELECT url, CASE WHEN NOT ok THEN s ELSE"
    "  scheme || '://' || host ||"
    "  CASE WHEN port = '' OR (scheme = 'http' AND port = '80')"
    "   OR (scheme = 'https' AND port = '443')"
    "   THEN '' ELSE ':' || port END ||"
    "  CASE WHEN rest = '' THEN '/' ELSE rest END END AS canon"
    "  FROM cparts),"
    " e0 AS ("
    "  SELECT 'https://old' || k || '.test/r/' || j AS src,"
    "   'https://new' || k || '.test/page/' || (j%10) AS dst"
    "   FROM generate_series(0, 2) a(k), generate_series(0, 29) b(j)"
    "  UNION ALL SELECT 'https://new0.test/page/' || m,"
    "   'https://final0.test/' || m FROM generate_series(0, 9) c(m)"
    "  UNION ALL SELECT 'https://new2.test/page/' || m,"
    "   'https://old2.test/r/' || m FROM generate_series(0, 9) c(m)),"
    " e AS (SELECT src, min(dst) AS dst FROM e0 GROUP BY src),"
    " walk(src, cur, hops) AS ("
    "  SELECT src, dst, 1 FROM e"
    "  UNION ALL SELECT w.src, e.dst, w.hops + 1 FROM walk w"
    "   JOIN e ON w.cur = e.src WHERE w.hops < 9),"
    " term AS (SELECT src, cur FROM walk WHERE hops <= 8"
    "  AND cur NOT IN (SELECT src FROM e)),"
    " fin AS (SELECT c.url, coalesce(t.cur, c.canon) AS final"
    "  FROM canon c LEFT JOIN term t ON c.canon = t.src)"
    " SELECT lower(regexp_extract(url,"
    "  '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#:@]*)', 1)) AS src_host,"
    " lower(regexp_extract(final,"
    "  '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#:@]*)', 1)) AS dst_host,"
    " CAST(count(*) AS BIGINT) AS n FROM fin GROUP BY 1, 2"
)


def q_clustering_coeff(sf_dir: str):
    """Per-node triangle count + local clustering coefficient
    (graph.clustering_coefficient) over the derived customer graph.
    Fully oracled: 3-way self-join triangle enumeration + per-node
    scatter in SQL."""
    from ..stages.graph import clustering_coefficient

    out = clustering_coefficient(_derived_customer_edges(sf_dir), nb=16)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["clustering_coeff"] = q_clustering_coeff

ORACLES["clustering_coeff"] = (
    "WITH e0 AS ("
    "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500"
    "   FROM orders),"
    " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
    "   FROM e0 WHERE u <> v),"
    " deg AS (SELECT node, count(*) AS deg FROM"
    "  (SELECT a AS node FROM e UNION ALL SELECT b FROM e)"
    "  GROUP BY 1),"
    " tri3 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1"
    "  JOIN e e2 ON e2.a = e1.b"
    "  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),"
    " tcnt AS (SELECT node, count(*) AS tri FROM"
    "  (SELECT x AS node FROM tri3 UNION ALL SELECT y FROM tri3"
    "   UNION ALL SELECT z FROM tri3) GROUP BY 1)"
    " SELECT deg.node, CAST(deg.deg AS BIGINT) AS deg,"
    "  CAST(coalesce(tcnt.tri, 0) AS BIGINT) AS tri,"
    "  CASE WHEN deg.deg < 2 THEN 0.0 ELSE"
    "   2.0 * coalesce(tcnt.tri, 0) / (deg.deg * (deg.deg - 1))"
    "  END AS cc"
    " FROM deg LEFT JOIN tcnt USING (node)"
)


def q_kg_snapshot_diff(sf_dir: str):
    """KG snapshot diff — nightly-recrawl change detection: diff two
    triple snapshots keyed by (subj, pred), with the object as the
    compared payload: added / removed / changed facts. Composition of
    the generic CDC table_diff over synthesized snapshots. Fully
    oracled (FULL OUTER + null-safe compare in SQL)."""
    from ..stages.join import table_diff

    old_rows, new_rows = [], []
    for i in range(400):
        s, p = f"E{i % 80}", f"p{i // 80}"
        if i % 11 != 0:  # 11-multiples only exist in the NEW snapshot
            old_rows.append({"subj": s, "pred": p,
                             "obj": f"v{i % 13}"})
        if i % 7 != 0:   # 7-multiples removed in the new snapshot
            new_rows.append(
                {"subj": s, "pred": p,
                 "obj": (f"w{i % 13}" if i % 3 == 0 else f"v{i % 13}")})
    old = rd.from_arrow(pa.Table.from_pylist(old_rows)).repartition(3)
    new = rd.from_arrow(pa.Table.from_pylist(new_rows)).repartition(3)
    out = table_diff(old, new, key_cols=["subj", "pred"],
                     compare_cols=["obj"], nb=8)
    df = (out.to_pandas().sort_values(["subj", "pred", "change"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["kg_snapshot_diff"] = q_kg_snapshot_diff

ORACLES["kg_snapshot_diff"] = (
    "WITH gen AS (SELECT i, 'E' || (i % 80) AS subj,"
    "  'p' || (i // 80) AS pred, 'v' || (i % 13) AS v,"
    "  CASE WHEN i % 3 = 0 THEN 'w' || (i % 13)"
    "   ELSE 'v' || (i % 13) END AS w"
    "  FROM generate_series(0, 399) s(i)),"
    " old AS (SELECT subj, pred, v AS obj FROM gen"
    "  WHERE i % 11 <> 0),"
    " new AS (SELECT subj, pred, w AS obj FROM gen"
    "  WHERE i % 7 <> 0)"
    " SELECT coalesce(old.subj, new.subj) AS subj,"
    "  coalesce(old.pred, new.pred) AS pred,"
    "  CASE WHEN old.subj IS NULL THEN 'added'"
    "   WHEN new.subj IS NULL THEN 'removed'"
    "   ELSE 'changed' END AS change"
    " FROM old FULL OUTER JOIN new"
    "  ON old.subj = new.subj AND old.pred = new.pred"
    " WHERE old.subj IS NULL OR new.subj IS NULL"
    "  OR old.obj IS DISTINCT FROM new.obj"
)


def q_kcore(sf_dir: str):
    """k-core decomposition (graph.kcore, k=2) over a synthesized
    graph of ten 8-cycles each dragging a 3-node tail: the tails peel
    in exactly three rounds, the cycles survive with degree 2. Fully
    oracled: the SQL twin unrolls the three peel rounds (plus the
    fixpoint check) over the regenerated edge list."""
    from ..stages.graph import kcore

    rows = []
    for g in range(10):
        base = 100 * g
        for j in range(7):
            rows.append({"a": base + j, "b": base + j + 1})
        rows.append({"a": base, "b": base + 7})
        rows.append({"a": base, "b": base + 10})
        rows.append({"a": base + 10, "b": base + 11})
        rows.append({"a": base + 11, "b": base + 12})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = kcore(edges, k=2, nb=8)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["kcore"] = q_kcore

_KCORE_DEG = ("SELECT node, count(*) AS deg FROM (SELECT a AS node"
              " FROM {e} UNION ALL SELECT b FROM {e}) GROUP BY 1")
_KCORE_PEEL = ("SELECT a, b FROM {e} WHERE"
               " a IN (SELECT node FROM {d} WHERE deg >= 2)"
               " AND b IN (SELECT node FROM {d} WHERE deg >= 2)")

ORACLES["kcore"] = (
    "WITH e0 AS ("
    " SELECT 100 * g + j AS a, 100 * g + j + 1 AS b"
    "  FROM generate_series(0, 9) G(g), generate_series(0, 6) J(j)"
    " UNION ALL SELECT 100 * g, 100 * g + 7"
    "  FROM generate_series(0, 9) G(g)"
    " UNION ALL SELECT 100 * g, 100 * g + 10"
    "  FROM generate_series(0, 9) G(g)"
    " UNION ALL SELECT 100 * g + 10, 100 * g + 11"
    "  FROM generate_series(0, 9) G(g)"
    " UNION ALL SELECT 100 * g + 11, 100 * g + 12"
    "  FROM generate_series(0, 9) G(g)),"
    f" d1 AS ({_KCORE_DEG.format(e='e0')}),"
    f" e1 AS ({_KCORE_PEEL.format(e='e0', d='d1')}),"
    f" d2 AS ({_KCORE_DEG.format(e='e1')}),"
    f" e2 AS ({_KCORE_PEEL.format(e='e1', d='d2')}),"
    f" d3 AS ({_KCORE_DEG.format(e='e2')}),"
    f" e3 AS ({_KCORE_PEEL.format(e='e2', d='d3')}),"
    f" d4 AS ({_KCORE_DEG.format(e='e3')})"
    " SELECT node, deg FROM d4 WHERE deg >= 2"
)


def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (graph.personalized_pagerank) over a
    synthesized 10-ary DAG with teleport restricted to seeds {1, 2}.
    Fully oracled: the SQL twin unrolls the 3 power iterations with
    the seed teleport vector."""
    from ..stages.graph import personalized_pagerank

    i = np.arange(10, 510, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": pa.array(i // 10),
                                    "dst": pa.array(i)})).repartition(4)
    out = personalized_pagerank(edges, seeds=[1, 2], damping=0.85,
                                iters=3, nb=8)
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    df["rank"] = df["rank"].round(8)
    return pa.Table.from_pandas(
        df.sort_values("node").reset_index(drop=True),
        preserve_index=False)


QUERIES["personalized_pagerank"] = q_personalized_pagerank


def _ppr_oracle_sql(iters: int = 3, d: float = 0.85) -> str:
    s = (
        "WITH e AS (SELECT i // 10 AS src, i AS dst"
        "   FROM generate_series(10, 509) s(i)),"
        " deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " r0 AS (SELECT node, CASE WHEN node IN (1, 2) THEN 0.5"
        "   ELSE 0.0 END AS rank FROM nodes)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node,"
            f"   sum(r.rank / deg.deg) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", em{i} AS (SELECT coalesce(sum(msum), 0) AS emitted"
            f"   FROM m{i})"
            f", r{i + 1} AS (SELECT n.node,"
            f"   coalesce({d} * m.msum, 0)"
            f"   + CASE WHEN n.node IN (1, 2) THEN"
            f"      ((1 - {d}) + {d} * (1 - em.emitted)) * 0.5"
            f"     ELSE 0 END AS rank"
            f"   FROM nodes n CROSS JOIN em{i} em"
            f"   LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT CAST(node AS BIGINT) AS node,"
                f" round(rank, 8) AS rank FROM r{iters}")


ORACLES["personalized_pagerank"] = _ppr_oracle_sql(iters=3, d=0.85)


def q_node_similarity(sf_dir: str):
    """Structural link-prediction scores (graph.node_similarity):
    common neighbors / Jaccard / Adamic–Adar per 2-hop pair of the
    derived customer graph, min_common=2. Fully oracled (SQL wedge
    self-join + degree joins)."""
    from ..stages.graph import node_similarity

    out = node_similarity(_derived_customer_edges(sf_dir),
                          min_common=2, nb=16)
    df = (out.to_pandas().sort_values(["a", "b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["node_similarity"] = q_node_similarity

ORACLES["node_similarity"] = (
    "WITH e0 AS ("
    "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500"
    "   FROM orders),"
    " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
    "   FROM e0 WHERE u <> v),"
    " und AS (SELECT a AS mid, b AS n FROM e"
    "  UNION ALL SELECT b, a FROM e),"
    " deg AS (SELECT mid AS node, count(*) AS deg FROM und"
    "  GROUP BY 1),"
    " pairs AS (SELECT x.n AS a, y.n AS b,"
    "   count(*) AS common, sum(1.0 / ln(d.deg)) AS aa"
    "   FROM und x JOIN und y ON x.mid = y.mid AND x.n < y.n"
    "   JOIN deg d ON d.node = x.mid GROUP BY 1, 2)"
    " SELECT p.a, p.b, CAST(p.common AS BIGINT) AS common,"
    "  round(CAST(p.common AS DOUBLE)"
    "   / (da.deg + db.deg - p.common), 6) AS jaccard,"
    "  round(p.aa, 6) AS adamic_adar"
    " FROM pairs p JOIN deg da ON da.node = p.a"
    "  JOIN deg db ON db.node = p.b"
    " WHERE p.common >= 2"
)


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the derived customer graph
    (graph.degree_assortativity). Oracled by DuckDB corr() over both
    orientations of the degree-joined edge list."""
    from ..stages.graph import degree_assortativity

    r = degree_assortativity(_derived_customer_edges(sf_dir), nb=16)
    return pa.table({"assortativity": pa.array([round(r, 6)],
                                               pa.float64())})


QUERIES["degree_assortativity"] = q_degree_assortativity

ORACLES["degree_assortativity"] = (
    "WITH e0 AS ("
    "  SELECT o_custkey AS u, (o_custkey * 37) % 500 AS v FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 101) % 500 FROM orders"
    "  UNION ALL SELECT o_custkey, (o_custkey * 7 + 13) % 500"
    "   FROM orders),"
    " e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b"
    "   FROM e0 WHERE u <> v),"
    " und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),"
    " deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1)"
    " SELECT round(corr(CAST(da.deg AS DOUBLE),"
    "  CAST(db.deg AS DOUBLE)), 6) AS assortativity"
    " FROM und JOIN deg da ON da.node = und.u"
    " JOIN deg db ON db.node = und.v"
)


def q_sssp(sf_dir: str):
    """Weighted shortest paths (graph.sssp) over a synthesized 6-layer
    DAG with two weighted out-edges per node, seeds = layer-0 nodes.
    Fully oracled: bounded recursive-CTE walk + min per node."""
    from ..stages.graph import sssp

    rows = []
    for lvl in range(6):
        for i in range(10):
            rows.append({"src": 100 * lvl + i,
                         "dst": 100 * (lvl + 1) + i,
                         "w": (i % 5) + 1})
            rows.append({"src": 100 * lvl + i,
                         "dst": 100 * (lvl + 1) + ((i + 3) % 10),
                         "w": ((i + lvl) % 4) + 1})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = sssp(edges, seeds=list(range(10)), nb=8)
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    df["dist"] = df["dist"].round(6)
    return pa.Table.from_pandas(
        df.sort_values("node").reset_index(drop=True),
        preserve_index=False)


QUERIES["sssp"] = q_sssp

ORACLES["sssp"] = (
    "WITH RECURSIVE e AS ("
    "  SELECT 100 * l + i AS src, 100 * (l + 1) + i AS dst,"
    "   CAST((i % 5) + 1 AS DOUBLE) AS w"
    "   FROM generate_series(0, 5) L(l), generate_series(0, 9) I(i)"
    "  UNION ALL SELECT 100 * l + i, 100 * (l + 1) + ((i + 3) % 10),"
    "   CAST(((i + l) % 4) + 1 AS DOUBLE)"
    "   FROM generate_series(0, 5) L(l), generate_series(0, 9) I(i)),"
    " walk(node, d, hops) AS ("
    "  SELECT i, CAST(0 AS DOUBLE), 0 FROM generate_series(0, 9) I(i)"
    "  UNION ALL SELECT e.dst, w.d + e.w, w.hops + 1 FROM walk w"
    "   JOIN e ON e.src = w.node WHERE w.hops < 7)"
    " SELECT CAST(node AS BIGINT) AS node,"
    "  round(min(d), 6) AS dist FROM walk GROUP BY node"
)


def q_triple_confidence(sf_dir: str):
    """Noisy-OR confidence fusion (graph.fuse_triple_confidence) over
    a synthesized multi-mention triple stream: conf = 1 − Π(1 − sᵢ)
    per (subj, pred, obj) plus mention count. Fully oracled via
    exp/ln product folding in SQL."""
    from ..stages.graph import fuse_triple_confidence

    rows = []
    for i in range(900):
        rows.append({"subj": f"E{i % 60}", "pred": f"p{(i // 60) % 3}",
                     "obj": f"V{i % 15}",
                     "score": ((i * 7) % 9 + 1) / 10.0})
    t = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = fuse_triple_confidence(t, nb=8)
    df = (out.to_pandas().sort_values(["subj", "pred", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["triple_confidence"] = q_triple_confidence

ORACLES["triple_confidence"] = (
    "WITH t AS (SELECT 'E' || (i % 60) AS subj,"
    "  'p' || ((i // 60) % 3) AS pred, 'V' || (i % 15) AS obj,"
    "  ((i * 7) % 9 + 1) / 10.0 AS score"
    "  FROM generate_series(0, 899) s(i))"
    " SELECT subj, pred, obj,"
    "  CAST(count(*) AS BIGINT) AS n_mentions,"
    "  round(1.0 - exp(sum(ln(1.0 - score))), 6) AS conf"
    " FROM t GROUP BY 1, 2, 3"
)


def q_lpa_communities(sf_dir: str):
    """Deterministic synchronous label propagation
    (graph.label_propagation, min-label tie-break) over two K5
    cliques joined by a bridge plus a 7-node path — community ids
    after exactly 3 rounds. Fully oracled: the SQL twin unrolls the
    three synchronous rounds as vote/argmax CTE pairs."""
    from ..stages.graph import label_propagation

    rows = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append({"a": base + i, "b": base + j})
    rows.append({"a": 4, "b": 10})
    for i in range(6):
        rows.append({"a": 20 + i, "b": 21 + i})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = label_propagation(edges, n_iters=3, nb=8)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["lpa_communities"] = q_lpa_communities

_LPA_VOTE = (
    " v{k} AS (SELECT e.dst AS node, l{p}.lab AS lab, COUNT(*) AS c"
    "  FROM e JOIN l{p} ON l{p}.node = e.src GROUP BY 1, 2),"
    " l{k} AS (SELECT node, lab FROM (SELECT node, lab, ROW_NUMBER()"
    "  OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn"
    "  FROM v{k}) q{k} WHERE rn = 1),"
)

ORACLES["lpa_communities"] = (
    "WITH base AS ("
    " SELECT b10 + i AS a, b10 + j AS b"
    "  FROM (VALUES (0), (10)) t(b10),"
    "   generate_series(0, 4) s(i), generate_series(0, 4) u(j)"
    "  WHERE i < j"
    " UNION ALL SELECT 4, 10"
    " UNION ALL SELECT 20 + i, 21 + i FROM generate_series(0, 5) s(i)),"
    " e AS (SELECT a AS src, b AS dst FROM base"
    "  UNION ALL SELECT b, a FROM base),"
    " l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),"
    + _LPA_VOTE.format(k=1, p=0)
    + _LPA_VOTE.format(k=2, p=1)
    + _LPA_VOTE.format(k=3, p=2)
    + " f AS (SELECT node, lab FROM l3)"
    " SELECT CAST(node AS BIGINT) AS node, CAST(lab AS BIGINT) AS label"
    " FROM f"
)


def q_wl_colors(sf_dir: str):
    """1-WL color refinement (graph.wl_refinement, 2 rounds) over two
    isomorphic 4-stars, a 5-path, and two isomorphic 4-cycles —
    structurally equivalent nodes end with identical md5 colors.
    Fully oracled: DuckDB replays c0=degree then two
    md5(own || '|' || string_agg(neighbor ORDER BY)) rounds."""
    from ..stages.graph import wl_refinement

    rows = []
    for i in range(1, 5):
        rows.append({"a": 0, "b": i})
        rows.append({"a": 10, "b": 10 + i})
    for i in range(4):
        rows.append({"a": 20 + i, "b": 21 + i})
    for base in (30, 40):
        for i in range(4):
            x, y = base + i, base + ((i + 1) % 4)
            rows.append({"a": min(x, y), "b": max(x, y)})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = wl_refinement(edges, n_iters=2, nb=8)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["wl_colors"] = q_wl_colors

_WL_ROUND = (
    " s{k} AS (SELECT e.dst AS node,"
    "  string_agg(c{p}.c, ',' ORDER BY c{p}.c) AS sig"
    "  FROM e JOIN c{p} ON c{p}.node = e.src GROUP BY 1),"
    " c{k} AS (SELECT s{k}.node, md5(c{p}.c || '|' || s{k}.sig) AS c"
    "  FROM s{k} JOIN c{p} ON c{p}.node = s{k}.node),"
)

ORACLES["wl_colors"] = (
    "WITH base AS ("
    " SELECT 0 AS a, i AS b FROM generate_series(1, 4) s(i)"
    " UNION ALL SELECT 10, 10 + i FROM generate_series(1, 4) s(i)"
    " UNION ALL SELECT 20 + i, 21 + i FROM generate_series(0, 3) s(i)"
    " UNION ALL SELECT least(b30 + i, b30 + ((i + 1) % 4)),"
    "  greatest(b30 + i, b30 + ((i + 1) % 4))"
    "  FROM (VALUES (30), (40)) t(b30), generate_series(0, 3) s(i)),"
    " e AS (SELECT a AS src, b AS dst FROM base"
    "  UNION ALL SELECT b, a FROM base),"
    " c0 AS (SELECT src AS node, CAST(COUNT(*) AS VARCHAR) AS c"
    "  FROM e GROUP BY 1),"
    + _WL_ROUND.format(k=1, p=0)
    + _WL_ROUND.format(k=2, p=1)
    + " f AS (SELECT node, c FROM c2)"
    " SELECT CAST(node AS BIGINT) AS node, c AS wl_color FROM f"
)


def q_butterflies(sf_dir: str):
    """Bipartite butterfly (2×2 biclique) count
    (graph.butterfly_count) over a deterministic customer→term
    incidence graph derived from orders — the bipartite cohesion
    metric (two pages sharing two entities). Fully oracled: wedge
    self-join + Σ C(w,2) in SQL."""
    from ..stages.graph import butterfly_count

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def edges(t: pa.Table) -> pa.Table:
        u = t.column("o_custkey").to_numpy(zero_copy_only=False)
        us = np.concatenate([u, u, u])
        vs = np.concatenate([(u * 37) % 150, (u * 11 + 3) % 150,
                             (u * 53 + 7) % 150])
        return pa.table({"u": pa.array(us, pa.int64()),
                         "v": pa.array(vs, pa.int64())})

    e = dedup_exact(
        orders.map_batches(edges, batch_format="pyarrow"),
        ["u", "v"], nb=16)
    n = butterfly_count(e, nb=16)
    return pa.table({"butterflies": pa.array([n], pa.int64())})


QUERIES["butterflies"] = q_butterflies

ORACLES["butterflies"] = (
    "WITH e AS ("
    "  SELECT DISTINCT o_custkey AS u, (o_custkey * 37) % 150 AS v"
    "   FROM orders"
    "  UNION SELECT o_custkey, (o_custkey * 11 + 3) % 150 FROM orders"
    "  UNION SELECT o_custkey, (o_custkey * 53 + 7) % 150 FROM orders),"
    " w AS (SELECT e1.u AS u1, e2.u AS u2, COUNT(*) AS c"
    "  FROM e e1 JOIN e e2 ON e2.v = e1.v AND e1.u < e2.u"
    "  GROUP BY 1, 2)"
    " SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT)"
    "  AS butterflies FROM w"
)


def q_harmonic_centrality(sf_dir: str):
    """Landmark harmonic centrality (graph.harmonic_centrality — ONE
    multi-source BFS pass for all landmarks) over the bfs_depth
    orders-derived DAG, landmarks 1..9. Fully oracled: recursive-CTE
    walk → min dist per (lm, node) → Σ 1/dist."""
    from ..stages.graph import harmonic_centrality

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        dst = np.concatenate([k[k >= 10], k[k >= 7]])
        src = np.concatenate([k[k >= 10] // 10, k[k >= 7] // 7])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    out = harmonic_centrality(
        orders.map_batches(edges, batch_format="pyarrow"),
        landmarks=list(range(1, 10)), nb=16)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["harmonic_centrality"] = q_harmonic_centrality

ORACLES["harmonic_centrality"] = (
    "WITH RECURSIVE e AS ("
    "  SELECT o_orderkey // 10 AS src, o_orderkey AS dst FROM orders"
    "   WHERE o_orderkey >= 10"
    "  UNION SELECT o_orderkey // 7, o_orderkey FROM orders"
    "   WHERE o_orderkey >= 7),"
    " d(lm, node, dist) AS ("
    "  SELECT x, x, 0 FROM (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS x)"
    "  UNION SELECT d.lm, e.dst, d.dist + 1 FROM d"
    "   JOIN e ON e.src = d.node),"
    " md AS (SELECT lm, node, MIN(dist) AS dist FROM d GROUP BY 1, 2)"
    " SELECT CAST(node AS BIGINT) AS node,"
    "  round(SUM(1.0 / dist), 6) AS harmonic"
    " FROM md WHERE dist > 0 GROUP BY node"
)


def q_construct_kg(sf_dir: str):
    """SPARQL CONSTRUCT (graph.construct_triples): WHERE = typed
    documents + hasAuthor (+ OPTIONAL cites), TEMPLATE materializes
    the inverse authored edge, an Author rdf:type fan-out, and a
    related edge from the OPTIONAL (skipped where unbound) — set
    semantics. Fully oracled: joins + LEFT JOIN + UNION in SQL."""
    from ..stages.graph import construct_triples

    rows = []
    for i in range(40):
        rows.append({"subj": f"d{i}", "pred": "type", "obj": "Document"})
        rows.append({"subj": f"d{i}", "pred": "hasAuthor",
                     "obj": f"a{i % 7}"})
        if i % 3 == 0:
            rows.append({"subj": f"d{i}", "pred": "cites",
                         "obj": f"d{(i + 1) % 40}"})
    t = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = construct_triples(
        t,
        where=[("?d", "type", "Document"), ("?d", "hasAuthor", "?a")],
        template=[("?a", "authored", "?d"), ("?a", "type", "Author"),
                  ("?d", "related", "?c")],
        optional=[("?d", "cites", "?c")],
        nb=8)
    df = (out.to_pandas().sort_values(["subj", "pred", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["construct_kg"] = q_construct_kg

ORACLES["construct_kg"] = (
    "WITH t AS ("
    " SELECT 'd' || i AS subj, 'type' AS pred, 'Document' AS obj"
    "  FROM generate_series(0, 39) s(i)"
    " UNION ALL SELECT 'd' || i, 'hasAuthor', 'a' || (i % 7)"
    "  FROM generate_series(0, 39) s(i)"
    " UNION ALL SELECT 'd' || i, 'cites', 'd' || ((i + 1) % 40)"
    "  FROM generate_series(0, 39) s(i) WHERE i % 3 = 0),"
    " b AS (SELECT t1.subj AS d, t2.obj AS a, t3.obj AS c"
    "  FROM t t1"
    "  JOIN t t2 ON t2.subj = t1.subj AND t2.pred = 'hasAuthor'"
    "  LEFT JOIN t t3 ON t3.subj = t1.subj AND t3.pred = 'cites'"
    "  WHERE t1.pred = 'type' AND t1.obj = 'Document'),"
    " c AS (SELECT a AS subj, 'authored' AS pred, d AS obj FROM b"
    "  UNION SELECT a, 'type', 'Author' FROM b"
    "  UNION SELECT d, 'related', c FROM b WHERE c IS NOT NULL)"
    " SELECT subj, pred, obj FROM c"
)


def q_graph_eccentricity(sf_dir: str):
    """Per-landmark eccentricity (graph.eccentricity — one shared
    multi-source BFS) over the bfs_depth orders-derived DAG,
    landmarks 1..9: the diameter lower-bound probe. Fully oracled."""
    from ..stages.graph import eccentricity

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        dst = np.concatenate([k[k >= 10], k[k >= 7]])
        src = np.concatenate([k[k >= 10] // 10, k[k >= 7] // 7])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    out = eccentricity(
        orders.map_batches(edges, batch_format="pyarrow"),
        landmarks=list(range(1, 10)), nb=16)
    df = out.to_pandas().sort_values("lm").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["graph_eccentricity"] = q_graph_eccentricity

ORACLES["graph_eccentricity"] = (
    "WITH RECURSIVE e AS ("
    "  SELECT o_orderkey // 10 AS src, o_orderkey AS dst FROM orders"
    "   WHERE o_orderkey >= 10"
    "  UNION SELECT o_orderkey // 7, o_orderkey FROM orders"
    "   WHERE o_orderkey >= 7),"
    " d(lm, node, dist) AS ("
    "  SELECT x, x, 0 FROM (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS x)"
    "  UNION SELECT d.lm, e.dst, d.dist + 1 FROM d"
    "   JOIN e ON e.src = d.node),"
    " md AS (SELECT lm, node, MIN(dist) AS dist FROM d GROUP BY 1, 2)"
    " SELECT CAST(lm AS BIGINT) AS lm, CAST(MAX(dist) AS BIGINT) AS ecc"
    " FROM md GROUP BY lm"
)


def q_ktruss(sf_dir: str):
    """k-truss edge peeling (graph.ktruss, k=4) over ten K5 blocks
    each dragging a pendant triangle — the pendants peel in exactly
    one round (support 1 < k−2), so the SQL twin unrolls two support
    censuses (round 2 proves the fixpoint)."""
    from ..stages.graph import ktruss

    rows = []
    for g in range(10):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append({"a": 10 * g + i, "b": 10 * g + j})
        rows.append({"a": 10 * g, "b": 10 * g + 9})
        rows.append({"a": 10 * g + 1, "b": 10 * g + 9})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = ktruss(edges, k=4, nb=8)
    df = (out.to_pandas().sort_values(["a", "b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["ktruss"] = q_ktruss

_TRUSS_ROUND = (
    " tri{k} AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z"
    "  FROM e{p} e1 JOIN e{p} e2 ON e2.a = e1.b"
    "  JOIN e{p} e3 ON e3.a = e1.a AND e3.b = e2.b),"
    " sup{k} AS (SELECT a, b, COUNT(*) AS c FROM ("
    "  SELECT x AS a, y AS b FROM tri{k}"
    "  UNION ALL SELECT y, z FROM tri{k}"
    "  UNION ALL SELECT x, z FROM tri{k}) r{k} GROUP BY 1, 2),"
    " e{k} AS (SELECT a, b FROM sup{k} WHERE c >= 2),"
)

ORACLES["ktruss"] = (
    "WITH e0 AS ("
    " SELECT 10 * g + i AS a, 10 * g + j AS b"
    "  FROM generate_series(0, 9) G(g), generate_series(0, 4) s(i),"
    "   generate_series(0, 4) u(j) WHERE i < j"
    " UNION ALL SELECT 10 * g, 10 * g + 9 FROM generate_series(0, 9) G(g)"
    " UNION ALL SELECT 10 * g + 1, 10 * g + 9"
    "  FROM generate_series(0, 9) G(g)),"
    + _TRUSS_ROUND.format(k=1, p=0)
    + _TRUSS_ROUND.format(k=2, p=1)
    + " f AS (SELECT a, b, c FROM sup2 WHERE c >= 2)"
    " SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
    "  CAST(c AS BIGINT) AS support FROM f"
)


def q_rel_links(sf_dir: str):
    """rel=canonical / hreflang-alternate extraction
    (urls.extract_rel_links) over synthesized pages with mixed attr
    order, case, and quoting — the page-equivalence signals folded
    before crawl dedup. Fully oracled: the SQL twin regenerates the
    corpus and replays the tag findall + per-attribute extracts with
    the same RE2 patterns."""
    from ..functions.urls import extract_rel_links

    rows = []
    for i in range(300):
        if i % 4 == 0:
            h = (f'<LINK REL="Canonical" HREF="https://ex.com/p{i % 50}">'
                 f'<a href="https://a.org/{i}">x</a>')
        elif i % 4 == 1:
            h = (f'<link href=https://alt.org/{i} rel=alternate'
                 f' hreflang=EN-GB><p>t</p>')
        elif i % 4 == 2:
            h = (f'<link rel="alternate" hreflang="fr"'
                 f' href="https://fr.ex/{i % 30}">'
                 f'<link rel=canonical href=https://ex.com/c{i % 10}>')
        else:
            h = ('<link rel=stylesheet href=/x.css>'
                 f'<link rel=alternate href=https://nolang.ex/{i}>')
        rows.append({"url": f"https://src.ex/{i}", "html": h})
    pages = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = pages.map_batches(extract_rel_links, batch_format="pyarrow")
    df = (out.to_pandas()
          .sort_values(["url", "kind", "target"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["rel_links"] = q_rel_links

ORACLES["rel_links"] = (
    "WITH corpus AS (SELECT 'https://src.ex/' || i AS url,"
    " CASE WHEN i % 4 = 0 THEN"
    "  '<LINK REL=\"Canonical\" HREF=\"https://ex.com/p' || (i % 50)"
    "   || '\"><a href=\"https://a.org/' || i || '\">x</a>'"
    " WHEN i % 4 = 1 THEN"
    "  '<link href=https://alt.org/' || i ||"
    "   ' rel=alternate hreflang=EN-GB><p>t</p>'"
    " WHEN i % 4 = 2 THEN"
    "  '<link rel=\"alternate\" hreflang=\"fr\" href=\"https://fr.ex/'"
    "   || (i % 30) || '\"><link rel=canonical href=https://ex.com/c'"
    "   || (i % 10) || '>'"
    " ELSE '<link rel=stylesheet href=/x.css>'"
    "  || '<link rel=alternate href=https://nolang.ex/' || i || '>'"
    " END AS html FROM generate_series(0, 299) s(i)),"
    " tags AS (SELECT url, unnest(regexp_extract_all(html,"
    "  '(?i)<link\\s[^>]*>')) AS tag FROM corpus),"
    " a AS (SELECT url,"
    "  lower(regexp_extract(tag,"
    "   '(?i)\\brel\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) AS rel,"
    "  regexp_extract(tag,"
    "   '(?i)\\bhref\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1) AS href,"
    "  lower(regexp_extract(tag,"
    "   '(?i)\\bhreflang\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) AS hl"
    "  FROM tags),"
    " f AS (SELECT url, 'canonical' AS kind,"
    "   CAST(NULL AS VARCHAR) AS lang, href AS target FROM a"
    "   WHERE rel = 'canonical' AND href <> ''"
    "  UNION ALL SELECT url, 'alternate', hl, href FROM a"
    "   WHERE rel = 'alternate' AND hl <> '' AND href <> '')"
    " SELECT url, kind, lang, target FROM f"
)


def q_decontaminate_joined(sf_dir: str):
    """Corpus-vs-corpus decontamination, shuffle-join variant
    (dedup.decontaminate_joined, 3-gram; nothing broadcast — the
    scale path next to the broadcast q:decontaminate): flag documents
    sharing any 3-token shingle with a 'benchmark' slice
    (doc_id % 17 == 0 of the same corpus — guaranteed overlap plus
    cross-doc hits from shared templates). Fully oracled: SQL shingle
    build + IN-subquery semi join + left-join zero fill."""
    from ..stages.dedup import decontaminate_joined

    docs = _docs(sf_dir, ["doc_id", "text"])
    bench = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(
        lambda t: t.filter(pc.equal(
            pc.subtract(t.column("doc_id"),
                        pc.multiply(pc.divide(t.column("doc_id"), 17),
                                    17)), 0)).select(["text"]),
        batch_format="pyarrow")
    out = decontaminate_joined(docs, bench, n=3, nb=16)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["decontaminate_joined"] = q_decontaminate_joined

ORACLES["decontaminate_joined"] = (
    "WITH t AS (SELECT doc_id,"
    "  regexp_split_to_array(trim(text), '\\s+') AS toks,"
    "  len(regexp_split_to_array(trim(text), '\\s+')) AS L"
    "  FROM documents),"
    " dg AS (SELECT DISTINCT doc_id,"
    "  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g"
    "  FROM t, UNNEST(generate_series(1, L - 2)) AS u(i) WHERE L >= 3),"
    " bg AS (SELECT DISTINCT g FROM dg WHERE doc_id % 17 = 0),"
    " h AS (SELECT doc_id, COUNT(*) AS n_hits FROM dg"
    "  WHERE g IN (SELECT g FROM bg) GROUP BY doc_id)"
    " SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,"
    "  COALESCE(h.n_hits, 0) > 0 AS contaminated"
    " FROM (SELECT doc_id FROM documents) d"
    " LEFT JOIN h ON h.doc_id = d.doc_id"
)


def q_vocab_ids(sf_dir: str):
    """Global vocabulary with dense contiguous ids
    (textstats.build_vocab): document frequency over the shared RE2
    tokenizer, min_df=2, top-200 by (df DESC, token ASC). Fully
    oracled: list_distinct + ROW_NUMBER twin."""
    from ..stages.textstats import build_vocab

    out = build_vocab(_docs(sf_dir, ["doc_id", "text"]),
                      min_df=2, max_vocab=200, nb=16)
    df = out.to_pandas().sort_values("token_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["vocab_ids"] = q_vocab_ids

ORACLES["vocab_ids"] = (
    "WITH t AS (SELECT doc_id, unnest(list_distinct("
    "  regexp_split_to_array(trim(text), '\\s+'))) AS tok"
    "  FROM documents),"
    " dfx AS (SELECT tok, COUNT(*) AS df FROM t WHERE tok <> ''"
    "  GROUP BY tok),"
    " r AS (SELECT tok AS token, CAST(df AS BIGINT) AS df,"
    "  CAST(ROW_NUMBER() OVER (ORDER BY df DESC, tok ASC) - 1"
    "   AS BIGINT) AS token_id"
    "  FROM dfx WHERE df >= 2)"
    " SELECT token, df, token_id FROM r WHERE token_id < 200"
)


def q_encode_corpus(sf_dir: str):
    """Corpus encoding against the built vocabulary
    (textstats.build_vocab min_df=2/top-200 → textstats.encode_tokens,
    OOV → −1): ordered id sequences + token/OOV counts per document.
    Fully oracled: SQL rebuilds the vocab, explodes tokens with
    positions, LEFT-joins ids, and string_aggs in position order."""
    from ..stages.textstats import build_vocab, encode_tokens

    docs = _docs(sf_dir, ["doc_id", "text"])
    vocab = pa.Table.from_pandas(
        build_vocab(docs, min_df=2, max_vocab=200, nb=16).to_pandas(),
        preserve_index=False)
    out = encode_tokens(docs, vocab)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["encode_corpus"] = q_encode_corpus

ORACLES["encode_corpus"] = (
    "WITH t AS (SELECT doc_id,"
    "  regexp_split_to_array(trim(text), '\\s+') AS toks,"
    "  len(regexp_split_to_array(trim(text), '\\s+')) AS L"
    "  FROM documents),"
    " dt AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t),"
    " dfx AS (SELECT tok, COUNT(*) AS df FROM dt WHERE tok <> ''"
    "  GROUP BY tok),"
    " v AS (SELECT tok, tid FROM (SELECT tok,"
    "   ROW_NUMBER() OVER (ORDER BY df DESC, tok ASC) - 1 AS tid"
    "   FROM dfx WHERE df >= 2) r WHERE tid < 200),"
    " e AS (SELECT doc_id, i, toks[i] AS tok FROM t,"
    "  UNNEST(generate_series(1, L)) AS u(i) WHERE toks[i] <> ''),"
    " m AS (SELECT e.doc_id, e.i, COALESCE(v.tid, -1) AS tid"
    "  FROM e LEFT JOIN v ON v.tok = e.tok),"
    " agg AS (SELECT doc_id, COUNT(*) AS n_tokens,"
    "  SUM(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS n_oov,"
    "  string_agg(CAST(tid AS VARCHAR), ',' ORDER BY i) AS ids_str"
    "  FROM m GROUP BY doc_id)"
    " SELECT d.doc_id, CAST(COALESCE(agg.n_tokens, 0) AS BIGINT)"
    "  AS n_tokens, CAST(COALESCE(agg.n_oov, 0) AS BIGINT) AS n_oov,"
    "  agg.ids_str"
    " FROM (SELECT doc_id FROM documents) d"
    " LEFT JOIN agg ON agg.doc_id = d.doc_id"
)


def q_page_equivalence(sf_dir: str):
    """Page-equivalence classes — the crawl-dedup composition that
    folds every alias of a page to one node BEFORE content dedup:
    rel=canonical edges (urls.extract_rel_links) UNION resolved
    redirect finals (graph.resolve_redirects) → string min-label
    connected components (graph.string_components). Fully oracled:
    the SQL twin re-extracts the canonical targets with the same RE2
    chain, rebuilds the redirect finals, and labels components with a
    recursive min-reach CTE."""
    from ..functions.urls import extract_rel_links
    from ..stages.graph import resolve_redirects, string_components

    prows = [{"url": f"https://s.ex/p{i}",
              "html": (f'<link rel=canonical'
                       f' href=https://s.ex/c{i // 4}><p>t</p>')}
             for i in range(160)]
    pages = rd.from_arrow(pa.Table.from_pylist(prows)).repartition(3)
    canon = pages.map_batches(extract_rel_links,
                              batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "canonical"))
        .select(["url", "target"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow")

    rrows = [{"src": f"https://s.ex/c{j}", "dst": f"https://s.ex/m{j % 8}"}
             for j in range(0, 40, 2)]
    red = resolve_redirects(
        rd.from_arrow(pa.Table.from_pylist(rrows)).repartition(2), nb=8)
    red_edges = red.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), "resolved"))
        .select(["src", "final"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow")

    labels = string_components(canon.union(red_edges), nb=8)
    df = (labels.to_pandas().sort_values("node")
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["page_equivalence"] = q_page_equivalence

ORACLES["page_equivalence"] = (
    "WITH RECURSIVE corpus AS (SELECT 'https://s.ex/p' || i AS url,"
    "  '<link rel=canonical href=https://s.ex/c' || (i // 4)"
    "   || '><p>t</p>' AS html FROM generate_series(0, 159) s(i)),"
    " tags AS (SELECT url, unnest(regexp_extract_all(html,"
    "  '(?i)<link\\s[^>]*>')) AS tag FROM corpus),"
    " canon AS (SELECT url AS src, regexp_extract(tag,"
    "   '(?i)\\bhref\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1) AS dst"
    "  FROM tags WHERE lower(regexp_extract(tag,"
    "   '(?i)\\brel\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1)) = 'canonical'"
    "   AND regexp_extract(tag,"
    "   '(?i)\\bhref\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1) <> ''),"
    " red AS (SELECT 'https://s.ex/c' || j AS src,"
    "  'https://s.ex/m' || (j % 8) AS dst"
    "  FROM generate_series(0, 39) s(j) WHERE j % 2 = 0),"
    " ed AS (SELECT src, dst FROM canon UNION ALL SELECT dst, src"
    "  FROM canon UNION ALL SELECT src, dst FROM red"
    "  UNION ALL SELECT dst, src FROM red),"
    " reach(node, lab) AS (SELECT src, src FROM ed"
    "  UNION SELECT ed.dst, r.lab FROM reach r"
    "   JOIN ed ON ed.src = r.node)"
    " SELECT node, min(lab) AS lab FROM reach GROUP BY node"
)


def q_closure_incremental(sf_dir: str):
    """Incremental closure maintenance
    (graph.transitive_closure_incremental): 20 five-node chains get
    nightly bridge-edge inserts joining even/odd chain pairs; the old
    closure is extended by ONE old-closure∘ΔE seed join + frontier
    rounds instead of recomputing from scratch. Fully oracled: the
    SQL twin computes the closure of the POST-insert edge set with a
    recursive CTE (incremental ≡ from-scratch is the contract)."""
    from ..stages.graph import (
        transitive_closure,
        transitive_closure_incremental,
    )

    base, delta = [], []
    for i in range(99):
        if i % 5 != 4:
            base.append({"child": i, "parent": i + 1})
        elif (i // 5) % 2 == 0:
            delta.append({"child": i, "parent": i + 1})
    all_e = base + delta
    C = transitive_closure(
        rd.from_arrow(pa.Table.from_pylist(base)).repartition(3),
        nb=8).materialize()
    out = transitive_closure_incremental(
        C, pa.Table.from_pylist(delta), pa.Table.from_pylist(all_e),
        nb=8)
    df = (out.to_pandas().sort_values(["node", "anc"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["closure_incremental"] = q_closure_incremental

ORACLES["closure_incremental"] = (
    "WITH RECURSIVE e AS ("
    " SELECT i AS c, i + 1 AS p FROM generate_series(0, 98) s(i)"
    "  WHERE i % 5 <> 4 OR ((i // 5) % 2 = 0)),"
    " cl(node, anc) AS (SELECT c, p FROM e"
    "  UNION SELECT cl.node, e.p FROM cl JOIN e ON e.c = cl.anc)"
    " SELECT CAST(node AS BIGINT) AS node, CAST(anc AS BIGINT) AS anc"
    " FROM cl"
)


def q_fact_intervals(sf_dir: str):
    """Temporal fact compaction (windows.fact_intervals): each user's
    event_type stream compacts into validity intervals — consecutive
    same-value observations merge; valid_to = next island's start,
    null while current. Fully oracled: LAG-boundary + running-SUM
    islands + LEAD twin."""
    from ..stages.windows import fact_intervals

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    obs = ev.map_batches(
        lambda t: pa.table({
            "subj": pc.binary_join_element_wise(
                pa.array(["u"] * t.num_rows),
                t.column("user_id").cast(pa.string()), ""),
            "pred": pa.array(["status"] * t.num_rows),
            "obj": t.column("event_type"),
            "ts": t.column("ts")}),
        batch_format="pyarrow")
    out = fact_intervals(obs, nb=16)
    df = (out.to_pandas()
          .sort_values(["subj", "valid_from", "obj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["fact_intervals"] = q_fact_intervals

ORACLES["fact_intervals"] = (
    "WITH obs AS (SELECT 'u' || user_id AS subj, 'status' AS pred,"
    "  event_type AS obj, ts FROM events),"
    " l AS (SELECT subj, pred, obj, ts,"
    "  CASE WHEN LAG(ts) OVER w IS NULL THEN 1"
    "   WHEN obj IS DISTINCT FROM LAG(obj) OVER w THEN 1 ELSE 0 END"
    "   AS chg FROM obs"
    "  WINDOW w AS (PARTITION BY subj, pred ORDER BY ts, obj)),"
    " isl AS (SELECT subj, pred, obj, ts, SUM(chg) OVER"
    "  (PARTITION BY subj, pred ORDER BY ts, obj"
    "   ROWS UNBOUNDED PRECEDING) AS island FROM l),"
    " g AS (SELECT subj, pred, obj, island, MIN(ts) AS valid_from,"
    "  COUNT(*) AS n_obs FROM isl GROUP BY 1, 2, 3, 4),"
    " f AS (SELECT subj, pred, obj, valid_from,"
    "  LEAD(valid_from) OVER (PARTITION BY subj, pred"
    "   ORDER BY island) AS valid_to,"
    "  CAST(n_obs AS BIGINT) AS n_obs FROM g)"
    " SELECT subj, pred, obj, valid_from, valid_to, n_obs FROM f"
)


def q_facts_asof(sf_dir: str):
    """Point-in-time KG lookup: the facts valid AT 2024-01-15 00:00 —
    a vectorized interval filter over the fact_intervals compaction
    (valid_from ≤ t < valid_to, open intervals included). One
    snapshot row per (subj, pred) by construction. Shares the
    fact_intervals corpus; fully oracled."""
    from ..stages.windows import fact_intervals

    t_asof = pa.scalar(pd.Timestamp("2024-01-15 00:00:00"),
                       pa.timestamp("us"))
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    obs = ev.map_batches(
        lambda t: pa.table({
            "subj": pc.binary_join_element_wise(
                pa.array(["u"] * t.num_rows),
                t.column("user_id").cast(pa.string()), ""),
            "pred": pa.array(["status"] * t.num_rows),
            "obj": t.column("event_type"),
            "ts": t.column("ts")}),
        batch_format="pyarrow")

    def at(t: pa.Table, q=t_asof) -> pa.Table:
        keep = pc.and_(
            pc.less_equal(t.column("valid_from"), q),
            pc.fill_null(pc.greater(t.column("valid_to"), q), True))
        return t.filter(keep).select(["subj", "pred", "obj"])

    out = fact_intervals(obs, nb=16).map_batches(
        at, batch_format="pyarrow")
    df = out.to_pandas().sort_values("subj").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["facts_asof"] = q_facts_asof

ORACLES["facts_asof"] = (
    "WITH obs AS (SELECT 'u' || user_id AS subj, 'status' AS pred,"
    "  event_type AS obj, ts FROM events),"
    " l AS (SELECT subj, pred, obj, ts,"
    "  CASE WHEN LAG(ts) OVER w IS NULL THEN 1"
    "   WHEN obj IS DISTINCT FROM LAG(obj) OVER w THEN 1 ELSE 0 END"
    "   AS chg FROM obs"
    "  WINDOW w AS (PARTITION BY subj, pred ORDER BY ts, obj)),"
    " isl AS (SELECT subj, pred, obj, ts, SUM(chg) OVER"
    "  (PARTITION BY subj, pred ORDER BY ts, obj"
    "   ROWS UNBOUNDED PRECEDING) AS island FROM l),"
    " g AS (SELECT subj, pred, obj, island, MIN(ts) AS valid_from"
    "  FROM isl GROUP BY 1, 2, 3, 4),"
    " f AS (SELECT subj, pred, obj, valid_from,"
    "  LEAD(valid_from) OVER (PARTITION BY subj, pred"
    "   ORDER BY island) AS valid_to FROM g)"
    " SELECT subj, pred, obj FROM f"
    " WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'"
    "  AND (valid_to IS NULL OR valid_to > TIMESTAMP"
    "   '2024-01-15 00:00:00')"
)


_HEARST_SUFFIXES = np.array([
    " mammals such as dogs, cats and foxes",
    " metals including iron, zinc",
    " oaks, pines and other trees",
    " fruits especially apples",
    " gems such as rubies or emeralds",
    "",
    "",
], dtype=object)


def q_hearst_isa(sf_dir: str):
    """Hearst-pattern is-a extraction (relations.extract_hearst): the
    text→triple step of KG construction. Deterministic pattern
    sentences are planted per doc_id (the synthetic corpus has no
    natural hypernym phrasing — same approach as pii_redact); the
    extractor then mines (hypo, isa, hyper) triples with four
    RE2-replayable Hearst patterns. Fully oracled: the SQL twin
    augments identically and replays every regex + the list splitter
    in DuckDB."""
    from ..stages.relations import extract_hearst

    docs = _docs(sf_dir, ["doc_id", "text"])

    def aug(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        suf = pa.array(_HEARST_SUFFIXES[ids % 7], pa.string())
        txt = pc.binary_join_element_wise(t.column("text"), suf, "")
        return pa.table({"doc_id": t.column("doc_id"), "text": txt})

    out = docs.map_batches(aug, batch_format="pyarrow").map_batches(
        extract_hearst, batch_format="pyarrow")
    df = (out.to_pandas()
          .sort_values(["doc_id", "pattern", "subj"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["hearst_isa"] = q_hearst_isa

_HEARST_AUG_SQL = (
    "SELECT doc_id, lower(text || CASE CAST(doc_id % 7 AS INTEGER)"
    "  WHEN 0 THEN ' mammals such as dogs, cats and foxes'"
    "  WHEN 1 THEN ' metals including iron, zinc'"
    "  WHEN 2 THEN ' oaks, pines and other trees'"
    "  WHEN 3 THEN ' fruits especially apples'"
    "  WHEN 4 THEN ' gems such as rubies or emeralds'"
    "  ELSE '' END) AS txt FROM documents"
)

ORACLES["hearst_isa"] = (
    "WITH aug AS (" + _HEARST_AUG_SQL + "),"
    " m1 AS (SELECT doc_id, unnest(regexp_extract_all(txt,"
    "  '(\\w+) such as (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)'))"
    "  AS m FROM aug),"
    " e1 AS (SELECT doc_id, unnest(regexp_split_to_array("
    "   regexp_extract(m,"
    "   '(\\w+) such as (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 2),"
    "   ',? (?:and|or) |, ')) AS subj,"
    "  regexp_extract(m,"
    "   '(\\w+) such as (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 1)"
    "   AS obj, 'such_as' AS pattern FROM m1),"
    " m2 AS (SELECT doc_id, unnest(regexp_extract_all(txt,"
    "  '(\\w+) including (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)'))"
    "  AS m FROM aug),"
    " e2 AS (SELECT doc_id, unnest(regexp_split_to_array("
    "   regexp_extract(m,"
    "   '(\\w+) including (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 2),"
    "   ',? (?:and|or) |, ')) AS subj,"
    "  regexp_extract(m,"
    "   '(\\w+) including (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 1)"
    "   AS obj, 'including' AS pattern FROM m2),"
    " m3 AS (SELECT doc_id, unnest(regexp_extract_all(txt,"
    "  '(\\w+) especially (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)'))"
    "  AS m FROM aug),"
    " e3 AS (SELECT doc_id, unnest(regexp_split_to_array("
    "   regexp_extract(m,"
    "   '(\\w+) especially (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 2),"
    "   ',? (?:and|or) |, ')) AS subj,"
    "  regexp_extract(m,"
    "   '(\\w+) especially (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 1)"
    "   AS obj, 'especially' AS pattern FROM m3),"
    " m4 AS (SELECT doc_id, unnest(regexp_extract_all(txt,"
    "  '(\\w+(?:, \\w+)*) and other (\\w+)')) AS m FROM aug),"
    " e4 AS (SELECT doc_id, unnest(regexp_split_to_array("
    "   regexp_extract(m, '(\\w+(?:, \\w+)*) and other (\\w+)', 1),"
    "   ',? (?:and|or) |, ')) AS subj,"
    "  regexp_extract(m, '(\\w+(?:, \\w+)*) and other (\\w+)', 2)"
    "   AS obj, 'and_other' AS pattern FROM m4)"
    " SELECT doc_id, subj, 'isa' AS pred, obj, pattern FROM"
    " (SELECT * FROM e1 UNION ALL SELECT * FROM e2"
    "  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)"
)


def q_mine_rules(sf_dir: str):
    """AMIE-lite rule mining (graph.mine_rules): confidence +
    head-coverage of every supported 2-hop chain rule
    p1(x,y) ∧ p2(y,z) ⇒ p3(x,z) over a deterministic synthetic KG
    (worksFor/locatedIn/livesIn/inCountry/citizenOf/knows — planted
    so three rules hold with distinct confidences). Fully oracled:
    the SQL twin regenerates the KG with generate_series and replays
    body/support/head censuses with joins + GROUP BYs."""
    from ..stages.graph import mine_rules

    rows = []
    for i in range(60):
        rows.append({"subj": f"p{i}", "pred": "worksFor",
                     "obj": f"org{i % 10}"})
    for j in range(10):
        rows.append({"subj": f"org{j}", "pred": "locatedIn",
                     "obj": f"city{j % 5}"})
    for i in range(0, 60, 3):
        rows.append({"subj": f"p{i}", "pred": "livesIn",
                     "obj": f"city{(i % 10) % 5}"})
    for k in range(5):
        rows.append({"subj": f"city{k}", "pred": "inCountry",
                     "obj": f"country{k % 2}"})
    for i in range(0, 60, 6):
        rows.append({"subj": f"p{i}", "pred": "citizenOf",
                     "obj": f"country{((i % 10) % 5) % 2}"})
    for i in range(60):
        rows.append({"subj": f"p{i}", "pred": "knows",
                     "obj": f"p{(i + 1) % 60}"})
    kg = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = mine_rules(kg, nb=8)
    df = (out.to_pandas().sort_values(["p1", "p2", "p3"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["mine_rules"] = q_mine_rules

ORACLES["mine_rules"] = (
    "WITH t AS ("
    " SELECT 'p' || i AS subj, 'worksFor' AS pred,"
    "  'org' || (i % 10) AS obj FROM generate_series(0, 59) s(i)"
    " UNION ALL SELECT 'org' || j, 'locatedIn', 'city' || (j % 5)"
    "  FROM generate_series(0, 9) s(j)"
    " UNION ALL SELECT 'p' || i, 'livesIn',"
    "  'city' || ((i % 10) % 5) FROM generate_series(0, 59) s(i)"
    "  WHERE i % 3 = 0"
    " UNION ALL SELECT 'city' || k, 'inCountry',"
    "  'country' || (k % 2) FROM generate_series(0, 4) s(k)"
    " UNION ALL SELECT 'p' || i, 'citizenOf',"
    "  'country' || (((i % 10) % 5) % 2)"
    "  FROM generate_series(0, 59) s(i) WHERE i % 6 = 0"
    " UNION ALL SELECT 'p' || i, 'knows', 'p' || ((i + 1) % 60)"
    "  FROM generate_series(0, 59) s(i)),"
    " td AS (SELECT DISTINCT subj, pred, obj FROM t),"
    " body AS (SELECT DISTINCT a.pred AS p1, b.pred AS p2,"
    "  a.subj AS x, b.obj AS z FROM td a JOIN td b"
    "  ON a.obj = b.subj),"
    " bn AS (SELECT p1, p2, COUNT(*) AS body_pairs FROM body"
    "  GROUP BY 1, 2),"
    " sup AS (SELECT body.p1, body.p2, h.pred AS p3,"
    "  COUNT(*) AS support FROM body JOIN td h"
    "  ON h.subj = body.x AND h.obj = body.z GROUP BY 1, 2, 3),"
    " hn AS (SELECT pred AS p3, COUNT(*) AS head_pairs FROM td"
    "  GROUP BY 1)"
    " SELECT sup.p1, sup.p2, sup.p3,"
    "  CAST(bn.body_pairs AS BIGINT) AS body_pairs,"
    "  CAST(sup.support AS BIGINT) AS support,"
    "  round(sup.support / CAST(bn.body_pairs AS DOUBLE), 6) AS conf,"
    "  round(sup.support / CAST(hn.head_pairs AS DOUBLE), 6)"
    "   AS head_coverage"
    " FROM sup JOIN bn ON bn.p1 = sup.p1 AND bn.p2 = sup.p2"
    " JOIN hn ON hn.p3 = sup.p3"
)


def q_random_walks(sf_dir: str):
    """Seeded deterministic random walks (graph.random_walks) — the
    DeepWalk corpus-prep step, reproducible by construction: step-t
    choice = md5(node:walk:t:seed) mod outdeg, taking that rank of
    the dst-sorted neighbor list. 50-node ring+chord graph, 2 walks
    per node, length 3. Fully oracled: the SQL twin rebuilds the
    graph, replays the identical md5 draw per unrolled step, and
    joins on (node, rank)."""
    from ..stages.graph import random_walks

    rows = []
    for i in range(50):
        for d in ((i + 1) % 50, (i + 3) % 50, (2 * i) % 50):
            rows.append({"src": i, "dst": d})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = random_walks(ds, walk_len=3, walks_per_node=2, seed=7, nb=8)
    df = (out.to_pandas().sort_values(["start", "walk", "step"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["random_walks"] = q_random_walks


def _rw_choice_sql(w: str, t: int) -> str:
    return (
        f" c{t} AS (SELECT {w}.start, {w}.walk, {w}.node,"
        f"  CAST(('0x' || substr(md5(CAST({w}.node AS VARCHAR) || ':'"
        f"   || CAST({w}.walk AS VARCHAR) || ':{t}:7'), 1, 8))::UBIGINT"
        f"   AS BIGINT) % d.deg AS ch"
        f"  FROM {w} JOIN d ON d.src = {w}.node),"
        f" w{t} AS (SELECT c{t}.start, c{t}.walk, adj.dst AS node"
        f"  FROM c{t} JOIN adj ON adj.src = c{t}.node"
        f"   AND adj.rnk = c{t}.ch),"
    )


ORACLES["random_walks"] = (
    "WITH e AS (SELECT DISTINCT src, dst FROM ("
    " SELECT i AS src, (i + 1) % 50 AS dst"
    "  FROM generate_series(0, 49) s(i)"
    " UNION ALL SELECT i, (i + 3) % 50"
    "  FROM generate_series(0, 49) s(i)"
    " UNION ALL SELECT i, (2 * i) % 50"
    "  FROM generate_series(0, 49) s(i))),"
    " adj AS (SELECT src, dst, ROW_NUMBER() OVER"
    "  (PARTITION BY src ORDER BY dst) - 1 AS rnk,"
    "  COUNT(*) OVER (PARTITION BY src) AS deg FROM e),"
    " d AS (SELECT DISTINCT src, deg FROM adj),"
    " w0 AS (SELECT n.src AS start, g.r AS walk, n.src AS node"
    "  FROM (SELECT DISTINCT src FROM e) n,"
    "  generate_series(0, 1) g(r)),"
    + _rw_choice_sql("w0", 1) + _rw_choice_sql("w1", 2)[1:]
    + _rw_choice_sql("w2", 3)[1:-1]
    + " SELECT start, walk, CAST(0 AS BIGINT) AS step, node FROM w0"
    " UNION ALL SELECT start, walk, 1, node FROM w1"
    " UNION ALL SELECT start, walk, 2, node FROM w2"
    " UNION ALL SELECT start, walk, 3, node FROM w3"
)


_MIME_PREFIXES = [
    b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a", b"%PDF-",
    b"PK\x03\x04", b"\x1f\x8b", b"xxxxftyp", b"RIFF0000WAVE",
    b"RIFF0000WEBP", b"junkdata",
]


def q_mime_sniff(sf_dir: str):
    """Magic-byte MIME sniffing (codecs.sniff_mime): the multimodal
    triage that routes crawl payloads to decoders. Deterministic
    binary payloads are derived per doc_id (10 format families +
    id-dependent tails). Fully oracled at the HEX level: the SQL twin
    regenerates each payload's hex string and re-sniffs it with its
    own substr CASE chain — an independent second implementation."""
    from ..functions.codecs import sniff_mime

    docs = _docs(sf_dir, ["doc_id"])

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        payload = [_MIME_PREFIXES[i % 10] + b"\x01" * (i % 5)
                   for i in ids]
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": pa.array(payload, pa.binary())})

    def sniff(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "mime": sniff_mime(t.column("payload"))})

    out = (docs.map_batches(build, batch_format="pyarrow")
           .map_batches(sniff, batch_format="pyarrow"))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["mime_sniff"] = q_mime_sniff

ORACLES["mime_sniff"] = (
    "WITH b AS (SELECT doc_id, CASE CAST(doc_id % 10 AS INTEGER)"
    "  WHEN 0 THEN '89504E470D0A1A0A'"
    "  WHEN 1 THEN 'FFD8FF'"
    "  WHEN 2 THEN '474946383961'"
    "  WHEN 3 THEN '255044462D'"
    "  WHEN 4 THEN '504B0304'"
    "  WHEN 5 THEN '1F8B'"
    "  WHEN 6 THEN '7878787866747970'"
    "  WHEN 7 THEN '524946463030303057415645'"
    "  WHEN 8 THEN '524946463030303057454250'"
    "  ELSE '6A756E6B64617461' END"
    "  || repeat('01', CAST(doc_id % 5 AS INTEGER)) AS h"
    " FROM documents)"
    " SELECT doc_id, CASE"
    "  WHEN substr(h, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'"
    "  WHEN substr(h, 1, 6) = 'FFD8FF' THEN 'image/jpeg'"
    "  WHEN substr(h, 1, 12) IN ('474946383761', '474946383961')"
    "   THEN 'image/gif'"
    "  WHEN substr(h, 1, 10) = '255044462D' THEN 'application/pdf'"
    "  WHEN substr(h, 1, 8) = '504B0304' THEN 'application/zip'"
    "  WHEN substr(h, 1, 4) = '1F8B' THEN 'application/gzip'"
    "  WHEN substr(h, 9, 8) = '66747970' THEN 'video/mp4'"
    "  WHEN substr(h, 1, 8) = '52494646'"
    "   AND substr(h, 17, 8) = '57415645' THEN 'audio/wav'"
    "  WHEN substr(h, 1, 8) = '52494646'"
    "   AND substr(h, 17, 8) = '57454250' THEN 'image/webp'"
    "  ELSE 'application/octet-stream' END AS mime FROM b"
)


def q_resolve_conflicts(sf_dir: str):
    """Functional-property conflict resolution
    (graph.resolve_conflicts): per (subj, pred) of the functional
    predicates p0/p1, the max-confidence object plus the competing
    value count and winner margin. Synth multi-mention stream with
    per-group conflicting objects. Fully oracled: noisy-OR fold +
    row_number/lead/count window twin."""
    from ..stages.graph import resolve_conflicts

    rows = []
    for i in range(900):
        rows.append({"subj": f"E{i % 60}", "pred": f"p{(i // 60) % 3}",
                     "obj": f"V{(i % 15 + i // 60) % 15}",
                     "score": ((i * 7) % 9 + 1) / 10.0})
    t = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = resolve_conflicts(t, ["p0", "p1"], nb=8)
    df = (out.to_pandas().sort_values(["subj", "pred"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["resolve_conflicts"] = q_resolve_conflicts

ORACLES["resolve_conflicts"] = (
    "WITH t AS (SELECT 'E' || (i % 60) AS subj,"
    "  'p' || ((i // 60) % 3) AS pred,"
    "  'V' || ((i % 15 + i // 60) % 15) AS obj,"
    "  ((i * 7) % 9 + 1) / 10.0 AS score"
    "  FROM generate_series(0, 899) s(i)),"
    " fused AS (SELECT subj, pred, obj,"
    "  round(1.0 - exp(sum(ln(1.0 - score))), 6) AS conf"
    "  FROM t WHERE pred IN ('p0', 'p1') GROUP BY 1, 2, 3),"
    " r AS (SELECT subj, pred, obj, conf,"
    "  ROW_NUMBER() OVER w AS rn, LEAD(conf) OVER w AS nxt,"
    "  COUNT(*) OVER (PARTITION BY subj, pred) AS nv FROM fused"
    "  WINDOW w AS (PARTITION BY subj, pred"
    "   ORDER BY conf DESC, obj))"
    " SELECT subj, pred, obj, conf, CAST(nv AS BIGINT) AS n_values,"
    "  round(conf - COALESCE(nxt, conf), 6) AS margin"
    " FROM r WHERE rn = 1"
)


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (textstats.learn_bpe): the
    first 10 learned merges over the documents corpus. Rows-only by
    nature (iterative greedy merge-apply is not SQL-expressible —
    pinned against a sequential reference + fuzz in tests/test_bpe.py
    and double-run by the determinism net)."""
    from ..stages.textstats import learn_bpe

    return learn_bpe(_docs(sf_dir, ["doc_id", "text"]),
                     n_merges=10, nb=16)


QUERIES["bpe_merges"] = q_bpe_merges


def q_bpe_encode(sf_dir: str):
    """BPE train→encode composition: learn 8 merges on the corpus,
    then encode every document with them (textstats.apply_bpe) —
    per-doc word/subword counts plus the segmented text. Rows-only
    (same reason as bpe_merges)."""
    from ..stages.textstats import apply_bpe, learn_bpe

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = learn_bpe(docs, n_merges=8, nb=16)
    out = apply_bpe(docs, merges)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["bpe_encode"] = q_bpe_encode


def q_scc(sf_dir: str):
    """Strongly connected components (graph.scc, coloring + trim):
    three chained cycles of sizes 2..4 bridged by DAG edges plus a
    4-node tail chain — exercises multi-phase settling AND the trim
    peel. Fully oracled: the SQL twin labels each node with the min
    id over its mutual-reachability class via a recursive closure
    CTE."""
    from ..stages.graph import scc

    edges = []
    for c in range(3):
        base, size = c * 8, c + 2
        for i in range(size):
            edges.append({"src": base + i,
                          "dst": base + (i + 1) % size})
        if c < 2:
            edges.append({"src": base, "dst": (c + 1) * 8})
    for i in range(24, 26):
        edges.append({"src": i, "dst": i + 1})
    edges.append({"src": 16, "dst": 24})
    ds = rd.from_arrow(pa.Table.from_pylist(edges)).repartition(3)
    out = scc(ds, nb=8)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["scc"] = q_scc

ORACLES["scc"] = (
    "WITH RECURSIVE e AS ("
    " SELECT c * 8 + i AS src,"
    "  c * 8 + (i + 1) % (c + 2) AS dst"
    "  FROM generate_series(0, 2) s(c),"
    "   UNNEST(generate_series(0, c + 1)) u(i)"
    " UNION ALL SELECT c * 8, (c + 1) * 8"
    "  FROM generate_series(0, 1) s(c)"
    " UNION ALL SELECT i, i + 1 FROM generate_series(24, 25) s(i)"
    " UNION ALL SELECT 16, 24),"
    " r(a, b) AS (SELECT src, dst FROM e"
    "  UNION SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b),"
    " n AS (SELECT src AS node FROM e"
    "  UNION SELECT dst FROM e),"
    " mutual AS (SELECT node, node AS o FROM n"
    "  UNION ALL SELECT r1.a AS node, r1.b AS o FROM r r1"
    "   JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a)"
    " SELECT CAST(node AS BIGINT) AS node,"
    "  CAST(min(o) AS BIGINT) AS scc"
    " FROM mutual GROUP BY node"
)


def q_containment_join(sf_dir: str):
    """Overlap-coefficient containment join (dedup.containment_join,
    threshold 0.7): sliding 8-token windows over a 90-token universe
    (adjacent docs overlap 5/8) plus planted 4-token SUBSET docs that
    Jaccard would miss entirely. Fully oracled: the SQL twin
    regenerates both corpora, counts exact pair intersections with a
    token self-join, and applies the identical least()-denominator
    filter — ratios are raw float64 divisions on both sides."""
    from ..stages.dedup import containment_join

    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "text": " ".join(
            f"w{(i * 3 + j) % 90}" for j in range(8))})
    for k in range(20):
        rows.append({"doc_id": 100 + k, "text": " ".join(
            f"w{(k * 9 + j) % 90}" for j in range(4))})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = containment_join(ds, 0.7, nb=8)
    df = (out.to_pandas().sort_values(["id_a", "id_b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["containment_join"] = q_containment_join

ORACLES["containment_join"] = (
    "WITH base AS (SELECT i AS doc_id,"
    "  string_agg('w' || ((i * 3 + j) % 90), ' ' ORDER BY j) AS text"
    "  FROM generate_series(0, 59) s(i),"
    "   UNNEST(generate_series(0, 7)) u(j) GROUP BY i),"
    " subs AS (SELECT 100 + k AS doc_id,"
    "  string_agg('w' || ((k * 9 + j) % 90), ' ' ORDER BY j) AS text"
    "  FROM generate_series(0, 19) s(k),"
    "   UNNEST(generate_series(0, 3)) u(j) GROUP BY k),"
    " t AS (SELECT * FROM base UNION ALL SELECT * FROM subs),"
    " toks AS (SELECT doc_id, unnest(list_distinct("
    "  regexp_split_to_array(lower(text), ' '))) AS w FROM t),"
    " sizes AS (SELECT doc_id, COUNT(DISTINCT w) AS n FROM toks"
    "  GROUP BY 1),"
    " ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    "  COUNT(*) AS inter FROM toks a JOIN toks b"
    "  ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2)"
    " SELECT ix.id_a, ix.id_b, sa.n AS size_a, sb.n AS size_b,"
    "  CAST(ix.inter AS BIGINT) AS inter,"
    "  ix.inter / CAST(sa.n AS DOUBLE) AS contain_a,"
    "  ix.inter / CAST(sb.n AS DOUBLE) AS contain_b,"
    "  ix.inter / CAST(least(sa.n, sb.n) AS DOUBLE) AS overlap"
    " FROM ix JOIN sizes sa ON sa.doc_id = ix.id_a"
    " JOIN sizes sb ON sb.doc_id = ix.id_b"
    " WHERE ix.inter / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.7"
)


def q_readability(sf_dir: str):
    """Flesch/FK readability (textstats.readability) over documents
    with planted per-doc punctuation so the sentence heuristic
    varies. Fully oracled: the SQL twin replays the same \\S+ /
    [.!?]+ / [aeiouy]+ regex counts and formulas."""
    from ..stages.textstats import readability

    docs = _docs(sf_dir, ["doc_id", "text"])
    sufs = np.array(["", " one. two! three?", " four."], dtype=object)

    def aug(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        suf = pa.array(sufs[ids % 3], pa.string())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": pc.binary_join_element_wise(
                pc.fill_null(t.column("text"), ""), suf, "")})

    out = docs.map_batches(aug, batch_format="pyarrow").map_batches(
        readability, batch_format="pyarrow")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["readability"] = q_readability

ORACLES["readability"] = (
    "WITH aug AS (SELECT doc_id, coalesce(text, '') ||"
    "  CASE CAST(doc_id % 3 AS INTEGER)"
    "   WHEN 1 THEN ' one. two! three?'"
    "   WHEN 2 THEN ' four.' ELSE '' END AS t FROM documents),"
    " c AS (SELECT doc_id,"
    "  CAST(len(regexp_extract_all(t, '\\S+')) AS DOUBLE) AS w,"
    "  CAST(greatest(1, len(regexp_extract_all(t, '[.!?]+')))"
    "   AS DOUBLE) AS s,"
    "  CAST(len(regexp_extract_all(lower(t), '[aeiouy]+'))"
    "   AS DOUBLE) AS syl FROM aug)"
    " SELECT doc_id, CAST(w AS BIGINT) AS n_words,"
    "  CASE WHEN w > 0 THEN CAST(s AS BIGINT) END AS n_sentences,"
    "  CAST(syl AS BIGINT) AS n_syllables,"
    "  CASE WHEN w > 0 THEN round(206.835 - 1.015 * (w / s)"
    "   - 84.6 * (syl / w), 6) END AS flesch,"
    "  CASE WHEN w > 0 THEN round(0.39 * (w / s)"
    "   + 11.8 * (syl / w) - 15.59, 6) END AS fk_grade"
    " FROM c"
)


def q_feed_entries(sf_dir: str):
    """RSS/Atom feed-entry extraction (robots.parse_feed_entries):
    40 deterministic feeds — RSS with text links + a link-less item
    on even hosts, Atom with href links on odd hosts. Fully oracled:
    the SQL twin regenerates the XML with string_agg and re-extracts
    blocks + fields with the same RE2 patterns."""
    from ..functions.robots import parse_feed_entries

    rows = []
    for j in range(40):
        if j % 2 == 0:
            parts = []
            for i in range(3):
                if i < 2:
                    parts.append(
                        f"<item><title>T{j}_{i}</title>"
                        f"<link>https://h{j}.ex/p{i}</link>"
                        f"<pubDate>2024-01-0{i + 1}</pubDate></item>")
                else:
                    parts.append(f"<item><title>T{j}_2</title></item>")
            xml = "".join(parts)
        else:
            xml = "".join(
                f'<entry><title>A{j}_{i}</title>'
                f'<link href="https://h{j}.ex/a{i}" rel="x"/>'
                f"<updated>2024-02-0{i + 1}</updated></entry>"
                for i in range(2))
        rows.append({"url": f"https://h{j}.ex/feed", "feed_xml": xml})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = ds.map_batches(parse_feed_entries, batch_format="pyarrow")
    df = (out.to_pandas().sort_values(["url", "title"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["feed_entries"] = q_feed_entries

ORACLES["feed_entries"] = (
    "WITH rss AS (SELECT j, string_agg(CASE WHEN i < 2 THEN"
    "   '<item><title>T' || j || '_' || i || '</title><link>"
    "https://h' || j || '.ex/p' || i || '</link><pubDate>2024-01-0'"
    "   || (i + 1) || '</pubDate></item>'"
    "  ELSE '<item><title>T' || j || '_2</title></item>' END,"
    "  '' ORDER BY i) AS xml"
    "  FROM generate_series(0, 39) s(j),"
    "   UNNEST(generate_series(0, 2)) u(i)"
    "  WHERE j % 2 = 0 GROUP BY j),"
    " atoms AS (SELECT j, string_agg('<entry><title>A' || j || '_'"
    "   || i || '</title><link href=\"https://h' || j || '.ex/a'"
    "   || i || '\" rel=\"x\"/><updated>2024-02-0' || (i + 1)"
    "   || '</updated></entry>', '' ORDER BY i) AS xml"
    "  FROM generate_series(0, 39) s(j),"
    "   UNNEST(generate_series(0, 1)) u(i)"
    "  WHERE j % 2 = 1 GROUP BY j),"
    " f AS (SELECT 'https://h' || j || '.ex/feed' AS url, xml"
    "  FROM rss UNION ALL"
    "  SELECT 'https://h' || j || '.ex/feed', xml FROM atoms),"
    " blocks AS (SELECT url, unnest(regexp_extract_all(xml,"
    "  '(?s)<(?:item|entry)[\\s>].*?</(?:item|entry)>')) AS blk"
    "  FROM f)"
    " SELECT url,"
    "  nullif(regexp_extract(blk,"
    "   '(?s)<title[^>]*>\\s*([^<]*?)\\s*</title>', 1), '') AS title,"
    "  coalesce(nullif(regexp_extract(blk,"
    "    '(?s)<link[^>]*>\\s*([^<\\s][^<]*?)\\s*</link>', 1), ''),"
    "   nullif(regexp_extract(blk,"
    "    '(?i)<link\\s[^>]*href\\s*=\\s*[\"'']?([^\"''\\s>]+)', 1),"
    "    '')) AS link,"
    "  nullif(regexp_extract(blk, '(?s)<(?:pubDate|updated)[^>]*>"
    "\\s*([^<]*?)\\s*</(?:pubDate|updated)>', 1), '') AS published"
    " FROM blocks"
)


def q_zscore_events(sf_dir: str):
    """Per-event-type z-scores of event values
    (sketches.zscore_per_key): population σ, null for null values.
    Fully oracled via AVG/STDDEV_POP window twin."""
    from ..stages.sketches import zscore_per_key

    ev = _events(sf_dir, ["event_id", "event_type", "value"])
    out = zscore_per_key(ev, "event_type", "value", "event_id", nb=16)
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["zscore_events"] = q_zscore_events

ORACLES["zscore_events"] = (
    "SELECT event_id, event_type, value,"
    " CASE WHEN value IS NOT NULL AND"
    "  stddev_pop(value) OVER w > 0 THEN"
    "  round((value - avg(value) OVER w)"
    "   / stddev_pop(value) OVER w, 6) END AS z"
    " FROM events WINDOW w AS (PARTITION BY event_type)"
)


def q_cocitation(sf_dir: str):
    """Co-citation counts (graph.cocitation, mode='cocite'): pages
    cited together by the same citing pages over a deterministic
    citation graph (page i cites i%20, (i+1)%20, (i*2)%20). Fully
    oracled by a DISTINCT-edge self-join GROUP BY twin."""
    from ..stages.graph import cocitation

    rows = []
    for i in range(120):
        for d in (i % 20, (i + 1) % 20, (i * 2) % 20):
            rows.append({"src": 100 + i, "dst": d})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = cocitation(ds, mode="cocite", nb=8)
    df = (out.to_pandas().sort_values(["a", "b"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["cocitation"] = q_cocitation

ORACLES["cocitation"] = (
    "WITH e AS (SELECT DISTINCT 100 + i AS src, d AS dst FROM"
    "  generate_series(0, 119) s(i),"
    "  UNNEST([i % 20, (i + 1) % 20, (i * 2) % 20]) u(d))"
    " SELECT x.dst AS a, y.dst AS b, CAST(COUNT(*) AS BIGINT)"
    "  AS common"
    " FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst"
    " GROUP BY 1, 2"
)


def q_winsorize_events(sf_dir: str):
    """Quantile winsorization with interpolated (percentile_cont)
    bounds and a clipped audit flag (sketches.winsorize with
    cont=True, flag=...; the quantile_disc twin is
    q:winsorize_values). Fully oracled via DuckDB quantile_cont +
    least/greatest."""
    from ..stages.sketches import winsorize

    ev = _events(sf_dir, ["event_id", "value"])
    out = winsorize(ev, "value", 0.05, 0.95, out="winsorized",
                    flag="clipped", cont=True).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("winsorized"), "winsorized",
            pc.round(t.column("winsorized").cast(pa.float64()), 6)),
        batch_format="pyarrow")
    df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["winsorize_events"] = q_winsorize_events

ORACLES["winsorize_events"] = (
    "WITH b AS (SELECT quantile_cont(value, 0.05) AS lo,"
    "  quantile_cont(value, 0.95) AS hi FROM events)"
    " SELECT event_id, value,"
    "  round(least(greatest(value, b.lo), b.hi), 6) AS winsorized,"
    "  coalesce(value <> least(greatest(value, b.lo), b.hi), FALSE)"
    "   AS clipped"
    " FROM events, b"
)


def q_community_graph(sf_dir: str):
    """Community supergraph: label_propagation communities over two
    bridged K5 cliques + a path (the lpa_communities corpus), then
    graph.contract_graph rolls the ORIGINAL directed edge list up to
    community-level weighted edges. Fully oracled: the twin unrolls
    the 3 LPA rounds (vote/argmax CTEs) and re-aggregates crossing
    edges."""
    from ..stages.graph import contract_graph, label_propagation

    rows = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append({"a": base + i, "b": base + j})
    rows.append({"a": 4, "b": 10})
    for i in range(6):
        rows.append({"a": 20 + i, "b": 21 + i})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    labs = label_propagation(edges, n_iters=3, nb=8).materialize()
    out = contract_graph(edges, labs, src_col="a", dst_col="b",
                         label_col="label", nb=8)
    df = (out.to_pandas().sort_values(["la", "lb"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["community_graph"] = q_community_graph


ORACLES["community_graph"] = (
    "WITH base AS ("
    " SELECT b10 + i AS a, b10 + j AS b"
    "  FROM (VALUES (0), (10)) t(b10),"
    "   generate_series(0, 4) s(i), generate_series(0, 4) u(j)"
    "  WHERE i < j"
    " UNION ALL SELECT 4, 10"
    " UNION ALL SELECT 20 + i, 21 + i FROM generate_series(0, 5) s(i)),"
    " e AS (SELECT a AS src, b AS dst FROM base"
    "  UNION ALL SELECT b, a FROM base),"
    " l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),"
    + _LPA_VOTE.format(k=1, p=0)
    + _LPA_VOTE.format(k=2, p=1)
    + _LPA_VOTE.format(k=3, p=2)
    + " f AS (SELECT node, lab FROM l3)"
    " SELECT CAST(la.lab AS BIGINT) AS la,"
    "  CAST(lb.lab AS BIGINT) AS lb,"
    "  CAST(COUNT(*) AS BIGINT) AS weight"
    " FROM base ed JOIN f la ON la.node = ed.a"
    " JOIN f lb ON lb.node = ed.b"
    " WHERE la.lab <> lb.lab GROUP BY 1, 2"
)


def q_lca(sf_dir: str):
    """Lowest common ancestor (graph.lowest_common_ancestor) of 15
    query pairs over a 31-node binary ontology tree. Fully oracled:
    recursive ancestors CTE + self rows + depth census + row_number
    argmax twin."""
    from ..stages.graph import lowest_common_ancestor

    edges = rd.from_arrow(pa.Table.from_pylist(
        [{"child": i, "parent": (i - 1) // 2}
         for i in range(1, 31)])).repartition(2)
    pairs = rd.from_arrow(pa.Table.from_pylist(
        [{"u": i, "v": 30 - i} for i in range(15)])).repartition(2)
    out = lowest_common_ancestor(edges, pairs, nb=8)
    df = (out.to_pandas().sort_values(["u", "v"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["lca"] = q_lca

ORACLES["lca"] = (
    "WITH RECURSIVE e AS (SELECT i AS child, (i - 1) // 2 AS parent"
    "  FROM generate_series(1, 30) s(i)),"
    " anc(node, anc) AS (SELECT child, parent FROM e"
    "  UNION SELECT a.node, e.parent FROM anc a"
    "   JOIN e ON e.child = a.anc),"
    " alln AS (SELECT child AS n FROM e UNION SELECT parent FROM e),"
    " fa AS (SELECT node, anc FROM anc"
    "  UNION SELECT n, n FROM alln),"
    " dep AS (SELECT node AS anc, COUNT(*) AS d FROM anc GROUP BY 1),"
    " p AS (SELECT i AS u, 30 - i AS v"
    "  FROM generate_series(0, 14) s(i)),"
    " cand AS (SELECT p.u, p.v, a1.anc,"
    "  COALESCE(dep.d, 0) AS depth FROM p"
    "  JOIN fa a1 ON a1.node = p.u"
    "  JOIN fa a2 ON a2.node = p.v AND a2.anc = a1.anc"
    "  LEFT JOIN dep ON dep.anc = a1.anc)"
    " SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,"
    "  CAST(anc AS BIGINT) AS anc, CAST(depth AS BIGINT) AS depth"
    " FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY u, v"
    "  ORDER BY depth DESC, anc) AS rn FROM cand) q WHERE rn = 1"
)


def q_ffill_events(sf_dir: str):
    """Forward fill (windows.ffill_per_key): per-user last non-null
    value carried forward in (ts, event_id) order — every third
    value is nulled first so the fill does real work. Fully oracled
    via last_value(x IGNORE NULLS) OVER."""
    from ..stages.windows import ffill_per_key

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def holes(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").cast(pa.float64())
        keep = pa.array(ids % 3 != 0)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"), "ts": t.column("ts"),
            "value": pc.if_else(keep, v,
                                pa.scalar(None, pa.float64()))})

    out = ffill_per_key(ev.map_batches(holes, batch_format="pyarrow"),
                        nb=16)
    df = (out.to_pandas()
          .sort_values("event_id").reset_index(drop=True)
          [["event_id", "user_id", "ts", "value", "filled"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["ffill_events"] = q_ffill_events

ORACLES["ffill_events"] = (
    "WITH h AS (SELECT event_id, user_id, ts,"
    "  CASE WHEN event_id % 3 <> 0 THEN CAST(value AS DOUBLE) END"
    "   AS value FROM events)"
    " SELECT event_id, user_id, ts, value,"
    "  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id"
    "   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS filled"
    " FROM h"
)


def q_topk_per_user(sf_dir: str):
    """Generic top-k per key (windows.topk_per_key): each user's 3
    highest-value events (value DESC, event_id ASC tie-break). Fully
    oracled via ROW_NUMBER ≤ 3."""
    from ..stages.windows import topk_per_key

    ev = _events(sf_dir, ["event_id", "user_id", "value"])
    out = topk_per_key(ev, "user_id", ["value", "event_id"], 3,
                       ascending=[False, True], nb=16)
    df = (out.to_pandas().sort_values("event_id")
          .reset_index(drop=True)[["event_id", "user_id", "value"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["topk_per_user"] = q_topk_per_user

ORACLES["topk_per_user"] = (
    "SELECT event_id, user_id, value FROM ("
    " SELECT event_id, user_id, value, ROW_NUMBER() OVER ("
    "  PARTITION BY user_id ORDER BY value DESC, event_id) AS rn"
    " FROM events) q WHERE rn <= 3"
)


def q_characteristic_sets(sf_dir: str):
    """Characteristic-set census (graph.characteristic_sets — the
    Neumann/Moerkotte RDF cardinality structure): subjects grouped by
    their DISTINCT predicate set over an orders-derived KG with
    conditional predicates and planted duplicate (subj, pred) rows.
    Fully oracled: SQL dedups, string_agg-assembles the sorted
    signature per subject, and censuses signatures."""
    from ..stages.graph import characteristic_sets

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def triples(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        subj = k.astype("U20")
        subjs = [subj, subj, subj[k % 2 == 0], subj[k % 3 == 0],
                 subj[price > 100000]]
        preds = [np.full(len(s), p) for s, p in zip(
            subjs, ["status", "status", "clerk", "priority", "total"])]
        return pa.table({
            "subj": pa.array(np.concatenate(subjs), pa.string()),
            "pred": pa.array(np.concatenate(preds), pa.string())})

    out = characteristic_sets(
        orders.map_batches(triples, batch_format="pyarrow"), nb=16)
    df = (out.to_pandas().sort_values("cs").reset_index(drop=True)
          [["cs", "n_preds", "n_subjects"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["characteristic_sets"] = q_characteristic_sets

ORACLES["characteristic_sets"] = (
    "WITH t AS ("
    " SELECT CAST(o_orderkey AS VARCHAR) AS subj, 'status' AS pred"
    "  FROM orders"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'status'"
    "  FROM orders"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'clerk'"
    "  FROM orders WHERE o_orderkey % 2 = 0"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'priority'"
    "  FROM orders WHERE o_orderkey % 3 = 0"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'total'"
    "  FROM orders WHERE o_totalprice > 100000),"
    " d AS (SELECT DISTINCT subj, pred FROM t),"
    " s AS (SELECT subj, string_agg(pred, ',' ORDER BY pred) AS cs,"
    "  count(*) AS n_preds FROM d GROUP BY subj)"
    " SELECT cs, n_preds, CAST(count(*) AS BIGINT) AS n_subjects"
    " FROM s GROUP BY cs, n_preds"
)


def q_entity_table(sf_dir: str):
    """Property-table pivot (graph.entity_table): orders-derived
    triples → one wide row per entity with status/priority/tag
    columns; 'tag' is multi-valued (two objects per subject) so the
    deterministic MIN pick does real work, 'priority' is conditional
    so nulls appear. Fully oracled via MIN(CASE WHEN...) GROUP BY."""
    from ..stages.graph import entity_table

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus",
                                      "o_orderpriority"])

    def triples(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        subj = k.astype("U20")
        status = t.column("o_orderstatus").to_numpy(zero_copy_only=False)
        prio = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        even = k % 2 == 0
        subjs = np.concatenate([subj, subj[even], subj, subj])
        preds = np.concatenate([
            np.full(len(subj), "status"),
            np.full(int(even.sum()), "priority"),
            np.full(len(subj), "tag"), np.full(len(subj), "tag")])
        objs = np.concatenate([
            status.astype("U30"), prio[even].astype("U30"),
            np.char.add("a", (k % 5).astype("U2")),
            np.char.add("b", (k % 3).astype("U2"))])
        return pa.table({"subj": pa.array(subjs, pa.string()),
                         "pred": pa.array(preds, pa.string()),
                         "obj": pa.array(objs, pa.string())})

    out = entity_table(
        orders.map_batches(triples, batch_format="pyarrow"),
        ["status", "priority", "tag"], nb=16)
    df = (out.to_pandas().sort_values("subj").reset_index(drop=True)
          [["subj", "status", "priority", "tag"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["entity_table"] = q_entity_table

ORACLES["entity_table"] = (
    "WITH t AS ("
    " SELECT CAST(o_orderkey AS VARCHAR) AS subj, 'status' AS pred,"
    "  o_orderstatus AS obj FROM orders"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'priority',"
    "  o_orderpriority FROM orders WHERE o_orderkey % 2 = 0"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'tag',"
    "  'a' || CAST(o_orderkey % 5 AS VARCHAR) FROM orders"
    " UNION ALL SELECT CAST(o_orderkey AS VARCHAR), 'tag',"
    "  'b' || CAST(o_orderkey % 3 AS VARCHAR) FROM orders)"
    " SELECT subj,"
    "  MIN(CASE WHEN pred = 'status' THEN obj END) AS status,"
    "  MIN(CASE WHEN pred = 'priority' THEN obj END) AS priority,"
    "  MIN(CASE WHEN pred = 'tag' THEN obj END) AS tag"
    " FROM t GROUP BY subj"
)


def q_negative_samples(sf_dir: str):
    """KG-embedding negative sampling (graph.negative_sample_triples
    — TransE corrupt-tail protocol, reproducible md5 draws, global
    distinct-object pool ranked without a single-node sort, known
    positives anti-joined out). Fully oracled: the SQL twin replays
    the identical md5 draw, pool ranking, and anti join."""
    from ..stages.graph import negative_sample_triples

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def triples(t: pa.Table) -> pa.Table:
        kk = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "subj": pa.array(np.char.add("E", (kk % 200).astype("U4"))),
            "pred": pa.array(np.full(len(kk), "linksTo")),
            "obj": pa.array(np.char.add("E", ((kk * 7) % 200).astype("U4")))})

    out = negative_sample_triples(
        orders.map_batches(triples, batch_format="pyarrow"),
        k=2, seed=7, nb=16)
    df = (out.to_pandas()
          .sort_values(["subj", "pred", "obj_neg", "j"])
          .reset_index(drop=True)[["subj", "pred", "obj_neg", "j"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["negative_samples"] = q_negative_samples

ORACLES["negative_samples"] = (
    "WITH t AS (SELECT 'E' || CAST(o_orderkey % 200 AS VARCHAR) AS subj,"
    "  'linksTo' AS pred,"
    "  'E' || CAST((o_orderkey * 7) % 200 AS VARCHAR) AS obj FROM orders),"
    " pool AS (SELECT DISTINCT obj FROM t),"
    " ranked AS (SELECT obj AS obj_neg, ROW_NUMBER() OVER (ORDER BY"
    "  CAST(('0x' || substr(md5(obj), 1, 8))::UBIGINT AS BIGINT), obj)"
    "  AS rank FROM pool),"
    " d AS (SELECT subj, pred, obj, g.j,"
    "  CAST(('0x' || substr(md5(subj || ':' || pred || ':' || obj ||"
    "   ':' || CAST(g.j AS VARCHAR) || ':7'), 1, 8))::UBIGINT AS BIGINT)"
    "   % (SELECT count(*) FROM pool) + 1 AS rank"
    "  FROM t CROSS JOIN generate_series(0, 1) g(j)),"
    " n AS (SELECT d.subj, d.pred, r.obj_neg, d.j FROM d"
    "  JOIN ranked r USING (rank))"
    " SELECT n.subj, n.pred, n.obj_neg, CAST(n.j AS BIGINT) AS j FROM n"
    " ANTI JOIN t ON t.subj = n.subj AND t.pred = n.pred"
    "  AND t.obj = n.obj_neg"
)


def q_mad_outliers(sf_dir: str):
    """Robust per-group outlier detection (sketches.
    mad_outliers_per_key): |x − median| > 3·MAD per event_type, with
    every third value nulled so null passthrough does real work.
    Fully oracled via DuckDB median()/mad-style twin (two grouped
    medians + joins)."""
    from ..stages.sketches import mad_outliers_per_key

    ev = _events(sf_dir, ["event_id", "event_type", "value"])

    def holes(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        v = t.column("value").cast(pa.float64())
        keep = pa.array(ids % 3 != 0)
        return pa.table({
            "event_type": t.column("event_type"),
            "value": pc.if_else(keep, v, pa.scalar(None, pa.float64()))})

    out = mad_outliers_per_key(
        ev.map_batches(holes, batch_format="pyarrow"),
        "event_type", "value", k=3.0, nb=16)
    df = (out.to_pandas()
          .sort_values(["event_type", "value", "is_outlier"])
          .reset_index(drop=True)
          [["event_type", "value", "med", "mad", "is_outlier"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["mad_outliers"] = q_mad_outliers

ORACLES["mad_outliers"] = (
    "WITH h AS (SELECT event_type,"
    "  CASE WHEN event_id % 3 <> 0 THEN CAST(value AS DOUBLE) END"
    "   AS value FROM events),"
    " m AS (SELECT event_type, median(value) AS med FROM h"
    "  GROUP BY event_type),"
    " d AS (SELECT h.event_type, h.value, m.med,"
    "  abs(h.value - m.med) AS dev FROM h JOIN m USING (event_type)),"
    " md AS (SELECT event_type, median(dev) AS mad FROM d"
    "  GROUP BY event_type)"
    " SELECT d.event_type, d.value, round(d.med, 6) AS med,"
    "  round(md.mad, 6) AS mad,"
    "  CAST(CASE WHEN d.value IS NULL THEN NULL"
    "   ELSE d.dev > 3 * md.mad END AS BIGINT) AS is_outlier"
    " FROM d JOIN md USING (event_type)"
)


def q_collocations(sf_dir: str):
    """Dunning log-likelihood collocations (textstats.
    collocations_llr): significant adjacent bigrams over the
    documents table with min_count=3, the published G² phrase test.
    Fully oracled: SQL re-tokenizes with the identical regex chain,
    rebuilds bigrams positionally, and replays the 4-term LLR."""
    from ..stages.textstats import collocations_llr

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    out = collocations_llr(docs, col="text", min_count=3, nb=16)
    df = (out.to_pandas().sort_values(["w1", "w2"])
          .reset_index(drop=True)[["w1", "w2", "c12", "llr"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["collocations"] = q_collocations

ORACLES["collocations"] = (
    "WITH t AS (SELECT doc_id,"
    "  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,"
    "  len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS L"
    "  FROM documents),"
    " e AS (SELECT doc_id, i, toks[i] AS tok FROM t,"
    "  UNNEST(generate_series(1, L)) AS u(i) WHERE toks[i] <> ''),"
    " b AS (SELECT a.tok AS w1, c.tok AS w2 FROM e a"
    "  JOIN e c ON c.doc_id = a.doc_id AND c.i = a.i + 1),"
    " p AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM b"
    "  GROUP BY w1, w2),"
    " m1 AS (SELECT w1, CAST(SUM(c12) AS DOUBLE) AS c1 FROM p"
    "  GROUP BY w1),"
    " m2 AS (SELECT w2, CAST(SUM(c12) AS DOUBLE) AS c2 FROM p"
    "  GROUP BY w2),"
    " nt AS (SELECT CAST(SUM(c12) AS DOUBLE) AS n FROM p)"
    " SELECT p.w1, p.w2, p.c12, round(2 * ("
    "  CASE WHEN p.c12 > 0 THEN p.c12 * ln(p.c12 * nt.n"
    "   / (m1.c1 * m2.c2)) ELSE 0 END"
    "  + CASE WHEN m1.c1 - p.c12 > 0 THEN (m1.c1 - p.c12)"
    "   * ln((m1.c1 - p.c12) * nt.n / (m1.c1 * (nt.n - m2.c2)))"
    "   ELSE 0 END"
    "  + CASE WHEN m2.c2 - p.c12 > 0 THEN (m2.c2 - p.c12)"
    "   * ln((m2.c2 - p.c12) * nt.n / ((nt.n - m1.c1) * m2.c2))"
    "   ELSE 0 END"
    "  + CASE WHEN nt.n - m1.c1 - m2.c2 + p.c12 > 0"
    "   THEN (nt.n - m1.c1 - m2.c2 + p.c12)"
    "   * ln((nt.n - m1.c1 - m2.c2 + p.c12) * nt.n"
    "    / ((nt.n - m1.c1) * (nt.n - m2.c2))) ELSE 0 END), 6) AS llr"
    " FROM p JOIN m1 USING (w1) JOIN m2 USING (w2), nt"
    " WHERE p.c12 >= 3"
)


def q_mis(sf_dir: str):
    """Luby maximal independent set (graph.maximal_independent_set):
    deterministic md5 priorities, winners beat all alive neighbors,
    winner neighborhoods peel per round — over the orders-derived
    mod-300 conflict graph (identical at every sf; converges in 3
    rounds, independence + maximality pinned in tests). Fully
    oracled: the SQL twin unrolls 4 Luby rounds replaying the same
    60-bit md5 draws."""
    from ..stages.graph import maximal_independent_set

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array((k % 300).astype(np.int64)),
            "b": pa.array(((k * 7 + 1) % 300).astype(np.int64))})

    out = maximal_independent_set(
        orders.map_batches(edges, batch_format="pyarrow"),
        seed=7, nb=16)
    df = (out.to_pandas().sort_values("node").reset_index(drop=True)
          [["node", "mis_round"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["mis"] = q_mis


def _mis_round_sql(r: int) -> str:
    return (
        f" p{r} AS (SELECT node, CAST(('0x' || substr(md5("
        f"CAST(node AS VARCHAR) || ':{r}:7'), 1, 15))::UBIGINT"
        f" AS BIGINT) AS p FROM n{r}),"
        f" m{r} AS (SELECT e.src AS node, min(p.p) AS mp"
        f"  FROM e{r} e JOIN p{r} p ON p.node = e.dst GROUP BY e.src),"
        f" w{r} AS (SELECT a.node FROM p{r} a LEFT JOIN m{r} m"
        f"  USING (node) WHERE m.mp IS NULL OR a.p < m.mp),"
        f" rm{r} AS (SELECT node FROM w{r}"
        f"  UNION SELECT e.dst FROM e{r} e JOIN w{r} w"
        f"   ON w.node = e.src),"
        f" n{r + 1} AS (SELECT node FROM n{r}"
        f"  EXCEPT SELECT node FROM rm{r}),"
        f" e{r + 1} AS (SELECT e.src, e.dst FROM e{r} e"
        f"  JOIN n{r + 1} x ON x.node = e.src"
        f"  JOIN n{r + 1} y ON y.node = e.dst),"
    )


ORACLES["mis"] = (
    "WITH base AS (SELECT o_orderkey % 300 AS a,"
    "  (o_orderkey * 7 + 1) % 300 AS b FROM orders),"
    " e0 AS (SELECT DISTINCT a AS src, b AS dst FROM base WHERE a <> b"
    "  UNION SELECT DISTINCT b, a FROM base WHERE a <> b),"
    " n0 AS (SELECT DISTINCT src AS node FROM e0),"
    + _mis_round_sql(0)[1:] + _mis_round_sql(1)[1:]
    + _mis_round_sql(2)[1:] + _mis_round_sql(3)[1:-1]
    + " SELECT node, CAST(0 AS BIGINT) AS mis_round FROM w0"
    " UNION ALL SELECT node, 1 FROM w1"
    " UNION ALL SELECT node, 2 FROM w2"
    " UNION ALL SELECT node, 3 FROM w3"
)


def q_matching(sf_dir: str):
    """Israeli-Itai parallel maximal matching (graph.
    maximal_matching): deterministic md5 edge priorities, an edge
    matches iff it is the unique (p, u, v)-argmin at BOTH endpoints,
    matched vertices peel per round — over the orders-derived mod-300
    conflict graph (identical at every sf; converges in 3 rounds;
    validity + maximality pinned in tests). Fully oracled: the SQL
    twin unrolls 4 rounds replaying the same 60-bit md5 draws and the
    same per-vertex argmin via row_number."""
    from ..stages.graph import maximal_matching

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array((k % 300).astype(np.int64)),
            "b": pa.array(((k * 7 + 1) % 300).astype(np.int64))})

    out = maximal_matching(
        orders.map_batches(edges, batch_format="pyarrow"),
        seed=7, nb=16)
    df = (out.to_pandas().sort_values(["u", "v"])
          .reset_index(drop=True)[["u", "v", "match_round"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["matching"] = q_matching


def _matching_round_sql(r: int) -> str:
    return (
        f" p{r} AS (SELECT u, v, CAST(('0x' || substr(md5("
        f"CAST(u AS VARCHAR) || '-' || CAST(v AS VARCHAR)"
        f" || ':{r}:7'), 1, 15))::UBIGINT AS BIGINT) AS p"
        f" FROM e{r}),"
        f" i{r} AS (SELECT u AS vtx, u, v, p FROM p{r}"
        f"  UNION ALL SELECT v, u, v, p FROM p{r}),"
        f" w{r} AS (SELECT u, v FROM (SELECT vtx, u, v,"
        f"  row_number() OVER (PARTITION BY vtx ORDER BY p, u, v)"
        f"  AS rn FROM i{r}) WHERE rn = 1),"
        f" m{r} AS (SELECT u, v FROM w{r} GROUP BY u, v"
        f"  HAVING count(*) = 2),"
        f" mv{r} AS (SELECT u AS vtx FROM m{r}"
        f"  UNION SELECT v FROM m{r}),"
        f" e{r + 1} AS (SELECT u, v FROM e{r}"
        f"  WHERE u NOT IN (SELECT vtx FROM mv{r})"
        f"  AND v NOT IN (SELECT vtx FROM mv{r})),"
    )


ORACLES["matching"] = (
    "WITH base AS (SELECT o_orderkey % 300 AS a,"
    "  (o_orderkey * 7 + 1) % 300 AS b FROM orders),"
    " e0 AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v"
    "  FROM base WHERE a <> b),"
    + _matching_round_sql(0)[1:] + _matching_round_sql(1)[1:]
    + _matching_round_sql(2)[1:] + _matching_round_sql(3)[1:-1]
    + " SELECT u, v, CAST(0 AS BIGINT) AS match_round FROM m0"
    " UNION ALL SELECT u, v, 1 FROM m1"
    " UNION ALL SELECT u, v, 2 FROM m2"
    " UNION ALL SELECT u, v, 3 FROM m3"
)


def q_mst(sf_dir: str):
    """Borůvka minimum spanning forest (graph.boruvka_mst):
    per-component min outgoing edge under the (w, u, v) total order,
    pointer-doubling contraction, O(log n) rounds — over an
    orders-derived 200-node ring + heavy chords (identical at every
    sf). Fully oracled by the cycle property: every chord (w ≥ 5000)
    is the heaviest edge of its chord+ring-path cycle and every ring
    edge except the single heaviest (unique: 1 + 37·i mod 997 is
    injective below 200) survives, so the SQL twin selects ring minus
    argmax in closed form. General correctness is pinned by Kruskal-
    reference fuzz tests."""
    from ..stages.graph import boruvka_mst

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        i = (k % 200).astype(np.int64)
        ring_w = (1 + (37 * i) % 997).astype(np.float64)
        chord_b = ((13 * i + 5) % 200).astype(np.int64)
        chord_w = (5000 + i).astype(np.float64)
        return pa.table({
            "a": pa.array(np.concatenate([i, i])),
            "b": pa.array(np.concatenate([(i + 1) % 200, chord_b])),
            "w": pa.array(np.concatenate([ring_w, chord_w]))})

    out = boruvka_mst(
        orders.map_batches(edges, batch_format="pyarrow"), nb=16)
    df = (out.to_pandas().sort_values(["u", "v"])
          .reset_index(drop=True)[["u", "v", "w"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["mst"] = q_mst

ORACLES["mst"] = (
    "WITH r AS (SELECT DISTINCT o_orderkey % 200 AS i FROM orders),"
    " ring AS (SELECT least(i, (i + 1) % 200) AS u,"
    "  greatest(i, (i + 1) % 200) AS v,"
    "  CAST(1 + (37 * i) % 997 AS DOUBLE) AS w FROM r),"
    " mx AS (SELECT max(w) AS wm FROM ring)"
    " SELECT u, v, w FROM ring, mx WHERE w < wm"
)


def q_rake(sf_dir: str):
    """RAKE keyphrase extraction (textstats.rake_keyphrases): maximal
    content-token runs between stopword/non-alphanumeric delimiters,
    phrase score = Σ deg(w)/freq(w) per document — one stateless
    map_batches, no shuffle. Fully oracled: the SQL twin re-tokenizes
    with the identical regex chain, rebuilds candidate runs with the
    islands trick (position − row_number), and replays freq/deg/score
    per document."""
    from ..stages.textstats import rake_keyphrases

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out = rake_keyphrases(docs)
    df = (out.to_pandas().sort_values(["doc_id", "phrase"])
          .reset_index(drop=True)
          [["doc_id", "phrase", "n_words", "score"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["rake_keyphrases"] = q_rake

_RAKE_STOP = ("'the','a','an','and','or','of','to','in','is','are',"
              "'was','for','on','with','as','at','by','it','this',"
              "'that','be','from'")

ORACLES["rake_keyphrases"] = (
    "WITH t AS (SELECT doc_id,"
    "  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,"
    "  len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS L"
    "  FROM documents),"
    " e AS (SELECT doc_id, i, toks[i] AS tok FROM t,"
    "  UNNEST(generate_series(1, L)) AS u(i) WHERE toks[i] <> ''),"
    " c AS (SELECT doc_id, i, tok,"
    "  i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl"
    "  FROM e WHERE NOT (tok IN (" + _RAKE_STOP + ")"
    "   OR regexp_matches(tok, '[^a-z0-9]'))),"
    " runs AS (SELECT doc_id, isl,"
    "  string_agg(tok, ' ' ORDER BY i) AS phrase,"
    "  CAST(count(*) AS BIGINT) AS n_words"
    "  FROM c GROUP BY doc_id, isl),"
    " wstat AS (SELECT c.doc_id, c.tok,"
    "  count(*) AS freq, sum(r.n_words) AS deg"
    "  FROM c JOIN runs r ON r.doc_id = c.doc_id AND r.isl = c.isl"
    "  GROUP BY c.doc_id, c.tok),"
    " ps AS (SELECT c.doc_id, c.isl,"
    "  round(sum(w.deg * 1.0 / w.freq), 6) AS score"
    "  FROM c JOIN wstat w ON w.doc_id = c.doc_id AND w.tok = c.tok"
    "  GROUP BY c.doc_id, c.isl)"
    " SELECT DISTINCT r.doc_id, r.phrase, r.n_words, p.score"
    " FROM runs r JOIN ps p ON p.doc_id = r.doc_id AND p.isl = r.isl"
)


def q_textrank(sf_dir: str):
    """TextRank-style corpus keyword ranking (Mihalcea & Tarau 2004
    recast at corpus level): compose graph.cooccurrence_edges
    (distinct-token doc pairs, min_count=3) into an undirected graph
    and run the SAME damped pagerank power iteration over the STRING
    term nodes; top-50 terms by rounded rank. Pure composition of two
    existing operators — no new stage code. Fully oracled: the SQL
    twin rebuilds the pair graph with the pmi_pairs token contract
    and unrolls 3 pagerank iterations over term nodes."""
    from ..stages.graph import cooccurrence_edges, pagerank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    edges = cooccurrence_edges(docs, min_count=3)

    def und(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("t1"), "__truncated__"))
        return pa.table({
            "src": pa.concat_arrays([t.column("t1").combine_chunks(),
                                     t.column("t2").combine_chunks()]),
            "dst": pa.concat_arrays([t.column("t2").combine_chunks(),
                                     t.column("t1").combine_chunks()])})

    pr = pagerank(edges.map_batches(und, batch_format="pyarrow"),
                  src="src", dst="dst", damping=0.85, iters=3, nb=16)
    df = pr.to_pandas()
    df["rank"] = df["rank"].round(8)
    df = (df.sort_values(["rank", "node"], ascending=[False, True])
          .head(50).reset_index(drop=True)
          .rename(columns={"node": "term"})[["term", "rank"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["textrank_terms"] = q_textrank


def _textrank_oracle_sql(iters: int = 3, d: float = 0.85) -> str:
    s = (
        "WITH raw AS ("
        "  SELECT doc_id,"
        "   unnest(regexp_split_to_array(trim(text), '\\s+')) AS t,"
        "   generate_subscripts(regexp_split_to_array(trim(text),"
        "    '\\s+'), 1) AS pos"
        "  FROM documents WHERE trim(text) <> ''),"
        " firstpos AS (SELECT doc_id, t, min(pos) AS fp FROM raw"
        "   WHERE t <> '' GROUP BY 1, 2),"
        " tok AS (SELECT doc_id, t FROM ("
        "   SELECT doc_id, t, row_number() OVER"
        "     (PARTITION BY doc_id ORDER BY fp) AS rk FROM firstpos)"
        "   WHERE rk <= 2048),"
        " pairs AS (SELECT a.t AS t1, b.t AS t2"
        "   FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t"
        "   GROUP BY 1, 2 HAVING count(*) >= 3),"
        " e AS (SELECT t1 AS src, t2 AS dst FROM pairs"
        "   UNION ALL SELECT t2, t1 FROM pairs),"
        " deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS (SELECT count(*) AS n FROM nodes),"
        " r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes"
        "   CROSS JOIN nn)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node,"
            f"   sum(r.rank / deg.deg) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", em{i} AS (SELECT coalesce(sum(msum), 0) AS emitted"
            f"   FROM m{i})"
            f", r{i + 1} AS (SELECT n.node,"
            f"   (1 - {d}) / nn.n + {d} * (1 - em.emitted) / nn.n"
            f"   + coalesce({d} * m.msum, 0) AS rank"
            f"   FROM nodes n CROSS JOIN nn CROSS JOIN em{i} em"
            f"   LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT node AS term, rank FROM"
                f" (SELECT node, round(rank, 8) AS rank FROM r{iters})"
                f" ORDER BY rank DESC, term LIMIT 50")


ORACLES["textrank_terms"] = _textrank_oracle_sql(iters=3, d=0.85)


def q_change_rate(sf_dir: str):
    """Crawl revisit scheduling input (Cho & Garcia-Molina style
    change-frequency estimate): per entity, the fraction of revisits
    whose observed content differed from the previous observation —
    composed from windows.lag_per_key (previous content per key in ts
    order) + two sum_by_key censuses + one bucketed join; no new
    stage code. Content is a deterministic quantization of the events
    value column (floor(value / 50)) standing in for a page content
    hash. change_rate is null for single-observation keys."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.join import shuffle_hash_join
    from ..stages.windows import lag_per_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "value"])

    def content(t: pa.Table) -> pa.Table:
        c = pc.floor(pc.divide(t.column("value"), 50.0))
        return pa.table({"user_id": t.column("user_id"),
                         "event_id": t.column("event_id"),
                         "ts": t.column("ts"),
                         "content": c.cast(pa.int64())})

    lagged = lag_per_key(
        ev.map_batches(content, batch_format="pyarrow"),
        key_col="user_id", value_col="content",
        order_cols=["ts", "event_id"], out="prev", nb=16)

    def flags(t: pa.Table) -> pa.Table:
        chg = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("prev")),
                          pc.is_valid(t.column("content"))),
            pc.not_equal(t.column("content"), t.column("prev")))
        return pa.table({
            "user_id": t.column("user_id"),
            "chg": pc.fill_null(chg, False).cast(pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    f = lagged.map_batches(flags, batch_format="pyarrow")
    n_chg = sum_by_key(f, "user_id", "chg", nb=16,
                       out_col="n_changes")
    n_obs = sum_by_key(f, "user_id", "one", nb=16, out_col="n_obs")
    j = shuffle_hash_join(n_obs, n_chg, on=["user_id"], how="inner",
                          nb=16)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_obs").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c = t.column("n_changes").to_numpy(
            zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.round(c / (n - 1), 6)
        rate = pa.array(np.where(n > 1, r, np.nan), pa.float64())
        rate = pc.if_else(pc.is_nan(rate),
                          pa.nulls(t.num_rows, pa.float64()), rate)
        return pa.table({"user_id": t.column("user_id"),
                         "n_obs": t.column("n_obs"),
                         "n_changes": t.column("n_changes"),
                         "change_rate": rate})

    df = (j.map_batches(finish, batch_format="pyarrow").to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["url_change_rate"] = q_change_rate

ORACLES["url_change_rate"] = (
    "WITH c AS (SELECT user_id, ts, event_id,"
    "  CAST(floor(value / 50) AS BIGINT) AS content FROM events),"
    " l AS (SELECT user_id, content, lag(content) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM c),"
    " a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,"
    "  CAST(sum(CASE WHEN prev IS NOT NULL AND content IS NOT NULL"
    "   AND content <> prev THEN 1 ELSE 0 END) AS BIGINT)"
    "   AS n_changes FROM l GROUP BY user_id)"
    " SELECT user_id, n_obs, n_changes,"
    "  CASE WHEN n_obs > 1 THEN round(n_changes * 1.0 / (n_obs - 1),"
    "   6) END AS change_rate FROM a"
)


def q_katz(sf_dir: str):
    """Katz centrality (graph.katz_centrality): r ← β + α·(incoming
    score sum), 3 iterations over the same orders-derived prefix DAG
    graph_pagerank uses — the undivided-prestige counterpart of
    pagerank (no out-degree normalization, no dangling recycling).
    Fully oracled by an unrolled 3-iteration CTE twin."""
    from ..stages.graph import katz_centrality

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k, pa.int64())})

    out = katz_centrality(
        orders.map_batches(edges, batch_format="pyarrow"),
        alpha=0.1, beta=1.0, iters=3, nb=16)
    df = out.to_pandas()
    df["rank"] = df["rank"].round(8)
    return pa.Table.from_pandas(
        df.sort_values("node").reset_index(drop=True),
        preserve_index=False)


QUERIES["katz_centrality"] = q_katz


def _katz_oracle_sql(iters: int = 3, a: float = 0.1,
                     b: float = 1.0) -> str:
    s = (
        "WITH e AS (SELECT o_orderkey // 10 AS src, o_orderkey AS dst"
        "   FROM orders WHERE o_orderkey >= 10),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        f" r0 AS (SELECT node, CAST({b} AS DOUBLE) AS rank FROM nodes)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node, sum(r.rank) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node GROUP BY e.dst)"
            f", r{i + 1} AS (SELECT n.node,"
            f"   {b} + {a} * coalesce(m.msum, 0) AS rank"
            f"   FROM nodes n LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT CAST(node AS BIGINT) AS node,"
                f" round(rank, 8) AS rank FROM r{iters}")


ORACLES["katz_centrality"] = _katz_oracle_sql(iters=3, a=0.1, b=1.0)


def q_robots_directives(sf_dir: str):
    """robots.txt politeness + discovery directives (functions.
    robots.parse_crawl_delay / parse_sitemap_directives): per host,
    the selected agent section's Crawl-delay (exact-agent section
    beats *, unparseable/absent → null) and ALL section-independent
    Sitemap URLs in file order. The parse logic is pinned by pytest;
    the deterministic 30-host corpus (agent override, *-only,
    unparseable, absent, wrong-agent variants × 1–3 sitemaps) lets
    the SQL twin state the expected output in closed form — any
    engine parse regression breaks the match."""
    from ..functions.robots import (parse_crawl_delay,
                                    parse_sitemap_directives)
    from ..stages.join import shuffle_hash_join

    rows = []
    for k in range(30):
        doc = "".join(f"Sitemap: https://h{k}.test/sm_{j}.xml\n"
                      for j in range(k % 3 + 1))
        m = k % 5
        if m == 0:
            doc += (f"User-agent: gruntbot\nCrawl-delay: {k}.5\n"
                    "Disallow: /x\nUser-agent: *\nCrawl-delay: 99\n")
        elif m == 1:
            doc += f"User-agent: *\nCrawl-delay: {k}\n"
        elif m == 2:
            doc += "User-agent: *\nCrawl-delay: nope\n"
        elif m == 3:
            doc += "User-agent: *\nDisallow: /p\n"
        else:
            doc += "User-agent: other\nCrawl-delay: 3\n"
        rows.append({"host": f"h{k}.test", "robots_txt": doc})
    robots = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)

    delays = robots.map_batches(
        lambda t: parse_crawl_delay(t, agent="gruntbot"),
        batch_format="pyarrow")
    sm = robots.map_batches(parse_sitemap_directives,
                            batch_format="pyarrow")

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("host", use_threads=False).aggregate(
            [("sitemap", "count"), ("sitemap", "list")])
        return pa.table({
            "host": g.column("host"),
            "n_sitemaps": g.column("sitemap_count").cast(pa.int64()),
            "sitemaps": pc.binary_join(g.column("sitemap_list"), ",")})

    # per-host sitemap lists stay in file order: the parse emits them
    # in order and each host lives in one input row/batch
    sm_agg = sm.map_batches(agg, batch_format="pyarrow")
    j = shuffle_hash_join(sm_agg, delays, on=["host"], how="left",
                          nb=8)
    df = j.to_pandas().sort_values("host").reset_index(drop=True)
    df = df[["host", "crawl_delay", "n_sitemaps", "sitemaps"]]
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["robots_directives"] = q_robots_directives

ORACLES["robots_directives"] = (
    "WITH h AS (SELECT k, 'h' || k || '.test' AS host,"
    "  'https://h' || k || '.test/sm_' AS base"
    "  FROM generate_series(0, 29) s(k))"
    " SELECT host,"
    "  CASE WHEN k % 5 = 0 THEN k + 0.5"
    "   WHEN k % 5 = 1 THEN CAST(k AS DOUBLE) END AS crawl_delay,"
    "  CAST(k % 3 + 1 AS BIGINT) AS n_sitemaps,"
    "  CASE k % 3 WHEN 0 THEN base || '0.xml'"
    "   WHEN 1 THEN base || '0.xml,' || base || '1.xml'"
    "   ELSE base || '0.xml,' || base || '1.xml,' || base || '2.xml'"
    "  END AS sitemaps"
    " FROM h"
)


def q_twa(sf_dir: str):
    """Time-weighted average value per user (windows.
    time_weighted_avg): piecewise-constant TWAP over the events
    stream — Σ vᵢ·Δtᵢ / total span, last observation carries no span,
    single-observation keys emit null. Fully oracled by a
    lead()-window SQL twin (6-dp rounded floats)."""
    from ..stages.windows import time_weighted_avg

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "value"])
    out = time_weighted_avg(ev, nb=16)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "n_obs": t.column("n_obs"),
            "span_seconds": pc.round(t.column("span_seconds"), 6),
            "twa": pc.round(t.column("twa"), 6)})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["time_weighted_avg"] = q_twa

ORACLES["time_weighted_avg"] = (
    "WITH c AS (SELECT user_id, ts, event_id, value FROM events"
    "  WHERE ts IS NOT NULL AND value IS NOT NULL),"
    " l AS (SELECT user_id, value, ts, lead(ts) OVER ("
    "  PARTITION BY user_id ORDER BY ts, event_id) AS nts FROM c),"
    " a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,"
    "  sum(CASE WHEN nts IS NOT NULL THEN value *"
    "   (epoch_us(nts) - epoch_us(ts)) ELSE 0 END) AS num,"
    "  CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE)"
    "   AS span_us FROM l GROUP BY user_id)"
    " SELECT user_id, n_obs, round(span_us / 1e6, 6) AS span_seconds,"
    "  CASE WHEN span_us > 0 THEN round(num / span_us, 6) END AS twa"
    " FROM a"
)


def q_reciprocity(sf_dir: str):
    """Directed-graph reciprocity (graph.reciprocity): fraction of
    distinct non-loop edges whose reverse edge also exists, over an
    orders-derived 250-node directed graph. One-row result; fully
    oracled (DISTINCT + IN-transpose twin)."""
    from ..stages.graph import reciprocity

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array((k % 250).astype(np.int64)),
            "dst": pa.array(((k * 11 + 3) % 250).astype(np.int64))})

    out = reciprocity(
        orders.map_batches(edges, batch_format="pyarrow"), nb=16)
    df = out.to_pandas()
    df["reciprocity"] = df["reciprocity"].round(6)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["reciprocity"] = q_reciprocity

ORACLES["reciprocity"] = (
    "WITH e AS (SELECT DISTINCT o_orderkey % 250 AS src,"
    "  (o_orderkey * 11 + 3) % 250 AS dst FROM orders"
    "  WHERE o_orderkey % 250 <> (o_orderkey * 11 + 3) % 250),"
    " r AS (SELECT count(*) AS nr FROM e"
    "  WHERE EXISTS (SELECT 1 FROM e e2"
    "   WHERE e2.src = e.dst AND e2.dst = e.src)),"
    " n AS (SELECT count(*) AS ne FROM e)"
    " SELECT CAST(n.ne AS BIGINT) AS n_edges,"
    "  CAST(r.nr AS BIGINT) AS n_reciprocal,"
    "  round(r.nr * 1.0 / n.ne, 6) AS reciprocity FROM n, r"
)


def q_charset(sf_dir: str):
    """Charset sniffing + decoding for raw crawl bytes
    (codecs.detect_charset / CharsetDecodeStage): WHATWG priority
    order (BOM > declared <meta charset> > ASCII/UTF-8 heuristic >
    windows-1252 fallback), decode with errors='replace'. The parse
    is pinned by pytest over planted encodings; the deterministic
    40-doc corpus (8 variants × zero-padded keys) lets the SQL twin
    state charset + decoded length in closed form."""
    from ..functions.codecs import CharsetDecodeStage

    rows = []
    for k in range(40):
        tag = f"{k:04d}"
        m = k % 8
        if m == 0:
            b = b"\xef\xbb\xbf" + f"bom utf8 {tag}".encode()
        elif m == 1:
            b = b"\xff\xfe" + f"u16 {tag}".encode("utf-16-le")
        elif m == 2:
            b = (b'<meta charset="windows-1252">caf\xe9 ' + tag.encode())
        elif m == 3:
            b = (b"<META CHARSET = iso-8859-1 >x\xe8 " + tag.encode())
        elif m == 4:
            b = f"plain ascii {tag}".encode()
        elif m == 5:
            b = f"café utf8 {tag}".encode()
        elif m == 6:
            b = b"\xe9\xe8 legacy " + tag.encode()
        else:
            b = b""
        rows.append({"doc_key": k, "html": b})
    t = pa.table({
        "doc_key": pa.array([r["doc_key"] for r in rows], pa.int64()),
        "html": pa.array([r["html"] for r in rows], pa.binary())})
    out = (rd.from_arrow(t).repartition(3)
           .map_batches(CharsetDecodeStage(col="html"),
                        batch_format="pyarrow", concurrency=2)
           .map_batches(lambda b: pa.table({
               "doc_key": b.column("doc_key"),
               "charset": b.column("charset"),
               "n_chars": pc.utf8_length(
                   b.column("decoded_text")).cast(pa.int64())}),
               batch_format="pyarrow"))
    df = out.to_pandas().sort_values("doc_key").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["charset_decode"] = q_charset

ORACLES["charset_decode"] = (
    # closed-form expectation per variant: decoded lengths count
    # replaced/BOM-stripped characters exactly
    "SELECT k AS doc_key,"
    " CASE k % 8 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16-le'"
    "  WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'iso-8859-1'"
    "  WHEN 4 THEN 'ascii' WHEN 5 THEN 'utf-8'"
    "  WHEN 6 THEN 'windows-1252' ELSE 'ascii' END AS charset,"
    " CAST(CASE k % 8"
    "  WHEN 0 THEN length('bom utf8 0000')"          # BOM stripped
    "  WHEN 1 THEN length('u16 0000')"
    "  WHEN 2 THEN length('<meta charset=\"windows-1252\">café 0000')"
    "  WHEN 3 THEN length('<META CHARSET = iso-8859-1 >xè 0000')"
    "  WHEN 4 THEN length('plain ascii 0000')"
    "  WHEN 5 THEN length('café utf8 0000')"
    "  WHEN 6 THEN length('éè legacy 0000')"
    "  ELSE 0 END AS BIGINT) AS n_chars"
    " FROM generate_series(0, 39) s(k)"
)


def q_resample(sf_dir: str):
    """Fixed-interval resampling per user (windows.resample_per_key):
    epoch-anchored hourly buckets, per-(key, bucket) mean, DENSE grid
    from each key's first to last bucket with empty buckets emitted
    (null mean, n_rows 0). Fully oracled by a generate_series-grid +
    LEFT JOIN twin."""
    from ..stages.windows import resample_per_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = resample_per_key(ev, every=pd.Timedelta(hours=1),
                           agg="mean", fill="null", nb=16)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "bucket_ts": t.column("bucket_ts"),
            "mean_value": pc.round(t.column("mean_value"), 6),
            "n_rows": t.column("n_rows")})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values(["user_id", "bucket_ts"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["resample_hourly"] = q_resample

ORACLES["resample_hourly"] = (
    "WITH c AS (SELECT user_id,"
    "  epoch_us(ts) // 3600000000 AS b, value FROM events"
    "  WHERE ts IS NOT NULL),"
    " a AS (SELECT user_id, b, sum(value) AS s,"
    "  count(value) AS c, CAST(count(*) AS BIGINT) AS n"
    "  FROM c GROUP BY 1, 2),"
    " k AS (SELECT user_id, min(b) AS mb, max(b) AS xb FROM a"
    "  GROUP BY 1),"
    " grid AS (SELECT user_id, UNNEST(generate_series(mb, xb)) AS b"
    "  FROM k),"
    " j AS (SELECT grid.user_id, grid.b, a.s, a.c, a.n"
    "  FROM grid LEFT JOIN a ON a.user_id = grid.user_id"
    "   AND a.b = grid.b)"
    " SELECT user_id, make_timestamp(b * 3600000000) AS bucket_ts,"
    "  CASE WHEN c > 0 THEN round(s / c, 6) END AS mean_value,"
    "  coalesce(n, 0) AS n_rows FROM j"
)


def q_matching_weighted(sf_dir: str):
    """Locally-heaviest-edge greedy matching (Preis 1999 ½-approx of
    maximum-weight matching; graph.maximal_matching with
    weight_col): an edge matches iff it is the strict (−w, u, v)
    argmin at BOTH endpoints; matched vertices peel — over the
    orders-derived chord graph with injective weights (identical at
    every sf; converges in 3 rounds). Fully oracled: the SQL twin
    collapses parallel edges to max weight and unrolls 4 rounds of
    the same argmin."""
    from ..stages.graph import maximal_matching

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        i = (k % 200).astype(np.int64)
        return pa.table({
            "a": pa.array(i),
            "b": pa.array((i * 13 + 5) % 200),
            "w": pa.array((1.0 + (37 * i) % 997).astype(np.float64))})

    out = maximal_matching(
        orders.map_batches(edges, batch_format="pyarrow"),
        weight_col="w", nb=16)
    df = (out.to_pandas().sort_values(["u", "v"])
          .reset_index(drop=True)[["u", "v", "w", "match_round"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["matching_weighted"] = q_matching_weighted


def _wmatch_round_sql(r: int) -> str:
    return (
        f" i{r} AS (SELECT u AS vtx, u, v, w FROM e{r}"
        f"  UNION ALL SELECT v, u, v, w FROM e{r}),"
        f" w{r} AS (SELECT u, v FROM (SELECT vtx, u, v,"
        f"  row_number() OVER (PARTITION BY vtx ORDER BY -w, u, v)"
        f"  AS rn FROM i{r}) WHERE rn = 1),"
        f" m{r} AS (SELECT u, v FROM w{r} GROUP BY u, v"
        f"  HAVING count(*) = 2),"
        f" mv{r} AS (SELECT u AS vtx FROM m{r}"
        f"  UNION SELECT v FROM m{r}),"
        f" e{r + 1} AS (SELECT u, v, w FROM e{r}"
        f"  WHERE u NOT IN (SELECT vtx FROM mv{r})"
        f"  AND v NOT IN (SELECT vtx FROM mv{r})),"
    )


ORACLES["matching_weighted"] = (
    "WITH base AS (SELECT o_orderkey % 200 AS i FROM orders),"
    " raw AS (SELECT least(i, (i * 13 + 5) % 200) AS u,"
    "  greatest(i, (i * 13 + 5) % 200) AS v,"
    "  CAST(1 + (37 * i) % 997 AS DOUBLE) AS w FROM base"
    "  WHERE i <> (i * 13 + 5) % 200),"
    " e0 AS (SELECT u, v, max(w) AS w FROM raw GROUP BY u, v),"
    + _wmatch_round_sql(0)[1:] + _wmatch_round_sql(1)[1:]
    + _wmatch_round_sql(2)[1:] + _wmatch_round_sql(3)[1:-1]
    + " SELECT e.u, e.v, e.w, m.r AS match_round FROM e0 e JOIN ("
    "  SELECT u, v, CAST(0 AS BIGINT) AS r FROM m0"
    "  UNION ALL SELECT u, v, 1 FROM m1"
    "  UNION ALL SELECT u, v, 2 FROM m2"
    "  UNION ALL SELECT u, v, 3 FROM m3) m"
    "  ON m.u = e.u AND m.v = e.v"
)


def q_graph_coloring(sf_dir: str):
    """Jones–Plassmann distributed greedy coloring
    (graph.greedy_coloring): static md5 priorities, per round the
    local priority minimum among uncolored neighbors takes the
    smallest color absent from its colored neighborhood — exactly the
    sequential greedy coloring in priority order (pinned in tests) —
    over the orders-derived mod-48 double-chord graph (identical at
    every sf; converges in 6 rounds, Δ=4 → ≤5 colors). Fully oracled:
    the SQL twin unrolls 7 rounds replaying the same 60-bit md5 draws,
    with the mex as a min over non-forbidden generate_series
    candidates."""
    from ..stages.graph import greedy_coloring

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        i = (k % 48).astype(np.int64)
        return pa.table({
            "a": pa.array(np.concatenate([i, i])),
            "b": pa.array(np.concatenate(
                [(i * 17 + 3) % 48, (i * 29 + 11) % 48]))})

    out = greedy_coloring(
        orders.map_batches(edges, batch_format="pyarrow"), nb=16)
    df = (out.to_pandas().sort_values("node")
          .reset_index(drop=True)[["node", "color", "color_round"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["graph_coloring"] = q_graph_coloring


def _coloring_round_sql(r: int) -> str:
    return (
        f" m{r} AS MATERIALIZED (SELECT e.src AS node, min(p2.p) AS mp"
        f"  FROM ea{r} e JOIN pr p2 ON p2.node = e.dst"
        f"  GROUP BY e.src),"
        f" w{r} AS MATERIALIZED (SELECT a.node FROM n{r} a"
        f"  JOIN pr ON pr.node = a.node"
        f"  LEFT JOIN m{r} m ON m.node = a.node"
        f"  WHERE m.mp IS NULL OR pr.p < m.mp),"
        f" f{r} AS MATERIALIZED (SELECT w.node, c.color FROM w{r} w"
        f"  JOIN e0 e ON e.src = w.node"
        f"  JOIN c{r} c ON c.node = e.dst),"
        f" a{r} AS MATERIALIZED (SELECT w.node, min(s.k) AS color"
        f"  FROM w{r} w CROSS JOIN generate_series(0, 8) s(k)"
        f"  LEFT JOIN f{r} f ON f.node = w.node AND f.color = s.k"
        f"  WHERE f.node IS NULL GROUP BY w.node),"
        f" c{r + 1} AS MATERIALIZED (SELECT * FROM c{r} UNION ALL"
        f"  SELECT node, color, CAST({r} AS BIGINT) FROM a{r}),"
        f" n{r + 1} AS MATERIALIZED (SELECT node FROM n{r}"
        f"  EXCEPT SELECT node FROM w{r}),"
        f" ea{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM ea{r} e"
        f"  JOIN n{r + 1} x ON x.node = e.src"
        f"  JOIN n{r + 1} y ON y.node = e.dst),"
    )


ORACLES["graph_coloring"] = (
    "WITH base AS MATERIALIZED (SELECT o_orderkey % 48 AS i FROM orders),"
    " raw AS MATERIALIZED (SELECT i AS a, (i * 17 + 3) % 48 AS b FROM base"
    "  UNION ALL SELECT i, (i * 29 + 11) % 48 FROM base),"
    " e0 AS MATERIALIZED (SELECT DISTINCT a AS src, b AS dst FROM raw"
    "  WHERE a <> b"
    "  UNION SELECT DISTINCT b, a FROM raw WHERE a <> b),"
    " ea0 AS MATERIALIZED (SELECT src, dst FROM e0),"
    " n0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e0),"
    " pr AS MATERIALIZED (SELECT node, substr(md5("
    "  CAST(node AS VARCHAR) || ':0'), 1, 15)"
    "  || ':' || CAST(node AS VARCHAR) AS p FROM n0),"
    " c0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS node,"
    "  CAST(NULL AS BIGINT) AS color,"
    "  CAST(NULL AS BIGINT) AS color_round WHERE 1 = 0),"
    + _coloring_round_sql(0)[1:] + _coloring_round_sql(1)[1:]
    + _coloring_round_sql(2)[1:] + _coloring_round_sql(3)[1:]
    + _coloring_round_sql(4)[1:] + _coloring_round_sql(5)[1:]
    + _coloring_round_sql(6)[1:-1]
    + " SELECT node, color, color_round FROM c7"
)


def q_label_spreading(sf_dir: str):
    """Seeded majority-vote label propagation (graph.label_spreading
    — the clamped-seed classifier, not LPA community detection):
    seeds = every 12th node labeled node%3, per round an unlabeled
    node adopts the majority label of its labeled neighbors (smallest
    label on ties) — over the orders-derived mod-60 double-chord
    graph (identical at every sf; converges in 3 rounds, all 60 nodes
    labeled). Fully oracled: the SQL twin unrolls 4 rounds of the
    same count-argmax."""
    from ..stages.graph import label_spreading

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        i = (k % 60).astype(np.int64)
        return pa.table({
            "a": pa.array(np.concatenate([i, i])),
            "b": pa.array(np.concatenate(
                [(i * 7 + 2) % 60, (i * 11 + 5) % 60]))})

    seeds = pa.table({
        "node": pa.array(list(range(0, 60, 12)), pa.int64()),
        "label": pa.array([n % 3 for n in range(0, 60, 12)],
                          pa.int64())})
    out = label_spreading(
        orders.map_batches(edges, batch_format="pyarrow"), seeds,
        nb=16)
    df = (out.to_pandas().sort_values("node")
          .reset_index(drop=True)[["node", "label", "spread_round"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["label_spreading"] = q_label_spreading


def _spread_round_sql(r: int) -> str:
    return (
        f" msg{r} AS MATERIALIZED (SELECT e.src AS node, l.label"
        f"  FROM e0 e JOIN l{r} l ON l.node = e.dst"
        f"  WHERE e.src NOT IN (SELECT node FROM l{r})),"
        f" cnt{r} AS MATERIALIZED (SELECT node, label,"
        f"  count(*) AS n FROM msg{r} GROUP BY 1, 2),"
        f" a{r} AS MATERIALIZED (SELECT node, label FROM ("
        f"  SELECT node, label, row_number() OVER (PARTITION BY node"
        f"   ORDER BY n DESC, label) AS rk FROM cnt{r}) WHERE rk = 1),"
        f" l{r + 1} AS MATERIALIZED (SELECT * FROM l{r} UNION ALL"
        f"  SELECT node, label, CAST({r + 1} AS BIGINT) FROM a{r}),"
    )


ORACLES["label_spreading"] = (
    "WITH base AS MATERIALIZED (SELECT o_orderkey % 60 AS i"
    "  FROM orders),"
    " raw AS MATERIALIZED (SELECT i AS a, (i * 7 + 2) % 60 AS b"
    "  FROM base"
    "  UNION ALL SELECT i, (i * 11 + 5) % 60 FROM base),"
    " e0 AS MATERIALIZED (SELECT DISTINCT a AS src, b AS dst"
    "  FROM raw WHERE a <> b"
    "  UNION SELECT DISTINCT b, a FROM raw WHERE a <> b),"
    " l0 AS MATERIALIZED (SELECT (s.k * 12) AS node,"
    "  (s.k * 12) % 3 AS label, CAST(0 AS BIGINT) AS spread_round"
    "  FROM generate_series(0, 4) s(k)),"
    + _spread_round_sql(0)[1:] + _spread_round_sql(1)[1:]
    + _spread_round_sql(2)[1:] + _spread_round_sql(3)[1:-1]
    + " SELECT node, label, spread_round FROM l4"
)


def q_void_stats(sf_dir: str):
    """VoID dataset statistics (graph.void_stats): dataset totals +
    per-predicate propertyPartition + per-class classPartition over
    triples derived from events (subj=u<user>, pred=event_type,
    obj=e<event> plus rdf:type fan-out to C<user%4>). Fully oracled:
    plain GROUP BY / COUNT(DISTINCT) / UNION ALL in SQL."""
    from ..stages.graph import void_stats

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type"])

    def _flat(x):
        return (x.combine_chunks() if isinstance(x, pa.ChunkedArray)
                else x)

    def to_triples(t: pa.Table) -> pa.Table:
        u = t.column("user_id").cast(pa.string())
        subj = _flat(pc.binary_join_element_wise(pa.scalar("u"), u, ""))
        obj = _flat(pc.binary_join_element_wise(
            pa.scalar("e"), t.column("event_id").cast(pa.string()), ""))
        um = t.column("user_id").to_numpy(zero_copy_only=False)
        cls = _flat(pc.binary_join_element_wise(
            pa.scalar("C"),
            pa.array((um % 4).astype(np.int64)).cast(pa.string()), ""))
        typ = pa.array(["rdf:type"] * t.num_rows, pa.string())
        return pa.table({
            "subj": pa.concat_arrays([subj, subj]),
            "pred": pa.concat_arrays([
                _flat(t.column("event_type").cast(pa.string())), typ]),
            "obj": pa.concat_arrays([obj, cls])})

    out = void_stats(ev.map_batches(to_triples, batch_format="pyarrow"),
                     nb=16)
    df = (out.to_pandas().sort_values(["part", "key"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["void_stats"] = q_void_stats


ORACLES["void_stats"] = (
    "WITH t AS MATERIALIZED ("
    "  SELECT 'u' || CAST(user_id AS VARCHAR) AS subj,"
    "   event_type AS pred,"
    "   'e' || CAST(event_id AS VARCHAR) AS obj FROM events"
    "  UNION ALL"
    "  SELECT 'u' || CAST(user_id AS VARCHAR), 'rdf:type',"
    "   'C' || CAST(user_id % 4 AS VARCHAR) FROM events)"
    " SELECT 'dataset' AS part, '(all)' AS key,"
    "  count(*) AS n_triples,"
    "  count(DISTINCT subj) AS n_subjects,"
    "  count(DISTINCT obj) AS n_objects FROM t"
    " UNION ALL"
    " SELECT 'predicate', pred, count(*),"
    "  count(DISTINCT subj), count(DISTINCT obj)"
    " FROM t GROUP BY pred"
    " UNION ALL"
    " SELECT 'class', obj, count(*), count(DISTINCT subj),"
    "  CAST(NULL AS BIGINT)"
    " FROM t WHERE pred = 'rdf:type' GROUP BY obj"
)


def q_frequent_itemsets(sf_dir: str):
    """Distributed a-priori frequent itemsets
    (sketches.frequent_itemsets): baskets = users, items = event
    types observed with value >= 30, itemsets of size 1-3 occurring
    in >= 40%-of-users baskets. Fully oracled: DISTINCT-pair
    self-joins + HAVING in SQL (the a-priori pruning is an
    efficiency device, not a semantic one)."""
    from ..stages.canonicalize import dedup_exact
    from ..stages.sketches import frequent_itemsets

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "value"])
    ev = ev.map_batches(
        lambda t: t.filter(pc.and_kleene(
            pc.is_valid(t.column("value")),
            pc.greater_equal(t.column("value"), pa.scalar(30.0)))),
        batch_format="pyarrow")
    n_users = dedup_exact(
        ev.map_batches(lambda t: t.select(["user_id"]),
                       batch_format="pyarrow"),
        ["user_id"], nb=8).count()
    support = int(-(-n_users * 2 // 5))  # ceil(0.4 * n_users)
    out = frequent_itemsets(ev, "user_id", "event_type",
                            min_support=support, nb=16)
    df = (out.to_pandas().sort_values(["size", "i1", "i2", "i3"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["frequent_itemsets"] = q_frequent_itemsets


ORACLES["frequent_itemsets"] = (
    "WITH b AS MATERIALIZED (SELECT DISTINCT user_id AS bk,"
    "  event_type AS it FROM events"
    "  WHERE value IS NOT NULL AND value >= 30),"
    " s AS MATERIALIZED (SELECT CAST(ceil("
    "  0.4 * count(DISTINCT bk)) AS BIGINT) AS v FROM b)"
    " SELECT it AS i1, CAST(NULL AS VARCHAR) AS i2,"
    "  CAST(NULL AS VARCHAR) AS i3, CAST(1 AS BIGINT) AS size,"
    "  count(*) AS n_baskets"
    " FROM b GROUP BY it HAVING count(*) >= (SELECT v FROM s)"
    " UNION ALL"
    " SELECT x.it, y.it, NULL, 2, count(*)"
    " FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it"
    " GROUP BY 1, 2 HAVING count(*) >= (SELECT v FROM s)"
    " UNION ALL"
    " SELECT x.it, y.it, z.it, 3, count(*)"
    " FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it"
    "  JOIN b z ON x.bk = z.bk AND y.it < z.it"
    " GROUP BY 1, 2, 3 HAVING count(*) >= (SELECT v FROM s)"
)


def q_dsir_select(sf_dir: str):
    """DSIR importance selection (textstats.dsir_select — Xie et al.
    2023 data selection): target LM = source 'src0' docs, raw LM =
    the whole pool, explicit top-64 target vocabulary, add-one
    smoothing, keep the 100 docs with the highest target/raw
    log-likelihood ratio. Fully oracled: both unigram LMs, the LLR
    weights and the row_number cutoff replay in SQL over the same
    whitespace tokenization."""
    from ..stages.textstats import dsir_select

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    target = docs.filter(expr="source == 'src0'")
    out = dsir_select(docs, target, top_n=100, vocab_size=64, nb=16)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "score": pc.round(t.column("score"), 6),
            "n_vocab_tokens": t.column("n_vocab_tokens")})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["dsir_select"] = q_dsir_select


ORACLES["dsir_select"] = (
    "WITH tgt AS MATERIALIZED (SELECT unnest(regexp_split_to_array("
    "  trim(lower(text)), '\\s+')) AS t FROM documents"
    "  WHERE source = 'src0'),"
    " tgt2 AS MATERIALIZED (SELECT t FROM tgt WHERE t <> ''),"
    " v AS MATERIALIZED (SELECT t, n FROM (SELECT t, count(*) AS n,"
    "  row_number() OVER (ORDER BY count(*) DESC, t) AS rk"
    "  FROM tgt2 GROUP BY t) WHERE rk <= 64),"
    " raw AS MATERIALIZED (SELECT doc_id, unnest("
    "  regexp_split_to_array(trim(lower(text)), '\\s+')) AS t"
    "  FROM documents),"
    " raw2 AS MATERIALIZED (SELECT doc_id, t FROM raw"
    "  WHERE t <> ''),"
    " vc AS MATERIALIZED (SELECT count(*) AS nv FROM v),"
    " rc AS MATERIALIZED (SELECT v.t, count(r.t) AS n FROM v"
    "  LEFT JOIN raw2 r ON r.t = v.t GROUP BY v.t),"
    " tots AS MATERIALIZED (SELECT (SELECT sum(n) FROM v) AS nt,"
    "  (SELECT sum(n) FROM rc) AS nr),"
    " llr AS MATERIALIZED (SELECT v.t,"
    "  ln((v.n + 1.0) / (tots.nt + vc.nv))"
    "  - ln((rc.n + 1.0) / (tots.nr + vc.nv)) AS w"
    "  FROM v JOIN rc ON rc.t = v.t CROSS JOIN tots CROSS JOIN vc),"
    " ds AS MATERIALIZED (SELECT d.doc_id,"
    "  coalesce(sum(l.w), 0.0) AS score,"
    "  CAST(count(l.t) AS BIGINT) AS n_vocab_tokens"
    "  FROM documents d LEFT JOIN raw2 r ON r.doc_id = d.doc_id"
    "  LEFT JOIN llr l ON l.t = r.t GROUP BY d.doc_id)"
    " SELECT doc_id, round(score, 6) AS score, n_vocab_tokens"
    " FROM (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id)"
    "  AS rk FROM ds) WHERE rk <= 100"
)


def q_condensation(sf_dir: str):
    """Condensation DAG (graph.condensation): SCCs contract to their
    min-id node, distinct cross-component edges survive weighted by
    collapsed-edge count — over the same three-cycle + tail graph as
    q:scc. Fully oracled: the scc closure CTE relabels endpoints in
    SQL."""
    from ..stages.graph import condensation

    edges = []
    for c in range(3):
        base, size = c * 8, c + 2
        for i in range(size):
            edges.append({"src": base + i,
                          "dst": base + (i + 1) % size})
        if c < 2:
            edges.append({"src": base, "dst": (c + 1) * 8})
    for i in range(24, 26):
        edges.append({"src": i, "dst": i + 1})
    edges.append({"src": 16, "dst": 24})
    ds = rd.from_arrow(pa.Table.from_pylist(edges)).repartition(3)
    out = condensation(ds, nb=8)
    df = (out.to_pandas().sort_values(["src_scc", "dst_scc"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["condensation"] = q_condensation

ORACLES["condensation"] = (
    "WITH RECURSIVE e AS ("
    " SELECT c * 8 + i AS src,"
    "  c * 8 + (i + 1) % (c + 2) AS dst"
    "  FROM generate_series(0, 2) s(c),"
    "   UNNEST(generate_series(0, c + 1)) u(i)"
    " UNION ALL SELECT c * 8, (c + 1) * 8"
    "  FROM generate_series(0, 1) s(c)"
    " UNION ALL SELECT i, i + 1 FROM generate_series(24, 25) s(i)"
    " UNION ALL SELECT 16, 24),"
    " r(a, b) AS (SELECT src, dst FROM e"
    "  UNION SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b),"
    " n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
    " mutual AS (SELECT node, node AS o FROM n"
    "  UNION ALL SELECT r1.a AS node, r1.b AS o FROM r r1"
    "   JOIN r r2 ON r2.a = r1.b AND r2.b = r1.a),"
    " lab AS (SELECT node, min(o) AS scc FROM mutual GROUP BY node)"
    " SELECT CAST(ls.scc AS BIGINT) AS src_scc,"
    "  CAST(ld.scc AS BIGINT) AS dst_scc,"
    "  count(*) AS n_edges"
    " FROM (SELECT DISTINCT src, dst FROM e) de"
    " JOIN lab ls ON ls.node = de.src"
    " JOIN lab ld ON ld.node = de.dst"
    " WHERE ls.scc <> ld.scc GROUP BY 1, 2"
)


def q_vocab_richness(sf_dir: str):
    """Per-source vocabulary richness (textstats.vocab_richness):
    token totals, distinct types, singletons/doubletons, bias-
    corrected Chao1 and Good-Turing unseen mass. Fully oracled: both
    estimators are closed-form over a GROUP BY twin."""
    from ..stages.textstats import vocab_richness

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "source"])
    out = vocab_richness(docs, "source", "text", nb=16)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "n_tokens": t.column("n_tokens"),
            "n_distinct": t.column("n_distinct"),
            "f1": t.column("f1"), "f2": t.column("f2"),
            "chao1": pc.round(t.column("chao1"), 6),
            "gt_unseen": pc.round(t.column("gt_unseen"), 6)})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values("source").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["vocab_richness"] = q_vocab_richness

ORACLES["vocab_richness"] = (
    "WITH tok AS MATERIALIZED (SELECT source, unnest("
    "  regexp_split_to_array(trim(lower(text)), '\\s+')) AS t"
    "  FROM documents),"
    " tok2 AS MATERIALIZED (SELECT source, t FROM tok"
    "  WHERE t <> ''),"
    " c AS MATERIALIZED (SELECT source, t, count(*) AS n"
    "  FROM tok2 GROUP BY 1, 2)"
    " SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,"
    "  count(*) AS n_distinct,"
    "  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,"
    "  CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,"
    "  round(count(*)"
    "   + sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)"
    "   * (sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) - 1.0)"
    "   / (2.0 * (sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) + 1.0)), 6)"
    "  AS chao1,"
    "  round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / sum(n),"
    "   6) AS gt_unseen"
    " FROM c GROUP BY source"
)


def q_burst_islands(sf_dir: str):
    """Per-user burst islands (windows.burst_islands): hourly
    buckets, threshold max(2, (1.5*total)/span) against each user's
    own span-average rate, consecutive flagged buckets merged. Fully
    oracled: counts + greatest() threshold + the b - row_number()
    gaps-and-islands grouping in SQL."""
    from ..stages.windows import burst_islands

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = burst_islands(ev, every=pd.Timedelta(hours=1), mult=1.5,
                        min_count=2, nb=16)
    df = (out.to_pandas().sort_values(["user_id", "start_ts"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["burst_islands"] = q_burst_islands

ORACLES["burst_islands"] = (
    "WITH c AS MATERIALIZED (SELECT user_id,"
    "  epoch_us(ts) // 3600000000 AS b, count(*) AS n FROM events"
    "  WHERE ts IS NOT NULL GROUP BY 1, 2),"
    " k AS MATERIALIZED (SELECT user_id,"
    "  CAST(max(b) - min(b) + 1 AS DOUBLE) AS span,"
    "  CAST(sum(n) AS DOUBLE) AS total FROM c GROUP BY 1),"
    " bursts AS MATERIALIZED (SELECT c.user_id, c.b, c.n FROM c"
    "  JOIN k ON k.user_id = c.user_id"
    "  WHERE c.n >= greatest(2.0, (1.5 * k.total) / k.span)),"
    " g AS MATERIALIZED (SELECT user_id, b, n,"
    "  b - row_number() OVER (PARTITION BY user_id ORDER BY b)"
    "  AS grp FROM bursts)"
    " SELECT user_id, make_timestamp(min(b) * 3600000000)"
    "  AS start_ts, make_timestamp(max(b) * 3600000000) AS end_ts,"
    "  count(*) AS n_buckets, CAST(sum(n) AS BIGINT) AS n_events"
    " FROM g GROUP BY user_id, grp"
)


def q_mixture_sample(sf_dir: str):
    """Target-mixture sampling (canonicalize.mixture_sample): an
    80-doc sample hitting 50/25/15/10% quotas over four sources via
    the md5-smallest replayable draw. Fully oracled: row_number over
    md5(doc_id||':0') per source against a VALUES quota table."""
    from ..stages.canonicalize import mixture_sample

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    out = mixture_sample(
        docs, "source",
        {"src0": 0.5, "src1": 0.25, "src2": 0.15, "src3": 0.10},
        total_n=80, id_col="doc_id", seed=0, nb=8)
    df = (out.to_pandas().sort_values(["source", "doc_id"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["mixture_sample"] = q_mixture_sample

ORACLES["mixture_sample"] = (
    "WITH q(source, quota) AS (VALUES ('src0', 40), ('src1', 20),"
    "  ('src2', 12), ('src3', 8)),"
    " r AS (SELECT d.doc_id, d.source, q.quota,"
    "  row_number() OVER (PARTITION BY d.source"
    "   ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':0'), d.doc_id)"
    "  AS rn FROM documents d JOIN q ON q.source = d.source)"
    " SELECT doc_id, source FROM r WHERE rn <= quota"
)


def q_rendezvous_shards(sf_dir: str):
    """Rendezvous-hash shard assignment (hashing.rendezvous_assign):
    each document URL key routes to the argmax md5(key:node:0) of a
    4-node shard list; the aggregate reports per-node key counts (the
    balance check an operator actually runs). Fully oracled: the SQL
    twin replays the draws and the argmax via row_number."""
    from ..functions.hashing import rendezvous_assign

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    nodes = ["crawl-a", "crawl-b", "crawl-c", "crawl-d"]
    assigned = docs.map_batches(
        lambda t: rendezvous_assign(t, "doc_id", nodes, seed=0),
        batch_format="pyarrow")
    from ..stages.canonicalize import sum_by_key
    out = sum_by_key(
        assigned.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "node", "one", nb=8, out_col="n_keys")
    df = (out.to_pandas().sort_values("node").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["rendezvous_shards"] = q_rendezvous_shards

ORACLES["rendezvous_shards"] = (
    "WITH nodes(node) AS (VALUES ('crawl-a'), ('crawl-b'),"
    "  ('crawl-c'), ('crawl-d')),"
    " draws AS (SELECT d.doc_id, n.node,"
    "  md5(CAST(d.doc_id AS VARCHAR) || ':' || n.node || ':0') AS h"
    "  FROM documents d CROSS JOIN nodes n),"
    " pick AS (SELECT doc_id, node FROM (SELECT doc_id, node,"
    "  row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, node)"
    "  AS rk FROM draws) WHERE rk = 1)"
    " SELECT node, count(*) AS n_keys FROM pick GROUP BY node"
)


def q_join_skew_report(sf_dir: str):
    """Pre-join skew profiler (join.join_skew_report): events.user_id
    vs orders.o_custkey per-key row counts and inner-join output
    contribution, top 15 by pairs. Fully oracled: two GROUP BYs, a
    FULL OUTER JOIN and an ORDER BY/LIMIT in SQL."""
    from ..stages.join import join_skew_report

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    out = join_skew_report(ev, orders, "user_id", "o_custkey", k=15,
                           nb=16)
    df = (out.to_pandas()
          .sort_values(["pairs", "key"], ascending=[False, True])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["join_skew_report"] = q_join_skew_report

ORACLES["join_skew_report"] = (
    "WITH lc AS (SELECT user_id AS key, count(*) AS l_count"
    "  FROM events GROUP BY 1),"
    " rc AS (SELECT o_custkey AS key, count(*) AS r_count"
    "  FROM orders GROUP BY 1)"
    " SELECT coalesce(lc.key, rc.key) AS key,"
    "  coalesce(l_count, 0) AS l_count,"
    "  coalesce(r_count, 0) AS r_count,"
    "  coalesce(l_count, 0) * coalesce(r_count, 0) AS pairs"
    " FROM lc FULL OUTER JOIN rc ON rc.key = lc.key"
    " ORDER BY pairs DESC, key LIMIT 15"
)


def q_decayed_sum(sf_dir: str):
    """Time-decayed per-user value sum (windows.decayed_sum_per_key):
    half-life 7 days, evaluated as-of 2025-07-01 (events after the
    instant excluded). Fully oracled: pow(0.5, delta/hl) GROUP BY
    twin over the identical float64 expression."""
    from ..stages.windows import decayed_sum_per_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = decayed_sum_per_key(ev, half_life=pd.Timedelta(days=7),
                              at="2024-01-20", nb=16)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t.column("user_id"),
            "decayed_sum": pc.round(t.column("decayed_sum"), 6),
            "n_rows": t.column("n_rows")})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["decayed_sum"] = q_decayed_sum

ORACLES["decayed_sum"] = (
    "SELECT user_id,"
    " round(sum(value * pow(0.5,"
    "  (epoch_us(TIMESTAMP '2024-01-20') - epoch_us(ts))"
    "  / 604800000000.0)), 6) AS decayed_sum,"
    " count(*) AS n_rows"
    " FROM events"
    " WHERE ts IS NOT NULL AND value IS NOT NULL"
    "  AND ts <= TIMESTAMP '2024-01-20'"
    " GROUP BY user_id"
)


def q_grouped_hll(sf_dir: str):
    """Per-user HLL distinct-props estimates (sketches.grouped_hll,
    p=12): the mergeable sketch sibling of nunique_types_per_user —
    rows-only by nature (the pandas 64-bit hash has no SQL twin);
    estimates are deterministic and the merge lattice property is
    pinned in tests."""
    from ..stages.sketches import grouped_hll

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "props"])
    out = grouped_hll(ev, "user_id", "props", p=12, nb=16)
    df = (out.to_pandas()[["user_id", "n_distinct_est"]]
          .sort_values("user_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["grouped_hll"] = q_grouped_hll


def q_term_drift(sf_dir: str):
    """Corpus term drift (textstats.term_drift, Monroe et al.
    log-odds z): sources src0-src4 vs the rest of the pool, top 40
    terms by |z|. Fully oracled: both count tables, the smoothed
    log-odds, the Wald z and the |z| cutoff replay in SQL."""
    from ..stages.textstats import term_drift

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "source"])
    sel = pa.array(["src0", "src1", "src2", "src3", "src4"])
    a = docs.map_batches(
        lambda t: t.filter(pc.is_in(t.column("source"),
                                    value_set=sel)),
        batch_format="pyarrow")
    b = docs.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t.column("source"),
                                              value_set=sel))),
        batch_format="pyarrow")
    out = term_drift(a, b, top_k=40, min_count=5, nb=16)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "term": t.column("term"),
            "a_count": t.column("a_count"),
            "b_count": t.column("b_count"),
            "delta": pc.round(t.column("delta"), 6),
            "z": pc.round(t.column("z"), 6)})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values("term").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["term_drift"] = q_term_drift

ORACLES["term_drift"] = (
    "WITH sel AS MATERIALIZED (SELECT text, source IN ('src0',"
    "  'src1', 'src2', 'src3', 'src4') AS in_a FROM documents),"
    " tok AS MATERIALIZED (SELECT in_a, unnest("
    "  regexp_split_to_array(trim(lower(text)), '\\s+')) AS t"
    "  FROM sel),"
    " tok2 AS MATERIALIZED (SELECT in_a, t FROM tok WHERE t <> ''),"
    " ac AS MATERIALIZED (SELECT t, count(*) AS n FROM tok2"
    "  WHERE in_a GROUP BY t),"
    " bc AS MATERIALIZED (SELECT t, count(*) AS n FROM tok2"
    "  WHERE NOT in_a GROUP BY t),"
    " tots AS MATERIALIZED (SELECT"
    "  (SELECT coalesce(sum(n), 0) FROM ac) AS na,"
    "  (SELECT coalesce(sum(n), 0) FROM bc) AS nbt),"
    " j AS MATERIALIZED (SELECT coalesce(ac.t, bc.t) AS term,"
    "  CAST(coalesce(ac.n, 0) AS DOUBLE) AS av,"
    "  CAST(coalesce(bc.n, 0) AS DOUBLE) AS bv"
    "  FROM ac FULL OUTER JOIN bc ON bc.t = ac.t),"
    " sc AS MATERIALIZED (SELECT term,"
    "  CAST(av AS BIGINT) AS a_count, CAST(bv AS BIGINT) AS b_count,"
    "  ln((av + 1.0) / (tots.na - av + 1.0))"
    "   - ln((bv + 1.0) / (tots.nbt - bv + 1.0)) AS delta,"
    "  (ln((av + 1.0) / (tots.na - av + 1.0))"
    "   - ln((bv + 1.0) / (tots.nbt - bv + 1.0)))"
    "   / sqrt(1.0 / (av + 1.0) + 1.0 / (bv + 1.0)) AS z"
    "  FROM j CROSS JOIN tots WHERE av + bv >= 5)"
    " SELECT term, a_count, b_count, round(delta, 6) AS delta,"
    "  round(z, 6) AS z FROM (SELECT *, row_number() OVER"
    "  (ORDER BY abs(z) DESC, term) AS rk FROM sc) WHERE rk <= 40"
)


def q_attribution(sf_dir: str):
    """Last-touch attribution (windows.attribution): each 'purchase'
    credits the user's most recent strictly-earlier 'view'/'click'
    event (null = organic). Fully oracled: DuckDB lateral
    max-by twin with the identical strict < and (ts, id) tie-break."""
    from ..stages.windows import attribution

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"])
    out = attribution(ev, "purchase", ["view", "signup"], nb=16)
    df = (out.to_pandas().sort_values("event_id")
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["attribution"] = q_attribution

ORACLES["attribution"] = (
    "WITH conv AS MATERIALIZED (SELECT event_id, user_id, ts"
    "  FROM events WHERE event_type = 'purchase'"
    "  AND ts IS NOT NULL),"
    " touch AS MATERIALIZED (SELECT user_id, ts AS touch_ts,"
    "  event_type AS channel, row_number() OVER ("
    "   PARTITION BY user_id, ts ORDER BY event_id DESC) AS rk"
    "  FROM events WHERE event_type IN ('view', 'signup')"
    "  AND ts IS NOT NULL),"
    " t1 AS MATERIALIZED (SELECT user_id, touch_ts, channel"
    "  FROM touch WHERE rk = 1),"
    " pick AS (SELECT c.event_id, c.user_id, c.ts, t.channel,"
    "  t.touch_ts, row_number() OVER (PARTITION BY c.event_id"
    "   ORDER BY t.touch_ts DESC) AS rk"
    "  FROM conv c LEFT JOIN t1 t ON t.user_id = c.user_id"
    "   AND t.touch_ts < c.ts)"
    " SELECT event_id, user_id, ts, channel, touch_ts FROM pick"
    " WHERE rk = 1"
)


def q_ip_cidr_filter(sf_dir: str):
    """IPv4/CIDR containment tagging (net.ip_in_cidr_join): event-
    derived client IPs probed against a 3-entry blocklist with
    overlapping ranges (first match wins), counted per range. Fully
    oracled: the SQL twin rebuilds the same IPs, masks the same
    ranges arithmetically and applies the same first-match priority."""
    from ..functions.net import ip_in_cidr_join
    from ..stages.canonicalize import sum_by_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id"])

    def mk_ip(t: pa.Table) -> pa.Table:
        k = t.column("event_id").to_numpy(zero_copy_only=False)
        ip = [f"{(i * 7) % 224}.{(i * 13) % 256}"
              f".{(i * 29) % 256}.{i % 256}" for i in k]
        return pa.table({"ip": pa.array(ip, pa.string())})

    tagged = ip_in_cidr_join(
        ev.map_batches(mk_ip, batch_format="pyarrow"),
        ["10.0.0.0/8", "96.0.0.0/6", "64.0.0.0/2"], how="inner")
    out = sum_by_key(
        tagged.map_batches(
            lambda t: pa.table({
                "cidr": t.column("cidr"),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        "cidr", "one", nb=8, out_col="n_ips")
    df = out.to_pandas().sort_values("cidr").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["ip_cidr_filter"] = q_ip_cidr_filter

ORACLES["ip_cidr_filter"] = (
    "WITH ips AS MATERIALIZED (SELECT"
    "  ((event_id * 7) % 224) * 16777216"
    "  + ((event_id * 13) % 256) * 65536"
    "  + ((event_id * 29) % 256) * 256"
    "  + (event_id % 256) AS ip FROM events),"
    " ranges(cidr, pri, lo, hi) AS (VALUES"
    "  ('10.0.0.0/8', 1, 167772160, 184549375),"
    "  ('96.0.0.0/6', 2, 1610612736, 1677721599),"
    "  ('64.0.0.0/2', 3, 1073741824, 2147483647)),"
    " hit AS (SELECT ip, cidr, row_number() OVER (PARTITION BY rowid"
    "  ORDER BY pri) AS rk FROM (SELECT row_number() OVER () AS"
    "  rowid, ip FROM ips) i JOIN ranges r ON i.ip BETWEEN r.lo"
    "  AND r.hi)"
    " SELECT cidr, count(*) AS n_ips FROM hit WHERE rk = 1"
    " GROUP BY cidr"
)


def q_rrf_fuse(sf_dir: str):
    """Reciprocal Rank Fusion (similarity.rrf_fuse, k=60): fuse two
    deterministic document rankers — by n_chars desc and by
    whitespace token count desc (doc_id tie-breaks) — into one
    top-50. Fully oracled: both rankings, the 1/(60+rank) sum and
    the cutoff replay via row_number in SQL."""
    from ..stages.similarity import rrf_fuse
    from ..stages.windows import rank_per_key

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "n_chars"])

    def const_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "g", pa.array(np.zeros(t.num_rows, np.int64)))

    by_chars = rank_per_key(
        docs.map_batches(
            lambda t: const_key(t.select(["doc_id", "n_chars"])),
            batch_format="pyarrow"),
        key_col="g", order_cols=["n_chars", "doc_id"],
        ascending=[False, True], out="rank", nb=4).map_batches(
        lambda t: t.select(["doc_id", "rank"]),
        batch_format="pyarrow")

    def tok_count(t: pa.Table) -> pa.Table:
        from ..stages.textstats import token_count
        return const_key(token_count(t.select(["doc_id", "text"])
                                     ).select(["doc_id", "n_tokens"]))

    by_tokens = rank_per_key(
        docs.map_batches(tok_count, batch_format="pyarrow"),
        key_col="g", order_cols=["n_tokens", "doc_id"],
        ascending=[False, True], out="rank", nb=4).map_batches(
        lambda t: t.select(["doc_id", "rank"]),
        batch_format="pyarrow")

    out = rrf_fuse([by_chars, by_tokens], top_n=50, k=60, nb=8)

    def rounder(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "rrf_score": pc.round(t.column("rrf_score"), 6),
            "n_lists": t.column("n_lists")})

    df = (out.map_batches(rounder, batch_format="pyarrow").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["rrf_fuse"] = q_rrf_fuse

ORACLES["rrf_fuse"] = (
    "WITH r1 AS MATERIALIZED (SELECT doc_id, row_number() OVER"
    "  (ORDER BY n_chars DESC, doc_id) AS rank FROM documents),"
    " tok AS MATERIALIZED (SELECT doc_id, length("
    "  regexp_split_to_array(trim(text), '\\s+')) AS n_tokens"
    "  FROM documents),"
    " r2 AS MATERIALIZED (SELECT doc_id, row_number() OVER"
    "  (ORDER BY n_tokens DESC, doc_id) AS rank FROM tok),"
    " u AS (SELECT doc_id, 1.0 / (60.0 + rank) AS s FROM r1"
    "  UNION ALL SELECT doc_id, 1.0 / (60.0 + rank) FROM r2),"
    " f AS (SELECT doc_id, sum(s) AS rrf_score,"
    "  CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY doc_id)"
    " SELECT doc_id, round(rrf_score, 6) AS rrf_score, n_lists"
    " FROM (SELECT *, row_number() OVER (ORDER BY rrf_score DESC,"
    "  doc_id) AS rk FROM f) WHERE rk <= 50"
)


def q_weighted_sample_per_key(sf_dir: str):
    """Per-priority weighted order sampling
    (sketches.weighted_sample_per_key): 30 orders per
    o_orderpriority, P ∝ o_totalprice, deterministic A-ES md5 draw.
    Fully oracled: the SQL twin replays -ln((md5_32+0.5)/2^32)/w and
    the per-key row_number cutoff."""
    from ..stages.sketches import weighted_sample_per_key

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"])
    out = weighted_sample_per_key(orders, "o_orderpriority",
                                  "o_orderkey", "o_totalprice",
                                  k=30, nb=8)
    df = (out.to_pandas()
          .sort_values(["o_orderpriority", "o_orderkey"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["weighted_sample_per_key"] = q_weighted_sample_per_key

ORACLES["weighted_sample_per_key"] = (
    "SELECT o_orderpriority, o_orderkey, o_totalprice FROM ("
    " SELECT o_orderpriority, o_orderkey, o_totalprice,"
    "  row_number() OVER (PARTITION BY o_orderpriority ORDER BY"
    "   -ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),"
    "    1, 8))::UBIGINT AS BIGINT) + 0.5) / 4294967296.0)"
    "    / o_totalprice, o_orderkey) AS rk"
    " FROM orders WHERE o_totalprice > 0) WHERE rk <= 30"
)


def q_zorder_layout(sf_dir: str):
    """Z-order clustering keys (hashing.zorder_key, bits=8): Morton
    interleave of (o_custkey%256, o_orderkey%256) — the multi-dim
    layout key for OPTIMIZE-ZORDER-style row-group pruning. Fully
    oracled: the SQL twin rebuilds the interleave as a bit-sum over
    generate_series."""
    from ..functions.hashing import zorder_key

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def prep(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        base = pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "x": pa.array((c % 256).astype(np.int64)),
            "y": pa.array((k % 256).astype(np.int64))})
        return zorder_key(base, ["x", "y"], bits=8).select(
            ["o_orderkey", "zkey"])

    out = orders.map_batches(prep, batch_format="pyarrow")
    df = out.to_pandas().sort_values("o_orderkey").reset_index(
        drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["zorder_layout"] = q_zorder_layout

ORACLES["zorder_layout"] = (
    "SELECT o_orderkey, (SELECT CAST(sum("
    "  ((o_custkey % 256) // (1 << b.k) % 2) * (1 << (2 * b.k))"
    "  + ((o_orderkey % 256) // (1 << b.k) % 2)"
    "    * (1 << (2 * b.k + 1))) AS BIGINT)"
    "  FROM generate_series(0, 7) b(k)) AS zkey"
    " FROM orders"
)


def q_topo_layers(sf_dir: str):
    """Kahn topological layering (graph.topo_layers) over a
    synthesized DAG: the 10-ary tree (i//10 -> i) plus chord edges
    (j -> j+100), so layers are genuine longest-path depths, not tree
    depths. Fully oracled: the SQL twin enumerates all root paths
    with a recursive CTE and takes max(depth) per node."""
    from ..stages.graph import topo_layers

    i = np.arange(10, 510, dtype=np.int64)
    j = np.arange(100, 400, dtype=np.int64)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.concatenate([i // 10, j])),
        "dst": pa.array(np.concatenate([i, j + 100]))})).repartition(4)
    out = topo_layers(edges, nb=8)
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    df["layer"] = df["layer"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("node").reset_index(drop=True),
                                preserve_index=False)


QUERIES["topo_layers"] = q_topo_layers

ORACLES["topo_layers"] = (
    "WITH RECURSIVE e AS ("
    " SELECT i // 10 AS src, i AS dst FROM generate_series(10, 509) s(i)"
    " UNION ALL SELECT j, j + 100 FROM generate_series(100, 399) t(j)),"
    " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
    " p AS ("
    "  SELECT node, 0 AS d FROM nodes"
    "   WHERE node NOT IN (SELECT dst FROM e)"
    "  UNION ALL SELECT e.dst, p.d + 1 FROM p JOIN e ON e.src = p.node)"
    " SELECT node, CAST(max(d) AS BIGINT) AS layer FROM p GROUP BY node"
)


def q_skyline_lineitem(sf_dir: str):
    """Distributed Pareto front (sketches.skyline): lineitems on the
    (min price, max quantity, max discount) frontier within a one-month
    ship window. Fully oracled: NOT-EXISTS dominance twin (the window
    filter keeps the quadratic oracle small; the engine's kernel is
    the same at any scale)."""
    import pyarrow.dataset as pads

    from ..stages.sketches import skyline

    lo = pd.Timestamp("1995-06-01")
    hi = pd.Timestamp("1995-07-01")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity", "l_discount"],
        filter=((pads.field("l_shipdate") >= lo)
                & (pads.field("l_shipdate") < hi)))
    out = skyline(li, ["l_extendedprice", "l_quantity", "l_discount"],
                  maximize=[False, True, True])
    df = out.to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    df["l_linenumber"] = df["l_linenumber"].astype("int32")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["skyline_lineitem"] = q_skyline_lineitem

ORACLES["skyline_lineitem"] = (
    "WITH w AS (SELECT l_orderkey, l_linenumber, l_extendedprice,"
    "  l_quantity, l_discount FROM lineitem"
    "  WHERE l_shipdate >= TIMESTAMP '1995-06-01'"
    "    AND l_shipdate < TIMESTAMP '1995-07-01')"
    " SELECT * FROM w r WHERE NOT EXISTS ("
    "  SELECT 1 FROM w s WHERE s.l_extendedprice <= r.l_extendedprice"
    "   AND s.l_quantity >= r.l_quantity"
    "   AND s.l_discount >= r.l_discount"
    "   AND (s.l_extendedprice < r.l_extendedprice"
    "     OR s.l_quantity > r.l_quantity"
    "     OR s.l_discount > r.l_discount))"
)


def q_band_join_events(sf_dir: str):
    """Keyed numeric band join (join.band_join): event pairs of the
    same type whose values lie within 0.25 of each other — the
    eps-cell replicate-left-by-3 plan, each pair meeting in exactly
    one bucket. Fully oracled (inner-join + ABS twin)."""
    from ..stages.join import band_join

    ev = _events(sf_dir, ["event_id", "event_type", "value"])
    out = band_join(ev, ev, on="event_type", lval="value", eps=0.25, nb=32)

    def post(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("event_id"), t.column("event_id_r"))
        return t.filter(keep)

    df = out.map_batches(post, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["event_id", "event_id_r"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["band_join_events"] = q_band_join_events

ORACLES["band_join_events"] = (
    "SELECT a.event_type, a.event_id, a.value,"
    "  b.event_id AS event_id_r, b.value AS value_r"
    " FROM events a JOIN events b ON a.event_type = b.event_type"
    "  AND abs(a.value - b.value) <= 0.25"
    "  AND a.event_id < b.event_id"
)


def q_heavy_hitters_exact(sf_dir: str):
    """Exact heavy hitters (sketches.exact_heavy_hitters, k=20): every
    derived key with global count strictly above n/20, exact counts —
    two streaming passes (per-block local-HH superset + candidate-only
    recount), no distinct-key shuffle. The key is deliberately skewed
    (clicks keep the raw user id; everything else folds to user_id %
    10). Fully oracled (GROUP BY ... HAVING twin)."""
    from ..stages.sketches import exact_heavy_hitters

    ev = _events(sf_dir, ["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        click = pc.equal(t.column("event_type"), "click").to_numpy(
            zero_copy_only=False)
        return pa.table({"key": pa.array(
            np.where(click, u, u % 10).astype(np.int64))})

    out = exact_heavy_hitters(
        ev.map_batches(derive, batch_format="pyarrow"), "key", k=20, nb=8)
    df = out.to_pandas().sort_values("key").reset_index(drop=True)
    df["count"] = df["count"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["heavy_hitters_exact"] = q_heavy_hitters_exact

ORACLES["heavy_hitters_exact"] = (
    "WITH d AS (SELECT CASE WHEN event_type = 'click' THEN user_id"
    "  ELSE user_id % 10 END AS key FROM events)"
    " SELECT key, count(*) AS count FROM d GROUP BY key"
    " HAVING count(*) * 20 > (SELECT count(key) FROM d)"
)


def q_bigram_nll(sf_dir: str):
    """Add-k-smoothed bigram LM NLL per document
    (textstats.bigram_nll, max_vocab=512, k=0.5) — the sequence-aware
    perplexity filter, self-scored over the corpus. Fully oracled:
    the SQL twin rebuilds the vocabulary cut, the BOS-prefixed mapped
    bigram stream, and both count tables, then replays the smoothed
    NLL."""
    from ..stages.textstats import bigram_nll

    out = bigram_nll(_docs(sf_dir, ["doc_id", "text"]), max_vocab=512,
                     k=0.5, nb=8)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["n_bigrams"] = df["n_bigrams"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["bigram_nll"] = q_bigram_nll

ORACLES["bigram_nll"] = (
    "WITH t AS (SELECT doc_id,"
    "   regexp_split_to_array(trim(text), '\\s+') AS toks,"
    "   len(regexp_split_to_array(trim(text), '\\s+')) AS L"
    "  FROM documents WHERE trim(text) <> ''),"
    " e AS (SELECT doc_id, i, toks[i] AS tok FROM t,"
    "   UNNEST(generate_series(1, L)) AS s(i) WHERE toks[i] <> ''),"
    " cnt AS (SELECT tok, count(*) AS n FROM e GROUP BY tok),"
    " v AS (SELECT tok FROM (SELECT tok, row_number() OVER"
    "   (ORDER BY n DESC, tok ASC) AS rk FROM cnt) WHERE rk <= 512),"
    " m AS (SELECT doc_id,"
    "   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos,"
    "   CASE WHEN tok IN (SELECT tok FROM v) THEN tok"
    "     ELSE '<unk>' END AS mt FROM e),"
    " big AS (SELECT a.doc_id, coalesce(b.mt, '') AS u, a.mt AS w"
    "   FROM m a LEFT JOIN m b"
    "   ON a.doc_id = b.doc_id AND b.pos = a.pos - 1),"
    " bc AS (SELECT u, w, count(*) AS c FROM big GROUP BY u, w),"
    " cc AS (SELECT u, sum(c) AS cu FROM bc GROUP BY u),"
    " vsz AS (SELECT count(*) + 1 AS V FROM v)"
    " SELECT big.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,"
    "  round(avg(-ln((bc.c + 0.5) / (cc.cu + 0.5 * vsz.V))), 6) AS nll"
    " FROM big JOIN bc ON bc.u = big.u AND bc.w = big.w"
    " JOIN cc ON cc.u = big.u CROSS JOIN vsz"
    " GROUP BY big.doc_id"
)


_CURATE_STOP_SQL = ("'the','a','an','and','or','of','to','in','is',"
                    "'are','was','for','on','with','as','at','by','it',"
                    "'this','that','be','from'")


def q_curate_corpus(sf_dir: str):
    """FLAGSHIP training-data curation chain, end to end and fully
    oracled — the C4/Gopher-style recipe composed from in-repo
    stages, every step SQL-replayable:

      1. language filter at the read (lang = 'en', predicate pushdown)
      2. deterministic PII augmentation (same planting as
         q:`pii_redact`, so the redaction step has real matches)
      3. quality gate (quality_counts integers: ≥10 tokens, ≥5%
         stopwords) + Gopher repetition gate (top-token share ≤ 25%)
         in ONE stateless pass
      4. corpus-wide duplicate-line removal over the survivors
         (dedup_lines, '.'-separated, global keep-first)
      5. typed PII redaction of the cleaned text (redact_pii)

    Output: (doc_id, text_redacted, n_lines, n_removed)."""
    import pyarrow.dataset as pads

    from ..functions.pii import redact_pii
    from ..stages.dedup import dedup_lines
    from ..stages.textstats import quality_counts, repetition_stats

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"],
                           filter=pads.field("lang") == "en")

    def augment(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        d = df["doc_id"]
        mod = d % 5
        tail = d.astype(str).copy()
        tail[:] = " no pii here"
        tail[mod == 0] = (" Contact: user" + d.astype(str)
                          + "@example.com now.")
        tail[mod == 1] = (" Call +1 (555) 010-"
                          + (d % 10000).astype(int).map("{:04d}".format)
                          + " today")
        tail[mod == 2] = (" Server at 10." + (d % 256).astype(str)
                          + ".0." + (d % 100).astype(str) + " port 80")
        tail[mod == 3] = (" Card 4111 1111 1111 "
                          + (d % 10000).astype(int).map("{:04d}".format)
                          + " expired")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pa.array(df["text"].fillna("") + tail, pa.string()),
        })

    def gate(batch: pa.Table) -> pa.Table:
        q = quality_counts(batch)
        r = repetition_stats(batch)
        n = q.column("n_tokens_q").to_numpy(zero_copy_only=False)
        ns = q.column("n_stop").to_numpy(zero_copy_only=False)
        share = r.column("top_token_share").to_numpy(zero_copy_only=False)
        keep = (n >= 10) & (ns * 20 >= n) & (share <= 0.25)
        return batch.filter(pa.array(keep))

    surv = (docs.map_batches(augment, batch_format="pyarrow",
                             batch_size=65536)
            .map_batches(gate, batch_format="pyarrow", batch_size=65536))
    clean = dedup_lines(surv, sep=".", nb=8)
    out = clean.map_batches(
        lambda t: redact_pii(t).drop_columns(["text"]),
        batch_format="pyarrow")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for c in ("n_lines", "n_removed"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["curate_corpus"] = q_curate_corpus

ORACLES["curate_corpus"] = (
    "WITH aug AS (SELECT doc_id, coalesce(text,'')"
    " || CASE CAST(doc_id % 5 AS INTEGER)"
    " WHEN 0 THEN ' Contact: user' || doc_id || '@example.com now.'"
    " WHEN 1 THEN ' Call +1 (555) 010-'"
    "  || lpad(CAST(doc_id % 10000 AS VARCHAR),4,'0') || ' today'"
    " WHEN 2 THEN ' Server at 10.' || (doc_id % 256) || '.0.'"
    "  || (doc_id % 100) || ' port 80'"
    " WHEN 3 THEN ' Card 4111 1111 1111 '"
    "  || lpad(CAST(doc_id % 10000 AS VARCHAR),4,'0') || ' expired'"
    " ELSE ' no pii here' END AS t"
    " FROM documents WHERE lang = 'en'),"
    " tk AS (SELECT doc_id, t,"
    "  regexp_split_to_array(trim(t), '\\s+') AS toks FROM aug),"
    " q AS (SELECT doc_id, t, len(toks) AS n_tok,"
    "  len(list_filter(toks, x -> lower(x) IN (" + _CURATE_STOP_SQL + ")))"
    "   AS n_stop FROM tk),"
    " r AS (SELECT doc_id, max(c) AS mx FROM ("
    "   SELECT doc_id, tok, count(*) AS c FROM ("
    "    SELECT doc_id, unnest(toks) AS tok FROM tk) GROUP BY 1, 2)"
    "  GROUP BY doc_id),"
    " surv AS (SELECT q.doc_id, q.t FROM q JOIN r USING (doc_id)"
    "  WHERE n_tok >= 10 AND n_stop * 20 >= n_tok AND mx * 4 <= n_tok),"
    " l AS (SELECT doc_id, unnest(string_split(t, '.')) AS line,"
    "   unnest(range(1, len(string_split(t, '.')) + 1)) AS ord FROM surv),"
    " ranked AS (SELECT doc_id, ord, line,"
    "   row_number() OVER (PARTITION BY line ORDER BY doc_id, ord) AS rn,"
    "   count(*) OVER (PARTITION BY line) AS cnt FROM l),"
    " clean AS (SELECT doc_id,"
    "  coalesce(string_agg(line, '.' ORDER BY ord)"
    "    FILTER (WHERE cnt = 1 OR rn = 1), '') AS ctext,"
    "  CAST(count(*) AS BIGINT) AS n_lines,"
    "  CAST(count(*) FILTER (WHERE cnt > 1 AND rn > 1) AS BIGINT)"
    "    AS n_removed"
    "  FROM ranked GROUP BY doc_id)"
    " SELECT doc_id, n_lines, n_removed,"
    " regexp_replace(regexp_replace(regexp_replace(regexp_replace(ctext,"
    "  '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',"
    "  '[EMAIL]', 'g'),"
    "  '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b', '[CC]', 'g'),"
    "  '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g'),"
    "  '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]\\d{2,4}',"
    "  '[PHONE]', 'g') AS text_redacted"
    " FROM clean"
)


def q_betweenness(sf_dir: str):
    """Brandes betweenness centrality (graph.betweenness, exact — all
    nodes as sources) over a synthesized closed-form graph: a directed
    6-path (bc(v) = v·(5−v)), a 2-hop star (bc(hub) = #leaves), and a
    diamond with two tied shortest paths (σ-splitting: bc 1/1/3).
    Fully oracled in closed form by Brandes' own algebra; general
    correctness is pinned by the random-graph Brandes-reference fuzz
    in tests/test_r4g_ops.py."""
    from ..stages.graph import betweenness

    rows = []
    for i in range(5):                      # path 0..5
        rows.append((i, i + 1))
    rows.append((100, 101))                 # star: c -> m -> leaves
    for leaf in range(102, 112):
        rows.append((101, leaf))
    rows += [(200, 201), (200, 202), (201, 203), (202, 203), (203, 204)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.int64()),
        "dst": pa.array([r[1] for r in rows], pa.int64())})).repartition(3)
    out = betweenness(edges, nb=8)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    df["node"] = df["node"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["betweenness"] = q_betweenness

ORACLES["betweenness"] = (
    "SELECT i AS node, CAST(i * (5 - i) AS DOUBLE) AS bc"
    "  FROM generate_series(0, 5) s(i)"
    " UNION ALL SELECT 100, 0.0"
    " UNION ALL SELECT 101, 10.0"
    " UNION ALL SELECT 100 + i, 0.0 FROM generate_series(2, 11) t(i)"
    " UNION ALL SELECT 200, 0.0 UNION ALL SELECT 201, 1.0"
    " UNION ALL SELECT 202, 1.0 UNION ALL SELECT 203, 3.0"
    " UNION ALL SELECT 204, 0.0"
)


def q_survivorship_events(sf_dir: str):
    """Golden-record survivorship (canonicalize.survivorship): per
    user, each attribute independently takes its most recent non-null
    value (ts desc, event_id tiebreak) — the ER attribute-fusion step.
    Nulls are planted deterministically (value nulled on 'error'
    events, props nulled when value < 50) so the per-column
    independence is actually exercised. Fully oracled (correlated
    first-non-null subqueries)."""
    from ..stages.canonicalize import survivorship

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type",
                          "value", "props"])

    def mask(t: pa.Table) -> pa.Table:
        err = pc.equal(t.column("event_type"), "error")
        low = pc.less(t.column("value"), 50.0)
        return pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "event_id": t.column("event_id"),
            "value_n": pc.if_else(err, pa.nulls(t.num_rows, pa.float64()),
                                  t.column("value")),
            "props_n": pc.if_else(low, pa.nulls(t.num_rows, pa.string()),
                                  t.column("props"))})

    out = survivorship(ev.map_batches(mask, batch_format="pyarrow"),
                       "user_id", "ts", "event_id",
                       ["value_n", "props_n"], ascending=False, nb=8)
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    df["user_id"] = df["user_id"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["survivorship_events"] = q_survivorship_events

ORACLES["survivorship_events"] = (
    "WITH m AS (SELECT user_id, ts, event_id,"
    "  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value_n,"
    "  CASE WHEN value < 50 THEN NULL ELSE props END AS props_n"
    "  FROM events)"
    " SELECT user_id,"
    "  (SELECT value_n FROM m i WHERE i.user_id = o.user_id"
    "    AND value_n IS NOT NULL ORDER BY ts DESC, event_id LIMIT 1)"
    "   AS value_n,"
    "  (SELECT props_n FROM m i WHERE i.user_id = o.user_id"
    "    AND props_n IS NOT NULL ORDER BY ts DESC, event_id LIMIT 1)"
    "   AS props_n"
    " FROM (SELECT DISTINCT user_id FROM m) o"
)


def q_auc_value_purchase(sf_dir: str):
    """Exact ROC-AUC (sketches.roc_auc — rank-sum with half-tie
    credit, NO global sort: per-score census + histogram carry-in
    offsets + per-bin local cumulatives) of event value as a predictor
    of 'purchase'. Fully oracled: the SQL twin replays the
    distinct-score cumulative formula with a window function."""
    from ..stages.sketches import roc_auc

    ev = _events(sf_dir, ["value", "event_type"])

    def lab(t: pa.Table) -> pa.Table:
        return pa.table({
            "value": t.column("value"),
            "y": pc.cast(pc.equal(t.column("event_type"), "purchase"),
                         pa.int64())})

    auc = roc_auc(ev.map_batches(lab, batch_format="pyarrow"),
                  "value", "y", n_bins=256, nb=8)
    return pa.table({"auc": pa.array([round(auc, 6)], pa.float64())})


QUERIES["auc_value_purchase"] = q_auc_value_purchase

ORACLES["auc_value_purchase"] = (
    "WITH d AS (SELECT value AS s,"
    "  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
    "  FROM events WHERE value IS NOT NULL),"
    " tot AS (SELECT sum(y) AS P, count(*) - sum(y) AS N FROM d),"
    " r AS (SELECT s, sum(y) AS np, count(*) - sum(y) AS nn"
    "  FROM d GROUP BY s),"
    " o AS (SELECT s, np, nn, coalesce(sum(nn) OVER (ORDER BY s"
    "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cneg"
    "  FROM r)"
    " SELECT round(sum(np * (cneg + 0.5 * nn)) / (tot.P * tot.N), 6)"
    "  AS auc FROM o, tot GROUP BY tot.P, tot.N"
)


def q_quality_classifier(sf_dir: str):
    """Trained quality classifier (textstats.logistic_fit — IRLS with
    fsum-deterministic sufficient-statistics reduces) over the
    documents table: integer quality_counts signals + n_chars predict
    lang='en'; every doc is scored (logistic_predict) and the model's
    training ROC-AUC rides along as the doc_id=-1 summary row.
    Rows-only (an iterative Newton fit has no SQL twin); determinism
    is covered by the rows-only double-run net, and the fit is pinned
    bit-exact against a single-machine IRLS reference in tests."""
    from ..stages.join import shuffle_hash_join
    from ..stages.sketches import roc_auc
    from ..stages.textstats import (logistic_fit, logistic_predict,
                                    quality_counts)

    docs = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def feats(t: pa.Table) -> pa.Table:
        q = quality_counts(t)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens_q": q.column("n_tokens_q"),
            "n_punct": q.column("n_punct"),
            "n_digit": q.column("n_digit"),
            "n_stop": q.column("n_stop"),
            "n_chars": t.column("n_chars"),
            "y": pc.cast(pc.equal(t.column("lang"), "en"), pa.int64())})

    F = ["n_tokens_q", "n_punct", "n_digit", "n_stop", "n_chars"]
    fds = docs.map_batches(feats, batch_format="pyarrow").materialize()
    model = logistic_fit(fds, F, "y", iters=8)
    scored = logistic_predict(fds, model, F).materialize()
    lab = shuffle_hash_join(
        scored, fds.map_batches(lambda t: t.select(["doc_id", "y"]),
                                batch_format="pyarrow"),
        on=["doc_id"], how="inner", nb=8)
    auc = roc_auc(lab, "score", "y", n_bins=64, nb=8)
    df = scored.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["score"] = np.round(df["score"], 6)
    head = pd.DataFrame({"doc_id": [-1], "score": [round(auc, 6)]})
    return pa.Table.from_pandas(pd.concat([head, df], ignore_index=True),
                                preserve_index=False)


QUERIES["quality_classifier"] = q_quality_classifier


def q_running_nunique(sf_dir: str):
    """Running COUNT(DISTINCT event_type) per user in event order
    (windows.running_nunique_per_key) — engagement-breadth signal.
    Fully oracled (correlated DISTINCT-count subquery twin)."""
    from ..stages.windows import running_nunique_per_key

    out = running_nunique_per_key(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]),
        key_col="user_id", value_col="event_type",
        order_cols=["ts", "event_id"], nb=8)
    df = (out.to_pandas()[["event_id", "n_distinct"]]
          .sort_values("event_id").reset_index(drop=True))
    df["n_distinct"] = df["n_distinct"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["running_nunique"] = q_running_nunique

ORACLES["running_nunique"] = (
    "SELECT o.event_id,"
    " (SELECT count(DISTINCT i.event_type) FROM events i"
    "   WHERE i.user_id = o.user_id AND (i.ts < o.ts"
    "     OR (i.ts = o.ts AND i.event_id <= o.event_id)))"
    "  AS n_distinct"
    " FROM events o"
)


def q_trend_per_type(sf_dir: str):
    """Per-key OLS trend (sketches.trend_per_key): slope / intercept /
    r² of event value over time (hours since 2024-01-01) per event
    type — one sufficient-statistics pass, closed-form finish. Fully
    oracled (explicit-sums formula twin)."""
    from ..stages.sketches import trend_per_key

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def xy(t: pa.Table) -> pa.Table:
        micros = t.column("ts").cast(pa.int64())
        x = pc.divide(pc.subtract(
            pc.divide(pc.cast(micros, pa.float64()), 1e6),
            pa.scalar(1704067200.0)), 3600.0)
        return pa.table({"event_type": t.column("event_type"),
                         "x": x, "y": t.column("value")})

    out = trend_per_key(ev.map_batches(xy, batch_format="pyarrow"),
                        "event_type", "x", "y", nb=8)
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["trend_per_type"] = q_trend_per_type

ORACLES["trend_per_type"] = (
    "WITH d AS (SELECT event_type,"
    "  (epoch(ts) - 1704067200) / 3600.0 AS x, value AS y"
    "  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),"
    " s AS (SELECT event_type, count(*) AS n, sum(x) AS sx,"
    "  sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,"
    "  sum(y * y) AS syy FROM d GROUP BY event_type)"
    " SELECT event_type,"
    "  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,"
    "  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)"
    "    / n, 6) AS intercept,"
    "  round(power(n * sxy - sx * sy, 2)"
    "    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2"
    " FROM s"
)


def q_er_parts_jw(sf_dir: str):
    """Jaro-Winkler blocked ER (similarity.blocked_jw_join): part
    names corrupted by an adjacent-char swap (the transposition typo
    JW is designed for) matched back against the catalog under the
    same (first-char, length-band) blocking as er_parts. Sims are
    bit-identical to DuckDB's jaro_winkler_similarity (pinned by a
    4000-case fuzz), so the oracle compares raw float64."""
    from ..stages.similarity import blocked_jw_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    corrupted = part.map_batches(
        lambda t: t.filter(pa.array(
            t.column("p_partkey").to_numpy() % 25 == 0)),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            "p_partkey": t.column("p_partkey"),
            "p_name": pa.array([s[:2] + s[3] + s[2] + s[4:]
                                for s in t.column("p_name").to_pylist()])}),
        batch_format="pyarrow")
    out = blocked_jw_join(corrupted, part, "p_partkey", "p_name",
                          "p_partkey", "p_name", min_sim=0.92,
                          nb=16).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["l_id", "r_id"]).reset_index(drop=True),
        preserve_index=False)


QUERIES["er_parts_jw"] = q_er_parts_jw

ORACLES["er_parts_jw"] = (
    "WITH l AS (SELECT p_partkey AS l_id,"
    "   substr(p_name, 1, 2) || substr(p_name, 4, 1)"
    "   || substr(p_name, 3, 1) || substr(p_name, 5) AS l_name"
    "  FROM part WHERE p_partkey % 25 = 0),"
    " r AS (SELECT p_partkey AS r_id, p_name AS r_name FROM part)"
    " SELECT l_id, r_id,"
    "  jaro_winkler_similarity(l_name, r_name) AS sim"
    " FROM l JOIN r ON substr(l_name, 1, 1) = substr(r_name, 1, 1)"
    "  AND length(l_name) // 4 = length(r_name) // 4"
    " WHERE jaro_winkler_similarity(l_name, r_name) >= 0.92"
)


def q_fs_linkage(sf_dir: str):
    """Fellegi-Sunter probabilistic record linkage
    (similarity.fellegi_sunter_join): perturbed customer records
    linked back to the master under nationkey blocking; three field
    comparisons (name / market segment / floored balance) contribute
    log2 agreement weights. The SQL twin embeds the IDENTICAL
    Python-computed weight literals, so scores are bit-exact."""
    from ..stages.similarity import fellegi_sunter_join

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_name", "c_mktsegment",
                 "c_acctbal"])

    def mk_left(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy()
        keep = k % 4 == 0
        t = t.filter(pa.array(keep))
        k = t.column("c_custkey").to_numpy()
        name = t.column("c_name").to_pylist()
        seg = t.column("c_mktsegment").to_pylist()
        bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
        name = [s + "~" if kk % 3 == 0 else s for s, kk in zip(name, k)]
        seg = ["XX" if kk % 5 == 0 else s for s, kk in zip(seg, k)]
        bal = np.where(k % 7 == 0, bal + 1.0, bal)
        return pa.table({
            "l_id": t.column("c_custkey"),
            "c_nationkey": t.column("c_nationkey"),
            "c_name": pa.array(name, pa.string()),
            "c_mktsegment": pa.array(seg, pa.string()),
            "bal": pa.array(np.floor(bal), pa.float64())})

    def mk_right(t: pa.Table) -> pa.Table:
        return pa.table({
            "r_id": t.column("c_custkey"),
            "c_nationkey": t.column("c_nationkey"),
            "c_name": t.column("c_name"),
            "c_mktsegment": t.column("c_mktsegment"),
            "bal": pc.floor(t.column("c_acctbal"))})

    left = cust.map_batches(mk_left, batch_format="pyarrow")
    right = cust.map_batches(mk_right, batch_format="pyarrow")
    out = fellegi_sunter_join(
        left, right, block_on=["c_nationkey"],
        fields=[("c_name", "c_name", 0.9, 0.001),
                ("c_mktsegment", "c_mktsegment", 0.95, 0.2),
                ("bal", "bal", 0.9, 0.01)],
        min_score=2.0, nb=16)
    df = (out.to_pandas()[["l_id", "r_id", "fs_score"]]
          .sort_values(["l_id", "r_id"]).reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["fs_linkage"] = q_fs_linkage


def _fs_oracle() -> str:
    import math

    w = {}
    for tag, m, u in (("nm", 0.9, 0.001), ("sg", 0.95, 0.2),
                      ("bl", 0.9, 0.01)):
        w[tag] = (repr(math.log2(m / u)), repr(math.log2((1 - m) / (1 - u))))
    return (
        "WITH l AS (SELECT c_custkey AS l_id, c_nationkey,"
        "   CASE WHEN c_custkey % 3 = 0 THEN c_name || '~'"
        "    ELSE c_name END AS nm,"
        "   CASE WHEN c_custkey % 5 = 0 THEN 'XX'"
        "    ELSE c_mktsegment END AS sg,"
        "   floor(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1.0"
        "    ELSE c_acctbal END) AS bl"
        "  FROM customer WHERE c_custkey % 4 = 0),"
        " r AS (SELECT c_custkey AS r_id, c_nationkey, c_name AS nm,"
        "   c_mktsegment AS sg, floor(c_acctbal) AS bl FROM customer),"
        " p AS (SELECT l_id, r_id,"
        f"   (CASE WHEN l.nm = r.nm THEN {w['nm'][0]} ELSE {w['nm'][1]} END"
        f"    + CASE WHEN l.sg = r.sg THEN {w['sg'][0]} ELSE {w['sg'][1]} END)"
        f"    + CASE WHEN l.bl = r.bl THEN {w['bl'][0]} ELSE {w['bl'][1]} END"
        "    AS fs_score"
        "  FROM l JOIN r USING (c_nationkey))"
        " SELECT l_id, r_id, fs_score FROM p WHERE fs_score >= 2.0"
    )


ORACLES["fs_linkage"] = _fs_oracle()


def q_soundex_blocking(sf_dir: str):
    """Soundex phonetic blocking-key census (functions.phonetic):
    fully vectorized Arrow-kernel Soundex over the first token of
    every part name, then a sum_by_key count per code — the blocking
    census an ER pass runs to size its buckets. The oracle replays
    the identical translate/run-collapse chain in SQL."""
    from ..functions.phonetic import soundex_array
    from ..stages.canonicalize import sum_by_key

    part = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def key(t: pa.Table) -> pa.Table:
        w = pc.replace_substring_regex(t.column("p_name"), r"\s.*$", "")
        return pa.table({"soundex": soundex_array(w),
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    out = sum_by_key(part.map_batches(key, batch_format="pyarrow"),
                     "soundex", "n", nb=8)
    df = out.to_pandas().sort_values("soundex").reset_index(drop=True)
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["soundex_blocking"] = q_soundex_blocking


def _soundex_sql(expr: str) -> str:
    """The engine's Soundex kernel chain replayed in DuckDB SQL over
    ``expr`` (see functions/phonetic.py — same steps, same order)."""
    coded = (f"translate(regexp_replace(upper({expr}), '[^A-Z]', '', 'g'),"
             " 'BFPVCGJKQSXZDTLMNRAEIOUYHW', '111122222222334556000000')")
    for d in "0123456":
        coded = f"regexp_replace({coded}, '{d}{{2,}}', '{d}', 'g')"
    s = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    first = f"substr({s}, 1, 1)"
    tail = (f"CASE WHEN {first} IN ('H', 'W') THEN {coded}"
            f" ELSE substr({coded}, 2) END")
    return (f"CASE WHEN {s} = '' THEN ''"
            f" ELSE substr(rpad({first} || replace({tail}, '0', ''),"
            " 4, '0'), 1, 4) END")


ORACLES["soundex_blocking"] = (
    "WITH w AS (SELECT regexp_replace(p_name, '\\s.*$', '') AS fw"
    "  FROM part)"
    f" SELECT {_soundex_sql('fw')} AS soundex,"
    "  count(*) AS n FROM w GROUP BY 1"
)


def q_community_modularity(sf_dir: str):
    """Newman modularity of the LPA community assignment
    (graph.modularity) over the lpa_communities corpus (two bridged
    K5 cliques + a 7-node path) — the detector and its quality score
    composed end to end. Fully oracled: the SQL twin unrolls the
    three LPA rounds then replays Q = intra/m - sum(d_c^2)/(4m^2)."""
    from ..stages.graph import label_propagation, modularity

    rows = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append({"a": base + i, "b": base + j})
    rows.append({"a": 4, "b": 10})
    for i in range(6):
        rows.append({"a": 20 + i, "b": 21 + i})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    labels = label_propagation(edges, n_iters=3, nb=8)
    return modularity(edges, labels, nb=8)


QUERIES["community_modularity"] = q_community_modularity

ORACLES["community_modularity"] = (
    "WITH base AS ("
    " SELECT b10 + i AS a, b10 + j AS b"
    "  FROM (VALUES (0), (10)) t(b10),"
    "   generate_series(0, 4) s(i), generate_series(0, 4) u(j)"
    "  WHERE i < j"
    " UNION ALL SELECT 4, 10"
    " UNION ALL SELECT 20 + i, 21 + i FROM generate_series(0, 5) s(i)),"
    " e AS (SELECT a AS src, b AS dst FROM base"
    "  UNION ALL SELECT b, a FROM base),"
    " l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),"
    + _LPA_VOTE.format(k=1, p=0)
    + _LPA_VOTE.format(k=2, p=1)
    + _LPA_VOTE.format(k=3, p=2)
    + " f AS (SELECT node, lab FROM l3),"
    " m AS (SELECT count(*) AS m FROM base),"
    " intra AS (SELECT count(*) AS intra FROM base"
    "  JOIN f la ON la.node = base.a JOIN f lb ON lb.node = base.b"
    "  WHERE la.lab = lb.lab),"
    " deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),"
    " dc AS (SELECT f.lab, sum(deg.d) AS d FROM deg"
    "  JOIN f ON f.node = deg.node GROUP BY 1),"
    " s2 AS (SELECT sum(d * d * 1.0) AS sd2 FROM dc)"
    " SELECT CAST(m.m AS BIGINT) AS m_edges,"
    "  CAST(intra.intra AS BIGINT) AS intra_edges,"
    "  round(intra.intra * 1.0 / m.m"
    "   - s2.sd2 / (4.0 * m.m * m.m), 6) AS q"
    " FROM m, intra, s2"
)


def q_triple_agreement(sf_dir: str):
    """Distributed triple-set P/R/F1 (graph.triple_agreement) — the
    north-rule acceptance gate (P/R vs a reference annotation set)
    as a first-class operator: gold = distinct (user, event_type,
    value-bucket) triples from events; pred = gold minus every
    subj % 13 == 0 row plus planted fakes for subj % 17 == 0. Fully
    oracled (INTERSECT-count twin)."""
    from ..stages.graph import triple_agreement

    ev = _events(sf_dir, ["user_id", "event_type", "value"])

    def mk_gold(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("value")),
                             pc.is_valid(t.column("event_type"))),
                     pc.is_valid(t.column("user_id")))
        t = t.filter(ok)
        return pa.table({
            "subj": t.column("user_id").cast(pa.int64()),
            "pred": t.column("event_type"),
            "obj": pc.cast(pc.floor(pc.divide(
                t.column("value"), pa.scalar(100.0))), pa.int64())})

    gold = ev.map_batches(mk_gold, batch_format="pyarrow")

    def mk_pred(t: pa.Table) -> pa.Table:
        s = t.column("subj").to_numpy()
        kept = t.filter(pa.array(s % 13 != 0))
        fakes_src = t.filter(pa.array(s % 17 == 0))
        fakes = pa.table({
            "subj": pc.add(fakes_src.column("subj"), pa.scalar(1000000)),
            "pred": pa.array(["fake"] * fakes_src.num_rows, pa.string()),
            "obj": pa.array(np.zeros(fakes_src.num_rows, np.int64))})
        return pa.concat_tables([kept, fakes])

    pred = gold.map_batches(mk_pred, batch_format="pyarrow")
    return triple_agreement(gold, pred, nb=8)


QUERIES["triple_agreement"] = q_triple_agreement

ORACLES["triple_agreement"] = (
    "WITH gold AS (SELECT DISTINCT user_id AS subj,"
    "   event_type AS pred,"
    "   CAST(floor(value / 100.0) AS BIGINT) AS obj"
    "  FROM events WHERE value IS NOT NULL"
    "   AND event_type IS NOT NULL AND user_id IS NOT NULL),"
    " predt AS (SELECT * FROM gold WHERE subj % 13 <> 0"
    "  UNION SELECT subj + 1000000, 'fake', 0 FROM gold"
    "   WHERE subj % 17 = 0),"
    " c AS (SELECT count(*) AS n_common FROM"
    "  (SELECT * FROM predt INTERSECT SELECT * FROM gold)),"
    " s AS (SELECT (SELECT count(*) FROM gold) AS n_gold,"
    "  (SELECT count(*) FROM predt) AS n_pred, n_common FROM c)"
    " SELECT n_gold, n_pred, n_common,"
    "  round(n_common * 1.0 / n_pred, 6) AS precision,"
    "  round(n_common * 1.0 / n_gold, 6) AS recall,"
    "  round(2.0 * (n_common * 1.0 / n_pred) * (n_common * 1.0 / n_gold)"
    "   / ((n_common * 1.0 / n_pred) + (n_common * 1.0 / n_gold)), 6)"
    "   AS f1"
    " FROM s"
)


def q_annotator_kappa(sf_dir: str):
    """Cohen's kappa inter-annotator agreement (sketches.cohen_kappa)
    between the event_type column and a deterministic second
    annotator that relabels every event_id % 7 == 0 row 'other' —
    the QA statistic for comparing two annotation runs. Fully
    oracled (marginals-product twin with unrounded intermediates)."""
    from ..stages.sketches import cohen_kappa

    ev = _events(sf_dir, ["event_id", "event_type"])

    def two(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        a = t.column("event_type")
        b = pc.if_else(pa.array(eid % 7 == 0),
                       pa.scalar("other", pa.string()), a)
        return pa.table({"a": a, "b": b})

    return cohen_kappa(ev.map_batches(two, batch_format="pyarrow"),
                       "a", "b", nb=4)


QUERIES["annotator_kappa"] = q_annotator_kappa

ORACLES["annotator_kappa"] = (
    "WITH p AS (SELECT event_type AS a,"
    "   CASE WHEN event_id % 7 = 0 THEN 'other' ELSE event_type END AS b"
    "  FROM events WHERE event_type IS NOT NULL),"
    " nn AS (SELECT count(*) AS n FROM p),"
    " ag AS (SELECT count(*) * 1.0 AS agree FROM p WHERE a = b),"
    " ra AS (SELECT a, count(*) * 1.0 AS c FROM p GROUP BY a),"
    " cb AS (SELECT b, count(*) * 1.0 AS c FROM p GROUP BY b),"
    " pe AS (SELECT sum(ra.c * cb.c) AS s FROM ra"
    "  JOIN cb ON ra.a = cb.b)"
    " SELECT nn.n, round(ag.agree / nn.n, 6) AS po,"
    "  round(pe.s / (nn.n * 1.0 * nn.n), 6) AS pe,"
    "  round((ag.agree / nn.n - pe.s / (nn.n * 1.0 * nn.n))"
    "   / (1 - pe.s / (nn.n * 1.0 * nn.n)), 6) AS kappa"
    " FROM nn, ag, pe"
)


def q_merge_intervals_events(sf_dir: str):
    """Per-key interval union (windows.merge_intervals): events become
    [ts, ts + floor(value) seconds] activity intervals per user;
    overlapping/touching intervals merge into coverage islands. Fully
    oracled (running-max gaps-and-islands window twin)."""
    from ..stages.windows import merge_intervals

    ev = _events(sf_dir, ["user_id", "ts", "value"])

    def mk(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        ok = pc.and_(pc.and_(pc.is_valid(t.column("value")),
                             pc.is_valid(t.column("ts"))),
                     pa.array(np.isfinite(v) & (v >= 0)))
        t = t.filter(ok)
        micros = t.column("ts").cast(pa.int64()).to_numpy()
        dur = np.floor(t.column("value").to_numpy(
            zero_copy_only=False)).astype(np.int64) * 1_000_000
        return pa.table({
            "user_id": t.column("user_id"),
            "lo": t.column("ts"),
            "hi": pa.array(micros + dur).cast(pa.timestamp("us"))})

    out = merge_intervals(ev.map_batches(mk, batch_format="pyarrow"),
                          "user_id", "lo", "hi", nb=8)
    df = (out.to_pandas().sort_values(["user_id", "lo"])
          .reset_index(drop=True))
    df["n_intervals"] = df["n_intervals"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["merge_intervals_events"] = q_merge_intervals_events

ORACLES["merge_intervals_events"] = (
    "WITH x AS (SELECT user_id, ts AS lo,"
    "   ts + to_seconds(CAST(floor(value) AS BIGINT)) AS hi"
    "  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL"
    "   AND isfinite(value) AND value >= 0),"
    " w AS (SELECT user_id, lo, hi,"
    "   max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi"
    "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm"
    "  FROM x),"
    " b AS (SELECT *, CASE WHEN pm IS NULL OR lo > pm THEN 1 ELSE 0 END"
    "   AS brk FROM w),"
    " g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id"
    "   ORDER BY lo, hi ROWS BETWEEN UNBOUNDED PRECEDING AND"
    "   CURRENT ROW) AS grp FROM b)"
    " SELECT user_id, min(lo) AS lo, max(hi) AS hi,"
    "  count(*) AS n_intervals"
    " FROM g GROUP BY user_id, grp"
)


def q_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by first-activity month
    (cohort), counted distinct per months-since-cohort offset — the
    composition of dedup_exact + groupby_argmax + a bucketed join +
    sum_by_key. Fully oracled."""
    from ..stages.canonicalize import dedup_exact, groupby_argmax, sum_by_key
    from ..stages.join import shuffle_hash_join

    ev = _events(sf_dir, ["user_id", "ts"])

    def month_idx(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts"))))
        ts = t.column("ts")
        idx = pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                                 pa.scalar(12)),
                     pc.cast(pc.month(ts), pa.int64()))
        return pa.table({"user_id": t.column("user_id"), "midx": idx})

    um = dedup_exact(ev.map_batches(month_idx, batch_format="pyarrow"),
                     ["user_id", "midx"], nb=8)
    cohort = groupby_argmax(um, ["user_id"], ["midx"], [True], nb=8)
    cohort = cohort.map_batches(
        lambda t: pa.table({"user_id": t.column("user_id"),
                            "cohort": t.column("midx")}),
        batch_format="pyarrow")
    j = shuffle_hash_join(um, cohort, on=["user_id"], how="inner", nb=8)
    pairs = j.map_batches(
        lambda t: pa.table({
            "cohort": t.column("cohort"),
            "offset": pc.subtract(t.column("midx"), t.column("cohort")),
            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    out = sum_by_key(pairs, ["cohort", "offset"], "n", nb=8,
                     out_col="n_users")
    df = (out.to_pandas().sort_values(["cohort", "offset"])
          .reset_index(drop=True))
    df["n_users"] = df["n_users"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["retention_cohorts"] = q_retention_cohorts

ORACLES["retention_cohorts"] = (
    "WITH um AS (SELECT DISTINCT user_id,"
    "   year(ts) * 12 + month(ts) AS midx"
    "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),"
    " c AS (SELECT user_id, min(midx) AS cohort FROM um GROUP BY 1)"
    " SELECT CAST(c.cohort AS BIGINT) AS cohort,"
    "  CAST(um.midx - c.cohort AS BIGINT) AS offset,"
    "  count(DISTINCT um.user_id) AS n_users"
    " FROM um JOIN c USING (user_id)"
    " GROUP BY 1, 2"
)


def q_event_transitions(sf_dir: str):
    """First-order event-type transition counts per user stream
    (markov-chain prep): lag_per_key previous event_type in (ts,
    event_id) order composed with sum_by_key. Fully oracled (lag
    window twin)."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.windows import lag_per_key

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
    lagged = lag_per_key(ev, key_col="user_id", value_col="event_type",
                         order_cols=["ts", "event_id"], out="prev", nb=8)
    pairs = lagged.map_batches(
        lambda t: (lambda f: pa.table({
            "prev": f.column("prev"), "cur": f.column("event_type"),
            "n": pa.array(np.ones(f.num_rows, np.int64))}))(
            t.filter(pc.is_valid(t.column("prev")))),
        batch_format="pyarrow")
    out = sum_by_key(pairs, ["prev", "cur"], "n", nb=8, out_col="n")
    df = (out.to_pandas().sort_values(["prev", "cur"])
          .reset_index(drop=True))
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["event_transitions"] = q_event_transitions

ORACLES["event_transitions"] = (
    "WITH l AS (SELECT user_id, event_type AS cur,"
    "   lag(event_type) OVER (PARTITION BY user_id"
    "    ORDER BY ts, event_id) AS prev"
    "  FROM events)"
    " SELECT prev, cur, count(*) AS n FROM l"
    " WHERE prev IS NOT NULL GROUP BY 1, 2"
)


def q_phonetic_er(sf_dir: str):
    """Phonetic-blocked ER composition: vowel-doubled first words of
    part names (a Soundex-invariant corruption) matched back via
    soundex-key equality blocking + Jaro-Winkler verification — the
    soundex kernel and the JW scalar composed end to end. Fully
    oracled (both replayed in SQL)."""
    from ..functions.phonetic import soundex_array
    from ..stages.join import shuffle_hash_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])

    def words(t: pa.Table, corrupt: bool, idc: str) -> pa.Table:
        w = pc.replace_substring_regex(t.column("p_name"), r"\s.*$", "")
        if corrupt:
            t2 = t.filter(pa.array(
                t.column("p_partkey").to_numpy() % 20 == 0))
            w = pc.replace_substring_regex(pc.replace_substring_regex(
                t2.column("p_name"), r"\s.*$", ""),
                "a", "aa", max_replacements=1)
            t = t2
        return pa.table({idc: t.column("p_partkey"),
                         "w": w, "blk": soundex_array(w)})

    left = part.map_batches(lambda t: words(t, True, "l_id"),
                            batch_format="pyarrow")
    right = part.map_batches(lambda t: words(t, False, "r_id"),
                             batch_format="pyarrow")
    j = shuffle_hash_join(left, right, on=["blk"], how="inner", nb=16)

    def verify(t: pa.Table) -> pa.Table:
        from ..stages.similarity import jw_score_pairs

        # the blocked pairs repeat a tiny set of (word, word) combos
        # (first words of TPC-H part names) — score each DISTINCT
        # pair once and gather, instead of re-running JW per row
        pk = pc.binary_join_element_wise(
            t.column("w_l"), t.column("w_r"), "\x1f")
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        dic = pk.dictionary_encode()
        uniq = dic.dictionary.to_pylist()
        ul = [u.split("\x1f", 1)[0] for u in uniq]
        ur = [u.split("\x1f", 1)[1] for u in uniq]
        sim_u, keep_u = jw_score_pairs(ul, ur, 0.85)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        keep = keep_u[codes]
        sim = sim_u[codes][keep]
        t = t.filter(pa.array(keep))
        return pa.table({"l_id": t.column("l_id"),
                         "r_id": t.column("r_id"),
                         "sim": pa.array(sim)})

    out = j.map_batches(verify, batch_format="pyarrow").to_pandas()
    out = (out.drop_duplicates(["l_id", "r_id"])
           .sort_values(["l_id", "r_id"]).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


QUERIES["phonetic_er"] = q_phonetic_er

ORACLES["phonetic_er"] = (
    "WITH l0 AS (SELECT p_partkey AS l_id,"
    "   regexp_replace(regexp_replace(p_name, '\\s.*$', ''),"
    "    'a', 'aa') AS w FROM part WHERE p_partkey % 20 = 0),"
    " r0 AS (SELECT p_partkey AS r_id,"
    "   regexp_replace(p_name, '\\s.*$', '') AS w FROM part),"
    f" l AS (SELECT l_id, w, {_soundex_sql('w')} AS blk FROM l0),"
    f" r AS (SELECT r_id, w, {_soundex_sql('w')} AS blk FROM r0)"
    " SELECT DISTINCT l.l_id, r.r_id,"
    "  jaro_winkler_similarity(l.w, r.w) AS sim"
    " FROM l JOIN r USING (blk)"
    " WHERE jaro_winkler_similarity(l.w, r.w) >= 0.85"
)


def q_benford_orders(sf_dir: str):
    """Benford first-digit conformance (sketches.benford_deviation)
    of order totals in cents per order priority — the data-quality /
    fraud screen. First digits come from exact integer strings (both
    sides), chi-square vs embedded-literal Benford expectations."""
    from ..stages.sketches import benford_deviation

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice", "o_orderpriority"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), pa.scalar(100.0))), pa.int64())
        return pa.table({"cents": c,
                         "grp": t.column("o_orderpriority")})

    out = benford_deviation(
        orders.map_batches(cents, batch_format="pyarrow"),
        "cents", group_col="grp", nb=8)
    df = out.to_pandas().sort_values("grp").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["benford_orders"] = q_benford_orders


# build the benford oracle with explicit per-digit scalar subqueries
def _benford_oracle2() -> str:
    import math

    joins = " ".join(
        f"LEFT JOIN c o{d} ON o{d}.grp = t.grp AND o{d}.digit = {d}"
        for d in range(1, 10))
    terms = " + ".join(
        f"pow(coalesce(o{d}.n, 0) - t.n * {math.log10(1 + 1 / d)!r}, 2)"
        f" / (t.n * {math.log10(1 + 1 / d)!r})"
        for d in range(1, 10))
    return (
        "WITH v AS (SELECT o_orderpriority AS grp,"
        "   CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents"
        "  FROM orders),"
        " f AS (SELECT grp, CAST(substr(CAST(cents AS VARCHAR), 1, 1)"
        "   AS BIGINT) AS digit FROM v WHERE cents > 0),"
        " c AS (SELECT grp, digit, count(*) AS n FROM f GROUP BY 1, 2),"
        " t AS (SELECT grp, CAST(sum(n) AS BIGINT) AS n FROM c GROUP BY 1)"
        f" SELECT t.grp, t.n, round({terms}, 6) AS chi2 FROM t {joins}"
    )


ORACLES["benford_orders"] = _benford_oracle2()


def q_weighted_pagerank(sf_dir: str):
    """Weight-proportional PageRank (pagerank weight_col path): rank
    distributes as r*w/W_src over a weighted digraph derived from
    orders. Fully oracled (unrolled 3-iteration weighted CTE twin,
    rank rounded to 8 dp like graph_pagerank)."""
    from ..stages.graph import pagerank

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k, pa.int64()),
                         "w": pa.array((k % 5 + 1).astype(np.float64))})

    out = pagerank(orders.map_batches(edges, batch_format="pyarrow"),
                   src="src", dst="dst", damping=0.85, iters=3, nb=16,
                   weight_col="w")
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    df["rank"] = df["rank"].round(8)
    return pa.Table.from_pandas(
        df.sort_values("node").reset_index(drop=True),
        preserve_index=False)


QUERIES["weighted_pagerank"] = q_weighted_pagerank


def _weighted_pagerank_oracle_sql(iters: int = 3, d: float = 0.85) -> str:
    """graph.pagerank(weight_col=...) semantics unrolled: msum(dst) =
    Σ rank(src)·w/W_src with W_src = sum of outgoing weights."""
    s = (
        "WITH e AS (SELECT o_orderkey // 10 AS src, o_orderkey AS dst,"
        "   CAST(o_orderkey % 5 + 1 AS DOUBLE) AS w"
        "   FROM orders WHERE o_orderkey >= 10),"
        " deg AS (SELECT src, sum(w) AS deg FROM e GROUP BY src),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS (SELECT count(*) AS n FROM nodes),"
        " r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node,"
            f"   sum(r.rank / deg.deg * e.w) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", em{i} AS (SELECT coalesce(sum(msum), 0) AS emitted FROM m{i})"
            f", r{i + 1} AS (SELECT n.node,"
            f"   (1 - {d}) / nn.n + {d} * (1 - em.emitted) / nn.n"
            f"   + coalesce({d} * m.msum, 0) AS rank"
            f"   FROM nodes n CROSS JOIN nn CROSS JOIN em{i} em"
            f"   LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT CAST(node AS BIGINT) AS node,"
                f" round(rank, 8) AS rank FROM r{iters}")


ORACLES["weighted_pagerank"] = _weighted_pagerank_oracle_sql()


def q_components_incremental(sf_dir: str):
    """Incremental connected-components maintenance
    (graph.components_incremental): a 200-node chain-group labeling
    absorbs bridge edges (merging neighbor groups) plus brand-new
    node pairs — work proportional to the delta, one rewrite join.
    Fully oracled (recursive-CTE min-label twin over base ∪ delta)."""
    from ..stages.graph import components_incremental, string_components

    base_rows, delta_rows = [], []
    for i in range(200):
        if i % 5 < 4:
            base_rows.append({"src": f"n{i:04d}", "dst": f"n{i + 1:04d}"})
    for k in range(0, 39, 3):
        delta_rows.append({"src": f"n{5 * k + 4:04d}",
                           "dst": f"n{5 * k + 5:04d}"})
    for j in range(10):
        delta_rows.append({"src": f"x{j:02d}", "dst": f"y{j:02d}"})
    base = rd.from_arrow(pa.Table.from_pylist(base_rows)).repartition(3)
    delta = rd.from_arrow(pa.Table.from_pylist(delta_rows)).repartition(2)
    old = string_components(base, nb=8)
    out = components_incremental(old, delta, nb=8)
    df = out.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["components_incremental"] = q_components_incremental

ORACLES["components_incremental"] = (
    "WITH RECURSIVE b AS ("
    "  SELECT 'n' || lpad(CAST(i AS VARCHAR), 4, '0') AS src,"
    "   'n' || lpad(CAST(i + 1 AS VARCHAR), 4, '0') AS dst"
    "  FROM generate_series(0, 199) s(i) WHERE i % 5 < 4),"
    " d AS ("
    "  SELECT 'n' || lpad(CAST(5 * k + 4 AS VARCHAR), 4, '0') AS src,"
    "   'n' || lpad(CAST(5 * k + 5 AS VARCHAR), 4, '0') AS dst"
    "  FROM generate_series(0, 38, 3) s(k)"
    "  UNION ALL"
    "  SELECT 'x' || lpad(CAST(j AS VARCHAR), 2, '0'),"
    "   'y' || lpad(CAST(j AS VARCHAR), 2, '0')"
    "  FROM generate_series(0, 9) s(j)),"
    " ed AS (SELECT src, dst FROM b UNION ALL SELECT dst, src FROM b"
    "  UNION ALL SELECT src, dst FROM d UNION ALL SELECT dst, src FROM d),"
    " reach(node, lab) AS ("
    "  SELECT src, src FROM ed"
    "  UNION SELECT ed.dst, r.lab FROM reach r JOIN ed ON ed.src = r.node)"
    " SELECT node, min(lab) AS lab FROM reach GROUP BY node"
)


def q_embedding_profile(sf_dir: str):
    """Embedding-column QC (similarity.embedding_norm_profile): row
    L2-norm census in one pass — float64-upcast squares, sequential
    64-dim sums, so per-row norms bit-match the SQL list_aggregate
    twin."""
    from ..stages.similarity import embedding_norm_profile

    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding"])
    return embedding_norm_profile(vecs, "embedding")


QUERIES["embedding_profile"] = q_embedding_profile

ORACLES["embedding_profile"] = (
    "WITH v AS (SELECT sqrt(list_aggregate(list_transform(embedding,"
    "   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nm,"
    "   len(embedding) AS d"
    "  FROM embeddings WHERE embedding IS NOT NULL)"
    " SELECT count(*) AS n, CAST(max(d) AS BIGINT) AS dim,"
    "  round(avg(nm), 6) AS mean_norm,"
    "  round(min(nm), 6) AS min_norm,"
    "  round(max(nm), 6) AS max_norm"
    " FROM v"
)


def q_kwic_mentions(sf_dir: str):
    """KWIC mention contexts (textstats.kwic_contexts): every
    non-overlapping occurrence of join/merge/scan with a ±12-char
    snippet — the annotation-debugging view. The SQL twin replays the
    identical RE2 alternation with two lockstep regexp_extract_all
    unnests."""
    from ..stages.textstats import kwic_contexts

    out = kwic_contexts(_docs(sf_dir, ["doc_id", "text"]),
                        ["join", "merge", "scan"], width=12)
    df = (out.to_pandas()
          .sort_values(["doc_id", "term", "snippet"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["kwic_mentions"] = q_kwic_mentions

ORACLES["kwic_mentions"] = (
    "WITH m AS (SELECT doc_id,"
    "   regexp_extract_all(text,"
    "    '(.{0,12}(merge|join|scan).{0,12})', 1) AS sn,"
    "   regexp_extract_all(text,"
    "    '(.{0,12}(merge|join|scan).{0,12})', 2) AS tm"
    "  FROM documents WHERE text IS NOT NULL)"
    " SELECT doc_id, unnest(tm) AS term, unnest(sn) AS snippet FROM m"
)


def q_dau_mau(sf_dir: str):
    """DAU/MAU stickiness per month: distinct (day, user) census,
    distinct active days and MAU per month — stickiness =
    pairs / (days · mau) (= mean DAU over observed days / MAU).
    Composition of dedup_exact + sum_by_key. Fully oracled."""
    from ..stages.canonicalize import dedup_exact, sum_by_key

    ev = _events(sf_dir, ["user_id", "ts"])

    def keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("user_id")),
                             pc.is_valid(t.column("ts"))))
        ts = t.column("ts")
        midx = pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()),
                                  pa.scalar(12)),
                      pc.cast(pc.month(ts), pa.int64()))
        day = pc.cast(pc.day_of_year(ts), pa.int64())
        return pa.table({"midx": midx, "day": day,
                         "user_id": t.column("user_id")})

    du = dedup_exact(ev.map_batches(keys, batch_format="pyarrow"),
                     ["midx", "day", "user_id"], nb=8)
    pairs = sum_by_key(du.map_batches(
        lambda t: pa.table({"midx": t.column("midx"),
                            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow"), "midx", "n", nb=8, out_col="pairs")
    days = sum_by_key(dedup_exact(du, ["midx", "day"], nb=8).map_batches(
        lambda t: pa.table({"midx": t.column("midx"),
                            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow"), "midx", "n", nb=8, out_col="days")
    mau = sum_by_key(dedup_exact(du, ["midx", "user_id"], nb=8).map_batches(
        lambda t: pa.table({"midx": t.column("midx"),
                            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow"), "midx", "n", nb=8, out_col="mau")
    from ..stages.join import shuffle_hash_join

    j = shuffle_hash_join(shuffle_hash_join(pairs, days, on=["midx"],
                                            how="inner", nb=8),
                          mau, on=["midx"], how="inner", nb=8)
    df = j.to_pandas().sort_values("midx").reset_index(drop=True)
    for c in ("pairs", "days", "mau"):
        df[c] = df[c].astype("int64")
    df["stickiness"] = (df["pairs"] / (df["days"] * df["mau"])).round(6)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["dau_mau"] = q_dau_mau

ORACLES["dau_mau"] = (
    "WITH du AS (SELECT DISTINCT year(ts) * 12 + month(ts) AS midx,"
    "   dayofyear(ts) AS day, user_id"
    "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)"
    " SELECT CAST(midx AS BIGINT) AS midx,"
    "  count(*) AS pairs,"
    "  count(DISTINCT day) AS days,"
    "  count(DISTINCT user_id) AS mau,"
    "  round(count(*) * 1.0 / (count(DISTINCT day)"
    "   * count(DISTINCT user_id)), 6) AS stickiness"
    " FROM du GROUP BY 1"
)


def q_blocking_quality(sf_dir: str):
    """ER blocking-scheme QA (similarity.blocking_quality) over the
    er_parts corpus: pair completeness of the (first-char, len-band)
    blocking against the identity gold pairs (a dropped 2nd char can
    shift the length band → genuinely lost pairs) + the reduction
    ratio vs the full cross product. Fully oracled (census-product
    twin)."""
    from ..stages.similarity import blocking_quality

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])

    def blk_of(name_col):
        import pandas as pd

        s = name_col.to_pandas().fillna("").astype(str)
        return pa.array(s.str[:1] + "|" + (s.str.len() // 4).astype(str))

    def mk_left(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t.column("p_partkey").to_numpy() % 20 == 0))
        nm = pa.array([s[:1] + s[2:] for s in
                       t.column("p_name").to_pylist()])
        return pa.table({"l_id": t.column("p_partkey"),
                         "blk": blk_of(nm)})

    def mk_right(t: pa.Table) -> pa.Table:
        return pa.table({"r_id": t.column("p_partkey"),
                         "blk": blk_of(t.column("p_name"))})

    def mk_gold(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t.column("p_partkey").to_numpy() % 20 == 0))
        return pa.table({"l_id": t.column("p_partkey"),
                         "r_id": t.column("p_partkey")})

    left = part.map_batches(mk_left, batch_format="pyarrow")
    right = part.map_batches(mk_right, batch_format="pyarrow")
    gold = part.map_batches(mk_gold, batch_format="pyarrow")
    return blocking_quality(left, right, gold, nb=8)


QUERIES["blocking_quality"] = q_blocking_quality

ORACLES["blocking_quality"] = (
    "WITH l AS (SELECT p_partkey AS lid,"
    "   substr(nm, 1, 1) || '|' || CAST(length(nm) // 4 AS VARCHAR)"
    "    AS blk"
    "  FROM (SELECT p_partkey,"
    "    substr(p_name, 1, 1) || substr(p_name, 3) AS nm"
    "   FROM part WHERE p_partkey % 20 = 0)),"
    " r AS (SELECT p_partkey AS rid,"
    "   substr(p_name, 1, 1) || '|'"
    "    || CAST(length(p_name) // 4 AS VARCHAR) AS blk FROM part),"
    " cl AS (SELECT blk, count(*) AS nl FROM l GROUP BY 1),"
    " cr AS (SELECT blk, count(*) AS nr FROM r GROUP BY 1),"
    " cand AS (SELECT coalesce(sum(nl * nr), 0) AS c FROM cl"
    "  JOIN cr USING (blk)),"
    " co AS (SELECT count(*) AS co FROM l JOIN r"
    "   ON l.lid = r.rid AND l.blk = r.blk),"
    " nn AS (SELECT (SELECT count(*) FROM l) AS n_left,"
    "   (SELECT count(*) FROM r) AS n_right,"
    "   (SELECT count(*) FROM l) AS n_gold)"
    " SELECT n_left, n_right, n_gold, co.co AS co_blocked,"
    "  CAST(cand.c AS BIGINT) AS candidates,"
    "  round(co.co * 1.0 / n_gold, 6) AS pair_completeness,"
    "  round(1.0 - cand.c * 1.0 / (n_left * n_right), 6)"
    "   AS reduction_ratio"
    " FROM nn, cand, co"
)


def q_calibration_events(sf_dir: str):
    """Classifier calibration table (sketches.calibration_bins):
    deterministic [0,1] scores vs 'purchase' labels over events, 10
    equal-width bins with count / mean score / observed positive
    rate. Fully oracled."""
    from ..stages.sketches import calibration_bins

    ev = _events(sf_dir, ["event_id", "event_type"])

    def score(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        s = (eid % 1000) / 999.0
        y = pc.equal(t.column("event_type"), pa.scalar("purchase"))
        return pa.table({
            "score": pa.array(s),
            "label": pc.cast(pc.fill_null(y, False), pa.int64())})

    return calibration_bins(ev.map_batches(score, batch_format="pyarrow"),
                            "score", "label", n_bins=10, nb=4)


QUERIES["calibration_events"] = q_calibration_events

ORACLES["calibration_events"] = (
    "WITH s AS (SELECT (event_id % 1000) / 999.0 AS score,"
    "   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y"
    "  FROM events),"
    " b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,"
    "   score, y FROM s)"
    " SELECT bin, count(*) AS n,"
    "  round(sum(score) / count(*), 6) AS mean_score,"
    "  round(sum(y) * 1.0 / count(*), 6) AS frac_pos"
    " FROM b GROUP BY bin"
)


def q_label_prf(sf_dir: str):
    """Per-label precision/recall/F1 (sketches.label_prf) between
    event_type and the kappa corpus's perturbed annotator — the
    per-class annotation-QA complement of annotator_kappa. Fully
    oracled."""
    from ..stages.sketches import label_prf

    ev = _events(sf_dir, ["event_id", "event_type"])

    def two(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy()
        a = t.column("event_type")
        b = pc.if_else(pa.array(eid % 7 == 0),
                       pa.scalar("other", pa.string()), a)
        return pa.table({"gold": a, "pred": b})

    return label_prf(ev.map_batches(two, batch_format="pyarrow"),
                     "gold", "pred", nb=4)


QUERIES["label_prf"] = q_label_prf

ORACLES["label_prf"] = (
    "WITH p AS (SELECT event_type AS a,"
    "   CASE WHEN event_id % 7 = 0 THEN 'other' ELSE event_type END AS b"
    "  FROM events WHERE event_type IS NOT NULL),"
    " g AS (SELECT a AS label, count(*) AS n_gold FROM p GROUP BY 1),"
    " q AS (SELECT b AS label, count(*) AS n_pred FROM p GROUP BY 1),"
    " d AS (SELECT a AS label, count(*) AS tp FROM p WHERE a = b"
    "  GROUP BY 1),"
    " labs AS (SELECT label FROM g UNION SELECT label FROM q),"
    " m AS (SELECT labs.label,"
    "   coalesce(g.n_gold, 0) AS n_gold,"
    "   coalesce(q.n_pred, 0) AS n_pred,"
    "   coalesce(d.tp, 0) AS tp"
    "  FROM labs LEFT JOIN g USING (label) LEFT JOIN q USING (label)"
    "   LEFT JOIN d USING (label)),"
    " f AS (SELECT label, n_gold, n_pred, tp,"
    "   CASE WHEN n_pred = 0 THEN 0.0 ELSE tp * 1.0 / n_pred END AS pr,"
    "   CASE WHEN n_gold = 0 THEN 0.0 ELSE tp * 1.0 / n_gold END AS rc"
    "  FROM m)"
    " SELECT label, n_gold, n_pred, tp, round(pr, 6) AS precision,"
    "  round(rc, 6) AS recall,"
    "  round(CASE WHEN pr + rc = 0 THEN 0.0"
    "   ELSE 2 * pr * rc / (pr + rc) END, 6) AS f1"
    " FROM f"
)


def _gold_triples(sf_dir: str):
    """Shared events-derived distinct triple set (the triple_agreement
    gold): (user -> event_type -> value-bucket)."""
    from ..stages.canonicalize import dedup_exact

    ev = _events(sf_dir, ["user_id", "event_type", "value"])

    def mk(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("value")),
                             pc.is_valid(t.column("event_type"))),
                     pc.is_valid(t.column("user_id")))
        t = t.filter(ok)
        return pa.table({
            "subj": t.column("user_id").cast(pa.int64()),
            "pred": t.column("event_type"),
            "obj": pc.cast(pc.floor(pc.divide(
                t.column("value"), pa.scalar(100.0))), pa.int64())})

    return dedup_exact(ev.map_batches(mk, batch_format="pyarrow"),
                       ["subj", "pred", "obj"], nb=8)


_GOLD_TRIPLES_SQL = (
    "SELECT DISTINCT user_id AS subj, event_type AS pred,"
    " CAST(floor(value / 100.0) AS BIGINT) AS obj"
    " FROM events WHERE value IS NOT NULL"
    "  AND event_type IS NOT NULL AND user_id IS NOT NULL"
)


def q_annotation_drift(sf_dir: str):
    """Per-predicate drift census between two annotation-run triple
    sets (the KG regression report after an extractor change): gold
    vs the triple_agreement perturbation — added/removed counts per
    predicate via two bucketed anti joins + one sum_by_key. Fully
    oracled (EXCEPT twins)."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.join import shuffle_hash_join

    gold = _gold_triples(sf_dir)

    def mk_pred(t: pa.Table) -> pa.Table:
        s = t.column("subj").to_numpy()
        kept = t.filter(pa.array(s % 13 != 0))
        fakes_src = t.filter(pa.array(s % 17 == 0))
        fakes = pa.table({
            "subj": pc.add(fakes_src.column("subj"), pa.scalar(1000000)),
            "pred": pa.array(["fake"] * fakes_src.num_rows, pa.string()),
            "obj": pa.array(np.zeros(fakes_src.num_rows, np.int64))})
        return pa.concat_tables([kept, fakes])

    from ..stages.canonicalize import dedup_exact

    # the fakes replicate per gold triple of a subject — SET semantics
    # (the SQL twin's UNION) need a dedup before the anti joins
    cols = ["subj", "pred", "obj"]
    newv = dedup_exact(gold.map_batches(mk_pred, batch_format="pyarrow"),
                       cols, nb=8)
    removed = shuffle_hash_join(gold, newv, on=cols, how="anti",
                                nb=8).map_batches(
        lambda t: pa.table({"pred": t.column("pred"),
                            "change": pa.array(["removed"] * t.num_rows),
                            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    added = shuffle_hash_join(newv, gold, on=cols, how="anti",
                              nb=8).map_batches(
        lambda t: pa.table({"pred": t.column("pred"),
                            "change": pa.array(["added"] * t.num_rows),
                            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    out = sum_by_key(removed.union(added), ["pred", "change"], "n",
                     nb=8, out_col="n")
    df = (out.to_pandas().sort_values(["pred", "change"])
          .reset_index(drop=True))
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["annotation_drift"] = q_annotation_drift

ORACLES["annotation_drift"] = (
    f"WITH gold AS ({_GOLD_TRIPLES_SQL}),"
    " newv AS (SELECT * FROM gold WHERE subj % 13 <> 0"
    "  UNION SELECT subj + 1000000, 'fake', 0 FROM gold"
    "   WHERE subj % 17 = 0),"
    " ch AS ("
    "  SELECT pred, 'removed' AS change FROM"
    "   (SELECT * FROM gold EXCEPT SELECT * FROM newv)"
    "  UNION ALL"
    "  SELECT pred, 'added' FROM"
    "   (SELECT * FROM newv EXCEPT SELECT * FROM gold))"
    " SELECT pred, change, count(*) AS n FROM ch GROUP BY 1, 2"
)


def q_crawl_budget(sf_dir: str):
    """Crawl-budget allocation: pages-per-host quota proportional to
    host PageRank over a deterministic host link graph —
    floor(10000 * rank) after the 8-dp rank rounding the pagerank
    oracle family uses. Fully oracled (unrolled CTE + same floor)."""
    from ..stages.canonicalize import dedup_exact
    from ..stages.graph import pagerank

    rows = []
    for i in range(300):
        s, d = f"h{i % 20}", f"h{(i * 7 + 3) % 20}"
        if s != d:
            rows.append({"src": s, "dst": d})
    edges = dedup_exact(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3),
        ["src", "dst"], nb=8)
    out = pagerank(edges, iters=3, nb=8)
    df = out.to_pandas()
    df["rank"] = df["rank"].round(8)
    df["quota"] = np.floor(10000 * df["rank"]).astype("int64")
    return pa.Table.from_pandas(
        df.sort_values("node").reset_index(drop=True),
        preserve_index=False)


QUERIES["crawl_budget"] = q_crawl_budget


def _crawl_budget_oracle(iters: int = 3, d: float = 0.85) -> str:
    s = (
        "WITH e0 AS (SELECT 'h' || CAST(i % 20 AS VARCHAR) AS src,"
        "   'h' || CAST((i * 7 + 3) % 20 AS VARCHAR) AS dst"
        "  FROM generate_series(0, 299) s(i)),"
        " e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),"
        " deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS (SELECT count(*) AS n FROM nodes),"
        " r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node, sum(r.rank / deg.deg) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", em{i} AS (SELECT coalesce(sum(msum), 0) AS emitted FROM m{i})"
            f", r{i + 1} AS (SELECT n.node,"
            f"   (1 - {d}) / nn.n + {d} * (1 - em.emitted) / nn.n"
            f"   + coalesce({d} * m.msum, 0) AS rank"
            f"   FROM nodes n CROSS JOIN nn CROSS JOIN em{i} em"
            f"   LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT node, round(rank, 8) AS rank,"
                f" CAST(floor(10000 * round(rank, 8)) AS BIGINT) AS quota"
                f" FROM r{iters}")


ORACLES["crawl_budget"] = _crawl_budget_oracle()


def q_predicate_cardinality(sf_dir: str):
    """KG predicate profile: per predicate the triple count, distinct
    subjects/objects, and functionality degree (avg triples per
    subject) — the schema-discovery census that decides which
    predicates are functional. groupby_nunique + sum_by_key
    composition over the shared gold triple set. Fully oracled."""
    from ..stages.canonicalize import groupby_nunique, sum_by_key
    from ..stages.join import shuffle_hash_join

    gold = _gold_triples(sf_dir)

    def tag_subj(t: pa.Table) -> pa.Table:
        return pa.table({"pred": t.column("pred"),
                         "subj": t.column("subj")})

    def tag_obj(t: pa.Table) -> pa.Table:
        return pa.table({"pred": t.column("pred"),
                         "obj": t.column("obj")})

    nt = sum_by_key(gold.map_batches(
        lambda t: pa.table({"pred": t.column("pred"),
                            "n": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow"), "pred", "n", nb=8, out_col="n_triples")
    ns = groupby_nunique(gold.map_batches(tag_subj,
                                          batch_format="pyarrow"),
                         "pred", "subj", nb=8)
    no = groupby_nunique(gold.map_batches(tag_obj,
                                          batch_format="pyarrow"),
                         "pred", "obj", nb=8)
    ns = ns.map_batches(lambda t: t.rename_columns(["pred", "n_subj"]),
                        batch_format="pyarrow")
    no = no.map_batches(lambda t: t.rename_columns(["pred", "n_obj"]),
                        batch_format="pyarrow")
    j = shuffle_hash_join(shuffle_hash_join(nt, ns, on=["pred"],
                                            how="inner", nb=8),
                          no, on=["pred"], how="inner", nb=8)
    df = j.to_pandas().sort_values("pred").reset_index(drop=True)
    for c in ("n_triples", "n_subj", "n_obj"):
        df[c] = df[c].astype("int64")
    df["functionality"] = (df["n_triples"] / df["n_subj"]).round(6)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["predicate_cardinality"] = q_predicate_cardinality

ORACLES["predicate_cardinality"] = (
    f"WITH gold AS ({_GOLD_TRIPLES_SQL})"
    " SELECT pred, count(*) AS n_triples,"
    "  count(DISTINCT subj) AS n_subj,"
    "  count(DISTINCT obj) AS n_obj,"
    "  round(count(*) * 1.0 / count(DISTINCT subj), 6) AS functionality"
    " FROM gold GROUP BY pred"
)


def q_langid_agreement(sf_dir: str):
    """Language-column QA: Cohen's kappa between the documents table's
    declared lang and the engine's n-gram lang_id prediction — the
    lang-ID and annotation-QA families composed. Fully oracled (the
    SQL twin replays the full lang-ID stopword census, then the kappa
    marginals formula)."""
    from ..stages.sketches import cohen_kappa

    pred = (_docs(sf_dir, ["doc_id", "text", "lang"])
            .map_batches(as_task_fn(textstats.LangIdStage),
                         batch_format="pyarrow"))
    keep = pred.map_batches(
        lambda t: pa.table({"lang": t.column("lang"),
                            "lang_pred": t.column("lang_pred")}),
        batch_format="pyarrow")
    return cohen_kappa(keep, "lang", "lang_pred", nb=4)


QUERIES["langid_agreement"] = q_langid_agreement

ORACLES["langid_agreement"] = (
    _langid_pred_sql(", lang")
    + ", p AS (SELECT lang AS a, lang_pred AS b FROM langpred WHERE lang IS NOT NULL),"
    " nn AS (SELECT count(*) AS n FROM p),"
    " ag AS (SELECT count(*) * 1.0 AS agree FROM p WHERE a = b),"
    " ra AS (SELECT a, count(*) * 1.0 AS c FROM p GROUP BY a),"
    " cb AS (SELECT b, count(*) * 1.0 AS c FROM p GROUP BY b),"
    " pe AS (SELECT sum(ra.c * cb.c) AS s FROM ra"
    "  JOIN cb ON ra.a = cb.b)"
    " SELECT nn.n, round(ag.agree / nn.n, 6) AS po,"
    "  round(pe.s / (nn.n * 1.0 * nn.n), 6) AS pe,"
    "  round((ag.agree / nn.n - pe.s / (nn.n * 1.0 * nn.n))"
    "   / (1 - pe.s / (nn.n * 1.0 * nn.n)), 6) AS kappa"
    " FROM nn, ag, pe"
)


def q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency fit over the corpus token census: OLS of
    ln(freq) on ln(rank) for the top-200 tokens — token census
    (sum_by_key) × global_row_number ranking × the trend sufficient-
    statistics pass composed. Fully oracled (window row_number +
    explicit-sums formula twin; ln() bit-parity as in the PMI
    family)."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.sketches import trend_per_key
    from ..stages.windows import global_row_number

    docs = _docs(sf_dir, ["text"])

    def toks(t: pa.Table) -> pa.Table:
        import pandas as pd

        s = t.column("text").to_pandas().fillna("").str.strip()
        parts = s.str.split(r"\s+", regex=True)
        parts = parts.apply(lambda xs: [x for x in xs if x])
        flat = [w for row in parts for w in row]
        return pa.table({"token": pa.array(flat, pa.string()),
                         "n": pa.array(np.ones(len(flat), np.int64))})

    census = sum_by_key(docs.map_batches(toks, batch_format="pyarrow"),
                        "token", "n", nb=8, out_col="cnt")
    census = census.map_batches(
        lambda t: t.append_column(
            "neg", pc.negate(t.column("cnt").cast(pa.int64()))),
        batch_format="pyarrow")
    ranked = global_row_number(census, order_cols=["neg", "token"],
                               n_parts=8)
    top = ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t.column("rn"),
                                         pa.scalar(200))),
        batch_format="pyarrow")

    def xy(t: pa.Table) -> pa.Table:
        r = t.column("rn").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.float64)
        return pa.table({"k": pa.array(np.zeros(len(r), np.int64)),
                         "x": pa.array(np.log(r)),
                         "y": pa.array(np.log(c))})

    out = trend_per_key(top.map_batches(xy, batch_format="pyarrow"),
                        "k", "x", "y", nb=4)
    df = out.to_pandas().reset_index(drop=True)
    return pa.Table.from_pandas(df[["slope", "intercept", "r2"]],
                                preserve_index=False)


QUERIES["zipf_slope"] = q_zipf_slope

ORACLES["zipf_slope"] = (
    "WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\\s+'))"
    "   AS token FROM documents WHERE text IS NOT NULL"
    "   AND trim(text) <> ''),"
    " c AS (SELECT token, count(*) AS cnt FROM toks"
    "  WHERE token <> '' GROUP BY token),"
    " r AS (SELECT cnt, row_number() OVER"
    "   (ORDER BY cnt DESC, token ASC) AS rn FROM c),"
    " d AS (SELECT ln(CAST(rn AS DOUBLE)) AS x,"
    "   ln(CAST(cnt AS DOUBLE)) AS y FROM r WHERE rn <= 200),"
    " s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,"
    "   sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM d)"
    " SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)"
    "   AS slope,"
    "  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)"
    "    / n, 6) AS intercept,"
    "  round(power(n * sxy - sx * sy, 2)"
    "    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2"
    " FROM s"
)


def q_triple_provenance(sf_dir: str):
    """Per-triple provenance aggregation: each distinct fact carries
    the ordered list of source ids that asserted it plus the mention
    count — collect_seq_per_key over a composite triple key. Fully
    oracled (ordered string_agg twin)."""
    from ..stages.windows import collect_seq_per_key

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])

    def mk(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column("value")),
                             pc.is_valid(t.column("event_type"))),
                     pc.is_valid(t.column("user_id")))
        t = t.filter(ok)
        obj = pc.cast(pc.floor(pc.divide(t.column("value"),
                                         pa.scalar(100.0))), pa.int64())
        key = pc.binary_join_element_wise(
            pc.cast(t.column("user_id"), pa.string()),
            t.column("event_type"),
            pc.cast(obj, pa.string()), "|")
        return pa.table({"triple": key,
                         "src": pc.cast(t.column("event_id"),
                                        pa.string()),
                         "event_id": t.column("event_id")})

    out = collect_seq_per_key(ev.map_batches(mk, batch_format="pyarrow"),
                              key_col="triple", value_col="src",
                              order_cols=["event_id"], sep=",",
                              out="sources", nb=8)
    df = out.to_pandas().sort_values("triple").reset_index(drop=True)
    df["n_mentions"] = df["sources"].str.count(",") + 1
    return pa.Table.from_pandas(df[["triple", "sources", "n_mentions"]],
                                preserve_index=False)


QUERIES["triple_provenance"] = q_triple_provenance

ORACLES["triple_provenance"] = (
    "WITH t AS (SELECT CAST(user_id AS VARCHAR) || '|' || event_type"
    "   || '|' || CAST(CAST(floor(value / 100.0) AS BIGINT) AS VARCHAR)"
    "   AS triple, event_id"
    "  FROM events WHERE value IS NOT NULL"
    "   AND event_type IS NOT NULL AND user_id IS NOT NULL)"
    " SELECT triple,"
    "  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)"
    "   AS sources,"
    "  CAST(count(*) AS BIGINT) AS n_mentions"
    " FROM t GROUP BY triple"
)


def q_community_conductance(sf_dir: str):
    """Per-community conductance (graph.conductance) of the LPA
    assignment over the lpa_communities corpus — the cut-quality
    complement of community_modularity. Fully oracled (unrolled-LPA +
    cut/volume census twin)."""
    from ..stages.graph import conductance, label_propagation

    rows = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append({"a": base + i, "b": base + j})
    rows.append({"a": 4, "b": 10})
    for i in range(6):
        rows.append({"a": 20 + i, "b": 21 + i})
    edges = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    labels = label_propagation(edges, n_iters=3, nb=8)
    out = conductance(edges, labels, nb=8)
    df = out.to_pandas().sort_values("label").reset_index(drop=True)
    for c in ("label", "cut_edges", "volume"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["community_conductance"] = q_community_conductance

ORACLES["community_conductance"] = (
    "WITH base AS ("
    " SELECT b10 + i AS a, b10 + j AS b"
    "  FROM (VALUES (0), (10)) t(b10),"
    "   generate_series(0, 4) s(i), generate_series(0, 4) u(j)"
    "  WHERE i < j"
    " UNION ALL SELECT 4, 10"
    " UNION ALL SELECT 20 + i, 21 + i FROM generate_series(0, 5) s(i)),"
    " e AS (SELECT a AS src, b AS dst FROM base"
    "  UNION ALL SELECT b, a FROM base),"
    " l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),"
    + _LPA_VOTE.format(k=1, p=0)
    + _LPA_VOTE.format(k=2, p=1)
    + _LPA_VOTE.format(k=3, p=2)
    + " f AS (SELECT node, lab FROM l3),"
    " m AS (SELECT count(*) AS m FROM base),"
    " cutpairs AS (SELECT la.lab AS lab FROM base"
    "   JOIN f la ON la.node = base.a JOIN f lb ON lb.node = base.b"
    "   WHERE la.lab <> lb.lab"
    "  UNION ALL SELECT lb.lab FROM base"
    "   JOIN f la ON la.node = base.a JOIN f lb ON lb.node = base.b"
    "   WHERE la.lab <> lb.lab),"
    " cut AS (SELECT lab, count(*) AS cut_edges FROM cutpairs"
    "  GROUP BY 1),"
    " deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),"
    " vol AS (SELECT f.lab, sum(deg.d) AS volume FROM deg"
    "  JOIN f ON f.node = deg.node GROUP BY 1)"
    " SELECT CAST(vol.lab AS BIGINT) AS label,"
    "  CAST(coalesce(cut.cut_edges, 0) AS BIGINT) AS cut_edges,"
    "  CAST(vol.volume AS BIGINT) AS volume,"
    "  round(coalesce(cut.cut_edges, 0) * 1.0"
    "   / least(vol.volume, 2 * m.m - vol.volume), 6) AS conductance"
    " FROM vol LEFT JOIN cut ON cut.lab = vol.lab CROSS JOIN m"
)


def q_span_agreement(sf_dir: str):
    """Soft span-level annotation agreement (graph.span_agreement):
    gold mention spans derived from orders, predictions = gold
    shifted +3 chars for every 2nd span (still overlapping), dropped
    for every 5th, plus disjoint fakes — overlap-based P/R/F1. Fully
    oracled (EXISTS-overlap twin)."""
    from ..stages.graph import span_agreement

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def mk_gold(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy()
        s = (k * 7) % 995
        return pa.table({"doc_id": pa.array(k % 100),
                         "start": pa.array(s),
                         "end": pa.array(s + 12)})

    def mk_pred(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy()
        k = k[k % 5 != 0]  # dropped spans
        s = (k * 7) % 995 + np.where(k % 2 == 0, 3, 0)  # boundary drift
        fk = t.column("o_orderkey").to_numpy()
        fk = fk[fk % 11 == 0]  # disjoint fakes
        fs = (fk * 13) % 900 + 2000
        return pa.table({
            "doc_id": pa.array(np.concatenate([k % 100, fk % 100])),
            "start": pa.array(np.concatenate([s, fs])),
            "end": pa.array(np.concatenate([s + 12, fs + 12]))})

    gold = orders.map_batches(mk_gold, batch_format="pyarrow")
    pred = orders.map_batches(mk_pred, batch_format="pyarrow")
    return span_agreement(gold, pred, nb=8)


QUERIES["span_agreement"] = q_span_agreement

ORACLES["span_agreement"] = (
    "WITH gold AS (SELECT DISTINCT o_orderkey % 100 AS doc_id,"
    "   (o_orderkey * 7) % 995 AS start,"
    "   (o_orderkey * 7) % 995 + 12 AS \"end\" FROM orders),"
    " predt AS ("
    "  SELECT DISTINCT o_orderkey % 100 AS doc_id,"
    "   (o_orderkey * 7) % 995"
    "    + CASE WHEN o_orderkey % 2 = 0 THEN 3 ELSE 0 END AS start,"
    "   (o_orderkey * 7) % 995"
    "    + CASE WHEN o_orderkey % 2 = 0 THEN 3 ELSE 0 END + 12 AS \"end\""
    "   FROM orders WHERE o_orderkey % 5 <> 0"
    "  UNION SELECT DISTINCT o_orderkey % 100,"
    "   (o_orderkey * 13) % 900 + 2000,"
    "   (o_orderkey * 13) % 900 + 2012 FROM orders"
    "   WHERE o_orderkey % 11 = 0),"
    " mp AS (SELECT count(*) AS matched_pred FROM predt p"
    "  WHERE EXISTS (SELECT 1 FROM gold g WHERE g.doc_id = p.doc_id"
    "   AND least(p.\"end\", g.\"end\") - greatest(p.start, g.start)"
    "    >= 1)),"
    " mg AS (SELECT count(*) AS matched_gold FROM gold g"
    "  WHERE EXISTS (SELECT 1 FROM predt p WHERE p.doc_id = g.doc_id"
    "   AND least(p.\"end\", g.\"end\") - greatest(p.start, g.start)"
    "    >= 1)),"
    " nn AS (SELECT (SELECT count(*) FROM gold) AS n_gold,"
    "   (SELECT count(*) FROM predt) AS n_pred)"
    " SELECT n_gold, n_pred, matched_pred, matched_gold,"
    "  round(matched_pred * 1.0 / n_pred, 6) AS precision,"
    "  round(matched_gold * 1.0 / n_gold, 6) AS recall,"
    "  round(2.0 * (matched_pred * 1.0 / n_pred)"
    "   * (matched_gold * 1.0 / n_gold)"
    "   / ((matched_pred * 1.0 / n_pred)"
    "    + (matched_gold * 1.0 / n_gold)), 6) AS f1"
    " FROM nn, mp, mg"
)


def q_inclusion_deps(sf_dir: str):
    """FK-candidate discovery (profile.inclusion_profile): distinct-
    value containment between three column pairs — two true foreign
    keys (containment 1.0) and the reverse direction (customers
    without orders < 1.0). The schema-induction primitive for
    stitching extracted web tables into a KG. Twin: per-pair distinct
    counts + IN-semijoin overlap in SQL."""
    from ..stages.profile import inclusion_profile

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    orders_k = rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey"])
    orders_c = rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    pairs = [
        ("lineitem.l_orderkey->orders.o_orderkey",
         inclusion_profile(li, "l_orderkey", orders_k, "o_orderkey",
                           nb=16)),
        ("orders.o_custkey->customer.c_custkey",
         inclusion_profile(orders_c, "o_custkey", cust, "c_custkey",
                           nb=16)),
        ("customer.c_custkey->orders.o_custkey",
         inclusion_profile(cust, "c_custkey", orders_c, "o_custkey",
                           nb=16)),
    ]
    t = pa.concat_tables([p.append_column(
        "pair", pa.array([name], pa.string())) for name, p in pairs])
    df = (t.to_pandas().sort_values("pair").reset_index(drop=True)
          [["pair", "n_left", "n_right", "n_overlap", "containment"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["inclusion_deps"] = q_inclusion_deps

ORACLES["inclusion_deps"] = (
    "WITH p1 AS (SELECT 'lineitem.l_orderkey->orders.o_orderkey'"
    "   AS pair,"
    "  (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_left,"
    "  (SELECT count(DISTINCT o_orderkey) FROM orders) AS n_right,"
    "  (SELECT count(DISTINCT l_orderkey) FROM lineitem"
    "   WHERE l_orderkey IN (SELECT o_orderkey FROM orders))"
    "   AS n_overlap),"
    " p2 AS (SELECT 'orders.o_custkey->customer.c_custkey' AS pair,"
    "  (SELECT count(DISTINCT o_custkey) FROM orders) AS n_left,"
    "  (SELECT count(DISTINCT c_custkey) FROM customer) AS n_right,"
    "  (SELECT count(DISTINCT o_custkey) FROM orders"
    "   WHERE o_custkey IN (SELECT c_custkey FROM customer))"
    "   AS n_overlap),"
    " p3 AS (SELECT 'customer.c_custkey->orders.o_custkey' AS pair,"
    "  (SELECT count(DISTINCT c_custkey) FROM customer) AS n_left,"
    "  (SELECT count(DISTINCT o_custkey) FROM orders) AS n_right,"
    "  (SELECT count(DISTINCT c_custkey) FROM customer"
    "   WHERE c_custkey IN (SELECT o_custkey FROM orders))"
    "   AS n_overlap)"
    " SELECT pair, n_left, n_right, n_overlap,"
    "  round(n_overlap * 1.0 / n_left, 6) AS containment"
    " FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2"
    "  UNION ALL SELECT * FROM p3) ORDER BY pair"
)


def q_candidate_keys(sf_dir: str):
    """Candidate-key discovery (profile.candidate_keys): the PK side
    of schema induction — which column sets uniquely identify orders
    rows. o_orderkey is a key; o_custkey is not; a planted
    every-7th-null variant of o_orderkey fails the no-null PRIMARY KEY
    contract even though its non-null tuples are distinct. Twin:
    count(*) / any-null census / DISTINCT-subquery counts per set."""
    from ..stages.profile import candidate_keys

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def plant(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey")
        keep = pa.array(k.to_numpy() % 7 != 0)
        return batch.append_column(
            "o_key_holed",
            pc.if_else(keep, k, pa.scalar(None, k.type)))

    ds = orders.map_batches(plant, batch_format="pyarrow")
    return candidate_keys(
        ds,
        [["o_orderkey"], ["o_custkey"], ["o_custkey", "o_orderdate"],
         ["o_key_holed"]],
        nb=16)


QUERIES["candidate_keys"] = q_candidate_keys

ORACLES["candidate_keys"] = (
    "WITH src AS (SELECT o_orderkey, o_custkey, o_orderdate,"
    "  CASE WHEN o_orderkey % 7 <> 0 THEN o_orderkey END"
    "   AS o_key_holed FROM orders),"
    " s1 AS (SELECT 'o_orderkey' AS cols, count(*) AS n_rows,"
    "  count(*) FILTER (o_orderkey IS NULL) AS n_null_rows,"
    "  (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM src"
    "    WHERE o_orderkey IS NOT NULL)) AS n_distinct FROM src),"
    " s2 AS (SELECT 'o_custkey', count(*),"
    "  count(*) FILTER (o_custkey IS NULL),"
    "  (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM src"
    "    WHERE o_custkey IS NOT NULL)) FROM src),"
    " s3 AS (SELECT 'o_custkey,o_orderdate', count(*),"
    "  count(*) FILTER (o_custkey IS NULL OR o_orderdate IS NULL),"
    "  (SELECT count(*) FROM (SELECT DISTINCT o_custkey, o_orderdate"
    "    FROM src WHERE o_custkey IS NOT NULL"
    "    AND o_orderdate IS NOT NULL)) FROM src),"
    " s4 AS (SELECT 'o_key_holed', count(*),"
    "  count(*) FILTER (o_key_holed IS NULL),"
    "  (SELECT count(*) FROM (SELECT DISTINCT o_key_holed FROM src"
    "    WHERE o_key_holed IS NOT NULL)) FROM src),"
    " uni AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2"
    "  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)"
    " SELECT cols, n_rows, n_null_rows, n_distinct,"
    "  CAST(n_null_rows = 0 AND n_distinct = n_rows AS BIGINT)"
    "   AS is_key"
    " FROM uni ORDER BY cols"
)


def q_column_types(sf_dir: str):
    """Semantic column-type inference (structured.infer_column_types)
    over a long-form typed-cell corpus: clean int/float/date/bool/
    url/email/text columns, a noisy float column (20% 'n/a' still
    dominates at share 0.8), a genuinely mixed column (int share
    ~0.5 < 0.6 → mixed), and an all-empty column. The twin replays
    the identical first-match RE2 CASE chain + census + windowed
    argmax in SQL."""
    from ..stages.structured import infer_column_types

    rows = []
    for i in range(400):
        day = i % 28 + 1
        rows.extend([
            ("id", str(i)),
            ("price", f"{i}.25"),
            ("when", f"2024-01-{day:02d}"),
            ("flag", ["true", "False", "yes", "NO"][i % 4]),
            ("home", f"https://h{i}.test/a"),
            ("mail", f"u{i}@ex{i % 7}.org"),
            ("note", f"free text {i}"),
            ("mix", str(i) if i % 3 == 0 else
             (f"x{i}" if i % 3 == 1 else "")),
            ("dirty_price", "n/a" if i % 5 == 4 else f"{i}.5"),
            ("blank", "" if i % 2 == 0 else None),
        ])
    t = pa.table({
        "col_name": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[1] for r in rows], pa.string()),
    })
    ds = rd.from_arrow(t).repartition(4)
    return infer_column_types(ds, nb=8)


QUERIES["column_types"] = q_column_types

ORACLES["column_types"] = (
    "WITH cells AS ("
    "  SELECT 'id' AS col, CAST(i AS VARCHAR) AS value"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'price', i || '.25' FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'when', '2024-01-' ||"
    "   lpad(CAST(i % 28 + 1 AS VARCHAR), 2, '0')"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'flag',"
    "   ['true','False','yes','NO'][(i % 4) + 1]"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'home', 'https://h' || i || '.test/a'"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'mail', 'u' || i || '@ex' || (i % 7) || '.org'"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'note', 'free text ' || i"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'mix', CASE WHEN i % 3 = 0 THEN"
    "    CAST(i AS VARCHAR) WHEN i % 3 = 1 THEN 'x' || i ELSE '' END"
    "   FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'dirty_price', CASE WHEN i % 5 = 4 THEN 'n/a'"
    "    ELSE i || '.5' END FROM generate_series(0, 399) s(i)"
    "  UNION ALL SELECT 'blank', CASE WHEN i % 2 = 0 THEN '' END"
    "   FROM generate_series(0, 399) s(i)),"
    " classified AS (SELECT col,"
    "  CASE WHEN value IS NULL"
    "    OR regexp_matches(value, '^\\s*$') THEN 'empty'"
    "   WHEN regexp_matches(value, '^[+-]?\\d+$') THEN 'int'"
    "   WHEN regexp_matches(value,"
    "    '^[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?$')"
    "    THEN 'float'"
    "   WHEN regexp_matches(value, '^\\d{4}-\\d{2}-\\d{2}$')"
    "    THEN 'date'"
    "   WHEN regexp_matches(value, '^(?i)(true|false|yes|no)$')"
    "    THEN 'bool'"
    "   WHEN regexp_matches(value, '^https?://\\S+$') THEN 'url'"
    "   WHEN regexp_matches(value,"
    "    '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')"
    "    THEN 'email'"
    "   ELSE 'string' END AS cls FROM cells),"
    " census AS (SELECT col, cls, count(*) AS n FROM classified"
    "  GROUP BY col, cls),"
    " ne AS (SELECT * FROM census WHERE cls <> 'empty'),"
    " tot AS (SELECT col, CAST(sum(n) AS BIGINT) AS n_nonempty FROM ne GROUP BY col),"
    " emp AS (SELECT col, CAST(sum(CASE WHEN cls = 'empty' THEN n"
    "   ELSE 0 END) AS BIGINT) AS n_empty FROM census GROUP BY col),"
    " ranked AS (SELECT col, cls, n, row_number() OVER"
    "  (PARTITION BY col ORDER BY n DESC, cls) AS rk FROM ne)"
    " SELECT e.col,"
    "  CASE WHEN t.n_nonempty IS NULL THEN 'empty'"
    "   WHEN tp.n * 1.0 / t.n_nonempty >= 0.6 THEN tp.cls"
    "   ELSE 'mixed' END AS inferred_type,"
    "  coalesce(t.n_nonempty, 0) AS n_nonempty, e.n_empty,"
    "  round(tp.n * 1.0 / t.n_nonempty, 6) AS share"
    " FROM emp e LEFT JOIN tot t USING (col)"
    " LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) tp USING (col)"
    " ORDER BY e.col"
)


def q_table_to_triples(sf_dir: str):
    """R2RML-lite direct mapping composed with semantic type inference
    (structured.infer_column_types → structured.table_to_triples): a
    wide string table derived from orders (an int column, a date
    column, a synthetic float column, a status string, a dirty int
    column with 20% 'n/a', an all-blank column) is typed by inference,
    then mapped to (subj, pred, obj, obj_kind) triples — dirty values
    degrade to string per row, blanks emit nothing. The twin replays
    the mapping with the kinds inference MUST produce, so a drifting
    inference breaks the hash."""
    from ..stages.structured import infer_column_types, table_to_triples

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderstatus"])

    def widen(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey")
        kn = k.to_numpy(zero_copy_only=False)
        c = pc.cast(b.column("o_custkey"), pa.string())
        return pa.table({
            "pk": k,
            "cust_s": c,
            "date_s": pc.strftime(b.column("o_orderdate"), "%Y-%m-%d"),
            "price_s": pc.binary_join_element_wise(c, ".5", ""),
            "status": b.column("o_orderstatus"),
            "dirty": pc.if_else(
                pa.array(kn % 5 == 0), "n/a", c),
            "blank": pc.if_else(
                pa.array(kn % 2 == 0),
                "", pa.scalar(None, pa.string())),
        })

    wide = orders.map_batches(widen, batch_format="pyarrow")
    vcols = ["cust_s", "date_s", "price_s", "status", "dirty", "blank"]

    def to_cells(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in vcols:
            v = b.column(c)
            names.append(pa.array([c] * len(v), pa.string()))
            vals.append(pc.cast(v, pa.string()))
        return pa.table({"col_name": pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
             else a for a in names]),
            "value": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in vals])})

    types = infer_column_types(
        wide.map_batches(to_cells, batch_format="pyarrow"), nb=8)
    tmap = {r["col"]: r["inferred_type"] for r in types.to_pylist()}
    out = table_to_triples(wide, "pk", vcols, type_map=tmap,
                           pred_prefix="ex:")
    df = out.to_pandas().sort_values(
        ["pred", "subj", "obj"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["table_to_triples"] = q_table_to_triples

ORACLES["table_to_triples"] = (
    "WITH w AS (SELECT o_orderkey AS pk,"
    "  CAST(o_custkey AS VARCHAR) AS cust_s,"
    "  strftime(o_orderdate, '%Y-%m-%d') AS date_s,"
    "  CAST(o_custkey AS VARCHAR) || '.5' AS price_s,"
    "  o_orderstatus AS status,"
    "  CASE WHEN o_orderkey % 5 = 0 THEN 'n/a'"
    "   ELSE CAST(o_custkey AS VARCHAR) END AS dirty"
    "  FROM orders)"
    " SELECT CAST(pk AS VARCHAR) AS subj, 'ex:cust_s' AS pred,"
    "  cust_s AS obj, 'int' AS obj_kind FROM w"
    " UNION ALL SELECT CAST(pk AS VARCHAR), 'ex:date_s', date_s,"
    "  'date' FROM w"
    " UNION ALL SELECT CAST(pk AS VARCHAR), 'ex:price_s', price_s,"
    "  'float' FROM w"
    " UNION ALL SELECT CAST(pk AS VARCHAR), 'ex:status', status,"
    "  'string' FROM w"
    " UNION ALL SELECT CAST(pk AS VARCHAR), 'ex:dirty', dirty,"
    "  CASE WHEN dirty = 'n/a' THEN 'string' ELSE 'int' END FROM w"
    " ORDER BY 2, 1, 3"
)


def q_schema_match(sf_dir: str):
    """One-pass all-pairs schema matching (profile.inclusion_matrix):
    containment of every customer key column in every orders key
    column — 4 pairs from ONE value shuffle. c_custkey→o_custkey is
    the true FK direction but <1.0 here (customers without orders);
    nationkey vs orderkey overlaps only on small ints. Twin: per-pair
    distinct/IN-semijoin subselects."""
    from ..stages.profile import inclusion_matrix

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderkey"])
    return inclusion_matrix(cust, ["c_custkey", "c_nationkey"],
                            orders, ["o_custkey", "o_orderkey"],
                            nb=16)


QUERIES["schema_match"] = q_schema_match


def _sm_block(lc: str, lt: str, rc: str, rt: str) -> str:
    return (
        f"SELECT '{lc}' AS l_col, '{rc}' AS r_col,"
        f" (SELECT count(DISTINCT {lc}) FROM {lt}) AS n_left,"
        f" (SELECT count(DISTINCT {rc}) FROM {rt}) AS n_right,"
        f" (SELECT count(DISTINCT {lc}) FROM {lt}"
        f"  WHERE {lc} IN (SELECT {rc} FROM {rt})) AS n_overlap"
    )


ORACLES["schema_match"] = (
    "SELECT l_col, r_col, n_left, n_right, n_overlap,"
    " round(n_overlap * 1.0 / n_left, 6) AS containment FROM ("
    + _sm_block("c_custkey", "customer", "o_custkey", "orders")
    + " UNION ALL "
    + _sm_block("c_custkey", "customer", "o_orderkey", "orders")
    + " UNION ALL "
    + _sm_block("c_nationkey", "customer", "o_custkey", "orders")
    + " UNION ALL "
    + _sm_block("c_nationkey", "customer", "o_orderkey", "orders")
    + ") ORDER BY l_col, r_col"
)


def q_ref_integrity(sf_dir: str):
    """Per-predicate dangling-edge census (graph.referential_integrity)
    over a three-predicate KG built from orders/customer/nation:
    hasCustomer edges dangle where the customer node was withheld
    (custkey % 3 == 0), inNation edges fully resolve, inRegion edges
    are 100% dangling (no region nodes). Twin: the same triple union
    + NOT EXISTS census in SQL."""
    from ..stages.graph import referential_integrity

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_regionkey"])

    def _t(prefix_s, key_s, pred, prefix_o, key_o):
        def f(b: pa.Table) -> pa.Table:
            s = pc.binary_join_element_wise(
                prefix_s, pc.cast(b.column(key_s), pa.string()), "")
            o = pc.binary_join_element_wise(
                prefix_o, pc.cast(b.column(key_o), pa.string()), "")
            return pa.table({
                "subj": s,
                "pred": pa.array([pred] * len(s), pa.string()),
                "obj": o,
            })
        return f

    t1 = orders.map_batches(_t("o", "o_orderkey", "hasCustomer",
                               "c", "o_custkey"),
                            batch_format="pyarrow")
    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(
            b.column("c_custkey").to_numpy(zero_copy_only=False)
            % 3 != 0))

    kept = cust.map_batches(keep, batch_format="pyarrow") \
        .map_batches(_t("c", "c_custkey", "inNation", "n",
                        "c_nationkey"), batch_format="pyarrow")
    t3 = nation.map_batches(_t("n", "n_nationkey", "inRegion",
                               "r", "n_regionkey"),
                            batch_format="pyarrow")
    return referential_integrity(t1.union(kept).union(t3), nb=16)


QUERIES["ref_integrity"] = q_ref_integrity

ORACLES["ref_integrity"] = (
    "WITH t AS ("
    " SELECT 'o' || o_orderkey AS subj, 'hasCustomer' AS pred,"
    "  'c' || o_custkey AS obj FROM orders"
    " UNION ALL SELECT 'c' || c_custkey, 'inNation',"
    "  'n' || c_nationkey FROM customer WHERE c_custkey % 3 <> 0"
    " UNION ALL SELECT 'n' || n_nationkey, 'inRegion',"
    "  'r' || n_regionkey FROM nation)"
    " SELECT pred, count(*) AS n_edges,"
    "  count(*) FILTER (NOT EXISTS (SELECT 1 FROM t s"
    "   WHERE s.subj = t.obj)) AS n_dangling,"
    "  round(count(*) FILTER (NOT EXISTS (SELECT 1 FROM t s"
    "   WHERE s.subj = t.obj)) * 1.0 / count(*), 6)"
    "   AS dangling_ratio"
    " FROM t GROUP BY pred ORDER BY pred"
)


# ---------------------------------------------------------------------------
# Round-4 thirteenth sitting: statistics / set-sketch / KG-inference wave


def q_contingency_events(sf_dir: str):
    """Chi-square independence + Cramér's V + mutual information
    (sketches.contingency_stats) between event_type and a
    deterministic user bucket (user_id % 5) — the column-dependency
    profiler. Fully oracled (closed-form Σ o²/e − n census twin; zero
    cells never enumerated on either side)."""
    from ..stages.sketches import contingency_stats

    ev = _events(sf_dir, ["user_id", "event_type"])

    def two(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": t.column("event_type"),
            "b": pa.array((u % 5).astype(np.int64))})

    return contingency_stats(
        ev.map_batches(two, batch_format="pyarrow"), "a", "b", nb=4)


QUERIES["contingency_events"] = q_contingency_events

ORACLES["contingency_events"] = (
    "WITH p AS (SELECT event_type AS a,"
    "   CAST(user_id % 5 AS VARCHAR) AS b FROM events"
    "  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),"
    " cen AS (SELECT a, b, count(*) * 1.0 AS o FROM p GROUP BY a, b),"
    " ra AS (SELECT a, sum(o) AS c FROM cen GROUP BY a),"
    " cb AS (SELECT b, sum(o) AS c FROM cen GROUP BY b),"
    " nn AS (SELECT sum(o) AS n FROM cen),"
    " dims AS (SELECT (SELECT count(*) FROM ra) AS r,"
    "   (SELECT count(*) FROM cb) AS c),"
    " s AS (SELECT sum(cen.o * cen.o * nn.n / (ra.c * cb.c)) AS chi2n,"
    "   sum((cen.o / nn.n) * ln(cen.o * nn.n / (ra.c * cb.c))) AS mi"
    "  FROM cen JOIN ra ON cen.a = ra.a JOIN cb ON cen.b = cb.b, nn)"
    " SELECT CAST(nn.n AS BIGINT) AS n, dims.r, dims.c,"
    "  (dims.r - 1) * (dims.c - 1) AS dof,"
    "  round(s.chi2n - nn.n, 6) AS chi2,"
    "  round(sqrt(greatest(s.chi2n - nn.n, 0)"
    "   / (nn.n * least(dims.r - 1, dims.c - 1))), 6) AS cramers_v,"
    "  round(s.mi, 6) AS mi"
    " FROM s, nn, dims"
)


def q_welch_orders(sf_dir: str):
    """Welch's unequal-variance t-test (sketches.welch_ttest) on
    o_totalprice between '1-URGENT' and '5-LOW' orders — the A/B
    readout from per-group sufficient statistics. Fully oracled
    (same ddof=1 / Welch–Satterthwaite arithmetic replayed over SQL
    sums; 4 dp absorbs sum-order float noise)."""
    from ..stages.sketches import welch_ttest

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    return welch_ttest(o, "o_orderpriority", "o_totalprice",
                       "1-URGENT", "5-LOW")


QUERIES["welch_orders"] = q_welch_orders

ORACLES["welch_orders"] = (
    "WITH s AS (SELECT o_orderpriority AS g, count(o_totalprice) AS n,"
    "   sum(o_totalprice) AS sx,"
    "   sum(o_totalprice * o_totalprice) AS sxx"
    "  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    "  GROUP BY o_orderpriority),"
    " a AS (SELECT n, sx / n AS m,"
    "   greatest(sxx - sx * sx / n, 0) / (n - 1) AS v FROM s"
    "  WHERE g = '1-URGENT'),"
    " b AS (SELECT n, sx / n AS m,"
    "   greatest(sxx - sx * sx / n, 0) / (n - 1) AS v FROM s"
    "  WHERE g = '5-LOW')"
    " SELECT a.n AS n_a, b.n AS n_b,"
    "  round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b,"
    "  round(a.v, 4) AS var_a, round(b.v, 4) AS var_b,"
    "  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,"
    "  round(pow(a.v / a.n + b.v / b.n, 2)"
    "   / (pow(a.v / a.n, 2) / (a.n - 1)"
    "      + pow(b.v / b.n, 2) / (b.n - 1)), 4) AS df"
    " FROM a, b"
)


def q_diversity_sources(sf_dir: str):
    """Per-language source diversity (sketches.diversity_per_key):
    Shannon entropy + Simpson concentration of the source mix within
    each lang — the corpus-balance profiler. Fully oracled (census +
    p·ln p twin)."""
    from ..stages.sketches import diversity_per_key

    return diversity_per_key(
        _docs(sf_dir, ["lang", "source"]), "lang", "source", nb=4)


QUERIES["diversity_sources"] = q_diversity_sources

ORACLES["diversity_sources"] = (
    "WITH cen AS (SELECT lang, source, count(*) * 1.0 AS n"
    "  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL"
    "  GROUP BY lang, source),"
    " tot AS (SELECT lang, sum(n) AS t FROM cen GROUP BY lang)"
    " SELECT cen.lang, CAST(sum(cen.n) AS BIGINT) AS n,"
    "  count(*) AS k_distinct,"
    "  round(sum(-(cen.n / tot.t) * ln(cen.n / tot.t)), 6) AS shannon,"
    "  round(sum((cen.n / tot.t) * (cen.n / tot.t)), 6) AS simpson"
    " FROM cen JOIN tot ON cen.lang = tot.lang"
    " GROUP BY cen.lang"
)


def q_kmv_users(sf_dir: str):
    """KMV bottom-k distinct sketches with set operations
    (sketches.kmv_setops): estimated distinct users for 'view' vs
    'purchase' events plus union/intersection estimates, k=64 —
    mergeable cardinality sketches without a distinct shuffle. Fully
    oracled: the md5 bottom-k draw and the (k−1)/h_k estimator are
    replayed exactly in SQL (same md5_u32 convention as train_split)."""
    from ..stages.sketches import kmv_setops

    return kmv_setops(_events(sf_dir, ["event_type", "user_id"]),
                      "event_type", "user_id", "view", "purchase",
                      k=64, nb=4)


QUERIES["kmv_users"] = q_kmv_users

ORACLES["kmv_users"] = (
    "WITH h AS (SELECT DISTINCT event_type AS g,"
    "   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))"
    "    AS UBIGINT) AS h"
    "  FROM events WHERE event_type IN ('view', 'purchase')"
    "   AND user_id IS NOT NULL),"
    " ka AS (SELECT h FROM h WHERE g = 'view' ORDER BY h LIMIT 64),"
    " kb AS (SELECT h FROM h WHERE g = 'purchase'"
    "  ORDER BY h LIMIT 64),"
    " ku AS (SELECT DISTINCT h FROM h ORDER BY h LIMIT 64),"
    " ea AS (SELECT CASE WHEN count(*) < 64 THEN count(*) * 1.0"
    "   ELSE 63.0 / (max(h) / 4294967296.0) END AS e FROM ka),"
    " eb AS (SELECT CASE WHEN count(*) < 64 THEN count(*) * 1.0"
    "   ELSE 63.0 / (max(h) / 4294967296.0) END AS e FROM kb),"
    " eu AS (SELECT CASE WHEN count(*) < 64 THEN count(*) * 1.0"
    "   ELSE 63.0 / (max(h) / 4294967296.0) END AS e FROM ku)"
    " SELECT round(ea.e, 4) AS est_a, round(eb.e, 4) AS est_b,"
    "  round(eu.e, 4) AS est_union,"
    "  round(greatest(ea.e + eb.e - eu.e, 0), 4) AS est_intersect"
    " FROM ea, eb, eu"
)


def q_rolling_median_events(sf_dir: str):
    """Trailing 5-row median per user (windows.rolling_median_per_key)
    over event values — the robust smoother. Fully oracled (DuckDB
    windowed median over ROWS 4 PRECEDING; null-skipping frames and
    even-count interpolation match np.nanmedian)."""
    from ..stages.windows import rolling_median_per_key

    out = rolling_median_per_key(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], window=5, nb=4)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "mov_median": pc.round(t.column("mov_median"), 6)})

    return out.map_batches(fin, batch_format="pyarrow")


QUERIES["rolling_median_events"] = q_rolling_median_events

ORACLES["rolling_median_events"] = (
    "SELECT event_id, user_id,"
    "  round(median(value) OVER (PARTITION BY user_id"
    "   ORDER BY ts, event_id"
    "   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS mov_median"
    " FROM events"
)


def q_acf_events(sf_dir: str):
    """Per-user autocorrelation at lags 1–2 (windows.acf_per_key) of
    event values in time order — the periodicity profiler for crawl
    scheduling. Fully oracled (corr(v, lag(v, ℓ)) window twin per
    lag; 4 dp absorbs sufficient-stat float noise)."""
    from ..stages.windows import acf_per_key

    return acf_per_key(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], max_lag=2, nb=4)


QUERIES["acf_events"] = q_acf_events

ORACLES["acf_events"] = (
    "WITH l AS (SELECT user_id, value,"
    "   lag(value, 1) OVER (PARTITION BY user_id"
    "    ORDER BY ts, event_id) AS l1,"
    "   lag(value, 2) OVER (PARTITION BY user_id"
    "    ORDER BY ts, event_id) AS l2"
    "  FROM events)"
    " SELECT user_id, 1 AS lag,"
    "  count(*) FILTER (value IS NOT NULL AND l1 IS NOT NULL)"
    "   AS n_pairs,"
    "  round(corr(value, l1), 4) AS acf FROM l GROUP BY user_id"
    " UNION ALL"
    " SELECT user_id, 2 AS lag,"
    "  count(*) FILTER (value IS NOT NULL AND l2 IS NOT NULL)"
    "   AS n_pairs,"
    "  round(corr(value, l2), 4) AS acf FROM l GROUP BY user_id"
)


def q_gini_priority(sf_dir: str):
    """Gini concentration of order value per priority class — the
    spend-inequality / domain-concentration profiler, composed from
    rank_per_key (deterministic within-group ranks by (price, key))
    + one sufficient-statistics reduce:

        G = 2·Σ rn·x / (n·Σx) − (n + 1)/n

    Fully oracled (row_number twin with the identical tie order)."""
    from ..stages.windows import rank_per_key

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])
    rn = rank_per_key(o, key_col="o_orderpriority",
                      order_cols=["o_totalprice", "o_orderkey"],
                      ascending=[True, True], out="rn", nb=4)

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        r = t.column("rn").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": t.column("o_orderpriority"),
            "n": pa.array(np.ones(len(x), np.float64)),
            "sx": pa.array(x.astype(np.float64)),
            "srx": pa.array(r.astype(np.float64) * x)})

    st = (rn.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby("g")
          .aggregate(*[Sum(c, alias_name=c)
                       for c in ("n", "sx", "srx")]))

    def fin(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        srx = t.column("srx").to_numpy(zero_copy_only=False)
        g = 2.0 * srx / (n * sx) - (n + 1.0) / n
        return pa.table({
            "o_orderpriority": t.column("g"),
            "n": pa.array(n.astype(np.int64)),
            "gini": pa.array(np.round(g, 6), pa.float64())})

    return st.map_batches(fin, batch_format="pyarrow")


QUERIES["gini_priority"] = q_gini_priority

ORACLES["gini_priority"] = (
    "WITH r AS (SELECT o_orderpriority AS g, o_totalprice AS x,"
    "   row_number() OVER (PARTITION BY o_orderpriority"
    "    ORDER BY o_totalprice, o_orderkey) AS rn FROM orders)"
    " SELECT g AS o_orderpriority, count(*) AS n,"
    "  round(2.0 * sum(rn * x) / (count(*) * sum(x))"
    "   - (count(*) + 1.0) / count(*), 6) AS gini"
    " FROM r GROUP BY g"
)


def q_ifp_sameas(sf_dir: str):
    """Inverse-functional-property sameAs inference — the classic KG
    identity-resolution rule (two subjects sharing the object of an
    inverse-functional predicate are the same entity): over the
    events-as-triples view (subj=user, pred=event_type, obj=props.k),
    'signup' is declared IFP; every subject in a shared (pred, obj)
    group maps to the group's min subject as canonical. Composed
    entirely from existing primitives: distinct census (sum_by_key)
    → per-(p,o) min via groupby_argmax → hash join back → filter.
    Fully oracled (min-over-group window twin)."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.join import shuffle_hash_join

    ev = _events(sf_dir, ["user_id", "event_type", "props"])

    def triples(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        keep = pc.and_(pc.equal(t.column("event_type"), "signup"),
                       pc.is_valid(k))
        out = pa.table({"s": t.column("user_id"), "o": k})
        out = out.filter(pc.fill_null(keep, False))
        return out.append_column(
            "one", pa.array(np.ones(out.num_rows, np.int64)))

    dis = sum_by_key(ev.map_batches(triples, batch_format="pyarrow"),
                     ["s", "o"], "one", nb=4).select_columns(["s", "o"])
    mins = groupby_argmax(dis, ["o"], ["s"], [True], nb=4) \
        .map_batches(lambda t: pa.table({
            "o": t.column("o"), "canon": t.column("s")}),
            batch_format="pyarrow")
    joined = shuffle_hash_join(dis, mins, on=["o"], how="inner", nb=4)

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("s"), t.column("canon")))
        return pa.table({"s": t.column("s"),
                         "canon": t.column("canon"),
                         "o_k": t.column("o")})

    return joined.map_batches(fin, batch_format="pyarrow")


QUERIES["ifp_sameas"] = q_ifp_sameas

ORACLES["ifp_sameas"] = (
    "WITH tr AS (SELECT DISTINCT user_id AS s,"
    "   CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)"
    "    AS o"
    "  FROM events WHERE event_type = 'signup'"
    "   AND regexp_extract(props, '\"k\": (\\d+)', 1) <> ''),"
    " m AS (SELECT o, min(s) AS canon FROM tr GROUP BY o)"
    " SELECT tr.s, m.canon, tr.o AS o_k"
    " FROM tr JOIN m ON tr.o = m.o WHERE tr.s <> m.canon"
)


def q_ks_orders(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov D (sketches.ks_test) on
    o_totalprice between urgent and low-priority orders — the
    distribution-shift detector. Fully oracled (census + window-cumsum
    walk twin; D evaluated at every distinct combined value on both
    sides)."""
    from ..stages.sketches import ks_test

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    return ks_test(o, "o_orderpriority", "o_totalprice",
                   "1-URGENT", "5-LOW")


QUERIES["ks_orders"] = q_ks_orders

ORACLES["ks_orders"] = (
    "WITH p AS (SELECT o_orderpriority AS g, o_totalprice AS v"
    "  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    "   AND o_totalprice IS NOT NULL),"
    " cen AS (SELECT v, count(*) FILTER (g = '1-URGENT') AS na,"
    "   count(*) FILTER (g = '5-LOW') AS nb FROM p GROUP BY v),"
    " tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM cen),"
    " walk AS (SELECT sum(na) OVER (ORDER BY v) * 1.0"
    "    / (SELECT ta FROM tot) AS fa,"
    "   sum(nb) OVER (ORDER BY v) * 1.0"
    "    / (SELECT tb FROM tot) AS fb FROM cen)"
    " SELECT (SELECT CAST(ta AS BIGINT) FROM tot) AS n_a,"
    "  (SELECT CAST(tb AS BIGINT) FROM tot) AS n_b,"
    "  round(max(abs(fa - fb)), 6) AS d_stat FROM walk"
)


def q_jackknife_orders(sf_dir: str):
    """Delete-one-group jackknife SE + 95% CI for the mean order value
    (sketches.jackknife_mean), G=20 md5 groups — the distributed
    uncertainty estimate from ONE census. Fully oracled (same md5
    bucket draw and leave-one-out algebra replayed in SQL)."""
    from ..stages.sketches import jackknife_mean

    o = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    return jackknife_mean(o, "o_orderkey", "o_totalprice",
                          n_groups=20)


QUERIES["jackknife_orders"] = q_jackknife_orders

ORACLES["jackknife_orders"] = (
    "WITH r AS (SELECT CAST(('0x' ||"
    "   substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT)"
    "   % 20 AS g, o_totalprice AS x FROM orders"
    "  WHERE o_totalprice IS NOT NULL),"
    " cen AS (SELECT g, count(*) * 1.0 AS n, sum(x) AS sx FROM r"
    "  GROUP BY g),"
    " tot AS (SELECT sum(n) AS nt, sum(sx) AS sxt,"
    "   count(*) AS ng FROM cen),"
    " loo AS (SELECT (tot.sxt - cen.sx) / (tot.nt - cen.n) AS m"
    "  FROM cen, tot),"
    " jk AS (SELECT sqrt(19.0 / 20.0"
    "   * sum((m - (SELECT avg(m) FROM loo))"
    "     * (m - (SELECT avg(m) FROM loo)))) AS se FROM loo)"
    " SELECT CAST(tot.nt AS BIGINT) AS n,"
    "  round(tot.sxt / tot.nt, 6) AS mean,"
    "  round(jk.se, 6) AS se,"
    "  round(tot.sxt / tot.nt - 1.96 * jk.se, 6) AS ci_lo,"
    "  round(tot.sxt / tot.nt + 1.96 * jk.se, 6) AS ci_hi"
    " FROM tot, jk"
)


def q_kmv_pairwise_users(sf_dir: str):
    """Pairwise user-set overlap matrix across all five event types
    (sketches.kmv_pairwise, k=64): estimated distinct users, union
    and Jaccard per type pair from one bottom-k census pass. Fully
    oracled (md5 bottom-k + (k−1)/h_k estimator replayed per pair in
    SQL; merged bottom-k of a pair is the bottom-k of its union)."""
    from ..stages.sketches import kmv_pairwise

    return kmv_pairwise(_events(sf_dir, ["event_type", "user_id"]),
                        "event_type", "user_id", k=64, nb=4)


QUERIES["kmv_pairwise_users"] = q_kmv_pairwise_users

ORACLES["kmv_pairwise_users"] = (
    "WITH h AS (SELECT DISTINCT event_type AS g,"
    "   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))"
    "    AS UBIGINT) AS h"
    "  FROM events WHERE event_type IS NOT NULL"
    "   AND user_id IS NOT NULL),"
    " rk AS (SELECT g, h, row_number() OVER (PARTITION BY g"
    "   ORDER BY h) AS rn FROM h),"
    " bk AS (SELECT g, h FROM rk WHERE rn <= 64),"
    " est AS (SELECT g, CASE WHEN count(*) < 64 THEN count(*) * 1.0"
    "   ELSE 63.0 / (max(h) / 4294967296.0) END AS e FROM bk"
    "  GROUP BY g),"
    " pairs AS (SELECT a.g AS ga, a.e AS ea, b.g AS gb, b.e AS eb"
    "  FROM est a JOIN est b ON a.g < b.g),"
    " pu AS (SELECT p.ga, p.gb, bk.h FROM pairs p JOIN bk"
    "   ON bk.g = p.ga OR bk.g = p.gb"
    "  GROUP BY p.ga, p.gb, bk.h),"
    " pur AS (SELECT ga, gb, h, row_number() OVER"
    "   (PARTITION BY ga, gb ORDER BY h) AS rn FROM pu),"
    " uest AS (SELECT ga, gb, CASE WHEN count(*) < 64"
    "   THEN count(*) * 1.0"
    "   ELSE 63.0 / (max(h) / 4294967296.0) END AS eu"
    "  FROM pur WHERE rn <= 64 GROUP BY ga, gb)"
    " SELECT p.ga AS g_a, p.gb AS g_b, round(p.ea, 4) AS est_a,"
    "  round(p.eb, 4) AS est_b, round(u.eu, 4) AS est_union,"
    "  round(greatest(p.ea + p.eb - u.eu, 0) / u.eu, 4)"
    "   AS est_jaccard"
    " FROM pairs p JOIN uest u ON p.ga = u.ga AND p.gb = u.gb"
)


def q_cusum_events(sf_dir: str):
    """One-sided CUSUM drift detector per user
    (windows.cusum_per_key): reflected random walk of (value − 50)
    with a 500-threshold alarm flag — the burst/abuse monitor. Fully
    oracled via the reflection identity S = C − least(min(C) OVER, 0)
    (window cumsum + running-min twin)."""
    from ..stages.windows import cusum_per_key

    out = cusum_per_key(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], target=50.0,
        threshold=500.0, nb=4)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "cusum": pc.round(t.column("cusum"), 2),
            "alarm": t.column("alarm")})

    return out.map_batches(fin, batch_format="pyarrow")


QUERIES["cusum_events"] = q_cusum_events

ORACLES["cusum_events"] = (
    "WITH c AS (SELECT event_id, user_id,"
    "   sum(CASE WHEN value IS NULL THEN 0 ELSE value - 50.0 END)"
    "    OVER (PARTITION BY user_id ORDER BY ts, event_id"
    "     ROWS UNBOUNDED PRECEDING) AS cum FROM events),"
    " m AS (SELECT event_id, user_id, cum,"
    "   min(cum) OVER (PARTITION BY user_id ORDER BY event_id"
    "    ROWS UNBOUNDED PRECEDING) AS rm FROM"
    "   (SELECT * FROM c ORDER BY user_id, event_id))"
    " SELECT event_id, user_id,"
    "  round(cum - least(rm, 0), 2) AS cusum,"
    "  (cum - least(rm, 0)) > 500.0 AS alarm FROM m"
)


def q_jsd_sources(sf_dir: str):
    """Jensen–Shannon divergence (textstats.js_divergence) between
    the unigram distributions of src0 and src1 documents — the
    corpus-drift measure. Fully oracled (same whitespace
    tokenization; zero-count terms contribute only their side's
    half on both sides)."""
    from ..stages.textstats import js_divergence

    return js_divergence(_docs(sf_dir, ["source", "text"]),
                         "text", "source", "src0", "src1", nb=4)


QUERIES["jsd_sources"] = q_jsd_sources

ORACLES["jsd_sources"] = (
    "WITH t AS (SELECT source AS g,"
    "   unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok"
    "  FROM documents WHERE source IN ('src0', 'src1')"
    "   AND text IS NOT NULL),"
    " cen AS (SELECT g, tok, count(*) * 1.0 AS n FROM t"
    "  GROUP BY g, tok),"
    " tot AS (SELECT sum(n) FILTER (g = 'src0') AS ta,"
    "   sum(n) FILTER (g = 'src1') AS tb FROM cen),"
    " pv AS (SELECT tok, coalesce(sum(n) FILTER (g = 'src0'), 0)"
    "    AS ca, coalesce(sum(n) FILTER (g = 'src1'), 0) AS cb"
    "  FROM cen GROUP BY tok),"
    " c AS (SELECT ca / tot.ta AS p, cb / tot.tb AS q"
    "  FROM pv, tot)"
    " SELECT (SELECT CAST(ta AS BIGINT) FROM tot) AS n_tok_a,"
    "  (SELECT CAST(tb AS BIGINT) FROM tot) AS n_tok_b,"
    "  round(sum("
    "   CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2))"
    "    ELSE 0 END"
    "   + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2))"
    "    ELSE 0 END), 6) AS jsd FROM c"
)


def q_snm_blocking(sf_dir: str):
    """Sorted-neighborhood ER blocking — the third classic blocking
    family (after hash/phonetic blocks): parts sorted globally by
    (p_retailprice, p_partkey) via global_row_number (histogram range
    ranks, no single-node sort), then every pair within a window of
    2 sort neighbors becomes a candidate, met exactly once through
    the banded rank join (band_join on the rank with eps=2). Fully
    oracled (row_number twin + rank-difference self-join)."""
    from ..stages.join import band_join
    from ..stages.windows import global_row_number

    p = rd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_retailprice"])
    rn = global_row_number(p, ["p_retailprice", "p_partkey"],
                           out="rn", n_parts=8)
    left = rn.map_batches(
        lambda t: pa.table({
            "c": pa.array(np.zeros(t.num_rows, np.int8)),
            "a_key": t.column("p_partkey"),
            "rn": pc.cast(t.column("rn"), pa.float64())}),
        batch_format="pyarrow")
    right = rn.map_batches(
        lambda t: pa.table({
            "c": pa.array(np.zeros(t.num_rows, np.int8)),
            "b_key": t.column("p_partkey"),
            "rn": pc.cast(t.column("rn"), pa.float64())}),
        batch_format="pyarrow")
    pairs = band_join(left, right, on="c", lval="rn", eps=2.0, nb=8)

    def fin(t: pa.Table) -> pa.Table:
        a = t.column("rn").to_numpy(zero_copy_only=False)
        b = t.column("rn_r").to_numpy(zero_copy_only=False)
        keep = a < b
        t = t.filter(pa.array(keep))
        gap = (t.column("rn_r").to_numpy(zero_copy_only=False)
               - t.column("rn").to_numpy(zero_copy_only=False))
        return pa.table({
            "a_key": t.column("a_key"),
            "b_key": t.column("b_key"),
            "rn_gap": pa.array(gap.astype(np.int64))})

    return pairs.map_batches(fin, batch_format="pyarrow")


QUERIES["snm_blocking"] = q_snm_blocking

ORACLES["snm_blocking"] = (
    "WITH r AS (SELECT p_partkey, row_number() OVER"
    "   (ORDER BY p_retailprice, p_partkey) AS rn FROM part)"
    " SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,"
    "  b.rn - a.rn AS rn_gap"
    " FROM r a JOIN r b ON b.rn - a.rn IN (1, 2)"
)


def q_neighbor_agg_graph(sf_dir: str):
    """2-hop GraphSAGE-style neighbor feature propagation
    (graph.neighbor_agg) over the orders-derived key graph (src =
    key//10), seeded with x = o_totalprice aggregated... here the
    node feature is node_id % 100 so the twin is closed-form: per
    node, x_h1 = mean of in-neighbors' features, x_h2 = mean of
    in-neighbors' x_h1. Fully oracled (2 unrolled join+AVG CTEs)."""
    from ..stages.graph import neighbor_agg

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(k[k >= 10], pa.int64()),
                         "dst": pa.array(k[k >= 10] // 10, pa.int64())})

    def feats(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(k, pa.int64()),
            "x": pa.array((k % 100).astype(np.float64))})

    out = neighbor_agg(
        orders.map_batches(edges, batch_format="pyarrow"),
        orders.map_batches(feats, batch_format="pyarrow"),
        k=2, nb=8)

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "x_h1": pc.round(t.column("x_h1"), 6),
            "x_h2": pc.round(t.column("x_h2"), 6)})

    return out.map_batches(fin, batch_format="pyarrow")


QUERIES["neighbor_agg_graph"] = q_neighbor_agg_graph

ORACLES["neighbor_agg_graph"] = (
    "WITH e AS (SELECT o_orderkey AS src, o_orderkey // 10 AS dst"
    "  FROM orders WHERE o_orderkey >= 10),"
    " f0 AS (SELECT o_orderkey AS node,"
    "   CAST(o_orderkey % 100 AS DOUBLE) AS x FROM orders),"
    " h1 AS (SELECT e.dst AS node, avg(f0.x) AS x"
    "  FROM e JOIN f0 ON e.src = f0.node GROUP BY e.dst),"
    " h2 AS (SELECT e.dst AS node, avg(h1.x) AS x"
    "  FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst)"
    " SELECT coalesce(h1.node, h2.node) AS node,"
    "  round(h1.x, 6) AS x_h1, round(h2.x, 6) AS x_h2"
    " FROM h1 FULL OUTER JOIN h2 ON h1.node = h2.node"
)


def q_edge_cut_events(sf_dir: str):
    """Hash-partitioning edge-cut census (graph.edge_cut_report): the
    fraction of orders-graph edges whose endpoints hash to different
    md5 partitions of 8 — the shuffle-volume price any per-partition
    graph operator pays. Fully oracled (same md5 partition draw in
    SQL)."""
    from ..stages.graph import edge_cut_report

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(k[k >= 10], pa.int64()),
                         "dst": pa.array(k[k >= 10] // 10, pa.int64())})

    return edge_cut_report(
        orders.map_batches(edges, batch_format="pyarrow"), n_parts=8)


QUERIES["edge_cut_events"] = q_edge_cut_events

ORACLES["edge_cut_events"] = (
    "WITH e AS (SELECT o_orderkey AS src, o_orderkey // 10 AS dst"
    "  FROM orders WHERE o_orderkey >= 10),"
    " p AS (SELECT CAST(('0x' ||"
    "    substr(md5(CAST(src AS VARCHAR)), 1, 8)) AS UBIGINT) % 8"
    "    AS ps,"
    "   CAST(('0x' || substr(md5(CAST(dst AS VARCHAR)), 1, 8))"
    "    AS UBIGINT) % 8 AS pd FROM e)"
    " SELECT count(*) AS n_edges,"
    "  count(*) FILTER (ps <> pd) AS n_cut,"
    "  round(count(*) FILTER (ps <> pd) * 1.0 / count(*), 6)"
    "   AS cut_ratio FROM p"
)


def q_fd_check_docs(sf_dir: str):
    """Approximate functional-dependency check source → lang
    (profile.fd_violations): the g3-style confidence (rows kept if
    every source were forced to its majority language) — the schema
    QA probe. Fully oracled (census + per-det max twin)."""
    from ..stages.profile import fd_violations

    return fd_violations(_docs(sf_dir, ["source", "lang"]),
                         "source", "lang", nb=4)


QUERIES["fd_check_docs"] = q_fd_check_docs

ORACLES["fd_check_docs"] = (
    "WITH cen AS (SELECT source AS det, lang AS dep,"
    "   count(*) AS n FROM documents GROUP BY source, lang),"
    " mx AS (SELECT det, max(n) AS m FROM cen GROUP BY det),"
    " tot AS (SELECT sum(n) AS n FROM cen),"
    " k AS (SELECT sum(m) AS kept FROM mx)"
    " SELECT CAST(tot.n AS BIGINT) AS n,"
    "  (SELECT count(*) FROM mx) AS n_det,"
    "  CAST(tot.n - k.kept AS BIGINT) AS violations,"
    "  round(k.kept * 1.0 / tot.n, 6) AS confidence"
    " FROM tot, k"
)


def q_s_stem_terms(sf_dir: str):
    """Top-20 S-stemmed terms (functions.normalize.s_stem_array over
    the whitespace token census): Harman's conservative plural
    stripper, vectorized Arrow kernels, replayed in SQL as nested
    CASE arms. Deterministic order (count desc, stem asc)."""
    from ..functions.normalize import s_stem_array
    from ..stages.canonicalize import sum_by_key

    def toks(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column("text")), r"\s+")
        flat = pc.list_flatten(lists)
        out = pa.table({"stem": s_stem_array(flat)})
        return out.append_column(
            "n", pa.array(np.ones(out.num_rows, np.int64)))

    cen = sum_by_key(
        _docs(sf_dir, ["text"]).map_batches(
            toks, batch_format="pyarrow"), "stem", "n", nb=4)
    df = cen.to_pandas().sort_values(
        ["n", "stem"], ascending=[False, True], kind="mergesort")
    return pa.Table.from_pandas(df.head(20), preserve_index=False)


QUERIES["s_stem_terms"] = q_s_stem_terms

ORACLES["s_stem_terms"] = (
    "WITH t AS (SELECT lower(unnest(regexp_split_to_array("
    "   trim(text), '\\s+'))) AS tok FROM documents),"
    " s AS (SELECT CASE"
    "   WHEN tok LIKE '%ies' THEN CASE"
    "    WHEN tok LIKE '%eies' OR tok LIKE '%aies' THEN tok"
    "    ELSE substr(tok, 1, length(tok) - 3) || 'y' END"
    "   WHEN tok LIKE '%es' THEN CASE"
    "    WHEN tok LIKE '%aes' OR tok LIKE '%ees' OR tok LIKE '%oes'"
    "     THEN tok ELSE substr(tok, 1, length(tok) - 1) END"
    "   WHEN tok LIKE '%s' THEN CASE"
    "    WHEN tok LIKE '%us' OR tok LIKE '%ss' THEN tok"
    "    ELSE substr(tok, 1, length(tok) - 1) END"
    "   ELSE tok END AS stem FROM t)"
    " SELECT stem, count(*) AS n FROM s GROUP BY stem"
    " ORDER BY n DESC, stem LIMIT 20"
)


def q_mmr_embeddings(sf_dir: str):
    """Maximal Marginal Relevance diverse top-10
    (similarity.mmr_select): distributed exact top-64 cosine
    prefilter against a fixed unit query, then the deterministic
    greedy relevance-vs-redundancy loop on the ≤64-row pool.
    Rows-only by nature (the greedy argmax chain is not reasonably
    SQL-expressible); determinism is pinned by the rows-only
    double-run net and unit tests."""
    from ..stages.similarity import mmr_select

    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    first = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"]).column(
        "embedding")[0].as_py()
    dim = len(first)
    q = np.zeros(dim, np.float32)
    q[0] = 1.0
    return mmr_select(embs, q, k=10, lam=0.7, pool=64)


QUERIES["mmr_embeddings"] = q_mmr_embeddings


def q_mann_kendall_events(sf_dir: str):
    """Mann–Kendall monotonic-trend test per user
    (windows.mann_kendall_per_key) over event values in time order —
    the nonparametric drift detector complementing the OLS
    trend_per_type. Fully oracled (pairwise sign self-join twin +
    tie-census variance + continuity-corrected z)."""
    from ..stages.windows import mann_kendall_per_key

    return mann_kendall_per_key(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], nb=4)


QUERIES["mann_kendall_events"] = q_mann_kendall_events

ORACLES["mann_kendall_events"] = (
    "WITH r AS (SELECT user_id, value,"
    "   row_number() OVER (PARTITION BY user_id"
    "    ORDER BY ts, event_id) AS rn FROM events"
    "  WHERE value IS NOT NULL),"
    " s AS (SELECT a.user_id,"
    "   sum(sign(b.value - a.value)) AS s FROM r a"
    "  JOIN r b ON a.user_id = b.user_id AND a.rn < b.rn"
    "  GROUP BY a.user_id),"
    " nn AS (SELECT user_id, count(*) * 1.0 AS n FROM r"
    "  GROUP BY user_id),"
    " ties AS (SELECT user_id,"
    "   coalesce(sum(CASE WHEN c > 1"
    "    THEN c * (c - 1) * (2 * c + 5) ELSE 0 END), 0) AS tv"
    "  FROM (SELECT user_id, value, count(*) * 1.0 AS c FROM r"
    "   GROUP BY user_id, value) GROUP BY user_id),"
    " v AS (SELECT nn.user_id, nn.n,"
    "   coalesce(s.s, 0) AS s,"
    "   (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tv) / 18.0 AS var"
    "  FROM nn LEFT JOIN s ON nn.user_id = s.user_id"
    "  JOIN ties ON nn.user_id = ties.user_id)"
    " SELECT user_id, CAST(n AS BIGINT) AS n,"
    "  CAST(s AS BIGINT) AS s_stat, round(var, 6) AS var_s,"
    "  CASE WHEN var > 0 THEN round((s - sign(s)) / sqrt(var), 4)"
    "   ELSE NULL END AS z FROM v"
)


def q_phrase_search_docs(sf_dir: str):
    """Exact positional phrase search (textindex.phrase_search) for
    the repeated-word phrase 'batch batch': per matching doc, the
    number of adjacent in-order occurrences (overlaps count). One
    composite census shuffle — no k−1 join chain; the full
    vocabulary never enters the pipeline. Fully oracled (zipped
    unnest + slot-anchor HAVING twin)."""
    from ..stages.textindex import phrase_search

    out = phrase_search(_docs(sf_dir, ["doc_id", "text"]),
                        "batch batch", nb=4)
    return out


QUERIES["phrase_search_docs"] = q_phrase_search_docs

ORACLES["phrase_search_docs"] = (
    "WITH toks AS (SELECT doc_id,"
    "   unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))"
    "    AS tok,"
    "   unnest(range(0, len(regexp_split_to_array(trim(lower(text)),"
    "    '\\s+')))) AS pos FROM documents),"
    " slots AS (SELECT * FROM (VALUES ('batch', 0), ('batch', 1))"
    "  s(w, off)),"
    " fire AS (SELECT DISTINCT t.doc_id, t.pos - s.off AS anchor,"
    "   s.off AS slot FROM toks t JOIN slots s ON t.tok = s.w"
    "  WHERE t.pos - s.off >= 0),"
    " m AS (SELECT doc_id, anchor FROM fire"
    "  GROUP BY doc_id, anchor HAVING count(*) = 2)"
    " SELECT doc_id, count(*) AS n_matches FROM m GROUP BY doc_id"
)


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled source mixing (α = 0.5) — the multilingual
    /multi-domain rebalancing recipe (upweight small sources,
    downweight heads, e.g. mBERT/XLM-R style n^α sampling): a
    source-size census sets mixture weights ∝ n_s^0.5, then
    canonicalize.mixture_sample hits the 200-doc target with the
    md5-smallest replayable draw. Fully oracled (census + pow
    weights + floor quotas + md5 row_number twin)."""
    from ..stages.canonicalize import mixture_sample, sum_by_key

    docs = _docs(sf_dir, ["doc_id", "source"])

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "n": pa.array(np.ones(t.num_rows, np.int64))})

    cen = {r["source"]: r["n"] for r in sum_by_key(
        docs.map_batches(one, batch_format="pyarrow"),
        "source", "n", nb=4).take_all()}
    tot = sum(v ** 0.5 for v in cen.values())
    weights = {s: (v ** 0.5) / tot for s, v in cen.items()}
    out = mixture_sample(docs, "source", weights, total_n=200,
                         id_col="doc_id", seed=0, nb=4)
    return out


QUERIES["temperature_mix"] = q_temperature_mix

ORACLES["temperature_mix"] = (
    "WITH cen AS (SELECT source, count(*) AS n FROM documents"
    "  GROUP BY source),"
    " w AS (SELECT source,"
    "   sqrt(n) / (SELECT sum(sqrt(n)) FROM cen) AS w FROM cen),"
    " q AS (SELECT source, CAST(floor(200 * w) AS BIGINT) AS quota"
    "  FROM w),"
    " r AS (SELECT d.doc_id, d.source, row_number() OVER"
    "   (PARTITION BY d.source ORDER BY"
    "    md5(CAST(d.doc_id AS VARCHAR) || ':0'), d.doc_id) AS rn"
    "  FROM documents d)"
    " SELECT r.doc_id, r.source FROM r JOIN q"
    "  ON r.source = q.source WHERE r.rn <= q.quota"
)


def q_join_cardinality(sf_dir: str):
    """EXACT inner-join cardinality WITHOUT running the join
    (join.join_cardinality_estimate): the planner probe behind "can
    we afford click x purchase on user_id / which keys explode it" —
    joins the two per-key COUNT censuses instead of the data and
    reports Sum n_l*n_r plus the heaviest (salting-candidate) keys.
    Fully oracled (census-join + row_number top-5 twin)."""
    from ..stages.join import join_cardinality_estimate

    ev = _events(sf_dir, ["user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'")
    buys = ev.filter(expr="event_type == 'purchase'")
    return join_cardinality_estimate(clicks, buys, "user_id", nb=4)


QUERIES["join_cardinality"] = q_join_cardinality

ORACLES["join_cardinality"] = (
    "WITH l AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS nl"
    "  FROM events WHERE event_type = 'click'"
    "   AND user_id IS NOT NULL GROUP BY 1),"
    " r AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS nr"
    "  FROM events WHERE event_type = 'purchase'"
    "   AND user_id IS NOT NULL GROUP BY 1),"
    " j AS (SELECT l.k, nl * nr AS rows_ FROM l JOIN r USING (k)),"
    " t AS (SELECT k, rows_, row_number() OVER"
    "   (ORDER BY rows_ DESC, k) AS rn FROM j)"
    " SELECT coalesce((SELECT CAST(sum(rows_) AS BIGINT) FROM j), 0)"
    "   AS est_rows,"
    "  (SELECT count(*) FROM j) AS n_common_keys,"
    "  coalesce((SELECT CAST(max(rows_) AS BIGINT) FROM j), 0)"
    "   AS max_key_rows,"
    "  coalesce((SELECT string_agg(k || ':' || rows_, '|'"
    "    ORDER BY rn) FROM t WHERE rn <= 5), '') AS top_keys"
)


def q_expectations_orders(sf_dir: str):
    """Declarative data-quality gate over orders
    (profile.expectations_report): dbt-style expectations — not_null,
    unique (nulls exempt), accepted_values, in_range — validated in
    ONE stateless counting pass plus one census shuffle per
    unique-rule column; one report row per rule, order preserved.
    Fully oracled (UNION ALL of per-rule count twins)."""
    from ..stages.profile import expectations_report

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_totalprice"])
    return expectations_report(orders, [
        {"rule": "not_null", "col": "o_custkey"},
        {"rule": "unique", "col": "o_orderkey"},
        {"rule": "accepted_values", "col": "o_orderstatus",
         "values": ["O", "F", "P"]},
        {"rule": "in_range", "col": "o_totalprice",
         "lo": 0.0, "hi": 600000.0},
    ], nb=4)


QUERIES["expectations_orders"] = q_expectations_orders

ORACLES["expectations_orders"] = (
    "WITH u AS (SELECT o_orderkey AS v, count(*) AS n FROM orders"
    "  WHERE o_orderkey IS NOT NULL GROUP BY 1)"
    " SELECT 'not_null' AS rule, 'o_custkey' AS col,"
    "  count(*) AS n_checked,"
    "  count(*) FILTER (o_custkey IS NULL) AS violations,"
    "  count(*) FILTER (o_custkey IS NULL) = 0 AS ok FROM orders"
    " UNION ALL"
    " SELECT 'unique', 'o_orderkey',"
    "  coalesce(CAST(sum(n) AS BIGINT), 0),"
    "  coalesce(CAST(sum(n) FILTER (n > 1) AS BIGINT), 0),"
    "  coalesce(CAST(sum(n) FILTER (n > 1) AS BIGINT), 0) = 0 FROM u"
    " UNION ALL"
    " SELECT 'accepted_values', 'o_orderstatus',"
    "  count(o_orderstatus),"
    "  count(*) FILTER (o_orderstatus IS NOT NULL"
    "   AND o_orderstatus NOT IN ('O', 'F', 'P')),"
    "  count(*) FILTER (o_orderstatus IS NOT NULL"
    "   AND o_orderstatus NOT IN ('O', 'F', 'P')) = 0 FROM orders"
    " UNION ALL"
    " SELECT 'in_range', 'o_totalprice', count(o_totalprice),"
    "  count(*) FILTER (o_totalprice < 0.0"
    "   OR o_totalprice > 600000.0),"
    "  count(*) FILTER (o_totalprice < 0.0"
    "   OR o_totalprice > 600000.0) = 0 FROM orders"
)


def q_sample_neighbors(sf_dir: str):
    """Deterministic GraphSAGE-style neighbor sampling
    (graph.sample_neighbors): cap every node of the orders-derived
    graph at its 3 smallest-md5-draw out-edges — replayable by
    construction, so the SQL twin re-draws the identical sample
    (row_number over the same md5 expression)."""
    from ..stages.graph import sample_neighbors

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k % 97, pa.int64())})

    out = sample_neighbors(
        orders.map_batches(edges, batch_format="pyarrow"),
        k=3, seed=7, nb=4)
    return out


QUERIES["sample_neighbors"] = q_sample_neighbors

ORACLES["sample_neighbors"] = (
    "WITH e AS (SELECT DISTINCT o_orderkey // 10 AS src,"
    "   o_orderkey % 97 AS dst FROM orders WHERE o_orderkey >= 10),"
    " r AS (SELECT src, dst, row_number() OVER (PARTITION BY src"
    "   ORDER BY CAST(('0x' || substr(md5(CAST(src AS VARCHAR) ||"
    "    ':' || CAST(dst AS VARCHAR) || ':7'), 1, 8)) AS UBIGINT),"
    "   dst) AS rn FROM e)"
    " SELECT src, dst FROM r WHERE rn <= 3"
)


def q_c4_lines(sf_dir: str):
    """C4-style line filtering (textstats.c4_line_filter) over
    documents line-ified deterministically (' data ' -> '.\\n', so
    most lines end terminal and the trailing fragment does not):
    keep lines with >= 3 words ending in terminal punctuation, drop
    line-less docs. ONE stateless map_batches — no shuffle. Fully
    oracled (unnest + regexp + ordered string_agg twin)."""
    from ..stages.textstats import c4_line_filter

    def lineify(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text": pc.replace_substring(
                pc.fill_null(t.column("text"), ""), " data ",
                ".\n")})

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lineify, batch_format="pyarrow")
    return c4_line_filter(docs, min_words=3, min_lines=1)


QUERIES["c4_lines"] = q_c4_lines

ORACLES["c4_lines"] = (
    "WITH d AS (SELECT doc_id, replace(coalesce(text, ''), ' data ',"
    "   '.' || chr(10)) AS text FROM documents),"
    " l AS (SELECT doc_id, unnest(string_split(text, chr(10)))"
    "    AS line,"
    "   unnest(range(1, len(string_split(text, chr(10))) + 1))"
    "    AS ord FROM d),"
    " f AS (SELECT doc_id, line, ord,"
    "   (len(regexp_extract_all(trim(line), '\\S+')) >= 3"
    "    AND regexp_matches(trim(line), '[.!?\"]$')) AS keep FROM l)"
    " SELECT doc_id,"
    "  string_agg(line, chr(10) ORDER BY ord) FILTER (keep) AS text,"
    "  CAST(count(*) AS BIGINT) AS n_lines,"
    "  CAST(count(*) FILTER (keep) AS BIGINT) AS n_kept"
    " FROM f GROUP BY doc_id HAVING count(*) FILTER (keep) >= 1"
)


def q_allen_relations(sf_dir: str):
    """Allen interval-algebra join (join.allen_join) over
    orders-derived validity intervals: classify every same-key
    even-vs-odd interval pair into the 13 temporal relations, with
    disjoint pairs kept only within gap 1. Fully oracled (equi-join
    + identical CASE chain twin)."""
    from ..stages.join import allen_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def iv(parity: int):
        def f(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            c = t.column("o_custkey").to_numpy(zero_copy_only=False)
            sel = (k % 2) == parity
            k, c = k[sel], c[sel]
            lo = (k % 30).astype(np.float64)
            return pa.table({
                "k": pa.array(c % 1000, pa.int64()),
                "id": pa.array(k.astype(str)),
                "lo": pa.array(lo),
                "hi": pa.array(lo + (c % 5))})

        return f

    left = orders.map_batches(iv(0), batch_format="pyarrow")
    right = orders.map_batches(iv(1), batch_format="pyarrow")
    return allen_join(left, right, "k", "id", "id", max_gap=1, nb=8)


QUERIES["allen_relations"] = q_allen_relations

ORACLES["allen_relations"] = (
    "WITH o AS (SELECT o_orderkey AS id, o_custkey % 1000 AS k,"
    "   CAST(o_orderkey % 30 AS DOUBLE) AS lo,"
    "   CAST(o_orderkey % 30 + o_custkey % 5 AS DOUBLE) AS hi,"
    "   o_orderkey % 2 AS par FROM orders),"
    " l AS (SELECT * FROM o WHERE par = 0),"
    " r AS (SELECT * FROM o WHERE par = 1)"
    " SELECT CAST(l.k AS VARCHAR) AS k,"
    "  CAST(l.id AS VARCHAR) AS l_id, CAST(r.id AS VARCHAR) AS r_id,"
    "  l.lo AS l_lo, l.hi AS l_hi, r.lo AS r_lo, r.hi AS r_hi,"
    "  CASE WHEN l.lo = r.lo AND l.hi = r.hi THEN 'equals'"
    "   WHEN l.lo = r.lo AND l.hi < r.hi THEN 'starts'"
    "   WHEN l.lo = r.lo THEN 'started_by'"
    "   WHEN l.hi = r.hi AND l.lo > r.lo THEN 'finishes'"
    "   WHEN l.hi = r.hi THEN 'finished_by'"
    "   WHEN l.hi = r.lo THEN 'meets'"
    "   WHEN r.hi = l.lo THEN 'met_by'"
    "   WHEN l.lo < r.lo AND r.lo < l.hi AND l.hi < r.hi"
    "    THEN 'overlaps'"
    "   WHEN r.lo < l.lo AND l.lo < r.hi AND r.hi < l.hi"
    "    THEN 'overlapped_by'"
    "   WHEN l.lo > r.lo AND l.hi < r.hi THEN 'during'"
    "   WHEN l.lo < r.lo AND l.hi > r.hi THEN 'contains'"
    "   WHEN l.hi < r.lo THEN 'before' ELSE 'after' END AS relation"
    " FROM l JOIN r ON l.k = r.k"
    " WHERE NOT (l.hi < r.lo AND r.lo - l.hi > 1)"
    "  AND NOT (r.hi < l.lo AND l.lo - r.hi > 1)"
)


def q_fs_em_params(sf_dir: str):
    """Unsupervised Fellegi-Sunter EM training
    (similarity.fs_em_train): learn per-field m/u agreement rates and
    the match prior from the o_custkey-blocked even-vs-odd order
    pairs, comparing (o_orderpriority, o_orderstatus) — 3 EM
    iterations. Fully oracled: the SQL twin rebuilds the
    agreement-pattern census and unrolls the identical EM updates."""
    from ..stages.similarity import fs_em_train

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderpriority",
                 "o_orderstatus"])
    def par(p: int):
        def f(t: pa.Table) -> pa.Table:
            keys = t.column("o_orderkey")
            return t.filter(pc.equal(
                pc.bit_wise_and(keys, 1), p))

        return f

    left = orders.map_batches(par(0), batch_format="pyarrow")
    right = orders.map_batches(par(1), batch_format="pyarrow")
    t = fs_em_train(left, right, ["o_custkey"],
                    [("o_orderpriority", "o_orderpriority"),
                     ("o_orderstatus", "o_orderstatus")],
                    iters=3, nb=8)
    return pa.table({
        "field": t.column("field"),
        "m": pc.round(t.column("m"), 6),
        "u": pc.round(t.column("u"), 6),
        "w_agree": pc.round(t.column("w_agree"), 6),
        "w_disagree": pc.round(t.column("w_disagree"), 6),
        "p": pc.round(t.column("p"), 6)})


QUERIES["fs_em_params"] = q_fs_em_params


def _fs_em_oracle() -> str:
    init = "SELECT 0.9 AS m0, 0.9 AS m1, 0.1 AS u0, 0.1 AS u1, 0.1 AS p"
    ctes = [
        ("cen", "SELECT "
         " CASE WHEN l.o_orderpriority = r.o_orderpriority THEN 1"
         "  ELSE 0 END AS b0,"
         " CASE WHEN l.o_orderstatus = r.o_orderstatus THEN 1"
         "  ELSE 0 END AS b1, count(*) AS n"
         " FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0) l"
         " JOIN (SELECT * FROM orders WHERE o_orderkey % 2 = 1) r"
         "  ON l.o_custkey = r.o_custkey GROUP BY 1, 2"),
        ("it0", init),
    ]
    for k in range(3):
        ctes.append((f"e{k}",
            f"SELECT cen.n, cen.b0, cen.b1,"
            f" (p * pow(m0, b0) * pow(1 - m0, 1 - b0)"
            f"    * pow(m1, b1) * pow(1 - m1, 1 - b1)) /"
            f" ((p * pow(m0, b0) * pow(1 - m0, 1 - b0)"
            f"    * pow(m1, b1) * pow(1 - m1, 1 - b1))"
            f"  + ((1 - p) * pow(u0, b0) * pow(1 - u0, 1 - b0)"
            f"    * pow(u1, b1) * pow(1 - u1, 1 - b1))) AS r"
            f" FROM cen, it{k}"))
        ctes.append((f"it{k + 1}",
            f"SELECT sum(r * n) / sum(n) AS p,"
            f" sum(r * n * b0) / sum(r * n) AS m0,"
            f" sum(r * n * b1) / sum(r * n) AS m1,"
            f" sum((1 - r) * n * b0) / sum((1 - r) * n) AS u0,"
            f" sum((1 - r) * n * b1) / sum((1 - r) * n) AS u1"
            f" FROM e{k}"))
    body = ", ".join(f"{name} AS ({sql})" for name, sql in ctes)
    rows = []
    for i, fld in enumerate(["o_orderpriority=o_orderpriority",
                             "o_orderstatus=o_orderstatus"]):
        rows.append(
            f"SELECT '{fld}' AS field, round(m{i}, 6) AS m,"
            f" round(u{i}, 6) AS u,"
            f" round(log2(m{i} / u{i}), 6) AS w_agree,"
            f" round(log2((1 - m{i}) / (1 - u{i})), 6)"
            f"  AS w_disagree, round(p, 6) AS p FROM it3")
    return "WITH " + body + " " + " UNION ALL ".join(rows)


ORACLES["fs_em_params"] = _fs_em_oracle()


def q_node2vec_walks(sf_dir: str):
    """Deterministic node2vec biased walks (graph.node2vec_walks,
    weights return:common:far = 4:2:1) over the orders-derived graph
    — integer weights make the second-order draw exactly replayable,
    so the SQL twin re-runs both steps: step 1 via the uniform md5
    rank pick, step 2 via cumulative-weight windows and the same md5
    modulo draw."""
    from ..stages.graph import node2vec_walks

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k % 97, pa.int64())})

    return node2vec_walks(
        orders.map_batches(edges, batch_format="pyarrow"),
        walk_len=2, w_return=4, w_common=2, w_far=1, seed=7, nb=8)


QUERIES["node2vec_walks"] = q_node2vec_walks

_N2V_DRAW1 = ("CAST(('0x' || substr(md5(CAST({n} AS VARCHAR)"
              " || ':0:1:7'), 1, 8)) AS UBIGINT)")
_N2V_DRAW2 = ("CAST(('0x' || substr(md5(CAST({n} AS VARCHAR) || ':'"
              " || CAST({p} AS VARCHAR) || ':0:2:7'), 1, 8))"
              " AS UBIGINT)")

ORACLES["node2vec_walks"] = (
    "WITH e AS (SELECT DISTINCT o_orderkey // 10 AS src,"
    "   o_orderkey % 97 AS dst FROM orders WHERE o_orderkey >= 10),"
    " adj AS (SELECT src AS node, dst AS next, row_number() OVER"
    "   (PARTITION BY src ORDER BY dst) - 1 AS rnk FROM e),"
    " deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),"
    " s0 AS (SELECT node AS start FROM deg),"
    " s1 AS (SELECT s0.start, a.next FROM s0"
    "   JOIN deg d ON d.node = s0.start"
    "   JOIN adj a ON a.node = s0.start AND a.rnk = "
    + _N2V_DRAW1.format(n="s0.start") + " % d.deg),"
    " cand AS (SELECT s1.start, s1.start AS prev, s1.next AS node,"
    "   a.next AS nxt, a.rnk,"
    "   CASE WHEN a.next = s1.start THEN 4"
    "    WHEN e2.src IS NOT NULL THEN 2 ELSE 1 END AS w"
    "  FROM s1 JOIN adj a ON a.node = s1.next"
    "  LEFT JOIN e e2 ON e2.src = s1.start AND e2.dst = a.next),"
    " cw AS (SELECT *, sum(w) OVER (PARTITION BY start"
    "    ORDER BY rnk) AS cum,"
    "   sum(w) OVER (PARTITION BY start) AS tot FROM cand),"
    " s2 AS (SELECT start, nxt FROM cw WHERE tot > 0"
    "  AND " + _N2V_DRAW2.format(n="node", p="prev")
    + " % tot >= cum - w"
    "  AND " + _N2V_DRAW2.format(n="node", p="prev") + " % tot < cum)"
    " SELECT start, CAST(0 AS BIGINT) AS walk,"
    "  CAST(0 AS BIGINT) AS step, start AS node FROM s0"
    " UNION ALL SELECT start, 0, 1, next FROM s1"
    " UNION ALL SELECT start, 0, 2, nxt FROM s2"
)


def q_pagerank_warmstart(sf_dir: str):
    """PageRank WARM START (graph.pagerank(init_ranks=…)) — the
    nightly-recrawl path: previous ranks seed the vector (newcomers
    at 1/N, renormalized), then 2 iterations. Fully oracled (the
    unrolled twin rebuilds the identical warm r0)."""
    from ..stages.canonicalize import dedup_exact
    from ..stages.graph import pagerank

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k, pa.int64())})

    e = orders.map_batches(edges, batch_format="pyarrow")

    def both_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            t.column("src").combine_chunks(),
            t.column("dst").combine_chunks()])})

    nodes = dedup_exact(
        e.map_batches(both_nodes, batch_format="pyarrow"),
        ["node"], nb=8)

    def init(t: pa.Table) -> pa.Table:
        v = t.column("node").to_numpy(zero_copy_only=False)
        v = v[v % 2 == 0]
        return pa.table({
            "node": pa.array(v, pa.int64()),
            "rank": pa.array((1 + v % 5).astype(np.float64))})

    init_ranks = nodes.map_batches(init, batch_format="pyarrow")
    out = pagerank(e, damping=0.85, iters=2, nb=16,
                   init_ranks=init_ranks)
    df = out.to_pandas()
    df["node"] = df["node"].astype("int64")
    df["rank"] = df["rank"].round(8)
    return pa.Table.from_pandas(
        df.sort_values("node").reset_index(drop=True),
        preserve_index=False)


QUERIES["pagerank_warmstart"] = q_pagerank_warmstart


def _pagerank_warm_oracle_sql(iters: int = 2, d: float = 0.85) -> str:
    s = (
        "WITH e AS (SELECT o_orderkey // 10 AS src, o_orderkey AS dst"
        "   FROM orders WHERE o_orderkey >= 10),"
        " deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),"
        " nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS (SELECT count(*) AS n FROM nodes),"
        " raw AS (SELECT node, CASE WHEN node % 2 = 0"
        "   THEN CAST(1 + node % 5 AS DOUBLE) ELSE 1.0 / nn.n END AS r"
        "   FROM nodes CROSS JOIN nn),"
        " tot AS (SELECT sum(r) AS s FROM raw),"
        " r0 AS (SELECT node, r / tot.s AS rank"
        "   FROM raw CROSS JOIN tot)"
    )
    for i in range(iters):
        s += (
            f", m{i} AS (SELECT e.dst AS node,"
            f"   sum(r.rank / deg.deg) AS msum"
            f"   FROM e JOIN r{i} r ON e.src = r.node"
            f"   JOIN deg ON deg.src = e.src GROUP BY e.dst)"
            f", em{i} AS (SELECT coalesce(sum(msum), 0) AS emitted"
            f"   FROM m{i})"
            f", r{i + 1} AS (SELECT n.node,"
            f"   (1 - {d}) / nn.n + {d} * (1 - em.emitted) / nn.n"
            f"   + coalesce({d} * m.msum, 0) AS rank"
            f"   FROM nodes n CROSS JOIN nn CROSS JOIN em{i} em"
            f"   LEFT JOIN m{i} m ON m.node = n.node)"
        )
    return (s + f" SELECT CAST(node AS BIGINT) AS node,"
                f" round(rank, 8) AS rank FROM r{iters}")


ORACLES["pagerank_warmstart"] = _pagerank_warm_oracle_sql()


def q_ccnet_buckets(sf_dir: str):
    """CCNet perplexity bucketing (Wenzek et al. 2020, public) — the
    head/middle/tail split a multilingual curation pipeline applies
    before sampling: per-doc unigram LM NLL (unigram_nll_exact), then
    per-LANG terciles by (nll asc, doc_id) via ntile_per_key. Pure
    composition of two oracled operators; fully SQL-replayable."""
    from ..stages.join import shuffle_hash_join
    from ..stages.textstats import unigram_nll_exact
    from ..stages.windows import ntile_per_key

    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    nll = unigram_nll_exact(
        docs.map_batches(lambda t: t.select(["doc_id", "text"]),
                         batch_format="pyarrow"), nb=8)
    langs = docs.map_batches(
        lambda t: t.select(["doc_id", "lang"]),
        batch_format="pyarrow")
    scored = shuffle_hash_join(nll, langs, on=["doc_id"],
                               how="inner", nb=8)
    tiled = ntile_per_key(scored, key_col="lang",
                          order_cols=["nll", "doc_id"], n_tiles=3,
                          nb=8)

    def label(t: pa.Table) -> pa.Table:
        tl = t.column("tile").to_numpy(zero_copy_only=False)
        names = np.array(["head", "middle", "tail"])
        return pa.table({
            "doc_id": t.column("doc_id"),
            "lang": t.column("lang"),
            "nll": t.column("nll"),
            "bucket": pa.array(names[tl - 1])})

    return tiled.map_batches(label, batch_format="pyarrow")


QUERIES["ccnet_buckets"] = q_ccnet_buckets

ORACLES["ccnet_buckets"] = (
    "WITH tok AS (SELECT doc_id,"
    "   unnest(regexp_split_to_array(trim(text), '\\s+')) AS t"
    "  FROM documents WHERE trim(text) <> ''),"
    " tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),"
    " cnt AS (SELECT t, count(*) AS n FROM tok2 GROUP BY t),"
    " v AS (SELECT t, n FROM (SELECT t, n, row_number() OVER"
    "   (ORDER BY n DESC, t) AS rk FROM cnt) WHERE rk <= 65536),"
    " tot AS (SELECT count(*) AS nn FROM tok2),"
    " nll AS (SELECT t2.doc_id, round(avg(-ln(coalesce(v.n, 0.5)"
    "    / tot.nn)), 6) AS nll"
    "  FROM tok2 t2 LEFT JOIN v USING (t) CROSS JOIN tot"
    "  GROUP BY t2.doc_id),"
    " tiled AS (SELECT nll.doc_id, d.lang, nll.nll,"
    "   ntile(3) OVER (PARTITION BY d.lang"
    "    ORDER BY nll.nll, nll.doc_id) AS tile"
    "  FROM nll JOIN documents d USING (doc_id))"
    " SELECT doc_id, lang, nll, CASE tile WHEN 1 THEN 'head'"
    "  WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket FROM tiled"
)


def q_wordpiece_docs(sf_dir: str):
    """WordPiece tokenization (textstats.wordpiece_encode): greedy
    longest-match-first against a fixed piece vocabulary, dead-end
    words collapse to [UNK] — BERT reference semantics, paid only per
    DISTINCT word per batch. Fully oracled: the SQL twin replays the
    greedy match as a recursive CTE (NOT EXISTS enforces
    longest-first; one deterministic successor per state)."""
    from ..stages.textstats import wordpiece_encode

    vocab = ["[UNK]", "ba", "##tch", "jo", "##in", "the", "a",
             "scan", "s", "##ort", "m", "##erge", "data"]
    return wordpiece_encode(_docs(sf_dir, ["doc_id", "text"]), vocab)


QUERIES["wordpiece_docs"] = q_wordpiece_docs

ORACLES["wordpiece_docs"] = (
    "WITH RECURSIVE"
    " v(piece, body, cont, plen) AS (VALUES"
    "   ('ba','ba',0,2), ('##tch','tch',1,3), ('jo','jo',0,2),"
    "   ('##in','in',1,2), ('the','the',0,3), ('a','a',0,1),"
    "   ('scan','scan',0,4), ('s','s',0,1), ('##ort','ort',1,3),"
    "   ('m','m',0,1), ('##erge','erge',1,4), ('data','data',0,4)),"
    " toks0 AS (SELECT doc_id,"
    "   unnest(regexp_split_to_array(trim(lower(coalesce(text,''))),"
    "    '\\s+')) AS word,"
    "   unnest(range(1, len(regexp_split_to_array(trim(lower("
    "    coalesce(text,''))), '\\s+')) + 1)) AS ord FROM documents),"
    " toks AS (SELECT * FROM toks0 WHERE word <> ''),"
    " w AS (SELECT DISTINCT word FROM toks WHERE length(word) <= 100),"
    " rec(word, i, acc, np) AS ("
    "   SELECT word, 0, CAST('' AS VARCHAR), 0 FROM w"
    "   UNION ALL"
    "   SELECT r.word, r.i + v.plen,"
    "     CASE WHEN r.i = 0 THEN v.piece"
    "      ELSE r.acc || ' ' || v.piece END, r.np + 1"
    "   FROM rec r JOIN v ON substr(r.word, r.i + 1, v.plen) = v.body"
    "     AND v.cont = CASE WHEN r.i = 0 THEN 0 ELSE 1 END"
    "   WHERE r.i < length(r.word)"
    "     AND NOT EXISTS (SELECT 1 FROM v v2"
    "       WHERE substr(r.word, r.i + 1, v2.plen) = v2.body"
    "        AND v2.cont = CASE WHEN r.i = 0 THEN 0 ELSE 1 END"
    "        AND v2.plen > v.plen)),"
    " done AS (SELECT word, acc, np FROM rec WHERE i = length(word)),"
    " enc AS (SELECT w0.word, coalesce(d.acc, '[UNK]') AS pieces,"
    "    coalesce(d.np, 1) AS np,"
    "    CASE WHEN d.word IS NULL THEN 1 ELSE 0 END AS unk"
    "   FROM (SELECT DISTINCT word FROM toks) w0"
    "   LEFT JOIN done d USING (word)),"
    " agg AS (SELECT t.doc_id, count(*) AS n_words,"
    "    CAST(sum(e.np) AS BIGINT) AS n_pieces,"
    "    CAST(sum(e.unk) AS BIGINT) AS n_unk,"
    "    string_agg(e.pieces, ' ' ORDER BY t.ord) AS pieces"
    "   FROM toks t JOIN enc e USING (word) GROUP BY t.doc_id)"
    " SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,"
    "  coalesce(a.n_pieces, 0) AS n_pieces,"
    "  coalesce(a.n_unk, 0) AS n_unk, a.pieces"
    " FROM documents d LEFT JOIN agg a USING (doc_id)"
)


def q_bloom_lookup_orders(sf_dir: str):
    """Persisted per-file Bloom point-lookup
    (stages/bloomindex.py): shard orders to parquet, build the
    KB-scale Bloom sidecar over o_orderkey, then fetch 4 point keys
    opening ONLY bloom-positive files (misses certain, hits settled
    by the pushdown filter). Fully oracled (IN-list twin)."""
    import tempfile

    from ..stages.bloomindex import bloom_point_lookup, \
        build_bloom_index

    keys = [10, 42, 777, 1234]
    with tempfile.TemporaryDirectory(prefix="bloomix-") as td:
        data = f"{td}/data"
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"]
        ).repartition(8).write_parquet(data)
        build_bloom_index(data, "o_orderkey", f"{td}/ix",
                          bits_pow=16)
        out = bloom_point_lookup(data, f"{td}/ix", keys)
        df = out.to_pandas().sort_values("o_orderkey")
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


QUERIES["bloom_lookup_orders"] = q_bloom_lookup_orders

ORACLES["bloom_lookup_orders"] = (
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    " WHERE o_orderkey IN (10, 42, 777, 1234) ORDER BY o_orderkey"
)


def q_temporal_reach(sf_dir: str):
    """Time-respecting reachability (graph.temporal_reachability):
    earliest arrival from seeds {0,1,2} at t0=0 over orders-derived
    temporal edges — an edge is traversable only at-or-after the
    information arrived at its source. Fully oracled (recursive CTE
    over (node, time) states + min)."""
    from ..stages.graph import temporal_reachability

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(k % 300, pa.int64()),
            "dst": pa.array((k // 7) % 300, pa.int64()),
            "ts": pa.array(k % 1000, pa.int64())})

    out = temporal_reachability(
        orders.map_batches(edges, batch_format="pyarrow"),
        [0, 1, 2], t0=0, nb=8)
    df = out.to_pandas().sort_values("node")
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


QUERIES["temporal_reach"] = q_temporal_reach

ORACLES["temporal_reach"] = (
    "WITH RECURSIVE"
    " e AS (SELECT o_orderkey % 300 AS src,"
    "   (o_orderkey // 7) % 300 AS dst,"
    "   o_orderkey % 1000 AS ts FROM orders),"
    " reach(node, t) AS ("
    "   SELECT unnest([0, 1, 2]), 0"
    "   UNION"
    "   SELECT e.dst, e.ts FROM reach r"
    "   JOIN e ON e.src = r.node AND e.ts >= r.t)"
    " SELECT CAST(node AS BIGINT) AS node,"
    "  CAST(min(t) AS BIGINT) AS arrival"
    " FROM reach GROUP BY node"
)


def q_er_golden_parts(sf_dir: str):
    """END-TO-END entity resolution composition — the full dirty-
    catalog fold in one pipeline, every step an already-oracled
    operator: JW-blocked matching (blocked_jw_join, 0.92) over
    swap-corrupted part names → string min-label components over the
    match pairs (string_components) → one golden record per entity
    (the label member's catalog name) + member count. The SQL twin
    replays the match join, a recursive-CTE closure, and the golden
    join."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.graph import string_components
    from ..stages.join import shuffle_hash_join
    from ..stages.similarity import blocked_jw_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"])
    corrupted = part.map_batches(
        lambda t: t.filter(pa.array(
            t.column("p_partkey").to_numpy() % 25 == 0)),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            "p_partkey": t.column("p_partkey"),
            "p_name": pa.array([s[:2] + s[3] + s[2] + s[4:]
                                for s in
                                t.column("p_name").to_pylist()])}),
        batch_format="pyarrow")
    matches = blocked_jw_join(corrupted, part, "p_partkey", "p_name",
                              "p_partkey", "p_name", min_sim=0.92,
                              nb=16)
    edges = matches.map_batches(
        lambda t: pa.table({
            "src": pc.cast(t.column("l_id"), pa.string()),
            "dst": pc.cast(t.column("r_id"), pa.string())}),
        batch_format="pyarrow")
    comp = string_components(edges, nb=8)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "lab": t.column("lab"),
            "n": pa.array(np.ones(t.num_rows, np.int64))})

    cen = sum_by_key(comp.map_batches(one, batch_format="pyarrow"),
                     "lab", "n", nb=8, out_col="n_members")
    labint = cen.map_batches(
        lambda t: t.append_column(
            "p_partkey", pc.cast(t.column("lab"), pa.int64())),
        batch_format="pyarrow")
    j = shuffle_hash_join(labint, part, on=["p_partkey"],
                          how="inner", nb=8)
    df = j.to_pandas()[["lab", "n_members", "p_name"]].rename(
        columns={"lab": "entity", "p_name": "golden_name"})
    df["n_members"] = df["n_members"].astype("int64")
    return pa.Table.from_pandas(
        df.sort_values("entity").reset_index(drop=True),
        preserve_index=False)


QUERIES["er_golden_parts"] = q_er_golden_parts


def _er_golden_oracle() -> str:
    return (
        "WITH RECURSIVE m AS (" + ORACLES["er_parts_jw"] + "),"
        " e AS (SELECT CAST(l_id AS VARCHAR) AS s,"
        "   CAST(r_id AS VARCHAR) AS d FROM m"
        "  UNION SELECT CAST(r_id AS VARCHAR),"
        "   CAST(l_id AS VARCHAR) FROM m),"
        " nodes AS (SELECT DISTINCT s AS n FROM e),"
        " rec(a, b) AS (SELECT n, n FROM nodes"
        "  UNION SELECT r.a, e.d FROM rec r JOIN e ON e.s = r.b),"
        " comp AS (SELECT a AS node, min(b) AS lab FROM rec"
        "  GROUP BY a),"
        " cen AS (SELECT lab, count(*) AS n_members FROM comp"
        "  GROUP BY lab)"
        " SELECT cen.lab AS entity,"
        "  CAST(cen.n_members AS BIGINT) AS n_members,"
        "  p.p_name AS golden_name"
        " FROM cen JOIN part p ON p.p_partkey = CAST(cen.lab AS BIGINT)"
    )


ORACLES["er_golden_parts"] = _er_golden_oracle()


def q_bootstrap_ci_orders(sf_dir: str):
    """Poisson-bootstrap percentile CI for mean(o_totalprice)
    (sketches.bootstrap_ci): Efron bootstrap in ONE streaming pass
    with md5-deterministic Poisson(1) weights — replayable at any
    scale, no RNG state. Fully oracled (the SQL twin re-draws every
    weight from the same md5 and shared CDF threshold literals)."""
    from ..stages.sketches import bootstrap_ci

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    return bootstrap_ci(orders, "o_orderkey", "o_totalprice",
                        n_replicates=50, seed=0, alpha=0.05, nb=8)


QUERIES["bootstrap_ci_orders"] = q_bootstrap_ci_orders

ORACLES["bootstrap_ci_orders"] = "WITH r AS (SELECT unnest(range(0, 50)) AS b), d AS (SELECT o.o_orderkey AS id, o.o_totalprice AS x, r.b,   CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)    || ':' || CAST(r.b AS VARCHAR) || ':0'), 1, 8)) AS UBIGINT)    AS u  FROM orders o CROSS JOIN r WHERE o.o_totalprice IS NOT NULL), w AS (SELECT b, x, (CASE WHEN CAST(u AS DOUBLE) > 1580030168.7021008 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 3160060337.4042015 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 3950075421.755252 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4213413783.2056017 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4279248373.5681896 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4292415291.640707 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4294609777.986126 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4294923276.035472 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4294962463.2916408 THEN 1 ELSE 0 END) AS w FROM d), m AS (SELECT b, sum(w * x) / sum(w) AS mean FROM w GROUP BY b  HAVING sum(w) > 0) SELECT round((SELECT avg(o_totalprice) FROM orders), 6)   AS mean,  round(quantile_cont(mean, 0.025), 6) AS lo,  round(quantile_cont(mean, 0.975), 6) AS hi,  (SELECT count(o_totalprice) FROM orders) AS n,  CAST(50 AS BIGINT) AS n_replicates FROM m"


def q_compression_quality(sf_dir: str):
    """Compression-ratio quality signal
    (textstats.compression_ratio): deflate bytes / utf8 bytes per
    document — the Gopher boilerplate heuristic. Rows-only (no SQL
    zlib); fully deterministic (zlib is specified by input+level),
    covered by the double-run determinism net."""
    from ..stages.textstats import compression_ratio

    return compression_ratio(_docs(sf_dir, ["doc_id", "text"]))


QUERIES["compression_quality"] = q_compression_quality


def q_event_gaps(sf_dir: str):
    """Telemetry GAP detection — the islands complement: per user,
    report every silence longer than 6 hours between consecutive
    events (lag_per_key composition → vectorized duration filter).
    The monitoring question "where did the feed stop?". Fully
    oracled (lag window twin)."""
    from ..stages.windows import lag_per_key

    out = lag_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                      key_col="user_id", value_col="ts",
                      order_cols=["ts", "event_id"], out="prev_ts",
                      nb=8)

    def gaps(t: pa.Table) -> pa.Table:
        cur = pc.cast(t.column("ts"), pa.int64())
        prev = pc.cast(t.column("prev_ts"), pa.int64())
        dur = pc.subtract(cur, prev)
        keep = pc.fill_null(
            pc.greater(dur, 6 * 3600 * 1_000_000), False)
        t2 = pa.table({
            "user_id": t.column("user_id"),
            "gap_start": t.column("prev_ts"),
            "gap_end": t.column("ts"),
            "gap_seconds": pc.cast(pc.divide(dur, 1_000_000),
                                   pa.int64())}).filter(keep)
        return t2

    out = out.map_batches(gaps, batch_format="pyarrow")
    df = out.to_pandas().sort_values(
        ["user_id", "gap_start"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["event_gaps"] = q_event_gaps

ORACLES["event_gaps"] = (
    "WITH l AS (SELECT user_id, ts,"
    "   lag(ts) OVER (PARTITION BY user_id"
    "    ORDER BY ts, event_id) AS prev_ts FROM events)"
    " SELECT user_id, prev_ts AS gap_start, ts AS gap_end,"
    "  CAST(epoch_us(ts - prev_ts) // 1000000 AS BIGINT)"
    "   AS gap_seconds"
    " FROM l WHERE ts - prev_ts > INTERVAL 6 HOUR"
)


def q_bootstrap_by_type(sf_dir: str):
    """Per-key Poisson-bootstrap CIs (sketches.bootstrap_ci_per_key):
    a percentile interval for every event_type's mean value in one
    streaming pass — md5-deterministic weights, fsum-deterministic
    reduce. Fully oracled (same-md5 weight re-draw + per-key
    quantile_cont twin)."""
    from ..stages.sketches import bootstrap_ci_per_key

    out = bootstrap_ci_per_key(
        _events(sf_dir, ["event_id", "event_type", "value"]),
        "event_type", "event_id", "value", n_replicates=30,
        seed=0, alpha=0.05, nb=8)
    df = out.to_pandas().rename(columns={"event_type": "event_type"})
    return pa.Table.from_pandas(
        df.sort_values("event_type").reset_index(drop=True),
        preserve_index=False)


QUERIES["bootstrap_by_type"] = q_bootstrap_by_type

ORACLES["bootstrap_by_type"] = "WITH r AS (SELECT unnest(range(0, 30)) AS b), d AS (SELECT e.event_type AS k, e.event_id AS id,   e.value AS x, r.b,   CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)    || ':' || CAST(r.b AS VARCHAR) || ':0'), 1, 8)) AS UBIGINT)    AS u  FROM events e CROSS JOIN r  WHERE e.value IS NOT NULL AND NOT isnan(e.value)   AND e.event_type IS NOT NULL), w AS (SELECT k, b, x, (CASE WHEN CAST(u AS DOUBLE) > 1580030168.7021008 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 3160060337.4042015 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 3950075421.755252 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4213413783.2056017 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4279248373.5681896 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4292415291.640707 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4294609777.986126 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4294923276.035472 THEN 1 ELSE 0 END) + (CASE WHEN CAST(u AS DOUBLE) > 4294962463.2916408 THEN 1 ELSE 0 END) AS w FROM d), m AS (SELECT k, b, sum(w * x) / sum(w) AS mean FROM w  GROUP BY k, b HAVING sum(w) > 0), base AS (SELECT event_type AS k,   round(avg(value), 6) AS mean,   count(value) AS n FROM events  WHERE event_type IS NOT NULL AND NOT isnan(value)  GROUP BY 1) SELECT base.k AS event_type, base.mean,  round(quantile_cont(m.mean, 0.025), 6) AS lo,  round(quantile_cont(m.mean, 0.975), 6) AS hi,  CAST(base.n AS BIGINT) AS n,  CAST(30 AS BIGINT) AS n_replicates FROM m JOIN base ON m.k = base.k GROUP BY base.k, base.mean, base.n"


def q_distance_distribution(sf_dir: str):
    """Hop-distance distribution from 3 landmarks
    (graph.multi_source_bfs composition): the effective-diameter /
    small-world profile — count of nodes at each depth per landmark,
    all landmarks sharing each round's shuffle. Fully oracled
    (recursive-CTE min-hop twin + census)."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.graph import multi_source_bfs

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])

    def edges(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        k = k[k >= 10]
        return pa.table({"src": pa.array(k // 10, pa.int64()),
                         "dst": pa.array(k % 97, pa.int64())})

    bfs = multi_source_bfs(
        orders.map_batches(edges, batch_format="pyarrow"),
        [1, 2, 3], nb=8)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "lm": t.column("lm"), "dist": t.column("dist"),
            "n": pa.array(np.ones(t.num_rows, np.int64))})

    cen = sum_by_key(bfs.map_batches(one, batch_format="pyarrow"),
                     ["lm", "dist"], "n", nb=4, out_col="n_nodes")
    df = cen.to_pandas()
    df["lm"] = df["lm"].astype("int64")
    df["dist"] = df["dist"].astype("int64")
    df["n_nodes"] = df["n_nodes"].astype("int64")
    return pa.Table.from_pandas(
        df.sort_values(["lm", "dist"]).reset_index(drop=True),
        preserve_index=False)


QUERIES["distance_distribution"] = q_distance_distribution

ORACLES["distance_distribution"] = (
    "WITH RECURSIVE e AS (SELECT o_orderkey // 10 AS src,"
    "   o_orderkey % 97 AS dst FROM orders WHERE o_orderkey >= 10),"
    " walk(lm, node, d) AS ("
    "   SELECT unnest([1, 2, 3]), unnest([1, 2, 3]), 0"
    "   UNION SELECT w.lm, e.dst, w.d + 1 FROM walk w"
    "   JOIN e ON e.src = w.node WHERE w.d < 60),"
    " md AS (SELECT lm, node, min(d) AS dist FROM walk"
    "  GROUP BY lm, node)"
    " SELECT CAST(lm AS BIGINT) AS lm, CAST(dist AS BIGINT) AS dist,"
    "  count(*) AS n_nodes FROM md GROUP BY lm, dist"
)


def q_property_path_alt(sf_dir: str):
    """SPARQL property path with ALTERNATION and INVERSE —
    ``(follows | ^manages)+`` — compiled to one edge union (forward
    follows + swapped manages) feeding the string transitive
    closure. Corpus: 20 disjoint follow chains BRIDGED only by
    inverse-manages edges across chain breaks, so the alternation is
    load-bearing. Deep-chain corpus → the ⌈log₂ depth⌉-round
    path-doubling closure. Twin: recursive CTE over the same
    union."""
    from ..stages.graph import transitive_closure_doubling

    rows = []
    for i in range(200):
        if i % 10 != 9:
            rows.append({"subj": f"E{i}", "pred": "follows",
                         "obj": f"E{i + 1}"})
        if i % 20 == 9:
            # manages points BACKWARD across the break; ^manages
            # bridges i -> i+1
            rows.append({"subj": f"E{i + 1}", "pred": "manages",
                         "obj": f"E{i}"})
        rows.append({"subj": f"E{i}", "pred": "likes",
                     "obj": f"E{(i * 3) % 200}"})
    triples = rd.from_arrow(
        pa.Table.from_pylist(rows)).repartition(4)

    def path_edges(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t.column("pred"), "follows"))
        m = t.filter(pc.equal(t.column("pred"), "manages"))
        return pa.table({
            "child": pa.concat_arrays([
                f.column("subj").combine_chunks(),
                m.column("obj").combine_chunks()]),
            "parent": pa.concat_arrays([
                f.column("obj").combine_chunks(),
                m.column("subj").combine_chunks()])})

    edges = triples.map_batches(path_edges, batch_format="pyarrow")
    out = transitive_closure_doubling(edges, nb=8)
    df = out.to_pandas().sort_values(["node", "anc"])
    return pa.Table.from_pandas(df.reset_index(drop=True),
                                preserve_index=False)


QUERIES["property_path_alt"] = q_property_path_alt

ORACLES["property_path_alt"] = (
    "WITH RECURSIVE src AS (SELECT i FROM generate_series(0, 199)"
    "   t(i)),"
    " tr AS ("
    "   SELECT 'E' || CAST(i AS VARCHAR) AS subj, 'follows' AS pred,"
    "    'E' || CAST(i + 1 AS VARCHAR) AS obj FROM src"
    "   WHERE i % 10 <> 9"
    "   UNION ALL"
    "   SELECT 'E' || CAST(i + 1 AS VARCHAR), 'manages',"
    "    'E' || CAST(i AS VARCHAR) FROM src WHERE i % 20 = 9),"
    " e AS (SELECT subj AS child, obj AS parent FROM tr"
    "   WHERE pred = 'follows'"
    "  UNION ALL SELECT obj, subj FROM tr WHERE pred = 'manages'),"
    " cl(node, anc) AS ("
    "   SELECT child, parent FROM e"
    "   UNION SELECT c.node, e.parent FROM cl c"
    "   JOIN e ON e.child = c.anc)"
    " SELECT node, anc FROM cl"
)


def _bgp_kg():
    rows = []
    for i in range(500):
        rows.append({"subj": f"P{i}", "pred": "worksFor",
                     "obj": f"O{i % 20}"})
        rows.append({"subj": f"P{i}", "pred": "@type",
                     "obj": "Bot" if i % 3 == 1 else "Person"})
        if i % 5 == 0:
            rows.append({"subj": f"P{i}", "pred": "suspended",
                         "obj": f"T{i % 4}"})
    for j in range(20):
        rows.append({"subj": f"O{j}", "pred": "locatedIn",
                     "obj": f"C{j % 7}"})
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)


_BGP_KG_SQL = (
    " SELECT 'P' || i AS subj, 'worksFor' AS pred,"
    "   'O' || (i % 20) AS obj FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'P' || i, '@type',"
    "  CASE WHEN i % 3 = 1 THEN 'Bot' ELSE 'Person' END"
    "  FROM generate_series(0, 499) s(i)"
    " UNION ALL SELECT 'P' || i, 'suspended', 'T' || (i % 4)"
    "  FROM generate_series(0, 499) s(i) WHERE i % 5 = 0"
    " UNION ALL SELECT 'O' || j, 'locatedIn', 'C' || (j % 7)"
    "  FROM generate_series(0, 19) s(j)")


def q_bgp_not_exists(sf_dir: str):
    """SPARQL FILTER NOT EXISTS (graph.match_bgp(not_exists=…)):
    employees of orgs in city C0 EXCEPT anyone with a suspended
    record — the negation compiles to ONE anti-join per group,
    unshared group variables existential. Fully oracled (NOT EXISTS
    twin over the regenerated KG)."""
    from ..stages.graph import match_bgp

    out = match_bgp(
        _bgp_kg(),
        [("?p", "worksFor", "?o"), ("?o", "locatedIn", "C0")],
        not_exists=[("?p", "suspended", "?t")], nb=8)
    df = (out.to_pandas().sort_values(["p", "o"])
          .reset_index(drop=True)[["p", "o"]])
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["bgp_not_exists"] = q_bgp_not_exists

ORACLES["bgp_not_exists"] = (
    "WITH t AS (" + _BGP_KG_SQL + ")"
    " SELECT a.subj AS p, a.obj AS o FROM t a"
    " JOIN t loc ON loc.subj = a.obj AND loc.pred = 'locatedIn'"
    "  AND loc.obj = 'C0'"
    " WHERE a.pred = 'worksFor'"
    "  AND NOT EXISTS (SELECT 1 FROM t n WHERE n.subj = a.subj"
    "   AND n.pred = 'suspended')"
)


def q_bgp_aggregate(sf_dir: str):
    """SPARQL GROUP BY aggregate over BGP bindings — headcount per
    city for non-Bot employees: match_bgp bindings → one
    sum_by_key census (SELECT ?c (COUNT(*) AS n) ... GROUP BY ?c).
    Fully oracled."""
    from ..stages.canonicalize import sum_by_key
    from ..stages.graph import match_bgp

    bind = match_bgp(
        _bgp_kg(),
        [("?p", "worksFor", "?o"), ("?o", "locatedIn", "?c"),
         ("?p", "@type", "Person")], nb=8)

    def one(t: pa.Table) -> pa.Table:
        return pa.table({
            "c": t.column("c"),
            "n": pa.array(np.ones(t.num_rows, np.int64))})

    cen = sum_by_key(bind.map_batches(one, batch_format="pyarrow"),
                     "c", "n", nb=4, out_col="n_people")
    df = cen.to_pandas().sort_values("c").reset_index(drop=True)
    df["n_people"] = df["n_people"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["bgp_aggregate"] = q_bgp_aggregate

ORACLES["bgp_aggregate"] = (
    "WITH t AS (" + _BGP_KG_SQL + ")"
    " SELECT loc.obj AS c, count(*) AS n_people FROM t a"
    " JOIN t loc ON loc.subj = a.obj AND loc.pred = 'locatedIn'"
    " JOIN t ty ON ty.subj = a.subj AND ty.pred = '@type'"
    "  AND ty.obj = 'Person'"
    " WHERE a.pred = 'worksFor' GROUP BY loc.obj"
)
