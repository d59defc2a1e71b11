"""queries part 01 — mechanical split of the original queries.py (registration order preserved; see queryreg)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..stages import textstats
from ..stages.canonicalize import (dedup_exact, distinct_counts,
                                   groupby_argmax)
from ..stages.util import as_task_fn

from .queryreg import ORACLES, QUERIES
from ._qcommon import (  # noqa: F401
    _BGP_KG_SQL,
    _CURATE_STOP_SQL,
    _FOLD_WORDS,
    _GOLD_TRIPLES_SQL,
    _HEARST_AUG_SQL,
    _HEARST_SUFFIXES,
    _KCORE_DEG,
    _KCORE_PEEL,
    _LPA_VOTE,
    _MIME_PREFIXES,
    _N2V_DRAW1,
    _N2V_DRAW2,
    _RAKE_STOP,
    _TABLE_CELLS_SQL,
    _TRUSS_ROUND,
    _URL_CANON_RE,
    _WL_ROUND,
    _bag_sides,
    _benford_oracle2,
    _bgp_kg,
    _coloring_round_sql,
    _crawl_budget_oracle,
    _derived_customer_edges,
    _docs,
    _er_golden_oracle,
    _events,
    _fs_em_oracle,
    _fs_oracle,
    _gold_triples,
    _hits_oracle_sql,
    _katz_oracle_sql,
    _langid_pred_sql,
    _matching_round_sql,
    _mis_round_sql,
    _outer_join_query,
    _outer_join_sides,
    _pagerank_oracle_sql,
    _pagerank_warm_oracle_sql,
    _ppr_oracle_sql,
    _rw_choice_sql,
    _setop_sides,
    _sm_block,
    _soundex_sql,
    _spread_round_sql,
    _table_corpus,
    _textrank_oracle_sql,
    _weighted_pagerank_oracle_sql,
    _wmatch_round_sql)


def q_count_documents(sf_dir: str):
    n = _docs(sf_dir, ["doc_id"]).count()
    return pa.table({"n": pa.array([n], pa.int64())})

def q_filter_lang_en(sf_dir: str):
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"],
        filter=pads.field("lang") == "en",
    )
    return ds.select_columns(["doc_id"])

def q_normalize_text(sf_dir: str):
    from ..functions.normalize import norm_array

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("doc_id"),
                         "norm_text": norm_array(batch.column("text"))})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")

def q_extract_json_k(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch.column("props"), r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "k": k})

    return _events(sf_dir, ["event_id", "props"]).map_batches(f, batch_format="pyarrow")

def q_token_counts(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.token_count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
    )

def q_canonicalize_events(sf_dir: str):
    best = groupby_argmax(
        _events(sf_dir, ["user_id", "event_id", "value"]),
        ["user_id"], ["value", "event_id"], [False, True], nb=16,
    )
    return best.select_columns(["user_id", "event_id", "value"])

def q_latest_event_per_user_type(sf_dir: str):
    best = groupby_argmax(
        _events(sf_dir, ["user_id", "event_type", "event_id", "ts"]),
        ["user_id", "event_type"], ["ts", "event_id"], [False, False], nb=16,
    )
    out = best.select_columns(["user_id", "event_type", "event_id"])
    return out

def q_dedup_docs(sf_dir: str):
    out = dedup_exact(_docs(sf_dir, ["doc_id", "text"]), ["text"], nb=16,
                      keep_order_col="doc_id")
    return out.select_columns(["doc_id"])

def q_distinct_event_types(sf_dir: str):
    return distinct_counts(_events(sf_dir, ["event_type"]), "event_type", nb=8).select_columns(
        ["event_type"]
    )

def q_topk_event_types(sf_dir: str):
    counts = distinct_counts(_events(sf_dir, ["event_type"]), "event_type", nb=8)
    t = counts.to_pandas().rename(columns={"count": "n"})
    t = t.sort_values(["n", "event_type"], ascending=[False, True]).head(5)
    return pa.Table.from_pandas(t.reset_index(drop=True), preserve_index=False)

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

def q_full_outer_join(sf_dir: str):
    return _outer_join_query(sf_dir, "full")

def q_left_join_orders(sf_dir: str):
    return _outer_join_query(sf_dir, "left")

def q_right_join_lineitem(sf_dir: str):
    return _outer_join_query(sf_dir, "right")

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

def q_docs_without_label0_vec(sf_dir: str):
    keys_tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
                             filters=[("label", "=", 0)])
    have = pa.array(sorted(set(keys_tbl.column("vec_id").to_pylist())), pa.int64())
    ref = ray.put(have)

    def f(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        return batch.filter(pc.invert(pc.is_in(batch.column("doc_id"), value_set=keys)))

    return _docs(sf_dir, ["doc_id"]).map_batches(f, batch_format="pyarrow")

def q_top_orders(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)

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

def q_train_split(sf_dir: str):
    out = _docs(sf_dir, ["doc_id"]).map_batches(
        textstats.train_split, batch_format="pyarrow", batch_size=65536
    )
    return out.select_columns(["doc_id", "bucket", "split"])

def q_chunk_documents(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: textstats.chunk_documents(t, chunk_tokens=32, overlap=8),
        batch_format="pyarrow", batch_size=65536,
    )

def q_bpe_token_counts(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(textstats.bpe_token_count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_bpe_tokens"])
    )

def q_lineitem_date_filter(sf_dir: str):
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"],
        filter=pads.field("l_shipdate") < pads.scalar(pd.Timestamp("1994-01-01")),
    )
    n = ds.count()
    return pa.table({"n": pa.array([n], pa.int64())})

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

def q_sliding_windows(sf_dir: str):
    from ..stages.windows import sliding_windows

    out = sliding_windows(_events(sf_dir, ["event_type", "ts", "value"]),
                          size=pd.Timedelta(hours=1), slide=pd.Timedelta(minutes=30))
    df = out.to_pandas()
    df["sum_value"] = df["sum_value"].round(2)
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_partition_date(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        d = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        return pa.table({"event_id": batch.column("event_id"), "part_date": d})

    return _events(sf_dir, ["event_id", "ts"]).map_batches(f, batch_format="pyarrow")

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

def q_hash_sample(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        out = textstats.train_split(batch)
        return out.filter(pc.less(out.column("bucket"), 10)).select(["doc_id"])

    return _docs(sf_dir, ["doc_id"]).map_batches(f, batch_format="pyarrow")

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

def q_rank_events(sf_dir: str):
    from ..stages.windows import rank_per_key

    out = rank_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                       key_col="user_id", order_cols=["ts", "event_id"], nb=8)
    df = out.to_pandas()[["event_id", "rn"]]
    df["rn"] = df["rn"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_quantiles(sf_dir: str):
    from ..stages.sketches import exact_quantile

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    qs = exact_quantile(ds, "o_totalprice", [0.5, 0.9], n_bins=512)
    return pa.table({"p50": pa.array([round(qs[0.5], 2)], pa.float64()),
                     "p90": pa.array([round(qs[0.9], 2)], pa.float64())})

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

def q_pivot_events(sf_dir: str):
    from ..stages.canonicalize import pivot_sum

    cats = ["click", "error", "purchase", "signup", "view"]
    out = pivot_sum(_events(sf_dir, ["user_id", "event_type", "value"]),
                    "user_id", "event_type", "value", cats)
    df = out.to_pandas()
    for c in cats:
        df[c] = df[c].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_range_partition_orders(sf_dir: str):
    from ..stages.sketches import range_partition

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    tagged = range_partition(ds, "o_totalprice", 4)
    counts = distinct_counts(tagged.select_columns(["part"]), "part", nb=4)
    df = counts.to_pandas().rename(columns={"count": "n"})
    df["part"] = df["part"].astype("int64")
    return pa.Table.from_pandas(df.sort_values("part").reset_index(drop=True),
                                preserve_index=False)

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

def q_cumsum_events(sf_dir: str):
    from ..stages.windows import cumsum_per_key

    out = cumsum_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                         key_col="user_id", value_col="value",
                         order_cols=["ts", "event_id"], nb=8)
    df = out.to_pandas()[["event_id", "cum_value"]]
    df["cum_value"] = df["cum_value"].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_repetition_stats(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.repetition_stats, batch_format="pyarrow", batch_size=65536)

def q_top_bigrams(sf_dir: str):
    return textstats.top_ngrams(_docs(sf_dir, ["text"]), n=2, k=20)

def q_setop_intersect(sf_dir: str):
    from ..stages.canonicalize import set_op

    a, b = _setop_sides(sf_dir)
    return set_op(a, b, "doc_id", op="intersect", nb=8)

def q_setop_except(sf_dir: str):
    from ..stages.canonicalize import set_op

    a, b = _setop_sides(sf_dir)
    return set_op(a, b, "doc_id", op="except", nb=8)

def q_setop_intersect_all(sf_dir: str):
    from ..stages.canonicalize import set_op_all

    a, b = _bag_sides(sf_dir)
    return set_op_all(a, b, "id", op="intersect", nb=8)

def q_setop_except_all(sf_dir: str):
    from ..stages.canonicalize import set_op_all

    a, b = _bag_sides(sf_dir)
    return set_op_all(a, b, "id", op="except", nb=8)

def q_moving_max_events(sf_dir: str):
    from ..stages.windows import rolling_extreme_per_key

    out = rolling_extreme_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        window=4, mode="max")
    df = out.to_pandas()[["event_id", "mov_max"]]
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)

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

def q_quality_signals(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        textstats.quality_counts, batch_format="pyarrow", batch_size=65536)

def q_string_agg_events(sf_dir: str):
    from ..stages.windows import collect_seq_per_key

    out = collect_seq_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                              key_col="user_id", value_col="event_id",
                              order_cols=["ts", "event_id"], nb=8)
    return out.select_columns(["user_id", "seq"])

def q_histogram_values(sf_dir: str):
    from ..stages.sketches import fixed_width_histogram

    out = fixed_width_histogram(_events(sf_dir, ["value"]), "value", bin_width=10.0)
    df = out.to_pandas()
    df["bin"] = df["bin"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

def q_dense_rank_events(sf_dir: str):
    from ..stages.windows import dense_rank_per_key

    out = dense_rank_per_key(_events(sf_dir, ["event_id", "user_id", "value"]),
                             key_col="user_id", order_col="value", ascending=False, nb=8)
    return out.select_columns(["event_id", "drank"])

def q_ntile_events(sf_dir: str):
    from ..stages.windows import ntile_per_key

    out = ntile_per_key(_events(sf_dir, ["event_id", "user_id", "ts"]),
                        key_col="user_id", order_cols=["ts", "event_id"],
                        n_tiles=4, nb=8)
    return out.select_columns(["event_id", "tile"])

def q_unpivot_events(sf_dir: str):
    from ..stages.canonicalize import melt, pivot_sum

    cats = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_sum(_events(sf_dir, ["user_id", "event_type", "value"]),
                     "user_id", "event_type", "value", cats)
    out = melt(wide, "user_id", cats, var_name="event_type", value_name="value")
    df = out.to_pandas()
    df["value"] = df["value"].round(2)
    return pa.Table.from_pandas(df, preserve_index=False)

def q_supplier_nation(sf_dir: str):
    from ..stages.join import broadcast_join

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
                           ).rename_columns(["s_nationkey", "n_name"])
    out = broadcast_join(sup, nation, on=["s_nationkey"], how="inner")
    return out.select_columns(["s_suppkey", "n_name"])

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

def q_union_all_ids(sf_dir: str):
    docs = _docs(sf_dir, ["doc_id"])
    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"]).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    return docs.union(vecs)

def q_like_filter(sf_dir: str):
    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.match_substring(batch.column("text"), "customer"))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow").select_columns(["doc_id"])

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

def q_dup_ngram_share(sf_dir: str):
    out = textstats.dup_ngram_stats(_docs(sf_dir, ["doc_id", "text"]), k=5, nb=16)
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["n_grams"] = df["n_grams"].astype("int64")
    df["dup_grams"] = df["dup_grams"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

def q_distinct_users_per_type(sf_dir: str):
    from ray.data.aggregate import Count

    pairs = dedup_exact(_events(sf_dir, ["event_type", "user_id"]),
                        ["event_type", "user_id"], nb=16)
    agg = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    df = agg.to_pandas()
    df["n_users"] = df["n_users"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_region_nation_cross(sf_dir: str):
    from ..stages.join import broadcast_join

    region = rd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_name"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_name"])
    return broadcast_join(region, nation, on=[], how="cross")

def q_percent_rank_events(sf_dir: str):
    from ..stages.windows import percent_rank_per_key

    out = percent_rank_per_key(_events(sf_dir, ["event_id", "user_id", "value"]),
                               key_col="user_id", order_col="value", nb=8)
    return out.select_columns(["event_id", "prank"])

def q_cume_dist_events(sf_dir: str):
    from ..stages.windows import cume_dist_per_key

    out = cume_dist_per_key(_events(sf_dir, ["event_id", "user_id", "value"]),
                            key_col="user_id", order_col="value", nb=8)
    return out.select_columns(["event_id", "cdist"])

def q_first_value_events(sf_dir: str):
    from ..stages.windows import first_value_per_key

    out = first_value_per_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                              key_col="user_id", value_col="value",
                              order_cols=["ts", "event_id"], nb=8)
    return out.select_columns(["event_id", "first_value"])

def q_redact_props(sf_dir: str):
    from ..functions.normalize import mask_pattern

    return _events(sf_dir, ["event_id", "props"]).map_batches(
        lambda t: mask_pattern(t, "props", r"\d\d+", "<NUM>",
                               out="props_redacted").select(["event_id", "props_redacted"]),
        batch_format="pyarrow",
    )

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

def q_heavy_hitters(sf_dir: str):
    from ..stages.sketches import count_min_heavy_hitters

    return count_min_heavy_hitters(_events(sf_dir, ["event_type"]), "event_type", k=5)

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

def q_cooccurrence_edges(sf_dir: str):
    from ..stages.graph import cooccurrence_edges

    out = cooccurrence_edges(_docs(sf_dir, ["doc_id", "text"]), min_count=5)
    df = out.to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

def q_bm25(sf_dir: str):
    from ..stages.textstats import bm25_topk

    return bm25_topk(_docs(sf_dir, ["doc_id", "text"]),
                     terms=["table", "scan", "vector"], topk=20)

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

def q_profile_events(sf_dir: str):
    from ..stages.profile import profile_table

    return profile_table(
        _events(sf_dir),
        ["event_id", "ts", "user_id", "event_type", "value", "props"])

def q_ohlc_events(sf_dir: str):
    from ..stages.windows import ohlc_resample

    out = ohlc_resample(_events(
        sf_dir, ["event_id", "ts", "event_type", "value"]))
    df = out.to_pandas()
    df["bucket_ts"] = df["bucket_ts"].astype("datetime64[us]")
    df["n"] = df["n"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_trailing_sum(sf_dir: str):
    from ..stages.windows import trailing_time_sum_per_key

    out = trailing_time_sum_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        window=pd.Timedelta(hours=1))
    df = out.to_pandas()[["event_id", "tsum"]]
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)

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

def q_centered_mean_events(sf_dir: str):
    from ..stages.windows import centered_mean_per_key

    out = centered_mean_per_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]), half=2)
    df = out.to_pandas()[["event_id", "cmean"]]
    return pa.Table.from_pandas(
        df.sort_values("event_id").reset_index(drop=True),
        preserve_index=False)

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

def q_token_entropy(sf_dir: str):
    out = textstats.token_entropy(_docs(sf_dir, ["doc_id", "text"]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)

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

def q_weighted_sample(sf_dir: str):
    from ..stages.sketches import weighted_sample

    out = weighted_sample(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"]),
        id_col="o_orderkey", weight_col="o_totalprice", k=500).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("o_orderkey").reset_index(drop=True),
        preserve_index=False)

def q_funnel_events(sf_dir: str):
    from ..stages.windows import funnel_steps_per_user

    out = funnel_steps_per_user(
        _events(sf_dir, ["user_id", "ts", "event_type"]),
        steps=["click", "view", "purchase"]).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True),
        preserve_index=False)

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

def q_triangle_count(sf_dir: str):
    from ..stages.graph import triangle_count

    n = triangle_count(_derived_customer_edges(sf_dir), nb=16)
    return pa.table({"n_triangles": pa.array([n], pa.int64())})

def q_bm25_indexed(sf_dir: str):
    from ..stages.textindex import (build_text_index, search_text_index,
                                    text_index_dir_for)

    src = f"{sf_dir}/documents.parquet"
    idx = text_index_dir_for(src)
    build_text_index(_docs(sf_dir, ["doc_id", "text"]), idx)
    return search_text_index(idx, ["table", "scan", "vector"], topk=20)

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

QUERIES.update({
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
})

ORACLES.update({
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
})
