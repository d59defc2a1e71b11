"""queries part 02 — mechanical split of the original queries.py (registration order preserved; see queryreg)."""
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


ORACLES["bm25_indexed"] = ORACLES["bm25"]

ORACLES["graph_degrees"] = (
    "SELECT CAST(o_orderkey // 10 AS BIGINT) AS subj,"
    " CAST(count(*) AS BIGINT) AS out_degree"
    " FROM orders WHERE o_orderkey >= 10 GROUP BY 1"
)

ORACLES["approx_distinct_users"] = (
    "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,"
    " TRUE AS hll_within_5pct FROM events"
)

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
