"""queries part 04 — mechanical split of the original queries.py (registration order preserved; see queryreg)."""
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
