"""queries part 06 — mechanical split of the original queries.py (registration order preserved; see queryreg)."""
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


def q_indexed_lookup_orders(sf_dir: str):
    """Index-aware point lookup (bloomindex.pruned_point_lookup, r04
    verdict item 4): orders re-laid-out sorted by o_custkey into a
    4-file archive with small row groups, Bloom sidecar built over
    o_custkey, then one lookup call that opens only bloom-positive
    files and only zone-map-admitted row groups. Oracle: plain IN
    filter over the orders view — results must be exact regardless
    of pruning."""
    import hashlib
    import os

    from ..stages.bloomindex import build_bloom_index, pruned_point_lookup

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = f"/tmp/graft_lookup_{tag}"
    data_dir, index_dir = f"{base}/data", f"{base}/bloom"
    if not os.path.exists(f"{base}/_DONE"):
        os.makedirs(data_dir, exist_ok=True)
        t = (pq.read_table(f"{sf_dir}/orders.parquet")
             .sort_by([("o_custkey", "ascending")]))
        n = t.num_rows
        step = (n + 3) // 4
        for i in range(4):
            part = t.slice(i * step, step)
            if part.num_rows:
                pq.write_table(
                    part, f"{data_dir}/part-{i:02d}.parquet",
                    row_group_size=max(1, step // 8))
        build_bloom_index(data_dir, "o_custkey", index_dir,
                          bits_pow=16)
        with open(f"{base}/_DONE", "w") as f:
            f.write("ok")
    keys = [1, 2, 3, 5, 8]
    ds, stats = pruned_point_lookup(
        data_dir, index_dir, keys,
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    df = (ds.to_pandas()
          .sort_values(["o_orderkey"]).reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["indexed_lookup_orders"] = q_indexed_lookup_orders

ORACLES["indexed_lookup_orders"] = (
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    " WHERE o_custkey IN (1, 2, 3, 5, 8) ORDER BY o_orderkey"
)


def q_char_entropy(sf_dir: str):
    """Per-document character Shannon entropy (textstats.char_entropy)
    — repetition/boilerplate vs encoded-blob quality signal. Fully
    oracled: the SQL twin re-derives per-(doc, char) counts with
    regexp_extract_all + unnest and sums -p*log2(p) in DuckDB (float
    compare under the sweep's 1e-9 rtol gate)."""
    from ..stages.textstats import char_entropy

    out = char_entropy(_docs(sf_dir, ["doc_id", "text"]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    df["n_chars"] = df["n_chars"].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["char_entropy"] = q_char_entropy

ORACLES["char_entropy"] = (
    "WITH ch AS (SELECT doc_id, unnest(regexp_extract_all("
    "   coalesce(text, ''), '[\\s\\S]')) AS c FROM documents),"
    " cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),"
    " tot AS (SELECT doc_id, sum(n) AS m FROM cc GROUP BY 1),"
    " ent AS (SELECT cc.doc_id,"
    "   -sum((n / m) * log2(n / m)) AS entropy"
    "  FROM cc JOIN tot ON tot.doc_id = cc.doc_id GROUP BY 1)"
    " SELECT d.doc_id,"
    "  CAST(coalesce(t.m, 0) AS BIGINT) AS n_chars,"
    "  coalesce(e.entropy, 0.0) AS entropy"
    " FROM documents d"
    " LEFT JOIN tot t ON t.doc_id = d.doc_id"
    " LEFT JOIN ent e ON e.doc_id = d.doc_id"
    " ORDER BY d.doc_id"
)


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup (dedup.semdedup, Abbas et al. 2023): k-means cluster
    the embedding corpus, then within-cluster cosine ≥ τ duplicate
    groups keep their min-id representative. Deterministic (k-means
    seeding and tie-breaks are order-free) → covered by the rows-only
    double-run determinism net; brute-force parity is pinned in
    tests/test_semdedup.py. No SQL twin: iterative k-means is not
    SQL-expressible at this depth."""
    from ..stages.dedup import semdedup

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    out = semdedup(emb, k=8, threshold=0.92, nb=8)
    df = (out.to_pandas().sort_values("vec_id")
          .reset_index(drop=True))
    for c in ("vec_id", "cluster", "rep"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["semdedup_embeddings"] = q_semdedup_embeddings


def q_knn_join_sample(sf_dir: str):
    """Cross-table cosine kNN join (similarity.knn_join): the 50
    lowest vec_ids probe the WHOLE embedding corpus for their top-3
    neighbors (self included at rank 1 — cosine 1). Fully oracled:
    list_dot_product cosine + row_number twin with the same rounded
    tie-break."""
    import pyarrow.dataset as pads

    from ..stages.similarity import knn_join

    right = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    left = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < 50)
    out = knn_join(left, right, k=3)
    df = (out.to_pandas().sort_values(["vec_id", "rank"])
          .reset_index(drop=True))
    for c in ("vec_id", "right_id", "rank"):
        df[c] = df[c].astype("int64")
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES["knn_join_sample"] = q_knn_join_sample

ORACLES["knn_join_sample"] = (
    "WITH l AS (SELECT vec_id,"
    "   CAST(embedding AS DOUBLE[]) AS e FROM embeddings"
    "  WHERE vec_id < 50),"
    " rr AS (SELECT vec_id,"
    "   CAST(embedding AS DOUBLE[]) AS e FROM embeddings),"
    " p AS (SELECT l.vec_id, rr.vec_id AS right_id,"
    "   round(list_dot_product(l.e, rr.e)"
    "    / (sqrt(list_dot_product(l.e, l.e))"
    "       * sqrt(list_dot_product(rr.e, rr.e))), 9) AS score"
    "  FROM l CROSS JOIN rr),"
    " rk AS (SELECT vec_id, right_id, score,"
    "   row_number() OVER (PARTITION BY vec_id"
    "    ORDER BY score DESC, right_id) AS rank FROM p)"
    " SELECT vec_id, right_id, CAST(rank AS BIGINT) AS rank, score"
    " FROM rk WHERE rank <= 3 ORDER BY vec_id, rank"
)
