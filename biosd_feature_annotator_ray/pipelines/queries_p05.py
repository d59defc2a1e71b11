"""queries part 05 — mechanical split of the original queries.py (registration order preserved; see queryreg)."""
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
