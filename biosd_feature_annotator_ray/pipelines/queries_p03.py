"""queries part 03 — mechanical split of the original queries.py (registration order preserved; see queryreg)."""
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

ORACLES["hearst_isa"] = (
    "WITH aug AS (" + _HEARST_AUG_SQL + "),"
    " m1 AS (SELECT doc_id, unnest(regexp_extract_all(txt,  '((?:\\w+ ){0,2}\\w+) such as (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)')) AS m FROM aug), e1 AS (SELECT doc_id, unnest(regexp_split_to_array(   regexp_extract(m, '((?:\\w+ ){0,2}\\w+) such as (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 2),   ',? (?:and|or) |, ')) AS subj,  regexp_replace(regexp_extract(m, '((?:\\w+ ){0,2}\\w+) such as (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 1),   '^(?:(?:the|a|an|of|in|on|at|and|or|we|they|i|you|it|he|she|this|that|these|those|some|many|most|all|other|such|as|are|is|was|were|saw|see|like|with|for|to|from|by|has|have|had) ){0,2}', '') AS obj, 'such_as' AS pattern FROM m1),"
    " m2 AS (SELECT doc_id, unnest(regexp_extract_all(txt,  '((?:\\w+ ){0,2}\\w+) including (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)')) AS m FROM aug), e2 AS (SELECT doc_id, unnest(regexp_split_to_array(   regexp_extract(m, '((?:\\w+ ){0,2}\\w+) including (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 2),   ',? (?:and|or) |, ')) AS subj,  regexp_replace(regexp_extract(m, '((?:\\w+ ){0,2}\\w+) including (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 1),   '^(?:(?:the|a|an|of|in|on|at|and|or|we|they|i|you|it|he|she|this|that|these|those|some|many|most|all|other|such|as|are|is|was|were|saw|see|like|with|for|to|from|by|has|have|had) ){0,2}', '') AS obj, 'including' AS pattern FROM m2),"
    " m3 AS (SELECT doc_id, unnest(regexp_extract_all(txt,  '((?:\\w+ ){0,2}\\w+) especially (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)')) AS m FROM aug), e3 AS (SELECT doc_id, unnest(regexp_split_to_array(   regexp_extract(m, '((?:\\w+ ){0,2}\\w+) especially (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 2),   ',? (?:and|or) |, ')) AS subj,  regexp_replace(regexp_extract(m, '((?:\\w+ ){0,2}\\w+) especially (\\w+(?:, \\w+)*(?:,? (?:and|or) \\w+)?)', 1),   '^(?:(?:the|a|an|of|in|on|at|and|or|we|they|i|you|it|he|she|this|that|these|those|some|many|most|all|other|such|as|are|is|was|were|saw|see|like|with|for|to|from|by|has|have|had) ){0,2}', '') AS obj, 'especially' AS pattern FROM m3),"
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
