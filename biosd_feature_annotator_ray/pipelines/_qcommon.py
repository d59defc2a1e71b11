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

from ..stages import textstats
from ..stages.canonicalize import (dedup_exact, distinct_counts,
                                   groupby_argmax)
from ..stages.util import as_task_fn

from .queryreg import ORACLES, QUERIES


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)

def _events(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)

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

def _setop_sides(sf_dir: str):
    import pyarrow.dataset as pads

    a = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"],
                        filter=pads.field("lang") == "en").select_columns(["doc_id"])
    b = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"],
                        filter=pads.field("label") == 0).map_batches(
        lambda t: t.select(["vec_id"]).rename_columns(["doc_id"]), batch_format="pyarrow")
    return a, b

def _bag_sides(sf_dir: str):
    a = _events(sf_dir, ["user_id"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    b = rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey"]).map_batches(
        lambda t: t.rename_columns(["id"]), batch_format="pyarrow")
    return a, b

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

_FOLD_WORDS = ["Héllo", "naïve", "Dvořák", "ÅNGSTRÖM", "ΣΟΦΌΣ",
               "piñata", "œuvre", "STRASSE", "Ćevapčići", "café",
               "plain"]

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

_URL_CANON_RE = (r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
                 r"([^/?#:@]*)(?::([0-9]*))?([/?].*)?$")

_KCORE_DEG = ("SELECT node, count(*) AS deg FROM (SELECT a AS node"
              " FROM {e} UNION ALL SELECT b FROM {e}) GROUP BY 1")

_KCORE_PEEL = ("SELECT a, b FROM {e} WHERE"
               " a IN (SELECT node FROM {d} WHERE deg >= 2)"
               " AND b IN (SELECT node FROM {d} WHERE deg >= 2)")

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

_LPA_VOTE = (
    " v{k} AS (SELECT e.dst AS node, l{p}.lab AS lab, COUNT(*) AS c"
    "  FROM e JOIN l{p} ON l{p}.node = e.src GROUP BY 1, 2),"
    " l{k} AS (SELECT node, lab FROM (SELECT node, lab, ROW_NUMBER()"
    "  OVER (PARTITION BY node ORDER BY c DESC, lab ASC) AS rn"
    "  FROM v{k}) q{k} WHERE rn = 1),"
)

_WL_ROUND = (
    " s{k} AS (SELECT e.dst AS node,"
    "  string_agg(c{p}.c, ',' ORDER BY c{p}.c) AS sig"
    "  FROM e JOIN c{p} ON c{p}.node = e.src GROUP BY 1),"
    " c{k} AS (SELECT s{k}.node, md5(c{p}.c || '|' || s{k}.sig) AS c"
    "  FROM s{k} JOIN c{p} ON c{p}.node = s{k}.node),"
)

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

_HEARST_SUFFIXES = np.array([
    " large wild mammals such as dogs, cats and foxes",
    " heavy metals including iron, zinc",
    " oaks, pines and other trees",
    " the stone fruits especially apples",
    " precious gems such as rubies or emeralds",
    "",
    "",
], dtype=object)

_HEARST_AUG_SQL = (
    "SELECT doc_id, lower(text || CASE CAST(doc_id % 7 AS INTEGER)"
    "  WHEN 0 THEN ' large wild mammals such as dogs, cats and foxes'"
    "  WHEN 1 THEN ' heavy metals including iron, zinc'"
    "  WHEN 2 THEN ' oaks, pines and other trees'"
    "  WHEN 3 THEN ' the stone fruits especially apples'"
    "  WHEN 4 THEN ' precious gems such as rubies or emeralds'"
    "  ELSE '' END) AS txt FROM documents"
)

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

_MIME_PREFIXES = [
    b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a", b"%PDF-",
    b"PK\x03\x04", b"\x1f\x8b", b"xxxxftyp", b"RIFF0000WAVE",
    b"RIFF0000WEBP", b"junkdata",
]

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

_RAKE_STOP = ("'the','a','an','and','or','of','to','in','is','are',"
              "'was','for','on','with','as','at','by','it','this',"
              "'that','be','from'")

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

_CURATE_STOP_SQL = ("'the','a','an','and','or','of','to','in','is',"
                    "'are','was','for','on','with','as','at','by','it',"
                    "'this','that','be','from'")

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

def _sm_block(lc: str, lt: str, rc: str, rt: str) -> str:
    return (
        f"SELECT '{lc}' AS l_col, '{rc}' AS r_col,"
        f" (SELECT count(DISTINCT {lc}) FROM {lt}) AS n_left,"
        f" (SELECT count(DISTINCT {rc}) FROM {rt}) AS n_right,"
        f" (SELECT count(DISTINCT {lc}) FROM {lt}"
        f"  WHERE {lc} IN (SELECT {rc} FROM {rt})) AS n_overlap"
    )

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

_N2V_DRAW1 = ("CAST(('0x' || substr(md5(CAST({n} AS VARCHAR)"
              " || ':0:1:7'), 1, 8)) AS UBIGINT)")

_N2V_DRAW2 = ("CAST(('0x' || substr(md5(CAST({n} AS VARCHAR) || ':'"
              " || CAST({p} AS VARCHAR) || ':0:2:7'), 1, 8))"
              " AS UBIGINT)")

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
