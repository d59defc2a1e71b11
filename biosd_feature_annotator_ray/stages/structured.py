"""Structured-data extraction from raw HTML (graft-added, r04).

The web's machine-readable entity layer — JSON-LD blocks
(``<script type="application/ld+json">``), OpenGraph ``<meta
property=… content=…>`` tags, and HTML5 microdata ``itemprop``
attributes — is the highest-precision source of (subject, predicate,
object) triples a web-scale KG-construction pipeline has. These
kernels turn a page batch into a triple batch, row-expanding inside
one ``map_batches`` call.

Scale notes:
- Block/tag DISCOVERY is one compiled-regex pass over the batch
  (pandas ``str.findall`` — Arrow has no extract-all kernel); only
  the few small matched blocks per page reach Python ``json.loads``.
  No per-row work proportional to page size beyond the regex scan.
- All functions are stateless and embarrassingly parallel — no
  shuffle, no driver state; output rows stay inside the input block.
- Malformed JSON, non-dict roots, and over-deep nesting are dropped
  (bounded by ``max_depth``), never raised: at 10^12 documents every
  parse failure mode exists in the wild.

Value canonicalization (shared with the DuckDB oracle twin):
strings pass through; ``true``/``false``/numbers are emitted as
their JSON source text (``json.dumps``), so both sides agree on
``"true"`` and ``"1.5"``.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_JSONLD_BLOCK_RE = re.compile(
    r"""<script[^>]*type\s*=\s*["']application/ld\+json["'][^>]*>(.*?)</script>""",
    re.IGNORECASE | re.DOTALL,
)

# <meta property="og:title" content="..."> in either attribute order.
_META_PROP_RE = re.compile(
    r"""<meta\s[^>]*property\s*=\s*["']([^"']+)["'][^>]*\scontent\s*=\s*["']([^"']*)["']"""
    r"""|<meta\s[^>]*content\s*=\s*["']([^"']*)["'][^>]*\sproperty\s*=\s*["']([^"']+)["']""",
    re.IGNORECASE,
)

# Microdata: <meta itemprop=x content=y>, or <tag itemprop=x>text</tag>.
_ITEMPROP_META_RE = re.compile(
    r"""<meta\s[^>]*itemprop\s*=\s*["']([^"']+)["'][^>]*\scontent\s*=\s*["']([^"']*)["']""",
    re.IGNORECASE,
)
_ITEMPROP_TEXT_RE = re.compile(
    r"""<(?!meta\b)\w+\s[^>]*itemprop\s*=\s*["']([^"']+)["'][^>]*>([^<]*)""",
    re.IGNORECASE,
)


def _html_strings(batch: pa.Table, html_col: str) -> "object":
    """html column as a pandas string Series (binary decoded utf-8
    with replacement, nulls → ''). The bytes-vs-string decision is
    one O(1) Arrow type check, not a per-row scan."""
    col = batch.column(html_col)
    t = col.type
    s = col.to_pandas()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        s = s.map(lambda v: v.decode("utf-8", "replace")
                  if v is not None else v)
    return s.fillna("")


def _scalar(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    return json.dumps(v)


def _emit(subj: str, pred: str, v, out: list, depth: int,
          max_depth: int, ordinal: "int | None" = None) -> None:
    if isinstance(v, dict):
        if depth >= max_depth:
            return
        child = v.get("@id") if isinstance(v.get("@id"), str) else None
        if child is None:
            # per-sibling ordinal so two @id-less objects under the
            # same predicate stay distinct KG nodes (author lists etc.)
            child = f"{subj}/{pred}" if ordinal is None \
                else f"{subj}/{pred}.{ordinal}"
        out.append((subj, pred, child))
        _flatten(v, child, out, depth + 1, max_depth)
    elif isinstance(v, list):
        for idx, el in enumerate(v):
            _emit(subj, pred, el, out, depth, max_depth, ordinal=idx)
    elif v is None:
        return
    else:
        out.append((subj, pred, _scalar(v)))


def _flatten(obj: dict, subj: str, out: list, depth: int,
             max_depth: int) -> None:
    t = obj.get("@type")
    if t is not None:
        for tv in (t if isinstance(t, list) else [t]):
            if not isinstance(tv, (dict, list)):
                out.append((subj, "@type", _scalar(tv)))
    for k, v in obj.items():
        if k in ("@context", "@id", "@type"):
            continue
        _emit(subj, k, v, out, depth, max_depth)


def _roots(doc):
    """Top-level entity objects of one JSON-LD document (handles
    top-level arrays and @graph wrappers)."""
    if isinstance(doc, list):
        for d in doc:
            yield from _roots(d)
    elif isinstance(doc, dict):
        if "@graph" in doc:
            yield from _roots(doc["@graph"])
        else:
            yield doc


def extract_jsonld(batch: pa.Table, html_col: str = "html",
                   url_col: str = "url", max_depth: int = 3,
                   max_blocks: int = 16) -> pa.Table:
    """Row-expanding JSON-LD triple extraction: one output row per
    (subject, predicate, object) asserted by any
    ``application/ld+json`` block in each page.

    Subjects: the entity's ``@id`` when present, else the blank-node
    label ``_:{url}#{block}.{obj}``. ``@type`` (possibly a list)
    becomes predicate ``@type``; nested objects link via their child
    subject and recurse to ``max_depth``; lists fan out; nulls and
    unparseable blocks are dropped. Output columns:
    ``(url, subj, pred, obj)``.
    """
    html = _html_strings(batch, html_col)
    urls = batch.column(url_col).to_pylist()
    out_url: list = []
    subs: list = []
    preds: list = []
    objs: list = []
    found = html.str.findall(_JSONLD_BLOCK_RE)
    for i, blocks in enumerate(found):
        url = urls[i]
        label_base = url if url is not None else ""
        for bi, raw in enumerate(blocks[:max_blocks]):
            try:
                doc = json.loads(raw)
            except (ValueError, RecursionError):
                continue
            triples: list = []
            for oi, obj in enumerate(_roots(doc)):
                subj = obj.get("@id") if isinstance(obj.get("@id"), str) \
                    else None
                subj = subj or f"_:{label_base}#{bi}.{oi}"
                _flatten(obj, subj, triples, 0, max_depth)
            for s, p, o in triples:
                out_url.append(url)
                subs.append(s)
                preds.append(p)
                objs.append(o)
    return pa.table({
        url_col: pa.array(out_url, batch.schema.field(url_col).type),
        "subj": pa.array(subs, pa.string()),
        "pred": pa.array(preds, pa.string()),
        "obj": pa.array(objs, pa.string()),
    })


def extract_meta_properties(batch: pa.Table, html_col: str = "html",
                            url_col: str = "url",
                            prefix: str | None = "og:") -> pa.Table:
    """Row-expanding OpenGraph/meta-property extraction: one output
    row per ``<meta property=… content=…>`` tag (either attribute
    order), optionally filtered to a property prefix (default
    ``og:``). Output columns: ``(url, property, content)``.
    """
    html = _html_strings(batch, html_col)
    found = html.str.findall(_META_PROP_RE)
    keys: list = []
    vals: list = []
    counts = np.empty(len(found), dtype=np.int64)
    for i, matches in enumerate(found):
        n = 0
        for m in matches:
            # alt 1: (prop, content, '', ''); alt 2: ('', '', content, prop)
            prop, content = (m[0], m[1]) if m[0] else (m[3], m[2])
            if prefix is not None and not prop.startswith(prefix):
                continue
            keys.append(prop)
            vals.append(content)
            n += 1
        counts[i] = n
    idx = np.repeat(np.arange(len(found)), counts)
    return pa.table({
        url_col: batch.column(url_col).take(pa.array(idx)),
        "property": pa.array(keys, pa.string()),
        "content": pa.array(vals, pa.string()),
    })


def extract_microdata(batch: pa.Table, html_col: str = "html",
                      url_col: str = "url") -> pa.Table:
    """Row-expanding HTML5-microdata ``itemprop`` extraction
    (simplified: no itemscope nesting — every itemprop on a page is
    attributed to the page URL; ``<meta itemprop content>`` wins its
    attribute form, other tags contribute their immediate text up to
    the next tag, whitespace-collapsed). Output:
    ``(url, itemprop, value)``.
    """
    html = _html_strings(batch, html_col)
    meta = html.str.findall(_ITEMPROP_META_RE)
    text = html.str.findall(_ITEMPROP_TEXT_RE)
    keys: list = []
    vals: list = []
    counts = np.empty(len(html), dtype=np.int64)
    for i in range(len(html)):
        n = 0
        for k, v in meta.iat[i]:
            keys.append(k)
            vals.append(v)
            n += 1
        for k, v in text.iat[i]:
            keys.append(k)
            vals.append(" ".join(v.split()))
            n += 1
        counts[i] = n
    idx = np.repeat(np.arange(len(html)), counts)
    return pa.table({
        url_col: batch.column(url_col).take(pa.array(idx)),
        "itemprop": pa.array(keys, pa.string()),
        "value": pa.array(vals, pa.string()),
    })


_P_BLOCK_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.IGNORECASE | re.DOTALL)
_A_INNER_RE = re.compile(r"<a[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")


def _clean_text(s: str) -> str:
    return " ".join(_TAG_RE.sub(" ", s).split())


def extract_main_text(batch: pa.Table, html_col: str = "html",
                      url_col: str = "url", min_chars: int = 30,
                      max_link_pct: int = 30) -> pa.Table:
    """Readability-lite main-content extraction (the boilerplate-vs-
    content split a web-text curation pipeline runs before any
    quality scoring): take each page's ``<p>`` blocks, strip inner
    tags (tags → space, whitespace collapsed), and KEEP blocks that
    are long enough (≥ ``min_chars``) and not link farms (anchor-text
    chars ≤ ``max_link_pct``% of block text — integer arithmetic, no
    float threshold). Survivors join with ``\\n`` in document order.

    Output: ``(url, main_text, n_blocks, n_kept)``. One compiled-regex
    findall per batch column; per-block work is bounded by block
    count, same budget as the JSON-LD extractor. The SQL twin replays
    the identical regexes (RE2-compatible: non-greedy, dotall)."""
    html = _html_strings(batch, html_col)
    blocks_per = html.str.findall(_P_BLOCK_RE)
    texts: list = []
    n_blocks = np.empty(len(blocks_per), np.int32)
    n_kept = np.empty(len(blocks_per), np.int32)
    for i, blocks in enumerate(blocks_per):
        kept = []
        for b in blocks:
            text = _clean_text(b)
            link_text = _clean_text(" ".join(_A_INNER_RE.findall(b)))
            if len(text) >= min_chars and \
                    len(link_text) * 100 <= max_link_pct * len(text):
                kept.append(text)
        texts.append("\n".join(kept))
        n_blocks[i] = len(blocks)
        n_kept[i] = len(kept)
    return pa.table({
        url_col: batch.column(url_col),
        "main_text": pa.array(texts, pa.string()),
        "n_blocks": pa.array(n_blocks, pa.int32()),
        "n_kept": pa.array(n_kept, pa.int32()),
    })


_TABLE_RE = re.compile(r"<table[^>]*>(.*?)</table>",
                       re.IGNORECASE | re.DOTALL)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.IGNORECASE | re.DOTALL)
# full cell match (tag kept so th/td is decidable per cell); inner
# text re-extracted with the grouped form — both regexes are RE2-safe
# so the SQL twin replays them verbatim.
_CELL_RE = re.compile(r"<t[dh][^>]*>.*?</t[dh]>",
                      re.IGNORECASE | re.DOTALL)
_CELL_INNER_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>",
                            re.IGNORECASE | re.DOTALL)
_TH_OPEN_RE = re.compile(r"^<th", re.IGNORECASE)


def extract_tables(batch: pa.Table, html_col: str = "html",
                   url_col: str = "url") -> pa.Table:
    """Web-table → relational-facts extraction: every ``<table>`` on a
    page becomes (url, table_idx, row_idx, col_idx, is_header,
    cell_text) rows — the raw material for table-to-KG fact mining
    (header cells carry ``is_header=true`` so a downstream stage can
    pair header columns with body cells).

    Regex-structural, not a DOM parse: non-greedy ``<table>…</table>``
    blocks (NESTED tables therefore truncate at the inner close —
    documented wild-HTML tradeoff, same budget as the other kernels
    here), ``<tr>`` rows inside each block, ``<td>/<th>`` cells inside
    each row; cell text is tag-stripped and whitespace-collapsed.
    Row-expanding inside one ``map_batches`` — no shuffle, no state.
    """
    html = _html_strings(batch, html_col)
    urls = batch.column(url_col).to_pylist()
    o_url: list = []
    o_tbl: list = []
    o_row: list = []
    o_col: list = []
    o_hdr: list = []
    o_txt: list = []
    for i, doc in enumerate(html):
        for ti, tbl in enumerate(_TABLE_RE.findall(doc or "")):
            for ri, tr in enumerate(_TR_RE.findall(tbl)):
                for ci, cell in enumerate(_CELL_RE.findall(tr)):
                    m = _CELL_INNER_RE.match(cell)
                    o_url.append(urls[i])
                    o_tbl.append(ti)
                    o_row.append(ri)
                    o_col.append(ci)
                    o_hdr.append(bool(_TH_OPEN_RE.match(cell)))
                    o_txt.append(_clean_text(m.group(1) if m else ""))
    return pa.table({
        url_col: pa.array(o_url, pa.string()),
        "table_idx": pa.array(o_tbl, pa.int32()),
        "row_idx": pa.array(o_row, pa.int32()),
        "col_idx": pa.array(o_col, pa.int32()),
        "is_header": pa.array(o_hdr, pa.bool_()),
        "cell_text": pa.array(o_txt, pa.string()),
    })


def table_records(cells: pa.Table, url_col: str = "url") -> pa.Table:
    """Fold extracted table cells into (url, table_idx, row_idx,
    col_name, value) records by pairing each BODY cell with its
    table's first header row's cell at the same column position —
    missing headers fall back to ``col_<idx>``. Pure pandas merge on
    the (already small) cell set inside one task; callers at scale run
    it per-batch after :func:`extract_tables` (cells of one page never
    leave their block)."""
    df = cells.to_pandas()
    hdr = df[df["is_header"] & (df["row_idx"] == 0)]
    hdr = hdr[[url_col, "table_idx", "col_idx", "cell_text"]].rename(
        columns={"cell_text": "col_name"})
    body = df[~df["is_header"]]
    out = body.merge(hdr, on=[url_col, "table_idx", "col_idx"],
                     how="left")
    fallback = "col_" + out["col_idx"].astype(str)
    out["col_name"] = out["col_name"].fillna(fallback)
    out = out[[url_col, "table_idx", "row_idx", "col_name",
               "cell_text"]].rename(columns={"cell_text": "value"})
    return pa.Table.from_pandas(out, preserve_index=False)


def page_features(batch: pa.Table, html_col: str = "html",
                  url_col: str = "url") -> pa.Table:
    """Structural page-quality features — the cheap pre-filter a
    web-text curation pipeline runs before any model-based scoring:
    per page, integer counts of tags / anchors / scripts / images /
    paragraphs plus raw html length and tag-stripped visible-text
    length (nav-heavy, script-heavy and markup-only pages separate
    from content pages on these alone).

    Every column is a pyarrow.compute kernel over the whole batch
    (``count_substring_regex`` / ``replace_substring_regex`` /
    ``utf8_length``) — zero Python per row; the SQL twin replays the
    same RE2 patterns. Integer outputs only, so the oracle compare is
    exact. Null html counts as empty."""
    col = batch.column(html_col)
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        col = col.cast(pa.string())
    html = pc.fill_null(col, "")

    def _count(pat: str) -> pa.Array:
        return pc.count_substring_regex(html, pat).cast(pa.int32())

    text = pc.replace_substring_regex(html, "<[^>]*>", " ")
    text = pc.replace_substring_regex(text, r"\s+", " ")
    text = pc.utf8_trim_whitespace(text)
    return pa.table({
        url_col: batch.column(url_col),
        "html_chars": pc.utf8_length(html).cast(pa.int32()),
        "text_chars": pc.utf8_length(text).cast(pa.int32()),
        "n_tags": _count("<[A-Za-z][^>]*>"),
        "n_links": _count(r"(?i)<a[\s>]"),
        "n_scripts": _count(r"(?i)<script[\s>]"),
        "n_images": _count(r"(?i)<img[\s>]"),
        "n_paragraphs": _count(r"(?i)<p[\s>]"),
    })


# ---------------------------------------------------------------------------
# Semantic column-type inference (thirteenth-sitting schema induction)

# First-match-wins class chain, shared verbatim with the SQL twin
# (every pattern is RE2-compatible; (?i) for the bool literals). Order
# matters: 'int' wins over 'float' for bare digit runs, class 'empty'
# is decided before any regex (null or whitespace-only).
COLUMN_TYPE_CLASSES: "list[tuple[str, str]]" = [
    ("int", r"^[+-]?\d+$"),
    ("float", r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$"),
    ("date", r"^\d{4}-\d{2}-\d{2}$"),
    ("bool", r"^(?i)(true|false|yes|no)$"),
    ("url", r"^https?://\S+$"),
    ("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"),
]


def infer_column_types(
    ds: "object",
    col: str = "col_name",
    val: str = "value",
    nb: int = 16,
    dominant_share: float = 0.6,
) -> pa.Table:
    """Semantic type inference over a long-form ``(column, value)``
    relation — the step between ``table_records`` (extracted web-table
    cells) and KG typing: decide per column whether its values are
    ints, floats, dates, bools, urls, emails or free text, so numeric
    predicates get typed objects and FK discovery runs on the right
    columns.

    Classification is a first-match-wins RE2 chain
    (:data:`COLUMN_TYPE_CLASSES`; null/whitespace-only → ``empty``,
    no match → ``string``), applied batch-vectorized with
    ``pyarrow.compute.match_substring_regex``. The per-(column, class)
    census is map-side pre-aggregated (Arrow ``group_by`` per batch)
    so the single bucket shuffle carries at most
    |columns|×|classes| rows per batch, never cells. The dominant
    class must cover ≥ ``dominant_share`` of a column's non-empty
    values, else the column is ``mixed``; all-empty columns are
    ``empty``. Ties break to the lexicographically smallest class
    (deterministic, and replayable in SQL ``ORDER BY n DESC, cls``).

    Returns the small table ``col, inferred_type, n_nonempty,
    n_empty, share`` (share rounded to 6 dp; null for empty columns).
    """
    from .canonicalize import _add_bucket, _B

    def classify(batch: pa.Table) -> pa.Table:
        v = batch.column(val)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        cls = pa.array(np.full(len(v), "", object), pa.string())
        empty = pc.or_kleene(
            pc.is_null(v),
            pc.match_substring_regex(pc.fill_null(v, ""), r"^\s*$"))
        assigned = empty
        cls = pc.if_else(empty, "empty", cls)
        safe = pc.fill_null(v, "")
        for name, pat in COLUMN_TYPE_CLASSES:
            m = pc.and_(pc.invert(assigned),
                        pc.match_substring_regex(safe, pat))
            cls = pc.if_else(m, name, cls)
            assigned = pc.or_(assigned, m)
        cls = pc.if_else(assigned, cls, "string")
        t = pa.table({"col": batch.column(col), "cls": cls,
                      "n": pa.array(np.ones(len(v), np.int64))})
        g = t.group_by(["col", "cls"]).aggregate([("n", "sum")])
        g = g.rename_columns(["col", "cls", "n"])
        return _add_bucket(g, ["col"], nb)

    def finish(group: pa.Table) -> pa.Table:
        g = (group.drop_columns([_B])
             .group_by(["col", "cls"]).aggregate([("n", "sum")]))
        df = g.to_pandas().rename(columns={"n_sum": "n"})
        rows = []
        for c, sub in df.groupby("col", sort=False):
            n_empty = int(sub.loc[sub["cls"] == "empty", "n"].sum())
            ne = sub[sub["cls"] != "empty"]
            n_nonempty = int(ne["n"].sum())
            if n_nonempty == 0:
                rows.append((c, "empty", 0, n_empty, None))
                continue
            ne = ne.sort_values(["n", "cls"],
                                ascending=[False, True])
            top_cls = ne.iloc[0]["cls"]
            top_n = int(ne.iloc[0]["n"])
            share = top_n / n_nonempty
            inferred = top_cls if share >= dominant_share else "mixed"
            rows.append((c, inferred, n_nonempty, n_empty,
                         round(share, 6)))
        return pa.table({
            "col": pa.array([r[0] for r in rows], pa.string()),
            "inferred_type": pa.array([r[1] for r in rows], pa.string()),
            "n_nonempty": pa.array([r[2] for r in rows], pa.int64()),
            "n_empty": pa.array([r[3] for r in rows], pa.int64()),
            "share": pa.array([r[4] for r in rows], pa.float64()),
        })

    out = (ds.map_batches(classify, batch_format="pyarrow",
                          batch_size=65536)
           .groupby(_B).map_groups(finish, batch_format="pyarrow")
           .to_pandas().sort_values("col").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def table_to_triples(
    ds: "object",
    subject_col: str,
    value_cols: "list[str]",
    type_map: "dict[str, str] | None" = None,
    pred_prefix: str = "",
) -> "object":
    """R2RML-lite direct mapping: turn a WIDE extracted-web-table
    relation into typed KG triples ``(subj, pred, obj, obj_kind)`` —
    the step after :func:`infer_column_types` decides what each column
    holds. One triple per (row, value column); the predicate is the
    column name (optionally prefixed with a vocabulary namespace).

    Typing contract (replayable in SQL): ``obj_kind`` is the column's
    inferred type from ``type_map`` — but only for values that
    actually MATCH that type's regex (:data:`COLUMN_TYPE_CLASSES`);
    a non-conforming non-empty value ("n/a" in a float column)
    degrades to ``string`` for that row, so a numeric predicate never
    carries an unparseable lexical form. Columns typed ``string`` /
    ``mixed`` (or absent from the map) emit ``string``. Null or
    whitespace-only cells emit NO triple (SQL direct mapping drops
    NULLs). Subjects are the Arrow cast-to-string of ``subject_col``.

    Scale shape: pure row-local expansion inside one ``map_batches``
    (one vectorized regex + filter per column), no shuffle, no driver
    state; ``type_map`` is a tiny per-column dict captured in the
    closure (broadcast once with the function, never per batch).
    """
    tmap = dict(type_map or {})
    class_re = dict(COLUMN_TYPE_CLASSES)

    def expand(batch: pa.Table) -> pa.Table:
        subj = pc.cast(batch.column(subject_col), pa.string())
        outs = []
        for c in value_cols:
            v = batch.column(c)
            if not pa.types.is_string(v.type) and not pa.types.is_large_string(v.type):
                v = pc.cast(v, pa.string())
            nonempty = pc.and_(
                pc.is_valid(v),
                pc.invert(pc.match_substring_regex(
                    pc.fill_null(v, ""), r"^\s*$")))
            kind_name = tmap.get(c, "string")
            pat = class_re.get(kind_name)
            if pat is None:
                kind = pa.array(
                    np.full(len(v), "string", object), pa.string())
            else:
                conform = pc.match_substring_regex(
                    pc.fill_null(v, ""), pat)
                kind = pc.if_else(conform, kind_name, "string")
            t = pa.table({
                "subj": subj,
                "pred": pa.array(
                    np.full(len(v), pred_prefix + c, object),
                    pa.string()),
                "obj": pc.cast(v, pa.string()),
                "obj_kind": kind,
            })
            outs.append(t.filter(nonempty))
        return pa.concat_tables(outs)

    return ds.map_batches(expand, batch_format="pyarrow",
                          batch_size=65536)
