"""Fourth-sitting operators: unicode folding, HTML web-table
extraction, RDFS type inference."""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.functions.normalize import (
    fold_array,
    fold_text,
)
from biosd_feature_annotator_ray.stages.graph import rdfs_infer_types
from biosd_feature_annotator_ray.stages.structured import (
    extract_tables,
    table_records,
)


# ---------------------------------------------------------------- fold

def _fold_ref(s: str) -> str:
    """Scalar reference: NFC -> lower -> NFD -> drop Mn -> NFC.

    Python's str.lower() applies the contextual FINAL-SIGMA rule
    (trailing Σ -> ς); Arrow's utf8_lower and DuckDB's lower() both
    use the simple case mapping (Σ -> σ always). The kernel is
    DEFINED as DuckDB parity (that is the oracle contract), so the
    reference pre-maps Σ -> σ so lower() never sees a final sigma
    (pre-existing ς in the input stays ς on both sides)."""
    x = unicodedata.normalize("NFC", s).replace("Σ", "σ").lower()
    x = unicodedata.normalize("NFD", x)
    x = "".join(c for c in x if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFC", x)


FOLD_CASES = [
    "Héllo WÖRLD", "naïve café", "ΣΟΦΌΣ σοφός", "İstanbul ışık",
    "Ćevapčići", "ÅNGSTRÖM Å", "ñandú piñata", "œuvre Æsir",
    "ß STRASSE", "Dvořák", "á combining", "", "plain ascii 42",
]


def test_fold_matches_scalar_reference():
    got = fold_array(pa.array(FOLD_CASES)).to_pylist()
    assert got == [_fold_ref(s) for s in FOLD_CASES]


def test_fold_nulls_and_idempotence():
    arr = pa.array(["Café", None, ""])
    once = fold_array(arr)
    assert once.to_pylist() == ["cafe", None, ""]
    assert fold_array(once).to_pylist() == ["cafe", None, ""]


def test_fold_duckdb_parity():
    import duckdb

    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(FOLD_CASES)}))
    sql = [r[0] for r in con.execute(
        "SELECT strip_accents(lower(nfc_normalize(s))) FROM t"
    ).fetchall()]
    assert fold_array(pa.array(FOLD_CASES)).to_pylist() == sql


def test_fold_text_batch_wrapper():
    t = pa.table({"text": ["Dvořák"], "id": [1]})
    out = fold_text(t)
    assert out.column("text_folded").to_pylist() == ["dvorak"]
    assert out.num_columns == 3


# -------------------------------------------------------------- tables

def _cells(html: str, url: str = "u"):
    return extract_tables(pa.table({"url": [url], "html": [html]}))


def test_extract_tables_basic_header_and_body():
    c = _cells('<table><tr><th>A</th><th> B </th></tr>'
               '<tr><td>1</td><td><i>2</i></td></tr></table>')
    assert c.column("cell_text").to_pylist() == ["A", "B", "1", "2"]
    assert c.column("is_header").to_pylist() == [True, True, False,
                                                 False]
    assert c.column("row_idx").to_pylist() == [0, 0, 1, 1]
    assert c.column("col_idx").to_pylist() == [0, 1, 0, 1]


def test_extract_tables_multiple_and_none():
    c = _cells("<table><tr><td>x</td></tr></table>middle"
               "<table><tr><td>y</td></tr></table>")
    assert c.column("table_idx").to_pylist() == [0, 1]
    assert _cells("<p>no table</p>").num_rows == 0
    assert _cells("<table><tr><td>open").num_rows == 0  # unclosed
    assert _cells("").num_rows == 0


def test_extract_tables_null_and_binary_html():
    t = pa.table({"url": ["a", "b"],
                  "html": pa.array(
                      [b"<table><tr><td>bin</td></tr></table>", None],
                      pa.binary())})
    c = extract_tables(t)
    assert c.column("cell_text").to_pylist() == ["bin"]
    assert c.column("url").to_pylist() == ["a"]


def test_extract_tables_whitespace_and_tag_strip():
    c = _cells("<table><tr><td>  a\n\t <b>bold</b>  c </td></tr>"
               "</table>")
    assert c.column("cell_text").to_pylist() == ["a bold c"]


def test_table_records_header_pairing_and_fallback():
    c = _cells('<table><tr><th>Name</th></tr>'
               '<tr><td>n1</td><td>extra</td></tr></table>'
               '<table><tr><td>nohdr</td></tr></table>')
    r = table_records(c).to_pandas()
    recs = {(row.table_idx, row.col_name): row.value
            for row in r.itertuples()}
    assert recs[(0, "Name")] == "n1"
    assert recs[(0, "col_1")] == "extra"  # body wider than header
    assert recs[(1, "col_0")] == "nohdr"  # headerless table


# ---------------------------------------------------------------- rdfs

def _triples(rows):
    return rd.from_arrow(pa.Table.from_pylist(
        [{"subj": s, "pred": p, "obj": o} for s, p, o in rows]))


def _sorted_rows(ds):
    df = ds.to_pandas().sort_values(["subj", "pred", "obj"])
    return [tuple(r) for r in df.itertuples(index=False)]


def test_rdfs_diamond_hierarchy():
    out = rdfs_infer_types(_triples([
        ("B", "subClassOf", "A"), ("C", "subClassOf", "A"),
        ("D", "subClassOf", "B"), ("D", "subClassOf", "C"),
        ("x", "rdf:type", "D"),
    ]), nb=4)
    rows = _sorted_rows(out)
    typed = [o for s, p, o in rows if s == "x" and p == "rdf:type"]
    assert typed == ["A", "B", "C", "D"]  # A emitted once (dedup)


def test_rdfs_cycle_tolerated():
    out = rdfs_infer_types(_triples([
        ("A", "subClassOf", "B"), ("B", "subClassOf", "A"),
        ("x", "rdf:type", "A"),
    ]), nb=4)
    typed = [o for s, p, o in _sorted_rows(out)
             if s == "x" and p == "rdf:type"]
    assert typed == ["A", "B"]  # cycle => each other, self once


def test_rdfs_no_ontology_passthrough():
    out = rdfs_infer_types(_triples([
        ("x", "rdf:type", "A"), ("x", "rdf:type", "A"),
        ("x", "knows", "y"),
    ]), nb=4)
    assert _sorted_rows(out) == [("x", "knows", "y"),
                                 ("x", "rdf:type", "A")]


def test_rdfs_inferred_only_mode():
    out = rdfs_infer_types(_triples([
        ("B", "subClassOf", "A"), ("x", "rdf:type", "B"),
    ]), nb=4, include_original=False)
    assert _sorted_rows(out) == [("x", "rdf:type", "A")]


def test_rdfs_deep_chain():
    rows = [(f"c{k}", "subClassOf", f"c{k - 1}") for k in range(1, 12)]
    rows.append(("x", "rdf:type", "c11"))
    out = rdfs_infer_types(_triples(rows), nb=4,
                           include_original=False)
    typed = sorted(o for s, p, o in _sorted_rows(out)
                   if s == "x")
    assert typed == sorted(f"c{k}" for k in range(11))


def test_rdfs_max_classes_guard():
    with pytest.raises(ValueError, match="max_classes"):
        rdfs_infer_types(_triples([
            ("B", "subClassOf", "A"), ("C", "subClassOf", "A"),
        ]), max_classes=1)


# ------------------------------------------------------- jaccard join

from biosd_feature_annotator_ray.stages.dedup import (  # noqa: E402
    jaccard_similarity_join,
)


def _jdocs(texts):
    return rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]))


def _jpairs(ds, t, nb=4):
    df = (jaccard_similarity_join(ds, t, nb=nb).to_pandas()
          .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    return [tuple(r) for r in df.itertuples(index=False)]


def test_jaccard_join_planted():
    got = _jpairs(_jdocs([
        "a b c d",          # 0
        "a b c e",          # 1: J(0,1) = 3/5
        "x y z",            # 2
        "x y z",            # 3: J = 1
        "q",                # 4: singleton
    ]), 0.6)
    assert got == [(0, 1, 4, 4, 3, 0.6), (2, 3, 3, 3, 3, 1.0)]


def test_jaccard_join_set_semantics_and_case():
    # duplicate tokens collapse; tokens lowercase before compare
    got = _jpairs(_jdocs(["A a B b", "a b"]), 0.9)
    assert got == [(0, 1, 2, 2, 2, 1.0)]


def test_jaccard_join_empty_null_threshold_one():
    got = _jpairs(_jdocs(["", None, "k k", "k"]), 1.0)
    assert got == [(2, 3, 1, 1, 1, 1.0)]
    with pytest.raises(ValueError):
        jaccard_similarity_join(_jdocs(["a"]), 0.0)


def test_jaccard_join_fuzz_brute_force():
    import itertools
    import random

    rng = random.Random(404)
    texts = [" ".join(rng.choice("abcdefghijkl")
                      for _ in range(rng.randint(0, 9)))
             for _ in range(80)]
    for t in (0.4, 0.7):
        got = _jpairs(_jdocs(texts), t, nb=8)
        sets = [set(s.lower().split()) for s in texts]
        want = []
        for a, b in itertools.combinations(range(len(texts)), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                want.append((a, b, len(sets[a]), len(sets[b]), inter,
                             inter / (len(sets[a]) + len(sets[b])
                                      - inter)))
        assert got == want


# -------------------------------------------- page features / entities

from biosd_feature_annotator_ray.functions.textextract import (  # noqa: E402
    decode_html_entities,
)
from biosd_feature_annotator_ray.stages.structured import (  # noqa: E402
    page_features,
)


def test_page_features_counts():
    html = ('<html><p>Hi <b>w</b></p><P id=2>x</P><a href="u">l</a>'
            '<A>2</A><script>s</script><img src=y></html>')
    f = page_features(pa.table({"url": ["u"], "html": [html]}))
    row = f.to_pylist()[0]
    assert row["n_paragraphs"] == 2
    assert row["n_links"] == 2
    assert row["n_scripts"] == 1
    assert row["n_images"] == 1
    assert row["html_chars"] == len(html)
    assert row["text_chars"] == len("Hi w x l 2 s")


def test_page_features_null_binary_empty():
    t = pa.table({"url": ["a", "b", "c"],
                  "html": pa.array([b"<p>bin</p>", None, b""],
                                   pa.binary())})
    f = page_features(t).to_pylist()
    assert f[0]["n_paragraphs"] == 1 and f[0]["text_chars"] == 3
    assert f[1]["html_chars"] == 0 and f[2]["n_tags"] == 0


def test_decode_entities_core():
    t = pa.table({"text": ["&amp; &lt;x&gt; &quot;q&quot; &#65;"
                           " &#x42; caf&#233; &hellip;"]})
    got = decode_html_entities(t).column("text_decoded")[0].as_py()
    assert got == '& <x> "q" A B café …'


def test_decode_entities_single_pass_and_unknown():
    t = pa.table({"text": ["&amp;lt; stays", "&#38;gt; stays",
                           "&bogusname; kept", "&amp unterminated",
                           None, ""]})
    got = decode_html_entities(t).column("text_decoded").to_pylist()
    assert got == ["&lt; stays", "&gt; stays", "&bogusname; kept",
                   "&amp unterminated", None, ""]


def test_decode_entities_fallback_parity():
    import random

    rng = random.Random(7)
    ents = ["&amp;", "&lt;", "&gt;", "&#65;", "&#x42;", "&quot;",
            "&nope;", "&amp;lt;", "plain", " "]
    texts = ["".join(rng.choice(ents) for _ in range(rng.randint(0, 12)))
             for _ in range(60)]
    t = pa.table({"text": texts})
    a = decode_html_entities(t).column("text_decoded").to_pylist()
    b = decode_html_entities(t, max_distinct=0)\
        .column("text_decoded").to_pylist()
    assert a == b


# ----------------------------------------------- BGP optional/filter

from biosd_feature_annotator_ray.stages.graph import match_bgp  # noqa: E402


def _kg():
    rows = [("P1", "worksFor", "O1"), ("P2", "worksFor", "O1"),
            ("P3", "worksFor", "O2"), ("P1", "email", "p1@x"),
            ("O1", "locatedIn", "C1")]
    return _triples(rows)


def test_bgp_optional_null_bindings():
    out = match_bgp(_kg(), [("?p", "worksFor", "?o")],
                    optional=[("?p", "email", "?e"),
                              [("?o", "locatedIn", "?c")]],
                    nb=4).to_pandas().sort_values("p")
    got = [tuple(r) for r in out[["p", "o", "e", "c"]]
           .itertuples(index=False)]
    assert got == [("P1", "O1", "p1@x", "C1"),
                   ("P2", "O1", None, "C1"),
                   ("P3", "O2", None, None)]


def test_bgp_filter_null_is_false_and_isnull():
    base = [("?p", "worksFor", "?o")]
    opt = [("?p", "email", "?e")]
    kept = match_bgp(_kg(), base, optional=opt,
                     filters=[("?e", "contains", "@")], nb=4)
    assert kept.to_pandas()["p"].tolist() == ["P1"]
    unbound = match_bgp(_kg(), base, optional=opt,
                        filters=[("?e", "isnull", None)], nb=4)
    assert sorted(unbound.to_pandas()["p"]) == ["P2", "P3"]


def test_bgp_filter_var_var_and_ops():
    out = match_bgp(_kg(), [("?p", "worksFor", "?o")],
                    filters=[("?p", "<", "P3"), ("?o", "==", "?o")],
                    nb=4)
    assert sorted(out.to_pandas()["p"]) == ["P1", "P2"]


def test_bgp_optional_cross_product_rejected():
    with pytest.raises(ValueError, match="cross products"):
        match_bgp(_kg(), [("?p", "worksFor", "?o")],
                  optional=[("?x", "locatedIn", "?y")], nb=4)


def test_bgp_filter_validation():
    with pytest.raises(ValueError, match="unknown variable"):
        match_bgp(_kg(), [("?p", "worksFor", "?o")],
                  filters=[("?zz", "==", "x")], nb=4)
    with pytest.raises(ValueError, match="unknown filter op"):
        match_bgp(_kg(), [("?p", "worksFor", "?o")],
                  filters=[("?p", "~~", "x")], nb=4)


# -------------------------------------------------- string closure

from biosd_feature_annotator_ray.stages.graph import (  # noqa: E402
    transitive_closure,
)


def test_closure_string_nodes():
    e = pa.table({"child": ["a", "b", "x"],
                  "parent": ["b", "c", "c"]})
    out = transitive_closure(rd.from_arrow(e), nb=4).to_pandas()
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == [("a", "b"), ("a", "c"), ("b", "c"), ("x", "c")]
    assert out["node"].dtype == object  # strings stayed strings


def test_closure_string_cycle_detected():
    e = pa.table({"child": ["a", "b"], "parent": ["b", "a"]})
    with pytest.raises(ValueError, match="cycle"):
        transitive_closure(rd.from_arrow(e), nb=4).materialize()


# ----------------------------------------------------------- CDC

from biosd_feature_annotator_ray.stages.dedup import (  # noqa: E402
    cdc_chunk_docs,
    gear_chunks,
)


def test_cdc_reconstruction_and_sizes():
    import random

    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(5000))
    spans = gear_chunks(data, avg_size=64)
    assert b"".join(data[a:z] for a, z in spans) == data
    sizes = [z - a for a, z in spans]
    assert min(sizes) >= 16 and max(sizes) <= 256  # min=avg/4, max=4*avg


def test_cdc_shift_tolerance():
    import random

    rng = random.Random(9)
    base = bytes(rng.randrange(256) for _ in range(4000))
    shifted = b"XYZ-INSERT-" + base
    c1 = {base[a:z] for a, z in gear_chunks(base)}
    c2 = {shifted[a:z] for a, z in gear_chunks(shifted)}
    # insertion may only perturb the chunks touching it
    assert len(c1 & c2) >= len(c1) - 3


def test_cdc_multibyte_split_safe():
    text = "é" * 500 + "漢" * 200  # 1600 utf-8 bytes, no ascii cuts
    t = pa.table({"doc_id": [7], "text": [text]})
    out = cdc_chunk_docs(t)
    assert out.num_rows > 1  # boundaries DID land inside the doc
    joined = b"".join(out.column("chunk_bytes").to_pylist())
    assert joined.decode("utf-8") == text
    # offsets tile the byte range exactly
    df = out.to_pandas().sort_values("chunk_idx")
    assert df["start"].iloc[0] == 0
    assert (df["start"] + df["length"]).iloc[-1] == len(text.encode())


def test_cdc_cross_doc_hash_equality():
    shared = "the same paragraph " * 40
    t = pa.table({"doc_id": [1, 2], "text": [shared, shared]})
    out = cdc_chunk_docs(t).to_pandas()
    h1 = out[out.doc_id == 1].sort_values("chunk_idx")["chunk_hash"]
    h2 = out[out.doc_id == 2].sort_values("chunk_idx")["chunk_hash"]
    assert list(h1) == list(h2)


def test_cdc_param_validation_and_empty():
    with pytest.raises(ValueError, match="power of two"):
        gear_chunks(b"xx", avg_size=48)
    with pytest.raises(ValueError, match="max_size"):
        gear_chunks(b"xx", avg_size=64, min_size=32, max_size=16)
    assert gear_chunks(b"") == []
    assert cdc_chunk_docs(pa.table({"doc_id": [1], "text": [None]})
                          ).num_rows == 0


# ------------------------------------------------------------- turtle

from biosd_feature_annotator_ray.sources.ntriples import (  # noqa: E402
    parse_turtle,
    read_turtle,
    serialize_turtle,
    write_turtle,
)

_PFX = {"ex": "http://ex.test/", "sc": "http://schema.test/"}


def test_turtle_prefix_compression_and_grouping():
    t = pa.table({
        "subj": ["http://ex.test/a", "http://ex.test/a",
                 "http://other.test/x y"],
        "pred": ["http://schema.test/p1", "http://schema.test/p2",
                 "http://schema.test/p1"],
        "obj": ["lit", "http://ex.test/b", "v"],
        "obj_kind": ["string", "uri", "string"],
    })
    lines = serialize_turtle(t, _PFX, obj_kind_col="obj_kind")
    assert lines == [  # groups sort by RAW subject iri
        'ex:a sc:p1 "lit" ; sc:p2 ex:b .',
        '<http://other.test/x y> sc:p1 "v" .',
    ]


def test_turtle_longest_prefix_wins():
    pfx = {"a": "http://x.test/", "ab": "http://x.test/deep/"}
    t = pa.table({"subj": ["http://x.test/deep/n"],
                  "pred": ["http://x.test/p"],
                  "obj": ["http://x.test/deep/m"],
                  "obj_kind": ["uri"]})
    (line,) = serialize_turtle(t, pfx, obj_kind_col="obj_kind")
    assert line == "ab:n a:p ab:m ."


def test_turtle_round_trip_with_escapes(tmp_path):
    rows = [
        {"subj": "http://ex.test/e1",
         "pred": "http://schema.test/name",
         "obj": 'va"l\n\t1\\', "obj_kind": "string"},
        {"subj": "http://ex.test/e1",
         "pred": "http://schema.test/knows",
         "obj": "http://ex.test/e2", "obj_kind": "uri"},
        {"subj": "_:b0", "pred": "http://schema.test/ref",
         "obj": "_:b1", "obj_kind": "bnode"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = str(tmp_path / "ttl")
    write_turtle(ds, out, _PFX, obj_kind_col="obj_kind")
    back = (read_turtle(out, _PFX).to_pandas()
            .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    orig = (pa.Table.from_pylist(rows).to_pandas()[["subj", "pred", "obj"]]
            .sort_values(["subj", "pred", "obj"]).reset_index(drop=True))
    assert back.equals(orig)


def test_turtle_parse_rejects_bad_input():
    with pytest.raises(ValueError, match="unknown prefix"):
        parse_turtle(pa.table({"text": ["zz:a sc:p zz:b ."]}), _PFX)
    with pytest.raises(ValueError, match="prefix mismatch"):
        parse_turtle(pa.table(
            {"text": ["@prefix ex: <http://WRONG/> ."]}), _PFX)
    with pytest.raises(ValueError, match="malformed"):
        parse_turtle(pa.table({"text": ["ex:a sc:p"]}), _PFX)
