"""OBO flat-file ontology ingestion → linker-native tables."""

from __future__ import annotations

import pyarrow as pa
import pytest

OBO_SAMPLE = """format-version: 1.2
ontology: uo

[Term]
id: UO:0000002
name: mass unit
is_a: UO:0000000 ! unit

[Term]
id: UO:0000022
name: milligram
synonym: "mg" EXACT []
synonym: "milligramme" RELATED []
synonym: "thousandth of a gram" NARROW []
is_a: UO:0000002 ! mass unit

[Term]
id: UO:0000099
name: old unit
is_obsolete: true
is_a: UO:0000002

[Term]
id: PATO:0000384
name: male
synonym: "M \\"sym\\"" EXACT []

[Typedef]
id: part_of
name: part of

[Term]
id: UO:9999999
! a comment line inside a stanza
name: nameless twin of nothing
"""


def test_parse_obo_terms_and_edges():
    from biosd_feature_annotator_ray.state.oboparse import (
        OBO_PURL, parse_obo)

    terms, is_a = parse_obo(OBO_SAMPLE)
    rows = {r["term_uri"]: r for r in terms.to_pylist()}
    mg = rows[OBO_PURL + "UO_0000022"]
    assert mg["label"] == "milligram"
    # EXACT + RELATED kept, NARROW dropped by default
    assert mg["synonyms"] == ["mg", "milligramme"]
    assert mg["ontology"] == "UO" and mg["is_obsolete"] is False
    # escaped quotes in synonym text
    assert rows[OBO_PURL + "PATO_0000384"]["synonyms"] == ['M "sym"']
    # obsolete term kept as a row, its edges dropped
    assert rows[OBO_PURL + "UO_0000099"]["is_obsolete"] is True
    edges = {(r["child_uri"], r["parent_uri"])
             for r in is_a.to_pylist()}
    assert (OBO_PURL + "UO_0000022", OBO_PURL + "UO_0000002") in edges
    assert not any(c.endswith("UO_0000099") for c, _ in edges)
    # Typedef skipped
    assert not any("part_of" in u for u in rows)


def test_parse_obo_feeds_linker_index_and_closure():
    from biosd_feature_annotator_ray.state.dictionaries import (
        OntologyIndex, ancestor_closure)
    from biosd_feature_annotator_ray.state.oboparse import (
        OBO_PURL, parse_obo)

    terms, is_a = parse_obo(OBO_SAMPLE)
    idx = OntologyIndex.build(terms)
    # synonym lexical match resolves to the parsed URI
    assert idx.syn_map["mg"][0][0] == OBO_PURL + "UO_0000022"
    # obsolete terms filtered at build
    assert all(u != OBO_PURL + "UO_0000099"
               for hits in idx.label_map.values() for u, _ in hits)
    closure = {(r["uri"], r["anc_uri"])
               for r in ancestor_closure(is_a).to_pylist()}
    assert (OBO_PURL + "UO_0000022", OBO_PURL + "UO_0000000") \
        in closure          # two-hop ancestor via mass unit


def test_parse_obo_from_file(tmp_path):
    from biosd_feature_annotator_ray.state.oboparse import parse_obo

    p = tmp_path / "mini.obo"
    p.write_text(OBO_SAMPLE)
    terms, _ = parse_obo(str(p))
    assert terms.num_rows == 5


def test_cli_ontoload(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    p = tmp_path / "mini.obo"
    p.write_text(OBO_SAMPLE)
    out = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray",
         "ontoload", "--obo", str(p), "--output",
         str(tmp_path / "onto")],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["terms"] == 5 and got["is_a_edges"] == 2
    t = pq.read_table(str(tmp_path / "onto" / "terms.parquet"))
    assert "term_uri" in t.column_names


def test_run_with_custom_obo_terms(tmp_path):
    from biosd_feature_annotator_ray.pipelines.annotate import (
        PipelineSpec, run)
    from biosd_feature_annotator_ray.state.oboparse import parse_obo
    from biosd_feature_annotator_ray.synth import write_pages

    terms, _ = parse_obo(OBO_SAMPLE)
    write_pages(str(tmp_path / "in"), 300, rows_per_file=150)
    man = run(str(tmp_path / "in"), str(tmp_path / "out"),
              PipelineSpec(n_buckets=4, num_parts=2), terms=terms)
    df = man.to_pandas()
    assert df["ok"].all() and df["triples"].sum() > 0
