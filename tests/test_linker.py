"""Linking conformance corpus (FIXTURES.md §3) — mirrors the
reference's ZOOMA lexical-match tests (SURVEY.md §5.1)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from biosd_feature_annotator_ray.functions.normalize import norm_str
from biosd_feature_annotator_ray.state.dictionaries import (
    OBO,
    EFO,
    OntologyIndex,
    fixture_curated_mappings,
    fixture_ontology_terms,
)

CORPUS = [
    ("organism", "Homo sapiens", OBO + "NCBITaxon_9606", "HIGH"),
    ("organism", "homo  sapiens", OBO + "NCBITaxon_9606", "HIGH"),  # normalize → curated
    ("organism", "human", OBO + "NCBITaxon_9606", "GOOD"),          # synonym
    ("organism", "Mus musculus", OBO + "NCBITaxon_10090", "GOOD"),  # label
    ("disease", "diabetes", EFO + "EFO_0000400", "GOOD"),           # synonym
    ("disease", "t2d", EFO + "EFO_0000400", "HIGH"),                # curated
    ("sex", "M", OBO + "PATO_0000384", "GOOD"),                     # synonym
    ("sex", "female", OBO + "PATO_0000383", "GOOD"),                # label
    ("organism part", "hepatic tissue.", EFO + "EFO_0001265", "MEDIUM"),  # punct-strip
    ("(unit)", "weeks", OBO + "UO_0000034", "GOOD"),
    ("(unit)", "mg", OBO + "UO_0000022", "GOOD"),
    ("organism", "old term", None, None),                           # obsolete filtered
    ("treatment", "xyzzy compound", None, None),                    # no tier
    ("organism", "sapiens homo", OBO + "NCBITaxon_9606", "MEDIUM"), # token-set tier
    ("organism", "NCBITaxon:9606", OBO + "NCBITaxon_9606", "HIGH"), # J2 resolver
    ("organism", "ncbitaxon_9606", OBO + "NCBITaxon_9606", "HIGH"), # J2 resolver (underscore)
    ("disease", "EFO_0000400", EFO + "EFO_0000400", "HIGH"),        # J2 resolver (EFO)
    ("organism", "EFO_OBS01", None, None),                          # resolver never returns obsolete
]


@pytest.fixture(scope="module")
def index():
    return OntologyIndex.build(fixture_ontology_terms(), fixture_curated_mappings())


@pytest.mark.parametrize("ctype,value,uri,conf", CORPUS, ids=[f"{c[0]}|{c[1]}" for c in CORPUS])
def test_lookup(index, ctype, value, uri, conf):
    hit = index.lookup(norm_str(ctype), norm_str(value))
    if uri is None:
        assert hit is None
    else:
        assert hit is not None
        assert hit[0] == uri
        assert hit[2] == conf


def test_linker_actor_batch(ray_session):
    from biosd_feature_annotator_ray.stages.linker import LinkerActor

    actor = LinkerActor()
    batch = pa.table({"key": ["organism|homo sapiens", "organism|human", "treatment|xyzzy compound"]})
    out = actor(batch)
    assert out.column("key").to_pylist() == ["organism|homo sapiens", "organism|human"]
    assert out.column("confidence").to_pylist() == ["HIGH", "GOOD"]
    # memo cache exercised on repeat
    actor(batch)
    assert actor.stats["cache_hits"] > 0


def test_sharded_linker_matches_single_index(ray_session):
    """ST4 big-dictionary path: hash-sharded actors merge to EXACTLY the
    single-index result (tier scores are strictly ordered)."""
    from biosd_feature_annotator_ray.functions.normalize import KEY_SEP
    from biosd_feature_annotator_ray.stages.linker import LinkerActor, ShardedLinker

    keys = pa.table({"key": [f"{norm_str(t)}{KEY_SEP}{norm_str(v)}"
                             for t, v, _, _ in CORPUS]})
    single = LinkerActor.local()(keys).to_pylist()
    sharded = ShardedLinker(num_shards=3)(keys).to_pylist()
    assert single == sharded
    assert len(single) > 0


def test_tie_break_deterministic():
    """Two terms sharing a synonym → uri-ascending winner."""
    terms = pa.table(
        {
            "term_uri": ["u:B", "u:A"],
            "label": ["b label", "a label"],
            "synonyms": [["shared"], ["shared"]],
            "ontology": ["x", "x"],
            "is_obsolete": [False, False],
        }
    )
    idx = OntologyIndex.build(terms)
    assert idx.lookup("t", "shared")[0] == "u:A"


def test_lookup_batch_matches_scalar(index):
    """The vectorized pc.index_in tier cascade must agree with the
    scalar lookup on every conformance-corpus key plus fuzz strings."""
    extra = ["", " ", "||", "with|pipe", "männlich", "9606", ":::", "a b c d e"]
    cts = [norm_str(c) for c, v, _, _ in CORPUS] + ["x"] * len(extra)
    vals = [norm_str(v) for c, v, _, _ in CORPUS] + extra
    u, lb, cf, sc, pv = index.lookup_batch(pa.array(cts), pa.array(vals))
    for i, (ct, v) in enumerate(zip(cts, vals)):
        want = index.lookup(ct, v)
        got = None if u[i] is None else (u[i], lb[i], cf[i], float(sc[i]), pv[i])
        assert got == want, (ct, v, got, want)
