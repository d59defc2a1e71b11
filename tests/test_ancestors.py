"""Ontology subsumption closure + triple ancestor expansion."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.state.dictionaries import (
    OBO, EFO, ancestor_closure, fixture_is_a)


def test_ancestor_closure_transitive_and_sorted():
    cl = ancestor_closure().to_pandas()
    anc = cl.groupby("uri")["anc_uri"].apply(set).to_dict()
    # two-hop transitivity: Homo sapiens → Homo AND Mammalia
    hs = anc[OBO + "NCBITaxon_9606"]
    assert OBO + "NCBITaxon_9605" in hs and OBO + "NCBITaxon_40674" in hs
    # diabetes mellitus → metabolic disease → disease
    dm = anc[EFO + "EFO_0000400"]
    assert {EFO + "EFO_0000589", EFO + "EFO_0000408"} <= dm
    # deterministic ordering
    assert list(cl["uri"]) == sorted(cl["uri"])


def test_ancestor_closure_cycle_raises():
    bad = pa.table({
        "child_uri": pa.array(["a", "b", "c"]),
        "parent_uri": pa.array(["b", "c", "a"]),
    })
    with pytest.raises(ValueError, match="cycle"):
        ancestor_closure(bad)


def _triples(rows):
    from biosd_feature_annotator_ray.schemas import TRIPLES

    n = len(rows)
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "obj_kind": pa.array([r[3] for r in rows], pa.string()),
        "obj_num": pa.array([None] * n, pa.float64()),
        "obj_num_hi": pa.array([None] * n, pa.float64()),
        "obj_dt": pa.array([None] * n, pa.timestamp("us")),
        "obj_dt_hi": pa.array([None] * n, pa.timestamp("us")),
        "unit_uri": pa.array([None] * n, pa.string()),
        "comparator": pa.array([None] * n, pa.string()),
        "confidence": pa.array(["HIGH"] * n, pa.string()),
        "score": pa.array([1.0] * n, pa.float32()),
    }, schema=TRIPLES))


def test_expand_ancestors_rows(ray_session):
    from biosd_feature_annotator_ray.stages.triples import expand_ancestors

    hs = OBO + "NCBITaxon_9606"
    ds = _triples([
        ("u1", "organism", hs, "uri"),
        ("u1", "tissue", "no-such-uri", "uri"),   # no ancestors → no expansion
        ("u2", "note", hs, "string"),             # not a uri row → untouched
    ])
    out = expand_ancestors(ds).to_pandas()
    got = set(zip(out["subj"], out["pred"], out["obj"]))
    assert ("u1", "organism", OBO + "NCBITaxon_9605") in got
    assert ("u1", "organism", OBO + "NCBITaxon_40674") in got
    # originals kept; non-uri and unknown-uri rows NOT expanded
    assert ("u1", "organism", hs) in got
    assert len(out) == 5
    only_new = expand_ancestors(ds, include_original=False).to_pandas()
    assert len(only_new) == 2
    assert set(only_new["obj"]) == {OBO + "NCBITaxon_9605",
                                    OBO + "NCBITaxon_40674"}


def test_annotate_pages_expand_ancestors_e2e(ray_session):
    from biosd_feature_annotator_ray.pipelines.annotate import (
        PipelineSpec, annotate_pages)
    from biosd_feature_annotator_ray.synth import gen_pages

    pages = rd.from_arrow(gen_pages(300))
    base = annotate_pages(pages, PipelineSpec(n_buckets=8)).to_pandas()
    exp = annotate_pages(pages, PipelineSpec(
        n_buckets=8, expand_ancestors=True)).to_pandas()
    # expansion is a superset: every base triple survives
    key = ["subj", "pred", "obj", "obj_kind"]
    base_keys = set(map(tuple, base[key].itertuples(index=False)))
    exp_keys = set(map(tuple, exp[key].itertuples(index=False)))
    assert base_keys <= exp_keys
    extra = exp_keys - base_keys
    assert extra, "synthetic corpus links organisms — ancestors expected"
    cl = ancestor_closure().to_pandas()
    valid_anc = set(cl["anc_uri"])
    assert all(obj in valid_anc for _, _, obj, _ in extra)
    # entailment: each extra (subj, pred, anc) has a base (subj, pred,
    # child) with anc in child's closure
    anc_of = cl.groupby("uri")["anc_uri"].apply(set).to_dict()
    for s, p, a, k in extra:
        assert k == "uri"
        assert any(bs == s and bp == p and a in anc_of.get(bo, set())
                   for bs, bp, bo, _ in base_keys)
    # no duplicate triple keys after the shared dedup
    assert len(exp_keys) == len(exp)
