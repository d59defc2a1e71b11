"""Opt-in fuzzy linking tier + sink-path ancestor expansion parity."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from biosd_feature_annotator_ray.state.dictionaries import (
    OBO, OntologyIndex, fixture_curated_mappings, fixture_ontology_terms)


def _index():
    return OntologyIndex.build(fixture_ontology_terms(),
                               fixture_curated_mappings())


def test_fuzzy_lookup_matches_misspellings():
    idx = _index()
    # default: a typo misses every exact tier
    assert idx.lookup("organism", "homo sapens") is None
    hit = idx.lookup("organism", "homo sapens", fuzzy=True)
    assert hit is not None
    uri, label, conf, score, prov = hit
    assert uri == OBO + "NCBITaxon_9606" and conf == "LOW" and prov == "fuzzy"
    assert abs(score - 0.35) < 1e-9  # d=1 → 0.45 − 0.1
    # short values get the tighter d ≤ 1 bound: a 2-edit corruption of
    # a short value must NOT match ('mwlw' is 2 subs from 'male')
    assert idx.lookup("u", "mwlw", fuzzy=True) is None
    # d < len(value): a 1-char value can't fuzzy-match anything 1 edit away
    assert idx.lookup("x", "q", fuzzy=True) is None


def test_fuzzy_batch_scalar_parity():
    idx = _index()
    vals = ["homo sapens", "mus musclus", "diabetis", "zzzz qqqq", "liver"]
    cts = ["organism"] * len(vals)
    u, lb, cf, sc, pv = idx.lookup_batch(
        pa.array(cts), pa.array(vals), fuzzy=True)
    for i, v in enumerate(vals):
        want = idx.lookup("organism", v, fuzzy=True)
        if want is None:
            assert u[i] is None
        else:
            assert (u[i], lb[i], cf[i], float(sc[i]), pv[i]) == \
                (want[0], want[1], want[2], want[3], want[4])


def test_fuzzy_off_by_default_does_not_change_links():
    idx = _index()
    u, *_ = idx.lookup_batch(pa.array(["organism"]),
                             pa.array(["homo sapens"]))
    assert u[0] is None


def test_run_sink_expand_ancestors_parity(ray_session, tmp_path):
    """run() (checkpointed sink) with expand_ancestors=True must emit
    the same triple keys as the annotate_pages path — partition-local
    expansion commutes with the partition split."""
    import pyarrow.parquet as pq

    from biosd_feature_annotator_ray.pipelines.annotate import (
        PipelineSpec, annotate_pages, run)
    from biosd_feature_annotator_ray.synth import gen_pages, write_pages

    in_dir = str(tmp_path / "pages")
    # single shard: write_pages content == gen_pages(300) exactly
    write_pages(in_dir, 300, rows_per_file=300)
    spec = PipelineSpec(n_buckets=8, num_parts=4, expand_ancestors=True)
    run(in_dir, str(tmp_path / "out"), spec)
    import glob

    got = pa.concat_tables([
        pq.read_table(f, columns=["subj", "pred", "obj", "obj_kind"])
        for f in glob.glob(str(tmp_path / "out" / "triples" / "*" / "*.parquet"))
    ]).to_pandas()
    api = annotate_pages(rd.from_arrow(gen_pages(300)),
                         PipelineSpec(n_buckets=8, expand_ancestors=True)
                         ).to_pandas()[["subj", "pred", "obj", "obj_kind"]]
    key = lambda df: set(map(tuple, df.itertuples(index=False)))
    assert key(got) == key(api)
    # sanity: expansion actually happened (some ancestor URI present)
    from biosd_feature_annotator_ray.state.dictionaries import ancestor_closure

    ancs = set(ancestor_closure().to_pandas()["anc_uri"])
    assert any(o in ancs for o in got["obj"])
