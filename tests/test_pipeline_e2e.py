"""E2E golden run (FIXTURES.md §4): 1000 synthetic pages → triples,
compared order-insensitively against tests/golden/triples_v1.parquet.
P=R=1.0 at fixture scale per SURVEY.md §5.2."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "triples_v1.parquet")
KEY = ["subj", "pred", "obj", "obj_kind"]


@pytest.fixture(scope="module")
def triples(ray_session):
    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.synth import gen_pages

    pages = rd.from_arrow(gen_pages(1000))
    return annotate_pages(pages, PipelineSpec(n_buckets=8)).to_pandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEY).reset_index(drop=True)


def test_matches_golden(triples):
    golden = _norm(pq.read_table(GOLDEN).to_pandas())
    got = _norm(triples)
    assert len(got) == len(golden)
    got_set = set(map(tuple, got[KEY].itertuples(index=False)))
    gold_set = set(map(tuple, golden[KEY].itertuples(index=False)))
    tp = len(got_set & gold_set)
    precision = tp / max(1, len(got_set))
    recall = tp / max(1, len(gold_set))
    assert precision == 1.0 and recall == 1.0, (precision, recall)
    # full-column equality too (values, confidences, typed sidecars)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), golden.reset_index(drop=True), check_dtype=False
    )


def test_no_duplicate_triples(triples):
    assert not triples.duplicated(KEY).any()


def test_hot_key_single_canonical_uri(triples):
    """'Homo sapiens' (on ~40% of pages) canonicalizes to exactly one URI."""
    hs = triples[(triples.pred == "organism") & (triples.obj_kind == "uri")]
    hs_subjects = triples[(triples.pred == "organism")]
    uris = set(hs.obj)
    assert "http://purl.obolibrary.org/obo/NCBITaxon_9606" in uris
    # every organism|homo sapiens mention resolved to the SAME uri
    assert len(hs[hs.obj.str.contains("NCBITaxon_9606")]) > 300  # hot key present
    assert len(hs_subjects) > 0


def test_typed_triples_present(triples):
    kinds = set(triples.obj_kind)
    assert {"uri", "number", "number_range", "date", "string"} <= kinds


def test_unit_uris_linked(triples):
    weeks = triples[(triples.obj_kind == "number") & (triples.unit_uri.notna())]
    assert "http://purl.obolibrary.org/obo/UO_0000034" in set(weeks.unit_uri)  # week


def test_obsolete_never_wins(triples):
    assert not triples.obj.str.contains("EFO_OBS01").any()


def test_empty_and_mention_free_inputs(ray_session):
    """Edge: empty pages and pages with no characteristic mentions both
    yield an empty triples dataset (no schema-loss crashes)."""
    import pyarrow as pa

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.schemas import PAGES

    spec = PipelineSpec(n_buckets=4)
    assert annotate_pages(rd.from_arrow(PAGES.empty_table()), spec).count() == 0
    pages = pa.table(
        {"url": ["u1"], "warc_ts": pa.array([0], pa.timestamp("us", tz="UTC")),
         "html": pa.array([None], pa.binary()),
         "text": pa.array(["no mentions here"], pa.large_string()), "lang": ["en"]},
        schema=PAGES)
    assert annotate_pages(rd.from_arrow(pages), spec).count() == 0


def test_comparator_distinguishes_bound_from_exact(ray_session):
    """Regression: '<5' used to emit (and dedup) as the exact number 5.
    The comparator survives to the triple and is part of its identity."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.schemas import PAGES

    pages = pa.table({
        "url": pa.array(["http://x/1"], pa.string()),
        "warc_ts": pa.array([pd.Timestamp("2024-01-01")], PAGES.field("warc_ts").type),
        "html": pa.nulls(1, pa.binary()),
        "text": pa.array(["age: <5\nage: 5"], pa.large_string()),
        "lang": pa.array(["en"], pa.string()),
    }, schema=PAGES)
    out = annotate_pages(rd.from_arrow(pages), PipelineSpec(n_buckets=4)).to_pandas()
    nums = out[out.obj_kind == "number"].sort_values("comparator", na_position="last")
    assert len(nums) == 2
    assert nums["comparator"].tolist()[0] == "<"
    assert pd.isna(nums["comparator"].tolist()[1])
    assert (nums["obj_num"] == 5.0).all()


def test_whitespace_value_lines_emit_nothing(ray_session):
    """Regression: 'age: ' section headers matched the mention regex
    with a single-space value and emitted junk string triples."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.schemas import PAGES

    pages = pa.table({
        "url": pa.array(["http://x/1"], pa.string()),
        "warc_ts": pa.array([pd.Timestamp("2024-01-01")], PAGES.field("warc_ts").type),
        "html": pa.nulls(1, pa.binary()),
        "text": pa.array(["age: \nsex:   \nage: 7"], pa.large_string()),
        "lang": pa.array(["en"], pa.string()),
    }, schema=PAGES)
    out = annotate_pages(rd.from_arrow(pages), PipelineSpec(n_buckets=4)).to_pandas()
    assert (out["obj"] != "").all()
    assert len(out[out.obj_kind == "number"]) == 1


def test_custom_type_vocab_is_normalized(ray_session):
    """Regression: an un-normalized custom vocab silently matched
    nothing (normalized detected types never equal 'Organism')."""
    import pyarrow as pa

    from biosd_feature_annotator_ray.stages.mentions import detect_mentions

    batch = pa.table({"url": ["u"], "text": ["Organism: Homo sapiens"]})
    out = detect_mentions(batch, type_vocab=("Organism",))
    assert len(out) == 1 and out.column("char_type")[0].as_py() == "organism"
