"""Bucket-shuffle dedup / distinct / argmax operators, incl. the
salted-vs-unsalted parity guarantee (SURVEY.md §7 risk 3)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.canonicalize import (
    canonicalize_annotations,
    dedup_exact,
    distinct_counts,
    groupby_argmax,
)


@pytest.fixture
def skewed_ds(ray_session):
    # Zipf-ish: key "hot" dominates (the "Homo sapiens" exercise).
    rows = []
    for i in range(2000):
        key = "hot" if i % 5 != 4 else f"cold{i}"
        rows.append({"key": key, "score": float(i % 7), "uri": f"u{i % 3}"})
    return rd.from_pandas(pd.DataFrame(rows)).repartition(8)


def test_distinct_counts(skewed_ds):
    out = distinct_counts(skewed_ds, "key", nb=4).to_pandas()
    assert out.loc[out.key == "hot", "count"].iloc[0] == 1600
    assert len(out) == 401
    assert out["count"].sum() == 2000


def test_dedup_exact(skewed_ds):
    out = dedup_exact(skewed_ds, ["key", "uri"], nb=4).to_pandas()
    assert len(out) == len(out.drop_duplicates(["key", "uri"]))
    assert set(out[out.key == "hot"].uri) == {"u0", "u1", "u2"}


def test_groupby_argmax_salted_parity(skewed_ds):
    plain = groupby_argmax(skewed_ds, ["key"], ["score", "uri"], [False, True], nb=4, salt=1)
    salted = groupby_argmax(skewed_ds, ["key"], ["score", "uri"], [False, True], nb=4, salt=4)
    p = plain.to_pandas().sort_values("key").reset_index(drop=True)[["key", "score", "uri"]]
    s = salted.to_pandas().sort_values("key").reset_index(drop=True)[["key", "score", "uri"]]
    pd.testing.assert_frame_equal(p, s)
    assert p.loc[p.key == "hot", "score"].iloc[0] == 6.0
    assert p.loc[p.key == "hot", "uri"].iloc[0] == "u0"  # tie-break: uri asc


def test_canonicalize_annotations(ray_session):
    ann = rd.from_items(
        [
            {"key": "k1", "term_uri": "u:B", "term_label": "b", "confidence": "GOOD", "score": 0.9, "provenance": "label"},
            {"key": "k1", "term_uri": "u:A", "term_label": "a", "confidence": "HIGH", "score": 1.0, "provenance": "curated"},
            {"key": "k1", "term_uri": "u:C", "term_label": "c", "confidence": "MEDIUM", "score": 0.7, "provenance": "punct"},
            {"key": "k2", "term_uri": "u:D", "term_label": "d", "confidence": "GOOD", "score": 0.85, "provenance": "synonym"},
            {"key": "k2", "term_uri": "u:C", "term_label": "c", "confidence": "GOOD", "score": 0.85, "provenance": "synonym"},
        ]
    )
    out = canonicalize_annotations(ann, nb=2, salt=2).to_pandas().sort_values("key")
    assert out.term_uri.tolist() == ["u:A", "u:C"]  # best conf; then uri asc on tie
