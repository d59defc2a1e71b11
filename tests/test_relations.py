"""Hearst-pattern relation extraction (r04 seventh sitting)."""

from __future__ import annotations

import pyarrow as pa

from biosd_feature_annotator_ray.stages.relations import extract_hearst


def _t(rows):
    return pa.Table.from_pylist(rows)


def _triples(out):
    return sorted(zip(out.column("doc_id").to_pylist(),
                      out.column("subj").to_pylist(),
                      out.column("obj").to_pylist(),
                      out.column("pattern").to_pylist()))


def test_such_as_list():
    out = extract_hearst(_t([
        {"doc_id": 1,
         "text": "we saw mammals such as dogs, cats and foxes today"}]))
    assert _triples(out) == [
        (1, "cats", "mammals", "such_as"),
        (1, "dogs", "mammals", "such_as"),
        (1, "foxes", "mammals", "such_as"),
    ]
    assert out.column("pred").to_pylist() == ["isa"] * 3


def test_including_and_especially():
    out = extract_hearst(_t([
        {"doc_id": 2, "text": "metals including iron, zinc"},
        {"doc_id": 3, "text": "fruits especially apples"}]))
    assert _triples(out) == [
        (2, "iron", "metals", "including"),
        (2, "zinc", "metals", "including"),
        (3, "apples", "fruits", "especially"),
    ]


def test_and_other_reversed_roles():
    out = extract_hearst(_t([
        {"doc_id": 4, "text": "oaks, pines and other trees grow"}]))
    assert _triples(out) == [
        (4, "oaks", "trees", "and_other"),
        (4, "pines", "trees", "and_other"),
    ]


def test_or_list_and_case_fold():
    out = extract_hearst(_t([
        {"doc_id": 5, "text": "Gems such as Rubies or Emeralds"}]))
    assert _triples(out) == [
        (5, "emeralds", "gems", "such_as"),
        (5, "rubies", "gems", "such_as"),
    ]


def test_multiple_matches_per_doc_and_no_match():
    out = extract_hearst(_t([
        {"doc_id": 6,
         "text": ("birds such as crows live here. "
                  "metals including tin are mined.")},
        {"doc_id": 7, "text": "no pattern in this text"},
        {"doc_id": 8, "text": None},
    ]))
    assert _triples(out) == [
        (6, "crows", "birds", "such_as"),
        (6, "tin", "metals", "including"),
    ]


def test_empty_batch_schema():
    out = extract_hearst(_t([{"doc_id": 9, "text": "plain words"}]))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "subj", "pred", "obj",
                                "pattern"]
