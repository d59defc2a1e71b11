"""Mention-detection fixture lines (FIXTURES.md §5)."""

from __future__ import annotations

import pyarrow as pa

from biosd_feature_annotator_ray.stages.mentions import detect_mentions


def _detect(text: str):
    t = detect_mentions(pa.table({"url": ["u"], "text": [text]}))
    return [(r["char_type"], r["value_text"]) for r in t.to_pylist()]


def test_fixture_lines():
    assert _detect("organism: Homo sapiens") == [("organism", "Homo sapiens")]
    assert _detect("Age: 34 weeks") == [("age", "34 weeks")]
    assert _detect("temperature : 37 C") == [("temperature", "37 C")]
    assert _detect("collection date: 2010-07-28") == [("collection date", "2010-07-28")]
    assert _detect("no colon here") == []
    assert _detect("sex:F") == [("sex", "F")]
    assert _detect("depth: 10..20") == [("depth", "10..20")]


def test_vocab_precision_guard():
    assert _detect("random: thing") == []  # type not in vocabulary
    assert _detect("ORGANISM: mouse") == [("organism", "mouse")]  # normalized type


def test_multiline_and_spans():
    t = detect_mentions(pa.table({"url": ["u"], "text": ["organism: Homo sapiens\nsex:F"]}))
    rows = t.to_pylist()
    assert rows[0]["span_start"] == 0 and rows[0]["span_end"] == 22
    assert rows[1]["span_start"] == 23
    assert t.column("key").to_pylist() == ["organism|homo sapiens", "sex|f"]


def test_null_and_empty_text():
    t = detect_mentions(pa.table({"url": ["a", "b"], "text": [None, ""]}))
    assert len(t) == 0
