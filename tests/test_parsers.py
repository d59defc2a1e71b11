"""Parser conformance corpus (FIXTURES.md §2) — mirrors the reference's
``NumericalDataAnnotatorTest`` fixtures (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from biosd_feature_annotator_ray.functions.parsers import parse_typed_values

D = lambda s: np.datetime64(s, "us")

CORPUS = [
    # (input, kind, fields)
    ("42", "number", {"num": 42.0}),
    ("70.5", "number", {"num": 70.5}),
    ("-3.2e2", "number", {"num": -320.0}),
    ("2-5", "number_range", {"num_lo": 2.0, "num_hi": 5.0}),
    ("3.5 to 4.5", "number_range", {"num_lo": 3.5, "num_hi": 4.5}),
    ("10..20", "number_range", {"num_lo": 10.0, "num_hi": 20.0}),
    ("5-2", "number_range", {"num_lo": 2.0, "num_hi": 5.0}),  # swap rule
    ("<= 10", "number", {"num": 10.0, "note": "<="}),
    (">3", "number", {"num": 3.0, "note": ">"}),
    ("34 weeks", "number", {"num": 34.0, "unit_text": "weeks"}),
    ("20-30 mg", "number_range", {"num_lo": 20.0, "num_hi": 30.0, "unit_text": "mg"}),
    ("37 C", "number", {"num": 37.0, "unit_text": "C"}),
    ("2010-07-28", "date", {"dt": D("2010-07-28")}),
    ("28/07/2010", "date", {"dt": D("2010-07-28")}),
    ("28-Jul-2010", "date", {"dt": D("2010-07-28")}),
    ("Jul 2010", "date", {"dt": D("2010-07-01")}),
    ("2010-01-01 - 2010-12-31", "date_range", {"dt_lo": D("2010-01-01"), "dt_hi": D("2010-12-31")}),
    ("2010-01-01/2010-12-31", "date_range", {"dt_lo": D("2010-01-01"), "dt_hi": D("2010-12-31")}),
    ("1999", "date", {"dt": D("1999-01-01")}),  # year-only window rule
    ("12345", "number", {"num": 12345.0}),      # 5 digits → NOT a year
    ("1750", "number", {"num": 1750.0}),        # outside the year window
    ("Homo sapiens", "none", {}),
    ("n/a", "none", {}),
    ("", "none", {}),
    (None, "none", {}),
    ("  42  ", "number", {"num": 42.0}),        # trim before match
]


@pytest.mark.parametrize("value,kind,fields", CORPUS, ids=[repr(c[0]) for c in CORPUS])
def test_parse(value, kind, fields):
    t = parse_typed_values(pa.array([value], pa.string()))
    row = t.to_pylist()[0]
    assert row["kind"] == kind, row
    for f, expect in fields.items():
        got = row[f]
        if isinstance(expect, np.datetime64):
            assert np.datetime64(got, "us") == expect, (f, row)
        else:
            assert got == expect, (f, row)
    # fields not expected must be null
    for f in ("num", "num_lo", "num_hi", "dt", "dt_lo", "dt_hi", "unit_text", "note"):
        if f not in fields:
            assert row[f] is None or row[f] != row[f], (f, row)  # None or NaN


def test_vectorized_batch_alignment():
    vals = [c[0] for c in CORPUS]
    t = parse_typed_values(pa.array(vals, pa.string()))
    assert len(t) == len(vals)
    kinds = t.column("kind").to_pylist()
    assert kinds == [c[1] for c in CORPUS]
