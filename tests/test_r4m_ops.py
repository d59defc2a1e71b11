"""Thirteenth-sitting wave 5: join cardinality estimation (the
planner probe) and the declarative expectations data-quality gate."""

from __future__ import annotations

import random

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.join import (
    join_cardinality_estimate)
from biosd_feature_annotator_ray.stages.profile import (
    expectations_report)


def _ref_cardinality(lk, rk, top=5):
    """Brute-force reference: actually run the join."""
    lc = pd.Series([k for k in lk if k is not None]).value_counts()
    rc = pd.Series([k for k in rk if k is not None]).value_counts()
    common = lc.index.intersection(rc.index)
    rows = {str(k): int(lc[k]) * int(rc[k]) for k in common}
    order = sorted(rows, key=lambda k: (-rows[k], k))[:top]
    return (sum(rows.values()), len(rows),
            max(rows.values(), default=0),
            "|".join(f"{k}:{rows[k]}" for k in order))


def test_join_cardinality_matches_real_join_fuzz():
    rng = random.Random(113)
    for trial in range(4):
        lk = [rng.randrange(12) if rng.random() > 0.1 else None
              for _ in range(300)]
        rk = [rng.randrange(12) if rng.random() > 0.1 else None
              for _ in range(200)]
        l = rd.from_arrow(pa.table({"k": pa.array(lk, pa.int64())}))
        r = rd.from_arrow(pa.table({"k": pa.array(rk, pa.int64())}))
        got = join_cardinality_estimate(l, r, "k", nb=4).to_pylist()[0]
        est, nk, mx, top = _ref_cardinality(lk, rk)
        assert got["est_rows"] == est
        assert got["n_common_keys"] == nk
        assert got["max_key_rows"] == mx
        assert got["top_keys"] == top
        # the estimate IS the real inner-join cardinality
        real = pd.merge(pd.DataFrame({"k": lk}).dropna(),
                        pd.DataFrame({"k": rk}).dropna(), on="k")
        assert got["est_rows"] == len(real)


def test_join_cardinality_composite_key_and_empty():
    l = rd.from_arrow(pa.table({
        "a": pa.array([1, 1, 2, None], pa.int64()),
        "b": pa.array(["x", "x", "y", "x"])}))
    r = rd.from_arrow(pa.table({
        "a": pa.array([1, 1, 3], pa.int64()),
        "b": pa.array(["x", "x", "z"])}))
    got = join_cardinality_estimate(
        l, r, ["a", "b"], nb=2).to_pylist()[0]
    # (1,x): 2*2 = 4; null keys never match
    assert got["est_rows"] == 4
    assert got["n_common_keys"] == 1
    assert got["max_key_rows"] == 4
    assert got["top_keys"] == "1,x:4"
    # disjoint keys -> zero everywhere, empty top
    r2 = rd.from_arrow(pa.table({
        "a": pa.array([9], pa.int64()), "b": pa.array(["q"])}))
    got = join_cardinality_estimate(
        l, r2, ["a", "b"], nb=2).to_pylist()[0]
    assert got == {"est_rows": 0, "n_common_keys": 0,
                   "max_key_rows": 0, "top_keys": ""}


def test_join_cardinality_top_truncates_deterministically():
    lk = [i // 3 for i in range(30)]       # keys 0..9, 3 rows each
    l = rd.from_arrow(pa.table({"k": pa.array(lk, pa.int64())}))
    got = join_cardinality_estimate(l, l, "k", nb=3,
                                    top=4).to_pylist()[0]
    # every key contributes 9; ties broken by key string asc
    assert got["est_rows"] == 90 and got["max_key_rows"] == 9
    assert got["top_keys"] == "0:9|1:9|2:9|3:9"


# --- expectations_report ----------------------------------------------------

def test_expectations_report_all_rules():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 5, None], pa.int64()),
        "status": pa.array(["O", "F", "P", "X", None, "O", "F"]),
        "price": pa.array([10.0, -5.0, 50.0, None, 999.0, 20.0, 30.0]),
    })
    ds = rd.from_arrow(t).repartition(3)
    rules = [
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
        {"rule": "accepted_values", "col": "status",
         "values": ["O", "F", "P"]},
        {"rule": "in_range", "col": "price", "lo": 0.0, "hi": 100.0},
    ]
    got = expectations_report(ds, rules, nb=2).to_pylist()
    assert got[0] == {"rule": "not_null", "col": "id",
                      "n_checked": 7, "violations": 1, "ok": False}
    # unique: nulls exempt -> 6 checked; the two 5s both violate
    assert got[1] == {"rule": "unique", "col": "id",
                      "n_checked": 6, "violations": 2, "ok": False}
    # accepted_values: null exempt -> 6 checked; 'X' violates
    assert got[2] == {"rule": "accepted_values", "col": "status",
                      "n_checked": 6, "violations": 1, "ok": False}
    # in_range: null exempt -> 6 checked; -5 and 999 violate
    assert got[3] == {"rule": "in_range", "col": "price",
                      "n_checked": 6, "violations": 2, "ok": False}


def test_expectations_report_clean_table_and_order():
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([0.5, 0.7, 0.9])})
    rules = [
        {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 1.0},
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
    ]
    got = expectations_report(rd.from_arrow(t), rules,
                              nb=2).to_pylist()
    assert [r["rule"] for r in got] == ["in_range", "not_null",
                                        "unique"]
    assert all(r["ok"] and r["violations"] == 0 for r in got)
    assert all(r["n_checked"] == 3 for r in got)


def test_expectations_report_unknown_rule_raises():
    ds = rd.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="unknown rule"):
        expectations_report(ds, [{"rule": "positive", "col": "x"}])
