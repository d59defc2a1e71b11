"""Schema-induction data-QA operators: inclusion-dependency (FK
candidate) profiling and candidate-key discovery (thirteenth-sitting
wave). Hand-built planted cases plus a randomized DuckDB parity fuzz
for the inclusion coefficient."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.profile import (
    candidate_keys,
    inclusion_profile,
)


def _ds(rows: dict, nparts: int = 3):
    return rd.from_arrow(pa.table(rows)).repartition(nparts)


class TestInclusionProfile:
    def test_full_containment(self):
        l = _ds({"k": [1, 2, 2, 3, 3, 3]})
        r = _ds({"j": [1, 2, 3, 4, 5]})
        out = inclusion_profile(l, "k", r, "j", nb=4).to_pylist()[0]
        assert out == {"n_left": 3, "n_right": 5, "n_overlap": 3,
                       "containment": 1.0}

    def test_partial_containment_and_nulls(self):
        # nulls excluded both sides; left distinct = {1,2,9}, overlap {1,2}
        l = _ds({"k": [1, 2, 9, None, 1]})
        r = _ds({"j": [1, 2, 3, None]})
        out = inclusion_profile(l, "k", r, "j", nb=4).to_pylist()[0]
        assert out["n_left"] == 3
        assert out["n_right"] == 3
        assert out["n_overlap"] == 2
        assert out["containment"] == pytest.approx(2 / 3, abs=1e-6)

    def test_empty_left_null_containment(self):
        l = _ds({"k": pa.array([None, None], pa.int64())}, 1)
        r = _ds({"j": [1, 2]}, 1)
        out = inclusion_profile(l, "k", r, "j", nb=4).to_pylist()[0]
        assert out["n_left"] == 0 and out["containment"] is None

    def test_string_keys(self):
        l = _ds({"k": ["a", "b", "c", "a"]})
        r = _ds({"j": ["b", "c", "d"]})
        out = inclusion_profile(l, "k", r, "j", nb=4).to_pylist()[0]
        assert out["n_overlap"] == 2 and out["n_left"] == 3

    def test_duckdb_parity_fuzz(self):
        rng = np.random.default_rng(1304)
        for trial in range(5):
            lv = rng.integers(0, 50, size=200).astype(object)
            rv = rng.integers(25, 80, size=150).astype(object)
            lv[rng.random(200) < 0.1] = None
            rv[rng.random(150) < 0.1] = None
            ldf = pd.DataFrame({"k": pd.array(lv, dtype="Int64")})
            rdf = pd.DataFrame({"j": pd.array(rv, dtype="Int64")})
            got = inclusion_profile(
                rd.from_pandas(ldf).repartition(4), "k",
                rd.from_pandas(rdf).repartition(3), "j",
                nb=8).to_pylist()[0]
            con = duckdb.connect()
            con.register("l", ldf)
            con.register("r", rdf)
            exp = con.sql(
                "SELECT (SELECT count(DISTINCT k) FROM l) AS n_left,"
                " (SELECT count(DISTINCT j) FROM r) AS n_right,"
                " (SELECT count(DISTINCT k) FROM l WHERE k IN"
                "  (SELECT j FROM r)) AS n_overlap"
            ).fetchone()
            con.close()
            assert (got["n_left"], got["n_right"], got["n_overlap"]) \
                == exp, f"trial {trial}"
            assert got["containment"] == pytest.approx(
                exp[2] / exp[0], abs=1e-6)


class TestCandidateKeys:
    def test_key_nonkey_null(self):
        t = _ds({
            "pk": [1, 2, 3, 4, 5, 6],
            "grp": [1, 1, 2, 2, 3, 3],
            "holed": [1, None, 3, 4, 5, 6],
            "dup_if_alone": [1, 2, 1, 2, 1, 2],
        })
        out = candidate_keys(
            t, [["pk"], ["grp"], ["holed"], ["grp", "dup_if_alone"]],
            nb=4).to_pandas().set_index("cols")
        assert out.loc["pk", "is_key"] == 1
        assert out.loc["pk", "n_distinct"] == 6
        # grp: 3 distinct over 6 rows
        assert out.loc["grp", "is_key"] == 0
        assert out.loc["grp", "n_distinct"] == 3
        # holed: distinct non-null tuples but a null row kills PK
        assert out.loc["holed", "is_key"] == 0
        assert out.loc["holed", "n_null_rows"] == 1
        assert out.loc["holed", "n_distinct"] == 5
        # composite (grp, dup_if_alone) is unique here
        assert out.loc["grp,dup_if_alone", "is_key"] == 1
        assert out.loc["grp,dup_if_alone", "n_distinct"] == 6

    def test_composite_null_any_column(self):
        t = _ds({"a": [1, 2, None], "b": [None, 1, 2]}, 1)
        out = candidate_keys(t, [["a", "b"]], nb=4).to_pylist()[0]
        # rows 0 and 2 each have a null somewhere -> 2 null rows,
        # 1 complete distinct tuple
        assert out["n_null_rows"] == 2
        assert out["n_distinct"] == 1
        assert out["is_key"] == 0
