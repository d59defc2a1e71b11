"""Table→KG mapping operators (thirteenth-sitting wave): R2RML-lite
wide-table direct mapping, one-pass all-pairs schema matching, and the
per-predicate dangling-edge census. Planted cases plus randomized
parity fuzzes (inclusion_matrix ≡ per-pair inclusion_profile;
referential_integrity vs DuckDB NOT EXISTS)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import referential_integrity
from biosd_feature_annotator_ray.stages.profile import (
    inclusion_matrix,
    inclusion_profile,
)
from biosd_feature_annotator_ray.stages.structured import table_to_triples


def _ds(rows: dict, nparts: int = 3):
    return rd.from_arrow(pa.table(rows)).repartition(nparts)


class TestTableToTriples:
    def test_typed_mapping_and_skips(self):
        ds = _ds({
            "pk": [1, 2, 3],
            "age": ["10", "n/a", None],       # int column, 1 dirty
            "site": ["https://a.test", "  ", "https://b.test"],
            "note": ["x", "y", "z"],
        }, 2)
        out = table_to_triples(
            ds, "pk", ["age", "site", "note"],
            type_map={"age": "int", "site": "url"},
            pred_prefix="ex:",
        ).to_pandas().sort_values(["pred", "subj"]).reset_index(drop=True)
        got = set(map(tuple, out.itertuples(index=False)))
        assert got == {
            ("1", "ex:age", "10", "int"),
            ("2", "ex:age", "n/a", "string"),   # non-conforming -> string
            ("1", "ex:site", "https://a.test", "url"),
            ("3", "ex:site", "https://b.test", "url"),
            ("1", "ex:note", "x", "string"),
            ("2", "ex:note", "y", "string"),
            ("3", "ex:note", "z", "string"),
        }
        # null and whitespace-only cells emitted nothing
        assert len(out) == 7

    def test_numeric_subject_and_untyped_column(self):
        ds = _ds({"k": [10, 20], "v": ["1.5", "2.5"]}, 1)
        out = table_to_triples(ds, "k", ["v"]).to_pandas()
        assert sorted(out["subj"]) == ["10", "20"]
        assert set(out["obj_kind"]) == {"string"}  # no type_map entry


class TestInclusionMatrix:
    def test_matches_per_pair_profile(self):
        rng = np.random.default_rng(77)
        l = pd.DataFrame({
            "a": rng.integers(0, 30, 120),
            "b": rng.integers(10, 50, 120),
        })
        r = pd.DataFrame({
            "x": rng.integers(0, 40, 90),
            "y": rng.integers(25, 60, 90),
        })
        lds = rd.from_pandas(l).repartition(4)
        rds = rd.from_pandas(r).repartition(3)
        mat = inclusion_matrix(lds, ["a", "b"], rds, ["x", "y"],
                               nb=8).to_pandas()
        assert len(mat) == 4
        for _, row in mat.iterrows():
            exp = inclusion_profile(
                rd.from_pandas(l[[row.l_col]]), row.l_col,
                rd.from_pandas(r[[row.r_col]]), row.r_col,
                nb=8).to_pylist()[0]
            assert row.n_left == exp["n_left"], (row.l_col, row.r_col)
            assert row.n_right == exp["n_right"]
            assert row.n_overlap == exp["n_overlap"]
            assert row.containment == pytest.approx(exp["containment"])

    def test_nulls_and_strings(self):
        lds = _ds({"a": ["u", "v", None, "u"]}, 2)
        rds = _ds({"x": ["v", "w", None]}, 1)
        m = inclusion_matrix(lds, ["a"], rds, ["x"], nb=4).to_pylist()[0]
        assert m == {"l_col": "a", "r_col": "x", "n_left": 2,
                     "n_right": 2, "n_overlap": 1, "containment": 0.5}

    def test_too_many_columns_raises(self):
        ds = _ds({"a": [1]}, 1)
        with pytest.raises(ValueError):
            inclusion_matrix(ds, [f"c{i}" for i in range(64)], ds,
                             ["a"], nb=2)


class TestReferentialIntegrity:
    def test_planted_dangling(self):
        triples = _ds({
            "subj": ["a", "b", "c", "a", "b"],
            "pred": ["knows", "knows", "type", "likes", "likes"],
            "obj": ["b", "zz", "Person", "c", "yy"],
        }, 2)
        out = referential_integrity(triples, nb=4).to_pandas() \
            .set_index("pred")
        # knows: a->b ok, b->zz dangling; likes: a->c ok, b->yy dangling
        # type: Person never a subject -> dangling
        assert out.loc["knows", "n_edges"] == 2
        assert out.loc["knows", "n_dangling"] == 1
        assert out.loc["likes", "n_dangling"] == 1
        assert out.loc["type", "n_dangling"] == 1
        assert out.loc["type", "dangling_ratio"] == 1.0

    def test_duckdb_parity_fuzz(self):
        rng = np.random.default_rng(1305)
        for trial in range(4):
            n = 300
            df = pd.DataFrame({
                "subj": [f"n{int(i)}" for i in rng.integers(0, 60, n)],
                "pred": [f"p{int(i)}" for i in rng.integers(0, 5, n)],
                "obj": [f"n{int(i)}" for i in rng.integers(0, 120, n)],
            })
            got = referential_integrity(
                rd.from_pandas(df).repartition(4), nb=8).to_pandas()
            con = duckdb.connect()
            con.register("t", df)
            exp = con.sql(
                "SELECT pred, count(*) AS n_edges,"
                " count(*) FILTER (NOT EXISTS (SELECT 1 FROM t s"
                "   WHERE s.subj = t.obj)) AS n_dangling"
                " FROM t GROUP BY pred ORDER BY pred"
            ).df()
            con.close()
            assert list(got["pred"]) == list(exp["pred"]), f"trial {trial}"
            assert list(got["n_edges"]) == list(exp["n_edges"])
            assert list(got["n_dangling"]) == list(exp["n_dangling"])
