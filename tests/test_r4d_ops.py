"""Eighth-sitting operators: characteristic sets, entity property
table, KG negative sampling, MAD outliers, pair-expansion helper."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------- pairs


def test_pair_index_upper_matches_bruteforce():
    from biosd_feature_annotator_ray.stages.graph import _pair_index_upper

    rng = np.random.default_rng(3)
    for _ in range(20):
        d = rng.integers(0, 6, size=rng.integers(1, 8)).astype(np.int64)
        left, right = _pair_index_upper(d)
        starts = np.cumsum(d) - d
        want = [(int(s + i), int(s + j))
                for s, n in zip(starts, d)
                for i in range(n) for j in range(i + 1, n)]
        assert sorted(zip(left.tolist(), right.tolist())) == sorted(want)


def test_expand_sorted_pairs_duplicate_values_match_merge():
    from biosd_feature_annotator_ray.stages.graph import _expand_sorted_pairs

    # duplicates of the same (key, val) must reproduce the pandas
    # self-merge + strict-< multiplicities the helper replaced
    t = pa.table({"k": [1, 1, 1, 2, 2, 3],
                  "v": [5, 5, 7, 1, 2, 9]})
    s, l, r = _expand_sorted_pairs(t, "k", "v")
    got = sorted(zip(s.column("v").take(pa.array(l)).to_pylist(),
                     s.column("v").take(pa.array(r)).to_pylist()))
    df = t.to_pandas()
    m = df.merge(df, on="k")
    m = m[m["v_x"] < m["v_y"]]
    assert got == sorted(zip(m["v_x"], m["v_y"]))


# ------------------------------------------------- characteristic sets


def test_characteristic_sets_known():
    from biosd_feature_annotator_ray.stages.graph import characteristic_sets

    t = pa.table({
        "subj": ["a", "a", "a", "b", "b", "c", "c", "c"],
        "pred": ["name", "name", "price", "name", "price", "name",
                 "brand", "price"]})
    out = characteristic_sets(rd.from_arrow(t).repartition(3), nb=4)
    df = out.to_pandas().sort_values("cs").reset_index(drop=True)
    assert df.to_dict("records") == [
        {"cs": "brand,name,price", "n_preds": 3, "n_subjects": 1},
        {"cs": "name,price", "n_preds": 2, "n_subjects": 2}]


# ------------------------------------------------------- entity table


def test_entity_table_min_and_nulls():
    from biosd_feature_annotator_ray.stages.graph import entity_table

    t = pa.table({
        "subj": ["e1", "e1", "e1", "e2", "e2"],
        "pred": ["name", "name", "price", "name", "other"],
        "obj": ["zeta", "alpha", "9.5", "bob", "x"]})
    out = entity_table(rd.from_arrow(t).repartition(2),
                       ["name", "price"], nb=4)
    df = out.to_pandas().sort_values("subj").reset_index(drop=True)
    assert list(df.columns) == ["subj", "name", "price"]
    assert df["name"].tolist() == ["alpha", "bob"]      # MIN pick
    assert df["price"].tolist()[0] == "9.5"
    assert df["price"].isna().tolist() == [False, True]  # absent → null


def test_entity_table_subj_collision_raises():
    from biosd_feature_annotator_ray.stages.graph import entity_table

    with pytest.raises(ValueError):
        entity_table(pa.table({"subj": ["a"], "pred": ["subj"],
                               "obj": ["x"]}), ["subj"])


# -------------------------------------------------- negative sampling


def _toy_triples() -> pa.Table:
    return pa.table({
        "subj": [f"s{i}" for i in range(40)],
        "pred": ["rel"] * 40,
        "obj": [f"o{i % 7}" for i in range(40)]})


def test_negative_samples_deterministic_and_clean():
    from biosd_feature_annotator_ray.stages.graph import (
        negative_sample_triples)

    t = _toy_triples()
    a = negative_sample_triples(rd.from_arrow(t).repartition(3),
                                k=2, seed=5, nb=4).to_pandas()
    b = negative_sample_triples(rd.from_arrow(t).repartition(2),
                                k=2, seed=5, nb=4).to_pandas()
    key = ["subj", "pred", "obj_neg", "j"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
    # every drawn object comes from the pool, never a known positive
    pool = set(t.column("obj").to_pylist())
    pos = set(zip(t.column("subj").to_pylist(),
                  t.column("obj").to_pylist()))
    assert set(a["obj_neg"]) <= pool
    assert not any((s, o) in pos for s, o in zip(a["subj"], a["obj_neg"]))
    # ≤ k negatives per positive instance
    assert a.groupby(["subj", "pred"]).size().max() <= 2
    assert (a["j"] < 2).all() and (a["j"] >= 0).all()


def test_negative_samples_seed_changes_draws():
    from biosd_feature_annotator_ray.stages.graph import (
        negative_sample_triples)

    t = _toy_triples()
    a = negative_sample_triples(rd.from_arrow(t), k=1, seed=1,
                                nb=4).to_pandas()
    b = negative_sample_triples(rd.from_arrow(t), k=1, seed=2,
                                nb=4).to_pandas()
    key = ["subj", "pred", "obj_neg", "j"]
    assert not a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_negative_samples_bad_k_raises():
    from biosd_feature_annotator_ray.stages.graph import (
        negative_sample_triples)

    with pytest.raises(ValueError):
        negative_sample_triples(_toy_triples(), k=0)


# ------------------------------------------------------- MAD outliers


def test_mad_outliers_duckdb_parity_fuzz():
    import duckdb

    from biosd_feature_annotator_ray.stages.sketches import (
        mad_outliers_per_key)

    rng = np.random.default_rng(11)
    n = 400
    keys = rng.choice(["a", "b", "c", None], size=n,
                      p=[0.4, 0.3, 0.2, 0.1]).tolist()
    vals = np.round(rng.normal(50, 20, size=n), 2).tolist()
    for i in range(0, n, 9):
        vals[i] = None
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.float64())})
    out = mad_outliers_per_key(rd.from_arrow(t).repartition(4),
                               "k", "v", k=2.0, nb=4).to_pandas()
    want = duckdb.connect().execute("""
        WITH m AS (SELECT k, median(v) AS med FROM t GROUP BY k),
         d AS (SELECT t.k, t.v, m.med, abs(t.v - m.med) AS dev
               FROM t JOIN m ON m.k IS NOT DISTINCT FROM t.k),
         md AS (SELECT k, median(dev) AS mad FROM d GROUP BY k)
        SELECT d.k, d.v, round(d.med, 6) AS med, round(md.mad, 6) AS mad,
         CAST(CASE WHEN d.v IS NULL THEN NULL
          ELSE d.dev > 2 * md.mad END AS BIGINT) AS is_outlier
        FROM d JOIN md ON md.k IS NOT DISTINCT FROM d.k
    """).fetchdf()
    key = ["k", "v", "is_outlier"]
    a = (out.rename(columns={"v": "v"})
         .sort_values(key, na_position="last").reset_index(drop=True))
    b = want.sort_values(key, na_position="last").reset_index(drop=True)
    a.columns = list(b.columns)
    pd.testing.assert_frame_equal(
        a.astype({"is_outlier": "float64"}),
        b.astype({"is_outlier": "float64"}), check_exact=False,
        rtol=1e-9)


def test_mad_outliers_constant_group():
    from biosd_feature_annotator_ray.stages.sketches import (
        mad_outliers_per_key)

    t = pa.table({"k": ["x"] * 5, "v": [3.0] * 5})
    df = mad_outliers_per_key(rd.from_arrow(t), "k", "v",
                              nb=2).to_pandas()
    assert (df["med"] == 3.0).all() and (df["mad"] == 0.0).all()
    assert (df["is_outlier"] == 0).all()
