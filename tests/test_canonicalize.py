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


def test_dedup_exact_salted_parity(ray_session):
    """Two-level salted dedup ≡ unsalted (associative first-by-order)."""
    import numpy as np

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.choice(["hot"] * 8 + [f"k{i}" for i in range(10)], size=500),
        "v": rng.integers(0, 3, size=500),
        "ord": np.arange(500),
    })
    ds = rd.from_pandas(df).repartition(4)
    plain = dedup_exact(ds, ["k", "v"], nb=4, keep_order_col="ord").to_pandas()
    salted = dedup_exact(ds, ["k", "v"], nb=4, keep_order_col="ord", salt=4).to_pandas()
    cols = ["k", "v", "ord"]
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols).reset_index(drop=True),
        salted[cols].sort_values(cols).reset_index(drop=True),
    )


def test_auto_salt_e2e_identical_triples(ray_session):
    """PipelineSpec(salt='auto') consumes the sampled hot-key report and
    must emit byte-identical triples to the unsalted plan."""
    import ray.data as rdm

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.stages.canonicalize import recommend_salt
    from biosd_feature_annotator_ray.synth import gen_pages

    key = ["subj", "pred", "obj", "obj_kind"]
    plain = annotate_pages(rdm.from_arrow(gen_pages(300)),
                           PipelineSpec(n_buckets=8)).to_pandas()
    auto = annotate_pages(rdm.from_arrow(gen_pages(300)),
                          PipelineSpec(n_buckets=8, salt="auto")).to_pandas()
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True),
        auto.sort_values(key).reset_index(drop=True),
    )
    # the synthetic pages are organism-skewed → the sample recommends >1
    from biosd_feature_annotator_ray.pipelines.annotate import build_mentions

    mentions = build_mentions(rdm.from_arrow(gen_pages(300)), PipelineSpec(n_buckets=8))
    assert recommend_salt(mentions, "key") >= 1


def test_groupby_topk(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import groupby_topk

    df = pd.DataFrame({
        "g": ["a"] * 5 + ["b"] * 2,
        "v": [3, 1, 4, 1, 5, 9, 2],
        "id": range(7),
    })
    out = groupby_topk(rd.from_pandas(df).repartition(4), ["g"], ["v", "id"],
                       [False, True], k=3, nb=4).to_pandas()
    out = out.sort_values(["g", "v", "id"], ascending=[True, False, True]).reset_index(drop=True)
    # group a: top3 by v desc = 5,4,3 ; ties (v=1) broken by id and cut
    assert out[out.g == "a"]["v"].tolist() == [5, 4, 3]
    # group b has fewer than k rows: all kept
    assert out[out.g == "b"]["v"].tolist() == [9, 2]


def test_canonicalize_family_randomized_duckdb_parity(ray_session):
    # seeded fuzz: argmax/topk/nunique/mode vs DuckDB over data with
    # null keys, duplicate order values and ties
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.canonicalize import (
        groupby_argmax, groupby_nunique, groupby_topk, mode_per_key)

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": np.where(rng.random(150) < 0.1, None,
                      rng.integers(0, 10, 150).astype(object)),
        "v": rng.integers(0, 20, 150),
        "uid": np.arange(150, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(4)

    got = groupby_argmax(ds, ["k"], ["v", "uid"], [False, True],
                         nb=4).to_pandas()
    want = duckdb.sql(
        "SELECT k, v, uid FROM (SELECT *, row_number() OVER (PARTITION"
        " BY k ORDER BY v DESC, uid) rk FROM df) WHERE rk = 1").df()
    cols = ["k", "v", "uid"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, na_position="last").reset_index(drop=True),
        want[cols].sort_values(cols, na_position="last").reset_index(drop=True),
        check_dtype=False)

    got = groupby_topk(ds, ["k"], ["v", "uid"], [False, True], k=3,
                       nb=4).to_pandas()
    want = duckdb.sql(
        "SELECT k, v, uid FROM (SELECT *, row_number() OVER (PARTITION"
        " BY k ORDER BY v DESC, uid) rk FROM df) WHERE rk <= 3").df()
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols, na_position="last").reset_index(drop=True),
        want[cols].sort_values(cols, na_position="last").reset_index(drop=True),
        check_dtype=False)

    got = groupby_nunique(ds, "k", "v", nb=4).to_pandas()
    want = duckdb.sql(
        "SELECT k, CAST(count(DISTINCT v) AS BIGINT) nd"
        " FROM df GROUP BY k").df()
    g = {(None if pd.isna(r.k) else r.k): r.n_distinct
         for r in got.itertuples()}
    w = {(None if pd.isna(r.k) else r.k): r.nd for r in want.itertuples()}
    assert g == w

    got = mode_per_key(ds, "k", "v", nb=4).to_pandas()
    want = duckdb.sql(
        "SELECT k, v AS mode FROM (SELECT k, v, row_number() OVER"
        " (PARTITION BY k ORDER BY count(*) DESC, v) rk FROM df"
        " GROUP BY k, v) WHERE rk = 1").df()
    g = {(None if pd.isna(r.k) else r.k): r.mode for r in got.itertuples()}
    w = {(None if pd.isna(r.k) else r.k): r.mode for r in want.itertuples()}
    assert g == w


def test_setops_randomized_duckdb_parity(ray_session):
    # seeded fuzz over distinct and bag set ops with nulls + skew
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.canonicalize import (
        set_op, set_op_all)

    rng = np.random.default_rng(31)
    for _ in range(2):
        a = pd.DataFrame({"v": np.where(rng.random(120) < 0.1, None,
                                        rng.integers(0, 15, 120)
                                        .astype(object))})
        b = pd.DataFrame({"v": np.where(rng.random(80) < 0.1, None,
                                        rng.integers(5, 20, 80)
                                        .astype(object))})
        da = rd.from_pandas(a).repartition(3)
        db = rd.from_pandas(b).repartition(2)
        for op, sql in [("intersect", "INTERSECT"), ("except", "EXCEPT"),
                        ("union", "UNION")]:
            def norm(xs):
                return sorted((None if pd.isna(x) else int(x) for x in xs),
                              key=lambda x: (x is None, x))

            got = norm(set_op(da, db, "v", op=op).to_pandas()["v"])
            want = norm(duckdb.sql(
                f"SELECT v FROM a {sql} SELECT v FROM b").df()["v"])
            assert got == want, op
        for op, sql in [("intersect", "INTERSECT ALL"),
                        ("except", "EXCEPT ALL")]:
            def norm(xs):
                return sorted((None if pd.isna(x) else int(x) for x in xs),
                              key=lambda x: (x is None, x))

            got = norm(set_op_all(da, db, "v", op=op).to_pandas()["v"])
            want = norm(duckdb.sql(
                f"SELECT v FROM a {sql} SELECT v FROM b").df()["v"])
            assert got == want, op
