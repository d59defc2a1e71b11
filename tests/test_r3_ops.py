"""Round-3 operator additions: per-key quota (cap_per_key), ROLLUP
hierarchy aggregate, order-insensitive table fingerprint."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_cap_per_key_quota(ray_session):
    from biosd_feature_annotator_ray.stages.windows import cap_per_key

    df = pd.DataFrame({
        "source": ["a"] * 5 + ["b"] * 2 + ["c"] * 1,
        "doc_id": [5, 3, 1, 4, 2, 11, 10, 20],
    })
    ds = rd.from_pandas(df).repartition(3)
    out = cap_per_key(ds, key_col="source", order_cols=["doc_id"], n=2,
                      nb=4).to_pandas().sort_values("doc_id")
    # a keeps its two smallest doc_ids, b both, c its one
    assert out.doc_id.tolist() == [1, 2, 10, 11, 20]


def test_rollup_agg_matches_duckdb(ray_session):
    import duckdb

    from biosd_feature_annotator_ray.stages.canonicalize import rollup_agg

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", None],
        "v": [1.25, 2.50, 3.75, 0.25, 10.00],
    })
    got = rollup_agg(rd.from_pandas(df).repartition(2), ["a", "b"], "v",
                     ).to_pandas()
    got["sum_value"] = got["sum_value"].round(2)
    want = duckdb.sql(
        "SELECT a, b, CAST(count(*) AS BIGINT) AS n_rows,"
        " round(sum(v), 2) AS sum_value FROM df GROUP BY ROLLUP (a, b)"
    ).df()
    key = ["a", "b", "n_rows", "sum_value"]
    got = got[key].sort_values(key, na_position="last").reset_index(drop=True)
    want = want[key].sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_table_fingerprint_order_insensitive(ray_session):
    import duckdb

    from biosd_feature_annotator_ray.stages.sketches import (
        MERSENNE61, table_fingerprint)

    ids = np.arange(100, dtype=np.int64)
    t1 = pa.table({"event_id": pa.array(ids)})
    rng = np.random.default_rng(1)
    t2 = pa.table({"event_id": pa.array(rng.permutation(ids))})
    fp1 = table_fingerprint(rd.from_arrow(t1).repartition(4), "event_id")
    fp2 = table_fingerprint(rd.from_arrow(t2).repartition(7), "event_id")
    assert fp1 == fp2  # order- and partitioning-insensitive
    df = t1.to_pandas()
    want = duckdb.sql(
        "SELECT CAST(sum(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1,"
        " 8))::UBIGINT) % 2305843009213693951 AS BIGINT) AS fp,"
        " CAST(count(*) AS BIGINT) AS n FROM df").df()
    assert fp1 == (int(want.fp[0]), int(want.n[0]))
    assert fp1[0] < MERSENNE61
    # a single changed value changes the fingerprint
    t3 = pa.table({"event_id": pa.array(np.concatenate([ids[:-1], [999]]))})
    assert table_fingerprint(rd.from_arrow(t3), "event_id") != fp1


def test_table_diff_classes_and_null_safety(ray_session):
    from biosd_feature_annotator_ray.stages.join import table_diff

    base = pd.DataFrame({"k": [1, 2, 3, 4], "v": [1.0, None, 3.0, 4.0]})
    new = pd.DataFrame({"k": [2, 3, 4, 5], "v": [None, 30.0, 4.0, 5.0]})
    out = table_diff(rd.from_pandas(base).repartition(2),
                     rd.from_pandas(new).repartition(2),
                     ["k"], ["v"], nb=4).to_pandas()
    got = dict(zip(out.k, out.change))
    # 1 removed; 2 null==null -> same (absent); 3 changed; 4 same; 5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}
