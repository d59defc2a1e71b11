"""Generic bucketed shuffle hash join (stages/join.py, round-1 verdict
item 4): inner/left/semi/anti parity against pandas merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.join import shuffle_hash_join


@pytest.fixture
def sides(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, size=200),
        "lv": np.arange(200),
        "shared": rng.standard_normal(200),
    })
    # some null keys (must never match), some keys only on one side
    left.loc[::50, "k"] = pd.NA
    right = pd.DataFrame({
        "k": rng.integers(20, 60, size=150),
        "rv": np.arange(150) * 10,
        "shared": rng.standard_normal(150),
    })
    left["k"] = left["k"].astype("Int64")
    right["k"] = right["k"].astype("Int64")
    return left, right


def _norm(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True).astype("float64")


def test_inner_join_matches_pandas(sides):
    left, right = sides
    got = shuffle_hash_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right).repartition(3),
                            on=["k"], nb=8).to_pandas()
    want = left.dropna(subset=["k"]).merge(right.dropna(subset=["k"]), on="k",
                                           suffixes=("_l", "_r"))
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(want, cols))
    assert {"shared_l", "shared_r"} <= set(got.columns)


def test_left_join_matches_pandas(sides):
    left, right = sides
    got = shuffle_hash_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right).repartition(3),
                            on=["k"], how="left", nb=8).to_pandas()
    want = left.merge(right.dropna(subset=["k"]), on="k", how="left",
                      suffixes=("_l", "_r"))
    assert len(got) == len(want)
    # unmatched left rows survive with null rv
    only_left = left[~left.k.isin(right.k)]
    assert got[got.k.isin(only_left.k)].rv.isna().all()


def test_semi_and_anti_partition_left(sides):
    left, right = sides
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(3)
    semi = shuffle_hash_join(lds, rds, on=["k"], how="semi", nb=8).to_pandas()
    anti = shuffle_hash_join(lds, rds, on=["k"], how="anti", nb=8).to_pandas()
    in_right = set(right.k.dropna())
    assert set(semi.k).issubset(in_right)
    assert set(anti.k.dropna()).isdisjoint(in_right)
    # semi ∪ anti = EVERY left row exactly once (SQL semantics: a
    # null-key row matches nothing → anti keeps it, semi excludes it)
    assert len(semi) + len(anti) == len(left)
    assert anti.k.isna().sum() == left.k.isna().sum()
    assert set(semi.columns) == set(anti.columns) == {"k", "lv", "shared"}


def test_interval_join_overlapping_mode(ray_session):
    """overlapping=True must return EVERY covering interval."""
    from biosd_feature_annotator_ray.stages.join import interval_join

    pts = pd.DataFrame({"k": [1, 1, 2], "ts": [5.0, 15.0, 5.0], "pid": [0, 1, 2]})
    iv = pd.DataFrame({
        "k": [1, 1, 2], "start": [0.0, 4.0, 100.0], "end": [10.0, 20.0, 200.0],
        "iv_id": [10, 11, 12],
    })
    out = interval_join(rd.from_pandas(pts), rd.from_pandas(iv),
                        key="k", ts="ts", start="start", end="end",
                        nb=4, overlapping=True).to_pandas()
    got = set(map(tuple, out[["pid", "iv_id"]].itertuples(index=False)))
    # pid 0 (k=1, t=5) covered by both intervals; pid 1 only by [4,20];
    # pid 2 (k=2, t=5) by none
    assert got == {(0, 10), (0, 11), (1, 11)}


def test_asof_join_left_keeps_unmatched(ray_session):
    from biosd_feature_annotator_ray.stages.join import asof_join

    left = pd.DataFrame({"k": [1, 1, 2], "ts": [1.0, 5.0, 1.0], "lid": [0, 1, 2]})
    right = pd.DataFrame({"k": [1], "rts": [2.0], "rid": [7]})
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", ts="ts", right_ts="rts", nb=4, how="left").to_pandas()
    assert len(out) == 3
    m = out.set_index("lid")["rid"]
    assert pd.isna(m[0]) and m[1] == 7 and pd.isna(m[2])


def test_bloom_anti_join_matches_exact(ray_session):
    """Bloom prefilter + exact settle ≡ plain anti-join (the done-set
    scale path for resume)."""
    import numpy as np

    from biosd_feature_annotator_ray.sources.sink import bloom_anti_join

    rng = np.random.default_rng(13)
    stream = pd.DataFrame({"key": [f"k{i}" for i in rng.integers(0, 5000, 3000)],
                           "payload": np.arange(3000)})
    done = pd.DataFrame({"key": [f"k{i}" for i in range(0, 5000, 3)]})
    got = bloom_anti_join(rd.from_pandas(stream).repartition(4), "key",
                          rd.from_pandas(done).repartition(2),
                          bits_pow=16, nb=8).to_pandas()
    want = stream[~stream.key.isin(set(done.key))]
    cols = ["key", "payload"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))


def test_asof_inner_with_null_payload_and_no_payload(ray_session):
    """Regression: inner as-of used a payload column as the match
    probe — null payloads dropped matched rows, and a right side with
    no payload columns made inner behave like left."""
    import pandas as pd

    import ray.data as rd

    from biosd_feature_annotator_ray.stages.join import asof_join

    left = pd.DataFrame({
        "k": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-03", "2024-01-02"]),
        "a": [10, 20, 30],
    })
    # right with a NULL payload on the matched row
    right = pd.DataFrame({
        "k": [1], "rts": pd.to_datetime(["2024-01-01"]), "val": [None],
    })
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", ts="ts", right_ts="rts", nb=4, how="inner").to_pandas()
    assert sorted(out["a"].tolist()) == [10, 20]  # null payload still matches

    # right side with NO payload columns and shared ts name
    right2 = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"])})
    out2 = asof_join(rd.from_pandas(left), rd.from_pandas(right2),
                     key="k", ts="ts", nb=4, how="inner").to_pandas()
    assert sorted(out2["a"].tolist()) == [10, 20]  # k=2 row correctly dropped


def test_left_join_blocks_share_one_schema(ray_session):
    """Regression: buckets with unmatched keys promoted int64 right
    columns to float64 while matched buckets kept int64 — the block
    union then had mixed schemas. Every block must carry the pinned
    schema (int64 + nulls)."""
    import pandas as pd

    import ray
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    left = pd.DataFrame({"k": range(200), "a": range(200)})
    right = pd.DataFrame({"k": range(0, 200, 2), "b": range(100)})  # half match
    out = shuffle_hash_join(rd.from_pandas(left).repartition(3),
                            rd.from_pandas(right).repartition(2),
                            on=["k"], how="left", nb=16)
    t = pa.concat_tables([ray.get(r) for r in out.to_arrow_refs()])
    assert t.schema.field("b").type == pa.int64()
    df = t.to_pandas()
    assert df["b"].isna().sum() == 100 and len(df) == 200
    # overlapping non-key columns keep deterministic suffixed names
    right2 = pd.DataFrame({"k": range(0, 200, 2), "a": range(100)})
    out2 = shuffle_hash_join(rd.from_pandas(left).repartition(2),
                             rd.from_pandas(right2).repartition(2),
                             on=["k"], how="left", nb=8).to_pandas()
    assert {"a_l", "a_r"} <= set(out2.columns)


def test_right_join_matches_sql_semantics(sides):
    left, right = sides
    right = right.copy()
    right.loc[::40, "k"] = pd.NA  # null right keys: retained unmatched
    got = shuffle_hash_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right).repartition(3),
                            on=["k"], how="right", nb=8).to_pandas()
    lnn, rnn = left.dropna(subset=["k"]), right.dropna(subset=["k"])
    core = lnn.merge(rnn, on="k", how="right", suffixes=("_l", "_r"))
    extra = right[right["k"].isna()].rename(columns={"shared": "shared_r"})
    want = pd.concat([core, extra.reindex(columns=core.columns)], ignore_index=True)
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(want, cols))
    # every null-key right row came through exactly once, unmatched
    assert got["k"].isna().sum() == right["k"].isna().sum()
    assert got.loc[got["k"].isna(), "lv"].isna().all()


def test_full_outer_join_matches_sql_semantics(sides):
    left, right = sides
    right = right.copy()
    right.loc[::40, "k"] = pd.NA
    got = shuffle_hash_join(rd.from_pandas(left).repartition(4),
                            rd.from_pandas(right).repartition(3),
                            on=["k"], how="full", nb=8).to_pandas()
    lnn, rnn = left.dropna(subset=["k"]), right.dropna(subset=["k"])
    core = lnn.merge(rnn, on="k", how="outer", suffixes=("_l", "_r"))
    extras = [right[right["k"].isna()].rename(columns={"shared": "shared_r"}),
              left[left["k"].isna()].rename(columns={"shared": "shared_l"})]
    want = pd.concat([core] + [e.reindex(columns=core.columns) for e in extras],
                     ignore_index=True)
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(want, cols))
    # null-key rows from BOTH sides survive, never matched to each other
    n_null = left["k"].isna().sum() + right["k"].isna().sum()
    assert got["k"].isna().sum() == n_null


def test_full_join_salting_rejected(sides):
    left, right = sides
    with pytest.raises(ValueError, match="salting"):
        shuffle_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                          on=["k"], how="full", hot_keys=[1, 2])


def test_join_auto_dispatch_parity(ray_session):
    from biosd_feature_annotator_ray.stages.join import join

    rng = np.random.default_rng(3)
    L = pd.DataFrame({"k": rng.integers(0, 50, 300), "a": np.arange(300)})
    R = pd.DataFrame({"k": rng.integers(25, 75, 100), "b": np.arange(100)})
    want = L.merge(R, on="k").sort_values(["k", "a", "b"]).reset_index(drop=True)
    for thr in (1, 10**6):  # force shuffle path, then broadcast path
        got = join(rd.from_pandas(L).repartition(3), rd.from_pandas(R).repartition(2),
                   on=["k"], broadcast_threshold_rows=thr).to_pandas()
        got = got[["k", "a", "b"]].sort_values(["k", "a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_outer_joins_arrow_native_null_and_dup_parity(ray_session):
    # left/right/full on data with null keys, NaN keys and duplicate
    # matches — the unmatched-side chunks must carry nulls and the
    # preserved side's null-key rows must survive unmatched
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    l = pd.DataFrame({"k": [1.0, 1.0, 2.0, np.nan, 5.0],
                      "lv": [10, 11, 20, 30, 50]})
    r = pd.DataFrame({"k": [1.0, 2.0, 2.0, np.nan, 9.0],
                      "rv": [100, 200, 201, 300, 900]})
    for how, sql in [("left", "LEFT"), ("right", "RIGHT"),
                     ("full", "FULL OUTER")]:
        got = shuffle_hash_join(rd.from_pandas(l).repartition(2),
                                rd.from_pandas(r).repartition(2),
                                ["k"], how=how, nb=4).to_pandas()
        want = duckdb.sql(
            f"SELECT l.k AS lk, r.k AS rk, lv, rv FROM l {sql} JOIN r"
            " ON l.k = r.k").df()
        want["k"] = want["lk"].combine_first(want["rk"])
        want = want[["k", "lv", "rv"]]
        key = ["k", "lv", "rv"]
        gs = got[key].sort_values(key, na_position="last").reset_index(drop=True)
        ws = want[key].sort_values(key, na_position="last").reset_index(drop=True)
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False), how


def test_join_randomized_duckdb_parity_all_hows(ray_session):
    # seeded fuzz: composite (int, string) keys with nulls, duplicate
    # keys on both sides, every how — engine vs DuckDB row-multiset
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(42)
    for trial in range(3):
        def mk(n):
            k1 = rng.integers(0, 6, n).astype("float64")
            k1[rng.random(n) < 0.15] = np.nan
            k2 = np.array(["a", "b", "c", None], dtype=object)[
                rng.integers(0, 4, n)]
            return pd.DataFrame({
                "k1": k1, "k2": k2,
                "v": rng.integers(0, 100, n)})
        l, r = mk(40), mk(30)
        l = l.rename(columns={"v": "lv"})
        r = r.rename(columns={"v": "rv"})
        for how, sql in [("inner", "JOIN"), ("left", "LEFT JOIN"),
                         ("right", "RIGHT JOIN"),
                         ("full", "FULL OUTER JOIN"),
                         ("semi", "SEMI JOIN"), ("anti", "ANTI JOIN")]:
            got = shuffle_hash_join(
                rd.from_pandas(l).repartition(3),
                rd.from_pandas(r).repartition(2),
                ["k1", "k2"], how=how, nb=4).to_pandas()
            if how in ("semi", "anti"):
                want = duckdb.sql(
                    f"SELECT l.* FROM l {sql} r"
                    " ON l.k1 = r.k1 AND l.k2 = r.k2").df()
            else:
                want = duckdb.sql(
                    "SELECT coalesce(l.k1, r.k1) AS k1,"
                    " coalesce(l.k2, r.k2) AS k2, lv, rv"
                    f" FROM l {sql} r ON l.k1 = r.k1 AND l.k2 = r.k2").df()
            cols = list(want.columns)
            gs = (got[cols].sort_values(cols, na_position="last")
                  .reset_index(drop=True))
            ws = (want.sort_values(cols, na_position="last")
                  .reset_index(drop=True))
            pd.testing.assert_frame_equal(gs, ws, check_dtype=False)


def test_asof_join_randomized_duckdb_parity(ray_session):
    # seeded fuzz: duplicate (key, ts) on the right are pre-deduped
    # (documented determinism contract), random gaps, unmatched lefts
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.join import asof_join

    rng = np.random.default_rng(5)
    for trial in range(2):
        l = pd.DataFrame({
            "k": rng.integers(0, 5, 60),
            "ts": pd.to_datetime(rng.integers(0, 1000, 60), unit="s"),
            "lv": np.arange(60, dtype=np.int64),
        })
        r = pd.DataFrame({
            "k": rng.integers(0, 5, 40),
            "ts": pd.to_datetime(rng.integers(0, 1000, 40), unit="s"),
            "rv": np.arange(40, dtype=np.int64),
        }).drop_duplicates(["k", "ts"])
        got = asof_join(rd.from_pandas(l).repartition(3),
                        rd.from_pandas(r).repartition(2),
                        key="k", ts="ts", nb=4, how="inner").to_pandas()
        want = duckdb.sql(
            "SELECT l.k, l.ts, lv, rv FROM l ASOF JOIN r"
            " ON l.k = r.k AND l.ts >= r.ts").df()
        cols = ["k", "lv", "rv"]
        gs = got[cols].sort_values(cols).reset_index(drop=True)
        ws = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False)


def test_asof_forward_randomized_duckdb_parity(ray_session):
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.join import asof_join

    rng = np.random.default_rng(6)
    l = pd.DataFrame({
        "k": rng.integers(0, 5, 50),
        "ts": pd.to_datetime(rng.integers(0, 500, 50), unit="s"),
        "lv": np.arange(50, dtype=np.int64),
    })
    r = pd.DataFrame({
        "k": rng.integers(0, 5, 30),
        "ts": pd.to_datetime(rng.integers(0, 500, 30), unit="s"),
        "rv": np.arange(30, dtype=np.int64),
    }).drop_duplicates(["k", "ts"])
    got = asof_join(rd.from_pandas(l).repartition(3),
                    rd.from_pandas(r).repartition(2),
                    key="k", ts="ts", nb=4, how="inner",
                    direction="forward").to_pandas()
    want = duckdb.sql(
        "SELECT l.k, lv, rv FROM l ASOF JOIN r"
        " ON l.k = r.k AND l.ts <= r.ts").df()
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)
