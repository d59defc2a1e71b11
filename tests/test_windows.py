"""Windowed-aggregate operators (§2.9 graft additions) + J4 anti-join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from biosd_feature_annotator_ray.stages.windows import session_windows, sliding_windows


@pytest.fixture
def events(ray_session):
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for uid, offsets_min in [
        (1, [0, 5, 10, 70, 75]),          # two sessions (gap 60 > 30)
        (2, [0, 40, 45]),                  # two sessions
        (3, [0]),                          # one singleton session
    ]:
        for off in offsets_min:
            rows.append({"user_id": uid, "event_id": eid,
                         "ts": base + pd.Timedelta(minutes=off), "value": 1.0,
                         "event_type": "a" if eid % 2 == 0 else "b"})
            eid += 1
    return rd.from_pandas(pd.DataFrame(rows)).repartition(3)


def test_session_windows(events):
    out = session_windows(events, gap=pd.Timedelta(minutes=30), nb=2).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    got = list(map(tuple, out[["user_id", "session_id", "n_events"]].itertuples(index=False)))
    assert got == [(1, 0, 3), (1, 1, 2), (2, 0, 1), (2, 1, 2), (3, 0, 1)]
    s0 = out[(out.user_id == 1) & (out.session_id == 0)].iloc[0]
    assert s0.end_ts - s0.start_ts == pd.Timedelta(minutes=10)


def test_sliding_windows_counts(events):
    out = sliding_windows(events, key_col="user_id", size=pd.Timedelta(hours=1),
                          slide=pd.Timedelta(minutes=30)).to_pandas()
    # every event appears in exactly size/slide = 2 windows
    assert out.n.sum() == 9 * 2
    # window starts align to the slide grid
    assert (out.window_start.dt.minute % 30 == 0).all()


def test_sliding_windows_noninteger_ratio(ray_session):
    """size=60min, slide=25min → each event belongs to ceil(60/25)=3 or
    2 windows depending on phase; the floor bug dropped the earliest
    covering window (ADVICE round 1). Verify against a direct numpy
    coverage count."""
    base = pd.Timestamp("2024-01-01")
    offs = [0, 5, 24, 25, 49, 50, 55, 74, 99, 120]
    df = pd.DataFrame({
        "user_id": 1, "event_id": range(len(offs)),
        "ts": [base + pd.Timedelta(minutes=m) for m in offs],
        "value": 1.0, "event_type": "a",
    })
    out = sliding_windows(rd.from_pandas(df).repartition(3), key_col="user_id",
                          size=pd.Timedelta(minutes=60),
                          slide=pd.Timedelta(minutes=25)).to_pandas()
    # expected total coverage: grid starts are multiples of 25min from
    # the EPOCH; an event at absolute minute t is covered by
    # 2 + (t % 25 < 60 - 2*25) windows
    size_m, slide_m = 60, 25
    epoch_min = int(base.value // (60 * 10**9))
    want = sum(2 + ((epoch_min + off) % slide_m < size_m - 2 * slide_m) for off in offs)
    assert int(out.n.sum()) == want
    # the event at minute 55 sits ON a grid point here → 3 covering windows
    assert (epoch_min + 55) % slide_m == 0
    t55 = base + pd.Timedelta(minutes=55)
    covering = out[(out.window_start <= t55) & (out.window_start > t55 - pd.Timedelta(minutes=60))]
    assert len(covering) == 3


def test_anti_join_keys(ray_session):
    from biosd_feature_annotator_ray.sources.sink import anti_join_keys

    ds = rd.from_items([{"key": k} for k in ["a", "b", "c", "d"]])
    done = ray.put(pa.array(["b", "d"]))
    out = anti_join_keys(ds, "key", done).to_pandas()
    assert sorted(out.key) == ["a", "c"]


def test_lead_last_nth_value_per_key(ray_session):
    from biosd_feature_annotator_ray.stages.windows import (
        lead_per_key, last_value_per_key, nth_value_per_key)

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_id": [10, 11, 12, 20, 21, 30],
        "ts": pd.to_datetime([1, 2, 3, 1, 2, 1], unit="s"),
        "value": [5.0, 6.0, 7.0, 8.0, 9.0, 1.0],
    })
    ds = rd.from_pandas(df).repartition(3)
    lead = lead_per_key(ds, value_col="event_id", out="nxt", nb=4).to_pandas()
    lead = lead.sort_values("event_id").reset_index(drop=True)
    assert [x if pd.notna(x) else None for x in lead["nxt"]] == [11, 12, None, 21, None, None]
    last = last_value_per_key(ds, value_col="value", nb=4).to_pandas()
    last = last.sort_values("event_id").reset_index(drop=True)
    assert last["last_value"].tolist() == [7.0, 7.0, 7.0, 9.0, 9.0, 1.0]
    # n beyond a group's size -> null for that whole group
    nth = nth_value_per_key(ds, n=3, value_col="value", nb=4).to_pandas()
    nth = nth.sort_values("event_id").reset_index(drop=True)
    got = [x if pd.notna(x) else None for x in nth["nth_value"]]
    assert got == [7.0, 7.0, 7.0, None, None, None]


def test_hot_key_bucket_guard(ray_session):
    """r02 verdict item 7 / r03 item 3: one pathological key melts one
    window reduce bucket — non-streamable finishers raise the typed
    guard; streamable ones (rank here) now SPILL into sorted sub-slices
    and complete instead (see test_hot_key_spill_matches_vector_path)."""
    import pytest

    from biosd_feature_annotator_ray.stages.windows import (
        rank_per_key, session_windows)

    df = pd.DataFrame({
        "user_id": [1] * 200,  # one giant key
        "event_id": range(200),
        "ts": pd.to_datetime(range(200), unit="s"),
    })
    ds = rd.from_pandas(df).repartition(4)
    # session_windows needs the whole partition → still a hard stop
    with pytest.raises(Exception, match="max_bucket_rows"):
        session_windows(ds, nb=4, max_bucket_rows=100).to_pandas()
    # rank degrades: over-bound bucket completes via the spill path
    ok = rank_per_key(ds, nb=4, max_bucket_rows=100).to_pandas()
    assert len(ok) == 200 and ok["rn"].max() == 200
    assert sorted(ok["rn"]) == list(range(1, 201))


def test_hot_key_spill_matches_vector_path(ray_session):
    """r03 verdict item 3: rank/cap/cumsum/lag/lead on a planted key
    far above max_bucket_rows complete via the sorted sub-slice spill
    and return EXACTLY what the unbounded vector path returns —
    including null keys, null/NaN values, and run boundaries that
    straddle slice edges."""
    from biosd_feature_annotator_ray.stages.windows import (
        cap_per_key, cumsum_per_key, lag_per_key, lead_per_key,
        rank_per_key)

    rng = np.random.default_rng(41)
    n = 500
    vals = rng.normal(0, 5, n)
    vals[rng.random(n) < 0.05] = np.nan
    nullmask = (rng.random(n) < 0.1) & ~np.isnan(vals)
    t = pa.table({
        # one hot key (0) plus a few small ones and a null-key group
        "user_id": pa.array(
            np.where(rng.random(n) < 0.7, 0, rng.integers(1, 4, n)),
            pa.int64(), mask=rng.random(n) < 0.05),
        "ts": pa.array(rng.integers(0, 50, n).astype("datetime64[s]")
                       .astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(vals, pa.float64(), mask=nullmask),
    })
    ds = rd.from_arrow(t).repartition(4)

    def norm(df, cols):
        return (df.sort_values("event_id").reset_index(drop=True)[cols])

    for op, kw, col in [
        (rank_per_key, {}, "rn"),
        (cumsum_per_key, {"value_col": "value"}, "cum_value"),
        (lag_per_key, {"value_col": "value"}, "prev"),
        (lead_per_key, {"value_col": "value"}, "next"),
    ]:
        big = op(ds, key_col="user_id", order_cols=["ts", "event_id"],
                 nb=2, **kw).to_pandas()
        spill = op(ds, key_col="user_id", order_cols=["ts", "event_id"],
                   nb=2, max_bucket_rows=37, **kw).to_pandas()
        pd.testing.assert_frame_equal(
            norm(big, ["event_id", col]), norm(spill, ["event_id", col]),
            check_dtype=True, obj=op.__name__)

    big = cap_per_key(ds, key_col="user_id",
                      order_cols=["ts", "event_id"], n=7, nb=2).to_pandas()
    spill = cap_per_key(ds, key_col="user_id",
                        order_cols=["ts", "event_id"], n=7, nb=2,
                        max_bucket_rows=37).to_pandas()
    assert (sorted(big["event_id"].tolist())
            == sorted(spill["event_id"].tolist()))


def test_windows_randomized_duckdb_parity(ray_session):
    # seeded fuzz over the Arrow-native window finishers: null keys,
    # duplicate order values (unique tiebreaker appended), negative
    # values — engine vs DuckDB window functions
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.windows import (
        cumsum_per_key, dense_rank_per_key, lag_per_key, rank_per_key)

    rng = np.random.default_rng(11)
    for _ in range(2):
        n = 120
        df = pd.DataFrame({
            "user_id": np.where(rng.random(n) < 0.1, np.nan,
                                rng.integers(0, 8, n).astype(float)),
            "ts": pd.to_datetime(rng.integers(0, 20, n), unit="h"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.integers(-50, 50, n).astype(np.int64),
        })
        ds = rd.from_pandas(df).repartition(4)

        got = rank_per_key(ds, key_col="user_id",
                           order_cols=["ts", "event_id"],
                           nb=4).to_pandas().sort_values("event_id")
        want = duckdb.sql(
            "SELECT event_id, row_number() OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) AS rn FROM df ORDER BY event_id").df()
        assert got.rn.tolist() == want.rn.tolist()

        got = dense_rank_per_key(ds, key_col="user_id", order_col="value",
                                 ascending=True,
                                 nb=4).to_pandas().sort_values("event_id")
        want = duckdb.sql(
            "SELECT event_id, dense_rank() OVER (PARTITION BY user_id"
            " ORDER BY value) AS dr FROM df ORDER BY event_id").df()
        assert got.drank.tolist() == want.dr.tolist()

        got = cumsum_per_key(ds, key_col="user_id", value_col="value",
                             order_cols=["ts", "event_id"],
                             nb=4).to_pandas().sort_values("event_id")
        want = duckdb.sql(
            "SELECT event_id, sum(value) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS cv"
            " FROM df ORDER BY event_id").df()
        assert got.cum_value.tolist() == want.cv.tolist()

        got = lag_per_key(ds, key_col="user_id", value_col="value",
                          order_cols=["ts", "event_id"],
                          nb=4).to_pandas().sort_values("event_id")
        want = duckdb.sql(
            "SELECT event_id, lag(value) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id) AS lg FROM df ORDER BY event_id").df()
        gl = got.set_index("event_id")["prev"]
        wl = want.set_index("event_id").lg
        assert ((gl.isna() == wl.isna()) & ((gl == wl) | gl.isna())).all()


def test_cumsum_float_nulls_nan_duckdb_parity(ray_session):
    """r03 ADVICE (medium): float NULLs/NaNs in cumsum_per_key. DuckDB
    semantics (verified): NULL until the partition's first non-null,
    NULL rows after that carry the running sum, a non-null NaN poisons
    its own partition's tail only. Built as a pa.Table (not pandas —
    pandas→duckdb turns NaN into NULL and the case vanishes)."""
    import duckdb
    import numpy as np

    from biosd_feature_annotator_ray.stages.windows import cumsum_per_key

    rng = np.random.default_rng(23)
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        n = 150
        vals = rng.normal(0, 10, n)
        nanmask = rng.random(n) < 0.08
        nullmask = (rng.random(n) < 0.15) & ~nanmask
        vals[nanmask] = np.nan
        varr = pa.array(vals, pa.float64(), mask=nullmask)
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 6, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 30, n).astype("datetime64[s]").astype("datetime64[us]")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": varr,
        })
        got = cumsum_per_key(rd.from_arrow(t).repartition(4),
                             key_col="user_id", value_col="value",
                             order_cols=["ts", "event_id"],
                             nb=4).to_pandas().sort_values("event_id")
        want = duckdb.sql(
            "SELECT event_id, sum(value) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS cv"
            " FROM t ORDER BY event_id").df()
        gv = got["cum_value"].to_numpy()
        wv = want["cv"].to_numpy()
        assert (np.isnan(gv) == np.isnan(wv)).all()
        ok = ~np.isnan(gv)
        assert np.allclose(gv[ok], wv[ok], atol=1e-9)
        # NULL-vs-NaN distinction at the Arrow level: pandas erases it
        # (NULL→NaN), so compare the engine's Arrow output against
        # DuckDB's Arrow output validity bitmaps directly
        eng = cumsum_per_key(rd.from_arrow(t), key_col="user_id",
                             value_col="value",
                             order_cols=["ts", "event_id"], nb=2)
        import ray as _ray
        et = pa.concat_tables(
            [_ray.get(r) for r in eng.to_arrow_refs()]).sort_by("event_id")
        warr = duckdb.sql(
            "SELECT event_id, sum(value) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS cv"
            " FROM t ORDER BY event_id").arrow()
        assert et.column("cum_value").is_null().to_pylist() == \
            warr.column("cv").is_null().to_pylist()


def test_cumsum_integer_leading_nulls(ray_session):
    """r03 ADVICE (low): a key whose leading rows are all NULL must get
    NULL cum_value until the first non-null (SQL parity), in int64."""
    from biosd_feature_annotator_ray.stages.windows import cumsum_per_key

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(np.arange(5).astype("datetime64[s]").astype("datetime64[us]")),
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "value": pa.array([None, None, 7, None, 4], pa.int64()),
    })
    out = cumsum_per_key(rd.from_arrow(t), key_col="user_id",
                         value_col="value",
                         order_cols=["ts", "event_id"], nb=2)
    df = out.to_pandas().sort_values("event_id")
    got = df["cum_value"].tolist()
    import duckdb
    want = duckdb.sql(
        "SELECT sum(value) OVER (PARTITION BY user_id ORDER BY ts,"
        " event_id ROWS UNBOUNDED PRECEDING) cv FROM t ORDER BY event_id"
    ).df()["cv"]
    assert [None if pd.isna(x) else int(x) for x in got] == \
        [None if pd.isna(x) else int(x) for x in want]


def test_converted_finishers_null_duckdb_parity(ray_session):
    """r03 verdict item 4 guard: the Arrow-native conversions of the
    former pandas finishers keep DuckDB window semantics under null
    keys AND null/NaN-free values with duplicates — dense_rank /
    percent_rank / cume_dist rank the null-value block NULLS-LAST like
    DuckDB, first/last/nth take the order-first row even when null,
    rolling mean/max skip nulls."""
    import duckdb

    from biosd_feature_annotator_ray.stages.windows import (
        cume_dist_per_key, dense_rank_per_key, first_value_per_key,
        last_value_per_key, nth_value_per_key, ntile_per_key,
        percent_rank_per_key, rolling_extreme_per_key,
        rolling_mean_per_key)

    for seed in (7, 19):
        rng = np.random.default_rng(seed)
        n = 160
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 6, n), pa.int64(),
                                mask=rng.random(n) < 0.1),
            "ts": pa.array(rng.integers(0, 40, n).astype("datetime64[s]")
                           .astype("datetime64[us]")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(rng.integers(-9, 9, n).astype(np.float64),
                              pa.float64(), mask=rng.random(n) < 0.15),
        })
        ds = rd.from_arrow(t).repartition(3)

        def eng(op, col, **kw):
            got = op(ds, key_col="user_id", **kw).to_pandas()
            return got.sort_values("event_id")[col].to_numpy()

        def ora(expr):
            return duckdb.sql(
                f"SELECT event_id, {expr} AS x FROM t ORDER BY event_id"
            ).df()["x"].to_numpy()

        def close(a, b):
            an, bn = pd.isna(a), pd.isna(b)
            assert (an == bn).all()
            assert np.allclose(a[~an].astype(float),
                               b[~bn].astype(float), atol=1e-12)

        close(eng(dense_rank_per_key, "drank", order_col="value",
                  ascending=True),
              ora("dense_rank() OVER (PARTITION BY user_id ORDER BY value)"))
        close(eng(percent_rank_per_key, "prank", order_col="value"),
              ora("percent_rank() OVER (PARTITION BY user_id ORDER BY value)"))
        close(eng(cume_dist_per_key, "cdist", order_col="value"),
              ora("cume_dist() OVER (PARTITION BY user_id ORDER BY value)"))
        close(eng(ntile_per_key, "tile", order_cols=["ts", "event_id"],
                  n_tiles=3),
              ora("ntile(3) OVER (PARTITION BY user_id"
                  " ORDER BY ts, event_id)"))
        close(eng(first_value_per_key, "first_value", value_col="value",
                  order_cols=["ts", "event_id"]),
              ora("first_value(value) OVER (PARTITION BY user_id"
                  " ORDER BY ts, event_id)"))
        close(eng(last_value_per_key, "last_value", value_col="value",
                  order_cols=["ts", "event_id"]),
              ora("last_value(value) OVER (PARTITION BY user_id"
                  " ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING"
                  " AND UNBOUNDED FOLLOWING)"))
        close(eng(nth_value_per_key, "nth_value", n=2, value_col="value",
                  order_cols=["ts", "event_id"]),
              ora("nth_value(value, 2) OVER (PARTITION BY user_id"
                  " ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING"
                  " AND UNBOUNDED FOLLOWING)"))
        close(eng(rolling_mean_per_key, "mov_avg", value_col="value",
                  order_cols=["ts", "event_id"], window=3),
              ora("avg(value) OVER (PARTITION BY user_id"
                  " ORDER BY ts, event_id ROWS 2 PRECEDING)"))
        close(eng(rolling_extreme_per_key, "mov_max", value_col="value",
                  order_cols=["ts", "event_id"], window=4, mode="max"),
              ora("max(value) OVER (PARTITION BY user_id"
                  " ORDER BY ts, event_id ROWS 3 PRECEDING)"))


def test_rank_family_nan_order_values_duckdb(ray_session):
    """r04 review: non-null float NaN order values must form ONE tie
    block (DuckDB ties NaNs together; pc.equal(NaN,NaN) is false)."""
    import duckdb

    from biosd_feature_annotator_ray.stages.windows import (
        cume_dist_per_key, dense_rank_per_key, percent_rank_per_key)

    rng = np.random.default_rng(77)
    n = 120
    vals = rng.integers(-5, 5, n).astype(np.float64)
    vals[rng.random(n) < 0.15] = np.nan      # genuine NaN (not null)
    nullmask = (rng.random(n) < 0.1) & ~np.isnan(vals)
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 4, n), pa.int64(),
                            mask=rng.random(n) < 0.08),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "value": pa.array(vals, pa.float64(), mask=nullmask),
    })
    ds = rd.from_arrow(t).repartition(3)
    for op, col, expr in [
        (dense_rank_per_key, "drank",
         "dense_rank() OVER (PARTITION BY user_id ORDER BY value)"),
        (percent_rank_per_key, "prank",
         "percent_rank() OVER (PARTITION BY user_id ORDER BY value)"),
        (cume_dist_per_key, "cdist",
         "cume_dist() OVER (PARTITION BY user_id ORDER BY value)"),
    ]:
        kw = {"ascending": True} if op is dense_rank_per_key else {}
        got = (op(ds, key_col="user_id", order_col="value", nb=2, **kw)
               .to_pandas().sort_values("event_id")[col].to_numpy())
        want = duckdb.sql(
            f"SELECT event_id, {expr} AS x FROM t ORDER BY event_id"
        ).df()["x"].to_numpy()
        assert np.allclose(got.astype(float), want.astype(float),
                           atol=1e-12), col


def test_session_windows_null_ts_no_wrap(ray_session):
    """r04 review: a NaT timestamp must not wrap int64 and force a
    spurious session break (old pandas semantics: NaT diff > gap is
    False -> the row merges into the running session)."""
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([0, 60, None, 120],
                       pa.timestamp("us")),
    })
    out = session_windows(rd.from_arrow(t), key_col="user_id",
                          gap=pd.Timedelta(minutes=30),
                          order_tiebreak="event_id", nb=2).to_pandas()
    # all four events in ONE session (NaT sorts last, does not break)
    assert len(out) == 1 and int(out.loc[0, "n_events"]) == 4


def test_ffill_spill_matches_vector_path():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.windows import ffill_per_key

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        uid = 1 if i < 300 else (2 + i % 3)  # one hot key
        v = None if rng.random() < 0.5 else float(i)
        rows.append({"event_id": i, "user_id": uid,
                     "ts": 1000 + i, "value": v})
    # a key whose leading rows are all null
    rows += [{"event_id": 1000 + j, "user_id": 9,
              "ts": 1, "value": None} for j in range(3)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    key = ["event_id"]
    a = (ffill_per_key(ds, nb=4).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (ffill_per_key(ds, nb=4, max_bucket_rows=37).to_pandas()
         .sort_values(key).reset_index(drop=True))
    assert a.filled.equals(b.filled)
    # all-null key stays null
    assert a[a.user_id == 9].filled.isna().all()
    # filled is last non-null at or before, per pandas reference
    import pandas as pd

    df = pd.DataFrame(rows).sort_values(["user_id", "ts", "event_id"])
    ref = df.groupby("user_id")["value"].ffill()
    df["ref"] = ref
    df = df.sort_values(key).reset_index(drop=True)
    assert a.filled.equals(df.ref)


def test_topk_per_key_spill_parity_and_reference():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.windows import topk_per_key

    rows = [{"k": i % 5, "v": (i * 13) % 40, "id": i}
            for i in range(200)]
    rows.append({"k": 1, "v": None, "id": 999})  # null orders last
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    key = ["k", "v", "id"]
    a = (topk_per_key(ds, "k", ["v", "id"], 3,
                      ascending=[False, True], nb=4).to_pandas()
         .sort_values(key).reset_index(drop=True)[key])
    b = (topk_per_key(ds, "k", ["v", "id"], 3,
                      ascending=[False, True], nb=4,
                      max_bucket_rows=17).to_pandas()
         .sort_values(key).reset_index(drop=True)[key])
    df = pd.DataFrame(rows).sort_values(
        ["k", "v", "id"], ascending=[True, False, True])
    ref = (df.groupby("k").head(3)
           .sort_values(key).reset_index(drop=True)[key])
    pd.testing.assert_frame_equal(a, ref, check_dtype=False)
    pd.testing.assert_frame_equal(b, ref, check_dtype=False)
    assert 999 not in set(a.id)
    import pytest

    with pytest.raises(ValueError, match="k must"):
        topk_per_key(ds, "k", ["v"], 0)
