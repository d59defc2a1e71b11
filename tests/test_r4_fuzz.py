"""Round-4 randomized DuckDB parity fuzzes (r03 verdict item 9): the
round-3 lesson is that null/NaN/dup-key fuzzes catch what example tests
miss. Targets: rollup / pivot / melt, grouped moments / corr / nunique,
and the interval join."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _cents(rng, n):
    return np.round(rng.normal(0, 50, n), 2)


def test_rollup_fuzz_duckdb(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import rollup_agg

    for seed in range(3):
        rng = np.random.default_rng(200 + seed)
        n = 400
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q", "r", "s"], n),
            "v": _cents(rng, n),
        })
        got = (rollup_agg(rd.from_pandas(df).repartition(3), ["a", "b"], "v")
               .to_pandas()
               .sort_values(["a", "b"], na_position="first")
               .reset_index(drop=True))
        want = duckdb.sql(
            "SELECT a, b, CAST(count(*) AS BIGINT) AS n_rows,"
            " round(sum(v), 2) AS sum_value FROM df GROUP BY ROLLUP(a, b)"
            " ORDER BY a NULLS FIRST, b NULLS FIRST").df()
        assert got["n_rows"].tolist() == want["n_rows"].tolist()
        assert np.allclose(np.round(got["sum_value"], 2),
                           want["sum_value"], atol=1e-9)


def test_pivot_fuzz_duckdb(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import pivot_sum

    cats = ["c0", "c1", "c2"]
    for seed in range(3):
        rng = np.random.default_rng(300 + seed)
        n = 300
        df = pd.DataFrame({
            "k": np.where(rng.random(n) < 0.1, np.nan,
                          rng.integers(0, 12, n).astype(float)),
            "cat": rng.choice(cats, n),
            "v": _cents(rng, n),
        })
        got = (pivot_sum(rd.from_pandas(df).repartition(3), "k", "cat",
                         "v", cats).to_pandas()
               .sort_values("k", na_position="first").reset_index(drop=True))
        want = duckdb.sql(
            "SELECT k,"
            + ",".join(
                f" round(coalesce(sum(CASE WHEN cat='{c}' THEN v END), 0),"
                f" 2) AS {c}" for c in cats)
            + " FROM df GROUP BY k ORDER BY k NULLS FIRST").df()
        assert len(got) == len(want), (len(got), len(want))
        for c in cats:
            assert np.allclose(np.round(got[c].to_numpy(), 2),
                               want[c].to_numpy(), atol=1e-9), c


def test_melt_fuzz_duckdb(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import melt

    rng = np.random.default_rng(17)
    n = 200
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "m1": _cents(rng, n), "m2": _cents(rng, n), "m3": _cents(rng, n),
    })
    got = (melt(rd.from_pandas(df).repartition(3), "id",
                ["m1", "m2", "m3"]).to_pandas()
           .sort_values(["id", "variable"]).reset_index(drop=True))
    want = duckdb.sql(
        "SELECT id, variable, value FROM ("
        " SELECT id, 'm1' AS variable, m1 AS value FROM df UNION ALL"
        " SELECT id, 'm2', m2 FROM df UNION ALL"
        " SELECT id, 'm3', m3 FROM df) ORDER BY id, variable").df()
    assert got["variable"].tolist() == want["variable"].tolist()
    assert np.allclose(got["value"], want["value"], atol=1e-12)


def test_grouped_moments_corr_nunique_fuzz_duckdb(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import groupby_nunique
    from biosd_feature_annotator_ray.stages.sketches import (
        grouped_corr, grouped_moments)

    for seed in range(3):
        rng = np.random.default_rng(400 + seed)
        n = 500
        df = pd.DataFrame({
            "k": np.where(rng.random(n) < 0.08, np.nan,
                          rng.integers(0, 7, n).astype(float)),
            "x": np.where(rng.random(n) < 0.1, np.nan, rng.normal(0, 3, n)),
            "y": np.where(rng.random(n) < 0.1, np.nan, rng.normal(5, 2, n)),
            "c": rng.choice(list("abcdefgh"), n),
        })
        ds = rd.from_pandas(df).repartition(4)

        got = (grouped_moments(ds, "k", "x", round_to=5).to_pandas()
               .sort_values("k", na_position="first").reset_index(drop=True))
        want = duckdb.sql(
            "SELECT k, round(skewness(x), 5) AS skewness,"
            " round(kurtosis(x), 5) AS kurtosis FROM df GROUP BY k"
            " ORDER BY k NULLS FIRST").df()
        for c in ("skewness", "kurtosis"):
            gv, wv = got[c].to_numpy(), want[c].to_numpy()
            assert (np.isnan(gv) == np.isnan(wv)).all(), c
            ok = ~np.isnan(gv)
            # raw power sums vs DuckDB's streaming moments: both round
            # to 5, allow one ulp of the rounded grid
            assert np.allclose(gv[ok], wv[ok], atol=2e-5), c

        got = (grouped_corr(ds, "k", "x", "y", round_to=6).to_pandas()
               .sort_values("k", na_position="first").reset_index(drop=True))
        want = duckdb.sql(
            "SELECT k, round(corr(x, y), 6) AS corr_xy FROM df GROUP BY k"
            " ORDER BY k NULLS FIRST").df()
        gv, wv = got["corr_xy"].to_numpy(), want["corr_xy"].to_numpy()
        assert (np.isnan(gv) == np.isnan(wv)).all()
        ok = ~np.isnan(gv)
        assert np.allclose(gv[ok], wv[ok], atol=2e-6)

        got = (groupby_nunique(ds, "k", "c", nb=8).to_pandas()
               .sort_values("k", na_position="first").reset_index(drop=True))
        want = duckdb.sql(
            "SELECT k, CAST(count(DISTINCT c) AS BIGINT) AS n_distinct"
            " FROM df GROUP BY k ORDER BY k NULLS FIRST").df()
        assert got["n_distinct"].tolist() == want["n_distinct"].tolist()


def test_interval_join_fuzz_duckdb(ray_session):
    """Null keys, null bounds, duplicate timestamps, points exactly on
    interval edges — engine (merge_asof path, non-overlapping
    intervals) vs the SQL range join."""
    from biosd_feature_annotator_ray.stages.join import interval_join

    for seed in range(3):
        rng = np.random.default_rng(500 + seed)
        nl, keys = 300, 6
        lft = pd.DataFrame({
            "k": np.where(rng.random(nl) < 0.1, np.nan,
                          rng.integers(0, keys, nl).astype(float)),
            "ts": rng.integers(0, 1000, nl).astype("datetime64[s]")
            .astype("datetime64[us]"),
            "lid": np.arange(nl, dtype=np.int64),
        })
        # non-overlapping intervals per key, some null-key/null-bound
        rows = []
        rid = 0
        for k in range(keys):
            t = 0
            while t < 1000:
                dur = int(rng.integers(20, 120))
                gap = int(rng.integers(0, 80))
                rows.append({"k": float(k), "start": t, "end": t + dur,
                             "rid": rid})
                rid += 1
                t += dur + gap + 1
        rgt = pd.DataFrame(rows)
        rgt.loc[rng.integers(0, len(rgt), 3), "k"] = np.nan
        for c in ("start", "end"):
            rgt[c] = rgt[c].astype("datetime64[s]").astype("datetime64[us]")
        rgt.loc[rng.integers(0, len(rgt), 2), "end"] = pd.NaT

        got = interval_join(rd.from_pandas(lft).repartition(3),
                            rd.from_pandas(rgt).repartition(2),
                            key="k", ts="ts", start="start", end="end",
                            nb=4).to_pandas()
        want = duckdb.sql(
            "SELECT l.lid, r.rid FROM lft l JOIN rgt r ON l.k = r.k"
            " AND l.ts >= r.start AND l.ts <= r.end"
            " ORDER BY lid, rid").df()
        gp = got[["lid", "rid"]].sort_values(["lid", "rid"]).reset_index(drop=True)
        assert gp["lid"].tolist() == want["lid"].tolist()
        assert gp["rid"].astype("int64").tolist() == want["rid"].tolist()

        # overlapping=True path over intervals that DO overlap
        rgt2 = rgt.copy()
        rgt2["end"] = rgt2["end"] + pd.Timedelta(seconds=60)
        got2 = interval_join(rd.from_pandas(lft).repartition(3),
                             rd.from_pandas(rgt2).repartition(2),
                             key="k", ts="ts", start="start", end="end",
                             nb=4, overlapping=True).to_pandas()
        want2 = duckdb.sql(
            "SELECT l.lid, r.rid FROM lft l JOIN rgt2 r ON l.k = r.k"
            " AND l.ts >= r.start AND l.ts <= r.end"
            " ORDER BY lid, rid").df()
        gp2 = (got2[["lid", "rid"]].sort_values(["lid", "rid"])
               .reset_index(drop=True))
        assert gp2["lid"].tolist() == want2["lid"].tolist()
        assert gp2["rid"].astype("int64").tolist() == want2["rid"].tolist()


def test_pct_change_fuzz_duckdb(ray_session):
    from biosd_feature_annotator_ray.stages.windows import pct_change_per_key

    for seed in range(3):
        rng = np.random.default_rng(600 + seed)
        n = 200
        vals = rng.normal(0, 5, n).round(2)
        vals[rng.random(n) < 0.05] = 0.0  # div-by-zero prev -> NULL
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 5, n), pa.int64(),
                                mask=rng.random(n) < 0.08),
            "ts": pa.array(rng.integers(0, 30, n).astype("datetime64[s]")
                           .astype("datetime64[us]")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(vals, pa.float64(),
                              mask=rng.random(n) < 0.1),
        })
        got = (pct_change_per_key(rd.from_arrow(t).repartition(3),
                                  key_col="user_id",
                                  order_cols=["ts", "event_id"], nb=4)
               .to_pandas().sort_values("event_id"))
        want = duckdb.sql(
            "SELECT event_id, value / nullif(lag(value) OVER ("
            " PARTITION BY user_id ORDER BY ts, event_id), 0) - 1 AS pc"
            " FROM t ORDER BY event_id").df()
        gv, wv = got["pct_change"].to_numpy(), want["pc"].to_numpy()
        assert (np.isnan(gv) == np.isnan(wv)).all()
        ok = ~np.isnan(gv)
        assert np.allclose(gv[ok], wv[ok], atol=1e-12)
        # spill path parity
        spill = (pct_change_per_key(rd.from_arrow(t).repartition(3),
                                    key_col="user_id",
                                    order_cols=["ts", "event_id"], nb=2,
                                    max_bucket_rows=17)
                 .to_pandas().sort_values("event_id"))
        sv = spill["pct_change"].to_numpy()
        assert (np.isnan(sv) == np.isnan(gv)).all()
        assert np.allclose(sv[~np.isnan(sv)], gv[ok], atol=1e-12)


def test_ewma_fuzz_pandas_parity(ray_session):
    """EWMA (adjust=False, nulls leave state unchanged and emit it =
    pandas ignore_na=True) vs pandas groupby().ewm() — including runs
    long enough to cross the block-rescaled prefix's internal block
    boundary (alpha=0.99 -> B=150; n per key ~800)."""
    from biosd_feature_annotator_ray.stages.windows import ewma_per_key

    for alpha in (0.3, 0.99):
        rng = np.random.default_rng(int(alpha * 100))
        n = 2500
        vals = rng.normal(0, 10, n)
        nullmask = rng.random(n) < 0.1
        t = pa.table({
            "user_id": pa.array(rng.integers(0, 3, n), pa.int64(),
                                mask=rng.random(n) < 0.05),
            "ts": pa.array(rng.integers(0, 10**6, n)
                           .astype("datetime64[s]").astype("datetime64[us]")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(vals, pa.float64(), mask=nullmask),
        })
        got = (ewma_per_key(rd.from_arrow(t).repartition(4), alpha,
                            key_col="user_id",
                            order_cols=["ts", "event_id"], nb=2)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        df = t.to_pandas().sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort")
        df["want"] = (df.groupby("user_id", dropna=False, sort=False)
                      ["value"].transform(
                          lambda s: s.ewm(alpha=alpha, adjust=False,
                                          ignore_na=True).mean()))
        want = df.sort_values("event_id").reset_index(drop=True)["want"]
        gv, wv = got["ewma"].to_numpy(), want.to_numpy()
        assert (np.isnan(gv) == np.isnan(wv)).all()
        ok = ~np.isnan(gv)
        assert np.allclose(gv[ok], wv[ok], rtol=1e-9, atol=1e-9)
        # hot-key spill path parity (r04 review: ewma must degrade,
        # not OOM): tiny slice bound, same output
        spill = (ewma_per_key(rd.from_arrow(t).repartition(4), alpha,
                              key_col="user_id",
                              order_cols=["ts", "event_id"], nb=2,
                              max_bucket_rows=97)
                 .to_pandas().sort_values("event_id")
                 .reset_index(drop=True))
        sv = spill["ewma"].to_numpy()
        assert (np.isnan(sv) == np.isnan(gv)).all()
        assert np.allclose(sv[ok], gv[ok], rtol=1e-9, atol=1e-9)


def test_cube_grouping_sets_fuzz_duckdb(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import (
        cube_agg, grouping_sets_agg)

    for seed in range(2):
        rng = np.random.default_rng(700 + seed)
        n = 300
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "c": rng.choice(["m", "n", "o"], n),
            "v": _cents(rng, n),
        })
        ds = rd.from_pandas(df).repartition(3)
        got = (cube_agg(ds, ["a", "b"], "v").to_pandas()
               .sort_values(["a", "b"], na_position="first")
               .reset_index(drop=True))
        want = duckdb.sql(
            "SELECT a, b, CAST(count(*) AS BIGINT) AS n_rows,"
            " round(sum(v), 2) AS sum_value FROM df GROUP BY CUBE(a, b)"
            " ORDER BY a NULLS FIRST, b NULLS FIRST").df()
        assert got["n_rows"].tolist() == want["n_rows"].tolist()
        assert np.allclose(np.round(got["sum_value"], 2),
                           want["sum_value"], atol=1e-9)

        got = (grouping_sets_agg(ds, ["a", "b", "c"],
                                 [["a", "c"], ["b"], []], "v")
               .to_pandas()
               .sort_values(["a", "b", "c"], na_position="first")
               .reset_index(drop=True))
        want = duckdb.sql(
            "SELECT a, b, c, CAST(count(*) AS BIGINT) AS n_rows,"
            " round(sum(v), 2) AS sum_value FROM df"
            " GROUP BY GROUPING SETS ((a, c), (b), ())"
            " ORDER BY a NULLS FIRST, b NULLS FIRST, c NULLS FIRST").df()
        assert got["n_rows"].tolist() == want["n_rows"].tolist()
        assert np.allclose(np.round(got["sum_value"], 2),
                           want["sum_value"], atol=1e-9)
    # malformed set raises
    with pytest.raises(ValueError, match="not in keys"):
        grouping_sets_agg(ds, ["a"], [["zz"]], "v")


def test_cube_grouping_id_null_keys_duckdb(ray_session):
    """GROUPING() bitmask vs DuckDB with genuinely-NULL key values —
    the exact ambiguity the column exists to resolve."""
    from biosd_feature_annotator_ray.stages.canonicalize import cube_agg

    rng = np.random.default_rng(811)
    n = 200
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", None], n),
        "b": rng.choice(["p", None], n),
        "v": _cents(rng, n),
    })
    ds = rd.from_pandas(df).repartition(3)
    got = (cube_agg(ds, ["a", "b"], "v", grouping_col="gid").to_pandas()
           .sort_values(["gid", "a", "b"], na_position="first")
           .reset_index(drop=True))
    want = duckdb.sql(
        "SELECT a, b, CAST(count(*) AS BIGINT) AS n_rows,"
        " round(sum(v), 2) AS sum_value,"
        " CAST(GROUPING(a, b) AS BIGINT) AS gid"
        " FROM df GROUP BY CUBE(a, b)"
        " ORDER BY gid, a NULLS FIRST, b NULLS FIRST").df()
    assert got["gid"].tolist() == want["gid"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    assert got["a"].fillna("∅").tolist() == want["a"].fillna("∅").tolist()
    assert got["b"].fillna("∅").tolist() == want["b"].fillna("∅").tolist()
    assert np.allclose(np.round(got["sum_value"], 2), want["sum_value"],
                       atol=1e-9)
