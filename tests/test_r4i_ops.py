"""Thirteenth-sitting statistics / sketch / window operators:
contingency chi-square, Welch t-test, per-key diversity, KMV set
sketches, rolling median, per-key ACF, and the gini / IFP-sameAs
compositions' building blocks."""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.sketches import (
    contingency_stats, diversity_per_key, kmv_setops, welch_ttest)
from biosd_feature_annotator_ray.stages.windows import (
    acf_per_key, rolling_median_per_key)


# --- contingency_stats -----------------------------------------------------

def test_contingency_independent_columns_chi2_zero():
    # perfectly independent 2x2 with equal counts -> chi2 == 0, mi == 0
    a = ["x", "x", "y", "y"] * 25
    b = ["p", "q", "p", "q"] * 25
    ds = rd.from_arrow(pa.table({"a": a, "b": b}))
    t = contingency_stats(ds, "a", "b")
    assert t.column("n")[0].as_py() == 100
    assert t.column("dof")[0].as_py() == 1
    assert t.column("chi2")[0].as_py() == pytest.approx(0.0, abs=1e-9)
    assert t.column("cramers_v")[0].as_py() == pytest.approx(0.0)
    assert t.column("mi")[0].as_py() == pytest.approx(0.0, abs=1e-9)


def test_contingency_perfect_dependence():
    # b fully determined by a -> cramers_v == 1, mi == H(a) == ln 2
    a = ["x"] * 30 + ["y"] * 30
    b = ["p"] * 30 + ["q"] * 30
    t = contingency_stats(rd.from_arrow(pa.table({"a": a, "b": b})),
                          "a", "b")
    assert t.column("chi2")[0].as_py() == pytest.approx(60.0)
    assert t.column("cramers_v")[0].as_py() == pytest.approx(1.0)
    assert t.column("mi")[0].as_py() == pytest.approx(
        math.log(2), abs=1e-6)


def test_contingency_nulls_excluded_and_degenerate():
    t = contingency_stats(rd.from_arrow(pa.table({
        "a": ["x", "x", None, "x"],
        "b": ["p", "q", "p", None]})), "a", "b")
    # only 2 rows survive; single row-category -> dof 0 -> nulls
    assert t.column("n")[0].as_py() == 2
    assert t.column("r")[0].as_py() == 1
    assert t.column("chi2")[0].as_py() is None
    assert t.column("mi")[0].as_py() is None


def test_contingency_matches_duckdb_fuzz():
    import duckdb

    rng = random.Random(131)
    for trial in range(5):
        n = 400
        a = [rng.choice("abc") for _ in range(n)]
        b = [rng.choice("pqrs") for _ in range(n)]
        got = contingency_stats(
            rd.from_arrow(pa.table({"a": a, "b": b})), "a", "b")
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"a": a, "b": b}))
        ref = con.execute(
            "WITH cen AS (SELECT a, b, count(*)*1.0 AS o FROM t"
            "  GROUP BY a, b),"
            " ra AS (SELECT a, sum(o) c FROM cen GROUP BY a),"
            " cb AS (SELECT b, sum(o) c FROM cen GROUP BY b),"
            " nn AS (SELECT sum(o) n FROM cen)"
            " SELECT sum(cen.o*cen.o*nn.n/(ra.c*cb.c)) - max(nn.n),"
            "  sum((cen.o/nn.n)*ln(cen.o*nn.n/(ra.c*cb.c)))"
            " FROM cen JOIN ra USING (a) JOIN cb USING (b), nn"
        ).fetchone()
        assert got.column("chi2")[0].as_py() == pytest.approx(
            ref[0], abs=1e-5), trial
        assert got.column("mi")[0].as_py() == pytest.approx(
            ref[1], abs=1e-5), trial


# --- welch_ttest -----------------------------------------------------------

def _welch_ref(xa, xb):
    na, nb = len(xa), len(xb)
    ma, mb = sum(xa) / na, sum(xb) / nb
    va = sum((x - ma) ** 2 for x in xa) / (na - 1)
    vb = sum((x - mb) ** 2 for x in xb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 ** 2 / ((va / na) ** 2 / (na - 1)
                     + (vb / nb) ** 2 / (nb - 1))
    return t, df


def test_welch_matches_reference():
    rng = random.Random(7)
    xa = [rng.gauss(10.0, 2.0) for _ in range(80)]
    xb = [rng.gauss(9.0, 5.0) for _ in range(120)]
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 80 + ["b"] * 120, "x": xa + xb}))
    got = welch_ttest(ds, "g", "x", "a", "b", round_to=6)
    t, df = _welch_ref(xa, xb)
    assert got.column("n_a")[0].as_py() == 80
    assert got.column("n_b")[0].as_py() == 120
    assert got.column("t_stat")[0].as_py() == pytest.approx(t, abs=1e-4)
    assert got.column("df")[0].as_py() == pytest.approx(df, abs=1e-2)


def test_welch_degenerate_groups():
    # group b has a single value -> no variance -> t/df null
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "b"], "x": [1.0, 2.0, 3.0, 9.0]}))
    got = welch_ttest(ds, "g", "x", "a", "b")
    assert got.column("n_b")[0].as_py() == 1
    assert got.column("mean_b")[0].as_py() == pytest.approx(9.0)
    assert got.column("var_b")[0].as_py() is None
    assert got.column("t_stat")[0].as_py() is None
    # missing group entirely -> n 0, all-null stats
    got2 = welch_ttest(ds, "g", "x", "a", "zzz")
    assert got2.column("n_b")[0].as_py() == 0
    assert got2.column("mean_b")[0].as_py() is None


def test_welch_skips_null_values():
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "b", "b", "b"],
        "x": [1.0, None, 3.0, 4.0, 6.0, None]}))
    got = welch_ttest(ds, "g", "x", "a", "b")
    assert got.column("n_a")[0].as_py() == 2
    assert got.column("n_b")[0].as_py() == 2
    assert got.column("mean_a")[0].as_py() == pytest.approx(2.0)
    assert got.column("mean_b")[0].as_py() == pytest.approx(5.0)


# --- diversity_per_key -----------------------------------------------------

def test_diversity_known_values():
    ds = rd.from_arrow(pa.table({
        "k": ["u", "u", "u", "u", "v", "v", "w", None],
        "c": ["a", "b", "a", "b", "a", None, None, "a"]}))
    out = {r["k"]: r for r in
           diversity_per_key(ds, "k", "c", nb=2).take_all()}
    # u: 2+2 -> uniform over 2 cats
    assert out["u"]["n"] == 4 and out["u"]["k_distinct"] == 2
    assert out["u"]["shannon"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["u"]["simpson"] == pytest.approx(0.5)
    # v: single surviving category -> zero entropy, simpson 1
    assert out["v"]["n"] == 1 and out["v"]["shannon"] == 0.0
    assert out["v"]["simpson"] == 1.0
    # w had only a null category; null key row dropped too
    assert "w" not in out and None not in out


# --- kmv_setops ------------------------------------------------------------

def test_kmv_exact_below_k():
    # fewer distinct items than k on both sides -> exact counts and
    # exact inclusion-exclusion intersection
    ga = [f"i{j}" for j in range(30)]
    gb = [f"i{j}" for j in range(20, 50)]
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 30 + ["b"] * 30, "i": ga + gb}))
    got = kmv_setops(ds, "g", "i", "a", "b", k=256)
    assert got.column("est_a")[0].as_py() == 30.0
    assert got.column("est_b")[0].as_py() == 30.0
    assert got.column("est_union")[0].as_py() == 50.0
    assert got.column("est_intersect")[0].as_py() == 10.0


def test_kmv_estimates_within_tolerance_and_deterministic():
    # 3000 distinct per side, 1000 shared; k=256 -> ~6% rse
    ga = [f"x{j}" for j in range(3000)]
    gb = [f"x{j}" for j in range(2000, 5000)]
    tbl = pa.table({"g": ["a"] * 3000 + ["b"] * 3000, "i": ga + gb})
    got1 = kmv_setops(rd.from_arrow(tbl), "g", "i", "a", "b", k=256)
    got2 = kmv_setops(rd.from_arrow(tbl), "g", "i", "a", "b", k=256)
    assert got1.equals(got2)  # md5 draw -> run-independent
    ea = got1.column("est_a")[0].as_py()
    eu = got1.column("est_union")[0].as_py()
    assert abs(ea - 3000) / 3000 < 0.2
    assert abs(eu - 5000) / 5000 < 0.2


def test_kmv_duplicates_dont_inflate():
    # heavy duplication of one item must not change distinct estimates
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 100 + ["b"] * 3,
        "i": ["same"] * 100 + ["same", "other", "other"]}))
    got = kmv_setops(ds, "g", "i", "a", "b", k=16)
    assert got.column("est_a")[0].as_py() == 1.0
    assert got.column("est_b")[0].as_py() == 2.0
    assert got.column("est_union")[0].as_py() == 2.0
    assert got.column("est_intersect")[0].as_py() == 1.0


# --- rolling_median_per_key ------------------------------------------------

def _median_fuzz_table(rng, n_keys=6, n_rows=400):
    ks, ts, vs = [], [], []
    for i in range(n_rows):
        ks.append(rng.randrange(n_keys))
        ts.append(i)
        vs.append(None if rng.random() < 0.25
                  else round(rng.uniform(-50, 50), 3))
    return pa.table({"user_id": pa.array(ks, pa.int64()),
                     "ts": pa.array(ts, pa.int64()),
                     "event_id": pa.array(ts, pa.int64()),
                     "value": pa.array(vs, pa.float64())})


@pytest.mark.parametrize("window", [1, 2, 5])
def test_rolling_median_matches_duckdb(window):
    import duckdb

    rng = random.Random(17 + window)
    t = _median_fuzz_table(rng)
    got = rolling_median_per_key(
        rd.from_arrow(t), key_col="user_id", value_col="value",
        order_cols=["ts", "event_id"], window=window, nb=3
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute(
        f"SELECT event_id, median(value) OVER (PARTITION BY user_id"
        f" ORDER BY ts, event_id ROWS BETWEEN {window - 1} PRECEDING"
        f" AND CURRENT ROW) AS m FROM t ORDER BY event_id"
    ).df()
    g = got["mov_median"].to_numpy()
    r = ref["m"].to_numpy()
    both_nan = np.isnan(g) & np.isnan(r)
    assert np.all(both_nan | (np.abs(g - r) < 1e-9))


def test_rolling_median_all_null_frame_and_bounds():
    ds = rd.from_arrow(pa.table({
        "user_id": [1, 1, 1], "ts": [1, 2, 3], "event_id": [1, 2, 3],
        "value": pa.array([None, None, 4.0], pa.float64())}))
    out = rolling_median_per_key(ds, window=2, nb=1).to_pandas()
    out = out.sort_values("event_id")
    assert np.isnan(out["mov_median"].iloc[0])
    assert np.isnan(out["mov_median"].iloc[1])
    assert out["mov_median"].iloc[2] == 4.0
    with pytest.raises(ValueError):
        rolling_median_per_key(ds, window=0)
    with pytest.raises(ValueError):
        rolling_median_per_key(ds, window=2000)


# --- acf_per_key -----------------------------------------------------------

def test_acf_matches_pandas():
    rng = random.Random(23)
    rows = []
    for k in range(4):
        prev = 0.0
        for i in range(60):
            prev = 0.7 * prev + rng.gauss(0, 1)
            rows.append((k, i, prev))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "value": pa.array([r[2] for r in rows], pa.float64())})
    got = acf_per_key(rd.from_arrow(t), max_lag=2, nb=2).to_pandas()
    df = t.to_pandas()
    for k in range(4):
        s = df[df.user_id == k].sort_values(["ts", "event_id"])["value"]
        for lag in (1, 2):
            ref = s.corr(s.shift(lag))
            row = got[(got.user_id == k) & (got.lag == lag)]
            assert len(row) == 1
            assert row["acf"].iloc[0] == pytest.approx(ref, abs=1e-3)
            assert row["n_pairs"].iloc[0] == len(s) - lag


def test_acf_constant_and_short_series_null():
    t = pa.table({
        "user_id": [1, 1, 1, 2],
        "ts": [1, 2, 3, 1],
        "event_id": [1, 2, 3, 4],
        "value": pa.array([5.0, 5.0, 5.0, 7.0], pa.float64())})
    got = acf_per_key(rd.from_arrow(t), max_lag=1, nb=1).to_pandas()
    # constant series: zero variance -> null; single row: 0 pairs
    r1 = got[got.user_id == 1].iloc[0]
    r2 = got[got.user_id == 2].iloc[0]
    assert pd.isna(r1["acf"]) and r1["n_pairs"] == 2
    assert pd.isna(r2["acf"]) and r2["n_pairs"] == 0


def test_acf_skips_null_values():
    # nulls break pairs on either side, matching SQL corr-over-lag
    import duckdb

    t = pa.table({
        "user_id": [1] * 8,
        "ts": list(range(8)),
        "event_id": list(range(8)),
        "value": pa.array([1.0, None, 3.0, 4.0, None, 6.0, 7.5, 8.0],
                          pa.float64())})
    got = acf_per_key(rd.from_arrow(t), max_lag=1, nb=1).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ref = con.execute(
        "SELECT corr(value, lv) FROM (SELECT value, lag(value) OVER"
        " (ORDER BY ts, event_id) AS lv FROM t)").fetchone()[0]
    assert got["acf"].iloc[0] == pytest.approx(ref, abs=1e-4)
