"""Bag-semantics set ops, rolling extremes, global row_number."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _ids(vals):
    return rd.from_arrow(pa.table({"id": pa.array(vals, pa.int64())}))


def test_set_op_all_matches_counter(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import set_op_all

    rng = np.random.default_rng(3)
    a = list(rng.integers(0, 12, 200))
    b = list(rng.integers(0, 12, 150))
    ca, cb = Counter(a), Counter(b)
    got_i = Counter(set_op_all(_ids(a), _ids(b), "id", op="intersect",
                               nb=4).to_pandas()["id"])
    want_i = Counter({k: min(ca[k], cb[k]) for k in ca if k in cb})
    assert got_i == +want_i
    got_e = Counter(set_op_all(_ids(a), _ids(b), "id", op="except",
                               nb=4).to_pandas()["id"])
    want_e = Counter({k: ca[k] - cb.get(k, 0) for k in ca
                      if ca[k] > cb.get(k, 0)})
    assert got_e == +want_e


def test_set_op_all_nulls_compare_equal(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import set_op_all

    a = rd.from_arrow(pa.table({"id": pa.array([1, None, None, None],
                                               pa.int64())}))
    b = rd.from_arrow(pa.table({"id": pa.array([None, None, 2], pa.int64())}))
    out = set_op_all(a, b, "id", op="intersect", nb=2).to_pandas()
    assert len(out) == 2 and out["id"].isna().all()
    out_e = set_op_all(a, b, "id", op="except", nb=2).to_pandas()
    # 3 nulls minus 2 nulls → one null survives, plus the 1
    assert sorted(out_e["id"].fillna(-1)) == [-1, 1]


def test_rolling_extreme_vs_pandas(ray_session):
    from biosd_feature_annotator_ray.stages.windows import rolling_extreme_per_key

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10_000, n), unit="s"),
        "value": np.round(rng.uniform(-50, 50, n), 2),
    })
    for mode in ("max", "min"):
        out = (rolling_extreme_per_key(rd.from_pandas(df), window=5,
                                       mode=mode, out="m", nb=4)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        sdf = df.sort_values(["user_id", "ts", "event_id"])
        r = sdf.groupby("user_id")["value"].rolling(5, min_periods=1)
        sdf["m"] = (r.max() if mode == "max" else r.min()).to_numpy()
        want = sdf.sort_values("event_id")["m"].to_numpy()
        assert np.array_equal(out["m"].to_numpy(), want)


def test_global_row_number_total_order_with_ties(ray_session):
    from biosd_feature_annotator_ray.stages.windows import global_row_number

    rng = np.random.default_rng(7)
    n = 500
    # heavy ties in the leading column — some tie runs will straddle
    # would-be partition boundaries; range tags keep equal values in
    # ONE partition so ranks stay globally correct
    df = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "v": rng.integers(0, 25, n).astype(np.float64),
    })
    out = (global_row_number(rd.from_pandas(df), order_cols=["v", "k"],
                             n_parts=8)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = df.sort_values(["v", "k"]).assign(
        rn=np.arange(1, n + 1)).sort_values("k")["rn"].to_numpy()
    assert np.array_equal(out["rn"].to_numpy(), want)
