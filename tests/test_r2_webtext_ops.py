"""Round-2 webtext/training-data additions: cumulative sum + moving
average per key, Gopher-style repetition stats, corpus n-gram census,
distributed set ops — parity vs pandas/python reference semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture
def ev(ray_session):
    rng = np.random.default_rng(23)
    n = 1500
    return pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 30, n),
        "ts": pd.Timestamp("2024-03-01") + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "value": rng.uniform(-5, 10, n).round(3),
    })


def test_cumsum_per_key_matches_pandas(ev):
    from biosd_feature_annotator_ray.stages.windows import cumsum_per_key

    got = cumsum_per_key(rd.from_pandas(ev).repartition(5), key_col="user_id",
                         value_col="value", order_cols=["ts", "event_id"], nb=8).to_pandas()
    want = ev.sort_values(["ts", "event_id"], kind="mergesort").copy()
    want["cum_value"] = want.groupby("user_id")["value"].cumsum()
    m = got.set_index("event_id")["cum_value"].sort_index()
    w = want.set_index("event_id")["cum_value"].sort_index()
    assert np.allclose(m.to_numpy(), w.to_numpy())


def test_rolling_mean_per_key_matches_pandas(ev):
    from biosd_feature_annotator_ray.stages.windows import rolling_mean_per_key

    got = rolling_mean_per_key(rd.from_pandas(ev).repartition(5), key_col="user_id",
                               value_col="value", order_cols=["ts", "event_id"],
                               window=3, nb=8).to_pandas()
    want = ev.sort_values(["ts", "event_id"], kind="mergesort").copy()
    want["mov_avg"] = (want.groupby("user_id")["value"]
                       .transform(lambda s: s.rolling(3, min_periods=1).mean()))
    m = got.set_index("event_id")["mov_avg"].sort_index()
    w = want.set_index("event_id")["mov_avg"].sort_index()
    assert np.allclose(m.to_numpy(), w.to_numpy())


def test_repetition_stats_values(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import repetition_stats

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a a a b", "x y z", "  spam  spam  "], pa.string()),
    })
    out = repetition_stats(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens_r"] == 4
    assert out.loc[0, "distinct_ratio"] == pytest.approx(2 / 4)
    assert out.loc[0, "top_token_share"] == pytest.approx(3 / 4)
    assert out.loc[1, "distinct_ratio"] == pytest.approx(1.0)
    assert out.loc[1, "top_token_share"] == pytest.approx(1 / 3)
    assert out.loc[2, "n_tokens_r"] == 2
    assert out.loc[2, "top_token_share"] == pytest.approx(1.0)


def test_top_ngrams_counts_and_no_cross_doc_grams(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import top_ngrams

    docs = rd.from_pandas(pd.DataFrame({
        "text": ["b c", "a b c a b", "c a"] * 4,
    })).repartition(3)
    out = top_ngrams(docs, n=2, k=10).to_pandas().set_index("ngram")["n"]
    # per doc-triple: "b c" → {b c}, "a b c a b" → {a b, b c, c a, a b},
    # "c a" → {c a}; ×4 repeats
    assert out["a b"] == 8
    assert out["b c"] == 8
    assert out["c a"] == 8
    # no bigram spans document boundaries ("c b", "b c a"-style joins of
    # last+first tokens across docs would create e.g. "c a" extras or "b a"
    assert "b a" not in out.index


def test_top_ngrams_trigram(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import top_ngrams

    docs = rd.from_pandas(pd.DataFrame({"text": ["a b c d", "a b c"]}))
    out = top_ngrams(docs, n=3, k=5).to_pandas().set_index("ngram")["n"]
    assert out["a b c"] == 2
    assert out["b c d"] == 1
    assert len(out) == 2


def test_set_ops_match_python_sets(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import set_op

    rng = np.random.default_rng(7)
    a_vals = rng.integers(0, 200, 500)  # with duplicates
    b_vals = rng.integers(100, 300, 500)
    a = rd.from_pandas(pd.DataFrame({"k": a_vals})).repartition(4)
    b = rd.from_pandas(pd.DataFrame({"k": b_vals})).repartition(3)
    sa, sb = set(a_vals.tolist()), set(b_vals.tolist())
    for op, want in [("union", sa | sb), ("intersect", sa & sb), ("except", sa - sb)]:
        got = set(set_op(a, b, "k", op=op, nb=8).to_pandas()["k"].tolist())
        assert got == want, op


def test_set_op_rejects_unknown(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import set_op

    a = rd.from_items([{"k": 1}])
    with pytest.raises(ValueError):
        set_op(a, a, "k", op="xor")


def test_ntile_matches_sql_semantics(ev):
    from biosd_feature_annotator_ray.stages.windows import ntile_per_key

    got = ntile_per_key(rd.from_pandas(ev).repartition(4), key_col="user_id",
                        order_cols=["ts", "event_id"], n_tiles=4, nb=8).to_pandas()
    # reference: SQL NTILE — first (n % k) tiles get one extra row
    want = {}
    for _, g in ev.sort_values(["ts", "event_id"], kind="mergesort").groupby("user_id"):
        n = len(g)
        base, rem = divmod(n, 4)
        tiles = []
        for t in range(4):
            tiles.extend([t + 1] * (base + (1 if t < rem else 0)))
        for eid, tile in zip(g["event_id"], tiles[:n]):
            want[eid] = tile
    m = got.set_index("event_id")["tile"]
    assert all(m[eid] == t for eid, t in want.items())


def test_dense_rank_matches_pandas(ev):
    from biosd_feature_annotator_ray.stages.windows import dense_rank_per_key

    got = dense_rank_per_key(rd.from_pandas(ev).repartition(4), key_col="user_id",
                             order_col="value", ascending=False, nb=8).to_pandas()
    want = ev.copy()
    want["drank"] = (want.groupby("user_id")["value"]
                     .rank(method="dense", ascending=False).astype("int64"))
    m = got.set_index("event_id")["drank"].sort_index()
    w = want.set_index("event_id")["drank"].sort_index()
    assert (m == w).all()


def test_collect_seq_ordered(ray_session):
    from biosd_feature_annotator_ray.stages.windows import collect_seq_per_key

    df = pd.DataFrame({
        "event_id": [3, 1, 2, 10, 11],
        "user_id": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-01", "2024-01-01", "2024-01-05",
                              "2024-01-04"]),
    })
    got = collect_seq_per_key(rd.from_pandas(df).repartition(2), key_col="user_id",
                              value_col="event_id", order_cols=["ts", "event_id"],
                              nb=4).to_pandas().set_index("user_id")["seq"]
    assert got[1] == "1,2,3"
    assert got[2] == "11,10"


def test_fixed_width_histogram_counts(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import fixed_width_histogram

    vals = np.array([-15.0, -5.0, 0.0, 3.0, 9.99, 10.0, 25.0, np.nan])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(3)
    got = fixed_width_histogram(ds, "v", bin_width=10.0).to_pandas().set_index("bin")["n"]
    assert got[-2] == 1 and got[-1] == 1 and got[0] == 3 and got[1] == 1 and got[2] == 1


def test_melt_inverts_pivot(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import melt, pivot_sum

    df = pd.DataFrame({
        "k": [1, 1, 2], "cat": ["a", "b", "a"], "v": [1.0, 2.0, 3.0],
    })
    wide = pivot_sum(rd.from_pandas(df), "k", "cat", "v", ["a", "b"])
    long = melt(wide, "k", ["a", "b"], var_name="cat", value_name="v").to_pandas()
    long = long.sort_values(["k", "cat"]).reset_index(drop=True)
    assert long.values.tolist() == [[1, "a", 1.0], [1, "b", 2.0], [2, "a", 3.0], [2, "b", 0.0]]


def test_quality_counts_values(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import quality_counts

    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["The cat, and 2 dogs!", "x"], pa.string()),
    })
    out = quality_counts(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens_q"] == 5
    assert out.loc[0, "n_punct"] == 2   # ',' and '!'
    assert out.loc[0, "n_digit"] == 1
    assert out.loc[0, "n_stop"] == 2    # 'the', 'and'
    assert out.loc[1, "n_stop"] == 0


def test_broadcast_join_all_modes(ray_session):
    from biosd_feature_annotator_ray.stages.join import broadcast_join

    left = pd.DataFrame({"k": [1, 2, 3, None, 2], "a": [10, 20, 30, 40, 50]})
    right = pa.table({"k": pa.array([2.0, 3.0, 3.0], pa.float64()),
                      "b": pa.array(["x", "y", "z"], pa.string())})
    ds = rd.from_pandas(left).repartition(2)
    inner = broadcast_join(ds, right, on=["k"], how="inner").to_pandas()
    assert sorted(inner["a"].tolist()) == [20, 30, 30, 50]   # k=3 matches twice
    lft = broadcast_join(ds, right, on=["k"], how="left").to_pandas()
    assert len(lft) == 6  # 4 matched rows + k=1 + null-key row
    assert lft.loc[lft["a"] == 40, "b"].isna().all()
    semi = broadcast_join(ds, right, on=["k"], how="semi").to_pandas()
    assert sorted(semi["a"].tolist()) == [20, 30, 50]        # no duplication
    anti = broadcast_join(ds, right, on=["k"], how="anti").to_pandas()
    assert sorted(anti["a"].tolist()) == [10, 40]            # null key kept

    with pytest.raises(ValueError):
        broadcast_join(ds, right, on=["k"], how="outer")


def test_explode_list_positions_and_empties(ray_session):
    from biosd_feature_annotator_ray.stages.util import explode_list

    batch = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "l": pa.array([[10, 11], [], None, [12]], pa.list_(pa.int64())),
    })
    out = explode_list(batch, "l", ["id"]).to_pandas()
    assert out.values.tolist() == [[1, 0, 10], [1, 1, 11], [4, 0, 12]]


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_parity(ray_session, how):
    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(11)
    # Zipf-ish: key 7 on ~60% of left rows
    lk = np.where(rng.random(3000) < 0.6, 7, rng.integers(0, 50, 3000))
    left = pd.DataFrame({"k": lk, "a": np.arange(3000)})
    right = pd.DataFrame({"k": rng.integers(0, 60, 400), "b": np.arange(400) * 10})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(3)

    plain = shuffle_hash_join(lds, rds, on=["k"], how=how, nb=16).to_pandas()
    salted = shuffle_hash_join(lds, rds, on=["k"], how=how, nb=16,
                               hot_keys=[7], salt=4).to_pandas()
    cols = sorted(plain.columns)
    p = plain[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    s = salted[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(p, s)


def test_broadcast_cross_join(ray_session):
    from biosd_feature_annotator_ray.stages.join import broadcast_join

    left = rd.from_pandas(pd.DataFrame({"a": [1, 2, 3]})).repartition(2)
    right = pa.table({"b": pa.array(["x", "y"], pa.string())})
    out = broadcast_join(left, right, on=[], how="cross").to_pandas()
    assert len(out) == 6
    assert set(map(tuple, out.values.tolist())) == {(a, b) for a in (1, 2, 3)
                                                    for b in ("x", "y")}


def test_percent_rank_matches_sql_semantics(ev):
    from biosd_feature_annotator_ray.stages.windows import percent_rank_per_key

    # plant ties: duplicate some values within a user
    df = ev.copy()
    df.loc[df.index[:50], "value"] = 1.5
    got = percent_rank_per_key(rd.from_pandas(df).repartition(3), key_col="user_id",
                               order_col="value", nb=8).to_pandas()
    want = df.copy()
    grp = want.groupby("user_id")["value"]
    rank = grp.rank(method="min")
    n = grp.transform("size")
    want["prank"] = np.where(n > 1, (rank - 1) / (n - 1), 0.0)
    m = got.set_index("event_id")["prank"].sort_index()
    w = want.set_index("event_id")["prank"].sort_index()
    assert np.allclose(m.to_numpy(), w.to_numpy())


def test_mask_pattern_redacts(ray_session):
    from biosd_feature_annotator_ray.functions.normalize import mask_pattern

    batch = pa.table({"t": pa.array(["call 555-1234 now", "no digits", "a1b22c333"])})
    out = mask_pattern(batch, "t", r"\d\d+", "<NUM>").column("t_redacted").to_pylist()
    assert out == ["call <NUM>-<NUM> now", "no digits", "a1b<NUM>c<NUM>"]


def test_exact_quantile_cont_matches_numpy(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import exact_quantile_cont

    rng = np.random.default_rng(3)
    v = rng.uniform(0, 1000, 5003)
    ds = rd.from_pandas(pd.DataFrame({"v": v})).repartition(4)
    got = exact_quantile_cont(ds, "v", [0.0, 0.25, 0.5, 0.9, 1.0], n_bins=128)
    for q, g in got.items():
        # numpy 'linear' interpolation == SQL percentile_cont
        assert g == pytest.approx(np.quantile(v, q, method="linear"), rel=1e-12), q


def test_pagerank_matches_power_iteration(ray_session):
    from biosd_feature_annotator_ray.stages.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4), (4, 3), (5, 2)]
    # node 2 is the hub; node 5 has no in-edges; no dangling-free graph:
    # every node here has out-edges except... all have out-edges except none;
    # add a dangling node by pointing 1->6 (6 has no out-edges)
    edges.append((1, 6))
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = pagerank(rd.from_pandas(df).repartition(3), damping=0.85, iters=12,
                   nb=4).to_pandas().set_index("node")["rank"]

    # reference power iteration, same semantics
    nodes = sorted(set(df["src"]) | set(df["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    outdeg = df.groupby("src").size().to_dict()
    r = np.full(N, 1.0 / N)
    for _ in range(12):
        new = np.zeros(N)
        for s, d in edges:
            new[idx[d]] += r[idx[s]] / outdeg[s]
        dang = sum(r[idx[n]] for n in nodes if n not in outdeg)
        r = (1 - 0.85) / N + 0.85 * (new + dang / N)
    for n in nodes:
        assert got[n] == pytest.approx(r[idx[n]], rel=1e-9), n
    assert got.sum() == pytest.approx(1.0, rel=1e-9)


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions(ray_session, direction):
    from biosd_feature_annotator_ray.stages.join import asof_join

    rng = np.random.default_rng(31)
    n = 800
    left = pd.DataFrame({
        "event_id": np.arange(n),
        "k": rng.integers(0, 10, n),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.choice(10**6, n, replace=False), unit="s"),
    })
    right = left.sample(200, random_state=1)[["k", "ts"]].rename(columns={"ts": "rts"})
    right["tag"] = np.arange(200)
    got = asof_join(rd.from_pandas(left).repartition(3),
                    rd.from_pandas(right).repartition(2),
                    key="k", ts="ts", right_ts="rts", nb=8, how="left",
                    direction=direction).to_pandas()
    want = pd.merge_asof(left.sort_values(["ts", "k"], kind="mergesort"),
                         right.sort_values(["rts", "k"], kind="mergesort"),
                         left_on="ts", right_on="rts", by="k", direction=direction)
    g = got.sort_values("event_id").reset_index(drop=True)[["event_id", "tag"]]
    w = want.sort_values("event_id").reset_index(drop=True)[["event_id", "tag"]]
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_new_ops_handle_empty_input(ray_session):
    """Empty datasets flow through the round-2 operators without
    crashing (schema-less empty results are acceptable)."""
    from biosd_feature_annotator_ray.stages.canonicalize import melt, set_op
    from biosd_feature_annotator_ray.stages.sketches import fixed_width_histogram
    from biosd_feature_annotator_ray.stages.textstats import top_ngrams
    from biosd_feature_annotator_ray.stages.windows import (
        cumsum_per_key, dense_rank_per_key, ntile_per_key, percent_rank_per_key,
        rolling_mean_per_key)

    ev = rd.from_pandas(pd.DataFrame({
        "event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
        "value": pd.Series([], dtype="float64"),
    }))
    docs = rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype="object")}))
    assert len(cumsum_per_key(ev, nb=2).to_pandas()) == 0
    assert len(rolling_mean_per_key(ev, nb=2).to_pandas()) == 0
    assert len(dense_rank_per_key(ev, nb=2).to_pandas()) == 0
    assert len(ntile_per_key(ev, nb=2).to_pandas()) == 0
    assert len(percent_rank_per_key(ev, nb=2).to_pandas()) == 0
    assert len(fixed_width_histogram(ev, "value").to_pandas()) == 0
    assert len(top_ngrams(docs, n=2, k=5).to_pandas()) == 0
    assert len(set_op(ev.select_columns(["event_id"]),
                      ev.select_columns(["event_id"]), "event_id").to_pandas()) == 0
    wide = rd.from_pandas(pd.DataFrame({"k": pd.Series([], dtype="int64"),
                                        "a": pd.Series([], dtype="float64")}))
    assert len(melt(wide, "k", ["a"]).to_pandas()) == 0


def test_count_min_heavy_hitters(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import count_min_heavy_hitters

    rng = np.random.default_rng(9)
    # two planted heavy hitters over a long uniform tail
    vals = np.concatenate([
        np.full(3000, 100), np.full(1500, 200), rng.integers(1000, 9000, 4000)])
    rng.shuffle(vals)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
    top = count_min_heavy_hitters(ds, "v", k=2).to_pandas()
    assert list(top["value"]) == ["100", "200"]
    # CMS point queries never under-count
    assert top["approx_count"].iloc[0] >= 3000
    assert top["approx_count"].iloc[1] >= 1500
    # and with depth=4/width=65536 over 8.5k rows they are near-exact
    assert top["approx_count"].iloc[0] <= 3000 * 1.05


def test_recommend_hot_keys_feeds_salted_join(ray_session):
    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join
    from biosd_feature_annotator_ray.stages.sketches import recommend_hot_keys

    rng = np.random.default_rng(13)
    lk = np.where(rng.random(4000) < 0.5, 7, rng.integers(0, 500, 4000))
    left = pd.DataFrame({"k": lk, "a": np.arange(4000)})
    right = pd.DataFrame({"k": np.arange(0, 500), "b": np.arange(500) * 2})
    lds = rd.from_pandas(left).repartition(4)

    hot = recommend_hot_keys(lds, "k", hot_share=0.1)
    assert hot == [7]

    plain = shuffle_hash_join(lds, rd.from_pandas(right), on=["k"], how="inner",
                              nb=16).to_pandas()
    salted = shuffle_hash_join(lds, rd.from_pandas(right), on=["k"], how="inner",
                               nb=16, hot_keys=hot, salt=4).to_pandas()
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        salted[cols].sort_values(cols, kind="mergesort").reset_index(drop=True))


def test_recommend_hot_keys_uniform_returns_empty(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import recommend_hot_keys

    df = pd.DataFrame({"k": np.arange(5000) % 400})
    assert recommend_hot_keys(rd.from_pandas(df), "k", hot_share=0.05) == []


@pytest.mark.parametrize("nb", [20, 5, 16])
def test_salted_join_parity_collision_prone_nb(ray_session, nb):
    """Regression: additive sub-bucket offsets collapsed when
    gcd(GOLDEN, nb) > 1 (nb multiples of 5), duplicating hot-key
    matches. The mixed bucketing + per-bucket build dedup must give
    exact parity for ANY nb/salt."""
    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    rng = np.random.default_rng(41)
    lk = np.where(rng.random(2000) < 0.6, 7, rng.integers(0, 40, 2000))
    left = pd.DataFrame({"k": lk, "a": np.arange(2000)})
    right = pd.DataFrame({"k": np.concatenate([[7, 7], np.arange(40)]),
                          "b": np.arange(42)})
    lds, rds = rd.from_pandas(left).repartition(3), rd.from_pandas(right).repartition(2)
    plain = shuffle_hash_join(lds, rds, on=["k"], how="inner", nb=nb).to_pandas()
    salted = shuffle_hash_join(lds, rds, on=["k"], how="inner", nb=nb,
                               hot_keys=[7], salt=8).to_pandas()
    cols = sorted(plain.columns)
    pd.testing.assert_frame_equal(
        plain[cols].sort_values(cols, kind="mergesort").reset_index(drop=True),
        salted[cols].sort_values(cols, kind="mergesort").reset_index(drop=True))


def test_broadcast_join_null_keys_in_right(ray_session):
    """Regression: a null key in the BROADCAST side must never match a
    null-key left row (SQL semantics; pandas merge equates NaNs)."""
    from biosd_feature_annotator_ray.stages.join import broadcast_join

    left = rd.from_pandas(pd.DataFrame({"k": [1.0, None, 2.0], "a": [10, 20, 30]}))
    right = pa.table({"k": pa.array([1.0, None], pa.float64()),
                      "b": pa.array(["x", "y"], pa.string())})
    semi = broadcast_join(left, right, on=["k"], how="semi").to_pandas()
    assert sorted(semi["a"].tolist()) == [10]          # null-key row NOT kept
    anti = broadcast_join(left, right, on=["k"], how="anti").to_pandas()
    assert sorted(anti["a"].tolist()) == [20, 30]      # null-key row KEPT
    inner = broadcast_join(left, right, on=["k"], how="inner").to_pandas()
    assert sorted(inner["a"].tolist()) == [10]         # no NaN==NaN match


def test_broadcast_left_join_shared_column_null_key(ray_session):
    """Regression: with a shared non-key column, the null-key left row
    must keep its own value (right columns get the _r suffix)."""
    from biosd_feature_annotator_ray.stages.join import broadcast_join

    left = rd.from_pandas(pd.DataFrame({"k": [1.0, None], "c": ["keep1", "keep2"]}))
    right = pa.table({"k": pa.array([1.0], pa.float64()),
                      "c": pa.array(["rightc"], pa.string())})
    out = broadcast_join(left, right, on=["k"], how="left").to_pandas()
    assert sorted(out["c"].tolist()) == ["keep1", "keep2"]
    assert out.loc[out["c"] == "keep1", "c_r"].iloc[0] == "rightc"
    assert out.loc[out["c"] == "keep2", "c_r"].isna().all()


def test_set_op_keeps_nulls(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import set_op

    a = rd.from_pandas(pd.DataFrame({"k": pd.array([1, None, 1], dtype="Int64")}))
    b = rd.from_pandas(pd.DataFrame({"k": pd.array([None, 2], dtype="Int64")}))
    union = set_op(a, b, "k", op="union", nb=4).to_pandas()["k"]
    assert len(union) == 3 and union.isna().sum() == 1
    inter = set_op(a, b, "k", op="intersect", nb=4).to_pandas()["k"]
    assert len(inter) == 1 and inter.isna().all()
    exc = set_op(a, b, "k", op="except", nb=4).to_pandas()["k"]
    assert exc.tolist() == [1]


def test_ivf_index_fragment_names_do_not_collide(ray_session, tmp_path):
    """Regression: raw-id-sum digests collide ({1,4} vs {2,3}) and one
    block's fragment silently overwrote the other's."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.similarity import build_ivf_index

    vec = [1.0] + [0.0] * 7
    df = pd.DataFrame({"vec_id": [1, 4, 2, 3], "embedding": [vec] * 4})
    ds = rd.from_pandas(df).repartition(2)  # blocks: {1,4} and {2,3}
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_centroids=1)
    cdir = os.path.join(idx, "cells", "cent=0")
    total = sum(pq.read_table(os.path.join(cdir, f)).num_rows
                for f in os.listdir(cdir) if f.endswith(".parquet"))
    assert total == 4


def test_index_dir_for_changes_with_content(tmp_path):
    import time

    from biosd_feature_annotator_ray.stages.similarity import index_dir_for

    p = str(tmp_path / "emb.parquet")
    open(p, "wb").write(b"aaaa")
    d1 = index_dir_for(p)
    time.sleep(0.01)
    open(p, "wb").write(b"bbbbbb")
    d2 = index_dir_for(p)
    assert d1 != d2


def test_cume_dist_and_first_value_match_pandas(ev):
    from biosd_feature_annotator_ray.stages.windows import (
        cume_dist_per_key, first_value_per_key)

    df = ev.copy()
    df.loc[df.index[:40], "value"] = 2.25  # plant ties
    got = cume_dist_per_key(rd.from_pandas(df).repartition(3), key_col="user_id",
                            order_col="value", nb=8).to_pandas()
    grp = df.groupby("user_id")["value"]
    want = grp.rank(method="max") / grp.transform("size")
    m = got.set_index("event_id")["cdist"].sort_index()
    assert np.allclose(m.to_numpy(), want.set_axis(df["event_id"]).sort_index().to_numpy())

    got2 = first_value_per_key(rd.from_pandas(df).repartition(3), key_col="user_id",
                               value_col="value", order_cols=["ts", "event_id"],
                               nb=8).to_pandas()
    srt = df.sort_values(["ts", "event_id"], kind="mergesort")
    want2 = srt.groupby("user_id")["value"].transform("first").set_axis(srt["event_id"])
    m2 = got2.set_index("event_id")["first_value"].sort_index()
    assert np.allclose(m2.to_numpy(), want2.sort_index().to_numpy())


def test_hash_columns_int_float_promotion_parity(ray_session):
    """Regression: int64 ids >= 1e15 hashed differently from their
    null-promoted float64 twins ('1000000000000000' vs '1e+15') —
    duplicates landed in different buckets and survived dedup."""
    from biosd_feature_annotator_ray.functions.hashing import hash_columns

    big = 10**15
    as_int = pa.table({"k": pa.array([big], pa.int64())})
    as_float = pa.table({"k": pa.array([float(big)], pa.float64())})
    assert hash_columns(as_int, ["k"])[0] == hash_columns(as_float, ["k"])[0]


def test_norm_array_matches_norm_str_unicode_ws(ray_session):
    """Regression: RE2 ASCII \\s let NBSP through; the array kernel must
    normalize exactly like the scalar twin that builds the index."""
    from biosd_feature_annotator_ray.functions.normalize import norm_array, norm_str

    cases = ["Homo\xa0sapiens", "  a b  ", "x　y", "tab\tspace",
             "line1 line2", "plain text"]
    got = norm_array(pa.array(cases)).to_pylist()
    assert got == [norm_str(c) for c in cases]


def test_content_hash_not_order_invariant(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import fingerprint

    batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["a b a b a b", "b a b a b a"])})
    out = fingerprint(batch).to_pandas()
    assert out["content_hash"].iloc[0] != out["content_hash"].iloc[1]


def test_distinct_counts_keeps_null_group(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import distinct_counts

    df = pd.DataFrame({"k": ["x"] * 5 + [None] * 9 + ["y"] * 2})
    out = distinct_counts(rd.from_pandas(df), "k", nb=4).to_pandas()
    m = {(k if pd.notna(k) else None): int(c) for k, c in zip(out["k"], out["count"])}
    assert m == {"x": 5, None: 9, "y": 2}


def test_prefix_successor_bound(ray_session, tmp_path):
    from biosd_feature_annotator_ray.sources.pages import _prefix_successor, read_pages
    from biosd_feature_annotator_ray.synth import gen_pages

    assert _prefix_successor("ab") == "ac"
    assert _prefix_successor("a퟿"[:1] + chr(0xD7FF)) == "a"
    assert _prefix_successor(chr(0x10FFFF)) is None
    # astral URL survives a prefix scan
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages = gen_pages(5)
    urls = pages.column("url").to_pylist()
    urls[0] = "https://x.com/\U0001f600/page"
    pages = pages.set_column(0, "url", pa.array(urls, pa.string()))
    p = str(tmp_path / "pages")
    import os
    os.makedirs(p)
    pq.write_table(pages, f"{p}/part.parquet")
    got = read_pages(p, url_prefix="https://x.com/").to_pandas()
    assert "https://x.com/\U0001f600/page" in set(got["url"])
