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


def test_weighted_sample_deterministic_and_biased(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import weighted_sample

    n = 2000
    # half the ids get 50x the weight — they must dominate the sample
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) % 2 == 0, 50.0, 1.0)})
    ds = rd.from_pandas(df)
    s1 = set(weighted_sample(ds, "id", "w", 200).to_pandas()["id"])
    s2 = set(weighted_sample(ds.repartition(7), "id", "w", 200)
             .to_pandas()["id"])
    assert s1 == s2 and len(s1) == 200  # partitioning-invariant
    heavy = sum(1 for i in s1 if i % 2 == 0)
    assert heavy > 170  # E[heavy] ≈ 196 under 50:1 weights

    # zero/negative/null weights are never selected
    df.loc[0, "w"] = 0.0
    df.loc[2, "w"] = -3.0
    s3 = set(weighted_sample(rd.from_pandas(df), "id", "w", n)
             .to_pandas()["id"])
    assert 0 not in s3 and 2 not in s3 and len(s3) == n - 2


def _funnel_brute(df, steps):
    out = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        t = pd.Timestamp.min
        done = 0
        for s in steps:
            q = g[(g.event_type == s) & (g.ts > t)]
            if len(q) == 0:
                break
            t = q["ts"].min()
            done += 1
        out[uid] = done
    return out


def test_funnel_matches_bruteforce(ray_session):
    from biosd_feature_annotator_ray.stages.windows import funnel_steps_per_user

    rng = np.random.default_rng(9)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 100_000, n), unit="s"),
        "event_type": rng.choice(["a", "b", "c", "noise"], n),
    })
    steps = ["a", "b", "c"]
    out = funnel_steps_per_user(rd.from_pandas(df), steps=steps,
                                nb=4).to_pandas()
    got = dict(zip(out["user_id"], out["steps_done"]))
    want = {u: d for u, d in _funnel_brute(df, steps).items()
            if (df.loc[df.user_id == u, "event_type"].isin(steps)).any()}
    assert got == want


def test_funnel_order_matters(ray_session):
    from biosd_feature_annotator_ray.stages.windows import funnel_steps_per_user

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 2],
        "ts": [t0, t0 + pd.Timedelta(minutes=1),
               t0 + pd.Timedelta(minutes=1), t0],
        "event_type": ["a", "b", "a", "b"],  # user 2 did b BEFORE a
    })
    out = funnel_steps_per_user(rd.from_pandas(df), steps=["a", "b"],
                                nb=2).to_pandas()
    got = dict(zip(out["user_id"], out["steps_done"]))
    assert got == {1: 2, 2: 1}


def test_token_entropy_hand_values(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import token_entropy

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a a a a", "a b c d", "a a b b", ""], pa.string()),
    }))
    out = token_entropy(docs).to_pandas().set_index("doc_id")["entropy"]
    assert out[1] == 0.0                       # all-same tokens
    assert abs(out[2] - np.log(4)) < 1e-6      # uniform over 4
    assert abs(out[3] - np.log(2)) < 1e-6      # two 50/50 tokens
    assert out[4] == 0.0                       # empty doc


def test_merge_upsert_semantics(ray_session):
    from biosd_feature_annotator_ray.stages.join import merge_upsert

    base = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0]),
    }))
    ch = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 9, 7], pa.int64()),
        "v": pa.array([99.0, None, 90.0, None]),
        "op": pa.array(["upsert", "delete", "upsert", "delete"]),
    }))
    out = (merge_upsert(base, ch, on=["k"], nb=4).to_pandas()
           .sort_values("k").reset_index(drop=True))
    # 1,4 untouched; 2 updated; 3 deleted; 9 inserted; 7 delete-miss noop
    assert list(out["k"]) == [1, 2, 4, 9]
    assert list(out["v"]) == [10.0, 99.0, 40.0, 90.0]


def test_merge_upsert_duplicate_change_raises(ray_session):
    import pytest

    from biosd_feature_annotator_ray.stages.join import merge_upsert

    base = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                   "v": pa.array([1.0])}))
    ch = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array([2.0, 3.0]),
        "op": pa.array(["upsert", "upsert"])}))
    with pytest.raises(Exception, match="multiple change rows"):
        merge_upsert(base, ch, on=["k"], nb=2).to_pandas()


def test_incremental_agg_retraction_and_parity(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import incremental_agg

    rng = np.random.default_rng(17)
    n = 400
    facts = pd.DataFrame({
        "g": rng.integers(0, 10, n),
        "value": np.round(rng.uniform(0, 50, n), 2)})
    empty = rd.from_arrow(pa.table({
        "g": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()), "s": pa.array([], pa.float64())}))
    base = incremental_agg(empty, rd.from_pandas(facts), ["g"], "value")

    # delta: insert 50 new rows into group 3, retract ALL of group 7
    ins = pd.DataFrame({"g": np.full(50, 3), "value": np.full(50, 2.5),
                        "w": np.ones(50, np.int64)})
    g7 = facts[facts.g == 7].copy()
    g7["w"] = -1
    delta = rd.from_pandas(pd.concat([ins, g7], ignore_index=True))
    out = (incremental_agg(base, delta, ["g"], "value", weight_col="w")
           .to_pandas().set_index("g").sort_index())

    # parity: recompute from scratch over the surviving facts
    want = (pd.concat([facts[facts.g != 7], ins[["g", "value"]]])
            .groupby("g").agg(n=("value", "size"), s=("value", "sum")))
    assert 7 not in out.index
    assert list(out.index) == list(want.index)
    assert (out["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(out["s"].to_numpy(),
                       np.round(want["s"].to_numpy(), 2), atol=1e-9)


def test_blocked_lev_join_vs_bruteforce(ray_session):
    from biosd_feature_annotator_ray.stages.similarity import blocked_lev_join

    lrows = [(1, "red widget"), (2, "blue bolt"), (3, "tiny gear")]
    rrows = [(10, "red widget"), (11, "red widgets"), (12, "bed widget"),
             (13, "blue belt"), (14, "green gadget"), (15, "xed widget")]
    left = rd.from_arrow(pa.table({
        "lid": pa.array([r[0] for r in lrows], pa.int64()),
        "name": pa.array([r[1] for r in lrows])}))
    right = rd.from_arrow(pa.table({
        "rid": pa.array([r[0] for r in rrows], pa.int64()),
        "name": pa.array([r[1] for r in rrows])}))
    out = blocked_lev_join(left, right, "lid", "name", "rid", "name",
                           max_dist=2, nb=4).to_pandas()
    got = set(zip(out["l_id"], out["r_id"]))

    def lev(a, b):
        import numpy as _np
        d = _np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(d[j] + 1, nd[-1] + 1, d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    want = {(li, ri) for li, ls in lrows for ri, rs in rrows
            if ls[:1] == rs[:1] and len(ls) // 4 == len(rs) // 4
            and lev(ls, rs) <= 2}
    assert got == want
    # blocking excludes the first-char typo pair even though lev=1
    assert (1, 15) not in got and lev("red widget", "xed widget") == 1


def test_bloom_prefilter_parity_and_pruning(ray_session):
    from biosd_feature_annotator_ray.stages.join import (
        bloom_prefilter, shuffle_hash_join)

    rng = np.random.default_rng(21)
    probe = pd.DataFrame({"k": rng.integers(0, 100_000, 5000),
                          "v": rng.integers(0, 9, 5000)})
    build = pd.DataFrame({"k": rng.integers(0, 100_000, 60),
                          "w": np.arange(60)})
    p, b = rd.from_pandas(probe), rd.from_pandas(build)

    plain = (shuffle_hash_join(p, b, on=["k"], how="inner", nb=4)
             .to_pandas().sort_values(["k", "v", "w"]).reset_index(drop=True))
    pruned_probe = bloom_prefilter(p, b, on=["k"])
    n_kept = pruned_probe.count()
    bloomed = (shuffle_hash_join(pruned_probe, b, on=["k"], how="inner", nb=4)
               .to_pandas().sort_values(["k", "v", "w"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, bloomed)
    # ~60 build keys over a 100k domain: almost all probe rows prune
    assert n_kept < 200

    semi_plain = set(shuffle_hash_join(p, b, on=["k"], how="semi", nb=4)
                     .to_pandas()["k"])
    semi_bloom = set(shuffle_hash_join(pruned_probe, b, on=["k"], how="semi",
                                       nb=4).to_pandas()["k"])
    assert semi_plain == semi_bloom


def test_kmeans_recovers_planted_clusters(ray_session):
    from biosd_feature_annotator_ray.stages.similarity import kmeans

    rng = np.random.default_rng(23)
    centers = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 0.0],
                        [-10.0, 5.0, 8.0]])
    X = np.vstack([c + rng.normal(0, 0.3, (60, 3)) for c in centers])
    ids = np.arange(len(X), dtype=np.int64)
    vecs = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(X.astype(np.float32)),
                              pa.list_(pa.float32(), 3))}))
    C, assign = kmeans(vecs, k=3, max_iters=15, seed=1, sample_rows=180)
    a = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    # each planted block must be pure (one cluster id per 60-row block)
    blocks = [set(a[i * 60:(i + 1) * 60]) for i in range(3)]
    assert all(len(b) == 1 for b in blocks)
    assert len(set.union(*blocks)) == 3
    # recovered centroids close to planted ones (order-free match)
    d = np.linalg.norm(C[:, None, :] - centers[None, :, :], axis=2)
    assert d.min(axis=0).max() < 0.2


def test_kmeans_deterministic_across_partitioning(ray_session):
    from biosd_feature_annotator_ray.stages.similarity import kmeans

    rng = np.random.default_rng(29)
    X = rng.normal(0, 1, (200, 4)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                  "embedding": pa.array(list(X), pa.list_(pa.float32(), 4))})
    a1 = (kmeans(rd.from_arrow(t), k=5, max_iters=8)[1]
          .to_pandas().sort_values("vec_id")["cluster"].to_numpy())
    a2 = (kmeans(rd.from_arrow(t).repartition(7), k=5, max_iters=8)[1]
          .to_pandas().sort_values("vec_id")["cluster"].to_numpy())
    assert np.array_equal(a1, a2)


def test_naive_bayes_separable_corpus(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import (
        nb_predict, nb_train)

    rng = np.random.default_rng(31)
    va = ["apple", "banana", "cherry", "date", "elder"]
    vb = ["table", "chair", "lamp", "desk", "shelf"]
    rows = []
    for i in range(200):
        lab, voc = (("fruit", va) if i % 2 == 0 else ("furniture", vb))
        rows.append((i, " ".join(rng.choice(voc, 12)), lab))
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "label": pa.array([r[2] for r in rows])})
    train = rd.from_arrow(t.filter(pa.array(
        [r[0] < 150 for r in rows])))
    test = rd.from_arrow(t.filter(pa.array(
        [r[0] >= 150 for r in rows])))
    model = nb_train(train, "label")
    preds = nb_predict(test, model).to_pandas().set_index("doc_id")["pred"]
    truth = {r[0]: r[2] for r in rows if r[0] >= 150}
    acc = np.mean([preds[i] == truth[i] for i in truth])
    assert acc == 1.0  # fully separable vocabularies

    # determinism across repartitioning of BOTH train and test
    model2 = nb_train(train.repartition(5), "label")
    assert np.array_equal(model[1], model2[1])
    assert np.array_equal(model[2], model2[2])
    preds2 = (nb_predict(test.repartition(3), model2)
              .to_pandas().set_index("doc_id")["pred"])
    assert (preds.sort_index() == preds2.sort_index()).all()


def test_global_row_number_rejects_null_lead(ray_session):
    import pytest

    from biosd_feature_annotator_ray.stages.windows import global_row_number

    df = pd.DataFrame({"k": [1, 2, 3],
                       "v": [1.0, np.nan, 3.0]})
    with pytest.raises(ValueError, match="null/NaN"):
        global_row_number(rd.from_pandas(df), order_cols=["v", "k"],
                          n_parts=2).to_pandas()


def test_text_index_refuses_unrelated_dir(ray_session, tmp_path):
    import pytest

    from biosd_feature_annotator_ray.stages.textindex import build_text_index

    d = tmp_path / "precious"
    d.mkdir()
    (d / "notes.txt").write_text("do not delete")
    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                   "text": pa.array(["hello"])}))
    with pytest.raises(ValueError, match="refusing to overwrite"):
        build_text_index(docs, str(d))
    assert (d / "notes.txt").read_text() == "do not delete"
