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


def test_join_nan_keys_never_match(ray_session):
    # Arrow-native finisher parity with the old pandas dropna(subset=on)
    # path: NaN float keys match NOTHING (not even another NaN)
    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    l = pd.DataFrame({"k": [1.0, np.nan, np.nan, 2.0], "lv": [1, 2, 3, 4]})
    r = pd.DataFrame({"k": [np.nan, 2.0, np.nan], "rv": [10, 20, 30]})
    out = shuffle_hash_join(rd.from_pandas(l).repartition(2),
                            rd.from_pandas(r).repartition(2),
                            ["k"], how="inner", nb=4).to_pandas()
    assert out.lv.tolist() == [4] and out.rv.tolist() == [20]
    semi = shuffle_hash_join(rd.from_pandas(l), rd.from_pandas(r),
                             ["k"], how="semi", nb=4).to_pandas()
    assert semi.lv.tolist() == [4]
    anti = shuffle_hash_join(rd.from_pandas(l), rd.from_pandas(r),
                             ["k"], how="anti", nb=4).to_pandas()
    # SQL ANTI JOIN: NaN/null keys match nothing → those rows are KEPT
    assert sorted(anti.lv.tolist()) == [1, 2, 3]


def test_join_composite_key_separator_injective(ray_session):
    # ('a\x1fb','c') and ('a','b\x1fc') must NOT join (length-prefixed
    # key encoding); equal composite keys containing the separator must
    from biosd_feature_annotator_ray.stages.join import shuffle_hash_join

    l = pd.DataFrame({"k1": ["a\x1fb", "a"], "k2": ["c", "b\x1fc"],
                      "lv": [1, 2]})
    r = pd.DataFrame({"k1": ["a", "a\x1fb"], "k2": ["b\x1fc", "c"],
                      "rv": [20, 10]})
    out = shuffle_hash_join(rd.from_pandas(l), rd.from_pandas(r),
                            ["k1", "k2"], how="inner",
                            nb=4).to_pandas().sort_values("lv")
    # each left row matches exactly its true composite twin
    assert out.lv.tolist() == [1, 2] and out.rv.tolist() == [10, 20]


def test_window_null_keys_one_partition(ray_session):
    # SQL PARTITION BY puts all NULL keys in ONE partition: rank counts
    # them 1..n and cap_per_key's quota applies to the null group too
    from biosd_feature_annotator_ray.stages.windows import (cap_per_key,
                                                            rank_per_key)

    df = pd.DataFrame({
        "source": [None, "a", None, None, "a"],
        "doc_id": [3, 1, 5, 4, 2],
    })
    ds = rd.from_pandas(df).repartition(2)
    capped = cap_per_key(ds, key_col="source", order_cols=["doc_id"], n=2,
                         nb=4).to_pandas()
    assert sorted(capped.doc_id.tolist()) == [1, 2, 3, 4]  # null group capped
    ranked = rank_per_key(ds, key_col="source", order_cols=["doc_id"],
                          nb=4).to_pandas().sort_values("doc_id")
    got = dict(zip(ranked.doc_id, ranked.rn))
    assert got == {1: 1, 2: 2, 3: 1, 4: 2, 5: 3}


def test_cumsum_integer_exact_past_2_53(ray_session):
    # int64 running totals stay exact where float64 would round
    from biosd_feature_annotator_ray.stages.windows import cumsum_per_key

    big = (1 << 53) + 1  # not representable as float64 + 1
    df = pd.DataFrame({"user_id": [1, 1, 1], "value": [big, 1, 1],
                       "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                                             "2024-01-03"]),
                       "event_id": [1, 2, 3]})
    out = cumsum_per_key(rd.from_pandas(df), key_col="user_id",
                         value_col="value", nb=2).to_pandas()
    out = out.sort_values("event_id")
    assert out.cum_value.dtype == np.int64
    assert out.cum_value.tolist() == [big, big + 1, big + 2]


def test_cooccurrence_tokenizer_matches_re2(ray_session):
    # \xa0 and \v are NOT token separators (RE2 \s+, same as the DuckDB
    # oracle) — str.split() would split them and crash/diverge pmi
    from biosd_feature_annotator_ray.stages.graph import pmi_pairs

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["foo\xa0bar baz", "foo\xa0bar baz", "foo\xa0bar baz",
                 "foo\xa0bar baz", "foo\xa0bar baz", "a\vb qux"],
    })
    out = pmi_pairs(rd.from_pandas(docs).repartition(2),
                    min_count=5).to_pandas()
    # 'foo\xa0bar' stays one token: the pair with 'baz' co-occurs 5x
    pairs = set(zip(out.t1, out.t2))
    assert ("baz", "foo\xa0bar") in pairs
    assert not any("foo" == a or "bar" == b for a, b in pairs)


def test_rebalance_sample_caps_heads_only(ray_session):
    # over-cap sources shrink toward the cap, under-cap sources pass
    # through COMPLETELY (no sampling loss), null keys pass through
    from biosd_feature_annotator_ray.stages.canonicalize import (
        rebalance_sample)

    df = pd.DataFrame({
        "source": ["big"] * 200 + ["small"] * 3 + [None] * 2,
        "doc_id": np.arange(205, dtype=np.int64),
    })
    out = rebalance_sample(rd.from_pandas(df).repartition(4),
                           "source", "doc_id", cap=20, nb=4).to_pandas()
    small = out[out.source == "small"]
    assert len(small) == 3  # under cap: untouched
    assert out.source.isna().sum() == 2  # null key: untouched
    big = out[out.source == "big"]
    assert 5 <= len(big) <= 45  # expected 20 of 200, md5-binomial spread
    # determinism: identical output on a second run
    out2 = rebalance_sample(rd.from_pandas(df).repartition(2),
                            "source", "doc_id", cap=20, nb=8).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_unigram_nll_rare_tokens_score_higher(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import (
        unigram_nll_exact)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["common common common", "common rare", ""],
    })
    out = unigram_nll_exact(rd.from_pandas(docs),
                            max_vocab=10).to_pandas()
    assert set(out.doc_id) == {1, 2}  # empty doc dropped
    nll = dict(zip(out.doc_id, out.nll))
    assert nll[2] > nll[1]  # rare-token doc is more surprising
    assert out[out.doc_id == 1].n_tokens.iloc[0] == 3


def test_unigram_nll_oov_smoothing_beyond_vocab(ray_session):
    # tokens past the max_vocab cut take the 0.5/N out-of-vocab path
    from biosd_feature_annotator_ray.stages.textstats import (
        unigram_nll_exact)

    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a a a b b c", "c"],
    })
    out = unigram_nll_exact(rd.from_pandas(docs),
                            max_vocab=2).to_pandas()  # vocab = {a, b}
    nll = dict(zip(out.doc_id, out.nll))
    # doc 2 is pure OOV: -ln(0.5/7)
    assert abs(nll[2] - (-np.log(0.5 / 7.0))) < 1e-6


def test_groupby_nunique_null_semantics(ray_session):
    # null VALUES not counted (SQL COUNT DISTINCT); null KEY group kept
    from biosd_feature_annotator_ray.stages.canonicalize import (
        groupby_nunique)

    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", None, None],
        "v": ["x", "y", None, "x", "z", "z"],
    })
    out = groupby_nunique(rd.from_pandas(df).repartition(3),
                          "k", "v", nb=4).to_pandas()
    got = {(k if pd.notna(k) else None): n
           for k, n in zip(out.k, out.n_distinct)}
    assert got == {"a": 2, "b": 1, None: 1}


def test_mode_per_key_tiebreak_smallest(ray_session):
    from biosd_feature_annotator_ray.stages.canonicalize import mode_per_key

    df = pd.DataFrame({
        "k": ["u"] * 4 + ["w"] * 3,
        "v": ["b", "a", "b", "a", "z", "z", "y"],
    })
    out = mode_per_key(rd.from_pandas(df).repartition(2),
                       "k", "v", nb=4).to_pandas()
    got = dict(zip(out.k, out["mode"]))
    assert got == {"u": "a", "w": "z"}  # 2-2 tie → smallest value
    assert dict(zip(out.k, out.n_mode)) == {"u": 2, "w": 2}


def test_histogram_edges_and_empty_bins(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import histogram

    df = pd.DataFrame({"v": [0.0, 24.999, 25.0, 49.9, 99.9, 100.0, -1.0,
                             np.nan]})
    out = histogram(rd.from_pandas(df).repartition(2), "v",
                    lo=0.0, hi=100.0, nbins=4).to_pandas()
    got = dict(zip(out.bin, out.n))
    # 100.0 and -1.0 and NaN excluded; bin edges right-open
    assert got == {0: 2, 1: 2, 2: 0, 3: 1}


def test_grouped_corr_matches_numpy(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import grouped_corr

    rng = np.random.default_rng(7)
    x = rng.normal(10, 2, 200)
    df = pd.DataFrame({
        "k": ["g1"] * 100 + ["g2"] * 100,
        "x": x,
        "y": np.concatenate([x[:100] * 2 + rng.normal(0, 0.5, 100),
                             -x[100:] + rng.normal(0, 3, 100)]),
    })
    out = grouped_corr(rd.from_pandas(df).repartition(4),
                       "k", "x", "y").to_pandas()
    got = dict(zip(out.k, out.corr_xy))
    for k in ("g1", "g2"):
        sub = df[df.k == k]
        want = np.corrcoef(sub.x, sub.y)[0, 1]
        assert abs(got[k] - want) < 1e-3
    # degenerate group: zero variance → null
    dg = pd.DataFrame({"k": ["z"] * 3, "x": [1.0, 1.0, 1.0],
                       "y": [1.0, 2.0, 3.0]})
    out2 = grouped_corr(rd.from_pandas(dg), "k", "x", "y").to_pandas()
    assert out2.corr_xy.isna().all()


def test_pack_sequences_contiguous_offsets(ray_session):
    # offsets are the exact global prefix sum in id order; pack_id cuts
    # at seq_len; empty docs occupy zero tokens but keep a position
    from biosd_feature_annotator_ray.stages.textstats import pack_sequences

    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype=np.int64),
        "text": ["w " * (i % 7) for i in range(50)],  # 0..6 tokens
    })
    out = pack_sequences(rd.from_pandas(df).repartition(5),
                         seq_len=10, n_parts=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    n = np.array([i % 7 for i in range(50)])
    want_start = np.cumsum(n) - n
    assert (out.n_tokens.to_numpy() == n).all()
    assert (out.start_offset.to_numpy() == want_start).all()
    assert (out.pack_id.to_numpy() == want_start // 10).all()
    # partitioning-independence: different shapes, identical assignment
    out2 = pack_sequences(rd.from_pandas(df).repartition(9),
                          seq_len=10, n_parts=2).to_pandas()
    pd.testing.assert_frame_equal(
        out2.sort_values("doc_id").reset_index(drop=True), out)


def test_null_contracts_wave23(ray_session):
    # null-source group appears in the census; all-null-side corr group
    # yields a null corr; null-text docs keep a packing position
    from biosd_feature_annotator_ray.stages.sketches import grouped_corr
    from biosd_feature_annotator_ray.stages.textstats import (
        pack_sequences, source_profile)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["a", "a", None, None],
        "lang": ["en", "de", "en", "en"],
        "n_chars": [10, 20, 30, 40],
        "text": ["x y", None, "z", "w w"],
    })
    prof = source_profile(rd.from_pandas(docs).repartition(2),
                          nb=4).to_pandas()
    assert len(prof) == 2  # 'a' and the null group
    nullrow = prof[prof.source.isna()].iloc[0]
    assert nullrow.n_docs == 2 and nullrow.en_share == 1.0

    packed = pack_sequences(rd.from_pandas(docs[["doc_id", "text"]]),
                            seq_len=2, n_parts=2).to_pandas()
    packed = packed.sort_values("doc_id")
    assert packed.n_tokens.tolist() == [2, 0, 1, 2]
    assert packed.start_offset.tolist() == [0, 2, 2, 3]

    cdf = pd.DataFrame({"k": ["g", "g", "h", "h"],
                        "x": [1.0, 2.0, 1.0, 2.0],
                        "y": [1.0, 2.0, None, None]})
    corr = grouped_corr(rd.from_pandas(cdf), "k", "x", "y").to_pandas()
    got = dict(zip(corr.k, corr.corr_xy))
    assert got["g"] == 1.0 and np.isnan(got["h"])  # group preserved


def test_grouped_moments_degenerate_groups(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import grouped_moments

    df = pd.DataFrame({
        "k": ["tiny"] * 2 + ["flat"] * 10 + ["ok"] * 10,
        "x": [1.0, 2.0] + [5.0] * 10 + list(range(10)),
    })
    out = grouped_moments(rd.from_pandas(df).repartition(2),
                          "k", "x").to_pandas()
    got = out.set_index("k")
    assert pd.isna(got.loc["tiny", "skewness"])  # n<3
    assert pd.isna(got.loc["flat", "kurtosis"])  # zero variance
    assert np.isfinite(float(got.loc["ok", "skewness"]))


def test_table_profile_nulls_and_distinct(ray_session):
    from biosd_feature_annotator_ray.stages.sketches import table_profile

    df = pd.DataFrame({
        "a": [1, 1, 2, None, None],
        "b": ["x", "", "", None, "y"],
    })
    out = table_profile(rd.from_pandas(df).repartition(2),
                        ["a", "b"], nb=4).to_pandas().set_index("col")
    assert out.loc["a", "n"] == 5 and out.loc["a", "n_null"] == 2
    assert out.loc["a", "n_distinct"] == 2
    # empty string is a VALUE (counted once), null is not
    assert out.loc["b", "n_null"] == 1 and out.loc["b", "n_distinct"] == 3
