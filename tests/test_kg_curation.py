"""Decontamination + co-occurrence graph operators (round-2 wave)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _docs_ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_decontaminate_planted_overlap(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import decontaminate

    bench = _docs_ds([(100, "the quick brown fox jumps")])
    train = _docs_ds([
        (1, "a quick brown fox ran away"),       # shares 'quick brown fox'
        (2, "totally unrelated text here now"),  # clean
        (3, "xx the quick brown fox jumps yy"),  # shares 3 grams
        (4, "fox quick brown"),                  # same words, different order
        (5, "ab"),                               # < k tokens
    ])
    out = decontaminate(train, bench, k=3).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_hits"] == 1
    assert not bool(out.loc[2, "contaminated"]) and out.loc[2, "n_hits"] == 0
    assert out.loc[3, "n_hits"] == 3
    assert not bool(out.loc[4, "contaminated"])
    assert not bool(out.loc[5, "contaminated"])
    assert len(out) == 5  # every train doc kept


def test_decontaminate_empty_benchmark(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import decontaminate

    bench = _docs_ds([]).filter(lambda r: True)
    train = _docs_ds([(1, "some words in a row here")])
    out = decontaminate(train, bench, k=3).to_pandas()
    assert out["n_hits"].tolist() == [0]
    assert not out["contaminated"].any()


def test_decontaminate_counts_occurrences_not_grams(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import decontaminate

    bench = _docs_ds([(9, "x y z")])
    # the SAME contaminated gram occurs twice -> n_hits counts both
    train = _docs_ds([(1, "x y z w x y z")])
    out = decontaminate(train, bench, k=3).to_pandas()
    assert out["n_hits"].tolist() == [2]


def test_cooccurrence_basic_counts(ray_session):
    from biosd_feature_annotator_ray.stages.graph import cooccurrence_edges

    docs = _docs_ds([
        (1, "a b c"),
        (2, "b a a b"),   # distinct set {a, b}
        (3, "c a"),
        (4, ""),          # no tokens
    ])
    out = cooccurrence_edges(docs).to_pandas()
    got = {(r.t1, r.t2): r.n_docs for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_cooccurrence_min_count_filters(ray_session):
    from biosd_feature_annotator_ray.stages.graph import cooccurrence_edges

    docs = _docs_ds([(1, "a b c"), (2, "a b"), (3, "b c x y")])
    out = cooccurrence_edges(docs, min_count=2).to_pandas()
    got = {(r.t1, r.t2): r.n_docs for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "c"): 2}


def test_cooccurrence_truncation_reported(ray_session):
    from biosd_feature_annotator_ray.stages.graph import cooccurrence_edges

    # 5 distinct tokens, cap at 3 -> 2 docs get truncated; the loss is
    # surfaced as the __truncated__ marker edge, not silently dropped
    docs = _docs_ds([(1, "a b c d e"), (2, "a b c d e"), (3, "a b")])
    out = cooccurrence_edges(docs, max_tokens_per_doc=3).to_pandas()
    got = {(r.t1, r.t2): r.n_docs for r in out.itertuples()}
    assert got[("__truncated__", "__docs__")] == 2
    assert ("c", "d") not in got          # beyond the cap
    assert got[("a", "b")] == 3


def test_cooccurrence_matches_bruteforce(ray_session):
    from itertools import combinations

    from biosd_feature_annotator_ray.stages.graph import cooccurrence_edges

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(0, 9))))
            for i in range(60)]
    expect: dict = {}
    for _, text in rows:
        for t1, t2 in combinations(sorted(set(text.split())), 2):
            expect[(t1, t2)] = expect.get((t1, t2), 0) + 1
    out = cooccurrence_edges(_docs_ds(rows)).to_pandas()
    got = {(r.t1, r.t2): r.n_docs for r in out.itertuples()}
    assert got == expect


def test_bm25_ranks_relevant_docs_first(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import bm25_topk

    docs = _docs_ds([
        (1, "cat cat cat dog"),
        (2, "cat dog bird"),
        (3, "bird bird fish"),
        (4, "fish fish fish fish"),
        (5, ""),
    ])
    out = bm25_topk(docs, terms=["cat"], topk=3).to_pandas()
    # doc 1 has highest tf for 'cat'; docs without it never appear
    assert out["doc_id"].tolist()[0] == 1
    assert set(out["doc_id"]) == {1, 2}


def test_bm25_idf_downweights_common_terms(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import bm25_topk

    # 'the' in every doc (low idf), 'rare' in one (high idf); same tf/dl
    docs = _docs_ds([(i, "the common words here") for i in range(1, 9)]
                    + [(9, "the rare words here")])
    out = bm25_topk(docs, terms=["the", "rare"], topk=9).to_pandas()
    assert out["doc_id"].iloc[0] == 9
    assert out["score"].iloc[0] > out["score"].iloc[1]


def test_bm25_empty_corpus(ray_session):
    from biosd_feature_annotator_ray.stages.textstats import bm25_topk

    out = bm25_topk(_docs_ds([]), terms=["x"], topk=5).to_pandas()
    assert len(out) == 0


def test_fuzzy_min_match_basic(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from biosd_feature_annotator_ray.stages.similarity import fuzzy_min_match

    cands = rd.from_arrow(pa.table({"name": pa.array(
        ["blue bolt", "red widget", "small ring", "hot gear"], pa.string())}))
    out = fuzzy_min_match(cands, ["blue blt", "red widget", "hot bear"],
                          col="name").to_pandas().set_index("q")
    assert out.loc["blue blt", "match"] == "blue bolt"
    assert out.loc["blue blt", "dist"] == 1
    assert out.loc["red widget", "dist"] == 0
    assert out.loc["hot bear", "match"] == "hot gear"


def test_fuzzy_min_match_tie_breaks_lexicographically(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from biosd_feature_annotator_ray.stages.similarity import fuzzy_min_match

    # both candidates are distance 1 from 'ac' -> smaller string wins
    cands = rd.from_arrow(pa.table({"name": pa.array(["ab", "aa"], pa.string())}))
    out = fuzzy_min_match(cands, ["ac"], col="name").to_pandas()
    assert out.loc[0, "match"] == "aa" and out.loc[0, "dist"] == 1


def test_profile_table_counts_nulls_and_distincts(ray_session):
    from biosd_feature_annotator_ray.stages.profile import profile_table

    t = pa.table({
        "i": pa.array([1, 2, 2, None, 3], pa.int64()),
        "s": pa.array(["a", None, "a", "b", None], pa.string()),
        "f": pa.array([1.5, 1.5, None, -2.0, 0.0], pa.float64()),
        "ts": pa.array(
            pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-01",
                            None, "2024-01-03"]), pa.timestamp("us")),
    })
    out = profile_table(rd.from_arrow(t), ["i", "s", "f", "ts"]
                        ).to_pandas().set_index("col")
    assert (out["n_rows"] == 5).all()
    assert out.loc["i", "n_null"] == 1 and out.loc["i", "n_distinct"] == 3
    assert out.loc["s", "n_null"] == 2 and out.loc["s", "n_distinct"] == 2
    assert pd.isna(out.loc["s", "min_val"])
    assert out.loc["f", "min_val"] == -2.0 and out.loc["f", "max_val"] == 1.5
    assert out.loc["ts", "n_distinct"] == 3
    # epoch micros survive exactly (no float 2^53 undercount)
    assert out.loc["ts", "min_val"] == float(
        pd.Timestamp("2024-01-01").value // 1000)


def test_profile_distinct_exact_across_blocks(ray_session):
    from biosd_feature_annotator_ray.stages.profile import profile_table

    # same values repeated in every block must still count once
    ds = rd.from_arrow(pa.table({"x": pa.array(list(range(100)) * 5)})
                       ).repartition(10)
    out = profile_table(ds, ["x"]).to_pandas()
    assert out.loc[0, "n_distinct"] == 100 and out.loc[0, "n_rows"] == 500


def test_ohlc_deterministic_across_block_orders(ray_session):
    from biosd_feature_annotator_ray.stages.windows import ohlc_resample

    ts = pd.to_datetime([
        "2024-01-01 10:05", "2024-01-01 10:20", "2024-01-01 10:40",
        "2024-01-01 11:01", "2024-01-01 10:20",  # tie ts -> id breaks
    ])
    t = pa.table({
        "event_id": pa.array([5, 2, 3, 4, 1], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(["a"] * 5, pa.string()),
        "value": pa.array([10.0, 20.0, 30.0, 40.0, 99.0], pa.float64()),
    })
    for nblocks in (1, 3):
        out = (ohlc_resample(rd.from_arrow(t).repartition(nblocks))
               .to_pandas().sort_values("bucket_ts").reset_index(drop=True))
        assert out.loc[0, "open"] == 10.0       # 10:05 is first
        assert out.loc[0, "close"] == 30.0      # 10:40 is last
        assert out.loc[0, "high"] == 99.0 and out.loc[0, "low"] == 10.0
        assert out.loc[0, "n"] == 4
        assert out.loc[1, "open"] == 40.0 and out.loc[1, "n"] == 1


def _brute_trailing(df, w):
    out = []
    for _, r in df.iterrows():
        m = ((df.user_id == r.user_id) & (df.ts >= r.ts - w) & (df.ts <= r.ts))
        out.append(round(df.loc[m, "value"].sum(), 2))
    return out


def test_trailing_time_sum_matches_bruteforce_with_ties(ray_session):
    from biosd_feature_annotator_ray.stages.windows import trailing_time_sum_per_key

    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n),
        # coarse grid forces many exact-ts ties (peer semantics)
        "ts": pd.Timestamp("2024-03-01") + pd.to_timedelta(
            rng.integers(0, 48, n) * 30, unit="m"),
        "value": np.round(rng.uniform(0, 100, n), 2),
    })
    w = pd.Timedelta(hours=1)
    out = (trailing_time_sum_per_key(rd.from_pandas(df), window=w)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert np.allclose(out["tsum"].to_numpy(),
                       np.array(_brute_trailing(df, w)), atol=1e-9)


def test_trailing_time_sum_fallback_segment_path(ray_session):
    from biosd_feature_annotator_ray.stages.windows import trailing_time_sum_per_key

    # 300 users x a ~500-year ts span makes n_keys*band overflow the
    # composite encoding -> per-segment fallback must kick in and agree
    rng = np.random.default_rng(5)
    n = 600
    near, far = pd.Timestamp("1700-01-01"), pd.Timestamp("2200-01-01")
    tvals = [near + pd.Timedelta(minutes=int(i)) if i % 2
             else far - pd.Timedelta(minutes=int(i)) for i in range(n)]
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.arange(n, dtype=np.int64) % 300,
        "ts": pd.Series(tvals).astype("datetime64[us]"),
        "value": np.round(rng.uniform(0, 9, n), 2),
    })
    w = pd.Timedelta(hours=2)
    out = (trailing_time_sum_per_key(rd.from_pandas(df), window=w, nb=1)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert np.allclose(out["tsum"].to_numpy(),
                       np.array(_brute_trailing(df, w)), atol=1e-9)


def test_text_index_parity_with_full_scan(ray_session, tmp_path):
    from biosd_feature_annotator_ray.stages.textindex import (
        build_text_index, search_text_index)
    from biosd_feature_annotator_ray.stages.textstats import bm25_topk

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 40))))
            for i in range(200)]
    docs = _docs_ds(rows)
    terms = ["w3", "w7", "w19"]
    full = bm25_topk(docs, terms, topk=15).to_pandas()
    idx = str(tmp_path / "tidx")
    build_text_index(docs, idx)
    via_idx = search_text_index(idx, terms, topk=15).to_pandas()
    pd.testing.assert_frame_equal(full, via_idx)  # bit-identical

    # rebuild is a resume no-op: fragment count unchanged, result same
    import glob
    n_frags = len(glob.glob(f"{idx}/buckets/*/frag-*.parquet"))
    build_text_index(docs, idx)
    assert len(glob.glob(f"{idx}/buckets/*/frag-*.parquet")) == n_frags
    pd.testing.assert_frame_equal(
        search_text_index(idx, terms, topk=15).to_pandas(), via_idx)


def test_text_index_prunes_buckets(ray_session, tmp_path):
    """A single-term search must not read every bucket file."""
    from biosd_feature_annotator_ray.functions.hashing import hash_strings
    from biosd_feature_annotator_ray.stages.textindex import (
        build_text_index, search_text_index)

    docs = _docs_ds([(1, "alpha beta"), (2, "gamma delta"), (3, "alpha gamma")])
    idx = str(tmp_path / "tidx2")
    build_text_index(docs, idx, nb=8)
    nb_alpha = int(hash_strings(pa.array(["alpha"])) % np.uint64(8))
    # remove every OTHER bucket dir; the pruned search must still work
    import os
    import shutil
    for d in os.listdir(f"{idx}/buckets"):
        if d != f"b={nb_alpha}":
            shutil.rmtree(f"{idx}/buckets/{d}")
    out = search_text_index(idx, ["alpha"], topk=5, nb=8).to_pandas()
    assert set(out["doc_id"]) == {1, 3}


def test_text_index_duplicate_query_terms_parity(ray_session, tmp_path):
    """A duplicated query term contributes once per occurrence in the
    full-scan BM25; the indexed path must reproduce that exactly."""
    from biosd_feature_annotator_ray.stages.textindex import (
        build_text_index, search_text_index)
    from biosd_feature_annotator_ray.stages.textstats import bm25_topk

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(20)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(3, 30))))
            for i in range(120)]
    docs = _docs_ds(rows)
    terms = ["w3", "w3", "w7"]  # duplicate on purpose
    full = bm25_topk(docs, terms, topk=12).to_pandas()
    idx = str(tmp_path / "tidx3")
    build_text_index(docs, idx)
    via_idx = search_text_index(idx, terms, topk=12).to_pandas()
    pd.testing.assert_frame_equal(full, via_idx)


def test_text_index_interrupted_build_restarts_clean(ray_session, tmp_path):
    """Fragments from a crashed (no _DONE) build must not survive into
    the rebuild — stale postings would double tf/df."""
    import glob
    import os

    from biosd_feature_annotator_ray.stages.textindex import (
        build_text_index, search_text_index)
    from biosd_feature_annotator_ray.stages.textstats import bm25_topk

    docs = _docs_ds([(1, "alpha beta beta"), (2, "alpha gamma")])
    idx = str(tmp_path / "tidx4")
    build_text_index(docs, idx)
    frags = glob.glob(f"{idx}/buckets/*/frag-*.parquet")
    os.remove(os.path.join(idx, "_DONE"))  # simulate crash-before-done
    # plant a stale fragment that different batching would leave behind
    import shutil
    stale = frags[0].replace("frag-", "frag-deadbeef")
    shutil.copy(frags[0], stale)
    build_text_index(docs, idx)
    assert not any("deadbeef" in f
                   for f in glob.glob(f"{idx}/buckets/*/frag-*.parquet"))
    full = bm25_topk(docs, ["alpha", "beta"], topk=5).to_pandas()
    via = search_text_index(idx, ["alpha", "beta"], topk=5).to_pandas()
    pd.testing.assert_frame_equal(full, via)
