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
    out = top_ngrams(docs, n=2, k=10, nb=4).to_pandas().set_index("ngram")["n"]
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
    out = top_ngrams(docs, n=3, k=5, nb=2).to_pandas().set_index("ngram")["n"]
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
