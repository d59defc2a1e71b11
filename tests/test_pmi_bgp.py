"""cooccurrence_pmi (textstats) and match_bgp (graph): semantics pins."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import match_bgp
from biosd_feature_annotator_ray.stages.textstats import cooccurrence_pmi


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(2)


class TestCooccurrencePmi:
    def test_hand_computed(self):
        # 4 docs + 1 null; vocab (min_df 2): a (df 3), b (df 2), c (df 2)
        ds = _docs(["a b", "a b c", "a c", "z solo", None])
        t = cooccurrence_pmi(ds, max_vocab=10, min_df=2).to_pylist()
        got = {(r["tok_a"], r["tok_b"]): (r["n_ab"], r["pmi"]) for r in t}
        n = 5
        assert got[("a", "b")] == (2, round(math.log(2 * n / (3 * 2)), 6))
        assert got[("a", "c")] == (2, round(math.log(2 * n / (3 * 2)), 6))
        assert got[("b", "c")] == (1, round(math.log(1 * n / (2 * 2)), 6))
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    def test_duplicate_tokens_count_once_per_doc(self):
        ds = _docs(["a a a b", "b a"])
        t = cooccurrence_pmi(ds, max_vocab=10, min_df=2).to_pylist()
        assert [(r["tok_a"], r["tok_b"], r["n_ab"]) for r in t] == [
            ("a", "b", 2)]

    def test_min_df_and_small_vocab(self):
        ds = _docs(["x y", "p q"])
        assert cooccurrence_pmi(ds, max_vocab=10,
                                min_df=2).num_rows == 0

    def test_max_vocab_tie_cut_is_deterministic(self):
        # all tokens df=2; vocab of 2 keeps the lexicographically first
        ds = _docs(["a b c d", "a b c d"])
        t = cooccurrence_pmi(ds, max_vocab=2, min_df=2).to_pylist()
        assert [(r["tok_a"], r["tok_b"]) for r in t] == [("a", "b")]


def _triples(rows):
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(2)


class TestMatchBgp:
    def test_two_hop_with_type_filter(self):
        ds = _triples([
            ("p1", "worksFor", "o1"), ("p2", "worksFor", "o2"),
            ("o1", "locatedIn", "c1"), ("o2", "locatedIn", "c2"),
            ("p1", "@type", "Person"), ("p2", "@type", "Bot"),
        ])
        out = match_bgp(ds, [("?p", "worksFor", "?o"),
                             ("?o", "locatedIn", "?c"),
                             ("?p", "@type", "Person")], nb=4)
        assert out.to_pandas().to_dict("records") == [
            {"p": "p1", "o": "o1", "c": "c1"}]

    def test_constant_subject(self):
        ds = _triples([("p1", "knows", "p2"), ("p2", "knows", "p3")])
        out = match_bgp(ds, [("p1", "knows", "?x"),
                             ("?x", "knows", "?y")], nb=4)
        assert out.to_pandas().to_dict("records") == [
            {"x": "p2", "y": "p3"}]

    def test_repeated_var_within_pattern_is_equality(self):
        ds = _triples([("a", "self", "a"), ("a", "self", "b")])
        out = match_bgp(ds, [("?x", "self", "?x")], nb=4)
        assert out.to_pandas().to_dict("records") == [{"x": "a"}]

    def test_bag_semantics_one_row_per_proof(self):
        ds = _triples([
            ("p1", "worksFor", "o1"), ("o1", "locatedIn", "c1"),
            ("o1", "locatedIn", "c2"),
        ])
        out = match_bgp(ds, [("?p", "worksFor", "?o"),
                             ("?o", "locatedIn", "?c")], nb=4)
        assert sorted(r["c"] for r in out.to_pandas()
                      .to_dict("records")) == ["c1", "c2"]

    def test_cross_product_rejected(self):
        ds = _triples([("a", "p", "b")])
        with pytest.raises(ValueError, match="cross product"):
            match_bgp(ds, [("?x", "p", "?y"), ("?z", "p", "?w")])

    def test_empty_pattern_rejected(self):
        ds = _triples([("a", "p", "b")])
        with pytest.raises(ValueError, match="empty"):
            match_bgp(ds, [])


class TestMatchBgpFuzz:
    def test_fuzz_vs_duckdb_self_joins(self):
        """Random triple soups × two pattern shapes: bindings must
        equal the equivalent DuckDB self-join, including duplicate
        proof paths (bag semantics)."""
        import random

        import duckdb

        rng = random.Random(408)
        for trial in range(4):
            n = rng.randrange(40, 120)
            ents = [f"e{j}" for j in range(rng.randrange(6, 14))]
            preds = ["knows", "likes", "near"]
            rows = [(rng.choice(ents), rng.choice(preds),
                     rng.choice(ents)) for _ in range(n)]
            tbl = pa.table({
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
            })
            ds = rd.from_arrow(tbl).repartition(3)

            # shape 1: 2-hop chain with constant predicates
            got = sorted(map(tuple, match_bgp(
                ds, [("?a", "knows", "?b"), ("?b", "likes", "?c")], nb=4)
                .to_pandas()[["a", "b", "c"]].itertuples(index=False)))
            want = sorted(map(tuple, duckdb.sql(
                "SELECT x.subj, x.obj, y.obj FROM tbl x JOIN tbl y"
                " ON x.obj = y.subj WHERE x.pred = 'knows'"
                " AND y.pred = 'likes'").fetchall()))
            assert got == want, f"chain trial {trial}"

            # shape 2: variable predicate + triangle-ish closure
            got = sorted(map(tuple, match_bgp(
                ds, [("?a", "?p", "?b"), ("?b", "near", "?a")], nb=4)
                .to_pandas()[["a", "p", "b"]].itertuples(index=False)))
            want = sorted(map(tuple, duckdb.sql(
                "SELECT x.subj, x.pred, x.obj FROM tbl x JOIN tbl y"
                " ON x.obj = y.subj AND y.obj = x.subj"
                " WHERE y.pred = 'near'").fetchall()))
            assert got == want, f"triangle trial {trial}"


class TestMatchBgpReviewRegressions:
    def test_var_in_all_three_positions(self):
        ds = _triples([("a", "a", "b"), ("x", "x", "x")])
        out = match_bgp(ds, [("?v", "?v", "?v")], nb=4)
        assert out.to_pandas().to_dict("records") == [{"v": "x"}]

    def test_all_constant_pattern_rejected(self):
        ds = _triples([("a", "p", "b")])
        with pytest.raises(ValueError, match="all-constant"):
            match_bgp(ds, [("a", "p", "b")])
        with pytest.raises(ValueError, match="all-constant"):
            match_bgp(ds, [("?x", "p", "?y"), ("a", "p", "b")])
