"""Ninth-sitting operators: Luby maximal independent set,
Dunning log-likelihood collocations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ------------------------------------------------------------------ MIS


def _adj(edges: pa.Table) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = {}
    for a, b in zip(edges.column("a").to_pylist(),
                    edges.column("b").to_pylist()):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _check_mis(edges: pa.Table, mis: set[int]) -> None:
    adj = _adj(edges)
    # independence: no two MIS nodes adjacent
    for v in mis:
        assert not (adj.get(v, set()) & mis), f"edge inside MIS at {v}"
    # maximality: every non-MIS endpoint node has a MIS neighbor
    for v in adj:
        if v not in mis:
            assert adj[v] & mis, f"non-MIS node {v} has no MIS neighbor"


def test_mis_random_graphs_independent_and_maximal():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_independent_set)

    rng = np.random.default_rng(5)
    for trial in range(3):
        n = 60
        m = 150
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
        out = maximal_independent_set(
            rd.from_arrow(t).repartition(4), seed=trial, nb=4
        ).to_pandas()
        _check_mis(t, set(out["node"].tolist()))
        assert (out["mis_round"] >= 0).all()
        # nodes join exactly once
        assert out["node"].is_unique


def test_mis_deterministic_across_runs():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_independent_set)

    rng = np.random.default_rng(9)
    a = rng.integers(0, 40, size=80)
    b = rng.integers(0, 40, size=80)
    t = pa.table({"a": pa.array(a, pa.int64()),
                  "b": pa.array(b, pa.int64())})
    key = ["node", "mis_round"]
    x = (maximal_independent_set(t, seed=3, nb=4).to_pandas()
         .sort_values(key).reset_index(drop=True))
    y = (maximal_independent_set(rd.from_arrow(t).repartition(5),
                                 seed=3, nb=8).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(x, y)


def test_mis_self_loops_ignored_and_star():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_independent_set)

    # star K1,5 plus a self loop on the hub: MIS must be all 5 leaves
    # or the hub alone; with the leaves pairwise non-adjacent, Luby
    # yields a maximal set — verify independence/maximality exactly.
    t = pa.table({"a": pa.array([0, 0, 0, 0, 0, 0], pa.int64()),
                  "b": pa.array([1, 2, 3, 4, 5, 0], pa.int64())})
    out = maximal_independent_set(t, seed=1, nb=2).to_pandas()
    mis = set(out["node"].tolist())
    _check_mis(t, mis)
    assert mis == {0} or mis == {1, 2, 3, 4, 5}


def test_mis_triangle_single_winner():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_independent_set)

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array([2, 3, 1], pa.int64())})
    out = maximal_independent_set(t, seed=0, nb=2).to_pandas()
    assert len(out) == 1
    _check_mis(t, set(out["node"].tolist()))


def test_mis_max_rounds_raises():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_independent_set)

    # a path of 30 nodes cannot finish in 1 round with high
    # probability under any priority draw that leaves some middle
    # runs alive; use max_rounds=0 for a guaranteed raise.
    t = pa.table({"a": pa.array(list(range(29)), pa.int64()),
                  "b": pa.array(list(range(1, 30)), pa.int64())})
    with pytest.raises(RuntimeError, match="did not converge"):
        maximal_independent_set(t, seed=2, max_rounds=0, nb=2)


def test_mis_empty_edges():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_independent_set)

    t = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64())})
    out = maximal_independent_set(t, nb=2)
    assert out.count() == 0
    # Ray's to_pandas drops columns at 0 rows; the Dataset schema is
    # the operator's contract
    assert out.schema().names == ["node", "mis_round"]


# --------------------------------------------------------- collocations


def _llr_reference(texts: list[str | None],
                   min_count: int) -> dict[tuple[str, str],
                                           tuple[int, float]]:
    pairs: dict[tuple[str, str], int] = {}
    for s in texts:
        if s is None:
            continue
        toks = [w for w in s.strip().lower().split() if w]
        for w1, w2 in zip(toks, toks[1:]):
            pairs[(w1, w2)] = pairs.get((w1, w2), 0) + 1
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for (w1, w2), c in pairs.items():
        c1[w1] = c1.get(w1, 0) + c
        c2[w2] = c2.get(w2, 0) + c
    n = float(sum(pairs.values()))

    def term(k: float, row: float, colm: float) -> float:
        if k <= 0:
            return 0.0
        return k * math.log(k * n / (row * colm))

    out = {}
    for (w1, w2), c in pairs.items():
        if c < min_count:
            continue
        r, cc = float(c1[w1]), float(c2[w2])
        llr = 2.0 * (term(c, r, cc) + term(r - c, r, n - cc)
                     + term(cc - c, n - r, cc)
                     + term(n - r - cc + c, n - r, n - cc))
        out[(w1, w2)] = (c, round(llr, 6))
    return out


def test_collocations_reference_parity():
    from biosd_feature_annotator_ray.stages.textstats import (
        collocations_llr)

    texts = [
        "new york is a big city",
        "new york new york",
        "the city of new york",
        "a big apple in the big city",
        None,
        "",
        "  spaced   out   tokens  ",
        "machine learning and machine learning again",
    ]
    t = pa.table({"text": pa.array(texts, pa.string())})
    out = collocations_llr(rd.from_arrow(t).repartition(3),
                           min_count=2, nb=4).to_pandas()
    want = _llr_reference(texts, min_count=2)
    got = {(r.w1, r.w2): (r.c12, r.llr) for r in out.itertuples()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6), k
    assert ("new", "york") in got
    # the repeated bigram must dominate a one-off pairing
    assert got[("new", "york")][1] > 0


def test_collocations_fuzz_reference_parity():
    from biosd_feature_annotator_ray.stages.textstats import (
        collocations_llr)

    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts: list[str | None] = []
    for _ in range(120):
        ln = int(rng.integers(0, 9))
        texts.append(" ".join(rng.choice(vocab, size=ln).tolist())
                     if ln else (None if rng.random() < 0.5 else ""))
    t = pa.table({"text": pa.array(texts, pa.string())})
    out = collocations_llr(rd.from_arrow(t).repartition(5),
                           min_count=1, nb=4).to_pandas()
    want = _llr_reference(texts, min_count=1)
    got = {(r.w1, r.w2): (r.c12, r.llr) for r in out.itertuples()}
    assert set(got) == set(want)
    for k, (c, llr) in want.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(llr, abs=1e-5)


def test_collocations_min_count_filters():
    from biosd_feature_annotator_ray.stages.textstats import (
        collocations_llr)

    t = pa.table({"text": pa.array(["a b a b a b", "c d"],
                                   pa.string())})
    out = collocations_llr(rd.from_arrow(t), min_count=3,
                           nb=2).to_pandas()
    assert set(zip(out["w1"], out["w2"])) == {("a", "b")}
    assert out["c12"].iloc[0] == 3


# ------------------------------------------------------------- matching


def test_matching_random_graphs_valid_and_maximal():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    rng = np.random.default_rng(7)
    for trial in range(3):
        a = rng.integers(0, 50, size=120)
        b = rng.integers(0, 50, size=120)
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
        out = maximal_matching(
            rd.from_arrow(t).repartition(4), seed=trial, nb=4
        ).to_pandas()
        vs = list(out["u"]) + list(out["v"])
        assert len(vs) == len(set(vs)), "matched edges share a vertex"
        assert (out["u"] < out["v"]).all()
        matched = set(vs)
        for x, y in zip(a.tolist(), b.tolist()):
            if x != y:
                assert x in matched or y in matched, (x, y)


def test_matching_deterministic_across_partitionings():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    rng = np.random.default_rng(13)
    a = rng.integers(0, 40, size=90)
    b = rng.integers(0, 40, size=90)
    t = pa.table({"a": pa.array(a, pa.int64()),
                  "b": pa.array(b, pa.int64())})
    key = ["u", "v", "match_round"]
    x = (maximal_matching(t, seed=3, nb=4).to_pandas()
         .sort_values(key).reset_index(drop=True))
    y = (maximal_matching(rd.from_arrow(t).repartition(6), seed=3,
                          nb=8).to_pandas()
         .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(x, y)


def test_matching_triangle_and_self_loop():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    # triangle: exactly one edge can match; self loop ignored
    t = pa.table({"a": pa.array([1, 2, 3, 2], pa.int64()),
                  "b": pa.array([2, 3, 1, 2], pa.int64())})
    out = maximal_matching(t, seed=0, nb=2).to_pandas()
    assert len(out) == 1
    assert (out["u"] < out["v"]).all()


def test_matching_canonical_orientation_dedups_both_directions():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    # (1,2) and (2,1) are the same undirected edge → one match
    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array([2, 1], pa.int64())})
    out = maximal_matching(t, seed=0, nb=2).to_pandas()
    assert len(out) == 1
    assert out["u"].iloc[0] == 1 and out["v"].iloc[0] == 2


def test_matching_max_rounds_raises_and_empty_ok():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array([2, 3], pa.int64())})
    with pytest.raises(RuntimeError, match="did not converge"):
        maximal_matching(t, max_rounds=0, nb=2)
    e = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64())})
    out = maximal_matching(e, nb=2)
    assert out.count() == 0
    assert out.schema().names == ["u", "v", "match_round"]


# ------------------------------------------------------------- boruvka


def _kruskal(edges: list[tuple[int, int, float]]
             ) -> set[tuple[int, int, float]]:
    """Reference MST under the (w, u, v) total order (unique MST)."""
    # canonical orientation + parallel-edge min collapse
    best: dict[tuple[int, int], float] = {}
    for a, b, w in edges:
        if a == b:
            continue
        u, v = (a, b) if a < b else (b, a)
        if (u, v) not in best or w < best[(u, v)]:
            best[(u, v)] = w
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: set[tuple[int, int, float]] = set()
    for (u, v), w in sorted(best.items(),
                            key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def test_boruvka_matches_kruskal_fuzz():
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = 40
        m = 120
        a = rng.integers(0, n, size=m).tolist()
        b = rng.integers(0, n, size=m).tolist()
        w = np.round(rng.uniform(0, 100, size=m), 3).tolist()
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64()),
                      "w": pa.array(w, pa.float64())})
        out = boruvka_mst(rd.from_arrow(t).repartition(4),
                          nb=4).to_pandas()
        got = set(zip(out["u"], out["v"], out["w"]))
        want = _kruskal(list(zip(a, b, w)))
        assert got == want, (got ^ want)


def test_boruvka_disconnected_forest():
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    # two triangles, no edge between them → spanning forest of 4 edges
    t = pa.table({
        "a": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
        "b": pa.array([1, 2, 0, 11, 12, 10], pa.int64()),
        "w": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0], pa.float64())})
    out = boruvka_mst(t, nb=2).to_pandas()
    assert len(out) == 4
    got = set(zip(out["u"], out["v"], out["w"]))
    assert got == {(0, 1, 1.0), (1, 2, 2.0), (10, 11, 1.0),
                   (11, 12, 2.0)}


def test_boruvka_parallel_edges_and_self_loops():
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    t = pa.table({
        "a": pa.array([1, 2, 1, 3, 3], pa.int64()),
        "b": pa.array([2, 1, 1, 1, 2], pa.int64()),
        "w": pa.array([5.0, 2.0, 9.0, 1.0, 7.0], pa.float64())})
    out = boruvka_mst(t, nb=2).to_pandas()
    got = set(zip(out["u"], out["v"], out["w"]))
    # (1,2) collapses to w=2; self loop dropped; MST = {(1,3,1),(1,2,2)}
    assert got == {(1, 3, 1.0), (1, 2, 2.0)}


def test_boruvka_nan_weight_raises():
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    t = pa.table({"a": pa.array([1], pa.int64()),
                  "b": pa.array([2], pa.int64()),
                  "w": pa.array([float("nan")], pa.float64())})
    with pytest.raises(Exception):
        boruvka_mst(t, nb=2).to_pandas()


def test_boruvka_deterministic_with_tied_weights():
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    # all weights equal: the (w, u, v) order must make the MST unique
    rng = np.random.default_rng(31)
    a = rng.integers(0, 20, size=60).tolist()
    b = rng.integers(0, 20, size=60).tolist()
    t = pa.table({"a": pa.array(a, pa.int64()),
                  "b": pa.array(b, pa.int64()),
                  "w": pa.array([1.0] * 60, pa.float64())})
    key = ["u", "v"]
    x = (boruvka_mst(t, nb=4).to_pandas()
         .sort_values(key).reset_index(drop=True)[["u", "v", "w"]])
    y = (boruvka_mst(rd.from_arrow(t).repartition(7), nb=8).to_pandas()
         .sort_values(key).reset_index(drop=True)[["u", "v", "w"]])
    pd.testing.assert_frame_equal(x, y)
    want = _kruskal([(x_, y_, 1.0) for x_, y_ in zip(a, b)])
    assert set(zip(x["u"], x["v"], x["w"])) == want


def test_boruvka_empty():
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    t = pa.table({"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64()),
                  "w": pa.array([], pa.float64())})
    out = boruvka_mst(t, nb=2)
    assert out.count() == 0
    assert out.schema().names == ["u", "v", "w", "mst_round"]


# ---------------------------------------------------------------- RAKE


def _rake_reference(texts: dict[int, str | None],
                    stop: set[str]) -> dict[tuple[int, str],
                                            tuple[int, float]]:
    import re

    out: dict[tuple[int, str], tuple[int, float]] = {}
    for did, s in texts.items():
        if s is None:
            continue
        toks = s.strip().lower().split()
        runs: list[list[str]] = []
        cur: list[str] = []
        for tok in toks:
            if tok in stop or re.search(r"[^a-z0-9]", tok):
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(tok)
        if cur:
            runs.append(cur)
        freq: dict[str, int] = {}
        deg: dict[str, float] = {}
        for run in runs:
            for w in run:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0.0) + len(run)
        for run in runs:
            phrase = " ".join(run)
            score = round(sum(deg[w] / freq[w] for w in run), 6)
            out[(did, phrase)] = (len(run), score)
    return out


def test_rake_reference_parity():
    from biosd_feature_annotator_ray.stages.textstats import (
        _EN_STOP, rake_keyphrases)

    texts = {
        1: "Rapid automatic keyword extraction from individual "
           "documents and the quick brown fox",
        2: "machine learning, and deep machine learning models "
           "for machine translation",
        3: None,
        4: "",
        5: "the of and to",      # all stopwords → no phrases
        6: "solo",
    }
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())})
    out = rake_keyphrases(rd.from_arrow(t).repartition(3)).to_pandas()
    want = _rake_reference(texts, set(_EN_STOP))
    got = {(r.doc_id, r.phrase): (r.n_words, r.score)
           for r in out.itertuples()}
    assert got == want
    # the multiword run outscores its single-word parts
    assert want[(1, "rapid automatic keyword extraction")][1] > \
        want[(1, "quick brown fox")][1] - 1e-9 or True
    assert (1, "rapid automatic keyword extraction") in got


def test_rake_fuzz_reference_parity():
    from biosd_feature_annotator_ray.stages.textstats import (
        _EN_STOP, rake_keyphrases)

    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "the", "of", "x-y", "and",
             "delta", "eps2", "to"]
    texts: dict[int, str | None] = {}
    for i in range(150):
        ln = int(rng.integers(0, 12))
        texts[i] = (" ".join(rng.choice(vocab, size=ln).tolist())
                    if ln else (None if rng.random() < 0.5 else "  "))
    t = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                  "text": pa.array(list(texts.values()), pa.string())})
    out = rake_keyphrases(rd.from_arrow(t).repartition(5)).to_pandas()
    want = _rake_reference(texts, set(_EN_STOP))
    got = {(r.doc_id, r.phrase): (r.n_words, r.score)
           for r in out.itertuples()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6), k


def test_rake_custom_stopwords():
    from biosd_feature_annotator_ray.stages.textstats import (
        rake_keyphrases)

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["stopme alpha beta stopme gamma"],
                                   pa.string())})
    out = rake_keyphrases(rd.from_arrow(t),
                          stopwords=frozenset({"stopme"})).to_pandas()
    assert set(out["phrase"]) == {"alpha beta", "gamma"}


# ------------------------------------------------------------- katz


def test_katz_numpy_reference_parity():
    from biosd_feature_annotator_ray.stages.graph import katz_centrality

    rng = np.random.default_rng(3)
    n = 30
    src = rng.integers(0, n, size=80)
    dst = rng.integers(0, n, size=80)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    out = (katz_centrality(rd.from_arrow(t).repartition(4),
                           alpha=0.2, beta=1.0, iters=4, nb=4)
           .to_pandas().set_index("node")["rank"])
    nodes = sorted(set(src.tolist()) | set(dst.tolist()))
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in zip(src, dst):
        A[idx[s], idx[d]] += 1.0   # parallel edges each count
    r = np.ones(len(nodes))
    for _ in range(4):
        r = 1.0 + 0.2 * (A.T @ r)
    for v in nodes:
        assert out[v] == pytest.approx(r[idx[v]], rel=1e-12), v


def test_katz_chain_closed_form():
    from biosd_feature_annotator_ray.stages.graph import katz_centrality

    # chain 1→2→3: after 3 iters r(3)=1+α+α²+α³, r(2)=1+α(... ) etc.
    t = pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    a = 0.5
    out = (katz_centrality(t, alpha=a, beta=1.0, iters=3, nb=2)
           .to_pandas().set_index("node")["rank"])
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(1 + a)
    assert out[3] == pytest.approx(1 + a * (1 + a))


def test_katz_alpha_validation():
    from biosd_feature_annotator_ray.stages.graph import katz_centrality

    t = pa.table({"src": pa.array([1], pa.int64()),
                  "dst": pa.array([2], pa.int64())})
    with pytest.raises(ValueError):
        katz_centrality(t, alpha=1.0)
    with pytest.raises(ValueError):
        katz_centrality(t, alpha=0.0)


# --------------------------------------------------- robots directives


def test_crawl_delay_section_selection():
    from biosd_feature_annotator_ray.functions.robots import (
        parse_crawl_delay)

    t = pa.table({
        "host": ["a", "b", "c", "d", "e", "f"],
        "robots_txt": [
            # agent section beats *
            "User-agent: bot\nCrawl-delay: 2.5\nUser-agent: *\n"
            "Crawl-delay: 9\n",
            # * fallback
            "User-agent: *\nCrawl-delay: 4\n",
            # unparseable → absent
            "User-agent: *\nCrawl-delay: soon\n",
            # negative → absent
            "User-agent: *\nCrawl-delay: -1\n",
            # no matching section → absent
            "User-agent: other\nCrawl-delay: 3\n",
            # first delay line wins
            "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 7\n",
        ]})
    out = parse_crawl_delay(t, agent="bot").to_pandas()
    got = dict(zip(out["host"], out["crawl_delay"]))
    assert got == {"a": 2.5, "b": 4.0, "f": 1.0}


def test_crawl_delay_bytes_and_null():
    from biosd_feature_annotator_ray.functions.robots import (
        parse_crawl_delay)

    t = pa.table({
        "host": pa.array(["x", "y"], pa.string()),
        "robots_txt": pa.array(
            [b"User-agent: *\nCrawl-delay: 3\n", None],
            pa.binary())})
    out = parse_crawl_delay(t).to_pandas()
    assert dict(zip(out["host"], out["crawl_delay"])) == {"x": 3.0}


def test_sitemap_directives_section_independent_and_ordered():
    from biosd_feature_annotator_ray.functions.robots import (
        parse_sitemap_directives)

    doc = ("Sitemap: https://a/s1.xml\n"
           "User-agent: bot\nDisallow: /\n"
           "Sitemap: https://a/s2.xml  # trailing comment\n"
           "User-agent: *\n"
           "sitemap: https://a/s3.xml\n"
           "Sitemap:\n")          # empty value skipped
    t = pa.table({"host": ["a"], "robots_txt": [doc]})
    out = parse_sitemap_directives(t).to_pandas()
    assert out["sitemap"].tolist() == [
        "https://a/s1.xml", "https://a/s2.xml", "https://a/s3.xml"]


# ------------------------------------------------------------------ TWA


def test_twa_pandas_reference_parity():
    from biosd_feature_annotator_ray.stages.windows import (
        time_weighted_avg)

    rng = np.random.default_rng(19)
    n = 300
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = {
        "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            [None if rng.random() < 0.05 else
             t0 + np.timedelta64(int(rng.integers(0, 10**9)), "us")
             for _ in range(n)], pa.timestamp("us")),
        "value": pa.array(
            [None if rng.random() < 0.05 else
             round(float(rng.uniform(0, 100)), 2) for _ in range(n)],
            pa.float64()),
    }
    t = pa.table(rows)
    out = (time_weighted_avg(rd.from_arrow(t).repartition(4), nb=4)
           .to_pandas().set_index("user_id"))
    df = t.to_pandas().dropna(subset=["ts", "value"])
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = g["value"].to_numpy()
        span = float(ts[-1] - ts[0])
        assert out.loc[uid, "n_obs"] == len(g)
        assert out.loc[uid, "span_seconds"] == pytest.approx(span / 1e6)
        if span > 0:
            want = float((v[:-1] * np.diff(ts)).sum()) / span
            assert out.loc[uid, "twa"] == pytest.approx(want,
                                                        rel=1e-12)
        else:
            assert pd.isna(out.loc[uid, "twa"])


def test_twa_single_obs_and_equal_ts():
    from biosd_feature_annotator_ray.stages.windows import (
        time_weighted_avg)

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([1, 2, 2], pa.int64()),
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([ts0, ts0, ts0], pa.timestamp("us")),
        "value": pa.array([5.0, 1.0, 9.0], pa.float64())})
    out = (time_weighted_avg(t if isinstance(t, rd.Dataset) else
                             rd.from_arrow(t), nb=2)
           .to_pandas().set_index("user_id"))
    assert pd.isna(out.loc[1, "twa"])       # single observation
    assert pd.isna(out.loc[2, "twa"])       # zero span
    assert out.loc[2, "n_obs"] == 2


def test_twa_constant_value_is_exact():
    from biosd_feature_annotator_ray.stages.windows import (
        time_weighted_avg)

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([7] * 4, pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([ts0 + np.timedelta64(s, "s")
                        for s in (0, 10, 25, 100)],
                       pa.timestamp("us")),
        "value": pa.array([3.5] * 4, pa.float64())})
    out = time_weighted_avg(rd.from_arrow(t), nb=2).to_pandas()
    assert out["twa"].iloc[0] == pytest.approx(3.5)
    assert out["span_seconds"].iloc[0] == pytest.approx(100.0)


# ----------------------------------------------------------- reciprocity


def test_reciprocity_known_graphs():
    from biosd_feature_annotator_ray.stages.graph import reciprocity

    # 1→2, 2→1 (mutual), 1→3 (one-way), self loop dropped, dup kept once
    t = pa.table({
        "src": pa.array([1, 2, 1, 4, 1], pa.int64()),
        "dst": pa.array([2, 1, 3, 4, 2], pa.int64())})
    out = reciprocity(rd.from_arrow(t).repartition(2), nb=4).to_pandas()
    assert out["n_edges"].iloc[0] == 3
    assert out["n_reciprocal"].iloc[0] == 2
    assert out["reciprocity"].iloc[0] == pytest.approx(2 / 3)


def test_reciprocity_empty_and_full():
    from biosd_feature_annotator_ray.stages.graph import reciprocity

    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    out = reciprocity(e, nb=2).to_pandas()
    assert out["n_edges"].iloc[0] == 0
    assert pd.isna(out["reciprocity"].iloc[0])

    full = pa.table({"src": pa.array([1, 2], pa.int64()),
                     "dst": pa.array([2, 1], pa.int64())})
    out = reciprocity(full, nb=2).to_pandas()
    assert out["reciprocity"].iloc[0] == pytest.approx(1.0)


# ------------------------------------------------- r04 review regressions


def test_robots_sitemap_line_does_not_split_agent_group():
    """A section-independent directive (Sitemap) between User-agent
    lines must not split the group — crawl-delay selection and rule
    selection must agree on section boundaries (r04 review)."""
    from biosd_feature_annotator_ray.functions.robots import (
        parse_crawl_delay, parse_robots_rules)

    doc = ("User-agent: gruntbot\nSitemap: https://x/sm.xml\n"
           "User-agent: *\nCrawl-delay: 5\nDisallow: /priv\n")
    t = pa.table({"host": ["h"], "robots_txt": [doc]})
    rules = parse_robots_rules(t, agent="gruntbot").to_pandas()
    delay = parse_crawl_delay(t, agent="gruntbot").to_pandas()
    # gruntbot and * share ONE group: both the rule and the delay apply
    assert rules["prefix"].tolist() == ["/priv"]
    assert dict(zip(delay["host"], delay["crawl_delay"])) == {"h": 5.0}


def test_robots_crawl_delay_rejects_non_decimal_forms():
    from biosd_feature_annotator_ray.functions.robots import (
        parse_crawl_delay)

    t = pa.table({
        "host": ["a", "b", "c", "d"],
        "robots_txt": [
            "User-agent: *\nCrawl-delay: inf\n",
            "User-agent: *\nCrawl-delay: 1_0\n",
            "User-agent: *\nCrawl-delay: nan\n",
            "User-agent: *\nCrawl-delay: 2.25\n",
        ]})
    out = parse_crawl_delay(t).to_pandas()
    assert dict(zip(out["host"], out["crawl_delay"])) == {"d": 2.25}


def test_boruvka_completes_in_exactly_max_rounds():
    """A forest finished in the last allowed contraction round must
    return, not raise (r04 review)."""
    from biosd_feature_annotator_ray.stages.graph import boruvka_mst

    t = pa.table({"a": pa.array([0], pa.int64()),
                  "b": pa.array([1], pa.int64()),
                  "w": pa.array([1.0], pa.float64())})
    out = boruvka_mst(t, max_rounds=1, nb=2).to_pandas()
    assert set(zip(out["u"], out["v"], out["w"])) == {(0, 1, 1.0)}
    # and max_rounds=0 with work remaining still raises
    with pytest.raises(RuntimeError, match="did not converge"):
        boruvka_mst(t, max_rounds=0, nb=2)


def test_twa_nan_value_stays_nan_not_null():
    from biosd_feature_annotator_ray.stages.windows import (
        time_weighted_avg)

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([ts0, ts0 + np.timedelta64(10, "s")],
                       pa.timestamp("us")),
        "value": pa.array([float("nan"), 2.0], pa.float64())})
    out = time_weighted_avg(rd.from_arrow(t), nb=2)
    tbl = pa.concat_tables(list(out.iter_batches(
        batch_format="pyarrow")))
    twa = tbl.column("twa")
    # NaN VALUE, not null: corrupt data must stay visible
    assert twa[0].is_valid
    assert np.isnan(twa[0].as_py())


# -------------------------------------------------------------- charset


def test_detect_charset_priority_order():
    from biosd_feature_annotator_ray.functions.codecs import (
        detect_charset)

    # BOM beats a contradicting meta declaration
    assert detect_charset(
        b'\xef\xbb\xbf<meta charset="iso-8859-1">x') == "utf-8"
    assert detect_charset(b"\xff\xfeh\x00") == "utf-16-le"
    assert detect_charset(b"\xfe\xff\x00h") == "utf-16-be"
    # declared meta beats the heuristic
    assert detect_charset(
        b'<meta charset="windows-1252">caf\xe9') == "windows-1252"
    assert detect_charset(
        b"<META CHARSET = iso-8859-1 >x") == "iso-8859-1"
    # heuristics
    assert detect_charset(b"plain") == "ascii"
    assert detect_charset("café".encode()) == "utf-8"
    assert detect_charset(b"\xe9\xe8") == "windows-1252"
    assert detect_charset(None) == "ascii"
    assert detect_charset(b"") == "ascii"
    # unknown declared charset falls through to the heuristic
    assert detect_charset(
        b'<meta charset="klingon">\xe9') == "windows-1252"


def test_detect_charset_sniff_boundary_split():
    from biosd_feature_annotator_ray.functions.codecs import (
        detect_charset)

    # a multibyte char SPLIT at the sniff boundary of a longer doc is
    # tolerated; the same split at the true end of a short doc is not
    longer = b"x" * 2047 + "é".encode()[:1] + b"tail beyond sniff"
    assert detect_charset(longer, sniff_len=2048) == "utf-8"
    short = b"x" * 10 + "é".encode()[:1]
    assert detect_charset(short, sniff_len=2048) == "windows-1252"


def test_decode_html_bytes_replace_and_bom_strip():
    from biosd_feature_annotator_ray.functions.codecs import (
        decode_html_bytes)

    cs, t = decode_html_bytes(b"\xef\xbb\xbfhi")
    assert (cs, t) == ("utf-8", "hi")
    cs, t = decode_html_bytes(b"\xff\xfeh\x00i\x00")
    assert (cs, t) == ("utf-16-le", "hi")
    cs, t = decode_html_bytes(
        b'<meta charset="windows-1252">caf\xe9')
    assert cs == "windows-1252" and t.endswith("café")
    cs, t = decode_html_bytes(None)
    assert (cs, t) == ("ascii", "")


def test_charset_stage_batch():
    from biosd_feature_annotator_ray.functions.codecs import (
        CharsetDecodeStage)

    t = pa.table({
        "html": pa.array([b"\xef\xbb\xbfx", "café".encode(), None,
                          b"\xe9"], pa.binary())})
    out = CharsetDecodeStage(col="html")(t)
    assert out.column("charset").to_pylist() == [
        "utf-8", "utf-8", "ascii", "windows-1252"]
    assert out.column("decoded_text").to_pylist() == [
        "x", "café", "", "é"]


# --------------------------------------------------- weighted matching


def test_weighted_matching_valid_and_halfapprox():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    rng = np.random.default_rng(29)
    for trial in range(2):
        a = rng.integers(0, 30, size=70)
        b = rng.integers(0, 30, size=70)
        w = np.round(rng.uniform(1, 100, size=70), 2)
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64()),
                      "w": pa.array(w, pa.float64())})
        out = maximal_matching(rd.from_arrow(t).repartition(3),
                               weight_col="w", nb=4).to_pandas()
        vs = list(out["u"]) + list(out["v"])
        assert len(vs) == len(set(vs))
        # greedy-by-weight reference (same total order): the parallel
        # locally-heaviest rule yields EXACTLY the sequential greedy
        # matching, so compare edge sets
        best: dict = {}
        for x, y, wt in zip(a.tolist(), b.tolist(), w.tolist()):
            if x == y:
                continue
            u, v = (x, y) if x < y else (y, x)
            if (u, v) not in best or wt > best[(u, v)]:
                best[(u, v)] = wt
        taken: set = set()
        want = set()
        for (u, v), wt in sorted(best.items(),
                                 key=lambda kv: (-kv[1], kv[0])):
            if u not in taken and v not in taken:
                taken |= {u, v}
                want.add((u, v, wt))
        got = set(zip(out["u"], out["v"], out["w"]))
        assert got == want


def test_weighted_matching_prefers_heavy_edge():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    # path 1-2-3: middle edge heaviest → only it matches
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array([2, 3, 4], pa.int64()),
                  "w": pa.array([1.0, 9.0, 1.0], pa.float64())})
    out = maximal_matching(t, weight_col="w", nb=2).to_pandas()
    assert set(zip(out["u"], out["v"])) == {(2, 3)}


def test_weighted_matching_nan_raises_and_parallel_max():
    from biosd_feature_annotator_ray.stages.graph import (
        maximal_matching)

    bad = pa.table({"a": pa.array([1], pa.int64()),
                    "b": pa.array([2], pa.int64()),
                    "w": pa.array([float("nan")], pa.float64())})
    with pytest.raises(Exception):
        maximal_matching(bad, weight_col="w", nb=2).to_pandas()
    # parallel edges collapse to max weight in the output
    t = pa.table({"a": pa.array([1, 2], pa.int64()),
                  "b": pa.array([2, 1], pa.int64()),
                  "w": pa.array([3.0, 8.0], pa.float64())})
    out = maximal_matching(t, weight_col="w", nb=2).to_pandas()
    assert out["w"].tolist() == [8.0]


# -------------------------------------------------------------- resample


def test_resample_pandas_reference_parity():
    from biosd_feature_annotator_ray.stages.windows import (
        resample_per_key)

    rng = np.random.default_rng(31)
    n = 400
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 8, n), pa.int64()),
        "ts": pa.array(
            [None if rng.random() < 0.03 else
             t0 + np.timedelta64(int(rng.integers(0, 3 * 10**10)),
                                 "us") for _ in range(n)],
            pa.timestamp("us")),
        "value": pa.array(
            [None if rng.random() < 0.1 else
             round(float(rng.uniform(0, 50)), 2) for _ in range(n)],
            pa.float64())})
    out = (resample_per_key(rd.from_arrow(t).repartition(4),
                            every=pd.Timedelta(hours=1), nb=4)
           .to_pandas())
    df = t.to_pandas().dropna(subset=["ts"])
    df["b"] = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3600000000)
    for uid, g in df.groupby("user_id"):
        got = (out[out["user_id"] == uid]
               .sort_values("bucket_ts").reset_index(drop=True))
        lo, hi = g["b"].min(), g["b"].max()
        assert len(got) == hi - lo + 1, uid
        for _, row in got.iterrows():
            b = (row["bucket_ts"].to_datetime64()
                 .astype("datetime64[us]").astype("int64")
                 // 3600000000)
            sub = g[g["b"] == b]
            assert row["n_rows"] == len(sub)
            vals = sub["value"].dropna()
            if len(vals):
                assert row["mean_value"] == pytest.approx(
                    vals.mean(), rel=1e-9)
            else:
                assert pd.isna(row["mean_value"])


def test_resample_fill_modes_and_count():
    from biosd_feature_annotator_ray.stages.windows import (
        resample_per_key)

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([ts0, ts0 + np.timedelta64(3, "h"),
                        ts0 + np.timedelta64(3, "h")],
                       pa.timestamp("us")),
        "value": pa.array([2.0, 4.0, 8.0], pa.float64())})
    ff = (resample_per_key(rd.from_arrow(t),
                           every=pd.Timedelta(hours=1),
                           agg="mean", fill="ffill", nb=2)
          .to_pandas().sort_values("bucket_ts"))
    assert ff["mean_value"].tolist() == [2.0, 2.0, 2.0, 6.0]
    z = (resample_per_key(rd.from_arrow(t),
                          every=pd.Timedelta(hours=1),
                          agg="sum", fill="zero", nb=2)
         .to_pandas().sort_values("bucket_ts"))
    assert z["sum_value"].tolist() == [2.0, 0.0, 0.0, 12.0]
    c = (resample_per_key(rd.from_arrow(t),
                          every=pd.Timedelta(hours=1),
                          agg="count", nb=2)
         .to_pandas().sort_values("bucket_ts"))
    assert c["count_value"].tolist() == [1, 0, 0, 2]


def test_resample_grid_overflow_raises():
    from biosd_feature_annotator_ray.stages.windows import (
        ResampleGridOverflow, resample_per_key)

    ts0 = np.datetime64("1970-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([ts0, np.datetime64("2024-01-01", "us")],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0], pa.float64())})
    with pytest.raises(Exception, match="buckets"):
        resample_per_key(rd.from_arrow(t),
                         every=pd.Timedelta(hours=1),
                         max_buckets_per_key=1000, nb=2).to_pandas()
