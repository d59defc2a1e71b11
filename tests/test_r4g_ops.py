"""Eleventh-sitting operators: Kahn topological layering, distributed
skyline (Pareto front), exact heavy hitters, keyed numeric band join."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# --------------------------------------------------------- topo_layers


def _layers_reference(edges: pd.DataFrame) -> dict[int, int]:
    con = duckdb.connect()
    con.register("e", edges)
    df = con.execute(
        "WITH RECURSIVE nodes AS (SELECT src AS node FROM e"
        "  UNION SELECT dst FROM e),"
        " p AS (SELECT node, 0 AS d FROM nodes"
        "   WHERE node NOT IN (SELECT dst FROM e)"
        "  UNION ALL SELECT e.dst, p.d + 1 FROM p JOIN e ON e.src = p.node)"
        " SELECT node, max(d) AS layer FROM p GROUP BY node").df()
    return dict(zip(df["node"].astype(int), df["layer"].astype(int)))


def test_topo_layers_known_dag():
    from biosd_feature_annotator_ray.stages.graph import topo_layers

    edges = pd.DataFrame({"src": [1, 1, 2, 3, 10, 10, 4],
                          "dst": [2, 3, 4, 4, 11, 12, 11]})
    out = topo_layers(rd.from_pandas(edges).repartition(2)).to_pandas()
    got = dict(zip(out["node"].astype(int), out["layer"].astype(int)))
    assert got == {1: 0, 10: 0, 2: 1, 3: 1, 12: 1, 4: 2, 11: 3}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_topo_layers_random_dag_duckdb_parity(seed):
    from biosd_feature_annotator_ray.stages.graph import topo_layers

    rng = np.random.default_rng(seed)
    n = 60
    src = rng.integers(0, n - 1, 150)
    # dst strictly greater than src -> guaranteed DAG
    dst = src + 1 + rng.integers(0, 5, 150)
    edges = pd.DataFrame({"src": src, "dst": np.minimum(dst, n)})
    edges = edges[edges.src != edges.dst].drop_duplicates()
    out = topo_layers(rd.from_pandas(edges).repartition(3)).to_pandas()
    got = dict(zip(out["node"].astype(int), out["layer"].astype(int)))
    assert got == _layers_reference(edges)


def test_topo_layers_cycle_raises():
    from biosd_feature_annotator_ray.stages.graph import topo_layers

    edges = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
    with pytest.raises(ValueError, match="cycle"):
        topo_layers(rd.from_pandas(edges)).to_pandas()


def test_topo_layers_string_nodes_and_empty():
    from biosd_feature_annotator_ray.stages.graph import topo_layers

    edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    out = topo_layers(rd.from_pandas(edges)).to_pandas()
    got = dict(zip(out["node"], out["layer"].astype(int)))
    assert got == {"a": 0, "b": 1, "c": 2}

    empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                          "dst": pd.Series([], dtype="int64")})
    out = topo_layers(rd.from_pandas(empty)).to_pandas()
    assert len(out) == 0


# ------------------------------------------------------------- skyline


def _skyline_reference(df: pd.DataFrame, cols, maximize) -> set:
    m = df.dropna(subset=cols)
    M = m[cols].to_numpy(float).copy()
    for i, mx in enumerate(maximize):
        if mx:
            M[:, i] = -M[:, i]
    keep = []
    for i in range(len(M)):
        dominated = False
        for j in range(len(M)):
            if i == j:
                continue
            if (M[j] <= M[i]).all() and (M[j] < M[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(m.index[i])
    return set(m.loc[keep, "id"])


@pytest.mark.parametrize("seed,d", [(0, 2), (1, 3), (2, 4)])
def test_skyline_reference_parity(seed, d):
    from biosd_feature_annotator_ray.stages.sketches import skyline

    rng = np.random.default_rng(seed)
    n = 800
    df = pd.DataFrame({f"c{i}": rng.uniform(0, 1, n) for i in range(d)})
    df["id"] = np.arange(n)
    df.loc[0, "c0"] = np.nan  # null criterion -> excluded
    maximize = [i % 2 == 1 for i in range(d)]
    cols = [f"c{i}" for i in range(d)]
    out = skyline(rd.from_pandas(df).repartition(4), cols,
                  maximize=maximize, batch_size=128).to_pandas()
    assert set(out["id"]) == _skyline_reference(df, cols, maximize)


def test_skyline_duplicate_frontier_points_all_kept():
    from biosd_feature_annotator_ray.stages.sketches import skyline

    df = pd.DataFrame({"x": [1.0, 1.0, 2.0, 3.0], "y": [5.0, 5.0, 4.0, 6.0],
                       "id": [0, 1, 2, 3]})
    # minimize x, maximize y: (1,5)x2 on the front; (2,4) dominated by
    # (1,5); (3,6) kept (higher y).
    out = skyline(rd.from_pandas(df), ["x", "y"],
                  maximize=[False, True]).to_pandas()
    assert sorted(out["id"]) == [0, 1, 3]


def test_skyline_max_candidates_guard():
    from biosd_feature_annotator_ray.stages.sketches import skyline

    # anti-correlated ring: every point is on the front
    t = np.linspace(0, np.pi / 2, 500)
    df = pd.DataFrame({"x": np.cos(t), "y": np.sin(t)})
    with pytest.raises(ValueError, match="max_candidates"):
        skyline(rd.from_pandas(df), ["x", "y"], maximize=[True, True],
                max_candidates=100)


# -------------------------------------------------- exact_heavy_hitters


@pytest.mark.parametrize("seed,k", [(0, 10), (1, 25), (2, 50)])
def test_exact_heavy_hitters_duckdb_parity(seed, k):
    from biosd_feature_annotator_ray.stages.sketches import exact_heavy_hitters

    rng = np.random.default_rng(seed)
    vals = np.concatenate([
        rng.integers(0, 2000, 6000),         # long tail
        np.repeat(rng.integers(0, 50, 5), rng.integers(500, 1500, 5)),
    ]).astype("float64")
    df = pd.DataFrame({"v": vals})
    df.loc[rng.integers(0, len(df), 50), "v"] = np.nan
    ds = exact_heavy_hitters(
        rd.from_pandas(df).repartition(5), "v", k=k, nb=4)
    got_t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)),
        promote_options="permissive") if ds.count() else None
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        f"SELECT v, count(*) AS count FROM t WHERE v IS NOT NULL"
        f" GROUP BY v HAVING count(*) * {k} > (SELECT count(v) FROM t)").df()
    got = (sorted(zip(got_t["v"].to_pylist(),
                      got_t["count"].to_pylist())) if got_t is not None else [])
    want = sorted(zip(exp["v"], exp["count"].astype(int)))
    assert got == want
    if seed == 0 and k == 10:
        assert len(want) > 0  # at least one case exercises survivors


def test_exact_heavy_hitters_none_qualify_schema():
    from biosd_feature_annotator_ray.stages.sketches import exact_heavy_hitters

    df = pd.DataFrame({"v": np.arange(1000, dtype="int64")})  # all unique
    ds = exact_heavy_hitters(rd.from_pandas(df), "v", k=10)
    assert ds.count() == 0
    # the typed-empty early return keeps the (col, count) schema
    assert ds.schema().names == ["v", "count"]


# ----------------------------------------------------------- band_join


@pytest.mark.parametrize("seed,eps", [(0, 0.25), (1, 1.0), (2, 3.5)])
def test_band_join_duckdb_parity(seed, eps):
    from biosd_feature_annotator_ray.stages.join import band_join

    rng = np.random.default_rng(seed)
    n = 1500
    L = pd.DataFrame({"k": rng.integers(0, 4, n).astype(str),
                      "v": np.round(rng.uniform(-50, 50, n), 2),
                      "lid": np.arange(n, dtype="int64")})
    R = pd.DataFrame({"k": rng.integers(0, 4, n).astype(str),
                      "v": np.round(rng.uniform(-50, 50, n), 2),
                      "rid": np.arange(n, dtype="int64")})
    L.loc[3, "v"] = np.nan
    R.loc[5, "k"] = None
    out = band_join(rd.from_pandas(L).repartition(3),
                    rd.from_pandas(R).repartition(4),
                    "k", "v", eps=eps, nb=8).to_pandas()
    con = duckdb.connect()
    con.register("L", L)
    con.register("R", R)
    exp = con.execute(
        f"SELECT l.k, l.v, l.lid, r.v AS v_r, r.rid FROM L l JOIN R r"
        f" ON l.k = r.k AND abs(l.v - r.v) <= {eps}").df()
    got = out.sort_values(["lid", "rid"]).reset_index(drop=True)
    want = exp.sort_values(["lid", "rid"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["k", "v", "lid", "v_r", "rid"]].astype({"lid": "int64", "rid": "int64"}),
        want.astype({"lid": "int64", "rid": "int64"}),
        check_dtype=False)


def test_band_join_exact_boundary_and_negative_cells():
    from biosd_feature_annotator_ray.stages.join import band_join

    # |dv| == eps is INSIDE the band; values straddle 0 (negative cells)
    L = pd.DataFrame({"k": ["a", "a"], "v": [-0.1, 0.0],
                      "lid": [0, 1]})
    R = pd.DataFrame({"k": ["a", "a"], "v": [0.15, -0.35],
                      "rid": [0, 1]})
    out = band_join(rd.from_pandas(L), rd.from_pandas(R),
                    "k", "v", eps=0.25).to_pandas()
    pairs = set(zip(out["lid"].astype(int), out["rid"].astype(int)))
    assert pairs == {(0, 0), (0, 1), (1, 0)}  # |0.0-(-0.35)|=0.35 out


def test_band_join_empty_side():
    from biosd_feature_annotator_ray.stages.join import band_join

    L = pd.DataFrame({"k": ["a"], "v": [1.0], "lid": [0]})
    R = pd.DataFrame({"k": pd.Series([], dtype="str"),
                      "v": pd.Series([], dtype="float64"),
                      "rid": pd.Series([], dtype="int64")})
    out = band_join(rd.from_pandas(L), rd.from_pandas(R),
                    "k", "v", eps=0.5).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------- bigram_nll


def _bigram_reference(texts, max_vocab, k):
    import math
    toks = {i: t.split() for i, t in enumerate(texts)}
    from collections import Counter
    cnt = Counter(w for ts in toks.values() for w in ts)
    vocab = set(t for t, _ in sorted(cnt.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:max_vocab])
    V = len(vocab) + 1
    def m(w):
        return w if w in vocab else "<unk>"
    bigrams = Counter()
    ctx = Counter()
    for ts in toks.values():
        prev = ""
        for w in ts:
            bigrams[(prev, m(w))] += 1
            ctx[prev] += 1
            prev = m(w)
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        prev, s = "", 0.0
        for w in ts:
            s += -math.log((bigrams[(prev, m(w))] + k) / (ctx[prev] + k * V))
            prev = m(w)
        out[i] = (len(ts), math.floor(s / len(ts) * 1e6 + 0.5) / 1e6)
    return out


def test_bigram_nll_reference_parity():
    from biosd_feature_annotator_ray.stages.textstats import bigram_nll

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, rng.integers(1, 40)))
             for _ in range(120)]
    texts.append("")          # empty doc -> dropped
    texts.append("solo")      # single token -> one (BOS, t) bigram
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})
    out = bigram_nll(rd.from_pandas(df).repartition(3), max_vocab=12,
                     k=0.5, nb=4).to_pandas()
    ref = _bigram_reference(texts, max_vocab=12, k=0.5)
    got = {int(r.doc_id): (int(r.n_bigrams), float(r.nll))
           for r in out.itertuples()}
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0]
        assert abs(got[i][1] - ref[i][1]) < 2e-6, (i, got[i], ref[i])


def test_bigram_nll_order_sensitivity():
    """Same bag of words, different ORDER -> different bigram NLL
    (the property the unigram scorer cannot express)."""
    from biosd_feature_annotator_ray.stages.textstats import bigram_nll

    base = ["the cat sat on the mat"] * 20
    df = pd.DataFrame({
        "doc_id": np.arange(22, dtype="int64"),
        "text": base + ["the cat sat on the mat",
                        "mat the on sat cat the"]})
    out = bigram_nll(rd.from_pandas(df), max_vocab=100, nb=2).to_pandas()
    nll = dict(zip(out["doc_id"].astype(int), out["nll"]))
    assert nll[20] < nll[21]  # in-order doc scores better


def test_bigram_nll_max_bigrams_guard():
    from biosd_feature_annotator_ray.stages.textstats import bigram_nll

    texts = [" ".join(f"u{i}_{j}" for j in range(30)) for i in range(30)]
    df = pd.DataFrame({"doc_id": np.arange(30, dtype="int64"),
                       "text": texts})
    with pytest.raises(ValueError, match="max_bigrams"):
        bigram_nll(rd.from_pandas(df), max_vocab=4096, max_bigrams=100,
                   nb=2).to_pandas()


# --------------------------------------------------------- betweenness


def _brandes_reference(edge_list, sources=None):
    from collections import defaultdict, deque
    adj = defaultdict(list)
    nodes = set()
    for u, v in edge_list:
        adj[u].append(v)
        nodes |= {u, v}
    S = sources if sources is not None else sorted(nodes)
    bc = defaultdict(float)
    for s in S:
        stack, pred = [], defaultdict(list)
        sigma, dist = defaultdict(int), {}
        sigma[s], dist[s] = 1, 0
        Q = deque([s])
        while Q:
            v = Q.popleft()
            stack.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = defaultdict(float)
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {n: round(bc.get(n, 0.0), 6) for n in nodes}


@pytest.mark.parametrize("seed", [0, 1])
def test_betweenness_brandes_parity(seed):
    from biosd_feature_annotator_ray.stages.graph import betweenness

    rng = np.random.default_rng(seed)
    u = rng.integers(0, 30, 90)
    v = rng.integers(0, 30, 90)
    el = list(dict.fromkeys((a, b) for a, b in zip(u, v) if a != b))
    df = pd.DataFrame(el, columns=["src", "dst"])
    out = betweenness(rd.from_pandas(df).repartition(3), nb=8).to_pandas()
    got = dict(zip(out["node"].astype(int), out["bc"]))
    want = _brandes_reference(el)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-5, (n, got[n], want[n])


def test_betweenness_sampled_sources():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    el = [(0, 1), (1, 2), (2, 3), (3, 4)]  # path: sources {0, 2}
    df = pd.DataFrame(el, columns=["src", "dst"])
    out = betweenness(rd.from_pandas(df), sources=[0, 2], nb=4).to_pandas()
    got = dict(zip(out["node"].astype(int), out["bc"]))
    assert got == _brandes_reference(el, sources=[0, 2])


def test_betweenness_sink_only_frontier_terminates():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    # star: every non-center node is a sink -> round-2 frontier all sinks
    el = [(0, i) for i in range(1, 6)]
    out = betweenness(rd.from_pandas(
        pd.DataFrame(el, columns=["src", "dst"])), nb=4).to_pandas()
    assert set(out["bc"]) == {0.0}


# -------------------------------------------------------- survivorship


@pytest.mark.parametrize("seed,asc", [(0, True), (1, False)])
def test_survivorship_duckdb_parity(seed, asc):
    from biosd_feature_annotator_ray.stages.canonicalize import survivorship

    rng = np.random.default_rng(seed)
    n = 2500
    df = pd.DataFrame({
        "k": rng.integers(0, 35, n),
        "ord": rng.integers(0, 400, n),   # heavy order ties -> rid breaks
        "rid": np.arange(n, dtype="int64"),
        "a": np.where(rng.random(n) < 0.5, np.nan,
                      rng.integers(0, 100, n).astype(float)),
        "b": np.where(rng.random(n) < 0.7, None,
                      rng.choice(list("xyz"), n)),
    })
    df.loc[df.k == 0, "a"] = np.nan  # a key with an all-null column
    out = survivorship(rd.from_pandas(df).repartition(5), "k", "ord",
                       "rid", ["a", "b"], ascending=asc, nb=4).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    d = "" if asc else "DESC"
    exp = con.execute(f"""
     SELECT k,
      (SELECT a FROM t i WHERE i.k = o.k AND a IS NOT NULL
        ORDER BY ord {d}, rid LIMIT 1) AS a,
      (SELECT b FROM t i WHERE i.k = o.k AND b IS NOT NULL
        ORDER BY ord {d}, rid LIMIT 1) AS b
     FROM (SELECT DISTINCT k FROM t) o""").df()
    got = out.sort_values("k").reset_index(drop=True)
    want = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "a", "b"]],
                                  want[["k", "a", "b"]], check_dtype=False)


def test_survivorship_salted_partitioning_invariance():
    from biosd_feature_annotator_ray.stages.canonicalize import survivorship

    rng = np.random.default_rng(9)
    n = 1200
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n),  # 3 hot keys
        "ord": rng.integers(0, 50, n),
        "rid": np.arange(n, dtype="int64"),
        "a": np.where(rng.random(n) < 0.5, np.nan,
                      rng.integers(0, 9, n).astype(float)),
    })
    a = survivorship(rd.from_pandas(df).repartition(2), "k", "ord",
                     "rid", ["a"], nb=2).to_pandas()
    b = survivorship(rd.from_pandas(df.sample(frac=1, random_state=1))
                     .repartition(7), "k", "ord", "rid", ["a"],
                     nb=4).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("k").reset_index(drop=True),
        b.sort_values("k").reset_index(drop=True), check_dtype=False)


# --------------------------------------------------------- roc_auc


def _auc_reference(s, y):
    order = np.argsort(s, kind="mergesort")
    sv, yv = s[order], y[order]
    ranks = np.empty(len(sv))
    i, r = 0, 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[i:j] = (r + (r + j - i - 1)) / 2
        r += j - i
        i = j
    P = yv.sum()
    N = len(yv) - P
    return (ranks[yv == 1].sum() - P * (P + 1) / 2) / (P * N)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roc_auc_rank_sum_parity(seed):
    from biosd_feature_annotator_ray.stages.sketches import roc_auc

    rng = np.random.default_rng(seed)
    n = 6000
    y = (rng.random(n) < 0.25).astype(int)
    s = np.round(rng.normal(0, 1, n) + 0.9 * y, 1)  # heavy ties
    df = pd.DataFrame({"s": s, "y": y})
    df.loc[0, "s"] = np.nan  # excluded
    got = roc_auc(rd.from_pandas(df).repartition(5), "s", "y",
                  n_bins=32, nb=4)
    d = df.dropna()
    want = _auc_reference(d["s"].to_numpy(), d["y"].to_numpy())
    assert abs(got - want) < 1e-9


def test_roc_auc_single_class_raises():
    from biosd_feature_annotator_ray.stages.sketches import roc_auc

    df = pd.DataFrame({"s": np.arange(100.0), "y": np.ones(100, int)})
    with pytest.raises(ValueError, match="both classes"):
        roc_auc(rd.from_pandas(df), "s", "y", n_bins=8)


def test_roc_auc_perfect_separation():
    from biosd_feature_annotator_ray.stages.sketches import roc_auc

    df = pd.DataFrame({"s": np.arange(200.0),
                       "y": (np.arange(200) >= 100).astype(int)})
    assert roc_auc(rd.from_pandas(df).repartition(3), "s", "y",
                   n_bins=16) == 1.0


# ------------------------------------------------- logistic regression


def test_logistic_fit_matches_reference_irls():
    from biosd_feature_annotator_ray.stages.textstats import (
        logistic_fit, logistic_predict)

    rng = np.random.default_rng(0)
    n = 3000
    X = rng.normal(0, 1, (n, 3))
    p = 1 / (1 + np.exp(-(X @ np.array([2.0, -1.0, 0.5]) - 0.3)))
    y = (rng.random(n) < p).astype(int)
    df = pd.DataFrame({"f0": X[:, 0], "f1": X[:, 1], "f2": X[:, 2],
                       "y": y, "doc_id": np.arange(n, dtype="int64")})
    m = logistic_fit(rd.from_pandas(df).repartition(5),
                     ["f0", "f1", "f2"], "y", iters=10)
    mu, sd = X.mean(0), X.std(0)
    Xs = np.column_stack([np.ones(n), (X - mu) / sd])
    w = np.zeros(4)
    for _ in range(10):
        z = np.clip(Xs @ w, -30, 30)
        q = 1 / (1 + np.exp(-z))
        g = Xs.T @ (q - y)
        H = Xs.T @ (Xs * (q * (1 - q))[:, None])
        reg = 1e-4 * np.eye(4)
        reg[0, 0] = 0
        step = np.linalg.solve(H + reg, g + reg @ w)
        w = w - step
        if abs(step).max() < 1e-10:
            break
    assert np.allclose(np.r_[m["b"], m["w"]], w, atol=1e-6)
    sc = logistic_predict(rd.from_pandas(df).repartition(3), m,
                          ["f0", "f1", "f2"]).to_pandas()
    sc = sc.sort_values("doc_id")
    acc = ((sc["score"] > 0.5).to_numpy().astype(int) == y).mean()
    assert acc > 0.75  # separable synthetic data


def test_logistic_predict_null_feature_scores_null():
    from biosd_feature_annotator_ray.stages.textstats import (
        logistic_fit, logistic_predict)

    rng = np.random.default_rng(1)
    n = 500
    df = pd.DataFrame({"f0": rng.normal(0, 1, n),
                       "y": (rng.random(n) < 0.5).astype(int),
                       "doc_id": np.arange(n, dtype="int64")})
    m = logistic_fit(rd.from_pandas(df), ["f0"], "y", iters=5)
    df2 = df.copy()
    df2.loc[0, "f0"] = np.nan
    sc = logistic_predict(rd.from_pandas(df2), m, ["f0"]).to_pandas()
    sc = sc.sort_values("doc_id").reset_index(drop=True)
    assert pd.isna(sc.loc[0, "score"])
    assert sc["score"].iloc[1:].notna().all()


def test_logistic_fit_feature_guard():
    from biosd_feature_annotator_ray.stages.textstats import logistic_fit

    df = pd.DataFrame({"y": [0, 1]})
    with pytest.raises(ValueError, match="1..64 features"):
        logistic_fit(rd.from_pandas(df), [], "y")


# ------------------------------------------------ running_nunique_per_key


@pytest.mark.parametrize("seed", [0, 1])
def test_running_nunique_duckdb_parity(seed):
    from biosd_feature_annotator_ray.stages.windows import (
        running_nunique_per_key)

    rng = np.random.default_rng(seed)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n),
        "ord": rng.integers(0, 10_000, n),
        "rid": np.arange(n, dtype="int64"),
        "v": rng.choice(list("abcde"), n),
    })
    df.loc[rng.integers(0, n, 100), "v"] = None  # nulls never count
    out = running_nunique_per_key(
        rd.from_pandas(df).repartition(4), key_col="k", value_col="v",
        order_cols=["ord", "rid"], nb=4).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
     SELECT o.rid, (SELECT count(DISTINCT i.v) FROM t i
        WHERE i.k = o.k AND (i.ord < o.ord
          OR (i.ord = o.ord AND i.rid <= o.rid))) AS n_distinct
     FROM t o""").df()
    got = out.sort_values("rid")["n_distinct"].astype(int).to_numpy()
    want = exp.sort_values("rid")["n_distinct"].astype(int).to_numpy()
    assert (got == want).all()


def test_running_nunique_hot_key_spills_with_parity():
    # r04 weak item closed: the over-bound bucket now degrades
    # through the sorted sub-slice spill (the global first-occurrence
    # pre-pass made the finisher a plain cumsum) — the planted hot
    # key COMPLETES and matches the vectorized path exactly
    from biosd_feature_annotator_ray.stages.windows import (
        running_nunique_per_key)

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": np.zeros(500, int),
                       "ord": np.arange(500),
                       "rid": np.arange(500, dtype="int64"),
                       "v": rng.choice(list("abcdefgh"), 500)})
    df.loc[rng.integers(0, 500, 30), "v"] = None
    spill = running_nunique_per_key(
        rd.from_pandas(df), key_col="k", value_col="v",
        order_cols=["ord", "rid"], nb=1,
        max_bucket_rows=100).to_pandas()
    vec = running_nunique_per_key(
        rd.from_pandas(df), key_col="k", value_col="v",
        order_cols=["ord", "rid"], nb=1).to_pandas()
    a = spill.sort_values("rid")["n_distinct"].to_numpy()
    b = vec.sort_values("rid")["n_distinct"].to_numpy()
    assert (a == b).all() and len(a) == 500


# --------------------------------------------------------- trend_per_key


def test_trend_per_key_reference_and_degenerates():
    from biosd_feature_annotator_ray.stages.sketches import trend_per_key

    rng = np.random.default_rng(4)
    frames = []
    # key 'a': clean linear y = 3x - 2 + noise
    x = rng.uniform(0, 10, 400)
    frames.append(pd.DataFrame({
        "k": "a", "x": x, "y": 3 * x - 2 + rng.normal(0, .1, 400)}))
    # key 'b': single point -> all null
    frames.append(pd.DataFrame({"k": ["b"], "x": [1.0], "y": [2.0]}))
    # key 'c': constant x -> zero x-variance -> all null
    frames.append(pd.DataFrame({
        "k": "c", "x": np.ones(50), "y": rng.uniform(0, 1, 50)}))
    # key 'd': constant y -> slope 0, r2 null
    frames.append(pd.DataFrame({
        "k": "d", "x": np.arange(50, dtype=float), "y": np.ones(50)}))
    df = pd.concat(frames, ignore_index=True)
    out = trend_per_key(rd.from_pandas(df).repartition(3), "k", "x", "y",
                        nb=4).to_pandas().set_index("k")
    a = out.loc["a"]
    # closed-form reference
    d = df[df.k == "a"]
    n, sx, sy = len(d), d.x.sum(), d.y.sum()
    sxy, sxx, syy = (d.x * d.y).sum(), (d.x ** 2).sum(), (d.y ** 2).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icpt = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(a["slope"] - round(slope, 6)) < 2e-6
    assert abs(a["intercept"] - round(icpt, 6)) < 2e-6
    assert abs(a["r2"] - round(r2, 6)) < 2e-6
    assert pd.isna(out.loc["b"]).all()
    assert pd.isna(out.loc["c"]).all()
    assert out.loc["d", "slope"] == 0.0 and pd.isna(out.loc["d", "r2"])


# -------------------------------------------------------------- CLI


def test_cli_topo_centrality_golden(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq_

    def run(*a):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray", *a,
             "--num-cpus", "2"],
            capture_output=True, text=True, check=True, cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    edges = pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                      "dst": pa.array([1, 2, 3, 2], pa.int64())})
    ep = tmp_path / "edges.parquet"
    pq_.write_table(edges, str(ep))

    got = run("topo", "--input", str(ep),
              "--output", str(tmp_path / "topo"))
    assert got["nodes"] == 4 and got["depth"] == 3

    got = run("centrality", "--input", str(ep),
              "--output", str(tmp_path / "bc"))
    assert got["nodes"] == 4 and not got["sampled"]
    bc = pq_.read_table(str(tmp_path / "bc")).to_pandas()
    want = _brandes_reference([(0, 1), (1, 2), (2, 3), (0, 2)])
    assert dict(zip(bc["node"].astype(int), bc["bc"])) == want

    recs = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "ord": pa.array([1, 2, 1], pa.int64()),
        "rid": pa.array([0, 1, 2], pa.int64()),
        "a": pa.array([None, 5.0, 7.0], pa.float64())})
    rp = tmp_path / "recs.parquet"
    pq_.write_table(recs, str(rp))
    got = run("golden", "--input", str(rp),
              "--output", str(tmp_path / "golden"),
              "--key", "k", "--order-col", "ord", "--id-col", "rid",
              "--descending")
    assert got["keys"] == 2
    g = (pq_.read_table(str(tmp_path / "golden")).to_pandas()
         .sort_values("k"))
    assert g["a"].tolist() == [5.0, 7.0]
