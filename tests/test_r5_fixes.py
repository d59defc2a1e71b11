"""Round-5 ADVICE regressions: join-cardinality int64 sum wrap and
phrase_search null-typed empty doc column under string ids."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.join import (
    _products_int64_checked, join_cardinality_estimate)
from biosd_feature_annotator_ray.stages.textindex import phrase_search


# --- _products_int64_checked -----------------------------------------------

def test_product_sum_wrap_raises_not_garbage():
    # 3 keys x 2^62 pairs each: every per-key product fits int64 but
    # the np.int64 batch sum wraps negative — the ADVICE scenario.
    nl = np.array([2 ** 31] * 3, np.int64)
    nr = np.array([2 ** 31] * 3, np.int64)
    with pytest.raises(ValueError, match="exceeds int64"):
        _products_int64_checked(nl, nr)


def test_product_single_key_overflow_still_raises():
    nl = np.array([2 ** 32], np.int64)
    nr = np.array([2 ** 32], np.int64)
    with pytest.raises(ValueError, match="exceeds int64"):
        _products_int64_checked(nl, nr)


def test_product_near_edge_exact_python_path():
    # max product just over the float guard but total under int64:
    # must return exact values (Python-int path, no raise).
    nl = np.array([2 ** 31 + 3, 7], np.int64)
    nr = np.array([2 ** 31 + 5, 11], np.int64)
    got = _products_int64_checked(nl, nr)
    assert got.dtype == np.int64
    assert int(got[0]) == (2 ** 31 + 3) * (2 ** 31 + 5)
    assert int(got[1]) == 77


def test_product_small_counts_vectorized_path():
    nl = np.array([2, 3, 0], np.int64)
    nr = np.array([5, 7, 9], np.int64)
    assert _products_int64_checked(nl, nr).tolist() == [10, 21, 0]
    assert _products_int64_checked(
        np.array([], np.int64), np.array([], np.int64)).tolist() == []


def test_join_cardinality_end_to_end_unchanged():
    l = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2, 2, 2, 3])}))
    r = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 4])}))
    got = join_cardinality_estimate(l, r, "k", nb=2).to_pylist()[0]
    assert got["est_rows"] == 2 * 1 + 3 * 2
    assert got["n_common_keys"] == 2
    assert got["max_key_rows"] == 6


# --- phrase_search with string ids -----------------------------------------

def _docs_str_ids(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(texts))],
                           pa.string()),
        "text": pa.array(texts, pa.string())}))


def test_phrase_search_string_ids_with_empty_batches():
    # Force batches that contain NO phrase-term tokens: with string
    # ids the empty object-array concat used to infer a null-typed
    # 'doc' column and break downstream schema unification.
    ds = _docs_str_ids(
        ["zz yy xx", "qq rr", "the cat sat", "ww vv",
         "uu tt", "cat the cat", "mm nn", "the cat the cat"]
    ).repartition(8)  # ~1 row per block → guaranteed all-miss batches
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(ds, "the cat", nb=2).take_all()}
    assert got == {"d2": 1, "d5": 1, "d7": 2}


def test_phrase_search_string_ids_no_hits_anywhere():
    ds = _docs_str_ids(["aa bb", "cc dd"]).repartition(2)
    assert phrase_search(ds, "the cat", nb=2).take_all() == []


# --- betweenness guardrail (round-4 weak item) ------------------------------

def _md5_sample(nodes, k):
    import hashlib
    return sorted(v for v in nodes
                  if int(hashlib.md5(str(v).encode())
                         .hexdigest()[:8], 16) % k == 0)


def test_betweenness_sampled_rescale_equals_raw_times_factor():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    rng = np.random.default_rng(7)
    el = list(dict.fromkeys(
        (int(a), int(b)) for a, b in zip(rng.integers(0, 20, 60),
                                         rng.integers(0, 20, 60))
        if a != b))
    nodes = sorted({x for e in el for x in e})
    import pandas as pd
    df = pd.DataFrame(el, columns=["src", "dst"])
    import ray.data as _rd
    sampled = _md5_sample(nodes, 2)
    assert 0 < len(sampled) < len(nodes)
    factor = len(nodes) / len(sampled)

    got = betweenness(_rd.from_pandas(df).repartition(3),
                      sample_every=2, nb=8).to_pandas()
    raw = betweenness(_rd.from_pandas(df).repartition(3),
                      sources=sampled, nb=8).to_pandas()
    g = dict(zip(got["node"].astype(int), got["bc"]))
    r = dict(zip(raw["node"].astype(int), raw["bc"]))
    # sampled path settles the same reachable set; rescale is built in
    for n in r:
        assert abs(g.get(n, 0.0) - r[n] * factor) < 1e-4, n


def test_betweenness_sample_every_no_rescale():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    import pandas as pd
    import ray.data as _rd
    el = [(i, i + 1) for i in range(8)]
    df = pd.DataFrame(el, columns=["src", "dst"])
    nodes = list(range(9))
    sampled = _md5_sample(nodes, 3)
    got = betweenness(_rd.from_pandas(df), sample_every=3,
                      rescale=False, nb=4).to_pandas()
    raw = betweenness(_rd.from_pandas(df), sources=sampled,
                      nb=4).to_pandas()
    g = dict(zip(got["node"].astype(int), got["bc"]))
    r = dict(zip(raw["node"].astype(int), raw["bc"]))
    for n in r:
        assert abs(g.get(n, 0.0) - r[n]) < 1e-9


def test_betweenness_exact_over_bound_raises():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    import pandas as pd
    import ray.data as _rd
    el = [(i, i + 1) for i in range(30)]   # 31 nodes
    ds = _rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    with pytest.raises(ValueError, match="max_exact_nodes"):
        betweenness(ds, max_exact_nodes=10, nb=4)
    # sampled estimator over the same graph completes
    out = betweenness(ds, max_exact_nodes=10, sample_every=4,
                      nb=4).to_pandas()
    assert len(out) == 31


def test_betweenness_explicit_sources_rejects_sample_every():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    import pandas as pd
    import ray.data as _rd
    ds = _rd.from_pandas(pd.DataFrame(
        [(0, 1)], columns=["src", "dst"]))
    with pytest.raises(ValueError, match="sample_every"):
        betweenness(ds, sources=[0], sample_every=2)


# --- path-doubling closure --------------------------------------------------

def test_closure_doubling_matches_seminaive():
    from biosd_feature_annotator_ray.stages.graph import (
        transitive_closure, transitive_closure_doubling)

    import random
    import ray.data as _rd
    rng = random.Random(5)
    edges = sorted({(rng.randrange(30), 30 + rng.randrange(30))
                    for _ in range(40)}
                   | {(i, i + 1) for i in range(60, 90)})  # deep chain
    t = pa.table({"child": pa.array([a for a, _ in edges], pa.int64()),
                  "parent": pa.array([b for _, b in edges], pa.int64())})
    a = transitive_closure(
        _rd.from_arrow(t).repartition(3), nb=4).to_pandas()
    b = transitive_closure_doubling(
        _rd.from_arrow(t).repartition(3), nb=4).to_pandas()
    ka = sorted(map(tuple, a[["node", "anc"]].itertuples(index=False)))
    kb = sorted(map(tuple, b[["node", "anc"]].itertuples(index=False)))
    assert ka == kb and len(ka) > 0


def test_closure_doubling_cycle_raises():
    from biosd_feature_annotator_ray.stages.graph import (
        transitive_closure_doubling)

    import ray.data as _rd
    t = pa.table({"child": pa.array([0, 1, 2], pa.int64()),
                  "parent": pa.array([1, 2, 0], pa.int64())})
    with pytest.raises(ValueError, match="cycle"):
        transitive_closure_doubling(_rd.from_arrow(t), nb=2)


def test_closure_doubling_string_nodes():
    from biosd_feature_annotator_ray.stages.graph import (
        transitive_closure_doubling)

    import ray.data as _rd
    t = pa.table({"child": ["a", "b", "c"], "parent": ["b", "c", "d"]})
    got = transitive_closure_doubling(_rd.from_arrow(t), nb=2).to_pandas()
    pairs = set(map(tuple, got[["node", "anc"]].itertuples(index=False)))
    assert pairs == {("a", "b"), ("a", "c"), ("a", "d"),
                     ("b", "c"), ("b", "d"), ("c", "d")}


# --- round-5 code-review fixes ---------------------------------------------

def test_scc_null_endpoint_both_paths():
    # an edge with a NULL endpoint never joins (SQL semantics): the
    # null settles as its own singleton and the non-null side keeps
    # only its other edges — on the LOCAL Tarjan path too (used to
    # TypeError on sorted(None, int))
    from biosd_feature_annotator_ray.stages.graph import scc

    import ray.data as _rd
    t = pa.table({
        "src": pa.array([0, 1, 2, None, 3], pa.int64()),
        "dst": pa.array([1, 0, None, 3, 3], pa.int64())})
    for cutoff in (200_000, 0):
        got = {r["node"]: r["scc"]
               for r in scc(_rd.from_arrow(t), nb=2,
                            local_cutoff_edges=cutoff).take_all()}
        assert got[0] == got[1] == 0
        assert got[2] == 2 and got[3] == 3
        assert None in got and got[None] is None


def test_running_nunique_nan_values_do_not_count():
    from biosd_feature_annotator_ray.stages.windows import (
        running_nunique_per_key)

    import pandas as pd
    df = pd.DataFrame({
        "k": [1, 1, 1, 1],
        "ord": [0, 1, 2, 3],
        "rid": [0, 1, 2, 3],
        "v": [1.0, float("nan"), 2.0, float("nan")]})
    out = (running_nunique_per_key(
        rd.from_pandas(df), key_col="k", value_col="v",
        order_cols=["ord", "rid"], nb=1).to_pandas()
        .sort_values("rid"))
    # NaN behaves like NULL (the seen-set formulation's notna())
    assert out["n_distinct"].tolist() == [1, 1, 2, 2]


def test_betweenness_sample_every_one_is_exact_opt_in():
    from biosd_feature_annotator_ray.stages.graph import betweenness

    import pandas as pd
    import ray.data as _rd
    el = [(i, i + 1) for i in range(12)]
    ds = _rd.from_pandas(pd.DataFrame(el, columns=["src", "dst"]))
    # 13 nodes > max_exact_nodes=5, but sample_every=1 is an explicit
    # every-node opt-in: runs exact, no guard, factor 1
    got = betweenness(ds, sample_every=1, max_exact_nodes=5,
                      nb=4).to_pandas()
    exact = betweenness(ds, nb=4).to_pandas()
    g = dict(zip(got["node"], got["bc"]))
    e = dict(zip(exact["node"], exact["bc"]))
    assert g == e
