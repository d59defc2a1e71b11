"""Thirteenth-sitting wave 3: neighbor feature propagation, edge-cut
census, approximate FD check, S-stemmer, MMR diverse selection."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.functions.normalize import s_stem_array
from biosd_feature_annotator_ray.stages.graph import (
    edge_cut_report, neighbor_agg)
from biosd_feature_annotator_ray.stages.profile import fd_violations
from biosd_feature_annotator_ray.stages.similarity import mmr_select


# --- neighbor_agg ----------------------------------------------------------

def test_neighbor_agg_hand_graph():
    # 1->3, 2->3, 3->4 ; features: node value
    edges = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                      "dst": pa.array([3, 3, 4], pa.int64())})
    feats = pa.table({"node": pa.array([1, 2, 3, 4], pa.int64()),
                      "x": pa.array([10.0, 20.0, 30.0, 40.0])})
    out = {r["node"]: r for r in
           neighbor_agg(edges, feats, k=2, nb=2).take_all()}
    # hop1: node3 = mean(10,20)=15; node4 = mean(30)=30
    assert out[3]["x_h1"] == pytest.approx(15.0)
    assert out[4]["x_h1"] == pytest.approx(30.0)
    # hop2: node4 = mean(h1 of 3) = 15; node3 has no h1-in-neighbors
    assert out[4]["x_h2"] == pytest.approx(15.0)
    assert out[3]["x_h2"] is None
    assert set(out) == {3, 4}
    with pytest.raises(ValueError):
        neighbor_agg(edges, feats, k=0)


# --- edge_cut_report -------------------------------------------------------

def test_edge_cut_extremes():
    # self-loops never cut
    e = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                  "dst": pa.array([1, 2, 3], pa.int64())})
    t = edge_cut_report(e, n_parts=8)
    assert t.column("n_cut")[0].as_py() == 0
    assert t.column("cut_ratio")[0].as_py() == 0.0
    # n_parts=1: nothing can cut
    e2 = pa.table({"src": pa.array([1, 2], pa.int64()),
                   "dst": pa.array([9, 8], pa.int64())})
    assert edge_cut_report(e2, n_parts=1).column(
        "n_cut")[0].as_py() == 0
    # null endpoints excluded
    e3 = pa.table({"src": pa.array([1, None], pa.int64()),
                   "dst": pa.array([2, 3], pa.int64())})
    assert edge_cut_report(e3, n_parts=4).column(
        "n_edges")[0].as_py() == 1


# --- fd_violations ---------------------------------------------------------

def test_fd_exact_dependency():
    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "y", "y", "z"],
        "b": ["1", "1", "2", "2", "3"]}))
    t = fd_violations(ds, "a", "b", nb=2)
    assert t.column("violations")[0].as_py() == 0
    assert t.column("confidence")[0].as_py() == 1.0
    assert t.column("n_det")[0].as_py() == 3


def test_fd_violations_counted_and_nulls_grouped():
    ds = rd.from_arrow(pa.table({
        "a": ["x", "x", "x", "y", None, None],
        "b": ["1", "1", "2", "2", "3", "3"]}))
    t = fd_violations(ds, "a", "b", nb=2)
    # x keeps 2 of 3; y keeps 1; null det keeps both its rows
    assert t.column("n")[0].as_py() == 6
    assert t.column("violations")[0].as_py() == 1
    assert t.column("confidence")[0].as_py() == pytest.approx(5 / 6)


# --- s_stem_array ----------------------------------------------------------

def test_s_stem_classic_vectors():
    cases = {
        "ponies": "pony", "flies": "fly", "babies": "baby",
        "does": "does", "goes": "goes", "trees": "trees",
        "please": "please", "dress": "dress", "bus": "bus",
        "cats": "cat", "Dogs": "dog", "miss": "miss",
        "a": "a", "news": "new", "themes": "theme",
        "eies": "eies", "aies": "aies", "s": "", "es": "e",
    }
    got = s_stem_array(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_s_stem_nulls_pass():
    assert s_stem_array(pa.array(["cats", None])).to_pylist() == \
        ["cat", None]


# --- mmr_select ------------------------------------------------------------

def _cluster_vecs():
    # two tight clusters: A near e1, B near e2 (slightly less relevant)
    rng = np.random.default_rng(3)
    rows = []
    for i in range(8):   # cluster A
        v = np.array([1.0, 0.05, 0.0]) + rng.normal(0, 0.01, 3)
        rows.append((i, v))
    for i in range(8, 16):  # cluster B
        v = np.array([0.7, 0.7, 0.0]) + rng.normal(0, 0.01, 3)
        rows.append((i, v))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [(r[1] / np.linalg.norm(r[1])).astype(
                np.float32).tolist() for r in rows],
            pa.list_(pa.float32()))}))


def test_mmr_diversifies_across_clusters():
    vecs = _cluster_vecs()
    q = np.array([1.0, 0.0, 0.0], np.float32)
    got = mmr_select(vecs, q, k=4, lam=0.3, pool=16).to_pandas()
    picked = set(got["vec_id"])
    # pure relevance would pick 4 from cluster A; with redundancy
    # weighted 0.7, rank 2 must jump to the far cluster
    assert any(i >= 8 for i in picked)
    assert any(i < 8 for i in picked)
    assert got.iloc[1]["vec_id"] >= 8
    # rank 1 is still the most relevant vector overall
    assert got.iloc[0]["vec_id"] < 8


def test_mmr_lambda_one_is_pure_topk():
    vecs = _cluster_vecs()
    q = np.array([1.0, 0.0, 0.0], np.float32)
    got = mmr_select(vecs, q, k=4, lam=1.0, pool=16).to_pandas()
    # lam=1 ignores redundancy -> the 4 most query-similar (cluster A)
    assert all(i < 8 for i in got["vec_id"])
    # relevance non-increasing with rank
    rel = got["relevance"].to_numpy()
    assert np.all(np.diff(rel) <= 1e-12)


def test_mmr_validation_and_determinism():
    vecs = _cluster_vecs()
    q = np.array([1.0, 0.0, 0.0], np.float32)
    with pytest.raises(ValueError):
        mmr_select(vecs, q, pool=0)
    with pytest.raises(ValueError):
        mmr_select(vecs, q, lam=1.5)
    a = mmr_select(vecs, q, k=5, lam=0.6, pool=16)
    b = mmr_select(vecs, q, k=5, lam=0.6, pool=16)
    assert a.equals(b)
