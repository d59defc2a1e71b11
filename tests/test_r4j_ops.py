"""Thirteenth-sitting wave 2: KS test, grouped jackknife, pairwise
KMV overlap, CUSUM change detection, Jensen-Shannon divergence."""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.sketches import (
    jackknife_mean, kmv_pairwise, ks_test)
from biosd_feature_annotator_ray.stages.textstats import js_divergence
from biosd_feature_annotator_ray.stages.windows import cusum_per_key


# --- ks_test ---------------------------------------------------------------

def _ks_ref(xa, xb):
    vs = sorted(set(xa) | set(xb))
    na, nb = len(xa), len(xb)
    d = 0.0
    for v in vs:
        fa = sum(1 for x in xa if x <= v) / na
        fb = sum(1 for x in xb if x <= v) / nb
        d = max(d, abs(fa - fb))
    return d


def test_ks_matches_reference_fuzz():
    rng = random.Random(41)
    for trial in range(4):
        xa = [round(rng.gauss(0, 1), 2) for _ in range(150)]
        xb = [round(rng.gauss(0.5, 1.5), 2) for _ in range(130)]
        ds = rd.from_arrow(pa.table({
            "g": ["a"] * 150 + ["b"] * 130, "x": xa + xb}))
        got = ks_test(ds, "g", "x", "a", "b")
        assert got.column("d_stat")[0].as_py() == pytest.approx(
            _ks_ref(xa, xb), abs=1e-6), trial


def test_ks_identical_and_disjoint():
    same = list(np.linspace(0, 1, 50))
    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 50 + ["b"] * 50, "x": same + same}))
    assert ks_test(ds, "g", "x", "a", "b").column(
        "d_stat")[0].as_py() == 0.0
    ds2 = rd.from_arrow(pa.table({
        "g": ["a"] * 10 + ["b"] * 10,
        "x": [float(i) for i in range(10)]
             + [float(i + 100) for i in range(10)]}))
    assert ks_test(ds2, "g", "x", "a", "b").column(
        "d_stat")[0].as_py() == 1.0


def test_ks_empty_group_and_nulls():
    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "b"], "x": [1.0, 2.0, None]}))
    got = ks_test(ds, "g", "x", "a", "b")
    assert got.column("n_b")[0].as_py() == 0
    assert got.column("d_stat")[0].as_py() is None
    with pytest.raises(ValueError):
        ks_test(rd.from_arrow(pa.table({
            "g": ["a", "b"] * 50,
            "x": [float(i) for i in range(100)]})),
            "g", "x", "a", "b", max_distinct=10)


# --- jackknife_mean --------------------------------------------------------

def test_jackknife_covers_truth_and_matches_reference():
    rng = random.Random(5)
    n = 2000
    xs = [rng.gauss(100.0, 15.0) for _ in range(n)]
    ds = rd.from_arrow(pa.table({
        "i": pa.array(range(n), pa.int64()), "x": xs}))
    got = jackknife_mean(ds, "i", "x", n_groups=10)
    mean = got.column("mean")[0].as_py()
    se = got.column("se")[0].as_py()
    assert mean == pytest.approx(sum(xs) / n, abs=1e-4)
    # jackknife se should be close to the analytic se of the mean
    sd = np.std(xs, ddof=1)
    assert se == pytest.approx(sd / math.sqrt(n), rel=0.5)
    assert got.column("ci_lo")[0].as_py() < mean < \
        got.column("ci_hi")[0].as_py()


def test_jackknife_degenerate():
    # fewer rows than groups -> some group empty -> se null
    ds = rd.from_arrow(pa.table({
        "i": pa.array(range(5), pa.int64()),
        "x": [1.0, 2.0, 3.0, 4.0, 5.0]}))
    got = jackknife_mean(ds, "i", "x", n_groups=50)
    assert got.column("mean")[0].as_py() == pytest.approx(3.0)
    assert got.column("se")[0].as_py() is None
    with pytest.raises(ValueError):
        jackknife_mean(ds, "i", "x", n_groups=1)


# --- kmv_pairwise ----------------------------------------------------------

def test_kmv_pairwise_exact_below_k_all_pairs():
    # three groups with known overlaps, all below k -> exact numbers
    items = {"a": range(0, 30), "b": range(20, 50), "c": range(100, 110)}
    gs, vs = [], []
    for g, r in items.items():
        for i in r:
            gs.append(g)
            vs.append(f"i{i}")
    got = kmv_pairwise(rd.from_arrow(pa.table({"g": gs, "i": vs})),
                       "g", "i", k=256).to_pandas()
    got = got.set_index(["g_a", "g_b"])
    ab = got.loc[("a", "b")]
    assert ab["est_union"] == 50.0 and ab["est_jaccard"] == \
        pytest.approx(10 / 50)
    ac = got.loc[("a", "c")]
    assert ac["est_union"] == 40.0 and ac["est_jaccard"] == 0.0
    assert len(got) == 3  # 3 unordered pairs


def test_kmv_pairwise_group_cap():
    gs = [f"g{i}" for i in range(10) for _ in range(3)]
    vs = [f"x{i}" for i in range(30)]
    with pytest.raises(ValueError):
        kmv_pairwise(rd.from_arrow(pa.table({"g": gs, "i": vs})),
                     "g", "i", k=8, max_groups=5)


# --- cusum_per_key ---------------------------------------------------------

def _cusum_ref(xs, target):
    s, out = 0.0, []
    for x in xs:
        if x is not None:
            s = max(0.0, s + (x - target))
        out.append(s)
    return out


def test_cusum_matches_sequential_reference_fuzz():
    rng = random.Random(59)
    for trial in range(3):
        n = 500
        keys = [rng.randrange(5) for _ in range(n)]
        vals = [None if rng.random() < 0.15
                else round(rng.uniform(-3, 5), 3) for _ in range(n)]
        t = pa.table({
            "user_id": pa.array(keys, pa.int64()),
            "ts": pa.array(range(n), pa.int64()),
            "event_id": pa.array(range(n), pa.int64()),
            "value": pa.array(vals, pa.float64())})
        got = cusum_per_key(rd.from_arrow(t), target=1.0,
                            threshold=4.0, nb=3).to_pandas()
        got = got.sort_values("event_id").reset_index(drop=True)
        df = t.to_pandas()
        for k in range(5):
            sub = df[df.user_id == k]
            ref = _cusum_ref(
                [None if pd.isna(v) else v for v in sub["value"]], 1.0)
            g = got[got.user_id == k]["cusum"].to_numpy()
            assert np.allclose(g, ref, atol=1e-6), (trial, k)
            alarms = got[got.user_id == k]["alarm"].to_numpy()
            assert np.array_equal(alarms, np.array(ref) > 4.0)


def test_cusum_never_negative_and_resets():
    t = pa.table({
        "user_id": [1] * 5, "ts": list(range(5)),
        "event_id": list(range(5)),
        "value": pa.array([10.0, -100.0, 2.0, 3.0, -1.0],
                          pa.float64())})
    got = cusum_per_key(rd.from_arrow(t), target=0.0, threshold=5.0,
                        nb=1).to_pandas().sort_values("event_id")
    assert got["cusum"].tolist() == [10.0, 0.0, 2.0, 5.0, 4.0]
    assert got["alarm"].tolist() == [True, False, False, False, False]


# --- js_divergence ---------------------------------------------------------

def test_jsd_known_values():
    # identical corpora -> 0; disjoint vocab -> ln 2
    ds = rd.from_arrow(pa.table({
        "g": ["a", "b"], "text": ["x y z", "x y z"]}))
    got = js_divergence(ds, "text", "g", "a", "b", nb=2)
    assert got.column("jsd")[0].as_py() == pytest.approx(0.0, abs=1e-9)
    ds2 = rd.from_arrow(pa.table({
        "g": ["a", "b"], "text": ["x y", "p q"]}))
    got2 = js_divergence(ds2, "text", "g", "a", "b", nb=2)
    assert got2.column("jsd")[0].as_py() == pytest.approx(
        math.log(2), abs=1e-6)
    assert got2.column("n_tok_a")[0].as_py() == 2


def test_jsd_empty_corpus_null():
    ds = rd.from_arrow(pa.table({
        "g": ["a"], "text": ["hello world"]}))
    got = js_divergence(ds, "text", "g", "a", "b", nb=2)
    assert got.column("jsd")[0].as_py() is None
    assert got.column("n_tok_b")[0].as_py() == 0


def test_jsd_symmetric_and_bounded():
    rng = random.Random(11)
    words = [f"w{i}" for i in range(40)]
    ta = [" ".join(rng.choices(words[:30], k=20)) for _ in range(20)]
    tb = [" ".join(rng.choices(words[10:], k=20)) for _ in range(20)]
    tbl = pa.table({"g": ["a"] * 20 + ["b"] * 20, "text": ta + tb})
    d1 = js_divergence(rd.from_arrow(tbl), "text", "g", "a", "b",
                       nb=2).column("jsd")[0].as_py()
    d2 = js_divergence(rd.from_arrow(tbl), "text", "g", "b", "a",
                       nb=2).column("jsd")[0].as_py()
    assert d1 == pytest.approx(d2, abs=1e-9)
    assert 0.0 < d1 < math.log(2)
