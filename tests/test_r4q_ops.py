"""Fourteenth-sitting wave 9: temporal reachability."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import (
    temporal_reachability)


def _ref_temporal(edges, seeds, t0):
    """Sequential earliest-arrival fixpoint."""
    arr = {s: t0 for s in seeds}
    changed = True
    while changed:
        changed = False
        for (u, v, t) in edges:
            if u in arr and t >= arr[u] and t < arr.get(v, float("inf")):
                arr[v] = t
                changed = True
    return arr


def test_temporal_reachability_reference_fuzz():
    rng = random.Random(83)
    for _ in range(3):
        edges = [(rng.randrange(12), rng.randrange(12),
                  rng.randrange(20)) for _ in range(60)]
        t = pa.table({
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "ts": pa.array([e[2] for e in edges], pa.int64())})
        got = {r["node"]: r["arrival"] for r in temporal_reachability(
            rd.from_arrow(t).repartition(3), [0, 1], t0=0,
            nb=3).take_all()}
        assert got == _ref_temporal(edges, [0, 1], 0)


def test_temporal_reachability_time_respecting():
    # path 0 -t5-> 1 -t3-> 2: edge to 2 happens BEFORE arrival at 1,
    # so 2 is unreachable; 1 -t7-> 3 is fine
    edges = [(0, 1, 5), (1, 2, 3), (1, 3, 7)]
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "ts": pa.array([e[2] for e in edges], pa.int64())})
    got = {r["node"]: r["arrival"] for r in temporal_reachability(
        rd.from_arrow(t), [0], t0=0, nb=2).take_all()}
    assert got == {0: 0, 1: 5, 3: 7}
    # later-found earlier path improves an already-labeled node:
    # 0 -t1-> 4 -t2-> 1 gives arrival(1)=2 < 5
    edges2 = edges + [(0, 4, 1), (4, 1, 2), (1, 2, 3)]
    t2 = pa.table({
        "src": pa.array([e[0] for e in edges2], pa.int64()),
        "dst": pa.array([e[1] for e in edges2], pa.int64()),
        "ts": pa.array([e[2] for e in edges2], pa.int64())})
    got2 = {r["node"]: r["arrival"] for r in temporal_reachability(
        rd.from_arrow(t2), [0], t0=0, nb=2).take_all()}
    # arrival(1)=2 now unlocks edge (1,2,3)
    assert got2 == {0: 0, 1: 2, 3: 7, 4: 1, 2: 3}


def test_temporal_reachability_t0_and_nulls():
    edges = [(0, 1, 5), (0, 2, 50)]
    t = pa.table({
        "src": pa.array([0, 0, None], pa.int64()),
        "dst": pa.array([1, 2, 9], pa.int64()),
        "ts": pa.array([5, 50, 1], pa.int64())})
    got = {r["node"]: r["arrival"] for r in temporal_reachability(
        rd.from_arrow(t), [0], t0=10, nb=2).take_all()}
    # t0=10: the t=5 edge already happened; null src edge ignored
    assert got == {0: 10, 2: 50}
