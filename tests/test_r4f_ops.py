"""Tenth-sitting operators: Jones-Plassmann greedy coloring, seeded
label spreading, VoID KG statistics, a-priori frequent itemsets,
DSIR importance selection."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# ------------------------------------------------------------- coloring


def _greedy_reference(a, b, seed=0):
    adj: dict[int, set[int]] = {}
    for x, y in zip(a, b):
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    pri = {v: (int(hashlib.md5(f"{v}:{seed}".encode())
                   .hexdigest()[:15], 16), v) for v in adj}
    color: dict[int, int] = {}
    for v in sorted(adj, key=lambda v: pri[v]):
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def test_coloring_equals_sequential_greedy():
    from biosd_feature_annotator_ray.stages.graph import greedy_coloring

    for seedv in (7, 11):
        rng = np.random.default_rng(seedv)
        a = rng.integers(0, 40, 130).tolist()
        b = rng.integers(0, 40, 130).tolist()
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
        out = greedy_coloring(rd.from_arrow(t).repartition(3),
                              nb=4).to_pandas()
        got = dict(zip(out["node"], out["color"]))
        assert got == _greedy_reference(a, b)
        # proper coloring
        for x, y in zip(a, b):
            if x != y:
                assert got[x] != got[y]


def test_coloring_star_and_chain():
    from biosd_feature_annotator_ray.stages.graph import greedy_coloring

    # star: center conflicts with every leaf -> 2 colors total
    star = pa.table({"a": pa.array([0] * 6, pa.int64()),
                     "b": pa.array(range(1, 7), pa.int64())})
    out = greedy_coloring(star, nb=2).to_pandas()
    got = dict(zip(out["node"], out["color"]))
    assert len({got[leaf] for leaf in range(1, 7)}) == 1
    assert got[0] != got[1]
    assert out["color"].max() == 1
    # chain needs exactly 2 colors, alternating
    chain = pa.table({"a": pa.array(range(9), pa.int64()),
                      "b": pa.array(range(1, 10), pa.int64())})
    out = greedy_coloring(chain, nb=2).to_pandas()
    got = dict(zip(out["node"], out["color"]))
    assert out["color"].max() <= 2  # greedy bound: color(v) <= deg(v)
    for i in range(9):
        assert got[i] != got[i + 1]


def test_coloring_self_loops_and_empty():
    from biosd_feature_annotator_ray.stages.graph import greedy_coloring

    t = pa.table({"a": pa.array([5, 1], pa.int64()),
                  "b": pa.array([5, 2], pa.int64())})
    out = greedy_coloring(t, nb=2).to_pandas()
    assert set(out["node"]) == {1, 2}  # pure-self-loop node drops
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    ds = greedy_coloring(empty, nb=2)
    assert ds.count() == 0
    assert ds.schema().names == ["node", "color", "color_round"]
