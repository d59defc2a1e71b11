"""Strongly connected components vs a Kosaraju reference
(r04 seventh sitting)."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import scc


def _ref_scc(edges):
    """Kosaraju reference: order by first-DFS finish on G, then DFS
    on G^T in reverse finish order; component id = min node id."""
    adj: dict = {}
    radj: dict = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        radj.setdefault(b, []).append(a)
        nodes.add(a)
        nodes.add(b)
    seen: set = set()
    order: list = []
    for s in sorted(nodes):
        if s in seen:
            continue
        stack = [(s, iter(adj.get(s, [])))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            nxt = next((w for w in it if w not in seen), None)
            if nxt is None:
                order.append(v)
                stack.pop()
            else:
                seen.add(nxt)
                stack.append((nxt, iter(adj.get(nxt, []))))
    comp: dict = {}
    for s in reversed(order):
        if s in comp:
            continue
        grp = [s]
        comp[s] = None
        while grp:
            v = grp.pop()
            for w in radj.get(v, []):
                if w not in comp:
                    comp[w] = None
                    grp.append(w)
            comp[v] = s
        # second pass: relabel this component by its min node
        members = [v for v, c in comp.items() if c == s]
        m = min(members)
        for v in members:
            comp[v] = ("done", m)
    return {v: c[1] for v, c in comp.items()}


def _run(edges, nb=4, cutoff=200_000):
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"src": a, "dst": b} for a, b in edges])).repartition(2)
    df = scc(ds, nb=nb, local_cutoff_edges=cutoff).to_pandas()
    return dict(zip(df.node, df.scc))


import pytest


# cutoff=0 forces the distributed phases; the default takes the
# bounded local-Tarjan finish — both must match the reference
@pytest.mark.parametrize("cutoff", [200_000, 0])
def test_cycles_chains_and_self_loops(cutoff):
    edges = [(0, 1), (1, 2), (2, 0),          # 3-cycle
             (3, 4), (4, 5), (5, 3), (2, 3),  # 3-cycle fed by first
             (6, 7), (7, 8),                  # chain (trims)
             (9, 10), (10, 9), (8, 9),        # 2-cycle
             (11, 11)]                        # self-loop
    got = _run(edges, cutoff=cutoff)
    assert got == _ref_scc(edges)
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 3
    assert got[6] == 6 and got[7] == 7 and got[8] == 8
    assert got[9] == got[10] == 9
    assert got[11] == 11


@pytest.mark.parametrize("cutoff", [200_000, 0])
def test_fuzz_vs_kosaraju(cutoff):
    rng = random.Random(23)
    for trial in range(2):
        n = 18
        edges = set()
        for _ in range(50):
            a, b = rng.randrange(n), rng.randrange(n)
            edges.add((a, b))
        edges = sorted(edges)
        assert _run(edges, nb=8, cutoff=cutoff) == _ref_scc(edges), trial


@pytest.mark.parametrize("cutoff", [200_000, 0])
def test_scc_string_ids_both_paths(cutoff):
    edges = [("a", "b"), ("b", "a"), ("b", "c"),
             ("c", "d"), ("d", "c"), ("d", "e")]
    got = _run(edges, cutoff=cutoff)
    assert got == _ref_scc(edges)
    assert got["a"] == got["b"] == "a"
    assert got["c"] == got["d"] == "c"
    assert got["e"] == "e"


def test_empty_raises():
    import pytest

    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                 "dst": pa.array([], pa.int64())}))
    with pytest.raises(ValueError, match="empty"):
        scc(ds)
