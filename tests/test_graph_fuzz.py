"""Randomized-graph DuckDB parity fuzzes for the iterative graph ops
(r04: the oracles pin one fixed derived edge list; these pin random
DAG/digraph/undirected shapes, including disconnected nodes, skewed
fan-out, and empty frontiers)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import (
    bfs_min_depth, transitive_closure, triangle_count)


def _random_dag(rng, n_nodes: int, n_edges: int) -> pd.DataFrame:
    """Random DAG: edges only from lower to higher node id."""
    a = rng.integers(0, n_nodes - 1, n_edges)
    span = rng.integers(1, 4, n_edges)
    b = np.minimum(a + span, n_nodes - 1)
    df = pd.DataFrame({"child": a, "parent": b})
    df = df[df.child != df.parent].drop_duplicates()
    return df.reset_index(drop=True)


def test_closure_fuzz_duckdb(ray_session):
    for seed in range(3):
        rng = np.random.default_rng(4200 + seed)
        edges = _random_dag(rng, 20, 45)
        got = (transitive_closure(rd.from_pandas(edges).repartition(3),
                                  nb=4)
               .to_pandas().sort_values(["node", "anc"])
               .reset_index(drop=True))
        edges_df = edges  # noqa: F841  (duckdb replacement scan)
        want = duckdb.sql("""
            WITH RECURSIVE cl(node, anc) AS (
              SELECT child, parent FROM edges_df
              UNION
              SELECT cl.node, e.parent FROM cl JOIN edges_df e
                ON e.child = cl.anc)
            SELECT DISTINCT node, anc FROM cl ORDER BY node, anc""").df()
        assert got["node"].tolist() == want["node"].tolist(), seed
        assert got["anc"].tolist() == want["anc"].tolist(), seed


def test_bfs_fuzz_duckdb(ray_session):
    for seed in range(3):
        rng = np.random.default_rng(4300 + seed)
        n = 18
        edges = pd.DataFrame({
            "src": rng.integers(0, n, 40),
            "dst": rng.integers(0, n, 40),
        }).drop_duplicates().reset_index(drop=True)
        edges = edges[edges.src != edges.dst].reset_index(drop=True)
        seeds = sorted(rng.choice(n, 2, replace=False).tolist())
        got = (bfs_min_depth(rd.from_pandas(edges).repartition(3),
                             seeds, nb=4)
               .to_pandas().sort_values("node").reset_index(drop=True))
        edges_df = edges  # noqa: F841  (duckdb replacement scan)
        want = duckdb.sql(f"""
            WITH RECURSIVE walk(node, dist) AS (
              SELECT unnest({seeds}), 0
              UNION
              SELECT e.dst, w.dist + 1 FROM walk w JOIN edges_df e
                ON e.src = w.node WHERE w.dist < {n}
            )
            SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk
            GROUP BY node ORDER BY node""").df()
        assert got["node"].tolist() == want["node"].tolist(), seed
        assert got["dist"].tolist() == want["dist"].tolist(), seed


def test_triangle_fuzz_bruteforce(ray_session):
    for seed in range(3):
        rng = np.random.default_rng(4400 + seed)
        n = 14
        a = rng.integers(0, n, 50)
        b = rng.integers(0, n, 50)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        edges = (pd.DataFrame({"a": lo, "b": hi})
                 .query("a != b").drop_duplicates()
                 .reset_index(drop=True))
        got = triangle_count(rd.from_pandas(edges).repartition(3), nb=4)
        es = set(map(tuple, edges.to_numpy()))
        want = sum(1 for x in range(n) for y in range(x + 1, n)
                   for z in range(y + 1, n)
                   if (x, y) in es and (y, z) in es and (x, z) in es)
        assert got == want, seed


def test_closure_cycle_detection_fuzz(ray_session):
    """A random DAG plus one random back edge must raise."""
    rng = np.random.default_rng(4500)
    edges = _random_dag(rng, 12, 25)
    # add a back edge along an existing path: pick any edge and reverse it
    r = edges.iloc[0]
    cyc = pd.concat([edges, pd.DataFrame(
        {"child": [r.parent], "parent": [r.child]})]).reset_index(drop=True)
    with pytest.raises(ValueError, match="cycle"):
        transitive_closure(rd.from_pandas(cyc), nb=4).materialize()
