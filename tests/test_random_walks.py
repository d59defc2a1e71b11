"""Seeded deterministic random walks (r04 seventh sitting)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import random_walks


def _ring(n=20):
    rows = []
    for i in range(n):
        for d in ((i + 1) % n, (i + 3) % n):
            rows.append({"src": i, "dst": d})
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


def test_walks_follow_edges_and_are_deterministic():
    a = random_walks(_ring(), walk_len=3, walks_per_node=2,
                     seed=7, nb=8).to_pandas()
    b = random_walks(_ring(), walk_len=3, walks_per_node=2,
                     seed=7, nb=8).to_pandas()
    key = ["start", "walk", "step"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # every walk is complete (no sinks in the ring) and every step
    # follows a real edge
    assert len(a) == 20 * 2 * 4
    edges = {(i, (i + 1) % 20) for i in range(20)} | {
        (i, (i + 3) % 20) for i in range(20)}
    wide = a.pivot_table(index=["start", "walk"], columns="step",
                         values="node")
    for _ix, row in wide.iterrows():
        for t in range(3):
            assert (row[t], row[t + 1]) in edges


def test_seed_changes_walks():
    a = random_walks(_ring(), walk_len=3, walks_per_node=1,
                     seed=7, nb=8).to_pandas()
    b = random_walks(_ring(), walk_len=3, walks_per_node=1,
                     seed=8, nb=8).to_pandas()
    key = ["start", "walk", "step"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert not a.node.equals(b.node)


def test_sink_stops_walk():
    chain = rd.from_arrow(pa.Table.from_pylist(
        [{"src": 0, "dst": 1}, {"src": 1, "dst": 2}]))
    out = random_walks(chain, walk_len=5, walks_per_node=1,
                       seed=7, nb=4).to_pandas()
    # starts only from nodes with out-edges (0 and 1); node 2 is a
    # sink, so the walk from 0 emits steps 0..2 and stops
    w0 = out[out.start == 0].sort_values("step")
    assert w0.node.tolist() == [0, 1, 2]
    w1 = out[out.start == 1].sort_values("step")
    assert w1.node.tolist() == [1, 2]
