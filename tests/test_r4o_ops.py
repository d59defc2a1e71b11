"""Thirteenth-sitting wave 7: node2vec biased walks and PageRank
warm start."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import (
    node2vec_walks, pagerank)


def _md5u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _walk_reference(edges, walk_len, wr, wc, wf, seed, walks=1):
    """Sequential node2vec reference replaying the engine's draws."""
    adj = {}
    eset = set(edges)
    for s, d in sorted(eset):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in sorted(adj):
        for r in range(walks):
            rows.append((start, r, 0, start))
            node, prev = start, None
            for t in range(1, walk_len + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                if t == 1:
                    ch = _md5u32(f"{node}:{r}:1:{seed}") % len(nbrs)
                    nxt = nbrs[ch]
                else:
                    w = [wr if c == prev else
                         (wc if (prev, c) in eset else wf)
                         for c in nbrs]
                    tot = sum(w)
                    if tot == 0:
                        break
                    draw = _md5u32(
                        f"{node}:{prev}:{r}:{t}:{seed}") % tot
                    cum, nxt = 0, None
                    for c, wi in zip(nbrs, w):
                        cum += wi
                        if draw < cum:
                            nxt = c
                            break
                rows.append((start, r, t, nxt))
                prev, node = node, nxt
    return set(rows)


@pytest.mark.parametrize("wr,wc,wf", [(1, 1, 1), (4, 2, 1),
                                      (0, 3, 1), (5, 0, 0)])
def test_node2vec_matches_sequential_reference(wr, wc, wf):
    rng = random.Random(41)
    edges = list({(rng.randrange(15), rng.randrange(15))
                  for _ in range(70)})
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})
    got = {(r["start"], r["walk"], r["step"], r["node"])
           for r in node2vec_walks(
               rd.from_arrow(t).repartition(4), walk_len=3,
               w_return=wr, w_common=wc, w_far=wf, seed=7,
               nb=4).take_all()}
    assert got == _walk_reference(edges, 3, wr, wc, wf, 7)


def test_node2vec_two_walks_and_validation():
    edges = [(1, 2), (2, 1), (2, 3), (3, 1)]
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})
    got = {(r["start"], r["walk"], r["step"], r["node"])
           for r in node2vec_walks(
               rd.from_arrow(t), walk_len=2, walks_per_node=2,
               w_return=2, w_common=1, w_far=1, nb=2).take_all()}
    assert got == _walk_reference(edges, 2, 2, 1, 1, 7, walks=2)
    with pytest.raises(ValueError, match="int >= 0"):
        node2vec_walks(rd.from_arrow(t), w_return=-1)
    with pytest.raises(ValueError, match="all weights"):
        node2vec_walks(rd.from_arrow(t), w_return=0, w_common=0,
                       w_far=0)


def _star_edges():
    # hub 0 -> 1..4, each leaf -> hub
    e = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    return pa.table({
        "src": pa.array([x[0] for x in e], pa.int64()),
        "dst": pa.array([x[1] for x in e], pa.int64())})


def test_pagerank_warm_start_uniform_equals_cold():
    t = _star_edges()
    cold = {r["node"]: r["rank"] for r in pagerank(
        rd.from_arrow(t), iters=3, nb=4).take_all()}
    init = rd.from_arrow(pa.table({
        "node": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "rank": pa.array([0.2] * 5)}))
    warm = {r["node"]: r["rank"] for r in pagerank(
        rd.from_arrow(t), iters=3, nb=4,
        init_ranks=init).take_all()}
    for k in cold:
        assert warm[int(k)] == pytest.approx(cold[k], abs=1e-12)


def test_pagerank_warm_start_renormalizes_and_fills_newcomers():
    t = _star_edges()
    # init covers only nodes 0 and 1, unnormalized mass
    init = rd.from_arrow(pa.table({
        "node": pa.array([0, 1], pa.int64()),
        "rank": pa.array([3.0, 1.0])}))
    got = {int(r["node"]): r["rank"] for r in pagerank(
        rd.from_arrow(t), iters=1, nb=4,
        init_ranks=init).take_all()}
    # manual: r0 = normalize([3, 1, .2, .2, .2]) ; one iteration
    r0 = np.array([3.0, 1.0, 0.2, 0.2, 0.2])
    r0 /= r0.sum()
    d, n = 0.85, 5
    msum = {0: r0[1] / 1 + r0[2] / 1 + r0[3] / 1 + r0[4] / 1}
    for leaf in range(1, 5):
        msum[leaf] = r0[0] / 4
    emitted = sum(msum.values())
    base = (1 - d) / n + d * (1 - emitted) / n
    for node in range(5):
        assert got[node] == pytest.approx(
            base + d * msum[node], abs=1e-12)


def test_pagerank_warm_start_negative_raises():
    t = _star_edges()
    init = rd.from_arrow(pa.table({
        "node": pa.array([0], pa.int64()),
        "rank": pa.array([-1.0])}))
    with pytest.raises(Exception, match="negative init_ranks"):
        pagerank(rd.from_arrow(t), iters=1, nb=2,
                 init_ranks=init).take_all()


# --- read_pages_evolved -----------------------------------------------------

def _write(tmp, name, table):
    import pyarrow.parquet as pq

    p = tmp / name
    pq.write_table(table, str(p))
    return str(p)


def test_read_pages_evolved_union_fill_and_widen(tmp_path):
    a = pa.table({"url": pa.array(["a1", "a2"]),
                  "n": pa.array([1, 2], pa.int32())})
    b = pa.table({"url": pa.array(["b1"]),
                  "n": pa.array([3], pa.int64()),
                  "lang": pa.array(["en"])})
    c = pa.table({"url": pa.array(["c1"])})
    for name, t in (("a.parquet", a), ("b.parquet", b),
                    ("c.parquet", c)):
        _write(tmp_path, name, t)
    from biosd_feature_annotator_ray.sources.pages import (
        read_pages_evolved)

    ds = read_pages_evolved(str(tmp_path))
    assert ds.schema().names == ["url", "n", "lang"]
    rows = sorted(ds.take_all(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == ["a1", "a2", "b1", "c1"]
    assert [r["n"] for r in rows] == [1, 2, 3, None]
    assert [r["lang"] for r in rows] == [None, None, "en", None]
    # int32 widened to int64
    t = ds.materialize().take_batch(4, batch_format="pyarrow")
    assert t.schema.field("n").type == pa.int64()
    # column pruning
    ds2 = read_pages_evolved(str(tmp_path), columns=["url", "lang"])
    assert ds2.schema().names == ["url", "lang"]
    assert ds2.count() == 4


def test_read_pages_evolved_type_conflict(tmp_path):
    _write(tmp_path, "a.parquet",
           pa.table({"v": pa.array([1], pa.int64())}))
    _write(tmp_path, "b.parquet", pa.table({"v": pa.array(["x"])}))
    from biosd_feature_annotator_ray.sources.pages import (
        read_pages_evolved)

    with pytest.raises(ValueError, match="incompatible"):
        read_pages_evolved(str(tmp_path))
    rows = sorted(
        read_pages_evolved(str(tmp_path),
                           strict_types=False).take_all(),
        key=lambda r: r["v"])
    assert [r["v"] for r in rows] == ["1", "x"]
    # int + float reconciles numerically even under strict
    (tmp_path / "b.parquet").unlink()
    _write(tmp_path, "c.parquet",
           pa.table({"v": pa.array([2.5], pa.float64())}))
    vals = sorted(r["v"] for r in
                  read_pages_evolved(str(tmp_path)).take_all())
    assert vals == [1.0, 2.5]


def test_read_pages_evolved_empty_raises(tmp_path):
    from biosd_feature_annotator_ray.sources.pages import (
        read_pages_evolved)

    with pytest.raises(ValueError, match="no parquet files"):
        read_pages_evolved(str(tmp_path))
