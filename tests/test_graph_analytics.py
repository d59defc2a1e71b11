"""Iterative graph analytics: transitive closure, BFS min-depth,
triangle counting — brute-force parity on small graphs."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _edges(pairs, cols):
    return rd.from_arrow(pa.table({
        cols[0]: pa.array([p[0] for p in pairs], pa.int64()),
        cols[1]: pa.array([p[1] for p in pairs], pa.int64()),
    }))


def _brute_closure(pairs):
    parents = {}
    for c, p in pairs:
        parents.setdefault(c, set()).add(p)
    out = set()
    for n in parents:
        stack, seen = list(parents[n]), set()
        while stack:
            a = stack.pop()
            if a in seen:
                continue
            seen.add(a)
            stack += list(parents.get(a, ()))
        out |= {(n, a) for a in seen}
    return out


def test_transitive_closure_multipath_dag(ray_session):
    from biosd_feature_annotator_ray.stages.graph import transitive_closure

    # diamond (1→2→4, 1→3→4 reversed as child→parent) + a chain + an
    # isolated edge; 4 reaches 1 via TWO paths — the anti-join must
    # keep the pair once
    pairs = [(4, 2), (4, 3), (2, 1), (3, 1), (7, 4), (9, 8)]
    out = transitive_closure(_edges(pairs, ["child", "parent"]), nb=4)
    got = {(int(r.node), int(r.anc)) for r in out.to_pandas().itertuples()}
    assert got == _brute_closure(pairs)


def test_transitive_closure_random_dag_vs_brute(ray_session):
    from biosd_feature_annotator_ray.stages.graph import transitive_closure

    rng = np.random.default_rng(7)
    # random DAG: edges only from higher to lower ids (child → parent)
    pairs = set()
    for _ in range(120):
        c = int(rng.integers(1, 60))
        p = int(rng.integers(0, c))
        pairs.add((c, p))
    pairs = sorted(pairs)
    out = transitive_closure(_edges(pairs, ["child", "parent"]), nb=4)
    got = {(int(r.node), int(r.anc)) for r in out.to_pandas().itertuples()}
    assert got == _brute_closure(pairs)


def test_transitive_closure_cycle_raises(ray_session):
    from biosd_feature_annotator_ray.stages.graph import transitive_closure

    with pytest.raises(ValueError, match="cycle"):
        transitive_closure(
            _edges([(1, 2), (2, 3), (3, 1)], ["child", "parent"]),
            nb=4).to_pandas()


def _brute_bfs(pairs, seeds):
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    k = 0
    while frontier:
        k += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = k
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_min_depth_vs_brute_with_cycles(ray_session):
    from biosd_feature_annotator_ray.stages.graph import bfs_min_depth

    rng = np.random.default_rng(11)
    pairs = sorted({(int(rng.integers(0, 40)), int(rng.integers(0, 40)))
                    for _ in range(100)})  # cycles + self loops allowed
    seeds = [0, 1]
    out = bfs_min_depth(_edges(pairs, ["src", "dst"]), seeds=seeds, nb=4)
    got = {int(r.node): int(r.dist) for r in out.to_pandas().itertuples()}
    assert got == _brute_bfs(pairs, seeds)


def test_bfs_unreachable_absent(ray_session):
    from biosd_feature_annotator_ray.stages.graph import bfs_min_depth

    out = bfs_min_depth(_edges([(1, 2), (5, 6)], ["src", "dst"]),
                        seeds=[1], nb=4).to_pandas()
    got = {int(r.node): int(r.dist) for r in out.itertuples()}
    assert got == {1: 0, 2: 1}


def _brute_triangles(pairs):
    es = {frozenset(p) for p in pairs}
    nodes = sorted({x for p in pairs for x in p})
    return sum(1 for a, b, c in itertools.combinations(nodes, 3)
               if {frozenset((a, b)), frozenset((b, c)),
                   frozenset((a, c))} <= es)


def test_triangle_count_known_and_random(ray_session):
    from biosd_feature_annotator_ray.stages.graph import triangle_count

    # K4 has exactly 4 triangles; pendant edge adds none
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 9)]
    assert triangle_count(_edges(k4, ["a", "b"]), nb=4) == 4

    rng = np.random.default_rng(13)
    pairs = sorted({(int(u), int(v)) for u, v in
                    ((min(x, y), max(x, y)) for x, y in
                     rng.integers(0, 25, (160, 2))) if u != v})
    want = _brute_triangles(pairs)
    e = _edges(pairs, ["a", "b"])
    assert triangle_count(e, nb=4, orient="degree") == want
    assert triangle_count(e, nb=4, orient="value") == want


def test_entity_cooccurrence_counts(ray_session):
    from biosd_feature_annotator_ray.stages.graph import entity_cooccurrence

    def trip(subj, obj, kind="uri"):
        return {"subj": subj, "obj": obj, "obj_kind": kind}

    rows = [
        trip("p1", "U:a"), trip("p1", "U:b"), trip("p1", "U:b"),  # dup link
        trip("p1", "42", "number"),                               # ignored
        trip("p2", "U:a"), trip("p2", "U:b"), trip("p2", "U:c"),
        trip("p3", "U:a"),                                        # single
    ]
    t = pa.table({
        "subj": pa.array([r["subj"] for r in rows]),
        "obj": pa.array([r["obj"] for r in rows]),
        "obj_kind": pa.array([r["obj_kind"] for r in rows])})
    out = (entity_cooccurrence(rd.from_arrow(t), nb=4).to_pandas()
           .set_index(["uri_a", "uri_b"])["n_subjects"].to_dict())
    assert out == {("U:a", "U:b"): 2, ("U:a", "U:c"): 1, ("U:b", "U:c"): 1}

    filtered = (entity_cooccurrence(rd.from_arrow(t), min_count=2, nb=4)
                .to_pandas())
    assert len(filtered) == 1 and filtered.iloc[0]["n_subjects"] == 2


def test_transitive_closure_checkpoint_resume(ray_session, tmp_path):
    import os
    import shutil

    from biosd_feature_annotator_ray.stages.graph import transitive_closure

    rng = np.random.default_rng(19)
    pairs = sorted({(int(c), int(rng.integers(0, c)))
                    for c in rng.integers(1, 50, 80)})
    ck = str(tmp_path / "ck")

    def key(ds):
        return {(int(r.node), int(r.anc)) for r in ds.to_pandas().itertuples()}

    plain = key(transitive_closure(_edges(pairs, ["child", "parent"]), nb=4))
    first = key(transitive_closure(_edges(pairs, ["child", "parent"]),
                                   nb=4, checkpoint_dir=ck))
    assert first == plain
    markers = sorted(f for f in os.listdir(ck) if f.startswith("_DELTA"))
    assert len(markers) >= 2

    # full resume: every round replays from disk, result identical
    resumed = key(transitive_closure(_edges(pairs, ["child", "parent"]),
                                     nb=4, checkpoint_dir=ck))
    assert resumed == plain

    # partial resume: drop the LAST completed round's marker + data —
    # only that round recomputes, output still identical
    last = len(markers) - 1
    os.remove(os.path.join(ck, f"_DELTA_{last}_DONE"))
    shutil.rmtree(os.path.join(ck, f"delta-{last:04d}"), ignore_errors=True)
    partial = key(transitive_closure(_edges(pairs, ["child", "parent"]),
                                     nb=4, checkpoint_dir=ck))
    assert partial == plain


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    import glob
    import os

    import pytest

    from biosd_feature_annotator_ray.stages.graph import pagerank

    e = rd.from_arrow(pa.table({
        "src": pa.array(["a", "b", "c", "c", "d"]),
        "dst": pa.array(["b", "c", "a", "d", "a"])}))
    ck = str(tmp_path / "pr")
    plain6 = (pagerank(e, iters=6).to_pandas()
              .sort_values("node").reset_index(drop=True))
    # run 4 iterations, then EXTEND the same checkpoint to 6 — the
    # last two iterations compute on top of the stored state
    pagerank(e, iters=4, checkpoint_dir=ck).to_pandas()
    assert os.path.exists(os.path.join(ck, "_RANKS_3_DONE"))
    extended = (pagerank(e, iters=6, checkpoint_dir=ck).to_pandas()
                .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain6, extended)
    # superseded snapshots are pruned: exactly one data dir remains
    assert len(glob.glob(os.path.join(ck, "ranks-*"))) == 1
    # a SHALLOWER request against a deeper checkpoint must refuse
    with pytest.raises(ValueError, match="fresh checkpoint_dir"):
        pagerank(e, iters=2, checkpoint_dir=ck)


def test_bfs_checkpoint_resume(ray_session, tmp_path):
    import os
    import shutil

    from biosd_feature_annotator_ray.stages.graph import bfs_min_depth

    rng = np.random.default_rng(23)
    pairs = sorted({(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
                    for _ in range(70)})
    ck = str(tmp_path / "bfs")

    def key(ds):
        return {int(r.node): int(r.dist)
                for r in ds.to_pandas().itertuples()}

    plain = key(bfs_min_depth(_edges(pairs, ["src", "dst"]), seeds=[0],
                              nb=4))
    first = key(bfs_min_depth(_edges(pairs, ["src", "dst"]), seeds=[0],
                              nb=4, checkpoint_dir=ck))
    assert first == plain
    markers = sorted(f for f in os.listdir(ck) if f.startswith("_FRONTIER"))
    assert len(markers) >= 2
    # full resume + drop-last-round partial resume
    assert key(bfs_min_depth(_edges(pairs, ["src", "dst"]), seeds=[0],
                             nb=4, checkpoint_dir=ck)) == plain
    last = len(markers) - 1
    os.remove(os.path.join(ck, f"_FRONTIER_{last}_DONE"))
    shutil.rmtree(os.path.join(ck, f"frontier-{last:04d}"),
                  ignore_errors=True)
    assert key(bfs_min_depth(_edges(pairs, ["src", "dst"]), seeds=[0],
                             nb=4, checkpoint_dir=ck)) == plain


class TestHits:
    def test_matches_numpy_reference(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from biosd_feature_annotator_ray.stages.graph import hits

        E = [("n1", "n2"), ("n1", "n3"), ("n2", "n3"), ("n4", "n1")]
        t = pa.table({"src": [s for s, _ in E], "dst": [d for _, d in E]})
        got = {r["node"]: (r["hub"], r["authority"])
               for r in hits(rd.from_arrow(t).repartition(2), iters=3)
               .to_pandas().to_dict("records")}

        names = ["n1", "n2", "n3", "n4"]
        idx = {n: i for i, n in enumerate(names)}
        h = np.full(4, 0.25)
        a = np.zeros(4)
        for _ in range(3):
            a = np.zeros(4)
            for s, d in E:
                a[idx[d]] += h[idx[s]]
            a /= a.sum()
            h = np.zeros(4)
            for s, d in E:
                h[idx[s]] += a[idx[d]]
            h /= h.sum()
        for n in names:
            assert got[n] == (round(h[idx[n]], 8), round(a[idx[n]], 8))

    def test_empty_graph(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from biosd_feature_annotator_ray.stages.graph import hits

        t = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
        assert hits(rd.from_arrow(t)).count() == 0

    def test_multi_edge_carries_multiplicity(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from biosd_feature_annotator_ray.stages.graph import hits

        t = pa.table({"src": ["a", "a", "b"], "dst": ["c", "c", "c"]})
        got = {r["node"]: r["authority"]
               for r in hits(rd.from_arrow(t), iters=1)
               .to_pandas().to_dict("records")}
        assert got["c"] == 1.0 and got["a"] == 0.0


class TestCanonicalizeEntities:
    def _run(self, rows, **kw):
        import pyarrow as pa
        import ray.data as rd

        from biosd_feature_annotator_ray.stages.graph import (
            canonicalize_entities,
        )

        t = pa.table({"subj": [r[0] for r in rows],
                      "pred": [r[1] for r in rows],
                      "obj": [r[2] for r in rows]})
        out = canonicalize_entities(
            rd.from_arrow(t).repartition(2), nb=4, **kw)
        return sorted(map(tuple, out.to_pandas().itertuples(index=False)))

    def test_chain_collapses_and_dedups(self, ray_session):
        got = self._run([
            ("B", "sameAs", "A"), ("C", "sameAs", "B"),
            ("C", "name", "n1"), ("B", "name", "n1"), ("A", "age", "5"),
            ("X", "knows", "C"), ("Y", "knows", "Z"),
        ])
        assert got == [("A", "age", "5"), ("A", "name", "n1"),
                       ("X", "knows", "A"), ("Y", "knows", "Z")]

    def test_sameas_cycle(self, ray_session):
        got = self._run([
            ("A", "sameAs", "B"), ("B", "sameAs", "A"),
            ("B", "p", "v"),
        ])
        assert got == [("A", "p", "v")]

    def test_long_chain_converges(self, ray_session):
        rows = [(f"n{i + 1:02d}", "sameAs", f"n{i:02d}")
                for i in range(12)]
        rows.append(("n12", "fact", "x"))
        got = self._run(rows)
        assert got == [("n00", "fact", "x")]

    def test_no_aliases_passthrough(self, ray_session):
        rows = [("A", "p", "B"), ("B", "q", "C")]
        assert self._run(rows) == sorted(rows)


def test_cocitation_and_coupling():
    import pyarrow as pa
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.graph import cocitation

    # citers 10,11,12 → cited {0,1},{0,1,2},{1,2}; dup edge exercised
    rows = [(10, 0), (10, 1), (11, 0), (11, 1), (11, 2), (12, 1),
            (12, 2), (10, 0)]
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"src": a, "dst": b} for a, b in rows]))
    co = cocitation(ds, mode="cocite", nb=4).to_pandas()
    got = {(r.a, r.b): r.common for r in co.itertuples()}
    assert got == {(0, 1): 2, (0, 2): 1, (1, 2): 2}
    # coupling: citers sharing cited pages
    cp = cocitation(ds, mode="couple", nb=4).to_pandas()
    got = {(r.a, r.b): r.common for r in cp.itertuples()}
    assert got == {(10, 11): 2, (10, 12): 1, (11, 12): 2}
    # min_common filter
    cp2 = cocitation(ds, mode="couple", min_common=2,
                     nb=4).to_pandas()
    assert {(r.a, r.b) for r in cp2.itertuples()} == {(10, 11),
                                                      (11, 12)}


def test_zscore_per_key_constant_and_null_groups():
    import pyarrow as pa
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.sketches import (
        zscore_per_key)

    rows = [{"id": 0, "k": "a", "v": 1.0},
            {"id": 1, "k": "a", "v": 3.0},
            {"id": 2, "k": "b", "v": 5.0},
            {"id": 3, "k": "b", "v": 5.0},
            {"id": 4, "k": "a", "v": None}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (zscore_per_key(ds, "k", "v", "id", nb=4).to_pandas()
           .sort_values("id").reset_index(drop=True))
    # group a: mean 2, pop sd 1 → z = ±1; null value → null z
    assert out.z[0] == -1.0 and out.z[1] == 1.0
    # constant group → sd 0 → null z
    assert out.z.isna()[2] and out.z.isna()[3] and out.z.isna()[4]


def test_contract_graph_weights_and_self_loops():
    import pyarrow as pa
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.graph import contract_graph

    edges = rd.from_arrow(pa.Table.from_pylist(
        [{"src": 0, "dst": 1}, {"src": 0, "dst": 2},
         {"src": 1, "dst": 2}, {"src": 2, "dst": 3},
         {"src": 3, "dst": 0}, {"src": 9, "dst": 0}]))  # 9 unlabeled
    labs = rd.from_arrow(pa.Table.from_pylist(
        [{"node": n, "lab": n // 2} for n in range(4)]))
    out = contract_graph(edges, labs, nb=4).to_pandas()
    got = {(r.la, r.lb): r.weight for r in out.itertuples()}
    # 0→2 within lab0; crossing: 0→2(l0→l1), 1→2(l0→l1), 2→3 within
    # lab1, 3→0(l1→l0); unlabeled 9 dropped
    assert got == {(0, 1): 2, (1, 0): 1}
    out2 = contract_graph(edges, labs, self_loops=True,
                          nb=4).to_pandas()
    got2 = {(r.la, r.lb): r.weight for r in out2.itertuples()}
    assert got2 == {(0, 0): 1, (0, 1): 2, (1, 1): 1, (1, 0): 1}


def test_lowest_common_ancestor_tree():
    import pyarrow as pa
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.graph import (
        lowest_common_ancestor)

    edges = rd.from_arrow(pa.Table.from_pylist(
        [{"child": i, "parent": (i - 1) // 2} for i in range(1, 15)]))
    pairs = rd.from_arrow(pa.Table.from_pylist(
        [{"u": 7, "v": 8}, {"u": 7, "v": 9}, {"u": 7, "v": 14},
         {"u": 3, "v": 7}, {"u": 5, "v": 5},
         {"u": 7, "v": 999}]))  # unknown node → no row
    out = (lowest_common_ancestor(edges, pairs, nb=4).to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    got = {(r.u, r.v): (r.anc, r.depth) for r in out.itertuples()}
    assert got == {(7, 8): (3, 2), (7, 9): (1, 1), (7, 14): (0, 0),
                   (3, 7): (3, 2), (5, 5): (5, 2)}
