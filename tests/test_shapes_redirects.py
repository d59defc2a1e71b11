"""SHACL-lite shape validation + redirect-chain resolution tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import (
    resolve_redirects,
    validate_shapes,
)


def _kg(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


def _person_corpus():
    rows = []
    for i in range(30):
        rows.append({"subj": f"P{i}", "pred": "@type", "obj": "Person"})
        if i % 5 != 0:
            rows.append({"subj": f"P{i}", "pred": "worksFor",
                         "obj": f"O{i % 4}"})
        if i % 7 == 0:
            rows.append({"subj": f"P{i}", "pred": "worksFor",
                         "obj": f"O{(i + 1) % 4}"})
        rows.append({"subj": f"P{i}", "pred": "name",
                     "obj": (f"bad{i}" if i % 11 == 0 else f"name{i}")})
    for j in range(3):  # O3 untyped
        rows.append({"subj": f"O{j}", "pred": "@type",
                     "obj": "Organization"})
    return rows


def test_shapes_planted_violations(ray_session):
    out = validate_shapes(_kg(_person_corpus()), [
        {"target_class": "Person", "pred": "worksFor", "min_count": 1,
         "max_count": 1, "obj_class": "Organization"},
        {"target_class": "Person", "pred": "name", "min_count": 1,
         "pattern": "^name"},
    ], nb=8).to_pandas()
    by = out.groupby(["shape_id", "constraint"]).size().to_dict()
    # i%5==0 → no primary edge; P0 still has the i%7 extra (n=1, legal)
    assert by[(0, "min_count")] == 5
    assert set(out[(out.shape_id == 0)
                   & (out.constraint == "min_count")].subj) == {
        "P5", "P10", "P15", "P20", "P25"}
    assert by[(0, "max_count")] == 4  # i%7==0 and i%5!=0 → n=2
    assert by[(0, "obj_class")] == 7  # edges landing on untyped O3
    assert by[(1, "pattern")] == 3    # i%11==0 → bad name
    assert (1, "min_count") not in by
    mins = out[out.constraint == "min_count"]
    assert mins.obj.isna().all() and (mins.n == 0).all()


def test_shapes_bag_semantics_duplicate_triples(ray_session):
    rows = [
        {"subj": "P0", "pred": "@type", "obj": "Person"},
        {"subj": "P0", "pred": "name", "obj": "zzz"},
        {"subj": "P0", "pred": "name", "obj": "zzz"},  # exact dup
    ]
    out = validate_shapes(_kg(rows), [
        {"target_class": "Person", "pred": "name", "max_count": 1,
         "pattern": "^name"},
    ], nb=4).to_pandas()
    # duplicate triples violate the pattern TWICE and count n=2
    assert len(out[out.constraint == "pattern"]) == 2
    card = out[out.constraint == "max_count"]
    assert len(card) == 1 and card.iloc[0].n == 2


def test_shapes_non_targets_ignored(ray_session):
    rows = [
        {"subj": "P0", "pred": "@type", "obj": "Person"},
        {"subj": "P0", "pred": "name", "obj": "name0"},
        {"subj": "B0", "pred": "@type", "obj": "Bot"},
        {"subj": "B0", "pred": "name", "obj": "!!!"},  # bot: not checked
        {"subj": "B1", "pred": "name", "obj": "!!!"},  # untyped: ditto
    ]
    out = validate_shapes(_kg(rows), [
        {"target_class": "Person", "pred": "name", "min_count": 1,
         "pattern": "^name"},
    ], nb=4).to_pandas()
    assert len(out) == 0


def test_shapes_obj_kind_constraint(ray_session):
    rows = [
        {"subj": "P0", "pred": "@type", "obj": "Person", "kind": "uri"},
        {"subj": "P0", "pred": "ref", "obj": "http://x", "kind": "uri"},
        {"subj": "P1", "pred": "@type", "obj": "Person", "kind": "uri"},
        {"subj": "P1", "pred": "ref", "obj": "plain", "kind": "string"},
    ]
    out = validate_shapes(_kg(rows), [
        {"target_class": "Person", "pred": "ref", "obj_kind": "uri"},
    ], kind_col="kind", nb=4).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].subj == "P1" and out.iloc[0].constraint == "obj_kind"


def test_shapes_validation_errors(ray_session):
    ds = _kg([{"subj": "a", "pred": "b", "obj": "c"}])
    with pytest.raises(ValueError, match="unknown keys"):
        validate_shapes(ds, [{"target_class": "T", "pred": "p",
                              "bogus": 1}])
    with pytest.raises(ValueError, match="required"):
        validate_shapes(ds, [{"pred": "p"}])
    with pytest.raises(ValueError, match="kind_col"):
        validate_shapes(ds, [{"target_class": "T", "pred": "p",
                              "obj_kind": "uri"}])


def test_shapes_empty_inputs(ray_session):
    ds = _kg([{"subj": "a", "pred": "b", "obj": "c"}])
    assert validate_shapes(ds, []).count() == 0
    out = validate_shapes(ds, [
        {"target_class": "Nope", "pred": "b", "min_count": 1}], nb=4)
    assert out.count() == 0  # no targets → no violations
    # targets but ZERO pred triples → every target violates min_count
    rows = [{"subj": "P0", "pred": "@type", "obj": "Person"},
            {"subj": "P1", "pred": "@type", "obj": "Person"}]
    out2 = validate_shapes(_kg(rows), [
        {"target_class": "Person", "pred": "name", "min_count": 1}],
        nb=4).to_pandas()
    assert set(out2.subj) == {"P0", "P1"}
    assert (out2.constraint == "min_count").all()
    # obj_class with ZERO typed members → every scoped edge violates
    rows3 = rows + [{"subj": "P0", "pred": "knows", "obj": "Q0"}]
    out3 = validate_shapes(_kg(rows3), [
        {"target_class": "Person", "pred": "knows",
         "obj_class": "Ghost"}], nb=4).to_pandas()
    assert len(out3) == 1 and out3.iloc[0].constraint == "obj_class"


def _resolve_df(rows, max_hops, nb=8):
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    return (resolve_redirects(ds, max_hops=max_hops, nb=nb)
            .to_pandas().set_index("src").sort_index())


def test_redirects_chain_cycle_dup(ray_session):
    rows = ([{"src": f"c{i}", "dst": f"c{i + 1}"} for i in range(5)]
            + [{"src": "x0", "dst": "x1"}, {"src": "x1", "dst": "x0"}]
            + [{"src": "r1", "dst": "t1"}, {"src": "r1", "dst": "a0"}])
    df = _resolve_df(rows, max_hops=3)
    assert df.loc["c4"].final == "c5" and df.loc["c4"].hops == 1
    assert df.loc["c2"].final == "c5" and df.loc["c2"].hops == 3
    # c0/c1 need 5/4 hops > 3 → unresolved with null final/hops
    for s in ("c0", "c1", "x0", "x1"):
        r = df.loc[s]
        assert r.status == "unresolved"
        assert r.final is None or r.final != r.final
        assert np.isnan(r.hops)
    assert df.loc["r1"].final == "a0"  # duplicate src → min dst wins


def test_redirects_max_hops_exact_boundary(ray_session):
    rows = [{"src": f"n{i}", "dst": f"n{i + 1}"} for i in range(7)]
    df = _resolve_df(rows, max_hops=7)
    assert df.loc["n0"].status == "resolved" and df.loc["n0"].hops == 7
    df6 = _resolve_df(rows, max_hops=6)
    assert df6.loc["n0"].status == "unresolved"
    assert df6.loc["n1"].status == "resolved" and df6.loc["n1"].hops == 6


def test_redirects_self_loop_and_empty(ray_session):
    df = _resolve_df([{"src": "s", "dst": "s"}], max_hops=4)
    assert df.loc["s"].status == "unresolved"
    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                 "dst": pa.array([], pa.string())}))
    assert resolve_redirects(ds, max_hops=4, nb=4).count() == 0


def test_redirects_random_duckdb_parity(ray_session):
    import duckdb

    rng = np.random.default_rng(42)
    for trial in range(3):
        n = 40
        srcs = rng.choice(n, size=30, replace=False)
        rows = [{"src": f"v{s}", "dst": f"v{rng.integers(0, n)}"}
                for s in srcs]
        max_hops = int(rng.integers(3, 9))
        got = _resolve_df(rows, max_hops=max_hops).reset_index()
        con = duckdb.connect()
        con.register("e0", pa.Table.from_pylist(rows))
        want = con.sql(f"""
            WITH RECURSIVE e AS (
              SELECT src, min(dst) AS dst FROM e0 GROUP BY src),
            walk(src, cur, hops) AS (
              SELECT src, dst, 1 FROM e
              UNION ALL SELECT w.src, e.dst, w.hops + 1 FROM walk w
                JOIN e ON w.cur = e.src WHERE w.hops < {max_hops + 1}),
            term AS (SELECT src, cur, hops FROM walk
              WHERE hops <= {max_hops}
                AND cur NOT IN (SELECT src FROM e))
            SELECT e.src, term.cur AS final,
              CAST(term.hops AS BIGINT) AS hops,
              CASE WHEN term.src IS NULL THEN 'unresolved'
                ELSE 'resolved' END AS status
            FROM e LEFT JOIN term ON e.src = term.src
            ORDER BY e.src""").df()
        con.close()
        got = got.sort_values("src").reset_index(drop=True)
        want = want.sort_values("src").reset_index(drop=True)
        assert got.src.tolist() == want.src.tolist()
        assert got.status.tolist() == want.status.tolist()
        assert got.final.fillna("∅").tolist() == \
            want.final.fillna("∅").tolist()
        assert got.hops.fillna(-1).tolist() == \
            want.hops.fillna(-1).tolist(), f"trial {trial}"


def test_clustering_coefficient_known_graphs(ray_session):
    import itertools

    from biosd_feature_annotator_ray.stages.graph import (
        clustering_coefficient,
    )

    ed = (list(itertools.combinations(range(4), 2))  # K4
          + [(10, 11), (11, 12), (20, 21)])          # path + edge
    t = pa.table({"a": [e[0] for e in ed], "b": [e[1] for e in ed]})
    outs = {}
    for orient in ("degree", "value"):
        df = (clustering_coefficient(
            rd.from_arrow(t).repartition(2), nb=8, orient=orient)
            .to_pandas().sort_values("node").reset_index(drop=True))
        outs[orient] = df
        k4 = df[df.node < 4]
        assert (k4.deg == 3).all() and (k4.tri == 3).all() \
            and (k4.cc == 1.0).all()
        assert (df[df.node >= 10].tri == 0).all()
        assert (df[df.node >= 10].cc == 0.0).all()
        assert df.set_index("node").loc[11].deg == 2
    # orientation-invariance
    assert outs["degree"].equals(outs["value"])


def test_clustering_coefficient_random_bruteforce(ray_session):
    from biosd_feature_annotator_ray.stages.graph import (
        clustering_coefficient,
    )

    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) if a < b else (int(b), int(a))
             for a, b in rng.integers(0, 25, size=(80, 2)) if a != b}
    ed = sorted(pairs)
    t = pa.table({"a": [e[0] for e in ed], "b": [e[1] for e in ed]})
    got = (clustering_coefficient(rd.from_arrow(t).repartition(3), nb=8)
           .to_pandas().set_index("node").sort_index())
    adj: dict = {}
    for a, b in ed:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nbrs in adj.items():
        tri = sum(1 for x in nbrs for y in nbrs
                  if x < y and y in adj.get(x, ()))
        d = len(nbrs)
        assert got.loc[v].deg == d
        assert got.loc[v].tri == tri, f"node {v}"
        want_cc = 0.0 if d < 2 else 2.0 * tri / (d * (d - 1))
        assert abs(got.loc[v].cc - want_cc) < 1e-12
    assert set(got.index) == set(adj)


def _peel_ref(edges, k):
    """Brute-force k-core reference."""
    es = set(edges)
    while True:
        deg: dict = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {v for v, d in deg.items() if d < k}
        if not bad:
            return deg
        es = {(a, b) for a, b in es if a not in bad and b not in bad}
        if not es:
            return {}


def test_kcore_known_and_bruteforce(ray_session):
    import itertools

    from biosd_feature_annotator_ray.stages.graph import kcore

    # K5 + a 4-node pendant path: k=3 keeps exactly the clique
    ed = (list(itertools.combinations(range(5), 2))
          + [(0, 10), (10, 11), (11, 12)])
    t = pa.table({"a": [e[0] for e in ed], "b": [e[1] for e in ed]})
    df = (kcore(rd.from_arrow(t).repartition(2), k=3, nb=8)
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert df.node.tolist() == [0, 1, 2, 3, 4]
    assert (df.deg == 4).all()
    # k above the max core → empty
    assert kcore(rd.from_arrow(t), k=5, nb=4).count() == 0

    rng = np.random.default_rng(11)
    for k in (2, 3):
        pairs = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                        for a, b in rng.integers(0, 30, size=(90, 2))
                        if a != b})
        tt = pa.table({"a": [e[0] for e in pairs],
                       "b": [e[1] for e in pairs]})
        got = (kcore(rd.from_arrow(tt).repartition(3), k=k, nb=8)
               .to_pandas().set_index("node").deg.to_dict())
        assert got == _peel_ref(pairs, k), f"k={k}"


def test_kcore_validation(ray_session):
    from biosd_feature_annotator_ray.stages.graph import kcore

    t = pa.table({"a": [1], "b": [2]})
    with pytest.raises(ValueError, match="k must be"):
        kcore(rd.from_arrow(t), k=0)
    # k=1 keeps every edge-incident node as-is (no isolated peel)
    df = kcore(rd.from_arrow(t), k=1, nb=4).to_pandas()
    assert sorted(df.node.tolist()) == [1, 2]


def test_cli_validate_and_redirects(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd

    tp = str(tmp_path / "triples.parquet")
    pd.DataFrame(_person_corpus()).to_parquet(tp)
    sp = str(tmp_path / "shapes.json")
    with open(sp, "w") as f:
        json.dump([{"target_class": "Person", "pred": "worksFor",
                    "min_count": 1, "max_count": 1,
                    "obj_class": "Organization"}], f)
    rp = str(tmp_path / "redirects.parquet")
    pd.DataFrame([{"src": f"c{i}", "dst": f"c{i + 1}"}
                  for i in range(5)]).to_parquet(rp)

    def run(*cmd):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray", *cmd,
             "--num-cpus", "2"],
            capture_output=True, text=True, check=True, cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    r = run("validate", "--input", tp, "--shapes", sp,
            "--output", str(tmp_path / "viol"))
    assert r["violations"] == 16  # 5 min + 4 max + 7 obj_class
    cs = {(d["constraint"], d["n"]) for d in r["by_constraint"]}
    assert cs == {("min_count", 5), ("max_count", 4), ("obj_class", 7)}
    n = duckdb.sql(f"SELECT count(*) AS n FROM"
                   f" '{tmp_path}/viol/*.parquet'").df().n[0]
    assert n == 16

    r = run("redirects", "--input", rp, "--output",
            str(tmp_path / "map"), "--max-hops", "3")
    assert r["sources"] == 5
    assert r["resolved"] == 3 and r["unresolved"] == 2
    fin = duckdb.sql(f"SELECT final FROM '{tmp_path}/map/*.parquet'"
                     f" WHERE src = 'c2'").df().final[0]
    assert fin == "c5"


def test_shapes_random_duckdb_parity(ray_session):
    """Randomized SHACL-vs-SQL fuzz: random typed corpora with random
    cardinality/pattern/membership shapes, compared against a DuckDB
    twin computed over the SAME registered table."""
    import duckdb

    rng = np.random.default_rng(99)
    for trial in range(3):
        rows = []
        n_subj = 40
        for i in range(n_subj):
            cls = ["Person", "Bot"][int(rng.integers(0, 2))]
            rows.append({"subj": f"S{i}", "pred": "@type", "obj": cls})
            for _ in range(int(rng.integers(0, 4))):
                rows.append({"subj": f"S{i}", "pred": "rel",
                             "obj": f"T{int(rng.integers(0, 12))}"})
        for t in range(8):  # T0..T7 typed, T8..T11 not
            rows.append({"subj": f"T{t}", "pred": "@type",
                         "obj": "Thing"})
        lo = int(rng.integers(0, 3))
        hi = int(rng.integers(1, 4))
        shape = {"target_class": "Person", "pred": "rel",
                 "min_count": lo, "max_count": hi,
                 "obj_class": "Thing", "pattern": "^T[0-5]$"}
        from biosd_feature_annotator_ray.stages.graph import (
            validate_shapes,
        )

        got = (validate_shapes(_kg(rows), [shape], nb=8).to_pandas()
               .sort_values(["constraint", "subj", "obj"],
                            na_position="first")
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", pa.Table.from_pylist(rows))
        want = con.sql(f"""
            WITH targets AS (SELECT DISTINCT subj FROM t
              WHERE pred = '@type' AND obj = 'Person'),
            thing AS (SELECT DISTINCT subj FROM t
              WHERE pred = '@type' AND obj = 'Thing'),
            pt AS (SELECT subj, obj FROM t WHERE pred = 'rel'),
            cnt AS (SELECT targets.subj, count(pt.obj) AS n
              FROM targets LEFT JOIN pt USING (subj) GROUP BY 1)
            SELECT CAST(0 AS BIGINT) AS shape_id, subj,
              'min_count' AS "constraint",
              CAST(NULL AS VARCHAR) AS obj, n FROM cnt WHERE n < {lo}
            UNION ALL SELECT 0, subj, 'max_count', NULL, n
              FROM cnt WHERE n > {hi}
            UNION ALL SELECT 0, pt.subj, 'obj_class', pt.obj,
              CAST(1 AS BIGINT) FROM pt JOIN targets USING (subj)
              WHERE pt.obj NOT IN (SELECT subj FROM thing)
            UNION ALL SELECT 0, pt.subj, 'pattern', pt.obj, 1
              FROM pt JOIN targets USING (subj)
              WHERE NOT regexp_matches(pt.obj, '^T[0-5]$')
            """).df()
        con.close()
        want = (want.sort_values(["constraint", "subj", "obj"],
                                 na_position="first")
                .reset_index(drop=True))
        assert len(got) == len(want), f"trial {trial}"
        assert got.constraint.tolist() == want.constraint.tolist()
        assert got.subj.tolist() == want.subj.tolist()
        assert got.obj.fillna("∅").tolist() == \
            want.obj.fillna("∅").tolist()
        assert got.n.tolist() == want.n.tolist(), f"trial {trial}"


def test_personalized_pagerank_properties(ray_session):
    from biosd_feature_annotator_ray.stages.graph import (
        personalized_pagerank,
    )

    # star: seed 1 → {2,3}, plus disconnected 8→9
    t = pa.table({"src": [1, 1, 8], "dst": [2, 3, 9]})
    df = (personalized_pagerank(rd.from_arrow(t), seeds=[1], iters=6,
                                nb=4)
          .to_pandas().set_index("node").sort_index())
    assert abs(df["rank"].sum() - 1.0) < 1e-9  # mass conserved
    # unreachable-from-seed nodes score 0
    assert df.loc[8, "rank"] == 0.0 and df.loc[9, "rank"] == 0.0
    assert df.loc[1, "rank"] > df.loc[2, "rank"] > 0
    assert df.loc[2, "rank"] == df.loc[3, "rank"]  # symmetry

    # numpy reference parity on a small cyclic graph
    ed = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 2)]
    tt = pa.table({"src": [e[0] for e in ed], "dst": [e[1] for e in ed]})
    got = (personalized_pagerank(rd.from_arrow(tt).repartition(2),
                                 seeds=[2], damping=0.85, iters=5, nb=4)
           .to_pandas().set_index("node").sort_index())
    nodes = [1, 2, 3, 4]
    idx = {v: i for i, v in enumerate(nodes)}
    out = {v: [] for v in nodes}
    for a, b in ed:
        out[a].append(b)
    v = np.array([0.0, 1.0, 0.0, 0.0])
    r = v.copy()
    for _ in range(5):
        nxt = np.zeros(4)
        for a, succ in out.items():
            for b in succ:
                nxt[idx[b]] += r[idx[a]] / len(succ)
        emitted = nxt.sum()
        r = 0.85 * nxt + ((1 - 0.85) + 0.85 * (1 - emitted)) * v
    for n in nodes:
        assert abs(got.loc[n, "rank"] - r[idx[n]]) < 1e-9, n

    with pytest.raises(ValueError, match="not in the graph"):
        personalized_pagerank(rd.from_arrow(tt), seeds=[99], iters=1)
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(rd.from_arrow(tt), seeds=[])


def test_node_similarity_known_and_hub_cut(ray_session):
    from biosd_feature_annotator_ray.stages.graph import node_similarity

    # C4 cycle + separate triangle
    ed = [(1, 2), (2, 3), (3, 4), (1, 4), (5, 6), (6, 7), (5, 7)]
    t = pa.table({"a": [e[0] for e in ed], "b": [e[1] for e in ed]})
    df = (node_similarity(rd.from_arrow(t).repartition(2), nb=8)
          .to_pandas().set_index(["a", "b"]).sort_index())
    assert df.loc[(1, 3)].common == 2
    assert df.loc[(1, 3)].jaccard == 1.0
    assert abs(df.loc[(1, 3)].adamic_adar - 2 / np.log(2)) < 1e-6
    assert df.loc[(5, 6)].common == 1
    assert abs(df.loc[(5, 6)].jaccard - 1 / 3) < 1e-6
    assert len(df) == 5  # adjacent C4 pairs share no neighbor
    # min_common prunes
    assert (node_similarity(rd.from_arrow(t), min_common=2, nb=4)
            .count() == 2)
    # max_degree skips hub mids: star center 10 with leaves 20..23
    star = [(10, 20), (10, 21), (10, 22), (10, 23)]
    ts = pa.table({"a": [e[0] for e in star],
                   "b": [e[1] for e in star]})
    assert node_similarity(rd.from_arrow(ts), nb=4).count() == 6
    assert (node_similarity(rd.from_arrow(ts), max_degree=3, nb=4)
            .count() == 0)


def test_node_similarity_bruteforce(ray_session):
    from biosd_feature_annotator_ray.stages.graph import node_similarity

    rng = np.random.default_rng(5)
    pairs = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                    for a, b in rng.integers(0, 20, size=(50, 2))
                    if a != b})
    t = pa.table({"a": [e[0] for e in pairs],
                  "b": [e[1] for e in pairs]})
    got = (node_similarity(rd.from_arrow(t).repartition(3), nb=8)
           .to_pandas().set_index(["a", "b"]).sort_index())
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for u in adj:
        for v in adj:
            if u < v:
                com = adj[u] & adj[v]
                if com:
                    aa = sum(1 / np.log(len(adj[m])) for m in com)
                    want[(u, v)] = (len(com),
                                    len(com) / len(adj[u] | adj[v]), aa)
    assert set(got.index) == set(want)
    for k, (c, jac, aa) in want.items():
        assert got.loc[k].common == c
        assert abs(got.loc[k].jaccard - jac) < 1e-6
        assert abs(got.loc[k].adamic_adar - aa) < 1e-6


def test_degree_assortativity_known(ray_session):
    from biosd_feature_annotator_ray.stages.graph import (
        degree_assortativity,
    )

    # star graph: perfectly disassortative → r = -1
    star = pa.table({"a": [0, 0, 0, 0], "b": [1, 2, 3, 4]})
    r = degree_assortativity(rd.from_arrow(star), nb=4)
    assert abs(r - (-1.0)) < 1e-9
    # regular graph (C4 cycle): all degrees equal → NaN (zero variance)
    c4 = pa.table({"a": [1, 2, 3, 1], "b": [2, 3, 4, 4]})
    assert np.isnan(degree_assortativity(rd.from_arrow(c4), nb=4))
    # numpy parity on a random graph
    rng = np.random.default_rng(3)
    pairs = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                    for a, b in rng.integers(0, 15, size=(40, 2))
                    if a != b})
    t = pa.table({"a": [e[0] for e in pairs],
                  "b": [e[1] for e in pairs]})
    got = degree_assortativity(rd.from_arrow(t).repartition(2), nb=8)
    deg: dict = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in pairs] + [deg[b] for a, b in pairs]
    ys = [deg[b] for a, b in pairs] + [deg[a] for a, b in pairs]
    want = np.corrcoef(xs, ys)[0, 1]
    assert abs(got - want) < 1e-9


def test_sssp_improvement_and_validation(ray_session):
    from biosd_feature_annotator_ray.stages.graph import sssp

    # direct edge 0→3 costs 10; the 3-hop path costs 3 — a node
    # labeled early MUST be improved by the cheaper longer path
    ed = [(0, 3, 10.0), (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)]
    t = pa.table({"src": [e[0] for e in ed], "dst": [e[1] for e in ed],
                  "w": [e[2] for e in ed]})
    df = (sssp(rd.from_arrow(t), seeds=[0], nb=4)
          .to_pandas().set_index("node").sort_index())
    assert df.loc[3, "dist"] == 3.0
    assert df.loc[0, "dist"] == 0.0 and df.loc[2, "dist"] == 2.0

    with pytest.raises(Exception, match="negative"):
        sssp(rd.from_arrow(pa.table(
            {"src": [0], "dst": [1], "w": [-1.0]})), seeds=[0], nb=4)


def test_sssp_random_dijkstra_parity(ray_session):
    import heapq

    from biosd_feature_annotator_ray.stages.graph import sssp

    rng = np.random.default_rng(13)
    for trial in range(2):
        n = 25
        ed = [(int(a), int(b), float(rng.integers(1, 9)))
              for a, b in rng.integers(0, n, size=(70, 2)) if a != b]
        # keep one weight per (src, dst) — match engine's multi-edge
        # handling by taking the min weight
        best: dict = {}
        for a, b, w in ed:
            best[(a, b)] = min(w, best.get((a, b), np.inf))
        ed = [(a, b, w) for (a, b), w in sorted(best.items())]
        t = pa.table({"src": [e[0] for e in ed],
                      "dst": [e[1] for e in ed],
                      "w": [e[2] for e in ed]})
        seeds = [0, 1]
        got = (sssp(rd.from_arrow(t).repartition(2), seeds=seeds, nb=8)
               .to_pandas().set_index("node").dist.to_dict())
        adj: dict = {}
        for a, b, w in ed:
            adj.setdefault(a, []).append((b, w))
        distd = {s: 0.0 for s in seeds}
        h = [(0.0, s) for s in seeds]
        heapq.heapify(h)
        while h:
            d, u = heapq.heappop(h)
            if d > distd.get(u, np.inf):
                continue
            for v, w in adj.get(u, ()):
                nd = d + w
                if nd < distd.get(v, np.inf):
                    distd[v] = nd
                    heapq.heappush(h, (nd, v))
        assert got == distd, f"trial {trial}"


def test_fuse_triple_confidence(ray_session):
    from biosd_feature_annotator_ray.stages.graph import (
        fuse_triple_confidence,
    )

    rows = [
        {"subj": "a", "pred": "p", "obj": "x", "score": 0.5},
        {"subj": "a", "pred": "p", "obj": "x", "score": 0.5},
        {"subj": "a", "pred": "p", "obj": "x", "score": 0.9},
        {"subj": "b", "pred": "p", "obj": "y", "score": 0.0},
    ]
    t = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    df = (fuse_triple_confidence(t, nb=4).to_pandas()
          .set_index(["subj", "pred", "obj"]).sort_index())
    # 1 - 0.5*0.5*0.1 = 0.975
    assert abs(df.loc[("a", "p", "x")].conf - 0.975) < 1e-9
    assert df.loc[("a", "p", "x")].n_mentions == 3
    assert df.loc[("b", "p", "y")].conf == 0.0

    with pytest.raises(Exception, match="0, 1"):
        fuse_triple_confidence(rd.from_arrow(pa.Table.from_pylist(
            [{"subj": "a", "pred": "p", "obj": "x", "score": 1.0}])),
            nb=2).materialize()
