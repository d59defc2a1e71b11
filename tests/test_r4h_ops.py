"""Twelfth-sitting ER-family operators: Jaro-Winkler blocked join,
Fellegi-Sunter linkage scoring, Soundex phonetic keys."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.functions.phonetic import soundex_array
from biosd_feature_annotator_ray.stages.similarity import (
    _jaro_winkler, blocked_jw_join, fellegi_sunter_join)


def test_jaro_winkler_matches_duckdb_fuzz():
    """The scalar is bit-identical to DuckDB's jaro_winkler_similarity
    (including the integer-halved transpositions and the >0.7 boost
    threshold) over random strings."""
    import duckdb

    rng = random.Random(303)
    con = duckdb.connect()
    for _ in range(1500):
        s = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        t = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 10)))
        ref = con.execute(
            "select jaro_winkler_similarity(?, ?)", [s, t]).fetchone()[0]
        assert _jaro_winkler(s, t) == ref, (s, t)


def test_jaro_winkler_known_values():
    assert _jaro_winkler("martha", "marhta") == pytest.approx(
        0.9611111111111111, abs=0)
    assert _jaro_winkler("", "") == 0.0
    assert _jaro_winkler("a", "") == 0.0
    assert _jaro_winkler("same", "same") == 1.0
    assert _jaro_winkler("ab", "ba") == 0.0


def test_blocked_jw_join_finds_planted_swaps():
    names = [f"widget alpha {i:03d}" for i in range(40)]
    right = rd.from_arrow(pa.table({
        "rid": pa.array(range(40), pa.int64()),
        "name": pa.array(names, pa.string())}))
    # swap two adjacent mid-string chars — same first char, same length
    corrupted = [n[:6] + n[7] + n[6] + n[8:] for n in names[:10]]
    left = rd.from_arrow(pa.table({
        "lid": pa.array(range(10), pa.int64()),
        "name": pa.array(corrupted, pa.string())}))
    out = blocked_jw_join(left, right, "lid", "name", "rid", "name",
                          min_sim=0.97, nb=4).to_pandas()
    got = set(zip(out["l_id"].astype(int), out["r_id"].astype(int)))
    assert {(i, i) for i in range(10)} <= got
    # every emitted sim honours the threshold and self-pairs score top
    assert (out["sim"] >= 0.97).all()


def test_fellegi_sunter_scores_and_nulls():
    left = rd.from_arrow(pa.table({
        "l_id": pa.array([1, 2, 3], pa.int64()),
        "blk": pa.array([0, 0, 0], pa.int64()),
        "f1": pa.array(["x", "x", None], pa.string()),
        "f2": pa.array([10.0, 99.0, 10.0], pa.float64())}))
    right = rd.from_arrow(pa.table({
        "r_id": pa.array([7], pa.int64()),
        "blk": pa.array([0], pa.int64()),
        "f1": pa.array(["x"], pa.string()),
        "f2": pa.array([10.0], pa.float64())}))
    out = fellegi_sunter_join(
        left, right, block_on=["blk"],
        fields=[("f1", "f1", 0.9, 0.1), ("f2", "f2", 0.8, 0.2)],
        nb=2).to_pandas().set_index("l_id")
    import math

    w1a, w1d = math.log2(0.9 / 0.1), math.log2(0.1 / 0.9)
    w2a, w2d = math.log2(0.8 / 0.2), math.log2(0.2 / 0.8)
    assert out.loc[1, "fs_score"] == pytest.approx(w1a + w2a)
    assert out.loc[2, "fs_score"] == pytest.approx(w1a + w2d)
    # null field contributes ZERO weight, not disagreement
    assert out.loc[3, "fs_score"] == pytest.approx(0.0 + w2a)


def test_fellegi_sunter_min_score_and_validation():
    left = rd.from_arrow(pa.table({
        "l_id": pa.array([1, 2], pa.int64()),
        "blk": pa.array([0, 0], pa.int64()),
        "f1": pa.array(["x", "y"], pa.string())}))
    right = rd.from_arrow(pa.table({
        "r_id": pa.array([7], pa.int64()),
        "blk": pa.array([0], pa.int64()),
        "f1": pa.array(["x"], pa.string())}))
    out = fellegi_sunter_join(
        left, right, block_on=["blk"],
        fields=[("f1", "f1", 0.9, 0.1)], min_score=1.0, nb=2).to_pandas()
    assert out["l_id"].tolist() == [1]
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter_join(left, right, ["blk"],
                            fields=[("f1", "f1", 0.1, 0.9)])


def test_soundex_known_values():
    got = soundex_array(pa.array(
        ["Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
         "Pfister", "Honeywell", "Aubrey", "", "   ", None, "Wu",
         "a1b2c3"], pa.string())).to_pylist()
    assert got == ["R163", "R163", "A261", "A261", "T522", "P236",
                   "H540", "A160", "", "", None, "W000", "A120"]


def test_soundex_matches_sql_chain_fuzz():
    """Engine kernel == the DuckDB replay used by the oracle, over
    random letter soup (incl. vowel runs, H/W separators, non-alpha)."""
    import duckdb

    from biosd_feature_annotator_ray.pipelines.queries import _soundex_sql

    rng = random.Random(99)
    vals = ["".join(rng.choice("aeiouhwbcdrstx -9")
                    for _ in range(rng.randint(0, 12)))
            for _ in range(400)]
    eng = soundex_array(pa.array(vals, pa.string())).to_pylist()
    con = duckdb.connect()
    con.register("v", pa.table({"x": pa.array(vals, pa.string())}))
    ref = [r[0] for r in con.execute(
        f"SELECT {_soundex_sql('x')} FROM v").fetchall()]
    assert eng == ref


def _ds(tbl: dict) -> "rd.Dataset":
    return rd.from_arrow(pa.table(tbl))


def test_modularity_known_graphs():
    from biosd_feature_annotator_ray.stages.graph import modularity

    # two disjoint triangles, each its own community: the textbook
    # value Q = 1/2 for k disjoint equal cliques as k*(1/k - 1/k^2)
    edges = _ds({"a": pa.array([0, 1, 0, 10, 11, 10], pa.int64()),
                 "b": pa.array([1, 2, 2, 11, 12, 12], pa.int64())})
    labels = _ds({"node": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
                  "label": pa.array([0, 0, 0, 1, 1, 1], pa.int64())})
    out = modularity(edges, labels).to_pandas()
    assert out["m_edges"].iloc[0] == 6
    assert out["intra_edges"].iloc[0] == 6
    assert out["q"].iloc[0] == 0.5
    # everything one community: Q = intra/m - 1 = 0
    one = _ds({"node": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
               "label": pa.array([7] * 6, pa.int64())})
    assert modularity(edges, one).to_pandas()["q"].iloc[0] == 0.0


def test_modularity_missing_label_raises():
    import pytest as _pytest

    from biosd_feature_annotator_ray.stages.graph import modularity

    edges = _ds({"a": pa.array([0], pa.int64()),
                 "b": pa.array([1], pa.int64())})
    labels = _ds({"node": pa.array([0], pa.int64()),
                  "label": pa.array([0], pa.int64())})
    with _pytest.raises(Exception, match="missing from labels"):
        modularity(edges, labels).to_pandas()


def test_triple_agreement_counts():
    from biosd_feature_annotator_ray.stages.graph import triple_agreement

    gold = _ds({"subj": pa.array([1, 2, 3, 3], pa.int64()),
                "pred": pa.array(["p", "p", "p", "p"]),
                "obj": pa.array([10, 20, 30, 30], pa.int64())})
    pred = _ds({"subj": pa.array([1, 2, 9], pa.int64()),
                "pred": pa.array(["p", "p", "p"]),
                "obj": pa.array([10, 99, 90], pa.int64())})
    out = triple_agreement(gold, pred, nb=4).to_pandas().iloc[0]
    # gold dedups to 3, pred 3, common 1 (subj=1)
    assert (out["n_gold"], out["n_pred"], out["n_common"]) == (3, 3, 1)
    assert out["precision"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["recall"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["f1"] == pytest.approx(1 / 3, abs=1e-6)


def test_triple_agreement_empty_pred():
    from biosd_feature_annotator_ray.stages.graph import triple_agreement

    gold = _ds({"subj": pa.array([1], pa.int64()),
                "pred": pa.array(["p"]),
                "obj": pa.array([10], pa.int64())})
    pred = _ds({"subj": pa.array([], pa.int64()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.int64())})
    out = triple_agreement(gold, pred, nb=2).to_pandas().iloc[0]
    assert out["n_pred"] == 0 and out["precision"] == 0.0
    assert out["f1"] == 0.0


def test_cohen_kappa_values():
    from biosd_feature_annotator_ray.stages.sketches import cohen_kappa

    # classic 2x2 example: po = 0.7, marginals a: 0.5/0.5, b: 0.6/0.4
    # pe = 0.5*0.6 + 0.5*0.4 = 0.5 -> kappa = 0.4
    a = ["x"] * 25 + ["x"] * 25 + ["y"] * 5 + ["y"] * 45
    b = ["x"] * 25 + ["y"] * 25 + ["x"] * 5 + ["y"] * 45
    # wait: po must be 0.7 -> agree on 25 xx + 45 yy = 70/100
    ds = _ds({"a": pa.array(a), "b": pa.array(b)})
    out = cohen_kappa(ds, "a", "b", nb=2).to_pandas().iloc[0]
    assert out["n"] == 100
    assert out["po"] == pytest.approx(0.70)
    # marginals: a x=50 y=50; b x=30 y=70 -> pe = .5*.3+.5*.7 = 0.5
    assert out["pe"] == pytest.approx(0.5)
    assert out["kappa"] == pytest.approx((0.7 - 0.5) / 0.5)


def test_cohen_kappa_nulls_and_perfect():
    from biosd_feature_annotator_ray.stages.sketches import cohen_kappa

    ds = _ds({"a": pa.array(["x", "y", None, "x"]),
              "b": pa.array(["x", "y", "x", None])})
    out = cohen_kappa(ds, "a", "b", nb=2).to_pandas().iloc[0]
    assert out["n"] == 2 and out["po"] == 1.0
    # pe = 1 exactly only when ONE label pair dominates everywhere
    single = _ds({"a": pa.array(["x", "x"]), "b": pa.array(["x", "x"])})
    k = cohen_kappa(single, "a", "b", nb=2).to_pandas().iloc[0]
    assert k["pe"] == 1.0 and pa.Table.from_pandas(
        k.to_frame().T)["kappa"][0].as_py() is None


def test_cohen_kappa_empty():
    from biosd_feature_annotator_ray.stages.sketches import cohen_kappa

    ds = _ds({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    out = cohen_kappa(ds, "a", "b", nb=2).to_pandas().iloc[0]
    assert out["n"] == 0


def test_merge_intervals_nested_and_touching():
    from biosd_feature_annotator_ray.stages.windows import merge_intervals

    ds = _ds({
        "k": pa.array([1, 1, 1, 1, 2, 2, None, None], pa.int64()),
        "lo": pa.array([0, 1, 3, 50, 10, 20, 5, 6], pa.int64()),
        "hi": pa.array([100, 2, 4, 60, 20, 30, 6, 7], pa.int64())})
    out = (merge_intervals(ds, "k", "lo", "hi", nb=4).to_pandas()
           .sort_values(["k", "lo"]).reset_index(drop=True))
    # key 1: [0,100] swallows [1,2] and [3,4] AND [50,60] (nested);
    # key 2: [10,20]+[20,30] touch -> merge; null key its own group
    rows = [(r["k"], r["lo"], r["hi"], r["n_intervals"])
            for _, r in out.iterrows()]
    assert (1.0, 0, 100, 4) in [(r[0], r[1], r[2], r[3]) for r in rows] or \
           (1, 0, 100, 4) in rows
    assert any(r[0] == 2 and r[1] == 10 and r[2] == 30 and r[3] == 2
               for r in rows)
    null_rows = out[out["k"].isna()]
    assert len(null_rows) == 1 and null_rows["n_intervals"].iloc[0] == 2


def test_merge_intervals_null_bounds_and_degenerate():
    from biosd_feature_annotator_ray.stages.windows import merge_intervals

    ds = _ds({"k": pa.array([1, 1], pa.int64()),
              "lo": pa.array([0, None], pa.int64()),
              "hi": pa.array([5, 9], pa.int64())})
    out = merge_intervals(ds, "k", "lo", "hi", nb=2).to_pandas()
    assert len(out) == 1 and out["hi"].iloc[0] == 5  # null-lo row dropped

    bad = _ds({"k": pa.array([1], pa.int64()),
               "lo": pa.array([9], pa.int64()),
               "hi": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="lo > hi"):
        merge_intervals(bad, "k", "lo", "hi", nb=2).to_pandas()


def test_merge_intervals_duckdb_parity_fuzz():
    import duckdb

    from biosd_feature_annotator_ray.stages.windows import merge_intervals

    rng = random.Random(42)
    for trial in range(5):
        n = 300
        k = [rng.randint(0, 8) for _ in range(n)]
        lo = [rng.randint(0, 200) for _ in range(n)]
        hi = [a + rng.randint(0, 40) for a in lo]
        tbl = pa.table({"k": pa.array(k, pa.int64()),
                        "lo": pa.array(lo, pa.int64()),
                        "hi": pa.array(hi, pa.int64())})
        got = (merge_intervals(rd.from_arrow(tbl).repartition(3),
                               "k", "lo", "hi", nb=4)
               .to_pandas().sort_values(["k", "lo"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("x", tbl)
        ref = con.execute(
            "WITH w AS (SELECT k, lo, hi, max(hi) OVER (PARTITION BY k"
            "  ORDER BY lo, hi ROWS BETWEEN UNBOUNDED PRECEDING AND"
            "  1 PRECEDING) AS pm FROM x),"
            " b AS (SELECT *, CASE WHEN pm IS NULL OR lo > pm THEN 1"
            "  ELSE 0 END AS brk FROM w),"
            " g AS (SELECT *, sum(brk) OVER (PARTITION BY k ORDER BY"
            "  lo, hi ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            "  AS grp FROM b)"
            " SELECT k, min(lo) AS lo, max(hi) AS hi,"
            "  count(*) AS n_intervals FROM g GROUP BY k, grp"
            " ORDER BY k, lo").df()
        assert got["k"].tolist() == ref["k"].tolist(), trial
        assert got["lo"].tolist() == ref["lo"].tolist(), trial
        assert got["hi"].tolist() == ref["hi"].tolist(), trial
        assert (got["n_intervals"].astype(int).tolist()
                == ref["n_intervals"].astype(int).tolist()), trial


def test_merge_intervals_timestamps():
    from biosd_feature_annotator_ray.stages.windows import merge_intervals

    ts = pa.array([0, 1_000_000, 5_000_000], pa.int64()).cast(
        pa.timestamp("us"))
    te = pa.array([2_000_000, 3_000_000, 6_000_000], pa.int64()).cast(
        pa.timestamp("us"))
    ds = _ds({"k": pa.array([1, 1, 1], pa.int64()), "lo": ts, "hi": te})
    out = merge_intervals(ds, "k", "lo", "hi", nb=2).to_pandas()
    assert len(out) == 2
    assert str(out["hi"].dtype).startswith("datetime64")


def test_benford_deviation_uniform_vs_benford():
    import math

    from biosd_feature_annotator_ray.stages.sketches import benford_deviation

    # perfectly Benford-distributed multiset: chi2 == 0 by construction
    counts = {d: round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    vals, grp = [], []
    for d, c in counts.items():
        vals += [d * 10] * c
        grp += ["b"] * c
    # uniform digits: visibly non-Benford
    for d in range(1, 10):
        vals += [d] * 100
        grp += ["u"] * 100
    ds = _ds({"v": pa.array(vals, pa.int64()),
              "g": pa.array(grp, pa.string())})
    out = benford_deviation(ds, "v", group_col="g", nb=4).to_pandas()
    out = out.set_index("grp")
    n_b = sum(counts.values())
    chi_b = math.fsum((counts[d] - n_b * math.log10(1 + 1 / d)) ** 2
                      / (n_b * math.log10(1 + 1 / d))
                      for d in range(1, 10))
    assert out.loc["b", "chi2"] == pytest.approx(chi_b, abs=1e-6)
    assert out.loc["u", "chi2"] > 100  # uniform digits scream


def test_benford_excludes_nonpositive_and_nulls():
    from biosd_feature_annotator_ray.stages.sketches import benford_deviation

    ds = _ds({"v": pa.array([123, -5, 0, None, 999], pa.int64())})
    out = benford_deviation(ds, "v", nb=2).to_pandas()
    assert out["n"].iloc[0] == 2  # 123 and 999 only


def test_weighted_pagerank_matches_numpy_reference():
    from biosd_feature_annotator_ray.stages.graph import pagerank

    # weighted triangle + a dangling sink
    edges = _ds({"src": pa.array([0, 0, 1, 2], pa.int64()),
                 "dst": pa.array([1, 2, 2, 3], pa.int64()),
                 "w": pa.array([3.0, 1.0, 2.0, 5.0], pa.float64())})
    out = pagerank(edges, iters=4, nb=4, weight_col="w").to_pandas()
    got = dict(zip(out["node"].astype(int), out["rank"]))

    # dense reference
    N, d = 4, 0.85
    import numpy as _np

    W = _np.zeros((N, N))
    for s, t, w in [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 3, 5.0)]:
        W[s, t] = w
    out_w = W.sum(axis=1)
    r = _np.full(N, 1 / N)
    for _ in range(4):
        msum = _np.zeros(N)
        for s in range(N):
            if out_w[s]:
                msum += r[s] * W[s] / out_w[s]
        emitted = msum.sum()
        r = (1 - d) / N + d * (1 - emitted) / N + d * msum
    for i in range(N):
        assert got[i] == pytest.approx(r[i], abs=1e-12), i


def test_weighted_pagerank_rejects_bad_weights():
    from biosd_feature_annotator_ray.stages.graph import pagerank

    for bad in ([0.0], [-1.0], [float("nan")], [None]):
        edges = _ds({"src": pa.array([0], pa.int64()),
                     "dst": pa.array([1], pa.int64()),
                     "w": pa.array(bad, pa.float64())})
        with pytest.raises(Exception, match="weight_col"):
            pagerank(edges, iters=1, nb=2, weight_col="w").to_pandas()


def test_cli_agreement_kappa_intervals_modularity(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq_

    def run(*a):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray", *a,
             "--num-cpus", "2"],
            capture_output=True, text=True, check=True, cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    trip = pa.table({"subj": pa.array([1, 2, 3], pa.int64()),
                     "pred": pa.array(["p"] * 3),
                     "obj": pa.array([1, 2, 3], pa.int64())})
    predt = pa.table({"subj": pa.array([1, 2, 9], pa.int64()),
                      "pred": pa.array(["p"] * 3),
                      "obj": pa.array([1, 2, 9], pa.int64())})
    gp, pp = tmp_path / "g.parquet", tmp_path / "p.parquet"
    pq_.write_table(trip, str(gp))
    pq_.write_table(predt, str(pp))
    got = run("agreement", "--gold", str(gp), "--pred", str(pp))
    assert got["n_common"] == 2 and got["precision"] == pytest.approx(2 / 3)

    ann = pa.table({"a": pa.array(["x", "y", "x", "y"]),
                    "b": pa.array(["x", "y", "y", "y"])})
    ap = tmp_path / "ann.parquet"
    pq_.write_table(ann, str(ap))
    got = run("kappa", "--input", str(ap), "--col-a", "a", "--col-b", "b")
    assert got["n"] == 4 and got["po"] == 0.75

    iv = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                   "lo": pa.array([0, 5, 0], pa.int64()),
                   "hi": pa.array([10, 20, 3], pa.int64())})
    ip = tmp_path / "iv.parquet"
    pq_.write_table(iv, str(ip))
    got = run("intervals", "--input", str(ip),
              "--output", str(tmp_path / "isl"),
              "--key", "k", "--lo", "lo", "--hi", "hi")
    assert got["islands"] == 2
    isl = pq_.read_table(str(tmp_path / "isl")).to_pandas()
    assert sorted(isl["hi"].tolist()) == [3, 20]

    ed = pa.table({"a": pa.array([0, 1, 0, 10, 11, 10], pa.int64()),
                   "b": pa.array([1, 2, 2, 11, 12, 12], pa.int64())})
    lb = pa.table({"node": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
                   "label": pa.array([0, 0, 0, 1, 1, 1], pa.int64())})
    ep, lp = tmp_path / "e.parquet", tmp_path / "l.parquet"
    pq_.write_table(ed, str(ep))
    pq_.write_table(lb, str(lp))
    got = run("modularity", "--edges", str(ep), "--labels", str(lp))
    assert got["q"] == 0.5


def test_components_incremental_matches_scratch_fuzz():
    from biosd_feature_annotator_ray.stages.graph import (
        components_incremental, string_components)

    rng = random.Random(7)
    for _trial in range(3):
        nodes = [f"v{i:03d}" for i in range(40)]
        base = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)]
        delta = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(10)]
        delta += [(f"new{j}a", f"new{j}b") for j in range(3)]

        def ds_of(pairs):
            return rd.from_arrow(pa.table({
                "src": pa.array([a for a, _ in pairs], pa.string()),
                "dst": pa.array([b for _, b in pairs], pa.string())}))

        old = string_components(ds_of(base), nb=4)
        inc = (components_incremental(old, ds_of(delta), nb=4)
               .to_pandas().sort_values("node").reset_index(drop=True))
        scratch = (string_components(ds_of(base + delta), nb=4)
                   .to_pandas().sort_values("node").reset_index(drop=True))
        assert inc["node"].tolist() == scratch["node"].tolist()
        assert inc["lab"].tolist() == scratch["lab"].tolist()


def test_components_incremental_no_merge_delta():
    from biosd_feature_annotator_ray.stages.graph import (
        components_incremental, string_components)

    base = rd.from_arrow(pa.table({"src": pa.array(["a"], pa.string()),
                                   "dst": pa.array(["b"], pa.string())}))
    old = string_components(base, nb=2)
    # delta edge entirely inside the existing component: no merges
    delta = rd.from_arrow(pa.table({"src": pa.array(["a"], pa.string()),
                                    "dst": pa.array(["b"], pa.string())}))
    out = (components_incremental(old, delta, nb=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    assert out["node"].tolist() == ["a", "b"]
    assert out["lab"].tolist() == ["a", "a"]


def test_embedding_norm_profile_known():
    from biosd_feature_annotator_ray.stages.similarity import (
        embedding_norm_profile)

    vecs = _ds({"embedding": pa.array(
        [[3.0, 4.0], [6.0, 8.0], None], pa.list_(pa.float32()))})
    out = embedding_norm_profile(vecs).to_pandas().iloc[0]
    assert out["n"] == 2 and out["dim"] == 2
    assert out["min_norm"] == 5.0 and out["max_norm"] == 10.0
    assert out["mean_norm"] == 7.5


def test_embedding_norm_profile_ragged_raises():
    from biosd_feature_annotator_ray.stages.similarity import (
        embedding_norm_profile)

    vecs = _ds({"embedding": pa.array([[1.0], [1.0, 2.0]],
                                      pa.list_(pa.float32()))})
    with pytest.raises(Exception, match="ragged"):
        embedding_norm_profile(vecs)


def test_kwic_contexts_semantics():
    from biosd_feature_annotator_ray.stages.textstats import kwic_contexts

    docs = _ds({"doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["xx join yy scan zz", None,
                                  "joinjoin"], pa.string())})
    out = (kwic_contexts(docs, ["join", "scan"], width=3).to_pandas()
           .sort_values(["doc_id", "snippet"]).reset_index(drop=True))
    # doc 1: both terms (second match starts AFTER the first match's
    # trailing context, hence the leading space); doc 3:
    # non-overlapping -> the second 'join' is partly consumed by the
    # first match's trailing context
    assert out["term"].tolist() == ["scan", "join", "join"]
    assert out["snippet"].tolist() == [" scan zz", "xx join yy",
                                       "joinjoi"]
    with pytest.raises(ValueError, match="non-empty"):
        kwic_contexts(docs, [])


def test_blocking_quality_counts():
    from biosd_feature_annotator_ray.stages.similarity import blocking_quality

    left = _ds({"l_id": pa.array([1, 2, 3], pa.int64()),
                "blk": pa.array(["a", "a", "zz"], pa.string())})
    right = _ds({"r_id": pa.array([1, 2, 3, 4], pa.int64()),
                 "blk": pa.array(["a", "b", "zz", "a"], pa.string())})
    gold = _ds({"l_id": pa.array([1, 2, 3], pa.int64()),
                "r_id": pa.array([1, 2, 3], pa.int64())})
    out = blocking_quality(left, right, gold, nb=4).to_pandas().iloc[0]
    # candidates: blk a -> 2*2=4, zz -> 1*1=1 => 5; co-blocked gold:
    # (1,1) both 'a' yes; (2,2) a vs b no; (3,3) zz yes => 2
    assert out["candidates"] == 5
    assert out["co_blocked"] == 2
    assert out["pair_completeness"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["reduction_ratio"] == pytest.approx(1 - 5 / 12, abs=1e-6)


def test_calibration_bins_known():
    from biosd_feature_annotator_ray.stages.sketches import calibration_bins

    ds = _ds({"s": pa.array([0.05, 0.06, 0.95, 1.0], pa.float64()),
              "y": pa.array([0, 1, 1, 1], pa.int64())})
    out = calibration_bins(ds, "s", "y", n_bins=10, nb=2).to_pandas()
    assert out["bin"].tolist() == [0, 9]  # 1.0 clamps into bin 9
    assert out["n"].tolist() == [2, 2]
    assert out.loc[out["bin"] == 0, "frac_pos"].iloc[0] == 0.5
    bad = _ds({"s": pa.array([1.5], pa.float64()),
               "y": pa.array([1], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        calibration_bins(bad, "s", "y")


def test_label_prf_known():
    from biosd_feature_annotator_ray.stages.sketches import label_prf

    ds = _ds({"g": pa.array(["x", "x", "y", "y", None]),
              "p": pa.array(["x", "y", "y", "z", "x"])})
    out = label_prf(ds, "g", "p", nb=2).to_pandas().set_index("label")
    # x: gold 2, pred 1, tp 1; y: gold 2, pred 2, tp 1; z: gold 0 pred 1
    assert out.loc["x", "precision"] == 1.0
    assert out.loc["x", "recall"] == 0.5
    assert out.loc["y", "f1"] == pytest.approx(0.5)
    assert out.loc["z", "recall"] == 0.0 and out.loc["z", "f1"] == 0.0


def test_jaro_winkler_utf8_byte_semantics():
    """DuckDB compares UTF-8 bytes, not codepoints — pinned."""
    import duckdb

    con = duckdb.connect()
    for a, b in [("café", "cafe"), ("naïve", "naive"),
                 ("übermensch", "ubermensch"), ("日本語", "日本誤")]:
        ref = con.execute("select jaro_winkler_similarity(?, ?)",
                          [a, b]).fetchone()[0]
        assert _jaro_winkler(a, b) == ref, (a, b)


def test_kwic_longer_term_not_shadowed():
    from biosd_feature_annotator_ray.stages.textstats import kwic_contexts

    docs = _ds({"doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["a scanner darkly scan it"],
                                 pa.string())})
    out = kwic_contexts(docs, ["scan", "scanner"], width=2).to_pandas()
    assert "scanner" in out["term"].tolist()
    assert "scan" in out["term"].tolist()


def test_fellegi_sunter_one_sided_field_raises():
    left = _ds({"l_id": pa.array([1], pa.int64()),
                "blk": pa.array([0], pa.int64()),
                "f1": pa.array(["x"], pa.string())})
    right = _ds({"r_id": pa.array([7], pa.int64()),
                 "blk": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="BOTH sides"):
        fellegi_sunter_join(left, right, ["blk"],
                            fields=[("f1", "f1", 0.9, 0.1)]).to_pandas()


def test_merge_intervals_large_int64_keys_with_null():
    from biosd_feature_annotator_ray.stages.windows import merge_intervals

    k1, k2 = 2 ** 53, 2 ** 53 + 1  # alias under float64 coercion
    ds = _ds({"k": pa.array([k1, k2, None], pa.int64()),
              "lo": pa.array([0, 4, 0], pa.int64()),
              "hi": pa.array([5, 9, 1], pa.int64())})
    # assert on ARROW output — pandas itself would float64-coerce the
    # nullable int64 key column and alias the two keys in the TEST
    tbl = pa.concat_tables(list(
        merge_intervals(ds, "k", "lo", "hi", nb=2)
        .iter_batches(batch_format="pyarrow")))
    keys = [v for v in tbl.column("k").to_pylist() if v is not None]
    assert sorted(keys) == [k1, k2]  # two DISTINCT keys, no merge
    assert tbl.num_rows == 3


def test_conductance_known_graph():
    from biosd_feature_annotator_ray.stages.graph import conductance

    # two triangles joined by ONE bridge: each community has cut 1,
    # volume 7 (6 intra-degree + 1 bridge endpoint), m = 7
    edges = _ds({"a": pa.array([0, 1, 0, 10, 11, 10, 2], pa.int64()),
                 "b": pa.array([1, 2, 2, 11, 12, 12, 10], pa.int64())})
    labels = _ds({"node": pa.array([0, 1, 2, 10, 11, 12], pa.int64()),
                  "label": pa.array([0, 0, 0, 1, 1, 1], pa.int64())})
    out = (conductance(edges, labels).to_pandas()
           .sort_values("label").reset_index(drop=True))
    assert out["cut_edges"].tolist() == [1, 1]
    assert out["volume"].tolist() == [7, 7]
    assert out["conductance"].tolist() == [
        pytest.approx(1 / 7, abs=1e-6)] * 2


def test_span_agreement_known():
    from biosd_feature_annotator_ray.stages.graph import span_agreement

    gold = _ds({"doc_id": pa.array([1, 1, 2], pa.int64()),
                "start": pa.array([0, 100, 0], pa.int64()),
                "end": pa.array([10, 110, 10], pa.int64())})
    # pred: one overlapping (shifted), one disjoint, one wrong doc
    pred = _ds({"doc_id": pa.array([1, 1, 3], pa.int64()),
                "start": pa.array([5, 500, 0], pa.int64()),
                "end": pa.array([15, 510, 10], pa.int64())})
    out = span_agreement(gold, pred, nb=2).to_pandas().iloc[0]
    assert (out["matched_pred"], out["matched_gold"]) == (1, 1)
    assert out["precision"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["recall"] == pytest.approx(1 / 3, abs=1e-6)
    # min_overlap above the actual 5-char overlap kills the match
    out2 = span_agreement(gold, pred, min_overlap=6, nb=2).to_pandas()
    assert out2["matched_pred"].iloc[0] == 0


def test_jw_prefilter_never_drops_true_matches():
    """The multiset upper bound is a TRUE bound: the prefilter may
    only skip pairs whose exact JW is below min_sim."""
    from biosd_feature_annotator_ray.stages.similarity import (
        jw_score_pairs)

    rng = random.Random(17)
    l = ["".join(rng.choice("abcdé ") for _ in range(rng.randint(0, 12)))
         for _ in range(600)]
    r = ["".join(rng.choice("abcdé ") for _ in range(rng.randint(0, 12)))
         for _ in range(600)]
    for thr in (0.7, 0.85, 0.95):
        sim, keep = jw_score_pairs(l, r, thr)
        exact = np.array([_jaro_winkler(a, b) for a, b in zip(l, r)])
        want = exact >= thr
        assert (keep == want).all()
        assert (sim[keep] == exact[keep]).all()
