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


# --- bootstrap_ci ------------------------------------------------------------

def _boot_reference(ids, xs, B, seed, alpha):
    import hashlib
    import math

    import numpy as np

    from biosd_feature_annotator_ray.stages.sketches import (
        POISSON1_CDF)

    thr = np.array(POISSON1_CDF) * 4294967296.0
    means = []
    for b in range(B):
        sw = swx = 0.0
        for i, x in zip(ids, xs):
            u = int(hashlib.md5(
                f"{i}:{b}:{seed}".encode()).hexdigest()[:8], 16)
            w = int(np.searchsorted(thr, float(u), side="left"))
            sw += w
            swx += w * x
        means.append(swx / sw)
    lo = float(np.quantile(means, alpha / 2))
    hi = float(np.quantile(means, 1 - alpha / 2))
    return sum(xs) / len(xs), lo, hi


def test_bootstrap_ci_matches_reference_and_deterministic():
    from biosd_feature_annotator_ray.stages.sketches import (
        bootstrap_ci)

    rng = random.Random(7)
    ids = list(range(120))
    xs = [rng.gauss(10, 2) for _ in ids]
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "v": pa.array(xs)})
    got = bootstrap_ci(rd.from_arrow(t).repartition(4), "id", "v",
                       n_replicates=30, seed=3,
                       alpha=0.1).to_pylist()[0]
    mean, lo, hi = _boot_reference(ids, xs, 30, 3, 0.1)
    assert got["mean"] == pytest.approx(mean, abs=2e-6)
    assert got["lo"] == pytest.approx(lo, abs=2e-6)
    assert got["hi"] == pytest.approx(hi, abs=2e-6)
    assert got["lo"] < got["mean"] < got["hi"]
    assert got["n"] == 120
    again = bootstrap_ci(rd.from_arrow(t).repartition(9), "id", "v",
                         n_replicates=30, seed=3,
                         alpha=0.1).to_pylist()[0]
    assert again == got


def test_bootstrap_ci_nulls_and_validation():
    from biosd_feature_annotator_ray.stages.sketches import (
        bootstrap_ci)

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([1.0, None, float("nan"), 3.0])})
    got = bootstrap_ci(rd.from_arrow(t), "id", "v",
                       n_replicates=20).to_pylist()[0]
    assert got["n"] == 2 and got["mean"] == pytest.approx(2.0)
    with pytest.raises(ValueError, match=">= 2 replicates"):
        bootstrap_ci(rd.from_arrow(t), "id", "v", n_replicates=1)


def test_compression_ratio_signal():
    from biosd_feature_annotator_ray.stages.textstats import (
        compression_ratio)

    rng = random.Random(11)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ")
                    for _ in range(2000))
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["spam " * 400, noise, None, ""])})
    got = {r["doc_id"]: r for r in compression_ratio(
        rd.from_arrow(docs).repartition(2)).take_all()}
    assert got[1]["ratio"] < 0.05          # pure repetition
    assert got[2]["ratio"] > 0.5           # noise barely compresses
    assert got[1]["n_bytes"] == 2000
    assert got[3]["ratio"] is None and got[4]["ratio"] is None
    # deterministic across partitionings
    again = {r["doc_id"]: r for r in compression_ratio(
        rd.from_arrow(docs).repartition(4)).take_all()}
    assert again == got


def test_cli_expectations_and_bloomindex(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq_

    def run(*cli, check=True):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray",
             *cli, "--num-cpus", "2"],
            capture_output=True, text=True, check=check,
            cwd="/root/repo")
        return out, (json.loads(out.stdout.strip().splitlines()[-1])
                     if out.stdout.strip() else None)

    t = pa.table({
        "id": pa.array([1, 2, 2, None], pa.int64()),
        "v": pa.array([0.1, 0.5, 0.9, 2.0])})
    p = tmp_path / "t.parquet"
    pq_.write_table(t, str(p))
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([
        {"rule": "not_null", "col": "id"},
        {"rule": "in_range", "col": "v", "lo": 0.0, "hi": 1.0}]))
    out, got = run("expectations", "--input", str(p),
                   "--rules", str(rules))
    assert got["ok"] is False
    assert got["rules"][0]["violations"] == 1
    assert got["rules"][1]["violations"] == 1
    out, _ = run("expectations", "--input", str(p),
                 "--rules", str(rules), "--fail-on-violation",
                 check=False)
    assert out.returncode == 1

    # bloom index build + lookup
    d = tmp_path / "data"
    d.mkdir()
    for f in range(3):
        pq_.write_table(pa.table({
            "k": pa.array([f * 100 + i for i in range(50)],
                          pa.int64()),
            "v": pa.array([f"x{f}-{i}" for i in range(50)])}),
            str(d / f"p{f}.parquet"))
    ix = tmp_path / "ix"
    _, got = run("bloomindex", "build", "--data", str(d),
                 "--index", str(ix), "--key-col", "k",
                 "--bits-pow", "14")
    assert got["files_indexed"] == 3
    outp = tmp_path / "hits"
    _, got = run("bloomindex", "lookup", "--data", str(d),
                 "--index", str(ix), "--keys", "5,205,999",
                 "--output", str(outp))
    assert got["rows"] == 2
    hit = pq_.read_table(str(outp)).to_pylist()
    assert sorted(r["k"] for r in hit) == [5, 205]


def test_bootstrap_ci_per_key_matches_global_on_single_key():
    from biosd_feature_annotator_ray.stages.sketches import (
        bootstrap_ci, bootstrap_ci_per_key)

    rng = random.Random(19)
    ids = list(range(80))
    xs = [rng.gauss(5, 1) for _ in ids]
    t = pa.table({
        "k": pa.array(["only"] * 80),
        "id": pa.array(ids, pa.int64()),
        "v": pa.array(xs)})
    per = bootstrap_ci_per_key(rd.from_arrow(t).repartition(3), "k",
                               "id", "v", n_replicates=25,
                               seed=2).take_all()
    glob = bootstrap_ci(rd.from_arrow(t), "id", "v",
                        n_replicates=25, seed=2).to_pylist()[0]
    assert len(per) == 1
    row = per[0]
    assert row["mean"] == glob["mean"]
    assert row["lo"] == glob["lo"] and row["hi"] == glob["hi"]
    assert row["n"] == 80
    # determinism across partitionings
    again = bootstrap_ci_per_key(rd.from_arrow(t).repartition(7),
                                 "k", "id", "v", n_replicates=25,
                                 seed=2).take_all()
    assert again == per


def test_bootstrap_ci_per_key_separates_groups():
    from biosd_feature_annotator_ray.stages.sketches import (
        bootstrap_ci_per_key)

    rng = random.Random(29)
    rows = [("a", i, rng.gauss(0, 1)) for i in range(150)] + \
           [("b", i + 1000, rng.gauss(10, 1)) for i in range(150)]
    t = pa.table({
        "k": pa.array([r[0] for r in rows]),
        "id": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows])})
    got = {r["k"]: r for r in bootstrap_ci_per_key(
        rd.from_arrow(t).repartition(4), "k", "id", "v",
        n_replicates=30).take_all()}
    assert got["a"]["hi"] < got["b"]["lo"]     # disjoint CIs
    assert got["a"]["lo"] < got["a"]["mean"] < got["a"]["hi"]
    assert got["b"]["n"] == 150


# --- match_bgp NOT EXISTS ----------------------------------------------------

def _kg():
    rows = [
        ("a", "knows", "b"), ("b", "knows", "c"),
        ("c", "knows", "a"), ("a", "blocked", "b"),
        ("d", "knows", "a")]
    return rd.from_arrow(pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows])}))


def test_bgp_not_exists_drops_proven_bindings():
    from biosd_feature_annotator_ray.stages.graph import match_bgp

    # ?x knows ?y WHERE NOT EXISTS { ?x blocked ?y }
    got = {(r["x"], r["y"]) for r in match_bgp(
        _kg(), [("?x", "knows", "?y")],
        not_exists=[("?x", "blocked", "?y")], nb=2).take_all()}
    assert got == {("b", "c"), ("c", "a"), ("d", "a")}
    # existential unshared var: NOT EXISTS { ?y blocked ?z } kills
    # every binding whose y blocks ANYONE (only 'a' blocks)
    got = {(r["x"], r["y"]) for r in match_bgp(
        _kg(), [("?x", "knows", "?y")],
        not_exists=[("?y", "blocked", "?z")], nb=2).take_all()}
    assert got == {("a", "b"), ("b", "c")}
    # unanchored group rejected
    with pytest.raises(ValueError, match="shares no variable"):
        match_bgp(_kg(), [("?x", "knows", "?y")],
                  not_exists=[("?p", "blocked", "?q")]).take_all()


def test_bgp_not_exists_composes_with_optional_and_filters():
    from biosd_feature_annotator_ray.stages.graph import match_bgp

    got = {(r["x"], r["y"], r.get("w")) for r in match_bgp(
        _kg(), [("?x", "knows", "?y")],
        optional=[("?y", "knows", "?w")],
        not_exists=[("?x", "blocked", "?y")],
        filters=[("?x", "!=", "d")], nb=2).take_all()}
    assert got == {("b", "c", "a"), ("c", "a", "b")}


# --- randomized DuckDB parity fuzzes (round-3 lesson: fuzzes beat
# example tests) --------------------------------------------------------------

def test_expectations_duckdb_parity_fuzz():
    import duckdb

    from biosd_feature_annotator_ray.stages.profile import (
        expectations_report)

    rng = random.Random(101)
    for trial in range(3):
        n = 200
        ids = [rng.randrange(80) if rng.random() > 0.1 else None
               for _ in range(n)]
        status = [rng.choice(["A", "B", "C", "X", None])
                  for _ in range(n)]
        vals = [rng.uniform(-2, 12) if rng.random() > 0.1 else None
                for _ in range(n)]
        t = pa.table({
            "id": pa.array(ids, pa.int64()),
            "st": pa.array(status),
            "v": pa.array(vals, pa.float64())})
        got = expectations_report(
            rd.from_arrow(t).repartition(3), [
                {"rule": "not_null", "col": "id"},
                {"rule": "unique", "col": "id"},
                {"rule": "accepted_values", "col": "st",
                 "values": ["A", "B", "C"]},
                {"rule": "in_range", "col": "v", "lo": 0.0,
                 "hi": 10.0}], nb=3).to_pylist()
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "WITH u AS (SELECT id, count(*) n FROM t"
            "  WHERE id IS NOT NULL GROUP BY 1)"
            " SELECT count(*) FILTER (id IS NULL) FROM t"
            " UNION ALL SELECT coalesce(CAST(sum(n)"
            "  FILTER (n > 1) AS BIGINT), 0) FROM u"
            " UNION ALL SELECT count(*) FILTER (st IS NOT NULL"
            "  AND st NOT IN ('A','B','C')) FROM t"
            " UNION ALL SELECT count(*) FILTER (v < 0 OR v > 10)"
            "  FROM t").fetchall()
        assert [r["violations"] for r in got] == \
            [w[0] for w in want]


def test_c4_lines_duckdb_parity_fuzz():
    import duckdb

    from biosd_feature_annotator_ray.stages.textstats import (
        c4_line_filter)

    rng = random.Random(107)
    texts = []
    words = ["aa", "bb", "cc", "d"]
    for _ in range(80):
        lines = [" ".join(rng.choices(words,
                                      k=rng.randrange(0, 5)))
                 + rng.choice([".", "!", "", "?", '"', " ."])
                 for _ in range(rng.randrange(0, 6))]
        texts.append("\n".join(lines) if lines else
                     rng.choice(["", None]))
    t = pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "text": pa.array(texts, pa.string())})
    got = {r["doc_id"]: r for r in c4_line_filter(
        rd.from_arrow(t).repartition(3), min_words=2,
        min_lines=1).take_all()}
    con = duckdb.connect()
    con.register("docs", t)
    want = con.execute(
        "WITH l AS (SELECT doc_id,"
        "  unnest(string_split(coalesce(text, ''), chr(10)))"
        "   AS line,"
        "  unnest(range(1, len(string_split(coalesce(text, ''),"
        "   chr(10))) + 1)) AS ord FROM docs),"
        " f AS (SELECT doc_id, line, ord,"
        "  (len(regexp_extract_all(trim(line), '\\S+')) >= 2"
        "   AND regexp_matches(trim(line), '[.!?\"]$')) AS keep"
        "  FROM l)"
        " SELECT doc_id,"
        "  string_agg(line, chr(10) ORDER BY ord) FILTER (keep),"
        "  count(*) FILTER (keep)"
        " FROM f GROUP BY doc_id"
        " HAVING count(*) FILTER (keep) >= 1").fetchall()
    want = {w[0]: w for w in want}
    assert set(got) == set(want)
    for d, row in got.items():
        assert row["text"] == want[d][1]
        assert row["n_kept"] == want[d][2]


# --- second review-pass regressions ------------------------------------------

def test_zonemap_nested_column_leaf_indexing(tmp_path):
    import pyarrow.parquet as pq_

    from biosd_feature_annotator_ray.stages.profile import (
        zonemap_report)

    # struct column BEFORE the probed one: leaf order is
    # [meta.a, meta.b, k] — positional indexing would read meta.b
    t = pa.table({
        "meta": pa.array([{"a": 0, "b": 999}] * 100),
        "k": pa.array(range(100), pa.int64())})
    pq_.write_table(t, str(tmp_path / "p.parquet"),
                    row_group_size=50)
    rep = zonemap_report(str(tmp_path), "k", lo=60,
                         hi=80).to_pylist()
    # range [60,80] lives in rg 1 only -> rg 0 pruned
    assert rep[0]["n_pruned"] == 1 and rep[0]["rows_scanned"] == 50
    with pytest.raises(ValueError, match="nested column"):
        zonemap_report(str(tmp_path), "meta")


def test_bloom_lookup_string_keys_with_digit_text(tmp_path):
    import pyarrow.parquet as pq_

    from biosd_feature_annotator_ray.stages.bloomindex import (
        bloom_point_lookup, build_bloom_index)

    d = tmp_path / "data"
    d.mkdir()
    pq_.write_table(pa.table({
        "k": pa.array(["5", "alpha", "42"]),
        "v": pa.array([1, 2, 3], pa.int64())}),
        str(d / "p.parquet"))
    ix = str(tmp_path / "ix")
    build_bloom_index(str(d), "k", ix, bits_pow=12)
    # int-typed probes coerce to the data's string key type
    got = sorted(r["k"] for r in bloom_point_lookup(
        str(d), ix, [5, "alpha"]).take_all())
    assert got == ["5", "alpha"]


def test_bootstrap_null_ids_excluded():
    from biosd_feature_annotator_ray.stages.sketches import (
        bootstrap_ci, bootstrap_ci_per_key)

    t = pa.table({
        "id": pa.array([1, None, 3], pa.int64()),
        "k": pa.array(["a", "a", "a"]),
        "v": pa.array([1.0, 100.0, 3.0])})
    got = bootstrap_ci(rd.from_arrow(t), "id", "v",
                       n_replicates=10).to_pylist()[0]
    # the null-id row (value 100) never enters: n=2, mean=2
    assert got["n"] == 2 and got["mean"] == pytest.approx(2.0)
    per = bootstrap_ci_per_key(rd.from_arrow(t), "k", "id", "v",
                               n_replicates=10).take_all()[0]
    assert per["n"] == 2 and per["mean"] == pytest.approx(2.0)


def test_bgp_constant_pattern_still_raises():
    from biosd_feature_annotator_ray.stages.graph import match_bgp

    with pytest.raises(ValueError, match="all-constant pattern"):
        match_bgp(_kg(), [("a", "knows", "b")]).take_all()
    with pytest.raises(ValueError, match="all-constant pattern"):
        match_bgp(_kg(), [("?x", "knows", "?y")],
                  not_exists=[("a", "blocked", "b")]).take_all()


def test_allen_join_timestamp_bounds():
    import pandas as pd

    from biosd_feature_annotator_ray.stages.join import allen_join

    def ts(h):
        return pd.Timestamp(2026, 1, 1, h).to_datetime64()

    l = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "id": pa.array(["a", "b"]),
        "lo": pa.array([ts(0), ts(5)], pa.timestamp("us")),
        "hi": pa.array([ts(2), ts(6)], pa.timestamp("us"))}))
    r = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "id": pa.array(["x"]),
        "lo": pa.array([ts(2)], pa.timestamp("us")),
        "hi": pa.array([ts(5)], pa.timestamp("us"))}))
    got = {x["l_id"]: x["relation"] for x in allen_join(
        l, r, "k", "id", "id", nb=2).take_all()}
    # [0h,2h] meets [2h,5h]; [5h,6h] is met_by it
    assert got == {"a": "meets", "b": "met_by"}
    # gap bound in native units (µs): 1-hour gap needs max_gap >= 3.6e9
    l2 = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "id": pa.array(["c"]),
        "lo": pa.array([ts(7)], pa.timestamp("us")),
        "hi": pa.array([ts(8)], pa.timestamp("us"))}))
    near = allen_join(l2, r, "k", "id", "id",
                      max_gap=2 * 3600 * 1_000_000, nb=2).take_all()
    assert [x["relation"] for x in near] == ["after"]
    far = allen_join(l2, r, "k", "id", "id",
                     max_gap=3600 * 1_000_000 - 1, nb=2).take_all()
    assert far == []


def test_sample_neighbors_string_nodes():
    import hashlib

    from biosd_feature_annotator_ray.stages.graph import (
        sample_neighbors)

    edges = [("hub", f"n{i}") for i in range(8)] + [("n0", "hub")]
    t = pa.table({
        "src": pa.array([e[0] for e in edges]),
        "dst": pa.array([e[1] for e in edges])})
    got = {(r["src"], r["dst"]) for r in sample_neighbors(
        rd.from_arrow(t), k=3, seed=7, nb=2).take_all()}
    nbrs = sorted(
        (f"n{i}" for i in range(8)),
        key=lambda d: (int(hashlib.md5(
            f"hub:{d}:7".encode()).hexdigest()[:8], 16), d))
    assert got == {("hub", d) for d in nbrs[:3]} | {("n0", "hub")}
