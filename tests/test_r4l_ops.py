"""Thirteenth-sitting wave 4: Mann-Kendall trend, positional phrase
search, temperature-scaled mixing (composition covered by oracle)."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.textindex import phrase_search
from biosd_feature_annotator_ray.stages.windows import (
    mann_kendall_per_key)


def _mk_ref(xs):
    """Sequential reference Mann-Kendall S and Var(S)."""
    n = len(xs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (xs[j] > xs[i]) - (xs[j] < xs[i])
    from collections import Counter

    ties = Counter(xs)
    tv = sum(c * (c - 1) * (2 * c + 5) for c in ties.values() if c > 1)
    var = (n * (n - 1) * (2 * n + 5) - tv) / 18.0
    return s, var


def test_mann_kendall_matches_reference_fuzz():
    rng = random.Random(71)
    rows = []
    for k in range(4):
        for i in range(50):
            # mix of trend, noise and ties
            v = round(0.1 * i * (k % 2) + rng.uniform(0, 3), 0)
            rows.append((k, i, v))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "value": pa.array([r[2] for r in rows], pa.float64())})
    got = mann_kendall_per_key(rd.from_arrow(t), nb=2).to_pandas()
    df = t.to_pandas()
    for k in range(4):
        xs = df[df.user_id == k].sort_values(
            ["ts", "event_id"])["value"].tolist()
        s, var = _mk_ref(xs)
        row = got[got.user_id == k].iloc[0]
        assert row["s_stat"] == s
        assert row["var_s"] == pytest.approx(var, abs=1e-6)
        if var > 0:
            zc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
            assert row["z"] == pytest.approx(
                zc / np.sqrt(var), abs=1e-3)


def test_mann_kendall_monotone_and_constant():
    t = pa.table({
        "user_id": [1] * 5 + [2] * 5,
        "ts": list(range(5)) * 2,
        "event_id": list(range(10)),
        "value": pa.array(
            [1.0, 2.0, 3.0, 4.0, 5.0] + [7.0] * 5, pa.float64())})
    got = mann_kendall_per_key(rd.from_arrow(t), nb=1).to_pandas()
    up = got[got.user_id == 1].iloc[0]
    assert up["s_stat"] == 10  # all 10 pairs concordant
    assert up["z"] > 2.0
    flat = got[got.user_id == 2].iloc[0]
    assert flat["s_stat"] == 0 and flat["var_s"] == 0.0
    assert flat["z"] is None or np.isnan(flat["z"])


def test_mann_kendall_null_skip_and_guard():
    t = pa.table({
        "user_id": [1] * 4, "ts": list(range(4)),
        "event_id": list(range(4)),
        "value": pa.array([1.0, None, 2.0, 3.0], pa.float64())})
    got = mann_kendall_per_key(rd.from_arrow(t), nb=1).to_pandas()
    assert got.iloc[0]["n"] == 3 and got.iloc[0]["s_stat"] == 3
    with pytest.raises(Exception):
        mann_kendall_per_key(rd.from_arrow(t), nb=1,
                             max_rows_per_key=2).to_pandas()


# --- phrase_search ---------------------------------------------------------

def _docs_tbl(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_phrase_search_basic_and_overlap():
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(
        _docs_tbl(["the cat sat", "cat the sat cat", "the cat the cat",
                   "nothing here"]),
        "the cat", nb=2).take_all()}
    assert got == {0: 1, 2: 2}


def test_phrase_search_repeated_word_overlaps():
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(
        _docs_tbl(["x batch batch batch y", "batch batch",
                   "batch x batch"]),
        "batch batch", nb=2).take_all()}
    # "batch batch batch" has 2 overlapping matches
    assert got == {0: 2, 1: 1}


def test_phrase_search_case_and_three_words():
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(
        _docs_tbl(["A B C d", "a b x c", "c a b c a b c"]),
        "a b c", nb=2).take_all()}
    assert got == {0: 1, 2: 2}
    with pytest.raises(ValueError):
        phrase_search(_docs_tbl(["x"]), "   ")


def test_cli_stats_and_phrase(tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq_

    def run(*cli):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray",
             *cli, "--num-cpus", "2"],
            capture_output=True, text=True, check=True,
            cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    t = pa.table({
        "g": pa.array(["a"] * 40 + ["b"] * 40),
        "x": pa.array([float(i % 7) for i in range(40)]
                      + [float(i % 7) + 2.0 for i in range(40)])})
    p = tmp_path / "t.parquet"
    pq_.write_table(t, str(p))
    got = run("stats", "--input", str(p), "--test", "welch",
              "--col-a", "g", "--col-b", "x",
              "--group-a", "a", "--group-b", "b")
    assert got["n_a"] == 40 and got["mean_b"] - got["mean_a"] == \
        pytest.approx(2.0, abs=1e-6)
    got = run("stats", "--input", str(p), "--test", "ks",
              "--col-a", "g", "--col-b", "x",
              "--group-a", "a", "--group-b", "b")
    assert 0.0 < got["d_stat"] <= 1.0
    got = run("stats", "--input", str(p), "--test", "fd",
              "--col-a", "g", "--col-b", "x")
    assert got["n"] == 80

    d = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta alpha beta", "beta alpha"])})
    dp = tmp_path / "d.parquet"
    pq_.write_table(d, str(dp))
    got = run("phrase", "--input", str(dp), "--phrase", "alpha beta")
    # doc 1 has two overlap-free occurrences; "beta alpha" is NOT a
    # match (order matters)
    assert got == {"matching_docs": 1, "total_matches": 2}
