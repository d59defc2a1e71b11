"""Thirteenth-sitting wave 6: GraphSAGE neighbor sampling, C4 line
filtering, Allen interval-algebra join, EM-trained Fellegi-Sunter."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import sample_neighbors
from biosd_feature_annotator_ray.stages.join import (
    AllenPairOverflow, allen_join)
from biosd_feature_annotator_ray.stages.similarity import fs_em_train
from biosd_feature_annotator_ray.stages.textstats import c4_line_filter


def _md5u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --- sample_neighbors -------------------------------------------------------

def test_sample_neighbors_matches_sequential_reference():
    rng = random.Random(5)
    edges = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(150)})
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})
    got = sample_neighbors(rd.from_arrow(t).repartition(4), k=3,
                           seed=7, nb=4).take_all()
    got_set = {(r["src"], r["dst"]) for r in got}
    # sequential reference: per src, 3 smallest (md5, dst)
    by_src = {}
    for s, d in edges:
        by_src.setdefault(s, []).append(d)
    ref = set()
    for s, ds in by_src.items():
        ds = sorted(set(ds), key=lambda d: (_md5u32(f"{s}:{d}:7"), d))
        ref |= {(s, d) for d in ds[:3]}
    assert got_set == ref
    assert len(got) == len(got_set)          # no duplicate edges
    # determinism across partitionings
    again = sample_neighbors(rd.from_arrow(t).repartition(9), k=3,
                             seed=7, nb=3).take_all()
    assert {(r["src"], r["dst"]) for r in again} == ref


def test_sample_neighbors_null_endpoints_and_k_validation():
    t = pa.table({
        "src": pa.array([1, 1, None], pa.int64()),
        "dst": pa.array([2, None, 3], pa.int64())})
    got = sample_neighbors(rd.from_arrow(t), k=5, nb=2).take_all()
    assert got == [{"src": "1", "dst": "2"}] or got == [
        {"src": 1, "dst": 2}]
    with pytest.raises(ValueError, match="k must be"):
        sample_neighbors(rd.from_arrow(t), k=0)


# --- c4_line_filter ---------------------------------------------------------

def test_c4_line_filter_rules_and_reassembly():
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "A good long sentence.\nshort\nAnother fine line here!\n"
            "no terminal punct here at all",
            "only two words.",
            None,
            'He said "stop".\nQuoted line ends well."']),
    })
    out = {r["doc_id"]: r for r in c4_line_filter(
        rd.from_arrow(docs).repartition(2), min_words=3,
        min_lines=1).take_all()}
    assert out[1]["text"] == (
        "A good long sentence.\nAnother fine line here!")
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 2
    # doc 2: one line, 3 words? "only two words." = 3 words, kept
    assert out[2]["text"] == "only two words."
    assert 3 not in out                       # null text -> 0 lines
    assert out[4]["n_kept"] == 2              # quote-terminal kept
    # min_lines gate
    strict = {r["doc_id"] for r in c4_line_filter(
        rd.from_arrow(docs), min_words=3, min_lines=2).take_all()}
    assert strict == {1, 4}


def test_c4_line_filter_python_reference_fuzz():
    import re

    rng = random.Random(31)
    words = ["alpha", "beta", "gamma", "x", "yy"]
    docs = []
    for i in range(60):
        lines = []
        for _ in range(rng.randrange(6)):
            ln = " " * rng.randrange(2) + " ".join(
                rng.choices(words, k=rng.randrange(6)))
            ln += rng.choice([".", "!", "?", '"', "", " ", "x"])
            lines.append(ln)
        docs.append((i, "\n".join(lines)))
    t = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs])})
    got = {r["doc_id"]: r for r in c4_line_filter(
        rd.from_arrow(t).repartition(3), min_words=2,
        min_lines=1).take_all()}
    for i, text in docs:
        kept = [ln for ln in text.split("\n")
                if len(re.findall(r"\S+", ln)) >= 2
                and re.search(r'[.!?"]$', ln.strip())]
        if len(kept) >= 1:
            assert got[i]["text"] == "\n".join(kept)
            assert got[i]["n_kept"] == len(kept)
            assert got[i]["n_lines"] == len(text.split("\n"))
        else:
            assert i not in got


# --- allen_join -------------------------------------------------------------

def _mk_intervals(rows):
    return rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "id": pa.array([r[1] for r in rows], pa.string()),
        "lo": pa.array([r[2] for r in rows], pa.float64()),
        "hi": pa.array([r[3] for r in rows], pa.float64())}))


ALLEN_CASES = [
    # (left interval, right interval, relation)
    ((0.0, 5.0), (0.0, 5.0), "equals"),
    ((0.0, 3.0), (0.0, 5.0), "starts"),
    ((0.0, 7.0), (0.0, 5.0), "started_by"),
    ((2.0, 5.0), (0.0, 5.0), "finishes"),
    ((0.0, 5.0), (2.0, 5.0), "finished_by"),
    ((0.0, 2.0), (2.0, 5.0), "meets"),
    ((2.0, 5.0), (0.0, 2.0), "met_by"),
    ((0.0, 3.0), (2.0, 5.0), "overlaps"),
    ((2.0, 5.0), (0.0, 3.0), "overlapped_by"),
    ((2.0, 3.0), (0.0, 5.0), "during"),
    ((0.0, 5.0), (2.0, 3.0), "contains"),
    ((0.0, 1.0), (2.0, 3.0), "before"),
    ((2.0, 3.0), (0.0, 1.0), "after"),
]


def test_allen_join_all_13_relations():
    lrows = [(k, f"l{k}", a, b)
             for k, ((a, b), _, _) in enumerate(ALLEN_CASES)]
    rrows = [(k, f"r{k}", a, b)
             for k, (_, (a, b), _) in enumerate(ALLEN_CASES)]
    got = allen_join(_mk_intervals(lrows), _mk_intervals(rrows),
                     "k", "id", "id", max_gap=5, nb=3).take_all()
    rel = {int(r["k"]): r["relation"] for r in got}
    assert rel == {k: want
                   for k, (_, _, want) in enumerate(ALLEN_CASES)}


def test_allen_join_gap_bound_nulls_and_validation():
    l = _mk_intervals([(1, "a", 0.0, 1.0), (2, "b", 0.0, 1.0),
                       (3, "n", 0.0, 1.0)])
    r = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None], pa.int64()),
        "id": pa.array(["x", "y", "z"]),
        "lo": pa.array([3.0, 50.0, 0.0]),
        "hi": pa.array([4.0, 60.0, 1.0])}))
    got = allen_join(l, r, "k", "id", "id", max_gap=2,
                     nb=2).take_all()
    # key 1: gap 2 <= 2 kept as before; key 2: gap 49 dropped;
    # null right key matches nothing
    assert [(r_["k"], r_["relation"]) for r_ in got] == [("1", "before")]
    bad = _mk_intervals([(1, "a", 5.0, 1.0)])
    with pytest.raises(Exception, match="lo > hi"):
        allen_join(bad, r, "k", "id", "id").take_all()


def test_allen_join_brute_force_fuzz():
    rng = random.Random(17)
    lrows, rrows = [], []
    for i in range(120):
        k = rng.randrange(6)
        a = rng.randrange(10)
        b = a + rng.randrange(4)
        (lrows if i % 2 else rrows).append(
            (k, f"i{i}", float(a), float(b)))
    got = {(r["k"], r["l_id"], r["r_id"]): r["relation"]
           for r in allen_join(
               _mk_intervals(lrows), _mk_intervals(rrows),
               "k", "id", "id", max_gap=3, nb=4).take_all()}

    def classify(xs, xe, ys, ye):
        if xs == ys and xe == ye:
            return "equals"
        if xs == ys:
            return "starts" if xe < ye else "started_by"
        if xe == ye:
            return "finishes" if xs > ys else "finished_by"
        if xe == ys:
            return "meets"
        if ye == xs:
            return "met_by"
        if xs < ys < xe < ye:
            return "overlaps"
        if ys < xs < ye < xe:
            return "overlapped_by"
        if xs > ys and xe < ye:
            return "during"
        if xs < ys and xe > ye:
            return "contains"
        if xe < ys:
            return "before" if ys - xe <= 3 else None
        return "after" if xs - ye <= 3 else None

    want = {}
    for k, li, xs, xe in lrows:
        for k2, ri, ys, ye in rrows:
            if k != k2:
                continue
            rel = classify(xs, xe, ys, ye)
            if rel is not None:
                want[(str(k), li, ri)] = rel
    assert got == want


def test_allen_join_pair_overflow_guard():
    rows = [(1, f"i{j}", 0.0, 1.0) for j in range(40)]
    with pytest.raises(AllenPairOverflow):
        allen_join(_mk_intervals(rows), _mk_intervals(rows),
                   "k", "id", "id", nb=1,
                   max_pairs_per_bucket=100).take_all()


# --- fs_em_train ------------------------------------------------------------

def _em_reference(pair_bits, F, iters, m0, u0, p0):
    from collections import Counter

    cen = Counter(pair_bits)
    pats = sorted(cen)
    n = np.array([cen[p] for p in pats], np.float64)
    b = ((np.array(pats)[:, None] >> np.arange(F)) & 1).astype(float)
    m, u, p = np.full(F, m0), np.full(F, u0), p0
    for _ in range(iters):
        am = p * np.prod(m ** b * (1 - m) ** (1 - b), axis=1)
        au = (1 - p) * np.prod(u ** b * (1 - u) ** (1 - b), axis=1)
        r = am / (am + au)
        rn = r * n
        m = (rn[:, None] * b).sum(0) / rn.sum()
        u = (((1 - r) * n)[:, None] * b).sum(0) / ((1 - r) * n).sum()
        p = rn.sum() / n.sum()
    return m, u, p


def test_fs_em_train_matches_sequential_reference():
    rng = random.Random(23)
    # synthetic linkage: 30 true matches agree on name/city most of
    # the time; non-match pairs agree rarely.
    lrows, rrows = [], []
    for i in range(60):
        blk = i % 6
        name = f"n{i}"
        city = f"c{i % 9}"
        lrows.append((blk, name, city))
        if i < 30:    # matched twin, mostly agreeing
            rrows.append((blk,
                          name if rng.random() < 0.9 else "zz",
                          city if rng.random() < 0.8 else "qq"))
        else:
            rrows.append((blk, f"m{i}", f"d{i % 7}"))
    L = rd.from_arrow(pa.table({
        "blk": pa.array([r[0] for r in lrows], pa.int64()),
        "name": pa.array([r[1] for r in lrows]),
        "city": pa.array([r[2] for r in lrows])}))
    R = rd.from_arrow(pa.table({
        "blk": pa.array([r[0] for r in rrows], pa.int64()),
        "name": pa.array([r[1] for r in rrows]),
        "city": pa.array([r[2] for r in rrows])}))
    got = fs_em_train(L, R, ["blk"], [("name", "name"),
                                      ("city", "city")],
                      iters=5).to_pylist()
    # reference over the same candidate pairs
    bits = []
    for lb, ln, lc in lrows:
        for rb, rn_, rc in rrows:
            if lb != rb:
                continue
            bits.append((ln == rn_) | ((lc == rc) << 1))
    m, u, p = _em_reference(bits, 2, 5, 0.9, 0.1, 0.1)
    for i, row in enumerate(got):
        assert row["m"] == pytest.approx(m[i], abs=1e-12)
        assert row["u"] == pytest.approx(u[i], abs=1e-12)
        assert row["p"] == pytest.approx(p, abs=1e-12)
        assert row["w_agree"] == pytest.approx(
            np.log2(m[i] / u[i]), abs=1e-9)
    # EM separated matches from non-matches: m >> u on both fields
    assert all(r["m"] > r["u"] for r in got)
    # determinism across partitionings
    again = fs_em_train(L.repartition(7), R.repartition(3), ["blk"],
                        [("name", "name"), ("city", "city")],
                        iters=5).to_pylist()
    assert again == got


def test_fs_em_train_validation():
    t = rd.from_arrow(pa.table({"blk": pa.array([1], pa.int64()),
                                "x": pa.array(["a"])}))
    e = rd.from_arrow(pa.table({"blk": pa.array([2], pa.int64()),
                                "x": pa.array(["a"])}))
    with pytest.raises(ValueError, match="no.*candidate pairs"):
        fs_em_train(t, e, ["blk"], [("x", "x")])
    with pytest.raises(ValueError, match="0 < u < m"):
        fs_em_train(t, t, ["blk"], [("x", "x")], init_m=0.1,
                    init_u=0.9)
