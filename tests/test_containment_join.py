"""Overlap-coefficient containment join vs brute force
(r04 seventh sitting)."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.stages.dedup import containment_join


def _brute(docs, t):
    toks = {d["doc_id"]: set(d["text"].lower().split())
            for d in docs if d["text"]}
    out = {}
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            mn = min(len(toks[a]), len(toks[b]))
            if mn and inter / mn >= t:
                out[(a, b)] = (len(toks[a]), len(toks[b]), inter)
    return out


def _run(docs, t, nb=8):
    ds = rd.from_arrow(pa.Table.from_pylist(docs)).repartition(3)
    df = containment_join(ds, t, nb=nb).to_pandas()
    got = {}
    for r in df.itertuples():
        got[(r.id_a, r.id_b)] = (r.size_a, r.size_b, r.inter)
        assert abs(r.contain_a - r.inter / r.size_a) < 1e-12
        assert abs(r.contain_b - r.inter / r.size_b) < 1e-12
        assert abs(r.overlap - r.inter / min(r.size_a, r.size_b)) \
            < 1e-12
    return got


def test_planted_subset_found_despite_low_jaccard():
    big = " ".join(f"w{i}" for i in range(40))
    sub = "w3 w17 w29"          # Jaccard 3/40 — a subset all the same
    docs = [{"doc_id": 0, "text": big},
            {"doc_id": 1, "text": sub},
            {"doc_id": 2, "text": "q1 q2 q3 q4"}]
    got = _run(docs, 1.0)
    assert got == {(0, 1): (40, 3, 3)}


def test_fuzz_vs_brute_force():
    rng = random.Random(31)
    for trial, t in enumerate((0.6, 0.8)):
        docs = []
        for i in range(40):
            k = rng.randint(2, 10)
            words = sorted({f"t{rng.randrange(30)}" for _ in range(k)})
            docs.append({"doc_id": i, "text": " ".join(words)})
        docs.append({"doc_id": 40, "text": None})
        assert _run(docs, t) == _brute(docs, t), trial
