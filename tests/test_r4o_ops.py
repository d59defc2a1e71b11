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


# --- wordpiece_encode -------------------------------------------------------

def _wp_reference(text, vocab, unk="[UNK]", max_len=100):
    out, n_unk = [], 0
    words = text.lower().split()
    for w in words:
        if len(w) > max_len:
            out.append(unk)
            n_unk += 1
            continue
        pieces, i, dead = [], 0, False
        while i < len(w):
            j = len(w)
            while j > i:
                p = ("##" + w[i:j]) if i else w[i:j]
                if p in vocab:
                    pieces.append(p)
                    break
                j -= 1
            else:
                dead = True
                break
            i = j
        if dead:
            out.append(unk)
            n_unk += 1
        else:
            out.extend(pieces)
    return words, out, n_unk


WP_VOCAB = ["[UNK]", "un", "##aff", "##able", "##ed", "want",
            "##want", "wa", "##nt", "the", "a", "##b", "b"]


def test_wordpiece_bert_semantics():
    from biosd_feature_annotator_ray.stages.textstats import (
        wordpiece_encode)

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "unaffable unwanted the",   # classic BERT split + chain
            "xyz",                      # dead end -> UNK
            "THE A b",                  # lowercase fold
            None,                       # null doc
            "ab" * 80])})               # > max_word_len -> UNK
    got = {r["doc_id"]: r for r in wordpiece_encode(
        rd.from_arrow(docs).repartition(2), WP_VOCAB,
        max_word_len=100).take_all()}
    assert got[1]["pieces"] == "un ##aff ##able un ##want ##ed the"
    assert got[1]["n_words"] == 3 and got[1]["n_pieces"] == 7
    assert got[1]["n_unk"] == 0
    assert got[2]["pieces"] == "[UNK]" and got[2]["n_unk"] == 1
    assert got[3]["pieces"] == "the a b"
    assert got[4]["pieces"] is None and got[4]["n_words"] == 0
    assert got[5]["pieces"] == "[UNK]"      # 160 chars > 100
    with pytest.raises(ValueError, match="unk token"):
        wordpiece_encode(rd.from_arrow(docs), ["a", "b"])


def test_wordpiece_reference_fuzz():
    from biosd_feature_annotator_ray.stages.textstats import (
        wordpiece_encode)

    rng = random.Random(59)
    alphabet = "abu"
    vocab = {"[UNK]"}
    while len(vocab) < 25:
        k = rng.randrange(1, 4)
        w = "".join(rng.choices(alphabet, k=k))
        vocab.add(w if rng.random() < 0.5 else "##" + w)
    vocab = sorted(vocab)
    texts = [" ".join("".join(rng.choices(alphabet,
                                          k=rng.randrange(1, 8)))
                      for _ in range(rng.randrange(0, 10)))
             for _ in range(50)]
    docs = pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array(texts)})
    got = {r["doc_id"]: r for r in wordpiece_encode(
        rd.from_arrow(docs).repartition(3), vocab).take_all()}
    vs = set(vocab)
    for i, txt in enumerate(texts):
        words, pieces, n_unk = _wp_reference(txt, vs)
        if words:
            assert got[i]["pieces"] == " ".join(pieces)
            assert got[i]["n_pieces"] == len(pieces)
            assert got[i]["n_unk"] == n_unk
        else:
            assert got[i]["pieces"] is None


# --- bloom point-lookup index ------------------------------------------------

def _write_sharded(tmp, n_files=8, rows_per=200):
    import pyarrow.parquet as pq

    d = tmp / "data"
    d.mkdir()
    rid = 0
    for f in range(n_files):
        ids = list(range(rid, rid + rows_per))
        rid += rows_per
        pq.write_table(pa.table({
            "entity": pa.array([i * 7 for i in ids], pa.int64()),
            "payload": pa.array([f"p{i}" for i in ids])}),
            str(d / f"part-{f:03d}.parquet"))
    return str(d)


def test_bloom_index_lookup_exact_and_pruned(tmp_path):
    from biosd_feature_annotator_ray.stages.bloomindex import (
        bloom_candidate_files, bloom_point_lookup, build_bloom_index)

    data = _write_sharded(tmp_path)
    ix = str(tmp_path / "ix")
    n = build_bloom_index(data, "entity", ix, bits_pow=16)
    assert n == 8
    # keys living in exactly two files
    keys = [7 * 10, 7 * 1310]           # file 0 and file 6
    cand = bloom_candidate_files(ix, keys)
    assert "part-000.parquet" in cand and "part-006.parquet" in cand
    assert len(cand) < 8                 # pruning actually happened
    rows = sorted(bloom_point_lookup(data, ix, keys).take_all(),
                  key=lambda r: r["entity"])
    assert [(r["entity"], r["payload"]) for r in rows] == [
        (70, "p10"), (9170, "p1310")]
    # miss -> empty with schema, no candidate files
    assert bloom_candidate_files(ix, [13]) == []
    empty = bloom_point_lookup(data, ix, [13])
    assert empty.count() == 0
    assert set(empty.schema().names) == {"entity", "payload"}
    # idempotent rebuild; param mismatch raises
    assert build_bloom_index(data, "entity", ix, bits_pow=16) == 8
    with pytest.raises(ValueError, match="was built with"):
        build_bloom_index(data, "entity", ix, bits_pow=18)


def test_bloom_index_no_false_negatives_fuzz(tmp_path):
    from biosd_feature_annotator_ray.stages.bloomindex import (
        bloom_point_lookup, build_bloom_index)

    data = _write_sharded(tmp_path, n_files=4, rows_per=100)
    ix = str(tmp_path / "ix")
    build_bloom_index(data, "entity", ix, bits_pow=12)
    rng = random.Random(3)
    keys = [7 * rng.randrange(400) for _ in range(25)] + [5, 11]
    got = sorted(r["entity"] for r in
                 bloom_point_lookup(data, ix, keys).take_all())
    want = sorted({k for k in keys if k % 7 == 0 and k < 2800})
    assert got == want


# --- review-pass regressions -------------------------------------------------

def test_join_cardinality_pipe_in_key():
    from biosd_feature_annotator_ray.stages.join import (
        join_cardinality_estimate)

    l = rd.from_arrow(pa.table({"k": pa.array(
        ["a|b", "a|b", "c:d", "plain"])}))
    r = rd.from_arrow(pa.table({"k": pa.array(
        ["a|b", "c:d", "c:d", "zz"])}))
    got = join_cardinality_estimate(l, r, "k", nb=2).to_pylist()[0]
    assert got["est_rows"] == 4 and got["n_common_keys"] == 2
    assert got["max_key_rows"] == 2
    # both contribute 2; tie broken key asc — no crash on '|' or ':'
    assert got["top_keys"] == "a|b:2|c:d:2"


def test_expectations_duplicate_unique_rules():
    from biosd_feature_annotator_ray.stages.profile import (
        expectations_report)

    ds = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 2], pa.int64())}))
    rules = [{"rule": "unique", "col": "id"},
             {"rule": "unique", "col": "id"}]
    got = expectations_report(ds, rules, nb=2).to_pylist()
    for row in got:
        assert row["n_checked"] == 3 and row["violations"] == 2
        assert row["ok"] is False


def test_pagerank_init_duplicate_nodes_raise():
    t = _star_edges()
    init = rd.from_arrow(pa.table({
        "node": pa.array([0, 0], pa.int64()),
        "rank": pa.array([0.5, 0.5])}))
    with pytest.raises(Exception, match="unique per node"):
        pagerank(rd.from_arrow(t), iters=1, nb=2,
                 init_ranks=init).take_all()


def test_allen_join_nan_bounds_dropped():
    from biosd_feature_annotator_ray.stages.join import allen_join

    l = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "id": pa.array(["a", "b"]),
        "lo": pa.array([float("nan"), 0.0]),
        "hi": pa.array([1.0, 2.0])}))
    r = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "id": pa.array(["x"]),
        "lo": pa.array([0.0]),
        "hi": pa.array([2.0])}))
    got = allen_join(l, r, "k", "id", "id", nb=1).take_all()
    # the NaN-lo interval classifies as nothing; no '?' rows ever
    assert [(x["l_id"], x["relation"]) for x in got] == [
        ("b", "equals")]


def test_read_pages_evolved_all_missing_column_group(tmp_path):
    from biosd_feature_annotator_ray.sources.pages import (
        read_pages_evolved)

    _write(tmp_path, "old.parquet", pa.table({
        "url": pa.array(["u1", "u2"]),
        "big": pa.array([b"x" * 10, b"y"], pa.binary())}))
    _write(tmp_path, "new.parquet", pa.table({
        "url": pa.array(["u3"]), "lang": pa.array(["en"])}))
    ds = read_pages_evolved(str(tmp_path), columns=["lang"])
    vals = sorted((r["lang"] or "") for r in ds.take_all())
    assert vals == ["", "", "en"]
