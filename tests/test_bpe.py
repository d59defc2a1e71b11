"""Distributed BPE merge learning vs a sequential reference
implementation (r04 seventh sitting)."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.stages.textstats import (
    apply_bpe, learn_bpe)


def _ref_bpe(word_counts: dict, n_merges: int):
    """Sequential textbook BPE: weighted pair census, (count DESC,
    pair ASC) argmax, left-to-right greedy merge scan."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for r in range(n_merges):
        census: dict = {}
        for w, c in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                census[(s[i], s[i + 1])] = census.get(
                    (s[i], s[i + 1]), 0) + c
        if not census:
            break
        best = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((r, a, b, cnt))
        for w in seqs:
            s = seqs[w]
            new: list = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            seqs[w] = new
    return merges, seqs


def _ds_from_words(word_counts: dict):
    rows = []
    did = 0
    for w, c in word_counts.items():
        for _ in range(c):
            rows.append({"doc_id": did, "text": w})
            did += 1
    random.Random(5).shuffle(rows)
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


def _got_merges(tbl: pa.Table):
    return list(zip(tbl.column("round").to_pylist(),
                    tbl.column("left").to_pylist(),
                    tbl.column("right").to_pylist(),
                    tbl.column("pair_count").to_pylist()))


def test_matches_reference_with_overlaps():
    wc = {"aaaa": 3, "aaab": 2, "xyxy": 4, "banana": 2, "low": 5,
          "lower": 2, "lowest": 1}
    ref, _ = _ref_bpe(wc, 6)
    got = _got_merges(learn_bpe(_ds_from_words(wc), n_merges=6, nb=8))
    assert got == ref


def test_fuzz_against_reference():
    rng = random.Random(11)
    for trial in range(4):
        words = {}
        for _ in range(30):
            w = "".join(rng.choice("abc")
                        for _ in range(rng.randint(1, 7)))
            words[w] = words.get(w, 0) + rng.randint(1, 5)
        ref, _ = _ref_bpe(words, 5)
        got = _got_merges(
            learn_bpe(_ds_from_words(words), n_merges=5, nb=8))
        assert got == ref, (trial, got, ref)


def test_apply_bpe_matches_reference_segmentation():
    wc = {"lowlow": 2, "lower": 3, "west": 1}
    merges = learn_bpe(_ds_from_words(wc), n_merges=4, nb=8)
    _ref, seqs = _ref_bpe(wc, 4)
    docs = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 0, "text": "lowlow west"},
         {"doc_id": 1, "text": "lower"},
         {"doc_id": 2, "text": ""},
         {"doc_id": 3, "text": None}]))
    out = (apply_bpe(docs, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.subwords[0] == " ".join(seqs["lowlow"] + seqs["west"])
    assert out.n_words[0] == 2
    assert out.n_subwords[0] == len(seqs["lowlow"]) + len(seqs["west"])
    assert out.subwords[1] == " ".join(seqs["lower"])
    assert out.subwords[2] is None and out.n_words[2] == 0
    assert out.subwords[3] is None and out.n_subwords[3] == 0


def test_max_words_guard():
    import pytest

    wc = {f"w{i}x": 1 for i in range(30)}
    with pytest.raises(ValueError, match="max_words"):
        learn_bpe(_ds_from_words(wc), n_merges=2, nb=8, max_words=10)
