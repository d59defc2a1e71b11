"""remove_dup_spans (Lee-et-al-style duplicate window removal) —
planted-passage semantics plus a randomized brute-force parity fuzz."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.stages.dedup import remove_dup_spans


def brute_force(docs: list[tuple[int, str]], k: int,
                keep_first: bool) -> dict[int, tuple[str, int, int]]:
    """Reference implementation over window STRINGS (no hashing):
    returns {doc_id: (cleaned_text, n_tokens, n_removed)}."""
    occ: dict[tuple[str, ...], list[tuple[int, int]]] = {}
    toks = {d: t.split() for d, t in docs}
    for d, t in sorted(toks.items()):
        for i in range(len(t) - k + 1):
            occ.setdefault(tuple(t[i:i + k]), []).append((d, i))
    out = {}
    for d, t in toks.items():
        covered = np.zeros(len(t), bool)
        for gram, places in occ.items():
            if len(places) < 2:
                continue
            first = min(places)
            for (dd, i) in places:
                if dd != d:
                    continue
                if keep_first and (dd, i) == first:
                    continue
                covered[i:i + k] = True
        kept = [w for w, c in zip(t, covered) if not c]
        out[d] = (" ".join(kept), len(t), int(covered.sum()))
    return out


def run_op(docs, k, keep_first, nb=4):
    ds = rd.from_pandas(pd.DataFrame(
        [{"doc_id": d, "text": t} for d, t in docs])).repartition(3)
    got = remove_dup_spans(ds, k=k, keep_first=keep_first, nb=nb).to_pandas()
    return {r.doc_id: (r.text, r.n_tokens, r.n_removed)
            for r in got.itertuples()}


def _vocab_doc(rng, tag: str, n: int) -> str:
    return " ".join(f"{tag}{rng.integers(0, 10**9)}" for _ in range(n))


def test_planted_passage_keep_first(ray_session):
    rng = np.random.default_rng(42)
    passage = " ".join(f"dup{i}" for i in range(30))
    docs = []
    for d in range(8):
        body = _vocab_doc(rng, f"u{d}x", 40)
        docs.append((d, body))
    # plant the same 30-token passage into docs 2, 5, 7 at varied offsets
    for d, off in [(2, 0), (5, 17), (7, 40)]:
        t = docs[d][1].split()
        t[off:off] = passage.split()
        docs[d] = (d, " ".join(t))

    got = run_op(docs, k=10, keep_first=True)
    want = brute_force(docs, 10, True)
    assert got == want
    # doc 2 (globally first) keeps the passage; 5 and 7 lose exactly it
    assert "dup0" in got[2][0] and got[2][2] == 0
    for d in (5, 7):
        assert "dup0" not in got[d][0]
        assert got[d][2] == 30
        assert got[d][1] == 70
    # untouched docs unchanged
    for d in (0, 1, 3, 4, 6):
        assert got[d] == (docs[d][1], 40, 0)


def test_planted_passage_remove_all(ray_session):
    rng = np.random.default_rng(7)
    passage = " ".join(f"dup{i}" for i in range(25))
    docs = [(d, _vocab_doc(rng, f"v{d}x", 30)) for d in range(4)]
    for d in (1, 3):
        docs[d] = (d, docs[d][1] + " " + passage)
    got = run_op(docs, k=8, keep_first=False)
    assert got == brute_force(docs, 8, False)
    for d in (1, 3):
        assert "dup0" not in got[d][0]


def test_intra_doc_repeat_and_short_docs(ray_session):
    # a doc repeating its own phrase twice, a doc shorter than k,
    # an empty doc, and a null text
    phrase = " ".join(f"p{i}" for i in range(12))
    docs = [
        (0, phrase + " filler0 filler1 " + phrase),
        (1, "tiny doc"),
        (2, ""),
    ]
    ds = rd.from_pandas(pd.DataFrame(
        [{"doc_id": d, "text": t} for d, t in docs]
        + [{"doc_id": 3, "text": None}]))
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed)
           for r in remove_dup_spans(ds, k=6, keep_first=True).to_pandas()
           .itertuples()}
    want = brute_force(docs, 6, True)
    assert {d: got[d] for d in (0, 1, 2)} == want
    assert got[3] == ("", 0, 0)
    # the second copy of the phrase was removed, the first kept
    assert got[0][2] == 12


def test_fuzz_brute_force_parity(ray_session):
    for seed in range(3):
        rng = np.random.default_rng(1000 + seed)
        # small shared vocabulary forces organic window collisions
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for d in range(12):
            n = int(rng.integers(0, 25))
            docs.append((d, " ".join(rng.choice(vocab, n))))
        for k in (3, 5):
            for keep_first in (True, False):
                got = run_op(docs, k, keep_first, nb=3)
                assert got == brute_force(docs, k, keep_first), \
                    (seed, k, keep_first)


def test_k_validation(ray_session):
    with pytest.raises(ValueError, match="k must be"):
        remove_dup_spans(rd.from_items([{"doc_id": 1, "text": "a"}]), k=1)


def test_dedup_lines_fuzz_duckdb(ray_session):
    """Randomized corpus (dup lines across docs, empty segments, null
    texts) vs the full SQL twin, both keep modes."""
    import duckdb

    from biosd_feature_annotator_ray.stages.dedup import dedup_lines

    for seed in range(3):
        rng = np.random.default_rng(500 + seed)
        lines_pool = [f"line{i}" for i in range(8)] + ["", "shared body"]
        rows = []
        for d in range(15):
            if rng.random() < 0.1:
                rows.append({"doc_id": d, "text": None})
                continue
            n = int(rng.integers(0, 6))
            rows.append({"doc_id": d,
                         "text": ".".join(rng.choice(lines_pool, n))})
        df = pd.DataFrame(rows)
        ds = rd.from_pandas(df).repartition(4)
        for keep_first in (True, False):
            got = (dedup_lines(ds, sep=".", keep_first=keep_first, nb=3)
                   .to_pandas().sort_values("doc_id")
                   .reset_index(drop=True))
            keep_pred = "cnt = 1 OR rn = 1" if keep_first else "cnt = 1"
            drop_pred = ("cnt > 1 AND rn > 1" if keep_first else "cnt > 1")
            want = duckdb.sql(f"""
                WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM df),
                l AS (SELECT doc_id, unnest(string_split(text, '.')) AS line,
                  unnest(range(1, len(string_split(text, '.')) + 1)) AS ord
                  FROM d),
                ranked AS (SELECT doc_id, ord, line,
                  row_number() OVER (PARTITION BY line ORDER BY doc_id, ord)
                    AS rn,
                  count(*) OVER (PARTITION BY line) AS cnt FROM l)
                SELECT doc_id,
                  coalesce(string_agg(line, '.' ORDER BY ord)
                    FILTER (WHERE {keep_pred}), '') AS text,
                  CAST(count(*) AS BIGINT) AS n_lines,
                  CAST(count(*) FILTER (WHERE {drop_pred}) AS BIGINT)
                    AS n_removed
                FROM ranked GROUP BY doc_id ORDER BY doc_id""").df()
            pd.testing.assert_frame_equal(got, want)


def test_dedup_lines_min_count(ray_session):
    from biosd_feature_annotator_ray.stages.dedup import dedup_lines

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a\nb", "a\nc", "a\nb"],
    })
    ds = rd.from_pandas(df)
    # min_count=3: only 'a' (3 occurrences) dedups, 'b' (2) survives
    got = (dedup_lines(ds, sep="\n", min_count=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["text"].tolist() == ["a\nb", "c", "b"]
    assert got["n_removed"].tolist() == [0, 1, 1]
    with pytest.raises(ValueError, match="min_count"):
        dedup_lines(ds, min_count=1)
