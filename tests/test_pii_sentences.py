"""PII kernels (functions/pii.py) and sentence segmentation
(textstats.split_sentences): example pins + randomized DuckDB fuzz."""

from __future__ import annotations

import random

import pyarrow as pa

from biosd_feature_annotator_ray.functions.pii import detect_pii, redact_pii
from biosd_feature_annotator_ray.stages.textstats import split_sentences


def _pii(texts):
    t = pa.table({"text": pa.array(texts, pa.string())})
    return redact_pii(detect_pii(t)).to_pylist()


class TestPii:
    def test_each_class(self):
        rows = _pii([
            "write to a.b+c@mail-host.org today",
            "card 4111 1111 1111 0042 on file",
            "call +1 (555) 010-7788 now",
            "host 192.168.0.1 up",
            "nothing here",
        ])
        assert [r["n_email"] for r in rows] == [1, 0, 0, 0, 0]
        assert [r["n_cc"] for r in rows] == [0, 1, 0, 0, 0]
        assert [r["n_phone"] for r in rows] == [0, 0, 1, 0, 0]
        assert [r["n_ip"] for r in rows] == [0, 0, 0, 1, 0]
        assert rows[0]["text_redacted"] == "write to [EMAIL] today"
        assert rows[1]["text_redacted"] == "card [CC] on file"
        assert rows[2]["text_redacted"] == "call [PHONE] now"
        assert rows[3]["text_redacted"] == "host [IP] up"
        assert rows[4]["text_redacted"] == "nothing here"

    def test_cc_masked_before_phone_can_bite(self):
        [r] = _pii(["4111 1111 1111 0042"])
        assert r["text_redacted"] == "[CC]"

    def test_ip_with_3digit_octets_masked_as_ip_not_phone(self):
        [r] = _pii(["Server at 192.168.100.200 responded"])
        assert r["n_ip"] == 1
        assert r["text_redacted"] == "Server at [IP] responded"

    def test_counts_on_original_text_per_class(self):
        # two emails and one ip in one doc
        [r] = _pii(["a@b.co c@d.io at 10.0.0.1"])
        assert (r["n_email"], r["n_ip"]) == (2, 1)
        assert r["text_redacted"] == "[EMAIL] [EMAIL] at [IP]"

    def test_null_text(self):
        [r] = _pii([None])
        assert r["n_email"] is None and r["text_redacted"] is None


def _sents(texts, ids=None):
    t = pa.table({
        "doc_id": pa.array(ids or list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return split_sentences(t).to_pylist()


class TestSplitSentences:
    def test_basic(self):
        rows = _sents(["One two. Three!  Four five?"])
        assert [(r["sent_idx"], r["sentence"], r["n_tokens"], r["n_chars"])
                for r in rows] == [
            (0, "One two", 2, 7), (1, "Three", 1, 5), (2, "Four five?", 2, 10)]

    def test_no_terminator_is_one_sentence(self):
        rows = _sents(["just words no stop"])
        assert [(r["sent_idx"], r["sentence"]) for r in rows] == [
            (0, "just words no stop")]

    def test_terminator_runs_and_empty_segments(self):
        # "...  " at end-of-string is terminator+whitespace → a split
        # point, so the dots are consumed and the empty tail dropped.
        rows = _sents(["Hm?!  Yes...  ", "   ", "Dots... end"])
        assert [(r["doc_id"], r["sent_idx"], r["sentence"])
                for r in rows] == [(0, 0, "Hm"), (0, 1, "Yes"),
                                   (2, 0, "Dots"), (2, 1, "end")]

    def test_null_and_empty_text_emit_nothing(self):
        assert _sents([None, ""]) == []

    def test_sent_idx_restarts_per_doc(self):
        rows = _sents(["A. B.", "C. D."])
        assert [(r["doc_id"], r["sent_idx"]) for r in rows] == [
            (0, 0), (0, 1), (1, 0), (1, 1)]

    def test_fuzz_vs_duckdb(self):
        import duckdb

        rng = random.Random(405)
        words = ["aa", "bb", "cc", "dd", " ", "", "x!", "?"]
        terms = [". ", "! ", "?  ", "?! ", ".", " ", ""]
        texts = []
        for _ in range(150):
            parts = []
            for _ in range(rng.randrange(0, 8)):
                parts.append(" ".join(rng.choices(words,
                                                  k=rng.randrange(0, 4))))
                parts.append(rng.choice(terms))
            texts.append("".join(parts) or None)
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        eng = sorted(tuple(r.values())
                     for r in split_sentences(tbl).to_pylist())
        want = sorted(tuple(r) for r in duckdb.sql(
            "WITH aug AS (SELECT doc_id, coalesce(text,'') AS t FROM tbl),"
            " segs AS (SELECT doc_id,"
            "  unnest(string_split_regex(t, '[.!?]+\\s+')) AS s,"
            "  unnest(range(len(string_split_regex(t, '[.!?]+\\s+'))))"
            "   AS raw_idx FROM aug),"
            " kept AS (SELECT doc_id, trim(s) AS sentence, raw_idx"
            "  FROM segs WHERE trim(s) <> '')"
            " SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id"
            "  ORDER BY raw_idx) - 1 AS INTEGER), sentence,"
            " CAST(len(regexp_extract_all(sentence, '\\S+')) AS INTEGER),"
            " CAST(length(sentence) AS INTEGER) FROM kept"
        ).fetchall())
        assert eng == want

    def test_fuzz_pii_vs_duckdb(self):
        import duckdb

        rng = random.Random(406)
        frags = ["a@b.co", "x.y@mail.org", "4111 1111 1111 0042",
                 "+44 (201) 555-33", "10.0.0.1", "1.2.3.4.5", "plain",
                 "a@b", "555-010-1234", "@", "4111-1111-1111-0042x"]
        texts = [" ".join(rng.choices(frags, k=rng.randrange(0, 6)))
                 for _ in range(200)]
        tbl = pa.table({"text": pa.array(texts, pa.string())})
        eng = [(r["n_email"], r["n_cc"], r["n_phone"], r["n_ip"],
                r["text_redacted"])
               for r in redact_pii(detect_pii(tbl)).to_pylist()]
        want = duckdb.sql(
            "SELECT CAST(len(regexp_extract_all(text,"
            " '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}'))"
            "  AS INTEGER),"
            " CAST(len(regexp_extract_all(text,"
            " '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b')) AS INTEGER),"
            " CAST(len(regexp_extract_all(text,"
            " '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]\\d{2,4}'))"
            "  AS INTEGER),"
            " CAST(len(regexp_extract_all(text,"
            " '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS INTEGER),"
            " regexp_replace(regexp_replace(regexp_replace(regexp_replace("
            "  text, '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}',"
            "  '[EMAIL]', 'g'),"
            "  '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b', '[CC]', 'g'),"
            "  '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IP]', 'g'),"
            "  '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]\\d{2,4}',"
            "  '[PHONE]', 'g')"
            " FROM tbl").fetchall()
        assert eng == [tuple(w) for w in want]
