"""remove_boilerplate (stages/dedup.py): per-group frequent-line
removal — pins + a randomized DuckDB parity fuzz."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.stages.dedup import remove_boilerplate


def _ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(2)


def _run(rows, **kw):
    out = remove_boilerplate(_ds(rows), group_col="source", **kw)
    return {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in out.to_pandas().to_dict("records")}


class TestRemoveBoilerplate:
    def test_min_docs_within_group_only(self):
        got = _run([
            (0, "a", "nav\nx1\nfoot"), (1, "a", "nav\nx2\nfoot"),
            (2, "a", "nav\nx3"), (3, "a", "y1\nfoot"),
            (4, "b", "nav\nz1"), (5, "b", "z2"),
        ], min_docs=3)
        assert got[0] == ("x1", 3, 2)
        assert got[3] == ("y1", 2, 1)
        assert got[4] == ("nav\nz1", 2, 0)  # group b: nav in 1 doc only

    def test_all_occurrences_removed_no_keep_first(self):
        got = _run([(0, "a", "nav"), (1, "a", "nav"), (2, "a", "nav")],
                   min_docs=3)
        assert got == {0: ("", 1, 1), 1: ("", 1, 1), 2: ("", 1, 1)}

    def test_repeat_within_one_doc_counts_once(self):
        # 'x' twice in doc 0 but only 2 distinct docs contain it
        got = _run([(0, "a", "x\nx"), (1, "a", "x"), (2, "a", "y")],
                   min_docs=3)
        assert got[0] == ("x\nx", 2, 0)

    def test_min_frac_threshold(self):
        # group of 4 docs, frac 0.5 → threshold max(2, 2) = 2
        got = _run([(0, "a", "hdr\np0"), (1, "a", "hdr\np1"),
                    (2, "a", "p2"), (3, "a", "p3")],
                   min_docs=2, min_frac=0.5)
        assert got[0] == ("p0", 2, 1) and got[2] == ("p2", 1, 0)

    def test_null_text_and_source(self):
        got = _run([(0, "a", None), (1, None, "x"), (2, None, "x")],
                   min_docs=2)
        assert got[0] == ("", 1, 0)
        assert got[1] == ("", 1, 1)  # null sources group together

    def test_null_source_min_frac_threshold(self):
        # null group of 4 docs with min_frac 0.75 → threshold
        # max(2, 3) = 3: 'hdr' (3 docs) removed, 'x' (2 docs) kept —
        # the threshold lookup must coalesce null keys like the census
        got = _run([(0, None, "hdr\nx"), (1, None, "hdr\nx"),
                    (2, None, "hdr"), (3, None, "y")],
                   min_docs=2, min_frac=0.75)
        assert got[0] == ("x", 2, 1)
        assert got[3] == ("y", 1, 0)

    def test_min_docs_validation(self):
        with pytest.raises(ValueError, match="min_docs"):
            remove_boilerplate(_ds([(0, "a", "x")]), min_docs=1)

    def test_fuzz_vs_duckdb(self):
        import duckdb

        rng = random.Random(407)
        lines = ["nav", "foot", "p1", "p2", "p3", "", "x y"]
        rows = []
        for i in range(120):
            src = f"s{rng.randrange(4)}"
            txt = "\n".join(rng.choices(lines, k=rng.randrange(0, 6))) \
                if rng.random() > 0.05 else None
            rows.append((i, src, txt))
        got = _run(rows, min_docs=3, min_frac=0.4)
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
        want = duckdb.sql(r"""
WITH docs2 AS (SELECT doc_id, coalesce(source,'') AS source,
  coalesce(text,'') AS t FROM tbl),
seg AS (SELECT doc_id, source,
  unnest(string_split(t, chr(10))) AS line,
  unnest(range(len(string_split(t, chr(10))))) AS pos FROM docs2),
tot AS (SELECT source, count(*) AS n_docs FROM docs2 GROUP BY source),
census AS (SELECT source, line, count(DISTINCT doc_id) AS nd
  FROM seg GROUP BY 1, 2),
boiler AS (SELECT census.source, line FROM census JOIN tot USING (source)
  WHERE nd >= greatest(3, CAST(ceil(0.4 * n_docs) AS BIGINT))),
kept AS (SELECT seg.doc_id, seg.pos, seg.line FROM seg
  LEFT JOIN boiler ON seg.source = boiler.source
   AND seg.line = boiler.line WHERE boiler.line IS NULL),
recon AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
  count(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.text, '') AS text,
 len(string_split(d.t, chr(10))) AS n_lines,
 len(string_split(d.t, chr(10))) - coalesce(r.n_kept, 0) AS n_removed
FROM docs2 d LEFT JOIN recon r USING (doc_id)""").fetchall()
        want = {r[0]: (r[1], r[2], r[3]) for r in want}
        assert got == want
