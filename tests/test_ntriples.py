"""N-Triples sink/source (sources/ntriples.py): escaping round-trips,
term typing, idempotent rewrite, malformed-line failure."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.sources.ntriples import (
    parse_ntriples,
    read_ntriples,
    serialize_ntriples,
    write_ntriples,
)

NASTY = 'Ada "the first"\nprogrammer\t\\end\\n not-an-escape\r'


def _triples(rows):
    return pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "obj_kind": pa.array([r[3] for r in rows], pa.string()),
    })


class TestSerialize:
    def test_term_typing_with_kind_column(self):
        t = _triples([
            ("https://e/1", "knows", "https://e/2", "uri"),
            ("https://e/1", "name", "https://looks-like-iri/x", "string"),
            ("_:b0", "label", "plain", "string"),
            ("https://e/2", "same", "_:b0", "bnode"),
        ])
        lines = serialize_ntriples(t, obj_kind_col="obj_kind").to_pylist()
        assert lines == [
            "<https://e/1> <knows> <https://e/2> .",
            '<https://e/1> <name> "https://looks-like-iri/x" .',
            '_:b0 <label> "plain" .',
            "<https://e/2> <same> _:b0 .",
        ]

    def test_heuristic_typing_without_kind_column(self):
        t = _triples([("s", "p", "https://e/2", ""),
                      ("s", "p", "word", "")]).drop_columns(["obj_kind"])
        lines = serialize_ntriples(t).to_pylist()
        assert lines == ["<s> <p> <https://e/2> .",
                         '<s> <p> "word" .']

    def test_escapes(self):
        t = _triples([("s", "p", NASTY, "string")])
        [line] = serialize_ntriples(t, obj_kind_col="obj_kind").to_pylist()
        assert "\n" not in line and "\r" not in line and "\t" not in line
        assert '\\"the first\\"' in line and "\\\\end" in line


class TestRoundTrip:
    def test_write_read_round_trip(self, tmp_path):
        rows = [
            ("https://kg.test/e/1", "name", NASTY, "string"),
            ("https://kg.test/e/1", "knows", "https://kg.test/e/2", "uri"),
            ("_:b0", "label", "blank subject", "string"),
            ("https://kg.test/e/2", "sameAs", "_:b0", "bnode"),
        ]
        t = _triples(rows)
        out = str(tmp_path / "nt")
        man = write_ntriples(rd.from_arrow(t).repartition(2), out,
                             obj_kind_col="obj_kind")
        assert man.to_pandas()["n_triples"].sum() == 4
        back = (read_ntriples(out).to_pandas()
                .sort_values(["subj", "pred"]).reset_index(drop=True))
        orig = (t.to_pandas().sort_values(["subj", "pred"])
                .reset_index(drop=True))
        assert list(back["subj"]) == list(orig["subj"])
        assert list(back["obj"]) == list(orig["obj"])
        assert list(back["obj_kind"]) == ["string", "uri", "string",
                                          "bnode"]

    def test_idempotent_rewrite(self, tmp_path):
        t = _triples([("s", "p", "o", "string")])
        out = str(tmp_path / "nt")
        write_ntriples(rd.from_arrow(t), out, obj_kind_col="obj_kind")
        files1 = sorted(glob.glob(os.path.join(out, "*.nt")))
        write_ntriples(rd.from_arrow(t), out, obj_kind_col="obj_kind")
        assert sorted(glob.glob(os.path.join(out, "*.nt"))) == files1


class TestParse:
    def test_comments_and_blanks_dropped(self):
        t = pa.table({"text": pa.array(
            ["# comment", "", "  ", '<s> <p> "o" .'], pa.string())})
        assert parse_ntriples(t).num_rows == 1

    def test_malformed_raises(self):
        t = pa.table({"text": pa.array(["not a triple"], pa.string())})
        with pytest.raises(ValueError, match="malformed"):
            parse_ntriples(t)

    def test_escaped_backslash_before_n_round_trips(self):
        # '\\n' in the source must parse back to backslash+n, not newline
        t = pa.table({"text": pa.array(
            ['<s> <p> "a\\\\nb" .'], pa.string())})
        assert parse_ntriples(t).to_pylist()[0]["obj"] == "a\\nb"


class TestReviewRegressions:
    def test_kind_column_is_authoritative_for_bnode_lookalikes(self):
        t = _triples([("https://s/1", "note", "_:b0 looks like a bnode",
                       "string"),
                      ("https://s/1", "same", "_:b0", "bnode")])
        lines = serialize_ntriples(t, obj_kind_col="obj_kind").to_pylist()
        assert lines == [
            '<https://s/1> <note> "_:b0 looks like a bnode" .',
            "<https://s/1> <same> _:b0 .",
        ]
        back = parse_ntriples(pa.table({"text": pa.array(lines)}))
        assert [r["obj_kind"] for r in back.to_pylist()] == [
            "string", "bnode"]
        assert back.to_pylist()[0]["obj"] == "_:b0 looks like a bnode"

    def test_identical_blocks_no_tmp_collision(self, tmp_path):
        # two partitions with byte-identical content write concurrently
        t = _triples([("s", "p", "o", "string")] * 2)
        out = str(tmp_path / "nt")
        man = write_ntriples(
            rd.from_arrow(t).repartition(2), out,
            obj_kind_col="obj_kind")
        assert len(man.to_pandas()) == 2  # both tasks succeeded
        assert len(glob.glob(os.path.join(out, "*.nt"))) == 1
        assert glob.glob(os.path.join(out, "*.tmp")) == []
