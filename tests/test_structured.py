"""Structured-data extraction (stages/structured.py): JSON-LD,
OpenGraph meta, microdata — example pins + a randomized DuckDB
parity fuzz for the flat-object JSON-LD path."""

from __future__ import annotations

import json
import random

import pyarrow as pa
import pytest

from biosd_feature_annotator_ray.stages.structured import (
    extract_jsonld,
    extract_meta_properties,
    extract_microdata,
)


def _t(url_html):
    return pa.table({
        "url": pa.array([u for u, _ in url_html], pa.string()),
        "html": pa.array([h for _, h in url_html], pa.string()),
    })


def _triples(tbl):
    return sorted(
        (r["url"], r["subj"], r["pred"], r["obj"]) for r in tbl.to_pylist())


class TestJsonLd:
    def test_flat_entity(self):
        h = ('<script type="application/ld+json">{"@context":"c",'
             '"@id":"e1","@type":"Person","name":"Ada","n":3,'
             '"ok":true,"nul":null}</script>')
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert got == [
            ("u", "e1", "@type", "Person"),
            ("u", "e1", "n", "3"),
            ("u", "e1", "name", "Ada"),
            ("u", "e1", "ok", "true"),
        ]

    def test_nested_object_links_and_recurses(self):
        h = ('<script type="application/ld+json">{"@id":"e1",'
             '"worksFor":{"@type":"Org","name":"X"}}</script>')
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert ("u", "e1", "worksFor", "e1/worksFor") in got
        assert ("u", "e1/worksFor", "@type", "Org") in got
        assert ("u", "e1/worksFor", "name", "X") in got

    def test_nested_object_keeps_its_own_id(self):
        h = ('<script type="application/ld+json">{"@id":"e1",'
             '"knows":{"@id":"e2","name":"B"}}</script>')
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert ("u", "e1", "knows", "e2") in got
        assert ("u", "e2", "name", "B") in got

    def test_max_depth_bounds_recursion(self):
        h = ('<script type="application/ld+json">{"@id":"e1",'
             '"a":{"b":{"c":{"d":{"e":"deep"}}}}}</script>')
        got = _triples(extract_jsonld(_t([("u", h)]), max_depth=2))
        # depth 0 emits the link a; depth 1 the link b; depth 2 stops.
        preds = {p for (_, _, p, _) in got}
        assert "a" in preds and "b" in preds and "c" not in preds

    def test_top_level_array_and_graph_and_type_list(self):
        h = ('<script type="application/ld+json">[{"@id":"a",'
             '"@type":["T1","T2"],"x":"y"},'
             '{"@graph":[{"@id":"b","z":1}]}]</script>')
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert got == [
            ("u", "a", "@type", "T1"),
            ("u", "a", "@type", "T2"),
            ("u", "a", "x", "y"),
            ("u", "b", "z", "1"),
        ]

    def test_blank_node_per_block_and_object(self):
        h = ('<script type="application/ld+json">{"x":"1"}</script>'
             '<script type="application/ld+json">[{"y":"2"},{"y":"3"}]'
             "</script>")
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert got == [
            ("u", "_:u#0.0", "x", "1"),
            ("u", "_:u#1.0", "y", "2"),
            ("u", "_:u#1.1", "y", "3"),
        ]

    def test_bad_json_missing_block_and_null_html(self):
        rows = [("u1", '<script type="application/ld+json">{bad</script>'),
                ("u2", "<p>nothing</p>")]
        tbl = pa.table({
            "url": pa.array(["u1", "u2", "u3"], pa.string()),
            "html": pa.array([rows[0][1], rows[1][1], None], pa.string()),
        })
        assert extract_jsonld(tbl).num_rows == 0

    def test_binary_html_column(self):
        h = ('<script type="application/ld+json">{"@id":"e","k":"v"}'
             "</script>").encode()
        tbl = pa.table({"url": pa.array(["u"], pa.string()),
                        "html": pa.array([h], pa.binary())})
        assert _triples(extract_jsonld(tbl)) == [("u", "e", "k", "v")]

    def test_fuzz_flat_objects_vs_duckdb(self):
        """Random flat JSON-LD objects: engine triples must equal a
        DuckDB json_keys/json_extract re-extraction of the same
        blocks."""
        import duckdb

        rng = random.Random(404)
        keys = ["name", "alt", "rank", "score", "flag", "tags", "note"]
        urls, htmls, raws = [], [], []
        for i in range(120):
            obj: dict = {"@id": f"e{rng.randrange(30)}"}
            if rng.random() < 0.7:
                obj["@type"] = rng.choice(["A", "B", "C"])
            for k in rng.sample(keys, rng.randrange(0, 5)):
                r = rng.random()
                if r < 0.4:
                    obj[k] = f"v{rng.randrange(50)} x"
                elif r < 0.6:
                    obj[k] = rng.randrange(-100, 100)
                elif r < 0.75:
                    obj[k] = rng.random() < 0.5
                else:
                    obj[k] = [f"s{rng.randrange(5)}"
                              for _ in range(rng.randrange(1, 4))]
            raw = json.dumps(obj)
            urls.append(f"u{i}")
            raws.append(raw)
            htmls.append('<em>x</em><script type="application/ld+json">'
                         + raw + "</script>")
        tbl = pa.table({"url": pa.array(urls, pa.string()),
                        "html": pa.array(htmls, pa.string())})
        got = _triples(extract_jsonld(tbl))

        blocks = pa.table({"url": pa.array(urls, pa.string()),
                           "raw": pa.array(raws, pa.string())})
        want = sorted(
            tuple(r) for r in duckdb.sql(
                "WITH valid AS (SELECT url, raw,"
                " json_extract_string(raw, '$.\"@id\"') AS subj FROM blocks"
                " WHERE json_valid(raw)),"
                " keyed AS (SELECT url, subj, raw,"
                "  unnest(json_keys(raw)) AS k FROM valid)"
                " SELECT url, subj, k, json_extract_string(raw,"
                "  '$.\"' || k || '\"') FROM keyed"
                " WHERE k NOT IN ('@context','@id')"
                "  AND json_type(raw, '$.\"' || k || '\"') <> 'ARRAY'"
                " UNION ALL SELECT url, subj, k,"
                "  unnest(from_json(json_extract(raw, '$.\"' || k || '\"'),"
                "   '[\"varchar\"]')) FROM keyed"
                " WHERE k NOT IN ('@context','@id')"
                "  AND json_type(raw, '$.\"' || k || '\"') = 'ARRAY'"
            ).fetchall())
        assert got == want


class TestMetaProperties:
    def test_both_attribute_orders_and_prefix(self):
        h = ('<meta property="og:a" content="1">'
             '<meta content="2" property="og:b">'
             '<meta property="tw:c" content="3">'
             '<meta name="viewport" content="x">')
        got = extract_meta_properties(_t([("u", h)])).to_pylist()
        assert got == [
            {"url": "u", "property": "og:a", "content": "1"},
            {"url": "u", "property": "og:b", "content": "2"},
        ]

    def test_prefix_none_keeps_all_property_tags(self):
        h = ('<meta property="og:a" content="1">'
             '<meta property="tw:c" content="3">')
        got = extract_meta_properties(_t([("u", h)]), prefix=None)
        assert [r["property"] for r in got.to_pylist()] == ["og:a", "tw:c"]

    def test_empty_content_and_no_tags(self):
        h = '<meta property="og:a" content="">'
        got = extract_meta_properties(_t([("u", h), ("v", "<p>x</p>")]))
        assert got.to_pylist() == [
            {"url": "u", "property": "og:a", "content": ""}]


class TestMicrodata:
    def test_meta_and_text_forms(self):
        h = ('<span itemprop="name">A   B</span>'
             '<meta itemprop="g" content="f">'
             '<a itemprop="url" href="http://x">prof</a>')
        got = sorted((r["itemprop"], r["value"])
                     for r in extract_microdata(_t([("u", h)])).to_pylist())
        assert got == [("g", "f"), ("name", "A B"), ("url", "prof")]

    def test_meta_tag_not_double_counted(self):
        h = '<meta itemprop="g" content="f">'
        assert extract_microdata(_t([("u", h)])).num_rows == 1


class TestReviewRegressions:
    def test_sibling_idless_objects_stay_distinct(self):
        h = ('<script type="application/ld+json">{"@id":"e1",'
             '"authors":[{"name":"A"},{"name":"B"}]}</script>')
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert ("u", "e1/authors.0", "name", "A") in got
        assert ("u", "e1/authors.1", "name", "B") in got
        links = [o for (_, s, p, o) in got
                 if s == "e1" and p == "authors"]
        assert sorted(links) == ["e1/authors.0", "e1/authors.1"]

    def test_single_idless_object_keeps_plain_label(self):
        h = ('<script type="application/ld+json">{"@id":"e1",'
             '"worksFor":{"name":"X"}}</script>')
        got = _triples(extract_jsonld(_t([("u", h)])))
        assert ("u", "e1", "worksFor", "e1/worksFor") in got


class TestMainText:
    def test_keeps_prose_drops_short_and_link_farms(self):
        from biosd_feature_annotator_ray.stages.structured import (
            extract_main_text,
        )

        h = ('<p>This paragraph has plenty of real content text in it.'
             "</p><p>tiny</p>"
             '<p><a href="/1">all</a> <a href="/2">of this is links '
             "really</a></p>"
             "<p>Good prose with one small <a href='/x'>link</a> "
             "embedded in a long sentence here.</p>")
        [r] = extract_main_text(_t([("u", h)])).to_pylist()
        assert r["n_blocks"] == 4 and r["n_kept"] == 2
        lines = r["main_text"].split("\n")
        assert lines[0].startswith("This paragraph has plenty")
        assert lines[1].startswith("Good prose with one small link")

    def test_whitespace_collapse_and_tag_strip(self):
        from biosd_feature_annotator_ray.stages.structured import (
            extract_main_text,
        )

        h = ("<p>Multi\n  line\t<b>bold</b>   text with enough chars "
             "to keep.</p>")
        [r] = extract_main_text(_t([("u", h)])).to_pylist()
        assert r["main_text"] == ("Multi line bold text with enough "
                                  "chars to keep.")

    def test_no_blocks_and_null_html(self):
        from biosd_feature_annotator_ray.stages.structured import (
            extract_main_text,
        )

        tbl = pa.table({"url": pa.array(["u", "v"], pa.string()),
                        "html": pa.array(["<div>no paras</div>", None],
                                         pa.string())})
        rows = extract_main_text(tbl).to_pylist()
        assert [(r["main_text"], r["n_blocks"]) for r in rows] == [
            ("", 0), ("", 0)]
