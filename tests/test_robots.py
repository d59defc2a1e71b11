"""robots.txt parsing + RFC-9309 longest-match filtering
(functions/robots.py): parse pins + a brute-force parity fuzz."""

from __future__ import annotations

import random

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.functions.robots import (
    parse_robots_rules,
    robots_filter,
)


def _rules(doc, agent="*"):
    t = pa.table({"host": ["h"], "robots_txt": [doc]})
    return [(r["allow"], r["prefix"]) for r in
            parse_robots_rules(t, agent=agent).to_pylist()]


class TestParse:
    def test_basic_section(self):
        doc = ("User-agent: *\nDisallow: /a\nAllow: /a/b\n"
               "# comment\nSitemap: ignored\n")
        assert _rules(doc) == [(False, "/a"), (True, "/a/b")]

    def test_specific_agent_wins_over_star(self):
        doc = ("User-agent: mybot\nDisallow: /only-mybot\n\n"
               "User-agent: *\nDisallow: /everyone\n")
        assert _rules(doc, agent="mybot") == [(False, "/only-mybot")]
        assert _rules(doc) == [(False, "/everyone")]

    def test_multi_agent_section_and_case(self):
        doc = ("user-AGENT: A\nUser-agent: B\ndisallow: /x\n")
        assert _rules(doc, agent="b") == [(False, "/x")]

    def test_empty_disallow_yields_no_rule(self):
        assert _rules("User-agent: *\nDisallow:\n") == []

    def test_no_matching_section(self):
        assert _rules("User-agent: other\nDisallow: /\n") == []

    def test_bytes_and_null_docs(self):
        t = pa.table({"host": ["a", "b"],
                      "robots_txt": pa.array(
                          [b"User-agent: *\nDisallow: /x\n", None],
                          pa.binary())})
        got = parse_robots_rules(t).to_pylist()
        assert got == [{"host": "a", "allow": False, "prefix": "/x"}]


def _filter(urls, rules_rows, **kw):
    rules = pa.table({
        "host": pa.array([r[0] for r in rules_rows], pa.string()),
        "allow": pa.array([r[1] for r in rules_rows], pa.bool_()),
        "prefix": pa.array([r[2] for r in rules_rows], pa.string()),
    })
    u = pa.table({"url": pa.array(urls, pa.string())})
    out = robots_filter(rd.from_arrow(u).repartition(2),
                        rd.from_arrow(rules).repartition(2),
                        nb=4, keep_blocked=True, **kw)
    return {r["url"]: r["allowed"]
            for r in out.to_pandas().to_dict("records")}


class TestFilter:
    def test_longest_match_and_allow_tiebreak(self):
        rules = [("h.test", False, "/a"), ("h.test", True, "/a/b"),
                 ("h.test", True, "/c"), ("h.test", False, "/c")]
        got = _filter(["https://h.test/a/x", "https://h.test/a/b/x",
                       "https://h.test/c/x", "https://h.test/d"],
                      rules)
        assert got == {
            "https://h.test/a/x": False,
            "https://h.test/a/b/x": True,
            "https://h.test/c/x": True,   # equal length → allow wins
            "https://h.test/d": True,
        }

    def test_unknown_host_allowed(self):
        got = _filter(["https://other.test/x"],
                      [("h.test", False, "/")])
        assert got == {"https://other.test/x": True}

    def test_keep_blocked_false_drops(self):
        rules = pa.table({"host": ["h.test"], "allow": [False],
                          "prefix": ["/"]})
        u = pa.table({"url": ["https://h.test/x", "https://ok.test/y"]})
        out = robots_filter(rd.from_arrow(u), rd.from_arrow(rules), nb=4)
        assert [r["url"] for r in out.to_pandas().to_dict("records")] \
            == ["https://ok.test/y"]

    def test_fuzz_vs_bruteforce(self):
        rng = random.Random(409)
        prefixes = ["/", "/a", "/a/b", "/ab", "/c/d", "/tmp", ""]
        hosts = [f"h{j}.test" for j in range(5)]
        rules_rows = []
        for h in hosts[:4]:  # h4 has no rules
            for _ in range(rng.randrange(0, 5)):
                rules_rows.append(
                    (h, rng.random() < 0.5, rng.choice(prefixes)))
        urls = []
        for i in range(200):
            h = rng.choice(hosts)
            path = rng.choice(
                ["", "/", "/a", "/a/bx", "/ab/z", "/c", "/c/d/e",
                 "/tmp1", f"/p{i}"])
            urls.append(f"https://{h}{path}")
        urls = sorted(set(urls))
        got = _filter(urls, rules_rows)

        def brute(url):
            host = url.split("://")[1].split("/")[0]
            path = url[len("https://" + host):]
            best = None  # (len, allow)
            for h, allow, pre in rules_rows:
                if h != host or not path.startswith(pre):
                    continue
                cand = (len(pre), allow)
                if best is None or cand > best:
                    best = cand
            return True if best is None else best[1]

        assert got == {u: brute(u) for u in urls}


class TestSitemap:
    def test_urlset_with_and_without_lastmod(self):
        from biosd_feature_annotator_ray.functions.robots import (
            parse_sitemap_urls,
        )

        xml = ('<?xml version="1.0"?><urlset>'
               "<url><loc> https://h.test/a </loc>"
               "<lastmod>2024-01-02</lastmod></url>"
               "<url><loc>https://h.test/b</loc></url></urlset>")
        t = pa.table({"host": ["h.test"], "sitemap_xml": [xml]})
        got = parse_sitemap_urls(t).to_pylist()
        assert got == [
            {"host": "h.test", "loc": "https://h.test/a",
             "lastmod": "2024-01-02"},
            {"host": "h.test", "loc": "https://h.test/b",
             "lastmod": None},
        ]

    def test_sitemapindex_and_null_doc(self):
        from biosd_feature_annotator_ray.functions.robots import (
            parse_sitemap_urls,
        )

        idx = ("<sitemapindex><sitemap>"
               "<loc>https://h.test/sm1.xml</loc></sitemap>"
               "<sitemap><loc>https://h.test/sm2.xml</loc></sitemap>"
               "</sitemapindex>")
        t = pa.table({"host": ["h.test", "x"],
                      "sitemap_xml": [idx, None]})
        got = parse_sitemap_urls(t).to_pylist()
        assert [r["loc"] for r in got] == [
            "https://h.test/sm1.xml", "https://h.test/sm2.xml"]
        assert all(r["lastmod"] is None for r in got)

    def test_lastmod_pairing_is_per_url_block(self):
        from biosd_feature_annotator_ray.functions.robots import (
            parse_sitemap_urls,
        )

        # lastmod of the SECOND block must not leak onto the first loc
        xml = ("<urlset><url><loc>https://h/a</loc></url>"
               "<url><loc>https://h/b</loc>"
               "<lastmod>2024-05-06</lastmod></url></urlset>")
        t = pa.table({"host": ["h"], "sitemap_xml": [xml]})
        got = {r["loc"]: r["lastmod"]
               for r in parse_sitemap_urls(t).to_pylist()}
        assert got == {"https://h/a": None, "https://h/b": "2024-05-06"}


def test_parse_feed_entries_rss_atom_and_misses():
    import pyarrow as pa

    from biosd_feature_annotator_ray.functions.robots import (
        parse_feed_entries)

    rss = ("<rss><channel><item><title> Post One </title>"
           "<link>https://ex.org/p1</link>"
           "<pubDate>Mon, 01 Jan 2024</pubDate></item>"
           "<item><title>Two</title></item></channel></rss>")
    atom = ('<feed><entry><title>A1</title>'
            '<link href="https://ex.org/a1" rel="alternate"/>'
            '<updated>2024-02-03</updated></entry></feed>')
    t = pa.table({"url": ["u1", "u2", "u3", "u4"],
                  "feed_xml": [rss, atom.encode(), "", None]})
    got = parse_feed_entries(t).to_pylist()
    assert got == [
        {"url": "u1", "title": "Post One", "link": "https://ex.org/p1",
         "published": "Mon, 01 Jan 2024"},
        {"url": "u1", "title": "Two", "link": None, "published": None},
        {"url": "u2", "title": "A1", "link": "https://ex.org/a1",
         "published": "2024-02-03"},
    ]
