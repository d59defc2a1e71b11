"""robots.txt parsing + URL filtering (graft-added, r04).

The crawl-politeness layer a Common-Crawl-style pipeline needs before
anything else touches a URL: parse each host's robots.txt into
(host, rule, prefix) rows and filter a URL table by the RFC-9309
longest-match rule (the longest matching prefix wins; at equal
length Allow beats Disallow; no matching rule ⇒ allowed; a host with
no robots rows ⇒ allowed).

Simplifications (documented, pinned in tests): prefix matching only —
no ``*``/``$`` wildcards — and one agent section per host is selected
up front: the section whose User-agent exactly equals ``agent`` when
present, else the ``*`` section. Section parsing is per-robots-doc
Python (one small doc per host — bounded work per row, the same
budget as the WARC header parser), while the FILTER side is a
bucketed hash join on host plus vectorized prefix matching — that is
the side that scales with the corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def parse_robots_rules(batch: pa.Table, host_col: str = "host",
                       robots_col: str = "robots_txt",
                       agent: str = "*") -> pa.Table:
    """Row-expanding parse: one output row per Allow/Disallow line of
    each host's SELECTED agent section → ``(host, allow: bool,
    prefix)``. An empty Disallow ("Disallow:") means allow-all and
    yields no row; comments (#) and unknown directives are skipped."""
    hosts = batch.column(host_col).to_pylist()
    docs = batch.column(robots_col).to_pylist()
    out_h: list = []
    out_a: list = []
    out_p: list = []
    for host, doc in zip(hosts, docs):
        if not doc:
            continue
        if isinstance(doc, (bytes, bytearray)):
            doc = doc.decode("utf-8", "replace")
        # split into sections: a section = 1+ User-agent lines followed
        # by rule lines; blank lines only separate when between rules
        # and the next User-agent (RFC 9309 grouping)
        sections: list = []  # (agents, rules)
        cur_agents: list = []
        cur_rules: list = []
        in_agents = False
        for raw in doc.split("\n"):
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if not in_agents and (cur_agents or cur_rules):
                    sections.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                cur_agents.append(val.lower())
                in_agents = True
            elif key in ("allow", "disallow"):
                in_agents = False
                cur_rules.append((key == "allow", val))
            elif key == "crawl-delay":
                # a group-member rule for grouping purposes (RFC 9309:
                # a User-agent line after any rule starts a NEW group)
                # even though this parser does not emit it — keeps the
                # section boundaries identical to parse_crawl_delay
                in_agents = False
        if cur_agents or cur_rules:
            sections.append((cur_agents, cur_rules))
        chosen = None
        for agents, rules in sections:
            if agent.lower() in agents:
                chosen = rules
                break
        if chosen is None:
            for agents, rules in sections:
                if "*" in agents:
                    chosen = rules
                    break
        for allow, prefix in chosen or []:
            if not prefix and not allow:
                continue  # "Disallow:" (empty) = allow all → no rule
            out_h.append(host)
            out_a.append(allow)
            out_p.append(prefix)
    return pa.table({
        host_col: pa.array(out_h, pa.string()),
        "allow": pa.array(out_a, pa.bool_()),
        "prefix": pa.array(out_p, pa.string()),
    })


def robots_filter(urls: "ray.data.Dataset", rules: "ray.data.Dataset",
                  url_col: str = "url", host_col: str = "host",
                  nb: int = 32, keep_blocked: bool = False):
    """Filter a URL Dataset by parsed robots rules (RFC-9309 longest
    match). ``urls`` needs ``url_col``; ``rules`` is
    ``(host, allow, prefix)`` from :func:`parse_robots_rules`.
    Returns ``(url, host, allowed)`` rows — all of them with
    ``keep_blocked``, else only the allowed ones.

    Scale shape: ONE bucketed hash join on host (rules are the small
    side per host but NOT globally small — no broadcast), prefix
    matching vectorized per joined batch, then the winning rule per
    url falls out of an ASSOCIATIVE packed-score Max aggregate
    (pack = 2·match_len + allow; no match = −2+allow) — correct even
    when one url's rule rows split across blocks, unlike a
    batch-local argmax."""
    from ray.data.aggregate import Max

    from ..stages.join import shuffle_hash_join
    from .urls import url_host

    def add_host(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column(url_col),
            host_col: url_host(batch.column(url_col)),
        })

    u = urls.map_batches(add_host, batch_format="pyarrow",
                         batch_size=65536)
    joined = shuffle_hash_join(u, rules, on=[host_col], how="left", nb=nb)

    def score_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # path part of the url (everything from the first '/' after
        # the scheme://host, '' when absent)
        path = df["url"].str.replace(
            r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*", "", regex=True)
        has_rule = df["prefix"].notna()
        starts = pd.Series(False, index=df.index)
        if has_rule.any():
            h = df[has_rule]
            starts.loc[has_rule] = [
                p.startswith(pre) for p, pre in
                zip(path[has_rule], h["prefix"])]
        plen = np.nan_to_num(
            df["prefix"].str.len().to_numpy(dtype=np.float64)
        ).astype(np.int64)
        score = np.where(starts.to_numpy(), plen, np.int64(-1))
        allow = (df["allow"].astype("boolean").fillna(True)
                 .to_numpy(dtype=bool))
        pack = score * 2 + allow
        return pa.table({
            "url": pa.array(df["url"].to_numpy(), pa.string()),
            host_col: pa.array(df[host_col].to_numpy(), pa.string()),
            "pack": pa.array(pack, pa.int64()),
        })

    agg = (joined.map_batches(score_rows, batch_format="pyarrow")
           .groupby(["url", host_col])
           .aggregate(Max("pack", alias_name="pack")))

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = batch.column("pack")
        allowed = pc.or_(pc.less(p, 0),
                         pc.equal(pc.bit_wise_and(p, 1), 1))
        return pa.table({
            "url": batch.column("url"),
            host_col: batch.column(host_col),
            "allowed": allowed,
        })

    out = agg.map_batches(decode, batch_format="pyarrow")
    if keep_blocked:
        return out

    def only_allowed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("allowed"), True))

    return out.map_batches(only_allowed, batch_format="pyarrow")


_LOC_RE = r"(?is)<loc>\s*([^<\s][^<]*?)\s*</loc>"
_LASTMOD_RE = (r"(?is)<url>(?:(?!</url>).)*?<loc>\s*([^<\s][^<]*?)\s*"
               r"</loc>(?:(?!</url>).)*?<lastmod>\s*([^<]*?)\s*</lastmod>")


def parse_sitemap_urls(batch: pa.Table, host_col: str = "host",
                       sitemap_col: str = "sitemap_xml") -> pa.Table:
    """Row-expanding sitemap.xml parse: one output row per ``<loc>``
    entry → ``(host, loc, lastmod)`` with ``lastmod`` null when the
    entry's ``<url>`` block carries no ``<lastmod>``. Handles both
    urlset and sitemapindex documents (every ``<loc>`` is emitted —
    the caller decides whether a loc is a page or a nested sitemap).
    One compiled-regex findall per batch; whitespace inside tags is
    trimmed."""
    import re as _re

    loc_re = _re.compile(_LOC_RE)
    lm_re = _re.compile(_LASTMOD_RE)
    hosts = batch.column(host_col).to_pylist()
    docs = batch.column(sitemap_col).to_pylist()
    out_h: list = []
    out_l: list = []
    out_m: list = []
    for host, doc in zip(hosts, docs):
        if not doc:
            continue
        if isinstance(doc, (bytes, bytearray)):
            doc = doc.decode("utf-8", "replace")
        lastmods = dict(lm_re.findall(doc))
        for loc in loc_re.findall(doc):
            out_h.append(host)
            out_l.append(loc)
            out_m.append(lastmods.get(loc))
    return pa.table({
        host_col: pa.array(out_h, pa.string()),
        "loc": pa.array(out_l, pa.string()),
        "lastmod": pa.array(out_m, pa.string()),
    })


# feed-entry block + field patterns (RE2-compatible: (?s) non-greedy
# blocks, no lookahead — the SQL twin replays them verbatim)
_FEED_BLOCK_RE = r"(?s)<(?:item|entry)[\s>].*?</(?:item|entry)>"
_FEED_TITLE_RE = r"(?s)<title[^>]*>\s*([^<]*?)\s*</title>"
_FEED_LINK_TEXT_RE = r"(?s)<link[^>]*>\s*([^<\s][^<]*?)\s*</link>"
_FEED_LINK_HREF_RE = r"""(?i)<link\s[^>]*href\s*=\s*["']?([^"'\s>]+)"""
_FEED_DATE_RE = (r"(?s)<(?:pubDate|updated)[^>]*>"
                 r"\s*([^<]*?)\s*</(?:pubDate|updated)>")


def parse_feed_entries(batch: pa.Table, url_col: str = "url",
                       feed_col: str = "feed_xml") -> pa.Table:
    """Row-expanding RSS/Atom feed parse — the crawl-discovery
    sibling of :func:`parse_sitemap_urls`: one output row per
    ``<item>`` (RSS) / ``<entry>`` (Atom) block →
    ``(url, title, link, published)``, null where a block lacks the
    field. The link is the RSS ``<link>text</link>`` form when
    present, else the Atom ``<link href=…>`` attribute; dates come
    from ``<pubDate>`` or ``<updated>``. One compiled findall for the
    blocks per batch, then per-block field extracts."""
    import re as _re

    blk_re = _re.compile(_FEED_BLOCK_RE)
    ti_re = _re.compile(_FEED_TITLE_RE)
    lt_re = _re.compile(_FEED_LINK_TEXT_RE)
    lh_re = _re.compile(_FEED_LINK_HREF_RE)
    dt_re = _re.compile(_FEED_DATE_RE)
    urls = batch.column(url_col).to_pylist()
    docs = batch.column(feed_col).to_pylist()
    out_u: list = []
    out_t: list = []
    out_l: list = []
    out_d: list = []
    for url, doc in zip(urls, docs):
        if not doc:
            continue
        if isinstance(doc, (bytes, bytearray)):
            doc = doc.decode("utf-8", "replace")
        for blk in blk_re.findall(doc):
            ti = ti_re.search(blk)
            lt = lt_re.search(blk)
            lh = lh_re.search(blk)
            dt = dt_re.search(blk)
            out_u.append(url)
            out_t.append(ti.group(1) if ti else None)
            out_l.append(lt.group(1) if lt
                         else (lh.group(1) if lh else None))
            out_d.append(dt.group(1) if dt else None)
    return pa.table({
        url_col: pa.array(out_u, pa.string()),
        "title": pa.array(out_t, pa.string()),
        "link": pa.array(out_l, pa.string()),
        "published": pa.array(out_d, pa.string()),
    })


def _selected_section_lines(doc: str, agent: str) -> "list[str]":
    """The rule lines of the agent's selected section — exact-agent
    section first, else the ``*`` section (same selection contract as
    :func:`parse_robots_rules`)."""
    sections: list = []
    cur_agents: list = []
    cur_lines: list = []
    in_agents = False
    for raw in doc.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents and (cur_agents or cur_lines):
                sections.append((cur_agents, cur_lines))
                cur_agents, cur_lines = [], []
            cur_agents.append(val.lower())
            in_agents = True
        elif key in ("allow", "disallow", "crawl-delay"):
            # group-member rules only; other directives (Sitemap,
            # Host, …) are section-INDEPENDENT and must not end the
            # agent block — same grouping as parse_robots_rules
            in_agents = False
            cur_lines.append((key, val))
    if cur_agents or cur_lines:
        sections.append((cur_agents, cur_lines))
    for agents, lines in sections:
        if agent.lower() in agents:
            return lines
    for agents, lines in sections:
        if "*" in agents:
            return lines
    return []


def parse_crawl_delay(batch: pa.Table, host_col: str = "host",
                      robots_col: str = "robots_txt",
                      agent: str = "*") -> pa.Table:
    """Per-host Crawl-delay from the selected agent section (the
    de-facto politeness directive most large crawlers honor): one
    output row per host whose section carries a parseable
    non-negative delay → ``(host, crawl_delay: float64)``. The FIRST
    delay line in the section wins; unparseable or negative values
    are skipped (treated as absent). Same per-host bounded-Python
    budget as :func:`parse_robots_rules`."""
    hosts = batch.column(host_col).to_pylist()
    docs = batch.column(robots_col).to_pylist()
    out_h: list = []
    out_d: list = []
    for host, doc in zip(hosts, docs):
        if not doc:
            continue
        if isinstance(doc, (bytes, bytearray)):
            doc = doc.decode("utf-8", "replace")
        for key, val in _selected_section_lines(doc, agent):
            if key == "crawl-delay":
                # strict non-negative decimal only — bare float()
                # would accept 'inf'/'1_0' and hand schedulers an
                # infinite politeness delay (r04 review)
                if not re.fullmatch(r"[0-9]+(\.[0-9]+)?", val):
                    continue
                out_h.append(host)
                out_d.append(float(val))
                break
    return pa.table({host_col: pa.array(out_h, pa.string()),
                     "crawl_delay": pa.array(out_d, pa.float64())})


def parse_sitemap_directives(batch: pa.Table, host_col: str = "host",
                             robots_col: str = "robots_txt"
                             ) -> pa.Table:
    """Row-expanding Sitemap: URL extraction — RFC 9309 makes the
    Sitemap directive section-INDEPENDENT (it applies to every
    agent), so every ``Sitemap:`` line in the file yields one
    ``(host, sitemap)`` row in file order; duplicates are kept (the
    caller dedups if it cares). Comments strip first; empty values
    are skipped."""
    hosts = batch.column(host_col).to_pylist()
    docs = batch.column(robots_col).to_pylist()
    out_h: list = []
    out_s: list = []
    for host, doc in zip(hosts, docs):
        if not doc:
            continue
        if isinstance(doc, (bytes, bytearray)):
            doc = doc.decode("utf-8", "replace")
        for raw in doc.split("\n"):
            line = raw.split("#", 1)[0].strip()
            key, _, val = line.partition(":")
            if key.strip().lower() == "sitemap" and val.strip():
                out_h.append(host)
                out_s.append(val.strip())
    return pa.table({host_col: pa.array(out_h, pa.string()),
                     "sitemap": pa.array(out_s, pa.string())})
