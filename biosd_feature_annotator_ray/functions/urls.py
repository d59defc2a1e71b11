"""Vectorized URL kernels for web-corpus curation (graft-added, r04).

All functions are pyarrow.compute regex/string kernels over a string
column — no per-row Python in the hot path. Semantics are pinned
against ``urllib.parse`` on a tricky-URL corpus in the tests.

``registrable_domain`` is a documented HEURISTIC (last two labels,
plus a small built-in set of common two-label public suffixes like
``co.uk``): the full Public Suffix List is a data file this sandbox
doesn't ship; swap ``extra_suffixes`` for the PSL set in production.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://[userinfo@]host[:port] — host is everything up to /?#, with
# bracketed IPv6 literals ([::1], [2001:db8::1]:8080) matched whole
_HOST_RE = (r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/?#@]*@)?"
            r"(?P<h>\[[^\]/?#]*\]|[^/?#:]+)")

# common multi-label public suffixes (heuristic subset; see docstring)
_TWO_LABEL_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "com.sg", "com.tr", "co.za", "com.ar", "co.kr",
}


def url_host(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Lowercased host of each URL (userinfo, port, and IPv6 brackets
    stripped — matching ``urlsplit().hostname``); null for strings
    with no scheme://host shape."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ex = pc.extract_regex(arr, _HOST_RE)
    host = pc.struct_field(ex, "h")
    host = pc.replace_substring_regex(host, r"^\[|\]$", "")
    return pc.utf8_lower(host)


def url_path_depth(arr: "pa.Array | pa.ChunkedArray",
                   host: "pa.Array | None" = None) -> pa.Array:
    """Number of non-empty path segments: ``https://h/a/b/`` → 2,
    ``https://h`` → 0. Null where the URL has no host. Pass a
    precomputed ``url_host`` result to skip re-extracting it."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ok = pc.is_valid(url_host(arr) if host is None else host)
    # drop scheme://host, then query/fragment, then count segments
    path = pc.replace_substring_regex(
        arr, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    path = pc.replace_substring_regex(path, r"[?#].*$", "")
    seg = pc.count_substring_regex(path, r"/[^/]")
    return pc.if_else(ok, pc.cast(seg, pa.int32()),
                      pa.scalar(None, pa.int32()))


def strip_tracking_params(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Remove utm_*/gclid/fbclid/msclkid query parameters (the
    dedup-relevant canonicalization for crawl URLs); drops the ``?``
    when no parameters survive and any ``&``/``?`` litter. Parameter
    names are anchored on their ``?``/``&`` delimiter, so params whose
    names merely CONTAIN a tracking name (``mygclid=``), values
    containing ``gclid=``, and fragments are untouched."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # keep the delimiter (\1) so consecutive tracking params still have
    # their anchors in the same global pass; collapse the leftover
    # delimiter runs afterwards
    out = pc.replace_substring_regex(
        arr, r"([?&])(?:utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid)=[^&#]*",
        r"\1")
    out = pc.replace_substring_regex(out, r"&&+", "&")
    out = pc.replace_substring_regex(out, r"\?&+", "?")
    return pc.replace_substring_regex(out, r"[?&]+(#|$)", r"\1")


def registrable_domain(arr: "pa.Array | pa.ChunkedArray",
                       host: "pa.Array | None" = None) -> pa.Array:
    """Heuristic registrable domain of each URL's host: last two
    labels, or last three when the last two are a known public suffix
    (``a.b.co.uk`` → ``b.co.uk``). IPv4/IPv6 literals and single-label
    hosts pass through unchanged. Pass a precomputed ``url_host``
    result to skip re-extracting it."""
    if host is None:
        host = url_host(arr)
    # last three labels and last two labels via one regex each
    two = pc.struct_field(
        pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$"), "d")
    three = pc.struct_field(
        pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+\.[^.]+)$"), "d")
    suffix = pc.struct_field(
        pc.extract_regex(host, r"[^.]+\.(?P<d>[^.]+\.[^.]+)$"), "d")
    is_two_label_suffix = pc.is_in(
        suffix, value_set=pa.array(sorted(_TWO_LABEL_SUFFIXES)))
    picked = pc.if_else(
        pc.and_kleene(is_two_label_suffix, pc.is_valid(three)),
        three, two)
    # IP literals are addresses, not domains: IPv4 dotted-quads would
    # otherwise collapse to their last two octets; IPv6 has colons
    is_ip = pc.match_substring_regex(
        host, r"^(?:\d{1,3}\.){3}\d{1,3}$|:")
    picked = pc.if_else(is_ip, host, picked)
    # single-label host (no dot): keep the host itself
    return pc.if_else(pc.is_valid(picked), picked, host)


def extract_links(batch: pa.Table, html_col: str = "html",
                  url_col: str = "url",
                  capture_text: bool = False) -> pa.Table:
    """Row-expanding href extraction: one output row per ``<a href=…>``
    in each page's HTML (tag and attribute case-insensitive) —
    ``(url, link)`` with quotes/whitespace stripped, plus the
    whitespace-collapsed ANCHOR TEXT up to the next tag when
    ``capture_text`` (the classic entity-linking signal: what the web
    calls the link target). Relative links (no ``scheme://``) are
    dropped: the host-graph consumers downstream only use absolute
    targets, and resolving relatives needs the full RFC-3986 merge —
    out of scope for the curation kernel.

    Vectorization note: Arrow has no extract-ALL regex kernel, so this
    uses pandas ``str.findall`` with one compiled RE2-compatible
    pattern + ``np.repeat`` for the id carriage — no per-row Python in
    the caller's hands, and the expansion stays inside one batch."""
    import numpy as np
    import pandas as pd

    html = batch.column(html_col).to_pandas().fillna("")
    if capture_text:
        found = html.str.findall(
            r'''(?i)<a\s[^>]*href\s*=\s*["']?([^"'\s>]+)[^>]*>([^<]*)''')
        flat_l = [u for links in found for (u, _t) in links]
        flat_t = [" ".join(t.split()) for links in found
                  for (_u, t) in links]
    else:
        found = html.str.findall(
            r'''(?i)<a\s[^>]*href\s*=\s*["']?([^"'\s>]+)''')
        flat_l = [u for links in found for u in links]
        flat_t = None
    counts = np.fromiter((len(x) for x in found), dtype=np.int64,
                         count=len(found))
    idx = np.repeat(np.arange(len(found)), counts)
    cols = {
        url_col: batch.column(url_col).take(pa.array(idx)),
        "link": pa.array(flat_l, pa.string()),
    }
    if flat_t is not None:
        cols["anchor"] = pa.array(flat_t, pa.string())
    out = pa.table(cols)
    absolute = pc.match_substring_regex(
        out.column("link"), r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    return out.filter(absolute)


def url_features(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append host / registrable_domain / path_depth / canonical_url
    columns — the one-call curation feature set. The host is
    extracted once and shared by the dependent kernels."""
    arr = batch.column(url_col)
    host = url_host(arr)
    out = batch.append_column("host", host)
    out = out.append_column("domain", registrable_domain(arr, host=host))
    out = out.append_column("path_depth", url_path_depth(arr, host=host))
    return out.append_column("canonical_url", strip_tracking_params(arr))


_CANON_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
             r"(?P<host>[^/?#:@]*)(?::(?P<port>[0-9]*))?"
             r"(?P<rest>[/?].*)?$")


def canonicalize_url(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """RFC-3986-style URL normalization (graft-added, r04): lowercase
    the scheme and host, strip the fragment, drop default ports
    (``:80`` for http, ``:443`` for https) and empty ports (``:``),
    and give a bare authority a ``/`` path. Path, query and
    percent-encoding are preserved byte-for-byte (encoding
    normalization needs per-octet decisions — out of scope).

    Strings that do not match ``scheme://host...`` — including
    bracketed IPv6 authorities and userinfo@host forms, which the
    single-host-group regex deliberately skips — pass through with
    only the fragment stripped. A userinfo-bearing authority is NOT
    lowercased (userinfo is case-sensitive); IPv6 literals keep their
    port. All steps are pyarrow.compute kernels; the exact same RE2
    regex chain is replayable in SQL (see the ``url_canonical``
    oracle)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.replace_substring_regex(arr, r"#.*$", "",
                                   max_replacements=1)
    ex = pc.extract_regex(s, _CANON_RE)
    ok = pc.is_valid(ex)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    port = pc.struct_field(ex, "port")
    rest = pc.struct_field(ex, "rest")
    default = pc.or_(
        pc.or_(pc.equal(port, ""),
               pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80"))),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")))
    port_part = pc.if_else(default, "",
                           pc.binary_join_element_wise(":", port, ""))
    rest_part = pc.if_else(pc.equal(rest, ""), "/", rest)
    canon = pc.binary_join_element_wise(
        scheme, "://", host, port_part, rest_part, "")
    return pc.if_else(ok, canon, s)


def extract_rel_links(batch: pa.Table, html_col: str = "html",
                      url_col: str = "url") -> pa.Table:
    """Row-expanding ``<link>`` relation extraction — the SEO/i18n
    page-equivalence signals a crawl pipeline folds before dedup:
    one output row per ``rel="canonical"`` (kind ``canonical``,
    ``lang`` null) or ``rel="alternate" hreflang=…`` (kind
    ``alternate``, ``lang`` lower-cased) tag → ``(url, kind, lang,
    target)``. Attribute order inside the tag doesn't matter (each
    attribute is matched independently); tags missing href are
    dropped; rel/hreflang compare case-insensitively.

    Same vectorization shape as :func:`extract_links`: one compiled
    findall over the batch for the tags, ``np.repeat`` id carriage,
    then per-attribute vectorized extracts on the FLAT tag list. All
    patterns are RE2-compatible (no '' vs null mismatch: a DuckDB
    ``regexp_extract`` miss is '' — the kernel normalizes misses to
    '' before filtering, so the SQL twin replays exactly)."""
    import numpy as np
    import pandas as pd

    html = batch.column(html_col).to_pandas().fillna("")
    found = html.str.findall(r"(?i)<link\s[^>]*>")
    flat = pd.Series([t for tags in found for t in tags], dtype="object")
    counts = np.fromiter((len(x) for x in found), dtype=np.int64,
                         count=len(found))
    idx = np.repeat(np.arange(len(found)), counts)
    if len(flat) == 0:
        return pa.table({url_col: pa.array([], pa.string()),
                         "kind": pa.array([], pa.string()),
                         "lang": pa.array([], pa.string()),
                         "target": pa.array([], pa.string())})
    rel = (flat.str.extract(r'(?i)\brel\s*=\s*["\']?([^"\'\s>]+)',
                            expand=False).fillna("").str.lower())
    href = flat.str.extract(r'(?i)\bhref\s*=\s*["\']?([^"\'\s>]+)',
                            expand=False).fillna("")
    hreflang = (flat.str.extract(
        r'(?i)\bhreflang\s*=\s*["\']?([^"\'\s>]+)',
        expand=False).fillna("").str.lower())

    is_canon = (rel == "canonical") & (href != "")
    is_alt = (rel == "alternate") & (hreflang != "") & (href != "")
    keep = (is_canon | is_alt).to_numpy()
    kind = np.where(is_canon.to_numpy()[keep], "canonical", "alternate")
    lang = hreflang.to_numpy()[keep]
    lang_arr = pa.array(
        [None if k == "canonical" else lg
         for k, lg in zip(kind, lang)], pa.string())
    return pa.table({
        url_col: batch.column(url_col).take(pa.array(idx[keep])),
        "kind": pa.array(kind, pa.string()),
        "lang": lang_arr,
        "target": pa.array(href.to_numpy()[keep], pa.string())})
