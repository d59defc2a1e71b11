"""Deterministic HTML→text extraction (SURVEY.md §2 M2, graft-added).

Per-row invariant (BASELINE.json input_hint): byte-identical extracted
text per url. When ``text`` is non-null it passes through UNTOUCHED
(byte identity is trivially preserved); when only ``html`` is present,
the fixed rule below derives text. The rule is pure, versioned
(``EXTRACT_VERSION``), and line-preserving so downstream line-oriented
mention detection still works on html-only pages.

Rule v1 (frozen — changing it invalidates checkpoints):
  1. UTF-8 decode with errors="replace".
  2. Drop <script>/<style> elements including content.
  3. Replace line-breaking tags (<br>, </p>, </div>, </li>, </tr>,
     </h1..6>, </title>) with a newline.
  4. Strip all remaining tags.
  5. Decode the five standard HTML entities (&amp; &lt; &gt; &quot; &#39;).
  6. Per line: collapse runs of spaces/tabs to one space, strip; drop
     empty lines; join with "\n".
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_SCRIPT_RE = re.compile(r"(?is)<(script|style)[^>]*>.*?</\1\s*>")
_BREAK_RE = re.compile(r"(?i)<br\s*/?>|</(?:p|div|li|tr|h[1-6]|title)\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def html_to_text(html: bytes) -> str:
    """Pure deterministic extraction of one page. See module docstring."""
    s = html.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _BREAK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    lines = [_WS_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_text(batch: pa.Table) -> pa.Table:
    """map_batches kernel: fill null ``text`` from ``html`` deterministically.

    Vectorized passthrough: when every row already has text (90% of
    synthetic pages, 100% of the documents proxy) no Python loop runs at
    all. Only the null-text rows pay the per-row decode.
    """
    import pyarrow.compute as pc

    text = batch.column("text")
    if text.null_count == 0:
        return batch
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    mask = pc.is_null(text)
    null_idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    html_needed = batch.column("html").take(pa.array(null_idx)).to_pylist()
    # Only the null rows pay Python decode; the 90% non-null strings are
    # never materialized (replace_with_mask splices in place).
    repl = pa.array([html_to_text(h) if h is not None else "" for h in html_needed],
                    type=text.type)
    new_text = pc.replace_with_mask(text, mask, repl)
    idx = batch.schema.get_field_index("text")
    return batch.set_column(idx, "text", new_text)


_ENTITY_RE = re.compile(r"&(?:#[xX]?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,31});")


def decode_html_entities(batch: pa.Table, col: str = "text",
                         out: str | None = None,
                         max_distinct: int = 512) -> pa.Table:
    """HTML entity decoding (``&amp;`` / ``&#233;`` / ``&#x41;`` →
    their characters) with a bounded-distinct vectorized plan: scan
    the batch ONCE for its distinct terminated entities (a real
    corpus batch has dozens, not thousands — charsets are finite),
    resolve each via the stdlib's full named table, then apply one
    Arrow ``replace_substring`` pass per distinct entity. Unknown
    entities pass through; UNTERMINATED entities (``&amp`` without
    ``;``) are deliberately not decoded (oracle-shared contract).

    Single-logical-pass semantics despite chaining: replacements
    whose OUTPUT contains ``&`` (``&amp;`` / ``&#38;`` / ``&#x26;``)
    run LAST, so ``&amp;lt;`` decodes to ``&lt;`` — never
    double-decoded to ``<``. Batches with more than ``max_distinct``
    entities fall back to a per-row regex sub with the identical
    single-pass semantics."""
    import html as _html

    import pyarrow.compute as pc

    src = batch.column(col)
    ser = src.to_pandas()
    found: set[str] = set()
    notnull = ser.dropna()
    if len(notnull):
        for lst in notnull.str.findall(_ENTITY_RE):
            found.update(lst)
    repl = []
    for e in found:
        d = _html.unescape(e)
        if d != e:
            repl.append((e, d))
    if len(repl) > max_distinct:
        sub = _ENTITY_RE.sub

        def one(v):
            if not isinstance(v, str):
                return v
            return sub(lambda m: _html.unescape(m.group(0)), v)

        arr: pa.Array | pa.ChunkedArray = pa.array(
            [one(v) for v in ser], pa.string())
    else:
        # amp-producing last => one logical pass
        repl.sort(key=lambda t: ("&" in t[1], t[0]))
        arr = src
        for e, d in repl:
            arr = pc.replace_substring(arr, pattern=e, replacement=d)
    return batch.append_column(out or f"{col}_decoded", arr)
