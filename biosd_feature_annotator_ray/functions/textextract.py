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
