"""Mention detection (SURVEY.md §2 M3, graft-added; rule: FIXTURES.md §5).

The reference receives (type, value) pairs straight from the DB schema
(``ExperimentalPropertyValue`` rows); in the web-text graft we detect
``key: value``-style characteristic mentions in page text. One mention
per line matching ``^\\s*([A-Za-z][\\w ]{0,63}?)\\s*:\\s*(.+?)\\s*$``
after splitting on "\\n"; the type must normalize into the configured
type vocabulary (precision guard).

Fully vectorized: list-split + flatten + RE2 extract; the row-expanding
shape (more output rows than input) is native to map_batches.

Spans: ``span_start``/``span_end`` are the character offsets of the
mention's LINE within the page text (deterministic lineage pointer; the
sub-line value offset is not tracked in v1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import normalize
from ..schemas import MENTIONS

MENTION_RE = r"^\s*(?P<t>[A-Za-z][\w ]{0,63}?)\s*:\s*(?P<v>.+?)\s*$"

# FIXTURES.md §1 type vocabulary.
DEFAULT_TYPE_VOCAB = (
    "organism",
    "organism part",
    "age",
    "sex",
    "treatment",
    "disease",
    "temperature",
    "collection date",
    "depth",
    "strain",
)


def detect_mentions(batch: pa.Table, type_vocab: tuple[str, ...] = DEFAULT_TYPE_VOCAB) -> pa.Table:
    """map_batches kernel: pages(url, text, …) → MENTIONS rows."""
    text = pc.fill_null(batch.column("text").combine_chunks(), "")
    if text.type != pa.string():
        text = text.cast(pa.string())
    lines = pc.split_pattern(text, "\n")
    parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lines)
    if len(flat) == 0:
        return MENTIONS.empty_table()

    # Line start offsets within each page (vectorized cumsum, reset per parent).
    ln_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    step = ln_len + 1  # +1 for the "\n"
    gstart = np.cumsum(step) - step
    first = np.ones(len(parent), dtype=bool)
    first[1:] = parent[1:] != parent[:-1]
    base = np.repeat(gstart[first], np.diff(np.flatnonzero(np.append(first, True))))
    start = gstart - base

    ext = pc.extract_regex(flat, MENTION_RE)
    t_norm = normalize.norm_array(pc.struct_field(ext, "t"))
    # normalize the vocab the same way as the detected types (a custom
    # vocab like ('Organism',) must not silently match nothing), and
    # drop whitespace-only values ('age: ' section headers) — the lazy
    # (?P<v>.+?) otherwise captures a single space
    vocab_norm = pa.array(sorted({normalize.norm_str(v) for v in type_vocab}))
    v_trim = pc.utf8_trim_whitespace(pc.fill_null(pc.struct_field(ext, "v"), ""))
    keep_pa = pc.and_kleene(
        pc.and_kleene(pc.is_valid(ext), pc.is_in(t_norm, value_set=vocab_norm)),
        pc.not_equal(v_trim, ""),
    )
    keep = pc.fill_null(keep_pa, False).to_numpy(zero_copy_only=False)
    if not keep.any():
        return MENTIONS.empty_table()
    sel = pa.array(np.flatnonzero(keep))

    char_type = t_norm.take(sel)
    value_text = pc.struct_field(ext, "v").take(sel)
    url = batch.column("url").combine_chunks().take(pa.array(parent[keep]))
    key = normalize.make_key(char_type, value_text)
    return pa.table(
        {
            "url": url.cast(pa.string()),
            "char_type": char_type,
            "value_text": value_text,
            "key": key,
            "span_start": pa.array(start[keep].astype(np.int32)),
            "span_end": pa.array((start[keep] + ln_len[keep]).astype(np.int32)),
        },
        schema=MENTIONS,
    )
