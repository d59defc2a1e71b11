"""Lexico-syntactic relation extraction for KG construction
(graft-added, r04 seventh sitting).

``extract_hearst`` mines is-a (hypernym) triples from raw text with
the classic Hearst patterns (Hearst 1992, public): "X such as A, B
and C", "A, B and other X", "X including A", "X especially A". This
is the text→triple step a web-scale KG pipeline runs right after
text extraction — the output feeds the same canonicalization /
fusion stages as the page annotator's triples.

Vectorization shape follows ``functions/urls.py::extract_links``:
one compiled RE2-compatible ``str.findall`` per pattern over the
whole batch + ``np.repeat`` id carriage — no per-row Python in the
caller's hands, and the row expansion stays inside one batch, so the
stage streams at any scale. Every pattern (and the list splitter)
is RE2-compatible with identical semantics in DuckDB, so the SQL
oracle replays the extraction byte-for-byte.
"""

from __future__ import annotations

import pyarrow as pa

# (pattern_name, regex, hyper_group, list_group). Groups 1/2 index
# into the findall tuple. ``and other`` has the LIST on the left.
#
# NP grammar (r04 verdict item 7): hypernyms LEFT of the anchor
# phrase are bounded multiword chunks ``(?:\w+ ){0,2}\w+`` — cleanly
# delimited by the anchor, then stripped of leading function words
# with ``HEARST_STOP_RE`` (a bounded non-lookahead strip, so the
# whole grammar stays RE2-compatible and the DuckDB oracle replays
# it byte-for-byte). List members and the TRAILING ``and other``
# hypernym stay single-token: RE2 has no lookahead, so a trailing
# bounded chunk would greedily swallow arbitrary right context —
# the honest trade, documented here.
_NP = r"(?:\w+ ){0,2}\w+"
HEARST_PATTERNS = [
    ("such_as",
     rf"({_NP}) such as (\w+(?:, \w+)*(?:,? (?:and|or) \w+)?)", 0, 1),
    ("including",
     rf"({_NP}) including (\w+(?:, \w+)*(?:,? (?:and|or) \w+)?)", 0, 1),
    ("especially",
     rf"({_NP}) especially (\w+(?:, \w+)*(?:,? (?:and|or) \w+)?)", 0, 1),
    ("and_other",
     r"(\w+(?:, \w+)*) and other (\w+)", 1, 0),
]

# leading function words stripped from a captured hypernym chunk —
# bounded {0,2} so it can never empty a 3-token chunk; mirrored
# verbatim by the oracle's regexp_replace
HEARST_STOP_RE = (
    r"^(?:(?:the|a|an|of|in|on|at|and|or|we|they|i|you|it|he|she|"
    r"this|that|these|those|some|many|most|all|other|such|as|are|"
    r"is|was|were|saw|see|like|with|for|to|from|by|has|have|had)"
    r" ){0,2}")

# splits "dogs, cats and foxes" → [dogs, cats, foxes]; mirrored
# verbatim by the oracle's regexp_split_to_array
LIST_SPLIT_RE = r",? (?:and|or) |, "


def extract_hearst(batch: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """Row-expanding Hearst-pattern extraction: one output row per
    (pattern match × list member) — ``(id, subj, pred, obj,
    pattern)`` with ``pred='isa'``, subj the hyponym, obj the
    hypernym, both lowercased. Null text yields no rows."""
    import re

    import numpy as np
    import pandas as pd

    text = batch.column(text_col).to_pandas().fillna("").str.lower()
    n = len(text)
    ids_out: list = []
    subj_out: list = []
    obj_out: list = []
    pat_out: list = []
    split_re = re.compile(LIST_SPLIT_RE)
    stop_re = re.compile(HEARST_STOP_RE)
    id_arr = batch.column(id_col)
    for name, pat, hyper_g, list_g in HEARST_PATTERNS:
        found = text.str.findall(pat)
        counts = np.fromiter((len(x) for x in found), dtype=np.int64,
                             count=n)
        if counts.sum() == 0:
            continue
        row_idx = np.repeat(np.arange(n), counts)
        # expand each match's member list; track per-match fanout
        match_rows: list = []
        for matches in found:
            for m in matches:
                hyper = stop_re.sub("", m[hyper_g], count=1)
                members = split_re.split(m[list_g])
                match_rows.append((hyper, members))
        fan = np.fromiter((len(ms) for _h, ms in match_rows),
                          dtype=np.int64, count=len(match_rows))
        ids_out.append(id_arr.take(
            pa.array(np.repeat(row_idx, fan))))
        subj_out.extend(m for _h, ms in match_rows for m in ms)
        obj_out.extend(h for h, ms in match_rows for _m in ms)
        pat_out.extend([name] * int(fan.sum()))
    if not ids_out:
        return pa.table({
            id_col: batch.column(id_col).slice(0, 0),
            "subj": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "obj": pa.array([], pa.string()),
            "pattern": pa.array([], pa.string()),
        })
    ids = pa.concat_arrays([a.combine_chunks() if
                            isinstance(a, pa.ChunkedArray) else a
                            for a in ids_out])
    return pa.table({
        id_col: ids,
        "subj": pa.array(subj_out, pa.string()),
        "pred": pa.array(["isa"] * len(subj_out), pa.string()),
        "obj": pa.array(obj_out, pa.string()),
        "pattern": pa.array(pat_out, pa.string()),
    })
