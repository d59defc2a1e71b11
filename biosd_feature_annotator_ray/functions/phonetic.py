"""Phonetic blocking keys for entity resolution (graft-added, r04).

American Soundex (Knuth's variant) as a fully VECTORIZED chain of
pyarrow.compute kernels — no per-row Python anywhere. The exact same
chain is replayed verbatim in the DuckDB oracle (translate +
per-digit run-collapse regexp_replace), so engine and SQL agree
byte-for-byte by construction.

Spec implemented (and mirrored in SQL):
  1. Uppercase; strip every non-ASCII-letter.
  2. Code EVERY letter: BFPV→1, CGJKQSXZ→2, DT→3, L→4, MN→5, R→6,
     vowels AEIOUY→0, H and W are DELETED before anything else (so
     same-code letters separated only by H/W collapse — the Knuth
     rule), while a vowel's 0 breaks the run (coded twice).
  3. Collapse runs of the same digit.
  4. The first letter is kept as a LETTER; its own leading code is
     dropped from the digit string (collapsing already merged a
     following same-code letter into it). When the first letter is
     H or W it was deleted in step 2, so nothing is dropped.
  5. Remove the zeros, append to the first letter, right-pad with
     '0' to 4 chars.

Empty / letter-free input yields '' (not a padded code); null stays
null.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) — applied in order to the letters-only string
_CODE_STEPS = [
    (r"[HW]", ""),
    (r"[BFPV]", "1"),
    (r"[CGJKQSXZ]", "2"),
    (r"[DT]", "3"),
    (r"L", "4"),
    (r"[MN]", "5"),
    (r"R", "6"),
    (r"[AEIOUY]", "0"),
]
_COLLAPSE_STEPS = [(d + "{2,}", d) for d in "0123456"]


def soundex_array(col: "pa.Array | pa.ChunkedArray") -> "pa.Array | pa.ChunkedArray":
    """Soundex code per element of a string array (see module doc)."""
    s = pc.replace_substring_regex(pc.utf8_upper(col), "[^A-Z]", "")
    first = pc.utf8_slice_codeunits(s, 0, 1)
    coded = s
    for pat, rep in _CODE_STEPS + _COLLAPSE_STEPS:
        coded = pc.replace_substring_regex(coded, pat, rep)
    # drop the first letter's own leading code — unless that letter
    # was H/W (already deleted, nothing to drop)
    hw_first = pc.is_in(first, value_set=pa.array(["H", "W"]))
    tail = pc.if_else(hw_first, coded, pc.utf8_slice_codeunits(coded, 1, 2**30))
    digits = pc.replace_substring_regex(tail, "0", "")
    code = pc.utf8_slice_codeunits(
        pc.utf8_rpad(pc.binary_join_element_wise(first, digits, ""),
                     width=4, padding="0"), 0, 4)
    return pc.if_else(pc.equal(s, ""), pa.scalar("", pa.string()), code)
