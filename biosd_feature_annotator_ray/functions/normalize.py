"""Key / match normalization kernels (SURVEY.md §2 M4, §2.8).

Mirrors the reference's memo-key construction
(``ExpPropValAnnotation.getPvalText`` — lower, trim, collapse
whitespace, SURVEY.md §1.1) and ZOOMA's match normalization
(additionally strip outer punctuation — FIXTURES.md §3.3).

All kernels are pure pyarrow.compute (RE2) — zero Python per row.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_WS = r"\s+"
# Python's unicode \s (what the scalar twin norm_str collapses):
# ASCII ws + the \x1c-\x1f separators + NEL + every Unicode Z — RE2's
# bare \s is ASCII-only, which let NBSP ('&nbsp;' in real HTML) through
# and downgraded curated matches to tokenset tier (annotation loss).
_WS_UNI = r"[\s\x1c-\x1f\x85\p{Z}]+"
# Outer punctuation strip for the MEDIUM match tier (FIXTURES.md §3.3
# tier 4): leading/trailing non-alphanumeric runs.
_OUTER_PUNCT = r"^[^0-9A-Za-z]+|[^0-9A-Za-z]+$"

KEY_SEP = "|"


def norm_array(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """lower(trim(collapse_ws(x))) — the memo-key normalization.
    Collapses UNICODE whitespace (parity with the scalar ``norm_str``
    that builds the ontology index; ASCII-only collapse fragmented
    NBSP-bearing keys)."""
    out = pc.replace_substring_regex(arr, _WS_UNI, " ")
    out = pc.utf8_trim_whitespace(out)
    return pc.utf8_lower(out)


def punct_strip_array(arr: pa.ChunkedArray | pa.Array):
    """Normalized form with outer punctuation removed (match tier 4)."""
    out = pc.replace_substring_regex(arr, _OUTER_PUNCT, "")
    return pc.utf8_trim_whitespace(out)


def make_key(char_type_norm, value_text) -> pa.ChunkedArray | pa.Array:
    """key = norm(type) + "|" + norm(value) — the memoization key that
    replaces the reference's process-global annotation store (§2.3 ST1)."""
    return pc.binary_join_element_wise(char_type_norm, norm_array(value_text), KEY_SEP)


def token_sig_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized twin of ``token_sig``: sorted token multiset signature
    per row (tier-5 key). One whitespace split + one stable lexsort over
    the flattened tokens + one binary_join — no per-row Python."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(arr)
    toks = pc.utf8_split_whitespace(trimmed)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    fl = flat.to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(lengths)), lengths)
    order = np.lexsort((fl, parent))
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                   pa.array(fl[order], pa.string()))
    return pc.binary_join(lst, " ")


# Python-scalar twins (used in actor state / index build, small data only).
_ws_re = re.compile(r"\s+")
_punct_re = re.compile(r"^[^0-9A-Za-z]+|[^0-9A-Za-z]+$")


def norm_str(s: str) -> str:
    return _ws_re.sub(" ", s.strip()).lower()


def punct_strip_str(s: str) -> str:
    return _punct_re.sub("", s).strip()


def token_sig(s: str) -> str:
    """Sorted token multiset signature for the token-set tier (tier 5)."""
    return " ".join(sorted(_ws_re.split(s.strip()))) if s.strip() else ""


def mask_pattern(batch, col: str, pattern: str, repl: str, out: str | None = None):
    """Regex redaction kernel (PII-mask shape: digit runs, emails,
    phone-like spans → a placeholder token). RE2 via Arrow
    ``replace_substring_regex`` — the DuckDB ``regexp_replace(..,'g')``
    oracle shares the engine semantics."""
    import pyarrow.compute as pc

    masked = pc.replace_substring_regex(batch.column(col), pattern, repl)
    return batch.append_column(out or f"{col}_redacted", masked)


def fold_array(arr: pa.ChunkedArray | pa.Array):
    """Unicode case/accent folding for cross-lingual match keys:
    NFC-normalize, Unicode-lowercase, then strip combining marks
    (NFD -> drop \\p{Mn} -> NFC). Byte-identical to DuckDB's
    ``strip_accents(lower(nfc_normalize(x)))`` (pinned by the
    `unicode_fold` oracle and an accent-corpus test), so the same fold
    can key both the engine's dedup/link stages and offline SQL audits.
    All five steps are Arrow kernels (utf8_normalize / utf8_lower /
    RE2 replace) — zero Python per row."""
    out = pc.utf8_normalize(arr, form="NFC")
    out = pc.utf8_lower(out)
    out = pc.utf8_normalize(out, form="NFD")
    out = pc.replace_substring_regex(out, r"\p{Mn}", "")
    return pc.utf8_normalize(out, form="NFC")


def fold_text(batch, col: str = "text", out: str | None = None):
    """Batch wrapper over :func:`fold_array` (adds ``<col>_folded``)."""
    folded = fold_array(batch.column(col))
    return batch.append_column(out or f"{col}_folded", folded)


def s_stem_array(arr: pa.ChunkedArray | pa.Array):
    """Harman "S-stemmer" — the conservative three-rule English plural
    stripper used by classic IR systems (stronger stemmers trade
    precision for recall; the S-stemmer almost never conflates
    distinct lemmas), vectorized as pure Arrow kernel chains and
    fully replayable as SQL CASE arms:

        ends ies (not eies/aies) -> ies=>y
        ends es  (not aes/ees/oes) -> drop the s
        ends s   (not us/ss) -> drop the s

    Suffix classes nest (ies within es within s) and the FIRST
    matching class decides: its exception list protects the word
    entirely (no fall-through — 'goes'/'does' stay intact).
    Applied to lowercase tokens; the bare tokens 's'/'es' reduce to
    ''/'e' (the rules are positional, not length-guarded — matching
    the SQL LIKE twin exactly)."""
    import pyarrow.compute as pc

    a = pc.utf8_lower(arr)

    def ends(suf):
        return pc.ends_with(a, suf)

    ok1 = pc.and_(pc.invert(ends("eies")), pc.invert(ends("aies")))
    ok2 = pc.and_(pc.invert(ends("aes")),
                  pc.and_(pc.invert(ends("ees")),
                          pc.invert(ends("oes"))))
    ok3 = pc.and_(pc.invert(ends("us")), pc.invert(ends("ss")))
    ies_y = pc.replace_substring_regex(a, "ies$", "y")
    drop_s = pc.replace_substring_regex(a, "s$", "")
    out = pc.if_else(
        ends("ies"), pc.if_else(ok1, ies_y, a),
        pc.if_else(
            ends("es"), pc.if_else(ok2, drop_s, a),
            pc.if_else(ends("s"), pc.if_else(ok3, drop_s, a), a)))
    return out
