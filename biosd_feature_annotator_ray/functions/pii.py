"""Typed PII detection / redaction kernels (graft-added, r04).

A layer above :func:`normalize.mask_pattern`: four PII classes with
fixed RE2 patterns, per-class match COUNTS (computed independently on
the ORIGINAL text — an overlapping span counts in every class that
matches it) and a sequential REDACTION pass in the fixed order
email → credit-card → IP → phone: 16-digit card groups and dotted
IPv4s (which the looser phone pattern can partially match when an
interior octet has 3 digits) are both masked before phone runs.

All kernels are ``pyarrow.compute`` regex ops (RE2 — no lookbehind),
stateless and embarrassingly parallel; DuckDB's regexp functions run
the same RE2 engine, which is what makes the byte-exact SQL oracle
twin possible. The patterns are documented HEURISTICS (precision-
oriented common shapes, not full RFC validation): at 10^12 documents
the recall tail (obfuscated emails, exotic phone formats) belongs to
dedicated models, not this curation pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (class, RE2 pattern, placeholder) in REDACTION order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CC]"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d{1,3}[-. (]{1,2}\d{3}[-. )]{1,2}\d{3}[-. ]\d{2,4}",
     "[PHONE]"),
)


def detect_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append one ``n_<class>`` int32 count column per PII class
    (match counts on the original text; null text → null counts)."""
    col = batch.column(text_col)
    for name, pattern, _repl in PII_PATTERNS:
        n = pc.cast(pc.count_substring_regex(col, pattern), pa.int32())
        batch = batch.append_column(f"n_{name}", n)
    return batch


def redact_pii(batch: pa.Table, text_col: str = "text",
               out: str | None = None) -> pa.Table:
    """Append ``<text_col>_redacted`` (or ``out``): the text with all
    four PII classes replaced by their placeholder tokens, applied in
    the fixed class order."""
    masked = batch.column(text_col)
    for _name, pattern, repl in PII_PATTERNS:
        masked = pc.replace_substring_regex(masked, pattern, repl)
    return batch.append_column(out or f"{text_col}_redacted", masked)
