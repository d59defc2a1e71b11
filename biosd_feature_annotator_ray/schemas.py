"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

The reference (``biosd_model`` JPA entities — SURVEY.md §1.1) uses a
fixed relational schema; we declare the columnar equivalents once here
and validate on read. Dictionary-encoding of low-cardinality columns
(pred/confidence/lang/kind) is applied at write time; in-flight batches
keep plain strings for kernel simplicity (Arrow dictionary arrays don't
survive every groupby path in Ray Data).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages — exactly BASELINE.json input_hint.
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# One row per detected characteristic mention (the reference's
# ExperimentalPropertyValue equivalent, SURVEY.md §1.1).
MENTIONS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("char_type", pa.string()),      # normalized type text
        pa.field("value_text", pa.string()),     # raw mention value
        pa.field("key", pa.string()),            # char_type + "|" + value_norm
        pa.field("span_start", pa.int32()),
        pa.field("span_end", pa.int32()),
    ]
)

# Flattened DataItem hierarchy (NumberItem / DateItem / *RangeItem —
# SURVEY.md §1.1) as a kind discriminator + sparse nullable columns.
TYPED_VALUE_FIELDS = [
    pa.field("kind", pa.string()),               # number|date|number_range|date_range|none
    pa.field("num", pa.float64()),
    pa.field("num_lo", pa.float64()),
    pa.field("num_hi", pa.float64()),
    pa.field("dt", pa.timestamp("us")),
    pa.field("dt_lo", pa.timestamp("us")),
    pa.field("dt_hi", pa.timestamp("us")),
    pa.field("unit_text", pa.string()),
    pa.field("note", pa.string()),               # comparator note: < <= > >=
]
TYPED_VALUES = pa.schema([pa.field("key", pa.string())] + TYPED_VALUE_FIELDS)

# One row per canonical annotation per key (reference ExpPropValAnnotation).
ANNOTATIONS = pa.schema(
    [
        pa.field("key", pa.string()),
        pa.field("term_uri", pa.string()),
        pa.field("term_label", pa.string()),
        pa.field("confidence", pa.string()),     # HIGH|GOOD|MEDIUM|LOW
        pa.field("score", pa.float32()),
        pa.field("provenance", pa.string()),     # curated|label|synonym|punct|tokenset
    ]
)

# Output triples (BASELINE.json north_star shape).
TRIPLES = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_kind", pa.string()),       # uri|number|date|number_range|date_range|string
        pa.field("obj_num", pa.float64()),
        pa.field("obj_num_hi", pa.float64()),
        pa.field("obj_dt", pa.timestamp("us")),
        pa.field("obj_dt_hi", pa.timestamp("us")),
        pa.field("unit_uri", pa.string()),
        pa.field("comparator", pa.string()),     # < <= > >= (typed rows; '<5' ≠ '5')
        pa.field("confidence", pa.string()),
        pa.field("score", pa.float32()),
    ]
)

GRAPH_EDGE = pa.struct(
    [
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_kind", pa.string()),
        pa.field("score", pa.float32()),
    ]
)
GRAPH_PARTS = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("edges", pa.list_(GRAPH_EDGE)),
        pa.field("part_id", pa.int32()),
    ]
)

# Dimension tables (replace the live ZOOMA / OLS services — SURVEY.md §2 S5/S6).
ONTOLOGY_TERMS = pa.schema(
    [
        pa.field("term_uri", pa.string()),
        pa.field("label", pa.string()),
        pa.field("synonyms", pa.list_(pa.string())),
        pa.field("ontology", pa.string()),
        pa.field("is_obsolete", pa.bool_()),
    ]
)
CURATED_MAPPINGS = pa.schema(
    [
        pa.field("char_type", pa.string()),
        pa.field("value_norm", pa.string()),
        pa.field("term_uri", pa.string()),
        pa.field("confidence", pa.string()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, name: str = "table") -> None:
    """Cheap schema validation on read: required column names + castable types."""
    missing = set(schema.names) - set(table.schema.names)
    if missing:
        raise ValueError(f"{name}: missing columns {sorted(missing)}")
