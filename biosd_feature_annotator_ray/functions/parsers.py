"""Vectorized typed-value parsers (SURVEY.md §2 M5–M9).

Re-expression of the reference's ``NumericalDataAnnotator`` regex /
format-cascade parsers (number, numeric range, date, date range, unit
suffix — SURVEY.md §2.2) as pyarrow.compute kernels over whole batches.
The grammar is normative in FIXTURES.md §2 (TO-RECONCILE-WITH-REFERENCE;
reference snapshot was empty): anchored full-string matches on the
trim+whitespace-collapsed value (case preserved — month names matter).

Precedence (first match wins):
  date_range > date cascade (incl. 4-digit-year window rule) >
  number_range > number > comparator-number; a trailing alpha unit
  token is split off before the numeric tiers ("34 weeks" → 34, "weeks").

Everything is Arrow-vectorized (RE2 extract_regex + strptime +
numpy.select); no Python loop over rows anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import TYPED_VALUE_FIELDS

NUM = r"[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_UNIT_TOK = r"[A-Za-z°µ%][A-Za-z°µ%]*"
UNIT = rf"{_UNIT_TOK}(?:\s{_UNIT_TOK})*"

_UNIT_SPLIT_RE = rf"^(?P<core>.*\d)\s+(?P<unit>{UNIT})$"
_NUM_RE = rf"^{NUM}$"
_RANGE_RE = rf"^(?P<lo>{NUM})\s*(?:-|–|to|\.\.)\s*(?P<hi>{NUM})$"
_CMP_RE = rf"^(?P<op><=|>=|<|>)\s*(?P<n>{NUM})$"
_DRANGE_SPACED_RE = r"^(?P<a>.+?)\s+(?:-|–|to)\s+(?P<b>.+)$"
_DRANGE_SLASH_RE = r"^(?P<a>[^/]+)/(?P<b>[^/]+)$"
_YEAR_RE = r"^\d{4}$"

# Date format cascade — order IS precedence (FIXTURES.md §2).
DATE_FORMATS = ["%Y-%m-%d", "%d/%m/%Y", "%d-%b-%Y", "%b %Y"]
YEAR_LO, YEAR_HI = 1800, 2100

_TS = pa.timestamp("us")
_NULL_TS = np.datetime64("NaT", "us")


def _strp(arr, fmt):
    """strptime → numpy datetime64[us] with NaT for non-matching rows."""
    ts = pc.strptime(arr, format=fmt, unit="us", error_is_null=True)
    return ts.to_numpy(zero_copy_only=False)


def _date_cascade(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (dt values datetime64[us], fmt index int8; -1 = no match).

    Index len(DATE_FORMATS) is the gated 4-digit-year rule.
    """
    n = len(arr)
    dt = np.full(n, _NULL_TS)
    fmt_idx = np.full(n, -1, dtype=np.int8)
    for i, fmt in enumerate(DATE_FORMATS):
        parsed = _strp(arr, fmt)
        take = (fmt_idx == -1) & ~np.isnat(parsed)
        dt[take] = parsed[take]
        fmt_idx[take] = i
    # Year-only rule: exactly 4 digits, window [1800, 2100].
    m_y4 = pc.match_substring_regex(arr, _YEAR_RE)
    m_y4 = pc.fill_null(m_y4, False).to_numpy(zero_copy_only=False)
    if m_y4.any():
        years = _strp(arr, "%Y")
        yr = np.where(np.isnat(years), 0, years.astype("datetime64[Y]").astype(int) + 1970)
        ok = m_y4 & (fmt_idx == -1) & (yr >= YEAR_LO) & (yr <= YEAR_HI)
        dt[ok] = years[ok]
        fmt_idx[ok] = len(DATE_FORMATS)
    return dt, fmt_idx


def _masked_cast_f64(str_arr, mask: np.ndarray) -> np.ndarray:
    """Cast strings to float64 only where mask; elsewhere NaN. Null-safe."""
    safe = pc.if_else(pa.array(mask), str_arr, pa.scalar(None, pa.string()))
    return pc.cast(safe, pa.float64()).to_numpy(zero_copy_only=False)


def parse_typed_values(values: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Parse a column of value strings → table with TYPED_VALUE_FIELDS.

    One output row per input row, aligned; kind == "none" where nothing
    in the grammar matched (value stays a string literal for linking).

    Fast path: every tier of the grammar requires at least one digit
    (numbers and ranges trivially; every date format includes a year),
    so the expensive regex/strptime cascade runs only on the COMPACTED
    digit-bearing subset and scatters back — non-digit mention values
    ("Homo sapiens", "liver", …) are the majority of a real corpus and
    cost one cheap match_substring_regex pass.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if values.type != pa.string():
        values = values.cast(pa.string())
    v_full = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.fill_null(values, "")), r"\s+", " ")
    n_full = len(v_full)
    m_digit = pc.fill_null(pc.match_substring_regex(v_full, r"\d"), False)
    idx = np.flatnonzero(m_digit.to_numpy(zero_copy_only=False))
    empty_cols = {
        "kind": pa.array(np.full(n_full, "none", dtype=object), pa.string()),
        "num": pa.nulls(n_full, pa.float64()),
        "num_lo": pa.nulls(n_full, pa.float64()),
        "num_hi": pa.nulls(n_full, pa.float64()),
        "dt": pa.nulls(n_full, _TS),
        "dt_lo": pa.nulls(n_full, _TS),
        "dt_hi": pa.nulls(n_full, _TS),
        "unit_text": pa.nulls(n_full, pa.string()),
        "note": pa.nulls(n_full, pa.string()),
    }
    if len(idx) == 0:
        return pa.table({f.name: empty_cols[f.name] for f in TYPED_VALUE_FIELDS})
    v = v_full.take(pa.array(idx))
    n = len(v)

    # ---- unit suffix split --------------------------------------------------
    us = pc.extract_regex(v, _UNIT_SPLIT_RE)
    has_us = pc.is_valid(us).to_numpy(zero_copy_only=False)
    core = pc.if_else(pc.is_valid(us), pc.struct_field(us, "core"), v)
    unit_raw = pc.struct_field(us, "unit")  # null where no split

    # ---- numeric tiers on core ---------------------------------------------
    m_num = pc.fill_null(pc.match_substring_regex(core, _NUM_RE), False).to_numpy(zero_copy_only=False)
    rng = pc.extract_regex(core, _RANGE_RE)
    m_rng = pc.is_valid(rng).to_numpy(zero_copy_only=False)
    cmp_ = pc.extract_regex(core, _CMP_RE)
    m_cmp = pc.is_valid(cmp_).to_numpy(zero_copy_only=False)

    num_plain = _masked_cast_f64(core, m_num)
    lo = _masked_cast_f64(pc.struct_field(rng, "lo"), m_rng)
    hi = _masked_cast_f64(pc.struct_field(rng, "hi"), m_rng)
    lo, hi = np.fmin(lo, hi), np.fmax(lo, hi)  # swap rule (FIXTURES §2 "5-2")
    cmp_num = _masked_cast_f64(pc.struct_field(cmp_, "n"), m_cmp)

    # ---- date tiers on the FULL value (dates never carry units) ------------
    dt, _ = _date_cascade(v)
    m_date = ~np.isnat(dt)

    dr_a = np.full(n, None, dtype=object)
    dt_lo = np.full(n, _NULL_TS)
    dt_hi = np.full(n, _NULL_TS)
    m_drange = np.zeros(n, dtype=bool)
    for pat in (_DRANGE_SPACED_RE, _DRANGE_SLASH_RE):
        dr = pc.extract_regex(v, pat)
        val = np.flatnonzero(pc.is_valid(dr).to_numpy(zero_copy_only=False))
        if len(val) == 0:
            continue
        # compact: the two-sided date cascade (8 strptime passes) runs
        # only on rows where the range pattern matched
        dr_sub = dr.take(pa.array(val))
        a_dt, a_fmt = _date_cascade(pc.struct_field(dr_sub, "a"))
        b_dt, b_fmt = _date_cascade(pc.struct_field(dr_sub, "b"))
        ok_sub = (a_fmt >= 0) & (a_fmt == b_fmt) & ~m_drange[val]
        tgt = val[ok_sub]
        dt_lo[tgt] = np.minimum(a_dt[ok_sub], b_dt[ok_sub])
        dt_hi[tgt] = np.maximum(a_dt[ok_sub], b_dt[ok_sub])
        m_drange[tgt] = True

    # ---- precedence select --------------------------------------------------
    sel_drange = m_drange
    sel_date = m_date & ~sel_drange
    sel_rng = m_rng & ~sel_drange & ~sel_date
    sel_num = m_num & ~sel_drange & ~sel_date & ~sel_rng
    sel_cmp = m_cmp & ~sel_drange & ~sel_date & ~sel_rng & ~sel_num

    kind = np.select(
        [sel_drange, sel_date, sel_rng, sel_num | sel_cmp],
        ["date_range", "date", "number_range", "number"],
        default="none",
    )
    numeric_unit = sel_rng | sel_num | sel_cmp
    unit_out = pc.if_else(pa.array(numeric_unit & has_us), unit_raw, pa.scalar(None, pa.string()))
    note = pc.if_else(pa.array(sel_cmp), pc.struct_field(cmp_, "op"), pa.scalar(None, pa.string()))

    # ---- scatter the subset results back to full length ---------------------
    kind_full = np.full(n_full, "none", dtype=object)
    kind_full[idx] = kind

    def f64(mask, vals):
        out = np.full(n_full, np.nan)
        out[idx] = np.where(mask, vals, np.nan)
        return pa.array(out, pa.float64(), from_pandas=True)

    def ts_col(mask, vals):
        out = np.full(n_full, _NULL_TS)
        out[idx] = np.where(mask, vals, _NULL_TS)
        return pa.array(out, _TS, from_pandas=True)

    def str_col(sub_arr):
        out = np.full(n_full, None, dtype=object)
        out[idx] = sub_arr.to_numpy(zero_copy_only=False)
        return pa.array(out, pa.string())

    cols = {
        "kind": pa.array(kind_full, pa.string()),
        "num": f64(sel_num | sel_cmp, np.where(sel_cmp, cmp_num, num_plain)),
        "num_lo": f64(sel_rng, lo),
        "num_hi": f64(sel_rng, hi),
        "dt": ts_col(sel_date, dt),
        "dt_lo": ts_col(sel_drange, dt_lo),
        "dt_hi": ts_col(sel_drange, dt_hi),
        "unit_text": str_col(unit_out),
        "note": str_col(note),
    }
    return pa.table({f.name: cols[f.name] for f in TYPED_VALUE_FIELDS})


def parse_batch(batch: pa.Table, value_col: str = "value_text") -> pa.Table:
    """map_batches kernel: append typed-value columns for ``value_col``."""
    typed = parse_typed_values(batch.column(value_col))
    out = batch
    for name in typed.column_names:
        out = out.append_column(name, typed.column(name))
    return out
