"""Canonicalization / dedup shuffle machinery (SURVEY.md §2 A1, A2, K1, K4).

The reference memoizes per distinct text key in a process-global store
(``AnnotatorResources.getStore`` — SURVEY.md §2.3 ST1); distributed, the
same semantics become a distinct-key reduction + groupby-argmax. These
operators implement the scalable pattern:

  1. **map-side combine** — local (per-batch) dedup / partial aggregate
     inside ``map_batches``, which collapses Zipf-skewed hot keys
     ("Homo sapiens" on 40% of pages) to ≤1 row per key per batch
     BEFORE anything shuffles;
  2. **bucket shuffle** — group by ``stable_hash(key) % n_buckets``
     (optionally × ``salt`` sub-buckets for a two-level reduce), so the
     shuffle moves int32 bucket ids and the per-group Python cost is
     per-BUCKET, not per-key;
  3. **vectorized in-bucket finish** — pandas/Arrow kernels inside each
     bucket group (drop_duplicates / groupby-sum / sort+first).

All tie-breaks are total orders → results are deterministic regardless
of block arrival order, so salted and unsalted plans agree (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import bucket as _hash_bucket, hash_columns

_B = "__bucket"
_S = "__salt"
_H = "__h"


def _add_bucket(batch: pa.Table, cols: list[str], nb: int, salt: int = 0) -> pa.Table:
    h = hash_columns(batch, cols)
    out = batch.append_column(_B, pa.array(_hash_bucket(h, nb)))
    if salt > 1:
        # Round-robin sub-bucket: any assignment is valid because the
        # in-bucket finish is associative; round-robin is deterministic
        # given block content.
        out = out.append_column(_S, pa.array((np.arange(len(batch)) % salt).astype(np.int32)))
    return out


def dedup_exact(
    ds: "ray.data.Dataset",
    cols: list[str],
    nb: int = 64,
    keep_order_col: "str | list[str] | None" = None,
    salt: int = 1,
    keep_ascending: "list[bool] | None" = None,
) -> "ray.data.Dataset":
    """Exact dedup on ``cols`` (SURVEY.md A2). Keeps the first row by
    ``keep_order_col`` (one column or a list, with optional per-column
    ``keep_ascending``), or an arbitrary-but-deterministic first by a
    full-row sort when None. ``salt > 1`` enables the two-level hot-key
    reduce (identical output — dedup-first is associative;
    parity-tested)."""

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic survivor: order by keep_order_col, else by EVERY
        # column — without a sort, 'first' depends on block arrival
        # order (and salted vs unsalted plans could keep different rows)
        if keep_order_col:
            order = ([keep_order_col] if isinstance(keep_order_col, str)
                     else list(keep_order_col))
            asc = keep_ascending if keep_ascending is not None else True
        else:
            order, asc = list(df.columns), True
        df = df.sort_values(order, ascending=asc, kind="mergesort")
        return df.drop_duplicates(subset=cols, keep="first")

    def local(batch: pa.Table) -> pa.Table:
        df = _dedup(batch.to_pandas())
        return _add_bucket(pa.Table.from_pandas(df, preserve_index=False), cols, nb, salt)

    def finish_salted(group: pa.Table) -> pa.Table:
        df = _dedup(group.drop_columns([_S]).to_pandas())
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(group: pa.Table) -> pa.Table:
        df = _dedup(group.drop_columns([_B]).to_pandas())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    if salt > 1:
        out = out.groupby([_B, _S]).map_groups(finish_salted, batch_format="pyarrow")
    return out.groupby(_B).map_groups(finish, batch_format="pyarrow")


def recommend_salt(ds: "ray.data.Dataset", col: str, sample_rows: int = 65536,
                   max_salt: int = 16, hot_share: float = 0.05) -> int:
    """K4 → salting wire-up (round-1 verdict item 10): estimate the
    hottest key's share from a bounded sample (streaming ``limit`` — no
    full pass) and recommend a two-level-reduce salt. share < hot_share
    → 1 (salting costs an extra pass); above it, roughly one extra
    sub-bucket per 6% of share, capped."""
    sample = ds.limit(sample_rows)
    counts = distinct_counts(sample, col, nb=4).to_pandas()
    total = counts["count"].sum()
    if total == 0:
        return 1
    share = counts["count"].max() / total
    if share < hot_share:
        return 1
    return max(2, min(max_salt, int(round(share / 0.06))))


def distinct_counts(ds: "ray.data.Dataset", col: str, nb: int = 64) -> "ray.data.Dataset":
    """Distinct values of ``col`` with exact global counts (A1 key
    reduction + the K4 hot-key report input). Partial counts per batch,
    bucket shuffle, vectorized in-bucket sum."""

    def local(batch: pa.Table) -> pa.Table:
        # dropna=False: SQL DISTINCT keeps the null group (it can be
        # the true hot key — recommend_salt reads this distribution)
        vc = batch.column(col).to_pandas().value_counts(dropna=False)
        t = pa.table({col: pa.Array.from_pandas(pd.Series(vc.index),
                                                type=batch.schema.field(col).type),
                      "count": pa.array(vc.to_numpy(), pa.int64())})
        return _add_bucket(t, [col], nb)

    def finish(group: pa.Table) -> pa.Table:
        df = group.select([col, "count"]).to_pandas()
        out = df.groupby(col, sort=False, as_index=False, dropna=False)["count"].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def _annotate_via_probe(out, ds, *fns):
    """Annotate ``out`` (an Arrow-native bucket plan over ``ds``) with
    its known schema by running the plan's per-batch fns on a
    ZERO-ROW table of the input schema — exact because every fn here
    is a typed Arrow expression (group_by aggregates, explicit
    ``pa.table`` builders), so its output schema is value-independent.
    Skipped silently when the input schema isn't cheaply known or a
    probe objects; consumers then fall back to Ray's paying
    schema fetch."""
    from .util import cheap_arrow_schema, with_schema

    sch = cheap_arrow_schema(ds)
    if sch is None:
        return out
    try:
        t = sch.empty_table()
        for fn in fns:
            t = fn(t)
        if isinstance(t, pa.Table):
            with_schema(out, t.schema)
    except Exception:  # noqa: BLE001 — annotation is best-effort
        pass
    return out


def sum_by_key(ds: "ray.data.Dataset", key: "str | list[str]",
               col: str, nb: int = 64,
               out_col: "str | None" = None) -> "ray.data.Dataset":
    """Exact per-key sums of ``col`` via the bucket plan (map-side
    partial Arrow group_by → 16-ish-int bucket shuffle → per-bucket
    Arrow group_by). Ray's sort-based ``groupby(key).aggregate(Sum)``
    pays seconds of fixed overhead per call regardless of size
    (measured ~4 s on 150k rows); this is the per-iteration
    aggregation primitive for the iterative graph operators, costing
    one cheap bucket sort instead. ``key`` may be a single column or a
    composite-key list. Null keys form their own group (Arrow group_by
    semantics), matching SQL GROUP BY."""
    keys = [key] if isinstance(key, str) else list(key)

    def _sum(t: pa.Table, name: str) -> pa.Table:
        g = (t.select(keys + [col])
             .group_by(keys).aggregate([(col, "sum")]))
        cols = {k: g.column(k) for k in keys}
        cols[name] = g.column(f"{col}_sum")
        return pa.table(cols)

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(_sum(batch, col), keys, nb)

    def finish(group: pa.Table) -> pa.Table:
        return _sum(group, out_col or col)

    out = (ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)
           .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    return _annotate_via_probe(out, ds, local, finish)


def sums_by_key(ds: "ray.data.Dataset", key: "str | list[str]",
                cols: "list[str]", nb: int = 64) -> "ray.data.Dataset":
    """Multi-column sibling of :func:`sum_by_key`: exact per-key sums
    of EVERY column in ``cols`` in ONE bucket plan — when an operator
    needs several per-key sums over the same keys (pair counts +
    Adamic–Adar weights, log-scores + mention counts), this replaces
    N ``sum_by_key`` passes plus the join that re-combines them with
    a single map-side-combined shuffle. Output columns keep their
    input names."""
    keys = [key] if isinstance(key, str) else list(key)

    def _sum(t: pa.Table) -> pa.Table:
        g = (t.select(keys + cols)
             .group_by(keys).aggregate([(c, "sum") for c in cols]))
        out = {k: g.column(k) for k in keys}
        for c in cols:
            out[c] = g.column(f"{c}_sum")
        return pa.table(out)

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(_sum(batch), keys, nb)

    def finish(group: pa.Table) -> pa.Table:
        return _sum(group)

    out = (ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)
           .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    return _annotate_via_probe(out, ds, local, finish)


def groupby_argmax(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    order_cols: list[str],
    ascending: list[bool],
    nb: int = 64,
    salt: int = 1,
) -> "ray.data.Dataset":
    """One best row per key (A1/K1): argmax by a total order
    (``order_cols`` + ``ascending``; key_cols appended as final
    tie-break so the order is total → deterministic).

    ``salt > 1`` enables the documented two-level hot-key reduce: first
    reduce within (bucket, salt) sub-groups, then within buckets —
    output is identical (tested) because argmax over a total order is
    associative.
    """
    oc = order_cols + [k for k in key_cols if k not in order_cols]
    asc = ascending + [True] * (len(oc) - len(order_cols))

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(oc, ascending=asc, kind="mergesort")
        return df.drop_duplicates(subset=key_cols, keep="first")

    def local(batch: pa.Table) -> pa.Table:
        df = best(batch.to_pandas())
        return _add_bucket(pa.Table.from_pandas(df, preserve_index=False), key_cols, nb, salt)

    def finish_salted(group: pa.Table) -> pa.Table:
        df = best(group.drop_columns([_S]).to_pandas())
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(group: pa.Table) -> pa.Table:
        df = best(group.drop_columns([_B]).to_pandas())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    if salt > 1:
        out = out.groupby([_B, _S]).map_groups(finish_salted, batch_format="pyarrow")
    return out.groupby(_B).map_groups(finish, batch_format="pyarrow")


def groupby_topk(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    order_cols: list[str],
    ascending: list[bool],
    k: int,
    nb: int = 64,
) -> "ray.data.Dataset":
    """k best rows per key (generalizes ``groupby_argmax`` beyond
    k=1): order by ``order_cols``+``ascending`` with key_cols appended
    as the final tie-break (total order → deterministic output).

    Map-side combiner: every batch keeps ≤ k rows per key BEFORE the
    bucket shuffle, so at most k·distinct_keys rows move — top-k is
    associative, the per-bucket finish re-ranks the survivors."""
    oc = order_cols + [c for c in key_cols if c not in order_cols]
    asc = ascending + [True] * (len(oc) - len(order_cols))

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(oc, ascending=asc, kind="mergesort")
        return df.groupby(key_cols, sort=False, dropna=False).head(k)

    def local(batch: pa.Table) -> pa.Table:
        df = best(batch.to_pandas())
        return _add_bucket(pa.Table.from_pandas(df, preserve_index=False), key_cols, nb)

    def finish(group: pa.Table) -> pa.Table:
        df = best(group.drop_columns([_B]).to_pandas())
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def set_op(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    col: str,
    op: str = "intersect",
    nb: int = 64,
) -> "ray.data.Dataset":
    """Distinct set operations over one key column — SQL
    UNION / INTERSECT / EXCEPT (all DISTINCT semantics). Each side is
    tagged with a presence bit, locally deduped per batch (map-side
    combine — hot values collapse before the exchange), then one bucket
    shuffle ORs the bits per value and keeps:

      union → any bit, intersect → both bits, except → only side A.

    Output: a single distinct ``col`` column. Scale shape: the shuffle
    carries ≤ one row per (value, side) per batch; no side is ever
    broadcast, so both inputs may be fact-sized."""
    if op not in ("union", "intersect", "except"):
        raise ValueError(f"unknown set op: {op}")

    def tag(bit: int):
        def f(batch: pa.Table) -> pa.Table:
            vals = batch.column(col).combine_chunks().unique()
            t = pa.table({col: vals,
                          "_tag": pa.array(np.full(len(vals), bit, np.int32))})
            return _add_bucket(t, [col], nb)

        return f

    tagged = a.map_batches(tag(1), batch_format="pyarrow", batch_size=65536).union(
        b.map_batches(tag(2), batch_format="pyarrow", batch_size=65536)
    )

    def finish(group: pa.Table) -> pa.Table:
        df = group.select([col, "_tag"]).to_pandas()
        # tags ∈ {1, 2}: per-value min/max recovers the presence bits
        # without a per-group Python OR (vectorized pandas agg).
        # dropna=False: SQL set ops treat NULLs as equal and KEEP them
        # (pandas groupby silently drops null group keys by default).
        mm = df.groupby(col, sort=False, dropna=False)["_tag"].agg(["min", "max"])
        if op == "union":
            keep = mm.index
        elif op == "intersect":
            keep = mm.index[(mm["min"].to_numpy() == 1) & (mm["max"].to_numpy() == 2)]
        else:
            keep = mm.index[mm["max"].to_numpy() == 1]
        # from_pandas=True maps pandas NA/NaN group keys to Arrow null
        # (a raw to_numpy() of a nullable index floats NA into NaN and
        # breaks the int cast)
        return pa.table({col: pa.Array.from_pandas(
            pd.Series(keep), type=group.schema.field(col).type)})

    return tagged.groupby(_B).map_groups(finish, batch_format="pyarrow")


def set_op_all(
    a: "ray.data.Dataset",
    b: "ray.data.Dataset",
    col: str,
    op: str = "intersect",
    nb: int = 64,
) -> "ray.data.Dataset":
    """BAG-semantics set operations — SQL INTERSECT ALL / EXCEPT ALL:
    per-value output multiplicity is ``min(count_a, count_b)`` resp.
    ``max(0, count_a - count_b)``.

    Same shuffle shape as ``set_op`` but the map side ships per-batch
    (value, partial count, side) rows instead of presence bits; the
    reduce sums counts per side and re-expands values ``np.repeat``-
    vectorized. NULLs compare equal and keep their multiplicity, as in
    SQL set ops."""
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown bag set op: {op}")

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({col: batch.column(col).to_pandas()})
            cnt = (df.groupby(col, sort=False, dropna=False)
                   .size().reset_index(name="_n"))
            t = pa.table({
                col: pa.Array.from_pandas(cnt[col],
                                          type=batch.schema.field(col).type),
                "_n": pa.array(cnt["_n"].to_numpy(), pa.int64()),
                "_side": pa.array(np.full(len(cnt), side, np.int32))})
            return _add_bucket(t, [col], nb)

        return f

    tagged = a.map_batches(tag(0), batch_format="pyarrow", batch_size=65536).union(
        b.map_batches(tag(1), batch_format="pyarrow", batch_size=65536)
    )

    def finish(group: pa.Table) -> pa.Table:
        df = group.select([col, "_n", "_side"]).to_pandas()
        # per (value, side) count sums, then a vectorized multiplicity
        piv = (df.groupby([col, "_side"], sort=False, dropna=False)["_n"]
               .sum().unstack("_side", fill_value=0)
               .reindex(columns=[0, 1], fill_value=0))
        ca = piv[0].to_numpy(dtype=np.int64)
        cb = piv[1].to_numpy(dtype=np.int64)
        m = (np.minimum(ca, cb) if op == "intersect"
             else np.maximum(ca - cb, 0))
        keep = m > 0
        vals = pa.Array.from_pandas(pd.Series(piv.index[keep]),
                                    type=group.schema.field(col).type)
        reps = pa.array(np.repeat(np.arange(len(vals)), m[keep]))
        return pa.table({col: vals.take(reps)})

    return tagged.groupby(_B).map_groups(finish, batch_format="pyarrow")


CONFIDENCE_RANK = {"HIGH": 3, "GOOD": 2, "MEDIUM": 1, "LOW": 0}
_CONF_LEVELS = pa.array(["HIGH", "GOOD", "MEDIUM", "LOW"])
_CONF_RANKS = np.array([3, 2, 1, 0, -1], dtype=np.int32)  # last = unknown/null


def confidence_ranks(conf: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized CONFIDENCE_RANK lookup (one pc.index_in, no per-row
    Python map) — the finalize hot loop runs this on every partition."""
    import pyarrow.compute as _pc

    idx = _pc.fill_null(_pc.index_in(conf, value_set=_CONF_LEVELS), len(_CONF_LEVELS))
    return _CONF_RANKS[idx.to_numpy(zero_copy_only=False)]


def canonicalize_annotations(ann: "ray.data.Dataset", nb: int = 64, salt: int = 1) -> "ray.data.Dataset":
    """One annotation per key: best candidate by (confidence rank desc,
    score desc, term_uri asc) — FIXTURES.md §3.3 tie-break."""

    def add_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column("_crank", pa.array(confidence_ranks(batch.column("confidence"))))

    ranked = ann.map_batches(add_rank, batch_format="pyarrow", batch_size=65536)
    best = groupby_argmax(
        ranked, ["key"], ["_crank", "score", "term_uri"], [False, False, True], nb=nb, salt=salt
    )
    return best.drop_columns(["_crank"])


def pivot_sum(
    ds: "ray.data.Dataset",
    index_col: str,
    pivot_col: str,
    value_col: str,
    categories: list[str],
) -> "ray.data.Dataset":
    """Pivot: one output row per ``index_col`` with one SUM column per
    category of ``pivot_col`` (missing → 0.0). Map-side partial pivot
    collapses each batch to ≤1 row per index value BEFORE the shuffle —
    the exchange moves pre-aggregated wide rows, not events."""
    cats = list(categories)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([index_col, pivot_col, value_col]).to_pandas()
        # NOT pivot_table: it silently drops the NaN index group where
        # SQL GROUP BY keeps the null group (r04 fuzz finding). A null
        # value contributes 0 to its sum — same result as SQL's skip.
        v = df[value_col].fillna(0.0).to_numpy(dtype=np.float64)
        pv = df[pivot_col].to_numpy()
        part = pd.DataFrame({index_col: df[index_col],
                             **{c: np.where(pv == c, v, 0.0) for c in cats}})
        g = part.groupby(index_col, as_index=False, dropna=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(index_col)
        .aggregate(*[Sum(c, alias_name=c) for c in cats])
    )


def melt(
    ds: "ray.data.Dataset",
    index_col: str,
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> "ray.data.Dataset":
    """UNPIVOT — the inverse of ``pivot_sum``: widen columns back to
    (index, variable, value) rows. Pure row-local expansion (numpy
    repeat/tile inside map_batches), no shuffle."""
    cats = list(value_cols)

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = batch.column(index_col).take(pa.array(np.repeat(np.arange(n), len(cats))))
        names = pa.array(np.tile(np.array(cats, dtype=object), n), pa.string())
        cols = [batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in cats]
        vals = pa.array(np.column_stack(cols).ravel(), pa.float64())
        return pa.table({index_col: idx, var_name: names, value_name: vals})

    return ds.map_batches(expand, batch_format="pyarrow", batch_size=65536)


def incremental_agg(
    base_agg: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    key_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
    n_col: str = "n",
    sum_col: str = "s",
    cents: bool = True,
) -> "ray.data.Dataset":
    """Incremental materialized-view maintenance for (count, sum)
    groups: merge a ``delta`` of raw rows — weight +1 inserts, −1
    retractions via ``weight_col`` — into a stored ``base_agg`` of
    ``(key…, n, s)`` WITHOUT recomputing from the base facts.

    The delta collapses map-side to per-batch (key, Σw, Σw·value)
    partials; the stored aggregate streams in as-is; one small groupby
    merges both. With ``cents=True`` sums travel as integer cents so
    insert/retract cancellation is exact (no float residue on fully
    retracted groups). Groups whose maintained count drops to ≤ 0 are
    removed — over-retraction is the caller's bug, not a negative row.
    """

    def delta_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        w = (df[weight_col].to_numpy() if weight_col
             else np.ones(len(df), np.int64)).astype(np.int64)
        v = df[value_col].to_numpy(dtype=np.float64)
        sv = (np.round(v * 100).astype(np.int64) if cents else v) * w
        part = pd.DataFrame({**{k: df[k] for k in key_cols},
                             n_col: w, sum_col: sv})
        g = part.groupby(key_cols, as_index=False, dropna=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def base_prep(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[key_cols + [n_col, sum_col]]
        if cents:
            df[sum_col] = np.round(
                df[sum_col].to_numpy(dtype=np.float64) * 100).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    merged = (delta.map_batches(delta_partial, batch_format="pyarrow",
                                batch_size=65536)
              .union(base_agg.map_batches(base_prep,
                                          batch_format="pyarrow"))
              .groupby(key_cols)
              .aggregate(Sum(n_col, alias_name=n_col),
                         Sum(sum_col, alias_name=sum_col)))

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.greater(batch.column(n_col), 0))
        if cents:
            s = t.column(sum_col).to_numpy(zero_copy_only=False) / 100.0
            t = t.set_column(t.schema.get_field_index(sum_col), sum_col,
                             pa.array(s, pa.float64()))
        return t

    return merged.map_batches(finish, batch_format="pyarrow")


def grouping_sets_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    sets: "list[list[str]]",
    value_col: str,
    n_col: str = "n_rows",
    sum_col: str = "sum_value",
    decimals: int | None = 2,
    grouping_col: str | None = None,
) -> "ray.data.Dataset":
    """GROUP BY GROUPING SETS(sets): count + sum at every requested
    subset of ``keys`` — rolled-up key columns null, exactly like SQL.

    ``grouping_col``: when set, appends SQL's ``GROUPING(*keys)``
    bitmask (leftmost key = most-significant bit; bit set = that key
    is rolled up in the row's level), which disambiguates a
    genuinely-NULL key value from a rolled-up one — without it that
    ambiguity is shared with SQL itself (keep keys non-null or
    pre-fill a sentinel).

    Shape: ONE wide shuffle (the finest groupby over map-side
    partials); every requested set then re-aggregates that
    already-small finest table — never an extra pass over the facts.

    ``decimals`` (validated integer scaling): with an int, sums travel
    as 10^decimals-scaled integers so cross-level re-aggregation is
    exactly associative; values that don't fit the scale RAISE instead
    of silently quantizing, and an int64 wrap of the scaled SUMS is
    detected by a float shadow sum. ``decimals=None`` falls back to
    float64 sums. NULL values raise either way."""
    from ray.data.aggregate import Sum

    import ray.data as rd

    from .join import _arrow_schema

    sets = [list(g) for g in sets]
    if not sets:
        raise ValueError("grouping_sets_agg: sets must name at least one "
                         "grouping set (use [[]] for the grand total)")
    for g in sets:
        extra = [c for c in g if c not in keys]
        if extra:
            raise ValueError(f"grouping_sets_agg: set {g} has columns "
                             f"{extra} not in keys={keys}")
    scale = None if decimals is None else float(10 ** decimals)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df[value_col].isna().any():
            raise ValueError(
                f"grouping_sets_agg: {value_col!r} contains NULLs — SQL "
                "SUM skips them but COUNT(*) does not; fill or filter "
                "upstream so the intent is explicit")
        v = df[value_col].to_numpy(dtype=np.float64)
        if scale is None:
            sums = v
        else:
            scaled = v * scale
            if len(scaled) and np.abs(scaled).max() >= 2.0 ** 62:
                raise ValueError(
                    f"grouping_sets_agg: |{value_col}|*10^{decimals} "
                    "exceeds the int64-safe range — use a smaller "
                    "decimals or decimals=None (float sums)")
            sums = np.round(scaled).astype(np.int64)
            # PER-ELEMENT relative tolerance (r04: a batch-max
            # threshold let small values quantize silently next to one
            # large value)
            err = np.abs(sums - scaled)
            bad = err > 1e-6 * np.maximum(1.0, np.abs(scaled))
            if bad.any():
                raise ValueError(
                    f"grouping_sets_agg: {value_col!r} has values with "
                    f"more than {decimals} fractional digits (e.g. "
                    f"{v[bad][0]!r}) — raise decimals or pass "
                    "decimals=None (float sums)")
        part = pd.DataFrame({**{k: df[k] for k in keys},
                             n_col: np.ones(len(df), np.int64), sum_col: sums,
                             # float shadow sum: detects int64 wrap of
                             # the scaled sums at finish
                             "_fchk": v})
        g = part.groupby(keys, as_index=False, dropna=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    aggs = lambda: (Sum(n_col, alias_name=n_col),  # noqa: E731
                    Sum(sum_col, alias_name=sum_col),
                    Sum("_fchk", alias_name="_fchk"))
    finest = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
              .groupby(keys)
              .aggregate(*aggs())
              .materialize())
    fsch = _arrow_schema(finest)
    ktype = {k: fsch.field(k).type for k in keys}

    def _wrap_check(s: np.ndarray, f: np.ndarray) -> None:
        # int64 wrap detector: the exact scaled-int sum must track the
        # float shadow sum to float precision; a wrapped sum is off by
        # ~2^64/scale and trips immediately
        if scale is None or not len(s):
            return
        diff = np.abs(s - f)
        if (diff > 1e-6 * np.maximum(1.0, np.abs(f))).any():
            raise ValueError(
                "grouping_sets_agg: scaled-integer sum overflowed int64 "
                "(group sums too large for this decimals) — use "
                "decimals=None (float sums) or a smaller decimals")

    m = len(keys)

    def _gid(level_keys: list[str]) -> int:
        return sum(1 << (m - 1 - i) for i, k in enumerate(keys)
                   if k not in level_keys)

    def widen(level_keys: list[str]):
        gid = _gid(level_keys)

        def f(batch: pa.Table) -> pa.Table:
            cols = [batch.column(k).cast(ktype[k]) if k in level_keys
                    else pa.nulls(len(batch), ktype[k]) for k in keys]
            cols.append(batch.column(n_col).cast(pa.int64()))
            s = batch.column(sum_col).to_numpy(zero_copy_only=False)
            s = s / scale if scale is not None else s.astype(np.float64)
            _wrap_check(s, batch.column("_fchk").to_numpy(
                zero_copy_only=False))
            cols.append(pa.array(s, pa.float64()))
            names = keys + [n_col, sum_col]
            if grouping_col is not None:
                cols.append(pa.array(
                    np.full(len(batch), gid, np.int64)))
                names = names + [grouping_col]
            return pa.table(cols, names=names)
        return f

    levels = []
    for g in sets:
        if sorted(g) == sorted(keys):
            levels.append(finest.map_batches(widen(keys),
                                             batch_format="pyarrow"))
        elif g:
            lv = finest.groupby(g).aggregate(*aggs()).materialize()
            levels.append(lv.map_batches(widen(g), batch_format="pyarrow"))
        else:  # grand total
            tot = finest.aggregate(*aggs())
            tot_s = (float(tot[sum_col] or 0)
                     / (scale if scale is not None else 1.0))
            _wrap_check(np.array([tot_s]),
                        np.array([float(tot["_fchk"] or 0)]))
            cols = ([pa.nulls(1, ktype[k]) for k in keys]
                    + [pa.array([int(tot[n_col] or 0)], pa.int64()),
                       pa.array([tot_s], pa.float64())])
            names = keys + [n_col, sum_col]
            if grouping_col is not None:
                cols.append(pa.array([_gid([])], pa.int64()))
                names = names + [grouping_col]
            total_tbl = pa.table(cols, names=names)
            levels.append(rd.from_arrow(total_tbl))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def rollup_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    n_col: str = "n_rows",
    sum_col: str = "sum_value",
    decimals: int | None = 2,
    grouping_col: str | None = None,
) -> "ray.data.Dataset":
    """GROUP BY ROLLUP(keys): every prefix level of the key hierarchy —
    (k1..km), (k1..km-1), …, grand total. Thin wrapper over
    ``grouping_sets_agg`` (see it for the decimals/validation
    contract)."""
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets_agg(ds, keys, sets, value_col, n_col=n_col,
                             sum_col=sum_col, decimals=decimals,
                             grouping_col=grouping_col)


def cube_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    value_col: str,
    n_col: str = "n_rows",
    sum_col: str = "sum_value",
    decimals: int | None = 2,
    grouping_col: str | None = None,
) -> "ray.data.Dataset":
    """GROUP BY CUBE(keys): every subset of the keys (2^m levels) —
    thin wrapper over ``grouping_sets_agg``. Keep m small (SQL's own
    advice); each level is a tiny re-aggregation of the finest
    aggregate, not a pass over the facts."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_agg(ds, keys, sets, value_col, n_col=n_col,
                             sum_col=sum_col, decimals=decimals,
                             grouping_col=grouping_col)


def rebalance_sample(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    cap: int,
    nb: int = 64,
) -> "ray.data.Dataset":
    """Head-key downsampling for training-data curation: keep each
    ``key_col`` group's EXPECTED size at ≤ ``cap`` rows by thresholding
    a cross-system-deterministic md5 uniform of ``id_col`` — groups
    already under the cap pass untouched. The web-corpus analogue is
    capping over-represented domains without a sort or a per-key
    shuffle: pass 1 is the small ``distinct_counts`` key census
    (broadcast once via ray.put), pass 2 a stateless vectorized filter.

    Determinism contract: a row survives iff
    ``md5_u32(id) < floor(2^32 * cap / n_key)`` — the float64 threshold
    is computed identically by numpy and the DuckDB oracle expression,
    so outputs are value-exact across engines and runs.
    """
    import ray as _ray

    from ..functions.hashing import md5_u32

    census = distinct_counts(ds, key_col, nb=nb).to_pandas()
    thresh = {
        k: (1 << 32) if n <= cap else int(np.floor(4294967296.0 * cap / n))
        for k, n in zip(census[key_col], census["count"])
    }
    ref = _ray.put(thresh)

    def keep(batch: pa.Table) -> pa.Table:
        t = _ray.get(ref)
        kser = batch.column(key_col).to_pandas()
        lim = kser.map(t).to_numpy(dtype=np.float64)
        # null keys are not a "domain" — pass through uncapped (dict
        # lookup of NaN is unreliable; make the choice explicit)
        lim[kser.isna().to_numpy()] = float(1 << 32)
        h = md5_u32(batch.column(id_col).to_pylist()).astype(np.float64)
        return batch.filter(pa.array(h < lim))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=65536)


def groupby_nunique(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    nb: int = 64,
) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT col) per key. Map-side per-batch pair
    dedup, then ONE bucket shuffle keyed on the (key, value) PAIR — a
    hot key's distinct values spread across buckets instead of melting
    one — per-bucket dedup emits per-key partial counts, and a final
    tiny groupby-sum (one row per key per bucket) totals them. SQL
    semantics: null values are not counted; the null KEY group is kept.
    """

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).to_pandas()
        df = df[df[col].notna()].drop_duplicates()
        return _add_bucket(pa.Table.from_pandas(df, preserve_index=False),
                           [key_col, col], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas().drop_duplicates()
        out = (df.groupby(key_col, dropna=False, sort=False)
               .size().reset_index(name="n_part"))
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = (ds.map_batches(local, batch_format="pyarrow",
                            batch_size=65536)
             .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    from .util import cheap_arrow_schema, with_schema
    sch = cheap_arrow_schema(ds)
    if sch is not None and key_col in sch.names:
        kt = sch.field(key_col).type
        # annotate only drift-stable key types (string survives the
        # pandas roundtrip; a nullable int key would drift to float)
        if pa.types.is_string(kt) or pa.types.is_large_string(kt):
            with_schema(parts, pa.schema([
                pa.field(key_col, kt),
                pa.field("n_part", pa.int64())]))
    # bucket-plan final sum instead of Ray's sort groupby (seconds of
    # fixed cost per call) — identical per-key totals, and the output
    # schema annotates through the probe
    return sum_by_key(parts, key_col, "n_part", nb=nb,
                      out_col="n_distinct")


def mode_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    nb: int = 64,
) -> "ray.data.Dataset":
    """Most frequent value of ``col`` per key (deterministic tie-break:
    smallest value wins). Exact counts via map-side pre-combine + one
    (key, value)-bucketed shuffle, then the existing groupby_topk(k=1)
    combiner-reduce picks the argmax — both exchanges move only
    (key, value, count) partials, never the row stream. Null values are
    excluded (SQL mode() semantics)."""
    from ray.data.aggregate import Sum

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, col]).to_pandas()
        df = df[df[col].notna()]
        g = (df.groupby([key_col, col], dropna=False, sort=False)
             .size().reset_index(name="n_part"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(local, batch_format="pyarrow",
                             batch_size=65536)
              .groupby([key_col, col])
              .aggregate(Sum("n_part", alias_name="n")))
    top = groupby_topk(counts, [key_col], ["n", col], [False, True], k=1,
                       nb=nb)
    return top.map_batches(
        lambda t: t.rename_columns(
            [{"n": "n_mode", col: "mode"}.get(c, c)
             for c in t.column_names]),
        batch_format="pyarrow")


def mixture_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    weights: "dict[str, float]",
    total_n: int,
    id_col: str,
    seed: int = 0,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Target-mixture sampling for training-data curation (the
    "mixture weights" knob of every LM data recipe — e.g. the
    domain-weight tables of GPT-3/Pile-style corpora): each group
    ``g`` in ``weights`` contributes its quota ``floor(total_n *
    weights[g])`` rows — the md5-smallest rows of that group under
    the replayable ``md5(id:seed)`` draw (the repo's deterministic-
    sampling contract) — groups not in ``weights`` are excluded, and
    a group smaller than its quota contributes everything it has
    (the honest shortfall; upsampling is a repeat-read policy, not a
    sampling one). Unlike :func:`rebalance_sample` (CAPS heavy
    groups) or stratified sampling (one fraction per group), this
    hits absolute per-group TARGETS.

    Scale shape: the weight table broadcasts inside the map stage
    (it is tiny by definition); ranking is ONE key-bucket shuffle
    (:func:`~.windows.rank_per_key`, hot-key spill path included);
    the quota filter is a vectorized lookup.

    Returns the sampled rows ``(id_col, group_col)``.
    """
    import hashlib

    import pyarrow.compute as pc

    from .windows import rank_per_key

    if total_n < 1:
        raise ValueError("total_n must be >= 1")
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    # floor of the REAL product, not the binary-float one:
    # 0.29 * 100 = 28.999999999999996 must still floor to 29
    quota = {g: int(total_n * w + 1e-9) for g, w in weights.items()}

    def add_md5(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, group_col]).filter(pc.and_kleene(
            pc.is_valid(batch.column(id_col)),
            pc.is_valid(batch.column(group_col))))
        gs = t.column(group_col).to_pylist()
        keep = np.array([g in quota for g in gs], dtype=bool)
        t = t.filter(pa.array(keep))
        h = [hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
             for i in t.column(id_col).to_pylist()]
        return t.append_column("h", pa.array(h, pa.string()))

    ranked = rank_per_key(
        ds.map_batches(add_md5, batch_format="pyarrow",
                       batch_size=65536),
        key_col=group_col, order_cols=["h", id_col], nb=nb)

    def cut(t: pa.Table) -> pa.Table:
        q = np.array([quota[g] for g in
                      t.column(group_col).to_pylist()], np.int64)
        rn = t.column("rn").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(rn <= q)).select(
            [id_col, group_col])

    return ranked.map_batches(cut, batch_format="pyarrow")


def survivorship(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    id_col: str,
    value_cols: "list[str] | None" = None,
    ascending: bool = True,
    nb: int = 64,
) -> "ray.data.Dataset":
    """ER survivorship / golden-record merge: one fused record per
    ``key`` where EACH value column independently takes its first
    NON-NULL value in the ``(order_col, id_col)`` order (e.g. "most
    recent non-null attribute per entity" with a timestamp and
    ``ascending=False``) — the attribute-fusion step after entity
    resolution clusters duplicate records. ``id_col`` must be unique
    per row: it makes the order total, hence the output deterministic
    under any partitioning. Null keys form their own group (SQL GROUP
    BY semantics).

    Scale shape: map-side combine — each batch reduces to ONE partial
    golden row per key, carrying per COLUMN the winner's (order, id)
    coordinates; partials merge associatively in the per-bucket finish
    (first-non-null over a total order is associative), so the shuffle
    moves ≤ keys-per-batch rows, never the raw records. Output:
    ``key`` + ``value_cols``."""
    schema = None
    base = getattr(ds.schema(), "base_schema", ds.schema())
    if isinstance(base, pa.Schema):
        schema = base
    if value_cols is None:
        names = (schema.names if schema is not None else list(base.names))
        value_cols = [c for c in names if c not in (key, order_col, id_col)]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        """(key, per-col value + __ord/__id winner coords) partials."""
        df = df.sort_values([order_col, id_col],
                            ascending=[ascending, True], kind="mergesort")
        out = None
        for c in value_cols:
            nn = df[df[c].notna()]
            g = nn.groupby(key, dropna=False, sort=False, as_index=False)
            win = g.first()[[key, c, order_col, id_col]].rename(
                columns={order_col: f"{c}__ord", id_col: f"{c}__id"})
            out = win if out is None else out.merge(win, on=key, how="outer")
        keys_all = df[[key]].drop_duplicates()
        if out is None:
            out = keys_all
        else:
            out = keys_all.merge(out, on=key, how="left")
        return out

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        """Merge partial golden rows: per column argmin by winner
        coords among non-null partials."""
        out = None
        for c in value_cols:
            nn = df[df[c].notna()]
            nn = nn.sort_values([f"{c}__ord", f"{c}__id"],
                                ascending=[ascending, True],
                                kind="mergesort")
            g = nn.groupby(key, dropna=False, sort=False, as_index=False)
            win = g.first()[[key, c, f"{c}__ord", f"{c}__id"]]
            out = win if out is None else out.merge(win, on=key, how="outer")
        keys_all = df[[key]].drop_duplicates()
        if out is None:
            out = keys_all
        else:
            out = keys_all.merge(out, on=key, how="left")
        return out

    def local(batch: pa.Table) -> pa.Table:
        part = _reduce(batch.to_pandas())
        return _add_bucket(pa.Table.from_pandas(part, preserve_index=False),
                           [key], nb)

    def finish(group: pa.Table) -> pa.Table:
        df = _merge(group.drop_columns([_B]).to_pandas())
        return pa.Table.from_pandas(
            df[[key] + list(value_cols)], preserve_index=False)

    return (ds.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))
