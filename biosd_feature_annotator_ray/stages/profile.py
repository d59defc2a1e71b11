"""Distributed table profiling — the ``df.describe()`` of the engine.

One row per column: row count, null count, exact distinct count, and
numeric min/max (timestamps as epoch microseconds, strings/binary get
null min/max). SQL-twin semantics throughout: ``n_distinct`` excludes
nulls, exactly like ``count(DISTINCT col)``.

Scale shape: two streaming passes over a column-pruned read.
  1. stats — one partial row per (batch, column); only |cols| rows per
     batch enter the tiny groupby reduce.
  2. distinct — per-batch-unique ``(col, vh)`` value hashes through
     ONE bucket-shuffle exact dedup, then a |cols|-row count. Value
     identity travels as the native 64-bit value (ints/timestamps) or
     a stable string hash — never through a lossy float canonicalization
     (epoch-microsecond timestamps exceed 2^53, where a float64 round
     trip would merge distinct values and undercount).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .canonicalize import dedup_exact


def _numeric_view(arr: pa.ChunkedArray | pa.Array) -> np.ndarray | None:
    """Column → float64 values for min/max (NaN for nulls), or None
    when the type has no numeric order (string/binary)."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_timestamp(t):
        arr = pc.cast(arr, pa.int64(), safe=False)
    elif not (pa.types.is_integer(t) or pa.types.is_floating(t)
              or pa.types.is_boolean(t)):
        return None
    return pc.cast(arr, pa.float64(), safe=False).to_numpy(zero_copy_only=False)


def _value_hashes(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable non-null value identities as int64 (exact for ints and
    timestamps, bit pattern for floats, pandas hash for strings)."""
    import pyarrow.compute as pc

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    arr = arr.drop_null()
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_integer(t) or pa.types.is_boolean(t):
        return pc.cast(arr, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
    if pa.types.is_floating(t):
        return pc.cast(arr, pa.float64(), safe=False).to_numpy(
            zero_copy_only=False).view(np.int64)
    return pd.util.hash_pandas_object(
        arr.to_pandas().astype(str), index=False).to_numpy().view(np.int64)


def profile_table(ds: "object", columns: list[str]) -> pa.Table:
    """Profile ``columns`` of a Dataset; returns the small result table
    ``col, n_rows, n_null, n_distinct, min_val, max_val``."""
    from ray.data.aggregate import Count, Max, Min, Sum

    cols = list(columns)

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "n_null": [], "min_v": [], "max_v": []}
        for c in cols:
            arr = batch.column(c)
            rows["col"].append(c)
            rows["n"].append(len(arr))
            rows["n_null"].append(arr.null_count)
            v = _numeric_view(arr)
            if v is None or np.isnan(v).all():
                rows["min_v"].append(None)
                rows["max_v"].append(None)
            else:
                rows["min_v"].append(float(np.nanmin(v)))
                rows["max_v"].append(float(np.nanmax(v)))
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_v": pa.array(rows["min_v"], pa.float64()),
            "max_v": pa.array(rows["max_v"], pa.float64()),
        })

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("col")
             .aggregate(Sum("n", alias_name="n_rows"),
                        Sum("n_null", alias_name="n_null"),
                        Min("min_v", alias_name="min_val"),
                        Max("max_v", alias_name="max_val"))
             .to_pandas())

    def distinct_partial(batch: pa.Table) -> pa.Table:
        names: list[str] = []
        hashes: list[np.ndarray] = []
        for c in cols:
            u = np.unique(_value_hashes(batch.column(c)))
            names.extend([c] * len(u))
            hashes.append(u)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "vh": pa.array(np.concatenate(hashes) if hashes
                           else np.empty(0, np.int64)),
        })

    distinct = (dedup_exact(ds.map_batches(distinct_partial,
                                           batch_format="pyarrow",
                                           batch_size=65536),
                            ["col", "vh"], nb=16)
                .groupby("col")
                .aggregate(Count(alias_name="n_distinct"))
                .to_pandas())

    out = stats.merge(distinct, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[["col", "n_rows", "n_null", "n_distinct", "min_val", "max_val"]]
    out = out.sort_values("col").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
