"""Stable 64-bit hashing for partition / dedup keys (SURVEY.md §2.8).

The reference relies on DB primary keys; we need content hashes that
are stable across runs, processes and nodes (no Python ``hash()``,
which is salted per process). ``pandas.util.hash_pandas_object`` is a
vectorized, documented-stable 64-bit hash — used for all key columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def hash_strings(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 stable hash of a string column (vectorized, no Python loop)."""
    s = arr.to_pandas()
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def hash_columns(table: pa.Table, cols: list[str]) -> np.ndarray:
    """uint64 stable row hash over several columns (order-sensitive).

    Values are canonicalized through an Arrow string cast before
    hashing, so the hash depends only on the LOGICAL value — an int64
    column that surfaces as float64 in one batch (nulls present) and
    int64 in another still buckets identically. Nulls hash as a
    reserved sentinel distinct from any real value."""
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        arr = table.column(c)
        if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
            # int64 and its null-promoted float64 twin must render the
            # SAME string (int 10**15 prints digits, float prints
            # '1e+15') — route every numeric through float64 first.
            # Distinct ints > 2^53 may share a bucket (harmless: the
            # in-bucket compare decides equality on real values).
            arr = pc.cast(arr, pa.float64(), safe=False)
        if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
            arr = pc.cast(arr, pa.string())
        parts.append(pc.fill_null(arr, "\x00null\x00"))
    joined = parts[0] if len(parts) == 1 else pc.binary_join_element_wise(*parts, "\x1f")
    return hash_strings(joined)


def bucket(hashes: np.ndarray, n: int) -> np.ndarray:
    """hash → [0, n) partition id (int32)."""
    return (hashes % np.uint64(n)).astype(np.int32)


def md5_u32(ids) -> "np.ndarray":
    """First 8 hex chars of md5(str(id)) as int64 in [0, 2^32) — the
    cross-system deterministic uniform used by train/test splitting,
    hash sampling, weighted sampling, and the global shuffle. Must stay
    in lockstep with the DuckDB oracle expression
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8))::UBIGINT``."""
    import hashlib

    return np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in ids), np.int64, count=len(ids))


def rendezvous_assign(
    batch: pa.Table,
    key_col: str,
    nodes: "list[str]",
    seed: int = 0,
    out_col: str = "node",
) -> pa.Table:
    """Rendezvous (highest-random-weight) hashing (Thaler & Ravishankar
    1996 — the consistent-assignment scheme behind cache routing and
    crawl-frontier sharding): each key goes to the node with the
    LARGEST ``md5(key:node:seed)`` draw, so adding or removing one
    node reassigns only the keys that node owned/gains (1/N churn,
    no ring state). Ties (128-bit md5 collisions, ~never) break by
    node name asc via the (hex desc, node asc) total order.

    Replayable-md5 contract: a SQL twin replays the same draws with
    ``md5(key || ':' || node || ':' || seed)``. Null keys get a null
    assignment. The per-batch cost is |rows| x |nodes| md5 draws —
    ``nodes`` is a shard list, small by definition.

    Returns the batch plus ``out_col``.
    """
    import hashlib

    if not nodes:
        raise ValueError("nodes must be non-empty")
    if len(set(nodes)) != len(nodes):
        raise ValueError("duplicate node names")
    keys = batch.column(key_col).cast(pa.string()).to_pylist()
    order = sorted(nodes)  # stable tie-break order
    out = []
    for k in keys:
        if k is None:
            out.append(None)
            continue
        best, best_h = None, ""
        for nd in order:
            h = hashlib.md5(f"{k}:{nd}:{seed}".encode()).hexdigest()
            if h > best_h:
                best, best_h = nd, h
        out.append(best)
    return batch.append_column(out_col, pa.array(out, pa.string()))


def zorder_key(
    batch: pa.Table,
    cols: "list[str]",
    bits: int = 16,
    out_col: str = "zkey",
) -> pa.Table:
    """Z-order (Morton) key over 2-4 integer columns: each value is
    range-clamped to ``bits`` bits and the bits interleave
    column-round-robin (col0 owns the least-significant position of
    each round) — the multi-dimensional clustering key behind
    Delta/Iceberg OPTIMIZE ZORDER: sorting or range-partitioning by
    ``zkey`` co-locates rows close in EVERY listed dimension, so
    min/max row-group pruning works for predicates on any of them,
    not just the leading sort column.

    Values must already be non-negative integers (bucket/normalize
    first); values >= 2^bits clamp to the top code (documented —
    clamping preserves ordering at the boundary). Nulls yield a null
    key. ``len(cols) * bits`` must fit in 63 bits.

    Returns the batch plus ``out_col`` (int64).
    """
    import pyarrow.compute as pc

    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key needs 2-4 columns")
    if bits < 1 or len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must be within 63 bits")
    n = batch.num_rows
    valid = np.ones(n, dtype=bool)
    vals = []
    for c in cols:
        col = batch.column(c)
        valid &= pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if (v < 0).any():
            raise ValueError(f"column {c!r} holds negative values")
        vals.append(np.minimum(v, (1 << bits) - 1))
    z = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(cols) + j)
    return batch.append_column(out_col, pc.if_else(
        pa.array(valid), pa.array(z, pa.int64()),
        pa.nulls(n, pa.int64())))
