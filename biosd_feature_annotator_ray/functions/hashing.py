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
    """uint64 stable row hash over several columns (order-sensitive)."""
    df = table.select(cols).to_pandas()
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


def bucket(hashes: np.ndarray, n: int) -> np.ndarray:
    """hash → [0, n) partition id (int32)."""
    return (hashes % np.uint64(n)).astype(np.int32)
