"""Shared stage helpers."""

from __future__ import annotations

import functools

import pyarrow as pa


@functools.lru_cache(maxsize=16)
def _cached_stage(cls, kwargs_items):
    """Per-worker-process stage cache: stages whose state costs
    microseconds to build (hash params, stopword tables, hyperplanes)
    run as PLAIN TASKS — fusible with the read, no actor-pool cold
    start (measured 3-4 s of pure actor startup on small inputs) —
    while still building state once per process. Heavy-state stages
    (model loads, dictionary indexes) should keep the actor pool."""
    return cls(**dict(kwargs_items))


def as_task_fn(cls, kwargs: dict | None = None):
    items = tuple(sorted((kwargs or {}).items()))

    def f(batch: pa.Table) -> pa.Table:
        return _cached_stage(cls, items)(batch)

    return f


def explode_list(batch: pa.Table, list_col: str, id_cols: list[str],
                 pos_col: str = "pos", value_col: str = "val") -> pa.Table:
    """Row-expanding UNNEST WITH ORDINALITY: one output row per list
    element, carrying ``id_cols`` plus the element's 0-based position.
    Pure Arrow/numpy (list_flatten + repeat of the id rows) — no
    per-row Python. Null/empty lists contribute no rows."""
    import numpy as np
    import pyarrow.compute as pc

    col = batch.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    excl = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = np.arange(int(lengths.sum())) - np.repeat(excl, lengths)
    cols = {c: batch.column(c).take(pa.array(doc_idx)) for c in id_cols}
    cols[pos_col] = pa.array(pos.astype(np.int64))
    cols[value_col] = flat
    return pa.table(cols)


def mat_cut(ds):
    """``materialize()`` + truncate the DatasetStats parent chain.

    Ray keeps the FULL stats ancestry across materializations and
    summarizes it recursively on every subsequent execution
    (ray/data/_internal/stats.py::to_summary walks ``parents``), so a
    deeply iterative operator — many rounds × several materializes per
    round — blows the driver's recursion limit merely computing stats
    for the next step. Cutting the lineage at each round boundary
    keeps the current round's stats and bounds the chain; output
    blocks are untouched. Best-effort against private internals: on
    any attribute change in Ray this degrades to plain materialize."""
    return strip_stats(ds.materialize())


def strip_stats(ds):
    """Truncate a (materialized) Dataset's stats parent chain in
    place — the non-materializing half of :func:`mat_cut`; see its
    docstring for why iterative operators need this."""
    try:
        st = ds._plan._snapshot_stats
        if st is not None:
            st.parents = []
        ins = ds._plan._in_stats
        if ins is not None:
            ins.parents = []
    except Exception:  # noqa: BLE001 — best-effort on private API
        pass
    return ds
