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


def with_schema(ds, schema: pa.Schema):
    """Annotate a Dataset with its KNOWN output Arrow schema.

    ``Dataset.schema()`` on a lazy chain EXECUTES the plan up to the
    first block — for a chain containing a shuffle that is the whole
    shuffle, run once for the schema and again for the data (a silent
    2× on every consumer that needs the schema, e.g. every
    ``shuffle_hash_join`` input). Operators whose output schema is
    known by construction (bucket-plan aggregates, joins that pin
    every block to a canonical schema, explicit ``pa.table``
    builders) attach it here; :func:`cheap_arrow_schema` reads it
    back without touching the executor."""
    try:
        ds._graft_known_schema = schema
    except Exception:  # noqa: BLE001 — annotation is best-effort
        pass
    return ds


def cheap_arrow_schema(ds) -> "pa.Schema | None":
    """Arrow schema of a Dataset IF it is knowable without executing
    anything: a :func:`with_schema` annotation, or Ray's own cached /
    metadata-derived schema (``fetch_if_missing=False`` — materialized
    datasets and parquet reads answer instantly). Returns None when
    only an execution could answer — callers fall back to the paying
    path or skip their optimization."""
    known = getattr(ds, "_graft_known_schema", None)
    if known is not None:
        return known
    try:
        s = ds.schema(fetch_if_missing=False)
    except Exception:  # noqa: BLE001
        return None
    if s is not None:
        base = getattr(s, "base_schema", s)
        if isinstance(base, pa.Schema):
            return base
    try:
        dag = ds._logical_plan.dag
    except Exception:  # noqa: BLE001
        return None
    derived = _derive_plan_schema(dag)
    if derived is not None:
        with_schema(ds, derived)  # memoize on the object
    return derived


def _derive_plan_schema(op, depth: int = 0) -> "pa.Schema | None":
    """Derive the Arrow output schema of a logical-plan operator
    WITHOUT executing anything, walking down to a base whose schema
    is metadata (InputData = materialized blocks) and propagating up
    through schema-stable ops (filter/union/limit/sort/shuffle) and
    zero-arg pyarrow ``map_batches`` fns probed on a ZERO-ROW table.
    A probe result containing a null-typed field is REJECTED — that
    is the signature of value-dependent empty inference (the exact
    class of schema bug an annotation must never introduce). Returns
    None whenever uncertain; callers then pay Ray's executing fetch."""
    if depth > 64:
        return None
    from ray.data._internal.logical.operators.all_to_all_operator import (
        RandomizeBlocks, RandomShuffle, Repartition, Sort)
    from ray.data._internal.logical.operators.input_data_operator import (
        InputData)
    from ray.data._internal.logical.operators.map_operator import (
        Filter, MapBatches, Project, StreamingRepartition)
    from ray.data._internal.logical.operators.n_ary_operator import Union
    from ray.data._internal.logical.operators.one_to_one_operator import (
        Limit)

    if isinstance(op, InputData):
        try:
            s = op.infer_schema()
        except Exception:  # noqa: BLE001
            return None
        return s if isinstance(s, pa.Schema) else None
    if isinstance(op, (Filter, Limit, Sort, RandomShuffle,
                       RandomizeBlocks, Repartition,
                       StreamingRepartition)):
        return _derive_plan_schema(op.input_dependencies[0], depth + 1)
    if isinstance(op, Union):
        schemas = [_derive_plan_schema(i, depth + 1)
                   for i in op.input_dependencies]
        if any(s is None for s in schemas):
            return None
        return schemas[0] if all(s.equals(schemas[0])
                                 for s in schemas[1:]) else None
    if isinstance(op, Project):
        base = _derive_plan_schema(op.input_dependencies[0], depth + 1)
        if base is None or getattr(op, "_exprs", None):
            return None
        cols = op.cols
        ren = op.cols_rename or {}
        fields = [base.field(n) for n in (cols or base.names)
                  if n in base.names]
        if cols and len(fields) != len(cols):
            return None
        return pa.schema([pa.field(ren.get(f.name, f.name), f.type)
                          for f in fields])
    if isinstance(op, MapBatches):
        if (op._batch_format != "pyarrow" or op._fn_args
                or op._fn_kwargs or op._fn_constructor_args
                or op._fn_constructor_kwargs
                or not callable(op._fn)
                or isinstance(op._fn, type)):
            return None
        base = _derive_plan_schema(op.input_dependencies[0], depth + 1)
        if base is None:
            return None
        try:
            probe = op._fn(base.empty_table())
        except Exception:  # noqa: BLE001
            return None
        if not isinstance(probe, pa.Table):
            return None
        if any(pa.types.is_null(f.type) for f in probe.schema):
            return None
        return probe.schema
    return None


def map_known(ds, fn, **kw):
    """``map_batches(fn, batch_format="pyarrow")`` that PROPAGATES a
    known schema: when the input schema is cheaply known, ``fn`` is
    probed on a zero-row table of it and the probe's schema annotates
    the output — so iterative operators' per-round rename/select/
    census lambdas never force a schema-fetch execution downstream.
    Only valid for fns whose output schema is value-independent
    (explicit-typed ``pa.table`` builders); a raising or misbehaving
    probe simply skips the annotation."""
    out = ds.map_batches(fn, batch_format="pyarrow", **kw)
    sch = cheap_arrow_schema(ds)
    if sch is not None:
        try:
            probe = fn(sch.empty_table())
            if isinstance(probe, pa.Table):
                with_schema(out, probe.schema)
        except Exception:  # noqa: BLE001 — best-effort
            pass
    return out
