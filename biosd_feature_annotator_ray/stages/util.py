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
