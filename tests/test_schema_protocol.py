"""Known-schema protocol (round 5): every annotation the engine
attaches must equal the schema the plan actually produces — a wrong
annotation would silently poison join layouts, so this net pins the
property for each annotating producer."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.util import (
    cheap_arrow_schema, map_known, with_schema)


def _exec_schema(ds) -> pa.Schema:
    m = ds.materialize()
    s = m.schema()
    return getattr(s, "base_schema", s)


def _assert_match(ds, where: str):
    ann = cheap_arrow_schema(ds)
    assert ann is not None, f"{where}: no cheap schema"
    real = _exec_schema(ds)
    assert ann.equals(real), f"{where}: {ann} != {real}"


def test_annotations_match_executed_schemas():
    from biosd_feature_annotator_ray.stages.canonicalize import (
        groupby_nunique, sum_by_key, sums_by_key)
    from biosd_feature_annotator_ray.stages.graph import (
        _min_with_old, _subtract_new)
    from biosd_feature_annotator_ray.stages.join import (
        shuffle_hash_join)

    base = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "a", "c"], pa.string()),
        "node": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([1.5, 2.0, 3.0, 4.0], pa.float64()),
        "n": pa.array([1, 1, 1, 1], pa.int64())})).materialize()

    _assert_match(sum_by_key(base, "k", "n", nb=2, out_col="cnt"),
                  "sum_by_key")
    _assert_match(sums_by_key(base, "k", ["n", "v"], nb=2),
                  "sums_by_key")
    _assert_match(groupby_nunique(base, "k", "node", nb=2),
                  "groupby_nunique(string key)")

    j = shuffle_hash_join(
        base, map_known(base, lambda t: pa.table(
            {"k": t.column("k"), "w": t.column("v")})),
        on=["k"], how="inner", nb=2)
    _assert_match(j, "shuffle_hash_join")
    for how in ("left", "semi", "anti", "full"):
        _assert_match(shuffle_hash_join(
            base.select_columns(["k", "n"]),
            map_known(base, lambda t: pa.table(
                {"k": t.column("k"), "w": t.column("v")})),
            on=["k"], how=how, nb=2), f"join how={how}")

    _assert_match(map_known(base, lambda t: pa.table(
        {"x": t.column("node"), "s": t.column("k")})), "map_known")

    new = map_known(base, lambda t: pa.table(
        {"node": t.column("node")}))
    old = map_known(base, lambda t: pa.table(
        {"node": pa.array([], pa.int64())}))
    _assert_match(_subtract_new(new, old, ["node"], 2),
                  "_subtract_new")

    msgs = map_known(base, lambda t: pa.table(
        {"node": t.column("node"), "color": t.column("node")}))
    cur = map_known(base, lambda t: pa.table(
        {"node": t.column("node"), "color": t.column("node")}))
    _assert_match(_min_with_old(msgs, cur, 2), "_min_with_old")


def test_plan_walker_structural_ops():
    base = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3], pa.int64()),
        "b": pa.array(["x", "y", "z"])})).materialize()
    lazy = base.map_batches(
        lambda t: t.rename_columns(["a2", "b2"]),
        batch_format="pyarrow")
    _assert_match(lazy, "walker: map_batches probe")
    _assert_match(lazy.union(base.map_batches(
        lambda t: t.rename_columns(["a2", "b2"]),
        batch_format="pyarrow")), "walker: union")
    _assert_match(lazy.limit(2), "walker: limit")
    _assert_match(base.select_columns(["b"]), "walker: project")


def test_walker_rejects_value_dependent_probe():
    # a fn whose empty-probe schema would be null-typed must NOT
    # annotate — the consumer pays the executing fetch and gets the
    # REAL schema instead of a poisoned one
    base = rd.from_arrow(pa.table({
        "s": pa.array(["p", "q"], pa.string())})).materialize()

    def bad(t: pa.Table) -> pa.Table:
        # empty object concat infers null on 0 rows, string on >0
        vals = [x + "!" for x in t.column("s").to_pylist()]
        return pa.table({"out": pa.array(vals)})

    lazy = base.map_batches(bad, batch_format="pyarrow")
    assert cheap_arrow_schema(lazy) is None
    real = _exec_schema(lazy)
    assert pa.types.is_string(real.field("out").type)


def test_with_schema_wrong_annotation_is_callers_responsibility():
    # the protocol trusts producers; this pin documents that a
    # deliberate wrong annotation IS returned (so producer tests
    # above are the actual safety net)
    base = rd.from_arrow(pa.table({"a": pa.array([1], pa.int64())}))
    wrong = pa.schema([pa.field("zzz", pa.string())])
    assert cheap_arrow_schema(
        with_schema(base.map_batches(lambda t: t,
                                     batch_format="pyarrow"),
                    wrong)).equals(wrong)
