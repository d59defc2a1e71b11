"""Index-aware point-lookup read (r04 verdict item 4): one call
chains bloom-positive file pruning, zone-map row-group selection and
the exact filter — with the pruning counters asserted."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biosd_feature_annotator_ray.stages.bloomindex import (
    build_bloom_index, pruned_point_lookup)


def _archive(tmp_path, n_files=6, rows_per_file=400):
    """Sorted-by-key layout: file i holds keys in [i*1000, i*1000+...)
    with 8 row groups each — bloom prunes files, zone maps prune row
    groups within the positive file."""
    data = str(tmp_path / "data")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(11)
    for i in range(n_files):
        keys = np.sort(rng.integers(i * 1000, i * 1000 + 500,
                                    rows_per_file))
        t = pa.table({
            "k": pa.array(keys, pa.int64()),
            "payload": pa.array(rng.standard_normal(rows_per_file)),
            "tag": pa.array([f"f{i}"] * rows_per_file)})
        pq.write_table(t, f"{data}/part-{i:02d}.parquet",
                       row_group_size=rows_per_file // 8)
    return data


def test_pruned_lookup_exact_and_counters(tmp_path):
    data = _archive(tmp_path)
    idx = str(tmp_path / "bloom")
    build_bloom_index(data, "k", idx, bits_pow=16)

    # probe two keys that live in file 2 only
    t2 = pq.read_table(f"{data}/part-02.parquet")
    keys = sorted(set(t2.column("k").to_pylist()))[:2]
    ds, stats = pruned_point_lookup(data, idx, keys)
    got = ds.to_pandas().sort_values(["k", "payload"])

    # brute-force reference over the whole archive
    allt = pa.concat_tables([
        pq.read_table(f"{data}/{f}") for f in sorted(os.listdir(data))
        if f.endswith(".parquet")])
    import pyarrow.compute as pc
    want = allt.filter(pc.is_in(
        allt.column("k"), value_set=pa.array(keys, pa.int64()))
    ).to_pandas().sort_values(["k", "payload"])
    assert got.reset_index(drop=True).equals(
        want.reset_index(drop=True))
    assert len(got) > 0

    # the files-opened counter: only bloom-positive files considered,
    # and zone maps pruned row groups INSIDE the positive file
    assert stats["files_total"] == 6
    assert stats["files_bloom"] < stats["files_total"]
    assert stats["rowgroups_read"] < stats["rowgroups_total"]
    assert stats["rows_scanned"] < stats["rows_total"]


def test_pruned_lookup_negative_probe_touches_nothing(tmp_path):
    data = _archive(tmp_path, n_files=3)
    idx = str(tmp_path / "bloom")
    build_bloom_index(data, "k", idx, bits_pow=16)
    ds, stats = pruned_point_lookup(data, idx, [999_999_999])
    assert ds.count() == 0
    assert ds.schema().names == ["k", "payload", "tag"]
    # an all-negative probe may bloom-false-positive a file but its
    # zone maps then reject every row group
    assert stats["rowgroups_read"] <= stats["rowgroups_total"]
    assert stats["rows_scanned"] == 0 or stats["files_bloom"] > 0


def test_pruned_lookup_projection(tmp_path):
    data = _archive(tmp_path, n_files=2)
    idx = str(tmp_path / "bloom")
    build_bloom_index(data, "k", idx, bits_pow=16)
    k0 = pq.read_table(f"{data}/part-00.parquet").column(
        "k").to_pylist()[0]
    ds, _ = pruned_point_lookup(data, idx, [k0], columns=["tag"])
    df = ds.to_pandas()
    assert list(df.columns) == ["tag"]
    assert set(df["tag"]) == {"f0"}


def test_lookup_cli_end_to_end(tmp_path):
    data = _archive(tmp_path, n_files=3)
    idx = str(tmp_path / "bloom")
    build_bloom_index(data, "k", idx, bits_pow=16)
    k0 = pq.read_table(f"{data}/part-01.parquet").column(
        "k").to_pylist()[0]
    out = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray",
         "lookup", "--data", data, "--index", idx,
         "--keys", str(k0), "--output", out],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] >= 1
    assert rep["files_bloom"] <= rep["files_total"]
    got = pq.read_table(out)
    assert set(got.column("k").to_pylist()) == {k0}
