"""Zone-map pruning-effectiveness probe (metadata-only, no Ray)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biosd_feature_annotator_ray.stages.profile import zonemap_report


def test_zonemap_sorted_layout_prunes(tmp_path):
    d = tmp_path / "sorted"
    d.mkdir()
    for f in range(4):
        vals = list(range(f * 1000, (f + 1) * 1000))
        pq.write_table(pa.table({"k": pa.array(vals, pa.int64())}),
                       str(d / f"p{f}.parquet"), row_group_size=250)
    rep = {r["file"]: r for r in zonemap_report(
        str(d), "k", lo=500, hi=700).to_pylist()}
    # range [500,700] lives in file 0 row group 2 only
    assert rep["p0.parquet"]["n_pruned"] == 3
    assert rep["p1.parquet"]["n_pruned"] == 4
    assert rep["*"]["n_pruned"] == 15
    assert rep["*"]["rows_scanned"] == 250
    # shuffled layout prunes nothing
    import random

    d2 = tmp_path / "shuf"
    d2.mkdir()
    vals = list(range(4000))
    random.Random(1).shuffle(vals)
    for f in range(4):
        pq.write_table(pa.table({"k": pa.array(
            vals[f * 1000:(f + 1) * 1000], pa.int64())}),
            str(d2 / f"p{f}.parquet"), row_group_size=250)
    rep2 = zonemap_report(str(d2), "k", lo=500,
                          hi=700).to_pylist()[-1]
    assert rep2["n_pruned"] == 0 and rep2["rows_scanned"] == 4000
    with pytest.raises(ValueError, match="lacks column"):
        zonemap_report(str(d), "missing")


def test_cli_zonemap(tmp_path):
    import json
    import subprocess
    import sys

    d = tmp_path / "data"
    d.mkdir()
    for f in range(2):
        vals = list(range(f * 1000, (f + 1) * 1000))
        pq.write_table(pa.table({"k": pa.array(vals, pa.int64())}),
                       str(d / f"p{f}.parquet"), row_group_size=500)
    out = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray",
         "zonemap", "--data", str(d), "--col", "k",
         "--lo", "0", "--hi", "400"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got == {"files": 2, "n_rowgroups": 4, "n_pruned": 3,
                   "rows_scanned": 500, "n_rows": 2000}
