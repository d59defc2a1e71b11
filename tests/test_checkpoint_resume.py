"""Checkpoint / resume / purge (SURVEY.md §4.3, §5.2 item 5):
kill after partial write → rerun → identical final output, no dups."""

from __future__ import annotations

import shutil
import time

import pandas as pd
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, run
from biosd_feature_annotator_ray.sources.sink import (
    completed_partitions,
    purge,
    read_graph,
    read_triples,
)
from biosd_feature_annotator_ray.synth import gen_pages

SPEC = PipelineSpec(n_buckets=8, num_parts=8)
KEY = ["subj", "pred", "obj", "obj_kind"]


def _pages():
    return rd.from_arrow(gen_pages(300))


def _triples_df(out):
    return read_triples(out).to_pandas().sort_values(KEY).reset_index(drop=True)


def test_clean_then_resume_identical(ray_session, tmp_path):
    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    run(_pages(), clean, SPEC)
    assert len(completed_partitions(clean)) == 8

    # Crashed run: inject failure after 1 partition per worker.
    with pytest.raises(Exception):
        run(_pages(), crashed, SPEC, fail_after_parts=1)
    done_partial = completed_partitions(crashed)
    assert 0 < len(done_partial) < 8  # partial state on disk

    # Resume completes the remaining partitions only.
    manifest = run(_pages(), crashed, SPEC)
    assert len(completed_partitions(crashed)) == 8
    assert manifest.num_rows == 8 - len(done_partial)

    pd.testing.assert_frame_equal(_triples_df(clean), _triples_df(crashed))


def test_rerun_is_noop(ray_session, tmp_path):
    out = str(tmp_path / "o")
    run(_pages(), out, SPEC)
    before = _triples_df(out)
    manifest = run(_pages(), out, SPEC)
    assert manifest.num_rows == 0  # everything pruned at the read
    pd.testing.assert_frame_equal(before, _triples_df(out))


def test_graph_partitions_readable(ray_session, tmp_path):
    out = str(tmp_path / "g")
    run(_pages(), out, SPEC)
    g = read_graph(out).to_pandas()
    assert g.edges.map(len).sum() == len(_triples_df(out))
    # adjacency rows are unique per subj (no hub at this scale)
    assert g.subj.is_unique


def test_partition_local_linking_matches_global(ray_session, tmp_path):
    """run() links per partition; annotate_pages() links globally —
    byte-identical triples either way (linking is a pure function)."""
    from biosd_feature_annotator_ray.pipelines.annotate import annotate_pages

    out = str(tmp_path / "pl")
    run(_pages(), out, SPEC)
    via_run = _triples_df(out).drop(columns=["part_id"], errors="ignore")
    via_api = (
        annotate_pages(_pages(), SPEC)
        .to_pandas()[via_run.columns]
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_run, via_api)


def test_purge(ray_session, tmp_path):
    out = str(tmp_path / "p")
    run(_pages(), out, SPEC)
    before = _triples_df(out)
    removed = purge(out, older_than_ts=time.time() + 1)
    assert removed == sorted(range(8))
    assert completed_partitions(out) == {}
    # Purge → rerun must RE-ANNOTATE from the source (S4 semantics:
    # delete old annotations; a fresh run repopulates them).
    run(_pages(), out, SPEC)
    pd.testing.assert_frame_equal(before, _triples_df(out))
    shutil.rmtree(out)


def test_scatter_fragments_retry_idempotent(ray_session, tmp_path):
    """Round-1 ADVICE: scatter fragments must be written atomically with
    content-derived names — a retried map task overwrites the identical
    fragment (no duplicated mention rows) and a task killed mid-write
    leaves only an ignorable .tmp-* file, never a truncated parquet."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biosd_feature_annotator_ray.sources.sink import _scatter_fragments

    out = str(tmp_path / "scatter")
    batch = pa.table({
        "url": [f"u{i}" for i in range(20)],
        "key": [f"k{i % 4}" for i in range(20)],
        "part_id": pa.array([i % 3 for i in range(20)], pa.int32()),
    })
    _scatter_fragments(batch, out)
    _scatter_fragments(batch, out)  # simulated task retry: same content
    total = 0
    for pid in range(3):
        pdir = os.path.join(out, "mentions_raw", f"part_id={pid}")
        frags = [f for f in os.listdir(pdir) if f.startswith("frag-")]
        assert len(frags) == 1, frags  # retry overwrote, not duplicated
        total += pq.read_table(os.path.join(pdir, frags[0])).num_rows
    assert total == 20

    # a leftover tmp file (crash mid-write) is invisible to finalize:
    # drop garbage into a real run's fragment dir, force re-finalize of
    # that partition, and require byte-identical triples
    real = str(tmp_path / "real")
    run(_pages(), real, SPEC)
    before = _triples_df(real)
    os.remove(os.path.join(real, "manifest", "part-00000.json"))
    with open(os.path.join(real, "mentions_raw", "part_id=0", ".tmp-deadbeef"), "wb") as f:
        f.write(b"truncated garbage")
    manifest = run(_pages(), real, SPEC)
    assert manifest.num_rows == 1  # only partition 0 re-finalized
    pd.testing.assert_frame_equal(before, _triples_df(real))


def test_streaming_finalize_parity(ray_session, tmp_path):
    """max_finalize_rows forces the sub-chunked streaming finalize; the
    triples AND graph partitions must match the whole-partition path
    exactly, and the manifest must record the chunk count."""
    import json
    import os

    whole, chunked = str(tmp_path / "w"), str(tmp_path / "c")
    run(_pages(), whole, SPEC)
    spec_c = PipelineSpec(n_buckets=8, num_parts=8, max_finalize_rows=50)
    man = run(_pages(), chunked, spec_c)
    assert man.num_rows == 8

    pd.testing.assert_frame_equal(_triples_df(whole), _triples_df(chunked))

    def graph_df(out):
        df = read_graph(out).to_pandas()
        df["edges"] = df["edges"].map(
            lambda es: tuple(sorted((e["pred"], e["obj"], e["obj_kind"]) for e in es)))
        return df.sort_values(["subj", "edges"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(graph_df(whole), graph_df(chunked))

    with open(os.path.join(chunked, "manifest", "part-00000.json")) as f:
        m = json.load(f)
    assert m["stage_metrics"]["finalize_chunks"] > 1
    # the memory knob must not perturb key metrics: distinct/linked keys
    # are a cross-chunk UNION, so chunked == whole per partition
    with open(os.path.join(whole, "manifest", "part-00000.json")) as f:
        mw = json.load(f)
    assert m["stage_metrics"]["distinct_keys"] == mw["stage_metrics"]["distinct_keys"]
    assert m["stage_metrics"]["linked_keys"] == mw["stage_metrics"]["linked_keys"]
    assert m["stage_metrics"]["mentions"] == mw["stage_metrics"]["mentions"]

    # resume over the streamed output is still a no-op
    man2 = run(_pages(), chunked, spec_c)
    assert man2.num_rows == 0


def test_default_finalize_bound_engages(ray_session, tmp_path, monkeypatch):
    """Round-2 verdict item 2: the SHIPPED default must bound finalize
    heap. With DEFAULT_MAX_FINALIZE_ROWS patched below the partition
    size, an unconfigured finalize (nobody passes max_finalize_rows)
    takes the sub-chunk path by itself and yields identical triples."""
    import json
    import os

    from biosd_feature_annotator_ray.sources import sink as sink_mod

    out = str(tmp_path / "dflt")
    run(_pages(), out, SPEC)  # SPEC leaves max_finalize_rows at "default"
    before = _triples_df(out)
    # re-finalize partition 0 driver-side with a tiny default in force
    monkeypatch.setattr(sink_mod, "DEFAULT_MAX_FINALIZE_ROWS", 10)
    os.remove(os.path.join(out, "manifest", "part-00000.json"))
    sink_mod.finalize_mentions_partition(out, 0)  # NOT asked to chunk
    with open(os.path.join(out, "manifest", "part-00000.json")) as f:
        m = json.load(f)
    assert m["stage_metrics"]["finalize_chunks"] > 1
    pd.testing.assert_frame_equal(before, _triples_df(out))
    # None stays the explicit opt-out: whole-partition path, same rows
    os.remove(os.path.join(out, "manifest", "part-00000.json"))
    sink_mod.finalize_mentions_partition(out, 0, max_finalize_rows=None)
    with open(os.path.join(out, "manifest", "part-00000.json")) as f:
        m2 = json.load(f)
    assert "finalize_chunks" not in m2["stage_metrics"]
    pd.testing.assert_frame_equal(before, _triples_df(out))


def test_generic_partitioned_writer_resume(ray_session, tmp_path):
    """write_dataset_partitioned: any Dataset → resumable hash-partitioned
    parquet; a lost partition is rebuilt, finished ones are skipped."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from biosd_feature_annotator_ray.sources.sink import write_dataset_partitioned

    df = pd.DataFrame({"doc_id": range(1000), "v": [f"x{i}" for i in range(1000)]})
    out = str(tmp_path / "generic")
    man = write_dataset_partitioned(rd.from_pandas(df).repartition(4), out,
                                    key_col="doc_id", num_parts=8)
    assert man.num_rows == 8 and man.to_pandas()["ok"].all()

    def read_all():
        parts = sorted(os.listdir(os.path.join(out, "data")))
        t = pd.concat([pq.read_table(os.path.join(out, "data", p)).to_pandas()
                       for p in parts], ignore_index=True)
        return t.sort_values("doc_id").reset_index(drop=True)

    first = read_all()
    assert len(first) == 1000
    pd.testing.assert_frame_equal(first, df)

    # full resume: nothing to do, files untouched
    mtimes = {p: os.path.getmtime(os.path.join(out, "data", p))
              for p in os.listdir(os.path.join(out, "data"))}
    man2 = write_dataset_partitioned(rd.from_pandas(df).repartition(4), out,
                                     key_col="doc_id", num_parts=8)
    assert man2.num_rows == 0
    assert mtimes == {p: os.path.getmtime(os.path.join(out, "data", p))
                      for p in os.listdir(os.path.join(out, "data"))}

    # lose one partition (manifest + data + fragments): only it is rebuilt
    os.remove(os.path.join(out, "manifest", "part-00003.json"))
    os.remove(os.path.join(out, "data", "part-00003.parquet"))
    import shutil
    shutil.rmtree(os.path.join(out, "generic_raw", "part_id=3"))
    man3 = write_dataset_partitioned(rd.from_pandas(df).repartition(4), out,
                                     key_col="doc_id", num_parts=8)
    assert man3.num_rows == 1 and man3.to_pandas()["part_id"].iloc[0] == 3
    pd.testing.assert_frame_equal(read_all(), df)


def test_presplit_and_legacy_finalize_paths(ray_session, tmp_path):
    """r03 'what's wrong' #3: fragments now carry a sorted _sub
    url-hash column so the over-bound finalize reads only its chunk's
    row groups. Both the presplit path and the legacy hash-filter path
    (fragments without _sub) must equal the whole-partition output."""
    import os

    import pyarrow.parquet as pq

    from biosd_feature_annotator_ray.sources import sink as sink_mod

    whole, pre = str(tmp_path / "w"), str(tmp_path / "p")
    run(_pages(), whole, SPEC)
    # moderate bound -> n_chunks small -> presplit path engages
    spec_c = PipelineSpec(n_buckets=8, num_parts=8, max_finalize_rows=200)
    run(_pages(), pre, spec_c)
    pd.testing.assert_frame_equal(_triples_df(whole), _triples_df(pre))
    # fragments really carry the _sub column
    pdir = os.path.join(pre, "mentions_raw", "part_id=0")
    frag = next(f for f in os.listdir(pdir) if f.startswith("frag-"))
    assert "_sub" in pq.ParquetFile(os.path.join(pdir, frag)).schema_arrow.names
    # triples/graph outputs must NOT leak the helper column
    tdir = os.path.join(pre, "triples")
    tfile = next(os.path.join(r, f) for r, _, fs in os.walk(tdir)
                 for f in fs if f.endswith(".parquet"))
    assert "_sub" not in pq.ParquetFile(tfile).schema_arrow.names

    # legacy fragments (no _sub): strip the column in place, re-run the
    # finalize directly -> hash-filter fallback gives identical triples
    legacy = str(tmp_path / "l")
    run(_pages(), legacy, spec_c)
    for p in range(8):
        pdir = os.path.join(legacy, "mentions_raw", f"part_id={p}")
        for f in os.listdir(pdir):
            if f.startswith("frag-"):
                fp = os.path.join(pdir, f)
                t = pq.read_table(fp)
                if "_sub" in t.column_names:
                    pq.write_table(t.drop_columns(["_sub"]), fp)
    import shutil as _sh
    for sub in ("triples", "graph", "manifest"):
        _sh.rmtree(os.path.join(legacy, sub), ignore_errors=True)
    for p in range(8):
        sink_mod.finalize_mentions_partition(legacy, p,
                                             max_finalize_rows=200)
    pd.testing.assert_frame_equal(_triples_df(whole), _triples_df(legacy))
