"""Checkpointed partitioned sink + manifest / resume / purge
(SURVEY.md §2 S3/S4, §4.3 layout, J4 anti-join resume).

The reference's resume story is "the memo DB table IS the checkpoint"
(re-runs skip keys already persisted — SURVEY.md §4.1); file-native
equivalent:

    out/
      manifest/part-{part_id:05d}.json   # lineage + metrics, written LAST
      triples/part_id={p}/data.parquet
      graph/part_id={p}/data.parquet

Each partition is written temp → fsync → atomic rename by the map_groups
worker itself (distributed write, no driver funnel); the manifest row is
written only after both renames succeed, so a partition is "done" iff
its manifest exists with ok=true. Resume prunes done partitions before
any work is scheduled.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from .. import EXTRACT_VERSION, __version__
from ..stages.graph import pack_adjacency

MANIFEST_DIR = "manifest"


def _atomic_write_parquet(table: pa.Table, final_path: str) -> None:
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    pq.write_table(table, tmp)
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, final_path)


def completed_partitions(out_dir: str) -> dict[int, dict]:
    """part_id → manifest row for every completed partition."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            row = json.load(f)
        if row.get("ok"):
            done[row["part_id"]] = row
    return done


TRIPLE_KEY = ["subj", "pred", "obj", "obj_kind"]


def write_partition(part: pa.Table, out_dir: str, metrics: dict | None = None) -> pa.Table:
    """map_groups body: exact-dedup within the partition (duplicates
    share subj → co-located by construction, so the A2 dedup FUSES into
    the part_id shuffle — one all-to-all instead of two), then write the
    triples partition + its packed graph partition atomically, then the
    manifest row. Returns the manifest row as a 1-row table (the only
    thing the driver ever collects)."""
    part_id = int(part.column("part_id")[0].as_py())
    df = part.to_pandas().sort_values(TRIPLE_KEY, kind="mergesort")
    df = df.drop_duplicates(subset=TRIPLE_KEY, keep="first")
    part = pa.Table.from_pandas(df, preserve_index=False)
    triples = part
    graph = pack_adjacency(part)
    t_path = os.path.join(out_dir, "triples", f"part_id={part_id}", "data.parquet")
    g_path = os.path.join(out_dir, "graph", f"part_id={part_id}", "data.parquet")
    _atomic_write_parquet(triples.drop_columns(["part_id"]), t_path)
    _atomic_write_parquet(graph.drop_columns(["part_id"]), g_path)
    row = {
        "part_id": part_id,
        "row_counts": {"triples": len(triples), "graph_rows": len(graph)},
        "stage_metrics": metrics or {},
        "code_version": f"{__version__}+{EXTRACT_VERSION}",
        "wrote_ts": time.time(),
        "ok": True,
    }
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f"part-{part_id:05d}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(row, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mtmp, os.path.join(mdir, f"part-{part_id:05d}.json"))
    return pa.table(
        {
            "part_id": pa.array([part_id], pa.int32()),
            "triples": pa.array([len(triples)], pa.int64()),
            "graph_rows": pa.array([len(graph)], pa.int64()),
            "ok": pa.array([True]),
        }
    )


def write_graph_checkpointed(
    triples_with_part: "ray.data.Dataset",
    out_dir: str,
    resume: bool = True,
    fail_after_parts: int | None = None,
) -> pa.Table:
    """The S3 sink: one shuffle on part_id; each group packs + writes its
    own partition. Returns the collected (small) manifest table.

    ``fail_after_parts`` is a test hook: raise after N partitions to
    exercise resume (SURVEY.md §5.2 item 5).
    """
    done = completed_partitions(out_dir) if resume else {}
    ds = triples_with_part
    if done:
        done_ids = set(done)
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("part_id"), value_set=pa.array(sorted(done_ids), pa.int32())))
            ),
            batch_format="pyarrow",
        )

    counter = {"n": 0}

    def write_group(part: pa.Table) -> pa.Table:
        if fail_after_parts is not None:
            counter["n"] += 1  # per-worker counter; good enough for the test hook
            if counter["n"] > fail_after_parts:
                raise RuntimeError("injected failure for resume test")
        return write_partition(part, out_dir)

    manifest = ds.groupby("part_id").map_groups(write_group, batch_format="pyarrow")
    collected = manifest.to_pandas()  # tiny: one row per partition
    return pa.Table.from_pandas(collected, preserve_index=False)


def purge(out_dir: str, older_than_ts: float) -> list[int]:
    """S4 purger: drop partitions written before the cutoff (partition
    rewrite hygiene — the reference deletes annotation rows older than a
    cutoff; never in-place)."""
    import shutil

    removed = []
    for part_id, row in completed_partitions(out_dir).items():
        if row["wrote_ts"] < older_than_ts:
            for sub in ("triples", "graph"):
                shutil.rmtree(os.path.join(out_dir, sub, f"part_id={part_id}"), ignore_errors=True)
            os.remove(os.path.join(out_dir, MANIFEST_DIR, f"part-{part_id:05d}.json"))
            removed.append(part_id)
    return sorted(removed)


def anti_join_keys(ds: "ray.data.Dataset", col: str, done_keys_ref) -> "ray.data.Dataset":
    """J4 resume anti-join: drop rows whose ``col`` is in the broadcast
    done-key set (set-membership inside map_batches; no shuffle)."""
    import pyarrow.compute as pc

    import ray

    def f(batch: pa.Table) -> pa.Table:
        done = ray.get(done_keys_ref) if not isinstance(done_keys_ref, (set, frozenset, pa.Array)) else done_keys_ref
        if isinstance(done, (set, frozenset)):
            done = pa.array(sorted(done), pa.string())
        return batch.filter(pc.invert(pc.is_in(batch.column(col), value_set=done)))

    return ds.map_batches(f, batch_format="pyarrow")


def read_triples(out_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(out_dir, "triples"))


def read_graph(out_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(out_dir, "graph"))
