"""Persisted per-file Bloom index for point lookups on a secondary key.

A 100-TB parquet archive is partitioned by ONE key (url-hash, date);
any lookup by a different key — "fetch every row for entity X" —
otherwise scans all files. This sidecar stores one Bloom bitset per
data file over an arbitrary column, so a point lookup opens ONLY the
bloom-positive files (false positives are settled by the exact filter
inside the read; negatives are certain misses, so results are exact).

Same persisted-artifact contract as ``stages/dedupindex.py``: atomic
tmp → rename writes, ``_DONE`` marker, meta params pinned (a rebuild
with different params raises instead of silently serving stale bits).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_GOLDEN = 0x9E3779B97F4A7C15


def _positions(h: "np.ndarray", bits_pow: int, n_hashes: int):
    mask = np.uint64((1 << bits_pow) - 1)
    with np.errstate(over="ignore"):
        return [((h * np.uint64((_GOLDEN * (i + 1))
                                & 0xFFFFFFFFFFFFFFFF))
                 >> np.uint64(64 - bits_pow)) & mask
                for i in range(n_hashes)]


def _key_hash(arr: "pa.ChunkedArray | pa.Array") -> "np.ndarray":
    from ..functions.hashing import hash_columns

    return hash_columns(pa.table({"k": arr}), ["k"]).astype(np.uint64)


def build_bloom_index(
    data_dir: str,
    key_col: str,
    index_dir: str,
    bits_pow: int = 20,
    n_hashes: int = 4,
) -> int:
    """Build the per-file Bloom sidecar for ``key_col`` over every
    ``*.parquet`` under ``data_dir``. One Ray task per file reads ONLY
    the key column (column-pruned), sets its bitset, and the driver
    assembles one small index parquet (file, n_rows, bits) — the index
    is KBs per data file regardless of row width. Returns the number
    of files indexed. Idempotent: ``_DONE`` short-circuits, and a
    rebuild with different (key_col, bits_pow, n_hashes) raises."""
    import ray

    done = os.path.join(index_dir, "_DONE")
    meta_p = os.path.join(index_dir, "meta.parquet")
    params = {"key_col": key_col, "bits_pow": bits_pow,
              "n_hashes": n_hashes}
    if os.path.exists(done):
        meta = pq.read_table(meta_p).to_pylist()[0]
        got = {k: meta[k] for k in params}
        if got != params:
            raise ValueError(
                f"build_bloom_index: {index_dir} was built with "
                f"{got}, requested {params} — use a fresh index_dir")
        return int(meta["n_files"])

    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet"))
    if not files:
        raise ValueError(f"build_bloom_index: no parquet files in "
                         f"{data_dir}")

    @ray.remote
    def one(fp: str):
        t = pq.read_table(fp, columns=[key_col])
        col = t.column(key_col)
        h = _key_hash(col.filter(pc.is_valid(col)))
        bits = np.zeros((1 << bits_pow) // 8, np.uint8)
        for pos in _positions(h, bits_pow, n_hashes):
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(
                np.int64), np.uint8(1) << (pos & np.uint64(7)).astype(
                np.uint8))
        return os.path.basename(fp), t.num_rows, bits.tobytes()

    rows = ray.get([one.remote(fp) for fp in files])
    os.makedirs(index_dir, exist_ok=True)
    idx = pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "bits": pa.array([r[2] for r in rows], pa.binary())})
    tmp = os.path.join(index_dir, f"_tmp-{uuid.uuid4().hex}")
    pq.write_table(idx, tmp)
    os.replace(tmp, os.path.join(index_dir, "blooms.parquet"))
    meta = pa.table({k: pa.array([v]) for k, v in
                     {**params, "n_files": len(files)}.items()})
    tmp = os.path.join(index_dir, f"_tmp-{uuid.uuid4().hex}")
    pq.write_table(meta, tmp)
    os.replace(tmp, meta_p)
    with open(done + ".tmp", "w") as f:
        f.write("ok")
    os.replace(done + ".tmp", done)
    return len(files)


def bloom_candidate_files(
    index_dir: str,
    keys: list,
) -> "list[str]":
    """Files that MAY hold any of ``keys`` (bloom-positive for at
    least one key). Negatives are certain misses — the exactness
    argument for the lookup below."""
    meta = pq.read_table(
        os.path.join(index_dir, "meta.parquet")).to_pylist()[0]
    bits_pow, n_hashes = meta["bits_pow"], meta["n_hashes"]
    h = _key_hash(pa.array(keys))
    poss = _positions(h, bits_pow, n_hashes)
    idx = pq.read_table(os.path.join(index_dir, "blooms.parquet"))
    out = []
    for row in idx.to_pylist():
        bits = np.frombuffer(row["bits"], np.uint8)
        hit = np.ones(len(keys), bool)
        for pos in poss:
            hit &= (bits[(pos >> np.uint64(3)).astype(np.int64)]
                    & (np.uint8(1) << (pos & np.uint64(7)).astype(
                        np.uint8))) != 0
        if hit.any():
            out.append(row["file"])
    return out


def bloom_point_lookup(
    data_dir: str,
    index_dir: str,
    keys: list,
    columns: "list[str] | None" = None,
) -> "object":
    """Exact point lookup through the Bloom sidecar: open ONLY the
    bloom-positive files, with the key filter pushed into the parquet
    read (row-group pruning inside each candidate too). Returns a
    Dataset of exactly the rows whose key is in ``keys`` — false
    positives die at the pushdown filter. An all-negative probe
    returns an empty, SCHEMA-CORRECT dataset without touching data."""
    import pyarrow.dataset as pads

    import ray.data as rd

    meta = pq.read_table(
        os.path.join(index_dir, "meta.parquet")).to_pylist()[0]
    key_col = meta["key_col"]
    files = sorted(f for f in os.listdir(data_dir)
                   if f.endswith(".parquet"))
    sch = pq.read_schema(os.path.join(data_dir, files[0]))
    # coerce probe keys to the DATA key type — the bloom bits were
    # hashed from native values, so int 5 and string '5' are
    # different keys; a mistyped probe must not silently miss
    ktype = sch.field(key_col).type
    try:
        if pa.types.is_integer(ktype):
            keys = [int(k) for k in keys]
        elif pa.types.is_floating(ktype):
            keys = [float(k) for k in keys]
        elif pa.types.is_string(ktype) or \
                pa.types.is_large_string(ktype):
            keys = [str(k) for k in keys]
        else:
            keys = pa.array(keys, type=ktype).to_pylist()
    except (TypeError, ValueError, pa.ArrowInvalid) as ex:
        raise ValueError(
            f"bloom_point_lookup: keys not coercible to the "
            f"{key_col!r} column type {ktype}: {ex}") from ex
    cand = bloom_candidate_files(index_dir, keys)
    if not cand:
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    paths = [os.path.join(data_dir, f) for f in cand]
    return rd.read_parquet(
        paths, columns=columns,
        filter=pads.field(key_col).isin(keys))


def pruned_point_lookup(
    data_dir: str,
    index_dir: str,
    keys: list,
    columns: "list[str] | None" = None,
):
    """The index-aware point-lookup READ (r04 verdict item 4) — one
    call chaining every pruning layer the repo owns:

    1. Bloom sidecar → only bloom-POSITIVE files are candidates
       (negatives are certain misses);
    2. parquet footer zone maps → within each candidate, only row
       groups whose [min, max] admits at least one probe key are
       read (footers only — zero data I/O for pruned groups);
    3. exact ``is_in`` filter inside each read task → bloom/zone
       false positives die before leaving the task.

    Returns ``(dataset, stats)`` where stats counts the pruning:
    ``files_total / files_bloom / rowgroups_total / rowgroups_read /
    rows_total / rows_scanned`` — the files-opened counter the
    caller (and the tests) can assert on. Row groups without stats
    count as unprunable. The read fans out one Ray task per
    candidate file — at archive scale only bloom-positive footers
    are even opened."""
    import ray.data as rd

    meta = pq.read_table(
        os.path.join(index_dir, "meta.parquet")).to_pylist()[0]
    key_col = meta["key_col"]
    files = sorted(f for f in os.listdir(data_dir)
                   if f.endswith(".parquet"))
    if not files:
        raise ValueError(f"pruned_point_lookup: no parquet in "
                         f"{data_dir}")
    sch = pq.read_schema(os.path.join(data_dir, files[0]))
    ktype = sch.field(key_col).type
    keys = pa.array(keys, type=ktype).to_pylist()
    out_sch = (pa.schema([sch.field(c) for c in columns])
               if columns else sch)

    stats = {"files_total": len(files), "files_bloom": 0,
             "rowgroups_total": 0, "rowgroups_read": 0,
             "rows_total": 0, "rows_scanned": 0}
    cand = bloom_candidate_files(index_dir, keys)
    stats["files_bloom"] = len(cand)

    specs = []
    for f in cand:
        fp = os.path.join(data_dir, f)
        md = pq.read_metadata(fp)
        leaf_paths = [md.schema.column(i).path
                      for i in range(md.num_columns)]
        ci = leaf_paths.index(key_col)
        keep = []
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats["rowgroups_total"] += 1
            stats["rows_total"] += rg.num_rows
            st = rg.column(ci).statistics
            if st is None or not st.has_min_max:
                admit = True  # no stats → unprunable, must scan
            else:
                admit = any(st.min <= k <= st.max for k in keys)
            if admit:
                keep.append(g)
                stats["rowgroups_read"] += 1
                stats["rows_scanned"] += rg.num_rows
        if keep:
            specs.append({"path": fp,
                          "rgs": ",".join(map(str, keep))})
    if not specs:
        return rd.from_arrow(out_sch.empty_table()), stats

    key_set = pa.array(keys, type=ktype)
    cols = list(columns) if columns else None

    def read_one(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            pf = pq.ParquetFile(row["path"])
            rgs = [int(x) for x in row["rgs"].split(",")]
            need = cols if cols and key_col in cols else (
                cols + [key_col] if cols else None)
            t = pf.read_row_groups(rgs, columns=need)
            t = t.filter(pc.is_in(t.column(key_col),
                                  value_set=key_set))
            outs.append(t.select(out_sch.names))
        return (pa.concat_tables(outs) if outs
                else out_sch.empty_table())

    ds = rd.from_items(specs).map_batches(
        read_one, batch_format="pyarrow", batch_size=1)
    from .util import with_schema
    return with_schema(ds, out_sch), stats
