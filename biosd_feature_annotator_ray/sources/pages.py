"""Pages sources (SURVEY.md §2 S1/S2, M11).

The reference pages through ``ExperimentalPropertyValue`` rows with JPA
offset/limit windows (``PropertyValAnnotationService.submitAll`` —
SURVEY.md §2.1 S1); here file/row-group granularity replaces offset
windows, and predicate/column pushdown replaces the ``--submission``
accession filter (S2).
"""

from __future__ import annotations

import pyarrow.dataset as pads

import ray.data

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _prefix_successor(p: str) -> str | None:
    """Smallest string greater than every string with prefix ``p``:
    increment the last incrementable character (skipping the surrogate
    gap). None when no successor exists (all chars are U+10FFFF)."""
    chars = list(p)
    for i in range(len(chars) - 1, -1, -1):
        c = ord(chars[i])
        if c >= 0x10FFFF:
            continue
        nxt = c + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        return "".join(chars[:i]) + chr(nxt)
    return None


def read_pages(
    paths: str | list[str],
    lang: str | None = None,
    url_prefix: str | None = None,
    columns: list[str] | None = None,
    num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """read_parquet with column pruning + row-group predicate pushdown.

    ``lang=`` is the M11 web-hygiene filter pushed to the read (never
    post-shuffle); ``url_prefix=`` is the S2 submission-scope analog.
    ``num_blocks=`` re-chunks the read into fewer, LONGER fused tasks
    (task-granularity control: Ray Data's streaming executor dispatch
    dominates sub-second map tasks — target multi-second tasks, a few
    waves per core).
    """
    flt = None
    if lang is not None:
        flt = pads.field("lang") == lang
    if url_prefix is not None:
        # range scan [prefix, successor(prefix)): appending U+FFFF as
        # the bound missed URLs whose next char sorts above it
        # (astral/emoji path segments in real crawls)
        succ = _prefix_successor(url_prefix)
        p = pads.field("url") >= url_prefix
        if succ is not None:
            p = p & (pads.field("url") < succ)
        flt = p if flt is None else (flt & p)
    return ray.data.read_parquet(paths, columns=columns or PAGE_COLUMNS, filter=flt,
                                 override_num_blocks=num_blocks)


def documents_as_pages(sf_dir: str) -> "ray.data.Dataset":
    """Local-proxy source (FIXTURES.md §1): map the driver testdata
    ``documents`` table onto the PAGES schema — doc_id→url, text→text,
    warc_ts = epoch + doc_id, html = null."""
    import numpy as np
    import pyarrow as pa

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy()
        urls = pa.array([f"doc://{d}" for d in doc_id], pa.string())
        epoch = np.datetime64("1970-01-01T00:00:00", "us").astype("int64")
        ts = pa.array(epoch + doc_id * 1_000_000, pa.timestamp("us", tz="UTC"))
        return pa.table(
            {
                "url": urls,
                "warc_ts": ts,
                "html": pa.nulls(len(batch), pa.binary()),
                "text": batch.column("text").cast(pa.large_string()),
                "lang": batch.column("lang"),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_pages_evolved(
    paths: "str | list[str]",
    target_schema: "pads.pa.Schema | None" = None,
    columns: "list[str] | None" = None,
    strict_types: bool = True,
) -> "ray.data.Dataset":
    """Schema-evolution-tolerant parquet read — a years-deep crawl
    archive NEVER has one schema: early shards miss columns added
    later, an int32 column was widened to int64 in 2023, field order
    drifted. A plain multi-file ``read_parquet`` surfaces that as a
    mid-job block-union failure; this reader reconciles AT THE READ:

    * the target schema is the UNION of every fragment footer's
      fields (name-keyed, first-seen field order; or pass
      ``target_schema`` explicitly — e.g. ``PAGES`` — to pin it);
    * per batch, missing columns null-fill and present columns cast
      to the target type (safe widening casts only when
      ``strict_types``; lossy casts raise rather than corrupt);
    * conflicting fragment types resolve by safe-cast reconciliation
      (int32 + int64 → int64, float + int → float64, anything +
      string needs ``strict_types=False``).

    Scale shape: footers are read once, driver-side (metadata only —
    no data pulled); the fix-up is a stateless vectorized map fused
    onto the read tasks, so evolution costs ~nothing at 100 TB.
    ``columns`` prunes the read to target fields that exist per
    fragment (a fragment lacking the column reads nothing for it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    plist = [paths] if isinstance(paths, str) else list(paths)
    frag_paths = []
    for p in plist:
        import os

        if os.path.isdir(p):
            frag_paths.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p))
                if f.endswith(".parquet"))
        else:
            frag_paths.append(p)
    if not frag_paths:
        raise ValueError("read_pages_evolved: no parquet files")
    footers = {fp: pq.read_schema(fp) for fp in frag_paths}

    def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
        if a == b:
            return a
        if pa.types.is_integer(a) and pa.types.is_integer(b):
            return a if a.bit_width >= b.bit_width else b
        num = (pa.types.is_integer(a) or pa.types.is_floating(a)) and \
              (pa.types.is_integer(b) or pa.types.is_floating(b))
        if num:
            return pa.float64()
        if not strict_types:
            return pa.string()
        raise ValueError(
            f"read_pages_evolved: incompatible fragment types {a} vs "
            f"{b}; pass strict_types=False to stringify")

    if target_schema is None:
        fields: "dict[str, pa.DataType]" = {}
        order: list[str] = []
        for fp in frag_paths:
            for f in footers[fp]:
                if f.name in fields:
                    fields[f.name] = _widen(fields[f.name], f.type)
                else:
                    fields[f.name] = f.type
                    order.append(f.name)
        target_schema = pa.schema(
            [pa.field(n, fields[n]) for n in order])
    if columns is not None:
        target_schema = pa.schema(
            [target_schema.field(c) for c in columns])

    tgt = target_schema

    def conform(t: "pa.Table") -> "pa.Table":
        cols = []
        for f in tgt:
            if f.name in t.column_names:
                c = t.column(f.name)
                cols.append(c if c.type == f.type
                            else c.cast(f.type, safe=strict_types))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        return pa.table(cols, schema=tgt)

    # one Dataset per distinct fragment schema (so column pruning can
    # still push down), conformed then unioned — the union is safe
    # because every branch emits the identical target schema
    by_sig: "dict[tuple, list[str]]" = {}
    for fp in frag_paths:
        names = tuple(sorted(footers[fp].names))
        by_sig.setdefault(names, []).append(fp)
    parts = []
    for names, fps in sorted(by_sig.items()):
        want = [c for c in tgt.names if c in names]
        if want:
            ds = rd.read_parquet(fps, columns=want)
        else:
            # no requested column exists in this fragment group —
            # synthesize its all-null rows from footer row counts
            # instead of reading every column just to discard it
            n = sum(pq.read_metadata(fp).num_rows for fp in fps)
            if n == 0:
                continue
            ds = rd.range(n).map_batches(
                lambda t: pa.table(
                    {"__fill": pa.nulls(t.num_rows, pa.int8())}),
                batch_format="pyarrow")
        parts.append(ds.map_batches(conform, batch_format="pyarrow"))
    if not parts:
        return rd.from_arrow(tgt.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
