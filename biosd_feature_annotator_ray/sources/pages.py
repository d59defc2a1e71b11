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
