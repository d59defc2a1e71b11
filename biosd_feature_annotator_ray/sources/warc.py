"""WARC + JSONL page sources (SURVEY.md §2 S1 breadth; the north-star
input is Common-Crawl-style web pages, and Common Crawl ships WARC).

``read_pages_warc``: `ray.data.read_binary_files` → one task per WARC
file → a vectorized-enough record splitter that parses WARC/1.0
response records (header block + Content-Length-framed payload),
strips the inner HTTP header block when present, and emits PAGES-schema
rows (url ← WARC-Target-URI, warc_ts ← WARC-Date, html ← body,
text=null so the extract stage derives it deterministically).

Scale note: each task holds one whole WARC file (CC files ≈ 1 GiB
uncompressed) — size `target_max_block_size` / task memory
accordingly. ``.warc.gz`` is supported: Common Crawl gzips one member
per record and stdlib gzip reads concatenated members transparently
(detected by magic bytes, so mixed plain/gz inputs work); budget ~4×
the compressed size per task.

``read_pages_jsonl``: `ray.data.read_json` + a schema-mapping batch fn
for line-delimited page dumps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..schemas import PAGES

_CRLF2 = b"\r\n\r\n"


def parse_warc_records(blob: bytes) -> list[dict]:
    """Parse one WARC file's bytes → list of response-record dicts
    (url, warc_ts, html). Non-response records are skipped."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            nxt = blob.find(b"WARC/", pos + 1)
            if nxt == -1:
                break
            pos = nxt
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end == -1:
            break
        headers = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        body = blob[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        # skip the record-terminating blank lines
        while pos < n and blob.startswith(b"\r\n", pos):
            pos += 2
        if headers.get(b"warc-type") != b"response":
            continue
        # response payloads usually carry the HTTP response; strip its headers
        if body.startswith(b"HTTP/"):
            split = body.find(_CRLF2)
            if split != -1:
                body = body[split + 4:]
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        out.append({"url": url, "warc_ts": ts, "html": body})
    return out


def read_pages_warc(paths: str | list[str]) -> "ray.data.Dataset":
    """WARC files → PAGES-schema Dataset (text null → M2 derives it)."""

    def split(batch: pa.Table) -> pa.Table:
        import gzip

        rows = []
        for blob in batch.column("bytes").to_pylist():
            if blob[:2] == b"\x1f\x8b":  # gzip magic (CC .warc.gz)
                blob = gzip.decompress(blob)
            rows.extend(parse_warc_records(blob))
        if not rows:
            return PAGES.empty_table()
        ts = pd.to_datetime([r["warc_ts"] for r in rows], utc=True, errors="coerce")
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array(ts.to_numpy(), PAGES.field("warc_ts").type),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.nulls(len(rows), pa.large_string()),
                "lang": pa.nulls(len(rows), pa.string()),
            },
            schema=PAGES,
        )

    return ray.data.read_binary_files(paths).map_batches(
        split, batch_format="pyarrow", batch_size=1
    )


def read_pages_jsonl(paths: str | list[str]) -> "ray.data.Dataset":
    """Line-delimited JSON page dumps → PAGES-schema Dataset. Expected
    keys per line: url, warc_ts (ISO), text and/or html (utf-8), lang."""

    def to_pages(batch: pa.Table) -> pa.Table:
        cols = {name: (batch.column(name) if name in batch.column_names else None)
                for name in PAGES.names}
        n = len(batch)
        ts = cols["warc_ts"]
        if ts is None:
            ts_arr = pa.nulls(n, PAGES.field("warc_ts").type)
        else:
            ts_arr = pa.array(
                pd.to_datetime(ts.to_pandas(), utc=True, errors="coerce").to_numpy(),
                PAGES.field("warc_ts").type)
        html = cols["html"]
        html_arr = (pa.nulls(n, pa.binary()) if html is None
                    else html.cast(pa.string()).cast(pa.binary()))
        text = cols["text"]
        text_arr = (pa.nulls(n, pa.large_string()) if text is None
                    else text.cast(pa.large_string()))
        lang = cols["lang"]
        return pa.table(
            {
                "url": cols["url"].cast(pa.string()),
                "warc_ts": ts_arr,
                "html": html_arr,
                "text": text_arr,
                "lang": pa.nulls(n, pa.string()) if lang is None else lang.cast(pa.string()),
            },
            schema=PAGES,
        )

    return ray.data.read_json(paths).map_batches(to_pages, batch_format="pyarrow")


# ---------------------------------------------------------------------------
def write_warc(path: str, pages: pa.Table, gzip_per_record: bool = False) -> None:
    """Test/bench fixture writer: PAGES rows → a minimal valid WARC file
    (response records, HTTP payload framing). ``gzip_per_record=True``
    emits the Common-Crawl ``.warc.gz`` layout: one gzip member per
    record, concatenated."""
    import gzip

    with open(path, "wb") as f:
        for row in pages.to_pylist():
            body = row.get("html") or (row.get("text") or "").encode()
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            ts = row.get("warc_ts")
            iso = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None
                   else "2024-01-01T00:00:00Z")
            hdr = (b"WARC/1.0\r\n"
                   b"WARC-Type: response\r\n"
                   b"WARC-Target-URI: " + row["url"].encode() + b"\r\n"
                   b"WARC-Date: " + iso.encode() + b"\r\n"
                   b"Content-Length: " + str(len(http)).encode() + b"\r\n")
            # hdr already ends with CRLF; one more CRLF closes the
            # header block (a doubled separator would shift the
            # Content-Length frame by two bytes)
            rec = hdr + b"\r\n" + http + b"\r\n\r\n"
            f.write(gzip.compress(rec) if gzip_per_record else rec)


def read_pages_jsonl_permissive(
    paths: str | list[str],
    dead_letter_dir: str | None = None,
) -> "ray.data.Dataset":
    """JSONL ingest that SURVIVES malformed records (``read_json``
    fails the whole file on one bad line — useless on a crawl dump).

    Each task parses its lines, emits valid PAGES rows, and routes
    failures (bad JSON, non-object, missing ``url``) to
    ``dead_letter_dir`` as parquet rows (line, error) — written
    atomically with content-hashed names so task retries are
    idempotent. Per-line ``json.loads`` is inherent to the permissive
    contract (there is no error-capturing vectorized JSON kernel);
    use ``read_pages_jsonl`` when the input is known-clean."""
    import hashlib
    import json
    import os

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        bad_lines: list[str] = []
        bad_errs: list[str] = []
        for line in batch.column("text").to_pylist():
            if not line or not line.strip():
                continue
            try:
                d = json.loads(line)
                if not isinstance(d, dict):
                    raise ValueError("not a JSON object")
                if not d.get("url"):
                    raise ValueError("missing url")
                rows.append(d)
            except Exception as ex:  # noqa: BLE001 — every failure is routed
                bad_lines.append(line)
                bad_errs.append(f"{type(ex).__name__}: {ex}")
        if bad_lines and dead_letter_dir:
            os.makedirs(dead_letter_dir, exist_ok=True)
            t = pa.table({"line": pa.array(bad_lines, pa.large_string()),
                          "error": pa.array(bad_errs, pa.string())})
            digest = hashlib.sha256("\x00".join(bad_lines).encode()).hexdigest()[:16]
            final = os.path.join(dead_letter_dir, f"bad-{digest}.parquet")
            if not os.path.exists(final):
                import pyarrow.parquet as pq

                tmp = final + ".tmp"
                pq.write_table(t, tmp)
                os.replace(tmp, final)
        ts = pd.to_datetime([r.get("warc_ts") for r in rows], utc=True, errors="coerce")
        # tz-naive numpy datetime64 round-trip: tz-aware .to_numpy()
        # yields object Timestamps whose NaT breaks pa.array
        ts_np = ts.tz_convert(None).to_numpy()
        html = [r["html"].encode() if isinstance(r.get("html"), str)
                else r.get("html") for r in rows]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array(ts_np).cast(PAGES.field("warc_ts").type),
                "html": pa.array(html, pa.binary()),
                "text": pa.array([r.get("text") for r in rows], pa.large_string()),
                "lang": pa.array([r.get("lang") for r in rows], pa.string()),
            },
            schema=PAGES,
        )

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow",
                                                 batch_size=8192)
