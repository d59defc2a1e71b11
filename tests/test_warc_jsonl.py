"""WARC + JSONL page sources: round-trip through the flagship chain."""

from __future__ import annotations

import json

import pandas as pd
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.sources.warc import (
    parse_warc_records,
    read_pages_jsonl,
    read_pages_warc,
    write_warc,
)
from biosd_feature_annotator_ray.synth import gen_pages


def test_warc_roundtrip_and_annotate(ray_session, tmp_path):
    pages = gen_pages(120)
    p = str(tmp_path / "a.warc")
    write_warc(p, pages)

    # raw parse: every record comes back, HTTP headers stripped
    recs = parse_warc_records(open(p, "rb").read())
    assert len(recs) == 120
    assert recs[0]["url"] == pages.column("url")[0].as_py()
    assert not recs[0]["html"].startswith(b"HTTP/")

    ds = read_pages_warc(p)
    df = ds.to_pandas()
    assert len(df) == 120 and df.url.is_unique
    assert df.text.isna().all()  # text derives downstream from html

    # the flagship accepts a WARC-backed Dataset directly
    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages

    triples = annotate_pages(read_pages_warc(p), PipelineSpec(n_buckets=4)).to_pandas()
    assert len(triples) > 0
    assert set(triples.subj) <= set(df.url)


def test_warc_skips_non_response_records(tmp_path):
    p = str(tmp_path / "b.warc")
    body = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
    rec = (b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://skip\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body + b"\r\n\r\n")
    open(p, "wb").write(rec)
    assert parse_warc_records(open(p, "rb").read()) == []


def test_jsonl_source(ray_session, tmp_path):
    p = str(tmp_path / "pages.jsonl")
    with open(p, "w") as f:
        for i in range(30):
            f.write(json.dumps({
                "url": f"http://ex.com/{i}",
                "warc_ts": "2024-02-03T04:05:06Z",
                "text": f"organism: Homo sapiens\nage: {20+i} weeks",
                "lang": "en",
            }) + "\n")
    ds = read_pages_jsonl(p)
    df = ds.to_pandas()
    assert len(df) == 30
    assert str(df.warc_ts.iloc[0]) .startswith("2024-02-03 04:05:06")

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages

    triples = annotate_pages(read_pages_jsonl(p), PipelineSpec(n_buckets=4)).to_pandas()
    assert (triples.obj == "http://purl.obolibrary.org/obo/NCBITaxon_9606").any()


def test_warc_gz_roundtrip(ray_session, tmp_path):
    """Common-Crawl .warc.gz layout: one gzip member per record,
    concatenated — read transparently by magic-byte detection."""
    from biosd_feature_annotator_ray.sources.warc import read_pages_warc, write_warc
    from biosd_feature_annotator_ray.synth import gen_pages

    pages = gen_pages(40)
    gz = str(tmp_path / "cc.warc.gz")
    write_warc(gz, pages, gzip_per_record=True)
    got = read_pages_warc(gz).to_pandas().sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    # payload bytes survive the gzip round-trip exactly
    import pandas as pd
    exp = want.apply(lambda r: r["html"] if r["html"] is not None
                     else (r["text"] or "").encode(), axis=1)
    assert list(got["html"]) == list(exp)


def test_cli_run_warc_honors_url_prefix(ray_session, tmp_path):
    """Regression: --url-prefix/--lang were silently ignored for
    warc/jsonl inputs (only the parquet read path applied them)."""
    import json
    import subprocess
    import sys

    from biosd_feature_annotator_ray.sources.warc import write_warc
    from biosd_feature_annotator_ray.synth import gen_pages

    pages = gen_pages(60)
    p = str(tmp_path / "a.warc")
    write_warc(p, pages)
    prefix = pages.column("url")[0].as_py()[:30]
    n_match = sum(1 for u in pages.column("url").to_pylist() if u.startswith(prefix))
    assert 0 < n_match < 60
    out = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray", "run",
         "--format", "warc", "--input", p, "--output", str(tmp_path / "o"),
         "--url-prefix", prefix, "--num-parts", "2", "--num-cpus", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["triples"] > 0
    import duckdb
    urls = duckdb.sql(
        f"SELECT DISTINCT subj FROM '{tmp_path}/o/triples/*/*.parquet'").df()
    assert all(u.startswith(prefix) for u in urls["subj"])


def test_jsonl_permissive_dead_letter(ray_session, tmp_path):
    from biosd_feature_annotator_ray.sources.warc import read_pages_jsonl_permissive

    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join([
        '{"url": "http://a", "text": "hello world", "lang": "en"}',
        'this is not json at all {',
        '{"no_url": 1, "text": "orphan"}',
        '{"url": "http://b", "html": "<p>hi</p>"}',
        '["an", "array"]',
        "",
    ]))
    dl = tmp_path / "dead"
    out = read_pages_jsonl_permissive(str(p), dead_letter_dir=str(dl)).to_pandas()
    assert sorted(out["url"]) == ["http://a", "http://b"]
    assert out.loc[out.url == "http://b", "html"].iloc[0] == b"<p>hi</p>"
    import pyarrow.parquet as pq
    bad = pq.read_table(str(dl)).to_pandas().sort_values("line").reset_index(drop=True)
    assert len(bad) == 3
    assert bad["error"].str.len().gt(0).all()
    # idempotent on re-run (content-hashed file names, no duplicates)
    read_pages_jsonl_permissive(str(p), dead_letter_dir=str(dl)).to_pandas()
    assert len(pq.read_table(str(dl)).to_pandas()) == 3
