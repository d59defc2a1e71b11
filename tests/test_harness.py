"""Driver-contract pinning: a fast subset of queries() vs their DuckDB
oracles at sf0.001 (the full sweep is tools/check_oracle.py at sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
FAST = [
    "count_documents", "filter_lang_en", "normalize_text", "extract_json_k",
    "token_counts", "canonicalize_events", "dedup_docs", "distinct_event_types",
    "topk_event_types", "lineitem_agg", "revenue_per_nation", "anti_join_docs",
    "top_orders", "window_events", "session_windows", "partition_date",
    "latest_event_per_user_type", "bpe_token_counts", "lineitem_date_filter",
    "join_orders_lineitem", "semi_join_customers", "asof_join_events",
    "rank_events", "lag_events", "quantiles", "pivot_events",
    "grouped_quantile", "hash_sample", "interval_join_sessions",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e

    res = e.queries()[name](SF)
    got = _canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
    want = _canon(con.sql(e.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-9)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = e.entry().to_pandas()
    assert len(df) > 0
    assert {"subj", "pred", "obj", "obj_kind"} <= set(df.columns)


def test_every_oracle_has_query():
    import __ray_entry__ as e

    assert set(e.oracle_sql()) <= set(e.queries())


def test_cli_count_and_run(ray_session, tmp_path):
    """CLI surface (subprocess owns its own Ray session)."""
    import json
    import subprocess
    import sys

    from biosd_feature_annotator_ray.synth import write_pages

    inp = str(tmp_path / "pages")
    write_pages(inp, 200, rows_per_file=100)
    env_cmd = [sys.executable, "-m", "biosd_feature_annotator_ray"]
    out = subprocess.run(env_cmd + ["count", "--input", inp, "--num-cpus", "2"],
                         capture_output=True, text=True, check=True, cwd="/root/repo")
    assert json.loads(out.stdout.strip().splitlines()[-1])["property_values"] == 200
    out = subprocess.run(
        env_cmd + ["run", "--input", inp, "--output", str(tmp_path / "out"),
                   "--num-parts", "4", "--num-cpus", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["partitions_written"] == 4 and res["triples"] > 0


def test_cli_dedup(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": ["common shared text body here"] * 3
                + [f"unique document number {i} with filler words" for i in range(17)],
    })
    p = str(tmp_path / "docs.parquet")
    docs.to_parquet(p)
    out = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray", "dedup",
         "--input", p, "--method", "minhash", "--threshold", "0.9", "--num-cpus", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rows"] >= 3  # the 3 identical docs form at least 3 pairs


def test_cli_curate(ray_session, tmp_path):
    """curate: quality+langid+fingerprint+dedup → resumable partitioned
    parquet; second run is a resume no-op."""
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(30),
        "text": ["the same duplicated body of text here"] * 4
                + [f"document {i} body with the usual filler words" for i in range(26)],
    })
    p = str(tmp_path / "docs.parquet")
    docs.to_parquet(p)
    out_dir = str(tmp_path / "curated")
    cmd = [sys.executable, "-m", "biosd_feature_annotator_ray", "curate",
           "--input", p, "--output", out_dir, "--num-parts", "4", "--num-cpus", "2"]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["partitions_written"] == 4 and res["rows"] == 27  # 30 - 3 dup copies
    got = duckdb.sql(f"SELECT count(*) n, count(DISTINCT content_hash) h "
                     f"FROM '{out_dir}/data/*.parquet'").fetchone()
    assert got == (27, 27)
    out2 = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd="/root/repo")
    assert json.loads(out2.stdout.strip().splitlines()[-1])["partitions_written"] == 0


def test_cli_index_search(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    cmd0 = [sys.executable, "-m", "biosd_feature_annotator_ray"]
    idx = str(tmp_path / "ivf")
    out = subprocess.run(
        cmd0 + ["index", "--input", "/root/testdata/sf0.001/embeddings.parquet",
                "--output", idx, "--centroids", "8", "--num-cpus", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["centroids"] == 8
    out = subprocess.run(
        cmd0 + ["search", "--index", idx,
                "--queries", "/root/testdata/sf0.001/embeddings.parquet",
                "--k", "3", "--nprobe", "2", "--num-cpus", "2",
                "--output", str(tmp_path / "res")],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0


def test_cli_dedupindex_compact(ray_session, tmp_path):
    """dedupindex build → append → compact via the CLI (r03 item 2)."""
    import json
    import subprocess
    import sys

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(2)
    words = [f"w{i}" for i in range(30)]

    def mk(path, ids):
        pq.write_table(pa.Table.from_pandas(pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "text": [" ".join(rng.choice(words, 12)) for _ in ids]}),
            preserve_index=False), path)

    mk(str(tmp_path / "hist.parquet"), range(15))
    mk(str(tmp_path / "inc.parquet"), range(100, 110))
    ix = str(tmp_path / "ix")
    cmd = [sys.executable, "-m", "biosd_feature_annotator_ray", "dedupindex"]
    subprocess.run(cmd + ["build", "--input", str(tmp_path / "hist.parquet"),
                          "--index", ix, "--num-cpus", "2"],
                   capture_output=True, text=True, check=True, cwd="/root/repo")
    subprocess.run(cmd + ["append", "--input", str(tmp_path / "inc.parquet"),
                          "--index", ix, "--num-cpus", "2"],
                   capture_output=True, text=True, check=True, cwd="/root/repo")
    out = subprocess.run(cmd + ["compact", "--index", ix, "--num-cpus", "2"],
                         capture_output=True, text=True, check=True,
                         cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["frags_after"] <= res["frags_before"]
    from biosd_feature_annotator_ray.stages.dedupindex import count_indexed_docs
    assert count_indexed_docs(ix) == 25


def test_cli_spandedup(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd

    passage = " ".join(f"dup{i}" for i in range(20))
    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": [" ".join(f"u{d}w{i}" for i in range(30))
                 + (" " + passage if d in (1, 4) else "")
                 for d in range(6)],
    })
    p = str(tmp_path / "docs.parquet")
    docs.to_parquet(p)
    outdir = str(tmp_path / "clean")
    out = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray", "spandedup",
         "--input", p, "--output", outdir, "--k", "8", "--num-cpus", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["docs"] == 6 and res["removed"] >= 20
    got = duckdb.sql(
        f"SELECT text FROM '{outdir}/*.parquet' WHERE doc_id = 4").df()
    assert "dup0" not in got["text"].iloc[0]
    got1 = duckdb.sql(
        f"SELECT text FROM '{outdir}/*.parquet' WHERE doc_id = 1").df()
    assert "dup0" in got1["text"].iloc[0]  # keep-first winner


def test_cli_spandedup_lines(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(4),
        "text": ["boiler\nunique a", "boiler\nunique b",
                 "only here", "boiler\nboiler"],
    })
    p = str(tmp_path / "docs.parquet")
    docs.to_parquet(p)
    out = subprocess.run(
        [sys.executable, "-m", "biosd_feature_annotator_ray", "spandedup",
         "--input", p, "--output", str(tmp_path / "clean"),
         "--granularity", "line", "--num-cpus", "2"],
        capture_output=True, text=True, check=True, cwd="/root/repo")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    # 4 "boiler" lines, the globally first survives
    assert res["docs"] == 4 and res["removed"] == 3


def test_cli_structured_pii_boilerplate_ntexport(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd

    pages = pd.DataFrame({
        "url": ["u1", "u2"],
        "html": ['<script type="application/ld+json">'
                 '{"@id":"e1","name":"A"}</script>'
                 '<meta property="og:title" content="T">',
                 "<p>none</p>"],
    })
    pp = str(tmp_path / "pages.parquet")
    pages.to_parquet(pp)
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2], "source": ["a"] * 3,
        "text": ["nav\nmail a@b.co", "nav\ny", "nav\nz 10.0.0.1"],
    })
    dp = str(tmp_path / "docs.parquet")
    docs.to_parquet(dp)
    tp = str(tmp_path / "triples.parquet")
    pd.DataFrame({"subj": ["https://e/1"], "pred": ["name"],
                  "obj": ["A"]}).to_parquet(tp)

    def run(*cmd):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray", *cmd,
             "--num-cpus", "2"],
            capture_output=True, text=True, check=True, cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    r = run("structured", "--input", pp,
            "--output", str(tmp_path / "oj"), "--kind", "jsonld")
    assert r["rows"] == 1
    r = run("structured", "--input", pp,
            "--output", str(tmp_path / "og"), "--kind", "og")
    assert r["rows"] == 1

    r = run("pii", "--input", dp, "--output", str(tmp_path / "op"))
    assert r["n_email"] == 1 and r["n_ip"] == 1
    red = duckdb.sql(f"SELECT text_redacted FROM"
                     f" '{tmp_path}/op/*.parquet' WHERE doc_id = 0").df()
    assert "[EMAIL]" in red["text_redacted"].iloc[0]

    r = run("boilerplate", "--input", dp,
            "--output", str(tmp_path / "ob"), "--min-docs", "3")
    assert r["lines_removed"] == 3

    r = run("ntexport", "--input", tp, "--output", str(tmp_path / "nt"))
    assert r["triples"] == 1
    from biosd_feature_annotator_ray.sources.ntriples import read_ntriples
    assert read_ntriples(str(tmp_path / "nt")).count() == 1


def test_cli_relations_rules_walks_sccs(ray_session, tmp_path):
    """Seventh-sitting CLI commands end to end (subprocess Ray)."""
    import json
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist([
        {"doc_id": 1,
         "text": "we saw mammals such as dogs, cats and foxes"},
        {"doc_id": 2, "text": "no patterns here"}]),
        tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"src": i, "dst": (i + 1) % 6} for i in range(6)]
        + [{"src": 6, "dst": 0}]), tmp_path / "edges.parquet")
    pq.write_table(pa.Table.from_pylist(
        [{"subj": f"p{i}", "pred": "worksFor", "obj": f"o{i % 3}"}
         for i in range(9)]
        + [{"subj": f"o{j}", "pred": "locatedIn", "obj": "c0"}
           for j in range(3)]
        + [{"subj": f"p{i}", "pred": "livesIn", "obj": "c0"}
           for i in range(0, 9, 3)]), tmp_path / "tri.parquet")

    def run(*a):
        r = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray", *a],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    got = run("relations", "--input", str(tmp_path / "docs.parquet"),
              "--output", str(tmp_path / "rel"), "--num-cpus", "2")
    assert got["triples"] == 3
    got = run("rules", "--input", str(tmp_path / "tri.parquet"),
              "--output", str(tmp_path / "rules"), "--num-cpus", "2")
    assert got["rules"] == 1
    got = run("walks", "--input", str(tmp_path / "edges.parquet"),
              "--output", str(tmp_path / "walks"), "--num-cpus", "2")
    assert got["rows"] == 28  # 7 nodes × 4 steps (incl. step 0)
    got = run("sccs", "--input", str(tmp_path / "edges.parquet"),
              "--output", str(tmp_path / "scc"), "--num-cpus", "2")
    assert got == {"nodes": 7, "components": 2,
                   "output": str(tmp_path / "scc")}
