"""Deterministic synthetic ``pages`` generator (FIXTURES.md §1, seed=42).

Primary E2E fixture: Common-Crawl-style pages whose text is 1–8
newline-joined ``"{type}: {value}"`` characteristic lines, with the
documented null-text / html-only pattern (i%10==7 → html only,
i%10==3 → both) and the hot-key skew ("Homo sapiens" on ~40% of pages,
the canonicalization-salting exercise).

The rng call sequence is FROZEN — changing it regenerates different
pages and invalidates tests/golden/triples_v1.parquet.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schemas import PAGES

TYPES = [
    "organism",
    "organism part",
    "age",
    "sex",
    "treatment",
    "disease",
    "temperature",
    "collection date",
    "depth",
    "strain",
]

# Value pools: drawn from the linking corpus (FIXTURES.md §3) and the
# parser corpus (FIXTURES.md §2) so the full pipeline is exercised.
VALUE_POOLS: dict[str, list[str]] = {
    "organism": ["Homo sapiens", "Mus musculus", "human", "mouse", "homo  sapiens", "old term"],
    "organism part": ["liver", "hepatic tissue", "hepatic tissue."],
    "age": ["34 weeks", "2-5", "42", "3.5 to 4.5", "12 weeks"],
    "sex": ["male", "female", "M", "F"],
    "treatment": ["xyzzy compound", "20-30 mg", "5 mg"],
    "disease": ["diabetes", "diabetes mellitus", "t2d"],
    "temperature": ["37 C", "-3.2e2", "<= 10", "70.5"],
    "collection date": [
        "2010-07-28",
        "28/07/2010",
        "28-Jul-2010",
        "Jul 2010",
        "1999",
        "2010-01-01 - 2010-12-31",
    ],
    "depth": ["10..20", "70.5", "12345", "5-2"],
    "strain": ["C57BL/6", "n/a"],
}

NOISE_WORDS = [
    "lorem", "ipsum", "sample", "metadata", "record", "web", "page",
    "archive", "crawl", "data", "value", "entry", "random", "notes",
]

EPOCH_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")


def gen_pages(n: int, seed: int = 42) -> pa.Table:
    """Generate n synthetic pages. Deterministic for (n, seed)."""
    rng = np.random.default_rng(seed)
    urls = [f"https://sample.test/s/{i:08d}" for i in range(n)]
    warc_ts = pa.array(EPOCH_US + np.arange(n, dtype="int64") * 1_000_000, pa.timestamp("us", tz="UTC"))
    langs = rng.choice(["en", "es", "de"], size=n, p=[0.90, 0.05, 0.05]).tolist()

    # Pre-draw vectorized randomness in a fixed order.
    hot = rng.random(n) < 0.40
    n_lines = rng.integers(1, 9, size=n)
    total = int(n_lines.sum())
    type_idx = rng.integers(0, len(TYPES), size=total)
    from_pool = rng.random(total) < 0.70
    pool_pick = rng.random(total)  # scaled per-pool below
    noise_idx = rng.integers(0, len(NOISE_WORDS), size=(total, 2))

    texts: list[str | None] = []
    htmls: list[bytes | None] = []
    pos = 0
    for i in range(n):
        lines: list[str] = []
        if hot[i]:
            lines.append("organism: Homo sapiens")
        for _ in range(n_lines[i]):
            t = TYPES[type_idx[pos]]
            if from_pool[pos]:
                pool = VALUE_POOLS[t]
                v = pool[int(pool_pick[pos] * len(pool))]
            else:
                w = noise_idx[pos]
                v = f"{NOISE_WORDS[w[0]]} {NOISE_WORDS[w[1]]}"
            lines.append(f"{t}: {v}")
            pos += 1
        body = "\n".join(lines)
        mode = i % 10
        if mode == 7:  # html only → exercises the html→text path
            texts.append(None)
            htmls.append(b"<html><body>" + body.encode() + b"</body></html>")
        elif mode == 3:  # both → text passthrough must win (byte identity)
            texts.append(body)
            htmls.append(b"<html><body>" + body.encode() + b"</body></html>")
        else:
            texts.append(body)
            htmls.append(None)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": warc_ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )


def write_pages(path: str, n: int, seed: int = 42, rows_per_file: int = 50_000) -> None:
    """Write the synthetic pages as a multi-file Parquet dir (bench input)."""
    import os
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for start in range(0, n, rows_per_file):
        # Deterministic per-shard generation: shard seed = (seed, shard).
        cnt = min(rows_per_file, n - start)
        t = _gen_shard(start, cnt, seed)
        pq.write_table(t, os.path.join(path, f"pages-{start:09d}.parquet"))


def _gen_shard(start: int, cnt: int, seed: int) -> pa.Table:
    """Shard-local generation with urls/timestamps offset by ``start``.

    Uses an rng seeded by (seed, start) so shards are independently
    deterministic (resumable generation at 100k+ rows).
    """
    t = gen_pages(cnt, seed=seed + start)
    urls = pa.array([f"https://sample.test/s/{i:08d}" for i in range(start, start + cnt)], pa.string())
    ts = pa.array(EPOCH_US + np.arange(start, start + cnt, dtype="int64") * 1_000_000, pa.timestamp("us", tz="UTC"))
    return t.set_column(0, "url", urls).set_column(1, "warc_ts", ts)
