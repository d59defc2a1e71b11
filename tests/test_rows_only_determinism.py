"""r03 verdict item 10: every rows-only query (no SQL oracle — hash
domains, ANN approximation, media, synthetic pages) must return an
identical value hash across two runs, so nondeterminism can't hide
where no oracle exists. Runs at sf0.001 for speed; the determinism
property is scale-independent (all sampling/hashing is md5-seeded)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rows_only_names():
    import __ray_entry__ as e

    return sorted(set(e.queries()) - set(e.oracle_sql()))


def _canon_hash(res) -> str:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            # approximate pipelines are deterministic, but float text
            # formatting is the stable cross-run representation
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.md5()
    h.update(",".join(f"{c}:{df[c].dtype}" for c in df.columns).encode())
    h.update(df.to_csv(index=False).encode())
    return h.hexdigest()


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_is_deterministic(ray_session, name):
    import __ray_entry__ as e

    fn = e.queries()[name]
    h1 = _canon_hash(fn(SF_DIR))
    h2 = _canon_hash(fn(SF_DIR))
    assert h1 == h2, f"{name}: value hash differs between two runs"
