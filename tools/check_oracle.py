"""Local simulation of the driver's correctness gate.

Runs every queries() entry at the given sf_dir, compares against
oracle_sql() via DuckDB: row count, column-name set, order-insensitive
value comparison (sorted by all columns), and — since round 3 — DTYPE
equality after normalizing datetime units, because the driver's value
hash is dtype-sensitive (r02: asof/interval failed on a float64 vs
int64 event_id with cell-identical values while the value-only local
check passed). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

With query names given, only those entries run (sf_dir may be omitted
when the first arg is not a directory).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    assert isinstance(res, pd.DataFrame)
    return res


def canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> None:
    import os

    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)
    import duckdb
    import pandas as pd

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd/flag-style arg would otherwise filter to an EMPTY
        # run that prints "FAILURES: none" — a vacuous green
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"ERROR  {name}: {type(ex).__name__}: {ex}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows   {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        want = canon(con.sql(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS got={len(got)} want={len(want)}"
        elif list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
            # the driver's value hash diverges on dtype even when every
            # cell is equal — flag it here so local green == driver green
            diff = {c: (str(got[c].dtype), str(want[c].dtype))
                    for c in got.columns if str(got[c].dtype) != str(want[c].dtype)}
            status = f"DTYPE  {diff}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=False, rtol=1e-9)
            except AssertionError as ex:
                status = "VALUES " + str(ex).split("\n")[0]
        if status != "OK":
            failures.append(name)
        print(f"{'OK    ' if status == 'OK' else 'FAIL  '} {name}: {len(got)} rows ({dt:.1f}s) {status if status != 'OK' else ''}")

    print("\nFAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
