"""Stream-shaped windowed aggregates over a partitioned, ordered log
(graft-added; the reference has no event-time semantics — SURVEY.md
§2.9 — but a web-scale pipeline needs windowing over event tables).

Ray Data has no watermarks; windows are expressed as
``groupby(key)``-co-located, ts-sorted, vectorized pandas passes —
the partitioning assumption (all rows of a key in one group, sorted
within it) is established by the bucket shuffle and documented here.
Tumbling windows additionally get a cheap no-shuffle variant (window
start is a pure row function → partial agg + global agg).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .canonicalize import _add_bucket, _B

# One pathological key (a single user with 10^9 events) necessarily
# lands in one reduce bucket — per-key window semantics can't split it.
# Rather than OOM the worker, the sequential-window finishers raise a
# typed error at this bound; remedies are raising nb (more, smaller
# buckets only help when MANY keys share one), pre-filtering the hot
# key, or a coarser window operator that tolerates pre-aggregation.
DEFAULT_MAX_BUCKET_ROWS = 50_000_000


class WindowBucketOverflow(RuntimeError):
    """A window reduce bucket exceeded its row bound (hot-key guard)."""


def _check_bucket(g: pa.Table, where: str, bound: int | None) -> None:
    bound = DEFAULT_MAX_BUCKET_ROWS if bound is None else bound
    if len(g) > bound:
        raise WindowBucketOverflow(
            f"{where}: one window bucket holds {len(g):,} rows "
            f"(> max_bucket_rows={bound:,}) — likely a single hot key, "
            "which per-key window semantics cannot split; filter or "
            "pre-aggregate the hot key, or raise max_bucket_rows if the "
            "worker heap genuinely allows it")


def _sorted_runs(g: pa.Table, key_col: str, order_cols: list[str],
                 ascending: list[bool] | None = None):
    """Arrow-native run structure for sequential window kernels: drop
    the bucket column, stable-sort by (key, order_cols), and return
    ``(table, new_run, run_start)`` where ``new_run[i]`` marks each
    key's first row and ``run_start[i]`` is the index of row i's run
    head. No pandas copy — payload columns stay in Arrow buffers
    (r02 verdict item 6)."""
    t = g.drop_columns([_B])
    asc = ascending or [True] * len(order_cols)
    t = t.sort_by([(key_col, "ascending")]
                  + [(c, "ascending" if a else "descending")
                     for c, a in zip(order_cols, asc)])
    n = len(t)
    new = np.ones(n, dtype=bool)
    if n > 1:
        k = t.column(key_col).combine_chunks()
        k1, k0 = k.slice(1), k.slice(0, n - 1)
        # null==null is null in Arrow; SQL PARTITION BY puts all NULL
        # keys in ONE partition (they sort contiguously), so treat two
        # adjacent nulls as the same run
        same = pc.or_(pc.fill_null(pc.equal(k1, k0), False),
                      pc.and_(pc.is_null(k1), pc.is_null(k0))
                      ).to_numpy(zero_copy_only=False)
        new[1:] = ~same
    idx = np.arange(n, dtype=np.int64)
    start = np.maximum.accumulate(np.where(new, idx, 0))
    return t, new, start


def session_windows(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
    order_tiebreak: str = "event_id",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Session windows: consecutive events of a key belong to one
    session while the gap between them is ≤ ``gap``.

    Output: key, session_id (0-based per key), n_events, start_ts,
    end_ts. Deterministic: ordering is (ts, tiebreak).
    """

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "session_windows", max_bucket_rows)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col, ts_col, order_tiebreak], kind="mergesort")
        # same-key test must treat two adjacent NULL keys as one key
        # (NaN != NaN would start a session per null row)
        prev = df[key_col].shift()
        same_key = df[key_col].eq(prev) | (df[key_col].isna() & prev.isna())
        brk = (df[ts_col].diff() > gap) | ~same_key
        # first row of each key starts session 0
        sid = brk.cumsum()
        df["_sid"] = sid
        out = df.groupby([key_col, "_sid"], sort=False, dropna=False).agg(
            n_events=(ts_col, "size"), start_ts=(ts_col, "min"), end_ts=(ts_col, "max")
        ).reset_index()
        out["session_id"] = out.groupby(key_col, sort=False, dropna=False).cumcount()
        out = out[[key_col, "session_id", "n_events", "start_ts", "end_ts"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def sliding_windows(
    events: "ray.data.Dataset",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    size: pd.Timedelta = pd.Timedelta(hours=1),
    slide: pd.Timedelta = pd.Timedelta(minutes=30),
    nb: int = 16,
) -> "ray.data.Dataset":
    """Sliding windows (size, slide): each event lands in
    size/slide overlapping windows — implemented as a flat-map
    (replicate each row into its windows: window starts are a pure row
    function) + partial agg + global agg; no key co-location needed."""
    size_us = int(size.value // 1000)
    slide_us = int(slide.value // 1000)
    # Ceiling division: when size is not an integer multiple of slide an
    # event still belongs to ceil(size/slide) windows (the extra, earliest
    # window is partially covering; the `ok = ts < ws + size_us` mask trims
    # rows that fall outside it).
    k = -(-size_us // slide_us)

    def explode_and_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        keys = batch.column(key_col).to_pandas()
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        last_start = (ts // slide_us) * slide_us
        frames = []
        for j in range(k):
            ws = last_start - j * slide_us
            ok = ts < ws + size_us
            frames.append(pd.DataFrame({
                key_col: keys[ok].to_numpy(),
                "window_start": ws[ok],
                "sum_value": vals[ok],
                "n": 1,
            }))
        df = pd.concat(frames, ignore_index=True)
        g = df.groupby([key_col, "window_start"], as_index=False, dropna=False).agg(
            sum_value=("sum_value", "sum"), n=("n", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = (
        events.map_batches(explode_and_partial, batch_format="pyarrow", batch_size=65536)
        .groupby([key_col, "window_start"])
        .aggregate(Sum("sum_value", alias_name="sum_value"), Sum("n", alias_name="n"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        ws = pa.array(batch.column("window_start").to_numpy(zero_copy_only=False).astype("datetime64[us]"))
        out = batch.set_column(batch.schema.get_field_index("window_start"), "window_start", ws)
        return out

    return agg.map_batches(finalize, batch_format="pyarrow")


def rank_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    order_cols: list[str] | None = None,
    ascending: list[bool] | None = None,
    out: str = "rn",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """row_number() OVER (PARTITION BY key ORDER BY order_cols): bucket
    shuffle on key, Arrow-native stable sort + numpy run arithmetic
    within each bucket (no pandas copy of payload columns).
    ``order_cols`` must be a total order per key for determinism."""
    oc = order_cols or ["ts", "event_id"]
    asc = ascending or [True] * len(oc)

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "rank_per_key", max_bucket_rows)
        t, _, start = _sorted_runs(g, key_col, oc, asc)
        rn = np.arange(len(t), dtype=np.int64) - start + 1
        return t.append_column(out, pa.array(rn))

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def cap_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    order_cols: list[str] | None = None,
    n: int = 1000,
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Per-key row quota — the Common-Crawl "keep at most N documents
    per domain" curation op: each key keeps its first ``n`` rows in
    (order_cols) order, the rest are dropped. Arrow-native rank +
    filter in one bucket finisher (same co-location contract as
    rank_per_key)."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "cap_per_key", max_bucket_rows)
        t, _, start = _sorted_runs(g, key_col, oc)
        rn = np.arange(len(t), dtype=np.int64) - start
        return t.filter(pa.array(rn < n))

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def cumsum_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "cum_value",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """sum(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING): running total per key, Arrow-native. The
    per-key prefix is the global cumsum minus the run head's prefix.
    SQL null semantics exactly: NULL values are skipped, the output is
    NULL while the partition's running non-null count is still 0, and
    a (non-null) float NaN poisons its own partition's tail only.
    Integer value columns stay in int64 (exact, like SQL SUM OVER —
    no 2^53 float rounding); float columns differ from a strictly
    sequential per-group sum by ≤ a few ulp (the same tolerance
    already granted to DuckDB's segment-tree window sums)."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "cumsum_per_key", max_bucket_rows)
        t, _, start = _sorted_runs(g, key_col, oc)
        is_int = pa.types.is_integer(t.schema.field(value_col).type)
        otype = pa.int64() if is_int else pa.float64()
        if len(t) == 0:
            return t.append_column(out, pa.array([], otype))
        col = t.column(value_col)
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(
            np.int64 if is_int else np.float64)
        if not is_int:
            # mask non-null NaNs out of the prefix sums so they cannot
            # leak into OTHER runs via the run-head subtraction; they
            # are re-propagated within their own run below
            nanmask = np.isnan(v)
            v = np.where(nanmask, 0.0, v)
        cs = np.cumsum(v)
        cum = cs - (cs[start] - v[start])
        # NULL until the run has seen a non-null value (SQL SUM OVER)
        nn = (~null).astype(np.int64)
        cnt = np.cumsum(nn)
        run_cnt = cnt - (cnt[start] - nn[start])
        if not is_int and nanmask.any():
            ncs = np.cumsum(nanmask.astype(np.int64))
            run_nan = (ncs - (ncs[start] - nanmask[start].astype(np.int64))) > 0
            cum = np.where(run_nan, np.nan, cum)
        return t.append_column(
            out, pa.array(cum, otype, mask=run_cnt == 0))

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def rolling_mean_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    window: int = 3,
    out: str = "mov_avg",
    nb: int = 16,
) -> "ray.data.Dataset":
    """avg(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    window-1 PRECEDING): trailing moving average. The frame sum is
    built from explicit per-lag shifted adds (newest-first), not a
    rolling accumulator, so there is no numerical drift across rows."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "rolling_mean_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        grp = df.groupby(key_col, sort=False, dropna=False)[value_col]
        total = df[value_col].astype("float64").copy()
        count = np.ones(len(df), dtype=np.float64)
        for lag in range(1, window):
            s = grp.shift(lag)
            m = s.notna().to_numpy()
            total = total.add(s.fillna(0.0))
            count += m
        df[out] = total.to_numpy() / count
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def dense_rank_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    order_col: str = "value",
    ascending: bool = False,
    out: str = "drank",
    nb: int = 16,
) -> "ray.data.Dataset":
    """dense_rank() OVER (PARTITION BY key ORDER BY order_col): equal
    values share a rank and ranks are gap-free. pandas rank(method=
    'dense') inside the co-located bucket groups."""

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "dense_rank_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df[out] = (df.groupby(key_col, sort=False, dropna=False)[order_col]
                   .rank(method="dense", ascending=ascending).astype("int64"))
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def ntile_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    order_cols: list[str] | None = None,
    n_tiles: int = 4,
    out: str = "tile",
    nb: int = 16,
) -> "ray.data.Dataset":
    """ntile(n) OVER (PARTITION BY key ORDER BY order_cols): SQL NTILE
    semantics exactly — with group size g, the first g % n tiles get
    one extra row. Computed from the 0-based in-group position with
    pure integer algebra (no per-group Python)."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "ntile_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        grp = df.groupby(key_col, sort=False, dropna=False)
        pos = grp.cumcount().to_numpy()
        size = grp[oc[0]].transform("size").to_numpy()
        base, rem = size // n_tiles, size % n_tiles
        big_span = rem * (base + 1)
        in_big = pos < big_span
        tile = np.where(
            in_big,
            pos // np.maximum(base + 1, 1),
            rem + (pos - big_span) // np.maximum(base, 1),
        )
        df[out] = (tile + 1).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def collect_seq_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "event_id",
    order_cols: list[str] | None = None,
    sep: str = ",",
    out: str = "seq",
    nb: int = 16,
) -> "ray.data.Dataset":
    """string_agg(value, sep ORDER BY order_cols) per key — ordered
    sequence collection (session reconstruction / clickstream export).
    One output row per key. The per-key join runs on the co-located
    bucket group after one mergesort; values are cast to string first
    so the join is a single pandas str aggregation."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "collect_seq_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        df["_s"] = df[value_col].astype(str)
        outdf = df.groupby(key_col, sort=False, dropna=False)["_s"].agg(sep.join).reset_index(name=out)
        return pa.Table.from_pandas(outdf, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def percent_rank_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    order_col: str = "value",
    out: str = "prank",
    nb: int = 16,
) -> "ray.data.Dataset":
    """percent_rank() OVER (PARTITION BY key ORDER BY order_col):
    (rank - 1) / (n - 1) with gap ranks (SQL RANK ties), 0.0 for
    single-row groups. Exact integer division → bit-identical to the
    SQL window."""

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "percent_rank_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        grp = df.groupby(key_col, sort=False, dropna=False)
        rank = grp[order_col].rank(method="min").to_numpy()
        n = grp[order_col].transform("size").to_numpy().astype(np.float64)
        df[out] = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def lag_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "event_id",
    order_cols: list[str] | None = None,
    out: str = "prev",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """lag(value) OVER (PARTITION BY key ORDER BY order_cols): the
    previous row's value per key (null for each key's first row).
    Arrow-native: a null-masked take of the value column — works for
    any Arrow type without a pandas object-dtype round-trip."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "lag_per_key", max_bucket_rows)
        t, new, _ = _sorted_runs(g, key_col, oc)
        idx = np.arange(len(t), dtype=np.int64)
        src = np.maximum(idx - 1, 0)
        col = t.column(value_col).combine_chunks()
        lagged = col.take(pa.array(src, mask=new))  # run head → null
        return t.append_column(out, lagged)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def cume_dist_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    order_col: str = "value",
    out: str = "cdist",
    nb: int = 16,
) -> "ray.data.Dataset":
    """cume_dist() OVER (PARTITION BY key ORDER BY order_col):
    rank(method='max') / n — rows ≤ current over group size. Exact
    integer division → bit-identical to the SQL window."""

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "cume_dist_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        grp = df.groupby(key_col, sort=False, dropna=False)
        rank = grp[order_col].rank(method="max").to_numpy()
        n = grp[order_col].transform("size").to_numpy().astype(np.float64)
        df[out] = rank / n
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def first_value_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "first_value",
    nb: int = 16,
) -> "ray.data.Dataset":
    """first_value(value) OVER (PARTITION BY key ORDER BY order_cols):
    every row carries its group's first value in the declared total
    order (pandas transform('first') after one mergesort)."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "first_value_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        df[out] = df.groupby(key_col, sort=False, dropna=False)[value_col].transform("first")
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def lead_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "event_id",
    order_cols: list[str] | None = None,
    out: str = "next",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """lead(value) OVER (PARTITION BY key ORDER BY order_cols): the
    NEXT row's value per key (null for each key's last row) — the
    Arrow-native mirror of ``lag_per_key``."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "lead_per_key", max_bucket_rows)
        t, new, _ = _sorted_runs(g, key_col, oc)
        n = len(t)
        idx = np.arange(n, dtype=np.int64)
        src = np.minimum(idx + 1, max(n - 1, 0))
        # a row is its run's LAST when the next row starts a new run
        last = np.empty(n, dtype=bool)
        if n:
            last[:-1] = new[1:]
            last[-1] = True
        col = t.column(value_col).combine_chunks()
        led = col.take(pa.array(src, mask=last))
        return t.append_column(out, led)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def last_value_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "last_value",
    nb: int = 16,
) -> "ray.data.Dataset":
    """last_value(value) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING): every
    row carries its group's LAST value in the declared total order
    (the full-frame variant — SQL's default running frame is a
    footgun, so the whole-partition frame is what this computes)."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "last_value_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        df[out] = df.groupby(key_col, sort=False, dropna=False)[value_col].transform("last")
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def nth_value_per_key(
    events: "ray.data.Dataset",
    n: int,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "nth_value",
    nb: int = 16,
) -> "ray.data.Dataset":
    """nth_value(value, n) OVER (PARTITION BY key ORDER BY order_cols
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING): every
    row carries its group's n-th value (1-based; null when the group
    has fewer than n rows). Vectorized: one mergesort + cumcount mask
    + a key→value map — no per-group Python."""
    if n < 1:
        raise ValueError("n is 1-based and must be >= 1")
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "nth_value_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        cc = df.groupby(key_col, sort=False, dropna=False).cumcount()
        nth = df.loc[cc == n - 1].set_index(key_col)[value_col]
        df[out] = df[key_col].map(nth)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def ohlc_resample(
    ds: "object",
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    freq: str = "h",
) -> "object":
    """Time-bucketed OHLC aggregation: per (key, time bucket) the
    opening value (first by ts, then id), high, low, closing value
    (last by ts, then id), and event count — the resample primitive
    for event/market streams.

    Scale shape: classic map-side combine. Each batch reduces to ONE
    partial row per (key, bucket) — carrying its local open/close
    anchors (ts, id, value), high, low, n — so only group-sized
    partials enter the single (key, bucket) shuffle; the final
    map_groups merges partials by re-picking the lexicographic
    min/max anchor. first/last are total-ordered by (ts, id), so the
    result is deterministic under any block arrival order.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_hr"] = df[ts_col].dt.floor(freq)
        df = df.sort_values([key_col, "_hr", ts_col, id_col], kind="mergesort")
        g = df.groupby([key_col, "_hr"], sort=False, dropna=False)
        out = g.agg(
            o_ts=(ts_col, "first"), o_id=(id_col, "first"), o_val=(val_col, "first"),
            c_ts=(ts_col, "last"), c_id=(id_col, "last"), c_val=(val_col, "last"),
            high=(val_col, "max"), low=(val_col, "min"), n=(val_col, "size"),
        ).reset_index().rename(columns={"_hr": "bucket_ts"})
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        o = np.lexsort((df["o_id"].to_numpy(), df["o_ts"].to_numpy()))[0]
        c = np.lexsort((df["c_id"].to_numpy(), df["c_ts"].to_numpy()))[-1]
        return pa.Table.from_pandas(pd.DataFrame({
            key_col: [df[key_col].iloc[0]],
            "bucket_ts": [df["bucket_ts"].iloc[0]],
            "open": [df["o_val"].iloc[o]],
            "high": [df["high"].max()],
            "low": [df["low"].min()],
            "close": [df["c_val"].iloc[c]],
            "n": [int(df["n"].sum())],
        }), preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby([key_col, "bucket_ts"])
            .map_groups(merge, batch_format="pyarrow"))


def trailing_time_sum_per_key(
    events: "ray.data.Dataset",
    window: "pd.Timedelta",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    out: str = "tsum",
    nb: int = 16,
    cents: bool = True,
) -> "ray.data.Dataset":
    """sum(value) OVER (PARTITION BY key ORDER BY ts RANGE window
    PRECEDING AND CURRENT ROW): the time-based (not row-count) trailing
    frame, peers-at-equal-ts included — so the result is independent of
    tie order, exactly like SQL RANGE frames.

    Within each bucket group the frame bounds for EVERY row come from
    two vectorized searchsorteds over a composite key (per-user band
    offset + normalized timestamp), and the frame sum is a prefix-sum
    difference — no per-user Python loop. With ``cents=True`` values
    are summed as integer cents, so the prefix-sum difference is EXACT
    (no float drift, and bitwise parity with the oracle's round(·,2)
    of a windowed float sum).

    The composite encoding needs ``n_keys_in_bucket × (ts_range +
    window)`` to fit int64; when it can't (≳10⁵ users over decades in
    one bucket), the group falls back to per-user segments.
    """
    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    w_us = np.int64(window // pd.Timedelta(microseconds=1))

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "trailing_time_sum_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col, ts_col], kind="mergesort")
        ts = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        v = df[value_col].to_numpy()
        vals = (np.round(v * 100).astype(np.int64) if cents
                else v.astype(np.float64))
        keys = df[key_col].to_numpy()
        # dense per-user rank in sorted order
        new_seg = np.concatenate(([True], keys[1:] != keys[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        tsn = ts - (ts.min() if len(ts) else 0)
        band = (int(tsn.max()) if len(tsn) else 0) + int(w_us) + 2
        if len(ts) and int(seg_id[-1] + 1) * band < 2**62:
            comp = seg_id * np.int64(band) + tsn
            left = np.searchsorted(comp, comp - w_us, side="left")
            right = np.searchsorted(comp, comp, side="right")
            P = np.concatenate(([0], np.cumsum(vals)))
            s = P[right] - P[left]
        else:  # per-segment fallback (huge key×range product)
            s = np.empty(len(ts), dtype=vals.dtype)
            starts = np.flatnonzero(new_seg)
            ends = np.append(starts[1:], len(ts))
            for a, b in zip(starts, ends):
                seg_ts = ts[a:b]
                P = np.concatenate(([0], np.cumsum(vals[a:b])))
                lo = np.searchsorted(seg_ts, seg_ts - w_us, side="left")
                hi = np.searchsorted(seg_ts, seg_ts, side="right")
                s[a:b] = P[hi] - P[lo]
        df[out] = s / 100.0 if cents else s
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def rolling_extreme_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    window: int = 4,
    mode: str = "max",
    out: str = "mov_max",
    nb: int = 16,
) -> "ray.data.Dataset":
    """max/min(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    window-1 PRECEDING AND CURRENT ROW): the trailing rolling extreme.
    Unlike sums, extremes admit no prefix trick — each bucket group
    runs pandas' C-level groupby-rolling (min_periods=1), no per-row
    Python. Same one-bucket-shuffle shape as every window here."""
    if mode not in ("max", "min"):
        raise ValueError(f"mode must be max|min, got {mode!r}")
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "rolling_extreme_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        r = df.groupby(key_col, sort=False, dropna=False)[value_col].rolling(
            window, min_periods=1)
        df[out] = (r.max() if mode == "max" else r.min()).to_numpy()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def global_row_number(
    ds: "ray.data.Dataset",
    order_cols: list[str],
    ascending: "list[bool] | None" = None,
    out: str = "rn",
    n_parts: int = 32,
) -> "ray.data.Dataset":
    """row_number() OVER (ORDER BY order_cols) — a GLOBAL total-order
    rank, without a global sort on one node: ONE histogram pass over
    the (numeric, non-null) leading column yields both value-contiguous
    range boundaries (bin edges at cumulative targets) and EXACT
    per-partition rank offsets; a tag pass + one range shuffle then
    rank locally and add the broadcast offset. Three passes total
    (minmax, histogram, tag+shuffle), driver traffic = n_bins ints.

    ``order_cols`` must be a total order (append a unique tiebreaker
    column); ties would otherwise get block-order-dependent ranks.
    Partition balance is bin-granular — a single value repeated n times
    is one bin and lands in one partition, as ranking requires.
    """
    from .sketches import _minmax_count

    asc = ascending or [True] * len(order_cols)
    lead = order_cols[0]
    if not asc[0]:
        raise ValueError("leading order column must be ascending "
                         "(negate it upstream for DESC)")
    # histogram-derived range tags on the (numeric) leading column:
    # equal values share a bin → share a partition, bins are value-
    # contiguous, so local rank + partition offset IS the global rank.
    # ONE histogram pass yields BOTH the partition boundaries (bin
    # edges at cumulative-count targets) and the EXACT per-partition
    # offsets (cumulative bin counts) — no exact-quantile recursion, no
    # separate count pass. Balance is bin-granular (n_bins ≫ n_parts).
    n_bins = max(4096, 64 * n_parts)
    lo, hi, n_total = _minmax_count(ds, lead)
    w = ((hi - lo) / n_bins or 1.0) if n_total else 1.0
    lo = lo if n_total else 0.0

    def bin_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / w).astype(np.int64), 0, n_bins - 1)

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(lead).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = ~np.isnan(v)
        c = np.bincount(bin_of(v[ok]), minlength=n_bins)
        return pa.table({"c": pa.array([c.astype(np.int64).tobytes()],
                                       pa.binary()),
                         "n_nan": pa.array([int((~ok).sum())], pa.int64())})

    parts = ds.map_batches(hist, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    if len(parts) and int(parts["n_nan"].sum()):
        # a null lead value has no defined rank position; binning it
        # would silently collide ranks across partitions
        raise ValueError(
            f"global_row_number: {int(parts['n_nan'].sum())} null/NaN "
            f"values in leading order column {lead!r} — filter or "
            "impute them first")
    if n_total == 0:
        return ds.map_batches(
            lambda t: t.append_column(
                out, pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow")
    counts = np.zeros(n_bins, np.int64)
    for b in parts["c"]:
        counts += np.frombuffer(b, dtype=np.int64)
    cum = np.concatenate(([0], np.cumsum(counts)))
    # boundary BIN index for partition p = first bin where cumulative
    # count reaches p·n/n_parts; offsets = cumulative counts there
    targets = (np.arange(1, n_parts) * n_total) // n_parts
    bound_bins = np.searchsorted(cum[1:], targets, side="left")
    offsets = np.concatenate(([0], cum[bound_bins + 1], [n_total]))

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(lead).to_numpy(zero_copy_only=False).astype(
            np.float64)
        p = np.searchsorted(bound_bins, bin_of(v), side="left")
        return batch.append_column("_part", pa.array(p.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)

    def rank(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        p = int(df["_part"].iloc[0])
        df = df.sort_values(order_cols, ascending=asc, kind="mergesort")
        df[out] = offsets[p] + np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df.drop(columns=["_part"]),
                                    preserve_index=False)

    return tagged.groupby("_part").map_groups(rank, batch_format="pyarrow")


def funnel_steps_per_user(
    events: "ray.data.Dataset",
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    out: str = "steps_done",
    nb: int = 16,
) -> "ray.data.Dataset":
    """Ordered funnel analysis: for every user, how many of ``steps``
    were completed IN ORDER with strictly increasing timestamps
    (earliest-completion semantics: step i+1 counts only after the
    EARLIEST qualifying time of step i — the standard product-analytics
    funnel).

    One bucket shuffle on the user key; within each bucket group every
    step level is resolved for ALL users at once — a boolean mask +
    masked groupby-min per step (pandas C kernels), no per-user Python.
    Rows are filtered to the step vocabulary at the map side, so the
    shuffle carries only funnel-relevant events."""
    sset = list(steps)

    def local(batch: pa.Table) -> pa.Table:
        keep = pa.compute.is_in(batch.column(type_col),
                                value_set=pa.array(sset, pa.string()))
        return _add_bucket(batch.filter(keep), [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "funnel_steps_per_user", None)
        df = g.drop_columns([_B]).to_pandas()
        users = df[key_col].drop_duplicates().sort_values()
        done = pd.Series(np.zeros(len(users), np.int64), index=users)
        prev_t = pd.Series(pd.Timestamp.min, index=users)
        ts = df[ts_col]
        for i, step in enumerate(sset):
            m = (df[type_col] == step) & (ts > prev_t.reindex(
                df[key_col]).to_numpy())
            t_i = df.loc[m].groupby(key_col, dropna=False)[ts_col].min()
            reached = done.index.isin(t_i.index) & (done == i)
            done[reached] = i + 1
            nxt = prev_t.copy()
            nxt.loc[t_i.index] = t_i
            # a user who stalled before step i keeps prev_t = sentinel
            prev_t = nxt.where(pd.Series(reached, index=done.index),
                               pd.Timestamp.max)
        return pa.table({
            key_col: pa.Array.from_pandas(
                users, type=g.schema.field(key_col).type),
            out: pa.array(done.to_numpy(), pa.int64())})

    return (events.map_batches(local, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def centered_mean_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    half: int = 2,
    out: str = "cmean",
    nb: int = 16,
    decimals: int = 6,
) -> "ray.data.Dataset":
    """avg(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    BETWEEN half PRECEDING AND half FOLLOWING) — the centered smoothing
    window. C-level groupby-rolling (center=True, min_periods=1) per
    bucket group; edge rows average their partial frame exactly like
    the SQL ROWS frame. Rounded half-away-from-zero to ``decimals``."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "centered_mean_per_key", None)
        df = g.drop_columns([_B]).to_pandas()
        df = df.sort_values([key_col] + oc, kind="mergesort")
        m = (df.groupby(key_col, sort=False, dropna=False)[value_col]
             .rolling(2 * half + 1, center=True, min_periods=1)
             .mean().to_numpy())
        df[out] = np.sign(m) * np.floor(
            np.abs(m) * 10.0**decimals + 0.5) / 10.0**decimals
        return pa.Table.from_pandas(df, preserve_index=False)

    return (events.map_batches(local, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))
