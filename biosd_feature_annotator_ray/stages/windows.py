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
# Streamable finishers (rank/cap/cumsum/lag/lead) DEGRADE at this
# bound: they process the sorted bucket in sub-slices with O(1)
# carried state, so the guard is a spill, not a stop (r03 verdict
# item 3). Finishers that need the whole partition at once (ntile,
# percent_rank, last/nth_value, session, …) still raise the typed
# error; remedies are raising nb (more, smaller buckets only help when
# MANY keys share one), pre-filtering the hot key, or a coarser window
# operator that tolerates pre-aggregation.
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


def _sort_bucket(g: pa.Table, key_col: str, order_cols: list[str],
                 ascending: list[bool] | None = None) -> pa.Table:
    """Drop the bucket column and stable-sort by (key, order_cols)."""
    t = g.drop_columns([_B]) if _B in g.column_names else g
    asc = ascending or [True] * len(order_cols)
    return t.sort_by([(key_col, "ascending")]
                     + [(c, "ascending" if a else "descending")
                        for c, a in zip(order_cols, asc)])


def _runs_of(t: pa.Table, key_col: str):
    """Run structure of an already-sorted table: ``(new_run,
    run_start)`` where ``new_run[i]`` marks each key's first row and
    ``run_start[i]`` is the index of row i's run head."""
    n = len(t)
    new = np.ones(n, dtype=bool)
    if n > 1:
        # SQL PARTITION BY puts all NULL keys in ONE partition and all
        # NaN keys in one partition (both sort contiguously) — plain
        # pc.equal is null for null==null and false for NaN==NaN, so
        # share the grouping-equality kernel with the tie blocks
        new[1:] = ~_adjacent_same(t.column(key_col))
    idx = np.arange(n, dtype=np.int64)
    start = np.maximum.accumulate(np.where(new, idx, 0))
    return new, start


def _sorted_runs(g: pa.Table, key_col: str, order_cols: list[str],
                 ascending: list[bool] | None = None):
    """Arrow-native run structure for sequential window kernels: drop
    the bucket column, stable-sort by (key, order_cols), and return
    ``(table, new_run, run_start)``. No pandas copy — payload columns
    stay in Arrow buffers (r02 verdict item 6)."""
    t = _sort_bucket(g, key_col, order_cols, ascending)
    new, start = _runs_of(t, key_col)
    return t, new, start


def _run_geometry(new: np.ndarray):
    """Per-row run geometry from the ``new_run`` mask of a sorted
    bucket: ``(pos, size, heads, lens)`` — 0-based in-run position,
    run length broadcast to every row, run-head indices, run lengths.
    All numpy; shared by the Arrow-native window finishers."""
    n = len(new)
    idx = np.arange(n, dtype=np.int64)
    start = np.maximum.accumulate(np.where(new, idx, 0))
    heads = np.flatnonzero(new)
    lens = np.diff(np.append(heads, n))
    size = np.repeat(lens, lens)
    return idx - start, size, heads, lens


def _adjacent_same(col: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """``same[i]`` (i ≥ 1): row i's value equals row i-1's, with SQL
    grouping semantics — two nulls compare equal, and two float NaNs
    compare equal (DuckDB rank/dense_rank tie NaNs together; plain
    pc.equal(NaN, NaN) is false — r04 review). Length n-1 for an
    n-row column; used for tie blocks in rank-family finishers."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(a)
    if n <= 1:
        return np.zeros(0, dtype=bool)
    a1, a0 = a.slice(1), a.slice(0, n - 1)
    same = pc.or_(pc.fill_null(pc.equal(a1, a0), False),
                  pc.and_(pc.is_null(a1), pc.is_null(a0)))
    if pa.types.is_floating(a.type):
        same = pc.or_(same, pc.and_(
            pc.fill_null(pc.is_nan(a1), False),
            pc.fill_null(pc.is_nan(a0), False)))
    return same.to_numpy(zero_copy_only=False)


# --- streamable spill path (r03 verdict item 3) ---------------------------
# rank / cap / cumsum / lag / lead are sequential over a sorted run but
# need only O(1) carried state per key boundary — so an over-bound
# bucket (one genuinely hot key) is processed in sorted sub-slices
# instead of raising WindowBucketOverflow. The group table itself is
# already materialized by map_groups (that part Ray owns); what the
# slicing bounds is the finisher's ADDITIONAL peak: numpy/Arrow
# temporaries are O(slice), not O(bucket). Non-streamable finishers
# (ntile, percent_rank, last/nth_value, session, …) still raise.
class _NoKey:
    pass


_NOKEY = _NoKey()


def _same_key(a, b) -> bool:
    # SQL PARTITION BY: NULL keys form one partition; float NaN keys
    # form one partition too (mirrors _runs_of/_adjacent_same).
    if a is None or b is None:
        return a is None and b is None
    if (isinstance(a, float) and isinstance(b, float)
            and np.isnan(a) and np.isnan(b)):
        return True
    return a == b


def _stream_rank(t: pa.Table, key_col: str, bound: int, out: str,
                 cap_n: int | None = None) -> pa.Table:
    parts = []
    kcol = t.column(key_col)
    ck, ccnt = _NOKEY, 0
    for lo in range(0, len(t), bound):
        sub = t.slice(lo, bound)
        m = len(sub)
        new, start = _runs_of(sub, key_col)
        rn = np.arange(m, dtype=np.int64) - start + 1
        if ck is not _NOKEY and _same_key(kcol[lo].as_py(), ck):
            rn[start == 0] += ccnt
        ck, ccnt = kcol[lo + m - 1].as_py(), int(rn[-1])
        if cap_n is None:
            parts.append(sub.append_column(out, pa.array(rn)))
        else:
            parts.append(sub.filter(pa.array(rn <= cap_n)))
    return pa.concat_tables(parts) if parts else t


def _stream_cumsum(t: pa.Table, key_col: str, value_col: str, bound: int,
                   out: str) -> pa.Table:
    is_int = pa.types.is_integer(t.schema.field(value_col).type)
    otype = pa.int64() if is_int else pa.float64()
    parts = []
    kcol = t.column(key_col)
    ck, csum, ccnt, cnan = _NOKEY, 0, 0, False
    for lo in range(0, len(t), bound):
        sub = t.slice(lo, bound)
        m = len(sub)
        _, start = _runs_of(sub, key_col)
        col = sub.column(value_col)
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(
            np.int64 if is_int else np.float64)
        if is_int:
            nanmask = np.zeros(m, dtype=bool)
        else:
            nanmask = np.isnan(v)
            v = np.where(nanmask, 0.0, v)
        cs = np.cumsum(v)
        cum = cs - (cs[start] - v[start])
        nn = (~null).astype(np.int64)
        cnt = np.cumsum(nn)
        run_cnt = cnt - (cnt[start] - nn[start])
        ncs = np.cumsum(nanmask.astype(np.int64))
        run_nan = (ncs - (ncs[start] - nanmask[start].astype(np.int64))) > 0
        if ck is not _NOKEY and _same_key(kcol[lo].as_py(), ck):
            fr = start == 0
            cum[fr] += csum
            run_cnt[fr] += ccnt
            if cnan:
                run_nan[fr] = True
        ck = kcol[lo + m - 1].as_py()
        csum, ccnt, cnan = cum[-1], int(run_cnt[-1]), bool(run_nan[-1])
        if not is_int and run_nan.any():
            cum = np.where(run_nan, np.nan, cum)
        parts.append(sub.append_column(
            out, pa.array(cum, otype, mask=run_cnt == 0)))
    return pa.concat_tables(parts) if parts else t


def _stream_lag(t: pa.Table, key_col: str, value_col: str, bound: int,
                out: str) -> pa.Table:
    """lag(1) over an already-sorted table in slices. ``lead`` is this
    same kernel over the reverse order (next row == previous row of
    the reversed sort)."""
    parts = []
    kcol = t.column(key_col)
    ck, cval = _NOKEY, None
    for lo in range(0, len(t), bound):
        sub = t.slice(lo, bound)
        m = len(sub)
        new, _ = _runs_of(sub, key_col)
        col = sub.column(value_col).combine_chunks()
        idx = np.arange(m, dtype=np.int64)
        lagged = col.take(pa.array(np.maximum(idx - 1, 0), mask=new))
        if ck is not _NOKEY and _same_key(kcol[lo].as_py(), ck):
            lagged = pa.concat_arrays([cval, lagged.slice(1)])
        parts.append(sub.append_column(out, lagged))
        ck, cval = kcol[lo + m - 1].as_py(), col.slice(m - 1, 1)
    return pa.concat_tables(parts) if parts else t


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

    gap_us = np.int64(gap // pd.Timedelta(microseconds=1))

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "session_windows", max_bucket_rows)
        # Arrow-native (r03 verdict item 4): the reduce side only ever
        # touches (key, ts) columns; output is built from run geometry,
        # no pandas copy of the bucket
        t, new, _ = _sorted_runs(g.select([_B, key_col, ts_col,
                                           order_tiebreak]),
                                 key_col, [ts_col, order_tiebreak])
        n = len(t)
        if n == 0:
            return pa.table({key_col: t.column(key_col),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "start_ts": t.column(ts_col),
                             "end_ts": t.column(ts_col)})
        tcol = t.column(ts_col).combine_chunks()
        ts = tcol.to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        # NaT becomes int64-min and a raw diff would WRAP to a huge
        # positive gap (r04 review); mirror the old pandas semantics
        # (NaT diff > gap is False → no break on null-ts rows)
        nat = pc.is_null(tcol).to_numpy(zero_copy_only=False)
        brk = new.copy()
        with np.errstate(over="ignore"):
            brk[1:] |= (((ts[1:] - ts[:-1]) > gap_us)
                        & ~nat[1:] & ~nat[:-1])
        sheads = np.flatnonzero(brk)
        slens = np.diff(np.append(sheads, n))
        # 0-based session index per key: position of each session head
        # among its key's session heads
        hidx = np.arange(len(sheads), dtype=np.int64)
        hstart = np.maximum.accumulate(np.where(new[sheads], hidx, 0))
        sid = hidx - hstart
        send = sheads + slens - 1  # ts-sorted within key → max = last
        return pa.table({
            key_col: t.column(key_col).combine_chunks().take(
                pa.array(sheads)),
            "session_id": pa.array(sid),
            "n_events": pa.array(slens.astype(np.int64)),
            "start_ts": tcol.take(pa.array(sheads)),
            "end_ts": tcol.take(pa.array(send)),
        })

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
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:  # hot key: sorted sub-slice spill, not a stop
            return _stream_rank(_sort_bucket(g, key_col, oc, asc),
                                key_col, bound, out)
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
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:  # hot key: sorted sub-slice spill, not a stop
            return _stream_rank(_sort_bucket(g, key_col, oc), key_col,
                                bound, "_rn_unused", cap_n=n)
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
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:  # hot key: sorted sub-slice spill, not a stop
            return _stream_cumsum(_sort_bucket(g, key_col, oc), key_col,
                                  value_col, bound, out)
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
    rolling accumulator, so there is no numerical drift across rows.
    SQL null semantics: NULL values are skipped from both sum and
    count; a frame with no non-null values yields NULL. Arrow-native
    (r03 verdict item 4): run-geometry numpy, no pandas bucket copy."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "rolling_mean_per_key", None)
        t, new, start = _sorted_runs(g, key_col, oc)
        n = len(t)
        col = t.column(value_col)
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        idx = np.arange(n, dtype=np.int64)
        total = np.zeros(n, np.float64)
        count = np.zeros(n, np.float64)
        for lag in range(window):
            src = idx - lag
            ok = (src >= start) & ~null[np.maximum(src, 0)]
            total += np.where(ok, v[np.maximum(src, 0)], 0.0)
            count += ok
        with np.errstate(invalid="ignore", divide="ignore"):
            m = total / count
        return t.append_column(out, pa.array(m, pa.float64(),
                                             mask=count == 0))

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
    values share a rank and ranks are gap-free. Arrow-native (r03
    verdict item 4): one sort, tie blocks from adjacent equality,
    rank = running tie-block count within the run. Null order values
    form their own tie block (SQL semantics; the old pandas path
    crashed on them)."""

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "dense_rank_per_key", None)
        t, new, start = _sorted_runs(g, key_col, [order_col], [ascending])
        n = len(t)
        if n == 0:
            return t.append_column(out, pa.array([], pa.int64()))
        newv = new.copy()
        newv[1:] |= ~_adjacent_same(t.column(order_col))
        ccs = np.cumsum(newv.astype(np.int64))
        dr = ccs - ccs[start] + 1
        return t.append_column(out, pa.array(dr))

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
        t, new, _ = _sorted_runs(g, key_col, oc)
        pos, size, _, _ = _run_geometry(new)
        base, rem = size // n_tiles, size % n_tiles
        big_span = rem * (base + 1)
        in_big = pos < big_span
        tile = np.where(
            in_big,
            pos // np.maximum(base + 1, 1),
            rem + (pos - big_span) // np.maximum(base, 1),
        )
        return t.append_column(out, pa.array((tile + 1).astype(np.int64)))

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
    One output row per key. Arrow-native (r03 verdict item 4): one
    sort, then a zero-copy ListArray over run offsets joined with
    ``pc.binary_join`` — no pandas str aggregation."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "collect_seq_per_key", None)
        # the reduce side only needs key + order + value columns
        need = list(dict.fromkeys([_B, key_col, value_col] + oc))
        t, new, _ = _sorted_runs(g.select(need), key_col, oc)
        n = len(t)
        _, _, heads, _ = _run_geometry(new)
        svals = pc.cast(t.column(value_col), pa.string()).combine_chunks()
        offsets = pa.array(np.append(heads, n).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, svals)
        joined = pc.binary_join(lists, sep)
        return pa.table({
            key_col: t.column(key_col).combine_chunks().take(
                pa.array(heads)),
            out: joined})

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
        # Arrow-native (r03 item 4): RANK(min ties) = 1 + position of
        # the row's tie-block head within its run, from one sort
        t, new, start = _sorted_runs(g, key_col, [order_col])
        n = len(t)
        if n == 0:
            return t.append_column(out, pa.array([], pa.float64()))
        _, size, _, _ = _run_geometry(new)
        blk = new.copy()
        blk[1:] |= ~_adjacent_same(t.column(order_col))
        idx = np.arange(n, dtype=np.int64)
        blk_start = np.maximum.accumulate(np.where(blk, idx, 0))
        rank = (blk_start - start + 1).astype(np.float64)
        sz = size.astype(np.float64)
        pr = np.where(sz > 1, (rank - 1) / np.maximum(sz - 1, 1), 0.0)
        return t.append_column(out, pa.array(pr, pa.float64()))

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
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:  # hot key: sorted sub-slice spill, not a stop
            return _stream_lag(_sort_bucket(g, key_col, oc), key_col,
                               value_col, bound, out)
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


def pct_change_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "pct_change",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """value / lag(value) - 1 OVER (PARTITION BY key ORDER BY
    order_cols) — relative change vs the previous row (graft-added,
    r04). SQL (DuckDB) semantics: null where there is no previous row,
    either side is null, or the previous value is zero (SQL float
    division by zero is NULL, not inf). Arrow-native; over-bound hot
    keys spill via the shared lag slice kernel."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def _ratio(t: pa.Table, lag_name: str) -> pa.Table:
        cur = pc.cast(t.column(value_col), pa.float64())
        prv = pc.cast(t.column(lag_name), pa.float64())
        prv = pc.if_else(pc.equal(prv, 0.0),
                         pa.scalar(None, pa.float64()), prv)
        r = pc.subtract(pc.divide(cur, prv), 1.0)
        return t.drop_columns([lag_name]).append_column(out, r)

    def finish(g: pa.Table) -> pa.Table:
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:  # hot key: sorted sub-slice spill
            t = _stream_lag(_sort_bucket(g, key_col, oc), key_col,
                            value_col, bound, "__prev")
            return _ratio(t, "__prev")
        t, new, _ = _sorted_runs(g, key_col, oc)
        idx = np.arange(len(t), dtype=np.int64)
        col = t.column(value_col).combine_chunks()
        lagged = col.take(pa.array(np.maximum(idx - 1, 0), mask=new))
        return _ratio(t.append_column("__prev", lagged), "__prev")

    return (
        events.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def ewma_per_key(
    events: "ray.data.Dataset",
    alpha: float,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "ewma",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Exponentially weighted moving average per key (adjust=False
    recursion: y_i = (1-a)*y_{i-1} + a*x_i; y_0 = x_0) — the streaming
    smoother a metrics pipeline runs over event values (graft-added,
    r04; no SQL window equivalent — semantics pinned by a pandas-ewm
    parity fuzz, matching ignore_na=True).

    Vectorized WITHOUT a per-row Python scan via the block-rescaled
    prefix trick: within a block, y_p = s_p*prefix(a*x_j/s_j) + seed /
    carry corrections with s_p = (1-a)^p; blocks are sized so s never
    underflows (B ~ 600/-log10(1-a)), state carried across blocks and
    reset at run heads. Null/NaN values leave the state unchanged and
    emit the carried value (null before a run's first non-null).
    Over-bound hot keys SPILL: the sorted bucket is processed in
    sub-slices carrying (key, state) — O(slice) temporaries, the same
    degrade contract as rank/cumsum/lag (r03 item 3)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    oc = order_cols or ["ts", "event_id"]
    q = 1.0 - alpha
    # biggest block where (1-alpha)^B stays far above float64 underflow
    B = max(8, min(4096, int(-300.0 / np.log10(q))))

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def _ewma_segments(xs: np.ndarray, news: np.ndarray,
                       carry: float, carry_live: bool) -> np.ndarray:
        """EWMA over a 1-d array with segment resets at ``news`` rows
        (adjust=False; y = x at each segment head). ``carry`` seeds the
        first segment's state when ``carry_live`` and news[0] is False.
        Block-rescaled prefix — the loop is over ~n/B blocks."""
        m = len(xs)
        ys = np.empty(m, np.float64)
        for lo in range(0, m, B):
            hi = min(lo + B, m)
            k = hi - lo
            nb_ = news[lo:hi]
            xb = xs[lo:hi]
            idxb = np.arange(k, dtype=np.int64)
            startb = np.maximum.accumulate(np.where(nb_, idxb, 0))
            s = q ** idxb.astype(np.float64)
            w = alpha * xb / s
            cs = np.cumsum(w)
            yb = s * (cs - (cs[startb] - w[startb]))
            # seed correction, vectorized per row: each segment's head
            # contributes x_head (not alpha*x_head) decayed to the row
            corr = (1.0 - alpha) * xb[startb] * s / s[startb]
            if not nb_[0] and carry_live:
                # segment 0 continues from the previous block: decayed
                # carry replaces the in-block seed
                seg0 = startb == 0
                corr[seg0] = 0.0
                yb[seg0] += s[seg0] * q * carry
            yb += corr
            ys[lo:hi] = yb
            if k:
                carry, carry_live = yb[-1], True
        return ys

    def _slice_ewma(sub: pa.Table, carry):
        """One sorted slice; carry = (key, y_state, seen) or None.
        Returns (out_values, out_null_mask, new_carry)."""
        n = len(sub)
        new, start = _runs_of(sub, key_col)
        col = sub.column(value_col)
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        x = pc.fill_null(col, 0.0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        null = null | np.isnan(x)
        ok = ~null
        kcol = sub.column(key_col)
        cont = (carry is not None and n > 0
                and _same_key(kcol[0].as_py(), carry[0]))
        live = bool(cont and carry[2])
        rid = np.cumsum(new) - 1
        xs = x[ok]
        rids = rid[ok]
        news = np.ones(len(xs), dtype=bool)
        if len(xs) > 1:
            news[1:] = rids[1:] != rids[:-1]
        if len(xs) and live and rids[0] == 0:
            news[0] = False
        ys = (_ewma_segments(xs, news, carry[1] if live else 0.0, live)
              if len(xs) else xs)
        y = np.zeros(n, np.float64)
        y[ok] = ys
        idx_all = np.arange(n, dtype=np.int64)
        lastok = np.maximum.accumulate(np.where(ok, idx_all, -1))
        has_state = (lastok >= 0) & (lastok >= start)
        fill = np.where(has_state, y[np.maximum(lastok, 0)], np.nan)
        if live:
            # null rows of the continuing run before its first in-slice
            # non-null emit the carried state
            pre = (start == 0) & ~has_state
            fill = np.where(pre, carry[1], fill)
            has_state = has_state | pre
        yout = np.where(ok, y, fill)
        null_out = ~(ok | has_state)
        if n == 0:
            return yout, null_out, carry
        lk = kcol[n - 1].as_py()
        if lastok[-1] >= start[-1]:  # trailing run has in-slice state
            ncarry = (lk, float(y[lastok[-1]]), True)
        elif live and start[-1] == 0:  # one long stateful run of nulls
            ncarry = (lk, carry[1], True)
        else:
            ncarry = (lk, 0.0, False)
        return yout, null_out, ncarry

    def finish(g: pa.Table) -> pa.Table:
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        t = _sort_bucket(g, key_col, oc)
        n = len(t)
        if n <= bound:
            yout, null_out, _ = _slice_ewma(t, None)
            return t.append_column(out, pa.array(yout, pa.float64(),
                                                 mask=null_out))
        parts = []  # hot key: sorted sub-slice spill, not a stop
        carry = None
        for lo in range(0, n, bound):
            sub = t.slice(lo, bound)
            yout, null_out, carry = _slice_ewma(sub, carry)
            parts.append(sub.append_column(
                out, pa.array(yout, pa.float64(), mask=null_out)))
        return pa.concat_tables(parts)

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
        # Arrow-native (r03 item 4): RANK(max ties) = end of the row's
        # tie block relative to its run head, from one sort
        t, new, start = _sorted_runs(g, key_col, [order_col])
        n = len(t)
        if n == 0:
            return t.append_column(out, pa.array([], pa.float64()))
        _, size, _, _ = _run_geometry(new)
        blk = new.copy()
        blk[1:] |= ~_adjacent_same(t.column(order_col))
        bheads = np.flatnonzero(blk)
        blens = np.diff(np.append(bheads, n))
        blk_end = np.repeat(bheads + blens, blens)  # exclusive end
        rank_max = (blk_end - start).astype(np.float64)
        return t.append_column(
            out, pa.array(rank_max / size.astype(np.float64),
                          pa.float64()))

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
    order. Arrow-native (r03 item 4): one sort + one take at the run
    heads — works for any Arrow type, no pandas object round-trip.

    Note the SQL nuance difference from pandas transform('first'):
    this is the ORDER-first value (run head), which may be NULL —
    matching SQL first_value(), not pandas' first-non-null."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "first_value_per_key", None)
        t, new, start = _sorted_runs(g, key_col, oc)
        col = t.column(value_col).combine_chunks()
        return t.append_column(out, col.take(pa.array(start)))

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
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:
            # hot key: lead == lag over the REVERSED order — one
            # descending sort, then the same carried-state slice kernel
            rev = _sort_bucket(g, key_col, oc,
                               [False] * len(oc))
            return _stream_lag(rev, key_col, value_col, bound, out)
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
        # Arrow-native (r03 item 4): run end = head + size - 1, one take
        t, new, _ = _sorted_runs(g, key_col, oc)
        _, size, heads, lens = _run_geometry(new)
        end_idx = np.repeat(heads + lens - 1, lens)
        col = t.column(value_col).combine_chunks()
        return t.append_column(out, col.take(pa.array(end_idx)))

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
        # Arrow-native (r03 item 4): nth index = run head + (n-1),
        # null-masked where the run is shorter than n
        t, new, start = _sorted_runs(g, key_col, oc)
        _, size, _, _ = _run_geometry(new)
        src = start + (n - 1)
        short = size < n
        col = t.column(value_col).combine_chunks()
        nth = col.take(pa.array(np.where(short, 0, src), mask=short))
        return t.append_column(out, nth)

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
        # Arrow-native (r03 item 4): one Arrow sort; run mask comes
        # from _runs_of (null-key aware — the old keys[1:]!=keys[:-1]
        # comparison split a NULL-key group into per-row segments)
        t, new_seg, _ = _sorted_runs(g, key_col, [ts_col])
        ts = t.column(ts_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        vals = (np.round(v * 100).astype(np.int64) if cents
                else v.astype(np.float64))
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
        return t.append_column(
            out, pa.array(s / 100.0 if cents else s, pa.float64()))

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
        # Arrow-native (r03 item 4): per-lag masked extreme over the
        # sorted runs (window is a small constant; the loop is over
        # lags, not rows). Nulls/NaNs are skipped like pandas
        # rolling(min_periods=1); all-missing frames yield null.
        t, new, start = _sorted_runs(g, key_col, oc)
        n = len(t)
        col = t.column(value_col)
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        null = null | np.isnan(v)
        sent = -np.inf if mode == "max" else np.inf
        idx = np.arange(n, dtype=np.int64)
        best = np.full(n, sent, np.float64)
        any_ok = np.zeros(n, dtype=bool)
        for lag in range(window):
            src = np.maximum(idx - lag, 0)
            ok = (idx - lag >= start) & ~null[src]
            cand = np.where(ok, v[src], sent)
            best = (np.maximum(best, cand) if mode == "max"
                    else np.minimum(best, cand))
            any_ok |= ok
        return t.append_column(out, pa.array(best, pa.float64(),
                                             mask=~any_ok))

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
        # Arrow-native (r03 item 4): sort the partition in Arrow and
        # append the offset rank — no pandas copy of payload columns
        p = int(g.column("_part")[0].as_py())
        t = g.drop_columns(["_part"]).sort_by(
            [(c, "ascending" if a else "descending")
             for c, a in zip(order_cols, asc)])
        rn = offsets[p] + np.arange(1, len(t) + 1, dtype=np.int64)
        return t.append_column(out, pa.array(rn))

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
        # Arrow-native (r03 item 4): one sort, then per-step masked
        # minimum.reduceat over run segments — the loop is over funnel
        # steps, never rows or users
        need = list(dict.fromkeys([_B, key_col, ts_col, type_col]))
        t, new, _ = _sorted_runs(g.select(need), key_col, [ts_col])
        n = len(t)
        ktype = g.schema.field(key_col).type
        if n == 0:
            return pa.table({key_col: pa.array([], ktype),
                             out: pa.array([], pa.int64())})
        _, _, heads, lens = _run_geometry(new)
        ts = t.column(ts_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        typ = t.column(type_col)
        INF = np.int64(2**62)
        done = np.zeros(len(heads), np.int64)
        prev = np.full(len(heads), -INF, np.int64)
        for i, step in enumerate(sset):
            m = pc.fill_null(pc.equal(typ, step), False).to_numpy(
                zero_copy_only=False)
            val = np.where(m & (ts > np.repeat(prev, lens)), ts, INF)
            t_i = np.minimum.reduceat(val, heads)
            reached = (done == i) & (t_i < INF)
            done = np.where(reached, done + 1, done)
            # a user who stalled before step i gets the +inf sentinel
            prev = np.where(reached, t_i, INF)
        return pa.table({
            key_col: t.column(key_col).combine_chunks().take(
                pa.array(heads)),
            out: pa.array(done, pa.int64())})

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
        # Arrow-native (r03 item 4): per-offset masked sum/count over
        # the sorted runs; nulls/NaNs skipped (pandas min_periods=1
        # parity), all-missing frames yield null
        t, new, start = _sorted_runs(g, key_col, oc)
        n = len(t)
        col = t.column(value_col)
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.float64)
        null = null | np.isnan(v)
        _, size, _, _ = _run_geometry(new)
        end = start + size  # exclusive run end per row
        idx = np.arange(n, dtype=np.int64)
        total = np.zeros(n, np.float64)
        count = np.zeros(n, np.float64)
        for off in range(-half, half + 1):
            src = idx + off
            inb = (src >= start) & (src < end)
            srcc = np.clip(src, 0, max(n - 1, 0))
            ok = inb & ~null[srcc]
            total += np.where(ok, v[srcc], 0.0)
            count += ok
        with np.errstate(invalid="ignore", divide="ignore"):
            m = total / count
        r = np.sign(m) * np.floor(
            np.abs(m) * 10.0**decimals + 0.5) / 10.0**decimals
        return t.append_column(out, pa.array(r, pa.float64(),
                                             mask=count == 0))

    return (events.map_batches(local, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def fact_intervals(
    obs: "ray.data.Dataset",
    s_col: str = "subj",
    p_col: str = "pred",
    o_col: str = "obj",
    ts_col: str = "ts",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Temporal fact compaction (SQL islands-and-gaps) — the KG fact
    VERSIONING pass over recrawl observations: consecutive
    observations of the same ``(subj, pred)`` with the same ``obj``
    merge into one validity interval →
    ``(subj, pred, obj, valid_from, valid_to, n_obs)`` where
    ``valid_to`` is the next island's start (exclusive) or null for
    the currently-valid fact. Observation order is the total
    ``(ts, obj)`` sort, so ts ties break deterministically; obj
    comparison is null-safe (IS DISTINCT FROM semantics — null is a
    value a recrawl can observe).

    Shape: one bucket shuffle on ``(subj, pred)`` co-locates each
    fact's history; per bucket the islands build vectorized from
    boundary flags + cumsum run offsets (no per-fact Python)."""
    from .canonicalize import _B, _add_bucket

    def bucketize(t: pa.Table) -> pa.Table:
        return _add_bucket(
            t.select([s_col, p_col, o_col, ts_col]), [s_col, p_col], nb)

    def compact(g: pa.Table) -> pa.Table:
        t = g.drop_columns([_B]).sort_by(
            [(s_col, "ascending"), (p_col, "ascending"),
             (ts_col, "ascending"), (o_col, "ascending")])
        n = t.num_rows
        ts_type = t.schema.field(ts_col).type
        if n == 0:
            return pa.table({
                s_col: pa.array([], pa.string()),
                p_col: pa.array([], pa.string()),
                o_col: pa.array([], pa.string()),
                "valid_from": pa.array([], ts_type),
                "valid_to": pa.array([], ts_type),
                "n_obs": pa.array([], pa.int64())})
        import pandas as pd

        s = t.column(s_col).to_pandas().to_numpy()
        p = t.column(p_col).to_pandas().to_numpy()
        o = t.column(o_col).to_pandas()  # keep pandas for null-safe ne
        key_chg = np.ones(n, dtype=bool)
        key_chg[1:] = (s[1:] != s[:-1]) | (p[1:] != p[:-1])
        prev_o = o.shift(1)
        obj_chg = (o.ne(prev_o) & ~(o.isna() & prev_o.isna())).to_numpy()
        boundary = key_chg | obj_chg
        starts = np.nonzero(boundary)[0]
        counts = np.diff(np.append(starts, n))
        ts_arr = t.column(ts_col).combine_chunks()
        vfrom = ts_arr.take(pa.array(starts))
        # valid_to: next island's start within the SAME (s, p) run
        nxt = np.empty(len(starts), dtype=np.int64)
        nxt[:-1] = starts[1:]
        nxt[-1] = -1
        same_key = np.zeros(len(starts), dtype=bool)
        if len(starts) > 1:
            same_key[:-1] = ~key_chg[starts[1:]]
        vto_idx = np.where(same_key, nxt, 0)
        vto = ts_arr.take(pa.array(vto_idx))
        vto = pa.compute.if_else(pa.array(same_key), vto,
                                 pa.scalar(None, ts_type))
        return pa.table({
            s_col: t.column(s_col).take(pa.array(starts)),
            p_col: t.column(p_col).take(pa.array(starts)),
            o_col: t.column(o_col).take(pa.array(starts)),
            "valid_from": vfrom,
            "valid_to": vto,
            "n_obs": pa.array(counts.astype(np.int64))})

    return (obs.map_batches(bucketize, batch_format="pyarrow",
                            batch_size=65536)
            .groupby(_B).map_groups(compact, batch_format="pyarrow"))


def _ffill_sorted(col: "pa.Array", new: np.ndarray):
    """Forward-fill kernel over one sorted span: per row, the last
    non-null value at-or-before it WITHIN its run (null until the
    run's first non-null). Returns (filled_array, ok_mask, cand)."""
    m = len(col)
    idx = np.arange(m, dtype=np.int64)
    rs = np.maximum.accumulate(np.where(new, idx, 0))
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    cand = np.maximum.accumulate(np.where(valid, idx, -1))
    ok = cand >= rs
    filled = col.take(pa.array(np.where(ok, cand, 0), mask=~ok))
    return filled, ok, cand


def _stream_ffill(t: pa.Table, key_col: str, value_col: str,
                  bound: int, out: str) -> pa.Table:
    """Forward fill over an already-sorted table in slices: the only
    carried state is ONE value (the tail key's last non-null) — a
    virtual carry row is prepended to each slice and sliced back off."""
    parts = []
    kcol = t.column(key_col)
    ck, carry = _NOKEY, None
    for lo in range(0, len(t), bound):
        sub = t.slice(lo, bound)
        m = len(sub)
        new, _ = _runs_of(sub, key_col)
        col = sub.column(value_col).combine_chunks()
        cont = ck is not _NOKEY and _same_key(kcol[lo].as_py(), ck)
        prep = (carry if cont and carry is not None
                else pa.array([None], col.type))
        col2 = pa.concat_arrays([prep.cast(col.type), col])
        new2 = np.concatenate([[True], new])
        if cont:
            new2[1] = False
        filled2, ok2, cand2 = _ffill_sorted(col2, new2)
        parts.append(sub.append_column(out, filled2.slice(1)))
        ck = kcol[lo + m - 1].as_py()
        carry = col2.slice(cand2[-1], 1) if ok2[-1] else None
    return pa.concat_tables(parts) if parts else t


def ffill_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    out: str = "filled",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Forward fill — ``last_value(x IGNORE NULLS) OVER (PARTITION BY
    key ORDER BY order ROWS UNBOUNDED PRECEDING)``: the gap-filling
    step for sensor/telemetry/price streams (graft-added, r04 seventh
    sitting). Null until a key's first non-null. Arrow-native
    (run-relative maximum.accumulate of non-null indices + one take);
    over-bound hot keys DEGRADE to the sorted-slice spill carrying a
    single value."""
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:
            return _stream_ffill(_sort_bucket(g, key_col, oc),
                                 key_col, value_col, bound, out)
        t, new, _ = _sorted_runs(g, key_col, oc)
        filled, _ok, _c = _ffill_sorted(
            t.column(value_col).combine_chunks(), new)
        return t.append_column(out, filled)

    return (
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def topk_per_key(
    events: "ray.data.Dataset",
    key_col: str,
    order_cols: "list[str]",
    k: int,
    ascending: "list[bool] | None" = None,
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Generic top-k rows per key by a total order — the k>1 sibling
    of ``canonicalize.groupby_argmax`` (grab each user's 3 latest
    events, each host's 5 biggest pages): rows whose ROW_NUMBER over
    (PARTITION BY key ORDER BY order_cols, key) is ≤ k. The order is
    made total by appending the key columns, so output is
    deterministic under any block arrival order.

    Arrow-native: one key-bucket shuffle + the shared `_sorted_runs`
    / `_run_geometry` position kernel + a boolean take — no pandas,
    no per-row Python. Over-bound hot buckets DEGRADE via the sorted
    sub-slice spill (position within a run is streamable with one
    carried counter)."""
    if k < 1:
        raise ValueError("topk_per_key: k must be >= 1")

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:
            t = _sort_bucket(g, key_col, order_cols, ascending)
            parts = []
            kcol = t.column(key_col)
            ck, cpos = _NOKEY, 0
            for lo in range(0, len(t), bound):
                sub = t.slice(lo, bound)
                new, _ = _runs_of(sub, key_col)
                pos, _sz, _h, _l = _run_geometry(new)
                if ck is not _NOKEY and _same_key(kcol[lo].as_py(),
                                                 ck):
                    first_len = int(np.argmax(new[1:]) + 1
                                    if new[1:].any() else len(sub))
                    pos = pos.copy()
                    pos[:first_len] += cpos
                m = len(sub)
                keep = pos < k
                parts.append(sub.filter(pa.array(keep)))
                if m:
                    ck = kcol[lo + m - 1].as_py()
                    cpos = int(pos[m - 1]) + 1
            return pa.concat_tables(parts) if parts else g.slice(0, 0)
        t, new, _ = _sorted_runs(g, key_col, order_cols, ascending)
        pos, _size, _heads, _lens = _run_geometry(new)
        return t.filter(pa.array(pos < k))

    return (
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def time_weighted_avg(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Time-weighted average per key (the TWAP/telemetry aggregate —
    each observation holds until the next one, so irregular sampling
    does not bias the mean): with a key's non-null observations
    sorted by (ts, tiebreak), twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_n−t_1) —
    piecewise-constant (last-observation-carried-forward)
    interpolation; the final observation spans nothing. Keys with one
    observation or a zero total span emit null twa (no interval to
    average over). Rows with a null ts or value are dropped first
    (they carry no span information).

    Output: ``(key, n_obs, span_seconds, twa)``, one row per key.
    Scale shape: map-side null filtering, ONE bucket shuffle, and an
    Arrow/numpy finisher (run geometry + ``add.reduceat`` — no pandas
    copy, no per-row Python).
    """

    def local(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch.column(ts_col)),
                       pc.is_valid(batch.column(value_col)))
        return _add_bucket(batch.filter(keep), [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "time_weighted_avg", max_bucket_rows)
        t, new, _ = _sorted_runs(
            g.select([_B, key_col, ts_col, value_col,
                      order_tiebreak]),
            key_col, [ts_col, order_tiebreak])
        n = len(t)
        key_arr = t.column(key_col).combine_chunks()
        if n == 0:
            return pa.table({
                key_col: key_arr,
                "n_obs": pa.array([], pa.int64()),
                "span_seconds": pa.array([], pa.float64()),
                "twa": pa.array([], pa.float64())})
        ts = (t.column(ts_col).combine_chunks()
              .to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        v = (t.column(value_col).combine_chunks()
             .to_numpy(zero_copy_only=False).astype(np.float64))
        _, _, heads, lens = _run_geometry(new)
        # per-interval contribution v_i * (t_{i+1} - t_i), zeroed at
        # run boundaries; pad to length n so reduceat segments align
        contrib = np.zeros(n, dtype=np.float64)
        if n > 1:
            same = ~new[1:]
            contrib[:-1] = np.where(same, v[:-1] * (ts[1:] - ts[:-1]),
                                    0.0)
        num = np.add.reduceat(contrib, heads)
        span_us = (ts[heads + lens - 1] - ts[heads]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            twa = num / span_us
        # null ONLY for zero-span keys (nothing to average over); a
        # NaN arising from NaN VALUES stays NaN, matching the SQL twin
        # (r04 review — the old blanket NaN→null masked corrupt data)
        twa_arr = pc.if_else(
            pa.array(span_us > 0),
            pa.array(np.where(span_us > 0, twa, 0.0), pa.float64()),
            pa.nulls(len(heads), pa.float64()))
        return pa.table({
            key_col: key_arr.take(pa.array(heads)),
            "n_obs": pa.array(lens.astype(np.int64)),
            "span_seconds": pa.array(span_us / 1e6, pa.float64()),
            "twa": twa_arr})

    return (events.map_batches(local, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


class ResampleGridOverflow(RuntimeError):
    """A key's resample grid (max_bucket − min_bucket + 1) exceeded
    ``max_buckets_per_key`` — emitting it would materialize an
    unbounded dense grid for one key (e.g. one stray 1970 timestamp
    against 2024 data). Fix the data or raise the bound."""


def resample_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    every: "pd.Timedelta" = None,
    agg: str = "mean",
    fill: str = "null",
    max_buckets_per_key: int = 1_000_000,
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Fixed-interval time resampling per key (pandas ``resample`` /
    SQL time_bucket): assign every observation to an epoch-anchored
    ``every`` bucket, aggregate per (key, bucket), and emit the DENSE
    grid from each key's first to last bucket — EMPTY buckets
    included, so downstream models see gaps instead of silently
    skipping them. ``agg`` ∈ mean|sum|count (SQL null semantics:
    null values don't count); ``fill`` ∈ null|zero|ffill for what an
    empty bucket carries (ffill = last non-empty bucket's aggregate,
    null before the first). Null-ts rows drop map-side.

    The epoch-anchored bucket (``floor(epoch_us / every_us)``) makes
    the grid data-independent and SQL-replayable. A per-key grid
    wider than ``max_buckets_per_key`` raises the typed
    :class:`ResampleGridOverflow` instead of materializing it.

    Output: ``(key, bucket_ts, <agg>_value, n_rows)``. Scale shape:
    map-side (key, bucket) partial aggregation (Arrow group_by), ONE
    bucket shuffle, numpy grid expansion in the finisher.
    """
    if every is None:
        every = pd.Timedelta(hours=1)
    if agg not in ("mean", "sum", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    if fill not in ("null", "zero", "ffill"):
        raise ValueError(f"unsupported fill {fill!r}")
    every_us = np.int64(every // pd.Timedelta(microseconds=1))
    if every_us <= 0:
        raise ValueError("every must be a positive interval")
    out_val = f"{agg}_value"

    def local(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column(ts_col)))
        ts = (t.column(ts_col).combine_chunks()
              .to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        b = ts // every_us
        v = t.column(value_col).cast(pa.float64())
        part = pa.table({key_col: t.column(key_col),
                         "__rb": pa.array(b),
                         "__v": v})
        g = part.group_by([key_col, "__rb"]).aggregate(
            [("__v", "sum"), ("__v", "count"), ("__rb", "count")])
        out = pa.table({
            key_col: g.column(key_col),
            "__rb": g.column("__rb"),
            "__s": pc.fill_null(g.column("__v_sum"), 0.0),
            "__c": g.column("__v_count").cast(pa.int64()),
            "__n": g.column("__rb_count").cast(pa.int64())})
        return _add_bucket(out, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "resample_per_key", max_bucket_rows)
        # merge map-side partials, then sort into per-key runs
        m = g.drop_columns([_B]).group_by([key_col, "__rb"]).aggregate(
            [("__s", "sum"), ("__c", "sum"), ("__n", "sum")])
        m = m.sort_by([(key_col, "ascending"), ("__rb", "ascending")])
        key_arr = m.column(key_col).combine_chunks()
        n = len(m)
        ts_type = pa.timestamp("us")
        if n == 0:
            return pa.table({
                key_col: key_arr,
                "bucket_ts": pa.array([], ts_type),
                out_val: pa.array([], pa.float64() if agg != "count"
                                  else pa.int64()),
                "n_rows": pa.array([], pa.int64())})
        new, _ = _runs_of(m, key_col)
        _, _, heads, lens = _run_geometry(new)
        rb = m.column("__rb").to_numpy(zero_copy_only=False)
        s = m.column("__s_sum").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c = m.column("__c_sum").to_numpy(zero_copy_only=False).astype(
            np.int64)
        nr = m.column("__n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64)
        minb = rb[heads]
        maxb = rb[heads + lens - 1]
        glens = (maxb - minb + 1).astype(np.int64)
        worst = int(glens.max())
        if worst > max_buckets_per_key:
            k = key_arr[int(heads[int(np.argmax(glens))])].as_py()
            raise ResampleGridOverflow(
                f"key {k!r} spans {worst} buckets "
                f"(> {max_buckets_per_key})")
        total = int(glens.sum())
        gstart = np.zeros(len(heads) + 1, dtype=np.int64)
        np.cumsum(glens, out=gstart[1:])
        gpos = np.arange(total, dtype=np.int64)
        run_of_pos = np.repeat(np.arange(len(heads)), glens)
        out_b = gpos - gstart[run_of_pos] + minb[run_of_pos]
        # scatter observed rows into the grid
        row_pos = (gstart[np.cumsum(new) - 1] + (rb - minb[
            np.cumsum(new) - 1]))
        gs = np.zeros(total, dtype=np.float64)
        gc = np.zeros(total, dtype=np.int64)
        gn = np.zeros(total, dtype=np.int64)
        gs[row_pos] = s
        gc[row_pos] = c
        gn[row_pos] = nr
        present = np.zeros(total, dtype=bool)
        present[row_pos] = True
        if agg == "count":
            # count is ALWAYS defined: an empty bucket counts 0 —
            # fill modes don't apply
            val = gc.astype(np.float64)
            have = np.ones(total, dtype=bool)
        elif agg == "sum":
            val = gs
            have = present & (gc > 0)
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                val = gs / gc
            have = present & (gc > 0)
        if fill == "zero":
            val = np.where(have, val, 0.0)
            have = np.ones(total, dtype=bool)
        elif fill == "ffill":
            src = np.where(have, gpos, -1)
            acc = np.maximum.accumulate(src)
            run_first = gstart[run_of_pos]
            ok = acc >= run_first        # don't carry across keys
            val = np.where(ok, val[np.maximum(acc, 0)], np.nan)
            have = ok & ~np.isnan(val)
        if agg == "count" and fill != "ffill":
            out_v = pa.array(val.astype(np.int64), pa.int64())
            if fill == "null":
                out_v = pc.if_else(pa.array(have), out_v,
                                   pa.nulls(total, pa.int64()))
        elif agg == "count":
            out_v = pc.if_else(
                pa.array(have),
                pa.array(np.where(have, val, 0).astype(np.int64)),
                pa.nulls(total, pa.int64()))
        else:
            out_v = pc.if_else(pa.array(have),
                               pa.array(np.where(have, val, 0.0),
                                        pa.float64()),
                               pa.nulls(total, pa.float64()))
        out_keys = key_arr.take(pa.array(np.repeat(heads, glens)))
        return pa.table({
            key_col: out_keys,
            "bucket_ts": pa.array(out_b * every_us).cast(ts_type),
            out_val: out_v,
            "n_rows": pa.array(gn)})

    return (events.map_batches(local, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def burst_islands(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    every: "pd.Timedelta" = None,
    mult: float = 2.0,
    min_count: int = 1,
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Burst detection per key via rate islands (the thresholded
    special case of Kleinberg 2002 burst detection, s = ``mult``,
    zero switching cost): bucket each key's events into epoch-anchored
    ``every`` intervals, flag buckets whose count reaches
    ``max(min_count, mult * total / span)`` — ``span`` being the
    key's first-to-last bucket range, so the base rate is the key's
    own average INCLUDING its silent buckets — and merge runs of
    CONSECUTIVE flagged buckets into islands (the classic
    gaps-and-islands grouping). The crawl/telemetry use: bot spikes,
    flash-crowd pages, scraper bursts — per key, against that key's
    own baseline, with one number per episode instead of one per
    bucket.

    Null-ts rows drop map-side. The threshold is evaluated as
    ``(mult * total) / span`` in float64, left to right, so a SQL
    twin replays it bit-exactly.

    Output ``(key, start_ts, end_ts, n_buckets, n_events)`` — one row
    per island. Scale shape: map-side (key, bucket) partial counts
    (Arrow group_by), ONE key-bucket shuffle, vectorized sorted-run
    island kernel in the finisher.
    """
    if every is None:
        every = pd.Timedelta(hours=1)
    if mult <= 0:
        raise ValueError("mult must be positive")
    every_us = np.int64(every // pd.Timedelta(microseconds=1))
    if every_us <= 0:
        raise ValueError("every must be a positive interval")

    def local(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column(ts_col)))
        ts = (t.column(ts_col).combine_chunks()
              .to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        part = pa.table({key_col: t.column(key_col),
                         "__rb": pa.array(ts // every_us)})
        g = part.group_by([key_col, "__rb"]).aggregate(
            [("__rb", "count")])
        out = pa.table({key_col: g.column(key_col),
                        "__rb": g.column("__rb"),
                        "__n": g.column("__rb_count").cast(pa.int64())})
        return _add_bucket(out, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "burst_islands", max_bucket_rows)
        m = g.drop_columns([_B]).group_by([key_col, "__rb"]).aggregate(
            [("__n", "sum")])
        m = m.sort_by([(key_col, "ascending"), ("__rb", "ascending")])
        key_arr = m.column(key_col).combine_chunks()
        ts_type = pa.timestamp("us")
        if len(m) == 0:
            return pa.table({
                key_col: key_arr,
                "start_ts": pa.array([], ts_type),
                "end_ts": pa.array([], ts_type),
                "n_buckets": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        new, _ = _runs_of(m, key_col)
        _, _, heads, lens = _run_geometry(new)
        rb = m.column("__rb").to_numpy(zero_copy_only=False)
        n = m.column("__n_sum").to_numpy(zero_copy_only=False).astype(
            np.int64)
        run_id = np.cumsum(new) - 1
        total = np.add.reduceat(n, heads)
        span = (rb[heads + lens - 1] - rb[heads] + 1).astype(
            np.float64)
        thr = np.maximum(float(min_count),
                         (mult * total.astype(np.float64)) / span)
        is_burst = n >= thr[run_id]
        if not is_burst.any():
            return pa.table({
                key_col: key_arr.take(pa.array([], pa.int64())),
                "start_ts": pa.array([], ts_type),
                "end_ts": pa.array([], ts_type),
                "n_buckets": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64())})
        bi = np.flatnonzero(is_burst)
        brb, bn, brun = rb[bi], n[bi], run_id[bi]
        # island head: first burst bucket of a run, or a gap > 1
        head = np.ones(len(bi), dtype=bool)
        head[1:] = (brun[1:] != brun[:-1]) | (brb[1:] != brb[:-1] + 1)
        ih = np.flatnonzero(head)
        ilen = np.diff(np.append(ih, len(bi)))
        istart = brb[ih]
        iend = brb[ih + ilen - 1]
        ievents = np.add.reduceat(bn, ih)
        return pa.table({
            key_col: key_arr.take(pa.array(heads[brun[ih]])),
            "start_ts": pa.array(istart * every_us).cast(ts_type),
            "end_ts": pa.array(iend * every_us).cast(ts_type),
            "n_buckets": pa.array(ilen.astype(np.int64)),
            "n_events": pa.array(ievents.astype(np.int64))})

    return (events.map_batches(local, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def decayed_sum_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life: "pd.Timedelta" = None,
    at: "pd.Timestamp | str" = None,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Exponentially time-decayed sum per key evaluated at a fixed
    reference instant ``at``: ``sum(value * 0.5 ** ((at - ts) /
    half_life))`` — the recency-weighted engagement/score aggregate
    (freshness-weighted host authority, decayed click counts) that,
    unlike :func:`ewma_per_key`, is an ALGEBRAIC aggregate: partials
    from any partitioning merge by addition, so it map-side-combines
    like a plain sum and re-evaluating tomorrow is one multiply, not
    a re-scan.

    Rows after ``at`` are excluded (the aggregate is "as of" that
    instant); null ts/value rows drop. The weight is evaluated as
    ``0.5 ** ((at_us - ts_us) / hl_us)`` in float64 so a SQL twin
    replays it. Returns ``(key, decayed_sum, n_rows)``.
    """
    from .canonicalize import sums_by_key

    if half_life is None:
        half_life = pd.Timedelta(days=7)
    hl_us = float(half_life // pd.Timedelta(microseconds=1))
    if hl_us <= 0:
        raise ValueError("half_life must be positive")
    if at is None:
        raise ValueError("pass the reference instant `at` explicitly")
    at_us = int(pd.Timestamp(at).value // 1000)

    def local(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_kleene(
            pc.is_valid(batch.column(ts_col)),
            pc.is_valid(batch.column(value_col))))
        ts = (t.column(ts_col).combine_chunks()
              .to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        keep = ts <= at_us
        t = t.filter(pa.array(keep))
        ts = ts[keep]
        v = (t.column(value_col).cast(pa.float64())
             .to_numpy(zero_copy_only=False))
        w = np.power(0.5, (at_us - ts) / hl_us)
        return pa.table({
            key_col: t.column(key_col),
            "decayed_sum": pa.array(v * w),
            "n_rows": pa.array(np.ones(len(ts), np.int64))})

    return sums_by_key(
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536),
        key_col, ["decayed_sum", "n_rows"], nb=nb)


def attribution(
    events: "ray.data.Dataset",
    conversion_type: str,
    channel_types: "list[str]",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Last-touch attribution: for every CONVERSION event, credit the
    user's most recent STRICTLY-EARLIER channel event (the classic
    marketing/referral attribution query; also the provenance
    question "which crawl seed led to this captured page"). A
    conversion with no earlier channel touch attributes to null
    (organic). Ties on the channel side break deterministically by
    the largest ``(ts, id)``.

    Composition of existing primitives: two vectorized filters + ONE
    backward AS-OF join (``how="left"``), channel-side pre-dedup to
    one row per (key, ts) per the as-of determinism contract.

    Returns ``(id_col, key_col, ts, channel, touch_ts)`` — one row
    per conversion.
    """
    from .canonicalize import groupby_argmax
    from .join import asof_join

    chans = pa.array(list(channel_types))

    def only(pred):
        return lambda t: t.filter(pred(t))

    conv = events.map_batches(
        only(lambda t: pc.and_kleene(
            pc.equal(t.column(type_col), pa.scalar(conversion_type)),
            pc.is_valid(t.column(ts_col)))),
        batch_format="pyarrow").map_batches(
        lambda t: t.select([id_col, key_col, ts_col]),
        batch_format="pyarrow")
    touch = events.map_batches(
        only(lambda t: pc.and_kleene(
            pc.is_in(t.column(type_col), value_set=chans),
            pc.is_valid(t.column(ts_col)))),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            key_col: t.column(key_col),
            # strictly-earlier contract: shift channel ts by +1us is
            # WRONG (changes the ts); instead dedup to one row per
            # (key, ts) and let merge_asof's allow_exact_matches
            # semantics stay <= — we subtract nothing and instead
            # drop exact-ts self-matches below via ts inequality on
            # the conversion side
            "touch_ts": t.column(ts_col),
            "channel": t.column(type_col),
            "touch_id": t.column(id_col)}),
        batch_format="pyarrow")
    # one channel row per (key, ts): largest id wins
    touch = groupby_argmax(touch, [key_col, "touch_ts"],
                           ["touch_id"], [False], nb=nb)
    # strict earlier: as-of compares <=; shift the conversion ts by
    # -1us for the join, then report the original ts
    conv_shift = conv.map_batches(
        lambda t: pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            "__ts_orig": t.column(ts_col),
            ts_col: pc.add(t.column(ts_col).cast(pa.int64()),
                           pa.scalar(-1, pa.int64())).cast(
                t.column(ts_col).type)}),
        batch_format="pyarrow")
    j = asof_join(conv_shift, touch, key=key_col, ts=ts_col,
                  right_ts="touch_ts", nb=nb, how="left",
                  direction="backward")
    return j.map_batches(
        lambda t: pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            "ts": t.column("__ts_orig"),
            "channel": t.column("channel"),
            "touch_ts": t.column("touch_ts")}),
        batch_format="pyarrow")


def running_nunique_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "event_type",
    order_cols: list[str] | None = None,
    out: str = "n_distinct",
    nb: int = 16,
    max_bucket_rows: int | None = None,
) -> "ray.data.Dataset":
    """Running COUNT(DISTINCT value) OVER (PARTITION BY key ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING) — "how many distinct event
    types has this user produced so far", the engagement-breadth /
    novelty signal. SQL DISTINCT-aggregate semantics: NULL values
    never increment the count.

    STREAMABLE since round 5 (r04 verdict "What's missing" #3): the
    per-key seen-set carry is eliminated by a GLOBAL first-occurrence
    pre-pass — one (key, value)-bucketed argmin-by-order shuffle
    (``groupby_argmax``, map-side combined) emits ONE +1 increment
    event at each distinct value's first order position; the window
    shuffle then unions increments (sorted just BEFORE their row via
    a kind tiebreak) with the data rows and the finisher is a plain
    per-key cumsum of the increment column — O(1) carry, so an
    over-bound bucket degrades through the ``_stream_cumsum`` sorted
    sub-slice spill instead of raising. NULL values emit no
    increment (SQL DISTINCT-aggregate semantics). With a total
    ``order_cols`` (the oracle's case) output is identical to the
    seen-set formulation; on order ties the increment applies at the
    tie group's first row (RANGE-style)."""
    from .canonicalize import groupby_argmax
    from .join import _arrow_schema

    oc = order_cols or ["ts", "event_id"]
    sch = _arrow_schema(events)

    def _countable(t: pa.Table) -> pa.Table:
        # SQL DISTINCT-aggregate semantics, matching the old seen-set
        # finisher exactly: NULL never counts, and a float NaN value
        # doesn't either (the pandas notna() the seen-set used
        # conflates the two)
        ok = pc.is_valid(t.column(value_col))
        if pa.types.is_floating(t.schema.field(value_col).type):
            ok = pc.and_(ok, pc.invert(pc.fill_null(
                pc.is_nan(t.column(value_col)), True)))
        return t.filter(ok).select([key_col, value_col] + oc)

    firsts = groupby_argmax(
        events.map_batches(_countable, batch_format="pyarrow"),
        [key_col, value_col], oc, [True] * len(oc), nb=nb)

    def inc_prep(t: pa.Table) -> pa.Table:
        # fabricate null payload so the union schema matches the data
        # rows exactly (groupby_argmax's pandas roundtrip may have
        # drifted oc dtypes — cast back to the row schema)
        cols = []
        for f in sch:
            if f.name in (key_col, *oc):
                cols.append(t.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(len(t), f.type))
        out_t = pa.table(cols, schema=sch)
        out_t = out_t.append_column(
            "__inc", pa.array(np.ones(len(t), np.int64)))
        out_t = out_t.append_column(
            "__kind", pa.array(np.zeros(len(t), np.int8)))
        return _add_bucket(out_t, [key_col], nb)

    def row_prep(t: pa.Table) -> pa.Table:
        out_t = pa.table([t.column(f.name).cast(f.type) for f in sch],
                         schema=sch)
        out_t = out_t.append_column(
            "__inc", pa.array(np.zeros(len(t), np.int64)))
        out_t = out_t.append_column(
            "__kind", pa.array(np.ones(len(t), np.int8)))
        return _add_bucket(out_t, [key_col], nb)

    tagged = (events.map_batches(row_prep, batch_format="pyarrow",
                                 batch_size=65536)
              .union(firsts.map_batches(inc_prep,
                                        batch_format="pyarrow")))

    def finish(g: pa.Table) -> pa.Table:
        bound = (DEFAULT_MAX_BUCKET_ROWS if max_bucket_rows is None
                 else max_bucket_rows)
        if len(g) > bound:  # hot key: sorted sub-slice spill
            t = _sort_bucket(g, key_col, oc + ["__kind"])
            t = _stream_cumsum(t, key_col, "__inc", bound, out)
        else:
            t, new, start = _sorted_runs(g, key_col, oc + ["__kind"])
            inc = t.column("__inc").to_numpy(zero_copy_only=False)
            cs = np.cumsum(inc)
            rn = cs - (cs[start] - inc[start])
            t = t.append_column(out, pa.array(rn.astype(np.int64)))
        t = t.filter(pc.equal(t.column("__kind"), 1))
        return t.drop_columns(["__inc", "__kind"])

    return (tagged.groupby(_B)
            .map_groups(finish, batch_format="pyarrow"))


def merge_intervals(
    ds: "ray.data.Dataset",
    key_col: str,
    lo_col: str,
    hi_col: str,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-key union of overlapping intervals (the islands step of
    coverage/uptime/session math): intervals ``[lo, hi]`` under the
    same key merge while the next ``lo`` is <= the running max ``hi``
    seen so far (touching endpoints merge; strictly-after starts open
    a new island). Works for any orderable lo/hi type (numerics,
    timestamps). Rows with a null bound are dropped (an interval
    without both bounds can't merge — the SQL twin filters the same);
    null KEYS form their own group, matching GROUP BY.

    Shape: one bucket shuffle on the key; per bucket ONE vectorized
    sweep — the segmented running max is computed without any per-key
    Python via the rank + run-offset trick (prefix-max of
    ``run_id * n + rank(hi)`` resets at run starts because the offset
    dominates, and ``pm % n`` recovers the running max's rank).

    Output: ``(key, lo, hi, n_intervals)`` — one row per merged
    island, lo/hi keeping their input names and types.
    """
    import pandas as pd

    from .canonicalize import _B, _add_bucket

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.select([key_col, lo_col, hi_col]).filter(
            pc.and_(pc.is_valid(t.column(lo_col)),
                    pc.is_valid(t.column(hi_col))))
        bad = pc.sum(pc.cast(pc.greater(t.column(lo_col),
                                        t.column(hi_col)),
                             pa.int64())).as_py() or 0
        if bad:
            raise ValueError(
                f"merge_intervals: {bad} row(s) with lo > hi — "
                "degenerate intervals have no union semantics")
        return _add_bucket(t, [key_col], nb)

    def sweep(g: pa.Table) -> pa.Table:
        t = g.drop_columns([_B]).sort_by(
            [(key_col, "ascending"), (lo_col, "ascending"),
             (hi_col, "ascending")])
        n = t.num_rows
        lo_t, hi_t = (t.schema.field(lo_col).type,
                      t.schema.field(hi_col).type)
        if n == 0:
            return pa.table({key_col: t.column(key_col),
                             lo_col: pa.array([], lo_t),
                             hi_col: pa.array([], hi_t),
                             "n_intervals": pa.array([], pa.int64())})
        # key comparison stays on the ARROW column: a pandas
        # round-trip coerces nullable int64 keys to float64, where
        # keys above 2^53 alias and intervals merge across keys
        kcol = t.column(key_col).combine_chunks()
        key_chg = np.ones(n, dtype=bool)
        if n > 1:
            cur, prev = kcol.slice(1), kcol.slice(0, n - 1)
            eq = pc.equal(cur, prev)  # null when either side is null
            same = pc.or_(pc.fill_null(eq, False),
                          pc.and_(pc.is_null(cur), pc.is_null(prev)))
            key_chg[1:] = np.logical_not(
                same.to_numpy(zero_copy_only=False))
        run_id = np.cumsum(key_chg) - 1
        lo = t.column(lo_col).to_pandas().to_numpy()
        hi = t.column(hi_col).to_pandas().to_numpy()
        order = np.argsort(hi, kind="stable")
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n, dtype=np.int64)
        pm = np.maximum.accumulate(run_id * n + rank)
        hi_sorted = hi[order]
        run_max_hi = hi_sorted[pm % n]
        boundary = np.ones(n, dtype=bool)
        if n > 1:
            boundary[1:] = key_chg[1:] | (lo[1:] > run_max_hi[:-1])
        starts = np.nonzero(boundary)[0]
        counts = np.diff(np.append(starts, n)).astype(np.int64)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            key_col: t.column(key_col).take(pa.array(starts)),
            lo_col: t.column(lo_col).take(pa.array(starts)),
            hi_col: pa.array(run_max_hi[ends]).cast(hi_t),
            "n_intervals": pa.array(counts)})

    return (ds.map_batches(bucketize, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(_B).map_groups(sweep, batch_format="pyarrow"))


def rolling_median_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    window: int = 5,
    out: str = "mov_median",
    nb: int = 16,
) -> "ray.data.Dataset":
    """median(value) OVER (PARTITION BY key ORDER BY order_cols ROWS
    window-1 PRECEDING) — the robust trailing smoother (spike-immune
    rate baselines, sensor/metric denoising) that a plain moving
    average can't provide. SQL ``median``/``quantile_cont(0.5)``
    semantics: NULL values are skipped inside the frame; an even count
    of survivors averages the two middle values; an all-null frame
    yields NULL.

    Arrow-native vectorization: the sorted bucket's value array is
    NaN-padded by window−1 and viewed as an (n, window) strided matrix
    (``sliding_window_view``, zero copies); frame cells that would
    cross a run head are masked to NaN, then ONE ``np.nanmedian`` over
    axis 1 scores every row. Peak extra memory is O(n·window) in the
    single materialized mask copy — ``window`` is validated ≤ 1024 to
    keep that bounded; use a time-bucketed aggregate for wider frames.
    """
    oc = order_cols or ["ts", "event_id"]
    if not 1 <= window <= 1024:
        raise ValueError("window must be in [1, 1024]")

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "rolling_median_per_key", None)
        t, new, start = _sorted_runs(g, key_col, oc)
        n = len(t)
        if n == 0:
            return t.append_column(out, pa.array([], pa.float64()))
        col = t.column(value_col)
        v = pc.fill_null(pc.cast(col, pa.float64()),
                         np.nan).to_numpy(zero_copy_only=False)
        from numpy.lib.stride_tricks import sliding_window_view
        pad = np.concatenate([np.full(window - 1, np.nan), v])
        m = sliding_window_view(pad, window).copy()
        # column j of row i is v[i − window + 1 + j]; cells whose
        # source index precedes the run head are outside the frame
        cols = np.arange(window, dtype=np.int64)
        idx = np.arange(n, dtype=np.int64)
        thresh = (start - idx + window - 1)[:, None]
        m[cols[None, :] < thresh] = np.nan
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            med = np.nanmedian(m, axis=1)
        return t.append_column(
            out, pa.array(med, pa.float64(), mask=np.isnan(med)))

    return (
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def acf_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    max_lag: int = 3,
    nb: int = 16,
    round_to: int = 4,
) -> "ray.data.Dataset":
    """Per-key autocorrelation function: for each lag ℓ in 1..max_lag,
    the Pearson correlation of (value_t, value_{t−ℓ}) over the key's
    rows in (order_cols) order — the periodicity/burstiness profiler
    for crawl scheduling and per-host traffic characterization.
    Matches SQL ``corr(v, lag(v, ℓ) OVER (PARTITION BY key ORDER BY
    …)) GROUP BY key``: pairs where either side is null are skipped;
    < 2 pairs or zero variance on either side yields NULL.

    Arrow-native: one sort per bucket; per lag, a shifted-index mask
    confines pairs to their run, and ``np.add.reduceat`` over run
    heads produces the six sufficient statistics for EVERY key at
    once — no per-key loop, no pandas copy. Output: one row per
    (key, lag) with ``(n_pairs, acf)``.
    """
    oc = order_cols or ["ts", "event_id"]
    if not 1 <= max_lag <= 64:
        raise ValueError("max_lag must be in [1, 64]")

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "acf_per_key", None)
        t, new, start = _sorted_runs(g, key_col, oc)
        n = len(t)
        key_t = pa.table({key_col: t.column(key_col)})
        if n == 0:
            return pa.table({
                key_col: t.column(key_col),
                "lag": pa.array([], pa.int32()),
                "n_pairs": pa.array([], pa.int64()),
                "acf": pa.array([], pa.float64())})
        col = pc.cast(t.column(value_col), pa.float64())
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(new)
        idx = np.arange(n, dtype=np.int64)
        keys_at_heads = key_t.take(pa.array(heads))[key_col]
        outs = []
        for lag in range(1, max_lag + 1):
            src = idx - lag
            ok = (src >= start) & ~null & ~null[np.maximum(src, 0)]
            x = np.where(ok, v, 0.0)
            y = np.where(ok, v[np.maximum(src, 0)], 0.0)
            cnt = np.add.reduceat(ok.astype(np.float64), heads)
            sx = np.add.reduceat(x, heads)
            sy = np.add.reduceat(y, heads)
            sxx = np.add.reduceat(x * x, heads)
            syy = np.add.reduceat(y * y, heads)
            sxy = np.add.reduceat(x * y, heads)
            with np.errstate(invalid="ignore", divide="ignore"):
                cov = cnt * sxy - sx * sy
                vx = cnt * sxx - sx * sx
                vy = cnt * syy - sy * sy
                r = cov / np.sqrt(vx * vy)
            bad = (cnt < 2) | (vx <= 0) | (vy <= 0)
            r = np.where(bad, np.nan, r)
            r = (np.sign(r) *
                 np.floor(np.abs(r) * 10.0**round_to + 0.5)
                 / 10.0**round_to)
            outs.append(pa.table({
                key_col: keys_at_heads,
                "lag": pa.array(
                    np.full(len(heads), lag, np.int32)),
                "n_pairs": pa.array(cnt.astype(np.int64)),
                "acf": pa.array(r, pa.float64(), mask=bad)}))
        return pa.concat_tables(outs)

    return (
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def cusum_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    target: float = 0.0,
    threshold: float = 10.0,
    out: str = "cusum",
    nb: int = 16,
) -> "ray.data.Dataset":
    """One-sided CUSUM change detection per key — the classic
    burst/abuse/drift monitor (has this host's error rate shifted
    above its baseline?): the reflected random walk

        S_i = max(0, S_{i−1} + (x_i − target)),   S_0 = 0

    with an ``alarm`` flag where S_i > threshold. Null values carry
    zero drift (S unchanged, current S emitted), matching the SQL
    twin where a window SUM skips nulls.

    Fully vectorized via the reflection identity
    ``S_i = C_i − min(0, min_{j≤i} C_j)`` (C = per-run prefix sum of
    drift): the segmented running minimum is computed EXACTLY by
    rank-transforming C to int64 and running ONE global
    ``np.minimum.accumulate`` on rank − run_id·(n+1) (earlier runs
    are offset strictly above later ones, so a run never sees its
    predecessors; integer arithmetic → no precision loss). No per-key
    loop, no pandas copy — and being O(1)-state sequential, the same
    recurrence is a streamable-spill candidate for hot keys.
    """
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "cusum_per_key", None)
        t, new, start = _sorted_runs(g, key_col, oc)
        n = len(t)
        if n == 0:
            return t.append_column(out, pa.array([], pa.float64()))
        col = pc.cast(t.column(value_col), pa.float64())
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
        drift = np.where(null, 0.0, v - target)
        cs = np.cumsum(drift)
        heads = np.flatnonzero(new)
        # rebase the global prefix sum to per-run C
        base = np.repeat(cs[heads] - drift[heads],
                         np.diff(np.append(heads, n)))
        C = cs - base
        # exact segmented running min: rank-transform, offset by run
        order = np.argsort(C, kind="stable")
        ranks = np.empty(n, np.int64)
        ranks[order] = np.arange(n, dtype=np.int64)
        runid = np.cumsum(new.astype(np.int64)) - 1
        acc = np.minimum.accumulate(ranks - runid * np.int64(n + 1))
        rmin_rank = acc + runid * np.int64(n + 1)
        vals_by_rank = C[order]
        rmin = vals_by_rank[rmin_rank]
        S = C - np.minimum(rmin, 0.0)
        t = t.append_column(out, pa.array(np.round(S, 9), pa.float64()))
        return t.append_column("alarm", pa.array(S > threshold))

    return (
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )


def mann_kendall_per_key(
    events: "ray.data.Dataset",
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    nb: int = 16,
    max_rows_per_key: int = 4096,
    round_to: int = 4,
) -> "ray.data.Dataset":
    """Mann–Kendall monotonic-trend test per key — the standard
    nonparametric "is this series drifting?" detector (no linearity
    or normality assumption, robust to outliers — complements the
    OLS ``trend_per_key``):

        S = Σ_{i<j} sign(x_j − x_i)          (time order, ties = 0)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
        z = (S ∓ 1) / sqrt(Var(S))           (continuity-corrected)

    Null values carry no observation. Per-key work is the exact
    pairwise sign sum — O(n²) cells vectorized per run, guarded by
    ``max_rows_per_key`` (beyond it, raises: subsample or bucket the
    series first; the pairwise census is the DEFINITION, not an
    implementation shortcut, so there is no cheaper exact path
    without a merge-count pass). Output per key: ``(key, n, s_stat,
    var_s, z)``; z is null when Var(S) = 0 (all ties or n < 2).
    """
    oc = order_cols or ["ts", "event_id"]

    def local(batch: pa.Table) -> pa.Table:
        return _add_bucket(batch, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        _check_bucket(g, "mann_kendall_per_key", None)
        t, new, start = _sorted_runs(g, key_col, oc)
        col = pc.cast(t.column(value_col), pa.float64())
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(col, 0.0).to_numpy(zero_copy_only=False)
        heads = np.flatnonzero(new)
        lens = np.diff(np.append(heads, len(t)))
        keys = pa.table({key_col: t.column(key_col)}).take(
            pa.array(heads))[key_col]
        out = {"n": [], "s": [], "var": [], "z": []}
        for h, ln in zip(heads, lens):
            x = v[h:h + ln][valid[h:h + ln]]
            n = len(x)
            if n > max_rows_per_key:
                raise ValueError(
                    f"mann_kendall_per_key: key holds {n} values "
                    f"(> max_rows_per_key={max_rows_per_key})")
            if n < 2:
                out["n"].append(n)
                out["s"].append(0)
                out["var"].append(0.0)
                out["z"].append(None)
                continue
            sgn = np.sign(x[None, :] - x[:, None])
            s = int(np.triu(sgn, 1).sum())
            _, tie_counts = np.unique(x, return_counts=True)
            tt = tie_counts[tie_counts > 1].astype(np.float64)
            var = (n * (n - 1) * (2 * n + 5)
                   - float(np.sum(tt * (tt - 1) * (2 * tt + 5)))) / 18.0
            if var > 0:
                zc = (s - 1 if s > 0 else (s + 1 if s < 0 else 0))
                z = round(zc / np.sqrt(var), round_to)
            else:
                z = None
            out["n"].append(n)
            out["s"].append(s)
            out["var"].append(round(var, 6))
            out["z"].append(z)
        return pa.table({
            key_col: keys,
            "n": pa.array(out["n"], pa.int64()),
            "s_stat": pa.array(out["s"], pa.int64()),
            "var_s": pa.array(out["var"], pa.float64()),
            "z": pa.array(out["z"], pa.float64())})

    return (
        events.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(_B)
        .map_groups(finish, batch_format="pyarrow")
    )
