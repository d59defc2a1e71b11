"""Generic large×large bucketed shuffle hash join (SURVEY.md §4.2-4).

Round-1 verdict item 4: every join in the repo was a broadcast / dict
lookup; this is the promised fallback for when BOTH sides are fact-
sized (triples↔pages enrichment, annotations↔mentions at ≥10^8 keys).

Shape (classic distributed hash join, Ray-Data-first):

  1. align both sides to one wide schema (each side null-fills the
     other side's columns) and tag provenance in a ``__side`` column;
  2. ``union`` the two streams — no materialization, the streaming
     executor interleaves blocks;
  3. bucket-shuffle on ``stable_hash(key) % nb`` (ONE all-to-all, the
     unavoidable one — both sides move once);
  4. per-bucket finisher: inner/semi/anti are Arrow-native (dictionary
     key codes + numpy searchsorted expansion — payload columns never
     leave Arrow buffers); left/right/full use a pandas merge pinned
     back onto the canonical schema (outer null-key bookkeeping is
     where pandas still earns its copy).

Skew note: a hot key inflates one bucket; raise ``nb`` or pre-salt the
build side upstream (canonicalize.py's two-level reduce pattern) when a
K4 hot-key report shows heavy hitters. Null keys never match (SQL
semantics), unlike a raw pandas merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .canonicalize import _add_bucket, _B
from ..functions.hashing import hash_columns

_SIDE = "__side"
_GOLDEN = 0x9E3779B97F4A7C15


def _key_codes(lt: pa.Table, rt: pa.Table, on: list[str]):
    """Exact-equality join codes for the Arrow-native finisher: a
    canonical per-row key string (both sides already share the wide
    schema's key types, so a plain string cast is value-exact — ints
    keep full precision, floats render uniquely, -0.0 normalized to
    +0.0 and NaN demoted to null so NaN never matches NaN, matching the
    pandas dropna(subset=on) path this replaced), dictionary-encoded
    across BOTH sides so equal keys share a code. Any null key
    component → null string → code -1. Multi-column keys are
    LENGTH-PREFIXED per component ("3:foo") before joining, so the
    encoding is injective even when a string key contains the join
    separator byte."""

    def keystr(t: pa.Table) -> pa.Array:
        parts = []
        for c in on:
            arr = t.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_floating(arr.type):
                arr = pc.add(arr, 0.0)
                arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type), arr)
            if not (pa.types.is_string(arr.type)
                    or pa.types.is_large_string(arr.type)):
                arr = pc.cast(arr, pa.string())
            parts.append(arr)
        if len(parts) == 1:
            return parts[0]
        parts = [pc.binary_join_element_wise(
            pc.cast(pc.binary_length(p), pa.string()), p, ":") for p in parts]
        return pc.binary_join_element_wise(*parts, "\x1f")  # null → null

    lk, rk = keystr(lt), keystr(rt)
    both = pa.chunked_array([lk, rk]).combine_chunks().dictionary_encode()
    codes = pc.fill_null(both.indices, -1).to_numpy(
        zero_copy_only=False).astype(np.int64)
    return codes[: len(lt)], codes[len(lt):]


def _pin_schema(columns, schema: pa.Schema) -> pa.Table:
    """Assemble output columns under the canonical schema, casting where
    the wide carrier type differs (an overlapping non-key column rides
    in the LEFT-typed wide column but is declared right-typed in the
    output)."""
    arrays = [c if c.type == f.type else c.cast(f.type)
              for c, f in zip(columns, schema)]
    return pa.table(arrays, schema=schema)


def _mix64(x):
    """murmur3 finalizer — decorrelates (hash + sub·GOLDEN) from nb so
    sub-bucket spreading survives any nb (additive offsets alone
    collapse when gcd(GOLDEN, nb) > 1, e.g. nb multiples of 5)."""
    import numpy as np

    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema:
    """Arrow schema of a Dataset. A :func:`util.cheap_arrow_schema`
    answer (with_schema annotation / cached / metadata) avoids the
    schema-fetch EXECUTION Ray pays on a lazy chain; parquet-backed
    datasets answer from metadata; pandas-backed ones (tests,
    from_pandas) report a PandasBlockSchema — fall back to peeking
    one streaming batch."""
    from .util import cheap_arrow_schema

    cheap = cheap_arrow_schema(ds)
    if cheap is not None:
        return cheap
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    empty = pd.DataFrame({n: pd.Series(dtype=t) for n, t in zip(base.names, base.types)})
    sch = pa.Schema.from_pandas(empty, preserve_index=False)
    # an EMPTY object-dtype series infers as arrow null — those columns
    # are strings in every real pandas block
    return pa.schema([pa.field(f.name, pa.string()) if pa.types.is_null(f.type) else f
                      for f in sch])


def _df_to_schema(df: "pd.DataFrame", schema: pa.Schema) -> pa.Table:
    """Pin a per-bucket pandas result onto one canonical Arrow schema.

    Without this, buckets disagree: a left-join bucket with unmatched
    keys promotes int64 right columns to float64+NaN, an empty bucket
    yields null-typed columns — and the union of blocks then breaks
    downstream consumers. Integer targets take the float→Int64 route so
    NaNs become proper nulls."""
    arrays = []
    for f in schema:
        if f.name in df.columns:
            col = df[f.name]
            if (pa.types.is_integer(f.type) and getattr(col.dtype, "kind", "") == "f"):
                col = col.astype("Int64")
            arrays.append(pa.Array.from_pandas(col, type=f.type))
        else:
            arrays.append(pa.nulls(len(df), f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def _align(batch: pa.Table, schema: pa.Schema, side: int) -> pa.Table:
    """Project a batch onto the combined wide schema + side tag."""
    n = len(batch)
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            cols.append(batch.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    out = pa.table(cols, schema=schema)
    return out.append_column(_SIDE, pa.array([side] * n, pa.int8()))


def shuffle_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    how: str = "inner",
    nb: int = 64,
    suffixes: tuple[str, str] = ("_l", "_r"),
    hot_keys: "pa.Table | list | None" = None,
    salt: int = 8,
) -> "ray.data.Dataset":
    """Join two Datasets on ``on`` via one bucket shuffle.

    ``how``: inner | left | right | full | semi | anti (semi/anti
    return left columns only; ``full`` is SQL FULL OUTER — the key
    column is coalesced across sides). Overlapping non-key columns get
    ``suffixes``.

    **Skew handling**: pass ``hot_keys`` (a pa.Table holding the key
    columns — e.g. the top rows of a K4 ``distinct_counts`` hot-key
    report — or, for a single-column key, a plain list of values) to
    SALT those keys across ``salt`` sub-buckets: LEFT hot rows fan out
    round-robin, RIGHT hot rows are replicated into every sub-bucket,
    so one Zipf-heavy key ("Homo sapiens" on 40% of pages) spreads over
    ``salt`` reduce groups instead of melting one. Output is identical
    to the unsalted plan for every ``how`` (parity-tested); cost is
    ``salt×`` duplication of the right-side hot rows only.
    """
    if how not in ("inner", "left", "right", "full", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if hot_keys is not None and how in ("right", "full"):
        # a replicated build-side hot row that matches NOTHING would be
        # emitted unmatched once per sub-bucket — wrong output
        raise ValueError("hot_keys salting is not supported for right/full joins")
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    for k in on:
        if k not in lschema.names or k not in rschema.names:
            raise ValueError(f"join key {k!r} missing from a side")
    lcols = [n for n in lschema.names if n not in on]
    rcols = [n for n in rschema.names if n not in on]
    # Same-named non-key columns are carried ONCE in the wide schema
    # (left rows hold left values, right rows right values — the __side
    # split recovers each; pandas applies ``suffixes`` at merge time).
    wide = pa.schema(
        [lschema.field(k) for k in on]
        + [lschema.field(n) for n in lcols]
        + [rschema.field(n) for n in rcols if n not in lcols]
    )
    # canonical OUTPUT schema (same for every bucket): overlapping
    # non-key columns get the pandas-merge suffixes
    overlap = set(lcols) & set(rcols)
    if how in ("semi", "anti"):
        out_schema = pa.schema([lschema.field(k) for k in on]
                               + [lschema.field(n) for n in lcols])
    else:
        out_schema = pa.schema(
            [lschema.field(k) for k in on]
            + [pa.field(n + suffixes[0] if n in overlap else n, lschema.field(n).type)
               for n in lcols]
            + [pa.field(n + suffixes[1] if n in overlap else n, rschema.field(n).type)
               for n in rcols]
        )

    hot = None
    if hot_keys is not None and salt > 1:
        if not isinstance(hot_keys, pa.Table):
            hot_keys = pa.table({on[0]: pa.array(list(hot_keys))})
        hot_tbl = pa.table({k: hot_keys.column(k).cast(wide.field(k).type) for k in on})
        hot = hash_columns(hot_tbl, on)

    def prep(side: int):
        def f(batch: pa.Table) -> pa.Table:
            t = _align(batch, wide, side)
            if hot is None:
                return _add_bucket(t, on, nb)

            h = hash_columns(t, on)
            hotmask = np.isin(h, hot)

            def bucket_of(hh, sub):
                with np.errstate(over="ignore"):
                    return (_mix64(hh + sub * np.uint64(_GOLDEN))
                            % np.uint64(nb)).astype(np.int32)

            if side == 0:
                sub = np.where(hotmask,
                               np.arange(len(t), dtype=np.uint64) % np.uint64(salt),
                               np.uint64(0))
                return t.append_column(_B, pa.array(bucket_of(h, sub)))
            # build side: one copy per DISTINCT bucket a hot key's subs
            # map to — two subs sharing a bucket must not yield two
            # copies (every probe row there would match twice)
            idx_cold = np.flatnonzero(~hotmask)
            idx_hot = np.flatnonzero(hotmask)
            b_cold = bucket_of(h[idx_cold], np.uint64(0))
            subs = np.arange(salt, dtype=np.uint64)
            bmat = np.stack([bucket_of(h[idx_hot], s) for s in subs], axis=1)                 if len(idx_hot) else np.empty((0, salt), np.int32)
            pairs = np.unique(
                idx_hot.astype(np.int64)[:, None] * np.int64(nb)
                + bmat.astype(np.int64))
            hot_rows = (pairs // nb).astype(np.int64)
            hot_b = (pairs % nb).astype(np.int32)
            take = np.concatenate([idx_cold, hot_rows])
            b = np.concatenate([b_cold, hot_b])
            t2 = t.take(pa.array(take))
            return t2.append_column(_B, pa.array(b))

        return f

    both = (
        left.map_batches(prep(0), batch_format="pyarrow", batch_size=65536)
        .union(right.map_batches(prep(1), batch_format="pyarrow", batch_size=65536))
    )

    def finish(g: pa.Table) -> pa.Table:
        # Arrow-native for EVERY how (r02 verdict item 6 + its minor #4):
        # payload columns never leave Arrow buffers — key equality is
        # decided on dictionary codes of a canonical per-row key string,
        # one-to-many expansion is numpy searchsorted arithmetic, and
        # outer joins append unmatched-side chunks with pa.nulls columns.
        # Null keys never match (SQL semantics): the canonical key of a
        # null component is null → code -1; left/right/full keep the
        # preserved side's null-key rows unmatched.
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        t = g.drop_columns([_B, _SIDE])
        lmask = side == 0
        lt = t.filter(pa.array(lmask)).select(on + lcols).combine_chunks()
        rt = t.filter(pa.array(~lmask)).select(on + rcols).combine_chunks()
        lcodes, rcodes = _key_codes(lt, rt, on)
        if how == "semi":
            member = np.isin(lcodes, rcodes[rcodes >= 0])
            out = lt.filter(pa.array(member & (lcodes >= 0)))
            return _pin_schema(out.columns, out_schema)
        if how == "anti":
            # SQL ANTI/NOT EXISTS: a null-key left row matches nothing,
            # so it is KEPT (unlike semi, where no match = excluded)
            member = np.isin(lcodes, rcodes[rcodes >= 0])
            out = lt.filter(pa.array(~member))
            return _pin_schema(out.columns, out_schema)
        # matched core: expand every (left row, matching right row) pair
        rvalid = np.flatnonzero(rcodes >= 0)
        order = rvalid[np.argsort(rcodes[rvalid], kind="stable")]
        rsorted = rcodes[order]
        lvalid = np.flatnonzero(lcodes >= 0)
        lv = lcodes[lvalid]
        lo = np.searchsorted(rsorted, lv, "left")
        cnt = np.searchsorted(rsorted, lv, "right") - lo
        total = int(cnt.sum())
        l_take = np.repeat(lvalid, cnt)
        starts = np.repeat(lo, cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt)
        r_take = order[starts + within]
        left_out = lt.take(pa.array(l_take))
        right_out = rt.drop_columns(on).take(pa.array(r_take))
        chunks = [_pin_schema(list(left_out.columns)
                              + list(right_out.columns), out_schema)]
        nk, nl, nr = len(on), len(lcols), len(rcols)
        if how in ("left", "full"):
            m = np.zeros(len(lt), dtype=bool)
            m[lvalid[cnt > 0]] = True  # left rows with ≥1 match
            lun = np.flatnonzero(~m)
            if len(lun):
                lpart = lt.take(pa.array(lun))
                chunks.append(_pin_schema(
                    list(lpart.columns)
                    + [pa.nulls(len(lun), f.type)
                       for f in list(out_schema)[nk + nl:]],
                    out_schema))
        if how in ("right", "full"):
            rm = (rcodes >= 0) & np.isin(rcodes, lcodes[lcodes >= 0])
            run = np.flatnonzero(~rm)
            if len(run):
                rpart = rt.take(pa.array(run))
                chunks.append(_pin_schema(
                    list(rpart.select(on).columns)
                    + [pa.nulls(len(run), f.type)
                       for f in list(out_schema)[nk:nk + nl]]
                    + list(rpart.drop_columns(on).columns),
                    out_schema))
        if len(chunks) == 1:
            return chunks[0]
        return pa.concat_tables(chunks)

    from .util import with_schema

    # every bucket is pinned to out_schema — annotate it so chained
    # joins / consumers never pay a schema-fetch execution
    return with_schema(
        both.groupby(_B).map_groups(finish, batch_format="pyarrow"),
        out_schema)


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    right_ts: str | None = None,
    nb: int = 32,
    how: str = "inner",
    direction: str = "backward",
) -> "ray.data.Dataset":
    """Distributed AS-OF join: each left row matches the LATEST right
    row of the same ``key`` with right ts ≤ left ts (DuckDB
    ``ASOF JOIN`` semantics; ``how="left"`` keeps unmatched rows with
    nulls). ``direction``: backward (default) | forward (earliest
    right ts ≥ left ts) | nearest.

    Shape: same one-bucket-shuffle union as ``shuffle_hash_join``
    (keys co-locate), then a vectorized ``pd.merge_asof(by=key)``
    inside each bucket — no per-row Python, no global sort.
    Determinism note: among right rows tying on (key, ts), the payload
    of the LAST one in (ts, input-order) wins — pre-dedup the right
    side on (key, ts) if its payload is not unique per timestamp."""
    rts = right_ts or ts
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = [n for n in lschema.names if n not in (key, ts)]
    rcols = [n for n in rschema.names if n not in (key, rts)]
    wide = pa.schema(
        [lschema.field(key), lschema.field(ts)]
        + ([rschema.field(rts)] if rts != ts else [])
        + [lschema.field(n) for n in lcols]
        + [rschema.field(n) for n in rcols if n not in lcols]
    )
    # ``wide`` doubles as the canonical per-bucket OUTPUT schema: without
    # pinning it, any bucket whose pandas merge null-pads an int column
    # upcasts it to float64+NaN and the Dataset's dtype diverges from the
    # inputs' (r02 driver hash failures on asof/interval — dtype, not
    # values)
    out_schema = wide

    def prep(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return _add_bucket(_align(batch, wide, side), [key], nb)

        return f

    both = (
        left.map_batches(prep(0), batch_format="pyarrow", batch_size=65536)
        .union(right.map_batches(prep(1), batch_format="pyarrow", batch_size=65536))
    )

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        side = df.pop(_SIDE)
        ldf = df[side == 0][[key, ts] + lcols].dropna(subset=[key, ts])
        rdf = df[side == 1][[key, rts] + rcols].dropna(subset=[key, rts])
        if len(rdf) == 0:  # pandas merge_asof rejects dtype-less empties
            out = ldf.copy()
            for c in ([rts] if rts != ts else []) + [c for c in rcols if c not in lcols]:
                out[c] = pd.NA
            if how == "inner":
                out = out.iloc[0:0]
            return _df_to_schema(out, out_schema)
        ldf = ldf.sort_values([ts, key], kind="mergesort")
        rdf = rdf.sort_values([rts, key], kind="mergesort")
        # explicit match marker: filtering on a payload column is wrong
        # when payloads can be null, and when rts == ts the fallback
        # probe used to hit the LEFT ts (never null) — inner degenerated
        # to left
        rdf = rdf.assign(__matched=np.int8(1))
        out = pd.merge_asof(ldf, rdf, left_on=ts, right_on=rts, by=key,
                            direction=direction)
        if how == "inner":
            out = out[out["__matched"].notna()]
        out = out.drop(columns=["__matched"])
        return _df_to_schema(out, out_schema)

    return both.groupby(_B).map_groups(finish, batch_format="pyarrow")


def interval_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    start: str,
    end: str,
    nb: int = 32,
    overlapping: bool = False,
) -> "ray.data.Dataset":
    """Keyed range join: left rows (key, ts) ⋈ right intervals
    (key, start, end) where start ≤ ts ≤ end.

    Same one-bucket-shuffle co-location as the other joins. With
    non-overlapping intervals per key (sessions, validity windows —
    the common case) each bucket resolves with ONE vectorized
    ``merge_asof`` on the interval start + an end-bound filter.
    ``overlapping=True`` switches to a key-equijoin + range filter
    (cost bounded by per-key interval count — document/bound it)."""
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = [n for n in lschema.names if n != key]
    rcols = [n for n in rschema.names if n != key]
    wide = pa.schema(
        [lschema.field(key)]
        + [lschema.field(n) for n in lcols]
        + [rschema.field(n) for n in rcols if n not in lcols]
    )

    def prep(side: int):
        def f(batch: pa.Table) -> pa.Table:
            return _add_bucket(_align(batch, wide, side), [key], nb)

        return f

    both = (
        left.map_batches(prep(0), batch_format="pyarrow", batch_size=65536)
        .union(right.map_batches(prep(1), batch_format="pyarrow", batch_size=65536))
    )

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        side = df.pop(_SIDE)
        ldf = df[side == 0][[key] + lcols].dropna(subset=[key, ts])
        rdf = df[side == 1][[key] + rcols].dropna(subset=[key, start, end])
        if len(rdf) == 0 or len(ldf) == 0:
            out = ldf.iloc[0:0].copy()
            for c in [start, end] + [c for c in rcols if c not in lcols]:
                if c not in out.columns:
                    out[c] = pd.NA
        elif overlapping:
            out = ldf.merge(rdf, on=key)
            out = out[(out[start] <= out[ts]) & (out[ts] <= out[end])]
        else:
            out = pd.merge_asof(
                ldf.sort_values([ts, key], kind="mergesort"),
                rdf.sort_values([start, key], kind="mergesort"),
                left_on=ts, right_on=start, by=key, direction="backward")
            out = out[out[end].notna() & (out[ts] <= out[end])]
        # pin the canonical schema — a pandas merge that null-padded an
        # int column must not leak float64 into the Dataset (r02)
        return _df_to_schema(out, wide)

    return both.groupby(_B).map_groups(finish, batch_format="pyarrow")


def broadcast_join(
    large: "ray.data.Dataset",
    small: pa.Table,
    on: list[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    """Broadcast (map-side) hash join: the SMALL side is put into the
    object store ONCE (``ray.put``) and every map task merges against
    it — zero shuffle, the right plan whenever one side fits in a
    worker's heap (dimension tables, lookup maps, ≤ ~100 MB). For two
    fact-sized sides use ``shuffle_hash_join``.

    ``how``: inner | left | semi | anti (SQL null semantics — null
    keys never match on EITHER side) | cross (Cartesian product;
    ``on`` ignored). Overlapping non-key right columns get an ``_r``
    suffix (left columns keep their names).

    The small side is converted/deduped ONCE and cached per worker
    process — per-batch work is just the merge."""
    import ray as _ray

    if how not in ("inner", "left", "semi", "anti", "cross"):
        raise ValueError(f"unsupported how: {how}")
    sdf = small.to_pandas()
    if how in ("semi", "anti"):
        # null keys never match: drop them from the probe set so a
        # null-key right row cannot pair with a null-key left row
        # (pandas merge matches NaN == NaN, unlike SQL)
        sdf = sdf[on].dropna().drop_duplicates()
    elif how != "cross":
        sdf = sdf[sdf[on].notna().all(axis=1)]
    ref = _ray.put(sdf)
    _cache: dict = {}

    def _small() -> pd.DataFrame:
        if "df" not in _cache:
            _cache["df"] = _ray.get(ref)
        return _cache["df"]

    def merge(batch: pa.Table) -> pa.Table:
        s = _small()
        left_df = batch.to_pandas()
        # an all-null key column materializes as Arrow null / object
        # dtype; align it to the broadcast side's dtype so the pandas
        # merge type-check passes (values are all-NaN either way)
        if how != "cross":
            for c in on:
                if left_df[c].dtype != s[c].dtype and left_df[c].isna().all():
                    try:
                        left_df[c] = left_df[c].astype(s[c].dtype)
                    except (TypeError, ValueError):
                        left_df[c] = left_df[c].astype("float64")
        if how == "cross":
            return pa.Table.from_pandas(left_df.merge(s, how="cross"),
                                        preserve_index=False)
        if how in ("semi", "anti"):
            m = left_df.merge(s.assign(__hit=1), on=on, how="left")
            keep = m["__hit"].notna() if how == "semi" else m["__hit"].isna()
            return pa.Table.from_pandas(m.loc[keep, list(batch.column_names)],
                                        preserve_index=False)
        right_df = s.rename(columns={
            c: f"{c}_r" for c in s.columns if c not in on and c in left_df.columns})
        null_key = left_df[on].isna().any(axis=1)
        nn = left_df[~null_key]
        if len(nn):
            m = nn.merge(right_df, on=on, how=how)
        else:
            m = pd.DataFrame({c: pd.Series([], dtype=(left_df[c].dtype if c in left_df
                                                      else right_df[c].dtype))
                              for c in list(left_df.columns)
                              + [c for c in right_df.columns if c not in left_df.columns]})
        if how == "left" and null_key.any():
            # right columns are suffixed, so reindex only null-fills
            # THEM — left values survive untouched
            unmatched = left_df[null_key].reindex(columns=m.columns)
            m = pd.concat([m, unmatched], ignore_index=True)
        return pa.Table.from_pandas(m, preserve_index=False)

    return large.map_batches(merge, batch_format="pyarrow", batch_size=65536)


def join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    how: str = "inner",
    broadcast_threshold_rows: int = 1_000_000,
    nb: int = 64,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> "ray.data.Dataset":
    """Size-dispatching join front door (the linking stage's
    ``compute_links_auto`` pattern generalized to joins): materialize
    the RIGHT side once, count it, and pick the plan —

    - ≤ ``broadcast_threshold_rows`` → map-side ``broadcast_join``
      (zero shuffle; the dimension-table case);
    - larger → bucketed ``shuffle_hash_join`` (both sides move once).

    ``full``/``right`` always take the shuffle plan (broadcast keeps
    no unmatched right rows). The materialize is the honest price of
    not knowing the size: blocks land in the object store (spillable)
    and are consumed by whichever plan wins — callers that already
    know the shape should call the specific join directly."""
    if how in ("full", "right"):
        return shuffle_hash_join(left, right, on, how=how, nb=nb, suffixes=suffixes)
    m = right.materialize()
    if m.count() <= broadcast_threshold_rows:
        import ray as _ray

        small = pa.concat_tables(
            [pa.Table.from_pandas(df, preserve_index=False) if isinstance(df, pd.DataFrame)
             else df for df in _ray.get(m.to_arrow_refs())])
        return broadcast_join(left, small, on, how=how)
    return shuffle_hash_join(left, m, on, how=how, nb=nb, suffixes=suffixes)


def merge_upsert(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    on: list[str],
    op_col: str = "op",
    nb: int = 64,
) -> "ray.data.Dataset":
    """SQL MERGE / CDC apply: ``changes`` rows carry ``op_col`` ∈
    {"upsert", "delete"}; the result is ``base`` with upsert rows
    replacing (or inserting) their key and delete keys removed.
    Both sides may be fact-sized: one bucket shuffle on the key
    co-locates base and change rows; within each bucket the change
    side wins vectorized (pandas keyed merge, no per-row Python).

    Exactly-one-change-per-key is the caller's contract (dedupe a
    change LOG to the latest row per key first — ``groupby_argmax`` on
    a sequence column); duplicate change keys raise rather than pick a
    block-order winner.
    """
    from .canonicalize import _B, _add_bucket

    bschema = _arrow_schema(base)
    out_cols = bschema.names
    if op_col not in _arrow_schema(changes).names:
        raise ValueError(f"changes side missing op column {op_col!r}")

    def prep(side: int):
        def f(batch: pa.Table) -> pa.Table:
            if side == 0:
                batch = batch.append_column(
                    op_col, pa.array(np.full(len(batch), None, object),
                                     pa.string()))
            cols = out_cols + [op_col]
            batch = batch.select(cols).append_column(
                "_side", pa.array(np.full(len(batch), side, np.int8)))
            return _add_bucket(batch, on, nb)

        return f

    tagged = base.map_batches(prep(0), batch_format="pyarrow",
                              batch_size=65536).union(
        changes.map_batches(prep(1), batch_format="pyarrow",
                            batch_size=65536))

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        ch = df[df["_side"] == 1]
        bad = ~ch[op_col].isin(("upsert", "delete"))
        if bad.any():
            raise ValueError(
                f"merge_upsert: unknown op value(s) "
                f"{sorted(map(repr, ch.loc[bad, op_col].unique()))} — a "
                "typo'd op would otherwise silently delete its key")
        if ch.duplicated(on).any():
            raise ValueError(
                "merge_upsert: multiple change rows for one key — "
                "reduce the change log to latest-per-key first")
        bs = df[df["_side"] == 0]
        # base rows whose key has ANY change row are superseded
        keep_base = bs.merge(ch[on].assign(_hit=1), on=on, how="left")
        keep_base = keep_base[keep_base["_hit"].isna()][out_cols]
        ins = ch[ch[op_col] == "upsert"][out_cols]
        out = pd.concat([keep_base, ins], ignore_index=True)
        return _df_to_schema(out, bschema)

    return tagged.groupby(_B).map_groups(finish, batch_format="pyarrow")


def bloom_prefilter(
    probe: "ray.data.Dataset",
    build: "ray.data.Dataset",
    on: list[str],
    bits_pow: int = 23,
    n_hashes: int = 4,
) -> "ray.data.Dataset":
    """Bloom-filter probe-side pruning for the shuffle join: build a
    distributed Bloom bitset over the BUILD side's join key (per-batch
    bitsets OR-reduced on the driver — 1 MiB at 2^23 bits), broadcast
    it once, and drop probe rows whose key is bloom-NEGATIVE before
    they ever enter the all-to-all exchange.

    Sound ONLY for join modes where a non-matching probe row
    contributes nothing — inner and semi (false positives are settled
    exactly by the join itself; negatives are certain non-matches).
    For anti/left joins use ``sink.bloom_anti_join``-style splitting
    instead — dropping bloom-negative rows there would LOSE output.

    At a 10^12-row probe against a 10^8-key build side this cuts the
    shuffle to ~the matching fraction; the build side is scanned once
    extra (cheap: bitset partials only)."""
    import ray as _ray

    from ..functions.hashing import hash_columns

    m = 1 << bits_pow
    mask = np.uint64(m - 1)
    seeds = [np.uint64((_GOLDEN * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
             for i in range(n_hashes)]

    def _positions(batch: pa.Table) -> list[np.ndarray]:
        h = hash_columns(batch, on).astype(np.uint64)
        with np.errstate(over="ignore"):
            return [((h * s) >> np.uint64(64 - bits_pow)) & mask
                    for s in seeds]

    def build_bits(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m // 8, dtype=np.uint8)
        for pos in _positions(batch):
            np.bitwise_or.at(bits, pos >> np.uint64(3),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def or_combine(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m // 8, dtype=np.uint8)
        for bb in batch.column("bits").to_pylist():
            acc |= np.frombuffer(bb, dtype=np.uint8)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    # tree OR-reduce: per-batch bitsets collapse 64:1 in a combine
    # stage so the driver folds a handful of bitsets, not one per
    # 256k build rows (the 10^8-key case would otherwise pull ~GiBs)
    parts = (build.map_batches(build_bits, batch_format="pyarrow",
                               batch_size=262144)
             .map_batches(or_combine, batch_format="pyarrow",
                          batch_size=64).to_pandas())
    bits = np.zeros(m // 8, dtype=np.uint8)
    for b in parts["bits"]:
        bits |= np.frombuffer(b, dtype=np.uint8)
    ref = _ray.put(bits)

    def keep_positive(batch: pa.Table) -> pa.Table:
        bf = _ray.get(ref)
        ok = np.ones(len(batch), dtype=bool)
        for pos in _positions(batch):
            ok &= ((bf[(pos >> np.uint64(3)).astype(np.int64)]
                    >> (pos & np.uint64(7)).astype(np.uint8)) & 1) == 1
        return batch.filter(pa.array(ok))

    return probe.map_batches(keep_positive, batch_format="pyarrow",
                             batch_size=65536)


def table_diff(
    base: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_cols: list[str],
    compare_cols: list[str],
    nb: int = 64,
) -> "ray.data.Dataset":
    """CDC-style diff of two keyed tables: (key…, change) with change ∈
    added | removed | changed — "what happened between snapshot A and
    snapshot B" without shipping either table to the driver.

    Shape: presence markers on each side, ONE full-outer bucket shuffle
    join (keys co-locate once), then a per-batch vectorized classify —
    null-safe equality on ``compare_cols`` (null == null counts as
    same). Unchanged rows are dropped batch-side, so the output is
    diff-sized, not table-sized."""

    def mark(name: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(name, pa.array(
                np.ones(len(batch), np.int8)))
        return f

    b = base.map_batches(mark("__in_a"), batch_format="pyarrow",
                         batch_size=65536)
    n = new.map_batches(mark("__in_b"), batch_format="pyarrow",
                        batch_size=65536)
    j = shuffle_hash_join(b, n, on=key_cols, how="full", nb=nb)

    def classify(batch: pa.Table) -> pa.Table:
        in_a = pc.is_valid(batch.column("__in_a")).to_numpy(zero_copy_only=False)
        in_b = pc.is_valid(batch.column("__in_b")).to_numpy(zero_copy_only=False)
        differs = np.zeros(len(batch), dtype=bool)
        for c in compare_cols:
            cl, cr = batch.column(c + "_l"), batch.column(c + "_r")
            eq = pc.fill_null(pc.equal(cl, cr), False)
            both_null = pc.and_(pc.is_null(cl), pc.is_null(cr))
            same = pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
            differs |= ~same
        change = np.where(~in_a, "added", np.where(~in_b, "removed", "changed"))
        keep = ~in_a | ~in_b | differs
        out = batch.select(key_cols).append_column(
            "change", pa.array(change, pa.string()))
        return out.filter(pa.array(keep))

    return j.map_batches(classify, batch_format="pyarrow")


def join_skew_report(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    k: int = 20,
    nb: int = 64,
) -> "ray.data.Dataset":
    """Pre-join skew profiler: per join key, how many rows each side
    holds and how many output rows the key would contribute to an
    inner join (``l_count * r_count``) — the top-``k`` contributors
    by output size. This is the planning pass behind the repo's
    hot-key salting (:func:`~.canonicalize.recommend_salt`): run it
    BEFORE a large-large shuffle join to decide salting/broadcast,
    or after a blow-up to name the keys that caused it.

    Scale shape: both sides reduce to map-side-combined per-key
    counts (:func:`~.canonicalize.sum_by_key`) before anything joins
    — the profiler never shuffles the row streams, only the count
    tables (one bucketed full-outer join), then a local-top-k +
    single-block cut (each block ships at most ``k`` candidates).

    Returns ``(key, l_count, r_count, pairs)`` — top ``k`` by
    ``pairs`` desc, key asc; a key missing from one side counts 0
    there (pairs 0, still reportable when fewer than ``k`` keys
    overlap).
    """
    from .canonicalize import sum_by_key

    def ones(ds, col):
        return ds.map_batches(
            lambda t: pa.table({
                "key": t.column(col),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow")

    lc = sum_by_key(ones(left, left_key), "key", "one", nb=nb,
                    out_col="l_count")
    rc = sum_by_key(ones(right, right_key), "key", "one", nb=nb,
                    out_col="r_count")
    both = shuffle_hash_join(lc, rc, on=["key"], how="full", nb=nb)

    def score(t: pa.Table) -> pa.Table:
        lcv = pc.fill_null(t.column("l_count"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        rcv = pc.fill_null(t.column("r_count"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keys = t.column("key")
        out = pa.table({"key": keys, "l_count": pa.array(lcv),
                        "r_count": pa.array(rcv),
                        "pairs": pa.array(lcv * rcv)})
        idx = pc.sort_indices(out, sort_keys=[
            ("pairs", "descending"), ("key", "ascending")])
        return out.take(idx[:k])

    return (both.map_batches(score, batch_format="pyarrow",
                             batch_size=1 << 20)
            .repartition(1)
            .map_batches(score, batch_format="pyarrow",
                         batch_size=1 << 30))


def band_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: "str | list[str]",
    lval: str,
    eps: float,
    rval: "str | None" = None,
    nb: int = 64,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Keyed numeric band join: inner join on ``on`` equality AND
    ``|l.lval − r.rval| ≤ eps`` — the fuzzy-measurement join (same
    entity key, numeric reading within tolerance) that an equi-join
    can't express and a cross-join can't afford.

    Scale shape: both sides bucket on ``(on…, floor(value/eps))``;
    each LEFT row is replicated to its cell and both neighbors (3×),
    each RIGHT row lands in its own cell only — any pair within eps
    spans at most one cell boundary, so it meets in EXACTLY one
    bucket (the right row's cell; no post-dedup pass needed). The
    shuffle therefore moves 3·|L| + |R| rows, never |L|·|R|; skew is
    bounded by rows per (key, eps-cell). Right columns colliding with
    left names get ``suffix``. SQL inner-join null semantics: rows
    with a null key or null value match nothing and are dropped
    map-side."""
    keys = [on] if isinstance(on, str) else list(on)
    rval = rval if rval is not None else lval
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lcols = [n for n in lschema.names if n not in keys]
    taken = set(keys) | set(lcols)
    rmap = {n: (n + suffix if n in taken else n)
            for n in rschema.names if n not in keys}
    rval_out = rmap[rval]
    wide = pa.schema(
        [lschema.field(k) for k in keys]
        + [lschema.field(n) for n in lcols]
        + [pa.field(rmap[n], rschema.field(n).type) for n in rmap])
    _CELL = "__cell"

    def _cells(t: pa.Table, vcol: str) -> "tuple[pa.Table, np.ndarray]":
        import pyarrow.compute as pc
        ok = pc.true_unless_null(t.column(vcol))
        for k in keys:
            ok = pc.and_(ok, pc.true_unless_null(t.column(k)))
        t = t.filter(pc.fill_null(ok, False))
        v = t.column(vcol).to_numpy(zero_copy_only=False).astype(np.float64)
        fin = np.isfinite(v)
        if not fin.all():
            t = t.take(pa.array(np.flatnonzero(fin)))
            v = v[fin]
        return t, np.floor(v / eps).astype(np.int64)

    def prep_left(batch: pa.Table) -> pa.Table:
        t = _align(batch, wide, 0)
        t, c = _cells(t, lval)
        parts = []
        for d in (-1, 0, 1):
            parts.append(t.append_column(_CELL, pa.array(c + d)))
        out = pa.concat_tables(parts)
        return _add_bucket(out, keys + [_CELL], nb)

    def prep_right(batch: pa.Table) -> pa.Table:
        renamed = batch.rename_columns(
            [rmap.get(n, n) for n in batch.column_names])
        t = _align(renamed, wide, 1)
        t, c = _cells(t, rval_out)
        return _add_bucket(t.append_column(_CELL, pa.array(c)), keys + [_CELL], nb)

    both = (left.map_batches(prep_left, batch_format="pyarrow",
                             batch_size=65536)
            .union(right.map_batches(prep_right, batch_format="pyarrow",
                                     batch_size=65536)))

    rcols_out = list(rmap.values())

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        side = df.pop(_SIDE)
        ldf = df[side == 0][keys + lcols + [_CELL]]
        rdf = df[side == 1][keys + rcols_out + [_CELL]]
        if len(ldf) == 0 or len(rdf) == 0:
            return _df_to_schema(df.iloc[0:0], wide)
        out = ldf.merge(rdf, on=keys + [_CELL])
        out = out[(out[lval] - out[rval_out]).abs() <= eps]
        return _df_to_schema(out.drop(columns=[_CELL]), wide)

    return both.groupby(_B).map_groups(finish, batch_format="pyarrow")


def _products_int64_checked(nl: np.ndarray,
                            nr: np.ndarray) -> np.ndarray:
    """Per-key count products with a WRAP-PROOF overflow guard:
    wrap-around here is exactly the explosive join the cardinality
    probe exists to catch.  The batch SUM can overflow int64 even
    when every per-key product fits (3 keys × 2^62 pairs wraps the
    np.int64 sum negative), so the guard checks a float64 sum too —
    the 2**62 margin absorbs float rounding long before the int64
    edge; past it the exact Python-int path decides."""
    if not len(nl):
        return nl.astype(np.int64)
    prod_f = nl.astype(np.float64) * nr.astype(np.float64)
    if prod_f.max() > 2 ** 62 or prod_f.sum() > 2 ** 62:
        rows_py = [int(a) * int(b) for a, b in zip(nl, nr)]
        if max(rows_py) > 2 ** 63 - 1 or \
                sum(rows_py) > 2 ** 63 - 1:
            raise ValueError(
                "join_cardinality_estimate: estimated join "
                "cardinality exceeds int64 — the join is "
                "unaffordable as keyed")
        return np.array(rows_py, np.int64)
    return nl * nr


def join_cardinality_estimate(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: "str | list[str]",
    nb: int = 16,
    top: int = 5,
) -> pa.Table:
    """EXACT inner-join output cardinality WITHOUT running the join —
    the planner probe behind "can we afford this join / which keys
    explode it": |L ⋈ R| = Σ_k n_L(k)·n_R(k), computed by joining the
    two per-key COUNT censuses (each ≪ the data; map-side combined)
    instead of the data. Also reports the ``top`` heaviest keys —
    exactly the salting candidates ``recommend_salt`` wants. Null
    keys match nothing (SQL inner-join semantics). Returns ONE row
    ``(est_rows, n_common_keys, max_key_rows, top_keys)`` where
    top_keys is a '|'-joined "key:rows" string (deterministic order:
    rows desc, key asc). Per-key products and the total are computed
    in overflow-checked integer math: a join whose cardinality would
    exceed int64 raises (the honest answer to "can we afford this
    join" is NO, not a wrapped number)."""
    import pyarrow.compute as pc

    from .canonicalize import sum_by_key

    keys = [on] if isinstance(on, str) else list(on)

    def census(t: pa.Table) -> pa.Table:
        cols = {f"k{i}": pc.cast(t.column(k), pa.string())
                for i, k in enumerate(keys)}
        out = pa.table(cols)
        ok = None
        for c in cols:
            v = pc.is_valid(out.column(c))
            ok = v if ok is None else pc.and_(ok, v)
        out = out.filter(ok)
        return out.append_column(
            "n", pa.array(np.ones(out.num_rows, np.int64)))

    kcols = [f"k{i}" for i in range(len(keys))]
    lc = sum_by_key(left.map_batches(census, batch_format="pyarrow"),
                    kcols, "n", nb=nb, out_col="nl")
    rc = sum_by_key(right.map_batches(census, batch_format="pyarrow"),
                    kcols, "n", nb=nb, out_col="nr")
    j = shuffle_hash_join(lc, rc, on=kcols, how="inner", nb=nb)

    def contrib(t: pa.Table) -> pa.Table:
        nl = t.column("nl").to_numpy(zero_copy_only=False)
        nr = t.column("nr").to_numpy(zero_copy_only=False)
        rows = _products_int64_checked(nl, nr)
        key_join = t.column(kcols[0])
        for c in kcols[1:]:
            key_join = pc.binary_join_element_wise(
                key_join, t.column(c), ",")
        kj = key_join.to_numpy(zero_copy_only=False)
        order = np.lexsort((kj, -rows))[:top]
        # top keys ride as LIST columns (a key string may itself
        # contain '|' — never re-parse a joined display string)
        return pa.table({
            "est": pa.array([int(rows.sum())], pa.int64()),
            "nk": pa.array([len(rows)], pa.int64()),
            "mx": pa.array([int(rows.max()) if len(rows) else 0],
                           pa.int64()),
            "top_k": pa.array([[kj[i] for i in order]],
                              pa.list_(pa.string())),
            "top_n": pa.array([[int(rows[i]) for i in order]],
                              pa.list_(pa.int64()))})

    parts = [r for r in j.map_batches(
        contrib, batch_format="pyarrow").take_all()]
    est = sum(int(r["est"]) for r in parts)
    if est > 2 ** 63 - 1:
        raise ValueError(
            "join_cardinality_estimate: estimated join cardinality "
            "exceeds int64 — the join is unaffordable as keyed")
    nk = sum(r["nk"] for r in parts)
    cand = []
    for r in parts:
        cand.extend(zip((int(x) for x in r["top_n"]), r["top_k"]))
    cand.sort(key=lambda x: (-x[0], x[1]))
    return pa.table({
        "est_rows": pa.array([est], pa.int64()),
        "n_common_keys": pa.array([nk], pa.int64()),
        "max_key_rows": pa.array(
            [max((r["mx"] for r in parts), default=0)], pa.int64()),
        "top_keys": pa.array(
            ["|".join(f"{k}:{n}" for n, k in cand[:top])],
            pa.string())})


class AllenPairOverflow(RuntimeError):
    """A single key's interval-pair cross product exceeded the bound —
    classifying Allen relations is inherently per-key quadratic, so a
    hot key must fail loudly instead of OOMing the bucket."""


def allen_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    l_id: str,
    r_id: str,
    lo: str = "lo",
    hi: str = "hi",
    max_gap: "int | float" = 0,
    nb: int = 32,
    max_pairs_per_bucket: int = 5_000_000,
) -> "ray.data.Dataset":
    """Allen interval-algebra join (Allen 1983, public): classify
    every same-key interval pair into one of the 13 temporal
    relations — the KG temporal-QA primitive behind "did fact A's
    validity overlap / abut / contain fact B's?". Disjoint pairs are
    only emitted while their gap is ≤ ``max_gap`` (``before``/
    ``after``); beyond that the pair is dropped, which is what keeps
    the operator affordable — unbounded "before" is all-pairs.

    Relations (X = left, Y = right): equals, starts, started_by,
    finishes, finished_by, meets, met_by, overlaps, overlapped_by,
    during, contains, before, after — evaluated in that order, which
    resolves zero-length-interval ambiguity deterministically.

    Scale shape: ONE key-bucket co-location shuffle; per bucket a
    fully vectorized two-sided run expansion (repeat/ordinal
    arithmetic — no per-key Python) builds the same-key pairs, one
    ``np.select`` classifies them. Per-key pair volume is guarded by
    ``max_pairs_per_bucket`` (typed ``AllenPairOverflow``). Null
    keys/bounds and NaN bounds match nothing (SQL join semantics —
    a NaN interval satisfies no relation); ``lo > hi``
    raises. Bounds may be ints, floats or timestamps; comparisons run
    in float64, exact for ints/µs-timestamps up to 2^53 (year ~2255).
    Output: ``(key, l_id, r_id, l_lo, l_hi, r_lo, r_hi, relation)``."""

    def _prep(side: int, idc: str):
        def f(t: pa.Table) -> pa.Table:
            k, a, b = t.column(key), t.column(lo), t.column(hi)
            ok = pc.and_(pc.and_(pc.is_valid(k), pc.is_valid(a)),
                         pc.is_valid(b))
            # NaN bounds classify as nothing — treat like null
            # (they'd satisfy no relation arm and leak a '?' row)
            for col in (a, b):
                if pa.types.is_floating(col.type):
                    ok = pc.and_(ok, pc.invert(pc.fill_null(
                        pc.is_nan(col), False)))
            bad = pc.any(pc.and_(ok, pc.greater(a, b))).as_py()
            if bad:
                raise ValueError("allen_join: interval with lo > hi")
            if pa.types.is_temporal(a.type):
                a = pc.cast(a, pa.int64())
                b = pc.cast(b, pa.int64())
            out = pa.table({
                key: pc.cast(k, pa.string()),
                "__id": pc.cast(t.column(idc), pa.string()),
                "__lo": pc.cast(a, pa.float64(), safe=False),
                "__hi": pc.cast(b, pa.float64(), safe=False),
                "__side": pa.array(
                    np.full(t.num_rows, side, np.int8))}).filter(ok)
            return _add_bucket(out, [key], nb)

        return f

    both = (left.map_batches(_prep(0, l_id), batch_format="pyarrow")
            .union(right.map_batches(_prep(1, r_id),
                                     batch_format="pyarrow")))

    rel_names = np.array([
        "equals", "starts", "started_by", "finishes", "finished_by",
        "meets", "met_by", "overlaps", "overlapped_by", "during",
        "contains", "before", "after", "?"])

    out_schema = pa.schema([
        pa.field(key, pa.string()), pa.field("l_id", pa.string()),
        pa.field("r_id", pa.string()), pa.field("l_lo", pa.float64()),
        pa.field("l_hi", pa.float64()), pa.field("r_lo", pa.float64()),
        pa.field("r_hi", pa.float64()),
        pa.field("relation", pa.string())])

    def finish(g: pa.Table) -> pa.Table:
        g = g.sort_by([(key, "ascending"), ("__side", "ascending"),
                       ("__id", "ascending")])
        ks = g.column(key).to_pandas().to_numpy()
        side = g.column("__side").to_numpy(zero_copy_only=False)
        L = np.flatnonzero(side == 0)
        R = np.flatnonzero(side == 1)
        if len(L) == 0 or len(R) == 0:
            return out_schema.empty_table()
        lk, rk = ks[L], ks[R]
        # common keys via sorted merge
        uk_l, lstart, lcnt = np.unique(
            lk, return_index=True, return_counts=True)
        uk_r, rstart, rcnt = np.unique(
            rk, return_index=True, return_counts=True)
        common, il, ir = np.intersect1d(
            uk_l, uk_r, return_indices=True)
        if len(common) == 0:
            return out_schema.empty_table()
        a, b = lcnt[il], rcnt[ir]
        m = a * b
        M = int(m.sum())
        if M > max_pairs_per_bucket:
            raise AllenPairOverflow(
                f"allen_join: {M} same-key pairs in one bucket "
                f"(> {max_pairs_per_bucket}); raise nb or filter "
                "hot keys first")
        kid = np.repeat(np.arange(len(common)), m)
        o = np.arange(M) - np.repeat(np.r_[0, np.cumsum(m)[:-1]], m)
        li = L[lstart[il][kid] + o // b[kid]]
        ri = R[rstart[ir][kid] + o % b[kid]]
        glo = g.column("__lo").to_numpy(zero_copy_only=False)
        ghi = g.column("__hi").to_numpy(zero_copy_only=False)
        xs, xe = glo[li].astype(np.float64), ghi[li].astype(np.float64)
        ys, ye = glo[ri].astype(np.float64), ghi[ri].astype(np.float64)
        rel = np.select(
            [
                (xs == ys) & (xe == ye),
                (xs == ys) & (xe < ye),
                (xs == ys) & (xe > ye),
                (xe == ye) & (xs > ys),
                (xe == ye) & (xs < ys),
                xe == ys,
                ye == xs,
                (xs < ys) & (ys < xe) & (xe < ye),
                (ys < xs) & (xs < ye) & (ye < xe),
                (xs > ys) & (xe < ye),
                (xs < ys) & (xe > ye),
                xe < ys,
                ye < xs,
            ],
            np.arange(13), default=13)
        keep = np.ones(M, bool)
        keep[rel == 11] = (ys - xe)[rel == 11] <= max_gap
        keep[rel == 12] = (xs - ye)[rel == 12] <= max_gap
        ids = g.column("__id").to_pandas().to_numpy()
        return pa.table({
            key: pa.array(ks[li][keep]),
            "l_id": pa.array(ids[li][keep]),
            "r_id": pa.array(ids[ri][keep]),
            "l_lo": pa.array(xs[keep]), "l_hi": pa.array(xe[keep]),
            "r_lo": pa.array(ys[keep]), "r_hi": pa.array(ye[keep]),
            "relation": pa.array(rel_names[rel[keep]])})

    return both.groupby(_B).map_groups(finish, batch_format="pyarrow")
