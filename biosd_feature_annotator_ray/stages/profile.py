"""Distributed table profiling — the ``df.describe()`` of the engine.

One row per column: row count, null count, exact distinct count, and
numeric min/max (timestamps as epoch microseconds, strings/binary get
null min/max). SQL-twin semantics throughout: ``n_distinct`` excludes
nulls, exactly like ``count(DISTINCT col)``.

Scale shape: two streaming passes over a column-pruned read.
  1. stats — one partial row per (batch, column); only |cols| rows per
     batch enter the tiny groupby reduce.
  2. distinct — per-batch-unique ``(col, vh)`` value hashes through
     ONE bucket-shuffle exact dedup, then a |cols|-row count. Value
     identity travels as the native 64-bit value (ints/timestamps) or
     a stable string hash — never through a lossy float canonicalization
     (epoch-microsecond timestamps exceed 2^53, where a float64 round
     trip would merge distinct values and undercount).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .canonicalize import dedup_exact


def _numeric_view(arr: pa.ChunkedArray | pa.Array) -> np.ndarray | None:
    """Column → float64 values for min/max (NaN for nulls), or None
    when the type has no numeric order (string/binary)."""
    import pyarrow.compute as pc

    t = arr.type
    if pa.types.is_timestamp(t):
        arr = pc.cast(arr, pa.int64(), safe=False)
    elif not (pa.types.is_integer(t) or pa.types.is_floating(t)
              or pa.types.is_boolean(t)):
        return None
    return pc.cast(arr, pa.float64(), safe=False).to_numpy(zero_copy_only=False)


def _value_hashes(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable non-null value identities as int64 (exact for ints and
    timestamps, bit pattern for floats, pandas hash for strings)."""
    import pyarrow.compute as pc

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    arr = arr.drop_null()
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_integer(t) or pa.types.is_boolean(t):
        return pc.cast(arr, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
    if pa.types.is_floating(t):
        return pc.cast(arr, pa.float64(), safe=False).to_numpy(
            zero_copy_only=False).view(np.int64)
    return pd.util.hash_pandas_object(
        arr.to_pandas().astype(str), index=False).to_numpy().view(np.int64)


def profile_table(ds: "object", columns: list[str]) -> pa.Table:
    """Profile ``columns`` of a Dataset; returns the small result table
    ``col, n_rows, n_null, n_distinct, min_val, max_val``."""
    from ray.data.aggregate import Count, Max, Min, Sum

    cols = list(columns)

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "n_null": [], "min_v": [], "max_v": []}
        for c in cols:
            arr = batch.column(c)
            rows["col"].append(c)
            rows["n"].append(len(arr))
            rows["n_null"].append(arr.null_count)
            v = _numeric_view(arr)
            if v is None or np.isnan(v).all():
                rows["min_v"].append(None)
                rows["max_v"].append(None)
            else:
                rows["min_v"].append(float(np.nanmin(v)))
                rows["max_v"].append(float(np.nanmax(v)))
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_null": pa.array(rows["n_null"], pa.int64()),
            "min_v": pa.array(rows["min_v"], pa.float64()),
            "max_v": pa.array(rows["max_v"], pa.float64()),
        })

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("col")
             .aggregate(Sum("n", alias_name="n_rows"),
                        Sum("n_null", alias_name="n_null"),
                        Min("min_v", alias_name="min_val"),
                        Max("max_v", alias_name="max_val"))
             .to_pandas())

    def distinct_partial(batch: pa.Table) -> pa.Table:
        names: list[str] = []
        hashes: list[np.ndarray] = []
        for c in cols:
            u = np.unique(_value_hashes(batch.column(c)))
            names.extend([c] * len(u))
            hashes.append(u)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "vh": pa.array(np.concatenate(hashes) if hashes
                           else np.empty(0, np.int64)),
        })

    distinct = (dedup_exact(ds.map_batches(distinct_partial,
                                           batch_format="pyarrow",
                                           batch_size=65536),
                            ["col", "vh"], nb=16)
                .groupby("col")
                .aggregate(Count(alias_name="n_distinct"))
                .to_pandas())

    out = stats.merge(distinct, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out = out[["col", "n_rows", "n_null", "n_distinct", "min_val", "max_val"]]
    out = out.sort_values("col").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def inclusion_profile(
    l_ds: "object", l_col: str,
    r_ds: "object", r_col: str,
    nb: int = 64,
) -> pa.Table:
    """Inclusion-dependency (foreign-key candidate) profile: how much
    of the DISTINCT non-null left column is contained in the distinct
    right column — the schema-induction primitive that discovers FK
    edges between extracted web tables before stitching them into a
    KG. ``containment = |L ∩ R| / |L|`` (1.0 ⇒ L ⊆ R, a valid FK).

    Scale shape: each side reduces to per-batch-distinct values
    map-side (the shuffle carries distinct candidates, never raw
    rows), the union bucket-shuffles ONCE on the value, and each
    bucket emits a 3-int partial (distinct-left / distinct-right /
    overlap counts); only ``nb`` tiny rows reach the driver. Values
    are compared by their Arrow cast-to-string form (injective for
    ints and strings — document non-injectivity before using float
    keys). Nulls are excluded on both sides, matching SQL ``IN``
    pruning of null probes.

    Returns a 1-row table ``n_left, n_right, n_overlap, containment``
    (containment is null when the left side has no non-null values).
    """
    import pyarrow.compute as pc

    from .canonicalize import _add_bucket, _B

    def _prep(col: str, side: int):
        def f(batch: pa.Table) -> pa.Table:
            v = pc.cast(batch.column(col), pa.string())
            u = pc.unique(v.combine_chunks()
                          if isinstance(v, pa.ChunkedArray) else v)
            u = u.drop_null()
            t = pa.table({
                "v": u,
                "is_l": pa.array(
                    np.full(len(u), 1 - side, np.int8)),
                "is_r": pa.array(np.full(len(u), side, np.int8)),
            })
            return _add_bucket(t, ["v"], nb)
        return f

    both = (l_ds.map_batches(_prep(l_col, 0), batch_format="pyarrow",
                             batch_size=65536)
            .union(r_ds.map_batches(_prep(r_col, 1),
                                    batch_format="pyarrow",
                                    batch_size=65536)))

    def finish(g: pa.Table) -> pa.Table:
        t = (g.drop_columns([_B])
             .group_by(["v"])
             .aggregate([("is_l", "max"), ("is_r", "max")]))
        in_l = t.column("is_l_max").to_numpy(zero_copy_only=False) == 1
        in_r = t.column("is_r_max").to_numpy(zero_copy_only=False) == 1
        return pa.table({
            "n_l": pa.array([int(in_l.sum())], pa.int64()),
            "n_r": pa.array([int(in_r.sum())], pa.int64()),
            "n_both": pa.array([int((in_l & in_r).sum())], pa.int64()),
        })

    parts = both.groupby(_B).map_groups(
        finish, batch_format="pyarrow").to_pandas()
    n_l = int(parts["n_l"].sum())
    n_r = int(parts["n_r"].sum())
    n_both = int(parts["n_both"].sum())
    cont = round(n_both / n_l, 6) if n_l else None
    return pa.table({
        "n_left": pa.array([n_l], pa.int64()),
        "n_right": pa.array([n_r], pa.int64()),
        "n_overlap": pa.array([n_both], pa.int64()),
        "containment": pa.array([cont], pa.float64()),
    })


def candidate_keys(
    ds: "object",
    column_sets: "list[list[str]]",
    nb: int = 64,
) -> pa.Table:
    """Candidate-key discovery: for each column set, does it uniquely
    identify rows? The other half of schema induction over extracted
    web tables (``inclusion_profile`` finds the FK side; this finds
    the PK side).

    Per set: total rows, rows with ANY null in the set, distinct
    complete (all-non-null) tuples — ``is_key = 1`` iff there are no
    null rows and every tuple is distinct (the SQL PRIMARY KEY
    contract; SQL UNIQUE would permit the nulls).

    Scale shape: one column-pruned pass for the row/null census plus
    one exact bucket-shuffled dedup per set over only the set's
    columns (``dedup_exact`` — distinct tuples travel, never payloads).
    """
    import pyarrow.compute as pc

    rows = []
    for cols in column_sets:
        cols = list(cols)
        sub = ds.select_columns(cols)

        def census(batch: pa.Table, _cols=tuple(cols)) -> pa.Table:
            any_null = pc.is_null(batch.column(_cols[0]))
            for c in _cols[1:]:
                any_null = pc.or_(any_null, pc.is_null(batch.column(c)))
            nn = int(pc.sum(pc.cast(any_null, pa.int64())).as_py() or 0)
            return pa.table({
                "n": pa.array([len(batch)], pa.int64()),
                "n_null": pa.array([nn], pa.int64()),
            })

        cens = sub.map_batches(census, batch_format="pyarrow",
                               batch_size=65536).to_pandas()
        n_rows = int(cens["n"].sum())
        n_null_rows = int(cens["n_null"].sum())

        def drop_nulls(batch: pa.Table, _cols=tuple(cols)) -> pa.Table:
            return batch.drop_null()

        n_distinct = dedup_exact(
            sub.map_batches(drop_nulls, batch_format="pyarrow",
                            batch_size=65536),
            cols, nb=nb).count()
        rows.append({
            "cols": ",".join(cols),
            "n_rows": n_rows,
            "n_null_rows": n_null_rows,
            "n_distinct": n_distinct,
            "is_key": int(n_null_rows == 0 and n_distinct == n_rows),
        })
    out = pd.DataFrame(rows).sort_values("cols").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def inclusion_matrix(
    l_ds: "object", l_cols: "list[str]",
    r_ds: "object", r_cols: "list[str]",
    nb: int = 64,
) -> pa.Table:
    """All-pairs inclusion-dependency matrix — schema matching between
    two extracted tables in ONE shuffle instead of |L|×|R| calls to
    :func:`inclusion_profile`. For every (left column, right column)
    pair: distinct counts, overlap, containment.

    Scale shape: each batch emits per-column DISTINCT values tagged
    with a single-bit column mask (≤ 63 columns per side; values
    compared by Arrow cast-to-string, nulls dropped). ONE bucket
    shuffle on the value; each bucket ORs the masks per value
    (numpy ``bitwise_or.reduceat`` over the sorted run), builds the
    presence bit-matrices and computes ALL pairwise overlaps as one
    integer matmul (``L.T @ R``) — emitting |L|×|R|+|L|+|R| partial
    counter rows, never values. The driver sums ``nb`` tiny partials.
    """
    import pyarrow.compute as pc

    from .canonicalize import _add_bucket, _B

    if len(l_cols) > 63 or len(r_cols) > 63:
        raise ValueError("inclusion_matrix supports at most 63 columns per side")
    nl, nr = len(l_cols), len(r_cols)

    def _prep(cols: "list[str]", side: int):
        def f(batch: pa.Table) -> pa.Table:
            vs, lm, rm = [], [], []
            for i, c in enumerate(cols):
                v = pc.cast(batch.column(c), pa.string())
                u = pc.unique(v.combine_chunks()
                              if isinstance(v, pa.ChunkedArray) else v)
                u = u.drop_null()
                vs.append(u)
                bit = np.uint64(1) << np.uint64(i)
                m = np.full(len(u), bit if side == 0 else 0, np.uint64)
                o = np.full(len(u), bit if side == 1 else 0, np.uint64)
                lm.append(m)
                rm.append(o)
            t = pa.table({
                "v": pa.concat_arrays(vs) if vs else pa.array([], pa.string()),
                "lmask": pa.array(np.concatenate(lm) if lm else
                                  np.array([], np.uint64), pa.uint64()),
                "rmask": pa.array(np.concatenate(rm) if rm else
                                  np.array([], np.uint64), pa.uint64()),
            })
            return _add_bucket(t, ["v"], nb)
        return f

    both = (l_ds.map_batches(_prep(l_cols, 0), batch_format="pyarrow",
                             batch_size=65536)
            .union(r_ds.map_batches(_prep(r_cols, 1),
                                    batch_format="pyarrow",
                                    batch_size=65536)))

    def finish(g: pa.Table) -> pa.Table:
        v = g.column("v").to_numpy(zero_copy_only=False)
        lmask = g.column("lmask").to_numpy(zero_copy_only=False)
        rmask = g.column("rmask").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v = v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], v[1:] != v[:-1])))
        lm = np.bitwise_or.reduceat(lmask[order], starts)
        rm = np.bitwise_or.reduceat(rmask[order], starts)
        lmat = ((lm[:, None] >> np.arange(nl, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        rmat = ((rm[:, None] >> np.arange(nr, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        overlap = lmat.T @ rmat                      # nl × nr
        ii, jj = np.meshgrid(np.arange(nl), np.arange(nr),
                             indexing="ij")
        rows_i = np.concatenate([ii.ravel(), np.arange(nl),
                                 np.full(nr, -1)])
        rows_j = np.concatenate([jj.ravel(), np.full(nl, -1),
                                 np.arange(nr)])
        rows_n = np.concatenate([overlap.ravel(), lmat.sum(0),
                                 rmat.sum(0)])
        return pa.table({
            "i": pa.array(rows_i, pa.int64()),
            "j": pa.array(rows_j, pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
        })

    parts = (both.groupby(_B).map_groups(finish, batch_format="pyarrow")
             .to_pandas())
    agg = parts.groupby(["i", "j"], as_index=False)["n"].sum()
    n_l = {int(r.i): int(r.n) for r in
           agg[(agg.j == -1) & (agg.i >= 0)].itertuples()}
    n_r = {int(r.j): int(r.n) for r in
           agg[(agg.i == -1) & (agg.j >= 0)].itertuples()}
    ov = {(int(r.i), int(r.j)): int(r.n) for r in
          agg[(agg.i >= 0) & (agg.j >= 0)].itertuples()}
    out = []
    for i, lc in enumerate(l_cols):
        for j, rc in enumerate(r_cols):
            a = n_l.get(i, 0)
            o = ov.get((i, j), 0)
            out.append({
                "l_col": lc, "r_col": rc,
                "n_left": a, "n_right": n_r.get(j, 0),
                "n_overlap": o,
                "containment": round(o / a, 6) if a else None,
            })
    df = (pd.DataFrame(out).sort_values(["l_col", "r_col"])
          .reset_index(drop=True))
    return pa.Table.from_pandas(df, preserve_index=False)


def fd_violations(
    ds: "object",
    det_col: str,
    dep_col: str,
    nb: int = 16,
) -> pa.Table:
    """Approximate functional-dependency check det → dep — the schema
    QA probe behind "is predicate P single-valued per subject?" /
    "does url determine lang?": confidence is the g3-style measure

        conf = (Σ_det max_dep count) / n

    i.e. the fraction of rows kept if every determinant group were
    forced to its majority dependent; ``violations = n − kept``. An
    exact FD has conf = 1. Null determinants and null dependents are
    each their own value (SQL GROUP BY semantics). Scale shape: ONE
    composite (det, dep) census (map-side combined), a per-det argmax
    over census rows, and a scalar reduce — the data never moves.
    Returns ONE row ``(n, n_det, violations, confidence)``."""
    import pyarrow.compute as pc

    from .canonicalize import groupby_argmax, sum_by_key

    def census(t: pa.Table) -> pa.Table:
        out = pa.table({
            "det": pc.cast(t.column(det_col), pa.string()),
            "dep": pc.cast(t.column(dep_col), pa.string())})
        return out.append_column(
            "n", pa.array(np.ones(out.num_rows, np.int64)))

    cen = sum_by_key(
        ds.map_batches(census, batch_format="pyarrow"),
        ["det", "dep"], "n", nb=nb).materialize()
    best = groupby_argmax(cen, ["det"], ["n"], [False], nb=nb)
    kept = 0
    n_det = 0
    for b in best.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b
        kept += int(pc.sum(t.column("n")).as_py() or 0)
        n_det += t.num_rows
    n = 0
    for b in cen.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b
        n += int(pc.sum(t.column("n")).as_py() or 0)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "n_det": pa.array([n_det], pa.int64()),
        "violations": pa.array([n - kept], pa.int64()),
        "confidence": pa.array(
            [round(kept / n, 6) if n else None], pa.float64())})


def expectations_report(
    ds: "object",
    expectations: "list[dict]",
    nb: int = 16,
) -> pa.Table:
    """dbt-style declarative data-quality gate — validate a table
    against a list of expectations and report violations per rule
    (the ingestion contract check every production pipeline runs
    before accepting a crawl/shard):

      {"rule": "not_null",        "col": c}
      {"rule": "unique",          "col": c}           (nulls exempt)
      {"rule": "accepted_values", "col": c, "values": [...]}
      {"rule": "in_range",        "col": c, "lo": x, "hi": y}
                                  (nulls exempt; bounds inclusive)

    Scale shape: not_null / accepted_values / in_range are ONE
    stateless counting pass over the needed columns (all rules share
    it); unique needs the per-value census, so ONE dedup-count
    shuffle per unique-rule column. Output: one row per expectation
    ``(rule, col, n_checked, violations, ok)``, rule order preserved.
    """
    import pyarrow.compute as pc

    from .canonicalize import sum_by_key

    for e in expectations:
        if e["rule"] not in ("not_null", "unique", "accepted_values",
                             "in_range"):
            raise ValueError(f"unknown rule {e['rule']!r}")

    scan_rules = [e for e in expectations if e["rule"] != "unique"]
    uniq_rules = [(i, e) for i, e in enumerate(expectations)
                  if e["rule"] == "unique"]

    def scan(t: pa.Table) -> pa.Table:
        rows = {"idx": [], "n": [], "bad": []}
        for i, e in enumerate(expectations):
            if e["rule"] == "unique":
                continue
            col = t.column(e["col"])
            if e["rule"] == "not_null":
                n = len(col)
                bad = int(pc.sum(pc.cast(pc.is_null(col),
                                         pa.int64())).as_py() or 0)
            elif e["rule"] == "accepted_values":
                ok = pc.is_in(col, value_set=pa.array(
                    e["values"], col.type))
                valid = pc.is_valid(col)
                n = int(pc.sum(pc.cast(valid, pa.int64())).as_py()
                        or 0)
                bad = n - int(pc.sum(pc.cast(
                    pc.and_(ok, valid), pa.int64())).as_py() or 0)
            else:  # in_range
                valid = pc.is_valid(col)
                ok = pc.and_(pc.greater_equal(col, e["lo"]),
                             pc.less_equal(col, e["hi"]))
                n = int(pc.sum(pc.cast(valid, pa.int64())).as_py()
                        or 0)
                bad = n - int(pc.sum(pc.cast(
                    pc.fill_null(ok, False), pa.int64())).as_py()
                    or 0)
            rows["idx"].append(i)
            rows["n"].append(n)
            rows["bad"].append(bad)
        return pa.table({
            "idx": pa.array(rows["idx"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "bad": pa.array(rows["bad"], pa.int64())})

    totals: dict[int, list[int]] = {
        i: [0, 0] for i in range(len(expectations))}
    if scan_rules:
        for r in ds.map_batches(
                scan, batch_format="pyarrow").take_all():
            totals[r["idx"]][0] += r["n"]
            totals[r["idx"]][1] += r["bad"]
    for i, e in uniq_rules:

        def census(t: pa.Table, c=e["col"]) -> pa.Table:
            col = t.column(c)
            out = pa.table({
                "v": pc.cast(col, pa.string())}).filter(
                    pc.is_valid(col))
            return out.append_column(
                "n", pa.array(np.ones(out.num_rows, np.int64)))

        cen = sum_by_key(
            ds.map_batches(census, batch_format="pyarrow"),
            "v", "n", nb=nb)

        def viol(t: pa.Table) -> pa.Table:
            n = t.column("n").to_numpy(zero_copy_only=False)
            return pa.table({
                "n": pa.array([int(n.sum())], pa.int64()),
                "bad": pa.array([int(n[n > 1].sum())], pa.int64())})

        for r in cen.map_batches(
                viol, batch_format="pyarrow").take_all():
            totals[i][0] += r["n"]
            totals[i][1] += r["bad"]
    return pa.table({
        "rule": pa.array([e["rule"] for e in expectations],
                         pa.string()),
        "col": pa.array([e["col"] for e in expectations],
                        pa.string()),
        "n_checked": pa.array([totals[i][0] for i in
                               range(len(expectations))], pa.int64()),
        "violations": pa.array([totals[i][1] for i in
                                range(len(expectations))],
                               pa.int64()),
        "ok": pa.array([totals[i][1] == 0 for i in
                        range(len(expectations))])})


def zonemap_report(
    data_dir: str,
    col: str,
    lo: "object" = None,
    hi: "object" = None,
) -> pa.Table:
    """Row-group ZONE-MAP effectiveness probe — the storage-layout
    audit behind "did sorting/z-ordering by this key actually buy us
    pruning?": for every ``*.parquet`` file, read ONLY footers
    (metadata, zero data I/O) and report how many row groups a range
    predicate ``lo ≤ col ≤ hi`` would skip via min/max statistics. A
    well-clustered layout prunes most groups; a shuffled one prunes
    none — this makes that measurable before running the real query.
    Either bound may be None (one-sided). Row groups without stats
    count as unprunable (scanned). Output one row per file:
    ``(file, n_rowgroups, n_pruned, n_rows, rows_scanned)`` plus a
    TOTAL row (file = '*')."""
    import os

    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(data_dir)
                   if f.endswith(".parquet"))
    if not files:
        raise ValueError(f"zonemap_report: no parquet in {data_dir}")
    rows = []
    tot = [0, 0, 0, 0]
    for f in files:
        md = pq.read_metadata(os.path.join(data_dir, f))
        # row-group statistics are indexed by parquet LEAF column,
        # not Arrow top-level position — a struct/list column before
        # the probed one would silently shift the index
        leaf_paths = [md.schema.column(i).path
                      for i in range(md.num_columns)]
        if col not in leaf_paths:
            if any(p.startswith(col + ".") for p in leaf_paths):
                raise ValueError(
                    f"zonemap_report: {col!r} is a nested column — "
                    "probe one of its leaves "
                    f"({[p for p in leaf_paths if p.startswith(col + '.')]})")
            raise ValueError(f"zonemap_report: {f} lacks column "
                             f"{col!r}")
        ci = leaf_paths.index(col)
        n_rg = md.num_row_groups
        pruned = scanned_rows = 0
        for g in range(n_rg):
            rg = md.row_group(g)
            st = rg.column(ci).statistics
            skip = False
            if st is not None and st.has_min_max:
                if lo is not None and st.max < lo:
                    skip = True
                if hi is not None and st.min > hi:
                    skip = True
            if skip:
                pruned += 1
            else:
                scanned_rows += rg.num_rows
        rows.append((f, n_rg, pruned, md.num_rows, scanned_rows))
        tot[0] += n_rg
        tot[1] += pruned
        tot[2] += md.num_rows
        tot[3] += scanned_rows
    rows.append(("*", tot[0], tot[1], tot[2], tot[3]))
    return pa.table({
        "file": pa.array([r[0] for r in rows], pa.string()),
        "n_rowgroups": pa.array([r[1] for r in rows], pa.int64()),
        "n_pruned": pa.array([r[2] for r in rows], pa.int64()),
        "n_rows": pa.array([r[3] for r in rows], pa.int64()),
        "rows_scanned": pa.array([r[4] for r in rows], pa.int64())})
