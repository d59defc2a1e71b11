"""Distributed statistics sketches (graft-added training-data ops):
exact quantiles at scale and HyperLogLog approximate count-distinct.

- ``exact_quantile``: percentile_disc semantics (smallest value whose
  cumulative count ≥ ceil(q·n)) computed EXACTLY without a global
  sort: one histogram pass brackets each target rank into a narrow
  value range, then only the in-range values (expected n/n_bins) are
  collected and selected. Skewed bins recurse with a finer histogram
  instead of collecting unbounded rows — every pass is a streaming
  map + small reduce, never an all-to-all sort.
- ``approx_distinct``: classic HLL (2^p registers, stable 64-bit
  hash); per-batch register arrays reduce by elementwise max — one
  pass, constant memory, mergeable across datasets/days. Use where the
  exact ``distinct_counts`` shuffle is too expensive and ±2% is fine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import hash_strings


def _minmax_count(ds: "ray.data.Dataset", col: str) -> tuple[float, float, int]:
    def local(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": [float(v.min())], "mx": [float(v.max())],
                         "n": [int(len(v))]})

    part = ds.map_batches(local, batch_format="pyarrow", batch_size=65536).to_pandas()
    if part.empty or part["n"].sum() == 0:
        return np.nan, np.nan, 0
    return float(part["mn"].min()), float(part["mx"].max()), int(part["n"].sum())


def _hist_counts(ds: "ray.data.Dataset", col: str, lo: float, hi: float,
                 n_bins: int, hi_closed: bool = True) -> np.ndarray:
    """Global histogram counts over [lo, hi] (or [lo, hi) when
    ``hi_closed=False`` — refinement inside an interior, right-open
    bracket). Values outside the range are dropped."""
    edges = np.linspace(lo, hi, n_bins + 1)

    def local(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & ((v <= hi) if hi_closed else (v < hi))]
        idx = np.clip(np.searchsorted(edges, v, side="right") - 1, 0, n_bins - 1)
        c = np.bincount(idx, minlength=n_bins)
        nz = np.flatnonzero(c)
        return pa.table({"bin": pa.array(nz.astype(np.int32)),
                         "cnt": pa.array(c[nz].astype(np.int64))})

    part = ds.map_batches(local, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = np.zeros(n_bins, dtype=np.int64)
    if not part.empty:
        g = part.groupby("bin")["cnt"].sum()
        out[g.index.to_numpy()] = g.to_numpy()
    return out


def exact_quantile(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float],
    n_bins: int = 4096,
    max_collect: int = 1_000_000,
    max_depth: int = 4,
) -> dict[float, float]:
    """Exact percentile_disc(q) per q: the ceil(q·n)-th smallest value.

    The dataset is re-scanned once per histogram level (usually 1) plus
    once per final in-bin collect; each scan is a streaming map with a
    tiny reduce. Deterministic and exactly equal to a full sort's
    answer (pinned by the DuckDB ``quantile_disc`` oracle)."""
    lo, hi, n = _minmax_count(ds, col)
    if n == 0:
        return {q: float("nan") for q in qs}
    # the level-0 histogram over [lo, hi] is identical for every q —
    # compute it once, not once per quantile (each pass scans the data)
    first = _hist_counts(ds, col, lo, hi, n_bins, hi_closed=True)
    return {q: _value_at_rank(ds, col, max(1, int(np.ceil(q * n))), lo, hi,
                              n_bins, max_collect, max_depth, first_counts=first)
            for q in qs}


def _value_at_rank(ds: "ray.data.Dataset", col: str, k: int, lo: float, hi: float,
                   n_bins: int, max_collect: int, max_depth: int,
                   first_counts: "np.ndarray | None" = None) -> float:
    """The k-th smallest value (1-based) via histogram bracketing: each
    level narrows to the bin containing rank k; only the final bin's
    values (expected n/n_bins) are collected and selected.
    ``first_counts``: precomputed level-0 histogram over [lo, hi]
    (shared across quantiles — saves one full scan per extra q)."""
    blo, bhi, below = lo, hi, 0      # `below` = count of values < blo
    closed = True                    # current bracket is [blo, bhi]?
    for level in range(max_depth):
        if blo == bhi:
            break
        if level == 0 and first_counts is not None:
            counts = first_counts
        else:
            counts = _hist_counts(ds, col, blo, bhi, n_bins, hi_closed=closed)
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, k - below, side="left"))
        edges = np.linspace(blo, bhi, n_bins + 1)
        below += int(cum[b - 1]) if b else 0
        closed = closed and (b == n_bins - 1)  # only the top bin stays closed
        blo, bhi = float(edges[b]), float(edges[b + 1])
        if counts[b] <= max_collect:
            break

    def in_range(batch: pa.Table, lo_=blo, hi_=bhi, cl=closed) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        m = (v >= lo_) & ((v <= hi_) if cl else (v < hi_))
        return pa.table({col: pa.array(v[m], pa.float64())})

    vals = ds.map_batches(in_range, batch_format="pyarrow", batch_size=65536).to_pandas()[col]
    vals = np.sort(vals.to_numpy())
    return float(vals[k - below - 1])


def exact_quantile_cont(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float],
    n_bins: int = 4096,
    max_collect: int = 1_000_000,
    max_depth: int = 4,
) -> dict[float, float]:
    """Exact percentile_cont(q): linear interpolation between the two
    order statistics straddling h = (n-1)·q — SQL/DuckDB
    ``quantile_cont`` semantics — using the same histogram-bracket rank
    lookup as ``exact_quantile`` (two rank probes per q, no global
    sort)."""
    lo, hi, n = _minmax_count(ds, col)
    if n == 0:
        return {q: float("nan") for q in qs}
    first = _hist_counts(ds, col, lo, hi, n_bins, hi_closed=True)
    out: dict[float, float] = {}
    for q in qs:
        h = (n - 1) * float(q)
        k0 = int(np.floor(h)) + 1        # 1-based lower rank
        frac = h - np.floor(h)
        v0 = _value_at_rank(ds, col, k0, lo, hi, n_bins, max_collect, max_depth,
                            first_counts=first)
        if frac == 0.0 or k0 >= n:
            out[q] = v0
            continue
        v1 = _value_at_rank(ds, col, k0 + 1, lo, hi, n_bins, max_collect, max_depth,
                            first_counts=first)
        out[q] = v0 + frac * (v1 - v0)
    return out


# ---------------------------------------------------------------------------
def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> int:
    """HyperLogLog count-distinct: 2^p registers (p=12 → ~1.6% std
    error, 4 KiB state). Stable across runs/nodes (pandas 64-bit hash).
    """
    m = 1 << p
    shift = np.uint64(64 - p)
    wmask = np.uint64((1 << (64 - p)) - 1)

    def local(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(col)).astype(np.uint64)
        idx = (h >> shift).astype(np.int64)
        w = h & wmask
        # rho = position of the leftmost 1-bit in the (64-p)-bit suffix
        nbits = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        nbits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = (64 - p) - nbits + 1
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, rho.astype(np.int8))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(local, batch_format="pyarrow", batch_size=65536).to_pandas()
    if parts.empty or "regs" not in parts.columns:
        return 0
    regs = np.zeros(m, dtype=np.int8)
    for b in parts["regs"]:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.int8))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return int(round(est))


def range_partition(
    ds: "ray.data.Dataset",
    col: str,
    num_parts: int,
    out: str = "part",
) -> "ray.data.Dataset":
    """Range partitioner: exact quantile boundaries (num_parts-1 cuts
    from ``exact_quantile`` — no global sort) broadcast once; each row
    is tagged ``out = #boundaries < value`` with one vectorized
    searchsorted. This is the partitioner behind range-partitioned
    parquet layouts / sort-based range joins: partition p holds
    values in (b_{p-1}, b_p], partitions are contiguous and balanced
    by construction."""
    import ray as _ray

    qs = [i / num_parts for i in range(1, num_parts)]
    b = exact_quantile(ds, col, qs)
    bnd = np.array([b[q] for q in qs], dtype=np.float64)
    ref = _ray.put(bnd)

    def tag(batch: pa.Table) -> pa.Table:
        import ray as _r

        edges = _r.get(ref)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        part = np.searchsorted(edges, v, side="left").astype(np.int32)
        return batch.append_column(out, pa.array(part))

    return ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)


def fixed_width_histogram(
    ds: "ray.data.Dataset",
    col: str,
    bin_width: float = 10.0,
) -> "ray.data.Dataset":
    """Fixed-width value histogram: bin = floor(value / bin_width),
    exact counts. Map-side bincount collapses each batch to ≤ one row
    per occupied bin before the (tiny) Sum groupby — the classic
    distribution-profile op over a fact column. Nulls/NaNs dropped."""
    from ray.data.aggregate import Sum

    def local(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.floor(v / bin_width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    return (
        ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
        .groupby("bin")
        .aggregate(Sum("cnt", alias_name="n"))
    )


def count_min_heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 10,
    width_bits: int = 16,
    depth: int = 4,
    candidate_cap: int = 4096,
) -> pa.Table:
    """Approximate heavy hitters via a Count-Min sketch: per-batch
    partial sketches (depth × 2^width_bits uint64 counters) merge by
    ELEMENTWISE SUM — constant-size state regardless of cardinality,
    same mergeable-sketch shape as the HLL. Candidate values are the
    per-batch local top (≤ candidate_cap per batch, exact within the
    batch); final counts are CMS point queries (min over rows), which
    NEVER under-count — a true heavy hitter cannot be displaced by an
    estimation error, only joined by an over-counted rival.

    Returns (value, approx_count) for the top k, count desc / value asc.
    Use ``distinct_counts`` when exact counts are worth the shuffle."""
    from ..functions.hashing import hash_strings

    W = 1 << width_bits
    mask = np.uint64(W - 1)
    salts = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pandas().astype(str)
        h = pd.util.hash_pandas_object(vals, index=False).to_numpy()
        sketch = np.zeros((depth, W), dtype=np.int64)
        with np.errstate(over="ignore"):
            for d in range(depth):
                idx = ((h * salts[d]) & mask).astype(np.int64)
                np.add.at(sketch[d], idx, 1)
        vc = vals.value_counts().head(candidate_cap)
        # counters ship as raw bytes — a list column with nulls trips
        # Ray's tensor-extension casting in to_pandas
        rows_sk = pa.table({
            "kind": pa.array(np.zeros(depth, np.int8)),
            "row": pa.array(np.arange(depth, dtype=np.int32)),
            "counters": pa.array([sketch[d].tobytes() for d in range(depth)], pa.binary()),
            "value": pa.nulls(depth, pa.string()),
            "cnt": pa.nulls(depth, pa.int64()),
        })
        rows_cand = pa.table({
            "kind": pa.array(np.ones(len(vc), np.int8)),
            "row": pa.array(np.full(len(vc), -1, np.int32)),
            "counters": pa.nulls(len(vc), pa.binary()),
            "value": pa.array(vc.index.to_numpy(), pa.string()),
            "cnt": pa.array(vc.to_numpy().astype(np.int64)),
        })
        return pa.concat_tables([rows_sk, rows_cand])

    part = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    sketch = np.zeros((depth, W), dtype=np.int64)
    for _, r in part[part["kind"] == 0].iterrows():
        sketch[int(r["row"])] += np.frombuffer(r["counters"], dtype=np.int64)
    cands = (part[part["kind"] == 1].groupby("value")["cnt"].sum()
             .sort_values(ascending=False).head(candidate_cap))
    if not len(cands):
        return pa.table({"value": pa.array([], pa.string()),
                         "approx_count": pa.array([], pa.int64())})
    vals = pd.Series(cands.index)
    h = pd.util.hash_pandas_object(vals, index=False).to_numpy()
    with np.errstate(over="ignore"):
        est = np.min(np.stack([
            sketch[d][((h * salts[d]) & mask).astype(np.int64)] for d in range(depth)
        ]), axis=0)
    out = pd.DataFrame({"value": vals.to_numpy(), "approx_count": est})
    out = out.sort_values(["approx_count", "value"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    return pa.table({"value": pa.array(out["value"], pa.string()),
                     "approx_count": pa.array(out["approx_count"].to_numpy(), pa.int64())})


def recommend_hot_keys(
    ds: "ray.data.Dataset",
    col: str,
    sample_rows: int = 65536,
    hot_share: float = 0.05,
    k: int = 16,
) -> list:
    """Skew probe for the salted join: CMS heavy hitters over a bounded
    sample (streaming ``limit`` — no shuffle, constant sketch state),
    returning the ORIGINAL key values whose sampled share exceeds
    ``hot_share``. Feed the result to
    ``shuffle_hash_join(hot_keys=..., salt=...)`` — the sketch-driven
    analog of ``canonicalize.recommend_salt``."""
    sample = ds.limit(sample_rows).materialize()
    n = sample.count()
    if n == 0:
        return []
    top = count_min_heavy_hitters(sample, col, k=k).to_pandas()
    hot_strs = set(top.loc[top["approx_count"] >= hot_share * n, "value"])
    if not hot_strs:
        return []
    # map back from the sketch's string domain to original values
    vals = pd.Series(sample.select_columns([col]).to_pandas()[col].unique())
    return vals[vals.astype(str).isin(hot_strs)].tolist()


def weighted_sample(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
) -> "ray.data.Dataset":
    """Weighted sampling without replacement, P(selected) ∝ weight —
    the Efraimidis–Spirakis A-ES scheme made DETERMINISTIC (and thus
    resumable + cross-system reproducible): the per-row uniform draw is
    ``u = (md5(id)[:8] + 0.5) / 2^32`` instead of an RNG, the A-ES key
    is ``-ln(u) / w`` and the sample is the k SMALLEST keys.

    Scale shape: each batch keeps only its local k smallest (map-side
    combine), so the final sort+limit sees ≤ k·n_blocks partial rows —
    never the fact table. Rows with weight ≤ 0 or null are excluded.
    """
    from ..functions.hashing import md5_u32

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        h = md5_u32(ids).astype(np.float64)
        u = (h + 0.5) / 4294967296.0
        with np.errstate(divide="ignore", invalid="ignore"):
            key = -np.log(u) / w
        ok = np.isfinite(key) & (w > 0)
        t = batch.append_column("_aes_key", pa.array(key))
        t = t.filter(pa.array(ok))
        if len(t) > k:
            order = np.argsort(
                t.column("_aes_key").to_numpy(zero_copy_only=False),
                kind="stable")[:k]
            t = t.take(pa.array(order))
        return t

    return (ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=65536)
            .sort("_aes_key").limit(k).drop_columns(["_aes_key"]))


MERSENNE61 = (1 << 61) - 1


def table_fingerprint(ds: "ray.data.Dataset", col: str,
                      mod: int = MERSENNE61) -> tuple[int, int]:
    """Order-insensitive dataset checksum: (Σ md5_u32(value) mod 2^61−1,
    row count). Cross-system deterministic — the same md5 recipe the
    train/test splitter pins against DuckDB — so two engines (or two
    runs of a resumable sink) can cheaply agree a materialized table is
    identical without sorting or shipping it. Map-side per-batch
    partial sums; the driver folds one tiny row per batch."""
    from ..functions.hashing import md5_u32

    def partial(batch: pa.Table) -> pa.Table:
        h = md5_u32(batch.column(col).to_pylist())
        return pa.table({"s": pa.array([int(h.sum()) % mod], pa.int64()),
                         "n": pa.array([len(h)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    # Fold with Python ints: each partial is < mod (≈2^61), so a pandas
    # int64 sum would silently wrap past ~4 partials' worth of headroom
    # on a billion-row table — exactly the false-"tables differ" failure
    # this checksum exists to rule out.
    s = 0
    for v in parts["s"]:
        s = (s + int(v)) % mod
    return s, int(parts["n"].sum())


def histogram(
    ds: "ray.data.Dataset",
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> "ray.data.Dataset":
    """Fixed-width histogram: bin i counts rows with
    lo + i·w ≤ x < lo + (i+1)·w, w = (hi−lo)/nbins; rows outside
    [lo, hi) are excluded. Exact-int and cross-engine deterministic:
    the bin index is the same float64 ``floor((x−lo)/w)`` a SQL engine
    computes. Per-batch ``np.bincount`` partials (one nbins-long row
    per batch), ONE tiny groupby-sum — the row stream never shuffles.
    Empty bins are emitted with n=0 (fixed output cardinality)."""
    from ray.data.aggregate import Sum

    w = (float(hi) - float(lo)) / int(nbins)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        x = x[(x >= lo) & (x < hi)]
        b = np.floor((x - lo) / w).astype(np.int64)
        # guard the hi-edge float artifact: floor can hit nbins when
        # (x-lo)/w rounds up at the boundary
        b = np.minimum(b, nbins - 1)
        c = np.bincount(b, minlength=nbins)
        return pa.table({"bin": pa.array(np.arange(nbins, dtype=np.int64)),
                         "n_part": pa.array(c.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("bin").aggregate(Sum("n_part", alias_name="n")))


def grouped_corr(
    ds: "ray.data.Dataset",
    key_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 4,
) -> "ray.data.Dataset":
    """Pearson correlation of (x, y) per key from the six sufficient
    statistics (n, Σx, Σy, Σxx, Σyy, Σxy) — map-side per-key partials,
    ONE groupby-sum of six doubles per key, driver-free finisher.
    Matches SQL ``corr()`` (sample correlation); rows where either side
    is null are skipped; groups with < 2 rows or zero variance yield
    null, like SQL."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, x_col, y_col]).to_pandas()
        # keep every GROUP even when all its rows have a null side
        # (SQL corr() emits the group with NULL) — null rows contribute
        # zeros and don't count toward n
        valid = (df[x_col].notna() & df[y_col].notna()).to_numpy()
        x = np.where(valid, df[x_col].to_numpy(dtype=np.float64,
                                               na_value=0.0), 0.0)
        y = np.where(valid, df[y_col].to_numpy(dtype=np.float64,
                                               na_value=0.0), 0.0)
        g = pd.DataFrame({
            key_col: df[key_col], "n": valid.astype(np.float64),
            "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
        }).groupby(key_col, dropna=False, sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    st = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .groupby(key_col)
          .aggregate(*[Sum(c, alias_name=c)
                       for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = df["n"].to_numpy()
        sx, sy = df["sx"].to_numpy(), df["sy"].to_numpy()
        sxx, syy, sxy = (df["sxx"].to_numpy(), df["syy"].to_numpy(),
                         df["sxy"].to_numpy())
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = n * sxy - sx * sy
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            r = cov / np.sqrt(vx * vy)
        r = np.where((n < 2) | (vx <= 0) | (vy <= 0), np.nan, r)
        r = np.sign(r) * np.floor(np.abs(r) * 10.0**round_to + 0.5) / 10.0**round_to
        out = pa.table({key_col: pa.Array.from_pandas(df[key_col]),
                        "corr_xy": pa.array(r, pa.float64())})
        return out

    return st.map_batches(finish, batch_format="pyarrow")


def trim_outliers(
    ds: "ray.data.Dataset",
    col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    n_bins: int = 4096,
) -> "ray.data.Dataset":
    """Quantile trim (the 'drop length outliers' curation filter): keep
    rows with quantile_disc(q_lo) ≤ col ≤ quantile_disc(q_hi). Bounds
    come from the histogram-bracket exact_quantile (streaming passes,
    no sort); the filter itself is one stateless vectorized map. Null
    values never pass (no defined position in the order)."""
    import pyarrow.compute as pc

    qs = exact_quantile(ds, col, [q_lo, q_hi], n_bins=n_bins)
    lo, hi = qs[q_lo], qs[q_hi]

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        m = pc.and_(pc.greater_equal(v, lo), pc.less_equal(v, hi))
        return batch.filter(pc.fill_null(m, False))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=65536)


def grouped_moments(
    ds: "ray.data.Dataset",
    key_col: str,
    x_col: str,
    round_to: int = 6,
) -> "ray.data.Dataset":
    """Sample skewness + excess kurtosis per key (SQL skewness() /
    kurtosis(): the bias-adjusted G1/G2 estimators) from five raw power
    sums (n, Σx, Σx², Σx³, Σx⁴) — map-side per-key partials, ONE
    groupby-sum, driver-free finisher. Nulls skipped; groups smaller
    than the estimator's support (n<3 for skew, n<4 for kurtosis) yield
    null, like SQL. Raw power sums lose precision when |mean| ≫ std —
    center upstream if your data is like that."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, x_col]).to_pandas()
        valid = df[x_col].notna().to_numpy()
        x = np.where(valid, df[x_col].to_numpy(dtype=np.float64,
                                               na_value=0.0), 0.0)
        g = pd.DataFrame({
            key_col: df[key_col], "n": valid.astype(np.float64),
            "s1": x, "s2": x * x, "s3": x ** 3, "s4": x ** 4,
        }).groupby(key_col, dropna=False, sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    st = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .groupby(key_col)
          .aggregate(*[Sum(c, alias_name=c)
                       for c in ("n", "s1", "s2", "s3", "s4")]))

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n = df["n"].to_numpy()
        s1, s2 = df["s1"].to_numpy(), df["s2"].to_numpy()
        s3, s4 = df["s3"].to_numpy(), df["s4"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s1 / n
            m2 = s2 / n - mean ** 2
            m3 = s3 / n - 3 * mean * s2 / n + 2 * mean ** 3
            m4 = (s4 / n - 4 * mean * s3 / n
                  + 6 * mean ** 2 * s2 / n - 3 * mean ** 4)
            g1 = m3 / m2 ** 1.5
            skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
            g2 = m4 / m2 ** 2 - 3.0
            kurt = (((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3)))
        skew = np.where((n < 3) | (m2 <= 0), np.nan, skew)
        kurt = np.where((n < 4) | (m2 <= 0), np.nan, kurt)
        k = 10.0 ** round_to
        skew = np.sign(skew) * np.floor(np.abs(skew) * k + 0.5) / k
        kurt = np.sign(kurt) * np.floor(np.abs(kurt) * k + 0.5) / k
        return pa.table({key_col: pa.Array.from_pandas(df[key_col]),
                         "skewness": pa.array(skew, pa.float64()),
                         "kurtosis": pa.array(kurt, pa.float64())})

    return st.map_batches(finish, batch_format="pyarrow")


def table_profile(
    ds: "ray.data.Dataset",
    cols: list[str],
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-column data-quality census: (col, n, n_null, n_distinct) for
    every requested column — the 'profile this table before training on
    it' primitive. One pass emits per-batch count partials plus the
    batch-DISTINCT (col, value) pairs in long format (values carried as
    their exact Arrow string cast, injective for int/float/string/
    timestamp); distinct counting is then the same pair-bucketed
    two-level reduce as groupby_nunique — a column with billions of
    distinct values spreads across buckets instead of melting one."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .canonicalize import _B, _add_bucket

    def local(batch: pa.Table) -> pa.Table:
        frames = []
        import pyarrow.compute as pc

        for c in cols:
            arr = batch.column(c)
            if pa.types.is_floating(arr.type):
                # -0.0 casts to "-0" but SQL DISTINCT equates it with
                # 0.0 — normalize before the (otherwise injective) cast
                arr = pc.add(arr, 0.0)
            if not (pa.types.is_string(arr.type)
                    or pa.types.is_large_string(arr.type)):
                arr = arr.cast(pa.string())
            v = pd.Series(arr.to_pandas()).dropna().drop_duplicates()
            frames.append(pd.DataFrame({
                "col": c, "v": v.astype(str),
                "n_part": 0, "null_part": 0, "is_count": False}))
            frames.append(pd.DataFrame({
                "col": [c], "v": [""], "n_part": [len(batch)],
                "null_part": [batch.column(c).null_count],
                "is_count": [True]}))
        out = pd.concat(frames, ignore_index=True)
        return _add_bucket(pa.Table.from_pandas(out, preserve_index=False),
                           ["col", "v"], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        counts = df[df["is_count"]]
        pairs = df[~df["is_count"]].drop_duplicates(["col", "v"])
        a = (counts.groupby("col", sort=False)
             .agg(n=("n_part", "sum"), n_null=("null_part", "sum"))
             .reset_index())
        b = (pairs.groupby("col", sort=False)
             .size().reset_index(name="nd"))
        out = a.merge(b, on="col", how="outer").fillna(0)
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema([pa.field("col", pa.string()),
                       pa.field("n", pa.int64()),
                       pa.field("n_null", pa.int64()),
                       pa.field("nd", pa.int64())]))

    return (ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow")
            .groupby("col")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_null", alias_name="n_null"),
                       Sum("nd", alias_name="n_distinct")))


def winsorize(
    ds: "ray.data.Dataset",
    col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    out: str | None = None,
    n_bins: int = 4096,
    flag: str | None = None,
    cont: bool = False,
) -> "ray.data.Dataset":
    """Quantile clamp (trim_outliers' value-preserving twin): values
    outside [quantile(q_lo), quantile(q_hi)] are CLAMPED to the band
    edge instead of dropped — row count unchanged, heavy tails
    bounded. Same streaming exact-quantile bounds (``quantile_disc``
    by default; ``cont=True`` switches to interpolated
    ``quantile_cont`` bounds), one stateless map. Nulls pass through
    as nulls (``skip_nulls=False`` — the element-wise min/max default
    would silently collapse a null to the band edge). ``flag`` names
    an optional boolean audit column marking clamped rows."""
    import pyarrow.compute as pc

    fn = exact_quantile_cont if cont else exact_quantile
    qs = fn(ds, col, [q_lo, q_hi], n_bins=n_bins)
    lo, hi = qs[q_lo], qs[q_hi]
    dest = out or col

    def clamp(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        w = pc.min_element_wise(
            pc.max_element_wise(v, lo, skip_nulls=False), hi,
            skip_nulls=False)
        if flag is not None:
            clipped = pc.fill_null(pc.not_equal(v, w), False)
        if dest in batch.column_names:
            batch = batch.set_column(
                batch.schema.get_field_index(dest), dest, w)
        else:
            batch = batch.append_column(dest, w)
        if flag is not None:
            batch = batch.append_column(flag, clipped)
        return batch

    return ds.map_batches(clamp, batch_format="pyarrow", batch_size=65536)


def zscore_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    id_col: str,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-group standardization — the feature-normalization step of
    a training-data pipeline: every row gets ``z = (x − μ_key) /
    σ_key`` with the population σ (SQL ``STDDEV_POP``), null when the
    group is constant (σ = 0) or the value is null.

    Shape: ONE map-side-combined ``sums_by_key`` census (n, Σx, Σx²)
    + one bucketed join back onto the row stream + a vectorized
    transform — no sort, no per-row Python. Rounded to 6 dp so the
    naive-sums variance and SQL's stable aggregate agree bit-wise."""
    from .canonicalize import sums_by_key
    from .join import shuffle_hash_join

    def prep(t: pa.Table) -> pa.Table:
        v = t.column(val_col).cast(pa.float64())
        ok = pc.is_valid(v)
        return pa.table({
            key_col: t.column(key_col),
            "s1": pc.fill_null(v, 0.0),
            "s2": pc.fill_null(pc.multiply(v, v), 0.0),
            "cnt": ok.cast(pa.int64())})

    stats = sums_by_key(ds.map_batches(prep, batch_format="pyarrow"),
                        key_col, ["s1", "s2", "cnt"], nb=nb)

    def finish_stats(t: pa.Table) -> pa.Table:
        n = t.column("cnt").cast(pa.float64())
        mean = pc.divide(t.column("s1"), n)
        var = pc.subtract(pc.divide(t.column("s2"), n),
                          pc.multiply(mean, mean))
        # float noise can push a constant group's variance a hair
        # below zero — clamp before the sqrt
        sd = pc.sqrt(pc.max_element_wise(var, pa.scalar(0.0)))
        return pa.table({key_col: t.column(key_col),
                         "__mean": mean, "__sd": sd})

    j = shuffle_hash_join(
        ds.map_batches(
            lambda t: pa.table({id_col: t.column(id_col),
                                key_col: t.column(key_col),
                                val_col: t.column(val_col)}),
            batch_format="pyarrow"),
        stats.map_batches(finish_stats, batch_format="pyarrow"),
        on=[key_col], how="left", nb=nb)

    def z(t: pa.Table) -> pa.Table:
        v = t.column(val_col).cast(pa.float64())
        sd = t.column("__sd")
        zz = pc.divide(pc.subtract(v, t.column("__mean")), sd)
        bad = pc.or_kleene(pc.is_null(v),
                           pc.fill_null(pc.equal(sd, 0.0), True))
        return pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            val_col: t.column(val_col),
            "z": pc.if_else(pc.fill_null(bad, True),
                            pa.scalar(None, pa.float64()),
                            pc.round(zz, 6))})

    return j.map_batches(z, batch_format="pyarrow")


def mad_outliers_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    k: float = 3.0,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Robust per-group outlier detection — the curation filter that
    survives the heavy tails z-scores choke on: a row is an outlier
    when ``|x − median_key| > k · MAD_key`` (MAD = median absolute
    deviation, both medians interpolated — SQL ``median()`` /
    ``mad()`` semantics). Null values get null ``is_outlier``;
    medians are computed over the group's non-null values.
    ``is_outlier`` is a nullable 0/1 int64 (not bool): a null bool
    round-trips as Python ``None`` from Arrow but ``NaN`` from
    DuckDB, which breaks representation-sensitive value hashes.

    Shape: ONE bucket shuffle on the key; per bucket BOTH medians are
    computed for ALL groups at once with two vectorized sorted-run
    passes (sort → reduceat counts → midpoint gather; re-rank of
    |dev| reuses the same run geometry via ``np.lexsort``) — no
    per-group Python, no global sort. Groups must fit a bucket (the
    same co-location contract as the window family); 6-dp rounding
    pins float parity with SQL's stable aggregates."""
    from .canonicalize import _B, _add_bucket

    def local(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch.column(key_col),
                      val_col: batch.column(val_col).cast(pa.float64())})
        return _add_bucket(t, [key_col], nb)

    def _run_median(v: np.ndarray, starts: np.ndarray,
                    nn: np.ndarray) -> np.ndarray:
        # v sorted within runs, non-null (non-NaN) first; nn = per-run
        # non-null count. Interpolated median, NaN for empty runs.
        safe = np.maximum(nn, 1)
        lo = starts + (safe - 1) // 2
        hi = starts + safe // 2
        med = (v[lo] + v[hi]) / 2.0
        return np.where(nn > 0, med, np.nan)

    def finish(g: pa.Table) -> pa.Table:
        t = g.drop_columns([_B])
        if t.num_rows == 0:
            return pa.table({
                key_col: t.column(key_col),
                val_col: t.column(val_col),
                "med": pa.array([], pa.float64()),
                "mad": pa.array([], pa.float64()),
                "is_outlier": pa.array([], pa.int64())})
        idx = pc.sort_indices(
            t, sort_keys=[(key_col, "ascending"),
                          (val_col, "ascending")],
            null_placement="at_end")
        t = t.take(idx)
        kc = t.column(key_col).combine_chunks()
        ne = pc.not_equal(kc.slice(1), kc.slice(0, len(kc) - 1))
        # null keys form ONE trailing group (sorted together): a
        # null-vs-null comparison is null -> fill False keeps them fused
        ne = ne.fill_null(
            pc.or_(pc.is_valid(kc.slice(1)),
                   pc.is_valid(kc.slice(0, len(kc) - 1)))
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, ne])
        lens = np.diff(np.r_[starts, len(kc)])
        run_id = np.repeat(np.arange(len(starts)), lens)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        valid = ~np.isnan(v)
        nn = np.add.reduceat(valid.astype(np.int64), starts)
        med_run = _run_median(v, starts, nn)
        med = np.repeat(med_run, lens)
        dev = np.abs(v - med)
        order = np.lexsort((dev, run_id))  # NaN devs sort last per run
        mad_run = _run_median(dev[order], starts, nn)
        mad = np.repeat(mad_run, lens)
        out_flag = dev > k * mad
        return pa.table({
            key_col: kc,
            val_col: t.column(val_col),
            "med": pa.array(np.round(med, 6), pa.float64()),
            "mad": pa.array(np.round(mad, 6), pa.float64()),
            "is_outlier": pa.array(out_flag.astype(np.int64),
                                   pa.int64(), mask=~valid)})

    return (ds.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def frequent_itemsets(
    ds: "ray.data.Dataset",
    basket_col: str,
    item_col: str,
    min_support: int,
    max_size: int = 3,
    nb: int = 64,
    max_frequent_items: int = 100_000,
    max_basket_items: int = 4096,
    max_expanded_triples: int = 50_000_000,
) -> "ray.data.Dataset":
    """Frequent itemsets up to size 3 via distributed a-priori
    (Agrawal & Srikant 1994): an itemset is frequent iff it occurs in
    ≥ ``min_support`` distinct baskets, and every subset of a frequent
    itemset is frequent — so each level's candidates are pruned by the
    previous level before any counting. The training-data/KG use:
    co-occurring tags, hosts sharing link targets, predicate bundles
    that travel together (feeds characteristic-set style schema
    discovery with support guarantees).

    Scale shape: level 1 is a map-side-combined count over DISTINCT
    (basket, item) pairs; the frequent-ITEM list (bounded by
    ``max_frequent_items``, raises beyond — by definition at most
    |items with count ≥ min_support|, a reduced aggregate) broadcasts
    into a membership filter; pair/triple expansion is the shared
    vectorized upper-triangle kernel over basket-bucketed sorted runs
    (one shuffle keyed on basket), counted via map-side-combined
    ``sum_by_key`` — the raw row stream never materializes on the
    driver. A basket holding more than ``max_basket_items`` FREQUENT
    items raises (its pair expansion is quadratic), and a bucket
    whose baskets would materialize more than
    ``max_expanded_triples`` size-3 candidates raises before the
    cubic expansion — at that point raise ``min_support``, not the
    bounds.

    Returns ``(i1, i2, i3, size, n_baskets)`` — itemset members in
    ascending item order, absent slots null.
    """
    from ..pipelines.annotate import dataset_to_table
    from .canonicalize import _B, _add_bucket, dedup_exact, sum_by_key
    from .graph import _pair_index_upper
    from .util import mat_cut

    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    if max_size not in (1, 2, 3):
        raise ValueError("max_size must be 1, 2 or 3")

    pairs = mat_cut(dedup_exact(ds.map_batches(
        lambda t: pa.table({
            "bk": t.column(basket_col),
            "it": t.column(item_col).cast(pa.string())}).filter(
            pc.and_kleene(pc.is_valid(t.column(basket_col)),
                          pc.is_valid(t.column(item_col)))),
        batch_format="pyarrow"), ["bk", "it"], nb=nb))
    f1 = mat_cut(sum_by_key(
        pairs.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow"),
        "it", "one", nb=nb, out_col="n").filter(
        expr=f"n >= {int(min_support)}"))
    out_schema = pa.schema([
        pa.field("i1", pa.string()), pa.field("i2", pa.string()),
        pa.field("i3", pa.string()), pa.field("size", pa.int64()),
        pa.field("n_baskets", pa.int64())])

    def lvl1(t: pa.Table) -> pa.Table:
        return pa.table({
            "i1": t.column("it"),
            "i2": pa.nulls(t.num_rows, pa.string()),
            "i3": pa.nulls(t.num_rows, pa.string()),
            "size": pa.array(np.ones(t.num_rows, np.int64)),
            "n_baskets": t.column("n").cast(pa.int64())})

    result = f1.map_batches(lvl1, batch_format="pyarrow")
    if max_size == 1 or f1.count() == 0:
        return result.map_batches(lambda t: t.cast(out_schema),
                                  batch_format="pyarrow")

    f1_tab = dataset_to_table(f1)
    if f1_tab.num_rows > max_frequent_items:
        raise RuntimeError(
            f"{f1_tab.num_rows} frequent items exceed the broadcast "
            f"bound {max_frequent_items}; raise min_support")
    # broadcast the frequent-item list; encode items as codes so pair
    # keys become int64s for the vectorized membership checks
    items_sorted = sorted(f1_tab.column("it").to_pylist())
    code_of = {v: i for i, v in enumerate(items_sorted)}
    m = len(items_sorted)

    def keep_frequent(t: pa.Table) -> pa.Table:
        it = t.column("it").to_pylist()
        codes = np.array([code_of.get(v, -1) for v in it], np.int64)
        ok = codes >= 0
        return pa.table({
            "bk": t.column("bk").filter(pa.array(ok)),
            "code": pa.array(codes[ok])})

    coded = (pairs.map_batches(keep_frequent, batch_format="pyarrow")
             .map_batches(lambda t: _add_bucket(t, ["bk"], nb),
                          batch_format="pyarrow"))

    def expand_pairs(g: pa.Table) -> pa.Table:
        s = g.drop_columns([_B]).sort_by(
            [("bk", "ascending"), ("code", "ascending")])
        bk = s.column("bk").to_numpy(zero_copy_only=False)
        code = s.column("code").to_numpy(zero_copy_only=False)
        new = np.ones(len(bk), dtype=bool)
        new[1:] = bk[1:] != bk[:-1]
        d = np.diff(np.append(np.flatnonzero(new), len(bk)))
        if d.size and int(d.max()) > max_basket_items:
            raise RuntimeError(
                f"a basket holds {int(d.max())} frequent items "
                f"(> {max_basket_items}); raise min_support")
        li, ri = _pair_index_upper(d)
        return pa.table({
            "k": pa.array(code[li] * m + code[ri]),
            "one": pa.array(np.ones(len(li), np.int64))})

    f2 = mat_cut(sum_by_key(
        coded.groupby(_B)
        .map_groups(expand_pairs, batch_format="pyarrow"),
        "k", "one", nb=nb, out_col="n")
        .filter(expr=f"n >= {int(min_support)}"))

    def lvl2(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        a = pa.array([items_sorted[int(x) // m] for x in k],
                     pa.string())
        b = pa.array([items_sorted[int(x) % m] for x in k],
                     pa.string())
        return pa.table({
            "i1": a, "i2": b,
            "i3": pa.nulls(t.num_rows, pa.string()),
            "size": pa.array(np.full(t.num_rows, 2, np.int64)),
            "n_baskets": t.column("n").cast(pa.int64())})

    result = result.union(f2.map_batches(lvl2, batch_format="pyarrow"))
    if max_size == 2 or f2.count() == 0:
        return result.map_batches(lambda t: t.cast(out_schema),
                                  batch_format="pyarrow")

    f2_keys = np.sort(dataset_to_table(f2).column("k").to_numpy(
        zero_copy_only=False).astype(np.int64))
    f2_items = np.unique(np.concatenate(
        [f2_keys // m, f2_keys % m])) if f2_keys.size else \
        np.empty(0, np.int64)

    def expand_triples(g: pa.Table) -> pa.Table:
        s = g.drop_columns([_B]).sort_by(
            [("bk", "ascending"), ("code", "ascending")])
        bk = s.column("bk").to_numpy(zero_copy_only=False)
        code = s.column("code").to_numpy(zero_copy_only=False)
        keep = np.isin(code, f2_items)
        bk, code = bk[keep], code[keep]
        new = np.ones(len(bk), dtype=bool)
        new[1:] = bk[1:] != bk[:-1]
        heads = np.flatnonzero(new)
        d = np.diff(np.append(heads, len(bk)))
        # the pair guard bounds the quadratic stage; this stage is
        # CUBIC, so bound the materialized triple count explicitly
        # before expanding (C(d,3) summed over the bucket's baskets)
        dd = d.astype(np.float64)
        n_triples = float((dd * (dd - 1) * (dd - 2) / 6.0).sum())
        if n_triples > max_expanded_triples:
            raise RuntimeError(
                f"triple expansion would materialize "
                f"{int(n_triples)} candidates "
                f"(> {max_expanded_triples}); raise min_support")
        li, ri = _pair_index_upper(d)
        if li.size == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        # third element: every index k > ri within the same run
        run_of_pair = np.searchsorted(heads, li, side="right") - 1
        run_end = (heads + d)[run_of_pair]
        cnt3 = run_end - ri - 1
        li3 = np.repeat(li, cnt3)
        ri3 = np.repeat(ri, cnt3)
        base = np.cumsum(cnt3) - cnt3
        ki3 = np.repeat(ri + 1, cnt3) + (
            np.arange(int(cnt3.sum()), dtype=np.int64)
            - np.repeat(base, cnt3))
        c1, c2, c3 = code[li3], code[ri3], code[ki3]
        # a-priori prune: all three sub-pairs frequent
        ok = (np.isin(c1 * m + c2, f2_keys)
              & np.isin(c1 * m + c3, f2_keys)
              & np.isin(c2 * m + c3, f2_keys))
        return pa.table({
            "k": pa.array(c1[ok] * m * m + c2[ok] * m + c3[ok]),
            "one": pa.array(np.ones(int(ok.sum()), np.int64))})

    f3 = (sum_by_key(
        coded.groupby(_B)
        .map_groups(expand_triples, batch_format="pyarrow"),
        "k", "one", nb=nb, out_col="n")
        .filter(expr=f"n >= {int(min_support)}"))

    def lvl3(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        return pa.table({
            "i1": pa.array([items_sorted[int(x) // (m * m)]
                            for x in k], pa.string()),
            "i2": pa.array([items_sorted[(int(x) // m) % m]
                            for x in k], pa.string()),
            "i3": pa.array([items_sorted[int(x) % m] for x in k],
                           pa.string()),
            "size": pa.array(np.full(t.num_rows, 3, np.int64)),
            "n_baskets": t.column("n").cast(pa.int64())})

    result = result.union(f3.map_batches(lvl3, batch_format="pyarrow"))
    return result.map_batches(lambda t: t.cast(out_schema),
                              batch_format="pyarrow")


def _hll_estimate(regs: np.ndarray) -> int:
    """Flajolet HLL estimate with the small-range correction — shared
    by :func:`approx_distinct` (global) and :func:`grouped_hll`."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def grouped_hll(
    ds: "ray.data.Dataset",
    key_col: str,
    col: str,
    p: int = 10,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Per-key HyperLogLog sketches: ``(key, sketch, n_distinct_est)``
    with the 2^p-register sketch carried as a binary column — the
    MERGEABLE sibling of the exact :func:`~.canonicalize.
    groupby_nunique`. The archive-scale use: persist each day's
    per-domain sketches (1 KiB each at p=10, ~3% error) and answer
    "distinct URLs this quarter per domain" by :func:`merge_hll` over
    90 daily outputs — no re-scan of 100 TB, which no exact counter
    can offer. Estimates are deterministic (pandas 64-bit stable
    hash), so reruns byte-match.

    Scale shape: per-batch register partials per key (the 2^p bytes
    are the COMBINED form — a hot key's partials max-merge), ONE
    key-bucket shuffle of sketch rows, vectorized max-merge finisher.
    """
    from .canonicalize import _B, _add_bucket

    m = 1 << p
    shift = np.uint64(64 - p)
    wmask = np.uint64((1 << (64 - p)) - 1)

    def local(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column(col)))
        if t.num_rows == 0:
            return pa.table({key_col: t.column(key_col),
                             "sketch": pa.array([], pa.binary())})
        h = hash_strings(t.column(col)).astype(np.uint64)
        idx = (h >> shift).astype(np.int64)
        w = h & wmask
        nbits = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        nbits[nz] = np.floor(np.log2(
            w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = ((64 - p) - nbits + 1).astype(np.int8)
        # per-key register partials: sort rows by key, then one
        # np.maximum.at over (run_id * m + idx)
        order = pc.sort_indices(t.select([key_col]), sort_keys=[
            (key_col, "ascending")]).to_numpy(zero_copy_only=False)
        keys = t.column(key_col).take(pa.array(order))
        kn = keys.to_pandas().to_numpy()
        new = np.ones(len(kn), dtype=bool)
        new[1:] = kn[1:] != kn[:-1]
        run_id = np.cumsum(new) - 1
        nruns = int(run_id[-1]) + 1 if len(run_id) else 0
        regs = np.zeros(nruns * m, dtype=np.int8)
        np.maximum.at(regs, run_id * m + idx[order], rho[order])
        heads = np.flatnonzero(new)
        return pa.table({
            key_col: keys.take(pa.array(heads)),
            "sketch": pa.array(
                [regs[i * m:(i + 1) * m].tobytes()
                 for i in range(nruns)], pa.binary())})

    def finish(g: pa.Table) -> pa.Table:
        s = g.drop_columns([_B]).sort_by([(key_col, "ascending")])
        kn = s.column(key_col).to_pandas().to_numpy()
        new = np.ones(len(kn), dtype=bool)
        new[1:] = kn[1:] != kn[:-1]
        heads = np.flatnonzero(new)
        blobs = s.column("sketch").to_pylist()
        out_k, out_s, out_e = [], [], []
        for i, h0 in enumerate(heads):
            h1 = heads[i + 1] if i + 1 < len(heads) else len(kn)
            regs = np.frombuffer(blobs[h0], dtype=np.int8)
            for j in range(h0 + 1, h1):
                regs = np.maximum(
                    regs, np.frombuffer(blobs[j], dtype=np.int8))
            out_k.append(h0)
            out_s.append(regs.tobytes())
            out_e.append(_hll_estimate(regs))
        return pa.table({
            key_col: s.column(key_col).take(pa.array(out_k)),
            "sketch": pa.array(out_s, pa.binary()),
            "n_distinct_est": pa.array(out_e, pa.int64())})

    return (ds.map_batches(local, batch_format="pyarrow",
                           batch_size=65536)
            .map_batches(lambda t: _add_bucket(t, [key_col], nb),
                         batch_format="pyarrow")
            .groupby(_B)
            .map_groups(finish, batch_format="pyarrow"))


def merge_hll(
    sketches: "ray.data.Dataset",
    key_col: str,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Merge :func:`grouped_hll` outputs (e.g. the union of several
    days' sketch tables) per key: register-wise max, re-estimated —
    the merged result is BYTE-IDENTICAL to building one sketch over
    the concatenated raw input (HLL's lattice property, pinned in
    tests). Same bucket plan as the build finisher."""
    from .canonicalize import _B, _add_bucket

    def finish(g: pa.Table) -> pa.Table:
        s = g.drop_columns([_B]).sort_by([(key_col, "ascending")])
        kn = s.column(key_col).to_pandas().to_numpy()
        new = np.ones(len(kn), dtype=bool)
        new[1:] = kn[1:] != kn[:-1]
        heads = np.flatnonzero(new)
        blobs = s.column("sketch").to_pylist()
        out_k, out_s, out_e = [], [], []
        for i, h0 in enumerate(heads):
            h1 = heads[i + 1] if i + 1 < len(heads) else len(kn)
            regs = np.frombuffer(blobs[h0], dtype=np.int8)
            for j in range(h0 + 1, h1):
                regs = np.maximum(
                    regs, np.frombuffer(blobs[j], dtype=np.int8))
            out_k.append(h0)
            out_s.append(regs.tobytes())
            out_e.append(_hll_estimate(regs))
        return pa.table({
            key_col: s.column(key_col).take(pa.array(out_k)),
            "sketch": pa.array(out_s, pa.binary()),
            "n_distinct_est": pa.array(out_e, pa.int64())})

    return (sketches.map_batches(
        lambda t: _add_bucket(t.select([key_col, "sketch"]),
                              [key_col], nb),
        batch_format="pyarrow")
        .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def weighted_sample_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Per-key weighted sampling without replacement — the
    PARTITION BY sibling of :func:`weighted_sample` (k quality-
    weighted docs per domain, k price-weighted orders per priority):
    the same deterministic Efraimidis–Spirakis draw (``u =
    (md5(id)[:8] + 0.5) / 2^32``, A-ES key ``-ln(u)/w``, k SMALLEST
    keys win) applied within every key group. Rows with null/≤0
    weight are excluded; groups smaller than ``k`` keep everything.

    Scale shape: the A-ES key computes map-side, then ONE key-bucket
    shuffle through the shared :func:`~.windows.topk_per_key` kernel
    (hot-key spill path included). Returns the sampled rows
    ``(key, id, weight)``.
    """
    from ..functions.hashing import md5_u32
    from .windows import topk_per_key

    if k < 1:
        raise ValueError("k must be >= 1")

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = (batch.column(weight_col).cast(pa.float64())
             .to_numpy(zero_copy_only=False))
        h = md5_u32(ids).astype(np.float64)
        u = (h + 0.5) / 4294967296.0
        with np.errstate(divide="ignore", invalid="ignore"):
            key = -np.log(u) / w
        ok = np.isfinite(key) & (w > 0)
        ok &= pc.is_valid(batch.column(key_col)).to_numpy(
            zero_copy_only=False)
        t = pa.table({
            key_col: batch.column(key_col),
            id_col: batch.column(id_col),
            weight_col: batch.column(weight_col),
            "_aes_key": pa.array(key)})
        return t.filter(pa.array(ok))

    out = topk_per_key(
        ds.map_batches(add_key, batch_format="pyarrow",
                       batch_size=65536),
        key_col, ["_aes_key", id_col], k=k, nb=nb)
    return out.map_batches(
        lambda t: t.select([key_col, id_col, weight_col]),
        batch_format="pyarrow")


def _skyline_local(M: np.ndarray, tile: int = 2048) -> np.ndarray:
    """Boolean keep-mask of the Pareto-minimal rows of ``M`` (n × d
    float64, all-minimize). Tiled vectorized dominance test — row i is
    dropped iff some row j has all(M[j] <= M[i]) and any(M[j] < M[i]).
    Duplicate rows never dominate each other (any(<) is false), so
    ties all survive, matching the SQL NOT-EXISTS twin. O(n²·d) per
    block but fully numpy; callers bound n by batch size."""
    n = M.shape[0]
    keep = np.ones(n, dtype=bool)
    if n == 0:
        return keep
    for lo in range(0, n, tile):
        hi = min(lo + tile, n)
        # candidates [lo:hi] vs every currently-kept row
        C = M[lo:hi]                       # t × d
        K = M[keep]                        # m × d
        le = (K[None, :, :] <= C[:, None, :]).all(-1)   # t × m
        lt = (K[None, :, :] < C[:, None, :]).any(-1)
        dominated = (le & lt).any(1)
        keep[lo:hi] &= ~dominated
        del le, lt
    # Completeness: when tile T is tested, every row of a LATER tile is
    # still in K (nothing after T has been dropped yet), and a dropped
    # earlier row's dominator survives and dominates transitively — so
    # one pass suffices.
    return keep


def skyline(
    ds: "ray.data.Dataset",
    cols: list[str],
    maximize: "list[bool] | None" = None,
    nb: int = 8,
    batch_size: int = 8192,
    max_candidates: int = 2_000_000,
) -> pa.Table:
    """Distributed skyline (Pareto front) over ``cols``: the rows not
    dominated by any other row, where row s dominates row r iff s is
    ≤ r on every criterion and < on at least one (after flipping
    ``maximize`` columns). The multi-criteria curation primitive —
    e.g. "documents on the quality/length/recency frontier".

    Scale shape: the skyline operator is ASSOCIATIVE — the global
    skyline equals the skyline of the union of per-block skylines —
    so each batch reduces locally (vectorized tiled dominance kernel,
    typically a tiny surviving fraction) and only local survivors
    move; one final single-group pass merges them. ``max_candidates``
    guards the reduce side: a frontier that big means the criteria
    don't discriminate (raise, don't OOM). Rows with a NULL/NaN in
    any criterion are excluded (SQL comparison semantics: they can
    neither dominate nor be ranked)."""
    sign = np.ones(len(cols))
    if maximize:
        if len(maximize) != len(cols):
            raise ValueError("maximize must match cols length")
        sign[np.asarray(maximize, bool)] = -1.0

    def _mat(batch: pa.Table) -> np.ndarray:
        M = np.column_stack([
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        return M * sign

    def local(batch: pa.Table) -> pa.Table:
        M = _mat(batch)
        ok = ~np.isnan(M).any(1)
        batch = batch.take(pa.array(np.flatnonzero(ok)))
        keep = _skyline_local(M[ok])
        return batch.take(pa.array(np.flatnonzero(keep)))

    cand = ds.map_batches(local, batch_format="pyarrow",
                          batch_size=batch_size).materialize()
    n = cand.count()
    if n > max_candidates:
        raise ValueError(
            f"skyline: {n} local-skyline candidates exceed "
            f"max_candidates={max_candidates} — criteria too weak to "
            "discriminate; add a criterion or pre-filter")
    tbl = pa.concat_tables(
        list(cand.iter_batches(batch_format="pyarrow", batch_size=None)),
        promote_options="permissive") if n else None
    if tbl is None or tbl.num_rows == 0:
        return pa.Table.from_pylist([], schema=_arrow_schema_of(ds))
    keep = _skyline_local(_mat(tbl))
    return tbl.take(pa.array(np.flatnonzero(keep)))


def _arrow_schema_of(ds: "ray.data.Dataset") -> pa.Schema:
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([pa.field(n, pa.from_numpy_dtype(t) if t != object
                               else pa.string())
                      for n, t in zip(base.names, base.types)])


def exact_heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int,
    nb: int = 32,
) -> "ray.data.Dataset":
    """EXACT heavy hitters: every value whose global count strictly
    exceeds n/k, with its exact count — without a full distinct-key
    shuffle. Complements :func:`count_min_heavy_hitters` (approximate,
    sketch-based) when the answer must be auditable.

    Soundness: if count(x) > n/k globally then count_b(x) > n_b/k in
    at least ONE block b (otherwise summing the per-block bounds gives
    count(x) ≤ n/k) — so the union of per-block local heavy hitters
    (< k candidates per block, found with one vectorized value_counts)
    is a SUPERSET of the true answer. Pass 2 exact-counts only the
    candidate set (broadcast once via ray.put, read per task) and
    filters by the true threshold. Two streaming passes, no shuffle
    proportional to distinct keys."""
    import ray

    from .canonicalize import sum_by_key

    def local(batch: pa.Table) -> pa.Table:
        s = batch.column(col).to_pandas()
        vc = s.value_counts(dropna=True)
        nb_rows = int(s.notna().sum())
        hot = vc[vc * k > nb_rows]
        return pa.table({col: pa.Array.from_pandas(
            pd.Series(hot.index), type=batch.schema.field(col).type)})

    cand = ds.map_batches(local, batch_format="pyarrow",
                          batch_size=65536)
    cand_vals = set()
    for b in cand.iter_batches(batch_format="pyarrow", batch_size=None):
        cand_vals.update(b.column(col).to_pylist())
    if not cand_vals:
        sch = _arrow_schema_of(ds)
        return ray.data.from_arrow(pa.table({
            col: pa.array([], sch.field(col).type),
            "count": pa.array([], pa.int64())}))
    cand_ref = ray.put(cand_vals)

    def count_cand(batch: pa.Table) -> pa.Table:
        vals = ray.get(cand_ref)
        arr = batch.column(col)
        m = pc.is_in(arr, value_set=pa.array(
            list(vals), type=arr.type))
        t = batch.filter(pc.fill_null(m, False)).select([col])
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64)))

    counts = sum_by_key(
        ds.map_batches(count_cand, batch_format="pyarrow",
                       batch_size=65536),
        col, "one", nb=nb, out_col="count").materialize()
    # n = total non-null rows (SQL count(col)); one cheap agg pass
    def nn(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [int(pc.count(batch.column(col)).as_py())], pa.int64())})

    n = sum(b.column("n").to_numpy().sum()
            for b in ds.map_batches(nn, batch_format="pyarrow",
                                    batch_size=65536)
            .iter_batches(batch_format="pyarrow", batch_size=None))
    n = int(n)
    return counts.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t.column("count"), pa.scalar(k, pa.int64())),
            pa.scalar(n, pa.int64()))),
        batch_format="pyarrow")


def roc_auc(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    n_bins: int = 4096,
    nb: int = 32,
) -> float:
    """Exact ROC-AUC (rank-sum / Mann-Whitney form, ties counted half)
    of ``score_col`` as a predictor of binary ``label_col`` — the
    model-evaluation primitive for the curation classifiers — WITHOUT
    a global sort: AUC = Σ_s n_pos(s)·(N_neg(<s) + ½·n_neg(s)) / (P·N)
    over distinct scores s, so it reduces to (1) a per-score census
    (one bucketed sum pass, map-side pre-combined), (2) a fixed-width
    histogram of the census giving every bin's exact carry-in negative
    count (driver traffic = n_bins ints), (3) per-bin local cumulative
    contributions with the broadcast carry. Rows with a null score or
    label are excluded (SQL comparison semantics); raises if either
    class is empty (AUC undefined)."""
    import ray as _ray

    from .canonicalize import sums_by_key

    def census_part(batch: pa.Table) -> pa.Table:
        s = batch.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = ~(np.isnan(s) | np.isnan(y))
        s, y = s[ok], y[ok]
        df = pd.DataFrame({"s": s, "p": (y != 0).astype(np.int64)})
        g = df.groupby("s", as_index=False).agg(
            n_pos=("p", "sum"), n=("p", "size"))
        g["n_neg"] = g["n"] - g["n_pos"]
        return pa.table({"s": pa.array(g["s"], pa.float64()),
                         "n_pos": pa.array(g["n_pos"], pa.int64()),
                         "n_neg": pa.array(g["n_neg"], pa.int64())})

    census = sums_by_key(
        ds.map_batches(census_part, batch_format="pyarrow",
                       batch_size=65536),
        "s", ["n_pos", "n_neg"], nb=nb).materialize()
    if census.count() == 0:
        raise ValueError("roc_auc: no scorable rows")
    lo, hi = float(census.min("s")), float(census.max("s"))
    width = (hi - lo) / n_bins if hi > lo else 1.0

    def binned(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        b = np.clip(((s - lo) / width).astype(np.int64), 0, n_bins - 1)
        return t.append_column("bin", pa.array(b))

    bt = census.map_batches(binned, batch_format="pyarrow").materialize()
    # per-bin negative totals -> exact carry-in offsets (n_bins ints)
    from .canonicalize import sum_by_key
    bins = sum_by_key(bt.map_batches(
        lambda t: t.select(["bin", "n_neg"]), batch_format="pyarrow"),
        "bin", "n_neg", nb=nb, out_col="nn").to_pandas()
    carry = np.zeros(n_bins, np.int64)
    per_bin = np.zeros(n_bins, np.int64)
    per_bin[bins["bin"].to_numpy()] = bins["nn"].to_numpy()
    carry[1:] = np.cumsum(per_bin)[:-1]
    carry_ref = _ray.put(carry)

    def contrib(g: pa.Table) -> pa.Table:
        c = _ray.get(carry_ref)
        df = g.to_pandas().sort_values("s")
        cum_before = np.concatenate(
            [[0], np.cumsum(df["n_neg"].to_numpy())[:-1]])
        base = c[int(df["bin"].iloc[0])]
        num = (df["n_pos"].to_numpy()
               * (base + cum_before + 0.5 * df["n_neg"].to_numpy()))
        return pa.table({
            "num": pa.array([float(num.sum())], pa.float64()),
            "p": pa.array([int(df["n_pos"].sum())], pa.int64()),
            "n": pa.array([int(df["n_neg"].sum())], pa.int64())})

    parts = (bt.groupby("bin")
             .map_groups(contrib, batch_format="pyarrow")
             .to_pandas())
    P, N = int(parts["p"].sum()), int(parts["n"].sum())
    if P == 0 or N == 0:
        raise ValueError(
            f"roc_auc: needs both classes (P={P}, N={N})")
    import math
    return math.fsum(sorted(parts["num"].to_numpy())) / (float(P) * N)


def trend_per_key(
    ds: "ray.data.Dataset",
    key: "str | list[str]",
    x_col: str,
    y_col: str,
    nb: int = 32,
    round_to: int = 6,
) -> "ray.data.Dataset":
    """Per-key OLS trend line: slope, intercept and r² of y on x for
    every key — "is this domain's quality drifting", "is the crawl
    rate of this host rising" — in ONE sufficient-statistics pass:
    per-batch partial (n, Σx, Σy, Σxy, Σx², Σy²) per key, one
    composite-key bucketed sums reduce, then closed-form finishers.
    Rows where x or y is null/NaN are excluded (SQL regr_* slope
    semantics). Keys with < 2 points or zero x-variance emit null
    slope/intercept/r²; zero y-variance emits r² = null (corr
    undefined), matching SQL corr(). Center x per key before calling
    if |x| is huge (epoch micros) — the naive sums lose precision
    like any closed-form OLS."""
    from .canonicalize import sums_by_key

    keys = [key] if isinstance(key, str) else list(key)
    stat_cols = ["n_", "sx", "sy", "sxy", "sxx", "syy"]

    def part(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        df = pd.DataFrame({k: batch.column(k).to_pandas()[ok]
                           for k in keys})
        xv, yv = x[ok], y[ok]
        df["n_"] = 1.0
        df["sx"] = xv
        df["sy"] = yv
        df["sxy"] = xv * yv
        df["sxx"] = xv * xv
        df["syy"] = yv * yv
        g = df.groupby(keys, dropna=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = sums_by_key(
        ds.map_batches(part, batch_format="pyarrow", batch_size=65536),
        keys, stat_cols, nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_").to_numpy(zero_copy_only=False)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            cov = n * sxy - sx * sy
            slope = np.where((n >= 2) & (vx > 0), cov / vx, np.nan)
            intercept = np.where(np.isnan(slope), np.nan,
                                 (sy - slope * sx) / n)
            r2 = np.where((~np.isnan(slope)) & (vy > 0),
                          (cov * cov) / (vx * vy), np.nan)
        cols = {k: t.column(k) for k in keys}
        for name, v in (("slope", slope), ("intercept", intercept),
                        ("r2", r2)):
            v = np.round(v, round_to)
            cols[name] = pa.array(v, pa.float64(),
                                  mask=np.isnan(v))
        return pa.table(cols)

    return sums.map_batches(finish, batch_format="pyarrow")


def cohen_kappa(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    nb: int = 16,
    max_cells: int = 100_000,
) -> "pa.Table":
    """Cohen's kappa inter-annotator agreement between two categorical
    columns — the QA statistic for comparing two annotation runs (two
    linker versions, human vs model labels) beyond raw accuracy:

        kappa = (po - pe) / (1 - pe)

    po = observed agreement, pe = chance agreement from the marginal
    label distributions. Rows with a null on either side are excluded
    (no vote cast). Scale shape: ONE composite-key sum_by_key builds
    the (a, b) confusion census (map-side pre-combined, so the shuffle
    carries at most |A|x|B| rows per block); only the census — bounded
    by ``max_cells``, raises beyond it — is collected to compute the
    marginals. Returns a ONE-ROW pa.Table ``(n, po, pe, kappa)``
    rounded to 6 dp; kappa is null when pe == 1 (a single label pair
    everywhere — agreement is undefined, not perfect).
    """
    from .canonicalize import sum_by_key

    def census(t: pa.Table) -> pa.Table:
        a, b = t.column(col_a), t.column(col_b)
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        t = pa.table({"a": pc.cast(a, pa.string()),
                      "b": pc.cast(b, pa.string())}).filter(ok)
        return t.append_column(
            "n", pa.array(np.ones(t.num_rows, np.int64)))

    cen = sum_by_key(ds.map_batches(census, batch_format="pyarrow"),
                     ["a", "b"], "n", nb=nb)
    rows = []
    for b in cen.iter_batches(batch_format="pyarrow"):
        rows.append(b)
        if sum(r.num_rows for r in rows) > max_cells:
            raise ValueError(
                f"confusion census exceeds max_cells={max_cells} — "
                "cohen_kappa is for bounded label vocabularies")
    if not rows:
        return pa.table({"n": pa.array([0], pa.int64()),
                         "po": pa.array([None], pa.float64()),
                         "pe": pa.array([None], pa.float64()),
                         "kappa": pa.array([None], pa.float64())})
    df = pa.concat_tables(rows).to_pandas()
    n = int(df["n"].sum())
    po = float(df.loc[df["a"] == df["b"], "n"].sum()) / n
    row_m = df.groupby("a")["n"].sum()
    col_m = df.groupby("b")["n"].sum()
    common = row_m.index.intersection(col_m.index)
    pe = float((row_m[common] * col_m[common]).sum()) / (n * n)
    kappa = (po - pe) / (1 - pe) if pe != 1.0 else None
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "po": pa.array([round(po, 6)], pa.float64()),
        "pe": pa.array([round(pe, 6)], pa.float64()),
        "kappa": pa.array(
            [round(kappa, 6) if kappa is not None else None],
            pa.float64())})


def benford_deviation(
    ds: "ray.data.Dataset",
    col: str,
    group_col: "str | None" = None,
    nb: int = 16,
    max_groups: int = 100_000,
) -> "pa.Table":
    """Benford's-law conformance per group — the fraud/data-quality
    screen over a POSITIVE INTEGER column (amounts in cents, counts):
    per group, the first-significant-digit histogram and the
    chi-square statistic against Benford expectation
    p(d) = log10(1 + 1/d). The first digit is taken from the INTEGER'S
    DECIMAL STRING (exact — no float log10 whose last-ulp wobble could
    flip a 9/1 at powers of ten), the identical kernel the SQL twin
    replays. Non-positive or null values are excluded.

    Shape: one composite-key (group, digit) sum_by_key census
    (map-side pre-combined); only the census — at most 9 rows per
    group, bounded by ``max_groups`` — reaches the driver for the
    chi-square finish.

    Output: one row per group ``(group, n, chi2)``, chi2 rounded to
    6 dp (null when a group has no rows after filtering).
    """
    import math

    from .canonicalize import sum_by_key

    def census(t: pa.Table) -> pa.Table:
        v = t.column(col).cast(pa.int64())
        keep = pc.and_(pc.is_valid(v), pc.greater(v, pa.scalar(0)))
        t = t.filter(keep)
        v = t.column(col).cast(pa.int64())
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(v, pa.string()), 0, 1), pa.int64())
        grp = (t.column(group_col).cast(pa.string()) if group_col
               else pa.array(["_all"] * t.num_rows, pa.string()))
        return pa.table({"grp": grp, "digit": digit,
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    cen = sum_by_key(ds.map_batches(census, batch_format="pyarrow"),
                     ["grp", "digit"], "n", nb=nb)
    rows = []
    total = 0
    for b in cen.iter_batches(batch_format="pyarrow"):
        rows.append(b)
        total += b.num_rows
        if total > max_groups * 9:
            raise ValueError(
                f"benford census exceeds {max_groups} groups — "
                "benford_deviation is for bounded group vocabularies")
    if not rows:
        return pa.table({"grp": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "chi2": pa.array([], pa.float64())})
    df = pa.concat_tables(rows).to_pandas()
    p = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    out_g, out_n, out_c = [], [], []
    for g, sub in df.groupby("grp", sort=True, dropna=False):
        n = int(sub["n"].sum())
        obs = dict(zip(sub["digit"].astype(int), sub["n"].astype(int)))
        chi2 = math.fsum(
            (obs.get(d, 0) - n * p[d]) ** 2 / (n * p[d])
            for d in range(1, 10))
        out_g.append(g)
        out_n.append(n)
        out_c.append(round(chi2, 6))
    return pa.table({"grp": pa.array(out_g, pa.string()),
                     "n": pa.array(out_n, pa.int64()),
                     "chi2": pa.array(out_c, pa.float64())})


def calibration_bins(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    nb: int = 8,
) -> "pa.Table":
    """Calibration table for a probabilistic classifier: scores in
    [0, 1] bucketed into ``n_bins`` equal-width bins (hi edge clamped
    into the last bin), each bin reporting count, mean score and
    observed positive rate — the reliability-diagram input that pairs
    with :func:`roc_auc`. Rows with a null/NaN score or label are
    excluded; scores outside [0, 1] raise (a miscalibrated INPUT
    domain is a caller bug, not a bin). One composite census shuffle
    (bin → count/Σscore/Σpos partials pre-combined map-side); bins
    with no rows are absent (the SQL twin behaves identically).

    Output: ``(bin, n, mean_score, frac_pos)`` rounded to 6 dp.
    """
    from .canonicalize import sums_by_key

    def part(t: pa.Table) -> pa.Table:
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        ok = ~(np.isnan(s) | np.isnan(y))
        s, y = s[ok], y[ok]
        if len(s) and (s.min() < 0 or s.max() > 1):
            raise ValueError("calibration_bins: scores outside [0, 1]")
        b = np.minimum((s * n_bins).astype(np.int64), n_bins - 1)
        return pa.table({"bin": pa.array(b),
                         "n": pa.array(np.ones(len(b), np.int64)),
                         "s": pa.array(s),
                         "p": pa.array((y != 0).astype(np.int64))})

    cen = sums_by_key(ds.map_batches(part, batch_format="pyarrow",
                                     batch_size=65536),
                      "bin", ["n", "s", "p"], nb=nb)
    df = cen.to_pandas().sort_values("bin").reset_index(drop=True)
    return pa.table({
        "bin": pa.array(df["bin"].astype("int64")),
        "n": pa.array(df["n"].astype("int64")),
        "mean_score": pa.array((df["s"] / df["n"]).round(6)),
        "frac_pos": pa.array((df["p"] / df["n"]).round(6))})


def label_prf(
    ds: "ray.data.Dataset",
    gold_col: str,
    pred_col: str,
    nb: int = 16,
    max_cells: int = 100_000,
) -> "pa.Table":
    """Per-label precision / recall / F1 from a gold-vs-predicted
    confusion census — the per-class complement of
    :func:`cohen_kappa` for annotation QA. Rows with a null on either
    side are excluded. One composite-key census shuffle; only the
    bounded census reaches the driver. Labels present on either side
    get a row; a side with zero support yields 0.0 metrics (SQL-safe,
    not NaN).

    Output: ``(label, n_gold, n_pred, tp, precision, recall, f1)``
    rounded to 6 dp, one row per label sorted by label.
    """
    from .canonicalize import sum_by_key

    def census(t: pa.Table) -> pa.Table:
        g, p = t.column(gold_col), t.column(pred_col)
        ok = pc.and_(pc.is_valid(g), pc.is_valid(p))
        t2 = pa.table({"g": pc.cast(g, pa.string()),
                       "p": pc.cast(p, pa.string())}).filter(ok)
        return t2.append_column(
            "n", pa.array(np.ones(t2.num_rows, np.int64)))

    cen = sum_by_key(ds.map_batches(census, batch_format="pyarrow"),
                     ["g", "p"], "n", nb=nb)
    rows, total = [], 0
    for b in cen.iter_batches(batch_format="pyarrow"):
        rows.append(b)
        total += b.num_rows
        if total > max_cells:
            raise ValueError(
                f"confusion census exceeds max_cells={max_cells}")
    if not rows:
        return pa.table({"label": pa.array([], pa.string()),
                         "n_gold": pa.array([], pa.int64()),
                         "n_pred": pa.array([], pa.int64()),
                         "tp": pa.array([], pa.int64()),
                         "precision": pa.array([], pa.float64()),
                         "recall": pa.array([], pa.float64()),
                         "f1": pa.array([], pa.float64())})
    df = pa.concat_tables(rows).to_pandas()
    gold_m = df.groupby("g")["n"].sum()
    pred_m = df.groupby("p")["n"].sum()
    diag = df[df["g"] == df["p"]].set_index("g")["n"]
    labels = sorted(set(gold_m.index) | set(pred_m.index))
    out = {"label": [], "n_gold": [], "n_pred": [], "tp": [],
           "precision": [], "recall": [], "f1": []}
    for lab in labels:
        ng = int(gold_m.get(lab, 0))
        np_ = int(pred_m.get(lab, 0))
        tp = int(diag.get(lab, 0))
        prec = tp / np_ if np_ else 0.0
        rec = tp / ng if ng else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out["label"].append(lab)
        out["n_gold"].append(ng)
        out["n_pred"].append(np_)
        out["tp"].append(tp)
        out["precision"].append(round(prec, 6))
        out["recall"].append(round(rec, 6))
        out["f1"].append(round(f1, 6))
    return pa.table({
        "label": pa.array(out["label"], pa.string()),
        "n_gold": pa.array(out["n_gold"], pa.int64()),
        "n_pred": pa.array(out["n_pred"], pa.int64()),
        "tp": pa.array(out["tp"], pa.int64()),
        "precision": pa.array(out["precision"], pa.float64()),
        "recall": pa.array(out["recall"], pa.float64()),
        "f1": pa.array(out["f1"], pa.float64())})


def contingency_stats(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    nb: int = 16,
    max_cells: int = 100_000,
    round_to: int = 6,
) -> "pa.Table":
    """Chi-square test of independence + effect sizes between two
    categorical columns — the column-dependency profiler for schema
    discovery and annotation QA (is ``lang`` independent of
    ``source``? does annotator label depend on document domain?):

        chi2      = Σ_cells (o - e)² / e   with e = row_m · col_m / n
        cramers_v = sqrt(chi2 / (n · min(r-1, c-1)))
        mi        = Σ_cells p(a,b) · ln(p(a,b) / (p(a)p(b)))  [nats]

    Rows with a null on either side are excluded (no observation).
    Scale shape: ONE composite-key ``sum_by_key`` builds the (a, b)
    contingency census (map-side pre-combined — the shuffle carries at
    most |A|x|B| rows per block); only the census, bounded by
    ``max_cells``, is collected. Zero-observed cells contribute
    ``e`` to chi2; the closed form Σ o²/e − n needs only observed
    cells, and they contribute 0 to mi — so the full cross product is
    never enumerated. Returns ONE row ``(n, r, c, dof, chi2,
    cramers_v, mi)``; chi2/v/mi are null for degenerate tables
    (r < 2 or c < 2).
    """
    from .canonicalize import sum_by_key

    def census(t: pa.Table) -> pa.Table:
        a, b = t.column(col_a), t.column(col_b)
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        t = pa.table({"a": pc.cast(a, pa.string()),
                      "b": pc.cast(b, pa.string())}).filter(ok)
        return t.append_column(
            "n", pa.array(np.ones(t.num_rows, np.int64)))

    cen = sum_by_key(ds.map_batches(census, batch_format="pyarrow"),
                     ["a", "b"], "n", nb=nb)
    rows = []
    for b in cen.iter_batches(batch_format="pyarrow"):
        rows.append(pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b)
        if sum(r.num_rows for r in rows) > max_cells:
            raise ValueError(
                f"contingency census exceeds max_cells={max_cells} — "
                "contingency_stats is for bounded category vocabularies")

    def one(n, r, c, dof, chi2, v, mi):
        rnd = (lambda x: None if x is None
               else round(float(x), round_to))
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "r": pa.array([r], pa.int64()),
            "c": pa.array([c], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2": pa.array([rnd(chi2)], pa.float64()),
            "cramers_v": pa.array([rnd(v)], pa.float64()),
            "mi": pa.array([rnd(mi)], pa.float64())})

    if not rows:
        return one(0, 0, 0, 0, None, None, None)
    df = pa.concat_tables(rows).to_pandas()
    n = int(df["n"].sum())
    row_m = df.groupby("a")["n"].sum()
    col_m = df.groupby("b")["n"].sum()
    r, c = len(row_m), len(col_m)
    dof = (r - 1) * (c - 1)
    if dof == 0:
        return one(n, r, c, 0, None, None, None)
    ra = row_m[df["a"]].to_numpy(dtype=np.float64)
    cb = col_m[df["b"]].to_numpy(dtype=np.float64)
    o = df["n"].to_numpy(dtype=np.float64)
    # Σ_all (o-e)²/e = Σ_obs o²/e − n  (zero cells add 0 to the sum)
    chi2 = float(np.sum(o * o * n / (ra * cb))) - n
    v = float(np.sqrt(max(chi2, 0.0) / (n * min(r - 1, c - 1))))
    mi = float(np.sum((o / n) * np.log(o * n / (ra * cb))))
    return one(n, r, c, dof, chi2, v, mi)


def welch_ttest(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    round_to: int = 4,
) -> "pa.Table":
    """Welch's unequal-variance two-sample t-test between two named
    groups — the A/B-experiment readout (did treatment docs score
    higher than control?) computed from per-group sufficient
    statistics (n, Σx, Σx²): map-side partials, one six-double
    reduce, driver-free arithmetic.

        t  = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)² /
             ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))

    with v = sample variance (ddof=1). Null values are skipped. t/df
    are null when either group has < 2 values or both variances are
    zero. Returns ONE row ``(n_a, n_b, mean_a, mean_b, var_a, var_b,
    t_stat, df)``; floats rounded to ``round_to`` dp (sufficient-stat
    sums are order-sensitive at the 1e-12 relative level).
    """
    from ray.data.aggregate import Sum

    names = {group_a: "a", group_b: "b"}

    def partial(batch: pa.Table) -> pa.Table:
        g = pc.cast(batch.column(group_col), pa.string())
        keep = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = pa.table({"g": g, "x": pc.cast(
            batch.column(value_col), pa.float64())}).filter(
                pc.fill_null(keep, False))
        t = t.filter(pc.is_valid(t.column("x")))
        x = t.column("x").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": t.column("g").to_pandas(),
                           "n": np.ones(len(x), np.float64),
                           "sx": x, "sxx": x * x})
        out = df.groupby("g", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    st = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby("g")
          .aggregate(*[Sum(c, alias_name=c)
                       for c in ("n", "sx", "sxx")]))
    stats = {"a": (0.0, 0.0, 0.0), "b": (0.0, 0.0, 0.0)}
    for b in st.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b
        for i in range(t.num_rows):
            gname = t.column("g")[i].as_py()
            if gname in names:
                stats[names[gname]] = (
                    float(t.column("n")[i].as_py()),
                    float(t.column("sx")[i].as_py()),
                    float(t.column("sxx")[i].as_py()))

    def mv(n, sx, sxx):
        if n < 2:
            return (sx / n if n else None), None
        m = sx / n
        return m, max(sxx - sx * sx / n, 0.0) / (n - 1)

    na, sxa, sxxa = stats["a"]
    nb_, sxb, sxxb = stats["b"]
    ma, va = mv(na, sxa, sxxa)
    mb, vb = mv(nb_, sxb, sxxb)
    t_stat = dfree = None
    if va is not None and vb is not None:
        se2 = va / na + vb / nb_
        if se2 > 0:
            t_stat = (ma - mb) / np.sqrt(se2)
            dfree = se2 * se2 / ((va / na) ** 2 / (na - 1)
                                 + (vb / nb_) ** 2 / (nb_ - 1))
    rnd = (lambda x: None if x is None else round(float(x), round_to))
    return pa.table({
        "n_a": pa.array([int(na)], pa.int64()),
        "n_b": pa.array([int(nb_)], pa.int64()),
        "mean_a": pa.array([rnd(ma)], pa.float64()),
        "mean_b": pa.array([rnd(mb)], pa.float64()),
        "var_a": pa.array([rnd(va)], pa.float64()),
        "var_b": pa.array([rnd(vb)], pa.float64()),
        "t_stat": pa.array([rnd(t_stat)], pa.float64()),
        "df": pa.array([rnd(dfree)], pa.float64())})


def diversity_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    cat_col: str,
    nb: int = 16,
    round_to: int = 6,
) -> "ray.data.Dataset":
    """Per-key categorical diversity — Shannon entropy (nats) and
    Simpson concentration of ``cat_col``'s distribution within each
    key: the "is this domain all one boilerplate page type?" /
    "source mix per language" corpus-balance profiler.

        shannon = −Σ_c p_c · ln(p_c)      simpson = Σ_c p_c²

    Null categories are excluded; a key whose rows are all-null is
    absent. Scale shape: ONE composite (key, cat) census shuffle
    (map-side pre-combined), then a key-bucket reduce over census rows
    only — |keys|·|cats| rows move, never the data. Output: one row
    per key ``(key, n, k_distinct, shannon, simpson)``.
    """
    from .canonicalize import _B, _add_bucket, sum_by_key

    def census(t: pa.Table) -> pa.Table:
        k, c = t.column(key_col), t.column(cat_col)
        ok = pc.and_(pc.is_valid(k), pc.is_valid(c))
        t = pa.table({"k": k, "c": pc.cast(c, pa.string())}).filter(ok)
        return t.append_column(
            "n", pa.array(np.ones(t.num_rows, np.int64)))

    cen = sum_by_key(ds.map_batches(census, batch_format="pyarrow"),
                     ["k", "c"], "n", nb=nb)

    def bucketize(t: pa.Table) -> pa.Table:
        return _add_bucket(t, ["k"], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        gb = df.groupby("k", sort=False)["n"]
        tot = gb.sum()
        p = df["n"].to_numpy(np.float64) / tot[df["k"]].to_numpy(
            np.float64)
        df = df.assign(_plogp=-p * np.log(p), _p2=p * p)
        agg = df.groupby("k", sort=False).agg(
            n=("n", "sum"), k_distinct=("c", "size"),
            shannon=("_plogp", "sum"), simpson=("_p2", "sum"))
        agg = agg.reset_index()
        return pa.table({
            key_col: pa.Array.from_pandas(agg["k"]),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "k_distinct": pa.array(
                agg["k_distinct"].to_numpy(np.int64)),
            "shannon": pa.array(
                np.round(agg["shannon"].to_numpy(np.float64),
                         round_to)),
            "simpson": pa.array(
                np.round(agg["simpson"].to_numpy(np.float64),
                         round_to))})

    return (cen.map_batches(bucketize, batch_format="pyarrow",
                            batch_size=65536)
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))


def kmv_setops(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    group_a: str,
    group_b: str,
    k: int = 256,
    nb: int = 16,
    round_to: int = 4,
) -> "pa.Table":
    """KMV (k-minimum-values) bottom-k distinct sketches with set
    operations — mergeable distinct-cardinality estimates for two
    groups plus their union/intersection ("how many users do these
    two event types share?") without any distinct-count shuffle of
    the full key space:

        est(S) = k_kept            if fewer than k distinct hashes
               = (k − 1) / h_k     else, h_k = k-th smallest md5/2³²
        est(A∪B) from the merged bottom-k; est(A∩B) by
        inclusion–exclusion, clamped at ≥ 0.

    md5-replayable end to end (same ``md5_u32`` convention as
    train/test splitting), so a SQL oracle can re-derive every number
    exactly. Scale shape: per-block bottom-k per group (bounded
    map-side state), ONE census shuffle of ≤ 3k·blocks rows, driver
    sees ≤ 3k rows. Returns ONE row ``(est_a, est_b, est_union,
    est_intersect)`` rounded to ``round_to`` dp.
    """
    from ..functions.hashing import md5_u32
    from .canonicalize import _B, _add_bucket

    def hashes(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column(group_col), pa.string())
        keep = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        t = pa.table({"g": g, "i": t.column(item_col)}).filter(
            pc.fill_null(keep, False))
        t = t.filter(pc.is_valid(t.column("i")))
        h = md5_u32(t.column("i").to_pylist())
        out = pa.table({"g": t.column("g"), "h": pa.array(h)})
        # map-side combine: per group, distinct hashes, keep k smallest
        df = out.to_pandas().drop_duplicates()
        df = df.sort_values(["g", "h"], kind="mergesort")
        df = df.groupby("g", sort=False).head(k)
        return _add_bucket(
            pa.Table.from_pandas(df, preserve_index=False), ["g"], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(subset=["g", "h"])
        df = df.sort_values(["g", "h"], kind="mergesort")
        df = df.groupby("g", sort=False).head(k)
        return pa.Table.from_pandas(
            df[["g", "h"]], preserve_index=False)

    sk = (ds.map_batches(hashes, batch_format="pyarrow",
                         batch_size=65536)
          .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    parts = []
    for b in sk.iter_batches(batch_format="pyarrow"):
        parts.append(pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b)
    df = (pa.concat_tables(parts).to_pandas() if parts
          else pd.DataFrame({"g": [], "h": []}))

    def est(hs: "np.ndarray") -> float:
        hs = np.unique(hs)[:k]
        if len(hs) < k:
            return float(len(hs))
        return (k - 1) / (float(hs[-1]) / 4294967296.0)

    ha = df.loc[df["g"] == group_a, "h"].to_numpy(np.int64)
    hb = df.loc[df["g"] == group_b, "h"].to_numpy(np.int64)
    ea, eb = est(ha), est(hb)
    eu = est(np.concatenate([ha, hb]))
    ei = max(ea + eb - eu, 0.0)
    rnd = (lambda x: round(float(x), round_to))
    return pa.table({
        "est_a": pa.array([rnd(ea)], pa.float64()),
        "est_b": pa.array([rnd(eb)], pa.float64()),
        "est_union": pa.array([rnd(eu)], pa.float64()),
        "est_intersect": pa.array([rnd(ei)], pa.float64())})


def ks_test(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    nb: int = 16,
    max_distinct: int = 2_000_000,
    round_to: int = 6,
) -> "pa.Table":
    """Exact two-sample Kolmogorov–Smirnov statistic between two named
    groups — the distribution-shift detector (did today's crawl's
    page-length distribution drift from yesterday's?):

        D = sup_v |F_a(v) − F_b(v)|

    evaluated at every distinct value of the combined sample (where
    the sup of two step functions is attained). Null values carry no
    observation. Scale shape: ONE value census shuffle (map-side
    pre-combined (value, n_a, n_b) rows); only the census — bounded by
    ``max_distinct``, raises beyond it (quantize/bin upstream for
    continuous 100-TB columns) — is sorted driver-side for the
    cumulative walk. Returns ONE row ``(n_a, n_b, d_stat)``.
    """
    from ray.data.aggregate import Sum

    def census(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column(group_col), pa.string())
        v = pc.cast(t.column(value_col), pa.float64())
        keep = pc.and_(
            pc.or_(pc.equal(g, group_a), pc.equal(g, group_b)),
            pc.is_valid(v))
        t = pa.table({"g": g, "v": v}).filter(pc.fill_null(keep, False))
        df = t.to_pandas()
        isa = (df["g"] == group_a).to_numpy()
        out = pd.DataFrame({
            "v": df["v"],
            "na": isa.astype(np.int64),
            "nb": (~isa).astype(np.int64),
        }).groupby("v", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    cen = (ds.map_batches(census, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("v")
           .aggregate(Sum("na", alias_name="na"),
                      Sum("nb", alias_name="nb")))
    parts = []
    total = 0
    for b in cen.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b
        parts.append(t)
        total += t.num_rows
        if total > max_distinct:
            raise ValueError(
                f"value census exceeds max_distinct={max_distinct} — "
                "quantize the column upstream for ks_test at scale")
    if not parts:
        return pa.table({"n_a": pa.array([0], pa.int64()),
                         "n_b": pa.array([0], pa.int64()),
                         "d_stat": pa.array([None], pa.float64())})
    df = pa.concat_tables(parts).to_pandas().sort_values("v")
    na_tot = int(df["na"].sum())
    nb_tot = int(df["nb"].sum())
    if na_tot == 0 or nb_tot == 0:
        d = None
    else:
        fa = np.cumsum(df["na"].to_numpy(np.float64)) / na_tot
        fb = np.cumsum(df["nb"].to_numpy(np.float64)) / nb_tot
        d = round(float(np.max(np.abs(fa - fb))), round_to)
    return pa.table({
        "n_a": pa.array([na_tot], pa.int64()),
        "n_b": pa.array([nb_tot], pa.int64()),
        "d_stat": pa.array([d], pa.float64())})


def jackknife_mean(
    ds: "ray.data.Dataset",
    id_col: str,
    value_col: str,
    n_groups: int = 20,
    z: float = 1.96,
    round_to: int = 6,
) -> "pa.Table":
    """Delete-one-group jackknife standard error and CI for a column
    mean — the distributed-friendly uncertainty estimate (bootstrap
    needs resampling; the grouped jackknife needs ONE census): rows
    are assigned to ``n_groups`` deterministic md5 buckets by id, the
    G leave-one-group-out means are derived algebraically from the
    per-group (n, Σx) census, and

        se² = (G−1)/G · Σ_g (m_g − m̄_dot)²

    with m̄_dot the mean of the leave-one-out means. Null values carry
    no observation. Scale shape: map-side per-group partials, one
    G-row reduce, driver arithmetic on G doubles. md5-replayable
    end to end (same convention as train/test splitting), so a SQL
    oracle re-derives every number. Returns ONE row ``(n, mean, se,
    ci_lo, ci_hi)``; se/ci are null when any group is empty (G too
    large for the data) or G < 2.
    """
    import hashlib

    from ray.data.aggregate import Sum

    if n_groups < 2:
        raise ValueError("n_groups must be >= 2")

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64())
        keep = pc.is_valid(v)
        t2 = pa.table({"i": t.column(id_col), "x": v}).filter(keep)
        ids = t2.column("i").to_pylist()
        g = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             % n_groups for i in ids), np.int64, count=len(ids))
        x = t2.column("x").to_numpy(zero_copy_only=False)
        out = pd.DataFrame({
            "g": g, "n": np.ones(len(x), np.float64), "sx": x,
        }).groupby("g", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    st = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby("g")
          .aggregate(Sum("n", alias_name="n"),
                     Sum("sx", alias_name="sx")))
    rows = {r["g"]: (r["n"], r["sx"])
            for b in st.iter_batches(batch_format="pyarrow")
            for r in (pa.Table.from_batches([b]) if isinstance(
                b, pa.RecordBatch) else b).to_pylist()}
    n_tot = sum(r[0] for r in rows.values())
    sx_tot = sum(r[1] for r in rows.values())
    rnd = (lambda x: None if x is None else round(float(x), round_to))
    if n_tot == 0:
        return pa.table({
            "n": pa.array([0], pa.int64()),
            "mean": pa.array([None], pa.float64()),
            "se": pa.array([None], pa.float64()),
            "ci_lo": pa.array([None], pa.float64()),
            "ci_hi": pa.array([None], pa.float64())})
    mean = sx_tot / n_tot
    se = None
    if len(rows) == n_groups and all(
            r[0] > 0 and n_tot > r[0] for r in rows.values()):
        loo = np.array([(sx_tot - sx) / (n_tot - n)
                        for n, sx in rows.values()])
        se = float(np.sqrt((n_groups - 1) / n_groups
                           * np.sum((loo - loo.mean()) ** 2)))
    return pa.table({
        "n": pa.array([int(n_tot)], pa.int64()),
        "mean": pa.array([rnd(mean)], pa.float64()),
        "se": pa.array([rnd(se)], pa.float64()),
        "ci_lo": pa.array(
            [rnd(mean - z * se) if se is not None else None],
            pa.float64()),
        "ci_hi": pa.array(
            [rnd(mean + z * se) if se is not None else None],
            pa.float64())})


def kmv_pairwise(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    k: int = 256,
    nb: int = 16,
    max_groups: int = 64,
    round_to: int = 4,
) -> "pa.Table":
    """Pairwise corpus-overlap matrix from per-group KMV sketches —
    estimated distinct counts, union, and Jaccard for EVERY group
    pair ("how much do these sources/snapshots overlap?") at the cost
    of ONE pass + one bottom-k census; no pairwise shuffle of the
    data. Same md5-replayable estimator as ``kmv_setops``; the merged
    bottom-k of a pair is the bottom-k of the union, so every number
    is SQL-re-derivable. Groups are capped at ``max_groups`` (the
    G·k census and G² pairs live on the driver — raises beyond).
    Output: one row per unordered pair (g_a < g_b): ``(g_a, g_b,
    est_a, est_b, est_union, est_jaccard)``.
    """
    from ..functions.hashing import md5_u32
    from .canonicalize import _B, _add_bucket

    def hashes(t: pa.Table) -> pa.Table:
        g = pc.cast(t.column(group_col), pa.string())
        tt = pa.table({"g": g, "i": t.column(item_col)}).filter(
            pc.and_(pc.is_valid(g), pc.is_valid(t.column(item_col))))
        h = md5_u32(tt.column("i").to_pylist())
        df = pa.table({"g": tt.column("g"),
                       "h": pa.array(h)}).to_pandas().drop_duplicates()
        df = df.sort_values(["g", "h"], kind="mergesort")
        df = df.groupby("g", sort=False).head(k)
        return _add_bucket(
            pa.Table.from_pandas(df, preserve_index=False), ["g"], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.to_pandas().drop_duplicates(subset=["g", "h"])
        df = df.sort_values(["g", "h"], kind="mergesort")
        df = df.groupby("g", sort=False).head(k)
        return pa.Table.from_pandas(
            df[["g", "h"]], preserve_index=False)

    sk = (ds.map_batches(hashes, batch_format="pyarrow",
                         batch_size=65536)
          .groupby(_B).map_groups(finish, batch_format="pyarrow"))
    parts = []
    for b in sk.iter_batches(batch_format="pyarrow"):
        parts.append(pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b)
    df = (pa.concat_tables(parts).to_pandas() if parts
          else pd.DataFrame({"g": [], "h": []}))
    groups = sorted(df["g"].unique())
    if len(groups) > max_groups:
        raise ValueError(
            f"{len(groups)} groups exceeds max_groups={max_groups}")

    def est(hs: "np.ndarray") -> float:
        hs = np.unique(hs)[:k]
        if len(hs) < k:
            return float(len(hs))
        return (k - 1) / (float(hs[-1]) / 4294967296.0)

    by_g = {g: df.loc[df["g"] == g, "h"].to_numpy(np.int64)
            for g in groups}
    rnd = (lambda x: round(float(x), round_to))
    out = {"g_a": [], "g_b": [], "est_a": [], "est_b": [],
           "est_union": [], "est_jaccard": []}
    for i, ga in enumerate(groups):
        for gb in groups[i + 1:]:
            ea, eb = est(by_g[ga]), est(by_g[gb])
            eu = est(np.concatenate([by_g[ga], by_g[gb]]))
            ei = max(ea + eb - eu, 0.0)
            out["g_a"].append(ga)
            out["g_b"].append(gb)
            out["est_a"].append(rnd(ea))
            out["est_b"].append(rnd(eb))
            out["est_union"].append(rnd(eu))
            out["est_jaccard"].append(
                rnd(ei / eu) if eu > 0 else 0.0)
    return pa.table({
        "g_a": pa.array(out["g_a"], pa.string()),
        "g_b": pa.array(out["g_b"], pa.string()),
        "est_a": pa.array(out["est_a"], pa.float64()),
        "est_b": pa.array(out["est_b"], pa.float64()),
        "est_union": pa.array(out["est_union"], pa.float64()),
        "est_jaccard": pa.array(out["est_jaccard"], pa.float64())})


# Poisson(1) inverse-CDF thresholds for the bootstrap draw, embedded
# as shared literals so the DuckDB twin replays them bit-exactly:
# P(X <= k) for k = 0..8; draws land in bucket k via searchsorted.
POISSON1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988747974021)


def bootstrap_ci(
    ds: "ray.data.Dataset",
    id_col: str,
    value_col: str,
    n_replicates: int = 50,
    seed: int = 0,
    alpha: float = 0.05,
    nb: int = 16,
) -> pa.Table:
    """Percentile BOOTSTRAP confidence interval for the mean with NO
    RNG state — Efron's bootstrap via the Poisson approximation (each
    row enters replicate b with weight ~ Poisson(1)), every draw
    ``md5(f"{id}:{b}:{seed}")`` so a failed 100-TB job re-runs to the
    identical interval and a SQL engine can replay it. The classic
    "resample the dataset B times" is impossible at scale; Poisson
    bootstrap needs ONE streaming pass (Chamandy et al. 2012,
    public).

    Shape: per batch, a (replicate, Σwx, Σw) partial — B rows per
    batch regardless of data size — then one tiny ``sum_by_key``
    over the replicate id; the driver touches only B means. Null
    values are excluded (SQL AVG semantics). Output: ONE row
    ``(mean, lo, hi, n, n_replicates)`` with the (alpha/2,
    1-alpha/2) percentile interval (linear interpolation ==
    ``quantile_cont``)."""
    from ..functions.hashing import md5_u32
    from .canonicalize import sum_by_key

    if n_replicates < 2:
        raise ValueError("bootstrap_ci: need >= 2 replicates")
    thr = np.array(POISSON1_CDF) * 4294967296.0

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        # null ids excluded too: a null id would hash as 'None' and
        # give every null-id row the same (correlated) weight stream,
        # and the SQL twin's md5(NULL || ...) is NULL -> weight 0
        ok = pc.and_(pc.is_valid(v), pc.is_valid(t.column(id_col)))
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.invert(pc.fill_null(
                pc.is_nan(v), False)))
        t2 = t.filter(ok)
        x = t2.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        ids = pc.cast(t2.column(id_col), pa.string()).to_pylist()
        draws = np.empty((len(ids), n_replicates), np.float64)
        for b in range(n_replicates):
            draws[:, b] = md5_u32(
                [f"{i}:{b}:{seed}" for i in ids]).astype(np.float64)
        w = np.searchsorted(thr, draws, side="left").astype(
            np.float64)
        return pa.table({
            "b": pa.array(np.arange(n_replicates, dtype=np.int64)),
            "swx": pa.array((w * x[:, None]).sum(axis=0)),
            "sw": pa.array(w.sum(axis=0)),
            "sx": pa.array(np.full(n_replicates, x.sum())),
            "n": pa.array(np.full(n_replicates, len(x), np.int64))})

    # driver reduce over B*n_batches tiny partial rows with
    # ORDER-INDEPENDENT fsum (sorted multiset — the IRLS contract),
    # so the interval is bit-deterministic under any block order
    import math

    rows = sorted(ds.map_batches(
        partial, batch_format="pyarrow").take_all(),
        key=lambda r: (r["b"], r["swx"], r["sw"]))
    per_b: "dict[int, tuple[list, list]]" = {}
    sx_parts, n_total = [], 0
    for r in rows:
        per_b.setdefault(r["b"], ([], []))
        per_b[r["b"]][0].append(r["swx"])
        per_b[r["b"]][1].append(r["sw"])
        if r["b"] == 0:
            sx_parts.append(r["sx"])
            n_total += r["n"]
    means = np.array([
        math.fsum(a) / math.fsum(b_) for a, b_ in
        (per_b[k] for k in sorted(per_b)) if math.fsum(b_) > 0])
    mean = math.fsum(sorted(sx_parts)) / n_total if n_total else None
    lo, hi = (float(np.quantile(means, alpha / 2)),
              float(np.quantile(means, 1 - alpha / 2))) \
        if len(means) else (None, None)
    return pa.table({
        "mean": pa.array([round(mean, 6) if mean is not None
                          else None], pa.float64()),
        "lo": pa.array([round(lo, 6) if lo is not None else None],
                       pa.float64()),
        "hi": pa.array([round(hi, 6) if hi is not None else None],
                       pa.float64()),
        "n": pa.array([n_total], pa.int64()),
        "n_replicates": pa.array([n_replicates], pa.int64())})


def bootstrap_ci_per_key(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    value_col: str,
    n_replicates: int = 30,
    seed: int = 0,
    alpha: float = 0.05,
    nb: int = 16,
) -> "ray.data.Dataset":
    """Per-key :func:`bootstrap_ci` — a percentile bootstrap interval
    for EVERY group's mean in one streaming pass (the per-segment
    error-bar question: "is type A's mean genuinely above type B's,
    or inside each other's CI?"). Same md5-Poisson draw contract
    (``POISSON1_CDF`` literals, draw keyed by id and replicate only,
    so a row's weights are identical whatever its key).

    Shape: per batch a (key, replicate, Σwx, Σw) partial —
    K·B rows per batch regardless of row count — plus one (key, Σx,
    n) row; ONE key-bucket shuffle; the per-bucket finisher reduces
    with sorted-multiset ``fsum`` (bit-deterministic under any block
    order) and takes numpy linear quantiles over the B replicate
    means. Null/NaN values excluded. Output: ``(key_col, mean, lo,
    hi, n, n_replicates)`` rounded to 6 dp; replicates whose total
    weight is 0 are skipped (quantile over the rest)."""
    import math

    from .canonicalize import _B, _add_bucket
    from ..functions.hashing import md5_u32

    if n_replicates < 2:
        raise ValueError("bootstrap_ci_per_key: need >= 2 replicates")
    thr = np.array(POISSON1_CDF) * 4294967296.0
    B = n_replicates

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        k = t.column(key_col)
        ok = pc.and_(pc.and_(pc.is_valid(v), pc.is_valid(k)),
                     pc.is_valid(t.column(id_col)))
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.invert(pc.fill_null(
                pc.is_nan(v), False)))
        t2 = t.filter(ok)
        x = t2.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        keys = pc.cast(t2.column(key_col), pa.string())
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        dic = keys.dictionary_encode()
        kidx = dic.indices.to_numpy(zero_copy_only=False)
        uk = dic.dictionary.to_pylist()
        K = len(uk)
        ids = pc.cast(t2.column(id_col), pa.string()).to_pylist()
        swx = np.zeros((K, B))
        sw = np.zeros((K, B))
        for b in range(B):
            u = md5_u32([f"{i}:{b}:{seed}" for i in ids]).astype(
                np.float64)
            w = np.searchsorted(thr, u, side="left").astype(
                np.float64)
            np.add.at(swx[:, b], kidx, w * x)
            np.add.at(sw[:, b], kidx, w)
        sx = np.zeros(K)
        nk = np.zeros(K, np.int64)
        np.add.at(sx, kidx, x)
        np.add.at(nk, kidx, 1)
        key_rep = np.repeat(np.arange(K), B)
        b_col = np.tile(np.arange(B, dtype=np.int64), K)
        # base-mean partials (sx, n) ride ONLY on the b==0 rows —
        # replicating them B times through the shuffle is pure waste
        not0 = b_col != 0
        out = pa.table({
            key_col: pa.array(np.array(uk, object)[key_rep],
                              pa.string()),
            "b": pa.array(b_col),
            "swx": pa.array(swx.ravel()),
            "sw": pa.array(sw.ravel()),
            "sx": pa.array(np.repeat(sx, B), mask=not0),
            "n": pa.array(np.repeat(nk, B), mask=not0)})
        return _add_bucket(out, [key_col], nb)

    def finish(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_B]).to_pandas()
        rows = {key_col: [], "mean": [], "lo": [], "hi": [],
                "n": [], "n_replicates": []}
        for key, kd in df.groupby(key_col, sort=True):
            means = []
            for b, bd in kd.groupby("b", sort=True):
                swx = math.fsum(sorted(bd["swx"]))
                sw = math.fsum(sorted(bd["sw"]))
                if sw > 0:
                    means.append(swx / sw)
            first_b = kd[kd["b"] == 0]
            n = int(first_b["n"].sum())
            mean = math.fsum(sorted(first_b["sx"])) / n
            rows[key_col].append(key)
            rows["mean"].append(round(mean, 6))
            rows["lo"].append(round(float(np.quantile(
                means, alpha / 2)), 6) if means else None)
            rows["hi"].append(round(float(np.quantile(
                means, 1 - alpha / 2)), 6) if means else None)
            rows["n"].append(n)
            rows["n_replicates"].append(B)
        return pa.table({
            key_col: pa.array(rows[key_col], pa.string()),
            "mean": pa.array(rows["mean"], pa.float64()),
            "lo": pa.array(rows["lo"], pa.float64()),
            "hi": pa.array(rows["hi"], pa.float64()),
            "n": pa.array(rows["n"], pa.int64()),
            "n_replicates": pa.array(rows["n_replicates"],
                                     pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(_B).map_groups(finish, batch_format="pyarrow"))
