"""Near-duplicate detection for training-data pipelines (graft-added).

Exact dedup lives in ``canonicalize.dedup_exact`` (hash-partition +
per-group first). This module adds the approximate family, each as the
canonical Ray Data shape:

  signatures (map_batches, vectorized numpy)
    → explode to (band/block, bucket_hash, doc_id, payload) rows
    → bucket-shuffle groupby → within-bucket candidate pairs
    → verify (signature similarity / hamming / exact Jaccard)
    → dedup pairs across bands (dedup_exact)

Partitioning assumption (documented per SURVEY.md guidance): bucket
groups are small (LSH is designed so collisions are rare); a
pathological bucket is capped at ``max_bucket`` members with a log
note rather than O(n²) blowup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .canonicalize import _add_bucket, _B as _BUCKET_COL, dedup_exact
from .textstats import batch_token_hashes, rolling_shingle_hashes  # noqa: E501
from .util import as_task_fn as _as_task_fn


DEDUP_STATS_ACTOR = "dedup_stats"
_STATS_HANDLES: dict = {}


@ray.remote(num_cpus=0)
class DedupStats:
    """Tiny named counter actor surfacing LSH hot-bucket truncation
    (the 'log note' promised by the docstring, made queryable). Created
    by the driver when ``stats_name`` is passed; finish tasks look it up
    by name and fire one RPC only when a group actually truncates."""

    def __init__(self):
        self.truncated_groups = 0
        self.dropped_members = 0
        self.fallback_pairs = 0

    def inc(self, truncated_groups: int, dropped_members: int, fallback_pairs: int):
        self.truncated_groups += truncated_groups
        self.dropped_members += dropped_members
        self.fallback_pairs += fallback_pairs

    def get(self) -> dict:
        return {
            "truncated_groups": self.truncated_groups,
            "dropped_members": self.dropped_members,
            "fallback_pairs": self.fallback_pairs,
        }


def get_dedup_stats(stats_name: str = DEDUP_STATS_ACTOR) -> dict:
    return ray.get(ray.get_actor(stats_name).get.remote())


def _bucketed_pairs(rows, sim_fn, threshold: float, nb: int,
                    max_bucket: int = 64, stats_name: str | None = None):
    """Coarse-bucket shuffle on (band_id, band_key) → run-scan pairing."""
    if stats_name is not None:
        # Keep the driver-side handle alive for the session (a named,
        # non-detached actor is GC'd once all handles drop).
        _STATS_HANDLES[stats_name] = DedupStats.options(
            name=stats_name, get_if_exists=True).remote()
    finish = _pairs_from_buckets(["band_id", "band_key"], sim_fn, threshold,
                                 max_bucket=max_bucket, stats_name=stats_name)
    bucketed = rows.map_batches(
        lambda t: _add_bucket(t, ["band_id", "band_key"], nb),
        batch_format="pyarrow", batch_size=65536,
    )
    return bucketed.groupby(_BUCKET_COL).map_groups(finish, batch_format="pyarrow")


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 minhash of a shingle-hash set (vectorized)."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n_shingles) universal hash; min over shingles.
        m = (np.outer(a, shingles) + b[:, None]) % _MERSENNE
    return m.min(axis=1)


class MinHashSignatures:
    """map_batches stage: text → (doc_id, band rows).

    Emits one row per (doc, band): band_key = hash of the band slice of
    the signature; carries the full signature bytes for the verify step
    (est. Jaccard = fraction of equal signature slots)."""

    def __init__(self, num_perm: int = 128, bands: int = 16, ngram: int = 3, seed: int = 42,
                 id_col: str = "doc_id", text_col: str = "text"):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm, seed)
        self.num_perm, self.bands, self.ngram = num_perm, bands, ngram
        self.rows_per_band = num_perm // bands
        self.id_col, self.text_col = id_col, text_col

    def _sig_bytes(self, sigs: np.ndarray, n: int) -> list[bytes]:
        allb = sigs.tobytes()
        per = self.num_perm * 8
        return [allb[i * per:(i + 1) * per] for i in range(n) for _ in range(self.bands)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pandas().fillna("")
        n = len(ids)
        th_per_doc = batch_token_hashes(texts)
        # Batch-wide minhash: all shingle sets concatenate into one flat
        # array; the (num_perm, shingles) universal hash computes per
        # CHUNK of docs and reduces per doc with minimum.reduceat — a
        # handful of numpy calls per ~64k shingles instead of ~10 per
        # document.
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            sh_list = [np.unique(rolling_shingle_hashes([], self.ngram, token_hashes=th))
                       for th in th_per_doc]
            lens = np.fromiter((len(s) for s in sh_list), np.int64, count=n)
            nonempty = np.flatnonzero(lens > 0)
            if len(nonempty):
                all_sh = np.concatenate([sh_list[i] for i in nonempty])
                csum = np.cumsum(lens[nonempty])
                starts_all = np.concatenate(([0], csum[:-1]))
                chunk_limit = 1 << 16
                i0, base = 0, 0
                while i0 < len(nonempty):
                    i1 = int(np.searchsorted(csum, base + chunk_limit, side="right"))
                    i1 = max(i1, i0 + 1)
                    sl = all_sh[base:csum[i1 - 1]]
                    st = starts_all[i0:i1] - base
                    m = (np.outer(self.a, sl) + self.b[:, None]) % _MERSENNE
                    sigs[nonempty[i0:i1]] = np.minimum.reduceat(m, st, axis=1).T
                    base, i0 = int(csum[i1 - 1]), i1
        # band keys: stable hash of each band slice
        band_view = sigs.reshape(n, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bk = band_view[:, :, 0].copy()
            for j in range(1, self.rows_per_band):
                bk = bk * np.uint64(1099511628211) + band_view[:, :, j]
        doc_rep = np.repeat(ids, self.bands)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "band_id": pa.array(band_id),
                "band_key": pa.array(bk.reshape(-1).view(np.int64)),
                "sig": pa.array(self._sig_bytes(sigs, n), pa.binary()),
            }
        )


def _pairs_from_buckets(group_cols: list[str], sim_fn, threshold: float,
                        max_bucket: int = 64, stats_name: str | None = None,
                        anchor_k: int = 8):
    """Build the within-bucket pairing finish fn (vectorized run-scan).

    Handles MANY (band, key) groups per call — callers group by a coarse
    hash bucket of (band, key), not by the keys themselves, so the
    per-group Python dispatch cost is per-BUCKET (the millions of tiny
    LSH buckets would otherwise each pay a map_groups invocation).

    Hot-bucket handling: a (band, key) group larger than ``max_bucket``
    is NOT silently truncated. The first ``max_bucket`` members get full
    pairwise comparison; every overflow member is additionally compared
    against the group's first ``anchor_k`` members (boilerplate-heavy
    hot buckets are near-cliques, so anchor pairs recover the dups the
    cap would have dropped at O(n·anchor_k) instead of O(n²)); and the
    truncation is REPORTED — a log line per finish task plus counters on
    the named ``DedupStats`` actor when the caller requested one."""

    def finish(g: pa.Table) -> pa.Table:
        drop = [c for c in (_BUCKET_COL,) if c in g.column_names]
        if drop:
            g = g.drop_columns(drop)
        df = g.to_pandas().sort_values(group_cols + ["doc_id"], kind="mergesort")
        # group boundaries: column-wise numpy neighbor compare (the
        # previous astype(str)+join built one Python string per row)
        change = np.zeros(len(df), dtype=bool)
        if len(df):
            change[0] = True
        for c in group_cols:
            arr = df[c].to_numpy()
            change[1:] |= arr[1:] != arr[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(df))
        ia, ib, sims = [], [], []
        ids = df["doc_id"].to_numpy()
        payload = df["sig"].to_numpy() if "sig" in df else None

        def emit(x: int, y: int) -> bool:
            if ids[x] == ids[y]:
                return False
            s = sim_fn(payload[x], payload[y]) if payload is not None else 1.0
            if s >= threshold:
                lo, hi = sorted((ids[x], ids[y]))
                ia.append(lo); ib.append(hi); sims.append(s)
                return True
            return False

        truncated_groups = dropped = fallback_pairs = 0
        for st, en in zip(starts, ends):
            m = min(en - st, max_bucket)
            for x in range(st, st + m):
                for y in range(x + 1, st + m):
                    emit(x, y)
            if en - st > max_bucket:
                truncated_groups += 1
                dropped += (en - st) - max_bucket
                a_k = min(anchor_k, m)
                for x in range(st + max_bucket, en):
                    for y in range(st, st + a_k):
                        if emit(y, x):
                            fallback_pairs += 1
        if truncated_groups:
            import logging

            logging.getLogger(__name__).warning(
                "LSH hot-bucket cap hit: %d group(s) over max_bucket=%d "
                "(%d overflow members routed through %d-anchor fallback, "
                "%d fallback pairs kept)",
                truncated_groups, max_bucket, dropped, anchor_k, fallback_pairs,
            )
            if stats_name is not None:
                try:
                    # ray.get so the increment is APPLIED before this task
                    # completes — a fire-and-forget send could still be in
                    # flight when the driver reads the counters after
                    # consuming the dataset (observed flake under load)
                    ray.get(ray.get_actor(stats_name).inc.remote(
                        truncated_groups, dropped, fallback_pairs))
                except ValueError:
                    pass  # actor not created (caller didn't request stats)
        return pa.table(
            {"id_a": pa.array(ia, pa.int64()), "id_b": pa.array(ib, pa.int64()),
             "similarity": pa.array(np.round(sims, 6), pa.float64())}
        )

    return finish


def _sig_similarity(sa: bytes, sb: bytes) -> float:
    a = np.frombuffer(sa, dtype=np.uint64)
    b = np.frombuffer(sb, dtype=np.uint64)
    return float((a == b).mean())


def minhash_near_dups(
    docs: "ray.data.Dataset",
    threshold: float = 0.7,
    num_perm: int = 128,
    bands: int = 16,
    ngram: int = 3,
    nb: int = 32,
    concurrency=None,
    max_bucket: int = 64,
    stats_name: str | None = None,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup pairs: (id_a, id_b, similarity≈Jaccard).

    Default runs the signature stage as plain tasks (per-process cached
    state, fuses with the read); pass ``concurrency`` to force an actor
    pool (only worth it if the stage state ever becomes expensive)."""
    kw = {"num_perm": num_perm, "bands": bands, "ngram": ngram}
    if concurrency is None:
        band_rows = docs.map_batches(_as_task_fn(MinHashSignatures, kw),
                                     batch_format="pyarrow")
    else:
        band_rows = docs.map_batches(
            MinHashSignatures, fn_constructor_kwargs=kw,
            batch_format="pyarrow", concurrency=concurrency,
        )
    pairs = _bucketed_pairs(band_rows, _sig_similarity, threshold, nb,
                            max_bucket=max_bucket, stats_name=stats_name)
    return dedup_exact(pairs, ["id_a", "id_b"], nb=nb)


# ---------------------------------------------------------------------------
class SimHashSignatures:
    """64-bit SimHash per doc + 4×16-bit block rows (pigeonhole: any
    pair with hamming ≤ 3 shares at least one identical block)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.bit_w = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)

    def simhash_from_hashes(self, th: np.ndarray) -> np.uint64:
        if len(th) == 0:
            return np.uint64(0)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        return np.uint64(((votes > 0).astype(np.uint64) * self.bit_w).sum(dtype=np.uint64))

    def simhash(self, tokens: list[str]) -> np.uint64:
        if not tokens:
            return np.uint64(0)
        th = pd.util.hash_pandas_object(pd.Series(tokens), index=False).to_numpy()
        return self.simhash_from_hashes(th)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pandas().fillna("")
        th_per_doc = batch_token_hashes(texts)
        with np.errstate(over="ignore"):
            sh = np.array([self.simhash_from_hashes(th) for th in th_per_doc], dtype=np.uint64)
        n = len(ids)
        blocks = np.empty((n, 4), dtype=np.uint64)
        for b in range(4):
            blocks[:, b] = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4)),
                "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(blocks.reshape(-1).view(np.int64)),
                "sig": pa.array([sh[i].tobytes() for i in range(n) for _ in range(4)], pa.binary()),
            }
        )


def _hamming_sim(sa: bytes, sb: bytes) -> float:
    a = np.frombuffer(sa, dtype=np.uint64)[0]
    b = np.frombuffer(sb, dtype=np.uint64)[0]
    return 1.0 - bin(int(a) ^ int(b)).count("1") / 64.0


def simhash_near_dups(
    docs: "ray.data.Dataset", max_hamming: int = 3, nb: int = 32, concurrency=None,
    max_bucket: int = 64, stats_name: str | None = None,
) -> "ray.data.Dataset":
    """SimHash near-dup pairs (hamming distance ≤ max_hamming)."""
    threshold = 1.0 - max_hamming / 64.0 - 1e-9
    if concurrency is None:
        rows = docs.map_batches(_as_task_fn(SimHashSignatures, {}), batch_format="pyarrow")
    else:
        rows = docs.map_batches(SimHashSignatures, batch_format="pyarrow",
                                concurrency=concurrency)
    pairs = _bucketed_pairs(rows, _hamming_sim, threshold, nb,
                            max_bucket=max_bucket, stats_name=stats_name)
    return dedup_exact(pairs, ["id_a", "id_b"], nb=nb)


# ---------------------------------------------------------------------------
def ngram_jaccard_verify(
    docs: "ray.data.Dataset",
    candidate_pairs: pa.Table,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    nb: int = 16,
) -> pa.Table:
    """Exact n-gram Jaccard for candidate pairs — DISTRIBUTED (round-1
    verdict item: no driver-side shingle LUT).

    Shingle sets never leave the cluster: only the candidate ID set
    (ints, ≪ shingle payload) is broadcast to prune the corpus scan.
    Sets meet their pairs through two bucket shuffles —

      docs → shingles(doc)  ┐ union, bucket by doc_id → attach shingles
      pairs → (pair, role)  ┘ to each pair role row
      → bucket by pair_id → the pair's two sets co-locate → exact
        Jaccard → (pair_id, similarity), collected (one float per pair;
        the pairs table is a driver-sized input by contract).

    Partitioning assumption: a bucket's shingle rows fit in one task
    (tune ``nb``); a doc's set is replicated only to the pairs that
    reference it."""
    import pyarrow.compute as pc

    import ray

    n_pairs = len(candidate_pairs)
    if n_pairs == 0:
        return candidate_pairs
    ia = candidate_pairs.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
    ib = candidate_pairs.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
    pair_id = np.arange(n_pairs, dtype=np.int64)
    empty_sh = pa.nulls(2 * n_pairs, pa.list_(pa.int64()))
    role_rows = pa.table({
        "doc_id": pa.array(np.concatenate([ia, ib])),
        "pair_id": pa.array(np.concatenate([pair_id, pair_id])),
        "role": pa.array(np.concatenate([np.zeros(n_pairs, np.int8),
                                         np.ones(n_pairs, np.int8)])),
        "shingles": empty_sh,
    })
    needed_arr = pa.array(np.unique(np.concatenate([ia, ib])), pa.int64())
    ref = ray.put(needed_arr)

    def shingles_of(batch: pa.Table) -> pa.Table:
        needed = ray.get(ref)
        sel = pc.is_in(batch.column(id_col), value_set=needed)
        b = batch.filter(sel)
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b.column(text_col).to_pandas().fillna("")
        th_per_doc = batch_token_hashes(texts)
        sets = []
        with np.errstate(over="ignore"):
            for th in th_per_doc:
                sets.append(np.unique(rolling_shingle_hashes([], ngram, token_hashes=th))
                            .view(np.int64))
        return pa.table({
            "doc_id": pa.array(ids),
            "pair_id": pa.array(np.full(len(ids), -1, np.int64)),
            "role": pa.array(np.full(len(ids), -1, np.int8)),
            "shingles": pa.array([s.tolist() for s in sets], pa.list_(pa.int64())),
        })

    shingle_rows = docs.map_batches(shingles_of, batch_format="pyarrow")
    both = shingle_rows.union(ray.data.from_arrow(role_rows))
    bucketed = both.map_batches(lambda t: _add_bucket(t, ["doc_id"], nb),
                                batch_format="pyarrow", batch_size=65536)

    def attach(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL]).to_pandas()
        is_sh = df["role"] == -1
        lut = dict(zip(df.loc[is_sh, "doc_id"], df.loc[is_sh, "shingles"]))
        out = df[~is_sh]
        sh = [list(lut[d]) if lut.get(d) is not None else []
              for d in out["doc_id"]]
        return pa.table({
            "pair_id": pa.array(out["pair_id"].to_numpy(), pa.int64()),
            "role": pa.array(out["role"].to_numpy(), pa.int8()),
            "shingles": pa.array(sh, pa.list_(pa.int64())),
        })

    attached = bucketed.groupby(_BUCKET_COL).map_groups(attach, batch_format="pyarrow")
    rebucketed = attached.map_batches(lambda t: _add_bucket(t, ["pair_id"], nb),
                                      batch_format="pyarrow", batch_size=65536)

    def score(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL]).to_pandas()
        pids, sims = [], []
        for pid, grp in df.groupby("pair_id", sort=False):
            sets = {r.role: set(r.shingles if r.shingles is not None else [])
                    for r in grp.itertuples()}
            sa, sb = sets.get(0, set()), sets.get(1, set())
            union = len(sa | sb)
            pids.append(pid)
            sims.append(len(sa & sb) / union if union else 0.0)
        return pa.table({"pair_id": pa.array(pids, pa.int64()),
                         "similarity": pa.array(np.round(sims, 6), pa.float64())})

    scored = rebucketed.groupby(_BUCKET_COL).map_groups(score, batch_format="pyarrow").to_pandas()
    sim = np.zeros(n_pairs)
    sim[scored["pair_id"].to_numpy()] = scored["similarity"].to_numpy()
    return candidate_pairs.set_column(
        candidate_pairs.schema.get_field_index("similarity"), "similarity",
        pa.array(np.round(sim, 6), pa.float64()),
    )


# ---------------------------------------------------------------------------
class CosineLSHSignatures:
    """Random-hyperplane LSH for embedding near-dup: T tables × B bits."""

    def __init__(self, dim: int, tables: int = 4, bits: int = 16, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((tables, bits, dim)).astype(np.float32)
        self.tables, self.bits = tables, bits
        self.id_col, self.vec_col = id_col, vec_col
        self.bit_w = (1 << np.arange(bits)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        V = np.stack(batch.column(self.vec_col).to_pandas().to_numpy())
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        keys = np.empty((n, self.tables), dtype=np.int64)
        for t in range(self.tables):
            proj = Vn @ self.planes[t].T  # (n, bits)
            keys[:, t] = ((proj > 0).astype(np.int64) * self.bit_w).sum(axis=1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.tables).astype(np.int64)),
                "band_id": pa.array(np.tile(np.arange(self.tables, dtype=np.int32), n)),
                "band_key": pa.array(keys.reshape(-1)),
                "sig": pa.array([Vn[i].astype(np.float32).tobytes() for i in range(n) for _ in range(self.tables)], pa.binary()),
            }
        )


def _cosine_sim(sa: bytes, sb: bytes) -> float:
    a = np.frombuffer(sa, dtype=np.float32)
    b = np.frombuffer(sb, dtype=np.float32)
    return float(np.dot(a, b))


def embedding_near_dups(
    vecs: "ray.data.Dataset",
    dim: int,
    threshold: float = 0.9,
    tables: int = 8,
    bits: int = 12,
    nb: int = 32,
    concurrency=None,
    max_bucket: int = 64,
    stats_name: str | None = None,
) -> "ray.data.Dataset":
    """Embedding-cosine near-dup pairs via random-hyperplane LSH."""
    kw = {"dim": dim, "tables": tables, "bits": bits}
    if concurrency is None:
        rows = vecs.map_batches(_as_task_fn(CosineLSHSignatures, kw), batch_format="pyarrow")
    else:
        rows = vecs.map_batches(
            CosineLSHSignatures, fn_constructor_kwargs=kw,
            batch_format="pyarrow", concurrency=concurrency,
        )
    pairs = _bucketed_pairs(rows, _cosine_sim, threshold, nb,
                            max_bucket=max_bucket, stats_name=stats_name)
    return dedup_exact(pairs, ["id_a", "id_b"], nb=nb)


# ---------------------------------------------------------------------------
def dup_clusters(
    pairs,
    nb: int = 32,
    max_iters: int = 20,
) -> "ray.data.Dataset":
    """Near-duplicate pairs → duplicate CLUSTERS: connected components
    of the pair graph as (doc_id, cluster_rep) with cluster_rep = the
    component's minimum doc id (keep cluster_rep, drop the rest — the
    standard dedup decision rule).

    Iterative distributed min-label propagation, Ray-Data-first: the
    edge list is materialized once; each round ships every node's
    current label across its edges (one bucket-shuffle hash join) and
    reduces per node with a map-side-combined min (second shuffle).
    Converges in O(component diameter) rounds — near-dup clusters are
    shallow — and early-stops on the label-sum fixpoint (the sum is
    strictly decreasing while any label changes, so one cheap scalar
    aggregate replaces an old-vs-new diff join)."""
    import ray.data as rd

    from .join import shuffle_hash_join

    pairs_ds = rd.from_arrow(pairs) if isinstance(pairs, pa.Table) else pairs

    def expand(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").combine_chunks()
        b = batch.column("id_b").combine_chunks()
        return pa.table({"src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                         "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])})

    edges = pairs_ds.map_batches(expand, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "cluster_rep": pa.array([], pa.int64())}))

    def _min_label(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        def local(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas().groupby("node", as_index=False)["label"].min()
            return _add_bucket(pa.Table.from_pandas(df, preserve_index=False), ["node"], nb)

        def finish(g: pa.Table) -> pa.Table:
            df = g.drop_columns([_BUCKET_COL]).to_pandas()
            out = df.groupby("node", as_index=False)["label"].min()
            return pa.Table.from_pandas(out, preserve_index=False)

        return (ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
                .groupby(_BUCKET_COL).map_groups(finish, batch_format="pyarrow"))

    labels = _min_label(edges.map_batches(
        lambda t: pa.table({"node": t.column("src"), "label": t.column("src")}),
        batch_format="pyarrow")).materialize()

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        as_src = labels.map_batches(
            lambda t: t.rename_columns(["src", "label"]), batch_format="pyarrow")
        msgs = shuffle_hash_join(edges, as_src, on=["src"], how="inner", nb=nb)
        msgs = msgs.map_batches(
            lambda t: pa.table({"node": t.column("dst").cast(pa.int64()),
                                "label": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow")
        labels = _min_label(msgs.union(labels)).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # a component with diameter > max_iters would report MULTIPLE
        # representatives — never return silently-wrong clusters
        raise RuntimeError(
            f"dup_clusters did not converge within max_iters={max_iters} "
            "(a duplicate component's diameter exceeds it) — raise max_iters")
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_rep"]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
def _apply_doc_removals(
    docs: "ray.data.Dataset",
    removal_rows: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    nb: int,
    unit_col: str,
    per_doc,
) -> "ray.data.Dataset":
    """Shared stage-3 of the corpus-dedup family: union the docs with
    their removal coordinates (``(id_col, pos)`` rows), co-locate by a
    doc_id bucket, and rebuild each doc via ``per_doc(text, drops) ->
    (clean_text, n_units, n_removed)`` (``text`` is never None —
    nulls arrive as ``''``; ``drops`` is an int64 position array or
    None). Output: ``id_col, text_col, unit_col, n_removed``."""
    def tag_doc(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "pos": pa.array(np.full(len(batch), -1, np.int64)),
            text_col: batch.column(text_col),
        })
        return _add_bucket(t, [id_col], nb)

    def tag_removal(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: batch.column(id_col),
            "pos": batch.column("pos"),
            text_col: pa.nulls(len(batch), pa.string()),
        })
        return _add_bucket(t, [id_col], nb)

    both = docs.map_batches(tag_doc, batch_format="pyarrow",
                            batch_size=65536).union(
        removal_rows.map_batches(tag_removal, batch_format="pyarrow",
                                 batch_size=65536))

    def rebuild(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL]).to_pandas()
        is_doc = df["pos"].to_numpy() < 0
        drops_by_doc: dict[int, np.ndarray] = {}
        for did, grp in df[~is_doc].groupby(id_col, sort=False):
            drops_by_doc[did] = grp["pos"].to_numpy()
        out_ids, out_texts, n_unit, n_rm = [], [], [], []
        for did, text in zip(df.loc[is_doc, id_col], df.loc[is_doc, text_col]):
            clean, n, r = per_doc(text if isinstance(text, str) else "",
                                  drops_by_doc.get(did))
            out_ids.append(did); out_texts.append(clean)
            n_unit.append(n); n_rm.append(r)
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            text_col: pa.array(out_texts, pa.string()),
            unit_col: pa.array(n_unit, pa.int64()),
            "n_removed": pa.array(n_rm, pa.int64()),
        })

    return both.groupby(_BUCKET_COL).map_groups(rebuild,
                                                batch_format="pyarrow")


def remove_dup_spans(
    docs: "ray.data.Dataset",
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Corpus-wide duplicate-SPAN removal at token-window granularity —
    the exact-substring dedup of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better") approximated on
    word k-gram windows instead of a byte suffix array: any window of
    ``k`` tokens that occurs ≥ 2 times anywhere in the corpus (other
    docs OR the same doc) is a duplicate span; every token covered by a
    duplicated window is dropped, except that with ``keep_first`` the
    globally first occurrence (min ``(doc_id, pos)``) of each window
    keeps its tokens. Overlapping duplicated windows merge into maximal
    spans via the coverage mask, so a long replicated passage is
    removed as one piece wherever it re-occurs.

    Output: ``id_col, text (cleaned), n_tokens, n_removed`` — one row
    per input doc, order not guaranteed. Tokenization is whitespace
    ``str.split`` and the cleaned text re-joins surviving tokens with
    single spaces (whitespace is NOT byte-preserved; runs of
    whitespace collapse — the standard trade for token-level dedup).

    Scale shape (100-TB): window identity travels as a 64-bit rolling
    hash over per-token hashes — never the token text. Stage 1 streams
    the corpus once emitting (gh, doc, pos) occurrence triples bucketed
    by gh; stage 2 decides duplicate occurrences entirely inside each
    gh-bucket (a window's occurrences all land in one bucket, so the
    global keep-first winner is exact); stage 3 moves only the removal
    coordinates (two int64s per duplicated window — tiny next to the
    text) through a doc_id-bucketed shuffle where each doc meets its
    removal list and applies one vectorized diff-array coverage mask.
    The text column itself is shuffled once (stage 3); no all-pairs
    stage, no driver-side state. Hash collisions merge two distinct
    windows with odds ~m²/2⁶⁵ — negligible at any real corpus size.

    Partitioning assumption: one gh-bucket's occurrence rows fit in a
    task (tune ``nb`` up with corpus size); a pathological corpus that
    is one window repeated everywhere concentrates in one bucket —
    pre-shard such keys by salting nb upward.
    """
    if k < 2:
        raise ValueError(f"remove_dup_spans: k must be ≥ 2, got {k}")
    P = np.uint64(1099511628211)
    occ_schema = pa.schema([
        pa.field("gh", pa.int64()), pa.field(id_col, pa.int64()),
        pa.field("pos", pa.int64()),
    ])

    def occurrences(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        texts = df[text_col].fillna("")
        toks = [t.split() for t in texts]
        lengths = np.fromiter((len(x) for x in toks), dtype=np.int64,
                              count=len(toks))
        flat = [w for ws in toks for w in ws]
        if not flat:
            return _add_bucket(occ_schema.empty_table(), ["gh"], nb)
        th = pd.util.hash_pandas_object(pd.Series(flat), index=False).to_numpy()
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        m = len(th) - k + 1
        if m <= 0:
            return _add_bucket(occ_schema.empty_table(), ["gh"], nb)
        with np.errstate(over="ignore"):
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                acc = acc * P + th[j : m + j]
        valid = doc_idx[:m] == doc_idx[k - 1 :]
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        widx = np.arange(m, dtype=np.int64)[valid]
        d = doc_idx[:m][valid]
        occ = pa.table({
            "gh": pa.array(acc[valid].view(np.int64)),
            id_col: pa.array(df[id_col].to_numpy()[d].astype(np.int64)),
            "pos": pa.array(widx - starts[d]),
        })
        return _add_bucket(occ, ["gh"], nb)

    def removals(g: pa.Table) -> pa.Table:
        gh = g.column("gh").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids, gh))
        gh, ids, pos = gh[order], ids[order], pos[order]
        new_group = np.empty(len(gh), bool)
        new_group[0] = True
        np.not_equal(gh[1:], gh[:-1], out=new_group[1:])
        # group size broadcast to every member
        bounds = np.flatnonzero(new_group)
        sizes = np.diff(np.append(bounds, len(gh)))
        size_per_row = np.repeat(sizes, sizes)
        dup = size_per_row >= 2
        drop = dup & ~new_group if keep_first else dup
        return pa.table({id_col: pa.array(ids[drop]),
                         "pos": pa.array(pos[drop])})

    removal_rows = (
        docs.map_batches(occurrences, batch_format="pyarrow",
                         batch_size=65536)
        .groupby(_BUCKET_COL).map_groups(removals, batch_format="pyarrow")
    )

    def per_doc(text: str, starts):
        toks = text.split()
        n = len(toks)
        if starts is None or n == 0:
            return " ".join(toks), n, 0
        diff = np.zeros(n + 1, np.int64)
        np.add.at(diff, starts, 1)
        np.add.at(diff, np.minimum(starts + k, n), -1)
        covered = np.cumsum(diff[:-1]) > 0
        kept = [t for t, c in zip(toks, covered) if not c]
        return " ".join(kept), n, int(covered.sum())

    return _apply_doc_removals(docs, removal_rows, id_col, text_col, nb,
                               "n_tokens", per_doc)


# ---------------------------------------------------------------------------
def dedup_lines(
    docs: "ray.data.Dataset",
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
    min_count: int = 2,
    nb: int = 32,
) -> "ray.data.Dataset":
    """Corpus-wide duplicate-LINE removal (the CCNet/RefinedWeb
    paragraph-dedup pass): split every doc on ``sep``, drop each line
    whose exact text occurs ≥ ``min_count`` times anywhere in the
    corpus — except, with ``keep_first``, the globally first occurrence
    (min ``(doc_id, position)``). Reconstruction re-joins the surviving
    lines with ``sep``, so docs are byte-identical where nothing was
    removed (split semantics are Python ``str.split(sep)`` ==
    DuckDB ``string_split``: empty segments between consecutive
    separators are lines too and dedup like any other).

    Output: ``id_col, text (cleaned), n_lines, n_removed`` — one row
    per input doc (null text behaves as ``''``). Exact-string
    semantics: occurrences are BUCKETED by a 64-bit line hash but the
    keep/drop decision groups on the line text itself, so there is no
    collision risk at any scale (the line strings ride through the
    one decision shuffle — they are the corpus payload anyway; at
    extreme scale swap the carried string for a 128-bit digest).

    Scale shape: stage 1 streams the corpus once, exploding to
    (hash, line, doc, pos) rows; one bucket shuffle co-locates every
    occurrence of a line (global keep-first is exact inside its
    bucket); only removal coordinates (two int64s per dropped line)
    meet the docs in a second doc_id-bucketed shuffle where one
    vectorized mask per doc rebuilds the text. No driver-side state,
    no all-pairs stage. SQL twin: row_number/count OVER (PARTITION BY
    line) + string_agg reconstruction (see the ``dedup_lines_docs``
    oracle)."""
    if min_count < 2:
        raise ValueError(f"dedup_lines: min_count must be ≥ 2, got {min_count}")
    occ_schema = pa.schema([
        pa.field("lh", pa.int64()), pa.field("line", pa.string()),
        pa.field(id_col, pa.int64()), pa.field("pos", pa.int64()),
    ])

    def occurrences(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        split = df[text_col].fillna("").str.split(sep, regex=False)
        lengths = split.str.len().to_numpy(dtype=np.int64)
        flat = [ln for lines in split for ln in lines]
        if not flat:
            return _add_bucket(occ_schema.empty_table(), ["lh"], nb)
        lh = pd.util.hash_pandas_object(
            pd.Series(flat), index=False).to_numpy().view(np.int64)
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        pos = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
        occ = pa.table({
            "lh": pa.array(lh),
            "line": pa.array(flat, pa.string()),
            id_col: pa.array(df[id_col].to_numpy()[doc_idx].astype(np.int64)),
            "pos": pa.array(pos),
        })
        return _add_bucket(occ, ["lh"], nb)

    def removals(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL, "lh"]).to_pandas()
        df = df.sort_values(["line", id_col, "pos"], kind="stable")
        grp = df.groupby("line", sort=False)
        cnt = grp["pos"].transform("size").to_numpy()
        rn = grp.cumcount().to_numpy()
        drop = (cnt >= min_count) if not keep_first else \
            (cnt >= min_count) & (rn > 0)
        out = df[drop]
        return pa.table({id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
                         "pos": pa.array(out["pos"].to_numpy(), pa.int64())})

    removal_rows = (
        docs.map_batches(occurrences, batch_format="pyarrow",
                         batch_size=65536)
        .groupby(_BUCKET_COL).map_groups(removals, batch_format="pyarrow")
    )

    def per_doc(text: str, drops):
        lines = text.split(sep)
        if drops is None:
            return sep.join(lines), len(lines), 0
        mask = np.zeros(len(lines), bool)
        mask[drops] = True
        kept = [ln for ln, m in zip(lines, mask) if not m]
        return sep.join(kept), len(lines), int(mask.sum())

    return _apply_doc_removals(docs, removal_rows, id_col, text_col, nb,
                               "n_lines", per_doc)


# ---------------------------------------------------------------------------
def hash_near_dups(
    ds: "ray.data.Dataset",
    hash_col: str = "phash",
    id_col: str = "media_id",
    max_hamming: int = 6,
    nb: int = 32,
    max_bucket: int = 64,
    stats_name: str | None = None,
) -> "ray.data.Dataset":
    """Near-dup pairs over ANY 64-bit hash column (perceptual image
    pHash, audio fingerprints, simhashes computed elsewhere):
    pigeonhole the 64 bits into ``max_hamming + 1`` blocks — a pair
    within ``max_hamming`` differing bits must share at least one
    identical block — bucket-shuffle on (block_id, block_value), and
    verify candidates by exact hamming distance inside each bucket.
    Same scale shape as simhash_near_dups (one bucket shuffle, counted
    truncation guard via ``max_bucket``/``stats_name``)."""
    b = max_hamming + 1
    if not (2 <= b <= 64):
        raise ValueError(f"hash_near_dups: max_hamming must be in "
                         f"[1, 63], got {max_hamming}")
    widths = [64 // b + (1 if i < 64 % b else 0) for i in range(b)]
    shifts = np.cumsum([0] + widths[:-1]).astype(np.uint64)
    masks = np.array([(1 << w) - 1 for w in widths], np.uint64)
    threshold = 1.0 - max_hamming / 64.0 - 1e-9

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = batch.column(hash_col).to_numpy(
            zero_copy_only=False).view(np.uint64)
        n = len(ids)
        blocks = (h[:, None] >> shifts[None, :]) & masks[None, :]
        return pa.table({
            "doc_id": pa.array(np.repeat(ids.astype(np.int64), b)),
            "band_id": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
            "band_key": pa.array(blocks.reshape(-1).view(np.int64)),
            "sig": pa.array([h[i].tobytes() for i in range(n)
                             for _ in range(b)], pa.binary()),
        })

    rows = ds.map_batches(band_rows, batch_format="pyarrow",
                          batch_size=65536)
    pairs = _bucketed_pairs(rows, _hamming_sim, threshold, nb,
                            max_bucket=max_bucket, stats_name=stats_name)
    return dedup_exact(pairs, ["id_a", "id_b"], nb=nb)


def remove_boilerplate(
    docs: "ray.data.Dataset",
    group_col: str = "source",
    sep: str = "\n",
    min_docs: int = 3,
    min_frac: "float | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Per-group boilerplate-LINE removal (the CCNet "frequent
    paragraph within a domain" pass, complementing corpus-wide
    ``dedup_lines``): split every doc on ``sep`` and drop EVERY
    occurrence of a line that appears in ≥ threshold distinct docs of
    its group (host/domain/source), where threshold =
    ``max(min_docs, ceil(min_frac × group_size))`` when ``min_frac``
    is given, else ``min_docs``. Navigation chrome, cookie banners
    and footers repeat across a site's pages — unlike ``dedup_lines``
    there is no keep-first: boilerplate is noise, not content.

    Scale shape: group page totals come from one small
    ``groupby(group).count()`` broadcast via ``ray.put`` (same
    bounded-#groups assumption as ``rebalance_sample`` — registrable
    domains, not raw URLs); occurrences bucket-shuffle on a
    (group, line) hash so each decision group sees every occurrence;
    removal coordinates meet the docs in the shared
    ``_apply_doc_removals`` doc-bucket rebuild. Output:
    ``id_col, text (cleaned), n_lines, n_removed``."""
    import math

    import ray as _ray

    if min_frac is None and min_docs < 2:
        raise ValueError("remove_boilerplate: min_docs must be ≥ 2")
    thresholds = None
    if min_frac is not None:
        tot = docs.groupby(group_col).count().to_pandas()
        # null group keys coalesce to '' exactly as in `occurrences`
        # (and the SQL twin), merging their counts with any real ''
        sizes = (tot.assign(**{group_col: tot[group_col].fillna("")})
                 .groupby(group_col)["count()"].sum())
        thresholds = {
            g: max(min_docs, int(math.ceil(min_frac * int(n))))
            for g, n in sizes.items()
        }
    thr_ref = _ray.put(thresholds)

    occ_schema = pa.schema([
        pa.field("gh", pa.int64()), pa.field("grp", pa.string()),
        pa.field("line", pa.string()), pa.field(id_col, pa.int64()),
        pa.field("pos", pa.int64()),
    ])

    def occurrences(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        split = df[text_col].fillna("").str.split(sep, regex=False)
        lengths = split.str.len().to_numpy(dtype=np.int64)
        flat = [ln for lines in split for ln in lines]
        if not flat:
            return _add_bucket(occ_schema.empty_table(), ["gh"], nb)
        doc_idx = np.repeat(np.arange(len(lengths)), lengths)
        grp = df[group_col].fillna("").to_numpy()[doc_idx]
        gh = pd.util.hash_pandas_object(
            pd.Series([g + "\x00" + ln for g, ln in zip(grp, flat)]),
            index=False).to_numpy().view(np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        pos = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
        occ = pa.table({
            "gh": pa.array(gh),
            "grp": pa.array(grp, pa.string()),
            "line": pa.array(flat, pa.string()),
            id_col: pa.array(
                df[id_col].to_numpy()[doc_idx].astype(np.int64)),
            "pos": pa.array(pos),
        })
        return _add_bucket(occ, ["gh"], nb)

    def removals(g: pa.Table) -> pa.Table:
        import ray as _r

        thr = _r.get(thr_ref)
        df = g.drop_columns([_BUCKET_COL, "gh"]).to_pandas()
        nd = df.groupby(["grp", "line"], sort=False)[id_col] \
            .transform("nunique").to_numpy()
        if thr is None:
            need = np.full(len(df), min_docs, np.int64)
        else:
            need = df["grp"].map(thr).fillna(min_docs) \
                .to_numpy(dtype=np.int64)
        out = df[nd >= need]
        return pa.table({
            id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
            "pos": pa.array(out["pos"].to_numpy(), pa.int64()),
        })

    removal_rows = (
        docs.map_batches(occurrences, batch_format="pyarrow",
                         batch_size=65536)
        .groupby(_BUCKET_COL).map_groups(removals, batch_format="pyarrow")
    )

    def per_doc(text: str, drops):
        lines = text.split(sep)
        if drops is None:
            return sep.join(lines), len(lines), 0
        mask = np.zeros(len(lines), bool)
        mask[drops] = True
        kept = [ln for ln, m in zip(lines, mask) if not m]
        return sep.join(kept), len(lines), int(mask.sum())

    return _apply_doc_removals(docs, removal_rows, id_col, text_col, nb,
                               "n_lines", per_doc)


# ---------------------------------------------------------------------------
def jaccard_similarity_join(
    docs: "ray.data.Dataset",
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    nb: int = 16,
) -> "ray.data.Dataset":
    """Exact token-set similarity self-join with PREFIX FILTERING
    (AllPairs / PPJoin family): every pair of documents whose
    whitespace token sets have Jaccard ≥ ``threshold``, with the exact
    score — no approximation, yet never all-pairs.

    The filter that makes it scale: order the token universe rarest-
    first (ascending document frequency, token string as tie-break).
    A document with n distinct tokens only has to EXPOSE its first
    ``n - ceil(t*n) + 1`` ordered tokens (its *prefix*): two sets with
    Jaccard ≥ t must share at least one prefix token of each, so
    candidate pairs are generated ONLY inside prefix-token buckets —
    and prefix tokens are by construction the RAREST, so buckets stay
    small where a raw token join would explode on stopwords. A size
    filter (t·|a| ≤ |b|, members sorted by size) prunes inside each
    bucket before the exact set intersection verifies.

    Plan (4 shuffles, all on bounded sides): distinct (token, id) →
    df counts (map-side pre-aggregated) → df joined back on token →
    per-doc regroup builds the ordered list + prefix (the doc's full
    ordered token list rides along ONLY on its ≤ (1-t)·n+1 prefix
    rows) → prefix-token buckets verify pairs → exact dedup (a pair
    found under two prefix tokens emits identical rows).

    Returns (id_a, id_b, size_a, size_b, inter, jaccard), id_a < id_b.
    Jaccard is the raw float64 division inter/(size_a+size_b-inter) —
    bit-identical to a SQL twin computing the same integer operands.
    """
    import math

    import ray.data as rd

    from .join import shuffle_hash_join

    if not 0.0 < threshold <= 1.0:
        raise ValueError("jaccard_similarity_join: threshold in (0, 1]")

    def tok_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        o_tok: list = []
        o_id: list = []
        for i, s in enumerate(texts):
            for w in set(s.lower().split()):
                o_tok.append(w)
                o_id.append(ids[i])
        return pa.table({"token": pa.array(o_tok, pa.string()),
                         id_col: pa.array(o_id, pa.int64())})

    tok = docs.map_batches(tok_rows, batch_format="pyarrow",
                           batch_size=65536).materialize()

    # document frequency, map-side pre-aggregated before the groupby
    def local_df(batch: pa.Table) -> pa.Table:
        return batch.group_by("token").aggregate([("token", "count")])

    df_counts = (tok.map_batches(local_df, batch_format="pyarrow")
                 .groupby("token").sum("token_count"))
    df_counts = df_counts.map_batches(
        lambda t: pa.table({"token": t.column("token"),
                            "df": t.column("sum(token_count)")
                            .cast(pa.int64())}),
        batch_format="pyarrow")

    ranked = shuffle_hash_join(tok, df_counts, on=["token"],
                               how="inner", nb=nb)
    bucketed = ranked.map_batches(
        lambda t: _add_bucket(t, [id_col], nb),
        batch_format="pyarrow", batch_size=65536)

    def build_prefix(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL]).to_pandas()
        o_ptok: list = []
        o_id: list = []
        o_size: list = []
        o_toks: list = []
        for did, grp in df.groupby(id_col, sort=False):
            pairs = sorted(zip(grp["df"], grp["token"]))
            ordered = [w for _, w in pairs]
            n = len(ordered)
            plen = n - math.ceil(threshold * n) + 1
            for w in ordered[:plen]:
                o_ptok.append(w)
                o_id.append(did)
                o_size.append(n)
                o_toks.append(ordered)
        return pa.table({
            "ptoken": pa.array(o_ptok, pa.string()),
            id_col: pa.array(o_id, pa.int64()),
            "size": pa.array(o_size, pa.int64()),
            "tokens": pa.array(o_toks, pa.list_(pa.string())),
        })

    prefixes = bucketed.groupby(_BUCKET_COL).map_groups(
        build_prefix, batch_format="pyarrow")
    pbuckets = prefixes.map_batches(
        lambda t: _add_bucket(t, ["ptoken"], nb),
        batch_format="pyarrow", batch_size=65536)

    def verify(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL]).to_pandas()
        o_a: list = []
        o_b: list = []
        o_na: list = []
        o_nb: list = []
        o_i: list = []
        o_j: list = []
        for _, grp in df.groupby("ptoken", sort=False):
            mem = sorted(
                ((int(r[1]), int(r[0]), set(r[2])) for r in
                 zip(grp[id_col], grp["size"], grp["tokens"])),
            )  # by (size, id) so the size filter can break early
            for x in range(len(mem)):
                na, ida, sa = mem[x]
                for y in range(x + 1, len(mem)):
                    nbr, idb, sb = mem[y]
                    if nbr * threshold > na:  # |b| > |a|/t: no later
                        break                 # member can qualify
                    if ida == idb:
                        continue
                    inter = len(sa & sb)
                    jac = inter / (na + nbr - inter)
                    if jac >= threshold:
                        lo, hi = (ida, idb) if ida < idb else (idb, ida)
                        nlo, nhi = (na, nbr) if ida < idb else (nbr, na)
                        o_a.append(lo)
                        o_b.append(hi)
                        o_na.append(nlo)
                        o_nb.append(nhi)
                        o_i.append(inter)
                        o_j.append(jac)
        return pa.table({
            "id_a": pa.array(o_a, pa.int64()),
            "id_b": pa.array(o_b, pa.int64()),
            "size_a": pa.array(o_na, pa.int64()),
            "size_b": pa.array(o_nb, pa.int64()),
            "inter": pa.array(o_i, pa.int64()),
            "jaccard": pa.array(o_j, pa.float64()),
        })

    pairs = pbuckets.groupby(_BUCKET_COL).map_groups(
        verify, batch_format="pyarrow")
    return dedup_exact(pairs, ["id_a", "id_b"], nb=nb)


# ---------------------------------------------------------------------------
_GEAR = None


def _gear_table() -> np.ndarray:
    """256-entry deterministic gear table (splitmix64 over the byte
    value — fixed constants, same table on every worker/run)."""
    global _GEAR
    if _GEAR is None:
        x = np.arange(256, dtype=np.uint64)
        with np.errstate(over="ignore"):
            z = x + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
        _GEAR = z
    return _GEAR


def gear_chunks(data: bytes, avg_size: int = 64, min_size: int | None = None,
                max_size: int | None = None) -> list[tuple[int, int]]:
    """Gear-hash content-defined chunk boundaries over one byte string
    — (start, end) spans. A boundary fires where the rolling gear hash
    (h = (h << 1) + gear[byte], vectorized as a weighted prefix
    convolution here via the per-position recurrence evaluated with a
    numpy scan) has its top log2(avg_size) bits zero, subject to
    min/max size clamps. Content-defined => INSERTIONS only perturb
    the chunk containing them (downstream boundaries re-align), which
    is what makes chunk-hash dedup shift-tolerant where fixed-size
    blocks are not."""
    if avg_size < 4 or avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two >= 4")
    mn = max(1, min_size if min_size is not None else avg_size // 4)
    mx = max_size if max_size is not None else avg_size * 4
    if mx < mn:
        raise ValueError("max_size < min_size")
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, np.uint8)
    gear = _gear_table()[b]
    # rolling h_i = (h_{i-1} << 1) + gear[b_i] mod 2^64: position i
    # only sees its last 64 bytes (older terms shift out), so
    # h_i = sum_{k=0..63} gear[b_{i-k}] << k — 64 shifted vector
    # adds, no per-byte Python.
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(64):
            if k >= n:
                break
            h[k:] += gear[:n - k] << np.uint64(k)
    zero_top = int(np.log2(avg_size))
    is_cut = (h >> np.uint64(64 - zero_top)) == 0
    cuts = np.flatnonzero(is_cut) + 1  # cut AFTER position i
    spans: list[tuple[int, int]] = []
    start = 0
    ci = 0
    m = len(cuts)
    while start < n:
        lo = start + mn
        hi = min(start + mx, n)
        ci = int(np.searchsorted(cuts, lo))
        end = int(cuts[ci]) if ci < m and cuts[ci] <= hi else hi
        spans.append((start, end))
        start = end
    return spans


def cdc_chunk_docs(batch: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text", avg_size: int = 64,
                   min_size: int | None = None,
                   max_size: int | None = None) -> pa.Table:
    """Content-defined chunking over a document batch: each doc's
    utf-8 bytes split at gear-hash boundaries; emits (doc_id,
    chunk_idx, start, length, chunk_hash, chunk_bytes). Chunks are
    BYTES, not strings — a content-defined boundary may land inside
    a multibyte utf-8 sequence, and reconstruction must stay
    byte-exact — so chunk_hash (the repo's stable 64-bit hash, the
    cross-doc storage-dedup join key) is over the raw bytes too.
    Row-expanding inside one map_batches; per-doc work is the
    vectorized boundary scan (64 shifted adds, no per-byte Python)."""
    from ..functions.hashing import hash_strings

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pandas().fillna("")
    o_id: list = []
    o_idx: list = []
    o_start: list = []
    o_len: list = []
    o_bytes: list = []
    for i, s in enumerate(texts):
        data = s.encode("utf-8")
        for ci, (a, z) in enumerate(gear_chunks(data, avg_size,
                                                min_size, max_size)):
            o_id.append(ids[i])
            o_idx.append(ci)
            o_start.append(a)
            o_len.append(z - a)
            o_bytes.append(data[a:z])
    chunks = pa.array(o_bytes, pa.binary())
    hashes = hash_strings(chunks).astype(np.int64)
    return pa.table({
        id_col: pa.array(np.asarray(o_id, np.int64)),
        "chunk_idx": pa.array(o_idx, pa.int32()),
        "start": pa.array(o_start, pa.int64()),
        "length": pa.array(o_len, pa.int64()),
        "chunk_hash": pa.array(hashes, pa.int64()),
        "chunk_bytes": chunks,
    })


def _doc_ngrams(batch: pa.Table, n: int, id_col: str,
                text_col: str) -> pa.Table:
    """Distinct (id, ngram) rows per batch — the same trimmed
    whitespace tokenization + shifted-join n-gram build as
    ``textstats.top_ngrams`` (SQL twin:
    ``regexp_split_to_array(trim(text), '\\s+')`` + positional
    concat), but keeping the doc id. Rows are whole documents, so a
    per-batch distinct IS globally distinct per (id, ngram)."""
    import pyarrow.compute as pc

    from .textstats import _WS

    text = pc.fill_null(batch.column(text_col), "")
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), _WS)
    lengths = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat_arr = pc.list_flatten(toks)
    if isinstance(flat_arr, pa.ChunkedArray):
        flat_arr = flat_arr.combine_chunks()
    flat = flat_arr.to_pandas()
    ids = batch.column(id_col).to_pandas()
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    empty = pa.table({id_col: batch.column(id_col).slice(0, 0),
                      "ngram": pa.array([], pa.string())})
    if len(flat) < n:
        return empty
    grams = flat.iloc[: len(flat) - n + 1].reset_index(drop=True)
    same_doc = np.ones(len(grams), dtype=bool)
    for j in range(1, n):
        grams = grams + " " + flat.iloc[j: len(flat) - n + 1 + j
                                        ].reset_index(drop=True)
        same_doc &= doc_idx[: len(grams)] == doc_idx[j: len(grams) + j]
    if not same_doc.any():
        return empty
    df = pd.DataFrame({
        id_col: ids.iloc[doc_idx[: len(grams)][same_doc]].to_numpy(),
        "ngram": grams[same_doc].to_numpy()}).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema([batch.schema.field(id_col),
                   pa.field("ngram", pa.string())]))


def decontaminate_joined(
    docs: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    nb: int = 32,
) -> "ray.data.Dataset":
    """Benchmark decontamination, SHUFFLE-JOIN variant — the scale
    path ``textstats.decontaminate``'s docstring reserves for when
    the contaminating side outgrows a driver-collected broadcast set
    (corpus-vs-corpus overlap, not corpus-vs-eval-suite): flag every
    training document sharing at least one n-token shingle with any
    benchmark text → ``(doc_id, n_hits, contaminated)`` where
    ``n_hits`` counts the doc's DISTINCT overlapping shingles (the
    broadcast variant counts gram OCCURRENCES — distinct is the
    right unit when both sides are corpora); 0-hit rows included, so
    the output is a full per-doc report, joinable as a filter.

    Shape: both sides shingle map-side (vectorized shifted-token
    joins, per-batch distinct); one bucketed SEMI join on the shingle
    string keeps overlapping (doc, shingle) rows (benchmark-side
    duplicates can't multiply counts); a composite ``sum_by_key``
    folds hits per doc; one left join restores the zero-hit docs.
    Nothing is broadcast and nothing is driver-collected."""
    import pyarrow.compute as pc

    from .canonicalize import sum_by_key
    from .join import shuffle_hash_join

    dsh = docs.map_batches(
        lambda t, nn=n: _doc_ngrams(t, nn, id_col, text_col),
        batch_format="pyarrow", batch_size=65536)

    def bench_ngrams(t: pa.Table, nn=n) -> pa.Table:
        # per-batch row index is id enough: only the distinct ngram
        # strings leave this stage
        withid = t.append_column(
            "__bid", pa.array(np.arange(t.num_rows, dtype=np.int64)))
        return _doc_ngrams(withid, nn, "__bid",
                           bench_text_col).select(["ngram"])

    bsh = benchmark.map_batches(bench_ngrams, batch_format="pyarrow",
                                batch_size=65536)

    hits = shuffle_hash_join(dsh, bsh, on=["ngram"], how="semi", nb=nb)
    counts = sum_by_key(
        hits.map_batches(
            lambda t: pa.table({
                id_col: t.column(id_col),
                "one": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow"),
        id_col, "one", nb=nb, out_col="n_hits")

    ids = docs.map_batches(lambda t: t.select([id_col]),
                           batch_format="pyarrow")
    j = shuffle_hash_join(ids, counts, on=[id_col], how="left", nb=nb)

    def finish(t: pa.Table) -> pa.Table:
        nh = pc.fill_null(t.column("n_hits"), 0).cast(pa.int64())
        return pa.table({id_col: t.column(id_col), "n_hits": nh,
                         "contaminated": pc.greater(nh, 0)})

    return j.map_batches(finish, batch_format="pyarrow")


def containment_join(
    docs: "ray.data.Dataset",
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    nb: int = 16,
) -> "ray.data.Dataset":
    """Exact OVERLAP-COEFFICIENT set-similarity self-join — the
    near-subset detector (a doc largely CONTAINED in another — quote
    farms, templated expansions — that Jaccard misses because the
    size imbalance drowns the ratio): every pair with
    ``|A∩B| / min(|A|,|B|) ≥ threshold``, with both directional
    containments exact.

    Prefix filtering is ASYMMETRIC here (contrast
    :func:`jaccard_similarity_join`): a qualifying pair shares
    ≥ ⌈t·min⌉ tokens, so the SMALLER side must expose a shared token
    inside its own rarest-first prefix (pigeonhole), while the larger
    side can hide it anywhere — candidates therefore come from
    prefix(probe) × ALL-token(index) buckets on the token. Prefix
    tokens are by construction the rarest, and the index side is
    semi-join-pruned to tokens appearing in SOME prefix, so no
    stopword bucket ever explodes. Verification fetches both ordered
    token lists by id (two bucketed joins) and computes the exact
    intersection per CANDIDATE (bounded by candidate count, not
    |pairs|²).

    Returns (id_a, id_b, size_a, size_b, inter, contain_a, contain_b,
    overlap), id_a < id_b; ratios are raw float64 divisions of the
    integer operands — bit-identical to a SQL twin."""
    import math

    from .join import shuffle_hash_join

    if not 0.0 < threshold <= 1.0:
        raise ValueError("containment_join: threshold in (0, 1]")

    def tok_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().fillna("")
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        o_tok: list = []
        o_id: list = []
        for i, s in enumerate(texts):
            for w in set(s.lower().split()):
                o_tok.append(w)
                o_id.append(ids[i])
        return pa.table({"token": pa.array(o_tok, pa.string()),
                         id_col: pa.array(o_id, pa.int64())})

    tok = docs.map_batches(tok_rows, batch_format="pyarrow",
                           batch_size=65536).materialize()

    def local_df(batch: pa.Table) -> pa.Table:
        return batch.group_by("token").aggregate([("token", "count")])

    df_counts = (tok.map_batches(local_df, batch_format="pyarrow")
                 .groupby("token").sum("token_count"))
    df_counts = df_counts.map_batches(
        lambda t: pa.table({"token": t.column("token"),
                            "df": t.column("sum(token_count)")
                            .cast(pa.int64())}),
        batch_format="pyarrow")
    ranked = shuffle_hash_join(tok, df_counts, on=["token"],
                               how="inner", nb=nb)

    # one row per doc: rarest-first ordered token list + own prefix
    def build_doc(g: pa.Table) -> pa.Table:
        df = g.drop_columns([_BUCKET_COL]).to_pandas()
        o_id: list = []
        o_size: list = []
        o_toks: list = []
        o_plen: list = []
        for did, grp in df.groupby(id_col, sort=False):
            pairs = sorted(zip(grp["df"], grp["token"]))
            ordered = [w for _, w in pairs]
            n = len(ordered)
            o_id.append(did)
            o_size.append(n)
            o_toks.append(ordered)
            o_plen.append(n - math.ceil(threshold * n) + 1)
        return pa.table({
            id_col: pa.array(o_id, pa.int64()),
            "size": pa.array(o_size, pa.int64()),
            "tokens": pa.array(o_toks, pa.list_(pa.string())),
            "plen": pa.array(o_plen, pa.int64())})

    doclists = (ranked.map_batches(
        lambda t: _add_bucket(t, [id_col], nb),
        batch_format="pyarrow", batch_size=65536)
        .groupby(_BUCKET_COL)
        .map_groups(build_doc, batch_format="pyarrow")).materialize()

    def explode_prefix(t: pa.Table) -> pa.Table:
        lists = t.column("tokens")
        plen = t.column("plen").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        o_tok: list = []
        o_id: list = []
        for i, lst in enumerate(lists.to_pylist()):
            for w in lst[:plen[i]]:
                o_tok.append(w)
                o_id.append(ids[i])
        return pa.table({"token": pa.array(o_tok, pa.string()),
                         "pid": pa.array(o_id, pa.int64())})

    prefixes = doclists.map_batches(explode_prefix,
                                    batch_format="pyarrow")
    ptokens = dedup_exact(
        prefixes.map_batches(lambda t: t.select(["token"]),
                             batch_format="pyarrow"),
        ["token"], nb=nb)
    # index side pruned to tokens that occur in SOME prefix
    index = shuffle_hash_join(tok, ptokens, on=["token"], how="semi",
                              nb=nb).map_batches(
        lambda t: pa.table({"token": t.column("token"),
                            "iid": t.column(id_col)}),
        batch_format="pyarrow")

    cand = dedup_exact(
        shuffle_hash_join(prefixes, index, on=["token"], how="inner",
                          nb=nb).map_batches(
            lambda t: pa.table({
                "id_a": pc.min_element_wise(t.column("pid"),
                                            t.column("iid")),
                "id_b": pc.max_element_wise(t.column("pid"),
                                            t.column("iid"))})
            .filter(pc.not_equal(t.column("pid"), t.column("iid"))),
            batch_format="pyarrow"),
        ["id_a", "id_b"], nb=nb)

    side = doclists.map_batches(
        lambda t: t.select([id_col, "size", "tokens"]),
        batch_format="pyarrow")
    j1 = shuffle_hash_join(
        cand, side.map_batches(
            lambda t: t.rename_columns(["id_a", "size_a", "toks_a"]),
            batch_format="pyarrow"),
        on=["id_a"], how="inner", nb=nb)
    j2 = shuffle_hash_join(
        j1, side.map_batches(
            lambda t: t.rename_columns(["id_b", "size_b", "toks_b"]),
            batch_format="pyarrow"),
        on=["id_b"], how="inner", nb=nb)

    def verify(t: pa.Table) -> pa.Table:
        ta = t.column("toks_a").to_pylist()
        tb = t.column("toks_b").to_pylist()
        inter = np.fromiter(
            (len(set(a) & set(b)) for a, b in zip(ta, tb)),
            np.int64, count=t.num_rows)
        sa = t.column("size_a").to_numpy(zero_copy_only=False)
        sb = t.column("size_b").to_numpy(zero_copy_only=False)
        ov = inter / np.minimum(sa, sb)
        keep = ov >= threshold
        return pa.table({
            "id_a": t.column("id_a").filter(pa.array(keep)),
            "id_b": t.column("id_b").filter(pa.array(keep)),
            "size_a": pa.array(sa[keep]),
            "size_b": pa.array(sb[keep]),
            "inter": pa.array(inter[keep]),
            "contain_a": pa.array(inter[keep] / sa[keep]),
            "contain_b": pa.array(inter[keep] / sb[keep]),
            "overlap": pa.array(ov[keep])})

    return j2.map_batches(verify, batch_format="pyarrow")


class SemdedupClusterOverflow(RuntimeError):
    """A k-means cluster exceeded the per-cluster pair bound —
    SemDeDup's within-cluster comparison is inherently quadratic, so
    a runaway cluster must fail loudly (raise k, or pre-split the
    hot cluster) instead of OOMing a reduce task."""


def semdedup(
    vecs: "ray.data.Dataset",
    k: int,
    threshold: float = 0.96,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nb: int = 32,
    max_iters: int = 20,
    max_cluster_rows: int = 100_000,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication
    by k-means clustering the embeddings, then comparing ONLY within
    each cluster — pairs with cosine ≥ ``threshold`` form duplicate
    groups, and each group keeps its MIN-id representative.

    Exactly the paper's recipe re-expressed Ray-Data-first: the
    deterministic distributed Lloyd :func:`similarity.kmeans`
    assigns clusters (whole-corpus streaming passes, broadcast
    centroids), one bucketed hash join carries the vectors to their
    assignment, and a per-CLUSTER ``map_groups`` runs the vectorized
    cosine-Gram + union-find locally — quadratic only within a
    cluster, which is the knob the paper scales with k;
    ``max_cluster_rows`` guards a runaway cluster with a typed
    raise. Output: ``(id, cluster, rep, keep)`` — one row per input
    vector, ``keep`` false for every non-representative duplicate.

    Returns are deterministic (k-means seeding and all tie-breaks
    are order-free); parity against a brute-force reference is
    pinned in tests."""
    from .join import shuffle_hash_join
    from .similarity import kmeans

    if not 0 < threshold <= 1:
        raise ValueError("semdedup: threshold in (0, 1]")
    # spherical assignment (normalize=True): the dedup criterion is
    # COSINE, so clustering must be magnitude-blind too — otherwise
    # cosine-identical vectors of different norms land in different
    # clusters and are never compared (the paper clusters normalized
    # embeddings)
    _, assign = kmeans(vecs, k, vec_col=vec_col, id_col=id_col,
                       max_iters=max_iters, normalize=True)
    j = shuffle_hash_join(
        vecs, assign, on=[id_col], how="inner", nb=nb)

    def per_cluster(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n > max_cluster_rows:
            raise SemdedupClusterOverflow(
                f"semdedup: cluster of {n} rows exceeds "
                f"max_cluster_rows={max_cluster_rows} — raise k")
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        emb = g.column(vec_col)
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = np.asarray(emb.values, dtype=np.float64).reshape(n, -1)
        flat = flat[order]
        norms = np.linalg.norm(flat, axis=1)
        norms[norms == 0] = 1.0
        v = flat / norms[:, None]
        sim = v @ v.T
        adj = sim >= (threshold - 1e-12)
        # a zero-norm or NaN embedding has an all-False row (its
        # self-similarity is 0/NaN) — force the diagonal so every
        # vector is at least its own singleton instead of converging
        # to an out-of-range sentinel label
        np.fill_diagonal(adj, True)
        # vectorized min-label propagation over the dup graph (adj is
        # reflexive, so labels only shrink): converges in O(log
        # diameter) O(n^2) passes — no per-row Python
        labels = np.arange(n, dtype=np.int64)
        while True:
            nxt = np.where(adj, labels[None, :], n).min(axis=1)
            if (nxt == labels).all():
                break
            labels = nxt
        rep = ids[labels]
        cl = g.column("cluster").to_numpy(zero_copy_only=False)[order]
        return pa.table({
            id_col: pa.array(ids),
            "cluster": pa.array(cl.astype(np.int64)),
            "rep": pa.array(rep),
            "keep": pa.array(ids == rep)})

    return j.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow")
