"""Entity-linking actor pool (SURVEY.md §2 ST2/ST4, J1–J3).

Ray-Data-native replacement for the reference's cached discoverer chain
(``BioSDCachedOntoTermDiscoverer``: memory cache → DB cache → live
ZOOMA — SURVEY.md §2.3) and the ZOOMA service itself: a callable class
for ``map_batches(LinkerActor, concurrency=N)`` whose ``__init__``
builds the lexical-match index ONCE per actor from broadcast
(``ray.put``) dictionary tables; ``__call__`` resolves a batch of
distinct keys with zero RPC.

Input batches carry distinct ``key`` strings ("type|value_norm"); unit
keys use the reserved type ``(unit)``. Output: ANNOTATIONS rows for
hits only (misses are dropped; downstream left-joins reattach nulls).

Per-actor hot-key dict cache mirrors the reference's memo store (ST1)
as an optimization only — global once-per-key semantics are guaranteed
upstream by the distinct-key reduction.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..functions.normalize import KEY_SEP
from ..schemas import ANNOTATIONS
from ..state.dictionaries import (
    OntologyIndex,
    fixture_curated_mappings,
    fixture_ontology_terms,
)

UNIT_TYPE = "(unit)"


def broadcast_dictionaries(terms: pa.Table | None = None, curated: pa.Table | None = None):
    """ray.put the dictionary tables ONCE; returns (terms_ref, curated_ref).

    Arrow tables in the object store are read zero-copy by every actor
    (ST4 broadcast path; the hash-shard path for dictionaries that
    exceed worker memory would key off actor rank — not needed at
    fixture scale, documented in SURVEY.md §2.3)."""
    terms = terms if terms is not None else fixture_ontology_terms()
    curated = curated if curated is not None else fixture_curated_mappings()
    return ray.put(terms), ray.put(curated)


class LinkerActor:
    """Stateful map_batches callable: distinct keys → annotation rows."""

    @classmethod
    def local(cls, terms: pa.Table | None = None, curated: pa.Table | None = None,
              fuzzy: bool = False):
        """Driver-local construction without the object store (used by
        the compute_links_table fast path)."""
        obj = cls.__new__(cls)
        obj.index = OntologyIndex.build(
            terms if terms is not None else fixture_ontology_terms(),
            curated if curated is not None else fixture_curated_mappings(),
        )
        obj.cache = {}
        obj.cache_size = 65536
        obj.fuzzy = fuzzy
        obj.stats = {"keys": 0, "hits": 0, "cache_hits": 0}
        return obj

    def __init__(self, terms_ref=None, curated_ref=None, cache_size: int = 65536,
                 fuzzy: bool = False):
        terms = ray.get(terms_ref) if terms_ref is not None else fixture_ontology_terms()
        curated = ray.get(curated_ref) if curated_ref is not None else fixture_curated_mappings()
        self.index = OntologyIndex.build(terms, curated)
        self.cache: dict[str, tuple | None] = {}
        self.cache_size = cache_size
        self.fuzzy = fuzzy
        self.stats = {"keys": 0, "hits": 0, "cache_hits": 0}

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Distinct keys → annotation rows. Cache-miss keys resolve
        through the VECTORIZED tier cascade (``OntologyIndex.
        lookup_batch``: one pc.index_in per tier — round-1 verdict item
        8); cache hits are O(1) dict reads. The memo cache mirrors the
        reference's ST1 store across tasks of one worker process."""
        import numpy as np
        import pyarrow.compute as pc

        keys_arr = batch.column("key")
        if isinstance(keys_arr, pa.ChunkedArray):
            keys_arr = keys_arr.combine_chunks()
        keys = keys_arr.to_pylist()
        n = len(keys)
        self.stats["keys"] += n
        uri = np.full(n, None, object)
        label = np.full(n, None, object)
        conf = np.full(n, None, object)
        prov = np.full(n, None, object)
        score = np.zeros(n)
        miss_idx = []
        for i, key in enumerate(keys):
            cached = self.cache.get(key, False)
            if cached is False:
                miss_idx.append(i)
                continue
            self.stats["cache_hits"] += 1
            if cached is not None:
                uri[i], label[i], conf[i], score[i], prov[i] = cached
        if miss_idx:
            sub = keys_arr.take(pa.array(miss_idx))
            # vectorized str.partition(KEY_SEP): guarantee a separator,
            # then a max_splits=1 split
            has = pc.not_equal(pc.find_substring(sub, KEY_SEP), -1)
            fixed = pc.if_else(has, sub, pc.binary_join_element_wise(sub, "", KEY_SEP))
            parts = pc.split_pattern(fixed, KEY_SEP, max_splits=1)
            ct = pc.list_element(parts, 0)
            val = pc.list_element(parts, 1)
            u, lb, cf, sc, pv = self.index.lookup_batch(
                ct, val, fuzzy=getattr(self, "fuzzy", False))
            for j, i in enumerate(miss_idx):
                hit = None if u[j] is None else (u[j], lb[j], cf[j], float(sc[j]), pv[j])
                if len(self.cache) < self.cache_size:
                    self.cache[keys[i]] = hit
                uri[i], label[i], conf[i], prov[i] = u[j], lb[j], cf[j], pv[j]
                score[i] = sc[j]
        mask = np.array([x is not None for x in uri])
        self.stats["hits"] += int(mask.sum())
        sel = np.flatnonzero(mask)
        return pa.table(
            {
                "key": keys_arr.take(pa.array(sel)),
                "term_uri": pa.array(uri[sel], pa.string()),
                "term_label": pa.array(label[sel], pa.string()),
                "confidence": pa.array(conf[sel], pa.string()),
                "score": pa.array(score[sel], pa.float32()),
                "provenance": pa.array(prov[sel], pa.string()),
            },
            schema=ANNOTATIONS,
        )


class _LinkerShard:
    """One shard of the big-dictionary path: holds the index over a
    SUBSET of terms (every num_shards-th row) plus the full curated map
    (curated is the small hand-curated tier by construction)."""

    def __init__(self, terms_ref, curated_ref, shard: int, num_shards: int):
        # Ray auto-dereferences ObjectRef arguments to remote calls.
        terms: pa.Table = ray.get(terms_ref) if isinstance(terms_ref, ray.ObjectRef) else terms_ref
        curated: pa.Table = ray.get(curated_ref) if isinstance(curated_ref, ray.ObjectRef) else curated_ref
        idx = [i for i in range(len(terms)) if i % num_shards == shard]
        self.index = OntologyIndex.build(terms.take(idx), curated)

    def link(self, keys: list[str]) -> list[tuple | None]:
        out = []
        for key in keys:
            char_type, _, value_norm = key.partition(KEY_SEP)
            out.append(self.index.lookup(char_type, value_norm))
        return out


class ShardedLinker:
    """ST4 big-dictionary scale path: the ontology dictionary is hash-
    sharded across S Ray actors (each holds 1/S of the terms), queries
    fan out to every shard and the per-shard hits are merged by the
    global tier order (confidence rank desc, score desc, term_uri asc —
    tier scores are strictly ordered, so the merge reproduces the
    single-index tier semantics EXACTLY; parity is tested).

    Use when the dictionary exceeds a single worker's memory; at fixture
    scale the broadcast path (LinkerActor) is strictly cheaper."""

    def __init__(self, terms: pa.Table | None = None, curated: pa.Table | None = None,
                 num_shards: int = 4):
        from .canonicalize import CONFIDENCE_RANK

        self.rank = CONFIDENCE_RANK
        terms_ref, curated_ref = broadcast_dictionaries(terms, curated)
        shard_cls = ray.remote(_LinkerShard)
        self.shards = [
            shard_cls.remote(terms_ref, curated_ref, s, num_shards)
            for s in range(num_shards)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        per_shard = ray.get([s.link.remote(keys) for s in self.shards])
        out_keys, uris, labels, confs, scores, provs = [], [], [], [], [], []
        for i, key in enumerate(keys):
            hits = [ps[i] for ps in per_shard if ps[i] is not None]
            if not hits:
                continue
            # Final component: a curated hit from a shard that lacks the
            # term row falls back to label=uri — prefer the shard that
            # has the real label (same uri/tier/score otherwise).
            best = min(hits, key=lambda h: (-self.rank.get(h[2], -1), -h[3], h[0], h[1] == h[0]))
            out_keys.append(key)
            uris.append(best[0]); labels.append(best[1]); confs.append(best[2])
            scores.append(best[3]); provs.append(best[4])
        return pa.table(
            {
                "key": pa.array(out_keys, pa.string()),
                "term_uri": pa.array(uris, pa.string()),
                "term_label": pa.array(labels, pa.string()),
                "confidence": pa.array(confs, pa.string()),
                "score": pa.array(scores, pa.float32()),
                "provenance": pa.array(provs, pa.string()),
            },
            schema=ANNOTATIONS,
        )


def filter_confidence(ds, min_confidence: str = "GOOD"):
    """M10 threshold filter: keep candidates at/above a confidence tier
    (reference default ≥ GOOD — SURVEY.md §2.2 M10)."""
    import pyarrow.compute as pc

    from .canonicalize import CONFIDENCE_RANK

    keep = [c for c, r in CONFIDENCE_RANK.items() if r >= CONFIDENCE_RANK[min_confidence]]
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("confidence"), value_set=pa.array(keep))),
        batch_format="pyarrow",
    )
