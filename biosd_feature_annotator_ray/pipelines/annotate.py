"""The flagship annotation pipeline (SURVEY.md §3.4 lifecycle).

Replaces the reference's per-record orchestrator
(``PropertyValAnnotationManager.annotate`` + thread-pooled
``PropertyValAnnotationService`` — SURVEY.md §3.1) with a declarative
stage chain; the pipeline IS the orchestrator:

    read_parquet(pages)                      S1   streaming blocks
      → map_batches(extract_text)            M2   stateless tasks
      → map_batches(detect_mentions)         M3   row-expanding
      → map_batches(parse_batch)             M4–M9 vectorized kernels
    [keys branch]
      → distinct keys (+ unit keys)          A1 map-side combine + bucket shuffle
      → map_batches(LinkerActor, pool)       ST2/ST4/J1–J3
      → confidence threshold                 M10
      → broadcast links (ray.put)            §4.2-4 map-side join back
    [checkpointed run() — single-job architecture]
      read → extract → detect → parse → tag part_id=hash(url)%P
        (ONE fused Ray Data operator)
      → scatter mention fragments to part_id dirs      §4.2-3, no all-to-all
      → P independent finalize tasks:                  A1/A2/A5/S3 fused
          link local distinct keys (pure function ≡ global pass, tested)
          → emit triples → exact dedup → pack adjacency
          → atomic write + manifest

    [API path annotate_pages() — global links]
      build_mentions → compute_links_table (driver-side distinct keys)
      → broadcast-back join (AnnotationJoiner tasks) → dedup_exact
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray
import ray.data

from ..functions.parsers import parse_batch
from ..functions.textextract import extract_text
from ..sources.pages import read_pages
from ..stages.canonicalize import dedup_exact, distinct_counts
from ..stages.linker import LinkerActor, broadcast_dictionaries, filter_confidence
from ..stages.mentions import DEFAULT_TYPE_VOCAB, detect_mentions
from ..stages.triples import AnnotationJoiner, unit_key_array


@dataclass
class PipelineSpec:
    """Declarative stage config (SURVEY.md §2.10 user-extension surface)."""

    batch_size: int | None = None         # None = one batch per block (maximal
                                          # operator fusion: the whole stateless
                                          # chain fuses into the read operator)
    link_batch_size: int = 8192           # distinct keys per linker batch
    link_concurrency: tuple[int, int] = (1, 8)   # actor pool (min, max)
    join_concurrency: tuple[int, int] = (1, 8)
    min_confidence: str = "GOOD"          # M10 threshold
    n_buckets: int = 32                   # bucket-shuffle width for dedup/distinct
    salt: int | str = 1                   # >1 → two-level hot-key reduce;
                                          # "auto" → sample the key stream
                                          # (K4 hot-key report) and pick one
    num_parts: int = 16                   # graph partitions P (fixed by data scale)
    max_edges: int = 10_000               # adjacency row cap (hub spill-over)
    max_driver_keys: int = 1_000_000      # distinct-key count above which linking
                                          # dispatches to the actor-pool path
                                          # instead of driver-side collection
    max_finalize_rows: int | None | str = "default"
                                          # finalize-task heap bound: partitions
                                          # larger than this stream in url-hash
                                          # sub-chunks (row groups) instead of
                                          # one whole-partition materialization.
                                          # "default" → sink.DEFAULT_MAX_FINALIZE_ROWS
                                          # (4M rows); None = explicit opt-out
                                          # (unbounded whole-partition concat)
    fuzzy_link: bool = False              # opt-in fuzzy tier (SURVEY §2.4
                                          # "fuzzy≥θ=LOW"): Levenshtein
                                          # fallback vs labels/synonyms,
                                          # LOW confidence — visible only
                                          # with min_confidence="LOW"
    expand_ancestors: bool = False        # materialize is-a subsumption
                                          # closure triples (ancestor URIs),
                                          # deduped by the same survivor rule
    type_vocab: tuple[str, ...] = DEFAULT_TYPE_VOCAB
    lang: str | None = None               # M11 read-time filter
    num_blocks: int | None = None         # read re-chunking: fewer/longer fused
                                          # tasks (≈4 waves per core is a good
                                          # default at cluster scale)


def build_mentions(pages: "ray.data.Dataset", spec: PipelineSpec) -> "ray.data.Dataset":
    """pages → parsed mention stream (all stateless, zero shuffles)."""
    vocab = spec.type_vocab
    return (
        pages.map_batches(extract_text, batch_format="pyarrow", batch_size=spec.batch_size)
        .map_batches(
            lambda t: detect_mentions(t, type_vocab=vocab),
            batch_format="pyarrow",
            batch_size=spec.batch_size,
        )
        .map_batches(parse_batch, batch_format="pyarrow", batch_size=spec.batch_size)
    )


def _keys_of_batch(batch: pa.Table) -> pa.Table:
    """Local distinct over mention keys + unit keys (map-side combine)."""
    import pyarrow.compute as pc

    keys = batch.column("key")
    unit_keys = pc.drop_null(unit_key_array(batch.column("unit_text")))
    allk = pa.concat_arrays(
        [keys.combine_chunks(), unit_keys.combine_chunks() if isinstance(unit_keys, pa.ChunkedArray) else unit_keys]
    )
    return pa.table({"key": allk.unique()})


def _links_from_keys(
    keys: "ray.data.Dataset",
    spec: PipelineSpec,
    terms_ref=None,
    curated_ref=None,
) -> "ray.data.Dataset":
    """(possibly-duplicated) key stream → global distinct → linker actor
    pool → M10 threshold. Shared tail of the distributed paths."""
    distinct = distinct_counts(keys, "key", nb=spec.n_buckets).drop_columns(["count"])
    linked = distinct.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"terms_ref": terms_ref, "curated_ref": curated_ref,
                               "fuzzy": spec.fuzzy_link},
        batch_format="pyarrow",
        batch_size=spec.link_batch_size,
        concurrency=spec.link_concurrency,
    )
    return filter_confidence(linked, spec.min_confidence)


def compute_links_distributed(
    mentions: "ray.data.Dataset",
    spec: PipelineSpec,
    terms_ref=None,
    curated_ref=None,
) -> "ray.data.Dataset":
    """Distinct-key reduction (A1) → linker actor pool → M10 threshold.

    Linking runs ONCE per distinct key globally — strictly stronger than
    the reference's per-process memo store (SURVEY.md §2.3 ST1). This is
    the BIG-key-set path (bucket shuffle + actor pool); when the
    distinct key set is driver-sized, ``compute_links_table`` below
    skips the shuffle + pool entirely. ``compute_links_auto`` picks."""
    if terms_ref is None or curated_ref is None:
        # fill ONLY the missing ref — replacing a caller-provided ref
        # with fixture dictionaries would silently link against the
        # wrong dictionary
        t2, c2 = broadcast_dictionaries()
        terms_ref = terms_ref if terms_ref is not None else t2
        curated_ref = curated_ref if curated_ref is not None else c2
    keys = mentions.map_batches(_keys_of_batch, batch_format="pyarrow", batch_size=65536)
    return _links_from_keys(keys, spec, terms_ref, curated_ref)


def _links_local(
    keys: "ray.data.Dataset",
    spec: PipelineSpec,
    terms: pa.Table | None = None,
    curated: pa.Table | None = None,
) -> pa.Table:
    """Driver finish of the small-key-set path: collect the map-side
    combined key stream, dedup, link in one vectorized pass."""
    df = keys.to_pandas()
    if "key" not in df.columns:  # zero mentions → empty frame loses its schema
        import pandas as pd

        df = pd.DataFrame({"key": pd.Series([], dtype=object)})
    uniq = df["key"].drop_duplicates()
    linker = LinkerActor.local(terms, curated, fuzzy=spec.fuzzy_link)
    linked = linker(pa.table({"key": pa.array(uniq.to_numpy(dtype=object), pa.string())}))
    from ..stages.canonicalize import CONFIDENCE_RANK

    keep = [c for c, r in CONFIDENCE_RANK.items() if r >= CONFIDENCE_RANK[spec.min_confidence]]
    import pyarrow.compute as pc

    return linked.filter(pc.is_in(linked.column("confidence"), value_set=pa.array(keep)))


def compute_links_table(
    mentions: "ray.data.Dataset",
    spec: PipelineSpec,
    terms: pa.Table | None = None,
    curated: pa.Table | None = None,
) -> pa.Table:
    """Fast path: map-side distinct keys collected to the driver (the
    distinct key set is the SMALL side), then linked in one vectorized
    pass with the same LinkerActor logic. No shuffle, no actor pool,
    identical output to the distributed path (tested). Callers that
    don't KNOW the key set is driver-sized use ``compute_links_auto``."""
    keys = mentions.map_batches(_keys_of_batch, batch_format="pyarrow", batch_size=65536)
    return _links_local(keys, spec, terms, curated)


def compute_links_auto(
    mentions: "ray.data.Dataset",
    spec: PipelineSpec,
    terms: pa.Table | None = None,
    curated: pa.Table | None = None,
) -> pa.Table:
    """Scale dispatch for linking (round-1 verdict item 1/2).

    Materializes the map-side-combined key stream ONCE (it is the
    reduced small side — ≤ one distinct-key row per batch per key, far
    smaller than the mention stream) and uses its row count as a cheap
    UPPER BOUND on the global distinct-key count:

    - bound ≤ ``spec.max_driver_keys`` → driver-side collection + one
      vectorized link pass (no shuffle, no pool);
    - bound > threshold → global distinct shuffle + LinkerActor pool
      (``compute_links_distributed`` tail), with only the dictionary
      HITS (bounded by the dictionary, not the corpus) collected for
      the broadcast-back join.

    Both routes produce identical link tables (parity-tested across the
    threshold)."""
    keys = mentions.map_batches(
        _keys_of_batch, batch_format="pyarrow", batch_size=65536
    ).materialize()
    upper = keys.count()
    if upper <= spec.max_driver_keys:
        return _links_local(keys, spec, terms, curated)
    terms_ref, curated_ref = broadcast_dictionaries(terms, curated)
    linked = _links_from_keys(keys, spec, terms_ref, curated_ref)
    from ..schemas import ANNOTATIONS

    return dataset_to_table(linked, empty_schema=ANNOTATIONS)


# Back-compat alias: the distributed variant keeps the original name.
compute_links = compute_links_distributed


def dataset_to_table(ds: "ray.data.Dataset", empty_schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a SMALL dataset to one Arrow table (links, manifests).
    Never call on the main stream. ``empty_schema`` is the fallback when
    the dataset produced no blocks at all (e.g. empty input)."""
    refs = ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    if not tables:
        schema = ds.schema(fetch_if_missing=False)
        if schema is not None:
            return schema.base_schema.empty_table()
        if empty_schema is not None:
            return empty_schema.empty_table()
        raise ValueError("dataset is empty and no fallback schema was given")
    return pa.concat_tables(tables, promote_options="permissive")


def build_triples(
    mentions: "ray.data.Dataset",
    links_table: pa.Table,
    spec: PipelineSpec,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """Broadcast-back join + emission (+ exact dedup A2 when the caller
    is not the checkpointed sink — the sink fuses dedup into its own
    part_id shuffle, see sink.write_partition)."""
    from ..stages.triples import make_joiner_fn

    links_ref = ray.put(links_table)
    triples = mentions.map_batches(
        make_joiner_fn(links_ref),
        batch_format="pyarrow",
        batch_size=spec.batch_size,
    )
    if spec.expand_ancestors:
        from ..stages.triples import expand_ancestors

        # BEFORE dedup: entailed rows from two children sharing an
        # ancestor collapse under the same survivor rule below
        triples = expand_ancestors(triples)
    if not dedup:
        return triples
    salt = spec.salt
    if salt == "auto":
        from ..stages.canonicalize import recommend_salt

        # K4 hot-key sample over the mention keys (the skewed column —
        # "Homo sapiens"-style heavy hitters) sets the two-level reduce.
        salt = recommend_salt(mentions, "key")
    from ..sources.sink import TRIPLE_KEY

    def add_pref(t: pa.Table) -> pa.Table:
        # survivor preference = FIXTURES §3.3 tie-break: confidence rank
        # desc, score desc (an unranked/alphabetical survivor could keep
        # a GOOD row over the HIGH row for the same triple key)
        import pyarrow.compute as _pc

        from ..stages.canonicalize import confidence_ranks

        conf = confidence_ranks(t.column("confidence"))
        score = _pc.fill_null(t.column("score").cast(pa.float64()), -1.0)
        out = t.append_column("_pref_c", pa.array(-conf))
        return out.append_column("_pref_s", _pc.negate(score))

    tagged = triples.map_batches(add_pref, batch_format="pyarrow",
                                 batch_size=spec.batch_size)
    dd = dedup_exact(tagged, list(TRIPLE_KEY), nb=spec.n_buckets, salt=salt,
                     keep_order_col=["_pref_c", "_pref_s"])
    return dd.drop_columns(["_pref_c", "_pref_s"])


def annotate_pages(
    pages: "ray.data.Dataset",
    spec: PipelineSpec | None = None,
    terms: pa.Table | None = None,
    curated: pa.Table | None = None,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """pages Dataset → deduped triples Dataset (no sink). Linking
    dispatches by key-set size (``spec.max_driver_keys``)."""
    spec = spec or PipelineSpec()
    # materialize the mention stream ONCE: the key pass, optional salt
    # probe and the triple join all consume it — without this the full
    # extract→detect→parse chain re-executes per consumer (run() solves
    # the same problem with its disk scatter)
    mentions = build_mentions(pages, spec).materialize()
    links_table = compute_links_auto(mentions, spec, terms, curated)
    return build_triples(mentions, links_table, spec, dedup=dedup)


def run(
    input_path: str | list[str] | "ray.data.Dataset",
    out_dir: str,
    spec: PipelineSpec | None = None,
    terms: pa.Table | None = None,
    curated: pa.Table | None = None,
    resume: bool = True,
    fail_after_parts: int | None = None,
    persist_mentions: bool = True,
) -> pa.Table:
    """Full checkpointed run: returns the manifest table.

    Single-job architecture: ONE Ray Data job computes the mention
    stream and scatters it into part_id = hash(url) % P fragment
    directories; P independent Ray tasks then finalize each partition
    (link its local distinct keys against the broadcast dictionary →
    emit triples → exact dedup → pack adjacency → atomic write +
    manifest). Linking is a pure function of (type, value), so
    partition-local linking produces byte-identical triples to a global
    distinct-key pass (tested) while removing both global barriers of
    the 3-job design. The mention fragments double as the stage
    checkpoint (resume skips the scatter via _SCATTER_DONE and skips
    finalized partitions via their manifests)."""
    from ..functions.hashing import hash_strings
    from ..sources.sink import run_sink
    from ..stages.linker import broadcast_dictionaries as _bd

    spec = spec or PipelineSpec()
    pages = (
        input_path
        if isinstance(input_path, ray.data.Dataset)
        else read_pages(input_path, lang=spec.lang, num_blocks=spec.num_blocks)
    )
    num_parts = spec.num_parts

    def tag(batch: pa.Table) -> pa.Table:
        import numpy as _np

        h = hash_strings(batch.column("url"))
        return batch.append_column(
            "part_id", pa.array((h % _np.uint64(num_parts)).astype(_np.int32))
        )

    mentions = build_mentions(pages, spec).map_batches(
        tag, batch_format="pyarrow", batch_size=spec.batch_size
    )
    terms_ref, curated_ref = _bd(terms, curated)
    return run_sink(
        mentions, out_dir, num_parts, terms_ref, curated_ref,
        min_confidence=spec.min_confidence, resume=resume,
        fail_after_parts=fail_after_parts, max_edges=spec.max_edges,
        max_finalize_rows=spec.max_finalize_rows, fuzzy=spec.fuzzy_link,
        expand_ancestors=spec.expand_ancestors,
    )
