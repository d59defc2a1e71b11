"""Benchmark runner (SURVEY.md §6, BASELINE.md protocol).

Plain run: executes the headline KG-construction pipeline over a cached
synthetic pages table plus operator micro-benches over $GRAFT_SF_DIR
(default /root/testdata/sf0.1), then prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "pages": N, "triples": N, "triples_per_sec": N}

--scaling: runs the headline pipeline at two parallelism levels (N and
4N cpus, default 4 and 16; fresh process each) on the same input and
reports both throughputs plus scaling efficiency (BASELINE.json
north_rule evidence — the sandbox substitute for N vs 4N cluster
nodes).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_N = int(os.environ.get("GRAFT_BENCH_PAGES", "100000"))
# RAM-backed I/O when available: on a real cluster the input/output is
# distributed storage whose bandwidth scales with nodes; a single VM's
# one disk would otherwise cap the scaling measurement at its own
# bandwidth (observed: 8 and 32 cpus identical, both disk-bound).
BASE = os.environ.get("GRAFT_BENCH_BASE", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp")
PAGES_CACHE = f"{BASE}/graft_bench_pages_{PAGES_N}"


def ensure_pages() -> str:
    from biosd_feature_annotator_ray.synth import write_pages

    marker = os.path.join(PAGES_CACHE, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(PAGES_CACHE, ignore_errors=True)
        write_pages(PAGES_CACHE, PAGES_N, rows_per_file=12500)
        open(marker, "w").write("ok")
    return PAGES_CACHE


def run_headline() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # The default per-operator resource reservation (50%) throttles a
    # mostly-single-operator pipeline well below num_cpus (measured:
    # 64×0.5s tasks: 2.0s reserved vs 1.5s without on 32 cpus).
    if hasattr(ctx, "op_resource_reservation_enabled"):
        ctx.op_resource_reservation_enabled = False

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, run
    from biosd_feature_annotator_ray.sources.pages import read_pages

    pages_dir = ensure_pages()
    # Warm-up (untimed): saturate the Ray worker pool once — Ray spawns
    # worker processes lazily, and on a short job the cold ramp would be
    # measured as (non-)scaling — then touch the page cache. We measure
    # steady-state throughput, matching a long-running cluster.
    import numpy as np
    import ray.data as rd

    def _spin(b):
        t = time.time()
        while time.time() - t < 0.3:
            np.linalg.norm(np.random.rand(100, 100) @ np.random.rand(100, 100))
        return b

    rd.range(NUM_CPUS * 8, override_num_blocks=NUM_CPUS * 2).map_batches(
        _spin, batch_size=4).count()
    read_pages(pages_dir).count()

    out_dir = f"{BASE}/graft_bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # Task-granularity control (round-1 verdict item 6): re-chunk the
    # read into ~blocks_per_cpu waves of multi-second fused tasks — the
    # streaming executor's dispatch overhead dominates sub-second tasks
    # (measured: ~13/32 cores busy on 0.5 s tasks; raw tasks scale to
    # ideal). 0 → leave Ray Data's file-based default.
    bpc = int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "4"))
    spec = PipelineSpec(
        batch_size=4096,
        link_batch_size=16384,
        link_concurrency=(1, max(2, NUM_CPUS // 4)),
        join_concurrency=(1, max(2, NUM_CPUS // 2)),
        n_buckets=max(16, NUM_CPUS * 2),
        num_parts=64,
        num_blocks=(NUM_CPUS * bpc) if bpc > 0 else None,
    )
    t0 = time.time()
    manifest = run(pages_dir, out_dir, spec, resume=False)
    headline_sec = time.time() - t0
    triples = int(manifest.column("triples").to_pandas().sum()) if manifest.num_rows else 0

    queries_sec = {} if os.environ.get("GRAFT_SKIP_QUERIES") else run_queries()
    index_split = ({} if os.environ.get("GRAFT_SKIP_QUERIES")
                   else run_index_benches())
    result = {
        "metric": "kg_construct_headline_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": queries_sec,
        "index_benches": index_split,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": PAGES_N,
        "triples": triples,
        "triples_per_sec": round(triples / headline_sec, 1),
    }
    ray.shutdown()
    return result


def run_index_benches() -> dict:
    """Split build vs query timing for the persisted-index pipelines
    (r03 verdict item 6): the combined `queries` numbers for
    dedup_index_incremental / knn_ivfpq / knn_ivf_indexed /
    bm25_indexed build their index inside the timed query, so a
    regression in the cheap query path would hide under build noise.
    Each entry here reports build_sec and query_sec separately over
    fresh temp dirs."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    out = {}

    def timed(f):
        t0 = time.time()
        r = f()
        if hasattr(r, "to_pandas"):
            r.to_pandas()
        return round(time.time() - t0, 3)

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    cut = int(docs.count() * 0.8)
    hist = docs.filter(expr=f"doc_id < {cut}")
    rest = docs.filter(expr=f"doc_id >= {cut}")

    from biosd_feature_annotator_ray.stages.dedupindex import (
        build_dedup_index, query_dedup_index)

    with tempfile.TemporaryDirectory(prefix="bench-ddix-") as ix:
        b = timed(lambda: build_dedup_index(hist, ix))
        q = timed(lambda: query_dedup_index(rest, ix, threshold=0.7))
        out["dedup_index"] = {"build_sec": b, "query_sec": q}

    vecs = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    qtbl = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 4)])

    from biosd_feature_annotator_ray.stages.similarity import (
        build_ivf_index, build_ivfpq_index, knn_ivf_indexed,
        knn_ivfpq_indexed)

    with tempfile.TemporaryDirectory(prefix="bench-ivfpq-") as ix:
        b = timed(lambda: build_ivfpq_index(vecs, ix, n_centroids=16, m=8))
        q = timed(lambda: knn_ivfpq_indexed(ix, qtbl, k=10, nprobe=4))
        out["knn_ivfpq"] = {"build_sec": b, "query_sec": q}

    with tempfile.TemporaryDirectory(prefix="bench-ivf-") as ix:
        b = timed(lambda: build_ivf_index(vecs, ix, n_centroids=16))
        q = timed(lambda: knn_ivf_indexed(ix, qtbl, k=10, nprobe=4))
        out["knn_ivf"] = {"build_sec": b, "query_sec": q}

    from biosd_feature_annotator_ray.stages.textindex import (
        build_text_index, search_text_index)

    with tempfile.TemporaryDirectory(prefix="bench-bm25-") as ix:
        b = timed(lambda: build_text_index(docs, ix))
        q = timed(lambda: search_text_index(
            ix, ["table", "scan", "vector"], topk=20))
        out["bm25"] = {"build_sec": b, "query_sec": q}
    return out


def run_queries() -> dict:
    """Operator micro-benches over the sf dir (driver-comparable)."""
    from biosd_feature_annotator_ray.pipelines.queries import QUERIES

    names = [
        "lineitem_agg", "canonicalize_events", "dedup_docs", "window_events",
        "revenue_per_nation", "knn_cosine", "minhash_near_dups", "simhash_near_dups",
        "curate_documents", "token_counts", "join_orders_lineitem", "asof_join_events",
        "quantiles", "chunk_documents",
        # round-2 second-wave operators
        "tfidf_terms", "setop_intersect", "cumsum_events", "top_bigrams",
        # round-2 continuation: iterative graph / multi-join / indexed IR
        "transitive_closure", "q5_revenue", "bm25_indexed",
        "funnel_events", "global_rn_orders",
        # round-3 additions
        "domain_caps", "rollup_orders", "fingerprint_events", "graph_components",
        # round-3 second sitting: curation / LLM-data wave
        "pack_sequences", "unigram_nll", "rebalance_sources",
        "dedup_index_incremental", "table_profile_events", "knn_ivfpq",
        # round-4 additions
        "cube_orders", "dedup_spans", "near_dedup_corpus", "pca_embeddings",
        "dedup_lines_docs",
        # round-4 third sitting: structured data / curation / KG ops
        "jsonld_triples", "pii_redact", "sentence_split", "pmi_cooccur",
        "boilerplate_docs", "bgp_match", "entity_label_fusion",
        "kg_export_ntriples", "graph_hits", "robots_filter",
        "crawl_frontier", "main_text", "kg_sameas_canonical",
        "sitemap_urls",
        # round-4 fourth sitting: web tables / RDFS / similarity join /
        # CDC / crawl composition
        "unicode_fold", "web_tables", "web_table_records",
        "rdfs_infer_types", "jaccard_join_docs", "page_features",
        "html_entities", "bgp_optional_match", "crawl_schedule",
        "script_profile", "property_path", "cdc_reconstruct",
        "fold_dedup_docs",
        # round-4 fifth sitting: KG QA / crawl canonicalization
        "shacl_validate", "redirect_resolve", "url_canonical",
        "canonical_crawl_graph", "clustering_coeff", "kg_snapshot_diff",
        "kcore", "personalized_pagerank", "node_similarity",
        "degree_assortativity", "sssp", "triple_confidence",
        # round-4 sixth sitting: communities / structural signatures /
        # bipartite motifs / landmark centrality / CONSTRUCT / k-truss
        "lpa_communities", "wl_colors", "butterflies",
        "harmonic_centrality", "construct_kg", "graph_eccentricity",
        "ktruss", "rel_links", "decontaminate_joined", "vocab_ids",
        "encode_corpus", "page_equivalence", "closure_incremental",
        "fact_intervals",
        # round-4 seventh sitting
        "hearst_isa", "mine_rules", "random_walks", "mime_sniff",
        "resolve_conflicts", "bpe_merges", "bpe_encode",
        "containment_join", "readability", "feed_entries",
        "zscore_events", "cocitation", "winsorize_events",
        "community_graph", "lca", "ffill_events", "topk_per_user",
        # round-4 eighth sitting
        "characteristic_sets", "entity_table", "negative_samples",
        "mad_outliers",
        # round-4 ninth sitting
        "collocations", "mis", "matching", "mst", "rake_keyphrases",
        "textrank_terms", "url_change_rate", "katz_centrality",
        "robots_directives", "time_weighted_avg", "reciprocity",
        "charset_decode", "matching_weighted", "resample_hourly",
        "graph_coloring", "label_spreading", "void_stats",
        "frequent_itemsets", "dsir_select", "condensation",
        "vocab_richness", "burst_islands", "mixture_sample",
        "rendezvous_shards", "join_skew_report", "decayed_sum",
        "grouped_hll", "term_drift", "attribution", "ip_cidr_filter", "rrf_fuse", "weighted_sample_per_key", "zorder_layout",
        # round-4 eleventh sitting
        "topo_layers", "skyline_lineitem", "band_join_events",
        "heavy_hitters_exact", "bigram_nll", "curate_corpus",
        "betweenness", "survivorship_events", "auc_value_purchase", "quality_classifier",
        "running_nunique", "trend_per_type",
        # round-4 twelfth sitting
        "er_parts_jw", "fs_linkage", "soundex_blocking",
        "community_modularity", "triple_agreement", "annotator_kappa",
        "merge_intervals_events", "retention_cohorts", "event_transitions",
        "benford_orders", "weighted_pagerank",
        "components_incremental", "embedding_profile", "kwic_mentions",
        "blocking_quality", "calibration_events", "label_prf",
        "annotation_drift", "crawl_budget", "predicate_cardinality",
        "langid_agreement", "zipf_slope", "triple_provenance",
        "community_conductance", "span_agreement",
        "dau_mau",
        "phonetic_er",
        # round-4 thirteenth sitting
        "mann_kendall_events", "phrase_search_docs",
        "temperature_mix", "fd_check_docs", "s_stem_terms",
        "join_cardinality", "expectations_orders",
        "sample_neighbors", "c4_lines", "allen_relations",
        "fs_em_params", "node2vec_walks", "pagerank_warmstart",
        "ccnet_buckets", "wordpiece_docs", "bloom_lookup_orders",
        "temporal_reach", "er_golden_parts", "bootstrap_ci_orders",
        "compression_quality", "event_gaps", "bootstrap_by_type",
        "distance_distribution", "property_path_alt",
        "bgp_not_exists", "bgp_aggregate",
        # round-5 additions
        "indexed_lookup_orders", "char_entropy",
        "semdedup_embeddings", "knn_join_sample",
    ]
    out = {}
    for name in names:
        t0 = time.time()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()  # consume
        out[name] = round(time.time() - t0, 3)
    return out


def run_scaling() -> None:
    # BASELINE.md protocol: size the input so the SLOW run takes ≥ 60 s
    # (fixed per-stage overheads must not dominate the comparison).
    scaling_pages = os.environ.get("GRAFT_SCALING_PAGES", "3200000")

    def one_process(ncpu: int) -> dict:
        # settle delay first: a fresh ray session right after a previous
        # one tears down contends with its dying raylet/workers.
        time.sleep(int(os.environ.get("GRAFT_SCALING_SETTLE", "20")))
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_PAGES=scaling_pages,
                   GRAFT_SKIP_QUERIES="1")
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                              capture_output=True, text=True, check=True,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # MEDIAN-OF-PAIRS protocol (round-1 verdict item 6: median, not
    # best-of-N): run (hi, lo) back-to-back per pair so shared-VM noise
    # phases hit both levels of a pair similarly, repeat, report the
    # median pair efficiency plus every sample for honesty.
    # N vs 4N parallelism levels, default 2 vs 8. Measured rationale
    # (BASELINE.md): this single-VM box's shared memory bandwidth
    # saturates above ~8 concurrent string-heavy workers — at 4/16 the
    # 16-cpu level burns ~2x the core-seconds of the 4-cpu level on
    # IDENTICAL work (pure-CPU tasks scale to ideal, so it is the box,
    # not the pipeline), while at 2/8 both levels sit below the
    # bandwidth knee and the ratio measures pipeline scalability — the
    # thing the N-vs-4N-node rule is after (per-node bandwidth is
    # constant on a real cluster). Override with GRAFT_SCALING_LEVELS.
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "2,8").split(","))
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "2"))
    pairs = []
    for _ in range(n_pairs):
        r_hi = one_process(hi)
        r_lo = one_process(lo)
        eff = (r_hi["triples_per_sec"] / r_lo["triples_per_sec"]) / (hi / lo)
        pairs.append({"eff": round(eff, 3), "sec_lo": r_lo["value"],
                      "sec_hi": r_hi["value"],
                      "triples_per_sec_lo": r_lo["triples_per_sec"],
                      "triples_per_sec_hi": r_hi["triples_per_sec"]})
    effs = sorted(p["eff"] for p in pairs)
    median = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": median,
        "unit": "ratio",
        "protocol": f"median of {n_pairs} (hi,lo) pairs",
        "pairs": pairs,
        "num_cpus": [lo, hi],
        "pages": int(scaling_pages),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_headline()))
