"""CLI (SURVEY.md §2.10): the Ray-Data-native equivalent of the
reference's ``AnnotateCmd`` options (offset/limit windows → partition
selection; --submission → url-prefix/lang filters; --property-count →
count; --purge → partition rewrite; --random-quota → seeded sample).

    python -m biosd_feature_annotator_ray run    --input DIR --output DIR [--lang en]
                                                 [--random-quota P] [--limit N]
    python -m biosd_feature_annotator_ray count  --input DIR
    python -m biosd_feature_annotator_ray purge  --output DIR --older-than-ts T
    python -m biosd_feature_annotator_ray hotkeys --input DIR [--top K]

Owns its Ray session (scripts/CLI only — never the library).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="biosd_feature_annotator_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="full annotation run (AnnotateCmd equivalent)")
    pr.add_argument("--input", required=True)
    pr.add_argument("--output", required=True)
    pr.add_argument("--lang", default=None, help="M11 read-time language filter")
    pr.add_argument("--format", choices=["parquet", "warc", "jsonl"], default="parquet",
                    help="input format (warc/jsonl sources map onto the PAGES schema)")
    pr.add_argument("--url-prefix", default=None, help="S2 submission-scope analog")
    pr.add_argument("--random-quota", type=float, default=None, help="K3 seeded sample fraction")
    pr.add_argument("--limit", type=int, default=None, help="K2 smoke-slice")
    pr.add_argument("--num-parts", type=int, default=64)
    pr.add_argument("--min-confidence", default="GOOD")
    pr.add_argument("--no-resume", action="store_true")
    pr.add_argument("--salt", default="1",
                    help="hot-key sub-buckets for the dedup reduce; 'auto' samples "
                         "the key stream (K4 report) and picks one")
    pr.add_argument("--obo", default=None,
                    help="OBO ontology file replacing the built-in "
                         "term dictionary for linking (S5/S6)")
    pr.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))

    pol = sub.add_parser("ontoload", help="parse an OBO ontology "
                         "file into the linker's parquet tables")
    pol.add_argument("--obo", required=True)
    pol.add_argument("--output", required=True,
                     help="directory for terms.parquet + is_a.parquet")
    pol.add_argument("--num-cpus", type=int, default=2)

    pc_ = sub.add_parser("count", help="--property-count equivalent (A3)")
    pc_.add_argument("--input", required=True)
    pc_.add_argument("--num-cpus", type=int, default=8)

    pp = sub.add_parser("purge", help="drop partitions older than a cutoff (S4)")
    pp.add_argument("--output", required=True)
    pp.add_argument("--older-than-ts", type=float, required=True)

    ph = sub.add_parser("hotkeys", help="K4 top-k frequent keys report (salting input)")
    ph.add_argument("--input", required=True)
    ph.add_argument("--top", type=int, default=20)
    ph.add_argument("--num-cpus", type=int, default=8)

    pdp = sub.add_parser("dedup", help="near-duplicate pair scan over a documents parquet")
    pdp.add_argument("--input", required=True, help="parquet with (doc_id, text) columns")
    pdp.add_argument("--method", choices=["exact", "minhash", "simhash"], default="minhash")
    pdp.add_argument("--threshold", type=float, default=0.7, help="minhash Jaccard threshold")
    pdp.add_argument("--max-hamming", type=int, default=3, help="simhash hamming radius")
    pdp.add_argument("--output", default=None, help="write pairs parquet here (else print count)")
    pdp.add_argument("--num-cpus", type=int, default=8)

    pix = sub.add_parser("index", help="build a persisted IVF ANN index from an "
                         "embeddings parquet")
    pix.add_argument("--input", required=True, help="parquet with (vec_id, embedding)")
    pix.add_argument("--output", required=True, help="index directory")
    pix.add_argument("--centroids", type=int, default=64)
    pix.add_argument("--num-cpus", type=int, default=8)

    pse = sub.add_parser("search", help="top-k cosine search against a persisted IVF index")
    pse.add_argument("--index", required=True)
    pse.add_argument("--queries", required=True, help="parquet with (vec_id, embedding)")
    pse.add_argument("--k", type=int, default=10)
    pse.add_argument("--nprobe", type=int, default=8)
    pse.add_argument("--output", default=None, help="write results parquet here (else print)")
    pse.add_argument("--num-cpus", type=int, default=8)

    pcu = sub.add_parser(
        "curate", help="training-data curation pass (quality + lang-ID + fingerprint "
        "+ exact dedup) → resumable partitioned parquet")
    pcu.add_argument("--input", required=True, help="parquet with (doc_id, text[, lang])")
    pcu.add_argument("--output", required=True)
    pcu.add_argument("--num-parts", type=int, default=16)
    pcu.add_argument("--min-quality", type=float, default=None,
                     help="drop docs with quality_score below this")
    pcu.add_argument("--no-resume", action="store_true")
    pcu.add_argument("--num-cpus", type=int, default=8)

    pcl = sub.add_parser("cluster", help="distributed Lloyd k-means over an "
                         "embeddings parquet → (id, cluster) parquet")
    pcl.add_argument("--input", required=True)
    pcl.add_argument("--output", default=None)
    pcl.add_argument("--k", type=int, default=10)
    pcl.add_argument("--iters", type=int, default=15)
    pcl.add_argument("--num-cpus", type=int, default=8)

    pti = sub.add_parser("textindex", help="build a persisted BM25 inverted "
                         "index from a documents parquet")
    pti.add_argument("--input", required=True)
    pti.add_argument("--output", required=True)
    pti.add_argument("--buckets", type=int, default=32)
    pti.add_argument("--num-cpus", type=int, default=8)

    pts = sub.add_parser("textsearch", help="BM25 top-k against a persisted "
                         "text index (reads only the query terms' buckets)")
    pts.add_argument("--index", required=True)
    pts.add_argument("--terms", required=True, help="space-separated query")
    pts.add_argument("--k", type=int, default=20)
    pts.add_argument("--buckets", type=int, default=32)
    pts.add_argument("--num-cpus", type=int, default=8)

    psm = sub.add_parser("sample", help="deterministic sampling: md5-hash "
                         "fraction or A-ES weighted top-k")
    psm.add_argument("--input", required=True)
    psm.add_argument("--id-col", required=True)
    psm.add_argument("--output", default=None)
    psm.add_argument("--weight-col", default=None,
                     help="with --k: P(selected) ∝ weight (A-ES)")
    psm.add_argument("--k", type=int, default=None)
    psm.add_argument("--fraction-pct", type=int, default=None,
                     help="md5-bucket percent filter (0-100)")
    psm.add_argument("--num-cpus", type=int, default=8)

    pdi = sub.add_parser("dedupindex", help="persisted MinHash-LSH dedup "
                         "index: build once, query/append increments")
    pdi.add_argument("mode", choices=["build", "query", "append", "compact"])
    pdi.add_argument("--input", default=None,
                     help="documents parquet (doc_id, text); "
                          "not needed for compact")
    pdi.add_argument("--index", required=True, help="index directory")
    pdi.add_argument("--output", default=None,
                     help="query mode: write pairs parquet here")
    pdi.add_argument("--threshold", type=float, default=0.7)
    pdi.add_argument("--num-cpus", type=int, default=8)

    prb = sub.add_parser("rebalance", help="cap over-represented key groups "
                         "at an expected size (md5-uniform threshold)")
    prb.add_argument("--input", required=True)
    prb.add_argument("--key-col", required=True)
    prb.add_argument("--id-col", required=True)
    prb.add_argument("--cap", type=int, required=True)
    prb.add_argument("--output", default=None)
    prb.add_argument("--num-cpus", type=int, default=8)

    ppk = sub.add_parser("pack", help="GPT-style sequence packing: global "
                         "token offsets + fixed-length pack ids per doc")
    ppk.add_argument("--input", required=True)
    ppk.add_argument("--id-col", default="doc_id")
    ppk.add_argument("--text-col", default="text")
    ppk.add_argument("--seq-len", type=int, default=2048)
    ppk.add_argument("--output", default=None)
    ppk.add_argument("--num-cpus", type=int, default=8)

    ppf = sub.add_parser("profile", help="per-domain corpus census "
                         "(docs, mean length, language mix)")
    ppf.add_argument("--input", required=True)
    ppf.add_argument("--key-col", default="source")
    ppf.add_argument("--num-cpus", type=int, default=8)

    psd = sub.add_parser("spandedup", help="corpus-wide duplicate-span "
                         "removal (Lee-et-al exact-substring dedup at "
                         "k-token window granularity)")
    psd.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    psd.add_argument("--output", required=True, help="cleaned-corpus parquet dir")
    psd.add_argument("--granularity", choices=["window", "line"],
                     default="window",
                     help="window = k-token sliding windows (Lee et al.); "
                     "line = exact duplicate lines (CCNet paragraph pass)")
    psd.add_argument("--sep", default="\n", help="line separator "
                     "(line granularity only)")
    psd.add_argument("--k", type=int, default=20, help="window size in tokens")
    psd.add_argument("--keep-first", action="store_true", default=True)
    psd.add_argument("--remove-all", dest="keep_first", action="store_false",
                     help="drop every occurrence (no keep-first winner)")
    psd.add_argument("--buckets", type=int, default=32)
    psd.add_argument("--num-cpus", type=int, default=8)

    pcx = sub.add_parser("closure", help="transitive closure of a DAG edge "
                         "parquet (semi-naive, per-round checkpoint/resume)")
    pcx.add_argument("--input", required=True)
    pcx.add_argument("--child-col", default="child")
    pcx.add_argument("--parent-col", default="parent")
    pcx.add_argument("--output", default=None)
    pcx.add_argument("--checkpoint-dir", default=None)
    pcx.add_argument("--max-iters", type=int, default=40)
    pcx.add_argument("--num-cpus", type=int, default=8)

    pst = sub.add_parser("structured", help="structured-data extraction "
                         "from raw HTML pages: JSON-LD triples, OpenGraph "
                         "meta, or microdata itemprops")
    pst.add_argument("--input", required=True,
                     help="parquet with (url, html)")
    pst.add_argument("--output", required=True, help="parquet dir")
    pst.add_argument("--kind", choices=["jsonld", "og", "microdata"],
                     default="jsonld")
    pst.add_argument("--num-cpus", type=int, default=8)

    ppi = sub.add_parser("pii", help="typed PII detection + redaction "
                         "(email/cc/phone/ip) over a documents parquet")
    ppi.add_argument("--input", required=True)
    ppi.add_argument("--output", required=True)
    ppi.add_argument("--text-col", default="text")
    ppi.add_argument("--num-cpus", type=int, default=8)

    pbp = sub.add_parser("boilerplate", help="per-group frequent-line "
                         "removal (CCNet boilerplate pass)")
    pbp.add_argument("--input", required=True,
                     help="parquet with (doc_id, <group>, text)")
    pbp.add_argument("--output", required=True)
    pbp.add_argument("--group-col", default="source")
    pbp.add_argument("--sep", default="\n")
    pbp.add_argument("--min-docs", type=int, default=3)
    pbp.add_argument("--min-frac", type=float, default=None)
    pbp.add_argument("--buckets", type=int, default=32)
    pbp.add_argument("--num-cpus", type=int, default=8)

    pnt = sub.add_parser("ntexport", help="export a triples parquet as "
                         "N-Triples (.nt) files")
    pnt.add_argument("--input", required=True,
                     help="parquet with (subj, pred, obj[, obj_kind])")
    pnt.add_argument("--output", required=True, help=".nt directory")
    pnt.add_argument("--obj-kind-col", default=None,
                     help="column marking 'uri' objects (default: "
                     "scheme:// heuristic)")
    pnt.add_argument("--num-cpus", type=int, default=8)

    pvs = sub.add_parser("validate", help="SHACL-lite shape validation "
                         "of a triples parquet (QA gate before publish)")
    pvs.add_argument("--input", required=True,
                     help="parquet with (subj, pred, obj[, kind])")
    pvs.add_argument("--shapes", required=True,
                     help="JSON file: list of shape dicts "
                     "(target_class, pred, min_count, max_count, "
                     "obj_class, pattern, obj_kind)")
    pvs.add_argument("--output", default=None,
                     help="violations parquet dir (default: summary "
                     "to stdout only)")
    pvs.add_argument("--kind-col", default=None)
    pvs.add_argument("--type-pred", default="@type")
    pvs.add_argument("--num-cpus", type=int, default=8)

    prd = sub.add_parser("redirects", help="resolve redirect chains "
                         "(pointer doubling) to a canonical mapping")
    prd.add_argument("--input", required=True,
                     help="parquet with (src, dst) redirect edges")
    prd.add_argument("--output", required=True,
                     help="mapping parquet dir (src, final, hops, "
                     "status)")
    prd.add_argument("--max-hops", type=int, default=32)
    prd.add_argument("--num-cpus", type=int, default=8)

    pcm = sub.add_parser("communities", help="deterministic synchronous "
                         "label-propagation communities over an edge "
                         "parquet")
    pcm.add_argument("--input", required=True,
                     help="parquet with distinct (a, b) undirected edges")
    pcm.add_argument("--output", required=True,
                     help="(node, label) parquet dir")
    pcm.add_argument("--iters", type=int, default=3)
    pcm.add_argument("--num-cpus", type=int, default=8)

    pct = sub.add_parser("construct", help="SPARQL-style CONSTRUCT: match "
                         "a BGP over a triples parquet, emit template "
                         "triples (set semantics)")
    pct.add_argument("--input", required=True,
                     help="parquet with (subj, pred, obj) triples")
    pct.add_argument("--spec", required=True,
                     help="JSON file: {where: [[s,p,o],...], template: "
                     "[[s,p,o],...], optional?: [...], filters?: [...]}")
    pct.add_argument("--output", required=True,
                     help="constructed (subj, pred, obj) parquet dir")
    pct.add_argument("--num-cpus", type=int, default=8)

    prl = sub.add_parser("relations", help="Hearst-pattern is-a triple "
                         "extraction from a documents parquet")
    prl.add_argument("--input", required=True,
                     help="parquet with (doc_id, text)")
    prl.add_argument("--output", required=True,
                     help="(doc_id, subj, pred, obj, pattern) parquet dir")
    prl.add_argument("--num-cpus", type=int, default=8)

    pmr = sub.add_parser("rules", help="AMIE-lite 2-hop rule mining over a "
                         "triples parquet")
    pmr.add_argument("--input", required=True,
                     help="parquet with (subj, pred, obj) triples")
    pmr.add_argument("--output", required=True,
                     help="(p1, p2, p3, body_pairs, support, conf, "
                     "head_coverage) parquet dir")
    pmr.add_argument("--min-support", type=int, default=1)
    pmr.add_argument("--num-cpus", type=int, default=8)

    pwk = sub.add_parser("walks", help="seeded deterministic random walks "
                         "over an edge parquet (DeepWalk corpus prep)")
    pwk.add_argument("--input", required=True,
                     help="parquet with (src, dst) edges")
    pwk.add_argument("--output", required=True,
                     help="(start, walk, step, node) parquet dir")
    pwk.add_argument("--walk-len", type=int, default=3)
    pwk.add_argument("--walks-per-node", type=int, default=1)
    pwk.add_argument("--seed", type=int, default=7)
    pwk.add_argument("--num-cpus", type=int, default=8)

    psc = sub.add_parser("sccs", help="strongly connected components of a "
                         "directed edge parquet (trim + coloring)")
    psc.add_argument("--input", required=True,
                     help="parquet with (src, dst) edges")
    psc.add_argument("--output", required=True,
                     help="(node, scc) parquet dir")
    psc.add_argument("--num-cpus", type=int, default=8)

    pto = sub.add_parser("topo", help="Kahn topological layering of a DAG "
                         "edge parquet (cycles raise)")
    pto.add_argument("--input", required=True,
                     help="parquet with (src, dst) edges")
    pto.add_argument("--output", required=True,
                     help="(node, layer) parquet dir")
    pto.add_argument("--num-cpus", type=int, default=8)

    pbc = sub.add_parser("centrality", help="Brandes betweenness centrality "
                         "of a directed edge parquet (exact, or sampled "
                         "with --sample-every)")
    pbc.add_argument("--input", required=True,
                     help="parquet with (src, dst) edges")
    pbc.add_argument("--output", required=True,
                     help="(node, bc) parquet dir")
    pbc.add_argument("--sample-every", type=int, default=1,
                     help="use every k-th node (md5 order) as a source; "
                          "scores are rescaled by n/|S| automatically")
    pbc.add_argument("--max-exact-nodes", type=int, default=8192,
                     help="refuse an exact (unsampled) run above this "
                          "node count")
    pbc.add_argument("--no-rescale", action="store_true",
                     help="return raw sampled partial sums (no n/|S|)")
    pbc.add_argument("--num-cpus", type=int, default=8)

    pgd = sub.add_parser("golden", help="ER survivorship: fuse one golden "
                         "record per key (per-column first non-null by "
                         "order)")
    pgd.add_argument("--input", required=True)
    pgd.add_argument("--output", required=True)
    pgd.add_argument("--key", required=True)
    pgd.add_argument("--order-col", required=True)
    pgd.add_argument("--id-col", required=True)
    pgd.add_argument("--descending", action="store_true")
    pgd.add_argument("--num-cpus", type=int, default=8)

    pag = sub.add_parser("agreement", help="triple-set P/R/F1 of a "
                         "predicted triples parquet vs a gold one "
                         "(the north-rule acceptance gate)")
    pag.add_argument("--gold", required=True)
    pag.add_argument("--pred", required=True)
    pag.add_argument("--cols", default="subj,pred,obj",
                     help="comma-separated triple columns")
    pag.add_argument("--num-cpus", type=int, default=8)

    pka = sub.add_parser("kappa", help="Cohen's kappa agreement between "
                         "two categorical columns of one parquet")
    pka.add_argument("--input", required=True)
    pka.add_argument("--col-a", required=True)
    pka.add_argument("--col-b", required=True)
    pka.add_argument("--num-cpus", type=int, default=8)

    piv = sub.add_parser("intervals", help="per-key union of overlapping "
                         "[lo, hi] intervals (coverage islands)")
    piv.add_argument("--input", required=True)
    piv.add_argument("--output", required=True)
    piv.add_argument("--key", required=True)
    piv.add_argument("--lo", required=True)
    piv.add_argument("--hi", required=True)
    piv.add_argument("--num-cpus", type=int, default=8)

    pmo = sub.add_parser("modularity", help="Newman modularity Q of a "
                         "community labeling over an undirected edge "
                         "parquet")
    pmo.add_argument("--edges", required=True,
                     help="parquet with (a, b) undirected edges")
    pmo.add_argument("--labels", required=True,
                     help="parquet with (node, label)")
    pmo.add_argument("--num-cpus", type=int, default=8)

    pstat = sub.add_parser("stats", help="statistical tests over a "
                           "parquet: chi-square independence, Welch "
                           "t-test, two-sample KS, jackknife mean CI, "
                           "FD check")
    pstat.add_argument("--input", required=True)
    pstat.add_argument("--test", required=True,
                       choices=["contingency", "welch", "ks",
                                "jackknife", "fd", "bootstrap"])
    pstat.add_argument("--col-a", required=True,
                       help="first column (group/determinant/id col)")
    pstat.add_argument("--col-b", required=True,
                       help="second column (value/dependent col)")
    pstat.add_argument("--group-a", help="first group value "
                       "(welch/ks)")
    pstat.add_argument("--group-b", help="second group value "
                       "(welch/ks)")
    pstat.add_argument("--n-groups", type=int, default=20,
                       help="jackknife group count")
    pstat.add_argument("--num-cpus", type=int, default=8)

    pph = sub.add_parser("phrase", help="exact positional phrase "
                         "search over a documents parquet")
    pph.add_argument("--input", required=True)
    pph.add_argument("--phrase", required=True)
    pph.add_argument("--text-col", default="text")
    pph.add_argument("--id-col", default="doc_id")
    pph.add_argument("--num-cpus", type=int, default=8)

    pex = sub.add_parser("expectations", help="declarative data-"
                         "quality gate: validate a parquet against "
                         "a JSON rules file, report per-rule "
                         "violations")
    pex.add_argument("--input", required=True)
    pex.add_argument("--rules", required=True,
                     help="JSON file: list of "
                     '{"rule": ..., "col": ..., ...} expectations')
    pex.add_argument("--fail-on-violation", action="store_true",
                     help="exit 1 if any rule fails")
    pex.add_argument("--num-cpus", type=int, default=8)

    pbl = sub.add_parser("bloomindex", help="persisted per-file "
                         "Bloom point-lookup index over a secondary "
                         "key")
    pbl.add_argument("action", choices=["build", "lookup"])
    pbl.add_argument("--data", required=True,
                     help="directory of parquet files")
    pbl.add_argument("--index", required=True)
    pbl.add_argument("--key-col", help="key column (build)")
    pbl.add_argument("--keys", help="comma-separated keys (lookup)")
    pbl.add_argument("--output", help="result parquet (lookup)")
    pbl.add_argument("--bits-pow", type=int, default=20)
    pbl.add_argument("--num-cpus", type=int, default=8)

    plk = sub.add_parser("lookup", help="index-aware point lookup: "
                         "bloom-positive files -> zone-map row-group "
                         "pruning -> exact filter, one call; prints "
                         "the pruning stats")
    plk.add_argument("--data", required=True)
    plk.add_argument("--index", required=True,
                     help="bloomindex dir (build it first)")
    plk.add_argument("--keys", required=True,
                     help="comma-separated probe keys")
    plk.add_argument("--output", required=True)
    plk.add_argument("--columns", help="comma-separated projection")
    plk.add_argument("--num-cpus", type=int, default=8)

    pzm = sub.add_parser("zonemap", help="row-group zone-map pruning "
                         "probe: footers only, zero data I/O")
    pzm.add_argument("--data", required=True)
    pzm.add_argument("--col", required=True)
    pzm.add_argument("--lo", type=float)
    pzm.add_argument("--hi", type=float)
    pzm.add_argument("--num-cpus", type=int, default=8)

    args = p.parse_args(argv)

    if args.cmd == "purge":  # no Ray needed
        from biosd_feature_annotator_ray.sources.sink import purge

        removed = purge(args.output, args.older_than_ts)
        print(json.dumps({"removed_partitions": removed}))
        return 0

    if args.cmd == "ontoload":  # pure parse, no Ray needed
        import os as _os

        import pyarrow.parquet as _pq

        from biosd_feature_annotator_ray.state.oboparse import (
            parse_obo,
        )

        terms, is_a = parse_obo(args.obo)
        _os.makedirs(args.output, exist_ok=True)
        _pq.write_table(terms,
                        _os.path.join(args.output, "terms.parquet"))
        _pq.write_table(is_a,
                        _os.path.join(args.output, "is_a.parquet"))
        print(json.dumps({"terms": terms.num_rows,
                          "is_a_edges": is_a.num_rows,
                          "output": args.output}))
        return 0

    if args.cmd == "zonemap":  # metadata only, no Ray needed
        from biosd_feature_annotator_ray.stages.profile import (
            zonemap_report,
        )

        rep = zonemap_report(args.data, args.col, lo=args.lo,
                             hi=args.hi).to_pylist()
        total = rep[-1]
        print(json.dumps({"files": len(rep) - 1,
                          "n_rowgroups": total["n_rowgroups"],
                          "n_pruned": total["n_pruned"],
                          "rows_scanned": total["rows_scanned"],
                          "n_rows": total["n_rows"]}))
        return 0

    import ray

    ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from biosd_feature_annotator_ray.sources.pages import read_pages

        if args.cmd == "count":
            print(json.dumps({"property_values": read_pages(args.input).count()}))
            return 0

        if args.cmd == "hotkeys":
            from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, build_mentions
            from biosd_feature_annotator_ray.stages.canonicalize import distinct_counts

            mentions = build_mentions(read_pages(args.input), PipelineSpec())
            counts = distinct_counts(mentions, "key", nb=32)
            top = counts.sort(["count", "key"], descending=[True, False]).limit(args.top)
            print(top.to_pandas().to_json(orient="records"))
            return 0

        if args.cmd == "dedup":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages import dedup as dd
            from biosd_feature_annotator_ray.stages.canonicalize import dedup_exact

            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            if args.method == "exact":
                pairs = dedup_exact(docs, ["text"], keep_order_col="doc_id")
            elif args.method == "minhash":
                pairs = dd.minhash_near_dups(docs, threshold=args.threshold,
                                             stats_name=dd.DEDUP_STATS_ACTOR)
            else:
                pairs = dd.simhash_near_dups(docs, max_hamming=args.max_hamming,
                                             stats_name=dd.DEDUP_STATS_ACTOR)
            pairs = pairs.materialize()  # one execution for write + count
            if args.output:
                pairs.write_parquet(args.output)
                print(json.dumps({"rows": pairs.count(), "output": args.output}))
            else:
                print(json.dumps({"rows": pairs.count()}))
            return 0

        if args.cmd == "index":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.similarity import build_ivf_index

            C = build_ivf_index(rd.read_parquet(args.input), args.output,
                                n_centroids=args.centroids)
            print(json.dumps({"centroids": int(C.shape[0]), "dim": int(C.shape[1]),
                              "output": args.output}))
            return 0

        if args.cmd == "search":
            import pyarrow.parquet as pq

            from biosd_feature_annotator_ray.stages.similarity import knn_ivf_indexed

            queries = pq.read_table(args.queries)
            out = knn_ivf_indexed(args.index, queries, k=args.k, nprobe=args.nprobe)
            if args.output:
                out.write_parquet(args.output)
                print(json.dumps({"rows": out.count(), "output": args.output}))
            else:
                df = out.to_pandas()
                print(df.to_json(orient="records"))
            return 0

        if args.cmd == "dedupindex":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages import dedupindex as di

            if args.mode == "compact":
                stats = di.compact_dedup_index(args.index)
                print(json.dumps({**stats, "index": args.index}))
                return 0
            if not args.input:
                print("dedupindex: --input is required for "
                      f"{args.mode}", file=sys.stderr)
                return 2
            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            if args.mode == "build":
                n = di.build_dedup_index(docs, args.index)
                print(json.dumps({"indexed": n, "index": args.index}))
            elif args.mode == "append":
                n = di.append_dedup_index(docs, args.index)
                print(json.dumps({"appended": n, "index": args.index}))
            else:
                pairs = di.query_dedup_index(docs, args.index,
                                             threshold=args.threshold
                                             ).materialize()
                if args.output:
                    pairs.write_parquet(args.output)
                print(json.dumps({"pairs": pairs.count(),
                                  "output": args.output}))
            return 0

        if args.cmd == "rebalance":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.canonicalize import rebalance_sample

            out = rebalance_sample(rd.read_parquet(args.input),
                                   args.key_col, args.id_col,
                                   cap=args.cap).materialize()
            if args.output:
                out.write_parquet(args.output)
            print(json.dumps({"rows": out.count(), "output": args.output}))
            return 0

        if args.cmd == "pack":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.textstats import pack_sequences

            out = pack_sequences(rd.read_parquet(
                args.input, columns=[args.id_col, args.text_col]),
                id_col=args.id_col, col=args.text_col,
                seq_len=args.seq_len).materialize()
            n_packs = out.max("pack_id")
            if args.output:
                out.write_parquet(args.output)
            print(json.dumps({"docs": out.count(),
                              "packs": int(n_packs) + 1 if n_packs is not None else 0,
                              "seq_len": args.seq_len,
                              "output": args.output}))
            return 0

        if args.cmd == "profile":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.textstats import source_profile

            out = source_profile(rd.read_parquet(args.input),
                                 key_col=args.key_col)
            print(out.to_pandas().sort_values(args.key_col)
                  .to_json(orient="records"))
            return 0

        if args.cmd == "spandedup":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.dedup import (
                dedup_lines, remove_dup_spans)

            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            if args.granularity == "line":
                out = dedup_lines(docs, sep=args.sep,
                                  keep_first=args.keep_first,
                                  nb=args.buckets).materialize()
                unit = "n_lines"
            else:
                out = remove_dup_spans(docs, k=args.k,
                                       keep_first=args.keep_first,
                                       nb=args.buckets).materialize()
                unit = "n_tokens"
            out.write_parquet(args.output)
            removed = out.sum("n_removed") or 0
            total = out.sum(unit) or 0
            print(json.dumps({"docs": out.count(),
                              unit: int(total),
                              "removed": int(removed),
                              "output": args.output}))
            return 0

        if args.cmd == "closure":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import transitive_closure

            out = transitive_closure(
                rd.read_parquet(args.input), child_col=args.child_col,
                parent_col=args.parent_col, max_iters=args.max_iters,
                checkpoint_dir=args.checkpoint_dir).materialize()
            if args.output:
                out.write_parquet(args.output)
                print(json.dumps({"pairs": out.count(),
                                  "output": args.output}))
            else:
                print(json.dumps({"pairs": out.count()}))
            return 0

        if args.cmd == "structured":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages import structured as st

            fn = {"jsonld": st.extract_jsonld,
                  "og": st.extract_meta_properties,
                  "microdata": st.extract_microdata}[args.kind]
            out = rd.read_parquet(args.input).map_batches(
                fn, batch_format="pyarrow", batch_size=4096).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"rows": out.count(), "output": args.output}))
            return 0

        if args.cmd == "pii":
            import ray.data as rd

            from biosd_feature_annotator_ray.functions.pii import (
                detect_pii,
                redact_pii,
            )

            tc = args.text_col
            out = (rd.read_parquet(args.input)
                   .map_batches(lambda b, c=tc: detect_pii(b, c),
                                batch_format="pyarrow")
                   .map_batches(lambda b, c=tc: redact_pii(b, c),
                                batch_format="pyarrow")).materialize()
            out.write_parquet(args.output)
            import pyarrow.compute as pc_

            tot = {f"n_{k}": 0 for k in ("email", "cc", "phone", "ip")}
            for bt in out.iter_batches(batch_format="pyarrow"):
                for k in tot:
                    s = pc_.sum(bt.column(k))
                    tot[k] += int(s.as_py() or 0)
            print(json.dumps({"rows": out.count(), **tot,
                              "output": args.output}))
            return 0

        if args.cmd == "boilerplate":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.dedup import (
                remove_boilerplate,
            )

            out = remove_boilerplate(
                rd.read_parquet(args.input), group_col=args.group_col,
                sep=args.sep, min_docs=args.min_docs,
                min_frac=args.min_frac, nb=args.buckets).materialize()
            out.write_parquet(args.output)
            df = out.to_pandas()
            print(json.dumps({"rows": int(len(df)),
                              "lines_removed": int(df["n_removed"].sum()),
                              "output": args.output}))
            return 0

        if args.cmd == "validate":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import (
                validate_shapes,
            )

            with open(args.shapes) as f:
                shapes = json.load(f)
            out = validate_shapes(rd.read_parquet(args.input), shapes,
                                  kind_col=args.kind_col,
                                  type_pred=args.type_pred)
            if args.output:
                out = out.materialize()
                out.write_parquet(args.output)
            df = out.to_pandas()
            by = (df.groupby(["shape_id", "constraint"]).size()
                  .reset_index(name="n"))
            print(json.dumps({
                "violations": int(len(df)),
                "by_constraint": [
                    {"shape_id": int(r.shape_id),
                     "constraint": r.constraint, "n": int(r.n)}
                    for r in by.itertuples()],
                "output": args.output}))
            return 0

        if args.cmd == "redirects":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import (
                resolve_redirects,
            )

            out = resolve_redirects(rd.read_parquet(args.input),
                                    max_hops=args.max_hops).materialize()
            out.write_parquet(args.output)
            df = out.to_pandas()
            print(json.dumps({
                "sources": int(len(df)),
                "resolved": int((df["status"] == "resolved").sum()),
                "unresolved": int((df["status"] == "unresolved").sum()),
                "output": args.output}))
            return 0

        if args.cmd == "communities":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import (
                label_propagation,
            )

            out = label_propagation(rd.read_parquet(args.input),
                                    n_iters=args.iters).materialize()
            out.write_parquet(args.output)
            df = out.to_pandas()
            print(json.dumps({
                "nodes": int(len(df)),
                "communities": int(df["label"].nunique()),
                "output": args.output}))
            return 0

        if args.cmd == "construct":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import (
                construct_triples,
            )

            with open(args.spec) as fh:
                spec = json.load(fh)
            out = construct_triples(
                rd.read_parquet(args.input),
                where=[tuple(x) for x in spec["where"]],
                template=[tuple(x) for x in spec["template"]],
                optional=[tuple(x) for x in spec["optional"]]
                if spec.get("optional") else None,
                filters=[tuple(x) for x in spec["filters"]]
                if spec.get("filters") else None,
            ).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"triples": out.count(),
                              "output": args.output}))
            return 0

        if args.cmd == "relations":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.relations import (
                extract_hearst,
            )

            out = rd.read_parquet(args.input,
                                  columns=["doc_id", "text"]).map_batches(
                extract_hearst, batch_format="pyarrow").materialize()
            out.write_parquet(args.output)
            print(json.dumps({"triples": out.count(),
                              "output": args.output}))
            return 0

        if args.cmd == "rules":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import mine_rules

            out = mine_rules(rd.read_parquet(args.input),
                             min_support=args.min_support).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"rules": out.count(),
                              "output": args.output}))
            return 0

        if args.cmd == "walks":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import (
                random_walks,
            )

            out = random_walks(
                rd.read_parquet(args.input), walk_len=args.walk_len,
                walks_per_node=args.walks_per_node,
                seed=args.seed).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"rows": out.count(),
                              "output": args.output}))
            return 0

        if args.cmd == "sccs":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import scc

            out = scc(rd.read_parquet(args.input)).materialize()
            out.write_parquet(args.output)
            df = out.to_pandas()
            print(json.dumps({"nodes": int(len(df)),
                              "components": int(df["scc"].nunique()),
                              "output": args.output}))
            return 0

        if args.cmd == "topo":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import topo_layers

            out = topo_layers(rd.read_parquet(args.input)).materialize()
            out.write_parquet(args.output)
            df = out.to_pandas()
            print(json.dumps({"nodes": int(len(df)),
                              "depth": int(df["layer"].max()) if len(df) else 0,
                              "output": args.output}))
            return 0

        if args.cmd == "centrality":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import betweenness

            edges = rd.read_parquet(args.input)
            # sampling + the n/|S| rescale now live IN betweenness():
            # the estimator the CLI hands back is already unbiased,
            # and an exact run over too many nodes raises loudly.
            out = betweenness(
                edges,
                sample_every=(args.sample_every
                              if args.sample_every > 1 else None),
                max_exact_nodes=args.max_exact_nodes,
                rescale=not args.no_rescale).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"nodes": int(out.count()),
                              "sampled": args.sample_every > 1,
                              "rescaled": (args.sample_every > 1
                                           and not args.no_rescale),
                              "output": args.output}))
            return 0

        if args.cmd == "golden":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.canonicalize import (
                survivorship)

            out = survivorship(
                rd.read_parquet(args.input), args.key, args.order_col,
                args.id_col, ascending=not args.descending).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"keys": int(out.count()),
                              "output": args.output}))
            return 0

        if args.cmd == "agreement":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import (
                triple_agreement)

            cols = [c.strip() for c in args.cols.split(",") if c.strip()]
            row = triple_agreement(rd.read_parquet(args.gold),
                                   rd.read_parquet(args.pred),
                                   cols=cols).to_pylist()[0]
            print(json.dumps(row))
            return 0

        if args.cmd == "kappa":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.sketches import (
                cohen_kappa)

            row = cohen_kappa(rd.read_parquet(args.input),
                              args.col_a, args.col_b).to_pylist()[0]
            print(json.dumps(row))
            return 0

        if args.cmd == "intervals":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.windows import (
                merge_intervals)

            out = merge_intervals(rd.read_parquet(args.input),
                                  args.key, args.lo,
                                  args.hi).materialize()
            out.write_parquet(args.output)
            print(json.dumps({"islands": int(out.count()),
                              "output": args.output}))
            return 0

        if args.cmd == "modularity":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.graph import modularity

            row = modularity(rd.read_parquet(args.edges),
                             rd.read_parquet(args.labels)).to_pylist()[0]
            print(json.dumps(row))
            return 0

        if args.cmd == "stats":
            import ray.data as rd

            ds = rd.read_parquet(args.input,
                                 columns=[args.col_a, args.col_b])
            if args.test == "contingency":
                from biosd_feature_annotator_ray.stages.sketches import (
                    contingency_stats,
                )

                row = contingency_stats(ds, args.col_a,
                                        args.col_b).to_pylist()[0]
            elif args.test == "welch":
                from biosd_feature_annotator_ray.stages.sketches import (
                    welch_ttest,
                )

                row = welch_ttest(ds, args.col_a, args.col_b,
                                  args.group_a,
                                  args.group_b).to_pylist()[0]
            elif args.test == "ks":
                from biosd_feature_annotator_ray.stages.sketches import (
                    ks_test,
                )

                row = ks_test(ds, args.col_a, args.col_b,
                              args.group_a, args.group_b).to_pylist()[0]
            elif args.test == "jackknife":
                from biosd_feature_annotator_ray.stages.sketches import (
                    jackknife_mean,
                )

                row = jackknife_mean(ds, args.col_a, args.col_b,
                                     n_groups=args.n_groups
                                     ).to_pylist()[0]
            elif args.test == "bootstrap":
                from biosd_feature_annotator_ray.stages.sketches import (
                    bootstrap_ci,
                )

                row = bootstrap_ci(ds, args.col_a,
                                   args.col_b).to_pylist()[0]
            else:
                from biosd_feature_annotator_ray.stages.profile import (
                    fd_violations,
                )

                row = fd_violations(ds, args.col_a,
                                    args.col_b).to_pylist()[0]
            print(json.dumps(row))
            return 0

        if args.cmd == "expectations":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.profile import (
                expectations_report,
            )

            with open(args.rules) as f:
                rules = json.load(f)
            rep = expectations_report(rd.read_parquet(args.input),
                                      rules)
            rows = rep.to_pylist()
            print(json.dumps({"rules": rows,
                              "ok": all(r["ok"] for r in rows)}))
            return 0 if (not args.fail_on_violation
                         or all(r["ok"] for r in rows)) else 1

        if args.cmd == "bloomindex":
            from biosd_feature_annotator_ray.stages.bloomindex import (
                bloom_point_lookup,
                build_bloom_index,
            )

            if args.action == "build":
                if not args.key_col:
                    p.error("bloomindex build needs --key-col")
                n = build_bloom_index(args.data, args.key_col,
                                      args.index,
                                      bits_pow=args.bits_pow)
                print(json.dumps({"files_indexed": n,
                                  "index": args.index}))
                return 0
            if not args.keys or not args.output:
                p.error("bloomindex lookup needs --keys and --output")
            # key type comes from the DATA schema, never guessed per
            # token — a digit-like string key must stay a string
            import os as _os

            import pyarrow as _pa
            import pyarrow.parquet as _pq

            meta = _pq.read_table(
                _os.path.join(args.index, "meta.parquet")
            ).to_pylist()[0]
            first = sorted(
                f for f in _os.listdir(args.data)
                if f.endswith(".parquet"))[0]
            ktype = _pq.read_schema(
                _os.path.join(args.data, first)).field(
                meta["key_col"]).type
            toks = args.keys.split(",")
            if _pa.types.is_integer(ktype):
                keys = [int(k) for k in toks]
            elif _pa.types.is_floating(ktype):
                keys = [float(k) for k in toks]
            else:
                keys = toks
            out = bloom_point_lookup(args.data, args.index, keys)
            out = out.materialize()
            out.write_parquet(args.output)
            print(json.dumps({"rows": int(out.count()),
                              "output": args.output}))
            return 0

        if args.cmd == "lookup":
            import os as _os

            import pyarrow as _pa
            import pyarrow.parquet as _pq

            from biosd_feature_annotator_ray.stages.bloomindex import (
                pruned_point_lookup,
            )

            meta = _pq.read_table(
                _os.path.join(args.index, "meta.parquet")).to_pylist()[0]
            first = sorted(
                f for f in _os.listdir(args.data)
                if f.endswith(".parquet"))[0]
            ktype = _pq.read_schema(
                _os.path.join(args.data, first)).field(
                meta["key_col"]).type
            toks = args.keys.split(",")
            if _pa.types.is_integer(ktype):
                keys = [int(k) for k in toks]
            elif _pa.types.is_floating(ktype):
                keys = [float(k) for k in toks]
            else:
                keys = toks
            cols = args.columns.split(",") if args.columns else None
            ds, stats = pruned_point_lookup(
                args.data, args.index, keys, columns=cols)
            ds = ds.materialize()
            ds.write_parquet(args.output)
            print(json.dumps({"rows": int(ds.count()),
                              "output": args.output, **stats}))
            return 0

        if args.cmd == "phrase":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.textindex import (
                phrase_search,
            )

            out = phrase_search(
                rd.read_parquet(args.input,
                                columns=[args.id_col, args.text_col]),
                args.phrase, text_col=args.text_col,
                id_col=args.id_col)
            df = out.to_pandas().sort_values(args.id_col)
            print(json.dumps({"matching_docs": int(len(df)),
                              "total_matches":
                                  int(df["n_matches"].sum())}))
            return 0

        if args.cmd == "ntexport":
            import ray.data as rd

            from biosd_feature_annotator_ray.sources.ntriples import (
                write_ntriples,
            )

            man = write_ntriples(rd.read_parquet(args.input), args.output,
                                 obj_kind_col=args.obj_kind_col)
            df = man.to_pandas()
            print(json.dumps({"files": int(len(df)),
                              "triples": int(df["n_triples"].sum()),
                              "output": args.output}))
            return 0

        if args.cmd == "cluster":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.similarity import kmeans

            C, assign = kmeans(rd.read_parquet(args.input), k=args.k,
                               max_iters=args.iters)
            if args.output:
                assign.write_parquet(args.output)
                print(json.dumps({"k": int(C.shape[0]), "dim": int(C.shape[1]),
                                  "output": args.output}))
            else:
                sizes = assign.to_pandas()["cluster"].value_counts().sort_index()
                print(json.dumps({"k": int(C.shape[0]),
                                  "sizes": sizes.to_dict()}))
            return 0

        if args.cmd == "textindex":
            import ray.data as rd

            from biosd_feature_annotator_ray.stages.textindex import build_text_index

            build_text_index(rd.read_parquet(args.input), args.output,
                             nb=args.buckets)
            print(json.dumps({"output": args.output}))
            return 0

        if args.cmd == "textsearch":
            from biosd_feature_annotator_ray.stages.textindex import search_text_index

            out = search_text_index(args.index, args.terms.split(),
                                    topk=args.k, nb=args.buckets)
            print(out.to_pandas().to_json(orient="records"))
            return 0

        if args.cmd == "sample":
            import pyarrow as pa
            import ray.data as rd

            from biosd_feature_annotator_ray.functions.hashing import md5_u32
            from biosd_feature_annotator_ray.stages.sketches import weighted_sample

            ds = rd.read_parquet(args.input)
            if args.weight_col and args.k:
                out = weighted_sample(ds, args.id_col, args.weight_col, args.k)
            elif args.fraction_pct is not None:
                pct = args.fraction_pct

                def flt(t: "pa.Table", p=pct, c=args.id_col):
                    h = md5_u32(t.column(c).to_pylist()) % 100
                    return t.filter(pa.array(h < p))

                out = ds.map_batches(flt, batch_format="pyarrow")
            else:
                raise SystemExit("sample: need --weight-col+--k or --fraction-pct")
            out = out.materialize()
            if args.output:
                out.write_parquet(args.output)
                print(json.dumps({"rows": out.count(), "output": args.output}))
            else:
                print(json.dumps({"rows": out.count()}))
            return 0

        if args.cmd == "curate":
            import pyarrow.compute as pc
            import ray.data as rd

            from biosd_feature_annotator_ray.sources.sink import write_dataset_partitioned
            from biosd_feature_annotator_ray.stages import textstats
            from biosd_feature_annotator_ray.stages.canonicalize import dedup_exact
            from biosd_feature_annotator_ray.stages.util import as_task_fn

            docs = rd.read_parquet(args.input)
            enriched = (
                docs.map_batches(textstats.quality_features, batch_format="pyarrow")
                .map_batches(as_task_fn(textstats.LangIdStage), batch_format="pyarrow")
                .map_batches(textstats.fingerprint, batch_format="pyarrow")
            )
            if args.min_quality is not None:
                thr = args.min_quality
                enriched = enriched.map_batches(
                    lambda t, th=thr: t.filter(
                        pc.greater_equal(t.column("quality_score"), th)),
                    batch_format="pyarrow")
            keep = dedup_exact(enriched, ["content_hash"], nb=args.num_parts,
                               keep_order_col="doc_id")
            man = write_dataset_partitioned(keep, args.output, key_col="doc_id",
                                            num_parts=args.num_parts,
                                            resume=not args.no_resume)
            df = man.to_pandas()
            print(json.dumps({
                "partitions_written": int(len(df)),
                "rows": int(df["rows"].sum()) if len(df) else 0,
                "output": args.output,
            }))
            return 0

        # run
        from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, run

        spec = PipelineSpec(num_parts=args.num_parts, min_confidence=args.min_confidence,
                            lang=args.lang,
                            salt="auto" if args.salt == "auto" else int(args.salt))
        if args.format == "warc":
            from biosd_feature_annotator_ray.sources.warc import read_pages_warc

            pages = read_pages_warc(args.input)
        elif args.format == "jsonl":
            from biosd_feature_annotator_ray.sources.warc import read_pages_jsonl

            pages = read_pages_jsonl(args.input)
        else:
            pages = read_pages(args.input, lang=args.lang, url_prefix=args.url_prefix)
        if args.format != "parquet" and (args.lang or args.url_prefix):
            # the parquet path pushes these filters into the read; the
            # WARC/JSONL sources apply them post-read (same semantics:
            # a null lang never equals --lang)
            import pyarrow as pa
            import pyarrow.compute as pc

            def _scope(t: pa.Table, lang=args.lang, pref=args.url_prefix) -> pa.Table:
                keep = pa.array([True] * len(t))
                if lang:
                    keep = pc.and_(keep, pc.equal(t.column("lang"), lang))
                if pref:
                    keep = pc.and_(keep, pc.starts_with(t.column("url"), pattern=pref))
                return t.filter(pc.fill_null(keep, False))

            pages = pages.map_batches(_scope, batch_format="pyarrow")
        if args.random_quota is not None:
            pages = pages.random_sample(args.random_quota, seed=42)
        if args.limit is not None:
            pages = pages.limit(args.limit)
        terms = None
        if args.obo:
            from biosd_feature_annotator_ray.state.oboparse import (
                parse_obo,
            )

            terms, _ = parse_obo(args.obo)
        manifest = run(pages, args.output, spec, terms=terms,
                       resume=not args.no_resume)
        df = manifest.to_pandas()
        print(json.dumps({
            "partitions_written": int(len(df)),
            "triples": int(df["triples"].sum()) if len(df) else 0,
        }))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
