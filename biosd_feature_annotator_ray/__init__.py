"""biosd_feature_annotator_ray — a Ray-Data-native KG-construction engine.

From-scratch re-expression of the capabilities of
``EBIBioSamples/biosd_feature_annotator`` (a single-JVM thread-pooled
DB annotator, see SURVEY.md) as a streaming Ray Data pipeline over
Common-Crawl-style Parquet page tables:

    pages --(extract_text)--> text --(detect_mentions)--> mentions
      --(normalize + parse typed values)--> typed mentions
      --(distinct keys -> LinkerActor pool -> canonicalize shuffle)--> links
      --(broadcast-back join, emit + dedup)--> triples
      --(hash-partition by subj, pack adjacency)--> graph parquet + manifest

The reference snapshot at /root/reference was EMPTY at build time
(SURVEY.md §0); the binding spec is BASELINE.json + FIXTURES.md.

Library code never calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver harness, bench.py, pytest fixture).
"""

__version__ = "0.1.0"

# Version string for the deterministic text-extraction rule. Recorded in
# every checkpoint manifest; changing the rule invalidates checkpoints
# (SURVEY.md §7 risk 1 — byte-identity invariant).
EXTRACT_VERSION = "textextract/v1"
