"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the documents-proxy
    pages UNIONED with deterministic synthetic pages, through the full
    KG-construction pipeline → triples Dataset."""
    import ray.data as rd

    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.sources.pages import documents_as_pages
    from biosd_feature_annotator_ray.synth import gen_pages

    pages = documents_as_pages("/root/testdata/sf0.001").union(rd.from_arrow(gen_pages(1000)))
    return annotate_pages(pages, PipelineSpec(n_buckets=8))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (+ the training-data additions). See
    biosd_feature_annotator_ray/pipelines/queries.py."""
    from biosd_feature_annotator_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for the SQL-expressible queries; rows-only
    ops (LSH/near-dup, seeded sampling, heuristic scoring, the synthetic
    annotation pipeline) are intentionally absent."""
    from biosd_feature_annotator_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
