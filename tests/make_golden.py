"""Regenerate tests/golden/triples_v1.parquet (FIXTURES.md §4).

Run manually: python tests/make_golden.py
Only rerun when the NORMATIVE spec changes (parse grammar, scoring
tiers, emission rules, synth generator) — the golden file pins P=R=1.0
at fixture scale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data as rd


def main() -> None:
    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from biosd_feature_annotator_ray.pipelines.annotate import PipelineSpec, annotate_pages
    from biosd_feature_annotator_ray.synth import gen_pages

    pages = rd.from_arrow(gen_pages(1000))
    triples = annotate_pages(pages, PipelineSpec(n_buckets=8))
    t = triples.to_pandas().sort_values(["subj", "pred", "obj", "obj_kind"]).reset_index(drop=True)
    out = os.path.join(os.path.dirname(__file__), "golden", "triples_v1.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), out)
    print(f"wrote {len(t)} triples → {out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
