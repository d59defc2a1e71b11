"""The driver-side fast link path and the distributed shuffle+actor
path must produce identical canonical links (SURVEY.md §4.2-4)."""

from __future__ import annotations

import pandas as pd
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.pipelines.annotate import (
    PipelineSpec,
    build_mentions,
    compute_links_distributed,
    compute_links_table,
    dataset_to_table,
)
from biosd_feature_annotator_ray.synth import gen_pages


def test_driver_and_distributed_links_agree(ray_session):
    spec = PipelineSpec(n_buckets=8)
    pages = rd.from_arrow(gen_pages(300))
    mentions = build_mentions(pages, spec).materialize()

    fast = compute_links_table(mentions, spec).to_pandas()
    dist = dataset_to_table(compute_links_distributed(mentions, spec)).to_pandas()

    cols = ["key", "term_uri", "confidence", "provenance"]
    f = fast[cols].sort_values(cols).reset_index(drop=True)
    d = dist[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, d)
    assert len(f) > 0
