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


def test_auto_dispatch_crosses_threshold(ray_session):
    """compute_links_auto must route driver-side below max_driver_keys
    and distributed above it, with identical link tables either way —
    and annotate_pages E2E triples must not depend on the route."""
    from biosd_feature_annotator_ray.pipelines.annotate import annotate_pages, compute_links_auto

    pages = rd.from_arrow(gen_pages(300))
    spec_small = PipelineSpec(n_buckets=8)                      # bound ≪ 1e6 → driver
    spec_forced = PipelineSpec(n_buckets=8, max_driver_keys=1)  # bound > 1 → distributed
    mentions = build_mentions(pages, spec_small).materialize()

    cols = ["key", "term_uri", "confidence", "provenance"]

    def norm(df):
        return df[cols].sort_values(cols).reset_index(drop=True)

    auto_small = norm(compute_links_auto(mentions, spec_small).to_pandas())
    auto_forced = norm(compute_links_auto(mentions, spec_forced).to_pandas())
    pd.testing.assert_frame_equal(auto_small, auto_forced)
    assert len(auto_small) > 0

    key = ["subj", "pred", "obj", "obj_kind"]
    t_small = annotate_pages(rd.from_arrow(gen_pages(300)), spec_small).to_pandas()
    t_forced = annotate_pages(rd.from_arrow(gen_pages(300)), spec_forced).to_pandas()
    pd.testing.assert_frame_equal(
        t_small.sort_values(key).reset_index(drop=True),
        t_forced.sort_values(key).reset_index(drop=True),
    )
