"""Round-4 regression tests for the r03 ADVICE items: persisted-index
param-mismatch guards, rollup_agg scale validation, codebook content-hash
sampling without an id column."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _docs(n=30, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [" ".join(rng.choice(list("abcdefgh"), 12)) for _ in range(n)],
    })


def test_dedup_index_param_mismatch_raises(ray_session, tmp_path):
    from biosd_feature_annotator_ray.stages.dedupindex import build_dedup_index

    ix = str(tmp_path / "ix")
    docs = rd.from_pandas(_docs())
    assert build_dedup_index(docs, ix, num_perm=32, bands=8) == 30
    # same params: no-op resume, same count
    assert build_dedup_index(docs, ix, num_perm=32, bands=8) == 30
    with pytest.raises(ValueError, match="different params"):
        build_dedup_index(docs, ix, num_perm=64, bands=8)
    with pytest.raises(ValueError, match="different params"):
        build_dedup_index(docs, ix, num_perm=32, bands=8, seed=7)


def test_ivfpq_index_param_mismatch_raises(ray_session, tmp_path):
    from biosd_feature_annotator_ray.stages.similarity import build_ivfpq_index

    rng = np.random.default_rng(3)
    vecs = rd.from_pandas(pd.DataFrame({
        "vec_id": np.arange(64, dtype=np.int64),
        "embedding": list(rng.normal(size=(64, 16)).astype(np.float32)),
    }))
    ix = str(tmp_path / "pq")
    C, books = build_ivfpq_index(vecs, ix, n_centroids=4, m=4)
    C2, books2 = build_ivfpq_index(vecs, ix, n_centroids=4, m=4)  # resume
    assert np.allclose(C, C2) and np.allclose(books, books2)
    with pytest.raises(ValueError, match="different params"):
        build_ivfpq_index(vecs, ix, n_centroids=8, m=4)
    with pytest.raises(ValueError, match="different params"):
        build_ivfpq_index(vecs, ix, n_centroids=4, m=8)


def test_rollup_agg_scale_validation(ray_session):
    import duckdb

    from biosd_feature_annotator_ray.stages.canonicalize import rollup_agg

    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                       "v": [1.234567, 2.5, 3.75]})
    ds = rd.from_pandas(df).repartition(2)
    # 6-decimal values under decimals=2 must raise, not silently quantize
    with pytest.raises(Exception, match="fractional digits"):
        rollup_agg(ds, ["a", "b"], "v", decimals=2).to_pandas()
    # float fallback matches DuckDB ROLLUP
    got = (rollup_agg(ds, ["a", "b"], "v", decimals=None).to_pandas()
           .sort_values(["a", "b"], na_position="first")
           .reset_index(drop=True))
    want = duckdb.sql(
        "SELECT a, b, CAST(count(*) AS BIGINT) n_rows, sum(v) sum_value"
        " FROM df GROUP BY ROLLUP(a, b)"
        " ORDER BY a NULLS FIRST, b NULLS FIRST").df()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
    assert np.allclose(got["sum_value"], want["sum_value"])
    # decimals=6 handles the same data exactly
    got6 = (rollup_agg(ds, ["a", "b"], "v", decimals=6).to_pandas()
            .sort_values(["a", "b"], na_position="first"))
    assert np.allclose(got6["sum_value"].to_numpy(),
                       want["sum_value"].to_numpy())
    # NULL values raise with an actionable message
    dfn = df.copy()
    dfn.loc[1, "v"] = np.nan
    with pytest.raises(Exception, match="NULL"):
        rollup_agg(rd.from_pandas(dfn), ["a", "b"], "v",
                   decimals=None).to_pandas()


def test_codebook_content_hash_without_id_col(ray_session):
    """id_col=None no longer means first-rows bias: on cluster-sorted
    input the sample must still span clusters (r03 verdict item 5)."""
    from biosd_feature_annotator_ray.stages.similarity import (
        _hash_sample, build_centroids)

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(6, 8)) * 4
    # adversarially sorted: all of cluster 0 first, then cluster 1, ...
    rows = np.concatenate([centers[i] + 0.05 * rng.normal(size=(200, 8))
                           for i in range(6)])
    ds = rd.from_pandas(pd.DataFrame({"embedding": list(rows)})).repartition(6)
    sample = _hash_sample(ds, "embedding", None, 300)
    # nearest true center of each sampled row: all 6 clusters present
    sims = sample @ (centers / np.linalg.norm(centers, axis=1,
                                              keepdims=True)).T
    assert len(np.unique(sims.argmax(axis=1))) == 6
    C = build_centroids(ds, 6, "embedding", sample_rows=300, id_col=None)
    assert len(np.unique((C @ centers.T).argmax(axis=1))) >= 5
