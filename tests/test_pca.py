"""Distributed PCA — parity with a single-machine numpy reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.stages.similarity import (
    pca_fit, pca_transform)


def _make_ds(X, parts=5):
    df = pd.DataFrame({"vec_id": np.arange(len(X)),
                       "embedding": [row.tolist() for row in X]})
    return rd.from_pandas(df).repartition(parts)


def _reference(X, k, center=True):
    mu = X.mean(axis=0) if center else np.zeros(X.shape[1])
    C = np.cov((X - mu).T, bias=False) if center else \
        (X.T @ X) / max(len(X) - 1, 1)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    amax = np.abs(comps).argmax(axis=1)
    signs = np.sign(comps[np.arange(len(comps)), amax])
    signs[signs == 0] = 1
    return mu, comps * signs[:, None], np.maximum(w[order], 0.0)


def test_pca_matches_numpy_reference(ray_session):
    rng = np.random.default_rng(3)
    # anisotropic cloud: stretch along two known directions
    base = rng.standard_normal((400, 6))
    base[:, 0] *= 8.0
    base[:, 1] *= 3.0
    X = base.astype(np.float64)
    m = pca_fit(_make_ds(X), n_components=3)
    mu, comps, evals = _reference(X, 3)
    assert m["n"] == 400
    assert np.allclose(m["mean"], mu, atol=1e-9)
    assert np.allclose(m["explained_variance"], evals, rtol=1e-8)
    assert np.allclose(m["components"], comps, atol=1e-8)
    assert m["explained_variance_ratio"][0] > 0.6
    assert abs(m["explained_variance_ratio"].sum()) <= 1.0 + 1e-12


def test_pca_transform_projection(ray_session):
    rng = np.random.default_rng(5)
    X = rng.standard_normal((200, 4)) * np.array([5.0, 2.0, 1.0, 0.5])
    ds = _make_ds(X, parts=4)
    m = pca_fit(ds, n_components=2)
    out = (pca_transform(ds, m).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert list(out.columns) == ["vec_id", "pc0", "pc1"]
    P = out[["pc0", "pc1"]].to_numpy()
    want = (X - m["mean"]) @ m["components"].T
    assert np.allclose(P, want, atol=1e-9)
    # projected variance along each PC equals its eigenvalue
    assert np.allclose(P.var(axis=0, ddof=1), m["explained_variance"],
                       rtol=1e-8)


def test_pca_uncentered_and_empty(ray_session):
    rng = np.random.default_rng(11)
    X = rng.standard_normal((50, 3)) + 10.0
    m = pca_fit(_make_ds(X, parts=2), n_components=2, center=False)
    # uncentered: the mean direction dominates
    assert np.allclose(m["mean"], 0.0)
    C = (X.T @ X) / (len(X) - 1)
    w = np.sort(np.linalg.eigvalsh(C))[::-1]
    assert np.allclose(m["explained_variance"], w[:2], rtol=1e-8)
    with pytest.raises(ValueError, match="empty"):
        pca_fit(rd.from_pandas(pd.DataFrame(
            {"embedding": pd.Series([], dtype=object)})))
