"""Round-5 ADVICE regressions: join-cardinality int64 sum wrap and
phrase_search null-typed empty doc column under string ids."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.join import (
    _products_int64_checked, join_cardinality_estimate)
from biosd_feature_annotator_ray.stages.textindex import phrase_search


# --- _products_int64_checked -----------------------------------------------

def test_product_sum_wrap_raises_not_garbage():
    # 3 keys x 2^62 pairs each: every per-key product fits int64 but
    # the np.int64 batch sum wraps negative — the ADVICE scenario.
    nl = np.array([2 ** 31] * 3, np.int64)
    nr = np.array([2 ** 31] * 3, np.int64)
    with pytest.raises(ValueError, match="exceeds int64"):
        _products_int64_checked(nl, nr)


def test_product_single_key_overflow_still_raises():
    nl = np.array([2 ** 32], np.int64)
    nr = np.array([2 ** 32], np.int64)
    with pytest.raises(ValueError, match="exceeds int64"):
        _products_int64_checked(nl, nr)


def test_product_near_edge_exact_python_path():
    # max product just over the float guard but total under int64:
    # must return exact values (Python-int path, no raise).
    nl = np.array([2 ** 31 + 3, 7], np.int64)
    nr = np.array([2 ** 31 + 5, 11], np.int64)
    got = _products_int64_checked(nl, nr)
    assert got.dtype == np.int64
    assert int(got[0]) == (2 ** 31 + 3) * (2 ** 31 + 5)
    assert int(got[1]) == 77


def test_product_small_counts_vectorized_path():
    nl = np.array([2, 3, 0], np.int64)
    nr = np.array([5, 7, 9], np.int64)
    assert _products_int64_checked(nl, nr).tolist() == [10, 21, 0]
    assert _products_int64_checked(
        np.array([], np.int64), np.array([], np.int64)).tolist() == []


def test_join_cardinality_end_to_end_unchanged():
    l = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2, 2, 2, 3])}))
    r = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 4])}))
    got = join_cardinality_estimate(l, r, "k", nb=2).to_pylist()[0]
    assert got["est_rows"] == 2 * 1 + 3 * 2
    assert got["n_common_keys"] == 2
    assert got["max_key_rows"] == 6


# --- phrase_search with string ids -----------------------------------------

def _docs_str_ids(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(texts))],
                           pa.string()),
        "text": pa.array(texts, pa.string())}))


def test_phrase_search_string_ids_with_empty_batches():
    # Force batches that contain NO phrase-term tokens: with string
    # ids the empty object-array concat used to infer a null-typed
    # 'doc' column and break downstream schema unification.
    ds = _docs_str_ids(
        ["zz yy xx", "qq rr", "the cat sat", "ww vv",
         "uu tt", "cat the cat", "mm nn", "the cat the cat"]
    ).repartition(8)  # ~1 row per block → guaranteed all-miss batches
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(ds, "the cat", nb=2).take_all()}
    assert got == {"d2": 1, "d5": 1, "d7": 2}


def test_phrase_search_string_ids_no_hits_anywhere():
    ds = _docs_str_ids(["aa bb", "cc dd"]).repartition(2)
    assert phrase_search(ds, "the cat", nb=2).take_all() == []
