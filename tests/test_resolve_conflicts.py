"""Functional-property conflict resolution (r04 seventh sitting)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import resolve_conflicts


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)


def test_winner_margin_and_counts():
    rows = [
        # e1 bornIn: paris twice (0.5, 0.5 → 0.75) vs rome once (0.6)
        {"subj": "e1", "pred": "bornIn", "obj": "paris", "score": 0.5},
        {"subj": "e1", "pred": "bornIn", "obj": "paris", "score": 0.5},
        {"subj": "e1", "pred": "bornIn", "obj": "rome", "score": 0.6},
        # e2 bornIn: uncontested
        {"subj": "e2", "pred": "bornIn", "obj": "oslo", "score": 0.9},
        # non-functional pred must be dropped
        {"subj": "e1", "pred": "knows", "obj": "e2", "score": 0.8},
    ]
    out = resolve_conflicts(_ds(rows), ["bornIn"], nb=4).to_pandas()
    out = out.sort_values("subj").reset_index(drop=True)
    assert out.pred.unique().tolist() == ["bornIn"]
    e1 = out[out.subj == "e1"].iloc[0]
    assert e1.obj == "paris"
    assert e1.n_values == 2
    assert abs(e1.conf - 0.75) < 1e-6
    assert abs(e1.margin - 0.15) < 1e-6
    e2 = out[out.subj == "e2"].iloc[0]
    assert e2.obj == "oslo"
    assert e2.n_values == 1
    assert e2.margin == 0.0


def test_tie_breaks_lexically():
    rows = [
        {"subj": "e1", "pred": "capitalOf", "obj": "bb", "score": 0.4},
        {"subj": "e1", "pred": "capitalOf", "obj": "aa", "score": 0.4},
    ]
    out = resolve_conflicts(_ds(rows), ["capitalOf"], nb=4).to_pandas()
    assert out.iloc[0].obj == "aa"
    assert out.iloc[0].margin == 0.0
    assert out.iloc[0].n_values == 2
