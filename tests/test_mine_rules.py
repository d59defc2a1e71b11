"""AMIE-lite 2-hop rule mining (r04 seventh sitting)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import mine_rules


def _kg(dup: bool = False):
    rows = []
    for i in range(60):
        rows.append({"subj": f"p{i}", "pred": "worksFor",
                     "obj": f"org{i % 10}"})
    for j in range(10):
        rows.append({"subj": f"org{j}", "pred": "locatedIn",
                     "obj": f"city{j % 5}"})
    for i in range(0, 60, 3):
        rows.append({"subj": f"p{i}", "pred": "livesIn",
                     "obj": f"city{(i % 10) % 5}"})
    for i in range(60):
        rows.append({"subj": f"p{i}", "pred": "knows",
                     "obj": f"p{(i + 1) % 60}"})
    if dup:
        rows = rows + rows[:40]
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)


def test_composition_rule_confidence():
    out = mine_rules(_kg(), nb=8).to_pandas()
    row = out[(out.p1 == "worksFor") & (out.p2 == "locatedIn")
              & (out.p3 == "livesIn")].iloc[0]
    # every person has exactly one (worksFor, locatedIn) path; one in
    # three also has the livesIn fact, which always agrees
    assert row.body_pairs == 60
    assert row.support == 20
    assert abs(row.conf - 20 / 60) < 1e-6
    assert abs(row.head_coverage - 1.0) < 1e-6
    # knows∘knows never lands on an existing edge → zero-support rules
    # are not emitted
    assert not ((out.p1 == "knows") & (out.p2 == "knows")).any()


def test_min_support_filters():
    out = mine_rules(_kg(), min_support=21, nb=8).to_pandas()
    # the only rule in this KG has support 20 → nothing survives
    # (an all-filtered Ray result surfaces as a no-column frame)
    assert out.empty


def test_duplicate_triples_set_semantics():
    a = mine_rules(_kg(), nb=8).to_pandas().sort_values(
        ["p1", "p2", "p3"]).reset_index(drop=True)
    b = mine_rules(_kg(dup=True), nb=8).to_pandas().sort_values(
        ["p1", "p2", "p3"]).reset_index(drop=True)
    assert a.equals(b)
