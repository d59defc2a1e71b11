"""Parity check for tools/split_queries.py: imports the CURRENT
package's query registry and compares it against a pristine snapshot
module path (default: a pre-split copy of queries.py), asserting
identical key order, identical oracle SQL text, and identical
registered-function names.

Usage: python tools/verify_split.py /path/to/old_queries_snapshot.py
"""

from __future__ import annotations

import importlib.util
import sys


def main() -> None:
    snap = sys.argv[1]
    from biosd_feature_annotator_ray.pipelines.queries import (
        ORACLES as NEW_O)
    from biosd_feature_annotator_ray.pipelines.queries import (
        QUERIES as NEW_Q)

    spec = importlib.util.spec_from_file_location(
        "old_queries_snapshot", snap)
    old = importlib.util.module_from_spec(spec)
    # the snapshot expects to live in the pipelines package — give it
    # the same package context so its relative imports resolve
    old.__package__ = "biosd_feature_annotator_ray.pipelines"
    sys.modules["old_queries_snapshot"] = old
    spec.loader.exec_module(old)

    assert list(old.QUERIES) == list(NEW_Q), "QUERIES key order differs"
    assert list(old.ORACLES) == list(NEW_O), "ORACLES key order differs"
    bad_o = [k for k in old.ORACLES if old.ORACLES[k] != NEW_O[k]]
    assert not bad_o, f"oracle text differs: {bad_o[:5]}"
    bad_q = [k for k in old.QUERIES
             if old.QUERIES[k].__name__ != NEW_Q[k].__name__]
    assert not bad_q, f"function names differ: {bad_q[:5]}"
    print(f"PARITY OK: {len(NEW_Q)} queries, {len(NEW_O)} oracles")


if __name__ == "__main__":
    main()
