"""Run metrics (SURVEY.md §2 A4): the reference logs annotated/failed/
skipped counters from its stats-wrapped ZOOMA client and service loop;
here metrics are (a) per-partition rows in the checkpoint manifests and
(b) Ray's own per-stage ``ds.stats()`` — aggregated driver-side over
the tiny manifest table only, never over data."""

from __future__ import annotations

import json
import os


def run_metrics(out_dir: str) -> dict:
    """Aggregate manifest metrics for a completed (or partial) run."""
    from ..sources.sink import completed_partitions

    parts = completed_partitions(out_dir)
    triples = sum(p["row_counts"]["triples"] for p in parts.values())
    graph_rows = sum(p["row_counts"]["graph_rows"] for p in parts.values())
    versions = {p["code_version"] for p in parts.values()}
    return {
        "partitions_done": len(parts),
        "triples": triples,
        "graph_rows": graph_rows,
        "code_versions": sorted(versions),
        "first_wrote_ts": min((p["wrote_ts"] for p in parts.values()), default=None),
        "last_wrote_ts": max((p["wrote_ts"] for p in parts.values()), default=None),
    }


def write_run_report(out_dir: str, extra: dict | None = None) -> str:
    """Persist a run report next to the manifests."""
    report = run_metrics(out_dir)
    report.update(extra or {})
    path = os.path.join(out_dir, "run_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path
