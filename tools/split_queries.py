"""One-shot mechanical split of pipelines/queries.py (≈15k lines, 375
registrations) into per-chunk modules executed in order through a
shared registry — VERDICT r04 item 6. Invariants verified by
tools/verify_split.py: identical QUERIES keys → function names and
byte-identical ORACLES values, identical registration order.

Layout produced (under --out, default the live package):
  queryreg.py   — the shared QUERIES/ORACLES dicts
  _qcommon.py   — module docstring, imports, every non-q_ helper def
  queries_p01.py … queries_pNN.py — contiguous chunks of the original
  queries.py    — thin aggregator: imports parts in order, re-exports

Chunk boundaries are only placed where every later top-level block
references no q_ name defined earlier (a registration must share a
module with its def; the round-2 QUERIES/ORACLES dict literals
reference ~90 earlier defs, so chunk 1 runs through them).
"""

from __future__ import annotations

import argparse
import ast
import re
from pathlib import Path

HEADER_IMPORTS = '''from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..stages import textstats
from ..stages.canonicalize import (dedup_exact, distinct_counts,
                                   groupby_argmax)
from ..stages.util import as_task_fn

from .queryreg import ORACLES, QUERIES
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="biosd_feature_annotator_ray/"
                    "pipelines/queries.py")
    ap.add_argument("--out", default="biosd_feature_annotator_ray/"
                    "pipelines")
    ap.add_argument("--target-lines", type=int, default=2200)
    args = ap.parse_args()

    src_path = Path(args.src)
    out = Path(args.out)
    text = src_path.read_text()
    lines = text.splitlines(keepends=True)
    tree = ast.parse(text)

    blocks = []  # (start0, end0, kind, names_defined, q_names_used)
    for node in tree.body:
        s, e = node.lineno - 1, node.end_lineno  # 0-based [s, e)
        seg = "".join(lines[s:e])
        defined, kind = set(), "stmt"
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            defined = {node.name}
            kind = "qdef" if node.name.startswith("q_") else "helper"
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            kind = "import"
        elif (isinstance(node, ast.Expr)
              and isinstance(node.value, ast.Constant)
              and isinstance(node.value.value, str)):
            kind = "docstring"
        elif (isinstance(node, ast.Assign) and len(node.targets) == 1
              and isinstance(node.targets[0], ast.Name)
              and node.targets[0].id not in ("QUERIES", "ORACLES")):
            # module-level constant (e.g. a shared SQL template) —
            # rides with the helpers so every part can import it
            defined = {node.targets[0].id}
            kind = "helper"
        used = set(re.findall(r"\bq_\w+\b", seg)) - defined
        blocks.append([s, e, kind, defined, used, seg])

    # rewrite the two dict literals into .update(...) form
    for b in blocks:
        if b[2] == "stmt":
            m = re.match(r"(QUERIES|ORACLES)\s*=\s*\{", b[5])
            if m:
                b[5] = re.sub(r"^(QUERIES|ORACLES)\s*=\s*\{",
                              lambda mm: f"{mm.group(1)}.update({{",
                              b[5], count=1)
                b[5] = re.sub(r"\}\s*$", "})\n", b[5], count=1)

    doc = next(b for b in blocks if b[2] == "docstring")
    helpers = [b for b in blocks if b[2] == "helper"]
    body = [b for b in blocks
            if b[2] in ("qdef", "stmt")]

    helper_names = sorted({n for b in helpers for n in b[3]})

    qcommon = (doc[5] + "\n" + HEADER_IMPORTS + "\n\n"
               + "\n".join(b[5].rstrip("\n") + "\n" for b in helpers))
    part_header = (HEADER_IMPORTS
                   + "from ._qcommon import (  # noqa: F401\n    "
                   + ",\n    ".join(helper_names) + ")\n")

    # constraint pairs: every q_ use binds to its LATEST preceding
    # def (two queries are intentionally redefined+re-registered
    # later — lexical shadowing, preserved by the split); a boundary
    # is valid iff it separates no (def, use) pair
    def_lines = {}  # name -> sorted start lines (0-based)
    for b in body:
        for n in b[3]:
            def_lines.setdefault(n, []).append(b[0])
    pairs = []
    for b in body:
        for u in b[4]:
            cands = [d for d in def_lines.get(u, []) if d <= b[0]]
            if cands:
                pairs.append((max(cands), b[0]))

    def valid(cut_line: int) -> bool:
        return not any(d < cut_line <= u for d, u in pairs)

    parts, cur, cur_lines = [], [], 0
    for i, b in enumerate(body):
        cur.append(b)
        cur_lines += b[1] - b[0]
        if (cur_lines >= args.target_lines and i + 1 < len(body)
                and valid(body[i + 1][0])):
            parts.append(cur)
            cur, cur_lines = [], 0
    if cur:
        parts.append(cur)

    out.mkdir(parents=True, exist_ok=True)
    (out / "queryreg.py").write_text(
        '"""Shared query/oracle registry — parts register in import '
        'order (see queries.py)."""\n\n'
        "QUERIES = {}\nORACLES = {}\n")
    (out / "_qcommon.py").write_text(qcommon)
    names = []
    for i, part in enumerate(parts, 1):
        name = f"queries_p{i:02d}"
        names.append(name)
        bodytxt = "\n\n".join(b[5].rstrip("\n") for b in part) + "\n"
        (out / f"{name}.py").write_text(
            f'"""queries part {i:02d} — mechanical split of the '
            f'original queries.py (registration order preserved; '
            f'see queryreg)."""\n' + part_header + "\n\n" + bodytxt)
    agg = (doc[5] + "\n"
           + "# Mechanically split into parts (VERDICT r04 item 6) —\n"
           + "# imported IN ORDER so QUERIES/ORACLES registration\n"
           + "# order is byte-identical to the pre-split module.\n"
           + "".join(f"from . import {n}  # noqa: F401,E402\n"
                     for n in names)
           + "from ._qcommon import (  # noqa: F401,E402\n    "
           + ",\n    ".join(helper_names) + ")\n"
           + "".join(f"from .{n} import *  # noqa: F401,F403,E402\n"
                     for n in names)
           + "from .queryreg import ORACLES, QUERIES  # noqa: F401\n")
    (out / "queries.py").write_text(agg)
    print(f"wrote {len(parts)} parts; helpers={len(helper_names)}")


if __name__ == "__main__":
    main()
