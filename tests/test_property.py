"""Property-based tests (hypothesis) for kernel invariants:
the reference's fixtures are golden-value tests (SURVEY.md §5.1); these
add the randomized coverage the reference never had."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from biosd_feature_annotator_ray.functions.normalize import norm_str
from biosd_feature_annotator_ray.functions.parsers import parse_typed_values
from biosd_feature_annotator_ray.stages.mentions import detect_mentions

SETTINGS = settings(max_examples=200, deadline=None)


def _parse_one(v: str) -> dict:
    return parse_typed_values(pa.array([v], pa.string())).to_pylist()[0]


@SETTINGS
@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_any_float_repr_parses_as_number_or_year(x):
    row = _parse_one(repr(float(x)))
    if row["kind"] == "date":  # the 4-digit-year window rule wins for e.g. "1999"
        assert float(x).is_integer() and 1800 <= float(x) <= 2100
    else:
        assert row["kind"] == "number"
        assert row["num"] == float(repr(float(x)))


@SETTINGS
@given(st.text(alphabet=" \t", max_size=5), st.sampled_from(["42", "2-5", "34 weeks", "2010-07-28", "n/a"]),
       st.text(alphabet=" \t", max_size=5))
def test_parse_invariant_under_outer_whitespace(pre, core, post):
    a = _parse_one(core)
    b = _parse_one(pre + core + post)
    assert a == b


@SETTINGS
@given(st.integers(min_value=0, max_value=99999))
def test_year_window_rule(y):
    row = _parse_one(str(y))
    if 1800 <= y <= 2100 and len(str(y)) == 4:
        assert row["kind"] == "date"
        assert row["dt"].year == y
    else:
        assert row["kind"] == "number"
        assert row["num"] == float(y)


@SETTINGS
@given(st.floats(allow_nan=False, allow_infinity=False, width=16),
       st.floats(allow_nan=False, allow_infinity=False, width=16))
def test_range_always_ordered(a, b):
    row = _parse_one(f"{repr(float(a))} to {repr(float(b))}")
    if row["kind"] == "number_range":
        assert row["num_lo"] <= row["num_hi"]


@SETTINGS
@given(st.text(max_size=80))
def test_norm_idempotent(s):
    assert norm_str(norm_str(s)) == norm_str(s)


@SETTINGS
@given(st.lists(st.sampled_from(["organism: Homo sapiens", "sex:F", "no colon", "", "junk: thing"]),
                max_size=6))
def test_mention_count_additive_over_lines(lines):
    """Detection over a joined page equals the sum over its lines."""
    page = detect_mentions(pa.table({"url": ["u"], "text": ["\n".join(lines)]}))
    per_line = sum(
        len(detect_mentions(pa.table({"url": ["u"], "text": [ln]}))) for ln in lines
    )
    assert len(page) == per_line


def test_hash_stability_across_processes():
    """Stable-hash guarantee (SURVEY.md §2.8): same values → same hashes
    in a subprocess (Python hash() would fail this)."""
    import subprocess
    import sys

    from biosd_feature_annotator_ray.functions.hashing import hash_strings

    here = hash_strings(pa.array(["a", "homo sapiens", "x|y"])).tolist()
    code = (
        "import pyarrow as pa, sys; sys.path.insert(0, '/root/repo');"
        "from biosd_feature_annotator_ray.functions.hashing import hash_strings;"
        "print(hash_strings(pa.array(['a', 'homo sapiens', 'x|y'])).tolist())"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, check=True)
    assert eval(out.stdout.strip()) == here


@given(
    a=st.lists(st.integers(0, 60), max_size=120),
    b=st.lists(st.integers(30, 90), max_size=120),
)
@settings(max_examples=12, deadline=None)
def test_set_op_equals_python_sets(a, b):
    import pandas as pd

    import ray.data as rd

    from biosd_feature_annotator_ray.stages.canonicalize import set_op

    da = rd.from_pandas(pd.DataFrame({"k": pd.Series(a, dtype="int64")}))
    db = rd.from_pandas(pd.DataFrame({"k": pd.Series(b, dtype="int64")}))
    sa, sb = set(a), set(b)
    for op, want in [("union", sa | sb), ("intersect", sa & sb), ("except", sa - sb)]:
        out = set_op(da, db, "k", op=op, nb=4).to_pandas()
        got = set(out["k"].tolist()) if "k" in out.columns else set()
        assert got == want, op


@given(
    sizes=st.lists(st.integers(1, 23), min_size=1, max_size=6),
    n_tiles=st.integers(1, 5),
)
@settings(max_examples=12, deadline=None)
def test_ntile_partition_properties(sizes, n_tiles):
    """For every group: tiles are 1..min(n,k), contiguous, sizes differ
    by ≤1, larger tiles come first (SQL NTILE invariants)."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from biosd_feature_annotator_ray.stages.windows import ntile_per_key

    rows = []
    eid = 0
    for g, n in enumerate(sizes):
        for i in range(n):
            rows.append({"event_id": eid, "user_id": g,
                         "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=eid)})
            eid += 1
    df = pd.DataFrame(rows)
    out = ntile_per_key(rd.from_pandas(df), key_col="user_id",
                        order_cols=["ts", "event_id"], n_tiles=n_tiles,
                        nb=4).to_pandas()
    for g, n in enumerate(sizes):
        tiles = (out[out.user_id == g].sort_values("event_id")["tile"].to_numpy())
        counts = np.bincount(tiles, minlength=n_tiles + 1)[1:]
        used = counts[counts > 0]
        assert tiles.min() == 1 and tiles.max() == min(n, n_tiles)
        assert (np.diff(tiles) >= 0).all()          # contiguous runs in order
        assert used.max() - used.min() <= 1          # balanced
        assert (np.diff(counts[counts > 0]) <= 0).all()  # larger tiles first


@given(
    lk=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=60),
    rk=st.lists(st.one_of(st.none(), st.integers(0, 8)), min_size=1, max_size=30),
    how=st.sampled_from(["inner", "left", "semi", "anti"]),
)
@settings(max_examples=20, deadline=None)
def test_broadcast_join_sql_null_semantics(lk, rk, how):
    """broadcast_join vs a null-aware SQL reference model: null keys
    never match on either side, for every join mode."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from biosd_feature_annotator_ray.stages.join import broadcast_join

    left = pd.DataFrame({"k": pd.array(lk, dtype="Float64").astype("float64"),
                         "a": range(len(lk))})
    right_df = pd.DataFrame({"k": pd.array(rk, dtype="Float64").astype("float64"),
                             "b": range(len(rk))})
    right = pa.Table.from_pandas(right_df, preserve_index=False)
    got = broadcast_join(rd.from_pandas(left), right, on=["k"], how=how).to_pandas()
    if "a" not in got.columns:  # all-empty result loses its schema in Ray
        got = pd.DataFrame({"a": pd.Series([], dtype="int64")})

    rkeys = {k for k in right_df["k"] if pd.notna(k)}
    if how == "semi":
        want_a = sorted(a for k, a in zip(left["k"], left["a"])
                        if pd.notna(k) and k in rkeys)
        assert sorted(got["a"]) == want_a
    elif how == "anti":
        want_a = sorted(a for k, a in zip(left["k"], left["a"])
                        if pd.isna(k) or k not in rkeys)
        assert sorted(got["a"]) == want_a
    else:
        from collections import Counter

        rcount = Counter(k for k in right_df["k"] if pd.notna(k))
        exp = Counter()
        for k, a in zip(left["k"], left["a"]):
            n = rcount[k] if pd.notna(k) else 0
            if n:
                exp[a] += n
            elif how == "left":
                exp[a] += 1
        assert Counter(dict(got["a"].value_counts())) == exp


# ---- round-2 continuation kernels ----------------------------------------


def _lev_ref(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(d[j] + 1, nd[-1] + 1, d[j - 1] + (ca != cb)))
        d = nd
    return d[-1]


@SETTINGS
@given(st.text(min_size=0, max_size=12),
       st.lists(st.text(min_size=0, max_size=15), min_size=1, max_size=8))
def test_lev_batch_matches_reference_dp(q, cands):
    import pandas as pd

    from biosd_feature_annotator_ray.stages.similarity import _lev_batch

    got = _lev_batch(q, pd.Series(cands))
    want = [_lev_ref(q, c) for c in cands]
    assert list(got) == want


@SETTINGS
@given(st.lists(st.tuples(st.integers(1, 30), st.integers(0, 29)),
                min_size=0, max_size=40))
def test_ancestor_closure_matches_brute_reachability(pairs):
    from biosd_feature_annotator_ray.state.dictionaries import ancestor_closure

    # force DAG: child id > parent id
    pairs = sorted({(c, p) for c, p in pairs if c > p})
    t = pa.table({
        "child_uri": pa.array([f"n{c}" for c, _ in pairs]),
        "parent_uri": pa.array([f"n{p}" for _, p in pairs])})
    got = ancestor_closure(t).to_pandas()
    got_map = got.groupby("uri")["anc_uri"].apply(set).to_dict()

    parents = {}
    for c, p in pairs:
        parents.setdefault(f"n{c}", set()).add(f"n{p}")
    for n in parents:
        seen, stack = set(), list(parents[n])
        while stack:
            a = stack.pop()
            if a not in seen:
                seen.add(a)
                stack += list(parents.get(a, ()))
        assert got_map.get(n, set()) == seen
    assert set(got_map) == set(parents)


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 5), st.booleans()),
                min_size=0, max_size=25),
       st.lists(st.tuples(st.integers(0, 5), st.integers(6, 9)),
                min_size=0, max_size=15))
def test_expand_ancestors_table_matches_dict_model(objs, closure_pairs):
    from biosd_feature_annotator_ray.schemas import TRIPLES
    from biosd_feature_annotator_ray.stages.triples import (
        closure_csr, expand_ancestors_table)

    closure_pairs = sorted(set(closure_pairs))
    closure = pa.table({
        "uri": pa.array([f"u{c}" for c, _ in closure_pairs]),
        "anc_uri": pa.array([f"u{a}" for _, a in closure_pairs])})
    anc_of = {}
    for c, a in closure_pairs:
        anc_of.setdefault(f"u{c}", []).append(f"u{a}")

    n = len(objs)
    batch = pa.table({
        "subj": pa.array([f"s{i}" for i in range(n)], pa.string()),
        "pred": pa.array(["p"] * n, pa.string()),
        "obj": pa.array([f"u{o}" for o, _ in objs], pa.string()),
        "obj_kind": pa.array(["uri" if is_uri else "string"
                              for _, is_uri in objs], pa.string()),
        "obj_num": pa.array([None] * n, pa.float64()),
        "obj_num_hi": pa.array([None] * n, pa.float64()),
        "obj_dt": pa.array([None] * n, pa.timestamp("us")),
        "obj_dt_hi": pa.array([None] * n, pa.timestamp("us")),
        "unit_uri": pa.array([None] * n, pa.string()),
        "comparator": pa.array([None] * n, pa.string()),
        "confidence": pa.array(["HIGH"] * n, pa.string()),
        "score": pa.array([1.0] * n, pa.float32()),
    }, schema=TRIPLES)
    out = expand_ancestors_table(batch, closure_csr(closure))
    got = sorted(zip(out.column("subj").to_pylist(),
                     out.column("obj").to_pylist()))
    want = []
    for i, (o, is_uri) in enumerate(objs):
        want.append((f"s{i}", f"u{o}"))
        if is_uri:
            want += [(f"s{i}", a) for a in sorted(anc_of.get(f"u{o}", []))]
    assert got == sorted(want)
