"""Tenth-sitting operators: Jones-Plassmann greedy coloring, seeded
label spreading, VoID KG statistics, a-priori frequent itemsets,
DSIR importance selection."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


# ------------------------------------------------------------- coloring


def _greedy_reference(a, b, seed=0):
    adj: dict[int, set[int]] = {}
    for x, y in zip(a, b):
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    pri = {v: (int(hashlib.md5(f"{v}:{seed}".encode())
                   .hexdigest()[:15], 16), v) for v in adj}
    color: dict[int, int] = {}
    for v in sorted(adj, key=lambda v: pri[v]):
        used = {color[u] for u in adj[v] if u in color}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return color


def test_coloring_equals_sequential_greedy():
    from biosd_feature_annotator_ray.stages.graph import greedy_coloring

    for seedv in (7, 11):
        rng = np.random.default_rng(seedv)
        a = rng.integers(0, 40, 130).tolist()
        b = rng.integers(0, 40, 130).tolist()
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
        out = greedy_coloring(rd.from_arrow(t).repartition(3),
                              nb=4).to_pandas()
        got = dict(zip(out["node"], out["color"]))
        assert got == _greedy_reference(a, b)
        # proper coloring
        for x, y in zip(a, b):
            if x != y:
                assert got[x] != got[y]


def test_coloring_star_and_chain():
    from biosd_feature_annotator_ray.stages.graph import greedy_coloring

    # star: center conflicts with every leaf -> 2 colors total
    star = pa.table({"a": pa.array([0] * 6, pa.int64()),
                     "b": pa.array(range(1, 7), pa.int64())})
    out = greedy_coloring(star, nb=2).to_pandas()
    got = dict(zip(out["node"], out["color"]))
    assert len({got[leaf] for leaf in range(1, 7)}) == 1
    assert got[0] != got[1]
    assert out["color"].max() == 1
    # chain needs exactly 2 colors, alternating
    chain = pa.table({"a": pa.array(range(9), pa.int64()),
                      "b": pa.array(range(1, 10), pa.int64())})
    out = greedy_coloring(chain, nb=2).to_pandas()
    got = dict(zip(out["node"], out["color"]))
    assert out["color"].max() <= 2  # greedy bound: color(v) <= deg(v)
    for i in range(9):
        assert got[i] != got[i + 1]


def test_coloring_self_loops_and_empty():
    from biosd_feature_annotator_ray.stages.graph import greedy_coloring

    t = pa.table({"a": pa.array([5, 1], pa.int64()),
                  "b": pa.array([5, 2], pa.int64())})
    out = greedy_coloring(t, nb=2).to_pandas()
    assert set(out["node"]) == {1, 2}  # pure-self-loop node drops
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    ds = greedy_coloring(empty, nb=2)
    assert ds.count() == 0
    assert ds.schema().names == ["node", "color", "color_round"]


# ------------------------------------------------------- label spreading


def _spread_reference(a, b, seeds):
    adj: dict[int, set[int]] = {}
    for x, y in zip(a, b):
        if x == y:
            continue
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    lab = dict(seeds)
    rnd = {n: 0 for n in lab}
    r = 0
    while True:
        r += 1
        new = {}
        for v in adj:
            if v in lab:
                continue
            votes: dict[int, int] = {}
            for u in adj[v]:
                if u in lab:
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
            if votes:
                new[v] = min(votes, key=lambda l: (-votes[l], l))
        if not new:
            break
        for v, l in new.items():
            lab[v] = l
            rnd[v] = r
    return lab, rnd


def test_label_spreading_reference_parity():
    from biosd_feature_annotator_ray.stages.graph import label_spreading

    rng = np.random.default_rng(5)
    a = rng.integers(0, 50, 100).tolist()
    b = rng.integers(0, 50, 100).tolist()
    seeds = [(n, n % 3) for n in range(0, 50, 7)]
    t = pa.table({"a": pa.array(a, pa.int64()),
                  "b": pa.array(b, pa.int64())})
    st = pa.table({"node": pa.array([s[0] for s in seeds], pa.int64()),
                   "label": pa.array([s[1] for s in seeds], pa.int64())})
    out = label_spreading(rd.from_arrow(t).repartition(3), st,
                          nb=4).to_pandas()
    lab, rnd = _spread_reference(a, b, seeds)
    assert dict(zip(out["node"], out["label"])) == lab
    assert dict(zip(out["node"], out["spread_round"])) == rnd


def test_label_spreading_seeds_clamped_and_unreachable():
    from biosd_feature_annotator_ray.stages.graph import label_spreading

    # seed 0 (label 9) surrounded by three seeds labeled 1 keeps 9;
    # node 99 is in a component with no seed -> absent from output
    t = pa.table({"a": pa.array([0, 0, 0, 99], pa.int64()),
                  "b": pa.array([1, 2, 3, 98], pa.int64())})
    st = pa.table({"node": pa.array([0, 1, 2, 3], pa.int64()),
                   "label": pa.array([9, 1, 1, 1], pa.int64())})
    out = label_spreading(t, st, nb=2).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got == {0: 9, 1: 1, 2: 1, 3: 1}
    assert (out["spread_round"] == 0).all()


def test_label_spreading_majority_and_tiebreak():
    from biosd_feature_annotator_ray.stages.graph import label_spreading

    # node 10: two neighbors labeled 2, one labeled 1 -> majority 2;
    # node 20: one neighbor each of 3 and 4 -> tie, smallest label 3
    t = pa.table({"a": pa.array([10, 10, 10, 20, 20], pa.int64()),
                  "b": pa.array([1, 2, 3, 4, 5], pa.int64())})
    st = pa.table({"node": pa.array([1, 2, 3, 4, 5], pa.int64()),
                   "label": pa.array([2, 2, 1, 3, 4], pa.int64())})
    out = label_spreading(t, st, nb=2).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got[10] == 2 and got[20] == 3
    rr = dict(zip(out["node"], out["spread_round"]))
    assert rr[10] == 1 and rr[20] == 1


# ------------------------------------------------------------ void stats


def test_void_stats_known_kg():
    from biosd_feature_annotator_ray.stages.graph import void_stats

    t = pa.table({
        "subj": pa.array(["a", "a", "b", "c", "a", "b", "c", "d"]),
        "pred": pa.array(["knows", "knows", "knows", "likes",
                          "rdf:type", "rdf:type", "rdf:type",
                          "rdf:type"]),
        "obj": pa.array(["b", "c", "c", "b", "Person", "Person",
                         "Org", "Org"])})
    out = void_stats(rd.from_arrow(t).repartition(3), nb=4).to_pandas()
    rows = {(r["part"], r["key"]): r for _, r in out.iterrows()}
    ds = rows[("dataset", "(all)")]
    assert (ds["n_triples"], ds["n_subjects"], ds["n_objects"]) \
        == (8, 4, 4)
    kn = rows[("predicate", "knows")]
    assert (kn["n_triples"], kn["n_subjects"], kn["n_objects"]) \
        == (3, 2, 2)
    lk = rows[("predicate", "likes")]
    assert (lk["n_triples"], lk["n_subjects"], lk["n_objects"]) \
        == (1, 1, 1)
    per = rows[("class", "Person")]
    assert (per["n_triples"], per["n_subjects"]) == (2, 2)
    assert per["n_objects"] is None or np.isnan(per["n_objects"])
    org = rows[("class", "Org")]
    assert (org["n_triples"], org["n_subjects"]) == (2, 2)


def test_void_stats_no_type_triples():
    from biosd_feature_annotator_ray.stages.graph import void_stats

    t = pa.table({"subj": pa.array(["x"]), "pred": pa.array(["p"]),
                  "obj": pa.array(["y"])})
    out = void_stats(t, nb=2).to_pandas()
    assert set(out["part"]) == {"dataset", "predicate"}
    assert len(out) == 2


# ------------------------------------------------------ frequent itemsets


def test_frequent_itemsets_bruteforce_parity():
    from collections import Counter
    from itertools import combinations

    from biosd_feature_annotator_ray.stages.sketches import (
        frequent_itemsets)

    rng = np.random.default_rng(3)
    rows_b, rows_i = [], []
    for bk in range(40):
        items = rng.choice(list("abcdefgh"),
                           size=rng.integers(1, 6), replace=False)
        for it in items:
            rows_b.append(bk)
            rows_i.append(str(it))
            if rng.random() < 0.3:  # dup rows must not double-count
                rows_b.append(bk)
                rows_i.append(str(it))
    t = pa.table({"user": pa.array(rows_b, pa.int64()),
                  "tag": pa.array(rows_i)})
    out = frequent_itemsets(rd.from_arrow(t).repartition(3), "user",
                            "tag", min_support=6, nb=4).to_pandas()
    baskets: dict[int, set[str]] = {}
    for bk, it in zip(rows_b, rows_i):
        baskets.setdefault(bk, set()).add(it)
    want = set()
    for size in (1, 2, 3):
        cnt: Counter = Counter()
        for items in baskets.values():
            for combo in combinations(sorted(items), size):
                cnt[combo] += 1
        for combo, n in cnt.items():
            if n >= 6:
                padded = combo + (None,) * (3 - size)
                want.add(padded + (size, n))
    got = set((r.i1, r.i2, r.i3, r.size, r.n_baskets)
              for r in out.itertuples())
    assert got == want


def test_frequent_itemsets_sizes_and_guards():
    from biosd_feature_annotator_ray.stages.sketches import (
        frequent_itemsets)

    t = pa.table({"b": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
                  "i": pa.array(["x", "y", "z", "x", "y", "z"])})
    out1 = frequent_itemsets(rd.from_arrow(t), "b", "i",
                             min_support=2, max_size=1,
                             nb=2).to_pandas()
    assert set(out1["size"]) == {1} and len(out1) == 3
    out3 = frequent_itemsets(rd.from_arrow(t), "b", "i",
                             min_support=2, max_size=3,
                             nb=2).to_pandas()
    assert sorted(out3["size"].value_counts().to_dict().items()) \
        == [(1, 3), (2, 3), (3, 1)]
    trip = out3[out3["size"] == 3].iloc[0]
    assert (trip["i1"], trip["i2"], trip["i3"]) == ("x", "y", "z")
    with pytest.raises(Exception, match="broadcast bound"):
        frequent_itemsets(rd.from_arrow(t), "b", "i", min_support=1,
                          max_frequent_items=2, nb=2).to_pandas()
    with pytest.raises(ValueError):
        frequent_itemsets(rd.from_arrow(t), "b", "i", min_support=0)


def test_frequent_itemsets_null_rows_dropped():
    from biosd_feature_annotator_ray.stages.sketches import (
        frequent_itemsets)

    t = pa.table({"b": pa.array([1, None, 1], pa.int64()),
                  "i": pa.array(["x", "y", None])})
    out = frequent_itemsets(rd.from_arrow(t), "b", "i",
                            min_support=1, nb=2).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["i1"], out.iloc[0]["size"],
            out.iloc[0]["n_baskets"]) == ("x", 1, 1)


# ----------------------------------------------------------------- DSIR


def test_dsir_select_reference_parity():
    import math
    from collections import Counter

    from biosd_feature_annotator_ray.stages.textstats import dsir_select

    rng = np.random.default_rng(17)
    tgt_words = ["alpha", "beta", "gamma"]
    raw_words = ["delta", "epsilon", "zeta", "eta"]
    texts, srcs = [], []
    for i in range(60):
        is_t = i % 5 == 0
        pool = tgt_words if is_t else raw_words
        mix = list(rng.choice(pool, size=8)) + list(
            rng.choice(tgt_words + raw_words, size=4))
        texts.append(" ".join(mix))
        srcs.append("tgt" if is_t else "raw")
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(texts), "source": pa.array(srcs)})
    docs = rd.from_arrow(t).repartition(4)
    out = dsir_select(docs, docs.filter(expr="source == 'tgt'"),
                      top_n=10, vocab_size=5, nb=4).to_pandas()
    # python reference
    tgt_tokens = [w for txt, s in zip(texts, srcs) if s == "tgt"
                  for w in txt.lower().split()]
    cnt = Counter(tgt_tokens)
    vocab = sorted(cnt, key=lambda w: (-cnt[w], w))[:5]
    v = len(vocab)
    nt = sum(cnt[w] for w in vocab)
    raw_cnt = Counter(w for txt in texts for w in txt.lower().split()
                      if w in vocab)
    nr = sum(raw_cnt.values())
    llr = {w: math.log((cnt[w] + 1) / (nt + v))
           - math.log((raw_cnt[w] + 1) / (nr + v)) for w in vocab}
    scores = []
    for i, txt in enumerate(texts):
        ws = [w for w in txt.lower().split() if w in llr]
        scores.append((i, sum(llr[w] for w in ws), len(ws)))
    want = sorted(scores, key=lambda r: (-r[1], r[0]))[:10]
    got = sorted(zip(out["doc_id"], out["score"],
                     out["n_vocab_tokens"]),
                 key=lambda r: (-r[1], r[0]))
    assert [(g[0], g[2]) for g in got] == [(w[0], w[2]) for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-9)
    # only target-ish docs should win
    assert all(srcs[d] == "tgt" for d in out["doc_id"][:5])


def test_dsir_select_guards_and_zero_vocab_doc():
    from biosd_feature_annotator_ray.stages.textstats import dsir_select

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["aa bb", ""])})
    ds = rd.from_arrow(t)
    out = dsir_select(ds, ds, top_n=5, vocab_size=8, nb=2).to_pandas()
    assert len(out) == 2
    row2 = out[out["doc_id"] == 2].iloc[0]
    assert row2["score"] == 0.0 and row2["n_vocab_tokens"] == 0
    with pytest.raises(ValueError):
        dsir_select(ds, ds, top_n=0)
    empty_target = ds.filter(expr="doc_id > 99")
    with pytest.raises(Exception, match="empty vocabulary"):
        dsir_select(ds, empty_target).to_pandas()


# ---------------------------------------------------------- condensation


def test_condensation_collapses_cycles_to_dag():
    from biosd_feature_annotator_ray.stages.graph import condensation

    # cycle {1,2,3} -> cycle {10,11} -> node 20; parallel original
    # edges 3->10 and 1->11 collapse onto ONE condensed edge (n=2)
    t = pa.Table.from_pylist([
        {"src": 1, "dst": 2}, {"src": 2, "dst": 3},
        {"src": 3, "dst": 1}, {"src": 10, "dst": 11},
        {"src": 11, "dst": 10}, {"src": 3, "dst": 10},
        {"src": 1, "dst": 11}, {"src": 11, "dst": 20}])
    out = condensation(rd.from_arrow(t).repartition(2),
                       nb=4).to_pandas()
    got = {(r.src_scc, r.dst_scc): r.n_edges for r in out.itertuples()}
    assert got == {(1, 10): 2, (10, 20): 1}


def test_condensation_pure_dag_identity():
    from biosd_feature_annotator_ray.stages.graph import condensation

    t = pa.Table.from_pylist([
        {"src": 1, "dst": 2}, {"src": 2, "dst": 3},
        {"src": 1, "dst": 3}])
    out = condensation(t, nb=2).to_pandas()
    got = {(r.src_scc, r.dst_scc): r.n_edges for r in out.itertuples()}
    assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1}


# -------------------------------------------------------- vocab richness


def test_vocab_richness_closed_form():
    from biosd_feature_annotator_ray.stages.textstats import (
        vocab_richness)

    t = pa.table({
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array(["x x y z", "z w", "q q q"])})
    out = vocab_richness(rd.from_arrow(t).repartition(2), "source",
                         "text", nb=4).to_pandas()
    a = out[out["source"] == "a"].iloc[0]
    # counts: x2 y1 z2 w1 -> N=6 D=4 F1=2 F2=2
    assert (a["n_tokens"], a["n_distinct"], a["f1"], a["f2"]) \
        == (6, 4, 2, 2)
    assert a["chao1"] == pytest.approx(4 + 2 * 1 / (2 * 3))
    assert a["gt_unseen"] == pytest.approx(2 / 6)
    b = out[out["source"] == "b"].iloc[0]
    # q3 -> F1=F2=0, chao1 = D
    assert (b["n_tokens"], b["n_distinct"], b["f1"], b["f2"]) \
        == (3, 1, 0, 0)
    assert b["chao1"] == pytest.approx(1.0)
    assert b["gt_unseen"] == pytest.approx(0.0)


def test_scc_pure_dag_regression():
    # regression: a graph whose trim consumes every live edge while
    # live nodes remain used to crash on an empty-census join
    from biosd_feature_annotator_ray.stages.graph import scc

    t = pa.Table.from_pylist([
        {"src": 1, "dst": 2}, {"src": 2, "dst": 3},
        {"src": 1, "dst": 3}])
    out = scc(rd.from_arrow(t), nb=4).to_pandas()
    assert dict(zip(out["node"], out["scc"])) == {1: 1, 2: 2, 3: 3}


# --------------------------------------------------------- burst islands


def test_burst_islands_pandas_reference():
    import pandas as pd

    from biosd_feature_annotator_ray.stages.windows import burst_islands

    rng = np.random.default_rng(23)
    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    rows_k, rows_t = [], []
    for uid in range(6):
        # background: one event per hour over 48h
        for h in range(48):
            rows_k.append(uid)
            rows_t.append(t0 + np.timedelta64(h, "h")
                          + np.timedelta64(int(rng.integers(0, 3600)),
                                           "s"))
        # burst: 10 events inside hours 20-21 for even uids
        if uid % 2 == 0:
            for _ in range(10):
                rows_k.append(uid)
                rows_t.append(t0 + np.timedelta64(20, "h")
                              + np.timedelta64(
                                  int(rng.integers(0, 7200)), "s"))
    t = pa.table({"user_id": pa.array(rows_k, pa.int64()),
                  "ts": pa.array(rows_t, pa.timestamp("us"))})
    out = (burst_islands(rd.from_arrow(t).repartition(4),
                         every=pd.Timedelta(hours=1), mult=2.0,
                         min_count=2, nb=4).to_pandas()
           .sort_values(["user_id", "start_ts"]).reset_index(drop=True))
    # reference
    df = t.to_pandas()
    df["b"] = (df["ts"].astype("datetime64[us]").astype("int64")
               // 3600000000)
    want = []
    for uid, g in df.groupby("user_id"):
        cnt = g.groupby("b").size().sort_index()
        span = float(cnt.index.max() - cnt.index.min() + 1)
        thr = max(2.0, (2.0 * float(cnt.sum())) / span)
        burst = [b for b, n in cnt.items() if n >= thr]
        i = 0
        while i < len(burst):
            j = i
            while j + 1 < len(burst) and burst[j + 1] == burst[j] + 1:
                j += 1
            want.append((uid, burst[i], burst[j],
                         j - i + 1,
                         int(cnt.loc[burst[i]:burst[j]].sum())))
            i = j + 1
    got = [(r.user_id,
            r.start_ts.to_datetime64().astype("datetime64[us]")
            .astype("int64") // 3600000000,
            r.end_ts.to_datetime64().astype("datetime64[us]")
            .astype("int64") // 3600000000,
            r.n_buckets, r.n_events) for r in out.itertuples()]
    assert got == sorted(want)
    assert set(r[0] for r in got) == {0, 2, 4}


def test_burst_islands_merges_consecutive_buckets():
    import pandas as pd

    from biosd_feature_annotator_ray.stages.windows import burst_islands

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    # hours 0..9 quiet (1 event each), hours 3 and 4 loud (5 each):
    # one island spanning two consecutive buckets
    ts = [t0 + np.timedelta64(h, "h") for h in range(10)]
    ts += [t0 + np.timedelta64(3, "h")] * 4
    ts += [t0 + np.timedelta64(4, "h")] * 4
    t = pa.table({"user_id": pa.array([7] * len(ts), pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    out = burst_islands(rd.from_arrow(t),
                        every=pd.Timedelta(hours=1), mult=2.0,
                        min_count=2, nb=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_buckets"], r["n_events"]) == (2, 10)


# ------------------------------------------------------------ grouped HLL


def test_grouped_hll_error_and_merge_lattice():
    from biosd_feature_annotator_ray.stages.sketches import (
        grouped_hll, merge_hll)

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 4, 20000)
    vals = [f"v{rng.integers(0, 3000 * (k + 1))}" for k in keys]
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals)})
    out = grouped_hll(rd.from_arrow(t).repartition(5), "k", "v",
                      p=12, nb=4).to_pandas()
    import pandas as pd
    exact = pd.DataFrame({"k": keys, "v": vals}).groupby("k")[
        "v"].nunique()
    assert len(out) == 4
    for _, r in out.iterrows():
        assert abs(r["n_distinct_est"] - exact[r["k"]]) \
            / exact[r["k"]] < 0.05
    # merging the two halves' sketch tables == one build over the
    # whole input, byte-identical (HLL register-lattice property)
    h1, h2 = t.slice(0, 10000), t.slice(10000)
    a = grouped_hll(rd.from_arrow(h1), "k", "v", p=12, nb=4)
    b = grouped_hll(rd.from_arrow(h2), "k", "v", p=12, nb=4)
    merged = (merge_hll(a.union(b), "k", nb=4).to_pandas()
              .sort_values("k"))
    whole = out.sort_values("k")
    assert list(merged["sketch"]) == list(whole["sketch"])
    assert list(merged["n_distinct_est"]) \
        == list(whole["n_distinct_est"])


def test_grouped_hll_null_values_and_exact_small():
    from biosd_feature_annotator_ray.stages.sketches import grouped_hll

    t = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                  "v": pa.array(["a", "a", None, "b"])})
    out = grouped_hll(rd.from_arrow(t), "k", "v", p=10,
                      nb=2).to_pandas().sort_values("k")
    # small-range correction is exact at tiny cardinalities
    assert list(out["n_distinct_est"]) == [1, 1]


# ---------------------------------------------------------- mixture etc.


def test_mixture_sample_quotas_and_determinism():
    import hashlib

    from biosd_feature_annotator_ray.stages.canonicalize import (
        mixture_sample)

    t = pa.table({
        "id": pa.array(range(200), pa.int64()),
        "g": pa.array(["a", "b", "c", "d"] * 50)})
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    out = mixture_sample(rd.from_arrow(t).repartition(3), "g", w,
                         total_n=40, id_col="id", nb=4).to_pandas()
    got = out.groupby("g").size().to_dict()
    assert got == {"a": 20, "b": 12, "c": 8}  # 'd' excluded
    # exact md5-smallest membership per group
    for g, q in [("a", 20), ("b", 12), ("c", 8)]:
        ids = [i for i in range(200) if ["a", "b", "c", "d"][i % 4] == g]
        want = sorted(ids, key=lambda i: (
            hashlib.md5(f"{i}:0".encode()).hexdigest(), i))[:q]
        assert sorted(out[out["g"] == g]["id"]) == sorted(want)


def test_mixture_sample_shortfall_keeps_all():
    from biosd_feature_annotator_ray.stages.canonicalize import (
        mixture_sample)

    t = pa.table({"id": pa.array(range(6), pa.int64()),
                  "g": pa.array(["a"] * 2 + ["b"] * 4)})
    out = mixture_sample(t if hasattr(t, "map_batches") else
                         rd.from_arrow(t), "g",
                         {"a": 0.5, "b": 0.5}, total_n=8,
                         id_col="id", nb=2).to_pandas()
    got = out.groupby("g").size().to_dict()
    assert got == {"a": 2, "b": 4}  # a short of quota 4 keeps its 2


def test_rendezvous_assign_stability_under_node_change():
    import hashlib

    from biosd_feature_annotator_ray.functions.hashing import (
        rendezvous_assign)

    t = pa.table({"k": pa.array([f"key{i}" for i in range(300)]
                                + [None])})
    n3 = ["n1", "n2", "n3"]
    a3 = rendezvous_assign(t, "k", n3)["node"].to_pylist()
    assert a3[-1] is None
    # reference argmax
    for k, nd in zip(t.column("k").to_pylist(), a3):
        if k is None:
            continue
        want = max(sorted(n3), key=lambda n: hashlib.md5(
            f"{k}:{n}:0".encode()).hexdigest())
        assert nd == want
    # removing a node only moves THAT node's keys (HRW property)
    a2 = rendezvous_assign(t, "k", ["n1", "n2"])["node"].to_pylist()
    for x3, x2 in zip(a3[:-1], a2[:-1]):
        if x3 != "n3":
            assert x2 == x3
    with pytest.raises(ValueError):
        rendezvous_assign(t, "k", [])
    with pytest.raises(ValueError):
        rendezvous_assign(t, "k", ["n1", "n1"])


def test_join_skew_report_counts():
    from biosd_feature_annotator_ray.stages.join import join_skew_report

    left = pa.table({"k": pa.array([1] * 5 + [2] * 3 + [3],
                                   pa.int64())})
    right = pa.table({"j": pa.array([1] * 4 + [3] * 2 + [9],
                                    pa.int64())})
    out = join_skew_report(rd.from_arrow(left).repartition(2),
                           rd.from_arrow(right), "k", "j", k=10,
                           nb=4).to_pandas()
    got = {r.key: (r.l_count, r.r_count, r.pairs)
           for r in out.itertuples()}
    assert got == {1: (5, 4, 20), 3: (1, 2, 2), 2: (3, 0, 0),
                   9: (0, 1, 0)}
    assert list(out["key"])[:2] == [1, 3]  # pairs-desc order
    top1 = join_skew_report(rd.from_arrow(left),
                            rd.from_arrow(right), "k", "j", k=1,
                            nb=4).to_pandas()
    assert list(top1["key"]) == [1]


def test_decayed_sum_reference():
    import pandas as pd

    from biosd_feature_annotator_ray.stages.windows import (
        decayed_sum_per_key)

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([t0, t0 + np.timedelta64(12, "h"),
                        t0 + np.timedelta64(10, "D"),  # after `at`
                        t0, None], pa.timestamp("us")),
        "value": pa.array([4.0, 8.0, 100.0, 2.0, 9.0], pa.float64())})
    out = decayed_sum_per_key(
        rd.from_arrow(t), half_life=pd.Timedelta(days=1),
        at="2024-01-02", nb=2).to_pandas().sort_values("user_id")
    # user 1: 4*0.5^1 + 8*0.5^0.5 (12 h before `at`); the 10-days-
    # later row is excluded
    want1 = 4 * 0.5 + 8 * 0.5 ** 0.5
    assert out.iloc[0]["decayed_sum"] == pytest.approx(want1)
    assert out.iloc[0]["n_rows"] == 2
    # user 2: null-ts row drops; its one row is a full day old
    assert out.iloc[1]["decayed_sum"] == pytest.approx(2 * 0.5)
    assert out.iloc[1]["n_rows"] == 1


# ------------------------------------------------------------ term drift


def test_term_drift_closed_form():
    import math

    from biosd_feature_annotator_ray.stages.textstats import term_drift

    a = pa.table({"text": pa.array(["cat cat cat dog", "cat bird"])})
    b = pa.table({"text": pa.array(["dog dog dog bird", "dog fish"])})
    out = term_drift(rd.from_arrow(a), rd.from_arrow(b), top_k=10,
                     min_count=1, nb=2).to_pandas()
    na, nbt = 6, 6
    rows = {r.term: r for r in out.itertuples()}
    for term, ac, bc in [("cat", 4, 0), ("dog", 1, 4), ("bird", 1, 1),
                         ("fish", 0, 1)]:
        delta = (math.log((ac + 1) / (na - ac + 1))
                 - math.log((bc + 1) / (nbt - bc + 1)))
        z = delta / math.sqrt(1 / (ac + 1) + 1 / (bc + 1))
        r = rows[term]
        assert (r.a_count, r.b_count) == (ac, bc)
        assert r.delta == pytest.approx(delta)
        assert r.z == pytest.approx(z)
    # |z| ordering: cat (most skewed) first
    assert out.iloc[0]["term"] == "cat"


def test_term_drift_min_count_and_topk():
    from biosd_feature_annotator_ray.stages.textstats import term_drift

    a = pa.table({"text": pa.array(["x x x rare"])})
    b = pa.table({"text": pa.array(["y y y"])})
    out = term_drift(rd.from_arrow(a), rd.from_arrow(b), top_k=1,
                     min_count=3, nb=2).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["term"] in ("x", "y")  # 'rare' dropped


# ------------------------------------------------------------ attribution


def test_attribution_last_touch():
    import pandas as pd

    from biosd_feature_annotator_ray.stages.windows import attribution

    t0 = np.datetime64("2024-01-01T00:00:00", "us")

    def ev(i, u, dt_min, typ):
        return {"event_id": i, "user_id": u,
                "ts": t0 + np.timedelta64(dt_min, "m"),
                "event_type": typ}

    rows = [
        ev(1, 1, 0, "view"), ev(2, 1, 5, "signup"),
        ev(3, 1, 10, "purchase"),          # last touch: signup @5
        ev(4, 2, 0, "purchase"),           # organic (no touch)
        ev(5, 3, 7, "view"),
        ev(6, 3, 7, "purchase"),           # same-ts touch NOT counted
        ev(7, 3, 9, "purchase"),           # view @7 counts here
    ]
    t = pa.Table.from_pylist(rows).cast(pa.schema([
        pa.field("event_id", pa.int64()),
        pa.field("user_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("event_type", pa.string())]))
    out = (attribution(rd.from_arrow(t).repartition(2), "purchase",
                       ["view", "signup"], nb=4).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert list(out["event_id"]) == [3, 4, 6, 7]
    assert out.iloc[0]["channel"] == "signup"
    assert pd.isna(out.iloc[1]["channel"])
    assert pd.isna(out.iloc[2]["channel"])  # strict <
    assert out.iloc[3]["channel"] == "view"


# ------------------------------------------------------------ net kernels


def test_ipv4_and_cidr_parsing():
    from biosd_feature_annotator_ray.functions.net import (
        cidr_to_range, ipv4_to_uint32)

    ips = pa.array(["10.0.0.1", "255.255.255.255", "1.2.3.999",
                    "bad", None, "0.0.0.0"])
    assert ipv4_to_uint32(ips).to_pylist() == [
        167772161, 4294967295, None, None, None, 0]
    c = cidr_to_range(pa.array(["10.0.0.7/8", "192.168.1.0/24",
                                "1.2.3.4/33", "x/8"]))
    assert c.column("lo").to_pylist() == [
        167772160, 3232235776, None, None]
    assert c.column("hi").to_pylist() == [
        184549375, 3232236031, None, None]


def test_ip_in_cidr_join_modes_and_priority():
    from biosd_feature_annotator_ray.functions.net import ip_in_cidr_join

    t = pa.table({"ip": pa.array([
        "10.1.2.3", "11.0.0.1", "192.168.1.7", "bad", "8.8.8.8"])})
    cidrs = ["10.0.0.0/8", "0.0.0.0/4"]  # overlapping: first wins
    inner = ip_in_cidr_join(rd.from_arrow(t), cidrs,
                            how="inner").to_pandas()
    got = dict(zip(inner["ip"], inner["cidr"]))
    assert got == {"10.1.2.3": "10.0.0.0/8", "11.0.0.1": "0.0.0.0/4",
                   "8.8.8.8": "0.0.0.0/4"}
    left = ip_in_cidr_join(rd.from_arrow(t), cidrs,
                           how="left").to_pandas()
    assert len(left) == 5
    anti = ip_in_cidr_join(rd.from_arrow(t), cidrs,
                           how="anti").to_pandas()
    assert sorted(anti["ip"]) == ["192.168.1.7", "bad"]
    with pytest.raises(ValueError, match="malformed"):
        ip_in_cidr_join(rd.from_arrow(t), ["nope/8"]).to_pandas()


# -------------------------------------------------------------- RRF fuse


def test_rrf_fuse_closed_form():
    from biosd_feature_annotator_ray.stages.similarity import rrf_fuse

    r1 = pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()),
                   "rank": pa.array([1, 2, 3], pa.int64())})
    r2 = pa.table({"doc_id": pa.array([20, 40], pa.int64()),
                   "rank": pa.array([1, 2], pa.int64())})
    out = rrf_fuse([r1, r2], k=60, top_n=10, nb=2).to_pandas()
    got = {r.doc_id: (round(r.rrf_score, 9), r.n_lists)
           for r in out.itertuples()}
    assert got == {
        10: (round(1 / 61, 9), 1),
        20: (round(1 / 62 + 1 / 61, 9), 2),
        30: (round(1 / 63, 9), 1),
        40: (round(1 / 62, 9), 1)}
    # doc 20 fused first (appears in both lists)
    assert out.iloc[0]["doc_id"] == 20
    top2 = rrf_fuse([r1, r2], k=60, top_n=2, nb=2).to_pandas()
    assert sorted(top2["doc_id"]) == [10, 20]
    with pytest.raises(ValueError):
        rrf_fuse([], top_n=5)


# ------------------------------------------------- weighted per-key A-ES


def test_weighted_sample_per_key_reference():
    import hashlib
    import math

    from biosd_feature_annotator_ray.stages.sketches import (
        weighted_sample_per_key)

    rng = np.random.default_rng(41)
    n = 120
    t = pa.table({
        "g": pa.array(rng.integers(0, 3, n), pa.int64()),
        "id": pa.array(range(n), pa.int64()),
        "w": pa.array(np.round(rng.uniform(0.1, 9, n), 3),
                      pa.float64())})
    out = weighted_sample_per_key(rd.from_arrow(t).repartition(3),
                                  "g", "id", "w", k=10,
                                  nb=4).to_pandas()

    def aes(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        return -math.log((h + 0.5) / 4294967296.0) / w

    want: dict[int, list] = {}
    for g, i, w in zip(t["g"].to_pylist(), t["id"].to_pylist(),
                       t["w"].to_pylist()):
        want.setdefault(g, []).append((aes(i, w), i))
    for g, rows in want.items():
        ids = [i for _, i in sorted(rows)[:10]]
        got = sorted(out[out["g"] == g]["id"])
        assert got == sorted(ids), g


def test_weighted_sample_per_key_guards():
    from biosd_feature_annotator_ray.stages.sketches import (
        weighted_sample_per_key)

    t = pa.table({"g": pa.array([1, 1, 1, None], pa.int64()),
                  "id": pa.array([1, 2, 3, 4], pa.int64()),
                  "w": pa.array([1.0, 0.0, None, 5.0], pa.float64())})
    out = weighted_sample_per_key(rd.from_arrow(t), "g", "id", "w",
                                  k=5, nb=2).to_pandas()
    # zero/null weight rows and null keys drop; small group keeps all
    assert sorted(out["id"]) == [1]
    with pytest.raises(ValueError):
        weighted_sample_per_key(rd.from_arrow(t), "g", "id", "w", k=0)


# --------------------------------------------------------------- z-order


def test_zorder_interleave_and_guards():
    from biosd_feature_annotator_ray.functions.hashing import zorder_key

    t = pa.table({"x": pa.array([0, 1, 2, 3, None], pa.int64()),
                  "y": pa.array([0, 1, 0, 3, 1], pa.int64())})
    out = zorder_key(t, ["x", "y"], bits=2)
    assert out["zkey"].to_pylist() == [0, 3, 4, 15, None]
    # locality: sorting by zkey groups quadrants — the (0,0) corner
    # sorts before any point with both coords >= 2
    t2 = pa.table({"x": pa.array([0, 2, 0, 3], pa.int64()),
                   "y": pa.array([0, 2, 1, 3], pa.int64())})
    z = zorder_key(t2, ["x", "y"], bits=2)["zkey"].to_pylist()
    assert z[0] < z[1] and z[2] < z[1] and z[1] < z[3]
    # clamp: values beyond 2^bits clamp to the top code
    big = pa.table({"x": pa.array([5], pa.int64()),
                    "y": pa.array([0], pa.int64())})
    assert zorder_key(big, ["x", "y"], bits=2)["zkey"].to_pylist() \
        == [zorder_key(pa.table({
            "x": pa.array([3], pa.int64()),
            "y": pa.array([0], pa.int64())}), ["x", "y"],
            bits=2)["zkey"].to_pylist()[0]]
    with pytest.raises(ValueError):
        zorder_key(t, ["x"], bits=2)
    with pytest.raises(ValueError):
        zorder_key(t, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="negative"):
        zorder_key(pa.table({"x": pa.array([-1], pa.int64()),
                             "y": pa.array([0], pa.int64())}),
                   ["x", "y"], bits=2)


# ----------------------------------------------------- review regressions


def test_label_spreading_converges_exactly_at_max_rounds():
    # review fix: finishing on the LAST allowed round is convergence,
    # not an error
    from biosd_feature_annotator_ray.stages.graph import label_spreading

    t = pa.table({"a": pa.array([0, 1, 2], pa.int64()),
                  "b": pa.array([1, 2, 3], pa.int64())})
    st = pa.table({"node": pa.array([0], pa.int64()),
                   "label": pa.array([7], pa.int64())})
    out = label_spreading(t, st, max_rounds=3, nb=2).to_pandas()
    assert dict(zip(out["node"], out["label"])) \
        == {0: 7, 1: 7, 2: 7, 3: 7}
    with pytest.raises(RuntimeError, match="did not converge"):
        label_spreading(t, st, max_rounds=2, nb=2).to_pandas()


def test_mixture_sample_exact_decimal_quota():
    # review fix: int(100 * 0.29) == 28 in float; quota must be 29
    from biosd_feature_annotator_ray.stages.canonicalize import (
        mixture_sample)

    t = pa.table({"id": pa.array(range(100), pa.int64()),
                  "g": pa.array(["a"] * 60 + ["b"] * 40)})
    out = mixture_sample(rd.from_arrow(t), "g",
                         {"a": 0.29, "b": 0.40}, total_n=100,
                         id_col="id", nb=2).to_pandas()
    assert out.groupby("g").size().to_dict() == {"a": 29, "b": 40}


def test_ip_in_cidr_anti_schema_stable():
    from biosd_feature_annotator_ray.functions.net import ip_in_cidr_join

    t = pa.table({"ip": pa.array(["10.0.0.1", "8.8.8.8"])})
    anti = ip_in_cidr_join(rd.from_arrow(t), ["10.0.0.0/8"],
                           how="anti")
    assert anti.schema().names == ["ip", "cidr"]
    df = anti.to_pandas()
    assert list(df["ip"]) == ["8.8.8.8"]
    assert df["cidr"].isna().all()


def test_frequent_itemsets_triple_expansion_guard():
    from biosd_feature_annotator_ray.stages.sketches import (
        frequent_itemsets)

    # one basket with 12 shared items -> C(12,3)=220 candidates
    t = pa.table({"b": pa.array([1] * 12 + [2] * 12, pa.int64()),
                  "i": pa.array([f"i{j:02d}" for j in range(12)] * 2)})
    with pytest.raises(RuntimeError, match="triple expansion"):
        frequent_itemsets(rd.from_arrow(t), "b", "i", min_support=2,
                          max_expanded_triples=100, nb=2).to_pandas()
    ok = frequent_itemsets(rd.from_arrow(t), "b", "i", min_support=2,
                           max_expanded_triples=1000, nb=2).to_pandas()
    assert (ok["size"] == 3).sum() == 220
