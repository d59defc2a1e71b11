"""Sixth-sitting operators: label-propagation communities, 1-WL color
refinement, bipartite butterfly counting, multi-source BFS / harmonic
centrality."""

from __future__ import annotations

import hashlib
import random
from collections import Counter, defaultdict

import pyarrow as pa
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.stages.graph import (
    label_propagation,
    wl_refinement,
)


# ------------------------------------------------------------- helpers

def _edges_table(pairs):
    return pa.table({"a": pa.array([a for a, _ in pairs], pa.int64()),
                     "b": pa.array([b for _, b in pairs], pa.int64())})


def _random_simple_graph(rng, n, m):
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


# ------------------------------------------------------------------ LPA

def _ref_lpa(pairs, n_iters):
    """Scalar reference: synchronous, most-frequent neighbor label,
    min-label tie-break."""
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(n_iters):
        lab = {
            v: max(Counter(lab[u] for u in adj[v]).items(),
                   key=lambda kv: (kv[1], -kv[0]))[0]
            for v in adj
        }
    return lab


def test_lpa_two_cliques_bridge():
    pairs = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                pairs.append((base + i, base + j))
    pairs.append((4, 10))
    out = label_propagation(
        rd.from_arrow(_edges_table(pairs)).repartition(3),
        n_iters=3, nb=8).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    # each clique collapses onto its min node id
    for i in range(5):
        assert got[i] == 0
        assert got[10 + i] == 10
    assert got == _ref_lpa(pairs, 3)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_lpa_random_graph_matches_reference(seed):
    rng = random.Random(seed)
    pairs = _random_simple_graph(rng, n=40, m=120)
    n_iters = rng.choice([1, 2, 3, 4])
    out = label_propagation(
        rd.from_arrow(_edges_table(pairs)).repartition(4),
        n_iters=n_iters, nb=8).to_pandas()
    got = dict(zip(out["node"], out["label"]))
    assert got == _ref_lpa(pairs, n_iters)


def test_lpa_deterministic_across_runs():
    rng = random.Random(7)
    pairs = _random_simple_graph(rng, n=30, m=80)
    runs = []
    for _ in range(2):
        out = label_propagation(
            rd.from_arrow(_edges_table(pairs)).repartition(5),
            n_iters=3, nb=8).to_pandas()
        runs.append(sorted(zip(out["node"], out["label"])))
    assert runs[0] == runs[1]


# ------------------------------------------------------------------- WL

def _ref_wl(pairs, n_iters):
    """Scalar reference: c0 = str(degree), then md5 multiset rounds."""
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    c = {v: str(len(adj[v])) for v in adj}
    for _ in range(n_iters):
        c = {
            v: hashlib.md5(
                (c[v] + "|" + ",".join(sorted(c[u] for u in adj[v])))
                .encode()).hexdigest()
            for v in adj
        }
    return c


def test_wl_isomorphic_components_share_colors():
    pairs = ([(0, i) for i in (1, 2, 3, 4)]
             + [(10, i) for i in (11, 12, 13, 14)]
             + [(20, 21), (21, 22), (22, 23), (23, 24)])
    out = wl_refinement(
        rd.from_arrow(_edges_table(pairs)).repartition(3),
        n_iters=2, nb=8).to_pandas()
    got = dict(zip(out["node"], out["wl_color"]))
    assert got == _ref_wl(pairs, 2)
    # the two stars are isomorphic: hub≡hub, leaf≡leaf
    assert got[0] == got[10]
    assert got[1] == got[11] == got[2] == got[14]
    # a path midpoint is NOT star-shaped
    assert got[22] != got[0] and got[22] != got[1]


@pytest.mark.parametrize("seed", [11, 12])
def test_wl_random_graph_matches_reference(seed):
    rng = random.Random(seed)
    pairs = _random_simple_graph(rng, n=30, m=70)
    n_iters = rng.choice([1, 2, 3])
    out = wl_refinement(
        rd.from_arrow(_edges_table(pairs)).repartition(4),
        n_iters=n_iters, nb=8).to_pandas()
    got = dict(zip(out["node"], out["wl_color"]))
    assert got == _ref_wl(pairs, n_iters)


# ------------------------------------------------------------ butterflies

def _ref_butterflies(pairs):
    import itertools

    nv = defaultdict(set)
    for u, v in pairs:
        nv[v].add(u)
    w = Counter()
    for us in nv.values():
        for u1, u2 in itertools.combinations(sorted(us), 2):
            w[(u1, u2)] += 1
    return sum(c * (c - 1) // 2 for c in w.values())


def _bip_table(pairs):
    return pa.table({"u": pa.array([p[0] for p in pairs], pa.int64()),
                     "v": pa.array([p[1] for p in pairs], pa.int64())})


def test_butterfly_single_biclique():
    from biosd_feature_annotator_ray.stages.graph import butterfly_count

    # K_{2,2} = 1 butterfly; K_{3,3} = C(3,2)^2 = 9
    k22 = [(0, 100), (0, 101), (1, 100), (1, 101)]
    assert butterfly_count(rd.from_arrow(_bip_table(k22)), nb=8) == 1
    k33 = [(u, 100 + v) for u in range(3) for v in range(3)]
    assert butterfly_count(rd.from_arrow(_bip_table(k33)), nb=8) == 9


@pytest.mark.parametrize("seed", [21, 22])
def test_butterfly_random_matches_bruteforce(seed):
    from biosd_feature_annotator_ray.stages.graph import butterfly_count

    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < 140:
        pairs.add((rng.randrange(20), 100 + rng.randrange(20)))
    pairs = sorted(pairs)
    n = butterfly_count(
        rd.from_arrow(_bip_table(pairs)).repartition(3), nb=8)
    assert n == _ref_butterflies(pairs)


def test_butterfly_max_degree_skips_hubs():
    from biosd_feature_annotator_ray.stages.graph import butterfly_count

    # hub v=100 touches all u's; v=101/102 touch two each
    pairs = ([(u, 100) for u in range(6)]
             + [(0, 101), (1, 101), (0, 102), (1, 102)])
    full = butterfly_count(rd.from_arrow(_bip_table(pairs)), nb=8)
    cut = butterfly_count(rd.from_arrow(_bip_table(pairs)),
                          max_degree=2, nb=8)
    # dropping the hub keeps only the (0,1)×(101,102) butterfly
    assert full == _ref_butterflies(pairs)
    assert cut == 1 < full


# ------------------------------------------- multi-source BFS / harmonic

def _ref_multi_bfs(pairs, seeds):
    from collections import deque

    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
    out = {}
    for lm in seeds:
        dist = {lm: 0}
        q = deque([lm])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for n, d in dist.items():
            out[(lm, n)] = d
    return out


def _dir_table(pairs):
    return pa.table({"src": pa.array([p[0] for p in pairs], pa.int64()),
                     "dst": pa.array([p[1] for p in pairs], pa.int64())})


@pytest.mark.parametrize("seed", [31, 32])
def test_multi_source_bfs_matches_per_seed_bfs(seed):
    from biosd_feature_annotator_ray.stages.graph import multi_source_bfs

    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < 150:
        a, b = rng.randrange(35), rng.randrange(35)
        if a != b:
            pairs.add((a, b))  # directed, cycles allowed
    pairs = sorted(pairs)
    seeds_l = sorted(rng.sample(range(35), 4))
    out = multi_source_bfs(
        rd.from_arrow(_dir_table(pairs)).repartition(3),
        seeds_l, nb=8).to_pandas()
    got = {(r.lm, r.node): r.dist for r in out.itertuples()}
    assert got == _ref_multi_bfs(pairs, seeds_l)


def test_harmonic_centrality_matches_reference():
    from biosd_feature_annotator_ray.stages.graph import harmonic_centrality

    rng = random.Random(41)
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            pairs.add((a, b))
    pairs = sorted(pairs)
    seeds_l = [0, 5, 9]
    hc = harmonic_centrality(
        rd.from_arrow(_dir_table(pairs)).repartition(3),
        seeds_l, nb=8).to_pandas()
    got = dict(zip(hc["node"], hc["harmonic"]))
    exp = defaultdict(float)
    for (lm, n), d in _ref_multi_bfs(pairs, seeds_l).items():
        if d > 0:
            exp[n] += 1.0 / d
    assert set(got) == set(exp)
    for n, v in exp.items():
        assert abs(got[n] - round(v, 6)) < 1e-9


# ----------------------------------------------------------- construct

def test_construct_set_semantics_and_optional_skip():
    from biosd_feature_annotator_ray.stages.graph import construct_triples

    rows = []
    for i in range(12):
        rows.append({"subj": f"d{i}", "pred": "type", "obj": "Document"})
        rows.append({"subj": f"d{i}", "pred": "hasAuthor",
                     "obj": f"a{i % 3}"})
        if i % 4 == 0:
            rows.append({"subj": f"d{i}", "pred": "cites",
                         "obj": f"d{(i + 1) % 12}"})
    t = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = construct_triples(
        t,
        where=[("?d", "type", "Document"), ("?d", "hasAuthor", "?a")],
        template=[("?a", "type", "Author"), ("?d", "related", "?c")],
        optional=[("?d", "cites", "?c")],
        nb=8).to_pandas()
    got = set(map(tuple, out[["subj", "pred", "obj"]]
                  .itertuples(index=False)))
    exp = {(f"a{j}", "type", "Author") for j in range(3)}
    exp |= {(f"d{i}", "related", f"d{(i + 1) % 12}")
            for i in range(12) if i % 4 == 0}
    # set semantics: 12 docs collapse onto 3 distinct Author triples;
    # the OPTIONAL-miss rows emit NO related triple
    assert got == exp


def test_construct_unbound_template_var_raises():
    from biosd_feature_annotator_ray.stages.graph import construct_triples

    t = rd.from_arrow(pa.Table.from_pylist(
        [{"subj": "s", "pred": "p", "obj": "o"}]))
    with pytest.raises(ValueError, match="not bound"):
        construct_triples(t, where=[("?s", "p", "?o")],
                          template=[("?s", "q", "?zzz")], nb=4)


# --------------------------------------------------------- eccentricity

def test_eccentricity_chain_and_parity():
    from biosd_feature_annotator_ray.stages.graph import eccentricity

    pairs = [(i, i + 1) for i in range(6)]
    ecc = eccentricity(
        rd.from_arrow(_dir_table(pairs)), [0, 2, 5], nb=8).to_pandas()
    got = dict(zip(ecc["lm"], ecc["ecc"]))
    assert got == {0: 6, 2: 4, 5: 1}

    rng = random.Random(51)
    rpairs = set()
    while len(rpairs) < 100:
        a, b = rng.randrange(25), rng.randrange(25)
        if a != b:
            rpairs.add((a, b))
    rpairs = sorted(rpairs)
    seeds_l = [0, 3, 11]
    ecc = eccentricity(
        rd.from_arrow(_dir_table(rpairs)).repartition(3),
        seeds_l, nb=8).to_pandas()
    got = dict(zip(ecc["lm"], ecc["ecc"]))
    ref = _ref_multi_bfs(rpairs, seeds_l)
    exp = defaultdict(int)
    for (lm, _), d in ref.items():
        exp[lm] = max(exp[lm], d)
    assert got == dict(exp)


# ---------------------------------------------------------------- ktruss

def _ref_ktruss(pairs, k):
    import itertools

    es = set(pairs)
    while True:
        sup = {e: 0 for e in es}
        nodes = sorted({v for e in es for v in e})
        for x, y, z in itertools.combinations(nodes, 3):
            if (x, y) in es and (y, z) in es and (x, z) in es:
                sup[(x, y)] += 1
                sup[(y, z)] += 1
                sup[(x, z)] += 1
        bad = {e for e, s in sup.items() if s < k - 2}
        if not bad:
            return sup
        es -= bad
        if not es:
            return {}


def test_ktruss_k5_with_pendant_triangle():
    from biosd_feature_annotator_ray.stages.graph import ktruss

    pairs = ([(i, j) for i in range(5) for j in range(i + 1, 5)]
             + [(0, 9), (1, 9)])
    out = ktruss(rd.from_arrow(_edges_table(pairs)), k=4, nb=8).to_pandas()
    got = {(r.a, r.b): r.support for r in out.itertuples()}
    # pendant edges peel; K5 survives with support 3 everywhere
    assert got == {(i, j): 3 for i in range(5) for j in range(i + 1, 5)}
    # k=6 kills even K5 (needs support 4)
    out6 = ktruss(rd.from_arrow(_edges_table(pairs)), k=6, nb=8)
    assert out6.count() == 0


@pytest.mark.parametrize("seed,k", [(61, 4), (62, 5)])
def test_ktruss_random_matches_bruteforce(seed, k):
    from biosd_feature_annotator_ray.stages.graph import ktruss

    rng = random.Random(seed)
    pairs = _random_simple_graph(rng, n=16, m=80)
    out = ktruss(rd.from_arrow(_edges_table(pairs)).repartition(3),
                 k=k, nb=8).to_pandas()
    got = {(r.a, r.b): r.support for r in out.itertuples()}
    assert got == _ref_ktruss(pairs, k)


def test_ktruss_k_below_3_raises():
    from biosd_feature_annotator_ray.stages.graph import ktruss

    with pytest.raises(ValueError, match=">= 3"):
        ktruss(rd.from_arrow(_edges_table([(0, 1)])), k=2)


# -------------------------------------------------------------- CLI

def test_cli_communities_and_construct(tmp_path):
    import json
    import subprocess
    import sys

    import duckdb
    import pandas as pd

    pairs = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                pairs.append({"a": base + i, "b": base + j})
    pd.DataFrame(pairs).to_parquet(str(tmp_path / "edges.parquet"))

    rows = []
    for i in range(10):
        rows.append({"subj": f"d{i}", "pred": "type", "obj": "Document"})
        rows.append({"subj": f"d{i}", "pred": "hasAuthor",
                     "obj": f"a{i % 3}"})
    pd.DataFrame(rows).to_parquet(str(tmp_path / "triples.parquet"))
    with open(tmp_path / "spec.json", "w") as f:
        json.dump({"where": [["?d", "type", "Document"],
                             ["?d", "hasAuthor", "?a"]],
                   "template": [["?a", "authored", "?d"],
                                ["?a", "type", "Author"]]}, f)

    def run(*cmd):
        out = subprocess.run(
            [sys.executable, "-m", "biosd_feature_annotator_ray", *cmd,
             "--num-cpus", "2"],
            capture_output=True, text=True, check=True, cwd="/root/repo")
        return json.loads(out.stdout.strip().splitlines()[-1])

    r = run("communities", "--input", str(tmp_path / "edges.parquet"),
            "--output", str(tmp_path / "comm"), "--iters", "3")
    assert r["nodes"] == 10 and r["communities"] == 2
    labs = duckdb.sql(f"SELECT DISTINCT label FROM"
                      f" '{tmp_path}/comm/*.parquet' ORDER BY 1").df()
    assert labs["label"].tolist() == [0, 10]

    r = run("construct", "--input", str(tmp_path / "triples.parquet"),
            "--spec", str(tmp_path / "spec.json"),
            "--output", str(tmp_path / "cons"))
    assert r["triples"] == 13  # 10 authored + 3 Author types
    n = duckdb.sql(f"SELECT count(*) AS n FROM '{tmp_path}/cons/*.parquet'"
                   f" WHERE pred = 'type'").df().n[0]
    assert n == 3


# ------------------------------------------------------------ rel links

def test_extract_rel_links_variants():
    from biosd_feature_annotator_ray.functions.urls import extract_rel_links

    batch = pa.table({
        "url": ["u1", "u2", "u3", "u4"],
        "html": [
            # attr order + case + quoting variants
            '<LINK HREF="https://c.ex/a" REL=Canonical>'
            "<link rel=alternate hreflang=EN href=https://c.ex/en>",
            # stylesheet and lang-less alternates drop
            '<link rel=stylesheet href=/x.css>'
            "<link rel=alternate href=https://no.lang/>",
            # no link tags at all
            '<a href="https://a.ex/">x</a>',
            # hreflang before href, single quotes
            "<link hreflang='fr-CA' rel='ALTERNATE' href='https://c.ex/fr'>",
        ]})
    out = extract_rel_links(batch).to_pandas()
    got = set(map(tuple, out[["url", "kind", "lang", "target"]]
                  .itertuples(index=False)))
    assert got == {
        ("u1", "canonical", None, "https://c.ex/a"),
        ("u1", "alternate", "en", "https://c.ex/en"),
        ("u4", "alternate", "fr-ca", "https://c.ex/fr"),
    }


def test_extract_rel_links_empty_and_null():
    from biosd_feature_annotator_ray.functions.urls import extract_rel_links

    out = extract_rel_links(pa.table({
        "url": pa.array([], pa.string()),
        "html": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out.schema.names == ["url", "kind", "lang", "target"]
    out = extract_rel_links(pa.table({
        "url": ["u"], "html": pa.array([None], pa.string())}))
    assert out.num_rows == 0


# -------------------------------------------------------- decontaminate

def test_decontaminate_joined_basic_and_nulls():
    from biosd_feature_annotator_ray.stages.dedup import decontaminate_joined

    docs = [
        {"doc_id": 1, "text": "the quick brown fox jumps over"},
        {"doc_id": 2, "text": "completely unrelated words here now"},
        {"doc_id": 3,
         "text": "quick brown fox again and the quick brown cat"},
        {"doc_id": 4, "text": "short one"},
        {"doc_id": 5, "text": None},
    ]
    bench = [{"text": "a quick brown fox ran"},
             {"text": "over the hill"}]
    out = decontaminate_joined(
        rd.from_arrow(pa.Table.from_pylist(docs)).repartition(2),
        rd.from_arrow(pa.Table.from_pylist(bench)), n=3, nb=8).to_pandas()
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in out.itertuples()}
    # only 'quick brown fox' overlaps; distinct per doc (doc 3 repeats
    # shingles but counts once); sub-n docs and null text report 0
    assert got == {1: (1, True), 2: (0, False), 3: (1, True),
                   4: (0, False), 5: (0, False)}


def test_decontaminate_joined_random_matches_reference():
    from biosd_feature_annotator_ray.stages.dedup import decontaminate_joined

    rng = random.Random(71)
    vocab = [f"w{i}" for i in range(30)]
    docs = [{"doc_id": i,
             "text": " ".join(rng.choice(vocab) for _ in range(25))}
            for i in range(40)]
    bench = [{"text": " ".join(rng.choice(vocab) for _ in range(25))}
             for _ in range(5)]

    def sh(s, n=3):
        t = s.split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

    bset = set().union(*(sh(b["text"]) for b in bench))
    exp = {d["doc_id"]: len(sh(d["text"]) & bset) for d in docs}
    out = decontaminate_joined(
        rd.from_arrow(pa.Table.from_pylist(docs)).repartition(3),
        rd.from_arrow(pa.Table.from_pylist(bench)), n=3, nb=8).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == exp


# --------------------------------------------------------------- vocab

def test_build_vocab_ids_and_pruning():
    from biosd_feature_annotator_ray.stages.textstats import build_vocab

    docs = [{"doc_id": i, "text": f"alpha beta w{i % 5} w{i % 3} alpha"}
            for i in range(30)]
    out = build_vocab(
        rd.from_arrow(pa.Table.from_pylist(docs)).repartition(3),
        min_df=2, nb=8).to_pandas().sort_values("token_id")
    dfc = Counter()
    for d in docs:
        for t in set(d["text"].split()):
            dfc[t] += 1
    ref = sorted(((t, c) for t, c in dfc.items() if c >= 2),
                 key=lambda kv: (-kv[1], kv[0]))
    exp = [(t, c, i) for i, (t, c) in enumerate(ref)]
    got = list(map(tuple, out[["token", "df", "token_id"]]
                   .itertuples(index=False)))
    assert got == exp
    # ids are dense and 0-based; max_vocab truncates AFTER ranking
    assert out["token_id"].tolist() == list(range(len(exp)))
    top3 = build_vocab(
        rd.from_arrow(pa.Table.from_pylist(docs)).repartition(3),
        min_df=2, max_vocab=3, nb=8).to_pandas().sort_values("token_id")
    assert list(map(tuple, top3[["token", "df", "token_id"]]
                    .itertuples(index=False))) == exp[:3]


# -------------------------------------------------------------- encode

def test_encode_tokens_order_oov_and_nulls():
    from biosd_feature_annotator_ray.stages.textstats import encode_tokens

    vocab = pa.table({"token": ["alpha", "beta", "gamma"],
                      "token_id": pa.array([0, 1, 2], pa.int64())})
    docs = [
        {"doc_id": 1, "text": "alpha beta zeta alpha"},
        {"doc_id": 2, "text": "  "},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": "gamma"},
    ]
    out = encode_tokens(
        rd.from_arrow(pa.Table.from_pylist(docs)).repartition(2),
        vocab).to_pandas().sort_values("doc_id")
    got = list(map(tuple, out[["doc_id", "n_tokens", "n_oov", "ids_str"]]
                   .itertuples(index=False)))
    # order preserved; OOV → -1; whitespace-only and null text → null
    assert got == [(1, 4, 1, "0,1,-1,0"), (2, 0, 0, None),
                   (3, 0, 0, None), (4, 1, 0, "2")]


# -------------------------------------------------- string components

def test_string_components_chain_pair_and_isolated_edge():
    from biosd_feature_annotator_ray.stages.graph import string_components

    edges = pa.table({
        "src": ["b", "c", "x", "q"],
        "dst": ["a", "b", "y", "q"],  # chain c-b-a, pair x-y, self q
    })
    out = string_components(rd.from_arrow(edges), nb=4).to_pandas()
    got = dict(zip(out["node"], out["lab"]))
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "q": "q"}


def test_page_equivalence_components_fold_canonical_and_redirects():
    from biosd_feature_annotator_ray.functions.urls import extract_rel_links
    from biosd_feature_annotator_ray.stages.graph import (
        resolve_redirects,
        string_components,
    )
    import pyarrow.compute as pc

    pages = rd.from_arrow(pa.table({
        "url": ["https://s/p0", "https://s/p1", "https://s/p2"],
        "html": ['<link rel=canonical href=https://s/c0>',
                 '<link rel=canonical href=https://s/c0>',
                 '<link rel=canonical href=https://s/c1>']}))
    canon = pages.map_batches(extract_rel_links,
                              batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "canonical"))
        .select(["url", "target"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow")
    red = resolve_redirects(rd.from_arrow(pa.table({
        "src": ["https://s/c0"], "dst": ["https://s/m"]})), nb=4)
    red_edges = red.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), "resolved"))
        .select(["src", "final"]).rename_columns(["src", "dst"]),
        batch_format="pyarrow")
    labels = string_components(canon.union(red_edges), nb=4).to_pandas()
    got = dict(zip(labels["node"], labels["lab"]))
    # p0, p1, c0, m fold together (canonical + redirect); p2/c1 apart
    assert (got["https://s/p0"] == got["https://s/p1"]
            == got["https://s/c0"] == got["https://s/m"])
    assert got["https://s/p2"] == got["https://s/c1"] != got["https://s/p0"]


# ------------------------------------------- incremental closure

def test_incremental_closure_equals_from_scratch():
    from biosd_feature_annotator_ray.stages.graph import (
        transitive_closure,
        transitive_closure_incremental,
    )

    rng = random.Random(13)
    all_e = set()
    while len(all_e) < 100:
        i, j = sorted(rng.sample(range(35), 2))
        all_e.add((i, j))
    all_e = sorted(all_e)
    base = [e for k, e in enumerate(all_e) if k % 5 != 0]
    delta = [e for k, e in enumerate(all_e) if k % 5 == 0]

    def tbl(pairs):
        return pa.table({
            "child": pa.array([p[0] for p in pairs], pa.int64()),
            "parent": pa.array([p[1] for p in pairs], pa.int64())})

    C = transitive_closure(
        rd.from_arrow(tbl(base)).repartition(3), nb=8).materialize()
    inc = transitive_closure_incremental(
        C, tbl(delta), tbl(all_e), nb=8).to_pandas()
    full = transitive_closure(
        rd.from_arrow(tbl(all_e)).repartition(3), nb=8).to_pandas()
    gi = set(map(tuple, inc[["node", "anc"]].itertuples(index=False)))
    gf = set(map(tuple, full[["node", "anc"]].itertuples(index=False)))
    assert gi == gf


def test_incremental_closure_cycle_raises():
    from biosd_feature_annotator_ray.stages.graph import (
        transitive_closure,
        transitive_closure_incremental,
    )

    base = pa.table({"child": pa.array([0, 1], pa.int64()),
                     "parent": pa.array([1, 2], pa.int64())})
    C = transitive_closure(rd.from_arrow(base), nb=4).materialize()
    cyc = pa.table({"child": pa.array([2], pa.int64()),
                    "parent": pa.array([0], pa.int64())})
    alle = pa.table({"child": pa.array([0, 1, 2], pa.int64()),
                     "parent": pa.array([1, 2, 0], pa.int64())})
    with pytest.raises(ValueError, match="cycle"):
        transitive_closure_incremental(C, cyc, alle, nb=4).materialize()


# ------------------------------------------------------ fact intervals

def test_fact_intervals_islands_nulls_and_reopen():
    import datetime as dt

    import pandas as pd

    from biosd_feature_annotator_ray.stages.windows import fact_intervals

    T = lambda m: dt.datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        {"subj": "u1", "pred": "status", "obj": "a", "ts": T(0)},
        {"subj": "u1", "pred": "status", "obj": "a", "ts": T(1)},
        {"subj": "u1", "pred": "status", "obj": "b", "ts": T(2)},
        {"subj": "u1", "pred": "status", "obj": "a", "ts": T(3)},
        {"subj": "u2", "pred": "status", "obj": None, "ts": T(0)},
        {"subj": "u2", "pred": "status", "obj": None, "ts": T(1)},
        {"subj": "u2", "pred": "status", "obj": "c", "ts": T(2)},
    ]
    out = fact_intervals(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3),
        nb=8).to_pandas().sort_values(["subj", "valid_from"])
    recs = [(r.subj, r.obj,
             r.valid_from, r.valid_to if pd.notna(r.valid_to) else None,
             r.n_obs) for r in out.itertuples()]
    TS = pd.Timestamp
    assert recs == [
        # a reopens as a NEW interval after b (no cross-gap merge)
        ("u1", "a", TS(T(0)), TS(T(2)), 2),
        ("u1", "b", TS(T(2)), TS(T(3)), 1),
        ("u1", "a", TS(T(3)), None, 1),
        # null obj is a value: its island compacts like any other
        ("u2", None, TS(T(0)), TS(T(2)), 2),
        ("u2", "c", TS(T(2)), None, 1),
    ]


def test_fact_intervals_random_matches_pandas_reference():
    import datetime as dt

    import pandas as pd

    from biosd_feature_annotator_ray.stages.windows import fact_intervals

    rng = random.Random(81)
    rows = []
    for i in range(400):
        rows.append({
            "subj": f"s{rng.randrange(8)}", "pred": f"p{rng.randrange(2)}",
            "obj": rng.choice(["x", "y", "z", None]),
            "ts": dt.datetime(2026, 1, 1) + dt.timedelta(minutes=i)})
    out = fact_intervals(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4),
        nb=8).to_pandas().sort_values(["subj", "pred", "valid_from"])
    got = [(r.subj, r.pred, r.obj,
            r.valid_from, r.valid_to if pd.notna(r.valid_to) else None,
            r.n_obs) for r in out.itertuples()]

    df = pd.DataFrame(rows).sort_values(["subj", "pred", "ts", "obj"])
    exp = []
    for (s, p), g in df.groupby(["subj", "pred"], sort=True):
        islands = []
        for r in g.itertuples():
            if islands and ((islands[-1][0] == r.obj) or
                            (islands[-1][0] is None and r.obj is None)):
                islands[-1][2] += 1
            else:
                islands.append([r.obj, r.ts, 1])
        for k, (o, vf, n) in enumerate(islands):
            vt = islands[k + 1][1] if k + 1 < len(islands) else None
            exp.append((s, p, o, pd.Timestamp(vf),
                        pd.Timestamp(vt) if vt else None, n))
    exp.sort(key=lambda r: (r[0], r[1], r[3]))
    assert got == exp
