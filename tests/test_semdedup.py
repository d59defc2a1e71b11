"""SemDeDup (cluster-then-prune semantic dedup) and char-entropy
quality signal (round 5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from biosd_feature_annotator_ray.stages.dedup import (
    SemdedupClusterOverflow, semdedup)


def _corpus(seed=0, n=60, dim=8, n_dupes=10):
    """Well-separated base vectors + planted near-duplicates."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [base[i] for i in range(n)]
    ids = list(range(n))
    for d in range(n_dupes):  # id 1000+d duplicates vector d
        noisy = base[d] + rng.standard_normal(dim).astype(
            np.float32) * 0.01
        vecs.append(noisy / np.linalg.norm(noisy))
        ids.append(1000 + d)
    return ids, np.stack(vecs)


def _brute_groups(ids, vecs, assign, threshold):
    """Reference: within each assigned cluster, cosine-threshold
    graph components with min-id representative."""
    import collections
    byc = collections.defaultdict(list)
    for i, vid in enumerate(ids):
        byc[assign[vid]].append(i)
    rep = {}
    for _c, idxs in byc.items():
        v = vecs[idxs]
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        sim = v @ v.T
        adj = sim >= threshold - 1e-12
        lab = list(range(len(idxs)))

        def find(x):
            while lab[x] != x:
                x = lab[x]
            return x

        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                if adj[a, b]:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        lab[max(ra, rb)] = min(ra, rb)
        for a in range(len(idxs)):
            comp = [ids[idxs[x]] for x in range(len(idxs))
                    if find(x) == find(a)]
            rep[ids[idxs[a]]] = min(comp)
    return rep


def test_semdedup_planted_duplicates_brute_force_parity():
    ids, vecs = _corpus()
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    out = semdedup(rd.from_arrow(t).repartition(3), k=6,
                   threshold=0.98, nb=4).to_pandas()
    assign = dict(zip(out["vec_id"], out["cluster"]))
    rep_ref = _brute_groups(ids, vecs, assign, 0.98)
    got_rep = dict(zip(out["vec_id"], out["rep"]))
    assert got_rep == rep_ref
    # every planted duplicate whose twin landed in the same cluster
    # is dropped in favour of the min id
    dropped = set(out.loc[~out["keep"], "vec_id"])
    for d in range(10):
        if assign[d] == assign[1000 + d]:
            assert 1000 + d in dropped and d not in dropped
    # keep is exactly id == rep
    assert ((out["vec_id"] == out["rep"]) == out["keep"]).all()


def test_semdedup_threshold_one_keeps_near_pairs_apart():
    ids, vecs = _corpus(seed=1)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    out = semdedup(rd.from_arrow(t), k=4, threshold=1.0,
                   nb=2).to_pandas()
    # noisy twins have cosine < 1 → everything is its own rep
    assert out["keep"].all()
    with pytest.raises(ValueError, match="threshold"):
        semdedup(rd.from_arrow(t), k=4, threshold=1.5)


def test_semdedup_deterministic_and_overflow_guard():
    ids, vecs = _corpus(seed=2)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))})
    a = semdedup(rd.from_arrow(t).repartition(4), k=5,
                 threshold=0.95, nb=4).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    b = semdedup(rd.from_arrow(t).repartition(2), k=5,
                 threshold=0.95, nb=2).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert a.equals(b)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(rd.from_arrow(t), k=1, threshold=0.9,
                 max_cluster_rows=10).to_pandas()


def test_char_entropy_known_values():
    from biosd_feature_annotator_ray.stages.textstats import (
        char_entropy)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["aaaa", "abab", "abcd", None])})
    out = (char_entropy(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_chars"].tolist() == [4, 4, 4, 0]
    assert abs(out["entropy"][0] - 0.0) < 1e-12
    assert abs(out["entropy"][1] - 1.0) < 1e-12
    assert abs(out["entropy"][2] - 2.0) < 1e-12
    assert out["entropy"][3] == 0.0


def test_char_entropy_unicode_codepoints():
    from biosd_feature_annotator_ray.stages.textstats import (
        char_entropy)

    # 2 distinct codepoints, equal counts → 1 bit/char; length in
    # CODEPOINTS not bytes
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["é漢é漢"])})
    out = char_entropy(rd.from_arrow(t)).to_pandas()
    assert out["n_chars"][0] == 4
    assert abs(out["entropy"][0] - 1.0) < 1e-12


# --- knn_join ---------------------------------------------------------------

def test_knn_join_brute_force_parity_and_guards():
    from biosd_feature_annotator_ray.stages.similarity import knn_join

    rng = np.random.default_rng(4)
    L = rng.standard_normal((12, 6))
    R = rng.standard_normal((30, 6))
    lt = pa.table({"vec_id": pa.array(range(12), pa.int64()),
                   "embedding": pa.array([v.tolist() for v in L],
                                         pa.list_(pa.float32()))})
    rt = pa.table({"vec_id": pa.array(range(100, 130), pa.int64()),
                   "embedding": pa.array([v.tolist() for v in R],
                                         pa.list_(pa.float32()))})
    out = (knn_join(rd.from_arrow(lt).repartition(3),
                    rd.from_arrow(rt).repartition(2), k=4)
           .to_pandas().sort_values(["vec_id", "rank"]))
    # brute force over the SAME float32-rounded inputs
    Lf = np.asarray(lt.column("embedding").combine_chunks().values,
                    dtype=np.float64).reshape(12, -1)
    Rf = np.asarray(rt.column("embedding").combine_chunks().values,
                    dtype=np.float64).reshape(30, -1)
    Lf /= np.linalg.norm(Lf, axis=1, keepdims=True)
    Rf /= np.linalg.norm(Rf, axis=1, keepdims=True)
    sims = np.round(Lf @ Rf.T, 9)
    for i in range(12):
        best = sorted(zip(-sims[i], range(100, 130)))[:4]
        sub = out[out["vec_id"] == i]
        assert sub["right_id"].tolist() == [b for _, b in best]
        assert np.allclose(sub["score"].to_numpy(),
                           [-a for a, _ in best], atol=1e-9)
    assert out["rank"].max() == 4

    with pytest.raises(ValueError, match="max_right_rows"):
        knn_join(rd.from_arrow(lt), rd.from_arrow(rt), k=2,
                 max_right_rows=5)
    with pytest.raises(ValueError, match="empty"):
        knn_join(rd.from_arrow(lt),
                 rd.from_arrow(rt.slice(0, 0)), k=2)


def test_knn_join_k_larger_than_right():
    from biosd_feature_annotator_ray.stages.similarity import knn_join

    lt = pa.table({"vec_id": pa.array([0], pa.int64()),
                   "embedding": pa.array([[1.0, 0.0]],
                                         pa.list_(pa.float32()))})
    rt = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                   "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                         pa.list_(pa.float32()))})
    out = knn_join(rd.from_arrow(lt), rd.from_arrow(rt),
                   k=10).to_pandas()
    assert len(out) == 2 and out["rank"].tolist() == [1, 2]
    assert out.iloc[0]["right_id"] == 1


# --- round-5 review regressions --------------------------------------------

def test_semdedup_zero_and_magnitude_vectors():
    from biosd_feature_annotator_ray.stages.dedup import semdedup

    # a zero vector must settle as its own singleton (used to chase
    # an out-of-range label), and cosine-identical vectors of
    # DIFFERENT magnitude must still dedup (spherical clustering)
    rng = np.random.default_rng(9)
    base = rng.standard_normal((20, 6))
    vecs = [v for v in base] + [base[0] * 3.0, np.zeros(6)]
    ids = list(range(20)) + [500, 501]
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, v))
                                         for v in vecs],
                                        pa.list_(pa.float32()))})
    out = semdedup(rd.from_arrow(t), k=4, threshold=0.999,
                   nb=2).to_pandas()
    got = dict(zip(out["vec_id"], out["rep"]))
    assert got[501] == 501          # zero vector: own singleton
    assert got[500] == 0            # 3x-magnitude duplicate collapses
    assert not out.set_index("vec_id")["keep"][500]


def test_knn_join_null_embeddings_and_k_guard():
    from biosd_feature_annotator_ray.stages.similarity import knn_join

    lt = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                   "embedding": pa.array([[1.0, 0.0], None, [0.0, 1.0]],
                                         pa.list_(pa.float32()))})
    rt = pa.table({"vec_id": pa.array([10, 11], pa.int64()),
                   "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                         pa.list_(pa.float32()))})
    out = knn_join(rd.from_arrow(lt).repartition(3),
                   rd.from_arrow(rt), k=1).to_pandas()
    # the null-embedding left row matches nothing; empty blocks from
    # repartition(3) don't crash
    assert sorted(out["vec_id"]) == [0, 2]
    assert dict(zip(out["vec_id"], out["right_id"])) == {0: 10, 2: 11}
    with pytest.raises(ValueError, match="k must be"):
        knn_join(rd.from_arrow(lt), rd.from_arrow(rt), k=0)
    # all-null right side raises loudly
    rt_null = pa.table({"vec_id": pa.array([1], pa.int64()),
                        "embedding": pa.array([None],
                                              pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="non-null"):
        knn_join(rd.from_arrow(lt), rd.from_arrow(rt_null), k=1)
