"""Text-analysis kernels + multimodal plumbing stubs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from biosd_feature_annotator_ray.stages import multimodal, textstats


def test_token_count_matches_duckdb_semantics():
    import duckdb

    texts = ["a  b c", "", "  ", "one", "x y z w  v"]
    t = textstats.token_count(pa.table({"text": texts}))
    got = t.column("n_tokens").to_pylist()
    want = [
        duckdb.sql(f"SELECT len(regexp_split_to_array(trim('{s}'), '\\s+'))").fetchone()[0]
        for s in texts
    ]
    assert got == want


def test_langid_distinguishes_stopword_languages():
    stage = textstats.LangIdStage()
    batch = pa.table(
        {
            "text": [
                "the cat and the dog are in the house",
                "el perro y el gato en la casa que es",
                "der hund und die katze ist in dem haus",
                "le chien et le chat est dans la maison",
                "zzz qqq www",
            ]
        }
    )
    out = stage(batch).column("lang_pred").to_pylist()
    assert out == ["en", "es", "de", "fr", "und"]


def test_quality_scores_rank_sensibly():
    good = "the quick brown fox jumps over the lazy dog and runs to the hills again today"
    bad = "!!! ??? ### 12345 67890 @@@@"
    t = textstats.quality_features(pa.table({"text": [good, bad]}))
    scores = t.column("quality_score").to_pylist()
    assert scores[0] > scores[1]


def test_fingerprint_stability_and_similarity():
    a = "one two three four five six seven eight nine ten"
    b = "one two three four five six seven eight nine eleven"  # near-dup
    c = "completely different words entirely here now"
    t1 = textstats.fingerprint(pa.table({"text": [a, b, c]}))
    t2 = textstats.fingerprint(pa.table({"text": [a, b, c]}))
    assert t1.column("fingerprint").to_pylist() == t2.column("fingerprint").to_pylist()  # stable
    fa, fb, fc = t1.column("fingerprint").to_pylist()
    mins = lambda f: set(f[i:i + 16] for i in range(0, len(f), 16))
    assert len(mins(fa) & mins(fb)) > len(mins(fa) & mins(fc))


def test_chunk_documents_windows():
    t = pa.table({"doc_id": [1, 2], "text": ["a b c d e f g h", ""]})
    out = textstats.chunk_documents(t, chunk_tokens=4, overlap=1)
    rows = out.to_pylist()
    # doc 1: step 3 → starts 0,3,6 → chunks [a b c d][d e f g][g h]; doc 2 empty → none
    assert [r["chunk_text"] for r in rows] == ["a b c d", "d e f g", "g h"]
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [4, 4, 2]


def test_train_split_deterministic_and_disjoint():
    t = pa.table({"doc_id": list(range(200))})
    a = textstats.train_split(t).to_pandas()
    b = textstats.train_split(t).to_pandas()
    assert a.equals(b)
    assert set(a.split) == {"train", "val", "test"}
    assert ((a.bucket >= 0) & (a.bucket < 100)).all()
    # fractions roughly honored
    assert 0.6 < (a.split == "train").mean() < 0.95


def test_image_decode_stub_plumbing():
    media = multimodal.synth_media_table(10)
    out = multimodal.ImageDecodeStage()(media)
    assert out.column("feature").type == pa.list_(pa.float32(), multimodal.IMAGE_FEAT_DIM)
    assert len(out) == 10 and "payload" not in out.column_names
    # deterministic per content
    out2 = multimodal.ImageDecodeStage()(media)
    assert out.column("feature").to_pylist() == out2.column("feature").to_pylist()


def test_real_mode_raises():
    # image/audio/video real decode is IMPLEMENTED (pure-python
    # PNG/WAV/MPNG — tests/test_codecs.py); real modes REJECT payloads
    # in formats that would need codec libraries instead of faking them
    with pytest.raises(NotImplementedError):
        # noise payloads are not MPNG → the real video path refuses
        multimodal.VideoFrameSampleStage(mode="real")(multimodal.synth_media_table(2))
    with pytest.raises(ValueError):
        # real image mode rejects a non-PNG payload instead of faking it
        multimodal.ImageDecodeStage(mode="real")(multimodal.synth_media_table(2))


def test_video_frame_sampling_expands_rows():
    media = multimodal.synth_media_table(4)
    out = multimodal.VideoFrameSampleStage(frames_per_video=3)(media)
    assert len(out) == 12
    assert out.column("frame_idx").to_pylist()[:3] == [0, 1, 2]


def test_dup_ngram_stats_planted(ray_session):
    import ray.data as rd
    from biosd_feature_annotator_ray.stages.textstats import dup_ngram_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f",            # grams: abcde, bcdef
                 "x y a b c d e z",        # xyabc, yabcd, abcde, bcdez
                 "q w e r t y u"],         # 3 unique grams
    })
    out = dup_ngram_stats(rd.from_pandas(df).repartition(3), k=5, nb=4).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["n_grams"].tolist() == [2, 4, 3]
    assert out["dup_grams"].tolist() == [1, 1, 0]
    assert out["dup_share"].tolist() == [0.5, 0.25, 0.0]
    # a doc shorter than k emits no row
    short = pd.DataFrame({"doc_id": [9], "text": ["only four words here"]})
    both = pd.concat([df, short], ignore_index=True)
    out2 = dup_ngram_stats(rd.from_pandas(both), k=5, nb=4).to_pandas()
    assert 9 not in set(out2["doc_id"])


def test_readability_known_values_and_nulls():
    import pyarrow as pa

    from biosd_feature_annotator_ray.stages.textstats import readability

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["The cat sat. The dog ran!", "", None,
                 "word word word"]})
    out = readability(t)
    d = out.to_pylist()
    # doc 0: 6 words, 2 sentences, syllable groups: e,a,a,e,o,a = 6
    assert d[0]["n_words"] == 6
    assert d[0]["n_sentences"] == 2
    assert d[0]["n_syllables"] == 6
    assert abs(d[0]["flesch"]
               - (206.835 - 1.015 * 3 - 84.6 * 1.0)) < 1e-6
    assert abs(d[0]["fk_grade"]
               - (0.39 * 3 + 11.8 * 1.0 - 15.59)) < 1e-6
    for i in (1, 2):
        assert d[i]["n_words"] == 0
        assert d[i]["n_sentences"] is None
        assert d[i]["flesch"] is None
    # no punctuation → sentence floor of 1
    assert d[3]["n_sentences"] == 1
