"""Perceptual image hashing + hamming-pigeonhole near-dup recovery."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from biosd_feature_annotator_ray.functions.codecs import (
    phash64, png_encode)
from biosd_feature_annotator_ray.stages.dedup import hash_near_dups
from biosd_feature_annotator_ray.stages.multimodal import ImagePhashStage


def _ham(a: int, b: int) -> int:
    return bin(int(a) ^ int(b)).count("1")


def test_phash_invariances():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    h = phash64(img)
    # pixel noise: hash stable
    noisy = np.clip(img.astype(int) + rng.integers(-10, 11, img.shape),
                    0, 255).astype(np.uint8)
    assert _ham(h, phash64(noisy)) <= 4
    # 2x nearest-neighbor upscale: low-frequency content unchanged
    up = np.repeat(np.repeat(img, 2, 0), 2, 1)
    assert _ham(h, phash64(up)) <= 4
    # grayscale rendering of the same image stays close
    gray = (img.astype(np.float64)
            @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    assert _ham(h, phash64(gray)) <= 6
    # unrelated image is far
    other = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    assert _ham(h, phash64(other)) >= 16
    # flat image hashes to 0 (DC excluded, all coefficients ~0)
    assert phash64(np.full((16, 16), 128, np.uint8)) == 0


def test_phash_stage_and_near_dups(ray_session):
    rng = np.random.default_rng(11)
    rows = []
    base = {}
    for i in range(12):
        img = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
        base[i] = img
        rows.append({"media_id": i, "payload": png_encode(img)})
    # planted near-dups: 100 = noisy copy of 3, 101 = upscaled copy of 7
    noisy = np.clip(base[3].astype(int) + rng.integers(-6, 7, base[3].shape),
                    0, 255).astype(np.uint8)
    rows.append({"media_id": 100, "payload": png_encode(noisy)})
    up = np.repeat(np.repeat(base[7], 2, 0), 2, 1)
    rows.append({"media_id": 101, "payload": png_encode(up)})
    # one dirty payload, quarantined by on_error="skip"
    rows.append({"media_id": 999, "payload": b"not a png"})

    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    hashed = ds.map_batches(ImagePhashStage(on_error="skip"),
                            batch_format="pyarrow", concurrency=2)
    pairs = (hash_near_dups(hashed, max_hamming=6, nb=4)
             .to_pandas().sort_values(["id_a", "id_b"])
             .reset_index(drop=True))
    got = set(map(tuple, pairs[["id_a", "id_b"]].to_numpy()))
    assert (3, 100) in got
    assert (7, 101) in got
    # no pair touches the quarantined row; spurious pairs possible but
    # must still be within the hamming bound (verified, not just LSH)
    assert all(999 not in p for p in got)
    hdf = hashed.to_pandas().set_index("media_id")["phash"]
    for a, b in got:
        assert _ham(np.uint64(hdf[a]), np.uint64(hdf[b])) <= 6


def test_phash_stage_raises_on_dirty(ray_session):
    ds = rd.from_items([{"media_id": 1, "payload": b"junk"}])
    with pytest.raises(Exception, match="not a PNG"):
        ds.map_batches(ImagePhashStage(), batch_format="pyarrow").materialize()


def test_hash_near_dups_validation(ray_session):
    with pytest.raises(ValueError, match="max_hamming"):
        hash_near_dups(rd.from_items([{"media_id": 1, "phash": 0}]),
                       max_hamming=0)


def test_audio_fp_invariances():
    from biosd_feature_annotator_ray.functions.codecs import audio_fp64

    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000.0
    clip = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)
    h = audio_fp64(clip)
    assert _ham(h, audio_fp64(clip + rng.normal(0, 0.01, clip.shape))) <= 6
    assert _ham(h, audio_fp64(0.4 * clip)) == 0          # exact gain invariance
    other = 0.5 * np.sin(2 * np.pi * 1313 * t) + 0.3 * np.sin(2 * np.pi * 333 * t)
    assert _ham(h, audio_fp64(other)) >= 8
    assert audio_fp64(np.zeros(16000)) == 0              # silence


def test_audio_fp_stage_and_near_dups(ray_session):
    from biosd_feature_annotator_ray.functions.codecs import wav_encode
    from biosd_feature_annotator_ray.stages.multimodal import (
        AudioFingerprintStage)

    rng = np.random.default_rng(21)
    t = np.arange(8000) / 16000.0
    rows = []
    clips = {}
    for i in range(10):
        f0 = 200.0 * (i + 1) * 1.13
        clip = (0.5 * np.sin(2 * np.pi * f0 * t)
                + 0.2 * np.sin(2 * np.pi * 2.7 * f0 * t))
        clips[i] = clip
        rows.append({"media_id": i, "payload": wav_encode(clip)})
    # planted near-dups: quieter copy of 2, noisy copy of 6
    rows.append({"media_id": 100, "payload": wav_encode(0.3 * clips[2])})
    rows.append({"media_id": 101, "payload": wav_encode(
        clips[6] + rng.normal(0, 0.002, len(t)))})
    rows.append({"media_id": 999, "payload": b"not audio"})

    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    fp = ds.map_batches(AudioFingerprintStage(on_error="skip"),
                        batch_format="pyarrow", concurrency=2)
    pairs = hash_near_dups(fp, hash_col="afp", max_hamming=6, nb=4)
    got = set(map(tuple,
                  pairs.to_pandas()[["id_a", "id_b"]].to_numpy()))
    assert (2, 100) in got and (6, 101) in got
    assert all(999 not in p for p in got)
    fdf = fp.to_pandas().set_index("media_id")["afp"]
    for a, b in got:
        assert _ham(np.uint64(fdf[a]), np.uint64(fdf[b])) <= 6


def test_video_phash_near_dups(ray_session):
    from biosd_feature_annotator_ray.functions.codecs import mpng_encode
    from biosd_feature_annotator_ray.stages.multimodal import VideoPhashStage

    rng = np.random.default_rng(31)
    rows, vids = [], {}
    for i in range(8):
        frames = [rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
                  for _ in range(6)]
        vids[i] = frames
        rows.append({"media_id": i, "payload": mpng_encode(frames)})
    # planted near-dup: video 100 = video 2 with per-frame noise
    noisy = [np.clip(f.astype(int) + rng.integers(-5, 6, f.shape),
                     0, 255).astype(np.uint8) for f in vids[2]]
    rows.append({"media_id": 100, "payload": mpng_encode(noisy)})
    rows.append({"media_id": 999, "payload": b"junk"})

    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    frames = ds.map_batches(VideoPhashStage(on_error="skip"),
                            batch_format="pyarrow", concurrency=2)
    pairs = hash_near_dups(frames, max_hamming=6, nb=4)
    got = set(map(tuple,
                  pairs.to_pandas()[["id_a", "id_b"]].to_numpy()))
    assert (2, 100) in got
    assert all(999 not in p for p in got)


def test_video_phash_mp4_raises(ray_session):
    from biosd_feature_annotator_ray.functions.codecs import write_minimal_mp4
    from biosd_feature_annotator_ray.stages.multimodal import VideoPhashStage

    mp4 = write_minimal_mp4(64, 48, 10)
    ds = rd.from_items([{"media_id": 1, "payload": mp4}])
    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        ds.map_batches(VideoPhashStage(on_error="skip"),
                       batch_format="pyarrow").materialize()
