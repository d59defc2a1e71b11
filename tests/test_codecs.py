"""Pure-python PNG/WAV codecs (functions/codecs.py) — round-trip
identity and real-decode multimodal stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from biosd_feature_annotator_ray.functions.codecs import (
    band_energy_feature,
    is_png,
    is_wav,
    png_decode,
    png_encode,
    rgb_histogram_feature,
    wav_decode,
    wav_encode,
)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    b = png_encode(img)
    assert is_png(b)
    w, h, px = png_decode(b)
    assert (w, h) == (23, 17)
    np.testing.assert_array_equal(px, img)


def test_png_roundtrip_grey():
    img = ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)
    w, h, px = png_decode(png_encode(img))
    assert (w, h) == (8, 8)
    np.testing.assert_array_equal(px[:, :, 0], img)


def test_png_filters_1_and_2():
    """Decode rows written with Sub/Up filters (foreign encoders use
    them even though ours emits filter 0)."""
    import struct
    import zlib

    from biosd_feature_annotator_ray.functions.codecs import PNG_SIG, _chunk

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    rows = []
    for y in range(4):
        raw = img[y].reshape(-1)
        if y % 2 == 0:  # filter 1 (Sub)
            enc = np.diff(raw.reshape(5, 3), axis=0, prepend=np.zeros((1, 3), np.uint8))
            rows.append(b"\x01" + enc.astype(np.uint8).reshape(-1).tobytes())
        else:           # filter 2 (Up)
            enc = raw - img[y - 1].reshape(-1)
            rows.append(b"\x02" + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, 0)
    b = (PNG_SIG + _chunk(b"IHDR", ihdr)
         + _chunk(b"IDAT", zlib.compress(b"".join(rows))) + _chunk(b"IEND", b""))
    w, h, px = png_decode(b)
    np.testing.assert_array_equal(px, img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    assert not is_png(b"JFIF...")


def test_wav_roundtrip():
    t = np.arange(1600) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    b = wav_encode(x, rate=16000)
    assert is_wav(b)
    rate, y = wav_decode(b)
    assert rate == 16000 and y.shape == (1600, 1)
    np.testing.assert_allclose(y[:, 0] / 32767.0, x, atol=1 / 32000)


def test_features_shapes_and_determinism():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    f1, f2 = rgb_histogram_feature(px), rgb_histogram_feature(px)
    assert f1.shape == (64,) and np.allclose(f1.sum(), 1.0)
    np.testing.assert_array_equal(f1, f2)
    s = (rng.standard_normal(3200) * 8000).astype(np.int16).reshape(-1, 1)
    f = band_energy_feature(s)
    assert f.shape == (32,) and np.isclose(np.linalg.norm(f), 1.0)


def test_real_decode_stages(ray_session):
    import ray.data as rd

    from biosd_feature_annotator_ray.stages.multimodal import (
        AudioFeaturizeStage,
        ImageDecodeStage,
        synth_media_table,
    )

    media = rd.from_arrow(synth_media_table(32, kind="png"))
    out = media.map_batches(ImageDecodeStage, fn_constructor_kwargs={"mode": "real"},
                            batch_format="pyarrow", batch_size=16, concurrency=(1, 2)).to_pandas()
    assert len(out) == 32
    assert (out.width.between(4, 32)).all() and (out.height.between(4, 32)).all()

    audio = rd.from_arrow(synth_media_table(32, kind="wav"))
    out2 = audio.map_batches(AudioFeaturizeStage, fn_constructor_kwargs={"mode": "real"},
                             batch_format="pyarrow", batch_size=16, concurrency=(1, 2)).to_pandas()
    assert len(out2) == 32
    assert (out2.duration_s.between(0.04, 0.41)).all()

    # on_error="skip" quarantines non-decodable payloads
    mixed = rd.from_arrow(synth_media_table(16, kind="noise"))
    out3 = mixed.map_batches(
        ImageDecodeStage, fn_constructor_kwargs={"mode": "real", "on_error": "skip"},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 2)).to_pandas()
    assert len(out3) == 0


def test_png_roundtrip_property():
    """Property: encode→decode is identity for arbitrary small images."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1),
           st.booleans())
    def roundtrip(w, h, seed, grey):
        rng = np.random.default_rng(seed)
        shape = (h, w) if grey else (h, w, 3)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        gw, gh, px = png_decode(png_encode(img))
        assert (gw, gh) == (w, h)
        ref = img[:, :, None] if grey else img
        np.testing.assert_array_equal(px, ref)

    roundtrip()


def test_mpng_roundtrip_and_seek():
    import numpy as np

    from biosd_feature_annotator_ray.functions.codecs import (
        is_mpng, mpng_encode, mpng_frame, mpng_index)

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8) for _ in range(5)]
    blob = mpng_encode(frames, fps=12.0)
    assert is_mpng(blob) and not is_mpng(b"nope")
    n, fps, offs = mpng_index(blob)
    assert n == 5 and fps == 12.0 and len(offs) == 6
    for i, f in enumerate(frames):
        w, h, px = mpng_frame(blob, i)
        assert (w, h) == (9, 6)
        assert np.array_equal(px, f)
    import pytest

    with pytest.raises(IndexError):
        mpng_frame(blob, 5)


def test_video_real_stage_samples_and_decodes(ray_session):
    import numpy as np
    import ray.data as rd

    from biosd_feature_annotator_ray.functions.codecs import (
        mpng_frame, mpng_index, rgb_histogram_feature)
    from biosd_feature_annotator_ray.stages.multimodal import (
        VideoFrameSampleStage, synth_media_table)

    media = synth_media_table(24, kind="mpng")
    out = rd.from_arrow(media).map_batches(
        VideoFrameSampleStage, fn_constructor_kwargs={"mode": "real",
                                                      "frames_per_video": 3},
        batch_size=8, batch_format="pyarrow", concurrency=(1, 2),
    ).to_pandas()
    blobs = dict(zip(media.column("media_id").to_pylist(),
                     media.column("payload").to_pylist()))
    for mid, grp in out.groupby("media_id"):
        nf, fps, _ = mpng_index(blobs[mid])
        assert len(grp) == min(3, nf)
        assert grp["duration_s"].iloc[0] == nf / fps
        # sampled frame features equal direct seek-decode of that frame
        row = grp.iloc[0]
        w, h, px = mpng_frame(blobs[mid], int(row["frame_idx"]))
        assert (row["width"], row["height"]) == (w, h)
        assert np.allclose(np.array(row["feature"]), rgb_histogram_feature(px))


def test_video_real_rejects_unknown_container(ray_session):
    import pytest

    from biosd_feature_annotator_ray.stages.multimodal import VideoFrameSampleStage
    import pyarrow as pa

    stage = VideoFrameSampleStage(mode="real")
    batch = pa.table({"media_id": pa.array([0], pa.int64()),
                      "payload": pa.array([b"\x00\x00\x00\x18ftypmp42"], pa.binary())})
    with pytest.raises(NotImplementedError):
        stage(batch)


def test_on_error_skip_quarantines_corrupt_payloads(ray_session):
    """Regression: on_error='skip' only guarded the magic-byte check —
    a payload with valid magic but corrupt body killed the task."""
    import numpy as np
    import pyarrow as pa

    from biosd_feature_annotator_ray.functions.codecs import png_encode, wav_encode
    from biosd_feature_annotator_ray.stages.multimodal import (
        AudioFeaturizeStage, ImageDecodeStage)

    good_png = png_encode(np.zeros((4, 4, 3), dtype=np.uint8))
    corrupt_png = good_png[:20] + b"\x00" * 8          # valid magic, broken body
    batch = pa.table({"media_id": pa.array([0, 1], pa.int64()),
                      "payload": pa.array([good_png, corrupt_png], pa.binary())})
    out = ImageDecodeStage(mode="real", on_error="skip")(batch)
    assert out.column("media_id").to_pylist() == [0]
    import pytest
    with pytest.raises(ValueError):
        ImageDecodeStage(mode="real", on_error="raise")(batch)

    good_wav = wav_encode(np.zeros(100))
    corrupt_wav = good_wav[:16]                        # valid magic, truncated
    batch_a = pa.table({"media_id": pa.array([0, 1], pa.int64()),
                        "payload": pa.array([good_wav, corrupt_wav], pa.binary())})
    out_a = AudioFeaturizeStage(mode="real", on_error="skip")(batch_a)
    assert out_a.column("media_id").to_pylist() == [0]


def test_mp4_box_parser_roundtrip():
    from biosd_feature_annotator_ray.functions.codecs import (
        is_mp4, mp4_parse_meta, write_minimal_mp4)

    b = write_minimal_mp4(1280, 720, 120, fps=30.0,
                          keyframes=[0, 30, 60, 90])
    assert is_mp4(b)
    m = mp4_parse_meta(b)
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["n_samples"] == 120 and m["codec"] == "avc1"
    assert m["keyframes"] == [0, 30, 60, 90]
    assert abs(m["duration_s"] - 4.0) < 0.01
    # no stss box -> every sample is a sync sample
    m2 = mp4_parse_meta(write_minimal_mp4(64, 48, 5, fps=5.0))
    assert m2["keyframes"] == [0, 1, 2, 3, 4]


def test_mp4_parser_rejects_garbage_and_fragmented():
    import struct

    import pytest

    from biosd_feature_annotator_ray.functions.codecs import (
        _box, mp4_parse_meta, write_minimal_mp4)

    with pytest.raises(ValueError):
        mp4_parse_meta(b"\x00" * 64)
    # truncated box claims a size past EOF
    b = write_minimal_mp4(32, 32, 2)
    with pytest.raises(ValueError):
        mp4_parse_meta(b[: len(b) // 2])
    # fragmented files raise NotImplementedError (sample tables live
    # per-fragment)
    frag = b + _box(b"moof", _box(b"mfhd", bytes(8)))
    with pytest.raises(NotImplementedError):
        mp4_parse_meta(frag)


def test_mp4_meta_stage_dirty_column(ray_session):
    import pandas as pd
    import ray.data as rd

    from biosd_feature_annotator_ray.functions.codecs import write_minimal_mp4
    from biosd_feature_annotator_ray.stages.multimodal import Mp4MetaStage

    rows = pd.DataFrame({
        "media_id": [0, 1, 2],
        "payload": [write_minimal_mp4(320, 240, 10, keyframes=[0, 5]),
                    b"not an mp4 at all",
                    write_minimal_mp4(640, 480, 4)],
    })
    out = (rd.from_pandas(rows)
           .map_batches(Mp4MetaStage, batch_format="pyarrow",
                        batch_size=64, concurrency=1)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out.loc[0, "width"] == 320 and out.loc[0, "n_keyframes"] == 2
    assert pd.isna(out.loc[1, "width"]) and "ValueError" in out.loc[1, "mp4_error"]
    assert out.loc[2, "height"] == 480 and out.loc[2, "keyframes"] == "0,1,2,3"
    assert out.loc[0, "mp4_error"] is None or pd.isna(out.loc[0, "mp4_error"])


def test_sniff_mime_magic_table():
    import pyarrow as pa

    from biosd_feature_annotator_ray.functions.codecs import sniff_mime

    vals = [b"\x89PNG\r\n\x1a\npayload", b"\x89PNG\r\n\x1a\x08xx",
            b"\xff\xd8\xffrest", b"GIF87a;;", b"GIF89a;;", b"%PDF-1.7",
            b"PK\x03\x04zip", b"\x1f\x8bgz", b"xxxxftypisom",
            b"RIFF1234WAVEfmt", b"RIFF1234WEBPVP8", b"RIFF1234AVI ",
            b"", b"\x89P", None]
    got = sniff_mime(pa.array(vals, pa.binary())).to_pylist()
    assert got == [
        "image/png", "application/octet-stream", "image/jpeg",
        "image/gif", "image/gif", "application/pdf",
        "application/zip", "application/gzip", "video/mp4",
        "audio/wav", "image/webp", "application/octet-stream",
        "application/octet-stream", "application/octet-stream", None]
