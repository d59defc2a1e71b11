"""Multimodal column plumbing (graft-added training-data ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages.

Decode status (round-1 verdict: make decode real where possible):

- **image, mode="real"**: REAL PNG decode (pure stdlib zlib + filter
  reconstruction, ``functions/codecs.py``) → true width/height + a
  4×4×4 color-histogram feature. JPEG needs a real library → raises.
- **audio, mode="real"**: REAL PCM16 WAV decode → true duration + a
  32-band log-energy spectrum (numpy rfft).
- **video, mode="real"**: REAL frame sampling over the MPNG container
  (indexed PNG frames, ``functions/codecs.py``) — evenly-spaced frames
  are seeked via the offset table and ONLY those are decoded (true
  dims + per-frame color histogram + duration from the fps header).
  Codec-library formats (mp4/h264): the BOX STRUCTURE is parsed for
  real (``Mp4MetaStage`` — duration, dimensions, codec, sample count,
  keyframe map from stss; the planner input for sampled decode), but
  pixel decode still needs ffmpeg and raises.
- mode="fake" (compat/testing): deterministic features from a stable
  content hash — exercises the Ray-side plumbing for any payload.

Batch-size guidance (SURVEY.md memory-aware rule): large binary
payloads need SMALL batches — size batch_size so
batch_size × payload × concurrency fits the worker heap; these stages
default to 64 rows/batch for MB-scale payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

IMAGE_FEAT_DIM = 64
AUDIO_FEAT_DIM = 32


def _content_hashes(blobs: list[bytes | None]) -> np.ndarray:
    s = pd.Series([b if b is not None else b"" for b in blobs])
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def _fake_features(blobs: list[bytes | None], dim: int) -> np.ndarray:
    """Deterministic per-payload feature vector: seeded by content hash."""
    h = _content_hashes(blobs)
    out = np.empty((len(blobs), dim), dtype=np.float32)
    for i, seed in enumerate(h):
        out[i] = np.random.default_rng(int(seed)).standard_normal(dim).astype(np.float32)
    return out


class ImageDecodeStage:
    """binary image column → (width, height, feature: list<float32>[64]).

    mode="real": PNG payloads are ACTUALLY decoded (pure-python codec —
    true dimensions, color-histogram feature). ``on_error`` governs
    non-PNG payloads: "raise" (default) or "skip" (drop the row — the
    quarantine pattern for dirty web corpora). JPEG would slot into the
    same branch once a real library is deployable."""

    def __init__(self, mode: str = "fake", payload_col: str = "payload",
                 on_error: str = "raise"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.mode, self.payload_col, self.on_error = mode, payload_col, on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.payload_col).to_pylist()
        if self.mode == "real":
            from ..functions.codecs import is_png, png_decode, rgb_histogram_feature

            keep, ws, hs, feats = [], [], [], []
            for i, b in enumerate(blobs):
                if not is_png(b):
                    if self.on_error == "raise":
                        raise ValueError(
                            f"row {i}: not a PNG payload (JPEG/other formats "
                            "need an image library — deploy and extend here)")
                    continue
                try:
                    w, h, px = png_decode(b)
                except ValueError:
                    # quarantine covers DECODE failures too (truncated
                    # IDAT, unsupported variants), not just bad magic
                    if self.on_error == "raise":
                        raise
                    continue
                keep.append(i)
                ws.append(w)
                hs.append(h)
                feats.append(rgb_histogram_feature(px))
            out = batch.drop_columns([self.payload_col]).take(pa.array(keep, pa.int64()))
            f = np.stack(feats).astype(np.float32) if feats else np.zeros((0, IMAGE_FEAT_DIM), np.float32)
            out = out.append_column("width", pa.array(np.array(ws, np.int32)))
            out = out.append_column("height", pa.array(np.array(hs, np.int32)))
            return out.append_column(
                "feature", pa.FixedSizeListArray.from_arrays(pa.array(f.reshape(-1)), IMAGE_FEAT_DIM)
            )
        h = _content_hashes(blobs)
        feats = _fake_features(blobs, IMAGE_FEAT_DIM)
        # fake dims derived deterministically from the content hash
        w = (h % np.uint64(1920)).astype(np.int32) + 1
        hh = (h % np.uint64(1080)).astype(np.int32) + 1
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(w))
        out = out.append_column("height", pa.array(hh))
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), IMAGE_FEAT_DIM)
        )


class AudioFeaturizeStage:
    """binary audio column → (duration_s, feature: list<float32>[32]).

    mode="real": PCM16 WAV payloads are ACTUALLY decoded (pure-python
    RIFF parse) — true duration + 32-band log-energy spectrum. Other
    codecs (mp3/ogg) need a real library; ``on_error`` as in
    ImageDecodeStage."""

    def __init__(self, mode: str = "fake", payload_col: str = "payload",
                 on_error: str = "raise"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode, self.payload_col, self.on_error = mode, payload_col, on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.payload_col).to_pylist()
        if self.mode == "real":
            from ..functions.codecs import band_energy_feature, is_wav, wav_decode

            keep, durs, feats = [], [], []
            for i, b in enumerate(blobs):
                if not is_wav(b):
                    if self.on_error == "raise":
                        raise ValueError(f"row {i}: not a WAV payload")
                    continue
                try:
                    rate, x = wav_decode(b)
                except ValueError:
                    if self.on_error == "raise":
                        raise
                    continue
                keep.append(i)
                durs.append(len(x) / rate)
                feats.append(band_energy_feature(x))
            out = batch.drop_columns([self.payload_col]).take(pa.array(keep, pa.int64()))
            f = np.stack(feats).astype(np.float32) if feats else np.zeros((0, AUDIO_FEAT_DIM), np.float32)
            out = out.append_column("duration_s", pa.array(np.array(durs, np.float64)))
            return out.append_column(
                "feature", pa.FixedSizeListArray.from_arrays(pa.array(f.reshape(-1)), AUDIO_FEAT_DIM)
            )
        h = _content_hashes(blobs)
        dur = (h % np.uint64(600_000)).astype(np.float64) / 1000.0
        feats = _fake_features(blobs, AUDIO_FEAT_DIM)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("duration_s", pa.array(dur, pa.float64()))
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), AUDIO_FEAT_DIM)
        )


class Mp4MetaStage:
    """binary mp4 column → real container metadata (width, height,
    duration_s, codec, n_samples, n_keyframes, keyframes CSV) from a
    pure-python ISO-BMFF box walk — NO decode, no ffmpeg: the planning
    stage that decides which sync samples a (future) decode stage would
    seek to. Invalid/fragmented payloads yield nulls + an mp4_error
    column rather than failing the batch (a crawl's media column is
    dirty by nature)."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import mp4_parse_meta

        blobs = batch.column(self.payload_col).to_pylist()
        n = len(blobs)
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        dur = np.full(n, np.nan)
        ns = np.zeros(n, np.int32)
        nk = np.zeros(n, np.int32)
        codec = [None] * n
        kf: list = [None] * n
        err: list = [None] * n
        bad = np.zeros(n, dtype=bool)
        for i, b in enumerate(blobs):
            try:
                m = mp4_parse_meta(b)
                w[i], h[i] = m["width"], m["height"]
                dur[i] = m["duration_s"]
                ns[i], nk[i] = m["n_samples"], len(m["keyframes"])
                codec[i] = m["codec"]
                # comma-joined string, not list<int32>: Ray's tensor-
                # extension casting rejects ragged lists with nulls,
                # and a string keyframe map is parquet/oracle-friendly
                kf[i] = ",".join(map(str, m["keyframes"]))
            except Exception as ex:
                bad[i] = True
                err[i] = f"{type(ex).__name__}: {ex}"
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("width", pa.array(w, pa.int32(), mask=bad))
        out = out.append_column("height", pa.array(h, pa.int32(), mask=bad))
        out = out.append_column("duration_s",
                                pa.array(dur, pa.float64(), mask=bad))
        out = out.append_column("codec", pa.array(codec, pa.string()))
        out = out.append_column("n_samples",
                                pa.array(ns, pa.int32(), mask=bad))
        out = out.append_column("n_keyframes",
                                pa.array(nk, pa.int32(), mask=bad))
        out = out.append_column("keyframes", pa.array(kf, pa.string()))
        return out.append_column("mp4_error", pa.array(err, pa.string()))


class VideoFrameSampleStage:
    """binary video column → one row PER SAMPLED FRAME (row-expanding),
    with frame_idx + frame feature."""

    def __init__(self, mode: str = "fake", payload_col: str = "payload", frames_per_video: int = 4):
        self.mode = mode
        self.payload_col = payload_col
        self.frames = frames_per_video

    def _call_real(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import is_mpng, mpng_frame, mpng_index, rgb_histogram_feature

        blobs = batch.column(self.payload_col).to_pylist()
        take_idx, frame_idx, feats, ws, hs, durs = [], [], [], [], [], []
        for row, b in enumerate(blobs):
            if not is_mpng(b):
                raise NotImplementedError(
                    "only the MPNG container decodes without ffmpeg — "
                    "mp4/h264 need real codec bindings")
            nf, fps, _ = mpng_index(b)
            if nf == 0:
                continue
            # evenly-spaced sample; the seek table means un-sampled
            # frames are never decoded
            sample = np.unique(np.linspace(0, nf - 1, min(self.frames, nf)).astype(np.int64))
            for fi in sample:
                w, h, px = mpng_frame(b, int(fi))
                take_idx.append(row)
                frame_idx.append(int(fi))
                feats.append(rgb_histogram_feature(px))
                ws.append(w); hs.append(h)
                durs.append(nf / fps if fps > 0 else float("nan"))
        base = batch.drop_columns([self.payload_col]).take(pa.array(take_idx, pa.int64()))
        base = base.append_column("frame_idx", pa.array(np.array(frame_idx, np.int32)))
        base = base.append_column("width", pa.array(np.array(ws, np.int32)))
        base = base.append_column("height", pa.array(np.array(hs, np.int32)))
        base = base.append_column("duration_s", pa.array(np.array(durs, np.float64)))
        f = (np.stack(feats).astype(np.float32) if feats
             else np.empty((0, IMAGE_FEAT_DIM), np.float32))
        return base.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(pa.array(f.reshape(-1)), IMAGE_FEAT_DIM)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "real":
            return self._call_real(batch)
        blobs = batch.column(self.payload_col).to_pylist()
        n = len(blobs)
        idx = pa.array(np.repeat(np.arange(n), self.frames))
        base = batch.drop_columns([self.payload_col]).take(idx)
        frame_idx = np.tile(np.arange(self.frames, dtype=np.int32), n)
        # deterministic per-(video, frame) feature
        h = np.repeat(_content_hashes(blobs), self.frames) + frame_idx.astype(np.uint64)
        feats = np.empty((n * self.frames, IMAGE_FEAT_DIM), dtype=np.float32)
        for i, seed in enumerate(h):
            feats[i] = np.random.default_rng(int(seed)).standard_normal(IMAGE_FEAT_DIM).astype(np.float32)
        base = base.append_column("frame_idx", pa.array(frame_idx))
        return base.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), IMAGE_FEAT_DIM)
        )


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 1024,
                      kind: str = "noise") -> pa.Table:
    """Deterministic media table for tests/benches. kind="noise" →
    opaque bytes (fake-mode plumbing); "png" → REAL variable-size PNG
    images; "wav" → REAL PCM16 sine-mix clips; "mpng" → REAL indexed
    PNG-frame video containers."""
    rng = np.random.default_rng(seed)
    if kind == "noise":
        payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                    for _ in range(n)]
        mime = "application/octet-stream"
    elif kind == "png":
        from ..functions.codecs import png_encode

        payloads = []
        for _ in range(n):
            w, h = int(rng.integers(4, 33)), int(rng.integers(4, 33))
            payloads.append(png_encode(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)))
        mime = "image/png"
    elif kind == "wav":
        from ..functions.codecs import wav_encode

        payloads = []
        for _ in range(n):
            dur = rng.uniform(0.05, 0.4)
            t = np.arange(int(16000 * dur)) / 16000.0
            f0 = rng.uniform(100, 4000)
            payloads.append(wav_encode(0.5 * np.sin(2 * np.pi * f0 * t)
                                       + 0.2 * np.sin(2 * np.pi * 2 * f0 * t)))
        mime = "audio/wav"
    elif kind == "mpng":
        from ..functions.codecs import mpng_encode

        payloads = []
        for _ in range(n):
            nf = int(rng.integers(3, 13))
            w, h = int(rng.integers(4, 17)), int(rng.integers(4, 17))
            frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                      for _ in range(nf)]
            payloads.append(mpng_encode(frames, fps=float(rng.integers(4, 25))))
        mime = "video/x-mpng"
    else:
        raise ValueError(kind)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mime] * n),
        }
    )


class ImagePhashStage:
    """binary PNG column → 64-bit perceptual hash (pHash: DCT
    low-frequency signs) per image, for corpus-level image dedup via
    ``stages.dedup.hash_near_dups``. ``on_error``: "raise" (default)
    or "skip" (quarantine dirty rows). Output: the non-payload columns
    + ``phash`` (int64 bit-pattern)."""

    def __init__(self, payload_col: str = "payload",
                 on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.payload_col, self.on_error = payload_col, on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import is_png, phash64, png_decode

        blobs = batch.column(self.payload_col).to_pylist()
        keep, hashes = [], []
        for i, b in enumerate(blobs):
            if not is_png(b):
                if self.on_error == "raise":
                    raise ValueError(f"row {i}: not a PNG payload")
                continue
            try:
                _, _, px = png_decode(b)
            except ValueError:
                if self.on_error == "raise":
                    raise
                continue
            keep.append(i)
            hashes.append(phash64(px))
        out = batch.drop_columns([self.payload_col]).take(
            pa.array(keep, pa.int64()))
        h = (np.array(hashes, np.uint64) if hashes
             else np.empty(0, np.uint64))
        return out.append_column("phash", pa.array(h.view(np.int64)))


class AudioFingerprintStage:
    """binary PCM16-WAV column → 64-bit spectral fingerprint per clip
    (Haitsma–Kalker-style double-difference sign bits; gain-invariant,
    noise-tolerant) for corpus-level audio dedup via
    ``stages.dedup.hash_near_dups``. ``on_error``: "raise" | "skip"."""

    def __init__(self, payload_col: str = "payload",
                 on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.payload_col, self.on_error = payload_col, on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import audio_fp64, is_wav, wav_decode

        blobs = batch.column(self.payload_col).to_pylist()
        keep, fps = [], []
        for i, b in enumerate(blobs):
            if not is_wav(b):
                if self.on_error == "raise":
                    raise ValueError(f"row {i}: not a WAV payload")
                continue
            try:
                rate, samples = wav_decode(b)
            except ValueError:
                if self.on_error == "raise":
                    raise
                continue
            keep.append(i)
            fps.append(audio_fp64(samples, rate))
        out = batch.drop_columns([self.payload_col]).take(
            pa.array(keep, pa.int64()))
        h = (np.array(fps, np.uint64) if fps else np.empty(0, np.uint64))
        return out.append_column("afp", pa.array(h.view(np.int64)))


class VideoPhashStage:
    """binary MPNG video column → one row PER SAMPLED FRAME with the
    frame's 64-bit perceptual hash — the video near-dup primitive:
    feed the frame rows to ``stages.dedup.hash_near_dups`` (pairs
    dedup across frames, so two videos sharing ANY near-identical
    sampled frame pair up). The seek table means un-sampled frames
    never decode. ``on_error``: "raise" | "skip" (mp4/h264 payloads
    always raise NotImplementedError — no ffmpeg here)."""

    def __init__(self, payload_col: str = "payload",
                 frames_per_video: int = 4, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError(on_error)
        self.payload_col = payload_col
        self.frames = frames_per_video
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import (
            is_mp4, is_mpng, mpng_frame, mpng_index, phash64)

        blobs = batch.column(self.payload_col).to_pylist()
        take_idx, frame_idx, hashes = [], [], []
        for row, b in enumerate(blobs):
            if is_mp4(b):
                raise NotImplementedError(
                    "mp4/h264 frame decode needs real codec bindings "
                    "(mp4_parse_meta reads its metadata; pixels do not "
                    "decode without ffmpeg)")
            if not is_mpng(b):
                if self.on_error == "raise":
                    raise ValueError(f"row {row}: not an MPNG payload")
                continue
            nf, _fps, _ = mpng_index(b)
            if nf == 0:
                continue
            sample = np.unique(np.linspace(
                0, nf - 1, min(self.frames, nf)).astype(np.int64))
            for fi in sample:
                _, _, px = mpng_frame(b, int(fi))
                take_idx.append(row)
                frame_idx.append(int(fi))
                hashes.append(phash64(px))
        base = batch.drop_columns([self.payload_col]).take(
            pa.array(take_idx, pa.int64()))
        base = base.append_column(
            "frame_idx", pa.array(np.array(frame_idx, np.int32)))
        h = (np.array(hashes, np.uint64) if hashes
             else np.empty(0, np.uint64))
        return base.append_column("phash", pa.array(h.view(np.int64)))
