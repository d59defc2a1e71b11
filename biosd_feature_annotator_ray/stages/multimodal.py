"""Multimodal column plumbing (graft-added training-data ops).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata columns; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages. The decode kernels themselves are
STUBBED (image/audio libraries are not in this container): mode="real"
raises NotImplementedError at the exact integration point; mode="fake"
produces deterministic features from a stable content hash so the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested end-to-end.

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

    Real decode would go through PIL/cv2 in __init__-loaded handles;
    that import point is the only thing to swap at deployment."""

    def __init__(self, mode: str = "fake", payload_col: str = "payload"):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        if mode == "real":
            raise NotImplementedError(
                "image decode requires PIL/opencv — not available in this "
                "container; deploy with mode='real' after installing and "
                "implementing _decode_real()"
            )
        self.mode, self.payload_col = mode, payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.payload_col).to_pylist()
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
    """binary audio column → (duration_s, feature: list<float32>[32])."""

    def __init__(self, mode: str = "fake", payload_col: str = "payload"):
        if mode == "real":
            raise NotImplementedError("audio decode requires soundfile/librosa — stub")
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column(self.payload_col).to_pylist()
        h = _content_hashes(blobs)
        dur = (h % np.uint64(600_000)).astype(np.float64) / 1000.0
        feats = _fake_features(blobs, AUDIO_FEAT_DIM)
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("duration_s", pa.array(dur, pa.float64()))
        return out.append_column(
            "feature", pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), AUDIO_FEAT_DIM)
        )


class VideoFrameSampleStage:
    """binary video column → one row PER SAMPLED FRAME (row-expanding),
    with frame_idx + frame feature."""

    def __init__(self, mode: str = "fake", payload_col: str = "payload", frames_per_video: int = 4):
        if mode == "real":
            raise NotImplementedError("video decode requires ffmpeg bindings — stub")
        self.payload_col = payload_col
        self.frames = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
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


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 1024) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n),
        }
    )
