"""Multimodal column handling (north-rule training-data ops).

Media travel as opaque `binary` columns with typed metadata. The decode /
feature-extract / resize / frame-sample stages are actor-pool `map_batches`
stages: decoder "models" load once per actor in __init__, work happens per
batch in __call__, and batch sizes are kept small because payload bytes
dominate memory.

The image/audio codec libraries are NOT in this container, so the actual
decode is STUBBED: with fake=True (default) a deterministic pseudo-decode
derived from the payload hash exercises the full Ray-side plumbing (schema,
batching, actor lifecycle, output layout); with fake=False the stage raises
NotImplementedError at actor construction, which is the documented contract
for environments without codecs."""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.string()),            # JSON sidecar metadata
])


def make_fake_media_dataset(n: int = 64, seed: int = 42,
                            media_type: str = "image"):
    """Deterministic synthetic media table for tests/benchmarks."""
    import ray.data

    rows = []
    for i in range(n):
        payload = hashlib.blake2b(
            f"{seed}|{media_type}|{i}".encode(), digest_size=32).digest() * 8
        rows.append({
            "media_id": i,
            "media_type": media_type,
            "payload": payload,
            "meta": json.dumps({"source": f"s{i % 4}", "codec": "fake"}),
        })
    return ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                    schema=MEDIA_SCHEMA))


def _codec_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class DecodeImage:
    """payload binary → (media_id, height, width, channels, features[32]).

    Actor-pool stage: construct with
        ds.map_batches(DecodeImage, fn_constructor_kwargs={"fake": True},
                       concurrency=N, batch_size=B)
    """

    def __init__(self, fake: bool = True, feature_dim: int = 32):
        if not fake and not _codec_available():
            raise NotImplementedError(
                "real image decode requires pillow, which is not available "
                "in this container; run with fake=True for the "
                "deterministic stub")
        self.fake = fake
        self.feature_dim = feature_dim

    def _decode_one(self, payload: bytes):
        h = hashlib.blake2b(payload, digest_size=16).digest()
        height = 64 + h[0] % 192
        width = 64 + h[1] % 192
        arr = np.frombuffer(payload, np.uint8)
        hist = np.bincount(arr % self.feature_dim,
                           minlength=self.feature_dim).astype(np.float64)
        feats = hist / max(hist.sum(), 1.0)
        return height, width, 3, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ws, cs, fs = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            h, w, c, f = self._decode_one(payload)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            fs.append(f.tolist())
        return pa.table({
            "media_id": batch.column("media_id"),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "features": pa.array(fs, pa.list_(pa.float64())),
        })


class ResizeImage:
    """(decoded) → target dims; stub computes the output geometry only."""

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.drop_columns(
            [c for c in ("height", "width") if c in batch.column_names]
        ).append_column(
            "height", pa.array([self.target[0]] * n, pa.int32())
        ).append_column(
            "width", pa.array([self.target[1]] * n, pa.int32()))


class SampleFrames:
    """video payload → one row per sampled frame (deterministic offsets)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real video decode is unavailable in this container")
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            step = max(1, len(payload) // self.n_frames)
            for i in range(self.n_frames):
                mids.append(mid)
                fidx.append(i)
                frames.append(payload[i * step:(i + 1) * step])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


class AudioFeatures:
    """audio payload → fixed-size feature vector (stubbed energy bands)."""

    def __init__(self, n_bands: int = 16, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real audio decode is unavailable in this container")
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload, np.uint8).astype(np.float64)
            pad = (-len(arr)) % self.n_bands
            if pad:
                arr = np.pad(arr, (0, pad))
            bands = arr.reshape(self.n_bands, -1).mean(axis=1)
            feats.append((bands / max(bands.max(), 1.0)).tolist())
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.array(feats, pa.list_(pa.float64())),
        })


def decode_images(media_ds, concurrency: int = 2, batch_size: int = 16,
                  fake: bool = True):
    """Dataset-level wrapper for the DecodeImage actor pool."""
    return media_ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
