"""Multimodal column handling (north-rule training-data ops).

Media travel as opaque `binary` columns with typed metadata. The decode /
feature-extract / resize / frame-sample stages are actor-pool `map_batches`
stages: decoder state loads once per actor in __init__, work happens per
batch in __call__, and batch sizes are kept small because payload bytes
dominate memory.

Decode is REAL for container-free public formats that need only the
standard library and numpy:

- images: PNM family — P5 (binary greyscale) / P6 (binary RGB) with
  maxval <= 255, including `#` header comments;
- audio: RIFF/WAVE PCM via the stdlib `wave` module (8/16-bit, any
  channel count);
- video: YUV4MPEG2 (`.y4m`) with C420*/C444/Cmono colourspaces —
  header parse + exact per-frame byte slicing.

Formats that require codec libraries absent from this container (JPEG,
PNG, MP3, H.264, ...) raise NotImplementedError at decode time with the
payload magic in the message — the documented contract. The legacy
`fake=True` pseudo-decode (hash-derived geometry) is retained for
plumbing tests and environments with no media at all.

Per-payload iteration is inherent to variable-length binary decoding;
all inner work (plane slicing, resampling, histogram / band-energy
features) is vectorized numpy.
"""

from __future__ import annotations

import hashlib
import io
import json
import wave

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.string()),            # JSON sidecar metadata
])


# ---------------------------------------------------------------------------
# Pure-numpy / stdlib codecs for public container-free formats
# ---------------------------------------------------------------------------

def encode_pnm(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) -> P5 or (h, w, 3) -> P6, maxval 255."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_pnm(payload: bytes) -> np.ndarray:
    """P5/P6 bytes -> uint8 array (h, w) or (h, w, 3).

    Handles `#` comments and arbitrary whitespace in the header, per the
    public netpbm spec. Raises ValueError on malformed input.
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM payload (magic {magic!r})")
    # Tokenize the header: need 3 integers (w, h, maxval) after the magic.
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            nl = payload.index(b"\n", pos)
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and payload[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PNM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header from raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(payload, np.uint8, count=h * w * ch, offset=pos)
    return raster.reshape((h, w, 3) if ch == 3 else (h, w))


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 array (n,) or (n, channels) -> PCM WAV bytes (stdlib wave)."""
    samples = np.asarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def decode_wav_raw(payload: bytes) -> tuple[np.ndarray, int, int]:
    """PCM WAV bytes -> (raw integer samples (n,) or (n, ch), sample
    width in bytes, sample_rate) — the exact stored integers, no float
    normalization (audio_energy's exact-int protocol needs them)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(f"not a WAV payload (magic {payload[:4]!r})")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        ch, sw, rate = (wf.getnchannels(), wf.getsampwidth(),
                        wf.getframerate())
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, np.int16)
    elif sw == 1:  # 8-bit WAV is unsigned per the spec
        arr = np.frombuffer(raw, np.uint8)
    else:
        raise NotImplementedError(f"{8 * sw}-bit PCM not supported")
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, sw, rate


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float64 mono samples in [-1, 1], sample_rate)."""
    arr, sw, rate = decode_wav_raw(payload)
    if sw == 2:
        out = arr.astype(np.float64) / 32768.0
    else:
        out = (arr.astype(np.float64) - 128.0) / 128.0
    if out.ndim > 1:
        out = out.mean(axis=1)
    return out, rate


_Y4M_FRAME_SIZES = {
    "mono": lambda w, h: w * h,
    "444": lambda w, h: 3 * w * h,
    "420": lambda w, h: w * h + 2 * ((w // 2) * (h // 2)),
}


def encode_y4m(frames: list[np.ndarray], fps: int = 30) -> bytes:
    """List of uint8 (h, w) greyscale frames -> YUV4MPEG2 Cmono bytes."""
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()]
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(fr, dtype=np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """YUV4MPEG2 bytes -> (width, height, colourspace, [frame bytes]).

    Supports C420 variants (420, 420jpeg, 420mpeg2, 420paldv — identical
    plane layout), C444 and Cmono. Frame headers may carry parameters
    (`FRAME <params>\\n`); only the frame payload bytes are returned.
    """
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError(f"not a y4m payload (magic {payload[:9]!r})")
    nl = payload.index(b"\n")
    w = h = None
    cspace = "420"
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:].decode()
            cspace = "420" if cs.startswith("420") else cs
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if cspace not in _Y4M_FRAME_SIZES:
        raise NotImplementedError(f"y4m colourspace C{cspace} not supported")
    fsize = _Y4M_FRAME_SIZES[cspace](w, h)
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt y4m frame header")
        fnl = payload.index(b"\n", pos)
        frames.append(payload[fnl + 1:fnl + 1 + fsize])
        pos = fnl + 1 + fsize
    return w, h, cspace, frames


# ---------------------------------------------------------------------------
# Deterministic synthetic media corpora (tests / benchmarks; no external data)
# ---------------------------------------------------------------------------

def _image_dims(i: int) -> tuple[int, int]:
    """Closed-form per-id geometry — lets a SQL oracle recompute dims."""
    return 16 + (i * 7) % 48, 16 + (i * 5) % 40  # (height, width)


def make_real_media_dataset(n: int = 64, seed: int = 42,
                            media_type: str = "image"):
    """Deterministic table of genuinely decodable payloads.

    images: P6 PPM gradient+noise; audio: 16-bit PCM WAV sine sweeps;
    video: Cmono y4m with a moving gradient. Geometry/frequency follow
    closed-form functions of (seed, i) so independent oracles can verify
    the decoded metadata without re-running the decoder.
    """
    import ray.data

    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 100_003 + i)
        if media_type == "image":
            h, w = _image_dims(i)
            grad = (np.arange(h)[:, None] + np.arange(w)[None, :])
            base = (grad * 255 // max(h + w - 2, 1)).astype(np.uint8)
            img = np.stack([base, base[::-1],
                            (base.astype(np.int64) + 64) % 256], axis=2)
            img = (img.astype(np.int64)
                   + rng.integers(0, 8, img.shape)).clip(0, 255)
            payload = encode_pnm(img.astype(np.uint8))
            meta = {"codec": "ppm", "height": h, "width": w}
        elif media_type == "audio":
            rate, dur = 8000, 0.05 + 0.01 * (i % 5)
            t = np.arange(int(rate * dur)) / rate
            freq = 200.0 + 40.0 * i
            sig = np.sin(2 * np.pi * freq * t) * 0.5
            payload = encode_wav((sig * 32767).astype(np.int16), rate)
            meta = {"codec": "wav", "rate": rate, "freq": freq}
        elif media_type == "video":
            h, w, nf = 16 + (i % 3) * 8, 16, 4 + i % 3
            frames = [((np.arange(h)[:, None] * 3 + np.arange(w)[None, :]
                        + 11 * f) % 256).astype(np.uint8)
                      for f in range(nf)]
            payload = encode_y4m(frames)
            meta = {"codec": "y4m", "n_frames": nf, "height": h, "width": w}
        else:
            raise ValueError(media_type)
        rows.append({"media_id": i, "media_type": media_type,
                     "payload": payload, "meta": json.dumps(meta)})
    return ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                    schema=MEDIA_SCHEMA))


def make_fake_media_dataset(n: int = 64, seed: int = 42,
                            media_type: str = "image"):
    """Deterministic opaque-bytes media table (plumbing tests only)."""
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


# ---------------------------------------------------------------------------
# Actor-pool stages
# ---------------------------------------------------------------------------

class DecodeImage:
    """payload binary → (media_id, height, width, channels, features[32]).

    Actor-pool stage:
        ds.map_batches(DecodeImage, fn_constructor_kwargs={"fake": False},
                       concurrency=N, batch_size=B)

    fake=False decodes PNM (P5/P6) payloads with the pure-numpy codec and
    falls back to pillow for other formats when available; an unsupported
    magic without pillow raises NotImplementedError naming the magic.
    Features are the 32-bin normalized intensity histogram of the real
    pixels. emit_pixels=True additionally carries the raw decoded raster
    (`pixels` binary column) for a downstream ResizeImage stage.

    fake=True keeps the legacy hash-derived pseudo-decode for opaque test
    payloads (geometry from the payload hash, byte-histogram features).
    """

    def __init__(self, fake: bool = True, feature_dim: int = 32,
                 emit_pixels: bool = False):
        self.fake = fake
        self.feature_dim = feature_dim
        self.emit_pixels = emit_pixels
        self.have_pil = _codec_available()
        if emit_pixels and fake:
            raise ValueError("emit_pixels requires fake=False")

    def _decode_fake(self, payload: bytes):
        h = hashlib.blake2b(payload, digest_size=16).digest()
        height = 64 + h[0] % 192
        width = 64 + h[1] % 192
        arr = np.frombuffer(payload, np.uint8)
        hist = np.bincount(arr % self.feature_dim,
                           minlength=self.feature_dim).astype(np.float64)
        feats = hist / max(hist.sum(), 1.0)
        return height, width, 3, feats, b""

    def _decode_real(self, payload: bytes):
        magic = payload[:2]
        if magic in (b"P5", b"P6"):
            img = decode_pnm(payload)
        elif self.have_pil:
            from PIL import Image

            img = np.asarray(Image.open(io.BytesIO(payload)))
        else:
            raise NotImplementedError(
                f"image payload with magic {magic!r} requires a codec "
                "library (pillow) that is not available in this container; "
                "only PNM (P5/P6) decodes without codecs")
        ch = 1 if img.ndim == 2 else img.shape[2]
        bins = (img.reshape(-1).astype(np.int64)
                * self.feature_dim) >> 8  # 256 / feature_dim buckets
        hist = np.bincount(bins, minlength=self.feature_dim).astype(
            np.float64)
        feats = hist / max(hist.sum(), 1.0)
        return (img.shape[0], img.shape[1], ch, feats,
                np.ascontiguousarray(img).tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        hs, ws, cs, fs, px = [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            h, w, c, f, p = decode(payload)
            hs.append(h)
            ws.append(w)
            cs.append(c)
            fs.append(f.tolist())
            px.append(p)
        cols = {
            "media_id": batch.column("media_id"),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "channels": pa.array(cs, pa.int32()),
            "features": pa.array(fs, pa.list_(pa.float64())),
        }
        if self.emit_pixels:
            cols["pixels"] = pa.array(px, pa.binary())
        return pa.table(cols)


class ResizeImage:
    """Resize decoded rasters to a fixed target geometry.

    With a `pixels` column (DecodeImage(emit_pixels=True)) this performs a
    real vectorized nearest-neighbour resample of every raster and emits
    the resized bytes. Without one (legacy fake-decode path) it rewrites
    the output geometry only.
    """

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, tw = self.target
        n = batch.num_rows
        if "pixels" not in batch.column_names:
            return batch.drop_columns(
                [c for c in ("height", "width") if c in batch.column_names]
            ).append_column(
                "height", pa.array([th] * n, pa.int32())
            ).append_column(
                "width", pa.array([tw] * n, pa.int32()))
        hs = batch.column("height").to_numpy()
        ws = batch.column("width").to_numpy()
        chans = batch.column("channels").to_numpy()
        out_px = []
        for h, w, c, p in zip(hs, ws, chans,
                              batch.column("pixels").to_pylist()):
            arr = np.frombuffer(p, np.uint8).reshape(
                (h, w) if c == 1 else (h, w, c))
            ri = (np.arange(th) * h) // th
            ci = (np.arange(tw) * w) // tw
            out_px.append(np.ascontiguousarray(arr[ri][:, ci]).tobytes())
        keep = [c for c in batch.column_names
                if c not in ("height", "width", "pixels")]
        cols = {c: batch.column(c) for c in keep}
        cols["height"] = pa.array([th] * n, pa.int32())
        cols["width"] = pa.array([tw] * n, pa.int32())
        cols["pixels"] = pa.array(out_px, pa.binary())
        return pa.table(cols)


class SampleFrames:
    """video payload → one row per sampled frame.

    fake=False parses YUV4MPEG2 payloads and emits exact frame bytes for
    n_frames evenly-spaced frame indices (deterministic: index k samples
    frame (k * total) // n_frames). fake=True keeps the legacy byte-slice
    stub for opaque payloads.
    """

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, frames, hs, ws = [], [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            if self.fake:
                step = max(1, len(payload) // self.n_frames)
                for i in range(self.n_frames):
                    mids.append(mid)
                    fidx.append(i)
                    frames.append(payload[i * step:(i + 1) * step])
                    hs.append(0)
                    ws.append(0)
            else:
                w, h, _, all_frames = decode_y4m(payload)
                total = len(all_frames)
                take = min(self.n_frames, total)
                for k in range(take):
                    j = (k * total) // take
                    mids.append(mid)
                    fidx.append(j)
                    frames.append(all_frames[j])
                    hs.append(h)
                    ws.append(w)
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
        })


class AudioFeatures:
    """audio payload → fixed-size band-energy feature vector.

    fake=False decodes PCM WAV via the stdlib `wave` module and computes
    RMS energy over n_bands equal time segments of the mono signal (plus
    sample_rate / n_samples metadata). fake=True keeps the byte-band stub.
    """

    def __init__(self, n_bands: int = 16, fake: bool = True):
        self.n_bands = n_bands
        self.fake = fake

    def _bands_fake(self, payload: bytes):
        arr = np.frombuffer(payload, np.uint8).astype(np.float64)
        pad = (-len(arr)) % self.n_bands
        if pad:
            arr = np.pad(arr, (0, pad))
        bands = arr.reshape(self.n_bands, -1).mean(axis=1)
        return (bands / max(bands.max(), 1.0)), 0, len(arr)

    def _bands_real(self, payload: bytes):
        mono, rate = decode_wav(payload)
        n = len(mono)
        pad = (-n) % self.n_bands
        if pad:
            mono = np.pad(mono, (0, pad))
        seg = mono.reshape(self.n_bands, -1)
        return np.sqrt((seg * seg).mean(axis=1)), rate, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        bands = self._bands_fake if self.fake else self._bands_real
        feats, rates, counts = [], [], []
        for payload in batch.column("payload").to_pylist():
            f, rate, n = bands(payload)
            feats.append(f.tolist())
            rates.append(rate)
            counts.append(n)
        return pa.table({
            "media_id": batch.column("media_id"),
            "features": pa.array(feats, pa.list_(pa.float64())),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(counts, pa.int64()),
        })


def decode_images(media_ds, concurrency: int = 2, batch_size: int = 16,
                  fake: bool = True, emit_pixels: bool = False):
    """Dataset-level wrapper for the DecodeImage actor pool."""
    return media_ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake, "emit_pixels": emit_pixels},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioToSamples:
    """Actor-pool stage: WAV payload → flattened (media_id, idx, sample)
    rows with the EXACT stored PCM integers (decode_wav_raw — no float
    normalization). Multi-channel is averaged to mono with a TRUNCATING
    integer division (toward zero) so the semantics match SQL `/` on
    negative channel sums — numpy's native `//` floors, which diverges
    on negatives (the repo's documented floor-vs-trunc gotcha). One
    vectorized emit per batch; per-media row counts stay bounded by the
    payload size, so batch_size controls heap. NOTE: the audio_energy
    oracle recomputes energy from the engine-WRITTEN samples, so the
    decode/downmix step itself is pinned by pytest (bit-exact vs the
    synthetic generator), not by the SQL oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, vals = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            arr, sw, rate = decode_wav_raw(payload)
            if arr.ndim == 1:
                mono = arr.astype(np.int64)
            else:
                s = arr.astype(np.int64).sum(axis=1)
                # truncate toward zero (SQL semantics), not numpy floor
                mono = np.sign(s) * (np.abs(s) // arr.shape[1])
            ids.append(np.full(len(mono), mid, np.int64))
            idxs.append(np.arange(len(mono), dtype=np.int64))
            vals.append(mono)
        cat = (np.concatenate(ids), np.concatenate(idxs),
               np.concatenate(vals)) if ids else (
            np.empty(0, np.int64),) * 3
        return pa.table({"media_id": pa.array(cat[0], pa.int64()),
                         "idx": pa.array(cat[1], pa.int64()),
                         "sample": pa.array(cat[2], pa.int64())})


def audio_energy_stats(samples_ds):
    """(media_id, idx, sample) rows → per-media exact integer energy:
    n_samples, sum_sq = Σ sample², sum_abs = Σ |sample|. Per-batch
    int64 partials (np.add.at — exact at any length) then one grouped
    merge; 16-bit samples keep sum_sq under int64 to ~8.6e9 samples per
    media (loud assert)."""

    def partial(batch: pa.Table) -> pa.Table:
        mid = np.asarray(batch.column("media_id"), np.int64)
        s = np.asarray(batch.column("sample"), np.int64)
        um, inv = np.unique(mid, return_inverse=True)
        n = np.bincount(inv, minlength=len(um)).astype(np.int64)
        ssq = np.zeros(len(um), np.int64)
        np.add.at(ssq, inv, s * s)
        sab = np.zeros(len(um), np.int64)
        np.add.at(sab, inv, np.abs(s))
        return pa.table({"media_id": pa.array(um, pa.int64()),
                         "n_samples": pa.array(n, pa.int64()),
                         "sum_sq": pa.array(ssq, pa.int64()),
                         "sum_abs": pa.array(sab, pa.int64())})

    def merge(batch: pa.Table) -> pa.Table:
        mid = np.asarray(batch.column("media_id"), np.int64)
        um, inv = np.unique(mid, return_inverse=True)
        out = {}
        for c in ("n_samples", "sum_sq", "sum_abs"):
            acc = np.zeros(len(um), np.int64)
            np.add.at(acc, inv, np.asarray(batch.column(c), np.int64))
            out[c] = acc
        assert out["n_samples"].size == 0 or out["sum_sq"].max() >= 0, \
            "sum_sq overflowed int64"
        return pa.table({"media_id": pa.array(um, pa.int64()),
                         "n_samples": pa.array(out["n_samples"],
                                               pa.int64()),
                         "sum_sq": pa.array(out["sum_sq"], pa.int64()),
                         "sum_abs": pa.array(out["sum_abs"],
                                             pa.int64())})

    return (samples_ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
            .repartition(1).map_batches(merge, batch_format="pyarrow",
                                        batch_size=None))


class FrameByteStats:
    """Actor-pool stage: y4m payload → per-frame exact byte statistics
    (media_id, frame_index, n_bytes, sum_bytes). The per-frame sum is
    one vectorized uint8→int64 reduction; with the deterministic video
    generator the sums have a closed form an independent oracle can
    recompute WITHOUT running the decoder (the media_decode geometry
    pattern extended to pixel content)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nb, sb = [], [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            w, h, cspace, frames = decode_y4m(payload)
            for f, fb in enumerate(frames):
                arr = np.frombuffer(fb, np.uint8)
                ids.append(mid)
                fidx.append(f)
                nb.append(len(arr))
                sb.append(int(arr.sum(dtype=np.int64)))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
            "sum_bytes": pa.array(sb, pa.int64()),
        })
