"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool map_batches stages.

Decode support is tiered:
- **REAL decode** for formats parseable with numpy + stdlib alone
  (functions/codecs.py): 24-bit BMP and 8-bit PNG images (zlib DEFLATE +
  the five scanline filters) and PCM-16 WAV audio — ``decode_media``
  sniffs the payload magic and returns real features; ``MediaResizer``
  really decodes → nearest-neighbor resizes → re-encodes BMP/PNG payloads
  (preserving the container format).
- **STUB** for the remaining compressed formats (JPEG/MP4 need PIL/ffmpeg,
  which are NOT in this container): raises NotImplementedError unless
  ``fake=True``, in which case a deterministic sha256-based fake exercises
  the real Ray-side plumbing — schema, batch sizing, actor signature,
  output layout.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from sievedata.functions import codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a 16-dim feature array.

    BMP, PNG and WAV payloads (sniffed by magic bytes) decode for REAL via
    the pure-numpy codecs; other formats need PIL/ffmpeg (not installed)
    and raise NotImplementedError unless ``fake`` is set, in which case a
    deterministic sha256-derived vector is returned (stable across runs, so
    downstream plumbing is testable for any payload shape).
    """
    import zlib

    # magic bytes are a sniff, not proof: arbitrary payloads (e.g. text
    # starting with "BM") can collide, so a failed real decode falls back
    # to the fake path when fake=True instead of raising
    try:
        if codecs.is_bmp(payload):
            return codecs.image_features(codecs.bmp_decode(payload))
        if codecs.is_png(payload):
            return codecs.image_features(codecs.png_decode(payload))
        if codecs.is_wav(payload):
            return codecs.audio_features(*codecs.wav_decode(payload))
    except (ValueError, struct.error, zlib.error):
        if not fake:
            raise
    if not fake:
        raise NotImplementedError(
            "compressed-media codecs (PIL/ffmpeg) are not available in this "
            "environment; supply BMP/WAV payloads or run with fake=True"
        )
    digest = hashlib.sha256(payload + kind.encode()).digest()
    return np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0


class MediaResizer:
    """Actor-pool stage: decode → resize → re-encode media payloads.

    BMP payloads resize for REAL (pure-numpy decode → nearest-neighbor
    gather → re-encode).  Compressed formats are stubbed like
    ``decode_media``: with ``fake=True`` a non-BMP payload becomes a
    deterministic sha256-stream "thumbnail" of ``thumb_bytes`` bytes, so
    the plumbing — binary in/out schema, per-actor setup, small batches
    for wide rows — is exercised end to end for any input.
    """

    def __init__(self, width: int = 64, height: int = 64, fake: bool = True):
        self.fake = fake
        self.width = width
        self.height = height
        # fake thumbnail size: enough bytes to be a realistic payload column
        self.thumb_bytes = max(16, (width * height) // 64)

    def _fake_resize(self, payload: bytes) -> bytes:
        out = bytearray()
        seed = hashlib.sha256(payload + b"|resize").digest()
        while len(out) < self.thumb_bytes:
            out.extend(seed)
            seed = hashlib.sha256(seed).digest()
        return bytes(out[: self.thumb_bytes])

    def _resize_one(self, payload: bytes) -> bytes:
        import zlib

        try:
            if codecs.is_bmp(payload):
                img = codecs.bmp_decode(payload)
                return codecs.bmp_encode(
                    codecs.bmp_resize_nearest(img, self.width, self.height))
            if codecs.is_png(payload):
                img = codecs.png_decode(payload)
                return codecs.png_encode(
                    codecs.bmp_resize_nearest(img, self.width, self.height))
        except (ValueError, struct.error, zlib.error):  # sniff collision
            if not self.fake:
                raise
            return self._fake_resize(payload)
        if not self.fake:
            raise NotImplementedError(
                "compressed-media codecs are not available; supply BMP/PNG "
                "payloads or construct with fake=True")
        return self._fake_resize(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(
                    [self._resize_one(p or b"") for p in payloads], pa.binary()
                ),
                "width": pa.array([self.width] * len(payloads), pa.int32()),
                "height": pa.array([self.height] * len(payloads), pa.int32()),
            }
        )


def synth_bmp(seed: int, width: int = 24, height: int = 16) -> bytes:
    """Deterministic real BMP payload (seeded gradient + noise image) —
    the fixture side of the real-decode path; no codec libs needed."""
    rng = np.random.Generator(np.random.PCG64(seed))
    x = np.linspace(0, 255, width, dtype=np.float32)
    y = np.linspace(0, 255, height, dtype=np.float32)[:, None]
    img = np.stack(
        [np.broadcast_to(x, (height, width)),
         np.broadcast_to(y, (height, width)),
         rng.integers(0, 256, (height, width)).astype(np.float32)],
        axis=2,
    ).astype(np.uint8)
    return codecs.bmp_encode(img)


def synth_png(seed: int, width: int = 24, height: int = 16) -> bytes:
    """Deterministic real PNG payload (same seeded image family as
    synth_bmp, encoded with a seed-derived per-row filter mix so fixtures
    exercise every unfilter path)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    x = np.linspace(0, 255, width, dtype=np.float32)
    y = np.linspace(0, 255, height, dtype=np.float32)[:, None]
    img = np.stack(
        [np.broadcast_to(x, (height, width)),
         np.broadcast_to(y, (height, width)),
         rng.integers(0, 256, (height, width)).astype(np.float32)],
        axis=2,
    ).astype(np.uint8)
    return codecs.png_encode(img, filters=rng.integers(0, 5, height))


def synth_wav(seed: int, n_samples: int = 1600, rate: int = 16_000) -> bytes:
    """Deterministic real WAV payload (seeded two-tone + noise, PCM16)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    t = np.arange(n_samples) / rate
    f1, f2 = 100 + seed % 900, 1000 + (seed // 7) % 3000
    sig = (0.5 * np.sin(2 * np.pi * f1 * t)
           + 0.3 * np.sin(2 * np.pi * f2 * t)
           + 0.05 * rng.standard_normal(n_samples))
    samples = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    return codecs.wav_encode(samples, rate)


class FrameSampler:
    """Actor-pool stage for video rows: sample ``n_frames`` evenly spaced
    timestamps in [0, duration_ms) and emit ONE ROW PER FRAME.

    The 1→N explode happens INSIDE map_batches (never a per-row flat_map),
    so block sizes grow by exactly n_frames× and the streaming executor's
    backpressure still sees bounded batches.  Frame decode is stubbed via
    ``decode_media`` (timestamp salted into the payload) — deterministic,
    so the plumbing is testable without ffmpeg.
    """

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("media_id").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        out_id, out_idx, out_ts, out_feat = [], [], [], []
        for mid, p, dur in zip(ids, payloads, durs):
            dur = int(dur or self.n_frames)
            for i in range(self.n_frames):
                ts = (i * dur) // self.n_frames
                feat = decode_media(
                    (p or b"") + ts.to_bytes(8, "little"), "video",
                    fake=self.fake,
                )
                out_id.append(mid)
                out_idx.append(i)
                out_ts.append(ts)
                out_feat.append(feat.tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_index": pa.array(out_idx, pa.int32()),
                "ts_ms": pa.array(out_ts, pa.int64()),
                "frame_feature": pa.array(out_feat, pa.list_(pa.float32())),
            }
        )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + featurize media batches.

    ``__init__`` is where a real deployment loads the codec/model once per
    actor; batches should be SMALL for large payloads (size batch_size so
    batch_bytes × concurrency fits worker heaps).
    """

    def __init__(self, fake: bool = True, feature_dim: int = 16):
        self.fake = fake
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        feats = [decode_media(p or b"", k or "image", fake=self.fake) for p, k in zip(payloads, kinds)]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )
