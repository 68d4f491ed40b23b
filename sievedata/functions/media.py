"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool map_batches stages.
The actual codec libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode step is STUBBED: ``decode_media`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (sha256-based
feature vector) exercises the real Ray-side plumbing — schema, batch sizing,
actor signature, output layout — end to end.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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
    """Decode one media payload to a feature array.

    Real decoding requires codec libraries that are not installed here —
    STUB: raises NotImplementedError unless ``fake`` is set, in which case a
    deterministic sha256-derived 16-dim feature vector is returned (stable
    across runs, so downstream plumbing is testable).
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "run with fake=True for deterministic plumbing tests"
        )
    digest = hashlib.sha256(payload + kind.encode()).digest()
    return np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0


class MediaResizer:
    """Actor-pool stage: decode → resize → re-encode media payloads.

    The codec halves are STUBBED like ``decode_media`` (no PIL/ffmpeg in
    this container): with ``fake=True`` the output payload is a
    deterministic sha256-stream "thumbnail" of ``thumb_bytes`` bytes, so
    the real plumbing — binary in/out schema, per-actor setup, small
    batches for wide rows — is exercised end to end and downstream stages
    see a correctly-shaped re-encoded column.
    """

    def __init__(self, width: int = 64, height: int = 64, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "media codecs (PIL/ffmpeg) are not available in this "
                "environment; construct with fake=True for plumbing tests"
            )
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(
                    [self._fake_resize(p or b"") for p in payloads], pa.binary()
                ),
                "width": pa.array([self.width] * len(payloads), pa.int32()),
                "height": pa.array([self.height] * len(payloads), pa.int32()),
            }
        )


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
