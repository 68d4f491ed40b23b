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
