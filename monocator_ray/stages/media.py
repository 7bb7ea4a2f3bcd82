"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata.

The decode/resize/feature libs are NOT in this container, so the codec step
is stubbed behind ``DeterministicFakeCodec`` (clearly marked) — but the
Ray-side plumbing is real and tested: schema, actor-pool signature, small
``batch_size`` for large binary payloads, output layout.  Swap the codec for
PIL/torchaudio in a real deployment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DeterministicFakeCodec:
    """STUB: stands in for PIL/ffmpeg decode.  Produces a deterministic
    'feature vector' = sha256-derived floats, and 'decoded' dims from
    metadata.  Raises on kinds it does not recognize, like a real codec."""

    def decode(self, payload: bytes, kind: str) -> np.ndarray:
        if kind not in ("image", "audio", "video"):
            raise NotImplementedError(f"no codec for kind={kind!r} (real impl: PIL/ffmpeg)")
        digest = hashlib.sha256(payload or b"").digest()
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0)[:16]


class MediaFeatureExtractor:
    """Actor-pool map_batches stage: decode once per row, emit a fixed-width
    feature vector.  batch_size should be SMALL (64-256) — payloads are
    large binaries and batch x concurrency must fit worker heap."""

    def __init__(self):
        self.codec = DeterministicFakeCodec()  # real impl: load model here, once

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.codec.decode(p.as_py() if p.is_valid else b"", k)
            for p, k in zip(batch["payload"], batch["kind"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "n_bytes": pa.array(
                    [len(p.as_py()) if p.is_valid else 0 for p in batch["payload"]], pa.int64()
                ),
            }
        )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array([rng.bytes(128 + i) for i in range(n)], pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=None,
    )
