"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode codecs (PIL/ffmpeg/librosa) are NOT available in this container,
so the codec call is stubbed: ``DecodeStub`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decode (byte
histogram "features", declared width/height) exercises the full Ray-side
plumbing — schema, batch sizing, actor signature, output layout — which is
the real, tested part. Swap ``_decode_real`` for a real codec on a cluster
with the libs installed; nothing else changes.
"""

from __future__ import annotations

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


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, 64 + i % 128, dtype=np.uint8).tobytes() for i in range(n)],
        "mime": ["image/jpeg" if i % 3 == 0 else "audio/wav" if i % 3 == 1 else "video/mp4" for i in range(n)],
        "width": np.full(n, 640, dtype=np.int32),
        "height": np.full(n, 480, dtype=np.int32),
        "duration_ms": np.where(np.arange(n) % 3 == 0, 0, 5000).astype(np.int32),
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeStub:
    """Actor-pool decode/feature-extract stage. ``__init__`` is where a real
    model/codec would load once per actor; ``__call__`` handles one Arrow
    batch. Small ``batch_size`` is mandatory for large binary payloads
    (object-store pressure) — enforced by the helper below."""

    def __init__(self, fake: bool = False, feature_bins: int = 16):
        self.fake = fake
        self.bins = feature_bins

    def _decode_real(self, payload: bytes, kind: str):
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not installed in this environment; "
            "run with fake=True for the deterministic stub"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        b = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(b, bins=self.bins, range=(0, 256))
        return (hist / max(1, len(b))).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        feats = [
            decode(p.as_py(), k)
            for p, k in zip(batch.column("payload"), batch.column("kind").to_pylist())
        ]
        out = batch.drop_columns(["payload"])  # features replace heavy bytes
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32(), self.bins))
        )


def decode_media(ds, fake: bool = True, concurrency: int = 2, batch_size: int = 64):
    """The production-shaped invocation: actor pool, small batches."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
