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


def synthesize_media_table(
    n: int, seed: int = 42, sql_replayable: bool = False,
    key_mod: int | None = None,
) -> pa.Table:
    """Deterministic fake media rows.  Default payloads are seeded RNG
    bytes; ``sql_replayable=True`` switches to the arithmetic rule
    ``byte[j] = (k * 31 + j * 7 + 13) % 256`` over lengths
    ``64 + k % 128`` where ``k = media_id % key_mod`` (``k = media_id``
    when key_mod is None), which a DuckDB generate_series CTE can
    replay exactly — the certified media_histogram oracle depends on
    this mode, and ``key_mod`` plants exact duplicate payloads for the
    media_dedup oracle (ids sharing a residue share bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    if sql_replayable:
        payloads = [
            (
                (np.int64(k) * 31 + np.arange(64 + k % 128, dtype=np.int64) * 7 + 13)
                % 256
            )
            .astype(np.uint8)
            .tobytes()
            for i in range(n)
            for k in [i % key_mod if key_mod else i]
        ]
    else:
        payloads = [
            rng.integers(0, 256, 64 + i % 128, dtype=np.uint8).tobytes()
            for i in range(n)
        ]
    rows = {
        "media_id": np.arange(n, dtype=np.int64),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": payloads,
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


class HistogramStub:
    """Actor-pool byte-histogram feature extractor, the integer-count
    core of ``DecodeStub._decode_fake`` (its float features are these
    counts / payload length).  Emits EXPLODED rows (media_id, bin, n) —
    pure int64 columns, so the stage is hash-certifiable against a
    DuckDB generate_series oracle when payloads come from
    ``synthesize_media_table(sql_replayable=True)``.  Same plumbing
    contract as the codec stubs: per-actor state in ``__init__``, one
    Arrow batch per ``__call__``, small batches for binary payloads."""

    def __init__(self, bin_width: int = 16):
        self.bin_width = bin_width

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        bins_out: list[np.ndarray] = []
        ns_out: list[np.ndarray] = []
        mids = batch.column("media_id").to_numpy(zero_copy_only=False)
        for mid, p in zip(mids, batch.column("payload")):
            b = np.frombuffer(p.as_py(), dtype=np.uint8)
            bins, counts = np.unique(b // self.bin_width, return_counts=True)
            ids_out.append(np.full(len(bins), mid, dtype=np.int64))
            bins_out.append(bins.astype(np.int64))
            ns_out.append(counts.astype(np.int64))
        if not ids_out:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "bin": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(ids_out)),
                "bin": pa.array(np.concatenate(bins_out)),
                "n": pa.array(np.concatenate(ns_out)),
            }
        )


def media_byte_histogram(
    ds, bin_width: int = 16, concurrency: int = 2, batch_size: int = 64
):
    """Actor-pool byte-histogram over media payloads -> (media_id, bin, n)."""
    return ds.map_batches(
        HistogramStub,
        fn_constructor_kwargs={"bin_width": bin_width},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStub:
    """Actor-pool image RESIZE stage (the brief's third multimodal verb).
    A real deployment loads the codec once per actor in ``__init__`` and
    re-encodes each payload at ``(target_w, target_h)``; the sandbox has
    no PIL/ffmpeg, so ``fake=True`` substitutes a deterministic byte
    decimation (stride chosen from the area ratio) that preserves the
    REAL contract: payload bytes are replaced (never appended alongside
    the original — binary columns must not double in flight), width and
    height metadata are rewritten, non-image rows pass through
    untouched, and the output schema is identical to the input's."""

    def __init__(self, target_w: int = 64, target_h: int = 48, fake: bool = False):
        self.tw, self.th, self.fake = int(target_w), int(target_h), fake

    def _resize_real(self, payload: bytes) -> bytes:
        raise NotImplementedError(
            "image codecs (PIL) are not installed in this environment; "
            "run with fake=True for the deterministic stub"
        )

    def _resize_fake(self, payload: bytes, w: int, h: int) -> bytes:
        stride = max(1, (max(w, 1) * max(h, 1)) // (self.tw * self.th))
        return payload[::stride]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        payloads = batch.column("payload")
        out_p, out_w, out_h = [], [], []
        for i, kind in enumerate(kinds):
            p = payloads[i].as_py()
            if kind != "image":
                out_p.append(p)
                out_w.append(ws[i])
                out_h.append(hs[i])
                continue
            if not self.fake:
                p = self._resize_real(p)
            else:
                p = self._resize_fake(p, ws[i], hs[i])
            out_p.append(p)
            out_w.append(self.tw)
            out_h.append(self.th)
        cols = {}
        for name in batch.column_names:
            if name == "payload":
                cols[name] = pa.array(out_p, pa.binary())
            elif name == "width":
                cols[name] = pa.array(out_w, pa.int32())
            elif name == "height":
                cols[name] = pa.array(out_h, pa.int32())
            else:
                cols[name] = batch.column(name)
        return pa.table(cols)


def resize_media(
    ds, target_w: int = 64, target_h: int = 48, fake: bool = True,
    concurrency: int = 2, batch_size: int = 64,
):
    """Actor-pool resize over small binary batches."""
    return ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs={
            "target_w": target_w, "target_h": target_h, "fake": fake
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleStub:
    """Actor-pool video FRAME-SAMPLING stage (the brief's fourth
    multimodal verb): each video row expands to ``n_frames`` frame rows
    ``(media_id, frame_idx, ts_ms, frame)`` at evenly spaced timestamps;
    non-video rows are dropped (frames are a video-only concept).  A
    real deployment seeks the container per timestamp in ``__call__``
    with a decoder held from ``__init__``; the sandbox stub slices
    deterministic byte windows instead.  The REAL contract exercised:
    one-to-many row expansion inside ``map_batches`` (output row count
    != input row count is legal and streams correctly), per-frame
    metadata layout, and small-batch sizing for binary payloads."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n = int(n_frames)
        self.fake = fake

    def _frame_real(self, payload: bytes, ts_ms: int) -> bytes:
        raise NotImplementedError(
            "video codecs (ffmpeg) are not installed in this environment; "
            "run with fake=True for the deterministic stub"
        )

    def _frame_fake(self, payload: bytes, idx: int) -> bytes:
        # deterministic window: rotate the payload by a frame-dependent
        # offset and keep a fixed-size slice
        if not payload:
            return b""
        off = (idx * 7919) % len(payload)
        win = payload[off:] + payload[:off]
        return win[: min(32, len(win))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = (
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
        )
        durs = batch.column("duration_ms").to_pylist()
        payloads = batch.column("payload")
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
        for i, kind in enumerate(kinds):
            if kind != "video":
                continue
            p = payloads[i].as_py()
            dur = max(int(durs[i]), 0)
            for j in range(self.n):
                frame = (
                    self._frame_fake(p, j)
                    if self.fake
                    else self._frame_real(p, j * dur // max(self.n, 1))
                )
                out["media_id"].append(ids[i])
                out["frame_idx"].append(j)
                out["ts_ms"].append(j * dur // max(self.n, 1))
                out["frame"].append(frame)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
                "frame": pa.array(out["frame"], pa.binary()),
            }
        )


def sample_frames(
    ds, n_frames: int = 4, fake: bool = True,
    concurrency: int = 2, batch_size: int = 32,
):
    """Actor-pool frame sampling: video rows fan out to frame rows."""
    return ds.map_batches(
        FrameSampleStub,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_dedup(ds) -> "ray.data.Dataset":
    """EXACT content dedup over opaque binary payloads — the multimodal
    twin of the text dedup family (``stages/dedup.py``): identical
    payload bytes collapse to one representative (lowest ``media_id``),
    with the copy count and payload size per survivor.

    The content key is the FULL 16-byte BLAKE2b digest computed per
    payload in the map stage — per-item hashing is inherent to
    variable-length binary rows (no vectorized kernel exists), but only
    digest bytes + 2 int64s per row ever reach the exchange, never the
    payloads, so at 100 TB the shuffle moves digests, not media.  The
    grouping key is the digest BYTES (128-bit): a truncated 63-bit key
    would hit the birthday bound (~50% collision odds near 3.6e9
    payloads) and silently merge distinct content; 128 bits keeps the
    collision probability negligible at any realistic corpus size (the
    bucket key is a 63-bit slice — a bucket collision only co-locates
    rows, never merges them).  One digest-bucket exchange; the bucket
    kernel is Arrow C++ group_by (min/count), no per-group Python."""
    import pyarrow.compute as pc

    from cloudtile_ray.stages.util import default_num_buckets

    nb = default_num_buckets(ds)

    def digest(t: pa.Table) -> pa.Table:
        import hashlib

        n = t.num_rows
        digs: list[bytes] = []
        bkt = np.empty(n, dtype=np.int64)
        sizes = np.empty(n, dtype=np.int64)
        payload = t.column("payload")
        for i in range(n):  # per-item: variable-length binary hashing
            b = payload[i].as_py()
            d = hashlib.blake2b(b, digest_size=16).digest()
            digs.append(d)
            bkt[i] = (int.from_bytes(d[:8], "big") >> 1) % nb
            sizes[i] = len(b)
        return pa.table(
            {
                "dig": pa.array(digs, pa.binary()),
                "media_id": t.column("media_id"),
                "nbytes": pa.array(sizes),
                "_bkt": pa.array(bkt),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        agg = (
            g.select(["dig", "media_id", "nbytes"])
            .combine_chunks()
            .group_by("dig")
            .aggregate(
                [
                    ("media_id", "min"),
                    ("media_id", "count"),
                    ("nbytes", "min"),
                ]
            )
        )
        return pa.table(
            {
                "keep_id": agg.column("media_id_min"),
                "n_copies": agg.column("media_id_count"),
                "nbytes": agg.column("nbytes_min"),
            }
        )

    return (
        ds.map_batches(digest, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
