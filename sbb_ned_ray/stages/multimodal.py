"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The decode/feature kernels themselves are STUBBED (no image/audio libs
in this container — each raises ``NotImplementedError`` unless the
optional lib imports, or uses the deterministic fake), but the Ray-side
plumbing is real and tested: schema, actor-pool signature, batch
sizing for large binary rows, output layout.

Pattern: media rows are (id, media:binary, media_type, width/height/
duration metadata).  Batches must stay SMALL (binary payloads ×
batch_size × concurrency must fit worker heap — the guide's
memory-aware sizing rule), so these stages default to batch_size=32.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media", pa.binary()),
    ("media_type", pa.string()),       # "image/png", "audio/wav", ...
    ("meta_width", pa.int32()),
    ("meta_height", pa.int32()),
    ("meta_duration_ms", pa.int32()),
])


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


class ImageDecodeStage:
    """Actor-pool stage: binary image → (decoded meta, feature vector).

    Real decode requires PIL — absent here, so ``fake=True`` (default)
    derives a deterministic 16-d "feature" from the payload bytes; the
    schema/plumbing is identical either way.
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True, resize_to: int = 64):
        self.pil = _try_import_pil()
        self.fake = fake
        self.resize_to = resize_to
        if not fake and self.pil is None:
            raise NotImplementedError(
                "real image decode needs PIL, which is not available in "
                "this container; use fake=True (deterministic stub)")

    def _features(self, payload: bytes) -> np.ndarray:
        if not self.fake and self.pil is not None:
            raise NotImplementedError("real decode path not wired yet")
        # deterministic fake: 16 bytes of blake2b → unit vector
        h = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        v = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        n = float(np.linalg.norm(v))
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [m.as_py() for m in batch["media"]]
        feats = [self._features(m) for m in payloads]
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
            "n_bytes": pa.array([len(m) for m in payloads], pa.int64()),
            # content-addressable fingerprint of the raw payload (the
            # standard key for media-level exact dedup / caching) — and
            # SQL-expressible, so the decode plumbing is oracle-checked
            "payload_md5": pa.array(
                [hashlib.md5(m).hexdigest() for m in payloads],
                pa.string()),
        })


class FrameSampleStage:
    """video → sampled frame rows (1 row per sampled frame).  Stub
    sampling: deterministic byte-slices standing in for frames; real
    impl swaps the slicer for a decoder, schema unchanged."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_no, out_frame = [], [], []
        for mid, media, dur in zip(batch["media_id"].to_pylist(),
                                   batch["media"].to_pylist(),
                                   batch["meta_duration_ms"].to_pylist()):
            n_frames = max(1, (dur or 0) // self.every_ms)
            step = max(1, len(media) // n_frames) if media else 1
            for f in range(n_frames):
                out_id.append(mid)
                out_no.append(f)
                out_frame.append(media[f * step:(f + 1) * step])
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_no": pa.array(out_no, pa.int32()),
            "frame": pa.array(out_frame, pa.binary()),
        })


def decode_media(media_ds, batch_size: int = 32, concurrency=(1, 4)):
    return media_ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)
