"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Decode support is two-tier:

* **netpbm P6 (PPM) images decode for REAL** — the format is a
  published three-token ASCII header + raw RGB bytes, parseable with
  numpy alone (no image libs needed).  ``decode_ppm`` / ``encode_ppm``
  / ``resize_nearest`` below are full implementations, and the decode
  stage sniffs the ``P6`` magic and emits true width/height/pixel
  statistics for such payloads (oracle-checked end-to-end in
  ``media_decode_ppm``).
* **PNG (8-bit non-interlaced RGB/RGBA) and WAV (RIFF PCM) also
  decode for REAL** — zlib is stdlib and the published chunk/filter
  formats need no media libs (``decode_png`` handles all five
  scanline filters with CRC verification).
* **Baseline JPEG (SOF0, up to 2x2 sampling) decodes for REAL** via
  the pure-numpy T.81 codec in :mod:`sbb_ned_ray.stages.jpeg`
  (Huffman entropy decode, dequant, vectorized IDCT, restart
  markers).  Progressive/arithmetic JPEGs raise inside the codec and
  degrade to the stub path.
* Formats that genuinely need external codecs (video, exotic image
  modes…) fall back to a deterministic blake2b pseudo-feature
  (documented stub — PIL is not in this container), with the
  Ray-side plumbing identical.

Pattern: media rows are (id, media:binary, media_type, width/height/
duration metadata).  Batches must stay SMALL (binary payloads ×
batch_size × concurrency must fit worker heap — the guide's
memory-aware sizing rule), so these stages default to batch_size=32.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------------------------
# Real PPM (netpbm P6) codec — pure numpy
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 payload."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 payload → (h, w, 3) uint8.  Handles comment lines and
    arbitrary whitespace in the header per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm payload")
    # header = magic + 3 ASCII ints separated by whitespace/comments,
    # terminated by ONE whitespace byte before the raster
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if i < n and payload[i:i + 1] == b"#":      # comment to EOL
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1                                          # the single separator
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                           offset=i)
    return raster.reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbour resize to (size, size, 3) — pure index math."""
    h, w = arr.shape[:2]
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# Real WAV (RIFF PCM mono 16-bit) codec — pure numpy + struct, same tier
# as the PPM codec: the published container format needs no audio libs
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM payload."""
    import struct
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM payload → (int16 mono samples, sample rate).
    Walks the chunk list per the RIFF spec (tolerates extra chunks like
    LIST/INFO); only PCM mono 16-bit is supported."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    rate, bits, channels, data = None, None, None, None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        (size,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported, got fmt {audio_fmt}")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)                   # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if (channels, bits) != (1, 16):
        raise ValueError(f"only mono 16-bit supported, got "
                         f"{channels}ch/{bits}bit")
    return np.frombuffer(data, dtype="<i2"), rate

# ---------------------------------------------------------------------------
# Real PNG codec — zlib (stdlib) + numpy unfiltering, same tier as the
# PPM/WAV codecs: the published format (RFC 2083) needs no image libs.
# 8-bit non-interlaced RGB (color type 2) / RGBA (6) supported.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 → PNG payload.  Scanline filters cycle
    0..4 (None/Sub/Up/Average/Paeth) so round-trip tests exercise
    every unfilter path, not just the trivial one."""
    import struct
    import zlib
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError(f"expected (h, w, 3|4) array, got {a.shape}")
    h, w, bpp = a.shape
    ctype = 2 if bpp == 3 else 6
    prev = np.zeros(w * bpp, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        raw = a[y].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(bpp, np.int64), raw[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        f = y % 5
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw - left
        elif f == 2:
            filt = raw - prev
        elif f == 3:
            filt = raw - (left + prev) // 2
        else:
            filt = raw - _paeth(left, prev, ul)
        out.append(f)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b""))


def _paeth(left: np.ndarray, up: np.ndarray, ul: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized."""
    p = left + up - ul
    pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    return np.where((pa_ <= pb) & (pa_ <= pc), left,
                    np.where(pb <= pc, up, ul))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG payload → (h, w, 3|4) uint8.  Walks the chunk list with CRC
    verification, inflates the IDAT stream, and unfilters scanline by
    scanline (Sub via per-lane cumsum; Average/Paeth via a per-pixel
    loop — they are sequentially dependent by definition)."""
    import struct
    import zlib
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, n = 8, len(payload)
    w = h = bpp = None
    idat = bytearray()
    while i + 8 <= n:
        (size,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        body = payload[i + 8:i + 8 + size]
        (crc,) = struct.unpack(">I", payload[i + 8 + size:i + 12 + size])
        if zlib.crc32(ctype + body) != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, inter = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (2, 6) or inter != 0:
                raise ValueError(
                    f"only 8-bit non-interlaced RGB/RGBA supported, got "
                    f"depth={depth} color={color} interlace={inter}")
            bpp = 3 if color == 2 else 4
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        i += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    if w * h > (1 << 26):
        # sanity cap (64 Mpx): crafted tiny payloads must not allocate
        # unboundedly in a web-corpus setting
        raise ValueError(f"image too large: {w}x{h}")
    stride = w * bpp
    expected = h * (stride + 1)
    # bounded inflation: ask for at most expected+1 bytes — a zip-bomb
    # IDAT stream stops at the cap instead of materializing fully
    dec = zlib.decompressobj()
    raw_bytes = dec.decompress(bytes(idat), expected + 1)
    raw = np.frombuffer(raw_bytes, dtype=np.uint8)
    if len(raw) != expected:
        raise ValueError("bad decompressed length")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f, line = int(raw[y, 0]), raw[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else \
            np.zeros(stride, np.int64)
        if f == 0:
            rec = line
        elif f == 1:
            rec = line.copy()
            for lane in range(bpp):          # Sub = per-lane cumsum mod 256
                rec[lane::bpp] = np.cumsum(rec[lane::bpp]) % 256
        elif f == 2:
            rec = (line + prev) % 256
        elif f in (3, 4):
            rec = np.zeros(stride, np.int64)
            ulv = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            for x in range(0, stride, bpp):  # sequential by definition
                left = rec[x - bpp:x] if x else np.zeros(bpp, np.int64)
                pred = (left + prev[x:x + bpp]) // 2 if f == 3 else \
                    _paeth(left, prev[x:x + bpp], ulv[x:x + bpp])
                rec[x:x + bpp] = (line[x:x + bpp] + pred) % 256
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, bpp)


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

    P6/PPM, PNG and baseline JPEG payloads (sniffed by magic) decode
    for REAL — true width/height and pixel statistics from
    :func:`decode_ppm` / :func:`decode_png` /
    :func:`sbb_ned_ray.stages.jpeg.decode_jpeg` +
    :func:`resize_nearest`.  Other formats need codecs absent from
    this container (PIL import-guarded), so they take the
    deterministic blake2b pseudo-feature path; the schema and plumbing
    are identical either way.  Decoded meta is -1 on the fake path.
    """

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True, resize_to: int = 64):
        self.pil = _try_import_pil()
        self.fake = fake
        self.resize_to = resize_to
        if not fake and self.pil is None:
            raise NotImplementedError(
                "real decode of formats beyond PPM/PNG/baseline-JPEG "
                "needs PIL, which is not available in this container; "
                "those three always decode for real")

    def _features(self, payload: bytes) -> np.ndarray:
        # deterministic fake for non-decodable formats: 16 bytes of
        # blake2b → unit vector
        h = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM).digest()
        v = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        n = float(np.linalg.norm(v))
        return v / n if n else v

    def _real_features(self, arr: np.ndarray) -> np.ndarray:
        """16-d real feature: mean R/G/B (scaled to [0,1]) + 13-bin
        grayscale histogram over the resized image."""
        small = resize_nearest(arr, self.resize_to).astype(np.float32)
        rgb = small.mean(axis=(0, 1)) / 255.0
        gray = small.mean(axis=2)
        hist, _ = np.histogram(gray, bins=13, range=(0.0, 256.0))
        hist = hist.astype(np.float32) / max(1, gray.size)
        return np.concatenate([rgb.astype(np.float32), hist])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [m.as_py() for m in batch["media"]]
        feats, widths, heights, means_e2 = [], [], [], []
        import struct
        import zlib
        for m in payloads:
            arr = None
            if m[:2] == b"P6" or m[:8] == _PNG_SIG \
                    or m[:2] == b"\xff\xd8":
                # a truncated/palette/16-bit/interlaced/progressive or
                # otherwise malformed payload from a web corpus must
                # degrade to the stub-feature path, not kill the task
                try:
                    if m[:2] == b"P6":
                        arr = decode_ppm(m)
                    elif m[:8] == _PNG_SIG:
                        arr = decode_png(m)
                    else:
                        from sbb_ned_ray.stages.jpeg import decode_jpeg
                        a = decode_jpeg(m)
                        arr = np.repeat(a[..., None], 3, -1) \
                            if a.ndim == 2 else a
                except (ValueError, struct.error, zlib.error,
                        IndexError, KeyError, StopIteration):
                    # KeyError: SOS referencing an undefined quant /
                    # Huffman table id; StopIteration: SOS component
                    # id absent from SOF — both occur in corrupt web
                    # JPEGs and must degrade, not kill the task
                    arr = None
            if arr is not None:
                rgb = arr[..., :3]        # drop alpha for ALL stats
                feats.append(self._real_features(rgb))
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
                means_e2.append(
                    int(np.floor(float(rgb.mean()) * 100 + 0.5)))
            else:
                feats.append(self._features(m))
                widths.append(-1)
                heights.append(-1)
                means_e2.append(-1)
        return pa.table({
            "media_id": batch["media_id"],
            "media_type": batch["media_type"],
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32())),
            "n_bytes": pa.array([len(m) for m in payloads], pa.int64()),
            # true decoded geometry / brightness for P6, -1 otherwise
            "meta_width": pa.array(widths, pa.int32()),
            "meta_height": pa.array(heights, pa.int32()),
            "mean_px_e2": pa.array(means_e2, pa.int64()),
            # content-addressable fingerprint of the raw payload (the
            # standard key for media-level exact dedup / caching) — and
            # SQL-expressible, so the decode plumbing is oracle-checked
            "payload_md5": pa.array(
                [hashlib.md5(m).hexdigest() for m in payloads],
                pa.string()),
        })


class AudioDecodeStage:
    """Actor-pool stage: binary audio → decoded PCM statistics.

    RIFF/WAVE payloads (sniffed by magic) decode for REAL via
    :func:`decode_wav` — true sample rate, sample count, duration and
    amplitude statistics from the bytes (oracle-checked end-to-end in
    ``media_decode_wav``).  Non-RIFF payloads emit -1 meta, mirroring
    ImageDecodeStage's honest fallback."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct
        rates, counts, durs, mean_abs, peaks = [], [], [], [], []
        for m in batch["media"].to_pylist():
            decoded = None
            if m[:4] == b"RIFF":
                # non-PCM/stereo/truncated RIFF degrades to -1 meta
                # instead of killing the task (web-corpus hygiene)
                try:
                    decoded = decode_wav(m)
                except (ValueError, struct.error, IndexError):
                    decoded = None
            if decoded is not None:
                s, rate = decoded
                a = np.abs(s.astype(np.int64))
                rates.append(rate)
                counts.append(len(s))
                durs.append(len(s) * 1000 // rate)
                # exact e2 encoding: integer sum / count in float64,
                # identical to the SQL AVG-over-BIGINT expression
                mean_abs.append(int(np.floor(
                    float(a.sum()) / max(len(s), 1) * 100 + 0.5)))
                peaks.append(int(a.max()) if len(s) else 0)
            else:
                rates.append(-1)
                counts.append(-1)
                durs.append(-1)
                mean_abs.append(-1)
                peaks.append(-1)
        return pa.table({
            "media_id": batch["media_id"],
            "rate": pa.array(rates, pa.int64()),
            "n_samples": pa.array(counts, pa.int64()),
            "duration_ms": pa.array(durs, pa.int64()),
            "mean_abs_e2": pa.array(mean_abs, pa.int64()),
            "peak": pa.array(peaks, pa.int64()),
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


# ---------------------------------------------------------------------------
# perceptual-hash image near-duplicate detection (aHash + banded
# Hamming join) — the image-side member of the dedup family
# ---------------------------------------------------------------------------

def ahash64(arr: np.ndarray) -> int:
    """64-bit AVERAGE HASH of an ``(h, w, 3)`` uint8 image: 8×8 grid
    of integer block sums, bit set iff the block's mean exceeds the
    image mean — all-integer cross-multiplication (``block_sum ·
    total_px > total_sum · block_px``), so the hash is exact and
    platform-independent (no float mean, no DCT).  Bit ``8·r + c`` is
    grid cell (r, c), row-major."""
    a = np.asarray(arr)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) image, got {a.shape}")
    gray = a.astype(np.int64).sum(axis=2)          # 0..765 per px
    h, w = gray.shape
    if h < 8 or w < 8:
        raise ValueError(f"image too small for an 8x8 grid: {h}x{w}")
    ys = (np.arange(9, dtype=np.int64) * h) // 8
    xs = (np.arange(9, dtype=np.int64) * w) // 8
    c = np.zeros((h + 1, w + 1), np.int64)
    c[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    bs = (c[np.ix_(ys[1:], xs[1:])] - c[np.ix_(ys[:-1], xs[1:])]
          - c[np.ix_(ys[1:], xs[:-1])] + c[np.ix_(ys[:-1], xs[:-1])])
    bpx = np.outer(np.diff(ys), np.diff(xs))
    total_sum = int(bs.sum())
    total_px = int(h) * int(w)
    bits = (bs * total_px) > (total_sum * bpx)
    idx = np.arange(64, dtype=np.uint64)
    return int(np.sum(bits.reshape(-1).astype(np.uint64) << idx))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1).astype(np.int64)


class PerceptualHashStage:
    """Actor-pool stage: binary image payload → ``(media_id, phash)``.
    Decodes PPM / PNG / baseline JPEG by magic (the same real codecs
    :class:`ImageDecodeStage` uses) and computes :func:`ahash64`.
    The hash travels as int64 (the uint64 bit pattern reinterpreted),
    XOR/popcount-compatible on the uint64 view."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sbb_ned_ray.stages.jpeg import decode_jpeg
        hashes = []
        for m in batch["media"]:
            p = m.as_py()
            if p[:2] == b"P6":
                arr = decode_ppm(p)
            elif p[:8] == _PNG_SIG:
                arr = decode_png(p)
            elif p[:2] == b"\xff\xd8":
                arr = decode_jpeg(p)
            else:
                raise ValueError(
                    "PerceptualHashStage: unsupported image format "
                    f"(magic {p[:4]!r})")
            hashes.append(np.uint64(ahash64(arr)).astype(np.int64))
        return pa.table({
            "media_id": batch["media_id"],
            "phash": pa.array(np.array(hashes, np.int64), pa.int64())})


def phash_neardup_pairs(media_ds, max_dist: int = 6, n_bands: int = 8,
                        nparts: int = 32,
                        max_pairs_per_bucket: int = 20_000,
                        concurrency=(1, 4)):
    """Image near-duplicate pairs by banded Hamming join over
    :func:`ahash64`: the 64-bit hash splits into ``n_bands`` equal
    bands; two images at Hamming distance ≤ ``n_bands - 1`` share at
    least one untouched band (pigeonhole), so with the default 8 bands
    every pair at distance ≤ 7 ≥ ``max_dist`` is a candidate —
    recall 1 by construction, exactness restored by the inline XOR
    popcount verify.  Returns Dataset ``(id_a, id_b, hamming)`` with
    ``id_a < id_b``.

    Scale shape = the SimHash path in
    :mod:`sbb_ned_ray.stages.dedup`: hashing is an actor-pool decode
    stage (images never re-ship after the 8-byte hash is extracted),
    band rows carry (band_key, id, hash) — 24 bytes/row ×
    ``n_bands`` —, candidates emit per band bucket with a skew cap,
    and the verify runs inside the bucket (both hashes are already
    co-located, no second join).  One bucketed distinct dedups pairs
    found in several bands."""
    hashed = media_ds.map_batches(
        PerceptualHashStage, batch_format="pyarrow", batch_size=32,
        concurrency=concurrency).materialize()
    return banded_hamming_pairs(hashed, max_dist=max_dist,
                                n_bands=n_bands, nparts=nparts,
                                max_pairs_per_bucket=max_pairs_per_bucket)


def banded_hamming_pairs(hashed, max_dist: int = 6, n_bands: int = 8,
                         nparts: int = 32,
                         max_pairs_per_bucket: int = 20_000):
    """Generic banded Hamming ≤ ``max_dist`` self-join over a
    ``(media_id, phash)`` Dataset of 64-bit fingerprints — the shared
    engine under :func:`phash_neardup_pairs` (images) and
    :func:`audio_neardup_pairs` (audio).  See
    :func:`phash_neardup_pairs` for the recall guarantee and scale
    shape."""
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if max_dist >= n_bands:
        raise ValueError(
            f"banding only guarantees recall for dist < n_bands "
            f"({n_bands}); got max_dist={max_dist}")
    bw = 64 // n_bands
    mask = np.uint64((1 << bw) - 1)

    from sbb_ned_ray.stages.graph import (_add_hash_part,
                                          _bucketed_distinct,
                                          _pd_to_arrow)

    def band_rows(df: pd.DataFrame) -> pa.Table:
        ids = df["media_id"].to_numpy(np.int64)
        hs = df["phash"].to_numpy(np.int64).view(np.uint64)
        outs = []
        for b in range(n_bands):
            bits = (hs >> np.uint64(b * bw)) & mask
            outs.append(pd.DataFrame({
                # band id and band bits fused into one int64 key
                "bkey": (bits.astype(np.int64) * n_bands + b),
                "id": ids,
                "phash": hs.astype(np.int64)}))
        out = pd.concat(outs, ignore_index=True)
        return _pd_to_arrow(_add_hash_part(out, ["bkey"], nparts))

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        for _, g in df.groupby("bkey", sort=False):
            if len(g) < 2:
                continue
            ids = g["id"].to_numpy(np.int64)
            hs = g["phash"].to_numpy(np.int64).view(np.uint64)
            o = np.argsort(ids)
            ids, hs = ids[o], hs[o]
            iu, ju = np.triu_indices(len(ids), k=1)
            if len(iu) > max_pairs_per_bucket:
                iu, ju = iu[:max_pairs_per_bucket], \
                    ju[:max_pairs_per_bucket]
            d = _popcount64(hs[iu] ^ hs[ju])
            keep = d <= max_dist
            out_a.append(ids[iu[keep]])
            out_b.append(ids[ju[keep]])
            out_d.append(d[keep])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "hamming": pa.array(np.concatenate(out_d), pa.int64())})

    cand = hashed.map_batches(band_rows, batch_format="pandas") \
        .groupby("_part").map_groups(bucket_pairs,
                                     batch_format="pandas")
    return _bucketed_distinct(cand, ["id_a", "id_b", "hamming"],
                              nparts)


# ---------------------------------------------------------------------------
# audio fingerprint near-duplicate detection — the WAV-side member of
# the multimodal dedup family (energy-delta fingerprint, a time-domain
# simplification of Haitsma & Kalker's "A highly robust audio
# fingerprinting system", ISMIR 2002)
# ---------------------------------------------------------------------------

def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit ENERGY-DELTA fingerprint of a PCM sample vector: 65
    integer-boundary frames, frame energy = Σ sample² (exact int64
    sums — int16 squares can't overflow 64 bits below ~2⁴⁰ samples),
    bit ``i`` set iff ``E[i] > E[i+1]``.  Sign-delta bit streams are
    invariant to uniform gain and robust to short local edits (only
    the frames touching an edit can flip), which is what makes the
    banded Hamming join's distance meaningful."""
    s = np.asarray(samples, np.int64)
    if len(s) < 65:
        raise ValueError(
            f"need >= 65 samples for 65 frames, got {len(s)}")
    e2 = s * s
    bounds = (np.arange(66, dtype=np.int64) * len(s)) // 65
    c = np.concatenate([[0], e2.cumsum()])
    energy = c[bounds[1:]] - c[bounds[:-1]]
    bits = (energy[:-1] > energy[1:]).astype(np.uint64)
    return int(np.sum(bits << np.arange(64, dtype=np.uint64)))


class AudioFingerprintStage:
    """Actor-pool stage: binary WAV payload → ``(media_id, phash)``
    via :func:`decode_wav` + :func:`audio_fingerprint64` — the audio
    twin of :class:`PerceptualHashStage`, feeding the same
    :func:`banded_hamming_pairs` join."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for m in batch["media"]:
            samples, _rate = decode_wav(m.as_py())
            hashes.append(np.uint64(
                audio_fingerprint64(samples)).astype(np.int64))
        return pa.table({
            "media_id": batch["media_id"],
            "phash": pa.array(np.array(hashes, np.int64), pa.int64())})


def audio_neardup_pairs(media_ds, max_dist: int = 6, n_bands: int = 8,
                        nparts: int = 32,
                        max_pairs_per_bucket: int = 20_000,
                        concurrency=(1, 4)):
    """Audio near-duplicate pairs: actor-pool WAV decode +
    energy-delta fingerprint, then the shared banded Hamming join →
    Dataset ``(id_a, id_b, hamming)`` with ``id_a < id_b``."""
    hashed = media_ds.map_batches(
        AudioFingerprintStage, batch_format="pyarrow", batch_size=32,
        concurrency=concurrency).materialize()
    return banded_hamming_pairs(hashed, max_dist=max_dist,
                                n_bands=n_bands, nparts=nparts,
                                max_pairs_per_bucket=max_pairs_per_bucket)
