"""Multimodal plumbing: decode stage schema/fingerprints, frame
sampling, and the memory-aware batch wiring."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from sbb_ned_ray.stages.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    decode_media,
)


def _media_batch() -> pa.Table:
    payloads = [b"png-bytes-0", b"wav-bytes-1", b""]
    return pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "media": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image/png", "audio/wav", "image/png"]),
        "meta_width": pa.array([64, None, 0], pa.int32()),
        "meta_height": pa.array([64, None, 0], pa.int32()),
        "meta_duration_ms": pa.array([None, 3500, None], pa.int32()),
    })


def test_decode_stage_schema_and_fingerprints():
    out = ImageDecodeStage()(_media_batch())
    assert out.column_names == ["media_id", "media_type", "feature",
                                "n_bytes", "meta_width", "meta_height",
                                "mean_px_e2", "payload_md5"]
    # non-PPM payloads take the fake path: decoded meta is -1
    assert out["meta_width"].to_pylist() == [-1, -1, -1]
    assert out["n_bytes"].to_pylist() == [11, 11, 0]
    assert out["payload_md5"].to_pylist() == [
        hashlib.md5(b"png-bytes-0").hexdigest(),
        hashlib.md5(b"wav-bytes-1").hexdigest(),
        hashlib.md5(b"").hexdigest(),
    ]
    # fake features are deterministic unit vectors (empty payload → 0)
    f0 = np.array(out["feature"][0].as_py())
    assert f0.shape == (16,) and abs(np.linalg.norm(f0) - 1.0) < 1e-6
    again = ImageDecodeStage()(_media_batch())
    assert out["feature"].to_pylist() == again["feature"].to_pylist()


def test_decode_real_path_is_honest():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(fake=False)


def test_frame_sampling_rows_per_duration():
    out = FrameSampleStage(every_ms=1000)(_media_batch())
    # 3500 ms / 1000 → 3 frames for the audio row; 1 frame minimum else
    per_media = {}
    for mid in out["media_id"].to_pylist():
        per_media[mid] = per_media.get(mid, 0) + 1
    assert per_media == {0: 1, 1: 3, 2: 1}
    assert out["frame_no"].to_pylist() == [0, 0, 1, 2, 0]
    # frames are deterministic byte slices of the payload
    frames = [f.as_py() for f, m in zip(out["frame"], out["media_id"])
              if m.as_py() == 1]
    assert b"".join(frames) <= b"wav-bytes-1" or all(frames)


def test_decode_media_dataset_wiring(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_media_batch())
    out = decode_media(ds, batch_size=2).to_pandas()
    assert len(out) == 3
    assert set(out.columns) == {"media_id", "media_type", "feature",
                                "n_bytes", "meta_width", "meta_height",
                                "mean_px_e2", "payload_md5"}


def test_ppm_roundtrip_and_resize():
    from sbb_ned_ray.stages.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    # spec allows comments + arbitrary whitespace in the header
    hdr = b"P6 # a comment\n# another\n 9\t6\n255\n"
    assert np.array_equal(
        decode_ppm(hdr + arr.tobytes()), arr)
    small = resize_nearest(arr, 4)
    assert small.shape == (4, 4, 3)
    # nearest-neighbour: every output pixel is some input pixel
    flat_in = {tuple(p) for p in arr.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in small.reshape(-1, 3))


def test_ppm_payloads_decode_for_real():
    from sbb_ned_ray.stages.multimodal import ImageDecodeStage, encode_ppm

    arr = np.full((5, 7, 3), 10, dtype=np.uint8)
    arr[:, :, 0] = 250                       # red-heavy image
    batch = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "media": pa.array([encode_ppm(arr)], pa.binary()),
        "media_type": pa.array(["image/x-portable-pixmap"]),
    })
    out = ImageDecodeStage()(batch)
    assert out["meta_width"].to_pylist() == [7]
    assert out["meta_height"].to_pylist() == [5]
    assert out["mean_px_e2"].to_pylist() == [9000]   # (250+10+10)/3 = 90
    feat = np.array(out["feature"][0].as_py())
    assert feat.shape == (16,)
    # real feature: mean R channel dominates G/B
    assert feat[0] > feat[1] and feat[0] > feat[2]
    assert abs(feat[0] - 250 / 255) < 1e-6


def test_wav_roundtrip():
    from sbb_ned_ray.stages.multimodal import decode_wav, encode_wav
    s = ((np.arange(77) * 7 + 13) % 2003 - 1001).astype(np.int16)
    payload = encode_wav(s, 12000)
    out, rate = decode_wav(payload)
    assert rate == 12000
    assert np.array_equal(out, s)


def test_wav_chunk_walk_tolerates_extra_chunks():
    import struct

    from sbb_ned_ray.stages.multimodal import decode_wav, encode_wav
    s = np.array([1, -2, 3], np.int16)
    p = encode_wav(s, 8000)
    # splice a LIST chunk (odd size → word-aligned pad) between fmt and data
    fmt_end = p.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = p[:fmt_end] + extra + p[fmt_end:]
    out, rate = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_audio_decode_stage_stats_and_fallback():
    from sbb_ned_ray.stages.multimodal import AudioDecodeStage, encode_wav
    s = np.array([100, -200, 300], np.int16)
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "media": pa.array([encode_wav(s, 8000), b"not audio"], pa.binary()),
    })
    rows = AudioDecodeStage()(batch).to_pylist()
    assert rows[0]["rate"] == 8000 and rows[0]["n_samples"] == 3
    assert rows[0]["duration_ms"] == 3 * 1000 // 8000
    assert rows[0]["mean_abs_e2"] == 20000            # mean(|100,200,300|)=200
    assert rows[0]["peak"] == 300
    assert all(rows[1][k] == -1 for k in
               ("rate", "n_samples", "duration_ms", "mean_abs_e2", "peak"))


# ----------------------------------------------------------- PNG codec

def test_png_roundtrip_all_filters():
    import numpy as np
    from sbb_ned_ray.stages.multimodal import decode_png, encode_png
    rng = np.random.default_rng(21)
    # >5 rows so every filter type 0-4 is exercised (encoder cycles)
    for shape in [(7, 5, 3), (6, 9, 4), (1, 1, 3), (12, 2, 3)]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr)


def test_png_rejects_garbage_and_bad_crc():
    import numpy as np
    import pytest
    from sbb_ned_ray.stages.multimodal import decode_png, encode_png
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    good = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    good[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(good))


def test_image_stage_decodes_png_for_real(ray_session):
    import numpy as np
    import pyarrow as pa
    from sbb_ned_ray.stages.multimodal import ImageDecodeStage, encode_png
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (10, 6, 3)).astype(np.uint8)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media": pa.array([encode_png(arr)], pa.binary()),
        "media_type": pa.array(["image/png"], pa.string())})
    out = ImageDecodeStage()(batch)
    assert out["meta_width"][0].as_py() == 6
    assert out["meta_height"][0].as_py() == 10
    assert out["mean_px_e2"][0].as_py() == \
        int(np.floor(float(arr.mean()) * 100 + 0.5))


def test_image_decode_degrades_on_malformed_payloads(ray_session):
    """Truncated/oversized/short PNG and non-PCM WAV payloads must take
    the stub path (-1 meta), never kill the task (ADVICE round 3)."""
    import struct
    import zlib

    import numpy as np
    import pyarrow as pa

    from sbb_ned_ray.stages.multimodal import (
        AudioDecodeStage,
        ImageDecodeStage,
        _PNG_SIG,
        encode_png,
    )

    good = encode_png(np.zeros((4, 5, 3), np.uint8))
    truncated = good[:24]
    # well-formed chunks claiming a 100k x 100k image (sanity cap)
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    huge = _PNG_SIG + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr \
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)) \
        + struct.pack(">I", 1) + b"IDAT" + b"x" \
        + struct.pack(">I", zlib.crc32(b"IDAT" + b"x"))
    batch = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "media": pa.array([good, truncated, huge], pa.binary()),
        "media_type": pa.array(["image/png"] * 3),
    })
    out = ImageDecodeStage()(batch)
    assert out["meta_width"].to_pylist() == [5, -1, -1]

    bad_wav = b"RIFF" + b"\x00" * 20         # truncated RIFF header
    abatch = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "media": pa.array([bad_wav], pa.binary()),
    })
    aout = AudioDecodeStage()(abatch)
    assert aout["rate"].to_pylist() == [-1]


def test_ahash64_block_exact():
    from sbb_ned_ray.stages.multimodal import ahash64
    # an image built from explicit 0/255 8x8 cells hashes to exactly
    # those bits (cells are uniform, so block mean vs image mean is
    # the planted bit whenever the pattern is mixed)
    bits = np.zeros(64, np.int64)
    bits[[1, 5, 8, 13, 21, 34, 55, 63]] = 1
    cells = (bits.reshape(8, 8) * 255).astype(np.uint8)
    img = np.repeat(np.repeat(cells, 4, 0), 4, 1)
    arr = np.stack([img] * 3, axis=2)
    want = int(np.sum(bits.astype(np.uint64)
                      << np.arange(64, dtype=np.uint64)))
    assert ahash64(arr) == want
    # non-multiple-of-8 dims still hash (integer cell boundaries)
    arr2 = np.repeat(np.repeat(cells, 5, 0), 3, 1)
    assert ahash64(np.stack([arr2] * 3, axis=2)) == want
    # uniform image -> all-zero hash
    assert ahash64(np.full((16, 16, 3), 99, np.uint8)) == 0


def test_phash_neardup_banding_recall(ray_session):
    import pandas as pd
    import ray.data

    from sbb_ned_ray.stages.multimodal import (ahash64, encode_png,
                                               encode_ppm,
                                               phash_neardup_pairs)
    rng = np.random.RandomState(5)
    rows = []
    truth = {}
    for g in range(12):
        base = np.zeros(64, np.int64)
        base[rng.choice(np.arange(1, 63), 20, replace=False)] = 1
        base[63] = 1
        for v in range(3):
            b = base.copy()
            for f in rng.choice(np.arange(1, 63), v, replace=False):
                b[f] ^= 1
            mid = g * 10 + v
            cells = (b.reshape(8, 8) * 255).astype(np.uint8)
            img = np.repeat(np.repeat(cells, 4, 0), 4, 1)
            arr = np.stack([img] * 3, 2)
            rows.append({"media_id": mid,
                         "media": encode_png(arr) if v % 2 == 0
                         else encode_ppm(arr)})
            truth[mid] = ahash64(arr)
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = phash_neardup_pairs(ds, max_dist=6, nparts=4).to_pandas()
    got_set = set(zip(got["id_a"].astype(int),
                      got["id_b"].astype(int),
                      got["hamming"].astype(int)))
    ids = sorted(truth)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(truth[a] ^ truth[b]).count("1")
            if d <= 6:
                want.add((a, b, d))
    assert got_set == want
    assert len(got) == len(got_set)      # distinct output
    # within-group variants are near-dups by construction
    assert all(any(p[0] == g * 10 and p[1] == g * 10 + 1
                   for p in want) for g in range(12))


def test_audio_fingerprint_energy_deltas():
    from sbb_ned_ray.stages.multimodal import (audio_fingerprint64,
                                               decode_wav, encode_wav)
    # equal 6-sample frames with a controlled amplitude walk: the
    # fingerprint bits are exactly the walk direction
    bits = np.zeros(64, np.int64)
    bits[[0, 3, 7, 31, 62, 63]] = 1
    steps = np.where(bits == 1, -2, 2)
    amps = 164 + np.concatenate([[0], np.cumsum(steps)])
    s = np.repeat(amps.astype(np.int64), 6)
    want = int(np.sum(bits.astype(np.uint64)
                      << np.arange(64, dtype=np.uint64)))
    assert audio_fingerprint64(s) == want
    # wav round-trip preserves the fingerprint
    rt, rate = decode_wav(encode_wav(s.astype(np.int16), 8000))
    assert rate == 8000
    assert audio_fingerprint64(rt.astype(np.int64)) == want
    # a 3-sample zeroing inside frame f flips only bits f-1, f
    s2 = s.copy()
    s2[20 * 6:20 * 6 + 3] = 0
    diff = audio_fingerprint64(s) ^ audio_fingerprint64(s2)
    flipped = {i for i in range(64) if (diff >> i) & 1}
    assert flipped <= {19, 20} and flipped
    # too-short input fails loudly
    import pytest
    with pytest.raises(ValueError):
        audio_fingerprint64(np.zeros(64, np.int64))


def test_audio_neardup_pairs_end_to_end(ray_session):
    import pandas as pd
    import ray.data

    from sbb_ned_ray.stages.multimodal import (audio_fingerprint64,
                                               audio_neardup_pairs,
                                               encode_wav)
    rng = np.random.RandomState(3)
    rows, truth = [], {}
    for g in range(10):
        bits = rng.randint(0, 2, 64)
        steps = np.where(bits == 1, -2, 2)
        amps = 164 + np.concatenate([[0], np.cumsum(steps)])
        base = np.repeat(amps.astype(np.int64), 6)
        for v in range(2):
            s = base.copy()
            if v:
                s[15 * 6:15 * 6 + 3] = 0
            mid = g * 10 + v
            rows.append({"media_id": mid,
                         "media": encode_wav(s.astype(np.int16),
                                             16000)})
            truth[mid] = audio_fingerprint64(s)
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    got = audio_neardup_pairs(ds, max_dist=6, nparts=4).to_pandas()
    got_set = set(zip(got["id_a"].astype(int),
                      got["id_b"].astype(int),
                      got["hamming"].astype(int)))
    ids = sorted(truth)
    want = {(a, b, bin(truth[a] ^ truth[b]).count("1"))
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(truth[a] ^ truth[b]).count("1") <= 6}
    assert got_set == want
    assert all(any(p[0] == g * 10 and p[1] == g * 10 + 1
                   for p in want) for g in range(10))
