"""Baseline JPEG codec (stages/jpeg.py): roundtrip quality bounds,
restart markers, subsampling, honest failures, and the decode stage's
sniff + degrade path."""

from __future__ import annotations

import numpy as np
import pytest

from sbb_ned_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _ramp(h, w, seed=0):
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([20 + seed % 50 + y * 2 + x,
                     30 + x * 2 + y,
                     40 + y + x], -1).astype(np.uint8)


def test_flat_block_roundtrips_exact():
    a = np.full((16, 16), 120, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(a, 95)), a)


def test_smooth_rgb_roundtrip_bounds():
    a = _ramp(24, 31)
    for ss in (False, True):
        out = decode_jpeg(encode_jpeg(a, 92, subsample=ss))
        err = np.abs(out.astype(int) - a.astype(int))
        assert out.shape == a.shape
        assert err.max() <= (16 if ss else 8), err.max()
        assert err.mean() <= 4.0


def test_noise_roundtrip_behaves_like_jpeg():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    hi = decode_jpeg(encode_jpeg(a, 95))
    lo = decode_jpeg(encode_jpeg(a, 40))
    e_hi = np.abs(hi.astype(int) - a.astype(int)).mean()
    e_lo = np.abs(lo.astype(int) - a.astype(int)).mean()
    assert e_hi < e_lo          # higher quality → lower error
    assert len(encode_jpeg(a, 40)) < len(encode_jpeg(a, 95))


def test_restart_markers_are_transparent():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (33, 50, 3)).astype(np.uint8)
    base444 = decode_jpeg(encode_jpeg(a, 85))
    base420 = decode_jpeg(encode_jpeg(a, 85, subsample=True))
    for ri in (1, 2, 3, 5, 7, 11):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(a, 85, restart_interval=ri)), base444)
    for ri in (1, 2, 5):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(a, 85, subsample=True,
                                    restart_interval=ri)), base420)


def test_grayscale_and_odd_sizes():
    rng = np.random.default_rng(2)
    for h, w in ((1, 1), (7, 9), (17, 23), (8, 8)):
        g = rng.integers(0, 256, (h, w)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, 90))
        assert out.shape == (h, w)
        c = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for ss in (False, True):
            out = decode_jpeg(encode_jpeg(c, 90, subsample=ss))
            assert out.shape == (h, w, 3)


def test_honest_failures():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")          # not a JPEG
    good = encode_jpeg(_ramp(16, 16), 90)
    # flip SOF0 to SOF2 (progressive) — must refuse, not garbage out
    i = good.index(b"\xff\xc0")
    bad = good[:i] + b"\xff\xc2" + good[i + 2:]
    with pytest.raises(ValueError):
        decode_jpeg(bad)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(good[:len(good) // 3])          # truncated


def test_decode_stage_sniffs_jpeg_and_degrades(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sbb_ned_ray.stages.multimodal import ImageDecodeStage

    a = _ramp(12, 17)
    good = encode_jpeg(a, 92)
    i = good.index(b"\xff\xc0")
    progressive = good[:i] + b"\xff\xc2" + good[i + 2:]
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media": pa.array([good, progressive], pa.binary()),
        "media_type": pa.array(["image/jpeg"] * 2, pa.string()),
    })
    out = rd.from_arrow(t) \
        .map_batches(ImageDecodeStage, batch_format="pyarrow",
                     batch_size=8, concurrency=1) \
        .to_pandas().sort_values("media_id")
    assert list(out["meta_width"]) == [17, -1]      # real vs degraded
    assert list(out["meta_height"]) == [12, -1]


def _tamper_sos_table_selector(buf: bytes) -> bytes:
    """Point the first SOS component at undefined huffman tables
    (selector 0xF/0xF) — the corrupt-web-JPEG shape that must raise a
    catchable error, not kill the decode task with a KeyError escape."""
    b = bytearray(buf)
    i = 2
    while i < len(b) - 1:
        assert b[i] == 0xFF
        marker = b[i + 1]
        seglen = int.from_bytes(b[i + 2:i + 4], "big")
        if marker == 0xDA:
            b[i + 6] = 0xFF   # first component's (dc<<4 | ac) selector
            return bytes(b)
        i += 2 + seglen
    raise AssertionError("no SOS found")


def test_corrupt_table_ids_raise_catchable_errors():
    a = _ramp(16, 16)
    bad = _tamper_sos_table_selector(encode_jpeg(a, 90))
    with pytest.raises((ValueError, KeyError)):
        decode_jpeg(bad)


def test_noninterleaved_multi_scan_raises_not_misdecodes():
    """A baseline file whose first SOS covers fewer components than
    SOF declares (sequential non-interleaved layout) must raise — the
    decoder handles only the interleaved single-scan layout, and
    decoding just the luma scan would silently return wrong pixels."""
    buf = encode_jpeg(_ramp(16, 16), 90)
    b = bytearray(buf)
    i = 2
    while i < len(b) - 1:
        marker = b[i + 1]
        seglen = int.from_bytes(b[i + 2:i + 4], "big")
        if marker == 0xDA:
            # rewrite ns=3 → ns=1 (shrink the SOS header in place:
            # keep comp 1's entry, drop the other two, fix seglen)
            sos = b[i + 4:i + 4 + seglen - 2]
            assert sos[0] == 3
            new = bytes([1]) + bytes(sos[1:3]) + bytes(sos[7:])
            b[i + 2:i + 4] = (len(new) + 2).to_bytes(2, "big")
            b[i + 4:i + 4 + seglen - 2] = new
            break
        i += 2 + seglen
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(bytes(b))
