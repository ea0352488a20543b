"""Real baseline JPEG codec (ITU-T T.81 / JFIF) — pure numpy + stdlib,
the same tier as the PPM/PNG/WAV codecs in :mod:`multimodal`: the
published format needs no image libs, so web-corpus JPEG payloads
decode for REAL in this container (PIL absent).

Scope (honest): baseline sequential DCT (SOF0), 8-bit, grayscale or
YCbCr with per-component sampling factors up to 2x2 (covers 4:4:4,
4:2:2, 4:2:0 — the overwhelming majority of web JPEGs), restart
markers (DRI/RSTn).  Progressive (SOF2), arithmetic coding, 12-bit,
and hierarchical modes raise ``ValueError`` and the decode stage
degrades to the stub-feature path, never killing the Ray task.

The encoder exists so fixtures are self-contained (deterministic
payloads synthesized from parquet ids — no external data): standard
Annex-K quantization tables scaled by the IJG quality rule, standard
Huffman tables, 4:4:4 or 4:2:0.  Entropy decode is per-payload Python
(payloads are small and the stage is an actor-pool inner loop); the
DCT/IDCT, color transforms and upsampling are vectorized numpy over
all blocks of a component at once.

Reference parity: the reference ships image payloads around as opaque
bytes; this codec is the "decode" leg of the multimodal column
contract (SURVEY.md §2.10).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (ITU-T T.81 Annex K — published spec data)
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# (bits[1..16], values) per Annex K
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

assert sum(AC_LUMA_BITS) == len(AC_LUMA_VALS) == 162
assert sum(AC_CHROMA_BITS) == len(AC_CHROMA_VALS) == 162


def _zigzag_order() -> np.ndarray:
    """Generate the 8x8 zigzag permutation (diagonal walk) instead of
    hardcoding 64 constants."""
    idx = np.zeros(64, dtype=np.int64)
    y = x = 0
    for i in range(64):
        idx[i] = y * 8 + x
        if (y + x) % 2 == 0:             # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                y -= 1
                x += 1
        else:                            # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                y += 1
                x -= 1
    return idx


ZIGZAG = _zigzag_order()                 # raster index for zigzag pos k
UNZIGZAG = np.argsort(ZIGZAG)            # zigzag pos for raster index


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5                       # orthonormal DCT-II


DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables."""
    q = int(np.clip(quality, 1, 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:                # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Reads the entropy-coded segment: unstuffs 0xFF00, stops at any
    other marker (RSTn are consumed by the MCU loop via
    :meth:`restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None               # marker that ended the segment

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8          # pad with zeros past the end
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:                    # a real marker ends the segment
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        if self.nbits < length:
            self._fill()
        v = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self):
        """Consume an RSTn marker boundary: drop pad bits, clear the
        marker so reading resumes after it.  If the prefetch never
        reached the marker (short interval), scan forward over the pad
        bytes to find it."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            d, p = self.data, self.pos
            while p + 1 < len(d):
                if d[p] == 0xFF and d[p + 1] != 0x00:
                    self.marker = d[p + 1]
                    self.pos = p
                    break
                p += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2                # skip FF Dn
            self.marker = None


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol → (code, length) in canonical JPEG order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-code decoder: per-length (min_code, max_code, val_ptr)
    — the T.81 DECODE procedure."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read(1)
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("bad huffman code")
            code = (code << 1) | br.read(1)
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t low bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _encode_component_block(bw: _BitWriter, coef_zz: np.ndarray,
                            prev_dc: int, dc_codes, ac_codes) -> int:
    diff = int(coef_zz[0]) - prev_dc
    t = _bit_size(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(coef_zz)[0])) if \
        np.any(coef_zz[1:]) else 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]       # ZRL
            bw.write(c, ln)
            run -= 16
        s = _bit_size(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        c, ln = ac_codes[0x00]           # EOB
        bw.write(c, ln)
    return int(coef_zz[0])


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) → (H//8 * W//8, 64) quantized
    zigzag coefficients, all blocks at once."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    f = np.einsum("ij,njk,lk->nil", DCT, blocks, DCT)
    q = np.round(f / qtab[None]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w) or (h, w, 3) uint8 → baseline JFIF payload.  RGB input is
    converted to YCbCr; ``subsample=True`` writes 4:2:0 (2x2 luma
    sampling), else 4:4:4.  ``restart_interval`` > 0 emits DRI + RSTn
    markers every N MCUs (exercises the decoder's resync path)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (h, w) or (h, w, 3), got {a.shape}")
    h, w = a.shape[:2]
    qy, qc = _quality_tables(quality)

    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtabs = [qy]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def down(p):
                p = _pad_to(p, 2, 2)
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            planes = [yy, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [yy, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [p - 128.0 for p in planes]
        qtabs = [qy, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad each plane to a whole number of MCUs at ITS sampling
    coefs = []
    for p, (hs, vs), qt in zip(planes, samp, qtabs):
        p = _pad_to(p, mcuy * vs * 8, mcux * hs * 8)
        coefs.append((_fdct_quant(p, qt), p.shape[1] // 8))

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
               _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
               _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    mcu_no = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and \
                    mcu_no % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 +
                                 (mcu_no // restart_interval - 1) % 8])
                prev_dc = [0] * len(planes)
            mcu_no += 1
            for ci, (hs, vs) in enumerate(samp):
                zz, bw_blocks = coefs[ci]
                tab = 0 if ci == 0 else 1
                for v in range(vs):
                    for hh in range(hs):
                        bi = (my * vs + v) * bw_blocks + mx * hs + hh
                        prev_dc[ci] = _encode_component_block(
                            bw, zz[bi], prev_dc[ci],
                            dc_tabs[tab], ac_tabs[tab])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy.reshape(-1)[ZIGZAG]
                                     .astype(np.uint8)))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(qc.reshape(-1)[ZIGZAG]
                                         .astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs,
                           0 if ci == 0 else 1)
    out += seg(0xC0, sof)
    for cls, tid, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        tab = 0 if ci == 0 else 1
        sos += struct.pack(">BB", ci + 1, (tab << 4) | tab)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF payload → (h, w) or (h, w, 3) uint8 RGB.

    Marker walk → per-component quantized coefficient planes (entropy
    decode with restart handling) → vectorized dequant + IDCT over all
    blocks per component → nearest upsample → YCbCr→RGB."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple, _HuffDecoder] = {}
    comps = None
    h = w = None
    restart_interval = 0
    scan = None

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", d[pos + 2:pos + 4])
        body = d[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                t = np.zeros(64, np.int32)
                t[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential (SOF0) supported, got "
                f"SOF{marker - 0xC0}")
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise ValueError(f"sampling {hs}x{vs} unsupported")
                comps.append({"id": cid, "hs": hs, "vs": vs, "tq": tq})
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + si * 2:3 + si * 2]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if comps is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    if len(scan) != len(comps):
        # a legal baseline file may carry several sequential
        # NON-interleaved scans (one component each); this decoder
        # handles only the single interleaved-scan layout — decoding
        # just the first scan would silently return wrong pixels
        raise ValueError(
            f"non-interleaved scan (ns={len(scan)} of {len(comps)} "
            "components) not supported")
    if h * w > (1 << 26):
        raise ValueError(f"image too large: {w}x{h}")

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    order = []
    for cs, dct_, act_ in scan:
        ci = next(i for i, c in enumerate(comps) if c["id"] == cs)
        order.append((ci, dct_, act_))
    for c in comps:
        c["bw"] = mcux * c["hs"]
        c["bh"] = mcuy * c["vs"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)

    br = _BitReader(d, pos)
    prev_dc = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            prev_dc = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, dct_, act_ in order:
            c = comps[ci]
            dc_dec = huff[(0, dct_)]
            ac_dec = huff[(1, act_)]
            for v in range(c["vs"]):
                for hh in range(c["hs"]):
                    blk = np.zeros(64, np.int32)
                    t = dc_dec.decode(br)
                    prev_dc[ci] += _extend(br.read(t), t)
                    blk[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        rs = ac_dec.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16   # ZRL
                                continue
                            break         # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(br.read(s), s)
                        k += 1
                    bi = (my * c["vs"] + v) * c["bw"] + mx * c["hs"] + hh
                    c["coef"][bi] = blk

    planes = []
    for c in comps:
        # de-zigzag then dequant in raster order
        zz = c["coef"].astype(np.float64)
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        raster *= qtabs[c["tq"]].reshape(-1)[None, :]
        blocks = raster.reshape(-1, 8, 8)
        spat = np.einsum("ji,njk,kl->nil", DCT, blocks, DCT) + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = spat.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw_ * 8)
        # nearest upsample to full resolution
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, 0), rx, 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    yy, cb, cr = planes
    r = yy + 1.402 * (cr - 128.0)
    g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yy + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)
