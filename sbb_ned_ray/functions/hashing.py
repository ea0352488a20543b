"""Deterministic hashing primitives: stable 64-bit hashes, MinHash,
SimHash, rolling-hash fingerprints.

Used by (a) char-n-gram MinHash-LSH blocking for candidate generation
(north_star: "character n-gram MinHash-LSH buckets"), and (b) the
training-data dedup operators (exact / MinHash-LSH / SimHash /
n-gram-Jaccard).  All hashes are content-derived (no Python ``hash()``,
whose seed varies per process) so partition-parallel and re-run results
are stable — FIXTURES.md §7 determinism rules.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE_P = np.uint64((1 << 61) - 1)
_MAX_H = np.uint64((1 << 32) - 1)


def stable_hash64(s: str | bytes) -> int:
    """Content-derived 64-bit hash (blake2b), stable across processes."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def stable_hash_hex(s: str | bytes, digest_size: int = 16) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.blake2b(s, digest_size=digest_size).hexdigest()


def char_ngrams(s: str, n: int = 3) -> list[str]:
    """Character n-gram shingles (padded so short strings still shingle)."""
    padded = f"^{s}$"
    if len(padded) <= n:
        return [padded]
    return [padded[i:i + n] for i in range(len(padded) - n + 1)]


def _shingle_hashes(shingles: list[str]) -> np.ndarray:
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter((stable_hash64(sh) & 0xFFFFFFFF for sh in set(shingles)),
                       dtype=np.uint64)


_ROLL_BASE = np.uint64(1099511628211)   # FNV-ish odd multiplier
_ROLL_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 finalizer constant


def byte_ngram_hashes(text: str, n: int = 5) -> np.ndarray:
    """Vectorized 32-bit hashes of the UNIQUE byte n-gram shingles of
    ``text`` — the MinHash hot path.  One numpy polynomial rolling hash
    over the UTF-8 bytes + a splitmix64-style finalizer replaces a
    per-shingle Python ``blake2b`` loop (~len(text) hashlib calls/doc);
    deterministic and content-derived like :func:`stable_hash64`, just a
    different (public, Rabin-Karp/FNV-family) hash function.  Shingles
    are byte-level with the same ``^…$`` padding as :func:`char_ngrams`
    (identical on ASCII; multi-byte codepoints shingle by byte — fine
    for similarity estimation, which only needs a consistent shingle
    universe)."""
    data = np.frombuffer(f"^{text}$".encode("utf-8"), dtype=np.uint8)
    if data.size <= n:
        return np.array([stable_hash64(data.tobytes()) & 0xFFFFFFFF],
                        dtype=np.uint64)
    m = data.size - n + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(n):  # n (=5) vectorized passes, not a per-shingle loop
        acc = acc * _ROLL_BASE + data[j:m + j]
    # splitmix64 finalizer: positional polynomial hashes of similar
    # windows are correlated; the avalanche decorrelates them
    acc ^= acc >> np.uint64(30)
    acc *= np.uint64(0xBF58476D1CE4E5B9)
    acc ^= acc >> np.uint64(27)
    acc *= np.uint64(0x94D049BB133111EB)
    acc ^= acc >> np.uint64(31)
    return np.unique(acc & _MAX_H)


class MinHasher:
    """num_perm universal-hash MinHash over 32-bit shingle hashes.

    Permutations h_i(x) = (a_i·x + b_i) mod p, seeded deterministically —
    the standard mergeable construction (Broder '97).  Vectorized: one
    matrix op per document.
    """

    def __init__(self, num_perm: int = 32, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(_MERSENNE_P), size=num_perm,
                              dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE_P), size=num_perm,
                              dtype=np.uint64)

    def signature(self, shingles: list[str]) -> np.ndarray:
        """uint64[num_perm] signature; all-max for empty input."""
        return self.signature_from_hashes(_shingle_hashes(shingles))

    def signature_from_text(self, text: str, n: int = 5) -> np.ndarray:
        """Signature straight from text via the vectorized byte-n-gram
        rolling hash (:func:`byte_ngram_hashes`) — the fast path used by
        the dedup stages; ~20× :meth:`signature` + ``char_ngrams``."""
        return self.signature_from_hashes(byte_ngram_hashes(text, n))

    def signature_from_hashes(self, x: np.ndarray) -> np.ndarray:
        if x.size == 0:
            return np.full(self.num_perm, _MAX_H, dtype=np.uint64)
        # (num_perm, n_shingles) — small n keeps this cache-friendly
        hs = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE_P
        return (hs % (_MAX_H + np.uint64(1))).min(axis=1)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """LSH band keys: hash of each band's rows (band id mixed in)."""
        rows = self.num_perm // bands
        keys = []
        for band in range(bands):
            chunk = sig[band * rows:(band + 1) * rows]
            keys.append(stable_hash64(
                band.to_bytes(2, "big") + chunk.tobytes()))
        return keys


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (Charikar '02), vectorized."""
    if not tokens:
        return 0
    hs = np.fromiter((stable_hash64(t) for t in tokens), dtype=np.uint64,
                     count=len(tokens))
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1)  # (n, 64)
    acc = (bits.astype(np.int32) * 2 - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


def hamming64(a: int, b: int) -> int:
    return int(bin(a ^ b).count("1"))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


def rolling_fingerprint(text: str, window: int = 8, keep_mod: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: Rabin-Karp rolling hash over
    char windows, keep hashes ≡ 0 (mod keep_mod).  Deterministic,
    content-defined sampling (Schleimer et al., SIGMOD '03 winnowing idea).
    """
    if len(text) < window:
        return [stable_hash64(text)] if text else []
    base = np.uint64(257)
    mod = np.uint64((1 << 61) - 1)
    data = np.frombuffer(text.encode("utf-8", "ignore")[:1 << 20],
                         dtype=np.uint8)
    if data.size < window:
        return [stable_hash64(text)]
    # vectorized polynomial rolling hash via cumulative powers
    n = data.size
    powers = np.ones(window, dtype=np.uint64)
    for i in range(1, window):
        powers[i] = (powers[i - 1] * base) % mod
    # hash of window starting at i = sum(data[i+j] * powers[window-1-j]) mod p
    out = np.zeros(n - window + 1, dtype=np.uint64)
    for j in range(window):
        out = (out + data[j:n - window + 1 + j].astype(np.uint64)
               * powers[window - 1 - j]) % mod
    sel = out[(out % np.uint64(keep_mod)) == 0]
    return sorted(set(int(v) for v in sel))
