"""Deterministic text / surface normalization.

Re-implements (semantics only, no code reuse) the reference's surface
pipeline:

* char-normalization map (MUFI historic glyphs → base chars), applied
  per character — reference ``webapp/app.py:273-274`` + table built by
  ``encoding/normalization.py:14-110``;
* OCR-dehyphenation joining ``¬``-split fragments — reference
  ``embeddings/base.py:24-46`` (``dehypener``);
* ``surface_parts`` split on ``[ \\-_]`` + whitespace strip + lowercase —
  reference ``embeddings/base.py:49-76``;
* ``filter_surface`` = parts → dehyphenate → strip ``[\\W_]+`` → drop
  empties — reference ``embeddings/base.py:79-89``;
* a lightweight deterministic suffix stemmer standing in for the
  Snowball stemmer (``webapp/app.py:334``) so tests need no nltk data;
* the anagram char-count embedding — reference
  ``embeddings/anagram.py:21-38`` — our deterministic stand-in for the
  fasttext/BERT part embeddings used by ANN blocking.

Everything here is a pure function of its inputs (versioned; the
fixture generator and the pipeline share these exact functions, which
is what makes the per-url byte-identical invariant testable).
"""

from __future__ import annotations

import functools
import re
import unicodedata

import numpy as np

# MUFI-style historic glyph folding (small deterministic subset; the
# reference loads a full table from sqlite, webapp/app.py:205-216).
NORMALIZATION_MAP: dict[str, str] = {
    "ſ": "s",    # long s
    "ā": "a", "ē": "e", "ī": "i", "ō": "o", "ū": "u",   # macrons
    "æ": "ae", "Æ": "Ae", "œ": "oe", "Œ": "Oe",
    "ƒ": "f", "ʒ": "z",
    "­": "",          # soft hyphen
    "’": "'", "‘": "'", "“": '"', "”": '"',
    "–": "-", "—": "-",
}

_NORM_TRANS = str.maketrans(NORMALIZATION_MAP)

_SPLIT_RE = re.compile(r"[ \-_]")
_WS_RE = re.compile(r"[\s_]+")
_NONWORD_RE = re.compile(r"[\W_]+", re.UNICODE)
_HYPHEN_MARK_RE = re.compile(r"[¬]+")


def normalize_chars(text: str) -> str:
    """Apply the char-normalization map (reference webapp/app.py:273)."""
    return text.translate(_NORM_TRANS)


# Unicode category Cc is exactly U+0000-U+001F and U+007F-U+009F — a
# closed set, so a translate delete-table is equivalent to the per-char
# category test and ~10x faster (this runs over every page's full text)
_CC_DELETE = {cp: None
              for cp in [*range(0x00, 0x20), *range(0x7F, 0xA0)]
              if chr(cp) not in "\n\t"}


def scrub_control_chars(text: str) -> str:
    """Drop unicode Cc-category chars except ``\\n`` / ``\\t``.

    Reference: CLEF converter scrub, ``ground_truth/clef_hipe_2020.py:128-132``.
    """
    return text.translate(_CC_DELETE)


def dehyphenate(parts: list[str]) -> list[str]:
    """Join OCR hyphenation fragments marked with ``¬``.

    A part that *contained* a ``¬`` is glued to the following part(s);
    semantics of reference ``embeddings/base.py:24-46``: strip the marks,
    then concatenate runs separated by empty parts.
    """
    stripped = [_HYPHEN_MARK_RE.sub("", p) for p in parts]
    out: list[str] = []
    cur = ""
    concat = True
    for p in stripped:
        if not p:
            concat = True
            continue
        if not concat:
            out.append(cur)
            cur = ""
        cur += p
        concat = False
    out.append(cur)
    return out


def surface_parts(surface: str | list[str], split_parts: bool = True,
                  lower_case: bool = True) -> list[str]:
    """Split a surface form into parts (reference embeddings/base.py:49-76)."""
    if isinstance(surface, str):
        parts = _SPLIT_RE.split(surface) if split_parts else [surface]
    else:
        parts = ([p for s in surface for p in _SPLIT_RE.split(s)]
                 if split_parts else list(surface))
    if split_parts:
        parts = [_WS_RE.sub("", p) for p in parts]
    if lower_case:
        parts = [p.lower() for p in parts]
    return [p for p in parts if p]


@functools.lru_cache(maxsize=131072)
def _filter_surface_str(surface: str, split_parts: bool,
                        lower_case: bool) -> tuple[str, ...]:
    """Memoized str-input core of :func:`filter_surface` — surfaces
    repeat heavily inside a batch (mentions of the same entity, Zipf
    vocabulary), and this chain is ~40% of the fused-worker UDF when
    recomputed per call (cProfile, BASELINE round 3)."""
    parts = surface_parts(surface, split_parts, lower_case)
    parts = dehyphenate(parts)
    parts = [_NONWORD_RE.sub("", p) for p in parts]
    return tuple(p for p in parts if p)


def filter_surface(surface: str | list[str], split_parts: bool = True,
                   lower_case: bool = True) -> list[str]:
    """parts → dehyphenate → strip non-word chars → drop empties.

    Reference ``embeddings/base.py:79-89``. This is the normalized-surface
    blocking-key generator.
    """
    if isinstance(surface, str):
        return list(_filter_surface_str(surface, split_parts, lower_case))
    parts = surface_parts(surface, split_parts, lower_case)
    parts = dehyphenate(parts)
    parts = [_NONWORD_RE.sub("", p) for p in parts]
    return [p for p in parts if p]


_STEM_SUFFIXES = ("ernes", "erne", "eren", "ens", "ern", "er", "es", "en",
                  "em", "e", "s", "n")


def light_stem(part: str) -> str:
    """Deterministic suffix stemmer (stand-in for Snowball, app.py:334).

    Strips the longest matching German/English inflection suffix when the
    remaining stem keeps length ≥ 4. Pure + dependency-free.
    """
    for suf in _STEM_SUFFIXES:
        if part.endswith(suf) and len(part) - len(suf) >= 4:
            return part[: -len(suf)]
    return part


@functools.lru_cache(maxsize=131072)
def normalized_surface_key(surface: str) -> str:
    """Canonical blocking key: char-normalize → filter_surface → join.
    Memoized (pure str → str, heavy surface repetition per batch)."""
    return " ".join(filter_surface(normalize_chars(surface)))


# ---------------------------------------------------------------------------
# Anagram embedding (reference embeddings/anagram.py:21-38): NFKD → ascii →
# lower → per-char count vector over [a-z], L2-normalized.  Deterministic,
# model-free; used as the part-embedding for ANN-style candidate distances.
# ---------------------------------------------------------------------------

_VALID_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"
_CHAR_IDX = {c: i for i, c in enumerate(_VALID_CHARS)}
ANAGRAM_DIM = len(_VALID_CHARS)


def anagram_vector(part: str) -> np.ndarray:
    """L2-normalized char-count vector of the ascii-folded lowercase part."""
    folded = (unicodedata.normalize("NFKD", part)
              .encode("ascii", "ignore").decode().lower())
    counts = np.zeros(ANAGRAM_DIM, dtype=np.float32)
    for c in folded:
        i = _CHAR_IDX.get(c)
        if i is not None:
            counts[i] += 1.0
    norm = float(np.sqrt((counts * counts).sum()))
    if norm > 0:
        counts /= norm
    return counts


def anagram_matrix(parts: list[str]) -> np.ndarray:
    """Stacked anagram vectors, shape (len(parts), 26)."""
    if not parts:
        return np.zeros((0, ANAGRAM_DIM), dtype=np.float32)
    return np.stack([anagram_vector(p) for p in parts])


def angular_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Annoy-style angular distance = sqrt(2·(1−cos)) between unit vectors.

    The dot product accumulates in float64 regardless of input dtype so the
    result matches the batched float64 matmul in AliasIndex.probe_part bit
    for bit (sqrt near 0 amplifies float32 accumulation jitter ~1e-4).
    """
    cos = float(np.clip(np.dot(a.astype(np.float64), b.astype(np.float64)),
                        -1.0, 1.0))
    return float(np.sqrt(max(0.0, 2.0 * (1.0 - cos))))
