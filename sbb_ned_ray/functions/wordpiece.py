"""Learned WordPiece vocabulary.

Reference analog: the BERT tokenizer the cross-encoder features are
built with (``ground_truth/data_processor.py:499-503`` loads a
pretrained vocab; pieces consumed at ``data_processor.py:506-601``).
The reference ships a pretrained vocab file; here the vocab is LEARNED
from the KB corpus with the published WordPiece training procedure
(Schuster & Nakajima 2012; the pair-scoring variant documented for
BERT-style tokenizers): start from the observed character alphabet
(continuation pieces prefixed ``##``), repeatedly merge the adjacent
symbol pair maximizing ``freq(ab) / (freq(a) · freq(b))``, stop at
``vocab_size``.  Runtime tokenization is greedy longest-match-first
(max-munch) exactly like BERT's WordpieceTokenizer.

Ids keep the engine's reserved conventions
(:mod:`sbb_ned_ray.stages.features`): PAD=0, UNK=999, CLS=101,
SEP=102; learned pieces occupy [1000, 1000+len(vocab)).

Scale path: word counts come from a Ray ``map_batches`` partial-count
→ ``groupby(token).sum`` job (:func:`corpus_word_counts`) — only the
(bounded) distinct-token table reaches the driver; the merge loop
itself is inherently small-data (it runs over the word-count table,
not the corpus).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import Counter

UNK_ID = 999
PIECE_ID_BASE = 1000
WORDPIECE_FORMAT_VERSION = 1
MAX_INPUT_CHARS_PER_WORD = 100   # BERT WordpieceTokenizer convention


def learn_wordpiece(word_counts: dict[str, int], vocab_size: int = 4000,
                    min_pair_freq: int = 2) -> list[str]:
    """WordPiece trainer: word frequency table → ordered piece list.

    Deterministic: ties in the merge score break on the lexicographic
    pair.  ``vocab_size`` counts pieces only (specials live outside).
    """
    # split every word into symbols: first char bare, rest ##-prefixed
    words: list[tuple[list[str], int]] = []
    alphabet: set[str] = set()
    for w, c in sorted(word_counts.items()):
        if not w or len(w) > MAX_INPUT_CHARS_PER_WORD:
            continue
        syms = [w[0]] + [f"##{ch}" for ch in w[1:]]
        words.append((syms, int(c)))
        alphabet.update(syms)
    vocab: list[str] = sorted(alphabet)
    if len(vocab) >= vocab_size:
        return vocab[:vocab_size]
    while len(vocab) < vocab_size:
        pair_freq: Counter = Counter()
        sym_freq: Counter = Counter()
        for syms, c in words:
            for s in syms:
                sym_freq[s] += c
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] += c
        best, best_score = None, 0.0
        for (a, b), f in pair_freq.items():
            if f < min_pair_freq:
                continue
            score = f / (sym_freq[a] * sym_freq[b])
            if score > best_score or (score == best_score and
                                      (best is None or (a, b) < best)):
                best, best_score = (a, b), score
        if best is None:
            break
        a, b = best
        merged = a + b[2:]
        vocab.append(merged)
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [merged]
                else:
                    i += 1
    return vocab


class WordPieceVocab:
    """Greedy longest-match-first WordPiece tokenizer over a learned
    piece list; drop-in for the hash stub behind
    :class:`sbb_ned_ray.stages.features.FeatureConverter`."""

    def __init__(self, pieces: list[str]):
        self.pieces = list(pieces)
        self.piece_ids = {p: PIECE_ID_BASE + i
                          for i, p in enumerate(self.pieces)}
        self._cache: dict[str, list[tuple[str, int]]] = {}
        self._max_piece_len = max((len(p) for p in self.pieces), default=1)

    def __len__(self) -> int:
        return len(self.pieces)

    def encode_token(self, token: str) -> list[tuple[str, int]]:
        """token → [(piece, id), ...]; whole token → [("[UNK]", 999)]
        when any position fails to match (BERT max-munch semantics)."""
        out = self._cache.get(token)
        if out is not None:
            return out
        if not token or len(token) > MAX_INPUT_CHARS_PER_WORD:
            return [("[UNK]", UNK_ID)]
        pieces: list[tuple[str, int]] = []
        start, n = 0, len(token)
        while start < n:
            end = min(n, start + self._max_piece_len + 2)
            cur = None
            while start < end:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                pid = self.piece_ids.get(sub)
                if pid is not None:
                    cur = (sub, pid)
                    break
                end -= 1
            if cur is None:
                out = [("[UNK]", UNK_ID)]
                break
            pieces.append(cur)
            start = end
        else:
            out = pieces
        if len(self._cache) > 500_000:
            self._cache.clear()
        self._cache[token] = out
        return out

    # -- artifact ----------------------------------------------------------

    def fingerprint(self) -> str:
        h = hashlib.sha256()
        for p in self.pieces:
            h.update(p.encode())
            h.update(b"\x00")
        h.update(f"v{WORDPIECE_FORMAT_VERSION}".encode())
        return h.hexdigest()[:16]

    def save(self, path: str) -> str:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"format_version": WORDPIECE_FORMAT_VERSION,
                       "fingerprint": self.fingerprint(),
                       "pieces": self.pieces}, f)
        os.replace(tmp, path)
        return self.fingerprint()

    @classmethod
    def load(cls, path: str) -> "WordPieceVocab":
        with open(path, encoding="utf-8") as f:
            d = json.load(f)
        if d.get("format_version") != WORDPIECE_FORMAT_VERSION:
            raise ValueError(
                f"wordpiece artifact {path}: format_version "
                f"{d.get('format_version')} != {WORDPIECE_FORMAT_VERSION}")
        v = cls(d["pieces"])
        if d.get("fingerprint") and v.fingerprint() != d["fingerprint"]:
            raise ValueError(f"wordpiece artifact {path}: content does not "
                             "match its recorded fingerprint")
        return v


# per-worker-process artifact cache (same pattern as the decider-model
# cache, stages/decider.py) — the vocab file loads once per worker
_VOCAB_CACHE: dict[str, WordPieceVocab] = {}


def load_vocab_cached(path: str) -> WordPieceVocab:
    v = _VOCAB_CACHE.get(path)
    if v is None:
        v = WordPieceVocab.load(path)
        _VOCAB_CACHE[path] = v
    return v


def corpus_word_counts(ds, list_col: str | None = None,
                       text_col: str | None = None):
    """Distributed word counts: per-batch ``Counter`` partials →
    ``groupby(token).sum`` — the pre-aggregation keeps the shuffle at
    distinct-token width, not corpus width.  Returns the counts as a
    driver-side dict (distinct tokens are bounded: they ARE the vocab
    universe the learner runs on).

    ``list_col``: a ``list<string>`` token column (e.g. kb_sentences
    tokens); ``text_col``: a plain text column, whitespace-split after
    per-token normalization (matching the mention pipeline's token
    form).
    """
    import pyarrow as pa

    from sbb_ned_ray.state.alias_index import normalize_token

    def partial_counts(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        if list_col is not None:
            for toks in t[list_col].to_pylist():
                c.update(toks)
        if text_col is not None:
            for txt in t[text_col].to_pylist():
                c.update(x for x in (normalize_token(w)
                                     for w in str(txt).split()) if x)
        return pa.table({
            "token": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    agg = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby("token").sum("n")
    return {r["token"]: int(r["sum(n)"]) for r in agg.iter_rows()}
