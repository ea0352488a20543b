"""Text-analysis primitives for the training-data pipeline operators:
language ID (stopword/n-gram heuristic), quality scoring, token
counting, and tokenization helpers.  Pure, deterministic, vectorizable
per batch.
"""

from __future__ import annotations

import re

import numpy as np

WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

STOPWORDS = {
    "de": {"der", "die", "das", "und", "in", "von", "mit", "auf", "für",
           "als", "auch", "bei", "nach", "aus", "dem", "den", "des", "ist",
           "war", "wird", "wurde", "ein", "eine", "einem", "einer", "zu"},
    "en": {"the", "of", "and", "in", "to", "was", "is", "for", "with", "at",
           "from", "by", "on", "as", "that", "this", "it", "are", "be",
           "an", "a", "or", "not", "but"},
}


def tokenize_ws(text: str) -> list[str]:
    """Whitespace tokens (SQL-mirrorable: regexp split on \\s+)."""
    return [t for t in re.split(r"\s+", text) if t]


def tokenize_bpeish(text: str) -> list[str]:
    return BPE_RE.findall(text)


def stopword_scores(tokens_lower: set[str]) -> dict[str, float]:
    return {lang: len(tokens_lower & sw) for lang, sw in STOPWORDS.items()}


def detect_lang(text: str) -> str:
    """Stopword-count language ID with a deterministic tie-break ('de' <
    'en' alphabetically, matching the SQL oracle expression)."""
    toks = {t.lower() for t in WORD_RE.findall(text)}
    scores = stopword_scores(toks)
    best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return best[0]


def quality_features(text: str) -> dict[str, float]:
    """Deterministic quality-scoring features (SQL-mirrorable)."""
    n_chars = len(text)
    n_punct = len(PUNCT_RE.findall(text))
    toks = tokenize_ws(text)
    n_tokens = len(toks)
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "mean_token_len": mean_tok,
    }


def quality_score(feat: dict[str, float]) -> float:
    """Single scalar in [0,1]: penalize very short docs, punctuation walls,
    and degenerate token lengths.  Fixed piecewise-linear formula so the
    DuckDB oracle can reproduce it exactly."""
    length_term = min(feat["n_tokens"], 100.0) / 100.0
    punct_term = max(0.0, 1.0 - 4.0 * feat["punct_ratio"])
    tok_term = 1.0 if 3.0 <= feat["mean_token_len"] <= 12.0 else 0.5
    return round(length_term * punct_term * tok_term, 6)
