"""Text-analysis stages over a documents table: language ID, quality
scoring, token counting, document fingerprinting.  All vectorized
``map_batches`` transforms with SQL-mirrorable semantics (see
``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import re

import pyarrow as pa
import ray.data

from sbb_ned_ray.functions.hashing import rolling_fingerprint, stable_hash_hex
from sbb_ned_ray.functions.textstats import (
    STOPWORDS,
    WORD_RE,
    detect_lang,
    quality_features,
    quality_score,
    tokenize_bpeish,
    tokenize_ws,
)


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    ws = [len(tokenize_ws(t)) for t in texts]
    bpe = [len(tokenize_bpeish(t)) for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_ws_tokens": pa.array(ws, pa.int64()),
        "n_bpe_tokens": pa.array(bpe, pa.int64()),
    })


def quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    feats = [quality_features(t) for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array([int(f["n_chars"]) for f in feats], pa.int64()),
        "n_tokens": pa.array([int(f["n_tokens"]) for f in feats], pa.int64()),
        "punct_ratio": pa.array([round(f["punct_ratio"], 6) for f in feats],
                                pa.float64()),
        "mean_token_len": pa.array(
            [round(f["mean_token_len"], 6) for f in feats], pa.float64()),
        "quality": pa.array([quality_score(f) for f in feats], pa.float64()),
    })


class LangIdStage:
    """Stateful stage shape: stopword sets + compiled regex built once
    per actor (trivial here, the pattern is what scales to real models)."""

    def __init__(self):
        self.word_re = WORD_RE
        self.stops = {lang: frozenset(sw) for lang, sw in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds, des, ens = [], [], []
        for t in texts:
            toks = {w.lower() for w in self.word_re.findall(t)}
            de = len(toks & self.stops["de"])
            en = len(toks & self.stops["en"])
            des.append(de)
            ens.append(en)
            preds.append("de" if de >= en else "en")
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds, pa.string()),
            "de_hits": pa.array(des, pa.int64()),
            "en_hits": pa.array(ens, pa.int64()),
        })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """content_hash (blake2b — the engine key), content_md5 (cross-engine
    oracle twin: DuckDB has md5() but not blake2b), and winnowing
    fingerprints (engine-specific rolling hash, unit-tested)."""
    import hashlib

    texts = batch["text"].to_pylist()
    return pa.table({
        "doc_id": batch["doc_id"],
        "content_hash": pa.array([stable_hash_hex(t) for t in texts],
                                 pa.string()),
        "content_md5": pa.array(
            [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts],
            pa.string()),
        "fingerprints": pa.array(
            [[fp % (1 << 62) for fp in rolling_fingerprint(t)]
             for t in texts], pa.list_(pa.int64())),
    })


def analyze_documents(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Fused per-doc analysis: lang, quality, token counts (one pass)."""
    def fused(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        tok = token_count_batch(batch)
        lang = LangIdStage()(batch)
        out = q
        out = out.append_column("n_bpe_tokens", tok["n_bpe_tokens"])
        out = out.append_column("pred_lang", lang["pred_lang"])
        return out
    return docs.map_batches(fused, batch_format="pyarrow")
