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


def bm25_topk(docs: ray.data.Dataset, query_terms: list[str],
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """Okapi BM25 top-k retrieval over a documents table — the
    classic web-scale lexical ranker, as two narrow passes (no
    shuffle of the corpus at all):

    * **Pass 1 (corpus stats)**: per-batch partials of (n_docs,
      total_dl, per-term df) — a few dozen integers per block folded
      on the driver.  At 100 TB these stats come from the same pass
      that builds the inverted index and are reused across queries.
    * **Pass 2 (score + combine)**: the tiny (term → idf) table is
      broadcast; each batch computes tf for the query terms only
      (token membership via sorted-array searchsorted + bincount —
      no per-token Python), scores matching docs, and keeps a
      per-batch top-k; the driver merges blocks × k rows.

    idf = ln((N − df + ½)/(df + ½) + 1) (the Lucene variant —
    non-negative for df ≤ N).  Scores are emitted as ``score_e6``
    (floor(x·1e6 + ½)) so ranking and the DuckDB oracle compare
    integer-exact; ties break by id.  Tokenization is a literal
    ``split(' ')`` to mirror the SQL twin's ``string_split``.
    """
    import numpy as np
    import pandas as pd

    terms = sorted(set(query_terms))
    tarr = np.array(terms)

    def _empty():
        out = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                            "score_e6": pd.Series(dtype="int64")})
        out["bm25_rank"] = pd.Series(dtype="int64")
        return out[[id_col, "score_e6", "bm25_rank"]]

    if not terms:
        return _empty()   # the SQL twin's `tok IN ()` is empty too

    def _doc_tf(texts):
        """(tf matrix [n_docs × n_terms], doc lengths) for a batch."""
        tf = np.zeros((len(texts), len(terms)), np.int64)
        dl = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = np.array(t.split(" "))
            dl[i] = len(toks)
            pos = np.searchsorted(tarr, toks)
            pos[pos == len(tarr)] = 0
            hit = tarr[pos] == toks
            if hit.any():
                tf[i] = np.bincount(pos[hit], minlength=len(terms))
        return tf, dl

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, dl = _doc_tf(batch[text_col].to_pylist())
        return pa.table({
            "n_docs": pa.array([len(dl)], pa.int64()),
            "total_dl": pa.array([int(dl.sum())], pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).tolist()],
                           pa.list_(pa.int64()))})

    stats = docs.map_batches(stats_partial,
                             batch_format="pyarrow").to_pandas()
    if stats.empty:
        return _empty()   # zero-row corpus
    n_docs = int(stats["n_docs"].sum())
    avgdl = float(stats["total_dl"].sum()) / max(n_docs, 1)
    df = np.sum(np.stack([np.asarray(v) for v in stats["df"]]), axis=0)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    idf_ref = ray.put(idf)

    def score_partial(batch: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        tf, dl = _doc_tf(batch[text_col].to_pylist())
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = (w[None, :] * tf * (k1 + 1.0) / (tf + norm[:, None])).sum(1)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = s > 0
        se6 = np.floor(s[m] * 1e6 + 0.5).astype(np.int64)
        kk = min(k, len(se6))
        if len(se6) > kk:
            # per-batch combiner: top-k by (score desc, id asc)
            order = np.lexsort((ids[m], -se6))[:kk]
        else:
            order = np.arange(len(se6))
        return pa.table({
            id_col: pa.array(ids[m][order]),
            "score_e6": pa.array(se6[order], pa.int64())})

    parts = docs.map_batches(score_partial,
                             batch_format="pyarrow").to_pandas()
    if parts.empty:
        # all-empty blocks lose the schema through to_pandas
        parts = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              "score_e6": pd.Series(dtype="int64")})
    top = parts.sort_values(["score_e6", id_col],
                            ascending=[False, True]).head(k)
    top = top.reset_index(drop=True)
    top["bm25_rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[[id_col, "score_e6", "bm25_rank"]]
