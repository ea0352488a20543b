"""Stage: training-corpus preparation operators — PII redaction,
fixed-window chunking, repetition quality stats, and test-set
decontamination.

These are the remaining "what a 100 TB training-data pipeline needs"
operators beyond dedup/quality/lang-id (`stages/analysis`,
`stages/dedup`): scrub personally identifiable substrings before
training, split documents into model-window chunks, measure
repetitiveness (the Gopher repetition-fraction family), and drop
training documents that leak evaluation content (n-gram overlap
decontamination).  Every operator is a `map_batches` transform or a
bucketed co-shuffle join with an exact DuckDB oracle twin
(`pipelines/queries.py`); both engines run RE2 regexes, so redaction
is bit-identical across Ray and the oracle.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from sbb_ned_ray.functions.hashing import stable_hash64

# RE2 syntax, shared verbatim with the DuckDB oracles (both engines
# compile RE2 — identical match semantics by construction).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII redaction: count then replace emails / phone numbers / IPv4
    addresses with typed placeholder tokens.  Pure `pyarrow.compute`
    (zero-copy Arrow in, vectorized RE2 kernels, Arrow out) — the shape
    that streams at corpus scale.  Emails are replaced first so the
    IPv4 pass cannot fire inside a numeric mail domain."""
    text = batch[text_col]
    n_email = pc.count_substring_regex(text, EMAIL_RE)
    n_phone = pc.count_substring_regex(text, PHONE_RE)
    n_ip = pc.count_substring_regex(text, IPV4_RE)
    red = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    red = pc.replace_substring_regex(red, IPV4_RE, "<IP>")
    red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
    return pa.table({
        "doc_id": batch["doc_id"],
        "redacted": red,
        "n_email": pc.cast(n_email, pa.int64()),
        "n_phone": pc.cast(n_phone, pa.int64()),
        "n_ip": pc.cast(n_ip, pa.int64()),
    })


def chunk_batch(batch: pa.Table, chunk_size: int = 32,
                stride: int = 24, text_col: str = "text") -> pa.Table:
    """Fixed-window chunking with overlap: one output row per token
    window ``[s, s+chunk_size)`` for ``s = 0, stride, 2·stride, … < n``
    (the training-corpus "pack documents into model windows" op).  A
    flat-map: rows out ≈ rows in × n/stride, streaming block by block."""
    doc_ids, chunk_nos, texts_out, n_toks = [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(),
                         batch[text_col].to_pylist()):
        toks = text.split(" ")
        for no, s in enumerate(range(0, len(toks), stride)):
            w = toks[s:s + chunk_size]
            doc_ids.append(did)
            chunk_nos.append(no)
            texts_out.append(" ".join(w))
            n_toks.append(len(w))
    return pa.table({
        "doc_id": pa.array(doc_ids, batch["doc_id"].type),
        "chunk_no": pa.array(chunk_nos, pa.int64()),
        "n_tokens": pa.array(n_toks, pa.int64()),
        "chunk_text": pa.array(texts_out, pa.string()),
    })


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Repetition quality stats per document (the Gopher repetition
    filters, Rae et al. 2021 §A1.1): duplicate-token fraction, top-token
    fraction, top-bigram fraction.  Fractions are emitted as exact e6
    integers via ``floor(x·1e6 + 0.5)`` — the identical float expression
    runs in the DuckDB oracle, so the hash compare is bit-stable."""
    doc_ids = batch["doc_id"]
    n_l, d_l, dup_l, top_l, topb_l = [], [], [], [], []
    for text in batch[text_col].to_pylist():
        toks = text.split(" ")
        n = len(toks)
        c = Counter(toks)
        distinct = len(c)
        top = max(c.values())
        topb = max(Counter(zip(toks, toks[1:])).values()) if n > 1 else 0
        n_l.append(n)
        d_l.append(distinct)
        dup_l.append(math.floor((1.0 - distinct / n) * 1000000.0 + 0.5))
        top_l.append(math.floor(top * 1000000.0 / n + 0.5))
        topb_l.append(math.floor(topb * 1000000.0 / max(n - 1, 1) + 0.5))
    return pa.table({
        "doc_id": doc_ids,
        "n_tokens": pa.array(n_l, pa.int64()),
        "distinct_tokens": pa.array(d_l, pa.int64()),
        "dup_frac_e6": pa.array(dup_l, pa.int64()),
        "top_token_frac_e6": pa.array(top_l, pa.int64()),
        "top_bigram_frac_e6": pa.array(topb_l, pa.int64()),
    })


def _gram_rows(batch: pa.Table, n: int, marker: bool,
               text_col: str = "text") -> pa.Table:
    """(doc_id, gram_hash) rows for every word n-gram; test-set rows
    carry ``doc_id = -1`` so both sides union into one co-shuffle."""
    doc_ids, hashes = [], []
    for did, text in zip(batch["doc_id"].to_pylist(),
                         batch[text_col].to_pylist()):
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            doc_ids.append(-1 if marker else did)
            hashes.append(stable_hash64(" ".join(toks[i:i + n])))
    # stable_hash64 is unsigned 64-bit; reinterpret as signed for Arrow
    h = np.asarray(hashes, np.uint64).view(np.int64) if hashes else \
        np.zeros(0, np.int64)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "gram_hash": pa.array(h, pa.int64()),
    })


def decontaminate_ids(train: ray.data.Dataset, test: ray.data.Dataset,
                      n: int = 13, num_buckets: int = 32) -> pd.DataFrame:
    """Training-set decontamination: train doc_ids sharing ANY word
    n-gram with the held-out set (the published 13-gram eval-leakage
    rule, cf. GPT-3 appx C / Gopher §A2).  Both sides flat-map to
    (doc_id, gram_hash) rows, union, hash-bucket on the gram, and one
    vectorized ``isin`` per bucket emits the contaminated ids — a
    bucketed co-shuffle SEMI-join, never materializing either gram set
    on the driver.  Size ``num_buckets`` so a bucket fits one worker."""
    train_rows = train.map_batches(
        lambda b: _gram_rows(b, n, marker=False), batch_format="pyarrow")
    test_rows = test.map_batches(
        lambda b: _gram_rows(b, n, marker=True), batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["gram_hash"].to_numpy(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int32)
        return df

    def semi(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64")})
        test_set = set(df.loc[df.doc_id < 0, "gram_hash"])
        hit = df[(df.doc_id >= 0) & df.gram_hash.isin(test_set)]
        return hit[["doc_id"]].drop_duplicates()

    out = train_rows.union(test_rows) \
        .map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(semi, batch_format="pandas") \
        .to_pandas()
    return out.drop_duplicates().sort_values("doc_id") \
        .reset_index(drop=True)


def _gram_pos_rows(batch: pa.Table, n: int,
                   text_col: str = "text") -> pa.Table:
    """(doc_id, pos, gram_hash) rows for every word n-gram.  Each token
    is hashed once; the gram hash is a vectorized polynomial combine
    over a sliding window of the token-hash array (uint64 wraparound =
    mod 2^64), so the per-row work is one stride-tricks matmul, not a
    per-gram string join."""
    ids, poss, hs = [], [], []
    pows = np.power(np.uint64(1099511628211),
                    np.arange(n, dtype=np.uint64)[::-1])
    for did, text in zip(batch["doc_id"].to_pylist(),
                         batch[text_col].to_pylist()):
        toks = text.split(" ")
        if len(toks) < n:
            continue
        th = np.fromiter((stable_hash64(t) for t in toks),
                         np.uint64, len(toks))
        win = np.lib.stride_tricks.sliding_window_view(th, n)
        gh = np.einsum("ij,j->i", win, pows, dtype=np.uint64)
        ids.append(np.full(len(gh), did, np.int64))
        poss.append(np.arange(len(gh), dtype=np.int64))
        hs.append(gh.view(np.int64))
    if not ids:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "gram_hash": pa.array([], pa.int64())})
    return pa.table({
        "doc_id": pa.array(np.concatenate(ids)),
        "pos": pa.array(np.concatenate(poss)),
        "gram_hash": pa.array(np.concatenate(hs)),
    })


def duplicate_spans(docs: ray.data.Dataset, n: int = 13,
                    num_buckets: int = 32,
                    min_docs: int = 2) -> pd.DataFrame:
    """Exact duplicate-substring detection — the ExactSubstr operator of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499) re-expressed without a suffix array:
    every word n-gram occurring in >= ``min_docs`` DISTINCT documents
    marks its start position duplicated, and consecutive duplicated
    starts (gap <= n tokens, i.e. overlapping-or-touching spans) merge
    into maximal per-doc spans.

    Three narrow shuffles, no all-pairs stage: (1) flat-map to
    (doc_id, pos, gram_hash) rows, (2) hash-bucket on the gram and emit
    hit positions for grams clearing the distinct-doc threshold
    (vectorized nunique per bucket), (3) per-doc island merge
    (sort + diff — one group per doc).  Returns
    (doc_id, span_start, span_end, n_grams) with token indices,
    span_end exclusive."""
    rows = docs.map_batches(lambda b: _gram_pos_rows(b, n),
                            batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = (df["gram_hash"].to_numpy(np.uint64)
                    % np.uint64(num_buckets)).astype(np.int32)
        return df

    def hits(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "pos": pd.array([], dtype="int64")})
        nuniq = df.groupby("gram_hash")["doc_id"].transform("nunique")
        return df.loc[nuniq >= min_docs, ["doc_id", "pos"]]

    def spans(g: pd.DataFrame) -> pd.DataFrame:
        p = np.sort(g["pos"].to_numpy(np.int64))
        brk = np.flatnonzero(np.diff(p) > n)
        s = np.r_[0, brk + 1]
        e = np.r_[brk, len(p) - 1]
        return pd.DataFrame({
            "doc_id": np.full(len(s), int(g["doc_id"].iloc[0]), np.int64),
            "span_start": p[s],
            "span_end": p[e] + n,
            "n_grams": (e - s + 1).astype(np.int64),
        })

    out = rows.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_b").map_groups(hits, batch_format="pandas") \
        .groupby("doc_id").map_groups(spans, batch_format="pandas") \
        .to_pandas()
    if out.empty:
        # a duplicate-free corpus yields all-empty blocks, which lose
        # the schema through to_pandas — rebuild it typed
        out = pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "span_start": pd.Series(dtype="int64"),
            "span_end": pd.Series(dtype="int64"),
            "n_grams": pd.Series(dtype="int64")})
    return out.sort_values(["doc_id", "span_start"]) \
        .reset_index(drop=True)


def shard_shuffle(docs: ray.data.Dataset,
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic global shuffle into training shards — the final
    'shuffle then shard' step of corpus prep, WITHOUT
    ``random_shuffle()``'s seed-dependent full exchange: shard = first
    md5 hex digit of the id (16 shards), within-shard order = rank of
    the next 8 hex digits.  Every row's (shard, pos) is a pure function
    of its id, so reruns and resumed jobs produce byte-identical
    shards, and the only all-to-all is ONE hash groupby on the shard
    key (each group sorts locally).  Returns (shard, id, pos) with pos
    0-based within shard."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hd = [hashlib.md5(str(i).encode()).hexdigest()
              for i in df[id_col]]
        out = df[[id_col]].copy()
        out["shard"] = [h[0] for h in hd]
        out["h8"] = [h[1:9] for h in hd]
        return out

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h8", id_col]).reset_index(drop=True)
        return pd.DataFrame({
            "shard": g["shard"],
            id_col: g[id_col].astype(np.int64),
            "pos": np.arange(len(g), dtype=np.int64),
        })

    return docs.map_batches(partial, batch_format="pandas") \
        .groupby("shard").map_groups(rank, batch_format="pandas")
