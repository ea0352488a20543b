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


# ---------------------------------------------------------------------------
# CCNet-style perplexity quality bucketing (Wenzek et al. 2020,
# arXiv:1911.00359): score every document under a language model
# trained on the corpus itself, then split each language into
# head/middle/tail perplexity terciles.  CCNet uses a 5-gram KenLM;
# this engine trains an add-k-smoothed token BIGRAM model with a
# bounded vocabulary and bounded bigram table so the broadcast model
# has a fixed memory footprint at any corpus size.
# ---------------------------------------------------------------------------

class BigramLM:
    """Broadcastable add-k bigram model: sorted vocab array + unigram
    counts (+ one <unk> bucket holding all out-of-vocab mass) and a
    sorted int64 bigram-key table (``id_a * (V+1) + id_b``).
    p(b|a) = (c_ab + k) / (c_a + k·(V+1)); bigrams evicted by the
    ``max_bigrams`` cap score as c_ab = 0 (pure smoothing mass)."""

    def __init__(self, vocab: "np.ndarray", ucnt: "np.ndarray",
                 unk_count: int, bkeys: "np.ndarray", bcnt: "np.ndarray",
                 add_k: float):
        import numpy as np
        self.vocab = vocab                  # sorted token strings
        self.ucnt = np.append(ucnt, unk_count).astype(np.float64)
        self.V = len(vocab)
        self.bkeys = bkeys                  # sorted int64
        self.bcnt = bcnt.astype(np.float64)
        self.add_k = float(add_k)

    def token_ids(self, toks: "np.ndarray") -> "np.ndarray":
        import numpy as np
        if self.V == 0:
            return np.zeros(len(toks), np.int64)      # everything <unk>
        pos = np.searchsorted(self.vocab, toks)
        pos[pos >= self.V] = 0
        miss = self.vocab[pos] != toks
        ids = pos.astype(np.int64)
        ids[miss] = self.V                  # <unk>
        return ids

    def doc_nll(self, text: str) -> float:
        """Mean negative log p(b|a) over the doc's bigram transitions
        (docs with < 2 tokens score 0.0 — no transition evidence)."""
        import numpy as np
        toks = np.array(text.lower().split(), dtype=object)
        if len(toks) < 2:
            return 0.0
        ids = self.token_ids(toks)
        a, b = ids[:-1], ids[1:]
        keys = a * np.int64(self.V + 1) + b
        pos = np.searchsorted(self.bkeys, keys)
        pos[pos >= len(self.bkeys)] = max(len(self.bkeys) - 1, 0)
        c_ab = np.zeros(len(keys), np.float64)
        if len(self.bkeys):
            hit = self.bkeys[pos] == keys
            c_ab[hit] = self.bcnt[pos[hit]]
        denom = self.ucnt[a] + self.add_k * (self.V + 1)
        nll = -(np.log(c_ab + self.add_k) - np.log(denom))
        return float(nll.mean())


def _topk_by_count(agg: ray.data.Dataset, key_col: str, cnt_col: str,
                   k: int) -> "pd.DataFrame":
    """Partial top-k over an AGGREGATED (key, cnt) Dataset under the
    (cnt desc, key asc) total order: each block keeps its own top-k
    with that comparator — the upstream groupby gives blocks disjoint
    keys, so the union of per-block top-k provably contains the global
    top-k — then one tiny driver merge of ≤ k × n_blocks rows.
    Replaces a global ``sort().limit()`` (an all-to-all exchange of
    the whole distinct-key table — billions of rows at web scale) with
    a block-local selection; deterministic under any partitioning
    because the comparator is a total order."""
    import pandas as pd

    def blk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) <= k:
            return df
        return df.sort_values([cnt_col, key_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    parts = agg.map_batches(blk, batch_size=None,
                            batch_format="pandas").to_pandas()
    if key_col not in parts.columns:        # fully-empty aggregate
        parts = pd.DataFrame({key_col: pd.Series(dtype=object),
                              cnt_col: pd.Series(dtype="int64")})
    return parts.sort_values([cnt_col, key_col],
                             ascending=[False, True], kind="mergesort") \
        .head(k).reset_index(drop=True)


def train_bigram_lm(docs: ray.data.Dataset, text_col: str = "text",
                    vocab_size: int = 50_000,
                    max_bigrams: int = 1_000_000,
                    add_k: float = 0.5) -> BigramLM:
    """Distributed LM fit: per-batch (token, count) / (bigram, count)
    partials → one narrow groupby-sum each → :func:`_topk_by_count`
    keeps the top-``vocab_size`` unigrams and top-``max_bigrams``
    bigrams WITHOUT a global sort — the shuffle carries counts, never
    text, and the driver holds only the capped tables.
    Whitespace-lowercase tokenization (the same rule the scorer
    applies)."""
    import numpy as np
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Sum

    def uni_partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t[text_col].to_pylist():
            toks.extend(x.lower().split())
        if not toks:
            return pa.table({"tok": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(np.array(toks, dtype=object), return_counts=True)
        return pa.table({"tok": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(c, pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        pairs: list[str] = []
        for x in t[text_col].to_pylist():
            w = x.lower().split()
            pairs.extend(f"{a}\x1f{b}" for a, b in zip(w, w[1:]))
        if not pairs:
            return pa.table({"bg": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        u, c = np.unique(np.array(pairs, dtype=object), return_counts=True)
        return pa.table({"bg": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(c, pa.int64())})

    uni = docs.map_batches(uni_partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("cnt", alias_name="cnt")) \
        .materialize()
    total_tokens = uni.sum("cnt") or 0
    top_u = _topk_by_count(uni, "tok", "cnt", vocab_size)
    vocab = np.sort(top_u["tok"].to_numpy(dtype=object))
    order = np.argsort(top_u["tok"].to_numpy(dtype=object), kind="stable")
    ucnt = top_u["cnt"].to_numpy(np.int64)[order]
    unk_count = int(total_tokens - ucnt.sum())

    bi = _topk_by_count(
        docs.map_batches(bi_partial, batch_format="pyarrow")
        .groupby("bg").aggregate(Sum("cnt", alias_name="cnt")),
        "bg", "cnt", max_bigrams)
    if len(bi):
        parts = bi["bg"].str.split("\x1f", n=1, expand=True)
        lm0 = BigramLM(vocab, ucnt, unk_count,
                       np.array([], np.int64), np.array([], np.int64),
                       add_k)
        ida = lm0.token_ids(parts[0].to_numpy(dtype=object))
        idb = lm0.token_ids(parts[1].to_numpy(dtype=object))
        keys = ida * np.int64(len(vocab) + 1) + idb
        cnts = bi["cnt"].to_numpy(np.int64)
        # <unk>-mapped bigrams can collide onto one key — sum them
        df = pd.DataFrame({"k": keys, "c": cnts}).groupby("k")["c"] \
            .sum().reset_index()
        bkeys = df["k"].to_numpy(np.int64)
        bcnt = df["c"].to_numpy(np.int64)
    else:
        bkeys = np.array([], np.int64)
        bcnt = np.array([], np.int64)
    return BigramLM(vocab, ucnt, unk_count, bkeys, bcnt, add_k)


def score_perplexity(docs: ray.data.Dataset, lm: BigramLM,
                     id_col: str = "doc_id", text_col: str = "text",
                     extra_cols: tuple = ("lang",)) -> ray.data.Dataset:
    """Append ``nll_e6`` (mean bigram negative log-likelihood,
    floor(x·1e6 + ½) int64 — the deterministic cross-run encoding) to
    every doc.  The model travels once via ``ray.put``."""
    import numpy as np

    import ray
    lm_ref = ray.put(lm)

    def fn(t: pa.Table) -> pa.Table:
        m = ray.get(lm_ref)
        nll = np.array([m.doc_nll(x) for x in t[text_col].to_pylist()])
        cols = {id_col: t[id_col]}
        for c in extra_cols:
            if c in t.column_names:
                cols[c] = t[c]
        cols["nll_e6"] = pa.array(
            np.floor(nll * 1e6 + 0.5).astype(np.int64), pa.int64())
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow")


def perplexity_tercile_cutoffs(scored: ray.data.Dataset,
                               group_col: str = "lang"
                               ) -> "dict[str, tuple[int, int]]":
    """Exact per-group tercile cutoffs over ``nll_e6``: per-batch
    (group, value, count) partials → one narrow groupby-sum → the
    driver folds sorted cumulative counts per group (bytes ∝ distinct
    (group, value) pairs, never rows).  Cutoff q_i = smallest value
    whose cumulative count reaches ⌈i·n/3⌉ — the deterministic rank
    rule a re-run reproduces bit-exactly."""
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"g": t[group_col].to_pylist(),
                           "v": t["nll_e6"].to_numpy(
                               zero_copy_only=False)})
        agg = df.groupby(["g", "v"], sort=False).size().reset_index()
        agg.columns = ["g", "v", "c"]
        return pa.table({"g": pa.array(agg["g"], pa.string()),
                         "v": pa.array(agg["v"], pa.int64()),
                         "c": pa.array(agg["c"], pa.int64())})

    hist = scored.map_batches(partial, batch_format="pyarrow") \
        .groupby(["g", "v"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas()
    out: dict[str, tuple[int, int]] = {}
    for g, sub in hist.groupby("g"):
        sub = sub.sort_values("v")
        cum = sub["c"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = sub["v"].to_numpy(np.int64)
        q1 = vals[np.searchsorted(cum, math.ceil(n / 3))]
        q2 = vals[np.searchsorted(cum, math.ceil(2 * n / 3))]
        out[str(g)] = (int(q1), int(q2))
    return out


def perplexity_buckets(scored: ray.data.Dataset,
                       cutoffs: "dict[str, tuple[int, int]]",
                       group_col: str = "lang") -> ray.data.Dataset:
    """head / middle / tail assignment from broadcast cutoffs —
    CCNet keeps head+middle and drops (or down-weights) tail."""
    import numpy as np

    import ray
    cref = ray.put(cutoffs)

    def fn(t: pa.Table) -> pa.Table:
        cut = ray.get(cref)
        g = t[group_col].to_pylist()
        v = t["nll_e6"].to_numpy(zero_copy_only=False)
        q1 = np.array([cut[x][0] for x in g], np.int64)
        q2 = np.array([cut[x][1] for x in g], np.int64)
        b = np.where(v <= q1, "head", np.where(v <= q2, "middle", "tail"))
        return t.append_column("ppl_bucket", pa.array(b.tolist(),
                                                      pa.string()))

    return scored.map_batches(fn, batch_format="pyarrow")
