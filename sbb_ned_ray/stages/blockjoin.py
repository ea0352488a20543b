"""Classic record-linkage blocking joins: sorted-neighborhood and
prefix-filtered set-similarity (PPJoin-style).

The reference blocks candidate entities per surface through normalized
lookup keys plus ANN probes (``qurator/sbb_ned/embeddings/base.py``
consumers feeding ``qurator/sbb_ned/models/decider.py``); these two
operators are the other canonical blocking families from the
record-linkage literature, exact-threshold so each gets a DuckDB
oracle twin:

* :func:`sorted_neighborhood_pairs` — Hernandez & Stolfo's
  sorted-neighborhood method (SIGMOD 1995): one global sort on a fuzzy
  key, then every record pairs with its ``window - 1`` successors.
  The distributed shape is the two-pass rank scan from
  :mod:`sbb_ned_ray.stages.scan` (sort → per-block counts → broadcast
  exclusive offsets) followed by a window-bucket exchange: each ranked
  row ships to its own window bucket and the successor bucket, so
  every qualifying pair co-locates in exactly one tiny (≤ 2·window
  row) group.  The only all-to-all is the sort itself; everything
  downstream is rank-arithmetic on int64 columns.

* :func:`shingle_jaccard_pairs` — exact Jaccard similarity self-join
  over word n-gram shingle sets with the prefix filter of
  Chaudhuri, Ganti & Kaushik (ICDE 2006) / PPJoin (Xiao et al., WWW
  2008): order all shingles by ascending document frequency; a doc
  with ``m`` distinct shingles only needs its first
  ``m - ceil(t*m) + 1`` rarest shingles indexed — any pair with
  Jaccard ≥ t must collide on at least one prefix shingle.
  Candidates then verify EXACTLY (recomputed shingle sets from the
  joined texts), so unlike the MinHash family in
  :mod:`sbb_ned_ray.stages.dedup` the result is the precise
  threshold join, not an estimate.  All exchanges are linear:
  shingle rows bucket by shingle for the df count and the prefix
  probe, pairs dedup through one int32-bucketed pass, and texts reach
  the verifier through the same hash join the MinHash scale branch
  uses — nothing corpus-sized lands on the driver.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sbb_ned_ray.stages.graph import (_add_hash_part, _bucketed_distinct,
                                      _pd_to_arrow)


# --------------------------------------------------------------------
# sorted-neighborhood method
# --------------------------------------------------------------------

def _ranks_after_sort(srt: ray.data.Dataset, key_col: str, id_col: str
                      ) -> ray.data.Dataset:
    """Assign the global 0-based rank under ``ORDER BY (key, id)`` to
    every row of an already-sorted, materialized Dataset.  Two-pass
    scan (:mod:`sbb_ned_ray.stages.scan`): per-block first-row + count
    to the driver (bytes per block), broadcast exclusive offsets back.
    Fails loudly if Ray hands pass B a batch that does not start on a
    pass-A block boundary (a merged block would silently mis-rank)."""
    def block_stat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_key": pa.array([], pa.string()),
                             "first_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "first_key": pa.array([str(t[key_col][0].as_py())]),
            "first_id": pa.array([int(t[id_col][0].as_py())], pa.int64()),
            "n": pa.array([t.num_rows], pa.int64())})

    stats = srt.map_batches(block_stat, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    stats = stats.sort_values(["first_key", "first_id"]) \
        .reset_index(drop=True)
    offs = np.concatenate([[0], stats["n"].cumsum().to_numpy()[:-1]]) \
        if len(stats) else np.zeros(0, np.int64)
    off_map = {(k, int(i)): int(o) for k, i, o in
               zip(stats["first_key"], stats["first_id"], offs)}

    def add_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("rank", pa.array([], pa.int64()))
        head = (str(t[key_col][0].as_py()), int(t[id_col][0].as_py()))
        if head not in off_map:
            raise RuntimeError(
                "sorted_neighborhood_pairs: batch does not start on a "
                f"pass-A block boundary (first row {head!r}); rank "
                "offsets would be wrong — aborting")
        base = off_map[head]
        return t.append_column(
            "rank", pa.array(base + np.arange(t.num_rows), pa.int64()))

    return srt.map_batches(add_rank, batch_format="pyarrow",
                           batch_size=None)


def sorted_neighborhood_pairs(ds: ray.data.Dataset, key_col: str,
                              id_col: str, window: int
                              ) -> ray.data.Dataset:
    """All ordered pairs of rows whose ranks under
    ``ORDER BY (key_col, id_col)`` differ by less than ``window`` →
    Dataset ``(id_a, id_b, rank_dist)`` where ``id_a`` is the
    lower-ranked row.  ``id_col`` must be unique (it is the sort
    tie-break, so the rank order — and therefore the result — is
    total and deterministic).

    Window-bucket exchange: a row with rank ``r`` belongs to bucket
    ``b = r // window`` and ships one copy to groups ``b`` and
    ``b + 1``; any pair within ``window`` spans at most adjacent
    buckets, so group ``b(i) + 1`` always holds both rows.  Each pair
    is emitted exactly once, by the group one past the lower row's
    bucket."""
    if window < 2:
        raise ValueError("window must be >= 2")
    srt = ds.sort([key_col, id_col]).materialize()
    ranked = _ranks_after_sort(srt, key_col, id_col) \
        .select_columns([id_col, "rank"])

    def emit(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = r // window
        return pa.table({
            "_g": pa.array(np.concatenate([b, b + 1]).astype(np.int32)),
            "rank": pa.array(np.concatenate([r, r]), pa.int64()),
            "id": pa.array(np.concatenate([ids, ids]), pa.int64())})

    def pairs(df: pd.DataFrame) -> pa.Table:
        g = int(df["_g"].iloc[0])
        order = np.argsort(df["rank"].to_numpy(), kind="stable")
        r = df["rank"].to_numpy()[order]
        ids = df["id"].to_numpy()[order]
        lo = np.flatnonzero(r // window == g - 1)
        out_a, out_b, out_d = [], [], []
        for i in lo:
            hi = np.searchsorted(r, r[i] + window, side="left")
            if hi > i + 1:
                out_a.append(np.full(hi - i - 1, ids[i], np.int64))
                out_b.append(ids[i + 1:hi])
                out_d.append(r[i + 1:hi] - r[i])
        if not out_a:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "rank_dist": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(out_a)),
                         "id_b": pa.array(np.concatenate(out_b)),
                         "rank_dist": pa.array(np.concatenate(out_d))})

    return ranked.map_batches(emit, batch_format="pyarrow") \
        .groupby("_g").map_groups(pairs, batch_format="pandas")


# --------------------------------------------------------------------
# meta-blocking: token blocking + CBS weights + cardinality node
# pruning (Papadakis et al., "Meta-blocking: taking entity resolution
# to the next level", TKDE 2014)
# --------------------------------------------------------------------

def meta_blocking_cnp(records: ray.data.Dataset, id_col: str,
                      name_col: str, k_neighbors: int = 5,
                      max_block: int = 64, min_weight: int = 2,
                      nparts: int = 32) -> ray.data.Dataset:
    """Comparison pruning for redundancy-positive blocking: character
    trigrams of ``name_col`` are the blocking keys (token blocking),
    oversized blocks are purged (block purging, ``max_block``), edge
    weight = number of shared blocks (CBS), and each record keeps only
    its ``k_neighbors`` heaviest neighbors (cardinality node pruning,
    the OR-redefined variant: an edge survives if EITHER endpoint
    ranks it top-k; ties break on ascending neighbor id).  Returns
    ``(id_a, id_b, w)`` with ``id_a < id_b``.

    The block graph rides :func:`sbb_ned_ray.stages.graph.
    cooccurrence_edges` (distinct → hot-block stoplist → bucketed pair
    emission → one narrow count groupby); CNP adds one more bucketed
    exchange on the directed source.  This is the standard recipe for
    keeping token blocking sub-quadratic at web scale."""
    def tg_rows(df: pd.DataFrame) -> pa.Table:
        ids, tgs = [], []
        for i, name in zip(df[id_col], df[name_col]):
            for t in {name[j:j + 3] for j in range(len(name) - 2)}:
                ids.append(int(i))
                tgs.append(t)
        return _pd_to_arrow(pd.DataFrame(
            {"tg": tgs, "rec": np.array(ids, np.int64)}))

    from sbb_ned_ray.stages.graph import cooccurrence_edges
    blocks = records.map_batches(tg_rows, batch_format="pandas")
    edges = cooccurrence_edges(blocks, "tg", "rec",
                               min_weight=min_weight,
                               max_group_degree=max_block,
                               nparts=nparts).materialize()

    def explode(df: pd.DataFrame) -> pa.Table:
        a = df["node_a"].to_numpy(np.int64)
        b = df["node_b"].to_numpy(np.int64)
        w = df["w"].to_numpy(np.int64)
        out = pd.DataFrame({"s": np.concatenate([a, b]),
                            "d": np.concatenate([b, a]),
                            "w": np.concatenate([w, w])})
        return _pd_to_arrow(_add_hash_part(out, ["s"], nparts))

    def topk(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["s", "w", "d"],
                            ascending=[True, False, True])
        kept = df.groupby("s", sort=False).head(k_neighbors)
        ida = np.minimum(kept["s"].to_numpy(np.int64),
                         kept["d"].to_numpy(np.int64))
        idb = np.maximum(kept["s"].to_numpy(np.int64),
                         kept["d"].to_numpy(np.int64))
        return _pd_to_arrow(pd.DataFrame(
            {"id_a": ida, "id_b": idb,
             "w": kept["w"].to_numpy(np.int64)}))

    kept = edges.map_batches(explode, batch_format="pandas") \
        .groupby("_part").map_groups(topk, batch_format="pandas")
    return _bucketed_distinct(kept, ["id_a", "id_b", "w"], nparts)


# --------------------------------------------------------------------
# prefix-filtered exact Jaccard set-similarity join
# --------------------------------------------------------------------

def word_shingles(text: str, n: int) -> set:
    """Distinct word n-gram shingles of ``text`` split on single
    spaces — the exact tokenization DuckDB's ``string_split(text, ' ')``
    performs, so the oracle twin sees identical sets."""
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def _prefix_len(m: int, threshold: float) -> int:
    # ceil with a downward nudge: a float wobble may only LENGTHEN the
    # prefix (extra candidates, removed by exact verification) — never
    # shorten it (which could miss a true pair)
    return m - int(math.ceil(threshold * m - 1e-9)) + 1


def shingle_jaccard_pairs(docs: ray.data.Dataset, text_col: str,
                          id_col: str, threshold: float,
                          shingle_n: int = 3, nparts: int = 32
                          ) -> ray.data.Dataset:
    """Exact Jaccard ≥ ``threshold`` self-join over word
    ``shingle_n``-gram shingle sets → Dataset
    ``(id_a, id_b, jaccard_e6)`` with ``id_a < id_b`` and the Jaccard
    quantized to 1e-6 (int64) for hash-stable comparison.  Docs with
    fewer than ``shingle_n`` words have no shingles and never pair."""
    def shingle_rows(df: pd.DataFrame) -> pa.Table:
        ids, shs = [], []
        for i, txt in zip(df[id_col], df[text_col]):
            for sh in word_shingles(txt, shingle_n):
                ids.append(int(i))
                shs.append(sh)
        return _pd_to_arrow(_add_hash_part(
            pd.DataFrame({"doc": np.array(ids, np.int64), "sh": shs}),
            ["sh"], nparts))

    rows = docs.map_batches(shingle_rows, batch_format="pandas") \
        .materialize()

    # document frequency per shingle + the prefix probe, one exchange:
    # within a shingle bucket the df is complete, so the (doc, sh, df)
    # rows come straight back out of the same group
    def attach_df(df: pd.DataFrame) -> pa.Table:
        cnt = df.groupby("sh", sort=False)["doc"].transform("size")
        out = pd.DataFrame({"doc": df["doc"].to_numpy(),
                            "sh": df["sh"].to_numpy(),
                            "df": cnt.to_numpy().astype(np.int64)})
        return _pd_to_arrow(_add_hash_part(out, ["doc"], nparts))

    with_df = rows.groupby("_part") \
        .map_groups(attach_df, batch_format="pandas")

    def prefix_rows(df: pd.DataFrame) -> pa.Table:
        outs = []
        for doc, g in df.groupby("doc", sort=False):
            m = len(g)
            p = _prefix_len(m, threshold)
            g = g.sort_values(["df", "sh"]).head(p)
            outs.append(pd.DataFrame({
                "sh": g["sh"].to_numpy(),
                "doc": np.full(len(g), doc, np.int64),
                "m": np.full(len(g), m, np.int64)}))
        if not outs:
            return _pd_to_arrow(pd.DataFrame({
                "sh": pd.Series(dtype=object),
                "doc": pd.Series(dtype="int64"),
                "m": pd.Series(dtype="int64"),
                "_part": pd.Series(dtype="int32")}))
        out = pd.concat(outs, ignore_index=True)
        return _pd_to_arrow(_add_hash_part(out, ["sh"], nparts))

    prefix = with_df.groupby("_part") \
        .map_groups(prefix_rows, batch_format="pandas")

    def candidates(df: pd.DataFrame) -> pa.Table:
        m = df.merge(df, on="sh", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        # length filter: J ≤ min(m)/max(m), so require
        # min(m) ≥ t·max(m)  (float wobble again only widens)
        lo = np.minimum(m["m_a"], m["m_b"])
        hi = np.maximum(m["m_a"], m["m_b"])
        m = m[lo >= threshold * hi - 1e-9]
        out = pd.DataFrame({"id_a": m["doc_a"].to_numpy(np.int64),
                            "id_b": m["doc_b"].to_numpy(np.int64)}) \
            .drop_duplicates()
        return _pd_to_arrow(out)

    cand = prefix.groupby("_part") \
        .map_groups(candidates, batch_format="pandas")
    cand = _bucketed_distinct(cand, ["id_a", "id_b"], nparts)

    # attach each side's text via the union + bucketed-groupby
    # co-shuffle idiom (acero hash joins reject empty partitions on
    # tiny inputs): pair rows and doc rows share one aligned schema,
    # tagged by side, and merge inside the key bucket
    def _attach(pairs_ds: ray.data.Dataset, key_name: str,
                text_out: str) -> ray.data.Dataset:
        keep = [c for c in ["id_a", "id_b", "text_a"]
                if c != text_out]

        def tag_pairs(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({"_k": df[key_name].to_numpy(np.int64)})
            for c in keep:
                if c in df.columns:
                    out[c] = df[c].to_numpy()
            out["_txt"] = ""
            out["_side"] = np.int8(0)
            return _pd_to_arrow(_add_hash_part(out, ["_k"], nparts))

        def tag_docs(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({"_k": df[id_col].to_numpy(np.int64)})
            for c in keep:
                out[c] = np.int64(0) if c != "text_a" else ""
            out["_txt"] = df[text_col].to_numpy()
            out["_side"] = np.int8(1)
            return _pd_to_arrow(_add_hash_part(out, ["_k"], nparts))

        def merge(df: pd.DataFrame) -> pa.Table:
            p = df[df["_side"] == 0]
            d = df[df["_side"] == 1][["_k", "_txt"]] \
                .drop_duplicates("_k")
            m = p.merge(d, on="_k", suffixes=("", "_doc"))
            out = pd.DataFrame({c: m[c].to_numpy() for c in keep
                                if c in m.columns})
            out[text_out] = m["_txt_doc"].to_numpy() \
                if "_txt_doc" in m.columns else m["_txt"].to_numpy()
            # re-derive the joined key column (id_a or id_b)
            out[key_name] = m["_k"].to_numpy(np.int64)
            cols = ["id_a", "id_b"] + \
                [c for c in out.columns if c not in ("id_a", "id_b")]
            return _pd_to_arrow(out[[c for c in cols
                                     if c in out.columns]])

        tagged = pairs_ds.map_batches(tag_pairs, batch_format="pandas") \
            .union(docs.map_batches(tag_docs, batch_format="pandas"))
        return tagged.groupby("_part") \
            .map_groups(merge, batch_format="pandas")

    joined = _attach(_attach(cand, "id_a", "text_a"), "id_b", "text_b")

    def verify(df: pd.DataFrame) -> pa.Table:
        ja, ids_a, ids_b = [], [], []
        for ia, ib, ta, tb in zip(df["id_a"], df["id_b"],
                                  df["text_a"], df["text_b"]):
            sa = word_shingles(ta, shingle_n)
            sb = word_shingles(tb, shingle_n)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            uni = len(sa) + len(sb) - inter
            # integer cross-multiplication: exact threshold test with
            # no float round-trip (inter/uni >= t  <=>  inter*1e6 >=
            # t*1e6*uni when t is supplied at 1e-6 granularity)
            if inter * 1_000_000 >= int(round(threshold * 1_000_000)) * uni:
                ids_a.append(int(ia))
                ids_b.append(int(ib))
                # integer round-half-up — matches the oracle's
                # (c*2000000 + u) // (2*u) exactly, no float round-trip
                ja.append((inter * 2_000_000 + uni) // (2 * uni))
        return pa.table({"id_a": pa.array(ids_a, pa.int64()),
                         "id_b": pa.array(ids_b, pa.int64()),
                         "jaccard_e6": pa.array(ja, pa.int64())})

    return joined.map_batches(verify, batch_format="pandas")


# --------------------------------------------------------------------
# exact token-cosine similarity self-join over a df-pruned vocabulary
# --------------------------------------------------------------------

def token_cosine_pairs(docs: ray.data.Dataset, text_col: str,
                       id_col: str, threshold_e6: int = 800_000,
                       max_df: int = 50,
                       num_partitions: int = 32) -> ray.data.Dataset:
    """EXACT cosine ≥ t similarity self-join over token-COUNT vectors
    restricted to tokens with document frequency ≤ ``max_df`` — the
    classic stop-token prune of inverted-index similarity joins
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW 2007): a token appearing in more than ``max_df`` docs carries
    no discriminative signal but quadratic candidate volume, so BOTH
    engines drop it before any pair forms (the operator is defined
    over the pruned vocabulary; the DuckDB twin applies the identical
    global-df filter, keeping the comparison hash-exact).

    Returns ``(id_a, id_b, dot, na2, nb2)`` for pairs with
    cos = dot/√(na2·nb2) ≥ threshold — all INTEGER columns (dot and
    the squared norms over the pruned vocab), so no float ever crosses
    the oracle hash; the threshold test itself is exact integer
    cross-multiplication in arbitrary precision (Python ints here,
    HUGEINT in the twin).

    Distributed shape (all exchanges linear in postings/pairs — no
    doc-sized rows move, nothing lands on the driver):

    1. token-count rows (id, tok, c) bucket by token; per bucket ONE
       pass computes df, drops tok with df > max_df, and emits the
       per-token pair products (a < b, prod = ca·cb) — volume bounded
       by Σ df² ≤ max_df · postings;
    2. ``groupby((id_a, id_b)).sum(prod)`` → dot (pair-key exchange);
    3. squared norms per doc from the SURVIVING postings (df ≤ max_df,
       including df = 1 tokens — they shape the norm even though they
       never pair) via one narrow groupby;
    4. two tagged bucket-merges attach na2/nb2, then the exact
       integer threshold filter.
    """
    t_e6 = int(threshold_e6)

    def token_rows(df: pd.DataFrame) -> pa.Table:
        ids, toks, cnts = [], [], []
        for i, txt in zip(df[id_col].astype(int), df[text_col]):
            c: dict = {}
            for t in str(txt).split(" "):
                if t:
                    c[t] = c.get(t, 0) + 1
            ids.extend([i] * len(c))
            toks.extend(c.keys())
            cnts.extend(c.values())
        out = pd.DataFrame({"tok": toks, "id": ids, "c": cnts})
        return _pd_to_arrow(_add_hash_part(out, ["tok"], num_partitions))

    tok_rows = docs.map_batches(token_rows, batch_format="pandas") \
        .materialize()

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["_part"])
        sizes = df.groupby("tok", sort=False)["id"].transform("size")
        df = df[sizes <= max_df]
        out_a, out_b, out_p = [], [], []
        for _, g in df[df.groupby("tok", sort=False)["id"]
                       .transform("size") >= 2].groupby("tok",
                                                        sort=False):
            ids = g["id"].to_numpy(np.int64)
            cs = g["c"].to_numpy(np.int64)
            o = np.argsort(ids)
            ids, cs = ids[o], cs[o]
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
            out_p.append(cs[iu] * cs[ju])
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            p = np.concatenate(out_p)
        else:
            a = b = p = np.array([], dtype=np.int64)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64()),
                         "prod": pa.array(p, pa.int64())})

    def surviving(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["_part"])
        sizes = df.groupby("tok", sort=False)["id"].transform("size")
        keep = df[sizes <= max_df]
        c = keep["c"].to_numpy(np.int64)
        return pa.table({"id": pa.array(keep["id"].to_numpy(np.int64),
                                        pa.int64()),
                         "c2": pa.array(c * c, pa.int64())})

    dot = tok_rows.groupby("_part") \
        .map_groups(bucket_pairs, batch_format="pandas") \
        .groupby(["id_a", "id_b"]).sum("prod") \
        .map_batches(lambda t: t.rename_columns(["id_a", "id_b",
                                                 "dot"]),
                     batch_format="pyarrow")
    n2 = tok_rows.groupby("_part") \
        .map_groups(surviving, batch_format="pandas") \
        .groupby("id").sum("c2") \
        .map_batches(lambda t: t.rename_columns(["id", "n2"]),
                     batch_format="pyarrow").materialize()

    def attach(pairs_ds: ray.data.Dataset, key_name: str,
               out_name: str, carry: list) -> ray.data.Dataset:
        # both tagged sides share ONE schema (carry columns padded with
        # zeros on the norm side) so the union's buckets concatenate
        # cleanly even when a bucket holds only one side
        def tag_pairs(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame(
                {c: df[c].to_numpy(np.int64) for c in carry})
            out["_k"] = df[key_name].to_numpy(np.int64)
            out["_n2"] = np.int64(-1)
            return _pd_to_arrow(_add_hash_part(out, ["_k"],
                                               num_partitions))

        def tag_norms(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({c: np.zeros(len(df), np.int64)
                                for c in carry})
            out["_k"] = df["id"].to_numpy(np.int64)
            out["_n2"] = df["n2"].to_numpy(np.int64)
            return _pd_to_arrow(_add_hash_part(out, ["_k"],
                                               num_partitions))

        def merge(df: pd.DataFrame) -> pa.Table:
            p = df[df["_n2"] < 0][carry + ["_k"]]
            n = df[df["_n2"] >= 0][["_k", "_n2"]].drop_duplicates("_k")
            m = p.merge(n, on="_k").drop(columns=["_k"])
            m = m.rename(columns={"_n2": out_name})
            return _pd_to_arrow(m[carry + [out_name]])

        return pairs_ds.map_batches(tag_pairs, batch_format="pandas") \
            .union(n2.map_batches(tag_norms, batch_format="pandas")) \
            .groupby("_part").map_groups(merge, batch_format="pandas")

    with_norms = attach(
        attach(dot, "id_a", "na2", ["id_a", "id_b", "dot"]),
        "id_b", "nb2", ["id_a", "id_b", "dot", "na2"])

    def threshold_filter(df: pd.DataFrame) -> pa.Table:
        if "id_a" not in df.columns:   # empty schema probe
            df = pd.DataFrame({c: pd.Series(dtype="int64")
                               for c in ["id_a", "id_b", "dot",
                                         "na2", "nb2"]})
        if len(df):
            d = df["dot"].astype(object).to_numpy()
            x = df["na2"].astype(object).to_numpy()
            y = df["nb2"].astype(object).to_numpy()
            # exact arbitrary-precision integer cross-multiplication
            ok = (d * d * 10**12) >= (t_e6 * t_e6) * x * y
            df = df[ok.astype(bool)]
        # the bucket merges float int columns through empty-frame
        # probes; the contract is all-integer
        out = df[["id_a", "id_b", "dot", "na2", "nb2"]] \
            .astype("int64")
        return _pd_to_arrow(out)

    return with_norms.map_batches(threshold_filter,
                                  batch_format="pandas")


# --------------------------------------------------------------------
# exact shingle-containment self-join (asymmetric near-duplicate /
# subsumption detection)
# --------------------------------------------------------------------

def shingle_containment_pairs(docs: ray.data.Dataset, text_col: str,
                              id_col: str, threshold_e6: int = 700_000,
                              shingle_n: int = 3, max_df: int = 50,
                              num_partitions: int = 32
                              ) -> ray.data.Dataset:
    """EXACT containment ``C(A→B) = |S(A) ∩ S(B)| / |S(A)| ≥ t``
    DIRECTIONAL self-join over word ``shingle_n``-gram shingle sets
    restricted to shingles with document frequency ≤ ``max_df`` — the
    asymmetric cousin of :func:`shingle_jaccard_pairs` (Broder's
    containment from "On the resemblance and containment of
    documents", SEQUENCES 1997).  Jaccard misses the
    quote-inside-a-wrapper case an LLM-corpus dedup cares about: a
    short doc fully embedded in a much longer one has tiny Jaccard but
    containment ≈ 1.  The df prune is the same operator-definition
    decision as :func:`token_cosine_pairs` (boilerplate shingles carry
    quadratic candidate volume and no signal; BOTH engines drop them,
    keeping the oracle hash-exact).

    Returns ``(id_a, id_b, inter, m_a, containment_e6)`` — one row per
    DIRECTION that passes (``A ⊂~ B`` and ``B ⊂~ A`` are independent
    rows), all integers, ``containment_e6`` round-half-up like the
    twin's ``(c*2e6 + m) // (2*m)``.

    Distributed shape = :func:`token_cosine_pairs`'s: shingle rows
    bucket by shingle (ONE pass per bucket computes df, prunes, emits
    ``Σ df² ≤ max_df · postings`` unordered pair rows), a pair-key
    groupby counts the exact intersection, per-doc retained-set sizes
    come from one narrow groupby, two tagged bucket-merges attach the
    sizes, and the direction filter is per-row integer arithmetic.
    Nothing doc-sized moves after step 1; nothing lands on the driver.
    """
    t_e6 = int(threshold_e6)

    def shingle_rows(df: pd.DataFrame) -> pa.Table:
        ids, shs = [], []
        for i, txt in zip(df[id_col].astype(int), df[text_col]):
            for sh in word_shingles(str(txt), shingle_n):
                ids.append(i)
                shs.append(sh)
        out = pd.DataFrame({"sh": shs,
                            "id": np.array(ids, np.int64)})
        return _pd_to_arrow(_add_hash_part(out, ["sh"], num_partitions))

    rows = docs.map_batches(shingle_rows, batch_format="pandas") \
        .materialize()

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["_part"])
        sizes = df.groupby("sh", sort=False)["id"].transform("size")
        df = df[(sizes <= max_df) & (sizes >= 2)]
        out_a, out_b = [], []
        for _, g in df.groupby("sh", sort=False):
            ids = np.sort(g["id"].to_numpy(np.int64))
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64()),
                         "one": pa.array(np.ones(len(a), np.int64),
                                         pa.int64())})

    def surviving(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["_part"])
        sizes = df.groupby("sh", sort=False)["id"].transform("size")
        keep = df[sizes <= max_df]
        return pa.table({"id": pa.array(keep["id"].to_numpy(np.int64),
                                        pa.int64()),
                         "one": pa.array(np.ones(len(keep), np.int64),
                                         pa.int64())})

    inter = rows.groupby("_part") \
        .map_groups(bucket_pairs, batch_format="pandas") \
        .groupby(["id_a", "id_b"]).sum("one") \
        .map_batches(lambda t: t.rename_columns(["id_a", "id_b",
                                                 "inter"]),
                     batch_format="pyarrow")
    msz = rows.groupby("_part") \
        .map_groups(surviving, batch_format="pandas") \
        .groupby("id").sum("one") \
        .map_batches(lambda t: t.rename_columns(["id", "m"]),
                     batch_format="pyarrow").materialize()

    def attach(pairs_ds: ray.data.Dataset, key_name: str,
               out_name: str, carry: list) -> ray.data.Dataset:
        def tag_pairs(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame(
                {c: df[c].to_numpy(np.int64) for c in carry})
            out["_k"] = df[key_name].to_numpy(np.int64)
            out["_m"] = np.int64(-1)
            return _pd_to_arrow(_add_hash_part(out, ["_k"],
                                               num_partitions))

        def tag_sizes(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({c: np.zeros(len(df), np.int64)
                                for c in carry})
            out["_k"] = df["id"].to_numpy(np.int64)
            out["_m"] = df["m"].to_numpy(np.int64)
            return _pd_to_arrow(_add_hash_part(out, ["_k"],
                                               num_partitions))

        def merge(df: pd.DataFrame) -> pa.Table:
            p = df[df["_m"] < 0][carry + ["_k"]]
            s = df[df["_m"] >= 0][["_k", "_m"]].drop_duplicates("_k")
            m = p.merge(s, on="_k").drop(columns=["_k"])
            m = m.rename(columns={"_m": out_name})
            return _pd_to_arrow(m[carry + [out_name]])

        return pairs_ds.map_batches(tag_pairs, batch_format="pandas") \
            .union(msz.map_batches(tag_sizes, batch_format="pandas")) \
            .groupby("_part").map_groups(merge, batch_format="pandas")

    with_sizes = attach(
        attach(inter, "id_a", "ma", ["id_a", "id_b", "inter"]),
        "id_b", "mb", ["id_a", "id_b", "inter", "ma"])

    def directional(df: pd.DataFrame) -> pa.Table:
        cols = ["id_a", "id_b", "inter", "m_a", "containment_e6"]
        if "id_a" not in df.columns or not len(df):
            return _pd_to_arrow(pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in cols}))
        a = df["id_a"].to_numpy(np.int64)
        b = df["id_b"].to_numpy(np.int64)
        it = df["inter"].to_numpy(np.int64)
        ma = df["ma"].to_numpy(np.int64)
        mb = df["mb"].to_numpy(np.int64)
        # each unordered pair row fans into its two directions; a
        # direction survives iff inter/m_src ≥ t (exact integer test)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        ii = np.concatenate([it, it])
        mm = np.concatenate([ma, mb])
        ok = ii * 1_000_000 >= t_e6 * mm
        src, dst, ii, mm = src[ok], dst[ok], ii[ok], mm[ok]
        cont = (ii * 2_000_000 + mm) // (2 * mm)
        return _pd_to_arrow(pd.DataFrame(
            {"id_a": src, "id_b": dst, "inter": ii, "m_a": mm,
             "containment_e6": cont}))

    return with_sizes.map_batches(directional, batch_format="pandas")
