"""Deduplication operators over a documents table (doc_id, text, …).

Large-scale training-data pipeline components (first-class per the
build brief; the reference's own dedup is only local
``drop_duplicates``, SURVEY.md §2.7 — these generalize it to corpus
scale):

* :func:`exact_dedup` — content-hash → hash-partitioned first-writer-wins.
  One shuffle on the hash; pre-grouped per batch so the shuffle carries
  one row per (batch, hash).
* :func:`minhash_lsh_dedup` — shingle → MinHash → band keys →
  ``groupby(band)`` candidate pairs → Jaccard verify → connected
  components → keep cluster representative.
* :func:`simhash_dedup` — 64-bit SimHash, bucket by rotated prefixes,
  Hamming-verify within buckets.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard verification for a
  candidate pair list (used as the verify stage of the LSH path).
* :func:`embedding_dedup` — cosine near-dup over an embeddings table
  (brute-force within LSH-ish buckets from sign-random-projections).

All ids/hashes are content-derived (stable across processes/partitions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from sbb_ned_ray.functions.hashing import (
    MinHasher,
    char_ngrams,
    hamming64,
    simhash64,
    stable_hash_hex,
)
from sbb_ned_ray.functions.textstats import tokenize_ws
from sbb_ned_ray.stages.cluster import pairs_to_clusters


def bucketed_map_groups(rows: ray.data.Dataset, key_col: str, group_fn,
                        nparts: int = 64, skip_singletons: bool = True):
    """``groupby(key).map_groups`` with per-group overhead amortized:
    hash-partition keys into ``nparts`` coarse buckets, then ONE pandas
    call per bucket iterates its real groups locally.
    ``skip_singletons`` drops single-row groups before calling
    ``group_fn`` (right for pair emitters — a singleton can never
    produce a pair); pass False when every group must be processed.
    """
    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_pandas_object(df[key_col], index=False)
                       .to_numpy() % nparts).astype(np.int32)
        return df

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"])
        if skip_singletons:
            counts = df[key_col].value_counts()
            multi = counts[counts > 1].index
            df = df[df[key_col].isin(multi)]
        outs = [group_fn(g) for _, g in df.groupby(key_col, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return group_fn(df.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    return (rows.map_batches(add_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(per_part, batch_format="pandas"))


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hashes = pa.array([stable_hash_hex(t) for t in texts], pa.string())
    return batch.append_column("content_hash", hashes)


def exact_dedup(docs: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Keep the min-id row per identical text. Returns (content_hash,
    keep_id, n_dups) — a groupby shuffle over narrow (hash, id) rows with
    a per-batch combiner first."""
    def partial(batch: pa.Table) -> pa.Table:
        t = add_content_hash(batch, text_col)
        df = t.select(["content_hash", id_col]).to_pandas()
        g = df.groupby("content_hash", sort=False)[id_col].agg(["min", "size"])
        g = g.reset_index()
        g.columns = ["content_hash", "keep_id", "n_dups"]
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("content_hash").aggregate(
        ray.data.aggregate.Min("keep_id", alias_name="keep_id"),
        ray.data.aggregate.Sum("n_dups", alias_name="n_dups"),
    )
    return agg


def minhash_signatures(docs: ray.data.Dataset, text_col: str = "text",
                       id_col: str = "doc_id", num_perm: int = 64,
                       ngram: int = 5, seed: int = 42) -> ray.data.Dataset:
    """doc → (doc_id, sig:list<uint64>) one row per doc."""
    def signer(batch: pa.Table) -> pa.Table:
        # MinHasher construction is trivial — plain tasks beat an actor
        # pool (no startup cliff, scales to every free CPU)
        mh = MinHasher(num_perm=num_perm, seed=seed)
        ids = batch[id_col].to_pylist()
        sigs = [mh.signature_from_text(t.lower(), ngram).tolist()
                for t in batch[text_col].to_pylist()]
        return pa.table({
            id_col: pa.array(ids),
            "sig": pa.array(sigs, pa.list_(pa.uint64())),
        })
    return docs.map_batches(signer, batch_format="pyarrow")


def minhash_band_rows(sigs: ray.data.Dataset, num_perm: int = 64,
                      bands: int = 16,
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, sig) → one row per (band, doc) carrying ONLY the band's
    ``num_perm // bands`` signature slice, not the full signature.  The
    LSH shuffle moves bands × (8 + r×8 + 8) B per doc (~0.6 KB at
    64/16) instead of bands × num_perm × 8 B (~8 KB) — at corpus scale
    the band shuffle IS the dedup job's dominant traffic, so the slice
    is the difference between shipping 1× and ~13× the signature data.
    Band keys are a vectorized polynomial+avalanche hash of the slice
    (collisions guarded by the exact slice-equality check in-bucket)."""
    r = num_perm // bands

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig_mat = batch["sig"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(n, num_perm)
        keys, slices, idx = [], [], []
        for band in range(bands):
            sl = np.ascontiguousarray(sig_mat[:, band * r:(band + 1) * r])
            acc = np.full(n, np.uint64(band * 2654435761 + 1),
                          dtype=np.uint64)
            for j in range(r):
                acc = acc * np.uint64(1099511628211) + sl[:, j]
            acc ^= acc >> np.uint64(30)
            acc *= np.uint64(0xBF58476D1CE4E5B9)
            acc ^= acc >> np.uint64(27)
            acc *= np.uint64(0x94D049BB133111EB)
            acc ^= acc >> np.uint64(31)
            keys.append(acc)
            slices.append(sl)
            idx.append(np.arange(n, dtype=np.int64))
        flat_slices = np.concatenate(slices).reshape(-1)
        return pa.table({
            "band_key": pa.array(np.concatenate(keys), pa.uint64()),
            id_col: batch[id_col].take(
                pa.array(np.concatenate(idx), pa.int64())),
            "bslice": pa.FixedSizeListArray.from_arrays(
                pa.array(flat_slices, pa.uint64()), r),
        })

    return sigs.map_batches(fn, batch_format="pyarrow")


def _band_candidates(band_rows: ray.data.Dataset, r: int, id_col: str,
                     max_pairs_per_bucket: int,
                     nparts: int = 64) -> ray.data.Dataset:
    """Band rows → candidate (id_a, id_b) pairs: hash-partition on
    band_key, then ONE numpy pass per coarse bucket (sort rows by
    (band_key, exact slice bytes, id), boundary scan, triu pairs per
    (band_key, slice) group — band_key is a 64-bit hash of the slice,
    so grouping on the exact slice values means a hash collision can
    never fabricate a pair).  ``max_pairs_per_bucket`` caps pairs per
    band_key group (the skew guard)."""

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["band_key"].to_numpy(zero_copy_only=False)
                % np.uint64(nparts)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def bucket_pairs_vec(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        n = t.num_rows
        if n < 2:
            return empty
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sl = t["bslice"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(n, r)
        order = np.lexsort(
            (ids,) + tuple(sl[:, j] for j in range(r - 1, -1, -1)) + (bk,))
        bk_s = bk[order]
        ids_s = ids[order]
        sl_s = sl[order]
        new_bk = np.empty(n, dtype=bool)
        new_bk[0] = True
        new_bk[1:] = bk_s[1:] != bk_s[:-1]
        new_grp = new_bk.copy()
        for j in range(r):
            new_grp[1:] |= sl_s[1:, j] != sl_s[:-1, j]
        starts = np.flatnonzero(new_grp)
        ends = np.append(starts[1:], n)
        # per-group budget tracking keyed by the band_key group each
        # slice group belongs to
        bk_group_of = np.cumsum(new_bk) - 1
        budgets: dict[int, int] = {}
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            bg = int(bk_group_of[s])
            budget = budgets.get(bg, max_pairs_per_bucket)
            if budget <= 0:
                continue
            g_ids = np.unique(ids_s[s:e])
            if len(g_ids) < 2:
                continue
            iu, ju = np.triu_indices(len(g_ids), k=1)
            take = min(budget, len(iu))
            out_a.append(g_ids[iu[:take]])
            out_b.append(g_ids[ju[:take]])
            budgets[bg] = budget - take
        if not out_a:
            return empty
        return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                         "id_b": pa.array(np.concatenate(out_b), pa.int64())})

    return band_rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part") \
        .map_groups(lambda t: bucket_pairs_vec(t.drop_columns(["_part"])),
                    batch_format="pyarrow")


def _sig_matrix(t: pa.Table, num_perm: int, id_col: str
                ) -> tuple[np.ndarray, np.ndarray]:
    """(ids sorted asc, signature matrix in that order) — zero-copy
    flatten of the arrow list column, no per-row python lists."""
    ids_np = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat_all = t["sig"].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False).reshape(len(t), num_perm)
    o = np.argsort(ids_np, kind="stable")
    return ids_np[o], mat_all[o]


def _verify_pairs(pairs: pd.DataFrame, ids_sorted: np.ndarray,
                  mat: np.ndarray, jaccard_threshold: float
                  ) -> pd.DataFrame:
    """MinHash-estimate verify of (id_a, id_b) pairs against a full
    signature matrix (every pair id must be present in ids_sorted)."""
    sa = mat[np.searchsorted(ids_sorted, pairs["id_a"].to_numpy())]
    sb = mat[np.searchsorted(ids_sorted, pairs["id_b"].to_numpy())]
    est = (sa == sb).mean(axis=1)
    keep = est >= jaccard_threshold
    return pairs.loc[keep].assign(est_jaccard=est[keep])


def _default_verify_partitions() -> int:
    # each hash-shuffle join holds num_partitions aggregators; more
    # partitions than CPUs deadlocks a small cluster and wins nothing
    # on a large one until the pair set is itself large
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(16, cpus // 2))


def _verify_pairs_ds(cand: ray.data.Dataset, sigs: ray.data.Dataset,
                     num_perm: int, id_col: str,
                     jaccard_threshold: float,
                     num_partitions: int | None = None
                     ) -> ray.data.Dataset:
    """Distributed MinHash verify: candidate (id_a, id_b) Dataset ⋈
    full signatures (twice, once per side) → (id_a, id_b, est_jaccard)
    Dataset of pairs at estimate ≥ threshold.  ``cand`` should already
    be pair-deduped (the same pair surfaces from every agreeing band).
    Fully distributed — nothing lands on the driver; shared by the
    batch scale branch and the incremental/Dataset variants."""
    if num_partitions is None:
        num_partitions = _default_verify_partitions()

    def _rename(suffix: str):
        # the hash join carries the signature as variable BINARY —
        # acero rejects list<> payload columns in join non-key fields.
        # Row bytes come straight from the flattened uint64 buffer +
        # an arithmetic offsets vector (no per-row tobytes loop).
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            flat = t["sig"].combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
            offs = pa.py_buffer(
                (np.arange(n + 1, dtype=np.int32) * (num_perm * 8))
                .tobytes())
            sig_bin = pa.Array.from_buffers(
                pa.binary(), n, [None, offs, pa.py_buffer(flat.tobytes())])
            return pa.table({f"id_{suffix}": t[id_col],
                             f"sig_{suffix}": sig_bin})
        return fn

    sig_a = sigs.map_batches(_rename("a"), batch_format="pyarrow")
    sig_b = sigs.map_batches(_rename("b"), batch_format="pyarrow")
    joined = cand.join(sig_a, join_type="inner",
                       num_partitions=num_partitions,
                       on=("id_a",)) \
        .join(sig_b, join_type="inner",
              num_partitions=num_partitions, on=("id_b",))

    def verify_est(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = np.frombuffer(
            b"".join(t["sig_a"].to_pylist()), dtype=np.uint64) \
            .reshape(t.num_rows, num_perm)
        sb = np.frombuffer(
            b"".join(t["sig_b"].to_pylist()), dtype=np.uint64) \
            .reshape(t.num_rows, num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= jaccard_threshold
        return pa.table({
            "id_a": t["id_a"].filter(pa.array(keep)),
            "id_b": t["id_b"].filter(pa.array(keep)),
            "est_jaccard": pa.array(est[keep], pa.float64())})

    return joined.map_batches(verify_est, batch_format="pyarrow")


def minhash_lsh_dedup(docs: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, ngram: int = 5,
                      jaccard_threshold: float = 0.8, seed: int = 42,
                      max_pairs_per_bucket: int = 1000,
                      driver_pair_limit: int = 200_000,
                      verify_num_partitions: int | None = None
                      ) -> pd.DataFrame:
    """Near-dup clusters: returns DataFrame (doc_id, cluster_id) for docs
    in near-dup clusters (cluster_id = min doc_id of cluster).

    Pipeline: sign per batch (ONCE, materialized) → band rows carrying
    only the band's signature SLICE (:func:`minhash_band_rows` — ~13×
    less shuffle volume than shipping the full signature per band) →
    groupby(band_key) → slice-equality candidate pairs (capped per
    bucket — skew guard) → global pair dedup (narrow groupby) → verify
    survivors on the FULL signatures via a hash join back to the
    signature table → MinHash-estimate ≥ threshold → transitive closure
    via :func:`sbb_ned_ray.stages.cluster.pairs_to_clusters` (driver
    union-find for small pair sets, distributed label propagation above
    ``driver_pair_limit`` — a duplicate-heavy corpus cannot OOM the
    driver with its pair list).
    """
    if verify_num_partitions is None:
        verify_num_partitions = _default_verify_partitions()
    sigs = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, ngram=ngram,
                              seed=seed).materialize()
    band_rows = minhash_band_rows(sigs, num_perm=num_perm, bands=bands,
                                  id_col=id_col)
    cand = _band_candidates(band_rows, num_perm // bands, id_col,
                            max_pairs_per_bucket).materialize()
    n_cand = cand.count()
    empty_out = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "cluster_id": pd.Series(dtype="int64")})
    if n_cand == 0:
        return empty_out
    if n_cand <= driver_pair_limit:
        # small candidate set (the common case outside dup-heavy
        # corpora): dedup pairs on the driver, pull ONLY the needed
        # signatures with one broadcast-membership scan, verify
        # vectorized — zero extra shuffles
        pairs = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
        need = np.union1d(pairs["id_a"].to_numpy(),
                          pairs["id_b"].to_numpy()).astype(np.int64)
        need_ref = ray.put(need)

        def pick(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, ray.get(need_ref))))

        # zero-copy signature matrix: flatten the arrow list column
        # instead of stacking per-row python lists
        picked = [pa.Table.from_batches([b]) if isinstance(
                      b, pa.RecordBatch) else b
                  for b in sigs.map_batches(pick, batch_format="pyarrow")
                  .iter_batches(batch_size=None, batch_format="pyarrow")]
        ids_sorted, mat = _sig_matrix(pa.concat_tables(picked),
                                      num_perm, id_col)
        sa = mat[np.searchsorted(ids_sorted, pairs["id_a"].to_numpy())]
        sb = mat[np.searchsorted(ids_sorted, pairs["id_b"].to_numpy())]
        est = (sa == sb).mean(axis=1)
        keep = est >= jaccard_threshold
        if not keep.any():
            return empty_out
        verified = pairs.loc[keep].assign(est_jaccard=est[keep])
        pairs_ds = ray.data.from_pandas(verified.reset_index(drop=True))
        out = pairs_to_clusters(pairs_ds,
                                driver_pair_limit=driver_pair_limit)
        out["node"] = out["node"].astype("int64")
        out["cluster_id"] = out["cluster_id"].astype("int64")
        return out.rename(columns={"node": "doc_id"})
    # scale path: the same pair surfaces from every agreeing band —
    # dedup on the narrow (id_a, id_b) rows before fetching full
    # signatures via the distributed hash join
    cand = cand.groupby(["id_a", "id_b"]).count() \
        .map_batches(lambda t: t.select(["id_a", "id_b"]),
                     batch_format="pyarrow")
    pairs_ds = _verify_pairs_ds(cand, sigs, num_perm, id_col,
                                jaccard_threshold, verify_num_partitions)
    out = pairs_to_clusters(pairs_ds, driver_pair_limit=driver_pair_limit)
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster_id": pd.Series(dtype="int64")})
    out["node"] = out["node"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out.rename(columns={"node": "doc_id"})


def minhash_lsh_dedup_ds(docs: ray.data.Dataset, text_col: str = "text",
                         id_col: str = "doc_id", num_perm: int = 64,
                         bands: int = 16, ngram: int = 5,
                         jaccard_threshold: float = 0.8, seed: int = 42,
                         max_pairs_per_bucket: int = 1000,
                         verify_num_partitions: int | None = None
                         ) -> ray.data.Dataset:
    """:func:`minhash_lsh_dedup` with the 100-TB output contract: the
    (doc_id, cluster_id) assignment is returned as a DATASET — consume
    it with ``write_parquet`` / ``iter_batches``; nothing (pairs or
    clusters) ever lands on the driver.  Every stage is the distributed
    branch: band-slice candidates → narrow pair dedup → hash-join
    signature verify (:func:`_verify_pairs_ds`) → label-propagation
    components (:func:`pairs_to_clusters_ds`)."""
    from sbb_ned_ray.stages.cluster import pairs_to_clusters_ds

    sigs = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, ngram=ngram,
                              seed=seed).materialize()
    band_rows = minhash_band_rows(sigs, num_perm=num_perm, bands=bands,
                                  id_col=id_col)
    cand = _band_candidates(band_rows, num_perm // bands, id_col,
                            max_pairs_per_bucket) \
        .groupby(["id_a", "id_b"]).count() \
        .map_batches(lambda t: t.select(["id_a", "id_b"]),
                     batch_format="pyarrow")
    verified = _verify_pairs_ds(cand, sigs, num_perm, id_col,
                                jaccard_threshold, verify_num_partitions)
    return pairs_to_clusters_ds(verified, node_col=id_col)


def minhash_verified_pairs(docs: ray.data.Dataset, text_col: str = "text",
                           id_col: str = "doc_id", num_perm: int = 64,
                           bands: int = 16, ngram: int = 5,
                           jaccard_threshold: float = 0.8, seed: int = 42,
                           max_pairs_per_bucket: int = 1000
                           ) -> pd.DataFrame:
    """The verified near-dup PAIR set (id_a, id_b, est_jaccard) — the
    intermediate :func:`minhash_lsh_dedup` clusters over, exposed for
    parity checks (the incremental path's reference) and for callers
    that want edges, not components.  Driver-collected: use only where
    the verified pair set fits the driver (tests / parity gates)."""
    sigs = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, ngram=ngram,
                              seed=seed).materialize()
    cand = _band_candidates(
        minhash_band_rows(sigs, num_perm=num_perm, bands=bands,
                          id_col=id_col),
        num_perm // bands, id_col, max_pairs_per_bucket)
    pairs = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    picked = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
              else b
              for b in sigs.iter_batches(batch_size=None,
                                         batch_format="pyarrow")]
    ids_sorted, mat = _sig_matrix(pa.concat_tables(picked), num_perm,
                                  id_col)
    return _verify_pairs(pairs, ids_sorted, mat, jaccard_threshold) \
        .reset_index(drop=True)


MINHASH_INDEX_VERSION = 1


def save_minhash_index(docs: ray.data.Dataset, artifact_dir: str,
                       text_col: str = "text", id_col: str = "doc_id",
                       num_perm: int = 64, bands: int = 16, ngram: int = 5,
                       seed: int = 42, num_buckets: int = 64) -> str:
    """One-time corpus signature index for INCREMENTAL dedup: writes
    the full signatures (``sigs/`` — fetched later via an id-pushdown
    parquet filter, never scanned whole) and the band rows partitioned
    by ``band_bucket = band_key % num_buckets`` (``bands/bucket=<b>/``
    — a delta probe reads only the buckets its own band keys hash to).
    Content-addressed (seeded min-n sample of (id, text-crc) + row
    count + knobs + format version) and atomically renamed, the
    ``build_ivf_layout`` pattern applied to the dedup index.  At corpus
    scale this index is the difference between re-signing 100 TB per
    crawl increment and touching only ``O(delta)`` band rows +
    signatures."""
    import hashlib
    import json
    import os
    import shutil
    import uuid
    import zlib

    from sbb_ned_ray.stages.similarity import _splitmix64

    os.makedirs(artifact_dir, exist_ok=True)
    n_rows = docs.count()

    def sample_part(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
        k = min(64, len(ids))
        idx = np.argpartition(h, k - 1)[:k] if len(ids) > k \
            else np.arange(len(ids))
        texts = t[text_col].take(pa.array(idx, pa.int64())).to_pylist()
        crc = np.array([zlib.crc32(x.encode("utf-8", "surrogatepass"))
                        for x in texts], dtype=np.uint64)
        return pa.table({"h": pa.array(h[idx], pa.uint64()),
                         "id": pa.array(ids[idx], pa.int64()),
                         "crc": pa.array(crc, pa.uint64())})

    samp = docs.map_batches(sample_part, batch_format="pyarrow") \
        .to_pandas().sort_values(["h", "id"]).head(64)
    hsh = hashlib.sha256()
    hsh.update(samp["h"].to_numpy(np.uint64).tobytes())
    hsh.update(samp["id"].to_numpy(np.int64).tobytes())
    hsh.update(samp["crc"].to_numpy(np.uint64).tobytes())
    hsh.update(f"|mhidx-v{MINHASH_INDEX_VERSION}|{n_rows}|{num_perm}|"
               f"{bands}|{ngram}|{seed}|{num_buckets}".encode())
    fp = hsh.hexdigest()[:16]
    out = os.path.join(artifact_dir, f"mhidx-{fp}")
    done = os.path.join(out, "_MINHASH_INDEX_COMPLETE")
    if os.path.exists(done):
        return out

    # builder-unique tmp: two concurrent builders of the same corpus
    # (same fingerprint, e.g. parallel sf sweeps sharing one artifact
    # dir) must not rmtree each other mid-write; whoever finishes the
    # atomic os.replace first wins, the loser detects the done marker
    tmp = out + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    shutil.rmtree(tmp, ignore_errors=True)
    sigs = minhash_signatures(docs, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, ngram=ngram,
                              seed=seed).materialize()
    sigs.write_parquet(os.path.join(tmp, "sigs"))
    band_rows = minhash_band_rows(sigs, num_perm=num_perm, bands=bands,
                                  id_col=id_col)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t["band_key"].to_numpy(zero_copy_only=False)
             % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    band_rows.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp, "bands"),
                       partition_cols=["bucket"])
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"fingerprint": fp, "n_rows": int(n_rows),
                   "version": MINHASH_INDEX_VERSION,
                   "num_perm": num_perm, "bands": bands, "ngram": ngram,
                   "seed": seed, "num_buckets": num_buckets,
                   "id_col": id_col, "text_col": text_col}, f)
    with open(os.path.join(tmp, "_MINHASH_INDEX_COMPLETE"), "w") as f:
        json.dump({"fingerprint": fp}, f)
    try:
        os.replace(tmp, out)
    except OSError:
        if not os.path.exists(done):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@ray.remote
def _unique_u64_remote(*tabs) -> np.ndarray:
    """Consolidate the ``band_key`` column of arrow blocks into one
    sorted-unique uint64 array INSIDE a task — the driver only ever
    holds the ObjectRef (the broadcast side of the delta semi-join
    stays off the driver heap no matter how large the delta is)."""
    arrs = [t["band_key"].to_numpy(zero_copy_only=False)
            for t in tabs if t.num_rows]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(arrs))


@ray.remote
def _touched_buckets_remote(keys: np.ndarray, num_buckets: int) -> list:
    return sorted(int(b) for b in
                  np.unique(keys % np.uint64(num_buckets)))


def _sided_band_candidates(band_rows: ray.data.Dataset, r: int,
                           id_col: str, max_pairs_per_bucket: int,
                           nparts: int = 64) -> ray.data.Dataset:
    """Side-tagged band rows (corpus ``side=0`` ∪ delta ``side=1``) →
    incremental candidate pairs via the same hash-partitioned
    one-numpy-pass-per-bucket shape as :func:`_band_candidates`.
    Within each exact (band_key, slice) group it emits

    * CROSS pairs ``(id_a=corpus id, id_b=delta id)`` — every
      corpus×delta combination, and
    * DELTA×DELTA pairs ``(id_a<id_b)`` — triu over the delta ids;

    corpus-internal pairs are never emitted (they belong to the base
    batch run, by the incremental contract).  ``max_pairs_per_bucket``
    is ONE shared budget per ``band_key`` group covering cross and
    delta-delta pairs together (cross consumed first), matching the
    batch path's per-bucket skew-guard semantics — a hot band slice
    (boilerplate/empty docs) is bounded on exactly the large-crawl
    workload this path serves."""

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["band_key"].to_numpy(zero_copy_only=False)
                % np.uint64(nparts)).astype(np.int32)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def bucket_pairs_vec(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "is_cross": pa.array([], pa.int8())})
        n = t.num_rows
        if n < 2:
            return empty
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        side = t["side"].to_numpy(zero_copy_only=False)
        sl = t["bslice"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(n, r)
        order = np.lexsort(
            (ids,) + tuple(sl[:, j] for j in range(r - 1, -1, -1)) + (bk,))
        bk_s, ids_s, side_s, sl_s = \
            bk[order], ids[order], side[order], sl[order]
        new_bk = np.empty(n, dtype=bool)
        new_bk[0] = True
        new_bk[1:] = bk_s[1:] != bk_s[:-1]
        new_grp = new_bk.copy()
        for j in range(r):
            new_grp[1:] |= sl_s[1:, j] != sl_s[:-1, j]
        starts = np.flatnonzero(new_grp)
        ends = np.append(starts[1:], n)
        bk_group_of = np.cumsum(new_bk) - 1
        budgets: dict[int, int] = {}
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_x: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            bg = int(bk_group_of[s])
            budget = budgets.get(bg, max_pairs_per_bucket)
            if budget <= 0:
                continue
            g_ids, g_side = ids_s[s:e], side_s[s:e]
            c_ids = np.unique(g_ids[g_side == 0])
            d_ids = np.unique(g_ids[g_side == 1])
            if not len(d_ids):
                continue
            # cross pairs first (the budget's primary claimant)
            if len(c_ids):
                ci, di = np.meshgrid(np.arange(len(c_ids)),
                                     np.arange(len(d_ids)), indexing="ij")
                ci, di = ci.ravel(), di.ravel()
                take = min(budget, len(ci))
                out_a.append(c_ids[ci[:take]])
                out_b.append(d_ids[di[:take]])
                out_x.append(np.ones(take, np.int8))
                budget -= take
            if budget > 0 and len(d_ids) > 1:
                iu, ju = np.triu_indices(len(d_ids), k=1)
                take = min(budget, len(iu))
                out_a.append(d_ids[iu[:take]])
                out_b.append(d_ids[ju[:take]])
                out_x.append(np.zeros(take, np.int8))
                budget -= take
            budgets[bg] = budget
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "is_cross": pa.array(np.concatenate(out_x), pa.int8())})

    return band_rows.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part") \
        .map_groups(lambda t: bucket_pairs_vec(t.drop_columns(["_part"])),
                    batch_format="pyarrow")


def minhash_dedup_incremental(index_path: str, new_docs: ray.data.Dataset,
                              jaccard_threshold: float = 0.8,
                              max_pairs_per_bucket: int = 1000,
                              driver_pair_limit: int = 200_000
                              ) -> dict:
    """Dedup a DELTA against a persisted corpus index without touching
    the corpus: the daily-crawl shape at 100 TB.  Fully distributed on
    the delta side — the delta's signatures and band rows stay in the
    object store end to end; the driver holds only ObjectRefs, the
    touched-bucket list (≤ ``num_buckets`` ints) and the verified-hit
    ids.  Steps:

    1. sign the delta and band it (distributed, ∝ delta);
    2. consolidate the delta's UNIQUE band keys into one object-store
       array inside a task (:func:`_unique_u64_remote`);
    3. read ONLY the band-bucket partitions those keys hash to,
       broadcast-semi-joined to matching ``band_key`` rows;
    4. co-group matched corpus rows with the delta's band rows on the
       band key (:func:`_sided_band_candidates`) — candidate pairs =
       exact slice equality, cross (corpus×delta) and delta×delta,
       ONE shared ``max_pairs_per_bucket`` budget per band group;
    5. verify on full signatures — delta signatures from step 1,
       matched corpus signatures via an id-pushdown parquet filter on
       ``sigs/`` (never a corpus scan); below ``driver_pair_limit``
       candidate pairs the verify is a driver-vectorized estimate over
       exactly the needed signatures, above it the distributed
       hash-join verify (:func:`_verify_pairs_ds`);
    6. transitive closure over the verified INCREMENTAL edges only
       (corpus-internal edges belong to the base run, by contract).

    Returns ``{"clusters": DataFrame(doc_id, cluster_id),
    "pairs": DataFrame(id_a, id_b, est_jaccard), "stats": {...}}``;
    cross pairs carry ``id_a`` = corpus id, ``id_b`` = delta id.
    """
    import json
    import os

    import pyarrow.dataset as pads

    from ray.data.aggregate import Max

    with open(os.path.join(index_path, "manifest.json")) as f:
        meta = json.load(f)
    num_perm = meta["num_perm"]
    bands = meta["bands"]
    ngram = meta["ngram"]
    seed = meta["seed"]
    num_buckets = meta["num_buckets"]
    id_col = meta["id_col"]
    text_col = meta["text_col"]
    r = num_perm // bands

    empty_pairs = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                "id_b": pd.Series(dtype="int64"),
                                "est_jaccard": pd.Series(dtype="float64")})
    empty_clusters = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                   "cluster_id": pd.Series(dtype="int64")})

    # 1. sign + band the delta (stays distributed; the driver sees a count)
    dsigs = minhash_signatures(new_docs, text_col=text_col,
                               id_col=id_col, num_perm=num_perm,
                               ngram=ngram, seed=seed).materialize()
    stats = {"n_delta": int(dsigs.count()), "buckets_read": 0,
             "buckets_total": num_buckets,
             "corpus_band_rows_matched": 0, "corpus_sigs_fetched": 0,
             "n_pairs": 0}
    if stats["n_delta"] == 0:
        return {"clusters": empty_clusters, "pairs": empty_pairs,
                "stats": stats}
    dband = minhash_band_rows(dsigs, num_perm=num_perm, bands=bands,
                              id_col=id_col).materialize()

    # 2. unique delta band keys — consolidated in a task, driver keeps
    # the ObjectRef (the probe's broadcast side, ~8 B per unique key)
    keys_ref = _unique_u64_remote.remote(
        *dband.select_columns(["band_key"]).to_arrow_refs())
    touched = ray.get(_touched_buckets_remote.remote(keys_ref, num_buckets))

    # 3. broadcast semi-join: touched bucket partitions → rows whose
    # band_key appears in the delta's key set
    dirs = [os.path.join(index_path, "bands", f"bucket={b}")
            for b in touched]
    dirs = [p for p in dirs if os.path.isdir(p)]
    stats["buckets_read"] = len(dirs)
    # read_parquet expands a single directory but not directories
    # inside a path LIST — enumerate the partition files explicitly
    paths = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]

    def match_corpus(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        bk = t["band_key"].to_numpy(zero_copy_only=False)
        if not len(ks) or not len(bk):
            return t.slice(0, 0)
        pos = np.searchsorted(ks, bk)
        pos[pos >= len(ks)] = len(ks) - 1
        return t.filter(pa.array(ks[pos] == bk))

    def tag_side(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, np.int8),
                                 pa.int8()))
        return fn

    sided = dband.map_batches(tag_side(1), batch_format="pyarrow")
    if paths:
        cmatch = ray.data.read_parquet(paths) \
            .map_batches(match_corpus, batch_format="pyarrow") \
            .map_batches(tag_side(0), batch_format="pyarrow") \
            .materialize()
        stats["corpus_band_rows_matched"] = int(cmatch.count())
        if stats["corpus_band_rows_matched"]:
            sided = sided.union(cmatch)

    # 4. co-grouped candidates + narrow pair dedup (is_cross is a pair
    # invariant — corpus and delta ids are disjoint — so Max is a carry)
    cand = _sided_band_candidates(sided, r, id_col, max_pairs_per_bucket) \
        .groupby(["id_a", "id_b"]) \
        .aggregate(Max("is_cross", alias_name="is_cross")).materialize()
    n_cand = int(cand.count())
    if n_cand == 0:
        return {"clusters": empty_clusters, "pairs": empty_pairs,
                "stats": stats}

    # 5. signature fetch: corpus side by id pushdown (hit-sized)
    cross_ids_df = cand.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t["is_cross"], pa.scalar(1, pa.int8())))
        .select(["id_a"]), batch_format="pyarrow") \
        .groupby("id_a").count().to_pandas()
    need_corpus = (cross_ids_df["id_a"].to_numpy(np.int64)
                   if len(cross_ids_df) else np.empty(0, np.int64))
    stats["corpus_sigs_fetched"] = int(len(need_corpus))
    sigs_all = dsigs
    if len(need_corpus):
        csigs = ray.data.read_parquet(
            os.path.join(index_path, "sigs"),
            filter=pads.field(id_col).isin(need_corpus.tolist()))
        sigs_all = dsigs.union(csigs)

    pairs_narrow = cand.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow")
    if n_cand <= driver_pair_limit:
        pairs = pairs_narrow.to_pandas()
        need = np.union1d(pairs["id_a"].to_numpy(),
                          pairs["id_b"].to_numpy()).astype(np.int64)
        need_ref = ray.put(need)

        def pick(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(ids, ray.get(need_ref))))

        picked = [pa.Table.from_batches([b]) if isinstance(
                      b, pa.RecordBatch) else b
                  for b in sigs_all.map_batches(
                      pick, batch_format="pyarrow")
                  .iter_batches(batch_size=None, batch_format="pyarrow")]
        ids_sorted, mat = _sig_matrix(pa.concat_tables(picked),
                                      num_perm, id_col)
        verified = _verify_pairs(pairs, ids_sorted, mat,
                                 jaccard_threshold).reset_index(drop=True)
        verified_ds = None
    else:
        verified_ds = _verify_pairs_ds(pairs_narrow, sigs_all, num_perm,
                                       id_col, jaccard_threshold) \
            .materialize()
        verified = verified_ds.to_pandas()
        if "id_a" not in verified.columns:
            verified = empty_pairs.copy()
        verified = verified.sort_values(["id_a", "id_b"]) \
            .reset_index(drop=True)
    stats["n_pairs"] = int(len(verified))
    if verified.empty:
        return {"clusters": empty_clusters, "pairs": empty_pairs,
                "stats": stats}

    # 6. closure over incremental edges (bounded-collect helper: driver
    # union-find small, distributed label propagation large)
    src = verified_ds if verified_ds is not None \
        else ray.data.from_pandas(verified)
    clusters = pairs_to_clusters(src, driver_pair_limit=driver_pair_limit) \
        .rename(columns={"node": "doc_id"})
    clusters["doc_id"] = clusters["doc_id"].astype("int64")
    clusters["cluster_id"] = clusters["cluster_id"].astype("int64")
    return {"clusters": clusters, "pairs": verified, "stats": stats}


def simhash_pairs(docs: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  prefix_bits: int = 16,
                  max_pairs_per_bucket: int = 1000) -> ray.data.Dataset:
    """SimHash near-dup candidate pairs as a lazy Dataset: bucket by 4
    rotated 16-bit prefixes (any pair within Hamming ≤ 3 of a 64-bit
    hash shares at least one of 4 disjoint 16-bit blocks exactly —
    pigeonhole), verify Hamming in-bucket.

    ``max_pairs_per_bucket`` is the skew guard (same contract as
    minhash's): a hot bucket — e.g. boilerplate-heavy crawl pages
    sharing one 16-bit block — is otherwise an unbounded O(n²) loop
    inside a single task.  The budget bounds both emitted pairs AND
    the comparison loop itself."""
    def sim_rows(batch: pa.Table) -> pa.Table:
        out_b, out_id, out_h = [], [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            h = simhash64(tokenize_ws(text.lower()))
            for blk in range(4):
                key = (blk << 16) | ((h >> (blk * 16)) & 0xFFFF)
                out_b.append(key)
                out_id.append(did)
                out_h.append(h)
        return pa.table({"bucket": pa.array(out_b, pa.int64()),
                         id_col: pa.array(out_id),
                         "simhash": pa.array(out_h, pa.uint64())})

    rows = docs.map_batches(sim_rows, batch_format="pyarrow")

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        hs = g["simhash"].tolist()
        out = []
        budget = max_pairs_per_bucket
        for i in range(len(ids)):
            if budget <= 0:
                break
            for j in range(i + 1, len(ids)):
                if budget <= 0:
                    break
                d = hamming64(int(hs[i]), int(hs[j]))
                if d <= max_hamming:
                    out.append((ids[i], ids[j], d))
                    budget -= 1
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"]) \
            if out else pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                      "id_b": pd.Series(dtype="int64"),
                                      "hamming": pd.Series(dtype="int64")})

    return bucketed_map_groups(rows, "bucket", bucket_verify)


def _collect_pairs(pairs_ds: ray.data.Dataset,
                   value_col: str) -> pd.DataFrame:
    """to_pandas + dedup/sort for a pair Dataset; a fully-empty result
    can arrive with no schema at all (every block empty) — restore the
    contract columns."""
    pairs = pairs_ds.to_pandas()
    if "id_a" not in pairs.columns:
        pairs = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              value_col: pd.Series(dtype="float64")})
    return pairs.drop_duplicates(subset=["id_a", "id_b"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_dedup(docs: ray.data.Dataset, **kwargs) -> pd.DataFrame:
    """Collected, deduped SimHash pair list (small-result contract; for
    duplicate-heavy corpora use :func:`simhash_clusters` which never
    collects the raw pair list)."""
    return _collect_pairs(simhash_pairs(docs, **kwargs), "hamming")


def simhash_clusters(docs: ray.data.Dataset,
                     driver_pair_limit: int = 200_000,
                     **kwargs) -> pd.DataFrame:
    """SimHash near-dup clusters (doc_id, cluster_id) via the bounded
    transitive-closure helper."""
    out = pairs_to_clusters(simhash_pairs(docs, **kwargs),
                            driver_pair_limit=driver_pair_limit)
    return out.rename(columns={"node": "doc_id"})


def simhash_clusters_ds(docs: ray.data.Dataset,
                        **kwargs) -> ray.data.Dataset:
    """SimHash near-dup clusters as a DATASET (doc_id, cluster_id) —
    label propagation end to end, no driver collect (the 100-TB
    output contract; :func:`simhash_clusters` is the driver-DataFrame
    convenience wrapper)."""
    from sbb_ned_ray.stages.cluster import pairs_to_clusters_ds
    return pairs_to_clusters_ds(simhash_pairs(docs, **kwargs),
                                node_col="doc_id")


def ngram_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    a = set(char_ngrams(text_a.lower(), n))
    b = set(char_ngrams(text_b.lower(), n))
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


_SRP_PLANE_CACHE: dict[tuple, np.ndarray] = {}


def _srp_planes(dim: int, n_tables: int, n_projections: int,
                seed: int) -> np.ndarray:
    """Deterministic SRP plane matrix, cached per worker process (the
    worker-global idiom of ``stages/fused.py`` — plane generation is
    pure in its key, so a cache hit is bit-identical to a rebuild)."""
    key = (dim, n_tables, n_projections, seed)
    planes = _SRP_PLANE_CACHE.get(key)
    if planes is None:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal(
            (dim, n_tables * n_projections)).astype(np.float32)
        _SRP_PLANE_CACHE[key] = planes
    return planes


def embedding_pairs(emb: ray.data.Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    cos_threshold: float = 0.95,
                    n_projections: int = 12,
                    n_tables: int = 4,
                    seed: int = 42,
                    max_pairs_per_bucket: int = 1000) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs as a lazy Dataset: BANDED
    sign-random-projection buckets (``n_tables`` independent
    ``n_projections``-bit SRP tables — each vector lands in one bucket
    per table, a pair is a candidate if ANY table co-buckets it), exact
    cosine verify within buckets.  Banding is the same recall lever as
    minhash's ``bands``: per-table collision probability for a pair at
    angle θ is ``(1-θ/π)^n_projections``, overall recall
    ``1-(1-p)^n_tables`` — tune bits down / tables up for
    moderate-cosine targets, bits up / tables down for near-identical
    dedup (the ``embedding_srp_recall`` query measures the curve).

    ``max_pairs_per_bucket`` caps emitted pairs per SRP bucket (skew
    guard, same contract as minhash/simhash) so one hot bucket cannot
    emit an unbounded pair list."""
    def bucketize(batch: pa.Table) -> pa.Table:
        from sbb_ned_ray.stages.similarity import _vecs_np

        # zero-copy flatten of the arrow list column (no per-row python
        # lists) + worker-global plane cache: the SRP plane matrix is
        # deterministic in (dim, tables, bits, seed), so generate it
        # once per worker process, not once per batch
        n_rows = batch.num_rows
        vecs = _vecs_np(batch, vec_col, np.float32)
        planes = _srp_planes(vecs.shape[1], n_tables, n_projections, seed)
        signs = (vecs @ planes) > 0
        out_key, out_idx = [], []
        for t in range(n_tables):
            keys = np.zeros(n_rows, dtype=np.int64)
            for b in range(n_projections):
                keys |= signs[:, t * n_projections + b].astype(np.int64) << b
            out_key.append(keys | (np.int64(t) << n_projections))
            out_idx.append(np.arange(n_rows, dtype=np.int64))
        take = pa.array(np.concatenate(out_idx), pa.int64())
        return pa.table({
            "bucket": pa.array(np.concatenate(out_key), pa.int64()),
            id_col: batch[id_col].take(take),
            vec_col: batch[vec_col].take(take)})

    rows = emb.map_batches(bucketize, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        if len(g) < 2:      # schema probe / singleton bucket
            return empty
        ids = g[id_col].tolist()
        vecs = np.array([np.asarray(v, dtype=np.float32) for v in g[vec_col]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        cos = unit @ unit.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = cos[iu, ju] >= cos_threshold
        iu, ju = iu[hit][:max_pairs_per_bucket], ju[hit][:max_pairs_per_bucket]
        if not len(iu):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "cosine": pd.Series(dtype="float64")})
        id_arr = np.asarray(ids)
        return pd.DataFrame({
            "id_a": id_arr[iu], "id_b": id_arr[ju],
            "cosine": np.round(cos[iu, ju].astype(np.float64), 6)})

    return bucketed_map_groups(rows, "bucket", verify)


def embedding_dedup(emb: ray.data.Dataset, **kwargs) -> pd.DataFrame:
    """Collected, deduped embedding near-dup pair list (small-result
    contract; :func:`embedding_clusters` is the unbounded-safe variant)."""
    return _collect_pairs(embedding_pairs(emb, **kwargs), "cosine")


def embedding_clusters(emb: ray.data.Dataset,
                       driver_pair_limit: int = 200_000,
                       **kwargs) -> pd.DataFrame:
    """Embedding near-dup clusters (vec_id, cluster_id) via the bounded
    transitive-closure helper."""
    out = pairs_to_clusters(embedding_pairs(emb, **kwargs),
                            driver_pair_limit=driver_pair_limit)
    return out.rename(columns={"node": "vec_id"})


def embedding_clusters_ds(emb: ray.data.Dataset,
                          **kwargs) -> ray.data.Dataset:
    """Embedding near-dup clusters as a DATASET (vec_id, cluster_id) —
    no driver collect (:func:`embedding_clusters` is the convenience
    wrapper)."""
    from sbb_ned_ray.stages.cluster import pairs_to_clusters_ds
    return pairs_to_clusters_ds(embedding_pairs(emb, **kwargs),
                                node_col="vec_id")


def semantic_dedup_ds(emb: ray.data.Dataset, eps: float = 0.45,
                      n_clusters: int = 8, sample_size: int = 1024,
                      seed: int = 42, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      max_cluster_rows: int = 4096) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by coarse k-means clustering + within-cluster exact
    cosine pruning — the embedding-space analogue of the reference's
    local ``drop_duplicates`` at corpus scale.

    Shape (all narrow except ONE groupby on the cluster id):

    1. a spherical coarse quantizer trains on a seeded splitmix64
       sample (``similarity.train_centroids`` — the IVF quantizer);
    2. every batch assigns rows to the nearest centroid with one
       broadcast matmul (zero-copy vector reads);
    3. ``groupby(sem_cluster).map_groups`` finds exact cosine ≥ eps
       pairs INSIDE each cluster only (the paper's O(n²/k) trick),
       unions them into duplicate groups, and keeps one
       representative per group — the row LEAST similar to its
       centroid (the paper's keep-the-outlier rule; ties by id).

    ``max_cluster_rows`` is the skew guard (same contract as the
    minhash/simhash bucket caps): a cluster beyond the cap has only
    its first-by-id cap rows compared; the overflow rows are kept
    unconditionally (dedup recall degrades, never correctness).

    Returns a DATASET ``(id, sem_cluster, dup_group, keep)`` with one
    row per input row — the 100-TB output contract: consume it with
    ``write_parquet`` / ``iter_batches``; nothing lands on the driver
    (:func:`semantic_dedup` is the driver-DataFrame convenience
    wrapper).  ``dup_group`` is the min id of the row's duplicate
    component (its own id if unique).  Cross-cluster duplicates are
    invisible by design — that recall/cost trade-off IS the operator
    (measured by the ``semantic_dedup_recall`` gate).
    """
    from sbb_ned_ray.stages.similarity import (
        _unit,
        _vecs_np,
        seeded_sample,
        train_centroids,
    )

    cents = train_centroids(
        seeded_sample(emb, sample_size, id_col, vec_col, seed),
        n_clusters, seed=seed)
    cents_ref = ray.put(cents.astype(np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        vecs = _unit(_vecs_np(t, vec_col, np.float64))
        a = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
        cent_cos = np.einsum("ij,ij->i", vecs, c[a])
        return pa.table({
            id_col: t[id_col],
            vec_col: t[vec_col],
            "sem_cluster": pa.array(a, pa.int32()),
            "cent_cos": pa.array(cent_cos, pa.float64())})

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).reset_index(drop=True)
        ids = g[id_col].to_numpy(np.int64)
        n = len(g)
        head = min(n, max_cluster_rows)
        X = np.stack([np.asarray(v, np.float64)
                      for v in g[vec_col].iloc[:head]])
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        cos = X @ X.T
        # union-find over eps-pairs (upper triangle)
        parent = np.arange(head)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(cos >= eps, k=1))
        for a, b in zip(ii, jj):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(head)])
        cent_cos = g["cent_cos"].to_numpy()
        keep = np.ones(n, bool)
        dup_group = ids.copy()
        for r in np.unique(roots):
            members = np.flatnonzero(roots == r)
            if len(members) < 2:
                continue
            dup_group[members] = ids[members].min()
            # keep the member least similar to the centroid; tie → min id
            order = np.lexsort((ids[members], cent_cos[members]))
            keep[members] = False
            keep[members[order[0]]] = True
        return pd.DataFrame({
            id_col: ids, "sem_cluster": g["sem_cluster"].iloc[0],
            "dup_group": dup_group, "keep": keep})

    return emb.map_batches(assign, batch_format="pyarrow") \
        .groupby("sem_cluster") \
        .map_groups(prune, batch_format="pandas")


def semantic_dedup(emb: ray.data.Dataset, **kwargs) -> pd.DataFrame:
    """Driver-DataFrame convenience wrapper over
    :func:`semantic_dedup_ds` (small-corpus contract — the collect is
    one row per INPUT row; at corpus scale consume the Dataset variant
    with ``write_parquet`` instead)."""
    id_col = kwargs.get("id_col", "vec_id")
    out = semantic_dedup_ds(emb, **kwargs).to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)
