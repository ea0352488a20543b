"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul
  against it, keeps per-batch top-k (the combiner), and a final tiny
  reduce merges per-batch candidates.  No shuffle of the corpus.
* :func:`build_ivf_layout` / :func:`ivf_topk_indexed` — the scale
  path, split build-index / serve exactly like the reference's Annoy
  flow (``index.py:529-592`` build vs ``:623-649`` load): a one-time
  job trains a seeded coarse quantizer and writes the corpus to
  parquet PARTITIONED by nearest centroid (hive ``ivf_list=<c>/``
  dirs); queries then ``read_parquet`` ONLY the ``nprobe`` probed
  partitions, so scanned bytes scale with ``nprobe / n_centroids``
  instead of corpus size.
* :func:`ivf_topk` — convenience wrapper: build-once (fingerprint
  cached) + serve, for ad-hoc query sets.
* :func:`kmeans_distributed` — full-corpus Lloyd's; seeds come from a
  narrow min-k-by-id pass (no global sort).

All vector reads are zero-copy: fixed-length ``list<float>`` columns
flatten to one numpy buffer (``combine_chunks().flatten().to_numpy()
.reshape``) — never ``to_pylist()`` per row.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _vecs_np(batch: pa.Table, vec_col: str, dtype=np.float64) -> np.ndarray:
    """Zero-copy fixed-length list<float> column → (n, dim) ndarray."""
    flat = batch[vec_col].combine_chunks().flatten() \
        .to_numpy(zero_copy_only=False)
    return flat.reshape(batch.num_rows, -1).astype(dtype, copy=False)


def _ids_np(batch: pa.Table, id_col: str) -> np.ndarray:
    return batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)


def _topk_partial(ids: np.ndarray, cos: np.ndarray, q_indices,
                  k: int) -> pa.Table:
    """Per-batch top-k per query (the combiner).  ``cos`` is
    (n_batch, n_query_subset); ``q_indices`` maps columns to global
    query indices.  Cosine kept at full float64 — rounding here would
    CREATE ties the exact merge doesn't have."""
    kk = min(k, len(ids))
    out_q, out_id, out_cos = [], [], []
    for col_i, qi in enumerate(q_indices):
        col = cos[:, col_i]
        top = np.argpartition(-col, kk - 1)[:kk] if len(col) > kk \
            else np.arange(len(col))
        out_q.append(np.full(len(top), qi, np.int32))
        out_id.append(ids[top])
        out_cos.append(col[top].astype(np.float64))
    return pa.table({"q_idx": pa.array(np.concatenate(out_q), pa.int32()),
                     "vec_id_": pa.array(np.concatenate(out_id), pa.int64()),
                     "cosine": pa.array(np.concatenate(out_cos),
                                        pa.float64())})


def _merge_topk(partials: pd.DataFrame, query_ids: list[int], k: int,
                id_col: str) -> pd.DataFrame:
    """Driver-side merge of per-batch top-k partials (tiny:
    blocks × queries × k rows).  Ties broken by vec_id, matching the
    oracle's ``ORDER BY cosine DESC, vec_id``."""
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                             id_col: pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64"),
                             "knn_rank": pd.Series(dtype="int64")})
    top = partials.sort_values(["q_idx", "cosine", "vec_id_"],
                               ascending=[True, False, True]) \
        .groupby("q_idx", sort=True).head(k)
    top["knn_rank"] = top.groupby("q_idx").cumcount() + 1
    top["query_id"] = top["q_idx"].map(lambda qi: query_ids[qi])
    out = top.rename(columns={"vec_id_": id_col})
    return out[["query_id", id_col, "cosine", "knn_rank"]] \
        .sort_values(["query_id", "knn_rank"]).reset_index(drop=True)


def brute_force_topk(emb: ray.data.Dataset, queries: np.ndarray,
                     query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns
    (query_id, vec_id, cosine, knn_rank) sorted."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)
    q_indices = np.arange(len(qm))

    def scorer(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = _ids_np(batch, id_col)
        vecs = _unit(_vecs_np(batch, vec_col, np.float64))
        return _topk_partial(ids, vecs @ q.T, q_indices, k)

    partials = emb.map_batches(scorer, batch_format="pyarrow",
                               batch_size=4096).to_pandas()
    return _merge_topk(partials, query_ids, k, id_col)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 ids (deterministic per-row
    sampling key; wraps mod 2^64 like the C reference)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def seeded_sample(ds: ray.data.Dataset, n: int, id_col: str = "vec_id",
                  vec_col: str = "embedding", seed: int = 42) -> np.ndarray:
    """Deterministic uniform-ish n-row sample: keep the n rows with the
    smallest ``splitmix64(id ^ seed)`` key — a per-batch min-n partial
    plus a tiny driver merge (union of per-batch top-n contains the
    global top-n), independent of block order and batching.  Replaces
    the biased ``limit(n)`` first-N sample."""
    def partial(t: pa.Table) -> pa.Table:
        ids = _ids_np(t, id_col)
        h = _splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
        kk = min(n, len(ids))
        idx = np.argpartition(h, kk - 1)[:kk] if len(ids) > kk \
            else np.arange(len(ids))
        out = t.select([id_col, vec_col]).take(pa.array(idx, pa.int64()))
        return out.append_column("_h", pa.array(h[idx], pa.uint64()))

    small = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().sort_values(["_h", id_col]).head(n)
    return np.stack([np.asarray(v, dtype=np.float32)
                     for v in small[vec_col]])


def min_k_by_id(ds: ray.data.Dataset, k: int, id_col: str = "vec_id",
                vec_col: str = "embedding") -> np.ndarray:
    """The k rows with the smallest ids, WITHOUT a global sort: per-batch
    min-k partial → driver merge of ≤ k × n_blocks rows.  Used for the
    deterministic first-k-by-id k-means seeds (same rows the old
    ``sort(id).limit(k)`` produced, minus the all-to-all)."""
    def partial(t: pa.Table) -> pa.Table:
        ids = _ids_np(t, id_col)
        kk = min(k, len(ids))
        idx = np.argpartition(ids, kk - 1)[:kk] if len(ids) > kk \
            else np.arange(len(ids))
        return t.select([id_col, vec_col]).take(pa.array(idx, pa.int64()))

    small = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().sort_values(id_col).head(k)
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in small[vec_col]])


def train_centroids(sample: np.ndarray, n_centroids: int, seed: int = 42,
                    iters: int = 8) -> np.ndarray:
    """Seeded k-means on a driver-side sample (the coarse quantizer).
    Deterministic: fixed init permutation, fixed iteration count."""
    rng = np.random.default_rng(seed)
    sample = _unit(sample.astype(np.float32))
    idx = rng.permutation(len(sample))[:n_centroids]
    cents = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _unit(cents)
    return cents


CENTROIDS_FORMAT_VERSION = 2          # v2: seeded sample, not limit(n)


def load_or_train_centroids(sample: np.ndarray, n_centroids: int,
                            artifact_dir: str | None = None,
                            seed: int = 42, iters: int = 8) -> np.ndarray:
    """Coarse-quantizer artifact: the trained centroid matrix is
    persisted (``.npy`` + fingerprint manifest keyed by sample content,
    k-means knobs and format version) so repeated IVF jobs over the
    same corpus skip retraining — the index-build/serve split of a real
    ANN deployment (reference Annoy ``build-index``, Makefile:7-8)."""
    if artifact_dir is None:
        return train_centroids(sample, n_centroids, seed, iters)
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(sample.astype(np.float32)).tobytes())
    h.update(f"|v{CENTROIDS_FORMAT_VERSION}|{n_centroids}|{seed}|{iters}"
             .encode())
    fp = h.hexdigest()[:16]
    os.makedirs(artifact_dir, exist_ok=True)
    npy = os.path.join(artifact_dir, "centroids.npy")
    mf = os.path.join(artifact_dir, "_centroids_manifest.json")
    if os.path.exists(npy) and os.path.exists(mf):
        try:
            with open(mf) as f:
                if json.load(f).get("fingerprint") == fp:
                    return np.load(npy)
        except (json.JSONDecodeError, OSError, ValueError):
            pass
    cents = train_centroids(sample, n_centroids, seed, iters)
    tmp = npy + ".tmp.npy"
    np.save(tmp, cents)
    os.replace(tmp, npy)
    with open(mf, "w") as f:
        json.dump({"fingerprint": fp, "n_centroids": int(n_centroids),
                   "dim": int(cents.shape[1])}, f)
    return cents


IVF_LAYOUT_VERSION = 3     # v3: optional PQ code column + codebooks


def build_ivf_layout(emb: ray.data.Dataset, artifact_dir: str,
                     n_centroids: int = 16, sample_size: int = 2048,
                     seed: int = 42, iters: int = 8,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     pq_m: int | None = None, pq_ks: int = 256,
                     ) -> str:
    """One-time IVF index-build job: train the coarse quantizer on a
    seeded sample, then write the corpus to parquet PARTITIONED by
    nearest centroid (``data/ivf_list=<c>/``) plus the centroid matrix
    and a fingerprint manifest.  The whole artifact directory is
    content-addressed (corpus sample + row count + knobs + format
    version) and atomically renamed, so reruns over an unchanged corpus
    return the existing path without touching the data — the
    ``save_block_tables`` pattern (blocking.py:182) applied to the
    corpus itself.

    With ``pq_m`` set, the layout is the full IVFADC index (Jégou et
    al. 2011): PQ codebooks train on the SAME seeded sample and every
    row additionally stores its ``pq_code`` (fixed_size_list<uint8>[m]
    — m bytes/vector); serving's ADC pass then column-prunes the read
    to the code column and never touches the float vectors until the
    exact re-rank."""
    os.makedirs(artifact_dir, exist_ok=True)
    n_rows = emb.count()
    sample = seeded_sample(emb, sample_size, id_col, vec_col, seed)
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(sample).tobytes())
    h.update(f"|ivf-v{IVF_LAYOUT_VERSION}|{n_rows}|{n_centroids}|"
             f"{seed}|{iters}|{sample_size}|{pq_m}|{pq_ks}".encode())
    fp = h.hexdigest()[:16]
    out = os.path.join(artifact_dir, f"ivf-{fp}")
    done = os.path.join(out, "_IVF_LAYOUT_COMPLETE")
    if os.path.exists(done):
        return out

    cents = train_centroids(sample, n_centroids, seed, iters)
    cents_ref = ray.put(cents.astype(np.float32))
    books = None
    if pq_m is not None:
        books = train_pq_codebooks(sample, m=pq_m, ks=pq_ks, seed=seed)
    books_ref = ray.put(books)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        vecs = _unit(_vecs_np(t, vec_col, np.float32))
        a = np.argmax(vecs @ c.T, axis=1).astype(np.int32)
        # ivf_list becomes the hive partition dir (dropped from the
        # files); list_id stays IN the files so serving can read the
        # probed dirs as ONE dataset and still see each row's list
        t = t.append_column("ivf_list", pa.array(a, pa.int32())) \
            .append_column("list_id", pa.array(a, pa.int32()))
        bks = ray.get(books_ref)
        if bks is not None:
            codes = pq_encode(vecs.astype(np.float64), bks)
            t = t.append_column(
                "pq_code", pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.ravel(), pa.uint8()),
                    codes.shape[1]))
        return t

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    emb.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(tmp, "data"), partition_cols=["ivf_list"])
    np.save(os.path.join(tmp, "centroids.npy"), cents)
    if books is not None:
        np.save(os.path.join(tmp, "pq_books.npy"), books)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"fingerprint": fp, "n_centroids": int(n_centroids),
                   "dim": int(cents.shape[1]), "n_rows": int(n_rows),
                   "version": IVF_LAYOUT_VERSION,
                   "pq_m": pq_m, "pq_ks": pq_ks,
                   "id_col": id_col, "vec_col": vec_col}, f)
    with open(os.path.join(tmp, "_IVF_LAYOUT_COMPLETE"), "w") as f:
        json.dump({"fingerprint": fp}, f)
    try:
        os.replace(tmp, out)
    except OSError:
        # only a concurrent writer that already completed the SAME
        # fingerprint may win; anything else must surface
        if not os.path.exists(done):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def ivf_layout_partitions(layout_path: str) -> dict[int, str]:
    """centroid id → partition directory (missing ids = empty lists)."""
    data = os.path.join(layout_path, "data")
    out = {}
    for name in os.listdir(data):
        if name.startswith("ivf_list="):
            out[int(name.split("=", 1)[1])] = os.path.join(data, name)
    return out


def ivf_topk_indexed(layout_path: str, queries: np.ndarray,
                     query_ids: list[int], k: int = 10, nprobe: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     return_stats: bool = False):
    """Serve IVF top-k from a persisted layout: reads ONLY the union of
    the queries' ``nprobe`` probed partitions — scanned bytes scale
    with nprobe/n_centroids, not corpus size.  Each probed partition is
    scored against just the queries probing it (whole-batch matmul,
    per-batch top-k combiner), partitions union into one streamed
    Dataset, and a tiny driver merge ranks the final k."""
    cents = np.load(os.path.join(layout_path, "centroids.npy"))
    qm = _unit(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, len(cents))
    probe_sets = np.argsort(-(qm @ cents.T.astype(np.float64)),
                            axis=1)[:, :nprobe]
    cent_queries: dict[int, list[int]] = {}
    for qi, ps in enumerate(probe_sets):
        for c in ps:
            cent_queries.setdefault(int(c), []).append(qi)

    parts = ivf_layout_partitions(layout_path)
    total_bytes = sum(_dir_bytes(p) for p in parts.values())
    probe_dirs = [parts[c] for c in sorted(cent_queries) if c in parts]
    scanned_bytes = sum(_dir_bytes(p) for p in probe_dirs)

    if probe_dirs:
        # ONE dataset over the probed partition dirs (per-dataset
        # driver overhead × nprobe was the serve wall); each row's
        # list_id column routes it to the queries probing that list
        cq_ref = ray.put({c: (qm[np.asarray(qis)], np.asarray(qis))
                          for c, qis in cent_queries.items()})

        def scorer(batch: pa.Table) -> pa.Table:
            cq = ray.get(cq_ref)
            lists = batch["list_id"].to_numpy(zero_copy_only=False)
            ids = _ids_np(batch, id_col)
            vecs = _unit(_vecs_np(batch, vec_col, np.float64))
            pieces = []
            for c in np.unique(lists):
                sub = cq.get(int(c))
                if sub is None:       # row co-read from an unprobed list
                    continue
                q, qis = sub
                m = lists == c
                pieces.append(_topk_partial(ids[m], vecs[m] @ q.T,
                                            qis, k))
            if not pieces:
                return pa.table({"q_idx": pa.array([], pa.int32()),
                                 "vec_id_": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.concat_tables(pieces)

        # read_parquet expands a single directory but not directories
        # inside a path LIST — enumerate the partition files explicitly
        probe_files = [os.path.join(d, f) for d in probe_dirs
                       for f in sorted(os.listdir(d))
                       if f.endswith(".parquet")]
        partials = ray.data.read_parquet(
            probe_files, columns=[id_col, vec_col, "list_id"]) \
            .map_batches(scorer, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    else:
        partials = pd.DataFrame()
    out = _merge_topk(partials, query_ids, k, id_col)
    if return_stats:
        return out, {"scanned_bytes": scanned_bytes,
                     "total_bytes": total_bytes,
                     "n_parts_scanned": len(probe_dirs),
                     "n_parts_total": len(parts)}
    return out


def ivf_topk(emb: ray.data.Dataset, queries: np.ndarray,
             query_ids: list[int], k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, sample_size: int = 2048, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroid_artifact_dir: str | None = None,
             ) -> pd.DataFrame:
    """Ad-hoc IVF top-k: build-once (fingerprint-cached layout under
    ``centroid_artifact_dir`` or a /tmp default) then serve from the
    partitioned layout.  First call over a corpus pays the one-time
    bucketing write; every later call — any nprobe, any query set —
    reads only the probed partitions."""
    artifact_dir = centroid_artifact_dir or "/tmp/sbb_ned_ray_artifacts/ivf"
    layout = build_ivf_layout(emb, artifact_dir, n_centroids=n_centroids,
                              sample_size=sample_size, seed=seed,
                              id_col=id_col, vec_col=vec_col)
    return ivf_topk_indexed(layout, queries, query_ids, k=k, nprobe=nprobe,
                            id_col=id_col, vec_col=vec_col)


def _column_bytes(files: list[str], columns: list[str]) -> int:
    """Compressed on-disk bytes of specific parquet columns (summed
    column-chunk ``total_compressed_size`` across row groups) — the
    honest measure of what a column-pruned read actually scans."""
    import pyarrow.parquet as pq
    total = 0
    for path in files:
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                root = col.path_in_schema.split(".", 1)[0]
                if root in columns:
                    total += col.total_compressed_size
    return total


def ivf_pq_topk_indexed(layout_path: str, queries: np.ndarray,
                        query_ids: list[int], k: int = 10,
                        nprobe: int = 4, shortlist_mult: int = 32,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        return_stats: bool = False):
    """Full IVFADC serving (Jégou et al. 2011) from a PQ-enabled layout
    (``build_ivf_layout(..., pq_m=m)``), in two column-pruned passes:

    * **Pass A (ADC)** reads ONLY ``(id, list_id, pq_code)`` from the
      ``nprobe`` probed partitions — m code bytes per vector instead of
      4·d float bytes — and scores every row against its probing
      queries via the per-query inner-product lookup table, keeping a
      ``k·shortlist_mult`` shortlist per query.
    * **Pass B (re-rank)** re-reads the probed partitions with a
      pushed-down ``id IN shortlist`` parquet filter, this time
      ``(id, vec)`` only, and scores the shortlist EXACTLY; a tiny
      driver merge ranks the final k.

    The union shortlist is scored against every query in pass B (a row
    outside a query's probe set can only ADD recall).  ``return_stats``
    reports the compressed bytes each pass scanned, so the
    code-vs-vector I/O story is measured, not asserted.

    ``shortlist_mult`` sizes the ADC shortlist (k·mult rows/query) —
    the only recall lever for the exact re-rank.  32 holds recall@10 =
    1.0 at 2 000 corpus vectors where 8 dropped to 0.88 (sf0.1 gate);
    the re-rank reads shortlist rows only, so the cost of headroom is
    a few hundred pushed-down rows per query."""
    cents = np.load(os.path.join(layout_path, "centroids.npy"))
    books = np.load(os.path.join(layout_path, "pq_books.npy"))
    m, ks, dsub = books.shape
    qm = _unit(np.asarray(queries, dtype=np.float64))
    nq = len(qm)
    nprobe = min(nprobe, len(cents))
    probe_sets = np.argsort(-(qm @ cents.T.astype(np.float64)),
                            axis=1)[:, :nprobe]
    cent_queries: dict[int, list[int]] = {}
    for qi, ps in enumerate(probe_sets):
        for c in ps:
            cent_queries.setdefault(int(c), []).append(qi)

    parts = ivf_layout_partitions(layout_path)
    probe_dirs = [parts[c] for c in sorted(cent_queries) if c in parts]
    probe_files = [os.path.join(d, f) for d in probe_dirs
                   for f in sorted(os.listdir(d))
                   if f.endswith(".parquet")]
    empty = _merge_topk(pd.DataFrame(), query_ids, k, id_col)
    if not probe_files:
        return (empty, {}) if return_stats else empty

    lut = np.einsum("qjd,jkd->qjk", qm.reshape(nq, m, dsub), books)
    adc_state = ray.put((lut, {c: np.asarray(qis)
                               for c, qis in cent_queries.items()}))
    n_short = k * shortlist_mult

    def adc_scorer(batch: pa.Table) -> pa.Table:
        tab, cq = ray.get(adc_state)
        lists = batch["list_id"].to_numpy(zero_copy_only=False)
        ids = _ids_np(batch, id_col)
        codes = batch["pq_code"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(batch.num_rows, m)
        out_q, out_id, out_adc = [], [], []
        for c in np.unique(lists):
            qis = cq.get(int(c))
            if qis is None:
                continue
            msk = lists == c
            sub = codes[msk]
            # adc[qi, i] = sum_j tab[qi, j, sub[i, j]]
            adc = tab[qis][:, np.arange(m)[None, :], sub].sum(-1)
            kk = min(n_short, adc.shape[1])
            cand = np.argpartition(-adc, kk - 1, axis=1)[:, :kk] \
                if adc.shape[1] > kk else \
                np.tile(np.arange(adc.shape[1]), (len(qis), 1))
            sub_ids = ids[msk]
            for row, qi in enumerate(qis):
                out_q.append(np.full(cand.shape[1], qi, np.int32))
                out_id.append(sub_ids[cand[row]])
                out_adc.append(adc[row, cand[row]])
        if not out_q:
            return pa.table({"q_idx": pa.array([], pa.int32()),
                             "vec_id_": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        return pa.table({
            "q_idx": pa.array(np.concatenate(out_q), pa.int32()),
            "vec_id_": pa.array(np.concatenate(out_id), pa.int64()),
            "adc": pa.array(np.concatenate(out_adc), pa.float64())})

    shortlist = ray.data.read_parquet(
        probe_files, columns=[id_col, "list_id", "pq_code"]) \
        .map_batches(adc_scorer, batch_format="pyarrow",
                     batch_size=4096).to_pandas()
    if shortlist.empty:
        return (empty, {}) if return_stats else empty
    keep = shortlist.sort_values(["q_idx", "adc", "vec_id_"],
                                 ascending=[True, False, True]) \
        .groupby("q_idx", sort=False).head(n_short)
    short_ids = np.unique(keep["vec_id_"].to_numpy())

    import pyarrow.dataset as pads
    q_ref = ray.put(qm)
    q_indices = np.arange(nq)

    def rerank(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = _ids_np(batch, id_col)
        vecs = _unit(_vecs_np(batch, vec_col, np.float64))
        return _topk_partial(ids, vecs @ q.T, q_indices, k)

    partials = ray.data.read_parquet(
        probe_files, columns=[id_col, vec_col],
        filter=pads.field(id_col).isin(pa.array(short_ids))) \
        .map_batches(rerank, batch_format="pyarrow",
                     batch_size=4096).to_pandas()
    out = _merge_topk(partials, query_ids, k, id_col)
    if return_stats:
        all_files = [os.path.join(d, f) for d in parts.values()
                     for f in sorted(os.listdir(d))
                     if f.endswith(".parquet")]
        stats = {
            "adc_scanned_bytes": _column_bytes(
                probe_files, [id_col, "list_id", "pq_code"]),
            "vec_probe_bytes": _column_bytes(probe_files, [vec_col]),
            "vec_total_bytes": _column_bytes(all_files, [vec_col]),
            "n_shortlist": int(len(short_ids)),
            "n_parts_scanned": len(probe_dirs),
            "n_parts_total": len(parts),
        }
        return out, stats
    return out


def kmeans_distributed(ds, col: str = "embedding", k: int = 8,
                       max_iters: int = 10, tol: float = 1e-6):
    """Full-corpus Lloyd's k-means as an iterative Ray Data pipeline
    (the IVF quantizer above trains on a driver-side SAMPLE; this is
    the whole-dataset variant for when the sample isn't representative).

    Per iteration: centroids broadcast once (``ray.put``); every batch
    assigns vectorized (one matmul) and emits k partial rows
    (sum-vector, count, inertia) — the driver folds k x dim floats per
    block, never the points.  Deterministic: init = the k rows with the
    smallest vec_id (via :func:`min_k_by_id` — a narrow per-batch min-k
    partial, NOT a global sort), float64 accumulation.  Returns
    (centroids, per-cluster counts, inertia trace); inertia is
    non-increasing by construction (asserted by the self-checking
    query/test).
    """
    cents = min_k_by_id(ds, k, id_col="vec_id", vec_col=col)
    trace = []
    counts = None
    for _ in range(max_iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _vecs_np(t, col, np.float64)
            d2 = ((x * x).sum(1)[:, None] - 2 * x @ c.T
                  + (c * c).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            rows = {"cluster": [], "n": [], "inertia": [], "sum_vec": []}
            for ci in range(len(c)):
                m = a == ci
                rows["cluster"].append(ci)
                rows["n"].append(int(m.sum()))
                rows["inertia"].append(float(d2[m, ci].sum()))
                rows["sum_vec"].append(
                    x[m].sum(0).tolist() if m.any()
                    else np.zeros(x.shape[1]).tolist())
            return pa.table({
                "cluster": pa.array(rows["cluster"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "inertia": pa.array(rows["inertia"], pa.float64()),
                "sum_vec": pa.array(rows["sum_vec"],
                                    pa.list_(pa.float64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()
        agg = parts.groupby("cluster", sort=True)
        n = agg["n"].sum()
        inertia = float(agg["inertia"].sum().sum())
        sums = np.stack([
            np.sum(np.stack([np.asarray(v) for v in sub["sum_vec"]]), 0)
            for _, sub in agg])
        new = np.where(n.to_numpy()[:, None] > 0,
                       sums / np.maximum(n.to_numpy()[:, None], 1),
                       cents)
        trace.append(inertia)
        shift = float(np.abs(new - cents).max())
        cents = new
        counts = n.to_numpy(np.int64)
        if shift < tol:
            break
    return cents, counts, trace


def context_matrix(ds, key_col: str = "label", vec_col: str = "embedding",
                   scale: float | None = None):
    """Per-entity context-matrix accumulation — the reference's
    commented-out legacy ``build-context-matrix`` flow
    (``cli.py:226-238``): for every linked entity, accumulate the SUM
    of its context embedding vectors plus a link count
    (``context_emb[idx, 1:] += vec; context_emb[idx, 0] += count``),
    re-expressed as a streaming combiner instead of a driver-side
    mutable matrix.

    Each batch groups its rows by ``key_col`` (argsort + reduceat — one
    partial row per distinct key per batch, never a row per link), then
    ONE narrow ``groupby(key).map_groups`` merges the partials; shuffle
    volume is ``n_keys x dim`` per block, independent of link count.

    ``scale=None`` sums float64 (internal use); a numeric ``scale``
    quantizes each element to ``floor(x*scale + 0.5)`` int64 first so
    the sums are order-independent and FP-exact cross-engine (the
    oracle convention).  Returns a Dataset with columns
    ``(key_col, n_links, sum_vec)``.
    """
    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vtype_ = pa.int64() if scale is not None else pa.float64()
        if len(keys) == 0:
            # reduceat with starts=[0] on a 0-row array raises; Ray
            # can deliver empty blocks (repartition, upstream filter)
            return pa.table({key_col: t[key_col],
                             "n_links": pa.array([], pa.int64()),
                             "sum_vec": pa.array([], pa.list_(vtype_))})
        x = _vecs_np(t, vec_col, np.float64)
        if scale is not None:
            x = np.floor(x * scale + 0.5).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        sums = np.add.reduceat(x[order], starts, axis=0)
        counts = np.diff(np.r_[starts, len(sk)])
        vtype = pa.int64() if scale is not None else pa.float64()
        return pa.table({
            key_col: pa.array(sk[starts]),
            "n_links": pa.array(counts, pa.int64()),
            "sum_vec": pa.array(list(sums), pa.list_(vtype)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v) for v in g["sum_vec"]])
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n_links": [int(g["n_links"].sum())],
            "sum_vec": [mat.sum(0).tolist()],
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011) — the memory-side scale path: m uint8
# codes per vector instead of 4·d float bytes, asymmetric-distance
# (LUT) scoring, exact re-rank on the per-batch shortlist.
# ---------------------------------------------------------------------------

def _lloyd_l2(xs: np.ndarray, ks: int, seed: int, iters: int) -> np.ndarray:
    """Plain L2 Lloyd's on a driver-side subspace sample (PQ codebooks
    quantize raw subvectors, unlike the spherical coarse quantizer)."""
    rng = np.random.default_rng(seed)
    cents = xs[rng.permutation(len(xs))[:ks]].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((xs * xs).sum(1)[:, None] - 2 * xs @ cents.T
              + (cents * cents).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        for c in range(len(cents)):
            mem = xs[a == c]
            if len(mem):
                cents[c] = mem.mean(0)
    return cents


def train_pq_codebooks(sample: np.ndarray, m: int = 8, ks: int = 256,
                       seed: int = 42, iters: int = 12) -> np.ndarray:
    """(m, ks, d/m) codebooks from a seeded sample of unit vectors.
    Deterministic: per-subspace seed offset, fixed iteration count."""
    x = _unit(sample.astype(np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack([
        _lloyd_l2(x[:, j * dsub:(j + 1) * dsub], ks, seed + j, iters)
        for j in range(m)])


def pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) unit vectors → (n, m) uint8 codes (argmin L2 per
    subspace) — the storage format: m bytes/vector."""
    m, ks, dsub = books.shape
    codes = np.empty((len(x), m), np.uint8)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        d2 = ((xs * xs).sum(1)[:, None] - 2 * xs @ c.T
              + (c * c).sum(1)[None, :])
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_topk(emb: ray.data.Dataset, queries: np.ndarray,
            query_ids: list[int], k: int = 10, m: int = 8, ks: int = 256,
            shortlist_mult: int = 32, sample_size: int = 2048,
            seed: int = 42, id_col: str = "vec_id",
            vec_col: str = "embedding") -> pd.DataFrame:
    """PQ-accelerated cosine top-k: codebooks train once on a seeded
    sample and broadcast; each batch encodes to uint8, scores ALL rows
    against every query via a (nq, m, ks) inner-product lookup table
    (one gather-sum per batch — no full-dim matmul), keeps a
    ``k·shortlist_mult`` ADC shortlist per query, and re-ranks ONLY the
    shortlist rows with exact cosine.  The merge reuses the brute-force
    partial shape, so results are directly comparable.  At scale the
    ADC pass reads m bytes/vector instead of 4·d — the standard
    IVF-ADC serving layout's memory story."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    nq, d = qm.shape
    dsub = d // m
    books = train_pq_codebooks(
        seeded_sample(emb, sample_size, id_col, vec_col, seed),
        m=m, ks=ks, seed=seed)
    lut = np.einsum("qjd,jkd->qjk", qm.reshape(nq, m, dsub), books)
    state = ray.put((qm, books, lut))
    q_indices = np.arange(nq)
    n_short = k * shortlist_mult

    def scorer(batch: pa.Table) -> pa.Table:
        q, bks, tab = ray.get(state)
        ids = _ids_np(batch, id_col)
        vecs = _unit(_vecs_np(batch, vec_col, np.float64))
        codes = pq_encode(vecs, bks)
        # adc[qi, i] = sum_j tab[qi, j, codes[i, j]]
        adc = tab[:, np.arange(m)[None, :], codes].sum(-1)
        kk = min(n_short, adc.shape[1])
        cand = np.argpartition(-adc, kk - 1, axis=1)[:, :kk] \
            if adc.shape[1] > kk else \
            np.tile(np.arange(adc.shape[1]), (nq, 1))
        rows = np.unique(cand)
        exact = vecs[rows] @ q.T                    # exact re-rank
        return _topk_partial(ids[rows], exact, q_indices, k)

    partials = emb.map_batches(scorer, batch_format="pyarrow",
                               batch_size=4096).to_pandas()
    return _merge_topk(partials, query_ids, k, id_col)
