"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul
  against it, keeps per-batch top-k (the combiner), and a final tiny
  reduce merges per-batch candidates.  No shuffle of the corpus.
* :func:`ivf_topk` — the scale path: k-means-lite coarse quantizer
  (deterministic seeded init, few iterations, trained on a sample),
  corpus bucketed by nearest centroid; queries probe ``nprobe``
  buckets only.  Same result contract as brute force on well-separated
  data; documented approximation otherwise.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(emb: ray.data.Dataset, queries: np.ndarray,
                     query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns
    (query_id, vec_id, cosine, knn_rank) sorted."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)

    class Scorer:
        def __init__(self, ref):
            self.q = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = _unit(np.array(batch[vec_col].to_pylist(),
                                  dtype=np.float64))
            cos = vecs @ self.q.T          # (n_batch, n_query)
            kk = min(k, len(ids))
            # per-batch top-k per query (partial combine); cosine kept at
            # full float64 precision — ranking ties are broken by vec_id,
            # and rounding here would CREATE ties the oracle doesn't have
            out_q, out_id, out_cos = [], [], []
            for qi in range(cos.shape[1]):
                col = cos[:, qi]
                top = np.argpartition(-col, kk - 1)[:kk]
                for t in top:
                    out_q.append(qi)
                    out_id.append(int(ids[t]))
                    out_cos.append(float(col[t]))
            return pa.table({"q_idx": pa.array(out_q, pa.int32()),
                             id_col: pa.array(out_id, pa.int64()),
                             "cosine": pa.array(out_cos, pa.float64())})

    partials = emb.map_batches(Scorer, fn_constructor_args=(q_ref,),
                               batch_format="pyarrow", batch_size=4096,
                               concurrency=(1, 8)).to_pandas()
    rows = []
    for qi, g in partials.groupby("q_idx"):
        top = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        for rank, r in enumerate(top):
            rows.append((query_ids[qi], getattr(r, id_col), r.cosine,
                         rank + 1))
    return pd.DataFrame(rows, columns=["query_id", id_col, "cosine",
                                       "knn_rank"]) \
        .sort_values(["query_id", "knn_rank"]).reset_index(drop=True)


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


CENTROIDS_FORMAT_VERSION = 1


def load_or_train_centroids(sample: np.ndarray, n_centroids: int,
                            artifact_dir: str | None = None,
                            seed: int = 42, iters: int = 8) -> np.ndarray:
    """Coarse-quantizer artifact: the trained centroid matrix is
    persisted (``.npy`` + fingerprint manifest keyed by sample content,
    k-means knobs and format version) so repeated IVF jobs over the
    same corpus skip retraining — the index-build/serve split of a real
    ANN deployment (reference Annoy ``build-index``, Makefile:7-8)."""
    import hashlib
    import json
    import os

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


def ivf_topk(emb: ray.data.Dataset, queries: np.ndarray,
             query_ids: list[int], k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, sample_size: int = 2048, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroid_artifact_dir: str | None = None,
             ) -> pd.DataFrame:
    """IVF-style approximate top-k: corpus rows scored only when their
    nearest centroid is among the query's ``nprobe`` closest.
    ``centroid_artifact_dir`` persists/reuses the trained quantizer."""
    sample_rows = emb.limit(sample_size).to_pandas()
    sample = np.array([np.asarray(v, dtype=np.float32)
                       for v in sample_rows[vec_col]])
    cents = load_or_train_centroids(sample, n_centroids,
                                    centroid_artifact_dir, seed)
    qm = _unit(np.asarray(queries, dtype=np.float32))
    probe_sets = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]
    state = ray.put((qm, cents, probe_sets))

    class Scorer:
        def __init__(self, ref):
            self.q, self.cents, self.probes = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref)
            # invert: centroid -> queries probing it
            self.cent_queries: dict[int, list[int]] = {}
            for qi, ps in enumerate(self.probes):
                for c in ps:
                    self.cent_queries.setdefault(int(c), []).append(qi)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            vecs = _unit(np.array(batch[vec_col].to_pylist(),
                                  dtype=np.float32))
            assign = np.argmax(vecs @ self.cents.T, axis=1)
            out_q, out_id, out_cos = [], [], []
            for c, qis in self.cent_queries.items():
                mask = assign == c
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                sub = vecs[mask]
                cos = sub @ self.q[qis].T
                kk = min(k, len(sub_ids))
                for col_i, qi in enumerate(qis):
                    col = cos[:, col_i]
                    top = np.argpartition(-col, kk - 1)[:kk]
                    for t in top:
                        out_q.append(qi)
                        out_id.append(int(sub_ids[t]))
                        out_cos.append(round(float(col[t]), 6))
            return pa.table({"q_idx": pa.array(out_q, pa.int32()),
                             id_col: pa.array(out_id, pa.int64()),
                             "cosine": pa.array(out_cos, pa.float64())})

    partials = emb.map_batches(Scorer, fn_constructor_args=(state,),
                               batch_format="pyarrow", batch_size=4096,
                               concurrency=(1, 8)).to_pandas()
    rows = []
    for qi, g in partials.groupby("q_idx"):
        top = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        for rank, r in enumerate(top):
            rows.append((query_ids[qi], getattr(r, id_col), r.cosine,
                         rank + 1))
    return pd.DataFrame(rows, columns=["query_id", id_col, "cosine",
                                       "knn_rank"]) \
        .sort_values(["query_id", "knn_rank"]).reset_index(drop=True)


def kmeans_distributed(ds, col: str = "embedding", k: int = 8,
                       max_iters: int = 10, tol: float = 1e-6):
    """Full-corpus Lloyd's k-means as an iterative Ray Data pipeline
    (the IVF quantizer above trains on a driver-side SAMPLE; this is
    the whole-dataset variant for when the sample isn't representative).

    Per iteration: centroids broadcast once (``ray.put``); every batch
    assigns vectorized (one matmul) and emits k partial rows
    (sum-vector, count, inertia) — the driver folds k x dim floats per
    block, never the points.  Deterministic: init = the k rows with the
    smallest vec_id-order hash-free key (first k by id), float64
    accumulation.  Returns (centroids, per-cluster counts, inertia
    trace); inertia is non-increasing by construction (asserted by the
    self-checking query/test).
    """
    import numpy as np
    import pyarrow as pa

    import ray

    first = ds.sort("vec_id").limit(k).to_pandas()
    cents = np.stack([np.asarray(v, np.float64)
                      for v in first[col]])
    trace = []
    counts = None
    for _ in range(max_iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            flat = t[col].combine_chunks().flatten() \
                .to_numpy(zero_copy_only=False)
            x = flat.reshape(t.num_rows, -1).astype(np.float64)
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
