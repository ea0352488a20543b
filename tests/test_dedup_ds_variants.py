"""Dataset-returning dedup outputs (the 100-TB output contract): each
``*_ds`` variant must (a) stay a Dataset that can be consumed with
``write_parquet`` — the test drives exactly that, never ``to_pandas``
on the variant under test — and (b) agree with the driver-DataFrame
convenience wrapper on the same input."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(ids_texts):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([i for i, _ in ids_texts], pa.int64()),
        "text": pa.array([x for _, x in ids_texts]),
    })
    return rd.from_arrow(t).repartition(4)


def _group_text(g: int, tail: str = "") -> str:
    words = " ".join(f"tok{g}x{j}" for j in range(20))
    return f"{words} " * 4 + tail


def _dup_corpus():
    # exact duplicate per group (hamming 0 / jaccard 1) plus one unique
    # doc, so minhash AND simhash both find every group
    rows = []
    for g in range(8):
        rows.append((len(rows), _group_text(g)))
        rows.append((len(rows), _group_text(g)))
    rows.append((len(rows), _group_text(99)))
    return _docs(rows)


def _roundtrip(ds, out_dir: str) -> pd.DataFrame:
    ds.write_parquet(out_dir)
    return pq.read_table(out_dir).to_pandas()


def test_minhash_lsh_dedup_ds_matches_wrapper(ray_session, tmp_path):
    from sbb_ned_ray.stages.dedup import minhash_lsh_dedup, \
        minhash_lsh_dedup_ds

    docs = _dup_corpus()
    want = minhash_lsh_dedup(docs, jaccard_threshold=0.7)
    got = _roundtrip(
        minhash_lsh_dedup_ds(docs, jaccard_threshold=0.7),
        str(tmp_path / "mh"))
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_simhash_clusters_ds_matches_wrapper(ray_session, tmp_path):
    from sbb_ned_ray.stages.dedup import simhash_clusters, \
        simhash_clusters_ds

    docs = _dup_corpus()
    want = simhash_clusters(docs, max_hamming=3) \
        .sort_values("doc_id").reset_index(drop=True)
    got = _roundtrip(simhash_clusters_ds(docs, max_hamming=3),
                     str(tmp_path / "sh")) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_semantic_dedup_ds_matches_wrapper(ray_session, tmp_path):
    import ray.data as rd

    from sbb_ned_ray.stages.dedup import semantic_dedup, semantic_dedup_ds

    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 16)).astype(np.float64)
    vecs = []
    for i in range(24):
        v = base[i % 6] + 0.01 * rng.standard_normal(16)
        vecs.append(v / np.linalg.norm(v))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(24), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64()))})).repartition(4)

    want = semantic_dedup(emb, eps=0.9, n_clusters=3)
    got = _roundtrip(semantic_dedup_ds(emb, eps=0.9, n_clusters=3),
                     str(tmp_path / "sem")) \
        .sort_values("vec_id").reset_index(drop=True)
    assert (~want["keep"]).sum() > 0          # the corpus has dups
    pd.testing.assert_frame_equal(
        got[["vec_id", "sem_cluster", "dup_group", "keep"]],
        want[["vec_id", "sem_cluster", "dup_group", "keep"]])


def test_embedding_clusters_ds_matches_wrapper(ray_session, tmp_path):
    import ray.data as rd

    from sbb_ned_ray.stages.dedup import embedding_clusters, \
        embedding_clusters_ds

    rng = np.random.default_rng(11)
    base = rng.standard_normal((5, 12)).astype(np.float64)
    vecs = []
    for i in range(20):
        v = base[i % 5] + 0.005 * rng.standard_normal(12)
        vecs.append(v / np.linalg.norm(v))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64()))})).repartition(4)
    want = embedding_clusters(emb, cos_threshold=0.98) \
        .sort_values("vec_id").reset_index(drop=True)
    got = _roundtrip(embedding_clusters_ds(emb, cos_threshold=0.98),
                     str(tmp_path / "emb")) \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_empty_pairs_to_clusters_ds(ray_session, tmp_path):
    import ray.data as rd

    from sbb_ned_ray.stages.cluster import pairs_to_clusters_ds

    empty = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64())}))
    out = pairs_to_clusters_ds(empty, node_col="doc_id")
    assert out.schema().names == ["doc_id", "cluster_id"]
    assert out.count() == 0
