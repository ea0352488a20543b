"""Self-checking recall gates for the approximate operators (the
asserts live inside the queries; these tests wire them to the small
test tables and pin the strong expectations that hold there)."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"),
    reason="driver testdata not present")


def test_minhash_lsh_recall_is_perfect_on_synthetic_dups(ray_session):
    from sbb_ned_ray.pipelines.queries import minhash_lsh_recall

    out = minhash_lsh_recall(SF)
    assert out["recall"].iloc[0] == 1.0
    assert out["n_gt_pairs"].iloc[0] > 0, \
        "sample must contain ground-truth duplicate pairs"


def test_simhash_pigeonhole_recall_is_exact(ray_session):
    from sbb_ned_ray.pipelines.queries import simhash_recall

    out = simhash_recall(SF)
    assert out["recall"].iloc[0] == 1.0
    assert out["n_gt_pairs"].iloc[0] > 0


def test_embedding_srp_recall_banded(ray_session):
    from sbb_ned_ray.pipelines.queries import embedding_srp_recall

    out = embedding_srp_recall(SF)
    assert out["recall"].iloc[0] == 1.0
    assert out["precision"].iloc[0] == 1.0
    assert out["n_gt_pairs"].iloc[0] > 0


def test_embedding_pairs_handles_empty_and_singleton_buckets(ray_session):
    # regression: the in-bucket verifier crashed (numpy AxisError) on the
    # empty schema-probe frame bucketed_map_groups feeds it
    import ray.data

    import pyarrow as pa

    from sbb_ned_ray.stages.dedup import embedding_dedup

    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]],
                              pa.list_(pa.float64())),
    })).repartition(3)
    out = embedding_dedup(emb, cos_threshold=0.99)
    assert len(out) == 0  # orthogonal vectors → no pairs, no crash


def test_knn_ivf_recall_curve(ray_session):
    from sbb_ned_ray.pipelines.queries import knn_ivf_recall

    out = knn_ivf_recall(SF, nprobes=(2, 8, 16))
    # monotone + exact-at-full-probe asserted inside; pin the shape
    assert list(out["nprobe"]) == [2, 8, 16]
    assert out["mean_recall_at_k"].iloc[-1] == 1.0


def test_blocklist_anti_join_drops_every_copy(ray_session, tmp_path):
    """docs_blocklist_anti must drop ALL copies of a duplicated text
    (vs exact_dedup's keep-first) and keep singletons — exercised with
    synthetic dups because the sf0.01 table has none."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sbb_ned_ray.pipelines.queries import docs_blocklist_anti

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["aaa", "bbb", "aaa", "ccc", "bbb", "ddd"],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = docs_blocklist_anti(str(tmp_path))
    assert out.doc_id.tolist() == [3, 5]
