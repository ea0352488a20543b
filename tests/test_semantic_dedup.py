"""SemDeDup (Abbas et al. 2023) semantic-dedup operator: within-cluster
exact pruning, keep-the-centroid-outlier rule, skew cap semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds_from(x: np.ndarray, nparts: int = 3):
    import ray.data as rd
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.array(x.astype(np.float32).tolist(),
                              pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(nparts)


def test_semantic_dedup_k1_equals_exact_components(ray_session):
    from sbb_ned_ray.stages.dedup import semantic_dedup
    rng = np.random.default_rng(9)
    x = rng.normal(size=(120, 16))
    # plant a near-dup triple (8, 9, 10) and a pair (40, 41)
    x[9] = x[8] + 0.01 * rng.normal(size=16)
    x[10] = x[8] + 0.01 * rng.normal(size=16)
    x[41] = x[40] + 0.01 * rng.normal(size=16)
    out = semantic_dedup(_ds_from(x), eps=0.95, n_clusters=1)
    assert len(out) == 120 and out["vec_id"].is_unique
    groups = {g: sorted(s["vec_id"]) for g, s in out.groupby("dup_group")
              if len(s) > 1}
    assert sorted(map(tuple, groups.values())) == [(8, 9, 10), (40, 41)]
    # dup_group is the min member id
    assert set(groups) == {8, 40}
    # exactly one keeper per group; everything else kept
    assert int((~out["keep"]).sum()) == 3
    for _, s in out.groupby("dup_group"):
        assert int(s["keep"].sum()) == 1


def test_semantic_dedup_keeps_centroid_outlier(ray_session):
    from sbb_ned_ray.stages.dedup import semantic_dedup
    rng = np.random.default_rng(17)
    x = rng.normal(size=(40, 8))
    x[1] = x[0] + 0.02 * rng.normal(size=8)  # the only dup pair
    out = semantic_dedup(_ds_from(x), eps=0.95, n_clusters=1)
    dup = out[out["dup_group"] == 0]
    assert sorted(dup["vec_id"]) == [0, 1]
    # expected keeper: the member LEAST similar to the k=1 centroid
    # (with one cluster, Lloyd's fixed point is the normalized mean of
    # the unit-normalized corpus)
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    cent = u.mean(0)
    cent /= np.linalg.norm(cent)
    expected = int(np.argmin(u[:2] @ cent))
    kept = dup[dup["keep"]]["vec_id"].tolist()
    assert kept == [expected], (kept, expected)


def test_semantic_dedup_is_partition_invariant(ray_session):
    from sbb_ned_ray.stages.dedup import semantic_dedup
    rng = np.random.default_rng(5)
    x = rng.normal(size=(200, 12))
    x[50] = x[49] + 0.01
    a = semantic_dedup(_ds_from(x, nparts=2), eps=0.8, n_clusters=4)
    b = semantic_dedup(_ds_from(x, nparts=11), eps=0.8, n_clusters=4)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_semantic_dedup_cluster_cap_keeps_overflow(ray_session):
    from sbb_ned_ray.stages.dedup import semantic_dedup
    rng = np.random.default_rng(2)
    x = rng.normal(size=(60, 10))
    x[10] = x[5] + 0.001   # in-cap dup pair
    x[55] = x[54] + 0.001  # beyond-cap rows: compared only if in cap
    out = semantic_dedup(_ds_from(x), eps=0.95, n_clusters=1,
                         max_cluster_rows=30)
    # capped: rows >= 30 are kept unconditionally (recall, not
    # correctness, degrades)
    tail = out[out["vec_id"] >= 30]
    assert tail["keep"].all()
    # the in-cap pair is still found
    g = out[out["dup_group"] == 5]
    assert sorted(g["vec_id"]) == [5, 10] and int(g["keep"].sum()) == 1
