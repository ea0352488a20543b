"""Context-matrix accumulation (reference cli.py:226-238): per-key
sum of embedding vectors + link count, as combiner partials + one
narrow groupby — checked against a driver-side pandas reduction and
for invariance under repartitioning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(n=300, d=9, n_keys=7, seed=3, nparts=6):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    keys = rng.integers(0, n_keys, size=n).astype(np.int64)
    t = pa.table({"label": pa.array(keys),
                  "embedding": pa.array(x.tolist(),
                                        pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(nparts), keys, x


def _expected(keys, x, scale):
    q = np.floor(x.astype(np.float64) * scale + 0.5).astype(np.int64)
    out = {}
    for k in np.unique(keys):
        m = keys == k
        out[int(k)] = (int(m.sum()), q[m].sum(0))
    return out


def test_context_matrix_matches_pandas(ray_session):
    from sbb_ned_ray.stages.similarity import context_matrix
    ds, keys, x = _ds()
    got = context_matrix(ds, "label", "embedding", scale=1e6).to_pandas()
    exp = _expected(keys, x, 1e6)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n, s = exp[int(r["label"])]
        assert int(r["n_links"]) == n
        assert np.array_equal(np.asarray(r["sum_vec"], np.int64), s)


def test_context_matrix_partition_invariant(ray_session):
    from sbb_ned_ray.stages.similarity import context_matrix

    def run(nparts):
        ds, _, _ = _ds(nparts=nparts)
        df = context_matrix(ds, "label", "embedding",
                            scale=1e6).to_pandas()
        df["sum_vec"] = df["sum_vec"].apply(tuple)
        return df.sort_values("label").reset_index(drop=True)

    pd.testing.assert_frame_equal(run(1), run(11))


def test_context_matrix_float_mode(ray_session):
    from sbb_ned_ray.stages.similarity import context_matrix
    ds, keys, x = _ds(n=50, d=4, n_keys=2)
    got = context_matrix(ds, "label", "embedding").to_pandas()
    for _, r in got.iterrows():
        m = keys == int(r["label"])
        np.testing.assert_allclose(
            np.asarray(r["sum_vec"]), x[m].astype(np.float64).sum(0),
            rtol=1e-9, atol=1e-9)


def test_context_matrix_survives_empty_blocks(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sbb_ned_ray.stages.similarity import context_matrix
    t = pa.table({
        "label": pa.array(["a", "a", "b"]),
        "embedding": pa.array(np.eye(3).tolist(),
                              pa.list_(pa.float64()))})
    # more blocks than rows → at least one empty block reaches partial
    ds = rd.from_arrow(t).repartition(8)
    out = context_matrix(ds, scale=100.0).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    assert list(out["label"]) == ["a", "b"]
    assert list(out["n_links"]) == [2, 1]
