"""Distributed prefix scan == numpy cumsum, across blockings."""

import numpy as np
import pyarrow as pa
import pytest

from sbb_ned_ray.stages.scan import prefix_scan


@pytest.mark.parametrize("nblocks", [1, 7])
def test_prefix_scan_matches_cumsum(ray_session, nblocks):
    import ray.data as rd
    rng = np.random.default_rng(13)
    n = 5_000
    keys = rng.permutation(n).astype(np.int64)  # unsorted arrival order
    vals = rng.integers(0, 50, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})) \
        .repartition(nblocks)
    out = prefix_scan(ds, "k", "v", out_col="p").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = np.concatenate([[0], np.cumsum(vals[np.argsort(keys)])[:-1]])
    assert np.array_equal(out["p"].to_numpy(), want)
    assert np.array_equal(out["k"].to_numpy(), np.sort(keys))


def test_prefix_scan_keeps_columns(ray_session):
    import ray.data as rd
    t = pa.table({"k": [3, 1, 2], "v": [10, 20, 30], "extra": list("abc")})
    out = prefix_scan(rd.from_arrow(t), "k", "v").to_pandas() \
        .sort_values("k")
    assert list(out.columns) == ["k", "v", "extra", "excl_prefix"]
    assert out["excl_prefix"].tolist() == [0, 20, 50]


def test_prefix_scan_misalignment_fails_loudly(ray_session):
    """The pass-A/pass-B block-alignment invariant must TRIP, not
    silently produce wrong offsets, when pass B runs over a different
    batching (simulated by repartitioning between the passes)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from sbb_ned_ray.stages.scan import _apply_offsets, _block_offsets

    t = pa.table({"k": pa.array(np.arange(30, dtype=np.int64)),
                  "v": pa.array(np.ones(30, dtype=np.int64))})
    srt = rd.from_arrow(t).repartition(3).sort("k").materialize()
    mk, off = _block_offsets(srt, "k", "v")
    # same blocks → fine
    ok = _apply_offsets(srt, "k", "v", "p", mk, off).to_pandas()
    assert list(ok.sort_values("k")["p"]) == list(range(30))
    # different batching: 7 blocks over 30 rows must split mid-block
    bad = srt.repartition(7).materialize()
    with pytest.raises(Exception, match="pass-A block boundary"):
        _apply_offsets(bad, "k", "v", "p", mk, off).to_pandas()
