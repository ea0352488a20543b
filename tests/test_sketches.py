"""Sketch layer: HLL accuracy/merge, Misra-Gries guarantees, Bloom
filter no-false-negatives + FPP, and the Ray-distributed wrappers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sbb_ned_ray.stages.sketches import (
    BloomFilter, exact_count_distinct_per_group, heavy_hitters,
    hll_count_distinct, hll_estimate, hll_merge, hll_partial, mg_merge,
    mg_partial,
)


# ---------------------------------------------------------------- HLL

def test_hll_accuracy_across_cardinalities():
    rng = np.random.default_rng(7)
    p = 12
    for true_n in (50, 500, 5_000, 200_000):
        vals = rng.integers(0, 2**62, size=true_n * 3) % (10**12)
        vals = np.unique(vals)[:true_n]
        assert len(vals) == true_n
        est = hll_estimate(hll_partial(vals, p=p))
        rel = abs(est - true_n) / true_n
        # sigma = 1.04/sqrt(4096) ~= 1.6%; allow 5 sigma (small-range
        # linear counting is far tighter than that)
        assert rel < 0.082, (true_n, est)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10**9, 30_000)
    b = rng.integers(0, 10**9, 30_000)
    merged = hll_merge([hll_partial(a), hll_partial(b)])
    whole = hll_partial(np.concatenate([a, b]))
    assert np.array_equal(merged, whole)


def test_hll_string_values():
    vals = np.array([f"user-{i}" for i in range(20_000)], dtype=object)
    est = hll_estimate(hll_partial(vals))
    assert abs(est - 20_000) / 20_000 < 0.082


# ----------------------------------------------------------- Misra-Gries

def test_mg_guarantees_zipf():
    rng = np.random.default_rng(11)
    vals = rng.zipf(1.3, size=100_000) % 5000
    k = 32
    # split into uneven "batches" and merge, as the distributed path does
    cuts = np.sort(rng.integers(0, len(vals), 6))
    batches = np.split(vals, cuts)
    summaries = [mg_partial(b, k) for b in batches if len(b)]
    top, decr, n = mg_merge(summaries, k)
    assert n == len(vals)
    true = pd.Series(vals).value_counts()
    est = dict(zip(top["item"], top["est"]))
    # 1) every item above the MG threshold is present
    thresh = n / (k + 1)
    for item, cnt in true.items():
        if cnt > thresh:
            assert item in est, (item, cnt, thresh)
    # 2) est <= true <= est + decr for everything returned
    assert decr <= thresh + 1
    for item, e in est.items():
        t = int(true.get(item, 0))
        assert e <= t <= e + decr, (item, e, t, decr)


# ----------------------------------------------------------- Bloom

def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 2**60, 20_000))
    bf = BloomFilter(keys, bits_per_key=10)
    assert bf.contains(keys).all()
    probe = np.unique(rng.integers(2**60, 2**61, 50_000))
    fpp = bf.contains(probe).mean()
    assert fpp < 0.03, fpp  # ~1% nominal at 10 bits/key, 7 hashes


def test_bloom_strings_and_empty():
    keys = np.array(["alpha", "beta", "gamma"], dtype=object)
    bf = BloomFilter(keys)
    assert bf.contains(keys).all()
    assert bf.contains(np.zeros(0, dtype=object)).shape == (0,)
    assert BloomFilter(np.zeros(0, np.int64)).contains(keys).sum() == 0


# ----------------------------------------------------------- Ray wrappers

@pytest.fixture(scope="module")
def user_ds(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(42)
    n = 40_000
    users = rng.integers(0, 3_000, n)
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(types, pa.string())})
    return rd.from_arrow(t).repartition(8), users, types


def test_hll_count_distinct_ray(user_ds):
    ds, users, _ = user_ds
    true_n = len(np.unique(users))
    out = hll_count_distinct(ds, "user_id", p=12)
    assert abs(out["estimate"] - true_n) / true_n < 0.082


def test_exact_count_distinct_per_group_ray(user_ds):
    ds, users, types = user_ds
    out = exact_count_distinct_per_group(ds, "event_type", "user_id") \
        .to_pandas().set_index("event_type")["n_distinct"]
    truth = pd.DataFrame({"t": types, "u": users}) \
        .groupby("t")["u"].nunique()
    for t in truth.index:
        assert int(out[t]) == int(truth[t])


def test_heavy_hitters_ray(user_ds):
    ds, users, _ = user_ds
    k = 48
    out = heavy_hitters(ds, "user_id", k=k)
    assert out["n"] == len(users)
    true = pd.Series(users).value_counts()
    est = {int(i): e for i, e in zip(out["top"]["item"], out["top"]["est"])}
    thresh = out["n"] / (k + 1)
    for item, cnt in true.items():
        if cnt > thresh:
            assert int(item) in est
    for item, e in est.items():
        t = int(true.get(item, 0))
        assert e <= t <= e + out["max_undercount"]


def test_bloom_semijoin_exact_ray(user_ds):
    import ray.data as rd
    from sbb_ned_ray.stages.sketches import bloom_semijoin
    ds, users, _ = user_ds
    build = np.unique(users)[:200]  # selective build side
    got = bloom_semijoin(ds, "user_id", build).to_pandas()
    want = int(np.isin(users, build).sum())
    assert len(got) == want
    assert np.isin(got["user_id"].to_numpy(), build).all()


# ----------------------------------------------------------- DDSketch

def test_dd_quantiles_relative_error(ray_session):
    import ray.data as rd
    from sbb_ned_ray.stages.sketches import dd_quantiles
    rng = np.random.default_rng(9)
    x = np.concatenate([rng.lognormal(3, 2, 50_000), np.zeros(100)])
    ds = rd.from_arrow(pa.table({"v": x})).repartition(8)
    alpha = 0.01
    out = dd_quantiles(ds, "v", qs=(0.01, 0.5, 0.9, 0.99), alpha=alpha)
    for _, row in out.iterrows():
        true = np.quantile(x, row["q"], method="inverted_cdf")
        if true == 0:
            assert row["estimate"] == 0
        else:
            assert abs(row["estimate"] - true) / true <= alpha + 1e-9, \
                (row["q"], row["estimate"], true)


def test_dd_quantiles_all_zero(ray_session):
    import ray.data as rd
    from sbb_ned_ray.stages.sketches import dd_quantiles
    ds = rd.from_arrow(pa.table({"v": np.zeros(100)}))
    out = dd_quantiles(ds, "v", qs=(0.5,))
    assert out["estimate"].iloc[0] == 0.0


def test_hll_distinct_per_group_ray(user_ds):
    from sbb_ned_ray.stages.sketches import hll_distinct_per_group
    ds, users, types = user_ds
    out = hll_distinct_per_group(ds, "event_type", "user_id") \
        .set_index("event_type")["n_distinct_est"]
    truth = pd.DataFrame({"t": types, "u": users}) \
        .groupby("t")["u"].nunique()
    for t in truth.index:
        rel = abs(int(out[t]) - int(truth[t])) / int(truth[t])
        assert rel < 0.082, (t, int(out[t]), int(truth[t]))


def test_hll_partial_msb_exact_near_binade_top(monkeypatch):
    """w just under a power of two must not round its MSB up.  With
    p=0, w = h = 2**60 - 1 (>= 2**53, where float64 rounds to 2**60):
    true msb = 59 -> rho = 64 - 59 = 5; a naive full-width frexp gives
    msb 60 -> rho 4."""
    import sbb_ned_ray.stages.sketches as sk
    monkeypatch.setattr(
        sk, "hash64",
        lambda v: np.array([(1 << 60) - 1], dtype=np.uint64))
    regs = sk.hll_partial(np.array([1]), p=0)
    assert regs[0] == 5


# ------------------------------------------------- hypothesis properties

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 10**6), max_size=400),
       st.lists(st.integers(0, 10**6), max_size=400))
def test_hll_merge_union_property(a, b):
    from sbb_ned_ray.stages.sketches import hll_merge, hll_partial
    aa, bb = np.array(a, np.int64), np.array(b, np.int64)
    merged = hll_merge([hll_partial(aa, p=8), hll_partial(bb, p=8)])
    whole = hll_partial(np.concatenate([aa, bb]), p=8)
    assert np.array_equal(merged, whole)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 60), min_size=1, max_size=600),
       st.integers(2, 12), st.integers(1, 5))
def test_mg_bounds_property(vals, k, nsplits):
    from sbb_ned_ray.stages.sketches import mg_merge, mg_partial
    v = np.array(vals, np.int64)
    parts = np.array_split(v, nsplits)
    top, decr, n = mg_merge([mg_partial(p, k) for p in parts if len(p)], k)
    assert n == len(v)
    true = pd.Series(v).value_counts()
    est = dict(zip(top["item"], top["est"]))
    for item, cnt in true.items():
        if cnt > n / (k + 1):
            assert item in est
    for item, e in est.items():
        t = int(true.get(item, 0))
        assert e <= t <= e + decr


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=300,
                unique=True))
def test_bloom_never_false_negative_property(keys):
    from sbb_ned_ray.stages.sketches import BloomFilter
    arr = np.array(keys, np.uint64).astype(np.int64)
    assert BloomFilter(arr).contains(arr).all()


def test_heavy_hitters_empty_string_item(ray_session):
    """An empty-string token (e.g. from double spaces) must be counted
    as a real item, never confused with the metadata sentinel."""
    import ray.data as rd
    from sbb_ned_ray.stages.sketches import heavy_hitters
    t = pa.table({"text": ["a  a  b", "a  b"]})  # '' appears 3x via split
    out = heavy_hitters(rd.from_arrow(t), "text", k=8,
                        explode_tokens=True)
    est = dict(zip(out["top"]["item"], out["top"]["est"]))
    assert est.get("") == 3 and est.get("a") == 3 and est.get("b") == 2
    assert out["n"] == 8  # 3 a + 2 b + 3 empty


def test_dd_quantiles_per_group(ray_session):
    import ray.data as rd
    from sbb_ned_ray.stages.sketches import dd_quantiles_per_group
    rng = np.random.default_rng(17)
    n = 30_000
    g = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    v = np.where(g == "x", rng.lognormal(2, 1, n),
                 np.where(g == "y", rng.lognormal(5, 0.5, n),
                          rng.uniform(0, 10, n)))
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(6)
    out = dd_quantiles_per_group(ds, "g", "v", qs=(0.5, 0.95),
                                 alpha=0.01)
    for _, row in out.iterrows():
        vals = v[g == row["g"]]
        true = np.quantile(vals, row["q"], method="inverted_cdf")
        assert abs(row["estimate"] - true) / true <= 0.01 + 1e-9, \
            (row["g"], row["q"], row["estimate"], true)


def test_kmeans_distributed_matches_reference(ray_session):
    import ray.data as rd
    from sbb_ned_ray.stages.similarity import kmeans_distributed
    rng = np.random.default_rng(23)
    n, d, k = 600, 8, 4
    x = np.concatenate([rng.normal(c * 5, 1, (n // k, d))
                        for c in range(k)])
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": ids,
                  "embedding": pa.array(x.tolist(),
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(5).materialize()
    cents, counts, trace = kmeans_distributed(ds, k=k, max_iters=12)
    # Lloyd invariants
    assert all(b <= a + 1e-6 for a, b in zip(trace, trace[1:]))
    assert counts.sum() == n
    # reference Lloyd's with the same init (first k by vec_id), float32
    # input like the column, float64 accumulation like the stage
    xx = x.astype(np.float32).astype(np.float64)
    c = xx[:k].copy()
    for _ in range(12):
        d2 = ((xx * xx).sum(1)[:, None] - 2 * xx @ c.T
              + (c * c).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        inertia = float(d2[np.arange(n), a].sum())
        new = np.stack([xx[a == ci].mean(0) if (a == ci).any() else c[ci]
                        for ci in range(k)])
        if np.abs(new - c).max() < 1e-6:
            c = new
            break
        c = new
    assert np.allclose(np.sort(counts),
                       np.sort(np.bincount(a, minlength=k)))
    assert abs(trace[-1] - inertia) / inertia < 1e-6


def test_heavy_hitters_per_group_ray(user_ds):
    from sbb_ned_ray.stages.sketches import heavy_hitters_per_group
    ds, users, types = user_ds
    k = 24
    out = heavy_hitters_per_group(ds, "event_type", "user_id", k=k)
    df = pd.DataFrame({"t": types, "u": users.astype(str)})
    for g, sub in out.groupby("event_type"):
        true = df[df["t"] == g]["u"].value_counts()
        n_g = int(sub["n_group"].iloc[0])
        assert n_g == int((df["t"] == g).sum())
        est = dict(zip(sub["item"], sub["est"]))
        bound = int(sub["max_undercount"].iloc[0])
        for item, cnt in true.items():
            if cnt > n_g / (k + 1):
                assert item in est, (g, item, cnt)
        for item, e in est.items():
            t = int(true.get(item, 0))
            assert e <= t <= e + bound, (g, item, e, t, bound)
