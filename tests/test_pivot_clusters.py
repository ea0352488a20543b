"""Distributed pivot correlation clustering vs the exact sequential
reference (same seeded ranks) — the conservative alternative to
transitive closure (SURVEY.md §2.7)."""

import numpy as np
import pandas as pd

import ray.data

from sbb_ned_ray.stages.cluster import (
    driver_pivot_clusters,
    pairs_to_clusters_ds,
    pivot_correlation_clusters,
)


def _run(edges, seed=17, **kw):
    ds = ray.data.from_pandas(pd.DataFrame(edges,
                                           columns=["id_a", "id_b"]))
    out = pivot_correlation_clusters(ds, seed=seed, **kw).to_pandas()
    return dict(zip(out["node"], out["cluster_id"]))


def test_matches_sequential_reference(ray_session):
    rng = np.random.default_rng(5)
    for trial in range(3):
        n = 250
        m = int(n * (0.5 + 0.5 * trial))
        edges = [(int(a), int(b)) for a, b in
                 zip(rng.integers(0, n, m), rng.integers(0, n, m))
                 if a != b]
        got = _run(edges, seed=17 + trial)
        want = driver_pivot_clusters(edges, seed=17 + trial)
        assert got == want, trial


def test_string_ids_match_reference(ray_session):
    edges = [("alpha", "beta"), ("beta", "gamma"), ("gamma", "delta"),
             ("x", "y")]
    got = _run(edges, num_partitions=2)
    assert got == driver_pivot_clusters(edges)


def test_clusters_are_stars(ray_session):
    # every member of a pivot cluster must be directly adjacent to its
    # pivot in the input graph — the property transitive closure loses
    rng = np.random.default_rng(9)
    edges = [(int(a), int(b)) for a, b in
             zip(rng.integers(0, 150, 260), rng.integers(0, 150, 260))
             if a != b]
    got = _run(edges)
    adj = set()
    for a, b in edges:
        adj.add((a, b))
        adj.add((b, a))
    for node, piv in got.items():
        assert node == piv or (node, piv) in adj


def test_bridge_does_not_merge(ray_session):
    # two 5-cliques joined by ONE bridge edge: components would merge
    # them into a single 10-node cluster; pivot clustering cannot —
    # no single pivot is adjacent to both sides
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = c1 + c2 + [(4, 10)]
    got = _run(edges)
    left = {got[i] for i in range(5)}
    right = {got[i] for i in range(10, 15)}
    n_clusters = len(set(got.values()))
    assert n_clusters >= 2
    # parity with the sequential reference on the same graph
    assert got == driver_pivot_clusters(edges)


def test_determinism_across_partitionings(ray_session):
    edges = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
    a = _run(edges, num_partitions=2)
    b = _run(edges, num_partitions=16)
    assert a == b
