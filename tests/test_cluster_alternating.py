"""Alternating large-star/small-star connected components
(Kiveris et al., SoCC'14) vs exact driver union-find — incl. the
high-diameter chain case min-label propagation cannot converge on in
O(1) iterations (SURVEY.md §2.7: transitive entity clustering)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from sbb_ned_ray.stages.cluster import (
    alternating_components,
    driver_union_find,
    label_propagation_components,
)


def _exact(edges):
    comp = driver_union_find([(a, b) for a, b in edges])
    return {n: c for n, c in comp.items()}


def _run(edges, **kw):
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    out = alternating_components(ds, **kw).to_pandas()
    return dict(zip(out["node"], out["component"]))


def test_path_graph_high_diameter(ray_session):
    # a 401-node path: diameter 400 — label propagation would need ~400
    # iterations; the alternating algorithm converges in O(log^2 n)
    edges = [(i, i + 1) for i in range(400)]
    got = _run(edges, num_partitions=4)
    assert got == {i: 0 for i in range(401)}


def test_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 300
        m = int(n * (0.6 + 0.4 * trial))
        edges = list(zip(rng.integers(0, n, m).tolist(),
                         rng.integers(0, n, m).tolist()))
        edges = [(a, b) for a, b in edges if a != b]
        got = _run(edges, num_partitions=4)
        assert got == _exact(edges)


def test_string_node_ids(ray_session):
    edges = [("q7", "q3"), ("q3", "q9"), ("zz", "aa"), ("mm", "mm")]
    got = _run(edges, num_partitions=2)
    assert got == {"q3": "q3", "q7": "q3", "q9": "q3",
                   "aa": "aa", "zz": "aa", "mm": "mm"}


def test_self_loops_and_isolated(ray_session):
    # self-loop-only nodes appear in the output labeled by themselves,
    # matching label_propagation_components' contract
    edges = [(5, 5), (1, 2)]
    got = _run(edges, num_partitions=2)
    assert got == {1: 1, 2: 1, 5: 5}


def test_matches_label_propagation_on_shallow_graph(ray_session):
    rng = np.random.default_rng(11)
    hubs = rng.integers(0, 10, 200)
    edges = [(int(h), 10 + i) for i, h in enumerate(hubs)]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    alt = alternating_components(ds, num_partitions=4).to_pandas()
    lp = label_propagation_components(ds, num_partitions=4).to_pandas()
    a = dict(zip(alt["node"], alt["component"]))
    b = dict(zip(lp["node"], lp["component"]))
    assert a == b


def test_pairs_to_clusters_ds_altstar(ray_session):
    from sbb_ned_ray.stages.cluster import pairs_to_clusters_ds
    pairs = pd.DataFrame({"id_a": [1, 2, 10, 11],
                          "id_b": [2, 3, 11, 12]})
    ds = ray.data.from_pandas(pairs)
    for algo in ("labelprop", "altstar"):
        out = pairs_to_clusters_ds(ds, algorithm=algo).to_pandas()
        got = dict(zip(out["node"], out["cluster_id"]))
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}, algo
    with pytest.raises(ValueError):
        pairs_to_clusters_ds(ds, algorithm="bogus")


def test_empty_edges(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": pd.Series(dtype="int64"),
                      "dst": pd.Series(dtype="int64")}))
    out = alternating_components(ds, num_partitions=2).to_pandas()
    assert len(out) == 0
