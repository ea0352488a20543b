"""PageRank link-graph centrality: both distributed paths (broadcast
dense-partials, co-shuffle join+groupby) pinned to the dense numpy
reference, on a handcrafted graph with weights and a dangling node,
plus the bipartite edge builder's coding contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from sbb_ned_ray.stages.graph import (bipartite_link_edges, pagerank,
                                      pagerank_np)

# weighted digraph on 5 nodes; node 4 is dangling (no out-edges),
# node 3 has no in-edges
SRC = np.array([0, 0, 1, 2, 2, 3], dtype=np.int64)
DST = np.array([1, 2, 2, 0, 4, 4], dtype=np.int64)
W = np.array([1.0, 2.0, 1.0, 3.0, 1.0, 2.0])
N = 5


def _edges_ds():
    return ray.data.from_arrow(pa.table({
        "src": pa.array(SRC, pa.int64()),
        "dst": pa.array(DST, pa.int64()),
        "w": pa.array(W, pa.float64())}))


def test_pagerank_np_mass_conserved():
    r = pagerank_np(SRC, DST, W, N, iters=30)
    assert abs(r.sum() - 1.0) < 1e-12
    assert (r > 0).all()


def test_broadcast_matches_dense():
    got = pagerank(_edges_ds(), N, iters=12, method="broadcast") \
        .to_pandas().sort_values("node_id")
    want = pagerank_np(SRC, DST, W, N, iters=12)
    assert np.allclose(got["rank"].to_numpy(), want, rtol=0, atol=1e-14)


def test_shuffle_matches_dense():
    got = pagerank(_edges_ds(), N, iters=12, method="shuffle",
                   num_partitions=2).to_pandas().sort_values("node_id")
    want = pagerank_np(SRC, DST, W, N, iters=12)
    assert np.allclose(got["rank"].to_numpy(), want, rtol=0, atol=1e-10)


def test_auto_dispatches_by_node_count():
    lo = pagerank(_edges_ds(), N, iters=3, method="auto",
                  node_broadcast_limit=1, num_partitions=2)
    hi = pagerank(_edges_ds(), N, iters=3, method="auto",
                  node_broadcast_limit=10**9)
    a = lo.to_pandas().sort_values("node_id")["rank"].to_numpy()
    b = hi.to_pandas().sort_values("node_id")["rank"].to_numpy()
    assert np.allclose(a, b, rtol=0, atol=1e-10)


def test_bipartite_edge_builder():
    links = ray.data.from_pandas(pd.DataFrame({
        "host": ["a.example", "a.example", "b.example", "a.example"],
        "qid": ["Q1", "Q2", "Q1", "Q1"]}))
    g = bipartite_link_edges(links, "host", "qid")
    assert g["n_left"] == 2 and g["n_nodes"] == 4
    assert g["left_values"] == ["a.example", "b.example"]
    assert g["right_values"] == ["Q1", "Q2"]
    df = g["edges"].to_pandas()
    # symmetric: every (src,dst,w) has its (dst,src,w) mirror
    fwd = set(map(tuple, df[["src", "dst", "w"]].to_numpy().tolist()))
    assert (2, 0, 2.0) in fwd and (0, 2, 2.0) in fwd  # a.example↔Q1 ×2
    assert (3, 0, 1.0) in fwd and (0, 3, 1.0) in fwd  # a.example↔Q2
    assert (2, 1, 1.0) in fwd and (1, 2, 1.0) in fwd  # b.example↔Q1
    assert len(df) == 6
