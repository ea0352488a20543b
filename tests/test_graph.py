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


# ---------------------------------------------------------------------------
# HyperBall / harmonic centrality
# ---------------------------------------------------------------------------

from sbb_ned_ray.stages.graph import (harmonic_centrality,
                                      harmonic_centrality_exact, hyperball)


def _path_edges():
    # directed path 0 -> 1 -> 2 -> 3
    return ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
        "w": pa.array([1.0, 1.0, 1.0])}))


def test_hyperball_path_graph_ball_sizes_and_diameter():
    res = hyperball(_path_edges(), 4, p=10, max_iters=16)
    # forward balls: node 0 reaches all 4, node 3 only itself
    sizes = np.round(res["ball_sizes"]).astype(int)
    assert sizes.tolist() == [4, 3, 2, 1]
    assert res["iters"] == 3  # diameter sweeps, then converged


def test_harmonic_exact_path_graph():
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 2, 3], np.int64)
    # H(v) = sum over u reaching v of 1/d(u,v)
    want = [0.0, 1.0, 1.5, 1.0 + 0.5 + 1 / 3]
    got = harmonic_centrality_exact(src, dst, 4)
    assert np.allclose(got, want)


def test_hyperball_harmonic_tracks_exact():
    # deterministic pseudo-random digraph, 60 nodes / 240 edges
    rng = np.random.RandomState(7)
    src = rng.randint(0, 60, 240).astype(np.int64)
    dst = rng.randint(0, 60, 240).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "w": pa.array(np.ones(len(src)))}))
    est = harmonic_centrality(edges, 60, p=10, max_iters=32)
    want = harmonic_centrality_exact(src, dst, 60)
    pos = want > 0
    rel = np.abs(est[pos] - want[pos]) / want[pos]
    # deterministic hash -> deterministic estimate; p=10 keeps the
    # HLL error well inside 10% on this graph
    assert np.median(rel) < 0.05, float(np.median(rel))
    assert rel.max() < 0.25, float(rel.max())
    # the estimate must rank the true top-5 hubs inside its top-10
    top_want = set(np.argsort(-want)[:5].tolist())
    top_est = set(np.argsort(-est)[:10].tolist())
    assert top_want <= top_est


# ---------------------------------------------------------------------------
# Personalized PageRank / TrustRank (seeded teleport)
# ---------------------------------------------------------------------------


def test_trustrank_paths_match_dense():
    seeds = (np.array([0, 2], np.int64), np.array([3.0, 1.0]))
    want = pagerank_np(SRC, DST, W, N, iters=12, seeds=seeds)
    got_b = pagerank(_edges_ds(), N, iters=12, method="broadcast",
                     seeds=seeds).to_pandas().sort_values("node_id")
    got_s = pagerank(_edges_ds(), N, iters=12, method="shuffle",
                     num_partitions=2, seeds=seeds) \
        .to_pandas().sort_values("node_id")
    assert np.allclose(got_b["rank"].to_numpy(), want, rtol=0, atol=1e-14)
    assert np.allclose(got_s["rank"].to_numpy(), want, rtol=0, atol=1e-10)
    assert abs(want.sum() - 1.0) < 1e-12  # mass conserved


def test_trustrank_concentrates_on_seed_side():
    # two disconnected 2-cycles; teleport only into the first —
    # nodes 2/3 must end with zero rank (nothing reaches them)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 0, 3, 2], pa.int64()),
        "w": pa.array([1.0, 1.0, 1.0, 1.0])}))
    seeds = (np.array([0], np.int64), np.array([1.0]))
    got = pagerank(edges, 4, iters=25, method="broadcast",
                   seeds=seeds).to_pandas().sort_values("node_id")
    r = got["rank"].to_numpy()
    assert r[0] > 0.4 and r[1] > 0.3
    assert r[2] == 0.0 and r[3] == 0.0


def test_trustrank_duplicate_seed_ids_accumulate():
    seeds_dup = (np.array([1, 1, 4], np.int64), np.array([1.0, 1.0, 2.0]))
    seeds_acc = (np.array([1, 4], np.int64), np.array([2.0, 2.0]))
    a = pagerank_np(SRC, DST, W, N, iters=8, seeds=seeds_dup)
    b = pagerank_np(SRC, DST, W, N, iters=8, seeds=seeds_acc)
    assert np.allclose(a, b, rtol=0, atol=0)
    got_s = pagerank(_edges_ds(), N, iters=8, method="shuffle",
                     num_partitions=2, seeds=seeds_dup) \
        .to_pandas().sort_values("node_id")
    assert np.allclose(got_s["rank"].to_numpy(), a, rtol=0, atol=1e-10)


# ---------------------------------------------------------------------------
# co-occurrence projection / Jaccard relatedness / triangle counting
# ---------------------------------------------------------------------------

def _membership_ds(rows):
    g, n = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "g": pa.array(list(g), pa.string()),
        "n": pa.array(list(n), pa.string())}))


def _brute_cooc(rows, max_deg=64):
    from collections import defaultdict
    groups = defaultdict(set)
    for g, n in set(rows):
        groups[g].add(n)
    w = defaultdict(int)
    for g, members in groups.items():
        if len(members) > max_deg:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                w[(ms[i], ms[j])] += 1
    return dict(w)


def test_cooccurrence_edges_match_bruteforce():
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    rng = np.random.RandomState(7)
    rows = [(f"g{rng.randint(12)}", f"n{rng.randint(20)}")
            for _ in range(200)]
    got = cooccurrence_edges(_membership_ds(rows), "g", "n",
                             nparts=4).to_pandas()
    want = _brute_cooc(rows)
    got_map = {(a, b): int(w) for a, b, w in
               zip(got["node_a"], got["node_b"], got["w"])}
    assert got_map == want


def test_cooccurrence_min_weight_filters():
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"),
            ("g3", "a"), ("g3", "c")]
    got = cooccurrence_edges(_membership_ds(rows), "g", "n",
                             min_weight=2, nparts=2).to_pandas()
    assert len(got) == 1
    assert (got["node_a"][0], got["node_b"][0], int(got["w"][0])) \
        == ("a", "b", 2)


def test_hot_group_stoplist_drops_o_degree_squared_groups():
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    # one hot group over the cap (would emit C(9,2) pairs), one cool
    rows = [("hot", f"n{i}") for i in range(9)] \
        + [("cool", "n0"), ("cool", "n1")]
    got = cooccurrence_edges(_membership_ds(rows), "g", "n",
                             max_group_degree=8, nparts=2).to_pandas()
    assert len(got) == 1  # only the cool group's single pair survives
    want = _brute_cooc(rows, max_deg=8)
    assert {("n0", "n1"): 1} == want \
        == {(got["node_a"][0], got["node_b"][0]): int(got["w"][0])}


def test_jaccard_relatedness_integers_match_bruteforce():
    from sbb_ned_ray.stages.graph import jaccard_relatedness
    rng = np.random.RandomState(11)
    rows = [(f"g{rng.randint(15)}", f"n{rng.randint(12)}")
            for _ in range(150)]
    got = jaccard_relatedness(_membership_ds(rows), "g", "n",
                              min_inter=2, nparts=4).to_pandas()
    from collections import defaultdict
    node_groups = defaultdict(set)
    for g, n in set(rows):
        node_groups[n].add(g)
    for a, b, inter, uni in zip(got["node_a"], got["node_b"],
                                got["inter"], got["uni"]):
        wi = len(node_groups[a] & node_groups[b])
        wu = len(node_groups[a] | node_groups[b])
        assert (int(inter), int(uni)) == (wi, wu), (a, b)
    # completeness: every pair with inter >= 2 is present
    names = sorted(node_groups)
    want_pairs = {(a, b) for i, a in enumerate(names)
                  for b in names[i + 1:]
                  if len(node_groups[a] & node_groups[b]) >= 2}
    assert set(zip(got["node_a"], got["node_b"])) == want_pairs


def test_triangle_stats_matches_dense_reference():
    from sbb_ned_ray.stages.graph import triangle_stats, triangles_np
    rng = np.random.RandomState(3)
    # random undirected graph on 30 string nodes
    edges = set()
    for _ in range(120):
        i, j = rng.randint(30), rng.randint(30)
        if i == j:
            continue
        a, b = sorted((f"v{i:02d}", f"v{j:02d}"))
        edges.add((a, b))
    ea = [a for a, _ in edges]
    eb = [b for _, b in edges]
    ds = ray.data.from_arrow(pa.table({
        "node_a": pa.array(ea, pa.string()),
        "node_b": pa.array(eb, pa.string())}))
    stats = triangle_stats(ds, nparts=4)
    assert stats["n_edges"] == len(edges)
    assert stats["n_nodes"] == len({*ea, *eb})
    assert stats["triangles"] == triangles_np(np.array(ea, object),
                                              np.array(eb, object))


def test_triangle_stats_counts_known_graph():
    from sbb_ned_ray.stages.graph import triangle_stats
    # K4 has 4 triangles; plus a pendant edge adds none
    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(nodes)
             for y in nodes[i + 1:]] + [("d", "e")]
    ds = ray.data.from_arrow(pa.table({
        "node_a": pa.array([a for a, _ in edges], pa.string()),
        "node_b": pa.array([b for _, b in edges], pa.string())}))
    stats = triangle_stats(ds, nparts=2)
    assert stats == {"n_nodes": 5, "n_edges": 7, "triangles": 4}


def test_cooc_components_match_union_find():
    from sbb_ned_ray.stages.cluster import (driver_union_find,
                                            label_propagation_components)
    from sbb_ned_ray.stages.graph import cooccurrence_edges
    rng = np.random.RandomState(5)
    rows = [(f"g{rng.randint(25)}", f"n{rng.randint(40)}")
            for _ in range(120)]
    edges = cooccurrence_edges(_membership_ds(rows), "g", "n",
                               nparts=4).materialize()
    comp = label_propagation_components(
        edges, src="node_a", dst="node_b", max_iters=64,
        num_partitions=4).to_pandas()
    epd = edges.to_pandas()
    want = driver_union_find(list(zip(epd["node_a"], epd["node_b"])))
    got = dict(zip(comp["node"], comp["component"]))
    assert got == want


def _kcore_brute(edges: list, k: int) -> dict:
    """Reference peeling over an adjacency dict."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_kcore_matches_brute(ray_session):
    import random

    import pandas as pd

    from sbb_ned_ray.stages.graph import kcore_nodes
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = set()
    # a planted dense clique + random sparse noise + a long chain
    for a in nodes[:8]:
        for b in nodes[:8]:
            if a < b:
                edges.add((a, b))
    for _ in range(80):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    for i in range(40, 59):
        edges.add((nodes[i], nodes[i + 1]))
    ds = ray.data.from_pandas(pd.DataFrame(
        {"node_a": [a for a, _ in edges],
         "node_b": [b for _, b in edges]}))
    for k in (2, 3, 5):
        got = kcore_nodes(ds, k, nparts=4)
        want = _kcore_brute(sorted(edges), k)
        assert dict(zip(got["node"], got["core_degree"])) == want
    # the 7-core is empty (clique of 8 has degree 7; random noise may
    # add) — at least assert the API handles an empty core cleanly
    got = kcore_nodes(ds, 50, nparts=4)
    assert len(got) == 0


def test_node_triangle_counts_brute(ray_session):
    import random

    import pandas as pd

    from sbb_ned_ray.stages.graph import node_triangle_counts
    rng = random.Random(13)
    nodes = [f"v{i:02d}" for i in range(30)]
    edges = set()
    for a in nodes[:6]:            # clique of 6
        for b in nodes[:6]:
            if a < b:
                edges.add((a, b))
    for _ in range(60):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    got = node_triangle_counts(ray.data.from_pandas(pd.DataFrame(
        {"node_a": [a for a, _ in edges],
         "node_b": [b for _, b in edges]})), nparts=4)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {n: (sum(len(adj[n] & adj[m]) for m in adj[n]) // 2,
                len(adj[n])) for n in adj}
    assert {r["node"]: (r["tri"], r["deg"])
            for _, r in got.iterrows()} == want
    # clique-of-6 members have at least C(5,2)=10 triangles each
    assert all(want[n][0] >= 10 for n in nodes[:6])
