"""Link-graph centrality (weighted PageRank) over ``(src, dst)`` edge
tables.

Real NED systems weight candidates by an a-priori popularity prior
derived from the link graph — the reference computes the link-COUNT
version when it builds per-surface candidate frequencies
(``qurator/sbb_ned/ground_truth/data_processor.py``, the count columns
behind its a-priori proba); a PageRank over the same links is that
prior with global graph structure, and it is also the shape web-corpus
curation publishes for crawl prioritization (Common Crawl's host-level
harmonic centrality / PageRank rankings).

Two execution paths, one semantics (both pinned to the dense numpy
reference :func:`pagerank_np` by tests and the self-checking query):

* ``method="broadcast"`` — node state (two float64 vectors) fits a
  worker heap.  The edge table never moves after one ``materialize``:
  each iteration ships the rank vector once via ``ray.put`` and runs
  ONE dense ``np.bincount`` task per edge block, tree-reduced back to
  node size.  This is the right 100-TB shape: the huge side (edges)
  stays in the object store, only the node-sized vector travels.  A
  Common-Crawl-scale host graph (~90M hosts) is ~0.7 GB of node state —
  comfortably inside this path.
* ``method="shuffle"`` — node state too big to broadcast (entity-level
  graphs with billions of nodes).  Each iteration is
  rank ⋈ edges (hash join on ``src``) → ``groupby(dst).sum`` →
  ``left_outer`` back onto the static node table.  Every exchange is
  node- or edge-sized and nothing lands on the driver except the
  scalar dangling mass.

Dangling nodes (out-degree 0) redistribute their rank uniformly, the
standard PageRank convention, in all three implementations.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def pagerank_np(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                n_nodes: int, damping: float = 0.85,
                iters: int = 20,
                seeds: tuple[np.ndarray, np.ndarray] | None = None
                ) -> np.ndarray:
    """Dense single-process reference: weighted PageRank with uniform
    dangling-mass redistribution.  The distributed paths must match
    this bit-close (same float64 operation order per node).

    ``seeds=(node_ids, weights)`` switches to PERSONALIZED PageRank —
    teleport (and dangling mass) land only on the seed set,
    renormalized to sum 1.  With trusted seed hosts this is TrustRank
    (Gyöngyi et al. 2004), the standard web-spam demotion signal in
    crawl curation; seed sets are small by construction, which is why
    the sparse spec stays honest on every execution path."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float64)
    t = _teleport_dense(n_nodes, seeds)
    wout = np.bincount(src, weights=w, minlength=n_nodes)
    ranks = t.copy()
    base = (1.0 - damping) * t
    sink = wout == 0.0
    safe = np.where(sink, 1.0, wout)
    for _ in range(iters):
        push = np.where(sink, 0.0, ranks) / safe
        agg = np.bincount(dst, weights=w * push[src], minlength=n_nodes)
        dangling = ranks[sink].sum()
        ranks = base + damping * (agg + dangling * t)
    return ranks


def _teleport_dense(n_nodes: int,
                    seeds: tuple[np.ndarray, np.ndarray] | None
                    ) -> np.ndarray:
    """Dense teleport vector from the sparse ``(ids, weights)`` seed
    spec (uniform when None), normalized to sum 1."""
    if seeds is None:
        return np.full(n_nodes, 1.0 / n_nodes)
    ids = np.asarray(seeds[0], np.int64)
    wts = np.asarray(seeds[1], np.float64)
    t = np.zeros(n_nodes, np.float64)
    np.add.at(t, ids, wts)
    s = t.sum()
    if s <= 0:
        raise ValueError("teleport seed weights must sum > 0")
    return t / s


@ray.remote
def _push_block(tab: pa.Table, push: np.ndarray, n_nodes: int) -> np.ndarray:
    src = tab["src"].to_numpy(zero_copy_only=False)
    dst = tab["dst"].to_numpy(zero_copy_only=False)
    w = tab["w"].to_numpy(zero_copy_only=False).astype(np.float64)
    return np.bincount(dst, weights=w * push[src], minlength=n_nodes)


@ray.remote
def _wout_block(tab: pa.Table, n_nodes: int) -> np.ndarray:
    src = tab["src"].to_numpy(zero_copy_only=False)
    w = tab["w"].to_numpy(zero_copy_only=False).astype(np.float64)
    return np.bincount(src, weights=w, minlength=n_nodes)


@ray.remote
def _sum_arrays(*arrs: np.ndarray) -> np.ndarray:
    out = arrs[0].copy()
    for a in arrs[1:]:
        out += a
    return out


def _tree_sum(refs: list, fanin: int = 8) -> np.ndarray:
    """Tree-reduce a list of ObjectRef[np.ndarray] to one array without
    pulling every block array to the driver at once."""
    while len(refs) > fanin:
        refs = [_sum_arrays.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    parts = ray.get(refs)
    out = parts[0].copy()
    for a in parts[1:]:
        out += a
    return out


def _norm_edges(edges: ray.data.Dataset, src_col: str, dst_col: str,
                weight_col: str | None) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        w = (t[weight_col].to_numpy(zero_copy_only=False)
             .astype(np.float64) if weight_col is not None
             else np.ones(t.num_rows, np.float64))
        return pa.table({"src": t[src_col].cast(pa.int64()),
                         "dst": t[dst_col].cast(pa.int64()),
                         "w": pa.array(w, pa.float64())})
    return edges.map_batches(fn, batch_format="pyarrow")


def pagerank_broadcast(edges: ray.data.Dataset, n_nodes: int,
                       damping: float = 0.85, iters: int = 20,
                       src_col: str = "src", dst_col: str = "dst",
                       weight_col: str | None = "w",
                       seeds: tuple[np.ndarray, np.ndarray] | None = None
                       ) -> np.ndarray:
    """Broadcast-ranks path: edges stay put, the node vector travels.
    Returns the dense rank vector (node state fits by this path's
    precondition).  ``seeds`` → personalized PageRank / TrustRank, see
    :func:`pagerank_np`."""
    t = _teleport_dense(n_nodes, seeds)
    em = _norm_edges(edges, src_col, dst_col, weight_col).materialize()
    refs = em.to_arrow_refs()
    if not refs:
        return t.copy()
    wout = _tree_sum([_wout_block.remote(r, n_nodes) for r in refs])
    sink = wout == 0.0
    safe = np.where(sink, 1.0, wout)
    ranks = t.copy()
    base = (1.0 - damping) * t
    for _ in range(iters):
        push_ref = ray.put(np.where(sink, 0.0, ranks) / safe)
        agg = _tree_sum([_push_block.remote(r, push_ref, n_nodes)
                         for r in refs])
        dangling = ranks[sink].sum()
        ranks = base + damping * (agg + dangling * t)
    return ranks


def pagerank_shuffle(edges: ray.data.Dataset, n_nodes: int,
                     damping: float = 0.85, iters: int = 20,
                     src_col: str = "src", dst_col: str = "dst",
                     weight_col: str | None = "w",
                     num_partitions: int = 16,
                     seeds: tuple[np.ndarray, np.ndarray] | None = None
                     ) -> ray.data.Dataset:
    """Co-shuffle path for node sets too big to broadcast: per
    iteration rank ⋈ edges on ``src`` → ``groupby(dst).sum`` →
    ``left_outer`` onto the static node table.  Returns the
    ``(node_id, rank)`` Dataset; only the scalar dangling mass ever
    reaches the driver.  ``seeds`` → personalized PageRank /
    TrustRank: the teleport column on the static node table comes from
    the sparse seed spec (seed sets are small, so the spec broadcasts
    fine even on this path)."""
    from ray.data.aggregate import Sum

    em = _norm_edges(edges, src_col, dst_col, weight_col).materialize()
    if seeds is not None:
        ids = np.asarray(seeds[0], np.int64)
        wts = np.asarray(seeds[1], np.float64)
        s = wts.sum()
        if s <= 0:
            raise ValueError("teleport seed weights must sum > 0")
        uniq, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(len(uniq), np.float64)
        np.add.at(acc, inv, wts / s)
        seed_map_ref = ray.put((uniq, acc))
    else:
        seed_map_ref = None

    # static node table with out-weight: node ids are dense by contract
    def mk_nodes(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        return pa.table({"node_id": pa.array(ids, pa.int64())})

    nodes = ray.data.range(n_nodes).map_batches(
        mk_nodes, batch_format="pyarrow")
    wout = em.groupby("src").aggregate(Sum("w", alias_name="wout")) \
        .map_batches(lambda t: pa.table(
            {"node_id": t["src"].cast(pa.int64()),
             "wout": t["wout"].cast(pa.float64())}),
            batch_format="pyarrow")
    nodes = nodes.join(wout, join_type="left_outer",
                       num_partitions=num_partitions, on=("node_id",))

    def seed(t: pa.Table) -> pa.Table:
        n = t.num_rows
        wo = t["wout"].to_numpy(zero_copy_only=False).astype(np.float64)
        wo = np.nan_to_num(wo, nan=0.0)
        nid = t["node_id"].to_numpy(zero_copy_only=False)
        if seed_map_ref is not None:
            sids, swts = ray.get(seed_map_ref)
            tele = np.zeros(n, np.float64)
            pos = np.searchsorted(sids, nid)
            pos_c = np.minimum(pos, len(sids) - 1)
            hit = sids[pos_c] == nid
            tele[hit] = swts[pos_c[hit]]
        else:
            tele = np.full(n, 1.0 / n_nodes)
        return pa.table({
            "node_id": pa.array(nid, pa.int64()),
            "wout": pa.array(wo, pa.float64()),
            "tele": pa.array(tele, pa.float64()),
            "rank": pa.array(tele.copy(), pa.float64())})

    ranks = nodes.map_batches(seed, batch_format="pyarrow").materialize()
    for _ in range(iters):
        # scalar dangling mass (tiny driver-side aggregate)
        dang_rows = ranks.map_batches(
            lambda t: pa.table({"d": pa.array(
                [float(np.where(
                    t["wout"].to_numpy(zero_copy_only=False) == 0.0,
                    t["rank"].to_numpy(zero_copy_only=False), 0.0).sum())],
                pa.float64())}), batch_format="pyarrow") \
            .sum("d")
        dangling = float(dang_rows or 0.0)

        contrib_src = ranks.map_batches(
            lambda t: pa.table({
                "src": t["node_id"],
                "push": pa.array(np.divide(
                    t["rank"].to_numpy(zero_copy_only=False),
                    t["wout"].to_numpy(zero_copy_only=False),
                    out=np.zeros(t.num_rows, np.float64),
                    where=t["wout"].to_numpy(zero_copy_only=False) != 0.0),
                    pa.float64())}), batch_format="pyarrow")
        sums = em.join(contrib_src, join_type="inner",
                       num_partitions=num_partitions, on=("src",)) \
            .map_batches(lambda t: pa.table({
                "node_id": t["dst"].cast(pa.int64()),
                "c": pa.array(
                    t["w"].to_numpy(zero_copy_only=False)
                    * t["push"].to_numpy(zero_copy_only=False),
                    pa.float64())}), batch_format="pyarrow") \
            .groupby("node_id").aggregate(Sum("c", alias_name="s"))

        def step(t: pa.Table, _d=dangling) -> pa.Table:
            s = np.nan_to_num(
                t["s"].to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0)
            tele = t["tele"].to_numpy(zero_copy_only=False)
            new = (1.0 - damping) * tele + damping * (s + _d * tele)
            return pa.table({"node_id": t["node_id"].cast(pa.int64()),
                             "wout": t["wout"].cast(pa.float64()),
                             "tele": pa.array(tele, pa.float64()),
                             "rank": pa.array(new, pa.float64())})

        ranks = ranks.select_columns(["node_id", "wout", "tele"]) \
            .join(sums, join_type="left_outer",
                  num_partitions=num_partitions, on=("node_id",)) \
            .map_batches(step, batch_format="pyarrow").materialize()
    return ranks.select_columns(["node_id", "rank"])


def pagerank(edges: ray.data.Dataset, n_nodes: int,
             damping: float = 0.85, iters: int = 20,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: str | None = "w", method: str = "auto",
             node_broadcast_limit: int = 50_000_000,
             num_partitions: int = 16,
             seeds: tuple[np.ndarray, np.ndarray] | None = None
             ) -> ray.data.Dataset:
    """Weighted PageRank → ``(node_id, rank)`` Dataset.  ``auto`` picks
    the broadcast path while the node vector is comfortably below the
    object-store budget (same selector philosophy as
    ``run_ned_auto``), else the co-shuffle path.  ``seeds=(ids,
    weights)`` → personalized PageRank / TrustRank (teleport restricted
    to the seed set) on either path."""
    if method == "auto":
        method = ("broadcast" if n_nodes <= node_broadcast_limit
                  else "shuffle")
    if method == "broadcast":
        ranks = pagerank_broadcast(edges, n_nodes, damping, iters,
                                   src_col, dst_col, weight_col,
                                   seeds=seeds)
        ids = np.arange(n_nodes, dtype=np.int64)
        return ray.data.from_arrow(pa.table(
            {"node_id": pa.array(ids, pa.int64()),
             "rank": pa.array(ranks, pa.float64())}))
    if method == "shuffle":
        return pagerank_shuffle(edges, n_nodes, damping, iters,
                                src_col, dst_col, weight_col,
                                num_partitions, seeds=seeds)
    raise ValueError(f"unknown pagerank method: {method}")


@ray.remote
def _ball_block(tab: pa.Table, regs: np.ndarray) -> np.ndarray:
    """One HyperBall sweep over one edge block: for every edge
    (src → dst), fold dst's counter into src's (row-wise register
    max).  Returns a dense partial the driver tree-maxes."""
    src = tab["src"].to_numpy(zero_copy_only=False)
    dst = tab["dst"].to_numpy(zero_copy_only=False)
    out = np.zeros_like(regs)
    np.maximum.at(out, src, regs[dst])
    return out


@ray.remote
def _max_arrays(*arrs: np.ndarray) -> np.ndarray:
    out = arrs[0].copy()
    for a in arrs[1:]:
        np.maximum(out, a, out)
    return out


def _hll_estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized per-row HLL estimate (one counter per graph node),
    same bias/linear-counting rules as ``sketches.hll_estimate``."""
    m = regs.shape[1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.exp2(-regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    lc = (est <= 2.5 * m) & (zeros > 0)
    est[lc] = m * np.log(m / zeros[lc])
    return est


def hyperball(edges: ray.data.Dataset, n_nodes: int, p: int = 8,
              max_iters: int = 32, src_col: str = "src",
              dst_col: str = "dst") -> dict:
    """HyperBall (Boldi & Vigna 2013, "In-core computation of
    geometric centralities with HyperBall"): one small HLL counter per
    node; iteration r folds every out-neighbor's counter into the
    node's (register max over edges), so after r sweeps node v's
    counter estimates ``|{u : d(v,u) <= r}|`` — the neighborhood
    function without any all-pairs BFS.  Harmonic centrality
    accumulates ``(N_v(r) - N_v(r-1)) / r`` per sweep.

    This is the broadcast path of the family (same shape as
    :func:`pagerank_broadcast`): the edge table is materialized once
    and never moves; per sweep the ``n_nodes x 2**p`` uint8 counter
    matrix ships via ``ray.put`` and each edge block contributes one
    dense partial, tree-MAX-reduced.  Node state is ``n * 2**p``
    bytes — 100M hosts at p=6 is 6.4 GB, inside a worker heap; beyond
    that the counters partition by node id and the sweep becomes the
    ``pagerank_shuffle`` join+groupby with an elementwise-max
    aggregate (same exchange pattern, not materialized here).
    Converges (stops early) when no register changes — at most the
    graph's diameter sweeps.

    Returns ``{"harmonic": (n,) float64, "ball_sizes": final
    neighborhood-function estimates, "iters": sweeps run}``.
    Estimates carry standard HLL error (~1.04/sqrt(2**p)).
    """
    from sbb_ned_ray.stages.sketches import hll_idx_rho

    m = 1 << p
    em = _norm_edges(edges, src_col, dst_col, None).materialize()
    refs = em.to_arrow_refs()
    regs = np.zeros((n_nodes, m), dtype=np.uint8)
    idx, rho = hll_idx_rho(np.arange(n_nodes, dtype=np.int64), p)
    regs[np.arange(n_nodes), idx] = rho.astype(np.uint8)

    prev = _hll_estimate_rows(regs)            # N_v(0) ~= 1
    harmonic = np.zeros(n_nodes, np.float64)
    it = 0
    for it in range(1, max_iters + 1):
        regs_ref = ray.put(regs)
        parts = [_ball_block.remote(r, regs_ref) for r in refs]
        while len(parts) > 8:
            parts = [_max_arrays.remote(*parts[i:i + 8])
                     for i in range(0, len(parts), 8)]
        folded = ray.get(parts)
        new = regs.copy()
        for a in folded:
            np.maximum(new, a, new)
        if np.array_equal(new, regs):
            it -= 1
            break
        regs = new
        cur = _hll_estimate_rows(regs)
        harmonic += np.maximum(cur - prev, 0.0) / it
        prev = cur
    return {"harmonic": harmonic, "ball_sizes": prev, "iters": it}


def harmonic_centrality(edges: ray.data.Dataset, n_nodes: int,
                        p: int = 8, max_iters: int = 32,
                        src_col: str = "src", dst_col: str = "dst"
                        ) -> np.ndarray:
    """Harmonic centrality ``H(v) = sum_{u != v} 1 / d(u, v)``
    (distances TO v), the ranking Common Crawl publishes for hosts:
    HyperBall run on the TRANSPOSED graph, so node v's ball grows over
    the nodes that can REACH v."""
    return hyperball(edges, n_nodes, p=p, max_iters=max_iters,
                     src_col=dst_col, dst_col=src_col)["harmonic"]


def harmonic_centrality_exact(src: np.ndarray, dst: np.ndarray,
                              n_nodes: int,
                              targets: np.ndarray | None = None
                              ) -> np.ndarray:
    """Exact reference: BFS per target node over the transposed graph
    (``H(v)`` needs distances d(u, v), i.e. reverse reachability).
    O(targets * (n + edges)) — for tests and the query's spot-check
    sample, never for scale."""
    order = np.argsort(dst, kind="stable")
    s_dst = dst[order]
    s_src = src[order]
    starts = np.searchsorted(s_dst, np.arange(n_nodes + 1))
    if targets is None:
        targets = np.arange(n_nodes, dtype=np.int64)
    out = np.zeros(len(targets), np.float64)
    for ti, v in enumerate(targets):
        dist = np.full(n_nodes, -1, np.int64)
        dist[v] = 0
        frontier = np.array([v], np.int64)
        d = 0
        h = 0.0
        while len(frontier):
            d += 1
            nxt = np.concatenate(
                [s_src[starts[u]:starts[u + 1]] for u in frontier]) \
                if len(frontier) else np.empty(0, np.int64)
            nxt = np.unique(nxt)
            nxt = nxt[dist[nxt] == -1]
            dist[nxt] = d
            h += len(nxt) / d
            frontier = nxt
        out[ti] = h
    return out


def bipartite_link_edges(links: ray.data.Dataset, left_col: str,
                         right_col: str) -> dict:
    """(url-ish, entity-ish) link rows → symmetric weighted bipartite
    edge table with dense int node ids: left nodes ``0..n_left-1``,
    right nodes ``n_left..n_left+n_right-1``, one edge per direction
    weighted by the link count (a random walk alternating sides — the
    bipartite PageRank construction).

    Aggregation (``groupby(left,right).count``) runs distributed; the
    DISTINCT (left, right) pair table that reaches the id-coding step
    is vocabulary-sized, not corpus-sized.  At web scale the dense-id
    coding itself would become a sorted-rank or hash-id pass (the
    ``kb_block_tables`` factorize idiom); the fixture-scale driver
    factorize here is the small-side convenience."""
    counts = links.groupby([left_col, right_col]).count().to_pandas()
    lcode, lvals = pd.factorize(counts[left_col], sort=True)
    rcode, rvals = pd.factorize(counts[right_col], sort=True)
    n_left = len(lvals)
    src = lcode.astype(np.int64)
    dst = rcode.astype(np.int64) + n_left
    w = counts["count()"].to_numpy(np.float64)
    tab = pa.table({
        "src": pa.array(np.concatenate([src, dst]), pa.int64()),
        "dst": pa.array(np.concatenate([dst, src]), pa.int64()),
        "w": pa.array(np.concatenate([w, w]), pa.float64())})
    return {"edges": ray.data.from_arrow(tab),
            "edges_np": (np.concatenate([src, dst]),
                         np.concatenate([dst, src]),
                         np.concatenate([w, w])),
            "left_values": list(lvals), "right_values": list(rvals),
            "n_nodes": n_left + len(rvals), "n_left": n_left}
