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


# ---------------------------------------------------------------------------
# Co-occurrence projection, Jaccard relatedness, triangle counting
# ---------------------------------------------------------------------------
#
# The reference ranks candidates with sentence context (evaluate-with-
# context, qurator/sbb_ned/models/decider.py consumers); the global-
# structure version of that signal is entity RELATEDNESS from the link
# graph — Milne & Witten 2008-style co-occurrence statistics.  These
# operators project (group, node) membership rows (page → entities
# mentioned on it) into an undirected weighted co-occurrence graph and
# derive the two classic relatedness/cohesion measures over it:
# neighbor-set Jaccard (link prediction / relatedness) and triangle
# counts (clustering structure).  All three are oracle-checked against
# DuckDB twins (integer-exact outputs: weights, intersection/union
# sizes, triangle counts — no float rounding in the contract).


def _pairs_in_groups(df: pd.DataFrame, key_col: str, node_col: str,
                     out_a: str = "node_a", out_b: str = "node_b"
                     ) -> pd.DataFrame:
    """All unordered intra-group pairs, one vectorized pass per group
    SIZE (not per group): groups are gathered into an (n_groups, size)
    matrix per distinct size and emitted with one ``triu_indices``
    gather.  Pair order is canonical (``a < b`` within the row)."""
    if not len(df):
        return _pd_to_arrow(pd.DataFrame({out_a: pd.Series([], dtype=object),
                                          out_b: pd.Series([], dtype=object)}))
    codes, _ = pd.factorize(df[key_col], sort=False)
    order = np.argsort(codes, kind="stable")
    codes = codes[order]
    nodes = df[node_col].to_numpy()[order]
    bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1], True])
    sizes = np.diff(bounds)
    starts = bounds[:-1]
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    for s in np.unique(sizes):
        if s < 2:
            continue
        st = starts[sizes == s]
        mat = nodes[st[:, None] + np.arange(s)]
        mat = np.sort(mat, axis=1)
        iu, ju = np.triu_indices(int(s), k=1)
        outs_a.append(mat[:, iu].ravel())
        outs_b.append(mat[:, ju].ravel())
    if not outs_a:
        return _pd_to_arrow(pd.DataFrame({out_a: pd.Series([], dtype=object),
                                          out_b: pd.Series([], dtype=object)}))
    return _pd_to_arrow(pd.DataFrame({out_a: np.concatenate(outs_a),
                                      out_b: np.concatenate(outs_b)}))


def _bucketed_pairs(rows: ray.data.Dataset, key_col: str, node_col: str,
                    nparts: int) -> ray.data.Dataset:
    """Hash-bucket ``rows`` on ``key_col`` into ``nparts`` coarse
    partitions and run :func:`_pairs_in_groups` ONCE per bucket (the
    dedup stages' amortization idiom — per-group overhead would
    dominate on millions of small groups)."""
    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_groups(df, key_col, node_col)

    return (rows.map_batches(
        lambda df, _k=key_col, _n=nparts: _add_hash_part(df, [_k], _n),
        batch_format="pandas")
        .groupby("_part").map_groups(per_bucket, batch_format="pandas"))


def _pd_to_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas → Arrow with object columns pinned to ``string`` — keeps
    EMPTY bucket outputs on the same schema as populated ones (a bare
    ``from_pandas`` would type them ``null`` and trip Ray's block-size
    estimator / union schema checks)."""
    fields = [pa.field(c, pa.string() if df[c].dtype == object
                       else pa.from_numpy_dtype(df[c].dtype))
              for c in df.columns]
    return pa.Table.from_pandas(df, schema=pa.schema(fields),
                                preserve_index=False)


def _add_hash_part(df: pd.DataFrame, key_cols: list[str],
                   nparts: int) -> pd.DataFrame:
    """Append an int32 ``_part`` hash-bucket column over the composite
    key.  Bucketing on a SINGLE int32 column keeps every downstream
    exchange on the cheap fixed-width sort path — Ray Data's
    sort-based groupby over multi-STRING key columns is ~30× slower on
    the same rows (measured at sf0.1: 34 s vs 1.2 s for the pair-count
    aggregate), so none of the operators below ever hand string keys
    to a Dataset groupby."""
    df = df.copy()
    key = df[key_cols[0]].astype(str)
    for k in key_cols[1:]:
        key = key + "\x00" + df[k].astype(str)
    df["_part"] = (pd.util.hash_pandas_object(key, index=False)
                   .to_numpy() % nparts).astype(np.int32)
    return df


def _bucketed_counts(rows: ray.data.Dataset, key_cols: list[str],
                     nparts: int, count_col: str = "w",
                     weight_col: str | None = None) -> ray.data.Dataset:
    """Per-key row counts (or sums of ``weight_col``) via per-batch
    partial aggregation (the combiner — the exchange ships one row per
    DISTINCT key per block, not per input row) followed by one
    int32-bucketed merge."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col is None:
            g = df.groupby(key_cols, sort=False).size() \
                .reset_index(name=count_col)
        else:
            g = df.groupby(key_cols, sort=False)[weight_col].sum() \
                .reset_index().rename(columns={weight_col: count_col})
        return _add_hash_part(g, key_cols, nparts)

    def final(df: pd.DataFrame) -> pa.Table:
        return _pd_to_arrow(df.groupby(key_cols, sort=False)[count_col]
                            .sum().reset_index())

    return rows.map_batches(partial, batch_format="pandas") \
        .groupby("_part").map_groups(final, batch_format="pandas")


def _bucketed_distinct(rows: ray.data.Dataset, key_cols: list[str],
                       nparts: int) -> ray.data.Dataset:
    """DISTINCT rows over ``key_cols``: per-batch ``drop_duplicates``
    (combiner) → int32-bucketed exchange → per-bucket final dedup."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _add_hash_part(df[key_cols].drop_duplicates(), key_cols,
                              nparts)

    def final(df: pd.DataFrame) -> pa.Table:
        return _pd_to_arrow(df[key_cols].drop_duplicates())

    return rows.map_batches(partial, batch_format="pandas") \
        .groupby("_part").map_groups(final, batch_format="pandas")


def distinct_membership(links: ray.data.Dataset, group_col: str,
                        node_col: str, max_group_degree: int = 64,
                        nparts: int = 32) -> ray.data.Dataset:
    """DISTINCT (group, node) rows with hot groups removed.

    A group touching more than ``max_group_degree`` nodes emits
    O(degree²) pairs downstream — the frequency-stoplist guard (same
    rule as the blocking path's hot-surface stoplist): hot groups are
    FEW by construction, so collecting just their keys to broadcast is
    a small-side lookup, never a corpus collect."""
    distinct = _bucketed_distinct(links, [group_col, node_col],
                                  nparts).materialize()
    hot = _bucketed_counts(distinct, [group_col], nparts, "c") \
        .map_batches(
            lambda df, _d=max_group_degree: _pd_to_arrow(
                df[df["c"] > _d].reset_index(drop=True)),
            batch_format="pandas") \
        .to_pandas()
    if len(hot):
        hot_keys = set(hot[group_col].tolist())
        hot_ref = ray.put(hot_keys)

        def drop_hot(df: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(hot_ref)
            return df[~df[group_col].isin(keys)]

        distinct = distinct.map_batches(drop_hot, batch_format="pandas")
    return distinct


def cooccurrence_edges(links: ray.data.Dataset, group_col: str,
                       node_col: str, min_weight: int = 1,
                       max_group_degree: int = 64,
                       nparts: int = 32) -> ray.data.Dataset:
    """(group, node) membership rows → undirected co-occurrence edge
    Dataset ``(node_a, node_b, w)`` with ``node_a < node_b`` and
    ``w`` = number of distinct groups containing both nodes.

    Shape: distinct → hot-group stoplist → bucketed pair emission
    (bounded by ``max_group_degree``² per group) → ONE narrow
    ``groupby(node_a, node_b).count()``.  No broadcast of anything
    corpus-sized; the only all-to-all is pair-table-sized."""
    distinct = distinct_membership(links, group_col, node_col,
                                   max_group_degree, nparts)
    pairs = _bucketed_pairs(distinct, group_col, node_col, nparts)
    edges = _bucketed_counts(pairs, ["node_a", "node_b"], nparts, "w")
    if min_weight > 1:
        edges = edges.map_batches(
            lambda df, _mw=min_weight: _pd_to_arrow(
                df[df["w"] >= _mw].reset_index(drop=True)),
            batch_format="pandas")
    return edges


def jaccard_relatedness(links: ray.data.Dataset, group_col: str,
                        node_col: str, min_inter: int = 2,
                        max_group_degree: int = 64,
                        nparts: int = 32) -> ray.data.Dataset:
    """Neighbor-set Jaccard over group membership: for node pairs
    sharing ≥ ``min_inter`` groups, ``(node_a, node_b, inter, uni)``
    where ``inter`` = |G(a) ∩ G(b)| and ``uni`` = |G(a) ∪ G(b)| —
    the Milne-Witten-style relatedness numerator/denominator kept as
    exact integers (the score ``inter/uni`` is derivable; keeping
    integers makes the oracle contract rounding-free).

    Degrees ride a broadcast dict (node-count-sized — the small side
    at entity vocabulary scale; for billion-node graphs swap in the
    co-shuffle label join from
    :func:`sbb_ned_ray.stages.cluster.label_propagation_components`)."""
    distinct = distinct_membership(links, group_col, node_col,
                                   max_group_degree, nparts)
    edges = cooccurrence_edges(links, group_col, node_col,
                               min_weight=min_inter,
                               max_group_degree=max_group_degree,
                               nparts=nparts)
    deg_df = _bucketed_counts(distinct, [node_col], nparts, "d") \
        .to_pandas()
    deg_ref = ray.put(dict(zip(deg_df[node_col].tolist(),
                               deg_df["d"].astype(int).tolist())))

    def attach(df: pd.DataFrame) -> pa.Table:
        deg = ray.get(deg_ref)
        da = df["node_a"].map(deg).to_numpy(np.int64)
        db = df["node_b"].map(deg).to_numpy(np.int64)
        inter = df["w"].to_numpy(np.int64)
        return _pd_to_arrow(pd.DataFrame({
            "node_a": df["node_a"].reset_index(drop=True),
            "node_b": df["node_b"].reset_index(drop=True),
            "inter": inter, "uni": da + db - inter}))

    return edges.map_batches(attach, batch_format="pandas")


def triangle_stats(edges: ray.data.Dataset, nparts: int = 32) -> dict:
    """Exact global triangle count over an undirected edge Dataset
    ``(node_a, node_b)`` with ``node_a < node_b`` (one row per edge).

    Node-iterator algorithm, fully distributed: each edge's lower
    endpoint groups its higher neighbors (bucketed pair emission →
    WEDGES ``(x, y)``, the two missing sides of a potential triangle),
    then wedges ∪ edges co-group on ``(x, y)`` — a wedge whose closing
    edge exists in its group is a triangle, counted once per triangle
    because wedges only open at the minimum vertex.  The only
    driver-bound value is the final scalar sum."""
    edges = edges.materialize()
    wedges = _bucketed_pairs(
        edges.map_batches(
            lambda df: df[["node_a", "node_b"]], batch_format="pandas"),
        "node_a", "node_b", nparts).map_batches(
        lambda df: df.assign(is_edge=np.int64(0)),
        batch_format="pandas")
    tagged_edges = edges.map_batches(
        lambda df: pd.DataFrame({"node_a": df["node_a"],
                                 "node_b": df["node_b"],
                                 "is_edge": np.int64(1)}),
        batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["node_a", "node_b"], sort=False)["is_edge"] \
            .agg(n_edge="sum", cnt="size").reset_index()
        return _add_hash_part(g, ["node_a", "node_b"], nparts)

    def close_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["node_a", "node_b"], sort=False) \
            .agg(n_edge=("n_edge", "sum"), cnt=("cnt", "sum"))
        tri = int((((g["cnt"] - g["n_edge"])
                    * (g["n_edge"] > 0)).sum()))
        return pd.DataFrame({"tri": np.array([tri], np.int64)})

    tri = wedges.union(tagged_edges) \
        .map_batches(partial, batch_format="pandas") \
        .groupby("_part").map_groups(close_bucket, batch_format="pandas") \
        .sum("tri")
    n_edges = edges.count()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(pd.concat([df["node_a"], df["node_b"]],
                                    ignore_index=True))
        return _add_hash_part(pd.DataFrame({"node": nodes}), ["node"],
                              nparts)

    def node_final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": np.array([df["node"].nunique()],
                                           np.int64)})

    n_nodes = edges.map_batches(node_partial, batch_format="pandas") \
        .groupby("_part").map_groups(node_final, batch_format="pandas") \
        .sum("n")
    return {"n_nodes": int(n_nodes or 0), "n_edges": int(n_edges),
            "triangles": int(tri or 0)}


def triangles_np(a: np.ndarray, b: np.ndarray) -> int:
    """Dense reference: exact triangle count over edges (a[i], b[i])
    with a[i] < b[i], via adjacency-set intersection."""
    adj: dict = {}
    for x, y in zip(a, b):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    tri = 0
    for x, y in zip(a, b):
        tri += len(adj[x] & adj[y] & {z for z in adj[x] if z > y})
    return tri


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------

def kcore_nodes(edges: ray.data.Dataset, k: int,
                src: str = "node_a", dst: str = "node_b",
                nparts: int = 32, max_rounds: int = 256
                ) -> pd.DataFrame:
    """Nodes of the ``k``-core (the unique maximal subgraph where
    every node has degree ≥ k; Seidman, "Network structure and minimum
    degree", 1983) of a simple undirected edge table, with each node's
    within-core degree → DataFrame ``(node, core_degree)``.

    Distributed peeling: each round computes within-subgraph degrees
    with ONE bucketed count over the directed edge rows
    (:func:`_bucketed_counts`), drops nodes below ``k``, and filters
    the edge Dataset against the broadcast (``ray.put``) survivor set.
    The edge table never leaves the object store; the driver only sees
    the node-degree table (entity-vocabulary-sized — the same contract
    as :func:`jaccard_relatedness`'s degree broadcast; for
    billion-node graphs swap the survivor semi-join for the bucketed
    label co-shuffle in
    :func:`sbb_ned_ray.stages.cluster.label_propagation_components`).
    Rounds are bounded by the degeneracy ordering depth — typically
    a handful; ``max_rounds`` fails loudly rather than spinning."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def directed(t: pa.Table) -> pa.Table:
        a = t[src].to_pylist()
        b = t[dst].to_pylist()
        return pa.table({"u": pa.array(a + b, pa.string())})

    cur = edges.materialize()
    deg = pd.DataFrame({"u": pd.Series(dtype=object),
                        "n": pd.Series(dtype="int64")})
    for _ in range(max_rounds):
        deg = _bucketed_counts(
            cur.map_batches(directed, batch_format="pyarrow"),
            ["u"], nparts, "n").to_pandas()
        if deg.empty:
            # the whole graph peeled away; an empty Dataset's pandas
            # face may carry no columns — restore the contract schema
            deg = pd.DataFrame({"u": pd.Series(dtype=object),
                                "n": pd.Series(dtype="int64")})
            break
        drop = deg[deg["n"] < k]
        if drop.empty:
            break
        alive_ref = ray.put(frozenset(deg[deg["n"] >= k]["u"]))

        def keep(t: pa.Table, _ref=alive_ref) -> pa.Table:
            alive = ray.get(_ref)
            a = np.array([x in alive for x in t[src].to_pylist()])
            b = np.array([x in alive for x in t[dst].to_pylist()])
            m = a & b if len(a) else np.zeros(0, bool)
            return t.filter(pa.array(m))

        cur = cur.map_batches(keep, batch_format="pyarrow") \
            .materialize()
    else:
        raise RuntimeError(
            f"kcore_nodes: no fixpoint after {max_rounds} rounds")
    out = deg[deg["n"] >= k].rename(
        columns={"u": "node", "n": "core_degree"})
    out["core_degree"] = out["core_degree"].astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)


# ---------------------------------------------------------------------------
# per-node triangle counts / local clustering coefficient substrate
# ---------------------------------------------------------------------------

def node_triangle_counts(edges: ray.data.Dataset, nparts: int = 32
                         ) -> pd.DataFrame:
    """Per-node exact triangle participation + graph degree over an
    undirected edge Dataset ``(node_a, node_b)`` with ``node_a <
    node_b`` → DataFrame ``(node, tri, deg)`` — the integer substrate
    of the local clustering coefficient ``2·tri / (deg·(deg-1))``
    (kept as exact integers so the oracle contract is
    rounding-free).

    Same wedge-closure exchange as :func:`triangle_stats`, but wedges
    CARRY THEIR OPENER: a wedge (x, y) opened at minimum vertex u
    that finds its closing edge in the (x, y) group emits one +1 for
    each of u, x, y — each triangle closes exactly once, so each
    node's count is exact.  Degrees come from one bucketed count of
    the directed rows; the final node-sized merge happens driver-side
    (entity-vocabulary contract, as in :func:`jaccard_relatedness`)."""
    edges = edges.materialize()

    def wedge_rows(df: pd.DataFrame) -> pa.Table:
        out = _add_hash_part(df[["node_a", "node_b"]].copy(),
                             ["node_a"], nparts)
        return _pd_to_arrow(out)

    def wedges_with_opener(df: pd.DataFrame) -> pa.Table:
        outs = []
        for u, g in df.groupby("node_a", sort=False):
            nb = np.sort(pd.unique(g["node_b"].to_numpy()))
            if len(nb) < 2:
                continue
            iu, ju = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({
                "node_a": nb[iu], "node_b": nb[ju],
                "opener": u, "is_edge": np.int64(0)}))
        if not outs:
            return _pd_to_arrow(pd.DataFrame({
                "node_a": pd.Series(dtype=object),
                "node_b": pd.Series(dtype=object),
                "opener": pd.Series(dtype=object),
                "is_edge": pd.Series(dtype="int64")}))
        return _pd_to_arrow(pd.concat(outs, ignore_index=True))

    wedges = edges.map_batches(wedge_rows, batch_format="pandas") \
        .groupby("_part").map_groups(wedges_with_opener,
                                     batch_format="pandas")
    tagged = edges.map_batches(
        lambda df: _pd_to_arrow(pd.DataFrame({
            "node_a": df["node_a"], "node_b": df["node_b"],
            "opener": "", "is_edge": np.int64(1)})),
        batch_format="pandas")

    def close_bucket(df: pd.DataFrame) -> pa.Table:
        key = df["node_a"].astype(str) + "\x1f" + df["node_b"].astype(str)
        has_edge = df.assign(_k=key).groupby("_k", sort=False)[
            "is_edge"].transform("max")
        closed = df[(df["is_edge"] == 0) & (has_edge.to_numpy() == 1)]
        if not len(closed):
            return _pd_to_arrow(pd.DataFrame(
                {"node": pd.Series(dtype=object),
                 "one": pd.Series(dtype="int64")}))
        nodes = np.concatenate([closed["opener"].to_numpy(object),
                                closed["node_a"].to_numpy(object),
                                closed["node_b"].to_numpy(object)])
        return _pd_to_arrow(pd.DataFrame(
            {"node": nodes, "one": np.ones(len(nodes), np.int64)}))

    def bucket2(df: pd.DataFrame) -> pa.Table:
        return _pd_to_arrow(_add_hash_part(
            df, ["node_a", "node_b"], nparts))

    tri_rows = wedges.union(tagged) \
        .map_batches(bucket2, batch_format="pandas") \
        .groupby("_part").map_groups(close_bucket,
                                     batch_format="pandas")
    tri = _bucketed_counts(tri_rows.map_batches(
        lambda df: _pd_to_arrow(df[["node"]]),
        batch_format="pandas"), ["node"], nparts, "tri").to_pandas()

    directed = edges.map_batches(
        lambda t: pa.table({"node": pa.array(
            t["node_a"].to_pylist() + t["node_b"].to_pylist(),
            pa.string())}), batch_format="pyarrow")
    deg = _bucketed_counts(directed, ["node"], nparts, "deg") \
        .to_pandas()

    out = deg.merge(tri, on="node", how="left")
    out["tri"] = out["tri"].fillna(0).astype(np.int64)
    out["deg"] = out["deg"].astype(np.int64)
    return out[["node", "tri", "deg"]] \
        .sort_values("node").reset_index(drop=True)
