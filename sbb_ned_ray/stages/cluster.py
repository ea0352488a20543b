"""Stage: transitive entity clustering (union-find / connected components).

The reference links each mention to the KB independently; our north_rule
additionally requires transitive closure of matched pairs into entity
clusters (SURVEY.md §2.7 "Entity clustering (ours)").  Three layers
behind one API:

* :func:`driver_union_find` — exact union-find on the driver for edge
  sets known to be small (accepted links are ≤ one row per mention).
* :func:`label_propagation_components` — distributed min-label
  propagation for web-scale edge sets.  Fully distributed: each
  iteration is a co-shuffle hash join ``edges ⋈ labels`` on node id
  plus one ``groupby(node)`` aggregation (the "large-graph" connected
  components pattern; cf. Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14).  The only thing that ever reaches
  the driver is the per-iteration changed-label COUNT (one scalar) —
  the label table itself stays in the object store.
* :func:`pairs_to_clusters` — pair Dataset → (node, cluster_id) frame,
  choosing driver union-find below ``driver_pair_limit`` pairs and the
  distributed propagation above it (the dedup paths' guard against
  collecting an unbounded candidate-pair list on a duplicate-heavy
  corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min


def driver_union_find(edges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over (a, b) edges → node → component representative
    (lexicographically smallest member, deterministic)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the lexicographically smaller representative
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {node: find(node) for node in parent}


def label_propagation_components(edges_ds: ray.data.Dataset,
                                 src: str = "src", dst: str = "dst",
                                 max_iters: int = 12,
                                 num_partitions: int = 16
                                 ) -> ray.data.Dataset:
    """Distributed connected components over an edge Dataset.

    Returns Dataset(node, component) covering every node that appears
    in an edge; ``component`` is the minimum node id of the component.

    Per iteration (all Dataset ops, no driver-side label table):

    1. Co-shuffle join ``sym ⋈ labels`` on the edge source: both sides
       are unioned into tagged rows, hash-bucketed into
       ``num_partitions`` coarse partitions on the join key, and merged
       with one vectorized pandas merge per bucket — each edge proposes
       its source's current label to its target.  (A bucketed groupby
       stands in for ``Dataset.join`` deliberately: the hash-join
       operator chokes on the empty-schema partition blocks an upstream
       aggregate can emit, and the bucket merge amortizes per-group
       overhead the same way the dedup stages do.)
    2. Union the proposals with the current labels (old rows carry
       their label duplicated into an ``old`` column; proposal rows
       have ``old = null``) and ``groupby(node)`` with two ``Min``
       aggregates → the new label AND the label it replaced, in ONE
       shuffle.
    3. ``sum(new < old)`` → changed-label count (a single scalar to the
       driver); zero ⇒ converged.

    Converges in O(diameter) iterations; ``max_iters`` bounds
    pathological chains (web-entity graphs are shallow: star-shaped
    around canonical entities).
    """
    import pyarrow.compute as pc

    def symmetrize(t: pa.Table) -> pa.Table:
        a, b = t[src].combine_chunks(), t[dst].combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    # bound the block count once up front: the per-iteration shuffles pay
    # per-block overhead, and a many-tiny-block input (e.g. from_items)
    # would multiply it 12×
    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(t["u"], t["v"])
        return pa.table({"node": t["u"], "label": lab})

    labels = sym.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").min("label") \
        .map_batches(lambda t: t.rename_columns(["node", "label"]),
                     batch_format="pyarrow").materialize()

    # tagged rows for the co-shuffle join: edge rows key on u and carry
    # v; label rows key on node and carry the label (null-padded so both
    # sides share one schema)
    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["u"], "v": t["v"],
                         "label": pa.nulls(t.num_rows, t["u"].type)})

    def label_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["node"],
                         "v": pa.nulls(t.num_rows, t["node"].type),
                         "label": t["label"]})

    def add_part(t: pa.Table) -> pa.Table:
        # hash in pandas but append to the ARROW table: a whole-table
        # pandas round-trip would coerce the null-padded int columns to
        # float64 on one side of the union and diverge the schemas
        h = (pd.util.hash_pandas_object(t["key"].to_pandas(), index=False)
             .to_numpy() % num_partitions).astype("int32")
        return t.append_column("_part", pa.array(h, pa.int32()))

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["label"].isna(), ["key", "v"]]
        l = df.loc[df["v"].isna(), ["key", "label"]]
        m = e.merge(l, on="key")
        # cast back to the key dtype: pandas represents the nullable int
        # columns as float64, which would otherwise leak out as floats
        kd = df["key"].dtype
        return pd.DataFrame({"node": m["v"].to_numpy(),
                             "label": m["label"].to_numpy()}) \
            .astype({"node": kd, "label": kd})

    def proposals(t: pa.Table) -> pa.Table:
        # old = null so the Min("old") aggregate ignores proposal rows
        return pa.table({"node": t["node"], "label": t["label"],
                         "old": pa.nulls(t.num_rows, t["label"].type)})

    def carry(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "label": t["label"],
                         "old": t["label"]})

    def changed_partial(t: pa.Table) -> pa.Table:
        chg = pc.sum(pc.cast(pc.less(t["label"], t["old"]),
                             pa.int64())).as_py() or 0
        return pa.table({"chg": pa.array([chg], pa.int64())})

    edge_tagged = sym.map_batches(edge_rows, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow").materialize()
    for _ in range(max_iters):
        tagged = edge_tagged.union(
            labels.map_batches(label_rows, batch_format="pyarrow")
            .map_batches(add_part, batch_format="pyarrow"))
        cand = tagged.groupby("_part") \
            .map_groups(merge_bucket, batch_format="pandas") \
            .map_batches(proposals, batch_format="pyarrow")
        merged = cand.union(
            labels.map_batches(carry, batch_format="pyarrow"))
        agg = merged.groupby("node").aggregate(
            Min("label", alias_name="label"),
            Min("old", alias_name="old")).materialize()
        changed = agg.map_batches(changed_partial,
                                  batch_format="pyarrow").sum("chg")
        labels = agg.map_batches(
            lambda t: t.select(["node", "label"]), batch_format="pyarrow")
        if not changed:
            break
        # re-bound the block count: the hash aggregate emits roughly one
        # block per input block, which would double every iteration and
        # blow up per-iteration scheduling overhead
        labels = labels.repartition(num_partitions).materialize()
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")


def alternating_components(edges_ds: ray.data.Dataset,
                           src: str = "src", dst: str = "dst",
                           max_rounds: int = 50,
                           num_partitions: int = 16
                           ) -> ray.data.Dataset:
    """Distributed connected components via the ALTERNATING
    large-star / small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14).

    Returns Dataset(node, component) covering every node that appears
    in an edge; ``component`` is the minimum node id of the component —
    the same contract as :func:`label_propagation_components`.

    Why a second algorithm: min-label propagation needs O(diameter)
    iterations, which is fine for the star-shaped web-entity graphs the
    NED pipeline emits but degenerates on CHAIN-shaped duplicate graphs
    (a → a' → a'' … from incremental near-dup drift), where the
    diameter is the chain length.  The alternating algorithm converges
    in O(log² n) rounds INDEPENDENT of diameter by rewriting the edge
    set itself toward a star forest:

    * large-star(u): every neighbor v > u is re-pointed at
      m = min(Γ(u) ∪ {u});
    * small-star(u): u and every neighbor v ≤ u are re-pointed at the
      minimum of that set.

    Both steps are ONE bucketed co-shuffle groupby each (hash-bucket on
    the grouping endpoint, whole-bucket vectorized pandas transform —
    duplicates of an edge always share their grouping endpoint, so the
    in-bucket ``drop_duplicates`` is a GLOBAL dedup with no extra
    exchange).  Per round the driver sees one (count, hash-sum)
    checksum scalar; the round output provably equals the input exactly
    at the star-forest fixed point, so a stable checksum terminates the
    loop.  The edge table itself never leaves the object store.
    """
    import pyarrow.compute as pc

    # canonical (child > parent) orientation; self-loops carry no
    # connectivity (they only assert node existence, captured by the
    # node table below)
    def canon(t: pa.Table) -> pa.Table:
        child = pc.max_element_wise(t[src], t[dst])
        parent = pc.min_element_wise(t[src], t[dst])
        keep = pc.invert(pc.equal(child, parent))
        return pa.table({"child": child.filter(keep),
                         "parent": parent.filter(keep)})

    def node_rows(t: pa.Table) -> pa.Table:
        a, b = t[src].combine_chunks(), t[dst].combine_chunks()
        n = pa.concat_arrays([a, b])
        return pa.table({"node": n, "label": n})

    def add_part(col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_part"] = (pd.util.hash_pandas_object(df[col], index=False)
                           .to_numpy() % num_partitions).astype("int32")
            return df
        return fn

    def large_star(df: pd.DataFrame) -> pd.DataFrame:
        # input rows (key, v): both directions of each canonical edge,
        # grouped by key's hash bucket → in-bucket dedup is global
        df = df.drop(columns=["_part"]).drop_duplicates()
        if not len(df):
            return pd.DataFrame({"child": df["key"], "parent": df["v"]})
        mn = df.groupby("key", sort=False)["v"].transform("min")
        m = mn.where(mn < df["key"], df["key"])
        mask = (df["v"] > df["key"]).to_numpy()
        out = pd.DataFrame({"child": df["v"].to_numpy()[mask],
                            "parent": m.to_numpy()[mask]})
        return out.drop_duplicates()

    def small_star(df: pd.DataFrame) -> pd.DataFrame:
        # input rows (child, parent) grouped by child's hash bucket;
        # every parent < child, m = min(parents of child)
        df = df.drop(columns=["_part"]).drop_duplicates()
        if not len(df):
            return df.rename(columns={})[["child", "parent"]]
        m = df.groupby("child", sort=False)["parent"].transform("min")
        a = pd.DataFrame({"child": df["child"].to_numpy(),
                          "parent": m.to_numpy()}).drop_duplicates()
        keep = (df["parent"].to_numpy() != m.to_numpy())
        b = pd.DataFrame({"child": df["parent"].to_numpy()[keep],
                          "parent": m.to_numpy()[keep]})
        return pd.concat([a, b], ignore_index=True).drop_duplicates()

    def checksum_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["child", "parent"]],
                                       index=False).to_numpy()
        # mod 2**50 keeps the Arrow int64 sum of ≤ num_partitions
        # partials overflow-free while leaving a collision space far
        # beyond non-adversarial reach
        hsum = int(h.sum(dtype=np.uint64) % np.uint64(2 ** 50))
        return pd.DataFrame({"cnt": [len(df)], "hsum": [hsum]})

    def symmetrize(t: pa.Table) -> pa.Table:
        c = t["child"].combine_chunks()
        p = t["parent"].combine_chunks()
        return pa.table({"key": pa.concat_arrays([c, p]),
                         "v": pa.concat_arrays([p, c])})

    nodes = edges_ds.map_batches(node_rows, batch_format="pyarrow") \
        .materialize()
    edges = edges_ds.map_batches(canon, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    prev_sig = None
    for _ in range(max_rounds):
        if edges.count() == 0:     # all self-loops / empty input
            break
        large = edges.map_batches(symmetrize, batch_format="pyarrow") \
            .map_batches(add_part("key"), batch_format="pandas") \
            .groupby("_part").map_groups(large_star, batch_format="pandas")
        edges = large.map_batches(add_part("child"), batch_format="pandas") \
            .groupby("_part").map_groups(small_star, batch_format="pandas") \
            .materialize()
        sums = edges.map_batches(checksum_partial, batch_format="pandas") \
            .sum(["cnt", "hsum"])
        sig = (sums["sum(cnt)"], sums["sum(hsum)"]) if sums else (0, 0)
        if sig == prev_sig:
            break
        prev_sig = sig
    # final star forest → labels; union with self rows so roots and
    # self-loop-only nodes label themselves (Min picks the root where
    # a child row exists: parent < child always)
    def child_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["child"], "label": t["parent"]})

    labels = edges.map_batches(child_labels, batch_format="pyarrow") \
        .union(nodes) \
        .groupby("node").min("label") \
        .map_batches(lambda t: t.rename_columns(["node", "component"]),
                     batch_format="pyarrow")
    return labels


def _pivot_rank(nodes: pd.Series, seed: int) -> np.ndarray:
    """Deterministic pseudo-random pivot rank per node (uint64) —
    the seeded permutation of the pivot algorithm.  Identical in the
    distributed rounds, the driver reference, and across processes
    (siphash with a fixed seed-derived key)."""
    return pd.util.hash_pandas_object(
        nodes, index=False, hash_key=f"{seed & 0xffffffff:016d}"
    ).to_numpy()


def driver_pivot_clusters(edges: list[tuple], seed: int = 17) -> dict:
    """Exact sequential reference for :func:`pivot_correlation_clusters`
    (Ailon-Charikar-Newman pivot, KDD'14 parallel analysis by
    Chierichetti-Dalvi-Kumar): scan nodes in seeded-rank order; an
    unclustered node becomes a pivot and claims its unclustered
    neighbors.  Used by tests/self-check queries as the ground truth
    the distributed rounds must reproduce EXACTLY (same ranks)."""
    nodes = sorted({x for e in edges for x in e})
    if not nodes:
        return {}
    rk = _pivot_rank(pd.Series(nodes), seed)
    order = sorted(range(len(nodes)), key=lambda i: (rk[i], nodes[i]))
    adj: dict = {n: set() for n in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cluster: dict = {}
    for i in order:
        u = nodes[i]
        if u in cluster:
            continue
        cluster[u] = u
        for v in adj[u]:
            if v not in cluster:
                cluster[v] = u
    return cluster


def pivot_correlation_clusters(pairs_ds: ray.data.Dataset,
                               id_a: str = "id_a", id_b: str = "id_b",
                               node_col: str = "node",
                               cluster_col: str = "cluster_id",
                               seed: int = 17,
                               max_rounds: int = 60,
                               num_partitions: int = 16
                               ) -> ray.data.Dataset:
    """Distributed PIVOT correlation clustering over a positive-pair
    Dataset (Ailon-Charikar-Newman pivot — the 3-approximation for
    correlation clustering; parallel-round analysis: Chierichetti,
    Dalvi & Kumar, "Correlation Clustering in MapReduce", KDD'14).

    Transitive closure (connected components) merges everything a
    chain of weak matches touches; the pivot algorithm instead cuts
    non-adjacent nodes apart: every output cluster is a STAR in the
    input pair graph (each member is directly adjacent to its pivot),
    so one spurious bridge pair cannot glue two big entities together.
    This is the conservative clustering an ER pipeline wants when
    pair precision matters more than recall.

    Exact semantics (deterministic in ``seed``): nodes are scanned in
    seeded-rank order; an unclustered node becomes a pivot and claims
    its unclustered neighbors — :func:`driver_pivot_clusters` is the
    sequential reference, and the distributed rounds reproduce it
    EXACTLY via the lexicographically-first-MIS recurrence
    (pivot(u) ⇔ no lower-rank neighbor is a pivot), resolved
    level-by-level: each round decides every node whose lower-rank
    neighbors are all decided, O(log n) rounds w.h.p.  Per round: one
    bucketed co-shuffle join (neighbor statuses onto edges) + one
    bucketed groupby (combine per node); the driver sees only the
    undecided-count scalar.  Final assignment: one more co-shuffle
    picking each non-pivot's minimum-rank pivot neighbor.
    """
    import pyarrow.compute as pc

    STATUS_UNDEC, STATUS_PIVOT, STATUS_NON = 0, 1, 2

    def hash_part(s: pd.Series) -> np.ndarray:
        return (pd.util.hash_pandas_object(s, index=False).to_numpy()
                % num_partitions).astype("int32")

    # oriented edge rows: (hi, lo) with rank(lo) < rank(hi) — only
    # lower-rank neighbors ever influence a node's pivot status
    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[id_a], df[id_b]
        keep = (a != b).to_numpy()
        a, b = a[keep], b[keep]
        ra, rb = _pivot_rank(a, seed), _pivot_rank(b, seed)
        a_lo = (ra < rb) | ((ra == rb) & (a.to_numpy() < b.to_numpy()))
        return pd.DataFrame({
            "hi": np.where(a_lo, b.to_numpy(), a.to_numpy()),
            "lo": np.where(a_lo, a.to_numpy(), b.to_numpy())})

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df[id_a], df[id_b]], ignore_index=True)
        return pd.DataFrame({"node": n}).drop_duplicates()

    edges = pairs_ds.map_batches(orient, batch_format="pandas") \
        .repartition(num_partitions).materialize()
    status = pairs_ds.map_batches(node_rows, batch_format="pandas") \
        .map_batches(lambda df: df.assign(
            _part=hash_part(df["node"])), batch_format="pandas") \
        .groupby("_part").map_groups(
            lambda df: df.drop(columns=["_part"]).drop_duplicates()
            .assign(st=np.int32(STATUS_UNDEC)),
            batch_format="pandas") \
        .materialize()

    # tagged co-shuffle A: edge rows keyed on lo pick up st(lo)
    def edge_by_lo(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["lo"], "hi": df["hi"]})
        out["st"] = np.int32(-1)
        out["_part"] = hash_part(out["key"])
        return out

    def status_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["node"],
                            "hi": df["node"],   # self-marker, unused
                            "st": df["st"].astype("int32")})
        out["_part"] = hash_part(out["key"])
        return out

    def attach_lo_status(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["st"] < 0][["key", "hi"]]
        s = df[df["st"] >= 0][["key", "st"]]
        m = e.merge(s, on="key")
        return pd.DataFrame({"hi": m["hi"], "st_lo": m["st"]
                             .astype("int32")})

    # tagged co-shuffle B: per-hi combine neighbor statuses with own
    def neigh_by_hi(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["hi"],
                            "st_lo": df["st_lo"].astype("int32")})
        out["own"] = np.int32(-1)
        out["_part"] = hash_part(out["key"])
        return out

    def own_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["node"],
                            "st_lo": np.int32(-1),
                            "own": df["st"].astype("int32")})
        out["_part"] = hash_part(out["key"])
        return out

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"])
        own = df[df["own"] >= 0][["key", "own"]]
        nb = df[df["own"] < 0]
        flags = pd.DataFrame({
            "key": nb["key"],
            "isp": (nb["st_lo"] == STATUS_PIVOT).astype("int8"),
            "isn": (nb["st_lo"] == STATUS_NON).astype("int8")})
        agg = flags.groupby("key", sort=False).agg(
            any_pivot=("isp", "max"), all_non=("isn", "min"))
        agg = agg.astype(bool)
        m = own.merge(agg, left_on="key", right_index=True, how="left")
        # no lower-rank neighbors at all → immediate pivot
        ap = m["any_pivot"].to_numpy()
        an = m["all_non"].to_numpy()
        any_pivot = np.where(pd.isna(ap), False, ap).astype(bool)
        all_non = np.where(pd.isna(an), True, an).astype(bool)
        undec = m["own"].to_numpy() == STATUS_UNDEC
        new = m["own"].to_numpy(dtype="int32").copy()
        new[undec & any_pivot] = STATUS_NON
        new[undec & ~any_pivot & all_non] = STATUS_PIVOT
        return pd.DataFrame({"node": m["key"],
                             "st": new.astype("int32")})

    edge_lo_tagged = edges.map_batches(edge_by_lo,
                                       batch_format="pandas") \
        .materialize()
    for _ in range(max_rounds):
        n_undec = status.map_batches(
            lambda df: pd.DataFrame(
                {"n": [int((df["st"] == STATUS_UNDEC).sum())]}),
            batch_format="pandas").sum("n")
        if not n_undec:
            break
        with_st = edge_lo_tagged.union(
            status.map_batches(status_rows, batch_format="pandas")) \
            .groupby("_part") \
            .map_groups(attach_lo_status, batch_format="pandas")
        status = with_st.map_batches(neigh_by_hi,
                                     batch_format="pandas") \
            .union(status.map_batches(own_rows, batch_format="pandas")) \
            .groupby("_part") \
            .map_groups(decide, batch_format="pandas") \
            .repartition(num_partitions).materialize()

    # assignment: non-pivots join the min-(rank, id) PIVOT among their
    # lower-rank neighbors; pivots (and self-loop-only nodes) label
    # themselves.  Two exchanges: pivot statuses onto the lo-keyed
    # edges, then the candidate rows re-bucketed on HI so the min-rank
    # pick sees ALL of a node's pivot neighbors in one place.
    def pivot_cands(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["st"] < 0][["key", "hi"]]
        s = df[df["st"] >= 0][["key", "st"]]
        m = e.merge(s[s["st"] == STATUS_PIVOT], on="key")
        return pd.DataFrame({"node": m["hi"], "cand": m["key"]})

    cand_ds = edge_lo_tagged.union(
        status.map_batches(status_rows, batch_format="pandas")) \
        .groupby("_part") \
        .map_groups(pivot_cands, batch_format="pandas")

    def cand_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["node"], "cand": df["cand"]})
        out["st"] = np.int32(-1)
        out["_part"] = hash_part(out["node"])
        return out

    def st_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["node"],
                            "cand": df["node"],
                            "st": df["st"].astype("int32")})
        out["_part"] = hash_part(out["node"])
        return out

    def self_or_cand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"])
        cand = df[df["st"] < 0][["node", "cand"]]
        if len(cand):
            rk = _pivot_rank(cand["cand"], seed)
            cand = cand.assign(_rk=rk) \
                .sort_values(["node", "_rk", "cand"]) \
                .groupby("node", sort=False).head(1)[["node", "cand"]]
        st = df[df["st"] >= 0][["node", "st"]]
        m = st.merge(cand, on="node", how="left")
        is_pivot = m["st"].to_numpy() == STATUS_PIVOT
        # cast back to the node dtype: the left merge floats an int64
        # cand column through the pivot rows' NaNs
        out = m["cand"].where(~is_pivot, m["node"]) \
            .astype(m["node"].dtype)
        return pd.DataFrame({node_col: m["node"], cluster_col: out})

    return cand_ds.map_batches(cand_rows, batch_format="pandas") \
        .union(status.map_batches(st_rows, batch_format="pandas")) \
        .groupby("_part") \
        .map_groups(self_or_cand, batch_format="pandas")


def pairs_to_clusters(pairs_ds: ray.data.Dataset,
                      id_a: str = "id_a", id_b: str = "id_b",
                      driver_pair_limit: int = 200_000) -> pd.DataFrame:
    """Candidate-pair Dataset → (node, cluster_id) DataFrame.

    ≤ ``driver_pair_limit`` pairs: collect + exact driver union-find
    (the common case — near-dup pairs are sparse on a clean corpus).
    Above it: distributed :func:`label_propagation_components`, so a
    duplicate-heavy crawl (30%+ near-dup rate) cannot OOM the driver
    with its pair list; only the final (node, component) table — one
    row per *duplicated* doc — is collected.
    """
    # materialize ONCE: a Dataset re-executes its whole upstream DAG on
    # every consumption, so count() followed by to_pandas()/label-prop
    # would run the (expensive) candidate-pair pipeline twice.  The pair
    # set is narrow — two id columns — so pinning it is cheap even when
    # the pair COUNT is large.
    empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "cluster_id": pd.Series(dtype="int64")})
    ids = pairs_ds.select_columns([id_a, id_b]).materialize()
    n_pairs = ids.count()
    if n_pairs == 0:
        return empty
    if n_pairs <= driver_pair_limit:
        df = ids.to_pandas().drop_duplicates()
        comp = driver_union_find(list(zip(df[id_a], df[id_b])))
        if not comp:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "cluster_id": pd.Series(dtype="int64")})
        out = pd.DataFrame({"node": list(comp.keys()),
                            "cluster_id": list(comp.values())})
    else:
        comps = label_propagation_components(ids, src=id_a, dst=id_b)
        out = comps.to_pandas().rename(columns={"component": "cluster_id"})
    return out.sort_values("node").reset_index(drop=True)


def pairs_to_clusters_ds(pairs_ds: ray.data.Dataset,
                         id_a: str = "id_a", id_b: str = "id_b",
                         node_col: str = "node",
                         cluster_col: str = "cluster_id",
                         num_partitions: int = 16,
                         algorithm: str = "labelprop") -> ray.data.Dataset:
    """Candidate-pair Dataset → ``(node_col, cluster_col)`` Dataset —
    the 100-TB output contract: the cluster assignment NEVER lands on
    the driver (consume it with ``write_parquet`` / ``iter_batches``).
    Fully distributed; :func:`pairs_to_clusters` is the
    driver-DataFrame convenience wrapper with a small-input fast path.

    ``algorithm``: ``"labelprop"`` (default — O(diameter) iterations,
    right for the star-shaped graphs near-dup pipelines emit) or
    ``"altstar"`` (:func:`alternating_components` — O(log² n) rounds,
    the safe choice when the duplicate graph may contain long chains,
    e.g. incremental near-dup drift)."""
    ids = pairs_ds.select_columns([id_a, id_b]).materialize()
    if ids.count() == 0:
        id_type = pa.int64()
        try:
            id_type = ids.schema().base_schema.field(id_a).type
        except Exception:
            pass
        return ray.data.from_arrow(pa.table({
            node_col: pa.array([], id_type),
            cluster_col: pa.array([], id_type)}))
    if algorithm == "altstar":
        comps = alternating_components(ids, src=id_a, dst=id_b,
                                       num_partitions=num_partitions)
    elif algorithm == "labelprop":
        comps = label_propagation_components(ids, src=id_a, dst=id_b,
                                             num_partitions=num_partitions)
    else:
        raise ValueError(f"unknown algorithm {algorithm!r} "
                         "(expected 'labelprop' or 'altstar')")
    return comps.map_batches(
        lambda t: t.rename_columns([node_col, cluster_col]),
        batch_format="pyarrow")


def cluster_links(links_df: pd.DataFrame) -> pd.DataFrame:
    """mention→qid links (driver-side frame) → mention clusters via
    union-find over the bipartite mention↔qid edges.

    Fast path: with top-1 links every mention has degree 1, so a
    component is exactly one qid's mention set and the union-find
    representative (lexicographically smallest member; ``m:`` sorts
    before ``q:``) is the minimum mention_key of that qid — a
    vectorized groupby-min.  The general union-find handles multi-link
    inputs; equality of the two paths is unit-tested.
    """
    links_df = links_df.copy()
    if links_df["mention_key"].is_unique:
        reps = links_df.groupby("qid")["mention_key"].transform("min")
        links_df["cluster_id"] = "m:" + reps
        return links_df
    edges = [(f"m:{k}", f"q:{q}")
             for k, q in zip(links_df["mention_key"], links_df["qid"])]
    comp = driver_union_find(edges)
    links_df["cluster_id"] = [comp[f"m:{k}"] for k in links_df["mention_key"]]
    return links_df


# ---------------------------------------------------------------------------
# Cluster-quality evaluation (B-cubed, adjusted Rand) from a
# distributed contingency table
# ---------------------------------------------------------------------------
#
# The standard extrinsic clustering metrics for entity resolution
# (Amigó et al. 2009 recommend B³; Hubert & Arabie 1985 ARI).  The only
# distributed work is building the pred × gold contingency CELL table —
# everything after it is vocabulary-sized: both metrics are pure
# functions of the cell counts, so the corpus-sized assignment never
# reaches the driver.


def contingency_cells(pred: ray.data.Dataset, gold: ray.data.Dataset,
                      key_col: str = "key", label_col: str = "label",
                      nparts: int = 32) -> ray.data.Dataset:
    """Inner-join two (key, label) assignments on ``key`` and count
    (pred_label, gold_label) cells — tag-union co-shuffle on an int32
    hash bucket (the int32-keyed exchange idiom from
    :mod:`sbb_ned_ray.stages.graph`: per-bucket vectorized pandas,
    never a string-key Dataset groupby), partial cell counts per
    bucket, one narrow merge.  Returns Dataset(pred, gold, n)."""
    import numpy as np

    from sbb_ned_ray.stages.graph import (_add_hash_part, _bucketed_counts,
                                          _pd_to_arrow)

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pa.Table:
            out = pd.DataFrame({"k": df[key_col].astype(str),
                                "lab": df[label_col].astype(str),
                                "side": np.full(len(df), side, np.int8)})
            return _pd_to_arrow(_add_hash_part(out, ["k"], nparts))
        return fn

    def cells_in_bucket(df: pd.DataFrame) -> pa.Table:
        p = df[df["side"] == 0]
        g = df[df["side"] == 1]
        m = p[["k", "lab"]].merge(g[["k", "lab"]], on="k",
                                  suffixes=("_p", "_g"))
        c = m.groupby(["lab_p", "lab_g"], sort=False).size() \
            .reset_index(name="n")
        return _pd_to_arrow(pd.DataFrame({"pred": c["lab_p"],
                                          "gold": c["lab_g"],
                                          "n": c["n"].astype(np.int64)}))

    partial = pred.map_batches(tag(0), batch_format="pandas") \
        .union(gold.map_batches(tag(1), batch_format="pandas")) \
        .groupby("_part").map_groups(cells_in_bucket,
                                     batch_format="pandas")
    return _bucketed_counts(partial, ["pred", "gold"], nparts, "n",
                            weight_col="n")


def bcubed_from_cells(cells: pd.DataFrame, pred_col: str = "pred",
                      gold_col: str = "gold", n_col: str = "n") -> dict:
    """B-cubed precision/recall/F1 from contingency cells: per-item
    precision |C∩G|/|C| summed over items is Σ_cells n²/|pred cluster|
    (recall symmetric with gold sizes)."""
    import numpy as np
    n = cells[n_col].to_numpy(np.float64)
    total = n.sum()
    if total == 0:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    psz = cells.groupby(pred_col)[n_col].transform("sum") \
        .to_numpy(np.float64)
    gsz = cells.groupby(gold_col)[n_col].transform("sum") \
        .to_numpy(np.float64)
    prec = float((n * n / psz).sum() / total)
    rec = float((n * n / gsz).sum() / total)
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1}


def adjusted_rand_from_cells(cells: pd.DataFrame, pred_col: str = "pred",
                             gold_col: str = "gold",
                             n_col: str = "n") -> float:
    """Adjusted Rand index from contingency cells (Hubert & Arabie
    1985).  Degenerate clusterings (expected == max index) return 1.0
    when the index attains the maximum, else 0.0."""
    import numpy as np

    def comb2(x):
        return x * (x - 1.0) / 2.0

    n = cells[n_col].to_numpy(np.float64)
    total = n.sum()
    index = comb2(n).sum()
    a = comb2(cells.groupby(pred_col)[n_col].sum()
              .to_numpy(np.float64)).sum()
    b = comb2(cells.groupby(gold_col)[n_col].sum()
              .to_numpy(np.float64)).sum()
    npairs = comb2(total)
    if npairs == 0:
        return 1.0
    expected = a * b / npairs
    max_index = (a + b) / 2.0
    if max_index == expected:
        return 1.0 if index == expected else 0.0
    return float((index - expected) / (max_index - expected))
