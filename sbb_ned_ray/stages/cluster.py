"""Stage: transitive entity clustering (union-find / connected components).

The reference links each mention to the KB independently; our north_rule
additionally requires transitive closure of matched pairs into entity
clusters (SURVEY.md §2.7 "Entity clustering (ours)").  Two
implementations behind one API:

* :func:`driver_union_find` — exact union-find on the driver for edge
  sets known to be small (accepted links are ≤ one row per mention).
* :func:`label_propagation_components` — distributed min-label
  propagation for web-scale edge sets: iterate
  ``edges ⋈ labels → groupby(node).min(label)`` until no label changes;
  each iteration is one shuffle keyed on node id (the "large-graph"
  connected-components pattern; cf. Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


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
                                 max_iters: int = 12) -> ray.data.Dataset:
    """Distributed connected components over an edge Dataset.

    Returns Dataset(node, component).  Each iteration: symmetrize edges,
    attach current labels, propagate min label across each edge, then
    ``groupby(node).min(label)``.  Converges in O(diameter) iterations;
    ``max_iters`` bounds pathological chains (web-entity graphs are
    shallow: star-shaped around canonical entities).
    """
    def symmetrize(t: pa.Table) -> pa.Table:
        a, b = t[src], t[dst]
        return pa.table({"u": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                         "v": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])})

    sym = edges_ds.map_batches(symmetrize, batch_format="pyarrow")
    # initial label of a node = min neighbour ∪ self
    def init_labels(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lab = pc.min_element_wise(t["u"], t["v"])
        return pa.table({"node": t["u"], "label": lab})

    labels = sym.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").min("label") \
        .map_batches(lambda t: t.rename_columns(["node", "label"]),
                     batch_format="pyarrow")
    labels = labels.materialize()

    sym_mat = sym.materialize()
    for _ in range(max_iters):
        lab_df = labels.to_pandas()
        lab_map = dict(zip(lab_df["node"], lab_df["label"]))
        # NOTE: for truly huge graphs, replace this broadcast-map join with
        # a co-shuffle join on node; the broadcast is right while the label
        # table (≈ number of linked mentions) fits the object store.
        import ray
        lab_ref = ray.put(lab_map)

        class Propagate:
            def __init__(self, ref):
                self.m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

            def __call__(self, t: pa.Table) -> pa.Table:
                us = t["u"].to_pylist()
                vs = t["v"].to_pylist()
                m = self.m
                lab = [min(m.get(u, u), m.get(v, v)) for u, v in zip(us, vs)]
                return pa.table({"node": pa.array(us), "label": pa.array(lab)})

        new_labels = sym_mat.map_batches(
            Propagate, fn_constructor_args=(lab_ref,),
            batch_format="pyarrow", concurrency=2) \
            .groupby("node").min("label") \
            .map_batches(lambda t: t.rename_columns(["node", "label"]),
                         batch_format="pyarrow").materialize()
        new_df = new_labels.to_pandas()
        new_map = dict(zip(new_df["node"], new_df["label"]))
        if new_map == lab_map:
            labels = new_labels
            break
        labels = new_labels
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
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
