"""Co-shuffle candidate generation — the LARGE-KB blocking path.

The broadcast path (:mod:`sbb_ned_ray.stages.candidates`) ships the whole
AliasIndex to every worker; that is right while the KB fits the object
store.  For a KB too large to broadcast (north_rule: 10¹²-document scale
against a Wikidata-size KB) blocking must be a **groupby-aggregate
shuffle on blocking keys** of mentions ∪ KB alias rows, with explicit
skew handling:

    KB prep (one-time "index build" job, all Dataset ops — at real scale
    its outputs are parquet artifacts):
        postings (part, eid, title, qid, proba, freq)
            [freq = entities per part via groupby(part).count —
             the stoplist table, reference index.py:640-645]
        bands    (key = "b:<LSH band>" and "p:<part>" identity, part)
        exact    (skey = normalized surface key, eid, title, qid, proba)
    runtime per input:
        mentions → distinct surfaces   [groupby]
        surface block rows (key, surface, query_part)
        J1: ⋈ bands on key             [hash join #1]
        dedupe (surface, query_part, part)  [groupby]
        J2: ⋈ postings on part         [hash join #2]
        ∪ exact-surface rows (J3: ⋈ exact on skey)
        groupby(surface).map_groups(probe caps + rank)
        attach to mentions with a SALTED surface join (hot-surface skew)

Exact-parity contract: produces the SAME candidate set/ranking as the
broadcast :class:`CandidateGenerator` (tests/test_blocking_shuffle.py).
Probe semantics replicated: frequency stoplist for short parts
(reference ``index.py:669-674``), ``dist < max_dist`` on anagram
vectors, ``search_k`` nearest parts with content-based (dist, part)
tie-break, exact-surface override.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.hashing import MinHasher, char_ngrams
from sbb_ned_ray.functions.normalization import (
    anagram_vector,
    angular_distance,
    filter_surface,
    normalize_chars,
)
from sbb_ned_ray.stages.candidates import rank_hits

SEARCH_K = 50   # probe_part default (index.py:652)


def _band_keys(part: str, cfg: PipelineConfig, hasher: MinHasher) -> list[int]:
    sig = hasher.signature(char_ngrams(part, cfg.ngram_size))
    return list(hasher.band_keys(sig, cfg.lsh_bands))


def kb_block_tables(kb: pa.Table, cfg: PipelineConfig,
                    num_partitions: int = 4) -> dict:
    """KB → blocking-side Datasets (materialized — these are the
    build-index artifacts; see module docstring)."""
    kb_ds = ray.data.from_arrow(kb.append_column(
        "eid", pa.array(np.arange(kb.num_rows, dtype=np.int64))))

    def alias_rows(t: pa.Table) -> pa.Table:
        """ONE pass per KB batch → combined rows tagged by ``kind``
        (0 = part posting, 1 = exact surface key) — the two tables are
        split afterward instead of normalizing every alias twice."""
        kinds, keys_col, eids, titles, qids, probas = [], [], [], [], [], []
        for eid, title, qid, proba, aliases in zip(
                t["eid"].to_pylist(), t["page_title"].to_pylist(),
                t["qid"].to_pylist(), t["proba"].to_pylist(),
                t["aliases"].to_pylist()):
            seen_parts = set()
            seen_keys = set()
            for alias in aliases:
                parts = filter_surface(normalize_chars(alias))
                if not parts:
                    continue
                key = " ".join(parts)
                if key not in seen_keys:
                    seen_keys.add(key)
                    kinds.append(1)
                    keys_col.append(key)
                    eids.append(eid)
                    titles.append(title)
                    qids.append(qid)
                    probas.append(float(proba))
                for p in parts:
                    if p in seen_parts:
                        continue
                    seen_parts.add(p)
                    kinds.append(0)
                    keys_col.append(p)
                    eids.append(eid)
                    titles.append(title)
                    qids.append(qid)
                    probas.append(float(proba))
        return pa.table({
            "kind": pa.array(kinds, pa.int8()),
            "key0": pa.array(keys_col, pa.string()),
            "eid": pa.array(eids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "qid": pa.array(qids, pa.string()),
            "proba": pa.array(probas, pa.float64()),
        })

    import pyarrow.compute as pc
    combined = kb_ds.map_batches(alias_rows,
                                 batch_format="pyarrow").materialize()

    def _split(kind: int, key_name: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["kind"], kind)).drop_columns(["kind"])
            return t.rename_columns(
                [key_name if c == "key0" else c for c in t.column_names])
        return fn

    postings0 = combined.map_batches(_split(0, "part"),
                                     batch_format="pyarrow")
    exact = combined.map_batches(_split(1, "skey"), batch_format="pyarrow")
    # frequency stoplist table: entities reachable per part
    freqs = postings0.groupby("part").count() \
        .map_batches(lambda t: t.rename_columns(["part", "freq"]),
                     batch_format="pyarrow")
    postings = postings0.join(freqs, join_type="inner",
                              num_partitions=num_partitions,
                              on=("part",)).materialize()

    hasher = MinHasher(num_perm=cfg.num_perm, seed=cfg.seed)

    def band_rows(t: pa.Table) -> pa.Table:
        ks, ps = [], []
        for p in t["part"].to_pylist():
            ks.append(f"p:{p}")          # identity key → exact part probe
            ps.append(p)
            for bk in _band_keys(p, cfg, hasher):
                ks.append(f"b:{bk}")     # LSH band key → fuzzy probe
                ps.append(p)
        return pa.table({"key": pa.array(ks, pa.string()),
                         "part": pa.array(ps, pa.string())})

    bands = freqs.map_batches(band_rows, batch_format="pyarrow") \
        .materialize()
    return {"postings": postings, "exact": exact, "bands": bands}


def _surface_rows(surfaces_ds, cfg: PipelineConfig):
    hasher = MinHasher(num_perm=cfg.num_perm, seed=cfg.seed)

    def block_rows(t: pa.Table) -> pa.Table:
        s_out, p_out, k_out = [], [], []
        for s in t["surface"].to_pylist():
            for p in filter_surface(normalize_chars(s)):
                s_out.append(s)
                p_out.append(p)
                k_out.append(f"p:{p}")
                for bk in _band_keys(p, cfg, hasher):
                    s_out.append(s)
                    p_out.append(p)
                    k_out.append(f"b:{bk}")
        return pa.table({"surface": pa.array(s_out, pa.string()),
                         "query_part": pa.array(p_out, pa.string()),
                         "key": pa.array(k_out, pa.string())})

    def key_rows(t: pa.Table) -> pa.Table:
        ss, ks = [], []
        for s in t["surface"].to_pylist():
            parts = filter_surface(normalize_chars(s))
            if parts:
                ss.append(s)
                ks.append(" ".join(parts))
        return pa.table({"surface": pa.array(ss, pa.string()),
                         "skey": pa.array(ks, pa.string())})

    return (surfaces_ds.map_batches(block_rows, batch_format="pyarrow"),
            surfaces_ds.map_batches(key_rows, batch_format="pyarrow"))


def _rank_surface_group(g: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """One surface's joined hit rows → ranked candidates (replicates
    probe_part caps + rank_hits)."""
    if g.empty:
        return pd.DataFrame(columns=["surface", "cand_entity", "dist",
                                     "match_uniqueness", "match_coverage",
                                     "proba", "rank", "candidate_title",
                                     "qid"])
    surface = g["surface"].iloc[0]
    exact_rows = g[g["is_exact"] == 1]
    exact_ids = frozenset(int(e) for e in exact_rows["eid"])
    part_rows = g[g["is_exact"] == 0]
    # ALL parts of the surface (zero-hit parts included — they seed the
    # exact-id entries and weight uniqueness/coverage identically to the
    # broadcast path), recomputed from the pure normalizer
    query_parts = tuple(filter_surface(normalize_chars(surface)))
    meta: dict[int, tuple[int, float, str, str]] = {}
    hits: list[tuple[int, str, float]] = []
    for qp, pg in part_rows.groupby("query_part", sort=False):
        cand = pg.drop_duplicates(subset=["part"])[["part", "freq"]]
        if len(qp) < cfg.min_part_len_for_freq:
            cand = cand[cand["freq"] <= cfg.max_frequency]
        if cand.empty:
            continue
        qv = anagram_vector(qp)
        dists = {p: angular_distance(qv, anagram_vector(p))
                 for p in cand["part"]}
        sel = [(d, p) for p, d in dists.items() if d < cfg.max_dist]
        sel.sort()
        sel = sel[:SEARCH_K]
        chosen = {p: d for d, p in sel}
        sub = pg[pg["part"].isin(chosen)]
        ent_min: dict[int, float] = {}
        for p, eid in zip(sub["part"], sub["eid"]):
            e = int(eid)
            d = chosen[p]
            if e not in ent_min or d < ent_min[e]:
                ent_min[e] = d
        for e, d in sorted(ent_min.items()):
            hits.append((e, qp, d))
    for r in part_rows.itertuples():
        meta[int(r.eid)] = (len(r.title), float(r.proba), r.title, r.qid)
    for r in exact_rows.itertuples():
        meta[int(r.eid)] = (len(r.title), float(r.proba), r.title, r.qid)
    ranked = rank_hits(hits, cfg, exact_ids, query_parts,
                       get_len=lambda e: meta[e][0],
                       get_proba=lambda e: meta[e][1])
    if not ranked:
        return pd.DataFrame(columns=["surface", "cand_entity", "dist",
                                     "match_uniqueness", "match_coverage",
                                     "proba", "rank", "candidate_title",
                                     "qid"])
    out = pd.DataFrame(ranked, columns=["cand_entity", "dist",
                                        "match_uniqueness",
                                        "match_coverage", "proba", "rank"])
    out.insert(0, "surface", surface)
    out["candidate_title"] = [meta[int(e)][2] for e in out["cand_entity"]]
    out["qid"] = [meta[int(e)][3] for e in out["cand_entity"]]
    out["rank"] = out["rank"].astype(np.int32)
    return out


_HIT_COLS = ["surface", "query_part", "part", "freq", "eid", "title",
             "qid", "proba", "is_exact"]


def ranked_candidates_via_shuffle(mentions_ds, kb: pa.Table,
                                  cfg: PipelineConfig | None = None,
                                  num_partitions: int = 4,
                                  kb_tables: dict | None = None):
    """Distinct mention surfaces → ranked candidates, via blocking-key
    joins + one groupby(surface) aggregation (see module docstring)."""
    cfg = cfg or PipelineConfig()
    tabs = kb_tables or kb_block_tables(kb, cfg, num_partitions)

    surfaces = mentions_ds.select_columns(["surface"]) \
        .groupby("surface").count() \
        .map_batches(lambda t: t.select(["surface"]), batch_format="pyarrow")
    block_rows, key_rows = _surface_rows(surfaces, cfg)

    # J1: fuzzy + exact-part probe in ONE key join, then dedupe the
    # (surface, query_part, part) matches (multiple shared bands)
    j1 = block_rows.join(tabs["bands"], join_type="inner",
                         num_partitions=num_partitions, on=("key",)) \
        .groupby(["surface", "query_part", "part"]).count() \
        .map_batches(lambda t: t.select(["surface", "query_part", "part"]),
                     batch_format="pyarrow").materialize()

    # J2: expand matched parts → entity hit rows (carries freq + metadata)
    hits = j1.join(tabs["postings"], join_type="inner",
                   num_partitions=num_partitions, on=("part",)) \
        .map_batches(lambda t: t.append_column(
            "is_exact",
            pa.array(np.zeros(t.num_rows, dtype=np.int8)))
            .select(_HIT_COLS), batch_format="pyarrow").materialize()

    # J3: exact full-surface-key rows
    j_sur = key_rows.join(tabs["exact"], join_type="inner",
                          num_partitions=num_partitions, on=("skey",)) \
        .map_batches(lambda t: pa.table({
            "surface": t["surface"],
            "query_part": pa.array([None] * t.num_rows, pa.string()),
            "part": pa.array([None] * t.num_rows, pa.string()),
            "freq": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "eid": t["eid"],
            "title": t["title"],
            "qid": t["qid"],
            "proba": t["proba"],
            "is_exact": pa.array(np.ones(t.num_rows, dtype=np.int8)),
        }), batch_format="pyarrow").materialize()

    from sbb_ned_ray.stages.dedup import bucketed_map_groups
    return bucketed_map_groups(
        hits.union(j_sur), "surface",
        lambda g: _rank_surface_group(g, cfg),
        nparts=max(16, num_partitions * 4), skip_singletons=False)


def attach_candidates_salted(mentions_ds, ranked_ds, salt: int = 8,
                             num_partitions: int = 4):
    """mentions ⋈ ranked candidates on surface, with SALTED keys.

    Surface popularity is Zipfian — one hot surface can be a large
    fraction of all mentions, which would land an entire join partition
    on one aggregator.  Each mention row gets ``salt_key = surface ⊕
    hash(mention_id) % salt``; each ranked row is REPLICATED across all
    ``salt`` shards.  The replicated side is the small one (≤
    max_candidates rows per surface), so the replication cost is bounded
    while the hot key splits ``salt`` ways.
    """
    import pyarrow.compute as pc

    def add_salt_m(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t["mention_id"].to_pylist()), index=False) \
            .to_numpy() % salt
        sk = pc.binary_join_element_wise(
            t["surface"], pa.array(h.astype("U"), pa.string()), "\x1e")
        return t.append_column("salt_key", sk)

    def replicate_r(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salt),
                       pa.int64())
        rep = t.take(idx)
        shard = np.tile(np.arange(salt), n).astype("U")
        sk = pc.binary_join_element_wise(
            rep["surface"], pa.array(shard, pa.string()), "\x1e")
        rep = rep.rename_columns(
            ["r_surface" if c == "surface" else c for c in rep.column_names])
        return rep.append_column("salt_key", sk)

    m = mentions_ds.map_batches(add_salt_m, batch_format="pyarrow")
    r = ranked_ds.map_batches(replicate_r, batch_format="pyarrow")
    joined = m.join(r, join_type="inner", num_partitions=num_partitions,
                    on=("salt_key",))
    return joined.map_batches(
        lambda t: t.drop_columns(
            [c for c in ("salt_key", "r_surface") if c in t.column_names]),
        batch_format="pyarrow")
