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


def _probe_key_arrays(parts: list, cfg: PipelineConfig,
                      hasher: MinHasher) -> tuple:
    """Distinct parts → (key strings, source row index) emitting one
    identity key (``p:<part>``) followed by ``cfg.lsh_bands`` band keys
    (``b:<key>``) per part — the probe layout shared by the KB band
    table and the mention-side probe keys.  The per-part MinHash stays
    per-string (it hashes char n-grams); everything else — the key
    strings, the repeat gather — is one vectorized pass instead of
    per-row list appends (the factorize-explode treatment of
    :func:`_alias_rows_vectorized`; emission order is bit-equal to the
    row loop, parity-tested)."""
    n = len(parts)
    B = cfg.lsh_bands
    if n == 0:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    bks = np.fromiter(
        (bk for p in parts for bk in _band_keys(p, cfg, hasher)),
        dtype=np.uint64, count=n * B)
    keys = np.empty(n * (B + 1), dtype=object)
    ident = np.zeros(n * (B + 1), dtype=bool)
    ident[:: B + 1] = True
    keys[ident] = ("p:" + pd.Series(parts, dtype=object)) \
        .to_numpy(dtype=object)
    keys[~ident] = ("b:" + pd.Series(bks).astype(str)) \
        .to_numpy(dtype=object)
    idx = np.repeat(np.arange(n, dtype=np.int64), B + 1)
    return keys, idx


def _alias_rows_rowloop(t: pa.Table, with_meta: bool,
                        meta_cols: list[str]) -> pa.Table:
    """Row-loop reference for :func:`_alias_rows_vectorized` — kept for
    the bit-exactness parity test (tests/test_blocking_shuffle.py), not
    called in the pipeline."""
    kinds, keys_col, eids, tlens, probas = [], [], [], [], []
    src_rows: list[int] = []   # row in t, for metadata gather
    for row_no, (eid, title, proba, aliases) in enumerate(zip(
            t["eid"].to_pylist(), t["page_title"].to_pylist(),
            t["proba"].to_pylist(), t["aliases"].to_pylist())):
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
                tlens.append(len(title))
                probas.append(float(proba))
                src_rows.append(row_no)
            for p in parts:
                if p in seen_parts:
                    continue
                seen_parts.add(p)
                kinds.append(0)
                keys_col.append(p)
                eids.append(eid)
                tlens.append(len(title))
                probas.append(float(proba))
                src_rows.append(row_no)
    out = pa.table({
        "kind": pa.array(kinds, pa.int8()),
        "key0": pa.array(keys_col, pa.string()),
        "eid": pa.array(eids, pa.int64()),
        "tlen": pa.array(tlens, pa.int32()),
        "proba": pa.array(probas, pa.float64()),
    })
    if with_meta:
        take = pa.array(src_rows, pa.int64())
        for col in meta_cols:
            if col in t.column_names:
                out = out.append_column(col, t[col].take(take))
            else:
                out = out.append_column(
                    col, pa.nulls(out.num_rows, pa.float64()))
    return out


def _alias_rows_vectorized(t: pa.Table, with_meta: bool,
                           meta_cols: list[str]) -> pa.Table:
    """ONE pass per KB batch → combined rows tagged by ``kind``
    (0 = part posting, 1 = exact surface key) — the two tables are
    split afterward instead of normalizing every alias twice.

    Vectorized normalize→explode: the alias column is flattened once,
    ``filter_surface(normalize_chars(…))`` runs per UNIQUE alias (not
    per occurrence), the parts explosion is a ragged-arange gather, and
    the per-entity first-occurrence dedup is one hash-based
    ``duplicated`` over (row, kind, key).  Bit-exact vs
    :func:`_alias_rows_rowloop` including row ORDER (parity-tested) —
    at a Wikidata-scale KB this loop is the index-build job's wall."""
    import pyarrow.compute as pc

    n = t.num_rows
    empty = pa.table({
        "kind": pa.array([], pa.int8()),
        "key0": pa.array([], pa.string()),
        "eid": pa.array([], pa.int64()),
        "tlen": pa.array([], pa.int32()),
        "proba": pa.array([], pa.float64()),
    })

    def _finish(out: pa.Table, take: pa.Array | None) -> pa.Table:
        if with_meta:
            for col in meta_cols:
                if col in t.column_names and take is not None:
                    out = out.append_column(col, t[col].take(take))
                else:
                    out = out.append_column(
                        col, pa.nulls(out.num_rows,
                                      t[col].type if col in t.column_names
                                      else pa.float64()))
        return out

    if n == 0:
        return _finish(empty, None)
    al = t["aliases"].combine_chunks()
    counts = al.value_lengths().fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    alias_np = np.asarray(al.flatten().to_pylist(), dtype=object)
    if len(alias_np) == 0:
        return _finish(empty, None)
    # hash-based factorize (no sort): normalize each UNIQUE alias once
    inv, uniq = pd.factorize(alias_np)
    uparts = [filter_surface(normalize_chars(u)) for u in uniq]
    ukey = np.array([" ".join(p) for p in uparts], dtype=object)
    ulen = np.array([len(p) for p in uparts], dtype=np.int64)
    uflat = np.array([w for p in uparts for w in p], dtype=object)
    ustart = np.zeros(len(ulen), dtype=np.int64)
    if len(ulen) > 1:
        ustart[1:] = np.cumsum(ulen)[:-1]

    # per-occurrence record layout, built directly in the row-loop's
    # emission order (exact key, then that alias's parts) — no sort
    valid = ulen[inv] > 0
    lens_occ = np.where(valid, ulen[inv], 0)
    rc = np.where(valid, 1 + lens_occ, 0)        # records per occurrence
    rec_total = int(rc.sum())
    rec_start = np.zeros(len(rc), dtype=np.int64)
    if len(rc) > 1:
        rec_start[1:] = np.cumsum(rc)[:-1]

    key_arr = np.empty(rec_total, dtype=object)
    kind_arr = np.zeros(rec_total, dtype=np.int8)
    ex_pos = rec_start[valid]
    key_arr[ex_pos] = ukey[inv[valid]]
    kind_arr[ex_pos] = 1
    total = int(lens_occ.sum())
    if total:
        ends = np.cumsum(lens_occ)
        inner = np.arange(total, dtype=np.int64) \
            - np.repeat(ends - lens_occ, lens_occ)
        key_arr[np.repeat(rec_start, lens_occ) + 1 + inner] = \
            uflat[inner + np.repeat(ustart[inv], lens_occ)]
    row_rec = np.repeat(row_idx, rc)

    # first-occurrence dedup per (row, kind, key): factorize the key
    # once, then one hash dedup over three int columns
    kcodes = pd.factorize(key_arr)[0]
    keep = ~pd.DataFrame({"r": row_rec, "k": kind_arr,
                          "c": kcodes}).duplicated().to_numpy()
    take = pa.array(row_rec[keep], pa.int64())
    out = pa.table({
        "kind": pa.array(kind_arr[keep], pa.int8()),
        "key0": pa.array(key_arr[keep].tolist(), pa.string()),
        "eid": t["eid"].combine_chunks().take(take),
        "tlen": pc.cast(pc.utf8_length(
            t["page_title"].combine_chunks().take(take)), pa.int32()),
        "proba": pc.cast(t["proba"].combine_chunks().take(take),
                         pa.float64()),
    })
    return _finish(out, take)


def kb_block_tables(kb: pa.Table, cfg: PipelineConfig,
                    num_partitions: int = 4,
                    with_meta: bool = False) -> dict:
    """KB → blocking-side Datasets (the build-index artifacts; persist
    them with :func:`save_block_tables` so reruns pay only the
    mention-side joins).

    ``with_meta=True`` additionally carries the per-entity geo/temporal
    metadata (lat/lon, birth/inception years + timestamps) through the
    posting rows so the per-job context filters can run inside the
    surface-group ranker — required whenever ``cfg.context`` is set;
    left off otherwise to keep the join exchange narrow."""
    meta_cols = ["longitude", "latitude", "dateofbirth", "inception"]
    keep = ["eid", "page_title", "qid", "proba", "aliases"] + \
        [c for c in meta_cols if c in kb.column_names and with_meta]
    kb_eid = kb.append_column(
        "eid", pa.array(np.arange(kb.num_rows, dtype=np.int64)))
    kb_ds = ray.data.from_arrow(
        kb_eid.select([c for c in keep if c in kb_eid.column_names]))

    def alias_rows(t: pa.Table) -> pa.Table:
        return _alias_rows_vectorized(t, with_meta, meta_cols)

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
    # frequency stoplist table: entities reachable per part — small
    # (one row per part); materialized because both the postings join
    # and the band table read it
    freqs = postings0.groupby("part").count() \
        .map_batches(lambda t: t.rename_columns(["part", "freq"]),
                     batch_format="pyarrow").materialize()
    postings = postings0.join(freqs, join_type="inner",
                              num_partitions=num_partitions,
                              on=("part",))

    hasher = MinHasher(num_perm=cfg.num_perm, seed=cfg.seed)

    def band_rows(t: pa.Table) -> pa.Table:
        # identity key (exact part probe) + LSH band keys (fuzzy probe)
        # per part; freq rides along so the part-level matcher can
        # stoplist hot parts BEFORE the postings expansion (no extra
        # freq join)
        keys, idx = _probe_key_arrays(t["part"].to_pylist(), cfg, hasher)
        take = pa.array(idx, pa.int64())
        return pa.table({"key": pa.array(keys.tolist(), pa.string()),
                         "part": t["part"].combine_chunks().take(take),
                         "freq": t["freq"].combine_chunks().take(take)})

    bands = freqs.map_batches(band_rows, batch_format="pyarrow")
    # entity metadata table (one NARROW row per entity): title/qid
    # strings live HERE, not in the posting rows — the wide posting
    # expansion joins carry only (eid, tlen, proba) and the strings are
    # re-attached AFTER the per-surface ranking caps the volume
    # (measured at 24k entities / 20k pages: the hit table is 33.6M
    # rows; the ranked table 0.64M)
    entmeta = ray.data.from_arrow(pa.table({
        "cand_entity": kb_eid["eid"],
        "candidate_title": kb_eid["page_title"],
        "qid": kb_eid["qid"],
    }))
    return {"postings": postings, "exact": exact, "bands": bands,
            "entmeta": entmeta}


def save_block_tables(kb: pa.Table, cfg: PipelineConfig, artifact_dir: str,
                      num_partitions: int = 4,
                      with_meta: bool = False) -> str:
    """Persist the KB blocking tables as parquet artifacts keyed by the
    KB fingerprint — the build-index job of the large-KB path.  Reruns
    load them with :func:`load_block_tables` and pay only the
    mention-side joins (the docstring promise of the module header)."""
    import json
    import os

    from sbb_ned_ray.state.artifacts import kb_fingerprint

    # -v3: postings/exact carry tlen (not title/qid strings); entity
    # metadata is its own narrow table (entmeta) joined post-ranking
    fp = kb_fingerprint(kb, cfg) + "-v3" + ("-meta" if with_meta else "")
    out = os.path.join(artifact_dir, fp)
    if os.path.exists(os.path.join(out, "_BLOCK_TABLES_COMPLETE")):
        return out
    tabs = kb_block_tables(kb, cfg, num_partitions, with_meta=with_meta)
    tmp = out + ".tmp"
    for name in ("postings", "exact", "bands", "entmeta"):
        tabs[name].write_parquet(os.path.join(tmp, name))
    with open(os.path.join(tmp, "_BLOCK_TABLES_COMPLETE"), "w") as f:
        json.dump({"fingerprint": fp}, f)
    try:
        os.replace(tmp, out)
    except OSError:
        # only a concurrent writer that already completed the SAME
        # fingerprint may win; any other rename failure (EXDEV,
        # permissions) must surface, not produce a half-usable path
        if not os.path.exists(os.path.join(out, "_BLOCK_TABLES_COMPLETE")):
            raise
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def load_block_tables(artifact_path: str) -> dict:
    """Streaming read of persisted blocking tables."""
    import os
    return {name: ray.data.read_parquet(os.path.join(artifact_path, name))
            for name in ("postings", "exact", "bands", "entmeta")}


_REDIRECT_CACHE: dict[str, dict] = {}


def _get_redirects(redirects_ref) -> dict[str, str]:
    """Worker-global fetch of the broadcast redirect map (normalized
    source key → target title).  The map is title→title rows — orders of
    magnitude smaller than the KB this path exists for — so ``ray.put``
    broadcast is the right shape even when the KB itself co-shuffles."""
    if redirects_ref is None:
        return {}
    key = redirects_ref.hex()
    d = _REDIRECT_CACHE.get(key)
    if d is None:
        d = ray.get(redirects_ref)
        _REDIRECT_CACHE.clear()
        _REDIRECT_CACHE[key] = d
    return d


def _surface_part_tables(surfaces_ds, cfg: PipelineConfig,
                         with_type: bool = False, redirects_ref=None):
    """Distinct surfaces → (surface_parts, key_rows): the per-surface
    part explode (attach side) and the exact full-surface-key rows.

    Redirect expansion mirrors the broadcast path
    (``candidates.generate_candidates_for_surface``): a redirected
    surface also emits its TARGET title's parts (fuzzy probe side) and
    the target's exact key (exact join side), attached to the SAME
    surface so the group ranker unions the hits."""

    # normalize each (already-distinct) surface ONCE per batch, then
    # build both leg tables by ragged explode — per-row list appends
    # replaced by one repeat-gather per column (the
    # _alias_rows_vectorized treatment; emission order bit-equal to the
    # old row loop, parity-tested in tests/test_blocking_shuffle.py)
    def _explode(t: pa.Table, value_lists: list, value_name: str
                 ) -> pa.Table:
        lens = np.fromiter((len(x) for x in value_lists), np.int64,
                           count=len(value_lists))
        flat = np.array([v for x in value_lists for v in x], dtype=object)
        take = pa.array(np.repeat(np.arange(len(value_lists),
                                            dtype=np.int64), lens),
                        pa.int64())
        out = pa.table({
            "surface": t["surface"].combine_chunks().take(take),
            value_name: pa.array(flat.tolist(), pa.string())})
        if with_type:
            out = out.append_column(
                "stype", t["stype"].combine_chunks().take(take))
        return out

    def part_rows(t: pa.Table) -> pa.Table:
        rd = _get_redirects(redirects_ref)
        plists = []
        for s in t["surface"].to_pylist():
            parts = filter_surface(normalize_chars(s))
            row = list(parts)
            if rd:
                target = rd.get(" ".join(parts))
                if target is not None:
                    row.extend(p for p in filter_surface(
                        normalize_chars(target.replace("_", " ")))
                        if p not in parts)
            plists.append(row)
        return _explode(t, plists, "query_part")

    def key_rows(t: pa.Table) -> pa.Table:
        rd = _get_redirects(redirects_ref)
        klists = []
        for s in t["surface"].to_pylist():
            parts = filter_surface(normalize_chars(s))
            row = []
            if parts:
                key = " ".join(parts)
                row.append(key)
                if rd:
                    target = rd.get(key)
                    if target is not None:
                        t_parts = filter_surface(
                            normalize_chars(target.replace("_", " ")))
                        if t_parts:
                            row.append(" ".join(t_parts))
            klists.append(row)
        return _explode(t, klists, "skey")

    return (surfaces_ds.map_batches(part_rows, batch_format="pyarrow"),
            surfaces_ds.map_batches(key_rows, batch_format="pyarrow"))


def _match_part_group(g: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """One query part's band/identity collisions → stoplisted,
    distance-filtered, SEARCH_K-capped (query_part, part, dist) matches
    — ``probe_part`` semantics (``state/alias_index.py:180-210``) at the
    PART level.  Running this BEFORE the postings expansion is the load-
    bearing ordering: band collisions scale with KB density, and every
    collision surviving to the entity join multiplies by the entities
    per part (measured at sf0.1: a 4x KB grew the surface-level join
    21x; part-level filtering keeps it at the matched-parts scale)."""
    cols = ["query_part", "part", "dist"]
    if g.empty:
        return pd.DataFrame(columns=cols)
    qp = g["query_part"].iloc[0]
    cand = g.drop_duplicates(subset=["part"])[["part", "freq"]]
    if len(qp) < cfg.min_part_len_for_freq:
        cand = cand[cand["freq"] <= cfg.max_frequency]
    if cand.empty:
        return pd.DataFrame(columns=cols)
    qv = anagram_vector(qp)
    sel = sorted(
        (d, p) for p, d in
        ((p, angular_distance(qv, anagram_vector(p)))
         for p in cand["part"]) if d < cfg.max_dist)[:SEARCH_K]
    return pd.DataFrame({"query_part": qp,
                         "part": [p for _, p in sel],
                         "dist": [d for d, _ in sel]})


_MATCH_SCHEMA = pa.schema([
    ("query_part", pa.string()), ("part", pa.string()),
    ("dist", pa.float64()),
])


def _match_parts_block(t: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Whole-bucket :func:`_match_part_group` — every (query_part,
    part) band collision of one coarse bucket in one numpy pass:
    dictionary-encode both strings, dedup pairs, stoplist, ONE batched
    float64 anagram matmul for the distances (the same kernel shape
    ``AliasIndex.probe_part`` uses, so the floats match the broadcast
    path more closely than the per-pair python dot did), then a single
    lexsort + boundary scan for the per-part (dist, part) order and
    SEARCH_K cap.  Anagram vectors are built once per DISTINCT string
    in the bucket, not once per collision pair."""
    if t.num_rows == 0:
        return _MATCH_SCHEMA.empty_table()
    import pyarrow.compute as pc

    from sbb_ned_ray.functions.normalization import anagram_matrix
    q_enc = pc.dictionary_encode(t["query_part"].combine_chunks())
    p_enc = pc.dictionary_encode(t["part"].combine_chunks())
    q_uniq = np.asarray(q_enc.dictionary.to_pylist(), dtype=object)
    p_uniq = np.asarray(p_enc.dictionary.to_pylist(), dtype=object)
    qc = q_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pcode = p_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    freq = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)

    # dedup (query_part, part) pairs (freq is a per-part constant)
    key = qc * len(p_uniq) + pcode
    o = np.argsort(key, kind="stable")
    first = np.empty(len(o), bool)
    first[0] = True
    first[1:] = key[o][1:] != key[o][:-1]
    idx = o[first]
    qc, pcode, freq = qc[idx], pcode[idx], freq[idx]

    # frequency stoplist for short query parts
    qlen = np.array([len(x) for x in q_uniq], np.int64)
    keep = (qlen[qc] >= cfg.min_part_len_for_freq) \
        | (freq <= cfg.max_frequency)
    qc, pcode = qc[keep], pcode[keep]
    if not len(qc):
        return _MATCH_SCHEMA.empty_table()

    qv = anagram_matrix(list(q_uniq)).astype(np.float64)
    pv = anagram_matrix(list(p_uniq)).astype(np.float64)
    cos = np.clip(np.einsum("ij,ij->i", qv[qc], pv[pcode]), -1.0, 1.0)
    d = np.sqrt(np.maximum(0.0, 2.0 * (1.0 - cos)))
    m = d < cfg.max_dist
    qc, pcode, d = qc[m], pcode[m], d[m]
    if not len(qc):
        return _MATCH_SCHEMA.empty_table()

    o2 = np.lexsort((p_uniq[pcode], d, qc))
    qs, ps, ds = qc[o2], pcode[o2], d[o2]
    new = np.empty(len(qs), bool)
    new[0] = True
    new[1:] = qs[1:] != qs[:-1]
    starts = np.flatnonzero(new)
    rank = np.arange(len(qs)) - np.repeat(
        starts, np.diff(np.append(starts, len(qs))))
    m2 = rank < SEARCH_K
    return pa.table({
        "query_part": pa.array(q_uniq[qs[m2]].tolist(), pa.string()),
        "part": pa.array(p_uniq[ps[m2]].tolist(), pa.string()),
        "dist": pa.array(ds[m2], pa.float64()),
    })


_RANK_SCHEMA = pa.schema([
    ("surface", pa.string()), ("cand_entity", pa.int64()),
    ("dist", pa.float64()), ("match_uniqueness", pa.float64()),
    ("match_coverage", pa.float64()), ("proba", pa.float64()),
    ("rank", pa.int32()),
])


def _rank_surface_block_rowloop(t: pa.Table, cfg: PipelineConfig
                                ) -> pa.Table:
    """Row-loop reference for :func:`_rank_surface_block` — calls the
    shared :func:`rank_hits` once per surface.  Kept for the parity
    test (tests/test_blocking_shuffle.py), not called in the pipeline:
    at 24k entities the per-surface python loop over the 33.6M-row hit
    table was 75 s of the blocking stage's wall."""
    if t.num_rows == 0:
        return _RANK_SCHEMA.empty_table()
    import pyarrow.compute as pc

    s_enc = pc.dictionary_encode(t["surface"].combine_chunks())
    q_enc = pc.dictionary_encode(t["query_part"].combine_chunks())
    s_uniq = np.asarray(s_enc.dictionary.to_pylist(), dtype=object)
    q_uniq = np.asarray(q_enc.dictionary.to_pylist(), dtype=object)
    s_codes = s_enc.indices.to_numpy(zero_copy_only=False)
    q_codes = q_enc.indices.fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    eid = t["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
    dist = t["dist"].to_numpy(zero_copy_only=False)
    tlen = t["tlen"].to_numpy(zero_copy_only=False).astype(np.int64)
    proba = t["proba"].to_numpy(zero_copy_only=False)
    is_ex = t["is_exact"].to_numpy(zero_copy_only=False)

    m = is_ex == 0
    # all-integer collapse: per (surface, query_part, entity) min dist
    pdf = pd.DataFrame({"s": s_codes[m], "q": q_codes[m], "e": eid[m],
                        "d": dist[m], "t": tlen[m], "p": proba[m]})
    col = pdf.groupby(["s", "q", "e"], sort=False) \
        .agg(d=("d", "min"), t=("t", "first"), p=("p", "first")) \
        .reset_index()
    cs = col["s"].to_numpy()
    o = np.argsort(cs, kind="stable")
    cs = cs[o]
    cq = col["q"].to_numpy()[o]
    ce_ = col["e"].to_numpy()[o]
    cd = col["d"].to_numpy()[o]
    ct = col["t"].to_numpy()[o]
    cp = col["p"].to_numpy()[o]
    bound = np.arange(len(s_uniq) + 1)
    starts = np.searchsorted(cs, bound[:-1])
    ends = np.searchsorted(cs, bound[1:])

    me = ~m
    es = s_codes[me]
    oe = np.argsort(es, kind="stable")
    es = es[oe]
    ee = eid[me][oe]
    et = tlen[me][oe]
    ep = proba[me][oe]
    starts_e = np.searchsorted(es, bound[:-1])
    ends_e = np.searchsorted(es, bound[1:])

    r_surf: list = []
    r_eid: list = []
    r_dist: list = []
    r_uniqv: list = []
    r_cov: list = []
    r_proba: list = []
    r_rank: list = []
    for si in range(len(s_uniq)):
        a, b = starts[si], ends[si]
        ae, be = starts_e[si], ends_e[si]
        if a == b and ae == be:
            continue
        surface = s_uniq[si]
        exact_ids = frozenset(int(e) for e in ee[ae:be])
        meta: dict[int, tuple[int, float]] = {}
        hits: list[tuple[int, str, float]] = []
        for qc, e, d, tl, pr in zip(cq[a:b], ce_[a:b], cd[a:b],
                                    ct[a:b], cp[a:b]):
            e = int(e)
            hits.append((e, q_uniq[qc], float(d)))
            meta[e] = (int(tl), float(pr))
        for e, tl, pr in zip(ee[ae:be], et[ae:be], ep[ae:be]):
            meta[int(e)] = (int(tl), float(pr))
        query_parts = tuple(filter_surface(normalize_chars(surface)))
        ranked = rank_hits(hits, cfg, exact_ids, query_parts,
                           get_len=lambda e: meta[e][0],
                           get_proba=lambda e: meta[e][1])
        for (e, d, u, cov, pr, rk) in ranked:
            r_surf.append(surface)
            r_eid.append(e)
            r_dist.append(d)
            r_uniqv.append(u)
            r_cov.append(cov)
            r_proba.append(pr)
            r_rank.append(rk)
    if not r_eid:
        return _RANK_SCHEMA.empty_table()
    return pa.table({
        "surface": pa.array(r_surf, pa.string()),
        "cand_entity": pa.array(r_eid, pa.int64()),
        "dist": pa.array(r_dist, pa.float64()),
        "match_uniqueness": pa.array(r_uniqv, pa.float64()),
        "match_coverage": pa.array(r_cov, pa.float64()),
        "proba": pa.array(r_proba, pa.float64()),
        "rank": pa.array(r_rank, pa.int32()),
    })


def _rank_surface_block(t: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Whole-bucket rank for the no-context path, vectorized end to
    end — NO per-surface python loop (the 33.6M-row hit table at 24k
    entities spent 75 s building python tuples per row in the
    reference implementation, :func:`_rank_surface_block_rowloop`).

    Replicates :func:`sbb_ned_ray.stages.candidates.rank_hits`
    semantics over the whole bucket:

    1. collapse part rows to per-(surface, query_part, entity) min
       dist (all-integer pandas groupby — khash on int64);
    2. ``total_hits`` per surface and ``part_hit_count`` per
       (surface, part) from the collapsed rows;
    3. exact full-surface matches expand to one zero-distance row per
       query part NOT already matched (dict-order-preserving part
       dedup, so the float uniqueness sums accumulate in the same
       sequence as rank_hits' insertion-ordered dict);
    4. per-(surface, entity) aggregates via sorted reduceat:
       n_parts, max dist, Σ part-length, uniqueness
       = Σ(total_hits / part_hit_count) × n_parts, coverage
       = title_len / max(1, Σ part-length);
    5. one lexsort over (surface, not-exact, −uniq, dist, −proba,
       coverage, title_len, entity) + boundary scan for the per-
       surface top-``max_candidates`` ranks.

    An exact entity whose surface normalizes to zero query parts is
    dropped (the row-loop reference raises on that input — it cannot
    occur for keys that joined ``alias_exact``)."""
    if t.num_rows == 0:
        return _RANK_SCHEMA.empty_table()
    import pyarrow.compute as pc

    s_enc = pc.dictionary_encode(t["surface"].combine_chunks())
    q_enc = pc.dictionary_encode(t["query_part"].combine_chunks())
    s_uniq = np.asarray(s_enc.dictionary.to_pylist(), dtype=object)
    q_uniq_list = q_enc.dictionary.to_pylist()
    s_codes = s_enc.indices.to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    q_codes = q_enc.indices.fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    eid = t["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
    dist = t["dist"].to_numpy(zero_copy_only=False)
    tlen = t["tlen"].to_numpy(zero_copy_only=False).astype(np.int64)
    proba = t["proba"].to_numpy(zero_copy_only=False)
    is_ex = t["is_exact"].to_numpy(zero_copy_only=False)

    m = is_ex == 0
    # 1. collapse: per (s, q, e) min dist (+ carried tlen/proba — one
    # value per entity, any row's copy is the value)
    pdf = pd.DataFrame({"s": s_codes[m], "q": q_codes[m], "e": eid[m],
                        "d": dist[m], "t": tlen[m], "p": proba[m]})
    col = pdf.groupby(["s", "q", "e"], sort=False) \
        .agg(d=("d", "min"), t=("t", "first"), p=("p", "first")) \
        .reset_index()
    cs = col["s"].to_numpy()
    cq = col["q"].to_numpy()
    ce = col["e"].to_numpy()
    cd = col["d"].to_numpy()
    ct = col["t"].to_numpy()
    cp = col["p"].to_numpy()
    nS = len(s_uniq)
    Qn0 = len(q_uniq_list)

    # 2. total_hits per surface; part_hit_count per (s, q)
    th = np.maximum(np.bincount(cs, minlength=nS), 1).astype(np.float64)

    # 3. exact rows: dedup (s, e) pairs, then expand to query parts
    es0 = s_codes[~m]
    ee0 = eid[~m]
    et0 = tlen[~m]
    ep0 = proba[~m]
    e_uniq = np.unique(np.concatenate([ce, ee0])) if len(ce) + len(ee0) \
        else np.array([], np.int64)
    E = max(len(e_uniq), 1)
    if len(es0):
        se_key = es0 * E + np.searchsorted(e_uniq, ee0)
        o = np.argsort(se_key, kind="stable")
        first = np.empty(len(o), bool)
        first[0] = True
        first[1:] = se_key[o][1:] != se_key[o][:-1]
        keep0 = o[first]
        es, ee, et, ep = es0[keep0], ee0[keep0], et0[keep0], ep0[keep0]
    else:
        es, ee, et, ep = es0, ee0, et0, ep0

    part_code: dict[str, int] = {p: i for i, p in enumerate(q_uniq_list)}
    extra_parts: list[str] = []
    parts_of_s: dict[int, np.ndarray] = {}
    for si in np.unique(es):
        parts = filter_surface(normalize_chars(s_uniq[si]))
        codes: list[int] = []
        for p in dict.fromkeys(parts):          # order-preserving dedup
            c = part_code.get(p)
            if c is None:
                c = Qn0 + len(extra_parts)
                extra_parts.append(p)
                part_code[p] = c
            codes.append(c)
        parts_of_s[int(si)] = np.asarray(codes, np.int64)
    Q = Qn0 + len(extra_parts) + 1
    plen = np.array([len(x) for x in q_uniq_list]
                    + [len(x) for x in extra_parts], np.int64)

    if len(es):
        rep = np.array([len(parts_of_s[int(si)]) for si in es], np.int64)
        xs = np.repeat(es, rep)
        xe = np.repeat(ee, rep)
        xt = np.repeat(et, rep)
        xp = np.repeat(ep, rep)
        xq = np.concatenate([parts_of_s[int(si)] for si in es]) \
            if rep.sum() else np.array([], np.int64)
        # keep only (s, q, e) not already matched by the part probe
        col_keys = np.sort((cs * Q + cq) * E + np.searchsorted(e_uniq, ce))
        x_keys = (xs * Q + xq) * E + np.searchsorted(e_uniq, xe)
        if len(col_keys):
            pos = np.searchsorted(col_keys, x_keys)
            pos[pos >= len(col_keys)] = len(col_keys) - 1
            missing = col_keys[pos] != x_keys
        else:
            missing = np.ones(len(x_keys), bool)
        xs, xq, xe, xt, xp = (xs[missing], xq[missing], xe[missing],
                              xt[missing], xp[missing])
    else:
        xs = xq = xe = np.array([], np.int64)
        xt = np.array([], np.int64)
        xp = np.array([], np.float64)

    R_s = np.concatenate([cs, xs])
    R_q = np.concatenate([cq, xq])
    R_e = np.concatenate([ce, xe])
    R_d = np.concatenate([cd, np.zeros(len(xs), np.float64)])
    R_t = np.concatenate([ct, xt])
    R_p = np.concatenate([cp, xp])
    if not len(R_s):
        return _RANK_SCHEMA.empty_table()

    # per-row uniqueness weight: total_hits / part_hit_count.get(p, 1)
    phc_keys, phc_cnt = np.unique(cs * Q + cq, return_counts=True)
    row_sq = R_s * Q + R_q
    if len(phc_keys):
        pos = np.searchsorted(phc_keys, row_sq)
        pos[pos >= len(phc_keys)] = len(phc_keys) - 1
        found = phc_keys[pos] == row_sq
        denom = np.ones(len(row_sq), np.float64)
        denom[found] = phc_cnt[pos[found]]
    else:
        denom = np.ones(len(row_sq), np.float64)
    w = th[R_s] / denom

    # 4. per-(s, e) aggregates — stable sort keeps the rank_hits
    # accumulation order (collapsed part rows first, exact fills after)
    ge_key = R_s * E + np.searchsorted(e_uniq, R_e)
    o = np.argsort(ge_key, kind="stable")
    gk = ge_key[o]
    new = np.empty(len(gk), bool)
    new[0] = True
    new[1:] = gk[1:] != gk[:-1]
    starts = np.flatnonzero(new)
    g_s = R_s[o][starts]
    g_e = R_e[o][starts]
    g_t = R_t[o][starts]
    g_p = R_p[o][starts]
    n_parts = np.diff(np.append(starts, len(gk)))
    g_d = np.maximum.reduceat(R_d[o], starts)
    g_plen = np.add.reduceat(plen[R_q[o]], starts)
    # bincount accumulates weights sequentially in array order — the
    # SAME left-to-right float association as rank_hits' python sum
    # over its insertion-ordered dict (np.add.reduceat associates
    # differently and flips last-bit ties; parity-tested)
    gid = np.cumsum(new) - 1
    g_uniq = np.bincount(gid, weights=w[o],
                         minlength=len(starts)) * n_parts
    g_cov = g_t.astype(np.float64) / np.maximum(1, g_plen)

    # exact flag per (s, e)
    if len(es):
        ex_keys = np.sort(es * E + np.searchsorted(e_uniq, ee))
        pos = np.searchsorted(ex_keys, gk[starts])
        pos[pos >= len(ex_keys)] = len(ex_keys) - 1
        g_notex = (ex_keys[pos] != gk[starts]).astype(np.int8)
    else:
        g_notex = np.ones(len(starts), np.int8)

    # 5. rank: one lexsort + per-surface boundary scan
    o2 = np.lexsort((g_e, g_t, g_cov, -g_p, g_d, -g_uniq, g_notex, g_s))
    ss = g_s[o2]
    new_s = np.empty(len(ss), bool)
    new_s[0] = True
    new_s[1:] = ss[1:] != ss[:-1]
    gid_starts = np.flatnonzero(new_s)
    rank = np.arange(len(ss)) - np.repeat(gid_starts,
                                          np.diff(np.append(gid_starts,
                                                            len(ss))))
    keep = rank < cfg.max_candidates
    o3 = o2[keep]
    return pa.table({
        "surface": pa.array(s_uniq[g_s[o3]].tolist(), pa.string()),
        "cand_entity": pa.array(g_e[o3], pa.int64()),
        "dist": pa.array(g_d[o3], pa.float64()),
        "match_uniqueness": pa.array(g_uniq[o3], pa.float64()),
        "match_coverage": pa.array(g_cov[o3], pa.float64()),
        "proba": pa.array(g_p[o3], pa.float64()),
        "rank": pa.array(rank[keep].astype(np.int32), pa.int32()),
    })


def _rank_local_expand(t: pa.Table, cfg: PipelineConfig,
                       geo_pts: list | None = None,
                       with_ctx: bool = False) -> pa.Table:
    """Bucket ranker over NARROW co-shuffled inputs — the expansion the
    old path shipped through the exchange (33.5M rows at 24k entities:
    every (surface, part) × every entity of that part) happens HERE in
    numpy gathers and never crosses the wire.  The bucket receives
    three row kinds:

    * kind 0 — (surface, query_part): the surface's part list, in
      probe order (hash-bucketed by surface);
    * kind 1 — (query_part, eid, dist, tlen, proba): the part-level
      matches joined to postings, REPLICATED once per bucket that
      contains a surface using the part (≤ nparts copies — bounded by
      the matched-parts table, not by surface × part pairs);
    * kind 2 — (surface, eid, tlen, proba): exact full-surface-key
      matches (hash-bucketed by surface).

    Semantics are rank_hits' exactly (same accumulation order as the
    broadcast probe: a surface's parts in probe order, exact fills
    after — parity-tested against :func:`_rank_surface_block_rowloop`
    and the broadcast path).

    ``with_ctx=True`` is the context-job variant: the leg "surface"
    column carries ``surface\\x1ftype``, kind-1/2 rows carry the
    geo/temporal metadata columns, aggregation is pre-truncation, and
    ``apply_context_core`` re-ranks/filters each (surface, type) group
    over the AGGREGATED candidates before the cap — the expansion
    still never crosses the exchange."""
    empty = _RANK_SCHEMA.empty_table()
    if with_ctx:
        empty = empty.append_column("stype", pa.array([], pa.string()))
    if t.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    kind = t["kind"].to_numpy(zero_copy_only=False)
    s_enc = pc.dictionary_encode(t["surface"].combine_chunks())
    q_enc = pc.dictionary_encode(t["query_part"].combine_chunks())
    s_uniq = np.asarray(s_enc.dictionary.to_pylist(), dtype=object)
    q_uniq_list = q_enc.dictionary.to_pylist()
    sc_all = s_enc.indices.fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    qc_all = q_enc.indices.fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    eid = t["eid"].to_numpy(zero_copy_only=False).astype(np.int64)
    dist = t["dist"].to_numpy(zero_copy_only=False)
    tlen = t["tlen"].to_numpy(zero_copy_only=False).astype(np.int64)
    proba = t["proba"].to_numpy(zero_copy_only=False)
    nS = max(len(s_uniq), 1)
    # Qn0 lays out code assignment / plen / cnt (must be the exact
    # dictionary size or extra-part codes go off-by-one when the
    # query_part dictionary is empty); Qn is only the (s, q) pair-key
    # multiplier, where max(·, 1) keeps keys well-formed on empties
    Qn0 = len(q_uniq_list)
    Qn = max(Qn0, 1)

    # ---- kind-1: collapse per (q, e) min dist (surface-independent)
    mq = kind == 1
    me2 = kind == 2
    e_uniq = np.unique(np.concatenate([eid[mq], eid[me2]]))
    E = max(len(e_uniq), 1)
    qq = qc_all[mq]
    qe = np.searchsorted(e_uniq, eid[mq]) if mq.any() else \
        np.array([], np.int64)
    key_qe = qq * E + qe
    o = np.argsort(key_qe, kind="stable")
    kqe = key_qe[o]
    if len(kqe):
        new = np.empty(len(kqe), bool)
        new[0] = True
        new[1:] = kqe[1:] != kqe[:-1]
        starts = np.flatnonzero(new)
        cq2 = qq[o][starts]
        ce2 = qe[o][starts]
        cd2 = np.minimum.reduceat(dist[mq][o], starts)
        ct2 = tlen[mq][o][starts]
        cp2 = proba[mq][o][starts]
        qe_keys = kqe[starts]                  # sorted unique (q, e)
    else:
        cq2 = ce2 = np.array([], np.int64)
        cd2 = cp2 = np.array([], np.float64)
        ct2 = np.array([], np.int64)
        qe_keys = np.array([], np.int64)
    bounds = np.arange(Qn0 + 1)
    qstart = np.searchsorted(cq2, bounds[:-1])
    qend = np.searchsorted(cq2, bounds[1:])
    cnt = qend - qstart                        # hits per query part

    # ---- kind-0: per-surface part lists (probe order), dedup (s, q)
    ms = kind == 0
    ss0 = sc_all[ms]
    qs0 = qc_all[ms]
    o = np.argsort(ss0, kind="stable")         # keep probe order per s
    ss1, qs1 = ss0[o], qs0[o]
    if len(ss1):
        _, fi = np.unique(ss1 * Qn + qs1, return_index=True)
        fi.sort()
        ss1, qs1 = ss1[fi], qs1[fi]
    th = np.maximum(np.bincount(
        ss1, weights=cnt[qs1].astype(np.float64), minlength=nS), 1.0)
    keep = cnt[qs1] > 0
    ss2, qs2 = ss1[keep], qs1[keep]

    # ---- local expansion: gather each part's entity slice per surface
    rep = cnt[qs2]
    total = int(rep.sum())
    if total:
        cum = np.concatenate([[0], np.cumsum(rep)[:-1]])
        pos = np.arange(total) - np.repeat(cum, rep) \
            + np.repeat(qstart[qs2], rep)
        R_s = np.repeat(ss2, rep)
        R_q = np.repeat(qs2, rep)
        R_e = ce2[pos]
        R_d = cd2[pos]
        R_t = ct2[pos]
        R_p = cp2[pos]
        w = th[R_s] / cnt[R_q]
    else:
        R_s = R_q = R_e = np.array([], np.int64)
        R_d = R_p = w = np.array([], np.float64)
        R_t = np.array([], np.int64)

    # ---- kind-2: exact rows — dedup (s, e), expand to query parts
    es0 = sc_all[me2]
    ee0 = np.searchsorted(e_uniq, eid[me2]) if me2.any() else \
        np.array([], np.int64)
    et0 = tlen[me2]
    ep0 = proba[me2]
    if len(es0):
        se_key = es0 * E + ee0
        o = np.argsort(se_key, kind="stable")
        first = np.empty(len(o), bool)
        first[0] = True
        first[1:] = se_key[o][1:] != se_key[o][:-1]
        k0 = o[first]
        es, ee, et, ep = es0[k0], ee0[k0], et0[k0], ep0[k0]
    else:
        es = ee = np.array([], np.int64)
        et = np.array([], np.int64)
        ep = np.array([], np.float64)

    part_code: dict[str, int] = {p: i for i, p in enumerate(q_uniq_list)}
    extra_parts: list[str] = []
    parts_of_s: dict[int, np.ndarray] = {}
    for si in np.unique(es):
        raw = s_uniq[si].split("\x1f", 1)[0] if with_ctx else s_uniq[si]
        parts = filter_surface(normalize_chars(raw))
        codes: list[int] = []
        for p in dict.fromkeys(parts):
            c = part_code.get(p)
            if c is None:
                c = Qn0 + len(extra_parts)
                extra_parts.append(p)
                part_code[p] = c
            codes.append(c)
        parts_of_s[int(si)] = np.asarray(codes, np.int64)
    Q = Qn0 + len(extra_parts) + 1
    plen = np.array([len(x) for x in q_uniq_list]
                    + [len(x) for x in extra_parts], np.int64)
    cnt_ext = np.concatenate([cnt, np.zeros(len(extra_parts) + 1,
                                            np.int64)])

    if len(es):
        rep_x = np.array([len(parts_of_s[int(si)]) for si in es],
                         np.int64)
        xs = np.repeat(es, rep_x)
        xe = np.repeat(ee, rep_x)
        xt = np.repeat(et, rep_x)
        xp = np.repeat(ep, rep_x)
        xq = np.concatenate([parts_of_s[int(si)] for si in es]) \
            if rep_x.sum() else np.array([], np.int64)
        # fill only (s, q, e) not already produced by the expansion:
        # present ⇔ (s, q) is a surface part AND (q, e) is a hit
        sp_keys = np.sort(ss2 * Q + qs2)
        f1 = np.zeros(len(xs), bool)
        if len(sp_keys):
            p1 = np.searchsorted(sp_keys, xs * Q + xq)
            p1[p1 >= len(sp_keys)] = len(sp_keys) - 1
            f1 = sp_keys[p1] == xs * Q + xq
        f2 = np.zeros(len(xs), bool)
        if len(qe_keys):
            p2 = np.searchsorted(qe_keys, xq * E + xe)
            p2[p2 >= len(qe_keys)] = len(qe_keys) - 1
            f2 = qe_keys[p2] == xq * E + xe
        missing = ~(f1 & f2)
        xs, xq, xe, xt, xp = (xs[missing], xq[missing], xe[missing],
                              xt[missing], xp[missing])
        w_x = th[xs] / np.maximum(cnt_ext[xq], 1)
        R_s = np.concatenate([R_s, xs])
        R_q = np.concatenate([R_q, xq])
        R_e = np.concatenate([R_e, xe])
        R_d = np.concatenate([R_d, np.zeros(len(xs), np.float64)])
        R_t = np.concatenate([R_t, xt])
        R_p = np.concatenate([R_p, xp])
        w = np.concatenate([w, w_x])
    if not len(R_s):
        return empty

    # ---- shared aggregation + rank (identical to _rank_surface_block)
    ge_key = R_s * E + R_e
    o = np.argsort(ge_key, kind="stable")
    gk = ge_key[o]
    new = np.empty(len(gk), bool)
    new[0] = True
    new[1:] = gk[1:] != gk[:-1]
    starts = np.flatnonzero(new)
    g_s = R_s[o][starts]
    g_e = e_uniq[R_e[o][starts]]
    g_t = R_t[o][starts]
    g_p = R_p[o][starts]
    n_parts = np.diff(np.append(starts, len(gk)))
    g_d = np.maximum.reduceat(R_d[o], starts)
    g_plen = np.add.reduceat(plen[R_q[o]], starts)
    gid = np.cumsum(new) - 1
    g_uniq = np.bincount(gid, weights=w[o],
                         minlength=len(starts)) * n_parts
    g_cov = g_t.astype(np.float64) / np.maximum(1, g_plen)
    if len(es):
        ex_keys = np.sort(es * E + ee)
        p3 = np.searchsorted(ex_keys, gk[starts])
        p3[p3 >= len(ex_keys)] = len(ex_keys) - 1
        g_notex = (ex_keys[p3] != gk[starts]).astype(np.int8)
    else:
        g_notex = np.ones(len(starts), np.int8)
    o2 = np.lexsort((g_e, g_t, g_cov, -g_p, g_d, -g_uniq, g_notex, g_s))
    if not with_ctx:
        ss = g_s[o2]
        new_s = np.empty(len(ss), bool)
        new_s[0] = True
        new_s[1:] = ss[1:] != ss[:-1]
        gid_starts = np.flatnonzero(new_s)
        rank = np.arange(len(ss)) - np.repeat(
            gid_starts, np.diff(np.append(gid_starts, len(ss))))
        keep2 = rank < cfg.max_candidates
        o3 = o2[keep2]
        return pa.table({
            "surface": pa.array(s_uniq[g_s[o3]].tolist(), pa.string()),
            "cand_entity": pa.array(g_e[o3], pa.int64()),
            "dist": pa.array(g_d[o3], pa.float64()),
            "match_uniqueness": pa.array(g_uniq[o3], pa.float64()),
            "match_coverage": pa.array(g_cov[o3], pa.float64()),
            "proba": pa.array(g_p[o3], pa.float64()),
            "rank": pa.array(rank[keep2].astype(np.int32), pa.int32()),
        })

    # context mode: the per-job geo/temporal filters run over the
    # PRE-truncation ranking per (surface, type) group — the loop below
    # is over AGGREGATED candidate rows (≤ pre-cap candidates per
    # group), the same post-rank_hits work the expanded-join path's
    # per-group ranker did, never over hit rows
    ent_meta: dict[int, tuple] = {}
    mmeta = mq | me2
    lat_a = t["latitude"].to_numpy(zero_copy_only=False)
    lon_a = t["longitude"].to_numpy(zero_copy_only=False)
    dob_a = t["dateofbirth"].to_pylist()
    inc_a = t["inception"].to_pylist()
    for i in np.flatnonzero(mmeta):
        ent_meta[int(eid[i])] = (
            float(lat_a[i]) if not np.isnan(lat_a[i]) else np.nan,
            float(lon_a[i]) if not np.isnan(lon_a[i]) else np.nan,
            pd.Timestamp(dob_a[i]) if dob_a[i] is not None else None,
            pd.Timestamp(inc_a[i]) if inc_a[i] is not None else None)

    exact_of_sg: dict[int, set] = {}
    for sc, ec in zip(es, ee):
        exact_of_sg.setdefault(int(sc), set()).add(int(e_uniq[ec]))
    tlen_of: dict[int, int] = {int(e): int(tl)
                               for e, tl in zip(g_e, g_t)}

    from sbb_ned_ray.stages.candidates import apply_context_core
    out_rows: dict[str, list] = {c: [] for c in (
        "surface", "cand_entity", "dist", "match_uniqueness",
        "match_coverage", "proba", "rank", "stype")}
    ss = g_s[o2]
    new_s = np.empty(len(ss), bool)
    new_s[0] = True
    new_s[1:] = ss[1:] != ss[:-1]
    gid_starts = np.flatnonzero(new_s)
    gid_ends = np.append(gid_starts[1:], len(ss))
    for a, b in zip(gid_starts, gid_ends):
        sgi = int(ss[a])
        sg = s_uniq[sgi]
        surface, stype = sg.split("\x1f", 1)
        exact_ids = frozenset(exact_of_sg.get(sgi, ()))
        rows = [(int(g_e[o2[i]]), float(g_d[o2[i]]),
                 float(g_uniq[o2[i]]), float(g_cov[o2[i]]),
                 float(g_p[o2[i]]), 0) for i in range(a, b)]
        ranked = apply_context_core(
            rows, cfg, stype, exact_ids, geo_pts or [],
            get_latlon=lambda e: ent_meta.get(e, (np.nan, np.nan))[:2],
            get_birth=lambda e: ent_meta.get(e, (0, 0, None, None))[2],
            get_inception=lambda e: ent_meta.get(e, (0, 0, None,
                                                     None))[3],
            get_len=lambda e: tlen_of.get(e, 0))
        for rk, (e, d, u, cov, pr, _) in enumerate(
                ranked[:cfg.max_candidates]):
            out_rows["surface"].append(surface)
            out_rows["cand_entity"].append(e)
            out_rows["dist"].append(d)
            out_rows["match_uniqueness"].append(u)
            out_rows["match_coverage"].append(cov)
            out_rows["proba"].append(pr)
            out_rows["rank"].append(rk)
            out_rows["stype"].append(stype)
    return pa.table({
        "surface": pa.array(out_rows["surface"], pa.string()),
        "cand_entity": pa.array(out_rows["cand_entity"], pa.int64()),
        "dist": pa.array(out_rows["dist"], pa.float64()),
        "match_uniqueness": pa.array(out_rows["match_uniqueness"],
                                     pa.float64()),
        "match_coverage": pa.array(out_rows["match_coverage"],
                                   pa.float64()),
        "proba": pa.array(out_rows["proba"], pa.float64()),
        "rank": pa.array(out_rows["rank"], pa.int32()),
        "stype": pa.array(out_rows["stype"], pa.string()),
    })


_META_COLS = ["longitude", "latitude", "dateofbirth", "inception"]


def ranked_candidates_via_shuffle(mentions_ds, kb: pa.Table,
                                  cfg: PipelineConfig | None = None,
                                  num_partitions: int = 4,
                                  kb_tables: dict | None = None,
                                  redirects: pa.Table | None = None):
    """Distinct mention surfaces → ranked candidates, via blocking-key
    joins + one groupby(surface) aggregation (see module docstring) —
    all streaming: no intermediate materialization, the executor
    pipelines the three joins into the final group ranking.

    With ``cfg.context`` set, the unit of ranking is (surface,
    mention type) and the posting rows carry geo/temporal metadata so
    the group ranker can run ``apply_context_core`` — same semantics as
    the broadcast path (parity-tested)."""
    cfg = cfg or PipelineConfig()
    has_ctx = cfg.context is not None
    tabs = kb_tables if kb_tables is not None else \
        kb_block_tables(kb, cfg, num_partitions, with_meta=has_ctx)
    geo_pts: list = []
    if has_ctx:
        def qid_to_latlon(q):
            rows = kb.filter(
                pa.compute.equal(kb["qid"], pa.scalar(q)))
            if rows.num_rows == 0:
                return None
            lat = rows["latitude"][0].as_py() \
                if "latitude" in rows.column_names else None
            lon = rows["longitude"][0].as_py() \
                if "longitude" in rows.column_names else None
            if lat is None or lon is None:
                return None
            return (lat, lon)

        from sbb_ned_ray.stages.candidates import geo_points_from_context
        geo_pts = geo_points_from_context(cfg, qid_to_latlon)

        surfaces = mentions_ds.select_columns(["surface", "type"]) \
            .map_batches(lambda t: t.rename_columns(["surface", "stype"]),
                         batch_format="pyarrow") \
            .groupby(["surface", "stype"]).count() \
            .map_batches(lambda t: t.select(["surface", "stype"]),
                         batch_format="pyarrow")
    else:
        surfaces = mentions_ds.select_columns(["surface"]) \
            .groupby("surface").count() \
            .map_batches(lambda t: t.select(["surface"]),
                         batch_format="pyarrow")
    from sbb_ned_ray.state.alias_index import redirect_map
    rd = redirect_map(redirects)
    redirects_ref = ray.put(rd) if rd else None
    surface_parts, key_rows = _surface_part_tables(
        surfaces, cfg, with_type=has_ctx, redirects_ref=redirects_ref)

    # P1: DISTINCT query parts (narrow — parts shared by many surfaces
    # probe once) → probe keys (identity + LSH bands)
    def probe_keys(t: pa.Table) -> pa.Table:
        from sbb_ned_ray.functions.hashing import MinHasher
        hasher = MinHasher(num_perm=cfg.num_perm, seed=cfg.seed)
        keys, idx = _probe_key_arrays(t["query_part"].to_pylist(),
                                      cfg, hasher)
        return pa.table({
            "query_part": t["query_part"].combine_chunks().take(
                pa.array(idx, pa.int64())),
            "key": pa.array(keys.tolist(), pa.string())})

    parts = surface_parts \
        .groupby("query_part").count() \
        .map_batches(lambda t: t.select(["query_part"]),
                     batch_format="pyarrow") \
        .map_batches(probe_keys, batch_format="pyarrow")

    # P2: band join at the PART level, then stoplist + anagram-distance
    # filter + SEARCH_K cap per part (probe_part semantics) BEFORE any
    # entity expansion.  Materialized: the one DAG cut — the matched
    # table is tiny (<= distinct parts x SEARCH_K rows) and cutting here
    # bounds the concurrent all-to-all operator count on each side (a
    # fully-lazy graph with 5+ hash shuffles deadlocks small nodes).
    nparts_pm = max(16, num_partitions * 4)

    def _add_qbucket(t: pa.Table) -> pa.Table:
        import zlib

        import pyarrow.compute as pc
        enc = pc.dictionary_encode(t["query_part"].combine_chunks())
        buckets = np.array(
            [zlib.crc32(u.encode("utf-8")) % nparts_pm
             for u in enc.dictionary.to_pylist()], dtype=np.int32)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(buckets[codes],
                                                 pa.int32()))

    part_matches = parts.join(tabs["bands"], join_type="inner",
                              num_partitions=num_partitions,
                              on=("key",)) \
        .map_batches(_add_qbucket, batch_format="pyarrow") \
        .groupby("_part") \
        .map_groups(lambda t: _match_parts_block(
            t.drop_columns(["_part"]), cfg),
            batch_format="pyarrow").materialize()

    # P3: expand matched parts → entity rows, then attach to surfaces on
    # query_part (both joins now run at post-filter volume).  The part
    # string itself is DEAD after this join (the ranker groups by
    # query_part and takes per-entity min dist), and title/qid strings
    # were never in the postings (tlen + the post-rank entmeta join
    # carry the same information) — the widest exchange of the pipeline
    # ships only (surface, query_part, dist, eid, tlen, proba).
    qp_hits = part_matches.join(
        tabs["postings"], join_type="inner",
        num_partitions=num_partitions, on=("part",)) \
        .map_batches(lambda t: t.drop_columns(["freq", "part"]),
                     batch_format="pyarrow")

    def _attach_entmeta(ranked_slim, extra_cols: list[str]):
        # re-attach title/qid strings at POST-RANK volume (≤
        # max_candidates rows per surface) — a narrow hash join against
        # the one-row-per-entity table instead of shipping the strings
        # through the full postings expansion
        out_order = ["surface", "cand_entity", "dist", "match_uniqueness",
                     "match_coverage", "proba", "rank", "candidate_title",
                     "qid"] + extra_cols
        return ranked_slim.join(
            tabs["entmeta"], join_type="inner",
            num_partitions=num_partitions, on=("cand_entity",)) \
            .map_batches(lambda t: t.select(out_order),
                         batch_format="pyarrow")

    nparts = max(16, num_partitions * 4)

    def _surface_bucket(col: pa.ChunkedArray) -> np.ndarray:
        import zlib

        import pyarrow.compute as pc
        enc = pc.dictionary_encode(col.combine_chunks())
        buckets = np.array(
            [zlib.crc32(u.encode("utf-8")) % nparts
             for u in enc.dictionary.to_pylist()], dtype=np.int32)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        return buckets[codes]

    # LOCAL-EXPAND ranking (both paths) — the (surface, part) × entity
    # expansion never crosses the exchange.  Three narrow legs
    # co-shuffle on the surface-hash bucket: the surface part lists,
    # the (part → entity) matches replicated once per bucket that uses
    # the part, and the exact-key rows; each bucket then expands and
    # ranks in numpy (:func:`_rank_local_expand`).  At 24k entities /
    # 20k pages the old expanded exchange was 33.5M rows; the legs are
    # |surface_parts| + |qp_hits| × buckets-touched + |exact| rows.
    # Context jobs group by (surface, type): the legs' surface column
    # carries ``surface\x1ftype`` and kind-1/2 rows carry the
    # geo/temporal metadata columns for ``apply_context_core``.
    import pyarrow.compute as _pcc

    def _sgcol(t: pa.Table) -> pa.ChunkedArray:
        if not has_ctx:
            return t["surface"]
        sg = _pcc.binary_join_element_wise(t["surface"], t["stype"],
                                           "\x1f")
        return pa.chunked_array([sg]) if isinstance(sg, pa.Array) else sg

    def _meta_nulls(n: int) -> dict:
        return {
            "longitude": pa.nulls(n, pa.float64()),
            "latitude": pa.nulls(n, pa.float64()),
            "dateofbirth": pa.nulls(n, pa.timestamp("us")),
            "inception": pa.nulls(n, pa.timestamp("us")),
        }

    def sp_leg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sg = _sgcol(t)
        cols = {
            "kind": pa.array(np.zeros(n, np.int8)),
            "surface": sg,
            "query_part": t["query_part"],
            "dist": pa.array(np.zeros(n, np.float64)),
            "eid": pa.array(np.full(n, -1, np.int64)),
            "tlen": pa.array(np.zeros(n, np.int32), pa.int32()),
            "proba": pa.array(np.zeros(n, np.float64)),
        }
        if has_ctx:
            cols.update(_meta_nulls(n))
        cols["_part"] = pa.array(_surface_bucket(sg), pa.int32())
        return pa.table(cols)

    sp_rows = surface_parts.map_batches(sp_leg, batch_format="pyarrow") \
        .materialize()

    def qb_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"query_part": t["query_part"].to_pylist(),
                           "_part": t["_part"].to_numpy(
                               zero_copy_only=False)})
        df = df.drop_duplicates()
        return pa.table({"query_part": pa.array(df["query_part"],
                                                pa.string()),
                         "_part": pa.array(df["_part"], pa.int32())})

    qparts_buckets = sp_rows.select_columns(["query_part", "_part"]) \
        .map_batches(qb_partial, batch_format="pyarrow") \
        .groupby(["query_part", "_part"]).count() \
        .map_batches(lambda t: t.select(["query_part", "_part"]),
                     batch_format="pyarrow")

    def pc2_cast_f64(col):
        return _pcc.cast(col, pa.float64())

    def pc2_cast_i32(col):
        return _pcc.cast(col, pa.int32())

    def qp_leg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "kind": pa.array(np.ones(n, np.int8)),
            "surface": pa.array([None] * n, pa.string()),
            "query_part": t["query_part"],
            "dist": pc2_cast_f64(t["dist"]),
            "eid": t["eid"],
            "tlen": pc2_cast_i32(t["tlen"]),
            "proba": pc2_cast_f64(t["proba"]),
        }
        if has_ctx:
            for c in _META_COLS:
                cols[c] = t[c]
        cols["_part"] = t["_part"]
        return pa.table(cols)

    qp_rows = qp_hits.join(qparts_buckets, join_type="inner",
                           num_partitions=num_partitions,
                           on=("query_part",)) \
        .map_batches(qp_leg, batch_format="pyarrow")

    def ex_leg(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sg = _sgcol(t)
        cols = {
            "kind": pa.array(np.full(n, 2, np.int8)),
            "surface": sg,
            "query_part": pa.array([None] * n, pa.string()),
            "dist": pa.array(np.zeros(n, np.float64)),
            "eid": t["eid"],
            "tlen": pc2_cast_i32(t["tlen"]),
            "proba": pc2_cast_f64(t["proba"]),
        }
        if has_ctx:
            for c in _META_COLS:
                cols[c] = t[c]
        cols["_part"] = pa.array(_surface_bucket(sg), pa.int32())
        return pa.table(cols)

    ex_rows = key_rows.join(tabs["exact"], join_type="inner",
                            num_partitions=num_partitions,
                            on=("skey",)) \
        .map_batches(ex_leg, batch_format="pyarrow")

    ranked_slim = sp_rows.union(qp_rows).union(ex_rows) \
        .groupby("_part") \
        .map_groups(lambda t: _rank_local_expand(
            t.drop_columns(["_part"]), cfg, geo_pts=geo_pts,
            with_ctx=has_ctx), batch_format="pyarrow")
    return _attach_entmeta(ranked_slim, ["stype"] if has_ctx else [])


def attach_candidates_salted(mentions_ds, ranked_ds, salt: int = 8,
                             num_partitions: int = 4,
                             with_type: bool = False):
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
        key = t["surface"]
        if with_type:
            key = pc.binary_join_element_wise(key, t["type"], "\x1f")
        sk = pc.binary_join_element_wise(
            key, pa.array(h.astype("U"), pa.string()), "\x1e")
        return t.append_column("salt_key", sk)

    def replicate_r(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), salt),
                       pa.int64())
        rep = t.take(idx)
        shard = np.tile(np.arange(salt), n).astype("U")
        key = rep["surface"]
        if with_type:
            key = pc.binary_join_element_wise(key, rep["stype"], "\x1f")
        sk = pc.binary_join_element_wise(
            key, pa.array(shard, pa.string()), "\x1e")
        rep = rep.rename_columns(
            ["r_surface" if c == "surface" else c for c in rep.column_names])
        return rep.append_column("salt_key", sk)

    m = mentions_ds.map_batches(add_salt_m, batch_format="pyarrow")
    r = ranked_ds.map_batches(replicate_r, batch_format="pyarrow")
    joined = m.join(r, join_type="inner", num_partitions=num_partitions,
                    on=("salt_key",))
    return joined.map_batches(
        lambda t: t.drop_columns(
            [c for c in ("salt_key", "r_surface", "stype")
             if c in t.column_names]),
        batch_format="pyarrow")
