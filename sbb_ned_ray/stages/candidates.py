"""Stage: candidate generation (blocking) — actor-pool ``map_batches``.

Reproduces the reference's per-mention candidate retrieval
(``index.py:652-719`` ``best_matches`` + ranking sort ``index.py:200-205``)
against the broadcast :class:`AliasIndex` instead of a per-process Annoy
index:

* per surface part: exact + MinHash-LSH fuzzy probe at anagram angular
  distance < ``max_dist``, frequency stoplist for short parts
  (``index.py:669-674``);
* per-mention aggregation over all part hits (all hits for one mention
  are co-located in the actor → NO shuffle):
  ``match_uniqueness = Σ_parts(total_hits / hits_of_part) · |matched|``,
  ``match_coverage = len(title) / Σ len(part)``, dist summarized by max;
* ranking sort ``[match_uniqueness↓, dist↑, proba↓, match_coverage↑,
  len_guessed↑]`` then ``head(max_candidates)``.

Scale note: for a KB too large to broadcast, swap this stage for the
co-shuffle path: ``flat_map`` mentions to (block_key, …) rows, union
with KB alias rows, ``groupby(block_key)`` and emit candidates per
group, salting keys whose frequency exceeds the stoplist bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.normalization import filter_surface, normalize_chars
from sbb_ned_ray.state.alias_index import AliasIndex

CANDIDATE_SCHEMA = pa.schema([
    ("mention_row", pa.int64()),   # row index into the source mentions batch
    ("url", pa.string()),
    ("mention_id", pa.string()),
    ("surface", pa.string()),
    ("type", pa.string()),
    ("span_start", pa.int32()),    # mention span in sent_tokens space
    ("span_end", pa.int32()),
    ("sent_tokens", pa.list_(pa.string())),
    ("cand_entity", pa.int64()),
    ("candidate_title", pa.string()),
    ("qid", pa.string()),
    ("dist", pa.float64()),
    ("match_uniqueness", pa.float64()),
    ("match_coverage", pa.float64()),
    ("proba", pa.float64()),
    ("rank", pa.int32()),
])


_SCHEMA_NO_TOKENS = pa.schema(
    [f for f in CANDIDATE_SCHEMA if f.name != "sent_tokens"])


def rank_candidates(hits: list[tuple[int, str, float]], index: AliasIndex,
                    config: PipelineConfig,
                    exact_ids: frozenset[int] = frozenset(),
                    query_parts: tuple[str, ...] = (),
                    keep_all: bool = False):
    """best_matches aggregation + ranking over (entity, part, dist) hits.

    Returns list of (entity_id, dist, match_uniqueness, match_coverage,
    proba, rank) sorted per the reference sort keys, with one addition:
    ``exact_ids`` (entities whose alias equals the FULL normalized
    surface key) sort before all fuzzy-only hits — the candidate-level
    analog of the reference's exact-surface-match override
    (``decider.py:47-48``).  Without it, a flood of distance-tied fuzzy
    parts can push every exact match past the ``max_candidates`` cut.
    """
    return rank_hits(hits, config, exact_ids, query_parts,
                     get_len=lambda e: len(index.titles[e]),
                     get_proba=lambda e: float(index.probas[e]),
                     keep_all=keep_all)


def rank_hits(hits, config: PipelineConfig,
              exact_ids: frozenset[int] = frozenset(),
              query_parts: tuple[str, ...] = (),
              get_len=None, get_proba=None, keep_all: bool = False):
    """Core ranking over (entity, part, dist) hits — metadata access via
    callables so both the broadcast path (AliasIndex lookups) and the
    co-shuffle path (columns carried through the join) share it."""
    if not hits and not exact_ids:
        return []
    total_hits = float(max(1, len(hits)))
    part_hit_count: dict[str, int] = {}
    for _, part, _ in hits:
        part_hit_count[part] = part_hit_count.get(part, 0) + 1

    per_entity: dict[int, dict[str, float]] = {}
    for eid, part, dist in hits:
        d = per_entity.setdefault(eid, {})
        if part not in d or dist < d[part]:
            d[part] = dist
    # exact full-surface matches are ALWAYS candidates, even when the
    # part probe pruned them (stoplist / search_k)
    for eid in exact_ids:
        d = per_entity.setdefault(eid, {})
        for p in query_parts:
            if p not in d:
                d[p] = 0.0

    rows = []
    for eid, parts in per_entity.items():
        uniq = sum(total_hits / part_hit_count.get(p, 1) for p in parts) \
            * len(parts)
        tlen = get_len(eid)
        coverage = float(tlen) / max(1, sum(len(p) for p in parts))
        dist = max(parts.values())
        rows.append((eid, dist, uniq, coverage, get_proba(eid), tlen))
    # sort: exact-surface first, then match_uniqueness desc, dist asc,
    # proba desc, match_coverage asc, len_guessed asc (index.py:200-205);
    # entity id as final stable tiebreak
    rows.sort(key=lambda r: (0 if r[0] in exact_ids else 1,
                             -r[2], r[1], -r[4], r[3], r[5], r[0]))
    limit = len(rows) if keep_all else config.max_candidates
    out = []
    for rank, (eid, dist, uniq, cov, proba, _len) in enumerate(rows[:limit]):
        out.append((eid, dist, uniq, cov, proba, rank))
    return out


def generate_candidates_for_surface(surface: str, index: AliasIndex,
                                    config: PipelineConfig,
                                    etype: str | None = None):
    """Per-mention probe: normalized-surface exact block + per-part
    ANN-style fuzzy hits → ranked candidates (north_star: surface-form
    keys PLUS MinHash-LSH buckets), with the per-job context filters
    (geo / not-after) applied pre-truncation as in the reference.

    Redirect surface expansion (webapp/app.py:338-339): when the
    normalized surface key is a redirect source, the TARGET title acts
    as an additional surface — its alias-exact block joins ``exact``
    and its parts join the fuzzy probe.  The redirect lookup itself is
    exact-only (the reference resolves by ``.loc``)."""
    parts = filter_surface(normalize_chars(surface))
    key = " ".join(parts)
    exact = frozenset(index.alias_exact.get(key, ()))
    probe_parts = list(parts)
    redirects = getattr(index, "redirects", None)
    if redirects:
        target = redirects.get(key)
        if target is not None:
            t_parts = filter_surface(
                normalize_chars(target.replace("_", " ")))
            exact = exact | frozenset(
                index.alias_exact.get(" ".join(t_parts), ()))
            probe_parts += [p for p in t_parts if p not in parts]
    hits: list[tuple[int, str, float]] = []
    for part in probe_parts:
        ents, dists = index.probe_part(part, config.max_dist)
        for e, d in zip(ents, dists):
            hits.append((int(e), part, float(d)))
    keep_all = config.context is not None
    ranked = rank_candidates(hits, index, config, exact_ids=exact,
                             query_parts=tuple(parts), keep_all=keep_all)
    if keep_all:
        ranked = apply_context(ranked, index, config, etype, exact)
        ranked = [(eid, dist, uniq, cov, proba, rank)
                  for rank, (eid, dist, uniq, cov, proba, _) in
                  enumerate(ranked[:config.max_candidates])]
    return ranked


def _haversine_km(lat1, lon1, lat2, lon2) -> float:
    """Great-circle distance in km (reference index.py:99-109 uses the
    `haversine` package with its default km unit)."""
    import math
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + \
        math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def geo_points_from_context(config: PipelineConfig, qid_to_latlon) -> list:
    """Resolve the context's geographic qids to (lat, lon) points.
    ``qid_to_latlon``: qid → (lat, lon) | None."""
    ctx = config.context or {}
    geo = ctx.get("geographic")
    if geo is None:
        return []
    if isinstance(geo, str):
        geo = [geo]
    pts = []
    for q in geo:
        p = qid_to_latlon(q)
        if p is not None and not np.isnan(p[0]) and not np.isnan(p[1]):
            pts.append(p)
    return pts


def apply_context_core(rows, config: PipelineConfig, etype: str | None,
                       exact_ids: frozenset[int], geo_pts: list,
                       get_latlon, get_birth, get_inception, get_len):
    """Per-job context filters over pre-truncation ranked rows
    (reference ``index.py:75-197``) — metadata access via callables so
    the broadcast path (AliasIndex lookups) and the co-shuffle path
    (columns carried through the join) share one implementation:

    * ``geographic`` (LOC/ORG mentions): re-sort with ``geo_dist`` (min
      haversine to any context entity) inserted after ``dist``.  NOTE:
      the reference computes this sort but drops its result
      (``index.py:111-112`` — ``sort_values`` without assignment); we
      implement the evident intent and document the deviation here.
    * ``time.not_after_datetime``: keep rows with both dates null OR
      inception < t OR dateofbirth < t (``index.py:119-131``).
    * ``time.not_after_year``: keep rows where (dob null or birth year
      < y) AND (inception null or inception year < y)
      (``index.py:141-163``).
    * ``time.birth_not_after_year`` (PER mentions): dob null or birth
      year < y (``index.py:178-197``).

    ``get_birth`` / ``get_inception`` return a ``pd.Timestamp`` or
    ``None``; ``get_latlon`` returns (lat, lon) floats (NaN = absent).
    """
    import pandas as pd

    ctx = config.context
    if not ctx or not rows:
        return rows
    if "geographic" in ctx and etype in ("LOC", "ORG"):
        def geo_dist(eid: int) -> float:
            lat, lon = get_latlon(eid)
            if np.isnan(lat) or np.isnan(lon) or not geo_pts:
                return float("inf")
            return min(_haversine_km(lat, lon, p[0], p[1])
                       for p in geo_pts)

        return sorted(rows, key=lambda r: (
            0 if r[0] in exact_ids else 1, -r[2], r[1], geo_dist(r[0]),
            -r[4], r[3], get_len(r[0]), r[0]))
    time_ctx = ctx.get("time") or {}
    if "not_after_datetime" in time_ctx:
        t = pd.to_datetime(time_ctx["not_after_datetime"])

        def keep(eid: int) -> bool:
            dob = get_birth(eid)
            inc = get_inception(eid)
            if dob is None and inc is None:
                return True
            return (inc is not None and inc < t) or \
                   (dob is not None and dob < t)

        return [r for r in rows if keep(r[0])]
    if "not_after_year" in time_ctx:
        y = time_ctx["not_after_year"]

        def keep_y(eid: int) -> bool:
            dob = get_birth(eid)
            inc = get_inception(eid)
            return (dob is None or dob.year < y) and \
                   (inc is None or inc.year < y)

        return [r for r in rows if keep_y(r[0])]
    if "birth_not_after_year" in time_ctx and etype == "PER":
        y = time_ctx["birth_not_after_year"]
        return [r for r in rows
                if get_birth(r[0]) is None or get_birth(r[0]).year < y]
    return rows


def apply_context(rows, index: AliasIndex, config: PipelineConfig,
                  etype: str | None, exact_ids: frozenset[int]):
    """Broadcast-path wrapper of :func:`apply_context_core` reading
    metadata from the AliasIndex."""
    import pandas as pd

    if not config.context or not rows:
        return rows

    def qid_to_latlon(q):
        e = index.qid_to_eid.get(q)
        if e is None:
            return None
        return (index.latitudes[e], index.longitudes[e])

    def as_ts(v):
        return None if v is None else pd.Timestamp(v)

    return apply_context_core(
        rows, config, etype, exact_ids,
        geo_pts=geo_points_from_context(config, qid_to_latlon),
        get_latlon=lambda e: (index.latitudes[e], index.longitudes[e]),
        get_birth=lambda e: as_ts(index.birth_dates[e]),
        get_inception=lambda e: as_ts(index.inception_dates[e]),
        get_len=lambda e: len(index.titles[e]))


class CandidateGenerator:
    """Actor-pool stage: AliasIndex fetched once per actor in __init__.

    ``include_tokens=False`` (used by the fused worker) omits the fat
    ``sent_tokens`` list column from the output — it is duplicated per
    candidate (~max_candidates×) and the fused scorer reads mention
    tokens from the mentions table instead.
    """

    def __init__(self, index_ref, config: PipelineConfig | None = None,
                 include_tokens: bool = True):
        import ray
        self.index: AliasIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef)
            else index_ref)
        self.config = config or PipelineConfig()
        self.include_tokens = include_tokens
        self._cache: dict[str, list] = {}

    def _ranked_arrays(self, surface: str, etype: str | None = None):
        """Cached per-surface ranked candidates as numpy columns
        (eids, dist, uniq, cov, proba, rank).  The cache key includes
        the mention type only when a context is set (the geo/date
        filters are type-dependent)."""
        key = (surface, etype) if self.config.context is not None \
            else surface
        arr = self._cache.get(key)
        if arr is None:
            ranked = generate_candidates_for_surface(
                surface, self.index, self.config, etype=etype)
            if ranked:
                eids, dist, uniq, cov, proba, rank = \
                    (np.asarray(c) for c in zip(*ranked))
            else:
                eids = np.zeros(0, dtype=np.int64)
                dist = uniq = cov = proba = np.zeros(0)
                rank = np.zeros(0, dtype=np.int64)
            arr = (eids.astype(np.int64), dist.astype(np.float64),
                   uniq.astype(np.float64), cov.astype(np.float64),
                   proba.astype(np.float64), rank.astype(np.int32))
            if len(self._cache) > 100_000:
                self._cache.clear()
            self._cache[key] = arr
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        schema = CANDIDATE_SCHEMA if self.include_tokens else \
            _SCHEMA_NO_TOKENS
        n = batch.num_rows
        if n == 0:
            return schema.empty_table()
        surfaces = batch["surface"].to_pylist()
        types = batch["type"].to_pylist()
        per_row = [self._ranked_arrays(s, et)
                   for s, et in zip(surfaces, types)]
        counts = np.fromiter((len(a[0]) for a in per_row),
                             dtype=np.int64, count=n)
        row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        take_rows = pa.array(row_idx, pa.int64())
        eids = np.concatenate([a[0] for a in per_row]) if n else \
            np.zeros(0, dtype=np.int64)
        if not hasattr(idx, "_titles_arr"):
            idx._titles_arr = pa.array(idx.titles, pa.string())
            idx._qids_arr = pa.array(idx.qids, pa.string())
        eid_arr = pa.array(eids, pa.int64())
        data = {
            "mention_row": take_rows,   # row index into the mentions batch
            "url": batch["url"].take(take_rows),
            "mention_id": batch["mention_id"].take(take_rows),
            "surface": batch["surface"].take(take_rows),
            "type": batch["type"].take(take_rows),
            "span_start": batch["span_start"].take(take_rows),
            "span_end": batch["span_end"].take(take_rows),
            "cand_entity": eid_arr,
            "candidate_title": pc.take(idx._titles_arr, eid_arr),
            "qid": pc.take(idx._qids_arr, eid_arr),
            "dist": pa.array(np.concatenate([a[1] for a in per_row]),
                             pa.float64()),
            "match_uniqueness": pa.array(
                np.concatenate([a[2] for a in per_row]), pa.float64()),
            "match_coverage": pa.array(
                np.concatenate([a[3] for a in per_row]), pa.float64()),
            "proba": pa.array(np.concatenate([a[4] for a in per_row]),
                              pa.float64()),
            "rank": pa.array(
                np.concatenate([a[5] for a in per_row]).astype(np.int32),
                pa.int32()),
        }
        if self.include_tokens:
            data["sent_tokens"] = batch["sent_tokens"].take(take_rows)
        return pa.table({name: data[name] for name in schema.names})


def generate_candidates(mentions_ds, index_ref,
                        config: PipelineConfig | None = None,
                        batch_size: int = 1024, concurrency=None,
                        **ray_remote_kwargs):
    kwargs = dict(ray_remote_kwargs)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return mentions_ds.map_batches(
        CandidateGenerator, fn_constructor_args=(index_ref, config),
        batch_format="pyarrow", batch_size=batch_size, **kwargs)
