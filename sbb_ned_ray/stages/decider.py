"""Stage: per-mention decision.

Reference: a RandomForest "decider" aggregates per-candidate statistics
of the pair scores into a final linking probability
(``models/decider.py:82-167`` features, ``14-79`` decision), with
``quantiles = linspace(0.1, 1, 10)`` and
``rank_intervalls = linspace(0.001, 0.1, 100)``
(``classifier_decider_queue.py:125-126``).  Decision rule
(``decider.py:46-50``): keep candidates with ``proba_1 ≥ threshold`` OR
an exact surface match, sort ``[proba_1 desc, case_rank_min asc]``.

Ray-Data realization — two paths:

* **Flagship path** (scale): partial per-(mention, candidate) combine
  inside ``map_batches`` (max/cnt/sum/min-rank of scores — narrow rows,
  token lists already dropped), then ONE ``groupby(mention_key)``
  shuffle and a tiny ``map_groups`` decision.  ``proba_1 = max p1`` —
  identical to the stub cross-encoder's calibration, so no model
  artifact is needed.
* **Feature-parity path**: :func:`decider_features` reproduces the full
  case/overall/diff statistics + ``among_top`` rank-interval features
  for a (trained, pluggable) sklearn-style decider — used by the eval
  harness / training jobs and unit-tested against golden fixtures.

The ``groupby(mention_key)`` replaces the reference's sentinel-based
per-entity gather (``ned_lookup.py:425-438``); mentions whose candidates
were all filtered out simply have no rows (the reference emits ``{}``,
``decider.py:33-37`` — same downstream meaning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.normalization import normalized_surface_key

QUANTILES = np.linspace(0.1, 1, 10)
RANK_INTERVALLS = np.linspace(0.001, 0.1, 100)

LINK_SCHEMA = pa.schema([
    ("mention_key", pa.string()),
    ("url", pa.string()),
    ("mention_id", pa.string()),
    ("surface", pa.string()),
    ("candidate_title", pa.string()),
    ("qid", pa.string()),
    ("proba_1", pa.float64()),
    ("n_pairs", pa.int64()),
    ("out_rank", pa.int32()),
])


def add_mention_key(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    key = pc.binary_join_element_wise(batch["url"], batch["mention_id"], "\x1f")
    return batch.append_column("mention_key", key)


def partial_candidate_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse scored pairs to per-(mention,candidate)
    partials BEFORE the shuffle (pre-aggregation, SURVEY.md §4 skew row)."""
    df = batch.select(["mention_key", "url", "mention_id", "surface",
                       "candidate_title", "qid", "rank", "proba",
                       "p1", "score"]).to_pandas()
    g = df.groupby(["mention_key", "candidate_title", "qid"], sort=False)
    out = g.agg(
        url=("url", "first"), mention_id=("mention_id", "first"),
        surface=("surface", "first"),
        rank=("rank", "first"), proba=("proba", "first"),
        p1_max=("p1", "max"), score_sum=("score", "sum"),
        n_pairs=("p1", "size")).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False)


def _map_unique(series: pd.Series, fn) -> np.ndarray:
    """Apply ``fn`` once per unique value (vectorized map for string UDFs)."""
    mapping = {v: fn(v) for v in series.unique()}
    return series.map(mapping).to_numpy()


DECIDER_FEATURES = ["p1_max", "score_mean", "n_pairs", "rank", "proba",
                    "surf_match", "p1_diff_from_max", "overall_p1_mean",
                    "n_candidates"]


def decider_feature_matrix(g: pd.DataFrame,
                           surf_match: np.ndarray | None = None
                           ) -> np.ndarray:
    """Per-candidate model features, VECTORIZED over many mentions'
    merged partials (the scalable projection of the reference's
    case/overall/diff statistics, ``models/decider.py:82-167``; the
    full quantile feature set lives in :func:`decider_features` for the
    parity/eval path).  Columns = :data:`DECIDER_FEATURES`."""
    if surf_match is None:
        surf_keys = _map_unique(g["surface"], normalized_surface_key)
        title_keys = _map_unique(
            g["candidate_title"],
            lambda t: normalized_surface_key(t.replace("_", " ")))
        surf_match = (surf_keys == title_keys)
    grp = g.groupby("mention_key", sort=False)["p1_max"]
    overall_max = grp.transform("max").to_numpy()
    overall_mean = grp.transform("mean").to_numpy()
    n_cands = grp.transform("size").to_numpy()
    p1 = g["p1_max"].to_numpy()
    n_pairs = g["n_pairs"].to_numpy().astype(np.float64)
    return np.column_stack([
        p1,
        g["score_sum"].to_numpy() / np.maximum(1.0, n_pairs),
        n_pairs,
        g["rank"].to_numpy().astype(np.float64),
        g["proba"].to_numpy(),
        surf_match.astype(np.float64),
        p1 - overall_max,
        overall_mean,
        n_cands.astype(np.float64),
    ])


def _decide_partition(df: pd.DataFrame, threshold: float,
                      model=None, feature_names=None) -> pd.DataFrame:
    """Vectorized decision over MANY mentions' candidate partials at once.

    All rows of one mention must be in ``df`` (guaranteed by the
    hash-partition shuffle in :func:`decide_from_partials`).

    ``model``: a fitted sklearn-style classifier (reference RandomForest
    decider, ``models/decider.py:14-79``); its ``predict_proba`` over
    :func:`decider_feature_matrix` replaces ``p1_max`` as ``proba_1``.
    Without one, ``proba_1 = p1_max`` (the stub-calibrated identity).
    """
    empty = pd.DataFrame(columns=[f.name for f in LINK_SCHEMA])
    if df.empty:
        return empty
    # merge partials that crossed batch boundaries — keyed by ENTITY
    # identity (title, qid), not title alone: titles are unique in a
    # Wikipedia-style KB but the engine must not silently fuse two
    # entities if a KB violates that
    g = df.groupby(["mention_key", "candidate_title", "qid"],
                   sort=False).agg(
        url=("url", "first"), mention_id=("mention_id", "first"),
        surface=("surface", "first"),
        rank=("rank", "min"), proba=("proba", "first"),
        p1_max=("p1_max", "max"), score_sum=("score_sum", "sum"),
        n_pairs=("n_pairs", "sum")).reset_index()
    surf_keys = _map_unique(g["surface"], normalized_surface_key)
    title_keys = _map_unique(
        g["candidate_title"],
        lambda t: normalized_surface_key(t.replace("_", " ")))
    surf_match = (surf_keys == title_keys)
    if model is not None:
        # the artifact's feature layout must match the matrix we build —
        # an older/reordered pickle would otherwise silently score
        # garbage (ADVICE round 2)
        if feature_names is not None and \
                list(feature_names) != DECIDER_FEATURES:
            raise ValueError(
                "decider model artifact feature layout "
                f"{list(feature_names)} != expected {DECIDER_FEATURES}; "
                "retrain the artifact (models/decider_model.py)")
        X = decider_feature_matrix(g, surf_match)
        g["proba_1"] = model.predict_proba(X)[:, 1]
    else:
        g["proba_1"] = g["p1_max"]
    keep = (g["proba_1"].to_numpy() >= threshold) | surf_match
    g = g.loc[keep]
    if g.empty:
        return empty
    g = g.sort_values(["mention_key", "proba_1", "rank",
                       "candidate_title", "qid"],
                      ascending=[True, False, True, True, True],
                      kind="mergesort").reset_index(drop=True)
    g["out_rank"] = g.groupby("mention_key", sort=False).cumcount() \
        .to_numpy(dtype=np.int32)
    return g[[f.name for f in LINK_SCHEMA]]


def _decide_group(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """One mention's candidate partials → ranked accepted links
    (single-group wrapper around the vectorized kernel; kept for unit
    tests / API compatibility)."""
    return _decide_partition(group, threshold)


# Worker-process-global decider-model cache: the pickled model artifact
# is loaded once per worker (path must be reachable from every node —
# shared storage at cluster scale, /tmp on the single-node harness).
_MODEL_CACHE: dict[str, dict] = {}


def decider_model_kwargs(config: PipelineConfig | None) -> dict:
    """→ ``{model, feature_names}`` for :func:`_decide_partition` when
    ``config.decider_model_path`` is set, else ``{}``."""
    cfg = config or PipelineConfig()
    path = cfg.decider_model_path
    if not path:
        return {}
    art = _MODEL_CACHE.get(path)
    if art is None:
        from sbb_ned_ray.models.decider_model import load_decider
        art = load_decider(path)
        _MODEL_CACHE[path] = art
    return {"model": art["model"],
            "feature_names": art["feature_names"]}


def decide_from_partials(partials_ds, config: PipelineConfig | None = None):
    """per-(mention,candidate) partials → ranked links.

    THE shuffle — but NOT ``groupby(mention_key).map_groups`` per
    mention (one Python/pandas call per group is ~15 ms of overhead ×
    millions of mentions).  Instead: hash-partition on ``mention_key``
    into ``cfg.decide_partitions`` buckets, then one **vectorized**
    pandas kernel per bucket.  Co-location of a mention's rows is
    preserved (same key → same hash bucket); per-call overhead is paid
    ``decide_partitions`` times, not once per mention.
    """
    cfg = config or PipelineConfig()
    threshold = cfg.threshold
    nparts = cfg.decide_partitions

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (pd.util.hash_pandas_object(
            df["mention_key"], index=False).to_numpy() % nparts
        ).astype(np.int32)
        return df

    def decide_block(df: pd.DataFrame) -> pd.DataFrame:
        return _decide_partition(df.drop(columns=["_part"]), threshold,
                                 **decider_model_kwargs(cfg))

    return (partials_ds
            .map_batches(add_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(decide_block, batch_format="pandas"))


def decide(scored_pairs_ds, config: PipelineConfig | None = None):
    """scored pairs → per-mention ranked links (one shuffle on mention_key)."""
    partials = (scored_pairs_ds
                .map_batches(add_mention_key, batch_format="pyarrow")
                .map_batches(partial_candidate_agg, batch_format="pyarrow"))
    return decide_from_partials(partials, config)


def top_links(links_ds):
    """rank-0 rows only: the per-mention decision."""
    import pyarrow.compute as pc
    return links_ds.map_batches(
        lambda t: t.filter(pc.equal(t["out_rank"], 0)),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Feature-parity path (training / eval; reference decider.py:82-167)
# ---------------------------------------------------------------------------

_STAT_FUNCS = ("min", "max", "mean", "std", "median")


def _stats_block(df: pd.DataFrame, prefix: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for col in df.columns:
        s = df[col]
        out[f"{prefix}_{col}_min"] = float(s.min()) if len(s) else np.nan
        out[f"{prefix}_{col}_max"] = float(s.max()) if len(s) else np.nan
        out[f"{prefix}_{col}_mean"] = float(s.mean()) if len(s) else np.nan
        out[f"{prefix}_{col}_std"] = float(s.std()) if len(s) else np.nan
        out[f"{prefix}_{col}_median"] = float(s.median()) if len(s) else np.nan
        if len(s):
            qs = s.quantile(q=QUANTILES)
            for q, v in zip(QUANTILES, qs):
                out[f"{prefix}_{col}_q{q:.1f}"] = float(v)
        else:
            for q in QUANTILES:
                out[f"{prefix}_{col}_q{q:.1f}"] = np.nan
    return out


def decider_features(decision: pd.DataFrame, candidates: pd.DataFrame,
                     quantiles=QUANTILES, rank_intervalls=RANK_INTERVALLS,
                     min_pairs: float = np.inf, max_pairs: float = np.inf,
                     wikidata_gt: str | None = None, seed: int = 42
                     ) -> pd.DataFrame:
    """Per-candidate feature rows for one mention.

    ``decision``: pair-level frame with at least [guessed_title, scores];
    ``candidates``: candidate-level frame with [guessed_title, + numeric
    metadata].  Reproduces the semantics of reference
    ``models/decider.py:82-167``: case/overall/diff stats over numeric
    columns + ``among_top`` cumulative-rank features.

    Training-time augmentation (``decider.py:126-140``): when the GOLD
    candidate (``wikidata`` column == ``wikidata_gt``) has more than
    ``max_pairs`` pair rows, its feature row is emitted
    ``ceil((n − max_pairs)/10) + 1`` times, each over a random subset
    of ``randint(min_pairs, max_pairs)`` pairs — oversampling the
    positive class with jittered statistics.  Seeded here
    (deterministic, resumable) where the reference uses the global
    RNG; inference passes no gt and gets exactly one row per candidate.
    """
    if decision is None or len(decision) == 0:
        return pd.DataFrame()
    rng = np.random.default_rng(seed)
    cand = candidates.copy()
    if "surface" in cand.columns:
        cand = cand.drop(columns=["surface"])
    n = len(cand)
    cand = cand.reset_index(drop=True)
    cand["rank"] = [r / (n - 1 if n > 1 else 1) for r in range(n)]
    dec = decision.sort_values("scores", ascending=False).reset_index(drop=True)
    use_cols = [c for c in cand.columns
                if c == "guessed_title" or c not in dec.columns]
    dec = dec.merge(cand[use_cols], on="guessed_title")

    rows = []
    numeric = dec.select_dtypes(exclude=["object"])
    for title, part in dec.groupby("guessed_title", sort=True):
        other = numeric.loc[dec.guessed_title != title]
        overall = _stats_block(other, "overall")
        occur = (dec.guessed_title == title)
        cum = occur.cumsum() / max(1, occur.sum())
        pos = np.array([p / (len(cum) - 1 if len(cum) > 1 else 1)
                        for p in range(len(cum))])
        among = {}
        for p in rank_intervalls:
            mask = pos < p
            among[f"among_top_{p}"] = float(cum[mask].max()) if mask.any() else np.nan
        part_num = part.select_dtypes(exclude=["object"])
        wikidata = part["wikidata"].iloc[0] \
            if "wikidata" in part.columns else None
        repeats = 1
        if len(part_num) > max_pairs and wikidata is not None \
                and wikidata == wikidata_gt:
            repeats = int(np.ceil((len(part_num) - max_pairs) / 10) + 1)
        for _ in range(repeats):
            if len(part_num) > max_pairs:
                take = int(rng.integers(min_pairs, max_pairs))
                sub = part_num.iloc[rng.permutation(len(part_num))[:take]]
            else:
                sub = part_num
            case = _stats_block(sub, "case")
            diff = {("diff" + k[len("case"):]):
                    case[k] - overall["overall" + k[len("case"):]]
                    for k in case}
            row = {**case, **overall, **diff, **among,
                   "guessed_title": title}
            if wikidata_gt is not None and wikidata is not None:
                row["label"] = float(wikidata == wikidata_gt)
                row["wikidata"] = wikidata
            rows.append(row)
    return pd.DataFrame(rows)
