"""The flagship NED pipeline: pages → links → clusters.

Stage graph (SURVEY.md §7.1):

    read_parquet(pages)                      [source, columns pruned]
    → map_batches(extract_text)              [stateless tasks]
    → map_batches(MentionDetector)           [actor pool, broadcast trie]
    → map_batches(CandidateGenerator)        [actor pool, broadcast index]
    → map_batches(PairBuilder)               [actor pool, broadcast KB]
    → map_batches(Scorer)                    [actor pool; GPU-ready slot]
    → map_batches(partial_candidate_agg)     [pre-shuffle combiner]
    → groupby(mention_key).map_groups(decide)   [THE shuffle]
    → union-find transitive clustering       [driver: ≤1 edge/mention]

The KB-side state (AliasIndex) is built once on the driver and
broadcast with ``ray.put`` — read by every actor in ``__init__``,
never re-shipped per batch.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

import ray

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.sources.pages import (
    read_kb_sentences,
    read_redirects,
    read_kb_table,
    read_pages,
)
from sbb_ned_ray.stages.candidates import generate_candidates
from sbb_ned_ray.stages.cluster import cluster_links
from sbb_ned_ray.stages.decider import decide, decide_from_partials, top_links
from sbb_ned_ray.stages.extract import extracted_pages
from sbb_ned_ray.stages.mentions import detect_mentions
from sbb_ned_ray.stages.pairs import build_pairs
from sbb_ned_ray.stages.scorer import DeterministicOverlapScorer, score_pairs
from sbb_ned_ray.state.alias_index import build_alias_index


def _pool_size(cfg: PipelineConfig, reserve: int = 2) -> tuple[int, int]:
    """FIXED actor-pool size: (ncpus − reserve) on both bounds.

    The reserve keeps CPUs free for the read tasks and the decider
    shuffle so the pool never starves them on a small node.  A fixed
    pool (min == max) beats autoscaling here: the worker stage is the
    whole pipeline's throughput, and Ray's lazy scale-up otherwise
    processes much of the stream with a partially-ramped pool (observed
    3-5× wall-time variance between identical runs).
    """
    if cfg.cpu_concurrency is not None:
        return (cfg.cpu_concurrency, cfg.cpu_concurrency)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cap = max(2, ncpu - reserve)
    return (cap, cap)


def build_ned_links(fixture_dir: str, config: PipelineConfig | None = None,
                    scorer_cls=DeterministicOverlapScorer,
                    kb_table: pa.Table | None = None,
                    pages_ds=None, split_scorer: bool = False,
                    index_ref=None):
    """pages + KB → ranked per-mention links Dataset (lazy until consumed).

    Default: ONE fused actor pool (NedWorker) for the mention-local
    prefix, then the single ``groupby(mention_key)`` shuffle.
    ``split_scorer=True`` runs the cross-encoder as its own pool (the
    GPU deployment shape): extract+detect+candidates+pairs in the fused
    pool, scorer separately with ``scorer_batch_size`` batches.
    ``index_ref``: pre-broadcast AliasIndex (``ray.put``) to reuse
    across multiple calls (e.g. the resumable per-partition runner).
    """
    cfg = config or PipelineConfig()
    if index_ref is None:
        kb = kb_table if kb_table is not None else read_kb_table(fixture_dir)
        index_ref = ray.put(build_alias_index(
            kb, cfg, sentences=read_kb_sentences(fixture_dir),
        redirects=read_redirects(fixture_dir)))
    conc = _pool_size(cfg)

    if pages_ds is not None:
        pages = pages_ds
    else:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # 2 blocks per CPU: measured best on the 100k-page profile — at
        # 4x/CPU the per-task fixed cost (worker-cache hit, arrow
        # (de)serialization) inflates total CPU-seconds ~15%
        nblocks = cfg.read_num_blocks or max(16, 2 * ncpu)
        pages = read_pages(fixture_dir,
                           columns=["url", "warc_ts", "html", "lang"],
                           override_num_blocks=nblocks)

    if not split_scorer:
        from sbb_ned_ray.stages.fused import ned_task_fn
        # TASK pool (not actors): per-worker-process state caching in
        # ned_task_fn gives the same once-per-worker index/evidence
        # setup while avoiding the actor-pool startup cliff
        if cfg.local_decide:
            # decision fused into the task — zero-shuffle flagship path
            # (exact: mentions are batch-local; see ned_task_fn)
            return pages.map_batches(
                ned_task_fn(index_ref, cfg, decide_local=True),
                batch_format="pyarrow", batch_size=cfg.batch_size)
        partials = pages.map_batches(
            ned_task_fn(index_ref, cfg),
            batch_format="pyarrow", batch_size=cfg.batch_size)
        return decide_from_partials(partials, cfg)

    # split path: four concurrent actor pools share the node — each
    # actor claims HALF a CPU so all four pools plus the decide shuffle
    # fit even tiny clusters (four 1-CPU pools on a 4-CPU node would pin
    # every slot and deadlock the downstream sort); the scorer pool is
    # where a GPU deployment adds num_gpus
    per_stage = (max(1, conc[0] // 4), max(1, conc[1] // 4))
    frac = {"num_cpus": 0.5}
    pages = extracted_pages(pages)
    mentions = detect_mentions(pages, index_ref,
                               batch_size=cfg.batch_size,
                               concurrency=per_stage, **frac)
    candidates = generate_candidates(mentions, index_ref, cfg,
                                     batch_size=cfg.batch_size,
                                     concurrency=per_stage, **frac)
    pairs = build_pairs(candidates, index_ref, cfg,
                        batch_size=cfg.batch_size, concurrency=per_stage,
                        **frac)
    scorer_res = dict(frac)
    if cfg.scorer_num_gpus:
        # the GPU deployment shape: cross-encoder actors own GPU slots,
        # CPU share drops to a sliver (the GPU is the resource)
        scorer_res = {"num_cpus": 0.1, "num_gpus": cfg.scorer_num_gpus}
    scored = score_pairs(pairs, cfg, scorer_cls=scorer_cls,
                         concurrency=per_stage, **scorer_res)
    return decide(scored, cfg)


def run_ned(fixture_dir: str, config: PipelineConfig | None = None
            ) -> pd.DataFrame:
    """Run the flagship pipeline; returns the per-mention top-1 links with
    transitive cluster ids (driver-side frame — one row per linked
    mention, small relative to input)."""
    links = top_links(build_ned_links(fixture_dir, config))
    df = links.to_pandas()
    if df.empty:
        df = pd.DataFrame(columns=["mention_key", "url", "mention_id",
                                   "surface", "candidate_title", "qid",
                                   "proba_1", "n_pairs", "out_rank"])
    return cluster_links(df)


def run_ned_shuffle_kb(fixture_dir: str, config: PipelineConfig | None = None,
                       num_partitions: int = 4, salt: int = 4,
                       evidence: str = "broadcast",
                       block_artifact_dir: str | None = None
                       ) -> pd.DataFrame:
    """Flagship pipeline in the LARGE-KB shape: candidate generation via
    the co-shuffle blocking path (``stages/blocking``: blocking-key hash
    joins + groupby(surface) ranking + SALTED attach join) instead of
    the broadcast AliasIndex probe, then generic fused scoring and the
    ``groupby(mention_key)`` decide (mention rows span batches after the
    join, so the local-decide shortcut does not apply).  Top-1 links are
    identical to :func:`run_ned` (asserted in tests/test_e2e_ray.py).

    ``evidence`` selects where per-candidate evidence sentences come
    from: ``"broadcast"`` reads them from the broadcast AliasIndex
    (right while the sentence KB fits the object store); ``"shuffle"``
    streams ``kb_sentences.parquet`` and co-shuffle joins it with the
    candidates on ``qid``
    (:func:`sbb_ned_ray.stages.pairs.attach_evidence_shuffle`) — the
    fully-broadcast-free shape for a sentence KB that exceeds the
    object store.  Both produce identical links (parity-tested).

    Cost profile (20k pages, 32 CPUs, round 4 local-expand blocking):
    18/23/60 s at 1.5k/6k/24k entities vs 3.7/6.9/18.4 s broadcast —
    the ratio FALLS with KB size (4.9→3.4→3.3) because the blocking
    exchange ships narrow legs (surface parts + part matches × buckets
    + exact keys), never the (surface, part) × entity expansion
    (BASELINE.md round-4).  The residual ~3× is hash-join/aggregator
    startup across the narrow exchanges — a FIXED cost that amortizes
    at real KB scale, which is the only regime this path is for; below
    the object-store threshold use :func:`run_ned` (or let
    :func:`run_ned_auto` choose).
    ``block_artifact_dir`` persists the KB blocking tables as parquet
    (build-index job); at toy KB sizes reading them back costs more
    than rebuilding, at real scale it is the difference between an
    index build and a lookup.
    """
    import pyarrow.compute as pc

    from sbb_ned_ray.stages.blocking import (
        attach_candidates_salted,
        ranked_candidates_via_shuffle,
    )
    from sbb_ned_ray.stages.fused import FusedPairScorer

    cfg = config or PipelineConfig()
    kb = read_kb_table(fixture_dir)
    index_ref = ray.put(build_alias_index(
        kb, cfg, sentences=read_kb_sentences(fixture_dir),
        redirects=read_redirects(fixture_dir)))
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nblocks = cfg.read_num_blocks or max(16, 2 * ncpu)
    pages = extracted_pages(read_pages(
        fixture_dir, columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=nblocks))
    # actor pools sized to HALF the node (num_cpus=0.5 each): the other
    # half stays free for the join/aggregate exchanges running
    # concurrently
    pool = (1, max(4, ncpu))
    # materialized: consumed by TWO branches (distinct surfaces for the
    # blocking joins, encoded mention rows for the attach join) — lazy,
    # the whole read→extract→detect prefix would re-execute per branch
    # and its actor pools would deadlock a small node
    mentions = detect_mentions(pages, index_ref,
                               batch_size=cfg.batch_size,
                               as_tasks=True).materialize()
    has_ctx = cfg.context is not None
    kb_tables = None
    if block_artifact_dir is not None:
        # one-time build-index artifacts: reruns pay only the
        # mention-side joins
        from sbb_ned_ray.stages.blocking import (
            load_block_tables,
            save_block_tables,
        )
        kb_tables = load_block_tables(save_block_tables(
            kb, cfg, block_artifact_dir, num_partitions,
            with_meta=has_ctx))
    # second DAG cut: the ranked table is small (≤ max_candidates rows
    # per distinct surface) and feeds the salted attach join — keeping
    # it lazy would chain the blocking joins into the attach/score/
    # decide segment and overrun the executor's all-to-all budget
    ranked = ranked_candidates_via_shuffle(
        mentions, kb, cfg, num_partitions=num_partitions,
        kb_tables=kb_tables,
        redirects=read_redirects(fixture_dir)).materialize()

    # pyarrow hash joins cannot carry list<string> payload columns —
    # pack the mention tokens into one \x00-joined string around the
    # join (vectorized kernels both ways)
    def enc(t: pa.Table) -> pa.Table:
        joined = pc.binary_join(t["sent_tokens"], "\x00")
        return t.drop_columns(["sent_tokens"]) \
            .append_column("sent_tokens_enc", joined)

    mentions_enc = mentions.map_batches(enc, batch_format="pyarrow")
    # the scorer decodes sent_tokens_enc lazily, once per MENTION —
    # arrow-splitting the column here would materialize the token list
    # duplicated across every candidate row
    cands = attach_candidates_salted(mentions_enc, ranked, salt=salt,
                                     num_partitions=num_partitions,
                                     with_type=has_ctx)
    if evidence == "shuffle":
        import ray.data as rd

        from sbb_ned_ray.stages.decider import decide
        from sbb_ned_ray.stages.pairs import attach_evidence_shuffle
        from sbb_ned_ray.stages.scorer import score_pairs

        sent_path = os.path.join(fixture_dir, "kb_sentences.parquet")
        if not os.path.exists(sent_path):
            raise FileNotFoundError(
                f"evidence='shuffle' needs {sent_path} (the sentence KB)")
        sentences_ds = rd.read_parquet(sent_path)
        pairs = attach_evidence_shuffle(
            cands, sentences_ds, cfg,
            num_partitions=max(16, num_partitions * 4),
            index_ref=index_ref)
        # task pool, not actors — the default CPU scorer pays the
        # autoscaling actor ramp otherwise (profiled round 3: 7.2 s →
        # task-pool parity with the fused path)
        scored = score_pairs(pairs, cfg, as_tasks=True)
        links = decide(scored, cfg)
    else:
        # batch unit here is CANDIDATE rows (narrow), not pages — use the
        # scorer batch size.  TASK pool with a worker-global scorer cache
        # (scorer_task_fn), not an actor pool: the autoscaling actor ramp
        # dominated this stage's wall at sf0.1 (profiled round 3)
        from sbb_ned_ray.stages.fused import scorer_task_fn
        partials = cands.map_batches(
            scorer_task_fn(index_ref, cfg),
            batch_format="pyarrow", batch_size=cfg.scorer_batch_size)
        links = decide_from_partials(partials, cfg)
    top = links.map_batches(
        lambda t: t.filter(pc.equal(t["out_rank"], 0)),
        batch_format="pyarrow")
    df = top.to_pandas()
    if df.empty:
        return df
    return cluster_links(df)


# measured pickle(AliasIndex) / uncompressed-parquet-bytes on synthetic
# KBs at 80/400/1500 entities: 2.78 / 2.01 / 1.80 (trending down);
# 2.5 is the conservative upper band for the selector below
KB_INDEX_EXPANSION = 2.5


def estimate_kb_index_bytes(fixture_dir: str,
                            expansion: float = KB_INDEX_EXPANSION) -> int:
    """Estimated serialized AliasIndex size WITHOUT building it: the
    uncompressed byte size of everything the index build reads
    (kb_entities + kb_sentences + redirects parquet row-group metadata)
    × the measured pickle-expansion band.  Metadata-only — no data
    pages are read."""
    import pyarrow.parquet as pq
    total = 0
    for name in ("kb_entities", "kb_sentences", "redirects"):
        p = os.path.join(fixture_dir, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        md = pq.ParquetFile(p).metadata
        total += sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
    return int(total * expansion)


def select_ned_path(fixture_dir: str,
                    broadcast_fraction: float = 0.25,
                    expansion: float = KB_INDEX_EXPANSION
                    ) -> tuple[str, dict]:
    """Pick broadcast vs co-shuffle blocking by KB footprint: broadcast
    while the estimated serialized AliasIndex fits a bounded fraction
    of the object store (it is ``ray.put`` once and read by every
    worker), co-shuffle beyond that.  Returns ("broadcast"|"shuffle",
    info-dict) — the decision a production engine must make itself
    instead of asking the caller (round-3 verdict item 4)."""
    est = estimate_kb_index_bytes(fixture_dir, expansion)
    store = int(ray.cluster_resources().get("object_store_memory", 0))
    budget = int(store * broadcast_fraction)
    path = "broadcast" if est <= budget else "shuffle"
    return path, {"estimated_index_bytes": est,
                  "object_store_bytes": store,
                  "broadcast_budget_bytes": budget,
                  "broadcast_fraction": broadcast_fraction}


def run_ned_auto(fixture_dir: str, config: PipelineConfig | None = None,
                 broadcast_fraction: float = 0.25,
                 **shuffle_kwargs) -> pd.DataFrame:
    """ONE entry point for the flagship pipeline: measures the KB
    footprint against the object store and dispatches to
    :func:`run_ned` (broadcast AliasIndex) or
    :func:`run_ned_shuffle_kb` (co-shuffle blocking, with shuffle
    evidence — the fully broadcast-free shape).  The selection and its
    evidence are logged; both paths produce identical links
    (parity-tested in tests/test_e2e_ray.py)."""
    import logging
    path, info = select_ned_path(fixture_dir, broadcast_fraction)
    logging.getLogger(__name__).info(
        "ned path=%s (est index %.1f MB vs budget %.1f MB of %.1f MB "
        "object store)", path, info["estimated_index_bytes"] / 2**20,
        info["broadcast_budget_bytes"] / 2**20,
        info["object_store_bytes"] / 2**20)
    if path == "broadcast":
        return run_ned(fixture_dir, config)
    return run_ned_shuffle_kb(fixture_dir, config,
                              evidence=shuffle_kwargs.pop("evidence",
                                                          "shuffle"),
                              **shuffle_kwargs)


def ned_partitions(fixture_dir: str) -> list[tuple[str, str, str]]:
    """Deterministic partition list for the resumable runner: one
    partition per pages parquet file, fingerprinted by (name, size,
    extractor version).  At scale the unit would be an input shard dir /
    key range; the mechanism is identical."""
    import hashlib

    from sbb_ned_ray.functions.extract import EXTRACTOR_VERSION

    pages_dir = fixture_dir
    sub = os.path.join(fixture_dir, "pages")
    if os.path.isdir(sub):
        pages_dir = sub
    parts = []
    for f in sorted(os.listdir(pages_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(pages_dir, f)
        size = os.stat(path).st_size
        fp = hashlib.sha256(
            f"{f}|{size}|x{EXTRACTOR_VERSION}".encode()).hexdigest()[:16]
        parts.append((os.path.splitext(f)[0], fp, path))
    return parts


def run_ned_resumable(fixture_dir: str, out_dir: str,
                      config: PipelineConfig | None = None):
    """Resumable flagship run (north_rule: per-partition lineage +
    metrics): each input file is processed independently and written
    atomically with a ``_manifest.json`` (fingerprint, row counters,
    wall time); on restart, partitions whose manifest matches are
    SKIPPED.  Links are partition-local; the transitive clustering pass
    runs over the union of partition outputs (≤ one row per linked
    mention) at the end.

    Returns ``(clustered_links_df, summary)`` where summary lists
    skipped/completed partitions and their manifests.
    """
    import ray.data as rd

    from sbb_ned_ray.state.manifests import run_partitioned

    cfg = config or PipelineConfig()
    from sbb_ned_ray.state.artifacts import load_or_build_index
    index_ref = ray.put(load_or_build_index(
        read_kb_table(fixture_dir),
        artifact_dir=os.path.join(out_dir, "_index"), config=cfg,
        sentences=read_kb_sentences(fixture_dir),
        redirects=read_redirects(fixture_dir)))
    parts = ned_partitions(fixture_dir)
    path_of = {pid: path for pid, _, path in parts}

    def run_fn(part_id: str):
        ds = rd.read_parquet(path_of[part_id],
                             columns=["url", "warc_ts", "html", "lang"],
                             override_num_blocks=8)
        links = top_links(build_ned_links(
            fixture_dir, cfg, pages_ds=ds, index_ref=index_ref))
        df = links.to_pandas()
        return df, {"links": int(len(df)),
                    "mentions": int(df["mention_key"].nunique())
                    if len(df) else 0}

    summary = run_partitioned([(pid, fp) for pid, fp, _ in parts],
                              out_dir, run_fn)
    frames = []
    for pid, _, _ in parts:
        pdir = os.path.join(out_dir, pid)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                frames.append(pd.read_parquet(os.path.join(pdir, f)))
    all_links = pd.concat([f for f in frames if len(f)],
                          ignore_index=True) if frames else pd.DataFrame()
    if all_links.empty:
        return all_links, summary
    return cluster_links(all_links), summary


def pairwise_f1(links_df: pd.DataFrame, gt_pairs: pa.Table) -> dict:
    """Pairwise entity-linking F1 on labeled mention pairs at the same
    blocking key (BASELINE.json metric)."""
    gp = gt_pairs.to_pandas()
    cluster = pd.Series(links_df["cluster_id"].to_numpy(),
                        index=links_df["mention_key"])

    def keys(url_col: str, mid_col: str) -> pd.Series:
        return gp[url_col].astype(str) + "\x1f" + gp[mid_col].astype(str)

    ca = keys("url_a", "mention_id_a").map(cluster)
    cb = keys("url_b", "mention_id_b").map(cluster)
    pred_same = (ca.notna() & cb.notna() & (ca == cb)).to_numpy()
    gt_same = (gp["same_entity"].to_numpy() == 1)
    tp = int((pred_same & gt_same).sum())
    fp = int((pred_same & ~gt_same).sum())
    fn = int((~pred_same & gt_same).sum())
    tn = int((~pred_same & ~gt_same).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "precision": precision, "recall": recall, "f1": f1}
