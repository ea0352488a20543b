"""Training-data chain operators (reference Makefile `ned-pairing` /
`ned-train-test-split`, SURVEY.md §3.3).

* :func:`training_pairs_ds` — good/bad sentence-pair generation with
  the reference's sampling semantics (``ground_truth/data_processor.py``):
  per gold mention, the gold candidate's evidence forms positive pairs;
  negatives are sampled from the other candidates with
  ``nbad = max(bad_count, min(50, rank_of_good))``
  (``data_processor.py:306-308``) and the pos/neg sets are equalized by
  truncation (``data_processor.py:205-208``).  All sampling is seeded
  per mention (hash of mention_key) — deterministic, no global RNG.
* :func:`split_by_hash` — deterministic train/test split on an id hash
  (replaces the reference's shuffled-id split, ``cli.py:748-773``, with
  a resumable content-keyed rule: md5(id) % 10).

Both run as task-pool ``map_batches`` over Arrow batches; the KB index
and the gold-mention map are broadcast once via ``ray.put``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.stages.candidates import CandidateGenerator
from sbb_ned_ray.stages.extract import extract_text_batch
from sbb_ned_ray.stages.mentions import MentionDetector
from sbb_ned_ray.stages.pairs import PairBuilder

TRAIN_PAIR_SCHEMA = pa.schema([
    ("mention_key", pa.string()),
    ("candidate_title", pa.string()),
    ("qid", pa.string()),
    ("label", pa.int8()),
    ("pair_no", pa.int32()),
    ("tok_a", pa.list_(pa.string())),
    ("pos_a", pa.int32()),
    ("end_a", pa.int32()),
    ("tok_b", pa.list_(pa.string())),
    ("pos_b", pa.int32()),
    ("end_b", pa.int32()),
])

BAD_COUNT = 10          # data_processor.py:306 (bad_count default)
MAX_BAD_RANK = 50       # data_processor.py:307


class TrainingPairWorker:
    """pages batch + broadcast gold map → labeled sentence pairs.

    ``all_candidates=False`` (default) applies the reference's sampling
    semantics (nbad + pos/neg equalization, ``data_processor.py:
    205-208,306-308``).  ``all_candidates=True`` keeps EVERY generated
    candidate labeled against the gold qid — the distribution the
    ranking-objective cross-encoder trainer needs (at decode time the
    model scores all candidates, not an equalized sample)."""

    def __init__(self, index_ref, gold_ref,
                 config: PipelineConfig | None = None,
                 all_candidates: bool = False):
        import ray
        index = (ray.get(index_ref)
                 if isinstance(index_ref, ray.ObjectRef) else index_ref)
        self.gold = (ray.get(gold_ref)
                     if isinstance(gold_ref, ray.ObjectRef) else gold_ref)
        cfg = config or PipelineConfig()
        self.cfg = cfg
        self.all_candidates = all_candidates
        self.detector = MentionDetector(index)
        self.candidates = CandidateGenerator(index, cfg, include_tokens=True)
        self.pairs = PairBuilder(index, cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = extract_text_batch(batch)
        mentions = self.detector(batch)
        if mentions.num_rows == 0:
            return TRAIN_PAIR_SCHEMA.empty_table()
        cands = self.candidates(mentions)
        if cands.num_rows == 0:
            return TRAIN_PAIR_SCHEMA.empty_table()
        df = cands.to_pandas()
        df["mention_key"] = df["url"] + "\x1f" + df["mention_id"]
        keep_idx: list[int] = []
        labels: list[int] = []
        for mkey, g in df.groupby("mention_key", sort=False):
            gold_qid = self.gold.get(mkey)
            if gold_qid is None:
                continue
            good = g[g["qid"] == gold_qid]
            if good.empty:
                continue
            if self.all_candidates:
                keep_idx.extend(g.index.tolist())
                labels.extend((g["qid"] == gold_qid).astype(int).tolist())
                continue
            rank_good = int(good["rank"].iloc[0])
            bad = g[g["qid"] != gold_qid]
            nbad = max(BAD_COUNT, min(MAX_BAD_RANK, rank_good))
            # seeded per-mention sampling (deterministic, no global RNG)
            seed = int.from_bytes(
                hashlib.sha256(mkey.encode()).digest()[:4], "big")
            rng = np.random.default_rng(seed)
            take = min(nbad, len(bad))
            if take:
                sel = rng.permutation(len(bad))[:take]
                bad = bad.iloc[np.sort(sel)]
            else:
                bad = bad.iloc[:0]
            # equalize pos/neg by truncation (data_processor.py:205-208)
            n = min(len(good), len(bad)) or len(good)
            good, bad = good.iloc[:max(1, n)], bad.iloc[:n]
            keep_idx.extend(good.index.tolist())
            labels.extend([1] * len(good))
            keep_idx.extend(bad.index.tolist())
            labels.extend([0] * len(bad))
        if not keep_idx:
            return TRAIN_PAIR_SCHEMA.empty_table()
        sub = df.loc[keep_idx]
        label_of = dict(zip(
            zip(sub["mention_key"], sub["candidate_title"], sub["qid"]),
            labels))
        sel = cands.take(pa.array(keep_idx, pa.int64()))
        pairs = self.pairs(sel)
        pdf = pairs.to_pandas()
        pdf["mention_key"] = pdf["url"] + "\x1f" + pdf["mention_id"]
        pdf["label"] = [
            label_of[(k, t, q)] for k, t, q in
            zip(pdf["mention_key"], pdf["candidate_title"], pdf["qid"])]
        out = pdf[[f.name for f in TRAIN_PAIR_SCHEMA]]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(TRAIN_PAIR_SCHEMA)


def training_pairs_ds(fixture_dir: str, config: PipelineConfig | None = None,
                      all_candidates: bool = False, pages_ds=None):
    """Ray pipeline: pages + gold mentions → labeled training pairs."""
    import pyarrow.parquet as pq

    import ray

    from sbb_ned_ray.sources.pages import read_kb_table, read_pages
    from sbb_ned_ray.state.alias_index import build_alias_index

    cfg = config or PipelineConfig()
    index_ref = ray.put(build_alias_index(read_kb_table(fixture_dir), cfg))
    gm = pq.read_table(f"{fixture_dir}/mentions_gt.parquet")
    gold = {f"{u}\x1f{m}": q for u, m, q in
            zip(gm["url"].to_pylist(), gm["mention_id"].to_pylist(),
                gm["qid"].to_pylist())}
    gold_ref = ray.put(gold)
    pages = pages_ds if pages_ds is not None else read_pages(
        fixture_dir, columns=["url", "html"], override_num_blocks=16)
    return pages.map_batches(
        TrainingPairWorker,
        fn_constructor_args=(index_ref, gold_ref, cfg, all_candidates),
        batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=(1, 8))


def train_decider_job(fixture_dir: str,
                      config: PipelineConfig | None = None,
                      out_path: str | None = None, n_folds: int = 5,
                      **forest_kwargs):
    """Decider-model training job (reference ``models/decider.py:
    178-226``): run the flagship prefix UNpruned to per-(mention,
    candidate) score partials, label each candidate against the gold
    qid, build the vectorized feature matrix, GroupKFold-CV a random
    forest grouped by mention, fit on all data, and (optionally)
    persist the artifact.

    Returns ``(model, cv_scores, n_rows)``.  The partials frame is
    collected on the driver — correct at fixture scale; a corpus-scale
    training job writes partials to parquet and samples.
    """
    import dataclasses

    import pyarrow.parquet as pq

    import ray

    from sbb_ned_ray.models.decider_model import save_decider, train_decider
    from sbb_ned_ray.sources.pages import (
        read_kb_sentences,
        read_kb_table,
        read_pages,
    )
    from sbb_ned_ray.stages.decider import (
        DECIDER_FEATURES,
        decider_feature_matrix,
    )
    from sbb_ned_ray.stages.fused import ned_task_fn
    from sbb_ned_ray.state.alias_index import build_alias_index

    cfg = dataclasses.replace(config or PipelineConfig(),
                              emit_top_k=None, local_decide=False,
                              decider_model_path=None)
    index_ref = ray.put(build_alias_index(
        read_kb_table(fixture_dir), cfg,
        sentences=read_kb_sentences(fixture_dir)))
    pages = read_pages(fixture_dir,
                       columns=["url", "warc_ts", "html", "lang"],
                       override_num_blocks=16)
    partials = pages.map_batches(ned_task_fn(index_ref, cfg),
                                 batch_format="pyarrow",
                                 batch_size=cfg.batch_size)
    df = partials.to_pandas()
    # merge cross-batch partials exactly like the decide path does
    g = df.groupby(["mention_key", "candidate_title", "qid"],
                   sort=False).agg(
        surface=("surface", "first"), rank=("rank", "min"),
        proba=("proba", "first"), p1_max=("p1_max", "max"),
        score_sum=("score_sum", "sum"),
        n_pairs=("n_pairs", "sum")).reset_index()
    gm = pq.read_table(f"{fixture_dir}/mentions_gt.parquet")
    gold = {f"{u}\x1f{m}": q for u, m, q in
            zip(gm["url"].to_pylist(), gm["mention_id"].to_pylist(),
                gm["qid"].to_pylist())}
    g["gold_qid"] = g["mention_key"].map(gold)
    g = g[g["gold_qid"].notna()]
    y = (g["qid"] == g["gold_qid"]).to_numpy().astype(np.int8)
    X = decider_feature_matrix(g)
    model, scores = train_decider(X, y, g["mention_key"].to_numpy(),
                                  n_folds=n_folds, **forest_kwargs)
    if out_path:
        save_decider(model, DECIDER_FEATURES, scores, out_path)
    return model, scores, len(g)


def split_by_hash(batch: pa.Table, id_col: str = "doc_id",
                  train_buckets: int = 8, n_buckets: int = 10) -> pa.Table:
    """Deterministic md5-hash split: bucket = int(md5(id)[:8], 16) % n;
    bucket < train_buckets → 'train'.  Content-keyed (resumable /
    engine-independent), unlike the reference's sequential-id shuffle."""
    ids = batch[id_col].to_pylist()
    buckets = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
               % n_buckets for i in ids]
    split = ["train" if b < train_buckets else "test" for b in buckets]
    return pa.table({id_col: batch[id_col],
                     "split": pa.array(split, pa.string())})
