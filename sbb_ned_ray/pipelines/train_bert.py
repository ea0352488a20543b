"""Cross-encoder training pipeline: KB corpus → WordPiece vocab →
labeled pair features → trained :class:`NumpyMiniBert` artifact.

Reference semantics: the `model_train` entry point
(``/root/reference/qurator/sbb_ned/models/bert.py:35-228`` model setup,
``342-480`` fine-tune loop) driven by the `ned-pairing` training-data
chain (``ground_truth/data_processor.py``).  The torch fine-tune is
replaced by the numpy backprop trainer
(:mod:`sbb_ned_ray.models.bert_train`) over the SAME feature columns the
GPU path consumes; the tokenizer is the LEARNED WordPiece vocab
(:mod:`sbb_ned_ray.functions.wordpiece`) instead of a shipped vocab
file.

Ray-Data shape: vocab counts are a distributed ``map_batches`` partial
count → ``groupby(token).sum`` (only the distinct-token table reaches
the driver); pair generation and feature conversion are the existing
actor-pool stages; the fit itself is single-node numpy (data-parallel
allreduce is the documented extension).  Artifacts follow the repo's
fingerprint discipline: content-keyed cache directory + atomic rename +
completion manifest, so repeated driver runs (correctness, bench) train
ONCE per (train-corpus, hyperparameter) key.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.wordpiece import (
    PIECE_ID_BASE,
    WordPieceVocab,
    corpus_word_counts,
    learn_wordpiece,
)
from sbb_ned_ray.models.bert_train import (
    save_mini_bert,
    train_mini_bert,
)
from sbb_ned_ray.stages.bert_scorer import NumpyMiniBert

ARTIFACT_BASE = "/tmp/sbb_ned_ray_artifacts"
TRAIN_FORMAT_VERSION = 2


def learn_kb_vocab(pages_dir: str, vocab_size: int = 6000,
                   min_pair_freq: int = 1) -> WordPieceVocab:
    """Learn a WordPiece vocab from the sentence-KB corpus.

    ``min_pair_freq=1`` lets merges run to WHOLE corpus words — the
    identity-matching signal the cross-encoder trains on lives at word
    granularity, and sub-word pieces shared across entity names poison
    it (measured: whole-word vocab is the difference between a learnable
    and an unlearnable task on the fixture corpus).
    """
    import ray.data

    counts = corpus_word_counts(
        ray.data.read_parquet(os.path.join(pages_dir,
                                           "kb_sentences.parquet")),
        list_col="tokens")
    return WordPieceVocab(learn_wordpiece(counts, vocab_size=vocab_size,
                                          min_pair_freq=min_pair_freq))


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Hyperparameters of one cross-encoder fit (artifact cache key)."""

    d: int = 32
    n_layers: int = 2
    n_heads: int = 2
    max_seq_len: int = 48     # pair window the features are built at
    max_len: int = 64         # model position table (headroom over window)
    # measured on the sf0.001 fixture pair: eval_top1 reaches 1.0 by
    # epoch 3-4 (~45 s/epoch); 8 epochs buys calibration margin on the
    # held-out-pages pairwise F1 (0.9917 at 8 vs 0.9903 at 6)
    epochs: int = 8
    lr: float = 2e-3
    batch_size: int = 512
    seed: int = 7
    objective: str = "rank"
    lam_init: float = 2.0      # lexical-copy attention prior (bert_scorer)
    vocab_size: int = 6000
    min_pair_freq: int = 1
    eval_buckets: int = 1      # held-out mention buckets (of n_buckets)
    n_buckets: int = 10


def _artifact_dir(train_fingerprint: str, spec: TrainSpec) -> str:
    key = hashlib.sha256(json.dumps(
        {"train": train_fingerprint, "spec": dataclasses.asdict(spec),
         "v": TRAIN_FORMAT_VERSION}, sort_keys=True).encode()) \
        .hexdigest()[:16]
    return os.path.join(ARTIFACT_BASE, f"xenc_{key}")


def train_cross_encoder(train_pages_dir: str,
                        config: PipelineConfig | None = None,
                        spec: TrainSpec | None = None,
                        train_fingerprint: str | None = None,
                        log=None) -> dict:
    """Fit the cross-encoder on a training fixture; returns artifact
    paths ``{"vocab_path", "model_path", "history"}``.

    Cached: if the fingerprinted artifact directory already holds a
    completed fit for (``train_fingerprint``, ``spec``), nothing runs.
    ``train_fingerprint`` defaults to the fixture's ``_FIXTURE_COMPLETE``
    content hash (any corpus change retrains).
    """
    spec = spec or TrainSpec()
    cfg = config or PipelineConfig()
    if train_fingerprint is None:
        marker = os.path.join(train_pages_dir, "_FIXTURE_COMPLETE")
        with open(marker, "rb") as f:
            train_fingerprint = hashlib.sha256(f.read()).hexdigest()[:16]
    out = _artifact_dir(train_fingerprint, spec)
    vocab_path = os.path.join(out, "wordpiece.json")
    model_path = os.path.join(out, "minibert.npz")
    done = os.path.join(out, "_TRAIN_COMPLETE")
    if os.path.exists(done):
        with open(done) as f:
            return json.load(f)

    from sbb_ned_ray.stages.features import convert_pairs_to_features
    from sbb_ned_ray.stages.training import training_pairs_ds

    os.makedirs(out, exist_ok=True)
    vocab = learn_kb_vocab(train_pages_dir, vocab_size=spec.vocab_size,
                           min_pair_freq=spec.min_pair_freq)
    vocab.save(vocab_path)

    cfg_t = dataclasses.replace(
        cfg, max_seq_len=spec.max_seq_len,
        extra={**(cfg.extra or {}), "wordpiece_vocab_path": vocab_path})
    # ALL candidates per gold mention (not the equalized nbad sample):
    # the rank objective needs the full candidate slate the decode-time
    # model scores
    pairs = training_pairs_ds(train_pages_dir, cfg_t, all_candidates=True)
    feats = convert_pairs_to_features(pairs, cfg_t, concurrency=(1, 8))

    model = NumpyMiniBert(vocab_size=PIECE_ID_BASE + len(vocab),
                          d=spec.d, n_layers=spec.n_layers,
                          n_heads=spec.n_heads, max_len=spec.max_len,
                          seed=spec.seed)
    for ly in model.layers:
        ly["lam"][:] = spec.lam_init
    model, history = train_mini_bert(
        feats, model, epochs=spec.epochs, lr=spec.lr,
        batch_size=spec.batch_size, seed=spec.seed,
        objective=spec.objective, eval_buckets=spec.eval_buckets,
        n_buckets=spec.n_buckets, log=log)
    save_mini_bert(model, model_path,
                   vocab_fingerprint=vocab.fingerprint(), history=history)
    result = {"vocab_path": vocab_path, "model_path": model_path,
              "history": history}
    tmp = done + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, done)
    return result


def trained_scorer_config(base: PipelineConfig, artifacts: dict,
                          spec: TrainSpec | None = None) -> PipelineConfig:
    """Config that routes the flagship through the TRAINED model: the
    learned vocab feeds :class:`FeatureConverter` and the weight
    artifact selects the numpy backend in :class:`BertPairScorer` (the
    stub never runs)."""
    spec = spec or TrainSpec()
    return dataclasses.replace(
        base, max_seq_len=spec.max_seq_len,
        extra={**(base.extra or {}),
               "wordpiece_vocab_path": artifacts["vocab_path"],
               "bert_numpy_model_path": artifacts["model_path"]})


def run_ned_trained(pages_dir: str, artifacts: dict,
                    config: PipelineConfig | None = None,
                    spec: TrainSpec | None = None, limit: int | None = None):
    """Flagship NED with the TRAINED cross-encoder (split-scorer path,
    stub scorer never constructed) → clustered links DataFrame."""
    import pandas as pd

    from sbb_ned_ray.pipelines.ned import build_ned_links, top_links
    from sbb_ned_ray.sources.pages import read_pages
    from sbb_ned_ray.stages.bert_scorer import BertPairScorer
    from sbb_ned_ray.stages.cluster import cluster_links

    cfg = trained_scorer_config(config or PipelineConfig(), artifacts, spec)
    pages_ds = None
    if limit is not None:
        pages_ds = read_pages(pages_dir,
                              columns=["url", "warc_ts", "html", "lang"],
                              override_num_blocks=16).limit(limit)
    links = top_links(build_ned_links(
        pages_dir, cfg, scorer_cls=BertPairScorer, pages_ds=pages_ds,
        split_scorer=True))
    df = links.to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["mention_key", "url", "mention_id",
                                     "surface", "candidate_title", "qid",
                                     "proba_1", "n_pairs", "out_rank"])
    return cluster_links(df)


def run_ned_trained_ranked(pages_dir: str, artifacts: dict,
                           config: PipelineConfig | None = None,
                           spec: TrainSpec | None = None):
    """Flagship NED with the TRAINED cross-encoder returning the FULL
    per-mention ranking (every ``out_rank`` row, not just the top-1
    decision) — the input shape the hipe-scorer-style ranked @k
    metrics consume (``evalgrid.ranked_topk_metrics``)."""
    from sbb_ned_ray.pipelines.ned import build_ned_links
    from sbb_ned_ray.stages.bert_scorer import BertPairScorer

    cfg = trained_scorer_config(config or PipelineConfig(), artifacts, spec)
    return build_ned_links(pages_dir, cfg, scorer_cls=BertPairScorer,
                           split_scorer=True).to_pandas()
