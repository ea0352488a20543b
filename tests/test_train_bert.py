"""Cross-encoder training pipeline: vocab learning over the KB, the
train-once artifact cache, and the trained-weights path through
BertPairScorer / the flagship."""

import dataclasses
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_train(ray_session):
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.fixtures.generator import (
        FixtureSpec,
        materialize_fixture,
    )
    from sbb_ned_ray.pipelines.train_bert import (
        TrainSpec,
        train_cross_encoder,
    )

    eval_spec = FixtureSpec(n_pages=60, n_entities=40, n_gt_pairs=100)
    train_dir = materialize_fixture(
        dataclasses.replace(eval_spec, page_seed=7))
    eval_dir = materialize_fixture(eval_spec)
    tspec = TrainSpec(epochs=1, vocab_size=2500)
    arts = train_cross_encoder(train_dir, PipelineConfig(), tspec)
    return train_dir, eval_dir, tspec, arts


def test_artifacts_written_and_cached(tiny_train):
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.train_bert import train_cross_encoder

    train_dir, _, tspec, arts = tiny_train
    assert os.path.exists(arts["model_path"])
    assert os.path.exists(arts["model_path"] + ".json")
    assert os.path.exists(arts["vocab_path"])
    assert arts["history"], "training history recorded"
    # second call must hit the completion marker, not retrain
    t_mtime = os.path.getmtime(arts["model_path"])
    arts2 = train_cross_encoder(train_dir, PipelineConfig(), tspec)
    assert arts2["model_path"] == arts["model_path"]
    assert os.path.getmtime(arts["model_path"]) == t_mtime


def test_vocab_artifact_roundtrip(tiny_train):
    from sbb_ned_ray.functions.wordpiece import (
        PIECE_ID_BASE,
        WordPieceVocab,
    )

    _, _, _, arts = tiny_train
    v = WordPieceVocab.load(arts["vocab_path"])
    assert len(v) > 50
    # greedy max-munch: a learned whole piece encodes to itself
    piece = next(p for p in v.pieces if not p.startswith("##"))
    enc = v.encode_token(piece)
    assert enc == [(piece, v.piece_ids[piece])]
    assert all(pid >= PIECE_ID_BASE for _, pid in enc)


def test_scorer_uses_trained_weights(tiny_train):
    """BertPairScorer with bert_numpy_model_path loads the artifact
    weights (not the seeded init)."""
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.models.bert_train import load_mini_bert
    from sbb_ned_ray.pipelines.train_bert import trained_scorer_config
    from sbb_ned_ray.stages.bert_scorer import BertPairScorer

    _, _, tspec, arts = tiny_train
    cfg = trained_scorer_config(PipelineConfig(), arts, tspec)
    scorer = BertPairScorer(cfg)
    trained = load_mini_bert(arts["model_path"])
    np.testing.assert_array_equal(scorer.model.tok_emb, trained.tok_emb)
    # trained model differs from the same-shape seeded init
    from sbb_ned_ray.stages.bert_scorer import NumpyMiniBert
    init = NumpyMiniBert(vocab_size=trained.tok_emb.shape[0],
                         max_len=trained.pos_emb.shape[0])
    assert not np.allclose(trained.head, init.head)


def test_run_ned_trained_end_to_end(tiny_train):
    """Flagship with the trained model produces schema-stable links on
    held-out pages (quality gate lives in ned_eval_f1_bert_trained)."""
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.train_bert import run_ned_trained

    _, eval_dir, tspec, arts = tiny_train
    links = run_ned_trained(eval_dir, arts, PipelineConfig(), tspec,
                            limit=20)
    for col in ("mention_key", "url", "mention_id", "surface",
                "candidate_title", "qid", "cluster_id"):
        assert col in links.columns, col
