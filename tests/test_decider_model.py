"""Decider model: numpy random forest sanity, GroupKFold isolation,
ROC-AUC correctness, and the model-in-the-loop flagship parity."""

import numpy as np
import pytest

from sbb_ned_ray.models.decider_model import (
    NumpyRandomForest,
    group_kfold,
    roc_auc,
)


def test_forest_learns_separable_data():
    rng = np.random.default_rng(0)
    n = 600
    X = rng.normal(size=(n, 4))
    y = (X[:, 0] + 0.5 * X[:, 2] > 0).astype(np.int8)
    m = NumpyRandomForest(n_estimators=15, max_depth=6).fit(X, y)
    p = m.predict_proba(X)
    assert p.shape == (n, 2)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-12)
    assert roc_auc(y, p[:, 1]) > 0.97


def test_forest_handles_nan_features():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 3))
    X[::7, 1] = np.nan
    y = (X[:, 0] > 0).astype(np.int8)
    m = NumpyRandomForest(n_estimators=8, max_depth=5).fit(X, y)
    p = m.predict_proba(X)[:, 1]
    assert np.isfinite(p).all()
    assert roc_auc(y, p) > 0.9


def test_roc_auc_known_values():
    assert roc_auc([0, 0, 1, 1], [0.1, 0.2, 0.8, 0.9]) == 1.0
    assert roc_auc([0, 0, 1, 1], [0.9, 0.8, 0.2, 0.1]) == 0.0
    # all-tied → 0.5 via midranks
    assert roc_auc([0, 1, 0, 1], [0.5, 0.5, 0.5, 0.5]) == 0.5


def test_group_kfold_isolates_groups():
    groups = np.array(["a", "a", "b", "b", "c", "c", "d", "e", "f", "g"])
    folds = list(group_kfold(groups, 3))
    assert len(folds) == 3
    for train, test in folds:
        assert set(groups[train]) & set(groups[test]) == set()
        assert len(train) + len(test) == len(groups)


@pytest.fixture(scope="module")
def trained_model_path(tmp_path_factory):
    from sbb_ned_ray.fixtures.generator import (
        FixtureSpec,
        materialize_fixture,
    )
    from sbb_ned_ray.stages.training import train_decider_job

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    d = materialize_fixture(
        FixtureSpec(n_pages=120, n_entities=80, n_gt_pairs=300))
    path = str(tmp_path_factory.mktemp("decider") / "model.pkl")
    model, scores, n_rows = train_decider_job(d, out_path=path)
    return d, path, scores, n_rows


@pytest.mark.usefixtures("ray_session")
def test_training_job_cv_scores(trained_model_path):
    """GroupKFold ROC-AUC on the synthetic fixture must be ~1 (the
    features separate gold from non-gold cleanly) and the artifact must
    round-trip."""
    from sbb_ned_ray.models.decider_model import load_decider
    from sbb_ned_ray.stages.decider import DECIDER_FEATURES

    d, path, scores, n_rows = trained_model_path
    assert n_rows > 500
    assert len(scores) == 5 and min(scores) > 0.99, scores
    art = load_decider(path)
    assert art["feature_names"] == DECIDER_FEATURES
    assert art["cv_scores"] == scores


@pytest.mark.usefixtures("ray_session")
def test_flagship_f1_unchanged_with_model(trained_model_path):
    """run_ned with the trained decider model in the loop (proba_1 from
    predict_proba instead of p1_max) keeps pairwise F1 = 1.0 and links
    every mention to the same entity as the default path."""
    import dataclasses

    import pyarrow.parquet as pq

    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.ned import pairwise_f1, run_ned

    d, path, _, _ = trained_model_path
    base = run_ned(d, PipelineConfig())
    with_model = run_ned(d, dataclasses.replace(
        PipelineConfig(), decider_model_path=path))
    m = pairwise_f1(with_model,
                    pq.read_table(f"{d}/mention_pairs_gt.parquet"))
    assert m["f1"] >= 0.99, m
    cols = ["url", "mention_id", "qid"]
    a = base[cols].sort_values(cols[:2]).reset_index(drop=True)
    b = with_model[cols].sort_values(cols[:2]).reset_index(drop=True)
    assert a.equals(b)


def test_decide_partition_rejects_wrong_feature_layout():
    """ADVICE round 2: a decider pickle trained with a different/older
    feature layout must fail loudly, not silently score garbage."""
    import pandas as pd

    from sbb_ned_ray.stages.decider import DECIDER_FEATURES, _decide_partition

    df = pd.DataFrame({
        "mention_key": ["k"], "candidate_title": ["T"], "qid": ["Q1"],
        "url": ["u"], "mention_id": ["m0"], "surface": ["T"],
        "rank": [0], "proba": [0.5], "p1_max": [0.9],
        "score_sum": [0.9], "n_pairs": [1]})

    class FakeModel:
        def predict_proba(self, X):
            return np.tile([0.1, 0.9], (len(X), 1))

    stale = list(reversed(DECIDER_FEATURES))
    with pytest.raises(ValueError, match="feature layout"):
        _decide_partition(df, 0.5, model=FakeModel(), feature_names=stale)
    # matching layout passes through
    out = _decide_partition(df, 0.5, model=FakeModel(),
                            feature_names=list(DECIDER_FEATURES))
    assert len(out) == 1
