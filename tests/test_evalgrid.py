"""Hyperparameter evaluation grid: full sweep shape, shared index, and
the deployment knobs landing at the top."""


def test_ned_eval_grid(ray_session, tiny_fixture_dir):
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.evalgrid import ned_eval_grid

    grid = {"max_dist": (0.1, 0.25), "max_candidates": (5, 25),
            "threshold": (0.1, 0.5)}
    out = ned_eval_grid(tiny_fixture_dir, PipelineConfig(), grid)
    assert len(out) == 8
    # sorted best-first and the deployment defaults reach F1 = 1.0 on
    # the fixture (the flagship e2e gate, via the grid path)
    assert out.loc[0, "f1_e6"] == 1_000_000
    best = out[(out.max_dist == 0.25) & (out.max_candidates == 25)
               & (out.threshold == 0.1)]
    assert int(best["f1_e6"].iloc[0]) == 1_000_000
    # a degenerate threshold must not outrank the calibrated one
    assert out["f1_e6"].is_monotonic_decreasing


def test_ranked_topk_metrics_hand_computed():
    """Hand-checkable @k math: 2 docs, 3 gold mentions, rankings where
    gold sits at rank 0, rank 2, and nowhere."""
    import pandas as pd

    from sbb_ned_ray.pipelines.evalgrid import ranked_topk_metrics

    links = pd.DataFrame({
        "url": ["u1", "u1", "u1", "u1", "u2", "u2"],
        "mention_id": [0, 0, 0, 1, 0, 0],
        "qid": ["Q1", "Q9", "Q8", "Q7", "Q5", "Q2"],
        "out_rank": [0, 1, 2, 0, 0, 1],
    })
    gt = pd.DataFrame({
        "url": ["u1", "u1", "u2"],
        "mention_id": [0, 1, 0],
        # m(u1,0): gold Q1 at rank 0; m(u1,1): gold Q8 not predicted;
        # m(u2,0): gold Q2 at rank 1
        "qid": ["Q1", "Q8", "Q2"],
    })
    out = ranked_topk_metrics(links, gt, ks=(1, 2))
    # @1: only (u1,0) hits → tp=1, n_pred=3, n_gold=3
    r1 = out[out["k"] == 1].iloc[0]
    assert r1["tp"] == 1 and r1["n_pred"] == 3 and r1["n_gold"] == 3
    assert r1["micro_p_e6"] == 333333 and r1["micro_r_e6"] == 333333
    # @2: (u2,0) gold at rank 1 joins → tp=2
    r2 = out[out["k"] == 2].iloc[0]
    assert r2["tp"] == 2
    assert r2["micro_p_e6"] == 666667
    # macro @2: u1 has p=1/2 (1 hit, 2 pred), r=1/2 (2 gold), f1=1/2;
    # u2 p=r=f1=1 → macro_f1 = 0.75
    assert r2["macro_f1_e6"] == 750000


def test_ned_eval_topk_query(ray_session):
    import os

    import pytest
    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/documents.parquet"):
        pytest.skip("driver testdata not present")
    from sbb_ned_ray.pipelines.queries import ned_eval_topk
    out = ned_eval_topk(sf)     # asserts live inside
    assert list(out["k"]) == [1, 3, 5]
