"""End-to-end flagship pipeline on Ray: pages parquet → links → clusters
→ pairwise F1 ≥ 0.99 on labeled mention pairs (BASELINE.json metric),
plus determinism across runs (FIXTURES.md §7(d))."""

import pyarrow.parquet as pq
import pytest

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.pipelines.ned import pairwise_f1, run_ned


@pytest.mark.usefixtures("ray_session")
def test_flagship_pairwise_f1(tiny_fixture_dir):
    links = run_ned(tiny_fixture_dir, PipelineConfig())
    assert len(links) > 0
    gt_pairs = pq.read_table(f"{tiny_fixture_dir}/mention_pairs_gt.parquet")
    m = pairwise_f1(links, gt_pairs)
    assert m["f1"] >= 0.99, m


@pytest.mark.usefixtures("ray_session")
def test_flagship_deterministic(tiny_fixture_dir):
    cfg = PipelineConfig()
    a = run_ned(tiny_fixture_dir, cfg).sort_values(
        ["mention_key"]).reset_index(drop=True)
    b = run_ned(tiny_fixture_dir, cfg).sort_values(
        ["mention_key"]).reset_index(drop=True)
    assert a[["mention_key", "qid", "cluster_id"]].equals(
        b[["mention_key", "qid", "cluster_id"]])


@pytest.mark.usefixtures("ray_session")
def test_local_decide_equals_shuffle_decide(tiny_fixture_dir):
    """The zero-shuffle fused decision (local_decide=True, default) must
    equal the groupby(mention_key) shuffle path row-for-row."""
    import dataclasses
    local = run_ned(tiny_fixture_dir, PipelineConfig())
    shuffled = run_ned(tiny_fixture_dir, dataclasses.replace(
        PipelineConfig(), local_decide=False))
    cols = ["url", "mention_id", "qid", "candidate_title", "cluster_id"]
    a = local[cols].sort_values(cols[:3]).reset_index(drop=True)
    b = shuffled[cols].sort_values(cols[:3]).reset_index(drop=True)
    assert a.equals(b)
