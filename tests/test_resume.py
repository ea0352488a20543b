"""Resumability (north_rule): per-partition lineage manifests + skip of
completed partitions on restart + equality with the one-shot run."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq


def _links_key(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["url", "mention_id", "qid", "candidate_title"]
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_resumable_run_skips_and_matches(ray_session, tiny_fixture_dir,
                                         tmp_path):
    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.ned import (
        ned_partitions,
        pairwise_f1,
        run_ned,
        run_ned_resumable,
    )

    out_dir = str(tmp_path / "links_out")
    cfg = PipelineConfig()

    parts = ned_partitions(tiny_fixture_dir)
    assert len(parts) >= 2, "fixture must yield multiple partitions"

    links1, s1 = run_ned_resumable(tiny_fixture_dir, out_dir, cfg)
    assert sorted(s1["completed"]) == sorted(p[0] for p in parts)
    assert s1["skipped"] == []
    # manifests carry lineage + counters
    for m in s1["manifests"]:
        assert m["complete"] and m["fingerprint"]
        assert m["rows"] == m["counters"]["links"]
        assert "wall_sec" in m

    # restart: everything skipped, same result
    links2, s2 = run_ned_resumable(tiny_fixture_dir, out_dir, cfg)
    assert sorted(s2["skipped"]) == sorted(p[0] for p in parts)
    assert s2["completed"] == []
    pd.testing.assert_frame_equal(_links_key(links1), _links_key(links2))

    # simulated mid-job crash: one partition's output lost → only it reruns
    lost = parts[0][0]
    shutil.rmtree(os.path.join(out_dir, lost))
    links3, s3 = run_ned_resumable(tiny_fixture_dir, out_dir, cfg)
    assert s3["completed"] == [lost]
    assert sorted(s3["skipped"]) == sorted(p[0] for p in parts[1:])
    pd.testing.assert_frame_equal(_links_key(links1), _links_key(links3))

    # stale fingerprint (input changed) → partition reruns
    mf_path = os.path.join(out_dir, parts[1][0], "_manifest.json")
    with open(mf_path) as f:
        m = json.load(f)
    m["fingerprint"] = "stale"
    with open(mf_path, "w") as f:
        json.dump(m, f)
    _, s4 = run_ned_resumable(tiny_fixture_dir, out_dir, cfg)
    assert s4["completed"] == [parts[1][0]]

    # equality with the one-shot pipeline, including cluster quality
    one_shot = run_ned(tiny_fixture_dir, cfg)
    pd.testing.assert_frame_equal(_links_key(links1), _links_key(one_shot))
    gt = pq.read_table(os.path.join(tiny_fixture_dir,
                                    "mention_pairs_gt.parquet"))
    assert pairwise_f1(links1, gt)["f1"] >= 0.99


def test_index_artifact_roundtrip(tiny_fixture_dir, tmp_path):
    """Index build-job artifact: save once, reload on matching KB
    fingerprint, rebuild+resave on KB change."""
    import pyarrow.parquet as pq

    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.state.artifacts import (
        kb_fingerprint,
        load_or_build_index,
    )

    kb = pq.read_table(f"{tiny_fixture_dir}/kb_entities.parquet")
    cfg = PipelineConfig()
    d = str(tmp_path / "index")

    idx1 = load_or_build_index(kb, d, cfg)         # builds + saves
    assert (tmp_path / "index" / "alias_index.pkl").exists()
    idx2 = load_or_build_index(kb, d, cfg)         # loads
    assert idx2.titles == idx1.titles
    assert idx2.alias_exact == idx1.alias_exact

    # changed KB → different fingerprint → rebuild
    kb2 = kb.slice(0, kb.num_rows - 1)
    assert kb_fingerprint(kb2, cfg) != kb_fingerprint(kb, cfg)
    idx3 = load_or_build_index(kb2, d, cfg)
    assert len(idx3.titles) == kb.num_rows - 1
