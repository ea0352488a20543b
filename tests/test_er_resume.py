"""Resumable ER pipeline: block-group partitions skip on restart and
the composed result equals the single-pass oracle-checked chain."""
import json
import os
import shutil

import pandas as pd
import pyarrow.compute as pc
import ray.data

from sbb_ned_ray.pipelines.er import er_partitions, run_er_resumable
from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                        golden_records,
                                        reciprocal_best_match)

SF = "/root/testdata/sf0.001"
OUT = "/tmp/sbb_ned_ray_test_er_resume"


def _direct_golden(path):
    recs = ray.data.read_parquet(path)
    sided = recs.map_batches(
        lambda t: t.append_column("side", pc.cast(
            pc.bit_wise_and(t["rec_id"], 1), "int32")),
        batch_format="pyarrow")
    matches = reciprocal_best_match(sided, "nationkey", "rec_id",
                                    "name", "side")
    return golden_records(recs, matches)


def test_er_resumable_matches_direct_and_skips(ray_session):
    path = dirty_records_path(SF)
    shutil.rmtree(OUT, ignore_errors=True)

    golden1, s1 = run_er_resumable(path, OUT, n_parts=4)
    assert len(s1["completed"]) == 4 and not s1["skipped"]

    # per-partition lineage: manifest has fingerprint + counters
    m0 = json.load(open(os.path.join(OUT, "blockgroup-0000",
                                     "_manifest.json")))
    assert m0["complete"] and m0["fingerprint"]
    assert "pairs" in m0["counters"]
    total_pairs = sum(m["counters"]["pairs"] for m in s1["manifests"])

    direct = _direct_golden(path)
    pd.testing.assert_frame_equal(golden1, direct)

    # restart: every partition skipped, identical output
    golden2, s2 = run_er_resumable(path, OUT, n_parts=4)
    assert len(s2["skipped"]) == 4 and not s2["completed"]
    pd.testing.assert_frame_equal(golden2, golden1)

    # lose one partition → exactly that one recomputes
    shutil.rmtree(os.path.join(OUT, "blockgroup-0002"))
    golden3, s3 = run_er_resumable(path, OUT, n_parts=4)
    assert s3["completed"] == ["blockgroup-0002"]
    assert len(s3["skipped"]) == 3
    pd.testing.assert_frame_equal(golden3, golden1)
    assert sum(m["counters"]["pairs"]
               for m in s3["manifests"]) == total_pairs


def test_er_partitions_fingerprint_changes_with_version(ray_session):
    path = dirty_records_path(SF)
    a = er_partitions(path, 4)
    b = er_partitions(path, 8)
    assert len(a) == 4 and len(b) == 8
    assert {fp for _, fp in a}.isdisjoint({fp for _, fp in b})
