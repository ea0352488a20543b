"""The `er` CLI surface, driven as a user would (subprocess — the CLI
owns its own Ray session): resumable golden records, index build,
incremental delta matching."""
import json
import os
import shutil
import subprocess
import sys

import pandas as pd

from sbb_ned_ray.stages.linkage import dirty_records_path

SF = "/root/testdata/sf0.001"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/sbb_ned_ray_test_cli_er"


def _cli(*args):
    r = subprocess.run(
        [sys.executable, "-m", "sbb_ned_ray.cli", "--num-cpus", "4",
         *args],
        capture_output=True, text=True, cwd=ROOT, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_er_end_to_end():
    path = dirty_records_path(SF)
    shutil.rmtree(OUT, ignore_errors=True)

    # resumable golden records; second run skips every partition
    res = _cli("er", "--records", path, "--out",
               os.path.join(OUT, "run"), "--parts", "2")
    assert res["mode"] == "resumable" and len(res["completed"]) == 2
    golden = pd.read_parquet(os.path.join(OUT, "run", "golden.parquet"))
    assert res["clusters"] == len(golden) > 0
    res2 = _cli("er", "--records", path, "--out",
                os.path.join(OUT, "run"), "--parts", "2")
    assert len(res2["skipped"]) == 2 and not res2["completed"]

    # index build is content-addressed; incremental matching probes it
    recs = pd.read_parquet(path)
    corpus_path = os.path.join(OUT, "corpus.parquet")
    delta_path = os.path.join(OUT, "delta.parquet")
    os.makedirs(OUT, exist_ok=True)
    recs[recs["rec_id"] % 2 == 0].to_parquet(corpus_path, index=False)
    recs[(recs["rec_id"] % 2 == 1)
         & (recs["nationkey"] % 3 == 0)].to_parquet(delta_path,
                                                    index=False)
    idx = _cli("er", "--records", corpus_path, "--save-index",
               os.path.join(OUT, "idx"))["index"]
    assert os.path.exists(os.path.join(idx, "_LINKAGE_INDEX_COMPLETE"))
    inc = _cli("er", "--records", delta_path, "--out",
               os.path.join(OUT, "inc"), "--incremental", idx)
    assert inc["mode"] == "incremental" and inc["matches"] > 0
    assert inc["buckets_scanned"] < inc["buckets_total"]
    m = pd.read_parquet(os.path.join(OUT, "inc", "matches.parquet"))
    assert set(m.columns) == {"rec_id", "match_id", "jw_e6"}
    # every delta record probes exactly once
    assert inc["matches"] == len(pd.read_parquet(delta_path)) == len(m)


def test_cli_er_delta_maintenance():
    """`er --delta`: incremental cluster maintenance over an existing
    state dir recomputes only touched block groups and reproduces the
    batch run over corpus ∪ delta exactly."""
    from sbb_ned_ray.stages.linkage import dirty_split_paths
    corpus, delta = dirty_split_paths(SF)
    base = os.path.join(OUT, "maint")
    shutil.rmtree(base, ignore_errors=True)
    res = _cli("er", "--records", corpus, "--out", base, "--parts", "8")
    assert len(res["completed"]) == 8 and not res["delta"]

    res2 = _cli("er", "--records", corpus, "--out", base,
                "--parts", "8", "--delta", delta)
    assert res2["delta"] and res2["skipped"] and res2["completed"]
    assert len(res2["skipped"]) + len(res2["completed"]) == 8

    batch_dir = os.path.join(OUT, "maint-batch")
    shutil.rmtree(batch_dir, ignore_errors=True)
    _cli("er", "--records", dirty_records_path(SF), "--out", batch_dir,
         "--parts", "8")
    inc = pd.read_parquet(os.path.join(base, "golden.parquet"))
    bat = pd.read_parquet(os.path.join(batch_dir, "golden.parquet"))
    key = sorted(inc.columns)
    pd.testing.assert_frame_equal(
        inc[key].sort_values(key).reset_index(drop=True),
        bat[key].sort_values(key).reset_index(drop=True))


def test_cli_er_delta_flag_conflicts():
    r = subprocess.run(
        [sys.executable, "-m", "sbb_ned_ray.cli", "er", "--records",
         "x.parquet", "--out", "/tmp/x", "--delta", "d.parquet",
         "--incremental", "/tmp/idx"],
        capture_output=True, text=True, cwd=ROOT, timeout=120)
    assert r.returncode != 0
    assert "--delta" in r.stderr
