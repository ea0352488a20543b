"""Splink-style term-frequency adjustment: integer-exact TF table and
monotone TF-adjusted posteriors."""
import numpy as np
import pandas as pd
import ray.data

from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                        segment_tf_table,
                                        tf_adjusted_posteriors)

SF = "/root/testdata/sf0.001"


def test_segment_tf_table_exact(ray_session):
    path = dirty_records_path(SF)
    tf = segment_tf_table(ray.data.read_parquet(path))
    recs = pd.read_parquet(path)
    n_total = len(recs)
    assert int(tf["n_recs"].sum()) == n_total
    # brute-force agree-pair count per segment
    for _, row in tf.iterrows():
        want = 0
        for _, g in recs[recs["segment"] == row["segment"]] \
                .groupby("nationkey"):
            want += len(g) * (len(g) - 1) // 2
        assert int(row["n_agree_pairs"]) == want
        assert row["tf_e6"] == (int(row["n_recs"]) * 2_000_000
                                + n_total) // (2 * n_total)


def test_tf_adjusted_posteriors_monotone(ray_session):
    out = tf_adjusted_posteriors(
        ray.data.read_parquet(dirty_records_path(SF)))
    seg = out[out["segment"] != ""]
    assert len(seg) > 0
    # every seg-agreeing pattern fans out to one row per value, and the
    # adjustment moves rare values up relative to the marginal at least
    # as often as down (strict monotonicity asserted inside the stage)
    per_pat = seg.groupby("pattern")["segment"].nunique()
    assert (per_pat == per_pat.iloc[0]).all()
    # marginal posterior is constant within a pattern
    assert (seg.groupby("pattern")["posterior_e6"].nunique() == 1).all()
    # non-seg patterns: adjusted == marginal
    rest = out[out["segment"] == ""]
    assert (rest["adjusted_e6"] == rest["posterior_e6"]).all()
    # adjusted posteriors genuinely differ across values somewhere
    assert (seg.groupby("pattern")["adjusted_e6"].nunique() > 1).any()
