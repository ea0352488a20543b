"""Fellegi–Sunter linkage: the distributed pattern contingency against
a brute-force pandas recompute, EM parameter recovery on synthetic
pattern counts with known generating params, monotone likelihood, the
quality gates on the planted-duplicate fixture, and partitioning
invariance of the contingency."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from sbb_ned_ray.stages.linkage import (BAL_TOL, COMPARISONS,
                                        dirty_records_path, fs_em,
                                        linkage_quality,
                                        pattern_contingency,
                                        patterns_table)

SF = "/root/testdata/sf0.001"


def _brute_contingency(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, g in df.groupby("nationkey"):
        g = g.reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                a, b = g.iloc[i], g.iloc[j]
                pat = (int(a["name"] == b["name"])
                       | (int(a["name"][-4:] == b["name"][-4:]) << 1)
                       | (int(a["segment"] == b["segment"]) << 2)
                       | (int(abs(a["acctbal"] - b["acctbal"])
                              < BAL_TOL) << 3))
                rows.append((pat, int(a["entity_id"] == b["entity_id"])))
    out = pd.DataFrame(rows, columns=["pattern", "gt_match"])
    return out.groupby(["pattern", "gt_match"]).size() \
        .rename("n_pairs").reset_index() \
        .sort_values(["pattern", "gt_match"]).reset_index(drop=True)


def test_fixture_is_deterministic():
    p1 = dirty_records_path(SF)
    t1 = pq.read_table(p1).to_pandas()
    p2 = dirty_records_path(SF)
    assert p1 == p2
    t2 = pq.read_table(p2).to_pandas()
    pd.testing.assert_frame_equal(t1, t2)
    # every rec_id unique; duplicates share entity_id with an original
    assert t1["rec_id"].is_unique
    dups = t1[t1["rec_id"] % 2 == 1]
    assert len(dups) > 0
    assert set(dups["entity_id"]).issubset(
        set(t1[t1["rec_id"] % 2 == 0]["entity_id"]))


def test_contingency_matches_brute_force(ray_session):
    path = dirty_records_path(SF)
    recs = ray.data.read_parquet(path)
    got = pattern_contingency(recs)
    want = _brute_contingency(pq.read_table(path).to_pandas())
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_contingency_partition_invariant(ray_session):
    path = dirty_records_path(SF)
    a = pattern_contingency(ray.data.read_parquet(path))
    b = pattern_contingency(
        ray.data.read_parquet(path, override_num_blocks=7))
    pd.testing.assert_frame_equal(a, b)


def test_patterns_table_shape(ray_session):
    pt = patterns_table(ray.data.read_parquet(dirty_records_path(SF)))
    assert list(pt.columns) == COMPARISONS + ["n_pairs"]
    assert pt["n_pairs"].sum() > 0
    assert (pt[COMPARISONS].isin([0, 1]).all()).all()


def test_em_recovers_planted_params():
    rng = np.random.default_rng(3)
    k = 4
    m_true = np.array([0.95, 0.9, 0.8, 0.85])
    u_true = np.array([0.02, 0.05, 0.2, 0.01])
    lam_true = 0.02
    n = 2_000_000
    n_match = int(n * lam_true)
    pats = np.zeros(1 << k, np.int64)
    for cnt, probs in ((n_match, m_true), (n - n_match, u_true)):
        bits = rng.random((cnt, k)) < probs
        codes = (bits << np.arange(k)).sum(axis=1)
        pats += np.bincount(codes, minlength=1 << k)
    fit = fs_em(np.arange(1 << k), pats.astype(np.float64), k)
    assert np.all(np.diff(fit["ll"]) >= -1e-6 * np.abs(
        np.array(fit["ll"][:-1])))
    assert abs(fit["lam"] - lam_true) < 0.005
    assert np.allclose(fit["m"], m_true, atol=0.03)
    assert np.allclose(fit["u"], u_true, atol=0.03)


def test_survivorship_rules(ray_session):
    from sbb_ned_ray.stages.linkage import survivorship
    df = pd.DataFrame({
        "cl": [1, 1, 1, 2, 2, 3],
        "name": ["b", "a", "a", "z", "y", "q"],   # cl1 mode=a;
        "seg": ["X", "Y", "X", "P", "P", "Q"],    # cl2 tie → lex min
        "bal": [5.0, 7.0, 1.0, 2.0, 3.0, 4.0],
        "nk": [9, 2, 5, 1, 1, 8]})
    out = survivorship(ray.data.from_pandas(df), "cl",
                       mode_cols=["name", "seg"], max_cols=["bal"],
                       min_cols=["nk"], nparts=4).to_pandas() \
        .sort_values("cl").reset_index(drop=True)
    assert out["name_mode"].tolist() == ["a", "y", "q"]
    assert out["seg_mode"].tolist() == ["X", "P", "Q"]
    assert out["bal_max"].tolist() == [7.0, 3.0, 4.0]
    assert out["nk_min"].tolist() == [2, 1, 8]
    assert out["n_records"].tolist() == [3, 2, 1]


def test_jaro_winkler_matches_duckdb():
    import duckdb
    from sbb_ned_ray.stages.linkage import jaro_winkler
    con = duckdb.connect()
    import random
    rng = random.Random(2)
    names = ["martha", "marhta", "dwayne", "duane", "dixon",
             "dicksonx", "", "a", "Customer#000000042",
             "Customer#000000024"]
    names += ["".join(rng.choice("abcXY01 ") for _ in
                      range(rng.randrange(0, 15))) for _ in range(40)]
    for a in names:
        for b in names:
            if not a and not b:
                continue  # DuckDB convention: handled as 0.0 our side
            d = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)",
                [a, b]).fetchone()[0]
            assert abs(jaro_winkler(a, b) - d) < 1e-12, (a, b)


def test_fuzzy_best_match_finds_originals(ray_session):
    import pyarrow.compute as pc
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            fuzzy_best_match)
    recs = ray.data.read_parquet(dirty_records_path(SF)).map_batches(
        lambda t: t.append_column(
            "side", pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")),
        batch_format="pyarrow")
    out = fuzzy_best_match(recs, "nationkey", "rec_id", "name",
                           "side").to_pandas()
    # each probe is 2e+1; its true original is 2e — JW best-match must
    # recover the vast majority
    correct = (out["match_id"] == out["rec_id"] - 1).mean()
    assert correct >= 0.9, correct


def test_linkage_quality_gates(ray_session):
    out = linkage_quality(ray.data.read_parquet(dirty_records_path(SF)))
    assert int(out["ll_monotone"].iloc[0]) == 1
    assert int(out["precision_e6"].iloc[0]) >= 900_000
    assert int(out["recall_e6"].iloc[0]) >= 900_000
    # unsupervised m/u must separate: every comparison more likely
    # under match than non-match
    for c in COMPARISONS:
        assert int(out[f"m_{c}_e6"].iloc[0]) > int(out[f"u_{c}_e6"].iloc[0])


def test_monge_elkan_best_match(ray_session):
    import pyarrow.compute as pc
    from sbb_ned_ray.stages.linkage import (dirty_records_path,
                                            monge_elkan_best_match)
    recs = ray.data.read_parquet(dirty_records_path(SF)).map_batches(
        lambda t: t.append_column(
            "side", pc.cast(pc.bit_wise_and(t["rec_id"], 1), "int32")),
        batch_format="pyarrow")
    out = monge_elkan_best_match(recs, "nationkey", "rec_id", "name",
                                 "side").to_pandas()
    # token-level matching must also recover the planted originals
    correct = (out["match_id"] == out["rec_id"] - 1).mean()
    assert correct >= 0.9, correct
    # the ME mean is a mean of JWs: 0 <= sum/n <= 1
    assert (out["me_sum_e6"] <= out["n_tok"] * 1_000_000).all()
    assert (out["me_sum_e6"] >= 0).all()


def test_monge_elkan_token_order_invariance(ray_session):
    # ME's whole point: reordering tokens must not change the score,
    # while whole-string JW collapses
    import pandas as pd
    from sbb_ned_ray.stages.linkage import monge_elkan_best_match
    recs = pd.DataFrame({
        "rec_id": [0, 1],
        "name": ["Anna B Smith", "Smith Anna B"],
        "nationkey": [0, 0]})
    recs["side"] = recs["rec_id"] % 2
    ds = ray.data.from_pandas(recs)
    out = monge_elkan_best_match(ds, "nationkey", "rec_id", "name",
                                 "side").to_pandas()
    assert len(out) == 1
    # every token of the probe has an exact counterpart: ME == 1.0
    assert int(out["me_sum_e6"].iloc[0]) == int(out["n_tok"].iloc[0]) \
        * 1_000_000
