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


def test_jw3_pattern_table_brute(ray_session):
    from sbb_ned_ray.stages.linkage import jaro_winkler, \
        jw3_pattern_table
    rec = pd.read_parquet(dirty_records_path(SF))
    got = jw3_pattern_table(ray.data.read_parquet(
        dirty_records_path(SF)))
    cells = {}
    for _, g in rec.groupby("nationkey"):
        g = g.reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                jw = jaro_winkler(g["name"][i], g["name"][j])
                lev = 2 if jw >= 0.95 else (1 if jw >= 0.85 else 0)
                key = (lev, int(g["segment"][i] == g["segment"][j]),
                       int(abs(g["acctbal"][i] - g["acctbal"][j])
                           < BAL_TOL))
                cells[key] = cells.get(key, 0) + 1
    want = pd.DataFrame(
        [(a, b, c, n) for (a, b, c), n in sorted(cells.items())],
        columns=["name_jw_level", "seg_exact", "bal_close",
                 "n_pairs"])
    pd.testing.assert_frame_equal(got, want)


def test_pattern3_states_brute(ray_session):
    from sbb_ned_ray.stages.linkage import missing_records_path, \
        pattern3_table
    rec = pd.read_parquet(missing_records_path(SF))
    # the fixture actually plants missing values
    assert rec["name"].isna().any()
    assert rec["segment"].isna().any()
    assert rec["acctbal"].isna().any()
    got = pattern3_table(ray.data.read_parquet(
        missing_records_path(SF)))

    def st(x, y, agree):
        if pd.isna(x) or pd.isna(y):
            return 2
        return int(agree(x, y))

    cells = {}
    for _, g in rec.groupby("nationkey"):
        g = g.reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                key = (st(g["name"][i], g["name"][j],
                          lambda x, y: x[-4:] == y[-4:]),
                       st(g["segment"][i], g["segment"][j],
                          lambda x, y: x == y),
                       st(g["acctbal"][i], g["acctbal"][j],
                          lambda x, y: abs(x - y) < BAL_TOL))
                cells[key] = cells.get(key, 0) + 1
    want = pd.DataFrame(
        [(a, b, c, n) for (a, b, c), n in sorted(cells.items())],
        columns=["name_state", "seg_state", "bal_state", "n_pairs"])
    pd.testing.assert_frame_equal(got, want)


def test_clerical_band_is_exact(ray_session):
    from sbb_ned_ray.stages.linkage import (CLERICAL_M10,
                                            CLERICAL_U10,
                                            clerical_pairs)
    rec = pd.read_parquet(dirty_records_path(SF))
    got = clerical_pairs(ray.data.read_parquet(
        dirty_records_path(SF))).to_pandas()
    got = got.sort_values(["rec_a", "rec_b"]).reset_index(drop=True)
    want_rows = []
    for _, g in rec.groupby("nationkey"):
        g = g.reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                bits = [int(g["name"][i] == g["name"][j]),
                        int(g["name"][i][-4:] == g["name"][j][-4:]),
                        int(g["segment"][i] == g["segment"][j]),
                        int(abs(g["acctbal"][i] - g["acctbal"][j])
                            < BAL_TOL)]
                wn = wd = 1
                for b, m, u in zip(bits, CLERICAL_M10, CLERICAL_U10):
                    wn *= m if b else 10 - m
                    wd *= u if b else 10 - u
                if wn <= 4 * wd and wd <= 4 * wn:
                    ra, rb = sorted((int(g["rec_id"][i]),
                                     int(g["rec_id"][j])))
                    want_rows.append((ra, rb, wn, wd))
    want = pd.DataFrame(sorted(want_rows),
                        columns=["rec_a", "rec_b", "w_num", "w_den"])
    assert len(want) > 0            # band non-empty on the fixture
    pd.testing.assert_frame_equal(got, want)


def test_group_linkage_brute(ray_session):
    from sbb_ned_ray.stages.linkage import group_linkage
    rec = pd.read_parquet(dirty_records_path(SF))
    got = group_linkage(ray.data.read_parquet(
        dirty_records_path(SF)))
    a = rec[rec["rec_id"] % 2 == 0].copy()
    b = rec[rec["rec_id"] % 2 == 1].copy()
    a["sfx"] = a["name"].str[-4:]
    b["sfx"] = b["name"].str[-4:]
    m = a.merge(b, on="sfx", suffixes=("_a", "_b"))
    grp = m.groupby(["nationkey_a", "nationkey_b"]).agg(
        matched_a=("rec_id_a", "nunique"),
        matched_b=("rec_id_b", "nunique")).reset_index()
    sa = a.groupby("nationkey").size()
    sb = b.groupby("nationkey").size()
    rows = []
    for _, r in grp.iterrows():
        num = int(r["matched_a"] + r["matched_b"])
        den = int(sa[r["nationkey_a"]] + sb[r["nationkey_b"]])
        if num * 1_000_000 >= 100_000 * den:
            rows.append((int(r["nationkey_a"]), int(r["nationkey_b"]),
                         int(r["matched_a"]), int(r["matched_b"]),
                         int(sa[r["nationkey_a"]]),
                         int(sb[r["nationkey_b"]]),
                         (num * 2_000_000 + den) // (2 * den)))
    want = pd.DataFrame(sorted(rows), columns=[
        "nation_a", "nation_b", "matched_a", "matched_b",
        "size_a", "size_b", "sim_e6"])
    assert (want["nation_a"] != want["nation_b"]).any()  # off-diagonal
    pd.testing.assert_frame_equal(got, want)
