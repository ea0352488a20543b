"""Incremental linkage serving: persisted block-partitioned record
index + delta matching must equal the batch fuzzy match restricted to
the delta probes, while reading only the touched partition buckets."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sbb_ned_ray.stages.linkage import (_block_buckets,
                                        dirty_records_path,
                                        fuzzy_best_match,
                                        linkage_match_incremental,
                                        save_linkage_index)

SF = "/root/testdata/sf0.001"
ART = "/tmp/sbb_ned_ray_artifacts/lkidx_test"


def _flt(recs, mask_fn):
    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(mask_fn(t)))
    return recs.map_batches(fn, batch_format="pyarrow")


def _corpus(recs):
    return _flt(recs, lambda t:
                t["rec_id"].to_numpy(zero_copy_only=False) % 2 == 0)


def _delta(recs):
    def mask(t):
        rid = t["rec_id"].to_numpy(zero_copy_only=False)
        nk = t["nationkey"].to_numpy(zero_copy_only=False)
        return (rid % 2 == 1) & (nk % 3 == 0)
    return _flt(recs, mask)


def _sided(recs):
    return recs.map_batches(
        lambda t: t.append_column("side", pc.cast(
            pc.bit_wise_and(t["rec_id"], 1), "int32")),
        batch_format="pyarrow")


def test_jw_vectorized_parity():
    """The numpy candidate-axis Jaro–Winkler must be BIT-identical to
    the scalar (and therefore to DuckDB) on every fixture pair and on
    the adversarial classics."""
    from sbb_ned_ray.stages.linkage import (_pad_codes, jaro_winkler,
                                            jw_row)
    recs = pd.read_parquet(dirty_records_path(SF))
    for _, g in recs.groupby("nationkey"):
        names = g["name"].tolist()
        cand_mat, lens = _pad_codes(names)
        for a in names[:10]:
            vec = jw_row(a, cand_mat, lens)
            ref = np.array([jaro_winkler(a, b) for b in names])
            assert np.array_equal(vec, ref), a

    hard = ["", "a", "ab", "ba", "martha", "marhta", "dixon",
            "dicksonx", "dwayne", "duane", "müller", "mueller",
            "aaaa", "aaab", "xyxyxy", "yxyxyx", "Customer#0001",
            "Customer#0010", "abcd", "dcba", "ax", "xa"]
    cand_mat, lens = _pad_codes(hard)
    for a in hard:
        vec = jw_row(a, cand_mat, lens)
        ref = np.array([jaro_winkler(a, b) for b in hard])
        assert np.array_equal(vec, ref), a


def test_incremental_matches_batch(ray_session):
    recs = ray.data.read_parquet(dirty_records_path(SF))
    corpus = _corpus(recs)
    delta = _delta(recs)

    idx = save_linkage_index(corpus, ART, block_col="nationkey",
                             id_col="rec_id", name_col="name")
    inc, stats = linkage_match_incremental(idx, delta,
                                           return_stats=True)
    inc = inc.to_pandas().sort_values("rec_id").reset_index(drop=True)

    batch = fuzzy_best_match(_sided(recs), "nationkey", "rec_id",
                             "name", "side").to_pandas()
    batch = batch[batch["rec_id"] % 2 == 1]
    dids = set(delta.to_pandas()["rec_id"])
    batch = batch[batch["rec_id"].isin(dids)] \
        .sort_values("rec_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(inc, batch)
    assert len(inc) == len(dids)

    # partition pruning is real AND exact: scanned buckets == the
    # buckets the delta's block keys hash to, strictly < total
    touched_blocks = np.unique(
        delta.to_pandas()["nationkey"].to_numpy(np.int64))
    want = set(_block_buckets(touched_blocks, 64).tolist())
    have_dirs = {int(d.split("=")[1]) for d in
                 os.listdir(os.path.join(idx, "blocks"))
                 if d.startswith("bucket=")}
    assert stats["buckets_scanned"] == len(want & have_dirs)
    assert stats["buckets_scanned"] < stats["buckets_total"]
    assert 0 < stats["bytes_scanned"] < stats["bytes_total"]


def test_index_idempotent_and_content_addressed(ray_session):
    recs = ray.data.read_parquet(dirty_records_path(SF))
    corpus = _corpus(recs)
    p1 = save_linkage_index(corpus, ART)
    p2 = save_linkage_index(corpus, ART)
    assert p1 == p2
    assert os.path.exists(os.path.join(p1, "_LINKAGE_INDEX_COMPLETE"))

    # a different corpus → a different fingerprint
    smaller = _flt(corpus, lambda t:
        t["rec_id"].to_numpy(zero_copy_only=False) % 4 == 0)
    p3 = save_linkage_index(smaller, ART)
    assert p3 != p1


def test_empty_touch_yields_empty(ray_session):
    recs = ray.data.read_parquet(dirty_records_path(SF))
    corpus = _corpus(recs)
    idx = save_linkage_index(corpus, ART)
    delta = ray.data.from_arrow(pa.table({
        "rec_id": pa.array([999999], pa.int64()),
        "entity_id": pa.array([999999], pa.int64()),
        "name": pa.array(["Customer#999999"]),
        "nationkey": pa.array([10**6], pa.int32()),
        "acctbal": pa.array([0.0], pa.float64()),
        "segment": pa.array(["BUILDING"])}))
    out, stats = linkage_match_incremental(idx, delta,
                                           return_stats=True)
    df = out.to_pandas()
    # the alien block key may hash into an existing bucket (then its
    # block simply has no index rows) or into an absent one (no read)
    assert stats["buckets_scanned"] <= 1
    assert len(df) == 0
