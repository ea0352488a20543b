"""Incremental dedup against a persisted minhash index: the
daily-crawl shape — a delta must dedup against the corpus without
re-signing it, and the result must agree with the batch run."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs(ids_texts):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([i for i, _ in ids_texts], pa.int64()),
        "text": pa.array([x for _, x in ids_texts]),
    })
    return rd.from_arrow(t).repartition(4)


def _group_text(g: int, tail: str = "") -> str:
    words = " ".join(f"tok{g}x{j}" for j in range(20))
    return f"{words} " * 4 + tail


def test_index_build_is_idempotent(ray_session, tmp_path):
    from sbb_ned_ray.stages.dedup import save_minhash_index
    docs = _docs([(i, _group_text(i)) for i in range(8)])
    p1 = save_minhash_index(docs, str(tmp_path))
    p2 = save_minhash_index(docs, str(tmp_path))
    assert p1 == p2
    import os
    assert os.path.exists(os.path.join(p1, "manifest.json"))
    assert any(n.startswith("bucket=")
               for n in os.listdir(os.path.join(p1, "bands")))


def test_incremental_finds_cross_and_delta_dups(ray_session, tmp_path):
    from sbb_ned_ray.stages.dedup import (
        minhash_dedup_incremental,
        save_minhash_index,
    )
    # corpus: groups 0..5, one doc each (ids 0..5); delta: a near-copy
    # of group 2 (id 100), two near-identical new docs (ids 101, 102),
    # and one unrelated doc (id 103)
    corpus = _docs([(g, _group_text(g)) for g in range(6)])
    delta = _docs([
        (100, _group_text(2, " tail")),
        (101, _group_text(77)),
        (102, _group_text(77, " tail")),
        (103, _group_text(99)),
    ])
    idx = save_minhash_index(corpus, str(tmp_path))
    out = minhash_dedup_incremental(idx, delta, jaccard_threshold=0.7)
    pairs = {tuple(sorted(p)) for p in
             zip(out["pairs"]["id_a"], out["pairs"]["id_b"])}
    assert (2, 100) in pairs          # cross corpus-delta dup
    assert (101, 102) in pairs        # delta-delta dup
    assert all(103 not in p for p in pairs)
    cid = dict(zip(out["clusters"]["doc_id"], out["clusters"]["cluster_id"]))
    assert cid[100] == cid[2] == 2    # min-id representative
    assert cid[101] == cid[102] == 101
    st = out["stats"]
    assert st["n_delta"] == 4
    # the signature fetch must touch only matched corpus docs
    assert st["corpus_sigs_fetched"] == 1
    assert 0 < st["buckets_read"] <= st["buckets_total"]


def test_incremental_matches_batch_pairs(ray_session, tmp_path):
    """Pair-level parity: incremental(corpus index, delta) == batch
    verified pairs over corpus+delta restricted to pairs touching the
    delta."""
    from sbb_ned_ray.stages.dedup import (
        minhash_dedup_incremental,
        minhash_verified_pairs,
        save_minhash_index,
    )
    rows = []
    for g in range(10):
        for c in range(3):
            rows.append((len(rows), _group_text(g, " tail" if c else "")))
    corpus = _docs([r for r in rows if r[0] % 3 != 0])
    delta = _docs([r for r in rows if r[0] % 3 == 0])
    idx = save_minhash_index(corpus, str(tmp_path))
    inc = minhash_dedup_incremental(idx, delta, jaccard_threshold=0.7)
    full = minhash_verified_pairs(_docs(rows), jaccard_threshold=0.7)
    ref = {tuple(sorted(p)) for p in zip(full["id_a"], full["id_b"])
           if p[0] % 3 == 0 or p[1] % 3 == 0}
    got = {tuple(sorted(p)) for p in
           zip(inc["pairs"]["id_a"], inc["pairs"]["id_b"])}
    assert got == ref and len(ref) > 0


def test_empty_delta(ray_session, tmp_path):
    from sbb_ned_ray.stages.dedup import (
        minhash_dedup_incremental,
        save_minhash_index,
    )
    corpus = _docs([(g, _group_text(g)) for g in range(4)])
    idx = save_minhash_index(corpus, str(tmp_path))
    empty = _docs([(999, _group_text(999))]).filter(
        lambda r: False)
    out = minhash_dedup_incremental(idx, empty)
    assert out["pairs"].empty and out["clusters"].empty
    assert out["stats"]["n_delta"] == 0
