"""Sorted-neighborhood + prefix-filtered shingle-Jaccard blocking
joins: brute-force parity on random inputs (no-miss / no-extra), the
prefix-length safety direction, and boundary shapes (ties on the sort
key, docs shorter than the shingle width, window straddling block
boundaries)."""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sbb_ned_ray.stages.blockjoin import (_prefix_len,
                                          shingle_jaccard_pairs,
                                          sorted_neighborhood_pairs,
                                          word_shingles)


def _snm_brute(keys: list, ids: list, window: int) -> set:
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for a in range(len(order)):
        for b in range(a + 1, min(a + window, len(order))):
            out.add((ids[order[a]], ids[order[b]], b - a))
    return out


def test_snm_matches_brute_force(ray_session):
    rng = random.Random(11)
    keys = [rng.choice(["aa", "ab", "b", "ca", "cb"]) for _ in range(200)]
    ids = list(range(200))
    rng.shuffle(ids)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys, "id": ids}))
    for window in (2, 5, 17):
        got = sorted_neighborhood_pairs(ds, "k", "id", window).to_pandas()
        got_set = set(zip(got["id_a"], got["id_b"], got["rank_dist"]))
        assert got_set == _snm_brute(keys, ids, window)
        assert len(got) == len(got_set)  # no duplicate emissions


def test_snm_window_larger_than_table(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame({"k": ["x", "x", "y"], "id": [3, 1, 2]}))
    got = sorted_neighborhood_pairs(ds, "k", "id", 10).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"], got["rank_dist"]))
    # rank order: (x,1) (x,3) (y,2) — all 3 pairs
    assert got_set == {(1, 3, 1), (1, 2, 2), (3, 2, 1)}


def test_prefix_len_is_safe():
    # the prefix filter is exact iff p >= m - ceil(t*m) + 1; the float
    # nudge may only lengthen it
    import math
    for m in range(1, 200):
        for t in (0.3, 0.5, 0.7, 0.8, 0.9):
            exact = m - math.ceil(t * m) + 1
            assert _prefix_len(m, t) >= exact
            assert _prefix_len(m, t) <= exact + 1


def _jaccard_brute(texts: dict, n: int, t: float) -> set:
    sets = {i: word_shingles(s, n) for i, s in texts.items()}
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            if not a or not b:
                continue
            inter = len(a & b)
            uni = len(a) + len(b) - inter
            if inter * 1_000_000 >= int(round(t * 1_000_000)) * uni:
                out.add((ids[x], ids[y],
                         (inter * 2_000_000 + uni) // (2 * uni)))
    return out


def test_shingle_jaccard_matches_brute_force(ray_session):
    rng = random.Random(5)
    vocab = ["red", "blue", "green", "key", "row", "scan", "agg"]
    texts = {}
    base = [rng.choice(vocab) for _ in range(30)]
    for i in range(60):
        if i % 3 == 0:  # near-dup of the base with light edits
            words = list(base)
            for _ in range(rng.randrange(0, 4)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            texts[i] = " ".join(words)
        else:
            texts[i] = " ".join(rng.choice(vocab)
                                for _ in range(rng.randrange(1, 40)))
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}))
    for t in (0.5, 0.8):
        got = shingle_jaccard_pairs(ds, "text", "doc_id", t,
                                    shingle_n=3, nparts=8).to_pandas()
        got_set = set(zip(got["id_a"], got["id_b"], got["jaccard_e6"]))
        assert got_set == _jaccard_brute(texts, 3, t)
        assert len(got) == len(got_set)


def test_meta_blocking_cnp_semantics(ray_session):
    from sbb_ned_ray.stages.blockjoin import meta_blocking_cnp
    # names crafted so trigram overlap is obvious: x1/x2 share all
    # trigrams; y shares none with x
    df = pd.DataFrame({
        "rid": [1, 2, 3, 4],
        "nm": ["abcdef", "abcdef", "zzzzzz", "abcxyz"]})
    got = meta_blocking_cnp(ray.data.from_pandas(df), "rid", "nm",
                            k_neighbors=2, max_block=64,
                            min_weight=2, nparts=4).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"], got["w"]))
    # 1-2 share 4 trigrams (abc bcd cde def); 1-4 and 2-4 share 1
    # (abc) < min_weight → pruned; 3 is isolated
    assert got_set == {(1, 2, 4)}


def test_meta_blocking_keeps_planted_dups(ray_session):
    # pair completeness on the dirty-records fixture: most planted
    # duplicate pairs must survive purging + CNP
    from sbb_ned_ray.stages.blockjoin import meta_blocking_cnp
    from sbb_ned_ray.stages.linkage import dirty_records_path
    import pyarrow.parquet as pq
    path = dirty_records_path("/root/testdata/sf0.001")
    recs = ray.data.read_parquet(path, columns=["rec_id", "name"])
    got = meta_blocking_cnp(recs, "rec_id", "name", k_neighbors=5,
                            max_block=64, min_weight=2).to_pandas()
    kept = set(zip(got["id_a"], got["id_b"]))
    t = pq.read_table(path).to_pandas()
    dup_ids = t[t["rec_id"] % 2 == 1]["entity_id"]
    gt = {(2 * int(e), 2 * int(e) + 1) for e in dup_ids}
    pc = len(gt & kept) / len(gt)
    assert pc >= 0.8, pc


def test_shingle_jaccard_short_docs_never_pair(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["one two", "one two", "a b c d", "a b c d"]}))
    got = shingle_jaccard_pairs(ds, "text", "doc_id", 0.5,
                                shingle_n=3, nparts=4).to_pandas()
    # the two-word docs have no 3-gram shingles; the identical 4-word
    # docs share their both shingles exactly
    assert set(zip(got["id_a"], got["id_b"], got["jaccard_e6"])) == \
        {(3, 4, 1_000_000)}


def test_token_cosine_pairs_exact(ray_session):
    # brute-force recomputation over the pruned vocabulary must agree
    # exactly (integer dot/norms, arbitrary-precision threshold)
    import itertools
    from collections import Counter

    from sbb_ned_ray.stages.blockjoin import token_cosine_pairs
    texts = {
        1: "red fox jumps over the lazy dog",
        2: "red fox jumps over a lazy dog",
        3: "completely different words here altogether",
        4: "red fox jumps over the lazy dog",
        5: "the the the the",
    }
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    out = token_cosine_pairs(docs, "text", "doc_id",
                             threshold_e6=800_000, max_df=50,
                             num_partitions=4).to_pandas()
    got = {(a, b): (d, x, y) for a, b, d, x, y in
           out.itertuples(index=False)}
    toks = {i: Counter(t for t in s.split(" ") if t)
            for i, s in texts.items()}
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        shared = set(toks[a]) & set(toks[b])
        dot = sum(toks[a][t] * toks[b][t] for t in shared)
        na2 = sum(c * c for c in toks[a].values())
        nb2 = sum(c * c for c in toks[b].values())
        if dot * dot * 10**12 >= 800_000**2 * na2 * nb2:
            want[(a, b)] = (dot, na2, nb2)
    assert got == want
    assert (1, 4) in got and (1, 2) in got and (1, 3) not in got


def test_token_cosine_max_df_prunes(ray_session):
    from sbb_ned_ray.stages.blockjoin import token_cosine_pairs
    # with max_df=1 no token survives pairing: empty result, stable
    # schema
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b c", "a b c"]}))
    out = token_cosine_pairs(docs, "text", "doc_id", 500_000,
                             max_df=1, num_partitions=2).to_pandas()
    assert len(out) == 0


def test_containment_matches_brute_force(ray_session):
    import itertools

    from sbb_ned_ray.stages.blockjoin import shingle_containment_pairs
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for i in range(40):
        texts[i] = " ".join(rng.choice(vocab) for _ in range(
            rng.randint(3, 25)))
    # plant containments: doc 100 is a prefix of doc 101's text
    texts[100] = texts[0]
    texts[101] = texts[0] + " " + texts[1]
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    t_e6, max_df = 600_000, 25
    out = shingle_containment_pairs(
        docs, "text", "doc_id", t_e6, shingle_n=3, max_df=max_df,
        num_partitions=4).to_pandas()
    got = {(a, b): (i, m, c) for a, b, i, m, c in
           out.itertuples(index=False)}

    # brute force over df-pruned shingle sets
    raw = {i: word_shingles(t, 3) for i, t in texts.items()}
    df_cnt = {}
    for s in raw.values():
        for sh in s:
            df_cnt[sh] = df_cnt.get(sh, 0) + 1
    pruned = {i: {sh for sh in s if df_cnt[sh] <= max_df}
              for i, s in raw.items()}
    want = {}
    for a, b in itertools.permutations(sorted(texts), 2):
        sa, sb = pruned[a], pruned[b]
        if not sa:
            continue
        inter = len(sa & sb)
        if inter * 1_000_000 >= t_e6 * len(sa):
            want[(a, b)] = (inter, len(sa),
                            (inter * 2_000_000 + len(sa))
                            // (2 * len(sa)))
    assert got == want
    # the planted direction holds: 100 ⊂ 101 (but not vice versa
    # unless the sets happen tiny)
    assert (100, 101) in got
    assert got[(100, 101)][2] == 1_000_000


def test_containment_is_directional(ray_session):
    from sbb_ned_ray.stages.blockjoin import shingle_containment_pairs
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c d", "a b c d e f g h i j k l"]}))
    out = shingle_containment_pairs(
        docs, "text", "doc_id", 900_000, shingle_n=3, max_df=50,
        num_partitions=2).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # doc 1's two shingles are both in doc 2 (containment 1.0); doc 2
    # has 10 shingles of which 2 shared (0.2 < 0.9)
    assert got == {(1, 2)}
