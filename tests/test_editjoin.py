"""PassJoin edit-distance self-join: the banded verifier against a
full-DP brute force (random byte strings, unicode), the pigeonhole
no-miss guarantee against an O(n²) scan on adversarial string sets
(short strings, shared prefixes, embedded separator bytes), and the
distributed operator end-to-end on the sf0.001 mention-surface
fixture vs DuckDB ``levenshtein``."""

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sbb_ned_ray.stages.editjoin import (_seg_layout, edit_distance_pairs,
                                         lev_banded)


def _lev_full(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    prev = list(range(la + 1))
    for i in range(1, lb + 1):
        cur = [i] + [0] * la
        for j in range(1, la + 1):
            cur[j] = min(prev[j - 1] + (a[j - 1] != b[i - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[la]


def test_lev_banded_matches_full_dp():
    rng = random.Random(7)
    alpha = b"abcAB \xc3\xbc"  # incl. a multi-byte codepoint's bytes
    for _ in range(400):
        a = bytes(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        b = bytes(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        full = _lev_full(a, b)
        for k in (0, 1, 2, 3):
            got = lev_banded(a, b, k)
            assert got == (full if full <= k else k + 1), (a, b, k)


def test_seg_layout_covers_string():
    for n in range(0, 40):
        for k in (1, 2, 3):
            segs = _seg_layout(n, k)
            assert len(segs) == k + 1
            pos = 0
            for st, sl in segs:
                assert st == pos and sl >= 0
                pos += sl
            assert pos == n
            lens = [sl for _, sl in segs]
            # PassJoin even split: lengths differ by at most 1,
            # short segments first
            assert max(lens) - min(lens) <= 1
            assert lens == sorted(lens)


def _pairs_brute(strings: list[str], k: int) -> set[tuple[str, str, int]]:
    out = set()
    for i, x in enumerate(strings):
        for y in strings[i + 1:]:
            d = _lev_full(x.encode(), y.encode())
            if d <= k:
                a, b = (x, y) if x < y else (y, x)
                out.add((a, b, d))
    return out


def _pairs_ray(strings: list[str], k: int) -> set[tuple[str, str, int]]:
    ds = ray.data.from_arrow(pa.table({"s": pa.array(strings)}))
    df = edit_distance_pairs(ds, "s", k, nparts=4).to_pandas()
    return set(zip(df["s_a"], df["s_b"], df["dist"]))


def test_editjoin_adversarial_sets(ray_session):
    # short strings (below k+1 bytes), equal lengths, shared prefixes,
    # a separator byte inside a string, duplicates in the input
    strings = ["", "a", "b", "ab", "ba", "abc", "abd", "abcd",
               "Customer#01", "Customer#02", "Customer#91",
               "x\x01y", "x\x01z", "Aachen", "aachen", "Aachen",
               "ü", "u", "üü"]
    for k in (1, 2):
        assert _pairs_ray(strings, k) == _pairs_brute(
            sorted(set(strings)), k)


def test_editjoin_random_no_miss(ray_session):
    rng = random.Random(99)
    strings = list({
        "".join(rng.choice("abcdef") for _ in range(rng.randrange(0, 9)))
        for _ in range(120)})
    assert _pairs_ray(strings, 2) == _pairs_brute(strings, 2)


def test_editjoin_fixture_matches_duckdb(ray_session):
    from sbb_ned_ray.fixtures.generator import pages_dir_for_sf
    path = pages_dir_for_sf("/root/testdata/sf0.001") + \
        "/mentions_gt.parquet"
    ds = ray.data.read_parquet(path, columns=["surface"])
    got = edit_distance_pairs(ds, "surface", 2).to_pandas() \
        .sort_values(["s_a", "s_b"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH d AS (SELECT DISTINCT surface AS s FROM read_parquet('{path}'))
        SELECT a.s AS s_a, b.s AS s_b, levenshtein(a.s, b.s) AS dist
        FROM d a JOIN d b ON a.s < b.s
        WHERE levenshtein(a.s, b.s) <= 2
        ORDER BY s_a, s_b""").df()
    want["dist"] = want["dist"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
