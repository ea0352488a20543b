"""Edit-distance similarity self-join via PassJoin segment signatures.

Entity-resolution blocking for misspelled / variant surface forms: all
string pairs within Levenshtein distance ``k``, without the O(n²)
cross-product.  Partition-based pigeonhole (Li, Deng, Wang & Feng,
"PASS-JOIN: a partition-based method for similarity joins",
PVLDB 5(3), 2011): split each string into ``k+1`` disjoint segments —
any pair within edit distance ``k`` leaves at least one segment of the
SHORTER string untouched, so its exact copy appears in the longer
string at a position shifted by at most ``k``.  Candidate generation
is therefore an equi-join on ``(segment_index, indexed_length,
segment_bytes)`` signatures; verification is a banded (Ukkonen)
Levenshtein with early cutoff.

Distance semantics are BYTE-level Levenshtein over UTF-8 — matching
DuckDB's ``levenshtein()`` (the oracle twin: e.g. ``'ü' → 'u'`` costs
2), and byte order equals codepoint order for valid UTF-8 so the
``a < b`` pair canonicalization agrees with SQL VARCHAR comparison.

Distributed shape: signatures ride the int32-bucketed exchange idiom
(:mod:`sbb_ned_ray.stages.graph`), candidates dedup through one more
bucketed pass, verification is embarrassingly parallel inside
``map_batches``.  Nothing corpus-sized reaches the driver.  The
reference's fuzzy surface matching plays this role via n-gram/anagram
ANN probes (``qurator/sbb_ned/embeddings/base.py`` consumers); this
operator is the exact-threshold variant with a provable no-miss
guarantee.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from sbb_ned_ray.stages.graph import (_add_hash_part, _bucketed_distinct,
                                      _pd_to_arrow)


def lev_banded(a: bytes, b: bytes, k: int) -> int:
    """Levenshtein distance with cutoff: the exact distance when it is
    ≤ ``k``, else ``k + 1``.  Classic banded DP over a ``2k+1`` diagonal
    window (Ukkonen 1985)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return k + 1
    inf = k + 1
    prev = [j if j <= k else inf for j in range(la + 1)]
    for i in range(1, lb + 1):
        lo = max(1, i - k)
        hi = min(la, i + k)
        cur = [inf] * (la + 1)
        if i - k <= 0:
            cur[lo - 1] = i if i <= k else inf
        bi = b[i - 1]
        for j in range(lo, hi + 1):
            sub = prev[j - 1] + (a[j - 1] != bi)
            dele = prev[j] + 1 if prev[j] < inf else inf
            ins = cur[j - 1] + 1 if cur[j - 1] < inf else inf
            best = sub if sub < dele else dele
            if ins < best:
                best = ins
            cur[j] = best if best < inf else inf
        prev = cur
    return prev[la] if prev[la] <= k else k + 1


def _seg_layout(length: int, k: int) -> list[tuple[int, int]]:
    """(start, seg_len) for the ``k+1`` even segments of a string of
    ``length`` bytes — short segments first (the PassJoin layout)."""
    parts = k + 1
    base, extra = divmod(length, parts)
    out = []
    pos = 0
    for i in range(parts):
        seg = base + (1 if i >= parts - extra else 0)
        out.append((pos, seg))
        pos += seg
    return out


def edit_distance_pairs(strings: ray.data.Dataset, col: str, k: int,
                        nparts: int = 32) -> ray.data.Dataset:
    """All unordered pairs of DISTINCT values of ``col`` within
    byte-level Levenshtein distance ``k`` → Dataset
    ``(s_a, s_b, dist)`` with ``s_a < s_b``.

    Signature keys use ``\\x01`` as the field separator — NOT ``\\x00``:
    pandas' object-hash path (factorize / drop_duplicates) compares
    strings with C-string semantics and silently treats strings equal
    up to an embedded NUL as duplicates, which drops real signatures.
    A separator occurring inside segment bytes only merges buckets
    (extra candidates, filtered by exact verification) — it can never
    hide a true pair.

    Index side: every string emits its ``k+1`` segment signatures.
    Probe side: every string emits, for each indexed length
    ``l ∈ [len-k, len]`` and segment slot, its substrings at the
    ≤ ``k``-shifted positions.  Pigeonhole guarantees every true pair
    collides on ≥ 1 signature; banded verification discards the rest.
    Equal-length pairs collide from both directions and dedup in the
    candidate pass."""
    distinct = _bucketed_distinct(strings, [col], nparts)

    def sig_rows(df: pd.DataFrame) -> pa.Table:
        keys: list[bytes] = []
        vals: list[str] = []
        sides: list[int] = []
        for s in df[col]:
            bs = s.encode("utf-8")
            n = len(bs)
            # strings shorter than k+1 bytes break the pigeonhole (the
            # untouched segment may be EMPTY): they join through a
            # per-length "short class" instead — indexed whole, probed
            # by every string within the k length window (both classes
            # are tiny in surface data; verification stays exact)
            if n <= k:
                keys.append(b"S\x01%d" % n)
                vals.append(s)
                sides.append(1)
            for ln in range(max(0, n - k), min(k, n) + 1):
                keys.append(b"S\x01%d" % ln)
                vals.append(s)
                sides.append(0)
            if n <= k:
                continue
            # index signatures (side 1)
            for i, (st, sl) in enumerate(_seg_layout(n, k)):
                if sl == 0:
                    continue
                keys.append(b"%d\x01%d\x01" % (i, n) + bs[st:st + sl])
                vals.append(s)
                sides.append(1)
            # probe signatures (side 0) against indexed lengths ≤ own
            for ln in range(max(k + 1, n - k), n + 1):
                for i, (st, sl) in enumerate(_seg_layout(ln, k)):
                    if sl == 0:
                        continue
                    prefix = b"%d\x01%d\x01" % (i, ln)
                    for p in range(max(0, st - k),
                                   min(n - sl, st + k) + 1):
                        keys.append(prefix + bs[p:p + sl])
                        vals.append(s)
                        sides.append(0)
        out = pd.DataFrame({"sig": [x.decode("latin1") for x in keys],
                            "s": vals,
                            "side": np.array(sides, np.int8)})
        out = out.drop_duplicates()
        h = (pd.util.hash_pandas_object(out["sig"], index=False)
             .to_numpy() % nparts).astype(np.int32)
        out["_part"] = h
        return _pd_to_arrow(out)

    def candidates(df: pd.DataFrame) -> pa.Table:
        p = df[df["side"] == 0]
        idx = df[df["side"] == 1]
        m = p[["sig", "s"]].merge(idx[["sig", "s"]], on="sig",
                                  suffixes=("_p", "_i"))
        m = m[m["s_p"] != m["s_i"]]
        a = np.minimum(m["s_p"].to_numpy(), m["s_i"].to_numpy())
        b = np.maximum(m["s_p"].to_numpy(), m["s_i"].to_numpy())
        out = pd.DataFrame({"s_a": a, "s_b": b}).drop_duplicates()
        return _pd_to_arrow(out)

    cand = distinct.map_batches(sig_rows, batch_format="pandas") \
        .groupby("_part").map_groups(candidates, batch_format="pandas")
    cand = _bucketed_distinct(cand, ["s_a", "s_b"], nparts)

    def verify(df: pd.DataFrame) -> pa.Table:
        dists = np.fromiter(
            (lev_banded(x.encode("utf-8"), y.encode("utf-8"), k)
             for x, y in zip(df["s_a"], df["s_b"])),
            np.int64, len(df))
        keep = dists <= k
        return _pd_to_arrow(pd.DataFrame({
            "s_a": df["s_a"].to_numpy()[keep],
            "s_b": df["s_b"].to_numpy()[keep],
            "dist": dists[keep]}))

    return cand.map_batches(verify, batch_format="pandas")
