"""Mergeable sketches for web-scale profiling: HyperLogLog distinct
counts, Misra-Gries heavy hitters, and a Bloom-filter semi-join
prefilter.

The reference engine has no sketch layer (its corpora fit SQLite —
e.g. the whole-table reads at ``webapp/app.py:115-129``); at 100 TB the
"how many distinct users / which tokens dominate / which rows survive a
semi-join" questions must be answered WITHOUT a full shuffle.  All
three operators here follow the same Ray Data shape:

    per-batch partial (vectorized numpy, constant-size output)
        -> tiny driver-side merge (bytes per block, not rows)

so the only data movement is O(blocks x sketch_size).  Exact
count-distinct (the correctness baseline for HLL) is also provided as a
two-level dedup whose shuffle moves one row per distinct (group, key)
pair per batch, not one per occurrence.

Hashing: ``pandas.util.hash_array`` (SipHash-based, stable across
processes for a fixed key) gives every sketch a deterministic 64-bit
hash for both int and string columns — results are reproducible
run-to-run, which the tests and the self-checking queries rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

# ---------------------------------------------------------------------------
# shared hashing
# ---------------------------------------------------------------------------


def hash64(values: np.ndarray) -> np.ndarray:
    """Stable (cross-process, cross-run) 64-bit hashes of an int or
    string array."""
    if values.dtype.kind in ("i", "u"):
        return pd.util.hash_array(values.astype(np.int64, copy=False))
    return pd.util.hash_array(values.astype(object), categorize=False)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_idx_rho(values: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-value HLL (register index, rank) pairs — the update kernel
    shared by :func:`hll_partial` and the per-node HyperBall counters
    (``stages/graph.py``).

    Standard HLL (Flajolet et al. 2007): the low ``p`` hash bits pick
    the register, the remaining ``64 - p`` bits' leading-zero count + 1
    is the rank.  Vectorized MSB via float64 frexp on 32-bit HALVES —
    each half is < 2**53 so the exponent is EXACT (frexp on the full
    64-bit value would round values just under a binade top, e.g.
    2**60 - 1 -> 2**60, overstating the MSB by one).
    """
    m = 1 << p
    h = hash64(values)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    nbits = 64 - p

    def _msb32(x: np.ndarray) -> np.ndarray:
        """exact MSB position of values < 2**32 (-1 for 0)."""
        out = np.full(len(x), -1, dtype=np.int64)
        nz = x != 0
        out[nz] = np.frexp(x[nz].astype(np.float64))[1] - 1
        return out

    hi = (w >> np.uint64(32)).astype(np.uint64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    msb = np.where(hi != 0, 32 + _msb32(hi), _msb32(lo))
    rho = np.where(w != 0, nbits - msb, nbits + 1).astype(np.int64)
    return idx, rho


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch -> a 2**p-byte register array (max rho per register);
    see :func:`hll_idx_rho` for the kernel."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    idx, rho = hll_idx_rho(values, p)
    np.maximum.at(regs, idx, rho.astype(np.uint8))
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    return np.maximum.reduce(partials) if partials else np.zeros(0, np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the small-range (linear
    counting) correction; the large-range correction is unnecessary
    with 64-bit hashes."""
    m = len(regs)
    if m == 0:          # no batches at all -> nothing was counted
        return 0.0
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros > 0:
            est = m * np.log(m / zeros)
    return float(est)


def hll_count_distinct(ds: rd.Dataset, col: str, p: int = 12) -> dict:
    """Distributed distinct-count estimate.

    Each batch contributes ONE row holding its 2**p-byte register
    array; the driver folds max over those rows.  Driver traffic is
    ``blocks x 2**p`` bytes (4 KiB/block at p=12) regardless of input
    size.  Standard error ~= 1.04 / sqrt(2**p) (1.6% at p=12).
    """
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        regs = hll_partial(vals, p=p)
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary(m))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    regs = hll_merge([np.frombuffer(r["regs"], dtype=np.uint8)
                      for r in rows])
    return {"estimate": hll_estimate(regs), "p": p, "registers": regs}


def exact_count_distinct_per_group(ds: rd.Dataset, group: str,
                                   key: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT key) GROUP BY group, shuffle-lean: batches
    are deduped to (group, key) pairs FIRST, so the wide groupby moves
    one row per distinct pair per batch; the second aggregate runs over
    the already-unique pairs."""

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[[group, key]].drop_duplicates()

    pairs = ds.map_batches(dedup_pairs, batch_format="pandas")
    uniq = pairs.groupby([group, key]).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"])
    return uniq.groupby(group).aggregate(Count(alias_name="n_distinct"))


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _mg_compress(items: np.ndarray, counts: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Reduce a (item, count) summary to <= k entries by the
    Misra-Gries decrement; returns (items, counts, decrement)."""
    if len(items) <= k:
        return items, counts, 0
    # subtract the (k+1)-th largest count from everything; at most k
    # entries stay positive
    kth = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > kth
    return items[keep], counts[keep] - kth, int(kth)


def mg_partial(values: np.ndarray, k: int) -> tuple[np.ndarray,
                                                    np.ndarray, int, int]:
    """One batch -> an MG summary (items, residual counts, total
    decrement, batch n).  Exact per-batch counts (numpy unique) are a
    zero-error summary; compression only happens when the batch has
    more than k distinct items."""
    u, c = np.unique(values, return_counts=True)
    n = int(c.sum())
    items, counts, decr = _mg_compress(u, c.astype(np.int64), k)
    return items, counts, decr, n


def _mg_finalize(df: "pd.DataFrame", k: int) -> tuple[pd.DataFrame, int]:
    """Shared final step of every MG merge: sum duplicate items, apply
    one decrement round, sort.  ``df`` has columns (item, est).
    Returns (DataFrame[item, est], extra decrement)."""
    merged = df.groupby("item", sort=False)["est"].sum().reset_index()
    items, counts, d2 = _mg_compress(merged["item"].to_numpy(),
                                     merged["est"].to_numpy(np.int64), k)
    out = pd.DataFrame({"item": items, "est": counts}) \
        .sort_values(["est", "item"], ascending=[False, True]) \
        .reset_index(drop=True)
    return out, d2


def mg_merge(summaries: list[tuple[np.ndarray, np.ndarray, int, int]],
             k: int) -> tuple[pd.DataFrame, int, int]:
    """Merge MG summaries (Agarwal et al. 2013: summing then one
    decrement round preserves the n/(k+1) error bound).  Returns
    (DataFrame[item, est], total decrement bound, total n)."""
    frames = [pd.DataFrame({"item": it, "est": ct})
              for it, ct, _, _ in summaries if len(it)]
    decr = sum(d for _, _, d, _ in summaries)
    n = sum(b for _, _, _, b in summaries)
    if not frames:
        return pd.DataFrame({"item": [], "est": []}), decr, n
    out, d2 = _mg_finalize(pd.concat(frames), k)
    return out, decr + d2, n


def explode_ws_tokens(texts: list[str]) -> np.ndarray:
    """THE whitespace tokenization every token statistic in this repo
    shares (heavy_hitters, the corpus profiler, and the exact-count
    baselines the MG guarantee asserts against).  Intentionally counts
    empty-string tokens from consecutive spaces — all producers and
    checkers must agree on that, so change it HERE or nowhere."""
    return np.array(" ".join(texts).split(" ")) if texts \
        else np.array([], dtype=str)


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 64,
                  explode_tokens: bool = False) -> dict:
    """Distributed Misra-Gries: per-batch summaries (<= k rows each)
    merged on the driver.  Guarantees (classic MG, preserved under
    merge — Agarwal et al. 2013): every item with true frequency
    > n/(k+1) is present, and ``est <= true <= est + max_undercount``.

    Each batch also emits ONE metadata row carrying its (decrement, n)
    so the merged error bound is exact without per-row redundancy;
    real items travel prefixed ``i:`` and the metadata row as ``m:``,
    so an empty-string or any other item value can never collide with
    the sentinel.  ``explode_tokens=True`` treats ``col`` as
    whitespace-tokenizable text and sketches token frequencies (the
    corpus-vocabulary use)."""

    def partial(t: pa.Table) -> pa.Table:
        if explode_tokens:
            vals = explode_ws_tokens(t[col].to_pylist())
        else:
            vals = t[col].to_numpy(zero_copy_only=False)
        items, counts, decr, n = mg_partial(vals, k)
        sitems = items.astype(str) if items.dtype.kind not in ("i", "u") \
            else items.astype(np.int64).astype(str)
        return pa.table({
            "item": pa.array(["i:" + s for s in sitems] + ["m:"],
                             pa.string()),
            "est": pa.array(list(counts) + [0], pa.int64()),
            "decr": pa.array([0] * len(items) + [decr], pa.int64()),
            "n": pa.array([0] * len(items) + [n], pa.int64()),
        })

    t = pa.Table.from_pylist(
        ds.map_batches(partial, batch_format="pyarrow").take_all())
    if t.num_rows == 0:
        return {"top": pd.DataFrame({"item": [], "est": []}),
                "max_undercount": 0, "n": 0, "k": k}
    df = t.to_pandas()
    meta = df[df["item"] == "m:"]
    data = df[df["item"] != "m:"].copy()
    data["item"] = data["item"].str.slice(2)
    out, d2 = _mg_finalize(data[["item", "est"]], k)
    decr = int(meta["decr"].sum()) + d2
    n = int(meta["n"].sum())
    return {"top": out, "max_undercount": decr, "n": n, "k": k}


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prefilter
# ---------------------------------------------------------------------------


class BloomFilter:
    """Vectorized Bloom filter over 64-bit hashes (double hashing:
    ``pos_i = h1 + i*h2 mod m``, Kirsch-Mitzenmacher).  ~10 bits/key at
    the default ``bits_per_key`` gives ~1% false positives — the build
    side of a semi-join ships as n/6 bytes instead of a full hash set.
    """

    def __init__(self, keys: np.ndarray, bits_per_key: int = 10,
                 n_hashes: int = 7):
        n = max(len(keys), 1)
        self.m = int(n * bits_per_key) | 1  # odd m keeps h2 cycles long
        self.n_hashes = n_hashes
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)
        if len(keys):
            pos = self._positions(keys)  # (n_hashes, n)
            np.bitwise_or.at(self.bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h = hash64(keys)
        h1 = (h % np.uint64(self.m)).astype(np.uint64)
        h2 = ((h >> np.uint64(32)) % np.uint64(self.m - 1) +
              np.uint64(1)).astype(np.uint64)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) %
                np.uint64(self.m)).astype(np.int64)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)


def bloom_semijoin(probe: rd.Dataset, probe_key: str,
                   build_keys: np.ndarray,
                   bits_per_key: int = 10,
                   exact: bool = True) -> rd.Dataset:
    """``probe WHERE probe_key IN build_keys`` with a broadcast Bloom
    prefilter.

    The filter is built once on the driver and ``ray.put`` once; every
    probe batch tests membership vectorized and drops misses — no
    shuffle of the probe side.  With ``exact=True`` the surviving rows
    (already reduced ~100x for a selective build side) are re-checked
    against the exact sorted key array, making the result EXACT (Bloom
    filters have no false negatives).  At a build side too large to
    broadcast exactly, set ``exact=False`` and follow with the bucketed
    co-shuffle semi-join (`stages/textprep.py` decontaminate pattern)
    over the pre-reduced probe side — the Bloom stage then serves as
    the shuffle-volume reducer, its actual production role.
    """
    bf = BloomFilter(build_keys, bits_per_key=bits_per_key)
    exact_sorted = np.sort(build_keys) if exact else None
    state = ray.put((bf, exact_sorted))

    def prefilter(t: pa.Table) -> pa.Table:
        bloom, ex = ray.get(state)
        keys = t[probe_key].to_numpy(zero_copy_only=False)
        keep = bloom.contains(keys)
        if ex is not None and keep.any():
            cand = keys[keep]
            pos = np.searchsorted(ex, cand)
            pos = np.clip(pos, 0, len(ex) - 1)
            ok = ex[pos] == cand if len(ex) else \
                np.zeros(len(cand), dtype=bool)
            sel = np.flatnonzero(keep)
            keep = np.zeros(len(keys), dtype=bool)
            keep[sel[ok]] = True
        return t.filter(pa.array(keep))

    return probe.map_batches(prefilter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DDSketch-style relative-error quantile sketch
# ---------------------------------------------------------------------------


def dd_bucket(values: np.ndarray, gamma: float) -> np.ndarray:
    """Log-scale bucket index of positive values: ceil(log_gamma(x)).
    The bucket's value range is (gamma^(i-1), gamma^i], so reporting
    the midpoint 2*gamma^i/(gamma+1) is within alpha relative error of
    any member (DDSketch, Masson et al. 2019 — public algorithm)."""
    return np.ceil(np.log(values) / np.log(gamma)).astype(np.int64)


def dd_quantiles(ds: rd.Dataset, col: str, qs: tuple = (0.5, 0.9, 0.99),
                 alpha: float = 0.01) -> "pd.DataFrame":
    """Mergeable quantile sketch over a positive double column.

    Per batch: bucket histogram via one vectorized log + numpy unique
    (rows out = distinct buckets, ~1400 for alpha=1% across 12 orders
    of magnitude — constant, not data-sized).  One narrow groupby sums
    the histograms; the driver walks the ~KB cumulative histogram to
    answer any quantile within ``alpha`` RELATIVE error, guaranteed
    over the positive range.  Values <= 0 are clamped into a dedicated
    zero bucket (reported as 0.0 — the convention shared with
    :func:`dd_quantiles_per_group`; add a mirrored negative store if a
    corpus needs signed quantiles)."""
    gamma = (1 + alpha) / (1 - alpha)

    def partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        # values <= 0 all land in the dedicated zero bucket (clamped;
        # same convention as dd_quantiles_per_group) — the alpha
        # guarantee applies to the positive range
        zeros = int((x <= 0).sum())
        pos = x[x > 0]
        b, c = np.unique(dd_bucket(pos, gamma), return_counts=True)
        if zeros:
            b = np.concatenate([[np.iinfo(np.int64).min], b])
            c = np.concatenate([[zeros], c])
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))
    df = hist.to_pandas().sort_values("bucket").reset_index(drop=True)
    total = int(df["n"].sum())
    cum = df["n"].cumsum()
    out = []
    zero_bucket = np.iinfo(np.int64).min
    for q in qs:
        rank = max(int(np.ceil(q * total)), 1)
        i = int(np.searchsorted(cum.to_numpy(), rank))
        b = int(df["bucket"].iloc[i])
        est = 0.0 if b == zero_bucket else 2 * gamma ** b / (gamma + 1)
        out.append({"q": q, "estimate": est})
    return pd.DataFrame(out)


def hll_distinct_per_group(ds: rd.Dataset, group: str, key: str,
                           p: int = 12) -> "pd.DataFrame":
    """Approximate COUNT(DISTINCT key) GROUP BY group: each batch emits
    one register array PER GROUP PRESENT (constant bytes per group per
    batch), merged by a per-group max in ``map_groups``.  Unlike
    :func:`exact_count_distinct_per_group`, the shuffle volume is
    independent of key cardinality — the register rows are, for a hot
    group, millions of times smaller than its distinct-pair set."""
    m = 1 << p

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group, sort=False):
            regs = hll_partial(sub[key].to_numpy(), p=p)
            out.append({group: g, "regs": regs.tobytes()})
        return pd.DataFrame(out, columns=[group, "regs"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = hll_merge([np.frombuffer(b, dtype=np.uint8)
                          for b in g["regs"]])
        return pd.DataFrame([{group: g[group].iloc[0],
                              "n_distinct_est":
                                  int(round(hll_estimate(regs)))}])

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(group).map_groups(merge, batch_format="pandas") \
        .to_pandas()


def dd_quantiles_per_group(ds: rd.Dataset, group: str, col: str,
                           qs: tuple = (0.5, 0.9, 0.99),
                           alpha: float = 0.01) -> "pd.DataFrame":
    """Per-group DDSketch quantiles: per-batch (group, bucket, n)
    histogram partials -> ONE narrow groupby sum -> per-group walk on
    the driver.  Shuffle volume is O(groups x buckets) per batch —
    independent of row count; the alpha relative-error guarantee is
    per group identical to :func:`dd_quantiles`."""
    gamma = (1 + alpha) / (1 - alpha)
    zero_bucket = np.iinfo(np.int64).min

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col].to_numpy(np.float64)
        b = np.full(len(x), zero_bucket, np.int64)
        pos = x > 0
        b[pos] = dd_bucket(x[pos], gamma)
        return pd.DataFrame({group: df[group], "bucket": b}) \
            .groupby([group, "bucket"], sort=False).size() \
            .rename("n").reset_index()

    hist = ds.map_batches(partial, batch_format="pandas") \
        .groupby([group, "bucket"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    out = []
    for g, sub in hist.groupby(group, sort=True):
        sub = sub.sort_values("bucket")
        total = int(sub["n"].sum())
        cum = sub["n"].cumsum().to_numpy()
        for q in qs:
            rank = max(int(np.ceil(q * total)), 1)
            i = int(np.searchsorted(cum, rank))
            b = int(sub["bucket"].iloc[i])
            est = 0.0 if b == zero_bucket else 2 * gamma ** b / (gamma + 1)
            out.append({group: g, "q": q, "estimate": est})
    return pd.DataFrame(out)


def heavy_hitters_per_group(ds: rd.Dataset, group: str, col: str,
                            k: int = 32) -> "pd.DataFrame":
    """Per-group Misra-Gries heavy hitters: per-batch per-group
    summaries (<= k+1 rows each, the ``m:`` metadata row carrying that
    batch-group's decrement and n) merged inside ``map_groups`` via the
    same :func:`_mg_finalize` as the global path — so the classic MG
    guarantee (present if freq > n_g/(k+1); est <= true <= est +
    max_undercount) holds PER GROUP.  Shuffle volume: O(groups x k)
    rows per batch, independent of row count."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group, sort=False):
            items, counts, decr, n = mg_partial(
                sub[col].to_numpy(), k)
            for it, c in zip(items.astype(str), counts):
                out.append({group: g, "item": "i:" + it,
                            "est": int(c), "decr": 0, "n": 0})
            out.append({group: g, "item": "m:", "est": 0,
                        "decr": decr, "n": n})
        return pd.DataFrame(out,
                            columns=[group, "item", "est", "decr", "n"])

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        meta = gdf[gdf["item"] == "m:"]
        data = gdf[gdf["item"] != "m:"].copy()
        data["item"] = data["item"].str.slice(2)
        top, d2 = _mg_finalize(data[["item", "est"]], k)
        top.insert(0, group, gdf[group].iloc[0])
        top["max_undercount"] = np.int64(int(meta["decr"].sum()) + d2)
        top["n_group"] = np.int64(int(meta["n"].sum()))
        return top

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(group).map_groups(merge, batch_format="pandas") \
        .to_pandas()
