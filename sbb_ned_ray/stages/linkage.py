"""Fellegi–Sunter probabilistic record linkage with EM-trained
match/unmatch weights (Fellegi & Sunter, JASA 1969; the Splink /
FastLink formulation).

The reference scores mention-candidate pairs with a learned decider
over hand-built comparison features
(``qurator/sbb_ned/models/decider.py``); Fellegi–Sunter is the
classical unsupervised counterpart — per-field agreement probabilities
``m_i = P(agree_i | match)`` and ``u_i = P(agree_i | non-match)``
estimated by EM over the agreement-pattern distribution, pairs scored
by the log-likelihood ratio ``Σ log(m_i/u_i)``.

Scale shape (the part that matters at 10^12 records): the E/M steps
only ever touch the **agreement-pattern contingency table** — at most
``2^k`` rows for ``k`` binary comparisons — so the distributed job is
ONE pass over the blocked pairs that bincounts ``(pattern, gt)`` per
block and a narrow groupby-sum; the EM itself runs on the driver over
a 16-row table (this is exactly how Splink scales: the model fit is
pattern-count-sized, never pair-sized).  Pairs are generated inside
each block group vectorized (triu index arithmetic), and the
classification metrics come from the same contingency table — NO pair
row ever reaches the driver or an exchange.

The dirty-records fixture is synthesized deterministically from the
sf's ``customer`` table (duplicate every third customer with seeded
name transpositions / balance noise / segment swaps) and cached as
parquet, so the DuckDB oracle twin reads the identical input.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

COMPARISONS = ["name_exact", "name_sfx4", "seg_exact", "bal_close"]
BAL_TOL = 0.05


# --------------------------------------------------------------------
# deterministic dirty-records fixture
# --------------------------------------------------------------------

def dirty_records_path(sf_dir: str) -> str:
    """Materialize (once) the dirty-duplicates record table derived
    from ``sf_dir``'s customers: every record keeps its true
    ``entity_id``; every third customer gains a perturbed duplicate.
    Returns the parquet path (shared by the Ray query and the DuckDB
    oracle)."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"]).to_pandas()
    out_dir = os.path.join(
        "/tmp/sbb_ned_ray_fixtures",
        f"linkage-{os.path.basename(os.path.normpath(sf_dir))}-"
        f"{len(cust)}")
    out = os.path.join(out_dir, "records.parquet")
    if os.path.exists(out):
        return out

    key = cust["c_custkey"].to_numpy(np.int64)
    base = pd.DataFrame({
        "rec_id": 2 * key,
        "entity_id": key,
        "name": cust["c_name"],
        "nationkey": cust["c_nationkey"].to_numpy(np.int32),
        "acctbal": cust["c_acctbal"].to_numpy(np.float64),
        "segment": cust["c_mktsegment"]})

    dup_src = cust[key % 3 == 0].reset_index(drop=True)
    dkey = dup_src["c_custkey"].to_numpy(np.int64)
    segments = sorted(cust["c_mktsegment"].unique().tolist())

    def perturb_name(name: str, k: int) -> str:
        if k % 9 == 0:  # some exact-name duplicates
            return name
        p = k % (len(name) - 1)
        return name[:p] + name[p + 1] + name[p] + name[p + 2:]

    names = [perturb_name(n, int(k))
             for n, k in zip(dup_src["c_name"], dkey)]
    bal = dup_src["c_acctbal"].to_numpy(np.float64) + \
        np.where(dkey % 5 == 0, 10.0, 0.01)
    seg = [s if k % 7 else segments[(segments.index(s) + 1)
                                    % len(segments)]
           for s, k in zip(dup_src["c_mktsegment"], dkey)]
    dups = pd.DataFrame({
        "rec_id": 2 * dkey + 1,
        "entity_id": dkey,
        "name": names,
        "nationkey": dup_src["c_nationkey"].to_numpy(np.int32),
        "acctbal": bal,
        "segment": seg})
    rec = pd.concat([base, dups], ignore_index=True) \
        .sort_values("rec_id").reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    rec.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return out


def dirty_split_paths(sf_dir: str) -> tuple[str, str]:
    """Deterministic (corpus, delta) split of the dirty-records table
    for the incremental-ER scenarios: the DELTA is the planted
    duplicates from every third nation (``rec_id`` odd and
    ``nationkey % 3 == 0``), the CORPUS is everything else — so
    corpus ∪ delta is exactly :func:`dirty_records_path`'s table and
    the batch DuckDB oracle applies verbatim to incremental results."""
    full = dirty_records_path(sf_dir)
    base = os.path.dirname(full)
    cp, dp = os.path.join(base, "corpus.parquet"), \
        os.path.join(base, "delta.parquet")
    if os.path.exists(cp) and os.path.exists(dp):
        return cp, dp
    rec = pd.read_parquet(full)
    is_delta = (rec["rec_id"] % 2 == 1) & (rec["nationkey"] % 3 == 0)
    for path, df in ((cp, rec[~is_delta]), (dp, rec[is_delta])):
        tmp = path + f".tmp-{os.getpid()}"
        df.reset_index(drop=True).to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return cp, dp


# --------------------------------------------------------------------
# distributed agreement-pattern contingency
# --------------------------------------------------------------------

def _pattern_bits(names: np.ndarray, segs: np.ndarray,
                  bals: np.ndarray, ia: np.ndarray, ib: np.ndarray
                  ) -> np.ndarray:
    """Pattern code per pair (bit i = COMPARISONS[i] agrees)."""
    na, nb = names[ia], names[ib]
    name_exact = na == nb
    # suffix, not prefix: every TPC-H customer name shares the
    # "Customer#" prefix, so only the trailing digits discriminate
    sfx = np.array([s[-4:] for s in names], dtype=object)
    name_sfx4 = sfx[ia] == sfx[ib]
    seg_exact = segs[ia] == segs[ib]
    bal_close = np.abs(bals[ia] - bals[ib]) < BAL_TOL
    return (name_exact.astype(np.int64)
            | (name_sfx4.astype(np.int64) << 1)
            | (seg_exact.astype(np.int64) << 2)
            | (bal_close.astype(np.int64) << 3))


def pattern_contingency(records: ray.data.Dataset,
                        side_col: str | None = None) -> pd.DataFrame:
    """All within-``nationkey``-block pairs → the
    ``(pattern, gt_match) → n_pairs`` contingency (≤ 2^k·2 rows).
    One narrow groupby over 32-long partial count vectors; pair rows
    never leave the block group.

    ``side_col``: dirty-ER by default (all within-block pairs); pass a
    0/1 source column for CLEAN-CLEAN two-source linkage — only
    cross-source pairs are compared (each source assumed internally
    duplicate-free, the Splink ``link_only`` mode)."""
    k = len(COMPARISONS)
    ncell = (1 << k) * 2

    def per_block(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        if n < 2:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(n, k=1)
        if side_col is not None:
            s = df[side_col].to_numpy()
            keep = s[ia] != s[ib]
            ia, ib = ia[keep], ib[keep]
            if not len(ia):
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "n_pairs": pa.array([], pa.int64())})
        names = df["name"].to_numpy()
        pat = _pattern_bits(names, df["segment"].to_numpy(),
                            df["acctbal"].to_numpy(np.float64), ia, ib)
        ent = df["entity_id"].to_numpy(np.int64)
        gt = (ent[ia] == ent[ib]).astype(np.int64)
        counts = np.bincount(pat * 2 + gt, minlength=ncell)
        nz = np.flatnonzero(counts)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n_pairs": pa.array(counts[nz], pa.int64())})

    cells = records.groupby("nationkey") \
        .map_groups(per_block, batch_format="pandas") \
        .groupby("cell").sum("n_pairs").to_pandas() \
        .rename(columns={"sum(n_pairs)": "n_pairs"})
    cells["pattern"] = cells["cell"] // 2
    cells["gt_match"] = cells["cell"] % 2
    return cells[["pattern", "gt_match", "n_pairs"]] \
        .sort_values(["pattern", "gt_match"]).reset_index(drop=True)


def patterns_table(records: ray.data.Dataset) -> pd.DataFrame:
    """Agreement-pattern counts (gt-blind) with one 0/1 column per
    comparison — the oracle-checkable face of the contingency."""
    c = pattern_contingency(records)
    agg = c.groupby("pattern", sort=True)["n_pairs"].sum() \
        .reset_index()
    out = pd.DataFrame({
        name: ((agg["pattern"].to_numpy() >> i) & 1).astype(np.int64)
        for i, name in enumerate(COMPARISONS)})
    out["n_pairs"] = agg["n_pairs"].to_numpy(np.int64)
    return out.sort_values(COMPARISONS).reset_index(drop=True)


# --------------------------------------------------------------------
# EM over the pattern table (driver-side, pattern-count-sized)
# --------------------------------------------------------------------

def fs_em(patterns: np.ndarray, counts: np.ndarray, k: int,
          iters: int = 60) -> dict:
    """Fellegi–Sunter EM: fit ``m_i``, ``u_i`` and the match
    proportion ``lambda`` from agreement-pattern counts alone
    (unsupervised).  Returns the fitted params, per-pattern match
    posteriors, and the log-likelihood trace (must be monotone
    non-decreasing — asserted by the self-checking query)."""
    g = ((patterns[:, None] >> np.arange(k)) & 1).astype(np.float64)
    m = np.full(k, 0.9)
    u = np.full(k, 0.1)
    lam = 0.01
    lls = []
    for _ in range(iters):
        pm = np.prod(np.where(g == 1, m, 1 - m), axis=1)
        pu = np.prod(np.where(g == 1, u, 1 - u), axis=1)
        denom = lam * pm + (1 - lam) * pu
        lls.append(float(np.sum(counts * np.log(denom))))
        w = lam * pm / denom
        cw = counts * w
        cn = counts * (1 - w)
        tot_w, tot_n = cw.sum(), cn.sum()
        m = np.clip(cw @ g / tot_w, 1e-6, 1 - 1e-6)
        u = np.clip(cn @ g / tot_n, 1e-6, 1 - 1e-6)
        lam = tot_w / counts.sum()
        # keep the "match" component the high-agreement one (label
        # switching guard: EM is symmetric in the two components)
        if m.mean() < u.mean():
            m, u = u, m
            lam = 1 - lam
        posterior = lam * np.prod(np.where(g == 1, m, 1 - m), axis=1)
        pu = np.prod(np.where(g == 1, u, 1 - u), axis=1)
        posterior = posterior / (posterior + (1 - lam) * pu)
    return {"m": m, "u": u, "lam": float(lam),
            "posterior": posterior, "ll": lls}


def jaro(a: str, b: str) -> float:
    """Jaro similarity (Jaro 1989), the DuckDB-compatible convention:
    0.0 when either string is empty (DuckDB returns 0 even for two
    empty strings)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    md = max(max(la, lb) // 2 - 1, 0)
    fa = [False] * la
    fb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - md), min(lb, i + md + 1)
        for j in range(lo, hi):
            if not fb[j] and a[i] == b[j]:
                fa[i] = fb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if fa[i]:
            while not fb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3


def jaro_winkler(a: str, b: str, p: float = 0.1,
                 boost_threshold: float = 0.7) -> float:
    """Jaro–Winkler with the standard 0.7 boost threshold and ≤4-char
    prefix bonus — verified identical (to the double) with DuckDB's
    ``jaro_winkler_similarity`` on every non-degenerate case, which is
    what makes the best-match oracle hash-exact."""
    j = jaro(a, b)
    if j <= boost_threshold:
        return j
    l = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        l += 1
    return j + l * p * (1 - j)


def _pad_codes(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Names → (codepoint matrix padded with -1, lengths)."""
    n = len(names)
    lens = np.array([len(s) for s in names], dtype=np.int64)
    lmax = int(lens.max()) if n else 0
    mat = np.full((n, max(lmax, 1)), -1, dtype=np.int64)
    for i, s in enumerate(names):
        if s:
            mat[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    return mat, lens


def jw_row(a: str, cand_mat: np.ndarray, cand_lens: np.ndarray,
           p: float = 0.1, boost_threshold: float = 0.7) -> np.ndarray:
    """Jaro–Winkler of ONE probe string against a padded candidate
    matrix (:func:`_pad_codes`), vectorized across the candidate axis —
    double-identical to the scalar :func:`jaro_winkler` (same IEEE
    operation order; bit-parity pinned by
    ``tests/test_linkage_incremental.py::test_jw_vectorized_parity``).
    The scalar greedy matching loop runs over the ~20 probe chars; the
    per-char window/availability/first-hit steps are one numpy pass
    over all candidates, so a block's best-match scan costs O(probes ×
    probe_len) numpy steps instead of O(probes × candidates) Python
    ``jaro`` calls."""
    C, L = cand_mat.shape
    la = len(a)
    out = np.zeros(C, dtype=np.float64)
    if la == 0 or C == 0:
        return out
    ac = np.frombuffer(a.encode("utf-32-le"),
                       dtype=np.uint32).astype(np.int64)
    lb = cand_lens
    md = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    J = np.arange(L, dtype=np.int64)[None, :]
    fa = np.zeros((C, la), dtype=bool)
    fb = np.zeros((C, L), dtype=bool)
    rows = np.arange(C)
    for i in range(la):
        lo = np.maximum(0, i - md)[:, None]
        hi = np.minimum(lb, i + md + 1)[:, None]
        eligible = (J >= lo) & (J < hi) & ~fb & (cand_mat == ac[i])
        has = eligible.any(axis=1)
        jf = eligible.argmax(axis=1)
        fb[has, jf[has]] = True
        fa[has, i] = True
    m = fa.sum(axis=1)

    # transpositions: a's matched chars in i-order vs b's in j-order
    ra = np.cumsum(fa, axis=1) - 1
    rb = np.cumsum(fb, axis=1) - 1
    mm = int(m.max()) if len(m) else 0
    ta = np.full((C, max(mm, 1)), -1, dtype=np.int64)
    tb = np.full((C, max(mm, 1)), -2, dtype=np.int64)
    r, i = np.nonzero(fa)
    ta[r, ra[r, i]] = ac[i]
    r, j = np.nonzero(fb)
    tb[r, rb[r, j]] = cand_mat[r, j]
    t = ((ta != tb) & (np.arange(max(mm, 1))[None, :] < m[:, None])) \
        .sum(axis=1) // 2

    ok = (m > 0) & (lb > 0)
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j3 = (mf / la + mf / lb + (mf - t) / mf) / 3
    out[ok] = j3[ok]

    # Winkler prefix boost (≤4 chars), only above the 0.7 threshold
    k4 = min(4, la, L)
    if k4 > 0:
        eq = (cand_mat[:, :k4] == ac[:k4][None, :]) & \
            (np.arange(k4)[None, :] < lb[:, None])
        ell = np.cumprod(eq, axis=1).sum(axis=1)
    else:
        ell = np.zeros(C, dtype=np.int64)
    boost = out > boost_threshold
    out[boost] = out[boost] + ell[boost] * p * (1 - out[boost])
    return out


def fuzzy_best_match(records: ray.data.Dataset, block_col: str,
                     id_col: str, name_col: str, side_col: str
                     ) -> ray.data.Dataset:
    """Deterministic fuzzy matching: for every probe record
    (``side_col`` = 1), the best index record (``side_col`` = 0) in
    its block by Jaro–Winkler name similarity (ties → smallest
    candidate id) → ``(rec_id, match_id, jw_e6)``.  The reference's
    ranking step picks one winning candidate per mention the same way
    (``qurator/sbb_ned/models/decider.py`` exact-match override +
    score sort); this is the string-similarity-only variant with a
    DuckDB ``jaro_winkler_similarity`` window-rank oracle twin.

    All comparisons stay inside the block group (the blocking output
    is the contract, as in the FS stages); the exchange is one
    groupby on the int block key."""
    def per_block(df: pd.DataFrame) -> pa.Table:
        probe = df[df[side_col] == 1]
        idx = df[df[side_col] == 0].sort_values(id_col)
        out_id, out_match, out_jw = [], [], []
        if len(idx):
            cand_ids = idx[id_col].to_numpy(np.int64)
            cand_mat, cand_lens = _pad_codes(idx[name_col].tolist())
            for rid, nm in zip(probe[id_col].astype(int),
                               probe[name_col]):
                jw = jw_row(nm, cand_mat, cand_lens)
                # argmax keeps the FIRST max → smallest candidate id
                # on ties (candidates are id-sorted), matching both
                # the scalar keep-first loop and the oracle's window
                # ORDER BY jw DESC, cand ASC
                best = int(np.argmax(jw))
                out_id.append(rid)
                out_match.append(int(cand_ids[best]))
                # floor(x*1e6 + 0.5): same double, same result as the
                # oracle's CAST(floor(jw*1000000 + 0.5) AS BIGINT)
                out_jw.append(int(np.floor(jw[best] * 1_000_000 + 0.5)))
        return pa.table({"rec_id": pa.array(out_id, pa.int64()),
                         "match_id": pa.array(out_match, pa.int64()),
                         "jw_e6": pa.array(out_jw, pa.int64())})

    return records.groupby(block_col) \
        .map_groups(per_block, batch_format="pandas")


def monge_elkan_best_match(records: ray.data.Dataset, block_col: str,
                           id_col: str, name_col: str, side_col: str
                           ) -> ray.data.Dataset:
    """Monge–Elkan token-level fuzzy matching (Monge & Elkan 1996):
    for probe A and candidate B, ME(A,B) = mean over A's tokens of the
    best Jaro–Winkler against B's tokens — the standard recipe for
    multi-word names where token order and omissions break whole-string
    JW ("Anna B. Smith" vs "Smith, Anna").

    Returns ``(rec_id, match_id, me_sum_e6, n_tok)``: the best index
    record per probe by ME within the block.  INTEGER-EXACT contract:
    each per-token max JW is e6-quantized BEFORE summation, so the
    output is pure integer arithmetic (no float-summation-order
    hazard) and the DuckDB twin (unnest tokens → per-token max → SUM)
    is hash-exact.  Since the denominator |A.tokens| is probe-side,
    ranking by ``me_sum_e6`` equals ranking by ME; ties → smallest
    candidate id.  Empty tokens (double spaces) are dropped on both
    sides; candidates with no tokens never match — identical filters
    in the SQL twin.

    Same exchange contract as :func:`fuzzy_best_match`: one groupby on
    the block key, all comparisons block-local; per probe TOKEN the JW
    against every candidate token is one :func:`jw_row` numpy pass,
    reduced per candidate with ``np.maximum.reduceat``."""
    def per_block(df: pd.DataFrame) -> pa.Table:
        probe = df[df[side_col] == 1]
        idx = df[df[side_col] == 0].sort_values(id_col)
        out_id, out_match, out_sum, out_n = [], [], [], []
        cand_ids, cand_toks, tok_owner_bounds = [], [], [0]
        for cid, nm in zip(idx[id_col].astype(int), idx[name_col]):
            toks = [t for t in str(nm).split(" ") if t]
            if not toks:
                continue
            cand_ids.append(cid)
            cand_toks.extend(toks)
            tok_owner_bounds.append(len(cand_toks))
        if cand_ids:
            tok_mat, tok_lens = _pad_codes(cand_toks)
            starts = np.array(tok_owner_bounds[:-1], dtype=np.int64)
            for rid, nm in zip(probe[id_col].astype(int),
                               probe[name_col]):
                ptoks = [t for t in str(nm).split(" ") if t]
                if not ptoks:
                    continue
                sums = np.zeros(len(cand_ids), dtype=np.int64)
                for t in ptoks:
                    jw = jw_row(t, tok_mat, tok_lens)
                    best = np.maximum.reduceat(jw, starts)
                    sums += np.floor(best * 1_000_000 + 0.5) \
                        .astype(np.int64)
                b = int(np.argmax(sums))   # first max → smallest cand id
                out_id.append(rid)
                out_match.append(int(cand_ids[b]))
                out_sum.append(int(sums[b]))
                out_n.append(len(ptoks))
        return pa.table({"rec_id": pa.array(out_id, pa.int64()),
                         "match_id": pa.array(out_match, pa.int64()),
                         "me_sum_e6": pa.array(out_sum, pa.int64()),
                         "n_tok": pa.array(out_n, pa.int64())})

    return records.groupby(block_col) \
        .map_groups(per_block, batch_format="pandas")


def reciprocal_best_match(records: ray.data.Dataset, block_col: str,
                          id_col: str, name_col: str, side_col: str,
                          nparts: int = 32) -> ray.data.Dataset:
    """One-to-one fuzzy matching by reciprocal best hit: a (probe,
    index) pair survives only if each is the other's Jaro–Winkler
    best match — the standard symmetric-assignment constraint of
    deterministic linkage (each record may match at most one record
    on the other side, no chains).  Runs
    :func:`fuzzy_best_match` in both directions and intersects via
    one bucketed exchange on the pair key."""
    from sbb_ned_ray.stages.graph import _add_hash_part, _pd_to_arrow

    fwd = fuzzy_best_match(records, block_col, id_col, name_col,
                           side_col)

    def flip(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        flipped = pc.subtract(1, t[side_col])
        return t.set_column(t.schema.get_field_index(side_col),
                            side_col, flipped)

    bwd = fuzzy_best_match(records.map_batches(
        flip, batch_format="pyarrow"), block_col, id_col, name_col,
        side_col)

    def tag(is_fwd: bool):
        def fn(df: pd.DataFrame) -> pa.Table:
            if is_fwd:
                a = df["rec_id"].to_numpy(np.int64)
                b = df["match_id"].to_numpy(np.int64)
            else:
                a = df["match_id"].to_numpy(np.int64)
                b = df["rec_id"].to_numpy(np.int64)
            out = pd.DataFrame({"a": a, "b": b,
                                "jw_e6": df["jw_e6"].to_numpy(np.int64),
                                "s": np.int8(0 if is_fwd else 1)})
            return _pd_to_arrow(_add_hash_part(out, ["a", "b"], nparts))
        return fn

    both = fwd.map_batches(tag(True), batch_format="pandas") \
        .union(bwd.map_batches(tag(False), batch_format="pandas"))

    def keep_reciprocal(df: pd.DataFrame) -> pa.Table:
        sides = df.groupby(["a", "b"], sort=False)["s"].nunique()
        ok = sides[sides == 2].reset_index()[["a", "b"]]
        f = df[df["s"] == 0].merge(ok, on=["a", "b"])
        return _pd_to_arrow(pd.DataFrame({
            "rec_id": f["a"].to_numpy(np.int64),
            "match_id": f["b"].to_numpy(np.int64),
            "jw_e6": f["jw_e6"].to_numpy(np.int64)}))

    return both.groupby("_part") \
        .map_groups(keep_reciprocal, batch_format="pandas")


def survivorship(records: ray.data.Dataset, cluster_col: str,
                 mode_cols: list[str], max_cols: list[str],
                 min_cols: list[str], nparts: int = 32
                 ) -> ray.data.Dataset:
    """Golden-record survivorship: one row per cluster with per-field
    merge rules — ``mode`` (most frequent value, lexicographically
    smallest on ties), ``max``, ``min``, plus the member count.  The
    canonical "merge the matched records" step of an entity-resolution
    pipeline (the reference keeps one winning candidate per mention —
    ``decide`` in ``qurator/sbb_ned/models/decider.py``; survivorship
    is the record-side equivalent).

    Distributed shape: ONE int32-bucketed exchange on the cluster key;
    every rule is a vectorized pandas aggregate inside the bucket.
    Mode inherently needs the (cluster, value) rows co-located — that
    single shuffle is the whole cost."""
    from sbb_ned_ray.stages.graph import _add_hash_part, _pd_to_arrow

    cols = [cluster_col] + mode_cols + max_cols + min_cols

    def bucket(df: pd.DataFrame) -> pa.Table:
        return _pd_to_arrow(_add_hash_part(df[cols], [cluster_col],
                                           nparts))

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out = df.groupby(cluster_col, sort=True).size() \
            .rename("n_records").reset_index()
        for c in mode_cols:
            cnt = df.groupby([cluster_col, c], sort=False).size() \
                .rename("_cnt").reset_index() \
                .sort_values([cluster_col, "_cnt", c],
                             ascending=[True, False, True])
            pick = cnt.drop_duplicates(cluster_col)[[cluster_col, c]] \
                .rename(columns={c: f"{c}_mode"})
            out = out.merge(pick, on=cluster_col)
        for c in max_cols:
            agg = df.groupby(cluster_col, sort=False)[c].max() \
                .rename(f"{c}_max").reset_index()
            out = out.merge(agg, on=cluster_col)
        for c in min_cols:
            agg = df.groupby(cluster_col, sort=False)[c].min() \
                .rename(f"{c}_min").reset_index()
            out = out.merge(agg, on=cluster_col)
        front = [cluster_col] + [f"{c}_mode" for c in mode_cols] + \
            [f"{c}_max" for c in max_cols] + \
            [f"{c}_min" for c in min_cols] + ["n_records"]
        return _pd_to_arrow(out[front])

    return records.map_batches(bucket, batch_format="pandas") \
        .groupby("_part").map_groups(per_bucket, batch_format="pandas")


def _rhu_e6_int(num: int, den: int) -> int:
    """Integer round-half-up of ``num/den`` at 1e-6 — matches the SQL
    ``(num*2000000 + den) // (2*den)`` exactly (no float anywhere)."""
    return (num * 2_000_000 + den) // (2 * den) if den else 0


def segment_tf_table(records: ray.data.Dataset,
                     block_col: str = "nationkey",
                     value_col: str = "segment") -> pd.DataFrame:
    """Splink-style TERM-FREQUENCY adjustment table for a comparison
    column: per value ``v`` — record count ``n_recs``, term frequency
    ``tf = n_v/N``, the TF Bayes factor ``N/n_v`` that replaces the
    global ``m/u`` ratio when a pair agrees on ``v`` (agreeing on a
    RARE value is stronger match evidence; Splink's
    ``tf_adjustment``), and the number of within-block pairs agreeing
    on ``v``.

    Distributed shape: agree-pair counts need NO pair enumeration —
    pairs agreeing on ``v`` inside block ``b`` are ``C(n_{b,v}, 2)``,
    so the whole job is one narrow ``groupby((block, value)).count()``
    plus a driver-side combine over the (blocks × values)-sized
    table.  All ratios are e6-quantized with pure integer arithmetic,
    which is what makes the DuckDB twin hash-exact."""
    cnt = records.groupby([block_col, value_col]).count().to_pandas() \
        .rename(columns={"count()": "n"})
    n_total = int(cnt["n"].sum())
    by_v = cnt.groupby(value_col, sort=True)
    n_recs = by_v["n"].sum()
    agree = by_v["n"].apply(
        lambda s: int((s.to_numpy(np.int64) *
                       (s.to_numpy(np.int64) - 1) // 2).sum()))
    out = pd.DataFrame({
        value_col: n_recs.index,
        "n_recs": n_recs.to_numpy(np.int64),
        "tf_e6": [_rhu_e6_int(int(n), n_total) for n in n_recs],
        "tf_bf_e6": [_rhu_e6_int(n_total, int(n)) for n in n_recs],
        "n_agree_pairs": agree.to_numpy(np.int64)})
    return out.reset_index(drop=True)


def tf_adjusted_posteriors(records: ray.data.Dataset,
                           value_col: str = "segment") -> pd.DataFrame:
    """Fellegi–Sunter EM fit + Splink-style TF-adjusted match
    posteriors: for every agreement pattern whose ``seg_exact`` bit is
    set, the segment comparison's Bayes factor ``m_seg/u_seg`` is
    replaced by the per-value ``m_seg/tf_v`` — agreeing on a rare
    segment yields a HIGHER posterior than on a common one, same base
    pattern.  Returns one row per (pattern, segment) with the marginal
    and adjusted posteriors (e6), plus per-pattern rows only for
    non-seg-agreeing patterns.  Deterministic (integer contingency in,
    fixed-iteration EM, integer TF table) and partitioning-independent
    like :func:`linkage_quality`."""
    k = len(COMPARISONS)
    seg_bit = COMPARISONS.index("seg_exact")
    cont = pattern_contingency(records)
    agg = cont.groupby("pattern", sort=True)["n_pairs"].sum() \
        .reset_index()
    fit = fs_em(agg["pattern"].to_numpy(np.int64),
                agg["n_pairs"].to_numpy(np.float64), k)
    ll = np.array(fit["ll"])
    assert np.all(np.diff(ll) >= -1e-6 * np.abs(ll[:-1])), \
        "EM log-likelihood decreased"
    m, u, lam = fit["m"], fit["u"], fit["lam"]

    tf = segment_tf_table(records, value_col=value_col)
    tf_v = {str(v): n / tf["n_recs"].sum()
            for v, n in zip(tf[value_col], tf["n_recs"].to_numpy())}

    e6 = lambda x: int(round(x * 1_000_000))  # noqa: E731
    base_odds = lam / (1 - lam)
    rows = []
    for pat, marg_post in zip(agg["pattern"].to_numpy(np.int64),
                              fit["posterior"]):
        bits = [(pat >> i) & 1 for i in range(k)]
        bf = np.where(bits, m / u, (1 - m) / (1 - u))
        if not bits[seg_bit]:
            rows.append({"pattern": int(pat), value_col: "",
                         "posterior_e6": e6(marg_post),
                         "adjusted_e6": e6(marg_post)})
            continue
        for v, tfv in sorted(tf_v.items()):
            bf_adj = bf.copy()
            bf_adj[seg_bit] = min(m[seg_bit] / tfv, 1e12)
            odds = base_odds * float(np.prod(bf_adj))
            rows.append({"pattern": int(pat), value_col: v,
                         "posterior_e6": e6(marg_post),
                         "adjusted_e6": e6(odds / (1 + odds))})
    out = pd.DataFrame(rows).sort_values(
        ["pattern", value_col]).reset_index(drop=True)

    # the adjustment must be monotone: within a seg-agreeing pattern,
    # a rarer value (smaller tf) never yields a lower posterior
    for pat, g in out[out[value_col] != ""].groupby("pattern"):
        order = sorted(g[value_col], key=lambda v: (tf_v[v], v))
        post = g.set_index(value_col).loc[order, "adjusted_e6"] \
            .to_numpy()
        assert np.all(np.diff(post) <= 0), (pat, order, post)
    return out


def golden_records(records: ray.data.Dataset,
                   matches: ray.data.Dataset,
                   nparts: int = 32) -> pd.DataFrame:
    """Match pairs → golden records, the tail of the classical ER
    chain: distributed min-label connected components over the match
    edges, cluster ids attached to every record via one bucketed
    co-shuffle on ``rec_id`` (unmatched records keep their own id),
    then :func:`survivorship` (name/segment mode, acctbal max,
    nationkey min).  Factored out of the ``er_dedupe_golden`` query so
    the resumable ER pipeline reuses the identical oracle-checked
    tail."""
    from sbb_ned_ray.stages.cluster import label_propagation_components
    from sbb_ned_ray.stages.graph import _add_hash_part, _pd_to_arrow

    comp = label_propagation_components(matches, src="rec_id",
                                        dst="match_id", max_iters=64)

    def tag_rec(df: pd.DataFrame) -> pa.Table:
        out = df.copy()
        out["_k"] = out["rec_id"].astype("int64")
        out["_s"] = np.int8(0)
        out["cluster"] = np.int64(0)
        return _pd_to_arrow(_add_hash_part(out, ["_k"], nparts))

    def tag_comp(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"_k": df["node"].astype("int64"),
                            "cluster": df["component"].astype("int64")})
        out["_s"] = np.int8(1)
        return _pd_to_arrow(_add_hash_part(out, ["_k"], nparts))

    def attach(df: pd.DataFrame) -> pa.Table:
        r = df[df["_s"] == 0].drop(columns=["cluster"])
        c = df[df["_s"] == 1][["_k", "cluster"]]
        m = r.merge(c, on="_k", how="left")
        m["cluster"] = m["cluster"].fillna(m["_k"]).astype("int64")
        keep = ["rec_id", "entity_id", "name", "nationkey", "acctbal",
                "segment", "cluster"]
        return _pd_to_arrow(m[[k for k in keep if k in m.columns]])

    clustered = records.map_batches(tag_rec, batch_format="pandas") \
        .union(comp.map_batches(tag_comp, batch_format="pandas")) \
        .groupby("_part").map_groups(attach, batch_format="pandas")

    out = survivorship(clustered, "cluster",
                       mode_cols=["name", "segment"],
                       max_cols=["acctbal"],
                       min_cols=["nationkey"]).to_pandas()
    out["nationkey_min"] = out["nationkey_min"].astype("int64")
    return out.sort_values("cluster").reset_index(drop=True)


# --------------------------------------------------------------------
# incremental linkage serving: persisted block-partitioned record
# index + delta matching
# --------------------------------------------------------------------

LINKAGE_INDEX_VERSION = 1


def _block_buckets(block: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket per block key: ``splitmix64(block) % num_buckets``."""
    from sbb_ned_ray.stages.similarity import _splitmix64
    h = _splitmix64(block.astype(np.int64).view(np.uint64))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def save_linkage_index(records: ray.data.Dataset, artifact_dir: str,
                       block_col: str = "nationkey",
                       id_col: str = "rec_id", name_col: str = "name",
                       num_buckets: int = 64, seed: int = 42) -> str:
    """One-time CLEAN-MASTER record index for INCREMENTAL linkage: the
    deduplicated reference records written hive-partitioned by
    ``bucket = splitmix64(block_key) % num_buckets`` so a later delta
    probe reads ONLY the buckets its own block keys hash to — never the
    whole master file.  Content-addressed (seeded min-n sample of
    (id, name-crc) + row count + knobs + format version) and atomically
    renamed, the ``save_minhash_index`` / ``build_ivf_layout`` pattern
    applied to record linkage.  At master-data scale this is the
    difference between rescanning the full reference table per
    matching increment and touching ``O(delta blocks)`` bytes."""
    import hashlib
    import json
    import shutil
    import uuid
    import zlib

    from sbb_ned_ray.stages.similarity import _splitmix64

    os.makedirs(artifact_dir, exist_ok=True)
    slim = records.select_columns([id_col, block_col, name_col])
    n_rows = slim.count()

    def sample_part(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(ids.view(np.uint64) ^ np.uint64(seed))
        k = min(64, len(ids))
        idx = np.argpartition(h, k - 1)[:k] if len(ids) > k \
            else np.arange(len(ids))
        names = t[name_col].take(pa.array(idx, pa.int64())).to_pylist()
        crc = np.array([zlib.crc32(x.encode("utf-8", "surrogatepass"))
                        for x in names], dtype=np.uint64)
        return pa.table({"h": pa.array(h[idx], pa.uint64()),
                         "id": pa.array(ids[idx], pa.int64()),
                         "crc": pa.array(crc, pa.uint64())})

    samp = slim.map_batches(sample_part, batch_format="pyarrow") \
        .to_pandas().sort_values(["h", "id"]).head(64)
    hsh = hashlib.sha256()
    hsh.update(samp["h"].to_numpy(np.uint64).tobytes())
    hsh.update(samp["id"].to_numpy(np.int64).tobytes())
    hsh.update(samp["crc"].to_numpy(np.uint64).tobytes())
    hsh.update(f"|lkidx-v{LINKAGE_INDEX_VERSION}|{n_rows}|{block_col}|"
               f"{id_col}|{name_col}|{num_buckets}|{seed}".encode())
    fp = hsh.hexdigest()[:16]
    out = os.path.join(artifact_dir, f"lkidx-{fp}")
    done = os.path.join(out, "_LINKAGE_INDEX_COMPLETE")
    if os.path.exists(done):
        return out

    # builder-unique tmp (concurrent same-fingerprint builders must
    # not rmtree each other); first atomic os.replace wins
    tmp = out + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    shutil.rmtree(tmp, ignore_errors=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        blk = t[block_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(_block_buckets(blk, num_buckets),
                               pa.int32()))

    slim.map_batches(add_bucket, batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp, "blocks"),
                       partition_cols=["bucket"])
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"fingerprint": fp, "n_rows": int(n_rows),
                   "version": LINKAGE_INDEX_VERSION,
                   "block_col": block_col, "id_col": id_col,
                   "name_col": name_col, "num_buckets": num_buckets,
                   "seed": seed}, f)
    with open(os.path.join(tmp, "_LINKAGE_INDEX_COMPLETE"), "w") as f:
        json.dump({"fingerprint": fp}, f)
    try:
        os.replace(tmp, out)
    except OSError:
        if not os.path.exists(done):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def linkage_match_incremental(index_path: str,
                              delta: ray.data.Dataset,
                              return_stats: bool = False):
    """Match a DELTA of new records against a persisted
    :func:`save_linkage_index` WITHOUT rescanning the master table:
    the delta's block keys are hashed to their partition buckets (a
    ≤``num_buckets``-int driver footprint regardless of delta size),
    ONLY those partitions are read — as one pruned dataset — and the
    union runs through the exact :func:`fuzzy_best_match` kernel
    (index records ``side=0``, delta ``side=1``).  Master blocks in a
    scanned bucket that hold no delta probe emit nothing, so
    bucket-level pruning is sufficient for exactness: the result is
    identical to a full batch ``fuzzy_best_match`` restricted to the
    delta probes (asserted by ``tests/test_linkage_incremental.py``).

    ``return_stats`` adds ``{buckets_scanned, buckets_total,
    bytes_scanned, bytes_total}`` so the scan-fraction story is
    measured, not asserted."""
    import json

    with open(os.path.join(index_path, "manifest.json")) as f:
        man = json.load(f)
    block_col, id_col, name_col = \
        man["block_col"], man["id_col"], man["name_col"]
    num_buckets = man["num_buckets"]

    def bucket_partial(t: pa.Table) -> pa.Table:
        blk = t[block_col].to_numpy(zero_copy_only=False)
        return pa.table({"bucket": pa.array(
            np.unique(_block_buckets(blk, num_buckets)), pa.int32())})

    touched = sorted(set(
        delta.map_batches(bucket_partial, batch_format="pyarrow")
        .to_pandas()["bucket"].tolist()))

    blocks_dir = os.path.join(index_path, "blocks")
    all_dirs = {int(d.split("=", 1)[1]): os.path.join(blocks_dir, d)
                for d in sorted(os.listdir(blocks_dir))
                if d.startswith("bucket=")}
    probe_files = [os.path.join(all_dirs[b], f)
                   for b in touched if b in all_dirs
                   for f in sorted(os.listdir(all_dirs[b]))
                   if f.endswith(".parquet")]
    stats = {
        "buckets_total": len(all_dirs),
        "buckets_scanned": sum(1 for b in touched if b in all_dirs),
        "bytes_total": sum(
            os.path.getsize(os.path.join(d, f))
            for d in all_dirs.values() for f in os.listdir(d)
            if f.endswith(".parquet")),
        "bytes_scanned": sum(os.path.getsize(f) for f in probe_files),
    }

    def side(v: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.select([id_col, block_col, name_col]) \
                .append_column("side", pa.array(
                    np.full(t.num_rows, v, np.int32), pa.int32()))
        return fn

    if probe_files:
        corpus = ray.data.read_parquet(probe_files) \
            .map_batches(side(0), batch_format="pyarrow")
        union = corpus.union(
            delta.map_batches(side(1), batch_format="pyarrow"))
        out = fuzzy_best_match(union, block_col, id_col, name_col,
                               "side")
    else:
        out = ray.data.from_arrow(pa.table(
            {"rec_id": pa.array([], pa.int64()),
             "match_id": pa.array([], pa.int64()),
             "jw_e6": pa.array([], pa.int64())}))
    return (out, stats) if return_stats else out


def linkage_quality(records: ray.data.Dataset,
                    threshold: float = 0.5) -> pd.DataFrame:
    """Full unsupervised FS linkage + evaluation against the known
    ``entity_id`` ground truth, computed entirely from the
    (pattern, gt) contingency: classify every PATTERN by its EM match
    posterior, then read tp/fp/fn off the table.  One-row DataFrame
    (e6-quantized params + metrics) — deterministic, partitioning-
    independent (integer counts in, fixed-iteration float EM on a
    16-row table out)."""
    k = len(COMPARISONS)
    cont = pattern_contingency(records)
    agg = cont.groupby("pattern", sort=True)["n_pairs"].sum() \
        .reset_index()
    fit = fs_em(agg["pattern"].to_numpy(np.int64),
                agg["n_pairs"].to_numpy(np.float64), k)
    ll = np.array(fit["ll"])
    assert np.all(np.diff(ll) >= -1e-6 * np.abs(ll[:-1])), \
        "EM log-likelihood decreased"
    is_match = dict(zip(agg["pattern"],
                        fit["posterior"] > threshold))
    cont = cont.assign(pred=cont["pattern"].map(is_match))
    tp = int(cont[(cont["gt_match"] == 1) & cont["pred"]]
             ["n_pairs"].sum())
    fp = int(cont[(cont["gt_match"] == 0) & cont["pred"]]
             ["n_pairs"].sum())
    fn = int(cont[(cont["gt_match"] == 1) & ~cont["pred"]]
             ["n_pairs"].sum())
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    e6 = lambda x: int(round(x * 1_000_000))  # noqa: E731
    row = {"n_patterns": len(agg),
           "n_pairs": int(agg["n_pairs"].sum()),
           "lambda_e6": e6(fit["lam"]),
           "tp": tp, "fp": fp, "fn": fn,
           "precision_e6": e6(prec), "recall_e6": e6(rec),
           "ll_monotone": 1}
    for i, name in enumerate(COMPARISONS):
        row[f"m_{name}_e6"] = e6(fit["m"][i])
        row[f"u_{name}_e6"] = e6(fit["u"][i])
    return pd.DataFrame([row])


# --------------------------------------------------------------------
# round-5 wave 4: 3-level string comparators, null-aware patterns,
# the FS clerical-review band, and group linkage
# --------------------------------------------------------------------

def jw3_pattern_table(records: ray.data.Dataset,
                      hi_e2: int = 95, lo_e2: int = 85
                      ) -> pd.DataFrame:
    """Agreement patterns with WINKLER'S 3-LEVEL string comparator on
    the name field (Winkler, "String comparator metrics and enhanced
    decision rules in the Fellegi-Sunter model", 1990): per
    within-``nationkey``-block pair, ``name_jw_level`` is 2 when
    JW ≥ hi, 1 when hi > JW ≥ lo, else 0; ``seg_exact`` / ``bal_close``
    stay binary.  Returns ``(name_jw_level, seg_exact, bal_close,
    n_pairs)``.

    The JW kernel is the vectorized :func:`jw_row` (bit-parity with
    the scalar, double-identical to DuckDB's
    ``jaro_winkler_similarity``), so the level thresholds — compared
    against exact e2 decimals — land identically in both engines and
    the DuckDB twin is hash-exact.  Scale shape = the binary pattern
    pass: per-block bincount over 3·2·2 = 12 cells, one ≤12-row
    groupby, no pair row leaves the block group."""
    hi, lo = hi_e2 / 100.0, lo_e2 / 100.0
    ncell = 3 * 2 * 2

    def per_block(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        if n < 2:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        names = [str(s) for s in df["name"]]
        mat, lens = _pad_codes(names)
        segs = df["segment"].to_numpy()
        bals = df["acctbal"].to_numpy(np.float64)
        counts = np.zeros(ncell, np.int64)
        for i in range(n - 1):
            jw = jw_row(names[i], mat[i + 1:], lens[i + 1:])
            lev = np.where(jw >= hi, 2, np.where(jw >= lo, 1, 0))
            seg = (segs[i + 1:] == segs[i]).astype(np.int64)
            bal = (np.abs(bals[i + 1:] - bals[i]) < BAL_TOL) \
                .astype(np.int64)
            counts += np.bincount(lev * 4 + seg * 2 + bal,
                                  minlength=ncell)
        nz = np.flatnonzero(counts)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n_pairs": pa.array(counts[nz], pa.int64())})

    cells = records.groupby("nationkey") \
        .map_groups(per_block, batch_format="pandas") \
        .groupby("cell").sum("n_pairs").to_pandas() \
        .rename(columns={"sum(n_pairs)": "n_pairs"})
    out = pd.DataFrame({
        "name_jw_level": (cells["cell"] // 4).astype(np.int64),
        "seg_exact": ((cells["cell"] // 2) % 2).astype(np.int64),
        "bal_close": (cells["cell"] % 2).astype(np.int64),
        "n_pairs": cells["n_pairs"].astype(np.int64)})
    return out.sort_values(["name_jw_level", "seg_exact",
                            "bal_close"]).reset_index(drop=True)


def missing_records_path(sf_dir: str) -> str:
    """Dirty-records fixture variant with PLANTED MISSINGNESS for the
    null-aware pattern pass: ``segment`` is NULL when
    ``rec_id % 11 == 0``, ``acctbal`` when ``rec_id % 13 == 0``,
    ``name`` when ``rec_id % 17 == 0`` — deterministic, cached, and
    read by both engines."""
    full = dirty_records_path(sf_dir)
    out = os.path.join(os.path.dirname(full), "records_missing.parquet")
    if os.path.exists(out):
        return out
    rec = pd.read_parquet(full)
    rid = rec["rec_id"].to_numpy(np.int64)
    rec["segment"] = rec["segment"].where(rid % 11 != 0, None)
    rec["acctbal"] = rec["acctbal"].where(rid % 13 != 0, np.nan)
    rec["name"] = rec["name"].where(rid % 17 != 0, None)
    tmp = out + f".tmp-{os.getpid()}"
    rec.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return out


def pattern3_table(records: ray.data.Dataset) -> pd.DataFrame:
    """NULL-AWARE agreement patterns (the Splink / FastLink missing-
    data treatment): per within-``nationkey``-block pair each field
    takes one of THREE states — 0 = disagree, 1 = agree, 2 = either
    side missing — so missingness is its own pattern level instead of
    polluting the agree/disagree counts (under MAR, EM simply gives
    state-2 cells zero weight).  Fields: ``name_sfx4`` (suffix-4
    equality), ``seg_exact``, ``bal_close``.  Returns
    ``(name_state, seg_state, bal_state, n_pairs)`` — 27 cells max,
    same per-block-bincount scale shape as the binary pass."""
    ncell = 27

    def per_block(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        if n < 2:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(n, k=1)
        names = df["name"].to_numpy()
        name_miss = pd.isna(names)
        sfx = np.array([("" if m else str(s)[-4:])
                        for s, m in zip(names, name_miss)],
                       dtype=object)
        segs = df["segment"].to_numpy()
        seg_miss = pd.isna(segs)
        bals = df["acctbal"].to_numpy(np.float64)
        bal_miss = np.isnan(bals)

        def tri_state(eq: np.ndarray, miss: np.ndarray) -> np.ndarray:
            m = miss[ia] | miss[ib]
            return np.where(m, 2, eq.astype(np.int64))

        ns = tri_state(sfx[ia] == sfx[ib], name_miss)
        ss = tri_state(segs[ia] == segs[ib], seg_miss)
        bs = tri_state(np.abs(bals[ia] - bals[ib]) < BAL_TOL, bal_miss)
        counts = np.bincount(ns * 9 + ss * 3 + bs, minlength=ncell)
        nz = np.flatnonzero(counts)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n_pairs": pa.array(counts[nz], pa.int64())})

    cells = records.groupby("nationkey") \
        .map_groups(per_block, batch_format="pandas") \
        .groupby("cell").sum("n_pairs").to_pandas() \
        .rename(columns={"sum(n_pairs)": "n_pairs"})
    out = pd.DataFrame({
        "name_state": (cells["cell"] // 9).astype(np.int64),
        "seg_state": ((cells["cell"] // 3) % 3).astype(np.int64),
        "bal_state": (cells["cell"] % 3).astype(np.int64),
        "n_pairs": cells["n_pairs"].astype(np.int64)})
    return out.sort_values(["name_state", "seg_state", "bal_state"]) \
        .reset_index(drop=True)


# fixed integer-rational FS priors for the clerical band: m_i/10 and
# u_i/10 per comparison, so every pair weight is an exact small
# rational and the band test is integer cross-multiplication in both
# engines (no float ever crosses the oracle hash)
CLERICAL_M10 = (9, 9, 8, 7)
CLERICAL_U10 = (1, 4, 5, 6)


def clerical_pairs(records: ray.data.Dataset,
                   band_num: int = 4, band_den: int = 1
                   ) -> ray.data.Dataset:
    """The Fellegi-Sunter POSSIBLE-MATCH band (the 1969 paper's
    three-way decision rule: link / clerical review / non-link):
    within-``nationkey``-block pairs whose likelihood ratio
    ``W = Π (agreeᵢ ? mᵢ/uᵢ : (1-mᵢ)/(1-uᵢ))`` falls in
    ``[den/num, num/den]`` — too ambiguous to auto-decide, the queue a
    human (or an active-learning labeler) reviews.  Priors are the
    fixed rationals :data:`CLERICAL_M10` / :data:`CLERICAL_U10`, so
    ``W = w_num/w_den`` with integer ``w_num, w_den ≤ 9⁴`` and the
    band test is exact: ``w_num·den ≤ num·w_den  ∧  w_den·den ≤
    num·w_num``.  Returns ``(rec_a, rec_b, w_num, w_den)`` — ONLY the
    band pairs (the review queue), never the full pair set.

    Scale shape: pair enumeration + weight products stay inside the
    block group (vectorized bincount-free products over triu indices);
    only surviving band rows cross the exchange."""
    k = len(COMPARISONS)
    m10 = np.array(CLERICAL_M10, np.int64)
    u10 = np.array(CLERICAL_U10, np.int64)

    def per_block(df: pd.DataFrame) -> pa.Table:
        cols = ["rec_a", "rec_b", "w_num", "w_den"]
        n = len(df)
        if n < 2:
            return pa.table({c: pa.array([], pa.int64())
                             for c in cols})
        ia, ib = np.triu_indices(n, k=1)
        pat = _pattern_bits(df["name"].to_numpy(),
                            df["segment"].to_numpy(),
                            df["acctbal"].to_numpy(np.float64), ia, ib)
        bits = (pat[:, None] >> np.arange(k)) & 1
        wn = np.prod(np.where(bits == 1, m10, 10 - m10), axis=1)
        wd = np.prod(np.where(bits == 1, u10, 10 - u10), axis=1)
        keep = (wn * band_den <= band_num * wd) & \
               (wd * band_den <= band_num * wn)
        rid = df["rec_id"].to_numpy(np.int64)
        ra, rb = rid[ia[keep]], rid[ib[keep]]
        lo = np.minimum(ra, rb)
        hi = np.maximum(ra, rb)
        return pa.table({"rec_a": pa.array(lo, pa.int64()),
                         "rec_b": pa.array(hi, pa.int64()),
                         "w_num": pa.array(wn[keep], pa.int64()),
                         "w_den": pa.array(wd[keep], pa.int64())})

    return records.groupby("nationkey") \
        .map_groups(per_block, batch_format="pandas")


def group_linkage(records: ray.data.Dataset,
                  threshold_e6: int = 100_000) -> ray.data.Dataset:
    """GROUP LINKAGE (On et al., "Group linkage", ICDE 2007) between
    the two deterministic sources of the dirty-records table (side A =
    base records, even ``rec_id``; side B = planted duplicates, odd):
    groups are nations, record-level match = name suffix-4 equality
    (TPC-H names share the ``Customer#`` prefix, so sfx4 collides
    across nations and the result is genuinely non-diagonal), group
    similarity = the deterministic coverage variant
    ``(|A-matched| + |B-matched|) / (|A| + |B|)`` (the bipartite-
    matching sim's SQL-exact lower bound).  Returns
    ``(nation_a, nation_b, matched_a, matched_b, size_a, size_b,
    sim_e6)`` for group pairs with sim ≥ t, round-half-up e6.

    Scale shape: record-match candidates bucket by the sfx4 KEY (per
    key: cross side-A × side-B nation marks, volume Σ df_A·df_B per
    key — the key is 4 digits, so df is corpus/10⁴-sized); per-group
    matched counts come from two bucketed distincts + narrow
    groupbys; group sizes from one groupby; the final attach is a
    driver-side merge over ≤ nations² rows."""
    def key_rows(df: pd.DataFrame) -> pa.Table:
        rid = df["rec_id"].to_numpy(np.int64)
        return pa.table({
            "sfx": pa.array([str(s)[-4:] for s in df["name"]]),
            "nation": pa.array(df["nationkey"].to_numpy(np.int64),
                               pa.int64()),
            "rec": pa.array(rid, pa.int64()),
            "side": pa.array((rid % 2).astype(np.int64), pa.int64())})

    rows = records.map_batches(key_rows, batch_format="pandas")

    def cross(df: pd.DataFrame) -> pa.Table:
        cols = ["nation_a", "nation_b", "rec", "side"]
        outs = []
        for _, g in df.groupby("sfx", sort=False):
            a = g[g["side"] == 0]
            b = g[g["side"] == 1]
            if not len(a) or not len(b):
                continue
            # a-side marks: (nation_a, nation_b, rec_a) and b-side
            # marks: (nation_a, nation_b, rec_b), exploded per
            # opposite-side nation
            bn = np.unique(b["nation"].to_numpy(np.int64))
            an = np.unique(a["nation"].to_numpy(np.int64))
            ar = a["rec"].to_numpy(np.int64)
            aN = a["nation"].to_numpy(np.int64)
            br = b["rec"].to_numpy(np.int64)
            bN = b["nation"].to_numpy(np.int64)
            outs.append(pd.DataFrame({
                "nation_a": np.repeat(aN, len(bn)),
                "nation_b": np.tile(bn, len(aN)),
                "rec": np.repeat(ar, len(bn)),
                "side": np.int64(0)}))
            outs.append(pd.DataFrame({
                "nation_a": np.tile(an, len(bN)),
                "nation_b": np.repeat(bN, len(an)),
                "rec": np.repeat(br, len(an)),
                "side": np.int64(1)}))
        if not outs:
            return pa.table({c: pa.array([], pa.int64())
                             for c in cols})
        out = pd.concat(outs, ignore_index=True)
        return pa.table({c: pa.array(out[c].to_numpy(np.int64),
                                     pa.int64()) for c in cols})

    marks = rows.groupby("sfx").map_groups(cross,
                                           batch_format="pandas")

    def dedup_marks(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(["nation_a", "nation_b", "rec",
                                "side"])
        return pa.table({
            "nation_a": pa.array(d["nation_a"].to_numpy(np.int64)),
            "nation_b": pa.array(d["nation_b"].to_numpy(np.int64)),
            "side": pa.array(d["side"].to_numpy(np.int64)),
            "one": pa.array(np.ones(len(d), np.int64))})

    matched = marks.groupby(["nation_a", "nation_b", "rec", "side"]) \
        .map_groups(lambda df: df.head(1), batch_format="pandas") \
        .map_batches(dedup_marks, batch_format="pandas") \
        .groupby(["nation_a", "nation_b", "side"]).sum("one") \
        .to_pandas().rename(columns={"sum(one)": "n"})

    sizes = records.map_batches(
        lambda df: pa.table({
            "nation": pa.array(df["nationkey"].to_numpy(np.int64)),
            "side": pa.array((df["rec_id"].to_numpy(np.int64) % 2)
                             .astype(np.int64)),
            "one": pa.array(np.ones(len(df), np.int64))}),
        batch_format="pandas") \
        .groupby(["nation", "side"]).sum("one").to_pandas() \
        .rename(columns={"sum(one)": "size"})

    ma = matched[matched["side"] == 0] \
        .rename(columns={"n": "matched_a"})[["nation_a", "nation_b",
                                             "matched_a"]]
    mb = matched[matched["side"] == 1] \
        .rename(columns={"n": "matched_b"})[["nation_a", "nation_b",
                                             "matched_b"]]
    out = ma.merge(mb, on=["nation_a", "nation_b"], how="outer") \
        .fillna(0)
    sa = sizes[sizes["side"] == 0].rename(
        columns={"nation": "nation_a", "size": "size_a"})
    sb = sizes[sizes["side"] == 1].rename(
        columns={"nation": "nation_b", "size": "size_b"})
    out = out.merge(sa[["nation_a", "size_a"]], on="nation_a") \
        .merge(sb[["nation_b", "size_b"]], on="nation_b")
    num = (out["matched_a"] + out["matched_b"]).astype(np.int64)
    den = (out["size_a"] + out["size_b"]).astype(np.int64)
    out["sim_e6"] = (num * 2_000_000 + den) // (2 * den)
    out = out[num * 1_000_000 >= threshold_e6 * den]
    for c in ["nation_a", "nation_b", "matched_a", "matched_b",
              "size_a", "size_b", "sim_e6"]:
        out[c] = out[c].astype(np.int64)
    return out[["nation_a", "nation_b", "matched_a", "matched_b",
                "size_a", "size_b", "sim_e6"]] \
        .sort_values(["nation_a", "nation_b"]).reset_index(drop=True)


# --------------------------------------------------------------------
# phonetic-blocking fixture + soundex-blocked matching
# --------------------------------------------------------------------

_GIVENS = [
    "Alice", "Bruno", "Carla", "Dmitri", "Elena", "Farid", "Greta",
    "Hugo", "Ingrid", "Jonas", "Katya", "Lars", "Mireille", "Nadia",
    "Otto", "Priya", "Quentin", "Rosa", "Stefan", "Tamar", "Ulrich",
    "Vera", "Wilhelm", "Xenia", "Yusuf", "Zofia", "Anton", "Beatrix",
    "Cyril", "Dagmar", "Emil", "Frieda", "Gustav", "Helene", "Ivo",
    "Johanna", "Konrad",
]
_SURNAMES = [
    "Anderson", "Burroughs", "Czarkowska", "Dombrowski", "Eriksen",
    "Fitzgerald", "Gutierrez", "Hoffmann", "Ivanova", "Jablonski",
    "Kowalczyk", "Lindqvist", "Mueller", "Novakova", "Oppenheim",
    "Petterson", "Quarshie", "Rasmussen", "Schneider", "Thibodeau",
    "Ulbricht", "Vasquez", "Wachowski", "Xanthopoulos", "Yamamoto",
    "Zimmermann", "Abramovich", "Bergstrom", "Castellano", "Dupont",
    "Ellington", "Fontaine", "Grabowski", "Henriksen", "Iordanou",
    "Jorgensen", "Kaczmarek", "Lefebvre", "Marchetti", "Nakamura",
    "Ostrowski", "Pellegrino", "Quintero", "Rodriguez", "Sokolova",
    "Takahashi", "Urbanczyk", "Villanueva", "Wisniewski", "Yanagida",
    "Zielinski", "Arnautovic", "Bellingham", "Carvalho", "Delacroix",
    "Eisenberg", "Fernandez", "Giordano", "Haraldsen",
]

_VOWEL_NEXT = {"a": "e", "e": "i", "i": "o", "o": "u", "u": "a",
               "y": "e"}
# same-soundex-code consonant swaps (B/P=1, C/K=2, S/Z=2->no: S=2,Z=2,
# D/T=3, M/N=5, V/F=1, G/J=2) - every pair below shares a digit, so
# the swap is soundex-invariant anywhere after position 0
_CODE_SWAP = {"c": "k", "k": "c", "s": "z", "z": "s", "d": "t",
              "t": "d", "m": "n", "n": "m", "b": "p", "p": "b",
              "v": "f", "f": "v", "g": "j", "j": "g"}


def _perturb_phonetic(surname: str, k: int) -> str:
    """Deterministic, SOUNDEX-INVARIANT surname perturbation (rules
    argued invariant in ``functions/phonetic.py``): duplicate an
    interior letter (a run of equal letters collapses to the same
    code sequence), swap an interior vowel for another vowel (all
    vowels code '0'), or swap an interior consonant for one with the
    same soundex digit.  ``k % 4 == 3`` keeps the exact surname."""
    body = surname[1:].lower()
    mode = k % 4
    if mode == 3 or not body:
        return surname
    if mode == 0:
        p = k % len(body)
        return surname[0] + body[:p] + body[p] + body[p:]
    if mode == 1:
        for i, ch in enumerate(body):
            if ch in _VOWEL_NEXT:
                return surname[0] + body[:i] + _VOWEL_NEXT[ch] \
                    + body[i + 1:]
        return surname
    for i, ch in enumerate(body):
        if ch in _CODE_SWAP:
            return surname[0] + body[:i] + _CODE_SWAP[ch] \
                + body[i + 1:]
    return surname


def phonetic_records_path(sf_dir: str) -> str:
    """Materialize (once) the phonetic-linkage fixture: alphabetic
    person names synthesized deterministically from the sf's customer
    keys; every third customer gains a duplicate whose surname is
    perturbed soundex-invariantly (so phonetic blocking has
    pair-completeness 1.0 by construction while exact-surname
    blocking provably misses the perturbed rows).  Shared by the Ray
    query and the DuckDB oracle."""
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    out_dir = os.path.join(
        "/tmp/sbb_ned_ray_fixtures",
        f"phonetic-{os.path.basename(os.path.normpath(sf_dir))}-"
        f"{len(cust)}")
    out = os.path.join(out_dir, "records.parquet")
    if os.path.exists(out):
        return out

    key = cust["c_custkey"].to_numpy(np.int64)
    given = [_GIVENS[int(k) % len(_GIVENS)] for k in key]
    surname = [_SURNAMES[int(k // 3) % len(_SURNAMES)] for k in key]
    base = pd.DataFrame({
        "rec_id": 2 * key,
        "entity_id": key,
        "given": given,
        "surname": surname,
        "name": [f"{g} {s}" for g, s in zip(given, surname)],
        "nationkey": cust["c_nationkey"].to_numpy(np.int32)})

    dup = base[key % 3 == 0].copy()
    dkey = dup["entity_id"].to_numpy(np.int64)
    dup["rec_id"] = 2 * dkey + 1
    dup["surname"] = [_perturb_phonetic(s, int(k))
                      for s, k in zip(dup["surname"], dkey)]
    dup["name"] = [f"{g} {s}"
                   for g, s in zip(dup["given"], dup["surname"])]
    rec = pd.concat([base, dup], ignore_index=True) \
        .sort_values("rec_id").reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    rec.to_parquet(tmp, index=False)
    os.replace(tmp, out)
    return out


def add_soundex(records: ray.data.Dataset, name_col: str,
                out_col: str = "sdx") -> ray.data.Dataset:
    """Append the soundex blocking key, vectorized per batch
    (factorize-unique -> encode-once -> take)."""
    from sbb_ned_ray.functions.phonetic import soundex_col

    def per_batch(t: pa.Table) -> pa.Table:
        keys = soundex_col(t[name_col].to_pylist())
        return t.append_column(out_col,
                               pa.array(keys, type=pa.string()))

    return records.map_batches(per_batch, batch_format="pyarrow")


# --------------------------------------------------------------------
# R-Swoosh merge-based entity resolution (Benjelloun et al.,
# "Swoosh: a generic approach to entity resolution", VLDB J. 2009)
# --------------------------------------------------------------------

def r_swoosh(records: ray.data.Dataset, block_col: str, id_col: str,
             name_col: str, threshold_e6: int = 900_000
             ) -> ray.data.Dataset:
    """Merge-based ER: iteratively MATCH a record against the merged
    set and MERGE on hit until fixpoint (the R-Swoosh buffer
    algorithm), one merged entity row per survivor.

    match(r, r') = any cross name pair with round-half-up
    ``jw_e6 >= threshold_e6`` (the e6-int compare shared with the
    DuckDB twin); merge = union of member ids + union of name
    variants.  This match/merge pair satisfies ICAR (idempotent,
    commutative, associative, representative: a merged record matches
    x iff some member matched x), so the R-Swoosh fixpoint provably
    equals the connected components of the PAIRWISE match graph with
    each component fully merged — that published equivalence is the
    oracle (`er_swoosh_golden`: recursive-CTE min-label components +
    per-component SQL aggregates).

    Scale shape (D-Swoosh): the buffer algorithm is inherently
    sequential, so parallelism comes from the BLOCKING contract —
    matches only occur inside a block (here: the soundex key), one
    ``groupby(block).map_groups`` exchange, each group resolved
    independently.  Inside a group the pairwise JW matrix over the
    block's UNIQUE names is computed once, vectorized
    (:func:`jw_row` per row), and the buffer loop only tests
    set-membership against it."""
    def per_block(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(id_col)
        ids = df[id_col].astype(int).tolist()
        names = df[name_col].tolist()
        uniq = sorted(set(names))
        col_of = {n: i for i, n in enumerate(uniq)}
        cand_mat, cand_lens = _pad_codes(uniq)
        m = np.zeros((len(uniq), len(uniq)), dtype=bool)
        for i, n in enumerate(uniq):
            jw = jw_row(n, cand_mat, cand_lens)
            m[i] = np.floor(jw * 1_000_000 + 0.5) >= threshold_e6

        # R-Swoosh: I = input queue (id-sorted for determinism),
        # I' = resolved set; a merge goes back to the FRONT of I
        queue = [([rid], frozenset([col_of[n]]))
                 for rid, n in zip(ids, names)]
        resolved: list[tuple[list[int], frozenset]] = []
        while queue:
            rid_set, name_set = queue.pop(0)
            rows = np.fromiter(name_set, dtype=np.int64)
            hit = next(
                (k for k, (_, other) in enumerate(resolved)
                 if m[np.ix_(rows, np.fromiter(other, np.int64))]
                 .any()), None)
            if hit is None:
                resolved.append((rid_set, name_set))
            else:
                o_ids, o_names = resolved.pop(hit)
                queue.insert(0, (sorted(rid_set + o_ids),
                                 name_set | o_names))

        canon, nmem, members, out_names = [], [], [], []
        for rid_set, name_set in resolved:
            canon.append(min(rid_set))
            nmem.append(len(rid_set))
            members.append(",".join(str(r) for r in sorted(rid_set)))
            out_names.append("|".join(sorted(uniq[i]
                                             for i in name_set)))
        return pa.table({
            "canon_id": pa.array(canon, pa.int64()),
            "n_members": pa.array(nmem, pa.int64()),
            "members": pa.array(members, pa.string()),
            "names": pa.array(out_names, pa.string())})

    return records.groupby(block_col) \
        .map_groups(per_block, batch_format="pandas")
