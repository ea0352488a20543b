"""Resumable end-to-end entity resolution over a records table.

North_rule: "resumable from checkpoint with per-partition lineage +
metrics" — ``run_ned_resumable`` covers the NED flagship; this module
covers the record-linkage family.  The partition unit is a BLOCK-KEY
GROUP (``splitmix64(block_key) % n_parts``), not an input file: every
matching operator in :mod:`sbb_ned_ray.stages.linkage` is block-local
by contract, so a block-group partition is semantically closed — its
match pairs are exactly the full run's pairs restricted to its blocks,
which is what makes skip-on-restart EXACT rather than approximate.
Each partition's reciprocal-match output is written atomically with a
``_manifest.json`` (input fingerprint, pair/probe counters, wall
time); on restart, matching partitions are skipped.  The
cross-partition tail (connected components → golden records) is
match-pair-sized, not record-sized, and reuses the oracle-checked
:func:`sbb_ned_ray.stages.linkage.golden_records`.

The reference's only resumability analog is per-epoch model
checkpoints (``qurator/sbb_ned/models/bert.py:147-163``); the
per-partition manifest layout follows ``state/manifests.py``.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ER_PIPELINE_VERSION = 2  # bump when the match kernel changes semantics


def er_partitions(records_path: str, n_parts: int = 8
                  ) -> list[tuple[str, str]]:
    """Deterministic (part_id, fingerprint) list: one partition per
    block-key hash group, fingerprinted by the input file identity
    (name, size) + the partition spec + the pipeline version — an
    input rewrite or a kernel version bump invalidates every
    manifest, a restart on identical input skips completed groups."""
    size = os.stat(records_path).st_size
    out = []
    for p in range(n_parts):
        fp = hashlib.sha256(
            f"{os.path.basename(records_path)}|{size}|{p}|{n_parts}|"
            f"erv{ER_PIPELINE_VERSION}".encode()).hexdigest()[:16]
        out.append((f"blockgroup-{p:04d}", fp))
    return out


def _block_group_filter(block_col: str, n_parts: int, part: int):
    from sbb_ned_ray.stages.linkage import _block_buckets

    def fn(t: pa.Table) -> pa.Table:
        blk = t[block_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(
            _block_buckets(blk, n_parts) == part))
    return fn


def _group_digests(delta_path: str, block_col: str, id_col: str,
                   n_parts: int) -> dict[int, str]:
    """Order-independent per-block-group digest of a delta's record
    ids: ``(xor of splitmix64(id), sum mod 2^64, count)`` per group,
    combined from per-batch partials — the driver holds ≤``n_parts``
    rows no matter how large the delta is.  A group absent from the
    delta gets no digest (its fingerprint — and manifest — is
    unchanged, so a resumable rerun SKIPS it)."""
    import hashlib

    from sbb_ned_ray.stages.linkage import _block_buckets
    from sbb_ned_ray.stages.similarity import _splitmix64

    def partial(t: pa.Table) -> pa.Table:
        blk = t[block_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _block_buckets(blk, n_parts)
        h = _splitmix64(ids.view(np.uint64))
        rows = {"g": [], "x": [], "s": [], "n": []}
        for b in np.unique(g):
            m = g == b
            rows["g"].append(int(b))
            rows["x"].append(int(np.bitwise_xor.reduce(h[m])))
            rows["s"].append(int(h[m].sum(dtype=np.uint64)))
            rows["n"].append(int(m.sum()))
        return pa.table({k: pa.array(v, pa.uint64() if k in "xs"
                                     else pa.int64())
                         for k, v in rows.items()})

    parts = ray.data.read_parquet(delta_path,
                                  columns=[block_col, id_col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    out = {}
    for b, grp in parts.groupby("g"):
        x = np.bitwise_xor.reduce(grp["x"].to_numpy(np.uint64))
        s = grp["s"].to_numpy(np.uint64).sum(dtype=np.uint64)
        n = int(grp["n"].sum())
        out[int(b)] = hashlib.sha256(
            f"{int(x)}|{int(s)}|{n}".encode()).hexdigest()[:16]
    return out


def run_er_resumable(records_path: str, out_dir: str,
                     n_parts: int = 8,
                     block_col: str = "nationkey",
                     id_col: str = "rec_id", name_col: str = "name",
                     delta_path: str | None = None):
    """Resumable ER: reciprocal Jaro–Winkler matching per block group
    (written atomically, manifest per partition), then components +
    golden-record survivorship over the union of partition outputs.

    Returns ``(golden_df, summary)`` where summary lists
    skipped/completed partitions and their manifests.  Side convention
    matches the dirty-records fixture: odd ``rec_id`` probes (side 1)
    match against even originals (side 0).

    ``delta_path`` turns this into INCREMENTAL ER MAINTENANCE: because
    every matching operator is block-local, clusters can never span
    block groups — so a batch of new records invalidates ONLY the
    groups it touches.  Each touched group's fingerprint absorbs an
    order-independent digest of the delta ids in that group; a rerun
    over an existing state directory therefore skips every untouched
    group's manifest and recomputes the touched groups over
    corpus ∪ delta.  The result is EXACTLY the batch result over the
    union (same DuckDB oracle), at cost ∝ touched groups — the
    cluster-maintenance analog of ``linkage_match_incremental``."""
    import pyarrow.compute as pc

    from sbb_ned_ray.stages.linkage import (golden_records,
                                            reciprocal_best_match)
    from sbb_ned_ray.state.manifests import run_partitioned

    parts = er_partitions(records_path, n_parts)
    if delta_path is not None:
        import hashlib
        dg = _group_digests(delta_path, block_col, id_col, n_parts)
        parts = [(pid,
                  hashlib.sha256(f"{fp}+{dg[p]}".encode())
                  .hexdigest()[:16] if (p := int(pid.rsplit("-", 1)[1]))
                  in dg else fp)
                 for pid, fp in parts]

    def run_fn(part_id: str):
        p = int(part_id.rsplit("-", 1)[1])
        recs = ray.data.read_parquet(records_path) \
            .map_batches(_block_group_filter(block_col, n_parts, p),
                         batch_format="pyarrow")
        if delta_path is not None:
            recs = recs.union(
                ray.data.read_parquet(delta_path).map_batches(
                    _block_group_filter(block_col, n_parts, p),
                    batch_format="pyarrow"))
        sided = recs.map_batches(
            lambda t: t.append_column("side", pc.cast(
                pc.bit_wise_and(t[id_col], 1), "int32")),
            batch_format="pyarrow")
        matches = reciprocal_best_match(sided, block_col, id_col,
                                        name_col, "side")
        df = matches.to_pandas()
        if df.empty:  # pin the schema so partition files always union
            df = pd.DataFrame({
                "rec_id": pd.Series(dtype="int64"),
                "match_id": pd.Series(dtype="int64"),
                "jw_e6": pd.Series(dtype="int64")})
        df = df[["rec_id", "match_id", "jw_e6"]]
        return df, {"pairs": int(len(df)),
                    "probes": int(df["rec_id"].nunique())
                    if len(df) else 0}

    summary = run_partitioned(parts, out_dir, run_fn)

    match_files = [os.path.join(out_dir, pid, f)
                   for pid, _ in parts
                   for f in sorted(os.listdir(os.path.join(out_dir,
                                                           pid)))
                   if f.endswith(".parquet")]
    matches_ds = ray.data.read_parquet(match_files)
    recs = ray.data.read_parquet(records_path)
    if delta_path is not None:
        recs = recs.union(ray.data.read_parquet(delta_path))
    golden = golden_records(recs, matches_ds)
    return golden, summary
