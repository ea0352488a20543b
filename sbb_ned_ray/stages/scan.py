"""Distributed prefix scan (global cumulative sum over a sort order).

The classic two-pass parallel scan, Ray-Data-shaped:

1. range-partition sort on the order column (Ray's native ``sort`` —
   the only all-to-all; downstream blocks are disjoint key ranges),
   materialized ONCE so the two passes don't re-execute the upstream
   DAG (the `pairs_to_clusters` round-2 lesson);
2. pass A: each block emits one (block_min_key, block_sum) row — bytes
   per block to the driver, which turns them into exclusive offsets;
3. pass B: each block adds its broadcast offset to its local cumsum.

Both passes run with ``batch_size=None`` (whole-block batches) so the
batch boundaries ARE the block boundaries; pass B additionally verifies
every batch starts on a pass-A boundary and fails loudly otherwise
(merging adjacent whole blocks would still be arithmetically correct —
the local cumsum absorbs the first block's sum — but a mid-block split
would silently reuse the wrong offset, so any misalignment aborts).

Used by the sequence-packing query (`docs_pack_windows`): assigning
documents to fixed-token training windows IS an exclusive prefix sum
over (doc order, token counts), and at 100 TB the scan's only global
step is the tiny offset table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _block_offsets(srt: rd.Dataset, order_col: str, value_col: str
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Pass A: (sorted block min keys, exclusive block offsets)."""
    def block_stat(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"min_key": pa.array([], pa.int64()),
                             "block_sum": pa.array([], pa.int64())})
        keys = t[order_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "min_key": pa.array([int(keys.min())], pa.int64()),
            "block_sum": pa.array([int(vals.sum())], pa.int64())})

    stats = srt.map_batches(block_stat, batch_format="pyarrow",
                            batch_size=None).to_pandas() \
        .sort_values("min_key").reset_index(drop=True)
    offsets = np.concatenate(
        [[0], stats["block_sum"].cumsum().to_numpy()[:-1]]) \
        if len(stats) else np.zeros(0, np.int64)
    return stats["min_key"].to_numpy(np.int64), offsets.astype(np.int64)


def _apply_offsets(srt: rd.Dataset, order_col: str, value_col: str,
                   out_col: str, min_keys: np.ndarray,
                   offsets: np.ndarray) -> rd.Dataset:
    """Pass B: per-block local cumsum + broadcast offset.  ``srt`` must
    be the SAME materialized dataset pass A scanned — any batch not
    starting on a pass-A block boundary raises."""
    ref = ray.put((np.asarray(min_keys, np.int64),
                   np.asarray(offsets, np.int64)))

    def add_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        mks, offs = ray.get(ref)
        keys = t[order_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # rows inside a block may be unsorted relative to each other
        # only if sort() left them so — it doesn't; still, compute the
        # local exclusive cumsum in key order for safety
        order = np.argsort(keys, kind="stable")
        local = np.zeros(len(vals), np.int64)
        local[order] = np.concatenate(
            [[0], np.cumsum(vals[order])[:-1]])
        kmin = int(keys.min())
        i = np.searchsorted(mks, kmin)
        # INVARIANT: pass B must see the same block boundaries pass A
        # recorded (both map over the same materialized blocks with
        # whole-block batches).  If a future Ray version re-batches one
        # of the passes, offsets would be silently wrong — fail loudly.
        if i >= len(mks) or int(mks[i]) != kmin:
            raise RuntimeError(
                f"prefix_scan: batch starting at key {kmin} does not "
                f"align with a pass-A block boundary — the two passes "
                f"saw different batchings")
        return t.append_column(
            out_col, pa.array(local + int(offs[i]), pa.int64()))

    return srt.map_batches(add_scan, batch_format="pyarrow",
                           batch_size=None)


def prefix_scan(ds: rd.Dataset, order_col: str, value_col: str,
                out_col: str = "excl_prefix") -> rd.Dataset:
    """Adds ``out_col`` = exclusive prefix sum of ``value_col`` in
    ``order_col`` order.  ``order_col`` must be unique (it defines the
    scan order).  Input columns are preserved."""
    srt = ds.sort(order_col).materialize()
    min_keys, offsets = _block_offsets(srt, order_col, value_col)
    return _apply_offsets(srt, order_col, value_col, out_col,
                          min_keys, offsets)
