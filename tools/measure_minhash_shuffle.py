"""Measure the MinHash-LSH band-shuffle volume: the round-4 band-slice
rows vs the round-3 full-signature-per-band shape, on the same corpus.

Usage: python tools/measure_minhash_shuffle.py [sf_dir]
Prints one JSON line with materialized bytes for both shapes and the
ratio (recorded in BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str) -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import pyarrow as pa

    import ray.data as rd

    from sbb_ned_ray.functions.hashing import MinHasher
    from sbb_ned_ray.stages.dedup import minhash_band_rows, \
        minhash_signatures

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]).repartition(32)
    n_docs = docs.count()
    sigs = minhash_signatures(docs, num_perm=64).materialize()

    new_rows = minhash_band_rows(sigs, num_perm=64, bands=16).materialize()

    def old_shape(batch: pa.Table) -> pa.Table:
        # round-3 shape: full 64-perm signature duplicated into every
        # band row (reconstructed here only to MEASURE it)
        mh = MinHasher(num_perm=64, seed=42)
        out_band, out_id, out_sig = [], [], []
        import numpy as np
        sig_mat = batch["sig"].combine_chunks().flatten() \
            .to_numpy(zero_copy_only=False).reshape(batch.num_rows, 64)
        ids = batch["doc_id"].to_pylist()
        for i, did in enumerate(ids):
            sig = sig_mat[i].astype(np.uint64)
            for bk in mh.band_keys(sig, 16):
                out_band.append(bk)
                out_id.append(did)
                out_sig.append(sig.tolist())
        return pa.table({
            "band_key": pa.array(out_band, pa.uint64()),
            "doc_id": pa.array(out_id),
            "sig": pa.array(out_sig, pa.list_(pa.uint64()))})

    old_rows = sigs.map_batches(old_shape,
                                batch_format="pyarrow").materialize()
    new_b, old_b = new_rows.size_bytes(), old_rows.size_bytes()
    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": int(n_docs),
        "band_rows": int(new_rows.count()),
        "new_slice_bytes": int(new_b),
        "old_fullsig_bytes": int(old_b),
        "new_bytes_per_doc": round(new_b / n_docs, 1),
        "old_bytes_per_doc": round(old_b / n_docs, 1),
        "shuffle_volume_ratio": round(old_b / new_b, 2)}))
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
