"""Measure DRIVER-resident memory of incremental minhash dedup while
the delta grows: with the distributed probe (round 5) the driver holds
only ObjectRefs + the touched-bucket list + hit-sized id arrays, so its
tracemalloc peak should stay near-flat as the delta scales — the old
design collected every delta signature/band row into a Python probe
dict (peak ∝ delta).

Usage: python tools/measure_incremental_driver.py [corpus_docs]
Prints one JSON line per delta size (recorded in BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _text(g: int, tail: str = "") -> str:
    # hashed hex tokens: distinct g values share essentially no char
    # 5-gram shingles (templated tokens like "tok{g}w{j}" would make
    # every doc a near-dup of every other and swamp the measurement)
    toks = [format(((g * 1_000_003 + j) * 0x9E3779B97F4A7C15)
                   % 2 ** 48, "x") for j in range(40)]
    return (" ".join(toks) + " ") * 2 + tail


def _docs_table(start: int, n: int, n_corpus: int, dup_every: int):
    import pyarrow as pa
    ids, texts = [], []
    for i in range(n):
        did = start + i
        if dup_every and i % dup_every == 0:
            # near-copy of a corpus doc
            ids.append(did)
            texts.append(_text(did % n_corpus, " tail"))
        else:
            ids.append(did)
            texts.append(_text(did))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})


def main(n_corpus: int = 4000) -> None:
    import tracemalloc

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from sbb_ned_ray.stages.dedup import (
        minhash_dedup_incremental,
        save_minhash_index,
    )

    corpus = rd.from_arrow(_docs_table(0, n_corpus, n_corpus,
                                       dup_every=0)).repartition(16)
    idx = save_minhash_index(corpus, "/tmp/sbb_ned_ray_artifacts/mhidx_drv")

    base = 1_000_000
    for n_delta in (500, 2000, 8000):
        delta = rd.from_arrow(
            _docs_table(base, n_delta, n_corpus, dup_every=20)) \
            .repartition(16).materialize()
        base += n_delta
        tracemalloc.start()
        out = minhash_dedup_incremental(idx, delta, jaccard_threshold=0.7)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        st = out["stats"]
        print(json.dumps({
            "n_corpus": n_corpus, "n_delta": n_delta,
            "driver_tracemalloc_peak_mb": round(peak / 2 ** 20, 2),
            "driver_peak_bytes_per_delta_doc": round(peak / n_delta, 1),
            "n_pairs": st["n_pairs"],
            "corpus_sigs_fetched": st["corpus_sigs_fetched"],
            "buckets_read": st["buckets_read"]}))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
