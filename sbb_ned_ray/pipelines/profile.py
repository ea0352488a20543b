"""One-shot corpus profile: the "what is in this 100 TB directory"
report a training-data engineer runs before any curation decision.

One streaming pass per statistic family, every global answered by a
mergeable sketch or a narrow aggregate — nothing here materializes the
corpus:

* doc / token totals (per-batch partial sums),
* per-language doc counts (narrow groupby),
* distinct-token estimate (HyperLogLog),
* top tokens (Misra-Gries with its exact undercount bound),
* document-length quantiles (DDSketch, alpha=1% relative error).

Returns a JSON-able dict; the ``profile`` CLI subcommand prints it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from sbb_ned_ray.stages.sketches import (
    dd_quantiles, heavy_hitters, hll_count_distinct,
)


def _token_ds(ds: rd.Dataset) -> rd.Dataset:
    from sbb_ned_ray.stages.sketches import explode_ws_tokens

    def toks(t: pa.Table) -> pa.Table:
        flat = explode_ws_tokens(t["text"].to_pylist())
        return pa.table({"token": pa.array(flat, pa.string())})
    return ds.map_batches(toks, batch_format="pyarrow")


def corpus_profile(docs_path: str, top_k: int = 20,
                   quantiles: tuple = (0.5, 0.9, 0.99)) -> dict:
    """Profile a (text, lang, n_chars) parquet corpus.

    Each statistic family is its own STREAMING pass over the parquet
    (4 scans of 3 columns) — re-reading beats pinning a 100 TB text
    column in the object store, and the reads prune to exactly the
    columns each pass needs."""
    ds = rd.read_parquet(docs_path,
                         columns=["text", "lang", "n_chars"]) \
        .repartition(16)

    def counts(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = sum(s.count(" ") + 1 for s in texts)
        return pa.table({"docs": pa.array([t.num_rows], pa.int64()),
                         "tokens": pa.array([n_tok], pa.int64())})

    tot = ds.map_batches(counts, batch_format="pyarrow") \
        .aggregate(Sum("docs"), Sum("tokens"))
    langs = ds.groupby("lang").aggregate(Count(alias_name="n_docs")) \
        .to_pandas().sort_values("lang")
    hll = hll_count_distinct(_token_ds(ds), "token")
    hot = heavy_hitters(ds, "text", k=top_k * 4, explode_tokens=True)
    qs = dd_quantiles(ds, "n_chars", qs=quantiles, alpha=0.01)
    return {
        "n_docs": int(tot["sum(docs)"]),
        "n_tokens": int(tot["sum(tokens)"]),
        "distinct_tokens_est": int(round(hll["estimate"])),
        "langs": {str(r["lang"]): int(r["n_docs"])
                  for _, r in langs.iterrows()},
        "top_tokens": [
            {"token": str(r["item"]), "count_est": int(r["est"])}
            for _, r in hot["top"].head(top_k).iterrows()],
        "top_token_max_undercount": int(hot["max_undercount"]),
        "len_quantiles": {
            str(r["q"]): float(r["estimate"])
            for _, r in qs.iterrows()},
    }
