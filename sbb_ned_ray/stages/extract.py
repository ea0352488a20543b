"""Stage: HTML → text extraction (stateless ``map_batches`` transform).

Arrow in / Arrow out; the per-row regex chain is the versioned pure
function :func:`sbb_ned_ray.functions.extract.extract_text` (the per-url
byte-identical invariant).  Stateless → plain-function tasks, not an
actor pool.
"""

from __future__ import annotations

import pyarrow as pa

from sbb_ned_ray.functions.extract import extract_text


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Replace/attach the ``text`` column extracted from ``html``."""
    htmls = batch["html"]
    texts = pa.array(
        [extract_text(h.as_py()) for h in htmls], type=pa.string())
    if "text" in batch.column_names:
        batch = batch.drop_columns(["text"])
    return batch.append_column("text", texts)


def extracted_pages(pages_ds, batch_size: int = 256):
    """pages(url, warc_ts, html, lang) → +text.  Small batch size: html
    payloads are large binary rows (memory-aware sizing)."""
    return pages_ds.map_batches(extract_text_batch, batch_format="pyarrow",
                                batch_size=batch_size)
