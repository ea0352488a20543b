"""Sources: Parquet readers for the web-page table and the KB.

Replaces the reference's Flask JSON ingest (``webapp/app.py:293-386``)
and startup SQLite reads (``webapp/app.py:115-129``): the input is a
Parquet ``pages`` table with the input-hint shape ``(url, warc_ts, html,
text, lang)`` read as a streaming Dataset, and the KB is a small Parquet
table broadcast via ``ray.put``.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data


def read_pages(pages_dir: str, columns: list[str] | None = None,
               langs: tuple[str, ...] | None = None,
               override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Streaming read of the pages table, pruning columns at the read.

    ``override_num_blocks``: on small fixture inputs Ray coalesces the
    handful of tiny files into 1–2 blocks, which caps every downstream
    actor pool at that task count.  Callers pass a CPU-derived override
    (fixtures are written with small row groups so the read can split);
    at real scale (thousands of files) leave it ``None``.
    """
    path = pages_dir
    if os.path.isdir(os.path.join(pages_dir, "pages")):
        path = os.path.join(pages_dir, "pages")
    ds = ray.data.read_parquet(path, columns=columns,
                               override_num_blocks=override_num_blocks)
    if langs:
        value_set = pa.array(sorted(set(langs)))
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t["lang"], value_set=value_set)),
            batch_format="pyarrow")
    return ds


def read_kb_table(fixture_dir: str):
    """Driver-side read of the (small) KB entities table as pyarrow."""
    return pq.read_table(os.path.join(fixture_dir, "kb_entities.parquet"))


def read_kb_sentences(fixture_dir: str):
    """Driver-side read of the sentence-KB table (qid, sent_no, tokens,
    ent_pos, ent_end) — ``None`` when the KB ships without one (the
    evidence synthesis fallback covers that case)."""
    path = os.path.join(fixture_dir, "kb_sentences.parquet")
    if not os.path.exists(path):
        return None
    return pq.read_table(path)


def read_redirects(fixture_dir: str):
    """Driver-side read of the redirects table (rd_from_title →
    rd_title, underscored titles — reference ``webapp/app.py:120-129``);
    ``None`` when the KB ships without one (redirect expansion is then
    a no-op, as in a reference deployment without the redirects db)."""
    path = os.path.join(fixture_dir, "redirects.parquet")
    if not os.path.exists(path):
        return None
    return pq.read_table(path)


def read_gt_mentions(fixture_dir: str):
    return pq.read_table(os.path.join(fixture_dir, "mentions_gt.parquet"))


def read_gt_pairs(fixture_dir: str):
    return pq.read_table(os.path.join(fixture_dir, "mention_pairs_gt.parquet"))
