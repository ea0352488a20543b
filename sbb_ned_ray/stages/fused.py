"""Fused NED worker: extract → detect → candidates → pairs → score →
pre-aggregate, in ONE actor pool.

Why fuse: every stage from text extraction to pair scoring is
*mention-local* (no cross-row dependency) and reads the same broadcast
:class:`AliasIndex`.  Running them as separate actor pools would (a)
serialize fat intermediate rows (pair token lists) through the object
store between every stage, and (b) pin one CPU per pool minimum —
on a small node the pools starve the read/shuffle tasks.  One fused
actor pool turns the whole mention-local prefix into a single
``map_batches`` over page batches whose OUTPUT is already the narrow
per-(mention, candidate) partial aggregate — the only thing that ever
crosses the wire is what the ``groupby(mention_key)`` shuffle needs.

This mirrors the reference's own design pressure: its 7 chained
process-pool queues exist only because CPython processes can't share
the models (SURVEY.md §3.1); in Ray the actor owns all of them at once.

The individual stage classes stay importable/testable on their own
(tests/test_ned_stages.py); a GPU deployment splits the scorer back out
by passing ``split_scorer=True`` to the pipeline builder so the
cross-encoder pool can get ``num_gpus``.
"""

from __future__ import annotations

import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.stages.candidates import CandidateGenerator
from sbb_ned_ray.stages.decider import add_mention_key, partial_candidate_agg
from sbb_ned_ray.stages.extract import extract_text_batch
from sbb_ned_ray.stages.mentions import MentionDetector
from sbb_ned_ray.stages.pairs import PairBuilder
from sbb_ned_ray.stages.scorer import DeterministicOverlapScorer


class NedWorker:
    """pages batch (url, html, …) → per-(mention, candidate) partials."""

    def __init__(self, index_ref, config: PipelineConfig | None = None,
                 scorer=None, extract: bool = True):
        import ray
        index = (ray.get(index_ref)
                 if isinstance(index_ref, ray.ObjectRef) else index_ref)
        cfg = config or PipelineConfig()
        self.extract = extract
        self.detector = MentionDetector(index)
        self.candidates = CandidateGenerator(index, cfg)
        self.pairs = PairBuilder(index, cfg)
        self.scorer = scorer or DeterministicOverlapScorer(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.extract:
            batch = extract_text_batch(batch)
        mentions = self.detector(batch)
        if mentions.num_rows == 0:
            return partial_candidate_agg(add_mention_key(
                _empty_scored()))
        cands = self.candidates(mentions)
        if cands.num_rows == 0:
            return partial_candidate_agg(add_mention_key(_empty_scored()))
        pairs = self.pairs(cands)
        scored = self.scorer(pairs)
        return partial_candidate_agg(add_mention_key(scored))


def _empty_scored() -> pa.Table:
    return pa.table({
        "url": pa.array([], pa.string()),
        "mention_id": pa.array([], pa.string()),
        "surface": pa.array([], pa.string()),
        "cand_entity": pa.array([], pa.int64()),
        "candidate_title": pa.array([], pa.string()),
        "qid": pa.array([], pa.string()),
        "rank": pa.array([], pa.int32()),
        "proba": pa.array([], pa.float64()),
        "pair_no": pa.array([], pa.int32()),
        "p0": pa.array([], pa.float64()),
        "p1": pa.array([], pa.float64()),
        "score": pa.array([], pa.float64()),
    })
