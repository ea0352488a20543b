"""Stage: sentence-pair cross-encoder scoring (actor-pool stage).

The reference scores (query-sentence, candidate-sentence) pairs with a
BERT sentence-pair cross-encoder on GPU
(``models/classifier_decider_queue.py:37-104``, model forward
``models/bert.py:307-326``), emitting softmax probs ``p0/p1`` and
``score = log(p1/p0)``.

Here the scorer is a pluggable actor class behind one interface; the
default :class:`DeterministicOverlapScorer` is a deterministic
CPU-only stand-in (SURVEY.md §7.2 step 5) measuring entity-context
token overlap + surface agreement, calibrated through a logistic so
downstream semantics (log-odds scores, decider statistics, thresholds)
are identical to a real model's.  A real BERT adapter implements the
same ``score_batch`` and is passed ``num_gpus`` via
``map_batches(Cls, concurrency=N, num_gpus=1, batch_size=B)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.normalization import normalized_surface_key


class DeterministicOverlapScorer:
    """score_batch over pair rows; loads nothing, but keeps the actor
    shape (state init once, batched __call__)."""

    def __init__(self, config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()

    def _window_a(self, tok_a, pos_a, end_a):
        """Query tokens the scorer reads: ±scorer_context_window around
        the mention span (None → whole sentence) — the stub's analog of
        the reference's context windowing (EmbedWithContext w_size,
        embeddings/base.py:207-352).  Bounded windows keep co-mentioned
        entities' context from leaking into the overlap."""
        w = self.config.scorer_context_window
        if w is None:
            return tok_a
        wb = self.config.scorer_context_back
        return tok_a[max(0, pos_a - wb):end_a + w]

    def _pair_raw_score(self, tok_a, pos_a, end_a,
                        tok_b, pos_b, end_b) -> float:
        span_a = tok_a[pos_a:end_a]
        span_b = tok_b[pos_b:end_b]
        # context overlap: query window tokens ∩ candidate evidence
        # context (evidence tokens outside the entity span)
        ctx_b = set(tok_b[end_b:]) | set(tok_b[:pos_b])
        ov = len(set(self._window_a(tok_a, pos_a, end_a)) & ctx_b)
        key_a = normalized_surface_key(" ".join(span_a))
        key_b = normalized_surface_key(" ".join(span_b))
        surf_sim = 1.0 if key_a and key_a == key_b else 0.0
        return 4.0 * min(ov, 3) - 2.0 + 0.25 * surf_sim

    def score_batch(self, tok_a, pos_a, end_a, tok_b, pos_b, end_b):
        raw = np.array([
            self._pair_raw_score(a, p, e, b, p2, e2)
            for a, p, e, b, p2, e2 in
            zip(tok_a, pos_a, end_a, tok_b, pos_b, end_b)
        ], dtype=np.float64)
        p1 = 1.0 / (1.0 + np.exp(-raw))
        return 1.0 - p1, p1, raw  # p0, p1, score = log(p1/p0)

    def _score_cached(self, batch: pa.Table) -> np.ndarray:
        """Same scores as :meth:`score_batch`, ~50× faster.

        Token-set intersections become integer bitmask AND + popcount:
        the vocabulary is restricted to tokens appearing in evidence
        *contexts* (only those can contribute to the overlap), each
        evidence context and each mention sentence is projected onto it
        ONCE (pairs fan out of mention × candidate × window, so both
        sides repeat across many rows), and the per-pair cost drops to
        two dict hits + ``(a & b).bit_count()``.
        """
        tok_a = batch["tok_a"].to_pylist()
        pos_a = batch["pos_a"].to_pylist()
        end_a = batch["end_a"].to_pylist()
        tok_b = batch["tok_b"].to_pylist()
        pos_b = batch["pos_b"].to_pylist()
        end_b = batch["end_b"].to_pylist()
        urls = batch["url"].to_pylist()
        mids = batch["mention_id"].to_pylist()
        eids = batch["cand_entity"].to_pylist()
        pnos = batch["pair_no"].to_pylist()
        n = len(tok_a)
        vocab: dict[str, int] = {}
        ev_mask: dict = {}
        ev_key: dict = {}
        for i in range(n):
            kb = (eids[i], pnos[i])
            if kb not in ev_mask:
                tb = tok_b[i]
                ctx = set(tb[end_b[i]:])
                ctx.update(tb[:pos_b[i]])
                m = 0
                for t in ctx:
                    bit = vocab.setdefault(t, len(vocab))
                    m |= 1 << bit
                ev_mask[kb] = m
                ev_key[kb] = normalized_surface_key(
                    " ".join(tb[pos_b[i]:end_b[i]]))
        a_mask: dict = {}
        a_key: dict = {}
        raw = np.empty(n, dtype=np.float64)
        for i in range(n):
            ka = (urls[i], mids[i])
            am = a_mask.get(ka)
            if am is None:
                full = tok_a[i]
                ta = self._window_a(full, pos_a[i], end_a[i])
                am = 0
                for t in set(ta):
                    bit = vocab.get(t)
                    if bit is not None:
                        am |= 1 << bit
                a_mask[ka] = am
                a_key[ka] = normalized_surface_key(
                    " ".join(full[pos_a[i]:end_a[i]]))
            kb = (eids[i], pnos[i])
            ov = (am & ev_mask[kb]).bit_count()
            key_a = a_key[ka]
            surf_sim = 1.0 if key_a and key_a == ev_key[kb] else 0.0
            raw[i] = 4.0 * min(ov, 3) - 2.0 + 0.25 * surf_sim
        return raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        cacheable = all(c in batch.column_names
                        for c in ("url", "mention_id", "cand_entity",
                                  "pair_no"))
        if cacheable:
            score = self._score_cached(batch)
            p1 = 1.0 / (1.0 + np.exp(-score))
            p0 = 1.0 - p1
        else:
            p0, p1, score = self.score_batch(
                batch["tok_a"].to_pylist(), batch["pos_a"].to_pylist(),
                batch["end_a"].to_pylist(), batch["tok_b"].to_pylist(),
                batch["pos_b"].to_pylist(), batch["end_b"].to_pylist())
        batch = batch.append_column("p0", pa.array(p0, pa.float64()))
        batch = batch.append_column("p1", pa.array(p1, pa.float64()))
        batch = batch.append_column("score", pa.array(score, pa.float64()))
        # token payloads are no longer needed downstream — drop them BEFORE
        # the decider shuffle so the groupby moves narrow rows only
        return batch.drop_columns(["tok_a", "tok_b", "pos_a", "end_a",
                                   "pos_b", "end_b"])


# per-worker-process scorer cache for task-pool execution (same
# pattern as stages/fused._WORKER_CACHE: state built once per worker,
# not once per actor — plain tasks reuse already-warm workers and skip
# the autoscaling actor ramp that dominates short CPU scoring stages)
_TASK_SCORER_CACHE: dict = {}


def score_pairs(pairs_ds, config: PipelineConfig | None = None,
                scorer_cls=DeterministicOverlapScorer, concurrency=None,
                batch_size: int | None = None, as_tasks: bool = False,
                **ray_remote_kwargs):
    """Cross-encoder scoring stage.  ``as_tasks=True`` runs the scorer
    as a TASK pool with a worker-global instance cache instead of an
    actor pool — correct only for CPU scorers whose ``__init__`` takes
    just the config (no GPU slots, no fn_constructor side state); the
    GPU deployment shape (``num_gpus``) always uses actors."""
    cfg = config or PipelineConfig()
    if as_tasks and not ray_remote_kwargs.get("num_gpus"):
        def fn(batch: pa.Table) -> pa.Table:
            key = (scorer_cls, cfg)
            s = _TASK_SCORER_CACHE.get(key)
            if s is None:
                _TASK_SCORER_CACHE.clear()
                s = scorer_cls(cfg)
                _TASK_SCORER_CACHE[key] = s
            return s(batch)
        return pairs_ds.map_batches(
            fn, batch_format="pyarrow",
            batch_size=batch_size or cfg.scorer_batch_size)
    kwargs = dict(ray_remote_kwargs)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pairs_ds.map_batches(
        scorer_cls, fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=batch_size or cfg.scorer_batch_size, **kwargs)
