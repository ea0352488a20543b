"""Fused NED worker: extract → detect → candidates → pair-score →
partial-aggregate, in ONE actor pool.

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

:class:`FusedPairScorer` additionally fuses pair *building* with pair
*scoring*: instead of materializing one row per (mention, candidate,
evidence-window) with full token lists (~5× the candidate count, fat
``list<string>`` columns) only to aggregate them straight back down,
it walks the candidate rows once and emits the per-(mention, candidate)
partials directly.  Token-set overlaps are integer bitmask AND +
popcount over an actor-persistent evidence vocabulary (bits are only
ever appended, so cached evidence masks stay valid across batches).
Equality with the staged pairs→scorer→aggregate path is asserted in
tests/test_ned_stages.py.

The individual stage classes stay importable/testable on their own;
a GPU deployment splits the scorer back out by passing
``split_scorer=True`` to the pipeline builder so the cross-encoder
pool can get ``num_gpus``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.normalization import normalized_surface_key
from sbb_ned_ray.stages.candidates import CandidateGenerator
from sbb_ned_ray.stages.extract import extract_text_batch
from sbb_ned_ray.stages.mentions import MentionDetector
from sbb_ned_ray.stages.pairs import evidence_sentences, locate_entity
from sbb_ned_ray.state.alias_index import normalize_token

# byte-wise popcount lookup for uint64-word bitmask overlaps
_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)

PARTIAL_SCHEMA = pa.schema([
    ("mention_key", pa.string()),
    ("candidate_title", pa.string()),
    ("url", pa.string()),
    ("mention_id", pa.string()),
    ("surface", pa.string()),
    ("qid", pa.string()),
    ("rank", pa.int32()),
    ("proba", pa.float64()),
    ("p1_max", pa.float64()),
    ("score_sum", pa.float64()),
    ("n_pairs", pa.int64()),
])


class FusedPairScorer:
    """candidates batch → per-(mention, candidate) scored partials.

    Reproduces exactly: pair budget (``sentence_lookup.py:25-31``
    semantics via :func:`evidence_sentences` + ``limit``), the
    :class:`DeterministicOverlapScorer` formula per pair, and the
    ``partial_candidate_agg`` aggregate (p1_max / score_sum / n_pairs).
    """

    def __init__(self, index, config: PipelineConfig | None = None):
        import ray
        self.index = (ray.get(index)
                      if isinstance(index, ray.ObjectRef) else index)
        self.config = config or PipelineConfig()
        use_found = math.ceil(math.sqrt(self.config.max_pairs))
        self.limit = max(1, self.config.max_pairs // use_found)
        self.vocab: dict[str, int] = {}
        # eid -> [(ctx_bitmask, span_key), ...] per evidence window
        self._ev_cache: dict[int, list[tuple[int, str]]] = {}
        self._surf_toks: dict[str, list[str]] = {}
        # compact per-entity evidence (indexed fast path)
        self._tok_id: dict[str, int] = {}
        self._ev_small_cache: dict[int, tuple] = {}
        self._ev_np_cache: dict[int, tuple] = {}

    def _evidence_masks(self, eid: int) -> list[tuple[int, str]]:
        ev = self._ev_cache.get(eid)
        if ev is None:
            ev = []
            for tok_b, pos_b, end_b in \
                    evidence_sentences(self.index, eid)[:self.limit]:
                ctx = set(tok_b[end_b:])
                ctx.update(tok_b[:pos_b])
                m = 0
                for t in ctx:
                    m |= 1 << self.vocab.setdefault(t, len(self.vocab))
                ev.append((m, normalized_surface_key(
                    " ".join(tok_b[pos_b:end_b]))))
            self._ev_cache[eid] = ev
        return ev

    def _locate(self, ta: list[str], surface: str) -> tuple[int, int]:
        st = self._surf_toks.get(surface)
        if st is None:
            st = [t for t in (normalize_token(x)
                              for x in surface.split(" ")) if t]
            self._surf_toks[surface] = st
        return locate_entity(ta, st)

    def _window_a(self, ta: list[str], pos_a: int, end_a: int) -> list[str]:
        w = self.config.scorer_context_window
        if w is None:
            return ta
        wb = self.config.scorer_context_back
        return ta[max(0, pos_a - wb):end_a + w]

    def _mention_entry(self, ta: list[str], surface: str,
                       span: tuple[int, int] | None = None
                       ) -> tuple[int, str]:
        """(bitmask over evidence vocab, normalized span key) for one
        mention sentence.  Call only AFTER all evidence vocab of the
        batch is interned.  ``span`` pins the occurrence (repeated
        surfaces in one sentence); absent → locate by content."""
        pos_a, end_a = span if span is not None \
            else self._locate(ta, surface)
        m = 0
        vocab_get = self.vocab.get
        for t in set(self._window_a(ta, pos_a, end_a)):
            bit = vocab_get(t)
            if bit is not None:
                m |= 1 << bit
        return (m, normalized_surface_key(" ".join(ta[pos_a:end_a])))

    def __call__(self, cands: pa.Table,
                 mentions: pa.Table | None = None) -> pa.Table:
        n = cands.num_rows
        if n == 0:
            return empty_partials()
        if mentions is not None and "mention_row" in cands.column_names:
            out = self._call_indexed(cands, mentions)
        else:
            out = self._call_generic(cands, mentions)
        # the local prune ranks by p1_max — exact only while the decide
        # uses the same key, so it is bypassed when a decider model will
        # re-rank downstream
        if self.config.emit_top_k is not None \
                and not self.config.decider_model_path:
            out = self._prune_top_k(out, self.config.emit_top_k)
        return out

    def _evidence_small(self, eid: int):
        """Per-entity compact evidence: the union of its windows' context
        tokens gets ≤~12 LOCAL bit positions; each window is a small int
        mask over them.  Per (mention, entity) the matched-context bits
        are computed once (≤12 membership tests), then each window's
        overlap is one tiny-int AND+popcount — unlike the global-vocab
        masks whose AND cost grows with every entity seen."""
        ev = self._ev_small_cache.get(eid)
        if ev is None:
            tok_id = self._tok_id
            tid_bit: dict[int, int] = {}
            win_masks: list[int] = []
            key_b = ""
            for tok_b, pos_b, end_b in \
                    evidence_sentences(self.index, eid)[:self.limit]:
                m = 0
                for t in tok_b[end_b:]:
                    tid = tok_id.setdefault(t, len(tok_id))
                    m |= 1 << tid_bit.setdefault(tid, len(tid_bit))
                for t in tok_b[:pos_b]:
                    tid = tok_id.setdefault(t, len(tok_id))
                    m |= 1 << tid_bit.setdefault(tid, len(tid_bit))
                win_masks.append(m)
                key_b = normalized_surface_key(" ".join(tok_b[pos_b:end_b]))
            ev = (tuple(tid_bit.items()), tuple(win_masks), key_b)
            self._ev_small_cache[eid] = ev
        return ev

    def _ev_np(self, eid: int):
        """Numpy view of :meth:`_evidence_small` for the vectorized
        scorer: (ctx tids, ctx bit positions, window masks as uint64
        WORDS (n_win × n_words — local bit counts can exceed 64),
        span key, n_words).  Cached per entity."""
        ev = self._ev_np_cache.get(eid)
        if ev is None:
            ctx_bits, win_masks, key_b = self._evidence_small(eid)
            c = len(ctx_bits)
            tids = np.fromiter((t for t, _ in ctx_bits), np.int64, c)
            bits = np.fromiter((b for _, b in ctx_bits), np.int64, c)
            nwords = (int(bits.max()) // 64 + 1) if c else 1
            wm = np.zeros((len(win_masks), nwords), np.uint64)
            for j, m in enumerate(win_masks):
                for w in range(nwords):
                    wm[j, w] = (m >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
            ev = (tids, bits, wm, key_b, nwords)
            self._ev_np_cache[eid] = ev
        return ev

    def _call_indexed(self, cands: pa.Table, mentions: pa.Table) -> pa.Table:
        """Fast path: candidate rows carry ``mention_row`` (index into
        the mentions batch) and arrive grouped per mention.  Scoring is
        fully vectorized over the batch: per-entity evidence pools are
        gathered into flat arrays, mention-token membership is one
        searchsorted over (run, tid) keys, matched masks scatter-OR into
        a (rows × words) uint64 matrix, window overlaps are one AND +
        popcount-LUT pass, and per-row max/sum use ``ufunc.reduceat``.
        Bit-exact with :meth:`_call_indexed_ref` (asserted in
        tests/test_ned_stages.py)."""
        n = cands.num_rows
        eids = cands["cand_entity"].to_numpy(zero_copy_only=False)
        mrow = cands["mention_row"].to_numpy(zero_copy_only=False)
        uniq, eid_inv = np.unique(eids, return_inverse=True)
        pool = [self._ev_np(int(e)) for e in uniq]
        m_urls = mentions["url"].to_pylist()
        m_mids = mentions["mention_id"].to_pylist()
        m_surfs = mentions["surface"].to_pylist()
        m_toks = mentions["sent_tokens"].to_pylist()
        m_has_spans = "span_start" in mentions.column_names
        if m_has_spans:
            m_sp0 = mentions["span_start"].to_pylist()
            m_sp1 = mentions["span_end"].to_pylist()
        tok_id_get = self._tok_id.get
        m_entry: dict[int, tuple[np.ndarray, str]] = {}
        # contiguous runs of one mention
        bounds = np.flatnonzero(np.diff(mrow)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        run_lens = ends - starts
        n_runs = len(starts)
        key_per_run = []
        key_a_run = np.empty(n_runs, dtype=object)
        mk_parts = []                       # (run << 32 | tid) per run
        for r_no, a in enumerate(starts):
            r = int(mrow[a])
            ent = m_entry.get(r)
            if ent is None:
                ta = m_toks[r]
                pos_a, end_a = (m_sp0[r], m_sp1[r]) if m_has_spans \
                    else self._locate(ta, m_surfs[r])
                ids = set()
                for t in set(self._window_a(ta, pos_a, end_a)):
                    tid = tok_id_get(t)
                    if tid is not None:
                        ids.add(tid)
                ent = (np.fromiter(ids, np.int64, len(ids)),
                       normalized_surface_key(" ".join(ta[pos_a:end_a])))
                m_entry[r] = ent
            tids_r, key_a = ent
            key_a_run[r_no] = key_a
            if len(tids_r):
                mk_parts.append((np.int64(r_no) << np.int64(32)) | tids_r)
            key_per_run.append(f"{m_urls[r]}\x1f{m_mids[r]}")
        mk = np.sort(np.concatenate(mk_parts)) if mk_parts \
            else np.zeros(0, np.int64)
        run_of_row = np.repeat(np.arange(n_runs, dtype=np.int64), run_lens)
        raw_max, raw_sum, n_pairs = self._score_rows(
            eid_inv, pool, run_of_row, mk, key_a_run, n)
        keys = pa.array(np.repeat(np.array(key_per_run, dtype=object),
                                  run_lens), pa.string())
        p1_max = 1.0 / (1.0 + np.exp(-raw_max))
        return pa.table({
            "mention_key": keys,
            "candidate_title": cands["candidate_title"].combine_chunks(),
            "url": cands["url"].combine_chunks(),
            "mention_id": cands["mention_id"].combine_chunks(),
            "surface": cands["surface"].combine_chunks(),
            "qid": cands["qid"].combine_chunks(),
            "rank": cands["rank"].combine_chunks(),
            "proba": cands["proba"].combine_chunks(),
            "p1_max": pa.array(p1_max, pa.float64()),
            "score_sum": pa.array(raw_sum, pa.float64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
        }).cast(PARTIAL_SCHEMA)

    def _mention_tids(self, ta: list[str], surface: str,
                      span: tuple[int, int] | None
                      ) -> tuple[np.ndarray, str]:
        """(mention window token-ids as int64 array, normalized span
        key) against the compact evidence vocabulary ``_tok_id`` —
        call only AFTER the batch's entities are interned."""
        pos_a, end_a = span if span is not None \
            else self._locate(ta, surface)
        ids = set()
        get = self._tok_id.get
        for t in set(self._window_a(ta, pos_a, end_a)):
            tid = get(t)
            if tid is not None:
                ids.add(tid)
        return (np.fromiter(ids, np.int64, len(ids)),
                normalized_surface_key(" ".join(ta[pos_a:end_a])))

    def _score_rows(self, eid_inv: np.ndarray, pool: list,
                    run_of_row: np.ndarray, mk: np.ndarray,
                    key_a_run: np.ndarray, n: int):
        """Vectorized core shared by the indexed and generic paths:
        given per-row entity pool indices, per-row run (mention) ids,
        the sorted (run≪32|tid) mention-token key set and per-run span
        keys, produce (raw_max, raw_sum, n_pairs) for all rows in one
        numpy pass (see :meth:`_call_indexed` docstring)."""
        # --- entity pools → flat batch arrays -------------------------
        nw = max(p[4] for p in pool)
        ctx_lens = np.fromiter((len(p[0]) for p in pool), np.int64,
                               len(pool))
        ctx_off = np.concatenate(([0], np.cumsum(ctx_lens)))
        ct = (np.concatenate([p[0] for p in pool]) if ctx_off[-1]
              else np.zeros(0, np.int64))
        cb = (np.concatenate([p[1] for p in pool]) if ctx_off[-1]
              else np.zeros(0, np.int64))
        win_lens = np.fromiter((p[2].shape[0] for p in pool), np.int64,
                               len(pool))
        win_off = np.concatenate(([0], np.cumsum(win_lens)))
        ew = np.zeros((int(win_off[-1]), nw), np.uint64)
        for k, p in enumerate(pool):
            ew[win_off[k]:win_off[k + 1], :p[4]] = p[2]
        key_b_pool = np.array([p[3] for p in pool], dtype=object)

        # --- matched-context masks: membership + scatter-OR -----------
        def _flat_gather(off_starts, lens):
            """Per-row gather indices into an entity pool array:
            ``off_starts[k]``/``lens[k]`` delimit entity k's pool rows."""
            row_len = lens[eid_inv]
            tot = int(row_len.sum())
            seg0 = np.concatenate(([0], np.cumsum(row_len)))[:-1]
            within = np.arange(tot, dtype=np.int64) \
                - np.repeat(seg0, row_len)
            return (np.repeat(off_starts[eid_inv], row_len) + within,
                    row_len, seg0)

        gi, row_ctx_len, _ = _flat_gather(ctx_off[:-1], ctx_lens)
        row_flat = np.repeat(np.arange(n, dtype=np.int64), row_ctx_len)
        keys_flat = (run_of_row[row_flat] << np.int64(32)) | ct[gi]
        if len(mk):
            ss = np.searchsorted(mk, keys_flat)
            ssc = np.minimum(ss, len(mk) - 1)
            member = mk[ssc] == keys_flat
        else:
            member = np.zeros(len(keys_flat), bool)
        matched = np.zeros((n, nw), np.uint64)
        if member.any():
            bsel = cb[gi[member]]
            np.bitwise_or.at(
                matched,
                (row_flat[member], bsel >> 6),
                np.left_shift(np.uint64(1), (bsel & 63).astype(np.uint64)))

        # --- window scoring: AND + popcount LUT + reduceat -------------
        wgi, row_win_len, seg0w = _flat_gather(win_off[:-1], win_lens)
        tot_win = len(wgi)
        key_match = (key_a_run[run_of_row] == key_b_pool[eid_inv]) \
            & (key_a_run[run_of_row] != "")
        base = -2.0 + 0.25 * key_match.astype(np.float64)
        raw_max = np.full(n, -np.inf)
        raw_sum = np.zeros(n)
        if tot_win:
            anded = ew[wgi] & matched[np.repeat(
                np.arange(n, dtype=np.int64), row_win_len)]
            cnt = _POPCNT8[anded.view(np.uint8)].sum(axis=1,
                                                     dtype=np.int64)
            s = 4.0 * np.minimum(cnt, 3) \
                + np.repeat(base, row_win_len)
            nonempty = row_win_len > 0
            offs = seg0w[nonempty]
            # empty rows occupy zero width, so consecutive non-empty
            # offsets delimit exactly one row's windows
            raw_max[nonempty] = np.maximum.reduceat(s, offs)
            raw_sum[nonempty] = np.add.reduceat(s, offs)
        return raw_max, raw_sum, row_win_len

    def _call_indexed_ref(self, cands: pa.Table,
                          mentions: pa.Table) -> pa.Table:
        """Reference (row-loop) implementation of the indexed scorer,
        kept for the bit-exactness test of the vectorized
        :meth:`_call_indexed`.  Semantics: candidate rows carry ``mention_row`` (index into
        the mentions batch) and arrive grouped per mention — string
        columns pass through as Arrow, mention state is computed once
        per mention, and per-window scoring uses compact per-entity
        bitmasks (:meth:`_evidence_small`)."""
        n = cands.num_rows
        eids = cands["cand_entity"].to_numpy(zero_copy_only=False)
        mrow = cands["mention_row"].to_numpy(zero_copy_only=False)
        ev_of = {int(e): self._evidence_small(int(e))
                 for e in np.unique(eids)}
        m_urls = mentions["url"].to_pylist()
        m_mids = mentions["mention_id"].to_pylist()
        m_surfs = mentions["surface"].to_pylist()
        m_toks = mentions["sent_tokens"].to_pylist()
        m_has_spans = "span_start" in mentions.column_names
        if m_has_spans:
            m_sp0 = mentions["span_start"].to_pylist()
            m_sp1 = mentions["span_end"].to_pylist()
        tok_id_get = self._tok_id.get
        m_entry: dict[int, tuple[set, str]] = {}
        raw_max = np.empty(n, dtype=np.float64)
        raw_sum = np.empty(n, dtype=np.float64)
        n_pairs = np.empty(n, dtype=np.int64)
        # contiguous runs of one mention
        bounds = np.flatnonzero(np.diff(mrow)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n]))
        key_per_run = []
        for a, b in zip(starts, ends):
            r = int(mrow[a])
            ent = m_entry.get(r)
            if ent is None:
                ta = m_toks[r]
                pos_a, end_a = (m_sp0[r], m_sp1[r]) if m_has_spans \
                    else self._locate(ta, m_surfs[r])
                ids = set()
                for t in set(self._window_a(ta, pos_a, end_a)):
                    tid = tok_id_get(t)
                    if tid is not None:
                        ids.add(tid)
                ent = (ids, normalized_surface_key(
                    " ".join(ta[pos_a:end_a])))
                m_entry[r] = ent
            mention_ids, key_a = ent
            key_per_run.append(f"{m_urls[r]}\x1f{m_mids[r]}")
            for i in range(a, b):
                ctx_bits, win_masks, key_b = ev_of[int(eids[i])]
                matched = 0
                for tid, bit in ctx_bits:
                    if tid in mention_ids:
                        matched |= 1 << bit
                base = -2.0 + (0.25 if key_a and key_a == key_b else 0.0)
                best = -np.inf
                tot = 0.0
                for wm in win_masks:
                    s = 4.0 * min((matched & wm).bit_count(), 3) + base
                    if s > best:
                        best = s
                    tot += s
                raw_max[i] = best
                raw_sum[i] = tot
                n_pairs[i] = len(win_masks)
        run_lens = ends - starts
        keys = pa.array(np.repeat(np.array(key_per_run, dtype=object),
                                  run_lens), pa.string())
        p1_max = 1.0 / (1.0 + np.exp(-raw_max))
        return pa.table({
            "mention_key": keys,
            "candidate_title": cands["candidate_title"].combine_chunks(),
            "url": cands["url"].combine_chunks(),
            "mention_id": cands["mention_id"].combine_chunks(),
            "surface": cands["surface"].combine_chunks(),
            "qid": cands["qid"].combine_chunks(),
            "rank": cands["rank"].combine_chunks(),
            "proba": cands["proba"].combine_chunks(),
            "p1_max": pa.array(p1_max, pa.float64()),
            "score_sum": pa.array(raw_sum, pa.float64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
        }).cast(PARTIAL_SCHEMA)

    def _call_generic(self, cands: pa.Table,
                      mentions: pa.Table | None) -> pa.Table:
        """Generic path (shuffle-KB joins: rows NOT grouped per mention,
        no ``mention_row`` column) — same vectorized core as
        :meth:`_call_indexed`, with runs recovered by factorizing
        (url, mention_id).  Bit-exact with :meth:`_call_generic_ref`
        up to the evidence-vocabulary scheme (both compute the same
        window-overlap counts; asserted in tests/test_ned_stages.py)."""
        import pandas as pd
        n = cands.num_rows
        eids = cands["cand_entity"].to_numpy(zero_copy_only=False)
        uniq, eid_inv = np.unique(eids, return_inverse=True)
        # pass 1: intern the batch's evidence vocabulary
        pool = [self._ev_np(int(e)) for e in uniq]
        urls = cands["url"].to_pylist()
        mids = cands["mention_id"].to_pylist()
        row_keys = np.array([f"{u}\x1f{m}" for u, m in zip(urls, mids)],
                            dtype=object)
        run_of_row, uniq_keys = pd.factorize(row_keys)
        run_of_row = run_of_row.astype(np.int64)
        n_runs = len(uniq_keys)
        first_rows = np.zeros(n_runs, np.int64)
        # factorize codes are first-occurrence ordered; recover one
        # representative row per run
        seen_order = np.unique(run_of_row, return_index=True)[1]
        first_rows[np.unique(run_of_row)] = seen_order
        # mention tokens: from the mentions side table when given, else
        # from the candidates' token columns (possibly \x00-packed —
        # pyarrow hash joins reject list payloads)
        if mentions is not None:
            m_entry: dict = {}
            m_spans = ("span_start" in mentions.column_names)
            m_sp = (list(zip(mentions["span_start"].to_pylist(),
                             mentions["span_end"].to_pylist()))
                    if m_spans else None)
            for r_no, (u, mid, surf, ta) in enumerate(zip(
                    mentions["url"].to_pylist(),
                    mentions["mention_id"].to_pylist(),
                    mentions["surface"].to_pylist(),
                    mentions["sent_tokens"].to_pylist())):
                m_entry[f"{u}\x1f{mid}"] = self._mention_tids(
                    ta, surf, m_sp[r_no] if m_sp else None)

            def run_entry(r_no: int):
                return m_entry[uniq_keys[r_no]]
        else:
            surfs = cands["surface"].to_pylist()
            if "sent_tokens" in cands.column_names:
                _toks = cands["sent_tokens"].to_pylist()

                def get_toks(i: int) -> list[str]:
                    return _toks[i]
            else:
                _enc = cands["sent_tokens_enc"].to_pylist()

                def get_toks(i: int) -> list[str]:
                    return _enc[i].split("\x00")
            c_spans = ("span_start" in cands.column_names)
            c_sp = (list(zip(cands["span_start"].to_pylist(),
                             cands["span_end"].to_pylist()))
                    if c_spans else None)

            def run_entry(r_no: int):
                i = int(first_rows[r_no])
                return self._mention_tids(
                    get_toks(i), surfs[i], c_sp[i] if c_sp else None)

        key_a_run = np.empty(n_runs, dtype=object)
        mk_parts = []
        for r_no in range(n_runs):
            tids_r, key_a = run_entry(r_no)
            key_a_run[r_no] = key_a
            if len(tids_r):
                mk_parts.append((np.int64(r_no) << np.int64(32)) | tids_r)
        mk = np.sort(np.concatenate(mk_parts)) if mk_parts \
            else np.zeros(0, np.int64)
        raw_max, raw_sum, n_pairs = self._score_rows(
            eid_inv, pool, run_of_row, mk, key_a_run, n)
        p1_max = 1.0 / (1.0 + np.exp(-raw_max))
        return pa.table({
            "mention_key": pa.array(row_keys, pa.string()),
            "candidate_title": cands["candidate_title"].combine_chunks(),
            "url": cands["url"].combine_chunks(),
            "mention_id": cands["mention_id"].combine_chunks(),
            "surface": cands["surface"].combine_chunks(),
            "qid": cands["qid"].combine_chunks(),
            "rank": cands["rank"].combine_chunks(),
            "proba": cands["proba"].combine_chunks(),
            "p1_max": pa.array(p1_max, pa.float64()),
            "score_sum": pa.array(raw_sum, pa.float64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
        }).cast(PARTIAL_SCHEMA)

    def _call_generic_ref(self, cands: pa.Table,
                          mentions: pa.Table | None) -> pa.Table:
        """Reference (row-loop) generic scorer, kept for the equality
        test of the vectorized :meth:`_call_generic`."""
        n = cands.num_rows
        names = ("url", "mention_id", "surface", "cand_entity",
                 "candidate_title", "qid", "rank", "proba")
        col = {name: cands[name].to_pylist() for name in names}
        eids = col["cand_entity"]
        # pass 1: intern all evidence vocab BEFORE any mention mask is
        # built (vocab bits only append, so evidence masks cached from
        # earlier batches stay correct)
        ev_rows = [self._evidence_masks(int(e)) for e in eids]
        # pass 2: one mask per MENTION (not per candidate row) — read
        # tokens from the mentions table when given, else from the
        # candidates' sent_tokens column
        a_mask: dict = {}
        if mentions is not None:
            m_spans = ("span_start" in mentions.column_names)
            m_sp = (list(zip(mentions["span_start"].to_pylist(),
                             mentions["span_end"].to_pylist()))
                    if m_spans else None)
            for r_no, (u, mid, surf, ta) in enumerate(zip(
                    mentions["url"].to_pylist(),
                    mentions["mention_id"].to_pylist(),
                    mentions["surface"].to_pylist(),
                    mentions["sent_tokens"].to_pylist())):
                a_mask[(u, mid)] = self._mention_entry(
                    ta, surf, span=m_sp[r_no] if m_sp else None)
        else:
            if "sent_tokens" in cands.column_names:
                _toks = cands["sent_tokens"].to_pylist()

                def get_toks(i: int) -> list[str]:
                    return _toks[i]
            else:
                # joined rows carry \x00-packed tokens (pyarrow hash
                # joins reject list payloads); split lazily — only once
                # per MENTION, in the cache-miss branch below
                _enc = cands["sent_tokens_enc"].to_pylist()

                def get_toks(i: int) -> list[str]:
                    return _enc[i].split("\x00")
            c_spans = ("span_start" in cands.column_names)
            c_sp = (list(zip(cands["span_start"].to_pylist(),
                             cands["span_end"].to_pylist()))
                    if c_spans else None)
        raw_max = np.empty(n, dtype=np.float64)
        raw_sum = np.empty(n, dtype=np.float64)
        n_pairs = np.empty(n, dtype=np.int64)
        keys = []
        for i in range(n):
            ka = (col["url"][i], col["mention_id"][i])
            ent = a_mask.get(ka)
            if ent is None:
                ent = self._mention_entry(
                    get_toks(i), col["surface"][i],
                    span=c_sp[i] if c_sp else None)
                a_mask[ka] = ent
            am, key_a = ent
            best = -np.inf
            tot = 0.0
            ev = ev_rows[i]
            for m_b, key_b in ev:
                r = 4.0 * min((am & m_b).bit_count(), 3) - 2.0 \
                    + (0.25 if key_a and key_a == key_b else 0.0)
                if r > best:
                    best = r
                tot += r
            raw_max[i] = best
            raw_sum[i] = tot
            n_pairs[i] = len(ev)
            keys.append(f"{ka[0]}\x1f{ka[1]}")
        p1_max = 1.0 / (1.0 + np.exp(-raw_max))
        return pa.table({
            "mention_key": pa.array(keys, pa.string()),
            "candidate_title": pa.array(col["candidate_title"], pa.string()),
            "url": pa.array(col["url"], pa.string()),
            "mention_id": pa.array(col["mention_id"], pa.string()),
            "surface": pa.array(col["surface"], pa.string()),
            "qid": pa.array(col["qid"], pa.string()),
            "rank": pa.array(col["rank"], pa.int32()),
            "proba": pa.array(col["proba"], pa.float64()),
            "p1_max": pa.array(p1_max, pa.float64()),
            "score_sum": pa.array(raw_sum, pa.float64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
        }, schema=PARTIAL_SCHEMA)

    def _prune_top_k(self, partials: pa.Table, k: int) -> pa.Table:
        """Local pre-shuffle pruning (exact for ranks < k).

        A mention's candidates are ALWAYS in one batch (pages are the
        batch unit and mentions are page-local), so applying the decide
        keep-predicate (p1 ≥ threshold OR exact surface==title match)
        and keeping the top-k by the decide sort keys here produces the
        same ranks < k as the global groupby would — while shrinking the
        shuffle from max_candidates× to k× the mention count.
        """
        import pandas as pd

        from sbb_ned_ray.stages.decider import _map_unique

        df = partials.to_pandas()
        surf_keys = _map_unique(df["surface"], normalized_surface_key)
        title_keys = _map_unique(
            df["candidate_title"],
            lambda t: normalized_surface_key(t.replace("_", " ")))
        keep = (df["p1_max"].to_numpy() >= self.config.threshold) \
            | (surf_keys == title_keys)
        df = df.loc[keep]
        df = df.sort_values(
            ["mention_key", "p1_max", "rank", "candidate_title", "qid"],
            ascending=[True, False, True, True, True], kind="mergesort")
        df = df.groupby("mention_key", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(PARTIAL_SCHEMA)


def empty_partials() -> pa.Table:
    return PARTIAL_SCHEMA.empty_table()


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
        self.candidates = CandidateGenerator(index, cfg, include_tokens=False)
        self.pair_scorer = scorer or FusedPairScorer(index, cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.extract:
            batch = extract_text_batch(batch)
        mentions = self.detector(batch)
        if mentions.num_rows == 0:
            return empty_partials()
        cands = self.candidates(mentions)
        return self.pair_scorer(cands, mentions)


# Worker-process-global NedWorker cache for the TASK-pool execution path.
# Ray task workers are long-lived processes; caching the constructed
# worker (broadcast index deserialized, evidence/vocab caches warm) per
# process gives actor-like state reuse WITHOUT an actor pool's startup
# cliff (spawning N actors costs seconds and Ray's autoscaling ramp adds
# multi-× wall-time variance on short jobs; plain tasks reuse already-
# warm workers instantly and scale to every free CPU).
_WORKER_CACHE: dict = {}


def scorer_task_fn(index_ref, config: PipelineConfig):
    """Picklable per-batch pair-scoring fn for ``map_batches`` TASK
    execution (worker-global :class:`FusedPairScorer` cache — same
    rationale as :func:`ned_task_fn`: actor pools pay a startup cliff
    and autoscaling variance that plain tasks don't).  Used by the
    shuffle-KB pipeline, whose candidate rows arrive from a join (no
    ``mentions`` side table → generic scoring path)."""
    import json
    ctx_key = json.dumps(config.context, sort_keys=True, default=str) \
        if config.context else ""

    def fn(batch: pa.Table) -> pa.Table:
        key = ("scorer",
               index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref),
               config, ctx_key)
        s = _WORKER_CACHE.get(key)
        if s is None:
            _WORKER_CACHE.clear()
            s = FusedPairScorer(index_ref, config)
            _WORKER_CACHE[key] = s
        return s(batch)
    return fn


def ned_task_fn(index_ref, config: PipelineConfig,
                decide_local: bool = False):
    """Build a picklable per-batch fn for ``map_batches`` (task pool).

    ``decide_local=True`` additionally runs the per-mention decision
    INSIDE the task and emits final ranked links, eliminating the
    ``groupby(mention_key)`` shuffle entirely.  This is exact — not an
    approximation — because a mention's candidate partials always come
    from the single batch holding its page (mentions are page-local and
    ``map_batches`` never splits a row): the cross-batch merge in
    ``_decide_partition`` has nothing to merge.  Ray Data reserves
    executor resources for all-to-all operators, so dropping the
    shuffle also returns those CPUs to the map stage.  Equality with
    the shuffle path is asserted in tests/test_e2e_ray.py.
    """
    # PipelineConfig.context is compare=False/hash=False, so two jobs
    # sharing an index_ref that differ only in per-job context would
    # collide on (index_ref, config) — include a canonical context
    # serialization in the key
    import json
    ctx_key = json.dumps(config.context, sort_keys=True, default=str) \
        if config.context else ""

    def fn(batch: pa.Table) -> pa.Table:
        key = (index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref),
               config, ctx_key)
        w = _WORKER_CACHE.get(key)
        if w is None:
            _WORKER_CACHE.clear()   # one live pipeline config per worker
            w = NedWorker(index_ref, config)
            _WORKER_CACHE[key] = w
        partials = w(batch)
        if not decide_local:
            return partials
        from sbb_ned_ray.stages.decider import (
            LINK_SCHEMA,
            _decide_partition,
            decider_model_kwargs,
        )
        links = _decide_partition(partials.to_pandas(), config.threshold,
                                  **decider_model_kwargs(config))
        return pa.Table.from_pandas(links, preserve_index=False) \
            .cast(LINK_SCHEMA) if len(links) else LINK_SCHEMA.empty_table()
    return fn
