"""Stage: cross-encoder input-feature conversion.

Reference ``ground_truth/data_processor.py:506-601``
(``convert_examples_to_features``): wordpiece-tokenize both sentences of
a pair, grow a window symmetrically around both entity spans to fill
``max_seq_len``, and emit fixed-length ``input_ids`` / ``input_mask`` /
``segment_ids`` with entity positions marked (``mark_entities`` mode
writes segment id 2 over entity tokens).

Here the windowing is :func:`sbb_ned_ray.stages.pairs.build_pair_window`
(same semantics, unit-tested) and the *vocabulary* is pluggable:

* a LEARNED WordPiece vocab (:mod:`sbb_ned_ray.functions.wordpiece`,
  trained from the KB corpus, persisted as a fingerprinted artifact)
  when ``config.extra["wordpiece_vocab_path"]`` points at one — the
  shape the trained cross-encoder consumes;
* else the deterministic hash stub: a BPE-ish regex split (word
  pieces = leading chunk + ``##`` continuations of length 4) hashed
  into a fixed id space — ids are stable but carry no learned
  structure.

Every downstream shape (fixed_size_list<int32, max_seq_len> columns,
batch sizing, GPU-actor consumption) is identical between the two.
CLS/SEP/PAD use reserved ids 101/102/0 as in BERT convention.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.hashing import stable_hash64
from sbb_ned_ray.stages.pairs import build_pair_window

CLS_ID, SEP_ID, PAD_ID = 101, 102, 0
VOCAB_SIZE = 30_000
_PIECE = re.compile(r"\w{1,4}|[^\w\s]")


_TOKEN_CACHE: dict[str, list[tuple[str, int]]] = {}


def wordpiece_stub(token: str) -> list[tuple[str, int]]:
    """Deterministic subword split + id: pieces of ≤4 chars, first piece
    bare, continuations prefixed ``##`` (WordPiece convention); ids are
    a stable hash into [1000, VOCAB_SIZE) so they never collide with the
    reserved CLS/SEP/PAD ids.  Memoized per worker process (the token
    vocabulary is tiny relative to the pair volume)."""
    out = _TOKEN_CACHE.get(token)
    if out is None:
        pieces = _PIECE.findall(token)
        out = []
        for i, p in enumerate(pieces):
            text = p if i == 0 else f"##{p}"
            pid = 1000 + stable_hash64(text) % (VOCAB_SIZE - 1000)
            out.append((text, int(pid)))
        out = out or [("[UNK]", 999)]
        if len(_TOKEN_CACHE) > 500_000:
            _TOKEN_CACHE.clear()
        _TOKEN_CACHE[token] = out
    return out


class FeatureConverter:
    """pairs batch → fixed-length BERT-style feature columns.

    ``vocab``: an explicit :class:`~sbb_ned_ray.functions.wordpiece.
    WordPieceVocab`; defaults to the artifact named by
    ``config.extra["wordpiece_vocab_path"]`` (loaded once per worker
    process), else the hash stub."""

    def __init__(self, config: PipelineConfig | None = None,
                 mark_entities: bool = True, vocab=None):
        self.cfg = config or PipelineConfig()
        self.mark_entities = mark_entities
        if vocab is None:
            path = (self.cfg.extra or {}).get("wordpiece_vocab_path")
            if path:
                from sbb_ned_ray.functions.wordpiece import load_vocab_cached
                vocab = load_vocab_cached(path)
        self._encode = vocab.encode_token if vocab is not None \
            else wordpiece_stub
        self.vocab = vocab

    def _convert(self, tok_a, pos_a, end_a, tok_b, pos_b, end_b):
        L = self.cfg.max_seq_len
        # query-side context bound (EmbedWithContext w_size analog,
        # embeddings/base.py:207-352): multi-mention sentences leak
        # co-mentioned entities' context into the window otherwise —
        # the same bound the overlap scorer applies
        w = self.cfg.scorer_context_window
        if w is not None:
            wb = self.cfg.scorer_context_back
            lo = max(0, pos_a - wb)
            tok_a = tok_a[lo:end_a + w]
            pos_a, end_a = pos_a - lo, end_a - lo
        win_a, na, ea, win_b, nb, eb, marks = build_pair_window(
            tok_a, pos_a, end_a, tok_b, pos_b, end_b, max_seq_len=L)
        ids = [CLS_ID]
        segs = [0]
        # wordpiece expansion inherits its word's segment mark
        for i, t in enumerate(win_a):
            seg = 2 if (self.mark_entities and na <= i < ea) else 0
            for _, pid in self._encode(t):
                ids.append(pid)
                segs.append(seg)
        ids.append(SEP_ID)
        segs.append(0)
        for i, t in enumerate(win_b):
            seg = 2 if (self.mark_entities and nb <= i < eb) else 1
            for _, pid in self._encode(t):
                ids.append(pid)
                segs.append(seg)
        ids.append(SEP_ID)
        segs.append(1)
        ids = ids[:L]
        segs = segs[:L]
        mask = [1] * len(ids)
        pad = L - len(ids)
        if pad:
            ids.extend([PAD_ID] * pad)
            segs.extend([0] * pad)
            mask.extend([0] * pad)
        return ids, mask, segs

    def __call__(self, batch: pa.Table) -> pa.Table:
        L = self.cfg.max_seq_len
        n = batch.num_rows
        cols = {name: batch[name].to_pylist()
                for name in ("tok_a", "pos_a", "end_a",
                             "tok_b", "pos_b", "end_b")}
        ids = np.empty((n, L), dtype=np.int32)
        mask = np.empty((n, L), dtype=np.int32)
        segs = np.empty((n, L), dtype=np.int32)
        for i in range(n):
            a, m, s = self._convert(
                cols["tok_a"][i], cols["pos_a"][i], cols["end_a"][i],
                cols["tok_b"][i], cols["pos_b"][i], cols["end_b"][i])
            ids[i], mask[i], segs[i] = a, m, s
        keep = batch.drop_columns(
            [c for c in ("tok_a", "pos_a", "end_a", "tok_b", "pos_b",
                         "end_b") if c in batch.column_names])
        fsl = pa.list_(pa.int32(), L)
        keep = keep.append_column(
            "input_ids", pa.FixedSizeListArray.from_arrays(
                pa.array(ids.ravel(), pa.int32()), L).cast(fsl))
        keep = keep.append_column(
            "input_mask", pa.FixedSizeListArray.from_arrays(
                pa.array(mask.ravel(), pa.int32()), L).cast(fsl))
        keep = keep.append_column(
            "segment_ids", pa.FixedSizeListArray.from_arrays(
                pa.array(segs.ravel(), pa.int32()), L).cast(fsl))
        return keep


def convert_pairs_to_features(pairs_ds, config: PipelineConfig | None = None,
                              batch_size: int = 1024, **kwargs):
    """pairs Dataset → features Dataset (CPU tokenizer stage; in a GPU
    deployment this fuses into the scorer actor's preprocessing)."""
    return pairs_ds.map_batches(
        FeatureConverter, fn_constructor_args=(config,),
        batch_format="pyarrow", batch_size=batch_size, **kwargs)
