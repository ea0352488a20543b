"""Stage: mention detection.

Two operators, mirroring the reference's two input modes:

* :class:`MentionDetector` — gazetteer NER over extracted page text
  (our stand-in for the upstream NER model the reference assumes):
  longest-match scan of normalized token n-grams against the broadcast
  alias trie.  Stateful (the trie) → actor pool via
  ``map_batches(MentionDetector, concurrency=N)``; the AliasIndex is
  fetched from the object store ONCE per actor in ``__init__``.

* :func:`parse_ner_sentences` — BIO-tag grouping of NER-tagged token
  streams, faithful to the reference's ``parse_sentence``
  (``webapp/app.py:227-286``): invalid tags → ``O``; a mention ends on
  ``O``, on ``B-``, or on a type change; char-normalized token text.
"""

from __future__ import annotations

import pyarrow as pa

from sbb_ned_ray.functions.normalization import (
    normalize_chars,
    normalized_surface_key,
)
from sbb_ned_ray.functions.stemming import stem_word
from sbb_ned_ray.state.alias_index import AliasIndex, normalize_token

VALID_TAGS = {"O", "B-PER", "B-LOC", "B-ORG", "I-PER", "I-LOC", "I-ORG"}

MENTION_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("mention_id", pa.string()),
    ("sent_no", pa.int32()),
    ("tok_start", pa.int32()),
    ("tok_end", pa.int32()),
    # span in sent_tokens space (empty normalized tokens removed) — the
    # OCCURRENCE this mention is, so downstream scoring never has to
    # re-locate the surface (locate-by-content picks the FIRST
    # occurrence and mis-windows repeated surfaces in one sentence)
    ("span_start", pa.int32()),
    ("span_end", pa.int32()),
    ("surface", pa.string()),
    ("type", pa.string()),
    ("block_key", pa.string()),
    ("sent_tokens", pa.list_(pa.string())),
])


class MentionDetector:
    """Gazetteer longest-match mention detector (actor-pool stage)."""

    def __init__(self, index_ref):
        import ray
        self.index: AliasIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef)
            else index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx = self.index
        first = idx.first_tokens
        seqs = idx.token_seqs
        max_len = idx.max_seq_tokens
        cols = {k: [] for k in MENTION_SCHEMA.names}

        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        for url, text in zip(urls, texts):
            for sent_no, line in enumerate(text.split("\n")):
                raw = line.split(" ")
                norm = [normalize_token(t) for t in raw]
                n = len(norm)
                # filtered-space index of each raw position (empty
                # normalized tokens are dropped from sent_tokens)
                fidx = [0] * (n + 1)
                acc = 0
                for k in range(n):
                    fidx[k] = acc
                    if norm[k]:
                        acc += 1
                fidx[n] = acc
                i = 0
                while i < n:
                    if norm[i] not in first:
                        i += 1
                        continue
                    match_len = 0
                    for ln in range(min(max_len, n - i), 0, -1):
                        cand = tuple(t for t in norm[i:i + ln] if t)
                        if cand and cand in seqs:
                            match_len = ln
                            break
                    if match_len == 0:
                        i += 1
                        continue
                    surface = " ".join(raw[i:i + match_len])
                    cand = tuple(t for t in norm[i:i + match_len] if t)
                    cols["url"].append(url)
                    cols["mention_id"].append(f"s{sent_no}t{i}")
                    cols["sent_no"].append(sent_no)
                    cols["tok_start"].append(i)
                    cols["tok_end"].append(i + match_len)
                    cols["span_start"].append(fidx[i])
                    cols["span_end"].append(fidx[i + match_len])
                    cols["surface"].append(surface)
                    cols["type"].append(idx.seq_type[cand])
                    cols["block_key"].append(normalized_surface_key(surface))
                    cols["sent_tokens"].append([t for t in norm if t])
                    i += match_len
        return pa.table(
            {name: pa.array(cols[name], MENTION_SCHEMA.field(name).type)
             for name in MENTION_SCHEMA.names})


# per-worker-process detector cache for task-pool execution (the
# stages/fused._WORKER_CACHE pattern: broadcast index unpickled once
# per worker; plain tasks skip the autoscaling actor ramp)
_TASK_DETECTOR_CACHE: dict = {}


def detect_mentions(pages_ds, index_ref, batch_size: int = 256,
                    concurrency=None, as_tasks: bool = False,
                    **ray_remote_kwargs):
    """Mention-detection stage.  ``as_tasks=True`` runs the detector as
    a TASK pool with a worker-global instance keyed by the broadcast
    index ref — preferred on CPU-only deployments where the stage
    shares the node with concurrent join/aggregate exchanges."""
    if as_tasks:
        def fn(batch: pa.Table) -> pa.Table:
            key = (index_ref.hex()
                   if hasattr(index_ref, "hex") else id(index_ref))
            d = _TASK_DETECTOR_CACHE.get(key)
            if d is None:
                _TASK_DETECTOR_CACHE.clear()
                d = MentionDetector(index_ref)
                _TASK_DETECTOR_CACHE[key] = d
            return d(batch)
        return pages_ds.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size)
    kwargs = dict(ray_remote_kwargs)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return pages_ds.map_batches(
        MentionDetector, fn_constructor_args=(index_ref,),
        batch_format="pyarrow", batch_size=batch_size, **kwargs)


# ---------------------------------------------------------------------------
# BIO parsing of NER-tagged input (reference /parse semantics)
# ---------------------------------------------------------------------------

def parse_ner_sentence(tokens: list[dict], lang: str = "de") -> list[dict]:
    """Group BIO tags into mentions; semantics of webapp/app.py:227-286.

    ``tokens``: [{"word": str, "prediction": str, "gt": str|None}].
    Returns mention dicts with surface, type, tok_start/tok_end,
    normalized words, gt set, and the reference's "<surface>-<TYPE>"
    entity id.
    """
    mentions = []
    cur_parts: list[str] = []
    cur_gt: set[str] = set()
    cur_type: str | None = None
    cur_start = 0

    def flush(end_idx: int):
        nonlocal cur_parts, cur_gt, cur_type
        if cur_parts:
            surface = " ".join(cur_parts)
            mentions.append({
                "surface": surface,
                "type": cur_type,
                "tok_start": cur_start,
                "tok_end": end_idx,
                "entity_id": f"{surface}-{cur_type}",
                "gt": sorted(cur_gt),
                # Snowball in the configured language (reference
                # webapp/app.py:334 SnowballStemmer(STEMMER) — German
                # deployment default, English for en-config)
                "stem_key": " ".join(
                    stem_word(p, lang) for p in
                    normalized_surface_key(surface).split(" ")),
            })
        cur_parts, cur_gt, cur_type = [], set(), None

    for i, tok in enumerate(tokens):
        pred = tok.get("prediction", "O")
        if pred not in VALID_TAGS:
            pred = "O"
        if cur_parts and (pred == "O" or pred.startswith("B-")
                          or pred[2:] != cur_type):
            flush(i)
        if pred != "O":
            if not cur_parts:
                cur_start = i
                cur_type = pred[2:]
            cur_parts.append(normalize_chars(tok["word"]))
            gt = tok.get("gt")
            if gt:
                cur_gt.add(gt)
    flush(len(tokens))
    return mentions


def parse_ner_batch(batch: pa.Table) -> pa.Table:
    """map_batches wrapper: rows (url, sent_no, tokens:list<struct>) →
    mention rows in MENTION_SCHEMA (block_key from the normalized surface)."""
    cols = {k: [] for k in MENTION_SCHEMA.names}
    for url, sent_no, toks in zip(batch["url"].to_pylist(),
                                  batch["sent_no"].to_pylist(),
                                  batch["tokens"].to_pylist()):
        words = [normalize_token(t["word"]) for t in toks]
        n = len(words)
        fidx = [0] * (n + 1)
        acc = 0
        for k in range(n):
            fidx[k] = acc
            if words[k]:
                acc += 1
        fidx[n] = acc
        for m in parse_ner_sentence(toks):
            cols["url"].append(url)
            cols["mention_id"].append(f"s{sent_no}t{m['tok_start']}")
            cols["sent_no"].append(sent_no)
            cols["tok_start"].append(m["tok_start"])
            cols["tok_end"].append(m["tok_end"])
            cols["span_start"].append(fidx[m["tok_start"]])
            cols["span_end"].append(fidx[m["tok_end"]])
            cols["surface"].append(m["surface"])
            cols["type"].append(m["type"])
            cols["block_key"].append(normalized_surface_key(m["surface"]))
            cols["sent_tokens"].append([w for w in words if w])
    return pa.table(
        {name: pa.array(cols[name], MENTION_SCHEMA.field(name).type)
         for name in MENTION_SCHEMA.names})
