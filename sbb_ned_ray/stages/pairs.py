"""Stage: sentence-pair building + cross-encoder feature windowing.

Replaces the reference's per-candidate SQLite sentence lookup + pair
generation (``models/sentence_lookup.py:29-136``) and the BERT feature
window construction (``ground_truth/data_processor.py:506-601``):

* evidence sentences per candidate come from the broadcast KB
  (``context_tokens`` + label) — deterministic stand-in for the
  ``<lang>-ned.sqlite`` sentence KB;
* pair budget per (mention, candidate):
  ``use_found = ceil(sqrt(max_pairs))`` query sentences ×
  ``limit = max_pairs // use_found`` evidence sentences
  (``sentence_lookup.py:25-31`` semantics, MAX_PAIRS default 50);
* :func:`build_pair_window` grows a token window symmetrically around
  BOTH entity spans until ``max_seq_len`` is filled, emitting segment
  ids that mark entity tokens (``data_processor.py:506-601``,
  ``mark_entities`` mode).

Stateless apart from the broadcast index → actor pool (index in
``__init__``), Arrow in/out, no shuffle (pairs stay mention-local).
"""

from __future__ import annotations

import math

import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.state.alias_index import AliasIndex, normalize_token

PAIR_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("mention_id", pa.string()),
    ("surface", pa.string()),
    ("cand_entity", pa.int64()),
    ("candidate_title", pa.string()),
    ("qid", pa.string()),
    ("rank", pa.int32()),
    ("proba", pa.float64()),
    ("pair_no", pa.int32()),
    ("tok_a", pa.list_(pa.string())),
    ("pos_a", pa.int32()),
    ("end_a", pa.int32()),
    ("tok_b", pa.list_(pa.string())),
    ("pos_b", pa.int32()),
    ("end_b", pa.int32()),
])


def is_valid_kb_sentence(tokens: list[str]) -> bool:
    """Sentence-KB validity predicate (reference
    ``models/sentence_lookup.py:85-96``): redirect stubs — first token
    ``#redirect`` / ``#weiterleitung`` — are not evidence."""
    return not (tokens and str(tokens[0]).lower()
                in ("#redirect", "#weiterleitung"))


def is_valid_kb_page(page_title: str) -> bool:
    """Page validity predicate (reference ``sentence_lookup.py:52``):
    list pages ("Liste ...") carry no usable entity evidence."""
    return not str(page_title).startswith("Liste ")


def synthesize_evidence(label_toks: list[str], ctx: list[str],
                        n_windows: int = 5, window: int = 6
                        ) -> list[tuple[list[str], int, int]]:
    """Deterministic evidence-sentence synthesis for one KB entity.

    Each sentence = label tokens + a sliding slice of the entity's
    context vocabulary; the union of slices covers the whole vocabulary
    (so at least one pair shares context with a true mention).  Entity
    span = the label tokens at the front.  Used by the fixture
    generator to BUILD the sentence KB (reference ``cli.py:657-685``
    builds ``<lang>-ned.sqlite`` sentences/links the same one-time way)
    and as the runtime fallback for KBs shipped without one.
    """
    out = []
    if not ctx:
        return [(label_toks, 0, len(label_toks))]
    step = max(1, -(-(len(ctx) - window) // max(1, n_windows - 1))) \
        if len(ctx) > window else 1   # ceil-div: windows SPAN the whole
    starts = list(range(0, max(1, len(ctx) - window + 1), step))[:n_windows]
    if starts and starts[-1] < len(ctx) - window:
        starts.append(len(ctx) - window)   # guarantee tail coverage
    if not starts:
        starts = [0]
    for s in starts:
        toks = label_toks + ctx[s:s + window]
        out.append((toks, 0, len(label_toks)))
    return out


def evidence_sentences(index: AliasIndex, eid: int,
                       n_windows: int = 5, window: int = 6):
    """Evidence sentences for one KB entity: the REAL sentence-KB rows
    (``kb_sentences.parquet`` loaded into ``index.sentences`` — the
    reference's per-candidate SQLite sentence lookup,
    ``models/sentence_lookup.py:29-54``) when the KB ships one, else the
    deterministic :func:`synthesize_evidence` stand-in."""
    sents = getattr(index, "sentences", None)
    if sents is not None:
        ev = sents.get(eid)
        if ev is not None:
            return ev
    label_toks = [normalize_token(t) for t in index.labels[eid].split(" ")]
    label_toks = [t for t in label_toks if t]
    return synthesize_evidence(label_toks, index.context_tokens[eid],
                               n_windows, window)


def locate_entity(tokens: list[str], target: list[str]) -> tuple[int, int]:
    """Longest contiguous run of ``target`` inside ``tokens`` → (pos, end).

    Semantics of reference ``models/sentence_lookup.py:56-84``
    (``locate_entities``); returns (0, 0) when absent.
    """
    n, m = len(tokens), len(target)
    best = (0, 0)
    for i in range(n):
        j = 0
        while j < m and i + j < n and tokens[i + j] == target[j]:
            j += 1
        if j > best[1] - best[0]:
            best = (i, i + j)
    return best


def build_pair_window(tok_a, pos_a, end_a, tok_b, pos_b, end_b,
                      max_seq_len: int = 128):
    """Symmetric window growth around both entity spans
    (data_processor.py:506-601 semantics).

    Returns (win_a, new_pos_a, new_end_a, win_b, new_pos_b, new_end_b,
    segment_marks) where segment_marks is a 0/1/2 list over the packed
    sequence [win_a + win_b] with 2 marking entity tokens.
    """
    budget = max_seq_len - 3  # virtual [CLS]/[SEP]/[SEP]
    la, lb = end_a - pos_a, end_b - pos_b
    lo_a, hi_a, lo_b, hi_b = pos_a, end_a, pos_b, end_b
    used = la + lb
    # grow alternately: a-left, a-right, b-left, b-right
    progress = True
    while used < budget and progress:
        progress = False
        if lo_a > 0 and used < budget:
            lo_a -= 1; used += 1; progress = True
        if hi_a < len(tok_a) and used < budget:
            hi_a += 1; used += 1; progress = True
        if lo_b > 0 and used < budget:
            lo_b -= 1; used += 1; progress = True
        if hi_b < len(tok_b) and used < budget:
            hi_b += 1; used += 1; progress = True
    win_a = tok_a[lo_a:hi_a]
    win_b = tok_b[lo_b:hi_b]
    na, ea = pos_a - lo_a, end_a - lo_a
    nb, eb = pos_b - lo_b, end_b - lo_b
    marks = []
    for i in range(len(win_a)):
        marks.append(2 if na <= i < ea else 0)
    for i in range(len(win_b)):
        marks.append(2 if nb <= i < eb else 1)
    return win_a, na, ea, win_b, nb, eb, marks


class PairBuilder:
    """candidates → sentence pairs (actor-pool stage, broadcast index)."""

    def __init__(self, index_ref, config: PipelineConfig | None = None):
        import ray
        self.index: AliasIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef)
            else index_ref)
        self.config = config or PipelineConfig()
        self._evidence_cache: dict[int, list] = {}

    def evidence(self, eid: int):
        ev = self._evidence_cache.get(eid)
        if ev is None:
            ev = evidence_sentences(self.index, eid)
            self._evidence_cache[eid] = ev
        return ev

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        use_found = math.ceil(math.sqrt(cfg.max_pairs))
        limit = max(1, cfg.max_pairs // use_found)
        n = batch.num_rows
        # one to_pylist per column (cell-wise .as_py() is ~10× slower)
        col = {name: batch[name].to_pylist()
               for name in ("url", "mention_id", "surface", "cand_entity",
                            "candidate_title", "qid", "rank", "proba",
                            "sent_tokens")}
        # detector-provided spans pin the OCCURRENCE (locate-by-content
        # would pick the first of a repeated surface); absent → locate
        has_spans = "span_start" in batch.column_names
        if has_spans:
            col["span_start"] = batch["span_start"].to_pylist()
            col["span_end"] = batch["span_end"].to_pylist()
        cols = {k: [] for k in PAIR_SCHEMA.names}
        surf_toks_cache: dict[str, list[str]] = {}
        # locate cache: the (sentence, surface) span repeats across all
        # candidates of one mention
        loc_cache: dict[tuple[str, str, str], tuple[int, int]] = {}
        for i in range(n):
            surface = col["surface"][i]
            if has_spans:
                pos_a, end_a = col["span_start"][i], col["span_end"][i]
            else:
                st = surf_toks_cache.get(surface)
                if st is None:
                    st = [normalize_token(t) for t in surface.split(" ")]
                    st = [t for t in st if t]
                    surf_toks_cache[surface] = st
                tok_a = col["sent_tokens"][i]
                lk = (col["url"][i], col["mention_id"][i], surface)
                span = loc_cache.get(lk)
                if span is None:
                    span = locate_entity(tok_a, st)
                    loc_cache[lk] = span
                pos_a, end_a = span
            tok_a = col["sent_tokens"][i]
            # query sentences: we carry one sentence per mention occurrence;
            # budget caps evidence sentences per candidate at `limit`
            ev = self.evidence(int(col["cand_entity"][i]))
            for pair_no, (tok_b, pos_b, end_b) in enumerate(ev[:limit]):
                cols["url"].append(col["url"][i])
                cols["mention_id"].append(col["mention_id"][i])
                cols["surface"].append(surface)
                cols["cand_entity"].append(col["cand_entity"][i])
                cols["candidate_title"].append(col["candidate_title"][i])
                cols["qid"].append(col["qid"][i])
                cols["rank"].append(col["rank"][i])
                cols["proba"].append(col["proba"][i])
                cols["pair_no"].append(pair_no)
                cols["tok_a"].append(tok_a)
                cols["pos_a"].append(pos_a)
                cols["end_a"].append(end_a)
                cols["tok_b"].append(tok_b)
                cols["pos_b"].append(pos_b)
                cols["end_b"].append(end_b)
        return pa.table(
            {name: pa.array(cols[name], PAIR_SCHEMA.field(name).type)
             for name in PAIR_SCHEMA.names})


# per-worker-process cache for the shuffle-path synthesize fallback:
# (index_ref key) → (AliasIndex, {eid: evidence}); same pattern as
# stages/fused._WORKER_CACHE — ray.get once per worker, never per batch
_FALLBACK_CACHE: dict = {}


def _fallback_evidence(index_ref, eid: int):
    import ray
    key = index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref)
    entry = _FALLBACK_CACHE.get(key)
    if entry is None:
        _FALLBACK_CACHE.clear()   # one live index per worker
        index = (ray.get(index_ref)
                 if isinstance(index_ref, ray.ObjectRef) else index_ref)
        entry = (index, {})
        _FALLBACK_CACHE[key] = entry
    index, cache = entry
    ev = cache.get(eid)
    if ev is None:
        ev = evidence_sentences(index, eid)
        cache[eid] = ev
    return ev


def attach_evidence_shuffle(cands_ds, sentences_ds,
                            config: PipelineConfig | None = None,
                            num_partitions: int = 16,
                            index_ref=None):
    """Large-KB evidence join: candidate rows ⋈ sentence-KB rows on
    ``qid`` via a bucketed co-shuffle, emitting PAIR rows ready for the
    pluggable scorer.

    This is the promised counterpart of the broadcast evidence lookup
    (``pipelines/ned.py`` large-KB note): when the sentence KB exceeds
    the object store, it streams from parquet and co-shuffles with the
    candidates instead of riding inside the broadcast AliasIndex.  Both
    sides are hash-bucketed on ``qid`` into ``num_partitions`` coarse
    partitions (same key ⇒ same bucket) and merged with one vectorized
    pandas merge per bucket; the per-candidate pair budget caps the
    POSITIONAL rank of each sentence *after* the validity filter —
    exactly like :class:`PairBuilder`'s ``ev[:limit]``
    (``sentence_lookup.py:25-31`` semantics) even when ``sent_no`` is
    non-contiguous or invalid sentences were dropped.  Hot-entity skew
    is bounded by the bucket count; salt ``qid`` like the attach join
    if a single entity dominates a corpus.

    Candidates whose entity has NO valid sentence rows are NOT dropped:
    the join is a left join and unmatched candidates fall back to the
    broadcast index's evidence (``evidence_sentences`` — real KB rows if
    the index carries them, else deterministic synthesis), mirroring the
    broadcast path so ``run_ned`` and ``run_ned_shuffle_kb`` stay
    link-parity even for sentence-less entities.  ``index_ref`` (a
    ``ray.put`` AliasIndex) supplies that fallback; if it is ``None``
    and a candidate misses, the stage raises.

    Candidate rows must carry ``sent_tokens_enc`` (\\x00-packed mention
    sentence tokens) and ``span_start``/``span_end``.
    """
    import numpy as np
    import pandas as pd

    cfg = config or PipelineConfig()
    use_found = math.ceil(math.sqrt(cfg.max_pairs))
    limit = max(1, cfg.max_pairs // use_found)

    CAND_COLS = ["url", "mention_id", "surface", "cand_entity",
                 "candidate_title", "qid", "rank", "proba",
                 "span_start", "span_end", "sent_tokens_enc"]

    def cand_rows(t: pa.Table) -> pa.Table:
        t = t.select(CAND_COLS)
        n = t.num_rows
        t = t.append_column("side", pa.array(np.zeros(n, np.int8)))
        for name, typ in (("sent_no", pa.int32()),
                          ("ent_pos", pa.int32()), ("ent_end", pa.int32())):
            t = t.append_column(name, pa.nulls(n, typ))
        return t.append_column("tokens",
                               pa.nulls(n, pa.list_(pa.string())))

    def sent_rows(t: pa.Table) -> pa.Table:
        keep = pa.array([is_valid_kb_sentence(x)
                         for x in t["tokens"].to_pylist()])
        t = t.filter(keep)
        n = t.num_rows
        out = pa.table({
            "url": pa.nulls(n, pa.string()),
            "mention_id": pa.nulls(n, pa.string()),
            "surface": pa.nulls(n, pa.string()),
            "cand_entity": pa.nulls(n, pa.int64()),
            "candidate_title": pa.nulls(n, pa.string()),
            "qid": t["qid"],
            "rank": pa.nulls(n, pa.int32()),
            "proba": pa.nulls(n, pa.float64()),
            "span_start": pa.nulls(n, pa.int32()),
            "span_end": pa.nulls(n, pa.int32()),
            "sent_tokens_enc": pa.nulls(n, pa.string()),
            "side": pa.array(np.ones(n, np.int8)),
            "sent_no": t["sent_no"],
            "ent_pos": t["ent_pos"],
            "ent_end": t["ent_end"],
            "tokens": t["tokens"],
        })
        return out

    def add_part(t: pa.Table) -> pa.Table:
        h = (pd.util.hash_pandas_object(t["qid"].to_pandas(), index=False)
             .to_numpy() % num_partitions).astype("int32")
        return t.append_column("_part", pa.array(h, pa.int32()))

    EMPTY = {
        "url": "object", "mention_id": "object", "surface": "object",
        "cand_entity": "int64", "candidate_title": "object",
        "qid": "object", "rank": "int32", "proba": "float64",
        "pair_no": "int32", "tok_a": "object", "pos_a": "int32",
        "end_a": "int32", "tok_b": "object", "pos_b": "int32",
        "end_b": "int32"}

    def _decode_tok_a(enc_vals: np.ndarray) -> np.ndarray:
        # decode mention tokens once per unique packed string (explicit
        # cache loop — Series.map(dict) silently drops some matches when
        # the dict values are lists)
        cache: dict = {}
        tok_a = np.empty(len(enc_vals), dtype=object)
        for i, e in enumerate(enc_vals):
            v = cache.get(e)
            if v is None:
                v = e.split("\x00")
                cache[e] = v
            tok_a[i] = v
        return tok_a

    def _out_frame(m: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": m["url"].to_numpy(),
            "mention_id": m["mention_id"].to_numpy(),
            "surface": m["surface"].to_numpy(),
            "cand_entity": m["cand_entity"].astype("int64").to_numpy(),
            "candidate_title": m["candidate_title"].to_numpy(),
            "qid": m["qid"].to_numpy(),
            "rank": m["rank"].astype("int32").to_numpy(),
            "proba": m["proba"].astype("float64").to_numpy(),
            "pair_no": m["pair_no"].astype("int32").to_numpy(),
            "tok_a": _decode_tok_a(m["sent_tokens_enc"].to_numpy()),
            "pos_a": m["span_start"].astype("int32").to_numpy(),
            "end_a": m["span_end"].astype("int32").to_numpy(),
            # arrow list cells arrive as numpy arrays; plain lists
            # convert back to arrow cleanly
            "tok_b": m["tokens"].map(
                lambda v: v if isinstance(v, list) else list(v)).to_numpy(),
            "pos_b": m["ent_pos"].astype("int32").to_numpy(),
            "end_b": m["ent_end"].astype("int32").to_numpy(),
        })

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        c = df.loc[df["side"] == 0, CAND_COLS]
        s = df.loc[df["side"] == 1,
                   ["qid", "sent_no", "tokens", "ent_pos", "ent_end"]]
        # positional rank within each qid AFTER the validity filter
        # (applied upstream in sent_rows), capped like PairBuilder's
        # ev[:limit] — NOT the raw sent_no, which may be non-contiguous
        s = s.sort_values("sent_no", kind="stable")
        s = s.assign(pair_no=s.groupby("qid").cumcount())
        s = s[s["pair_no"] < limit]
        m = c.merge(s, on="qid", how="left")
        miss = m["pair_no"].isna()
        frames = []
        hit = m[~miss]
        if not hit.empty:
            frames.append(_out_frame(hit))
        if miss.any():
            # sentence-less entities: mirror the broadcast fallback
            # (one left-join miss row per candidate; expand to its
            # synthesized/broadcast evidence)
            if index_ref is None:
                raise ValueError(
                    "attach_evidence_shuffle: candidates with no valid "
                    "kb_sentences rows need index_ref= for the "
                    "evidence fallback (qids: %s)"
                    % sorted(set(m.loc[miss, "qid"]))[:5])
            fb = m.loc[miss, CAND_COLS]
            reps, pair_no, tok_b, pos_b, end_b = [], [], [], [], []
            for eid in fb["cand_entity"].astype("int64"):
                ev = _fallback_evidence(index_ref, int(eid))[:limit]
                reps.append(len(ev))
                for k, (toks, p, e) in enumerate(ev):
                    pair_no.append(k)
                    tok_b.append(list(toks))
                    pos_b.append(p)
                    end_b.append(e)
            fbx = fb.loc[fb.index.repeat(reps)].assign(
                pair_no=np.asarray(pair_no, dtype="int64"),
                tokens=pd.Series(tok_b, dtype="object").to_numpy(),
                ent_pos=np.asarray(pos_b, dtype="int64"),
                ent_end=np.asarray(end_b, dtype="int64"))
            if not fbx.empty:
                frames.append(_out_frame(fbx))
        if not frames:
            return pd.DataFrame(
                {k: pd.Series(dtype=v) for k, v in EMPTY.items()})
        out = pd.concat(frames, ignore_index=True)
        # stable dtypes across hit-only / fallback-only / mixed buckets
        # (block-union schema divergence corrupts downstream groupbys)
        return out.astype({k: v for k, v in EMPTY.items() if v != "object"})

    tagged = cands_ds.map_batches(cand_rows, batch_format="pyarrow") \
        .map_batches(add_part, batch_format="pyarrow") \
        .union(sentences_ds.map_batches(sent_rows, batch_format="pyarrow")
               .map_batches(add_part, batch_format="pyarrow"))
    return tagged.groupby("_part").map_groups(merge_bucket,
                                              batch_format="pandas")


def build_pairs(candidates_ds, index_ref,
                config: PipelineConfig | None = None,
                batch_size: int = 2048, concurrency=None,
                **ray_remote_kwargs):
    kwargs = dict(ray_remote_kwargs)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return candidates_ds.map_batches(
        PairBuilder, fn_constructor_args=(index_ref, config),
        batch_format="pyarrow", batch_size=batch_size, **kwargs)
