"""AliasIndex — the broadcast blocking-side state.

Ray-Data-first replacement for the reference's per-process Annoy index +
mapping + frequency stoplist (``index.py:623-649`` load, ``index.py:373-394``
per-process ``initializer``): one picklable object built ONCE on the
driver from the KB entities table, shipped to every actor via
``ray.put`` and read zero-copy from the object store in each actor's
``__init__`` — never re-shipped per batch.

Contents:
* ``alias_exact``     normalized-surface key → entity ids (equi-blocking)
* ``part_*``          unique alias parts, their anagram vectors, the
                      part → entities postings and part frequencies
                      (the frequency stoplist of ``index.py:640-645,669-674``)
* ``band_to_parts``   char-n-gram MinHash-LSH band key → part ids — the
                      fuzzy probe standing in for the Annoy ANN lookup
* ``token_seqs``      normalized alias token tuples for the gazetteer
                      mention detector.

Scale note (100 TB input): this index scales with the **KB**, not the
input; for a Wikidata-size KB (~10⁸ aliases) it shards by
``hash(first_token)`` into per-actor shards, or candidate generation
switches to the co-shuffle path (``groupby(block_key)`` of mentions ∪
alias rows) — the pipeline builder chooses by KB size.
"""

from __future__ import annotations

import functools
from collections import Counter

import numpy as np
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.functions.hashing import MinHasher, char_ngrams
from sbb_ned_ray.functions.normalization import (
    anagram_matrix,
    filter_surface,
    normalize_chars,
)


def surface_key(s: str) -> str:
    """Canonical normalized key of a surface/title (underscores are
    separators, as in wiki titles): the alias_exact / redirect key."""
    return " ".join(filter_surface(normalize_chars(s.replace("_", " "))))


def redirect_map(redirects: pa.Table | None) -> dict[str, str]:
    """redirects table (rd_from_title → rd_title, underscored titles —
    reference ``webapp/app.py:120-129``) → lookup dict keyed by the
    normalized surface key of the source form.  One hop; self-loops
    (source and target normalize to the same key) are dropped — they
    cannot change a candidate set."""
    out: dict[str, str] = {}
    if redirects is None:
        return out
    for src, dst in zip(redirects["rd_from_title"].to_pylist(),
                        redirects["rd_title"].to_pylist()):
        if src is None or dst is None:
            continue
        key = surface_key(src)
        if key and surface_key(dst) != key:
            out[key] = dst
    return out


@functools.lru_cache(maxsize=131072)
def normalize_token(tok: str) -> str:
    """Per-token canonical form used by both the gazetteer trie and the
    mention detector: char-normalize → lowercase → strip non-word chars,
    keeping the OCR hyphen mark ``¬`` as its own token.  Memoized —
    tokens follow a Zipf vocabulary, so per-batch repetition is heavy."""
    t = normalize_chars(tok).lower()
    if t == "¬":
        return t
    return "".join(c for c in t if c.isalnum())


class AliasIndex:
    def __init__(self, kb: pa.Table, config: PipelineConfig | None = None,
                 sentences: pa.Table | None = None,
                 redirects: pa.Table | None = None):
        config = config or PipelineConfig()
        self.config = config
        self.titles = kb["page_title"].to_pylist()
        self.qids = kb["qid"].to_pylist()
        self.types = kb["type"].to_pylist()
        self.labels = kb["label"].to_pylist()
        self.probas = np.asarray(kb["proba"].to_pylist(), dtype=np.float64)
        self.context_tokens = kb["context_tokens"].to_pylist()
        aliases = kb["aliases"].to_pylist()
        # geo / temporal metadata for the per-job context filters
        # (reference index.py:75-197); absent columns → all-NaN/NaT
        n = kb.num_rows

        def _f64(col):
            if col in kb.column_names:
                return np.array(
                    [np.nan if v is None else float(v)
                     for v in kb[col].to_pylist()], dtype=np.float64)
            return np.full(n, np.nan)

        def _years(col):
            if col in kb.column_names:
                return np.array(
                    [np.nan if v is None else float(v.year)
                     for v in kb[col].to_pylist()], dtype=np.float64)
            return np.full(n, np.nan)

        self.longitudes = _f64("longitude")
        self.latitudes = _f64("latitude")
        self.birth_years = _years("dateofbirth")
        self.inception_years = _years("inception")
        self.birth_dates = (kb["dateofbirth"].to_pylist()
                            if "dateofbirth" in kb.column_names
                            else [None] * n)
        self.inception_dates = (kb["inception"].to_pylist()
                                if "inception" in kb.column_names
                                else [None] * n)
        self.qid_to_eid = {q: i for i, q in enumerate(self.qids)}

        # real sentence-KB evidence (kb_sentences.parquet: qid, sent_no,
        # tokens, ent_pos, ent_end), replacing the synthesized fallback
        # (reference sentence lookup, models/sentence_lookup.py:29-54)
        self.sentences: dict[int, list[tuple[list[str], int, int]]] | None \
            = None
        if sentences is not None:
            from sbb_ned_ray.stages.pairs import is_valid_kb_sentence
            by_eid: dict[int, list] = {}
            order = sorted(
                zip(sentences["qid"].to_pylist(),
                    sentences["sent_no"].to_pylist(),
                    sentences["tokens"].to_pylist(),
                    sentences["ent_pos"].to_pylist(),
                    sentences["ent_end"].to_pylist()),
                key=lambda r: (r[0], r[1]))
            for qid, _, toks, pos, end in order:
                eid = self.qid_to_eid.get(qid)
                if eid is not None and is_valid_kb_sentence(toks):
                    by_eid.setdefault(eid, []).append(
                        (list(toks), int(pos), int(end)))
            self.sentences = by_eid

        self.alias_exact: dict[str, list[int]] = {}
        part_to_id: dict[str, int] = {}
        part_entities: dict[int, set[int]] = {}
        token_seqs: dict[tuple, list[int]] = {}

        for eid, alias_list in enumerate(aliases):
            for alias in alias_list:
                parts = filter_surface(normalize_chars(alias))
                if not parts:
                    continue
                key = " ".join(parts)
                self.alias_exact.setdefault(key, [])
                if eid not in self.alias_exact[key]:
                    self.alias_exact[key].append(eid)
                for p in parts:
                    pid = part_to_id.setdefault(p, len(part_to_id))
                    part_entities.setdefault(pid, set()).add(eid)
                seq = tuple(normalize_token(t) for t in alias.split(" "))
                seq = tuple(t for t in seq if t)
                if seq:
                    token_seqs.setdefault(seq, [])
                    if eid not in token_seqs[seq]:
                        token_seqs[seq].append(eid)

        self.part_to_id = part_to_id
        self.part_list = [None] * len(part_to_id)
        for p, pid in part_to_id.items():
            self.part_list[pid] = p
        self.part_entities = {pid: np.fromiter(sorted(es), dtype=np.int64)
                              for pid, es in part_entities.items()}
        # frequency = number of entities reachable through a part
        # (stoplist analog of mapping.ann_index.value_counts(), index.py:641)
        self.part_freq = np.array(
            [len(self.part_entities[pid]) for pid in range(len(self.part_list))],
            dtype=np.int64)

        self.part_vectors = anagram_matrix(self.part_list)

        # MinHash-LSH over char n-grams of each part → fuzzy probe buckets
        self.hasher = MinHasher(num_perm=config.num_perm, seed=config.seed)
        band_to_parts: dict[int, list[int]] = {}
        for pid, p in enumerate(self.part_list):
            sig = self.hasher.signature(char_ngrams(p, config.ngram_size))
            for bk in self.hasher.band_keys(sig, config.lsh_bands):
                band_to_parts.setdefault(bk, []).append(pid)
        self.band_to_parts = {k: np.asarray(v, dtype=np.int64)
                              for k, v in band_to_parts.items()}

        # redirect surface expansion (reference webapp/app.py:338-339:
        # `normalized.replace(' ','_') in redirects.index` → add rd_title
        # to the mention's surface set).  Exact-key lookup ONLY — the
        # reference resolves redirects by .loc, never fuzzily.  The
        # TARGET title then contributes its alias-exact block and its
        # parts to the fuzzy probe (candidates.py).
        self.redirects = redirect_map(redirects)
        # redirect source forms whose target resolves to known entities
        # join the gazetteer trie, so the detector recognizes
        # redirect-only names (the reference gets these from upstream
        # NER; the gazetteer is our detection stand-in)
        if redirects is not None:
            for src, dst in zip(redirects["rd_from_title"].to_pylist(),
                                redirects["rd_title"].to_pylist()):
                if src is None or dst is None:
                    continue
                eids = self.alias_exact.get(surface_key(dst))
                if not eids:
                    continue
                seq = tuple(normalize_token(t)
                            for t in src.replace("_", " ").split(" "))
                seq = tuple(t for t in seq if t)
                if seq:
                    token_seqs.setdefault(seq, [])
                    for eid in eids:
                        if eid not in token_seqs[seq]:
                            token_seqs[seq].append(eid)

        # gazetteer structures for the mention detector
        self.token_seqs = token_seqs
        self.first_tokens = {seq[0] for seq in token_seqs}
        self.max_seq_tokens = max((len(s) for s in token_seqs), default=1)

        # majority type per token-seq (detector emits it; candidate gen does
        # NOT hard-filter on it — ambiguity families may cross types)
        self.seq_type: dict[tuple, str] = {}
        for seq, eids in token_seqs.items():
            c = Counter(self.types[e] for e in eids)
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            self.seq_type[seq] = top

    # -- probes -------------------------------------------------------------

    def probe_part(self, part: str, max_dist: float, search_k: int = 50):
        """ANN-style probe for one surface part.

        Returns (entity_ids, dists): exact part match at dist 0, plus
        LSH-bucketed fuzzy parts at anagram angular distance < max_dist.
        Short parts get the frequency stoplist (index.py:669-674).
        """
        cfg = self.config
        cand_pids: set[int] = set()
        pid = self.part_to_id.get(part)
        if pid is not None:
            cand_pids.add(pid)
        sig = self.hasher.signature(char_ngrams(part, cfg.ngram_size))
        for bk in self.hasher.band_keys(sig, cfg.lsh_bands):
            hits = self.band_to_parts.get(bk)
            if hits is not None:
                cand_pids.update(int(h) for h in hits)
        if not cand_pids:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        pids = np.fromiter(sorted(cand_pids), dtype=np.int64)
        # frequency stoplist for short parts
        if len(part) < cfg.min_part_len_for_freq:
            pids = pids[self.part_freq[pids] <= cfg.max_frequency]
            if pids.size == 0:
                return np.zeros(0, dtype=np.int64), np.zeros(0)
        from sbb_ned_ray.functions.normalization import anagram_vector
        v = anagram_vector(part)
        # accumulate in float64 so the result is bitwise identical to the
        # per-pair angular_distance() used on the co-shuffle path (float32
        # accumulation order differs between matmul and vector dot, and the
        # sqrt near 0 amplifies that eps into ~1e-4 dist jitter)
        cos = self.part_vectors[pids].astype(np.float64) @ v.astype(np.float64)
        dists = np.sqrt(np.maximum(0.0, 2.0 * (1.0 - np.clip(cos, -1.0, 1.0))))
        keep = dists < max_dist
        pids, dists = pids[keep], dists[keep]
        if pids.size > search_k:
            # tie-break by part STRING (content-based, reproducible by the
            # co-shuffle blocking path) — not by insertion-order pid
            part_strs = [self.part_list[int(p)] for p in pids]
            order = sorted(range(pids.size),
                           key=lambda i: (dists[i], part_strs[i]))[:search_k]
            pids, dists = pids[order], dists[order]
        # expand parts → entities, keeping min dist per entity
        ent_dist: dict[int, float] = {}
        for p_, d_ in zip(pids, dists):
            for e in self.part_entities[int(p_)]:
                e = int(e)
                if e not in ent_dist or d_ < ent_dist[e]:
                    ent_dist[e] = float(d_)
        if not ent_dist:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        ents = np.fromiter(sorted(ent_dist), dtype=np.int64)
        return ents, np.array([ent_dist[int(e)] for e in ents])


def build_alias_index(kb: pa.Table, config: PipelineConfig | None = None,
                      sentences: pa.Table | None = None,
                      redirects: pa.Table | None = None) -> AliasIndex:
    return AliasIndex(kb, config, sentences=sentences, redirects=redirects)
