"""Index build-job artifacts: save/load the broadcast AliasIndex.

Reference analog: ``build-index`` writes the Annoy index + mapping
pickle (``index.py:584-592``) and serving loads them per process
(``index.py:623-649``).  Here the artifact is one pickle of the
:class:`AliasIndex` (its arrays/dicts are plain picklable objects)
written atomically next to a JSON manifest recording the KB
fingerprint and config — a rerun with an unchanged KB reuses the
artifact instead of rebuilding, and a changed KB invalidates it.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle

import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.state.alias_index import AliasIndex, build_alias_index

# Bump when AliasIndex layout / anagram alphabet / probe semantics
# change: a pickled artifact from an older code version must NOT be
# loaded and probed with mismatched vector dims or bucket keys.
INDEX_FORMAT_VERSION = 4


def _hash_table_buffers(h, table: pa.Table, cols: list[str]) -> None:
    for col in cols:
        h.update(col.encode())
        for chunk in table[col].chunks:
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)


def kb_fingerprint(kb: pa.Table, config: PipelineConfig,
                   sentences: pa.Table | None = None,
                   redirects: pa.Table | None = None) -> str:
    """Content fingerprint of everything the index build reads.

    Hashes ALL index-relevant KB columns (not just qids — alias edits,
    proba changes, context/geo/date updates with unchanged qids must
    invalidate the artifact), the schema, the index-shaping config
    knobs, and :data:`INDEX_FORMAT_VERSION` (code changes such as the
    anagram-alphabet widening are versioned too).
    """
    h = hashlib.sha256()
    h.update(str(kb.schema).encode())
    h.update(str(kb.num_rows).encode())
    index_cols = [c for c in ("qid", "page_title", "label", "type",
                              "proba", "aliases", "context_tokens",
                              "longitude", "latitude", "dateofbirth",
                              "inception")
                  if c in kb.column_names]
    # one pass over the raw Arrow buffers — no Python-object conversion
    _hash_table_buffers(h, kb, index_cols)
    if sentences is not None:
        h.update(f"|sentences:{sentences.num_rows}|".encode())
        _hash_table_buffers(h, sentences, sentences.column_names)
    if redirects is not None:
        h.update(f"|redirects:{redirects.num_rows}|".encode())
        _hash_table_buffers(h, redirects, redirects.column_names)
    h.update(f"v{INDEX_FORMAT_VERSION}|{config.ngram_size}|"
             f"{config.num_perm}|{config.lsh_bands}|{config.seed}"
             .encode())
    return h.hexdigest()[:16]


def save_index(index: AliasIndex, kb: pa.Table, out_dir: str,
               config: PipelineConfig | None = None,
               sentences: pa.Table | None = None,
               redirects: pa.Table | None = None) -> str:
    cfg = config or PipelineConfig()
    os.makedirs(out_dir, exist_ok=True)
    fp = kb_fingerprint(kb, cfg, sentences, redirects)
    tmp = os.path.join(out_dir, "alias_index.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(index, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, os.path.join(out_dir, "alias_index.pkl"))
    with open(os.path.join(out_dir, "_index_manifest.json"), "w") as f:
        json.dump({"fingerprint": fp, "entities": len(index.titles)}, f)
    return fp


def load_or_build_index(kb: pa.Table, artifact_dir: str | None = None,
                        config: PipelineConfig | None = None,
                        sentences: pa.Table | None = None,
                        redirects: pa.Table | None = None) -> AliasIndex:
    """Load the index artifact when its manifest matches the KB (and
    sentence-KB) fingerprint; otherwise (re)build and save it."""
    cfg = config or PipelineConfig()
    if artifact_dir is None:
        return build_alias_index(kb, cfg, sentences=sentences,
                                 redirects=redirects)
    mf = os.path.join(artifact_dir, "_index_manifest.json")
    pkl = os.path.join(artifact_dir, "alias_index.pkl")
    fp = kb_fingerprint(kb, cfg, sentences, redirects)
    if os.path.exists(mf) and os.path.exists(pkl):
        try:
            with open(mf) as f:
                m = json.load(f)
            if m.get("fingerprint") == fp:
                with open(pkl, "rb") as f:
                    return pickle.load(f)
        except (json.JSONDecodeError, OSError, pickle.UnpicklingError):
            pass
    index = build_alias_index(kb, cfg, sentences=sentences,
                              redirects=redirects)
    save_index(index, kb, artifact_dir, cfg, sentences, redirects)
    return index
