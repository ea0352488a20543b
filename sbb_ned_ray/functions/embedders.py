"""Part-embedding adapters behind one interface.

The reference's candidate index embeds surface parts with a pluggable
``Embeddings`` class (``embeddings/base.py:12-21``): the anagram
embedding (``embeddings/anagram.py:21-38``), fastText vectors loaded
via gensim (``embeddings/fasttext.py:11-41``), or contextualized
flair/BERT token embeddings (``embeddings/flair_bert.py:1-214``).  The
engine's broadcast AliasIndex and the co-shuffle blocking path both
consume an embedder through :class:`PartEmbedder`'s two-method surface
(``dim`` + batched ``embed``); :class:`AnagramEmbedder` is the default
(deterministic, model-free), and the model-backed adapters are
import-guarded — gensim / flair+torch are not in this container, so
constructing them without the dependency raises ``ImportError`` with
the interface itself still importable and testable.
"""

from __future__ import annotations

import numpy as np

from sbb_ned_ray.functions.normalization import anagram_matrix

try:
    from gensim.models.fasttext import load_facebook_vectors
    _HAS_GENSIM = True
except ImportError:
    _HAS_GENSIM = False


class PartEmbedder:
    """Interface: ``embed(parts) → (n, dim) float32, L2-normalized
    rows`` (zero rows allowed for unembeddable parts)."""

    dim: int

    def embed(self, parts: list[str]) -> np.ndarray:
        raise NotImplementedError


class AnagramEmbedder(PartEmbedder):
    """Character-count embedding (reference
    ``embeddings/anagram.py:21-38``): NFKD → ascii → lower → per-char
    counts over [a-z0-9], L2-normalized.  Model-free and deterministic
    — the default for the broadcast index and the blocking joins."""

    dim = 36

    def embed(self, parts: list[str]) -> np.ndarray:
        return anagram_matrix(list(parts)).astype(np.float32)


class FastTextEmbedder(PartEmbedder):
    """fastText vectors via gensim (reference
    ``embeddings/fasttext.py:11-41``): the ``.bin`` facebook model is
    loaded lazily ONCE per process (actor ``__init__`` at pipeline
    level) and subword fallback covers OOV parts."""

    def __init__(self, model_path: str):
        if not _HAS_GENSIM:
            raise ImportError(
                "FastTextEmbedder requires gensim; use AnagramEmbedder "
                "or install gensim")
        self._path = model_path
        self._kv = None

    def _emb(self):
        if self._kv is None:
            self._kv = load_facebook_vectors(self._path)
        return self._kv

    @property
    def dim(self) -> int:           # type: ignore[override]
        return int(self._emb().vector_size)

    def embed(self, parts: list[str]) -> np.ndarray:
        kv = self._emb()
        out = np.zeros((len(parts), kv.vector_size), dtype=np.float32)
        for i, p in enumerate(parts):
            v = kv[p]
            n = float(np.linalg.norm(v))
            if n > 0:
                out[i] = v / n
        return out


class FlairBertEmbedder(PartEmbedder):
    """Contextualized token embeddings (reference
    ``embeddings/flair_bert.py:1-214``): a BERT/flair model embeds each
    part IN its sentence context with the ``EmbedWithContext`` window
    (``embeddings/base.py:207-352``).  Requires torch+flair (absent in
    this container); the windowing semantics live in
    ``config.scorer_context_window`` and the fused scorer regardless."""

    def __init__(self, model_name: str, layers: str = "-1",
                 pooling: str = "first"):
        try:
            import flair  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "FlairBertEmbedder requires flair+torch; use "
                "AnagramEmbedder or install flair") from e
        from flair.embeddings import TransformerWordEmbeddings
        self._model = TransformerWordEmbeddings(
            model_name, layers=layers, subtoken_pooling=pooling)

    @property
    def dim(self) -> int:           # type: ignore[override]
        return int(self._model.embedding_length)

    def embed(self, parts: list[str]) -> np.ndarray:  # pragma: no cover
        from flair.data import Sentence
        out = np.zeros((len(parts), self.dim), dtype=np.float32)
        for i, p in enumerate(parts):
            s = Sentence(p)
            self._model.embed(s)
            if len(s):
                v = s[0].embedding.cpu().numpy()
                n = float(np.linalg.norm(v))
                if n > 0:
                    out[i] = v / n
        return out


def make_embedder(kind: str = "anagram", **kwargs) -> PartEmbedder:
    """Factory keyed like the reference's CLI embedding choice."""
    if kind == "anagram":
        return AnagramEmbedder()
    if kind == "fasttext":
        return FastTextEmbedder(**kwargs)
    if kind in ("flair", "bert"):
        return FlairBertEmbedder(**kwargs)
    raise ValueError(f"unknown embedder kind: {kind}")
