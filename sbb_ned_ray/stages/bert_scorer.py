"""Stage: BERT sentence-pair cross-encoder adapter.

The reference's core ranking signal is a BERT cross-encoder scoring
(query-sentence, candidate-evidence-sentence) pairs on GPU
(``models/classifier_decider_queue.py:37-104``, forward pass
``models/bert.py:307-326``): tokenize → window-grow around both entity
spans → batch → forward → softmax ``p0/p1`` → ``score = log(p1/p0)``.

:class:`BertPairScorer` implements that path behind the SAME interface
as :class:`sbb_ned_ray.stages.scorer.DeterministicOverlapScorer`
(``score_batch`` + batched ``__call__``), so it drops into
``score_pairs`` / ``build_ned_links(split_scorer=True,
scorer_cls=BertPairScorer)`` unchanged, with
``config.scorer_num_gpus`` plumbing the GPU slot.

Model backends, chosen at construction:

* **torch** (import-guarded — absent in this container): loads a
  state-dict checkpoint from ``config.extra["bert_model_path"]`` into
  :class:`TorchBertCrossEncoder` and runs batched inference on
  CPU/GPU.
* **numpy fallback** :class:`NumpyMiniBert`: a REAL (if small)
  transformer encoder — token/position/segment embeddings, multi-head
  scaled-dot-product attention with padding masks, residual layer-norm
  blocks, GELU FFN, CLS classification head — with deterministic
  seeded weights.  Untrained, so its scores are noise-calibrated, but
  every pipeline property the adapter exists to prove (tokenization,
  window growth, fixed-length batching, masked batched inference,
  softmax→log-odds, throughput shape) is exercised for real; the
  interface-conformance tests run against it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.stages.features import VOCAB_SIZE, FeatureConverter

try:                                     # optional dependency
    import torch                         # noqa: F401
    _HAS_TORCH = True
except ImportError:
    _HAS_TORCH = False


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray,
                eps: float = 1e-6) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * (x * x * x))))


class NumpyMiniBert:
    """Deterministic seeded mini-BERT encoder (numpy, float32).

    Sized so CPU inference over test corpora stays tractable while the
    compute SHAPE (batched gemms, masked attention) matches a real
    model; a production deployment swaps in the torch backend.
    """

    def __init__(self, vocab_size: int = VOCAB_SIZE, d: int = 32,
                 n_layers: int = 2, n_heads: int = 2,
                 max_len: int = 512, seed: int = 1234):
        rng = np.random.default_rng(seed)
        s = 0.02

        def w(*shape):
            return rng.normal(0.0, s, size=shape).astype(np.float32)

        self.d, self.h, self.n_layers = d, n_heads, n_layers
        self.tok_emb = w(vocab_size, d)
        self.pos_emb = w(max_len, d)
        self.seg_emb = w(3, d)
        self.layers = []
        for _ in range(n_layers):
            self.layers.append({
                "wq": w(d, d), "wk": w(d, d), "wv": w(d, d), "wo": w(d, d),
                # learnable per-head token-IDENTITY attention bias
                # (copy-attention style): scores += lam_h·[id_i == id_j].
                # Init 0 → plain transformer; training turns it on when
                # cross-segment lexical matching carries signal.
                "lam": np.zeros(n_heads, np.float32),
                "ln1_g": np.ones(d, np.float32),
                "ln1_b": np.zeros(d, np.float32),
                "w1": w(d, 4 * d), "b1": np.zeros(4 * d, np.float32),
                "w2": w(4 * d, d), "b2": np.zeros(d, np.float32),
                "ln2_g": np.ones(d, np.float32),
                "ln2_b": np.zeros(d, np.float32),
            })
        self.head = w(d, 2)
        self.head_b = np.zeros(2, np.float32)

    def forward(self, ids: np.ndarray, mask: np.ndarray,
                segs: np.ndarray) -> np.ndarray:
        """(n, L) int arrays → (n, 2) logits."""
        n, L = ids.shape
        d, h = self.d, self.h
        hd = d // h
        x = self.tok_emb[ids] + self.pos_emb[:L][None, :, :] \
            + self.seg_emb[segs]
        # additive attention mask: pad positions → -inf as keys
        neg = (1.0 - mask.astype(np.float32)) * -1e9   # (n, L)
        att_bias = neg[:, None, None, :]               # (n, 1, 1, L)
        eq = (ids[:, :, None] == ids[:, None, :]).astype(np.float32) \
            [:, None, :, :]                            # (n, 1, L, L)
        for ly in self.layers:
            q = (x @ ly["wq"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
            k = (x @ ly["wk"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
            v = (x @ ly["wv"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
            lam = ly.get("lam")
            scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd) + att_bias
            if lam is not None and np.any(lam):
                scores = scores + lam[None, :, None, None] * eq
            scores -= scores.max(axis=-1, keepdims=True)
            w_att = np.exp(scores)
            w_att /= w_att.sum(axis=-1, keepdims=True)
            ctx = (w_att @ v).transpose(0, 2, 1, 3).reshape(n, L, d)
            x = _layer_norm(x + ctx @ ly["wo"], ly["ln1_g"], ly["ln1_b"])
            ff = _gelu(x @ ly["w1"] + ly["b1"]) @ ly["w2"] + ly["b2"]
            x = _layer_norm(x + ff, ly["ln2_g"], ly["ln2_b"])
        return x[:, 0, :] @ self.head + self.head_b    # CLS pooling


class TorchBertCrossEncoder:
    """Torch backend (requires ``torch``; import-guarded).

    Loads a pickled ``state_dict`` whose tensors mirror
    :class:`NumpyMiniBert`'s parameter layout (tok/pos/seg embeddings,
    per-layer q/k/v/o + FFN + layer norms, 2-way CLS head) — the shape
    a fine-tune of the reference's classifier exports.  ``device`` is
    cuda when available, else cpu; one model per actor
    (``map_batches(BertPairScorer, num_gpus=…)`` gives it a GPU slot).
    """

    def __init__(self, model_path: str, device: str | None = None):
        if not _HAS_TORCH:
            raise ImportError(
                "TorchBertCrossEncoder requires torch; install torch or "
                "use the NumpyMiniBert fallback")
        import torch as _t
        self._t = _t
        self.device = device or (
            "cuda" if _t.cuda.is_available() else "cpu")
        sd = _t.load(model_path, map_location=self.device)
        self.sd = {k: v.to(self.device) for k, v in sd.items()}
        self.n_layers = 1 + max(
            int(k.split(".")[1]) for k in self.sd if k.startswith("layers."))
        self.h = int(self.sd.get("n_heads", _t.tensor(2)).item()) \
            if "n_heads" in self.sd else 2

    def forward(self, ids, mask, segs):   # pragma: no cover - torch only
        t = self._t
        sd = self.sd
        with t.no_grad():
            ids_t = t.as_tensor(ids, device=self.device).long()
            segs_t = t.as_tensor(segs, device=self.device).long()
            mask_t = t.as_tensor(mask, device=self.device).float()
            n, L = ids_t.shape
            x = sd["tok_emb"][ids_t] + sd["pos_emb"][:L][None] \
                + sd["seg_emb"][segs_t]
            d = x.shape[-1]
            hd = d // self.h
            bias = (1.0 - mask_t)[:, None, None, :] * -1e9
            for i in range(self.n_layers):
                p = f"layers.{i}."
                q = (x @ sd[p + "wq"]).view(n, L, self.h, hd) \
                    .transpose(1, 2)
                k = (x @ sd[p + "wk"]).view(n, L, self.h, hd) \
                    .transpose(1, 2)
                v = (x @ sd[p + "wv"]).view(n, L, self.h, hd) \
                    .transpose(1, 2)
                att = t.softmax(
                    q @ k.transpose(-1, -2) / (hd ** 0.5) + bias, dim=-1)
                ctx = (att @ v).transpose(1, 2).reshape(n, L, d)
                x = t.nn.functional.layer_norm(
                    x + ctx @ sd[p + "wo"], (d,),
                    sd[p + "ln1_g"], sd[p + "ln1_b"])
                ff = t.nn.functional.gelu(x @ sd[p + "w1"] + sd[p + "b1"]) \
                    @ sd[p + "w2"] + sd[p + "b2"]
                x = t.nn.functional.layer_norm(
                    x + ff, (d,), sd[p + "ln2_g"], sd[p + "ln2_b"])
            logits = x[:, 0, :] @ sd["head"] + sd["head_b"]
            return logits.cpu().numpy()


# per-worker-process cache for the trained-weights artifact (same
# pattern as the decider-model cache): one np.load per worker, not per
# actor-batch
_NUMPY_MODEL_CACHE: dict[str, "NumpyMiniBert"] = {}


def _load_numpy_model_cached(path: str) -> "NumpyMiniBert":
    m = _NUMPY_MODEL_CACHE.get(path)
    if m is None:
        from sbb_ned_ray.models.bert_train import load_mini_bert
        m = load_mini_bert(path)
        _NUMPY_MODEL_CACHE[path] = m
    return m


class BertPairScorer:
    """Cross-encoder scorer actor: same interface as
    :class:`DeterministicOverlapScorer` (``score_batch`` + ``__call__``
    appending ``p0``/``p1``/``score`` and dropping the token payload).

    Construction picks the backend once per actor (``__init__`` — the
    stateful-stage pattern): torch + checkpoint when
    ``config.extra["bert_model_path"]`` is set and torch imports; else
    a TRAINED numpy artifact when
    ``config.extra["bert_numpy_model_path"]`` names one
    (``models/bert_train.save_mini_bert`` output, loaded once per
    worker process); else the untrained seeded numpy mini model.
    """

    def __init__(self, config: PipelineConfig | None = None, model=None):
        self.config = config or PipelineConfig()
        self.converter = FeatureConverter(self.config)
        if model is not None:
            self.model = model
        else:
            extra = self.config.extra or {}
            path = extra.get("bert_model_path")
            npz_path = extra.get("bert_numpy_model_path")
            if path and _HAS_TORCH:
                self.model = TorchBertCrossEncoder(path)
            elif npz_path:
                self.model = _load_numpy_model_cached(npz_path)
            else:
                self.model = NumpyMiniBert(
                    max_len=max(512, self.config.max_seq_len))

    def _features(self, tok_a, pos_a, end_a, tok_b, pos_b, end_b):
        n = len(tok_a)
        L = self.config.max_seq_len
        ids = np.empty((n, L), dtype=np.int32)
        mask = np.empty((n, L), dtype=np.int32)
        segs = np.empty((n, L), dtype=np.int32)
        for i in range(n):
            a, m, s = self.converter._convert(
                tok_a[i], pos_a[i], end_a[i],
                tok_b[i], pos_b[i], end_b[i])
            ids[i], mask[i], segs[i] = a, m, s
        return ids, mask, segs

    def score_batch(self, tok_a, pos_a, end_a, tok_b, pos_b, end_b):
        """→ (p0, p1, score) float64 arrays; score = log(p1/p0) =
        logit1 − logit0 (exact, no clipping needed)."""
        ids, mask, segs = self._features(tok_a, pos_a, end_a,
                                         tok_b, pos_b, end_b)
        logits = self.model.forward(ids, mask, segs).astype(np.float64)
        score = logits[:, 1] - logits[:, 0]
        p1 = 1.0 / (1.0 + np.exp(-score))
        return 1.0 - p1, p1, score

    def __call__(self, batch: pa.Table) -> pa.Table:
        p0, p1, score = self.score_batch(
            batch["tok_a"].to_pylist(), batch["pos_a"].to_pylist(),
            batch["end_a"].to_pylist(), batch["tok_b"].to_pylist(),
            batch["pos_b"].to_pylist(), batch["end_b"].to_pylist())
        batch = batch.append_column("p0", pa.array(p0, pa.float64()))
        batch = batch.append_column("p1", pa.array(p1, pa.float64()))
        batch = batch.append_column("score", pa.array(score, pa.float64()))
        return batch.drop_columns(["tok_a", "tok_b", "pos_a", "end_a",
                                   "pos_b", "end_b"])
