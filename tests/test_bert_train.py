"""Numpy backprop trainer: analytic gradients vs numerical, training
actually learns, and the weight artifact round-trips."""

import numpy as np
import pytest

from sbb_ned_ray.models.bert_train import (
    backward,
    forward_cached,
    load_mini_bert,
    save_mini_bert,
    softmax_xent,
)
from sbb_ned_ray.stages.bert_scorer import NumpyMiniBert


def _f64_model(**kw):
    m = NumpyMiniBert(**kw)
    m.tok_emb = m.tok_emb.astype(np.float64)
    m.pos_emb = m.pos_emb.astype(np.float64)
    m.seg_emb = m.seg_emb.astype(np.float64)
    m.head = m.head.astype(np.float64)
    m.head_b = m.head_b.astype(np.float64)
    for ly in m.layers:
        for k in ly:
            ly[k] = ly[k].astype(np.float64)
    return m


def test_forward_cached_matches_forward():
    m = NumpyMiniBert(vocab_size=60, d=16, n_layers=2, n_heads=2,
                      max_len=12, seed=3)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, size=(4, 10))
    mask = (rng.random((4, 10)) > 0.2).astype(np.int64)
    mask[:, 0] = 1
    segs = rng.integers(0, 3, size=(4, 10))
    a = m.forward(ids, mask, segs)
    b, _ = forward_cached(m, ids, mask, segs)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_gradients_match_numerical():
    """Analytic backprop == central-difference numerical gradients on a
    sample of entries of every parameter kind (float64 model)."""
    m = _f64_model(vocab_size=40, d=8, n_layers=2, n_heads=2,
                   max_len=8, seed=5)
    # scale weights up from the 0.02 init so attention is non-trivial
    # and every gradient sits far above the central-difference noise
    # floor (~1e-10 at eps=1e-6)
    for ly in m.layers:
        for k in ("wq", "wk", "wv", "wo", "w1", "w2"):
            ly[k] *= 10.0
    m.head *= 10.0
    rng = np.random.default_rng(1)
    n, L = 3, 7
    ids = rng.integers(0, 40, size=(n, L))
    mask = np.ones((n, L), dtype=np.int64)
    mask[0, 5:] = 0
    segs = rng.integers(0, 3, size=(n, L))
    y = np.array([0, 1, 1])

    def loss_fn():
        logits, _ = forward_cached(m, ids, mask, segs)
        loss, _ = softmax_xent(logits, y)
        return loss

    logits, cache = forward_cached(m, ids, mask, segs)
    _, dlog = softmax_xent(logits, y)
    grads = backward(m, cache, dlog)

    eps = 1e-6
    checks = [("head", m.head, grads["head"]),
              ("head_b", m.head_b, grads["head_b"]),
              ("tok_emb", m.tok_emb, grads["tok_emb"]),
              ("pos_emb", m.pos_emb, grads["pos_emb"]),
              ("seg_emb", m.seg_emb, grads["seg_emb"])]
    for i in range(2):
        ly, g = m.layers[i], grads["layers"][i]
        for name in ("wq", "wk", "wv", "wo", "w1", "w2", "b1", "b2",
                     "lam", "ln1_g", "ln1_b", "ln2_g", "ln2_b"):
            checks.append((f"layers.{i}.{name}", ly[name], g[name]))
    for label, arr, ga in checks:
        # check the LARGEST-gradient entry of every parameter — fixed
        # coordinates can land on ~1e-10 entries below the
        # central-difference noise floor
        c = np.unravel_index(np.argmax(np.abs(ga)), ga.shape)
        orig = arr[c]
        arr[c] = orig + eps
        lp = loss_fn()
        arr[c] = orig - eps
        lm = loss_fn()
        arr[c] = orig
        num = (lp - lm) / (2 * eps)
        ana = ga[c]
        denom = max(1e-8, abs(num), abs(ana))
        assert abs(num - ana) < 1e-8 + 1e-4 * denom, (label, c, num, ana)


def test_training_learns_token_overlap_rule(tmp_path):
    """A synthetic task with the flagship's actual structure — label 1
    iff the two segments share a 'context' token — is learned to high
    accuracy from scratch, and the artifact round-trips."""
    from sbb_ned_ray.models.bert_train import (
        Adam,
        predict_p1,
    )

    rng = np.random.default_rng(9)
    V, L, N = 120, 16, 1500
    ids = np.zeros((N, L), dtype=np.int64)
    segs = np.zeros((N, L), dtype=np.int64)
    mask = np.ones((N, L), dtype=np.int64)
    y = rng.integers(0, 2, size=N)
    half = L // 2
    for i in range(N):
        a = rng.integers(10, V, size=half)
        b = rng.integers(10, V, size=L - half)
        if y[i] == 1:
            b[rng.integers(0, L - half)] = a[rng.integers(0, half)]
        else:
            # force disjoint token sets
            b = np.where(np.isin(b, a), (b + 37) % (V - 10) + 10, b)
            y[i] = 0 if len(set(a) & set(b)) == 0 else 1
        ids[i, :half] = a
        ids[i, half:] = b
        segs[i, half:] = 1
    m = NumpyMiniBert(vocab_size=V, d=24, n_layers=2, n_heads=2,
                      max_len=L, seed=11)
    # lexical-copy attention prior: without it a from-scratch tiny
    # transformer memorizes instead of learning the matching circuit
    # (measured: eval acc 0.45 at lam=0 vs 0.99 at lam=2)
    for ly in m.layers:
        ly["lam"][:] = 2.0
    opt = Adam(m, lr=2e-3)
    tr, ev = np.arange(0, 1200), np.arange(1200, N)
    order_rng = np.random.default_rng(4)
    for ep in range(30):
        order = order_rng.permutation(tr)
        for s in range(0, len(order), 64):
            idx = order[s:s + 64]
            logits, cache = forward_cached(m, ids[idx], mask[idx],
                                           segs[idx])
            _, dlog = softmax_xent(logits.astype(np.float64), y[idx])
            grads = backward(m, cache, dlog.astype(np.float32))
            opt.step(m, grads)
    p1 = predict_p1(m, ids[ev], mask[ev], segs[ev])
    acc = ((p1 >= 0.5) == (y[ev] == 1)).mean()
    assert acc >= 0.9, acc

    path = str(tmp_path / "mini.npz")
    save_mini_bert(m, path, vocab_fingerprint="abc")
    m2 = load_mini_bert(path)
    np.testing.assert_allclose(
        m.forward(ids[:8], mask[:8], segs[:8]),
        m2.forward(ids[:8], mask[:8], segs[:8]), rtol=1e-6)


def test_load_rejects_wrong_format_version(tmp_path):
    import json

    m = NumpyMiniBert(vocab_size=30, d=8, n_layers=1, n_heads=2,
                      max_len=8)
    path = str(tmp_path / "m.npz")
    save_mini_bert(m, path)
    with open(path + ".json") as f:
        mf = json.load(f)
    mf["format_version"] = 99
    with open(path + ".json", "w") as f:
        json.dump(mf, f)
    with pytest.raises(ValueError, match="format_version"):
        load_mini_bert(path)
