"""Cross-encoder training: fit :class:`NumpyMiniBert` on labeled
sentence pairs.

Reference semantics: ``models/bert.py:35-228`` (model/optimizer setup)
and the fine-tune loop ``models/bert.py:342-480`` — batches of
feature-converted sentence pairs, cross-entropy on the 2-way CLS head,
seeded shuffling, eval on a held-out split.  The torch machinery is
replaced by explicit numpy backprop through the SAME forward graph as
:meth:`NumpyMiniBert.forward` (token/position/segment embeddings,
multi-head masked attention, residual layer-norm blocks, GELU FFN, CLS
head), verified against numerical gradients in
``tests/test_bert_train.py``.

Artifact: :func:`save_mini_bert` / :func:`load_mini_bert` persist the
weights as ``.npz`` + a JSON manifest (dims, vocab fingerprint) — the
same fingerprinted-artifact discipline as the decider model and the
IVF centroids.  :class:`~sbb_ned_ray.stages.bert_scorer.BertPairScorer`
loads it via ``config.extra["bert_numpy_model_path"]``.

Scale note: the loop consumes the features Dataset via
``iter_batches`` (materialized once, streamed per epoch from the
object store) — data-parallel multi-worker training (per-worker grads
+ allreduce) is the standard extension and out of scope for a
single-node fit.
"""

from __future__ import annotations

import json
import os

import numpy as np

from sbb_ned_ray.stages.bert_scorer import NumpyMiniBert


_GC = np.float32(np.sqrt(2.0 / np.pi))
_GA = np.float32(0.044715)
_HALF = np.float32(0.5)
_ONE = np.float32(1.0)
_3GA = np.float32(3 * 0.044715)


def _gelu_tanh(x):
    """→ (gelu(x), tanh-part) — the tanh is cached for the backward."""
    x2 = x * x
    t = np.tanh(_GC * (x + _GA * (x2 * x)))
    return _HALF * x * (_ONE + t), t


def _gelu(x):
    return _gelu_tanh(x)[0]


def _gelu_grad(x, t=None):
    """d gelu/dx; ``t`` = the cached tanh from :func:`_gelu_tanh`."""
    x2 = x * x
    if t is None:
        t = np.tanh(_GC * (x + _GA * (x2 * x)))
    return _HALF * (_ONE + t) + _HALF * x * (_ONE - t * t) \
        * _GC * (_ONE + _3GA * x2)


def _ln_forward(x, g, b, eps=1e-6):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * g + b, (xhat, inv)


def _ln_backward(dy, g, cache):
    """Layer-norm backward over the last axis."""
    xhat, inv = cache
    dg = (dy * xhat).sum(axis=tuple(range(dy.ndim - 1)))
    db = dy.sum(axis=tuple(range(dy.ndim - 1)))
    dxhat = dy * g
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dg, db


def forward_cached(model: NumpyMiniBert, ids, mask, segs):
    """Same computation as :meth:`NumpyMiniBert.forward`, returning
    (logits, cache) with every intermediate the backward pass needs."""
    n, L = ids.shape
    d, h = model.d, model.h
    hd = d // h
    x = model.tok_emb[ids] + model.pos_emb[:L][None, :, :] \
        + model.seg_emb[segs]
    neg = (1.0 - mask.astype(x.dtype)) * -1e9
    att_bias = neg[:, None, None, :]
    eq = (ids[:, :, None] == ids[:, None, :]).astype(x.dtype)[:, None]
    caches = []
    for ly in model.layers:
        xi = x
        q = (xi @ ly["wq"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
        k = (xi @ ly["wk"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
        v = (xi @ ly["wv"]).reshape(n, L, h, hd).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd) + att_bias
        scores += ly["lam"][None, :, None, None] * eq
        scores -= scores.max(axis=-1, keepdims=True)
        a = np.exp(scores)
        a /= a.sum(axis=-1, keepdims=True)
        ctx = (a @ v).transpose(0, 2, 1, 3).reshape(n, L, d)
        o = ctx @ ly["wo"]
        x1, ln1c = _ln_forward(xi + o, ly["ln1_g"], ly["ln1_b"])
        f1 = x1 @ ly["w1"] + ly["b1"]
        gact, gtanh = _gelu_tanh(f1)
        f2 = gact @ ly["w2"] + ly["b2"]
        x2, ln2c = _ln_forward(x1 + f2, ly["ln2_g"], ly["ln2_b"])
        caches.append({"xi": xi, "q": q, "k": k, "v": v, "a": a,
                       "ctx": ctx, "ln1c": ln1c, "x1": x1, "f1": f1,
                       "gtanh": gtanh, "gact": gact, "ln2c": ln2c})
        x = x2
    logits = x[:, 0, :] @ model.head + model.head_b
    cache = {"ids": ids, "segs": segs, "L": L, "x_final": x,
             "eq": eq, "layers": caches}
    return logits, cache


def backward(model: NumpyMiniBert, cache, dlogits):
    """dlogits (n, 2) → grads dict mirroring the model's parameters."""
    n = dlogits.shape[0]
    d, h = model.d, model.h
    hd = d // h
    L = cache["L"]
    x_final = cache["x_final"]
    grads = {"head": x_final[:, 0, :].T @ dlogits,
             "head_b": dlogits.sum(axis=0),
             "layers": []}
    dx = np.zeros_like(x_final)
    dx[:, 0, :] = dlogits @ model.head.T
    for ly, c in zip(reversed(model.layers), reversed(cache["layers"])):
        g = {}
        # LN2
        dr2, g["ln2_g"], g["ln2_b"] = _ln_backward(dx, ly["ln2_g"],
                                                   c["ln2c"])
        dx1 = dr2.copy()          # residual branch
        df2 = dr2
        # FFN
        g["w2"] = c["gact"].reshape(-1, 4 * d).T @ df2.reshape(-1, d)
        g["b2"] = df2.sum(axis=(0, 1))
        dgact = df2 @ ly["w2"].T
        df1 = dgact * _gelu_grad(c["f1"], c["gtanh"])
        g["w1"] = c["x1"].reshape(-1, d).T @ df1.reshape(-1, 4 * d)
        g["b1"] = df1.sum(axis=(0, 1))
        dx1 += df1 @ ly["w1"].T
        # LN1
        dr1, g["ln1_g"], g["ln1_b"] = _ln_backward(dx1, ly["ln1_g"],
                                                   c["ln1c"])
        dxi = dr1.copy()          # residual branch
        do = dr1
        # attention output proj
        g["wo"] = c["ctx"].reshape(-1, d).T @ do.reshape(-1, d)
        dctx = (do @ ly["wo"].T).reshape(n, L, h, hd) \
            .transpose(0, 2, 1, 3)
        # attention
        da = dctx @ c["v"].transpose(0, 1, 3, 2)
        dv = c["a"].transpose(0, 1, 3, 2) @ dctx
        ds = c["a"] * (da - (da * c["a"]).sum(axis=-1, keepdims=True))
        g["lam"] = (ds * cache["eq"]).sum(axis=(0, 2, 3))
        scale = 1.0 / np.sqrt(hd)
        dq = (ds @ c["k"]) * scale
        dk = (ds.transpose(0, 1, 3, 2) @ c["q"]) * scale
        for name, dhead_ in (("wq", dq), ("wk", dk), ("wv", dv)):
            dflat = dhead_.transpose(0, 2, 1, 3).reshape(n, L, d)
            g[name] = c["xi"].reshape(-1, d).T @ dflat.reshape(-1, d)
            dxi += dflat @ ly[name].T
        grads["layers"].append(g)
        dx = dxi
    grads["layers"].reverse()
    # embeddings (scatter-add)
    grads["tok_emb"] = np.zeros_like(model.tok_emb)
    np.add.at(grads["tok_emb"], cache["ids"], dx)
    grads["pos_emb"] = np.zeros_like(model.pos_emb)
    grads["pos_emb"][:L] = dx.sum(axis=0)
    grads["seg_emb"] = np.zeros_like(model.seg_emb)
    np.add.at(grads["seg_emb"], cache["segs"], dx)
    return grads


def _param_items(model):
    yield "tok_emb", model.tok_emb
    yield "pos_emb", model.pos_emb
    yield "seg_emb", model.seg_emb
    yield "head", model.head
    yield "head_b", model.head_b
    for i, ly in enumerate(model.layers):
        for k, v in ly.items():
            yield f"layers.{i}.{k}", v


def _grad_items(grads):
    for k in ("tok_emb", "pos_emb", "seg_emb", "head", "head_b"):
        yield k, grads[k]
    for i, g in enumerate(grads["layers"]):
        for k, v in g.items():
            yield f"layers.{i}.{k}", v


class Adam:
    def __init__(self, model, lr=1e-3, beta1=0.9, beta2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, beta1, beta2, eps
        self.t = 0
        self.m = {k: np.zeros_like(v) for k, v in _param_items(model)}
        self.v = {k: np.zeros_like(v) for k, v in _param_items(model)}

    def step(self, model, grads):
        self.t += 1
        params = dict(_param_items(model))
        for k, g in _grad_items(grads):
            m = self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            v = self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mh = m / (1 - self.b1 ** self.t)
            vh = v / (1 - self.b2 ** self.t)
            params[k] -= (self.lr * mh / (np.sqrt(vh) + self.eps)) \
                .astype(params[k].dtype)


def softmax_xent(logits, y):
    """→ (mean loss, dlogits). y: int array of 0/1 labels."""
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=1, keepdims=True)
    n = len(y)
    loss = -np.log(np.clip(p[np.arange(n), y], 1e-12, None)).mean()
    d = p.copy()
    d[np.arange(n), y] -= 1.0
    return loss, d / n


def train_mini_bert(features_ds, model: NumpyMiniBert | None = None,
                    epochs: int = 8, lr: float = 1e-3,
                    batch_size: int = 64, seed: int = 7,
                    eval_buckets: int = 1, n_buckets: int = 10,
                    objective: str = "group", lr_decay: float = 0.5,
                    log=None):
    """Fit a mini cross-encoder on a features Dataset.

    ``features_ds``: Ray Dataset with ``input_ids`` / ``input_mask`` /
    ``segment_ids`` (fixed-size int lists) + ``label`` + ``mention_key``
    (+ ``candidate_title``/``qid`` for the group objective) columns —
    the :func:`convert_pairs_to_features` output over labeled training
    pairs.  Held-out split: ``hash(mention_key) % n_buckets <
    eval_buckets`` — grouped by MENTION so no mention leaks across the
    split (the GroupKFold discipline of the decider trainer).

    ``objective``:

    * ``"group"`` (default) — multiple-instance BCE at the (mention,
      candidate) level: per-group score = logsumexp over that
      candidate's evidence-window pair scores, matching the decide
      step's ``p1_max`` aggregation.  Pair-level labels are NOISY (a
      gold candidate's evidence windows need not all overlap the query
      context — only their union does), group-level labels are clean,
      so this is the objective that can reach group-AUC ≈ 1.
    * ``"pair"`` — plain per-pair cross-entropy (the reference's
      ``models/bert.py:342-480`` loss shape).

    Returns ``(model, history)`` where history has per-epoch train loss
    and held-out metrics (group AUC/acc for ``"group"``).
    """
    import hashlib

    from sbb_ned_ray.models.decider_model import roc_auc

    # collected once into numpy: the training-pair set is bounded by
    # construction (equalized pairs per gold mention); a corpus-scale
    # fit would stream iter_batches per epoch instead
    feats = features_ds.materialize()
    ids_l, mask_l, segs_l, y_l, key_l, grp_l = [], [], [], [], [], []
    for b in feats.iter_batches(batch_size=4096, batch_format="numpy"):
        ids_l.append(np.stack(b["input_ids"]).astype(np.int64))
        mask_l.append(np.stack(b["input_mask"]).astype(np.float32))
        segs_l.append(np.stack(b["segment_ids"]).astype(np.int64))
        y_l.append(np.asarray(b["label"], dtype=np.int64))
        key_l.extend(str(k) for k in b["mention_key"])
        if objective in ("group", "rank"):
            # \x1e separator: mention_key itself contains \x1f
            grp_l.extend(
                f"{k}\x1e{t}\x1e{q}" for k, t, q in
                zip(b["mention_key"], b["candidate_title"], b["qid"]))
    ids = np.concatenate(ids_l)
    mask = np.concatenate(mask_l)
    segs = np.concatenate(segs_l)
    y = np.concatenate(y_l)
    bucket = np.array([int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
                       % n_buckets for k in key_l])
    is_eval = bucket < eval_buckets

    if model is None:
        model = NumpyMiniBert(max_len=max(512, ids.shape[1]))
    opt = Adam(model, lr=lr)
    rng = np.random.default_rng(seed)
    history = []

    if objective in ("group", "rank"):
        # rows grouped by (mention, candidate); row order inside a
        # group is the evidence-window order
        uniq, grp = np.unique(np.asarray(grp_l), return_inverse=True)
        order_rows = np.argsort(grp, kind="stable")
        grp_sorted = grp[order_rows]
        starts = np.searchsorted(grp_sorted, np.arange(len(uniq)))
        ends = np.append(starts[1:], len(grp_sorted))
        g_rows = [order_rows[s:e] for s, e in zip(starts, ends)]
        g_y = np.array([int(y[r[0]]) for r in g_rows])
        g_eval = np.array([bool(is_eval[r[0]]) for r in g_rows])
        tr_g = np.where(~g_eval)[0]
        ev_g = np.where(g_eval)[0]

    if objective == "rank":
        return _train_rank(model, opt, rng, ids, mask, segs,
                           uniq, g_rows, g_y, g_eval, epochs, lr,
                           lr_decay, batch_size, history, log)

    if objective == "group":
        def group_step(gidx, train=True):
            rows = np.concatenate([g_rows[g] for g in gidx])
            sizes = np.array([len(g_rows[g]) for g in gidx])
            gid = np.repeat(np.arange(len(gidx)), sizes)
            if train:
                logits, cache = forward_cached(
                    model, ids[rows], mask[rows], segs[rows])
            else:
                logits = model.forward(ids[rows], mask[rows], segs[rows])
                cache = None
            s = (logits[:, 1] - logits[:, 0]).astype(np.float64)
            # per-group logsumexp (smooth max) + softmax weights
            mx = np.full(len(gidx), -np.inf)
            np.maximum.at(mx, gid, s)
            ex = np.exp(s - mx[gid])
            sm = np.zeros(len(gidx))
            np.add.at(sm, gid, ex)
            m_g = mx + np.log(sm)
            yb = g_y[gidx].astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-m_g))
            loss = -(yb * np.log(np.clip(p, 1e-12, None))
                     + (1 - yb) * np.log(np.clip(1 - p, 1e-12, None))
                     ).mean()
            if not train:
                return loss, m_g
            dm = (p - yb) / len(gidx)
            ds = dm[gid] * (ex / sm[gid])
            dlog = np.zeros_like(logits, dtype=np.float64)
            dlog[:, 1] = ds
            dlog[:, 0] = -ds
            grads = backward(model, cache, dlog.astype(np.float32))
            opt.step(model, grads)
            return loss, m_g

        groups_per_batch = max(2, batch_size // 4)
        for ep in range(epochs):
            opt.lr = lr * (lr_decay ** (ep / max(1, epochs - 1)))
            order = rng.permutation(tr_g)
            tot_loss, nb = 0.0, 0
            for st in range(0, len(order), groups_per_batch):
                loss, _ = group_step(order[st:st + groups_per_batch])
                tot_loss += loss
                nb += 1
            rec = {"epoch": ep, "train_loss": tot_loss / max(1, nb)}
            if len(ev_g):
                scores = []
                for st in range(0, len(ev_g), 64):
                    _, m_g = group_step(ev_g[st:st + 64], train=False)
                    scores.append(m_g)
                sc = np.concatenate(scores)
                ye = g_y[ev_g]
                rec["eval_group_acc"] = float(
                    ((sc >= 0.0) == (ye == 1)).mean())
                rec["eval_group_auc"] = float(roc_auc(ye, sc))
            history.append(rec)
            if log:
                log(rec)
        return model, history

    tr = np.where(~is_eval)[0]
    ev = np.where(is_eval)[0]
    for ep in range(epochs):
        opt.lr = lr * (lr_decay ** (ep / max(1, epochs - 1)))
        order = rng.permutation(tr)
        tot_loss, nb = 0.0, 0
        for s in range(0, len(order), batch_size):
            idx = order[s:s + batch_size]
            logits, cache = forward_cached(model, ids[idx], mask[idx],
                                           segs[idx])
            loss, dlog = softmax_xent(logits.astype(np.float64), y[idx])
            grads = backward(model, cache, dlog.astype(np.float32))
            opt.step(model, grads)
            tot_loss += loss
            nb += 1
        rec = {"epoch": ep, "train_loss": tot_loss / max(1, nb)}
        if len(ev):
            p1 = predict_p1(model, ids[ev], mask[ev], segs[ev])
            rec["eval_acc"] = float(((p1 >= 0.5) == (y[ev] == 1)).mean())
            rec["eval_auc"] = float(roc_auc(y[ev], p1))
        history.append(rec)
        if log:
            log(rec)
    return model, history


def _train_rank(model, opt, rng, ids, mask, segs, uniq, g_rows, g_y,
                g_eval, epochs, lr, lr_decay, batch_size, history, log,
                bce_weight: float = 0.2):
    """Per-mention ranking objective: softmax-CE over each mention's
    candidate groups (group score = logsumexp over its evidence-window
    pair scores) + ``bce_weight`` · group-level BCE for absolute-scale
    calibration (the decide step thresholds ``p1_max``, not just the
    argmax).  This is the objective aligned with the decision rule: a
    mention links correctly iff its GOLD candidate outscores every
    other candidate."""
    from sbb_ned_ray.models.decider_model import roc_auc

    mention_of_group = np.array([u.split("\x1e", 1)[0] for u in uniq])
    men_keys, men_of = np.unique(mention_of_group, return_inverse=True)
    # mentions whose gold group exists and which have >1 candidate
    n_m = len(men_keys)
    men_groups: list[list[int]] = [[] for _ in range(n_m)]
    for g, m in enumerate(men_of):
        men_groups[m].append(g)
    has_gold = np.zeros(n_m, bool)
    for m, gs in enumerate(men_groups):
        has_gold[m] = any(g_y[g] == 1 for g in gs)
    m_eval = np.array([g_eval[gs[0]] for gs in men_groups])
    tr_m = np.where(has_gold & ~m_eval)[0]
    ev_m = np.where(has_gold & m_eval)[0]

    def rank_step(men_idx, train=True):
        gidx = np.concatenate([men_groups[m] for m in men_idx])
        g_sizes = np.array([len(g_rows[g]) for g in gidx])
        rows = np.concatenate([g_rows[g] for g in gidx])
        gid = np.repeat(np.arange(len(gidx)), g_sizes)
        m_sizes = np.array([len(men_groups[m]) for m in men_idx])
        mid = np.repeat(np.arange(len(men_idx)), m_sizes)  # per group
        if train:
            logits, cache = forward_cached(model, ids[rows], mask[rows],
                                           segs[rows])
        else:
            logits = model.forward(ids[rows], mask[rows], segs[rows])
            cache = None
        s = (logits[:, 1] - logits[:, 0]).astype(np.float64)
        # group logsumexp over windows
        mx = np.full(len(gidx), -np.inf)
        np.maximum.at(mx, gid, s)
        ex = np.exp(s - mx[gid])
        sm = np.zeros(len(gidx))
        np.add.at(sm, gid, ex)
        m_g = mx + np.log(sm)
        yg = g_y[gidx].astype(np.float64)
        # mention softmax over groups
        mmx = np.full(len(men_idx), -np.inf)
        np.maximum.at(mmx, mid, m_g)
        mex = np.exp(m_g - mmx[mid])
        msm = np.zeros(len(men_idx))
        np.add.at(msm, mid, mex)
        p_men = mex / msm[mid]           # per group: P(candidate | mention)
        gold_p = np.zeros(len(men_idx))
        np.add.at(gold_p, mid, p_men * yg)
        loss = -np.log(np.clip(gold_p, 1e-12, None)).mean()
        # top-1 accuracy per mention
        top = np.zeros(len(men_idx), dtype=np.int64)
        best = np.full(len(men_idx), -np.inf)
        for i_g in range(len(gidx)):       # small: groups per batch
            m = mid[i_g]
            if m_g[i_g] > best[m]:
                best[m] = m_g[i_g]
                top[m] = i_g
        acc = float(yg[top].mean()) if len(men_idx) else 0.0
        if not train:
            return loss, acc, m_g, yg
        dm = (p_men - yg) / len(men_idx)
        # calibration BCE on group scores
        pb = 1.0 / (1.0 + np.exp(-m_g))
        dm = dm + bce_weight * (pb - yg) / len(gidx)
        ds = dm[gid] * (ex / sm[gid])
        dlog = np.zeros_like(logits, dtype=np.float64)
        dlog[:, 1] = ds
        dlog[:, 0] = -ds
        grads = backward(model, cache, dlog.astype(np.float32))
        opt.step(model, grads)
        return loss, acc, m_g, yg

    mentions_per_batch = max(1, batch_size // 32)
    for ep in range(epochs):
        opt.lr = lr * (lr_decay ** (ep / max(1, epochs - 1)))
        order = rng.permutation(tr_m)
        tot_loss, tot_acc, nb = 0.0, 0.0, 0
        for st in range(0, len(order), mentions_per_batch):
            loss, acc, _, _ = rank_step(order[st:st + mentions_per_batch])
            tot_loss += loss
            tot_acc += acc
            nb += 1
        rec = {"epoch": ep, "train_loss": tot_loss / max(1, nb),
               "train_top1": tot_acc / max(1, nb)}
        if len(ev_m):
            accs, scores, ys = [], [], []
            for st in range(0, len(ev_m), 16):
                _, acc, m_g, yg = rank_step(ev_m[st:st + 16], train=False)
                accs.append(acc * len(ev_m[st:st + 16]))
                scores.append(m_g)
                ys.append(yg)
            rec["eval_top1"] = float(sum(accs) / len(ev_m))
            rec["eval_group_auc"] = float(
                roc_auc(np.concatenate(ys), np.concatenate(scores)))
        history.append(rec)
        if log:
            log(rec)
    return model, history


def predict_p1(model, ids, mask, segs, chunk: int = 512):
    out = []
    for s in range(0, len(ids), chunk):
        logits = model.forward(ids[s:s + chunk], mask[s:s + chunk],
                               segs[s:s + chunk]).astype(np.float64)
        score = logits[:, 1] - logits[:, 0]
        out.append(1.0 / (1.0 + np.exp(-score)))
    return np.concatenate(out) if out else np.zeros(0)


# -- artifact ---------------------------------------------------------------

MINIBERT_FORMAT_VERSION = 1


def save_mini_bert(model: NumpyMiniBert, path: str,
                   vocab_fingerprint: str | None = None,
                   history: list | None = None) -> None:
    """``path`` is the ``.npz`` file; a JSON manifest lands next to it."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = dict(_param_items(model))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    with open(path + ".json", "w") as f:
        json.dump({"format_version": MINIBERT_FORMAT_VERSION,
                   "d": model.d, "n_heads": model.h,
                   "n_layers": model.n_layers,
                   "vocab_size": int(model.tok_emb.shape[0]),
                   "max_len": int(model.pos_emb.shape[0]),
                   "vocab_fingerprint": vocab_fingerprint,
                   "history": history or []}, f)


def load_mini_bert(path: str) -> NumpyMiniBert:
    with open(path + ".json") as f:
        mf = json.load(f)
    if mf.get("format_version") != MINIBERT_FORMAT_VERSION:
        raise ValueError(f"mini-bert artifact {path}: format_version "
                         f"{mf.get('format_version')} != "
                         f"{MINIBERT_FORMAT_VERSION}")
    model = NumpyMiniBert(vocab_size=mf["vocab_size"], d=mf["d"],
                          n_layers=mf["n_layers"], n_heads=mf["n_heads"],
                          max_len=mf["max_len"])
    with np.load(path) as z:
        model.tok_emb = z["tok_emb"]
        model.pos_emb = z["pos_emb"]
        model.seg_emb = z["seg_emb"]
        model.head = z["head"]
        model.head_b = z["head_b"]
        for i, ly in enumerate(model.layers):
            for k in ly:
                key = f"layers.{i}.{k}"
                if key in z:
                    ly[k] = z[key]
                # absent key (e.g. "lam" in a pre-identity-bias
                # artifact) keeps its zero init
    return model
