"""Decider model: train / persist / apply the per-candidate linking
classifier.

Reference ``models/decider.py:178-226``: a RandomForest is trained on
per-candidate statistics of the pair scores with **GroupKFold**
cross-validation grouped by mention (no mention's candidates leak
across folds) and the ROC-AUC per fold is logged; at serving time its
``predict_proba`` replaces the raw ``p1_max`` as ``proba_1``
(``decider.py:14-79``).

sklearn is not available in this container, so the estimator is
:class:`NumpyRandomForest` — bagged CART trees (gini, sqrt-feature
subsampling, seeded bootstrap) with the sklearn ``fit`` /
``predict_proba`` surface, so a real ``sklearn.ensemble.
RandomForestClassifier`` drops in unchanged wherever the pickle is
loaded.  NaN features are mapped to a sentinel before splitting
(consistent in fit and predict).
"""

from __future__ import annotations

import pickle

import numpy as np

_NAN_SENTINEL = -1e12


def _clean(X: np.ndarray) -> np.ndarray:
    X = np.asarray(X, dtype=np.float64)
    return np.where(np.isnan(X), _NAN_SENTINEL, X)


class _Cart:
    """One CART tree (gini), arrays-of-nodes representation."""

    def __init__(self, max_depth: int = 8, min_leaf: int = 2,
                 n_sub_features: int | None = None, seed: int = 0):
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.n_sub = n_sub_features
        self.rng = np.random.default_rng(seed)
        self.feat: list[int] = []
        self.thresh: list[float] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.value: list[float] = []   # P(y=1) at node (leaf payload)

    def _best_split(self, X, y):
        n, f = X.shape
        feats = self.rng.permutation(f)[:self.n_sub or f]
        best = (None, None, 0.0)   # (feat, thresh, gain)
        parent_p = y.mean()
        parent_gini = 2 * parent_p * (1 - parent_p)
        for j in feats:
            order = np.argsort(X[:, j], kind="mergesort")
            xs, ys = X[order, j], y[order]
            cum1 = np.cumsum(ys)
            tot1 = cum1[-1]
            idx = np.nonzero(np.diff(xs))[0]    # split BETWEEN values
            if idx.size == 0:
                continue
            nl = idx + 1
            nr = n - nl
            ok = (nl >= self.min_leaf) & (nr >= self.min_leaf)
            if not ok.any():
                continue
            nl, nr, i = nl[ok], nr[ok], idx[ok]
            p_l = cum1[i] / nl
            p_r = (tot1 - cum1[i]) / nr
            gini = (nl * 2 * p_l * (1 - p_l)
                    + nr * 2 * p_r * (1 - p_r)) / n
            gain = parent_gini - gini
            k = int(np.argmax(gain))
            if gain[k] > best[2] + 1e-12:
                best = (int(j), float((xs[i[k]] + xs[i[k] + 1]) / 2),
                        float(gain[k]))
        return best

    def _grow(self, X, y, depth) -> int:
        node = len(self.feat)
        self.feat.append(-1)
        self.thresh.append(0.0)
        self.left.append(-1)
        self.right.append(-1)
        self.value.append(float(y.mean()) if len(y) else 0.0)
        if depth >= self.max_depth or len(y) < 2 * self.min_leaf \
                or y.min() == y.max():
            return node
        j, t, gain = self._best_split(X, y)
        if j is None or gain <= 0:
            return node
        mask = X[:, j] <= t
        self.feat[node] = j
        self.thresh[node] = t
        self.left[node] = self._grow(X[mask], y[mask], depth + 1)
        self.right[node] = self._grow(X[~mask], y[~mask], depth + 1)
        return node

    def fit(self, X, y):
        self._grow(X, y, 0)
        self.feat_a = np.asarray(self.feat, dtype=np.int32)
        self.thresh_a = np.asarray(self.thresh)
        self.left_a = np.asarray(self.left, dtype=np.int32)
        self.right_a = np.asarray(self.right, dtype=np.int32)
        self.value_a = np.asarray(self.value)
        return self

    def predict_p1(self, X) -> np.ndarray:
        n = X.shape[0]
        node = np.zeros(n, dtype=np.int32)
        active = self.feat_a[node] >= 0
        while active.any():
            idx = np.nonzero(active)[0]
            nd = node[idx]
            go_left = X[idx, self.feat_a[nd]] <= self.thresh_a[nd]
            node[idx] = np.where(go_left, self.left_a[nd],
                                 self.right_a[nd])
            active = self.feat_a[node] >= 0
        return self.value_a[node]


class NumpyRandomForest:
    """Bagged CART forest with the sklearn classifier surface
    (``fit(X, y)`` / ``predict_proba(X) → (n, 2)``)."""

    def __init__(self, n_estimators: int = 20, max_depth: int = 8,
                 min_leaf: int = 2, seed: int = 42):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.min_leaf = min_leaf
        self.seed = seed
        self.trees: list[_Cart] = []

    def fit(self, X, y):
        X = _clean(X)
        y = np.asarray(y, dtype=np.float64)
        n, f = X.shape
        n_sub = max(1, int(np.sqrt(f)))
        rng = np.random.default_rng(self.seed)
        self.trees = []
        for i in range(self.n_estimators):
            boot = rng.integers(0, n, n)
            t = _Cart(self.max_depth, self.min_leaf, n_sub,
                      seed=int(rng.integers(0, 2**31)))
            t.fit(X[boot], y[boot])
            self.trees.append(t)
        return self

    def predict_proba(self, X) -> np.ndarray:
        X = _clean(X)
        p1 = np.mean([t.predict_p1(X) for t in self.trees], axis=0)
        return np.column_stack([1.0 - p1, p1])


def roc_auc(y_true, p1) -> float:
    """Rank-based ROC-AUC (Mann-Whitney U with midranks for ties)."""
    y = np.asarray(y_true, dtype=np.float64)
    p = np.asarray(p1, dtype=np.float64)
    n1 = int(y.sum())
    n0 = len(y) - n1
    if n1 == 0 or n0 == 0:
        return float("nan")
    order = np.argsort(p, kind="mergesort")
    ranks = np.empty(len(p))
    ranks[order] = np.arange(1, len(p) + 1)
    # midranks for ties
    sp = p[order]
    i = 0
    while i < len(sp):
        j = i
        while j + 1 < len(sp) and sp[j + 1] == sp[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    u = ranks[y == 1].sum() - n1 * (n1 + 1) / 2.0
    return float(u / (n1 * n0))


def group_kfold(groups, n_folds: int = 5):
    """Deterministic GroupKFold: unique groups round-robined over folds
    in first-appearance order; yields (train_idx, test_idx) with no
    group in both."""
    groups = np.asarray(groups)
    uniq, first = np.unique(groups, return_index=True)
    uniq = uniq[np.argsort(first)]          # first-appearance order
    fold_of = {g: i % n_folds for i, g in enumerate(uniq)}
    fold_arr = np.array([fold_of[g] for g in groups])
    for k in range(n_folds):
        test = np.nonzero(fold_arr == k)[0]
        train = np.nonzero(fold_arr != k)[0]
        if len(test) and len(train):
            yield train, test


def train_decider(X, y, groups, n_folds: int = 5,
                  **forest_kwargs) -> tuple[NumpyRandomForest, list[float]]:
    """GroupKFold CV (ROC-AUC per fold, reference
    ``models/decider.py:204-226``) then a final fit on ALL data.
    Returns (fitted model, fold scores)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y)
    scores = []
    for train_idx, test_idx in group_kfold(groups, n_folds):
        m = NumpyRandomForest(**forest_kwargs).fit(X[train_idx],
                                                   y[train_idx])
        scores.append(roc_auc(y[test_idx],
                              m.predict_proba(X[test_idx])[:, 1]))
    final = NumpyRandomForest(**forest_kwargs).fit(X, y)
    return final, scores


def save_decider(model, feature_names: list[str], cv_scores: list[float],
                 path: str) -> None:
    import json
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"model": model, "feature_names": feature_names,
                     "cv_scores": cv_scores}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    import os as _os
    _os.replace(tmp, path)
    with open(path + ".json", "w") as f:
        json.dump({"feature_names": feature_names,
                   "cv_scores": cv_scores}, f)


def load_decider(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
