"""B-cubed / adjusted-Rand from the distributed contingency table:
pinned to O(n²) per-item / per-pair brute-force references on
handcrafted and random clusterings, plus the degenerate conventions."""

import numpy as np
import pandas as pd
import ray.data

from sbb_ned_ray.stages.cluster import (adjusted_rand_from_cells,
                                        bcubed_from_cells,
                                        contingency_cells)


def _cells(pred, gold):
    n = len(pred)
    keys = [f"k{i}" for i in range(n)]
    pds = ray.data.from_pandas(pd.DataFrame({"key": keys, "label": pred}))
    gds = ray.data.from_pandas(pd.DataFrame({"key": keys, "label": gold}))
    return contingency_cells(pds, gds, nparts=4).to_pandas()


def _brute_bcubed(pred, gold):
    n = len(pred)
    P = R = 0.0
    for i in range(n):
        ci = {j for j in range(n) if pred[j] == pred[i]}
        gi = {j for j in range(n) if gold[j] == gold[i]}
        inter = len(ci & gi)
        P += inter / len(ci)
        R += inter / len(gi)
    return P / n, R / n


def _brute_ari(pred, gold):
    n = len(pred)
    a = b = both = 0
    npairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            npairs += 1
            sp = pred[i] == pred[j]
            sg = gold[i] == gold[j]
            a += sp
            b += sg
            both += sp and sg
    expected = a * b / npairs
    mx = (a + b) / 2.0
    if mx == expected:
        return 1.0 if both == expected else 0.0
    return (both - expected) / (mx - expected)


def test_contingency_matches_crosstab():
    rng = np.random.RandomState(2)
    pred = [f"p{v}" for v in rng.randint(4, size=60)]
    gold = [f"g{v}" for v in rng.randint(3, size=60)]
    cells = _cells(pred, gold)
    ct = pd.crosstab(pd.Series(pred, name="pred"),
                     pd.Series(gold, name="gold")).stack()
    ct = ct[ct > 0]
    got = {(p, g): int(n) for p, g, n in
           zip(cells["pred"], cells["gold"], cells["n"])}
    assert got == {k: int(v) for k, v in ct.items()}


def test_metrics_match_bruteforce_random():
    rng = np.random.RandomState(9)
    pred = [f"p{v}" for v in rng.randint(5, size=40)]
    gold = [f"g{v}" for v in rng.randint(4, size=40)]
    cells = _cells(pred, gold)
    b = bcubed_from_cells(cells)
    bp, br = _brute_bcubed(pred, gold)
    assert abs(b["precision"] - bp) < 1e-12
    assert abs(b["recall"] - br) < 1e-12
    assert abs(adjusted_rand_from_cells(cells)
               - _brute_ari(pred, gold)) < 1e-12


def test_perfect_clustering_is_exactly_one():
    gold = [f"g{v}" for v in np.random.RandomState(1).randint(6, size=50)]
    cells = _cells(gold, gold)
    assert bcubed_from_cells(cells) == {"precision": 1.0, "recall": 1.0,
                                        "f1": 1.0}
    assert adjusted_rand_from_cells(cells) == 1.0


def test_degenerate_conventions():
    # all-singletons pred vs one gold cluster: B³ precision 1, low recall
    pred = [f"p{i}" for i in range(8)]
    gold = ["g"] * 8
    cells = _cells(pred, gold)
    b = bcubed_from_cells(cells)
    assert b["precision"] == 1.0 and abs(b["recall"] - 1 / 8) < 1e-12
    # identical trivial clusterings → ARI 1.0 by convention
    assert adjusted_rand_from_cells(_cells(gold, gold)) == 1.0
