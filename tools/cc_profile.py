"""Profile the two distributed connected-components algorithms on the
two graph shapes that matter for ER at scale:

* a CHAIN (diameter = n-1): the adversarial shape for min-label
  propagation (needs O(diameter) iterations — a capped run returns
  WRONG labels), and exactly the shape incremental near-dup drift
  produces; the alternating large-star/small-star algorithm converges
  in O(log² n) rounds.
* a STAR FOREST (diameter 2): the shape NED blocking emits — label
  propagation converges in ~2 iterations and is the cheaper choice.

Usage: python tools/cc_profile.py [n_chain] [n_star]

Each cell runs in-process (one Ray session); wall includes the full
Dataset pipeline.  Output: one aligned table + a JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import ray
import ray.data


def chain_edges(n: int) -> pd.DataFrame:
    return pd.DataFrame({"src": np.arange(n - 1, dtype=np.int64),
                         "dst": np.arange(1, n, dtype=np.int64)})


def star_edges(n: int, hubs: int = 50, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    h = rng.integers(0, hubs, n).astype(np.int64)
    return pd.DataFrame({"src": h, "dst": np.arange(hubs, hubs + n,
                                                    dtype=np.int64)})


def run_cell(algo: str, edges: pd.DataFrame, expect: dict) -> dict:
    from sbb_ned_ray.stages.cluster import (
        alternating_components,
        label_propagation_components,
    )
    ds = ray.data.from_pandas(edges).repartition(8).materialize()
    t0 = time.perf_counter()
    if algo == "labelprop":
        out = label_propagation_components(ds)  # default max_iters=12
    else:
        out = alternating_components(ds)
    got = out.to_pandas()
    wall = time.perf_counter() - t0
    lab = dict(zip(got["node"], got["component"]))
    wrong = sum(1 for k, v in expect.items() if lab.get(k) != v)
    return {"algo": algo, "wall_s": round(wall, 2),
            "nodes": len(expect), "wrong_labels": wrong}


def main() -> None:
    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_star = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    cells = []
    ch = chain_edges(n_chain)
    expect_chain = {i: 0 for i in range(n_chain)}
    st = star_edges(n_star)
    from sbb_ned_ray.stages.cluster import driver_union_find
    expect_star = driver_union_find(list(zip(st["src"], st["dst"])))
    for algo in ("labelprop", "altstar"):
        c = run_cell(algo, ch, expect_chain)
        c["graph"] = f"chain(n={n_chain}, diameter={n_chain - 1})"
        cells.append(c)
        s = run_cell(algo, st, expect_star)
        s["graph"] = f"star(n={n_star}, diameter=2)"
        cells.append(s)

    print(f"{'graph':38s} {'algo':10s} {'wall_s':>8s} {'wrong':>6s}")
    for c in cells:
        print(f"{c['graph']:38s} {c['algo']:10s} {c['wall_s']:8.2f} "
              f"{c['wrong_labels']:6d}")
    print(json.dumps({"cells": cells}))
    ray.shutdown()


if __name__ == "__main__":
    main()
