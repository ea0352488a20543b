"""KB-size amortization profile: broadcast vs co-shuffle blocking wall
time at growing KB sizes (default 1 500 / 6 000 / 24 000 entities;
``--sizes 24000,96000`` extends to the 96k point where the estimated
broadcast index approaches the object-store budget and ``run_ned_auto``
genuinely flips) over the same 20k-page input — the evidence that the
shuffle path's fixed join cost amortizes as the KB grows.

Each (size, path) sample runs in a FRESH child process/Ray session
(BASELINE.md measurement discipline); samples are interleaved across
sizes and the per-cell minimum is reported.  The summary row also
records which path the auto selector picks at each size.

Usage: python tools/kb_profile.py [--child N_ENTITIES PATH]
                                  [--samples K] [--sizes A,B,...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (1500, 6000, 24000)
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _fixture(n_entities: int) -> str:
    from sbb_ned_ray.fixtures.generator import FixtureSpec, \
        materialize_fixture
    return materialize_fixture(FixtureSpec(
        n_pages=20_000, n_entities=n_entities,
        n_gt_pairs=8000, n_files=32))


def run_child(n_entities: int, path: str) -> None:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.op_resource_reservation_ratio = 0.0
    import ray.data as rd

    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.pipelines.ned import run_ned, run_ned_shuffle_kb

    d = _fixture(n_entities)
    rd.read_parquet(os.path.join(d, "pages")).count()   # warm page cache
    t0 = time.time()
    if path == "shuffle":
        links = run_ned_shuffle_kb(d, PipelineConfig(), num_partitions=4)
    else:
        links = run_ned(d, PipelineConfig())
    wall = time.time() - t0
    print(json.dumps({"n_entities": n_entities, "path": path,
                      "sec": round(wall, 2), "links": int(len(links))}))
    ray.shutdown()


def main(samples: int = 2, sizes: tuple = SIZES) -> None:
    for ne in sizes:                       # generate fixtures untimed
        _fixture(ne)
    best: dict[tuple, float] = {}
    plan = [(ne, p) for _ in range(samples)
            for ne in sizes for p in ("shuffle", "broadcast")]
    for ne, p in plan:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(ne), p],
            capture_output=True, text=True, check=True, cwd=REPO).stdout
        s = json.loads(out.strip().splitlines()[-1])
        key = (ne, p)
        best[key] = min(best.get(key, 1e9), s["sec"])
        print(json.dumps(s), flush=True)
        time.sleep(2)

    # the auto selector's decision per size (one Ray session, untimed)
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")
    from sbb_ned_ray.pipelines.ned import select_ned_path
    auto = {}
    for ne in sizes:
        path, info = select_ned_path(_fixture(ne))
        auto[ne] = {"auto_path": path,
                    "estimated_index_mb": round(
                        info["estimated_index_bytes"] / 2 ** 20, 1),
                    "broadcast_budget_mb": round(
                        info["broadcast_budget_bytes"] / 2 ** 20, 1)}
    ray.shutdown()

    rows = []
    for ne in sizes:
        sh, br = best[(ne, "shuffle")], best[(ne, "broadcast")]
        rows.append({"n_entities": ne, "shuffle_sec": sh,
                     "broadcast_sec": br, "ratio": round(sh / br, 2),
                     **auto[ne]})
    print(json.dumps({"profile": rows, "num_cpus": NUM_CPUS}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        # fixture generation may race if two children build the same
        # size; main() pre-generates, so children only read
        run_child(int(sys.argv[2]), sys.argv[3])
    else:
        k = 2
        sizes = SIZES
        if "--samples" in sys.argv:
            k = int(sys.argv[sys.argv.index("--samples") + 1])
        if "--sizes" in sys.argv:
            sizes = tuple(int(x) for x in
                          sys.argv[sys.argv.index("--sizes") + 1]
                          .split(","))
        main(k, sizes)
