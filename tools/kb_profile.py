"""KB-size amortization profile: broadcast vs co-shuffle blocking wall
time at three KB sizes (1 500 / 6 000 / 24 000 entities) over the same
20k-page input — the evidence that the shuffle path's fixed join cost
amortizes as the KB grows (round-3 verdict item 4: "one more KB
doubling").

Each (size, path) sample runs in a FRESH child process/Ray session
(BASELINE.md measurement discipline); samples are interleaved across
sizes and the per-cell minimum is reported.

Usage: python tools/kb_profile.py [--child N_ENTITIES PATH] [--samples K]
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


def main(samples: int = 2) -> None:
    for ne in SIZES:                       # generate fixtures untimed
        _fixture(ne)
    best: dict[tuple, float] = {}
    plan = [(ne, p) for _ in range(samples)
            for ne in SIZES for p in ("shuffle", "broadcast")]
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
    rows = []
    for ne in SIZES:
        sh, br = best[(ne, "shuffle")], best[(ne, "broadcast")]
        rows.append({"n_entities": ne, "shuffle_sec": sh,
                     "broadcast_sec": br, "ratio": round(sh / br, 2)})
    print(json.dumps({"profile": rows, "num_cpus": NUM_CPUS}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        # fixture generation may race if two children build the same
        # size; main() pre-generates, so children only read
        run_child(int(sys.argv[2]), sys.argv[3])
    else:
        k = 2
        if "--samples" in sys.argv:
            k = int(sys.argv[sys.argv.index("--samples") + 1])
        main(k)
