"""Train the cross-encoder on a page-seed-disjoint fixture and measure
flagship pairwise F1 with the TRAINED model on held-out pages.

Train and eval fixtures share one KB (identical entities/sentences:
``page_seed`` re-seeds only the page stream), so the split is honest:
no eval page, mention, or context sentence is seen in training.

Usage:  python tools/train_eval_bert.py [sf_dir] [--epochs N]
"""

import argparse
import dataclasses
import sys
import time

import ray


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--eval-limit", type=int, default=None)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.fixtures.generator import (
        materialize_fixture,
        spec_for_sf,
    )
    from sbb_ned_ray.pipelines.ned import pairwise_f1
    from sbb_ned_ray.pipelines.train_bert import (
        TrainSpec,
        run_ned_trained,
        train_cross_encoder,
    )

    eval_spec = spec_for_sf(args.sf_dir)
    train_spec_fix = dataclasses.replace(eval_spec, page_seed=101)
    t0 = time.time()
    train_dir = materialize_fixture(train_spec_fix)
    eval_dir = materialize_fixture(eval_spec)
    print(f"fixtures: train={train_dir} eval={eval_dir} "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    tspec = TrainSpec(epochs=args.epochs)
    t0 = time.time()
    arts = train_cross_encoder(
        train_dir, PipelineConfig(), tspec,
        log=lambda r: print(r, file=sys.stderr))
    t_train = time.time() - t0
    print(f"train: {t_train:.1f}s model={arts['model_path']}",
          file=sys.stderr)
    for rec in arts["history"]:
        print(rec, file=sys.stderr)

    t0 = time.time()
    links = run_ned_trained(eval_dir, arts, PipelineConfig(), tspec,
                            limit=args.eval_limit)
    t_eval = time.time() - t0
    gt = pq.read_table(f"{eval_dir}/mention_pairs_gt.parquet")
    m = pairwise_f1(links, gt)
    print({"n_links": len(links), "t_train_s": round(t_train, 1),
           "t_eval_s": round(t_eval, 1), **m})
    ray.shutdown()


if __name__ == "__main__":
    main()
