"""Command-line entry points (reference: 16 console scripts,
``setup.py:22-55`` — collapsed to the four workflows a user actually
runs; each owns its Ray session per the driver contract).

    python -m sbb_ned_ray.cli build-index  --kb KB.parquet --out DIR
    python -m sbb_ned_ray.cli run          --pages DIR --out DIR [--resume]
    python -m sbb_ned_ray.cli run-shuffle-kb --pages DIR --out DIR
    python -m sbb_ned_ray.cli eval         --pages DIR
    python -m sbb_ned_ray.cli training-pairs --pages DIR --out DIR
    python -m sbb_ned_ray.cli dedup        --docs X.parquet --out DIR \
                                           --method {exact,minhash,simhash}
    python -m sbb_ned_ray.cli profile      --docs X.parquet
    python -m sbb_ned_ray.cli er           --records R.parquet --out DIR \
                                           [--save-index DIR | --incremental IDX]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sbb_ned_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index", help="build + persist the alias index")
    b.add_argument("--kb", required=True, help="kb_entities parquet file")
    b.add_argument("--out", required=True, help="artifact directory")

    for name in ("run", "run-shuffle-kb"):
        r = sub.add_parser(name, help="run the flagship NED pipeline")
        r.add_argument("--pages", required=True,
                       help="fixture dir (pages/ + kb_entities.parquet)")
        r.add_argument("--out", required=True, help="links output dir")
        if name == "run":
            r.add_argument("--resume", action="store_true",
                           help="per-partition resumable mode")
            r.add_argument("--kb-path",
                           choices=("auto", "broadcast", "shuffle"),
                           default="auto",
                           help="candidate-blocking shape: auto measures"
                                " the KB footprint against the object "
                                "store and picks broadcast or co-shuffle"
                                " (default)")

    e = sub.add_parser("eval", help="pairwise-F1 against labeled pairs")
    e.add_argument("--pages", required=True)

    t = sub.add_parser("training-pairs", help="generate labeled pairs")
    t.add_argument("--pages", required=True)
    t.add_argument("--out", required=True)

    td = sub.add_parser("train-decider",
                        help="train + persist the decider model "
                             "(GroupKFold ROC-AUC logged)")
    td.add_argument("--pages", required=True)
    td.add_argument("--out", required=True, help="model pickle path")
    td.add_argument("--folds", type=int, default=5)

    dd = sub.add_parser("dedup", help="corpus deduplication → clusters "
                                      "parquet (doc_id, cluster_id)")
    dd.add_argument("--docs", required=True,
                    help="parquet file/dir with (doc_id, text) columns")
    dd.add_argument("--out", help="clusters output dir (required unless "
                                  "--save-index)")
    dd.add_argument("--method", choices=("exact", "minhash", "simhash"),
                    default="minhash")
    dd.add_argument("--threshold", type=float, default=0.8,
                    help="Jaccard threshold (minhash)")
    dd.add_argument("--max-hamming", type=int, default=3,
                    help="Hamming radius (simhash)")
    dd.add_argument("--save-index", metavar="DIR",
                    help="minhash only: build the persisted signature "
                         "index for --docs under DIR and exit (no "
                         "clusters) — the base artifact for "
                         "--incremental runs")
    dd.add_argument("--incremental", metavar="INDEX_PATH",
                    help="minhash only: treat --docs as a NEW-BATCH "
                         "delta and dedup it against the persisted "
                         "index without rescanning the corpus")

    er = sub.add_parser("er", help="record linkage / entity resolution "
                                   "over a records parquet → golden "
                                   "records (resumable) or incremental "
                                   "delta matching")
    er.add_argument("--records", required=True,
                    help="parquet with (rec_id, <block>, <name>, ...) "
                         "columns; odd rec_ids probe even originals")
    er.add_argument("--out", help="output dir (required unless "
                                  "--save-index)")
    er.add_argument("--block-col", default="nationkey")
    er.add_argument("--id-col", default="rec_id")
    er.add_argument("--name-col", default="name")
    er.add_argument("--parts", type=int, default=8,
                    help="resumable block-group partitions")
    er.add_argument("--save-index", metavar="DIR",
                    help="persist the clean-master linkage index for "
                         "--records under DIR and exit — the base "
                         "artifact for --incremental runs")
    er.add_argument("--incremental", metavar="INDEX_PATH",
                    help="treat --records as a DELTA and match it "
                         "against the persisted index without "
                         "rescanning the master")
    er.add_argument("--delta", metavar="PARQUET",
                    help="incremental CLUSTER MAINTENANCE: rerun the "
                         "resumable pipeline over --records ∪ --delta "
                         "against an existing --out state dir — only "
                         "block groups the delta touches recompute; "
                         "the result equals the batch run on the union")

    pr = sub.add_parser("profile", help="one-pass corpus profile "
                                        "(sketch-based, JSON to stdout)")
    pr.add_argument("--docs", required=True,
                    help="parquet file/dir with (doc_id, text, lang, "
                         "n_chars) columns")
    pr.add_argument("--top-k", type=int, default=20)

    args = p.parse_args(argv)
    if args.cmd == "er":
        if args.save_index and args.incremental:
            p.error("--save-index and --incremental are mutually "
                    "exclusive (build the index, then run the delta)")
        if args.delta and (args.save_index or args.incremental):
            p.error("--delta drives the resumable runner; it cannot be "
                    "combined with --save-index/--incremental")
        if not args.out and not args.save_index:
            p.error("--out is required unless --save-index")
    if args.cmd == "dedup":
        # --save-index / --incremental are minhash-index operations:
        # fail fast instead of silently ignoring --method, and only
        # --save-index (which writes no clusters) may omit --out
        if (args.save_index or args.incremental) \
                and args.method != "minhash":
            p.error("--save-index/--incremental require --method minhash "
                    f"(got --method {args.method})")
        if args.save_index and args.incremental:
            p.error("--save-index and --incremental are mutually "
                    "exclusive (build the index, then run the delta)")
        if not args.out and not args.save_index:
            p.error("--out is required unless --save-index")
    from sbb_ned_ray.config import PipelineConfig
    cfg = PipelineConfig()

    if args.cmd == "build-index":
        import pyarrow.parquet as pq

        from sbb_ned_ray.state.alias_index import build_alias_index
        from sbb_ned_ray.state.artifacts import save_index
        kb = pq.read_table(args.kb)
        kb_dir = os.path.dirname(args.kb)
        sent_path = os.path.join(kb_dir, "kb_sentences.parquet")
        sentences = pq.read_table(sent_path) \
            if os.path.exists(sent_path) else None
        rd_path = os.path.join(kb_dir, "redirects.parquet")
        redirects = pq.read_table(rd_path) \
            if os.path.exists(rd_path) else None
        fp = save_index(build_alias_index(kb, cfg, sentences=sentences,
                                          redirects=redirects),
                        kb, args.out, cfg, sentences, redirects)
        print(json.dumps({"artifact": args.out, "fingerprint": fp,
                          "entities": kb.num_rows}))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "run":
            if args.resume:
                from sbb_ned_ray.pipelines.ned import run_ned_resumable
                links, summary = run_ned_resumable(args.pages, args.out, cfg)
                print(json.dumps({
                    "links": int(len(links)),
                    "completed": summary["completed"],
                    "skipped": summary["skipped"]}))
            else:
                from sbb_ned_ray.pipelines.ned import (
                    run_ned,
                    run_ned_auto,
                    run_ned_shuffle_kb,
                    select_ned_path,
                )
                if args.kb_path == "auto":
                    path, info = select_ned_path(args.pages)
                    links = run_ned_auto(args.pages, cfg)
                elif args.kb_path == "broadcast":
                    path, info = "broadcast", {}
                    links = run_ned(args.pages, cfg)
                else:
                    path, info = "shuffle", {}
                    links = run_ned_shuffle_kb(args.pages, cfg)
                os.makedirs(args.out, exist_ok=True)
                links.to_parquet(os.path.join(args.out, "links.parquet"))
                print(json.dumps({"links": int(len(links)),
                                  "kb_path": path, **info,
                                  "out": args.out}))
        elif args.cmd == "run-shuffle-kb":
            from sbb_ned_ray.pipelines.ned import run_ned_shuffle_kb
            links = run_ned_shuffle_kb(args.pages, cfg)
            os.makedirs(args.out, exist_ok=True)
            links.to_parquet(os.path.join(args.out, "links.parquet"))
            print(json.dumps({"links": int(len(links)), "out": args.out}))
        elif args.cmd == "eval":
            import pyarrow.parquet as pq

            from sbb_ned_ray.pipelines.ned import pairwise_f1, run_ned
            links = run_ned(args.pages, cfg)
            gt = pq.read_table(
                os.path.join(args.pages, "mention_pairs_gt.parquet"))
            m = pairwise_f1(links, gt)
            print(json.dumps({k: round(v, 6) if isinstance(v, float) else v
                              for k, v in m.items()}))
        elif args.cmd == "training-pairs":
            from sbb_ned_ray.stages.training import training_pairs_ds
            ds = training_pairs_ds(args.pages, cfg)
            ds.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.cmd == "dedup":
            import ray.data as rd

            from sbb_ned_ray.stages.dedup import (
                exact_dedup,
                minhash_lsh_dedup,
                simhash_clusters,
            )
            docs = rd.read_parquet(args.docs, columns=["doc_id", "text"])
            if args.save_index:
                from sbb_ned_ray.stages.dedup import save_minhash_index
                path = save_minhash_index(docs, args.save_index)
                print(json.dumps({"index": path}))
                return 0
            if args.incremental:
                from sbb_ned_ray.stages.dedup import \
                    minhash_dedup_incremental
                res = minhash_dedup_incremental(
                    args.incremental, docs,
                    jaccard_threshold=args.threshold)
                os.makedirs(args.out, exist_ok=True)
                res["clusters"].to_parquet(
                    os.path.join(args.out, "clusters.parquet"))
                res["pairs"].to_parquet(
                    os.path.join(args.out, "pairs.parquet"))
                print(json.dumps({"method": "minhash-incremental",
                                  "out": args.out, **res["stats"]}))
                return 0
            if args.method == "exact":
                # (doc_id, content_hash, is_duplicate) → keep cluster shape
                out = exact_dedup(docs).to_pandas()
            elif args.method == "minhash":
                out = minhash_lsh_dedup(
                    docs, jaccard_threshold=args.threshold)
            else:
                out = simhash_clusters(docs, max_hamming=args.max_hamming)
            os.makedirs(args.out, exist_ok=True)
            out.to_parquet(os.path.join(args.out, "clusters.parquet"))
            print(json.dumps({"method": args.method, "rows": int(len(out)),
                              "out": args.out}))
        elif args.cmd == "er":
            import ray.data as rd
            if args.save_index:
                from sbb_ned_ray.stages.linkage import save_linkage_index
                recs = rd.read_parquet(args.records)
                path = save_linkage_index(
                    recs, args.save_index, block_col=args.block_col,
                    id_col=args.id_col, name_col=args.name_col)
                print(json.dumps({"index": path}))
                return 0
            if args.incremental:
                from sbb_ned_ray.stages.linkage import \
                    linkage_match_incremental
                delta = rd.read_parquet(args.records)
                matches, stats = linkage_match_incremental(
                    args.incremental, delta, return_stats=True)
                os.makedirs(args.out, exist_ok=True)
                mdf = matches.to_pandas()
                mdf.to_parquet(os.path.join(args.out, "matches.parquet"))
                print(json.dumps({"mode": "incremental",
                                  "matches": int(len(mdf)),
                                  "out": args.out, **stats}))
                return 0
            from sbb_ned_ray.pipelines.er import run_er_resumable
            golden, summary = run_er_resumable(
                args.records, args.out, n_parts=args.parts,
                block_col=args.block_col, id_col=args.id_col,
                name_col=args.name_col, delta_path=args.delta)
            golden.to_parquet(os.path.join(args.out, "golden.parquet"))
            print(json.dumps({
                "mode": "resumable", "delta": bool(args.delta),
                "clusters": int(len(golden)),
                "completed": summary["completed"],
                "skipped": summary["skipped"], "out": args.out}))
        elif args.cmd == "profile":
            from sbb_ned_ray.pipelines.profile import corpus_profile
            print(json.dumps(corpus_profile(args.docs,
                                            top_k=args.top_k)))
        elif args.cmd == "train-decider":
            from sbb_ned_ray.stages.training import train_decider_job
            _, scores, n_rows = train_decider_job(
                args.pages, cfg, out_path=args.out, n_folds=args.folds)
            print(json.dumps({"out": args.out, "rows": n_rows,
                              "cv_roc_auc": [round(s, 6)
                                             for s in scores]}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
