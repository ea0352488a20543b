"""End-to-end flagship pipeline on Ray: pages parquet → links → clusters
→ pairwise F1 ≥ 0.99 on labeled mention pairs (BASELINE.json metric),
plus determinism across runs (FIXTURES.md §7(d))."""

import pyarrow.parquet as pq
import pytest

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.pipelines.ned import pairwise_f1, run_ned


@pytest.mark.usefixtures("ray_session")
def test_flagship_pairwise_f1(tiny_fixture_dir):
    links = run_ned(tiny_fixture_dir, PipelineConfig())
    assert len(links) > 0
    gt_pairs = pq.read_table(f"{tiny_fixture_dir}/mention_pairs_gt.parquet")
    m = pairwise_f1(links, gt_pairs)
    assert m["f1"] >= 0.99, m


@pytest.mark.usefixtures("ray_session")
def test_flagship_deterministic(tiny_fixture_dir):
    cfg = PipelineConfig()
    a = run_ned(tiny_fixture_dir, cfg).sort_values(
        ["mention_key"]).reset_index(drop=True)
    b = run_ned(tiny_fixture_dir, cfg).sort_values(
        ["mention_key"]).reset_index(drop=True)
    assert a[["mention_key", "qid", "cluster_id"]].equals(
        b[["mention_key", "qid", "cluster_id"]])


@pytest.mark.usefixtures("ray_session")
def test_local_decide_equals_shuffle_decide(tiny_fixture_dir):
    """The zero-shuffle fused decision (local_decide=True, default) must
    equal the groupby(mention_key) shuffle path row-for-row."""
    import dataclasses
    local = run_ned(tiny_fixture_dir, PipelineConfig())
    shuffled = run_ned(tiny_fixture_dir, dataclasses.replace(
        PipelineConfig(), local_decide=False))
    cols = ["url", "mention_id", "qid", "candidate_title", "cluster_id"]
    a = local[cols].sort_values(cols[:3]).reset_index(drop=True)
    b = shuffled[cols].sort_values(cols[:3]).reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_split_scorer_path_equals_fused(tiny_fixture_dir):
    """The GPU-deployment shape (separate detector/candidates/pairs/
    scorer actor pools + groupby decide) must produce the same top-1
    links as the fused task-pool path."""
    from sbb_ned_ray.pipelines.ned import build_ned_links, top_links

    cfg = PipelineConfig()
    fused = top_links(build_ned_links(tiny_fixture_dir, cfg)).to_pandas()
    split = top_links(build_ned_links(tiny_fixture_dir, cfg,
                                      split_scorer=True)).to_pandas()
    cols = ["mention_key", "qid", "candidate_title"]
    a = fused[cols].sort_values("mention_key").reset_index(drop=True)
    b = split[cols].sort_values("mention_key").reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_label_propagation_matches_union_find():
    """Distributed min-label connected components == driver union-find
    on a multi-component edge set with a chain, a star, and singleton
    pairs."""
    import ray.data as rd

    from sbb_ned_ray.stages.cluster import (
        driver_union_find,
        label_propagation_components,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "d"),          # chain
             ("hub", "s1"), ("hub", "s2"), ("hub", "s3"),  # star
             ("x", "y")]                                   # pair
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    lp = label_propagation_components(ds).to_pandas()
    uf = driver_union_find(edges)
    got = dict(zip(lp["node"], lp["component"]))
    assert set(got) == set(uf)
    # same partition: two nodes share a label iff union-find agrees
    for n1 in uf:
        for n2 in uf:
            assert (got[n1] == got[n2]) == (uf[n1] == uf[n2]), (n1, n2)


@pytest.mark.usefixtures("ray_session")
def test_pairs_to_clusters_distributed_path_matches_driver_path():
    """Above driver_pair_limit the pair set routes through distributed
    label propagation instead of driver union-find; forcing the limit to
    0 must give identical clusters (ints, numeric-min representative)."""
    import numpy as np
    import ray.data as rd

    from sbb_ned_ray.stages.cluster import pairs_to_clusters

    rng = np.random.default_rng(7)
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, 80, size=(150, 2)) if a != b]
    ds = rd.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    via_driver = pairs_to_clusters(ds, driver_pair_limit=10**9)
    via_lp = pairs_to_clusters(ds, driver_pair_limit=0)
    assert via_driver.equals(via_lp)
    assert via_driver["cluster_id"].dtype == np.dtype("int64")


@pytest.mark.usefixtures("ray_session")
def test_shuffle_kb_pipeline_equals_broadcast(tiny_fixture_dir):
    """The full large-KB pipeline (co-shuffle blocking + salted attach
    join + generic fused scoring + groupby decide) must produce the same
    top-1 links as the broadcast flagship."""
    from sbb_ned_ray.pipelines.ned import run_ned_shuffle_kb

    cfg = PipelineConfig()
    a = run_ned(tiny_fixture_dir, cfg)
    b = run_ned_shuffle_kb(tiny_fixture_dir, cfg)
    cols = ["url", "mention_id", "qid", "candidate_title"]
    aa = a[cols].sort_values(cols[:2]).reset_index(drop=True)
    bb = b[cols].sort_values(cols[:2]).reset_index(drop=True)
    assert aa.equals(bb)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_kb_applies_context_like_broadcast(tiny_fixture_dir):
    """Per-job context (geo re-rank + not-after filter) must flow
    through the co-shuffle blocking path — mention type and entity
    metadata are threaded through the joins and apply_context_core runs
    inside the surface-group ranker (ADVICE round 1: the shuffle path
    used to silently drop cfg.context)."""
    import dataclasses

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sbb_ned_ray.pipelines.ned import run_ned_shuffle_kb

    kb = pq.read_table(f"{tiny_fixture_dir}/kb_entities.parquet")
    # pick a LOC entity qid as the geographic anchor
    loc_qid = kb.filter(pc.equal(kb["type"], "LOC"))["qid"][0].as_py()
    for ctx in ({"geographic": [loc_qid]},
                {"time": {"not_after_year": 1950}}):
        cfg = dataclasses.replace(PipelineConfig(), context=ctx)
        a = run_ned(tiny_fixture_dir, cfg)
        b = run_ned_shuffle_kb(tiny_fixture_dir, cfg)
        cols = ["url", "mention_id", "qid", "candidate_title"]
        aa = a[cols].sort_values(cols[:2]).reset_index(drop=True)
        bb = b[cols].sort_values(cols[:2]).reset_index(drop=True)
        assert aa.equals(bb), ctx


@pytest.mark.usefixtures("ray_session")
def test_kb_sentences_match_synthesis(tiny_fixture_dir):
    """The fixture's sentence KB loaded into the index must yield the
    same evidence as the runtime synthesis fallback — the broadcast and
    sentence-KB evidence paths are interchangeable."""
    from sbb_ned_ray.sources.pages import read_kb_sentences, read_kb_table
    from sbb_ned_ray.stages.pairs import evidence_sentences
    from sbb_ned_ray.state.alias_index import build_alias_index

    kb = read_kb_table(tiny_fixture_dir)
    sentences = read_kb_sentences(tiny_fixture_dir)
    assert sentences is not None and sentences.num_rows > 0
    cfg = PipelineConfig()
    with_kb = build_alias_index(kb, cfg, sentences=sentences)
    without = build_alias_index(kb, cfg)
    assert with_kb.sentences is not None and without.sentences is None
    for eid in range(0, kb.num_rows, 7):
        assert evidence_sentences(with_kb, eid) == \
            evidence_sentences(without, eid), eid


@pytest.mark.usefixtures("ray_session")
def test_shuffle_evidence_join_equals_broadcast(tiny_fixture_dir):
    """The co-shuffle sentence-KB evidence join (broadcast-free
    large-KB shape) must produce the same top-1 links as the broadcast
    flagship."""
    from sbb_ned_ray.pipelines.ned import run_ned_shuffle_kb

    cfg = PipelineConfig()
    a = run_ned(tiny_fixture_dir, cfg)
    b = run_ned_shuffle_kb(tiny_fixture_dir, cfg, evidence="shuffle")
    cols = ["url", "mention_id", "qid", "candidate_title"]
    aa = a[cols].sort_values(cols[:2]).reset_index(drop=True)
    bb = b[cols].sort_values(cols[:2]).reset_index(drop=True)
    assert aa.equals(bb)


@pytest.mark.usefixtures("ray_session")
def test_shuffle_evidence_parity_with_sentence_less_entities(
        tiny_fixture_dir, tmp_path):
    """ADVICE round 2 (medium): a candidate whose entity has NO valid
    kb_sentences rows must fall back to synthesized evidence on the
    shuffle path too — not silently vanish from the inner join.  Also
    exercises non-contiguous sent_no (positional rank, not raw sent_no,
    drives the pair budget)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sbb_ned_ray.pipelines.ned import run_ned_shuffle_kb

    fdir = str(tmp_path / "fixture")
    shutil.copytree(tiny_fixture_dir, fdir)
    sents = pq.read_table(os.path.join(fdir, "kb_sentences.parquet"))
    qids = sents["qid"].to_pylist()
    uniq = sorted(set(qids))
    dropped = set(uniq[::5])          # every 5th entity loses ALL rows
    redirect_stub = uniq[1]           # one entity keeps only a stub row
    keep = pa.array([(q not in dropped) and q != redirect_stub
                     for q in qids])
    kept = sents.filter(keep)
    # non-contiguous sent_no: stretch by 7 (ordering preserved)
    kept = kept.set_column(
        kept.schema.get_field_index("sent_no"), "sent_no",
        pc.cast(pc.multiply(kept["sent_no"], 7), pa.int32()))
    stub = pa.table({
        "qid": pa.array([redirect_stub], pa.string()),
        "sent_no": pa.array([0], pa.int32()),
        "tokens": pa.array([["#redirect", "elsewhere"]],
                           pa.list_(pa.string())),
        "ent_pos": pa.array([0], pa.int32()),
        "ent_end": pa.array([1], pa.int32()),
    })
    pq.write_table(pa.concat_tables([kept, stub]),
                   os.path.join(fdir, "kb_sentences.parquet"))

    cfg = PipelineConfig()
    a = run_ned(fdir, cfg)
    b = run_ned_shuffle_kb(fdir, cfg, evidence="shuffle")
    cols = ["url", "mention_id", "qid", "candidate_title"]
    aa = a[cols].sort_values(cols[:2]).reset_index(drop=True)
    bb = b[cols].sort_values(cols[:2]).reset_index(drop=True)
    assert aa.equals(bb)
    # the dropped entities really did link (the fallback mattered)
    assert dropped & set(a["qid"]), "test fixture lost its teeth"


@pytest.mark.usefixtures("ray_session")
def test_junk_html_pages_yield_zero_links_no_crash(tiny_fixture_dir,
                                                   tmp_path):
    """Robustness: non-UTF8 bytes, empty html, tag soup, and huge
    whitespace runs flow through the whole pipeline without crashing
    and produce zero links."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from sbb_ned_ray.pipelines.ned import build_ned_links, top_links
    from sbb_ned_ray.sources.pages import read_kb_table

    junk = [
        b"\xff\xfe\x00garbage\x80\x81",
        b"",
        b"<html><body><p>" + b"\xc3\x28" * 50 + b"</p>",
        b"<div><div><div>" + b" " * 10_000 + b"</div>",
        b"<script>while(1){}</script><style>*{}</style>",
    ]
    pages = pa.table({
        "url": pa.array([f"https://junk.example/{i}" for i in
                         range(len(junk))], pa.string()),
        "warc_ts": pa.array([np.datetime64("2024-01-01", "us")] * len(junk),
                            pa.timestamp("us")),
        "html": pa.array(junk, pa.binary()),
        "lang": pa.array(["de"] * len(junk), pa.string()),
    })
    pdir = tmp_path / "junk_pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "part-0.parquet"))

    kb = read_kb_table(tiny_fixture_dir)
    cfg = PipelineConfig()
    links = top_links(build_ned_links(
        str(tmp_path), cfg, kb_table=kb,
        pages_ds=rd.read_parquet(str(pdir)))).to_pandas()
    assert len(links) == 0


@pytest.mark.usefixtures("ray_session")
def test_task_pool_stages_equal_actor_pools(tiny_fixture_dir):
    """detect_mentions/score_pairs with ``as_tasks=True`` (worker-global
    instance cache, no actor ramp) must be row-identical to the
    actor-pool execution of the same stage callables."""
    import ray

    from sbb_ned_ray.pipelines.ned import extracted_pages
    from sbb_ned_ray.sources.pages import read_kb_table, read_pages
    from sbb_ned_ray.stages.candidates import generate_candidates
    from sbb_ned_ray.stages.mentions import detect_mentions
    from sbb_ned_ray.stages.pairs import build_pairs
    from sbb_ned_ray.stages.scorer import score_pairs
    from sbb_ned_ray.state.alias_index import build_alias_index

    cfg = PipelineConfig()
    index_ref = ray.put(build_alias_index(read_kb_table(tiny_fixture_dir),
                                          cfg))
    pages = extracted_pages(read_pages(tiny_fixture_dir,
                                       columns=["url", "html"]))

    def mentions(as_tasks):
        kw = {} if as_tasks else {"concurrency": 2, "num_cpus": 0.5}
        return detect_mentions(pages, index_ref, as_tasks=as_tasks, **kw) \
            .to_pandas().sort_values(["url", "mention_id"]) \
            .reset_index(drop=True)

    ma, mt = mentions(False), mentions(True)
    cols = ["url", "mention_id", "sent_no", "tok_start", "tok_end",
            "surface"]
    assert ma[cols].equals(mt[cols])

    pairs = build_pairs(
        generate_candidates(detect_mentions(pages, index_ref,
                                            as_tasks=True),
                            index_ref, cfg, concurrency=2, num_cpus=0.5),
        index_ref, cfg, concurrency=2, num_cpus=0.5).materialize()

    def scored(as_tasks):
        kw = {} if as_tasks else {"concurrency": 2, "num_cpus": 0.5}
        return score_pairs(pairs, cfg, as_tasks=as_tasks, **kw) \
            .to_pandas() \
            .sort_values(["url", "mention_id", "qid", "pair_no"]) \
            .reset_index(drop=True)

    sa, st = scored(False), scored(True)
    assert len(sa) > 0
    assert sa[["url", "mention_id", "qid", "p1", "score"]].equals(
        st[["url", "mention_id", "qid", "p1", "score"]])


@pytest.mark.usefixtures("ray_session")
def test_auto_path_selection_and_parity(tiny_fixture_dir):
    """run_ned_auto must pick broadcast for a KB that fits the object
    store, shuffle when the budget is forced to zero — and both
    dispatches must produce identical top-1 links."""
    from sbb_ned_ray.pipelines.ned import (
        run_ned_auto,
        select_ned_path,
    )

    path, info = select_ned_path(tiny_fixture_dir)
    assert path == "broadcast"
    assert 0 < info["estimated_index_bytes"] < info["broadcast_budget_bytes"]
    forced, _ = select_ned_path(tiny_fixture_dir, broadcast_fraction=0.0)
    assert forced == "shuffle"

    cfg = PipelineConfig()
    a = run_ned_auto(tiny_fixture_dir, cfg)                 # broadcast
    b = run_ned_auto(tiny_fixture_dir, cfg,
                     broadcast_fraction=0.0)                # shuffle
    cols = ["url", "mention_id", "qid", "candidate_title"]
    aa = a[cols].sort_values(cols[:2]).reset_index(drop=True)
    bb = b[cols].sort_values(cols[:2]).reset_index(drop=True)
    assert aa.equals(bb)
