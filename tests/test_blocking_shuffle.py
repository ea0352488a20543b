"""Co-shuffle (large-KB) blocking path: exact parity with the broadcast
CandidateGenerator, plus the salted attach join."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sbb_ned_ray.config import PipelineConfig


@pytest.fixture(scope="module")
def blocking_ctx(tiny_fixture_dir):
    kb = pq.read_table(f"{tiny_fixture_dir}/kb_entities.parquet")
    cfg = PipelineConfig()
    return {"kb": kb, "cfg": cfg, "dir": tiny_fixture_dir}


def _mentions(ctx):
    from sbb_ned_ray.state.alias_index import build_alias_index
    from sbb_ned_ray.stages.extract import extract_text_batch
    from sbb_ned_ray.stages.mentions import MentionDetector

    index = build_alias_index(ctx["kb"], ctx["cfg"])
    pages = pq.read_table(f"{ctx['dir']}/pages")
    return index, MentionDetector(index)(extract_text_batch(pages))


def test_shuffle_blocking_matches_broadcast(ray_session, blocking_ctx):
    import ray.data

    from sbb_ned_ray.stages.blocking import ranked_candidates_via_shuffle
    from sbb_ned_ray.stages.candidates import CandidateGenerator

    cfg = blocking_ctx["cfg"]
    index, mentions = _mentions(blocking_ctx)

    bc = CandidateGenerator(index, cfg, include_tokens=False)(mentions) \
        .to_pandas()
    bc_ranked = bc.drop_duplicates(
        subset=["surface", "candidate_title", "qid"])[
        ["surface", "qid", "candidate_title", "rank", "dist",
         "match_uniqueness", "match_coverage", "proba"]] \
        .sort_values(["surface", "rank"]).reset_index(drop=True)

    mentions_ds = ray.data.from_arrow(
        mentions.select(["url", "mention_id", "surface"]))
    sh = ranked_candidates_via_shuffle(
        mentions_ds, blocking_ctx["kb"], cfg).to_pandas()
    sh_ranked = sh[["surface", "qid", "candidate_title", "rank", "dist",
                    "match_uniqueness", "match_coverage", "proba"]] \
        .sort_values(["surface", "rank"]).reset_index(drop=True)

    assert len(bc_ranked) == len(sh_ranked), \
        f"row counts differ: {len(bc_ranked)} vs {len(sh_ranked)}"
    for col in ("surface", "qid", "candidate_title", "rank"):
        assert (bc_ranked[col].to_numpy() == sh_ranked[col].to_numpy()) \
            .all(), col
    import numpy as np
    for col in ("match_uniqueness", "match_coverage", "proba"):
        assert np.allclose(bc_ranked[col], sh_ranked[col], atol=1e-9), col
    # dist: float32 matrix@vector (broadcast) vs vector·vector (shuffle)
    # differ in the last bits only
    assert np.allclose(bc_ranked["dist"], sh_ranked["dist"], atol=1e-5)


def test_salted_attach_join(ray_session, blocking_ctx):
    import ray.data

    from sbb_ned_ray.stages.blocking import (
        attach_candidates_salted,
        ranked_candidates_via_shuffle,
    )

    cfg = blocking_ctx["cfg"]
    _, mentions = _mentions(blocking_ctx)
    mentions_ds = ray.data.from_arrow(
        mentions.select(["url", "mention_id", "surface"]))
    ranked = ranked_candidates_via_shuffle(
        mentions_ds, blocking_ctx["kb"], cfg)
    joined = attach_candidates_salted(mentions_ds, ranked, salt=4) \
        .to_pandas()

    # every (mention, candidate) appears exactly once despite the
    # salt-replication of the candidate side
    assert not joined.duplicated(
        subset=["url", "mention_id", "candidate_title", "qid"]).any()
    # per-mention candidate count equals the per-surface ranked count
    per_surface = ranked.to_pandas().groupby("surface").size()
    md = mentions.to_pandas()
    expected = int(md["surface"].map(per_surface).fillna(0).sum())
    assert len(joined) == expected


def test_alias_rows_vectorized_bitexact(tiny_fixture_dir):
    """The vectorized normalize→explode must equal the row-loop
    reference INCLUDING row order (Table.equals) — with and without
    the metadata columns."""
    import numpy as np
    import pyarrow as pa

    from sbb_ned_ray.sources.pages import read_kb_table
    from sbb_ned_ray.stages.blocking import (
        _alias_rows_rowloop,
        _alias_rows_vectorized,
    )

    kb = read_kb_table(tiny_fixture_dir)
    t = kb.append_column(
        "eid", pa.array(np.arange(kb.num_rows, dtype=np.int64)))
    meta = ["longitude", "latitude", "dateofbirth", "inception"]
    for with_meta in (False, True):
        a = _alias_rows_rowloop(t, with_meta, meta)
        b = _alias_rows_vectorized(t, with_meta, meta)
        assert a.schema.equals(b.schema), (a.schema, b.schema)
        assert a.equals(b), (a.num_rows, b.num_rows)
    # degenerate inputs: empty batch, all-empty alias lists
    e = t.slice(0, 0)
    assert _alias_rows_vectorized(e, False, meta).num_rows == 0
    blank = pa.table({
        "eid": pa.array([0], pa.int64()),
        "page_title": pa.array(["X"]),
        "qid": pa.array(["Q1"]),
        "proba": pa.array([0.5], pa.float64()),
        "aliases": pa.array([[]], pa.list_(pa.string())),
    })
    assert _alias_rows_vectorized(blank, False, meta).num_rows == 0


def test_rank_surface_block_vectorized_matches_rowloop(ray_session):
    """The vectorized whole-bucket ranker must reproduce the row-loop
    rank_hits reference: same rows, same ranks, same floats (the
    accumulation order is preserved by construction)."""
    import numpy as np
    import pyarrow as pa

    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.stages.blocking import (
        _rank_surface_block,
        _rank_surface_block_rowloop,
    )

    rng = np.random.RandomState(11)
    cfg = PipelineConfig()
    surfaces = ["alpha beta", "gamma", "delta eps", "zeta", "eta theta"]
    parts = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
             "theta", "iota"]
    rows = {"surface": [], "query_part": [], "dist": [], "eid": [],
            "tlen": [], "proba": [], "is_exact": []}
    ent_meta = {e: (int(rng.randint(3, 20)), float(rng.rand()))
                for e in range(40)}
    for _ in range(600):                       # part rows w/ duplicates
        s = surfaces[rng.randint(len(surfaces))]
        e = int(rng.randint(40))
        rows["surface"].append(s)
        rows["query_part"].append(parts[rng.randint(len(parts))])
        rows["dist"].append(float(rng.rand() * 0.2))
        rows["eid"].append(e)
        rows["tlen"].append(ent_meta[e][0])
        rows["proba"].append(ent_meta[e][1])
        rows["is_exact"].append(0)
    for _ in range(30):                        # exact rows (some overlap)
        s = surfaces[rng.randint(len(surfaces))]
        e = int(rng.randint(40))
        rows["surface"].append(s)
        rows["query_part"].append(None)
        rows["dist"].append(0.0)
        rows["eid"].append(e)
        rows["tlen"].append(ent_meta[e][0])
        rows["proba"].append(ent_meta[e][1])
        rows["is_exact"].append(1)
    # one exact-only surface (no part rows at all)
    rows["surface"].append("iota")
    rows["query_part"].append(None)
    rows["dist"].append(0.0)
    rows["eid"].append(99)
    rows["tlen"].append(4)
    rows["proba"].append(0.9)
    rows["is_exact"].append(1)
    t = pa.table({
        "surface": pa.array(rows["surface"], pa.string()),
        "query_part": pa.array(rows["query_part"], pa.string()),
        "dist": pa.array(rows["dist"], pa.float64()),
        "eid": pa.array(rows["eid"], pa.int64()),
        "tlen": pa.array(rows["tlen"], pa.int32()),
        "proba": pa.array(rows["proba"], pa.float64()),
        "is_exact": pa.array(rows["is_exact"], pa.int8()),
    })
    for max_cand in (3, 1000):
        cfg2 = PipelineConfig(max_candidates=max_cand)
        a = _rank_surface_block_rowloop(t, cfg2).to_pandas() \
            .sort_values(["surface", "rank"]).reset_index(drop=True)
        b = _rank_surface_block(t, cfg2).to_pandas() \
            .sort_values(["surface", "rank"]).reset_index(drop=True)
        assert len(a) == len(b)
        for c in ("surface", "cand_entity", "rank"):
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
        for c in ("dist", "match_uniqueness", "match_coverage", "proba"):
            assert np.allclose(a[c], b[c], atol=1e-12), c
    assert _rank_surface_block(t.slice(0, 0), cfg).num_rows == 0


def test_match_parts_block_matches_rowloop(ray_session):
    """Vectorized bucket-level part probe vs the per-group reference:
    same (query_part, part) selections, same order, distances within
    matmul-vs-dot jitter."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from sbb_ned_ray.config import PipelineConfig
    from sbb_ned_ray.stages.blocking import (
        _match_part_group,
        _match_parts_block,
    )

    rng = np.random.RandomState(5)
    qparts = ["paris", "hilton", "ab", "berlin", "munich"]
    parts = ["paris", "pariis", "hilton", "hiltons", "ab", "abc",
             "berlin", "berliin", "munich", "zz"]
    freqs = {p: int(rng.randint(1, 3000)) for p in parts}
    rows = {"query_part": [], "part": [], "freq": []}
    for _ in range(400):
        rows["query_part"].append(qparts[rng.randint(len(qparts))])
        p = parts[rng.randint(len(parts))]
        rows["part"].append(p)
        rows["freq"].append(freqs[p])
    t = pa.table({"query_part": pa.array(rows["query_part"]),
                  "part": pa.array(rows["part"]),
                  "freq": pa.array(rows["freq"], pa.int64())})
    cfg = PipelineConfig()
    got = _match_parts_block(t, cfg).to_pandas() \
        .sort_values(["query_part", "dist", "part"]).reset_index(drop=True)
    df = t.to_pandas()
    want = pd.concat([_match_part_group(g, cfg)
                      for _, g in df.groupby("query_part", sort=False)],
                     ignore_index=True) \
        .sort_values(["query_part", "dist", "part"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["query_part"] == want["query_part"]).all()
    assert (got["part"] == want["part"]).all()
    assert np.allclose(got["dist"], want["dist"], atol=1e-9)
    assert _match_parts_block(t.slice(0, 0), cfg).num_rows == 0


def test_probe_key_arrays_bitexact():
    """The vectorized probe-key emitter must reproduce the old row
    loop's (key, part) emission exactly — identity key then the band
    keys, per part, in order."""
    from sbb_ned_ray.functions.hashing import MinHasher
    from sbb_ned_ray.stages.blocking import _band_keys, _probe_key_arrays

    cfg = PipelineConfig()
    hasher = MinHasher(num_perm=cfg.num_perm, seed=cfg.seed)
    parts = ["goethe", "johann", "müller", "x", "goethe"]

    ks_ref, ps_ref = [], []
    for p in parts:
        ks_ref.append(f"p:{p}")
        ps_ref.append(p)
        for bk in _band_keys(p, cfg, hasher):
            ks_ref.append(f"b:{bk}")
            ps_ref.append(p)

    keys, idx = _probe_key_arrays(parts, cfg, hasher)
    assert keys.tolist() == ks_ref
    assert [parts[i] for i in idx] == ps_ref
    k0, i0 = _probe_key_arrays([], cfg, hasher)
    assert len(k0) == 0 and len(i0) == 0


def test_surface_part_tables_bitexact(ray_session):
    """The exploded part/key legs must equal the old row-loop emission
    including row order, with and without redirects/types."""
    import ray
    import ray.data as rd

    from sbb_ned_ray.functions.normalization import (
        filter_surface,
        normalize_chars,
    )
    from sbb_ned_ray.stages.blocking import _surface_part_tables

    cfg = PipelineConfig()
    surfaces = ["Johann Wolfgang Goethe", "Göthe", "v. Bismarck",
                "...", "Alte-Stadt Basel"]
    stypes = ["PER", "PER", "PER", "LOC", "LOC"]
    redirects = {"göthe": "Johann_Wolfgang_Goethe",
                 "alte stadt basel": "Basel"}

    def ref_rows(with_type, rd_map):
        p_rows, k_rows = [], []
        for s, st in zip(surfaces, stypes):
            parts = filter_surface(normalize_chars(s))
            for p in parts:
                p_rows.append((s, p) + ((st,) if with_type else ()))
            if rd_map:
                tgt = rd_map.get(" ".join(parts))
                if tgt is not None:
                    for p in filter_surface(
                            normalize_chars(tgt.replace("_", " "))):
                        if p not in parts:
                            p_rows.append(
                                (s, p) + ((st,) if with_type else ()))
            if parts:
                key = " ".join(parts)
                k_rows.append((s, key) + ((st,) if with_type else ()))
                if rd_map:
                    tgt = rd_map.get(key)
                    if tgt is not None:
                        t_parts = filter_surface(
                            normalize_chars(tgt.replace("_", " ")))
                        if t_parts:
                            k_rows.append((s, " ".join(t_parts))
                                          + ((st,) if with_type else ()))
        return p_rows, k_rows

    for with_type in (False, True):
        for rd_map in ({}, redirects):
            cols = {"surface": pa.array(surfaces)}
            if with_type:
                cols["stype"] = pa.array(stypes)
            ds = rd.from_arrow(pa.table(cols))
            ref_p, ref_k = ref_rows(with_type, rd_map)
            ref_ref = ray.put(rd_map) if rd_map else None
            sp, kr = _surface_part_tables(ds, cfg, with_type=with_type,
                                          redirects_ref=ref_ref)
            got_p = [tuple(r.values()) for r in sp.take_all()]
            got_k = [tuple(r.values()) for r in kr.take_all()]
            assert got_p == ref_p, (with_type, bool(rd_map))
            assert got_k == ref_k, (with_type, bool(rd_map))
