"""Redirect-table fidelity: the reference resolves mention surfaces
through a redirects db (rd_from_title → rd_title, webapp/app.py:120-129,
surface expansion app.py:338-339).  These tests cover the reader, the
broadcast expansion, the gazetteer trie extension, the co-shuffle
parity, and artifact invalidation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.state.alias_index import (
    build_alias_index,
    redirect_map,
    surface_key,
)


def _mini_kb() -> pa.Table:
    ents = [
        ("Lindau", "Q1", "LOC"),
        ("Konstanz", "Q2", "LOC"),
        ("Anna Schmidt", "Q3", "PER"),
    ]
    return pa.table({
        "page_title": pa.array([l.replace(" ", "_") for l, _, _ in ents]),
        "qid": pa.array([q for _, q, _ in ents]),
        "type": pa.array([t for _, _, t in ents]),
        "label": pa.array([l for l, _, _ in ents]),
        "aliases": pa.array([[l] for l, _, _ in ents],
                            pa.list_(pa.string())),
        "proba": pa.array([0.5, 0.3, 0.2], pa.float64()),
        "context_tokens": pa.array([["ctx"]] * 3, pa.list_(pa.string())),
    })


def _redirects() -> pa.Table:
    return pa.table({
        # redirect-only form: no alias comes near it (exact or fuzzy)
        "rd_from_title": pa.array(
            ["Altname_00001", "Aeschach", "Lindau"]),
        # last row is a self-loop after normalization → dropped
        "rd_title": pa.array(["Lindau", "Lindau", "lindau"]),
    })


def test_redirect_map_normalizes_and_drops_self_loops():
    rd = redirect_map(_redirects())
    assert rd == {"altname 00001": "Lindau", "aeschach": "Lindau"}
    assert surface_key("Altname_00001") == "altname 00001"
    assert redirect_map(None) == {}


def test_redirect_only_surface_resolves_via_broadcast_index():
    from sbb_ned_ray.stages.candidates import generate_candidates_for_surface

    cfg = PipelineConfig()
    plain = build_alias_index(_mini_kb(), cfg)
    with_rd = build_alias_index(_mini_kb(), cfg, redirects=_redirects())

    # without the redirects table the surface resolves to nothing
    assert generate_candidates_for_surface("Altname 00001", plain, cfg) == []
    ranked = generate_candidates_for_surface("Altname 00001", with_rd, cfg)
    assert ranked, "redirect target should produce a candidate"
    eid, dist, _, _, _, rank = ranked[0]
    assert with_rd.qids[eid] == "Q1" and rank == 0
    # non-redirected surfaces are unaffected
    assert [r[0] for r in
            generate_candidates_for_surface("Konstanz", plain, cfg)] == \
           [r[0] for r in
            generate_candidates_for_surface("Konstanz", with_rd, cfg)]


def test_redirect_forms_join_the_gazetteer_trie():
    from sbb_ned_ray.stages.mentions import MentionDetector

    cfg = PipelineConfig()
    idx = build_alias_index(_mini_kb(), cfg, redirects=_redirects())
    batch = pa.table({
        "url": pa.array(["u1"]),
        "text": pa.array(["wir besuchten Aeschach im Sommer"]),
    })
    out = MentionDetector(idx)(batch)
    assert "Aeschach" in out["surface"].to_pylist()
    # dangling redirects (target not an alias of any entity) are skipped
    dangling = pa.table({"rd_from_title": pa.array(["Nowhere_1"]),
                         "rd_title": pa.array(["No_Such_Page"])})
    idx2 = build_alias_index(_mini_kb(), cfg, redirects=dangling)
    assert ("nowhere", "1") not in idx2.token_seqs


def test_redirect_shuffle_parity(ray_session, tiny_fixture_dir):
    # the 80-entity fixture KB (a 3-row KB leaves empty-schema blocks in
    # the hash-join inputs, which pyarrow's join rejects — tiny-input
    # artifact, not a redirect concern)
    import pyarrow.parquet as pq
    import ray.data

    from sbb_ned_ray.stages.blocking import ranked_candidates_via_shuffle
    from sbb_ned_ray.stages.candidates import generate_candidates_for_surface

    cfg = PipelineConfig()
    kb = pq.read_table(f"{tiny_fixture_dir}/kb_entities.parquet")
    from sbb_ned_ray.sources.pages import read_redirects
    rd_table = read_redirects(tiny_fixture_dir)
    rd = redirect_map(rd_table)
    assert rd, "fixture redirects should survive normalization"
    idx = build_alias_index(kb, cfg, redirects=rd_table)
    # two redirect-only surfaces + two ordinary alias surfaces
    rd_surfaces = [k.title() for k in sorted(rd)[:2]]
    surfaces = rd_surfaces + [kb["label"][0].as_py(), kb["label"][5].as_py()]
    mentions_ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u"] * len(surfaces)),
        "mention_id": pa.array([f"m{i}" for i in range(len(surfaces))]),
        "surface": pa.array(surfaces),
    }))
    sh = ranked_candidates_via_shuffle(
        mentions_ds, kb, cfg, redirects=rd_table).to_pandas() \
        .sort_values(["surface", "rank"]).reset_index(drop=True)
    assert set(sh["surface"]) & set(rd_surfaces), \
        "redirect-only surfaces must produce shuffle candidates"
    rows = []
    for s in surfaces:
        for eid, dist, uniq, cov, proba, rank in \
                generate_candidates_for_surface(s, idx, cfg):
            rows.append((s, idx.qids[eid], rank, dist, uniq, cov))
    rows.sort(key=lambda r: (r[0], r[2]))
    assert len(sh) == len(rows)
    assert list(zip(sh["surface"], sh["qid"], sh["rank"])) == \
           [(s, q, r) for s, q, r, _, _, _ in rows]
    assert np.allclose(sh["dist"], [r[3] for r in rows], atol=1e-5)
    assert np.allclose(sh["match_uniqueness"], [r[4] for r in rows])
    assert np.allclose(sh["match_coverage"], [r[5] for r in rows])


def test_fixture_ships_redirects_and_fingerprint_tracks_them(
        tiny_fixture_dir):
    from sbb_ned_ray.sources.pages import read_redirects
    from sbb_ned_ray.state.artifacts import kb_fingerprint

    rd = read_redirects(tiny_fixture_dir)
    assert rd is not None and rd.num_rows > 0
    assert rd.column_names == ["rd_from_title", "rd_title"]
    # redirect-only source forms never collide with aliases: the flagship
    # over a fixture with/without the file is identical by construction
    assert all(s.startswith("Altname_")
               for s in rd["rd_from_title"].to_pylist())
    cfg = PipelineConfig()
    kb = _mini_kb()
    assert kb_fingerprint(kb, cfg) != \
        kb_fingerprint(kb, cfg, redirects=_redirects())
