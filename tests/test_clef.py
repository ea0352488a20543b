"""CLEF-HIPE TSV converter round trip: shared-task file → neat TSV →
mention rows == gold spans, and neat → CLEF back-conversion preserves
tokens/tags/links."""

import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def clef_paths(tmp_path_factory):
    from sbb_ned_ray.fixtures.generator import (
        FixtureSpec,
        materialize_fixture,
    )
    from sbb_ned_ray.sources.clef import clef_to_neat, neat_to_clef

    d = materialize_fixture(
        FixtureSpec(n_pages=120, n_entities=80, n_gt_pairs=300))
    base = tmp_path_factory.mktemp("clef")
    clef = os.path.join(d, "clef.tsv")
    neat = str(base / "neat.tsv")
    clef2 = str(base / "roundtrip.tsv")
    clef_to_neat(clef, neat)
    neat_to_clef(neat, clef2)
    return d, clef, neat, clef2


def test_tag_coarsening_and_headers(clef_paths):
    """clef→neat applies the clef_hipe_2020.py:113-124 coarsening and
    keeps one # document_id header per page."""
    from sbb_ned_ray.sources.clef import read_neat_tsv

    d, clef, neat, _ = clef_paths
    df = read_neat_tsv(neat)
    assert set(df["NE-TAG"].str[:1].unique()) <= {"B", "I", "O"}
    tagged = df.loc[df["NE-TAG"] != "O", "NE-TAG"]
    assert set(tagged.str[2:5].unique()) <= {"PER", "LOC", "ORG"}
    assert tagged.str.isupper().all()
    with open(neat, encoding="utf-8") as f:
        n_headers = sum(1 for ln in f if ln.startswith("# document_id"))
    assert n_headers == 120


def test_clef_roundtrip_preserves_content(clef_paths):
    """clef → neat → clef: token stream, coarse tags (modulo the
    lower/upper case convention) and entity links survive."""
    from sbb_ned_ray.sources.clef import read_clef_tsv

    d, clef, neat, clef2 = clef_paths
    _, a = read_clef_tsv(clef)
    _, b = read_clef_tsv(clef2)
    assert len(a) == len(b)
    assert a["TOKEN"].tolist() == b["TOKEN"].tolist()
    assert a["url"].tolist() == b["url"].tolist()
    norm_a = a["NE-COARSE-LIT"].str.upper().str[:5]
    norm_b = b["NE-COARSE-LIT"].str.upper().str[:5]
    assert norm_a.tolist() == norm_b.tolist()
    la = a["NEL-LIT"].fillna("-").tolist()
    lb = b["NEL-LIT"].fillna("-").tolist()
    assert la == lb


def test_hash_initial_tokens_survive_roundtrip(tmp_path):
    """ADVICE round 2: a token row whose TOKEN is '#' or starts with
    '#' ('#redirect', OCR noise) is a TOKEN, not metadata — only
    ``# key = value`` lines are skipped."""
    from sbb_ned_ray.sources.clef import (
        clef_to_neat,
        read_clef_tsv,
        read_neat_tsv,
    )

    cols = ["TOKEN", "NE-COARSE-LIT", "NE-COARSE-METO", "NE-FINE-LIT",
            "NE-FINE-METO", "NE-FINE-COMP", "NE-NESTED", "NEL-LIT",
            "NEL-METO", "MISC"]
    body = [
        "\t".join(cols),
        "# document_id = https://example.org/1",
        "# segment_iiif_link = _",
        "\t".join(["#"] + ["O"] * 6 + ["-", "-", "-"]),
        "\t".join(["#redirect"] + ["O"] * 6 + ["-", "-", "-"]),
        "\t".join(["word"] + ["O"] * 6 + ["-", "-", "EndOfSentence"]),
    ]
    src = tmp_path / "hash.tsv"
    src.write_text("\n".join(body) + "\n", encoding="utf-8")
    _, df = read_clef_tsv(str(src))
    assert df["TOKEN"].tolist() == ["#", "#redirect", "word"]
    assert df["url"].nunique() == 1
    neat = tmp_path / "hash_neat.tsv"
    clef_to_neat(str(src), str(neat))
    ndf = read_neat_tsv(str(neat))
    assert ndf["TOKEN"].tolist() == ["#", "#redirect", "word"]


def test_clef_mentions_match_gold(clef_paths):
    """The full loop (CLEF file → neat → BIO parse) reproduces the gold
    mention spans exactly."""
    from sbb_ned_ray.sources.clef import neat_tokens_table
    from sbb_ned_ray.stages.mentions import parse_ner_batch

    d, clef, neat, _ = clef_paths
    toks = neat_tokens_table(neat)
    parsed = parse_ner_batch(toks).to_pandas()
    gold = pd.read_parquet(os.path.join(d, "mentions_gt.parquet"))
    cols = ["url", "mention_id", "sent_no", "tok_start", "tok_end",
            "type"]
    a = parsed[cols].sort_values(cols[:2]).reset_index(drop=True)
    b = gold[cols].sort_values(cols[:2]).reset_index(drop=True)
    a["sent_no"] = a["sent_no"].astype("int64")
    b["sent_no"] = b["sent_no"].astype("int64")
    for c in ("tok_start", "tok_end"):
        a[c] = a[c].astype("int64")
        b[c] = b[c].astype("int64")
    assert a.equals(b)
