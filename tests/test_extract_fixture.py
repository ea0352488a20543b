"""Byte-identical extraction invariant + fixture determinism
(BASELINE.json input_hint; FIXTURES.md §7)."""

import pyarrow.parquet as pq

from sbb_ned_ray.fixtures.generator import FixtureSpec, generate_fixture
from sbb_ned_ray.functions.extract import extract_text


def test_extract_basic_html():
    html = (b"<html><head><title>T</title><style>p{}</style></head>"
            b"<body><h1>Head</h1><!-- c --><p>a  b</p><p>x &amp; y</p>"
            b"<script>var z;</script></body></html>")
    assert extract_text(html) == "T\nHead\na b\nx & y"


def test_extract_normalizes_and_scrubs():
    html = "<p>Paſſau\x00 liegt</p>".encode()
    assert extract_text(html) == "Passau liegt"


def test_fixture_byte_identical_and_deterministic():
    spec = FixtureSpec(n_pages=40, n_entities=40, n_gt_pairs=60)
    t1 = generate_fixture(spec)
    t2 = generate_fixture(spec)
    for name in t1:
        if isinstance(t1[name], str):      # clef_tsv is a text blob
            assert t1[name] == t2[name], name
        else:
            assert t1[name].equals(t2[name]), name
    pages = t1["pages"]
    for i in range(pages.num_rows):
        assert extract_text(pages["html"][i].as_py()) == \
            pages["text"][i].as_py()


def test_fixture_gold_spans_resolve(tiny_fixture_dir):
    pages = pq.read_table(f"{tiny_fixture_dir}/pages")
    gt = pq.read_table(f"{tiny_fixture_dir}/mentions_gt.parquet").to_pandas()
    texts = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    for _, r in gt.iterrows():
        line = texts[r.url].split("\n")[r.sent_no]
        toks = line.split(" ")
        assert " ".join(toks[r.tok_start:r.tok_end]) == r.surface


def test_fixture_has_ambiguity_and_pairs(tiny_fixture_dir):
    kb = pq.read_table(f"{tiny_fixture_dir}/kb_entities.parquet").to_pandas()
    fams = kb[kb.family_id >= 0].groupby("family_id")
    assert len(fams) >= 2
    for _, fam in fams:
        assert fam.label.nunique() == 1      # shared surface
        assert fam.qid.nunique() == len(fam)  # distinct entities
    pairs = pq.read_table(
        f"{tiny_fixture_dir}/mention_pairs_gt.parquet").to_pandas()
    assert (pairs.same_entity == 1).any() and (pairs.same_entity == 0).any()
