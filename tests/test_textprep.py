"""Unit tests for the training-corpus preparation stage
(sbb_ned_ray/stages/textprep.py): PII redaction, chunking, repetition
stats, decontamination."""

import math

import pyarrow as pa

import ray.data

from sbb_ned_ray.stages.textprep import (
    chunk_batch,
    decontaminate_ids,
    redact_batch,
    repetition_batch,
)


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_redact_batch_replaces_and_counts():
    t = redact_batch(_docs([
        "mail a.b-c@ex-ample.org or x@y.io now",
        "call 555-0199 or 555-12345 from 10.0.0.7",
        "clean text, no pii at all",
    ]))
    out = t.to_pylist()
    assert out[0]["redacted"] == "mail <EMAIL> or <EMAIL> now"
    assert out[0]["n_email"] == 2 and out[0]["n_phone"] == 0
    # 555-12345: \b\d{3}-\d{4}\b does not match (trailing digit)
    assert out[1]["redacted"] == "call <PHONE> or 555-12345 from <IP>"
    assert out[1]["n_phone"] == 1 and out[1]["n_ip"] == 1
    assert out[2]["redacted"] == out[2]["redacted"] == \
        "clean text, no pii at all"
    assert out[2]["n_email"] == out[2]["n_phone"] == out[2]["n_ip"] == 0


def test_redact_email_before_ip_ordering():
    # mail domain embedding an IPv4-looking quad: the email pass must
    # consume the whole address so the IPv4 pass cannot mangle it
    # (ip-first would yield "x@<IP>.co")
    r = redact_batch(_docs(["x@9.8.7.6.co end"])).to_pylist()[0]
    assert r["redacted"] == "<EMAIL> end"
    assert r["n_email"] == 1 and r["n_ip"] == 1   # counts are pre-replace


def test_chunk_batch_windows_and_overlap():
    toks = [f"w{i}" for i in range(10)]
    t = chunk_batch(_docs([" ".join(toks)]), chunk_size=4, stride=3)
    rows = t.to_pylist()
    assert [r["chunk_no"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w3 w4 w5 w6"     # overlap of 1
    assert rows[3]["chunk_text"] == "w9"              # last partial
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]


def test_repetition_batch_fractions():
    t = repetition_batch(_docs(["a a b", "x"]))
    r0, r1 = t.to_pylist()
    assert (r0["n_tokens"], r0["distinct_tokens"]) == (3, 2)
    assert r0["dup_frac_e6"] == math.floor((1 - 2 / 3) * 1e6 + 0.5)
    assert r0["top_token_frac_e6"] == math.floor(2 * 1e6 / 3 + 0.5)
    assert r0["top_bigram_frac_e6"] == 500000        # "a a" once of 2
    # single-token doc: no bigrams, zero dup
    assert (r1["dup_frac_e6"], r1["top_token_frac_e6"],
            r1["top_bigram_frac_e6"]) == (0, 1000000, 0)


def test_decontaminate_ids(ray_session):
    shared = " ".join(f"s{i}" for i in range(13))
    train = ray.data.from_arrow(_docs(
        ["clean " + " ".join(f"a{i}" for i in range(15)),
         "leaky prefix " + shared + " suffix",
         "tiny doc"], ids=[10, 11, 12]))
    test = ray.data.from_arrow(_docs(
        ["held out " + shared + " tail"], ids=[99]))
    out = decontaminate_ids(train, test, n=13, num_buckets=4)
    assert out["doc_id"].tolist() == [11]


def test_duplicate_spans_exact_substr(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sbb_ned_ray.stages.textprep import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(20))       # 20 shared tokens
    docs = [
        (0, "a b c " + shared + " x y z"),              # span at 3..23
        (1, shared + " q r"),                           # span at 0..20
        (2, " ".join(f"u{i}" for i in range(30))),      # unique
        # within-doc repeat only: must NOT count (needs >=2 DISTINCT docs)
        (3, " ".join(f"w{i % 6}" for i in range(40))),
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(3)
    out = duplicate_spans(ds, n=5)
    got = {(int(r.doc_id), int(r.span_start), int(r.span_end),
            int(r.n_grams)) for r in out.itertuples()}
    # doc 0: grams starting 3..18 duplicated -> span [3, 23), 16 grams
    # doc 1: grams starting 0..15 duplicated -> span [0, 20), 16 grams
    assert got == {(0, 3, 23, 16), (1, 0, 20, 16)}, got


def test_bm25_topk_ranks_and_edge_cases(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from sbb_ned_ray.stages.analysis import bm25_topk
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["cat dog cat", "dog", "fish fish fish",
                          "bird bird cat"])})
    ds = rd.from_arrow(docs).repartition(3)
    out = bm25_topk(ds, ["cat"], k=10)
    # only docs containing the term score; higher tf/shorter doc first
    assert set(out["doc_id"]) == {0, 3}
    assert list(out["bm25_rank"]) == [1, 2]
    assert (out["score_e6"] > 0).all()
    # doc 0 has tf=2 with dl=3; doc 3 tf=1 dl=3 → doc 0 ranks first
    assert out["doc_id"].iloc[0] == 0
    # term absent from corpus → empty result, stable schema
    none = bm25_topk(ds, ["zebra"], k=5)
    assert len(none) == 0
    assert list(none.columns) == ["doc_id", "score_e6", "bm25_rank"]
    # batching invariance
    a = bm25_topk(rd.from_arrow(docs).repartition(1), ["cat", "dog"], k=4)
    b = bm25_topk(rd.from_arrow(docs).repartition(4), ["cat", "dog"], k=4)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["score_e6"]) == list(b["score_e6"])


def test_duplicate_spans_duplicate_free_corpus_is_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sbb_ned_ray.stages.textprep import duplicate_spans
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta",
                          "one two three four five six seven"])})
    out = duplicate_spans(rd.from_arrow(docs), n=5)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "span_start", "span_end",
                                 "n_grams"]


def test_bm25_empty_corpus_and_empty_terms(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sbb_ned_ray.stages.analysis import bm25_topk
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = bm25_topk(rd.from_arrow(empty), ["cat"], k=5)
    assert len(out) == 0
    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["cat dog"])})
    out2 = bm25_topk(rd.from_arrow(docs), [], k=5)
    assert len(out2) == 0


def test_recrawl_latest_merges_url_variants(ray_session):
    """Canonicalization folds the fragment / query / case variants of
    a url into ONE group; the latest snapshot's md5 is the drifted
    text's when drift was planted."""
    import hashlib

    from sbb_ned_ray.pipelines.queries import (_recrawl_path,
                                               pages_recrawl_latest)
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    rec = pd.read_parquet(_recrawl_path(sf))
    out = pages_recrawl_latest(sf)
    # every canonical group's size matches the raw variant count
    canon = rec["url"].str.split("#").str[0].str.split("?").str[0] \
        .str.rstrip("/").str.lower()
    want_sizes = canon.value_counts()
    got_sizes = dict(zip(out["canon_url"], out["n_snapshots"]))
    assert got_sizes == want_sizes.to_dict()
    # drifted groups (3 snapshots) report 3 distinct texts and the
    # latest md5 equals the "+9d" variant's text
    tri = out[out["n_snapshots"] == 3]
    assert len(tri) > 0
    rec = rec.assign(canon=canon)
    for _, row in tri.head(5).iterrows():
        g = rec[rec["canon"] == row["canon_url"]]
        latest = g.loc[g["warc_ts"].idxmax(), "text"]
        assert row["n_texts"] == g["text"].nunique() == 3
        assert row["latest_md5"] == hashlib.md5(
            latest.encode()).hexdigest()
    # identical-recrawl groups (2 snapshots, h%3==0) report 1 text
    two = out[out["n_snapshots"] == 2]
    assert len(two) > 0 and (two["n_texts"] == 1).all()
