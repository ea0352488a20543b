"""CCNet-style bigram-LM perplexity bucketing: model fit, scoring
semantics, exact tercile cutoffs, and partitioning-invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs(rows, nparts=4):
    import ray.data as rd
    t = pa.table({
        "doc_id": pa.array([i for i, *_ in rows], pa.int64()),
        "text": pa.array([x for _, x, *_ in rows]),
        "lang": pa.array([r[2] if len(r) > 2 else "en" for r in rows]),
    })
    return rd.from_arrow(t).repartition(nparts)


def test_lm_prefers_seen_bigrams(ray_session):
    from sbb_ned_ray.stages.analysis import train_bigram_lm
    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows.append((99, "zqx wvu ponm lkj hgf"))
    lm = train_bigram_lm(_docs(rows))
    seen = lm.doc_nll("the cat sat on the mat")
    unseen = lm.doc_nll("mat the on sat cat the")   # reversed transitions
    novel = lm.doc_nll("completely different words here")
    assert seen < unseen
    assert seen < novel
    # short docs score 0 by contract
    assert lm.doc_nll("one") == 0.0
    assert lm.doc_nll("") == 0.0


def test_lm_exact_add_k_probability(ray_session):
    """One hand-checkable transition: p(b|a) = (c_ab + k)/(c_a + k(V+1))."""
    from sbb_ned_ray.stages.analysis import train_bigram_lm
    # corpus: "a b" ×3 and "a c" ×1 → c_a=4, c_ab=3, V=3, k=0.5
    rows = [(0, "a b"), (1, "a b"), (2, "a b"), (3, "a c")]
    lm = train_bigram_lm(_docs(rows), add_k=0.5)
    want = -np.log((3 + 0.5) / (4 + 0.5 * (3 + 1)))
    assert abs(lm.doc_nll("a b") - want) < 1e-12


def test_tercile_cutoffs_exact_and_partition_invariant(ray_session):
    from sbb_ned_ray.stages.analysis import (
        perplexity_buckets,
        perplexity_tercile_cutoffs,
        score_perplexity,
        train_bigram_lm,
    )
    rng = np.random.RandomState(7)
    vocab = [f"w{j}" for j in range(30)]
    rows = []
    for i in range(90):
        # repetitive docs early (low nll), shuffled-vocab docs later
        if i < 30:
            rows.append((i, "the cat sat " * 10, "en"))
        else:
            rows.append((i, " ".join(rng.choice(vocab, 40)), "en"))
    for nparts in (2, 8):
        docs = _docs(rows, nparts)
        lm = train_bigram_lm(docs)
        scored = score_perplexity(docs, lm).materialize()
        cuts = perplexity_tercile_cutoffs(scored)
        df = perplexity_buckets(scored, cuts).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        v = np.sort(df["nll_e6"].to_numpy())
        n = len(v)
        import math
        q1 = int(v[math.ceil(n / 3) - 1])
        q2 = int(v[math.ceil(2 * n / 3) - 1])
        assert cuts["en"] == (q1, q2)
        # the repetitive docs must dominate the head bucket
        head_ids = set(df.loc[df["ppl_bucket"] == "head", "doc_id"])
        assert sum(1 for i in head_ids if i < 30) >= 25
        if nparts == 2:
            first = df
        else:
            assert (first["nll_e6"] == df["nll_e6"]).all()
            assert (first["ppl_bucket"] == df["ppl_bucket"]).all()


def test_topk_by_count_is_exact_and_partition_invariant(ray_session):
    """The partial top-k that replaced the global sort must pick the
    exact global top-k under the (cnt desc, key asc) total order, for
    any block layout and at a tie-heavy cap boundary."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from sbb_ned_ray.stages.analysis import _topk_by_count

    # many boundary ties: counts cycle 1..5 over 200 keys
    keys = [f"k{i:03d}" for i in range(200)]
    cnts = [(i % 5) + 1 for i in range(200)]
    want = pd.DataFrame({"tok": keys, "cnt": cnts}) \
        .sort_values(["cnt", "tok"], ascending=[False, True],
                     kind="mergesort").head(37).reset_index(drop=True)
    for nparts in (1, 3, 16):
        ds = rd.from_arrow(pa.table({
            "tok": pa.array(keys), "cnt": pa.array(cnts, pa.int64())})) \
            .repartition(nparts)
        got = _topk_by_count(ds, "tok", "cnt", 37)
        pd.testing.assert_frame_equal(got, want)


def test_train_bigram_lm_capped_vocab_matches_global_rule(ray_session):
    """With vocab_size below the distinct-token count the kept vocab
    must equal the global (cnt desc, tok asc) top-k — the containment
    guarantee of the per-block selection."""
    import numpy as np

    from sbb_ned_ray.stages.analysis import train_bigram_lm

    rows = []
    for i in range(60):
        # token j appears in docs j.. (frequency grows with j)
        toks = [f"w{j:02d}" for j in range(i % 20, 20)]
        rows.append((i, " ".join(toks), "en"))
    for nparts in (2, 8):
        docs = _docs(rows, nparts)
        lm = train_bigram_lm(docs, vocab_size=7)
        # global rule: w19 is most frequent, then w18, ... keep 7
        want = sorted(f"w{j:02d}" for j in range(13, 20))
        assert lm.vocab.tolist() == want
