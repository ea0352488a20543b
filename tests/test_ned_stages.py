"""Stage-level NED tests, run locally (stage callables invoked directly
on Arrow tables — no Ray session needed): detector recall, candidate
recall (FIXTURES.md §7(b)), linking accuracy of the scorer+decider."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.stages.candidates import CandidateGenerator
from sbb_ned_ray.stages.decider import _decide_group, add_mention_key, \
    partial_candidate_agg
from sbb_ned_ray.stages.mentions import MentionDetector, parse_ner_sentence
from sbb_ned_ray.stages.pairs import PairBuilder, build_pair_window, \
    locate_entity
from sbb_ned_ray.stages.scorer import DeterministicOverlapScorer
from sbb_ned_ray.state.alias_index import build_alias_index


@pytest.fixture(scope="module")
def ned_ctx(tiny_fixture_dir):
    kb = pq.read_table(f"{tiny_fixture_dir}/kb_entities.parquet")
    cfg = PipelineConfig()
    index = build_alias_index(kb, cfg)
    pages = pq.read_table(f"{tiny_fixture_dir}/pages")
    gt = pq.read_table(f"{tiny_fixture_dir}/mentions_gt.parquet").to_pandas()
    return {"kb": kb, "cfg": cfg, "index": index, "pages": pages, "gt": gt}


def _detect(ned_ctx):
    det = MentionDetector(ned_ctx["index"])
    return det(ned_ctx["pages"]).to_pandas()


def test_detector_finds_all_gold_mentions(ned_ctx):
    found = _detect(ned_ctx)
    gt = ned_ctx["gt"]
    got = set(zip(found.url, found.sent_no, found.tok_start))
    missing = [r for _, r in gt.iterrows()
               if (r.url, r.sent_no, r.tok_start) not in got]
    assert not missing, f"{len(missing)} gold mentions undetected: {missing[:3]}"


def test_candidate_recall_is_one(ned_ctx):
    """The gold entity must be among the generated candidates
    (candidate recall = 1.0, FIXTURES.md §7(b))."""
    found = _detect(ned_ctx)
    gt = ned_ctx["gt"]
    gen = CandidateGenerator(ned_ctx["index"], ned_ctx["cfg"])
    import pyarrow as pa
    cands = gen(pa.Table.from_pandas(found, preserve_index=False)).to_pandas()
    cand_map = cands.groupby(["url", "mention_id"]).qid.apply(set)
    merged = found.merge(gt, on=["url", "sent_no", "tok_start"],
                         suffixes=("", "_gt"))
    missing = 0
    for _, r in merged.iterrows():
        qids = cand_map.get((r.url, r.mention_id), set())
        if r.qid not in qids:
            missing += 1
    assert missing == 0, f"{missing}/{len(merged)} gold entities not in candidates"


def test_end_to_end_linking_accuracy(ned_ctx):
    """Local run of detect → candidates → pairs → score → decide;
    top-1 link must equal the gold qid for ≥99% of mentions."""
    import pyarrow as pa
    cfg = ned_ctx["cfg"]
    found = _detect(ned_ctx)
    gen = CandidateGenerator(ned_ctx["index"], cfg)
    cands = gen(pa.Table.from_pandas(found, preserve_index=False))
    pb = PairBuilder(ned_ctx["index"], cfg)
    pairs = pb(cands)
    scorer = DeterministicOverlapScorer(cfg)
    scored = scorer(pairs)
    partials = partial_candidate_agg(add_mention_key(scored)).to_pandas()
    links = []
    for _, g in partials.groupby("mention_key", sort=False):
        out = _decide_group(g, cfg.threshold)
        if len(out):
            links.append(out.iloc[0])
    links = pd.DataFrame(links)
    gt = ned_ctx["gt"]
    merged = found.merge(gt, on=["url", "sent_no", "tok_start"],
                         suffixes=("", "_gt"))
    gold = {(r.url, r.mention_id): r.qid for _, r in merged.iterrows()}
    total = correct = 0
    linked = {(r.url, r.mention_id): r.qid for _, r in links.iterrows()}
    for k, gq in gold.items():
        total += 1
        if linked.get(k) == gq:
            correct += 1
    acc = correct / max(1, total)
    assert acc >= 0.99, f"linking accuracy {acc:.3f} ({correct}/{total})"


def test_parse_ner_sentence_bio_grouping():
    toks = [
        {"word": "Paris", "prediction": "B-PER"},
        {"word": "Hilton", "prediction": "I-PER"},
        {"word": "wohnt", "prediction": "O"},
        {"word": "im", "prediction": "O"},
        {"word": "Hilton", "prediction": "B-ORG"},
        {"word": "Paris", "prediction": "I-ORG"},
        {"word": "in", "prediction": "O"},
        {"word": "Paris", "prediction": "B-LOC", "gt": "Q90"},
        {"word": "Paſſau", "prediction": "X-BAD"},   # invalid tag → O
    ]
    ms = parse_ner_sentence(toks)
    assert [(m["surface"], m["type"]) for m in ms] == [
        ("Paris Hilton", "PER"), ("Hilton Paris", "ORG"), ("Paris", "LOC")]
    assert ms[0]["entity_id"] == "Paris Hilton-PER"
    assert ms[2]["gt"] == ["Q90"]
    assert ms[2]["tok_start"] == 7 and ms[2]["tok_end"] == 8


def test_parse_ner_type_change_splits():
    toks = [{"word": "A", "prediction": "B-PER"},
            {"word": "B", "prediction": "I-LOC"}]
    ms = parse_ner_sentence(toks)
    assert [(m["surface"], m["type"]) for m in ms] == [("A", "PER"), ("B", "LOC")]


def test_locate_entity():
    assert locate_entity(["a", "b", "c", "b", "c", "d"], ["b", "c", "d"]) == (3, 6)
    assert locate_entity(["a"], ["z"]) == (0, 0)


def test_build_pair_window_budget_and_marks():
    tok_a = [f"a{i}" for i in range(100)]
    tok_b = [f"b{i}" for i in range(100)]
    wa, pa_, ea, wb, pb_, eb, marks = build_pair_window(
        tok_a, 50, 52, tok_b, 10, 12, max_seq_len=32)
    assert len(wa) + len(wb) <= 32 - 3
    assert wa[pa_:ea] == ["a50", "a51"]
    assert wb[pb_:eb] == ["b10", "b11"]
    assert marks.count(2) == 4
    # short inputs: everything fits
    wa, pa_, ea, wb, pb_, eb, marks = build_pair_window(
        ["x", "y"], 0, 1, ["u"], 0, 1, max_seq_len=128)
    assert wa == ["x", "y"] and wb == ["u"]


def test_fused_scorer_equals_staged_path(ned_ctx):
    """FusedPairScorer (bitmask overlap, partials emitted directly) must
    reproduce the staged PairBuilder → DeterministicOverlapScorer →
    partial_candidate_agg path exactly (same rows, same values)."""
    import numpy as np
    import pyarrow as pa

    from sbb_ned_ray.stages.fused import FusedPairScorer

    import dataclasses
    cfg = dataclasses.replace(ned_ctx["cfg"], emit_top_k=None)
    found = _detect(ned_ctx)
    mentions = pa.Table.from_pandas(found, preserve_index=False)
    cands = CandidateGenerator(ned_ctx["index"], cfg)(mentions)

    staged = partial_candidate_agg(add_mention_key(
        DeterministicOverlapScorer(cfg)(
            PairBuilder(ned_ctx["index"], cfg)(cands)))).to_pandas()
    fused = FusedPairScorer(ned_ctx["index"], cfg)(
        cands.drop_columns(["sent_tokens"]), mentions).to_pandas()

    key = ["mention_key", "candidate_title"]
    staged = staged.sort_values(key).reset_index(drop=True)
    fused = fused.sort_values(key).reset_index(drop=True)
    assert len(staged) == len(fused)
    for c in staged.columns:
        assert c in fused.columns, c
        if staged[c].dtype.kind == "f":
            assert np.allclose(staged[c], fused[c], atol=1e-12), c
        else:
            assert (staged[c].astype(str) == fused[c].astype(str)).all(), c


def test_scorer_cached_equals_score_batch(ned_ctx):
    """The bitmask-cached __call__ path must equal the reference
    per-pair score_batch formula."""
    import numpy as np
    import pyarrow as pa

    cfg = ned_ctx["cfg"]
    found = _detect(ned_ctx)
    cands = CandidateGenerator(ned_ctx["index"], cfg)(
        pa.Table.from_pandas(found, preserve_index=False))
    pairs = PairBuilder(ned_ctx["index"], cfg)(cands)
    sc = DeterministicOverlapScorer(cfg)
    cached = sc._score_cached(pairs)
    _, _, plain = sc.score_batch(
        pairs["tok_a"].to_pylist(), pairs["pos_a"].to_pylist(),
        pairs["end_a"].to_pylist(), pairs["tok_b"].to_pylist(),
        pairs["pos_b"].to_pylist(), pairs["end_b"].to_pylist())
    assert np.allclose(cached, plain, atol=1e-12)


def test_emit_top_k_preserves_top_ranks(ned_ctx):
    """Local pre-shuffle pruning (emit_top_k) must not change the
    decided ranks < k — only truncate deeper ones."""
    import dataclasses

    import pyarrow as pa

    from sbb_ned_ray.stages.decider import _decide_partition
    from sbb_ned_ray.stages.fused import FusedPairScorer

    cfg_full = dataclasses.replace(ned_ctx["cfg"], emit_top_k=None)
    cfg_k = dataclasses.replace(ned_ctx["cfg"], emit_top_k=3)
    found = _detect(ned_ctx)
    mentions = pa.Table.from_pandas(found, preserve_index=False)
    cands = CandidateGenerator(ned_ctx["index"], cfg_full)(mentions) \
        .drop_columns(["sent_tokens"])

    full = _decide_partition(
        FusedPairScorer(ned_ctx["index"], cfg_full)(cands, mentions)
        .to_pandas(), cfg_full.threshold)
    pruned = _decide_partition(
        FusedPairScorer(ned_ctx["index"], cfg_k)(cands, mentions)
        .to_pandas(), cfg_k.threshold)

    full3 = full[full.out_rank < 3].sort_values(
        ["mention_key", "out_rank"]).reset_index(drop=True)
    pruned3 = pruned[pruned.out_rank < 3].sort_values(
        ["mention_key", "out_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full3, pruned3)


def test_decider_features_semantics():
    """Feature-parity path (reference models/decider.py:82-167):
    case stats over one candidate's pairs, overall stats over ALL OTHER
    candidates' pairs, diff = case - overall, among_top rank fractions."""
    import numpy as np

    from sbb_ned_ray.stages.decider import decider_features

    decision = pd.DataFrame({
        "guessed_title": ["A", "A", "B", "B", "B", "C"],
        "scores": [3.0, 1.0, 2.0, 0.5, -1.0, 4.0],
    })
    candidates = pd.DataFrame({
        "guessed_title": ["A", "B", "C"],
        "proba": [0.5, 0.3, 0.2],
    })
    feats = decider_features(decision, candidates)
    assert len(feats) == 3
    fa = feats[feats.guessed_title == "A"].iloc[0]
    # case stats of A's scores [3, 1]
    assert fa["case_scores_min"] == 1.0
    assert fa["case_scores_max"] == 3.0
    assert fa["case_scores_mean"] == 2.0
    # overall = the OTHER candidates' pairs: [2.0, 0.5, -1.0, 4.0]
    assert fa["overall_scores_max"] == 4.0
    assert np.isclose(fa["overall_scores_mean"], 1.375)
    assert np.isclose(fa["diff_scores_mean"], 2.0 - 1.375)
    # among_top: fraction of A's pairs in the global top-p score ranks
    assert "among_top_0.1" in fa.index
    # empty decision → empty frame
    assert decider_features(pd.DataFrame(), candidates).empty


def test_decider_feature_augmentation_sampling():
    """Training-time augmentation (reference models/decider.py:126-140):
    the GOLD candidate with > max_pairs pair rows is oversampled
    ceil((n - max_pairs)/10) + 1 times over random pair subsets;
    non-gold candidates get one row; seeded → deterministic."""
    import numpy as np

    from sbb_ned_ray.stages.decider import decider_features

    rng = np.random.default_rng(0)
    n_gold = 30
    decision = pd.DataFrame({
        "guessed_title": ["G"] * n_gold + ["B"] * 25,
        "scores": rng.normal(size=n_gold + 25),
        "wikidata": ["Q1"] * n_gold + ["Q2"] * 25,
    })
    candidates = pd.DataFrame({"guessed_title": ["G", "B"],
                               "proba": [0.6, 0.4]})
    feats = decider_features(decision, candidates, min_pairs=5,
                             max_pairs=10, wikidata_gt="Q1")
    n_g = (feats.guessed_title == "G").sum()
    n_b = (feats.guessed_title == "B").sum()
    assert n_g == int(np.ceil((n_gold - 10) / 10) + 1)   # 3 repeats
    assert n_b == 1
    assert (feats.loc[feats.guessed_title == "G", "label"] == 1.0).all()
    assert (feats.loc[feats.guessed_title == "B", "label"] == 0.0).all()
    # jittered: the repeated gold rows differ in their case stats
    gmeans = feats.loc[feats.guessed_title == "G", "case_scores_mean"]
    assert gmeans.nunique() > 1
    # seeded determinism
    again = decider_features(decision, candidates, min_pairs=5,
                             max_pairs=10, wikidata_gt="Q1")
    pd.testing.assert_frame_equal(feats, again)
    # inference shape unchanged (no gt, no caps): one row per candidate
    plain = decider_features(decision.drop(columns=["wikidata"]),
                             candidates)
    assert len(plain) == 2 and "label" not in plain.columns


def test_centroid_artifact_roundtrip(tmp_path):
    """IVF coarse-quantizer artifact: second call loads the persisted
    centroids (no retrain), changed sample/knobs invalidate."""
    import numpy as np

    from sbb_ned_ray.stages.similarity import load_or_train_centroids

    rng = np.random.default_rng(0)
    sample = rng.normal(size=(256, 16)).astype(np.float32)
    d = str(tmp_path / "cent")
    a = load_or_train_centroids(sample, 8, artifact_dir=d)
    import os
    mtime = os.path.getmtime(os.path.join(d, "centroids.npy"))
    b = load_or_train_centroids(sample, 8, artifact_dir=d)
    np.testing.assert_array_equal(a, b)
    assert os.path.getmtime(os.path.join(d, "centroids.npy")) == mtime
    c = load_or_train_centroids(sample, 9, artifact_dir=d)  # knob change
    assert c.shape[0] == 9


def test_kb_sentence_validity_predicates():
    """Reference sentence_lookup.py:52,85-96: redirect stubs and list
    pages are filtered from the evidence KB."""
    from sbb_ned_ray.stages.pairs import (
        is_valid_kb_page,
        is_valid_kb_sentence,
    )

    assert is_valid_kb_sentence(["anna", "hilton", "war"])
    assert not is_valid_kb_sentence(["#REDIRECT", "Anna_Hilton"])
    assert not is_valid_kb_sentence(["#Weiterleitung", "X"])
    assert is_valid_kb_sentence([])
    assert is_valid_kb_page("Anna_Hilton")
    assert not is_valid_kb_page("Liste der Städte")


def test_feature_converter_shapes_and_marks(ned_ctx):
    """convert_examples_to_features semantics (data_processor.py:506-601):
    fixed-length input_ids/mask/segment_ids, CLS/SEP placement, entity
    tokens marked with segment id 2, deterministic ids."""
    import pyarrow as pa

    from sbb_ned_ray.stages.features import (
        CLS_ID,
        SEP_ID,
        FeatureConverter,
    )

    cfg = ned_ctx["cfg"]
    found = _detect(ned_ctx)
    cands = CandidateGenerator(ned_ctx["index"], cfg)(
        pa.Table.from_pandas(found, preserve_index=False))
    pairs = PairBuilder(ned_ctx["index"], cfg)(cands)
    feats = FeatureConverter(cfg)(pairs.slice(0, 64))
    L = cfg.max_seq_len
    assert feats.num_rows == 64
    ids = feats["input_ids"].to_pylist()
    masks = feats["input_mask"].to_pylist()
    segs = feats["segment_ids"].to_pylist()
    for row_ids, row_mask, row_seg in zip(ids, masks, segs):
        assert len(row_ids) == L and len(row_mask) == L \
            and len(row_seg) == L
        assert row_ids[0] == CLS_ID
        n_real = sum(row_mask)
        assert all(m == 0 for m in row_mask[n_real:])
        assert SEP_ID in row_ids
        assert 2 in row_seg          # entity marked somewhere
    # deterministic: same input → same features
    feats2 = FeatureConverter(cfg)(pairs.slice(0, 64))
    assert feats["input_ids"].to_pylist() == feats2["input_ids"].to_pylist()
    # token columns dropped, metadata kept
    assert "tok_a" not in feats.column_names
    assert "candidate_title" in feats.column_names


def test_vectorized_indexed_scorer_bit_exact(ned_ctx):
    """The batch-vectorized _call_indexed (flat pools + searchsorted
    membership + popcount LUT + reduceat) must be BIT-exact with the
    row-loop reference implementation on a real fixture batch."""
    import pyarrow as pa

    from sbb_ned_ray.stages.fused import FusedPairScorer

    found = _detect(ned_ctx)
    mentions = pa.Table.from_pandas(found, preserve_index=False)
    cands = CandidateGenerator(ned_ctx["index"], ned_ctx["cfg"],
                               include_tokens=False)(mentions)
    assert "mention_row" in cands.column_names
    s = FusedPairScorer(ned_ctx["index"], ned_ctx["cfg"])
    out_new = s._call_indexed(cands, mentions)
    out_ref = s._call_indexed_ref(cands, mentions)
    assert out_new.equals(out_ref)
    assert out_new.num_rows > 0


def test_vectorized_generic_scorer_equals_ref(ned_ctx):
    """The vectorized _call_generic (runs recovered by factorizing
    (url, mention_id)) must equal the row-loop reference on join-shaped
    candidate rows (sent_tokens carried, no mention_row), in both the
    with-mentions and tokens-from-candidates variants — including rows
    arriving in non-grouped order."""
    import pyarrow as pa

    from sbb_ned_ray.stages.fused import FusedPairScorer

    found = _detect(ned_ctx)
    mentions = pa.Table.from_pandas(found, preserve_index=False)
    cands = CandidateGenerator(ned_ctx["index"], ned_ctx["cfg"],
                               include_tokens=True)(mentions)
    if "mention_row" in cands.column_names:
        cands = cands.drop_columns(["mention_row"])
    # scramble row order so runs are NOT contiguous
    import numpy as np
    rng = np.random.default_rng(7)
    perm = rng.permutation(cands.num_rows)
    cands = cands.take(pa.array(perm))
    for m_side in (None, mentions):
        s = FusedPairScorer(ned_ctx["index"], ned_ctx["cfg"])
        out_new = s._call_generic(cands, m_side)
        s2 = FusedPairScorer(ned_ctx["index"], ned_ctx["cfg"])
        out_ref = s2._call_generic_ref(cands, m_side)
        assert out_new.num_rows == out_ref.num_rows > 0
        a = out_new.to_pandas()
        b = out_ref.to_pandas()
        for c in a.columns:
            assert a[c].equals(b[c]), (c, m_side is None)
