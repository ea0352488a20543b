"""BertPairScorer adapter: interface conformance against the stub
scorer, masked-batching correctness of the numpy mini model, and the
split-scorer pipeline wiring."""

import numpy as np
import pyarrow as pa
import pytest

from sbb_ned_ray.config import PipelineConfig
from sbb_ned_ray.stages.bert_scorer import BertPairScorer, NumpyMiniBert
from sbb_ned_ray.stages.scorer import DeterministicOverlapScorer


def _pair_batch(n: int = 6) -> pa.Table:
    rows = {k: [] for k in ("url", "mention_id", "surface", "cand_entity",
                            "candidate_title", "qid", "rank", "proba",
                            "pair_no", "tok_a", "pos_a", "end_a",
                            "tok_b", "pos_b", "end_b")}
    for i in range(n):
        rows["url"].append(f"https://x/{i}")
        rows["mention_id"].append(f"m{i}")
        rows["surface"].append("anna hilton")
        rows["cand_entity"].append(i % 3)
        rows["candidate_title"].append("Anna_Hilton")
        rows["qid"].append(f"Q{i % 3}")
        rows["rank"].append(0)
        rows["proba"].append(0.5)
        rows["pair_no"].append(i % 2)
        rows["tok_a"].append(["der", "anna", "hilton", f"ctx{i}", "war"])
        rows["pos_a"].append(1)
        rows["end_a"].append(3)
        rows["tok_b"].append(["anna", "hilton", f"ctx{i % 3}", "stadt"])
        rows["pos_b"].append(0)
        rows["end_b"].append(2)
    t = pa.table({k: pa.array(v) for k, v in rows.items()})
    return t.set_column(t.column_names.index("rank"), "rank",
                        pa.array(rows["rank"], pa.int32()))


def test_interface_conformance_with_stub():
    """Same input batch through both scorers: identical output schema,
    p0+p1=1, score=log(p1/p0), token payload dropped, deterministic."""
    cfg = PipelineConfig()
    batch = _pair_batch()
    out_stub = DeterministicOverlapScorer(cfg)(batch)
    out_bert = BertPairScorer(cfg)(batch)
    assert out_stub.column_names == out_bert.column_names
    for out in (out_stub, out_bert):
        p0 = np.asarray(out["p0"].to_pylist())
        p1 = np.asarray(out["p1"].to_pylist())
        s = np.asarray(out["score"].to_pylist())
        np.testing.assert_allclose(p0 + p1, 1.0, atol=1e-12)
        np.testing.assert_allclose(s, np.log(p1 / p0), atol=1e-9)
        assert "tok_a" not in out.column_names
    again = BertPairScorer(cfg)(batch)
    assert out_bert["score"].to_pylist() == again["score"].to_pylist()


def test_mini_bert_masked_batching():
    """Forward over a padded batch must equal per-row forwards — the
    padding mask isolates rows (no cross-row or pad leakage)."""
    m = NumpyMiniBert(vocab_size=1000, d=16, n_layers=2, n_heads=2,
                      max_len=32)
    rng = np.random.default_rng(0)
    L = 16
    lens = [5, 9, 16]
    ids = np.zeros((3, L), dtype=np.int32)
    mask = np.zeros((3, L), dtype=np.int32)
    segs = np.zeros((3, L), dtype=np.int32)
    for i, ln in enumerate(lens):
        ids[i, :ln] = rng.integers(1, 1000, ln)
        mask[i, :ln] = 1
        segs[i, :ln] = rng.integers(0, 3, ln)
    batched = m.forward(ids, mask, segs)
    for i in range(3):
        solo = m.forward(ids[i:i + 1], mask[i:i + 1], segs[i:i + 1])
        np.testing.assert_allclose(batched[i], solo[0], rtol=1e-4,
                                   atol=1e-5)


def test_pad_invariance():
    """Extra pad columns must not change logits (mask correctness)."""
    m = NumpyMiniBert(vocab_size=500, d=16, n_layers=1, n_heads=2,
                      max_len=64)
    ids = np.array([[7, 8, 9, 0, 0, 0]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 0, 0, 0]], dtype=np.int32)
    segs = np.zeros((1, 6), dtype=np.int32)
    wide_ids = np.pad(ids, ((0, 0), (0, 10)))
    wide_mask = np.pad(mask, ((0, 0), (0, 10)))
    wide_segs = np.pad(segs, ((0, 0), (0, 10)))
    a = m.forward(ids, mask, segs)
    b = m.forward(wide_ids, wide_mask, wide_segs)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_split_scorer_pipeline_with_bert(tiny_fixture_dir):
    """The GPU-deployment path with the BERT adapter produces one link
    row per decided mention end-to-end (scores are untrained-model
    noise — this asserts plumbing, not quality)."""
    import dataclasses

    from sbb_ned_ray.pipelines.ned import build_ned_links, top_links
    from sbb_ned_ray.sources.pages import read_pages

    # 30 pages + short windows: the untrained mini model is ~100×
    # slower per pair than the stub; plumbing needs rows, not volume
    cfg = dataclasses.replace(PipelineConfig(), max_seq_len=48)
    pages = read_pages(tiny_fixture_dir, columns=["url", "warc_ts",
                                                  "html", "lang"],
                       override_num_blocks=8).limit(30)
    links = top_links(build_ned_links(
        tiny_fixture_dir, cfg, scorer_cls=BertPairScorer,
        split_scorer=True, pages_ds=pages)).to_pandas()
    assert len(links) > 0
    assert links["mention_key"].is_unique
    assert set(links.columns) >= {"mention_key", "qid", "proba_1"}
