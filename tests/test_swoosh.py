"""R-Swoosh merge-based ER: ICAR equivalence to match-graph
components, determinism, and merge-closure."""
import numpy as np
import pandas as pd

from sbb_ned_ray.functions.phonetic import soundex_col
from sbb_ned_ray.stages.linkage import (_pad_codes, jw_row,
                                        phonetic_records_path,
                                        r_swoosh)

SF = "/root/testdata/sf0.001"
THR = 900_000


def _fixture_with_sdx():
    rec = pd.read_parquet(phonetic_records_path(SF))
    rec["sdx"] = soundex_col(rec["surname"])
    return rec


def _pairwise_match(names: list[str]) -> np.ndarray:
    uniq = sorted(set(names))
    cand_mat, cand_lens = _pad_codes(uniq)
    m = np.zeros((len(uniq), len(uniq)), dtype=bool)
    for i, n in enumerate(uniq):
        jw = jw_row(n, cand_mat, cand_lens)
        m[i] = np.floor(jw * 1_000_000 + 0.5) >= THR
    col = {n: i for i, n in enumerate(uniq)}
    idx = np.array([col[n] for n in names])
    return m[np.ix_(idx, idx)]


def _union_find_components(rec: pd.DataFrame) -> dict:
    """Driver-side reference: per block, components of the pairwise
    JW>=thr graph; each component merged (the ICAR closed form)."""
    out = {}
    for _, blk in rec.groupby("sdx"):
        blk = blk.sort_values("rec_id")
        ids = blk["rec_id"].astype(int).tolist()
        m = _pairwise_match(blk["name"].tolist())
        parent = list(range(len(ids)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if m[i, j]:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[ri] = rj
        comps = {}
        for i in range(len(ids)):
            comps.setdefault(find(i), []).append(i)
        for members in comps.values():
            rid = sorted(ids[i] for i in members)
            names = sorted({blk["name"].iloc[i] for i in members})
            out[rid[0]] = (len(rid),
                           ",".join(map(str, rid)), "|".join(names))
    return out


def test_r_swoosh_equals_components(ray_session):
    """The Swoosh fixpoint == merged match-graph components
    (Benjelloun et al.'s ICAR theorem), checked against an
    independent driver union-find."""
    import ray
    rec = _fixture_with_sdx()
    want = _union_find_components(rec)
    got = r_swoosh(ray.data.from_pandas(rec), "sdx", "rec_id",
                   "name").to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples():
        n, members, names = want[row.canon_id]
        assert (row.n_members, row.members, row.names) == \
            (n, members, names), row.canon_id


def test_r_swoosh_deterministic(ray_session):
    import ray
    rec = _fixture_with_sdx()
    a = r_swoosh(ray.data.from_pandas(rec), "sdx", "rec_id", "name") \
        .to_pandas().sort_values("canon_id").reset_index(drop=True)
    b = r_swoosh(ray.data.from_pandas(rec.sample(frac=1.0,
                                                 random_state=7)),
                 "sdx", "rec_id", "name") \
        .to_pandas().sort_values("canon_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_r_swoosh_merge_closed(ray_session):
    """No two surviving entities in the same block still match —
    the fixpoint property."""
    import ray
    rec = _fixture_with_sdx()
    got = r_swoosh(ray.data.from_pandas(rec), "sdx", "rec_id",
                   "name").to_pandas()
    rid_to_sdx = dict(zip(rec["rec_id"].astype(int), rec["sdx"]))
    got["sdx"] = got["canon_id"].map(rid_to_sdx)
    for _, blk in got.groupby("sdx"):
        ents = [set(n.split("|")) for n in blk["names"]]
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                names = sorted(ents[i] | ents[j])
                m = _pairwise_match(names)
                col = {n: k for k, n in enumerate(sorted(set(names)))}
                ia = [col[n] for n in ents[i]]
                jb = [col[n] for n in ents[j]]
                assert not m[np.ix_(ia, jb)].any()
