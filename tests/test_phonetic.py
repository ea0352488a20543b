"""Soundex blocking: golden vectors, SQL-twin parity, and the
pair-completeness advantage over exact-surname blocking on the
phonetic fixture."""
import numpy as np
import pandas as pd
import pytest

from sbb_ned_ray.functions.phonetic import soundex, soundex_col

SF = "/root/testdata/sf0.001"

# published American Soundex examples (National Archives / Knuth TAOCP
# vol. 3; h/w-transparent variant)
GOLDEN = {
    "Robert": "R163", "Rupert": "R163",
    "Ashcraft": "A261", "Ashcroft": "A261",
    "Tymczak": "T522", "Pfister": "P236", "Honeyman": "H555",
    "Washington": "W252", "Lee": "L000", "Gutierrez": "G362",
    "Jackson": "J250", "Aachen": "A250",
    "": "", "123": "", "O Brien": "O165",
}


def test_soundex_golden_vectors():
    for name, want in GOLDEN.items():
        assert soundex(name) == want, name


def test_soundex_col_matches_scalar():
    names = list(GOLDEN) * 3 + ["Hwang", "Wwall", "Yyyy"]
    got = soundex_col(names)
    assert list(got) == [soundex(n) for n in names]
    assert len(soundex_col([])) == 0


def test_soundex_sql_twin_parity():
    """The python implementation and the DuckDB SQL chain are two
    independent expressions of the same spec — they must agree on
    every fixture surname and on the adversarial forms."""
    import os
    import tempfile

    import duckdb

    from sbb_ned_ray.pipelines.queries import _sdx_sql_cte
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    surnames = sorted(set(
        pd.read_parquet(phonetic_records_path(SF))["surname"]))
    extra = ["Hw", "Wh", "Aeiou", "McDonald", "Schmidt", "VanDeusen",
             "Pfister", "Ashcraft", "Hyman", "Wwall", ""]
    names = surnames + extra
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "names.parquet")
        pd.DataFrame({"rec_id": np.arange(len(names)),
                      "surname": names}).to_parquet(path, index=False)
        sql = (f"WITH {_sdx_sql_cte(path)} "
               f"SELECT surname, sdx FROM sx")
        got = dict(duckdb.sql(sql).fetchall())
    for n in names:
        assert got[n] == soundex(n), n


def test_perturbations_are_soundex_invariant():
    from sbb_ned_ray.stages.linkage import _perturb_phonetic
    for s in ["Anderson", "Burroughs", "Czarkowska", "Hoffmann",
              "Yamamoto", "Ab"]:
        for k in range(0, 60, 7):
            assert soundex(_perturb_phonetic(s, k)) == soundex(s), \
                (s, k)


def test_soundex_blocking_pair_completeness(ray_session):
    """Soundex blocking keeps EVERY planted duplicate pair; exact
    surname blocking misses every perturbed one."""
    from sbb_ned_ray.stages.linkage import phonetic_records_path
    rec = pd.read_parquet(phonetic_records_path(SF))
    rec["sdx"] = soundex_col(rec["surname"])
    base = rec[rec.rec_id % 2 == 0].set_index("entity_id")
    dup = rec[rec.rec_id % 2 == 1]
    assert len(dup) > 10
    same_sdx = sum(base.loc[r.entity_id].sdx == r.sdx
                   for r in dup.itertuples())
    same_exact = sum(base.loc[r.entity_id].surname == r.surname
                     for r in dup.itertuples())
    assert same_sdx == len(dup)          # pair completeness 1.0
    assert same_exact < len(dup)         # exact blocking provably loses


def test_soundex_match_finds_true_entity(ray_session):
    """Within-soundex-block JW best match recovers the true original
    for the overwhelming majority of planted duplicates (surname
    perturbations are small; given names disambiguate)."""
    from sbb_ned_ray.pipelines.queries import linkage_soundex_match
    out = linkage_soundex_match(SF)
    hit = (out["match_id"] // 2 == out["rec_id"] // 2).mean()
    assert hit >= 0.9, hit
