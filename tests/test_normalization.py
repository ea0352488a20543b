"""Golden unit tests for the surface-normalization chain
(reference semantics: embeddings/base.py:24-89, webapp/app.py:273)."""

import numpy as np

from sbb_ned_ray.functions.normalization import (
    anagram_vector,
    angular_distance,
    dehyphenate,
    filter_surface,
    light_stem,
    normalize_chars,
    normalized_surface_key,
    scrub_control_chars,
    surface_parts,
)


def test_surface_parts_split_and_lower():
    assert surface_parts("Paris Hilton") == ["paris", "hilton"]
    assert surface_parts("Nord-Bank_AG") == ["nord", "bank", "ag"]
    assert surface_parts(["A b", "c-d"]) == ["a", "b", "c", "d"]
    assert surface_parts("x", split_parts=False, lower_case=False) == ["x"]


def test_dehyphenate_joins_across_empty_parts():
    # "Lin ¬ dau": the standalone mark strips to an empty part → join
    assert dehyphenate(["lin", "¬", "dau"]) == ["lindau"]
    # trailing mark attached to a fragment does NOT join (reference parity)
    assert dehyphenate(["lin¬", "dau"]) == ["lin", "dau"]
    assert dehyphenate([]) == [""]


def test_filter_surface_full_chain():
    assert filter_surface("Lin ¬ dau") == ["lindau"]
    assert filter_surface("Paris!") == ["paris"]
    assert filter_surface("  ") == []
    assert filter_surface("Anna-Marie Müller") == ["anna", "marie", "müller"]


def test_normalize_chars_mufi():
    assert normalize_chars("Paſſau") == "Passau"
    assert normalize_chars("Grœnland–Ost") == "Groenland-Ost"


def test_scrub_control_chars_keeps_newline_tab():
    assert scrub_control_chars("a\x00b\nc\td\x07") == "ab\nc\td"


def test_normalized_surface_key():
    assert normalized_surface_key("Paſſau") == "passau"
    assert normalized_surface_key("Lin ¬ dau") == "lindau"
    assert normalized_surface_key("Paris Hilton") == "paris hilton"


def test_light_stem():
    assert light_stem("häusern") == "häus"
    assert light_stem("paris") == "pari"
    assert light_stem("rom") == "rom"


def test_anagram_vector_unit_norm_and_distance():
    v = anagram_vector("Paris")
    assert np.isclose(np.linalg.norm(v), 1.0)
    assert angular_distance(v, anagram_vector("paris")) < 1e-3
    # anagrams coincide
    assert angular_distance(v, anagram_vector("rapis")) < 1e-3
    assert angular_distance(v, anagram_vector("berlin")) > 0.5
    # diacritics fold to ascii
    assert angular_distance(anagram_vector("Müller"),
                            anagram_vector("Muller")) < 1e-3
