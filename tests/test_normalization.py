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


def test_embedder_interface():
    """AnagramEmbedder conforms to the PartEmbedder surface; the
    model-backed adapters raise a clean ImportError when their optional
    dependency is absent (this container has neither gensim nor
    flair)."""
    import numpy as np
    import pytest as _pytest

    from sbb_ned_ray.functions.embedders import (
        AnagramEmbedder,
        FastTextEmbedder,
        FlairBertEmbedder,
        make_embedder,
    )

    e = make_embedder("anagram")
    assert isinstance(e, AnagramEmbedder) and e.dim == 36
    M = e.embed(["paris", "berlin", ""])
    assert M.shape == (3, 36) and M.dtype == np.float32
    norms = np.linalg.norm(M, axis=1)
    assert abs(norms[0] - 1.0) < 1e-5 and norms[2] == 0.0
    with _pytest.raises(ImportError):
        FastTextEmbedder("/nonexistent.bin")
    with _pytest.raises(ImportError):
        FlairBertEmbedder("bert-base-german-cased")


def test_snowball_german():
    """Published German Snowball algorithm outputs (same as NLTK's
    SnowballStemmer('german') for these inputs)."""
    from sbb_ned_ray.functions.stemming import snowball_de, stem_word

    cases = {
        "häusern": "haus",
        "bücher": "buch",
        "katzen": "katz",
        "laufen": "lauf",
        "kleider": "kleid",
        "aufeinander": "aufeinand",
        "verständnisse": "verstandnis",
        "bezeichnungen": "bezeichn",
        "mädchen": "madch",
        "bäume": "baum",
        "tage": "tag",
        "universität": "universitat",
        "freundlich": "freundlich",
        "größe": "gross",
        "rom": "rom",
    }
    for w, expect in cases.items():
        assert snowball_de(w) == expect, (w, snowball_de(w))
    assert stem_word("häusern", "german") == "haus"


def test_snowball_english_porter2():
    """Published English Snowball (Porter2) outputs — exceptional forms
    plus hand-traced regular cases (same as NLTK's
    SnowballStemmer('english') for these inputs)."""
    from sbb_ned_ray.functions.stemming import snowball_en, stem_word

    cases = {
        # exceptional forms (hard-coded in the published algorithm)
        "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
        "early": "earli", "only": "onli", "singly": "singl",
        "news": "news", "sky": "sky", "bias": "bias",
        "proceed": "proceed", "inning": "inning", "earring": "earring",
        # step 1a
        "caresses": "caress", "ponies": "poni", "ties": "tie",
        "cats": "cat", "kiwis": "kiwi",
        # step 1b + fixups
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "hoping": "hope", "falling": "fall",
        # step 1c
        "crying": "cri", "happy": "happi", "by": "by", "say": "say",
        # steps 2-5
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc",
        "digitizer": "digit", "national": "nation",
        "generously": "generous", "knightly": "knight",
        "goodness": "good", "paris": "pari",
    }
    for w, expect in cases.items():
        assert snowball_en(w) == expect, (w, snowball_en(w))
    assert stem_word("skies", "en") == "sky"
    assert stem_word("skies", "english") == "sky"
    assert stem_word("paris", "fr") == "pari"   # light-stem fallback


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
