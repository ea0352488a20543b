"""Rule-based sentence splitter (the SoMaJo resequencing stand-in,
reference clef_hipe_2020.py:62-65) — golden boundary cases and the
CLEF fallback wiring."""

from __future__ import annotations

from sbb_ned_ray.functions.sentence_split import (
    resequence_token_ids,
    split_token_sentences,
)


def test_plain_boundaries():
    toks = "Es regnete stark . Dann kam Hans .".split()
    assert split_token_sentences(toks) == [
        "Es regnete stark .".split(), "Dann kam Hans .".split()]


def test_abbreviations_and_initials_do_not_split():
    toks = "Dr. Meier kam z. B. mit J . Schmidt .".split()
    assert split_token_sentences(toks) == [toks]


def test_german_ordinal_dates_do_not_split():
    toks = "Am 19. Juni und am 3 . Juli regnete es .".split()
    assert split_token_sentences(toks) == [toks]


def test_glued_ocr_terminators_split():
    toks = ["Es", "regnete.", "Dann", "nicht!"]
    assert split_token_sentences(toks) == [
        ["Es", "regnete."], ["Dann", "nicht!"]]


def test_terminator_needs_uppercase_continuation():
    toks = "der Fa . meier GmbH gehört es .".split()
    # lowercase continuation after "." → no split
    assert len(split_token_sentences(toks)) == 1


def test_quotes_and_questions():
    toks = ["Was", "?", "„Ja", "!", "“"]
    out = split_token_sentences(toks)
    assert out[0] == ["Was", "?"]
    assert sum(out, []) == toks


def test_unterminated_tail_closes_at_eof():
    toks = "kein Punkt am Ende".split()
    assert split_token_sentences(toks) == [toks]


def test_resequence_matches_reference_semantics():
    toks = "Hans kam . Eva ging .".split()
    sent_nos, token_nos = resequence_token_ids(toks)
    assert sent_nos == [0, 0, 0, 1, 1, 1]
    assert token_nos == [0, 1, 2, 0, 1, 2]


def test_clef_reader_falls_back_to_splitter(tmp_path):
    from sbb_ned_ray.sources.clef import CLEF_COLUMNS, read_clef_tsv

    # a CLEF file with NO EndOfSentence flags anywhere
    lines = ["\t".join(CLEF_COLUMNS),
             "# document_id = doc-1"]
    for tok, tag in [("Hans", "B-pers"), ("kam", "O"), (".", "O"),
                     ("Eva", "B-pers"), ("ging", "O"), (".", "O")]:
        lines.append("\t".join([tok, tag] + ["O"] * 7 + ["-"]))
    p = tmp_path / "noflags.tsv"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    _, df = read_clef_tsv(str(p))
    assert df["sent_no"].tolist() == [0, 0, 0, 1, 1, 1]
    assert df["token_no"].tolist() == [0, 1, 2, 0, 1, 2]
    # the derived flag marks each sentence's last token
    assert df["MISC"].tolist() == ["-", "-", "EndOfSentence",
                                   "-", "-", "EndOfSentence"]
