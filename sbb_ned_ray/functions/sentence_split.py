"""Deterministic rule-based sentence splitter over token lists.

Reference parity target: ``clef_hipe_2020.py:62-65`` resequences
TOKEN_ID by splitting each document's token list into sentences with
the SoMaJo splitter (``sentence_splitter.split(tokens)`` →
``TOKEN_ID = [i for s in sentences for i in range(len(s))]``).  SoMaJo
itself is a dependency we do not ship; this module implements the
standard published sentence-boundary heuristics over ALREADY-TOKENIZED
text (the only mode the reference uses — its input is CLEF token rows):

* a sentence ends at a terminator token (``. ! ? …``, possibly glued to
  the preceding word by OCR) when the next token starts — after
  skipping opening quotes/brackets — with an uppercase letter or a
  digit;
* a ``.`` does NOT terminate after a known abbreviation, a single
  letter (initials, "J. Meier"), or a bare number (German ordinal
  dates, "19. Juni");
* the document end always closes the last sentence.

Used by the CLEF converters as the fallback when a file carries no
``EndOfSentence`` MISC flags (HIPE data has them; generic NER TSVs do
not).
"""

from __future__ import annotations

# German + shared abbreviations (stored without the trailing dot,
# lowercased).  Single letters are handled by rule, not by list.
ABBREVIATIONS = frozenset("""
abb abs allg bzw ca cf dgl dr etc evtl ff geb gest ggf hr hrsg inkl
jh jhd kgl lt max min mind mio mrd nr o.ä prof s.a sog st str u.a
u.u usw vgl z.b z.t zit zzgl
""".split())

_TERMINATORS = {".", "!", "?", "…", "!!", "??", "?!", "!?", "...", "!?!"}
_OPENERS = "\"'«»„“”‚‘’([{"


def _is_terminator(tok: str) -> bool:
    """Standalone terminator token, or a word with one glued on
    (OCR: ``regnete.``).  Bare numbers with a glued dot are ordinals
    in German (``19.``), not terminators."""
    if tok in _TERMINATORS:
        return True
    if len(tok) > 1 and tok[-1] in ".!?…":
        body = tok[:-1]
        if tok[-1] == "." and (body.isdigit() or len(body) == 1
                               or body.lower() in ABBREVIATIONS):
            return False
        return True
    return False


def _guarded_dot(tokens: list[str], i: int) -> bool:
    """A standalone ``.`` at position i is an abbreviation/initial/
    ordinal dot when the previous token says so."""
    if tokens[i] != "." or i == 0:
        return False
    prev = tokens[i - 1]
    if prev.isdigit():
        return True                      # "19 . Juni" (split ordinal)
    p = prev.lower().rstrip(".")
    return len(prev) == 1 and prev.isalpha() or p in ABBREVIATIONS


def _starts_sentence(tok: str) -> bool:
    for c in tok:
        if c in _OPENERS:
            continue
        return c.isupper() or c.isdigit()
    return False


def split_token_sentences(tokens: list[str],
                          lang: str = "de") -> list[list[str]]:
    """Token list → list of sentence token lists (concatenation is the
    input — no token is dropped or altered)."""
    sentences: list[list[str]] = []
    cur: list[str] = []
    n = len(tokens)
    for i, tok in enumerate(tokens):
        cur.append(tok)
        if not _is_terminator(tok) or _guarded_dot(tokens, i):
            continue
        if i + 1 < n and not _starts_sentence(tokens[i + 1]):
            continue
        sentences.append(cur)
        cur = []
    if cur:
        sentences.append(cur)
    return sentences


def resequence_token_ids(tokens: list[str],
                         lang: str = "de") -> tuple[list[int], list[int]]:
    """The reference's TOKEN_ID resequencing (clef_hipe_2020.py:62-65):
    returns (sent_no, token_no) per token, numbering within split
    sentences."""
    sent_nos: list[int] = []
    token_nos: list[int] = []
    for s, sent in enumerate(split_token_sentences(tokens, lang)):
        sent_nos.extend([s] * len(sent))
        token_nos.extend(range(len(sent)))
    return sent_nos, token_nos
