"""Snowball stemming (pure Python, dependency-free).

The reference stems normalized surface parts with NLTK's
``SnowballStemmer(app.config['STEMMER'])`` (``webapp/app.py:100-107``,
applied at ``app.py:334``) — German in the reference deployment.
:func:`snowball_de` implements the published German Snowball algorithm
(M.F. Porter's Snowball framework, the standard ``german`` script from
snowballstem.org) exactly: ß→ss, consonant-marking of u/y between
vowels, R1/R2 regions (R1 moved to ≥3), the three suffix steps with
their s-/st-ending conditions, and final umlaut removal.  Output is
identical to NLTK's ``SnowballStemmer("german")`` for the algorithm's
defined behavior.

:func:`stem_word` dispatches per configured language; non-German falls
back to the light suffix stemmer (documented stand-in — the English
Porter2 script can slot in behind the same signature).
"""

from __future__ import annotations

_VOWELS = set("aeiouyäöü")
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the Snowball definition; r1 is moved
    to at least position 3 (German-specific adjustment)."""
    def region_after(start: int) -> int:
        i = start
        n = len(word)
        # find vowel
        while i < n and word[i] not in _VOWELS:
            i += 1
        # then non-vowel
        while i < n and word[i] in _VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = region_after(0)
    r2 = region_after(r1)
    r1 = max(r1, 3) if len(word) >= 3 else r1
    return r1, r2


def snowball_de(word: str) -> str:
    """German Snowball stem of a lowercase word."""
    w = word.lower().replace("ß", "ss")
    # mark u/y between vowels as consonants (upper case)
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS \
                and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _regions(w)   # marked string: U/Y count as consonants

    def in_r1(suffix_start: int) -> bool:
        return suffix_start >= r1

    def in_r2(suffix_start: int) -> bool:
        return suffix_start >= r2

    # --- step 1 ---
    done = False
    for suf in ("ern", "em", "er"):       # group (a), longest first
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[:-len(suf)]
            done = True
            break
    if not done:
        for suf in ("en", "es", "e"):     # group (b)
            if w.endswith(suf) and in_r1(len(w) - len(suf)):
                w = w[:-len(suf)]
                if w.endswith("niss"):
                    w = w[:-1]
                done = True
                break
    if not done and w.endswith("s") and in_r1(len(w) - 1) \
            and len(w) >= 2 and w[-2] in _S_ENDING:
        w = w[:-1]

    # --- step 2 ---
    done = False
    for suf in ("est", "en", "er"):
        if w.endswith(suf) and in_r1(len(w) - len(suf)):
            w = w[:-len(suf)]
            done = True
            break
    if not done and w.endswith("st") and in_r1(len(w) - 2) \
            and len(w) >= 6 and w[-3] in _ST_ENDING:
        w = w[:-2]

    # --- step 3 (d-suffixes) ---
    lw = w
    if lw.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            lw = w
            if lw.endswith("ig") and in_r2(len(w) - 2) \
                    and not lw.endswith("eig"):
                w = w[:-2]
    elif lw.endswith(("ig", "ik")) :
        if in_r2(len(w) - 2) and not lw.endswith(("eig", "eik")):
            w = w[:-2]
    elif lw.endswith("isch"):
        if in_r2(len(w) - 4) and not lw.endswith("eisch"):
            w = w[:-4]
    elif lw.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            lw = w
            if lw.endswith(("er", "en")) and in_r1(len(w) - 2):
                w = w[:-2]
    elif lw.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            lw = w
            if lw.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif lw.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # --- finally ---
    out = []
    for c in w:
        if c in "UY":
            out.append(c.lower())
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)


def stem_word(word: str, lang: str = "german") -> str:
    """Language-dispatching stem (reference STEMMER config)."""
    if lang in ("german", "de"):
        return snowball_de(word)
    from sbb_ned_ray.functions.normalization import light_stem
    return light_stem(word)
