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

:func:`snowball_en` implements the published English Snowball
("Porter2") algorithm from snowballstem.org — the exceptional forms,
y-consonant marking, gener/commun/arsen R1 prefixes, steps 0-5 with
their R1/R2 and short-syllable conditions — matching NLTK's
``SnowballStemmer("english")``.  The reference serves English configs
(``webapp/en-config.json``, STEMMER knob ``webapp/app.py:100-107``).

:func:`stem_word` dispatches per configured language; other languages
fall back to the light suffix stemmer.
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


# --- English Snowball (Porter2), snowballstem.org/algorithms/english ---

_EN_VOWELS = set("aeiouy")
_EN_DOUBLE = {"bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"}
_EN_VALID_LI = set("cdeghkmnrt")

_EN_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTION2 = {"inning", "outing", "canning", "herring", "earring",
                  "proceed", "exceed", "succeed"}

_EN_STEP2 = [  # longest-match order; value None = special-cased below
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_EN_STEP3 = [("ational", "ate"), ("tional", "tion"), ("alize", "al"),
             ("icate", "ic"), ("iciti", "ic"), ("ative", None),
             ("ical", "ic"), ("ness", ""), ("ful", "")]
_EN_STEP4 = ["ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
             "al", "er", "ic"]


def _en_is_short_syllable(w: str, i: int) -> bool:
    """True iff a short syllable ends at index i (inclusive) of ``w``:
    non-vowel at i that is not w/x/Y, preceded by a vowel, preceded by
    a non-vowel — or the word-initial vowel + non-vowel pattern."""
    if i == 1:
        return w[0] in _EN_VOWELS and w[1] not in _EN_VOWELS
    return (i >= 2 and w[i] not in _EN_VOWELS and w[i] not in "wxY"
            and w[i - 1] in _EN_VOWELS and w[i - 2] not in _EN_VOWELS)


def _en_regions(w: str) -> tuple[int, int]:
    def region_after(start: int) -> int:
        i, n = start, len(w)
        while i < n and w[i] not in _EN_VOWELS:
            i += 1
        while i < n and w[i] in _EN_VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = None
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    if r1 is None:
        r1 = region_after(0)
    return r1, region_after(r1)


def snowball_en(word: str) -> str:
    """English Snowball (Porter2) stem of a word."""
    w = word.lower()
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in _EN_EXCEPTION1:
        return _EN_EXCEPTION1[w]
    # mark consonant-y: initial y, or y after a vowel
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _en_regions(w)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 0: 's'  's  '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[:-len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(c in _EN_VOWELS for c in w[:-2]):
            w = w[:-1]

    if w in _EN_EXCEPTION2:
        return w

    # step 1b
    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if in_r1(len(w) - len(suf)):
            w = w[:-len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[:-len(suf)]
                if any(c in _EN_VOWELS for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w[-2:] in _EN_DOUBLE:
                        w = w[:-1]
                    elif r1 >= len(w) and len(w) >= 2 \
                            and _en_is_short_syllable(w, len(w) - 1):
                        w += "e"
                break

    # step 1c: y/Y → i after a non-vowel that isn't the first letter
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _EN_VOWELS:
        w = w[:-1] + "i"

    # step 2 (longest match, condition in R1)
    for suf, rep in _EN_STEP2:
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) >= 3 and w[-3] in _EN_VALID_LI:
                        w = w[:-2]
                else:
                    w = w[:-len(suf)] + rep
            break

    # step 3 (condition in R1; ative needs R2)
    for suf, rep in _EN_STEP3:
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                if suf == "ative":
                    if in_r2(len(w) - 5):
                        w = w[:-5]
                else:
                    w = w[:-len(suf)] + rep
            break

    # step 4 (condition in R2; ion needs s/t before)
    for suf in _EN_STEP4:
        if w.endswith(suf):
            if in_r2(len(w) - len(suf)):
                if suf == "ion":
                    if len(w) >= 4 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[:-len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if in_r2(len(w) - 1) or (in_r1(len(w) - 1) and not (
                len(w) >= 2 and _en_is_short_syllable(w, len(w) - 2))):
            w = w[:-1]
    elif w.endswith("l") and in_r2(len(w) - 1) and len(w) >= 2 \
            and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


def stem_word(word: str, lang: str = "german") -> str:
    """Language-dispatching stem (reference STEMMER config)."""
    if lang in ("german", "de"):
        return snowball_de(word)
    if lang in ("english", "en"):
        return snowball_en(word)
    from sbb_ned_ray.functions.normalization import light_stem
    return light_stem(word)
