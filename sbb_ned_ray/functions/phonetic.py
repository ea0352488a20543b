"""Phonetic encodings for record-linkage blocking keys.

American Soundex in the h/w-transparent variant (the behavior of the
``SOUNDEX()`` function in SQL engines, and of the National Archives
rule "if two letters with the same code are separated by H or W they
are coded as one"): vowels separate equal codes, H/W do not.  The
reference engine blocks candidate entities on normalized surface
forms (``qurator/sbb_ned/embeddings/base.py`` index lookup keys);
phonetic keys are the classical record-linkage companion blocking key
(Fellegi-Sunter deployments since ODELL & RUSSELL's 1918 patent).

The same algorithm is expressed twice on purpose: here in
numpy/python for the Ray path, and as a pure-SQL ``translate`` +
chained ``regexp_replace`` pipeline in the DuckDB oracle
(``pipelines/queries.py::_oracle_soundex_expr``) — both from the
published spec, so the driver's hash compare is a genuine
two-implementation check.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

# letters -> soundex digit; vowels (incl. Y) -> '0'; H/W deleted.
_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY"
_TO = "111122222222334556000000"
_TRANS = str.maketrans(_FROM, _TO, "HW")
_NON_ALPHA = re.compile(r"[^A-Za-z]")


def soundex(name: str) -> str:
    """American Soundex (h/w-transparent variant), matching the SQL
    twin character-for-character.  Empty / non-alphabetic input maps
    to ``''``."""
    u = _NON_ALPHA.sub("", name).upper()
    if not u:
        return ""
    coded = u.translate(_TRANS)
    # collapse runs of equal digits 1-6 ONLY (zeros = vowels separate
    # codes and are removed later; the SQL twin collapses the same
    # six run classes)
    out = []
    prev = ""
    for ch in coded:
        if ch != prev or ch == "0":
            out.append(ch)
        prev = ch
    collapsed = "".join(out)
    # the first letter's own code participates in collapsing, then is
    # replaced by the letter itself; when the first letter is H/W it
    # was deleted from `coded`, so there is nothing to drop
    body = collapsed if u[0] in "HW" else collapsed[1:]
    body = body.replace("0", "")
    return u[0] + (body + "000")[:3]


def soundex_col(names) -> np.ndarray:
    """Vectorized soundex over a column: factorize to uniques (names
    repeat heavily in linkage workloads), encode each unique once,
    take back.  Returns an object ndarray of 4-char codes."""
    codes, uniques = pd.factorize(np.asarray(names, dtype=object))
    enc = np.array([soundex(u) for u in uniques], dtype=object)
    if len(enc) == 0:
        return np.empty(0, dtype=object)
    return enc[codes]
