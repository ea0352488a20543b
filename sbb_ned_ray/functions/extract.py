"""Deterministic HTML → text extraction.

The reference consumes pre-extracted OCR text; our input hint
(``BASELINE.json`` ``input_hint``) adds ``html:binary`` with the per-row
invariant *byte-identical extracted text per url*.  This module is the
single, versioned, pure extraction function shared by the fixture
generator and the pipeline (SURVEY.md §7.4 "hard parts").

Chain: decode utf-8 → drop ``<script>/<style>/<!-- -->`` → block tags →
newlines → strip remaining tags → unescape entities → scrub control
chars (clef_hipe_2020.py:128-132 semantics) → char-normalization map
(webapp/app.py:273) → per-line whitespace collapse → join non-empty
lines with ``\\n``.
"""

from __future__ import annotations

import html as _html
import re

from sbb_ned_ray.functions.normalization import (
    normalize_chars,
    scrub_control_chars,
)

EXTRACTOR_VERSION = "1"

_DROP_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article|header|"
    r"footer|blockquote|pre|title|body|html|head)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RUN_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes | str) -> str:
    """Pure deterministic extraction; see module docstring for the chain."""
    raw = (html_bytes.decode("utf-8", errors="replace")
           if isinstance(html_bytes, (bytes, bytearray)) else html_bytes)
    s = _DROP_RE.sub(" ", raw)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = scrub_control_chars(s)
    s = normalize_chars(s)
    lines = []
    for line in s.split("\n"):
        line = _WS_RUN_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
