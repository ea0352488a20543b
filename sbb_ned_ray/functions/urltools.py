"""URL canonicalization for web-corpus curation.

The reference engine never sees raw URLs (its ingest is NER-tagged
JSON, ``webapp/app.py:293-349``); a 100 TB web pipeline does, and
"same page, different URL string" is the first dedup key.  These are
pure functions used inside ``map_batches`` (string parsing is
intrinsically per-record, like the HTML extraction in
``functions/extract.py``; the cheap host-only projection used by the
``pages_per_host`` query is vectorized with pyarrow kernels instead —
see ``pipelines/queries.py``).

Canonicalization applied (RFC 3986 normalizations + the usual crawler
conventions):

* scheme and host lowercased; trailing ``.`` on the host dropped
* userinfo dropped; default ports (``:80`` http, ``:443`` https) dropped
* fragment dropped
* path dot-segments resolved, duplicate ``//`` collapsed, empty path
  -> ``/``
* percent-encoded unreserved characters decoded (``%41`` -> ``A``),
  other escapes uppercased (``%3f`` -> ``%3F``)
* tracking query parameters removed (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``ref``), remaining parameters sorted by (key, value)
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_TRACKING = re.compile(r"^(utm_|gclid$|fbclid$|msclkid$|ref$)")
_UNRESERVED = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
               "abcdefghijklmnopqrstuvwxyz0123456789-._~")
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _norm_escapes(s: str) -> str:
    def sub(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()
    return _PCT.sub(sub, s)


def _norm_path(path: str) -> str:
    # collapse //, resolve . and .. (RFC 3986 §5.2.4)
    out: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    norm = "/" + "/".join(out)
    if path.endswith(("/", "/.", "/..")) and norm != "/":
        norm += "/"
    return norm


def canonicalize_url(url: str) -> str:
    """Canonical form of ``url`` (see module docstring).  Unparseable
    inputs are returned stripped/unchanged rather than raising — a
    crawler row with a junk URL should still flow through."""
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.netloc:
        # no authority: relative path, mailto:, junk — normalizing the
        # path would mangle the meaning (e.g. 'mailto:a@b' must not
        # grow a leading '/'); pass through stripped
        return url
    scheme = parts.scheme.lower()
    try:
        # .hostname/.port parse lazily and raise on junk like ':abc'
        # or out-of-range ports — honor the never-raise contract
        host = (parts.hostname or "").lower().rstrip(".")
        port = parts.port
    except ValueError:
        return url
    if ":" in host:                       # IPv6 literal: keep brackets
        host = f"[{host}]"
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme):
        netloc = f"{host}:{port}"
    path = _norm_path(_norm_escapes(parts.path))
    q = [(k, v) for k, v in
         parse_qsl(parts.query, keep_blank_values=True)
         if not _TRACKING.match(k.lower())]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


# second-level public suffixes common enough to matter for grouping;
# a production deployment would ship the full Public Suffix List as a
# broadcast artifact (state/artifacts.py pattern)
_SECOND_LEVEL = frozenset({
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.ar", "com.tr",
})


def registrable_domain(host: str) -> str:
    """eTLD+1 of a hostname (heuristic two-label rule with a small
    second-level-suffix table).  IP literals return unchanged."""
    host = host.lower().rstrip(".")
    labels = host.split(".")
    # IP literal = EVERY label numeric (a trailing numeric label alone —
    # e.g. "cdn.example.123" — is a hostname, not an IPv4 address)
    if len(labels) <= 2 or all(lb.isdigit() for lb in labels):
        return host
    if ".".join(labels[-2:]) in _SECOND_LEVEL:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])
