"""URL canonicalization golden vectors + idempotence property."""

import pytest
from hypothesis import given, strategies as st

from sbb_ned_ray.functions.urltools import canonicalize_url, \
    registrable_domain

VECTORS = [
    # scheme/host case, default port, fragment
    ("HTTP://Example.COM:80/a#frag", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    # userinfo dropped, trailing host dot
    ("http://user:pw@example.com./p", "http://example.com/p"),
    # dot segments, duplicate slashes, trailing slash kept
    ("http://e.com/a/b/../c/./d//e/", "http://e.com/a/c/d/e/"),
    ("http://e.com", "http://e.com/"),
    # escapes: unreserved decoded, others uppercased
    ("http://e.com/%41%2f%3f", "http://e.com/A%2F%3F"),
    # tracking params out, rest sorted
    ("http://e.com/p?utm_source=x&b=2&a=1&gclid=g&ref=r&fbclid=f",
     "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?z=1&a=2&a=1", "http://e.com/p?a=1&a=2&z=1"),
    # blank values survive
    ("http://e.com/p?a=&b=1", "http://e.com/p?a=&b=1"),
]


@pytest.mark.parametrize("raw,want", VECTORS)
def test_canonicalize_vectors(raw, want):
    assert canonicalize_url(raw) == want


@given(st.text(max_size=60))
def test_canonicalize_total_and_idempotent(s):
    once = canonicalize_url(s)
    assert canonicalize_url(once) == once


@pytest.mark.parametrize("host,want", [
    ("www.example.com", "example.com"),
    ("a.b.news.co.uk", "news.co.uk"),
    ("example.com", "example.com"),
    ("site7.example", "site7.example"),
    ("192.168.0.1", "192.168.0.1"),
    ("deep.sub.domain.com.au", "domain.com.au"),
])
def test_registrable_domain(host, want):
    assert registrable_domain(host) == want


@pytest.mark.parametrize("raw", [
    "mailto:a@b.com", "example.com/x", "/relative/path?a=1", "",
    "data:text/plain,hi",
])
def test_no_authority_passthrough(raw):
    assert canonicalize_url(raw) == raw


@pytest.mark.parametrize("raw,want", [
    # invalid ports: never raise, pass through
    ("http://e.com:abc/x", "http://e.com:abc/x"),
    ("http://e.com:99999999/x", "http://e.com:99999999/x"),
    # IPv6 literals keep brackets
    ("http://[2001:db8::1]/x", "http://[2001:db8::1]/x"),
    ("HTTP://[2001:DB8::1]:80/x", "http://[2001:db8::1]/x"),
])
def test_junk_ports_and_ipv6(raw, want):
    got = canonicalize_url(raw)
    assert got == want
    assert canonicalize_url(got) == got  # idempotent


def test_registrable_domain_numeric_tail_is_not_an_ip():
    from sbb_ned_ray.functions.urltools import registrable_domain
    # only a fully-numeric host is an IP literal
    assert registrable_domain("192.168.10.1") == "192.168.10.1"
    assert registrable_domain("cdn.example.123") == "example.123"
    assert registrable_domain("a.b.co.uk") == "b.co.uk"
