"""URL canonicalization (stages/urltools.py) rule-by-rule."""

from __future__ import annotations

import pyarrow as pa

from elasticsearch_data_loader_ray.stages.urltools import canonicalize_urls


def test_canonicalize_rules():
    urls = pa.array([
        "https://WWW.Example.com:443/path/x/?utm_source=x&b=2&a=1#frag",
        "http://example.org:80/a/b?fbclid=abc",
        "https://sub.site.net/p1//",
        "http://Mixed.Case.com/x?z=1&y=2&utm_campaign=c",
        "https://h.com/",               # root slash preserved
        "https://h.com:8443/keep?a=1",  # non-default port kept
        "HTTPS://UP.CASE.IO:443/Q",     # scheme case + default port
        "not a url",                    # non-URL passes through
        None,
    ])
    got = canonicalize_urls(urls).to_pylist()
    assert got == [
        "https://www.example.com/path/x?a=1&b=2",
        "http://example.org/a/b",
        "https://sub.site.net/p1",
        "http://mixed.case.com/x?y=2&z=1",
        "https://h.com/",
        "https://h.com:8443/keep?a=1",
        "https://up.case.io/Q",  # path case is significant, kept
        "not a url",
        None,
    ]


def test_canonicalize_dedup_keying():
    # the point of the op: tracking-param / port / case variants of the
    # same page collapse to one key
    variants = pa.array([
        "https://Site.com/page?utm_source=tw&id=7",
        "https://site.com:443/page?id=7",
        "https://site.com/page/?id=7&utm_campaign=x",
    ])
    got = set(canonicalize_urls(variants).to_pylist())
    assert got == {"https://site.com/page?id=7"}
