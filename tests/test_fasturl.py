"""Differential tests: the fast-path URL helpers in html/extract.py
must be BIT-IDENTICAL to the stdlib functions they shortcut, on every
input (safe-charset inputs take the fast path, everything else must
fall back — either way the observable result equals the stdlib's).

These are pure functions; no Ray needed.
"""
from urllib.parse import urljoin, urlparse

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapcrawler_ray.html.extract import (
    _netloc_path,
    _netloc_scheme,
    _urljoin,
)

BASES = [
    "https://site0.example/page/315",
    "http://site3.example/photo/1",
    "https://commons.wikimedia.org/wiki/Category:Birds",
    "https://host:8080/a/b?q=1",
    "https://host/",
    "https://host",
    "http://user:pw@host/x",
    "ftp://host/x",
    "",
    "relative/base",
]

HREFS = [
    # the two dominant crawl shapes (must hit the fast path and match)
    "https://img-cdn0.example/pic/0/44.png",
    "http://site8.example/page/1",
    "/page/2521",
    "/photo/67911",
    "/wiki/File:Cat.jpg",
    "/wiki/Special:FilePath/Dog.png",
    "/",
    "/a/b/c.png?x=1&y=2",
    "https://host:443/thumb/300px-x.jpg",
    # adversarial: must fall back and still match the stdlib
    "//proto.relative/x",
    "/a/../b",
    "/a/./b",
    "/a/..",
    "/.",
    "page/relative",
    "?query=only",
    "#frag",
    "/x#frag",
    "https://host/x#frag",
    "HTTPS://HOST/X",
    "https://host/a;params",
    "/a;params",
    "mailto:x@y",
    "javascript:void(0)",
    " /leading-space",
    "/trailing-space ",
    "/tab\tinside",
    "/new\nline",
    "https://ho st/x",
    "https://host/%20a%2Fb",
    "/%20a%2Fb",
    "/a//b",
    "//",
    "",
    "https://",
    "http://host",
    "https://host?q=1",
    "/ünïcode",
    "https://hōst/x",
    "/a'b(c)*d,e!f$g&h",
]


@pytest.mark.parametrize("base", BASES)
def test_urljoin_matrix(base):
    for href in HREFS:
        assert _urljoin(base, href) == urljoin(base, href), (base, href)


URL_CHARS = st.text(
    alphabet=(
        "abABzZ09._~%+-/:?#&=;@!$'()*,\\ \t\n\r\x00\x7fü—"
    ),
    max_size=24,
)


@given(path=URL_CHARS, base_path=URL_CHARS)
@settings(max_examples=400, deadline=None)
def test_urljoin_fuzz(path, base_path):
    base = "https://site0.example/" + base_path
    for href in (path, "/" + path, "https://other.example/" + path,
                 "http://other.example" + path):
        assert _urljoin(base, href) == urljoin(base, href), (base, href)


@given(url=URL_CHARS)
@settings(max_examples=400, deadline=None)
def test_netloc_scheme_fuzz(url):
    for u in (url, "https://" + url, "http://" + url,
              "https://host" + url):
        p = urlparse(u)
        assert _netloc_scheme(u) == (p.netloc, p.scheme), u
        assert _netloc_path(u) == (p.netloc, p.path), u


def test_netloc_scheme_matrix():
    urls = HREFS + BASES + [
        "https://host:8080/x", "https://host?a#b", "https://ho\tst/x",
        "https://host/pa\tth", "https://HOST/x", "https://host.",
        "https://@host/x", "https://[::1]:80/x",
    ]
    for u in urls:
        p = urlparse(u)
        assert _netloc_scheme(u) == (p.netloc, p.scheme), u
        assert _netloc_path(u) == (p.netloc, p.path), u


def test_netloc_path_params_and_case():
    for u in [
        "https://host/a;params/b", "https://host/a;p", "https://HOST/X",
        "https://commons.wikimedia.org/wiki/Special:FilePath/Dog.png",
        "https://upload.wikimedia.org/x/y.JPG?a=1#f",
        "https://host/pa\tth", "https://host/ünïcode", "https://host",
        "https://host?q", "https://host#f", "http://host/",
    ]:
        p = urlparse(u)
        assert _netloc_path(u) == (p.netloc, p.path), u
