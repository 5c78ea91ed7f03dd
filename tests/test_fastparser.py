"""Differential tests: the fast tokenizer's Node tree must be
BIT-IDENTICAL to the stdlib builder's on every input it accepts, and
`parse_html` (fast + fallback) must equal the stdlib build on EVERY
input.  Pure functions; no Ray needed.
"""
import glob

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from snapcrawler_ray.html.fastparser import parse_fast
from snapcrawler_ray.html.parser import Node, parse_html, parse_html_stdlib


def dump(node: Node) -> list:
    """Canonical serialization: name, attrs (ordered), children."""
    out = [node.name, sorted(node.attrs.items(), key=lambda kv: kv[0])]
    kids = []
    for c in node.children:
        kids.append(c if isinstance(c, str) else dump(c))
    out.append(kids)
    return out


def _outcome(fn, html: str):
    # the stdlib ITSELF raises AssertionError on some malformed marked
    # sections ('<![1', '<![A;') — the fast path correctly defers those
    # to the stdlib, so both sides raising identically is equivalence
    try:
        return dump(fn(html))
    except Exception as e:
        return ("RAISE", type(e).__name__)


def assert_same(html: str):
    assert _outcome(parse_html, html) == _outcome(
        parse_html_stdlib, html
    ), html


CASES = [
    # corpus shapes
    '<html><head><title>t</title></head><body><h1>x</h1></body></html>',
    '<a href="https://x/y.png"><img data-src="https://x/y.gif"/></a>',
    '<a href="/page/2521">next 2521</a><a href="/page/2522">two</a>',
    '<style>.b { background-image: url(\'https://x/1.jpg\'); }</style>',
    '<script type="application/ld+json">{"image":"https://x/4.jpg"}</script>',
    '<div data-file-url="https://x/2.jpg">quick fox</div>',
    '<picture><source srcset="https://x/a.jpg 1x"/><img srcset="https://x/b.jpg 640w"/></picture>',
    # entities
    'a &amp; b<b>&lt;tag&gt;</b>&#65;&#x42;&nbsp;&unknown;&amp',
    '<a href="/x?a=1&amp;b=2" title="a&lt;b">t</a>',
    '<a href=\'/x?a=1&amp;b=2\'>t</a>',
    # void / self-closing / case / duplicate attrs
    '<br><hr/><IMG SRC=x DATA-X><img src=a src=b>',
    '<input disabled><input disabled=disabled>',
    '<a href=/page/1>unquoted</a><a href = "sp" >spaced</a>',
    '<img src=x/>',          # unquoted value eats the slash (quirk)
    '<img src=x />',         # startendtag
    '<a/>text</a>',
    # rawtext edge cases
    '<script>var a = "<div>not a tag</div>";</script>after',
    '<script>if (a < b && c > d) {}</script>',
    '<SCRIPT>x</SCRIPT>tail',
    '<script>unterminated...',
    '<style>p { color: red }</style>',
    '<script></script>',
    '<script>x</scriptx></script>done',
    '<script>a</ script >b',
    '<script/>not raw <b>bold</b>',
    # comments / declarations / PIs
    '<!DOCTYPE html><p>x</p>',
    'a<!-- comment with <tags> and -- dashes -->b',
    'a<!-- c --  >b',
    'a<!x bogus>b<?php echo ?>c',
    '<![CDATA[raw]]>tail',
    '<!-->short',
    # stray / malformed (must fall back and still match)
    'a < b > c',
    '5 <3',
    'x<>y',
    '<a href="unterminated',
    '<a href=>empty</a>',
    '<a =x>weird</a>',
    '<a b="a<b">lt in value</a>',
    '</unopened>text',
    '</ spaced>t',
    '<my.tag>x</my.tag>',
    '<a/ >tolerant</a>',
    'trailing<',
    'trailing<!',
    'trailing<!-',
    'trailing<!--',
    'trailing<?pi',
    '<a b=="x">double eq</a>',
    '<a\tb="1"\nc=2>ws</a>',
    '<b>unclosed',
    '</b></b>extra closes',
    'ünïcode <p>tëxt &eacute;</p>',
    '',
]


@pytest.mark.parametrize("case", CASES)
def test_tree_matrix(case):
    assert_same(case)


def test_fast_path_accepts_corpus_shapes():
    """The shapes the corpus generator emits MUST take the fast path
    (the headline speedup depends on it)."""
    ok = [
        '<html><head><title>t</title></head><body><a href="/p/1">x</a>'
        '<img data-src="https://x/y.gif"/><script>var a=1;</script>'
        '<style>.x{}</style><!-- c --><!DOCTYPE html></body></html>',
    ]
    for h in ok:
        assert parse_fast(h) is not None, h


HTML_ALPHABET = st.text(
    alphabet='<>/!?&;="\'abA1 \t\n-.#[]%x',
    max_size=40,
)


@given(doc=HTML_ALPHABET)
@example(doc="&#1")  # invalid charref unescapes to '' — text run must
@example(doc="<div>&#1</div>")  # be dropped post-unescape like stdlib
@settings(max_examples=1500, deadline=None)
def test_tree_fuzz(doc):
    assert_same(doc)


@given(
    pieces=st.lists(
        st.sampled_from(
            [
                "<a href=", '"/p/1"', ">", "</a>", "<img src=x",
                "/>", "<script>", "</script>", "&amp;", "&#65;", "text",
                "<!--", "-->", "<b >", "<p a", "='v'", " ", "<", ">",
                "/", "!", "--", "<style>", "</style>", "\n", "<!x>",
            ]
        ),
        max_size=14,
    )
)
@settings(max_examples=1500, deadline=None)
def test_tree_fuzz_structured(pieces):
    assert_same("".join(pieces))


def test_corpus_pages_identical_and_fast():
    files = sorted(
        glob.glob("/tmp/snapray_corpus_cache/**/*.parquet", recursive=True)
    )
    if not files:
        pytest.skip("no cached corpus")
    import pyarrow.parquet as pq

    t = pq.read_table(files[0], columns=["html"]).slice(0, 400)
    misses = 0
    for h in t.column("html").to_pylist():
        s = h.decode("utf-8", errors="replace")
        fast = parse_fast(s)
        if fast is None:
            misses += 1
            continue
        assert dump(fast) == dump(parse_html_stdlib(s))
    assert misses == 0, f"{misses}/400 corpus pages fell off the fast path"
