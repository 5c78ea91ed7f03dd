"""Extractor conformance (SURVEY.md §5.1).

Fixture #0 is the reference's own embedded unit-test HTML
(test_runner.py:180-228); the rest pin every branch of
crawling_module.py:264-422 with hand-written expected outputs.
"""

from snapcrawler_ray.html import (
    extract_images,
    extract_links,
    extract_page,
    is_image_page_url,
    is_valid_image_url,
    parse_html,
)

FIXTURE0 = """<html>
  <head>
    <style>
      .banner { background-image: url('/img/banner.jpg'); }
    </style>
  </head>
  <body>
    <img src="/img/a.png" />
    <a href="/next">Next</a>
  </body>
</html>"""


def test_fixture0_reference_unit_test():
    root = parse_html(FIXTURE0)
    images, pages = extract_images(root, "https://example.com/")
    assert "https://example.com/img/a.png" in images
    assert "https://example.com/img/banner.jpg" in images
    assert pages == []
    links = extract_links(root, "https://example.com/", ["example.com"])
    assert "https://example.com/next" in links


def test_img_src_fallback_chain():
    html = (
        '<img data-src="/a.jpg"/>'
        '<img data-lazy-src="/b.png"/>'
        '<img src="" data-src="/c.webp"/>'  # empty src falls through
        '<img src="/d.gif" data-src="/ignored.png"/>'
    )
    images, _ = extract_images(parse_html(html), "https://h.example/")
    assert images == sorted(
        {
            "https://h.example/a.jpg",
            "https://h.example/b.png",
            "https://h.example/c.webp",
            "https://h.example/d.gif",
        }
    )


def test_parent_anchor_image_and_cascade():
    html = (
        '<a href="/full.png"><img src="/thumb.jpg"/></a>'
        '<a href="/photo/123"><img src="/t2.jpg"/></a>'
        '<a href="/article"><img src="/t3.jpg"/></a>'
    )
    images, pages = extract_images(parse_html(html), "https://h.example/")
    assert "https://h.example/full.png" in images
    assert "https://h.example/thumb.jpg" in images
    # image *page* goes to the cascade list, not images
    assert pages == ["https://h.example/photo/123"]
    assert "https://h.example/article" not in images


def test_data_file_url_and_styles():
    html = (
        '<div data-file-url="/w.png">x</div>'
        '<div style="background-image:url(/bg.jpeg)">y</div>'
        "<style>.a{background:url('/s1.webp');} .b{background:url(\"/s2.png\")}</style>"
    )
    images, _ = extract_images(parse_html(html), "https://h.example/")
    assert set(images) == {
        "https://h.example/w.png",
        "https://h.example/bg.jpeg",
        "https://h.example/s1.webp",
        "https://h.example/s2.png",
    }


def test_sorted_unique_canonicalization():
    html = '<img src="/z.png"/><img src="/a.png"/><img src="/z.png"/>'
    images, _ = extract_images(parse_html(html), "https://h.example/")
    assert images == ["https://h.example/a.png", "https://h.example/z.png"]


def test_is_valid_image_url_rules():
    # plain extensions (crawling_module.py:413-415)
    assert is_valid_image_url("https://x.example/a.JPG")
    assert is_valid_image_url("https://x.example/a.webp")
    assert not is_valid_image_url("https://x.example/a.pdf")
    assert not is_valid_image_url("https://x.example/style.css")
    # wiki File: pages are pages, not files (:369-375)
    assert not is_valid_image_url("https://commons.wikimedia.org/wiki/File:Cat.jpg")
    assert is_valid_image_url(
        "https://commons.wikimedia.org/wiki/Special:FilePath/Cat.jpg"
    )
    # upload host by extension (:379-382)
    assert is_valid_image_url("https://upload.wikimedia.org/wikipedia/commons/c.png")
    assert not is_valid_image_url("https://upload.wikimedia.org/wikipedia/commons/c")
    # thumb width threshold (:385-411): default 300
    small = "https://mirror.example/commons.wikimedia.org/thumb/a/ab/X.jpg/120px-X.jpg"
    big = "https://mirror.example/commons.wikimedia.org/thumb/a/ab/X.jpg/640px-X.jpg"
    assert not is_valid_image_url(small)
    assert is_valid_image_url(big)
    assert is_valid_image_url(small, min_commons_thumb_px=100)
    assert not is_valid_image_url(big, min_commons_thumb_px=800)


def test_is_image_page_url():
    assert is_image_page_url("https://h.example/photo/1", "https://h.example/")
    assert is_image_page_url("https://h.example/gallery/x", "https://h.example/")
    assert is_image_page_url("https://h.example/?image_id=5", "https://h.example/")
    assert not is_image_page_url("https://h.example/about", "https://h.example/")
    # commons base uses wiki-specific patterns (:322-324)
    assert is_image_page_url(
        "https://commons.wikimedia.org/wiki/File:X", "https://commons.wikimedia.org/w"
    )
    assert not is_image_page_url(
        "https://h.example/photo/1", "https://commons.wikimedia.org/w"
    )


def test_extract_links_domain_and_scheme_filter():
    html = (
        '<a href="/rel">a</a>'
        '<a href="https://allowed.example/x">b</a>'
        '<a href="https://other.example/y">c</a>'
        '<a href="mailto:a@b.c">d</a>'
        '<a href="ftp://allowed.example/z">e</a>'
        '<a href="/rel">dup kept</a>'
    )
    links = extract_links(
        parse_html(html), "https://allowed.example/base/", ["allowed.example"]
    )
    assert links == [
        "https://allowed.example/rel",
        "https://allowed.example/x",
        "https://allowed.example/rel",
    ]


def test_extract_page_text_and_md5_deterministic():
    html = b"<html><body><h1>Hello</h1><p> world </p><script>x=1</script></body></html>"
    r1 = extract_page(html, "https://h.example/", ["h.example"])
    r2 = extract_page(html, "https://h.example/", ["h.example"])
    assert r1["text"] == "Hello\nworld"
    assert r1["content_md5"] == r2["content_md5"]
    assert len(r1["content_md5"]) == 32


# ---------------------------------------------------------------------------
# Machine-checked parity: the vendored reference-semantics oracle
# (tests/ref_extractor_oracle.py — an independent re-expression of
# crawling_module.py:264-422's literal control flow) run side-by-side
# with the engine extractor over the fixture set and a sample of the
# synthetic corpus (VERDICT r2 missing #6).

_PARITY_FIXTURES = [
    (FIXTURE0, "https://example.com/"),
    (
        '<img data-src="/a.jpg"/><img data-lazy-src="/b.png"/>'
        '<img src="" data-src="/c.webp"/>'
        '<img src="/d.gif" data-src="/ignored.png"/>',
        "https://h.example/",
    ),
    (
        '<a href="/full.png"><img src="/thumb.jpg"/></a>'
        '<a href="/photo/123"><img src="/t2.jpg"/></a>'
        '<a href="/photo/123"><img src="/t2b.jpg"/></a>'  # dup cascade
        '<a href="/article"><img src="/t3.jpg"/></a>',
        "https://h.example/",
    ),
    (
        '<div data-file-url="/w.png">x</div>'
        '<div style="background-image:url(/bg.jpeg)">y</div>'
        "<style>.a{background:url('/s1.webp');}"
        ' .b{background:url("/s2.png")}</style>',
        "https://h.example/",
    ),
    (
        '<a href="/wiki/File:Cat.jpg"><img '
        'src="//upload.wikimedia.org/wikipedia/commons/thumb/c/ca/'
        'Cat.jpg/120px-Cat.jpg"/></a>'
        '<a href="/wiki/Category:Cats">c</a>'
        '<a href="/wiki/Special:FilePath/Cat.jpg">d</a>',
        "https://commons.wikimedia.org/wiki/Main_Page",
    ),
    (
        '<a href="/rel">a</a><a href="https://allowed.example/x">b</a>'
        '<a href="https://other.example/y">c</a><a href="mailto:a@b.c">d</a>'
        '<a href="ftp://allowed.example/z">e</a><a href="/rel">dup</a>'
        '<img src="/i.png"/><img src="/i.png"/>',
        "https://allowed.example/base/",
    ),
]


def _engine_vs_oracle(html, base_url, start_urls, thumb_px=None):
    from tests.ref_extractor_oracle import (
        oracle_extract_images,
        oracle_extract_links,
    )
    from urllib.parse import urlparse

    root = parse_html(html)
    cc = {} if thumb_px is None else {"min_commons_thumb_px": thumb_px}
    o_images, o_pages = oracle_extract_images(root, base_url, cc, {})
    e_images, e_pages = extract_images(root, base_url, thumb_px)
    # engine canonicalizes list(set(...)) to sorted-unique (§2.8)
    assert e_images == sorted(set(o_images)), base_url
    assert e_pages == o_pages, base_url
    allowed = [urlparse(u).netloc for u in start_urls]
    assert extract_links(root, base_url, allowed) == oracle_extract_links(
        root, base_url, start_urls
    ), base_url


def test_oracle_parity_fixture_corpus():
    for html, base in _PARITY_FIXTURES:
        _engine_vs_oracle(
            html, base,
            ["https://example.com/", "https://h.example/",
             "https://allowed.example/",
             "https://commons.wikimedia.org/wiki/Main_Page"],
        )


def test_oracle_parity_config_fallback_chain():
    """The min_commons_thumb_px fallback chain (crawling.min_… →
    images.min_side_size → 300) resolves identically on both sides."""
    from tests.ref_extractor_oracle import oracle_is_valid_image_url

    thumb = (
        "https://x.example/commons.wikimedia.org/thumb/a/ab/"
        "X.jpg/200px-X.jpg"
    )
    cases = [
        ({}, {}, 300),                                      # default
        ({}, {"images": {"min_side_size": 150}}, 150),      # images level
        ({"min_commons_thumb_px": 120},
         {"images": {"min_side_size": 640}}, 120),          # crawling wins
    ]
    for cc, fc, resolved in cases:
        assert oracle_is_valid_image_url(thumb, cc, fc) == is_valid_image_url(
            thumb, resolved
        ), (cc, fc)


def test_oracle_parity_synthetic_corpus_sample():
    """Side-by-side over real corpus pages: every 4th page of a
    120-page synthetic corpus (hosts, photo pages, wiki-style pages)."""
    from snapcrawler_ray.sources.corpus import (
        CorpusSpec,
        build_rows,
        seeds_for,
    )

    spec = CorpusSpec(seed=17, n_pages=120, n_hosts=6, buckets=4)
    keys = spec.all_urls()
    t = build_rows(spec, keys[::4])
    seeds = seeds_for(spec)
    for url, html in zip(
        t.column("url").to_pylist(), t.column("html").to_pylist()
    ):
        _engine_vs_oracle(html, url, seeds)
