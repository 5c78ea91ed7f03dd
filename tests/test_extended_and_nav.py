"""Extended (spider-superset) extractor, sitemap source, navigation
scoring, image content analysis."""

import numpy as np

from snapcrawler_ray.html.extended import (
    extended_extract_from_html,
    is_image_url_ext,
    parse_srcset,
)
from snapcrawler_ray.html.navigation import (
    analyze_link,
    analyze_page,
    detect_navigation_patterns,
    prioritized_nav_links,
)
from snapcrawler_ray.html.parser import parse_html
from snapcrawler_ray.imageio.analyze import (
    ai_tags,
    analyze_colors,
    classify_content_type,
    quality_score,
)
from snapcrawler_ray.imageio.formats import gen_pixels
from snapcrawler_ray.sources.sitemap import (
    discover_sitemaps,
    parse_robots_txt,
    parse_sitemap,
    sitemap_frontier_rows,
)


def test_parse_srcset():
    assert parse_srcset("a.jpg 1x, b.jpg 2x") == ["a.jpg", "b.jpg"]
    assert parse_srcset("x.png 100w,  y.png 200w ,") == ["x.png", "y.png"]


def test_extended_extractor_sources():
    html = """
    <html><head>
    <style>.h { background-image: url('/css/bg.png'); }
           --hero: url('/css/var.jpg'); .u { mask-image: url('/css/mask.webp'); }</style>
    </head><body>
    <img src="/plain.jpg"/>
    <img data-original="/lazy1.png"/>
    <div data-bg="/lazy2.gif">x</div>
    <img loading="lazy" src="/lazy3.webp"/>
    <picture><source srcset="/r1.jpg 1x, /r2.jpg 2x"/><img src="/fallback.png"/></picture>
    <img srcset="/s1.jpg 320w, /s2.jpg 640w"/>
    <script>var hero = "/js/h.jpg"; obj.src = '/js/i.png';</script>
    <script type="application/ld+json">{"image": "/ld/a.jpg",
      "nested": {"thumbnail": "/ld/t.png"}, "arr": [{"photo": "/ld/p.webp"}]}</script>
    <div style="background: red url('/inline.jpeg') no-repeat">y</div>
    </body></html>"""
    urls = extended_extract_from_html(html, "https://h.example/base/")
    expect = {
        "/plain.jpg", "/lazy1.png", "/lazy2.gif", "/lazy3.webp",
        "/r1.jpg", "/r2.jpg", "/fallback.png", "/s1.jpg", "/s2.jpg",
        "/css/bg.png", "/css/var.jpg", "/css/mask.webp", "/inline.jpeg",
        "/js/h.jpg", "/js/i.png", "/ld/a.jpg", "/ld/t.png", "/ld/p.webp",
    }
    got = {u.replace("https://h.example", "") for u in urls}
    assert expect <= got
    assert urls == sorted(set(urls))


def test_extended_is_image_url():
    assert is_image_url_ext("https://x/a.avif")
    assert is_image_url_ext("/rel/b.HEIC")
    assert not is_image_url_ext("https://x/a.pdf")
    assert not is_image_url_ext("")


def test_sitemap_parse_urlset_and_index():
    urlset = b"""<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>https://h.example/a</loc><priority>0.8</priority>
           <changefreq>daily</changefreq></url>
      <url><loc>https://h.example/b</loc></url>
      <url><loc>https://h.example/c</loc><priority>0.2</priority></url>
    </urlset>"""
    entries = parse_sitemap(urlset, "https://h.example/sitemap.xml")
    assert len(entries) == 3
    assert entries[0] == {"url": "https://h.example/a", "type": "page",
                          "priority": 0.8, "changefreq": "daily"}
    assert entries[1]["priority"] == 0.5
    rows = sitemap_frontier_rows(entries)
    assert [r["url"] for r in rows] == ["https://h.example/a", "https://h.example/b"]

    index = b"""<?xml version="1.0"?>
    <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>https://h.example/sm1.xml</loc></sitemap>
    </sitemapindex>"""
    entries = parse_sitemap(index)
    assert entries == [{"url": "https://h.example/sm1.xml", "type": "sitemap",
                        "priority": 1.0}]


def test_robots_txt_sitemap_lines():
    txt = "User-agent: *\nDisallow: /admin\nSitemap: https://h.example/sm.xml\n"
    entries = parse_robots_txt(txt)
    assert entries[0]["url"] == "https://h.example/sm.xml"
    # non-XML robots body routed through parse_sitemap fallback
    assert parse_sitemap(txt, "https://h.example/robots.txt") == entries
    assert len(discover_sitemaps("https://h.example/")) == 5


def test_pagination_detection():
    html = """<html><body>
    <div class="pagination"><a href="/page/2">2</a>
    <a href="?page=3">Next</a><a rel="next" href="/page/4">&gt;</a></div>
    </body></html>"""
    root = parse_html(html)
    pats = detect_navigation_patterns(root, html)
    assert pats and pats[0].pattern_type == "pagination"
    assert pats[0].confidence > 0.5
    # page with no nav
    none = detect_navigation_patterns(parse_html("<p>hi</p>"), "<p>hi</p>")
    assert none == []


def test_link_relevance_and_prioritized():
    hi = analyze_link("/gallery/cats", "photo gallery")
    assert hi["relevance"] == 1.0 and hi["type"] == "gallery"
    lo = analyze_link("/about", "company")
    assert lo["relevance"] == 0.0
    html = ('<a href="/gallery/1">photos</a><a href="/about">about</a>'
            '<a href="/archive/old">archive pictures</a>')
    rows = prioritized_nav_links(parse_html(html), "https://h.example/")
    urls = [r["url"] for r in rows]
    assert "https://h.example/gallery/1" in urls
    assert "https://h.example/about" not in urls
    a = analyze_page(parse_html(html), html)
    assert a["confidence_score"] > 0


def test_nav_features_match_analyze_page():
    """The oracle feature path (page_nav_features +
    nav_result_from_features) must agree with the original analyze_page
    on every count and on confidences modulo analyze_page's cosmetic
    round(·, 4) — and _PATTERN_DIMS must match the real pattern list
    sizes so the SQL constants cannot drift."""
    from snapcrawler_ray.html.navigation import (
        _PATTERN_DIMS,
        _patterns,
        nav_result_from_features,
        page_nav_features,
    )

    for pat, (ptype, _s, n_sel, n_url) in zip(_patterns(), _PATTERN_DIMS):
        assert pat.pattern_type == ptype
        assert len(pat.selectors) == n_sel
        assert len(pat.url_patterns) == n_url

    pages = [
        # pagination selectors + url regex + relevant links + containers
        (
            '<a href="?page=2">Next</a><a href="/page/3">&gt;</a>'
            '<nav aria-label="pagination nav"><a href="?p=4">4</a></nav>'
            '<div class="pagination"><a rel="next" href="x">n</a></div>'
            '<a href="/gallery/1">photos</a><a href="/about">about</a>'
            '<a href="/archive/x">old pictures</a>'
            '<div><img src="a.png"><img src="b.png"></div>'
            "<section><p>text</p><p>more</p><span>x</span></section>",
            "see page=2 and /page/3 offset=10",
        ),
        # load_more + infinite scroll markers, no qualifying links
        (
            '<button data-load-more="1">Load more</button>'
            '<div class="infinite-scroll" data-lazy-load="y">x</div>'
            '<a href="/plain">plain</a>',
            "api/v1/load_more ajax page load next batch",
        ),
        # empty page and a tie-ordering page
        ("", ""),
        ('<div class="load-more"><a href="/media/pic">media photo</a>'
         "</div>", "load more show more next batch"),
    ]
    for html, text in pages:
        root = parse_html(html)
        a = analyze_page(root, text)
        r = nav_result_from_features(page_nav_features(root, text))
        assert r["n_nav_links"] == len(a["navigation_links"])
        assert r["n_containers"] == len(a["image_containers"])
        assert round(r["confidence_score"], 4) == a["confidence_score"]
        got = [
            (p.split(":")[0], float(p.split(":")[1]))
            for p in r["patterns"].split(";")
            if p
        ]
        assert [(t, round(c, 4)) for t, c in got] == [
            (t, round(c, 4)) for t, c in a["patterns"]
        ]


def test_quality_and_classification():
    px = gen_pixels(7, 400, 300, "RGB")
    q = quality_score(px)
    assert 0.0 < q <= 1.0
    colors = analyze_colors(px)
    assert len(colors["dominant"]) == 5
    assert all(c.startswith("#") for c in colors["palette"])
    ct = classify_content_type(px, 400, 300)
    assert ct in {"text", "banner", "icon", "logo", "photo", "illustration"}
    assert classify_content_type(px, 3000, 500) == "banner"
    tiny = gen_pixels(3, 80, 60, "RGB")
    assert classify_content_type(tiny, 80, 60) == "icon"
    tags = ai_tags(2500, 1200, "RGB", "photo")
    assert "high_resolution" in tags and "landscape" in tags and "color" in tags
    assert "grayscale" in ai_tags(500, 500, "L", "photo")


def test_content_features_split_parity():
    """The M22 feature split (content_features → classify_from_features)
    must be bit-identical to the fused tree: edge_cnt/2500 reproduces
    _edge_density on the 50×50 downsample, and the split classifier
    agrees with classify_content_type on varied synthetic pixels —
    the local trust anchor under the images_tags SQL oracle."""
    from snapcrawler_ray.imageio.analyze import (
        _edge_density,
        _resize_nn,
        _to_gray,
        classify_from_features,
        content_features,
    )

    for seed, w, h, mode in [
        (1, 400, 300, "RGB"),
        (2, 80, 60, "RGB"),
        (3, 3000, 500, "RGB"),
        (4, 120, 900, "L"),
        (5, 640, 480, "RGBA"),
    ]:
        px = gen_pixels(seed, w, h, mode)
        edge_cnt, unique50 = content_features(px)
        px3 = np.stack([px] * 3, axis=-1) if px.ndim == 2 else px
        small = _resize_nn(px3[..., :3], 50, 50)
        assert edge_cnt / 2500.0 == _edge_density(_to_gray(small))
        assert classify_from_features(
            w, h, edge_cnt, unique50
        ) == classify_content_type(px, w, h)


def test_analyze_stage_batch(ray_session):
    import pyarrow as pa

    from snapcrawler_ray.imageio.analyze import AnalyzeStage, classify_from_features

    urls = [f"https://img-cdn0.example/pic/0/{k}.png" for k in range(6)]
    batch = pa.table({"url": pa.array(urls)})
    out = AnalyzeStage()(batch)
    assert "metadata" in out.column_names
    metas = out.column("metadata").to_pylist()
    assert all(m is not None for m in metas)
    assert all(0 <= m["quality_score"] <= 1 for m in metas)
    # the features struct the images_tags oracle consumes must carry
    # exactly the integers the metadata's classification came from
    feats = out.column("features").to_pylist()
    assert all(f is not None for f in feats)
    for m, f in zip(metas, feats):
        assert m["content_type"] == classify_from_features(
            f["width"], f["height"], f["edge_cnt"], f["unique50"]
        )
        assert m["ai_tags"][0] == m["content_type"]


# -------------------- A5 compact stats formatter --------------------


def test_compact_stats_line_and_url_short():
    from snapcrawler_ray.logfmt import (
        CompactStatsFormatter, format_process_status, format_url_short,
        stats_from_run,
    )

    f = CompactStatsFormatter()
    f.update_stats(pages_found=12, images_found=40, images_failed=7,
                   images_downloaded=33, images_saved=26,
                   folder_size_mb=1.25)
    line = f.format_compact_line()
    assert line == ("Pages: 12 | Found: 40 | Rejected: 7 | "
                    "Downloaded: 33 | Saved: 26 | Folder: 1.2MB | "
                    "Errors: none")
    f.update_stats(has_errors=True, error_code=429)
    assert line.rsplit("|", 1)[0] in f.format_compact_line()
    assert "Errors: 429" in f.format_compact_line()

    # reference truncation rules: last-5 of name + ext
    assert format_url_short("https://example.com/image123.jpg") == "ge123.jpg"
    assert format_url_short("https://example.com/ab.png") == "ab.png"
    assert format_url_short("https://example.com/dir/") in ("e.com", "dir")
    assert format_url_short("") == "???"
    assert format_process_status("watermark_fail", "x.jpg") == "[WATERMARK] x.jpg"
    assert format_process_status("unknown_thing") == "[UNKNOWN_THING]"

    # derived from engine metrics + verdict histogram
    s = stats_from_run(
        [{"fetched": 5, "images": 9}, {"fetched": 3, "images": 2}],
        {"": 6, "size": 2, "dup": 3},
        bytes_written=2_097_152,
    )
    assert (s.pages_found, s.images_found) == (8, 11)
    assert (s.images_saved, s.images_failed, s.images_downloaded) == (6, 5, 11)
    assert s.folder_size_mb == 2.0


def test_dump_parquet_bare_filename(tmp_path, monkeypatch):
    """_dump_parquet must not crash on a cwd-relative bare filename
    (os.path.dirname('x.parquet') == '' and makedirs('') raises)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snapcrawler_ray.functions.webops import _dump_parquet

    monkeypatch.chdir(tmp_path)
    t = pa.table({"a": [1, 2]})
    _dump_parquet(t, "bare.parquet")
    assert pq.read_table("bare.parquet").equals(t)
    _dump_parquet(t, str(tmp_path / "sub" / "dir" / "nested.parquet"))
    assert pq.read_table(tmp_path / "sub" / "dir" / "nested.parquet").equals(t)
