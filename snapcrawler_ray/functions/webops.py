"""Driver-visible pipelines for the web-operator library modules.

SURVEY.md §2 operators that previously existed only as library code —
the spider-superset extractor (M5–M10, reference image_spider.py:165-235),
AJAX/JSON harvest (M11, middlewares.py:160-257), sitemap source (S6/M17,
navigation_module.py:147-225), navigation scoring (M18/M19,
navigation_module.py:29-144,228-354), the content analyzer (M20–M23,
advanced_formats.py:215-374) and the multimodal media stages — each get
a deterministic Ray-Data pipeline here so the driver's CORRECTNESS
check sees them.  Inputs are the synthetic corpus (html pages) or
deterministic payload tables synthesized from the corpus spec; every
function is a pure function of (spec, sf) and returns stable rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _dump_parquet(table: pa.Table, path: str) -> None:
    """Write a small oracle-dump table to ``path``, creating parent
    dirs (dirname('') for a bare cwd-relative filename must not crash
    makedirs)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)


def _read_corpus(corpus_dir: str, columns: list[str]) -> "ray.data.Dataset":
    # bucket=N/part-0.parquet layout; one file per bucket keeps the read
    # parallel without an override
    return ray.data.read_parquet(corpus_dir, columns=columns)


# ------------------------------------------------- M5–M10: extended extract

def synth_extended_pages() -> pa.Table:
    """Deterministic extractor-torture pages unioned into the
    ``docs_extended_images`` input so the SQL oracle's urljoin / strip /
    per-stage-filter replay exercises every branch with real variance —
    the plain corpus only emits absolute lowercase https URLs, which
    would leave the relative-resolution and filter arms
    driver-unverified (the r2 'vacuous pass' lesson).

    Page k cycles through: every lazy attribute (k mod 10) with image
    and NON-image values, loading=lazy, picture/source srcset +
    data-srcset, img srcset, all ten CSS url() patterns + the var()
    indirection, the three JS string regexes, nested JSON-LD
    (dict/list/invalid-JSON), and raw URL forms — absolute,
    protocol-relative (//cdn), root-relative (/x), bare-relative
    (x.png), one-level ../ , surrounding whitespace, uppercase .JPG,
    query-string suffixes (dropped by the endswith rule) and
    cross-stage duplicates (set-dedup arm)."""
    from ..html.extended import LAZY_ATTRS

    urls, htmls = [], []
    for k in range(40):
        base = f"https://synthext{k % 4}.example/gal/{k}/view"
        parts = ["<html><head>"]
        if k % 2 == 0:
            parts.append(
                "<style>.a { background-image: url('/css/bg%d.png'); }\n"
                "--hero%d: url(rel/var%d.jpg);\n"
                ".b { mask-image: url(\"//cdn%d.example/m.webp\"); }\n"
                ".c { content: url(../up%d.gif); }\n"
                ".d { border-image-source: url(/css/not%d.txt); }\n"
                ".e { background: red url('q%d.jpg?w=64') no-repeat; }\n"
                ".f { image-set('set%d.avif' 1x); }\n"
                ".g { -webkit-image-set('wset%d.ico' 1x); }\n"
                ".h { clip-path: url(clip%d.svg); }\n"
                ".i { border-image: url(bi%d.bmp); }\n"
                ".j { background-image: var(--hero%d); }</style>"
                % tuple([k] * 12)
            )
        parts.append("</head><body>")
        attr = LAZY_ATTRS[k % len(LAZY_ATTRS)]
        parts.append(f'<img src="  plain{k}.JPG  " {attr}="lazy{k}.webp"/>')
        parts.append(f'<img {attr}="lazy{k}.html"/>')  # per-stage filtered
        parts.append(f'<div {attr}="dlazy{k}.tiff">x</div>')
        if k % 3 == 0:
            parts.append(f'<img loading="lazy" src="/ll/{k}.heic"/>')
            parts.append(f'<div data-background-image="dbg{k}.heif">y</div>')
        if k % 3 == 1:
            parts.append(
                f'<picture><source srcset="//cdn{k}.example/r1.jpg 1x,'
                f' r2-{k}.jpeg 2x" data-srcset="/r3/{k}.png 640w"/>'
                f'<img src="fb{k}.gif" srcset="s1-{k}.webp 320w"/></picture>'
            )
        if k % 3 == 2:
            parts.append(
                '<script type="application/ld+json">'
                f'{{"image": " /ld/{k}.jpg", "x": {{"thumbnail":'
                f' "ld-t{k}.png", "deep": [{{"photo": "ld-p{k}.pdf"}},'
                f' {{"picture": "../ld-q{k}.webp"}}]}}}}</script>'
            )
            parts.append(
                '<script type="application/ld+json">{broken json'
                f' "image": "never{k}.jpg"</script>'
            )
        if k % 4 == 0:
            parts.append(
                f'<script>var hero = "//cdn{k}.example/js/h{k}.jpg";'
                f" obj.src = 'js-i{k}.png';"
                f' cfg.image = "/js/deep{k}.svg";</script>'
            )
        # cross-stage duplicate: same URL via src and CSS and JS
        parts.append(f'<img src="/dup/{k}.png"/>')
        parts.append(f'<div style="background-image:url(/dup/{k}.png)">z</div>')
        parts.append("</body></html>")
        urls.append(base)
        htmls.append("".join(parts).encode())
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def extended_images(
    corpus_dir: str,
    raw_out: str | None = None,
    with_synth_pages: bool = False,
) -> "ray.data.Dataset":
    """(page_url, image_url) — one row per spider-superset-extracted
    image, sorted-unique per page (engine canonicalization §2.8).

    ``raw_out``: also write the pre-filter candidate stream
    ``(page_url, stage, raw)`` (see html.extended collect contract)
    there as a distributed ``write_parquet`` directory; the DuckDB
    oracle (``__ray_entry__._extended_images_sql``) re-derives the
    final rows from that dump alone — per-stage extension filter,
    strip, urljoin (absolute / protocol-relative / root-relative /
    bare-relative / one-level ../), final endswith validation,
    set-dedup and sort — so the whole downstream composition sits
    under the driver's hard value gate."""
    from ..html.extended import extended_extract_from_html

    def f(batch: pa.Table) -> pa.Table:
        src, img = [], []
        rsrc, rstage, rraw = [], [], []
        for u, h in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            buf: list[tuple[str, str]] | None = (
                [] if raw_out is not None else None
            )
            for iu in extended_extract_from_html(h, u, collect=buf):
                src.append(u)
                img.append(iu)
            if buf:
                for stage, rv in buf:
                    rsrc.append(u)
                    rstage.append(stage)
                    rraw.append(rv)
        out = pa.table(
            {
                "page_url": pa.array(src, pa.string()),
                "image_url": pa.array(img, pa.string()),
            }
        )
        if raw_out is None:
            return out
        return {
            "out": out,
            "raw": pa.table(
                {
                    "page_url": pa.array(rsrc, pa.string()),
                    "stage": pa.array(rstage, pa.string()),
                    "raw": pa.array(rraw, pa.string()),
                }
            ),
        }

    inp = _read_corpus(corpus_dir, ["url", "html"])
    if with_synth_pages:
        inp = inp.union(ray.data.from_arrow(synth_extended_pages()))
    if raw_out is None:
        return inp.map_batches(f, batch_format="pyarrow", batch_size=128)

    # ONE extraction pass feeds both the result and the oracle dump
    # (dump-then-read, the images_tags pattern): the tagged union of
    # out+raw rows is written once, then each side is read back with a
    # cheap filter — no materialize barrier, no re-extraction
    import shutil

    import pyarrow.compute as pc

    shutil.rmtree(raw_out, ignore_errors=True)
    inp.map_batches(
        lambda b: _tagged_union(f(b)), batch_format="pyarrow", batch_size=128
    ).write_parquet(raw_out)
    # the SQL oracle reads the same directory and filters side='raw'
    # itself; the engine result is the out side
    return ray.data.read_parquet(
        raw_out, columns=["side", "page_url", "image_url"]
    ).map_batches(
        lambda b: b.filter(pc.equal(b.column("side"), "out")).select(
            ["page_url", "image_url"]
        ),
        batch_format="pyarrow",
    )


def _tagged_union(parts: dict) -> pa.Table:
    """Stack the ``out`` and ``raw`` tables of one extraction batch into
    a single tagged table (side, page_url, image_url, stage, raw) so a
    single map_batches pass can feed both the result and the dump."""
    out, raw = parts["out"], parts["raw"]
    n_o, n_r = out.num_rows, raw.num_rows
    return pa.table(
        {
            "side": pa.array(["out"] * n_o + ["raw"] * n_r, pa.string()),
            "page_url": pa.array(
                out.column("page_url").to_pylist()
                + raw.column("page_url").to_pylist(),
                pa.string(),
            ),
            "image_url": pa.array(
                out.column("image_url").to_pylist() + [None] * n_r,
                pa.string(),
            ),
            "stage": pa.array(
                [None] * n_o + raw.column("stage").to_pylist(), pa.string()
            ),
            "raw": pa.array(
                [None] * n_o + raw.column("raw").to_pylist(), pa.string()
            ),
        }
    )


# ------------------------------------------------------- M11: API harvest

def synth_api_payloads(spec) -> pa.Table:
    """Deterministic API-response table: per host one JSON payload
    (recursive-walk path), one JSON list payload, and one non-JSON body
    (regex fallback path).  Pure function of the corpus spec."""
    from ..sources.corpus import host_name, image_file_url

    urls, bodies = [], []
    for h in range(spec.n_hosts):
        base = f"https://{host_name(h)}/api"
        urls.append(f"{base}/item.json")
        bodies.append(
            (
                '{"title": "x", "image": "%s", "nested": {"thumbnail": "%s",'
                ' "items": [{"photo": "%s"}, {"photo": "not-an-image"}]}}'
                % (
                    image_file_url(h, 500),
                    image_file_url(h, 501, "png"),
                    image_file_url(h, 502, "webp"),
                )
            ).encode()
        )
        urls.append(f"{base}/feed.json")
        bodies.append(
            (
                '[{"picture": "%s"}, {"picture": "%s"}]'
                % (image_file_url(h, 510), image_file_url(h, 511, "gif"))
            ).encode()
        )
        urls.append(f"{base}/fragment.html")
        bodies.append(
            (
                "<div>not json %s and %s?w=640 end</div>"
                % (image_file_url(h, 520), image_file_url(h, 521, "jpeg"))
            ).encode()
        )
    return pa.table(
        {"url": pa.array(urls, pa.string()), "body": pa.array(bodies, pa.binary())}
    )


def api_harvest(spec, payloads_out: str | None = None) -> "ray.data.Dataset":
    """(source_url, image_url) rows harvested from API payloads.

    ``payloads_out``: dump the payload table to Parquet so an external
    SQL oracle can replay the recursive JSON walk (DuckDB WITH
    RECURSIVE over json_keys/json_extract) + regex fallback."""
    from .jsonx import api_payload_flat_map

    t = synth_api_payloads(spec)
    if payloads_out is not None:
        _dump_parquet(t, payloads_out)
    n_blocks = max(1, min(8, t.num_rows // 8 + 1))
    return ray.data.from_arrow(t).repartition(n_blocks).map_batches(
        api_payload_flat_map, batch_format="pyarrow"
    )


# ------------------------------------------------- S6/M17: sitemap source

def synth_sitemap_payloads(spec) -> pa.Table:
    """Per host: a urlset sitemap (priorities cycling 0.0–0.9 so the
    >0.3 enqueue filter bites), a sitemapindex, and a robots.txt with a
    Sitemap: line.  Deterministic function of the spec."""
    from ..sources.corpus import host_name, page_url

    urls, bodies = [], []
    for h in range(spec.n_hosts):
        host = host_name(h)
        n = min(int(spec.host_page_counts()[h]), 40)
        entries = []
        for i in range(n):
            pr = ((i * 7 + h) % 10) / 10.0
            cf = ["daily", "weekly", "monthly"][i % 3]
            entries.append(
                f"<url><loc>{page_url(h, i)}</loc>"
                f"<priority>{pr:.1f}</priority>"
                f"<changefreq>{cf}</changefreq></url>"
            )
        urls.append(f"https://{host}/sitemap.xml")
        bodies.append(
            (
                '<?xml version="1.0"?><urlset '
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                + "".join(entries)
                + "</urlset>"
            ).encode()
        )
        urls.append(f"https://{host}/sitemap_index.xml")
        bodies.append(
            (
                '<?xml version="1.0"?><sitemapindex '
                'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                f"<sitemap><loc>https://{host}/sitemap.xml</loc></sitemap>"
                "</sitemapindex>"
            ).encode()
        )
        urls.append(f"https://{host}/robots.txt")
        bodies.append(
            f"User-agent: *\nSitemap: https://{host}/sitemap.xml\n".encode()
        )
    return pa.table(
        {"url": pa.array(urls, pa.string()), "body": pa.array(bodies, pa.binary())}
    )


def sitemap_frontier(
    spec, min_priority: float = 0.3, payloads_out: str | None = None
) -> "ray.data.Dataset":
    """Frontier rows (url, priority) from every sitemap/robots payload:
    parse → priority filter (reference filters > 0.3 at enqueue,
    navigation_module.py:563).  Sitemap-index/robots rows surface as
    (sitemap_url, 1.0) 'sitemap' kind rows so the probe chain is
    visible too.

    ``payloads_out``: write the fetched (url, body) payload table to
    Parquet so an external SQL oracle can replay the urlset/
    sitemapindex/robots parse + priority filter independently (DuckDB
    regex extraction over the same payloads this ElementTree path
    consumes)."""
    from ..sources.sitemap import parse_sitemap

    def f(batch: pa.Table) -> pa.Table:
        src, url, kind, prio = [], [], [], []
        for u, b in zip(
            batch.column("url").to_pylist(), batch.column("body").to_pylist()
        ):
            for e in parse_sitemap(b, u):
                if e["type"] == "page" and e["priority"] <= min_priority:
                    continue
                src.append(u)
                url.append(e["url"])
                kind.append(e["type"])
                prio.append(float(e["priority"]))
        return pa.table(
            {
                "source_url": pa.array(src, pa.string()),
                "url": pa.array(url, pa.string()),
                "kind": pa.array(kind, pa.string()),
                "priority": pa.array(prio, pa.float64()),
            }
        )

    t = synth_sitemap_payloads(spec)
    if payloads_out is not None:
        _dump_parquet(t, payloads_out)
    n_blocks = max(1, min(8, t.num_rows // 8 + 1))
    return ray.data.from_arrow(t).repartition(n_blocks).map_batches(
        f, batch_format="pyarrow"
    )


# ------------------------------------------- M18/M19: navigation scoring

_NAV_PUBLIC = (
    "url", "n_nav_links", "n_containers", "patterns", "confidence_score",
)
_NAV_FEATURES = (
    "url", "sel_pag", "url_pag", "sel_inf", "url_inf", "sel_load",
    "url_load", "lc0", "lc1", "lc2", "lc3", "lc4", "lc5", "lc6", "lc7",
    "cont_imgs", "cont_elems",
)


def synth_nav_pages(n: int = 48) -> pa.Table:
    """Deterministic nav-rich pages (url, html, text) unioned into the
    nav_scores input so the DuckDB oracle exercises EVERY arithmetic
    branch with real variance — the plain corpus only ever trips one
    pagination selector (conf 0.06 < 0.5 threshold) and the container
    path, which would leave the pattern-confidence and link-relevance
    cuts driver-unverified (the r2 'vacuous pass' lesson).

    Page k cycles: pagination anchors/rel=next/aria nav (k mod 3),
    'Load more' buttons + load-more markers (k mod 4), infinite-scroll
    attrs (k mod 5), url-regex text hits (k mod 2 / k mod 3), links
    hitting each relevance combo — gallery hrefs (url bit), gallery
    text (text bit), jpg/photo mentions (indicator bit) — and
    containers straddling the 0.3 img-density cut."""
    urls, htmls, texts = [], [], []
    for k in range(n):
        parts = []
        if k % 3 == 0:
            parts.append(f'<a href="?page={k}">Next</a>')
            parts.append('<div class="pagination"><a href="/p2">2</a></div>')
        if k % 3 == 1:
            parts.append('<a rel="next" href="/page/2">&gt;</a>')
            parts.append(
                '<nav aria-label="pagination"><a href="/page/3">3</a></nav>'
            )
        if k % 4 == 0:
            parts.append("<button>Load more</button>")
            parts.append('<div class="load-more">x</div>')
        if k % 4 == 1:
            parts.append('<button data-load-more="1">Show more</button>')
        if k % 5 == 0:
            parts.append('<div data-infinite-scroll="y">s</div>')
        if k % 5 == 1:
            parts.append('<section class="infinite-scroll">s</section>')
        # link-relevance combos: url/text/indicator bits in rotation
        if k % 2 == 0:
            parts.append('<a href="/gallery/a">photo set</a>')   # 1,0,1
            parts.append('<a href="/archive/b">misc entry</a>')  # 1,0,0
        if k % 2 == 1:
            parts.append('<a href="/x">media content</a>')       # 0,1,0
            parts.append('<a href="/y">category pictures</a>')   # 0,1,1
            parts.append('<a href="/gallery/c">tag list</a>')    # 1,1,0
        if k % 7 == 0:
            parts.append('<a href="/media/d.jpg">photo gallery</a>')  # 1,1,1
            parts.append('<a href="/plain">plain</a>')           # 0,0,0
            parts.append('<a href="/e">see the jpg</a>')         # 0,0,1
        # containers straddling the 10·imgs > 3·elems density cut
        imgs = "".join('<img src="i.png">' for _ in range(k % 4))
        pads = "".join("<p>t</p>" for _ in range(k % 6))
        parts.append(f"<div>{imgs}{pads}</div>")
        text = ""
        if k % 2 == 0:
            text += f"see page={k} and offset={k} "
        if k % 3 == 0:
            text += "api/v1/load_more ajax page "
        if k % 4 == 0:
            text += "load more next batch show more "
        urls.append(f"https://nav-fixture.example/p/{k}")
        htmls.append("<html><body>" + "".join(parts) + "</body></html>")
        texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(htmls, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def nav_scores(
    corpus_dir: str,
    features_out: str | None = None,
    with_synth_pages: bool = False,
) -> "ray.data.Dataset":
    """Per-page navigation analysis: relevant-link/container counts,
    detected patterns (``type:%.4f`` joined ';'), page confidence.

    ``features_out``: also write the raw integer feature table
    (html/navigation.py:page_nav_features — selector/url-regex hit
    counts, the 8 link-relevance combo counts ``lc{url·4+text·2+img}``,
    per-container img/element counts) there as a distributed
    ``write_parquet`` directory.  Every emitted score is pure
    arithmetic over those ints, so the DuckDB oracle recomputes the
    whole output independently (``__ray_entry__._nav_scores_sql``)."""
    from ..html.navigation import (
        nav_result_from_features,
        page_nav_features,
    )
    from ..html.parser import parse_html

    def f(batch: pa.Table) -> pa.Table:
        out: dict = {k: [] for k in _NAV_PUBLIC}
        fo: dict = {k: [] for k in _NAV_FEATURES[1:]}
        for u, h, txt in zip(
            batch.column("url").to_pylist(),
            batch.column("html").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            feats = page_nav_features(parse_html(h), txt or "")
            r = nav_result_from_features(feats)
            out["url"].append(u)
            for k in _NAV_PUBLIC[1:]:
                out[k].append(r[k])
            for short in ("pag", "inf", "load"):
                fo["sel_" + short].append(feats["sel_" + short])
                fo["url_" + short].append(feats["url_" + short])
            for code, cnt in enumerate(feats["link_combos"]):
                fo[f"lc{code}"].append(cnt)
            fo["cont_imgs"].append(feats["cont_imgs"])
            fo["cont_elems"].append(feats["cont_elems"])
        cols = {
            "url": pa.array(out["url"], pa.string()),
            "n_nav_links": pa.array(out["n_nav_links"], pa.int32()),
            "n_containers": pa.array(out["n_containers"], pa.int32()),
            "patterns": pa.array(out["patterns"], pa.string()),
            "confidence_score": pa.array(
                out["confidence_score"], pa.float64()
            ),
        }
        for k in _NAV_FEATURES[1:-2]:
            cols[k] = pa.array(fo[k], pa.int32())
        cols["cont_imgs"] = pa.array(fo["cont_imgs"], pa.list_(pa.int32()))
        cols["cont_elems"] = pa.array(
            fo["cont_elems"], pa.list_(pa.int32())
        )
        return pa.table(cols)

    inp = _read_corpus(corpus_dir, ["url", "html", "text"])
    if with_synth_pages:
        inp = inp.union(ray.data.from_arrow(synth_nav_pages()))
    ds = inp.map_batches(f, batch_format="pyarrow", batch_size=128)
    if features_out is not None:
        import os
        import shutil

        ds = ds.materialize()
        shutil.rmtree(features_out, ignore_errors=True)  # no stale mix
        os.makedirs(features_out, exist_ok=True)
        ds.select_columns(list(_NAV_FEATURES)).write_parquet(features_out)
    return ds.select_columns(list(_NAV_PUBLIC))


# --------------------------------------------- M20–M23: analyzer pipeline

def analyzed_images(emissions: pa.Table, images_cfg, meta=None,
                    qfeatures: bool = False):
    """Accepted images → AnalyzeStage (via the §2.11 step registry).
    Returns the analyzed Dataset (columns: emit_seq, url, metadata
    struct, features struct[, qfeatures struct]) — shared by
    ``images_analysis`` and ``images_tags`` so one decode+analyze pass
    feeds both queries.  Pass ``meta`` (the verdict Dataset from
    ``run_image_pipeline``) to reuse an already-executed pipeline
    instead of re-running it."""
    from ..pipelines.images import run_image_pipeline
    from ..steps import run_chain

    if meta is None:
        meta = run_image_pipeline(emissions, images_cfg)
    import pyarrow.compute as pc

    accepted = meta.map_batches(
        lambda b: b.filter(pc.equal(b.column("reason"), "")).select(
            ["emit_seq", "url"]
        ),
        batch_format="pyarrow",
        batch_size=1024,
    )
    # split blocks so the actor pool actually fans out — task parallelism
    # is bounded by block count, and the materialized verdict table has
    # only a handful of blocks
    n_acc = accepted.count()
    accepted = accepted.repartition(max(1, min(64, n_acc // 32 + 1)))
    return run_chain(
        accepted,
        [("analyze", {"concurrency": (1, 16), "batch_size": 32,
                      "qfeatures": qfeatures})],
    )


def images_analysis(
    emissions: pa.Table,
    images_cfg,
    meta=None,
    analyzed=None,
    features_out: str | None = None,
) -> pd.DataFrame:
    """Flat metadata columns (M20–M23) per accepted image, sorted by
    emit_seq.

    Without ``features_out``: the full-fidelity library output —
    reference round-6 float quality, dominant colors AND the clustered
    palette.

    With ``features_out``: the SQL-ORACLED contract projection.  The
    engine dumps the M20/M21 primitives (quality terms lap_var /
    gray_std / gray_mean / unique_colors / px dims, the 100×100 packed
    color histogram, plus the M22 integer features) to Parquet, and
    DuckDB re-derives EVERY returned column independently
    (``__ray_entry__._images_analysis_sql``): quality as half-away
    micro-units of the identically-composed double, content_type via
    the threshold tree, dominant_colors via the count-desc/packed-asc
    top-5, ai_tags via the tag rules.  The clustered color palette is
    the one column that stays library-only: its float k-means with
    RandomState(42) subset init is not SQL-expressible — the kernel is
    pytest-gated instead (test_extended_and_nav).  Pixel decode and
    feature extraction stay conformance-tested locally — the
    images_tags trust split."""
    if analyzed is None:
        analyzed = analyzed_images(
            emissions, images_cfg, meta, qfeatures=features_out is not None
        )
    if features_out is not None:
        def project(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_valid(b.column("qfeatures"))
            b = b.filter(mask)
            f = b.column("features")
            qf = b.column("qfeatures")
            m = b.column("metadata")
            cols = {
                "emit_seq": b.column("emit_seq"),
                "url": b.column("url"),
            }
            for name in ("width", "height", "mode", "edge_cnt", "unique50"):
                cols[name] = pc.struct_field(f, name)
            for name in (
                "lap_var", "gray_std", "gray_mean", "unique_colors",
                "px_h", "px_w", "quality_micro", "cpacked", "ccnt",
            ):
                cols[name] = pc.struct_field(qf, name)
            cols["content_type"] = pc.struct_field(m, "content_type")
            cols["dominant_colors"] = pa.array(
                [",".join(x) for x in
                 pc.struct_field(m, "dominant_colors").to_pylist()],
                pa.string(),
            )
            cols["ai_tags"] = pa.array(
                [",".join(x) for x in
                 pc.struct_field(m, "ai_tags").to_pylist()],
                pa.string(),
            )
            return pa.table(cols)

        import shutil

        projected = analyzed.map_batches(project, batch_format="pyarrow")
        # dump-then-read: the oracle must see exactly the primitives the
        # engine derived its answer from (same pass, same rows)
        shutil.rmtree(features_out, ignore_errors=True)
        projected.write_parquet(features_out)
        import ray.data as rd

        out = (
            rd.read_parquet(
                features_out,
                columns=[
                    "emit_seq", "url", "quality_micro", "content_type",
                    "dominant_colors", "ai_tags",
                ],
            )
            .to_pandas()
        )
        out["emit_seq"] = out["emit_seq"].astype("int64")
        out["quality_micro"] = out["quality_micro"].astype("int64")
        return out.sort_values("emit_seq").reset_index(drop=True)

    def flatten(df: pd.DataFrame) -> pd.DataFrame:
        m = df["metadata"]
        return pd.DataFrame(
            {
                "emit_seq": df["emit_seq"],
                "url": df["url"],
                "quality_score": [
                    x["quality_score"] if x else np.nan for x in m
                ],
                "content_type": [
                    x["content_type"] if x else "" for x in m
                ],
                "dominant_colors": [
                    ",".join(x["dominant_colors"]) if x else "" for x in m
                ],
                "color_palette": [
                    ",".join(x["color_palette"]) if x else "" for x in m
                ],
                "ai_tags": [",".join(x["ai_tags"]) if x else "" for x in m],
            }
        )

    out = analyzed.map_batches(flatten, batch_format="pandas").to_pandas()
    return out.sort_values("emit_seq").reset_index(drop=True)


def images_tags(
    emissions: pa.Table,
    images_cfg,
    meta=None,
    analyzed=None,
    features_out: str | None = None,
) -> pd.DataFrame:
    """emit_seq, url, content_type, ai_tags (comma-joined) per decoded
    accepted image — the M22 classifier tree + M23 tag derivation,
    SQL-ORACLED: the integer features the tree consumes (width, height,
    mode, edge_cnt, unique50 — see ``analyze.content_features``) are
    dumped to ``features_out`` as Parquet, and DuckDB replays
    ``classify_from_features`` + ``ai_tags`` over them (reference
    semantics: advanced_formats.py:305-374).  Pixel decode and feature
    extraction stay conformance-tested locally; the DECISION LOGIC sits
    under the driver's hard value gate — the same trust split as the
    crawl_image_verdicts pre-dedup-dump oracle."""
    if analyzed is None:
        analyzed = analyzed_images(emissions, images_cfg, meta)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        f = df["features"]
        ok = f.notna().to_numpy()
        sub = df.loc[ok]
        fs = sub["features"]
        return pd.DataFrame(
            {
                "emit_seq": sub["emit_seq"].astype("int64"),
                "url": sub["url"],
                "width": [x["width"] for x in fs],
                "height": [x["height"] for x in fs],
                "mode": [x["mode"] for x in fs],
                "edge_cnt": [x["edge_cnt"] for x in fs],
                "unique50": [x["unique50"] for x in fs],
                "content_type": [
                    x["content_type"] for x in sub["metadata"]
                ],
                "ai_tags": [
                    ",".join(x["ai_tags"]) for x in sub["metadata"]
                ],
            }
        )

    projected = analyzed.map_batches(project, batch_format="pandas")
    if features_out:
        import shutil

        # dump-then-read keeps the oracle input on disk AND feeds the
        # result from the same pass (the oracle must see exactly the
        # features the engine classified from)
        shutil.rmtree(features_out, ignore_errors=True)
        projected.write_parquet(features_out)
        import ray.data as rd

        projected = rd.read_parquet(features_out)
    out = projected.select_columns(
        ["emit_seq", "url", "content_type", "ai_tags"]
    ).to_pandas()
    for c in ("emit_seq",):
        out[c] = out[c].astype("int64")
    return out.sort_values("emit_seq").reset_index(drop=True)


# ------------------------------------------------- multimodal media table

def synth_media_table(n_rows: int = 120) -> pa.Table:
    """Deterministic media table: PNG images (real decode path), fake
    audio/video containers (documented codec boundary), plus an
    undecodable payload every 13th row (dead-letter path)."""
    from .. import multimodal as mm
    from ..imageio.png import encode_png

    ids, kinds, payloads, mimes = [], [], [], []
    for i in range(n_rows):
        kind = ("image", "audio", "video")[i % 3]
        if i % 13 == 12:
            payload = b"CORRUPT" + bytes([i % 256]) * 16
            mime = "application/octet-stream"
        elif kind == "image":
            rng = np.random.RandomState(1000 + i)
            w, h = 24 + (i % 5) * 8, 16 + (i % 7) * 8
            px = (
                np.add.outer(np.arange(h) * 3, np.arange(w) * 5) + i
            ).astype(np.uint8)
            px = np.stack([px, px[::-1], rng.randint(0, 255, (h, w))], -1).astype(
                np.uint8
            )
            payload = encode_png(px)
            mime = "image/png"
        elif kind == "audio":
            payload = mm.make_fake_audio(i, n_samples=4000)
            mime = "audio/x-fake"
        else:
            payload = mm.make_fake_video(i, n_frames=6)
            mime = "video/x-fake"
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        mimes.append(mime)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
        }
    )


def media_features(
    n_rows: int = 120, features_out: str | None = None
) -> pd.DataFrame:
    """Media table → feature rows (thumb dropped: scalar features only
    reach the driver), sorted by media_id.

    ``features_out``: dump the per-kind decode primitives (image
    pixel-sum/count + width, audio sample count/rate/Σs², video frame
    count/stride — multimodal.MEDIA_PRIMS_TYPE) alongside, and DuckDB
    re-derives feature_a / feature_b from them
    (``__ray_entry__._media_features_sql``).  Decode success/failure
    (ok, error) stays an engine observation — the codec boundary is the
    pixel-work side of the images_tags trust split."""
    from ..multimodal import MEDIA_PRIMS_TYPE, media_feature_pipeline

    ds = media_feature_pipeline(synth_media_table(n_rows))

    def flatten(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {
            n: b.column(n)
            for n in ("media_id", "kind", "ok", "error",
                      "feature_a", "feature_b")
        }
        for f in MEDIA_PRIMS_TYPE:
            cols[f.name] = pc.struct_field(b.column("prims"), f.name)
        return pa.table(cols)

    flat = ds.map_batches(flatten, batch_format="pyarrow")
    if features_out is not None:
        import shutil

        # dump-then-read: the oracle sees exactly the primitives the
        # engine composed its features from (same pass, same rows)
        shutil.rmtree(features_out, ignore_errors=True)
        flat.write_parquet(features_out)
        import ray.data as rd

        flat = rd.read_parquet(features_out)
    out = flat.select_columns(
        ["media_id", "kind", "ok", "error", "feature_a", "feature_b"]
    ).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


# --------------------------------------------- host-graph PageRank

def host_edges(corpus_dir: str) -> pd.DataFrame:
    """(src_host, dst_host, weight) — the weighted host-level link
    graph of the corpus (every http(s) ``<a href>``, cross-domain
    included).  Per-batch parse + partial pair counts; the folded edge
    list is O(hosts²) — the standard graph-summary artifact."""
    from ..html.parser import parse_html
    from ..urlnorm import host_of
    from urllib.parse import urljoin

    def f(batch: pa.Table) -> pa.Table:
        pairs: dict[tuple[str, str], int] = {}
        for u, h in zip(
            batch.column("url").to_pylist(), batch.column("html").to_pylist()
        ):
            src = host_of(u)
            root = parse_html(h)
            for a_tag in root.find_all("a", href=True):
                href = a_tag.get("href")
                if not href:
                    continue
                absolute = urljoin(u, href)
                if not absolute.startswith(("http://", "https://")):
                    continue
                dst = host_of(absolute)
                if dst:
                    k = (src, dst)
                    pairs[k] = pairs.get(k, 0) + 1
        if not pairs:
            return pa.table(
                {"src_host": pa.array([], pa.string()),
                 "dst_host": pa.array([], pa.string()),
                 "weight": pa.array([], pa.int64())}
            )
        ks, vs = zip(*pairs.items())
        return pa.table(
            {
                "src_host": pa.array([a for a, _ in ks], pa.string()),
                "dst_host": pa.array([b for _, b in ks], pa.string()),
                "weight": pa.array(vs, pa.int64()),
            }
        )

    from .agg import bucketed_combine

    # the edge fold runs as a hash-bucketed distributed reduce on
    # (src_host, dst_host) — each host pair lands in exactly one bucket,
    # so per-bucket sums are final and the driver only concatenates the
    # already-reduced O(hosts²)-bounded edge list
    edges = bucketed_combine(
        _read_corpus(corpus_dir, ["url", "html"]).map_batches(
            f, batch_format="pyarrow", batch_size=128
        ),
        ["src_host", "dst_host"],
        lambda df: df.groupby(["src_host", "dst_host"], as_index=False)[
            "weight"
        ].sum(),
    ).to_pandas()
    return edges.sort_values(["src_host", "dst_host"]).reset_index(drop=True)


#: fixed-point scale for the exact-integer PageRank (rank ≈ v / SCALE)
PAGERANK_SCALE = 10**12


def host_pagerank(
    corpus_dir: str, n_iter: int = 20, edges_out: str | None = None
) -> pd.DataFrame:
    """host, rank, rank_scaled — weighted PageRank over the host link
    graph (the iterative graph-analytics shape: edge Dataset ×
    per-iteration broadcast rank vector, partial destination sums
    folded on the driver — driver state is O(hosts), never the edge
    list; same topology as the k-means loop).

    EXACT-INTEGER semantics (damping fixed at 17/20 = 0.85), so the
    result is order-free — per-edge contributions are int64 floor
    divisions and integer sums commute — and therefore independently
    SQL-replayable (the DuckDB oracle unrolls the same n_iter
    fixed-point iterations over the edge parquet this function writes
    to ``edges_out``):

        v0_i  = SCALE // n
        c_e   = (v_src · w_e) // outw_src          per edge, floored
        v'_i  = (3·SCALE) // (20·n)                (1−d)/n term
              + (17·(inflow_i + D // n)) // 20     d·(inflow+dangling)
        D     = Σ v_j over dangling hosts (outw_j = 0)

    The floor losses bound |Σ rank − 1| ≤ n_iter·(|E|+n+2)/SCALE —
    ~1e-6 at corpus scale; the float column is v / SCALE."""
    edges_pd = host_edges(corpus_dir)
    if edges_out is not None:
        _dump_parquet(
            pa.Table.from_pandas(
                edges_pd[["src_host", "dst_host", "weight"]]
            ),
            edges_out,
        )
    hosts = np.unique(
        np.concatenate([edges_pd["src_host"].to_numpy(),
                        edges_pd["dst_host"].to_numpy()])
    )
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": [], "rank": [], "rank_scaled": []})
    edges_pd = edges_pd.assign(
        src=edges_pd["src_host"].map(idx).astype(np.int64),
        dst=edges_pd["dst_host"].map(idx).astype(np.int64),
    )
    # int64 safety: per-edge contribution is rank·weight before the
    # floor division, rank ≤ SCALE — a weight above 2^63/SCALE (~9.2e6
    # links between one host pair) would wrap silently.  Fail loudly;
    # the fix at that scale is pre-normalizing weights per source host.
    max_w = int(edges_pd["weight"].max()) if len(edges_pd) else 0
    if max_w > (2**63 - 1) // PAGERANK_SCALE:
        raise OverflowError(
            f"edge weight {max_w} would overflow the fixed-point "
            "contribution product; pre-scale host_edges weights"
        )
    outw = np.zeros(n, dtype=np.int64)
    np.add.at(outw, edges_pd["src"].to_numpy(),
              edges_pd["weight"].to_numpy(np.int64))
    edges = ray.data.from_pandas(
        edges_pd[["src", "dst", "weight"]]
    ).repartition(4)

    scale = PAGERANK_SCALE
    r = np.full(n, scale // n, dtype=np.int64)
    for _ in range(n_iter):
        # rank vector AND out-weight vector travel via the object store
        # (one ray.put per iteration, fetched once per task) — nothing
        # O(hosts) is captured in the task closure
        ref = ray.put((r, outw))

        def partial(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            rv, ow = ray.get(_ref)
            src = df["src"].to_numpy()
            # per-EDGE floor division: partition-independent, so the
            # partial sums commute exactly (int64 end to end)
            contrib = (rv[src] * df["weight"].to_numpy(np.int64)) // ow[src]
            # SPARSE (dst, sum) partial: rows = distinct destinations in
            # this batch, not a dense O(hosts) vector per batch
            return pd.DataFrame({"i": df["dst"].to_numpy(), "s": contrib}) \
                .groupby("i", as_index=False)["s"].sum()

        parts = edges.map_batches(partial, batch_format="pandas").to_pandas()
        inflow = np.zeros(n, dtype=np.int64)
        if len(parts):
            np.add.at(inflow, parts["i"].to_numpy(np.int64),
                      parts["s"].to_numpy(np.int64))
        dangling = int(r[outw == 0].sum())
        r = (3 * scale) // (20 * n) + (17 * (inflow + dangling // n)) // 20

    out = pd.DataFrame({
        "host": hosts,
        "rank": r.astype(np.float64) / scale,
        "rank_scaled": r,
    })
    return out.sort_values("host").reset_index(drop=True)
