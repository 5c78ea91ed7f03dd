"""Spider-superset image extraction (rebuild of M5–M10,
image_spider.py:165-235 and helpers).

The scrapy-mode spider extracts from more sources than the parallel
engine: lazy-load attributes (:259-281), responsive picture/srcset
(:283-317, srcset parse :654-669), enhanced CSS regexes (:351-396),
JS string patterns (:197-208), JSON-LD recursive walk (:211-219,
:572-585).  Browser-runtime sources (intercepted network requests,
human-emulation results, hidden/base64 images) have no meaning over a
Parquet corpus and are documented non-goals (SURVEY.md §2.12).

Fidelity notes: the spider defines ``_is_image_url`` twice; the later
definition (:653, extension endswith over a fixed list) wins in Python,
so that is the validity rule reproduced here.  Sub-extractors filter
raw attribute values before urljoin, and the composite does a final
urljoin+validate+set-dedup pass (:228-235); we preserve that order and
emit sorted-unique (engine-wide canonicalization, SURVEY.md §2.8).
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin

from .parser import Node, parse_html

_EXTS = (
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".avif", ".svg", ".bmp",
    ".tiff", ".ico", ".heic", ".heif",
)

LAZY_ATTRS = (
    "data-src", "data-lazy-src", "data-original", "data-lazy",
    "data-srcset", "data-background-image", "data-bg",
    "data-image", "data-thumb", "data-full-src",
)

_CSS_PATTERNS = [
    r'background-image:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'background:\s*[^;]*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'image-set\(\s*[\'\"]?([^\'\"]+)[\'\"]?',
    r'-webkit-image-set\(\s*[\'\"]?([^\'\"]+)[\'\"]?',
    r'--[\w-]+:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'content:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'mask-image:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'clip-path:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'border-image-source:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
    r'border-image:\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)',
]
_CSS_RES = [re.compile(p, re.IGNORECASE) for p in _CSS_PATTERNS]
_CSS_VAR_RE = re.compile(r"var\((--[\w-]+)\)")

_JS_PATTERNS = [
    # reproduced verbatim incl. the unescaped dot before the extension
    # group (image_spider.py:199-203)
    r'["\']([^"\']*/[^"\']*.(?:jpg|jpeg|png|gif|webp|svg))["\']',
    r'src["\']?\s*[:=]\s*["\']([^"\']*.(?:jpg|jpeg|png|gif|webp|svg))["\']',
    r'image["\']?\s*[:=]\s*["\']([^"\']*.(?:jpg|jpeg|png|gif|webp|svg))["\']',
]
_JS_RES = [re.compile(p, re.IGNORECASE) for p in _JS_PATTERNS]

_JSON_IMG_KEYS = {"image", "thumbnail", "photo", "picture"}


def is_image_url_ext(url: str) -> bool:
    """image_spider.py:653 endswith rule (the live definition)."""
    return bool(url) and url.lower().endswith(_EXTS)


def parse_srcset(srcset: str) -> list[str]:
    """image_spider.py:654-669: split on ',', first token per entry."""
    urls = []
    for entry in srcset.split(","):
        entry = entry.strip()
        if entry:
            url = entry.split()[0]
            if url:
                urls.append(url)
    return urls


def _from_json(data, collect: list | None = None) -> list[str]:
    """image_spider.py:572-585 recursive walk.

    ``collect``: optional list receiving every string leaf found under
    an image key BEFORE the extension check — the pre-filter candidate
    stream the ``docs_extended_images`` SQL oracle re-filters."""
    images: list[str] = []
    if isinstance(data, dict):
        for key, value in data.items():
            if key.lower() in _JSON_IMG_KEYS and isinstance(value, str):
                if collect is not None:
                    collect.append(value)
                if is_image_url_ext(value):
                    images.append(value)
            elif isinstance(value, (dict, list)):
                images.extend(_from_json(value, collect))
    elif isinstance(data, list):
        for item in data:
            images.extend(_from_json(item, collect))
    return images


def _all_text_of(root: Node, tag: str) -> list[str]:
    out = []
    for n in root.find_all(tag):
        txt = "".join(t for t in n.iter_text(skip=frozenset()))
        out.append(txt)
    return out


def extended_extract_images(
    root: Node,
    base_url: str,
    extract_lazy_loaded: bool = True,
    extract_responsive: bool = True,
    enhanced_css: bool = True,
    js_strings: bool = True,
    json_ld: bool = True,
    collect: list | None = None,
) -> list[str]:
    """Sorted-unique absolute image URLs from every M5 source.

    ``collect``: optional list receiving ``(stage, raw_value)`` for
    every candidate string BEFORE that stage's extension filter (stages
    ``img``/``js`` have no per-stage filter; ``lazy``/``resp``/``css``/
    ``jsonld`` drop non-image extensions before the merge).  The
    ``docs_extended_images`` SQL oracle replays the whole downstream
    composition — per-stage ext filter, strip, urljoin, final ext
    validation, set-dedup, sort — over a Parquet dump of this stream,
    so only the HTML parsing / regex scanning above this line stays
    conformance-tested locally (the images_tags trust split)."""
    raw: list[str] = []

    def _note(stage: str, values: list[str]) -> None:
        if collect is not None:
            collect.extend((stage, v) for v in values)

    # 1. standard <img src>
    for img in root.find_all("img"):
        src = img.get("src")
        if src:
            raw.append(src)
            _note("img", [src])

    # 2. lazy loading (image_spider.py:259-281)
    if extract_lazy_loaded:
        lazy: list[str] = []
        for attr in LAZY_ATTRS:
            for img in root.find_all("img"):
                v = img.get(attr)
                if v:
                    lazy.append(v)
            for el in root.find_all(attrs={attr: True}):
                v = el.get(attr)
                if v:
                    lazy.append(v)
        for img in root.find_all("img"):
            if img.get("loading") == "lazy" and img.get("src"):
                lazy.append(img.get("src"))
        for el in root.find_all(attrs={"data-background-image": True}):
            v = el.get("data-background-image")
            if v:
                lazy.append(v)
        _note("lazy", lazy)
        raw.extend(u for u in lazy if u and is_image_url_ext(u))

    # 3. responsive picture/srcset (:283-317)
    if extract_responsive:
        resp: list[str] = []
        for picture in root.find_all("picture"):
            for source in picture.find_all("source"):
                for attr in ("srcset", "data-srcset"):
                    v = source.get(attr)
                    if v:
                        resp.extend(parse_srcset(v))
            for img in picture.find_all("img"):
                if img.get("src"):
                    resp.append(img.get("src"))
        for img in root.find_all("img"):
            for attr in ("srcset", "data-srcset"):
                v = img.get(attr)
                if v:
                    resp.extend(parse_srcset(v))
        _note("resp", resp)
        raw.extend(u for u in resp if u and is_image_url_ext(u))

    # 5. enhanced CSS (:351-396) — style tags + inline styles joined
    if enhanced_css:
        style_texts = _all_text_of(root, "style")
        inline = [
            el.get("style") for el in root.find_all(style=True) if el.get("style")
        ]
        all_styles = " ".join(style_texts + inline)
        css: list[str] = []
        for rx in _CSS_RES:
            css.extend(rx.findall(all_styles))
        for var_name in _CSS_VAR_RE.findall(all_styles):
            var_rx = re.compile(
                re.escape(var_name) + r":\s*url\([\'\"]?([^\'\"]+)[\'\"]?\)",
                re.IGNORECASE,
            )
            css.extend(var_rx.findall(all_styles))
        _note("css", css)
        raw.extend(u for u in css if u and is_image_url_ext(u))

    # JS string patterns (:197-208) — scripts joined with spaces
    scripts = root.find_all("script")
    if js_strings:
        plain = [
            "".join(t for t in s.iter_text(skip=frozenset()))
            for s in scripts
            if s.get("type") in (None, "text/javascript", "application/javascript")
        ]
        all_scripts = " ".join(plain)
        for rx in _JS_RES:
            found = rx.findall(all_scripts)
            _note("js", found)
            raw.extend(found)

    # JSON-LD (:211-219)
    if json_ld:
        for s in scripts:
            if s.get("type") == "application/ld+json":
                txt = "".join(t for t in s.iter_text(skip=frozenset()))
                try:
                    buf: list[str] = []
                    found = _from_json(json.loads(txt), buf)
                    _note("jsonld", buf)
                    raw.extend(found)
                except Exception:
                    pass

    # final clean: urljoin + validate + set dedup (:228-235)
    cleaned = []
    for u in raw:
        if u and isinstance(u, str):
            absolute = urljoin(base_url, u.strip())
            if is_image_url_ext(absolute):
                cleaned.append(absolute)
    return sorted(set(cleaned))


def extended_extract_from_html(html: bytes | str, url: str, **flags) -> list[str]:
    return extended_extract_images(parse_html(html), url, **flags)
