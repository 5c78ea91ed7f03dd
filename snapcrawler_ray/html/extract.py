"""Reference-faithful page extraction (the per-row invariant).

Reimplements — from observed behavior, not code — the reference
extractor semantics:

- ``extract_images``   ⇔ crawling_module.py:264-318
- ``is_image_page_url``⇔ crawling_module.py:320-331
- ``extract_links``    ⇔ crawling_module.py:343-360
- ``is_valid_image_url``⇔ crawling_module.py:362-422
- page MD5             ⇔ crawling_module.py:228 (md5 of decoded text)

Canonicalization note: the reference ends ``extract_images`` with
``list(set(images))`` whose iteration order depends on the hash seed.
We emit **sorted unique** image URLs — a pure function of the input —
and conformance tests compare as sets (SURVEY.md §5.1).  Link and
image-page candidates are returned in document order *with duplicates*;
the reference dedups them at enqueue time against the visited dict, so
that responsibility moves to the frontier/replay stage here.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from urllib.parse import urljoin, urlparse

from urllib.parse import urlsplit

from .parser import Node, parse_html

# urljoin + urlparse are ~25% of extract_page wall and most of their
# inputs are one of two trivial shapes: an absolute http(s) URL (the
# join is the identity) or a root-relative path against an http(s)
# base (the join is scheme://netloc + path).  For hrefs/urls made of
# strictly safe characters — no whitespace/control (urlsplit strips
# those), no '#' fragment, no ';' params, no dot segments, no
# protocol-relative '//' — the stdlib result is provably the plain
# string concatenation, so a character-class gate + concat replaces
# the full parser.  Everything else falls back to the memoized stdlib
# functions; tests/test_fasturl.py differential-tests the gate against
# the stdlib over corpus-shaped and adversarial inputs.
_urljoin_slow = lru_cache(maxsize=262144)(urljoin)

_SAFE_PATH = r"[A-Za-z0-9._~%+\-/:!$&'()*,]*"
# a present-but-empty query ('/x?') is NOT safe: urlunparse drops the
# bare '?' — hence + not * inside the optional group
_SAFE_QUERY = r"(?:\?[A-Za-z0-9._~%+\-=&:!$'()*,]+)?"
_ABS_SAFE_RE = re.compile(
    r"https?://[A-Za-z0-9.\-]+(?::[0-9]+)?(?:/" + _SAFE_PATH + r")?"
    + _SAFE_QUERY + r"\Z"
)
_REL_SAFE_RE = re.compile(r"/" + _SAFE_PATH + _SAFE_QUERY + r"\Z")


@lru_cache(maxsize=4096)
def _base_split(base: str) -> str:
    """``scheme://netloc`` of the (per-page, heavily repeated) base."""
    s = urlsplit(base)
    return s.scheme + "://" + s.netloc


def _urljoin(base: str, href: str) -> str:
    if href.startswith("http"):
        if _ABS_SAFE_RE.match(href):
            # absolute http(s) target: urljoin returns it unchanged
            # (same scheme → urlunsplit round-trip of a safe URL is the
            # identity; different scheme → returned verbatim)
            return href
    elif (
        href.startswith("/")
        and not href.startswith("//")
        and "/." not in href
        and _REL_SAFE_RE.match(href)
        and base.startswith(("https://", "http://"))
    ):
        # root-relative safe path: no params/fragment/dot segments, so
        # the RFC 3986 merge is scheme://netloc + href verbatim
        return _base_split(base) + href
    return _urljoin_slow(base, href)

IMAGE_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".webp", ".svg", ".bmp", ".tiff", ".ico",
)
_EXCLUDE_PATTERNS = (".css", ".js", ".html", ".php", ".xml", ".json")
_CSS_URL_RE = re.compile(r'url\(["\']?([^"\']+)["\']?\)')
_THUMB_PX_RE = re.compile(r"/(\d+)px-")
_IMAGE_PAGE_PATTERNS = (
    "/image/", "/photo/", "/picture/", "/img/", "/gallery/",
    "image_id=", "photo_id=", "picture_id=",
)


_PATH_SAFE_RE = re.compile(r"[A-Za-z0-9._~%+\-/:!$&'()*,=]*\Z")


def _netloc_path(url: str) -> tuple[str, str]:
    """(netloc, path) — fast slice for safe-charset http(s) URLs,
    stdlib urlparse otherwise (differential-tested: the slice equals
    the parse exactly when the safe gates pass; ';' is excluded from
    the path class because urlparse splits params off the last
    segment)."""
    if url.startswith("https://"):
        rest = url[8:]
    elif url.startswith("http://"):
        rest = url[7:]
    else:
        p = urlparse(url)
        return p.netloc, p.path
    cut = len(rest)
    for ch in "/?#":
        i = rest.find(ch, 0, cut)
        if i >= 0:
            cut = i
    netloc = rest[:cut]
    if _NETLOC_SAFE_RE.match(netloc):
        if cut == len(rest) or rest[cut] != "/":
            return netloc, ""
        end = len(rest)
        for ch in "?#":
            i = rest.find(ch, cut, end)
            if i >= 0:
                end = i
        path = rest[cut:end]
        if _PATH_SAFE_RE.match(path):
            return netloc, path
    p = urlparse(url)
    return p.netloc, p.path


@lru_cache(maxsize=131072)
def is_valid_image_url(url: str, min_commons_thumb_px: int | None = None) -> bool:
    """Does ``url`` point at an image file (Wikimedia special rules)?

    ``min_commons_thumb_px`` is the already-resolved threshold
    (reference fallback chain crawling.min_commons_thumb_px →
    images.min_side_size → 300, crawling_module.py:386-401).
    Pure in its arguments — worker-local memoized (image URLs repeat
    heavily across pages).
    """
    url_lower = url.lower()
    netloc, path = _netloc_path(url)

    if netloc.endswith("commons.wikimedia.org"):
        path_lower = path.lower()
        if path_lower.startswith("/wiki/file:"):
            return False
        if path_lower.startswith("/wiki/special:filepath/"):
            return True

    if netloc.endswith("upload.wikimedia.org"):
        if url_lower.endswith(IMAGE_EXTENSIONS):
            return True

    if "commons.wikimedia.org" in url_lower and "/thumb/" in url_lower:
        min_px = 300 if min_commons_thumb_px is None else int(min_commons_thumb_px)
        m = _THUMB_PX_RE.search(url_lower)
        if m:
            if int(m.group(1)) < min_px:
                return False
        return True

    if url_lower.endswith(IMAGE_EXTENSIONS):
        return True

    # Explicit non-image resources (always False afterwards anyway; kept
    # for parity with the reference's structure).
    if any(p in url_lower for p in _EXCLUDE_PATTERNS):
        return False
    return False


def is_image_page_url(url: str, base_url: str) -> bool:
    """Is ``url`` an image *page* (to cascade-crawl at the same depth)?"""
    return _is_image_page(url, "commons.wikimedia.org" in base_url)


@lru_cache(maxsize=131072)
def _is_image_page(url: str, commons_base: bool) -> bool:
    if commons_base:
        return "/wiki/File:" in url or "/wiki/Category:" in url
    low = url.lower()
    return any(p in low for p in _IMAGE_PAGE_PATTERNS)


def _collect_nodes(root: Node):
    """ONE pre-order walk collecting the five node sets the extractor
    queries (what five find_all calls would return, same document
    order) — the tree is traversed once per page instead of five
    times."""
    imgs, dfu, styled, style_tags, anchors = [], [], [], [], []
    for n in root.iter_nodes():
        nm = n.name
        if nm == "img":
            imgs.append(n)
        elif nm == "style":
            style_tags.append(n)
        elif nm == "a" and n.attrs.get("href") is not None:
            anchors.append(n)
        if "data-file-url" in n.attrs:
            dfu.append(n)
        if n.attrs.get("style") is not None:
            styled.append(n)
    return imgs, dfu, styled, style_tags, anchors


def extract_images(
    root: Node, base_url: str, min_commons_thumb_px: int | None = None,
    collected=None,
) -> tuple[list[str], list[str]]:
    """Returns ``(sorted unique image urls, image-page candidates)``.

    Mirrors crawling_module.py:264-318 source-by-source:
    (a) <img src|data-src|data-lazy-src>; (b) parent <a href> — image
    URL or cascade image-page; (c) any [data-file-url]; (d) inline
    style url(...); (e) <style> blocks url(...).
    """
    images: list[str] = []
    image_pages: list[str] = []
    if collected is None:
        collected = _collect_nodes(root)
    imgs, dfu, styled, style_tags, _ = collected

    for img in imgs:
        src = img.get("src") or img.get("data-src") or img.get("data-lazy-src")
        if src:
            absolute = _urljoin(base_url, src)
            if is_valid_image_url(absolute, min_commons_thumb_px):
                images.append(absolute)
        parent_a = img.find_parent("a")
        if parent_a and parent_a.get("href"):
            absolute_href = _urljoin(base_url, parent_a.get("href"))
            if is_valid_image_url(absolute_href, min_commons_thumb_px):
                images.append(absolute_href)
            elif is_image_page_url(absolute_href, base_url):
                image_pages.append(absolute_href)

    for element in dfu:
        file_url = element.get("data-file-url")
        if file_url:
            absolute = _urljoin(base_url, file_url)
            if is_valid_image_url(absolute, min_commons_thumb_px):
                images.append(absolute)

    for element in styled:
        for u in _CSS_URL_RE.findall(element.get("style") or ""):
            absolute = _urljoin(base_url, u)
            if is_valid_image_url(absolute, min_commons_thumb_px):
                images.append(absolute)

    for style_tag in style_tags:
        s = style_tag.string
        if s:
            for u in _CSS_URL_RE.findall(s):
                absolute = _urljoin(base_url, u)
                if is_valid_image_url(absolute, min_commons_thumb_px):
                    images.append(absolute)

    return sorted(set(images)), image_pages


def extract_links(
    root: Node, base_url: str, allowed_domains: list[str], anchors=None
) -> list[str]:
    """Document-order same-domain http(s) links (crawling_module.py:343-360).

    The reference also drops already-visited links here; that check is a
    frontier/seen-filter concern in this engine and happens downstream.
    Duplicates are preserved (enqueue-time dedup keeps the first).
    """
    links: list[str] = []
    allowed = set(allowed_domains)
    if anchors is None:
        anchors = root.find_all("a", href=True)
    for a_tag in anchors:
        href = a_tag.get("href")
        if href:
            absolute = _urljoin(base_url, href)
            netloc, scheme = _netloc_scheme(absolute)
            if netloc in allowed and scheme in ("http", "https"):
                links.append(absolute)
    return links


_NETLOC_SAFE_RE = re.compile(r"[A-Za-z0-9.\-]*(?::[0-9]+)?\Z")


@lru_cache(maxsize=131072)
def _netloc_scheme(url: str) -> tuple[str, str]:
    # fast path for the dominant shape (crawl links are unique, so the
    # lru_cache alone can't help): netloc ends at the first of /?#,
    # and for a safe-charset netloc the stdlib parse is the slice
    # itself (urlsplit strips control chars / tab / newline — the safe
    # class excludes them, so the slice is identical)
    if url.startswith("https://"):
        scheme, rest = "https", url[8:]
    elif url.startswith("http://"):
        scheme, rest = "http", url[7:]
    else:
        p = urlparse(url)
        return p.netloc, p.scheme
    end = len(rest)
    for ch in "/?#":
        i = rest.find(ch, 0, end)
        if i >= 0:
            end = i
    netloc = rest[:end]
    if _NETLOC_SAFE_RE.match(netloc):
        return netloc, scheme
    p = urlparse(url)
    return p.netloc, p.scheme


def extract_text(root: Node) -> str:
    """Canonical text extraction (the golden ``text`` column).

    Deterministic pure function of the HTML bytes: document-order text
    nodes excluding <script>/<style> subtrees, entity-decoded, each
    stripped, empties dropped, joined with a single newline.  This is
    the engine-wide definition of "extracted text" for the byte-identical
    per-row invariant (BASELINE.json input_hint).
    """
    parts = []
    for t in root.iter_text():
        t = t.strip()
        if t:
            parts.append(t)
    return "\n".join(parts)


def page_md5(html: bytes | str) -> str:
    """MD5 of the decoded page text (crawling_module.py:228 hashes
    ``response.text`` — the *decoded* body re-encoded as UTF-8)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        b = bytes(html)
        if b.isascii():
            # decode('utf-8', 'replace') → encode('utf-8') is the
            # identity on ASCII bytes — hash them directly
            return hashlib.md5(b).hexdigest()
        html = b.decode("utf-8", errors="replace")
    return hashlib.md5(html.encode("utf-8")).hexdigest()


def extract_page(
    html: bytes | str,
    url: str,
    allowed_domains: list[str],
    min_commons_thumb_px: int | None = None,
) -> dict:
    """One-shot extraction for a page → plain-dict row.

    Keys: image_urls (sorted unique), image_page_urls (doc order, dups),
    links (doc order, dups), text, content_md5.
    """
    root = parse_html(html)
    collected = _collect_nodes(root)
    images, image_pages = extract_images(
        root, url, min_commons_thumb_px, collected=collected
    )
    links = extract_links(root, url, allowed_domains, anchors=collected[4])
    return {
        "url": url,
        "image_urls": images,
        "image_page_urls": image_pages,
        "links": links,
        "text": extract_text(root),
        "content_md5": page_md5(html),
    }
