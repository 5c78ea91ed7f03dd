"""Navigation scoring (rebuild of M18/M19,
navigation_module.py:29-144 and :228-354).

Pagination detection: three pattern groups (pagination /
infinite_scroll / load_more) scored selector-hits·0.6 +
url-regex-hits·0.4, threshold 0.5, sorted by confidence.  The
reference's selectors are Scrapy-CSS (incl. ``:contains``); here each
listed selector becomes an equivalent predicate over our DOM — same
hit/no-hit semantics for the selector forms the reference actually
uses.

Link relevance: 0.3·url-pattern + 0.4·text-pattern + 0.3·image
indicator; links above 0.6 become prioritized frontier rows
(navigation_module.py:485-498).  Container image-density scans the
first 50 div/section/article nodes (:276-281).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .parser import Node

# ------------------------------------------------------------ patterns

def _sel_attr_contains(tag: str, attr: str, needle: str):
    def f(root: Node) -> bool:
        return any(
            needle in (n.get(attr) or "")
            for n in root.find_all(tag)
            if n.get(attr) is not None
        )
    return f


def _sel_class_child_a(cls: str):
    def f(root: Node) -> bool:
        for n in root.iter_nodes():
            classes = (n.get("class") or "").split()
            if cls in classes and n.find_all("a"):
                return True
        return False
    return f


def _sel_has_attr(attr: str, tag: str | None = None):
    def f(root: Node) -> bool:
        return bool(root.find_all(tag, attrs={attr: True}))
    return f


def _sel_class(cls: str):
    def f(root: Node) -> bool:
        return any(
            cls in (n.get("class") or "").split() for n in root.iter_nodes()
        )
    return f


def _sel_text_contains(tag: str, needle: str):
    def f(root: Node) -> bool:
        for n in root.find_all(tag):
            txt = "".join(t for t in n.iter_text(skip=frozenset()))
            if needle in txt:
                return True
        return False
    return f


def _sel_attr_equals(tag: str, attr: str, value: str):
    def f(root: Node) -> bool:
        return any(n.get(attr) == value for n in root.find_all(tag))
    return f


def _sel_aria_pagination():
    def f(root: Node) -> bool:
        for n in root.find_all("nav"):
            if "pagination" in (n.get("aria-label") or "") and n.find_all("a"):
                return True
        return False
    return f


@dataclass
class NavigationPattern:
    pattern_type: str
    selectors: list = field(default_factory=list)       # predicates
    url_patterns: list[str] = field(default_factory=list)
    confidence: float = 0.0
    metadata: dict = field(default_factory=dict)


def _patterns() -> list[NavigationPattern]:
    return [
        NavigationPattern(
            "pagination",
            selectors=[
                _sel_attr_contains("a", "href", "page="),
                _sel_attr_contains("a", "href", "p="),
                _sel_attr_contains("a", "href", "/page/"),
                _sel_class_child_a("pagination"),
                _sel_class_child_a("pager"),
                _sel_aria_pagination(),
                _sel_text_contains("a", "Next"),
                _sel_text_contains("a", "Следующая"),
                _sel_text_contains("a", ">"),
                _sel_attr_equals("a", "rel", "next"),
            ],
            url_patterns=[
                r"page=(\d+)", r"p=(\d+)", r"/page/(\d+)",
                r"offset=(\d+)", r"start=(\d+)",
            ],
            confidence=0.9,
            metadata={"max_pages": 100},
        ),
        NavigationPattern(
            "infinite_scroll",
            selectors=[
                _sel_has_attr("data-infinite-scroll"),
                _sel_has_attr("data-lazy-load"),
                _sel_class("infinite-scroll"),
                _sel_class("lazy-load-container"),
            ],
            url_patterns=[r"api/.*load.*more", r"ajax.*page", r"load.*next"],
            confidence=0.8,
            metadata={"scroll_trigger": 0.8},
        ),
        NavigationPattern(
            "load_more",
            selectors=[
                _sel_text_contains("button", "Load more"),
                _sel_text_contains("button", "Show more"),
                _sel_text_contains("button", "Загрузить еще"),
                _sel_text_contains("a", "Load more"),
                _sel_class("load-more"),
                _sel_has_attr("data-load-more"),
            ],
            url_patterns=[r"load.*more", r"show.*more", r"next.*batch"],
            confidence=0.85,
            metadata={"max_clicks": 50},
        ),
    ]


def detect_navigation_patterns(root: Node, page_text: str) -> list[NavigationPattern]:
    """navigation_module.py:101-144: selector fraction·0.6 + url-regex
    fraction·0.4, keep > 0.5, sorted by confidence desc."""
    detected = []
    for pattern in _patterns():
        selector_matches = sum(1 for sel in pattern.selectors if sel(root))
        confidence = 0.0
        if selector_matches > 0:
            confidence += (selector_matches / len(pattern.selectors)) * 0.6
        text_lower = page_text.lower()
        url_matches = sum(
            1
            for rx in pattern.url_patterns
            if re.search(rx, text_lower, re.IGNORECASE)
        )
        if url_matches > 0:
            confidence += (url_matches / len(pattern.url_patterns)) * 0.4
        confidence = min(confidence, 1.0)
        if confidence > 0.5:
            detected.append(
                NavigationPattern(
                    pattern.pattern_type, pattern.selectors,
                    pattern.url_patterns, confidence, pattern.metadata,
                )
            )
    return sorted(detected, key=lambda x: x.confidence, reverse=True)


# ------------------------------------------------------- ML relevance

_LINK_PATTERNS = {
    "gallery": [r"gallery", r"photos", r"images", r"pictures",
                r"галерея", r"фото", r"изображения"],
    "category": [r"category", r"section", r"topic", r"tag",
                 r"категория", r"раздел", r"тема", r"тег"],
    "archive": [r"archive", r"history", r"past", r"old",
                r"архив", r"история", r"прошлое"],
    "media": [r"media", r"multimedia", r"content", r"медиа", r"контент"],
}
_IMAGE_INDICATORS = [
    r"jpg", r"jpeg", r"png", r"gif", r"webp", r"svg",
    r"photo", r"image", r"pic", r"picture",
    r"фото", r"изображение", r"картинка",
]


def analyze_link(href: str, text: str) -> dict:
    """navigation_module.py:284-320: 0.3·url + 0.4·text + 0.3·indicator."""
    relevance = 0.0
    link_type = "unknown"
    for pattern_type, patterns in _LINK_PATTERNS.items():
        if any(re.search(p, href, re.IGNORECASE) for p in patterns):
            relevance += 0.3
            link_type = pattern_type
            break
    for pattern_type, patterns in _LINK_PATTERNS.items():
        if any(re.search(p, text, re.IGNORECASE) for p in patterns):
            relevance += 0.4
            if link_type == "unknown":
                link_type = pattern_type
            break
    if any(
        re.search(ind, href + " " + text, re.IGNORECASE)
        for ind in _IMAGE_INDICATORS
    ):
        relevance += 0.3
    return {"href": href, "text": text, "relevance": min(relevance, 1.0),
            "type": link_type}


def analyze_page(root: Node, page_text: str) -> dict:
    """Page-level navigation analysis: relevant links (> 0.5), image
    containers (density > 0.3 over the first 50 div/section/article),
    detected pagination patterns."""
    nav_links = []
    for a in root.find_all("a", href=True):
        text = "".join(t for t in a.iter_text(skip=frozenset())).strip().lower()
        la = analyze_link(a.get("href") or "", text)
        if la["relevance"] > 0.5:
            nav_links.append(la)

    containers = []
    count = 0
    for n in root.iter_nodes():
        if n.name in ("div", "section", "article"):
            count += 1
            if count > 50:
                break
            n_imgs = len(n.find_all("img"))
            n_elems = sum(1 for _ in n.iter_nodes()) or 1
            density = n_imgs / n_elems
            if density > 0.3:
                containers.append({"image_density": round(density, 4),
                                   "n_images": n_imgs})

    patterns = detect_navigation_patterns(root, page_text)
    confidence = 0.0
    if nav_links:
        confidence += min(0.5, len(nav_links) * 0.1)
    if containers:
        confidence += min(0.3, len(containers) * 0.1)
    if patterns:
        confidence += 0.2
    return {
        "navigation_links": nav_links,
        "image_containers": containers,
        "patterns": [(p.pattern_type, round(p.confidence, 4)) for p in patterns],
        "confidence_score": round(min(confidence, 1.0), 4),
    }


# -------------------------------------------- oracle-ready feature path

_PATTERN_DIMS = (
    # (pattern_type, short, n_selectors, n_url_patterns) — list sizes of
    # _patterns(); asserted against it in tests so they cannot drift
    ("pagination", "pag", 10, 5),
    ("infinite_scroll", "inf", 4, 3),
    ("load_more", "load", 6, 3),
)


def page_nav_features(root: Node, page_text: str) -> dict:
    """Raw INTEGER navigation features for one page.

    Everything downstream of the DOM walk — pattern confidences, the
    link-relevance cut, the container-density cut, the page confidence —
    is pure arithmetic over these ints, so a SQL oracle can recompute
    ``nav_result_from_features`` independently from a Parquet dump of
    this dict (functions/webops.py:nav_scores(features_out=...)).

    Keys: ``sel_{pag,inf,load}`` / ``url_{pag,inf,load}`` selector and
    url-regex hit counts per pattern; ``link_combos`` — 8 counts of
    ``<a href>`` links indexed ``url_hit*4 + text_hit*2 + img_hit``
    (the three analyze_link components); ``cont_imgs``/``cont_elems`` —
    per-container img/element counts for the first 50
    div/section/article nodes (analyze_page's scan order)."""
    feats: dict = {}
    text_lower = page_text.lower()
    for pattern, (_, short, _n_sel, _n_url) in zip(
        _patterns(), _PATTERN_DIMS
    ):
        feats["sel_" + short] = sum(
            1 for sel in pattern.selectors if sel(root)
        )
        feats["url_" + short] = sum(
            1
            for rx in pattern.url_patterns
            if re.search(rx, text_lower, re.IGNORECASE)
        )
    combos = [0] * 8
    for a in root.find_all("a", href=True):
        text = "".join(
            t for t in a.iter_text(skip=frozenset())
        ).strip().lower()
        href = a.get("href") or ""
        u = any(
            re.search(p, href, re.IGNORECASE)
            for ps in _LINK_PATTERNS.values()
            for p in ps
        )
        t = any(
            re.search(p, text, re.IGNORECASE)
            for ps in _LINK_PATTERNS.values()
            for p in ps
        )
        i = any(
            re.search(ind, href + " " + text, re.IGNORECASE)
            for ind in _IMAGE_INDICATORS
        )
        combos[u * 4 + t * 2 + i] += 1
    feats["link_combos"] = combos
    cont_imgs: list[int] = []
    cont_elems: list[int] = []
    count = 0
    for n in root.iter_nodes():
        if n.name in ("div", "section", "article"):
            count += 1
            if count > 50:
                break
            cont_imgs.append(len(n.find_all("img")))
            cont_elems.append(sum(1 for _ in n.iter_nodes()) or 1)
    feats["cont_imgs"] = cont_imgs
    feats["cont_elems"] = cont_elems
    return feats


def nav_result_from_features(feats: dict) -> dict:
    """Page navigation summary from ``page_nav_features`` output.

    Float op ORDER matches detect_navigation_patterns / analyze_page
    exactly (differential-tested in test_extended_and_nav.py), minus
    analyze_page's cosmetic ``round(·, 4)`` — the raw double is emitted
    so the DuckDB oracle can reproduce it bit-for-bit without matching
    Python's correctly-rounded ``round``.  Pattern confidences are
    rendered ``%.4f`` (printf semantics exist identically on both
    sides)."""
    pats: list[tuple[int, str, float]] = []
    for idx, (ptype, short, n_sel, n_url) in enumerate(_PATTERN_DIMS):
        s = feats["sel_" + short]
        u = feats["url_" + short]
        confidence = 0.0
        if s > 0:
            confidence += (s / n_sel) * 0.6
        if u > 0:
            confidence += (u / n_url) * 0.4
        confidence = min(confidence, 1.0)
        if confidence > 0.5:
            pats.append((idx, ptype, confidence))
    # sorted(reverse=True) on confidence is stable → ties keep pattern
    # declaration order, same as sorting by (-conf, idx)
    pats.sort(key=lambda x: (-x[2], x[0]))
    n_nav = 0
    for code, cnt in enumerate(feats["link_combos"]):
        rel = 0.0
        if code & 4:
            rel += 0.3
        if code & 2:
            rel += 0.4
        if code & 1:
            rel += 0.3
        if min(rel, 1.0) > 0.5:
            n_nav += cnt
    n_cont = sum(
        1
        for gi, ge in zip(feats["cont_imgs"], feats["cont_elems"])
        if gi / ge > 0.3
    )
    confidence = 0.0
    if n_nav:
        confidence += min(0.5, n_nav * 0.1)
    if n_cont:
        confidence += min(0.3, n_cont * 0.1)
    if pats:
        confidence += 0.2
    return {
        "patterns": ";".join(f"{p}:{c:.4f}" for _, p, c in pats),
        "n_nav_links": n_nav,
        "n_containers": n_cont,
        "confidence_score": min(confidence, 1.0),
    }


def prioritized_nav_links(
    root: Node, base_url: str, threshold: float = 0.6, cap: int = 10
) -> list[dict]:
    """Links above the relevance threshold → prioritized frontier rows
    (navigation_module.py:485-498; ML requests capped [:10])."""
    from urllib.parse import urljoin

    out = []
    for a in root.find_all("a", href=True):
        text = "".join(t for t in a.iter_text(skip=frozenset())).strip().lower()
        la = analyze_link(a.get("href") or "", text)
        if la["relevance"] > threshold:
            out.append(
                {
                    "url": urljoin(base_url, la["href"]),
                    "priority": la["relevance"],
                    "link_type": la["type"],
                }
            )
    out.sort(key=lambda d: (-d["priority"], d["url"]))
    return out[:cap]
