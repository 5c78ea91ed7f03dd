"""Sitemap / robots.txt source (rebuild of S6/M17,
navigation_module.py:147-225).

Pure functions over fetched payloads: candidate sitemap probe URLs per
host, XML urlset/sitemapindex parsing (stdlib ElementTree, same
namespace handling), ``Sitemap:`` lines from robots.txt.  In the
corpus-backed engine these run as a ``flat_map`` over fetched sitemap
rows producing extra frontier entries with a ``priority`` column
(reference filters priority > 0.3 at enqueue, navigation_module.py:563).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from urllib.parse import urljoin

SITEMAP_PROBE_PATHS = (
    "/sitemap.xml",
    "/sitemap_index.xml",
    "/sitemaps.xml",
    "/sitemap/sitemap.xml",
    "/robots.txt",
)
_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def discover_sitemaps(base_url: str) -> list[str]:
    return [urljoin(base_url, p) for p in SITEMAP_PROBE_PATHS]


def parse_sitemap(body: bytes | str, url: str = "") -> list[dict]:
    """→ [{url, type, priority[, changefreq]}] — mirrors
    navigation_module.py:169-209 including the robots.txt fallback on
    XML parse failure."""
    if isinstance(body, str):
        body_bytes = body.encode("utf-8")
        body_text = body
    else:
        body_bytes = bytes(body)
        body_text = body_bytes.decode("utf-8", errors="replace")
    urls: list[dict] = []
    try:
        root = ET.fromstring(body_bytes)
        if "sitemapindex" in root.tag:
            for sitemap in root.findall(f".//{_NS}sitemap"):
                loc = sitemap.find(f"{_NS}loc")
                if loc is not None:
                    urls.append({"url": loc.text, "type": "sitemap", "priority": 1.0})
        elif "urlset" in root.tag:
            for url_elem in root.findall(f".//{_NS}url"):
                loc = url_elem.find(f"{_NS}loc")
                priority = url_elem.find(f"{_NS}priority")
                changefreq = url_elem.find(f"{_NS}changefreq")
                if loc is not None:
                    urls.append(
                        {
                            "url": loc.text,
                            "type": "page",
                            "priority": float(priority.text)
                            if priority is not None
                            else 0.5,
                            "changefreq": changefreq.text
                            if changefreq is not None
                            else "unknown",
                        }
                    )
    except ET.ParseError:
        if "robots.txt" in url:
            urls.extend(parse_robots_txt(body_text))
    return urls


def parse_robots_txt(robots_content: str) -> list[dict]:
    """``Sitemap:`` lines (navigation_module.py:213-225)."""
    urls = []
    for line in robots_content.split("\n"):
        line = line.strip()
        if line.lower().startswith("sitemap:"):
            sitemap_url = line.split(":", 1)[1].strip()
            urls.append({"url": sitemap_url, "type": "sitemap", "priority": 1.0})
    return urls


def sitemap_frontier_rows(
    entries: list[dict], min_priority: float = 0.3
) -> list[dict]:
    """Priority filter → frontier rows (navigation_module.py:563)."""
    return [
        {"url": e["url"], "priority": e["priority"]}
        for e in entries
        if e["type"] == "page" and e["priority"] > min_priority
    ]
