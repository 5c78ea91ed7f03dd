"""Reference-semantics BFS replay.

A faithful single-threaded simulation of the reference crawl loop
(crawling_module.py:80-189 ``run`` + :191-262 ``crawl_page``) over an
abstract ``get_page`` lookup instead of HTTP.  Two uses:

1. **Oracle** for the crawl-ordering conformance tests (SURVEY.md §5.3):
   run it directly over the corpus dict and compare the distributed
   engine's output against it.
2. **Exact-order replay** inside the engine's verification mode: the
   distributed rounds do the expensive fetch+parse work; this replay
   consumes only the per-page extraction metadata and reproduces the
   reference's visit order, seen-set and image-emission order exactly
   (cascade front-insertion, MD5 first-wins, budgets).

Replicated quirks:
- visited is marked at *enqueue* time (seeds pre-marked);
- depth cutoff ``depth >= max_depth`` skips the pop without counting it
  as a request (crawling_module.py:99-100);
- fetch miss / HTTP error and duplicate-MD5 pages return no
  images/links but still count as a crawled page + request;
- cascade image-pages are ``insert(0)``-ed in list order (so they run
  in *reverse* discovery order), at the same depth, before remaining
  queue entries (crawling_module.py:127-145);
- image emission order within a page is the engine-wide canonical
  sorted-unique order (the reference's ``list(set(...))`` order is
  hash-seed dependent; SURVEY.md §2.8).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable


@dataclass
class CrawlTrace:
    visits: list[dict] = field(default_factory=list)
    image_emissions: list[dict] = field(default_factory=list)
    seen: dict[str, bool] = field(default_factory=dict)  # insertion-ordered
    pages_crawled: int = 0
    images_found: int = 0

    def seen_urls(self) -> list[str]:
        return list(self.seen.keys())


def replay_crawl(
    seeds: list[str],
    get_page: Callable[[str], dict | None],
    max_depth: int = 5,
    max_requests: int = 0,
    blocked: Callable[[str], bool] | None = None,
) -> CrawlTrace:
    """``get_page(url)`` returns the extraction row for the page —
    keys ``image_urls`` (canonical sorted-unique), ``image_page_urls``
    (doc order, may contain dups), ``links`` (doc order, may contain
    dups), ``content_md5`` — or None for a fetch miss."""
    tr = CrawlTrace()
    queue: list[tuple[str, int, bool]] = []  # (url, depth, via_cascade)
    page_hashes: set[str] = set()

    for url in seeds:
        queue.append((url, 0, False))
        tr.seen[url] = True

    request_count = 0
    while queue and (max_requests == 0 or request_count < max_requests):
        current_url, depth, cascade = queue.pop(0)
        if max_depth > 0 and depth >= max_depth:
            continue
        if blocked is not None and blocked(current_url):
            # robots disallow (Scrapy IgnoreRequest): dropped before
            # fetch — no visit row, no request counted
            continue

        page = get_page(current_url)
        if page is None:
            status, images, image_pages, links = "miss", [], [], []
        elif page["content_md5"] in page_hashes:
            status, images, image_pages, links = "dup", [], [], []
        else:
            page_hashes.add(page["content_md5"])
            status = "ok"
            images = list(page["image_urls"])
            image_pages = list(page["image_page_urls"])
            links = list(page["links"])

        seq = len(tr.visits)
        for img_url in images:
            tr.image_emissions.append(
                {
                    "url": img_url,
                    "source_page": current_url,
                    "depth": depth,
                    "emit_seq": len(tr.image_emissions),
                }
            )
            tr.images_found += 1

        # Cascade image-pages: same depth, front of queue, insert(0)
        # per item in list order ⇒ reversed processing order.
        for link in image_pages:
            if link not in tr.seen:
                queue.insert(0, (link, depth, True))
                tr.seen[link] = True

        new_links_added = 0
        for link in links:
            if link not in tr.seen:
                queue.append((link, depth + 1, False))
                tr.seen[link] = True
                new_links_added += 1

        tr.visits.append(
            {
                "seq": seq,
                "url": current_url,
                "depth": depth,
                "cascade": cascade,
                "status": status,
                "n_images": len(images),
                "new_links": new_links_added,
            }
        )
        tr.pages_crawled += 1
        request_count += 1

    return tr
