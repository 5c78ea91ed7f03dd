"""Page-extraction stage: the reference extractor as an Arrow batch map.

``ExtractPages`` is a callable class for
``map_batches(ExtractPages, batch_format='pyarrow', concurrency=N)`` —
constructor work (domain set, thumb threshold) happens once per actor;
``__call__`` runs per batch.  HTML parsing is inherently per-document
(same as the reference), but everything around it is zero-copy Arrow:
``html`` binary values are read straight out of the batch and the
outputs are built as Arrow list arrays without intermediate pandas.
"""

from __future__ import annotations

import pyarrow as pa

from ..html.extract import extract_page

EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("status", pa.int32()),
        ("content_md5", pa.string()),
        ("text", pa.string()),
        ("image_urls", pa.list_(pa.string())),
        ("image_page_urls", pa.list_(pa.string())),
        ("links", pa.list_(pa.string())),
    ]
)


class ExtractPages:
    """Extraction over fetched pages (url, html, depth, seq, status)."""

    def __init__(self, allowed_domains: list[str], min_commons_thumb_px: int = 300):
        self.allowed_domains = list(allowed_domains)
        self.thumb_px = min_commons_thumb_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        md5s, texts, imgs, pages, links = [], [], [], [], []
        for url, html in zip(urls, htmls):
            row = extract_page(
                html, url, self.allowed_domains, self.thumb_px
            )
            md5s.append(row["content_md5"])
            texts.append(row["text"])
            imgs.append(row["image_urls"])
            pages.append(row["image_page_urls"])
            links.append(row["links"])
        cols = {
            name: batch.column(name)
            for name in batch.column_names
            if name != "html"  # big binary never leaves this stage
        }
        cols.update(
            {
                "content_md5": pa.array(md5s, pa.string()),
                "text": pa.array(texts, pa.string()),
                "image_urls": pa.array(imgs, pa.list_(pa.string())),
                "image_page_urls": pa.array(pages, pa.list_(pa.string())),
                "links": pa.array(links, pa.list_(pa.string())),
            }
        )
        return pa.table(cols)
