"""snapcrawler_ray — a Ray-Data-native web-crawl data engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference crawler (T1desLuck/SnapCrawler, read-only at /root/reference)
expressed Ray-Data-first: the URL frontier lives in Parquet-backed
``ray.data.Dataset``s, URL-seen membership is a sharded exact/Bloom
filter actor pool, politeness is per-host adaptive-delay state, and all
per-record work (HTML extraction, image filtering, classification) runs
as ``map_batches`` over zero-copy Arrow batches.

Nothing is copied from the reference; file:line citations in docstrings
point at the behavior being matched, not code being reused.
"""

__version__ = "0.1.0"
