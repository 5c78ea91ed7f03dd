"""Global crawl budgets (rebuild of T8).

The reference tracks ``pages_crawled`` / ``images_found`` / downloaded
counts / folder size in process-local counters and stops when
``max_images`` or ``max_folder_size_mb`` is hit
(crawling_module.py:94-96, filtering_module.py:121-129).  Here a single
small actor owns the running budget; stages ask for grants in batches
(``try_acquire(n)`` returns how many of n are still within budget), so
the whole cluster shares one consistent cap without fine-grained
locking.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class LimitsActor:
    def __init__(self, max_requests: int = 0, max_images: int = 0,
                 max_bytes: int = 0):
        self.max_requests = max_requests
        self.max_images = max_images
        self.max_bytes = max_bytes
        self.requests = 0
        self.images = 0
        self.bytes = 0

    def try_acquire_requests(self, n: int) -> int:
        if self.max_requests <= 0:
            self.requests += n
            return n
        grant = max(0, min(n, self.max_requests - self.requests))
        self.requests += grant
        return grant

    def try_acquire_images(self, n: int, nbytes: int = 0) -> int:
        grant = n
        if self.max_images > 0:
            grant = max(0, min(grant, self.max_images - self.images))
        if self.max_bytes > 0 and nbytes > 0 and grant > 0:
            per = nbytes / n
            room = self.max_bytes - self.bytes
            grant = max(0, min(grant, int(room // per)))
        self.images += grant
        self.bytes += int(nbytes / n * grant) if n else 0
        return grant

    def totals(self) -> dict:
        return {
            "requests": self.requests,
            "images": self.images,
            "bytes": self.bytes,
        }

    def load(self, totals: dict) -> None:
        self.requests = totals.get("requests", 0)
        self.images = totals.get("images", 0)
        self.bytes = totals.get("bytes", 0)
