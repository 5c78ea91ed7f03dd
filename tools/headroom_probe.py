"""Corpus-headroom probe (VERDICT r4 #8): scale-mode crawl at 1M/4M/8M
pages on 32 CPUs — where does per-URL efficiency bend as the wave
outgrows the box, and does wave-splitting (round_budget) recover it?

Run:  python tools/headroom_probe.py [n_pages ...]
Prints one JSON line per configuration (pages, wall, urls/s, driver
RSS) — numbers land in BASELINE.md.
"""
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(n_pages: int, round_budget: int = 0) -> dict:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             log_to_driver=False)
    try:
        from snapcrawler_ray.config import (
            CrawlConfig, CrawlLimits, ScaleConfig,
        )
        from snapcrawler_ray.pipelines.crawl import CrawlEngine
        from snapcrawler_ray.sources.corpus import (
            CorpusSpec, generate_corpus, seeds_for,
        )

        spec = CorpusSpec(seed=42, n_pages=n_pages, n_hosts=20,
                          buckets=256, branching=8)
        path = generate_corpus("/tmp/snapray_corpus_cache", spec,
                               use_ray=True)
        seeds = seeds_for(spec)
        cfg = CrawlConfig(
            start_urls=tuple(seeds),
            limits=CrawlLimits(max_depth=9),
            scale=ScaleConfig(
                round_budget=round_budget,
                frontier_policy="priority" if round_budget else "bfs",
                # the 10^10-design seen config (bench.run_headline's
                # rationale); capacity sized to the corpus
                seen_mode="bloom",
                bloom_capacity=max(1_000_000, n_pages // 2),
            ),
        )
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                          mode="scale")
        t0 = time.time()
        res = eng.run()
        wall = time.time() - t0
        eng.shutdown()
        rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        return {
            "n_pages": n_pages,
            "round_budget": round_budget,
            "visits": res.num_visits,
            "wall_s": round(wall, 2),
            "urls_per_sec": round(res.num_visits / wall, 1),
            "driver_rss_gb": round(rss_gb, 2),
        }
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sizes = [int(x) for x in sys.argv[1:]] or [1_000_000, 4_000_000,
                                               8_000_000]
    for n in sizes:
        row = probe(n)
        print(json.dumps(row), flush=True)
