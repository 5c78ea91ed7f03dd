"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric: frontier URLs/sec end-to-end through the crawl engine
(fetch-schedule-dedup, scale mode) over the synthetic Common-Crawl-style
corpus derived from $GRAFT_SF_DIR's scale factor; plus per-query wall
times for the operator suite over the testdata tables.

    python bench.py                 # full run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --headline-only # crawl headline only
    python bench.py --scaling       # same job at num_cpus=8 and 32 in fresh
                                    # processes → throughputs + efficiency

Corpus generation is cached under /tmp and excluded from timings.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _env_sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _env_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def build_corpus(sf_dir: str):
    from snapcrawler_ray.sources.corpus import CorpusSpec, generate_corpus

    pages = {0.001: 300, 0.01: 2000, 0.1: 100_000}.get(
        _sf_of(sf_dir), max(300, int(_sf_of(sf_dir) * 1_000_000))
    )
    # branching 8 → wide/shallow BFS so round-synchronous overhead
    # amortizes and extraction compute dominates the headline
    spec = CorpusSpec(seed=42, n_pages=pages, n_hosts=20, buckets=32,
                      branching=8)
    path = generate_corpus("/tmp/snapray_corpus_cache", spec, use_ray=True)
    return spec, path


def run_headline(sf_dir: str) -> dict:
    """Scale-mode crawl (bloom seen-filter) — the 10^10-design path."""
    from snapcrawler_ray.config import CrawlConfig, CrawlLimits
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.sources.corpus import seeds_for

    spec, path = build_corpus(sf_dir)
    seeds = seeds_for(spec)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=5))
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="scale")
    t0 = time.time()
    res = eng.run()
    wall = time.time() - t0
    eng.shutdown()
    visits = res.visits.num_rows
    return {
        "visits": visits,
        "emissions": res.emissions.num_rows,
        "wall_s": round(wall, 3),
        "urls_per_sec": round(visits / wall, 2),
    }


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    bench_set = [
        "q1_pricing", "q3_top_orders", "nation_revenue", "events_hourly",
        "events_topk_users", "docs_token_counts", "docs_exact_dedup",
        "docs_minhash_pairs", "docs_simhash", "emb_knn", "emb_near_dup",
    ]
    out = {}
    for name in bench_set:
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume lazily-built datasets so the time includes execution
        import ray.data

        if isinstance(res, ray.data.Dataset):
            res.count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    args = ap.parse_args()

    sf_dir = _env_sf_dir()

    if args.scaling:
        # fresh processes at two parallelism levels (sandbox stand-in
        # for N vs 4N nodes, BASELINE.md north rule)
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
            proc = subprocess.run(
                [sys.executable, __file__, "--headline-only"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        t8 = results[8]["value"]
        t32 = results[32]["value"]
        thr8 = results[8]["headline"]["urls_per_sec"]
        thr32 = results[32]["headline"]["urls_per_sec"]
        eff = (thr32 / thr8) / (32 / 8)
        print(json.dumps({
            "metric": "crawl scaling 8→32 cpus",
            "value": round(eff, 3),
            "unit": "efficiency",
            "throughput_urls_per_sec": {"cpus8": thr8, "cpus32": thr32},
            "wall_s": {"cpus8": t8, "cpus32": t32},
            "sf": _sf_of(sf_dir),
        }))
        return

    num_cpus = _env_cpus()
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)

    headline = run_headline(sf_dir)
    queries = {} if args.headline_only else run_queries(sf_dir)

    print(json.dumps({
        "metric": "crawl wall time (frontier fetch-schedule-dedup end-to-end)",
        "value": headline["wall_s"],
        "unit": "sec",
        "headline": headline,
        "queries": queries,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
