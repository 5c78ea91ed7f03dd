"""CLI entrypoint — the rebuild of ``python run_parallel.py``
(reference run_parallel.py:15-47), shaped for ``ray job submit``:

    python -m snapcrawler_ray --corpus DIR [--config config.yaml]
        [--mode scale|exact] [--out DIR] [--checkpoint DIR] [--resume]
        [--synth-corpus N] [--seeds URL ...]

    ray job submit --working-dir . -- python -m snapcrawler_ray ...

Runs the crawl engine over a Parquet corpus (or generates the
deterministic synthetic corpus at ``--synth-corpus N`` pages), then the
image filter pipeline over the emissions, writing accepted images and
the visit/emission tables under ``--out``.  Accepts a reference-shaped
``config.yaml`` (images/crawling/limits sections) via
``CrawlConfig.from_yaml``.

Owns its Ray session (``ray.init`` guarded) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="snapcrawler_ray")
    ap.add_argument("--corpus", help="corpus dir (bucket=N/*.parquet)")
    ap.add_argument("--config", help="reference-shaped config.yaml")
    ap.add_argument("--mode", choices=("scale", "exact"), default="scale")
    ap.add_argument("--out", help="output dir (visits/emissions/accepted)")
    ap.add_argument("--checkpoint", help="checkpoint dir (resumable)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seeds", nargs="*", help="seed URLs (override)")
    ap.add_argument("--synth-corpus", type=int, metavar="N_PAGES",
                    help="generate the deterministic synthetic corpus")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--robots-dir", help="dir of <host>.txt robots files "
                    "(enables respect_robots_txt)")
    ap.add_argument("--frontier", choices=("bfs", "priority"),
                    default=None, help="scale-mode frontier policy")
    ap.add_argument("--seen-mode",
                    choices=("exact", "bloom", "cuckoo", "windowed_cuckoo"),
                    default=None,
                    help="scale-mode seen-filter kind (default: bloom "
                         "with capacity sized to the corpus — the "
                         "10^10-design config; ScaleConfig's own "
                         "default of 'exact' is the verification "
                         "shape and grows O(urls) actor memory)")
    ap.add_argument("--seen-capacity", type=int, default=None,
                    help="per-shard approximate-filter capacity "
                         "(default: synth pages/2 or 1e6)")
    ap.add_argument("--round-budget", type=int, default=None,
                    help="max URLs emitted per round (priority policy)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)

    from snapcrawler_ray.config import CrawlConfig, CrawlLimits
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.pipelines.images import run_image_pipeline
    from snapcrawler_ray.sources.corpus import (
        CorpusSpec, generate_corpus, seeds_for,
    )

    if args.synth_corpus:
        spec = CorpusSpec(seed=42, n_pages=args.synth_corpus, n_hosts=20,
                          buckets=args.buckets)
        corpus = generate_corpus("/tmp/snapray_corpus_cache", spec,
                                 use_ray=True)
        default_seeds = seeds_for(spec)
        n_buckets = spec.buckets
    elif args.corpus:
        corpus = args.corpus
        default_seeds = []
        n_buckets = args.buckets
    else:
        ap.error("need --corpus DIR or --synth-corpus N")

    if args.config:
        cfg = CrawlConfig.from_yaml(args.config)
    else:
        cfg = CrawlConfig()
    seeds = list(args.seeds or cfg.start_urls or default_seeds)
    if not seeds:
        ap.error("no seeds: pass --seeds, config start_urls, or --synth-corpus")
    import dataclasses

    cfg = dataclasses.replace(cfg, start_urls=tuple(seeds))
    if args.max_depth is not None:
        cfg = dataclasses.replace(
            cfg,
            limits=dataclasses.replace(cfg.limits, max_depth=args.max_depth),
        )
    if args.frontier or args.round_budget is not None:
        cfg = dataclasses.replace(
            cfg,
            scale=dataclasses.replace(
                cfg.scale,
                frontier_policy=args.frontier or cfg.scale.frontier_policy,
                round_budget=(
                    args.round_budget
                    if args.round_budget is not None
                    else cfg.scale.round_budget
                ),
            ),
        )
    if args.mode == "scale":
        # default the SHIPPED seen config (bench.run_headline's
        # rationale): bloom shards with corpus-sized capacity; an
        # explicit --seen-mode (or a yaml that set one away from the
        # dataclass default) wins
        seen_mode = args.seen_mode or (
            cfg.scale.seen_mode if cfg.scale.seen_mode != "exact"
            else "bloom"
        )
        cap = args.seen_capacity or max(
            1_000_000, (args.synth_corpus or 0) // 2
        )
        cfg = dataclasses.replace(
            cfg,
            scale=dataclasses.replace(
                cfg.scale, seen_mode=seen_mode, bloom_capacity=cap
            ),
        )
    robots_payloads = None
    if args.robots_dir:
        robots_payloads = {
            os.path.splitext(f)[0]: open(
                os.path.join(args.robots_dir, f), "rb"
            ).read()
            for f in sorted(os.listdir(args.robots_dir))
            if f.endswith(".txt")
        }
        cfg = dataclasses.replace(cfg, respect_robots_txt=True)

    eng = CrawlEngine(corpus, seeds, cfg, n_buckets=n_buckets,
                      mode=args.mode, checkpoint_dir=args.checkpoint,
                      robots_payloads=robots_payloads)
    t0 = time.time()
    try:
        res = eng.run(resume=args.resume)
        crawl_s = time.time() - t0
        print(json.dumps({
            "visits": res.num_visits,
            "emissions": res.num_emissions,
            "crawl_s": round(crawl_s, 2),
            "urls_per_sec": round(res.num_visits / max(crawl_s, 1e-9), 1),
            "rounds": len(res.metrics),
        }))
        if args.out:
            import pyarrow.parquet as pq

            os.makedirs(args.out, exist_ok=True)
            pq.write_table(res.visits,
                           os.path.join(args.out, "visits.parquet"))
            pq.write_table(res.emissions,
                           os.path.join(args.out, "emissions.parquet"))
            run_image_pipeline(
                res.emissions, cfg.images,
                out_dir=os.path.join(args.out, "accepted"),
                max_images=cfg.limits.max_images,
                max_bytes=int(cfg.limits.max_folder_size_mb * 2**20),
            )
            import glob as _glob

            # count what was actually WRITTEN (the max_images/max_bytes
            # budgets truncate the sink below the raw accepted count) —
            # parquet footers only, no data read
            n_acc = sum(
                pq.read_metadata(f).num_rows
                for f in _glob.glob(
                    os.path.join(args.out, "accepted", "**", "*.parquet"),
                    recursive=True,
                )
            )
            print(json.dumps({"accepted_images": n_acc,
                              "out": args.out}))
    finally:
        eng.shutdown()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
