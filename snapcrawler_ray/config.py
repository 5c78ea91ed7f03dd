"""Engine configuration.

Mirrors the reference's YAML surface (reference config.yaml) with the
same defaults where the semantics carry over to a corpus-backed Ray
engine, plus the scale knobs the rebuild adds (shards, bloom sizing,
batch sizes).  A plain dataclass tree; ``CrawlConfig.from_yaml`` accepts
a reference-shaped YAML file so existing configs keep working.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

import yaml


@dataclass
class ImageFilterConfig:
    # reference config.yaml:5-41 defaults
    min_side_size: int = 400
    color_mode: str = "all"          # 'color' | 'bw' | 'all'
    allow_logos_banners: bool = False
    watermark_enabled: bool = False
    watermark_sensitivity: int = 15
    deduplication: bool = False
    formats: tuple[str, ...] = ("jpg", "jpeg", "png", "webp")
    min_dpi: int = 0
    aspect_ratio_min: float = 0.4
    aspect_ratio_max: float = 3.0
    orientation: str = "all"         # 'square' | 'vertical'/'portrait' | 'horizontal'/'landscape' | 'all'
    # Which reference filter chain to reproduce (SURVEY §7.5 "test both
    # where cheap").  "scrapy" (default — the engine's historical chain)
    # = pipelines.py:109-255: orientation synonyms mapped, F9
    # banner/logo aspect live after watermark; every config knob is
    # live.  "parallel" = filtering_module.py:265-357 exactly:
    # 'vertical'/'horizontal' orientation values match no branch (pass
    # everything) and F9 is dead code (extreme-aspect images accepted).
    chain_mode: str = "scrapy"       # 'scrapy' | 'parallel'


@dataclass
class CrawlLimits:
    # reference config.yaml:221-223, crawling section
    max_depth: int = 5
    max_requests: int = 0            # 0 = unlimited
    max_images: int = 150_000
    max_folder_size_mb: float = 0.0  # 0 = unlimited


@dataclass
class PolitenessConfig:
    # reference config.yaml:81-86, settings.py:45-49; middlewares_advanced.py:348-422
    request_delay: float = 2.5
    max_delay: float = 30.0
    backoff_factor: float = 2.0
    success_decay: float = 0.9
    min_delay: float = 0.1
    retry_times: int = 3
    retry_http_codes: tuple[int, ...] = (500, 502, 503, 504, 408, 429)
    # Scale knob: hosts with more than this many frontier URLs in one
    # round get salted splits (SURVEY.md §4 skew row).
    heavy_hitter_threshold: int = 512
    # Opt-in: record the per-sub-batch schedule + per-status event
    # stream for the crawl_politeness_schedule SQL oracle.  OFF by
    # default — the log is O(total URLs) driver memory, which ordinary
    # crawls must not pay.
    oracle_log: bool = False


@dataclass
class ScaleConfig:
    """Rebuild-only knobs (no reference equivalent)."""
    seen_shards: int = 8
    # 'exact' (verification) | 'bloom' | 'cuckoo' (scale) |
    # 'windowed_cuckoo' (scale + recrawl: seen keys expire after
    # seen_window_generations rotations)
    seen_mode: str = "exact"
    bloom_bits_per_key: int = 12     # ~1e-3 fpp
    bloom_capacity: int = 1_000_000  # per shard
    corpus_buckets: int = 32         # url-hash partition count of the corpus
    # 'pool': resident fetch+extract actor pool (stateful fetch stage,
    #         one RPC per actor per round — the cluster design path);
    # 'scan': per-round Dataset pipeline re-reading touched buckets
    #         (streaming fallback; useful when fetch state can't be
    #         resident, e.g. corpus >> cluster memory)
    fetch_mode: str = "pool"
    # Frontier emission policy (scale mode only).  'bfs' (default)
    # processes the whole wave round-synchronously — the reference-
    # ordering-parity path.  'priority' scores the frontier
    # (depth + per-host politeness backlog + discovery recency) and
    # emits only the top `round_budget` URLs per round, deferring the
    # rest — the north-star priority-queue shape for 10^10-URL
    # frontiers where a full wave exceeds one round's fetch capacity.
    # Coverage (the visit SET) is identical to bfs; only order differs.
    frontier_policy: str = "bfs"     # 'bfs' | 'priority'
    round_budget: int = 0            # 0 = unlimited (whole wave)
    extract_batch_size: int = 256
    image_batch_size: int = 64
    fetch_concurrency: int = 8
    # Recrawl scheduling (scale mode, seen_mode='windowed_cuckoo'):
    # rotate the sliding-window seen filters every K rounds, so a URL
    # (and its page-MD5/pHash claims) seen seen_window_generations
    # rotations ago expires and becomes crawlable again.  0 = off.
    # Termination stays bounded by max_depth / max_requests.
    recrawl_every_rounds: int = 0
    seen_window_generations: int = 4


@dataclass
class CrawlConfig:
    start_urls: tuple[str, ...] = ()
    min_commons_thumb_px: int | None = None  # fallback chain → images.min_side_size → 300
    # reference config.yaml:132 respect_robots_txt → settings.py:34
    # ROBOTSTXT_OBEY (Scrapy middleware); default off like the reference
    respect_robots_txt: bool = False
    # T12: User-Agent rotation list (reference config.yaml
    # crawling.user_agents → middlewares.py:10-29
    # RotateUserAgentMiddleware).  The reference picks
    # ``random.choice(user_agents)`` per request; this engine is
    # deterministic end-to-end, so the per-request choice is
    # ``user_agents[url_hash64(url) % len(user_agents)]`` — same
    # rotation semantics (every request gets one header from the
    # configured list, uniformly spread), replayable.  Empty tuple =
    # middleware disabled, exactly like the reference's from_crawler
    # returning None on an empty list.
    user_agents: tuple[str, ...] = ()
    images: ImageFilterConfig = field(default_factory=ImageFilterConfig)
    limits: CrawlLimits = field(default_factory=CrawlLimits)
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    scale: ScaleConfig = field(default_factory=ScaleConfig)

    @property
    def resolved_thumb_px(self) -> int:
        """crawling.min_commons_thumb_px → images.min_side_size → 300
        (reference crawling_module.py:386-401)."""
        if self.min_commons_thumb_px is not None:
            return int(self.min_commons_thumb_px)
        if self.images.min_side_size:
            return int(self.images.min_side_size)
        return 300

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_yaml(cls, path: str) -> "CrawlConfig":
        """Load a reference-shaped config.yaml (images/crawling/limits)."""
        with open(path, "r", encoding="utf-8") as f:
            raw = yaml.safe_load(f) or {}
        img = raw.get("images", {})
        crawl = raw.get("crawling", {})
        limits = raw.get("limits", {})
        wm = img.get("watermark_detection", {}) or {}
        return cls(
            start_urls=tuple(crawl.get("start_urls", ())),
            min_commons_thumb_px=crawl.get("min_commons_thumb_px"),
            respect_robots_txt=crawl.get("respect_robots_txt", False),
            user_agents=tuple(crawl.get("user_agents") or ()),
            images=ImageFilterConfig(
                min_side_size=img.get("min_side_size", 400),
                color_mode=img.get("color_mode", "all"),
                allow_logos_banners=img.get("allow_logos_banners", False),
                chain_mode=img.get("chain_mode", "scrapy"),
                watermark_enabled=wm.get("enabled", False),
                watermark_sensitivity=wm.get("sensitivity", 15),
                deduplication=img.get("deduplication", False),
                formats=tuple(img.get("formats", ("jpg", "jpeg", "png", "webp"))),
                min_dpi=img.get("min_dpi", 0),
                aspect_ratio_min=img.get("aspect_ratio_min", 0.4),
                aspect_ratio_max=img.get("aspect_ratio_max", 3.0),
                orientation=img.get("orientation", "all"),
            ),
            limits=CrawlLimits(
                max_depth=crawl.get("max_depth", 5),
                max_requests=crawl.get("max_requests", 0),
                max_images=limits.get("max_images", 150_000),
                max_folder_size_mb=limits.get("max_folder_size_mb", 0.0),
            ),
            politeness=PolitenessConfig(
                request_delay=crawl.get("request_delay", 2.5),
                max_delay=crawl.get("max_delay", 30.0),
                backoff_factor=crawl.get("backoff_factor", 2.0),
            ),
        )
