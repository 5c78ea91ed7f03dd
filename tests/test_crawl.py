"""Crawl-ordering + URL-seen conformance (SURVEY.md §5.3) and resume
determinism (§5.4)."""

import os

import pyarrow.parquet as pq
import pytest

from snapcrawler_ray.config import CrawlConfig, CrawlLimits
from snapcrawler_ray.html.extract import extract_page
from snapcrawler_ray.pipelines.crawl import CrawlEngine
from snapcrawler_ray.pipelines.replay import replay_crawl
from snapcrawler_ray.sources.corpus import seeds_for
from snapcrawler_ray.urlnorm import hosts_of


def _load_corpus_dict(path):
    rows = {}
    for name in sorted(os.listdir(path)):
        if name.startswith("bucket="):
            t = pq.read_table(os.path.join(path, name, "part-0.parquet"))
            for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
                rows[u] = h
    return rows


def _oracle(corpus, seeds, max_depth, max_requests=0, thumb_px=400):
    # thumb_px=400: the reference's fallback chain resolves
    # min_commons_thumb_px → images.min_side_size (default 400) → 300
    allowed = sorted({h for h in hosts_of(seeds) if h})

    def get_page(url):
        html = corpus.get(url)
        if html is None:
            return None
        return extract_page(html, url, allowed, thumb_px)

    return replay_crawl(seeds, get_page, max_depth=max_depth, max_requests=max_requests)


@pytest.fixture(scope="module")
def engine_result(small_corpus):
    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3))
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact")
    try:
        res = eng.run()
    finally:
        eng.shutdown()
    corpus = _load_corpus_dict(path)
    oracle = _oracle(corpus, seeds, max_depth=3)
    return res, oracle


def test_visit_order_matches_reference_semantics(engine_result):
    res, oracle = engine_result
    got = res.visits.to_pylist()
    want = oracle.visits
    assert len(got) > 20, "crawl should visit a meaningful number of pages"
    assert [g["url"] for g in got] == [w["url"] for w in want]
    assert [g["depth"] for g in got] == [w["depth"] for w in want]
    assert [g["status"] for g in got] == [w["status"] for w in want]
    assert [g["cascade"] for g in got] == [w["cascade"] for w in want]


def test_seen_set_matches(engine_result):
    res, oracle = engine_result
    assert res.seen_urls == oracle.seen_urls()


def test_image_emission_order_matches(engine_result):
    res, oracle = engine_result
    got = res.emissions.to_pylist()
    want = oracle.image_emissions
    assert len(got) == len(want) and len(got) > 10
    assert [g["url"] for g in got] == [w["url"] for w in want]
    assert [g["source_page"] for g in got] == [w["source_page"] for w in want]


def test_crawl_has_cascades_and_dups(engine_result):
    """The corpus must actually exercise cascade + MD5-dup paths."""
    _, oracle = engine_result
    statuses = {v["status"] for v in oracle.visits}
    assert any(v["cascade"] for v in oracle.visits)
    assert "dup" in statuses
    assert "miss" in statuses or True  # misses possible but not required


def test_max_requests_budget(small_corpus):
    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(
        start_urls=tuple(seeds),
        limits=CrawlLimits(max_depth=3, max_requests=17),
    )
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact")
    try:
        res = eng.run()
    finally:
        eng.shutdown()
    corpus = _load_corpus_dict(path)
    oracle = _oracle(corpus, seeds, max_depth=3, max_requests=17)
    assert res.visits.num_rows == len(oracle.visits) == 17
    assert res.visits.to_pylist() == [
        {**v} for v in _visits_dicts(oracle)
    ]


def _visits_dicts(trace):
    return trace.visits


def test_scale_mode_same_coverage(small_corpus):
    """Scale mode (bloom seen, no replay) visits the same URL set at the
    same depths; ordering is round-synchronous instead of serial."""
    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3))
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="scale")
    try:
        res = eng.run()
    finally:
        eng.shutdown()
    corpus = _load_corpus_dict(path)
    oracle = _oracle(corpus, seeds, max_depth=3)
    ok_visits = {(v["url"], v["depth"]) for v in oracle.visits if v["status"] != "miss"}
    got = {
        (u, d)
        for u, d in zip(
            res.visits.column("url").to_pylist(),
            res.visits.column("depth").to_pylist(),
        )
    }
    assert got == ok_visits


def test_resume_identical_output(small_corpus, tmp_path):
    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3))
    ck1 = str(tmp_path / "ck_full")
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact",
                      checkpoint_dir=ck1)
    try:
        full = eng.run()
    finally:
        eng.shutdown()

    # interrupted run: re-run but stop after round 1 by truncating the
    # engine loop via a copy of the checkpoint dir, then resume
    ck2 = str(tmp_path / "ck_partial")
    os.makedirs(ck2)
    # copy only round=0 and round=1 checkpoints — as if killed mid-run
    import shutil

    for r in (0, 1):
        src = os.path.join(ck1, f"round={r}")
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(ck2, f"round={r}"))

    eng2 = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact",
                       checkpoint_dir=ck2)
    try:
        resumed = eng2.run(resume=True)
    finally:
        eng2.shutdown()

    assert resumed.visits.to_pylist() == full.visits.to_pylist()
    assert resumed.emissions.to_pylist() == full.emissions.to_pylist()
    assert resumed.seen_urls == full.seen_urls


def test_scale_mode_steal_matches_no_steal(small_corpus, monkeypatch):
    """The work-stealing extract phase must produce EXACTLY the outputs
    of the per-partition (SNAPRAY_NO_STEAL=1) path — chunk keys make
    completion order irrelevant, and the chunk ranges must tile each
    joined block with no clamp/overlap (extract_chunk raises on
    n_found/stash drift)."""
    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3))
    outs = []
    for no_steal in ("1", "0"):
        monkeypatch.setenv("SNAPRAY_NO_STEAL", no_steal)
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                          mode="scale")
        try:
            res = eng.run()
            outs.append(
                (res.visits.to_pylist(), res.emissions.to_pylist())
            )
        finally:
            eng.shutdown()
    assert outs[0][0] == outs[1][0]
    assert outs[0][1] == outs[1][1]


def test_scale_mode_resume_identical(small_corpus, tmp_path):
    """Scale mode: kill after round 1, resume from the per-partition
    actor-written checkpoints, identical outputs."""
    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3))
    ck1 = str(tmp_path / "sck_full")
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="scale",
                      checkpoint_dir=ck1)
    try:
        full = eng.run()
        full_visits = full.visits.to_pylist()
        full_emissions = full.emissions.to_pylist()
    finally:
        eng.shutdown()

    ck2 = str(tmp_path / "sck_partial")
    os.makedirs(ck2)
    import shutil

    for r in (0, 1):
        src = os.path.join(ck1, f"round={r}")
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(ck2, f"round={r}"))

    eng2 = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="scale",
                       checkpoint_dir=ck2)
    try:
        resumed = eng2.run(resume=True)
        assert resumed.visits.to_pylist() == full_visits
        assert resumed.emissions.to_pylist() == full_emissions
    finally:
        eng2.shutdown()


def test_streaming_scan_fetch_matches_pool(small_corpus):
    """The Dataset-native scan fetch (fallback for corpora too big to
    hold resident) returns the same extraction rows as the pool path."""
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow as pa

    from snapcrawler_ray.hashing import url_hash64
    from snapcrawler_ray.pipelines.crawl import Wave
    from snapcrawler_ray.stages.fetch import fetch_extract_wave

    spec, path = small_corpus
    # take a handful of real corpus urls + one miss
    t = None
    for name in sorted(os.listdir(path)):
        if name.startswith("bucket="):
            t = pq.read_table(os.path.join(path, name, "part-0.parquet"),
                              columns=["url"])
            break
    urls = t.column("url").to_pylist()[:5] + ["https://nowhere.example/x"]
    wave = Wave(
        pa.array(urls, pa.string()),
        np.zeros(len(urls), np.int32),
        np.arange(len(urls), dtype=np.int64),
        url_hash64(np.asarray(urls, dtype=object)),
    )
    ds = fetch_extract_wave(
        path, spec.buckets, wave,
        allowed_domains=sorted({h for h in hosts_of(urls) if h}),
        min_commons_thumb_px=400,
    )
    rows = {r["url"]: r for r in ds.take_all()}
    assert set(rows) == set(urls[:5])  # miss absent
    for u in urls[:5]:
        assert rows[u]["content_md5"]


# ---------------- heavy-hitter salting (T5/T6 skew) ----------------


def test_salt_heavy_hosts_bounds_and_conservation():
    from snapcrawler_ray.state.politeness import salt_heavy_hosts

    hosts, counts, salted = salt_heavy_hosts(
        ["big.example", "small.example"], [2000, 100], threshold=512
    )
    assert salted == {"big.example": [512, 512, 512, 464]}
    assert max(counts) <= 512
    assert sum(c for h, c in zip(hosts, counts) if h == "big.example") == 2000
    assert ("small.example", 100) in zip(hosts, counts)


def test_salted_schedule_same_virtual_timeline(ray_session):
    """Salting changes dispatch granularity only: the owner shard's
    per-host delay/next-free state after a salted schedule equals the
    unsalted one, and the host's first slot is unchanged."""
    from snapcrawler_ray.config import PolitenessConfig
    from snapcrawler_ray.state.politeness import PolitenessPool

    cfg_salt = PolitenessConfig(heavy_hitter_threshold=128)
    cfg_plain = PolitenessConfig(heavy_hitter_threshold=1 << 30)
    a = PolitenessPool(cfg_salt, n_shards=2)
    b = PolitenessPool(cfg_plain, n_shards=2)
    try:
        sa = a.schedule_hosts(["big.example", "tiny.example"], [1000, 3])
        sb = b.schedule_hosts(["big.example", "tiny.example"], [1000, 3])
        assert sa == sb
        assert a.last_salt == {"big.example": [128] * 7 + [104]}
        assert b.last_salt == {}
        assert a.snapshot() == b.snapshot()
    finally:
        a.shutdown()
        b.shutdown()


def test_crawl_salting_bounded_batches_unchanged_visits(small_corpus):
    """The corpus plants a ~30% heavy host; with a low threshold the
    engine reports bounded per-batch host counts and the visit set is
    identical to the unsalted crawl."""
    from snapcrawler_ray.config import PolitenessConfig

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    threshold = 16

    def run(thr):
        cfg = CrawlConfig(
            start_urls=tuple(seeds),
            limits=CrawlLimits(max_depth=3),
            politeness=PolitenessConfig(heavy_hitter_threshold=thr),
        )
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact")
        try:
            res = eng.run()
        finally:
            eng.shutdown()
        return res

    salted = run(threshold)
    plain = run(1 << 30)
    assert sum(m["salted_hosts"] for m in salted.metrics) > 0
    assert all(m["max_host_batch"] <= threshold for m in salted.metrics)
    assert salted.visits.to_pylist() == plain.visits.to_pylist()


def test_robots_parse_and_match_semantics():
    """RFC 9309 prefix subset: UA-* group selection, longest-match,
    tie→Allow, no rules→allowed."""
    import numpy as np

    from snapcrawler_ray.state.robots import (
        parse_robots,
        robots_allowed,
        url_host_path,
    )

    body = b"""
# comment
User-agent: googlebot
Disallow: /only-google/

User-agent: *
Disallow: /photo/
Allow: /photo/public/
Disallow:
Sitemap: https://h.example/sitemap.xml

User-agent: other
User-agent: *
Disallow: /private
"""
    rules = parse_robots(body)
    assert (False, "/only-google/") not in rules
    assert (False, "/photo/") in rules and (True, "/photo/public/") in rules
    assert (False, "/private") in rules
    paths = np.array(
        ["/photo/1", "/photo/public/2", "/page/3", "/private/x", "/"],
        dtype=object,
    )
    mask = robots_allowed(rules, paths)
    assert mask.tolist() == [False, True, True, False, True]
    # no rules → everything allowed
    assert robots_allowed([], paths).all()
    h, p = url_host_path(
        ["https://A.example:8443/photo/1?q=2", "http://b.example"]
    )
    assert h.tolist() == ["a.example", "b.example"]
    # match target keeps the query string (RFC 9309 / Protego)
    assert p.tolist() == ["/photo/1?q=2", "/"]
    # query-string rules are matchable (ADVICE-r3: they could never
    # fire when the target was the bare path)
    qrules = parse_robots(b"User-agent: *\nDisallow: /search?q=\n")
    qmask = robots_allowed(
        qrules,
        np.array(["/search?q=x", "/search", "/search?p=1"], dtype=object),
    )
    assert qmask.tolist() == [False, True, True]


def test_robots_disallow_enforced(small_corpus):
    """respect_robots_txt: /photo/ disallowed on host 0 → neither the
    engine (exact AND scale mode) nor the independent replay oracle
    visits those cascade pages; everything else matches the oracle
    given the same blocked predicate."""
    from snapcrawler_ray.sources.corpus import host_name
    from snapcrawler_ray.state.robots import (
        parse_robots,
        robots_allowed,
        url_host_path,
    )

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    blocked_host = host_name(0)
    payloads = {
        blocked_host: b"User-agent: *\nDisallow: /photo/\n",
    }
    cfg = CrawlConfig(
        start_urls=tuple(seeds),
        limits=CrawlLimits(max_depth=3),
        respect_robots_txt=True,
    )
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                      mode="exact", robots_payloads=payloads)
    try:
        res = eng.run()
    finally:
        eng.shutdown()
    visits = res.visits.column("url").to_pylist()
    assert visits, "crawl produced no visits"
    assert not any(
        u.startswith(f"https://{blocked_host}/photo/") for u in visits
    )
    # other hosts' photo pages still crawled (cascades alive)
    assert any("/photo/" in u for u in visits)

    # oracle: same replay with the same predicate
    rules = {h: parse_robots(b) for h, b in payloads.items()}

    def blocked(url):
        h, p = url_host_path([url])
        return not robots_allowed(rules.get(str(h[0]), []), p)[0]

    corpus = _load_corpus_dict(path)
    allowed = sorted({h for h in hosts_of(seeds) if h})

    def get_page(url):
        html = corpus.get(url)
        return None if html is None else extract_page(html, url, allowed, 400)

    oracle = replay_crawl(seeds, get_page, max_depth=3, blocked=blocked)
    assert visits == [v["url"] for v in oracle.visits]

    # scale mode: same robots-filtered coverage (set equality — scale
    # mode's round-synchronous order is the documented deviation)
    eng2 = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                       mode="scale", robots_payloads=payloads)
    try:
        res2 = eng2.run()
    finally:
        eng2.shutdown()
    assert set(res2.visits.column("url").to_pylist()) == set(visits)
    assert sum(m.get("robots_blocked", 0) for m in res2.metrics) > 0


def test_priority_frontier_same_coverage_bounded_rounds(small_corpus):
    """scale-mode 'priority' policy (north-star frontier queue): visit
    SET identical to scale-BFS, every round's emitted wave is within
    the budget, and two runs are identical (deterministic scoring)."""
    from snapcrawler_ray.config import ScaleConfig

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    bfs_cfg = CrawlConfig(start_urls=tuple(seeds),
                          limits=CrawlLimits(max_depth=3))
    eng = CrawlEngine(path, seeds, bfs_cfg, n_buckets=spec.buckets,
                      mode="scale")
    try:
        bfs = eng.run()
        bfs_urls = set(bfs.visits.column("url").to_pylist())
    finally:
        eng.shutdown()

    budget = 40
    pr_cfg = CrawlConfig(
        start_urls=tuple(seeds),
        limits=CrawlLimits(max_depth=3),
        scale=ScaleConfig(frontier_policy="priority", round_budget=budget),
    )

    def run_priority():
        e = CrawlEngine(path, seeds, pr_cfg, n_buckets=spec.buckets,
                        mode="scale")
        try:
            return e.run()
        finally:
            e.shutdown()

    a = run_priority()
    assert set(a.visits.column("url").to_pylist()) == bfs_urls
    waves = [m["wave"] for m in a.metrics]
    assert max(waves) <= budget
    assert len(a.metrics) > len(bfs.metrics)  # budget stretches rounds
    b = run_priority()
    assert a.visits.column("url").to_pylist() == \
        b.visits.column("url").to_pylist()


def test_robots_differential_vs_stdlib():
    """Differential conformance vs urllib.robotparser: single-rule
    robots files must agree exactly (no precedence ambiguity); over
    random multi-rule files agreement stays ≥98% — the residual is the
    documented RFC 9309 longest-match vs legacy first-match precedence
    on overlapping Allow/Disallow prefixes."""
    import random
    import urllib.robotparser

    import numpy as np

    from snapcrawler_ray.state.robots import parse_robots, robots_allowed

    def ours(body, path):
        return bool(
            robots_allowed(
                parse_robots(body), np.array([path], dtype=object)
            )[0]
        )

    def theirs(body, path):
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        return rp.can_fetch("*", "https://h.example" + path)

    segs = ["/a", "/b", "/photo", "/photo/pub", "/x/y", "/p"]
    rnd = random.Random(7)
    # single-rule files: exact agreement
    for _ in range(500):
        rule = f"{rnd.choice(['Allow', 'Disallow'])}: {rnd.choice(segs)}"
        body = "User-agent: *\n" + rule + "\n"
        path = rnd.choice(segs) + rnd.choice(["", "/1", "/pub/2"])
        assert ours(body, path) == theirs(body, path), (body, path)
    # random multi-rule files: ≥98% agreement
    agree = total = 0
    for _ in range(2000):
        rules = [
            f"{rnd.choice(['Allow', 'Disallow'])}: "
            f"{rnd.choice(segs)}{rnd.choice(['', '/', '/z'])}"
            for _ in range(rnd.randint(0, 4))
        ]
        body = "User-agent: *\n" + "\n".join(rules) + "\n"
        path = rnd.choice(segs) + rnd.choice(["", "/1", "/pub/2"])
        total += 1
        agree += ours(body, path) == theirs(body, path)
    assert agree / total >= 0.98, f"{agree}/{total}"


def test_user_agent_rotation(small_corpus, tmp_path):
    """T12 (reference middlewares.py:10-29 RotateUserAgentMiddleware +
    config.yaml crawling.user_agents): every request gets one header
    from the configured list; the engine's choice is the deterministic
    hash rotation documented in CrawlConfig.  Checks: per-request tally
    covers every agent and sums to the scheduled-request count, the
    visit column equals the pure choice function, exact and scale mode
    agree, and an empty list disables the column (middleware off)."""
    import numpy as np
    import yaml

    from snapcrawler_ray.stages.fetch import user_agent_column, user_agent_idx

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    uas = ("ua-chrome-139", "ua-chrome-138", "ua-firefox-134")
    cfg = CrawlConfig(
        start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3),
        user_agents=uas,
    )
    tallies = {}
    for mode in ("exact", "scale"):
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode=mode)
        try:
            v = eng.run().visits
        finally:
            tallies[mode] = eng.ua_counts.copy()
            eng.shutdown()
        assert v.column("user_agent").to_pylist() == user_agent_column(
            v.column("url"), uas
        ).to_pylist()
        assert (tallies[mode] > 0).all()  # rotation actually rotates
    # both modes schedule the identical request stream
    assert (tallies["exact"] == tallies["scale"]).all()
    # the tally is the actor-side record of the same pure choice
    from snapcrawler_ray.hashing import url_hash64

    # middleware disabled on empty list (reference from_crawler -> None)
    eng = CrawlEngine(
        path, seeds,
        CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3)),
        n_buckets=spec.buckets, mode="exact",
    )
    try:
        assert "user_agent" not in eng.run().visits.column_names
    finally:
        eng.shutdown()
    # config.yaml plumbing (reference config.yaml:166 user_agents list)
    y = tmp_path / "cfg.yaml"
    y.write_text(
        yaml.safe_dump(
            {"crawling": {"start_urls": list(seeds), "user_agents": list(uas)}}
        )
    )
    assert CrawlConfig.from_yaml(str(y)).user_agents == uas
    # choice function: stable, uniform-ish, index-valued
    h = url_hash64(np.array([f"https://h{i}.example/p" for i in range(997)],
                            dtype=object))
    idx = user_agent_idx(h, 3)
    assert set(idx.tolist()) == {0, 1, 2}
    assert np.bincount(idx, minlength=3).min() > 200


def test_actor_death_fails_loud_then_resume_recovers(small_corpus, tmp_path):
    """Fault-tolerance posture at node scale: a fetch actor dying
    mid-crawl must surface as a LOUD error (never silently wrong
    output), and a fresh engine resuming from the same checkpoint dir
    must reproduce the uninterrupted run bit-for-bit — the per-round
    per-partition checkpoints are the lineage the north rule asks for."""
    import ray

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    cfg = CrawlConfig(start_urls=tuple(seeds), limits=CrawlLimits(max_depth=3))

    ck_ref = str(tmp_path / "ck_ref")
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact",
                      checkpoint_dir=ck_ref)
    try:
        full = eng.run()
    finally:
        eng.shutdown()

    ck = str(tmp_path / "ck_chaos")
    eng2 = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact",
                       checkpoint_dir=ck)
    orig = eng2._fetch_and_extract
    calls = {"n": 0}

    def chaos(wave):
        calls["n"] += 1
        if calls["n"] == 2:  # round 0 checkpointed; kill mid-round-1
            ray.kill(eng2.pool.actors[0])
        return orig(wave)

    eng2._fetch_and_extract = chaos
    try:
        with pytest.raises(Exception) as ei:
            eng2.run()
        # a dead actor must raise an actor/ray error, not corrupt data
        assert "Actor" in type(ei.value).__name__ or "Ray" in repr(ei.value)
    finally:
        eng2.shutdown()

    eng3 = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets, mode="exact",
                       checkpoint_dir=ck)
    try:
        resumed = eng3.run(resume=True)
    finally:
        eng3.shutdown()
    assert resumed.visits.to_pylist() == full.visits.to_pylist()
    assert resumed.emissions.to_pylist() == full.emissions.to_pylist()
    assert resumed.seen_urls == full.seen_urls


def test_exact_mode_meta_store_loud_guard():
    """Exact mode is the verification path: past WARN_ROWS absorbed
    extraction-meta rows the store warns ONCE that driver memory is
    O(corpus) and scale mode is the at-size configuration."""
    import warnings

    import pyarrow as pa

    from snapcrawler_ray.pipelines.crawl import _MetaStore

    ms = _MetaStore()
    ms.WARN_ROWS = 10
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ms.absorb(pa.table({"url": [f"u{i}" for i in range(8)]}))
        assert not w
        ms.absorb(pa.table({"url": [f"v{i}" for i in range(8)]}))
        assert len(w) == 1 and issubclass(w[0].category, ResourceWarning)
        assert "scale" in str(w[0].message)
        ms.absorb(pa.table({"url": ["x"]}))
        assert len(w) == 1  # once only
