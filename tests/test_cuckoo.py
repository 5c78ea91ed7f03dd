"""Cuckoo-filter unit tests (the deletable Bloom alternative the north
rule names for URL-seen state)."""

import numpy as np
import pytest

from snapcrawler_ray.state.cuckoo import CuckooFilter


def test_membership_and_first_wins():
    cf = CuckooFilter(10_000)
    rng = np.random.RandomState(1)
    keys = rng.randint(0, 2**62, 5000).astype(np.uint64)
    new = cf.check_and_add(keys)
    assert new.all()
    assert cf.contains(keys).all()
    # re-presentation: nothing new
    assert not cf.check_and_add(keys).any()
    # in-batch duplicates: first occurrence wins
    fresh = rng.randint(0, 2**62, 10).astype(np.uint64) + np.uint64(2**63)
    batch = np.concatenate([fresh, fresh])
    mask = cf.check_and_add(batch)
    assert mask[:10].all() and not mask[10:].any()


def test_no_false_negatives_low_fpp():
    cf = CuckooFilter(50_000)
    rng = np.random.RandomState(2)
    ins = rng.randint(0, 2**62, 40_000).astype(np.uint64)
    cf.add(ins)
    assert cf.contains(ins).all()  # cuckoo filters have no false negatives
    probe = rng.randint(0, 2**62, 40_000).astype(np.uint64) + np.uint64(2**63)
    fpp = cf.contains(probe).mean()
    # 4×16-bit slots: theoretical ~2.4e-4; allow generous slack
    assert fpp < 0.005, fpp


def test_add_copy_semantics_per_mode():
    # delete_safe (multiset): one copy per OCCURRENCE — in-batch
    # duplicates included — so copy counts don't depend on batching
    cf = CuckooFilter(1000, delete_safe=True)
    cf.add(np.array([5, 5, 5, 7], dtype=np.uint64))
    assert cf.approx_count == 4
    five = np.array([5], dtype=np.uint64)
    assert cf.delete(np.concatenate([five, five, five])).all()
    assert not cf.contains(five)[0]
    # seen mode: in-batch duplicates collapse (re-presentation must not
    # accrete copies or inflate approx_count)
    sf = CuckooFilter(1000)
    sf.add(np.array([5, 5, 5, 7], dtype=np.uint64))
    assert sf.approx_count == 2


def test_delete_restores_absence():
    cf = CuckooFilter(1000, delete_safe=True)
    keys = np.arange(1, 400, dtype=np.uint64) * np.uint64(2654435761)
    cf.add(keys)
    victims = keys[::7]
    assert cf.delete(victims).all()
    # deleted keys gone (modulo other keys' colliding fingerprints)
    assert cf.contains(victims).mean() < 0.05
    survivors = np.setdiff1d(keys, victims)
    assert cf.contains(survivors).all()


def test_dump_load_roundtrip():
    cf = CuckooFilter(5000)
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 2**62, 3000).astype(np.uint64)
    cf.add(keys)
    cf2 = CuckooFilter.load(cf.dump())
    assert cf2.contains(keys).all()
    assert cf2.approx_count == cf.approx_count
    np.testing.assert_array_equal(cf2.table, cf.table)


def test_full_filter_raises():
    cf = CuckooFilter(64)
    keys = np.arange(1, 5000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    with pytest.raises(RuntimeError, match="full"):
        cf.add(keys)


def test_scale_crawl_with_cuckoo_seen(small_corpus):
    """Scale-mode crawl with seen_mode='cuckoo' visits the same URL set
    as the bloom path (both approximate filters stay exact at this
    cardinality)."""
    from snapcrawler_ray.config import CrawlConfig, CrawlLimits, ScaleConfig
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.sources.corpus import seeds_for

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)

    def run(mode):
        cfg = CrawlConfig(
            start_urls=tuple(seeds),
            limits=CrawlLimits(max_depth=3),
            scale=ScaleConfig(seen_mode=mode),
        )
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                          mode="scale")
        try:
            return set(eng.run().visits.column("url").to_pylist())
        finally:
            eng.shutdown()

    assert run("cuckoo") == run("bloom")


def test_windowed_cuckoo_vs_exact_generations():
    """Property test: WindowedCuckoo membership equals the exact
    generational-set reference at every step of a random add/rotate
    trace — no false negatives ever; false positives bounded."""
    import numpy as np

    from snapcrawler_ray.state.cuckoo import WindowedCuckoo

    rng = np.random.RandomState(17)
    wc = WindowedCuckoo(capacity=4096, generations=3)
    exact = [set()]
    universe = rng.randint(0, 1 << 48, size=6000).astype(np.uint64)
    fp = 0
    checked = 0
    for step in range(40):
        batch = rng.choice(universe, size=rng.randint(1, 200))
        wc.add(batch)
        # exact model mirrors the no-refresh rule: a key already live
        # anywhere in the window keeps its ORIGINAL generation (and
        # original expiry), it is not re-stamped into the current one
        live_now = set().union(*exact)
        exact[-1].update({int(x) for x in batch} - live_now)
        probe = rng.choice(universe, size=300)
        got = wc.contains(probe)
        live = set().union(*exact)
        for k, g in zip(probe, got):
            if int(k) in live:
                assert g, "false negative in live window"
            elif g:
                fp += 1
            checked += 1
        if step % 5 == 4:
            wc.rotate()
            exact.append(set())
            if len(exact) > 3:
                exact.pop(0)
    assert fp / checked < 0.01, (fp, checked)


def test_windowed_cuckoo_expiry_and_roundtrip():
    """Keys added G rotations ago expire (become addable again); dump/
    load preserves the live window exactly."""
    import numpy as np

    from snapcrawler_ray.state.cuckoo import WindowedCuckoo

    wc = WindowedCuckoo(capacity=1024, generations=2)
    old = np.arange(100, dtype=np.uint64)
    wc.add(old)
    assert wc.contains(old).all()
    wc.rotate()          # old in gen[0] of 2 — still live
    assert wc.contains(old).all()
    fresh = np.arange(1000, 1050, dtype=np.uint64)
    wc.add(fresh)
    wc.rotate()          # old generation retired
    assert not wc.contains(old).any()
    assert wc.contains(fresh).all()
    # check_and_add treats expired keys as NEW again (returns the
    # new-mask, same contract as CuckooFilter / SeenShard)
    new = wc.check_and_add(old[:10])
    assert new.all()
    assert wc.contains(old[:10]).all()
    # second presentation: no longer new; in-batch dup first-wins
    again = wc.check_and_add(np.concatenate([old[:10], np.array([7777, 7777], np.uint64)]))
    assert not again[:10].any() and again[10] and not again[11]
    wc2 = type(wc).load(wc.dump())
    assert wc2.contains(fresh).all()
    assert wc2.contains(old[:10]).all()
    assert not wc2.contains(old[10:]).any()
    assert wc2.rotations == wc.rotations


def test_scale_crawl_recrawl_window(small_corpus):
    """Recrawl scheduling end-to-end: with the sliding-window seen mode
    and an aggressive rotation (every round, 1 generation), already-
    visited URLs expire and are re-crawled at later depths — the crawl
    still terminates (depth bound) and its visit SET is a superset of
    the plain cuckoo crawl's; with rotation off, windowed mode equals
    plain cuckoo exactly."""
    from snapcrawler_ray.config import (CrawlConfig, CrawlLimits,
                                        ScaleConfig)
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.sources.corpus import seeds_for

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)

    def run(scale_cfg):
        cfg = CrawlConfig(start_urls=tuple(seeds),
                          limits=CrawlLimits(max_depth=3), scale=scale_cfg)
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                          mode="scale")
        try:
            v = eng.run().visits
            return list(zip(v.column("url").to_pylist(),
                            v.column("depth").to_pylist()))
        finally:
            eng.shutdown()

    base = run(ScaleConfig(seen_mode="cuckoo"))
    windowed_off = run(ScaleConfig(seen_mode="windowed_cuckoo"))
    assert sorted(windowed_off) == sorted(base)

    recrawl = run(ScaleConfig(seen_mode="windowed_cuckoo",
                              recrawl_every_rounds=1,
                              seen_window_generations=1))
    base_urls = {u for u, _ in base}
    rec_urls = {u for u, _ in recrawl}
    assert rec_urls >= base_urls
    # expiry visibly re-crawls: some url visited at more than one depth
    depths_per_url = {}
    for u, d in recrawl:
        depths_per_url.setdefault(u, set()).add(d)
    assert any(len(ds) > 1 for ds in depths_per_url.values())
    assert len(recrawl) > len(base)


def test_recrawl_resume_across_rotation(small_corpus, tmp_path):
    """Kill/resume across a window-rotation boundary reproduces the
    uninterrupted crawl exactly — the rotation happens BEFORE the
    checkpoint dump, so the restored window is post-rotation."""
    import os
    import shutil

    from snapcrawler_ray.config import (CrawlConfig, CrawlLimits,
                                        ScaleConfig)
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.sources.corpus import seeds_for

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    sc = ScaleConfig(seen_mode="windowed_cuckoo", recrawl_every_rounds=1,
                     seen_window_generations=1)
    cfg = CrawlConfig(start_urls=tuple(seeds),
                      limits=CrawlLimits(max_depth=3), scale=sc)

    ck1 = str(tmp_path / "rc_full")
    eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                      mode="scale", checkpoint_dir=ck1)
    try:
        full = eng.run()
        full_visits = full.visits.to_pylist()
    finally:
        eng.shutdown()

    ck2 = str(tmp_path / "rc_partial")
    os.makedirs(ck2)
    for r in (0, 1):
        src = os.path.join(ck1, f"round={r}")
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(ck2, f"round={r}"))
    eng2 = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                       mode="scale", checkpoint_dir=ck2)
    try:
        resumed = eng2.run(resume=True)
        assert resumed.visits.to_pylist() == full_visits
    finally:
        eng2.shutdown()


def test_recrawl_composes_with_priority_policy(small_corpus):
    """Recrawl rotation composing with the priority frontier stays
    deterministic (two runs bit-identical) and still terminates — the
    deferred-backlog × expiry interaction must not introduce
    nondeterminism."""
    from snapcrawler_ray.config import (CrawlConfig, CrawlLimits,
                                        ScaleConfig)
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.sources.corpus import seeds_for

    spec, path = small_corpus
    seeds = seeds_for(spec, 4)
    sc = ScaleConfig(seen_mode="windowed_cuckoo", recrawl_every_rounds=2,
                     seen_window_generations=1,
                     frontier_policy="priority", round_budget=40)
    cfg = CrawlConfig(start_urls=tuple(seeds),
                      limits=CrawlLimits(max_depth=3, max_requests=300),
                      scale=sc)

    def run():
        eng = CrawlEngine(path, seeds, cfg, n_buckets=spec.buckets,
                          mode="scale")
        try:
            return eng.run().visits.to_pylist()
        finally:
            eng.shutdown()

    a, b = run(), run()
    assert a == b
    assert len(a) <= 300 + 40  # budget bound (one round's overshoot max)
