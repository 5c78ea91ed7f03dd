"""HyperLogLog kernel properties (no Ray needed)."""

import numpy as np
import pandas as pd

from snapcrawler_ray.functions.sketch import _lzc64, hll_estimate, hll_partial


def test_lzc64():
    x = np.array([1, 2, 2**63, 2**32, 3, 2**64 - 1], dtype=np.uint64)
    assert list(_lzc64(x)) == [63, 62, 0, 31, 62, 0]


def test_hll_merge_equals_oneshot():
    """Merging chunked partials by max gives bit-identical estimates to
    sketching the whole stream at once — the property that makes the
    map_batches partial + tiny groupby-max topology exact w.r.t. the
    sketch."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**62, size=100_000)
    one = hll_partial(np.repeat("k", len(vals)), vals, 12)
    chunks = [
        hll_partial(np.repeat("k", len(c)), c, 12)
        for c in np.array_split(vals, 13)
    ]
    merged = (
        pd.concat(chunks)
        .groupby(["key", "reg"], as_index=False)
        .agg(rank=("rank", "max"))
    )
    a = hll_estimate(one, 12)["approx_distinct"].iloc[0]
    b = hll_estimate(merged, 12)["approx_distinct"].iloc[0]
    assert a == b


def test_hll_error_envelope():
    rng = np.random.default_rng(11)
    for n in [100, 5_000, 300_000]:
        vals = np.unique(rng.integers(0, 2**62, size=n))
        part = hll_partial(np.repeat("k", len(vals)), vals, 12)
        est = hll_estimate(part, 12)["approx_distinct"].iloc[0]
        assert abs(est - len(vals)) / len(vals) < 0.07


# ------------------------------------------------- Count-Min sketch

def test_cms_merge_equals_oneshot():
    """Summing chunked counter partials is bit-identical to sketching
    the whole stream at once — the property that makes the map_batches
    partial + sum-reduce topology exact w.r.t. the sketch."""
    from snapcrawler_ray.functions.sketch import cms_partial

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, size=20_000)
    one = cms_partial(vals, 4, 256).set_index(["row_j", "col"])["cnt"]
    chunks = pd.concat(
        [cms_partial(c, 4, 256) for c in np.array_split(vals, 11)]
    )
    merged = chunks.groupby(["row_j", "col"])["cnt"].sum()
    pd.testing.assert_series_equal(
        one.sort_index(), merged.sort_index(), check_names=False
    )


def test_cms_never_undercounts_and_bound():
    """est ≥ true for EVERY key (structural), and the ε-bound
    est ≤ true + ceil(e/w · N) holds for all keys on this stream
    (d=4 ⇒ failure probability e^-4 per key; deterministic given the
    fixed md5 hash basis, so this is a stable regression test, not a
    flaky probabilistic one)."""
    from snapcrawler_ray.functions.sketch import cms_cols_for, cms_partial

    rng = np.random.default_rng(5)
    # zipf-ish: heavy head + long tail, forcing real collisions at w=128
    vals = np.concatenate(
        [np.repeat(np.arange(10), 300), rng.integers(100, 2000, size=5000)]
    )
    d, w = 4, 128
    regs = cms_partial(vals, d, w)
    table = np.zeros((d, w), dtype=np.int64)
    table[regs["row_j"].to_numpy(), regs["col"].to_numpy()] = regs[
        "cnt"
    ].to_numpy()
    uniq, true = np.unique(vals, return_counts=True)
    cols = cms_cols_for(uniq, d, w)
    est = table[np.arange(d)[None, :], cols].min(axis=1)
    assert (est >= true).all()
    n = len(vals)
    eps_n = int(np.ceil(np.e / w * n))
    assert (est <= true + eps_n).all()
    # collisions actually happened (the test is non-vacuous)
    assert (est > true).any()


def test_cms_query_hash_matches_update_hash():
    """cms_cols_for addresses exactly the counters cms_partial wrote:
    a single-occurrence stream reads back as all-ones."""
    from snapcrawler_ray.functions.sketch import cms_cols_for, cms_partial

    vals = np.arange(50)
    d, w = 4, 4096
    regs = cms_partial(vals, d, w)
    table = np.zeros((d, w), dtype=np.int64)
    table[regs["row_j"].to_numpy(), regs["col"].to_numpy()] = regs[
        "cnt"
    ].to_numpy()
    cols = cms_cols_for(vals, d, w)
    est = table[np.arange(d)[None, :], cols].min(axis=1)
    # w >> n so no collisions: every estimate is exactly 1
    assert (est == 1).all()
