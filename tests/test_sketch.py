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
