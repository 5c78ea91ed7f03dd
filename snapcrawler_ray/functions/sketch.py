"""Mergeable sketches — the approximate scale path for wide exact
aggregates.

At 100 TB an exact ``count(DISTINCT user)`` per key is a full shuffle
of every (key, user) pair; a HyperLogLog register array is a fixed
``2^p``-byte summary that merges with element-wise ``max`` — so the
whole corpus reduces inside ``map_batches`` to one small register
table per key and the combine is embarrassingly tree-shaped (Flajolet
et al. 2007, the public HLL construction; bias correction per the
original paper's small/large-range regimes).

Determinism: hashing is the md5-prefix uint64 basis shared with
SimHash/fingerprints (``dedup._md5_u64`` — first 8 bytes of
``md5(str(user))``, big-endian), so the sketch — and therefore the
estimate — is bit-reproducible across processes/nodes/runs AND
SQL-reproducible: DuckDB recomputes the exact register table with
``CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16)) AS
UBIGINT)``, which puts the distributed register computation itself
under the driver's hard oracle (``events_hll_registers``), not just
the error envelope.  Tests assert bit-reproducibility alongside the
error bound (~1.04/sqrt(2^p) relative standard error).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _lzc64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (6-step binary
    reduction — no python loop over elements)."""
    n = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for step in (32, 16, 8, 4, 2, 1):
        small = cur < (np.uint64(1) << np.uint64(64 - step))
        n = np.where(small, n + step, n)
        cur = np.where(small, cur << np.uint64(step), cur)
    return n


def hll_partial(keys: np.ndarray, values: np.ndarray, p: int) -> pd.DataFrame:
    """(key, reg, rank) max-rank partials for one batch.

    The rank construction ``lzc((h << p) | 1 << (p-1)) + 1`` equals the
    SQL form ``CASE WHEN w = 0 THEN 64-p+1 ELSE (64-p) -
    floor(log2(w)) END`` over the low ``64-p`` bits ``w``: the sentinel
    bit caps the count at exactly the w=0 case, and at p ≥ 12 the
    remainder fits in 52 bits, so DuckDB's double-precision ``log2`` is
    exact on it."""
    from .dedup import _md5_u64

    h = _md5_u64(np.asarray(values).astype(str))
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    rank = _lzc64(rest) + 1
    df = pd.DataFrame({"key": keys, "reg": reg, "rank": rank})
    return df.groupby(["key", "reg"], as_index=False).agg(rank=("rank", "max"))


def hll_registers(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """event_type, reg, register — the merged HLL register table per
    event type, exactly as the estimator consumes it.  This is the
    sketch kernel itself under the hard oracle: DuckDB independently
    recomputes every (type, bucket) max-rank from ``md5(user_id)`` and
    the driver value-hash must match bit-for-bit.  Same distributed
    topology as :func:`approx_distinct_users` (per-batch partials
    bounded by types × 2^p small int rows, one max-merge)."""
    from .io import read_table

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        part = hll_partial(
            df["event_type"].to_numpy(), df["user_id"].to_numpy(), p
        )
        return part.rename(columns={"key": "event_type"})

    ds = read_table(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        partial, batch_format="pandas"
    )
    merged = _merge_registers(ds, "event_type").rename(
        columns={"key": "event_type", "rank": "register"}
    )
    merged["reg"] = merged["reg"].astype("int64")
    merged["register"] = merged["register"].astype("int64")
    return merged.sort_values(["event_type", "reg"]).reset_index(drop=True)


def _merge_registers(ds: "ray.data.Dataset", key_col: str) -> pd.DataFrame:
    """Distributed max-merge of per-batch register partials.

    Partial rows are tiny per batch (≤ keys × 2^p) but their TOTAL is
    O(batches × keys × 2^p) — pulling them all to the driver is fine at
    sf-scale and wrong at 100 TB, so the fold is a hash-bucketed reduce
    on (key, reg): every register cell lands in exactly one bucket,
    per-bucket pandas max is the global max, and the driver only
    concatenates the O(keys × 2^p) merged rows."""
    from .agg import bucketed_combine

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key_col, "reg"], as_index=False).agg(
            rank=("rank", "max")
        )

    return (
        bucketed_combine(ds, [key_col, "reg"], combine)
        .to_pandas()
        .rename(columns={key_col: "key"})
    )


def hll_estimate(regs: pd.DataFrame, p: int) -> pd.DataFrame:
    """key, approx_distinct from merged (key, reg, rank) rows.  Missing
    registers are zeros.  Bias correction: small-range linear counting
    when the raw estimate < 2.5·m and zero registers exist."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for key, g in regs.groupby("key", sort=True):
        ranks = np.zeros(m, dtype=np.float64)
        ranks[g["reg"].to_numpy(np.int64)] = g["rank"].to_numpy(np.float64)
        est = alpha * m * m / np.sum(np.power(2.0, -ranks))
        zeros = m - len(g)
        if est < 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        out.append((key, int(round(est))))
    return pd.DataFrame(out, columns=["key", "approx_distinct"])


def approx_hourly_users(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """hour, approx_distinct — HLL-approximate distinct users per hour
    (time-windowed sketch: the register partial is keyed on the window
    bucket, so sketching composes with any time bucketing for free).
    Same topology as :func:`approx_distinct_users`; per-batch partials
    are bounded by the batch's own distinct (hour, register) pairs."""
    from .io import read_table

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        part = hll_partial(
            df["ts"].dt.floor("h").to_numpy(), df["user_id"].to_numpy(), p
        )
        return part.rename(columns={"key": "hour"})

    ds = read_table(sf_dir, "events", ["ts", "user_id"]).map_batches(
        partial, batch_format="pandas"
    )
    merged = _merge_registers(ds, "hour")
    est = hll_estimate(merged, p).rename(columns={"key": "hour"})
    return est.sort_values("hour").reset_index(drop=True)


def _exact_distinct_users(
    sf_dir: str, key: str = "event_type"
) -> pd.DataFrame:
    """(key, n) exact distinct-user counts, fully distributed: per-batch
    DISTINCT (key, user) partials, one hash-bucketed reduce keyed on the
    pair (each pair lands in exactly one bucket, so per-bucket counts
    are partials over disjoint user sets), driver folds O(keys×buckets)
    count rows."""
    from .agg import bucketed_combine
    from .io import read_table

    cols = ["ts", "user_id"] if key == "hour" else [key, "user_id"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if key == "hour":
            df = pd.DataFrame(
                {"hour": df["ts"].dt.floor("h"), "user_id": df["user_id"]}
            )
        return df[[key, "user_id"]].drop_duplicates()

    ds = read_table(sf_dir, "events", cols).map_batches(
        partial, batch_format="pandas"
    )
    out = (
        bucketed_combine(
            ds,
            [key, "user_id"],
            lambda df: df.drop_duplicates().groupby(key, as_index=False).agg(
                n=("user_id", "size")
            ),
        )
        .to_pandas()
        .groupby(key, as_index=False)["n"]
        .sum()
    )
    out["n"] = out["n"].astype("int64")
    return out


def approx_users_check(
    sf_dir: str, p: int = 12, tol_rel: float = 0.05, tol_abs: int = 3
) -> pd.DataFrame:
    """event_type, exact_users, within_tol — the machine-checked HLL
    error bound: the engine computes the HLL estimate AND the exact
    distributed distinct count, and emits whether
    |approx − exact| ≤ max(tol_abs, ⌈tol_rel·exact⌉).  The DuckDB
    oracle recomputes exact_users and states ``within_tol = true``, so
    both the distributed exact-distinct reduce and the sketch's error
    envelope are driver-verified values, not just tested claims."""
    est = approx_distinct_users(sf_dir, p)
    exact = _exact_distinct_users(sf_dir, "event_type")
    j = exact.merge(est, on="event_type")
    ok = (j["approx_distinct"] - j["n"]).abs() <= np.maximum(
        tol_abs, np.ceil(tol_rel * j["n"])
    )
    out = pd.DataFrame(
        {
            "event_type": j["event_type"],
            "exact_users": j["n"].astype("int64"),
            "within_tol": ok.astype(bool),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def approx_hourly_users_check(
    sf_dir: str, p: int = 12, tol_rel: float = 0.05, tol_abs: int = 3
) -> pd.DataFrame:
    """hour, exact_users, within_tol — hourly twin of
    :func:`approx_users_check` (time-windowed sketch vs the exact
    windowed distinct)."""
    est = approx_hourly_users(sf_dir, p)
    exact = _exact_distinct_users(sf_dir, "hour")
    j = exact.merge(est, on="hour")
    ok = (j["approx_distinct"] - j["n"]).abs() <= np.maximum(
        tol_abs, np.ceil(tol_rel * j["n"])
    )
    out = pd.DataFrame(
        {
            "hour": j["hour"],
            "exact_users": j["n"].astype("int64"),
            "within_tol": ok.astype(bool),
        }
    )
    return out.sort_values("hour").reset_index(drop=True)


def approx_distinct_users(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """event_type, approx_distinct — HLL-approximate distinct users per
    event type.  Per-batch register partials (≤ types × 2^p tiny int
    rows per batch) merge by max in ONE low-cardinality groupby; no
    (type, user) pair ever crosses the shuffle.  Deterministic;
    relative error ~1.6% at p=12 (asserted against the exact count in
    tests)."""
    from .io import read_table

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        part = hll_partial(
            df["event_type"].to_numpy(), df["user_id"].to_numpy(), p
        )
        return part.rename(columns={"key": "event_type"})

    ds = read_table(sf_dir, "events", ["event_type", "user_id"]).map_batches(
        partial, batch_format="pandas"
    )
    merged = _merge_registers(ds, "event_type")
    est = hll_estimate(merged, p).rename(columns={"key": "event_type"})
    return est.sort_values("event_type").reset_index(drop=True)
