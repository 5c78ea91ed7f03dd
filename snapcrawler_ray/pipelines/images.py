"""Image-task pipeline (rebuild of the FilteringModule consumer,
filtering_module.py:89-182): emissions → download+filter → global pHash
dedup → accepted sink.

Global dedup (F7) is a shuffle: ``groupby('phash').min('emit_seq')``
gives the first-emission winner per hash — exactly the reference's
"first arrival claims the hash" set semantics, since emit_seq is the
queue-arrival order (SURVEY.md §2.3 F7).  Every F1–F6 survivor claims
its hash even if watermark later rejects it (the reference adds to
``image_hashes`` before the watermark check, filtering_module.py:335-350),
so dup losers report reason 'dup' and non-winning watermark rejects
stay 'watermark'.

A ``SeenFilterPool`` (ns='phash') carries claims across pipeline
invocations (cross-round dedup, strictly stronger than the reference's
per-process set — SURVEY.md §2.4 T4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import ImageFilterConfig
from ..stages.image_stage import ImageFetchFilter, MaterializeAccepted
from ..state.seen import SeenFilterPool


def _byte_budget_keep(
    accepted: "ray.data.Dataset", max_bytes: int, chain_mode: str,
    n_buckets: int = 256,
) -> tuple[int | None, np.ndarray]:
    """Which accepted emissions the folder-byte cap keeps, per the
    ``chain_mode``-selected reference semantics.  Returns
    ``(prefix_end, tail_keep)``: keep every row with emit_seq ≤
    prefix_end plus the explicit emit_seqs in tail_keep (prefix_end
    None ⇒ prefix empty).

    - ``'parallel'`` (filtering_module.py:126-128): the consumer loop
      breaks when ``current >= cap``, checked AFTER each save — the
      crossing image IS saved.  Keep = shortest prefix whose byte sum
      reaches the cap, crossing image included; tail_keep empty.
    - ``'scrapy'`` (pipelines.py:300): an image is dropped iff
      ``spent + size > cap`` but processing CONTINUES, so later smaller
      images can still be accepted.  Keep = greedy fold in emit_seq
      order — a pure prefix up to the first drop (found distributed),
      then a driver-side greedy over the remaining (emit_seq,
      size_bytes) pairs.  The driver scan is O(rows past the first
      drop) over two int64 columns — the honest cost of the reference's
      inherently serial rule; at scale the cap is per output folder
      (partition), which bounds the tail.

    Both modes are deterministic prefix-sum reductions, never a shared
    grant-order counter: per-bucket byte sums fold to the driver
    (O(n_buckets) rows), the boundary bucket is refined exactly, and
    everything before it stays distributed."""
    import pandas as pd

    empty = np.empty(0, dtype=np.int64)

    def rng_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"lo": pd.Series([], dtype="int64"),
                                 "hi": pd.Series([], dtype="int64")})
        return pd.DataFrame({"lo": [df["emit_seq"].min()],
                             "hi": [df["emit_seq"].max()]})

    rng = accepted.map_batches(rng_partial, batch_format="pandas").to_pandas()
    if rng.empty:
        return None, empty
    lo, hi = int(rng["lo"].min()), int(rng["hi"].max())
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"b": (df["emit_seq"] - lo) // width, "sz": df["size_bytes"]}
        ).groupby("b", as_index=False).sum()

    sums = (
        accepted.map_batches(bucket_sums, batch_format="pandas")
        .to_pandas()
        .groupby("b", as_index=False)
        .sum()
        .sort_values("b")
        .reset_index(drop=True)
    )
    cum = sums["sz"].cumsum()
    # first bucket where the fold's behavior can deviate from
    # keep-everything: parallel stops at cum >= cap, scrapy first
    # drops at cum > cap
    over = (
        (cum >= max_bytes) if chain_mode == "parallel" else (cum > max_bytes)
    ).to_numpy()
    if not over.any():
        return hi, empty
    i = int(np.argmax(over))
    b_star = int(sums["b"].iloc[i])
    spent_before = int(cum.iloc[i - 1]) if i > 0 else 0
    blo = lo + b_star * width
    bhi = lo + (b_star + 1) * width

    def tail_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = (
            (df["emit_seq"] >= blo) & (df["emit_seq"] < bhi)
            if chain_mode == "parallel"
            else (df["emit_seq"] >= blo)
        )
        return df.loc[m, ["emit_seq", "size_bytes"]]

    rows = (
        accepted.map_batches(tail_rows, batch_format="pandas")
        .to_pandas()
        .sort_values("emit_seq")
    )
    seqs = rows["emit_seq"].to_numpy(np.int64)
    sizes = rows["size_bytes"].to_numpy(np.int64)
    prefix_end = blo - 1 if b_star > 0 else None
    if chain_mode == "parallel":
        # save while current < cap entering the save; the save that
        # crosses is the last one kept
        prev_cum = spent_before + np.cumsum(sizes) - sizes
        fit = prev_cum < max_bytes
        if fit.any():
            return int(seqs[fit][-1]), empty
        return prefix_end, empty
    # scrapy: greedy skip-and-continue over the tail
    spent = spent_before
    keep: list[int] = []
    for s, z in zip(seqs.tolist(), sizes.tolist()):
        if spent + z <= max_bytes:
            keep.append(s)
            spent += z
    return prefix_end, np.asarray(keep, dtype=np.int64)


def run_image_pipeline(
    emissions: pa.Table,
    cfg: ImageFilterConfig,
    out_dir: str | None = None,
    seen: SeenFilterPool | None = None,
    concurrency=(1, 8),
    batch_size: int = 64,
    max_images: int = 0,
    max_bytes: int = 0,
    predup_oracle_dir: str | None = None,
) -> "ray.data.Dataset":
    """Returns the full per-image verdict Dataset (one row per emission,
    with ``reason`` '' = accepted).  If ``out_dir`` is set, accepted
    rows (with regenerated bytes) are written there as Parquet.

    ``predup_oracle_dir``: write the PRE-dedup per-image table under
    ``image_predup/`` there (a distributed ``Dataset.write_parquet`` —
    the dump is O(total emissions) and must never fold onto the
    driver), so an external SQL oracle can independently re-derive the
    distributed F7 decision (min-emit_seq winner per phash over every
    phash≠0 row, losers — including post-phash watermark rejects —
    re-marked 'dup') and compare it to this pipeline's bucketed-reduce
    + join implementation."""
    # from_arrow yields ONE block; split it so the stage actually fans
    # out (block count bounds task parallelism in Ray Data)
    n_blocks = max(1, min(emissions.num_rows // batch_size + 1, 256))
    ds = ray.data.from_arrow(emissions).repartition(n_blocks)
    # task pool, not actor pool: the synth-download + filter chain holds
    # no per-worker state (a real HTTP downloader with sessions would be
    # the actor-pool variant, ImageFetchFilter used with concurrency=N)
    stage = ImageFetchFilter(cfg)
    meta = ds.map_batches(
        stage.filter_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()

    if predup_oracle_dir is not None:
        import os
        import shutil

        out = os.path.join(predup_oracle_dir, "image_predup")
        shutil.rmtree(out, ignore_errors=True)  # no stale mix across runs
        os.makedirs(out, exist_ok=True)
        meta.write_parquet(out)

    if cfg.deduplication:
        import pandas as pd
        import pyarrow.compute as pc

        # shuffle key is the *int64 two's-complement view* of the uint64
        # phash: Ray's hash-shuffle groupby/join pickles uint64 group
        # keys above the int64 range into object-extension columns,
        # which then can't join against a plain uint64 column.  The view
        # is a bijection so winner selection is unchanged.
        def to_claims(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.not_equal(b.column("phash"), pa.scalar(0, pa.uint64()))
            )
            key = b.column("phash").to_numpy(zero_copy_only=False).view(np.int64)
            return pa.table(
                {"phash_i": pa.array(key), "emit_seq": b.column("emit_seq")}
            )

        claims = meta.map_batches(
            to_claims, batch_format="pyarrow", batch_size=4096
        )
        # winner (first emission) per hash, selected in a hash-bucketed
        # reduce (bucketed_combine: Ray's own groupby.aggregate pays
        # per-group python — prohibitive at one group per distinct
        # image) — the winner table is O(distinct hashes) and never
        # touches the driver: the seen-pool filter runs inside
        # map_batches (shard actors are reachable from any worker) and
        # dup marking is a hash join against the materialized meta.
        from ..functions.agg import bucketed_combine

        winners = bucketed_combine(
            claims,
            ["phash_i"],
            lambda df: df.groupby("phash_i", as_index=False).agg(
                winner_seq=("emit_seq", "min")
            ),
        )
        if seen is not None:
            # cross-invocation claims: a hash already claimed in an
            # earlier round keeps its original winner (each hash appears
            # exactly once post-groupby, so presentation order across
            # batches cannot change the outcome)
            def fresh_only(df: pd.DataFrame) -> pd.DataFrame:
                fresh = seen.check_and_add(
                    df["phash_i"].to_numpy(np.int64).view(np.uint64),
                    ns="phash",
                )
                return df[fresh]

            winners = winners.map_batches(fresh_only, batch_format="pandas")
            # the pin is a CORRECTNESS guard here, not a perf choice:
            # check_and_add mutates the seen pool, so the winners
            # lineage must execute exactly once — any downstream
            # re-execution (sort/limit/byte-cap passes re-pulling the
            # join) would re-filter against an already-updated pool and
            # mark everything dup
            winners = winners.materialize()
            n_join = winners.count()  # free on a materialized set
        else:
            # stateless claims are idempotent — let winners stream into
            # the join (no extra pin/pass); size the join from the
            # already-materialized meta's free count, an upper bound on
            # the unique-hash population (VERDICT r4 #6)
            n_join = meta.count()

        def add_key(b: pa.Table) -> pa.Table:
            key = b.column("phash").to_numpy(zero_copy_only=False).view(np.int64)
            return b.append_column("phash_i", pa.array(key))

        def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
            w = df["winner_seq"]
            dup = (df["phash_i"] != 0) & (w.isna() | (w != df["emit_seq"]))
            df = df.drop(columns=["winner_seq", "phash_i"])
            df.loc[dup, "reason"] = "dup"
            return df

        from ..functions.io import join_partitions

        meta = meta.map_batches(
            add_key, batch_format="pyarrow", batch_size=4096
        ).join(
            winners,
            join_type="left_outer",
            num_partitions=join_partitions(n_join),
            on=("phash_i",),
        ).map_batches(mark_dups, batch_format="pandas")
        if seen is None:
            # one reduce+join execution total: the verdicts feed BOTH
            # the accepted chain and the returned Dataset, and with
            # winners streaming (unpinned) each downstream consumer
            # would otherwise re-run the whole claims→reduce→join.
            # O(emissions) scalar rows — the same class as the pre-dedup
            # meta pinned above
            meta = meta.materialize()

    import pyarrow.compute as pc

    accepted = meta.map_batches(
        lambda b: b.filter(pc.equal(b.column("reason"), "")),
        batch_format="pyarrow",
        batch_size=4096,
    )
    if max_images > 0:
        accepted = accepted.sort("emit_seq").limit(max_images)
    if max_bytes > 0:
        # pin the accepted set: the cutoff makes three passes and the
        # sink a fourth — without this each pass re-runs the dedup join
        accepted = accepted.materialize()
        prefix_end, tail_keep = _byte_budget_keep(
            accepted, max_bytes, cfg.chain_mode
        )
        if prefix_end is None and not len(tail_keep):
            accepted = accepted.limit(0)
        else:
            _pfx = -1 if prefix_end is None else prefix_end

            def budget_filter(b: pa.Table) -> pa.Table:
                seq = b.column("emit_seq").to_numpy(zero_copy_only=False)
                m = seq <= _pfx
                if len(tail_keep):
                    m |= np.isin(seq, tail_keep)
                return b.filter(pa.array(m))

            accepted = accepted.map_batches(
                budget_filter, batch_format="pyarrow", batch_size=4096
            )
    if out_dir is not None:
        # resumable sink: emit_seq-hash partition dirs + _SUCCESS
        # markers, so a re-run after a partial failure skips finished
        # partitions instead of rewriting one giant output.  The
        # markers carry a config fingerprint — resuming with different
        # filters/limits invalidates finished partitions instead of
        # silently keeping the previous run's rows (ADVICE-r3).
        import hashlib
        from dataclasses import asdict

        from ..functions.sink import write_partitioned

        run_tag = hashlib.md5(
            repr((sorted(asdict(cfg).items()), max_images, max_bytes)).encode()
        ).hexdigest()
        write_partitioned(
            accepted.map_batches(
                MaterializeAccepted().__call__,
                batch_format="pyarrow",
                batch_size=batch_size,
            ),
            out_dir,
            "emit_seq",
            n_parts=16,
            run_tag=run_tag,
        )
    return meta
