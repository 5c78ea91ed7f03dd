"""Shared column-pruned table reader for the operator suite.

The driver's testdata parquet files hold a single row group each, and
Ray Data's parquet reader splits read *tasks* at row-group granularity —
so a naive ``read_parquet`` yields ONE block and every downstream
``map_batches`` stage runs on one worker.  ``read_table`` passes
``override_num_blocks`` so the read output is split into N blocks
(Ray's dynamic block splitting slices the decoded table after the scan)
and stages fan out.  The row count that sizes the split comes from the
Parquet footer metadata — no data is scanned to decide the block count,
and the table is read exactly once, lazily.  (At production scale
inputs arrive as many files / row groups and the override becomes a
no-op knob.)
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray


def read_table(sf_dir: str, name: str, columns: list[str],
               blocks: int = 32,
               rows_per_block: int = 2000) -> "ray.data.Dataset":
    """``rows_per_block`` tunes the block split for the stage's per-row
    cost: CPU-heavy kernels (SimHash, shingling) pass a smaller value
    so the map stage fans out across cores even on small tables."""
    path = f"{sf_dir}/{name}.parquet"
    n = pq.read_metadata(path).num_rows  # footer only — no scan
    n_blocks = max(1, min(blocks, n // rows_per_block + 1))
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=n_blocks
    )


def join_partitions(*n_rows: int | None, rows_per_partition: int = 250_000,
                    lo: int = 8, hi: int = 512) -> int:
    """Hash-join partition count sized to the LARGER input:
    ~``rows_per_partition`` rows per partition, floored at ``lo`` (the
    single-node tuning today's benches run at) and capped at ``hi``.
    Replaces the r3-era fixed ``num_partitions=8``, which is correct at
    sf0.1 but starves a 100× input (VERDICT r3 §What's wrong 3): at
    60M fact rows this yields 241 partitions instead of 8."""
    n = max([r for r in n_rows if r] + [0])
    return max(lo, min(hi, n // rows_per_partition + 1))


def dir_rows(path: str) -> int:
    """Total row count of every ``*.parquet`` under ``path`` — footer
    metadata only, no data scan."""
    import glob as _glob

    return sum(
        pq.read_metadata(f).num_rows
        for f in _glob.glob(f"{path}/**/*.parquet", recursive=True)
    )


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from the Parquet footer — no scan.  Used to pick join
    topology (broadcast vs partitioned hash join) without executing the
    dimension pipeline just to size it."""
    return pq.read_metadata(f"{sf_dir}/{name}.parquet").num_rows
