"""Shared column-pruned table reader for the operator suite.

The driver's testdata parquet files hold a single row group each, and
Ray Data's parquet reader splits at row-group granularity — so a naive
``read_parquet`` yields ONE block and every downstream ``map_batches``
stage runs on one worker.  ``read_table`` repartitions right after the
read so stages fan out.  (At production scale inputs arrive as many
files / row groups and the repartition becomes a no-op knob.)
"""

from __future__ import annotations

import ray


def read_table(sf_dir: str, name: str, columns: list[str],
               blocks: int = 32) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        f"{sf_dir}/{name}.parquet", columns=columns
    )
    n = ds.count()
    n_blocks = max(1, min(blocks, n // 2000 + 1))
    if n_blocks > 1:
        # materialize the repartition as its own (cheap, column-pruned)
        # job: keeping an AllToAll operator inside a pipeline that also
        # runs actor pools and an 8-partition join deadlocks on a
        # 4-CPU cluster (operators' minimum resource demands exceed the
        # budget); from a MaterializedDataset the downstream pipeline
        # starts with ready blocks
        ds = (
            ray.data.read_parquet(
                f"{sf_dir}/{name}.parquet", columns=columns
            )
            .repartition(n_blocks)
            .materialize()
        )
    return ds
