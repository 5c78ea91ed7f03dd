"""Resumable partitioned Parquet sink.

A 100-TB job's output must be restartable: one directory per key-hash
partition (hive layout ``_part=K/``), a ``_SUCCESS`` marker written
after a partition's files land, and a re-run that (a) removes
partition dirs left unmarked by a crash and (b) filters already-marked
partitions out of the stream *before* any work happens — so a resumed
run pays only for the missing key ranges, never one giant file.

The partition key is ``pandas.util.hash_pandas_object`` over the key
column (deterministic fixed-key SipHash — same routing on every run
and node, same function ``agg.bucketed_combine`` shuffles by).
Markers live on the output filesystem, so on shared storage any node
can resume the job.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import ray

_PART = "_part"


def _done_parts(out_dir: str, run_tag: str) -> set[int]:
    """Partitions whose _SUCCESS marker exists AND carries the current
    run tag.  A marker from a run with a different config counts as
    stale, not done — otherwise a re-run into the same out dir with a
    changed config would silently keep the previous run's rows."""
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for d in os.listdir(out_dir):
        marker = os.path.join(out_dir, d, "_SUCCESS")
        if d.startswith(f"{_PART}=") and os.path.exists(marker):
            with open(marker) as f:
                if f.read() == run_tag:
                    done.add(int(d.split("=", 1)[1]))
    return done


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_col: str,
    n_parts: int = 32,
    run_tag: str = "",
) -> dict:
    """Write ``ds`` under ``out_dir/_part=K/`` and return
    ``{"written": [...], "skipped": [...]}`` partition ids.

    Re-running after a partial failure skips every partition whose
    ``_SUCCESS`` marker exists and rewrites the rest (partial dirs
    without a marker are removed first — a crashed writer may have
    left some of their files).  ``run_tag`` (e.g. a config hash) is
    stamped into the markers: a resume with a DIFFERENT tag treats
    previously-finished partitions as stale and rewrites them, so a
    changed filter config can never leave a stale mix in the output."""
    done = _done_parts(out_dir, run_tag)
    if os.path.isdir(out_dir):
        for d in os.listdir(out_dir):
            if d.startswith(f"{_PART}=") and int(d.split("=", 1)[1]) not in done:
                shutil.rmtree(os.path.join(out_dir, d))

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[[key_col]], index=False).to_numpy()
        df = df.copy()
        df[_PART] = (h % np.uint64(n_parts)).astype(np.int64)
        # the resume filter: finished partitions drop out before any
        # downstream work or IO
        return df[~df[_PART].isin(list(done))] if done else df

    pending = ds.map_batches(add_part, batch_format="pandas").materialize()
    written: list[int] = []
    if pending.count() > 0:
        pending.write_parquet(out_dir, partition_cols=[_PART])
        for d in os.listdir(out_dir):
            if d.startswith(f"{_PART}="):
                k = int(d.split("=", 1)[1])
                if k not in done:
                    with open(os.path.join(out_dir, d, "_SUCCESS"), "w") as f:
                        f.write(run_tag)
                    written.append(k)
    return {"written": sorted(written), "skipped": sorted(done)}


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Read back a ``write_partitioned`` output (drops the key column)."""
    ds = ray.data.read_parquet(out_dir, file_extensions=["parquet"])
    return ds.map_batches(
        lambda df: df.drop(columns=[_PART], errors="ignore"),
        batch_format="pandas",
    )
