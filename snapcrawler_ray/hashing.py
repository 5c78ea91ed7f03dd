"""Stable hashing used across the engine.

- ``url_hash64``: vectorized, process-stable 64-bit hash of URL strings
  (pandas' fixed-key SipHash via ``pandas.util.hash_array``). Partition
  key for seen-filter sharding, corpus bucketing and fetch joins
  (SURVEY.md §7.4).
- ``md5_hex``: exact content hash (reference crawling_module.py:228).
- ``fnv1a64``: scalar fallback, also used for deterministic synthetic
  data generation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1a64(s: str | bytes) -> int:
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = _FNV_OFFSET
    for b in s:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def url_hash64(urls) -> np.ndarray:
    """uint64 hash array for a sequence/array of strings.

    ``pandas.util.hash_array`` uses SipHash-1-3 with a fixed key, so the
    value is stable across processes and nodes — a requirement for the
    ``url_hash → shard`` map surviving checkpoint/resume (SURVEY.md
    §7.5 'Seen-state at 10^10')."""
    arr = np.asarray(urls, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def md5_hex(data: str | bytes) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.md5(data).hexdigest()
