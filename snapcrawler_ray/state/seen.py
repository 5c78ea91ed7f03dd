"""Sharded URL-seen membership service (the rebuild of T2/T3/T4).

The reference keeps URL-seen in a ``multiprocessing.Manager().dict``
shared between two processes (parallel_manager.py:51,
crawling_module.py:92-152); page-MD5 and pHash sets are plain
process-local sets.  Here all three become **one actor-pool service**:
N shard actors, key routed by ``url_hash64(key) % shards``, each shard
holding either an exact Python-set (verification mode — byte-exact
parity with the reference's membership semantics) or a Bloom filter
(scale mode, ~12 bits/key for 10^10 keys sharded across the cluster).

Callers batch keys per RPC (`check_and_add`) — one round trip per
(batch × shard), never per key.  Shard contents are checkpointed per
crawl round; the shard count is recorded in the checkpoint manifest so
the ``url_hash → shard`` map survives resume (SURVEY.md §7.5).
"""

from __future__ import annotations

import pickle

import numpy as np
import ray

from ..hashing import url_hash64
from .bloom import BloomFilter


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard. Namespaces keep url-seen / page-md5 / phash separate
    inside the same pool."""

    def __init__(self, mode: str = "exact", bloom_capacity: int = 1_000_000,
                 bloom_bits_per_key: int = 12, window_generations: int = 4):
        self.mode = mode
        self._window_generations = window_generations
        # exact mode: per-namespace sorted uint64 base array + a small
        # list of pending (unique, base-disjoint) delta arrays.  Lookups
        # are searchsorted on the base + np.isin on the concatenated
        # delta — no per-key Python loop; the delta merges into the base
        # (one sort) when it outgrows max(64k, len(base)/4), so merge
        # cost amortizes to O(log) sorts over the shard's lifetime.
        self._exact: dict[str, dict] = {}
        self._blooms: dict[str, BloomFilter] = {}
        self._bloom_capacity = bloom_capacity
        self._bloom_bits = bloom_bits_per_key

    def _ns_exact(self, ns: str) -> dict:
        st = self._exact.get(ns)
        if st is None:
            st = self._exact[ns] = {
                "base": np.empty(0, dtype=np.uint64),
                "pending": [],
                "n_pending": 0,
            }
        return st

    def _exact_contains(self, st: dict, keys: np.ndarray) -> np.ndarray:
        base = st["base"]
        seen = np.zeros(len(keys), dtype=bool)
        if len(base):
            pos = np.searchsorted(base, keys)
            inb = pos < len(base)
            seen[inb] = base[pos[inb]] == keys[inb]
        if st["n_pending"]:
            seen |= np.isin(keys, np.concatenate(st["pending"]))
        return seen

    def _exact_absorb(self, st: dict, new_keys: np.ndarray) -> None:
        """``new_keys`` must be unique and disjoint from the state."""
        if not len(new_keys):
            return
        st["pending"].append(new_keys)
        st["n_pending"] += len(new_keys)
        if st["n_pending"] > max(65536, len(st["base"]) >> 2):
            st["base"] = np.sort(
                np.concatenate([st["base"], *st["pending"]])
            )
            st["pending"], st["n_pending"] = [], 0

    def _ns_bloom(self, ns: str):
        """Per-namespace approximate filter: Bloom (default scale mode)
        or cuckoo (deletable, denser at equal fpp) per ``self.mode``."""
        if ns not in self._blooms:
            if self.mode == "cuckoo":
                from .cuckoo import CuckooFilter

                self._blooms[ns] = CuckooFilter(self._bloom_capacity)
            elif self.mode == "windowed_cuckoo":
                from .cuckoo import WindowedCuckoo

                self._blooms[ns] = WindowedCuckoo(
                    self._bloom_capacity, self._window_generations
                )
            else:
                self._blooms[ns] = BloomFilter(
                    self._bloom_capacity, self._bloom_bits
                )
        return self._blooms[ns]

    def check_and_add(self, ns: str, keys: np.ndarray) -> np.ndarray:
        """Boolean mask: True where the key was new (first presentation).
        In-batch duplicates follow first-wins: only the first occurrence
        of a new key reports True."""
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, first_idx = np.unique(keys, return_index=True)
        if self.mode != "exact":
            # dedupe BEFORE the filter: the filters' batch
            # check_and_add is contains-then-add, so without this an
            # in-batch duplicate pair would BOTH report new — the
            # first-wins contract above (and reference MD5-dedup
            # semantics, crawling_module.py:227-234) would silently
            # break in every non-exact mode (caught in r5 as a +10
            # emission drift between exact and bloom at 1M pages)
            new_u = self._ns_bloom(ns).check_and_add(uniq)
        else:
            st = self._ns_exact(ns)
            new_u = ~self._exact_contains(st, uniq)
            self._exact_absorb(st, uniq[new_u])
        out = np.zeros(len(keys), dtype=bool)
        out[first_idx[new_u]] = True
        return out

    def add(self, ns: str, keys: np.ndarray) -> int:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.mode != "exact":
            self._ns_bloom(ns).add(keys)
        else:
            st = self._ns_exact(ns)
            uniq = np.unique(keys)
            self._exact_absorb(st, uniq[~self._exact_contains(st, uniq)])
        return len(keys)

    def contains(self, ns: str, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.mode != "exact":
            return self._ns_bloom(ns).contains(keys)
        return self._exact_contains(self._ns_exact(ns), keys)

    def count(self, ns: str) -> int:
        if self.mode != "exact":
            return self._ns_bloom(ns).approx_count if ns in self._blooms else 0
        st = self._exact.get(ns)
        return (len(st["base"]) + st["n_pending"]) if st else 0

    def rotate(self) -> None:
        """Advance every namespace's sliding window one step (no-op
        outside windowed_cuckoo mode)."""
        if self.mode == "windowed_cuckoo":
            for wc in self._blooms.values():
                wc.rotate()

    def dump(self) -> bytes:
        if self.mode != "exact":
            payload = {ns: bf.dump() for ns, bf in self._blooms.items()}
        else:
            payload = {
                ns: np.sort(np.concatenate([st["base"], *st["pending"]]))
                if st["n_pending"] else st["base"]
                for ns, st in self._exact.items()
            }
        return pickle.dumps({"mode": self.mode, "payload": payload})

    def load(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.mode = d["mode"]
        if self.mode != "exact":
            from .cuckoo import CuckooFilter, WindowedCuckoo

            def _load_one(b):
                if isinstance(b, dict) and b.get("kind") == "windowed_cuckoo":
                    return WindowedCuckoo.load(b)
                if isinstance(b, dict) and b.get("kind") == "cuckoo":
                    return CuckooFilter.load(b)
                return BloomFilter.load(b)

            self._blooms = {
                ns: _load_one(b) for ns, b in d["payload"].items()
            }
        else:
            self._exact = {}
            for ns, v in d["payload"].items():
                if isinstance(v, set):  # pre-vectorization checkpoint
                    v = np.sort(np.fromiter(v, dtype=np.uint64, count=len(v)))
                self._exact[ns] = {
                    "base": np.asarray(v, dtype=np.uint64),
                    "pending": [],
                    "n_pending": 0,
                }


class SeenFilterPool:
    """Driver/stage-side handle over the shard actors.

    Routing is by ``url_hash64 % shards`` for string keys (or
    ``key % shards`` for precomputed uint64 keys), so the same key
    always lands on the same shard regardless of which task calls."""

    def __init__(self, n_shards: int = 8, mode: str = "exact",
                 bloom_capacity: int = 1_000_000, bloom_bits_per_key: int = 12,
                 window_generations: int = 4):
        self.n_shards = n_shards
        self.mode = mode
        self.shards = [
            SeenShard.remote(mode, bloom_capacity, bloom_bits_per_key,
                             window_generations)
            for _ in range(n_shards)
        ]

    def rotate(self) -> None:
        """Advance the sliding window on every shard (windowed_cuckoo
        mode; no-op otherwise) — the recrawl-scheduling step."""
        ray.get([s.rotate.remote() for s in self.shards])

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (keys % np.uint64(self.n_shards)).astype(np.int64)

    def _as_hashes(self, keys) -> np.ndarray:
        arr = np.asarray(keys)
        if arr.dtype == np.uint64:
            return arr
        return url_hash64(arr)

    def check_and_add(self, keys, ns: str = "url") -> np.ndarray:
        """Vector first-seen mask, preserving input order.

        Keys are hashed, grouped per shard, checked with one RPC per
        shard (parallel), and the masks are scattered back."""
        hashes = self._as_hashes(keys)
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        shard_of = self._route(hashes)
        out = np.empty(n, dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                refs.append(self.shards[s].check_and_add.remote(ns, hashes[idx]))
                idxs.append(idx)
        for idx, mask in zip(idxs, ray.get(refs)):
            out[idx] = mask
        return out

    def add(self, keys, ns: str = "url") -> None:
        hashes = self._as_hashes(keys)
        if len(hashes) == 0:
            return
        shard_of = self._route(hashes)
        ray.get(
            [
                self.shards[s].add.remote(ns, hashes[shard_of == s])
                for s in range(self.n_shards)
                if (shard_of == s).any()
            ]
        )

    def contains(self, keys, ns: str = "url") -> np.ndarray:
        hashes = self._as_hashes(keys)
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        shard_of = self._route(hashes)
        out = np.empty(n, dtype=bool)
        refs, idxs = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                refs.append(self.shards[s].contains.remote(ns, hashes[idx]))
                idxs.append(idx)
        for idx, mask in zip(idxs, ray.get(refs)):
            out[idx] = mask
        return out

    def count(self, ns: str = "url") -> int:
        return int(sum(ray.get([s.count.remote(ns) for s in self.shards])))

    def dump_all(self) -> list[bytes]:
        return ray.get([s.dump.remote() for s in self.shards])

    def load_all(self, blobs: list[bytes]) -> None:
        if len(blobs) != self.n_shards:
            raise ValueError(
                f"checkpoint has {len(blobs)} shards, pool has {self.n_shards}; "
                "the url_hash→shard map must be preserved across resume"
            )
        ray.get([s.load.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
