"""Cuckoo filter — the deletable alternative to the Bloom seen-filter
(the north rule names "sharded Bloom/cuckoo filter" as the URL-seen
structure; SURVEY.md §2.4 T2).

Standard (bucketized) cuckoo filter [Fan et al., CoNLL'14 public
design]: 4-slot buckets of nonzero uint16 fingerprints, partial-key
cuckoo hashing (i2 = i1 XOR hash(fp)), bounded eviction chains.  At 4
slots × 16-bit fingerprints and 95% load it spends ~16.8 bits/key for
~2.4e-4 fpp — denser than a Bloom at equal fpp, supports deletion
(cross-round un-claiming of pHashes), and lookups touch exactly two
cache lines.

Lookups/membership are fully vectorized (two gathers over the table);
inserts run per NEW key (the eviction chain is inherently sequential)
— at seen-filter call sites every key inserts at most once, so the
amortized per-URL insert cost is one small Python loop iteration on
its owning shard.
"""

from __future__ import annotations

import numpy as np


def _fp_hash(fp: np.ndarray) -> np.ndarray:
    """uint64 avalanche of a uint16 fingerprint (for i2 = i1 ^ h(fp))."""
    h = fp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return h


class CuckooFilter:
    BUCKET = 4

    def __init__(self, capacity: int, max_kicks: int = 500,
                 delete_safe: bool = False):
        """``delete_safe``: standard multiset insertion — add() inserts
        a fingerprint copy even when contains() is already true, so a
        later delete() of a colliding key can never turn a still-live
        key into a false negative (the reason standard cuckoo filters
        insert unconditionally).  Copies of one key SATURATE at
        2×BUCKET = 8: a fingerprint's candidate buckets are exactly
        {i1, i2} (the partial-key XOR is an involution), so the table
        physically cannot hold a 9th copy — inserts beyond 8 are
        dropped (Fan et al. §3's kb duplicate bound), meaning delete()
        streams of >8 occurrences of ONE key may false-negative past
        the 8th.  The default (False) is the SEEN-FILTER mode: keys
        insert at most once (callers drop keys the filter reports
        seen, so re-presentation must not accrete copies across
        rounds), and delete() is refused because a fingerprint+bucket
        collision (~fpp ≈ 2.4e-4) would break the no-false-negative
        invariant un-claiming relies on."""
        n_buckets = 1
        while n_buckets * self.BUCKET < int(capacity / 0.95):
            n_buckets <<= 1
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, self.BUCKET), dtype=np.uint16)
        self.max_kicks = int(max_kicks)
        self.delete_safe = bool(delete_safe)
        self.approx_count = 0
        self._rng = np.random.RandomState(0xC0C0)  # deterministic kicks

    # ---------------- key → (fp, i1, i2) ----------------

    def _parts(self, keys: np.ndarray):
        keys = np.asarray(keys, dtype=np.uint64)
        # avalanche first: fp/i1 come from different bit ranges of the
        # same word, so non-uniform caller keys (small ints) must not
        # collapse every fingerprint onto one value
        h = keys * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(29)
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slots
        i1 = (h & self.mask).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ _fp_hash(fp)) & self.mask).astype(
            np.int64
        )
        return fp, i1, i2

    # ---------------- vectorized membership ----------------

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._parts(keys)
        f = fp[:, None]
        return ((self.table[i1] == f) | (self.table[i2] == f)).any(axis=1)

    # ---------------- sequential insert (eviction chain) ----------------

    def _insert_one(self, fp: int, i1: int, i2: int) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        # evict: random walk bounded by max_kicks
        idx = i1 if self._rng.randint(2) else i2
        cur = np.uint16(fp)
        for _ in range(self.max_kicks):
            slot = self._rng.randint(self.BUCKET)
            cur, self.table[idx, slot] = self.table[idx, slot], cur
            idx = int(
                (np.uint64(idx) ^ _fp_hash(np.array([cur]))[0]) & self.mask
            )
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return
        raise RuntimeError(
            f"cuckoo filter full (capacity ~{self.n_buckets * self.BUCKET}); "
            "size shards for the keyspace"
        )

    def _insert_copy(self, fp: int, i1: int, i2: int) -> bool:
        """delete_safe insert of one occurrence: saturates at 2×BUCKET
        copies of a fingerprint (its only two possible buckets are
        full of itself — inserting would evict a twin into an endless
        bounce and spuriously report 'full').  Returns True when a
        copy was physically stored."""
        copies = int((self.table[i1] == fp).sum()) + int(
            (self.table[i2] == fp).sum()
        )
        if copies >= 2 * self.BUCKET:
            return False
        self._insert_one(fp, i1, i2)
        return True

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        keys = np.asarray(keys, dtype=np.uint64)
        if self.delete_safe:
            # multiset: EVERY presented occurrence inserts a copy —
            # including in-batch duplicates — so stored copy counts are
            # independent of how callers batch their adds and a
            # per-occurrence delete() stream can never underflow a
            # still-live occurrence into a false negative (saturating
            # at the physical 8-copies-per-key bound, see __init__)
            fp, i1, i2 = self._parts(keys)
            for j in range(len(fp)):
                if self._insert_copy(int(fp[j]), int(i1[j]), int(i2[j])):
                    self.approx_count += 1
            return
        # unique first: in seen-filter mode in-batch duplicates must
        # not insert multiple fingerprint copies (they would inflate
        # approx_count and waste slots toward a premature "full")
        keys = np.unique(keys)
        new = ~self.contains(keys)
        fp, i1, i2 = self._parts(keys[new])
        for j in range(len(fp)):
            self._insert_one(int(fp[j]), int(i1[j]), int(i2[j]))
        self.approx_count += int(new.sum())

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """True where the key was new; in-batch duplicates first-wins.
        In delete_safe mode EVERY occurrence (in-batch duplicates too)
        inserts a copy while the return value is unchanged — copy
        counts stay batching-independent (saturating at the physical
        8-copies-per-key bound), keeping later per-occurrence delete()
        sound."""
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, first_idx = np.unique(keys, return_index=True)
        new_u = ~self.contains(uniq)
        if self.delete_safe:
            fp, i1, i2 = self._parts(keys)
            for j in range(len(fp)):
                if self._insert_copy(int(fp[j]), int(i1[j]), int(i2[j])):
                    self.approx_count += 1
        else:
            ins = uniq[new_u]
            fp, i1, i2 = self._parts(ins)
            for j in range(len(fp)):
                self._insert_one(int(fp[j]), int(i1[j]), int(i2[j]))
            self.approx_count += len(ins)
        out = np.zeros(len(keys), dtype=bool)
        out[first_idx[new_u]] = True
        return out

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one stored fingerprint per present key; True where a
        fingerprint was found and removed (the capability Bloom lacks).
        Only sound in delete_safe mode: with insertion dedup a key whose
        fingerprint+buckets collided with an already-stored key was
        never physically inserted, and deleting the stored twin would
        make the skipped key a false negative."""
        if not self.delete_safe:
            raise RuntimeError(
                "delete() requires CuckooFilter(delete_safe=True): with "
                "insertion dedup, deleting a key whose fingerprint "
                "collided (~2.4e-4) with another would false-negative "
                "the survivor"
            )
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        fp, i1, i2 = self._parts(keys)
        for j in range(len(keys)):
            for idx in (i1[j], i2[j]):
                row = self.table[idx]
                hit = np.nonzero(row == fp[j])[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[j] = True
                    self.approx_count -= 1
                    break
        return out

    # ---------------- checkpointing ----------------

    def dump(self) -> dict:
        return {
            "kind": "cuckoo",
            "table": self.table.tobytes(),
            "n_buckets": self.n_buckets,
            "max_kicks": self.max_kicks,
            "delete_safe": self.delete_safe,
            "approx_count": self.approx_count,
            "rng": self._rng.get_state(),
        }

    @classmethod
    def load(cls, d: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = d["n_buckets"]
        cf.mask = np.uint64(cf.n_buckets - 1)
        cf.table = (
            np.frombuffer(d["table"], dtype=np.uint16)
            .reshape(cf.n_buckets, cls.BUCKET)
            .copy()
        )
        cf.max_kicks = d["max_kicks"]
        cf.delete_safe = bool(d.get("delete_safe", False))
        cf.approx_count = d["approx_count"]
        cf._rng = np.random.RandomState()
        cf._rng.set_state(d["rng"])
        return cf


class WindowedCuckoo:
    """Sliding-window membership over ``generations`` cuckoo filters —
    the recrawl-scheduling variant of the seen filter (a URL added G
    rotations ago stops being "seen" and becomes eligible again; the
    windowed-membership idea of the SIGMOD'23 sliding-window cuckoo
    line, realized with the plain generational ring that needs no
    learned component).

    Semantics (exact-reference property-tested in test_cuckoo.py):
      · ``add`` inserts into the CURRENT generation only;
      · ``contains`` is true iff ANY live generation holds the key
        (up to each filter's fpp — no false negatives);
      · ``rotate`` retires the oldest generation wholesale — O(1),
        no per-key deletion, which is the point: deleting expired keys
        individually would need per-key timestamps O(n) beyond the
        filter itself.

    Each generation sizes to ``capacity`` (the expected adds per
    window step), so memory is G × the single-filter footprint and
    rotation cost is constant."""

    def __init__(self, capacity: int, generations: int = 4,
                 max_kicks: int = 500):
        if generations < 1:
            raise ValueError("generations must be >= 1")
        self.capacity = capacity
        self.max_kicks = max_kicks
        self.gens = [CuckooFilter(capacity, max_kicks)]
        self.n_generations = generations
        self.rotations = 0

    def add(self, keys: np.ndarray) -> None:
        """Insert keys not already live ANYWHERE in the window — the
        same suppression rule as :meth:`check_and_add`, so a key's
        expiry schedule never depends on which API presented it (no
        silent lifetime refresh, no double counting)."""
        keys = np.asarray(keys, dtype=np.uint64)
        fresh = keys[~self.contains(keys)]
        if len(fresh):
            self.gens[-1].add(fresh)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        for g in self.gens:
            out |= g.contains(keys)
        return out

    @property
    def approx_count(self) -> int:
        return sum(g.approx_count for g in self.gens)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """True where the key was NEW in the live window (in-batch
        duplicates first-wins) — the same contract as
        ``CuckooFilter.check_and_add`` / the SeenShard pool."""
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, first_idx = np.unique(keys, return_index=True)
        new_u = ~self.contains(uniq)
        if new_u.any():
            self.gens[-1].add(uniq[new_u])
        out = np.zeros(len(keys), dtype=bool)
        out[first_idx[new_u]] = True
        return out

    def rotate(self) -> None:
        """Advance the window one step: open a fresh current
        generation, retire the oldest once more than
        ``n_generations`` are live."""
        self.gens.append(CuckooFilter(self.capacity, self.max_kicks))
        if len(self.gens) > self.n_generations:
            self.gens.pop(0)
        self.rotations += 1

    def dump(self) -> dict:
        return {
            "kind": "windowed_cuckoo",
            "capacity": self.capacity,
            "max_kicks": self.max_kicks,
            "n_generations": self.n_generations,
            "rotations": self.rotations,
            "gens": [g.dump() for g in self.gens],
        }

    @classmethod
    def load(cls, d: dict) -> "WindowedCuckoo":
        wc = cls.__new__(cls)
        wc.capacity = d["capacity"]
        wc.max_kicks = d["max_kicks"]
        wc.n_generations = d["n_generations"]
        wc.rotations = d["rotations"]
        wc.gens = [CuckooFilter.load(g) for g in d["gens"]]
        return wc
