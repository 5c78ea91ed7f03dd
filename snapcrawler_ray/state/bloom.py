"""Vectorized Bloom filter over numpy bit arrays.

The scale path for URL-seen membership at 10^10 URLs: ~12 bits/key at
k=8 gives ~1e-3 false-positive probability (a false positive means a
URL is skipped — safe for a crawler; the *verification* configuration
uses exact sets instead so ordering matches the reference, SURVEY.md
§2.6).  Keys are uint64 url-hashes; k probe positions come from double
hashing h1 + i*h2 (Kirsch–Mitzenmacher).
"""

from __future__ import annotations

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class BloomFilter:
    def __init__(self, capacity: int, bits_per_key: int = 12, n_hashes: int = 8):
        self.n_bits = int(capacity) * int(bits_per_key)
        # round up to a byte multiple
        self.n_bits = max(64, (self.n_bits + 7) // 8 * 8)
        self.k = int(n_hashes)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)
        self.approx_count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions."""
        h1 = keys.astype(np.uint64)
        # A second independent hash: multiply by odd constant + xorshift.
        h2 = (h1 ^ (h1 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(self.n_bits)
        return pos

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys, dtype=np.uint64))
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit_mask = np.left_shift(
            np.uint8(1), (pos & np.uint64(7)).astype(np.uint8), dtype=np.uint8
        )
        present = (self.bits[byte_idx] & bit_mask) != 0
        return present.all(axis=1)

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys, dtype=np.uint64))
        byte_idx = (pos >> np.uint64(3)).astype(np.int64).ravel()
        bit_mask = np.left_shift(
            np.uint8(1), (pos & np.uint64(7)).astype(np.uint8), dtype=np.uint8
        ).ravel()
        np.bitwise_or.at(self.bits, byte_idx, bit_mask)
        self.approx_count += len(keys)

    def check_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Returns boolean mask of keys that were NEW (not present)."""
        keys = np.asarray(keys, dtype=np.uint64)
        present = self.contains(keys)
        self.add(keys[~present])
        return ~present

    @classmethod
    def from_bits(cls, bits: np.ndarray, n_bits: int, k: int) -> "BloomFilter":
        """Wrap an existing bit array (e.g. a merged runtime-filter
        bitset read zero-copy from the object store) without copying."""
        bf = cls.__new__(cls)
        bf.bits = bits
        bf.n_bits = n_bits
        bf.k = k
        bf.approx_count = 0
        return bf

    def dump(self) -> dict:
        return {
            "bits": self.bits.tobytes(),
            "n_bits": self.n_bits,
            "k": self.k,
            "approx_count": self.approx_count,
        }

    @classmethod
    def load(cls, d: dict) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.n_bits = d["n_bits"]
        bf.k = d["k"]
        bf.bits = np.frombuffer(d["bits"], dtype=np.uint8).copy()
        bf.approx_count = d["approx_count"]
        return bf
