"""Perceptual hash (DCT pHash) in numpy — rebuild of the reference's
``imagehash.phash`` dependency (filtering_module.py:337).

Algorithm (public, the standard pHash construction the imagehash
library implements): resize to 32×32 grayscale → 2-D DCT-II → take the
top-left 8×8 low-frequency block → threshold against its median →
64-bit hash.  Hamming distance ≤ threshold ⇒ near-duplicate; the
reference uses exact set equality of hashes, which we preserve
(SURVEY.md §2.3 F7).
"""

from __future__ import annotations

import numpy as np

_N = 32
_K = 8


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT = _dct_matrix(_N)


def _to_gray32(pixels: np.ndarray) -> np.ndarray:
    # sample the 32×32 grid FIRST, then luma on 1024 pixels — luma is
    # pointwise, so this is bit-identical to luma-then-sample while
    # doing O(32²) work instead of O(H·W)
    h, w = pixels.shape[:2]
    ys = (np.arange(_N) * h // _N).clip(0, h - 1)
    xs = (np.arange(_N) * w // _N).clip(0, w - 1)
    p = pixels[np.ix_(ys, xs)]
    if pixels.ndim == 3:
        # ITU-R 601 luma (what PIL's convert('L') uses)
        return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    return p.astype(np.float64)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a (H,W[,C]) uint8 array."""
    g = _to_gray32(pixels)
    d = _DCT @ g @ _DCT.T
    block = d[:_K, :_K].copy()
    med = np.median(block.ravel()[1:])  # skip DC term, as imagehash does
    bits = (block.ravel() > med).astype(np.uint64)
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    return int(h)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
