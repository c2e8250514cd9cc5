"""Perceptual-hash utilities for the image corpus (SURVEY.md §2.6 op 33).

``phash64``: 64-bit mean-threshold hash of the 8x8 block-downsampled grid
(the DCT-free variant from FIXTURES.md §1) — deterministic, pure NumPy.
Hamming distance lives in SQL as ``bit_count(a ^ b)`` (built-in since
Spark 3.3) so near-dup joins stay JVM-side.
"""

from __future__ import annotations

import numpy as np

NODATA = -9999.0


def phash64(grid: np.ndarray) -> int:
    """(h, w) float grid -> signed int64 perceptual hash."""
    g = np.asarray(grid, dtype=np.float64).copy()
    valid = g != NODATA
    fill = g[valid].mean() if valid.any() else 0.0
    g[~valid] = fill
    h, w = g.shape
    # 8x8 block means over nearly-equal slices (handles any h, w >= 8)
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    v = np.uint64(0)
    for k, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(k)
    return int(v.view(np.int64))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
