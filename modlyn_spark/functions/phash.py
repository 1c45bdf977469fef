"""Perceptual hashing for image payloads.

``average_hash``: the classic aHash — downsample the grayscale image to 8x8
by block averaging, threshold each cell at the global mean, pack the 64 bits
row-major into a signed int64. Deterministic, pure numpy, vectorizable inside
pandas UDFs. Consecutive versions of the synthetic fixture images differ in a
known number of cells, giving exact lag-delta ground truth
(FIXTURES.md §1 phash).

``hamming64``: JVM-side bit distance between two int64 hashes —
``bit_count(a ^ b)`` — used by the lag/lead phash-delta features
(BASELINE.json north_star).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def to_gray(px: np.ndarray) -> np.ndarray:
    if px.ndim == 2:
        return px.astype(np.float64)
    # ITU-R BT.601 luma
    return (
        0.299 * px[..., 0].astype(np.float64)
        + 0.587 * px[..., 1].astype(np.float64)
        + 0.114 * px[..., 2].astype(np.float64)
    )


def average_hash(px: np.ndarray, grid: int = 8) -> int:
    """64-bit average hash of an image array; returns signed int64."""
    g = to_gray(px)
    h, w = g.shape
    if h % grid == 0 and w % grid == 0:
        # vectorized block mean (identical boundaries to the general path
        # when divisible)
        cells = g.reshape(grid, h // grid, grid, w // grid).mean(axis=(1, 3))
    else:
        ys = (np.arange(grid + 1) * h) // grid
        xs = (np.arange(grid + 1) * w) // grid
        cells = np.empty((grid, grid))
        for i in range(grid):
            for j in range(grid):
                cells[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (cells > cells.mean()).ravel()
    v = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
    # to signed int64
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def hamming64(a: Column, b: Column) -> Column:
    """Bit distance between two int64 hash columns, JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))
