"""Perceptual image hashing — the image-dedup stage of a multimodal
curation pipeline: re-encoded, metadata-stripped, or slightly-noised
copies of an image have different bytes (so exact/sha dedup misses
them) but the same perceptual hash.

`dhash56` is the standard difference hash (public knowledge: resize to
a small grid, compare horizontally adjacent cells, bit = left > right)
on an 8x8 grid of BLOCK SUMS — 7 comparisons x 8 rows = 56 bits, chosen
to fit a signed 64-bit column on every engine (a 9x8/64-bit variant
risks the sign bit). Block SUMS instead of means: comparisons between
equal-area blocks are identical under sum or mean, and integer sums
replay exactly in a SQL oracle. Invariances that make it a NEAR-dup
hash: any global brightness shift cancels in the differences, and
sub-block noise smaller than half the block contrast never flips a
comparison (both pinned in tests/test_imagehash.py).

`grayscale` is the integer ITU-R BT.601 luma ((299r + 587g + 114b)
// 1000); `hamming56` the bit distance for near-dup thresholds.

Scale: hashing is per-image map work (Arrow-batched, shuffle-free);
grouping by hash is ONE groupBy on a 56-bit key — the image twin of
exact text dedup, with hamming-radius bucketing available the same way
SimHash pigeonholes text.
"""

from __future__ import annotations

GRID = 8


def grayscale(px):
    """(h, w, 3+) uint8 → (h, w) integer luma (BT.601, floor)."""
    import numpy as np

    a = np.asarray(px, dtype=np.int64)
    if a.ndim == 2:
        return a
    return (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000


def block_sums(gray, grid: int = GRID):
    """(h, w) → (grid, grid) integer block sums. h and w must divide by
    ``grid`` (the builder guarantees it; real pipelines resample first)."""
    import numpy as np

    a = np.asarray(gray, dtype=np.int64)
    h, w = a.shape
    bh, bw = h // grid, w // grid
    return (
        a[: bh * grid, : bw * grid]
        .reshape(grid, bh, grid, bw)
        .sum(axis=(1, 3))
    )


def dhash56(gray) -> int:
    """56-bit difference hash: bit(row, col) = block[row, col] >
    block[row, col+1], packed as sum(bit << (row*7 + col))."""
    b = block_sums(gray)
    out = 0
    for row in range(GRID):
        for col in range(GRID - 1):
            if b[row][col] > b[row][col + 1]:
                out |= 1 << (row * 7 + col)
    return out


def hamming56(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 56) - 1)).count("1")


def build_pattern_gray(doc_id: int, size: int = 16, brightness: bool = True):
    """Deterministic grayscale test pattern: the PERCEPTUAL CONTENT is
    decided by ``doc_id % 25`` (the pattern class); with ``brightness``
    (default) ``doc_id`` also adds a global brightness offset that
    dhash must ignore — so same-class documents are near-dup images
    with different bytes. ``brightness=False`` returns the bare class
    pattern (the near-dup-pairs fixture adds its own blemish instead).
    """
    import numpy as np

    p = doc_id % 25
    y, x = np.mgrid[0:size, 0:size]
    base = ((p + 1) * (x * x + 3 * y) + 11 * x) % 251
    if brightness:
        base = base + doc_id % 2
    return (base % 256).astype(np.uint8)
