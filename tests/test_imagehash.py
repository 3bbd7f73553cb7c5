"""Perceptual image hashing (operators/imagehash.py): invariances,
sensitivity, hamming distance, PNG round-trip composition."""

from __future__ import annotations

import numpy as np

from data_engineering_etl_self_service_spark.operators.imagehash import (
    block_sums,
    build_pattern_gray,
    dhash56,
    grayscale,
    hamming56,
)


def test_brightness_shift_invariance():
    a = build_pattern_gray(3)
    shifted = np.clip(a.astype(int) + 4, 0, 255)
    assert dhash56(a) == dhash56(shifted)


def test_small_noise_invariance_large_edit_flips():
    a = build_pattern_gray(7).astype(int)
    rng = [(i * 37 + 11) % 2 for i in range(a.size)]  # deterministic ±1
    noisy = a + np.array(rng).reshape(a.shape)
    assert dhash56(a) == dhash56(noisy)
    # blanking the right half is a different image
    edited = a.copy()
    edited[:, 8:] = 0
    assert hamming56(dhash56(a), dhash56(edited)) > 8


def test_same_class_different_docs_share_hash():
    assert dhash56(build_pattern_gray(3)) == dhash56(build_pattern_gray(28))
    assert dhash56(build_pattern_gray(3)) != dhash56(build_pattern_gray(4))


def test_grayscale_luma_and_block_sums():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red
    assert grayscale(rgb)[0, 0] == 255 * 299 // 1000
    g = np.arange(64).reshape(8, 8)
    b = block_sums(g, grid=8)  # 1x1 blocks = identity
    assert (b == g).all()


def test_hash_fits_signed_64():
    for i in range(30):
        h = dhash56(build_pattern_gray(i))
        assert 0 <= h < 1 << 56


def test_png_roundtrip_preserves_hash():
    from data_engineering_etl_self_service_spark.operators.multimodal import (
        build_png_ex,
        decode_png,
    )

    a = build_pattern_gray(12)
    px = decode_png(build_png_ex(a, ctype=0))
    assert dhash56(grayscale(px[..., 0])) == dhash56(a)


def test_blemish_moves_at_most_two_comparisons():
    """A single saturated 2x2 block changes only the comparisons to its
    left and right — the bound the radius-4 pairing relies on."""
    for did in (0, 26, 77, 301):
        base = build_pattern_gray(did, brightness=False).astype(int)
        b = (did // 25) % 64
        r0, c0 = b // 8, b % 8
        blem = base.copy()
        blem[2 * r0 : 2 * r0 + 2, 2 * c0 : 2 * c0 + 2] += 200
        blem = np.clip(blem, 0, 255)
        assert hamming56(dhash56(base), dhash56(blem)) <= 2
