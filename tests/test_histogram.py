"""Pallas digit-histogram op (reference blockCount parity; kernel.cu:73-103)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyhipradixsort_tpu.ops import histogram

RNG = np.random.default_rng(0x415)


@pytest.mark.parametrize("n", [1024, 8192, 10000, 100000])
@pytest.mark.parametrize("shift,width", [(0, 8), (8, 8), (24, 8), (4, 5)])
def test_digit_histogram_matches_bincount(n, shift, width):
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    tile = 8192
    counts = np.asarray(histogram.digit_histogram(
        jnp.asarray(x), shift, width, tile=tile))
    npad = -(-n // tile) * tile
    xp = np.concatenate([x, np.full(npad - n, 0xFFFFFFFF, np.uint32)])
    digit = (xp >> shift) & ((1 << width) - 1)
    want = np.stack([np.bincount(d, minlength=1 << width)
                     for d in digit.reshape(-1, tile)])
    np.testing.assert_array_equal(counts, want)


def test_digit_histogram_u64():
    x = RNG.integers(0, 2**64, size=20000, dtype=np.uint64)
    counts = np.asarray(histogram.digit_histogram(jnp.asarray(x), 40, 8,
                                                  tile=8192))
    assert counts.sum() == -(-20000 // 8192) * 8192
    digit = ((x >> np.uint64(40)) & np.uint64(0xFF)).astype(np.int64)
    total = np.bincount(digit, minlength=256)
    # pad contributes only to the top bucket here (bits 40-47 of all-ones)
    got_total = counts.sum(axis=0)
    got_total[255] -= counts.sum() - 20000
    np.testing.assert_array_equal(got_total, total)


def test_bucket_major_scan_matches_reference_layout():
    counts = jnp.asarray(RNG.integers(0, 100, size=(7, 16), dtype=np.int32))
    ex = np.asarray(histogram.exclusive_scan_bucket_major(counts))
    flat = np.asarray(counts).T.reshape(-1)
    want = np.concatenate([[0], np.cumsum(flat)[:-1]]).reshape(16, 7).T
    np.testing.assert_array_equal(ex, want)


def test_digit_histogram_small_width_and_odd_tile():
    # regressions: width < 3 (fewer buckets than the chunk) and unaligned tile
    x = RNG.integers(0, 2**32, size=5000, dtype=np.uint32)
    c = np.asarray(histogram.digit_histogram(jnp.asarray(x), 0, 2, tile=3000))
    assert c.shape[1] == 4 and c.sum() >= 5000
    c2 = np.asarray(histogram.digit_histogram(jnp.asarray(x), 30, 1))
    assert c2.shape[1] == 2
