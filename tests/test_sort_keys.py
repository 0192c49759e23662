"""Keys-only sort vs numpy oracle (reference: unittest.cpp:170-245 SortKeys.*,
SortKeysDescending.*, extremeCase; randomized sizes incl. non-tile-multiples)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tinyhipradixsort_tpu as thrs
from tinyhipradixsort_tpu.utils.prng import random_keys, splitmix64
from oracles import oracle_sort_keys

METHODS = ["argsort", "lsd_argsort", "counting"]
DTYPES = [np.uint32, np.uint64, np.int32, np.int64, np.float32, np.float64]


def _sizes(seed, k=6, lo=1, hi=30_000):
    return [int(v % (hi - lo) + lo) for v in splitmix64(seed, k)]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("dtype", DTYPES)
def test_sort_keys_random_sizes(method, dtype):
    for i, n in enumerate(_sizes(hash(str(dtype)) & 0xFFFF)):
        keys = random_keys(dtype, n, seed=100 + i)
        got = np.asarray(thrs.sort_keys(jnp.asarray(keys), method=method))
        np.testing.assert_array_equal(got, oracle_sort_keys(keys), err_msg=f"n={n}")


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("dtype", [np.uint32, np.float64])
def test_sort_keys_descending(method, dtype):
    for i, n in enumerate(_sizes(11, k=4)):
        keys = random_keys(dtype, n, seed=200 + i)
        got = np.asarray(thrs.sort_keys(jnp.asarray(keys), order="descending", method=method))
        np.testing.assert_array_equal(got, oracle_sort_keys(keys, descending=True), err_msg=f"n={n}")


@pytest.mark.parametrize("method", METHODS)
def test_extreme_case(method):
    # All-zero array with two sentinel values (reference: unittest.cpp:191-225):
    # degenerate histogram distributions.
    n = 20_000
    keys = np.zeros(n, dtype=np.uint32)
    keys[n // 3] = 0xFFFFFFFF
    keys[2 * n // 3] = 1
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), method=method))
    np.testing.assert_array_equal(got, oracle_sort_keys(keys))


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("n", [0, 1, 2, 3, 127, 128, 2047, 2048, 2049])
def test_tiny_and_tile_boundary_sizes(method, n):
    keys = random_keys(np.uint32, max(n, 1), seed=5)[:n]
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), method=method))
    np.testing.assert_array_equal(got, oracle_sort_keys(keys))


@pytest.mark.parametrize("method", METHODS)
def test_float_specials_end_to_end(method):
    # Beyond the reference's tests: NaN/Inf/-0.0 actually sorted on device.
    base = random_keys(np.float32, 5000, seed=9)
    specials = np.array([np.nan, -np.nan, np.inf, -np.inf, -0.0, 0.0] * 50, dtype=np.float32)
    keys = np.concatenate([base, specials])
    rng = np.random.default_rng(0)
    rng.shuffle(keys)
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), method=method))
    want = oracle_sort_keys(keys)
    # Bit-exact comparison (NaN != NaN under ==, so compare raw bits).
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def test_sorted_and_reverse_inputs():
    keys = np.arange(10_000, dtype=np.uint32)
    for arr in (keys, keys[::-1].copy()):
        got = np.asarray(thrs.sort_keys(jnp.asarray(arr), method="counting"))
        np.testing.assert_array_equal(got, np.sort(arr))


def test_donate_returns_same_result():
    # donate=True reuses the input buffer (reference result-replaces-input
    # parity, hpp:936-943); on CPU donation is ignored but must stay correct
    keys = np.random.default_rng(4).integers(0, 2**32, 4096, dtype=np.uint32)
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), method="argsort",
                                    donate=True))
    np.testing.assert_array_equal(got, np.sort(keys))
    k, v = thrs.sort_pairs(jnp.asarray(keys),
                           jnp.arange(4096, dtype=jnp.uint32), donate=True,
                           method="argsort")
    np.testing.assert_array_equal(np.asarray(k), np.sort(keys))
