"""Partial bit-window sorts — the stability contract test
(reference: unittest.cpp:248-355 StartBits.u64: random 8-bit window, both
orders, keys-only and pairs, vs stable sort on the masked digit)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tinyhipradixsort_tpu as thrs
from tinyhipradixsort_tpu.utils.prng import random_keys, splitmix64
from oracles import oracle_perm, oracle_sort_keys

METHODS = ["argsort", "lsd_argsort", "counting"]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("descending", [False, True])
def test_random_byte_window_u64(method, descending):
    order = "descending" if descending else "ascending"
    rng = splitmix64(42, 8)
    for i in range(4):
        start = int(rng[i] % 57) // 8 * 8  # byte-aligned start in [0, 56]
        end = start + 8
        n = int(rng[i + 4] % 20_000) + 1
        keys = random_keys(np.uint64, n, seed=300 + i)
        values = np.arange(n, dtype=np.uint32)
        ks, vs = thrs.sort_pairs(
            jnp.asarray(keys), jnp.asarray(values),
            order=order, start_bit=start, end_bit=end, method=method,
        )
        p = oracle_perm(keys, descending=descending, start_bit=start, end_bit=end)
        np.testing.assert_array_equal(np.asarray(ks), keys[p], err_msg=f"window [{start},{end}) n={n}")
        np.testing.assert_array_equal(np.asarray(vs), values[p])


@pytest.mark.parametrize("method", METHODS)
def test_multi_byte_window_u32(method):
    keys = random_keys(np.uint32, 15_000, seed=17)
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), start_bit=8, end_bit=24, method=method))
    np.testing.assert_array_equal(got, oracle_sort_keys(keys, start_bit=8, end_bit=24))


@pytest.mark.parametrize("method", METHODS)
def test_non_byte_aligned_window(method):
    # Extension beyond the reference (which asserts (end-start) % 8 == 0).
    keys = random_keys(np.uint32, 10_000, seed=23)
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), start_bit=3, end_bit=17, method=method))
    np.testing.assert_array_equal(got, oracle_sort_keys(keys, start_bit=3, end_bit=17))


@pytest.mark.parametrize("method", METHODS)
def test_float_window_uses_transformed_bits(method):
    # Windows select bits of the *transformed* key, exactly like the reference
    # (getKeyBits applied before digit extraction, kernel.cu:85).
    keys = random_keys(np.float32, 12_000, seed=29)
    got = np.asarray(thrs.sort_keys(jnp.asarray(keys), start_bit=16, end_bit=32, method=method))
    want = oracle_sort_keys(keys, start_bit=16, end_bit=32)
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def test_window_validation():
    keys = jnp.zeros(8, jnp.uint32)
    with pytest.raises(ValueError):
        thrs.sort_keys(keys, start_bit=8, end_bit=8)
    with pytest.raises(ValueError):
        thrs.sort_keys(keys, start_bit=0, end_bit=33)
    with pytest.raises(ValueError):
        thrs.sort_keys(keys, start_bit=-1)
