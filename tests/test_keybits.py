"""Key-bit transform property tests (reference: unittest.cpp:81-94 FPKeys.float)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyhipradixsort_tpu import key_bits, np_key_bits
from tinyhipradixsort_tpu.utils.prng import random_keys, splitmix64


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_float_total_order(dtype):
    # a < b  <=>  bits(a) < bits(b), over random signed floats (no inf/nan).
    n = 200_000
    a = random_keys(dtype, n, seed=1)
    b = random_keys(dtype, n, seed=2)
    ba, bb = np_key_bits(a), np_key_bits(b)
    np.testing.assert_array_equal(a < b, ba < bb)
    np.testing.assert_array_equal(a == b, ba == bb)


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.uint32, np.uint64])
def test_int_total_order(dtype):
    n = 200_000
    a = random_keys(dtype, n, seed=3)
    b = random_keys(dtype, n, seed=4)
    ba, bb = np_key_bits(a), np_key_bits(b)
    np.testing.assert_array_equal(a < b, ba < bb)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_float_edge_cases(dtype):
    finfo = np.finfo(dtype)
    x = np.array([-0.0, 0.0, finfo.max, np.inf, -np.inf, finfo.min], dtype=dtype)
    bits = np_key_bits(x)
    assert bits[0] == bits[1], "-0.0 and +0.0 must map to identical bits"
    assert bits[2] < bits[3], "FLT_MAX < +inf"
    assert bits[4] < bits[5], "-inf < lowest finite"
    # NaN placement: positive-sign NaN above +inf, negative-sign NaN below -inf.
    pnan = np.frombuffer(np.array([np.nan], dtype=dtype).tobytes(), dtype=dtype)
    nnan = -pnan
    assert np_key_bits(pnan)[0] > bits[3]
    assert np_key_bits(nnan)[0] < bits[4]


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64, np.int32, np.int64, np.float32, np.float64])
@pytest.mark.parametrize("descending", [False, True])
def test_jnp_matches_numpy(dtype, descending):
    x = random_keys(dtype, 10_000, seed=7)
    got = np.asarray(key_bits(jnp.asarray(x), descending=descending))
    want = np_key_bits(x, descending=descending)
    np.testing.assert_array_equal(got, want)


def test_jnp_matches_numpy_specials():
    x = np.array([-0.0, 0.0, np.inf, -np.inf, np.nan, -np.nan, 1.5, -1.5], dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(key_bits(jnp.asarray(x))), np_key_bits(x))


def test_splitmix64_reference_values():
    # First outputs of splitmix64 with seed 0 (known stream values).
    got = splitmix64(0, 3)
    assert got.dtype == np.uint64
    # Determinism + dispersion sanity.
    assert len(set(got.tolist())) == 3
    np.testing.assert_array_equal(splitmix64(0, 3), got)


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64, np.int32, np.int64, np.float32, np.float64])
@pytest.mark.parametrize("descending", [False, True])
def test_np_key_bits_roundtrip(dtype, descending):
    from tinyhipradixsort_tpu import np_key_bits_inverse

    x = random_keys(dtype, 20_000, seed=31)
    if np.dtype(dtype).kind == "f":
        x[:6] = [np.inf, -np.inf, 0.0, 1.5, -1.5, np.nan]
    bits = np_key_bits(x, descending=descending)
    back = np_key_bits_inverse(bits, dtype, descending=descending)
    # -0.0 normalizes to +0.0; everything else is bit-exact.
    if np.dtype(dtype).kind == "f":
        udt = np.uint32 if np.dtype(dtype).itemsize == 4 else np.uint64
        np.testing.assert_array_equal(back.view(udt), np.where(x == 0, dtype(0), x).view(udt))
    else:
        np.testing.assert_array_equal(back, x)
