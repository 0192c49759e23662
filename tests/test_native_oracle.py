"""Native C++ host oracle tests (reference parity: fpKey.hpp transforms and
the parallel CPU radix-sort oracle, main.cpp:195/unittest.cpp:526)."""

import numpy as np
import pytest

from tinyhipradixsort_tpu import keybits
from tinyhipradixsort_tpu.utils import native_oracle

RNG = np.random.default_rng(0xC0DE)

pytestmark = pytest.mark.skipif(not native_oracle.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.int64])
def test_native_key_bits_matches_numpy(dtype):
    dt = np.dtype(dtype)
    n = 100000
    if dt.kind == "f":
        x = RNG.standard_normal(n).astype(dt)
        x[::7] = -0.0
        x[::11] = 0.0
        x[::13] = np.inf
        x[::17] = -np.inf
        x[::19] = np.nan
        x[5::19] = -np.nan
        x[::23] = np.finfo(dt).tiny / 2  # denormal
    else:
        info = np.iinfo(dt)
        x = RNG.integers(info.min, info.max, size=n, dtype=dt, endpoint=True)
    np.testing.assert_array_equal(native_oracle.native_key_bits(x),
                                  keybits.np_key_bits(x))


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_native_sort_bits(dtype):
    n = 300000
    x = RNG.integers(0, np.iinfo(dtype).max, size=n, dtype=dtype, endpoint=True)
    got = native_oracle.native_sort_bits(x)
    np.testing.assert_array_equal(got, np.sort(x))


def test_native_sort_stable_perm():
    n = 200000
    x = (RNG.integers(0, 64, size=n)).astype(np.uint32)  # heavy duplicates
    srt, perm = native_oracle.native_sort_bits(x, with_perm=True)
    want = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(perm.astype(np.int64), want)
    np.testing.assert_array_equal(srt, x[want])


def test_oracle_sort_floats():
    n = 50000
    x = RNG.standard_normal(n).astype(np.float32)
    x[::5] = -0.0
    sk, perm = native_oracle.oracle_sort(x)
    want = np.argsort(keybits.np_key_bits(x), kind="stable")
    np.testing.assert_array_equal(perm, want)
    np.testing.assert_array_equal(sk.view(np.uint32), x[want].view(np.uint32))


def test_oracle_sort_descending():
    x = RNG.integers(0, 2**32, size=65537, dtype=np.uint32)
    sk, _ = native_oracle.oracle_sort(x, descending=True)
    np.testing.assert_array_equal(sk, np.sort(x)[::-1])
