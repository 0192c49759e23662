"""MSB-partition front-end (ops/partition_engine.py) vs lexsort oracles.

Reference bar: the partition pipeline re-creates the reference's
histogram/scan/scatter pass structure (kernel.cu:73-204, 206-429) at the
MSB; these tests hold it to the same stable-sort contract as the direct
network (sort_words), including skew fallback and bucket ranges that
straddle merge-block boundaries.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyhipradixsort_tpu.ops import bitonic_engine as be
from tinyhipradixsort_tpu.ops import partition_engine as pe

RNG = np.random.default_rng(0x9A87)

# Small tiles/rows so CPU-sized inputs exercise multi-tile rank sorts,
# multi-row bucket sorts, and both neighbor-merge rounds.
TUNE = be.EngineTuning(partition_bits=4, partition_min_n=0,
                       partition_tile_bits=8, partition_row_bits=10)


def _oracle(cmp_arrays, carry_arrays):
    perm = np.lexsort(tuple(reversed([np.asarray(w) for w in cmp_arrays])))
    return ([np.asarray(w)[perm] for w in cmp_arrays],
            [np.asarray(w)[perm] for w in carry_arrays])


def _run(cmp_np, carry_np, tuning=TUNE):
    cw, kw = pe.sort_words_partition(
        [jnp.asarray(w) for w in cmp_np], [jnp.asarray(w) for w in carry_np],
        interpret=True, tuning=tuning)
    return [np.asarray(w) for w in cw], [np.asarray(w) for w in kw]


@pytest.mark.parametrize("n", [700, 4096, 6000, 10000])
def test_partition_keys_only_uniform(n):
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    (got,), _ = _run([x], [])
    np.testing.assert_array_equal(got, np.sort(x))


def test_partition_multiword_stable_pairs():
    n = 5000
    hi = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    lo = RNG.integers(0, 4, size=n, dtype=np.uint32)  # many ties
    idx = np.arange(n, dtype=np.uint32)               # distinct tuples
    payload = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    got_cmp, got_carry = _run([hi, lo, idx], [payload])
    want_cmp, want_carry = _oracle([hi, lo, idx], [payload])
    for g, w in zip(got_cmp, want_cmp):
        np.testing.assert_array_equal(g, w)
    np.testing.assert_array_equal(got_carry[0], want_carry[0])


def test_partition_skew_falls_back():
    # all keys share one MSB bucket -> max count > F -> lax.cond fallback
    n = 4096
    x = (RNG.integers(0, 2**20, size=n, dtype=np.uint32)
         | np.uint32(0x30000000))
    idx = np.arange(n, dtype=np.uint32)
    carry = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    got_cmp, got_carry = _run([x, idx], [carry])
    want_cmp, want_carry = _oracle([x, idx], [carry])
    np.testing.assert_array_equal(got_cmp[0], want_cmp[0])
    np.testing.assert_array_equal(got_carry[0], want_carry[0])


def test_partition_all_equal_keys():
    n = 3000
    x = np.full(n, 0xDEADBEEF, np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    got_cmp, _ = _run([x, idx], [])
    np.testing.assert_array_equal(got_cmp[0], x)
    np.testing.assert_array_equal(got_cmp[1], idx)


def test_partition_boundary_straddling_buckets():
    # bucket sizes chosen so ranges straddle the aligned 2F merge blocks:
    # F=1024, buckets of ~1.5*F/2 force crossings fixed only by round 2
    sizes = [700, 900, 1100 - 76, 1000, 1024, 300]
    digits = np.concatenate([np.full(s, d, np.uint32)
                             for d, s in enumerate(sizes)])
    n = digits.shape[0]
    low = RNG.integers(0, 2**28, size=n, dtype=np.uint32)
    x = (digits << np.uint32(28)) | low
    x = RNG.permutation(x)
    (got,), _ = _run([x], [])
    np.testing.assert_array_equal(got, np.sort(x))


def test_sort_words_routes_to_partition():
    n = 5000
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    (got,), _ = be.sort_words([jnp.asarray(x)], [], interpret=True,
                              tuning=TUNE)
    np.testing.assert_array_equal(np.asarray(got), np.sort(x))


def test_public_api_partition_env(monkeypatch):
    from tinyhipradixsort_tpu import sort_keys

    monkeypatch.setenv("THRS_PARTITION_BITS", "4")
    monkeypatch.setenv("THRS_PARTITION_MIN_N", "0")
    monkeypatch.setenv("THRS_PARTITION_TILE_BITS", "8")
    monkeypatch.setenv("THRS_PARTITION_ROW_BITS", "10")
    x = RNG.integers(0, 2**32, size=4000, dtype=np.uint32)
    got = np.asarray(sort_keys(jnp.asarray(x), method="pallas"))
    np.testing.assert_array_equal(got, np.sort(x))
    f = RNG.standard_normal(4000).astype(np.float32)
    gotf = np.asarray(sort_keys(jnp.asarray(f), method="pallas"))
    np.testing.assert_array_equal(gotf.view(np.uint32),
                                  np.sort(f).view(np.uint32))
