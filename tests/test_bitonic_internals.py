"""Host-side engine internals: planner, bit rotation, word codecs, search."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyhipradixsort_tpu.ops import bitonic_engine as be
from tinyhipradixsort_tpu.parallel import psort

RNG = np.random.default_rng(0x1E57)


def test_word_contract_checker():
    ok_no_carry = be.check_word_contract([jnp.zeros(8, jnp.uint32)], [])
    assert bool(ok_no_carry)
    # duplicate cmp tuples + carry -> unsafe
    cmp = [jnp.asarray(np.array([1, 2, 2, 3], np.uint32)),
           jnp.asarray(np.array([0, 5, 5, 0], np.uint32))]
    carry = [jnp.arange(4, dtype=jnp.uint32)]
    assert not bool(be.check_word_contract(cmp, carry))
    # same cmp made distinct by an index word -> safe
    assert bool(be.check_word_contract(cmp + [jnp.arange(4, dtype=jnp.uint32)],
                                       carry))


@pytest.mark.parametrize("L,tile,chunk,rot", [
    (10, 18, 13, 0), (13, 18, 13, 10), (20, 18, 13, 10), (26, 18, 13, 10),
    (15, 14, 11, 10),
])
def test_plan_covers_relabeled_network(L, tile, chunk, rot):
    T = min(tile, L)
    sig = lambda x: (x + rot) % T if x < T else x
    sweeps = be.plan_sweeps(L, tile, chunk, rot)
    subs = [s for sw in sweeps for s in sw.substages]
    expect = [(sig(k), sig(j))
              for k in range(1, L + 1) for j in range(k - 1, -1, -1)]
    assert subs == expect
    for sw in sweeps:
        A, B = sw.grid()
        assert A * B * sw.tile_elems == 1 << L
        for k, j in sw.substages:
            assert sw.has_bit(j)
            sw.dir_spec(k)  # must not raise


def test_split_sweep_preserves_order():
    sw = be.plan_sweeps(20, 18, 13, 10)[0]
    parts = be._split_sweep(sw, 40)
    assert all(len(p.substages) <= 40 for p in parts)
    joined = [s for p in parts for s in p.substages]
    assert joined == list(sw.substages)


@pytest.mark.parametrize("T,rot", [(13, 10), (18, 10), (12, 5)])
def test_rotate_storage_is_bit_rotation(T, rot):
    n = 1 << T
    f = np.arange(n, dtype=np.uint32)
    s = np.asarray(be._rotate_storage(jnp.asarray(f), T, -rot))
    # element f lands at position rotl(f, rot): s[rotl(f)] == f
    rotl = ((f << rot) | (f >> (T - rot))) & (n - 1)
    assert np.array_equal(s[rotl], f)
    back = np.asarray(be._rotate_storage(
        be._rotate_storage(jnp.asarray(f), T, -rot), T, rot))
    assert np.array_equal(back, f)


@pytest.mark.parametrize("dtype,shape", [
    (np.uint32, (100,)), (np.float32, (100,)), (np.int32, (100,)),
    (np.uint64, (100,)), (np.int64, (100,)), (np.float64, (100,)),
    (np.uint8, (100,)), (np.uint16, (100,)), (np.uint32, (100, 4)),
])
def test_word_codec_roundtrip(dtype, shape):
    dt = np.dtype(dtype)
    if dt.kind == "f":
        a = RNG.standard_normal(shape).astype(dt)
    else:
        a = RNG.integers(0, np.iinfo(dt).max, size=shape, dtype=dt,
                         endpoint=True)
    words, recipe = be.array_to_words(jnp.asarray(a))
    recipe["nwords"] = len(words)
    back = np.asarray(be.words_to_array(words, recipe))
    view = {4: np.uint32, 8: np.uint64, 1: np.uint8, 2: np.uint16}[dt.itemsize]
    np.testing.assert_array_equal(back.view(view), a.view(view))


def test_searchsorted_words_matches_numpy():
    n, q = 5000, 257
    hi = RNG.integers(0, 8, size=n, dtype=np.uint32)  # many ties in hi word
    lo = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    qh = RNG.integers(0, 8, size=q, dtype=np.uint32)
    ql = RNG.integers(0, 2**32, size=q, dtype=np.uint32)
    got = np.asarray(psort._searchsorted_words(
        [jnp.asarray(hi), jnp.asarray(lo)], [jnp.asarray(qh), jnp.asarray(ql)]))
    packed = (hi.astype(np.uint64) << 32) | lo
    qpacked = (qh.astype(np.uint64) << 32) | ql
    want = np.searchsorted(packed, qpacked, side="left")
    np.testing.assert_array_equal(got, want)
