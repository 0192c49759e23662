"""Pure-numpy oracles, fully independent of the JAX engines.

The reference verifies against CPU stable sorts (std::sort / std::stable_sort /
concurrency::parallel_radixsort with a getKeyBits projection — unittest.cpp:
127-168, 248-355, 358-377). Here: numpy stable argsort of the transformed,
window-masked key bits."""

from __future__ import annotations

import numpy as np

from tinyhipradixsort_tpu.keybits import np_key_bits


def oracle_perm(keys: np.ndarray, *, descending=False, start_bit=0, end_bit=None) -> np.ndarray:
    bits = np_key_bits(keys, descending=descending)
    nbits = bits.dtype.itemsize * 8
    end_bit = nbits if end_bit is None else end_bit
    if (start_bit, end_bit) != (0, nbits):
        udt = bits.dtype.type
        width = end_bit - start_bit
        mask = udt(~udt(0)) if width >= nbits else udt((1 << width) - 1)
        bits = (bits >> udt(start_bit)) & mask
    return np.argsort(bits, kind="stable")


def oracle_sort_keys(keys, **kw):
    return keys[oracle_perm(keys, **kw)]


def oracle_sort_pairs(keys, values, **kw):
    p = oracle_perm(keys, **kw)
    return keys[p], values[p]
