"""ctypes bridge to the native C++ host oracle (native/thrs_host.cpp).

The reference verifies GPU sorts against a *parallel CPU radix sort*
(reference: main.cpp:195, unittest.cpp:526); numpy's argsort is ~20x slower
than memory speed, which makes multi-GB verification the bottleneck. This
module compiles the C++ oracle on first use (g++ -O3 -fopenmp), caches the
shared object next to the source, and exposes numpy-level helpers. Falls
back to numpy transparently when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "thrs_host.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libthrs_host.so")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    for flags in (["-fopenmp"], []):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", *flags,
               _SRC, "-o", _SO]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _SO
        except (subprocess.SubprocessError, FileNotFoundError):
            continue
    return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        i64, p = ctypes.c_int64, ctypes.POINTER
        lib.thrs_radix_sort_u32.argtypes = [p(ctypes.c_uint32), p(ctypes.c_uint64),
                                            i64, ctypes.c_int, ctypes.c_int]
        lib.thrs_radix_sort_u64.argtypes = [p(ctypes.c_uint64), p(ctypes.c_uint64),
                                            i64, ctypes.c_int, ctypes.c_int]
        for name, it, ot in (("thrs_key_bits_f32", ctypes.c_float, ctypes.c_uint32),
                             ("thrs_key_bits_f64", ctypes.c_double, ctypes.c_uint64),
                             ("thrs_key_bits_i32", ctypes.c_int32, ctypes.c_uint32),
                             ("thrs_key_bits_i64", ctypes.c_int64, ctypes.c_uint64)):
            getattr(lib, name).argtypes = [p(it), p(ot), i64]
        assert lib.thrs_version() == 1
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _as_ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def native_key_bits(keys: np.ndarray) -> np.ndarray:
    """Order-preserving bits via the native transforms (numpy fallback)."""
    from .. import keybits

    lib = get_lib()
    dt = np.dtype(keys.dtype)
    if lib is None or dt.kind == "u":
        return keybits.np_key_bits(keys)
    keys = np.ascontiguousarray(keys)
    n = keys.shape[0]
    if dt == np.float32:
        out = np.empty(n, np.uint32)
        lib.thrs_key_bits_f32(_as_ptr(keys, ctypes.c_float), _as_ptr(out, ctypes.c_uint32), n)
    elif dt == np.float64:
        out = np.empty(n, np.uint64)
        lib.thrs_key_bits_f64(_as_ptr(keys, ctypes.c_double), _as_ptr(out, ctypes.c_uint64), n)
    elif dt == np.int32:
        out = np.empty(n, np.uint32)
        lib.thrs_key_bits_i32(_as_ptr(keys, ctypes.c_int32), _as_ptr(out, ctypes.c_uint32), n)
    elif dt == np.int64:
        out = np.empty(n, np.uint64)
        lib.thrs_key_bits_i64(_as_ptr(keys, ctypes.c_int64), _as_ptr(out, ctypes.c_uint64), n)
    else:
        return keybits.np_key_bits(keys)
    return out


def native_sort_bits(bits: np.ndarray, *, with_perm: bool = False):
    """Stable LSD radix sort of u32/u64 bits; optionally the permutation.

    Returns sorted bits (copy), and the stable sorting permutation (u64) when
    ``with_perm``. Numpy fallback if the native library is unavailable.
    """
    lib = get_lib()
    dt = np.dtype(bits.dtype)
    if lib is None:
        perm = np.argsort(bits, kind="stable")
        return (bits[perm], perm.astype(np.uint64)) if with_perm else bits[perm]
    out = np.ascontiguousarray(bits).copy()
    n = out.shape[0]
    perm = np.arange(n, dtype=np.uint64) if with_perm else None
    perm_ptr = _as_ptr(perm, ctypes.c_uint64) if with_perm else None
    if dt == np.uint32:
        lib.thrs_radix_sort_u32(_as_ptr(out, ctypes.c_uint32), perm_ptr, n, 0, 4)
    elif dt == np.uint64:
        lib.thrs_radix_sort_u64(_as_ptr(out, ctypes.c_uint64), perm_ptr, n, 0, 8)
    else:
        raise TypeError(f"bits must be uint32/uint64, got {dt}")
    return (out, perm) if with_perm else out


def oracle_sort(keys: np.ndarray, *, descending: bool = False):
    """(sorted_keys, stable_perm) fast path for test/bench verification."""
    bits = native_key_bits(keys)
    if descending:
        bits = ~bits
    _, perm = native_sort_bits(bits, with_perm=True)
    perm = perm.astype(np.int64)
    return keys[perm], perm
