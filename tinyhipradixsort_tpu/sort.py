"""Public sort API.

Functional, dtype-driven equivalents of the reference host API
(reference: tinyhipradixsort.hpp:845-852 ``sortKeys``/``sortPairs``):

* :func:`sort_keys`    — stable radix sort of a key array.
* :func:`sort_pairs`   — stable key-value sort; values may be any array (or
  pytree of arrays) whose leading axis matches the keys (superset of the
  reference's 4/8/16-byte payloads).
* :func:`sort_indices` — the stable sorting permutation (argsort by key bits).
* :class:`RadixSort`   — thin config-holding wrapper for reference-API parity.

All functions are jit-compatible and also pre-jitted for eager use; each
distinct (dtypes, order, bit window, method) combination is one XLA trace —
the TPU-native analogue of the reference's per-config RTC compile
(hpp:751-804).

Semantics contract (identical to the reference):

* Stable: equal keys (equal *window* bits) preserve input order.
* Sorts by the key-bit transform of :mod:`..keybits`; original key values
  (including ``-0.0`` and NaN payloads) are carried through unchanged.
* ``start_bit``/``end_bit`` restrict sorting to the bit window
  ``[start_bit, end_bit)`` of the transformed key bits. The reference requires
  the window to be byte-aligned (hpp:856); here any window is allowed.
* Descending order is the bitwise complement of the transform — still stable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import keybits
from .config import Config, SortOrder
from .ops import argsort_engine, common, counting_engine

__all__ = ["sort_keys", "sort_pairs", "sort_indices", "RadixSort"]

_ENGINES = ("auto", "pallas", "counting", "argsort", "lsd_argsort")


def _resolve_method(method: str) -> str:
    if method not in _ENGINES:
        raise ValueError(f"unknown method {method!r}; expected one of {_ENGINES}")
    if method != "auto":
        return method
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    if on_tpu:
        return "pallas"
    return "argsort"


def _sort_arrays(bits, arrays, start_bit, end_bit, method):
    if method == "argsort":
        return argsort_engine.sort_arrays_argsort(bits, arrays, start_bit, end_bit)
    if method == "lsd_argsort":
        return argsort_engine.sort_arrays_lsd_argsort(bits, arrays, start_bit, end_bit)
    if method == "counting":
        return counting_engine.sort_arrays_counting(bits, arrays, start_bit, end_bit)
    if method == "pallas":
        from .ops import pallas_engine

        return pallas_engine.sort_arrays_pallas(bits, arrays, start_bit, end_bit)
    raise ValueError(f"unknown method {method!r}")


@functools.partial(
    jax.jit,
    static_argnames=("descending", "start_bit", "end_bit", "method", "want",
                     "zeros_exact"),
)
def _sort_entry(keys, values, *, descending, start_bit, end_bit, method, want,
                zeros_exact=True):
    """want: subset of {'keys','values','indices'} controlling outputs."""
    n = keys.shape[0]
    leaves, treedef = [], None
    if "values" in want:
        leaves, treedef = jax.tree.flatten(values)
        for leaf in leaves:
            if leaf.shape[:1] != (n,):
                raise ValueError(
                    f"value leading axis {leaf.shape[:1]} != keys length {n}"
                )

    if method == "pallas":
        from .ops import pallas_engine

        out = pallas_engine.sort_semantics(
            keys, leaves, descending=descending, start_bit=start_bit,
            end_bit=end_bit, want=want, zeros_exact=zeros_exact)
        result = []
        pos = 0
        if "keys" in want:
            result.append(out[pos])
            pos += 1
        if "values" in want:
            result.append(jax.tree.unflatten(treedef, out[pos]))
            pos += 1
        if "indices" in want:
            result.append(out[pos])
        return tuple(result)

    bits = keybits.key_bits(keys, descending=descending)
    arrays = []
    if "keys" in want:
        arrays.append(keys)
    arrays.extend(leaves)
    if "indices" in want:
        idx_dt = jnp.int32 if n < 2**31 else jnp.int64
        arrays.append(jnp.arange(n, dtype=idx_dt))

    out = _sort_arrays(bits, arrays, start_bit, end_bit, method)

    result = []
    pos = 0
    if "keys" in want:
        result.append(out[pos])
        pos += 1
    if "values" in want:
        result.append(jax.tree.unflatten(treedef, out[pos : pos + len(leaves)]))
        pos += len(leaves)
    if "indices" in want:
        result.append(out[pos])
    return tuple(result)


def _prep(keys, order, start_bit, end_bit):
    keys = jnp.asarray(keys)
    if keys.ndim != 1:
        raise ValueError(f"keys must be 1-D, got shape {keys.shape}")
    if np.dtype(keys.dtype) == np.float64 and jax.default_backend() in ("tpu", "axon"):
        # TPU has no native float64: device f64 arrays are stored lossily, so
        # a bit-exact f64 sort through f64 arrays is impossible on this
        # backend. The supported TPU path is the u64 key-bits representation.
        raise TypeError(
            "float64 keys are not representable losslessly on TPU. Convert on "
            "host with tinyhipradixsort_tpu.np_key_bits(keys) (u64), sort the "
            "u64 bits on device, and invert with np_key_bits_inverse()."
        )
    descending = SortOrder.parse(order).descending
    start_bit, end_bit = common.resolve_window(keys.dtype, start_bit, end_bit)
    return keys, descending, start_bit, end_bit


def sort_keys(keys, *, order="ascending", start_bit=0, end_bit=None,
              method="auto", zeros_exact=True):
    """Stable radix sort of ``keys``; returns the sorted array.

    Reference parity: ``RadixSort::sortKeys`` (hpp:845-848). The result
    replaces the input buffer there; here it is returned functionally.

    ``zeros_exact=False`` is a float-keys fast path (~2x on the Pallas
    engine: 1 sorted word instead of bits + tagged stability index): every
    ``-0.0`` comes back as ``+0.0`` (order is unaffected — the two zeros
    compare equal). Ignored for integer keys and by the portable engines,
    which are always exact.
    """
    keys, descending, start_bit, end_bit = _prep(keys, order, start_bit, end_bit)
    method = _resolve_method(method)
    (out,) = _sort_entry(
        keys, None, descending=descending, start_bit=start_bit, end_bit=end_bit,
        method=method, want=("keys",), zeros_exact=zeros_exact,
    )
    return out


def sort_pairs(keys, values, *, order="ascending", start_bit=0, end_bit=None, method="auto"):
    """Stable key-value sort; returns ``(sorted_keys, reordered_values)``.

    ``values`` may be a single array or a pytree of arrays sharing the keys'
    leading axis (reference: ``sortPairs``, hpp:849-852, limited there to
    4/8/16-byte payloads; u128 payloads map to shape ``(n, 4)`` uint32).
    """
    keys, descending, start_bit, end_bit = _prep(keys, order, start_bit, end_bit)
    method = _resolve_method(method)
    values = jax.tree.map(jnp.asarray, values)
    out_keys, out_values = _sort_entry(
        keys, values, descending=descending, start_bit=start_bit, end_bit=end_bit,
        method=method, want=("keys", "values"),
    )
    return out_keys, out_values


def sort_indices(keys, *, order="ascending", start_bit=0, end_bit=None, method="auto"):
    """The stable sorting permutation: ``keys[perm]`` is sorted (stable argsort
    by transformed key bits). TPU-native extension with no reference analogue —
    equivalent to ``sort_pairs(keys, iota)[1]``."""
    keys, descending, start_bit, end_bit = _prep(keys, order, start_bit, end_bit)
    method = _resolve_method(method)
    (perm,) = _sort_entry(
        keys, None, descending=descending, start_bit=start_bit, end_bit=end_bit,
        method=method, want=("indices",),
    )
    return perm


class RadixSort:
    """Config-holding wrapper mirroring ``thrs::RadixSort`` (hpp:694-948).

    Construction is free (no RTC compile — jit tracing happens on first call
    per shape). ``temporary_buffer_bytes`` documents the transient footprint
    for parity with ``getTemporaryBufferBytes`` (hpp:833-843).
    """

    def __init__(self, config: Config | None = None, method: str = "auto"):
        self.config = config or Config()
        self.method = method

    def _kw(self, start_bit, end_bit):
        return dict(
            order=self.config.order,
            start_bit=start_bit,
            end_bit=end_bit,
            method=self.method,
        )

    def sort_keys(self, keys, start_bit: int = 0, end_bit: int | None = None):
        keys = jnp.asarray(keys)
        if np.dtype(keys.dtype) != self.config.key_type.dtype:
            raise TypeError(
                f"keys dtype {keys.dtype} != configured {self.config.key_type.dtype}"
            )
        return sort_keys(keys, **self._kw(start_bit, end_bit))

    def sort_pairs(self, keys, values, start_bit: int = 0, end_bit: int | None = None):
        keys = jnp.asarray(keys)
        if np.dtype(keys.dtype) != self.config.key_type.dtype:
            raise TypeError(
                f"keys dtype {keys.dtype} != configured {self.config.key_type.dtype}"
            )
        return sort_pairs(keys, values, **self._kw(start_bit, end_bit))

    def temporary_buffer_bytes(self, n: int) -> int:
        from .config import temporary_buffer_bytes

        return temporary_buffer_bytes(n, self.config)
