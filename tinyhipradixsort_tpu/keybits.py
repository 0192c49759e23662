"""Order-preserving key-bit transforms.

Maps sort keys of any supported dtype to unsigned integer bits whose *unsigned*
ascending order equals the desired key order. This is the TPU-native analogue of
the reference's ``getKeyBits`` overloads (reference: kernel.cu:46-69, fpKey.hpp:15-38):

* u32/u64: identity (XOR all-ones for descending).
* f32/f64: IEEE-754 total-order bit flip — positive floats get the sign bit set,
  negative floats are bitwise inverted, so unsigned integer comparison of the
  result matches float comparison. ``-0.0`` is normalized to ``+0.0`` first so
  both zeros map to the same bits (reference: kernel.cu:56-57). NaNs follow
  their raw bit pattern: a positive-sign NaN sorts above +inf, a negative-sign
  NaN sorts below -inf (same semantics as the reference transform).
* i32/i64 (extension; the reference supports only unsigned ints): XOR the sign
  bit, the classic two's-complement to biased mapping.

Descending order is the post-flip bitwise complement (reference: kernel.cu:18-24
``ORDER_MASK``), which preserves stability with respect to input order.

The engines sort by these bits but always *carry the original key values*
through the permutation (the reference reorders the raw keys too), so ``-0.0``
and NaN payload bits are preserved in the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "key_bits",
    "key_bits_inverse",
    "bit_width",
    "supported_key_dtypes",
    "np_key_bits",
    "np_key_bits_inverse",
]

def supported_key_dtypes() -> tuple[np.dtype, ...]:
    return (
        np.dtype(np.uint32),
        np.dtype(np.uint64),
        np.dtype(np.int32),
        np.dtype(np.int64),
        np.dtype(np.float32),
        np.dtype(np.float64),
    )


def bit_width(dtype) -> int:
    """Number of key bits for a supported key dtype (32 or 64)."""
    dtype = np.dtype(dtype)
    if dtype not in supported_key_dtypes():
        raise TypeError(f"unsupported key dtype: {dtype}")
    return dtype.itemsize * 8


def _uint_dtype(nbits: int):
    return jnp.uint32 if nbits == 32 else jnp.uint64


def key_bits(keys: jax.Array, *, descending: bool = False) -> jax.Array:
    """Transform keys to order-preserving unsigned bits (see module docstring)."""
    dtype = np.dtype(keys.dtype)
    nbits = bit_width(dtype)
    udt = _uint_dtype(nbits)
    if dtype.kind == "u":
        bits = keys.astype(udt)
    elif dtype.kind == "i":
        sign = udt(1) << udt(nbits - 1)
        bits = jax.lax.bitcast_convert_type(keys, udt) ^ sign
    elif dtype.kind == "f":
        if nbits == 32:
            u = jax.lax.bitcast_convert_type(keys, jnp.uint32)
        else:
            # TPU's X64 rewriter does not implement 64-bit bitcast-convert, so
            # go through two u32 words (minor axis is least-significant first)
            # and assemble with shifts, which the rewriter does support.
            w = jax.lax.bitcast_convert_type(keys, jnp.uint32)
            u = (w[..., 1].astype(udt) << udt(32)) | w[..., 0].astype(udt)
        # Normalize -0.0 -> +0.0. Done in the integer domain ((u << 1) == 0
        # ignores the sign bit) so backends that flush denormals in float
        # comparisons (XLA CPU, TPU) still match IEEE semantics exactly.
        u = jnp.where((u << udt(1)) == udt(0), udt(0), u)
        sign_bit = udt(1) << udt(nbits - 1)
        # Negative keys flip all bits; non-negative keys flip only the sign bit.
        negative = (u >> udt(nbits - 1)) != udt(0)
        bits = u ^ jnp.where(negative, ~udt(0), sign_bit)
    else:
        raise TypeError(f"unsupported key dtype: {dtype}")
    if descending:
        bits = ~bits
    return bits


def key_bits_inverse(bits: jax.Array, dtype, *, descending: bool = False) -> jax.Array:
    """Invert :func:`key_bits` on device (jnp mirror of
    :func:`np_key_bits_inverse`). Exact for integer dtypes; for floats, any
    ``-0.0`` in the original keys comes back as ``+0.0`` (the forward
    transform normalizes zeros), so engines carry the raw float word instead
    of using this."""
    dtype = np.dtype(dtype)
    nbits = bit_width(dtype)
    udt = _uint_dtype(nbits)
    if descending:
        bits = ~bits
    if dtype.kind == "u":
        return bits.astype(dtype)
    if dtype.kind == "i":
        # same-width unsigned->signed astype is the two's-complement
        # reinterpretation (modular), valid on TPU where 64-bit bitcast isn't
        return (bits ^ (udt(1) << udt(nbits - 1))).astype(dtype)
    if dtype.kind == "f":
        sign_bit = udt(1) << udt(nbits - 1)
        was_negative = (bits & sign_bit) == udt(0)
        u = jnp.where(was_negative, ~bits, bits ^ sign_bit)
        if nbits == 32:
            return jax.lax.bitcast_convert_type(u, jnp.float32)
        w = jnp.stack([(u & udt(0xFFFFFFFF)).astype(jnp.uint32),
                       (u >> udt(32)).astype(jnp.uint32)], axis=-1)
        return jax.lax.bitcast_convert_type(w, jnp.float64)
    raise TypeError(f"unsupported key dtype: {dtype}")


def np_key_bits_inverse(bits: np.ndarray, dtype, *, descending: bool = False) -> np.ndarray:
    """Invert :func:`np_key_bits`: recover keys from transformed bits.

    Lossless except that ``-0.0`` came out of the forward transform normalized
    to ``+0.0`` (by design). Host-side helper for the TPU f64 workflow: TPUs
    have no native float64 (device f64 arrays are lossy), so 64-bit float keys
    ride through the device as their u64 key-bits and are reconstructed here.
    """
    dtype = np.dtype(dtype)
    nbits = bit_width(dtype)
    udt = np.uint32 if nbits == 32 else np.uint64
    bits = bits.astype(udt, copy=False)
    if descending:
        bits = ~bits
    if dtype.kind == "u":
        return bits.astype(dtype, copy=False)
    if dtype.kind == "i":
        return (bits ^ udt(1 << (nbits - 1))).view(dtype)
    if dtype.kind == "f":
        sign_bit = udt(1 << (nbits - 1))
        was_negative = (bits & sign_bit) == 0
        u = np.where(was_negative, ~bits, bits ^ sign_bit)
        return u.view(dtype)
    raise TypeError(f"unsupported key dtype: {dtype}")


def np_key_bits(keys: np.ndarray, *, descending: bool = False) -> np.ndarray:
    """Pure-numpy mirror of :func:`key_bits` (the CPU oracle; cf. fpKey.hpp)."""
    dtype = np.dtype(keys.dtype)
    nbits = bit_width(dtype)
    udt = np.uint32 if nbits == 32 else np.uint64
    if dtype.kind == "u":
        bits = keys.astype(udt)
    elif dtype.kind == "i":
        bits = keys.view(udt) ^ udt(1 << (nbits - 1))
    elif dtype.kind == "f":
        u = keys.view(udt)
        u = np.where((u << udt(1)) == udt(0), udt(0), u)
        i = u.view(np.int32 if nbits == 32 else np.int64)
        flip = (i >> (nbits - 1)).view(udt) | udt(1 << (nbits - 1))
        bits = u ^ flip
    else:
        raise TypeError(f"unsupported key dtype: {dtype}")
    if descending:
        bits = ~bits
    return bits
