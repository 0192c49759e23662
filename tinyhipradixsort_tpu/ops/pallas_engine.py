"""Pallas TPU engine front-end: semantics-aware word packing for the bitonic
sort-merge core (:mod:`.bitonic_engine`).

This layer decides the minimal set of uint32 words the network must move for
a given request — the TPU analogue of the reference's compile-time
specialization per (key type, value type, order) (reference:
tinyhipradixsort.hpp:751-804):

* integer keys, full window, keys-only: sort the transformed bits alone
  (1 word, no stability index — equal bits imply identical keys) and rebuild
  the keys by inverting the order-preserving transform.
* float keys, full window: the transform is injective except for the
  -0.0/+0.0 collapse (kernel.cu:56-57), so keys are rebuilt from the sorted
  bits and the *stability index word is tagged* — ``(index << 1) | is_neg_zero``
  — which keeps tie order (index is strictly increasing) while recording
  exactly which zero-run slots must come back as ``-0.0``. No original-key
  carry words (bit-exact vs the reference, which reorders raw keys).
* pairs / indices / bit windows: window bits + stability index as compare
  words; payload leaves (plus key words when the window hides key bits) ride
  as carry words.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import keybits
from . import bitonic_engine, common


_interpret_default = common.interpret_default


def sort_arrays_pallas(bits, arrays, start_bit, end_bit, *,
                       unstable_ok=False, interpret=None, tuning=None):
    """Generic engine interface (same contract as the other engines)."""
    if interpret is None:
        interpret = _interpret_default()
    return bitonic_engine.sort_arrays_bitonic(
        bits, arrays, start_bit, end_bit,
        unstable_ok=unstable_ok, interpret=interpret, tuning=tuning)


def sort_semantics(keys, values, *, descending, start_bit, end_bit, want,
                   interpret=None, zeros_exact=True, seg_bits=None,
                   tuning=None, stable=True):
    """Full-semantics sort returning outputs per ``want`` with minimal words.

    ``want``: subset tuple of ("keys", "values", "indices"); ``values`` is a
    flat list of array leaves (leading axis n).

    ``seg_bits`` (optional, keys-shaped u32/u64): segmented sort — elements
    order by ``(seg_bits, key)`` lexicographic; the segment bits simply become
    the leading compare words of the tuple (CUB DeviceSegmentedRadixSort
    analogue; no reference counterpart).

    ``zeros_exact=False`` (float keys-only fast path) sorts the transformed
    bits alone — 1 word instead of 2 — at the cost of every ``-0.0`` key
    coming back as ``+0.0`` (the transform normalizes zeros; all other
    values, including every NaN payload, invert exactly).
    """
    if interpret is None:
        interpret = _interpret_default()
    batched = keys.ndim == 2
    rows = keys.shape[0] if batched else 1  # batch size B
    n = keys.shape[-1] if batched else keys.shape[0]  # per-row length
    dtype = np.dtype(keys.dtype)
    width = dtype.itemsize * 8
    full = start_bit == 0 and end_bit == width
    bits = keybits.key_bits(keys, descending=descending)
    cmp_words = [w.reshape(-1)
                 for w in bitonic_engine.bits_to_cmp_words(bits, start_bit, end_bit)]
    nk = len(cmp_words)  # key-bit words (before the stability index word)
    nseg = 0
    if seg_bits is not None:
        seg_width = np.dtype(seg_bits.dtype).itemsize * 8
        seg_words = [w.reshape(-1) for w in bitonic_engine.bits_to_cmp_words(
            seg_bits, 0, seg_width)]
        nseg = len(seg_words)
        cmp_words = seg_words + cmp_words

    def reshape_out(a):
        return a.reshape((rows, n) + a.shape[1:]) if batched else a

    # Full-width float keys rebuild from the sorted bits: the transform is
    # injective except for -0.0/+0.0, and the stability index's low bit
    # records which zeros were negative (tag preserves tie order).
    kind = keybits.dtype_kind(dtype)
    tag_zero = (full and kind == "f" and zeros_exact
                and "keys" in want and n < (1 << 31))
    keys_from_bits = full and (kind in "iu" or tag_zero
                               or (kind == "f" and not zeros_exact))
    need_keys_carry = ("keys" in want) and not keys_from_bits
    need_vals = "values" in want
    need_idx_out = "indices" in want
    # stable=False drops the stability index word (u32+u32 pairs: 3 -> 2
    # words, u64+u64: 5 -> 4) and runs tie-consistent kernels instead —
    # only when the engine introduces no sentinel padding (an all-ones real
    # tuple would tie the pads and could be truncated in their place):
    # per-row length a power of two, and for the flat path n >= 2**MIN_L.
    pad_free = (n & (n - 1)) == 0 and (
        batched or n >= (1 << bitonic_engine.MIN_L))
    stable_needed = (need_idx_out or tag_zero
                     or ((need_vals or need_keys_carry)
                         and (stable or not pad_free)))
    allow_ties = (not stable_needed) and (need_vals or need_keys_carry)
    pack_bits = 0
    if n > 1:
        if stable_needed:
            if n >= (1 << 32):
                raise ValueError("pallas sort supports n < 2**32")
            # within-row index: rows never interact, so tuples need only be
            # distinct per row
            idx = jax.lax.broadcasted_iota(
                jnp.uint32, (rows, n), 1).reshape(-1)
            if tag_zero:
                idx = (idx << jnp.uint32(1)) | _neg_zero_flag(keys).reshape(-1)
            cmp_words = cmp_words + [idx]
            # Single-word packing: when the window's significant bits and
            # the stability index fit one u32, sort (window << ib) | idx as
            # ONE compare word — window sorts (the reference's per-digit
            # usage, unittest.cpp:248-355) then run a one-word-shorter
            # network; keys-only window sorts hit the min/max CE path.
            # Guard: with a pow2 n the max real index is all-ones, so an
            # exactly-32-bit packing could tie the all-ones pad sentinel
            # (MIN_L padding) — require a spare bit in that case.
            ww = end_bit - start_bit
            ib = bitonic_engine._ceil_log2(n) + (1 if tag_zero else 0)
            if (nseg == 0 and nk == 1 and ww < 32
                    and ww + ib + (0 if n & (n - 1) else 1) <= 32):
                cmp_words = [(cmp_words[0] << jnp.uint32(ib)) | cmp_words[1]]
                pack_bits = ib

        carry_words, recipes = [], []
        if need_keys_carry:
            ws, recipe = bitonic_engine.array_to_words(_flat_leading(keys, batched))
            recipe["nwords"] = len(ws)
            carry_words.extend(ws)
            recipes.append(recipe)
        if need_vals:
            for leaf in values:
                ws, recipe = bitonic_engine.array_to_words(_flat_leading(leaf, batched))
                recipe["nwords"] = len(ws)
                carry_words.extend(ws)
                recipes.append(recipe)

        if batched:
            cmp_out, carry_out = bitonic_engine.sort_words_rows(
                cmp_words, carry_words, (rows, n), interpret=interpret,
                tuning=tuning, allow_tied_carries=allow_ties)
        else:
            cmp_out, carry_out = bitonic_engine.sort_words(
                cmp_words, carry_words, interpret=interpret, tuning=tuning,
                allow_tied_carries=allow_ties)
    else:
        cmp_out, carry_out, recipes = cmp_words, None, None

    result = []
    pos = 0
    rpos = 0
    if "keys" in want:
        if n <= 1:
            result.append(keys)
        elif keys_from_bits:
            kw = cmp_out[nseg:nseg + nk]
            if pack_bits:
                kw = [kw[0] >> jnp.uint32(pack_bits)]
            sorted_bits = _join_cmp(kw, dtype, start_bit, end_bit, bits.dtype)
            raw = keybits.key_bits_inverse_raw(
                sorted_bits, dtype, descending=descending)
            if tag_zero:
                # restore -0.0 signs in the raw integer domain: a float-
                # domain select would let XLA:CPU canonicalize neighboring
                # bf16/f16 NaN payload bits
                zero_bits = keybits.np_key_bits(
                    np.zeros(1, dtype), descending=descending)[0]
                was_neg = (cmp_out[-1] & jnp.uint32(1)) == jnp.uint32(1)
                udt = raw.dtype.type
                sign = udt(1 << (keybits.bit_width(dtype) - 1))
                raw = jnp.where((sorted_bits == zero_bits) & was_neg,
                                raw | sign, raw)
            result.append(reshape_out(keybits.raw_to_keys(raw, dtype)))
        else:
            k = recipes[rpos]["nwords"]
            result.append(reshape_out(bitonic_engine.words_to_array(
                carry_out[pos:pos + k], recipes[rpos])))
            pos += k
            rpos += 1
    if "values" in want:
        if n <= 1:
            result.append(list(values))
        else:
            leaves = []
            for _ in values:
                k = recipes[rpos]["nwords"]
                leaves.append(reshape_out(bitonic_engine.words_to_array(
                    carry_out[pos:pos + k], recipes[rpos])))
                pos += k
                rpos += 1
            result.append(leaves)
    if "indices" in want:
        idx_dt = jnp.int32 if n < 2**31 else jnp.int64
        if n <= 1:
            iota = jax.lax.broadcasted_iota(idx_dt, (rows, n), 1)
            result.append(iota if batched else iota.reshape(-1))
        else:
            idx_word = cmp_out[-1]
            if pack_bits:
                idx_word = idx_word & jnp.uint32((1 << pack_bits) - 1)
            if tag_zero:
                idx_word = idx_word >> jnp.uint32(1)
            result.append(reshape_out(idx_word.astype(idx_dt)))
    return tuple(result)


def _flat_leading(a, batched):
    """Collapse the (B, n) leading axes of a batched leaf to one axis."""
    if not batched:
        return a
    return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])


_neg_zero_flag = keybits.neg_zero_flag



def _join_cmp(cmp_words, key_dtype, start_bit, end_bit, bits_dtype):
    """Rebuild full-width transformed bits from sorted compare words.

    Only used when the window is full-width (keys_from_bits), so the words
    are exactly the hi/lo split (or the single word) of the bits.
    """
    if np.dtype(bits_dtype) == np.uint32:
        return cmp_words[0]
    if len(cmp_words) == 2:
        return bitonic_engine.join_u64(cmp_words[0], cmp_words[1])
    return cmp_words[0].astype(jnp.uint64)
