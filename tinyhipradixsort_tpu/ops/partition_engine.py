"""MSB-partition front-end for the bitonic engine (single chip).

TPU translation of the reference's histogram -> scan -> scatter pass
structure (kernel.cu:73-103, 136-204, 206-429), applied ONCE at the most
significant ``partition_bits`` of the compare tuple instead of once per
8-bit LSD digit: split the array into ``R = 2**partition_bits`` nearly
equal buckets, then finish each bucket with the batched row-wise bitonic
network, whose cost per element is ``f(f+1)/2`` substages for row size
``2**f`` instead of the full network's ``L(L+1)/2`` — the partition
trades two cheap permutation passes for a shorter network (for 2**28 u32
pairs: ~1218 word-substages/element direct vs ~800 partitioned).

Pipeline (all shapes static; n arbitrary):

1. *Rank sort* (the ``reorderKey`` rank analogue, kernel.cu:293-345):
   per tile of ``2**g`` elements, row-sort the single packed word
   ``(digit << g) | index`` — one u32 word through a truncated network
   regardless of how many words the request carries. Sorted position
   p, minus the tile's running digit base, is the element's stable rank.
2. *Counts + scan* (``blockCount`` + ``prefixSumExclusiveInplace``):
   per-tile digit boundaries via vmapped ``searchsorted`` on the sorted
   digits (no second data pass); bucket-major exclusive scan is two tiny
   ``cumsum`` calls on the (T, R) count matrix.
3. *Exact scatter* (``reorderKey`` scatter, kernel.cu:347-376): build the
   inverse permutation with one int32 scatter, then gather every word —
   elements land at their final bucket-partitioned positions, unpadded
   (no per-bucket capacity slack, unlike the distributed psort exchange).
4. *Bucket sorts*: rows of ``F = 2**f`` sorted by the full compare tuple
   with alternating directions (odd rows sort on complemented words — a
   fused XOR, no data movement).
5. *Two neighbor-merge rounds*: bitonic-merge row pairs (0,1),(2,3),...
   then shifted pairs (1,2),(3,4),... (second half of each window
   reversed to restore bitonicity).

Correctness: the partition is exact, so every element already sits inside
its bucket's final range ``[s, s+c)``. If every bucket count c <= F, each
range spans at most two adjacent F-rows; round-1 sorts each aligned 2F
block (fixing ranges inside it), and any range crossing an even block
boundary lies wholly inside one shifted round-2 window, whose merge sees
exactly the final multiset for those slots. Padding (all-ones compare
words) joins the top bucket and sorts to the tail. Stability follows from
the :func:`~.bitonic_engine.sort_words` word contract, which this
function inherits verbatim.

Skew: any bucket count > F (zipf heads, all-equal keys, keys concentrated
under one MSB prefix) breaks the displacement bound; the runtime check
falls back to the full network via ``lax.cond`` — the data-adaptive
answer to distributions where an MSB split cannot help. The check
EXCLUDES the sentinel padding from the top bucket (padding can reach
M-1 >= 2F-1 elements and would otherwise take the fallback for ~half of
all sizes); excluding it is safe because the pads are all-equal maxima
that land as a contiguous tail — only the <= F real top-bucket elements
need the two-row displacement bound the merge rounds guarantee.

Off by default pending on-chip measurement (VERDICT r2 item 3): enable
with ``EngineTuning(partition_bits=8)`` / ``THRS_PARTITION_BITS=8``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import common


def _iota(shape, axis, dtype):
    return jax.lax.broadcasted_iota(dtype, shape, axis)


def sort_words_partition(cmp_words: list, carry_words: list,
                         *, interpret: bool | None = None,
                         tuning=None):
    """Partition-then-sort with the :func:`~.bitonic_engine.sort_words`
    contract (stable by compare-tuple order; same word contract)."""
    from . import bitonic_engine as be

    if interpret is None:
        interpret = common.interpret_default()
    tuning = be._tuning_or_env(tuning)
    inner = dataclasses.replace(tuning, partition_bits=0)
    n = cmp_words[0].shape[0]
    ncmp = len(cmp_words)
    rb = tuning.partition_bits
    if not 1 <= rb <= 16:
        raise ValueError(f"partition_bits must be in [1, 16], got {rb}")
    if n >= (1 << 31):
        raise ValueError("partition path supports n < 2**31")
    if n <= 1:
        return cmp_words, carry_words
    L = be._ceil_log2(n)
    g = tuning.partition_tile_bits or 18
    g = min(g, L, 32 - rb)
    f = tuning.partition_row_bits or (L - rb + 1)
    f = min(max(f, 10), L)
    F = 1 << f
    M = 1 << max(f + 1, g)
    cw = [common.pad_to_multiple(w, M, jnp.uint32(0xFFFFFFFF))
          for w in cmp_words]
    kw = [common.pad_to_multiple(w, M, jnp.uint32(0)) for w in carry_words]
    words = cw + kw
    n_pad = cw[0].shape[0]
    G = 1 << g
    T = n_pad // G
    R = 1 << rb
    rows = n_pad // F

    # 1. per-tile stable rank sort of the single packed (digit, index) word
    # NOTE: steps 1-2 run unconditionally — on gate-fallback inputs (skewed
    # distributions) the rank sort is wasted work on top of the full sort.
    # Accepted: a gate-only histogram costs about as much as the rank sort
    # (both are one n-pass of VPU work), and this whole path is off by
    # default after the round-3 measured rejection (DESIGN.md §3).
    digit = cw[0] >> jnp.uint32(32 - rb)
    packed = ((digit << jnp.uint32(g))
              | _iota((T, G), 1, jnp.uint32).reshape(-1))
    (sp,), _ = be.sort_words_rows([packed], [], (T, G), interpret=interpret,
                                  tuning=inner)
    sp = sp.reshape(T, G)
    spd = (sp >> jnp.uint32(g)).astype(jnp.int32)   # sorted digit per slot
    sidx = (sp & jnp.uint32(G - 1)).astype(jnp.int32)  # original tile index

    # 2. per-tile digit boundaries from the sorted digits + bucket-major scan
    bounds = jnp.arange(R + 1, dtype=jnp.int32)
    cum = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left"))(spd)
    cum = cum.astype(jnp.int32)                      # (T, R+1) local bases
    counts = cum[:, 1:] - cum[:, :-1]                # (T, R)
    total = counts.sum(axis=0)                       # (R,)
    # skew gate: the top bucket's count includes the all-ones sentinel
    # padding (n_pad - n elements, up to M-1 >= 2F-1), which the final
    # truncation drops anyway — exclude it, or roughly half of all input
    # sizes would categorically take the fallback (r3 review)
    pad_count = jnp.int32(n_pad - n)
    real_top = total[R - 1] - pad_count
    ok = jnp.maximum(jnp.max(total[: R - 1], initial=jnp.int32(0)),
                     real_top) <= jnp.int32(F)

    def partition_branch(words):
        # associative_scan, not jnp.cumsum: XLA:TPU rewrites the cumsum
        # reduce-window into a variadic (2,128) form whose scoped-vmem
        # stack accounting blows the 20 MB limit on v5e (measured on-chip
        # r3: "Scoped allocation with size 23.09M ... It should not be
        # possible to run out of scoped vmem"); the log-depth scan lowers
        # to plain slice/pad/add
        cum_total = jax.lax.associative_scan(jnp.add, total)
        bucket_excl = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cum_total[:-1]])
        tile_base = bucket_excl[None, :] + (
            jax.lax.associative_scan(jnp.add, counts, axis=0) - counts)
        p = _iota((T, G), 1, jnp.int32)
        dest = (jnp.take_along_axis(tile_base, spd, axis=1)
                + (p - jnp.take_along_axis(cum[:, :-1], spd, axis=1)))
        orig = _iota((T, G), 0, jnp.int32) * np.int32(G) + sidx
        # 3. inverse permutation: one scatter, then one gather per word
        src = jnp.zeros((n_pad,), jnp.int32).at[dest.reshape(-1)].set(
            orig.reshape(-1), unique_indices=True, mode="promise_in_bounds")
        ws = [w[src] for w in words]

        # 4. bucket-row sorts, alternating directions via cmp complement
        par_mask = ((_iota((rows, 1), 0, jnp.uint32) & jnp.uint32(1))
                    * jnp.uint32(0xFFFFFFFF))

        def xor_rows(w):
            return (w.reshape(rows, F) ^ par_mask).reshape(-1)

        cmp_s, carry_s = be.sort_words_rows(
            [xor_rows(w) for w in ws[:ncmp]], ws[ncmp:], (rows, F),
            interpret=interpret, tuning=inner)
        ws = [xor_rows(w) for w in cmp_s] + list(carry_s)

        # 5a. merge aligned row pairs ([asc|desc] rows are bitonic)
        mc, mk = be.merge_words_rows(ws[:ncmp], ws[ncmp:],
                                     (rows // 2, 2 * F),
                                     interpret=interpret, tuning=inner)
        ws = list(mc) + list(mk)
        if rows <= 2:
            return ws

        # 5b. shifted pairs (1,2),(3,4),...: reverse each window's second
        # F-chunk to restore bitonicity, merge, splice back
        def rev_second(w):
            x = w[F:n_pad - F].reshape(-1, 2, F)
            return jnp.concatenate([x[:, :1], x[:, 1:2, ::-1]],
                                   axis=1).reshape(-1)

        mid = [rev_second(w) for w in ws]
        mc, mk = be.merge_words_rows(mid[:ncmp], mid[ncmp:],
                                     ((rows - 2) // 2, 2 * F),
                                     interpret=interpret, tuning=inner)
        merged = list(mc) + list(mk)
        return [jnp.concatenate([w[:F], m, w[n_pad - F:]])
                for w, m in zip(ws, merged)]

    def fallback_branch(words):
        c2, k2 = be.sort_words(words[:ncmp], words[ncmp:],
                               interpret=interpret, tuning=inner)
        return list(c2) + list(k2)

    out = jax.lax.cond(ok, partition_branch, fallback_branch, words)
    out = [w[:n] for w in out]
    return out[:ncmp], out[ncmp:]
