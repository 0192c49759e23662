"""Pallas TPU bitonic sort-merge engine — the single-chip speed path.

Why bitonic and not a literal radix pipeline: the reference's 3-kernel radix
pass (histogram -> scan -> scatter; reference kernel.cu:73-429) is built on
GPU primitives TPUs do not have — shared-memory atomics, warp ballots, and
per-element global scatter. On TPU, XLA's scatter/gather run at ~0.1 Gelem/s
(serialized), two orders of magnitude below HBM speed-of-light. A bitonic
sorting network, by contrast, moves data exclusively along *static* XOR
strides: every compare-exchange partner is ``i ^ 2**j``, which maps to
vector-register rolls and contiguous DMA — the only data-dependent operation
is the compare-select itself. That makes bitonic the idiomatic TPU design:
VPU-bound, fully static shapes, zero scatter.

Semantics are identical to the reference sort (stable LSD radix over a bit
window): we sort fixed tuples of uint32 words — ``cmp`` words compared
lexicographically as unsigned ints (key bits from
:mod:`tinyhipradixsort_tpu.keybits`, then a stability index word when
required), plus ``carry`` words (payloads / original key bits) that ride the
permutation. Stability is obtained by appending the element index to the
compare tuple, which also makes all tuples distinct (a requirement for a
deterministic network).

Execution model
---------------
The network for ``N = 2**L`` elements is ``(k, j)`` substages, ``k`` in
``1..L``, ``j`` in ``k-1..0``: compare-exchange with partner ``i ^ 2**j``,
ascending iff bit ``k`` of ``i`` is 0. Substages are grouped into *sweeps*;
each sweep is one ``pallas_call`` whose tile covers index bits
``[0, c) ∪ [j_lo, j_hi]`` (a contiguous low chunk of ``2**c`` elements plus a
contiguous group of ``g`` higher bits — the classic hyperblock fusion of
cross-block stages). Within a sweep every substage's ``j`` lies in the tile,
so the whole group runs in VMEM between one HBM read and one HBM write.
Direction bits ``k`` outside the tile are uniform per grid step (derived from
``program_id``); in-tile bits become iota masks.

For 2**28 u32 keys this plan is ~24 HBM sweeps (vs ~400 for a naive
stage-per-launch bitonic), i.e. ~50 GB of traffic. Direction handling is
hoisted out of the substages entirely: descending blocks complement their
cmp words at stage entry/exit (position bit k is invariant within stage k,
so the complement state rides safely), letting every compare-exchange run
forced-ascending — pure min/max for 1-word sorts (see
``make_sweep_kernel``).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, replace as _dc_replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import common

# ---------------------------------------------------------------------------
# Network / sweep planning (host side, all static)
# ---------------------------------------------------------------------------

LANE_BITS = 7  # 128 lanes
MIN_L = 10  # minimum padded problem size 2**10 (one (8, 128) tile)


@dataclass(frozen=True)
class Sweep:
    """One pallas_call: tile covers bits [0, c) ∪ [j_lo, j_lo + g)."""

    c: int  # low contiguous chunk bits
    g: int  # high group bits
    j_lo: int  # global bit position of the first group bit (j_lo >= c)
    L: int  # total problem bits
    # substages executed, in order: (k, j) with j in tile bits
    substages: tuple[tuple[int, int], ...]
    # stored-k value whose direction is forced ascending (batched row sort:
    # the final per-row merge stage must not alternate with row parity)
    forced_asc: int | None = None
    # storage-rotation fusion: rotate the tile in VMEM after load (rot_in)
    # / before store (rot_out) instead of paying a separate XLA transpose
    # pass over HBM (~7 ms/word each way at 2**28). Values are the rotation
    # amount within T = c+g tile bits; 0 = none. Only meaningful on local
    # sweeps (tile == one 2**T block).
    rot_in: int = 0
    rot_out: int = 0

    @property
    def tile_elems(self) -> int:
        return 1 << (self.c + self.g)

    def tile_bit(self, j: int) -> int:
        """Map global index bit j (in tile) to the tile-local flat bit."""
        if j < self.c:
            return j
        assert self.j_lo <= j < self.j_lo + self.g
        return self.c + (j - self.j_lo)

    def has_bit(self, j: int) -> bool:
        return j < self.c or self.j_lo <= j < self.j_lo + self.g

    def grid(self) -> tuple[int, int]:
        # global index i = a * 2**(j_lo+g) + e * 2**j_lo + b * 2**c + t
        A = 1 << (self.L - (self.j_lo + self.g))
        B = 1 << (self.j_lo - self.c)
        return (A, B)

    def dir_spec(self, k: int):
        """How to compute direction bit k: ('tile', flat_bit) | ('a'|'b', bit)."""
        if self.has_bit(k):
            return ("tile", self.tile_bit(k))
        if self.c <= k < self.j_lo:
            return ("b", k - self.c)
        if k >= self.j_lo + self.g:
            return ("a", k - (self.j_lo + self.g))
        raise AssertionError(f"unreachable direction bit {k} for {self}")


def plan_sweeps(L: int, tile_bits: int, chunk_bits: int,
                rot: int = 0, stages=None,
                forced_asc: int | None = None,
                g_max_cross: int | None = None,
                wide_cross_chunk: bool = True) -> list[Sweep]:
    """Greedy sweep plan for the full bitonic network on 2**L elements.

    tile_bits: max tile size exponent (VMEM budget); chunk_bits: contiguous
    low-bit chunk used by cross-stage (hyperblock) sweeps — also the DMA
    granularity (2**chunk_bits * 4B contiguous per DMA).

    g_max_cross: max high-group bits per cross sweep (default
    tile_bits - chunk_bits). Raising it fuses more cross-block substages
    per HBM round trip at the cost of a smaller contiguous chunk
    (c = tile_bits - g, i.e. shorter DMA bursts) on the widest sweeps.

    rot: storage bit rotation. The network is conjugated by the index bit
    permutation sigma(x) = (x + rot) mod T for x < T = min(tile_bits, L)
    (identity above), with the data physically stored at the bit-rotated
    position (sort_words transposes on entry/exit). Rotating by 10 moves the
    most frequent substages (low j — executed once per stage) onto
    sublane-aligned flat bits where the cheap pair-split compare-exchange
    applies, leaving the rare high-j substages on lane rolls: measured ~12%
    end-to-end on 2**28 u32.
    """
    tile_bits = min(tile_bits, L)
    chunk_bits = min(chunk_bits, tile_bits)
    g_max = tile_bits - chunk_bits
    if g_max_cross is not None:
        # override replaces the default (so lowering it for an A/B run works,
        # ADVICE r2); the clamp keeps the low chunk at >= one 128-lane row
        # (c = tile_bits - g >= LANE_BITS)
        g_max = max(1, min(g_max_cross, tile_bits - LANE_BITS))
    T = tile_bits

    def sigma(x: int) -> int:
        return (x + rot) % T if x < T else x

    stages = range(1, L + 1) if stages is None else stages
    fa = sigma(forced_asc) if forced_asc is not None else None
    subs = [(sigma(k), sigma(j))
            for k in stages for j in range(k - 1, -1, -1)]
    sweeps: list[Sweep] = []
    pos = 0
    while pos < len(subs):
        _, j0 = subs[pos]
        if j0 < tile_bits:
            # local sweep: contiguous tile [0, size)
            size = min(tile_bits, L)
            c = min(chunk_bits, size)
            g, j_lo = size - c, c
            take = []
            while pos < len(subs) and subs[pos][1] < size:
                take.append(subs[pos])
                pos += 1
        else:
            # cross (hyperblock) sweep: group [j_lo, j0]
            j_lo = max(tile_bits, j0 - max(g_max, 1) + 1)
            g = j0 - j_lo + 1
            # wide_cross_chunk: the low chunk is payload-only in a cross
            # sweep (no substage touches bits < j_lo), so grow it to the
            # full tile budget — the block goes from 2**(13+g) to
            # 2**tile_bits elements, cutting grid steps up to 16x; measured
            # on v5e the narrow form left cross sweeps at 143-430 GB/s
            # (grid-step overhead ~0.8 us/step), see
            # benchmarks/profile_sweeps_r3.txt
            c = (tile_bits - g) if wide_cross_chunk \
                else min(chunk_bits, tile_bits - g)
            take = []
            while pos < len(subs) and j_lo <= subs[pos][1] <= j0:
                take.append(subs[pos])
                pos += 1
        sweeps.append(Sweep(c=c, g=g, j_lo=j_lo, L=L, substages=tuple(take),
                            forced_asc=fa))
    return sweeps


# ---------------------------------------------------------------------------
# Kernel generation
# ---------------------------------------------------------------------------


def _bit_vec(shape, axis: int, bit: int):
    """Int32 0/1 vector: value of `bit` of the index along `axis`."""
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return (idx >> bit) & 1


def _flat_bit_vec(shape, flat_bit: int):
    if flat_bit < LANE_BITS:
        return _bit_vec(shape, 1, flat_bit)
    return _bit_vec(shape, 0, flat_bit - LANE_BITS)


def _partner(x, flat_bit: int, hi_mask):
    """Value of partner element (tile flat index ^ 2**flat_bit).

    x: (rows, 128) uint32, tile flat index = row * 128 + lane; hi_mask is the
    boolean vector of that flat bit. pltpu.roll lowers to a single
    tpu.dynamic_rotate (jnp.roll would be slices+concat).
    """
    from jax.experimental.pallas import tpu as pltpu

    if flat_bit < LANE_BITS:
        d, axis = 1 << flat_bit, 1
    else:
        d, axis = 1 << (flat_bit - LANE_BITS), 0
    size = x.shape[axis]
    # shift must be i32 (under x64, a python int would bind as i64)
    fwd = pltpu.roll(x, jnp.int32(size - d), axis)  # x[pos + d]
    bwd = pltpu.roll(x, jnp.int32(d), axis)  # x[pos - d]
    return jnp.where(hi_mask, bwd, fwd)


def _lex_lt(xs, ps, ncmp: int):
    """ps <_lex xs on the first ncmp words (unsigned)."""
    lt = ps[ncmp - 1] < xs[ncmp - 1]
    for w in range(ncmp - 2, -1, -1):
        lt = (ps[w] < xs[w]) | ((ps[w] == xs[w]) & lt)
    return lt


def _umin_umax(a, b):
    """(min, max) of two u32 vectors via one compare + two selects.

    jnp.minimum/maximum on u32 lowers to arith.minui/maxui, which the v5e
    Mosaic backend fails to legalize on vectors (measured on-chip r3:
    "failed to legalize operation 'arith.minui'"); unsigned compare +
    select is the known-good r1 form.
    """
    lt = a < b
    return jnp.where(lt, a, b), jnp.where(lt, b, a)


def _stage_groups(substages):
    """Group consecutive substages by (stored) stage k.

    Substages arrive in network order — all of stage k's in-tile substages
    are consecutive — so one linear pass suffices.
    """
    groups: list[tuple[int, list[int]]] = []
    for k, j in substages:
        if groups and groups[-1][0] == k:
            groups[-1][1].append(j)
        else:
            groups.append((k, [j]))
    return groups


def make_sweep_kernel(sweep: Sweep, nwords: int, ncmp: int,
                      tie_safe: bool = False, fuse_pair2: bool = False):
    """tie_safe: make the roll-form CE tie-consistent — both partners of a
    tied pair keep their own tuple (one extra lex chain per substage), so
    duplicate cmp tuples with DISTINCT carries still move as a permutation.
    The default roll form duplicates the low tuple on ties (harmless only
    under the sort_words word contract); the pair-split form is always
    tie-consistent. Required by the unstable pairs path (no stability index
    word)."""
    rows = sweep.tile_elems >> LANE_BITS
    shape = (rows, 128)

    def substage_roll(xs, fb):
        """Lane-bit CE: partner via rolls (cross-lane movement)."""
        from jax.experimental.pallas import tpu as pltpu

        hbit = _flat_bit_vec(shape, fb)
        if nwords == 1:
            # keys-only single word: min/max IS the compare-exchange (ties
            # commute), replacing partner-select + compare + swap-select
            x = xs[0]
            if fb < LANE_BITS:
                d, axis = 1 << fb, 1
            else:
                d, axis = 1 << (fb - LANE_BITS), 0
            a = pltpu.roll(x, jnp.int32(x.shape[axis] - d), axis)  # x[pos+d]
            mn, mx = _umin_umax(x, a)
            return [jnp.where(hbit == 1,
                              pltpu.roll(mx, jnp.int32(d), axis), mn)]
        ps = [_partner(x, fb, hbit == 1) for x in xs]
        if tie_safe:
            # strict in both directions: lo swaps iff p < x, hi swaps iff
            # x < p — a tied pair swaps at NEITHER position, so the pair's
            # two (possibly distinct-carry) tuples both survive. int32 mask
            # algebra, not an i1-vector select (Mosaic fails to legalize
            # select_n on i1 vectors).
            one, zero = jnp.int32(1), jnp.int32(0)
            lo_lt = jnp.where(_lex_lt(xs, ps, ncmp), one, zero)
            hi_lt = jnp.where(_lex_lt(ps, xs, ncmp), one, zero)
            swap = (jnp.where(hbit == 0, lo_lt, hi_lt) == 1)
        else:
            # swap iff (partner < self) == keep_min, keep_min = lo position.
            # A single compare chain suffices because tie-swaps are harmless
            # under the sort_words word contract (ties imply bit-identical
            # word tuples): with a stability index in cmp, tuples are
            # distinct; without one there are no carry words, so swapping
            # equal cmp tuples is a no-op.
            swap = (hbit == 0) == _lex_lt(xs, ps, ncmp)
        return [jnp.where(swap, p, x) for x, p in zip(xs, ps)]

    def substage_pair(xs, fb):
        """Sublane-bit CE on the half-split view: all compare/select work
        runs on half-sized arrays (the dominant substage class, ~2x cheaper
        than the roll form)."""
        m = 1 << (fb - LANE_BITS)
        if nwords == 1:
            # single-word min/max form: a full CE in two vector ops
            x = xs[0].reshape(rows // (2 * m), 2, m, 128)
            mn, mx = _umin_umax(x[:, 0], x[:, 1])
            return [jnp.stack([mn, mx], axis=1).reshape(shape)]
        los = [x.reshape(rows // (2 * m), 2, m, 128)[:, 0] for x in xs]
        his = [x.reshape(rows // (2 * m), 2, m, 128)[:, 1] for x in xs]
        # keep (lo, hi) iff lo < hi — ties may go either way (harmless
        # under the word contract). _lex_lt(a, b) is b < a.
        s = _lex_lt(his, los, ncmp)
        out = []
        for lo, hi in zip(los, his):
            nlo = jnp.where(s, lo, hi)
            nhi = jnp.where(s, hi, lo)
            out.append(jnp.stack([nlo, nhi], axis=1).reshape(shape))
        return out

    def substage_pair2(xs, fb_a, fb_b):
        """Fused CE over two sublane bits (the r4 substage-reduction A/B,
        VERDICT r3 item 8): one 4-way split view runs both substages'
        compare-exchanges on quarter arrays with a single reassembly
        instead of two interleave rounds. Same compare count as two
        :func:`substage_pair` calls — the candidate saving is one
        stack/interleave relayout per substage pair. Gated by
        ``EngineTuning.fuse_pair2`` pending on-chip measurement."""
        pa, pb = fb_a - LANE_BITS, fb_b - LANE_BITS
        p_hi, p_lo = max(pa, pb), min(pa, pb)
        C = 1 << p_lo
        Bm = 1 << (p_hi - p_lo - 1)
        A = rows >> (p_hi + 1)
        vs = [x.reshape(A, 2, Bm, 2, C, 128) for x in xs]

        def at(vw, i, j):
            # (i, j) = values of bits (pa, pb); axis 1 holds p_hi
            ii, jj = (i, j) if pa == p_hi else (j, i)
            return vw[:, ii, :, jj]

        q = {(i, j): [at(v, i, j) for v in vs]
             for i in (0, 1) for j in (0, 1)}

        def ce(lo, hi):
            # identical tie behavior to substage_pair: the whole tuple
            # swaps or not as a unit (tie-consistent; keep (lo, hi) iff
            # lo < hi, ties may swap — harmless under the word contract)
            if nwords == 1:
                mn, mx = _umin_umax(lo[0], hi[0])
                return [mn], [mx]
            s = _lex_lt(hi, lo, ncmp)  # lo < hi
            return ([jnp.where(s, l, h) for l, h in zip(lo, hi)],
                    [jnp.where(s, h, l) for l, h in zip(lo, hi)])

        # substage order: CE across fb_a first, then across fb_b
        a00, a10 = ce(q[(0, 0)], q[(1, 0)])
        a01, a11 = ce(q[(0, 1)], q[(1, 1)])
        r = {}
        r[(0, 0)], r[(0, 1)] = ce(a00, a01)
        r[(1, 0)], r[(1, 1)] = ce(a10, a11)
        out = []
        for w in range(nwords):
            # assemble (A, 2, Bm, 2, C, 128) back: axis 1 = p_hi bit,
            # axis 3 = p_lo bit; r is keyed (pa-bit value, pb-bit value)
            def hi_part(hbit, lbit):
                i, j = (hbit, lbit) if pa == p_hi else (lbit, hbit)
                return r[(i, j)][w]
            s0 = jnp.stack([hi_part(0, 0), hi_part(0, 1)], axis=2)
            s1 = jnp.stack([hi_part(1, 0), hi_part(1, 1)], axis=2)
            out.append(jnp.stack([s0, s1], axis=1).reshape(shape))
        return out

    def tile_rot(x, rot):
        """Apply the storage bit-rotation within the tile in VMEM (the
        in-kernel form of _rotate_storage on one 2**T block)."""
        T = sweep.c + sweep.g
        r = rot % T
        if r == 0:
            return x
        return (x.reshape(1 << (T - r), 1 << r)
                .swapaxes(0, 1)
                .reshape(shape))

    def kernel(*refs):
        ins, outs = refs[:nwords], refs[nwords:]
        xs = [r[0, :, 0, :, :].reshape(shape) for r in ins]
        if sweep.rot_in:
            xs = [tile_rot(x, -sweep.rot_in) for x in xs]
        a = pl.program_id(0)
        b = pl.program_id(1)

        def stage_cmask(k):
            """Complement mask (0 / 0xFFFFFFFF per element) of stage k's
            direction bit, or None for ascending-forced stages."""
            if k == sweep.forced_asc:
                return None
            kind, bit = sweep.dir_spec(k)
            if kind == "tile":
                bv = _flat_bit_vec(shape, bit)  # int32 0/1
                return jnp.uint32(0) - bv.astype(jnp.uint32)
            d = ((a if kind == "a" else b) >> bit) & 1  # scalar
            return jnp.where(d == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))

        # Per-stage direction complement: descending blocks complement
        # their cmp words (unsigned-complement order == reversed order),
        # every substage then runs forced-ascending, and the complement is
        # undone at the stage boundary. Sound because substages of stage k
        # only move elements within 2**k blocks (j < k), so position bit k
        # — and with it each element's complement state — is invariant
        # across the stage. This removes ALL per-substage direction work:
        # 2*ncmp xors per stage replace a mask compute + extra select per
        # substage, and the keys-only CE collapses to pure min/max.
        # (Masks that ARE recomputed — hbit, cmask — stay cheap; caching
        # them across substages measured ~20% worse via VMEM spills.)
        for k, js in _stage_groups(sweep.substages):
            cm = stage_cmask(k)
            if cm is not None:
                xs = [x ^ cm if w < ncmp else x for w, x in enumerate(xs)]
            fbs = [sweep.tile_bit(j) for j in js]
            i = 0
            while i < len(fbs):
                fb = fbs[i]
                # pair-split only when halves are (8,128)-tile aligned
                # (m >= 8): sub-tile strided slicing costs more than it
                # saves (measured)
                if (fuse_pair2 and i + 1 < len(fbs)
                        and fb >= LANE_BITS + 3
                        and fbs[i + 1] >= LANE_BITS + 3):
                    xs = substage_pair2(xs, fb, fbs[i + 1])
                    i += 2
                    continue
                if fb >= LANE_BITS + 3:
                    xs = substage_pair(xs, fb)
                else:
                    xs = substage_roll(xs, fb)
                i += 1
            if cm is not None:
                xs = [x ^ cm if w < ncmp else x for w, x in enumerate(xs)]
        if sweep.rot_out:
            xs = [tile_rot(x, sweep.rot_out) for x in xs]
        g_dim = 1 << sweep.g
        c_rows = (1 << sweep.c) >> LANE_BITS
        for o, x in zip(outs, xs):
            o[0, :, 0, :, :] = x.reshape(g_dim, c_rows, 128)

    return kernel


def run_sweep(words, sweep: Sweep, ncmp: int, interpret: bool,
              tie_safe: bool = False, fuse_pair2: bool = False):
    nwords = len(words)
    # A is derived from the words' real length, not 2**sweep.L: only the
    # block span (j_lo + g bits) must divide the total. Direction bits
    # k >= j_lo+g read `(a >> bit) & 1`, which is bit k of the flat index
    # for ANY block count — this is what lets the batched row paths pad the
    # batch axis to a tile multiple instead of a power of two.
    total = int(words[0].shape[0])
    span = 1 << (sweep.j_lo + sweep.g)
    assert total % span == 0, (total, sweep)
    A, B = total >> (sweep.j_lo + sweep.g), 1 << (sweep.j_lo - sweep.c)
    g_dim = 1 << sweep.g
    c_rows = (1 << sweep.c) >> LANE_BITS
    view = (A, g_dim, B, c_rows, 128)
    block = (1, g_dim, 1, c_rows, 128)
    # literal zeros must be int32: under jax_enable_x64 plain `0` traces as
    # i64, which Mosaic's index-map lowering rejects
    zero = np.int32(0)
    spec = pl.BlockSpec(block, lambda a, b: (a, zero, b, zero, zero))
    kernel = make_sweep_kernel(sweep, nwords, ncmp, tie_safe, fuse_pair2)
    shaped = [w.reshape(view) for w in words]
    from jax.experimental.pallas import tpu as pltpu
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid=(A, B),
        in_specs=[spec] * nwords,
        out_specs=tuple([spec] * nwords),
        out_shape=tuple(jax.ShapeDtypeStruct(view, jnp.uint32) for _ in range(nwords)),
        compiler_params=params,
        interpret=interpret,
        # each grid step reads and writes the same block: aliasing makes the
        # whole network run in place, halving live HBM (word count x n x 4B
        # instead of 2x) — what lets 5-word configs (u64+u64 pairs) fit
        input_output_aliases={i: i for i in range(nwords)},
    )(*shaped)
    out = out if isinstance(out, (tuple, list)) else (out,)
    return [o.reshape(-1) for o in out]


# ---------------------------------------------------------------------------
# Word packing
# ---------------------------------------------------------------------------


def _ceil_log2(n: int) -> int:
    return max(int(math.ceil(math.log2(max(n, 1)))), 0)


def split_u64(x):
    """u64 array -> (hi, lo) u32 words via shifts (TPU-safe; no 64-bit bitcast)."""
    lo = (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (x >> jnp.uint64(32)).astype(jnp.uint32)
    return hi, lo


def join_u64(hi, lo):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def array_to_words(a) -> tuple[list, dict]:
    """Decompose an array (leading axis n) into uint32 words + recipe."""
    dtype = np.dtype(a.dtype)
    if a.ndim == 1:
        if dtype.itemsize == 8:
            if dtype.kind == "f":
                # f64 keys never reach the device path on TPU (sort.py guards);
                # on CPU x64 the bitcast is exact.
                u = jax.lax.bitcast_convert_type(a, jnp.uint32)
                return [u[..., 1], u[..., 0]], {"kind": "64f", "dtype": dtype}
            # i64 -> u64 astype is the two's-complement reinterpretation
            hi, lo = split_u64(a if dtype.kind == "u" else a.astype(jnp.uint64))
            return [hi, lo], {"kind": "64", "dtype": dtype}
        if dtype.itemsize == 4:
            return [_bitcast_u32(a)], {"kind": "32", "dtype": dtype}
        if dtype.itemsize == 2:
            # bit-exact widen: bitcast to u16 then zero-extend (preserves
            # NaN payload bits of f16/bf16, unlike a value cast)
            u = jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
            return [u], {"kind": "narrow16", "dtype": dtype}
        if dtype.itemsize == 1:
            u = a.astype(jnp.uint32 if dtype.kind in "ui" else jnp.float32)
            return [_bitcast_u32(u)], {"kind": "narrow", "dtype": dtype}
        raise TypeError(f"unsupported payload dtype {dtype}")
    if a.ndim == 2 and dtype.itemsize == 4:
        return [_bitcast_u32(a[:, i]) for i in range(a.shape[1])], {
            "kind": "2d32", "dtype": dtype, "cols": a.shape[1]}
    raise TypeError(f"unsupported payload array: shape {a.shape} dtype {dtype}")


def _bitcast_u32(a):
    if np.dtype(a.dtype) == np.uint32:
        return a
    return jax.lax.bitcast_convert_type(a, jnp.uint32)


def words_to_array(words: list, recipe: dict):
    dtype = recipe["dtype"]
    kind = recipe["kind"]
    if kind == "64f":
        w = jnp.stack([words[1], words[0]], axis=-1)
        return jax.lax.bitcast_convert_type(w, jnp.float64)
    if kind == "64":
        u = join_u64(words[0], words[1])
        return u.astype(dtype) if dtype.kind != "u" else u
    if kind == "32":
        return _bitcast_from_u32(words[0], dtype)
    if kind == "narrow16":
        return jax.lax.bitcast_convert_type(
            words[0].astype(jnp.uint16), dtype)
    if kind == "narrow":
        wide = _bitcast_from_u32(words[0], np.dtype(np.uint32) if dtype.kind in "ui" else np.dtype(np.float32))
        return wide.astype(dtype)
    if kind == "2d32":
        return jnp.stack([_bitcast_from_u32(w, dtype) for w in words], axis=1)
    raise AssertionError(kind)


def _bitcast_from_u32(w, dtype):
    dtype = np.dtype(dtype)
    if dtype == np.uint32:
        return w
    return jax.lax.bitcast_convert_type(w, dtype)


def bits_to_cmp_words(bits, start_bit: int, end_bit: int) -> list:
    """Window-extracted key bits -> list of u32 compare words (hi first)."""
    window = common.window_values(bits, start_bit, end_bit)
    width = end_bit - start_bit
    if np.dtype(window.dtype) == np.uint32:
        return [window]
    if width <= 32:
        return [window.astype(jnp.uint32)]
    hi, lo = split_u64(window)
    return [hi, lo]


# ---------------------------------------------------------------------------
# Engine entry
# ---------------------------------------------------------------------------

# Per-word tile byte budget -> tile_bits selection (_tile_bits_for).
# 32 MB keeps <= 5-word configs (KV64 stable) at the full 2**18 tile; the
# old 8 MB default dropped them to 2**16 (4x the grid steps, 2 extra
# cross-sweep levels). Decisive A/B at n=2**28 on v5e
# (benchmarks/pairs_ab_r4_exp28.txt, 2026-08-19): KV64 stable 0.147 ->
# 0.190 Gpairs/s (+29%), KV64 unstable +11%, KV32 stable +10%, KV32
# unstable unchanged; 5 words at 2**18 use ~21 MB of the 100 MB scoped
# VMEM, and the budget still self-limits very wide tuples (> 12 words
# fall back to smaller tiles). THRS_PAD_TARGET_MB overrides.
_PAD_TARGET_BYTES = 32 << 20


@dataclass(frozen=True)
class EngineTuning:
    """Sweep-planner knobs, carried explicitly so they key every jit cache.

    Read from the environment *at call time* (:meth:`from_env`) by the
    public entry points and threaded down as a static argument — changing a
    ``THRS_*`` env var between calls therefore takes effect (it produces a
    new hashable tuning object and hence a fresh trace) instead of being
    silently baked into a stale compiled plan.

    max_substages: Mosaic's remote compiler OOMs (SIGKILL) above ~100-120
    substages per kernel with the pair-split CE form; oversized sweeps are
    split into consecutive chunks over the same tile (one extra HBM round
    trip each, ~3 ms at 2**28 — compile feasibility buys it).

    cross_g_max: cross (hyperblock) sweeps may fuse up to this many high
    bits per HBM round trip; the contiguous DMA chunk shrinks to
    2**(tile_bits - g) * 4B on the widest sweeps (2**10*4B = 4 KB at g=8 —
    still burst-efficient). At L=28 this cuts the merge phase from 15 cross
    sweeps (g<=5) to 12.

    tile_bits_cap: the local-sort kernel's substage count grows with tile
    size and Mosaic compile time grows superlinearly (2**19 exceeded 15 min
    on v5e vs ~4 min for 2**18; runtime gain would have been <10%).
    """

    max_substages: int = 96
    cross_g_max: int = 8
    tile_bits_cap: int = 18
    # per-word tile byte budget for _tile_bits_for (~4 live 4B buffers per
    # word). 32 MB (see _PAD_TARGET_BYTES) keeps <= 5-word configs (KV64)
    # at the full 2**18 tile; the old 8 MB default dropped them to 2**16
    # (4x the grid steps, 2 extra cross-sweep levels) — the r4 exp-28 A/B
    # measured the flip at +29% KV64 / +10% KV32.
    pad_target_bytes: int = _PAD_TARGET_BYTES
    # fused two-bit pair-split CE (substage_pair2): same compare count,
    # one reassembly per substage pair instead of two interleaves. r4
    # A/B candidate (VERDICT r3 item 8); off by default pending on-chip
    # measurement.
    fuse_pair2: bool = False
    # cross sweeps use the full tile budget for the payload chunk
    # (c = tile_bits - g) instead of capping it at chunk_bits=13; fewer,
    # bigger blocks per HBM round trip (see plan_sweeps)
    cross_chunk_wide: bool = True
    # MSB-partition front-end (ops/partition_engine.py). partition_bits=0
    # disables it; >0 routes sort_words through the partition pipeline for
    # n >= partition_min_n. row/tile bits 0 = auto (L-rb+1 / 18). Off by
    # default pending on-chip measurement (VERDICT r2 item 3).
    partition_bits: int = 0
    partition_min_n: int = 1 << 24
    partition_row_bits: int = 0
    partition_tile_bits: int = 0
    # non-power-of-two n: route through the pow2-segment decomposition when
    # padding to 2**L would waste more than this fraction. With the
    # truncated merge (round 5) the segmented path's el-substage cost is
    # never above the padded path's (sort(2**L) = 2 sort(2**(L-1)) + merge
    # is the same network), so only constant overheads (extra HBM trips for
    # the dense CE levels, more kernel variants) argue for any padding at
    # all. On-chip crossover (benchmarks/seg_merge_ab_r5.txt, u32 keys-only
    # near 2**28): segmented wins +9-13% at waste 0.20-0.25, ties at 0.15,
    # loses 5% at 0.12 -> default 0.15.
    seg_pad_waste: float = 0.15
    # truncated (virtual-sentinel) merge for sorted-run merges with pow2
    # ascending side (round 5); False = always the padded construction
    # (A/B lever, tools/seg_merge_ab.py)
    trunc_merge: bool = True
    # batched (row-wise) sorts: route non-power-of-two ROW lengths through
    # the per-row pow2-segment decomposition + truncated row merge when
    # in-row sentinel padding would waste more than this fraction
    # (`_sort_segmented_rows`); >= 1.0 disables (always pad rows to 2**r).
    # Separate knob from seg_pad_waste: the padded row sort is ONE fused
    # network, so the row crossover sits higher than the flat path's 0.15.
    # On-chip (tools/row_seg_ab.py, benchmarks/row_seg_ab_r5.txt): seg
    # +97% at waste 0.49, +32% at 0.25, +6-8% at ~0.28; loses 11-17% at
    # 0.17-0.20 and below -> default 0.24 (routes the measured 0.25 win).
    row_seg_waste: float = 0.24
    # minimum row length for the row-segmented route: rows with a 512-long
    # (or shorter) pow2 prefix measured at best a wash even at waste 0.41
    # (16384x600 -2%, x700 -23%) — their padded network is already one
    # cheap fused sweep. Tests set 0 to force the path.
    row_seg_min_nr: int = 1024

    @staticmethod
    def from_env() -> "EngineTuning":
        return EngineTuning(
            max_substages=int(os.environ.get("THRS_MAX_SUBSTAGES", "96")),
            cross_g_max=int(os.environ.get("THRS_CROSS_G_MAX", "8")),
            tile_bits_cap=int(os.environ.get("THRS_TILE_BITS_CAP", "18")),
            cross_chunk_wide=os.environ.get("THRS_CROSS_CHUNK_WIDE",
                                            "1") != "0",
            partition_bits=int(os.environ.get("THRS_PARTITION_BITS", "0")),
            partition_min_n=int(os.environ.get("THRS_PARTITION_MIN_N",
                                               str(1 << 24))),
            partition_row_bits=int(os.environ.get("THRS_PARTITION_ROW_BITS",
                                                  "0")),
            partition_tile_bits=int(os.environ.get("THRS_PARTITION_TILE_BITS",
                                                   "0")),
            pad_target_bytes=(int(os.environ.get("THRS_PAD_TARGET_MB", "0"))
                              * (1 << 20)) or _PAD_TARGET_BYTES,
            fuse_pair2=os.environ.get("THRS_FUSE_PAIR2", "0") != "0",
            seg_pad_waste=float(os.environ.get("THRS_SEG_PAD_WASTE",
                                               "0.15")),
            trunc_merge=os.environ.get("THRS_TRUNC_MERGE", "1") != "0",
            row_seg_waste=float(os.environ.get("THRS_ROW_SEG_WASTE",
                                               "0.24")),
            row_seg_min_nr=int(os.environ.get("THRS_ROW_SEG_MIN_NR",
                                              "1024")),
        )


def _tuning_or_env(tuning) -> EngineTuning:
    return EngineTuning.from_env() if tuning is None else tuning


def _split_sweep(sweep: Sweep, max_substages: int):
    subs = sweep.substages
    if len(subs) <= max_substages:
        return [sweep]
    k = -(-len(subs) // max_substages)
    per = -(-len(subs) // k)
    return [Sweep(c=sweep.c, g=sweep.g, j_lo=sweep.j_lo, L=sweep.L,
                  substages=tuple(subs[i:i + per]),
                  forced_asc=sweep.forced_asc)
            for i in range(0, len(subs), per)]


def _tile_bits_for(nwords: int, L: int, tuning: EngineTuning) -> int:
    # in+out double-buffered: ~4 buffers/word of 4B each
    budget_elems = tuning.pad_target_bytes // (16 * max(nwords, 1))
    return max(MIN_L, min(tuning.tile_bits_cap,
                          int(math.floor(math.log2(budget_elems))), L))


def check_word_contract(cmp_words: list, carry_words: list):
    """Debug validator for the :func:`sort_words` word contract.

    Returns a device boolean scalar: True iff the call is safe — either
    there are no carry words, or the cmp tuples are all distinct (violations
    produce silently nondeterministic carry placement, not an error). O(n
    log n); intended for tests and debugging, not the hot path.
    """
    if not carry_words or cmp_words[0].shape[0] <= 1:
        return jnp.bool_(True)
    perm = jnp.lexsort(tuple(reversed(cmp_words)))
    dup = None
    for w in cmp_words:
        s = w[perm]
        eq = s[1:] == s[:-1]
        dup = eq if dup is None else (dup & eq)
    return ~jnp.any(dup)


#: max nested pow2-segment decompositions. Deeper nests (reachable only by
#: forcing THRS_SEG_PAD_WASTE near 0) provoked a pathological XLA:TPU
#: layout at 4096-divisible n — an (n/4096, 1024, 4) reshape tiled
#: T(8,128) pads the minor dim 4 -> 128, a 30 GB allocation at n = 236M
#: (on-chip bisect, round 5: 2 levels compile, ~6 levels OOM, with either
#: merge construction). 2 levels cover every measured-profitable split.
_MAX_SEG_DEPTH = 2


def sort_words(cmp_words: list, carry_words: list,
               *, interpret: bool | None = None,
               tuning: EngineTuning | None = None,
               allow_tied_carries: bool = False,
               _seg_depth: int = 0):
    """Sort u32 word tuples by lexicographic unsigned order of cmp_words.

    Returns (cmp_words, carry_words) reordered. Input words must share length.

    Contract: either the cmp tuples are all distinct (e.g. include an index
    word), or carry_words is such that equal-cmp elements are bit-identical
    in every word (e.g. empty). The network swaps ties freely — violating
    the contract silently places carries of tied tuples nondeterministically
    (:func:`check_word_contract` is the debug validator).

    ``allow_tied_carries=True`` lifts the contract: duplicate cmp tuples
    with distinct carries sort as a permutation with UNSPECIFIED tie order
    (unstable sort; tie-consistent kernels, one extra lex chain on roll
    substages). Only valid pad-free — n a power of two >= 2**MIN_L — since
    an all-ones real tuple would tie the pad sentinels and could be
    truncated in their place (raises otherwise).

    interpret=None auto-selects: compiled kernels on TPU, the Pallas
    interpreter elsewhere. tuning=None reads the THRS_* env knobs at call
    time (:class:`EngineTuning`).
    """
    if interpret is None:
        interpret = common.interpret_default()
    tuning = _tuning_or_env(tuning)
    n = cmp_words[0].shape[0]
    if n <= 1:
        return cmp_words, carry_words
    tie_safe = bool(allow_tied_carries and carry_words)
    if tie_safe and (n & (n - 1) or n < (1 << MIN_L)):
        raise ValueError(
            f"allow_tied_carries needs pad-free n (power of two >= "
            f"{1 << MIN_L}), got {n}")
    if (not tie_safe and tuning.partition_bits > 0
            and n >= tuning.partition_min_n and n < (1 << 31)):
        from . import partition_engine

        return partition_engine.sort_words_partition(
            cmp_words, carry_words, interpret=interpret, tuning=tuning)
    ncmp = len(cmp_words)
    L_full = max(_ceil_log2(n), MIN_L)
    # non-power-of-two: padding to 2**L wastes up to 2x work; when the waste
    # exceeds tuning.seg_pad_waste, sort power-of-two segments and merge with
    # truncated (virtual-sentinel) bitonic merges instead (docs/DESIGN.md §3)
    if (n > (1 << MIN_L) and (n & (n - 1)) and _seg_depth < _MAX_SEG_DEPTH
            and n < int((1 << L_full) * (1.0 - tuning.seg_pad_waste))):
        words = _sort_segmented(list(cmp_words) + list(carry_words), n, ncmp,
                                interpret, tuning, _seg_depth)
        return words[:ncmp], words[ncmp:]

    n_pad = 1 << L_full
    words = [common.pad_to_multiple(w, n_pad, jnp.uint32(0xFFFFFFFF)) for w in cmp_words]
    words += [common.pad_to_multiple(w, n_pad, jnp.uint32(0)) for w in carry_words]
    words = _run_network(words, ncmp, L_full, None, interpret, tuning=tuning,
                         tie_safe=tie_safe)
    words = [w[:n] for w in words]
    return words[:ncmp], words[ncmp:]


def _run_network(words, ncmp: int, L: int, stages, interpret: bool,
                 forced_asc: int | None = None,
                 tuning: EngineTuning | None = None,
                 tile_bits: int | None = None,
                 tie_safe: bool = False):
    """Run the (sub)network given by ``stages`` on the words.

    ``L`` is the network's index-bit span (stage/direction bits). The word
    length need not be ``2**L``: any multiple of every sweep's block span
    works (the batched row paths exploit this with tile-multiple batch
    padding). ``tile_bits`` overrides the VMEM-budget tile choice.
    """
    tuning = _tuning_or_env(tuning)
    nwords = len(words)
    if tile_bits is None:
        tile_bits = _tile_bits_for(nwords, L, tuning)
    chunk_bits = min(13, tile_bits - (1 if L > tile_bits else 0))
    T = min(tile_bits, L)
    # storage bit rotation: lanes hold the *rarest* network bits (see
    # plan_sweeps). rot=10 puts flat bits >= 10 (sublane-aligned pair-split)
    # under the most frequent substages. Only useful when the tile actually
    # has aligned flat bits (T > 10).
    rot = 10 if T > 10 else 0
    parts = [part
             for sweep in plan_sweeps(L, tile_bits, chunk_bits, rot, stages,
                                      forced_asc,
                                      g_max_cross=tuning.cross_g_max,
                                      wide_cross_chunk=tuning.cross_chunk_wide)
             for part in _split_sweep(sweep, tuning.max_substages)]
    if rot:
        # fuse the storage rotation into the boundary kernels when they are
        # local sweeps (tile == one 2**T block) and the in-VMEM transpose
        # view keeps both axes >= 128 lanes (Mosaic rejects narrower shape
        # casts); otherwise pay the XLA transpose pass
        def can_fuse(r):
            rr = r % T
            return rr == 0 or min(rr, T - rr) >= LANE_BITS

        # a boundary sweep can absorb the rotation only if it is a LOCAL
        # sweep over one contiguous 2**T block: j_lo == c (the group sits
        # directly on the chunk) and c + g == T. Checking c + g alone is
        # wrong: cross sweeps also have c + g == T under wide chunks (and
        # g == T - chunk_bits under narrow ones), but their tile is
        # non-contiguous bits [0, c) ∪ [j_lo, j_lo+g), where the in-VMEM
        # transpose does not implement the storage rotation (silently
        # unsorted merges > 2**18; caught by review + regression test).
        def is_local_T(p):
            return p.j_lo == p.c and p.c + p.g == T

        if parts and is_local_T(parts[0]) and can_fuse(-rot):
            parts[0] = _dc_replace(parts[0], rot_in=rot)
        else:
            words = [_rotate_storage(w, T, -rot) for w in words]
        if parts and is_local_T(parts[-1]) and can_fuse(rot):
            parts[-1] = _dc_replace(parts[-1], rot_out=rot)
    for part in parts:
        words = run_sweep(words, part, ncmp, interpret, tie_safe,
                          tuning.fuse_pair2)
    if rot and not (parts and parts[-1].rot_out):
        words = [_rotate_storage(w, T, rot) for w in words]
    return words


def _row_plan(B: int, r: int, nwords: int, tuning: EngineTuning,
              merge_only: bool = False) -> tuple[int, int]:
    """Pick (tile_bits, b_pad) for a row-truncated network of ``B`` rows of
    ``2**r`` elements.

    Rows never interact (all substage bits < r), so the batch axis only
    needs to pad to a tile multiple — ``2**(T - r)`` rows when the tile
    spans multiple rows, no padding at all when ``T <= r``. T is chosen by
    a cost model over padded elements x per-substage cost: substages whose
    storage-rotated flat bit lands >= LANE_BITS+3 use the ~2x-cheaper
    pair-split CE, so shrinking T to cut padding can lose more to roll-form
    substages than it saves (see make_sweep_kernel).
    """
    T_hi = _tile_bits_for(nwords, max(r + _ceil_log2(max(B, 1)), MIN_L),
                          tuning)
    if T_hi <= r:
        return T_hi, B  # tile inside one row: any B divides
    T_lo = max(min(r, T_hi), MIN_L)

    def cost(T: int) -> tuple[float, int]:
        m = 1 << (T - r) if T > r else 1
        b_pad = -(-B // m) * m
        rot = 10 if T > 10 else 0
        c = 0.0
        # substage bit j runs (r - j) times in a full row sort, once in a
        # row merge
        for j in range(r):
            freq = 1 if merge_only else (r - j)
            fb = (j + rot) % T
            c += freq * (1.0 if fb >= LANE_BITS + 3 else 2.0)
        return (b_pad << r) * c, b_pad

    best = min(range(T_lo, T_hi + 1), key=lambda t: (cost(t)[0], -t))
    return best, cost(best)[1]


def _pad_rows(w, B: int, nr: int, r: int, b_pad: int, fill):
    w = w.reshape(B, nr)
    if nr != (1 << r):
        w = jnp.concatenate(
            [w, jnp.full((B, (1 << r) - nr), fill, jnp.uint32)], axis=1)
    if B != b_pad:
        w = jnp.concatenate(
            [w, jnp.full((b_pad - B, 1 << r), fill, jnp.uint32)], axis=0)
    return w.reshape(-1)


def sort_words_rows(cmp_words: list, carry_words: list, shape,
                    *, interpret: bool | None = None,
                    tuning: EngineTuning | None = None,
                    allow_tied_carries: bool = False,
                    _seg_depth: int = 0):
    """Row-wise :func:`sort_words`: each of the ``B`` rows of the row-major
    flat words (``shape = (B, nr)``, word length ``B*nr``) is sorted
    independently by lexicographic unsigned cmp order.

    TPU-native batched sort: rows pad to ``2**r`` with max-sentinels and the
    flat network runs only stages ``1..r`` with stage ``r`` forced ascending —
    all compare partners flip index bits ``< r``, so rows never interact, and
    the truncated network costs exactly ``B`` times one row's substages. The
    batch axis pads only to a tile multiple (:func:`_row_plan` — sentinel
    rows), not a power of two; same word contract as :func:`sort_words`,
    applied per row.
    """
    if interpret is None:
        interpret = common.interpret_default()
    B, nr = shape
    if nr <= 1 or B == 0:
        return cmp_words, carry_words
    ncmp = len(cmp_words)
    nwords = ncmp + len(carry_words)
    r = _ceil_log2(nr)
    tie_safe = bool(allow_tied_carries and carry_words)
    if tie_safe and nr != (1 << r):
        # batch sentinel ROWS are safe (rows never interact); in-row
        # sentinel padding is not — an all-ones real tuple could be
        # truncated in a pad's place
        raise ValueError(
            f"allow_tied_carries needs power-of-two rows, got {nr}")
    tuning = _tuning_or_env(tuning)
    # non-power-of-two row length: when in-row sentinel padding to 2**r
    # would waste more than tuning.row_seg_waste, sort per-row pow2
    # segments and merge them with the truncated row merge instead
    # (zero in-row padding; docs/DESIGN.md §3). tie-unsafe carries keep
    # the pow2 requirement (raised above).
    if ((nr & (nr - 1)) and not tie_safe and _seg_depth < _MAX_SEG_DEPTH
            and nr > max(tuning.row_seg_min_nr, 32)
            and nr < int((1 << r) * (1.0 - tuning.row_seg_waste))):
        words = _sort_segmented_rows(
            list(cmp_words) + list(carry_words), B, nr, ncmp, interpret,
            tuning, _seg_depth)
        return words[:ncmp], words[ncmp:]
    T, b_pad = _row_plan(B, r, nwords, tuning)
    words = [_pad_rows(w, B, nr, r, b_pad, jnp.uint32(0xFFFFFFFF))
             for w in cmp_words]
    words += [_pad_rows(w, B, nr, r, b_pad, jnp.uint32(0))
              for w in carry_words]
    words = _run_network(words, ncmp, max(T, r), range(1, r + 1), interpret,
                         forced_asc=r, tuning=tuning, tile_bits=T,
                         tie_safe=tie_safe)
    words = [w.reshape(b_pad, 1 << r)[:B, :nr].reshape(-1) for w in words]
    return words[:ncmp], words[ncmp:]


def merge_words_rows(cmp_words: list, carry_words: list, shape,
                     *, interpret: bool | None = None,
                     tuning: EngineTuning | None = None):
    """Bitonic-merge each row to ascending order.

    ``shape = (B, nr)`` with ``nr`` a power of two; every row of the
    row-major flat words must already be a *bitonic* sequence (e.g.
    ``[ascending run, descending run]``, sentinel plateaus allowed). Runs
    only the final merge stage — ``log2(nr)+1`` substages per row instead of
    a full sort. The batch axis pads to a tile multiple with sentinel rows
    (constant rows are trivially bitonic)."""
    if interpret is None:
        interpret = common.interpret_default()
    B, nr = shape
    if nr <= 1 or B == 0:
        return cmp_words, carry_words
    if nr & (nr - 1):
        raise ValueError(f"merge_words_rows needs power-of-two rows, got {nr}")
    ncmp = len(cmp_words)
    nwords = ncmp + len(carry_words)
    r = nr.bit_length() - 1
    tuning = _tuning_or_env(tuning)
    T, b_pad = _row_plan(B, r, nwords, tuning, merge_only=True)

    def pad(w, fill):
        if B == b_pad:
            return w
        return jnp.concatenate(
            [w, jnp.full(((b_pad - B) * nr,), fill, jnp.uint32)])

    words = [pad(w, jnp.uint32(0xFFFFFFFF)) for w in cmp_words]
    words += [pad(w, jnp.uint32(0)) for w in carry_words]
    words = _run_network(words, ncmp, max(T, r), [r], interpret, forced_asc=r,
                         tuning=tuning, tile_bits=T)
    words = [w[: B * nr] for w in words]
    return words[:ncmp], words[ncmp:]


def _ce_pair(x_words, y_words, ncmp: int):
    """Elementwise lex compare-exchange of two word lists → (mins, maxs).

    Ties keep x in the min slot (no swap) — harmless under the word
    contract (tied cmp tuples either cannot occur or carry identical /
    absent carries, see :func:`sort_words`).
    """
    lt = _lex_lt(x_words, y_words, ncmp)  # y <lex x
    mins = [jnp.where(lt, yw, xw) for xw, yw in zip(x_words, y_words)]
    maxs = [jnp.where(lt, xw, yw) for xw, yw in zip(x_words, y_words)]
    return mins, maxs


def _merge_pow2(words, ncmp: int, m: int, interpret: bool,
                tuning: EngineTuning | None):
    """Ascending bitonic merge of a power-of-two bitonic word sequence."""
    if m <= 1:
        return words
    if m < (1 << MIN_L):
        # below one (8, 128) tile: dense jnp CE levels beat a padded kernel
        for lev in range(m.bit_length() - 2, -1, -1):
            d = 1 << lev
            v = [w.reshape(-1, 2, d) for w in words]
            mins, maxs = _ce_pair([w[:, 0, :] for w in v],
                                  [w[:, 1, :] for w in v], ncmp)
            words = [jnp.stack([mn, mx], axis=1).reshape(-1)
                     for mn, mx in zip(mins, maxs)]
        return words
    return _run_network(words, ncmp, m.bit_length() - 1,
                        [m.bit_length() - 1], interpret, tuning=tuning)


def _merge_sorted_runs(asc_words, desc_words, ncmp: int, interpret: bool,
                       tuning: EngineTuning | None = None):
    """Merge a sorted-ascending run (length ``a``) with a sorted-descending
    run (length ``b``) into one ascending run of ``a + b``.

    The provable construction is the virtual bitonic array
    ``[asc, all-ones sentinel block, desc]`` padded to a power of two — the
    maximal sentinels sit at the peak and never move before real data under
    an ascending merge. When ``a`` is a power of two and ``b <= a`` (every
    `_sort_segmented` call; most psort runs) the sentinels are **virtual
    only**: cross-half compare-exchanges against a sentinel are
    deterministic no-ops, so each split level is computed densely on the
    real elements (jnp slices + one lex CE), every all-real half is an
    exact power of two handled by the standard stage-``log2`` merge sweeps
    with zero padding, and all-sentinel halves are dropped as bookkeeping.
    Saves the up-to-2x padded work of the final merge on non-power-of-two
    ``n`` (ROADMAP item 1 tail; the reference's own 160M headline workload,
    /root/reference/main.cpp:105, is the motivating shape).
    """
    a = asc_words[0].shape[0]
    b = desc_words[0].shape[0]
    if b == 0:
        return list(asc_words)
    if a == 0:
        return [jnp.flip(w) for w in desc_words]
    tuning = _tuning_or_env(tuning)
    if ((a & (a - 1)) or b > a or a < (1 << MIN_L)
            or not tuning.trunc_merge):
        return _merge_sorted_runs_padded(asc_words, desc_words, ncmp,
                                         interpret, tuning)
    # virtual array: [asc(a), SENT(a-b), desc(b)], length 2a. First split
    # (stride a): indices [0, a-b) face sentinels (no-ops); the rest CE
    # against the descending run.
    mid = a - b
    mins, maxs = _ce_pair([w[mid:] for w in asc_words], list(desc_words),
                          ncmp)
    lower = [jnp.concatenate([aw[:mid], mn])
             for aw, mn in zip(asc_words, mins)]
    # bitonic split: max(lower half) <= min(upper half); lower is all-real,
    # power-of-two, bitonic -> standard merge emits the smallest `a` outputs
    pieces = [_merge_pow2(lower, ncmp, a, interpret, tuning)]
    # upper chain: virtual [SENT(s), R(r)] with s + r = M (power of two).
    # Invariants: the virtual array is bitonic (upper half of a bitonic
    # split) and its sentinel prefix is maximal.
    R, s, M = maxs, mid, a
    while True:
        if s == 0:
            pieces.append(_merge_pow2(R, ncmp, M, interpret, tuning))
            break
        if M <= (1 << 16):
            # small tail: materialize the remaining virtual [SENT(s), R]
            # once and finish with a single padded merge. A fully recursive
            # chain emits a long run of tiny aligned pieces, which provoked
            # a pathological XLA:TPU layout on the output concatenate
            # (an (n/4096, 1024, 4) reshape tiled T(8,128) = 32x HBM, a
            # 30 GB allocation at n = 236M — seg_merge_ab round 5); the
            # materialized sentinels here cost <= 2**16 words. Sentinel
            # ties follow the standard pad contract (see sort_words).
            full = [jnp.concatenate(
                [jnp.full((s,), jnp.uint32(0xFFFFFFFF if i < ncmp else 0),
                          jnp.uint32), w]) for i, w in enumerate(R)]
            merged = _merge_pow2(full, ncmp, M, interpret, tuning)
            pieces.append([w[: M - s] for w in merged])
            break
        h = M // 2
        if s >= h:
            # upper half all sentinel; lower half = [SENT(s-h), R] (reals
            # face sentinels and keep their values) — pure bookkeeping
            s, M = s - h, h
            continue
        # split at h: lower[i<s] = R[h-s+i] (faces a sentinel), lower[i>=s]
        # = min pair; upper = [SENT(s), maxes] — same form, half the size
        mins, maxs = _ce_pair([w[: h - s] for w in R],
                              [w[h:] for w in R], ncmp)
        low = [jnp.concatenate([w[h - s: h], mn])
               for w, mn in zip(R, mins)]
        pieces.append(_merge_pow2(low, ncmp, h, interpret, tuning))
        R, M = maxs, h
    return [jnp.concatenate(ws) for ws in zip(*pieces)]


def _merge_sorted_runs_padded(asc_words, desc_words, ncmp: int,
                              interpret: bool,
                              tuning: EngineTuning | None = None):
    """Padded-merge fallback for shapes the truncated form does not cover
    (non-power-of-two ``a``, ``b > a``, or sub-tile ``a``): materialize the
    ``[asc, sentinel block, desc]`` construction at the next power of two.
    """
    a = asc_words[0].shape[0]
    b = desc_words[0].shape[0]
    m = 1 << max(_ceil_log2(a + b), MIN_L)
    mid = m - a - b
    out = []
    for i, (aw, dw) in enumerate(zip(asc_words, desc_words)):
        fill = jnp.uint32(0xFFFFFFFF) if i < ncmp else jnp.uint32(0)
        pad = jnp.full((mid,), fill, jnp.uint32)
        out.append(jnp.concatenate([aw, pad, dw]))
    out = _run_network(out, ncmp, m.bit_length() - 1, [m.bit_length() - 1],
                       interpret, tuning=tuning)
    return [w[:a + b] for w in out]


def _sort_segmented(words, n: int, ncmp: int, interpret: bool,
                    tuning: EngineTuning | None = None, depth: int = 0):
    """Sort arbitrary-n words: largest power-of-two prefix sorted with the
    full network, the rest sorted recursively (nesting capped at
    ``_MAX_SEG_DEPTH``), then one truncated bitonic merge."""
    a = 1 << (n.bit_length() - 1)  # largest power of two <= n
    left = [w[:a] for w in words]
    right = [w[a:] for w in words]
    left = _run_network(left, ncmp, n.bit_length() - 1, None, interpret,
                        tuning=tuning)
    cw, kw = sort_words(right[:ncmp], right[ncmp:], interpret=interpret,
                        tuning=tuning, _seg_depth=depth + 1)
    right = [w[::-1] for w in list(cw) + list(kw)]
    return _merge_sorted_runs(left, right, ncmp, interpret, tuning)


def _merge_pow2_rows(words2d, ncmp: int, m: int, interpret: bool,
                     tuning: EngineTuning | None):
    """Row-wise :func:`_merge_pow2`: ascending bitonic merge of each row of
    the ``(B, m)`` words (``m`` a power of two, every row bitonic)."""
    if m <= 1:
        return words2d
    B = words2d[0].shape[0]
    cw, kw = merge_words_rows([w.reshape(-1) for w in words2d[:ncmp]],
                              [w.reshape(-1) for w in words2d[ncmp:]],
                              (B, m), interpret=interpret, tuning=tuning)
    return [w.reshape(B, m) for w in list(cw) + list(kw)]


def _merge_sorted_runs_rows(asc, desc, ncmp: int, interpret: bool,
                            tuning: EngineTuning | None = None):
    """Row-wise :func:`_merge_sorted_runs`: merge each ascending row of the
    ``(B, a)`` words with the matching descending row of the ``(B, b)``
    words into one ascending row of ``a + b``.

    Same virtual-bitonic-array construction as the flat form — requires
    ``a`` a power of two and ``0 < b <= a`` (every `_sort_segmented_rows`
    shape). All split levels are axis-1 slices + elementwise lex CEs, so
    rows stay independent and shapes static; the all-real pow2 pieces run
    :func:`merge_words_rows` with zero in-row padding.
    """
    B, a = asc[0].shape
    b = desc[0].shape[1]
    if b == 0:
        return list(asc)
    assert a >= b and not (a & (a - 1)), (a, b)
    mid = a - b
    mins, maxs = _ce_pair([w[:, mid:] for w in asc], list(desc), ncmp)
    lower = [jnp.concatenate([aw[:, :mid], mn], axis=1)
             for aw, mn in zip(asc, mins)]
    pieces = [_merge_pow2_rows(lower, ncmp, a, interpret, tuning)]
    # upper chain: virtual per-row [SENT(s), R(r)] with s + r = M (pow2);
    # bookkeeping steps (s >= half) are free, so unlike the flat form the
    # chain runs to the end — pieces are (B, h) column blocks (at most
    # log2(a) of them), not the tiny aligned slivers that provoked the
    # flat path's XLA layout pathology.
    R, s, M = maxs, mid, a
    while True:
        if s == 0:
            pieces.append(_merge_pow2_rows(R, ncmp, M, interpret, tuning))
            break
        h = M // 2
        if s >= h:
            # upper half all sentinel; lower half = [SENT(s-h), R]
            s, M = s - h, h
            continue
        # split at h: lower[i<s] faces a sentinel (keeps R[h-s+i]), the
        # rest CE; upper = [SENT(s), maxes] — same form, half the size
        mins, maxs = _ce_pair([w[:, : h - s] for w in R],
                              [w[:, h:] for w in R], ncmp)
        low = [jnp.concatenate([w[:, h - s: h], mn], axis=1)
               for w, mn in zip(R, mins)]
        pieces.append(_merge_pow2_rows(low, ncmp, h, interpret, tuning))
        R, M = maxs, h
    return [jnp.concatenate(ws, axis=1) for ws in zip(*pieces)]


def _sort_segmented_rows(words, B: int, nr: int, ncmp: int, interpret: bool,
                         tuning: EngineTuning | None = None, depth: int = 0):
    """Row-wise :func:`_sort_segmented`: each row's largest power-of-two
    prefix is sorted with the truncated row network, the per-row remainder
    recursively (nesting capped at ``_MAX_SEG_DEPTH``), then one truncated
    row merge — zero in-row sentinel padding (ROADMAP item 11 tail)."""
    a = 1 << (nr.bit_length() - 1)  # largest power of two < nr
    w2d = [w.reshape(B, nr) for w in words]
    left = [w[:, :a].reshape(-1) for w in w2d]
    right = [w[:, a:].reshape(-1) for w in w2d]
    lc, lk = sort_words_rows(left[:ncmp], left[ncmp:], (B, a),
                             interpret=interpret, tuning=tuning)
    rc, rk = sort_words_rows(right[:ncmp], right[ncmp:], (B, nr - a),
                             interpret=interpret, tuning=tuning,
                             _seg_depth=depth + 1)
    asc = [w.reshape(B, a) for w in list(lc) + list(lk)]
    desc = [jnp.flip(w.reshape(B, nr - a), axis=1)
            for w in list(rc) + list(rk)]
    out = _merge_sorted_runs_rows(asc, desc, ncmp, interpret, tuning)
    return [w.reshape(-1) for w in out]


def _rotate_storage(w, T: int, rot: int):
    """Move element f to the bit-rotated-RIGHT position within each 2**T
    block: s = rotr(f, rot) — a transpose per block (one XLA pass each way).
    Call with -rot for the planner's rotate-left sigma."""
    r = rot % T
    if r == 0:
        return w
    return (w.reshape(-1, 1 << (T - r), 1 << r)
            .swapaxes(-1, -2)
            .reshape(-1))


def sort_arrays_bitonic(bits, arrays, start_bit, end_bit, *,
                        unstable_ok: bool = False, interpret: bool = False,
                        tuning: EngineTuning | None = None):
    """Engine entry: stable sort of ``arrays`` by ``bits[start:end)`` window.

    ``unstable_ok=True`` skips the stability index word — only valid when the
    caller guarantees equal-window elements are indistinguishable (keys-only,
    full-width sort).
    """
    n = bits.shape[0]
    if n <= 1:
        return list(arrays)
    cmp_words = bits_to_cmp_words(bits, start_bit, end_bit)
    if not unstable_ok:
        if n >= (1 << 32):
            raise ValueError("stable pallas sort supports n < 2**32")
        cmp_words.append(jnp.arange(n, dtype=jnp.uint32))
    carry_words = []
    recipes = []
    for a in arrays:
        ws, recipe = array_to_words(a)
        recipe["nwords"] = len(ws)
        carry_words.extend(ws)
        recipes.append(recipe)
    cmp_out, carry_out = sort_words(cmp_words, carry_words,
                                    interpret=interpret, tuning=tuning)
    out = []
    pos = 0
    for recipe in recipes:
        k = recipe["nwords"]
        out.append(words_to_array(carry_out[pos:pos + k], recipe))
        pos += k
    return out
