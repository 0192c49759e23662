"""Per-tile digit histograms (Pallas) — the reference ``blockCount`` analogue.

Reference: kernel.cu:73-103 — one thread-block per tile builds a 256-bin
shared-memory histogram via atomicInc. TPUs have no atomics; the kernel
accumulates bucket-chunked compare-sums on the VPU instead.

**Status: tests-only parity artifact (decision 2026-08-19, docs/DESIGN.md
§4b).** The bitonic speed path needs no histograms (DESIGN.md §2); the
MSB-partition front-end built on this shape was measured 100x off and
rejected (DESIGN.md §3); and the once-planned histogram-refined splitter
stage for the distributed sort was superseded by exact-rank sample
refinement (psort._refine_cuts), because bucket precision is unbounded
under duplicates while tuple ranks are exact on every distribution. This
module stays as the faithful ``blockCount`` semantics mirror with its own
unit tests (tests/test_histogram.py) — the reference's bucket-major
counter layout and pad conventions are documented here and nowhere else.

Outputs match the reference's layout transposed: ``(num_tiles, 2**width)``
(the reference stores bucket-major, kernel.cu:97; transpose as needed —
``counts.T.reshape(-1)`` reproduces its exact counter array).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import common

DEFAULT_TILE = 1 << 13
_BUCKET_CHUNK = 8


def _hist_kernel(x_ref, out_ref, *, shift: int, width: int):
    bits = x_ref[0]  # (rows, 128) uint32
    digit = ((bits >> jnp.uint32(shift)) &
             jnp.uint32((1 << width) - 1)).astype(jnp.int32)
    nb = 1 << width
    chunk = min(_BUCKET_CHUNK, nb)
    for b0 in range(0, nb, chunk):
        ids = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0) + b0
        eq = (digit[None, :, :] == ids).astype(jnp.int32)
        out_ref[0, b0:b0 + chunk] = jnp.sum(eq, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("shift", "width", "tile",
                                             "interpret"))
def digit_histogram(bits, shift: int = 0, width: int = 8,
                    tile: int = DEFAULT_TILE, interpret: bool | None = None):
    """Histogram of the digit ``bits[shift : shift+width]`` per tile.

    bits: (n,) uint32/uint64 key bits. Returns (num_tiles, 2**width) int32.
    Tail tiles are padded with all-ones bits, whose digit is
    ``(1 << width) - 1`` for *every* (shift, width) window — i.e. the pad
    always inflates the last tile's top bucket. Callers that need exact
    counts subtract ``num_tiles * tile - n`` from ``counts[-1, -1]`` (the
    reference instead launches an exact grid, hpp:864).
    """
    if interpret is None:
        interpret = common.interpret_default()
    if np.dtype(bits.dtype) == np.uint64:
        # histogram only reads the window; shift into a u32 word
        bits = ((bits >> jnp.uint64(shift)) &
                jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        shift = 0
    assert shift + width <= 32
    n = bits.shape[0]
    # tiles must be lane-aligned and within VMEM reach; out-of-range or
    # unaligned requests are rounded (the tile is a throughput knob, not a
    # semantic contract — counts are still per returned tile)
    tile = max(1024, min(-(-tile // 128) * 128, 1 << 22))
    padded = common.pad_to_multiple(bits, tile, ~jnp.uint32(0))
    T = padded.shape[0] // tile
    rows = tile // 128
    view = padded.reshape(T, rows, 128)
    out = pl.pallas_call(
        functools.partial(_hist_kernel, shift=shift, width=width),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, rows, 128), lambda t: (t, np.int32(0), np.int32(0)))],
        out_specs=pl.BlockSpec((1, 1 << width), lambda t: (t, np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((T, 1 << width), jnp.int32),
        interpret=interpret,
    )(view)
    return out


def exclusive_scan_bucket_major(counts):
    """Reference counter scan: flat exclusive prefix sum over the
    bucket-major (bucket, tile) counter array (kernel.cu:136-204 semantics,
    done with XLA's cumsum — see docs/DESIGN.md §2)."""
    flat = counts.T.reshape(-1)
    ex = jnp.concatenate([jnp.zeros((1,), flat.dtype), jnp.cumsum(flat)[:-1]])
    return ex.reshape(counts.shape[1], counts.shape[0]).T
