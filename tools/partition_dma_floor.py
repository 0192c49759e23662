#!/usr/bin/env python
"""Measure ragged bucketed-DMA scatter throughput on TPU — the data-movement
primitive an MSB radix-partition front-end would stand on (VERDICT r1 item 3).

A 256-way partition pass must move each tile's per-digit runs (avg
tile/256 elements, data-dependent length and destination) to
digit-contiguous HBM regions. On TPU that is one dynamic-offset DMA per
(tile, digit). This tool measures exactly that: per grid step, B
dynamic-offset writes of R elements from VMEM to disjoint HBM regions,
with a W-deep outstanding-DMA window — and reports effective GB/s vs the
~700 GB/s contiguous-DMA ceiling the bitonic sweeps ride.

The partition arithmetic it feeds (docs/DESIGN.md): substages per element
drop 406 -> 381 (tile sort 171 + per-bucket sort 210) — only ~6% — so the
partition pays off ONLY if this scatter runs near memory speed. If the
number comes out far below, the MSB-partition front-end is rejected with
data.

Usage: python tools/partition_dma_floor.py [--r 1024] [--w 8] [--t 64]
"""

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THRS_JAX_CACHE", "/root/.cache/thrs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 256  # buckets (8-bit digit)


def scatter_kernel(off_ref, src_ref, out_ref, sem, *, r, w):
    # off_ref is the scalar-prefetch arg: the full (t, B) offset table in
    # SMEM (a (1, B) SMEM *block* fails Mosaic's block-mapping check).
    ti = pl.program_id(0)

    def dma(b):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(b * r, r)],
            # run *index* x static r: Mosaic can prove the slice offset is
            # divisible by the HBM tiling (a raw dynamic offset cannot be)
            out_ref.at[pl.ds(off_ref[ti, b] * r, r)],
            sem.at[b % w])

    for b in range(B):
        dma(b).start()
        if b % w == w - 1:
            for bb in range(b - w + 1, b + 1):
                dma(bb).wait()
    # drain the tail window when w does not divide B (review r3: the last
    # B % w copies were left in flight)
    if B % w:
        for bb in range(B - B % w, B):
            dma(bb).wait()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=1024,
                    help="run length in u32 elements (4 KB at 1024)")
    ap.add_argument("--w", type=int, default=8, help="outstanding DMAs")
    ap.add_argument("--t", type=int, default=64, help="tiles (grid steps)")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    r, w, t = args.r, args.w, args.t
    n = t * B * r

    rng = np.random.default_rng(0)
    src = rng.integers(0, 2**32, size=t * B * r, dtype=np.uint32)
    # disjoint shuffled destination regions: dynamic addressing with the
    # same randomness a real partition would see, no write hazards
    perm = rng.permutation(t * B).reshape(t, B).astype(np.int32)
    offs = perm  # run indices; kernel multiplies by r


    fn = pl.pallas_call(
        functools.partial(scatter_kernel, r=r, w=w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[pl.BlockSpec((B * r,), lambda i, offs: (i,))],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((w,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.uint32),
    )
    fn = jax.jit(fn)
    out = np.asarray(fn(jnp.asarray(offs), jnp.asarray(src)))
    want = np.empty(n, np.uint32)
    for ti in range(t):
        for b in range(B):
            o = offs[ti, b] * r
            want[o:o + r] = src[(ti * B + b) * r:(ti * B + b + 1) * r]
    np.testing.assert_array_equal(out, want)

    offs_d, src_d = jnp.asarray(offs), jnp.asarray(src)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(fn(offs_d, src_d)[:8])
        best = min(best, time.perf_counter() - t0)
    noop = jax.jit(lambda x: x[:256] + jnp.uint32(1))
    np.asarray(noop(src_d)[:8])
    t_floor = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(noop(src_d)[:8])
        t_floor = min(t_floor, time.perf_counter() - t0)
    dt = max(best - t_floor, 1e-9)
    wr = n * 4
    print(f"runs {B}x{t} of {r*4} B, window {w}: {dt*1e3:.2f} ms "
          f"-> scatter write {wr/dt/1e9:.1f} GB/s "
          f"(r+w {2*wr/dt/1e9:.1f} GB/s); per-DMA {dt/ (B*t) * 1e6:.2f} us")
    full = (1 << 28) * 4 / (wr / dt)
    print(f"a 2**28-key partition pass at this rate: {full*1e3:.0f} ms "
          f"scatter alone (whole current sort: ~230 ms)")


if __name__ == "__main__":
    main()
