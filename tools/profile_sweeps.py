#!/usr/bin/env python
"""Per-sweep cost breakdown of the bitonic engine on the real chip.

Times each sweep kernel of the 2**L u32 keys-only plan in isolation
(dummy data; valid because the network is data-oblivious) and prints a
table: substage count, CE form mix, measured ms, effective GB/s, and
VPU-bound vs HBM-bound classification. This is the measurement VERDICT r1
item 3 asks to ground the single-chip optimization on.

Usage: python tools/profile_sweeps.py [--L 28] [--words 1] [--reps 3]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THRS_JAX_CACHE", "/root/.cache/thrs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tinyhipradixsort_tpu.ops import bitonic_engine as be  # noqa: E402


def classify(sweep):
    rolls = sum(1 for _, j in sweep.substages
                if sweep.tile_bit(j) < be.LANE_BITS + 3)
    return rolls, len(sweep.substages) - rolls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=28)
    ap.add_argument("--words", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    L, nwords = args.L, args.words
    n = 1 << L

    tuning = be.EngineTuning.from_env()
    tile_bits = be._tile_bits_for(nwords, L, tuning)
    chunk_bits = min(13, tile_bits - (1 if L > tile_bits else 0))
    T = min(tile_bits, L)
    rot = 10 if T > 10 else 0
    parts = [p for s in be.plan_sweeps(L, tile_bits, chunk_bits, rot,
                                       g_max_cross=tuning.cross_g_max,
                                       wide_cross_chunk=tuning.cross_chunk_wide)
             for p in be._split_sweep(s, tuning.max_substages)]

    rng = np.random.default_rng(0)
    words = [jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=n, dtype=np.uint32)))
        for _ in range(nwords)]

    def timed(fn, *xs):
        np.asarray(fn(*xs)[0][-1:])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(*xs)[0][-1:])
            best = min(best, time.perf_counter() - t0)
        return best

    floor = timed(jax.jit(lambda *xs: [x + jnp.uint32(1) for x in xs]), *words)
    print(f"# L={L} words={nwords} tile=2^{tile_bits} rot={rot} "
          f"parts={len(parts)} dispatch_floor={floor*1e3:.1f} ms")
    print("| # | kind | c+g | j_lo | subst | rolls/pairs | ms | "
          "GB/s (r+w) | ms/substage |")
    print("|---|---|---|---|---|---|---|---|---|")
    total = 0.0
    for i, p in enumerate(parts):
        fn = jax.jit(lambda *xs, p=p: be.run_sweep(list(xs), p, nwords, False))
        t = max(timed(fn, *words) - floor, 1e-9)
        total += t
        rolls, pairs = classify(p)
        kind = "local" if p.j_lo == p.c else "cross"
        gb = 2 * n * 4 * nwords / 1e9
        print(f"| {i} | {kind} | {p.c}+{p.g} | {p.j_lo} | "
              f"{len(p.substages)} | {rolls}/{pairs} | {t*1e3:.1f} | "
              f"{gb/t:.0f} | {t*1e3/len(p.substages):.2f} |", flush=True)
    subst = sum(len(p.substages) for p in parts)
    print(f"\nTOTAL {total*1e3:.0f} ms for {subst} substages over "
          f"{len(parts)} sweeps; HBM floor ~= "
          f"{len(parts)*2*n*4*nwords/700e9*1e3:.0f} ms at 700 GB/s")


if __name__ == "__main__":
    main()
