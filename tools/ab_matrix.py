#!/usr/bin/env python
"""A/B the round-2 kernel/plan changes on the real chip (VERDICT r2 item 1).

Each variant is one EngineTuning (trace-safe since round 3: knobs key the
jit caches), timed with the bench.py protocol (best-of-reps wall time
minus dispatch floor) on the headline workload plus a window-sort workload
for the single-word-packing change. Prints a markdown table and one JSON
line per variant; output feeds BASELINE.md's "winning config" update.

Variants:
  g8        cross-fusion g<=8 (round-2 default)
  g5        cross-fusion g<=5 (round-1 width)
  g6 / g7   intermediates (only with --fine)
  sub64     max 64 substages/kernel (vs default 96)
  tile17    tile 2**17 (vs default 2**18)

The direction-complement kernel rewrite cannot be toggled by a knob — A/B
it by git checkout (r1 tag) if these numbers regress vs BASELINE.md.

Usage: python tools/ab_matrix.py [--n 2**exp] [--reps 5] [--fine]
"""

import argparse
import json
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


def best_time(fn, args, reps, check=None):
    out = fn(*args)[0]
    np.asarray(out[-1:])  # compile + warm
    # correctness gate (r3 review): a variant that computes garbage must
    # not be recorded as a performance number
    if check is not None and not check(out):
        raise AssertionError("variant produced incorrect output")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0][-1:])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, default=28, help="n = 2**exp")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fine", action="store_true", help="also g6/g7")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (timings meaningless)")
    args = ap.parse_args()
    n = 1 << args.exp
    reps = args.reps
    interp = args.interpret

    base = be.EngineTuning()
    variants = [
        ("g8(default)", base),
        ("g5(r1-width)", be.EngineTuning(cross_g_max=5)),
        ("sub64", be.EngineTuning(max_substages=64)),
        # r3 change: cross sweeps widen the payload chunk to the full tile
        # (16x fewer grid steps on g=1 sweeps); narrow = the r2 behavior
        ("narrow-cross-chunk(r2)", be.EngineTuning(cross_chunk_wide=False)),
        ("tile17", be.EngineTuning(tile_bits_cap=17)),
        # MSB-partition front-end (VERDICT r2 item 3): 8-bit and 12-bit
        # splits; partition_min_n=0 so the quick tier also exercises it
        ("part8", be.EngineTuning(partition_bits=8, partition_min_n=0)),
        ("part12", be.EngineTuning(partition_bits=12, partition_min_n=0)),
    ]
    if args.fine:
        # g9/g10: with wide chunks the block is a full tile regardless of g,
        # so wider fusion costs only DMA burst length (2**(18-g)*4B)
        variants[2:2] = [("g6", be.EngineTuning(cross_g_max=6)),
                         ("g7", be.EngineTuning(cross_g_max=7)),
                         ("g9", be.EngineTuning(cross_g_max=9)),
                         ("g10", be.EngineTuning(cross_g_max=10))]

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=n, dtype=np.uint32)))
    floor = best_time(jax.jit(lambda a: [a + jnp.uint32(1)]), (x,), reps)
    print(f"# n=2**{args.exp} u32 keys-only, dispatch floor "
          f"{floor*1e3:.1f} ms, reps={reps}")
    print("| variant | ms | Gkeys/s |")
    print("|---|---|---|")
    rows = []
    for name, tuning in variants:
        fn = jax.jit(lambda b, t=tuning: list(be.sort_words(
            [b], [], interpret=interp, tuning=t)[0]))
        t = max(best_time(fn, (x,), reps,
                          check=lambda o: bool(jnp.all(o[1:] >= o[:-1])))
                - floor, 1e-9)
        rate = n / t / 1e9
        print(f"| {name} | {t*1e3:.1f} | {rate:.3f} |", flush=True)
        rows.append({"variant": name, "ms": round(t * 1e3, 1),
                     "gkeys_s": round(rate, 3)})

    # single-word window packing A/B: 8-bit window pairs sort at 2**24
    # (the packing collapses cmp words 2 -> 1 when window+index fit u32)
    nw = 1 << min(args.exp, 24)
    kw = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=nw, dtype=np.uint32)))
    vw = jax.device_put(jnp.asarray(np.arange(nw, dtype=np.uint32)))

    def window_sort(k, v, packed):
        # mirror pallas_engine.sort_semantics' window path with/without the
        # packing (packed=False forces the 2-word compare tuple)
        win = (k >> jnp.uint32(8)) & jnp.uint32(0xFF)
        idx = jnp.arange(nw, dtype=jnp.uint32)
        if packed:
            cmp = [(win << jnp.uint32(24)) | idx]
        else:
            cmp = [win, idx]
        _, carry = be.sort_words(cmp, [v], interpret=interp)
        return [carry[0]]

    for name, packed in (("window-packed(1w)", True),
                         ("window-2word", False)):
        fn = jax.jit(lambda k, v, p=packed: window_sort(k, v, p))
        # check: payload permuted stably by the 8-bit window -> the window
        # value sequence at the payload's positions must be nondecreasing
        win_np = (np.asarray(kw) >> 8) & 0xFF

        def _wcheck(o):
            w = win_np[np.asarray(o)]
            return bool(np.all(w[1:] >= w[:-1]))

        t = max(best_time(fn, (kw, vw), reps, check=_wcheck) - floor, 1e-9)
        rate = nw / t / 1e9
        print(f"| {name} n=2**{min(args.exp, 24)} | {t*1e3:.1f} | {rate:.3f} |",
              flush=True)
        rows.append({"variant": name, "ms": round(t * 1e3, 1),
                     "gkeys_s": round(rate, 3), "n": nw})
    print(json.dumps({"ab_matrix": rows, "n": n}))


if __name__ == "__main__":
    main()
