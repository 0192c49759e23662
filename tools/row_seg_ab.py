#!/usr/bin/env python
"""A/B the row-segmented non-pow2 batched sort on the real chip
(ROADMAP item 11 tail, round 5).

Lever: EngineTuning.row_seg_waste (env THRS_ROW_SEG_WASTE). Batched 2-D
sorts with a non-power-of-two row length either pad every row to 2**r
with max-sentinels (up to 2x per-row work; >= 1.0 forces this) or route
through `_sort_segmented_rows` (0.0 forces this): per-row pow2 prefix via
the truncated row network, per-row remainder recursively, one truncated
row merge — zero in-row padding. All split levels are static axis-1
slices, so one compiled program covers the whole batch.

Workloads: 2-D u32 keys across waste fractions 0.25-0.49, small and
large rows. Timing: benchmarks/full.py batched protocol — chain >= 8
sorts inside one jit (`repeat_fn`; bitonic is data-oblivious) so the
~30 ms dispatch floor amortizes out, best-of-reps. Correctness gate per
variant: every row nondecreasing + global u64 key sum preserved.

Usage: python tools/row_seg_ab.py [--reps 3] [--quick]
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THRS_JAX_CACHE",
                                 "/root/.cache/thrs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tinyhipradixsort_tpu as thrs  # noqa: E402


def repeat_fn(fn, loops):
    """Chain `loops` invocations inside one jit (amortizes the ~30 ms
    dispatch floor; valid because bitonic is data-oblivious)."""
    def run(*xs):
        def body(_, c):
            r = fn(*c)
            return r if isinstance(r, tuple) else (r,)
        return jax.lax.fori_loop(0, loops, body, xs)
    return jax.jit(run)


def run_variant(name, B, nr, waste, reps):
    from tinyhipradixsort_tpu.utils.profiling import time_fn
    os.environ["THRS_ROW_SEG_WASTE"] = str(waste)
    # the A/B probes arbitrary row lengths; disable the production
    # min-row-length gate so `waste` alone decides the route
    os.environ["THRS_ROW_SEG_MIN_NR"] = "0"
    n = B * nr
    # amortize the dispatch floor: batched sorts run at 5-50 Gkeys/s, so
    # chain ~2**29 elements of work (>= 10x the ~30 ms floor) per timed
    # call; big workloads are floor-insensitive, keep the run short
    loops = min(max(1, (1 << 29) // n), 256) if n < (1 << 26) else 2
    mk = jax.jit(lambda s: jax.random.bits(jax.random.key(s), (B, nr),
                                           jnp.uint32))
    sum64 = jax.jit(lambda a: jnp.sum(a.astype(jnp.uint64),
                                      dtype=jnp.uint64))
    keys = mk(jnp.uint32(0))
    want = np.asarray(sum64(keys))
    out = thrs.sort_keys(keys)
    mono = jax.jit(lambda a: jnp.all(a[:, 1:] >= a[:, :-1]))(out)
    assert bool(np.asarray(mono)), f"{name}: rows not sorted"
    got = np.asarray(sum64(out))
    assert got == want, f"{name}: key sum changed {got} != {want}"
    chained = repeat_fn(thrs.sort_keys, loops)
    t, floor = time_fn(chained, keys, reps=reps)
    del os.environ["THRS_ROW_SEG_WASTE"]
    del os.environ["THRS_ROW_SEG_MIN_NR"]
    if t <= 0.0:
        raise RuntimeError(
            f"{name}: floor-dominated even at {loops} chained loops "
            f"(floor {floor * 1e3:.1f} ms) — raise loops")
    return t / loops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--fine", action="store_true",
                    help="crossover probe: waste 0.10-0.15 and small rows")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")

    print(f"# row-seg A/B — platform={jax.devices()[0].platform} "
          f"reps={args.reps}")
    rows = []

    def add(B, nr):
        for label, waste in ((f"{B}x{nr}-pad", 1.0), (f"{B}x{nr}-seg", 0.0)):
            t = run_variant(label, B, nr, waste, args.reps)
            rows.append((label, B * nr, t))
            print(json.dumps({"variant": label, "B": B, "nr": nr,
                              "best_s": round(t, 4),
                              "gkeys_s": round(B * nr / t / 1e9, 4)}),
                  flush=True)

    if args.fine:
        # crossover probe around the flat path's 0.15 (main tier measured
        # seg +32% at waste 0.25, tie at small rows/waste 0.41)
        add(4096, 1740)    # waste 0.15
        add(4096, 1850)    # waste 0.097
        add(16384, 900)    # small rows, waste 0.12
        add(16384, 700)    # small rows, waste 0.32
        add(64, 3_900_000)  # large rows, waste 0.07
        add(4096, 1640)    # waste 0.20
        add(8192, 3300)    # waste 0.19, a=2048
        add(64, 3_500_000)  # large rows, waste 0.17
        print("\n| variant | n | best s | Gkeys/s |")
        print("|---|---|---|---|")
        for label, n, t in rows:
            print(f"| {label} | {n} | {t:.4f} | {n / t / 1e9:.3f} |")
        return

    # waste 0.49, tiny per-row tail (b=16): the pathological padding case
    add(4096, 1040)
    if not args.quick:
        # waste 0.25 at the default threshold boundary, b=512
        add(4096, 1536)
        # waste 0.41, mid tail, more rows
        add(16384, 600)
        # large rows (waste 0.28): per-row networks span many tiles
        add(64, 3_000_000)
        # waste 0.29, b just under a
        add(8192, 2900)

    print("\n| variant | n | best s | Gkeys/s |")
    print("|---|---|---|---|")
    for label, n, t in rows:
        print(f"| {label} | {n} | {t:.4f} | {n / t / 1e9:.3f} |")


if __name__ == "__main__":
    main()
