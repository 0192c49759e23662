#!/usr/bin/env python
"""A/B the round-5 non-pow2 changes on the real chip (ROADMAP item 1 tail).

Two trace-safe levers:

  trunc / padmerge   EngineTuning.trunc_merge: the truncated
                     (virtual-sentinel) merge — cross-half CE levels whose
                     partner is a sentinel are computed densely in jnp and
                     every all-real half runs the standard pow2 stage-merge
                     sweeps with ZERO padding — vs the round-1 padded
                     [asc, sentinel block, desc] construction that runs the
                     final merge at the next power of two (1.67x elements
                     at the 160M reference workload).
  seg / pad          EngineTuning.seg_pad_waste: route a non-pow2 n through
                     the pow2-segment decomposition (waste > threshold) or
                     pad the whole sort to 2**L. With the truncated merge
                     the segmented el-substage cost is never above the
                     padded cost (sort(2**L) = 2 sort(2**(L-1)) + merge is
                     the same network), so the crossover is set purely by
                     constant overheads (dense-CE HBM trips, kernel
                     variety); this tool measures it.

Workloads: u32 keys-only at the reference's own 160M headline size
(/root/reference/main.cpp:105) plus waste-fraction sweep sizes
(1-w)*2**28. Timing: bench.py protocol (device-regenerated inputs,
best-of-reps wall minus nothing — sizes are large enough that the ~30 ms
dispatch floor is in the noise; report raw and floor-subtracted).
Correctness gate per variant: nondecreasing + u64 key sum preserved.

Usage: python tools/seg_merge_ab.py [--reps 3] [--quick]
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
                  os.environ.get("THRS_JAX_CACHE",
                                 "/root/.cache/thrs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tinyhipradixsort_tpu as thrs  # noqa: E402


def run_variant(name, n, seg_waste, trunc, reps):
    os.environ["THRS_SEG_PAD_WASTE"] = str(seg_waste)
    os.environ["THRS_TRUNC_MERGE"] = "1" if trunc else "0"
    mk = jax.jit(lambda s: jax.random.bits(jax.random.key(s), (n,),
                                           jnp.uint32))
    sum64 = jax.jit(lambda a: jnp.sum(a.astype(jnp.uint64),
                                      dtype=jnp.uint64))
    best = float("inf")
    for rep in range(reps + 1):
        keys = mk(jnp.uint32(rep))
        if rep == 0:
            want = np.asarray(sum64(keys))
        jax.block_until_ready(keys)
        t0 = time.perf_counter()
        out = thrs.sort_keys(keys)
        np.asarray(out[-1:])  # force through the axon tunnel
        dt = time.perf_counter() - t0
        if rep == 0:
            mono = jax.jit(lambda a: jnp.all(a[1:] >= a[:-1]))(out)
            assert bool(np.asarray(mono)), f"{name}: output not sorted"
            got = np.asarray(sum64(out))
            assert got == want, f"{name}: key sum changed {got} != {want}"
        else:
            best = min(best, dt)
    del os.environ["THRS_SEG_PAD_WASTE"]
    del os.environ["THRS_TRUNC_MERGE"]
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="160M + one sweep size only")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")

    print(f"# seg/merge A/B — platform={jax.devices()[0].platform} "
          f"reps={args.reps}")
    rows = []

    def add(label, n, seg_waste, trunc):
        t = run_variant(label, n, seg_waste, trunc, args.reps)
        rows.append((label, n, t))
        print(json.dumps({"variant": label, "n": n, "best_s": round(t, 4),
                          "gkeys_s": round(n / t / 1e9, 4)}), flush=True)

    # the reference's headline workload: segmented either way (waste 0.40);
    # this pair isolates the truncated-vs-padded merge
    n160 = 160_000_000
    add("160M-seg-trunc", n160, 0.25, True)
    add("160M-seg-padmerge", n160, 0.25, False)

    # waste-fraction sweep: padded whole-sort vs segmented+truncated.
    # Sizes deliberately NOT 4096-aligned (realistic n; the aligned case is
    # the regression variant below).
    sweep = [0.12] if args.quick else [0.25, 0.12, 0.06, 0.03]
    for w in sweep:
        n = int((1 << 28) * (1.0 - w)) - 1337
        add(f"w{w}-pad", n, 1.0, True)
        add(f"w{w}-seg", n, 0.0, True)

    # regression: 4096-divisible n with a fully recursive segmented chain —
    # the config that provoked the 30 GB reshape layout before the
    # small-tail materialization cap (round 5)
    if not args.quick:
        add("aligned-seg-regress", 236220416, 0.0, True)

    print("\n| variant | n | best s | Gkeys/s |")
    print("|---|---|---|---|")
    for label, n, t in rows:
        print(f"| {label} | {n} | {t:.4f} | {n / t / 1e9:.3f} |")


if __name__ == "__main__":
    main()
