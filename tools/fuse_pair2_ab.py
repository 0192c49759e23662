#!/usr/bin/env python
"""A/B the fused two-bit pair-split CE (`substage_pair2`) on the real chip.

The r4 substage-reduction experiment (VERDICT r3 item 8): DESIGN.md §3
parks "fewer substages" as the only path past ~1.3 Gkeys/s single-chip.
`substage_pair2` runs two consecutive pair-form substages on one 4-way
split view — identical compare count, but ONE reassembly (two stack
levels) per substage pair instead of two full interleaves. The candidate
saving is the interleave overhead (~1 of the measured ~3 vector ops per
pair substage); the risk is that Mosaic does not fuse the two stack
levels and the reassembly costs the same two relayouts it replaces.

Workloads (both correctness-gated on device):
  u32 keys-only at 2**exp (the headline class; local sorts are ~70 ms of
  the 211 ms total, merge locals ~85 ms — both are pair-substage-heavy)
  u32+u32 stable pairs at 2**(exp-2) (3-word: the lex-compare form)

Usage: python tools/fuse_pair2_ab.py [--exp 28] [--reps 5] [--interpret]
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


def best_time(fn, args, reps, check):
    out = fn(*args)
    np.asarray(out[0][-1:])  # compile + warm (fetch forces axon completion)
    if not check(out):
        raise AssertionError("variant produced incorrect output")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0][-1:])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, default=28)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (timings meaningless)")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")
    interp = args.interpret
    reps = args.reps
    rng = np.random.default_rng(0)

    variants = [("default", be.EngineTuning()),
                ("fuse_pair2", be.EngineTuning(fuse_pair2=True))]

    # --- u32 keys-only ---
    n = 1 << args.exp
    x = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=n, dtype=np.uint32)))
    floor = best_time(jax.jit(lambda a: [a + jnp.uint32(1)]), (x,), reps,
                      lambda o: True)
    print(f"# n=2**{args.exp} u32 keys-only, dispatch floor "
          f"{floor*1e3:.1f} ms, reps={reps}")
    print("| variant | ms | Gkeys/s |")
    print("|---|---|---|")
    for name, tuning in variants:
        fn = jax.jit(lambda b, t=tuning: list(be.sort_words(
            [b], [], interpret=interp, tuning=t)[0]))
        t = max(best_time(fn, (x,), reps,
                          check=lambda o: bool(jnp.all(o[0][1:] >= o[0][:-1])))
                - floor, 1e-9)
        print(f"| {name} | {t*1e3:.1f} | {n/t/1e9:.3f} |", flush=True)
        print(json.dumps({"workload": "u32-keys", "variant": name,
                          "ms": round(t * 1e3, 1),
                          "gkeys_s": round(n / t / 1e9, 3)}), flush=True)

    # --- u32+u32 stable pairs (3 words: key, index, payload-carry) ---
    np_ = 1 << (args.exp - 2)
    kp = jax.device_put(jnp.asarray(
        rng.integers(0, 2**16, size=np_, dtype=np.uint32)))  # dense ties
    vp = jax.device_put(jnp.asarray(np.arange(np_, dtype=np.uint32)))
    key_sum = int(np.asarray(kp).astype(np.uint64).sum())
    pay_sum = int(np.asarray(vp).astype(np.uint64).sum())

    def pairs_sort(k, v, tuning):
        idx = jnp.arange(np_, dtype=jnp.uint32)
        cw, carry = be.sort_words([k, idx], [v], interpret=interp,
                                  tuning=tuning)
        return [cw[0], carry[0]]

    def pairs_check(o):
        ks, vs = np.asarray(o[0]), np.asarray(o[1])
        if not np.all(ks[1:] >= ks[:-1]):
            return False
        # sums preserved (tie-duplication would change the payload sum)
        return (int(ks.astype(np.uint64).sum()) == key_sum
                and int(vs.astype(np.uint64).sum()) == pay_sum)

    print(f"# n=2**{args.exp - 2} u32+u32 stable pairs")
    print("| variant | ms | Gpairs/s |")
    print("|---|---|---|")
    for name, tuning in variants:
        fn = jax.jit(lambda k, v, t=tuning: pairs_sort(k, v, t))
        t = max(best_time(fn, (kp, vp), reps, check=pairs_check) - floor,
                1e-9)
        print(f"| {name} | {t*1e3:.1f} | {np_/t/1e9:.3f} |", flush=True)
        print(json.dumps({"workload": "u32+u32-pairs", "variant": name,
                          "ms": round(t * 1e3, 1),
                          "gpairs_s": round(np_ / t / 1e9, 3)}), flush=True)


if __name__ == "__main__":
    main()
