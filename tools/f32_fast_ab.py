#!/usr/bin/env python
"""Measure the f32 keys-only fast path (zeros_exact=False) at 2**28.

BASELINE.md/README quote "~1.1 Gkeys/s" for `sort_keys(f32,
zeros_exact=False)` @256M from the word-count model (1 carried word vs 2
on the exact path); this records the real number next to the exact-path
0.51. Correctness gate: output bit-equals np.sort on the host slice
*after* normalizing -0.0 -> +0.0 (the documented zeros_exact=False
contract, sort.py), checked on a 2**24 warmup.

Usage: python tools/f32_fast_ab.py [--exp 28] [--reps 3]
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
import tinyhipradixsort_tpu as thrs  # noqa: E402


def gen(seed, n):
    import jax.random as jr
    bits = jr.bits(jr.key(seed), (n,), jnp.uint32)
    # Mixed-sign finite floats incl. +-0.0: mask the exponent below Inf/NaN.
    bits = jnp.where(bits & jnp.uint32(0x7F800000) == jnp.uint32(0x7F800000),
                     bits & jnp.uint32(0xBF800000), bits)
    # Uniform bit patterns make +-0.0 a ~2/2^32 event (ADVICE r3: the
    # normalization gate would be vacuous) — splice a deterministic block
    # of -0.0/+0.0 and equal-magnitude duplicates so the zeros_exact=False
    # contract (-0.0 -> +0.0, zero-tie ordering) is actually exercised.
    k = min(n, 4096)
    pos = jr.randint(jr.key(seed ^ 0x5EED), (k,), 0, n)
    vals = jnp.tile(jnp.asarray([-0.0, 0.0, -0.0, 1.5, -1.5, 1.5, 0.0, -0.0],
                                jnp.float32), k // 8 + 1)[:k]
    bits = jnp.asarray(bits).at[pos].set(
        jax.lax.bitcast_convert_type(vals, jnp.uint32))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def run(name, n, zeros_exact, reps):
    mk = jax.jit(lambda s: gen(s, n))
    best = float("inf")
    for rep in range(reps + 1):
        x = mk(jnp.uint32(rep))
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        out = thrs.sort_keys(x, method="pallas", donate=True,
                             zeros_exact=zeros_exact)
        np.asarray(out[:8])  # force completion through the axon tunnel
        dt = time.perf_counter() - t0
        if rep == 0 and n <= 1 << 24:
            got = np.asarray(out).view(np.uint32)
            want = np.sort(np.asarray(mk(jnp.uint32(rep))), kind="stable")
            if not zeros_exact:
                want = want + np.float32(0.0)  # -0.0 -> +0.0
            assert np.array_equal(got, want.view(np.uint32)), f"{name}: mismatch"
        elif rep > 0:
            best = min(best, dt)
        del x, out
    print(f"| {name} n=2**{n.bit_length()-1} | {best*1e3:.1f} ms "
          f"| {n/best/1e9:.3f} Gkeys/s |", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, default=28)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1 (no timed iterations otherwise)")
    run("f32-fast-gate", 1 << 24, False, args.reps)  # correctness-gated
    run("f32-fast", 1 << args.exp, False, args.reps)
    run("f32-exact", 1 << args.exp, True, args.reps)


if __name__ == "__main__":
    main()
