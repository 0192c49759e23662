#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: u32 keys/s on a full-width single-chip sort of the BASELINE.json
workload (2**28 keys if HBM allows, else the largest power of two that fits),
using the Pallas bitonic engine. ``vs_baseline`` is measured against the
BASELINE.json target of 1e9 u32 keys/s/chip (the reference repo publishes no
numbers; reference benches are runtime printfs — see BASELINE.md).

Timing protocol mirrors the reference's event-timed 160M-key soak loop
(reference: main.cpp:128-167, unittest.cpp:490-572): untimed warm-up
(compile), then best-of-N wall time around block_until_ready. The host<->TPU
tunnel on this machine adds a fixed ~30 ms RPC floor per dispatch; we measure
it with a trivial kernel on the same array and subtract it, reporting device
time (the reference's OroStopwatch measures device events, same concept).

Run: python bench.py [--n N] [--reps R] [--quick]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (first Mosaic compiles take minutes otherwise)
import os
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THRS_JAX_CACHE", "/root/.cache/thrs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, ".")
import tinyhipradixsort_tpu as thrs  # noqa: E402

TARGET_KEYS_PER_S = 1e9  # BASELINE.json: >= 1e9 u32 keys/s/chip


def _best_time(fn, arg, reps):
    """Best-of-reps wall time; completion is forced by fetching one element
    to host (block_until_ready does not flush the async axon tunnel)."""
    np.asarray(fn(arg)[-1:])  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(arg)[-1:])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 28)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="16M keys, 3 reps")
    ap.add_argument("--verify", choices=("full", "spot", "none"),
                    default="full",
                    help="full: whole output vs the native C++ oracle "
                         "(falls back to spot if the oracle .so cannot "
                         "build); spot: device-side sortedness + XOR/sum "
                         "permutation invariants (weaker than full — no "
                         "1 GB fetch); none: timing only")
    args = ap.parse_args()
    n = (1 << 24) if args.quick else args.n
    reps = 3 if args.quick else args.reps

    platform = jax.devices()[0].platform
    method = "pallas" if platform == "tpu" else "argsort"

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32)))

    # dispatch floor: trivial elementwise op on the same array, same protocol
    floor = _best_time(jax.jit(lambda a: a + jnp.uint32(1)), x, reps)

    sort = jax.jit(lambda a: thrs.sort_keys(a, method=method))
    total = _best_time(sort, x, reps)

    # full-output verification once per bench run against the native host
    # oracle (the reference verifies the whole array every soak iteration,
    # main.cpp:174-202; the OpenMP oracle exists precisely to do this at
    # memory speed on multi-GB arrays). Fetch cost over the axon tunnel is
    # ~25 s for 1 GB — untimed. Degrades to the device-side spot check when
    # the on-demand C++ build is unavailable (ADVICE r2) or --verify=spot.
    verify = args.verify
    if verify == "full":
        from tinyhipradixsort_tpu.utils import native_oracle

        if not native_oracle.available():
            print("bench: native oracle unavailable, falling back to "
                  "--verify=spot", file=sys.stderr)
            verify = "spot"
    if verify == "full":
        out = np.asarray(sort(x))
        # u32 ascending: key_bits is the identity, so the oracle is a plain
        # stable radix sort of the raw keys (no permutation needed keys-only)
        want = native_oracle.native_sort_bits(np.asarray(x))
        assert np.array_equal(out, want), "bench output != oracle sort"
    elif verify == "spot":
        # device-side: nondecreasing + first/last 64 kB exact vs np.sort of
        # the matching value-range slice is not possible without a fetch;
        # check sortedness and an XOR/sum permutation invariant instead
        out_d = sort(x)

        def _xor(a):
            return jax.lax.reduce(a, np.uint32(0), jax.lax.bitwise_xor, (0,))

        chk = jax.jit(lambda a, b: (
            jnp.all(a[1:] >= a[:-1]),
            _xor(a) == _xor(b),
            jnp.sum(a, dtype=jnp.uint64) == jnp.sum(b, dtype=jnp.uint64)))
        srt, x_ok, s_ok = (bool(v) for v in chk(out_d, x))
        assert srt and x_ok and s_ok, "bench spot verification failed"

    device_s = max(total - floor, 1e-9)
    keys_per_s = n / device_s
    print(json.dumps({
        "metric": "sort_keys_u32_keys_per_s",
        "value": round(keys_per_s, 1),
        "unit": "keys/s",
        "vs_baseline": round(keys_per_s / TARGET_KEYS_PER_S, 4),
        "n": n,
        "method": method,
        "platform": platform,
        "wall_s": round(total, 4),
        "dispatch_floor_s": round(floor, 4),
    }))


if __name__ == "__main__":
    main()
