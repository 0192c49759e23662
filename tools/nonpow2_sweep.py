#!/usr/bin/env python
"""On-chip correctness sweep of the non-pow2 (segmented + truncated-merge)
path — round 5 regression tool.

The round-5 change rewired every non-power-of-two sort: routing
(`seg_pad_waste` crossover default), the run merge (truncated
virtual-sentinel form), and the nesting cap (`_MAX_SEG_DEPTH`). This
sweep drives the REAL chip across the size classes those changes touch:

- random non-pow2 sizes per power decade 2**16..2**26 (seg and pad sides
  of the 0.15 threshold),
- near-pow2 (2**k +- 1) and 4096-divisible sizes (the XLA:TPU layout
  pathology class),
- u32 keys, u32+u32 stable pairs (multi-word truncated merge), f32 keys
  (tagged-index rebuild through the merge).

Verification is EXACT vs numpy (stable) oracles up to 2**24 and
sortedness + u64-sum + endpoint checks above. Exits non-zero on failure.

Usage: python tools/nonpow2_sweep.py [--seed 0] [--big]
"""

import argparse
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

FAILS = 0


def check(name, ok):
    global FAILS
    if ok:
        print(f"ok: {name}", flush=True)
    else:
        FAILS += 1
        print(f"FAIL: {name}", flush=True)


def keys_case(rng, n, exact):
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    out = np.asarray(thrs.sort_keys(jnp.asarray(x)))
    if exact:
        check(f"keys u32 n={n}", np.array_equal(out, np.sort(x)))
    else:
        ok = (bool(np.all(out[1:] >= out[:-1]))
              and out.astype(np.uint64).sum() == x.astype(np.uint64).sum()
              and out[0] == x.min() and out[-1] == x.max())
        check(f"keys u32 n={n} (sum-gated)", ok)


def pairs_case(rng, n):
    k = rng.integers(0, 2**16, n, dtype=np.uint32)  # dense ties
    v = np.arange(n, dtype=np.uint32)
    sk, sv = thrs.sort_pairs(jnp.asarray(k), jnp.asarray(v))
    order = np.argsort(k, kind="stable")
    check(f"pairs u32+u32 stable n={n}",
          np.array_equal(np.asarray(sk), k[order])
          and np.array_equal(np.asarray(sv), v[order]))


def f32_case(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    x[:: max(n // 64, 1)] = -0.0
    out = np.asarray(thrs.sort_keys(jnp.asarray(x)))
    check(f"keys f32 n={n}",
          np.array_equal(out.view(np.uint32), np.sort(x).view(np.uint32)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--big", action="store_true",
                    help="include 2**26-scale sum-gated cases")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    print(f"# non-pow2 sweep — platform={jax.devices()[0].platform}")

    sizes = []
    for k in range(16, 25):
        lo, hi = (1 << k) + 1, (1 << (k + 1)) - 1
        sizes += [int(rng.integers(lo, hi)) for _ in range(2)]
    # threshold-straddling (waste 0.10 / 0.20 around the 0.15 default)
    sizes += [int((1 << 22) * 0.90), int((1 << 22) * 0.80)]
    # near-pow2 and 4096-divisible (XLA layout pathology class)
    sizes += [(1 << 20) + 1, (1 << 22) - 1, (1 << 22) + 4096 * 3,
              4096 * 2741]
    for n in sorted(set(sizes)):
        keys_case(rng, n, exact=True)
    for n in [int(rng.integers((1 << 21) + 1, (1 << 22))),
              (1 << 22) + 12345]:
        pairs_case(rng, n)
        f32_case(rng, n)
    if args.big:
        for n in [160_000_000, (1 << 26) + 4096 * 7,
                  int((1 << 26) * 0.82)]:
            keys_case(rng, n, exact=False)

    print(f"FAILURES: {FAILS}", flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
