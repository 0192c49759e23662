#!/usr/bin/env python
"""A/B the round-3 pairs-path changes on the real chip.

Pairs are the weakest perf axis (KV64 @256M measured 0.147 Gpairs/s vs
1.285 Gkeys/s u32 keys-only — ~2x below a pure word-scaling model). Two
levers, both trace-safe:

  pad16/pad32   THRS_PAD_TARGET_MB: the per-word tile byte budget. The
                8 MB default drops 5-word KV64 to tile 2**16 (4x the grid
                steps, 2 extra cross-sweep levels vs 2**18); 5 words at
                tile 2**18 are ~21 MB of the 100 MB scoped-VMEM limit.
  unstable      sort_pairs(stable=False): drops the stability index word
                on pad-free sizes (u32+u32 3->2 moved words, u64+u64
                5->4) with tie-consistent kernels.

Timing: donated buffers, inputs regenerated on device per rep (ours-only —
the jnp column exceeds HBM at 256M KV64), best-of-reps wall time. Each
variant is correctness-gated on device: keys nondecreasing + key/payload
sums preserved (a tie-duplication bug changes the payload sum — also
probed explicitly by the all-equal-keys unstable case at 2**24).

Usage: python tools/pairs_ab.py [--exp 28] [--reps 3] [--quick]
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
import tinyhipradixsort_tpu as thrs  # noqa: E402


def gen_kv(seed, n, key_dtype, val_dtype):
    import jax.random as jr
    kd, vd = jnp.dtype(key_dtype), jnp.dtype(val_dtype)
    k = jr.key(seed)
    if kd.itemsize == 8:
        hi = jr.bits(k, (n,), jnp.uint32).astype(jnp.uint64)
        lo = jr.bits(jr.fold_in(k, 1), (n,), jnp.uint32).astype(jnp.uint64)
        keys = (hi << jnp.uint64(32)) | lo
    else:
        keys = jr.bits(k, (n,), jnp.uint32)
    vals = jnp.arange(n, dtype=vd)
    return keys, vals


def _sum64(a):
    if a.dtype.itemsize == 8:
        return jnp.sum(a, dtype=jnp.uint64)
    return jnp.sum(a.astype(jnp.uint64), dtype=jnp.uint64)


@jax.jit
def _checks(sk, sv):
    return (jnp.all(sk[1:] >= sk[:-1]), _sum64(sk), _sum64(sv))


def run_variant(name, n, kdt, vdt, stable, pad_mb, reps):
    if pad_mb:
        os.environ["THRS_PAD_TARGET_MB"] = str(pad_mb)
    else:
        os.environ.pop("THRS_PAD_TARGET_MB", None)
    mk = jax.jit(lambda s: gen_kv(s, n, kdt, vdt))
    best = float("inf")
    for rep in range(reps + 1):  # rep 0 = compile + correctness gate
        keys, vals = mk(jnp.uint32(rep))
        if rep == 0:
            want_k, want_v = np.asarray(_sum64(keys)), np.asarray(_sum64(vals))
        jax.block_until_ready((keys, vals))
        t0 = time.perf_counter()
        sk, sv = thrs.sort_pairs(keys, vals, method="pallas",
                                 donate=True, stable=stable)
        np.asarray(sk[:8]), np.asarray(sv[:8])  # force completion
        dt = time.perf_counter() - t0
        if rep == 0:
            ok, got_k, got_v = (np.asarray(x) for x in _checks(sk, sv))
            assert bool(ok), f"{name}: keys not sorted"
            assert got_k == want_k, f"{name}: key sum changed"
            assert got_v == want_v, f"{name}: payload sum changed (tuple loss)"
        else:
            best = min(best, dt)
        del keys, vals, sk, sv
    rate = n / best / 1e9
    print(f"| {name} | {best*1e3:.1f} | {rate:.3f} |", flush=True)
    return {"variant": name, "ms": round(best * 1e3, 1),
            "gpairs_s": round(rate, 3), "n": n}


def all_equal_probe(n):
    """All-equal keys, unstable: every CE ties — payload sum preserved
    proves the tie-consistent kernels emit a permutation."""
    keys = jnp.full((n,), jnp.uint32(0xFFFFFFFF))
    vals = jnp.arange(n, dtype=jnp.uint32)
    want = np.asarray(_sum64(vals))
    sk, sv = thrs.sort_pairs(keys, vals, method="pallas", stable=False)
    ok, _, got = (np.asarray(x) for x in _checks(sk, sv))
    assert bool(ok) and got == want, "all-equal unstable probe FAILED"
    print(f"# all-equal-keys unstable probe @2**{n.bit_length()-1}: ok",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, default=28)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="2**24, fewer variants")
    args = ap.parse_args()
    exp = 24 if args.quick else args.exp
    n = 1 << exp
    rows = []

    all_equal_probe(1 << min(exp, 24))

    print(f"# u64 keys + u64 payload (KV64), n=2**{exp}, reps={args.reps}")
    print("| variant | ms | Gpairs/s |")
    print("|---|---|---|")
    kv64 = [("kv64-stable-pad8(default)", True, 0),
            ("kv64-stable-pad16", True, 16),
            ("kv64-stable-pad32", True, 32),
            ("kv64-unstable-pad8", False, 0),
            ("kv64-unstable-pad32", False, 32)]
    for name, stable, pad in kv64:
        rows.append(run_variant(name, n, jnp.uint64, jnp.uint64,
                                stable, pad, args.reps))

    print(f"# u32 keys + u32 payload, n=2**{exp}")
    print("| variant | ms | Gpairs/s |")
    print("|---|---|---|")
    kv32 = [("kv32-stable-pad8(default)", True, 0),
            ("kv32-stable-pad16", True, 16),
            ("kv32-unstable-pad8", False, 0),
            ("kv32-unstable-pad16", False, 16)]
    for name, stable, pad in kv32:
        rows.append(run_variant(name, n, jnp.uint32, jnp.uint32,
                                stable, pad, args.reps))

    os.environ.pop("THRS_PAD_TARGET_MB", None)
    print(json.dumps({"pairs_ab": rows, "n": n}))


if __name__ == "__main__":
    main()
