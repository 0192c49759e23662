#!/usr/bin/env python
"""Measure the per-element dynamic-load floor on TPU — the cost model behind
rejecting a "Pallas bucketed-DMA gather" payload path (VERDICT r1 item 2).

A final gather pass for sort_pairs payloads would read
``payload[sorted_idx[r]]`` for every output rank r. After sorting by random
keys, ``sorted_idx`` is a uniform random permutation: there are no runs to
bucket, so the gather is irreducibly per-element. Mosaic (jax 0.9 pallas)
exposes no vectorized data-dependent gather in VMEM — the only mechanism is
a scalar loop of dynamic loads. This tool measures that loop's throughput
directly: a ``jax.lax.fori_loop`` of per-element dynamic scalar loads from
an SMEM-resident tile (folded into a checksum, since Mosaic also forbids
scalar stores to VMEM — making the measured floor optimistic).

Reference point it feeds: benchmarks/results.json carry-path rates and the
measured XLA ``jnp.take`` rate (~0.118 Gelem/s at 2**24). The carry path is
the DMA-efficient way to apply a permutation on TPU: the bitonic network
moves payload words exclusively along static strides (contiguous DMA +
register rolls), which is why it beats any per-element formulation by
orders of magnitude.

Usage: python tools/gather_floor.py [--m 4096] [--reps 5]
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THRS_JAX_CACHE", "/root/.cache/thrs_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gather_kernel(idx_ref, src_ref, out_ref, *, m, rounds):
    # Mosaic forbids scalar stores to VMEM, so the per-element loop runs
    # entirely in SMEM: dynamic scalar load per element, folded into a sum
    # (the checksum stands in for the gathered array — the loop trip and the
    # dynamic load are the cost being measured; a real gather would also pay
    # a store, so this floor is *optimistic* for the gather path).
    # `rounds` outer iterations amortize the ~30 ms dispatch floor; the outer
    # counter perturbs the gather index so rounds cannot be CSE'd away.
    def outer(o, acc0):
        def body(i, acc):
            j = idx_ref[0, i]
            return acc + src_ref[0, jnp.bitwise_and(j + o, m - 1)]

        return jax.lax.fori_loop(0, m, body, acc0)

    out_ref[0, 0] = jax.lax.fori_loop(0, rounds, outer, jnp.uint32(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096,
                    help="elements gathered per kernel (VMEM-resident)")
    ap.add_argument("--rounds", type=int, default=2048,
                    help="in-kernel repeats of the m-element loop")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    m = args.m
    assert m & (m - 1) == 0, 'm must be a power of two'
    rounds = args.rounds

    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    idx_np = rng.permutation(m).astype(np.int32).reshape(1, m)
    src_np = rng.integers(0, 2**32, size=(1, m), dtype=np.uint32)
    idx, src = jnp.asarray(idx_np), jnp.asarray(src_np)

    fn = pl.pallas_call(
        functools.partial(gather_kernel, m=m, rounds=rounds),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
    )
    fn = jax.jit(fn)
    out = fn(idx, src)
    j = idx_np[0]
    acc = np.uint32(0)
    for o in range(rounds):
        acc = (acc + src_np[0][(j + np.uint32(o)) & np.uint32(m - 1)].sum(dtype=np.uint64).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(out)[0, 0], acc)

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(fn(idx, src))  # force through the axon tunnel
        best = min(best, time.perf_counter() - t0)
    # subtract the dispatch floor measured by an empty round trip
    t_floor = float("inf")
    noop = jax.jit(lambda x: x + jnp.uint32(1))
    np.asarray(noop(src)[0, :8])
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(noop(src)[0, :8])
        t_floor = min(t_floor, time.perf_counter() - t0)
    total = m * rounds
    per_elem_ns = max(best - t_floor, 1e-9) / total * 1e9
    rate = total / max(best - t_floor, 1e-9)
    print(f"m={m} rounds={rounds}  kernel best {best*1e3:.3f} ms (floor {t_floor*1e3:.3f}) "
          f"-> {per_elem_ns:.1f} ns/elem = {rate/1e9:.4f} Gelem/s")
    print(f"at this rate, a 2**28-element payload gather pass would take "
          f"{(1 << 28) * per_elem_ns / 1e9:.1f} s "
          f"(carry path moves a payload word through the whole network in "
          f"~0.05 s at 2**28)")


if __name__ == "__main__":
    main()
