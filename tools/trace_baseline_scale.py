#!/usr/bin/env python
"""Lower + XLA-compile the literal BASELINE configs[4] workload, at scale.

16,000,000,000 u32 keys over a P-chip mesh (the comms-model flagship
slice, docs/DESIGN.md §4a) cannot execute on this 1-chip host, but the
whole program — wide (two-u32-word) global ranks, static exchange
capacities, ring-ppermute rebalance, i64 rank arithmetic — can be traced
and compiled with no buffers allocated. Together with the forced-wide
*execution* tests at small n (tests/test_distributed.py), this is the
strongest single-host evidence the flagship distributed config is real.

``--P`` sweeps mesh sizes (VERDICT r2 item 5: compile feasibility at pod
scale — the ring builds P-1 unrolled rounds, so HLO size and compile time
grow O(P); this tool measures where that breaks). Runs on P virtual CPU
devices; prints one table row per P and exits 0 on success.

Usage: python tools/trace_baseline_scale.py [--P 64,128,256] [--n N]
"""

import argparse
import os
import sys
import time

_ap = argparse.ArgumentParser()
_ap.add_argument("--P", default="64",
                 help="comma list of mesh sizes (each = one run)")
_ap.add_argument("--n", type=int, default=16_000_000_000)
_args = _ap.parse_args()
_PS = [int(p) for p in _args.P.split(",")]
_PMAX = max(_PS)

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={_PMAX}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tinyhipradixsort_tpu.parallel.psort import psort_keys  # noqa: E402


def run_one(P: int, n: int):
    devs = jax.devices()[:P]
    assert len(devs) == P, (len(devs), P)
    mesh = jax.sharding.Mesh(np.array(devs), ("shards",))
    fn = jax.jit(lambda k: psort_keys(k, mesh=mesh, check=True))
    t0 = time.perf_counter()
    lowered = fn.lower(jax.ShapeDtypeStruct((n,), jnp.uint32))
    t_lower = time.perf_counter() - t0
    text = lowered.as_text()
    counts = {name: text.count("stablehlo." + name)
              + text.count(name.replace("_", "-"))
              for name in ("all_to_all", "collective_permute", "all_gather",
                           "all_reduce")}
    assert counts["all_to_all"] >= 1 and counts["collective_permute"] >= 1, counts
    t0 = time.perf_counter()
    lowered.compile()  # no buffers allocated
    t_compile = time.perf_counter() - t0
    print(f"| {P} | {n:,} | {t_lower:.0f} s | {t_compile:.0f} s "
          f"| {len(text)/1e6:.1f} MB | {counts['collective_permute']} "
          f"| {counts['all_to_all']} |", flush=True)
    return counts


def main():
    print(f"# BASELINE configs[4] scale sweep: n={_args.n:,} u32, "
          f"virtual CPU devices (1-core host; wall times are upper bounds)")
    print("| P | n | lower | XLA compile | HLO text | ppermutes | a2a |")
    print("|---|---|---|---|---|---|---|")
    for P in _PS:
        run_one(P, _args.n)
    print("OK")


if __name__ == "__main__":
    main()
