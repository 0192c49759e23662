#!/usr/bin/env python
"""Lower + XLA-compile the literal BASELINE configs[4] workload.

16,000,000,000 u32 keys over a 64-chip mesh (the comms-model flagship
slice, docs/DESIGN.md §4a) cannot execute on this 1-chip host, but the
whole program — wide (two-u32-word) global ranks, static exchange
capacities, ring-ppermute rebalance, i64 rank arithmetic — can be traced
and compiled with no buffers allocated. Together with the forced-wide
*execution* tests at small n (tests/test_distributed.py), this is the
strongest single-host evidence the flagship distributed config is real.

Runs on 64 virtual CPU devices; prints the collective inventory of the
lowered HLO and exits 0 on success.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=64")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tinyhipradixsort_tpu.parallel.psort import psort_keys  # noqa: E402


def main():
    devs = jax.devices()
    assert len(devs) == 64, devs
    mesh = jax.sharding.Mesh(np.array(devs), ("shards",))
    n = 16_000_000_000  # BASELINE.json configs[4]
    fn = jax.jit(lambda k: psort_keys(k, mesh=mesh, check=True))
    lowered = fn.lower(jax.ShapeDtypeStruct((n,), jnp.uint32))
    text = lowered.as_text()
    counts = {name: text.count("stablehlo." + name) + text.count(name.replace("_", "-"))
              for name in ("all_to_all", "collective_permute", "all_gather",
                           "all_reduce")}
    assert counts["all_to_all"] >= 1 and counts["collective_permute"] >= 1, counts
    lowered.compile()  # no buffers allocated
    print(f"BASELINE configs[4]: n={n:,} u32 over {len(devs)} devices "
          f"lowered + compiled OK")
    print("collective inventory:", counts)


if __name__ == "__main__":
    main()
