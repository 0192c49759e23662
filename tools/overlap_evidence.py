#!/usr/bin/env python
"""Schedule-level evidence for the ring-exchange/merge overlap (VERDICT r2
item 4).

DESIGN.md §4a's ≥80% weak-scaling prediction is conditional on XLA's TPU
latency-hiding scheduler running each ring round's collective-permute
concurrently with the previous rounds' merge kernels. This machine has one
chip, so the obtainable evidence is the *compiled schedule*: AOT-compile a
small `psort_keys` program for a multi-chip TPU topology
(`jax.experimental.topologies` — no devices needed, only the compiler),
then scan the post-optimization HLO for `collective-permute-start` ...
`collective-permute-done` pairs and count the compute ops (fusions /
custom-calls = merge kernels) scheduled between them. Start/done pairs
with real compute in between == the scheduler hides the wire time; pairs
that are back-to-back == no overlap, and DESIGN.md §4a's 72–73%
sensitivity row is the operative claim.

Falls back to the attached backend's devices when the topology API is
unavailable. CPU schedules prove nothing about the TPU scheduler — the
tool says so instead of claiming evidence.

Usage: python tools/overlap_evidence.py [--topo v5e:2x2] [--n 2**16]
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_devices(topo_name: str):
    import jax

    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(topo_name, "tpu")
        devs = list(topo.devices)
        return devs, f"AOT topology {topo_name}", True
    except Exception as e:  # noqa: BLE001 - report and fall back
        print(f"# topology API unavailable ({type(e).__name__}: {e}); "
              f"falling back to attached devices", flush=True)
    devs = jax.devices()
    # an attached multi-device TPU slice compiles through the real TPU
    # scheduler too — only non-TPU backends disqualify the overlap claim
    # (review r3: attached slices were misclassified as "not TPU")
    is_tpu = devs[0].platform == "tpu" and len(devs) >= 2
    return devs, f"attached backend {devs[0].platform}", is_tpu


_LHS_RE = re.compile(r"^\s*%([\w.-]+) = ")
_DONE_RE = re.compile(r" collective-permute-done\(%([\w.-]+)\)")
_COMPUTE_RE = re.compile(r" (fusion|custom-call|sort|while)\(")
_DIMS_RE = re.compile(r"\w+\[([\d,]*)\]")


def _max_elems(shape_text: str) -> int:
    """Largest array element count in an HLO shape string (the permute's
    payload size, vs the tiny scalar sideband tensors)."""
    best = 1
    for dims in _DIMS_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        best = max(best, n)
    return best


def analyze(text: str):
    """Pairs of (start_line, done_line, compute ops between, payload elems)
    in schedule order. `is_scheduled=true` HLO lists instructions in
    execution order within each computation, so any fusion/custom-call
    between a collective-permute-start and its -done is compute the TPU
    scheduler runs while that permute's DMA is in flight.

    Parsing note: a done line (`%x = ty collective-permute-done(%start)`)
    textually *contains* "collective-permute-start", so opcode matching
    must anchor on " collective-permute-start(" after the `=`, not a bare
    substring search (the round-2 version of this tool paired nothing)."""
    starts = {}  # lhs name -> (line_no, compute_count_at_start, payload)
    pairs = []
    n_compute = 0
    for i, ln in enumerate(text.splitlines()):
        m = _LHS_RE.match(ln)
        if not m:
            continue
        if " collective-permute-start(" in ln:
            starts[m.group(1)] = (i, n_compute, _max_elems(ln))
            continue
        dm = _DONE_RE.search(ln)
        if dm and dm.group(1) in starts:
            si, sc, elems = starts.pop(dm.group(1))
            pairs.append((si, i, n_compute - sc, elems))
            continue
        if _COMPUTE_RE.search(ln):
            n_compute += 1
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topo", default="v5e:2x2")
    ap.add_argument("--exp", type=int, default=16, help="n = 2**exp")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("THRS_JAX_CACHE", "/root/.cache/thrs_jax_cache"))

    devs, how, is_tpu_sched = get_devices(args.topo)
    if len(devs) < 2:
        print("# need >= 2 (abstract) devices for a ring; none available — "
              "re-run when the topology API or a slice is reachable")
        return 1
    from tinyhipradixsort_tpu.parallel.psort import psort_keys

    mesh = jax.sharding.Mesh(np.array(devs), ("shards",))
    n = 1 << args.exp
    method = "pallas" if (is_tpu_sched or devs[0].platform == "tpu") \
        else "lexsort"
    fn = jax.jit(lambda k: psort_keys(k, mesh=mesh, check=True,
                                      method=method))
    lowered = fn.lower(jax.ShapeDtypeStruct((n,), jnp.uint32))
    compiled = lowered.compile()
    text = compiled.as_text()
    pairs = analyze(text)
    overlapped = [p for p in pairs if p[2] > 0]
    # the data-exchange permutes are the ones that matter for the ≥80%
    # claim; the sideband count/flag permutes are tiny scalars
    big = [p for p in pairs if p[3] >= 1024]
    big_overlapped = [p for p in big if p[2] > 0]
    print(f"# compiled via {how}; n={n}, P={len(devs)}, method={method}")
    print(f"# {len(pairs)} collective-permute start/done pairs in the "
          f"scheduled module; {len(overlapped)} have compute scheduled "
          f"between start and done")
    print(f"# payload-bearing pairs (>=1024 elems): {len(big)}, of which "
          f"{len(big_overlapped)} overlapped with compute")
    for si, di, c, elems in sorted(pairs, key=lambda p: -p[3])[:16]:
        print(f"  start@L{si} .. done@L{di}: {c} compute ops in flight, "
              f"payload {elems} elems")
    if not is_tpu_sched:
        print("# NOTE: this is NOT the TPU scheduler — structure only, "
              "no overlap claim can be made from this run")
        return 0
    if big_overlapped:
        print("OVERLAP EVIDENCE: the TPU scheduler interleaves merge "
              "compute with in-flight payload collective-permutes "
              f"({len(big_overlapped)}/{len(big)} payload pairs, "
              f"{len(overlapped)}/{len(pairs)} overall)")
    elif overlapped:
        print("PARTIAL: only sideband (scalar) permutes overlap; payload "
              "exchanges are scheduled back-to-back — DESIGN.md §4a's "
              "un-overlapped 72-73% row is the operative prediction")
    else:
        print("NO OVERLAP in this schedule: DESIGN.md §4a's un-overlapped "
              "72-73% row is the operative prediction")
    return 0


if __name__ == "__main__":
    sys.exit(main())
