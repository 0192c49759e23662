#!/usr/bin/env python
"""Analytic comms model for the distributed sample sort (psort).

On a 1-chip machine the only possible weak-scaling evidence is a model
validated against the *program* (VERDICT r1 item 7): this tool (a) prints
per-phase wire bytes as f(B, P, words) from the same capacity formulas
psort.py uses, (b) predicts weak-scaling efficiency for the BASELINE
16B-key config on v5e slices, and (c) --validate checks the modeled
collective shapes against the actual lowered HLO on the virtual CPU mesh.

Phases modeled (psort.py step numbers):
  0. stride pre-exchange   all_to_all, exact:   (P-1)/P * B elems/word
  2. sample all_gather     (P-1) * s tuples, s = oversample*P
  4. main exchange         P-1 ppermute rounds, static (cap,)/word/round
                           (overlapped with the merge tree by XLA's TPU
                           latency-hiding scheduler)
  6a. counts all_gather    P scalars
  6b. rebalance exchange   2R ring ppermutes of one (cap3,) buffer

Static buffers ship padding too — wire cost is capacity, not payload; the
model reports both ("wire" vs "payload") so the padding tax is visible.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tinyhipradixsort_tpu.parallel.psort import _SAMPLE_BUDGET  # noqa: E402

WORD = 4  # u32 bytes


def capacities(B: int, P: int, oversample: int | None, slack: float | None,
               refine: bool = True):
    """Mirror of psort._psort_entry's capacity formulas (keep in sync).

    Returns (cap, cap3, s, oversample, rounds, W_f). With refine (the
    default, as in psort) the exact-rank splitter refinement drops the
    drift term from O(B*P/s) to W_f = O(P): cap sits at
    B/P + 2*W_f + margin (margin = max(8*sqrt(B/P), B/P/16) stride
    fluctuation cushion) and the _SAMPLE_BUDGET cliff at P > 128 is gone.
    """
    from tinyhipradixsort_tpu.parallel.psort import refine_plan
    auto = oversample is None
    if auto:
        oversample = 32 if refine else max(32, 4 * P)
    if slack is None:
        slack = 1.0 if refine else 1.5
    s = min(B, oversample * P)
    if auto and not refine:  # replicated-sample budget cap
        s = min(s, max(P, _SAMPLE_BUDGET // P))
    drift = int(math.ceil(B * P / s))
    rounds, W_f = refine_plan(B, P, s) if refine else (0, 0)
    margin = 0
    if rounds > 0:
        drift = W_f
        margin = max(8 * math.isqrt(B // P + 1), (B // P) // 16)
    bound = B // P + 2 * drift + margin
    cap = max(int(math.ceil(slack * B / P)), bound) + 8
    cap = min(cap, B)
    cap3 = min(4 * drift + 16, B)  # + (n_pad - n), 0 in the model
    return cap, cap3, s, oversample, rounds, W_f


def phase_bytes(B: int, P: int, W: int, Wc: int, *, oversample=None,
                slack=None):
    """Per-chip egress bytes per phase. W = u32 words on the exchange wire
    (keys-only sorts ship ONLY the key-bits words — the global-index
    tie-break words are synthesized in-shard and dropped before the
    exchange, psort._synth_index_words), Wc = cmp words in the sample
    all_gather (bits + index: splitter tie-breaks need the index)."""
    cap, cap3, s, oversample, rounds, W_f = capacities(B, P, oversample,
                                                       slack)
    f = (P - 1) / P  # fraction leaving the chip in an all_to_all
    k = 8  # refinement candidates per chip per boundary
    return {
        "pre_exchange": f * B * W * WORD,
        "sample_all_gather": (P - 1) * s * Wc * WORD,
        # refinement (psort step 2b): per round, an all_gather of
        # (P-1)*k candidate tuples (Wc words) + an all_reduce (psum) of
        # the (P-1, P*k) rank matrix (8B ranks, ~2x data on the wire)
        "refine_wire": rounds * ((P - 1) * (P - 1) * k * Wc * WORD
                                 + 2 * (P - 1) * (P - 1) * k * 8),
        "main_exchange_wire": (P - 1) * cap * W * WORD,
        "main_exchange_payload": f * B * W * WORD,  # ~exact: every real
        # element moves once (interleaved pre-exchange spreads uniformly)
        # rebalance: 2R ring ppermutes of one (cap3,) buffer (psort.py step
        # 6) — NOT an all_to_all of (P, cap3), which would ship (P-1)*cap3
        "rebalance_wire": 2 * min(P - 1, 4) * cap3 * W * WORD,
        "rebalance_payload": 2 * max(W_f, 1) * W * WORD,  # drift bound
        "counts": (P - 1) * 4,
    }


def predict(n: int, P: int, W: int, Wc: int, *, chip_rate: float,
            bw_per_chip: float, W_sort: int | None = None, oversample=None,
            slack=None):
    """Weak-scaling efficiency: T_1 / T_P for fixed per-chip B = n/P.

    chip_rate: local sort throughput in (elements * words)/s per chip for
    this word count (measured single-chip numbers / W).
    bw_per_chip: usable all_to_all egress bandwidth per chip (bytes/s) —
    ICI within a slice; min(ICI, DCN_share) when DCN is in the path.
    W_sort: words in the *local sort* tuple (defaults to W). Keys-only
    sorts still sort bits+index locally (W_sort=3 at n >= 2**32) while
    exchanging only the bits (W=1).
    """
    B = n // P
    W_sort = W if W_sort is None else W_sort
    ph = phase_bytes(B, P, W, Wc, oversample=oversample, slack=slack)
    wire = (ph["pre_exchange"] + ph["sample_all_gather"] + ph["refine_wire"]
            + ph["main_exchange_wire"] + ph["rebalance_wire"] + ph["counts"])
    t_comm = wire / bw_per_chip
    # local compute: sort B (W_sort words) + merge trees ~ (1 + 2*log2 P)
    # single stages ~ small vs the ~L(L+1)/2-substage sort — model as 10%
    # overhead
    t_local = B * W_sort / chip_rate * 1.10
    t_1 = B * W_sort / chip_rate
    eff = t_1 / (t_local + t_comm)
    return {"B": B, "P": P, "t_local_s": t_local, "t_comm_s": t_comm,
            "wire_bytes": wire, "efficiency": eff, **ph}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--validate", action="store_true",
                    help="check modeled collective shapes vs lowered HLO "
                         "on the virtual CPU mesh")
    args = ap.parse_args()

    if args.validate:
        validate()
        return

    # BASELINE configs[4]: 16B u32 keys. Local tuple: bits(1) + wide
    # index(2) = 3 words; but keys-only sorts ship ONLY the bits word —
    # the index is synthesized in-shard and dropped before the exchange
    # (psort idx_synth, round 4), so W_wire=1 while W_sort=3. The sample
    # all_gather still carries the full 3-word tuple (tie-broken
    # splitters). psort_pairs/psort_indices keep the index on the wire.
    n = 16_000_000_000
    W_sort, Wc = 3, 3
    chip_rate = 2.36e9  # (elem*words)/s, from 1.18 Gkeys/s @ W=2
    for label, W in (("psort_keys (keys-only, W_wire=1)", 1),
                     ("psort_pairs/indices-class (W_wire=3)", 3)):
        print(f"# 16B u32 keys, v5e, {label} — predicted weak-scaling "
              "(ICI-only vs DCN)")
        print("| hosts | chips | B/chip | mem/chip | t_local | t_comm(ICI) "
              "| eff(ICI) | t_comm(DCN) | eff(DCN) |")
        print("|---|---|---|---|---|---|---|---|---|")
        for hosts in (4, 8, 16):
            P = hosts * 8  # v5e host = 8 chips
            # ICI per chip (v5e: 4 links x ~45 GB/s usable ~ 180 GB/s; a 1-D
            # all_to_all rides a ring embedding: assume ~90 GB/s effective)
            ici = 90e9
            # DCN: ~100 GB/s per host NIC shared by 8 chips, and the
            # all_to_all fraction crossing hosts is ~(hosts-1)/hosts of
            # traffic -> the per-chip effective rate for cross-host bytes
            dcn_per_chip = 100e9 / 8
            r_ici = predict(n, P, W, Wc, chip_rate=chip_rate,
                            bw_per_chip=ici, W_sort=W_sort)
            cross = (P - 8) / P  # fraction of a2a pairs crossing hosts
            eff_bw = 1.0 / (cross / dcn_per_chip + (1 - cross) / ici)
            r_dcn = predict(n, P, W, Wc, chip_rate=chip_rate,
                            bw_per_chip=eff_bw, W_sort=W_sort)
            mem = r_ici["B"] * (W_sort * 4 * 2.5)  # words + buffers (x2.5)
            print(f"| {hosts} | {P} | {r_ici['B']/1e6:.0f}M "
                  f"| {mem/1e9:.1f} GB "
                  f"| {r_ici['t_local_s']:.2f}s | {r_ici['t_comm_s']:.2f}s "
                  f"| {r_ici['efficiency']*100:.0f}% "
                  f"| {r_dcn['t_comm_s']:.2f}s "
                  f"| {r_dcn['efficiency']*100:.0f}% |")
        print()
    print(json.dumps({"keys_only_W1": {
        k: round(v) if isinstance(v, float) else v
        for k, v in phase_bytes(n // 64, 64, 1, Wc).items()}}))


def validate():
    """Count/shape-check the collectives in the lowered HLO (8-dev mesh)."""
    import re

    import jax
    jax.config.update("jax_platforms", "cpu")
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tinyhipradixsort_tpu.parallel import make_sort_mesh, psort_keys

    mesh = make_sort_mesh()
    P = 8
    n = 1 << 20
    lowered = jax.jit(lambda k: psort_keys(k, mesh=mesh, check=True)).lower(
        jax.ShapeDtypeStruct((n,), jnp.uint32))
    text = lowered.as_text()
    a2a = re.findall(r"all-to-all\(|all_to_all", text)
    ag = re.findall(r"all-gather\(|all_gather", text)
    cp = re.findall(r"collective-permute|collective_permute", text)
    B = n // P
    cap, cap3, s, ov, rounds, W_f = capacities(B, P, None, None)
    # psort_keys is keys-only: W_wire=1 (bits only; the index word is
    # synthesized in-shard and never shipped). Expected collectives:
    # 1 a2a (pre-exchange, 1 word), (P-1)*(1 word + 1 len) ring permutes
    # + 2R rebalance permutes = 22 at P=8.
    print(f"HLO collectives: {len(a2a)} all-to-all, {len(ag)} all-gather")
    print(f"model: cap={cap} cap3={cap3} s={s} oversample={ov} "
          f"(main wire/chip = {(P-1)*cap*1*4/1e6:.2f} MB, "
          f"pre = {(P-1)/P*B*1*4/1e6:.2f} MB)")
    for shape in set(re.findall(r"all-to-all[^=]*= \(?([a-z0-9\[\],]+)", text)):
        print("  a2a shape:", shape[:80])
    assert len(a2a) == 1, (
        "keys-only pre-exchange must ship exactly one word (bits; the "
        f"index is synthesized in-shard) — got {len(a2a)} all-to-alls")
    assert len(ag) >= 2, "expected sample + counts all_gathers"
    assert len(cp) >= 2 * (P - 1), "expected ring + rebalance ppermutes"
    print(f"  ({len(cp)} collective-permutes: ring rounds + rebalance)")
    print("validate: HLO collective structure matches the model")


if __name__ == "__main__":
    main()
