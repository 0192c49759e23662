"""Multi-host bootstrap helpers.

The reference has no distributed anything (SURVEY.md §2); on TPU pods the
process group is JAX's own. These helpers wrap the standard flow so the
distributed sort can run across hosts with one call per process:

    from tinyhipradixsort_tpu.parallel import multihost
    multihost.initialize()            # env-driven on Cloud TPU / GKE
    mesh = multihost.global_sort_mesh()
    out = thrs.psort_keys(keys, mesh=mesh)

All collectives in :mod:`.psort` are ordinary XLA collectives under
``shard_map``, so they ride ICI within a slice and DCN across slices with no
code changes — the mesh device order determines the ring.
"""

from __future__ import annotations

import jax

# NOTE: no eager `.psort` import here — psort builds module-level device
# constants, which initializes the XLA backend, and
# ``jax.distributed.initialize`` refuses to run once the backend exists.
# This module must stay importable before process-group bootstrap
# (tests/test_multihost.py exercises the real two-process flow).


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` with env-driven defaults.

    On Cloud TPU (GCE/GKE) all arguments are discovered automatically; pass
    them explicitly for manual clusters. Must be called once per process,
    before any other JAX call (including importing modules that build
    device constants, e.g. :mod:`.psort`).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_sort_mesh():
    """1-D mesh over every chip in the job (all hosts)."""
    from .psort import make_sort_mesh
    return make_sort_mesh(jax.devices())


def local_sort_mesh():
    """1-D mesh over this host's chips only (single-host runs/tests)."""
    from .psort import make_sort_mesh
    return make_sort_mesh(jax.local_devices())
