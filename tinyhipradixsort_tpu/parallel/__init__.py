"""Multi-chip / multi-host distributed sort (shard_map + XLA collectives).

The reference is single-GPU (SURVEY.md §2: no distributed anything); this
subpackage is the new design territory: a splitter-based distributed stable
sort over a 1-D `jax.sharding.Mesh`, per SURVEY.md §7.5.
"""

from . import multihost
from .psort import make_sort_mesh, psort_indices, psort_keys, psort_pairs

__all__ = ["make_sort_mesh", "multihost", "psort_keys", "psort_pairs",
           "psort_indices"]
