"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests run on
a virtual mesh, per SURVEY.md §4).

Note: this environment may auto-register a TPU PJRT plugin and force
JAX_PLATFORMS via sitecustomize, so the env var alone is not enough —
``jax.config.update('jax_platforms', ...)`` after import wins.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
