"""Test env: force CPU with 8 virtual devices (multi-chip sharding tests run on
a virtual mesh, per SURVEY.md §4).

Note: this environment may auto-register a TPU PJRT plugin and force
JAX_PLATFORMS via sitecustomize, so the env var alone is not enough —
``jax.config.update('jax_platforms', ...)`` after import wins.
"""

import os
import sys

# THRS_TEST_PLATFORM=tpu runs the suite on the real chip (the nightly
# full-density tier, see .claude/skills/verify/SKILL.md); default is the
# 8-virtual-device CPU mesh.
_TPU = os.environ.get("THRS_TEST_PLATFORM", "").lower() == "tpu"

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
if not _TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _TPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: cuts full-suite reruns from ~20 min of XLA
# compiles to seconds, and sidesteps an XLA-CPU compiler segfault observed
# on this image after a few hundred in-process compilations (the crash is
# positional, not program-specific: with a warm cache the run stays under
# the trigger count). Populate per-file (`pytest tests/test_X.py`) if a cold
# full run ever hits it.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("THRS_TEST_CACHE", "/tmp/thrs_test_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the reference-density randomized tier (nightly; "
             "reference bar: unittest.cpp TEST_ITERATION=128)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "full: reference-density randomized tier (needs --full)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full"):
        return
    skip = pytest.mark.skip(reason="full-density tier: pass --full")
    for item in items:
        if "full" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _drop_executables_between_modules():
    """Free loaded XLA executables after each test module.

    The XLA-CPU runtime on this image segfaults (in fresh compiles *and* in
    cache-deserialization alike) once a single process holds a few hundred
    loaded executables; dropping them per module stays far below the
    threshold, and the persistent compilation cache makes re-loads cheap.
    """
    yield
    jax.clear_caches()
