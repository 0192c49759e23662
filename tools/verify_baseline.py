"""On-chip verification of the BASELINE.json bit-exactness workloads:
1M u32 keys-only; 16M u32+u32 KV; 16M f32 (incl negatives/-0.0);
256M u64 + 64-bit payload (falls back to 128M if HBM-bound)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import tinyhipradixsort_tpu as thrs
from tinyhipradixsort_tpu.utils import native_oracle

rng = np.random.default_rng(9)

def perm_oracle(keys):
    return np.argsort(thrs.np_key_bits(keys), kind="stable")

# 1M u32 keys-only
x = rng.integers(0, 2**32, size=1 << 20, dtype=np.uint32)
got = np.asarray(thrs.sort_keys(jnp.asarray(x), method="pallas"))
assert np.array_equal(got, np.sort(x)); print("1M u32 keys: bit-exact")

# 16M u32+u32 KV (sequential payload = stability probe)
n = 1 << 24
x = rng.integers(0, 2**16, size=n, dtype=np.uint32)  # duplicates galore
v = np.arange(n, dtype=np.uint32)
k2, v2 = thrs.sort_pairs(jnp.asarray(x), jnp.asarray(v), method="pallas")
p = perm_oracle(x)
assert np.array_equal(np.asarray(k2), x[p])
assert np.array_equal(np.asarray(v2), v[p]); print("16M u32+u32 KV: bit-exact + stable")

# 16M f32 incl negatives, -0.0, NaN
x = rng.standard_normal(n).astype(np.float32)
x[rng.random(n) < 0.01] = -0.0
x[rng.random(n) < 0.005] = np.nan
got = np.asarray(thrs.sort_keys(jnp.asarray(x), method="pallas"))
p = perm_oracle(x)
assert np.array_equal(got.view(np.uint32), x[p].view(np.uint32))
print("16M f32: bit-exact incl -0.0/NaN")

# u64 + u64 payload, largest that fits
for nl in (1 << 28, 1 << 27):
    try:
        xk = rng.integers(0, 2**64, size=nl, dtype=np.uint64)
        xv = rng.integers(0, 2**64, size=nl, dtype=np.uint64)
        k3, v3 = thrs.sort_pairs(jnp.asarray(xk), jnp.asarray(xv), method="pallas")
        k3 = np.asarray(k3); v3 = np.asarray(v3)
        # verify with the native oracle (numpy argsort of 256M u64 is slow)
        _, p3 = native_oracle.native_sort_bits(xk, with_perm=True)
        p3 = p3.astype(np.int64)
        assert np.array_equal(k3, xk[p3]) and np.array_equal(v3, xv[p3])
        print(f"{nl>>20}M u64+u64 KV: bit-exact + stable")
        break
    except Exception as e:  # noqa: BLE001
        print(f"n={nl}: {type(e).__name__}: {str(e)[:120]}")
print("BASELINE configs verified")
