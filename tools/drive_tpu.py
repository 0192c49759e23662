"""End-to-end TPU drive: real-chip pallas engine vs numpy oracles."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import tinyhipradixsort_tpu as thrs

assert jax.devices()[0].platform == "tpu", jax.devices()
rng = np.random.default_rng(7)

def oracle_perm(x, descending=False, start=0, end=None):
    bits = thrs.np_key_bits(x, descending=descending)
    nb = bits.dtype.itemsize * 8
    end = nb if end is None else end
    if (start, end) != (0, nb):
        u = bits.dtype.type
        bits = (bits >> u(start)) & u((1 << (end - start)) - 1)
    return np.argsort(bits, kind="stable")

fails = 0
def check(name, got, want, view=None):
    global fails
    g, w = np.asarray(got), np.asarray(want)
    if view is not None:
        g, w = g.view(view), w.view(view)
    if not np.array_equal(g, w):
        print("FAIL:", name); fails += 1
    else:
        print("ok:", name)

# keys: u32 / i32 / f32 / u64, asc+desc, odd sizes
for dt in (np.uint32, np.int32, np.float32, np.uint64, np.int64):
    for n in (1, 2, 1000, 100003):
        dt_ = np.dtype(dt)
        if dt_.kind == "f":
            x = rng.standard_normal(n).astype(dt_)
            x[rng.random(n) < 0.05] = -0.0
            x[rng.random(n) < 0.02] = np.inf
            x[rng.random(n) < 0.02] = -np.inf
            x[rng.random(n) < 0.02] = np.nan
            x[rng.random(n) < 0.02] = -np.nan
            x[rng.random(n) < 0.02] = 1e-40  # denormal
        else:
            info = np.iinfo(dt_)
            x = rng.integers(info.min, info.max, size=n, dtype=dt_, endpoint=True)
        for order in ("ascending", "descending"):
            got = thrs.sort_keys(jnp.asarray(x), order=order, method="pallas")
            want = x[oracle_perm(x, order == "descending")]
            check(f"keys {dt_.name} {order} n={n}", got, want,
                  np.uint32 if dt_.itemsize == 4 else np.uint64)

# pairs stability with sequential payload + duplicates
n = 200001
x = (rng.integers(0, 512, size=n)).astype(np.uint32)
v = np.arange(n, dtype=np.uint32)
k2, v2 = thrs.sort_pairs(jnp.asarray(x), jnp.asarray(v), method="pallas")
p = oracle_perm(x)
check("pairs stability", v2, v[p])
check("pairs keys", k2, x[p])

# descending pairs stability
k3, v3 = thrs.sort_pairs(jnp.asarray(x), jnp.asarray(v), order="descending", method="pallas")
p3 = oracle_perm(x, descending=True)
check("pairs desc stability", v3, v[p3])

# bit windows (StartBits contract, reference unittest.cpp:248-355)
x64 = rng.integers(0, 2**64, size=50000, dtype=np.uint64)
v64 = np.arange(50000, dtype=np.uint64)
for sb in (0, 8, 24, 56):
    k4, v4 = thrs.sort_pairs(jnp.asarray(x64), jnp.asarray(v64),
                             start_bit=sb, end_bit=sb + 8, method="pallas")
    p4 = oracle_perm(x64, start=sb, end=sb + 8)
    check(f"window u64 [{sb},{sb+8})", v4, v64[p4])

# extreme case: all zeros + sentinels
x = np.zeros(100000, dtype=np.uint32); x[7] = 0xFFFFFFFF; x[77777] = 1
check("extreme", thrs.sort_keys(jnp.asarray(x), method="pallas"), np.sort(x))

# sort_indices
x = rng.integers(0, 100, size=65537, dtype=np.uint32)
check("indices", thrs.sort_indices(jnp.asarray(x), method="pallas"),
      np.argsort(x, kind="stable"))

# u128 payload (reference K64V128, unittest.cpp:471-487)
n = 30000
x = rng.integers(0, 2**64, size=n, dtype=np.uint64)
v128 = rng.integers(0, 2**32, size=(n, 4), dtype=np.uint32)
k5, v5 = thrs.sort_pairs(jnp.asarray(x), jnp.asarray(v128), method="pallas")
p5 = oracle_perm(x)
check("u128 payload", v5, v128[p5])

# 16-bit keys: integers sort on device; f16/bf16 raise (NaN payloads
# canonicalize on TPU converts) and go through the exact host bit adapters
import ml_dtypes
raw16 = rng.integers(0, 2**16, size=100000, dtype=np.uint16)
for dt16 in (np.uint16, np.int16):
    x16 = raw16.view(dt16)
    got16 = np.asarray(thrs.sort_keys(jnp.asarray(x16), method="pallas"))
    p16 = np.argsort(thrs.np_key_bits(x16), kind="stable")
    check(f"keys {np.dtype(dt16).name} 16-bit", got16.view(np.uint16),
          x16[p16].view(np.uint16))
for fdt in (np.float16, ml_dtypes.bfloat16):
    xf = raw16.view(fdt)
    try:
        thrs.sort_keys(jnp.asarray(xf))
        print(f"FAIL: {np.dtype(fdt).name} keys did not raise on TPU"); fails += 1
    except TypeError:
        print(f"ok: {np.dtype(fdt).name} raises on TPU (host adapter contract)")
    # the adapter path: host bits -> device u32 sort -> host inverse
    bits16 = thrs.np_key_bits(xf)
    sorted_bits = np.asarray(thrs.sort_keys(jnp.asarray(bits16), method="pallas"))
    back = thrs.np_key_bits_inverse(sorted_bits, fdt)
    p16 = np.argsort(bits16, kind="stable")
    want16 = xf[p16].view(np.uint16).copy()
    want16[want16 == 0x8000] = 0  # adapter normalizes -0.0 (documented)
    check(f"{np.dtype(fdt).name} host-adapter sort", back.view(np.uint16), want16)

# batched rows (2-D keys: independent row sorts)
xb = rng.integers(0, 2**32, size=(64, 5000), dtype=np.uint32)
check("batched keys", thrs.sort_keys(jnp.asarray(xb), method="pallas"),
      np.sort(xb, axis=1))
vb = np.broadcast_to(np.arange(5000, dtype=np.uint32), (64, 5000)).copy()
xbd = (xb % 11).astype(np.uint32)
kb, vbo = thrs.sort_pairs(jnp.asarray(xbd), jnp.asarray(vb), method="pallas")
pb = np.argsort(xbd, axis=1, kind="stable")
check("batched pairs stability", vbo, np.take_along_axis(vb, pb, 1))

# segmented sort (order by (segment, key), stable)
n = 100000
xs = rng.integers(0, 2**32, size=n, dtype=np.uint32)
seg = np.sort(rng.integers(0, 37, size=n).astype(np.int32))
ks = thrs.sort_keys(jnp.asarray(xs), segment_ids=jnp.asarray(seg),
                    method="pallas")
check("segmented keys", ks, xs[np.lexsort((xs, seg))])

# error paths
for bad in (lambda: thrs.sort_keys(jnp.zeros((2, 3, 4), jnp.uint32)),
            lambda: thrs.sort_keys(jnp.zeros(4, jnp.uint32), method="bogus"),
            lambda: thrs.sort_keys(jnp.zeros(4, jnp.uint32), start_bit=9, end_bit=3)):
    try:
        bad(); print("FAIL: error path did not raise"); fails += 1
    except (ValueError, TypeError):
        print("ok: error path raised")

print("FAILURES:", fails)
sys.exit(1 if fails else 0)
