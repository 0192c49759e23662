"""Host-side engine internals: planner, bit rotation, word codecs, search."""

import numpy as np
import jax.numpy as jnp
import pytest

from tinyhipradixsort_tpu.ops import bitonic_engine as be
from tinyhipradixsort_tpu.parallel import psort

RNG = np.random.default_rng(0x1E57)


def test_word_contract_checker():
    ok_no_carry = be.check_word_contract([jnp.zeros(8, jnp.uint32)], [])
    assert bool(ok_no_carry)
    # duplicate cmp tuples + carry -> unsafe
    cmp = [jnp.asarray(np.array([1, 2, 2, 3], np.uint32)),
           jnp.asarray(np.array([0, 5, 5, 0], np.uint32))]
    carry = [jnp.arange(4, dtype=jnp.uint32)]
    assert not bool(be.check_word_contract(cmp, carry))
    # same cmp made distinct by an index word -> safe
    assert bool(be.check_word_contract(cmp + [jnp.arange(4, dtype=jnp.uint32)],
                                       carry))


@pytest.mark.parametrize("L,tile,chunk,rot,gx", [
    (10, 18, 13, 0, None), (13, 18, 13, 10, None), (20, 18, 13, 10, None),
    (26, 18, 13, 10, None), (15, 14, 11, 10, None),
    (28, 18, 13, 10, 8), (26, 18, 13, 10, 8), (20, 10, 9, 0, 8),
])
def test_plan_covers_relabeled_network(L, tile, chunk, rot, gx):
    T = min(tile, L)
    sig = lambda x: (x + rot) % T if x < T else x
    sweeps = be.plan_sweeps(L, tile, chunk, rot, g_max_cross=gx)
    subs = [s for sw in sweeps for s in sw.substages]
    expect = [(sig(k), sig(j))
              for k in range(1, L + 1) for j in range(k - 1, -1, -1)]
    assert subs == expect
    for sw in sweeps:
        A, B = sw.grid()
        assert A * B * sw.tile_elems == 1 << L
        assert sw.tile_elems <= 1 << tile
        for k, j in sw.substages:
            assert sw.has_bit(j)
            sw.dir_spec(k)  # must not raise


def test_wide_cross_sweep_executes():
    """Execute a g > 5 cross sweep (interpret mode) against a numpy
    compare-exchange oracle — the CROSS_G_MAX window shape that only
    appears on-device at L > tile_bits + 5."""
    L, c, g, j_lo = 20, 12, 6, 13
    subs = tuple([(L, j) for j in range(j_lo + g - 1, j_lo - 1, -1)]
                 + [(14, 13)])  # k from 'a'-grid bits and from a tile bit
    sw = be.Sweep(c=c, g=g, j_lo=j_lo, L=L, substages=subs)
    n = 1 << L
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    out = be.run_sweep([jnp.asarray(x)], sw, 1, interpret=True)[0]
    ref = x.copy()
    i = np.arange(n)
    for k, j in subs:
        pv = ref[i ^ (1 << j)]
        hbit = (i >> j) & 1
        desc = (i >> k) & 1
        keep_min = (1 - hbit) ^ desc
        swap = (pv < ref) == (keep_min == 1)
        ref = np.where(swap, pv, ref)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("logn,wide", [(19, True), (20, True), (20, False)])
def test_large_merge_rot_fusion(logn, wide):
    """Regression (r3 review): when a sub-network's FIRST sweep is a cross
    sweep (merges of runs > tile), the storage-rotation transpose must NOT
    be fused into it — the old guard (c + g == T) matched cross sweeps
    under wide chunks (and g=5 ones under narrow), silently corrupting
    every merge > 2**18 (wide) / >= 2**23 (narrow, psort shards)."""
    n = 1 << logn
    a = np.sort(RNG.integers(0, 2**32, n // 2, dtype=np.uint32))
    d = np.sort(RNG.integers(0, 2**32, n // 2, dtype=np.uint32))[::-1]
    row = jnp.asarray(np.concatenate([a, d]))
    t = be.EngineTuning(cross_chunk_wide=wide)
    out = np.asarray(be.merge_words_rows([row], [], (1, n), interpret=True,
                                         tuning=t)[0][0]).reshape(-1)
    np.testing.assert_array_equal(out, np.sort(np.concatenate([a, d])))


def test_segmented_large_merge():
    """Non-pow2 n whose segmented path merges > 2**18 elements end to end
    (the public-API route to the rot-fusion regression above)."""
    n = 600_000  # 2**19 prefix + 87_712 remainder -> merge over ~2**20
    x = RNG.integers(0, 2**32, n, dtype=np.uint32)
    out = np.asarray(be.sort_words([jnp.asarray(x)], [], interpret=True)[0][0])
    np.testing.assert_array_equal(out, np.sort(x))


def test_cross_g_max_lowering_takes_effect():
    """The override REPLACES the default width, so lowering it for an A/B
    run actually narrows cross sweeps (ADVICE r2: the old max() clamp made
    values below tile_bits - chunk_bits silently do nothing)."""
    wide = be.plan_sweeps(24, 18, 13, 0, g_max_cross=8)
    narrow = be.plan_sweeps(24, 18, 13, 0, g_max_cross=2)
    # cross sweeps are the ones whose group sits above the tile (j_lo >= 18;
    # since r3 wide chunks they use c + g == tile_bits just like locals)
    gmax = lambda sweeps: max(s.g for s in sweeps if s.j_lo >= 18)
    assert gmax(wide) > gmax(narrow) == 2
    # both still cover the full network
    for sweeps in (wide, narrow):
        subs = [s for sw in sweeps for s in sw.substages]
        assert subs == [(k, j) for k in range(1, 25)
                        for j in range(k - 1, -1, -1)]


def test_engine_tuning_env_roundtrip(monkeypatch):
    """EngineTuning.from_env() reads the knobs at call time and is hashable
    (it keys the jit caches: changing an env var mid-process takes effect
    on the next public-API call instead of silently reusing a stale plan)."""
    base = be.EngineTuning.from_env()
    monkeypatch.setenv("THRS_CROSS_G_MAX", "3")
    monkeypatch.setenv("THRS_MAX_SUBSTAGES", "40")
    monkeypatch.setenv("THRS_TILE_BITS_CAP", "14")
    tuned = be.EngineTuning.from_env()
    assert tuned == be.EngineTuning(max_substages=40, cross_g_max=3,
                                    tile_bits_cap=14)
    assert hash(tuned) != hash(base) or tuned == base
    # the tuned plan really is different AND still sorts correctly
    x = RNG.integers(0, 2**32, size=4096, dtype=np.uint32)
    cw, _ = be.sort_words([jnp.asarray(x)], [], interpret=True, tuning=tuned)
    np.testing.assert_array_equal(np.asarray(cw[0]), np.sort(x))
    assert be._tile_bits_for(1, 20, tuned) == 14
    assert be._tile_bits_for(1, 20, base) == base.tile_bits_cap


def test_split_sweep_preserves_order():
    sw = be.plan_sweeps(20, 18, 13, 10)[0]
    parts = be._split_sweep(sw, 40)
    assert all(len(p.substages) <= 40 for p in parts)
    joined = [s for p in parts for s in p.substages]
    assert joined == list(sw.substages)


@pytest.mark.parametrize("T,rot", [(13, 10), (18, 10), (12, 5)])
def test_rotate_storage_is_bit_rotation(T, rot):
    n = 1 << T
    f = np.arange(n, dtype=np.uint32)
    s = np.asarray(be._rotate_storage(jnp.asarray(f), T, -rot))
    # element f lands at position rotl(f, rot): s[rotl(f)] == f
    rotl = ((f << rot) | (f >> (T - rot))) & (n - 1)
    assert np.array_equal(s[rotl], f)
    back = np.asarray(be._rotate_storage(
        be._rotate_storage(jnp.asarray(f), T, -rot), T, rot))
    assert np.array_equal(back, f)


@pytest.mark.parametrize("dtype,shape", [
    (np.uint32, (100,)), (np.float32, (100,)), (np.int32, (100,)),
    (np.uint64, (100,)), (np.int64, (100,)), (np.float64, (100,)),
    (np.uint8, (100,)), (np.uint16, (100,)), (np.uint32, (100, 4)),
])
def test_word_codec_roundtrip(dtype, shape):
    dt = np.dtype(dtype)
    if dt.kind == "f":
        a = RNG.standard_normal(shape).astype(dt)
    else:
        a = RNG.integers(0, np.iinfo(dt).max, size=shape, dtype=dt,
                         endpoint=True)
    words, recipe = be.array_to_words(jnp.asarray(a))
    recipe["nwords"] = len(words)
    back = np.asarray(be.words_to_array(words, recipe))
    view = {4: np.uint32, 8: np.uint64, 1: np.uint8, 2: np.uint16}[dt.itemsize]
    np.testing.assert_array_equal(back.view(view), a.view(view))


def test_searchsorted_words_matches_numpy():
    n, q = 5000, 257
    hi = RNG.integers(0, 8, size=n, dtype=np.uint32)  # many ties in hi word
    lo = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    qh = RNG.integers(0, 8, size=q, dtype=np.uint32)
    ql = RNG.integers(0, 2**32, size=q, dtype=np.uint32)
    got = np.asarray(psort._searchsorted_words(
        [jnp.asarray(hi), jnp.asarray(lo)], [jnp.asarray(qh), jnp.asarray(ql)]))
    packed = (hi.astype(np.uint64) << 32) | lo
    qpacked = (qh.astype(np.uint64) << 32) | ql
    want = np.searchsorted(packed, qpacked, side="left")
    np.testing.assert_array_equal(got, want)


def test_fuse_pair2_matches_default():
    """The fused two-bit pair-split CE (EngineTuning.fuse_pair2, the r4
    substage-reduction A/B) is bit-identical to the default network:
    keys-only, multi-word lex, and stable carries all agree. n = 2**14
    with tile rot=10 gives several adjacent pair-form substages per stage
    (fb >= LANE_BITS+3), so the fused path genuinely executes."""
    n = 1 << 14
    on = be.EngineTuning(fuse_pair2=True)
    # keys-only single word (min/max CE form)
    x = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    cw, _ = be.sort_words([jnp.asarray(x)], [], interpret=True, tuning=on)
    np.testing.assert_array_equal(np.asarray(cw[0]), np.sort(x))
    # dense duplicates + index word + carry (lex form, stability contract)
    k = RNG.integers(0, 16, size=n, dtype=np.uint32)
    idx = np.arange(n, dtype=np.uint32)
    pay = RNG.integers(0, 2**32, size=n, dtype=np.uint32)
    cw, carry = be.sort_words([jnp.asarray(k), jnp.asarray(idx)],
                              [jnp.asarray(pay)], interpret=True, tuning=on)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(cw[0]), k[order])
    np.testing.assert_array_equal(np.asarray(cw[1]), idx[order])
    np.testing.assert_array_equal(np.asarray(carry[0]), pay[order])


@pytest.mark.parametrize("a,b", [
    (1024, 1), (1024, 513), (1024, 1024),     # truncated path, one level
    (2048, 700), (4096, 1000), (4096, 4095),  # multi-level upper chains
    (1536, 100), (1024, 1500), (512, 100),    # padded-fallback shapes
])
def test_merge_sorted_runs_truncated(a, b):
    """The truncated (virtual-sentinel) merge is exact against a stable
    lexsort oracle for pow2/non-pow2 run-length combinations, including
    carries and multi-word cmp tuples (round 5, ROADMAP item 1 tail)."""
    ka = np.sort(RNG.integers(0, 2**8, a, dtype=np.uint32))  # dense ties
    ia = np.arange(a, dtype=np.uint32)  # (ka, ia) ascending-lex
    kb = RNG.integers(0, 2**8, b, dtype=np.uint32)
    ib = a + np.arange(b, dtype=np.uint32)
    rev = np.lexsort((ib, kb))[::-1]  # (kb, ib) descending-lex
    kb, ib = kb[rev].copy(), ib[rev].copy()
    pa, pb = ia * 7, ib * 7  # carry tied to the (distinct) cmp tuple
    out = be._merge_sorted_runs(
        [jnp.asarray(w) for w in (ka, ia, pa)],
        [jnp.asarray(w) for w in (kb, ib, pb)], 2, True, None)
    key = np.concatenate([ka, kb])
    idx = np.concatenate([ia, ib])
    pay = np.concatenate([pa, pb])
    order = np.lexsort((idx, key))
    np.testing.assert_array_equal(np.asarray(out[0]), key[order])
    np.testing.assert_array_equal(np.asarray(out[1]), idx[order])
    np.testing.assert_array_equal(np.asarray(out[2]), pay[order])


def test_merge_sorted_runs_keys_only_duplicates():
    """Keys-only (no carries): duplicate-heavy runs through the truncated
    merge — tie swaps are unobservable, output must equal np.sort."""
    a, b = 4096, 3000
    ka = np.sort(RNG.integers(0, 8, a, dtype=np.uint32))
    kb = np.sort(RNG.integers(0, 8, b, dtype=np.uint32))[::-1].copy()
    out = be._merge_sorted_runs([jnp.asarray(ka)], [jnp.asarray(kb)],
                                1, True, None)
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  np.sort(np.concatenate([ka, kb])))


def test_seg_pad_waste_threshold_takes_effect():
    """seg_pad_waste=0.0 routes every non-pow2 n through the segmented
    path; result must stay exact at a size the default would pad."""
    n = (1 << 13) - 100  # waste ~1.2%: padded under the default
    x = RNG.integers(0, 2**32, n, dtype=np.uint32)
    tuned = be.EngineTuning(seg_pad_waste=0.0)
    cw, _ = be.sort_words([jnp.asarray(x)], [], interpret=True, tuning=tuned)
    np.testing.assert_array_equal(np.asarray(cw[0]), np.sort(x))


def test_merge_sorted_runs_chain_with_carries():
    """a = 2**17 exercises the truncated merge's dense CE levels and
    sentinel bookkeeping above the small-tail materialization cap (2**16),
    with an index word + carry through every level."""
    a, b = 1 << 17, 90_000
    ka = np.sort(RNG.integers(0, 2**16, a, dtype=np.uint32))
    ia = np.arange(a, dtype=np.uint32)
    kb = RNG.integers(0, 2**16, b, dtype=np.uint32)
    ib = a + np.arange(b, dtype=np.uint32)
    rev = np.lexsort((ib, kb))[::-1]
    kb, ib = kb[rev].copy(), ib[rev].copy()
    pa, pb = ia * 3, ib * 3
    out = be._merge_sorted_runs(
        [jnp.asarray(w) for w in (ka, ia, pa)],
        [jnp.asarray(w) for w in (kb, ib, pb)], 2, True, None)
    key = np.concatenate([ka, kb])
    idx = np.concatenate([ia, ib])
    order = np.lexsort((idx, key))
    np.testing.assert_array_equal(np.asarray(out[0]), key[order])
    np.testing.assert_array_equal(np.asarray(out[1]), idx[order])
    np.testing.assert_array_equal(np.asarray(out[2]),
                                  np.concatenate([pa, pb])[order])


@pytest.mark.parametrize("B,nr", [
    (8, 1040),   # pow2+16: deep bookkeeping chain, one tiny piece merge
    (4, 1500),   # multi-level upper chain
    (16, 33),    # just above the routing floor
    (5, 2000),   # b close to a
    (1, 700),    # single row through the row path
])
def test_sort_segmented_rows_stable(B, nr):
    """Row-segmented non-pow2 sort (round 5, ROADMAP item 11 tail) is
    exact against a per-row stable argsort oracle, with an index word and
    a carry through the truncated row merges."""
    k = RNG.integers(0, 2**8, (B, nr)).astype(np.uint32)  # dense ties
    idx = np.tile(np.arange(nr, dtype=np.uint32), (B, 1))
    pay = RNG.integers(0, 2**32, (B, nr)).astype(np.uint32)
    tuned = be.EngineTuning(row_seg_waste=0.0, row_seg_min_nr=0)
    cw, kw = be.sort_words_rows(
        [jnp.asarray(k.ravel()), jnp.asarray(idx.ravel())],
        [jnp.asarray(pay.ravel())], (B, nr), interpret=True, tuning=tuned)
    order = np.argsort(k, axis=1, kind="stable")
    np.testing.assert_array_equal(np.asarray(cw[0]).reshape(B, nr),
                                  np.take_along_axis(k, order, 1))
    np.testing.assert_array_equal(np.asarray(cw[1]).reshape(B, nr),
                                  order.astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(kw[0]).reshape(B, nr),
                                  np.take_along_axis(pay, order, 1))


def test_sort_segmented_rows_keys_only_duplicates():
    """Keys-only rows (no carries) through the row-segmented path:
    duplicate-heavy, tie swaps unobservable — must equal np.sort per row."""
    B, nr = 6, 1040
    k = RNG.integers(0, 8, (B, nr)).astype(np.uint32)
    tuned = be.EngineTuning(row_seg_waste=0.0, row_seg_min_nr=0)
    cw, _ = be.sort_words_rows([jnp.asarray(k.ravel())], [], (B, nr),
                               interpret=True, tuning=tuned)
    np.testing.assert_array_equal(np.asarray(cw[0]).reshape(B, nr),
                                  np.sort(k, axis=1))


def test_row_seg_waste_routing_default():
    """With the default row_seg_waste, a high-waste row length routes
    through the segmented path and a low-waste one pads — both exact."""
    for nr in (1090, 4000):  # waste 0.47 (segmented) / 0.023 (padded)
        B = 4
        k = RNG.integers(0, 2**32, (B, nr), dtype=np.uint32)
        cw, _ = be.sort_words_rows([jnp.asarray(k.ravel())], [], (B, nr),
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(cw[0]).reshape(B, nr),
                                      np.sort(k, axis=1))
