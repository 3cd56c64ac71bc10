"""Parity tests: native C++ runtime core vs the Python fallbacks.

Covers the components the reference implements in C++ (allocator pooling,
iterator planning, dtype promotion, tape scheduling) so both engines are
pinned to the same behavior.
"""

import ctypes

import pytest

from kfunca_tpu.core.dtype import ScalarType, accumulate_type, promote
from kfunca_tpu.core.iterator import broadcast_shapes
from kfunca_tpu.runtime import _native

lib = _native.get_lib()

pytestmark = pytest.mark.skipif(lib is None, reason="native core unavailable")


class TestPromotion:
    def test_promote_parity_all_pairs(self):
        types = [t for t in ScalarType if t != ScalarType.Undefined]
        for a in types:
            for b in types:
                assert lib.kf_promote(a, b) == promote(a, b), (a, b)

    def test_accumulate_parity(self):
        for t in ScalarType:
            if t == ScalarType.Undefined:
                continue
            assert lib.kf_accumulate_type(t) == accumulate_type(t), t


class TestBroadcast:
    @pytest.mark.parametrize(
        "shapes",
        [
            [(16, 1), (1, 6)],
            [(162, 1, 345), (162, 6, 1)],
            [(5, 7, 11), (5, 1, 11)],
            [(3,), (2, 1, 3)],
            [(1,), (1,)],
        ],
    )
    def test_parity(self, shapes):
        ndims = _native.i64_array([len(s) for s in shapes])
        flat = _native.i64_array([d for s in shapes for d in s])
        out_ndim = ctypes.c_int64()
        out_shape = _native.i64_array([0] * 12)
        rc = lib.kf_broadcast_shapes(
            len(shapes), ndims, flat, ctypes.byref(out_ndim), out_shape
        )
        assert rc == 0
        got = tuple(out_shape[i] for i in range(out_ndim.value))
        assert got == broadcast_shapes(*shapes)

    def test_mismatch_rejected(self):
        shapes = [(3, 4), (2, 4)]
        ndims = _native.i64_array([2, 2])
        flat = _native.i64_array([3, 4, 2, 4])
        out_ndim = ctypes.c_int64()
        out_shape = _native.i64_array([0] * 12)
        assert (
            lib.kf_broadcast_shapes(2, ndims, flat, ctypes.byref(out_ndim), out_shape)
            == -1
        )


def plan_nest(shape, strides_per_op):
    n = len(strides_per_op)
    nd = len(shape)
    out_shape = _native.i64_array([0] * max(nd, 1))
    out_strides = _native.i64_array([0] * max(nd * n, 1))
    out_perm = _native.i64_array([0] * max(nd, 1))
    out_gsize = _native.i64_array([0] * max(nd, 1))
    rc = lib.kf_plan_loop_nest(
        n,
        nd,
        _native.i64_array(shape),
        _native.i64_array([s for ss in strides_per_op for s in ss]),
        out_shape,
        out_strides,
        out_perm,
        out_gsize,
    )
    assert rc >= 0
    cshape = [out_shape[i] for i in range(rc)]
    cstrides = [[out_strides[t * rc + i] for i in range(rc)] for t in range(n)]
    perm = [out_perm[i] for i in range(nd)]
    gsize = [out_gsize[i] for i in range(rc)]
    assert sum(gsize) == nd
    return cshape, cstrides, perm, gsize


class TestLoopNestPlanner:
    def test_contiguous_collapses_to_1d(self):
        """Fully contiguous operands coalesce to a single flat loop
        (reference coalesce_dimensions, tensor_iterator.cpp:263-307)."""
        shape = [4, 5, 6]
        s = [30, 6, 1]
        cshape, cstrides, _perm, _gsize = plan_nest(shape, [s, s])
        assert cshape == [120]
        assert cstrides == [[1], [1]]

    def test_broadcast_dim_not_merged(self):
        # b broadcasts over dim 1 (stride 0): dims cannot fully collapse
        shape = [4, 5, 6]
        a = [30, 6, 1]
        b = [6, 0, 1]
        cshape, cstrides, _perm, _gsize = plan_nest(shape, [a, b])
        # dim1+dim2 can't merge for b (0*6 != 6); dim0 can't merge w/ dim1
        assert len(cshape) > 1
        # extent product preserved
        import math

        assert math.prod(cshape) == 120

    def test_permuted_reordered(self):
        """Stride-sorted reordering puts the smallest stride innermost
        (reference reorder_dimensions, tensor_iterator.cpp:181-244)."""
        shape = [6, 4]  # transposed view of contiguous (4,6)
        a = [1, 6]
        cshape, cstrides, _perm, _gsize = plan_nest(shape, [a])
        # after reorder: shape (4,6) strides (6,1) -> coalesces to 24/1
        assert cshape == [24]
        assert cstrides == [[1]]

    def test_size1_dims_dropped(self):
        shape = [1, 5, 1, 7]
        a = [35, 7, 7, 1]
        cshape, cstrides, _perm, _gsize = plan_nest(shape, [a])
        assert cshape == [35]
        assert cstrides == [[1]]


class TestTapeSchedule:
    def test_reference_dag(self):
        """The add-DAG of reference test_tensor.py:286-309:
        accba(0) -> accb(1) -> {ca(2), ab(3)}; interior nodes only."""
        src = _native.i64_array([0, 1, 1])
        dst = _native.i64_array([1, 2, 3])
        out = _native.i64_array([0] * 4)
        n = lib.kf_tape_schedule(4, 3, src, dst, 0, out)
        assert n == 4
        order = [out[i] for i in range(n)]
        assert order[0] == 0 and order[1] == 1
        assert set(order[2:]) == {2, 3}

    def test_multi_use_released_last(self):
        """A node consumed twice runs only after both consumers."""
        src = _native.i64_array([0, 0, 1, 2])
        dst = _native.i64_array([1, 2, 3, 3])
        out = _native.i64_array([0] * 4)
        n = lib.kf_tape_schedule(4, 4, src, dst, 0, out)
        order = [out[i] for i in range(n)]
        assert order.index(3) > order.index(1)
        assert order.index(3) > order.index(2)


class TestNativeAllocator:
    def test_pool_roundtrip(self):
        size = ctypes.c_int64()
        reused = ctypes.c_int()
        b1 = lib.kf_allocate(3, 5000, ctypes.byref(size), ctypes.byref(reused))
        assert size.value == 5120 and reused.value == 0  # 1KB aligned
        assert lib.kf_free(b1) == 0
        assert lib.kf_free(b1) == -1  # double free rejected
        b2 = lib.kf_allocate(3, 4500, ctypes.byref(size), ctypes.byref(reused))
        assert b2 == b1 and reused.value == 1
        lib.kf_free(b2)

    def test_pool_stats_surface(self):
        """kf_alloc_devices / kf_alloc_pool_stats report parked blocks per
        (device, size-class) pool — the native analog of the Python
        fallback's per-pool breakdown."""
        size = ctypes.c_int64()
        reused = ctypes.c_int()
        dev = 7  # fresh device id for isolation
        b1 = lib.kf_allocate(dev, 5000, ctypes.byref(size), ctypes.byref(reused))
        b2 = lib.kf_allocate(dev, 300_000, ctypes.byref(size), ctypes.byref(reused))
        lib.kf_free(b1)
        lib.kf_free(b2)
        devs = (ctypes.c_int32 * 64)()
        n = lib.kf_alloc_devices(devs, 64)
        assert dev in [devs[i] for i in range(min(n, 64))]
        out = (ctypes.c_int64 * 16)()
        lib.kf_alloc_pool_stats(dev, out)
        # 5000 -> 5120 parked in pool 1 (<=64K); 300000 -> pool 3 (<=1M)
        assert out[2 * 1] >= 1 and out[2 * 1 + 1] >= 5120
        assert out[2 * 3] >= 1 and out[2 * 3 + 1] >= 300_000
        # and the ctypes-level DeviceAllocator stats() surfaces them
        from kfunca_tpu.runtime.allocator import DeviceAllocator

        alloc = DeviceAllocator.instance()
        if alloc._lib is not None:
            s = alloc.stats()
            assert s.get("native") and dev in s["pools"]
            pool1 = s["pools"][dev][1]
            assert pool1["blocks"] >= 1 and pool1["bytes"] >= 5120


import numpy as np


class TestLiveTables:
    def test_native_matches_python_fallback(self):
        """kf_{fwd,bwd}_live_tables must reproduce the Python reference
        enumeration for square, rectangular, and ragged-clamped shapes."""
        import os
        from unittest import mock

        from kfunca_tpu.ops.pallas_kernels import flash_attention as fa
        from kfunca_tpu.runtime._native import get_lib

        if get_lib() is None:
            import pytest

            pytest.skip("native core unavailable")

        cases = [(4, 4, 512, 512), (2, 4, 1024, 512), (4, 2, 512, 1024),
                 (1, 2, 128, 128), (16, 16, 128, 128)]
        for nqb, nkb, bq, bk in cases:
            nat_f = fa._tables_native("fwd", nqb, nkb, bq, bk)
            nat_b = fa._tables_native("bwd", nqb, nkb, bq, bk)
            with mock.patch.object(fa, "_tables_native", lambda *a: None):
                py_f = fa._fwd_tables(nqb, nkb, bq, bk)
                py_b = fa._bwd_tables(nqb, nkb, bq, bk)
            for got, want in zip(nat_f, py_f):
                assert np.array_equal(got, want), (nqb, nkb, bq, bk, "fwd")
            for got, want in zip(nat_b, py_b):
                assert np.array_equal(got, want), (nqb, nkb, bq, bk, "bwd")


class TestPrefixCacheIndex:
    """Native kf_pcache_*: the serving prefix-cache LRU hash index."""

    def test_put_get_erase(self):
        h = lib.kf_pcache_create()
        try:
            assert lib.kf_pcache_get(h, 1, 2) == -1
            assert lib.kf_pcache_put(h, 1, 2, 7) == 1
            assert lib.kf_pcache_put(h, 1, 2, 99) == 0  # setdefault semantics
            assert lib.kf_pcache_get(h, 1, 2) == 7
            assert lib.kf_pcache_size(h) == 1
            assert lib.kf_pcache_erase(h, 1, 2) == 7
            assert lib.kf_pcache_erase(h, 1, 2) == -1
            assert lib.kf_pcache_size(h) == 0
        finally:
            lib.kf_pcache_destroy(h)

    def test_lru_order_and_touch(self):
        import ctypes

        h = lib.kf_pcache_create()
        try:
            for i in range(4):
                lib.kf_pcache_put(h, i, i, 10 + i)
            assert lib.kf_pcache_touch(h, 0, 0) == 10  # 0 becomes newest
            ab = (ctypes.c_uint64 * 8)()
            pages = (ctypes.c_int64 * 4)()
            n = lib.kf_pcache_lru(h, ab, pages, 4)
            assert n == 4
            assert [pages[i] for i in range(4)] == [11, 12, 13, 10]
            # erase the middle, order is preserved and node slot recycled
            lib.kf_pcache_erase(h, 2, 2)
            lib.kf_pcache_put(h, 9, 9, 19)
            n = lib.kf_pcache_lru(h, ab, pages, 4)
            assert [pages[i] for i in range(n)] == [11, 13, 10, 19]
        finally:
            lib.kf_pcache_destroy(h)

    def test_hash_chain_prefix_property(self):
        """Changing a token in page i changes hashes for pages >= i only,
        and the chain commits to the seed (adapter id)."""
        import ctypes

        def chain(toks, ps, seed):
            toks = np.ascontiguousarray(toks, np.int32)
            n = len(toks) // ps
            out = (ctypes.c_uint64 * (2 * n))()
            got = lib.kf_pcache_hash_chain(
                toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(toks), ps, seed, out)
            assert got == n
            return [(out[2 * i], out[2 * i + 1]) for i in range(n)]

        base = np.arange(32, dtype=np.int32)
        a = chain(base, 8, 0)
        assert len(a) == 4 and len(set(a)) == 4
        assert chain(base, 8, 0) == a           # deterministic
        assert chain(base, 8, 1) != a           # seed-sensitive (every page)
        mutated = base.copy()
        mutated[17] = -1                        # inside page 2
        b = chain(mutated, 8, 0)
        assert b[:2] == a[:2] and b[2] != a[2] and b[3] != a[3]
        # partial tail page is not hashed
        assert len(chain(base[:31], 8, 0)) == 3

    def test_prefix_index_wrapper_parity(self):
        """models.serve.PrefixIndex: native and fallback agree on the
        observable contract (LRU order, setdefault put, touch, erase)."""
        import os
        from unittest import mock

        from kfunca_tpu.models import serve as sv

        def exercise(idx):
            keys = idx.hash_chain(np.arange(24, dtype=np.int32), 8, 0)
            assert len(keys) == 3
            out = []
            for i, k in enumerate(keys):
                assert idx.put(k, 100 + i)
            assert not idx.put(keys[0], 555)
            assert idx.get(keys[0]) == 100
            idx.touch(keys[0])
            out.append([p for _, p in idx.lru_items()])
            assert idx.erase(keys[1]) == 101
            assert idx.erase(keys[1]) is None
            assert keys[1] not in idx and keys[0] in idx
            out.append(len(idx))
            return out

        native = exercise(sv.PrefixIndex())
        with mock.patch.object(sv._native, "get_lib", lambda: None):
            fallback = exercise(sv.PrefixIndex())
        assert native == fallback == [[101, 102, 100], 2]
