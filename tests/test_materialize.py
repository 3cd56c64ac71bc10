"""Layout-engine tests: strided-view reads/writes across all tiers.

The planner tier is the production wiring of the native loop-nest planner
(csrc kf_plan_loop_nest ≙ reference reorder_dimensions+coalesce_dimensions,
tensor_iterator.cpp:181-307): hostile layouts must read/write correctly
through the coalesced nest (strided slice / low-rank gather), matching a
numpy as_strided oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import kfunca_tpu as kfunca
from kfunca_tpu.core import materialize as mat


def np_view(buf_np, shape, strides, offset):
    return np.lib.stride_tricks.as_strided(
        buf_np[offset:], shape, [s * buf_np.itemsize for s in strides]
    ).copy()


CASES = [
    # (buf_len, shape, strides, offset, expected_tier)
    (64, (8, 8), (8, 1), 0, "whole"),  # contiguous whole
    (100, (4, 6), (6, 1), 10, "slice"),  # contiguous offset block
    (64, (8, 8), (1, 8), 0, "transpose"),  # permuted contiguous
    (64, (8,), (8,), 3, "planned-slice"),  # matrix column: rank-1 stride nest
    (64, (4, 4), (16, 2), 1, "planned"),  # strided 2-D, coalesces partially
    (120, (2, 3, 4), (60, 20, 5), 0, "planned"),  # every-5th element, 3-D
    (64, (3, 5), (0, 1), 2, "broadcast"),  # stride-0 row broadcast
    (60, (3, 4), (20, 5), 0, "planned"),
    (64, (4, 4), (1, 4), 3, "offset-transpose"),
    (40, (5, 8), (8, 1), 0, "whole"),
    (256, (4, 4, 4), (64, 16, 1), 0, "planned"),  # inner gap
]


class TestReadView:
    @pytest.mark.parametrize("buf_len,shape,strides,offset,tier", CASES)
    def test_matches_numpy_oracle(self, buf_len, shape, strides, offset, tier):
        buf_np = np.arange(buf_len, dtype=np.float32)
        buf = jnp.asarray(buf_np)
        got = np.asarray(mat.read_view(buf, shape, strides, offset))
        want = np_view(buf_np, shape, strides, offset)
        assert np.array_equal(got, want), (shape, strides, offset, tier)

    def test_negative_stride_view(self):
        """Negative strides (legal through as_strided within bounds) take
        the flat-gather fallback."""
        buf_np = np.arange(32, dtype=np.float32)
        buf = jnp.asarray(buf_np)
        got = np.asarray(mat.read_view(buf, (4, 4), (-4, 1), 12))
        want = buf_np[12 + (np.arange(4)[:, None] * -4 + np.arange(4))]
        assert np.array_equal(got, want)

    def test_overlapping_view_reads(self):
        # stride-0 full overlap (reads are fine; writes are rejected)
        buf = jnp.arange(8, dtype=jnp.float32)
        got = np.asarray(mat.read_view(buf, (3, 8), (0, 1), 0))
        assert np.array_equal(got, np.tile(np.arange(8, dtype=np.float32), (3, 1)))


class TestWriteView:
    @pytest.mark.parametrize(
        "buf_len,shape,strides,offset,tier",
        [c for c in CASES if 0 not in [st for st in c[2]]],
    )
    def test_write_matches_numpy_oracle(self, buf_len, shape, strides, offset, tier):
        buf_np = np.arange(buf_len, dtype=np.float32)
        value = np.full(shape, -1.0, dtype=np.float32)
        want = buf_np.copy()
        view = np.lib.stride_tricks.as_strided(
            want[offset:], shape, [s * 4 for s in strides]
        )
        view[...] = value
        got = np.asarray(
            mat.write_view(jnp.asarray(buf_np), shape, strides, offset, jnp.asarray(value))
        )
        assert np.array_equal(got, want), (shape, strides, offset, tier)


class TestPlanView:
    def test_column_collapses_to_rank1(self):
        perm, nshp, cshape, cstrides = mat.plan_view((8,), (8,))
        assert cshape == (8,) and cstrides == (8,)

    def test_contiguous_pair_merges(self):
        perm, nshp, cshape, cstrides = mat.plan_view((4, 4, 4), (64, 16, 1))
        # dims 0,1 merge (64 == 16*4); dim 2 stays (16 != 1*4)
        assert cshape == (16, 4) and cstrides == (16, 1)

    def test_transposed_reorders(self):
        perm, nshp, cshape, cstrides = mat.plan_view((6, 4), (1, 6))
        assert perm == (1, 0)
        assert cshape == (24,) and cstrides == (1,)

    def test_python_fallback_parity(self):
        for shape, strides in [
            ((4, 4), (16, 2)),
            ((2, 3, 4), (60, 20, 5)),
            ((6, 4), (1, 6)),
            ((1, 5, 1, 7), (35, 7, 7, 1)),
            ((3, 5), (0, 1)),
        ]:
            native = mat.plan_view(shape, strides)
            fallback = mat._plan_view_py(shape, strides)
            assert native == fallback, (shape, strides, native, fallback)


class TestEndToEndHostileLayouts:
    def test_strided_view_arithmetic(self):
        a_np = np.arange(64, dtype=np.float32).reshape(8, 8)
        a = kfunca.from_numpy(a_np, 0)
        v = a[1:7, 2:8:2]  # offset + strided slice
        out = v + v
        assert np.array_equal(out.numpy(), a_np[1:7, 2:8:2] * 2)

    def test_column_inplace(self):
        a_np = np.arange(36, dtype=np.float32).reshape(6, 6)
        a = kfunca.from_numpy(a_np.copy(), 0)
        col = a[:, 3:4]
        col *= 10.0
        a_np[:, 3:4] *= 10.0
        assert np.array_equal(a.numpy(), a_np)
