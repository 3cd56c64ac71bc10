"""Tests for overlap analysis (reference memory_overlap.h port) and the
generic Pallas reduction engine."""

import jax.numpy as jnp
import numpy as np
import pytest

import kfunca_tpu as kfunca
from kfunca_tpu.core.overlap import (
    is_non_overlapping_and_dense,
    may_self_overlap,
    offset_range,
)
from kfunca_tpu.ops.pallas_kernels.reduce import reduce_2d
from kfunca_tpu.utils.errors import KfError


class TestOverlapMath:
    def test_dense_layouts(self):
        assert is_non_overlapping_and_dense((4, 5), (5, 1))
        assert is_non_overlapping_and_dense((5, 4), (1, 5))  # transposed
        assert not is_non_overlapping_and_dense((4, 5), (6, 1))  # padded rows
        assert is_non_overlapping_and_dense((1, 7), (99, 1))  # size-1 ignored

    def test_offset_range(self):
        assert offset_range((4, 5), (5, 1)) == (0, 19)
        assert offset_range((3,), (4,)) == (0, 8)

    def test_self_overlap(self):
        assert may_self_overlap((4, 5), (0, 1))  # broadcast stride
        assert may_self_overlap((4, 4), (1, 1))  # interleaved
        assert not may_self_overlap((4, 5), (5, 1))
        assert not may_self_overlap((4, 5), (10, 2))  # strided but disjoint

    def test_overlapping_write_rejected(self):
        t = kfunca.from_numpy(np.zeros((4, 4), np.float32), 0)
        bad = t.as_strided((4, 4), (1, 1), 0)
        with pytest.raises(KfError):
            bad.fill_(1.0)

    def test_overlapping_read_allowed(self):
        """as_strided reads over overlapping layouts are legal (gather)."""
        t = kfunca.from_numpy(np.arange(4, dtype=np.float32), 0)
        rep = t.as_strided((3, 4), (0, 1), 0)
        assert np.array_equal(
            rep.contiguous().numpy(), np.tile(np.arange(4, dtype=np.float32), (3, 1))
        )


class TestPallasReduce:
    @pytest.mark.parametrize("op", ["sum", "mean", "max"])
    @pytest.mark.parametrize("r,c", [(64, 128), (515, 257)])
    def test_ops(self, op, r, c):
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(-10, 10, (r, c)), jnp.float32)
        out = reduce_2d(x, op=op, br=128, bc=128, interpret=True)
        ref = {
            "sum": jnp.sum(x, axis=0, keepdims=True),
            "mean": jnp.mean(x, axis=0, keepdims=True),
            "max": jnp.max(x, axis=0, keepdims=True),
        }[op]
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3)
