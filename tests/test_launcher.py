"""Launcher runtime tests (reference Launcher, launcher_cuda.h:139-353)."""

import numpy as np
import pytest

import kfunca_tpu as kfunca
from kfunca_tpu.utils.profiling import PROFILER


class TestLauncher:
    def test_device_enumeration(self):
        n = kfunca.device_count()
        assert n == 8  # virtual CPU mesh from conftest
        props = kfunca.launcher.device_properties(0)
        assert props["platform"] == "cpu"

    def test_set_device(self):
        kfunca.set_device(1)
        assert kfunca.launcher.current_device() == 1
        t = kfunca.from_numpy(np.ones((2, 2), np.float32), 1)
        assert t.device() == 1
        kfunca.set_device(0)
        with pytest.raises(IndexError):
            kfunca.set_device(99)

    def test_profiling_mode(self):
        kfunca.launcher.set_profiling_mode(True)
        try:
            PROFILER.records.clear()
            out = kfunca.launcher.submit(lambda x: x * 2, np.arange(4.0), name="double")
            assert np.array_equal(np.asarray(out), np.arange(4.0) * 2)
            assert PROFILER.records and PROFILER.records[0].name == "double"
            assert "double" in PROFILER.summary()
        finally:
            kfunca.launcher.set_profiling_mode(False)

    def test_profiling_observes_eager_ops(self):
        """Every eager op launch funnels through Launcher.submit
        (reference: all launches go through Launcher::submit,
        launcher_cuda.h:315-353), so profiling mode sees them."""
        kfunca.launcher.set_profiling_mode(True)
        try:
            PROFILER.records.clear()
            a = kfunca.from_numpy(np.ones((4, 4), np.float32), 0)
            b = kfunca.from_numpy(np.ones((4, 4), np.float32), 0)
            _ = a + b
            _ = a * 2.0
            a.fill_(3.0)
            g = kfunca.gemm(a, b, 1.0, 0.0)
            del g
            _ = a.sum(0)
            _ = a.mean_var(0, False)
            _ = a.norm_stat(0)
            _ = a.sort(0, False)
            _ = a.topk(2, 0, True)
            _ = kfunca.causal_attention(
                *[kfunca.from_numpy(np.ones((1, 1, 8, 8), np.float32), 0) for _ in range(3)]
            )
            _ = kfunca.cat([a, b], 0)
            idx = kfunca.from_numpy(np.array([0], np.int64), 0)
            a.index_put_([idx], kfunca.from_numpy(np.zeros((1, 4), np.float32), 0))
            names = [r.name for r in PROFILER.records]
            for expect in (
                "add", "mul_scalar", "fill", "gemm", "sum", "mean_var",
                "norm_stat", "sort", "topk", "causal_attention", "cat",
                "index_put_",
            ):
                assert expect in names, (expect, names)
        finally:
            kfunca.launcher.set_profiling_mode(False)
            PROFILER.records.clear()

    def test_sync_mode_observes_eager_ops(self):
        kfunca.launcher.set_sync_mode(True)
        try:
            a = kfunca.from_numpy(np.arange(16, dtype=np.float32), 0)
            out = a + a
            assert np.array_equal(out.numpy(), np.arange(16, dtype=np.float32) * 2)
        finally:
            kfunca.launcher.set_sync_mode(False)

    def test_sync_mode(self):
        kfunca.launcher.set_sync_mode(True)
        try:
            import jax.numpy as jnp

            out = kfunca.launcher.submit(lambda x: x + 1, jnp.ones((4,)))
            assert np.array_equal(np.asarray(out), np.full(4, 2.0))
        finally:
            kfunca.launcher.set_sync_mode(False)

    def test_compare_utils(self):
        a = kfunca.from_numpy(np.ones((3, 3), np.float32), 0)
        assert kfunca.all_close(a, np.ones((3, 3)))
        assert kfunca.max_diff(a, np.zeros((3, 3))) == 1.0
