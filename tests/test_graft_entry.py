"""Regression guard for the driver entry points (__graft_entry__.py)."""

import importlib.util
import os

import numpy as np

import jax


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class TestGraftEntry:
    def test_entry_jits(self):
        m = _load()
        fn, args = m.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out.shape == (2, 128, 256)
        assert np.isfinite(np.asarray(out)).all()

    def test_bridge_to_jax_and_back(self):
        import kfunca_tpu as kfunca

        t = kfunca.from_numpy(np.arange(6, dtype=np.float32).reshape(2, 3), 0)
        arr = t.permute(1, 0).contiguous().to_jax()
        assert arr.shape == (3, 2)
        back = kfunca.from_jax(arr * 2, 0)
        assert np.array_equal(back.numpy(), np.arange(6, dtype=np.float32).reshape(2, 3).T * 2)
