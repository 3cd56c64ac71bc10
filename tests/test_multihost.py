"""Multi-host glue, exercised in its single-process degradation (the only
form testable without a pod) plus the pure mesh/slicing logic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from kfunca_tpu.parallel import multihost
from kfunca_tpu.parallel.mesh import batch_spec


class TestMultihost:
    def test_initialize_single_process_noop(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
        monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
        assert multihost.initialize() is False
        assert jax.process_count() == 1

    def test_mesh_single_process(self):
        mesh = multihost.make_multihost_mesh()
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.devices.size == len(jax.devices())

    def test_mesh_explicit_factors(self):
        mesh = multihost.make_multihost_mesh(dp=4, tp=2)
        assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2

    def test_batch_info_single_process(self):
        mesh = multihost.make_multihost_mesh(dp=4, tp=2)
        start, size = multihost.process_batch_info(32, mesh)
        assert (start, size) == (0, 32)
        # single-process divides anything; the indivisible-raise path needs
        # nproc > 1 and is checked via the pure math below

    def test_batch_info_math(self, monkeypatch):
        mesh = multihost.make_multihost_mesh(dp=4, tp=2)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "process_index", lambda: 2)
        assert multihost.process_batch_info(32, mesh) == (16, 8)
        with pytest.raises(ValueError):
            multihost.process_batch_info(30, mesh)

    def test_global_batch_from_local(self):
        mesh = multihost.make_multihost_mesh(dp=4, tp=2)
        local = np.arange(8 * 16, dtype=np.int32).reshape(8, 16)
        arr = multihost.global_batch_from_local(local, mesh)
        assert arr.shape == (8, 16)
        assert arr.sharding.spec == batch_spec()
        np.testing.assert_array_equal(np.asarray(arr), local)

    def test_sharded_train_step_accepts_global_batch(self):
        """End to end on the 8-device CPU mesh: assemble -> sharded step."""
        from kfunca_tpu.models.train import (
            OptConfig, init_opt_state, make_sharded_train_step,
        )
        from kfunca_tpu.models.transformer import TransformerConfig, init_params
        from kfunca_tpu.parallel.mesh import shard_params

        cfg = TransformerConfig(vocab_size=64, d_model=32, n_heads=2,
                                n_layers=1, d_ff=64, dtype="float32")
        mesh = multihost.make_multihost_mesh(dp=4, tp=2)
        params = init_params(jax.random.PRNGKey(0), cfg)
        params = shard_params(params, mesh)
        opt = init_opt_state(params)
        step = make_sharded_train_step(cfg, mesh, OptConfig(lr=1e-2),
                                       loss_chunk=32)(params)
        tokens = np.arange(8 * 16, dtype=np.int32).reshape(8, 16) % 64
        targets = np.roll(tokens, -1, axis=1)
        tok = multihost.global_batch_from_local(tokens, mesh)
        tgt = multihost.global_batch_from_local(targets, mesh)
        with mesh:
            params, opt, loss = step(params, opt, tok, tgt)
        assert np.isfinite(float(loss))

    def test_tp_must_fit_local_devices(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "local_device_count", lambda: 4)
        with pytest.raises(ValueError):
            multihost.make_multihost_mesh(dp=1, tp=8)
