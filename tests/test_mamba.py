"""Mamba selective-SSM family: associative-scan vs sequential oracle,
causality, recurrent-decode parity with the parallel form, training
convergence, HF parity vs transformers MambaForCausalLM, export roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.mamba import (
    MambaConfig,
    forward,
    from_hf_mamba,
    generate,
    init_mamba_params,
    make_mamba_train_step,
    params_from_hf_mamba,
    selective_scan,
    to_hf_mamba,
)


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_state", 8)
    kw.setdefault("d_conv", 4)
    kw.setdefault("expand", 2)
    kw.setdefault("dt_rank", 4)
    kw.setdefault("dtype", "float32")
    return MambaConfig(**kw)


def toks(key, b, s, v=96):
    return jax.random.randint(jax.random.PRNGKey(key), (b, s), 2, v,
                              jnp.int32)


class TestScan:
    def test_matches_sequential_oracle(self):
        """associative_scan == the plain h_t = a_t h_{t-1} + b_t loop."""
        rng = np.random.RandomState(0)
        dA = jnp.asarray(rng.uniform(0.5, 1.0, (2, 9, 4, 3)), jnp.float32)
        dBu = jnp.asarray(rng.normal(size=(2, 9, 4, 3)), jnp.float32)
        h = np.asarray(selective_scan(dA, dBu))
        ref = np.zeros((2, 4, 3), np.float32)
        for t in range(9):
            ref = np.asarray(dA[:, t]) * ref + np.asarray(dBu[:, t])
            np.testing.assert_allclose(h[:, t], ref, rtol=1e-5, atol=1e-6)


class TestForward:
    def test_shapes_and_causality(self):
        cfg = small_cfg()
        params = init_mamba_params(jax.random.PRNGKey(0), cfg)
        t = toks(1, 2, 12)
        logits = forward(params, t, cfg)
        assert logits.shape == (2, 12, 96) and logits.dtype == jnp.float32
        # causality: perturbing token 8 must not change logits[:8]
        t2 = t.at[0, 8].set((t[0, 8] + 1) % 96)
        pert = forward(params, t2, cfg)
        np.testing.assert_allclose(
            np.asarray(logits[0, :8]), np.asarray(pert[0, :8]), atol=1e-5)
        assert np.abs(np.asarray(logits[0, 8:]) -
                      np.asarray(pert[0, 8:])).max() > 1e-4

    def test_train_converges(self):
        cfg = small_cfg()
        params = init_mamba_params(jax.random.PRNGKey(0), cfg)
        from kfunca_tpu.models.train import OptConfig, init_opt_state

        step = jax.jit(make_mamba_train_step(cfg, OptConfig(lr=1e-2)))
        opt = init_opt_state(params)
        tokens = toks(2, 4, 12)
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(15):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < 0.6 * losses[0]


class TestGenerate:
    def test_recurrent_matches_parallel(self):
        """Greedy recurrent decode == argmax over the parallel forward of
        the growing sequence (the O(1)-state path is exact)."""
        cfg = small_cfg()
        params = init_mamba_params(jax.random.PRNGKey(1), cfg)
        prompt = toks(3, 2, 6)
        n = 5
        got = np.asarray(generate(params, prompt, cfg, max_new_tokens=n))
        seq = prompt
        for i in range(n):
            logits = forward(params, seq, cfg)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(nxt), got[:, i])
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)

    def test_eos_stops(self):
        cfg = small_cfg()
        params = init_mamba_params(jax.random.PRNGKey(1), cfg)
        prompt = toks(4, 1, 6)
        full = np.asarray(generate(params, prompt, cfg, max_new_tokens=6))[0]
        eos = int(full[2])
        out = np.asarray(generate(params, prompt, cfg, max_new_tokens=6,
                                  eos_id=eos))[0]
        np.testing.assert_array_equal(out[:3], full[:3])
        assert (out[3:] == 0).all()


def _hf_mamba():
    pytest.importorskip("transformers")
    import torch
    from transformers import MambaConfig as HFMambaConfig
    from transformers import MambaForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFMambaConfig(
        vocab_size=96, hidden_size=32, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, use_cache=False,
        layer_norm_epsilon=1e-5)
    return MambaForCausalLM(hf_cfg).eval()


class TestHF:
    def test_logits_match_transformers(self):
        import torch

        model = _hf_mamba()
        params, cfg = from_hf_mamba(model, dtype="float32")
        assert cfg.d_inner == 64 and cfg.rank == 4
        ids = np.random.RandomState(0).randint(2, 96, (2, 9)).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
        assert np.abs(ours - ref).max() < 2e-4, np.abs(ours - ref).max()

    def test_greedy_generation_token_exact(self):
        import torch

        model = _hf_mamba()
        params, cfg = from_hf_mamba(model, dtype="float32")
        ids = np.random.RandomState(1).randint(2, 96, (2, 6)).astype(np.int64)
        with torch.no_grad():
            ref = model.generate(
                torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                num_beams=1).numpy()[:, 6:]
        ours = np.asarray(generate(
            params, jnp.asarray(ids, jnp.int32), cfg, max_new_tokens=6))
        np.testing.assert_array_equal(ours, ref)

    def test_export_roundtrip(self):
        model = _hf_mamba()
        params, cfg = from_hf_mamba(model, dtype="float32")
        params2 = params_from_hf_mamba(to_hf_mamba(params, cfg), cfg)
        t = toks(5, 1, 7)
        np.testing.assert_allclose(
            np.asarray(forward(params, t, cfg)),
            np.asarray(forward(params2, t, cfg)), atol=1e-6)


class TestMesh:
    def test_forward_parity_sharded_vs_single(self):
        """dp2 x tp4 channel-parallel Mamba == single-device forward: the
        scan runs fully sharded over d_inner; x_proj/out_proj are the two
        all-reduce points."""
        from kfunca_tpu.models.mamba import shard_mamba_params
        from kfunca_tpu.parallel.mesh import make_mesh

        cfg = small_cfg()  # d_inner=64 divisible by tp=4
        params = init_mamba_params(jax.random.PRNGKey(0), cfg)
        t = toks(20, 2, 10)
        ref = forward(params, t, cfg)

        mesh = make_mesh(8)
        sharded = shard_mamba_params(params, mesh)
        with mesh:
            out = jax.jit(lambda p, t_: forward(p, t_, cfg))(sharded, t)
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4)


class TestChunkedScan:
    def test_chunked_matches_naive_values_and_grads(self):
        """forward with scan_chunk dividing L == the full-sequence scan,
        for values AND gradients (the chunk boundary carry is exact)."""
        import dataclasses

        cfg_naive = small_cfg(scan_chunk=None)
        cfg_chunk = dataclasses.replace(cfg_naive, scan_chunk=4)
        params = init_mamba_params(jax.random.PRNGKey(2), cfg_naive)
        t = toks(30, 2, 12)  # 12 % 4 == 0 -> chunked path live

        a = forward(params, t, cfg_naive)
        b = forward(params, t, cfg_chunk)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

        from kfunca_tpu.models.mamba import loss_fn

        tgt = jnp.roll(t, -1, axis=1)
        ga = jax.grad(loss_fn)(params, t, tgt, cfg_naive)
        gb = jax.grad(loss_fn)(params, t, tgt, cfg_chunk)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5),
            ga, gb)

    def test_indivisible_length_falls_back(self):
        """L not divisible by scan_chunk silently uses the full scan."""
        import dataclasses

        cfg = dataclasses.replace(small_cfg(), scan_chunk=5)
        params = init_mamba_params(jax.random.PRNGKey(2), cfg)
        t = toks(31, 1, 12)  # 12 % 5 != 0
        ref = forward(params, t, dataclasses.replace(cfg, scan_chunk=None))
        np.testing.assert_allclose(
            np.asarray(forward(params, t, cfg)), np.asarray(ref),
            rtol=1e-6, atol=1e-6)


class TestPallasEngine:
    def test_pallas_composition_matches_xla(self):
        """The exact composition mamba_mixer's pallas branch performs
        (u = dt*hidden, A transpose, + hidden*D readout) over the
        interpret-mode kernel == ssm_apply's XLA path."""
        from kfunca_tpu.models.mamba import ssm_apply
        from kfunca_tpu.ops.pallas_kernels.ssm_scan import ssm_scan_fwd

        rng = np.random.RandomState(0)
        b, L, di, n = 2, 16, 128, 8
        hidden = jnp.asarray(rng.normal(size=(b, L, di)) * 0.3, jnp.float32)
        dt = jnp.asarray(rng.uniform(0.001, 0.1, (b, L, di)), jnp.float32)
        Bm = jnp.asarray(rng.normal(size=(b, L, n)), jnp.float32)
        C = jnp.asarray(rng.normal(size=(b, L, n)), jnp.float32)
        A = jnp.asarray(-rng.uniform(0.5, 2.0, (di, n)), jnp.float32)
        D = jnp.asarray(rng.normal(size=(di,)), jnp.float32)

        ref = ssm_apply(hidden, dt, Bm, C, A, D, None, engine="xla")
        u = dt * hidden
        y, _ = ssm_scan_fwd(dt, u, Bm, C, jnp.transpose(A), lb=4, dib=128,
                            interpret=True)
        got = y + hidden * D
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
