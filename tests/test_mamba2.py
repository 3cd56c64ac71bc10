"""Mamba-2 (SSD) family: chunked-SSD vs sequential recurrence oracle,
chunk-size invariance, causality, recurrent-decode parity, training
convergence, HF parity vs transformers Mamba2ForCausalLM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.mamba2 import (
    Mamba2Config,
    forward,
    from_hf_mamba2,
    generate,
    init_mamba2_params,
    make_mamba2_train_step,
    ssd,
)


def small_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_layers", 2)
    kw.setdefault("n_heads", 4)
    kw.setdefault("head_dim", 16)
    kw.setdefault("d_state", 16)
    kw.setdefault("n_groups", 1)
    kw.setdefault("expand", 2)
    kw.setdefault("chunk_size", 8)
    kw.setdefault("dtype", "float32")
    return Mamba2Config(**kw)


def toks(key, b, s, v=96):
    return jax.random.randint(jax.random.PRNGKey(key), (b, s), 2, v,
                              jnp.int32)


class TestSSD:
    def _inputs(self, b=2, L=16, h=3, p=4, n=5, seed=0):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.normal(size=(b, L, h, p)), jnp.float32)
        dt_a = jnp.asarray(-rng.uniform(0.01, 0.5, (b, L, h)), jnp.float32)
        bm = jnp.asarray(rng.normal(size=(b, L, h, n)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(b, L, h, n)), jnp.float32)
        return x, dt_a, bm, c

    @staticmethod
    def _oracle(x, dt_a, bm, c):
        """Plain sequential recurrence h_t = exp(a_t) h_{t-1} + x_t B_t."""
        b, L, h, p = x.shape
        n = bm.shape[-1]
        hst = np.zeros((b, h, p, n), np.float32)
        ys = []
        for t in range(L):
            hst = (np.exp(np.asarray(dt_a[:, t]))[..., None, None] * hst
                   + np.asarray(x[:, t])[..., None]
                   * np.asarray(bm[:, t])[:, :, None, :])
            ys.append(np.einsum("bhpn,bhn->bhp", hst, np.asarray(c[:, t])))
        return np.stack(ys, axis=1)

    @pytest.mark.parametrize("chunk", [1, 4, 8, 16])
    def test_matches_sequential_oracle(self, chunk):
        x, dt_a, bm, c = self._inputs()
        got = np.asarray(ssd(x, dt_a, bm, c, chunk))
        want = self._oracle(x, dt_a, bm, c)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"chunk={chunk}")

    def test_chunk_size_invariance(self):
        """SSD output must be exactly chunk-size independent."""
        x, dt_a, bm, c = self._inputs(L=24, seed=7)
        a = np.asarray(ssd(x, dt_a, bm, c, 4))
        b_ = np.asarray(ssd(x, dt_a, bm, c, 12))
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)


class TestForward:
    def test_shapes_and_causality(self):
        cfg = small_cfg()
        params = init_mamba2_params(jax.random.PRNGKey(0), cfg)
        t = toks(1, 2, 16)
        logits = forward(params, t, cfg)
        assert logits.shape == (2, 16, 96)
        t2 = t.at[0, 10].set((t[0, 10] + 1) % 96)
        pert = forward(params, t2, cfg)
        np.testing.assert_allclose(
            np.asarray(logits[0, :10]), np.asarray(pert[0, :10]), atol=1e-5)
        assert np.abs(np.asarray(logits[0, 10:])
                      - np.asarray(pert[0, 10:])).max() > 1e-4

    def test_train_converges(self):
        cfg = small_cfg()
        params = init_mamba2_params(jax.random.PRNGKey(0), cfg)
        from kfunca_tpu.models.train import OptConfig, init_opt_state

        step = jax.jit(make_mamba2_train_step(cfg, OptConfig(lr=1e-2)))
        opt = init_opt_state(params)
        tokens = toks(2, 4, 16)
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(15):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < 0.6 * losses[0]


class TestGenerate:
    def test_recurrent_matches_parallel(self):
        cfg = small_cfg()
        params = init_mamba2_params(jax.random.PRNGKey(1), cfg)
        prompt = toks(3, 2, 8)
        n = 5
        got = np.asarray(generate(params, prompt, cfg, max_new_tokens=n))
        seq = prompt
        for i in range(n):
            logits = forward(params, seq, cfg)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(nxt), got[:, i])
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)


def _hf_mamba2(groups=1):
    pytest.importorskip("transformers")
    import torch
    from transformers import Mamba2Config as HFMamba2Config
    from transformers import Mamba2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFMamba2Config(
        vocab_size=96, hidden_size=32, state_size=16, num_hidden_layers=2,
        conv_kernel=4, expand=2, num_heads=4, head_dim=16, n_groups=groups,
        chunk_size=8, use_cache=False, tie_word_embeddings=True,
        layer_norm_epsilon=1e-5, rms_norm=True)
    return Mamba2ForCausalLM(hf_cfg).eval()


class TestHF:
    @pytest.mark.parametrize("groups", [1, 2])
    def test_logits_match_transformers(self, groups):
        import torch

        model = _hf_mamba2(groups)
        params, cfg = from_hf_mamba2(model, dtype="float32")
        assert cfg.n_groups == groups and cfg.chunk_size == 8
        ids = np.random.RandomState(0).randint(2, 96, (2, 9)).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
        assert np.abs(ours - ref).max() < 3e-4, np.abs(ours - ref).max()

    def test_greedy_generation_token_exact(self):
        """Our cached recurrent decode == HF teacher-forced argmax (HF's
        own cache path needs the CUDA kernels, so the oracle re-runs the
        full forward per step)."""
        import torch

        model = _hf_mamba2()
        params, cfg = from_hf_mamba2(model, dtype="float32")
        ids = np.random.RandomState(1).randint(2, 96, (1, 6)).astype(np.int64)
        n = 5
        ours = np.asarray(generate(params, jnp.asarray(ids, jnp.int32), cfg,
                                   max_new_tokens=n))
        dec = ids.copy()
        with torch.no_grad():
            for i in range(n):
                logits = model(torch.from_numpy(dec)).logits.numpy()
                nxt = int(np.argmax(logits[0, -1]))
                assert nxt == ours[0, i], (i, nxt, ours[0])
                dec = np.concatenate([dec, [[nxt]]], axis=1)
