"""Gemma-family switches on the flagship (norm="rms_offset", geglu MLP,
sqrt(d) embed scale, MQA): forward/train, cache parity, HF oracle parity
vs transformers GemmaForCausalLM, paged serving, export roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import forward_with_cache, generate, init_kv_cache
from kfunca_tpu.models.hf import config_from_hf, from_hf, params_from_hf, to_hf
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
from kfunca_tpu.models.transformer import TransformerConfig, forward, init_params


def gemma_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_kv_heads", 1)  # Gemma-2b is MQA
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("dtype", "float32")
    kw.setdefault("norm", "rms_offset")
    kw.setdefault("mlp_type", "geglu")
    kw.setdefault("embed_scale", True)
    return TransformerConfig(**kw)


class TestGemmaForward:
    def test_forward_and_train(self):
        cfg = gemma_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        # zero-centered norm gains at init (gain = 1 + 0)
        assert float(jnp.abs(params["final_norm"]).max()) == 0.0
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 5) % 96
        logits = forward(params, tokens, cfg)
        assert logits.shape == (2, 16, 96)
        step = jax.jit(make_train_step(cfg, OptConfig(lr=1e-2)))
        opt = init_opt_state(params)
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(10):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_embed_scale_wired(self):
        """embed_scale=True must change the forward (sqrt(32)x inputs)."""
        cfg = gemma_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        t = jnp.asarray([[3, 4, 5]], jnp.int32)
        a = forward(params, t, cfg)
        b = forward(params, t, gemma_cfg(embed_scale=False))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-5

    def test_cache_matches_full_forward(self):
        cfg = gemma_cfg()
        params = init_params(jax.random.PRNGKey(1), cfg)
        tokens = (jnp.arange(12, dtype=jnp.int32)[None] * 7) % 96
        full = forward(params, tokens, cfg)
        cache = init_kv_cache(cfg, 1, 16)
        logits, cache = forward_with_cache(
            params, tokens[:, :8], cache, jnp.int32(0), cfg)
        np.testing.assert_allclose(
            np.asarray(full[:, :8]), np.asarray(logits), atol=2e-4,
            rtol=1e-4)
        step, cache = forward_with_cache(
            params, tokens[:, 8:], cache, jnp.int32(8), cfg)
        np.testing.assert_allclose(
            np.asarray(full[:, 8:]), np.asarray(step), atol=2e-4, rtol=1e-4)


def _hf_gemma():
    pytest.importorskip("transformers")
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(0)
    cfg = GemmaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, attention_bias=False,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
        pad_token_id=0, bos_token_id=2, eos_token_id=1,
        attn_implementation="eager")
    return GemmaForCausalLM(cfg).eval()


class TestGemmaHF:
    def test_config_mapping(self):
        model = _hf_gemma()
        cfg = config_from_hf(model.config, dtype="float32")
        assert cfg.norm == "rms_offset" and cfg.mlp_type == "geglu"
        assert cfg.embed_scale and cfg.kv_heads == 1

    def test_logits_match_transformers(self):
        import torch

        model = _hf_gemma()
        params, cfg = from_hf(model, dtype="float32")
        ids = np.random.RandomState(0).randint(2, 96, (2, 9)).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids)).logits.numpy()
        ours = np.asarray(forward(params, jnp.asarray(ids, jnp.int32), cfg))
        assert np.abs(ours - ref).max() < 3e-4, np.abs(ours - ref).max()

    def test_greedy_generation_token_exact(self):
        import torch

        model = _hf_gemma()
        params, cfg = from_hf(model, dtype="float32")
        ids = np.random.RandomState(1).randint(2, 96, (1, 6)).astype(np.int64)
        n = 6
        ref = []
        dec = ids.copy()
        with torch.no_grad():
            for _ in range(n):
                logits = model(torch.from_numpy(dec)).logits.numpy()
                nxt = int(np.argmax(logits[0, -1]))
                ref.append(nxt)
                dec = np.concatenate([dec, [[nxt]]], axis=1)
        out = generate(params, jnp.asarray(ids, jnp.int32), cfg, max_new=n)
        np.testing.assert_array_equal(np.asarray(out)[0, :n], ref)

    def test_export_roundtrip(self):
        model = _hf_gemma()
        params, cfg = from_hf(model, dtype="float32")
        params2 = params_from_hf(to_hf(params, cfg), cfg, tied=True)
        t = jnp.asarray([[5, 9, 11, 2]], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(forward(params, t, cfg)),
            np.asarray(forward(params2, t, cfg)), atol=1e-6)


class TestGemmaServing:
    def test_paged_serving_matches_dense_generate(self):
        """The paged continuous-batching engine reproduces dense
        generate() tokens for a Gemma-config model (embed scale + offset
        norm + geglu all live inside the one compiled decode step)."""
        cfg = gemma_cfg()
        params = init_params(jax.random.PRNGKey(2), cfg)
        prompt = ((jnp.arange(5, dtype=jnp.int32) + 3) * 7)[None] % 96
        n = 6
        dense = np.asarray(generate(params, prompt, cfg, max_new=n))[0, :n]
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        rid = srv.submit(np.asarray(prompt[0]).tolist(), max_new=n)
        out = srv.run()
        np.testing.assert_array_equal(np.asarray(out[rid][:n]), dense)
