"""GPT-2-family architecture (norm="layernorm", pos="learned",
mlp_type="gelu", proj_bias): forward/training, cache parity, HF oracle
parity vs transformers GPT2LMHeadModel, paged/quantized serving, export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import forward_with_cache, generate, init_kv_cache
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
from kfunca_tpu.models.transformer import TransformerConfig, forward, init_params


def gpt2_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 128)
    kw.setdefault("max_seq_len", 64)
    kw.setdefault("dtype", "float32")
    kw.setdefault("norm", "layernorm")
    kw.setdefault("pos", "learned")
    kw.setdefault("mlp_type", "gelu")
    kw.setdefault("proj_bias", True)
    kw.setdefault("norm_eps", 1e-5)
    return TransformerConfig(**kw)


class TestGPT2Forward:
    def test_forward_and_train(self):
        cfg = gpt2_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        assert "pos_embed" in params and "final_norm_b" in params
        blk = params["blocks"][0]
        for k in ("attn_norm_b", "bqkv", "bo", "w_fc", "b_fc", "w_proj",
                  "b_proj"):
            assert k in blk, k
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 5) % 96
        logits = forward(params, tokens, cfg)
        assert logits.shape == (2, 16, 96)
        opt = init_opt_state(params)
        step = jax.jit(make_train_step(cfg, OptConfig(lr=1e-2)))
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(5):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_position_sensitivity(self):
        """Learned positions: the same token at different positions must
        produce different hidden states (rope-free path is wired)."""
        cfg = gpt2_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok = jnp.full((1, 8), 5, jnp.int32)
        logits = np.asarray(forward(params, tok, cfg))
        assert np.abs(logits[0, 0] - logits[0, 4]).max() > 1e-4

    def test_cache_forward_matches_full(self):
        cfg = gpt2_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(12, dtype=jnp.int32)[None] * 7) % 96
        full = np.asarray(forward(params, tok, cfg))
        cache = init_kv_cache(cfg, 1, 32)
        # prefill 8, then decode one token at a time
        lg, cache = forward_with_cache(params, tok[:, :8], cache,
                                       jnp.int32(0), cfg)
        np.testing.assert_allclose(np.asarray(lg), full[:, :8], rtol=2e-4,
                                   atol=2e-4)
        for t in range(8, 12):
            lg, cache = forward_with_cache(params, tok[:, t : t + 1], cache,
                                           jnp.int32(t), cfg)
            np.testing.assert_allclose(np.asarray(lg)[:, 0], full[:, t],
                                       rtol=2e-4, atol=2e-4)


class TestGPT2HF:
    @pytest.fixture(scope="class")
    def hf_model(self):
        pytest.importorskip("transformers")
        import torch
        from transformers import GPT2Config, GPT2LMHeadModel

        torch.manual_seed(0)
        cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_head=2,
                         n_layer=2, n_inner=None,
                         activation_function="gelu_new")
        return GPT2LMHeadModel(cfg).eval()

    def test_config_mapping(self, hf_model):
        from kfunca_tpu.models.hf import config_from_hf

        cfg = config_from_hf(hf_model.config, dtype="float32")
        assert cfg.norm == "layernorm" and cfg.pos == "learned"
        assert cfg.mlp_type == "gelu" and cfg.proj_bias
        assert cfg.d_ff == 4 * 32 and cfg.max_seq_len == 64
        assert cfg.norm_eps == pytest.approx(1e-5)

    def test_logits_match_transformers(self, hf_model):
        import torch

        from kfunca_tpu.models.hf import from_hf

        params, cfg = from_hf(hf_model, dtype="float32")
        tok = np.array([[3, 17, 42, 7, 91, 5, 64, 28]], np.int32)
        ours = np.asarray(forward(params, jnp.asarray(tok), cfg))
        with torch.no_grad():
            theirs = hf_model(torch.from_numpy(tok.astype(np.int64))
                              ).logits.numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    def test_greedy_generation_matches(self, hf_model):
        import torch

        from kfunca_tpu.models.hf import from_hf

        params, cfg = from_hf(hf_model, dtype="float32")
        tok = np.array([[3, 17, 42, 7]], np.int32)
        ours = np.asarray(generate(params, jnp.asarray(tok), cfg, 8))[0, -8:]
        with torch.no_grad():
            theirs = hf_model.generate(
                torch.from_numpy(tok.astype(np.int64)), max_new_tokens=8,
                do_sample=False, pad_token_id=0).numpy()[0, 4:]
        np.testing.assert_array_equal(ours, theirs)

    def test_to_hf_roundtrip(self, hf_model):
        import torch

        from kfunca_tpu.models.hf import from_hf, to_hf

        params, cfg = from_hf(hf_model, dtype="float32")
        sd = to_hf(params, cfg)
        missing, unexpected = hf_model.load_state_dict(sd, strict=False)
        # attn.bias (the causal-mask buffer) is not a weight; nothing else
        # may be missing
        assert not unexpected
        assert all("attn.bias" in k or "masked_bias" in k for k in missing)
        tok = np.array([[3, 17, 42, 7]], np.int32)
        ours = np.asarray(forward(params, jnp.asarray(tok), cfg))
        with torch.no_grad():
            theirs = hf_model(torch.from_numpy(tok.astype(np.int64))
                              ).logits.numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


class TestGPT2Serving:
    def test_paged_serving_matches_dense(self):
        cfg = gpt2_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(8, dtype=jnp.int32)[None] * 7) % 96
        dense = np.asarray(generate(params, tok, cfg, 10))[0, -10:]
        srv = InferenceServer(params, cfg, batch_slots=2, n_pages=32,
                              page_size=8)
        rid = srv.submit(np.asarray(tok[0]), max_new=10)
        srv.run()
        np.testing.assert_array_equal(dense, np.asarray(srv.requests[rid].tokens))

    def test_quantized_serving(self):
        """w8a8 decode on the GELU MLP (w_fc/w_proj quantize too)."""
        cfg = gpt2_cfg()
        params = init_params(jax.random.PRNGKey(1), cfg)
        tok = (jnp.arange(8, dtype=jnp.int32)[None] * 11) % 96
        fp = InferenceServer(params, cfg, batch_slots=1, n_pages=32,
                             page_size=8)
        r0 = fp.submit(np.asarray(tok[0]), max_new=8)
        fp.run()
        q8 = InferenceServer(params, cfg, batch_slots=1, n_pages=32,
                             page_size=8, quantize_weights=True)
        r1 = q8.submit(np.asarray(tok[0]), max_new=8)
        q8.run()
        # int8 weight noise on a random-init model can flip ties; require
        # the prefix to agree (the test model's logit gaps are tiny)
        a, b = fp.requests[r0].tokens, q8.requests[r1].tokens
        assert len(b) == 8 and a[:2] == b[:2]
