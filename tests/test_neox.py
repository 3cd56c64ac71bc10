"""GPT-NeoX/Pythia family (parallel residual, partial rotary, exact GELU,
interleaved QKV import): forward/train, cache parity, HF oracle parity,
paged serving, export roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import generate, init_kv_cache, forward_with_cache
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
from kfunca_tpu.models.transformer import TransformerConfig, forward, init_params


def neox_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 128)
    kw.setdefault("dtype", "float32")
    kw.setdefault("norm", "layernorm")
    kw.setdefault("mlp_type", "gelu")
    kw.setdefault("proj_bias", True)
    kw.setdefault("parallel_residual", True)
    kw.setdefault("gelu_exact", True)
    kw.setdefault("rope_pct", 0.25)
    kw.setdefault("norm_eps", 1e-5)
    return TransformerConfig(**kw)


class TestNeoXForward:
    def test_forward_and_train(self):
        cfg = neox_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
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

    def test_partial_rotary_tail_passes_through(self):
        """rope_pct=0.25 on head_dim 16 rotates dims 0-3 only; a pure-tail
        perturbation at different positions must attend identically to a
        same-position one (position info only enters via the rotated
        slice)."""
        from kfunca_tpu.models.transformer import _rope

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 16),
                              jnp.float32)
        r = _rope(x, 10000.0, 1.0, 0.25)
        np.testing.assert_array_equal(np.asarray(r[..., 4:]),
                                      np.asarray(x[..., 4:]))
        assert np.abs(np.asarray(r[..., :4] - x[..., :4])).max() > 1e-4

    def test_cache_forward_matches_full(self):
        cfg = neox_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(12, dtype=jnp.int32)[None] * 7) % 96
        full = np.asarray(forward(params, tok, cfg))
        cache = init_kv_cache(cfg, 1, 32)
        lg, cache = forward_with_cache(params, tok[:, :8], cache,
                                       jnp.int32(0), cfg)
        np.testing.assert_allclose(np.asarray(lg), full[:, :8],
                                   rtol=2e-4, atol=2e-4)
        for t in range(8, 12):
            lg, cache = forward_with_cache(params, tok[:, t : t + 1], cache,
                                           jnp.int32(t), cfg)
            np.testing.assert_allclose(np.asarray(lg)[:, 0], full[:, t],
                                       rtol=2e-4, atol=2e-4)


class TestNeoXHF:
    @pytest.fixture(scope="class")
    def hf_model(self):
        pytest.importorskip("transformers")
        import torch
        from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

        torch.manual_seed(0)
        cfg = GPTNeoXConfig(
            vocab_size=96, hidden_size=32, num_attention_heads=2,
            num_hidden_layers=2, intermediate_size=128,
            max_position_embeddings=64, rotary_pct=0.25,
            use_parallel_residual=True, hidden_act="gelu",
            tie_word_embeddings=False)
        return GPTNeoXForCausalLM(cfg).eval()

    def test_config_mapping(self, hf_model):
        from kfunca_tpu.models.hf import config_from_hf

        cfg = config_from_hf(hf_model.config, dtype="float32")
        assert cfg.parallel_residual and cfg.gelu_exact
        assert cfg.rope_pct == pytest.approx(0.25)
        assert cfg.norm == "layernorm" and cfg.pos == "rope"
        assert cfg.mlp_type == "gelu"

    def test_logits_match_transformers(self, hf_model):
        import torch

        from kfunca_tpu.models.hf import from_hf

        params, cfg = from_hf(hf_model, dtype="float32")
        assert "lm_head" in params  # untied embed_out
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
        assert not unexpected
        # only non-weight buffers (rotary inv_freq, attention bias masks,
        # masked_bias) may be absent from the export
        assert all(any(frag in k for frag in
                       ("inv_freq", "attention.bias", "masked_bias"))
                   for k in missing), missing
        tok = np.array([[3, 17, 42, 7]], np.int32)
        ours = np.asarray(forward(params, jnp.asarray(tok), cfg))
        with torch.no_grad():
            theirs = hf_model(torch.from_numpy(tok.astype(np.int64))
                              ).logits.numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


class TestNeoXServing:
    def test_paged_serving_matches_dense(self):
        cfg = neox_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tok = (jnp.arange(8, dtype=jnp.int32)[None] * 7) % 96
        dense = np.asarray(generate(params, tok, cfg, 10))[0, -10:]
        srv = InferenceServer(params, cfg, batch_slots=2, n_pages=32,
                              page_size=8)
        rid = srv.submit(np.asarray(tok[0]), max_new=10)
        srv.run()
        np.testing.assert_array_equal(
            dense, np.asarray(srv.requests[rid].tokens))
