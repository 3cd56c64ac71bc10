"""Mixtral-style MoE in the flagship family: routed-MLP forward, cache
parity, training, serving (fp and quantized), sharding, and HF oracle
parity against transformers' MixtralForCausalLM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import forward_with_cache, generate, init_kv_cache
from kfunca_tpu.models.serve import InferenceServer
from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
from kfunca_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
    mlp,
)


def moe_cfg(**kw):
    kw.setdefault("vocab_size", 96)
    kw.setdefault("d_model", 32)
    kw.setdefault("n_heads", 2)
    kw.setdefault("n_layers", 2)
    kw.setdefault("d_ff", 64)
    kw.setdefault("dtype", "float32")
    kw.setdefault("n_experts", 4)
    kw.setdefault("moe_top_k", 2)
    return TransformerConfig(**kw)


class TestMoEMLP:
    def test_router_math_matches_oracle(self):
        """Dense-all-experts routed MLP == explicit per-token top-k oracle."""
        cfg = moe_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        p = params["blocks"][0]
        y = jax.random.normal(jax.random.PRNGKey(1), (3, 5, cfg.d_model), jnp.float32)
        got = np.asarray(mlp(y, p, cfg))

        yf = np.asarray(y, np.float64).reshape(-1, cfg.d_model)
        router = np.asarray(p["router"], np.float64)
        logits = yf @ router
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        want = np.zeros_like(yf)
        for t in range(yf.shape[0]):
            top = np.argsort(probs[t])[::-1][: cfg.moe_top_k]
            wts = probs[t][top] / probs[t][top].sum()
            for e, wt in zip(top, wts):
                ex = p["experts"][e]
                g = yf[t] @ np.asarray(ex["w_gate"], np.float64)
                u = yf[t] @ np.asarray(ex["w_up"], np.float64)
                act = (g / (1 + np.exp(-g))) * u
                want[t] += wt * (act @ np.asarray(ex["w_down"], np.float64))
        np.testing.assert_allclose(
            got.reshape(-1, cfg.d_model), want, rtol=1e-4, atol=1e-4
        )

    def test_forward_shapes_and_train(self):
        cfg = moe_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        tokens = (jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) * 5) % cfg.vocab_size
        logits = forward(params, tokens, cfg)
        assert logits.shape == (2, 16, cfg.vocab_size)
        opt = init_opt_state(params)
        step = jax.jit(make_train_step(cfg, OptConfig(lr=1e-2), loss_chunk=32))
        targets = jnp.roll(tokens, -1, axis=1)
        losses = []
        for _ in range(5):
            params, opt, loss = step(params, opt, tokens, targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses)) and losses[-1] < losses[0]

    def test_cache_forward_matches_full(self):
        """Incremental decode (cache) must equal the full forward — the MoE
        MLP is position-independent so logits agree token for token."""
        cfg = moe_cfg()
        params = init_params(jax.random.PRNGKey(2), cfg)
        tokens = (jnp.arange(1 * 12, dtype=jnp.int32).reshape(1, 12) * 7) % cfg.vocab_size
        full = forward(params, tokens, cfg)
        cache = init_kv_cache(cfg, 1, 12)
        lg1, cache = forward_with_cache(params, tokens[:, :8], cache, jnp.int32(0), cfg)
        lg2, _ = forward_with_cache(params, tokens[:, 8:], cache, jnp.int32(8), cfg)
        inc = jnp.concatenate([lg1, lg2], axis=1)
        np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-4)


class TestMoEServing:
    def test_paged_serving_matches_generate(self):
        cfg = moe_cfg()
        params = init_params(jax.random.PRNGKey(3), cfg)
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=6)
        prompts = [[3, 5, 7], [11, 2]]
        ids = [srv.submit(p, max_new=5) for p in prompts]
        out = srv.run()
        for rid, prompt in zip(ids, prompts):
            want = generate(params, jnp.asarray([prompt], jnp.int32), cfg, max_new=5)
            assert out[rid] == np.asarray(want)[0].tolist()

    def test_w8_moe_serving_matches_fp_greedy(self):
        cfg = moe_cfg()
        params = init_params(jax.random.PRNGKey(3), cfg)
        kw = dict(batch_slots=1, page_size=4, n_pages=32, max_pages_per_seq=6)
        base = InferenceServer(params, cfg, **kw)
        r0 = base.submit([3, 5, 7], max_new=5)
        want = base.run()[r0]
        srv = InferenceServer(params, cfg, quantize_weights=True, **kw)
        r1 = srv.submit([3, 5, 7], max_new=5)
        assert srv.run()[r1] == want

    def test_moe_param_specs_cover_tree(self):
        from jax.sharding import PartitionSpec as P
        from kfunca_tpu.models.serve import decode_param_specs
        from kfunca_tpu.parallel.mesh import param_specs

        cfg = moe_cfg()
        params = init_params(jax.random.PRNGKey(0), cfg)
        for specs in (param_specs(params), decode_param_specs(params)):
            # structural zip must succeed leaf-for-leaf
            jax.tree_util.tree_map(
                lambda p, s: None, params, specs,
                is_leaf=lambda x: not isinstance(x, (dict, list)),
            )
            blk = specs["blocks"][0]
            assert blk["router"] == P()
            assert blk["experts"][0]["w_down"] in (P("tp", None),)


class TestMixtralImport:
    def _mk(self):
        torch = pytest.importorskip("torch")
        pytest.importorskip("transformers")
        from transformers import MixtralConfig, MixtralForCausalLM

        cfg = MixtralConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
            num_local_experts=4, num_experts_per_tok=2,
            max_position_embeddings=64, rms_norm_eps=1e-5,
            rope_theta=10000.0, sliding_window=None,
            tie_word_embeddings=False, attn_implementation="eager",
        )
        torch.manual_seed(0)
        return MixtralForCausalLM(cfg).eval()

    def test_config_mapping(self):
        from kfunca_tpu.models.hf import config_from_hf

        m = self._mk()
        cfg = config_from_hf(m.config)
        assert cfg.n_experts == 4 and cfg.moe_top_k == 2
        assert cfg.d_model == 32 and cfg.d_ff == 64

    def test_logits_match_transformers(self):
        import torch
        from kfunca_tpu.models.hf import from_hf

        m = self._mk()
        params, cfg = from_hf(m, dtype="float32")
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, 96, (2, 12)).astype(np.int32)
        with torch.no_grad():
            want = m(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), cfg))
        assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()

    def test_greedy_generation_matches_hf(self):
        import torch
        from kfunca_tpu.models.hf import from_hf

        m = self._mk()
        params, cfg = from_hf(m, dtype="float32")
        prompt = np.asarray([[5, 9, 2, 14]], np.int32)
        with torch.no_grad():
            want = m.generate(
                torch.tensor(prompt), max_new_tokens=6, do_sample=False,
                pad_token_id=0,
            )[0, 4:].numpy()
        got = np.asarray(generate(params, jnp.asarray(prompt), cfg, max_new=6))[0]
        assert got.tolist() == want.tolist()

    def test_roundtrip_export(self):
        import torch
        from kfunca_tpu.models.hf import from_hf, to_hf

        m = self._mk()
        params, cfg = from_hf(m, dtype="float32")
        sd = to_hf(params, cfg)
        m.load_state_dict({k: v for k, v in sd.items()})
        rng = np.random.default_rng(1)
        tokens = rng.integers(0, 96, (1, 8)).astype(np.int32)
        with torch.no_grad():
            want = m(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), cfg))
        assert np.allclose(got, want, atol=3e-4)
