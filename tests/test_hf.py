"""HuggingFace checkpoint import parity: converted Llama-family weights
must reproduce `transformers`' logits and greedy generations exactly (to
fp32 numerics).  The HF model is the ORACLE here — this is the strongest
end-to-end check the model family has (real reference implementation, not
a self-oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from kfunca_tpu.models.generate import generate  # noqa: E402
from kfunca_tpu.models.hf import config_from_hf, from_hf  # noqa: E402
from kfunca_tpu.models.transformer import forward  # noqa: E402


def _mk_llama(tied=False, kv=4, **kw):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=kv,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=tied, attn_implementation="eager", **kw,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(cfg).eval()


def _logits_close(model, tokens, atol=2e-4):
    params, cfg = from_hf(model, dtype="float32")
    with torch.no_grad():
        want = model(torch.tensor(np.asarray(tokens))).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(tokens), cfg))
    assert np.allclose(got, want, atol=atol), np.abs(got - want).max()
    return params, cfg


class TestLlamaImport:
    def test_config_mapping(self):
        m = _mk_llama(kv=2)
        cfg = config_from_hf(m.config)
        assert (cfg.d_model, cfg.n_heads, cfg.kv_heads) == (64, 4, 2)
        assert cfg.n_layers == 2 and cfg.d_ff == 128
        assert cfg.norm_eps == pytest.approx(1e-5)
        assert cfg.vocab_size == 128

    def test_forward_logits_match_untied(self):
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        params, _ = _logits_close(_mk_llama(tied=False), tokens)
        assert "lm_head" in params  # untied head imported

    def test_forward_logits_match_tied(self):
        rng = np.random.default_rng(1)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        params, _ = _logits_close(_mk_llama(tied=True), tokens)
        assert "lm_head" not in params  # tied: embed.T is the head

    def test_forward_logits_match_gqa(self):
        rng = np.random.default_rng(2)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        _logits_close(_mk_llama(kv=2), tokens)

    def test_greedy_generation_matches_hf(self):
        model = _mk_llama()
        params, cfg = from_hf(model, dtype="float32")
        prompt = np.asarray([[3, 17, 42, 9, 81]], np.int32)
        with torch.no_grad():
            want = model.generate(
                torch.tensor(prompt), max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            ).numpy()[0, prompt.shape[1]:]
        got = np.asarray(generate(params, jnp.asarray(prompt), cfg, max_new=8))[0]
        assert np.array_equal(got, want), (got, want)

    def test_serving_runs_imported_model(self):
        from kfunca_tpu.models.serve import InferenceServer

        model = _mk_llama(kv=2)
        params, cfg = from_hf(model, dtype="float32")
        # dense-path and paged-path greedy agree on the imported weights
        prompt = [5, 9, 2, 4]
        want = np.asarray(generate(
            params, jnp.asarray([prompt], jnp.int32), cfg, max_new=5))[0]
        srv = InferenceServer(params, cfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        rid = srv.submit(prompt, max_new=5)
        out = srv.run()[rid]
        assert out == want.tolist(), (out, want)

    def test_rejects_unsupported(self):
        m = _mk_llama()
        sd = dict(m.state_dict())
        sd["model.layers.0.self_attn.o_proj.bias"] = torch.zeros(64)
        cfg = config_from_hf(m.config)
        with pytest.raises(NotImplementedError):
            from kfunca_tpu.models.hf import params_from_hf

            params_from_hf(sd, cfg)


class TestQwen2Import:
    def test_qkv_bias_logits_match(self):
        """Qwen2 blocks carry QKV biases: imported bqkv must reproduce the
        HF logits (the bias flows through dense forward AND paged decode)."""
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=True, attn_implementation="eager",
        )
        torch.manual_seed(5)
        model = Qwen2ForCausalLM(cfg).eval()
        params, kcfg = from_hf(model, dtype="float32")
        assert "bqkv" in params["blocks"][0]
        assert kcfg.attention_window is None  # use_sliding_window gate
        rng = np.random.default_rng(5)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()

    def test_qwen2_serves_and_exports(self):
        from transformers import Qwen2Config, Qwen2ForCausalLM

        from kfunca_tpu.models.hf import to_hf
        from kfunca_tpu.models.serve import InferenceServer

        cfg = Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=True, attn_implementation="eager",
        )
        torch.manual_seed(6)
        model = Qwen2ForCausalLM(cfg).eval()
        params, kcfg = from_hf(model, dtype="float32")
        prompt = [5, 9, 2, 4]
        want = np.asarray(generate(
            params, jnp.asarray([prompt], jnp.int32), kcfg, max_new=5))[0]
        srv = InferenceServer(params, kcfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        rid = srv.submit(prompt, max_new=5)
        assert srv.run()[rid] == want.tolist()
        # export round-trips the biases
        sd = to_hf(params, kcfg)
        model2 = Qwen2ForCausalLM(cfg).eval()
        missing, unexpected = model2.load_state_dict(sd, strict=False)
        assert not unexpected and all("lm_head" in m for m in missing)
        model2.tie_weights()
        toks = np.asarray([[3, 7, 11]], np.int32)
        with torch.no_grad():
            a = model(torch.tensor(toks)).logits.float().numpy()
            b = model2(torch.tensor(toks)).logits.float().numpy()
        assert np.allclose(a, b, atol=1e-5)


class TestQwen3Import:
    def _mk(self, seed=7):
        from transformers import Qwen3Config, Qwen3ForCausalLM

        cfg = Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16,  # == hidden/heads (the supported geometry)
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=True, attn_implementation="eager",
        )
        torch.manual_seed(seed)
        return Qwen3ForCausalLM(cfg).eval()

    def test_qk_norm_logits_match(self):
        """Qwen3's per-head q/k RMSNorm (before RoPE): imported q_norm/
        k_norm gains must reproduce the HF logits through dense forward."""
        model = self._mk()
        params, kcfg = from_hf(model, dtype="float32")
        assert kcfg.qk_norm and "q_norm" in params["blocks"][0]
        rng = np.random.default_rng(7)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()

    def test_greedy_generation_and_serving_match(self):
        """qk-norm must flow through the cached decode path AND the paged
        serving path: greedy tokens match transformers' exactly."""
        from kfunca_tpu.models.serve import InferenceServer

        model = self._mk(seed=8)
        params, kcfg = from_hf(model, dtype="float32")
        prompt = np.asarray([[3, 17, 42, 9, 81]], np.int32)
        with torch.no_grad():
            want = model.generate(
                torch.tensor(prompt), max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            ).numpy()[0, prompt.shape[1]:]
        got = np.asarray(
            generate(params, jnp.asarray(prompt), kcfg, max_new=8))[0]
        assert np.array_equal(got, want), (got, want)
        srv = InferenceServer(params, kcfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        rid = srv.submit(list(prompt[0]), max_new=8)
        out = srv.run()[rid]
        assert np.array_equal(np.asarray(out, np.int64), want), (out, want)

    def test_qk_norm_roundtrip_export(self):
        """to_hf must carry the q/k norm gains back out: reimporting the
        exported state dict reproduces the logits."""
        from transformers import Qwen3ForCausalLM

        from kfunca_tpu.models.hf import params_from_hf, to_hf

        model = self._mk(seed=9)
        params, kcfg = from_hf(model, dtype="float32")
        sd = to_hf(params, kcfg)
        model2 = Qwen3ForCausalLM(model.config).eval()
        missing, unexpected = model2.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        toks = np.asarray([[1, 2, 3, 4, 5, 6]], np.int32)
        with torch.no_grad():
            a = model(torch.tensor(toks)).logits.float().numpy()
            b = model2(torch.tensor(toks)).logits.float().numpy()
        assert np.allclose(a, b, atol=1e-5)


class TestQwen3MoeImport:
    def test_logits_and_generation_match(self):
        """Qwen3-MoE: qk-norm attention + fine-grained softmax-routed MoE
        WITHOUT top-k renormalization (norm_topk_prob=False — the raw
        softmax probs are the mixing weights)."""
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

        hc = Qwen3MoeConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            num_experts=8, num_experts_per_tok=2, norm_topk_prob=False,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=True, attn_implementation="eager",
        )
        torch.manual_seed(21)
        model = Qwen3MoeForCausalLM(hc).eval()
        params, kcfg = from_hf(model, dtype="float32")
        assert kcfg.qk_norm and kcfg.n_experts == 8
        assert kcfg.moe_d_ff == 32 and not kcfg.moe_norm_topk
        assert "experts" in params["blocks"][0]
        assert "shared" not in params["blocks"][0]
        rng = np.random.default_rng(21)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()
        prompt = np.asarray([[3, 17, 42, 9, 81]], np.int32)
        with torch.no_grad():
            wgen = model.generate(
                torch.tensor(prompt), max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            ).numpy()[0, prompt.shape[1]:]
        ggen = np.asarray(
            generate(params, jnp.asarray(prompt), kcfg, max_new=8))[0]
        assert np.array_equal(ggen, wgen), (ggen, wgen)
        # the routed MoE must flow through the paged serving engine too
        from kfunca_tpu.models.serve import InferenceServer

        srv = InferenceServer(params, kcfg, batch_slots=2, page_size=4,
                              n_pages=32, max_pages_per_seq=8)
        rid = srv.submit(list(prompt[0]), max_new=8)
        out = srv.run()[rid]
        assert np.array_equal(np.asarray(out, np.int64), wgen), (out, wgen)


class TestDeepseekV3Import:
    """Full DeepSeek-V3 stack parity: MLA (q/kv latents, decoupled
    interleaved rope, unequal v_head_dim) + sigmoid-routed fine-grained
    MoE with correction-bias group-limited selection, shared experts, and
    first-k-dense layers — all pinned against transformers' DeepseekV3."""

    def _mk(self, seed=11, **kw):
        from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

        defaults = dict(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=32, num_hidden_layers=3,
            first_k_dense_replace=1, num_attention_heads=4,
            num_key_value_heads=4, n_routed_experts=8,
            num_experts_per_tok=2, n_shared_experts=1, n_group=4,
            topk_group=2, norm_topk_prob=True, routed_scaling_factor=2.5,
            q_lora_rank=32, kv_lora_rank=16, qk_nope_head_dim=16,
            qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=128,
            rms_norm_eps=1e-5, rope_scaling=None, tie_word_embeddings=True,
            attn_implementation="eager",
        )
        defaults.update(kw)
        cfg = DeepseekV3Config(**defaults)
        torch.manual_seed(seed)
        model = DeepseekV3ForCausalLM(cfg).eval()
        with torch.no_grad():  # make the selection-bias path non-trivial
            for layer in model.model.layers[cfg.first_k_dense_replace:]:
                layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
        return model

    def test_logits_match(self):
        model = self._mk()
        params, kcfg = from_hf(model, dtype="float32")
        assert kcfg.attention == "mla" and kcfg.rope_interleave
        assert kcfg.moe_score == "sigmoid" and kcfg.moe_first_dense == 1
        blocks = params["blocks"]
        assert "w_gate" in blocks[0] and "experts" not in blocks[0]  # dense
        assert "experts" in blocks[1] and "shared" in blocks[1]
        assert "router_bias" in blocks[1]
        rng = np.random.default_rng(11)
        tokens = rng.integers(0, 128, (2, 16)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()

    def test_greedy_generation_matches(self):
        """The absorbed-form MLA decode + MoE routing reproduce HF's
        greedy tokens through the compressed latent cache."""
        model = self._mk(seed=12)
        params, kcfg = from_hf(model, dtype="float32")
        prompt = np.asarray([[3, 17, 42, 9, 81]], np.int32)
        with torch.no_grad():
            want = model.generate(
                torch.tensor(prompt), max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            ).numpy()[0, prompt.shape[1]:]
        got = np.asarray(
            generate(params, jnp.asarray(prompt), kcfg, max_new=8))[0]
        assert np.array_equal(got, want), (got, want)

    def test_halfsplit_rope_and_direct_q(self):
        """q_lora_rank=None (direct q projection) + rope_interleave=False
        (half-split pairing) — the other MLA geometry corners."""
        model = self._mk(seed=13, q_lora_rank=None, rope_interleave=False,
                         qk_nope_head_dim=8, qk_rope_head_dim=8)
        params, kcfg = from_hf(model, dtype="float32")
        assert kcfg.q_lora_rank == 0 and not kcfg.rope_interleave
        assert "w_q" in params["blocks"][0]
        rng = np.random.default_rng(13)
        tokens = rng.integers(0, 128, (2, 12)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()


class TestMistralImport:
    def test_sliding_window_logits_match(self):
        from transformers import MistralConfig, MistralForCausalLM

        cfg = MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            sliding_window=8, attn_implementation="eager",
        )
        torch.manual_seed(3)
        model = MistralForCausalLM(cfg).eval()
        params, kcfg = from_hf(model, dtype="float32")
        assert kcfg.attention_window == 8
        rng = np.random.default_rng(3)
        # seq LONGER than the window so the window mask actually bites
        tokens = rng.integers(0, 128, (2, 24)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


class TestExport:
    def test_roundtrip_into_transformers(self):
        """to_hf exports weights transformers can load and run: a random
        flagship model's logits must match the HF model built from its
        exported state dict."""
        from transformers import LlamaConfig, LlamaForCausalLM

        from kfunca_tpu.models.hf import to_hf
        from kfunca_tpu.models.transformer import (
            TransformerConfig, init_params,
        )

        kcfg = TransformerConfig(
            vocab_size=128, d_model=64, n_heads=4, n_kv_heads=2, n_layers=2,
            d_ff=128, max_seq_len=128, dtype="float32", norm_eps=1e-5,
        )
        params = init_params(jax.random.PRNGKey(4), kcfg)
        hf_cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=128, rms_norm_eps=1e-5,
            tie_word_embeddings=True, attn_implementation="eager",
        )
        model = LlamaForCausalLM(hf_cfg).eval()
        missing, unexpected = model.load_state_dict(to_hf(params, kcfg), strict=False)
        # tied head: lm_head.weight resolves from the embedding
        assert not unexpected and all("lm_head" in m for m in missing), (
            missing, unexpected)
        model.tie_weights()

        rng = np.random.default_rng(4)
        tokens = rng.integers(0, 128, (2, 12)).astype(np.int32)
        with torch.no_grad():
            want = model(torch.tensor(tokens)).logits.float().numpy()
        got = np.asarray(forward(params, jnp.asarray(tokens), kcfg))
        assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


from kfunca_tpu.models.transformer import (  # noqa: E402
    TransformerConfig,
    init_params,
)


class TestToHfNewFamilies:
    """Round-trip export coverage for the families added in round 3:
    MLA (DeepSeek kv_b_proj repack) and the mlp.gate MoE layout with
    shared experts + e_score_correction_bias (reference parity: the
    export is the inverse of params_from_hf's import mapping)."""

    def _roundtrip(self, cfg, seed=0):
        from kfunca_tpu.models.hf import params_from_hf, to_hf

        params = init_params(jax.random.PRNGKey(seed), cfg)
        sd = to_hf(params, cfg)
        back = params_from_hf(sd, cfg)
        flat_a, _ = jax.tree.flatten(params)
        flat_b, treedef_b = jax.tree.flatten(back)
        treedef_a = jax.tree.structure(params)
        assert treedef_a == treedef_b, (treedef_a, treedef_b)
        for a, b in zip(flat_a, flat_b):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_mla_roundtrip(self):
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=2, d_ff=48,
            max_seq_len=64, dtype="float32", attention="mla",
            kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=8,
        )
        self._roundtrip(cfg)

    def test_mla_qlora_roundtrip(self):
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=1, d_ff=48,
            max_seq_len=64, dtype="float32", attention="mla",
            kv_lora_rank=16, q_lora_rank=24,
            qk_nope_head_dim=8, qk_rope_head_dim=8, v_head_dim=12,
        )
        self._roundtrip(cfg, seed=1)

    def test_deepseek_moe_roundtrip(self):
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=2, d_ff=48,
            max_seq_len=64, dtype="float32", attention="mla",
            kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=8,
            n_experts=4, moe_top_k=2, moe_d_ff=16, n_shared_experts=1,
            moe_score="sigmoid", moe_score_bias=True, moe_first_dense=1,
        )
        self._roundtrip(cfg, seed=2)

    def test_qwen3_moe_roundtrip(self):
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=2, d_ff=48,
            max_seq_len=64, dtype="float32", qk_norm=True,
            n_experts=4, moe_top_k=2, moe_d_ff=16,
        )
        self._roundtrip(cfg, seed=3)


class TestUnsupportedMoeFamilies:
    """Shared-expert MoE layouts this importer does not map must fail
    loudly at config time, not import silently-wrong logits."""

    def test_qwen2_moe_rejected(self):
        from kfunca_tpu.models.hf import config_from_hf

        with pytest.raises(NotImplementedError, match="qwen2_moe"):
            config_from_hf({
                "model_type": "qwen2_moe", "vocab_size": 100,
                "hidden_size": 64, "num_attention_heads": 4,
                "num_hidden_layers": 2, "intermediate_size": 128,
                "num_experts": 8, "num_experts_per_tok": 2,
                "moe_intermediate_size": 32,
            })

    def test_olmoe_rejected(self):
        from kfunca_tpu.models.hf import config_from_hf

        with pytest.raises(NotImplementedError, match="olmoe"):
            config_from_hf({
                "model_type": "olmoe", "vocab_size": 100,
                "hidden_size": 64, "num_attention_heads": 4,
                "num_hidden_layers": 2, "intermediate_size": 128,
                "num_experts": 8, "num_experts_per_tok": 2,
            })
