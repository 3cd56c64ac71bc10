"""MLA (multi-head latent attention): expanded/absorbed parity + training.

The load-bearing contract: the absorbed-form cached decode (scores against
the latent cache, values re-expanded after the weighted sum) must produce
EXACTLY the same distribution as the expanded training forward — the two
are algebraically identical, so parity is tight fp32 tolerance, prefill
and step-by-step both."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import (
    forward_with_cache,
    generate,
    init_kv_cache,
)
from kfunca_tpu.models.mla import mla_attention, mla_dims
from kfunca_tpu.models.train import OptConfig, init_opt_state, make_train_step
from kfunca_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
    rms_norm,
)

MLA_CFG = TransformerConfig(
    vocab_size=67, d_model=32, n_heads=2, n_layers=2, d_ff=48,
    max_seq_len=64, dtype="float32", attention="mla",
    kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=8,
)


def _tokens(key, b, s, cfg=MLA_CFG):
    return jax.random.randint(jax.random.PRNGKey(key), (b, s), 0,
                              cfg.vocab_size, jnp.int32)


def _naive_mla_attention(y, p, cfg):
    """Materialize-everything oracle: expand K/V per head, full (S, S)
    causal softmax in fp32 — the textbook MLA forward."""
    import math

    h, qk, nope, rope, v_dim, d_c = mla_dims(cfg)
    b, s, _ = y.shape
    from kfunca_tpu.models.mla import _project_latent, _project_q
    from kfunca_tpu.models.transformer import _rope

    q_nope, q_pe = _project_q(y, p, cfg)
    c, k_pe = _project_latent(y, p, cfg)
    theta, pscale = cfg.rope_params()
    q = jnp.concatenate([q_nope, _rope(q_pe, theta, pscale)], axis=-1)
    k_pe = jnp.broadcast_to(_rope(k_pe, theta, pscale), (b, h, s, rope))
    k_nope = jnp.dot(c, p["w_uk"]).reshape(b, s, h, nope).transpose(0, 2, 1, 3)
    k = jnp.concatenate([k_nope, k_pe], axis=-1)
    v = jnp.dot(c, p["w_uv"]).reshape(b, s, h, v_dim).transpose(0, 2, 1, 3)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(qk)
    mask = jnp.tril(jnp.ones((s, s), bool))
    sc = jnp.where(mask, sc, -jnp.inf)
    prob = jax.nn.softmax(sc, axis=-1)
    attn = jnp.einsum("bhqk,bhkd->bhqd", prob, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * v_dim)
    return jnp.dot(attn, p["wo"])


class TestMlaForward:
    @pytest.mark.parametrize("q_rank", [0, 12])
    def test_expanded_matches_naive_oracle(self, q_rank):
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=1, d_ff=48,
            max_seq_len=64, dtype="float32", attention="mla",
            kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=8,
            q_lora_rank=q_rank)
        params = init_params(jax.random.PRNGKey(0), cfg)
        p = params["blocks"][0]
        y = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 32), jnp.float32)
        got = mla_attention(y, p, cfg)
        want = _naive_mla_attention(y, p, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_uneven_v_head_dim_fallback(self):
        # v_dim != qk head dim exercises the einsum fallback path
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=1, d_ff=48,
            max_seq_len=64, dtype="float32", attention="mla",
            kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=8,
            v_head_dim=12)
        params = init_params(jax.random.PRNGKey(0), cfg)
        p = params["blocks"][0]
        y = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 32), jnp.float32)
        got = mla_attention(y, p, cfg)
        want = _naive_mla_attention(y, p, cfg)
        assert got.shape == (1, 9, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestAbsorbedDecodeParity:
    @pytest.mark.parametrize("q_rank", [0, 12])
    def test_prefill_matches_full_forward(self, q_rank):
        cfg = TransformerConfig(
            vocab_size=67, d_model=32, n_heads=2, n_layers=2, d_ff=48,
            max_seq_len=64, dtype="float32", attention="mla",
            kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=8,
            q_lora_rank=q_rank)
        params = init_params(jax.random.PRNGKey(2), cfg)
        tokens = _tokens(3, 2, 12, cfg)
        want = forward(params, tokens, cfg)  # expanded form
        cache = init_kv_cache(cfg, 2, 20)
        got, _ = forward_with_cache(params, tokens, cache, jnp.int32(0), cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_incremental_matches_prefill(self):
        params = init_params(jax.random.PRNGKey(4), MLA_CFG)
        tokens = _tokens(5, 1, 8)
        cache = init_kv_cache(MLA_CFG, 1, 16)
        full, _ = forward_with_cache(params, tokens, cache, jnp.int32(0),
                                     MLA_CFG)
        cache = init_kv_cache(MLA_CFG, 1, 16)
        logits, cache = forward_with_cache(params, tokens[:, :5], cache,
                                           jnp.int32(0), MLA_CFG)
        outs = [logits]
        for i in range(5, 8):
            lg, cache = forward_with_cache(params, tokens[:, i:i + 1], cache,
                                           jnp.int32(i), MLA_CFG)
            outs.append(lg)
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    def test_cache_is_compressed(self):
        cache = init_kv_cache(MLA_CFG, 3, 32)
        assert len(cache) == MLA_CFG.n_layers
        assert cache[0]["ckv"].shape == (3, 32, 16)  # kv_lora_rank
        assert cache[0]["kpe"].shape == (3, 32, 8)  # qk_rope_head_dim
        # vs MHA at the same head geometry: 2 * h * head_dim = 64 floats
        # per position; MLA stores 24

    def test_generate_greedy_consistent(self):
        params = init_params(jax.random.PRNGKey(6), MLA_CFG)
        prompt = _tokens(7, 2, 6)
        toks = generate(params, prompt, MLA_CFG, max_new=5)
        assert toks.shape == (2, 5)
        # greedy chain must equal argmax over the expanded full forward
        seq = prompt
        for i in range(5):
            lg = forward(params, seq, MLA_CFG)
            nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(toks[:, i]),
                                          np.asarray(nxt))
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)


class TestMlaTraining:
    def test_train_step_reduces_loss(self):
        params = init_params(jax.random.PRNGKey(8), MLA_CFG)
        oc = OptConfig(lr=1e-2, warmup_steps=0, weight_decay=0.0)
        opt_state = init_opt_state(params, oc)
        step = make_train_step(MLA_CFG, oc)
        tokens, targets = _tokens(9, 2, 16), _tokens(10, 2, 16)
        losses = []
        for _ in range(5):
            params, opt_state, loss_v = step(params, opt_state, tokens,
                                             targets)
            losses.append(float(loss_v))
        assert losses[-1] < losses[0]
        assert all(np.isfinite(losses))

    def test_param_specs_cover_mla(self):
        from jax.sharding import PartitionSpec as P

        from kfunca_tpu.parallel.mesh import param_specs

        params = init_params(jax.random.PRNGKey(0), MLA_CFG)
        specs = param_specs(params, fsdp=False)
        blk = specs["blocks"][0]
        assert blk["w_q"] == P(None, "tp")
        assert blk["w_uk"] == P(None, "tp")
        assert blk["w_uv"] == P(None, "tp")
        assert blk["wo"] == P("tp", None)
        # identical tree structure (tree_map over params/specs must not fail)
        jax.tree_util.tree_map(lambda a, b: None, params, specs,
                               is_leaf=lambda x: isinstance(x, P))

    def test_rms_normed_latent(self):
        # the cached latent is RMS-normed (DeepSeek): verify the projection
        # helper actually applies kv_norm
        from kfunca_tpu.models.mla import _project_latent

        params = init_params(jax.random.PRNGKey(1), MLA_CFG)
        p = params["blocks"][0]
        y = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 32), jnp.float32)
        c, _ = _project_latent(y, p, MLA_CFG)
        raw = jnp.dot(y, p["w_dkv"])[..., :16]
        want = rms_norm(raw, p["kv_norm"], MLA_CFG.norm_eps)
        np.testing.assert_allclose(np.asarray(c), np.asarray(want),
                                   rtol=1e-6)


def test_paged_serving_rejects_mla_clearly():
    """InferenceServer's page pools are per-head K/V; MLA needs a
    compressed-latent pool.  The constructor must say so instead of
    KeyError-ing on a missing wqkv deep in the decode trace."""
    import pytest

    from kfunca_tpu.models.serve import InferenceServer

    params = init_params(jax.random.PRNGKey(0), MLA_CFG)
    with pytest.raises(NotImplementedError, match="MLA"):
        InferenceServer(params, MLA_CFG, batch_slots=2, page_size=4,
                        n_pages=16)
