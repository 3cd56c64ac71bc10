"""Hybrid attention+SSM (Jamba-class) family: placement, parity, decode.

The load-bearing contract is decode parity: the heterogeneous recurrent
step (KV cache on attention layers, O(1) SSM state on mamba layers) must
reproduce the parallel training forward's greedy chain exactly.  The
all-attention degenerate pattern is additionally pinned against the
mixers it claims to reuse."""

import numpy as np

import jax
import jax.numpy as jnp

from kfunca_tpu.models.hybrid import (
    HybridConfig,
    forward,
    generate,
    init_hybrid_params,
    init_hybrid_state,
    make_hybrid_train_step,
)
from kfunca_tpu.models.train import OptConfig, init_opt_state

CFG = HybridConfig(vocab_size=89, d_model=32, n_layers=4, d_ff=48,
                   n_heads=2, d_state=4, d_conv=3, expand=2,
                   max_seq_len=64, scan_chunk=None, dtype="float32",
                   attn_every=4, attn_offset=2)


def _tokens(key, b, s, cfg=CFG):
    return jax.random.randint(jax.random.PRNGKey(key), (b, s), 0,
                              cfg.vocab_size, jnp.int32)


class TestPlacement:
    def test_default_pattern(self):
        assert CFG.layer_kinds() == ("mamba", "mamba", "attn", "mamba")

    def test_jamba_ratio(self):
        cfg = HybridConfig(n_layers=16, attn_every=8, attn_offset=4)
        kinds = cfg.layer_kinds()
        assert kinds.count("attn") == 2
        assert kinds[4] == "attn" and kinds[12] == "attn"

    def test_explicit_pattern_overrides(self):
        cfg = HybridConfig(n_layers=3, pattern=("attn", "mamba", "attn"))
        assert cfg.layer_kinds() == ("attn", "mamba", "attn")

    def test_param_shapes_follow_kinds(self):
        params = init_hybrid_params(jax.random.PRNGKey(0), CFG)
        blocks = params["blocks"]
        assert "wqkv" in blocks[2] and "in_proj" not in blocks[2]
        for i in (0, 1, 3):
            assert "in_proj" in blocks[i] and "wqkv" not in blocks[i]
        for b in blocks:  # every layer carries the MLP
            assert "w_gate" in b and "w_down" in b

    def test_state_shapes_follow_kinds(self):
        st = init_hybrid_state(CFG, batch=2, max_len=10)
        assert set(st[2]) == {"k", "v"}
        assert st[2]["k"].shape == (2, 2, 10, 16)
        assert set(st[0]) == {"ssm", "conv"}
        assert st[0]["ssm"].shape == (2, 64, 4)
        assert st[0]["conv"].shape == (2, 2, 64)


class TestForward:
    def test_forward_shapes_finite(self):
        params = init_hybrid_params(jax.random.PRNGKey(1), CFG)
        tokens = _tokens(2, 2, 12)
        logits = forward(params, tokens, CFG)
        assert logits.shape == (2, 12, 89)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_all_attention_matches_flagship(self):
        # pattern = all "attn" degenerates to the flagship block structure;
        # the same params must produce the same logits through
        # transformer.forward (the reuse claim, checked literally)
        from kfunca_tpu.models.transformer import forward as t_forward

        cfg = HybridConfig(vocab_size=89, d_model=32, n_layers=2, d_ff=48,
                           n_heads=2, max_seq_len=64, dtype="float32",
                           pattern=("attn", "attn"))
        params = init_hybrid_params(jax.random.PRNGKey(3), cfg)
        tokens = _tokens(4, 2, 9, cfg)
        got = forward(params, tokens, cfg)
        want = t_forward(params, tokens, cfg.tcfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_all_mamba_uses_ssm_path(self):
        # gradient flows into SSM params on every layer of an all-mamba
        # pattern (i.e. the mixers are actually wired, not dead weights)
        cfg = HybridConfig(vocab_size=89, d_model=32, n_layers=2, d_ff=48,
                           n_heads=2, d_state=4, max_seq_len=64,
                           scan_chunk=None, dtype="float32",
                           pattern=("mamba", "mamba"))
        params = init_hybrid_params(jax.random.PRNGKey(5), cfg)
        tokens, targets = _tokens(6, 1, 8, cfg), _tokens(7, 1, 8, cfg)
        from kfunca_tpu.models.hybrid import loss_fn

        grads = jax.grad(loss_fn)(params, tokens, targets, cfg)
        for blk in grads["blocks"]:
            assert float(jnp.abs(blk["A_log"]).max()) > 0
            assert float(jnp.abs(blk["in_proj"]).max()) > 0


class TestDecode:
    def test_greedy_decode_matches_parallel_forward(self):
        params = init_hybrid_params(jax.random.PRNGKey(8), CFG)
        prompt = _tokens(9, 2, 6)
        toks = generate(params, prompt, CFG, max_new_tokens=5)
        assert toks.shape == (2, 5)
        seq = prompt
        for i in range(5):
            lg = forward(params, seq, CFG)
            nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
            np.testing.assert_array_equal(np.asarray(toks[:, i]),
                                          np.asarray(nxt))
            seq = jnp.concatenate([seq, nxt[:, None]], axis=1)

    def test_eos_padding(self):
        params = init_hybrid_params(jax.random.PRNGKey(10), CFG)
        prompt = _tokens(11, 1, 4)
        free = np.asarray(generate(params, prompt, CFG, max_new_tokens=6))
        eos = int(free[0, 2])
        first = int(np.argmax(free[0] == eos))  # eos may repeat earlier
        stopped = np.asarray(
            generate(params, prompt, CFG, max_new_tokens=6, eos_id=eos))
        # identical up to and including the first eos, zero-padded after
        np.testing.assert_array_equal(stopped[0, : first + 1],
                                      free[0, : first + 1])
        assert np.all(stopped[0, first + 1:] == 0)


class TestTraining:
    def test_train_step_reduces_loss(self):
        params = init_hybrid_params(jax.random.PRNGKey(12), CFG)
        oc = OptConfig(lr=1e-2, warmup_steps=0, weight_decay=0.0)
        opt_state = init_opt_state(params, oc)
        step = jax.jit(make_hybrid_train_step(CFG, oc))
        tokens, targets = _tokens(13, 2, 16), _tokens(14, 2, 16)
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, tokens,
                                           targets)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
