"""Speculative decoding: output must be BIT-IDENTICAL to target-only greedy
decoding regardless of draft quality; a perfect draft spends ~max_new/(g+1)
target forwards."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kfunca_tpu.models.generate import generate
from kfunca_tpu.models.speculative import speculative_generate
from kfunca_tpu.models.transformer import TransformerConfig, init_params


def _mk(seed, layers=2):
    cfg = TransformerConfig(vocab_size=64, d_model=32, n_heads=2, n_layers=layers,
                            d_ff=64, max_seq_len=128, dtype="float32")
    return init_params(jax.random.PRNGKey(seed), cfg), cfg


class TestSpeculative:
    def test_exact_match_with_weak_draft(self):
        params_t, cfg = _mk(0)
        params_d, cfg_d = _mk(7)  # unrelated draft: rejections happen
        prompt = jnp.asarray([[3, 11, 25, 2]], jnp.int32)
        ref = generate(params_t, prompt, cfg, max_new=12)
        got, rounds = speculative_generate(params_t, cfg, params_d, cfg_d,
                                           prompt, max_new=12, gamma=3)
        assert np.array_equal(np.asarray(got), np.asarray(ref)), (got, ref)
        assert 1 <= int(rounds) <= 12

    def test_perfect_draft_compresses_rounds(self):
        params_t, cfg = _mk(1)
        prompt = jnp.asarray([[5, 9]], jnp.int32)
        ref = generate(params_t, prompt, cfg, max_new=12)
        got, rounds = speculative_generate(params_t, cfg, params_t, cfg,
                                           prompt, max_new=12, gamma=3)
        assert np.array_equal(np.asarray(got), np.asarray(ref))
        # a draft identical to the target accepts (nearly) everything:
        # ceil(12/4) = 3 rounds ideally, +1 tolerated because the draft's
        # 1-token decode and the target's 4-token verify reduce in different
        # shapes (different fp summation order can flip a near-tie argmax)
        assert int(rounds) <= 4, int(rounds)
        assert int(rounds) < 12  # speculation actually compressed rounds

    @pytest.mark.slow
    def test_exact_match_longer_and_gamma_sweep(self):
        params_t, cfg = _mk(2)
        params_d, cfg_d = _mk(3)
        prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
        ref = generate(params_t, prompt, cfg, max_new=20)
        for gamma in (1, 2, 5):
            got, _ = speculative_generate(params_t, cfg, params_d, cfg_d,
                                          prompt, max_new=20, gamma=gamma)
            assert np.array_equal(np.asarray(got), np.asarray(ref)), gamma

    @pytest.mark.slow
    def test_sampled_matches_target_distribution(self):
        """Leviathan accept-reject preserves the target distribution
        EXACTLY in expectation: the first-token histogram over many keys
        must match target-only sampling (small-vocab TV distance)."""
        from kfunca_tpu.models.speculative import speculative_generate_sampled

        cfg = TransformerConfig(vocab_size=16, d_model=16, n_heads=2, n_layers=1,
                                d_ff=32, max_seq_len=32, dtype="float32")
        params_t = init_params(jax.random.PRNGKey(0), cfg)
        params_d = init_params(jax.random.PRNGKey(5), cfg)
        prompt = jnp.asarray([[3, 7]], jnp.int32)
        n = 400

        # target-only first-token distribution (analytic, no sampling noise)
        from kfunca_tpu.models.transformer import forward
        logits = forward(params_t, prompt, cfg)[0, -1].astype(jnp.float32)
        p_ref = np.asarray(jax.nn.softmax(logits))

        counts = np.zeros(16)
        for i in range(n):
            toks, _ = speculative_generate_sampled(
                params_t, cfg, params_d, cfg, prompt, max_new=1, gamma=2,
                key=jax.random.PRNGKey(1000 + i),
            )
            counts[int(np.asarray(toks)[0, 0])] += 1
        emp = counts / n
        tv = 0.5 * np.abs(emp - p_ref).sum()
        # TV of a 400-sample empirical estimate of itself is ~0.08 for 16
        # outcomes; 0.15 gives headroom while catching a wrong distribution
        assert tv < 0.15, (tv, emp, p_ref)

    def test_sampled_mechanics(self):
        from kfunca_tpu.models.speculative import speculative_generate_sampled

        params_t, cfg = _mk(4)
        params_d, cfg_d = _mk(5)
        prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
        toks, rounds = speculative_generate_sampled(
            params_t, cfg, params_d, cfg_d, prompt, max_new=10, gamma=3,
            temperature=0.8, key=jax.random.PRNGKey(3),
        )
        t = np.asarray(toks)
        assert t.shape == (1, 10)
        assert (t >= 0).all() and (t < cfg.vocab_size).all()
        assert 1 <= int(rounds) <= 10
