"""GRPO: group advantages, clipped surrogate, KL anchor, rollout packaging.

Oracle strategy mirrors the repo's other alignment tests (test_dpo-style):
tiny fp32 models on the CPU tier, naive full-logits references for the
chunked paths, and analytic fixed-point checks (at policy == old == ref the
ratio is exactly 1, the KL exactly 0, and the loss the negative advantage
mean)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kfunca_tpu.models.rlhf import (
    grpo_advantages,
    grpo_loss,
    make_grpo_step,
    rollout_group,
    token_logprobs,
)
from kfunca_tpu.models.train import OptConfig, init_opt_state
from kfunca_tpu.models.transformer import (
    TransformerConfig,
    forward,
    init_params,
)

CFG = TransformerConfig(vocab_size=61, d_model=16, n_heads=2, n_layers=1,
                        d_ff=32, max_seq_len=48, dtype="float32")


def _data(key, b=4, s=12, vocab=61):
    kt, kg = jax.random.split(jax.random.PRNGKey(key))
    tokens = jax.random.randint(kt, (b, s), 0, vocab, jnp.int32)
    targets = jax.random.randint(kg, (b, s), 0, vocab, jnp.int32)
    return tokens, targets


class TestAdvantages:
    def test_zero_mean_unit_scale_per_group(self):
        r = jnp.asarray([1.0, 2.0, 3.0, 4.0, 10.0, 10.0, 30.0, 10.0])
        a = np.asarray(grpo_advantages(r, 4)).reshape(2, 4)
        np.testing.assert_allclose(a.mean(axis=1), 0.0, atol=1e-6)
        # standardized: matches (r - mu) / (std + eps) directly
        want = (np.asarray(r).reshape(2, 4)
                - np.asarray(r).reshape(2, 4).mean(1, keepdims=True))
        want = want / (np.asarray(r).reshape(2, 4).std(1, keepdims=True) + 1e-4)
        np.testing.assert_allclose(a, want, rtol=1e-5)

    def test_degenerate_group_is_zero(self):
        r = jnp.asarray([5.0, 5.0, 5.0, 1.0, 2.0, 3.0])
        a = np.asarray(grpo_advantages(r, 3))
        np.testing.assert_allclose(a[:3], 0.0, atol=1e-6)
        assert np.abs(a[3:]).max() > 0.5


class TestTokenLogprobs:
    def test_matches_naive(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        tokens, targets = _data(1)
        got = token_logprobs(params, tokens, targets, CFG, vocab_chunk=16)
        logits = forward(params, tokens, CFG)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        want = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestGrpoLoss:
    def test_fixed_point_at_identity(self):
        # policy == old == ref: rho = 1 everywhere, KL = 0, clip_frac = 0,
        # loss = -mean(advantages)
        params = init_params(jax.random.PRNGKey(0), CFG)
        tokens, targets = _data(2)
        targets = targets.at[:, :3].set(-100)  # masked prompt positions
        logp = token_logprobs(params, tokens, targets, CFG, 16)
        adv = jnp.asarray([1.0, -1.0, 0.5, -0.5])
        loss, m = grpo_loss(params, tokens, targets, logp, logp, adv, CFG,
                            kl_beta=0.1, vocab_chunk=16)
        np.testing.assert_allclose(float(loss), -float(jnp.mean(adv)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(m["kl"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(m["clip_frac"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(m["ratio_mean"]), 1.0, rtol=1e-6)

    def test_step_moves_logprobs_with_advantage_sign(self):
        # one GRPO step must raise the positive-advantage completion's
        # log-likelihood and lower the negative one's
        params = init_params(jax.random.PRNGKey(3), CFG)
        tokens, targets = _data(4, b=2)
        old = token_logprobs(params, tokens, targets, CFG, 16)
        adv = jnp.asarray([2.0, -2.0])
        oc = OptConfig(lr=5e-3, warmup_steps=0, weight_decay=0.0)
        opt_state = init_opt_state(params, oc)
        step = jax.jit(make_grpo_step(CFG, oc, kl_beta=0.0, vocab_chunk=16))
        new_params, _, m = step(params, opt_state, tokens, targets,
                                old, old, adv)
        assert np.isfinite(float(m["loss"]))
        new = token_logprobs(new_params, tokens, targets, CFG, 16)
        d = np.asarray(jnp.sum(new - old, axis=-1))
        assert d[0] > 0, d
        assert d[1] < 0, d

    def test_kl_beta_pulls_toward_reference(self):
        # with zero advantages the surrogate gradient vanishes; the KL term
        # alone must pull the policy toward the (different) reference
        kp, kr = jax.random.split(jax.random.PRNGKey(5))
        params = init_params(kp, CFG)
        ref = init_params(kr, CFG)
        tokens, targets = _data(6, b=2)
        old = token_logprobs(params, tokens, targets, CFG, 16)
        ref_lp = token_logprobs(ref, tokens, targets, CFG, 16)
        adv = jnp.zeros((2,), jnp.float32)
        _, m0 = grpo_loss(params, tokens, targets, old, ref_lp, adv, CFG,
                          kl_beta=1.0, vocab_chunk=16)
        oc = OptConfig(lr=1e-2, warmup_steps=0, weight_decay=0.0)
        opt_state = init_opt_state(params, oc)
        step = jax.jit(make_grpo_step(CFG, oc, kl_beta=1.0, vocab_chunk=16))
        p = params
        for _ in range(5):
            p, opt_state, m = step(p, opt_state, tokens, targets, old,
                                   ref_lp, adv)
        assert float(m["kl"]) < float(m0["kl"])

    def test_clipping_bounds_the_update(self):
        # an old_logp far below the policy's makes rho huge; with positive
        # advantage the clipped surrogate must cap the objective at
        # (1 + eps) * adv — i.e. the loss cannot fall below -(1+eps)*adv
        params = init_params(jax.random.PRNGKey(7), CFG)
        tokens, targets = _data(8, b=1)
        logp = token_logprobs(params, tokens, targets, CFG, 16)
        adv = jnp.asarray([1.0])
        loss, m = grpo_loss(params, tokens, targets, logp - 5.0, logp, adv,
                            CFG, clip_eps=0.2, kl_beta=0.0, vocab_chunk=16)
        np.testing.assert_allclose(float(loss), -1.2, rtol=1e-5)
        np.testing.assert_allclose(float(m["clip_frac"]), 1.0, atol=1e-6)


class TestRollout:
    def test_packaging_and_masks(self):
        params = init_params(jax.random.PRNGKey(0), CFG)
        prompt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
        out = rollout_group(params, prompt, CFG, group_size=3, max_new=5,
                            temperature=1.0, key=jax.random.PRNGKey(1),
                            vocab_chunk=16)
        assert out["completions"].shape == (6, 5)
        assert out["tokens"].shape == (6, 8)  # 4 + 5 - 1
        # group-major: rows 0-2 share prompt 0, rows 3-5 prompt 1
        np.testing.assert_array_equal(np.asarray(out["tokens"][:3, :4]),
                                      np.tile([1, 2, 3, 4], (3, 1)))
        # prompt positions masked; completion positions live
        t = np.asarray(out["targets"])
        assert (t[:, :3] == -100).all()
        assert (t[:, 3:] != -100).all()
        # live targets are the shifted sequence (completion tokens)
        comp = np.asarray(out["completions"])
        np.testing.assert_array_equal(t[:, 3], comp[:, 0])
        np.testing.assert_array_equal(t[:, 4:], comp[:, 1:])
        # old_logp is the sampling policy's own log-probs
        want = token_logprobs(params, out["tokens"], out["targets"], CFG, 16)
        np.testing.assert_allclose(np.asarray(out["old_logp"]),
                                   np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_end_to_end_grpo_round(self):
        # a full round: rollout -> synthetic reward -> advantages -> step
        params = init_params(jax.random.PRNGKey(2), CFG)
        prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        out = rollout_group(params, prompt, CFG, group_size=4, max_new=4,
                            temperature=1.0, key=jax.random.PRNGKey(3),
                            vocab_chunk=16)
        # reward: fraction of even tokens in the completion (arbitrary)
        rewards = jnp.mean((out["completions"] % 2 == 0).astype(jnp.float32),
                           axis=-1)
        adv = grpo_advantages(rewards, 4)
        oc = OptConfig(lr=1e-3, warmup_steps=0, weight_decay=0.0)
        opt_state = init_opt_state(params, oc)
        step = jax.jit(make_grpo_step(CFG, oc, vocab_chunk=16))
        new_params, _, m = step(params, opt_state, out["tokens"],
                                out["targets"], out["old_logp"],
                                out["old_logp"], adv)
        for k in ("loss", "kl", "clip_frac", "ratio_mean"):
            assert np.isfinite(float(m[k])), (k, m[k])
        # params moved
        moved = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_params)
        assert max(jax.tree_util.tree_leaves(moved)) > 0
